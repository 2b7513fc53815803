package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // ERROR: the two intentionally-global windows (qIslands over ~2.4k
    // post-agg day rows; qIslandsScalable's per-year offset table) trip
    // WindowExec's blanket single-partition WARN dozens of times per run,
    // burying real signal in the captured bench tail. Failures still print
    // via the [bench] stderr lines + failed count + non-zero exit.
    spark.sparkContext.setLogLevel("ERROR")
    // Untimed warmup: JVM/codegen/parquet-footer caches are process-level
    // one-offs; without it the alphabetically-first query absorbs ~4 s of
    // JIT warmup and per-query numbers are not comparable.
    try SparkEntry.entry(spark).count()
    catch { case e: Throwable => System.err.println(s"[bench] warmup failed: ${e.getMessage}") }
    var failed = List.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).count()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        failed ::= name
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) =>
      // Locale.ROOT: a comma-decimal default locale must not break the JSON
      val err = if (failed.contains(k)) "-1"
        else String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
      "\"" + k + "\":" + err
    }.mkString("{", ",", "}")
    val total = results.collect { case (k, v) if !failed.contains(k) => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","failed":${failed.size}}""")
    spark.stop()
    // A broken query must never bench as fast: non-zero exit on any failure.
    if (failed.nonEmpty) sys.exit(1)
  }
}
