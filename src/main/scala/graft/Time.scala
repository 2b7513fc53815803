package graft
import org.apache.spark.sql.SparkSession

/** Cold-cost audit tool: times each named driver query in THIS fresh
  * JVM, in argument order — the first number for a query is its true
  * first-touch cost (codegen compile + JIT + page cache), which the
  * bench's untimed warmup hides by design. Repeat a name to see its
  * warm time in the same process. Usage:
  *   sbt "runMain graft.Time q_ann_pq q_ann_pq"
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1 — cold costs are SF-relevant).
  */
object Time {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // NOTE: driver memory cannot be set here — the session runs in
      // sbt's already-launched JVM, so heap comes from .jvmopts/-J
      // flags; a small heap inflates first-touch numbers with GC time
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // --setup: run (and itemize) the bench's setup phase first, so the
    // query numbers below replicate the bench's post-setup cold state
    // rather than charging staged builds to the first query named.
    val (flags, names) = args.partition(_.startsWith("--"))
    if (flags.contains("--setup")) Bench.setupSteps.foreach { case (n, f) =>
      val t0 = System.nanoTime()
      try f(spark, sfDir)
      catch { case e: Throwable => System.err.println(s"setup $n failed: ${e.getMessage}") }
      println(f"SETUP $n%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case Some(fn) =>
          val t0 = System.nanoTime()
          val n = fn(spark, sfDir).count()
          val sec = (System.nanoTime() - t0) / 1e9
          println(f"TIME $name%-28s $sec%8.3f s  ($n rows)")
        case None => System.err.println(s"unknown query: $name")
      }
    }
    spark.stop()
  }
}
