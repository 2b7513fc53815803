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
    args.foreach { name =>
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
