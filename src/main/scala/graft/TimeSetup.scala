package graft
import org.apache.spark.sql.SparkSession

/** Setup-phase cost audit: times each staged-frame build of the dedup
  * family individually in this fresh JVM, so the itemized dedup_staging
  * number from the bench can be attributed to its sub-builds. */
object TimeSetup {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String)(body: => Any): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"SETUP $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }
    t("docs_wide") { graft.queries.TextOps.prewarmStaging(spark, sfDir) }
    graft.queries.Dedup.prewarmStagingTimed(spark, sfDir)
      .foreach { case (n, s) => println(f"SETUP dedup/$n%-18s $s%8.3f s") }
    spark.stop()
  }
}
