package graft.operators

import graft.SparkTestBase
import graft.core.Tables

/** Partition-layout evidence: a date-partitioned write lets a day filter
  * prune whole directories at planning time — at 100 TB the difference
  * between scanning one day and scanning the lake.
  */
class PartitionPruningSpec extends SparkTestBase {

  test("day-partitioned write is pruned by a day filter at the scan") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = tempDir("events-partitioned")
    Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("day", to_date($"ts"))
      .write.partitionBy("day").mode("overwrite").parquet(dir)

    val read = spark.read.parquet(dir).filter($"day" === "2024-01-02")
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    assert(plan.contains("isnotnull(day"), plan)

    // only the matching partition's rows come back
    val expected = Tables.events(spark, "/root/testdata/sf0.001")
      .filter(to_date($"ts") === "2024-01-02").count()
    assert(read.count() == expected && expected > 0)

    // and the scan reads just one of the day directories
    val days = new java.io.File(dir).listFiles().count(_.getName.startsWith("day="))
    assert(days > 1, s"expected multiple day partitions, got $days")
  }
}
