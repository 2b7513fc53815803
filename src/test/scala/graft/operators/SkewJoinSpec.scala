package graft.operators

import graft.SparkTestBase
import graft.core.Tables

class SkewJoinSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  test("salted join equals the plain join on testdata") {
    import spark.implicits._
    val large = Tables.lineitem(spark, sfDir)
      .select($"l_orderkey", $"l_extendedprice")
    val smallKeyed = Tables.orders(spark, sfDir)
      .select($"o_orderkey".as("l_orderkey"), $"o_orderpriority")

    val plain = large.join(smallKeyed, Seq("l_orderkey"), "inner")
      .groupBy($"o_orderpriority").count()
      .as[(String, Long)].collect().toMap
    val salted = SkewJoin.saltedInnerJoin(large, smallKeyed, "l_orderkey", salts = 8)
      .groupBy($"o_orderpriority").count()
      .as[(String, Long)].collect().toMap
    assert(plain == salted)
  }

  test("AQE splits a hot partition at runtime (skew=true in the final plan)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{concat, lit, when}
    // The explicit salt (qSkewJoin) is the plan-time answer to KNOWN
    // skew; AQE's skew-join is the runtime answer to skew you didn't
    // predict: after the shuffle's map stage, oversized partitions are
    // split into sub-reads. Thresholds are lowered so the effect is
    // observable at test scale.
    val confs = Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8k",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      // one hot key carrying ~100x the bytes of any other partition
      val pad = "x" * 64
      val left = spark.range(50000).select(
          when($"id" < 40000, lit(1L)).otherwise($"id" % 10000).as("k"),
          concat(lit(pad), $"id").as("payload"))
      val right = spark.range(10000).select($"id".as("k"), ($"id" * 2).as("w"))
      val joined = left.join(right, Seq("k"))
      // collect() (not count()) so the plan we inspect is the one that ran
      assert(joined.collect().length == 50000)
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("isFinalPlan=true"), p)
      assert(p.contains("skew=true"), s"AQE did not mark the join skewed:\n$p")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("salting spreads a hot key — even fully identical rows — across salts") {
    import spark.implicits._
    // one hot key: 10k IDENTICAL rows (the case a content-hash salt
    // cannot spread)
    val large = (1 to 10000).map(_ => (1L, 7)).toDF("k", "v")
    val small = Seq((1L, "x")).toDF("k", "name")
    val joined = SkewJoin.saltedInnerJoin(large, small, "k", salts = 8)
    assert(joined.count() == 10000)
    val salts = large
      .withColumn("s",
        org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.monotonically_increasing_id(),
          org.apache.spark.sql.functions.lit(8L)))
      .select("s").distinct().count()
    assert(salts == 8, s"expected identical rows spread over all salts, got $salts")
  }
}
