package graft.operators

import graft.SparkTestBase
import graft.core.Tables

/** Bucketed co-located join: writing both sides bucketed by the join key
  * lets Spark join them with NO shuffle exchange on either side — the
  * pre-partitioning technique for repeated large-large joins at 100 TB
  * (SURVEY §2.3; a shuffle of 100 TB per join vs zero).
  */
class BucketedJoinSpec extends SparkTestBase {

  test("joining two tables bucketed on the key needs no shuffle exchange") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    // a previously failed run may leave the managed location behind
    val whDir = new java.io.File(spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"))
    def rmTree(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmTree)
      f.delete(); ()
    }
    Seq("li_b", "ord_b").map(new java.io.File(whDir, _)).filter(_.exists()).foreach(rmTree)

    val sfDir = "/root/testdata/sf0.001"
    Tables.lineitem(spark, sfDir)
      .select($"l_orderkey", $"l_extendedprice")
      .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_b")
    Tables.orders(spark, sfDir)
      .select($"o_orderkey", $"o_orderpriority")
      .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_b")

    // force a non-broadcast join so the bucketing is what avoids the shuffle
    val joined = spark.table("li_b").hint("merge")
      .join(spark.table("ord_b"), $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderpriority").count()

    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan)
    // the join's children print below it; neither side may shuffle on the
    // join key (the only allowed exchange is the post-join group-by's)
    val belowJoin = plan.substring(plan.indexOf("SortMergeJoin"))
    assert(!belowJoin.contains("Exchange hashpartitioning(l_orderkey") &&
      !belowJoin.contains("Exchange hashpartitioning(o_orderkey"),
      s"bucketed join must not shuffle either side:\n$plan")

    // and the result matches the plain (shuffling) join
    val expected = Tables.lineitem(spark, sfDir)
      .select($"l_orderkey").join(
        Tables.orders(spark, sfDir).select($"o_orderkey", $"o_orderpriority"),
        $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderpriority").count()
      .as[(String, Long)].collect().toMap
    val got = joined.as[(String, Long)].collect().toMap
    assert(got == expected)
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
  }

  test("mirror identity includes key and bucket count — no silent layout reuse") {
    import spark.implicits._
    val sfDir = "/root/testdata/sf0.001"
    // same table, two layouts: a caller asking for a different bucketing
    // must get a SECOND mirror, not the first one's files — a silent
    // reuse would hand back a plan that shuffles after all (or worse,
    // wrong bucket-pruning assumptions)
    val byOrder = graft.sources.BucketedTables
      .bucketed(spark, sfDir, "orders", "o_orderkey")
    val byCust = graft.sources.BucketedTables
      .bucketed(spark, sfDir, "orders", "o_custkey", buckets = 4)
    // each layout satisfies ITS OWN key's clustered distribution straight
    // off the scan: grouping by that key must not add an exchange (under
    // AQE the initial plan text still prints the exchanges it would run)
    val pOrder = byOrder.groupBy($"o_orderkey").count()
      .queryExecution.executedPlan.toString
    assert(!pOrder.contains("Exchange"), pOrder)
    val pCust = byCust.groupBy($"o_custkey").count()
      .queryExecution.executedPlan.toString
    assert(!pCust.contains("Exchange"), pCust)
    // and the unrelated key still shuffles — proves the two layouts are
    // genuinely distinct files, not one catalog entry answering both
    val pCross = byOrder.groupBy($"o_custkey").count()
      .queryExecution.executedPlan.toString
    assert(pCross.contains("Exchange hashpartitioning(o_custkey"), pCross)
  }

  test("point predicate on the bucket key prunes to a single bucket") {
    import spark.implicits._
    val sfDir = "/root/testdata/sf0.001"
    val byOrder = graft.sources.BucketedTables
      .bucketed(spark, sfDir, "orders", "o_orderkey")
    val key = byOrder.select($"o_orderkey").head().getLong(0)
    // DisableUnnecessaryBucketedScan turns the bucketed read OFF when no
    // operator above needs its partitioning — which also forfeits bucket
    // pruning; pin the scan on for the pruning demonstration
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      val p = byOrder.filter($"o_orderkey" === key)
        .queryExecution.executedPlan.toString
      // bucket pruning: only the key's hash bucket is read — at 100 TB a
      // point lookup touches 1/8th of the files before any row filter runs
      assert(p.contains("SelectedBucketsCount: 1 out of 8"), p)
    } finally
      spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
  }
}
