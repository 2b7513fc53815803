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
}
