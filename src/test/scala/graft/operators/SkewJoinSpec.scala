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
