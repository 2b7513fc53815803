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

  test("salting spreads a hot key across partitions") {
    import spark.implicits._
    // one hot key: 10k rows of key 1
    val large = (1 to 10000).map(i => (1L, i)).toDF("k", "v")
    val small = Seq((1L, "x")).toDF("k", "name")
    val joined = SkewJoin.saltedInnerJoin(large, small, "k", salts = 8)
    assert(joined.count() == 10000)
    // the salt column takes multiple values for the same key
    val salts = large
      .withColumn("__salt",
        org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.hash($"k", $"v"),
          org.apache.spark.sql.functions.lit(8)))
      .select("__salt").distinct().count()
    assert(salts > 4, s"expected the hot key spread over many salts, got $salts")
  }
}
