package graft.functions

import graft.SparkTestBase

/** The aggregate and scalar minhash forms must agree: signature over
  * exploded shingle rows == signature over the collected shingle array. */
class MinHashAggSpec extends SparkTestBase {

  test("minhash_agg over exploded shingles equals minhash_sig over arrays") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", functions.word_shingles($"text", 3).as("sh"))
      .filter(size($"sh") > 0)

    val viaScalar = docs
      .select($"doc_id", functions.minhash_sig($"sh", 32).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap

    val viaAgg = docs
      .select($"doc_id", explode($"sh").as("s"))
      .repartition(8) // force partial buffers + a real merge path
      .groupBy($"doc_id")
      .agg(MinHashAgg.minhash_agg($"s", 32).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap

    assert(viaScalar.keySet == viaAgg.keySet)
    viaScalar.foreach { case (id, sig) => assert(viaAgg(id) == sig, s"doc $id") }
  }

  test("minhash_agg works as a streaming aggregation (update mode)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    in.addData((1L, "a b c"), (1L, "b c d"), (2L, "x y z"))
    val q = in.toDF().toDF("doc_id", "shingle")
      .groupBy($"doc_id")
      .agg(MinHashAgg.minhash_agg($"shingle", 8).as("sig"))
      .writeStream.format("memory").queryName("mh").outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val rows = spark.table("mh").as[(Long, Seq[Long])].collect().toMap
    // streaming signature == batch signature over the same shingle sets
    val expected1 = Seq(Seq("a b c", "b c d")).toDF("sh")
      .select(functions.minhash_sig($"sh", 8)).head().getSeq[Long](0)
    assert(rows(1L) == expected1)
    assert(rows(2L).length == 8)
  }

  test("minhash_agg rejects bad numHashes at analysis time") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq("a").toDF("s")
    intercept[org.apache.spark.sql.AnalysisException] {
      df.agg(MinHashAgg.minhash_agg(col("s"), 0)).collect()
    }
  }
}
