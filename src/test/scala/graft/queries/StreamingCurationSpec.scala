package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Batch/stream unification of the curation ops: the row-local quality
  * transforms are plain DataFrame functions, so the SAME code that
  * filters a 100 TB batch corpus also scores documents as they arrive
  * on a stream — no reimplementation, no semantic drift between the
  * offline filter and the online one. (Stateless map-only transforms
  * are exactly the class Structured Streaming runs unchanged.) */
class StreamingCurationSpec extends SparkTestBase {

  test("repetition metrics produce identical values on a stream and a batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      (1L, "aa bb aa bb aa bb aa bb"), // looping text: high repetition
      (2L, "the quick brown fox jumps over a lazy dog"),
      (3L, "one two")) // sub-3-words: dropped, must not crash the stream

    val batch = TextOps.repetitionMetrics(docs.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.toSeq).toMap

    val in = MemoryStream[(Long, String)]
    val q = TextOps.repetitionMetrics(in.toDS().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("streamrep")
      .outputMode("append").start()
    in.addData(docs: _*)
    q.processAllAvailable(); q.stop()

    val streamed = spark.table("streamrep")
      .collect().map(r => r.getLong(0) -> r.toSeq).toMap
    assert(streamed == batch, "stream and batch must agree bit-for-bit")
    assert(!streamed.contains(3L) && streamed.size == 2)
    // and the looping doc is the one the filter would catch
    val topFrac = spark.table("streamrep")
      .select("doc_id", "top_bigram_frac").as[(Long, Double)].collect().toMap
    assert(topFrac(1L) > topFrac(2L))
  }

  test("mixture reweighting expands a stream exactly like a batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // one doc per weight tier: src0 w=2.25, src1 w=1.0, src2 w=0.5, src3 w=0.25
    val docs = (0L until 40L).map(i => (i, s"src${i % 4}"))

    val batch = Mixing.mixtureExpand(docs.toDF("doc_id", "source"))
      .as[(String, Long, Int)].collect().toSet

    val in = MemoryStream[(Long, String)]
    val q = Mixing.mixtureExpand(in.toDS().toDF("doc_id", "source"))
      .writeStream.format("memory").queryName("streammix")
      .outputMode("append").start()
    in.addData(docs: _*)
    q.processAllAvailable(); q.stop()

    val streamed = spark.table("streammix")
      .as[(String, Long, Int)].collect().toSet
    assert(streamed == batch, "stream and batch expansions must agree exactly")
    // the up-sampled tier really multiplies rows on the stream face too
    assert(streamed.count(_._1 == "src0") >= 20) // 10 docs x >=2 copies
  }
}
