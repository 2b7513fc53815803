package graft.operators

import graft.SparkTestBase

/** BPE vocabulary induction semantics: the distributed trainer must
  * produce the EXACT merge list a single-machine reference trainer
  * derives from the same word-frequency dict (determinism is the
  * auditability contract), and applying the merges must re-tokenize
  * words consistently. */
class BpeTrainerSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  /** Reference trainer: plain Scala BPE over a word-count map. */
  private def refTrain(freq: Map[String, Long], n: Int): Seq[(String, String)] = {
    def init(w: String): Seq[String] = {
      val cs = w.map(_.toString)
      if (cs.isEmpty) Seq.empty else cs.init :+ (cs.last + BpeTrainer.EndOfWord)
    }
    def merge(ts: Seq[String], l: String, r: String): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < ts.length) {
        if (i + 1 < ts.length && ts(i) == l && ts(i + 1) == r) {
          out += (l + r); i += 2
        } else { out += ts(i); i += 1 }
      }
      out.toSeq
    }
    var words = freq.toSeq.map { case (w, c) => (init(w), c) }
    val ms = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var k = 0
    while (k < n) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (ts, c) =>
        ts.sliding(2).foreach {
          case Seq(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + c
          case _ =>
        }
      }
      if (counts.isEmpty) return ms.toSeq
      val best = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }._1
      ms += best
      words = words.map { case (ts, c) => (merge(ts, best._1, best._2), c) }
      k += 1
    }
    ms.toSeq
  }

  test("distributed merges equal the reference trainer bit-for-bit") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val freq = graft.core.Tables.documents(spark, sfDir)
      .select(explode(split($"text", " ")).as("w"))
      .filter(length($"w") > 0)
      .groupBy($"w").count()
      .as[(String, Long)].collect().toMap
    val expected = refTrain(freq, 16)
    val got = BpeTrainer.train(spark,
      graft.core.Tables.documents(spark, sfDir), 16)
      .map(m => (m.left, m.right))
    assert(got == expected, s"got $got\nexp $expected")
    assert(got.length == 16, "merge budget not exhausted on this corpus")
  }

  test("encode applies merges in rank order and shrinks symbol counts") {
    val ms = BpeTrainer.train(spark,
      graft.core.Tables.documents(spark, sfDir), 8)
    val w = "customer"
    val enc = BpeTrainer.encodeWord(w, ms)
    // round-trip: concatenating the symbols reproduces the word + marker
    assert(enc.mkString == w + BpeTrainer.EndOfWord)
    assert(enc.length <= w.length, s"no merge applied to '$w': $enc")
  }

  test("corpus encode stats equal a driver-side reimplementation") {
    import spark.implicits._
    val ms = BpeTrainer.train(spark,
      graft.core.Tables.documents(spark, sfDir), 16)
    val expected = graft.core.Tables.documents(spark, sfDir)
      .select($"source", $"text").as[(String, String)].collect()
      .groupBy(_._1).map { case (src, rows) =>
        var words = 0L; var subs = 0L; var chars = 0L
        rows.foreach { case (_, text) =>
          text.split(" ").filter(_.nonEmpty).foreach { w =>
            words += 1; chars += w.length
            subs += BpeTrainer.encodeWord(w, ms).length
          }
        }
        (src, words, subs, chars)
      }.toSet
    val got = BpeTrainer.encodeStats(spark, sfDir)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == expected)
    // merges must actually compress: fewer subwords than characters,
    // at least one subword per word
    assert(got.forall(r => r._3 < r._4 && r._3 >= r._2))
  }
}
