package graft.queries

import graft.SparkTestBase
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property check of the repetition-signal HOF arithmetic against a
  * plain-Scala reference: random small-vocabulary corpora (small vocab
  * forces real bigram/trigram collisions), fixed seeds for determinism
  * (no scalatest-scalacheck glue in the offline cache). */
class RepetitionPropertiesSpec extends SparkTestBase {

  private def samples[A](g: Gen[A], n: Int): Seq[A] = {
    val params = Gen.Parameters.default
    (0 until n).flatMap(i => g(params, Seed(i.toLong)))
  }

  // vocabulary of 4 words → dense n-gram collisions
  private val word: Gen[String] = Gen.oneOf("aa", "bb", "cc", "dd")
  private val doc: Gen[String] = Gen.choose(3, 40)
    .flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))

  private def refMetrics(text: String): (Long, Long, Double) = {
    val ws = text.split(' ')
    val bg = ws.sliding(2).map(_.mkString(" ")).toSeq
    val tg = ws.sliding(3).map(_.mkString(" ")).toSeq
    val top = bg.groupBy(identity).values.map(_.size).max.toLong
    (bg.size.toLong, top, (tg.size - tg.distinct.size).toDouble / tg.size)
  }

  test("HOF metrics equal the brute-force reference on random corpora") {
    import spark.implicits._
    val docs = samples(doc, 80).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val got = TextOps.repetitionMetrics(docs.toDF("doc_id", "text"))
      .select("doc_id", "n_bigrams", "top_bigram_n", "dup_trigram_frac")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got.size == docs.size)
    docs.foreach { case (id, t) =>
      assert(got(id) == refMetrics(t), s"doc $id: '$t'")
    }
  }

  test("short documents are dropped, never crash") {
    import spark.implicits._
    val rows = TextOps.repetitionMetrics(
      Seq((1L, "one"), (2L, "one two"), (3L, "one two three"))
        .toDF("doc_id", "text"))
      .select("doc_id").as[Long].collect()
    assert(rows.toSet == Set(3L))
  }
}
