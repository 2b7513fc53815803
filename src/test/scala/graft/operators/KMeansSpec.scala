package graft.operators

import graft.SparkTestBase

/** Lloyd's k-means over the embeddings table: objective descent,
  * determinism, and assignment plumbing for the IVF index build. */
class KMeansSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  private def corpus = KMeans.prep(
    graft.core.Tables.embeddings(spark, sfDir), "embedding", "vec_id")

  test("each Lloyd iteration does not increase the cosine objective") {
    val c = corpus.cache()
    val w = (0 to 3).map(i => KMeans.wcss(c, KMeans.fit(c, k = 8, iters = i)))
    w.sliding(2).foreach { case Seq(prev, next) =>
      assert(next <= prev + 1e-9, s"objective rose: $w")
    }
    // and training actually moved the needle vs the raw init
    assert(w.last < w.head, s"no improvement: $w")
  }

  test("training is deterministic and assignment covers the corpus") {
    val c = corpus.cache()
    val a = KMeans.fit(c, k = 8, iters = 2).collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    val b = KMeans.fit(c, k = 8, iters = 2).collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(a == b)
    val assigned = KMeans.assign(c, KMeans.fit(c, k = 8, iters = 2))
    assert(assigned.count() == c.count())
    // every vector lands in exactly one cluster
    assert(assigned.select("vid").distinct().count() == c.count())
  }
}
