package graft.operators

import graft.SparkTestBase

/** Pins for the alternating large-star/small-star connected-components
  * operator. The headline case is the one that motivated replacing
  * min-label propagation in the dedup clustering path: a 64-deep
  * duplicate CHAIN (only adjacent pairs connected), whose diameter
  * exceeds the propagation loop's 32-round bound — the old loop threw
  * on it; the star rounds converge in O(log² n).
  */
class ConnectedComponentsSpec extends SparkTestBase {

  import spark.implicits._

  /** In-memory union-find oracle. */
  private def ufComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def labelsOf(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.starLabels(edges.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("64-long duplicate chain collapses to one component (propagation would throw)") {
    val chain = (0L until 64L).map(i => (i, i + 1))
    val labels = labelsOf(chain)
    assert(labels.keySet == (0L to 64L).toSet, "every chain member labeled")
    assert(labels.values.toSet == Set(0L), "all labels are the component minimum")
  }

  test("mixed graph (clique + chain + pair) matches a union-find oracle") {
    val clique = for { a <- 100L to 104L; b <- 100L to 104L if a < b } yield (a, b)
    val chain = (200L until 210L).map(i => (i, i + 1))
    val pair = Seq((300L, 301L))
    // edge directions deliberately mixed; duplicates included
    val edges = (clique ++ chain ++ pair ++ Seq((104L, 100L), (301L, 300L)))
    assert(labelsOf(edges) == ufComponents(edges))
  }

  test("self-loops are ignored; empty input yields empty labels") {
    assert(labelsOf(Seq((7L, 7L))).isEmpty)
    assert(labelsOf(Seq.empty).isEmpty)
  }

  test("randomized graphs match the union-find oracle (seeded)") {
    // structure-free confidence: sparse random graphs produce a mix of
    // singleton-pair, chain, and blob components; fixed seeds keep runs
    // deterministic
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(seed)
      val n = 60 + rnd.nextInt(40)
      val edges = Seq.fill(n) {
        val a = rnd.nextInt(80).toLong
        val b = rnd.nextInt(80).toLong
        (a, b)
      }.filter { case (a, b) => a != b }
      assert(labelsOf(edges) == ufComponents(edges), s"seed=$seed edges=$edges")
    }
  }

  test("labels are component minima on a graph with interleaved ids") {
    // two components whose id ranges interleave — guards against any
    // accidental reliance on contiguity
    val edges = Seq((1L, 5L), (5L, 9L), (2L, 6L), (6L, 10L), (9L, 13L))
    assert(labelsOf(edges) == ufComponents(edges))
  }
}
