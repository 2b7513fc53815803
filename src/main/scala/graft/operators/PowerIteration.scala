package graft.operators

/** Driver-side kernel for the FIXED-ROUND damped power iterations
  * (q_dup_pagerank over the verified near-dup graph, q_textrank over
  * the bigram co-occurrence graph) — the [[DriverComponents]] pattern
  * applied to the repo's other Pregel-shaped fixpoints.
  *
  * Rationale (opt guide §1.2 "the distributed algorithm"): each
  * distributed round is one equi-join plus one hash aggregation over a
  * MODEL-SCALE frame (the duplicate subgraph / the bigram vocabulary —
  * both ≪ corpus by construction), so a 3-round run pays ~6 shuffle
  * stage schedules to move kilobytes-to-megabytes. When the edge list
  * fits under a cap, collecting it once and iterating locally computes
  * the IDENTICAL exact integers: per-edge contribution
  * (r·w) div wt as BigInt floor division (all values nonnegative, so
  * BigInt truncation ≡ the DECIMAL(38,0)/HUGEINT `div` both engines
  * run), per-node update base + (85·Σc) div 100 with the sum exact.
  * Order-independence is inherited from exact integer arithmetic, so
  * the distributed and driver paths can never disagree — callers keep
  * the distributed loop as the over-cap fallback, same contract as
  * DriverComponents (the answer never changes, only the execution
  * strategy).
  */
object PowerIteration {

  /** Fixed `iters` rounds of the damped update over a weighted directed
    * edge list:
    *   r0(src) = scale for every src;
    *   c(e)    = (r(src) · w) div wt(src), wt = Σ w per src;
    *   r'(dst) = (15·scale) div 100 + (85 · Σ_e→dst c(e)) div 100.
    * Returns the final (node → rank) map (keys = nodes with ≥ 1
    * incoming edge from a ranked node after the last round — exactly
    * the distributed groupBy(dst) key set). */
  def damped[K](edges: Iterable[(K, K, Long)], scale: Long,
      iters: Int): Map[K, Long] = {
    val wt: Map[K, Long] = edges.groupBy(_._1)
      .map { case (s, es) => s -> es.iterator.map(_._3).sum }
    val base = 15L * scale / 100
    var r: Map[K, Long] = wt.map { case (s, _) => s -> scale }
    for (_ <- 1 to iters) {
      r = edges.iterator
        .filter { case (s, _, _) => r.contains(s) }
        .map { case (s, d, w) => d -> (BigInt(r(s)) * w / wt(s)) }
        .toSeq.groupBy(_._1)
        .map { case (d, cs) =>
          d -> (base + (cs.iterator.map(_._2).sum * 85 / 100).toLong)
        }
    }
    r
  }

  /** UTF-8 binary comparison — Spark/DuckDB order strings by UTF-8
    * bytes, while Java's String.compareTo orders by UTF-16 code units;
    * the two differ on supplementary characters, so a driver-side
    * ORDER BY must compare the bytes to stay engine-exact. */
  def utf8Less(a: String, b: String): Boolean = {
    val ba = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val bb = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(ba.length, bb.length)
    var i = 0
    while (i < n) {
      val x = ba(i) & 0xff; val y = bb(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    ba.length < bb.length
  }
}
