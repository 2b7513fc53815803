package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components via alternating large-star /
  * small-star rounds (Kiveris, Lattanzi, Mirrokni, Rastogi,
  * Vassilvitskii — "Connected Components in MapReduce and Beyond",
  * SoCC'14).
  *
  * Why not plain min-label propagation: propagation needs O(diameter)
  * keyed rounds, which is fine for duplicate clusters (near-cliques,
  * diameter 2–3) but degenerates on the long chains a 100 TB crawl
  * corpus produces (mirror-of-a-mirror-of-a-mirror duplicate chains
  * where a~b~c~… and only adjacent pairs pass the jaccard cutoff): a
  * 64-deep chain needs 64 shuffle rounds. The alternating-star rounds
  * converge in O(log² n) worst case — each large-star halves the height
  * of every tall tree while small-star flattens the result toward stars
  * rooted at component minima — so the same chain resolves in a handful
  * of cycles.
  *
  * Both operations are pure keyed building blocks, identical in shape
  * to the propagation loop's rounds (equi-join + min-aggregate), so
  * everything said about 100 TB scaling there applies here: every round
  * is a hash shuffle on the node id with map-side combine, no
  * cross join, no driver-side graph state.
  *
  *  - large-star(u): link every neighbor v > u to m = min(Γ(u) ∪ {u}).
  *  - small-star(u), over edges oriented parent-first (u > v): link all
  *    of Γ(u) ∪ {u} to m = min(Γ(u) ∪ {u}).
  *
  * Both preserve connectivity (proved in the paper) and strictly reduce
  * a monovariant until the edge set is a forest of stars whose roots
  * are the component minima — at which point both operations are the
  * identity and the edge set is exactly {(member, component-min)}.
  *
  * Round boundaries are LAZY localCheckpoints: the convergence
  * signature (count + hash sum) is the action that materializes the
  * round's checkpoint, so each round costs ONE job, and lineage never
  * grows across rounds (the batch analog of streaming state — same
  * pattern the old propagation loop used, minus its second per-round
  * action).
  */
object ConnectedComponents {

  /** Component-minimum label per node: input is an edge list (any two
    * columns, one direction per undirected edge is enough; self-loops
    * ignored), output is (v, lbl) covering every node incident to at
    * least one edge. Node ids must be orderable (the label IS the
    * component's minimum id).
    */
  def starLabels(pairs: DataFrame, maxCycles: Int = 64): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._

    // canonical orientation (u > v), deduplicated — both star steps
    // preserve this invariant (they only ever link a node to a strictly
    // smaller one), so no re-orientation is needed inside the loop
    var e = pairs.toDF("a", "b").where($"a" =!= $"b")
      .select(greatest($"a", $"b").as("u"), least($"a", $"b").as("v"))
      .distinct()
      .localCheckpoint(eager = false)

    // Convergence detection: the edge set is compared by (count, Σ
    // xxhash64(u,v)) — an order-independent signature computable in the
    // same aggregate pass that materializes the round's checkpoint. A
    // false "converged" needs a 64-bit hash-SUM collision between
    // consecutive rounds of the same pipeline (≈2⁻⁶⁴ — far below any
    // hardware fault rate); a stale signature can only declare
    // NON-convergence, which the loud failure below catches.
    // (hash sum as DECIMAL(38,0): a 64-bit sum would overflow — an
    // ArithmeticException under ANSI — after ~2³² edges)
    def signature(df: DataFrame): (Long, java.math.BigDecimal) = {
      val r = df.agg(count(lit(1)),
        sum(xxhash64($"u", $"v")
          .cast(org.apache.spark.sql.types.DecimalType(38, 0)))).head()
      (r.getLong(0),
        if (r.isNullAt(1)) java.math.BigDecimal.ZERO else r.getDecimal(1))
    }
    def same(a: (Long, java.math.BigDecimal), b: (Long, java.math.BigDecimal)): Boolean =
      a._1 == b._1 && a._2.compareTo(b._2) == 0

    var sig = signature(e)
    var converged = sig._1 == 0L
    var cycles = 0
    while (!converged && cycles < maxCycles) {
      // large-star: group the SYMMETRIC neighborhood of u; every
      // strictly-larger neighbor links to the neighborhood minimum
      val sym = e.union(e.select($"v".as("u"), $"u".as("v")))
      val lsMin = sym.groupBy($"u").agg(min($"v").as("mn"))
        .select($"u", least($"mn", $"u").as("m"))
      val ls = sym.join(lsMin, "u")
        .where($"v" > $"u")
        .select($"v".as("u"), $"m".as("v"))
        .where($"u" =!= $"v")
        .distinct()
      // small-star: edges already parent-first (u > v ≥ m), so Γ(u) is
      // all-smaller; link Γ(u) ∪ {u} to its minimum
      val ssMin = ls.groupBy($"u").agg(min($"v").as("m"))
      val ss = ls.join(ssMin, "u")
        .select(explode(array(
          struct($"v".as("n"), $"m"),
          struct($"u".as("n"), $"m"))).as("p"))
        .select($"p.n".as("u"), $"p.m".as("v"))
        .where($"u" =!= $"v")
        .distinct()
      val next = ss.localCheckpoint(eager = false)
      val nsig = signature(next)
      converged = same(nsig, sig)
      sig = nsig
      e = next
      cycles += 1
    }
    // a silent non-fixpoint would mislabel every still-moving component
    if (!converged && sig._1 > 0)
      throw new IllegalStateException(
        s"connected components did not converge within $cycles star cycles")

    // fixpoint = star forest: every edge is (member, component-min);
    // roots label themselves
    val roots = e.select($"v").distinct().select($"v", $"v".as("lbl"))
    e.select($"u".as("v"), $"v".as("lbl")).union(roots)
  }
}
