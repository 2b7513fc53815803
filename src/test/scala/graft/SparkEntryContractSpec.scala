package graft

import graft.queries._

/** Driver-contract invariants: the merged query map loses nothing to key
  * collisions, every oracle entry has a query, and every query executes
  * at the smallest scale factor (the driver's smoke tier).
  */
class SparkEntryContractSpec extends SparkTestBase {

  private val parts = Seq(
    "Relational" -> Relational.queries,
    "Normalize" -> Normalize.queries,
    "Events" -> Events.queries,
    "TextOps" -> TextOps.queries,
    "Dedup" -> Dedup.queries,
    "Similarity" -> Similarity.queries,
    "Scale" -> Scale.queries,
    "MultimodalMeta" -> MultimodalMeta.queries,
    "Analytics" -> Analytics.queries,
    "TemporalJoins" -> TemporalJoins.queries,
    "Curation" -> Curation.queries,
    "Mixing" -> Mixing.queries,
    "Retrieval" -> Retrieval.queries,
    "Corpus" -> Corpus.queries,
    "Passages" -> Passages.queries,
    "IndexOps" -> IndexOps.queries)

  test("no query is lost to a duplicate key across modules") {
    val all = parts.flatMap(_._2.keys)
    val dups = all.groupBy(identity).collect { case (k, vs) if vs.size > 1 => k }
    assert(dups.isEmpty, s"duplicate query keys across modules: $dups")
    assert(SparkEntry.queries.size == all.size)
  }

  test("every oracle entry points at a registered query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle sql without query: $missing")
  }

  test("every registered query executes at sf0.001 and plans no CartesianProduct") {
    // suite-wide scale invariant: an unkeyed non-broadcast cross join
    // anywhere is the one plan shape that can never survive 100 TB.
    // (crossJoin(broadcast(1-row totals)) plans as a bounded
    // BroadcastNestedLoopJoin, not CartesianProductExec, so the
    // legitimate totals/probe broadcasts pass; the declared-exhaustive
    // ANN faces use that broadcast form too.)
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val df = fn(spark, "/root/testdata/sf0.001")
        val cart = df.queryExecution.executedPlan.collect {
          case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
        }
        // the only nested loop the repo's conventions allow is the
        // bounded totals/probe broadcast — always BuildRight, with the
        // broadcast (bounded) side on the right; a BuildLeft NL means
        // the UNBOUNDED side got broadcast
        // match on the node's own buildSide — toString prints the whole
        // SUBTREE, so a substring check is satisfied by any BuildRight
        // descendant and misses the violation
        val badNl = df.queryExecution.executedPlan.collect {
          case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
            if b.buildSide == org.apache.spark.sql.catalyst.optimizer.BuildLeft => b
        }
        if (cart.nonEmpty) Some(s"$name: CartesianProductExec in plan")
        else if (badNl.nonEmpty) Some(s"$name: BuildLeft BroadcastNestedLoopJoin in plan")
        else { df.count(); None }
      }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("entry returns rows (driver smoke shape)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
