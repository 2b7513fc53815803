package graft.queries

import graft.SparkTestBase

/** Invariant spec for the committed semantic cell index (judge r14 #2,
  * the semantic twins): adds and tombstones compose over the base,
  * door decisions are not revisited by deletes, and compaction is the
  * physical erasure that retires the delta chain. */
class SemanticIndexSpec extends SparkTestBase {

  test("apply → delete → compact lifecycle; door decisions stand") {
    import spark.implicits._
    val root = java.nio.file.Paths.get(tempDir("semidx"), "cells")
    // standing assignment: vectors 1,2 in cell 0; 11 in cell 7
    SemanticIndex.writeBase(spark, root,
      Seq((1L, 0L), (2L, 0L), (11L, 7L)).toDF("vec_id", "cell"))
    // ingest: arrival 6 admitted into cell 0; arrival 16 was REJECTED
    // at the door (near-dup of 6) and therefore never written
    SemanticIndex.applyMaintenance(spark, root,
      Seq((6L, 0L)).toDF("vec_id", "cell"),
      spark.emptyDataset[Long].toDF("vec_id"))
    def view() = SemanticIndex.cells(spark, root)
      .as[(Long, Long)].collect().toSet
    assert(view() == Set((1L, 0L), (2L, 0L), (11L, 7L), (6L, 0L)))
    // tombstone 6's suppressed partner's suppressor... delete 6: the
    // rejected 16 does NOT reappear — re-admission is the resurface
    // audit's policy surface, never the index's silent invention
    SemanticIndex.applyMaintenance(spark, root,
      spark.emptyDataset[(Long, Long)].toDF("vec_id", "cell"),
      Seq(6L).toDF("vec_id"))
    assert(view() == Set((1L, 0L), (2L, 0L), (11L, 7L)))
    // compact: same view, physically — and the delta chain is retired
    SemanticIndex.compact(spark, root)
    assert(view() == Set((1L, 0L), (2L, 0L), (11L, 7L)))
    val ds = java.nio.file.Files.list(root)
    try {
      val leftover = ds.filter(_.getFileName.toString.startsWith("delta="))
        .toArray
      assert(leftover.isEmpty, leftover.mkString(", "))
    } finally ds.close()
  }

  test("unmarked delta residue is invisible and cleared by the next publish") {
    import spark.implicits._
    val root = java.nio.file.Paths.get(tempDir("semidxres"), "cells")
    SemanticIndex.writeBase(spark, root,
      Seq((1L, 0L), (2L, 0L)).toDF("vec_id", "cell"))
    val residue = root.resolve("delta=1")
    java.nio.file.Files.createDirectories(residue.resolve("adds"))
    java.nio.file.Files.writeString(residue.resolve("adds").resolve("junk"), "x")
    def view() = SemanticIndex.cells(spark, root)
      .as[(Long, Long)].collect().toSet
    assert(view() == Set((1L, 0L), (2L, 0L)), "residue must be invisible")
    SemanticIndex.applyMaintenance(spark, root,
      Seq((6L, 0L)).toDF("vec_id", "cell"),
      spark.emptyDataset[Long].toDF("vec_id"))
    assert(view() == Set((1L, 0L), (2L, 0L), (6L, 0L)))
    assert(java.nio.file.Files.exists(residue.resolve("_GRAFT_COMMITTED")))
    assert(!java.nio.file.Files.exists(residue.resolve("adds").resolve("junk")))
  }

  test("composed committed cells equal the fresh live assignment on the corpus") {
    import spark.implicits._
    // the oracle face asserts this against DuckDB at sf0.01; same
    // agreement spec-side on the small corpus: composed == corpusCells
    // restricted to (standing ∪ admitted) minus tombstones
    val sfDir = "/root/testdata/sf0.001"
    val got = Similarity.qSemanticIndexCells(spark, sfDir)
      .as[(Long, Long)].collect().toSet
    val all = Similarity.corpusCells(spark, sfDir)
      .selectExpr("vec_id", "cell").as[(Long, Long)].collect().toSet
    val droppedAttach = Similarity.qSemanticDedupIncremental(spark, sfDir)
      .select("dropped_id").as[Long].collect().toSet
    val droppedBatch = Similarity.qSemanticArrivalPairs(spark, sfDir)
      .select("dropped_id").as[Long].collect().toSet
    val expect = all.filter { case (id, _) =>
      id % 17 != 3 &&
        (id % 10 != 6 || (!droppedAttach(id) && !droppedBatch(id)))
    }
    assert(got == expect)
    assert(got.nonEmpty)
  }
}
