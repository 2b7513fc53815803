package graft.etl

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Transactional batch warehouse over parquet.
  *
  * Reproduces the reference's per-page all-or-nothing load semantics
  * (`process_and_insert_data`, shift_data_processor.py:154-183: one DB
  * transaction covering 4 bulk inserts, rollback on any failure — exercised
  * by the duplicate-PK test, tests:242-300).
  *
  * Spark has no cross-table/cross-partition transaction, so atomicity is a
  * sink-side pattern (SURVEY §4): stage → validate → move → commit marker.
  * A batch is visible iff `_commits/<batchId>` exists; the marker is written
  * last, so a crash at any earlier point leaves garbage in `_staging/` or
  * unreferenced batch dirs but never a partially visible batch. Readers list
  * commit markers and read exactly those batch directories.
  *
  * Scale: batches are append-only directories (`<table>/batch=<id>`) — no
  * rewrite of existing data on ingest; constraint validation is a groupBy
  * on the PK (shuffle of key column only) and can be disabled for trusted
  * re-loads.
  */
final class ShiftWarehouse(spark: SparkSession, root: String, validatePks: Boolean = true) {

  import ShiftWarehouse._

  private def rootPath: Path = Paths.get(root)
  private def commitsDir: Path = rootPath.resolve("_commits")
  private def stagingDir(batchId: String): Path = rootPath.resolve("_staging").resolve(batchId)

  /** Commit markers are `<seq>.<batchId>` with a zero-padded monotonic
    * sequence assigned at commit time: COMMIT order, not batch-id
    * lexicographic order, defines the history. (Round-4 review finding:
    * id schemes like `run-p00001`/`run-kpis` don't sort in commit order,
    * which silently broke as-of snapshots keyed on id sorting.) Markers
    * written by the pre-sequence layout (bare batch id) are still read,
    * treated as sequence-less and ordered first by name. A legacy bare id
    * that itself LOOKS sequenced (e.g. `20240101.nightly`) is
    * disambiguated by checking that the parsed id's batch directory
    * actually exists — otherwise the truncated id would miss its
    * `batch=<id>` dirs and the batch's data would silently disappear
    * from every read (ADVICE r5). New ids that would collide with the
    * marker grammar are rejected at append time. */
  private def committedMarkers(): Seq[(String, String)] =
    if (!Files.isDirectory(commitsDir)) Seq.empty
    else {
      import scala.jdk.CollectionConverters._
      val s = Files.list(commitsDir)
      try s.iterator().asScala.map(_.getFileName.toString).toSeq.sorted
        .map(parseMarker).sortBy(_._1)
      finally s.close()
    }

  /** Marker-name → (seq, id), memoized: markers are immutable once
    * written, and the legacy disambiguation below stats up to 5 batch
    * dirs per marker — without the memo every table read would pay
    * O(markers × tables) filesystem stats (review r6). */
  private val markerParse =
    scala.collection.concurrent.TrieMap.empty[String, (String, String)]

  private def parseMarker(n: String): (String, String) =
    markerParse.getOrElseUpdate(n, n.split("\\.", 2) match {
      // A name whose FULL form owns a batch directory is a legacy bare
      // id, even if its prefix looks like a sequence — preferring the
      // full-name dir also kills the double-read a seq-parse would cause
      // when the truncated id collides with another batch's dir
      // (review r6).
      case Array(seq, id) if seq.length == 8 && seq.forall(_.isDigit) &&
        !batchDirExists(n) => (seq, id)
      case _ => ("", n)
    })

  /** Does any table carry data for this batch id? Used only to
    * disambiguate legacy (pre-sequence) markers from sequenced ones. */
  private def batchDirExists(id: String): Boolean =
    tableSchemas.keys.exists(t =>
      Files.isDirectory(rootPath.resolve(t).resolve(s"batch=$id")))

  private def committedBatchIds(): Seq[String] = committedMarkers().map(_._2)

  /** Read one normalized table (committed batches only). Empty-but-typed
    * DataFrame when nothing has been committed. */
  def table(name: String): DataFrame = tableFor(name, committedBatchIds())

  /** Snapshot read: the table AS OF a committed batch id — exactly the
    * batches committed at or before it, in COMMIT order (the sequence
    * stamped on the marker, independent of how batch ids sort). Batches
    * are append-only and markers immutable, so a snapshot is
    * reproducible forever: the same asOf reads the same bytes regardless
    * of how many batches landed since — the training-data
    * reproducibility contract ("the corpus as of snapshot X") that
    * ingest-time mutation cannot give. Cost is identical to a current
    * read: the pruning happens on the marker listing, no data is scanned
    * to decide membership. An id that was never committed is an error,
    * not a silent partial snapshot. */
  def tableAsOf(name: String, asOf: String): DataFrame = {
    val ids = committedBatchIds()
    val cut = ids.indexOf(asOf)
    require(cut >= 0, s"batch id '$asOf' was never committed")
    tableFor(name, ids.take(cut + 1))
  }

  private def tableFor(name: String, batchIds: Seq[String]): DataFrame = {
    val schema = tableSchemas(name)
    val dirs = batchIds
      .map(b => rootPath.resolve(name).resolve(s"batch=$b"))
      .filter(Files.isDirectory(_))
      .map(_.toString)
    if (dirs.isEmpty) spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(dirs: _*)
  }

  def shifts: DataFrame = table("shifts")
  def breaks: DataFrame = table("breaks")
  def allowances: DataFrame = table("allowances")
  def awardInterpretations: DataFrame = table("award_interpretations")
  def kpis: DataFrame = table("kpis")

  def normalized: NormalizedShifts =
    NormalizedShifts(shifts, breaks, allowances, awardInterpretations)

  /** Atomically append one batch across the four normalized tables.
    * Validates PK uniqueness (within batch and against committed data)
    * before anything becomes visible; any failure discards the staging
    * area — the reference's rollback. */
  def appendBatch(batch: NormalizedShifts, batchId: String): Unit = {
    val tables = Seq(
      "shifts" -> batch.shifts,
      "breaks" -> batch.breaks,
      "allowances" -> batch.allowances,
      "award_interpretations" -> batch.awardInterpretations)
    appendTables(tables, batchId)
  }

  /** Append KPI rows as their own committed batch. */
  def appendKpis(kpiRows: DataFrame, batchId: String): Unit =
    appendTables(Seq("kpis" -> kpiRows), batchId)

  private def appendTables(tables: Seq[(String, DataFrame)], batchId: String): Unit = {
    // Keep the marker grammar unambiguous: an id whose prefix reads as a
    // `<8-digit-seq>.` would collide with sequenced marker names.
    require(!batchId.matches("""\d{8}\..*"""),
      s"batch id '$batchId' collides with the <seq>.<id> marker grammar")
    require(!committedBatchIds().contains(batchId), s"batch $batchId already committed")
    val staging = stagingDir(batchId)
    try {
      tables.foreach { case (name, df) =>
        df.write.mode("overwrite").parquet(staging.resolve(name).toString)
      }
      if (validatePks) tables.foreach { case (name, _) =>
        pkColumns.get(name).foreach(pk => validatePk(name, pk, batchId, staging))
      }
      // Publish: move staged dirs into place, then the commit marker last.
      tables.foreach { case (name, _) =>
        val dest = rootPath.resolve(name).resolve(s"batch=$batchId")
        Files.createDirectories(dest.getParent)
        Files.move(staging.resolve(name), dest, StandardCopyOption.ATOMIC_MOVE)
      }
      Files.createDirectories(commitsDir)
      // single-writer (like the reference's one ETL process): next
      // sequence = max committed + 1, stamped on the marker name
      val nextSeq = committedMarkers().map(_._1).filter(_.nonEmpty)
        .map(_.toLong).maxOption.getOrElse(0L) + 1
      Files.createFile(commitsDir.resolve(f"$nextSeq%08d.$batchId"))
    } catch {
      case e: Throwable =>
        // rollback: nothing committed; remove staged files and any moved-
        // but-unmarked batch dirs (invisible to readers either way).
        deleteRecursively(staging)
        tables.foreach { case (name, _) =>
          deleteRecursively(rootPath.resolve(name).resolve(s"batch=$batchId"))
        }
        throw e
    } finally {
      deleteRecursively(staging)
    }
  }

  /** PK uniqueness, two cheap phases (round-1 version unioned staged with
    * the ENTIRE committed table and re-grouped — an O(total²) shuffle over
    * a P-page run):
    *  1. within-batch dups: groupBy over the small staged page only;
    *  2. staged-vs-committed: broadcast the staged PKs (a page is always
    *     small) and left-semi join against the committed PK column — a
    *     pruned single-column scan of committed data, NO shuffle of it.
    * Per-page cost is one committed-PK-column scan; for bulk re-loads use
    * validatePks=false and one [[validateAllPks]] at the end (O(total)
    * once instead of per page). */
  private def validatePk(name: String, pk: String, batchId: String, staging: Path): Unit = {
    val staged = spark.read.schema(tableSchemas(name)).parquet(staging.resolve(name).toString)
    val withinDup = staged.select(pk)
      .groupBy(col(pk)).count().filter(col("count") > 1).limit(1).collect()
    if (withinDup.nonEmpty)
      throw new IllegalStateException(
        s"duplicate key value violates unique constraint: $name.$pk = ${withinDup.head.get(0)} (batch $batchId)")
    val crossDup = table(name).select(pk)
      .join(broadcast(staged.select(pk)), Seq(pk), "left_semi")
      .limit(1).collect()
    if (crossDup.nonEmpty)
      throw new IllegalStateException(
        s"duplicate key value violates unique constraint: $name.$pk = ${crossDup.head.get(0)} (batch $batchId)")
  }

  /** One-shot global PK validation over everything committed — the
    * companion to validatePks=false bulk loads: one shuffle keyed by PK
    * per table, instead of a per-page scan. */
  def validateAllPks(): Unit =
    pkColumns.foreach { case (name, pk) =>
      val dup = table(name).select(pk)
        .groupBy(col(pk)).count().filter(col("count") > 1).limit(1).collect()
      if (dup.nonEmpty)
        throw new IllegalStateException(
          s"duplicate key value violates unique constraint: $name.$pk = ${dup.head.get(0)}")
    }

  private[graft] def committedBatches: Seq[String] = committedBatchIds()

  /** Compact the committed history into ONE batch per table — the
    * small-files maintenance a 100 TB ingest needs: per-page commits
    * accumulate a directory (and shuffle-partition-many files) per
    * batch, and scan planning degrades with file count long before data
    * size matters. Semantics:
    *
    *  - Equivalent current reads: `table(name)` returns the same rows
    *    before and after (asserted in the spec); files collapse to
    *    `numFiles` per table.
    *  - History REWRITE: like VACUUM/OPTIMIZE in table formats, prior
    *    batch ids disappear — as-of snapshots older than the compaction
    *    are no longer addressable. Callers needing history keep the
    *    pre-compaction root.
    *  - Single-writer, like append: the swap window (new marker written
    *    after old markers removed) is not atomic for concurrent READERS
    *    of the marker listing; the reference's one-ETL-process
    *    discipline applies. A table-format transaction log would make
    *    this a single swap — out of scope for a parquet warehouse.
    */
  def compact(batchId: String = "compacted", numFiles: Int = 1): Unit = {
    require(!batchId.matches("""\d{8}\..*"""),
      s"batch id '$batchId' collides with the <seq>.<id> marker grammar")
    val liveTables = tableSchemas.keys.toSeq.sorted
      .map(n => n -> table(n))
      .filter(_._2.take(1).nonEmpty)
    if (liveTables.isEmpty) return
    val staging = stagingDir(batchId)
    try {
      // stage the union of every committed batch, coalesced
      liveTables.foreach { case (name, df) =>
        df.coalesce(numFiles).write.mode("overwrite")
          .parquet(staging.resolve(name).toString)
      }
      // swap: retire old batch dirs + markers, publish the compacted batch
      val oldMarkers =
        if (Files.isDirectory(commitsDir)) {
          import scala.jdk.CollectionConverters._
          val s = Files.list(commitsDir)
          try s.iterator().asScala.toList finally s.close()
        } else Nil
      liveTables.foreach { case (name, _) =>
        val dest = rootPath.resolve(name).resolve(s"batch=$batchId")
        Files.createDirectories(dest.getParent)
        // old dirs first, so a crash mid-swap leaves the staged data
        // unpublished (markers gone -> tables read empty, recoverable
        // from staging) rather than double-counted
        val tdir = rootPath.resolve(name)
        if (Files.isDirectory(tdir)) {
          import scala.jdk.CollectionConverters._
          val s = Files.list(tdir)
          try s.iterator().asScala.filter(p =>
            p.getFileName.toString.startsWith("batch=") && p != dest)
            .foreach(deleteRecursively)
          finally s.close()
        }
        Files.move(staging.resolve(name), dest, StandardCopyOption.ATOMIC_MOVE)
      }
      oldMarkers.foreach(Files.deleteIfExists(_))
      markerParse.clear() // parse memo may hold retired names
      Files.createDirectories(commitsDir)
      Files.createFile(commitsDir.resolve(f"${1L}%08d.$batchId"))
    } finally deleteRecursively(staging)
  }

  /** `clear_data` (shift_data_processor.py:300-326): DELETE ... CASCADE ≡
    * dropping parent and all derived child tables + kpis. */
  def clear(): Unit = deleteRecursively(rootPath)
}

object ShiftWarehouse {

  val tableSchemas: Map[String, StructType] = Map(
    "shifts" -> ShiftSchemas.shiftsTable,
    "breaks" -> ShiftSchemas.breaksTable,
    "allowances" -> ShiftSchemas.allowancesTable,
    "award_interpretations" -> ShiftSchemas.awardsTable,
    "kpis" -> ShiftSchemas.kpisTable)

  /** PKs per initdb.sql:4,12,22,31. */
  val pkColumns: Map[String, String] = Map(
    "shifts" -> "shift_id",
    "breaks" -> "break_id",
    "allowances" -> "allowance_id",
    "award_interpretations" -> "award_id")

  private[graft] def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.deleteIfExists(f))
      finally s.close()
    }
}
