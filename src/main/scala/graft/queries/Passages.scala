package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Passage-granularity curation operators — the rungs BETWEEN document
  * dedup (Dedup.qDedupExact/qDedupNear) and span surgery
  * (Dedup.qSpanDedup): the line-level dedup family (the CCNet/
  * RefinedWeb preprocessing step — Wenzek et al. '19 dedup paragraphs
  * by hash before anything else touches the crawl) in four faces —
  * accounting (q_line_dedup), surgery (q_line_surgery), append-only
  * incremental maintenance (q_line_dedup_incremental), and the
  * boilerplate top-k readout (q_boilerplate_topk) — plus winnowing
  * fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD '03 — the MOSS
  * local fingerprinting scheme that guarantees any sufficiently long
  * shared passage is detected while storing a fraction of the gram
  * index). Both families also serve streaming gates
  * (EventStream.corpusWinnowSuspects / lineBoilerplateStats) that run
  * the SAME extraction operators against standing indexes.
  * No reference analog (ref/etl has no text layer).
  *
  * Scale design:
  *  - Segmentation and fingerprint selection are ROW-LOCAL array
  *    transforms — the corpus text never shuffles; only narrow
  *    (hash, id) rows leave the scan, exactly the map-only shape a
  *    100 TB pass needs.
  *  - Line dedup's keeper choice is one hash aggregation keyed by the
  *    segment fingerprint (md5 — the qDedupExact "group on the
  *    fingerprint, not the text" rule) plus one aggregated-size join;
  *    no window, no sort, no text in any shuffle.
  *  - Winnowing's pair generation is the inverted-index equi-join on
  *    the selected fingerprints, with the two standard sparsifiers
  *    applied INSIDE the index: df ≥ 2 (a fingerprint seen once can
  *    pair with nothing) and df ≤ 32 (MOSS's shared-boilerplate cut —
  *    also the skew guard that bounds any bucket's fan-out; boilerplate
  *    is line dedup's job, not the pair detector's).
  *
  * Oracle playbook as everywhere: exact integers end to end, at most
  * one final correctly-rounded double division, lowercase-hex md5
  * compared as strings in both engines.
  */
object Passages {

  // --------------------------------------------------------------------
  // LINE-LEVEL DEDUP — CCNet's first pass: hash every "line", keep ONE
  // occurrence of each distinct line corpus-wide, and account for what
  // the pass removes per source. The synthetic corpus has no newlines,
  // so a "line" here is a non-overlapping 8-token segment (j-th segment
  // = tokens [8j, 8j+8)); the operator is segmentation-agnostic — a
  // production corpus swaps split-on-'\n' in for the block rule and
  // nothing downstream changes. The keeper of a duplicated segment is
  // the globally first occurrence: min over the exact integer
  // occurrence key doc_id·2³² + j (j < 2³² — segment index is bounded
  // by document length, asserted in PassagesSpec), so both engines
  // pick the identical occurrence with no struct/tuple min portability
  // concerns.
  private val SegTokens = 8

  /** Per-occurrence segment rows: every input column except `text`,
    * plus (j, s) — row-local. The short-document guard is a CASE around
    * the generator rather than a Filter, for two reasons: Spark's
    * `sequence(0, -1)` counts DOWN rather than producing an empty
    * array (the guard must precede the bound going negative), and a
    * text Filter would be pushed below the streaming face's
    * EventTimeWatermark, letting short arrivals stall the event-time
    * clock (the winnowFingerprints lesson). The oracle's
    * `range(len // 8)` is empty for the same rows. The column
    * pass-through is what lets EventStream.lineBoilerplateStats run
    * this SAME extraction with event time intact. */
  private[graft] def segmentRows(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val keep = docs.columns.filter(_ != "text").map(col)
    // fused native kernel (functions.WordBlocks): each block is emitted
    // zero-copy from its contiguous byte span — replaces the interpreted
    // transform/slice/concat_ws HOF chain (and its two-level
    // sequence(0, n<0) guard; the kernel returns an empty array for
    // short docs, preserving the no-Filter watermark contract). The HOF
    // formulation remains in ExpressionPropertiesSpec as the
    // property-test reference.
    docs.select(keep :+
      posexplode(graft.functions.functions.word_blocks($"text", SegTokens))
        .as(Seq("j", "s")): _*)
  }

  /** Line-dedup accounting over any (doc_id, source, text) frame — a
    * plain DataFrame function so the spec can plant duplicate segments
    * in a synthetic frame and check the keeper rule directly. */
  private[queries] def lineDedupReport(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    // (segment-fingerprint, source): occurrence count + first occurrence
    // key within the source; segment TEXT is dropped before the shuffle
    val perSrc = segmentRows(docs)
      .select(md5($"s".cast("binary")).as("h"), $"source",
        (shiftLeft($"doc_id", 32) + $"j").as("occ"))
      .groupBy($"h", $"source")
      .agg(count(lit(1)).as("n"), min($"occ").as("mo"))
    // global first occurrence per fingerprint; joining the two
    // AGGREGATED frames on h is narrow (one row per (h, source) vs one
    // per h — both ≪ corpus occurrences)
    val global = perSrc.groupBy($"h").agg(min($"mo").as("gmo"))
    perSrc.join(global, Seq("h"))
      .groupBy($"source")
      .agg(sum($"n").as("n_segments"),
        sum(when($"mo" === $"gmo", 1L).otherwise(0L)).as("n_kept"),
        sum($"n" - when($"mo" === $"gmo", 1L).otherwise(0L)).as("n_removed"),
        (lit(SegTokens.toLong) *
          sum($"n" - when($"mo" === $"gmo", 1L).otherwise(0L))).as("tokens_removed"))
  }

  def qLineDedup(spark: SparkSession, sfDir: String): DataFrame =
    lineDedupReport(Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("text")))

  val qLineDedupSql: String =
    s"""WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS ws
       |           FROM documents),
       |seg AS (SELECT doc_id, source, j,
       |               array_to_string(ws[j*$SegTokens+1 : j*$SegTokens+$SegTokens], ' ') AS s
       |        FROM w, unnest(range(len(ws) // $SegTokens)) AS t(j)),
       |g1 AS (SELECT md5(s) AS h, source, count(*) AS n,
       |              min(doc_id*4294967296 + j) AS mo
       |       FROM seg GROUP BY 1, 2),
       |g2 AS (SELECT h, min(mo) AS gmo FROM g1 GROUP BY 1)
       |SELECT source,
       |       CAST(sum(n) AS BIGINT) AS n_segments,
       |       CAST(sum(CASE WHEN mo = gmo THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |       CAST(sum(n - CASE WHEN mo = gmo THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
       |       CAST($SegTokens * sum(n - CASE WHEN mo = gmo THEN 1 ELSE 0 END) AS BIGINT)
       |         AS tokens_removed
       |FROM g1 JOIN g2 USING (h)
       |GROUP BY 1""".stripMargin

  // --------------------------------------------------------------------
  // BOILERPLATE TOP-K — the governance readout of the pass above: WHAT
  // are each source's most-repeated segments (navigation chrome,
  // licence blocks, templates)? The counting phase shuffles only
  // (md5, source, int) rows — never segment text — and the top-5
  // selection per source runs through the native bounded top-k
  // operator (plans/TopKPerGroup: O(n·k) compares, k-row state, no
  // per-source sort). Only then is the TEXT of the ≤ 5·sources winners
  // fetched, by a broadcast semi-probe of the winner fingerprints
  // against a distinct exemplar frame — the text a human reads rides a
  // bounded frame, not a corpus shuffle.
  def qBoilerplateTopk(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val segs = segmentRows(Tables.documents(spark, sfDir)
      .select($"doc_id", $"source", $"text"))
    val counts = segs
      .select(md5($"s".cast("binary")).as("h"), $"source")
      .groupBy($"source", $"h").agg(count(lit(1)).as("n"))
      .filter($"n" >= 2) // a segment seen once is content, not boilerplate
    val top = graft.plans.TopKPerGroup.topKPerGroup(counts,
      Seq($"source"), Seq($"n".desc, $"h".asc), 5)
    // exemplar text for the winners only: md5 is injective on this
    // corpus (and any collision would merge counts identically in both
    // engines); min(s) pins a deterministic representative regardless.
    // review r9 (advisor): the semi-probe must come BEFORE the exemplar
    // aggregation — aggregating min(s) corpus-wide first would ride
    // segment text over a vocabulary-scale shuffle; filtering against
    // the broadcast ≤ 5·sources winner fingerprints keeps the text agg
    // bounded by the winners' occurrences (PassagesSpec pins the plan)
    val exemplar = segs.select(md5($"s".cast("binary")).as("h"), $"s")
      .join(broadcast(top.select($"h").distinct()), Seq("h"), "left_semi")
      .groupBy($"h").agg(min($"s").as("segment"))
    top.join(exemplar, Seq("h"))
      .select($"source", $"segment", $"n",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy($"source").orderBy($"n".desc, $"h".asc)).as("rnk"))
  }

  val qBoilerplateTopkSql: String =
    s"""WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS ws
       |           FROM documents),
       |seg AS (SELECT doc_id, source, j,
       |               array_to_string(ws[j*$SegTokens+1 : j*$SegTokens+$SegTokens], ' ') AS s
       |        FROM w, unnest(range(len(ws) // $SegTokens)) AS t(j)),
       |cnt AS (SELECT source, md5(s) AS h, min(s) AS segment, count(*) AS n
       |        FROM seg GROUP BY 1, 2
       |        HAVING count(*) >= 2),
       |rk AS (SELECT source, segment, n,
       |              CAST(row_number() OVER (
       |                PARTITION BY source ORDER BY n DESC, h) AS INTEGER) AS rnk
       |       FROM cnt)
       |SELECT source, segment, n, rnk FROM rk WHERE rnk <= 5""".stripMargin

  // --------------------------------------------------------------------
  // INCREMENTAL LINE DEDUP — the maintained-report face under
  // append-only ingest: when a new document batch lands, the per-source
  // accounting updates from (a) the STANDING report and (b) the batch
  // joined against the standing distinct-fingerprint index — the old
  // corpus is never rescanned. The decomposition is exact because
  // ingest is append-only: every batch occurrence key doc_id·2³²+j
  // exceeds every standing key (ids grow), so a standing keeper can
  // never be displaced — a batch occurrence is kept iff its fingerprint
  // is ABSENT from the standing index and it is the batch's own first
  // occurrence. The demonstration split carves the corpus at the 90%
  // id mark (exact integer (max·9) div 10, computed plan-side and
  // broadcast); production replaces the filter with the actual arrival.
  //
  // The ORACLE is the flat full-corpus report (the same SQL as
  // q_line_dedup): hash-green certifies that incremental maintenance
  // and full recomputation are value-identical — the equivalence IS the
  // operator's contract, checked by the driver itself.
  def qLineDedupIncremental(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id", $"source", $"text")
    val thr = docs.agg(expr("(max(doc_id) * 9) div 10").as("thr"))
    val parts = docs.crossJoin(broadcast(thr))
    val standing = parts.filter($"doc_id" < $"thr").drop("thr")
    val batch = parts.filter($"doc_id" >= $"thr").drop("thr")
    val standingReport = lineDedupReport(standing)
    // standing distinct-fingerprint index: the table the streaming gate
    // already maintains (EventStream.corpusSegmentIndex)
    val standingIdx = segmentRows(standing)
      .select(md5($"s".cast("binary")).as("h")).distinct()
    val perSrc = segmentRows(batch)
      .select(md5($"s".cast("binary")).as("h"), $"source",
        (shiftLeft($"doc_id", 32) + $"j").as("occ"))
      .groupBy($"h", $"source")
      .agg(count(lit(1)).as("n"), min($"occ").as("mo"))
    val batchFirst = perSrc.groupBy($"h").agg(min($"mo").as("gmo"))
      // novelty gate: a fingerprint already standing keeps its standing
      // keeper — only absent ones earn a batch keeper
      .join(standingIdx, Seq("h"), "left_anti")
    val batchReport = perSrc
      .join(batchFirst, Seq("h"), "left")
      .groupBy($"source")
      .agg(sum($"n").as("n_segments"),
        sum(when($"mo" === $"gmo", 1L).otherwise(0L)).as("n_kept"),
        sum($"n" - when($"mo" === $"gmo", 1L).otherwise(0L)).as("n_removed"),
        (lit(SegTokens.toLong) *
          sum($"n" - when($"mo" === $"gmo", 1L).otherwise(0L))).as("tokens_removed"))
    standingReport.unionByName(batchReport)
      .groupBy($"source")
      .agg(sum($"n_segments").as("n_segments"), sum($"n_kept").as("n_kept"),
        sum($"n_removed").as("n_removed"),
        sum($"tokens_removed").as("tokens_removed"))
  }

  // --------------------------------------------------------------------
  // LINE SURGERY — the transform face of the accounting above: emit
  // each document's cleaned text with every non-keeper segment removed
  // (CCNet's actual output — the report prices the pass, this performs
  // it; the span-granularity sibling is Dedup.qSpanDedup). The keeper
  // rule is THE SAME globally-first-occurrence key as qLineDedup, so
  // the two faces cannot disagree about what survives. The trailing
  // partial segment (tokens beyond the last full 8-block) is not a
  // segment and is always kept; a document whose every segment loses
  // still emits a row (its tail, possibly empty) — surgery never drops
  // documents, only lines.
  //
  // Scale shape: the keeper decision joins the occurrence frame to the
  // per-fingerprint min (both narrow — md5 + integers; the segment
  // TEXT rides only the kept rows into the per-doc rebuild, which is
  // one doc-keyed aggregation); the tail is row-local. The rebuild
  // orders each doc's kept segments by their position — inside one
  // hash-agg group (sort_array of ≤ n/8 structs), not a plan-level
  // Sort.
  def qLineSurgery(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir).select($"doc_id", $"text")
    val occ = segmentRows(docs)
      .select($"doc_id", $"j", $"s", md5($"s".cast("binary")).as("h"),
        (shiftLeft($"doc_id", 32) + $"j").as("occ"))
    val keeper = occ.groupBy($"h").agg(min($"occ").as("gmo"))
    val kept = occ.join(keeper, Seq("h")).filter($"occ" === $"gmo")
    val segPart = kept.groupBy($"doc_id")
      .agg(array_join(transform(sort_array(collect_list(struct($"j", $"s"))),
        x => x.getField("s")), " ").as("seg"))
    val ws = split($"text", " ")
    val nseg = floor(size(ws) / SegTokens).cast("int")
    val tails = docs.select($"doc_id",
      concat_ws(" ", slice(ws, nseg * SegTokens + lit(1),
        size(ws) - nseg * SegTokens)).as("tail"))
    tails.join(segPart, Seq("doc_id"), "left")
      .select($"doc_id",
        when($"seg".isNull || $"seg" === "", $"tail")
          .when($"tail" === "", $"seg")
          .otherwise(concat($"seg", lit(" "), $"tail")).as("text_clean"))
  }

  val qLineSurgerySql: String =
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |seg AS (SELECT doc_id, j,
       |               array_to_string(ws[j*$SegTokens+1 : j*$SegTokens+$SegTokens], ' ') AS s
       |        FROM w, unnest(range(len(ws) // $SegTokens)) AS t(j)),
       |occ AS (SELECT doc_id, j, s, md5(s) AS h, doc_id*4294967296 + j AS occ
       |        FROM seg),
       |k AS (SELECT h, min(occ) AS gmo FROM occ GROUP BY 1),
       |kept AS (SELECT doc_id, j, s FROM occ JOIN k USING (h) WHERE occ = gmo),
       |segpart AS (SELECT doc_id, string_agg(s, ' ' ORDER BY j) AS seg
       |            FROM kept GROUP BY 1),
       |tails AS (SELECT doc_id,
       |            -- coalesce: an out-of-range slice (no tail) is NULL in
       |            -- DuckDB, and '' || NULL would null the whole rebuild
       |            coalesce(array_to_string(
       |              ws[(len(ws) // $SegTokens) * $SegTokens + 1 : len(ws)], ' '), '')
       |              AS tail
       |          FROM w)
       |SELECT t.doc_id AS doc_id,
       |       CASE WHEN seg IS NULL OR seg = '' THEN tail
       |            WHEN tail = '' THEN seg
       |            ELSE seg || ' ' || tail END AS text_clean
       |FROM tails t LEFT JOIN segpart USING (doc_id)""".stripMargin

  // --------------------------------------------------------------------
  // WINNOWING FINGERPRINTS — Schleimer '03: hash every k-gram, slide a
  // w-window over the hash sequence, record the MINIMUM hash of each
  // window, dedupe. The guarantee (their Theorem: any shared run of at
  // least w+k−1 tokens contributes at least one shared fingerprint —
  // the window over that run is common to both documents and both pick
  // its minimum) survives the set-valued formulation used here, at an
  // expected density of 2/(w+1) of the full gram index — the storage
  // lever that makes passage-level fingerprinting affordable where the
  // exhaustive gram8 table (Dedup.corpusGrams) is the exact tool.
  // k = 5 tokens, w = 4 windows → guaranteed detection of any shared
  // run of ≥ 8 tokens, the same threshold as the span-dedup family.
  private val GramK = 5
  private val WinW = 4
  private val MaxDf = 32 // MOSS common-code cut + bucket fan-out bound
  private val MinShared = 3 // report pairs sharing ≥ 3 fingerprints

  /** Per-document winnowed fingerprint set (doc_id, f) — row-local
    * selection: gram hashing, window minima and dedup all happen inside
    * array transforms on the scan; only (doc_id, 8-hex-char) rows are
    * emitted. Docs shorter than w+k−1 tokens have no complete window
    * and produce no fingerprints (the scheme's own blind spot — by
    * design, short fragments are the exact-dedup family's job).
    * Emits every input column EXCEPT `text` plus the 12-hex-char `f` —
    * the pass-through is what lets the streaming face
    * (EventStream.corpusWinnowSuspects) run this SAME operator with its
    * event-time column intact, so batch and stream cannot drift. */
  private[graft] def winnowFingerprints(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val keep = docs.columns.filter(_ != "text").map(col)
    // fused native kernel (functions.WinnowFps): one md5 per gram
    // hashed straight from its contiguous byte span, window minima
    // compared as 48-bit longs, hex rendered only on selection. The
    // HOF formulation this replaces is kept in PassagesSpec as the
    // property-test reference — it both re-ran the whole gram-hashing
    // pass inside every window lambda (interpreted + O(n·w) md5 calls)
    // and needed a two-level CASE guard against sequence(0, n<0)
    // counting down. Short docs yield an empty array (zero rows after
    // explode), never a Filter — a text predicate would be pushed below
    // the streaming face's EventTimeWatermark and a run of short
    // arrivals would stall the event-time clock and every open window's
    // state with it (measured: the gate's flush row never fired).
    docs.select(keep :+
      explode(graft.functions.functions.winnow_fps($"text", GramK, WinW))
        .as("f"): _*)
  }

  private[graft] def winnowMaxDf: Int = MaxDf
  private[graft] def winnowMinShared: Int = MinShared

  /** Fingerprint frame staged per (session, corpus): the pair query
    * references it from three branches (both join sides + the per-doc
    * cardinalities); at 100 TB it is the maintained fingerprint table
    * (a ~2/(w+1) fraction of the gram index) written next to the
    * corpus. */
  private def stagedFps(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.Staging.persisted(spark, sfDir, "winnow-fps") {
      winnowFingerprints(
        Tables.documents(spark, sfDir).select(col("doc_id"), col("text")))
    }

  /** Materialize the staged fingerprint table — the bench's measured
    * SETUP phase; at 100 TB this is the ingest-time fingerprint build
    * maintained next to the corpus. On-demand if nobody prewarmed. */
  def prewarmStaging(spark: SparkSession, sfDir: String): Unit = {
    stagedFps(spark, sfDir).count()
    ()
  }

  /** MOSS-style pair report over any fingerprint frame (spec entry). */
  private[queries] def winnowPairs(fp: DataFrame): DataFrame = {
    import fp.sparkSession.implicits._
    val cnt = fp.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    // inverted index: only fingerprints that CAN pair (df ≥ 2) and are
    // not shared boilerplate (df ≤ MaxDf) enter the self-join — the
    // df cut is also the skew bound: no bucket fans out past MaxDf²
    val idx = fp.join(
      fp.groupBy($"f").agg(count(lit(1)).as("df"))
        .filter($"df" >= 2 && $"df" <= MaxDf)
        .select($"f"),
      Seq("f"))
    val shared = idx.as("a")
      .join(idx.as("b"), $"a.f" === $"b.f" && $"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter($"n_shared" >= MinShared)
    shared
      .join(cnt.select($"doc_id".as("doc_a"), $"n".as("n_a")), Seq("doc_a"))
      .join(cnt.select($"doc_id".as("doc_b"), $"n".as("n_b")), Seq("doc_b"))
      .select($"doc_a", $"doc_b", $"n_shared", $"n_a", $"n_b",
        // exact integers above; ONE final correctly-rounded division
        ($"n_shared".cast("double") / ($"n_a" + $"n_b" - $"n_shared")).as("sim"))
  }

  def qWinnow(spark: SparkSession, sfDir: String): DataFrame =
    winnowPairs(stagedFps(spark, sfDir))

  val qWinnowSql: String =
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents
       |           WHERE len(string_split(text, ' ')) >= ${GramK + WinW - 1}),
       |hs AS (SELECT doc_id,
       |              list_transform(range(len(ws) - ${GramK - 1}),
       |                i -> substr(md5(array_to_string(ws[i+1 : i+$GramK], ' ')), 1, 12)) AS hs
       |       FROM w),
       |fp AS (SELECT DISTINCT doc_id,
       |              unnest(list_transform(range(len(hs) - ${WinW - 1}),
       |                j -> list_min(hs[j+1 : j+$WinW]))) AS f
       |       FROM hs),
       |cnt AS (SELECT doc_id, count(*) AS n FROM fp GROUP BY 1),
       |keep AS (SELECT f FROM fp GROUP BY f
       |         HAVING count(*) >= 2 AND count(*) <= $MaxDf),
       |idx AS (SELECT doc_id, f FROM fp JOIN keep USING (f)),
       |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
       |          FROM idx a JOIN idx b USING (f)
       |          WHERE a.doc_id < b.doc_id
       |          GROUP BY 1, 2
       |          HAVING count(*) >= $MinShared)
       |SELECT doc_a, doc_b, c AS n_shared, ca.n AS n_a, cb.n AS n_b,
       |       CAST(c AS DOUBLE) / (ca.n + cb.n - c) AS sim
       |FROM pairs
       |JOIN cnt ca ON ca.doc_id = doc_a
       |JOIN cnt cb ON cb.doc_id = doc_b""".stripMargin

  // --------------------------------------------------------------------
  // CONTENT-DEFINED CHUNKING dedup (Muthitacharoen et al. SOSP '01, the
  // LBFS/rsync/FastCDC family) — the SHIFT-ROBUST rung of the dedup
  // ladder: q_line_dedup's fixed 8-token blocks lose every block
  // alignment after a one-character insertion, while CDC cuts wherever
  // the local byte content says to (rolling hash ≡ mask), so an edit
  // perturbs only the chunk it lands in and the rest of the document
  // re-deduplicates against the standing chunk store. This is the
  // storage-layer dedup every large corpus warehouse runs under its
  // snapshots (crawl-over-crawl, revision chains). Cut rule: a k=5
  // rolling window at position i (the SAME Rabin–Karp kernel and
  // arithmetic as q_rolling_fp, so the oracle reproduces every hash
  // exactly) ends its chunk after character i+5 when h ≡ 63 (mod 64) —
  // expected ~64-char chunks; the plain Rabin form (no min/max chunk
  // clamps — FastCDC's normalization is a latency refinement of the
  // same plan). Everything stays ROW-LOCAL until the md5-keyed hash
  // agg: hashes → cut offsets → substring slices per row, and only
  // (md5, source, ints) rows ever shuffle — text never does. Keeper =
  // globally first occurrence via the exact doc_id·2³²+j key (the
  // line-dedup rule; j is the chunk ordinal). Accounting mirrors
  // q_line_dedup with chars instead of tokens (chunks are
  // variable-width by construction).
  private val CdcK = 5
  private val CdcMask = 64L // cut when h % 64 == 63

  /** Per-occurrence chunk rows (every non-text column, plus j, s, and
    * the chunk char length). Each array step sits in its OWN projection:
    * a non-cheap array expression referenced inside a later HOF lambda
    * re-evaluates per element (the winnow lesson — see spark-pitfalls). */
  private[graft] def cdcChunkRows(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val keep = docs.columns.filter(_ != "text").map(col)
    val hashed = docs.select(keep :+ $"text" :+
      graft.functions.functions.rolling_hashes($"text", CdcK).as("hs"): _*)
    // ascending cut offsets: window i (0-based) fires → chunk boundary
    // after char i+k; -1 sentinel keeps the transform total, filter
    // drops it (sequence-free — hs is already the right length)
    val cuts = hashed.select(keep :+ $"text" :+
      filter(
        transform($"hs", (h, i) =>
          when(h % CdcMask === CdcMask - 1, i.cast("long") + CdcK)
            .otherwise(lit(-1L))),
        o => o >= 0).as("cuts"): _*)
    val offs = cuts.select(keep :+ $"text" :+
      concat(array(lit(0L)), $"cuts",
        array(length($"text").cast("long"))).as("offs"): _*)
    // slice adjacent offset pairs; empty slices (double cut, cut at the
    // end, empty text) are dropped BEFORE the ordinal so j densely
    // numbers real chunks in both engines
    offs.select(keep :+
      posexplode(filter(
        transform(sequence(lit(0), greatest(size($"offs") - 2, lit(0))),
          j => $"text".substr(element_at($"offs", j + 1) + 1,
            element_at($"offs", j + 2) - element_at($"offs", j + 1))),
        s => length(s) > 0)).as(Seq("j", "s")): _*)
  }

  /** INCREMENTAL CDC dedup — the append-only maintenance face of the
    * chunk store, the exact decomposition q_line_dedup_incremental
    * proved for fixed segments applied to content-defined chunks: the
    * standing report plus the batch joined against the standing
    * distinct-chunk index (EventStream.corpusChunkIndex maintains the
    * same table); the old corpus is never re-chunked. Exact for the
    * same reason — batch occurrence keys doc_id·2³²+j exceed every
    * standing key under append-only ingest, so standing keepers never
    * displace. The ORACLE is the flat full-corpus q_cdc_dedup SQL:
    * hash-green certifies incremental ≡ full recomputation. */
  def qCdcDedupIncremental(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id", $"source", $"text")
    val thr = docs.agg(expr("(max(doc_id) * 9) div 10").as("thr"))
    val parts = docs.crossJoin(broadcast(thr))
    val standing = parts.filter($"doc_id" < $"thr").drop("thr")
    val batch = parts.filter($"doc_id" >= $"thr").drop("thr")
    // ONE chunking pass over the standing corpus: the report and the
    // distinct-chunk index both derive from the same (h, source)
    // aggregation (r17 — the old shape called cdcChunkRows(standing)
    // twice in one action, re-chunking 90% of the corpus for the index
    // leg; the lazy checkpoint shares the chunk-vocabulary-bounded
    // aggregate between the two consumers instead)
    val standingPerSrc = cdcPerSrc(standing).localCheckpoint(eager = false)
    val standingReport = cdcReportFrom(standingPerSrc)
    val standingIdx = standingPerSrc.select($"h").distinct()
    val perSrc = cdcPerSrc(batch)
    val batchFirst = perSrc.groupBy($"h").agg(min($"mo").as("gmo"))
      .join(standingIdx, Seq("h"), "left_anti")
    val kept = when($"mo" === $"gmo", 1L).otherwise(0L)
    val batchReport = perSrc
      .join(batchFirst, Seq("h"), "left")
      .groupBy($"source")
      .agg(sum($"n").as("n_chunks"),
        sum(kept).as("n_kept"),
        sum($"n" - kept).as("n_removed"),
        sum(($"n" - kept) * $"clen").as("chars_removed"))
    standingReport.unionByName(batchReport)
      .groupBy($"source")
      .agg(sum($"n_chunks").as("n_chunks"), sum($"n_kept").as("n_kept"),
        sum($"n_removed").as("n_removed"),
        sum($"chars_removed").as("chars_removed"))
  }

  /** The (h, source) chunk-occurrence aggregate every CDC face builds
    * on: per fingerprint and source, occurrence count, first-occurrence
    * key, and the chunk length. */
  private def cdcPerSrc(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    cdcChunkRows(docs)
      .select(md5($"s".cast("binary")).as("h"), $"source",
        length($"s").cast("long").as("clen"),
        (shiftLeft($"doc_id", 32) + $"j").as("occ"))
      .groupBy($"h", $"source")
      // clen is a function of h (same fingerprint = same chunk text);
      // min() just picks the constant without carrying text around
      .agg(count(lit(1)).as("n"), min($"occ").as("mo"), min($"clen").as("clen"))
  }

  /** Keeper accounting over a prepared [[cdcPerSrc]] frame. */
  private def cdcReportFrom(perSrc: DataFrame): DataFrame = {
    import perSrc.sparkSession.implicits._
    val global = perSrc.groupBy($"h").agg(min($"mo").as("gmo"))
    val kept = when($"mo" === $"gmo", 1L).otherwise(0L)
    perSrc.join(global, Seq("h"))
      .groupBy($"source")
      .agg(sum($"n").as("n_chunks"),
        sum(kept).as("n_kept"),
        sum($"n" - kept).as("n_removed"),
        sum(($"n" - kept) * $"clen").as("chars_removed"))
  }

  /** CDC dedup accounting over any (doc_id, source, text) frame. */
  private[queries] def cdcReport(docs: DataFrame): DataFrame =
    cdcReportFrom(cdcPerSrc(docs))

  def qCdcDedup(spark: SparkSession, sfDir: String): DataFrame =
    cdcReport(Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("text")))

  val qCdcDedupSql: String = {
    // the q_rolling_fp polynomial, inlined per window — exact int64
    val hash = (0 until CdcK).map { p =>
      val pow = Seq.fill(CdcK - 1 - p)(257L).foldLeft(1L)(_ * _)
      if (pow == 1L) s"unicode(substr(text, i + $p, 1))"
      else s"unicode(substr(text, i + $p, 1)) * $pow"
    }.mkString("(", "\n       |               + ", s") % 2147483647")
    s"""WITH h AS (
       |  SELECT doc_id, source, text,
       |         list_transform(range(1, length(text) - ${CdcK - 2}),
       |           i -> $hash) AS hs
       |  FROM documents),
       |co AS (SELECT doc_id, source, text,
       |              [0] || list_filter(
       |                list_transform(range(1, len(hs) + 1),
       |                  i -> CASE WHEN hs[i] % $CdcMask = ${CdcMask - 1}
       |                            THEN i + ${CdcK - 1} ELSE -1 END),
       |                o -> o >= 0) || [length(text)] AS offs
       |       FROM h),
       |ch AS (SELECT doc_id, source,
       |              list_filter(
       |                list_transform(range(1, len(offs)),
       |                  j -> substr(text, offs[j] + 1, offs[j+1] - offs[j])),
       |                s -> length(s) > 0) AS cs
       |       FROM co),
       |seg AS (SELECT doc_id, source, j, cs[j+1] AS s
       |        FROM ch, unnest(range(len(cs))) AS t(j)),
       |g1 AS (SELECT md5(s) AS h, source, count(*) AS n,
       |              min(doc_id*4294967296 + j) AS mo,
       |              min(length(s)) AS clen
       |       FROM seg GROUP BY 1, 2),
       |g2 AS (SELECT h, min(mo) AS gmo FROM g1 GROUP BY 1)
       |SELECT source,
       |       CAST(sum(n) AS BIGINT) AS n_chunks,
       |       CAST(sum(CASE WHEN mo = gmo THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |       CAST(sum(n - CASE WHEN mo = gmo THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
       |       CAST(sum((n - CASE WHEN mo = gmo THEN 1 ELSE 0 END) * clen) AS BIGINT)
       |         AS chars_removed
       |FROM g1 JOIN g2 USING (h)
       |GROUP BY 1""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_cdc_dedup" -> (qCdcDedup _),
    "q_cdc_dedup_incremental" -> (qCdcDedupIncremental _),
    "q_line_dedup" -> (qLineDedup _),
    "q_line_dedup_incremental" -> (qLineDedupIncremental _),
    "q_line_surgery" -> (qLineSurgery _),
    "q_boilerplate_topk" -> (qBoilerplateTopk _),
    "q_winnow" -> (qWinnow _))

  val oracleSql: Map[String, String] = Map(
    "q_cdc_dedup" -> qCdcDedupSql,
    // the incremental face's oracle IS the flat full-corpus report:
    // hash equality certifies the append-only decomposition exact
    "q_cdc_dedup_incremental" -> qCdcDedupSql,
    "q_line_dedup" -> qLineDedupSql,
    // the incremental face's oracle IS the flat full-corpus report:
    // hash equality certifies the append-only decomposition exact
    "q_line_dedup_incremental" -> qLineDedupSql,
    "q_line_surgery" -> qLineSurgerySql,
    "q_boilerplate_topk" -> qBoilerplateTopkSql,
    "q_winnow" -> qWinnowSql)
}
