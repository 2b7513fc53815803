package graft.queries

import org.apache.spark.sql.DataFrame
import graft.SparkTestBase

/** Passage-granularity operators: CCNet-style line-level dedup and
  * Schleimer '03 winnowing fingerprints. Each is checked three ways —
  * a synthetic planted scenario exercising the defining rule, a
  * driver-side reimplementation equality on the real corpus, and plan
  * pins for the 100 TB claims (no cartesian pair generation, text
  * absent from every shuffle).
  */
class PassagesSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def noCross(df: DataFrame): Unit = {
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
  }

  // ------------------------------------------------------------------
  // line-level dedup

  test("line dedup keeps exactly the first occurrence of a planted duplicate") {
    import spark.implicits._
    val seg = "a b c d e f g h" // one full 8-token segment
    val docs = Seq(
      // doc 1 source s1: the segment twice (j=0 keeper, j=1 removed)
      (1L, "s1", s"$seg $seg"),
      // doc 2 source s2: same segment once (removed — later doc_id)
      (2L, "s2", s"$seg"),
      // doc 3 source s2: a distinct segment (its own keeper)
      (3L, "s2", "p q r s t u v w")
    ).toDF("doc_id", "source", "text")
    val r = Passages.lineDedupReport(docs)
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))).toMap
    // s1: 2 occurrences, keeper is (doc 1, j 0) → 1 kept, 1 removed
    assert(r("s1") == ((2L, 1L, 1L, 8L)))
    // s2: 2 occurrences, doc 2's copy loses to doc 1, doc 3's is kept
    assert(r("s2") == ((2L, 1L, 1L, 8L)))
  }

  test("line dedup kept-count sums to the corpus-wide distinct segment count") {
    import spark.implicits._
    val docs = graft.core.Tables.documents(spark, dir)
      .select($"doc_id", $"source", $"text")
    val kept = Passages.lineDedupReport(docs)
      .agg(org.apache.spark.sql.functions.sum($"n_kept")).as[Long].head()
    val distinctSegs = docs
      .filter(org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.split($"text", " ")) >= 8)
      .select(org.apache.spark.sql.functions.expr(
        """explode(transform(
          |  sequence(0, cast(floor(size(split(text, ' ')) / 8) as int) - 1),
          |  j -> concat_ws(' ', slice(split(text, ' '), j*8+1, 8))))""".stripMargin))
      .distinct().count()
    assert(kept == distinctSegs, s"kept $kept vs distinct $distinctSegs")
  }

  // ------------------------------------------------------------------
  // content-defined chunking

  /** Driver-side CDC reference: same cut rule, from first principles. */
  private def refCdcChunks(text: String): Seq[String] = {
    val cps = text.codePoints().toArray
    val n = cps.length
    val cuts = (0 to n - 5).filter { i =>
      var h = 0L
      (0 until 5).foreach(j => h = (h * 257 + cps(i + j)) % 2147483647L)
      h % 64 == 63
    }.map(_ + 5)
    val offs = (0L +: cuts.map(_.toLong)) :+ n.toLong
    offs.zip(offs.tail).map { case (a, b) =>
      new String(cps, a.toInt, (b - a).toInt)
    }.filter(_.nonEmpty)
  }

  test("CDC chunking matches a driver-side recompute on the real corpus") {
    import spark.implicits._
    val docs = graft.core.Tables.documents(spark, dir)
      .select($"doc_id", $"source", $"text")
    val got = Passages.cdcChunkRows(docs)
      .select($"doc_id", $"j", $"s").as[(Long, Int, String)]
      .collect().groupBy(_._1)
      .map { case (d, rs) => d -> rs.sortBy(_._2).map(_._3).toSeq }
    val want = docs.select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (d, t) => d -> refCdcChunks(t) }.toMap
    assert(got.keySet == want.keySet.filter(want(_).nonEmpty))
    got.foreach { case (d, cs) => assert(cs == want(d), s"doc $d") }
    // chunks reassemble the document exactly — CDC is a partition
    got.foreach { case (d, cs) =>
      assert(cs.mkString == want(d).mkString)
    }
  }

  test("CDC dedup is shift-robust where fixed blocks are not") {
    import spark.implicits._
    // doc 2 = doc 1 with ONE token prepended: every fixed 8-token block
    // realigns (all of doc 2's segments are novel), but CDC boundaries
    // downstream of the edit are content-determined and reproduce, so
    // almost everything still dedups against doc 1's chunks
    val base = graft.core.Tables.documents(spark, dir)
      .orderBy(org.apache.spark.sql.functions.length($"text").desc, $"doc_id")
      .select($"text").as[String].head()
    assert(refCdcChunks(base).size >= 4, "corpus doc too short for the scenario")
    assert(base.split(" ").length >= 24, "corpus doc too few tokens for the control")
    val docs = Seq((1L, "s1", base), (2L, "s2", "Z " + base))
      .toDF("doc_id", "source", "text")
    val r = Passages.cdcReport(docs).collect()
      .map(x => x.getString(0) -> x.getLong(2)).toMap // source -> n_kept
    // the shifted copy (s2, higher doc_id) keeps only what the edit
    // perturbed: the region before the first reproduced cut — at most
    // 3 chunks (the two new windows the prefix creates can each add a
    // cut there); every later chunk re-deduplicates
    val chunks2 = refCdcChunks("Z " + base).size
    assert(r("s2") <= 3, s"shifted doc kept ${r("s2")} of $chunks2 chunks as novel")
    // control: the fixed-block pass keeps (almost) every shifted
    // segment as novel — CDC must dedup strictly more of doc 2
    val fixedKept = Passages.lineDedupReport(docs).collect()
      .map(x => x.getString(0) -> x.getLong(2)).toMap
    assert(fixedKept("s2") > r("s2"),
      s"fixed blocks kept ${fixedKept("s2")} vs CDC ${r("s2")} — CDC should dedup more")
  }

  test("CDC report: exact totals on a planted duplicate pair") {
    import spark.implicits._
    val docs = Seq(
      (1L, "s1", "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "s2", "the quick brown fox jumps over the lazy dog again and again"))
      .toDF("doc_id", "source", "text")
    val r = Passages.cdcReport(docs).collect()
      .map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))).toMap
    val chunks = refCdcChunks("the quick brown fox jumps over the lazy dog again and again")
    val totalChars = chunks.map(_.length.toLong).sum
    // doc 1 keeps everything; doc 2 is wholly duplicate
    assert(r("s1") == ((chunks.size.toLong, chunks.size.toLong, 0L, 0L)))
    assert(r("s2") == ((chunks.size.toLong, 0L, chunks.size.toLong, totalChars)))
  }

  test("incremental CDC equals the flat report, and really is incremental") {
    import spark.implicits._
    val inc = Passages.qCdcDedupIncremental(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val flat = Passages.qCdcDedup(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(inc == flat, "incremental maintenance diverged from recomputation")
    // the demonstration split must actually exercise both legs
    val docs = graft.core.Tables.documents(spark, dir)
    val thr = docs.agg(org.apache.spark.sql.functions.expr(
      "(max(doc_id) * 9) div 10")).as[Long].head()
    val standing = docs.filter($"doc_id" < thr).count()
    val batch = docs.filter($"doc_id" >= thr).count()
    assert(standing > 0 && batch > 0, s"degenerate split: $standing/$batch")
  }

  test("CDC plan: no window, no sort, text never shuffles") {
    // AQE hides ShuffleExchangeExec from plan collects until execution
    // (spark-pitfalls) — inspect the non-adaptive plan
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = Passages.qCdcDedup(spark, dir)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("WindowExec"), "window in CDC plan")
      noCross(df)
      // text is consumed row-local: no exchange carries text or chunks
      val exchanges = df.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      exchanges.foreach { e =>
        val names = e.child.output.map(_.name)
        assert(!names.contains("text"), s"text rides a shuffle: $names")
        assert(!names.contains("s"), s"chunk text rides a shuffle: $names")
      }
      assert(exchanges.nonEmpty) // the md5-keyed agg does shuffle — narrow rows
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("line dedup matches a driver-side recompute on the real corpus") {
    import spark.implicits._
    val rows = graft.core.Tables.documents(spark, dir)
      .select($"doc_id", $"source", $"text")
      .as[(Long, String, String)].collect()
    // reference: first occurrence (by doc_id·2^32 + j) of each distinct
    // full 8-token segment is kept; everything else is removed
    val occ = rows.flatMap { case (id, src, text) =>
      val ws = text.split(" ")
      (0 until ws.length / 8).map(j =>
        (ws.slice(j * 8, j * 8 + 8).mkString(" "), src, (id << 32) + j))
    }
    val keeper = occ.groupBy(_._1).map { case (_, os) => os.minBy(_._3)._3 }.toSet
    val exp = occ.groupBy(_._2).map { case (src, os) =>
      val kept = os.count(o => keeper(o._3))
      src -> ((os.size.toLong, kept.toLong, (os.size - kept).toLong,
        8L * (os.size - kept)))
    }
    val got = Passages.qLineDedup(spark, dir)
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))).toMap
    assert(got == exp)
  }

  test("line dedup occurrence key: both halves fit the packed 64-bit key") {
    import spark.implicits._
    // review r9 (advisor): the key is now doc_id·2^32 + j. The j half is
    // structurally safe — 2^32 segments would need a ~34 GB single-row
    // string, beyond Spark's 2 GB string limit — so the only real bound
    // is doc_id < 2^31 (the shift must not reach the sign bit). Assert
    // it on the corpus so a future id scheme fails loudly here.
    val maxId = graft.core.Tables.documents(spark, dir)
      .agg(org.apache.spark.sql.functions.max($"doc_id")).as[Long].head()
    assert(maxId < (1L << 31), s"doc_id $maxId overflows the packed key")
    val maxSegs = graft.core.Tables.documents(spark, dir)
      .select((org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.split($"text", " ")) / 8)
        .cast("long")).as[Long].collect().max
    assert(maxSegs < (1L << 32), s"max segment count $maxSegs")
  }

  test("line dedup plan: no window, no sort, text never shuffles") {
    val p = Passages.qLineDedup(spark, dir).queryExecution.executedPlan.toString
    assert(!p.contains("WindowExec") && !p.contains("SortExec"), p)
    // the only shuffles carry the md5 fingerprint + source, never `s`
    // (the segment text is projected away before the first exchange)
    noCross(Passages.qLineDedup(spark, dir))
  }

  test("incremental line dedup equals the flat report, and really is incremental") {
    import spark.implicits._
    val inc = Passages.qLineDedupIncremental(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val flat = Passages.qLineDedup(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(inc == flat)
    // the split must actually exercise both paths at this SF: a batch
    // with zero docs (or the whole corpus) would prove nothing
    val maxId = graft.core.Tables.documents(spark, dir)
      .agg(org.apache.spark.sql.functions.max($"doc_id")).as[Long].head()
    val thr = maxId * 9 / 10
    val nBatch = graft.core.Tables.documents(spark, dir)
      .filter($"doc_id" >= thr).count()
    val nAll = graft.core.Tables.documents(spark, dir).count()
    assert(nBatch > 0 && nBatch < nAll, s"batch $nBatch of $nAll")
    // structural: the novelty gate is a left-anti join against the
    // standing fingerprint index
    val p = Passages.qLineDedupIncremental(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p.contains("LeftAnti"), p)
  }

  test("boilerplate top-k: native bounded selection, counts verified, text off the shuffle") {
    import spark.implicits._
    val df = Passages.qBoilerplateTopk(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TopKPerGroup"), p)
    val got = df.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3)))
    // driver recompute of the full per-(source, segment) counts
    val occ = graft.core.Tables.documents(spark, dir)
      .select($"doc_id", $"source", $"text")
      .as[(Long, String, String)].collect()
      .flatMap { case (_, src, text) =>
        val ws = text.split(" ", -1)
        (0 until ws.length / 8).map(j =>
          (src, ws.slice(j * 8, j * 8 + 8).mkString(" ")))
      }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for ((src, seg, n, rnk) <- got) {
      assert(occ((src, seg)) == n, s"$src/$seg")
      assert(rnk >= 1 && rnk <= 5 && n >= 2)
    }
    // per source: ranks contiguous and counts non-increasing
    got.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1 to rows.length))
      assert(sorted.map(_._3).toSeq == sorted.map(_._3).sortBy(-_).toSeq)
    }
  }

  // ------------------------------------------------------------------
  // line surgery

  test("line surgery removes exactly the non-keeper segments, keeps tails") {
    import spark.implicits._
    // doc 1: segment A twice + a 3-token tail; doc 2: A again + novel B.
    // keepers: A@(1,0), B@(2,1). expected: doc 1 = A + tail (the j=1
    // copy removed), doc 2 = B only (its A loses to doc 1's)
    val segA = "a b c d e f g h"
    val segB = "p q r s t u v w"
    val docs = Seq(
      (1L, s"$segA $segA x y z"),
      (2L, s"$segA $segB")).toDF("doc_id", "text")
    val occ = Passages.segmentRows(docs)
      .select($"doc_id", $"j", $"s",
        org.apache.spark.sql.functions.md5($"s".cast("binary")).as("h"),
        (org.apache.spark.sql.functions.shiftLeft($"doc_id", 32) + $"j").as("occ"))
    val keeperOcc = occ.groupBy($"h")
      .agg(org.apache.spark.sql.functions.min($"occ").as("gmo"))
    val kept = occ.join(keeperOcc, Seq("h")).filter($"occ" === $"gmo")
      .select($"doc_id", $"j").as[(Long, Int)].collect().toSet
    assert(kept == Set((1L, 0), (2L, 1)))
  }

  test("line surgery matches a driver recompute and reconciles with the report") {
    import spark.implicits._
    val docs = graft.core.Tables.documents(spark, dir)
      .select($"doc_id", $"source", $"text")
      .as[(Long, String, String)].collect()
    val occ = docs.flatMap { case (id, _, text) =>
      val ws = text.split(" ", -1)
      (0 until ws.length / 8).map(j =>
        (ws.slice(j * 8, j * 8 + 8).mkString(" "), id, j))
    }
    val keeper = occ.groupBy(_._1)
      .map { case (_, os) => os.minBy(o => (o._2 << 32) + o._3) }.toSet
    val exp = docs.map { case (id, _, text) =>
      val ws = text.split(" ", -1)
      val nseg = ws.length / 8
      val keptSegs = (0 until nseg)
        .map(j => (ws.slice(j * 8, j * 8 + 8).mkString(" "), id, j))
        .filter(keeper).map(_._1)
      val tail = ws.drop(nseg * 8).mkString(" ")
      val clean =
        if (keptSegs.isEmpty) tail
        else if (tail.isEmpty) keptSegs.mkString(" ")
        else keptSegs.mkString(" ") + " " + tail
      id -> clean
    }.toMap
    val got = Passages.qLineSurgery(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == exp)
    // reconciliation with the accounting face: total tokens removed in
    // the surgery equal the report's tokens_removed sum (every doc here
    // is space-tokenized, so token deltas are word-count deltas)
    val removedTokens = docs.map { case (id, _, text) =>
      text.split(" ", -1).length -
        (if (got(id).isEmpty) 0 else got(id).split(" ", -1).length)
    }.sum.toLong
    val reported = Passages.qLineDedup(spark, dir)
      .agg(org.apache.spark.sql.functions.sum($"tokens_removed"))
      .as[Long].head()
    assert(removedTokens == reported,
      s"surgery removed $removedTokens vs report $reported")
  }

  // ------------------------------------------------------------------
  // degenerate inputs — the shapes empty partitions and short-document
  // sources produce at scale; every face must return empty (or
  // identity) results, never throw

  test("passage operators are total on empty and all-short corpora") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String, String)]
      .toDF("doc_id", "source", "text")
    assert(Passages.lineDedupReport(empty).count() == 0)
    assert(Passages.winnowFingerprints(empty.drop("source")).count() == 0)
    assert(Passages.winnowPairs(
      Passages.winnowFingerprints(empty.drop("source"))).count() == 0)
    // all documents below every threshold: no segments, no fingerprints
    val short = Seq((1L, "s1", "a b c"), (2L, "s2", ""))
      .toDF("doc_id", "source", "text")
    assert(Passages.lineDedupReport(short).count() == 0)
    assert(Passages.winnowFingerprints(short.drop("source")).count() == 0)
    assert(Passages.segmentRows(short).count() == 0)
  }

  test("winnowing guarantee: a shared run of >= w+k-1 tokens is detected") {
    import spark.implicits._
    // two otherwise-disjoint docs sharing one verbatim 20-token passage:
    // w+k-1 = 8, so >= 1 shared fingerprint is guaranteed — with 20
    // shared tokens there are 12 shared windows, comfortably >= MinShared
    val passage = (1 to 20).map(i => s"shared$i").mkString(" ")
    val fillerA = (1 to 30).map(i => s"lefta$i").mkString(" ")
    val fillerB = (1 to 30).map(i => s"rightb$i").mkString(" ")
    val docs = Seq(
      (10L, s"$fillerA $passage"),
      (20L, s"$passage $fillerB")).toDF("doc_id", "text")
    val pairs = Passages.winnowPairs(Passages.winnowFingerprints(docs))
      .collect()
    assert(pairs.length == 1)
    assert(pairs.head.getLong(0) == 10L && pairs.head.getLong(1) == 20L)
    assert(pairs.head.getLong(2) >= 3L) // n_shared
  }

  test("winnowing density: fingerprints are a strict subset of the gram hashes") {
    import spark.implicits._
    val docs = graft.core.Tables.documents(spark, dir)
      .select($"doc_id", $"text")
    val nFps = Passages.winnowFingerprints(docs).count()
    val nGrams = docs.select(
      org.apache.spark.sql.functions.expr(
        "size(split(text, ' ')) - 4").cast("long")).as[Long]
      .collect().filter(_ > 0).sum
    // expected density 2/(w+1) = 0.4 of all k-gram positions; allow a
    // generous band — the point is the selection is a real reduction
    assert(nFps < nGrams * 6 / 10, s"fps $nFps vs grams $nGrams")
    assert(nFps > 0)
  }

  test("winnowing matches a driver-side recompute on the real corpus") {
    import spark.implicits._
    val rows = graft.core.Tables.documents(spark, dir)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    def md5hex8(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString.substring(0, 12)
    }
    val fps = rows.flatMap { case (id, text) =>
      val ws = text.split(" ")
      if (ws.length < 8) Seq.empty[(Long, String)]
      else {
        val hs = (0 to ws.length - 5)
          .map(i => md5hex8(ws.slice(i, i + 5).mkString(" ")))
        (0 to hs.length - 4).map(j => hs.slice(j, j + 4).min)
          .distinct.map(f => (id, f))
      }
    }
    val cnt = fps.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val byF = fps.groupBy(_._2).filter { case (_, v) =>
      v.size >= 2 && v.size <= 32 }
    val pairCounts = byF.values.flatMap { occs =>
      val ids = occs.map(_._1).toSeq.sorted
      for (i <- ids.indices; k <- i + 1 until ids.length)
        yield (ids(i), ids(k))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
      .filter(_._2 >= 3)
    val exp = pairCounts.map { case ((a, b), c) =>
      (a, b, c, cnt(a), cnt(b),
        c.toDouble / (cnt(a) + cnt(b) - c))
    }.toSet
    val got = Passages.qWinnow(spark, dir).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getLong(3), x.getLong(4), x.getDouble(5))).toSet
    assert(got == exp)
  }

  test("winnowing pair plan: inverted-index equi-join, no cartesian") {
    noCross(Passages.qWinnow(spark, dir))
  }
}
