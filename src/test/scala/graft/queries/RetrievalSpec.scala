package graft.queries

import graft.SparkTestBase

/** Semantics and estimator quality for the retrieval module (driver-gate
  * coverage is the DuckDB oracle; these pin what the oracle can't see:
  * that the KMV estimate tracks the exact Jaccard, that DSIR weights
  * point toward the target domain, and that the plans keep their
  * broadcast/top-k shapes). */
class RetrievalSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  test("kmv jaccard estimate tracks the exact shingle-set jaccard") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val sets = graft.core.Tables.documents(spark, sfDir)
      .select($"source",
        explode(graft.functions.functions.word_shingles($"text", 3)).as("s"))
      .distinct()
      .as[(String, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = (for {
      a <- sets.keys; b <- sets.keys if a < b
    } yield ((a, b),
      (sets(a) & sets(b)).size.toDouble / (sets(a) | sets(b)).size)).toMap
    val est = Retrieval.qKmvOverlap(spark, sfDir)
      .select($"src_a", $"src_b", $"jaccard_est")
      .as[(String, String, Double)].collect()
      .map(r => ((r._1, r._2), r._3)).toMap
    assert(est.keySet == exact.keySet)
    val errs = exact.map { case (k, j) => math.abs(est(k) - j) }
    // k=64 bottom-k estimator: std err ≈ sqrt(J(1−J)/k) ≤ 0.063; the
    // deterministic md5 draw on this corpus measures max |err| ≈ 0.11
    assert(errs.max < 0.2, s"max KMV error ${errs.max}")
    assert(errs.sum / errs.size < 0.08, s"mean KMV error ${errs.sum / errs.size}")
  }

  test("bm25 ranks are contiguous, scores ordered, and terms bounded") {
    import spark.implicits._
    val got = Retrieval.qBm25(spark, sfDir)
      .select($"rank", $"score", $"n_terms")
      .as[(Int, Double, Long)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq == (1 to got.length))
    assert(got.map(_._2).toSeq == got.map(_._2).sortBy(-_).toSeq)
    assert(got.forall(r => r._3 >= 1 && r._3 <= 5))
    assert(got.forall(_._2 > 0))
  }

  test("prf expansion terms equal a driver recompute; re-rank is well-formed") {
    import spark.implicits._
    val originals = Set("table", "scan", "window", "join", "hash")
    // driver recompute of the mined expansion set from first principles
    val docs = graft.core.Tables.documents(spark, sfDir)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val dl = docs.map { case (id, t) => id -> (t.count(_ == ' ') + 1).toLong }.toMap
    val nDocs = docs.length.toLong
    val fbIds = Retrieval.qBm25(spark, sfDir)
      .select($"doc_id").as[Long].collect().toSet
    assert(fbIds.size == 10)
    val df = scala.collection.mutable.Map.empty[String, Long]
    val ftf = scala.collection.mutable.Map.empty[String, Long]
    for ((id, t) <- docs) {
      val counts = t.split(' ').groupBy(identity).view.mapValues(_.length.toLong)
      for ((w, c) <- counts) {
        df(w) = df.getOrElse(w, 0L) + 1L
        if (fbIds(id)) ftf(w) = ftf.getOrElse(w, 0L) + c
      }
    }
    def idf9(d: Long): BigDecimal =
      BigDecimal(math.log(1.0 + (nDocs - d + 0.5) / (d + 0.5)))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val expected = ftf.iterator
      .filter { case (w, _) =>
        w.length >= 3 && !originals(w) && df(w) * 2 <= nDocs }
      .map { case (w, f) => (w, idf9(df(w)) * BigDecimal(f)) }
      .toSeq.sortBy { case (w, wt) => (-wt, w) }.take(5)
    val got = Retrieval.prfExpansionTerms(spark, sfDir)
      .select($"term", $"w".cast("string")).as[(String, String)].collect()
      .map { case (t, w) => (t, BigDecimal(w)) }
    assert(got.map(_._1).toSeq == expected.map(_._1),
      s"got ${got.mkString(",")} expected ${expected.mkString(",")}")
    got.zip(expected).foreach { case ((_, gw), (_, ew)) => assert(gw == ew) }
    assert(got.map(_._1).toSet.intersect(originals).isEmpty)
    // the re-ranked output is well-formed and reflects the wider query
    val prf = Retrieval.qPrfExpand(spark, sfDir)
      .select($"doc_id", $"rank", $"score", $"n_terms")
      .as[(Long, Int, Double, Long)].collect().sortBy(_._2)
    assert(prf.map(_._2).toSeq == (1 to prf.length))
    assert(prf.map(_._3).toSeq == prf.map(_._3).sortBy(-_).toSeq)
    // each ranked doc's n_terms equals the driver-counted presence of
    // the widened (original ∪ expansion) query in that document
    val widened = originals ++ got.map(_._1)
    val tokens = docs.map { case (id, t) => id -> t.split(' ').toSet }.toMap
    prf.foreach { case (id, _, _, n) =>
      assert(n == widened.count(tokens(id)), s"doc $id")
    }
  }

  test("dsir weights separate the target domain from the rest") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val byLang = Retrieval.qDsirWeights(spark, sfDir)
      .join(graft.core.Tables.documents(spark, sfDir).select($"doc_id", $"lang"),
        Seq("doc_id"))
      .groupBy($"lang" === "en").agg(avg($"dsir_weight"))
      .as[(Boolean, Double)].collect().toMap
    // the importance weight is the log-likelihood ratio toward the 'en'
    // slice: its mean must be higher on target docs than off-target
    assert(byLang(true) > byLang(false),
      s"en mean ${byLang(true)} !> other mean ${byLang(false)}")
  }

  test("retrieval plans keep their scale shapes") {
    val bm25 = Retrieval.qBm25(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(bm25.contains("TakeOrderedAndProject"), bm25)
    val dsir = Retrieval.qDsirWeights(spark, sfDir)
      .queryExecution.executedPlan.toString
    // the ratio-table join must broadcast (map-side scoring pass) — a
    // sort-merge join here would shuffle the token fan-out by bucket
    assert(dsir.contains("BroadcastHashJoin"), dsir)
    assert(!dsir.contains("SortMergeJoin"), dsir)
  }

  test("dup-graph triangle counts equal a brute-force enumeration") {
    import spark.implicits._
    val sfDir01 = "/root/testdata/sf0.01"
    val pairs = Dedup.nearDupPairs(spark, sfDir01)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).toSeq.sorted
    val adj = pairs ++ pairs.map(_.swap)
    val expected = (for {
      a <- nodes; b <- nodes if a < b && adj((a, b))
      c <- nodes if b < c && adj((b, c)) && adj((a, c))
    } yield Seq(a, b, c)).flatten
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = Dedup.qDupTriangles(spark, sfDir01)
      .as[(Long, Long)].collect().toMap
    assert(got == expected, s"got $got\nexp $expected")
    assert(got.nonEmpty, "no triangles at this SF — vacuous check")
  }

  test("kmv cardinality estimate tracks the exact distinct count") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rels = Retrieval.qKmvDistinct(spark, "/root/testdata/sf0.01")
      .select(abs($"kmv_est" - $"n_distinct") / $"n_distinct")
      .as[Double].collect()
    // k=64 ⇒ std err ≈ 1/sqrt(k−2) ≈ 13%; this corpus measures
    // max ≈ 0.25, mean ≈ 0.08
    assert(rels.max < 0.4, s"max KMV cardinality error ${rels.max}")
    assert(rels.sum / rels.length < 0.15,
      s"mean KMV cardinality error ${rels.sum / rels.length}")
  }

  test("kmv containment estimate tracks the exact directed containment") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val sets = graft.core.Tables.documents(spark, sfDir)
      .select($"source",
        explode(graft.functions.functions.word_shingles($"text", 3)).as("s"))
      .distinct()
      .as[(String, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = (for {
      a <- sets.keys; b <- sets.keys if a != b
    } yield ((a, b), (sets(a) & sets(b)).size.toDouble / sets(a).size)).toMap
    val est = Retrieval.qKmvContainment(spark, sfDir)
      .select($"src_from", $"src_to", $"containment_est")
      .as[(String, String, Double)].collect()
      .map(r => ((r._1, r._2), r._3)).toMap
    assert(est.keySet == exact.keySet)
    val errs = exact.map { case (k, c) => math.abs(est(k) - c) }
    // same k=64 sampling error regime as the jaccard estimator; the
    // deterministic md5 draw on this corpus measures max |err| ≈ 0.12
    assert(errs.max < 0.25, s"max containment error ${errs.max}")
    assert(errs.sum / errs.size < 0.08,
      s"mean containment error ${errs.sum / errs.size}")
  }

  test("rrf fusion equals a driver recompute from its two leg rankings") {
    import spark.implicits._
    val bm = Retrieval.qBm25(spark, sfDir)
      .select($"doc_id", $"rank").as[(Long, Int)].collect().toMap
    val dn = Similarity.denseRanks(spark, sfDir, 0L, 10)
      .select($"neighbor_id", $"rank").as[(Long, Int)].collect().toMap
    val exp = (bm.keySet ++ dn.keySet).map { id =>
      val rrf = bm.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0) +
        dn.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0)
      id -> ((bm.get(id), dn.get(id), rrf))
    }.toMap
    val got = Retrieval.qRrfFusion(spark, sfDir)
      .select($"doc_id", $"bm_rank", $"ann_rank", $"rrf", $"fused_rank")
      .collect().map(r => (r.getLong(0),
        (if (r.isNullAt(1)) None else Some(r.getInt(1)),
          if (r.isNullAt(2)) None else Some(r.getInt(2)),
          r.getDouble(3)), r.getInt(4)))
    assert(got.map(x => x._1 -> x._2).toMap == exp)
    // fused_rank is the rrf-desc, id-asc order with no gaps
    val byRank = got.sortBy(_._3)
    assert(byRank.map(_._3).toSeq == (1 to got.length))
    assert(byRank.map(x => (-x._2._3, x._1)).toSeq ==
      byRank.map(x => (-x._2._3, x._1)).sortBy(identity).toSeq)
  }
  test("per-doc LM cross-entropy equals a BigDecimal driver recompute") {
    import spark.implicits._
    val docs = graft.core.Tables.documents(spark, sfDir)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val toks = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }
    val cf = toks.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong)
    val total = toks.map(_._2.size.toLong).sum
    // each term's ln once, HALF_UP to 9 dp (Spark's round on doubles),
    // then exact decimal tf-weighted sums — the query's arithmetic
    val lp = cf.map { case (w, c) =>
      w -> BigDecimal(math.log(c.toDouble / total.toDouble))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    }.toMap
    val expected = toks.map { case (id, ws) =>
      val s = ws.map(lp).sum
      id -> ((ws.size.toLong, (-s).toDouble / ws.size.toDouble))
    }.toMap
    val got = graft.queries.TextOps.qLmScore(spark, sfDir)
      .as[(Long, Long, Double)].collect()
    assert(got.length == expected.size)
    got.foreach { case (id, n, ce) =>
      val (_, en, ece) = (id, expected(id)._1, expected(id)._2)
      assert(n == en, s"doc $id n_toks $n vs $en")
      assert(ce == ece, s"doc $id ce $ce vs $ece")
      assert(ce > 0.0)
    }
    // the filterable signal exists: entropies genuinely spread
    val ces = got.map(_._3)
    assert(ces.max - ces.min > 0.1)
  }

  test("routing parity agrees except on planted boundary ties") {
    import spark.implicits._
    // real corpus: no two docs share a ce, so rank and threshold agree
    val real = graft.queries.TextOps.qPplRoute(spark, sfDir)
      .select($"agree").as[Long].collect()
    assert(real.nonEmpty && real.forall(_ == 1L))
    // planted tie: docs 1 and 2 are IDENTICAL (same ce, the highest —
    // doc 3's repeated common token makes it the low-surprise head);
    // ntile splits the tie across the bucket-2/3 boundary by doc_id
    // while the threshold router puts both at or under b2 — doc 2 must
    // disagree, and only it
    val docs = Seq(
      (1L, "alpha beta gamma delta", "s", "en"),
      (2L, "alpha beta gamma delta", "s", "en"),
      (3L, "zeta zeta zeta zeta zeta zeta", "s", "en"))
      .toDF("doc_id", "text", "source", "lang")
    val dir = tempDir("pplroute")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.queries.TextOps.qPplRoute(spark, dir)
      .select($"doc_id", $"bucket", $"routed", $"agree")
      .as[(Long, Int, Int, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(3L) == ((3L, 1, 1, 1L)), got(3L))
    assert(got(1L) == ((1L, 2, 2, 1L)), got(1L))
    assert(got(2L) == ((2L, 3, 2, 0L)), got(2L))
  }

  test("perplexity buckets are exact per-source tertiles of the LM score") {
    import spark.implicits._
    // independent recompute: per-doc ce from the already-proven
    // q_lm_score, ntile(3) re-derived in Scala (first count%3 buckets
    // take the extra row — the ANSI ntile rule both engines implement)
    val src = graft.core.Tables.documents(spark, sfDir)
      .select($"doc_id", $"source").as[(Long, String)].collect().toMap
    val perDoc = graft.queries.TextOps.qLmScore(spark, sfDir)
      .as[(Long, Long, Double)].collect()
      .map { case (id, n, ce) => (src(id), id, n, ce) }
    val expected = perDoc.groupBy(_._1).flatMap { case (s, rows) =>
      val sorted = rows.sortBy(r => (r._4, r._2))
      val base = sorted.length / 3; val extra = sorted.length % 3
      val sizes = (0 until 3).map(b => base + (if (b < extra) 1 else 0))
      val bounds = sizes.scanLeft(0)(_ + _)
      (0 until 3).map { b =>
        val slice = sorted.slice(bounds(b), bounds(b + 1))
        (s, b + 1) -> ((slice.length.toLong, slice.map(_._3).sum,
          slice.map(_._4).min, slice.map(_._4).max))
      }
    }
    val got = graft.queries.TextOps.qPplBuckets(spark, sfDir)
      .select($"source", $"bucket", $"n_docs", $"n_toks", $"min_ce",
        $"max_ce", $"bucket_ce")
      .as[(String, Int, Long, Long, Double, Double, Double)].collect()
    assert(got.length == expected.size, s"${got.length} != ${expected.size}")
    got.foreach { case (s, b, nd, nt, mn, mx, bce) =>
      val (end, ent, emn, emx) = expected((s, b))
      assert(nd == end, s"($s,$b) n_docs $nd vs $end")
      assert(nt == ent, s"($s,$b) n_toks $nt vs $ent")
      assert(mn == emn && mx == emx, s"($s,$b) range [$mn,$mx] vs [$emn,$emx]")
      // token-weighted mean lies inside the bucket's ce range
      assert(bce >= mn - 1e-12 && bce <= mx + 1e-12, s"($s,$b) bce $bce")
    }
    // boundaries are monotone: head ends before middle, middle before tail
    got.groupBy(_._1).foreach { case (s, rows) =>
      val byB = rows.sortBy(_._2)
      assert(byB(0)._6 <= byB(1)._5 && byB(1)._6 <= byB(2)._5,
        s"$s bucket boundaries not monotone: ${byB.map(r => (r._5, r._6))}")
    }
  }

  test("sketch-boundary bucketing agrees with the exact tertiles within tolerance") {
    import spark.implicits._
    val rows = graft.queries.TextOps.qPplBucketsScalable(spark, sfDir)
      .as[(String, Long, Double, Double, Long)].collect()
    assert(rows.nonEmpty)
    // every source certifies the swap (est_ok = 1), and the exact
    // boundary columns match q_ppl_buckets' per-source max_ce values
    rows.foreach { case (s, n, b1, b2, ok) =>
      assert(ok == 1L, s"$s: sketch disagreement above tolerance (n=$n)")
      assert(b1 <= b2, s"$s: boundaries out of order")
    }
    val exact = graft.queries.TextOps.qPplBuckets(spark, sfDir)
      .select($"source", $"bucket", $"max_ce")
      .as[(String, Int, Double)].collect()
      .groupBy(_._1).view.mapValues(rs => rs.map(r => r._2 -> r._3).toMap).toMap
    rows.foreach { case (s, _, b1, b2, _) =>
      assert(b1 == exact(s)(1), s"$s b1")
      assert(b2 == exact(s).getOrElse(2, exact(s)(1)), s"$s b2")
    }
  }

  test("sketch bucketing tolerates a duplicate tie block straddling a tertile cut") {
    import spark.implicits._
    // six byte-identical docs share one ce; they dominate the LM so
    // they rank lowest and ntile splits the tie block across buckets 1
    // and 2 by doc_id, while ANY value threshold routes the block
    // whole — rank-vs-value disagreement at ties, which must NOT read
    // as sketch error (review r14: est_ok excludes boundary-tied docs)
    val tied = (1 to 12).map(i => s"t$i").mkString(" ")
    val docs = (1L to 6L).map(i => (i, tied)) ++ Seq(
      (7L, (1 to 12).map(i => s"x$i").mkString(" ")),
      (8L, (1 to 12).map(i => s"y$i").mkString(" ")),
      (9L, (1 to 12).map(i => s"z$i").mkString(" ")))
    val dir = tempDir("ppltie")
    docs.toDF("doc_id", "text")
      .select($"doc_id", $"text",
        org.apache.spark.sql.functions.lit("en").as("lang"),
        org.apache.spark.sql.functions.lit("s1").as("source"),
        org.apache.spark.sql.functions.length($"text").cast("long").as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    try {
      val rows = graft.queries.TextOps.qPplBucketsScalable(spark, dir)
        .as[(String, Long, Double, Double, Long)].collect()
      assert(rows.length == 1 && rows.head._2 == 9L)
      assert(rows.head._5 == 1L,
        s"tie-straddling duplicates must not fail the sketch audit: ${rows.head}")
    } finally graft.operators.Staging.invalidate(Some(dir))
  }

  test("per-language buckets are exact tertiles on the lang axis and cover the corpus") {
    import spark.implicits._
    val got = graft.queries.TextOps.qPplBucketsLang(spark, sfDir)
      .as[(String, Int, Long, Long, Double, Double, Double)].collect()
    val langTotals = graft.core.Tables.documents(spark, sfDir)
      .groupBy($"lang").count().as[(String, Long)].collect().toMap
    // per-lang bucket sizes are the ntile allocation and sum to the
    // lang's doc count; boundaries are monotone along the ce axis
    got.groupBy(_._1).foreach { case (l, rows) =>
      assert(rows.map(_._3).sum == langTotals(l), s"$l coverage")
      val byB = rows.sortBy(_._2)
      val base = langTotals(l) / 3; val extra = (langTotals(l) % 3).toInt
      byB.zipWithIndex.foreach { case (r, i) =>
        assert(r._3 == base + (if (i < extra) 1 else 0), s"$l ntile sizes")
      }
      byB.sliding(2).foreach {
        case Array(a, b) => assert(a._6 <= b._5, s"$l boundaries")
        case _ =>
      }
    }
  }

}
