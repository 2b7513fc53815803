package graft.queries

import graft.SparkTestBase

/** Unit semantics for the ranking-distribution, redaction, and anti-join
  * queries (their driver-gate coverage is the DuckDB oracle; these pin
  * the fine-grained per-row semantics on controlled inputs). */
class EventOpsSpec extends SparkTestBase {

  private def writeEvents(dir: String, rows: Seq[(Long, Long, Long, String, Double, String)]): Unit = {
    import spark.implicits._
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  test("ntile/percent_rank/cume_dist on 4 distinct values") {
    import spark.implicits._
    val dir = tempDir("ntile")
    writeEvents(dir, Seq(
      (1L, 1000000000L, 1L, "x", 10.0, "{}"),
      (2L, 2000000000L, 1L, "x", 20.0, "{}"),
      (3L, 3000000000L, 1L, "x", 30.0, "{}"),
      (4L, 4000000000L, 1L, "x", 40.0, "{}")))
    val got = Events.qNtile(spark, dir)
      .select("event_id", "quartile", "pr", "cd")
      .as[(Long, Int, Double, Double)].collect().sortBy(_._1)
    assert(got.map(_._2).toSeq == Seq(1, 2, 3, 4))
    assert(got.map(_._3).toSeq == Seq(0.0, 1.0 / 3, 2.0 / 3, 1.0))
    assert(got.map(_._4).toSeq == Seq(0.25, 0.5, 0.75, 1.0))
  }

  test("redaction masks every digit run and counts the masks") {
    import spark.implicits._
    val dir = tempDir("redact")
    writeEvents(dir, Seq(
      (1L, 1000000000L, 1L, "x", 0.0, """{"k": 69}"""),
      (2L, 2000000000L, 1L, "x", 0.0, "no digits here"),
      (3L, 3000000000L, 1L, "x", 0.0, "a1b22c333")))
    val got = Events.qRedact(spark, dir)
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, """{"k": #}""", 1L),
      (2L, "no digits here", 0L),
      (3L, "a#b#c#", 3L)))
  }

  test("funnel stages require strictly ordered view -> click -> purchase") {
    import spark.implicits._
    val dir = tempDir("funnel")
    // raw µs values (sub-2^56 magnitudes read as micros — Tables.events)
    writeEvents(dir, Seq(
      // user 1: full conversion, 5µs view->purchase
      (1L, 10L, 1L, "view", 0.0, "{}"),
      (2L, 12L, 1L, "click", 0.0, "{}"),
      (3L, 15L, 1L, "purchase", 0.0, "{}"),
      // user 2: click BEFORE the first view — not a funnel click
      (4L, 10L, 2L, "click", 0.0, "{}"),
      (5L, 20L, 2L, "view", 0.0, "{}"),
      // user 3: view then click, no purchase
      (6L, 10L, 3L, "view", 0.0, "{}"),
      (7L, 11L, 3L, "click", 0.0, "{}"),
      // user 4: purchase only — never enters the funnel
      (8L, 10L, 4L, "purchase", 0.0, "{}")))
    val got = Events.qFunnel(spark, dir)
      .select("user_id", "stage", "convert_us")
      .as[(Long, Int, Option[Long])].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 3, Some(5L)), (2L, 1, None), (3L, 2, None)))
  }

  test("transition matrix equals a driver recompute with start/end bookkeeping") {
    import spark.implicits._
    val dir = tempDir("transitions")
    writeEvents(dir, Seq(
      (1L, 10L, 1L, "view", 0.0, "{}"),
      (2L, 12L, 1L, "click", 0.0, "{}"),
      (3L, 15L, 1L, "purchase", 0.0, "{}"),
      (4L, 10L, 2L, "view", 0.0, "{}"),
      (5L, 20L, 2L, "view", 0.0, "{}"),
      (6L, 10L, 3L, "click", 0.0, "{}")))
    val got = Events.qTransitions(spark, dir)
      .as[(String, String, Long, Double)].collect()
    val counts = got.map(r => (r._1, r._2) -> r._3).toMap
    assert(counts == Map(
      ("^start", "view") -> 2L, ("^start", "click") -> 1L,
      ("view", "click") -> 1L, ("view", "view") -> 1L,
      ("click", "purchase") -> 1L,
      ("purchase", "^end") -> 1L, ("view", "^end") -> 1L,
      ("click", "^end") -> 1L))
    // start out-mass and end in-mass both equal the user count
    assert(got.filter(_._1 == "^start").map(_._3).sum == 3L)
    assert(got.filter(_._2 == "^end").map(_._3).sum == 3L)
    // rows normalize: per src, probabilities sum to 1 and p = n/tot
    got.groupBy(_._1).foreach { case (_, rows) =>
      val tot = rows.map(_._3).sum
      rows.foreach(r => assert(r._4 == r._3.toDouble / tot.toDouble))
      assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-12)
    }
  }

  test("journey stationary mass equals a BigInt floor-division power recompute") {
    import spark.implicits._
    val dir = tempDir("stationary")
    writeEvents(dir, Seq(
      (1L, 10L, 1L, "view", 0.0, "{}"),
      (2L, 12L, 1L, "click", 0.0, "{}"),
      (3L, 15L, 1L, "purchase", 0.0, "{}"),
      (4L, 10L, 2L, "view", 0.0, "{}"),
      (5L, 20L, 2L, "view", 0.0, "{}"),
      (6L, 10L, 3L, "click", 0.0, "{}")))
    val edges = scala.collection.mutable.Map(
      ("^start", "view") -> 2L, ("^start", "click") -> 1L,
      ("view", "click") -> 1L, ("view", "view") -> 1L,
      ("click", "purchase") -> 1L,
      ("purchase", "^end") -> 1L, ("view", "^end") -> 1L,
      ("click", "^end") -> 1L, ("^end", "^start") -> 1L)
    val wt = edges.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val states = (edges.keys.map(_._1) ++ edges.keys.map(_._2)).toSet
    var r = states.map(_ -> BigInt(1000000000L)).toMap
    for (_ <- 1 to 3) {
      val next = scala.collection.mutable.Map.empty[String, BigInt]
        .withDefaultValue(BigInt(0))
      for (((s, d), n) <- edges if r.contains(s))
        next(d) += r(s) * n / wt(s)
      r = next.toMap
    }
    val totMass = r.values.sum
    val expected = r.map { case (s, m) =>
      (s, m.toLong, m.toLong.toDouble / totMass.toLong.toDouble) }.toSet
    val got = Events.qJourneyStationary(spark, dir)
      .as[(String, Long, Double)].collect().toSet
    assert(got == expected, {
      val diff = (got -- expected) ++ (expected -- got)
      s"diffs: ${diff.take(5).mkString(",")}"
    })
    // every state survives three steps of this closed chain
    assert(got.map(_._1) == states)
  }

  test("upsert op labels partition the key space as the mod filters dictate") {
    import spark.implicits._
    val sfDir = "/root/testdata/sf0.001"
    val ops = Relational.qUpsert(spark, sfDir)
      .groupBy("op").count().as[(String, Long)].collect().toMap
    val keys = graft.core.Tables.orders(spark, sfDir)
      .select($"o_orderkey").as[Long].collect()
    assert(ops.getOrElse("insert", 0L) == keys.count(k => k % 5 == 0 && k % 7 == 0))
    assert(ops.getOrElse("update", 0L) == keys.count(k => k % 5 == 0 && k % 7 != 0))
    assert(ops.getOrElse("keep", 0L) == keys.count(k => k % 5 != 0 && k % 7 != 0))
  }

  test("two-pass global index equals the single-window global row_number") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val sfDir = "/root/testdata/sf0.001"
    val naive = graft.core.Tables.events(spark, sfDir)
      .select($"event_id", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy($"ts", $"event_id"))
        .cast("long").as("idx"))
      .as[(Long, Long)].collect().toSet
    val scalable = Events.qGlobalIndex(spark, sfDir)
      .as[(Long, Long)].collect().toSet
    assert(scalable == naive)
  }

  test("linear interpolation blends gap hours exactly and leaves edges null") {
    import spark.implicits._
    val dir = tempDir("interp")
    val h0 = 1704067200L // 2024-01-01T00:00:00Z
    def ns(h: Long) = (h0 + h * 3600L) * 1000000000L
    writeEvents(dir, Seq(
      // type x: known at hours 0 (4+6=10) and 3 (40) -> gap hours 1, 2
      (1L, ns(0), 1L, "x", 4.0, "{}"),
      (2L, ns(0), 2L, "x", 6.0, "{}"),
      (3L, ns(3), 1L, "x", 40.0, "{}"),
      // type y: single known point at hour 2 -> no interpolation possible
      (4L, ns(2), 1L, "y", 5.0, "{}")))
    val got = Events.qInterpolate(spark, dir)
      .as[(String, java.sql.Timestamp, Option[Double], Boolean)]
      .collect().map(r => ((r._1, r._2.toInstant.getEpochSecond), (r._3, r._4))).toMap
    def at(t: String, h: Long) = got((t, h0 + h * 3600L))
    assert(at("x", 0) == (Some(10.0), false))
    assert(at("x", 1) == (Some(20.0), true)) // 10 + (40-10)*1/3
    assert(at("x", 2) == (Some(30.0), true))
    assert(at("x", 3) == (Some(40.0), false))
    assert(at("y", 2) == (Some(5.0), false))
    // outside the known range: no anchor on one side -> stays null
    assert(at("y", 0) == (None, false))
    assert(at("y", 3) == (None, false))
    assert(got.size == 8) // 4-hour spine x 2 types
  }

  test("full outer join keeps one-sided user-days with null metrics") {
    import spark.implicits._
    val dir = tempDir("fullouter")
    val day = 86400L * 1000 * 1000 * 1000 // one day in ns
    writeEvents(dir, Seq(
      (1L, 1L * day + 7, 1L, "purchase", 10.0, "{}"),  // user 1: purchase only
      (2L, 1L * day + 9, 2L, "error", 5.0, "{}"),      // user 2: error only
      (3L, 1L * day + 11, 3L, "purchase", 20.0, "{}"), // user 3: both sides
      (4L, 1L * day + 13, 3L, "error", 2.5, "{}"),
      (5L, 2L * day + 3, 3L, "purchase", 30.0, "{}"))) // user 3, day 2: purchase only
    val got = Events.qFullOuter(spark, dir)
      .select($"user_id", $"n_purchase", $"n_purchase_value", $"n_error", $"n_error_value")
      .as[(Long, Option[Long], Option[Double], Option[Long], Option[Double])]
      .collect().toSet
    assert(got == Set(
      (1L, Some(1L), Some(10.0), None, None),
      (2L, None, None, Some(1L), Some(5.0)),
      (3L, Some(1L), Some(20.0), Some(1L), Some(2.5)),
      (3L, Some(1L), Some(30.0), None, None)), s"got: $got")
  }

  test("anti join complements the urgent-customer semi set") {
    import spark.implicits._
    val sfDir = "/root/testdata/sf0.001"
    val anti = Analytics.qAntiJoin(spark, sfDir).count()
    val urgentCustomers = graft.core.Tables.orders(spark, sfDir)
      .filter($"o_orderpriority" === "1-URGENT")
      .select($"o_custkey").distinct().count()
    val customers = graft.core.Tables.customer(spark, sfDir).count()
    assert(anti == customers - urgentCustomers)
    assert(anti > 0, "anti join must be non-trivial on testdata")
  }

  test("histogram median equals the sorted order statistic per group") {
    import spark.implicits._
    val sfDir = "/root/testdata/sf0.001"
    val naive = graft.core.Tables.lineitem(spark, sfDir)
      .select($"l_returnflag", $"l_discount")
      .as[(String, Double)].collect()
      .groupBy(_._1).map { case (f, rows) =>
        val vs = rows.map(r => math.round(r._2 * 100)).sorted
        (f, vs.length.toLong, vs((vs.length + 1) / 2 - 1) / 100.0)
      }.toSet
    val got = Analytics.qMedianScalable(spark, sfDir)
      .as[(String, Long, Double)].collect().toSet
    assert(got == naive, s"got $got\nexp $naive")
  }
}
