package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.core.Tables

/** Time-series / event-stream operators over the `events` table.
  *
  * These are the batch analogs of the Structured Streaming pipeline in
  * graft.streaming (tumbling-window aggregation, per-key running state,
  * session windows): identical logical shapes, so the streaming path can
  * reuse the same expressions with a watermark added. The reference has no
  * streams (SURVEY §2.9) — this is north-star surface from BASELINE.json.
  *
  * Scale notes: every query here partitions by a real key (hour bucket,
  * user_id) — no global-order windows. Value sums go through DECIMAL so
  * they are exact and order-independent across engines and partitionings;
  * final outputs are cast to DOUBLE (decimal outputs hash-fail on
  * trailing-zero canonicalization — see Relational).
  */
object Events {

  private def dec(c: Column, p: Int = 18, s: Int = 2): Column =
    c.cast(DecimalType(p, s))

  // --------------------------------------------------------------------
  // Tumbling-window aggregation: per (hour, event_type) counts + exact
  // decimal sums. Streaming analog: groupBy(window($"ts", "1 hour"), ...)
  // with a watermark.
  def qEventWindow(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .groupBy(date_trunc("hour", $"ts").as("hour"), $"event_type")
      .agg(
        count(lit(1)).as("n_events"),
        sum(dec($"value")).cast("double").as("sum_value"))
  }

  val qEventWindowSql: String =
    """SELECT date_trunc('hour', ts) AS hour, event_type,
      |       count(*) AS n_events,
      |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2""".stripMargin

  // --------------------------------------------------------------------
  // W1 at scale: running sum PARTITIONED by user — the shape the
  // reference's global-order window (shift_data_processor.py:254) should
  // take when a partition key exists. (ts, event_id) is a unique order
  // key, so RANGE-frame tie semantics cannot differ between engines.
  def qRunningSum(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.events(spark, sfDir)
      .select($"user_id", $"event_id",
        sum(dec($"value")).over(w).cast("double").as("running_value"))
  }

  val qRunningSumSql: String =
    """SELECT user_id, event_id,
      |       CAST(sum(CAST(value AS DECIMAL(18,2)))
      |            OVER (PARTITION BY user_id ORDER BY ts, event_id) AS DOUBLE) AS running_value
      |FROM events""".stripMargin

  // --------------------------------------------------------------------
  // Sessionization: gaps-and-islands over event time per user — a session
  // breaks after a 30-minute silence. Same island-id construction as the
  // reference KPI (running sum of break flags), but partitioned by
  // user_id so it scales horizontally. Gap compare is in exact integer
  // microseconds on both sides.
  def qSessionize(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val byTime = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.events(spark, sfDir)
      .select($"user_id", $"ts", $"event_id",
        (unix_micros($"ts") - unix_micros(lag($"ts", 1).over(byTime))).as("gap_us"))
      .select($"user_id", $"ts", $"event_id",
        when($"gap_us".isNull || $"gap_us" <= 1800000000L, 0).otherwise(1).as("brk"))
      .select($"user_id", $"ts", $"event_id",
        sum($"brk").over(byTime).as("session_id"))
      .groupBy($"user_id", $"session_id")
      .agg(
        count(lit(1)).as("n_events"),
        (unix_micros(max($"ts")) - unix_micros(min($"ts"))).as("duration_us"))
  }

  val qSessionizeSql: String =
    """WITH g AS (
      |  SELECT user_id, ts, event_id,
      |         date_diff('microsecond', lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts) AS gap_us
      |  FROM events),
      |b AS (
      |  SELECT user_id, ts, event_id,
      |         CASE WHEN gap_us IS NULL OR gap_us <= 1800000000 THEN 0 ELSE 1 END AS brk
      |  FROM g),
      |s AS (
      |  SELECT user_id, ts,
      |         sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS session_id
      |  FROM b)
      |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
      |       count(*) AS n_events,
      |       date_diff('microsecond', min(ts), max(ts)) AS duration_us
      |FROM s GROUP BY 1, 2""".stripMargin

  // --------------------------------------------------------------------
  // Rolling time-range window: per user, count + exact sum of events in
  // the trailing 15 minutes of each event — a RANGE BETWEEN interval
  // frame, the sliding-window family neither the tumbling (qEventWindow)
  // nor running-sum (qRunningSum) shapes cover. The frame bound is on
  // exact integer microseconds so both engines resolve identical frames
  // (RANGE includes order-value ties identically by definition).
  // Partitioned by user_id: parallel at any scale, state per task is one
  // 15-minute buffer.
  def qRollingWindow(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy(unix_micros($"ts"))
      .rangeBetween(-900000000L, 0L)
    Tables.events(spark, sfDir)
      .select($"user_id", $"event_id",
        count(lit(1)).over(w).as("n_15m"),
        sum(dec($"value")).over(w).cast("double").as("sum_15m"))
  }

  val qRollingWindowSql: String =
    """SELECT user_id, event_id,
      |       count(*) OVER w AS n_15m,
      |       CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_15m
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
      |             RANGE BETWEEN 900000000 PRECEDING AND CURRENT ROW)""".stripMargin

  // --------------------------------------------------------------------
  // Built-in session windows: Spark's session_window aggregation merges
  // events within a 30-minute gap at the AGGREGATION layer (mergeable
  // session state — the same operator works under a streaming watermark),
  // in contrast to qSessionize's explicit lag/running-sum island
  // construction. Output is keyed by session start = min event time, so
  // the oracle reproduces it with the island construction — the two
  // formulations must agree exactly.
  def qSessionWindow(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .groupBy($"user_id", session_window($"ts", "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select($"user_id", $"w.start".as("session_start"), $"n_events")
  }

  val qSessionWindowSql: String =
    """WITH g AS (
      |  SELECT user_id, ts,
      |         date_diff('microsecond', lag(ts) OVER (PARTITION BY user_id ORDER BY ts), ts) AS gap_us
      |  FROM events),
      |b AS (
      |  -- STRICT <: session_window windows are [ts, ts+gap) and merge on
      |  -- overlap, so an event exactly gap after its predecessor starts a
      |  -- NEW session (qSessionize's manual islands use <= by design)
      |  SELECT user_id, ts,
      |         CASE WHEN gap_us IS NULL OR gap_us < 1800000000 THEN 0 ELSE 1 END AS brk
      |  FROM g),
      |s AS (
      |  SELECT user_id, ts,
      |         sum(brk) OVER (PARTITION BY user_id ORDER BY ts) AS session_id
      |  FROM b)
      |SELECT user_id, min(ts) AS session_start, count(*) AS n_events
      |FROM s GROUP BY user_id, session_id""".stripMargin

  // --------------------------------------------------------------------
  // Window navigation: lead/lag — previous/next event type and the gap
  // to the previous event per user (qSessionize uses lag internally;
  // this exposes the navigation family directly). (ts, event_id) is a
  // unique order key so offsets are deterministic; the gap is exact
  // integer microseconds.
  def qLeadLag(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.events(spark, sfDir)
      .select($"user_id", $"event_id", $"event_type",
        lag($"event_type", 1).over(w).as("prev_type"),
        lead($"event_type", 1).over(w).as("next_type"),
        (unix_micros($"ts") - unix_micros(lag($"ts", 1).over(w))).as("gap_us"))
  }

  val qLeadLagSql: String =
    """SELECT user_id, event_id, event_type,
      |       lag(event_type) OVER w AS prev_type,
      |       lead(event_type) OVER w AS next_type,
      |       date_diff('microsecond', lag(ts) OVER w, ts) AS gap_us
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin

  // --------------------------------------------------------------------
  // HLL approximate distinct: per event_type approx user count. The HLL
  // sketch is mergeable (associative partial agg — scales like a sum, no
  // distinct shuffle). DuckDB's HLL implementation differs, so the raw
  // estimate can't be oracle-hashed; instead the query outputs the exact
  // count plus a Spark-side assertion that the sketch landed within 5% of
  // it — the oracle reproduces the exact count and the (always-true)
  // tolerance flag, making the entry fully hash-checked. The operator
  // under test is approx_count_distinct; the exact countDistinct exists
  // only to ground the check (at 100 TB you'd ship the sketch alone).
  def qApproxDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .groupBy($"event_type")
      .agg(
        countDistinct($"user_id").as("n_users"),
        approx_count_distinct($"user_id", 0.01).as("approx"))
      .select($"event_type", $"n_users",
        (abs($"approx" - $"n_users").cast("double") / $"n_users".cast("double") <= 0.05)
          .as("approx_ok"))
  }

  val qApproxDistinctSql: String =
    """SELECT event_type, count(DISTINCT user_id) AS n_users, TRUE AS approx_ok
      |FROM events GROUP BY 1""".stripMargin

  // --------------------------------------------------------------------
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_event_window" -> (qEventWindow _),
    "q_running_sum" -> (qRunningSum _),
    "q_rolling_window" -> (qRollingWindow _),
    "q_lead_lag" -> (qLeadLag _),
    "q_sessionize" -> (qSessionize _),
    "q_session_window" -> (qSessionWindow _),
    "q_approx_distinct" -> (qApproxDistinct _))

  val oracleSql: Map[String, String] = Map(
    "q_event_window" -> qEventWindowSql,
    "q_running_sum" -> qRunningSumSql,
    "q_rolling_window" -> qRollingWindowSql,
    "q_lead_lag" -> qLeadLagSql,
    "q_sessionize" -> qSessionizeSql,
    "q_session_window" -> qSessionWindowSql,
    "q_approx_distinct" -> qApproxDistinctSql)
}
