package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.core.Tables

/** Temporal join operators Spark has no built-in for — as-of join and
  * range (interval) join — composed from existing operators per the
  * custom-operator preference order (compose > custom plan): both stay
  * equi-join + window shaped, so they scale like any keyed shuffle and
  * never fall into a broadcast-nested-loop inequality join (asserted in
  * PlanQualitySpec).
  */
object TemporalJoins {

  // --------------------------------------------------------------------
  // As-of join: for every error event, the value of the latest click of
  // the same user at-or-before it. Implemented as the tagged-union
  // window trick: interleave both sides ordered by (ts, event_id) per
  // user and carry the last non-null click value forward — one shuffle
  // on user_id, no join at all. The oracle is DuckDB's native ASOF JOIN,
  // so the composition is checked against a first-class implementation.
  def qAsofJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val tagged = Tables.events(spark, sfDir)
      .filter($"event_type".isin("click", "error"))
      .select($"user_id", $"ts", $"event_id",
        // a struct, not the bare value: a click whose value IS NULL must
        // still win the as-of match (ASOF emits the row with NULL value;
        // last(ignoreNulls) on the bare value would skip past it)
        when($"event_type" === "click", struct($"value")).as("click"),
        ($"event_type" === "error").as("is_probe"))
    // clicks sort before probes at equal ts, matching ASOF's c.ts <= e.ts
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"is_probe", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("last_click", last($"click", ignoreNulls = true).over(w))
      .filter($"is_probe" && $"last_click".isNotNull)
      .select($"event_id", $"user_id", $"last_click.value".as("last_click_value"))
  }

  val qAsofJoinSql: String =
    """SELECT e.event_id, e.user_id, c.value AS last_click_value
      |FROM (SELECT * FROM events WHERE event_type = 'error') e
      |ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |  ON e.user_id = c.user_id AND c.ts <= e.ts""".stripMargin

  // --------------------------------------------------------------------
  // Range join: (click, error) pairs of the same user with the error in
  // (click_ts, click_ts + 5 min]. A naive inequality join is a nested
  // loop; binning time into window-sized buckets turns it into an
  // equi-join on (user, bin): each click probes its own bin and the
  // next (the interval spans at most two bins), the exact predicate
  // filters after. Each qualifying pair matches in exactly one bin, so
  // no dedup pass is needed.
  private val WindowUs = 300000000L // 5 minutes in microseconds

  def qRangeJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir)
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", unix_micros($"ts").as("cus"), $"event_id".as("click_id"))
      .withColumn("bin", explode(array(
        expr(s"cus div $WindowUs"), expr(s"cus div $WindowUs") + 1)))
    val errors = ev.filter($"event_type" === "error")
      .select($"user_id", unix_micros($"ts").as("eus"), $"event_id".as("error_id"))
      .withColumn("bin", expr(s"eus div $WindowUs"))
    clicks.join(errors, Seq("user_id", "bin"))
      .filter($"eus" > $"cus" && $"eus" <= $"cus" + WindowUs)
      .select($"click_id", $"error_id")
  }

  val qRangeJoinSql: String =
    s"""SELECT c.event_id AS click_id, e.event_id AS error_id
       |FROM events c JOIN events e
       |  ON c.user_id = e.user_id
       | AND c.event_type = 'click' AND e.event_type = 'error'
       | AND epoch_us(e.ts) > epoch_us(c.ts)
       | AND epoch_us(e.ts) <= epoch_us(c.ts) + $WindowUs""".stripMargin

  // --------------------------------------------------------------------
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_asof_join" -> (qAsofJoin _),
    "q_range_join" -> (qRangeJoin _))

  val oracleSql: Map[String, String] = Map(
    "q_asof_join" -> qAsofJoinSql,
    "q_range_join" -> qRangeJoinSql)
}
