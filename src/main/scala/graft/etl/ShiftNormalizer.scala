package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Nested-page → normalized-tables transform.
  *
  * Re-expresses the reference's row-at-a-time Python flattening
  * (`etl/app/shift_data_processor.py:62-121`) as declarative Spark plans:
  * `explode` replaces the nested list comprehensions (the UDTF-shaped
  * operator), higher-order `aggregate` replaces the per-row `sum(...)`
  * for `shift_cost`, and `when`/`timestamp_seconds` replaces
  * `parse_timestamp`. Everything stays inside whole-stage codegen — no
  * UDFs, no shuffles: each output table is a narrow projection of the
  * source partition it came from (parent keys propagate through `explode`,
  * so the parent-child join is by construction, never executed).
  */
object ShiftNormalizer {

  /** ms-epoch → second-precision timestamp with the reference's null guard
    * (`parse_timestamp`, shift_data_processor.py:117-121): non-null and > 0,
    * milliseconds truncated by integer division (observable: the golden
    * fixture has a break finishing at ...5277 ms).
    */
  def msToTimestamp(c: Column): Column = {
    // True integral `ms // 1000` (the reference's floor division): subtract
    // the remainder first so the double division is exact for every long —
    // Spark's plain `/` on longs rounds through double.
    val ms = c.cast("long")
    when(c.isNotNull && c > 0,
      timestamp_seconds(((ms - pmod(ms, lit(1000L))) / 1000L).cast("long")))
      .otherwise(lit(null).cast("timestamp"))
  }

  private def sumCosts(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, x) => acc + coalesce(x.getField("cost"), lit(0.0)))

  /** shifts table: one row per source shift.
    * shift_cost = bround(Σ allowances.cost + Σ award_interpretations.cost, 4)
    * — `bround` (HALF_EVEN) mirrors Python `round` (shift_data_processor.py:78-82).
    */
  def shifts(page: DataFrame): DataFrame = {
    val s = page.select(explode(col("results")).as("r")).select("r.*")
    s.select(
      col("id").as("shift_id"),
      to_date(col("date"), "yyyy-MM-dd").as("shift_date"),
      msToTimestamp(col("start")).as("shift_start"),
      msToTimestamp(col("finish")).as("shift_finish"),
      bround(sumCosts(col("allowances")) + sumCosts(col("award_interpretations")), 4)
        .cast(DecimalType(13, 4)).as("shift_cost"))
  }

  /** breaks table: explode with parent-key propagation
    * (process_breaks, shift_data_processor.py:89-101). */
  def breaks(page: DataFrame): DataFrame =
    page.select(explode(col("results")).as("r"))
      .select(col("r.id").as("shift_id"), explode(col("r.breaks")).as("b"))
      .select(
        col("b.id").as("break_id"),
        col("shift_id"),
        msToTimestamp(col("b.start")).as("break_start"),
        msToTimestamp(col("b.finish")).as("break_finish"),
        // NULL stays NULL: the reference inserts break['paid'] verbatim and
        // Postgres's DEFAULT FALSE only applies when the column is omitted,
        // never to an explicit JSON null (initdb.sql:16).
        col("b.paid").as("is_paid"))

  /** allowances table: explode + rename map {id→allowance_id, value→
    * allowance_value, cost→allowance_cost} (shift_data_processor.py:103-108). */
  def allowances(page: DataFrame): DataFrame =
    page.select(explode(col("results")).as("r"))
      .select(col("r.id").as("shift_id"), explode(col("r.allowances")).as("a"))
      .select(
        col("a.id").as("allowance_id"),
        col("shift_id"),
        col("a.value").as("allowance_value"),
        col("a.cost").cast(DecimalType(13, 4)).as("allowance_cost"))

  /** award_interpretations table: explode + rename map
    * (shift_data_processor.py:110-115). */
  def awardInterpretations(page: DataFrame): DataFrame =
    page.select(explode(col("results")).as("r"))
      .select(col("r.id").as("shift_id"), explode(col("r.award_interpretations")).as("w"))
      .select(
        col("w.id").as("award_id"),
        col("shift_id"),
        to_date(col("w.date"), "yyyy-MM-dd").as("award_date"),
        col("w.units").as("award_units"),
        col("w.cost").cast(DecimalType(13, 4)).as("award_cost"))

  /** All four normalized tables from one page (or union of pages). */
  def normalize(page: DataFrame): NormalizedShifts =
    NormalizedShifts(shifts(page), breaks(page), allowances(page), awardInterpretations(page))
}

/** The four normalized tables of one batch. */
case class NormalizedShifts(
    shifts: DataFrame,
    breaks: DataFrame,
    allowances: DataFrame,
    awardInterpretations: DataFrame)
