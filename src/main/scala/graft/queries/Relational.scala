package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.core.Tables

/** Relational operator demonstrations on the testdata star schema.
  *
  * Each query maps one operator family from SURVEY.md §2 (reference:
  * ivanovicnikola/shifts-etl, see file:line cites per query) onto the
  * TPC-H-ish testdata so the driver's DuckDB oracle can verify it.
  *
  * Numeric discipline for oracle hash-matching: aggregates over
  * fractional doubles are cast to DECIMAL first (exact, order-independent,
  * and double→decimal rounding is identical across engines because binary
  * doubles can never sit exactly on a decimal rounding tie). Aggregates
  * over integral doubles (l_quantity) and single IEEE ops (one division)
  * are bit-identical across engines and left as doubles.
  */
object Relational {

  /** Dates are pinned (SURVEY §2.8: CURRENT_DATE is nondeterministic —
    * parameterize). Data spans 1995-01-01..2001-08-01 (o_orderdate). */
  private val asOf = "2001-07-01"

  private def dec(c: Column, p: Int = 18, s: Int = 2): Column =
    c.cast(org.apache.spark.sql.types.DecimalType(p, s))

  // --------------------------------------------------------------------
  // Q8/P7: grouped aggregation + predicate filter (TPC-H Q1 shape).
  // Reference shape: GROUP BY grp / KPI filters
  // (etl/app/shift_data_processor.py:263, :276).
  def q1PricingSummary(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .filter($"l_shipdate" <= lit(java.sql.Timestamp.valueOf("2001-06-01 00:00:00")))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum($"l_quantity").as("sum_qty"),
        sum(dec($"l_extendedprice")).as("sum_base_price"),
        sum(dec($"l_extendedprice") * (lit(1).cast("decimal(3,2)") - dec($"l_discount", 4, 2)))
          .as("sum_disc_price"),
        avg($"l_quantity").as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val q1PricingSummarySql: String =
    """SELECT l_returnflag, l_linestatus,
      |       sum(l_quantity) AS sum_qty,
      |       sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sum_base_price,
      |       sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS sum_disc_price,
      |       avg(l_quantity) AS avg_qty,
      |       count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2001-06-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // --------------------------------------------------------------------
  // J1/Q3/P9: inner equi-join + date-window filter + scalar MAX + COALESCE.
  // Reference: max_allowance_cost_14d KPI (shift_data_processor.py:239-247)
  // — allowances ⋈ shifts with a 14-day cutoff. The filtered build side is
  // small, so we broadcast it: no shuffle of the fact table at any scale.
  def qJoinFilterMax(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val recentOrders = Tables.orders(spark, sfDir)
      .filter($"o_orderdate" >= lit(java.sql.Timestamp.valueOf(s"$asOf 00:00:00")))
      .select($"o_orderkey")
    Tables.lineitem(spark, sfDir)
      .select($"l_orderkey", $"l_extendedprice")
      .join(broadcast(recentOrders), $"l_orderkey" === $"o_orderkey", "inner")
      .agg(coalesce(max(dec($"l_extendedprice")), lit(0).cast("decimal(18,2)")).as("max_price"))
  }

  val qJoinFilterMaxSql: String =
    s"""SELECT coalesce(max(CAST(l_extendedprice AS DECIMAL(18,2))), CAST(0 AS DECIMAL(18,2))) AS max_price
       |FROM lineitem
       |INNER JOIN (SELECT o_orderkey FROM orders WHERE o_orderdate >= TIMESTAMP '$asOf 00:00:00') o
       |  ON l_orderkey = o_orderkey""".stripMargin

  // --------------------------------------------------------------------
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> (q1PricingSummary _),
    "q_join_filter_max" -> (qJoinFilterMax _))

  val oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" -> q1PricingSummarySql,
    "q_join_filter_max" -> qJoinFilterMaxSql)
}
