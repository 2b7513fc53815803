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
  *
  * Round-3 addendum: no oracle-checked query emits a DECIMAL-typed OUTPUT
  * column. Engines canonicalize trailing-zero decimal fractions
  * differently (e.g. 65002.2870), which fails the driver's value hash even
  * when declared types and values match. The exact decimal aggregate is
  * therefore cast to DOUBLE as the last step on BOTH sides — for unscaled
  * values < 2^53 that cast is correctly rounded and bit-identical across
  * engines.
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
        // Money math runs in DECIMAL (exact, order-independent) but the
        // FINAL output is cast to DOUBLE on both sides: engines canonicalize
        // decimal trailing-zero fractions differently (round-2 hash fails),
        // while the decimal→double cast is correctly rounded and
        // bit-identical in both engines for unscaled values < 2^53.
        sum(dec($"l_extendedprice")).cast("double").as("sum_base_price"),
        sum(dec($"l_extendedprice") * (lit(1).cast("decimal(3,2)") - dec($"l_discount", 4, 2)))
          .cast("double").as("sum_disc_price"),
        avg($"l_quantity").as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val q1PricingSummarySql: String =
    """SELECT l_returnflag, l_linestatus,
      |       sum(l_quantity) AS sum_qty,
      |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
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
      .agg(coalesce(max(dec($"l_extendedprice")), lit(0).cast("decimal(18,2)"))
        .cast("double").as("max_price"))
  }

  val qJoinFilterMaxSql: String =
    s"""SELECT CAST(coalesce(max(CAST(l_extendedprice AS DECIMAL(18,2))), CAST(0 AS DECIMAL(18,2))) AS DOUBLE) AS max_price
       |FROM lineitem
       |INNER JOIN (SELECT o_orderkey FROM orders WHERE o_orderdate >= TIMESTAMP '$asOf 00:00:00') o
       |  ON l_orderkey = o_orderkey""".stripMargin

  // --------------------------------------------------------------------
  // J2/P8/P9: left outer join preserving all parents, with null-flag CASE
  // and COALESCE defaults. Reference: shifts ⟕ breaks feeding the
  // break-free-period KPI (shift_data_processor.py:255-256). The filtered
  // right side is small, so broadcast it — the parent table never shuffles.
  def qLeftJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val big = Tables.lineitem(spark, sfDir)
      .filter($"l_quantity" >= 50)
      .select($"l_orderkey", dec($"l_extendedprice").as("price"))
    Tables.orders(spark, sfDir)
      .select($"o_orderkey")
      .join(broadcast(big), $"o_orderkey" === $"l_orderkey", "left_outer")
      .groupBy($"o_orderkey")
      .agg(
        count($"l_orderkey").as("n_big"),
        coalesce(max($"price"), lit(0).cast("decimal(18,2)")).cast("double").as("max_big"),
        max(when($"l_orderkey".isNull, 0).otherwise(1)).as("has_big"))
  }

  val qLeftJoinSql: String =
    """SELECT o_orderkey,
      |       count(l_orderkey) AS n_big,
      |       CAST(coalesce(max(CAST(l_extendedprice AS DECIMAL(18,2))), CAST(0 AS DECIMAL(18,2))) AS DOUBLE) AS max_big,
      |       max(CASE WHEN l_orderkey IS NULL THEN 0 ELSE 1 END) AS has_big
      |FROM orders LEFT JOIN (SELECT * FROM lineitem WHERE l_quantity >= 50) l
      |  ON o_orderkey = l_orderkey
      |GROUP BY o_orderkey""".stripMargin

  // --------------------------------------------------------------------
  // W1/Q8/P8/O1 flagship: gaps-and-islands. Longest run of consecutive
  // order-days with no URGENT order — exactly the reference's
  // max_break_free_shift_period_in_days KPI (shift_data_processor.py:
  // 249-265): running SUM(flag) OVER (ORDER BY date) forms island ids,
  // grouped count with the grp=0 adjustment, top-1.
  // The global-order window runs over ~2.4k distinct days (post-groupBy),
  // not raw orders — the single-task window sees one row per day, so the
  // exchange is tiny at any fact-table scale. (A fully partitioned two-pass
  // variant is q_islands_scalable in Scale.scala.)
  def qIslands(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val days = Tables.orders(spark, sfDir)
      .select(to_date($"o_orderdate").as("day"),
        when($"o_orderpriority" === "1-URGENT", 1).otherwise(0).as("u"))
      .groupBy($"day")
      .agg(max($"u").as("has_urgent"))
    val w = Window.orderBy($"day")
    days
      .select($"day", sum(when($"has_urgent" === 0, 0).otherwise(1)).over(w).as("grp"))
      .groupBy($"grp")
      .agg((count(lit(1)) - when($"grp" === 0, 0).otherwise(1)).as("cnt"))
      .orderBy($"cnt".desc)
      .limit(1)
      .select($"cnt".as("max_streak"))
  }

  val qIslandsSql: String =
    """WITH days AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |         max(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS has_urgent
      |  FROM orders GROUP BY 1),
      |g AS (
      |  SELECT day,
      |         sum(CASE WHEN has_urgent = 0 THEN 0 ELSE 1 END) OVER (ORDER BY day) AS grp
      |  FROM days),
      |c AS (
      |  SELECT grp, count(*) - CASE WHEN grp = 0 THEN 0 ELSE 1 END AS cnt
      |  FROM g GROUP BY grp)
      |SELECT cnt AS max_streak FROM c ORDER BY cnt DESC LIMIT 1""".stripMargin

  // --------------------------------------------------------------------
  // O1: top-k — ORDER BY ... LIMIT k. Catalyst rewrites to
  // TakeOrderedAndProject: per-partition top-k then a k-row merge on the
  // driver, never a full sort. Reference: ORDER BY cnt DESC LIMIT 1
  // (shift_data_processor.py:264-265). Tie-broken by key for determinism.
  def qTopK(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, sfDir)
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .limit(5)
      .select($"o_orderkey", $"o_totalprice")
  }

  val qTopKSql: String =
    """SELECT o_orderkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 5""".stripMargin

  // --------------------------------------------------------------------
  // O2: offset/limit pagination slice over a deterministic order.
  // Reference: SHIFTS[start:start+limit] (api/app/main.py:92).
  def qPageSlice(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, sfDir)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .orderBy($"o_orderkey")
      .offset(40)
      .limit(20)
  }

  val qPageSliceSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_orderkey LIMIT 20 OFFSET 40""".stripMargin

  // --------------------------------------------------------------------
  // S5/Q1/Q2/Q5/Q6 KPI shape: tall (kpi_name, kpi_date, kpi_value) table.
  // Reference computes 6 scalar subqueries (shift_data_processor.py:
  // 225-279); at scale the right plan is ONE multi-aggregate pass over the
  // fact table, unpivoted to the tall shape — not N separate scans.
  // avg stays exact: l_quantity values are integral doubles, so the sum is
  // exact in both engines and the single final division is bit-identical.
  def qKpiUnion(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .agg(
        avg($"l_quantity").as("avg_qty"),
        min($"l_extendedprice").as("min_price"),
        max($"l_extendedprice").as("max_price"),
        count(when($"l_returnflag" === "R", 1)).cast("double").as("returned_count"))
      .select(expr(
        """stack(4,
          |  'avg_qty', avg_qty,
          |  'min_price', min_price,
          |  'max_price', max_price,
          |  'returned_count', returned_count) AS (kpi_name, kpi_value)""".stripMargin))
      .select($"kpi_name", lit(java.sql.Date.valueOf(asOf)).as("kpi_date"), $"kpi_value")
  }

  val qKpiUnionSql: String =
    s"""SELECT 'avg_qty' AS kpi_name, DATE '$asOf' AS kpi_date, avg(l_quantity) AS kpi_value FROM lineitem
       |UNION ALL SELECT 'min_price', DATE '$asOf', min(l_extendedprice) FROM lineitem
       |UNION ALL SELECT 'max_price', DATE '$asOf', max(l_extendedprice) FROM lineitem
       |UNION ALL SELECT 'returned_count', DATE '$asOf', CAST(count(*) FILTER (WHERE l_returnflag = 'R') AS DOUBLE) FROM lineitem""".stripMargin

  // --------------------------------------------------------------------
  // SQL surface parity: the reference's entire query layer is SQL text
  // shipped to an engine (shift_data_processor.py:225-279). This entry
  // runs ONE dialect-neutral SQL string through spark.sql(...) over temp
  // views — and the oracle executes the SAME string, character for
  // character, in DuckDB. Any divergence in parse, name resolution,
  // aggregation or cast semantics would surface as a hash mismatch.
  val qSqlSharedText: String =
    """SELECT l_returnflag,
      |       count(*) AS n_items,
      |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
      |       CAST(min(l_orderkey) AS BIGINT) AS first_order
      |FROM lineitem
      |WHERE l_quantity >= 25
      |GROUP BY l_returnflag""".stripMargin

  def qSqlShared(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("lineitem")
    spark.sql(qSqlSharedText)
  }

  // --------------------------------------------------------------------
  // Recursive CTE, shared text: Spark 4 accepts the same WITH RECURSIVE
  // dialect DuckDB runs, so this extends the q_sql_shared
  // character-for-character contract to ITERATION — the SQL face of the
  // engine's iterative algorithms (the dedup clustering loop's oracle
  // already recursed on the DuckDB side; now the Spark side demonstrates
  // the native operator too). The recursion is a doubling chain (depth
  // log₂ 65536 = 17 — recursion depth, not data volume, bounds the
  // plan), joined once against `part` AFTER the fixpoint: each level
  // counts whether its power-of-two key exists in the table.
  val qRecursiveCteText: String =
    """WITH RECURSIVE chain (n) AS (
      |  SELECT 1
      |  UNION ALL
      |  SELECT n * 2 FROM chain WHERE n < 65536
      |)
      |SELECT c.n, count(p.p_partkey) AS n_matching_parts
      |FROM chain c LEFT JOIN part p ON p.p_partkey = c.n
      |GROUP BY c.n""".stripMargin

  def qRecursiveCte(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.part(spark, sfDir).createOrReplaceTempView("part")
    spark.sql(qRecursiveCteText)
  }

  // --------------------------------------------------------------------
  // MERGE / upsert: reconcile a base table with a delta batch — the
  // warehouse mutation the reference's transactional sink family (S4)
  // grows into once loads become incremental. Simulated deterministically
  // from `orders`: base = keys with o_orderkey % 7 != 0, delta = keys
  // with % 5 == 0 carrying revised prices (×1.05, exact IEEE on both
  // engines) — so the merge exercises all three MERGE arms: matched
  // (update), not-matched-by-target (insert), not-matched-by-source
  // (keep). One full-outer equi-join on the key; at scale both sides are
  // bucketed/partitioned on the merge key, so the join is co-located and
  // the delta (usually ≪ base) can instead drive a shuffle-free
  // broadcast outer join.
  def qUpsert(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val base = Tables.orders(spark, sfDir)
      .filter($"o_orderkey" % 7 =!= 0)
      .select($"o_orderkey".as("b_key"), $"o_orderstatus".as("b_status"),
        $"o_totalprice".as("b_price"))
    val delta = Tables.orders(spark, sfDir)
      .filter($"o_orderkey" % 5 === 0)
      .select($"o_orderkey".as("d_key"), lit("U").as("d_status"),
        ($"o_totalprice" * 1.05).as("d_price"))
    base.join(delta, $"b_key" === $"d_key", "full_outer")
      .select(
        coalesce($"b_key", $"d_key").as("o_orderkey"),
        coalesce($"d_status", $"b_status").as("status"),
        coalesce($"d_price", $"b_price").as("price"),
        (when($"b_key".isNull, "insert")
          .when($"d_key".isNull, "keep")
          .otherwise("update")).as("op"))
  }

  val qUpsertSql: String =
    """WITH base AS (
      |  SELECT o_orderkey AS b_key, o_orderstatus AS b_status, o_totalprice AS b_price
      |  FROM orders WHERE o_orderkey % 7 <> 0),
      |delta AS (
      |  SELECT o_orderkey AS d_key, 'U' AS d_status, o_totalprice * 1.05 AS d_price
      |  FROM orders WHERE o_orderkey % 5 = 0)
      |SELECT coalesce(b_key, d_key) AS o_orderkey,
      |       coalesce(d_status, b_status) AS status,
      |       coalesce(d_price, b_price) AS price,
      |       CASE WHEN b_key IS NULL THEN 'insert'
      |            WHEN d_key IS NULL THEN 'keep'
      |            ELSE 'update' END AS op
      |FROM base FULL JOIN delta ON b_key = d_key""".stripMargin

  // --------------------------------------------------------------------
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> (q1PricingSummary _),
    "q_upsert" -> (qUpsert _),
    "q_join_filter_max" -> (qJoinFilterMax _),
    "q_left_join" -> (qLeftJoin _),
    "q_islands" -> (qIslands _),
    "q_topk" -> (qTopK _),
    "q_page_slice" -> (qPageSlice _),
    "q_kpi_union" -> (qKpiUnion _),
    "q_sql_shared" -> (qSqlShared _),
    "q_recursive_cte" -> (qRecursiveCte _))

  val oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" -> q1PricingSummarySql,
    "q_upsert" -> qUpsertSql,
    "q_join_filter_max" -> qJoinFilterMaxSql,
    "q_left_join" -> qLeftJoinSql,
    "q_islands" -> qIslandsSql,
    "q_topk" -> qTopKSql,
    "q_page_slice" -> qPageSliceSql,
    "q_kpi_union" -> qKpiUnionSql,
    "q_sql_shared" -> qSqlSharedText,
    "q_recursive_cte" -> qRecursiveCteText)
}
