package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.Tables

/** Wider analytic shapes over the star schema — multi-join rollups, semi
  * joins, grouping sets. These extend the reference's operator set (which
  * tops out at 2-table joins, SURVEY §2.3) toward what a warehouse user
  * expects, with the physical plans a 100 TB deployment needs: dimension
  * tables broadcast (no fact shuffle for the join), aggregation pushed to
  * partial/final hash agg, top-k as TakeOrderedAndProject.
  */
object Analytics {

  private def dec(c: Column, p: Int = 18, s: Int = 2): Column =
    c.cast(DecimalType(p, s))

  // --------------------------------------------------------------------
  // Revenue per nation: fact ⋈ 4 dimensions (TPC-H Q5 shape). customer /
  // nation / region are broadcast — the lineitem fact is never shuffled
  // for a join, only for the final (tiny) aggregation.
  def qRevenueByNation(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables.customer(spark, sfDir).select($"c_custkey", $"c_nationkey")
    val nat = Tables.nation(spark, sfDir).select($"n_nationkey", $"n_name", $"n_regionkey")
    val reg = Tables.region(spark, sfDir).select($"r_regionkey", $"r_name")
    Tables.lineitem(spark, sfDir)
      .select($"l_orderkey", dec($"l_extendedprice" * (lit(1.0) - $"l_discount"), 18, 4).as("rev"))
      .join(Tables.orders(spark, sfDir).select($"o_orderkey", $"o_custkey"),
        $"l_orderkey" === $"o_orderkey")
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .join(broadcast(nat), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(reg), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name", $"n_name")
      .agg(sum($"rev").cast("double").as("revenue"), count(lit(1)).as("n_items"))
  }

  val qRevenueByNationSql: String =
    """SELECT r_name, n_name,
      |       CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |       count(*) AS n_items
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name""".stripMargin

  // --------------------------------------------------------------------
  // Semi join: orders that have at least one high-value item — EXISTS
  // semantics without duplicating the parent (left_semi, the probe side
  // broadcast).
  def qSemiJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val big = Tables.lineitem(spark, sfDir)
      .filter($"l_extendedprice" >= 100000.0)
      .select($"l_orderkey")
    Tables.orders(spark, sfDir)
      .join(broadcast(big), $"o_orderkey" === $"l_orderkey", "left_semi")
      .select($"o_orderkey", $"o_orderstatus")
  }

  val qSemiJoinSql: String =
    """SELECT o_orderkey, o_orderstatus FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_extendedprice >= 100000.0)""".stripMargin

  // --------------------------------------------------------------------
  // Anti join: customers with NO urgent order — NOT EXISTS semantics
  // keeping the probe side's full row (contrast qExcept, which is
  // DISTINCT set difference on one column). left_anti against the
  // filtered order keys; like the semi join, only the join keys of the
  // build side ship, and the priority filter is pushed to the scan.
  def qAntiJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.customer(spark, sfDir)
      .join(Tables.orders(spark, sfDir)
          .filter($"o_orderpriority" === "1-URGENT").select($"o_custkey"),
        $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_mktsegment")
  }

  val qAntiJoinSql: String =
    """SELECT c_custkey, c_mktsegment FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_orderpriority = '1-URGENT')""".stripMargin

  // --------------------------------------------------------------------
  // Rollup (grouping sets): per (flag, status) totals plus per-flag and
  // grand totals in ONE pass — Spark expands grouping sets inside the
  // partial aggregation, so the fact table is still scanned once.
  def qRollup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .rollup($"l_returnflag", $"l_linestatus")
      .agg(sum(dec($"l_extendedprice")).cast("double").as("total_price"),
        count(lit(1)).as("n_items"))
  }

  val qRollupSql: String =
    """SELECT l_returnflag, l_linestatus,
      |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
      |       count(*) AS n_items
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin

  // --------------------------------------------------------------------
  // Cube: all 2^k grouping-set combinations — rollup plus the
  // column-marginal sets ((), (status) here). Same single-pass expansion
  // inside the partial aggregate as rollup: one fact scan, grouping-id
  // rows fan out before the shuffle.
  def qCube(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .cube($"l_returnflag", $"l_linestatus")
      .agg(sum(dec($"l_extendedprice")).cast("double").as("total_price"),
        count(lit(1)).as("n_items"))
  }

  val qCubeSql: String =
    """SELECT l_returnflag, l_linestatus,
      |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
      |       count(*) AS n_items
      |FROM lineitem
      |GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin

  // --------------------------------------------------------------------
  // Explicit GROUPING SETS: the general form rollup/cube specialize —
  // here the two single-column marginals plus the pair, WITHOUT the
  // grand total (a set no rollup or cube over two columns produces).
  // Same one-pass physical shape (Expand before the partial aggregate:
  // each row fans out once per set, map-side combine still applies);
  // grouping_id() disambiguates a genuinely-NULL group value from an
  // aggregated-away column, which matters the moment a grouping column
  // is nullable.
  def qGroupingSets(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .groupingSets(
        Seq(Seq($"l_returnflag", $"l_linestatus"),
          Seq($"l_returnflag"), Seq($"l_linestatus")),
        $"l_returnflag", $"l_linestatus")
      .agg(grouping_id().cast("long").as("gid"),
        sum(dec($"l_extendedprice")).cast("double").as("total_price"),
        count(lit(1)).as("n_items"))
  }

  val qGroupingSetsSql: String =
    """SELECT l_returnflag, l_linestatus,
      |       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
      |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
      |       count(*) AS n_items
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
      |                        (l_returnflag), (l_linestatus))""".stripMargin

  // --------------------------------------------------------------------
  // Array scalar-function family (§2.8): sort/slice/reverse/element_at/
  // contains/distinct/HOF-aggregate over a per-order quantity array.
  // The array build is one keyed collect_list (bounded: ≤7 items/order);
  // everything after is row-local codegen'd array arithmetic. Outputs
  // are scalars extracted FROM the arrays — array-typed output columns
  // would hash differently across engines' parquet writers, scalars
  // cannot. l_quantity values are integral doubles, so sums are exact.
  def qArrayFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .groupBy($"l_orderkey")
      .agg(sort_array(collect_list($"l_quantity")).as("qs"))
      .select($"l_orderkey",
        size($"qs").cast("long").as("n_items"),
        element_at($"qs", 1).as("min_qty"),
        element_at($"qs", least(lit(2), size($"qs"))).as("second_qty"),
        aggregate(slice(reverse($"qs"), 1, 2), lit(0.0), _ + _).as("top2_sum"),
        array_contains($"qs", 10.0).as("has_ten"),
        size(array_distinct($"qs")).cast("long").as("n_distinct_qty"))
  }

  val qArrayFuncsSql: String =
    """SELECT l_orderkey,
      |       CAST(len(qs) AS BIGINT) AS n_items,
      |       qs[1] AS min_qty,
      |       qs[least(2, len(qs))] AS second_qty,
      |       list_sum(list_reverse(qs)[1:2]) AS top2_sum,
      |       list_contains(qs, 10.0) AS has_ten,
      |       CAST(len(list_distinct(qs)) AS BIGINT) AS n_distinct_qty
      |FROM (SELECT l_orderkey, list_sort(list(l_quantity)) AS qs
      |      FROM lineitem GROUP BY 1)""".stripMargin

  // --------------------------------------------------------------------
  // Map scalar-function family (§2.8): per language, a source→doc-count
  // map built with map_from_entries, then probed/inspected with
  // element_at / map_keys / map_values / size. Maps never leave the
  // query: outputs are scalars extracted from them (map-typed columns
  // don't hash portably across engines), and the oracle derives the
  // same scalars with conditional aggregation over the underlying
  // counts — equal by construction.
  def qMapFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .groupBy($"lang", $"source")
      .agg(count(lit(1)).as("n"))
      .groupBy($"lang")
      .agg(map_from_entries(
        array_sort(collect_list(struct($"source", $"n")))).as("m"))
      .select($"lang",
        size($"m").cast("long").as("n_sources"),
        // try_element_at: a lang with no src3 source must yield NULL like
        // the oracle's conditional max — plain element_at THROWS under
        // ANSI mode on a missing map key (review r6)
        try_element_at($"m", lit("src3")).as("src3_docs"),
        array_max(map_values($"m")).as("max_source_docs"),
        array_join(array_sort(map_keys($"m")), ",").as("sources"))
  }

  val qMapFuncsSql: String =
    """SELECT lang,
      |       count(*) AS n_sources,
      |       max(CASE WHEN source = 'src3' THEN n END) AS src3_docs,
      |       max(n) AS max_source_docs,
      |       string_agg(source, ',' ORDER BY source) AS sources
      |FROM (SELECT lang, source, count(*) AS n
      |      FROM documents GROUP BY 1, 2)
      |GROUP BY 1""".stripMargin

  // --------------------------------------------------------------------
  // Customer-order distribution (TPC-H Q13 shape): the double
  // aggregation — count orders per customer (LEFT join so zero-order
  // customers count), then count customers per order-count. The second
  // aggregate runs over the already-reduced per-customer frame; no
  // re-scan of facts. A histogram over an aggregate is the canonical
  // "aggregate of an aggregate" the optimizer must not collapse.
  def qOrderDist(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.customer(spark, sfDir).select($"c_custkey")
      .join(Tables.orders(spark, sfDir).select($"o_custkey", $"o_orderkey"),
        $"c_custkey" === $"o_custkey", "left_outer")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("n_orders"))
      .groupBy($"n_orders")
      .agg(count(lit(1)).as("n_customers"))
  }

  val qOrderDistSql: String =
    """SELECT n_orders, count(*) AS n_customers
      |FROM (SELECT c_custkey, count(o_orderkey) AS n_orders
      |      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |      GROUP BY 1)
      |GROUP BY 1""".stripMargin

  // --------------------------------------------------------------------
  // Null-safe equality: Spark's <=> (DuckDB IS NOT DISTINCT FROM) treats
  // NULL as a joinable value — the semantics SCD merges and
  // change-detection diffs need, where standard = silently drops every
  // NULL-keyed row. Nulls are injected via nullif on a tiny dim⋈dim
  // join so the null×null match is visible in the output (region 4 and
  // its nations pair through the NULL key).
  def qNullSafe(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val nat = Tables.nation(spark, sfDir)
      .select($"n_name", nullif($"n_regionkey", lit(4)).as("nk"))
    val reg = Tables.region(spark, sfDir)
      .select($"r_name", nullif($"r_regionkey", lit(4)).as("rk"))
    nat.join(broadcast(reg), $"nk" <=> $"rk")
      .select($"n_name", $"r_name",
        $"nk".isNull.as("via_null_key"))
  }

  val qNullSafeSql: String =
    """SELECT n_name, r_name, nk IS NULL AS via_null_key
      |FROM (SELECT n_name, nullif(n_regionkey, 4) AS nk FROM nation) n
      |JOIN (SELECT r_name, nullif(r_regionkey, 4) AS rk FROM region) r
      |  ON nk IS NOT DISTINCT FROM rk""".stripMargin

  // --------------------------------------------------------------------
  // Math scalar-function family (§2.8): abs/sign/mod/ceil/floor/
  // greatest/least — the engine-stable subset (exact on integral inputs;
  // no transcendentals, whose last-ulp behavior differs across libm
  // builds and would flake the hash gate — the same rule that keeps
  // ln() out of q_tfidf). Row-local, map-only scan.
  def qMathFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .select($"l_orderkey", $"l_linenumber",
        abs($"l_quantity" - 25.0).as("abs_dev"),
        signum($"l_quantity" - 25.0).cast("long").as("sgn"),
        ($"l_orderkey" % 7).as("mod7"),
        ceil($"l_quantity" / 7.0).cast("long").as("ceil7"),
        floor($"l_quantity" / 7.0).cast("long").as("floor7"),
        greatest($"l_quantity", lit(25.0)).as("hi"),
        least($"l_quantity", lit(25.0)).as("lo"))
  }

  val qMathFuncsSql: String =
    """SELECT l_orderkey, l_linenumber,
      |       abs(l_quantity - 25.0) AS abs_dev,
      |       CAST(sign(l_quantity - 25.0) AS BIGINT) AS sgn,
      |       l_orderkey % 7 AS mod7,
      |       CAST(ceil(l_quantity / 7.0) AS BIGINT) AS ceil7,
      |       CAST(floor(l_quantity / 7.0) AS BIGINT) AS floor7,
      |       greatest(l_quantity, 25.0) AS hi,
      |       least(l_quantity, 25.0) AS lo
      |FROM lineitem""".stripMargin

  // --------------------------------------------------------------------
  // Bitwise scalar family — integer-exact by construction (the same rule
  // that keeps transcendentals out of qMathFuncs): and/or/xor, shifts,
  // popcount over the 64-bit key. The practical uses in this engine are
  // hash-family construction (CountMinAgg's chained hashes), simhash
  // band slicing (Dedup), and bitmap-style flag packing. Map-only scan.
  def qBitwiseFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .select($"event_id",
        ($"event_id".bitwiseAND(255L)).as("b_and"),
        ($"event_id".bitwiseOR(4096L)).as("b_or"),
        ($"event_id".bitwiseXOR($"user_id")).as("b_xor"),
        shiftleft($"event_id", 3).as("b_shl"),
        shiftright($"event_id", 2).as("b_shr"),
        bit_count($"event_id").as("b_pop"))
  }

  val qBitwiseFuncsSql: String =
    """SELECT event_id,
      |       event_id & 255 AS b_and,
      |       event_id | 4096 AS b_or,
      |       xor(event_id, user_id) AS b_xor,
      |       event_id << 3 AS b_shl,
      |       event_id >> 2 AS b_shr,
      |       CAST(bit_count(event_id) AS INTEGER) AS b_pop
      |FROM events""".stripMargin

  // --------------------------------------------------------------------
  // Top-k per group: 3 highest-value items per return flag — window rank
  // partitioned by the group key (parallel; contrast with O1's global
  // top-k).
  def qTopKPerGroup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"l_returnflag")
      .orderBy($"l_extendedprice".desc, $"l_orderkey", $"l_linenumber")
    Tables.lineitem(spark, sfDir)
      .select($"l_returnflag", $"l_orderkey", $"l_linenumber", $"l_extendedprice",
        row_number().over(w).as("rk"))
      .filter($"rk" <= 3)
      .select($"l_returnflag", $"rk", $"l_orderkey", $"l_linenumber")
  }

  val qTopKPerGroupSql: String =
    """SELECT l_returnflag, CAST(rk AS INTEGER) AS rk, l_orderkey, l_linenumber
      |FROM (SELECT l_returnflag, l_orderkey, l_linenumber,
      |             row_number() OVER (PARTITION BY l_returnflag
      |                                ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rk
      |      FROM lineitem)
      |WHERE rk <= 3""".stripMargin

  // --------------------------------------------------------------------
  // The same stock window formulation as qTopKPerGroup, but run under
  // the TopKWindowRewrite optimizer rule: the Rule[LogicalPlan] inserts
  // the bounded TopKPerGroupPlan below the window, so WindowExec ranks
  // ≤ groups×k survivors instead of sorting every group (the full
  // custom-Catalyst quartet — LogicalPlan + Rule + Strategy + SparkPlan —
  // exercised through user code that knows nothing of it). Output is
  // identical to qTopKPerGroup by construction (same oracle SQL).
  def qTopKRewrite(spark: SparkSession, sfDir: String): DataFrame = {
    graft.plans.TopKWindowRewrite.register(spark)
    qTopKPerGroup(spark, sfDir)
  }

  // --------------------------------------------------------------------
  // Set operations (SURVEY §2.7 notes the reference has none — this is
  // extension surface). EXCEPT/INTERSECT carry DISTINCT set semantics in
  // both engines; physically a shuffle keyed on the full row — keep the
  // projections narrow.
  def qExcept(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.customer(spark, sfDir).select($"c_custkey")
      .except(Tables.orders(spark, sfDir).select($"o_custkey".as("c_custkey")))
  }

  val qExceptSql: String =
    """SELECT c_custkey FROM customer
      |EXCEPT SELECT o_custkey AS c_custkey FROM orders""".stripMargin

  // EXCEPT ALL: bag semantics — each customer key survives as many times
  // as its multiplicity difference (contrast with qExcept's DISTINCT set
  // semantics). Spark plans this as a count-aggregate + generate
  // replicate, not a join per duplicate.
  def qExceptAll(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, sfDir)
      .filter($"o_orderpriority" === "1-URGENT")
      .select($"o_custkey".as("custkey"))
      .exceptAll(Tables.orders(spark, sfDir)
        .filter($"o_orderpriority" === "2-HIGH")
        .select($"o_custkey".as("custkey")))
  }

  val qExceptAllSql: String =
    """SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      |EXCEPT ALL
      |SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '2-HIGH'""".stripMargin

  def qIntersect(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.customer(spark, sfDir)
      .filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
      .intersect(Tables.orders(spark, sfDir)
        .filter($"o_orderpriority" === "1-URGENT")
        .select($"o_custkey".as("c_custkey")))
  }

  val qIntersectSql: String =
    """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |INTERSECT
      |SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'""".stripMargin

  // --------------------------------------------------------------------
  // Scalar string-function family over `part` (the one testdata table no
  // other query touches): substring, case mapping, length, LIKE
  // containment, trim+concat — all dialect-neutral, all codegen'd
  // row-local projections over a pruned scan.
  def qStringFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.part(spark, sfDir)
      .filter($"p_size" >= 40)
      .select(
        $"p_partkey",
        upper($"p_brand").as("brand_u"),
        substring($"p_name", 1, 12).as("name12"),
        length($"p_name").cast("long").as("name_len"),
        $"p_type".like("%BRASS%").as("is_brass"),
        concat_ws("|", trim($"p_brand"), lower($"p_type")).as("brand_type"))
  }

  val qStringFuncsSql: String =
    """SELECT p_partkey,
      |       upper(p_brand) AS brand_u,
      |       substr(p_name, 1, 12) AS name12,
      |       CAST(length(p_name) AS BIGINT) AS name_len,
      |       p_type LIKE '%BRASS%' AS is_brass,
      |       concat_ws('|', trim(p_brand), lower(p_type)) AS brand_type
      |FROM part WHERE p_size >= 40""".stripMargin

  // --------------------------------------------------------------------
  // Pivot: wide conditional aggregation. Spark's pivot with explicit
  // values compiles to the same single-pass conditional aggregates the
  // oracle spells out — no second scan, no shuffle beyond the groupBy.
  def qPivot(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .groupBy($"l_returnflag")
      .pivot("l_linestatus", Seq("F", "O"))
      .count()
      // empty pivot cells are NULL in Spark but 0 under count(*) FILTER
      .select($"l_returnflag",
        coalesce($"F", lit(0L)).as("n_f"), coalesce($"O", lit(0L)).as("n_o"))
  }

  val qPivotSql: String =
    """SELECT l_returnflag,
      |       count(*) FILTER (WHERE l_linestatus = 'F') AS n_f,
      |       count(*) FILTER (WHERE l_linestatus = 'O') AS n_o
      |FROM lineitem GROUP BY 1""".stripMargin

  // --------------------------------------------------------------------
  // Unpivot (melt): wide measure columns → tall (measure, value) rows —
  // the inverse reshape of qPivot, and the canonical feed for
  // measure-generic pipelines (one quality/monitoring rule over any
  // measure instead of one per column). Row-local generation (each input
  // row fans out to 3), no shuffle; Spark plans it as Expand, the same
  // operator grouping sets use.
  def qUnpivot(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .filter($"l_orderkey" <= 100)
      .select($"l_orderkey", $"l_linenumber",
        $"l_quantity", $"l_extendedprice", $"l_discount")
      .unpivot(
        Array($"l_orderkey", $"l_linenumber"),
        Array($"l_quantity", $"l_extendedprice", $"l_discount"),
        "measure", "value")
  }

  val qUnpivotSql: String =
    """SELECT l_orderkey, l_linenumber, measure, value
      |FROM (SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
      |      FROM lineitem WHERE l_orderkey <= 100)
      |UNPIVOT (value FOR measure IN (l_quantity, l_extendedprice, l_discount))""".stripMargin

  // --------------------------------------------------------------------
  // Ordered string aggregation (LISTAGG / string_agg): the sorted distinct
  // part types per brand, pipe-joined. Expressed as collect_set →
  // array_sort → array_join so the result is deterministic under ANY
  // partitioning/arrival order — the property that makes string_agg safe
  // distributed (an unordered LISTAGG is nondeterministic at scale and
  // can't be hash-verified). collect_set is a mergeable partial aggregate;
  // the sort happens per group AFTER aggregation (groups are small), not
  // as a global sort.
  def qStringAgg(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.part(spark, sfDir)
      .groupBy($"p_brand")
      .agg(
        array_join(array_sort(collect_set($"p_type")), "|").as("types"),
        countDistinct($"p_type").as("n_types"))
  }

  val qStringAggSql: String =
    """SELECT p_brand,
      |       string_agg(DISTINCT p_type, '|' ORDER BY p_type) AS types,
      |       count(DISTINCT p_type) AS n_types
      |FROM part GROUP BY 1""".stripMargin

  // --------------------------------------------------------------------
  // Percent-of-total (window share): each nation's share of global
  // revenue — an unpartitioned window, but over the POST-AGGREGATE 25-row
  // frame, which is the scalable formulation (aggregate first, window
  // over the reduced result; never a global window over fact rows). The
  // denominator is summed in DECIMAL, not double: each revenue is an
  // exact decimal(18,4) value (lossless in a double at these magnitudes),
  // so the decimal re-cast is exact and the sum is order-independent —
  // a double window-sum would depend on shuffle arrival order and flake
  // the hash gate in the last ulp.
  def qShare(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val byNation = qRevenueByNation(spark, sfDir)
      .select($"n_name", $"revenue")
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    byNation.select($"n_name", $"revenue",
      ($"revenue" / sum(dec($"revenue", 28, 4)).over(w).cast("double")).as("share"))
  }

  val qShareSql: String =
    s"""WITH rev AS (SELECT n_name, revenue FROM ($qRevenueByNationSql))
       |SELECT n_name, revenue,
       |       revenue / CAST(sum(CAST(revenue AS DECIMAL(28,4))) OVER () AS DOUBLE) AS share
       |FROM rev""".stripMargin

  // --------------------------------------------------------------------
  // Correlated-subquery shape (TPC-H Q17 family): line items heavier than
  // their own order's average quantity. SQL engines decorrelate this into
  // the windowed form Spark is handed directly: one avg over the order
  // partition, filter against it — a single keyed window, no self-join,
  // no per-row subquery execution. l_quantity is integral so the double
  // average is exact on both engines.
  def qAboveAvg(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"l_orderkey")
    Tables.lineitem(spark, sfDir)
      .select($"l_orderkey", $"l_linenumber", $"l_quantity",
        avg($"l_quantity").over(w).as("ord_avg"))
      .filter($"l_quantity" > $"ord_avg")
  }

  val qAboveAvgSql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity, ord_avg
      |FROM (SELECT l_orderkey, l_linenumber, l_quantity,
      |             avg(l_quantity) OVER (PARTITION BY l_orderkey) AS ord_avg
      |      FROM lineitem)
      |WHERE l_quantity > ord_avg""".stripMargin

  // --------------------------------------------------------------------
  // Date/time scalar-function family (SURVEY §2.8 breadth): calendar
  // part extraction, date arithmetic, and truncation over the order
  // timestamps — all row-local and codegen'd, restricted to parts whose
  // numbering agrees across engines (day-of-week conventions differ, so
  // DOW is expressed as a date-diff mod 7 from a pinned Monday instead
  // of either engine's builtin).
  def qDateFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, sfDir)
      .filter($"o_orderkey" <= 1000)
      .select($"o_orderkey",
        year($"o_orderdate").as("y"),
        quarter($"o_orderdate").as("q"),
        month($"o_orderdate").as("m"),
        dayofmonth($"o_orderdate").as("d"),
        datediff(to_date(lit("1998-01-01")), to_date($"o_orderdate"))
          .cast("long").as("days_to_98"),
        date_trunc("month", $"o_orderdate").as("month_start"),
        (pmod(datediff(to_date($"o_orderdate"), to_date(lit("1995-01-02"))), lit(7)) + 1)
          .cast("int").as("dow_monday1"))
  }

  val qDateFuncsSql: String =
    """SELECT o_orderkey,
      |       CAST(year(o_orderdate) AS INTEGER) AS y,
      |       CAST(quarter(o_orderdate) AS INTEGER) AS q,
      |       CAST(month(o_orderdate) AS INTEGER) AS m,
      |       CAST(day(o_orderdate) AS INTEGER) AS d,
      |       CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS BIGINT) AS days_to_98,
      |       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
      |       CAST(((date_diff('day', DATE '1995-01-02', CAST(o_orderdate AS DATE)) % 7 + 7) % 7) + 1 AS INTEGER) AS dow_monday1
      |FROM orders WHERE o_orderkey <= 1000""".stripMargin

  // --------------------------------------------------------------------
  // Statistical moments + correlation with ORDER-INDEPENDENT exactness:
  // stddev/variance/corr built-ins accumulate floating sums whose value
  // depends on partition merge order — nondeterministic distributed, and
  // never hash-identical across engines. Instead the five power sums
  // (Σx, Σy, Σx², Σy², Σxy) run in DECIMAL (exact, associative — safe
  // under any partitioning), are cast once to double, and the textbook
  // formulas are written LONGHAND in the same left-to-right shape on
  // both sides — every derived double is then bit-identical. This is the
  // pattern for ANY moment-based statistic at 100 TB: exact mergeable
  // sums first, float algebra once at the end.
  def qStatsMoments(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val x = dec($"l_quantity")
    val y = dec($"l_extendedprice")
    // DECIMAL→DOUBLE via the oracle engine's own recipe —
    // double(unscaled) / double(10^scale), two IEEE steps — instead of
    // Spark's correctly-rounded single conversion: for sums past 2^53
    // (Σprice² here) the two disagree by one ulp on half-ulp boundaries
    // (hit at sf0.001, round 7). Both steps below are exact-decimal
    // until the final cast, so the shape is engine-portable by
    // construction rather than by luck.
    def viaUnscaled(c: Column, scale: Int): Column = {
      val f = java.math.BigDecimal.valueOf(math.pow(10, scale).toLong)
      (c * lit(f)).cast(org.apache.spark.sql.types.DecimalType(38, 0))
        .cast("double") / lit(math.pow(10, scale))
    }
    val agg = Tables.lineitem(spark, sfDir)
      .groupBy($"l_returnflag")
      .agg(
        count(lit(1)).cast("double").as("n"),
        viaUnscaled(sum(x), 2).as("sx"),
        viaUnscaled(sum(y), 2).as("sy"),
        viaUnscaled(sum(dec(x * x, 38, 4)), 4).as("sxx"),
        viaUnscaled(sum(dec(y * y, 38, 4)), 4).as("syy"),
        viaUnscaled(sum(dec(x * y, 38, 4)), 4).as("sxy"))
    agg.select($"l_returnflag",
      $"n".cast("long").as("n_items"),
      ($"sx" / $"n").as("mean_qty"),
      (($"sxx" - $"sx" * $"sx" / $"n") / ($"n" - 1)).as("var_qty"),
      (($"sxy" - $"sx" * $"sy" / $"n") /
        sqrt(($"sxx" - $"sx" * $"sx" / $"n") * ($"syy" - $"sy" * $"sy" / $"n")))
        .as("corr_qty_price"))
  }

  val qStatsMomentsSql: String =
    """WITH s AS (
      |  SELECT l_returnflag,
      |         CAST(count(*) AS DOUBLE) AS n,
      |         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
      |         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
      |         CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS DOUBLE) AS sxx,
      |         CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS DOUBLE) AS syy,
      |         CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS DOUBLE) AS sxy
      |  FROM lineitem GROUP BY 1)
      |SELECT l_returnflag,
      |       CAST(n AS BIGINT) AS n_items,
      |       sx / n AS mean_qty,
      |       (sxx - sx * sx / n) / (n - 1) AS var_qty,
      |       (sxy - sx * sy / n)
      |         / sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)) AS corr_qty_price
      |FROM s""".stripMargin

  // --------------------------------------------------------------------
  // Exact percentiles (continuous interpolation) per group. Exact over
  // integral doubles so both engines interpolate identically; at scale
  // swap to approx_percentile (t-digest sketch, mergeable) — exact
  // percentile requires a per-group sort.
  def qPercentile(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .groupBy($"l_returnflag")
      .agg(
        expr("percentile(l_quantity, 0.5)").as("med_qty"),
        expr("percentile(l_quantity, 0.9)").as("p90_qty"))
  }

  val qPercentileSql: String =
    """SELECT l_returnflag,
      |       quantile_cont(l_quantity, 0.5) AS med_qty,
      |       quantile_cont(l_quantity, 0.9) AS p90_qty
      |FROM lineitem GROUP BY 1""".stripMargin

  // --------------------------------------------------------------------
  // Approximate percentile — the 100 TB path (mergeable sketch, no
  // per-group sort). The sketch itself isn't engine-portable, so like
  // q_approx_distinct the query outputs the exact value plus a Spark-side
  // assertion that the sketch landed within tolerance; the oracle
  // reproduces the exact value and the always-true flag. l_quantity is
  // 1..50 integral, so a ±1.0 band is a tight check at accuracy 1000.
  def qPercentileApprox(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .groupBy($"l_returnflag")
      .agg(
        expr("percentile(l_quantity, 0.5)").as("med_qty"),
        expr("approx_percentile(l_quantity, 0.5, 1000)").as("approx_med"))
      .select($"l_returnflag", $"med_qty",
        (abs($"approx_med" - $"med_qty") <= 1.0).as("approx_ok"))
  }

  val qPercentileApproxSql: String =
    """SELECT l_returnflag,
      |       quantile_cont(l_quantity, 0.5) AS med_qty,
      |       TRUE AS approx_ok
      |FROM lineitem GROUP BY 1""".stripMargin

  // --------------------------------------------------------------------
  // Dimension grid — the one legitimate CROSS JOIN: a bounded dims×dims
  // reporting grid (every region × order priority, 5×5), left-joined to
  // the fact aggregate so ABSENT combinations appear as explicit zeros
  // (the "no orders from this region at this priority" row a dashboard
  // must render and an inner join silently drops). The cartesian is
  // dims-sized BY CONSTRUCTION — the fact table never cross-joins; it
  // aggregates first (broadcast dim chain, one hash agg) and the ≤25-row
  // grid joins the ≤25-row aggregate. Completes the join taxonomy:
  // inner/left/full/semi/anti/as-of/range/bucketed/bloom + cross.
  def qDimGrid(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables.customer(spark, sfDir).select($"c_custkey", $"c_nationkey")
    val nat = Tables.nation(spark, sfDir).select($"n_nationkey", $"n_regionkey")
    val reg = Tables.region(spark, sfDir).select($"r_regionkey", $"r_name")
    val counts = Tables.orders(spark, sfDir)
      .select($"o_custkey", $"o_orderpriority")
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .join(broadcast(nat), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(reg), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name", $"o_orderpriority")
      .agg(count(lit(1)).as("n"))
    val grid = reg.select($"r_name")
      .crossJoin(Tables.orders(spark, sfDir)
        .select($"o_orderpriority").distinct())
    grid.join(counts, Seq("r_name", "o_orderpriority"), "left")
      .select($"r_name", $"o_orderpriority",
        coalesce($"n", lit(0L)).as("n_orders"))
  }

  val qDimGridSql: String =
    """WITH counts AS (
      |  SELECT r_name, o_orderpriority, count(*) AS n
      |  FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation   ON c_nationkey = n_nationkey
      |  JOIN region   ON n_regionkey = r_regionkey
      |  GROUP BY 1, 2),
      |grid AS (SELECT r_name, o_orderpriority
      |         FROM region CROSS JOIN (SELECT DISTINCT o_orderpriority FROM orders))
      |SELECT grid.r_name, grid.o_orderpriority,
      |       coalesce(counts.n, 0) AS n_orders
      |FROM grid LEFT JOIN counts
      |  ON grid.r_name = counts.r_name
      | AND grid.o_orderpriority = counts.o_orderpriority""".stripMargin

  // --------------------------------------------------------------------
  // EXACT median at scale — the value-histogram two-phase. The built-in
  // `percentile` (q_percentile) buffers and sorts every group member;
  // at 100 TB a single hot group's values may not fit one executor.
  // This form computes the SAME exact order statistic from the value
  // HISTOGRAM: one hash aggregation to (group, value, count) — bounded
  // by the value domain, not the row count — then a cumulative count
  // over the histogram (a window over |distinct values| rows per group,
  // not |rows|) picks the smallest value whose cumulative count reaches
  // k = ⌈n/2⌉. Works for any order statistic; integer-exact, no
  // interpolation (lower median for even n — stated, and pinned equal
  // to the naive sorted pick in AnalyticsOpsSpec). The discount-value
  // domain is 11 values; a continuous domain would bucket first (the
  // q_histogram machinery) and recurse into one bucket.
  def qMedianScalable(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val hist = Tables.lineitem(spark, sfDir)
      .select($"l_returnflag", round($"l_discount" * 100).cast("long").as("v"))
      .groupBy($"l_returnflag", $"v").agg(count(lit(1)).as("c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"l_returnflag").orderBy($"v")
    hist
      .withColumn("cum", sum($"c").over(w))
      .withColumn("n", sum($"c").over(
        org.apache.spark.sql.expressions.Window.partitionBy($"l_returnflag")))
      .filter($"cum" - $"c" < expr("(n + 1) div 2") &&
        expr("(n + 1) div 2") <= $"cum")
      .select($"l_returnflag", $"n",
        ($"v".cast("double") / 100).as("median_discount"))
  }

  val qMedianScalableSql: String =
    """WITH h AS (SELECT l_returnflag, CAST(round(l_discount * 100) AS BIGINT) AS v,
      |                  count(*) AS c
      |           FROM lineitem GROUP BY 1, 2),
      |r AS (SELECT l_returnflag, v, c,
      |             sum(c) OVER (PARTITION BY l_returnflag ORDER BY v) AS cum,
      |             sum(c) OVER (PARTITION BY l_returnflag) AS n
      |      FROM h)
      |SELECT l_returnflag, CAST(n AS BIGINT) AS n,
      |       CAST(v AS DOUBLE) / 100 AS median_discount
      |FROM r
      |WHERE cum - c < (n + 1) // 2 AND (n + 1) // 2 <= cum""".stripMargin

  // --------------------------------------------------------------------
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_revenue_by_nation" -> (qRevenueByNation _),
    "q_semi_join" -> (qSemiJoin _),
    "q_anti_join" -> (qAntiJoin _),
    "q_multi_distinct" -> (qMultiDistinct _),
    "q_profile" -> (qProfile _),
    "q_rollup" -> (qRollup _),
    "q_cube" -> (qCube _),
    "q_topk_per_group" -> (qTopKPerGroup _),
    "q_topk_rewrite" -> (qTopKRewrite _),
    "q_except" -> (qExcept _),
    "q_except_all" -> (qExceptAll _),
    "q_intersect" -> (qIntersect _),
    "q_pivot" -> (qPivot _),
    "q_unpivot" -> (qUnpivot _),
    "q_string_agg" -> (qStringAgg _),
    "q_share" -> (qShare _),
    "q_grouping_sets" -> (qGroupingSets _),
    "q_array_funcs" -> (qArrayFuncs _),
    "q_map_funcs" -> (qMapFuncs _),
    "q_math_funcs" -> (qMathFuncs _),
    "q_bitwise_funcs" -> (qBitwiseFuncs _),
    "q_order_dist" -> (qOrderDist _),
    "q_null_safe" -> (qNullSafe _),
    "q_above_avg" -> (qAboveAvg _),
    "q_string_funcs" -> (qStringFuncs _),
    "q_percentile" -> (qPercentile _),
    "q_stats_moments" -> (qStatsMoments _),
    "q_date_funcs" -> (qDateFuncs _),
    "q_percentile_approx" -> (qPercentileApprox _),
    "q_median_scalable" -> (qMedianScalable _),
    "q_dim_grid" -> (qDimGrid _))

  // --------------------------------------------------------------------
  // Several COUNT(DISTINCT …) on different columns in ONE grouped pass.
  // Catalyst plans this with an Expand (each input row is replicated once
  // per distinct column, tagged with a grouping id) followed by two
  // aggregate stages — one scan of the fact table regardless of how many
  // distinct columns are asked for, each with map-side partial dedup.
  // The naive alternative (one self-join or one scan per distinct column)
  // is what this shape exists to avoid at 100 TB.
  def qMultiDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .groupBy($"l_returnflag")
      .agg(
        count(lit(1)).as("n_rows"),
        countDistinct($"l_orderkey").as("n_orders"),
        countDistinct($"l_partkey").as("n_parts"),
        countDistinct($"l_suppkey").as("n_supps"))
  }

  val qMultiDistinctSql: String =
    """SELECT l_returnflag,
      |       count(*) AS n_rows,
      |       count(DISTINCT l_orderkey) AS n_orders,
      |       count(DISTINCT l_partkey) AS n_parts,
      |       count(DISTINCT l_suppkey) AS n_supps
      |FROM lineitem GROUP BY 1""".stripMargin

  // --------------------------------------------------------------------
  // Column-profiling audit: per-column row/null/distinct counts plus
  // lexicographic min/max, the first thing a pipeline runs over a new
  // 100 TB drop before any transform trusts it. One scan: `stack`
  // unpivots the audited columns to (col, val) rows (a map-side Generate
  // — ×4 rows, no extra scans; pinned in PlanQualitySpec), then a single
  // grouped aggregate profiles all columns together. Only long/string columns are audited here:
  // their string casts are engine-portable, where double/timestamp
  // formatting is not (the repo's numeric profile lives in
  // qStatsMoments).
  def qProfile(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, sfDir)
      .select(expr(
        """stack(4,
          |  'o_orderkey', cast(o_orderkey as string),
          |  'o_custkey', cast(o_custkey as string),
          |  'o_orderstatus', o_orderstatus,
          |  'o_orderpriority', o_orderpriority) as (col, val)""".stripMargin))
      .groupBy($"col")
      .agg(
        count(lit(1)).as("n_rows"),
        count($"val").as("n_nonnull"),
        countDistinct($"val").as("n_distinct"),
        min($"val").as("min_val"),
        max($"val").as("max_val"))
  }

  val qProfileSql: String =
    """WITH u AS (
      |  SELECT 'o_orderkey' AS col, CAST(o_orderkey AS VARCHAR) AS val FROM orders
      |  UNION ALL
      |  SELECT 'o_custkey', CAST(o_custkey AS VARCHAR) FROM orders
      |  UNION ALL
      |  SELECT 'o_orderstatus', o_orderstatus FROM orders
      |  UNION ALL
      |  SELECT 'o_orderpriority', o_orderpriority FROM orders)
      |SELECT col,
      |       count(*) AS n_rows,
      |       count(val) AS n_nonnull,
      |       count(DISTINCT val) AS n_distinct,
      |       min(val) AS min_val,
      |       max(val) AS max_val
      |FROM u GROUP BY 1""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q_revenue_by_nation" -> qRevenueByNationSql,
    "q_semi_join" -> qSemiJoinSql,
    "q_anti_join" -> qAntiJoinSql,
    "q_multi_distinct" -> qMultiDistinctSql,
    "q_profile" -> qProfileSql,
    "q_rollup" -> qRollupSql,
    "q_cube" -> qCubeSql,
    "q_topk_per_group" -> qTopKPerGroupSql,
    "q_topk_rewrite" -> qTopKPerGroupSql,
    "q_except" -> qExceptSql,
    "q_except_all" -> qExceptAllSql,
    "q_intersect" -> qIntersectSql,
    "q_pivot" -> qPivotSql,
    "q_unpivot" -> qUnpivotSql,
    "q_string_agg" -> qStringAggSql,
    "q_share" -> qShareSql,
    "q_grouping_sets" -> qGroupingSetsSql,
    "q_array_funcs" -> qArrayFuncsSql,
    "q_map_funcs" -> qMapFuncsSql,
    "q_math_funcs" -> qMathFuncsSql,
    "q_bitwise_funcs" -> qBitwiseFuncsSql,
    "q_order_dist" -> qOrderDistSql,
    "q_null_safe" -> qNullSafeSql,
    "q_above_avg" -> qAboveAvgSql,
    "q_string_funcs" -> qStringFuncsSql,
    "q_percentile" -> qPercentileSql,
    "q_stats_moments" -> qStatsMomentsSql,
    "q_date_funcs" -> qDateFuncsSql,
    "q_percentile_approx" -> qPercentileApproxSql,
    "q_median_scalable" -> qMedianScalableSql,
    "q_dim_grid" -> qDimGridSql)
}
