package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The custom bounded top-k-per-group operator: exactness vs the window
  * form, the partial→exchange→final physical shape, and that no sort of
  * the input appears anywhere in the plan. */
class TopKPerGroupSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  private def lineitem = graft.core.Tables.lineitem(spark, sfDir)

  test("equals the window row_number form exactly") {
    import spark.implicits._
    val df = lineitem
    val custom = TopKPerGroup.topKPerGroup(df,
        Seq(df("l_returnflag")),
        Seq(df("l_extendedprice").desc, df("l_orderkey"), df("l_linenumber")), 3)
      .select($"l_returnflag", $"l_orderkey", $"l_linenumber")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    val window = graft.queries.Analytics.qTopKPerGroup(spark, sfDir)
      .select($"l_returnflag", $"l_orderkey", $"l_linenumber")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(custom == window)
  }

  test("plans as partial -> exchange -> final with no input sort") {
    val df = lineitem
    val p = TopKPerGroup.topKPerGroup(df,
      Seq(df("l_returnflag")),
      Seq(df("l_extendedprice").desc, df("l_orderkey"), df("l_linenumber")), 3)
      .queryExecution.executedPlan.toString
    assert(p.contains("TopKPerGroupPartial"), p)
    assert(p.contains("TopKPerGroupFinal"), p)
    assert(p.contains("Exchange hashpartitioning(l_returnflag"), p)
    // the whole point: the input is never sorted (WindowExec would)
    assert(!p.contains("Sort "), p)
    assert(!p.contains("Window"), p)
  }

  test("handles ties, k larger than group, and single groups") {
    import spark.implicits._
    val df = Seq(
      ("a", 10, 1), ("a", 10, 2), ("a", 5, 3),
      ("b", 7, 4)).toDF("g", "v", "id")
    val out = TopKPerGroup.topKPerGroup(df,
        Seq(df("g")), Seq(df("v").desc, df("id")), 2)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
    // a: ties on v=10 break by id (1 then 2); b: only row survives
    assert(out == Set(("a", 10, 1), ("a", 10, 2), ("b", 7, 4)))
  }

  test("partial-stage flush under a tiny group cap stays exact") {
    import spark.implicits._
    TopKPerGroup.register(spark)
    // many groups + cap of 2 → the partial stage flushes repeatedly; the
    // final stage must still reduce to the exact per-group top-2
    val df = lineitem.select($"l_orderkey", $"l_linenumber", $"l_extendedprice")
    val sorted = df.sort(df("l_extendedprice").desc, df("l_linenumber"))
    val analyzed = sorted.queryExecution.analyzed
      .asInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Sort]
    val plan = TopKPerGroupPlan(
      Seq(analyzed.child.output.find(_.name == "l_orderkey").get),
      analyzed.order, 2, analyzed.child, maxGroupsInMemory = 2)
    val custom = org.apache.spark.sql.GraftColumnBridge.ofRows(spark, plan)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"l_orderkey").orderBy($"l_extendedprice".desc, $"l_linenumber")
    val window = df.withColumn("rk", row_number().over(w)).filter($"rk" <= 2)
      .select($"l_orderkey", $"l_linenumber")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(custom == window)
    assert(custom.nonEmpty)
  }

  test("optimizer rule rewrites the stock window-rank filter to the bounded operator") {
    import spark.implicits._
    TopKWindowRewrite.register(spark)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"l_returnflag")
      .orderBy($"l_extendedprice".desc, $"l_orderkey", $"l_linenumber")
    // the completely standard formulation — user code knows nothing of
    // the custom operator
    val q = lineitem
      .select($"l_returnflag", $"l_orderkey", $"l_linenumber", $"l_extendedprice",
        row_number().over(w).as("rk"))
      .filter($"rk" <= 3)
      .select($"l_returnflag", $"rk", $"l_orderkey", $"l_linenumber")
    val physical = q.queryExecution.executedPlan.toString
    assert(physical.contains("TopKPerGroupPartial"), physical)
    assert(physical.contains("TopKPerGroupFinal"), physical)
    // the Window survives (it ranks the <= groups*k survivors), but its
    // input is the bounded operator, not the raw scan
    assert(physical.contains("Window"), physical)
    val got = q.collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getInt(3))).toSet
    val expect = graft.queries.Analytics.qTopKPerGroup(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getInt(3))).toSet
    assert(got == expect)
    assert(got.nonEmpty)
  }

  test("optimizer rule fires for the SQL-text window form too") {
    TopKWindowRewrite.register(spark)
    lineitem.createOrReplaceTempView("lineitem_sqltopk")
    val q = spark.sql(
      """SELECT l_returnflag, rk, l_orderkey, l_linenumber
        |FROM (SELECT l_returnflag, l_orderkey, l_linenumber,
        |             row_number() OVER (PARTITION BY l_returnflag
        |                                ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rk
        |      FROM lineitem_sqltopk)
        |WHERE rk <= 3""".stripMargin)
    val physical = q.queryExecution.executedPlan.toString
    assert(physical.contains("TopKPerGroupPartial"), physical)
    assert(q.count() == 9)
  }

  test("optimizer rule leaves unsafe window shapes alone") {
    import spark.implicits._
    TopKWindowRewrite.register(spark)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"l_returnflag")
      .orderBy($"l_extendedprice".desc, $"l_orderkey", $"l_linenumber")
    // rank() can exceed k rows per group under ties — must not rewrite
    val ranked = lineitem
      .select($"l_returnflag", rank().over(w).as("rk")).filter($"rk" <= 3)
    assert(!ranked.queryExecution.executedPlan.toString.contains("TopKPerGroup"))
    // a sibling window aggregate needs full groups — must not rewrite
    val sibling = lineitem
      .select($"l_returnflag",
        row_number().over(w).as("rk"), sum($"l_quantity").over(w).as("s"))
      .filter($"rk" <= 3)
    assert(!sibling.queryExecution.executedPlan.toString.contains("TopKPerGroup"))
    // global (unpartitioned) top-k is TakeOrderedAndProject's job
    val global = org.apache.spark.sql.expressions.Window
      .orderBy($"l_extendedprice".desc, $"l_orderkey", $"l_linenumber")
    val g = lineitem.select($"l_orderkey", row_number().over(global).as("rk"))
      .filter($"rk" <= 3)
    assert(!g.queryExecution.executedPlan.toString.contains("TopKPerGroup"))
  }

  test("strategy also arrives via SparkSessionExtensions injection") {
    // the extension class wires the same strategy a builder-configured
    // session would get; verify the injection point compiles and runs
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions().apply(ext)
    val planned = org.apache.spark.sql.GraftColumnBridge.plannerStrategies(ext, spark)
    assert(planned.contains(TopKPerGroupStrategy))
  }
}
