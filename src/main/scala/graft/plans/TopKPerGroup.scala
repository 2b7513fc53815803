package graft.plans

import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator custom plan: bounded top-k per group.
  *
  * Spark's built-in route for "k best rows per group" is a window
  * `row_number` — WindowExec SORTS every group's entire partition
  * (O(n log n) time, full sort buffer, possible spill) to keep k rows.
  * This operator keeps a bounded k-row selection per group instead:
  * O(n log k) with memory proportional to groups×k, never the input.
  * It is the one reference-surface operator whose best physical plan the
  * DataFrame API genuinely cannot express (SURVEY §2.6 O1; the salted
  * two-stage window in Scale.scala bounds the sort but still sorts) —
  * hence preference order (c) from the design brief: a LogicalPlan +
  * Strategy + SparkPlan, injected via SparkSessionExtensions or
  * `spark.experimental.extraStrategies`.
  *
  * Physical shape mirrors partial aggregation:
  *   partial TopKPerGroupExec (map side, any distribution)
  *     → Exchange on the group key (inserted by EnsureRequirements)
  *       → final TopKPerGroupExec (ClusteredDistribution)
  * A partial stage's per-group survivors are a superset of the group's
  * global top-k restricted to that partition, so the final stage over
  * all partials is exact — same argument as the salted window variant,
  * enforced end-to-end by TopKPerGroupSpec's equality test against the
  * window form.
  */
case class TopKPerGroupPlan(group: Seq[Expression], order: Seq[SortOrder],
    k: Int, child: LogicalPlan,
    maxGroupsInMemory: Int = TopKPerGroup.DefaultMaxGroupsInMemory) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupPlan =
    copy(child = newChild)
}

object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupPlan(group, order, k, child, maxGroups) =>
      val partial = TopKPerGroupExec(group, order, k, isFinal = false,
        planLater(child), maxGroups)
      TopKPerGroupExec(group, order, k, isFinal = true, partial, maxGroups) :: Nil
    case _ => Nil
  }
}

case class TopKPerGroupExec(group: Seq[Expression], order: Seq[SortOrder],
    k: Int, isFinal: Boolean, child: SparkPlan,
    maxGroupsInMemory: Int = TopKPerGroup.DefaultMaxGroupsInMemory)
  extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def nodeName: String =
    if (isFinal) "TopKPerGroupFinal" else "TopKPerGroupPartial"

  override def requiredChildDistribution: Seq[Distribution] =
    if (isFinal) ClusteredDistribution(group) :: Nil
    else UnspecifiedDistribution :: Nil

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)

  /** Memory bound: the map holds ≤ maxGroupsInMemory × k rows. The
    * PARTIAL stage flushes (emits and clears) when the cap is hit —
    * correct because partial survivors are merged at the final stage, a
    * flush merely weakens the pre-filter for rows after it. The FINAL
    * stage never flushes (that would emit > k rows per group); its
    * memory is (distinct groups in this hash partition) × k, which is
    * the operator's honest applicability bound — for group cardinality
    * approaching row count, a sort-based plan (the window form) is the
    * right choice and this operator buys nothing. */
  override protected def doExecute(): RDD[InternalRow] = {
    val groupExprs = group
    val sortOrder = order
    val limit = k
    val childOutput = output
    val flushable = !isFinal
    val maxGroups = maxGroupsInMemory
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(groupExprs, childOutput)
      val ordering = new LazilyGeneratedOrdering(
        sortOrder.map(BindReferences.bindReference(_, childOutput)))
      // per-group bounded selection, kept sorted best-first; k is small,
      // so insertion is a linear scan — O(n·k) compares worst case,
      // O(n log k)-equivalent for the constant ks this serves
      val groups = new java.util.HashMap[UnsafeRow, java.util.ArrayList[InternalRow]]()

      def drain(): Iterator[InternalRow] = {
        val out = groups.values().asScala.toIndexedSeq.flatMap(_.asScala)
        groups.clear()
        out.iterator
      }

      var pending: Iterator[InternalRow] = Iterator.empty
      val grouped = iter.flatMap { row =>
        val key = keyProj(row)
        var buf = groups.get(key)
        if (buf == null) {
          if (flushable && groups.size >= maxGroups) pending = drain()
          buf = new java.util.ArrayList[InternalRow](limit + 1)
          groups.put(key.copy(), buf)
        }
        if (buf.size < limit || ordering.compare(row, buf.get(buf.size - 1)) < 0) {
          var i = buf.size
          while (i > 0 && ordering.compare(row, buf.get(i - 1)) < 0) i -= 1
          buf.add(i, row.copy())
          if (buf.size > limit) buf.remove(limit)
        }
        if (pending.hasNext) { val p = pending; pending = Iterator.empty; p }
        else Iterator.empty
      }
      grouped ++ drain()
    }, preservesPartitioning = true)
  }
}

object TopKPerGroup {

  val DefaultMaxGroupsInMemory: Int = 1 << 16

  /** Idempotently make the strategy available on a running session (the
    * extension-free path; GraftExtensions also injects it). */
  def register(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(TopKPerGroupStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerGroupStrategy

  /** k best rows of `df` per group, "best" = first under `orderCols`
    * (use `.desc`/`.asc` columns; bare columns default ascending).
    * Output rows are unordered across groups and unranked — rank the
    * ≤ groups×k survivors downstream if needed (that window is over the
    * reduced set, not the input). */
  def topKPerGroup(df: DataFrame, groupCols: Seq[Column],
      orderCols: Seq[Column], k: Int): DataFrame = {
    val spark = df.sparkSession
    register(spark)
    // Route the Columns through the analyzer instead of converting them
    // directly: a raw Column→Expression conversion of `.desc` yields a
    // lazy ColumnNodeExpression wrapper (unresolved, unserializable, and
    // its direction invisible to a SortOrder match). Analyzing throwaway
    // Sort/Project plans over the same df gives fully-resolved catalyst
    // SortOrder/Attribute expressions with matching exprIds — the Sort
    // itself is discarded, only its order list is kept.
    val analyzedSort = df.sort(orderCols: _*).queryExecution.analyzed
      .asInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Sort]
    val groupExprs = df.select(groupCols: _*).queryExecution.analyzed
      .asInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Project]
      .projectList.map {
        case a: org.apache.spark.sql.catalyst.expressions.Alias => a.child
        case e => e
      }
    GraftColumnBridge.ofRows(spark,
      TopKPerGroupPlan(groupExprs, analyzedSort.order, k, analyzedSort.child))
  }
}
