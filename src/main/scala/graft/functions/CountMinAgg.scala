package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.{element_at, least, lit, pmod, xxhash64}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable count-min sketch AGGREGATE (Cormode & Muthukrishnan 2005):
  * depth×width counter matrix, one increment per row per hash row —
  * partial buffers combine by element-wise ADDITION, so the sketch
  * aggregates map-side like a sum and never moves rows. Completes the
  * engine's mergeable-sketch family (HLL distinct, t-digest percentile,
  * minhash signature) with frequency estimation: point estimates are
  * biased high, never low, with overestimate ≤ e/width · N at
  * probability 1 − e^−depth.
  *
  * The hash family is the chained form of Spark's own `xxhash64`:
  * row j's index comes from `xxhash64(j, token)` — seed 42, hash the
  * int, then the string — which the JVM loop reproduces as
  * `hashUTF8String(token, hashInt(j, 42))`. No multiplication anywhere,
  * so the QUERY-side estimate — [[CountMinAgg.count_min_estimate]], a
  * pure Column expression — indexes the sketch identically under ANSI
  * mode (affine rehashes à la [[MinHashSig]] would overflow-throw in
  * ANSI SQL even though the JVM wraps).
  */
case class CountMinAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _ if depth < 1 || depth > MinHashSig.MaxHashes =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName depth must be in [1, ${MinHashSig.MaxHashes}], got $depth")
    case _ if width < 2 =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName width must be >= 2, got $width")
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "count_min_agg"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      var j = 0
      while (j < depth) {
        val hj = XXH64.hashUTF8String(s, XXH64.hashInt(j, 42L))
        buffer(j * width + java.lang.Math.floorMod(hj, width.toLong).toInt) += 1
        j += 1
      }
    }
    buffer
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buffer.length * 8)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CountMinAgg =
    copy(child = newChild)
}

object CountMinAgg {

  def count_min_agg(c: Column, depth: Int, width: Int): Column =
    GraftColumnBridge.column(
      CountMinAgg(GraftColumnBridge.expression(c), depth, width).toAggregateExpression())

  /** Point estimate for `token` against a sketch column: min over the
    * depth rows of the indexed counters. Pure Column arithmetic with the
    * same hash family as the aggregate — stays in codegen. */
  def count_min_estimate(sketch: Column, token: Column,
      depth: Int, width: Int): Column =
    (0 until depth).map { j =>
      element_at(sketch,
        (pmod(xxhash64(lit(j), token), lit(width.toLong))
          + lit(j.toLong * width) + lit(1L)).cast("int"))
    }.reduce(least(_, _))
}
