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
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable minhash AGGREGATE: builds the signature from one string
  * element per input row (`GROUP BY doc_id` over exploded shingles),
  * the distributed-by-construction formulation of [[MinHashSig]] —
  * partial buffers are element-wise mins, so signatures combine
  * associatively across partitions exactly like a sum (map-side partial
  * aggregation, no row movement beyond the group shuffle). Use this form
  * when shingles arrive as rows (e.g. from an exploded corpus or a
  * streaming flatMap) rather than pre-collected arrays.
  *
  * SURVEY §2.10 names TypedImperativeAggregate as the anticipated custom
  * aggregation surface; this is that surface, with the same signature
  * algebra as MinHashSig (identical output for identical element sets —
  * pinned by MinHashAggSpec).
  */
case class MinHashAgg(
    child: Expression,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _ if numHashes < 1 || numHashes > MinHashSig.MaxHashes =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName numHashes must be in [1, ${MinHashSig.MaxHashes}], got $numHashes")
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "minhash_agg"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) MinHashAgg.mix(buffer, v.asInstanceOf[UTF8String], numHashes)
    buffer
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var j = 0
    while (j < numHashes) {
      if (b2(j) < b1(j)) b1(j) = b2(j)
      j += 1
    }
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

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHashAgg =
    copy(child = newChild)
}

object MinHashAgg {
  /** Same hash family as [[MinHashSig.compute]] — one xxhash64 base hash
    * per element plus k affine rehashes, element-wise min into the
    * buffer. */
  private[functions] def mix(buffer: Array[Long], s: UTF8String, k: Int): Unit = {
    val h = XXH64.hashUTF8String(s, 42L)
    var j = 0
    while (j < k) {
      val hj = h * MinHashSig.rehashMul(j) + MinHashSig.rehashAdd(j)
      if (hj < buffer(j)) buffer(j) = hj
      j += 1
    }
  }

  def minhash_agg(c: Column, numHashes: Int): Column =
    GraftColumnBridge.column(
      MinHashAgg(GraftColumnBridge.expression(c), numHashes).toAggregateExpression())
}
