package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Shared machinery for the binary-sketch MERGE half of the
  * order-invariant sketch families ([[HllMerge]], [[CmsMerge]],
  * [[BloomMerge]], [[MinHashSigMerge]]): fold stored sketches with the
  * family's associative-commutative combine, adopting the first
  * non-empty sketch's shape (the placeholder buffer starts shapeless).
  *
  * Centralizing this pins the EMPTY-SENTINEL CONTRACT in one place
  * instead of four: a buffer that never saw a sketch serializes as the
  * 1-byte `Array(0)` sentinel (never a valid sketch header — every
  * family's version byte is ≥ 1), deserializes back to the shapeless
  * placeholder, and evals to NULL. The t-digest merge aggregates stay
  * separate by design: their merge ADOPTS the incoming digest's
  * compression by swapping buffers, a convention this trait's
  * fold-into-buffer contract cannot express.
  */
private[functions] trait SketchMergeAgg[S]
  extends TypedImperativeAggregate[S] with UnaryLike[Expression] {

  /** The shapeless placeholder buffer (adopts the first sketch). */
  protected def emptyBuffer: S
  /** True while the buffer has not adopted any sketch's shape. */
  protected def isEmptyBuffer(s: S): Boolean
  /** Parse + validate stored sketch bytes (the fromBytes contract). */
  protected def fromSketchBytes(b: Array[Byte]): S
  protected def toSketchBytes(s: S): Array[Byte]
  /** The family's associative-commutative in-place combine. */
  protected def mergeInto(buf: S, other: S): Unit

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects binary sketches, got ${child.dataType.simpleString}")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def createAggregationBuffer(): S = emptyBuffer

  override def update(buffer: S, input: InternalRow): S = {
    val v = child.eval(input)
    if (v != null) mergeInto(buffer, fromSketchBytes(v.asInstanceOf[Array[Byte]]))
    buffer
  }

  override def merge(buffer: S, other: S): S = {
    mergeInto(buffer, other)
    buffer
  }

  override def eval(buffer: S): Any =
    if (isEmptyBuffer(buffer)) null else toSketchBytes(buffer)

  override def serialize(buffer: S): Array[Byte] =
    if (isEmptyBuffer(buffer)) Array[Byte](0) else toSketchBytes(buffer)
  override def deserialize(bytes: Array[Byte]): S =
    if (bytes.length == 1 && bytes(0) == 0) emptyBuffer
    else fromSketchBytes(bytes)
}
