package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.util.sketch.BloomFilter

/** Spark's own `util.sketch.BloomFilter` as a GROUPED aggregate — the
  * write-path scale fix for partitioned tables: the per-leaf
  * `df.stat.bloomFilter` loop schedules O(leaves × bloomCols)
  * driver-sequential Spark jobs per partitioned batch (the r16
  * verdict's write-side scale-killer), while this aggregate builds
  * EVERY leaf's filter for every column in ONE grouped pass over the
  * staged files (group by leaf directory, one agg column per bloom
  * column). The element inserts are the sketch's own `putLong` /
  * `putString`, so the produced bytes probe EXACTLY like the
  * per-leaf path's (`mightContainLong` / `mightContainString` in
  * [[graft.sources.txlog]]'s StatsPrune — same sketch class, same
  * hash convention, no false negatives by construction).
  *
  * Sizing is a constructor constant shared by every group in the
  * batch (the caller sizes for the LARGEST leaf): a filter oversized
  * for a small leaf only lowers its false-positive rate — soundness
  * never depends on sizing. Partial buffers merge with the sketch's
  * own `mergeInPlace` (word OR — associative, commutative), so the
  * result is partition-layout-independent. Long (integral columns
  * pre-cast by the caller, the write path's convention) and string
  * children only; nulls are ignored, the aggregate convention.
  */
final class SegmentBloomBuf(var bf: BloomFilter) extends Serializable

case class SegmentBloomAgg(
    child: Expression,
    expectedItems: Long,
    numBits: Long,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SegmentBloomBuf]
  with UnaryLike[Expression] {

  require(expectedItems >= 1, s"expectedItems must be >= 1, got $expectedItems")
  require(numBits >= 1, s"numBits must be >= 1, got $numBits")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType | StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a bigint or string key (cast integral " +
          s"columns to bigint), got ${other.simpleString}")
    }

  override def prettyName: String = "graft_segment_bloom"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): SegmentBloomBuf =
    new SegmentBloomBuf(BloomFilter.create(expectedItems, numBits))

  override def update(buffer: SegmentBloomBuf,
      input: InternalRow): SegmentBloomBuf = {
    val v = child.eval(input)
    if (v != null) v match {
      case l: java.lang.Long => buffer.bf.putLong(l)
      case s => buffer.bf.putString(s.toString)
    }
    buffer
  }

  override def merge(buffer: SegmentBloomBuf,
      other: SegmentBloomBuf): SegmentBloomBuf = {
    buffer.bf.mergeInPlace(other.bf)
    buffer
  }

  override def eval(buffer: SegmentBloomBuf): Any = serialize(buffer)

  override def serialize(buffer: SegmentBloomBuf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    buffer.bf.writeTo(bos)
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): SegmentBloomBuf =
    new SegmentBloomBuf(BloomFilter.readFrom(new ByteArrayInputStream(bytes)))

  override def withNewMutableAggBufferOffset(o: Int): SegmentBloomAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SegmentBloomAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(
      newChild: Expression): SegmentBloomAgg = copy(child = newChild)
}

object SegmentBloomAgg {
  def apply(c: Column, expectedItems: Long, numBits: Long): Column =
    Bridge.column(SegmentBloomAgg(Bridge.expression(c), expectedItems,
      numBits).toAggregateExpression())
}
