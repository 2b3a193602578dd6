package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream,
  DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Count-Min sketch (Cormode & Muthukrishnan 2005) as a native
  * mergeable aggregate — [[graft.operators.CountMin]]'s portable
  * integer hash rows (`((a·(key mod p) + b) mod p) mod w`,
  * p = 2^31−1, the same fixed d=4 multiplier set) re-shaped from a
  * composed DataFrame pipeline into a `TypedImperativeAggregate` with
  * a STORABLE binary counter matrix: per-day/per-shard sketches of
  * 5 + 8·d·w bytes persist to a lake table, any subset rolls up with
  * [[CmsMerge]] (elementwise sum — associative and commutative, so
  * results are bit-identical at any partitioning or rollup grouping),
  * and stored sketches answer point-frequency queries via
  * [[CmsQuery]] (min over the key's d counters) without re-reading
  * raw data.
  *
  * Everything is exact 64-bit integer arithmetic — counters, hashes,
  * the min — so the catalog entry (q105) is fully DuckDB-oracle-
  * checked: the oracle replays the counter matrix row for row (the
  * q58 precedent) and the classic CMS guarantee (estimate ≥ exact,
  * overcount bounded by bucket collisions) is checked end-to-end,
  * not assumed.
  *
  * Input contract: the raw BIGINT key. The aggregate applies the full
  * hash-row algebra internally (pmod keeps negative keys safe — see
  * CountMin.bucketOf's overflow note); a SQL oracle for non-negative
  * keys mirrors it with plain `%`.
  */
final class CmsSketch(private var w: Int) extends Serializable {

  import CmsSketch.{P, rowParams}

  // flat d×w counter matrix; w == 0 is the merge-aggregate
  // placeholder buffer (adopts the first sketch's width)
  private var counters: Array[Long] =
    if (w > 0) new Array[Long](rowParams.size * w) else Array.emptyLongArray

  def width: Int = w

  def add(key: Long, inc: Long): Unit = {
    val kp = ((key % P) + P) % P // pmod: negative keys stay in range
    var i = 0
    while (i < rowParams.size) {
      val (a, b) = rowParams(i)
      val bucket = (((a * kp + b) % P) % w).toInt
      counters(i * w + bucket) += inc
      i += 1
    }
  }

  /** Elementwise counter sum — associative and commutative, so
    * two-level rollups are bit-identical to one-level aggregation. */
  def mergeWith(other: CmsSketch): Unit = {
    if (other.w == 0) return
    if (w == 0) {
      w = other.w
      counters = java.util.Arrays.copyOf(other.counters, other.counters.length)
      return
    }
    if (w != other.w)
      throw new IllegalArgumentException(
        s"cannot merge CMS sketches of different width: $w vs ${other.w}")
    var i = 0
    while (i < counters.length) {
      counters(i) += other.counters(i)
      i += 1
    }
  }

  /** Equi-join-size estimate between the two sketched multisets
    * (AGMS/CMS inner product, Cormode & Muthukrishnan 2005 §4.2):
    * per hash row, the dot product of the two counter rows estimates
    * Σ_k fA(k)·fB(k) — the exact number of row pairs an equi-join on
    * the sketched key produces — and the min over the d rows is the
    * tightest. Never UNDER the true join size (counters are
    * non-negative, every true pair lands in some shared bucket);
    * over only by cross-key bucket collisions, expected ≤ nA·nB/w
    * per row. Exact 64-bit integer arithmetic throughout. */
  def innerProduct(other: CmsSketch): Long = {
    if (w == 0 || other.w == 0) return 0L
    if (w != other.w)
      throw new IllegalArgumentException(
        s"cannot inner-product CMS sketches of different width: $w vs ${other.w}")
    var best = Long.MaxValue
    var i = 0
    while (i < rowParams.size) {
      var dot = 0L
      var j = i * w
      val end = j + w
      // exact-checked arithmetic: at production counter magnitudes the
      // dot product approaches nA·nB/w, which clears 2^63 around 10^12
      // rows per side at w=4096 — fail loudly (the oracle engine's
      // BIGINT overflow does too) instead of wrapping to a silently
      // wrong estimate
      try {
        while (j < end) {
          dot = Math.addExact(dot,
            Math.multiplyExact(counters(j), other.counters(j)))
          j += 1
        }
      } catch {
        case _: ArithmeticException =>
          throw new ArithmeticException(
            "CMS inner product overflows 64-bit integers at these counter " +
              "magnitudes — increase the sketch width or shard the inputs " +
              "before sketching")
      }
      if (dot < best) best = dot
      i += 1
    }
    best
  }

  /** Point-frequency estimate: min over the key's d counters — never
    * under the true count, over only by bucket collisions. */
  def query(key: Long): Long = {
    if (w == 0) return 0L
    val kp = ((key % P) + P) % P
    var best = Long.MaxValue
    var i = 0
    while (i < rowParams.size) {
      val (a, b) = rowParams(i)
      val bucket = (((a * kp + b) % P) % w).toInt
      val c = counters(i * w + bucket)
      if (c < best) best = c
      i += 1
    }
    best
  }

  /** [version: 1 byte][w: 4 bytes][d·w counters, 8 bytes each]. */
  def toBytes: Array[Byte] = {
    require(w > 0, "cannot serialize an empty placeholder CMS sketch to a result")
    val bos = new ByteArrayOutputStream(5 + 8 * counters.length)
    val out = new DataOutputStream(bos)
    out.writeByte(1)
    out.writeInt(w)
    var i = 0
    while (i < counters.length) { out.writeLong(counters(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }
}

object CmsSketch {
  private[functions] val P = 2147483647L
  /** One source of truth with the operator pipeline (q58): the same
    * fixed d=4 multiplier/offset rows. */
  private[functions] val rowParams: IndexedSeq[(Long, Long)] =
    graft.operators.CountMin.rowParams.toIndexedSeq

  val MinW = 16
  val MaxW = 1 << 20

  /** Stored sketches are arbitrary user-supplied binary, so validate
    * the header against the byte count BEFORE allocating (the
    * TDigest.fromBytes contract). */
  def fromBytes(bytes: Array[Byte]): CmsSketch = {
    if (bytes.length < 5)
      throw new IllegalArgumentException(
        s"not a CMS sketch: ${bytes.length} bytes, need >= 5 for the header")
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val version = in.readByte()
    if (version != 1)
      throw new IllegalArgumentException(
        s"unsupported CMS sketch version $version (expected 1)")
    val w = in.readInt()
    if (w < MinW || w > MaxW)
      throw new IllegalArgumentException(
        s"corrupt CMS sketch: width $w outside [$MinW, $MaxW]")
    val n = rowParams.size * w
    if (bytes.length != 5 + 8L * n)
      throw new IllegalArgumentException(
        s"corrupt CMS sketch: ${bytes.length} bytes for width $w " +
          s"(expected ${5 + 8L * n})")
    val sk = new CmsSketch(w)
    var i = 0
    while (i < n) { sk.counters(i) = in.readLong(); i += 1 }
    sk
  }
}

/** `graft_cms_sketch(key, w)` — one d×w Count-Min counter matrix per
  * group as a binary sketch: the storable half. Map-side partials
  * merge by counter sum on the reduce side; state is O(d·w) per group
  * wherever the rows land. */
case class CmsSketchAgg(
    child: Expression,
    w: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CmsSketch] with UnaryLike[Expression] {

  require(w >= CmsSketch.MinW && w <= CmsSketch.MaxW,
    s"width must be within [${CmsSketch.MinW}, ${CmsSketch.MaxW}], got $w")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a bigint key, got ${child.dataType.simpleString}")

  override def prettyName: String = "graft_cms_sketch"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): CmsSketch = new CmsSketch(w)

  override def update(buffer: CmsSketch, input: InternalRow): CmsSketch = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long], 1L)
    buffer
  }

  override def merge(buffer: CmsSketch, other: CmsSketch): CmsSketch = {
    buffer.mergeWith(other)
    buffer
  }

  override def eval(buffer: CmsSketch): Any = buffer.toBytes

  override def serialize(buffer: CmsSketch): Array[Byte] = buffer.toBytes
  override def deserialize(bytes: Array[Byte]): CmsSketch =
    CmsSketch.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(o: Int): CmsSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CmsSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): CmsSketchAgg =
    copy(child = newChild)
}

object CmsSketchAgg {
  def apply(c: Column, w: Int): Column =
    Bridge.column(CmsSketchAgg(Bridge.expression(c), w).toAggregateExpression())
}

/** `graft_cms_merge(sketch)` — fold stored binary sketches into ONE
  * merged sketch by elementwise counter sum: the UNION half. Works as
  * a running window aggregate too. Mixed-width inputs fail
  * descriptively. */
case class CmsMerge(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends SketchMergeAgg[CmsSketch] {

  override def prettyName: String = "graft_cms_merge"
  override protected def emptyBuffer: CmsSketch = new CmsSketch(0)
  override protected def isEmptyBuffer(s: CmsSketch): Boolean = s.width == 0
  override protected def fromSketchBytes(b: Array[Byte]): CmsSketch =
    CmsSketch.fromBytes(b)
  override protected def toSketchBytes(s: CmsSketch): Array[Byte] = s.toBytes
  override protected def mergeInto(buf: CmsSketch, other: CmsSketch): Unit =
    buf.mergeWith(other)

  override def withNewMutableAggBufferOffset(o: Int): CmsMerge =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CmsMerge =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): CmsMerge =
    copy(child = newChild)
}

object CmsMerge {
  def apply(c: Column): Column =
    Bridge.column(CmsMerge(Bridge.expression(c)).toAggregateExpression())
}

/** `graft_cms_query(sketch, key)` — the key's frequency estimate from
  * a stored binary sketch (min over its d counters; exact BIGINT,
  * never under the true count). Deserializes per evaluation, so it
  * belongs on POST-AGGREGATE probe tables (candidate keys × one
  * sketch row), never a per-event hot path — the TDigestCdf
  * contract; CodegenFallback is fine at that cardinality. */
case class CmsQuery(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (binary sketch, bigint key), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def prettyName: String = "graft_cms_query"
  override def dataType: DataType = LongType

  override def nullSafeEval(sketch: Any, key: Any): Any =
    CmsSketch.fromBytes(sketch.asInstanceOf[Array[Byte]])
      .query(key.asInstanceOf[Long])

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsQuery =
    copy(left = newLeft, right = newRight)
}

object CmsQuery {
  def apply(sketch: Column, key: Column): Column =
    Bridge.column(CmsQuery(Bridge.expression(sketch), Bridge.expression(key)))
}

/** `graft_cms_inner(sketch_a, sketch_b)` — equi-join-size estimate
  * between the two sketched multisets from their stored binary
  * sketches alone (min over the d rows of the counter-row dot
  * products — see [[CmsSketch.innerProduct]]). Exact BIGINT, never
  * under the true join size. Deserializes per evaluation, so it
  * belongs on POST-AGGREGATE pair tables (sketch × sketch rows),
  * never a per-event hot path — the CmsQuery contract. */
case class CmsInnerProduct(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two binary sketches, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def prettyName: String = "graft_cms_inner"
  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    CmsSketch.fromBytes(a.asInstanceOf[Array[Byte]])
      .innerProduct(CmsSketch.fromBytes(b.asInstanceOf[Array[Byte]]))

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsInnerProduct =
    copy(left = newLeft, right = newRight)
}

object CmsInnerProduct {
  def apply(a: Column, b: Column): Column =
    Bridge.column(CmsInnerProduct(Bridge.expression(a), Bridge.expression(b)))
}
