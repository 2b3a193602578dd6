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
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType,
  DoubleType, LongType}

/** Bloom filter (Bloom 1970) as a native mergeable aggregate — the
  * missing STORABLE half of the q56 runtime-filter idiom
  * ([[graft.operators.BloomSemi]] builds its bit set per query and
  * throws it away; this family persists per-day/per-shard membership
  * sketches of 6 + m/8 bytes to a lake table, folds any subset with
  * [[BloomMerge]], and answers membership probes via [[BloomContains]]
  * without re-reading raw data — the "have we already seen this
  * key" shape an incremental 100 TB dedup pipeline keeps per
  * installment, the d21 persisted-index story at a FIXED size).
  *
  * Unlike q56's murmur3 positions, the bit positions here come from
  * the portable pairwise-independent integer family
  * `((a_i·(key mod p) + b_i) mod p) mod m` (p = 2^31−1, fixed odd
  * multiplier rows — the [[graft.operators.CountMin]] algebra), so a
  * SQL oracle replays the EXACT bit array: set-bit counts and every
  * probe outcome — including false positives — are checked end to
  * end, not assumed. Word OR is associative, commutative and
  * idempotent, so merged sketches are bit-identical at any
  * partitioning or rollup grouping, and re-merging a sketch twice is
  * harmless (q104's register-max property, same consequence: the
  * catalog entry is fully oracle-checked).
  *
  * The classic contract holds by construction: NO false negatives
  * (bits are only ever set), false-positive rate ≈ fill^k where fill
  * is the set-bit fraction — reported by [[BloomFpp]] (the one
  * floating-point step, StrictMath.pow so every JVM agrees;
  * oracle-checked entries round it to 4 decimals, the t10 ln() rule).
  *
  * Input contract: the raw BIGINT key; the aggregate reduces it
  * `mod p` first so any value is overflow-safe (CountMin.bucketOf's
  * note). Nulls are ignored, the groupBy-count convention.
  */
final class BloomSketch(private var m: Int, private var k: Int)
  extends Serializable {

  import BloomSketch.{P, rowParams}

  private var words: Array[Long] =
    if (m > 0) new Array[Long](m / 64) else Array.emptyLongArray

  /** Bit count (a multiple of 64); 0 = empty placeholder buffer (a
    * merge aggregate adopts the first sketch's shape). */
  def bits: Int = m
  def hashes: Int = k

  def add(key: Long): Unit = {
    val kp = ((key % P) + P) % P
    var i = 0
    while (i < k) {
      val (a, b) = rowParams(i)
      val pos = (((a * kp + b) % P) % m).toInt
      words(pos >>> 6) |= 1L << (pos & 63)
      i += 1
    }
  }

  /** Word OR — associative, commutative, idempotent, so two-level
    * rollups are bit-identical to one-level aggregation. */
  def mergeWith(other: BloomSketch): Unit = {
    if (other.m == 0) return
    if (m == 0) {
      m = other.m
      k = other.k
      words = java.util.Arrays.copyOf(other.words, other.words.length)
      return
    }
    if (m != other.m || k != other.k)
      throw new IllegalArgumentException(
        s"cannot merge Bloom sketches of different shape: " +
          s"(m=$m, k=$k) vs (m=${other.m}, k=${other.k})")
    var i = 0
    while (i < words.length) {
      words(i) |= other.words(i)
      i += 1
    }
  }

  /** Membership probe: every hash's bit set → maybe present (false
    * positives possible, rate ≈ fill^k); any bit clear → DEFINITELY
    * absent. Empty placeholder → false. */
  def mightContain(key: Long): Boolean = {
    if (m == 0) return false
    val kp = ((key % P) + P) % P
    var i = 0
    while (i < k) {
      val (a, b) = rowParams(i)
      val pos = (((a * kp + b) % P) % m).toInt
      if ((words(pos >>> 6) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** Number of set bits — exact, so an oracle pins the bit array's
    * population without reading the bytes. */
  def setBits: Long = {
    var n = 0L
    var i = 0
    while (i < words.length) {
      n += java.lang.Long.bitCount(words(i))
      i += 1
    }
    n
  }

  /** Estimated false-positive rate (set fraction)^k. StrictMath.pow —
    * fdlibm, bit-identical across JVMs; a SQL replay's libm pow may
    * differ in the last ulp, so oracle-checked entries round to 4
    * decimals. */
  def fppEstimate: Double =
    if (m == 0) 0.0
    else StrictMath.pow(setBits.toDouble / m.toDouble, k.toDouble)

  /** [version: 1][k: 1][m: 4 bytes][m/64 words, 8 bytes each]. */
  def toBytes: Array[Byte] = {
    require(m > 0, "cannot serialize an empty placeholder Bloom sketch to a result")
    val bos = new ByteArrayOutputStream(6 + 8 * words.length)
    val out = new DataOutputStream(bos)
    out.writeByte(1)
    out.writeByte(k)
    out.writeInt(m)
    var i = 0
    while (i < words.length) { out.writeLong(words(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }
}

object BloomSketch {
  private[functions] val P = 2147483647L

  /** Fixed odd multiplier/offset rows — one per hash, deterministic
    * across engines and runs (the CountMin convention; first four
    * rows differ from CountMin's so a Bloom and a CMS over the same
    * keys don't share collision patterns). */
  private[functions] val rowParams: IndexedSeq[(Long, Long)] = IndexedSeq(
    (786433123L, 290499439L),
    (998244353L, 104729L),
    (715827883L, 514229L),
    (611953003L, 33550336L),
    (824633721L, 86028121L),
    (479001599L, 1442968193L))

  /** The hash rows, exposed for SQL-oracle construction (the
    * CountMin.rowParams convention — one source of truth between the
    * aggregate and any replaying oracle). */
  def sqlRowParams: IndexedSeq[(Long, Long)] = rowParams

  /** Scan-side membership probe as a PURE COLUMN EXPRESSION over a
    * stored sketch's bytes — the codegen'd hot-path complement to
    * [[BloomContains]] (which deserializes per row and belongs on
    * probe tables only). The sketch is parsed ONCE driver-side into a
    * literal word array; per row the probe is k LCG positions +
    * element_at/mask tests, all inside whole-stage codegen with no
    * join and no shuffle — at 100 TB this filters the scan against a
    * fixed-size persisted index without moving the corpus
    * (the [[graft.operators.BloomSemi.mightContain]] shape, but over
    * the aggregate family's portable LCG positions so oracles replay
    * every outcome). */
  def probeColumn(key: org.apache.spark.sql.Column,
      sketchBytes: Array[Byte]): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val sk = fromBytes(sketchBytes)
    val wordsLit = typedlit(sk.words.toSeq)
    val masksLit = typedlit((0 until 64).map(1L << _))
    (0 until sk.hashes).map { i =>
      val (a, b) = rowParams(i)
      val pos = ((lit(a) * pmod(key, lit(P)) + lit(b)) % lit(P)) % lit(sk.bits.toLong)
      element_at(wordsLit, shiftright(pos, 6).cast("int") + 1)
        .bitwiseAND(element_at(masksLit, pmod(pos, lit(64)).cast("int") + 1)) =!= lit(0L)
    }.reduce(_ && _)
  }

  val MinM = 64
  val MaxM = 1 << 24

  /** Stored sketches are arbitrary user-supplied binary, so validate
    * the header against the byte count BEFORE allocating (the
    * TDigest.fromBytes contract). */
  def fromBytes(bytes: Array[Byte]): BloomSketch = {
    if (bytes.length < 6)
      throw new IllegalArgumentException(
        s"not a Bloom sketch: ${bytes.length} bytes, need >= 6 for the header")
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val version = in.readByte()
    if (version != 1)
      throw new IllegalArgumentException(
        s"unsupported Bloom sketch version $version (expected 1)")
    val k = in.readByte().toInt
    if (k < 1 || k > rowParams.size)
      throw new IllegalArgumentException(
        s"corrupt Bloom sketch: k $k outside [1, ${rowParams.size}]")
    val m = in.readInt()
    if (m < MinM || m > MaxM || m % 64 != 0)
      throw new IllegalArgumentException(
        s"corrupt Bloom sketch: m $m outside [$MinM, $MaxM] or not a multiple of 64")
    if (bytes.length != 6 + 8L * (m / 64))
      throw new IllegalArgumentException(
        s"corrupt Bloom sketch: ${bytes.length} bytes for m $m " +
          s"(expected ${6 + 8L * (m / 64)})")
    val sk = new BloomSketch(m, k)
    var i = 0
    while (i < m / 64) { sk.words(i) = in.readLong(); i += 1 }
    sk
  }
}

/** `graft_bloom_sketch(key, m, k)` — one m-bit, k-hash Bloom filter
  * per group as a binary sketch: the storable half. Map-side partials
  * merge by word OR on the reduce side; state is O(m/8) bytes per
  * group wherever the rows land. */
case class BloomSketchAgg(
    child: Expression,
    m: Int,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomSketch] with UnaryLike[Expression] {

  require(m >= BloomSketch.MinM && m <= BloomSketch.MaxM && m % 64 == 0,
    s"m must be a multiple of 64 within [${BloomSketch.MinM}, ${BloomSketch.MaxM}], got $m")
  require(k >= 1 && k <= BloomSketch.rowParams.size,
    s"k must be within [1, ${BloomSketch.rowParams.size}], got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a bigint key, got ${child.dataType.simpleString}")

  override def prettyName: String = "graft_bloom_sketch"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): BloomSketch = new BloomSketch(m, k)

  override def update(buffer: BloomSketch, input: InternalRow): BloomSketch = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: BloomSketch, other: BloomSketch): BloomSketch = {
    buffer.mergeWith(other)
    buffer
  }

  override def eval(buffer: BloomSketch): Any = buffer.toBytes

  override def serialize(buffer: BloomSketch): Array[Byte] = buffer.toBytes
  override def deserialize(bytes: Array[Byte]): BloomSketch =
    BloomSketch.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(o: Int): BloomSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): BloomSketchAgg =
    copy(child = newChild)
}

object BloomSketchAgg {
  def apply(c: Column, m: Int, k: Int): Column =
    Bridge.column(BloomSketchAgg(Bridge.expression(c), m, k)
      .toAggregateExpression())
}

/** `graft_bloom_merge(sketch)` — fold stored binary sketches into ONE
  * merged sketch by word OR: the UNION half. Works as a running window
  * aggregate too. Mixed-shape inputs fail descriptively. */
case class BloomMerge(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends SketchMergeAgg[BloomSketch] {

  override def prettyName: String = "graft_bloom_merge"
  override protected def emptyBuffer: BloomSketch = new BloomSketch(0, 0)
  override protected def isEmptyBuffer(s: BloomSketch): Boolean = s.bits == 0
  override protected def fromSketchBytes(b: Array[Byte]): BloomSketch =
    BloomSketch.fromBytes(b)
  override protected def toSketchBytes(s: BloomSketch): Array[Byte] = s.toBytes
  override protected def mergeInto(buf: BloomSketch, other: BloomSketch): Unit =
    buf.mergeWith(other)

  override def withNewMutableAggBufferOffset(o: Int): BloomMerge =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomMerge =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): BloomMerge =
    copy(child = newChild)
}

object BloomMerge {
  def apply(c: Column): Column =
    Bridge.column(BloomMerge(Bridge.expression(c)).toAggregateExpression())
}

/** `graft_bloom_contains(sketch, key)` — membership probe against a
  * stored binary sketch: false → DEFINITELY absent (no false
  * negatives), true → present or a false positive at ≈ fill^k.
  * Deserializes per evaluation, so it belongs on POST-AGGREGATE probe
  * tables (candidate keys × one sketch row), never a per-event hot
  * path — for scan-side pre-filtering at event cardinality use
  * [[graft.operators.BloomSemi.mightContain]]'s codegen'd column form
  * instead (the TDigestCdf contract; CodegenFallback is fine at probe
  * cardinality). */
case class BloomContains(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (binary sketch, bigint key), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def prettyName: String = "graft_bloom_contains"
  override def dataType: DataType = BooleanType

  override def nullSafeEval(sketch: Any, key: Any): Any =
    BloomSketch.fromBytes(sketch.asInstanceOf[Array[Byte]])
      .mightContain(key.asInstanceOf[Long])

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomContains =
    copy(left = newLeft, right = newRight)
}

object BloomContains {
  def apply(sketch: Column, key: Column): Column =
    Bridge.column(BloomContains(Bridge.expression(sketch), Bridge.expression(key)))
}

/** `graft_bloom_bits(sketch)` — exact set-bit count of a stored
  * sketch: pins the bit-array population for oracles and sizes the
  * fill for capacity planning (a sketch past ~50% fill needs a wider
  * m next installment). */
case class BloomBits(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a binary sketch, got ${child.dataType.simpleString}")

  override def prettyName: String = "graft_bloom_bits"
  override def dataType: DataType = LongType

  override def nullSafeEval(sketch: Any): Any =
    BloomSketch.fromBytes(sketch.asInstanceOf[Array[Byte]]).setBits

  override protected def withNewChildInternal(newChild: Expression): BloomBits =
    copy(child = newChild)
}

object BloomBits {
  def apply(c: Column): Column =
    Bridge.column(BloomBits(Bridge.expression(c)))
}

/** `graft_bloom_fpp(sketch)` — estimated false-positive rate
  * (set fraction)^k of a stored sketch. */
case class BloomFpp(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a binary sketch, got ${child.dataType.simpleString}")

  override def prettyName: String = "graft_bloom_fpp"
  override def dataType: DataType = DoubleType

  override def nullSafeEval(sketch: Any): Any =
    BloomSketch.fromBytes(sketch.asInstanceOf[Array[Byte]]).fppEstimate

  override protected def withNewChildInternal(newChild: Expression): BloomFpp =
    copy(child = newChild)
}

object BloomFpp {
  def apply(c: Column): Column =
    Bridge.column(BloomFpp(Bridge.expression(c)))
}
