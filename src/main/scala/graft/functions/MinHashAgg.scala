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
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, LongType}

/** MinHash (Broder 1997) at GROUP granularity as a native mergeable
  * aggregate — the signature algebra of [[MinHashSigExpr]] (per-doc
  * signatures over shingle arrays, d02's kernel) lifted to arbitrary
  * grouped key SETS: one k-component signature per group
  * (`sig[i] = min over keys of (keyᵢ·aᵢ + bᵢ) mod p`, the SAME
  * [[HashFunctions.minhashPerms]] permutation family — one source of
  * truth), with a STORABLE binary form, elementwise-min merge, and a
  * sketch-to-sketch Jaccard estimator ([[MinHashJaccard]]: component
  * agreement fraction — P[min agree] = J, the classic unbiased
  * estimator).
  *
  * Componentwise min is associative, commutative and idempotent, so —
  * like HLL register max and Bloom word OR — signatures are
  * bit-identical at any partitioning or rollup grouping and the
  * catalog entry (q107) is fully DuckDB-oracle-checked: the oracle
  * replays every permutation minimum and the agreement count exactly
  * (agreement/k is a dyadic rational — exact in both engines).
  *
  * What this buys over [[graft.operators.KmvOverlap]] (q103): KMV
  * estimates set SIZES (union/intersection cardinalities); MinHash
  * signatures estimate the Jaccard RATIO directly from fixed k
  * components, and — the scale property — k-component signatures band
  * into LSH buckets (r components per band → equi-join on band
  * hashes), so group-similarity search over millions of groups is
  * sub-quadratic. The q107 matrix over a handful of groups is the
  * declared dev shape; at real group counts the banding join replaces
  * the all-pairs comparison (d02's document-level precedent).
  *
  * Input contract: the raw BIGINT key; reduced mod p first (pmod —
  * any value is overflow-safe). Nulls are ignored. An empty group's
  * components stay at the Long.MaxValue sentinel ([[MinHashSigExpr]]'s
  * empty-input convention); sentinel components only ever equal other
  * sentinels, so J(∅, ∅) = 1 and J(∅, S) = 0 fall out of the
  * agreement rule.
  */
final class MinHashGroupSig(private var k: Int) extends Serializable {

  import MinHashGroupSig.{P, Sentinel, permsFor}

  private var sig: Array[Long] =
    if (k > 0) Array.fill(k)(Sentinel) else Array.emptyLongArray
  @transient private var perms: Array[(Long, Long)] =
    if (k > 0) permsFor(k) else null

  /** Component count; 0 = empty placeholder buffer (a merge aggregate
    * adopts the first sketch's k). */
  def components: Int = k

  private def permsArr: Array[(Long, Long)] = {
    if (perms == null && k > 0) perms = permsFor(k)
    perms
  }

  def add(key: Long): Unit = {
    val hp = ((key % P) + P) % P
    val ps = permsArr
    var i = 0
    while (i < k) {
      val v = (hp * ps(i)._1 + ps(i)._2) % P
      if (v < sig(i)) sig(i) = v
      i += 1
    }
  }

  /** Elementwise min — associative, commutative, idempotent, so
    * two-level rollups are bit-identical to one-level aggregation. */
  def mergeWith(other: MinHashGroupSig): Unit = {
    if (other.k == 0) return
    if (k == 0) {
      k = other.k
      sig = java.util.Arrays.copyOf(other.sig, other.sig.length)
      perms = null
      return
    }
    if (k != other.k)
      throw new IllegalArgumentException(
        s"cannot merge MinHash signatures of different k: $k vs ${other.k}")
    var i = 0
    while (i < k) {
      if (other.sig(i) < sig(i)) sig(i) = other.sig(i)
      i += 1
    }
  }

  /** Jaccard estimate: agreement fraction over the k components — a
    * dyadic rational (count/k), exact in any engine. */
  def jaccardEst(other: MinHashGroupSig): Double = {
    if (k != other.k)
      throw new IllegalArgumentException(
        s"cannot compare MinHash signatures of different k: $k vs ${other.k}")
    var agree = 0
    var i = 0
    while (i < k) {
      if (sig(i) == other.sig(i)) agree += 1
      i += 1
    }
    agree.toDouble / k.toDouble
  }

  /** [version: 1][k: 4 bytes][k minima, 8 bytes each]. */
  def toBytes: Array[Byte] = {
    require(k > 0, "cannot serialize an empty placeholder MinHash signature to a result")
    val bos = new ByteArrayOutputStream(5 + 8 * k)
    val out = new DataOutputStream(bos)
    out.writeByte(1)
    out.writeInt(k)
    var i = 0
    while (i < k) { out.writeLong(sig(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }
}

object MinHashGroupSig {
  private[functions] val P = 2147483647L
  private val Sentinel = Long.MaxValue

  val MinK = 4
  val MaxK = 1024

  // perms are deterministic per k; cache the realized arrays
  private val cache = new java.util.concurrent.ConcurrentHashMap[Int, Array[(Long, Long)]]()
  private[functions] def permsFor(k: Int): Array[(Long, Long)] =
    cache.computeIfAbsent(k, kk => HashFunctions.minhashPerms(kk).toArray)

  /** The permutation rows for k components, exposed for SQL-oracle
    * construction (literal (i, a, b) VALUES rows — the
    * CountMin.rowParams convention). */
  def sqlPerms(k: Int): IndexedSeq[(Long, Long)] = permsFor(k).toIndexedSeq

  /** Stored sketches are arbitrary user-supplied binary, so validate
    * the header against the byte count BEFORE allocating (the
    * TDigest.fromBytes contract). */
  def fromBytes(bytes: Array[Byte]): MinHashGroupSig = {
    if (bytes.length < 5)
      throw new IllegalArgumentException(
        s"not a MinHash signature: ${bytes.length} bytes, need >= 5 for the header")
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val version = in.readByte()
    if (version != 1)
      throw new IllegalArgumentException(
        s"unsupported MinHash signature version $version (expected 1)")
    val k = in.readInt()
    if (k < MinK || k > MaxK)
      throw new IllegalArgumentException(
        s"corrupt MinHash signature: k $k outside [$MinK, $MaxK]")
    if (bytes.length != 5 + 8L * k)
      throw new IllegalArgumentException(
        s"corrupt MinHash signature: ${bytes.length} bytes for k $k " +
          s"(expected ${5 + 8L * k})")
    val sk = new MinHashGroupSig(k)
    var i = 0
    while (i < k) {
      val v = in.readLong()
      if ((v < 0L || v >= P) && v != Sentinel)
        throw new IllegalArgumentException(
          s"corrupt MinHash signature: component $i value $v outside [0, $P)")
      sk.sig(i) = v
      i += 1
    }
    sk
  }
}

/** `graft_minhash_group(key, k)` — one k-component MinHash signature
  * per group as a binary sketch: the storable half. Map-side partials
  * merge by elementwise min on the reduce side; state is O(k) per
  * group wherever the rows land. */
case class MinHashSigAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MinHashGroupSig] with UnaryLike[Expression] {

  require(k >= MinHashGroupSig.MinK && k <= MinHashGroupSig.MaxK,
    s"k must be within [${MinHashGroupSig.MinK}, ${MinHashGroupSig.MaxK}], got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a bigint key, got ${child.dataType.simpleString}")

  override def prettyName: String = "graft_minhash_group"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): MinHashGroupSig = new MinHashGroupSig(k)

  override def update(buffer: MinHashGroupSig, input: InternalRow): MinHashGroupSig = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: MinHashGroupSig, other: MinHashGroupSig): MinHashGroupSig = {
    buffer.mergeWith(other)
    buffer
  }

  override def eval(buffer: MinHashGroupSig): Any = buffer.toBytes

  override def serialize(buffer: MinHashGroupSig): Array[Byte] = buffer.toBytes
  override def deserialize(bytes: Array[Byte]): MinHashGroupSig =
    MinHashGroupSig.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(o: Int): MinHashSigAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinHashSigAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): MinHashSigAgg =
    copy(child = newChild)
}

object MinHashSigAgg {
  def apply(c: Column, k: Int): Column =
    Bridge.column(MinHashSigAgg(Bridge.expression(c), k).toAggregateExpression())
}

/** `graft_minhash_group_merge(sig)` — fold stored binary signatures
  * into ONE merged signature by elementwise min: the UNION half (the
  * signature of the union of the underlying sets — exactly, not
  * approximately). Works as a running window aggregate too. Mixed-k
  * inputs fail descriptively. */
case class MinHashSigMerge(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends SketchMergeAgg[MinHashGroupSig] {

  override def prettyName: String = "graft_minhash_group_merge"
  override protected def emptyBuffer: MinHashGroupSig = new MinHashGroupSig(0)
  override protected def isEmptyBuffer(s: MinHashGroupSig): Boolean =
    s.components == 0
  override protected def fromSketchBytes(b: Array[Byte]): MinHashGroupSig =
    MinHashGroupSig.fromBytes(b)
  override protected def toSketchBytes(s: MinHashGroupSig): Array[Byte] =
    s.toBytes
  override protected def mergeInto(buf: MinHashGroupSig,
      other: MinHashGroupSig): Unit =
    buf.mergeWith(other)

  override def withNewMutableAggBufferOffset(o: Int): MinHashSigMerge =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinHashSigMerge =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): MinHashSigMerge =
    copy(child = newChild)
}

object MinHashSigMerge {
  def apply(c: Column): Column =
    Bridge.column(MinHashSigMerge(Bridge.expression(c)).toAggregateExpression())
}

/** `graft_minhash_jaccard(sig_a, sig_b)` — Jaccard estimate between
  * two stored signatures: component agreement fraction (a dyadic
  * rational — exact in any engine). Deserializes per evaluation, so
  * it belongs on POST-AGGREGATE pair tables (group-pair matrices,
  * LSH-bucketed candidate pairs), never a per-event hot path — the
  * TDigestCdf contract; CodegenFallback is fine at that cardinality. */
case class MinHashJaccard(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (binary signature, binary signature), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def prettyName: String = "graft_minhash_jaccard"
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    MinHashGroupSig.fromBytes(a.asInstanceOf[Array[Byte]])
      .jaccardEst(MinHashGroupSig.fromBytes(b.asInstanceOf[Array[Byte]]))

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinHashJaccard =
    copy(left = newLeft, right = newRight)
}

object MinHashJaccard {
  def apply(a: Column, b: Column): Column =
    Bridge.column(MinHashJaccard(Bridge.expression(a), Bridge.expression(b)))
}
