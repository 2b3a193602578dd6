package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream,
  DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

/** t-digest (Dunning & Ertl, "Computing extremely accurate quantiles
  * using t-digests"): a mergeable quantile sketch whose cluster sizes
  * follow 4·n·q(1−q)/δ — tiny clusters at the tails, coarse in the
  * middle — so extreme quantiles (p99, p999) stay accurate at a
  * fixed ~δ-centroid memory footprint however large the input.
  *
  * The LAST sketch family the engine was missing (HLL, Count-Min,
  * KMV, and GK already exist): the mergeable-quantile shape a 100 TB
  * deployment needs — per-partition digests of bounded size merge
  * associatively on the reduce side, exactly like any map-side
  * combined aggregate, and per-day digests can be unioned later
  * without re-reading the raw data.
  *
  * Like the engine's other *estimate* sketches the result depends on
  * merge order (centroid boundaries shift with partitioning), so the
  * catalog entry is rows-only (the q30/q70 precedent) and the
  * accuracy contract — rank error vs exact quantiles, partition-count
  * invariance within the bound — is spec-asserted instead
  * (TDigestSpec).
  */
final class TDigest(val compression: Double) extends Serializable {
  private var means = new Array[Double](64)
  private var weights = new Array[Double](64)
  private var n = 0
  private var total = 0.0

  private val pending = new Array[Double](512)
  private var nPending = 0

  def totalWeight: Double = { compress(); total }
  /** Post-compress centroid count — the O(compression) state claim,
    * bounded by TDigestSpec. */
  def centroidCount: Int = { compress(); n }

  def add(x: Double): Unit = {
    pending(nPending) = x
    nPending += 1
    if (nPending == pending.length) compress()
  }

  /** Fold `other` into this digest (associative up to the documented
    * merge-order estimate drift). */
  def mergeWith(other: TDigest): Unit = {
    other.compress()
    compress()
    if (other.n == 0) return
    // merge two mean-sorted centroid lists, then re-run the size-bound
    // pass over the combined list
    val m = new Array[Double](n + other.n)
    val w = new Array[Double](n + other.n)
    var i = 0; var j = 0; var k = 0
    while (i < n && j < other.n) {
      if (means(i) <= other.means(j)) {
        m(k) = means(i); w(k) = weights(i); i += 1
      } else {
        m(k) = other.means(j); w(k) = other.weights(j); j += 1
      }
      k += 1
    }
    while (i < n) { m(k) = means(i); w(k) = weights(i); i += 1; k += 1 }
    while (j < other.n) {
      m(k) = other.means(j); w(k) = other.weights(j); j += 1; k += 1
    }
    means = m; weights = w; n = k; total += other.total
    recluster()
  }

  /** Drain the pending raw points into the centroid list. */
  private def compress(): Unit = {
    if (nPending == 0) return
    val p = java.util.Arrays.copyOf(pending, nPending)
    java.util.Arrays.sort(p)
    val m = new Array[Double](n + nPending)
    val w = new Array[Double](n + nPending)
    var i = 0; var j = 0; var k = 0
    while (i < n && j < nPending) {
      if (means(i) <= p(j)) { m(k) = means(i); w(k) = weights(i); i += 1 }
      else { m(k) = p(j); w(k) = 1.0; j += 1 }
      k += 1
    }
    while (i < n) { m(k) = means(i); w(k) = weights(i); i += 1; k += 1 }
    while (j < nPending) { m(k) = p(j); w(k) = 1.0; j += 1; k += 1 }
    means = m; weights = w; n = k
    total += nPending
    nPending = 0
    recluster()
  }

  /** One greedy pass over the mean-sorted centroid list, merging
    * neighbors while the classic t-digest size bound
    * 4·total·q(1−q)/compression holds at the merged cluster's
    * mid-quantile q. The total/(2·compression) floor caps the
    * centroid count at ~2·compression (the pure q(1−q) bound alone
    * admits O(compression·log n) singleton tail clusters) while
    * keeping tail rank error ≤ 1/(4·compression) — the bound
    * TDigestSpec asserts. */
  private def recluster(): Unit = {
    if (n <= 1) return
    val outM = new Array[Double](n)
    val outW = new Array[Double](n)
    var out = 0
    var curM = means(0)
    var curW = weights(0)
    var wSoFar = 0.0
    var i = 1
    while (i < n) {
      val wi = weights(i)
      val q = (wSoFar + (curW + wi) / 2) / total
      val limit = math.max(4.0 * total * q * (1.0 - q) / compression,
        total / (2.0 * compression))
      if (curW + wi <= limit) {
        curM += (means(i) - curM) * wi / (curW + wi)
        curW += wi
      } else {
        outM(out) = curM; outW(out) = curW; out += 1
        wSoFar += curW
        curM = means(i); curW = wi
      }
      i += 1
    }
    outM(out) = curM; outW(out) = curW; out += 1
    means = outM; weights = outW; n = out
  }

  /** Quantile estimate: linear interpolation between centroid centers
    * (each centroid sited at its cumulative-weight midpoint). */
  def quantile(q: Double): Double = {
    compress()
    if (n == 0) return Double.NaN
    if (n == 1) return means(0)
    val target = q * total
    var cum = 0.0
    var prevCenter = 0.0
    var prevMean = means(0)
    var i = 0
    while (i < n) {
      val center = cum + weights(i) / 2
      if (target <= center) {
        if (i == 0) return means(0)
        val span = center - prevCenter
        return if (span <= 0) means(i)
        else prevMean + (means(i) - prevMean) * (target - prevCenter) / span
      }
      cum += weights(i)
      prevCenter = center
      prevMean = means(i)
      i += 1
    }
    means(n - 1)
  }

  /** Rank estimate (inverse of [[quantile]]): the fraction of weight
    * below `x`, interpolating between centroid centers exactly as
    * quantile does — so cdf(quantile(q)) ≈ q by construction. */
  def cdf(x: Double): Double = {
    compress()
    if (n == 0) return Double.NaN
    if (n == 1) return if (x < means(0)) 0.0 else if (x > means(0)) 1.0 else 0.5
    if (x <= means(0)) return if (x < means(0)) 0.0 else weights(0) / 2 / total
    if (x >= means(n - 1))
      return if (x > means(n - 1)) 1.0 else (total - weights(n - 1) / 2) / total
    var cum = 0.0
    var i = 0
    while (i < n - 1) {
      val center = cum + weights(i) / 2
      val nextCenter = cum + weights(i) + weights(i + 1) / 2
      if (x >= means(i) && x < means(i + 1)) {
        val span = means(i + 1) - means(i)
        val r =
          if (span <= 0) (center + nextCenter) / 2
          else center + (nextCenter - center) * (x - means(i)) / span
        return r / total
      }
      cum += weights(i)
      i += 1
    }
    1.0
  }

  def toBytes: Array[Byte] = {
    compress()
    val bos = new ByteArrayOutputStream(16 + 16 * n)
    val out = new DataOutputStream(bos)
    out.writeDouble(compression)
    out.writeDouble(total)
    out.writeInt(n)
    var i = 0
    while (i < n) { out.writeDouble(means(i)); out.writeDouble(weights(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }
}

object TDigest {
  /** TDigestMergeQuantiles feeds this arbitrary user-supplied binary
    * (stored sketches from a lake table), so validate the header
    * against the byte count BEFORE allocating: a truncated or corrupt
    * sketch gets a descriptive error, not a mid-job EOFException or a
    * huge centroid-array allocation. */
  def fromBytes(bytes: Array[Byte]): TDigest = {
    if (bytes.length < 20)
      throw new IllegalArgumentException(
        s"not a t-digest sketch: ${bytes.length} bytes, need >= 20 for the header")
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val d = new TDigest(in.readDouble())
    d.total = in.readDouble()
    val n = in.readInt()
    if (n < 0 || bytes.length - 20L != 16L * n)
      throw new IllegalArgumentException(
        s"corrupt t-digest sketch: centroid count $n does not match " +
          s"${bytes.length - 20} payload bytes (expected ${16L * math.max(n, 0)})")
    d.means = new Array[Double](math.max(n, 1))
    d.weights = new Array[Double](math.max(n, 1))
    var i = 0
    while (i < n) { d.means(i) = in.readDouble(); d.weights(i) = in.readDouble(); i += 1 }
    d.n = n
    d
  }
}

/** `tdigest_quantiles(col, probabilities, compression)` — one
  * distributed t-digest per group, evaluated at the requested
  * probabilities (array<double>, same order). Map-side partial
  * digests merge on the reduce side; state is O(compression) per
  * group wherever the group's rows land. */
case class TDigestQuantiles(
    child: Expression,
    probabilities: Seq[Double],
    compression: Double,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigest] with UnaryLike[Expression] {

  require(probabilities.nonEmpty &&
    probabilities.forall(p => p >= 0.0 && p <= 1.0),
    "probabilities must be within [0, 1]")
  require(compression >= 10, "compression must be >= 10")

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects double, got ${child.dataType.simpleString}")

  override def prettyName: String = "graft_tdigest_quantiles"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def createAggregationBuffer(): TDigest = new TDigest(compression)

  override def update(buffer: TDigest, input: InternalRow): TDigest = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Double])
    buffer
  }

  override def merge(buffer: TDigest, other: TDigest): TDigest = {
    buffer.mergeWith(other)
    buffer
  }

  override def eval(buffer: TDigest): Any =
    if (buffer.totalWeight == 0) null
    else new GenericArrayData(probabilities.map(buffer.quantile).toArray)

  override def serialize(buffer: TDigest): Array[Byte] = buffer.toBytes
  override def deserialize(bytes: Array[Byte]): TDigest = TDigest.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(o: Int): TDigestQuantiles =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TDigestQuantiles =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): TDigestQuantiles =
    copy(child = newChild)
}

object TDigestQuantiles {
  def apply(c: Column, probabilities: Seq[Double], compression: Double): Column =
    Bridge.column(TDigestQuantiles(Bridge.expression(c), probabilities,
      compression).toAggregateExpression())
}

/** `tdigest_sketch(col, compression)` — the digest itself as a binary
  * column, the STORABLE half of the mergeable-quantile story: write
  * per-day/per-shard sketches (O(compression) bytes each) to a lake
  * table, and later roll any subset up with [[TDigestMergeQuantiles]]
  * without re-reading the raw data. */
case class TDigestSketch(
    child: Expression,
    compression: Double,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigest] with UnaryLike[Expression] {

  require(compression >= 10, "compression must be >= 10")

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects double, got ${child.dataType.simpleString}")

  override def prettyName: String = "graft_tdigest_sketch"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): TDigest = new TDigest(compression)

  override def update(buffer: TDigest, input: InternalRow): TDigest = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Double])
    buffer
  }

  override def merge(buffer: TDigest, other: TDigest): TDigest = {
    buffer.mergeWith(other)
    buffer
  }

  override def eval(buffer: TDigest): Any = buffer.toBytes

  override def serialize(buffer: TDigest): Array[Byte] = buffer.toBytes
  override def deserialize(bytes: Array[Byte]): TDigest = TDigest.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(o: Int): TDigestSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TDigestSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): TDigestSketch =
    copy(child = newChild)
}

object TDigestSketch {
  def apply(c: Column, compression: Double): Column =
    Bridge.column(TDigestSketch(Bridge.expression(c), compression)
      .toAggregateExpression())
}

/** `tdigest_merge_quantiles(sketchCol, probabilities)` — fold stored
  * binary sketches (from [[TDigestSketch]]) back into one digest and
  * evaluate it: the UNION half of the story. Input sketches carry
  * their own compression; the merged digest adopts the first one's. */
case class TDigestMergeQuantiles(
    child: Expression,
    probabilities: Seq[Double],
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigest] with UnaryLike[Expression] {

  require(probabilities.nonEmpty &&
    probabilities.forall(p => p >= 0.0 && p <= 1.0),
    "probabilities must be within [0, 1]")

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects binary sketches, got ${child.dataType.simpleString}")

  override def prettyName: String = "graft_tdigest_merge_quantiles"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  // compression is unknown until the first sketch arrives; mergeWith
  // folds into whichever digest has data, so the placeholder's own
  // compression never shapes a non-empty result
  override def createAggregationBuffer(): TDigest = new TDigest(100.0)

  override def update(buffer: TDigest, input: InternalRow): TDigest = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val incoming = TDigest.fromBytes(v.asInstanceOf[Array[Byte]])
      // adopt the first sketch (and its compression); fold the rest in
      if (buffer.totalWeight == 0) incoming
      else { buffer.mergeWith(incoming); buffer }
    }
  }

  override def merge(buffer: TDigest, other: TDigest): TDigest =
    if (buffer.totalWeight == 0 && other.totalWeight > 0) {
      other.mergeWith(buffer); other
    } else { buffer.mergeWith(other); buffer }

  override def eval(buffer: TDigest): Any =
    if (buffer.totalWeight == 0) null
    else new GenericArrayData(probabilities.map(buffer.quantile).toArray)

  override def serialize(buffer: TDigest): Array[Byte] = buffer.toBytes
  override def deserialize(bytes: Array[Byte]): TDigest = TDigest.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(o: Int): TDigestMergeQuantiles =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TDigestMergeQuantiles =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): TDigestMergeQuantiles =
    copy(child = newChild)
}

object TDigestMergeQuantiles {
  def apply(c: Column, probabilities: Seq[Double]): Column =
    Bridge.column(TDigestMergeQuantiles(Bridge.expression(c), probabilities)
      .toAggregateExpression())
}

/** `tdigest_merge(sketchCol)` — fold stored binary sketches into ONE
  * merged binary sketch (not its quantiles): the sketch-algebra
  * primitive behind trailing-baseline drift detection (e31) and any
  * rollup table that itself stores sketches for further merging.
  * Works as a running window aggregate too — the frame's incremental
  * update folds one O(compression) sketch per step. */
case class TDigestMerge(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigest] with UnaryLike[Expression] {

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects binary sketches, got ${child.dataType.simpleString}")

  override def prettyName: String = "graft_tdigest_merge"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def createAggregationBuffer(): TDigest = new TDigest(100.0)

  override def update(buffer: TDigest, input: InternalRow): TDigest = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val incoming = TDigest.fromBytes(v.asInstanceOf[Array[Byte]])
      // adopt the first sketch (and its compression); fold the rest in
      if (buffer.totalWeight == 0) incoming
      else { buffer.mergeWith(incoming); buffer }
    }
  }

  override def merge(buffer: TDigest, other: TDigest): TDigest =
    if (buffer.totalWeight == 0 && other.totalWeight > 0) {
      other.mergeWith(buffer); other
    } else { buffer.mergeWith(other); buffer }

  override def eval(buffer: TDigest): Any =
    if (buffer.totalWeight == 0) null else buffer.toBytes

  override def serialize(buffer: TDigest): Array[Byte] = buffer.toBytes
  override def deserialize(bytes: Array[Byte]): TDigest = TDigest.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(o: Int): TDigestMerge =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TDigestMerge =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): TDigestMerge =
    copy(child = newChild)
}

object TDigestMerge {
  def apply(c: Column): Column =
    Bridge.column(TDigestMerge(Bridge.expression(c)).toAggregateExpression())
}

/** `tdigest_cdf(sketch, x)` — the rank of `x` within a stored binary
  * sketch: the drift-detection probe (where does this window's median
  * sit in the trailing baseline's distribution?). Deserializes the
  * sketch per evaluation, so it belongs on POST-AGGREGATE tables (one
  * row per group/window), never in a per-event hot path — there,
  * aggregate first. CodegenFallback is fine at that cardinality. */
case class TDigestCdf(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (binary sketch, double), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def prettyName: String = "graft_tdigest_cdf"
  override def dataType: DataType = DoubleType

  override def nullSafeEval(sketch: Any, x: Any): Any =
    TDigest.fromBytes(sketch.asInstanceOf[Array[Byte]])
      .cdf(x.asInstanceOf[Double])

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TDigestCdf =
    copy(left = newLeft, right = newRight)
}

object TDigestCdf {
  def apply(sketch: Column, x: Column): Column =
    Bridge.column(TDigestCdf(Bridge.expression(sketch), Bridge.expression(x)))
}
