package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream,
  DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType,
  StructField, StructType}

/** Bounded weighted SAMPLE sketch — the sampling member of the
  * mergeable sketch-aggregate family (membership: Bloom, cardinality:
  * HLL, frequency: CMS, quantiles: t-digest, set size: KMV,
  * similarity: MinHash — and now a representative SAMPLE): the exact
  * top-k keys by per-key MAXIMUM priority, where the caller feeds one
  * integer priority per row (in the catalog: the portable LCG of the
  * row's unique event id).
  *
  * Why max-of-priorities is WEIGHTED sampling: a key with c rows takes
  * the max of c independent uniforms, which is distributed exactly as
  * u^(1/c) — the Efraimidis–Spirakis priority for weight c. So the
  * top-k keys by max priority are a without-replacement sample of the
  * keys weighted by their row counts, and the whole construction stays
  * in exact 64-bit integers (the uniform is monotone in its raw hash,
  * so comparing hashes IS comparing the uniforms — no log, no pow, no
  * doubles anywhere).
  *
  * Why it merges EXACTLY (the coordinated bottom-k argument): per-key
  * priorities combine by max (associative, commutative, idempotent)
  * and any state may be trimmed to its k best at any time — a key
  * trimmed while ranking below the k-th already has k keys above its
  * final priority in that state alone, so it can never re-enter the
  * true global top-k; a surviving key always carries its true max from
  * the state where it attained it. Hence ANY partitioning, rollup
  * grouping, trim schedule, or micro-batch slicing yields the
  * bit-identical final sample — the family's full-oracle-check
  * property (q104/q105/q106 precedent), including under Structured
  * Streaming.
  *
  * State is O(k): at most 2k entries held between trims. Updates scan
  * the candidate array linearly (the duplicate-key max-merge), so per-
  * row cost is O(k) — the sketch is built for SAMPLE-sized k (tens to
  * a few thousand), not top-k analytics over huge k; q58's Count-Min
  * heavy-hitter path covers the latter.
  */
final class SampleSketch(private var k: Int) extends Serializable {

  // parallel candidate arrays (key, priority), at most 2k entries
  private var keys = new Array[Long](math.max(2 * k, 1))
  private var prios = new Array[Long](math.max(2 * k, 1))
  private var n = 0

  def capacity: Int = k
  def size: Int = { trim(); n }

  /** total order: priority DESC, key ASC (ties must break identically
    * on both engines and in every trim). */
  private def beats(p1: Long, k1: Long, p2: Long, k2: Long): Boolean =
    p1 > p2 || (p1 == p2 && k1 < k2)

  def add(key: Long, priority: Long): Unit = {
    var i = 0
    while (i < n) {
      if (keys(i) == key) {
        if (priority > prios(i)) prios(i) = priority
        return
      }
      i += 1
    }
    if (n == keys.length) trim()
    // 2k-capacity invariant: for every constructible k >= 1 the trim
    // above leaves n = k < keys.length (= max(2k, 1)), and the k = 0
    // placeholder never receives adds — so there is always room here.
    keys(n) = key; prios(n) = priority; n += 1
  }

  /** Sort candidates by the total order and keep the k best. */
  private def trim(): Unit = {
    if (n <= k) return
    val idx = (0 until n).sortWith((a, b) =>
      beats(prios(a), keys(a), prios(b), keys(b)))
    val nk = new Array[Long](keys.length)
    val np = new Array[Long](prios.length)
    var i = 0
    while (i < k) { nk(i) = keys(idx(i)); np(i) = prios(idx(i)); i += 1 }
    keys = nk; prios = np; n = k
  }

  def mergeWith(other: SampleSketch): Unit = {
    if (other.k == 0) return
    if (k == 0) {
      k = other.k
      keys = java.util.Arrays.copyOf(other.keys, other.keys.length)
      prios = java.util.Arrays.copyOf(other.prios, other.prios.length)
      n = other.n
      return
    }
    if (k != other.k)
      throw new IllegalArgumentException(
        s"cannot merge sample sketches of different k: $k vs ${other.k}")
    var i = 0
    while (i < other.n) { add(other.keys(i), other.prios(i)); i += 1 }
  }

  /** Entries in output order (priority desc, key asc), trimmed to k. */
  def entries: Array[(Long, Long)] = {
    trim()
    (0 until n).map(i => (keys(i), prios(i))).toArray
      .sortWith((a, b) => beats(a._2, a._1, b._2, b._1))
  }

  /** [version: 1 byte][k: 4][n: 4][n × (key: 8, priority: 8)],
    * entries in output order. */
  def toBytes: Array[Byte] = {
    require(k > 0, "cannot serialize an empty placeholder sample sketch")
    val es = entries
    val bos = new ByteArrayOutputStream(9 + 16 * es.length)
    val out = new DataOutputStream(bos)
    out.writeByte(1)
    out.writeInt(k)
    out.writeInt(es.length)
    es.foreach { case (key, p) => out.writeLong(key); out.writeLong(p) }
    out.flush()
    bos.toByteArray
  }
}

object SampleSketch {
  val MinK = 1
  val MaxK = 1 << 16

  /** Stored sketches are arbitrary user-supplied binary, so validate
    * the header against the byte count BEFORE allocating (the
    * TDigest.fromBytes contract). */
  def fromBytes(bytes: Array[Byte]): SampleSketch = {
    if (bytes.length < 9)
      throw new IllegalArgumentException(
        s"not a sample sketch: ${bytes.length} bytes, need >= 9 for the header")
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val version = in.readByte()
    if (version != 1)
      throw new IllegalArgumentException(
        s"unsupported sample sketch version $version (expected 1)")
    val k = in.readInt()
    if (k < MinK || k > MaxK)
      throw new IllegalArgumentException(
        s"corrupt sample sketch: k $k outside [$MinK, $MaxK]")
    val n = in.readInt()
    if (n < 0 || n > k || bytes.length != 9 + 16L * n)
      throw new IllegalArgumentException(
        s"corrupt sample sketch: $n entries for k $k in ${bytes.length} bytes " +
          s"(expected ${9 + 16L * math.max(n, 0)})")
    val sk = new SampleSketch(k)
    var i = 0
    while (i < n) {
      val key = in.readLong(); val p = in.readLong()
      sk.add(key, p)
      i += 1
    }
    sk
  }
}

/** `graft_sample_sketch(key, priority, k)` — one bounded weighted
  * sample per group as a binary sketch: the storable half. Map-side
  * partials merge by per-key max + top-k trim; state is O(k) per
  * group wherever the rows land. */
case class SampleSketchAgg(
    left: Expression,
    right: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SampleSketch] with BinaryLike[Expression] {

  require(k >= SampleSketch.MinK && k <= SampleSketch.MaxK,
    s"k must be within [${SampleSketch.MinK}, ${SampleSketch.MaxK}], got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (bigint key, bigint priority), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def prettyName: String = "graft_sample_sketch"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): SampleSketch = new SampleSketch(k)

  override def update(buffer: SampleSketch, input: InternalRow): SampleSketch = {
    val key = left.eval(input)
    val p = right.eval(input)
    if (key != null && p != null)
      buffer.add(key.asInstanceOf[Long], p.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: SampleSketch, other: SampleSketch): SampleSketch = {
    buffer.mergeWith(other)
    buffer
  }

  override def eval(buffer: SampleSketch): Any = buffer.toBytes

  override def serialize(buffer: SampleSketch): Array[Byte] = buffer.toBytes
  override def deserialize(bytes: Array[Byte]): SampleSketch =
    SampleSketch.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(o: Int): SampleSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SampleSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SampleSketchAgg =
    copy(left = newLeft, right = newRight)
}

object SampleSketchAgg {
  def apply(key: Column, priority: Column, k: Int): Column =
    Bridge.column(SampleSketchAgg(Bridge.expression(key),
      Bridge.expression(priority), k).toAggregateExpression())
}

/** `graft_sample_merge(sketch)` — fold stored binary sample sketches
  * into ONE merged sample by per-key max + top-k trim: the UNION
  * half. Exactly equal to sketching the concatenated inputs (see the
  * class doc's merge argument). Mixed-k inputs fail descriptively. */
case class SampleMerge(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends SketchMergeAgg[SampleSketch] {

  override def prettyName: String = "graft_sample_merge"
  override protected def emptyBuffer: SampleSketch = new SampleSketch(0)
  override protected def isEmptyBuffer(s: SampleSketch): Boolean = s.capacity == 0
  override protected def fromSketchBytes(b: Array[Byte]): SampleSketch =
    SampleSketch.fromBytes(b)
  override protected def toSketchBytes(s: SampleSketch): Array[Byte] = s.toBytes
  override protected def mergeInto(buf: SampleSketch, other: SampleSketch): Unit =
    buf.mergeWith(other)

  override def withNewMutableAggBufferOffset(o: Int): SampleMerge =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SampleMerge =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): SampleMerge =
    copy(child = newChild)
}

object SampleMerge {
  def apply(c: Column): Column =
    Bridge.column(SampleMerge(Bridge.expression(c)).toAggregateExpression())
}

/** `graft_sample_entries(sketch)` — the sampled keys from a stored
  * binary sketch as `array<struct<key, priority>>` in rank order
  * (priority desc, key asc). Deserializes per evaluation — a
  * post-aggregate probe expression (the CmsQuery contract). */
case class SampleEntries(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a binary sketch, got ${child.dataType.simpleString}")

  override def prettyName: String = "graft_sample_entries"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("key", LongType, nullable = false),
    StructField("priority", LongType, nullable = false))), containsNull = false)

  override def nullSafeEval(sketch: Any): Any = {
    val es = SampleSketch.fromBytes(sketch.asInstanceOf[Array[Byte]]).entries
    new GenericArrayData(es.map { case (key, p) =>
      InternalRow(key, p)
    }.toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): SampleEntries =
    copy(child = newChild)
}

object SampleEntries {
  def apply(c: Column): Column =
    Bridge.column(SampleEntries(Bridge.expression(c)))
}
