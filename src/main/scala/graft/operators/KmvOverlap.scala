package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** KMV sketch-to-sketch overlap join: ONE bounded sketch (the k
  * smallest LCG hashes of the group's distinct keys) per group, then
  * every group PAIR's union / intersection / Jaccard estimated from
  * the sketches alone — the audience-overlap matrix, raw data scanned
  * once however many pairs are scored.
  *
  * Scale shape: the per-group top-k ranks through a rank-limit window
  * Spark compiles to a map-side partial top-k below the exchange
  * (WindowGroupLimit, the q07/q21 shape) — no whole group's key set
  * ever sorts in one task. The pairwise stage handles G sketch ROWS
  * of k BIGINTs each (G²/2 pairs × O(k) array work): for thousands of
  * groups still one executor's work, joined via a constant-key
  * equi-join + broadcast, never a planned cartesian. `withExact` adds
  * the exact pairwise overlap as an error report through one
  * distinct-key self equi-join shuffled on the high-cardinality key —
  * dev/eval only; the production path is sketches-only.
  *
  * Estimator (the q71/q80 KMV algebra): over the combined top-k U of
  * two sketches, |A∪B| ≈ (k−1)·P/max(U), and |A∩B| ≈ ĵ·|A∪B| with
  * ĵ = |{u ∈ U : u ∈ A ∧ u ∈ B}|/k. All sketch state is exact
  * integers, so a DuckDB oracle replays the whole pipeline
  * bit-for-bit.
  */
object KmvOverlap {

  private val P = 2147483647L

  /** @param df       input rows (need not be distinct)
    * @param groupCol grouping column (one sketch per value)
    * @param keyCol   integral key column whose per-group distinct sets
    *                 are compared
    * @param k        sketch size (estimate stderr ≈ 1/√k)
    * @param withExact also compute each pair's exact intersection size
    *                  (`n_inter_exact`; 0-filled for disjoint pairs)
    */
  def overlapMatrix(df: DataFrame, groupCol: String, keyCol: String,
      k: Int, withExact: Boolean = false): DataFrame = {
    // null keys carry no set membership and would desync k_own from
    // the collected sketch (collect_list drops nulls; a group of only
    // nulls would crash element_at(sk, 0)) — drop them at the scan
    val hd = df.filter(col(keyCol).isNotNull)
      .select(col(groupCol).as("g"),
        pmod(pmod(col(keyCol), lit(P)) * lit(1103515245L)
          + lit(12345L), lit(P)).as("h"))
      .distinct()
    val w = Window.partitionBy("g").orderBy("h")
    val sketches = hd.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .groupBy("g")
      .agg(sort_array(collect_list(col("h"))).as("sk"),
        count(lit(1)).as("k_own"))
    // pairwise sketch join via the q80 constant-key idiom: an
    // equi-join the planner broadcasts, not a cartesian. Each side
    // carries its OWN sketch extremum too, so per-side cardinalities
    // (and from them the difference legs A\B, B\A) come from the same
    // fixed state — the full set algebra per pair, no extra pass.
    val a = sketches.select(col("g").as("group_a"),
      col("sk").as("sk_a"), col("k_own").as("k_a"),
      element_at(col("sk"), size(col("sk"))).as("h_a"),
      pmod(col("k_own"), lit(1L)).as("__j"))
    val b = sketches.select(col("g").as("group_b"),
      col("sk").as("sk_b"), col("k_own").as("k_b"),
      element_at(col("sk"), size(col("sk"))).as("h_b"),
      pmod(col("k_own"), lit(1L)).as("__j"))
    val pairs = a.join(broadcast(b), "__j").drop("__j")
      .filter(col("group_a") < col("group_b"))
      .withColumn("topu",
        slice(array_sort(array_union(col("sk_a"), col("sk_b"))), 1, k))
      .withColumn("k_used", size(col("topu")).cast(LongType))
      .withColumn("h_k", element_at(col("topu"), size(col("topu"))))
      .withColumn("n_shared",
        size(array_intersect(array_intersect(col("topu"), col("sk_a")),
          col("sk_b"))).cast(LongType))
    val reported =
      if (!withExact) pairs
      else {
        val du = df.select(col(groupCol).as("g"), col(keyCol).as("key"))
          .distinct()
        val exact = du.as("x").join(du.as("y"),
            col("x.key") === col("y.key") && col("x.g") < col("y.g"))
          .groupBy(col("x.g").as("group_a"), col("y.g").as("group_b"))
          .agg(count(lit(1)).as("n_inter_exact"))
        pairs.join(exact, Seq("group_a", "group_b"), "left_outer")
          .withColumn("n_inter_exact", coalesce(col("n_inter_exact"), lit(0L)))
      }
    reported
      .withColumn("est_union",
        ((col("k_used") - 1) * lit(P)).cast(DoubleType) /
          greatest(col("h_k"), lit(1L)).cast(DoubleType))
      .withColumn("est_intersection",
        (col("n_shared").cast(DoubleType) / col("k_used").cast(DoubleType)) *
          (((col("k_used") - 1) * lit(P)).cast(DoubleType) /
            greatest(col("h_k"), lit(1L)).cast(DoubleType)))
      .withColumn("est_jaccard",
        col("n_shared").cast(DoubleType) / col("k_used").cast(DoubleType))
      // per-side cardinalities from each group's own k-th minimum,
      // then the difference legs |A\B| = |A| − |A∩B| (clamped at 0:
      // independent estimates can cross on near-total overlap)
      .withColumn("est_a",
        ((col("k_a") - 1) * lit(P)).cast(DoubleType) /
          greatest(col("h_a"), lit(1L)).cast(DoubleType))
      .withColumn("est_b",
        ((col("k_b") - 1) * lit(P)).cast(DoubleType) /
          greatest(col("h_b"), lit(1L)).cast(DoubleType))
      .withColumn("est_only_a",
        greatest(col("est_a") - col("est_intersection"), lit(0.0)))
      .withColumn("est_only_b",
        greatest(col("est_b") - col("est_intersection"), lit(0.0)))
      .drop("sk_a", "sk_b", "topu", "k_a", "k_b", "h_a", "h_b")
  }
}
