package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data pipeline operators: deterministic sampling, data
  * mixing with a reproducible global shuffle, and sequence packing.
  *
  * Everything is keyed on explicit integer hashes of the row id
  * (SURVEY.md §4 rule 6) — engine-portable, reproducible across runs
  * and cluster sizes, and cheap: each operator is one codegen'd
  * projection plus at most one shuffle, so the shapes hold at 100 TB
  * (sampling/mixing never materialize more than the kept rows; packing
  * shuffles once on the group key).
  */
object Pipeline {

  /** LCG-style id hash onto [0, P): deterministic per row, uniform
    * enough for rate sampling, trivially re-expressible in SQL.
    * The id is reduced mod M BEFORE the multiply, so the product is
    * bounded by M·mult < 2^62 for EVERY 64-bit id — without the
    * reduction, ids past ~4·10^9 overflow the multiply (ANSI engines
    * error; wrapping engines silently fork from the oracle), a bound
    * the sf~10 gate actually crossed. The pre-reduction changes no
    * value: (id·a + c) ≡ ((id mod M)·a + c) (mod M), and for ids
    * below M the reduction is the identity. pmod (not %): a negative
    * id would otherwise hash negative, and a negative residue passes
    * every `< threshold` sampling filter — silently keeping 100% of
    * those rows. For non-negative ids pmod ≡ %, so the SQL oracles
    * (which run on non-negative doc_ids) still match. */
  def idHash(id: Column, mult: Long = 1103515245L, add: Long = 12345L): Column =
    pmod(pmod(id, lit(2147483647L)) * lit(mult) + lit(add), lit(2147483647L))

  /** Per-stratum deterministic rate sampling: keep a row iff
    * `idHash(id) mod 1000` falls under its stratum's per-mille
    * threshold. Unsampled strata fall back to `defaultPerMille`.
    * A pure filter — no shuffle, scan-pushdown friendly. */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
      perMille: Map[String, Int], defaultPerMille: Int): DataFrame = {
    val thr = perMille.foldLeft(lit(defaultPerMille)) { case (acc, (k, v)) =>
      when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    df.filter(idHash(col(idCol)) % lit(1000L) < thr)
  }

  /** Weighted sampling without replacement (Efraimidis–Spirakis 2006):
    * per row, u = (idHash(id)+1)/2^31 ∈ (0,1] and the row ranks by
    * u^(1/w) — computed as the monotone-equivalent log2(u)/w so no
    * pow() enters the sort key — keeping the top k per stratum
    * (ties by id). The rank-window cut is a map-side partial top-k
    * (InferWindowGroupLimit), i.e. O(k) state per stratum at any
    * input size: the distributed mergeable weighted reservoir.
    * Weights are pinned to >= 1 so zero-weight rows cannot inject
    * NaN/∞ into the ordering. Output: the sampled rows plus their
    * 1-based `rank` within the stratum (`rank` is part of the
    * contract, so the input must not already carry one — required
    * loudly rather than silently overwritten). */
  def prioritySample(df: DataFrame, idCol: String, weightCol: String,
      strataCol: String, k: Int): DataFrame = {
    require(!df.columns.contains("rank"),
      "prioritySample outputs a 'rank' column; the input already has " +
        "one — rename it before sampling")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCol).orderBy(col("__graft_prio").desc, col(idCol))
    df.withColumn("__graft_u", (idHash(col(idCol)) + lit(1L))
        .cast("double") / lit(2147483648.0))
      .withColumn("__graft_prio", log2(col("__graft_u")) /
        greatest(col(weightCol), lit(1L)).cast("double"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .drop("__graft_u", "__graft_prio")
  }

  /** Deterministic global shuffle of a (possibly mixed) sample: each
    * row lands in shard `idHash(id) mod shards` at a position given by
    * an independent second hash. One shuffle on the shard key; within-
    * shard ordering is a per-shard sort (shard count scales with the
    * cluster, keeping sorts partition-local). */
  def deterministicShuffle(df: DataFrame, idCol: String, shards: Int): DataFrame = {
    val h2 = idHash(col(idCol), mult = 69069L, add = 1L)
    val w = Window.partitionBy(col("shard")).orderBy(h2, col(idCol))
    df.withColumn("shard", (idHash(col(idCol)) % lit(shards.toLong)).cast("int"))
      .withColumn("pos", row_number().over(w).cast("long"))
  }

  /** Deterministic fixed-size sample: the k rows with the smallest id
    * hash per stratum — a reproducible "reservoir" whose membership is
    * stable under corpus growth only when ids are stable (the standard
    * trade-off). One shuffle on the stratum key. */
  def topKSample(df: DataFrame, idCol: String, strataCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(strataCol)
      .orderBy(idHash(col(idCol)), col(idCol))
    df.withColumn("samp_rank", row_number().over(w).cast("long"))
      .filter(col("samp_rank") <= k)
  }

  /** Class-balanced undersampling: every class kept at (approximately)
    * the minimum class frequency, so the output distribution is
    * uniform over classes. Per-class integer keep-thresholds
    * `minCount * resolution div count` are derived from one small
    * aggregate over the input (num-classes rows — broadcast join back;
    * the window-min runs over that tiny frame, never the data), then
    * membership is the same pure [[idHash]] filter rate sampling uses:
    * deterministic, re-runnable, no shuffle of the data itself. */
  def classBalance(df: DataFrame, idCol: String, classCol: String,
      resolution: Long = 100000L): DataFrame = {
    val counts = df.groupBy(classCol).agg(count(lit(1)).as("__n"))
    // integer `div`, not double `/`: a double quotient can round up
    // across an integer boundary and admit one extra per-mille bucket.
    // The window-min runs over the tiny per-class counts frame; the
    // constant non-foldable partition key (q58/p10 convention)
    // declares that single bounded partition so WindowExec's "No
    // Partition Defined" warning never fires.
    val thr = counts
      .withColumn("__min",
        min(col("__n")).over(Window.partitionBy(pmod(col("__n"), lit(1L)))))
      .withColumn("__thr", expr(s"(__min * ${resolution}L) div __n"))
    df.join(broadcast(thr), classCol)
      .filter(idHash(col(idCol)) % lit(resolution) < col("__thr"))
      .drop("__n", "__min", "__thr")
  }

  /** Benchmark decontamination: count shingle hashes each corpus doc
    * shares with a (small, broadcast) benchmark set; a doc is
    * contaminated at `minShared` overlapping shingles. The benchmark
    * side is distinct-shingles only — its size, not the corpus size,
    * bounds the broadcast. */
  def decontaminate(corpusShingles: DataFrame, benchShingles: DataFrame,
      minShared: Int): DataFrame = {
    val bench = benchShingles.select("shingle").distinct()
    corpusShingles
      .join(broadcast(bench), "shingle")
      .groupBy("doc_id")
      .agg(countDistinct(col("shingle")).as("n_shared"))
      .withColumn("is_contaminated", col("n_shared") >= minShared)
  }

  /** Exact NTILE over (orderCol, tieCol) without the single-partition
    * global-sort window `ntile().over(Window.orderBy(...))` plans to.
    * Global rank decomposes as
    *   rank = (#rows with a smaller orderCol value) + (rank within my
    *          orderCol value, by tieCol)
    * — the first term comes from a per-value count frame (distinct
    * orderCol values: bounded, dimension-sized, its cumulative window
    * is over that tiny frame only), the second from a window
    * PARTITIONED by orderCol, so no executor ever sees more than one
    * value-group. NTILE's bucket arithmetic (first N mod n buckets get
    * one extra row) is then a closed form of the rank. Skewed single
    * values (one orderCol value dominating) inherit the window's skew
    * — acceptable for difficulty proxies whose value counts are
    * histogram-like; salt tieCol groups if a value exceeds a partition.
    * @return df + `ntile` (int, 1-based). */
  def distributedNtile(df: DataFrame, n: Int, orderCol: String,
      tieCol: String): DataFrame = {
    val within = row_number().over(
      Window.partitionBy(orderCol).orderBy(tieCol)).cast("long")
    val counts = df.groupBy(orderCol).agg(count(lit(1)).as("__cnt"))
    // this window runs over the DISTINCT-value counts frame only —
    // dimension-sized by construction, never the data. The partition
    // key is a constant-valued but NON-foldable expression
    // (pmod(count, 1) ≡ 0): it declares that single bounded partition
    // explicitly so WindowExec's "No Partition Defined" warning (an
    // accidental-global-sort smell in bench tails) never fires, while
    // the optimizer can't fold the key away.
    val tiny = Window.partitionBy(pmod(col("__cnt"), lit(1L)))
      .orderBy(orderCol)
    val cum = counts
      .withColumn("__before", coalesce(sum(col("__cnt")).over(
        tiny.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__total", sum(col("__cnt")).over(
        tiny.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .drop("__cnt")
    df.withColumn("__within", within)
      .join(broadcast(cum), orderCol)
      .withColumn("__r", col("__before") + col("__within"))
      .withColumn("ntile", expr(
        s"""CAST(CASE
          WHEN __r <= (__total % $n) * (__total DIV $n + 1)
          THEN (__r - 1) DIV (__total DIV $n + 1) + 1
          ELSE (__total % $n)
             + (__r - 1 - (__total % $n) * (__total DIV $n + 1))
               DIV (__total DIV $n) + 1
        END AS INT)"""))
      .drop("__within", "__before", "__total", "__r")
  }

  /** Sequence packing by token offset: concatenate each group's docs
    * in `orderCol` order and chop the token stream into fixed-size
    * context windows; a doc belongs to the bin its first token lands
    * in. One shuffle on the group key; the running sum is a single
    * window pass, so group size — not corpus size — bounds the sort. */
  def packSequences(df: DataFrame, groupCol: String, orderCol: String,
      nTokensCol: String, maxTokens: Int): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("start_off",
        coalesce(sum(col(nTokensCol)).over(w), lit(0L)))
      .withColumn("bin_id", floor(col("start_off") / lit(maxTokens)))
  }

  /** Best-fit WHOLE-DOC sequence packing — the no-split discipline
    * next to [[packSequences]]'s concat-and-chop: a document is never
    * straddled across bins (greedy lets a doc cross the window
    * boundary; loaders then truncate or leak attention across the
    * split). Each doc, in `orderCol` order, goes to the OPEN bin with
    * the smallest remaining capacity that still fits (ties → oldest
    * bin); if none fits, a new bin opens. Open bins are a bounded
    * look-back of `maxOpenBins`: opening past the cap closes the
    * OLDEST — so per-group packer state is O(maxOpenBins) however many
    * bins a group produces, and bin ids stay densely sequential in
    * creation order. A doc longer than `maxTokens` gets a bin of its
    * own (remaining clamps to 0 — it never receives another doc),
    * mirroring packSequences' never-split-a-record contract.
    *
    * This is the declared-legitimate sequential-scan shape: a
    * secondary sort (hash partition on the group, in-partition sort by
    * (group, order)) and ONE mapPartitions pass — best-fit is
    * inherently order-dependent, no window/agg composition expresses
    * it. Output: (g, o, n, bin_id) named after the inputs' roles. */
  def packBestFit(df: DataFrame, groupCol: String, orderCol: String,
      nTokensCol: String, maxTokens: Int, maxOpenBins: Int): DataFrame = {
    require(maxTokens > 0 && maxOpenBins > 0)
    val proj = df.select(col(groupCol).cast("string").as("g"),
      col(orderCol).cast("long").as("o"),
      col(nTokensCol).cast("long").as("n"))
    val parted = proj.repartition(col("g")).sortWithinPartitions("g", "o")
    import parted.sparkSession.implicits._
    parted.as[(String, Long, Long)].mapPartitions { it =>
      var curG: String = null
      var lo = 0L
      val rem = scala.collection.mutable.ArrayBuffer.empty[Long]
      it.map { case (g, o, n) =>
        if (g != curG) { curG = g; lo = 0L; rem.clear() }
        var best = -1
        var i = 0
        while (i < rem.length) {
          if (rem(i) >= n && (best < 0 || rem(i) < rem(best))) best = i
          i += 1
        }
        val bin =
          if (best >= 0) { rem(best) -= n; lo + best }
          else {
            rem += math.max(maxTokens.toLong - n, 0L)
            val id = lo + rem.length - 1
            if (rem.length > maxOpenBins) { rem.remove(0); lo += 1 }
            id
          }
        (g, o, n, bin)
      }
    }.toDF("g", "o", "n", "bin_id")
  }
}
