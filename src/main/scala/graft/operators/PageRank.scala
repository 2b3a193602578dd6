package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank over an edge list in INTEGER fixed-point — web-graph
  * centrality as a deterministic, oracle-replayable operator (the
  * quality-weighting signal web-corpus training pipelines attach to
  * documents/hosts).
  *
  * Ranks live in `1/q` fixed-point; each iteration is
  * `r'(v) = (dampDen-dampNum)·(q DIV n) DIV dampDen
  *          + dampNum·Σ_{u→v}(r(u) DIV deg(u)) DIV dampDen`
  * with FLOOR division at every step (all operands positive, so Spark
  * `DIV` and DuckDB `//` truncate identically) — a fixed iteration
  * count is therefore bit-identical on any engine, no float
  * accumulation order to worry about.
  *
  * Scale shape: the Pregel-style iterate — join per-node
  * contributions to the edge list on src, aggregate by dst — two hash
  * shuffles per iteration, state one row per node. Edge and degree
  * tables are lineage-truncated ONCE and reused by every iteration;
  * each round's rank table is truncated eagerly and its predecessor's
  * blocks released immediately ([[Components]]' checkpoint
  * discipline — reliable checkpoint when a dir is set, local blocks
  * otherwise), so the logical plan stays constant-size instead of
  * nesting one copy per iteration.
  *
  * Contract: `edges` is the WALK graph — already symmetrized if the
  * source relation is undirected, and every node must have outdegree
  * ≥ 1 (no dangling nodes; symmetrizing guarantees this). Symmetry
  * also guarantees indegree ≥ 1: the per-round join+aggregate only
  * re-emits nodes that RECEIVE an edge, so on a directed graph a
  * node with no in-links would leave the rank table after round one
  * and its outgoing mass would vanish with it — feed directed graphs
  * only if that sink-the-sources semantics is intended. Node ids
  * and the fixed-point q must keep `dampNum · Σ contributions` inside
  * a long: q·n_nodes·dampNum < 2⁶³.
  */
object PageRank {

  private def truncate(df: DataFrame)
      : (DataFrame, java.math.BigInteger, () => Unit) =
    org.apache.spark.sql.graft.Bridge.truncatedAutoSum(df, sumIdx = 1)

  /** @param edges   (srcCol, dstCol) long node ids; see contract above
    * @param iters   fixed iteration count (part of the semantics)
    * @param q       fixed-point scale (rank 1.0 ≡ q)
    * @return (v, r) — node id and final fixed-point rank
    */
  def fixedPoint(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, q: Long = 1000000000000L,
      dampNum: Int = 17, dampDen: Int = 20): DataFrame =
    run(edges, srcCol, dstCol, iters, q, dampNum, dampDen,
      wantDelta = false)._1

  /** [[fixedPoint]] plus convergence TELEMETRY: also returns the
    * final-round L1 distance-to-fixpoint `Σ_v |r_iters(v) −
    * r_{iters−1}(v)|` (fixed-point units). A fixed iteration count is
    * the oracle-replayable contract, but a production run needs a
    * runtime signal of how far from converged it stopped — this is
    * that signal, self-reported for the price of ONE extra join+agg
    * over the node-count-sized rank tables (the last two rounds are
    * materialized anyway by the chaining discipline). The ranks are
    * bit-identical to [[fixedPoint]]'s: chain boundaries never change
    * values (PageRankSpec asserts both, and that the delta shrinks as
    * iterations grow). */
  def fixedPointWithDelta(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, q: Long = 1000000000000L,
      dampNum: Int = 17, dampDen: Int = 20): (DataFrame, Long) = {
    val (df, delta) = run(edges, srcCol, dstCol, iters, q, dampNum, dampDen,
      wantDelta = true)
    (df, delta.get)
  }

  private def run(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, q: Long, dampNum: Int, dampDen: Int,
      wantDelta: Boolean): (DataFrame, Option[Long]) = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(dampNum > 0 && dampNum < dampDen,
      s"damping num/den must satisfy 0 < num < den, got $dampNum/$dampDen")
    // Degree folds INTO the edge list once: each iteration then joins
    // one static table instead of two, and the per-edge division
    // `r DIV deg` happens inside the aggregation projection.
    val e0 = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val degDf = e0.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val (ed, _, releaseED) = truncate(
      e0.join(degDf, "src").select(col("src"), col("dst"), col("deg")))
    // From here the edge snapshot is on disk/blocks — any failure must
    // release it (and the current round) or the checkpoint leaks:
    // reliable-checkpoint files are never reaped by default.
    var release: () => Unit = () => ()
    try {
      // node count over the truncated blocks — no second parquet pass
      val n = ed.select(countDistinct(col("src"))).head().getLong(0)
      require(n > 0, "PageRank on an empty edge list")
      val init = q / n
      val base = (dampDen - dampNum) * init / dampDen

      def round(r: DataFrame): DataFrame =
        ed.join(r.withColumnRenamed("v", "src"), "src")
          .groupBy(col("dst")).agg(sum(expr("r DIV deg")).as("sc"))
          .select(col("dst").as("v"),
            (lit(base) + expr(s"($dampNum * sc) DIV $dampDen")).as("r"))

      // the init table rides inside the first chain's lineage — cheap
      // enough that materializing it separately just costs a job
      var ranks: DataFrame = ed.select(col("src").as("v")).distinct()
        .select(col("v"), lit(init).as("r"))
      // telemetry needs r_{iters-1} materialized, so its chains stop
      // one round short and the last round runs separately below
      val chainTo = if (wantDelta) iters - 1 else iters
      var k = 1
      while (k <= chainTo) {
        // Chain up to 5 rounds per materialization: lineage stays
        // shallow enough to compile fast, and one job executes the
        // whole chain instead of paying per-round job latency.
        val step = math.min(5, chainTo - k + 1)
        var chained = ranks
        for (_ <- 1 to step) chained = round(chained)
        val (t, _, rel) = truncate(chained)
        release()
        ranks = t
        release = rel
        k += step
      }
      if (!wantDelta) (ranks, None)
      else {
        // ranks here = r_{iters-1} (for iters == 1, the r_0 init plan)
        val prev = ranks
        val prevRelease = release
        val (fin, _, relFin) = truncate(round(prev))
        release = () => { prevRelease(); relFin() } // failure path frees both
        val delta = fin.as("a")
          .join(prev.as("b"), col("a.v") === col("b.v"))
          .agg(sum(abs(col("a.r") - col("b.r")))).head().getLong(0)
        prevRelease()
        release = relFin
        (fin, Some(delta))
      }
    } catch {
      case t: Throwable =>
        release()
        throw t
    } finally releaseED()
  }
}
