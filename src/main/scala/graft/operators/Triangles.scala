package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting via degree-ordered edge orientation
  * (the MapReduce-era standard: Suri & Vassilvitskii's "Counting
  * triangles and the curse of the last reducer", adapted to
  * DataFrame equi-joins).
  *
  * Every undirected edge is oriented from its lower-(degree, id)
  * endpoint to the higher one. Under that total order the out-degree
  * of any node is O(√m), so the wedge join — the only superlinear
  * step — generates Σ C(out-deg, 2) candidates, which degree ordering
  * provably minimizes to O(m^1.5) even on power-law graphs where
  * id-ordering would pile C(deg_max, 2) wedges on one hub. Closure
  * testing is one more equi-join against the oriented edge list; no
  * step needs a broadcast-nested-loop or a global sort.
  */
object Triangles {

  /** One-row graph stats over an undirected edge list (columns u, v;
    * each undirected edge present exactly once, u ≠ v): node count,
    * edge count, wedge count Σ C(deg, 2) (closed form, exact), exact
    * triangle count, and the global clustering coefficient
    * 3·triangles / wedges (single IEEE division of exact integers).
    */
  def stats(edges: DataFrame): DataFrame = {
    val deg = edges.select(col("u").as("node"))
      .union(edges.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    // (deg, node) packed into one BIGINT so orientation comparisons
    // stay single-column; node ids must fit in 32 bits (guarded by
    // the multiplication overflowing loudly past that in tests).
    val rk = deg.select(col("node"), col("deg"),
      (col("deg") * lit(4294967296L) + col("node")).as("rk"))
    val oriented = edges
      .join(rk.select(col("node").as("u"), col("rk").as("rku")), "u")
      .join(rk.select(col("node").as("v"), col("rk").as("rkv")), "v")
      .select(
        when(col("rku") < col("rkv"), col("u")).otherwise(col("v")).as("s"),
        when(col("rku") < col("rkv"), col("v")).otherwise(col("u")).as("t"),
        greatest(col("rku"), col("rkv")).as("tk"))
    val wedges = oriented.as("e1").join(oriented.as("e2"),
        col("e1.s") === col("e2.s") && col("e1.tk") < col("e2.tk"))
      .select(col("e1.t").as("t1"), col("e2.t").as("t2"))
    val nTri = wedges.join(oriented,
        col("t1") === col("s") && col("t2") === col("t"))
      .agg(count(lit(1)).as("n_triangles"))
    val nodesEdges = deg.agg(
      count(lit(1)).as("n_nodes"),
      expr("sum(deg) DIV 2").as("n_edges"),
      sum(expr("deg * (deg - 1) DIV 2")).as("n_wedges"))
    nodesEdges.crossJoin(nTri)
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
        col("n_triangles"),
        (lit(3.0) * col("n_triangles").cast("double") /
          col("n_wedges").cast("double")).as("global_cc"))
  }
}
