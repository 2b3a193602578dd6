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
    // the (deg, node) total order is compared LEXICOGRAPHICALLY as two
    // columns — an earlier packing into deg·2³² + node silently
    // collided once node ids crossed 2³² (two distinct nodes can pack
    // equal, corrupting the orientation's antisymmetry), a bound the
    // sf~10 key-shifted ids actually exceed
    val oriented = edges
      .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
      .select(
        (col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v"))).as("uFirst"),
        col("u"), col("v"), col("du"), col("dv"))
      .select(
        when(col("uFirst"), col("u")).otherwise(col("v")).as("s"),
        when(col("uFirst"), col("v")).otherwise(col("u")).as("t"),
        when(col("uFirst"), col("dv")).otherwise(col("du")).as("td"))
    val wedges = oriented.as("e1").join(oriented.as("e2"),
        col("e1.s") === col("e2.s") &&
          (col("e1.td") < col("e2.td") ||
            (col("e1.td") === col("e2.td") && col("e1.t") < col("e2.t"))))
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
