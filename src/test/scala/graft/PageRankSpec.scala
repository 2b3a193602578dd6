package graft

import graft.operators.PageRank
import org.apache.spark.sql.functions._

/** PageRank fixed-point: exact integer equality against a local Scala
  * replay of the same floor-division recurrence, centrality ordering
  * on an obvious hub graph, and the operator contracts. */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  // star: hub 1 connected to 2,3,4; chain tail 4-5 (symmetrized)
  private val undirected = Seq(
    (1L, 2L), (1L, 3L), (1L, 4L), (4L, 5L))
  private def edges = (undirected ++ undirected.map(_.swap))
    .toDF("src", "dst")

  /** The operator's recurrence, replayed with plain Scala longs. */
  private def reference(es: Seq[(Long, Long)], iters: Int, q: Long,
      dampNum: Long, dampDen: Long): Map[Long, Long] = {
    val deg = es.groupBy(_._1).map { case (v, g) => v -> g.size.toLong }
    val n = deg.size.toLong
    val init = q / n
    val base = (dampDen - dampNum) * init / dampDen
    var r = deg.keys.map(_ -> init).toMap
    (1 to iters).foreach { _ =>
      val in = es.groupBy(_._2).map { case (v, g) =>
        v -> g.map { case (u, _) => r(u) / deg(u) }.sum
      }
      r = in.map { case (v, s) => v -> (base + dampNum * s / dampDen) }
    }
    r
  }

  test("10 iterations match the local integer replay exactly") {
    val got = PageRank.fixedPoint(edges, "src", "dst", iters = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = reference(undirected ++ undirected.map(_.swap),
      iters = 10, q = 1000000000000L, dampNum = 17L, dampDen = 20L)
    assert(got === want)
    // the hub out-centralizes everything; the chain tail ranks lowest
    assert(got(1L) === got.values.max)
    assert(got(5L) === got.values.min)
  }

  test("rank mass stays within truncation loss of the full scale") {
    val got = PageRank.fixedPoint(edges, "src", "dst", iters = 10)
      .agg(sum(col("r"))).head().getLong(0)
    val q = 1000000000000L
    // each of 5 nodes loses < dampDen units per division per round;
    // after 10 rounds the total sits just below q
    assert(got <= q && got > q - 10L * 5L * 3L * 20L)
  }

  test("delta telemetry: ranks unchanged, L1 delta shrinks with iterations") {
    val (ranks, d10) = PageRank.fixedPointWithDelta(edges, "src", "dst",
      iters = 10)
    // telemetry must not perturb the semantics: bit-identical ranks
    val got = ranks.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = reference(undirected ++ undirected.map(_.swap),
      iters = 10, q = 1000000000000L, dampNum = 17L, dampDen = 20L)
    assert(got === want)
    // distance-to-fixpoint decays (geometric in the damping factor);
    // the star fixture starts far from uniform so every step moves
    val deltas = Seq(1, 3, 6, 10).map(i =>
      PageRank.fixedPointWithDelta(edges, "src", "dst", iters = i)._2)
    assert(deltas === deltas.sorted.reverse,
      s"deltas must be non-increasing: $deltas")
    assert(deltas.last < deltas.head,
      s"10-round delta must be strictly below 1-round: $deltas")
    assert(deltas.last === d10)
  }

  test("contracts: empty edges and bad damping are rejected") {
    intercept[IllegalArgumentException] {
      PageRank.fixedPoint(edges, "src", "dst", iters = 0)
    }
    intercept[IllegalArgumentException] {
      PageRank.fixedPoint(edges, "src", "dst", iters = 1,
        dampNum = 20, dampDen = 20)
    }
  }
}
