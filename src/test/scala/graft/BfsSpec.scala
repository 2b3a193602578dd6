package graft

import graft.operators.Bfs
import org.apache.spark.sql.functions._

class BfsSpec extends SparkSpec {
  import spark.implicits._

  private def dists(out: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain graph: hop distance from the seed end") {
    // path 1-2-3-4-5, seed 1
    val edges = (1L until 5L).map(i => (i, i + 1)).toDF("u", "v")
    val seeds = Seq(1L).toDF("node")
    val out = Bfs.hopDistances(edges, "u", "v", seeds, "node", maxHops = 10)
    assert(dists(out) === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L))
    // frontier died at hop 5 (empty round), well before the bound
    assert(Bfs.lastRounds <= 5)
  }

  test("duplicated / both-orientation edges change nothing") {
    // the symmetrized adjacency is deliberately NOT deduplicated (a
    // conforming once-per-edge input gains nothing from it, and the
    // per-round frontier distinct absorbs non-conforming fan-out) —
    // feed the worst case: every edge twice, plus both orientations
    val once = (1L until 5L).map(i => (i, i + 1))
    val edges = (once ++ once ++ once.map(_.swap)).toDF("u", "v")
    val seeds = Seq(1L).toDF("node")
    val out = Bfs.hopDistances(edges, "u", "v", seeds, "node", maxHops = 10)
    assert(dists(out) === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L))
  }

  test("multi-source: distance is to the NEAREST seed") {
    // path 1..7, seeds at both ends — middle node 4 is 3 from each
    val edges = (1L until 7L).map(i => (i, i + 1)).toDF("u", "v")
    val seeds = Seq(1L, 7L).toDF("node")
    val out = Bfs.hopDistances(edges, "u", "v", seeds, "node", maxHops = 10)
    assert(dists(out) === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L,
      5L -> 2L, 6L -> 1L, 7L -> 0L))
  }

  test("maxHops bounds the reach by contract (no loud failure)") {
    val edges = (1L until 10L).map(i => (i, i + 1)).toDF("u", "v")
    val seeds = Seq(1L).toDF("node")
    val out = Bfs.hopDistances(edges, "u", "v", seeds, "node", maxHops = 3)
    // nodes past 3 hops are simply absent
    assert(dists(out) === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
  }

  test("disconnected component is unreached; isolated seed is dist 0") {
    val edges = Seq((1L, 2L), (10L, 11L)).toDF("u", "v")
    val seeds = Seq(1L, 99L).toDF("node") // 99 has no edges at all
    val out = Bfs.hopDistances(edges, "u", "v", seeds, "node", maxHops = 5)
    assert(dists(out) === Map(1L -> 0L, 2L -> 1L, 99L -> 0L))
  }

  test("cycle: BFS layers are min-hop, not path-order") {
    // 4-cycle 1-2-3-4-1 with seed 1: opposite corner is 2 hops
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("u", "v")
    val seeds = Seq(1L).toDF("node")
    val out = Bfs.hopDistances(edges, "u", "v", seeds, "node", maxHops = 10)
    assert(dists(out) === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 1L))
  }

  test("empty seed set yields empty result") {
    val edges = Seq((1L, 2L)).toDF("u", "v")
    val seeds = Seq.empty[Long].toDF("node")
    assert(Bfs.hopDistances(edges, "u", "v", seeds, "node", 5).count() === 0)
  }
}
