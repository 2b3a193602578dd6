package graft

import graft.operators.Components
import org.apache.spark.sql.functions._

class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("connected components find min label per cluster") {
    // chain 1-2-3, pair 10-11, singleton edge 20-21
    val edges = Seq((2L, 3L), (1L, 2L), (10L, 11L), (21L, 20L))
      .toDF("d1", "d2")
    val comps = Components.connectedComponents(edges, "d1", "d2")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("long chain converges to global min") {
    val edges = (1L until 12L).map(i => (i, i + 1)).toDF("d1", "d2")
    val comps = Components.connectedComponents(edges, "d1", "d2")
      .collect().map(_.getLong(1)).distinct
    assert(comps.toSeq === Seq(1L))
  }

  test("empty edge set yields empty labels (clean corpus, no near-dups)") {
    val edges = Seq.empty[(Long, Long)].toDF("d1", "d2")
    assert(Components.connectedComponents(edges, "d1", "d2").count() === 0)
    val all = Seq(0L, 1L).toDF("doc_id")
    val out = Components.canonicalize(all, "doc_id", edges, "d1", "d2")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(out === Set((0L, 0L, false), (1L, 1L, false)))
  }

  test("rounds grow logarithmically in diameter (pointer jump engaged)") {
    // a 3000-hop path with the min at one end is the adversarial
    // shape the sf1 gate produced (df-capped shingle graphs collapse
    // to thin chains); plain min-propagation would need 3000 rounds —
    // the neighbor-min + pointer-jump recurrence compounds reach
    // ~2x per round, so it must converge in ~log2(3000) + slack
    val n = 3000L
    val edges = (1L until n).map(i => (i, i + 1)).toDF("d1", "d2")
      .repartition(8)
    val comps = Components.connectedComponents(edges, "d1", "d2")
      .collect().map(_.getLong(1)).distinct
    assert(comps.toSeq === Seq(1L))
    assert(Components.lastRounds <= 25,
      s"path of $n nodes took ${Components.lastRounds} rounds — " +
        "the pointer jump is not compounding")
  }

  test("non-convergence within maxIter fails loudly instead of returning split labels") {
    val edges = (1L until 6L).map(i => (i, i + 1)).toDF("d1", "d2")
    val e = intercept[IllegalStateException] {
      Components.connectedComponents(edges, "d1", "d2", maxIter = 1)
    }
    assert(e.getMessage.contains("not converged"))
  }

  test("reliable-checkpoint mode (checkpoint dir set) gives identical labels") {
    // chain + pair, deep enough to take several truncated rounds
    val edges = ((1L until 8L).map(i => (i, i + 1)) :+ (30L, 31L))
      .toDF("d1", "d2")
    val expected = Components.connectedComponents(edges, "d1", "d2")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ckDir = java.nio.file.Files.createTempDirectory("graft_ck").toString
    val viaReliable = org.apache.spark.sql.graft.Bridge.withCheckpointDir(
      spark.sparkContext, Some(ckDir)) {
      Components.connectedComponents(edges, "d1", "d2")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    assert(viaReliable === expected)
    // mode actually switched: reliable checkpoints leave files behind
    assert(new java.io.File(ckDir).listFiles().nonEmpty)
    // ...and did not leak into the shared session
    assert(spark.sparkContext.getCheckpointDir.isEmpty)
  }

  test("canonicalize maps singletons to themselves and dups to cluster min") {
    val all = Seq(0L, 1L, 2L, 5L).toDF("doc_id")
    val pairs = Seq((1L, 2L)).toDF("d1", "d2")
    val out = Components.canonicalize(all, "doc_id", pairs, "d1", "d2")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(out === Set((0L, 0L, false), (1L, 1L, false),
      (2L, 1L, true), (5L, 5L, false)))
  }
}
