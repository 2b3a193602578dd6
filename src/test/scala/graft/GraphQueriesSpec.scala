package graft

import graft.operators.Triangles
import org.apache.spark.sql.functions._

/** Value-level contracts for the graph/sequence entries (q99, q100)
  * and the round's other additions (d22, s14) beyond the smoke +
  * oracle gates. */
class GraphQueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def edgesOf(pairs: Seq[(Long, Long)]) = {
    import spark.implicits._
    pairs.toDF("u", "v")
  }

  test("q99 transition counts account for every consecutive step") {
    val out = Catalog.byName("q99_markov_transitions").build(spark, dir)
    val total = out.agg(sum("n")).head.getLong(0)
    // Σ (per-user events − 1) over users with ≥ 1 event.
    val expected = Tables(spark, dir, "events")
      .groupBy("user_id").agg(count(lit(1)).as("c"))
      .agg(sum(col("c") - lit(1))).head.getLong(0)
    assert(total === expected)
  }

  test("q99 probabilities are row-normalized per prev_type") {
    val out = Catalog.byName("q99_markov_transitions").build(spark, dir)
    val sums = out.groupBy("prev_type").agg(sum("prob").as("s"))
      .collect().map(_.getDouble(1))
    assert(sums.nonEmpty)
    sums.foreach(s => assert(math.abs(s - 1.0) < 1e-9))
  }

  test("Triangles.stats: K4 is all triangles") {
    // Complete graph on 4 nodes: 6 edges, 12 wedges, 4 triangles, cc 1.
    val k4 = edgesOf(Seq((1L, 2L), (1L, 3L), (1L, 4L),
      (2L, 3L), (2L, 4L), (3L, 4L)))
    val r = Triangles.stats(k4).head
    assert(r.getLong(0) === 4L)     // n_nodes
    assert(r.getLong(1) === 6L)     // n_edges
    assert(r.getLong(2) === 12L)    // n_wedges
    assert(r.getLong(3) === 4L)     // n_triangles
    assert(r.getDouble(4) === 1.0)  // global_cc
  }

  test("Triangles.stats: node ids past 2^32 orient correctly") {
    // The regression the sf~10 key-shifted ids exposed: the old
    // deg·2³² + node packed rank collides once ids cross 2³². Nodes
    // a = B+3 (deg 3) and b = 2B+3 (deg 2) pack to the SAME rank
    // (3B + a = 2B + b), so the wedge at c over {a, b} never fired
    // (strict tk inequality on equal keys) and the {a, b, c} triangle
    // was silently dropped. Lexicographic (deg, node) counts it.
    val B = 1L << 32
    val a = B + 3L; val b = 2L * B + 3L; val c = 5L; val d = 9L * B
    val g = edgesOf(Seq((a, b), (b, c), (c, a), (a, d)))
    val r = Triangles.stats(g).head
    assert(r.getLong(0) === 4L)
    assert(r.getLong(1) === 4L)
    assert(r.getLong(3) === 1L) // the collision-straddling triangle
  }

  test("Triangles.stats: star and path are triangle-free") {
    val star = edgesOf((2L to 6L).map(i => (1L, i)))
    val s = Triangles.stats(star).head
    assert(s.getLong(3) === 0L)
    assert(s.getLong(2) === 10L) // C(5,2) wedges at the hub
    val path = edgesOf(Seq((1L, 2L), (2L, 3L), (3L, 4L)))
    assert(Triangles.stats(path).head.getLong(3) === 0L)
  }

  test("Triangles.stats matches brute-force closure on a random graph") {
    import spark.implicits._
    // Deterministic pseudo-random graph: 40 nodes, edge (u,v) present
    // iff an LCG over the pair index bits says so (~25% density).
    val pairs = for {
      u <- 1L until 40L; v <- (u + 1) to 40L
      if ((u * 2654435761L + v * 40503L) % 97) < 24
    } yield (u, v)
    val edges = edgesOf(pairs)
    val r = Triangles.stats(edges).head
    val es = pairs.toSet
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val brute = (for {
      a <- nodes; b <- nodes if a < b; c <- nodes if b < c
      if es((a, b)) && es((b, c)) && es((a, c))
    } yield 1).size
    assert(r.getLong(3) === brute.toLong)
    assert(r.getLong(1) === pairs.size.toLong)
  }

  test("Triangles.stats: broadcast Bloom tier counts identically") {
    import spark.implicits._
    // Same random graph; bloomLitBits = 64 forces 6·m past the literal
    // tier, so the filter builds distributed and ships as a broadcast
    // (the 100 TB-scale path, where a multi-MiB word array must not
    // ride the plan as a literal). No false negatives by construction
    // — the count must match the literal-tier default exactly.
    val pairs = for {
      u <- 1L until 40L; v <- (u + 1) to 40L
      if ((u * 2654435761L + v * 40503L) % 97) < 24
    } yield (u, v)
    val edges = edgesOf(pairs)
    val want = Triangles.stats(edges).head
    val got = Triangles.stats(edges, bloomLitBits = 64).head
    assert(got === want)
    // and past bloomMaxBits the filter skips entirely — still exact
    val plain = Triangles.stats(edges, bloomLitBits = 64,
      bloomMaxBits = 64L).head
    assert(plain === want)
  }

  test("d22 nearest neighbor is the true blocked minimum") {
    val out = Catalog.byName("d22_edit_distance_nn").build(spark, dir)
      .select("doc_id", "nn_id", "nn_dist").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    // Brute force over the declared candidate semantics (same lang,
    // |Δlen| ≤ 3) — no blocking, so a block-boundary bug would show.
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        substring(col("text"), 1, 80).as("pfx"),
        length(col("text")).cast("long").as("len"))
    val brute = docs.as("a").join(docs.as("b"),
        col("a.lang") === col("b.lang") &&
          col("a.doc_id") =!= col("b.doc_id") &&
          abs(col("a.len") - col("b.len")) <= 3)
      .select(col("a.doc_id").as("doc_id"),
        col("b.doc_id").as("nbr"),
        levenshtein(col("a.pfx"), col("b.pfx")).cast("long").as("dist"))
      .groupBy("doc_id")
      .agg(min(struct(col("dist"), col("nbr"))).as("best"))
      .select(col("doc_id"), col("best.nbr"), col("best.dist")).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(out === brute)
  }

  test("t15 covers exactly the eval docs with >= 1 bigram, ratios in [0,1]") {
    val out = Catalog.byName("t15_unseen_ngrams").build(spark, dir).collect()
    val expected = Tables(spark, dir, "documents")
      .filter(graft.operators.Pipeline.idHash(col("doc_id")) % 1000 >= 800)
      .filter(size(split(col("text"), " ")) >= 2)
      .count()
    assert(out.length.toLong === expected)
    out.foreach { r =>
      val ratio = r.getAs[Double]("unseen_ratio")
      assert(ratio >= 0.0 && ratio <= 1.0)
      assert(r.getAs[Long]("n_unseen") <= r.getAs[Long]("n_bigrams"))
    }
  }

  test("s14 SQ8 recall is healthy and codes are byte-ranged") {
    val rows = Catalog.byName("s14_sq8_recall").build(spark, dir).collect()
    assert(rows.length === 10)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_exact") === 5L)
      val rec = r.getAs[Double]("recall")
      assert(rec >= 0.0 && rec <= 1.0)
    }
    // Quantization loss should not destroy ranking wholesale.
    val mean = rows.map(_.getAs[Double]("recall")).sum / rows.length
    assert(mean >= 0.5, s"mean SQ8 recall $mean collapsed")
  }
}
