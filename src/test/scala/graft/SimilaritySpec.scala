package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  // two tight clusters on orthogonal axes + the queries near each
  private def embs = Seq(
    (0L, Array(1.0f, 0.05f, 0.0f, 0.0f), 0),    // query, cluster-x
    (1L, Array(0.05f, 1.0f, 0.0f, 0.0f), 1),    // query, cluster-y
    (10L, Array(0.99f, 0.0f, 0.1f, 0.0f), 0),
    (11L, Array(0.98f, 0.1f, 0.0f, 0.05f), 0),
    (12L, Array(0.0f, 0.99f, 0.1f, 0.0f), 1),
    (13L, Array(0.1f, 0.97f, 0.0f, 0.05f), 1),
    (14L, Array(0.0f, 0.0f, 1.0f, 0.0f), 2)
  ).toDF("vec_id", "embedding", "label")

  private def prepped = Similarity.prep(embs, "vec_id", "embedding")

  test("brute-force top-k returns nearest neighbors in rank order") {
    val q = prepped.filter(col("id") < 10)
    val c = prepped.filter(col("id") >= 10)
    val out = Similarity.bruteForceTopK(q, c, k = 2).collect()
      .groupBy(_.getAs[Long]("q_id"))
      .view.mapValues(_.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("n_id")).toSeq).toMap
    // 11 shares the query's small y-component -> slightly higher cosine
    assert(out(0L) === Seq(11L, 10L))
    assert(out(1L) === Seq(13L, 12L))
  }

  test("lsh buckets put near-parallel vectors together") {
    val b = Similarity.lshBuckets(prepped, nPlanes = 8, dim = 4)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("bucket")).toMap
    assert(b(0L) === b(10L))  // same orthant
    // lsh top-k candidates must carry exact cosines and valid ranks
    val q = prepped.filter(col("id") < 10)
    val c = prepped.filter(col("id") >= 10)
    val res = Similarity.lshTopK(q, c, k = 2, nPlanes = 8, dim = 4).collect()
    assert(res.nonEmpty)
    res.foreach { r =>
      assert(r.getAs[Double]("cosine") <= 1.0001 && r.getAs[Int]("rank") <= 2)
    }
  }

  test("mips top-k ranks by dot product, not cosine (magnitude wins)") {
    // corpus 20 is perfectly aligned with query 0 but tiny; corpus 21
    // is slightly off-axis but 4x longer. Cosine prefers 20, MIPS 21.
    val data = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (20L, Array(0.5f, 0.0f, 0.0f, 0.0f)),
      (21L, Array(2.0f, 0.5f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val p = Similarity.prep(data, "vec_id", "embedding")
    val q = p.filter(col("id") === 0L)
    val c = p.filter(col("id") >= 20L)
    val mips = Similarity.mipsTopK(q, c, k = 2).collect()
      .sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("n_id")).toSeq
    val cos = Similarity.bruteForceTopK(q, c, k = 2).collect()
      .sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("n_id")).toSeq
    assert(mips === Seq(21L, 20L))
    assert(cos === Seq(20L, 21L))
  }

  test("ivf routes queries to their cluster and finds its members") {
    val q = prepped.filter(col("id") < 10)
    val c = prepped.filter(col("id") >= 10)
      .join(embs.select(col("vec_id").as("id"), col("label")), "id")
    val out = Similarity.ivfTopK(q, c, "label", k = 2, nProbe = 1)
      .collect()
      .groupBy(_.getAs[Long]("q_id"))
      .view.mapValues(_.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("n_id")).toSeq).toMap
    assert(out(0L) === Seq(11L, 10L))
    assert(out(1L) === Seq(13L, 12L))
  }

  test("multi-probe recall strictly exceeds single-probe at equal table count") {
    // the s13 done-criterion: same 8-plane table, 1-bit-flip neighbor
    // probes — corpus-wide hits must strictly rise (measured 0→7 at
    // sf0.001 and 1→8 at sf0.01 when this spec was written)
    val dir = "/root/testdata/sf0.001"
    def hits(name: String): Long =
      Catalog.byName(name).build(spark, dir)
        .agg(sum("n_hits")).collect()(0).getLong(0)
    assert(hits("s13_multiprobe_recall") > hits("s06_recall_report"))
  }

  test("multi-probe candidates are a superset of single-probe's, no pair twice") {
    val q = prepped.filter(col("id") < 10)
    val c = prepped.filter(col("id") >= 10)
    val single = Similarity.lshTopK(q, c, k = 1000, nPlanes = 8, dim = 64)
      .select("q_id", "n_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val multiRows = Similarity.lshMultiProbeCandidates(q, c, nPlanes = 8, dim = 64)
      .select("q_id", "n_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(multiRows.distinct.size === multiRows.size,
      "each (query, neighbor) pair must surface through exactly one probe")
    assert(single.subsetOf(multiRows.toSet))
  }
}
