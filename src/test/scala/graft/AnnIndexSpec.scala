package graft

import graft.operators.{AnnIndex, Similarity}
import org.apache.spark.sql.functions._

/** Cross-run ANN index persistence (graft.operators.AnnIndex): the
  * s15/s16 contract — probe/encode against the STORED index, never
  * rescanning the embeddings that built it — plus probe-of-stored ≡
  * in-process equality and the dynamic-partition-pruning shape of the
  * postings scan. */
class AnnIndexSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def tmpStore(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_annidx_$tag")
      .toString + "/store"

  private def prepped = {
    val embs = Tables(spark, dir, "embeddings")
    Similarity.prep(embs, "vec_id", "embedding")
      .join(embs.select(col("vec_id").as("id"), col("label")), "id")
  }

  test("probe of the stored IVF index equals the in-process build") {
    val store = tmpStore("ivf")
    val all = prepped
    val queries = all.filter(col("id") < 10).drop("label")
    val corpus = all.filter(col("id") >= 10)
    AnnIndex.writeIvf(corpus, "label", store)
    val stored = AnnIndex.probeIvf(spark, store, queries, k = 5, nProbe = 2)
      .orderBy("q_id", "rank").collect()
    val direct = Similarity.ivfTopK(queries, corpus, "label", k = 5, nProbe = 2)
      .orderBy("q_id", "rank").collect()
    assert(stored.length == direct.length && stored.length > 0)
    stored.zip(direct).foreach { case (a, b) => assert(a == b) }
  }

  test("postings are cluster-partitioned and the probe prunes them dynamically") {
    val store = tmpStore("dpp")
    val all = prepped
    AnnIndex.writeIvf(all.filter(col("id") >= 10), "label", store)
    // partition layout on disk: one directory per cluster
    val dirs = new java.io.File(store + "/postings").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("cluster="))
    assert(dirs.length == 10, s"expected 10 cluster dirs, got ${dirs.toSeq}")
    val queries = all.filter(col("id") < 10).drop("label")
    val p = AnnIndex.probeIvf(spark, store, queries, k = 5, nProbe = 2)
      .queryExecution.executedPlan.toString
    // the routed broadcast must drive dynamic partition pruning on the
    // postings scan — only probed clusters' files open at scale
    assert(p.contains("dynamicpruning"),
      s"postings scan must be dynamically pruned:\n${p.take(3000)}")
  }

  test("encode against the stored codebook equals the in-process encode") {
    val store = tmpStore("pq")
    val all = prepped
    val first = all.filter(col("id") % 2 === 0)
    AnnIndex.writePq(first.select("id", "v"), first, m = 2, dim = 64, store)
    val rest = all.filter(col("id") % 2 =!= 0).select("id", "v")
    val stored = AnnIndex.encodeWith(spark, store, rest, m = 2, dim = 64)
      .orderBy("id").collect()
    val direct = Similarity.pqEncodeWith(rest,
        Similarity.centroids(first, "label")
          .select(col("cluster"), col("cv")),
        m = 2, dim = 64)
      .orderBy("id").collect()
    assert(stored.length == direct.length && stored.length > 0)
    stored.zip(direct).foreach { case (a, b) => assert(a == b) }
  }

  test("appendVectors grows the store atomically and equals the manual union") {
    val store = tmpStore("app")
    val all = prepped
    val first = all.filter(col("id") >= 10 && col("id") % 2 === 0)
    val second = all.filter(col("id") >= 10 && col("id") % 2 =!= 0)
      .drop("label")
    AnnIndex.writeIvf(first, "label", store)
    val expect = AnnIndex.readPostings(spark, store)
      .unionByName(AnnIndex.assignToStored(spark, store, second))
      .orderBy("n_id")
      .collect().map(r => (r.getLong(r.fieldIndex("n_id")),
        r.getInt(r.fieldIndex("cluster"))))
    AnnIndex.appendVectors(spark, store, second)
    // stage/old scratch gone, live store partition-pruned layout kept
    assert(!new java.io.File(store + "__stage").exists())
    assert(!new java.io.File(store + "__old").exists())
    assert(new java.io.File(store + "/postings").listFiles()
      .exists(f => f.getName.startsWith("cluster=")))
    val grown = AnnIndex.readPostings(spark, store).orderBy("n_id")
      .collect().map(r => (r.getLong(r.fieldIndex("n_id")),
        r.getInt(r.fieldIndex("cluster"))))
    assert(grown.toSeq === expect.toSeq)
    // centroids untouched: the code space must not move on ingest
    val cents = AnnIndex.readCentroids(spark, store).count()
    assert(cents == 10)
  }

  test("s15/s16/s17 entry plans read the store and landing file, never embeddings.parquet") {
    for ((name, store, land) <- Seq(
      ("s15_persisted_ivf", "s15_store_", "s15_land_"),
      ("s16_incremental_pq", "s16_store_", "s16_land_"),
      ("s17_ivf_append", "s17_store_", "s17_q_"))) {
      val df = Catalog.byName(name).build(spark, dir)
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("embeddings.parquet"),
        s"$name: the indexed corpus must not be rescanned:\n${p.take(3000)}")
      assert(p.contains(store), s"$name plan must read the persisted store")
      assert(p.contains(land), s"$name plan must read the landing file")
      assert(df.count() > 0)
    }
  }
}
