package graft.operators

import graft.Dsl._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over embedding columns
  * (SURVEY.md §2 rows 32–34).
  *
  * Scale posture: the brute-force path is the correctness baseline
  * (and is itself fine when the QUERY side is small — it broadcasts
  * the queries and streams the corpus once). The LSH and IVF paths
  * replace the corpus-wide scan with a bucket equi-join: shuffle keys
  * are (bucket) resp. (cluster), so candidate volume — not corpus
  * volume — drives cost.
  */
object Similarity {

  /** Normalize an embeddings frame to (id, v: array<double>, nrm). */
  def prep(embs: DataFrame, idCol: String, vecCol: String): DataFrame =
    embs.select(col(idCol).as("id"),
      asDoubleArray(col(vecCol)).as("v"))
      .withColumn("nrm", l2Fold(col("v")))

  private def cosine(a: Column, an: Column, b: Column, bn: Column): Column =
    dotFold(a, b) / (an * bn)

  /** Exact top-k cosine neighbors: every (query, corpus) pair scored,
    * ranked per query. Queries are broadcast — corpus is read once. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    val c = corpus.select(col("id").as("n_id"), col("v").as("cv"), col("nrm").as("cn"))
    val w = Window.partitionBy("q_id")
      .orderBy(col("cosine").desc, col("n_id"))
    broadcast(q).join(c)
      .select(col("q_id"), col("n_id"),
        cosine(col("qv"), col("qn"), col("cv"), col("cn")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Radius (range) search: every corpus vector with cosine >= the
    * threshold, per query — the "find ALL near neighbors" variant
    * top-k can't express (k is unknown a priori). Same scale shape as
    * [[bruteForceTopK]]: queries broadcast, corpus streamed once, no
    * per-query state — and no rank window at all, so the filter runs
    * entirely inside the scan's codegen stage. */
  def radiusSearch(queries: DataFrame, corpus: DataFrame,
      minCosine: Double): DataFrame = {
    val q = queries.select(col("id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    val c = corpus.select(col("id").as("n_id"), col("v").as("cv"), col("nrm").as("cn"))
    broadcast(q).join(c)
      .select(col("q_id"), col("n_id"),
        cosine(col("qv"), col("qn"), col("cv"), col("cn")).as("cosine"))
      .filter(col("cosine") >= minCosine)
  }

  /** Exact top-k by MAX INNER PRODUCT (MIPS) — the retrieval metric
    * when embedding MAGNITUDE carries signal (recommender scores,
    * unnormalized retrieval heads); cosine's normalization erases it.
    * Same scale shape as [[bruteForceTopK]]: broadcast queries, corpus
    * streamed once, per-query rank over scored rows. */
  def mipsTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("id").as("q_id"), col("v").as("qv"))
    val c = corpus.select(col("id").as("n_id"), col("v").as("cv"))
    val w = Window.partitionBy("q_id")
      .orderBy(col("dot").desc, col("n_id"))
    broadcast(q).join(c)
      .select(col("q_id"), col("n_id"), dotFold(col("qv"), col("cv")).as("dot"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Product quantization encode: split each vector into `m` equal
    * subvectors; per subspace, the codebook is [[centroids]]' label
    * means RESTRICTED to that slice, and a vector's code is its
    * nearest codeword by squared L2 (ties → smaller code). Output per
    * row: the m codes plus the total squared reconstruction error —
    * the compression-quality number (a 64-dim float vector compresses
    * to m bytes; err says what that cost).
    *
    * Scale shape: codebooks are tiny (labels × dim) and BROADCAST;
    * encoding is a per-row argmin over |codebook| candidates — the
    * corpus streams once, nothing shuffles but the (id, codes, err)
    * rows. The L2 expansion `(v·v − 2·v·c) + c·c` reuses the
    * sequential-fold dot kernel so every distance is bit-reproducible
    * (same parenthesization in the oracle). */
  def pqEncode(vectors: DataFrame, labeled: DataFrame, m: Int,
      dim: Int): DataFrame =
    pqEncodeWith(vectors,
      centroids(labeled, "label").select(col("cluster"), col("cv")),
      m, dim)

  /** [[pqEncode]] against an EXPLICIT codebook `(cluster, cv)` — the
    * entry point for encoding new vectors in a FROZEN, previously
    * persisted code space ([[AnnIndex.encodeWith]]). */
  def pqEncodeWith(vectors: DataFrame, codebook: DataFrame, m: Int,
      dim: Int): DataFrame = {
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val sub = dim / m
    val cents = codebook.select(col("cluster"), col("cv"))
    val dists = (0 until m).map { s =>
      val lo = s * sub + 1
      val vS = slice(col("v"), lo, sub)
      val cS = slice(col("cv"), lo, sub)
      (dotFold(vS, vS) - lit(2.0) * dotFold(vS, cS) + dotFold(cS, cS))
        .as(s"__d$s")
    }
    val scored = vectors.select(col("id"), col("v"))
      .join(broadcast(cents))
      .select(col("id") +: col("cluster") +: dists: _*)
    val aggs = (0 until m).map(s =>
      min(struct(col(s"__d$s").as("d"), col("cluster").as("cl")))
        .as(s"__m$s"))
    scored.groupBy("id").agg(aggs.head, aggs.tail: _*)
      .select(col("id") +:
        (0 until m).map(s => col(s"__m$s.cl").as(s"code$s")) :+
        (0 until m).map(s => col(s"__m$s.d")).reduce(_ + _).as("sq_err"): _*)
  }

  /** Deterministic ±1 random hyperplanes (LCG seed 7) for sign-LSH. */
  def hyperplanes(nPlanes: Int, dim: Int): Seq[Seq[Double]] = {
    var s = 7L
    def next(): Long = { s = s * 6364136223846793005L + 1442695040888963407L; s >>> 33 }
    Seq.fill(nPlanes)(Seq.fill(dim)(if ((next() & 1L) == 1L) 1.0 else -1.0))
  }

  /** Sign-LSH bucket id: one bit per hyperplane. */
  def lshBuckets(df: DataFrame, nPlanes: Int, dim: Int): DataFrame = {
    val planes = hyperplanes(nPlanes, dim)
    val bucket = planes.zipWithIndex.map { case (p, i) =>
      when(dotFold(col("v"), typedlit(p)) > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    df.withColumn("bucket", bucket)
  }

  /** Banded sign-LSH keys: `bands` independent groups of
    * `planesPerBand` hyperplanes; rows sharing ANY band's bucket are
    * candidates — the MinHash-banding trick applied to sign-LSH (more
    * bands = higher recall, more planes per band = fewer candidates).
    * One output row per (id, band); the (band, bucket) pair is the
    * compact candidate-join key, so downstream shuffle cost follows
    * candidate volume, never corpus². Input schema: (id, v). */
  def lshBandKeys(df: DataFrame, bands: Int, planesPerBand: Int, dim: Int): DataFrame = {
    val planes = hyperplanes(bands * planesPerBand, dim)
    val keyStructs = (0 until bands).map { b =>
      val bucket = (0 until planesPerBand).map { r =>
        when(dotFold(col("v"), typedlit(planes(b * planesPerBand + r))) > 0,
          lit(1L << r)).otherwise(lit(0L))
      }.reduce(_ + _)
      struct(lit(b).as("band"), bucket.as("bucket"))
    }
    df.select(col("id"), explode(array(keyStructs: _*)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.bucket").as("bucket"))
  }

  /** ANN via sign-LSH: candidates = same bucket, verified by exact
    * cosine, top-k per query. Equi-join on the bucket key only. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      nPlanes: Int, dim: Int): DataFrame = {
    val q = lshBuckets(queries, nPlanes, dim)
      .select(col("id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"), col("bucket"))
    val c = lshBuckets(corpus, nPlanes, dim)
      .select(col("id").as("n_id"), col("v").as("cv"), col("nrm").as("cn"), col("bucket"))
    val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("n_id"))
    q.join(c, "bucket")
      .select(col("q_id"), col("n_id"),
        cosine(col("qv"), col("qn"), col("cv"), col("cn")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Multi-probe sign-LSH ANN: each query probes its OWN bucket plus
    * every Hamming-distance-1 neighbor bucket (one hyperplane sign
    * flipped) — the standard recall knob at FIXED index size. A missed
    * true neighbor usually differs in exactly one marginal hyperplane
    * sign, so probing the `nPlanes` 1-bit-flip buckets recovers most
    * of single-probe's false negatives without building more tables;
    * candidate volume grows by at most (nPlanes+1)× of the probed
    * buckets' occupancy, and the probe explode happens on the QUERY
    * side only (queries ≪ corpus), so the corpus-side index and its
    * shuffle key stay identical to [[lshTopK]]'s. Each corpus vector
    * sits in exactly one bucket and the probe set is distinct, so no
    * candidate pair appears twice — no distinct pass needed. */
  def lshMultiProbeCandidates(queries: DataFrame, corpus: DataFrame,
      nPlanes: Int, dim: Int): DataFrame = {
    val qProbes = lshBuckets(queries, nPlanes, dim)
      .select(col("id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"),
        explode(array(col("bucket") +: (0 until nPlanes).map(i =>
          col("bucket").bitwiseXOR(lit(1L << i))): _*)).as("bucket"))
    val c = lshBuckets(corpus, nPlanes, dim)
      .select(col("id").as("n_id"), col("v").as("cv"), col("nrm").as("cn"),
        col("bucket"))
    qProbes.join(c, "bucket")
      .select(col("q_id"), col("n_id"),
        cosine(col("qv"), col("qn"), col("cv"), col("cn")).as("cosine"))
  }

  def lshMultiProbeTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      nPlanes: Int, dim: Int): DataFrame = {
    val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("n_id"))
    lshMultiProbeCandidates(queries, corpus, nPlanes, dim)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** IVF coarse quantization: centroids from a labeled partition of
    * the corpus (position-wise mean via posexplode — distributed, no
    * driver collect). The per-position mean is a SEQUENTIAL id-ordered
    * fold divided by the count, not avg(): avg's accumulation order
    * follows the physical partitioning, while an ordered left fold is
    * bit-reproducible across runs, cluster layouts, and engines.
    * Collected state per group = one cluster's values at one position,
    * bounded by cluster size — fine for IVF's ~√N-sized clusters. */
  def centroids(corpus: DataFrame, labelCol: String): DataFrame =
    corpus.select(col(labelCol).as("cluster"), col("id"),
        posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy("cluster", "pos")
      .agg((aggregate(
          transform(sort_array(collect_list(struct(col("id"), col("x")))),
            s => s.getField("x")),
          lit(0.0), (a, x) => a + x) / count(lit(1))).as("m"))
      .groupBy("cluster")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        s => s.getField("m")).as("cv"))
      .withColumn("cn", l2Fold(col("cv")))

  /** IVF ANN: route each query to its `nProbe` nearest centroids, then
    * scan only those clusters. Join keys: (cluster). */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, labelCol: String,
      k: Int, nProbe: Int): DataFrame = {
    val cents = centroids(corpus, labelCol)
    val wProbe = Window.partitionBy("q_id").orderBy(col("c_sim").desc, col("cluster"))
    val routed = queries
      .select(col("id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
      .join(broadcast(cents))
      .select(col("q_id"), col("qv"), col("qn"), col("cluster"),
        cosine(col("qv"), col("qn"), col("cv"), col("cn")).as("c_sim"))
      .withColumn("probe_rank", row_number().over(wProbe))
      .filter(col("probe_rank") <= nProbe)
      .select("q_id", "qv", "qn", "cluster")
    val c = corpus.select(col(labelCol).as("cluster"),
      col("id").as("n_id"), col("v").as("cv"), col("nrm").as("cn"))
    val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("n_id"))
    routed.join(c, "cluster")
      .select(col("q_id"), col("n_id"),
        cosine(col("qv"), col("qn"), col("cv"), col("cn")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
