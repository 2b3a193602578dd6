package graft.queries

import graft.{QueryDef, Tables}
import graft.Dsl.dotFold
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Similarity-search suite over the embeddings table (SURVEY.md §2
  * rows 32–34): query set = vec_id < 10, corpus = the rest.
  */
object SimilarityQueries {

  private val foldDot =
    "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(list_zip(%s, %s), x -> x[1] * x[2])), (a, b) -> a + b)"

  /** The s02 sign-LSH bucket id, in DuckDB SQL: one bit per
    * deterministic hyperplane, reproduced from the same
    * [[Similarity.hyperplanes]] the Spark side uses. */
  private def bucketSql(nPlanes: Int, dim: Int): String = {
    def planeLit(p: Seq[Double]): String =
      p.map(x => if (x > 0) "1.0" else "-1.0").mkString("[", ", ", "]")
    Similarity.hyperplanes(nPlanes, dim).zipWithIndex.map { case (p, i) =>
      s"(CASE WHEN ${foldDot.format("v", s"${planeLit(p)}::DOUBLE[]")} > 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString("(", " + ", ")")
  }

  /** Brute-force exact cosine top-5 — the ANN correctness baseline. */
  val s01 = QueryDef(
    "s01_cosine_topk",
    (sp, dir) => {
      val all = Similarity.prep(Tables(sp, dir, "embeddings"), "vec_id", "embedding")
      val queries = all.filter(col("id") < 10)
      val corpus = all.filter(col("id") >= 10)
      Similarity.bruteForceTopK(queries, corpus, k = 5)
        .orderBy("q_id", "rank")
    },
    Some(s"""
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
      n AS (SELECT vec_id, v, sqrt(${foldDot.format("v", "v")}) nrm FROM e),
      q AS (SELECT vec_id q_id, v qv, nrm qn FROM n WHERE vec_id < 10),
      c AS (SELECT vec_id n_id, v cv, nrm cn FROM n WHERE vec_id >= 10),
      s AS (SELECT q_id, n_id, ${foldDot.format("qv", "cv")} / (qn * cn) AS cosine
            FROM q CROSS JOIN c),
      r AS (SELECT q_id, n_id, cosine,
              ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) rnk
            FROM s)
      SELECT q_id, n_id, cosine, CAST(rnk AS INT) AS rank
      FROM r WHERE rnk <= 5 ORDER BY q_id, rank"""))

  /** Sign-LSH bucketed ANN (8 hyperplanes → 256 buckets); candidates
    * share the query's bucket, verified by exact cosine. Oracle
    * reproduces the buckets from the same deterministic hyperplanes. */
  val s02 = QueryDef(
    "s02_lsh_ann",
    (sp, dir) => {
      val all = Similarity.prep(Tables(sp, dir, "embeddings"), "vec_id", "embedding")
      val queries = all.filter(col("id") < 10)
      val corpus = all.filter(col("id") >= 10)
      Similarity.lshTopK(queries, corpus, k = 5, nPlanes = 8, dim = 64)
        .orderBy("q_id", "rank")
    },
    Some {
      s"""
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
      n AS (SELECT vec_id, v, sqrt(${foldDot.format("v", "v")}) nrm,
              ${bucketSql(8, 64)} AS bucket
            FROM e),
      q AS (SELECT vec_id q_id, v qv, nrm qn, bucket FROM n WHERE vec_id < 10),
      c AS (SELECT vec_id n_id, v cv, nrm cn, bucket FROM n WHERE vec_id >= 10),
      s AS (SELECT q_id, n_id, ${foldDot.format("qv", "cv")} / (qn * cn) AS cosine
            FROM q JOIN c USING (bucket)),
      r AS (SELECT q_id, n_id, cosine,
              ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) rnk
            FROM s)
      SELECT q_id, n_id, cosine, CAST(rnk AS INT) AS rank
      FROM r WHERE rnk <= 5 ORDER BY q_id, rank"""
    })

  /** IVF coarse-quantized ANN: centroid per label partition, probe
    * the 2 nearest clusters. Centroids are id-ordered sequential-fold
    * means (bit-reproducible), so the full chain — quantize, route,
    * probe, verify — has an exact DuckDB oracle. */
  val s03 = QueryDef(
    "s03_ivf_ann",
    (sp, dir) => {
      val embs = Tables(sp, dir, "embeddings")
      val all = Similarity.prep(embs, "vec_id", "embedding")
        .join(embs.select(col("vec_id").as("id"), col("label")), "id")
      val queries = all.filter(col("id") < 10).drop("label")
      val corpus = all.filter(col("id") >= 10)
      Similarity.ivfTopK(queries, corpus, "label", k = 5, nProbe = 2)
        .orderBy("q_id", "rank")
    },
    Some(s"""
      WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] v FROM embeddings),
      n AS (SELECT vec_id, label, v, sqrt(${foldDot.format("v", "v")}) nrm FROM e),
      q AS (SELECT vec_id q_id, v qv, nrm qn FROM n WHERE vec_id < 10),
      c AS (SELECT vec_id n_id, label cl, v cv, nrm cn FROM n WHERE vec_id >= 10),
      cx AS (SELECT n_id, cl,
               unnest(list_transform(cv, (x, i) -> {'pos': i - 1, 'x': x}),
                 recursive := true)
             FROM c),
      cm AS (SELECT cl, pos,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list(x ORDER BY n_id)), (a, b) -> a + b) / COUNT(*) AS m
             FROM cx GROUP BY cl, pos),
      cents AS (SELECT cl, list(m ORDER BY pos) AS cv FROM cm
                GROUP BY cl),
      cn AS (SELECT cl, cv, sqrt(${foldDot.format("cv", "cv")}) AS cn
             FROM cents),
      probe AS (SELECT q_id, qv, qn, cl,
                  ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY
                    ${foldDot.format("qv", "cv")} / (qn * cn.cn) DESC, cl)
                    AS probe_rank
                FROM q CROSS JOIN cn),
      routed AS (SELECT q_id, qv, qn, cl FROM probe WHERE probe_rank <= 2),
      s AS (SELECT q_id, n_id, ${foldDot.format("qv", "cv")} / (qn * cn) AS cosine
            FROM routed r JOIN c USING (cl)),
      r AS (SELECT q_id, n_id, cosine,
              ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) rnk
            FROM s)
      SELECT q_id, n_id, cosine, CAST(rnk AS INT) AS rank
      FROM r WHERE rnk <= 5 ORDER BY q_id, rank"""))

  /** kNN classification on top of the similarity search: majority
    * label among each query's 10 exact nearest neighbors (ties broken
    * toward the smaller label — engines disagree on native mode()'s
    * tie rule, so the vote is spelled out). The neighbor join carries
    * only (n_id → label): candidate volume, not corpus volume, crosses
    * the wire after the top-k cut. */
  val s04 = QueryDef(
    "s04_knn_classify",
    (sp, dir) => {
      val embs = Tables(sp, dir, "embeddings")
      val all = Similarity.prep(embs, "vec_id", "embedding")
      val queries = all.filter(col("id") < 10)
      val corpus = all.filter(col("id") >= 10)
      val labels = embs.select(col("vec_id").as("n_id"), col("label"))
      val votes = Similarity.bruteForceTopK(queries, corpus, k = 10)
        .join(labels, "n_id")
        .groupBy("q_id", "label")
        .agg(count(lit(1)).as("n_votes"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("q_id").orderBy(col("n_votes").desc, col("label"))
      val pred = votes.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col("q_id"), col("label").as("pred_label"), col("n_votes"))
      pred
        .join(embs.select(col("vec_id").as("q_id"),
          col("label").as("true_label")), "q_id")
        .withColumn("correct", col("pred_label") === col("true_label"))
        .orderBy("q_id")
    },
    Some(s"""
      WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] v FROM embeddings),
      n AS (SELECT vec_id, label, v, sqrt(${foldDot.format("v", "v")}) nrm FROM e),
      q AS (SELECT vec_id q_id, v qv, nrm qn FROM n WHERE vec_id < 10),
      c AS (SELECT vec_id n_id, label, v cv, nrm cn FROM n WHERE vec_id >= 10),
      s AS (SELECT q_id, n_id, label,
              ${foldDot.format("qv", "cv")} / (qn * cn) AS cosine
            FROM q CROSS JOIN c),
      r AS (SELECT q_id, n_id, label,
              ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) rnk
            FROM s),
      v AS (SELECT q_id, label, COUNT(*) n_votes FROM r WHERE rnk <= 10
            GROUP BY q_id, label),
      p AS (SELECT q_id, label, n_votes,
              ROW_NUMBER() OVER (PARTITION BY q_id
                ORDER BY n_votes DESC, label) vr
            FROM v)
      SELECT p.q_id, p.label AS pred_label, CAST(p.n_votes AS BIGINT) AS n_votes,
        e.label AS true_label, p.label = e.label AS correct
      FROM p JOIN e ON p.q_id = e.vec_id
      WHERE vr = 1 ORDER BY q_id"""))

  /** Cosine radius search ([[Similarity.radiusSearch]]): ALL corpus
    * vectors within the threshold, per query — the range variant of
    * s01 (k unknown a priori; no rank window, pure codegen filter). */
  val s05 = QueryDef(
    "s05_radius_search",
    (sp, dir) => {
      val all = Similarity.prep(Tables(sp, dir, "embeddings"), "vec_id", "embedding")
      val queries = all.filter(col("id") < 10)
      val corpus = all.filter(col("id") >= 10)
      Similarity.radiusSearch(queries, corpus, minCosine = 0.15)
        .orderBy("q_id", "n_id")
    },
    Some(s"""
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
      n AS (SELECT vec_id, v, sqrt(${foldDot.format("v", "v")}) nrm FROM e),
      q AS (SELECT vec_id q_id, v qv, nrm qn FROM n WHERE vec_id < 10),
      c AS (SELECT vec_id n_id, v cv, nrm cn FROM n WHERE vec_id >= 10)
      SELECT q_id, n_id, ${foldDot.format("qv", "cv")} / (qn * cn) AS cosine
      FROM q CROSS JOIN c
      WHERE ${foldDot.format("qv", "cv")} / (qn * cn) >= 0.15
      ORDER BY q_id, n_id"""))

  /** ANN quality evaluation: per-query recall@5 of the LSH index (s02)
    * against exact brute force (s01) — the report every ANN deployment
    * ships next to its index build. A left-semi join counts the
    * overlap; queries whose bucket starved still appear (zero recall),
    * via the left join from the exact side. Recall is a single double
    * division of two small ints — deterministic. */
  val s06 = QueryDef(
    "s06_recall_report",
    (sp, dir) => {
      val all = Similarity.prep(Tables(sp, dir, "embeddings"), "vec_id", "embedding")
      val queries = all.filter(col("id") < 10)
      val corpus = all.filter(col("id") >= 10)
      val exact = Similarity.bruteForceTopK(queries, corpus, k = 5)
        .select("q_id", "n_id")
      val approx = Similarity.lshTopK(queries, corpus, k = 5, nPlanes = 8, dim = 64)
        .select(col("q_id"), col("n_id"))
      val hits = exact.join(approx, Seq("q_id", "n_id"), "left_semi")
        .groupBy("q_id").agg(count(lit(1)).as("n_hits"))
      val nApprox = approx.groupBy("q_id").agg(count(lit(1)).as("n_lsh"))
      exact.groupBy("q_id").agg(count(lit(1)).as("n_exact"))
        .join(nApprox, Seq("q_id"), "left")
        .join(hits, Seq("q_id"), "left")
        .select(col("q_id"), col("n_exact"),
          coalesce(col("n_lsh"), lit(0L)).as("n_lsh"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"),
          (coalesce(col("n_hits"), lit(0L)) / lit(5.0)).as("recall"))
        .orderBy("q_id")
    },
    Some(s"""
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
      n AS (SELECT vec_id, v, sqrt(${foldDot.format("v", "v")}) nrm,
              ${bucketSql(8, 64)} AS bucket
            FROM e),
      q AS (SELECT vec_id q_id, v qv, nrm qn, bucket FROM n WHERE vec_id < 10),
      c AS (SELECT vec_id n_id, v cv, nrm cn, bucket FROM n WHERE vec_id >= 10),
      xs AS (SELECT q_id, n_id, ${foldDot.format("qv", "cv")} / (qn * cn) AS cosine
             FROM q CROSS JOIN c),
      xr AS (SELECT q_id, n_id,
               ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) rnk
             FROM xs),
      exact AS (SELECT q_id, n_id FROM xr WHERE rnk <= 5),
      ls AS (SELECT q_id, n_id, ${foldDot.format("qv", "cv")} / (qn * cn) AS cosine
             FROM q JOIN c USING (bucket)),
      lr AS (SELECT q_id, n_id,
               ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) rnk
             FROM ls),
      approx AS (SELECT q_id, n_id FROM lr WHERE rnk <= 5),
      hits AS (SELECT q_id, COUNT(*) AS n_hits FROM exact
               WHERE EXISTS (SELECT 1 FROM approx a
                             WHERE a.q_id = exact.q_id AND a.n_id = exact.n_id)
               GROUP BY q_id),
      napprox AS (SELECT q_id, COUNT(*) AS n_lsh FROM approx GROUP BY q_id)
      SELECT x.q_id, CAST(COUNT(*) AS BIGINT) AS n_exact,
        CAST(COALESCE(MIN(napprox.n_lsh), 0) AS BIGINT) AS n_lsh,
        CAST(COALESCE(MIN(hits.n_hits), 0) AS BIGINT) AS n_hits,
        CAST(COALESCE(MIN(hits.n_hits), 0) AS DOUBLE) / CAST(5.0 AS DOUBLE)
          AS recall
      FROM exact x
      LEFT JOIN napprox ON napprox.q_id = x.q_id
      LEFT JOIN hits ON hits.q_id = x.q_id
      GROUP BY x.q_id ORDER BY x.q_id"""))

  /** Exact MIPS (max-inner-product) top-5 — the unnormalized metric
    * next to s01's cosine: magnitude-aware retrieval scoring. The dot
    * products ride the same native fold kernel (RewriteDotFold), and
    * the oracle replays them with the list_zip fold. Top-k ordering
    * breaks ties on the neighbor id, so ranks are total. */
  val s07 = QueryDef(
    "s07_mips_topk",
    (sp, dir) => {
      val all = Similarity.prep(Tables(sp, dir, "embeddings"), "vec_id", "embedding")
      val queries = all.filter(col("id") < 10)
      val corpus = all.filter(col("id") >= 10)
      Similarity.mipsTopK(queries, corpus, k = 5)
        .orderBy("q_id", "rank")
    },
    Some(s"""
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
      q AS (SELECT vec_id q_id, v qv FROM e WHERE vec_id < 10),
      c AS (SELECT vec_id n_id, v cv FROM e WHERE vec_id >= 10),
      s AS (SELECT q_id, n_id, ${foldDot.format("qv", "cv")} AS dot
            FROM q CROSS JOIN c),
      r AS (SELECT q_id, n_id, dot,
              ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY dot DESC, n_id) rnk
            FROM s)
      SELECT q_id, n_id, dot, CAST(rnk AS INT) AS rank
      FROM r WHERE rnk <= 5 ORDER BY q_id, rank"""))

  /** Product-quantization encode (`Similarity.pqEncode`): 64-dim
    * float vectors compress to TWO byte-sized codes (32-dim subspaces,
    * label-mean codebooks) plus the squared reconstruction error the
    * compression cost. One broadcast of the tiny codebook, one
    * aggregation shuffle of narrow (id, distance, code) rows — the
    * argmin is `min(struct(dist, code))`, map-side combinable, never a
    * per-id sort. Distances ride the sequential-fold dot kernel with
    * the oracle's exact parenthesization. */
  val s08 = QueryDef(
    "s08_pq_encode",
    (sp, dir) => {
      val embs = Tables(sp, dir, "embeddings")
      val all = Similarity.prep(embs, "vec_id", "embedding")
      val labeled = all.join(
        embs.select(col("vec_id").as("id"), col("label")), "id")
      Similarity.pqEncode(all, labeled, m = 2, dim = 64)
        .orderBy("id")
    },
    Some(s"""
      WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] v FROM embeddings),
      cx AS (SELECT vec_id, label,
               unnest(list_transform(v, (x, i) -> {'pos': i - 1, 'x': x}),
                 recursive := true)
             FROM e),
      cm AS (SELECT label AS cl, pos,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list(x ORDER BY vec_id)), (a, b) -> a + b) / COUNT(*) AS m
             FROM cx GROUP BY cl, pos),
      cents AS (SELECT cl, list(m ORDER BY pos) AS cv FROM cm GROUP BY cl),
      pairs AS (SELECT vec_id, cl,
          ${foldDot.format("list_slice(v, 1, 32)", "list_slice(v, 1, 32)")}
            - 2.0 * ${foldDot.format("list_slice(v, 1, 32)", "list_slice(cv, 1, 32)")}
            + ${foldDot.format("list_slice(cv, 1, 32)", "list_slice(cv, 1, 32)")} AS d0,
          ${foldDot.format("list_slice(v, 33, 64)", "list_slice(v, 33, 64)")}
            - 2.0 * ${foldDot.format("list_slice(v, 33, 64)", "list_slice(cv, 33, 64)")}
            + ${foldDot.format("list_slice(cv, 33, 64)", "list_slice(cv, 33, 64)")} AS d1
        FROM e CROSS JOIN cents),
      b0 AS (SELECT vec_id, cl AS code0, d0 FROM (
               SELECT vec_id, cl, d0,
                 ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d0, cl) rn
               FROM pairs) WHERE rn = 1),
      b1 AS (SELECT vec_id, cl AS code1, d1 FROM (
               SELECT vec_id, cl, d1,
                 ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d1, cl) rn
               FROM pairs) WHERE rn = 1)
      SELECT b0.vec_id AS id, code0, code1, d0 + d1 AS sq_err
      FROM b0 JOIN b1 ON b0.vec_id = b1.vec_id
      ORDER BY id"""))

  /** Multi-vector late-interaction scoring (ColBERT-style MaxSim):
    * query tokens = the 10 query vectors grouped into 2 query docs,
    * corpus docs = vec_id mod 50 groups; score(Q, D) = Σ over Q's
    * tokens of the max cosine against D's tokens, top-3 docs per
    * query. The per-token maxima aggregate map-side; the Σ runs in
    * DECIMAL over round(6)-guarded maxima, so token order can't
    * perturb the double sum (SURVEY §4). */
  val s09 = QueryDef(
    "s09_maxsim",
    (sp, dir) => {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.types.DecimalType
      val all = Similarity.prep(Tables(sp, dir, "embeddings"), "vec_id", "embedding")
      val q = all.filter(col("id") < 10)
        .select((col("id") % 2).as("qdoc"), col("id").as("q_id"),
          col("v").as("qv"), col("nrm").as("qn"))
      val c = all.filter(col("id") >= 10)
        .select((col("id") % 50).as("cdoc"), col("id").as("n_id"),
          col("v").as("cv"), col("nrm").as("cn"))
      val mx = broadcast(q).join(c)
        .select(col("qdoc"), col("q_id"), col("cdoc"),
          (dotFold(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cos"))
        .groupBy("qdoc", "q_id", "cdoc").agg(max(col("cos")).as("mx"))
      val w = Window.partitionBy("qdoc").orderBy(col("maxsim").desc, col("cdoc"))
      mx.groupBy("qdoc", "cdoc")
        .agg(sum(round(col("mx"), 6).cast(DecimalType(18, 6)))
          .cast("double").as("maxsim"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .orderBy("qdoc", "rank")
    },
    Some(s"""
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
      n AS (SELECT vec_id, v, sqrt(${foldDot.format("v", "v")}) nrm FROM e),
      q AS (SELECT vec_id % 2 AS qdoc, vec_id q_id, v qv, nrm qn
            FROM n WHERE vec_id < 10),
      c AS (SELECT vec_id % 50 AS cdoc, vec_id n_id, v cv, nrm cn
            FROM n WHERE vec_id >= 10),
      mx AS (SELECT qdoc, q_id, cdoc,
               MAX(${foldDot.format("qv", "cv")} / (qn * cn)) AS mx
             FROM q CROSS JOIN c GROUP BY qdoc, q_id, cdoc),
      sc AS (SELECT qdoc, cdoc,
               CAST(SUM(CAST(ROUND(mx, 6) AS DECIMAL(18,6))) AS DOUBLE)
                 AS maxsim
             FROM mx GROUP BY qdoc, cdoc),
      r AS (SELECT qdoc, cdoc, maxsim,
              ROW_NUMBER() OVER (PARTITION BY qdoc
                ORDER BY maxsim DESC, cdoc) rnk
            FROM sc)
      SELECT qdoc, cdoc, maxsim, CAST(rnk AS INT) AS rank
      FROM r WHERE rnk <= 3 ORDER BY qdoc, rank"""))

  /** IVF recall evaluation — s06's twin for the OTHER index: per-query
    * recall@5 of the cluster-routed IVF search (nProbe = 2) against
    * the exact baseline. Together s06/s10 complete the eval matrix:
    * every approximate index in the catalog carries its own measured
    * recall. n_ivf can fall below 5 when the probed clusters hold
    * fewer than k corpus vectors — surfaced, not padded. */
  val s10 = QueryDef(
    "s10_ivf_recall",
    (sp, dir) => {
      val embs = Tables(sp, dir, "embeddings")
      val all = Similarity.prep(embs, "vec_id", "embedding")
      val labeled = all.join(
        embs.select(col("vec_id").as("id"), col("label")), "id")
      val queries = all.filter(col("id") < 10)
      val corpus = labeled.filter(col("id") >= 10)
      val exact = Similarity.bruteForceTopK(queries, corpus.drop("label"), 5)
        .select("q_id", "n_id")
      val approx = Similarity.ivfTopK(queries, corpus, "label",
          k = 5, nProbe = 2)
        .select(col("q_id"), col("n_id"))
      val hits = exact.join(approx, Seq("q_id", "n_id"), "left_semi")
        .groupBy("q_id").agg(count(lit(1)).as("n_hits"))
      val nApprox = approx.groupBy("q_id").agg(count(lit(1)).as("n_ivf"))
      exact.groupBy("q_id").agg(count(lit(1)).as("n_exact"))
        .join(nApprox, Seq("q_id"), "left")
        .join(hits, Seq("q_id"), "left")
        .select(col("q_id"), col("n_exact"),
          coalesce(col("n_ivf"), lit(0L)).as("n_ivf"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"),
          (coalesce(col("n_hits"), lit(0L)) / lit(5.0)).as("recall"))
        .orderBy("q_id")
    },
    Some(s"""
      WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] v FROM embeddings),
      n AS (SELECT vec_id, label, v, sqrt(${foldDot.format("v", "v")}) nrm FROM e),
      q AS (SELECT vec_id q_id, v qv, nrm qn FROM n WHERE vec_id < 10),
      c AS (SELECT vec_id n_id, label cl, v cv, nrm cn FROM n WHERE vec_id >= 10),
      xs AS (SELECT q_id, n_id, ${foldDot.format("qv", "cv")} / (qn * cn) AS cosine
             FROM q CROSS JOIN c),
      xr AS (SELECT q_id, n_id,
               ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) rnk
             FROM xs),
      exact AS (SELECT q_id, n_id FROM xr WHERE rnk <= 5),
      cx AS (SELECT n_id, cl,
               unnest(list_transform(cv, (x, i) -> {'pos': i - 1, 'x': x}),
                 recursive := true)
             FROM c),
      cm AS (SELECT cl, pos,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list(x ORDER BY n_id)), (a, b) -> a + b) / COUNT(*) AS m
             FROM cx GROUP BY cl, pos),
      cents AS (SELECT cl, list(m ORDER BY pos) AS cv FROM cm GROUP BY cl),
      cn AS (SELECT cl, cv, sqrt(${foldDot.format("cv", "cv")}) AS cn
             FROM cents),
      probe AS (SELECT q_id, qv, qn, cl,
                  ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY
                    ${foldDot.format("qv", "cv")} / (qn * cn.cn) DESC, cl)
                    AS probe_rank
                FROM q CROSS JOIN cn),
      routed AS (SELECT q_id, qv, qn, cl FROM probe WHERE probe_rank <= 2),
      s AS (SELECT q_id, n_id, ${foldDot.format("qv", "cv")} / (qn * cn) AS cosine
            FROM routed r JOIN c USING (cl)),
      ar AS (SELECT q_id, n_id,
               ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) rnk
             FROM s),
      approx AS (SELECT q_id, n_id FROM ar WHERE rnk <= 5),
      hits AS (SELECT q_id, COUNT(*) AS n_hits FROM exact
               WHERE EXISTS (SELECT 1 FROM approx a
                             WHERE a.q_id = exact.q_id AND a.n_id = exact.n_id)
               GROUP BY q_id),
      napprox AS (SELECT q_id, COUNT(*) AS n_ivf FROM approx GROUP BY q_id)
      SELECT x.q_id, CAST(COUNT(*) AS BIGINT) AS n_exact,
        CAST(COALESCE(MIN(napprox.n_ivf), 0) AS BIGINT) AS n_ivf,
        CAST(COALESCE(MIN(hits.n_hits), 0) AS BIGINT) AS n_hits,
        CAST(COALESCE(MIN(hits.n_hits), 0) AS DOUBLE) / CAST(5.0 AS DOUBLE)
          AS recall
      FROM exact x
      LEFT JOIN napprox ON napprox.q_id = x.q_id
      LEFT JOIN hits ON hits.q_id = x.q_id
      GROUP BY x.q_id ORDER BY x.q_id"""))

  /** Embedding drift monitor: per-label centroid distance between two
    * corpus halves (odd/even vec_ids) — the MLOps number that says
    * "this label's embedding distribution moved between snapshots".
    * Centroids are the fold-deterministic per-position means
    * (s03's machinery, once per half); the squared distance expands
    * through the sequential-fold dot kernel as `(a·a − 2·a·b) + b·b`,
    * bit-identical to the oracle. Both centroid tables are tiny —
    * the labels×dim state never depends on corpus size. */
  val s11 = QueryDef(
    "s11_centroid_drift",
    (sp, dir) => {
      val embs = Tables(sp, dir, "embeddings")
      val all = Similarity.prep(embs, "vec_id", "embedding")
        .join(embs.select(col("vec_id").as("id"), col("label")), "id")
      def cents(half: Int) =
        Similarity.centroids(all.filter(pmod(col("id"), lit(2)) === half),
            "label")
          .select(col("cluster"), col("cv").as(s"cv$half"),
            col("cn").as(s"__n$half"))
      cents(0).join(cents(1), "cluster")
        .select(col("cluster").as("label"),
          (dotFold(col("cv0"), col("cv0"))
            - lit(2.0) * dotFold(col("cv0"), col("cv1"))
            + dotFold(col("cv1"), col("cv1"))).as("sq_drift"))
        .orderBy("label")
    },
    Some(s"""
      WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] v FROM embeddings),
      cx AS (SELECT vec_id, label, vec_id % 2 AS half,
               unnest(list_transform(v, (x, i) -> {'pos': i - 1, 'x': x}),
                 recursive := true)
             FROM e),
      cm AS (SELECT label, half, pos,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list(x ORDER BY vec_id)), (a, b) -> a + b) / COUNT(*) AS m
             FROM cx GROUP BY label, half, pos),
      cents AS (SELECT label, half, list(m ORDER BY pos) AS cv
                FROM cm GROUP BY label, half),
      c0 AS (SELECT label, cv AS cv0 FROM cents WHERE half = 0),
      c1 AS (SELECT label, cv AS cv1 FROM cents WHERE half = 1)
      SELECT c0.label,
        ${foldDot.format("cv0", "cv0")}
          - 2.0 * ${foldDot.format("cv0", "cv1")}
          + ${foldDot.format("cv1", "cv1")} AS sq_drift
      FROM c0 JOIN c1 ON c0.label = c1.label
      ORDER BY c0.label"""))

  /** PQ asymmetric-distance (ADC) search + recall — the payoff of
    * s08's codes: each query scores the COMPRESSED corpus by summing
    * per-subspace distances to the two codewords (a 10×|codebook|
    * lookup table per subspace, broadcast), never touching corpus
    * vectors; recall@5 is measured against the exact L2 top-5. This
    * closes the PQ loop (encode s08 → search → eval) the way s02/s06
    * and s03/s10 close LSH and IVF. At scale the scored relation is
    * (corpus codes ⋈ broadcast lookup) — bytes per vector, not
    * floats. */
  val s12 = QueryDef(
    "s12_pq_adc_search",
    (sp, dir) => {
      import org.apache.spark.sql.expressions.Window
      val embs = Tables(sp, dir, "embeddings")
      val all = Similarity.prep(embs, "vec_id", "embedding")
      val labeled = all.join(
        embs.select(col("vec_id").as("id"), col("label")), "id")
      val queries = all.filter(col("id") < 10)
      val corpus = all.filter(col("id") >= 10)
      val corpusL = labeled.filter(col("id") >= 10)
      val codes = Similarity.pqEncode(corpus, corpusL, m = 2, dim = 64)
        .select(col("id").as("n_id"), col("code0"), col("code1"))
      val cents = Similarity.centroids(corpusL, "label")
        .select(col("cluster"), col("cv"))
      def qdist(s: Int) = {
        val lo = s * 32 + 1
        val qS = slice(col("v"), lo, 32)
        val cS = slice(col("cv"), lo, 32)
        queries.select(col("id").as("q_id"), col("v"))
          .join(broadcast(cents))
          .select(col("q_id"), col("cluster").as(s"code$s"),
            (dotFold(qS, qS) - lit(2.0) * dotFold(qS, cS) +
              dotFold(cS, cS)).as(s"qd$s"))
      }
      val approx = codes
        .join(broadcast(qdist(0)), Seq("code0"))
        .join(broadcast(qdist(1)), Seq("q_id", "code1"))
        .select(col("q_id"), col("n_id"), (col("qd0") + col("qd1")).as("ad"))
      val wA = Window.partitionBy("q_id").orderBy(col("ad").asc, col("n_id"))
      val approxTop = approx.withColumn("rk", row_number().over(wA))
        .filter(col("rk") <= 5).select("q_id", "n_id")
      val ex = broadcast(queries.select(col("id").as("q_id"), col("v").as("qv")))
        .join(corpus.select(col("id").as("n_id"), col("v").as("cv")))
        .select(col("q_id"), col("n_id"),
          (dotFold(col("qv"), col("qv"))
            - lit(2.0) * dotFold(col("qv"), col("cv"))
            + dotFold(col("cv"), col("cv"))).as("d2"))
      val wE = Window.partitionBy("q_id").orderBy(col("d2").asc, col("n_id"))
      val exactTop = ex.withColumn("rk", row_number().over(wE))
        .filter(col("rk") <= 5).select("q_id", "n_id")
      val hits = exactTop.join(approxTop, Seq("q_id", "n_id"), "left_semi")
        .groupBy("q_id").agg(count(lit(1)).as("n_hits"))
      exactTop.groupBy("q_id").agg(count(lit(1)).as("n_exact"))
        .join(hits, Seq("q_id"), "left")
        .select(col("q_id"), col("n_exact"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"),
          (coalesce(col("n_hits"), lit(0L)) / lit(5.0)).as("recall"))
        .orderBy("q_id")
    },
    Some(s"""
      WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] v FROM embeddings),
      q AS (SELECT vec_id q_id, v FROM e WHERE vec_id < 10),
      c AS (SELECT vec_id n_id, label, v FROM e WHERE vec_id >= 10),
      cx AS (SELECT n_id, label,
               unnest(list_transform(v, (x, i) -> {'pos': i - 1, 'x': x}),
                 recursive := true)
             FROM c),
      cm AS (SELECT label AS cl, pos,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list(x ORDER BY n_id)), (a, b) -> a + b) / COUNT(*) AS m
             FROM cx GROUP BY cl, pos),
      cents AS (SELECT cl, list(m ORDER BY pos) AS cv FROM cm GROUP BY cl),
      cpairs AS (SELECT n_id, cl,
          ${foldDot.format("list_slice(v, 1, 32)", "list_slice(v, 1, 32)")}
            - 2.0 * ${foldDot.format("list_slice(v, 1, 32)", "list_slice(cv, 1, 32)")}
            + ${foldDot.format("list_slice(cv, 1, 32)", "list_slice(cv, 1, 32)")} AS d0,
          ${foldDot.format("list_slice(v, 33, 64)", "list_slice(v, 33, 64)")}
            - 2.0 * ${foldDot.format("list_slice(v, 33, 64)", "list_slice(cv, 33, 64)")}
            + ${foldDot.format("list_slice(cv, 33, 64)", "list_slice(cv, 33, 64)")} AS d1
        FROM c CROSS JOIN cents),
      b0 AS (SELECT n_id, cl AS code0 FROM (
               SELECT n_id, cl, ROW_NUMBER() OVER (PARTITION BY n_id
                 ORDER BY d0, cl) rn FROM cpairs) WHERE rn = 1),
      b1 AS (SELECT n_id, cl AS code1 FROM (
               SELECT n_id, cl, ROW_NUMBER() OVER (PARTITION BY n_id
                 ORDER BY d1, cl) rn FROM cpairs) WHERE rn = 1),
      codes AS (SELECT b0.n_id, code0, code1 FROM b0 JOIN b1 USING (n_id)),
      qd0 AS (SELECT q_id, cl AS code0,
          ${foldDot.format("list_slice(v, 1, 32)", "list_slice(v, 1, 32)")}
            - 2.0 * ${foldDot.format("list_slice(v, 1, 32)", "list_slice(cv, 1, 32)")}
            + ${foldDot.format("list_slice(cv, 1, 32)", "list_slice(cv, 1, 32)")} AS qd0
        FROM q CROSS JOIN cents),
      qd1 AS (SELECT q_id, cl AS code1,
          ${foldDot.format("list_slice(v, 33, 64)", "list_slice(v, 33, 64)")}
            - 2.0 * ${foldDot.format("list_slice(v, 33, 64)", "list_slice(cv, 33, 64)")}
            + ${foldDot.format("list_slice(cv, 33, 64)", "list_slice(cv, 33, 64)")} AS qd1
        FROM q CROSS JOIN cents),
      approx AS (SELECT qd0.q_id, codes.n_id, qd0.qd0 + qd1.qd1 AS ad
                 FROM codes JOIN qd0 USING (code0)
                            JOIN qd1 ON qd1.q_id = qd0.q_id
                                    AND qd1.code1 = codes.code1),
      atop AS (SELECT q_id, n_id FROM (
                 SELECT q_id, n_id, ROW_NUMBER() OVER (PARTITION BY q_id
                   ORDER BY ad, n_id) rk FROM approx) WHERE rk <= 5),
      ex AS (SELECT q_id, n_id,
               ${foldDot.format("q.v", "q.v")}
                 - 2.0 * ${foldDot.format("q.v", "c.v")}
                 + ${foldDot.format("c.v", "c.v")} AS d2x
             FROM q CROSS JOIN c),
      etop AS (SELECT q_id, n_id FROM (
                 SELECT q_id, n_id, ROW_NUMBER() OVER (PARTITION BY q_id
                   ORDER BY d2x, n_id) rk FROM ex) WHERE rk <= 5),
      hits AS (SELECT q_id, COUNT(*) AS n_hits FROM etop
               WHERE EXISTS (SELECT 1 FROM atop a
                             WHERE a.q_id = etop.q_id AND a.n_id = etop.n_id)
               GROUP BY q_id)
      SELECT e2.q_id, CAST(COUNT(*) AS BIGINT) AS n_exact,
        CAST(COALESCE(MIN(hits.n_hits), 0) AS BIGINT) AS n_hits,
        CAST(COALESCE(MIN(hits.n_hits), 0) AS DOUBLE) / CAST(5.0 AS DOUBLE)
          AS recall
      FROM etop e2 LEFT JOIN hits ON hits.q_id = e2.q_id
      GROUP BY e2.q_id ORDER BY e2.q_id"""))

  /** Multi-probe sign-LSH recall@5 ([[Similarity
    * .lshMultiProbeTopK]]): each query probes its own bucket plus the
    * 8 one-bit-flip neighbor buckets of the SAME 8-plane table — the
    * recall knob that needs no extra index build. Output mirrors s06's
    * report (so the two rows are directly comparable, single- vs
    * multi-probe at equal table count) and adds the per-query
    * candidate volume `n_cands` — the price paid for the recall.
    * SimilaritySpec asserts the corpus-wide multi-probe recall
    * strictly exceeds s06's single-probe recall. */
  val s13 = QueryDef(
    "s13_multiprobe_recall",
    (sp, dir) => {
      val all = Similarity.prep(Tables(sp, dir, "embeddings"), "vec_id", "embedding")
      val queries = all.filter(col("id") < 10)
      val corpus = all.filter(col("id") >= 10)
      val exact = Similarity.bruteForceTopK(queries, corpus, k = 5)
        .select("q_id", "n_id")
      val cands = Similarity.lshMultiProbeCandidates(
        queries, corpus, nPlanes = 8, dim = 64)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("q_id").orderBy(col("cosine").desc, col("n_id"))
      val approx = cands.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5).select("q_id", "n_id")
      val nCands = cands.groupBy("q_id").agg(count(lit(1)).as("n_cands"))
      val hits = exact.join(approx, Seq("q_id", "n_id"), "left_semi")
        .groupBy("q_id").agg(count(lit(1)).as("n_hits"))
      exact.groupBy("q_id").agg(count(lit(1)).as("n_exact"))
        .join(nCands, Seq("q_id"), "left")
        .join(hits, Seq("q_id"), "left")
        .select(col("q_id"), col("n_exact"),
          coalesce(col("n_cands"), lit(0L)).as("n_cands"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"),
          (coalesce(col("n_hits"), lit(0L)) / lit(5.0)).as("recall"))
        .orderBy("q_id")
    },
    Some(s"""
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
      n AS (SELECT vec_id, v, sqrt(${foldDot.format("v", "v")}) nrm,
              ${bucketSql(8, 64)} AS bucket
            FROM e),
      q AS (SELECT vec_id q_id, v qv, nrm qn, bucket FROM n WHERE vec_id < 10),
      c AS (SELECT vec_id n_id, v cv, nrm cn, bucket FROM n WHERE vec_id >= 10),
      xs AS (SELECT q_id, n_id, ${foldDot.format("qv", "cv")} / (qn * cn) AS cosine
             FROM q CROSS JOIN c),
      xr AS (SELECT q_id, n_id,
               ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) rnk
             FROM xs),
      exact AS (SELECT q_id, n_id FROM xr WHERE rnk <= 5),
      probes AS (SELECT q_id, qv, qn,
                   unnest(list_prepend(CAST(bucket AS BIGINT),
                     list_transform(generate_series(0, 7),
                       i -> xor(CAST(bucket AS BIGINT),
                                CAST(1 << i AS BIGINT))))) AS bucket
                 FROM q),
      ls AS (SELECT q_id, n_id, ${foldDot.format("qv", "cv")} / (qn * cn) AS cosine
             FROM probes p JOIN c ON p.bucket = CAST(c.bucket AS BIGINT)),
      lr AS (SELECT q_id, n_id,
               ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) rnk
             FROM ls),
      approx AS (SELECT q_id, n_id FROM lr WHERE rnk <= 5),
      hits AS (SELECT q_id, COUNT(*) AS n_hits FROM exact
               WHERE EXISTS (SELECT 1 FROM approx a
                             WHERE a.q_id = exact.q_id AND a.n_id = exact.n_id)
               GROUP BY q_id),
      ncands AS (SELECT q_id, COUNT(*) AS n_cands FROM ls GROUP BY q_id)
      SELECT x.q_id, CAST(COUNT(*) AS BIGINT) AS n_exact,
        CAST(COALESCE(MIN(ncands.n_cands), 0) AS BIGINT) AS n_cands,
        CAST(COALESCE(MIN(hits.n_hits), 0) AS BIGINT) AS n_hits,
        CAST(COALESCE(MIN(hits.n_hits), 0) AS DOUBLE) / CAST(5.0 AS DOUBLE)
          AS recall
      FROM exact x
      LEFT JOIN ncands ON ncands.q_id = x.q_id
      LEFT JOIN hits ON hits.q_id = x.q_id
      GROUP BY x.q_id ORDER BY x.q_id"""))

  /** Scalar-quantization (SQ8) search recall@5: every corpus dimension
    * compresses to an unsigned byte against the corpus-wide per-dim
    * [min, max] range (the FAISS SQ8 recipe — 4× smaller than float32,
    * no codebook training), queries quantize through the SAME ranges,
    * and candidates score by the INTEGER squared-L2 distance between
    * code vectors — zero floating-point folds in the approximate path,
    * so the scores are exact integers on any engine. Recall is judged
    * against the exact squared-L2 top-5 (s12's baseline metric), so
    * the number isolates pure quantization loss. (A code DOT product
    * was tried first and scores recall ≈ 0: the per-dim shift/scale
    * of the quantizer preserves distances but destroys inner
    * products.)
    *
    * Scale shape: the per-dim stats aggregate is 64 keys with map-side
    * partials (tree-reduces at any corpus size), rides back as a
    * one-row broadcast equi-join (lit key, so it stays a
    * BroadcastHashJoin); quantization is per-row codegen'd `transform`;
    * the scoring join broadcasts only the tiny query side. The
    * division in the quantizer is a single IEEE op on (x − min) and
    * (max − min), both exact subtraction results — deterministic on
    * both engines; flat dimensions (max = min) pin to code 0 rather
    * than dividing by zero. */
  val s14 = QueryDef(
    "s14_sq8_recall",
    (sp, dir) => {
      import org.apache.spark.sql.expressions.Window
      val all = Similarity.prep(Tables(sp, dir, "embeddings"), "vec_id", "embedding")
      val queries = all.filter(col("id") < 10)
      val corpus = all.filter(col("id") >= 10)
      val stats = corpus
        .select(posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("pos").agg(min("x").as("mn"), max("x").as("mx"))
        .agg(sort_array(collect_list(struct(col("pos"), col("mn"), col("mx"))))
          .as("st"))
        .withColumn("k", lit(1))
      def codes(df: org.apache.spark.sql.DataFrame, idAs: String) =
        df.withColumn("k", lit(1)).join(broadcast(stats), "k")
          .select(col("id").as(idAs),
            transform(col("v"), (x, i) => {
              val s = element_at(col("st"), (i + lit(1)).cast("int"))
              when(s("mx") === s("mn"), lit(0L))
                .otherwise(least(lit(255L),
                  greatest(lit(0L),
                    floor(lit(255.0) * (x - s("mn")) / (s("mx") - s("mn")))
                      .cast("long"))))
            }).as("code"))
      val qc = codes(queries, "q_id").withColumnRenamed("code", "qcode")
      val cc = codes(corpus, "n_id").withColumnRenamed("code", "ccode")
      val scored = broadcast(qc).join(cc)
        .select(col("q_id"), col("n_id"),
          aggregate(
            zip_with(col("qcode"), col("ccode"), (a, b) => (a - b) * (a - b)),
            lit(0L), (acc, x) => acc + x).as("score"))
      val wA = Window.partitionBy("q_id").orderBy(col("score").asc, col("n_id"))
      val approxTop = scored.withColumn("rk", row_number().over(wA))
        .filter(col("rk") <= 5).select("q_id", "n_id")
      val ex = broadcast(queries.select(col("id").as("q_id"), col("v").as("qv")))
        .join(corpus.select(col("id").as("n_id"), col("v").as("cv")))
        .select(col("q_id"), col("n_id"),
          aggregate(
            zip_with(col("qv"), col("cv"), (a, b) => (a - b) * (a - b)),
            lit(0.0), (acc, x) => acc + x).as("d2"))
      val wE = Window.partitionBy("q_id").orderBy(col("d2").asc, col("n_id"))
      val exactTop = ex.withColumn("rk", row_number().over(wE))
        .filter(col("rk") <= 5).select("q_id", "n_id")
      val hits = exactTop.join(approxTop, Seq("q_id", "n_id"), "left_semi")
        .groupBy("q_id").agg(count(lit(1)).as("n_hits"))
      exactTop.groupBy("q_id").agg(count(lit(1)).as("n_exact"))
        .join(hits, Seq("q_id"), "left")
        .select(col("q_id"), col("n_exact"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"),
          (coalesce(col("n_hits"), lit(0L)) / lit(5.0)).as("recall"))
        .orderBy("q_id")
    },
    Some(s"""
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
      q AS (SELECT vec_id q_id, v FROM e WHERE vec_id < 10),
      c AS (SELECT vec_id n_id, v FROM e WHERE vec_id >= 10),
      cx AS (SELECT n_id,
               unnest(list_transform(v, (x, i) -> {'pos': i - 1, 'x': x}),
                 recursive := true)
             FROM c),
      st AS (SELECT pos, MIN(x) mn, MAX(x) mx FROM cx GROUP BY pos),
      rng AS (SELECT list(mn ORDER BY pos) mns, list(mx ORDER BY pos) mxs
              FROM st),
      qq AS (SELECT q_id, list_transform(v, (x, i) ->
               CASE WHEN mxs[i] = mns[i] THEN 0
                    ELSE least(255, greatest(0, CAST(floor(
                      255.0 * (x - mns[i]) / (mxs[i] - mns[i])) AS BIGINT)))
               END) AS qcode
             FROM q CROSS JOIN rng),
      qc AS (SELECT n_id, list_transform(v, (x, i) ->
               CASE WHEN mxs[i] = mns[i] THEN 0
                    ELSE least(255, greatest(0, CAST(floor(
                      255.0 * (x - mns[i]) / (mxs[i] - mns[i])) AS BIGINT)))
               END) AS ccode
             FROM c CROSS JOIN rng),
      scored AS (SELECT q_id, n_id,
          list_reduce(list_prepend(CAST(0 AS BIGINT),
            list_transform(list_zip(qcode, ccode),
              x -> (x[1] - x[2]) * (x[1] - x[2]))),
            (a, b) -> a + b) AS score
        FROM qq CROSS JOIN qc),
      atop AS (SELECT q_id, n_id FROM (
                 SELECT q_id, n_id, ROW_NUMBER() OVER (PARTITION BY q_id
                   ORDER BY score, n_id) rk FROM scored) WHERE rk <= 5),
      ex AS (SELECT q_id, n_id,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list_transform(list_zip(q.v, c.v),
                   x -> (x[1] - x[2]) * (x[1] - x[2]))),
                 (a, b) -> a + b) AS d2
             FROM q CROSS JOIN c),
      etop AS (SELECT q_id, n_id FROM (
                 SELECT q_id, n_id, ROW_NUMBER() OVER (PARTITION BY q_id
                   ORDER BY d2, n_id) rk FROM ex) WHERE rk <= 5),
      hits AS (SELECT q_id, COUNT(*) AS n_hits FROM etop
               WHERE EXISTS (SELECT 1 FROM atop a
                             WHERE a.q_id = etop.q_id AND a.n_id = etop.n_id)
               GROUP BY q_id)
      SELECT e2.q_id, CAST(COUNT(*) AS BIGINT) AS n_exact,
        CAST(COALESCE(MIN(hits.n_hits), 0) AS BIGINT) AS n_hits,
        CAST(COALESCE(MIN(hits.n_hits), 0) AS DOUBLE) / CAST(5.0 AS DOUBLE)
          AS recall
      FROM etop e2 LEFT JOIN hits ON hits.q_id = e2.q_id
      GROUP BY e2.q_id ORDER BY e2.q_id"""))

  /** Cross-run ANN index persistence — the d21 treatment for the
    * s-family ([[graft.operators.AnnIndex]]): installment 1 (the
    * corpus, vec_id >= 10) ends by WRITING its IVF index — centroids
    * plus cluster-PARTITIONED postings — to a parquet store;
    * installment 2 (the queries) arrives as its own landing file and
    * probes the STORED index. The returned plan reads ONLY the store
    * and the landing file (embeddings.parquet is absent from its scan
    * set — plan-audited in AnnIndexSpec), and the broadcast routed
    * pairs drive dynamic partition pruning on the postings scan, so
    * only the probed clusters' files open. The oracle recomputes the
    * whole IVF chain from scratch over the original table (s03's
    * SQL): the hash equality proves probe-of-stored ≡ batch rebuild. */
  val s15 = QueryDef(
    "s15_persisted_ivf",
    (sp, dir) => {
      val fp = graft.sources.IngestFixtures.fingerprint(s"$dir/embeddings.parquet")
      val store = graft.sources.IngestFixtures.path(s"s15_store_$fp")
      val land = graft.sources.IngestFixtures.path(s"s15_land_$fp")
      graft.sources.IngestFixtures.once(s"s15_$fp") {
        import scala.reflect.io.Directory
        new Directory(new java.io.File(store)).deleteRecursively()
        new Directory(new java.io.File(land)).deleteRecursively()
        val embs = Tables(sp, dir, "embeddings")
        // installment 1 ends: IVF index persisted
        val corpus = Similarity.prep(embs, "vec_id", "embedding")
          .join(embs.select(col("vec_id").as("id"), col("label")), "id")
          .filter(col("id") >= 10)
        graft.operators.AnnIndex.writeIvf(corpus, "label", store)
        // installment 2 lands as its own file — the entry below must
        // never touch embeddings.parquet
        graft.sources.IngestFixtures.addLandingFile(land,
          embs.filter(col("vec_id") < 10).select("vec_id", "embedding"),
          "queries.parquet", 1700000300000L)
      }
      val queries = Similarity.prep(
        sp.read.parquet(land), "vec_id", "embedding")
      graft.operators.AnnIndex.probeIvf(sp, store, queries,
          k = 5, nProbe = 2)
        .orderBy("q_id", "rank")
    },
    Some(s"""
      WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] v FROM embeddings),
      n AS (SELECT vec_id, label, v, sqrt(${foldDot.format("v", "v")}) nrm FROM e),
      q AS (SELECT vec_id q_id, v qv, nrm qn FROM n WHERE vec_id < 10),
      c AS (SELECT vec_id n_id, label cl, v cv, nrm cn FROM n WHERE vec_id >= 10),
      cx AS (SELECT n_id, cl,
               unnest(list_transform(cv, (x, i) -> {'pos': i - 1, 'x': x}),
                 recursive := true)
             FROM c),
      cm AS (SELECT cl, pos,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list(x ORDER BY n_id)), (a, b) -> a + b) / COUNT(*) AS m
             FROM cx GROUP BY cl, pos),
      cents AS (SELECT cl, list(m ORDER BY pos) AS cv FROM cm
                GROUP BY cl),
      cn AS (SELECT cl, cv, sqrt(${foldDot.format("cv", "cv")}) AS cn
             FROM cents),
      probe AS (SELECT q_id, qv, qn, cl,
                  ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY
                    ${foldDot.format("qv", "cv")} / (qn * cn.cn) DESC, cl)
                    AS probe_rank
                FROM q CROSS JOIN cn),
      routed AS (SELECT q_id, qv, qn, cl FROM probe WHERE probe_rank <= 2),
      s AS (SELECT q_id, n_id, ${foldDot.format("qv", "cv")} / (qn * cn) AS cosine
            FROM routed r JOIN c USING (cl)),
      r AS (SELECT q_id, n_id, cosine,
              ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) rnk
            FROM s)
      SELECT q_id, n_id, cosine, CAST(rnk AS INT) AS rank
      FROM r WHERE rnk <= 5 ORDER BY q_id, rank"""))

  /** Incremental PQ encode against a FROZEN persisted codebook —
    * [[s15]]'s sibling for the compression index: installment 1 (even
    * vec_ids) trains the codebook and persists it with its own codes;
    * installment 2 (odd vec_ids) lands as its own file and encodes
    * through [[graft.operators.AnnIndex.encodeWith]] — the stored
    * code space, never retrained, exactly the production contract
    * (codebooks are versioned artifacts; retraining is a deliberate
    * reindex). Output = stored codes ∪ newly encoded codes; the
    * oracle recomputes everything from scratch (codebook from the
    * even half, all vectors encoded), so the hash proves
    * incremental-encode-over-stored ≡ batch rebuild. The plan reads
    * only the store and the landing file (plan-audited). */
  val s16 = QueryDef(
    "s16_incremental_pq",
    (sp, dir) => {
      val fp = graft.sources.IngestFixtures.fingerprint(s"$dir/embeddings.parquet")
      val store = graft.sources.IngestFixtures.path(s"s16_store_$fp")
      val land = graft.sources.IngestFixtures.path(s"s16_land_$fp")
      graft.sources.IngestFixtures.once(s"s16_$fp") {
        import scala.reflect.io.Directory
        new Directory(new java.io.File(store)).deleteRecursively()
        new Directory(new java.io.File(land)).deleteRecursively()
        val embs = Tables(sp, dir, "embeddings")
        val firstHalf = Similarity.prep(
            embs.filter(col("vec_id") % 2 === 0), "vec_id", "embedding")
          .join(embs.select(col("vec_id").as("id"), col("label")), "id")
        graft.operators.AnnIndex.writePq(
          firstHalf.select("id", "v"), firstHalf, m = 2, dim = 64, store)
        graft.sources.IngestFixtures.addLandingFile(land,
          embs.filter(col("vec_id") % 2 =!= 0).select("vec_id", "embedding"),
          "batch2.parquet", 1700000400000L)
      }
      val newVecs = Similarity.prep(
        sp.read.parquet(land), "vec_id", "embedding")
      graft.operators.AnnIndex.readCodes(sp, store)
        .unionByName(graft.operators.AnnIndex.encodeWith(
          sp, store, newVecs.select("id", "v"), m = 2, dim = 64))
        .orderBy("id")
    },
    Some(s"""
      WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] v FROM embeddings),
      cx AS (SELECT vec_id, label,
               unnest(list_transform(v, (x, i) -> {'pos': i - 1, 'x': x}),
                 recursive := true)
             FROM e WHERE vec_id % 2 = 0),
      cm AS (SELECT label AS cl, pos,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list(x ORDER BY vec_id)), (a, b) -> a + b) / COUNT(*) AS m
             FROM cx GROUP BY cl, pos),
      cents AS (SELECT cl, list(m ORDER BY pos) AS cv FROM cm GROUP BY cl),
      pairs AS (SELECT vec_id, cl,
          ${foldDot.format("list_slice(v, 1, 32)", "list_slice(v, 1, 32)")}
            - 2.0 * ${foldDot.format("list_slice(v, 1, 32)", "list_slice(cv, 1, 32)")}
            + ${foldDot.format("list_slice(cv, 1, 32)", "list_slice(cv, 1, 32)")} AS d0,
          ${foldDot.format("list_slice(v, 33, 64)", "list_slice(v, 33, 64)")}
            - 2.0 * ${foldDot.format("list_slice(v, 33, 64)", "list_slice(cv, 33, 64)")}
            + ${foldDot.format("list_slice(cv, 33, 64)", "list_slice(cv, 33, 64)")} AS d1
        FROM e CROSS JOIN cents),
      b0 AS (SELECT vec_id, cl AS code0, d0 FROM (
               SELECT vec_id, cl, d0,
                 ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d0, cl) rn
               FROM pairs) WHERE rn = 1),
      b1 AS (SELECT vec_id, cl AS code1, d1 FROM (
               SELECT vec_id, cl, d1,
                 ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d1, cl) rn
               FROM pairs) WHERE rn = 1)
      SELECT b0.vec_id AS id, code0, code1, d0 + d1 AS sq_err
      FROM b0 JOIN b1 ON b0.vec_id = b1.vec_id
      ORDER BY id"""))

  /** Grow the persisted IVF index — the FAISS "add" contract closing
    * the stored-index lifecycle (build s15 → GROW s17 → probe):
    * installment 2's vectors land as their own file, route to their
    * nearest FROZEN centroid ([[graft.operators.AnnIndex
    * .assignToStored]] — centroids never move on ingest; re-clustering
    * is a deliberate reindex), and append to the cluster-partitioned
    * postings ATOMICALLY (stage + rename, the DedupIndex install
    * discipline). The entry probes the GROWN index with a third
    * landed query file; embeddings.parquet is absent from the plan's
    * scan set (plan-audited). The oracle recomputes everything from
    * scratch — frozen centroids from the initial corpus, argmax
    * assignment of the installment (cosines ride the same fold
    * kernel, so the argmax is over bit-identical doubles), the
    * unioned postings, the routed probe — so the hash proves
    * grow-then-probe ≡ batch rebuild of the same contract. */
  val s17 = QueryDef(
    "s17_ivf_append",
    (sp, dir) => {
      val fp = graft.sources.IngestFixtures.fingerprint(s"$dir/embeddings.parquet")
      val store = graft.sources.IngestFixtures.path(s"s17_store_$fp")
      val land = graft.sources.IngestFixtures.path(s"s17_land_$fp")
      val qland = graft.sources.IngestFixtures.path(s"s17_q_$fp")
      graft.sources.IngestFixtures.once(s"s17_$fp") {
        import scala.reflect.io.Directory
        Seq(store, land, qland).foreach(p =>
          new Directory(new java.io.File(p)).deleteRecursively())
        val embs = Tables(sp, dir, "embeddings")
        // installment 1: label-partitioned initial index
        val corpus0 = Similarity.prep(
            embs.filter(col("vec_id") >= 10 && col("vec_id") % 2 === 0),
            "vec_id", "embedding")
          .join(embs.select(col("vec_id").as("id"), col("label")), "id")
        graft.operators.AnnIndex.writeIvf(corpus0, "label", store)
        // installment 2 lands, routes to frozen centroids, appends
        graft.sources.IngestFixtures.addLandingFile(land,
          embs.filter(col("vec_id") >= 10 && col("vec_id") % 2 =!= 0)
            .select("vec_id", "embedding"),
          "batch2.parquet", 1700000500000L)
        graft.operators.AnnIndex.appendVectors(sp, store,
          Similarity.prep(sp.read.parquet(land), "vec_id", "embedding"))
        graft.sources.IngestFixtures.addLandingFile(qland,
          embs.filter(col("vec_id") < 10).select("vec_id", "embedding"),
          "queries.parquet", 1700000600000L)
      }
      val queries = Similarity.prep(
        sp.read.parquet(qland), "vec_id", "embedding")
      graft.operators.AnnIndex.probeIvf(sp, store, queries,
          k = 5, nProbe = 2)
        .orderBy("q_id", "rank")
    },
    Some(s"""
      WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] v FROM embeddings),
      n AS (SELECT vec_id, label, v, sqrt(${foldDot.format("v", "v")}) nrm FROM e),
      q AS (SELECT vec_id q_id, v qv, nrm qn FROM n WHERE vec_id < 10),
      ceven AS (SELECT vec_id n_id, label cl, v cv, nrm cn FROM n
                WHERE vec_id >= 10 AND vec_id % 2 = 0),
      codd AS (SELECT vec_id n_id, v cv, nrm cn FROM n
               WHERE vec_id >= 10 AND vec_id % 2 <> 0),
      cx AS (SELECT n_id, cl,
               unnest(list_transform(cv, (x, i) -> {'pos': i - 1, 'x': x}),
                 recursive := true)
             FROM ceven),
      cm AS (SELECT cl, pos,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list(x ORDER BY n_id)), (a, b) -> a + b) / COUNT(*) AS m
             FROM cx GROUP BY cl, pos),
      cents AS (SELECT cl, list(m ORDER BY pos) AS cv FROM cm
                GROUP BY cl),
      cn AS (SELECT cl, cv, sqrt(${foldDot.format("cv", "cv")}) AS cn
             FROM cents),
      assign AS (SELECT n_id, cl, cv0 AS cv, cn0 AS cn FROM (
            SELECT o.n_id, c.cl, o.cv AS cv0, o.cn AS cn0,
              ROW_NUMBER() OVER (PARTITION BY o.n_id ORDER BY
                ${foldDot.format("o.cv", "c.cv")} / (o.cn * c.cn) DESC,
                c.cl) AS rk
            FROM codd o CROSS JOIN cn c) WHERE rk = 1),
      posts AS (SELECT n_id, cl, cv, cn FROM ceven
                UNION ALL SELECT n_id, cl, cv, cn FROM assign),
      probe AS (SELECT q_id, qv, qn, cl,
                  ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY
                    ${foldDot.format("qv", "cv")} / (qn * cn.cn) DESC, cl)
                    AS probe_rank
                FROM q CROSS JOIN cn),
      routed AS (SELECT q_id, qv, qn, cl FROM probe WHERE probe_rank <= 2),
      s AS (SELECT q_id, n_id, ${foldDot.format("qv", "cv")} / (qn * cn) AS cosine
            FROM routed r JOIN posts USING (cl)),
      r AS (SELECT q_id, n_id, cosine,
              ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) rnk
            FROM s)
      SELECT q_id, n_id, cosine, CAST(rnk AS INT) AS rank
      FROM r WHERE rnk <= 5 ORDER BY q_id, rank"""))

  /** Persisted sign-LSH bucket tables — the THIRD index family gets
    * the s15/s17 treatment, closing the stored-index story (IVF s15,
    * PQ s16, LSH here): installment 1 (even corpus vec_ids) ends by
    * writing its bucket-PARTITIONED table and the frozen (nPlanes,
    * dim) configuration ([[graft.operators.AnnIndex.writeLsh]] —
    * hyperplanes re-derive deterministically from the pinned conf, so
    * the code space never moves); installment 2 (odd corpus vec_ids)
    * lands as its own file and GROWS the store O(delta)
    * ([[graft.operators.AnnIndex.appendLshVectors]] — one new
    * segment, one txlog commit, old segments untouched); the queries
    * land as a third file and MULTI-PROBE the grown store (own bucket
    * + every 1-bit flip, s13's recall semantics) with exact-cosine
    * verification. embeddings.parquet is absent from the probe plan's
    * scan set (plan-audited in AnnIndexSpec via the store reads); the
    * oracle rebuilds the whole chain from scratch over the original
    * table, so the hash proves build-grow-probe of the stored table ≡
    * batch recompute. */
  val s18 = QueryDef(
    "s18_persisted_lsh",
    (sp, dir) => {
      val fp = graft.sources.IngestFixtures.fingerprint(s"$dir/embeddings.parquet")
      val store = graft.sources.IngestFixtures.path(s"s18_store_$fp")
      val land = graft.sources.IngestFixtures.path(s"s18_land_$fp")
      val qland = graft.sources.IngestFixtures.path(s"s18_q_$fp")
      graft.sources.IngestFixtures.once(s"s18_$fp") {
        import scala.reflect.io.Directory
        Seq(store, land, qland).foreach(p =>
          new Directory(new java.io.File(p)).deleteRecursively())
        val embs = Tables(sp, dir, "embeddings")
        // installment 1: bucket table + frozen hyperplane conf
        graft.operators.AnnIndex.writeLsh(
          Similarity.prep(
            embs.filter(col("vec_id") >= 10 && col("vec_id") % 2 === 0),
            "vec_id", "embedding"),
          nPlanes = 8, dim = 64, store)
        // installment 2 lands, hashes through the stored conf, appends
        graft.sources.IngestFixtures.addLandingFile(land,
          embs.filter(col("vec_id") >= 10 && col("vec_id") % 2 =!= 0)
            .select("vec_id", "embedding"),
          "batch2.parquet", 1700000700000L)
        graft.operators.AnnIndex.appendLshVectors(sp, store,
          Similarity.prep(sp.read.parquet(land), "vec_id", "embedding"))
        graft.sources.IngestFixtures.addLandingFile(qland,
          embs.filter(col("vec_id") < 10).select("vec_id", "embedding"),
          "queries.parquet", 1700000800000L)
      }
      val queries = Similarity.prep(
        sp.read.parquet(qland), "vec_id", "embedding")
      graft.operators.AnnIndex.probeLsh(sp, store, queries, k = 5)
        .orderBy("q_id", "rank")
    },
    Some(s"""
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
      n AS (SELECT vec_id, v, sqrt(${foldDot.format("v", "v")}) nrm,
              ${bucketSql(8, 64)} AS bucket
            FROM e),
      q AS (SELECT vec_id q_id, v qv, nrm qn, bucket FROM n WHERE vec_id < 10),
      c AS (SELECT vec_id n_id, v cv, nrm cn, bucket FROM n WHERE vec_id >= 10),
      probes AS (SELECT q_id, qv, qn,
                   unnest(list_prepend(CAST(bucket AS BIGINT),
                     list_transform(generate_series(0, 7),
                       i -> xor(CAST(bucket AS BIGINT),
                                CAST(1 << i AS BIGINT))))) AS bucket
                 FROM q),
      ls AS (SELECT q_id, n_id, ${foldDot.format("qv", "cv")} / (qn * cn) AS cosine
             FROM probes p JOIN c ON p.bucket = CAST(c.bucket AS BIGINT)),
      lr AS (SELECT q_id, n_id, cosine,
               ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) rnk
             FROM ls)
      SELECT q_id, n_id, cosine, CAST(rnk AS INT) AS rank
      FROM lr WHERE rnk <= 5 ORDER BY q_id, rank"""))

  /** Compact the grown IVF store — the OPTIMIZE half of the
    * log-structured index lifecycle (build s15 → grow s17 → COMPACT
    * here → probe): the fixture builds from one third of the corpus
    * (vec_id % 3 = 0), grows TWICE with the other thirds (each an
    * O(delta) segment behind its own txlog commit), leaving three
    * postings segments whose per-cluster files trend toward the
    * small-file cliff — then [[graft.operators.AnnIndex
    * .compactFamily]] folds them into ONE segment in a single atomic
    * commit (`adds=[merged], removes=[seg0,seg1,seg2]`). The entry
    * probes the COMPACTED index: the plan's postings scan touches
    * exactly one segment (and still partition-prunes to the probed
    * clusters), every pre-compaction version stays snapshot-readable
    * (time travel survives OPTIMIZE — spec-asserted in AnnIndexSpec
    * along with sibling-family byte-identity), and the oracle
    * recomputes the whole chain from scratch — frozen centroids from
    * the first third, argmax routing of both grow installments, the
    * unioned postings, the routed probe — so the hash proves
    * build-grow-grow-compact-probe ≡ batch rebuild. */
  val s19 = QueryDef(
    "s19_ivf_compact",
    (sp, dir) => {
      val fp = graft.sources.IngestFixtures.fingerprint(s"$dir/embeddings.parquet")
      val store = graft.sources.IngestFixtures.path(s"s19_store_$fp")
      val land1 = graft.sources.IngestFixtures.path(s"s19_l1_$fp")
      val land2 = graft.sources.IngestFixtures.path(s"s19_l2_$fp")
      val qland = graft.sources.IngestFixtures.path(s"s19_q_$fp")
      graft.sources.IngestFixtures.once(s"s19_$fp") {
        import scala.reflect.io.Directory
        Seq(store, land1, land2, qland).foreach(p =>
          new Directory(new java.io.File(p)).deleteRecursively())
        val embs = Tables(sp, dir, "embeddings")
        // installment 1: the first third builds the index
        val corpus0 = Similarity.prep(
            embs.filter(col("vec_id") >= 10 && col("vec_id") % 3 === 0),
            "vec_id", "embedding")
          .join(embs.select(col("vec_id").as("id"), col("label")), "id")
        graft.operators.AnnIndex.writeIvf(corpus0, "label", store)
        // installments 2 and 3 land and grow — two O(delta) segments
        Seq((land1, 1, 1700000900000L), (land2, 2, 1700001000000L))
          .foreach { case (land, residue, ts) =>
            graft.sources.IngestFixtures.addLandingFile(land,
              embs.filter(col("vec_id") >= 10 && col("vec_id") % 3 === residue)
                .select("vec_id", "embedding"),
              s"batch$residue.parquet", ts)
            graft.operators.AnnIndex.appendVectors(sp, store,
              Similarity.prep(sp.read.parquet(land), "vec_id", "embedding"))
          }
        // OPTIMIZE: three postings segments fold into one
        graft.operators.AnnIndex.compactFamily(sp, store, "postings",
          Seq("cluster"))
        graft.sources.IngestFixtures.addLandingFile(qland,
          embs.filter(col("vec_id") < 10).select("vec_id", "embedding"),
          "queries.parquet", 1700001100000L)
      }
      val queries = Similarity.prep(
        sp.read.parquet(qland), "vec_id", "embedding")
      graft.operators.AnnIndex.probeIvf(sp, store, queries,
          k = 5, nProbe = 2)
        .orderBy("q_id", "rank")
    },
    Some(s"""
      WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] v FROM embeddings),
      n AS (SELECT vec_id, label, v, sqrt(${foldDot.format("v", "v")}) nrm FROM e),
      q AS (SELECT vec_id q_id, v qv, nrm qn FROM n WHERE vec_id < 10),
      c0 AS (SELECT vec_id n_id, label cl, v cv, nrm cn FROM n
             WHERE vec_id >= 10 AND vec_id % 3 = 0),
      cgrow AS (SELECT vec_id n_id, v cv, nrm cn FROM n
                WHERE vec_id >= 10 AND vec_id % 3 <> 0),
      cx AS (SELECT n_id, cl,
               unnest(list_transform(cv, (x, i) -> {'pos': i - 1, 'x': x}),
                 recursive := true)
             FROM c0),
      cm AS (SELECT cl, pos,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list(x ORDER BY n_id)), (a, b) -> a + b) / COUNT(*) AS m
             FROM cx GROUP BY cl, pos),
      cents AS (SELECT cl, list(m ORDER BY pos) AS cv FROM cm
                GROUP BY cl),
      cn AS (SELECT cl, cv, sqrt(${foldDot.format("cv", "cv")}) AS cn
             FROM cents),
      assign AS (SELECT n_id, cl, cv0 AS cv, cn0 AS cn FROM (
            SELECT o.n_id, c.cl, o.cv AS cv0, o.cn AS cn0,
              ROW_NUMBER() OVER (PARTITION BY o.n_id ORDER BY
                ${foldDot.format("o.cv", "c.cv")} / (o.cn * c.cn) DESC,
                c.cl) AS rk
            FROM cgrow o CROSS JOIN cn c) WHERE rk = 1),
      posts AS (SELECT n_id, cl, cv, cn FROM c0
                UNION ALL SELECT n_id, cl, cv, cn FROM assign),
      probe AS (SELECT q_id, qv, qn, cl,
                  ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY
                    ${foldDot.format("qv", "cv")} / (qn * cn.cn) DESC, cl)
                    AS probe_rank
                FROM q CROSS JOIN cn),
      routed AS (SELECT q_id, qv, qn, cl FROM probe WHERE probe_rank <= 2),
      s AS (SELECT q_id, n_id, ${foldDot.format("qv", "cv")} / (qn * cn) AS cosine
            FROM routed r JOIN posts USING (cl)),
      r AS (SELECT q_id, n_id, cosine,
              ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) rnk
            FROM s)
      SELECT q_id, n_id, cosine, CAST(rnk AS INT) AS rank
      FROM r WHERE rnk <= 5 ORDER BY q_id, rank"""))

  /** Two-stage IVF+PQ (ADC) search — the IVFADC probe composed from
    * the store's three families, in its non-residual form (codes
    * quantize raw vectors, keeping an exact relational oracle): the
    * fixture persists the IVF index (s15), trains the PQ codebook on
    * the SAME label partition, and materializes the `pqposts` family
    * — cluster-partitioned inverted lists holding each posting's m=2
    * codes, the layout where a probed list costs m small ints per
    * vector instead of the full embedding. The probe routes each
    * query to nProbe=2 centroids, ranks the probed clusters'
    * candidates by the asymmetric distance (per-subspace query→
    * codeword LUT, fixed-order sum — bit-reproducible), shortlists
    * the top 10, and re-ranks ONLY those by exact cosine for the
    * top 5 — the full-precision postings are touched for shortlist
    * rows alone. The oracle recomputes centroids, codes, LUT, ADC,
    * shortlist, and re-rank from scratch in the same fold shapes, so
    * the hash proves the two-stage stored-index search ≡ the batch
    * recompute. */
  val s20 = QueryDef(
    "s20_ivfpq_adc",
    (sp, dir) => {
      val fp = graft.sources.IngestFixtures.fingerprint(s"$dir/embeddings.parquet")
      val store = graft.sources.IngestFixtures.path(s"s20_store_$fp")
      val qland = graft.sources.IngestFixtures.path(s"s20_q_$fp")
      graft.sources.IngestFixtures.once(s"s20_$fp") {
        import scala.reflect.io.Directory
        Seq(store, qland).foreach(p =>
          new Directory(new java.io.File(p)).deleteRecursively())
        val embs = Tables(sp, dir, "embeddings")
        val corpus = Similarity.prep(embs, "vec_id", "embedding")
          .join(embs.select(col("vec_id").as("id"), col("label")), "id")
          .filter(col("id") >= 10)
        graft.operators.AnnIndex.writeIvf(corpus, "label", store)
        graft.operators.AnnIndex.writePq(
          corpus.select("id", "v"),
          corpus.select(col("id"), col("v"), col("label")),
          m = 2, dim = 64, store)
        graft.operators.AnnIndex.writePqPostings(sp, store, m = 2, dim = 64)
        graft.sources.IngestFixtures.addLandingFile(qland,
          embs.filter(col("vec_id") < 10).select("vec_id", "embedding"),
          "queries.parquet", 1700001200000L)
      }
      val queries = Similarity.prep(
        sp.read.parquet(qland), "vec_id", "embedding")
      graft.operators.AnnIndex.probeIvfPq(sp, store, queries,
          k = 5, nProbe = 2, shortlist = 10, m = 2, dim = 64)
        .orderBy("q_id", "rank")
    },
    Some(s"""
      WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] v FROM embeddings),
      n AS (SELECT vec_id, label, v, sqrt(${foldDot.format("v", "v")}) nrm FROM e),
      q AS (SELECT vec_id q_id, v qv, nrm qn FROM n WHERE vec_id < 10),
      c AS (SELECT vec_id n_id, label cl, v cv, nrm cn FROM n WHERE vec_id >= 10),
      cx AS (SELECT n_id, cl,
               unnest(list_transform(cv, (x, i) -> {'pos': i - 1, 'x': x}),
                 recursive := true)
             FROM c),
      cm AS (SELECT cl, pos,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list(x ORDER BY n_id)), (a, b) -> a + b) / COUNT(*) AS m
             FROM cx GROUP BY cl, pos),
      cents AS (SELECT cl, list(m ORDER BY pos) AS cv FROM cm
                GROUP BY cl),
      cnn AS (SELECT cl, cv, sqrt(${foldDot.format("cv", "cv")}) AS cn
              FROM cents),
      probe AS (SELECT q_id, cl,
                  ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY
                    ${foldDot.format("qv", "cv")} / (qn * cnn.cn) DESC, cl)
                    AS probe_rank
                FROM q CROSS JOIN cnn),
      routed AS (SELECT q_id, cl FROM probe WHERE probe_rank <= 2),
      pairs AS (SELECT n_id, cl AS cb,
          ${foldDot.format("list_slice(pv, 1, 32)", "list_slice(pv, 1, 32)")}
            - 2.0 * ${foldDot.format("list_slice(pv, 1, 32)", "list_slice(cents.cv, 1, 32)")}
            + ${foldDot.format("list_slice(cents.cv, 1, 32)", "list_slice(cents.cv, 1, 32)")} AS d0,
          ${foldDot.format("list_slice(pv, 33, 64)", "list_slice(pv, 33, 64)")}
            - 2.0 * ${foldDot.format("list_slice(pv, 33, 64)", "list_slice(cents.cv, 33, 64)")}
            + ${foldDot.format("list_slice(cents.cv, 33, 64)", "list_slice(cents.cv, 33, 64)")} AS d1
        FROM (SELECT n_id, cv AS pv FROM c) cc CROSS JOIN cents),
      b0 AS (SELECT n_id, cb AS code0 FROM (
               SELECT n_id, cb, ROW_NUMBER() OVER (PARTITION BY n_id
                 ORDER BY d0, cb) rn FROM pairs) WHERE rn = 1),
      b1 AS (SELECT n_id, cb AS code1 FROM (
               SELECT n_id, cb, ROW_NUMBER() OVER (PARTITION BY n_id
                 ORDER BY d1, cb) rn FROM pairs) WHERE rn = 1),
      codes AS (SELECT b0.n_id, code0, code1 FROM b0 JOIN b1 USING (n_id)),
      lut AS (SELECT q_id, cl AS cb,
          ${foldDot.format("list_slice(qv, 1, 32)", "list_slice(qv, 1, 32)")}
            - 2.0 * ${foldDot.format("list_slice(qv, 1, 32)", "list_slice(cents.cv, 1, 32)")}
            + ${foldDot.format("list_slice(cents.cv, 1, 32)", "list_slice(cents.cv, 1, 32)")} AS d0,
          ${foldDot.format("list_slice(qv, 33, 64)", "list_slice(qv, 33, 64)")}
            - 2.0 * ${foldDot.format("list_slice(qv, 33, 64)", "list_slice(cents.cv, 33, 64)")}
            + ${foldDot.format("list_slice(cents.cv, 33, 64)", "list_slice(cents.cv, 33, 64)")} AS d1
        FROM q CROSS JOIN cents),
      cand AS (SELECT r.q_id, c.n_id, codes.code0, codes.code1
               FROM routed r JOIN c USING (cl) JOIN codes ON codes.n_id = c.n_id),
      adc AS (SELECT cand.q_id, cand.n_id, l0.d0 + l1.d1 AS adc
              FROM cand
              JOIN lut l0 ON l0.q_id = cand.q_id AND l0.cb = cand.code0
              JOIN lut l1 ON l1.q_id = cand.q_id AND l1.cb = cand.code1),
      short AS (SELECT q_id, n_id, adc FROM (
                  SELECT q_id, n_id, adc, ROW_NUMBER() OVER (
                    PARTITION BY q_id ORDER BY adc, n_id) sr FROM adc)
                WHERE sr <= 10),
      ex AS (SELECT s2.q_id, s2.n_id, s2.adc,
               ${foldDot.format("q.qv", "c.cv")} / (q.qn * c.cn) AS cosine
             FROM short s2 JOIN c ON c.n_id = s2.n_id
             JOIN q ON q.q_id = s2.q_id),
      r AS (SELECT q_id, n_id, adc, cosine,
              ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) rnk
            FROM ex)
      SELECT q_id, n_id, adc, cosine, CAST(rnk AS INT) AS rank
      FROM r WHERE rnk <= 5 ORDER BY q_id, rank"""))

  /** Hybrid retrieval: BM25 lexical search fused with exact-cosine
    * vector search by reciprocal-rank fusion (RRF, Cormack et al.
    * 2009, k=60) — the standard production retrieval shape (every
    * hybrid RAG/search stack runs exactly this: two arms, rank-level
    * fusion, no score calibration needed). Query docs (doc_id < 10)
    * retrieve over the corpus (doc_id ≥ 10, embeddings aligned by
    * id): each arm contributes its top-20 pool, RRF re-ranks the
    * union, top-10 out.
    *
    * Scale shape: the lexical arm is an INVERTED-LIST join — the
    * query-term dictionary (query terms ⋈ per-term df, query-batch-
    * sized) broadcasts into the corpus term-frequency table, so the
    * intermediate is Σ df(query terms) postings, never |queries| ×
    * |corpus|; per-(query, doc) state is bounded by the query's own
    * term count; doc lengths join per-doc, corpus stats (N, avgdl)
    * ride a 1-row broadcast. The vector arm is s01's broadcast-
    * queries single corpus scan. Fusion touches only the ≤40-row
    * per-query pools. At 100 TB each arm swaps in its persisted
    * index (s15-s20 IVF/PQ for vectors, a postings store for text)
    * without changing the fusion contract.
    *
    * Determinism: BM25 per-term contributions are fixed IEEE op
    * chains on exact-integer (tf, df, dl, N, Σdl) inputs, summed as
    * an ORDERED word-sorted fold (the t17/e35 rule), rounded to 4
    * decimals BEFORE ranking (round-then-rank; ln is the only
    * transcendental — the q104 concession); cosines are bit-portable
    * dotFold chains (s01); RRF terms are single divisions of exact
    * rank integers summed in fixed lex-then-vec order, so the final
    * ordering needs no rounding at all. */
  val s21 = QueryDef(
    "s21_hybrid_search",
    (sp, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables(sp, dir, "documents")
      // ---- lexical arm: BM25(k1=1.2, b=0.75), top-20 per query ----
      val ctf = docs.filter(col("doc_id") >= 10)
        .select(col("doc_id").as("n_id"),
          explode(split(col("text"), " ")).as("word"))
        .filter(col("word") =!= "")
        .groupBy("n_id", "word").agg(count(lit(1)).as("tf"))
      val dl = ctf.groupBy("n_id").agg(sum("tf").as("dl"))
      val stats = dl.agg(count(lit(1)).as("nd"), sum("dl").as("tok"))
        .withColumn("j", pmod(col("nd"), lit(1L)))
      val dfw = ctf.groupBy("word").agg(count(lit(1)).as("df"))
      val qterms = docs.filter(col("doc_id") < 10)
        .select(col("doc_id").as("q_id"),
          explode(split(col("text"), " ")).as("word"))
        .filter(col("word") =!= "").distinct()
      val qdict = qterms.join(dfw, "word")
      val contrib = graft.operators.TextIndex.bm25Contrib
      val terms = ctf.join(broadcast(qdict), "word")
        .join(dl, "n_id")
        .withColumn("j", pmod(col("tf"), lit(1L)))
        .join(broadcast(stats), "j")
        .select(col("q_id"), col("n_id"),
          struct(col("word"), contrib.as("c")).as("wc"))
      val lex = terms.groupBy("q_id", "n_id")
        .agg(aggregate(array_sort(collect_list(col("wc"))), lit(0.0),
          (acc, x) => acc + x.getField("c")).as("score"))
        .withColumn("score", round(col("score"), 4))
      val wl = Window.partitionBy("q_id")
        .orderBy(col("score").desc, col("n_id"))
      val lex20 = lex.withColumn("lex_rank", row_number().over(wl))
        .filter(col("lex_rank") <= 20)
        .select(col("q_id"), col("n_id"), col("lex_rank").cast("int").as("lex_rank"))
      // ---- vector arm: exact cosine top-20 per query (s01) ----
      val all = Similarity.prep(Tables(sp, dir, "embeddings"), "vec_id", "embedding")
      val vec20 = Similarity.bruteForceTopK(
          all.filter(col("id") < 10), all.filter(col("id") >= 10), k = 20)
        .select(col("q_id"), col("n_id"), col("rank").cast("int").as("vec_rank"))
      // ---- reciprocal-rank fusion over the pooled union ----
      val pool = lex20.join(vec20, Seq("q_id", "n_id"), "full_outer")
      val rrf =
        coalesce(lit(1.0) / (lit(60.0) + col("lex_rank").cast("double")), lit(0.0)) +
        coalesce(lit(1.0) / (lit(60.0) + col("vec_rank").cast("double")), lit(0.0))
      val wf = Window.partitionBy("q_id").orderBy(col("rrf").desc, col("n_id"))
      pool.withColumn("rrf", rrf)
        .withColumn("rank", row_number().over(wf))
        .filter(col("rank") <= 10)
        .select(col("q_id"), col("n_id"), col("lex_rank"), col("vec_rank"),
          col("rrf"), col("rank").cast("int").as("rank"))
        .orderBy("q_id", "rank")
    },
    Some(s"""
      WITH ctf AS (SELECT n_id, word, CAST(COUNT(*) AS BIGINT) AS tf FROM (
             SELECT doc_id AS n_id, unnest(string_split(text, ' ')) AS word
             FROM documents WHERE doc_id >= 10)
           WHERE word <> '' GROUP BY 1, 2),
      dl AS (SELECT n_id, CAST(SUM(tf) AS BIGINT) AS dl FROM ctf GROUP BY 1),
      st AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd,
               CAST(SUM(dl) AS BIGINT) AS tok FROM dl),
      dfw AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS df FROM ctf GROUP BY 1),
      qt AS (SELECT DISTINCT q_id, word FROM (
               SELECT doc_id AS q_id, unnest(string_split(text, ' ')) AS word
               FROM documents WHERE doc_id < 10)
             WHERE word <> ''),
      terms AS (SELECT q.q_id, c.n_id, q.word, c.tf, f.df, d.dl
                FROM qt q JOIN ctf c USING (word) JOIN dfw f USING (word)
                JOIN dl d ON c.n_id = d.n_id),
      sc AS (SELECT q_id, n_id,
               ROUND(list_reduce(list_prepend(0.0, list(
                 ln((CAST(nd - df AS DOUBLE) + 0.5) /
                    (CAST(df AS DOUBLE) + 0.5) + 1.0)
                 * ((CAST(tf AS DOUBLE) * 2.2) /
                    (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 *
                      (CAST(dl AS DOUBLE) /
                        (CAST(tok AS DOUBLE) / CAST(nd AS DOUBLE))))))
                 ORDER BY word)), (a, b) -> a + b), 4) AS score
             FROM terms CROSS JOIN st GROUP BY q_id, n_id),
      lex20 AS (SELECT q_id, n_id, CAST(lr AS INT) AS lex_rank FROM (
                  SELECT q_id, n_id, ROW_NUMBER() OVER (PARTITION BY q_id
                    ORDER BY score DESC, n_id) AS lr FROM sc)
                WHERE lr <= 20),
      e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
      n AS (SELECT vec_id, v, sqrt(${foldDot.format("v", "v")}) nrm FROM e),
      q2 AS (SELECT vec_id q_id, v qv, nrm qn FROM n WHERE vec_id < 10),
      c2 AS (SELECT vec_id n_id, v cv, nrm cn FROM n WHERE vec_id >= 10),
      s2 AS (SELECT q_id, n_id,
               ${foldDot.format("qv", "cv")} / (qn * cn) AS cosine
             FROM q2 CROSS JOIN c2),
      vec20 AS (SELECT q_id, n_id, CAST(vr AS INT) AS vec_rank FROM (
                  SELECT q_id, n_id, ROW_NUMBER() OVER (PARTITION BY q_id
                    ORDER BY cosine DESC, n_id) AS vr FROM s2)
                WHERE vr <= 20),
      pool AS (SELECT COALESCE(l.q_id, v.q_id) AS q_id,
                 COALESCE(l.n_id, v.n_id) AS n_id, l.lex_rank, v.vec_rank
               FROM lex20 l FULL OUTER JOIN vec20 v
                 ON l.q_id = v.q_id AND l.n_id = v.n_id),
      fused AS (SELECT q_id, n_id, lex_rank, vec_rank,
                  COALESCE(1.0 / (60.0 + CAST(lex_rank AS DOUBLE)), 0.0)
                  + COALESCE(1.0 / (60.0 + CAST(vec_rank AS DOUBLE)), 0.0)
                    AS rrf
                FROM pool),
      r AS (SELECT q_id, n_id, lex_rank, vec_rank, rrf,
              ROW_NUMBER() OVER (PARTITION BY q_id
                ORDER BY rrf DESC, n_id) AS rnk
            FROM fused)
      SELECT q_id, n_id, lex_rank, vec_rank, rrf, CAST(rnk AS INT) AS rank
      FROM r WHERE rnk <= 10 ORDER BY q_id, rank"""))

  /** Persisted BM25 inverted index — the FOURTH stored index family
    * ([[graft.operators.TextIndex]]), delivering the scale path
    * [[s21]]'s lexical arm promises: a corpus tokenizes ONCE into a
    * bucket-partitioned postings store (postings with doc length
    * denormalized into every row, plus additive corpus stats, behind
    * one txlog commit), GROWS O(delta)
    * as new documents land (the installment's own three segments,
    * one manifest, existing segments unread — df is never stored, it
    * re-aggregates additively from the disjoint-by-doc postings, so
    * growth needs no read-modify-write of a global dictionary), and
    * serves BM25 top-k where the scan cost is Σ df(query terms)
    * postings: the query dictionary prunes the bucket partitions
    * statically and pushes a word-IN filter into the parquet row
    * groups. Installment 1 = even corpus doc_ids; installment 2
    * lands as its own file and grows the store; queries land as a
    * third file and search the GROWN index — documents.parquet is
    * absent from the search plan's scan set (plan-audited in
    * TextIndexSpec). The oracle recomputes full-corpus BM25 from
    * scratch (s21's lexical SQL), so the hash proves
    * build-grow-search of the stored index ≡ batch recompute. */
  val s22 = QueryDef(
    "s22_persisted_text_index",
    (sp, dir) => {
      val fp = graft.sources.IngestFixtures.fingerprint(s"$dir/documents.parquet")
      val store = graft.sources.IngestFixtures.path(s"s22_store_$fp")
      val land = graft.sources.IngestFixtures.path(s"s22_land_$fp")
      val qland = graft.sources.IngestFixtures.path(s"s22_q_$fp")
      graft.sources.IngestFixtures.once(s"s22_$fp") {
        import scala.reflect.io.Directory
        Seq(store, land, qland).foreach(p =>
          new Directory(new java.io.File(p)).deleteRecursively())
        val docs = Tables(sp, dir, "documents").select("doc_id", "text")
        // installment 1: initial index build
        graft.operators.TextIndex.writePostings(
          docs.filter(col("doc_id") >= 10 && col("doc_id") % 2 === 0), store)
        // installment 2 lands, tokenizes alone, grows the store
        graft.sources.IngestFixtures.addLandingFile(land,
          docs.filter(col("doc_id") >= 10 && col("doc_id") % 2 =!= 0),
          "batch2.parquet", 1700000700000L)
        graft.operators.TextIndex.appendDocs(sp, store,
          sp.read.parquet(land))
        graft.sources.IngestFixtures.addLandingFile(qland,
          docs.filter(col("doc_id") < 10),
          "queries.parquet", 1700000800000L)
      }
      graft.operators.TextIndex.searchBm25(sp, store,
          sp.read.parquet(qland), k = 10)
        .orderBy("q_id", "rank")
    },
    Some("""
      WITH ctf AS (SELECT n_id, word, CAST(COUNT(*) AS BIGINT) AS tf FROM (
             SELECT doc_id AS n_id, unnest(string_split(text, ' ')) AS word
             FROM documents WHERE doc_id >= 10)
           WHERE word <> '' GROUP BY 1, 2),
      dl AS (SELECT n_id, CAST(SUM(tf) AS BIGINT) AS dl FROM ctf GROUP BY 1),
      st AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd,
               CAST(SUM(dl) AS BIGINT) AS tok FROM dl),
      dfw AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS df FROM ctf GROUP BY 1),
      qt AS (SELECT DISTINCT q_id, word FROM (
               SELECT doc_id AS q_id, unnest(string_split(text, ' ')) AS word
               FROM documents WHERE doc_id < 10)
             WHERE word <> ''),
      terms AS (SELECT q.q_id, c.n_id, q.word, c.tf, f.df, d.dl
                FROM qt q JOIN ctf c USING (word) JOIN dfw f USING (word)
                JOIN dl d ON c.n_id = d.n_id),
      sc AS (SELECT q_id, n_id,
               ROUND(list_reduce(list_prepend(0.0, list(
                 ln((CAST(nd - df AS DOUBLE) + 0.5) /
                    (CAST(df AS DOUBLE) + 0.5) + 1.0)
                 * ((CAST(tf AS DOUBLE) * 2.2) /
                    (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 *
                      (CAST(dl AS DOUBLE) /
                        (CAST(tok AS DOUBLE) / CAST(nd AS DOUBLE))))))
                 ORDER BY word)), (a, b) -> a + b), 4) AS score
             FROM terms CROSS JOIN st GROUP BY q_id, n_id),
      r AS (SELECT q_id, n_id, score,
              ROW_NUMBER() OVER (PARTITION BY q_id
                ORDER BY score DESC, n_id) AS rnk
            FROM sc)
      SELECT q_id, n_id, score, CAST(rnk AS INT) AS rank
      FROM r WHERE rnk <= 10 ORDER BY q_id, rank"""))

  /** DELETE from the persisted IVF index — the FAISS `remove_ids`
    * contract, completing the stored-index verb set (build s15 /
    * grow s17 / compact s19 / DELETE here): doomed ids commit as one
    * keys-only tombstone segment ([[graft.operators.AnnIndex
    * .deleteVectors]] — O(deleted ids), zero postings rewritten,
    * centroids frozen: deletes never move the code space), and the
    * probe subtracts them with the txlog MoR version-aware anti-join
    * (a tombstone kills only postings committed before it, so a
    * later re-append revives the id — spec-proven in AnnIndexSpec
    * along with the physical apply via `compactPostingsMoR`). The
    * entry probes the TOMBSTONED store, so the subtraction join is
    * inside the oracle-hashed plan; the oracle recomputes the chain
    * with centroids from the FULL corpus but postings filtered to
    * the survivors — exactly the frozen-code-space semantics. */
  val s23 = QueryDef(
    "s23_ivf_delete",
    (sp, dir) => {
      val fp = graft.sources.IngestFixtures.fingerprint(s"$dir/embeddings.parquet")
      val store = graft.sources.IngestFixtures.path(s"s23_store_$fp")
      val qland = graft.sources.IngestFixtures.path(s"s23_q_$fp")
      graft.sources.IngestFixtures.once(s"s23_$fp") {
        import scala.reflect.io.Directory
        Seq(store, qland).foreach(p =>
          new Directory(new java.io.File(p)).deleteRecursively())
        val embs = Tables(sp, dir, "embeddings")
        val corpus = Similarity.prep(embs, "vec_id", "embedding")
          .join(embs.select(col("vec_id").as("id"), col("label")), "id")
          .filter(col("id") >= 10)
        graft.operators.AnnIndex.writeIvf(corpus, "label", store)
        graft.operators.AnnIndex.deleteVectors(sp, store,
          corpus.select("id").filter(pmod(col("id"), lit(7L)) === 0))
        graft.sources.IngestFixtures.addLandingFile(qland,
          embs.filter(col("vec_id") < 10).select("vec_id", "embedding"),
          "queries.parquet", 1700000900000L)
      }
      val queries = Similarity.prep(
        sp.read.parquet(qland), "vec_id", "embedding")
      graft.operators.AnnIndex.probeIvf(sp, store, queries,
          k = 5, nProbe = 2)
        .orderBy("q_id", "rank")
    },
    Some(s"""
      WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] v FROM embeddings),
      n AS (SELECT vec_id, label, v, sqrt(${foldDot.format("v", "v")}) nrm FROM e),
      q AS (SELECT vec_id q_id, v qv, nrm qn FROM n WHERE vec_id < 10),
      c AS (SELECT vec_id n_id, label cl, v cv, nrm cn FROM n WHERE vec_id >= 10),
      cx AS (SELECT n_id, cl,
               unnest(list_transform(cv, (x, i) -> {'pos': i - 1, 'x': x}),
                 recursive := true)
             FROM c),
      cm AS (SELECT cl, pos,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list(x ORDER BY n_id)), (a, b) -> a + b) / COUNT(*) AS m
             FROM cx GROUP BY cl, pos),
      cents AS (SELECT cl, list(m ORDER BY pos) AS cv FROM cm
                GROUP BY cl),
      cn AS (SELECT cl, cv, sqrt(${foldDot.format("cv", "cv")}) AS cn
             FROM cents),
      cp AS (SELECT n_id, cl, cv, cn FROM c WHERE NOT n_id % 7 = 0),
      probe AS (SELECT q_id, qv, qn, cl,
                  ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY
                    ${foldDot.format("qv", "cv")} / (qn * cn.cn) DESC, cl)
                    AS probe_rank
                FROM q CROSS JOIN cn),
      routed AS (SELECT q_id, qv, qn, cl FROM probe WHERE probe_rank <= 2),
      s AS (SELECT q_id, n_id, ${foldDot.format("qv", "cv")} / (qn * cn) AS cosine
            FROM routed r JOIN cp USING (cl)),
      r AS (SELECT q_id, n_id, cosine,
              ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) rnk
            FROM s)
      SELECT q_id, n_id, cosine, CAST(rnk AS INT) AS rank
      FROM r WHERE rnk <= 5 ORDER BY q_id, rank"""))

  /** GROW the persisted IVFPQ store — the one O(delta) gap [[s20]]
    * left ([[graft.operators.AnnIndex.writePqPostings]] rebuilds the
    * whole corpus' code lists — right for a code-space change, wrong
    * as the ingest path): installment 2's vectors route to their
    * nearest FROZEN centroid and encode against the FROZEN codebook
    * ([[graft.operators.AnnIndex.appendPqVectors]]), landing as one
    * postings + one pqposts segment behind ONE atomic commit — a
    * probe never sees a store whose full-precision postings and code
    * lists disagree, existing segments are neither read nor
    * rewritten (spec-asserted byte-identical), and the only reads
    * are the dimension-sized centroids + codebook. The probe runs
    * the full two-stage IVFADC search over the GROWN store; the
    * oracle recomputes the whole chain — label centroids from
    * installment 1, installment 2 assigned by frozen-centroid argmax
    * (s17's rule), ALL vectors coded against the frozen codebook
    * (s20's ADC chain) — so a grow that moved the code space, routed
    * against retrained centroids, or desynced the two families
    * breaks the hash. */
  val s26 = QueryDef(
    "s26_ivfpq_append",
    (sp, dir) => {
      val fp = graft.sources.IngestFixtures.fingerprint(s"$dir/embeddings.parquet")
      val store = graft.sources.IngestFixtures.path(s"s26_store_$fp")
      val land = graft.sources.IngestFixtures.path(s"s26_land_$fp")
      val qland = graft.sources.IngestFixtures.path(s"s26_q_$fp")
      graft.sources.IngestFixtures.once(s"s26_$fp") {
        import scala.reflect.io.Directory
        Seq(store, land, qland).foreach(p =>
          new Directory(new java.io.File(p)).deleteRecursively())
        val embs = Tables(sp, dir, "embeddings")
        val corpus0 = Similarity.prep(
            embs.filter(col("vec_id") >= 10 && col("vec_id") % 2 === 0),
            "vec_id", "embedding")
          .join(embs.select(col("vec_id").as("id"), col("label")), "id")
        graft.operators.AnnIndex.writeIvf(corpus0, "label", store)
        graft.operators.AnnIndex.writePq(
          corpus0.select("id", "v"),
          corpus0.select(col("id"), col("v"), col("label")),
          m = 2, dim = 64, store)
        graft.operators.AnnIndex.writePqPostings(sp, store, m = 2, dim = 64)
        graft.sources.IngestFixtures.addLandingFile(land,
          embs.filter(col("vec_id") >= 10 && col("vec_id") % 2 =!= 0)
            .select("vec_id", "embedding"),
          "batch2.parquet", 1700001300000L)
        graft.operators.AnnIndex.appendPqVectors(sp, store,
          Similarity.prep(sp.read.parquet(land), "vec_id", "embedding"),
          m = 2, dim = 64)
        graft.sources.IngestFixtures.addLandingFile(qland,
          embs.filter(col("vec_id") < 10).select("vec_id", "embedding"),
          "queries.parquet", 1700001400000L)
      }
      val queries = Similarity.prep(
        sp.read.parquet(qland), "vec_id", "embedding")
      graft.operators.AnnIndex.probeIvfPq(sp, store, queries,
          k = 5, nProbe = 2, shortlist = 10, m = 2, dim = 64)
        .orderBy("q_id", "rank")
    },
    Some(s"""
      WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] v FROM embeddings),
      n AS (SELECT vec_id, label, v, sqrt(${foldDot.format("v", "v")}) nrm FROM e),
      q AS (SELECT vec_id q_id, v qv, nrm qn FROM n WHERE vec_id < 10),
      ceven AS (SELECT vec_id n_id, label cl, v cv, nrm cn FROM n
                WHERE vec_id >= 10 AND vec_id % 2 = 0),
      codd AS (SELECT vec_id n_id, v cv, nrm cn FROM n
               WHERE vec_id >= 10 AND vec_id % 2 <> 0),
      cx AS (SELECT n_id, cl,
               unnest(list_transform(cv, (x, i) -> {'pos': i - 1, 'x': x}),
                 recursive := true)
             FROM ceven),
      cm AS (SELECT cl, pos,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list(x ORDER BY n_id)), (a, b) -> a + b) / COUNT(*) AS m
             FROM cx GROUP BY cl, pos),
      cents AS (SELECT cl, list(m ORDER BY pos) AS cv FROM cm
                GROUP BY cl),
      cnn AS (SELECT cl, cv, sqrt(${foldDot.format("cv", "cv")}) AS cn
              FROM cents),
      assign AS (SELECT n_id, cl, cv0 AS cv, cn0 AS cn FROM (
            SELECT o.n_id, c.cl, o.cv AS cv0, o.cn AS cn0,
              ROW_NUMBER() OVER (PARTITION BY o.n_id ORDER BY
                ${foldDot.format("o.cv", "c.cv")} / (o.cn * c.cn) DESC,
                c.cl) AS rk
            FROM codd o CROSS JOIN cnn c) WHERE rk = 1),
      posts AS (SELECT n_id, cl, cv, cn FROM ceven
                UNION ALL SELECT n_id, cl, cv, cn FROM assign),
      probe AS (SELECT q_id, cl,
                  ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY
                    ${foldDot.format("qv", "cv")} / (qn * cnn.cn) DESC, cl)
                    AS probe_rank
                FROM q CROSS JOIN cnn),
      routed AS (SELECT q_id, cl FROM probe WHERE probe_rank <= 2),
      pairs AS (SELECT n_id, cl AS cb,
          ${foldDot.format("list_slice(pv, 1, 32)", "list_slice(pv, 1, 32)")}
            - 2.0 * ${foldDot.format("list_slice(pv, 1, 32)", "list_slice(cents.cv, 1, 32)")}
            + ${foldDot.format("list_slice(cents.cv, 1, 32)", "list_slice(cents.cv, 1, 32)")} AS d0,
          ${foldDot.format("list_slice(pv, 33, 64)", "list_slice(pv, 33, 64)")}
            - 2.0 * ${foldDot.format("list_slice(pv, 33, 64)", "list_slice(cents.cv, 33, 64)")}
            + ${foldDot.format("list_slice(cents.cv, 33, 64)", "list_slice(cents.cv, 33, 64)")} AS d1
        FROM (SELECT n_id, cv AS pv FROM posts) cc CROSS JOIN cents),
      b0 AS (SELECT n_id, cb AS code0 FROM (
               SELECT n_id, cb, ROW_NUMBER() OVER (PARTITION BY n_id
                 ORDER BY d0, cb) rn FROM pairs) WHERE rn = 1),
      b1 AS (SELECT n_id, cb AS code1 FROM (
               SELECT n_id, cb, ROW_NUMBER() OVER (PARTITION BY n_id
                 ORDER BY d1, cb) rn FROM pairs) WHERE rn = 1),
      codes AS (SELECT b0.n_id, code0, code1 FROM b0 JOIN b1 USING (n_id)),
      lut AS (SELECT q_id, cl AS cb,
          ${foldDot.format("list_slice(qv, 1, 32)", "list_slice(qv, 1, 32)")}
            - 2.0 * ${foldDot.format("list_slice(qv, 1, 32)", "list_slice(cents.cv, 1, 32)")}
            + ${foldDot.format("list_slice(cents.cv, 1, 32)", "list_slice(cents.cv, 1, 32)")} AS d0,
          ${foldDot.format("list_slice(qv, 33, 64)", "list_slice(qv, 33, 64)")}
            - 2.0 * ${foldDot.format("list_slice(qv, 33, 64)", "list_slice(cents.cv, 33, 64)")}
            + ${foldDot.format("list_slice(cents.cv, 33, 64)", "list_slice(cents.cv, 33, 64)")} AS d1
        FROM q CROSS JOIN cents),
      cand AS (SELECT r.q_id, posts.n_id, codes.code0, codes.code1
               FROM routed r JOIN posts USING (cl)
               JOIN codes ON codes.n_id = posts.n_id),
      adc AS (SELECT cand.q_id, cand.n_id, l0.d0 + l1.d1 AS adc
              FROM cand
              JOIN lut l0 ON l0.q_id = cand.q_id AND l0.cb = cand.code0
              JOIN lut l1 ON l1.q_id = cand.q_id AND l1.cb = cand.code1),
      short AS (SELECT q_id, n_id, adc FROM (
                  SELECT q_id, n_id, adc, ROW_NUMBER() OVER (
                    PARTITION BY q_id ORDER BY adc, n_id) sr FROM adc)
                WHERE sr <= 10),
      ex AS (SELECT s2.q_id, s2.n_id, s2.adc,
               ${foldDot.format("q.qv", "posts.cv")} / (q.qn * posts.cn) AS cosine
             FROM short s2 JOIN posts ON posts.n_id = s2.n_id
             JOIN q ON q.q_id = s2.q_id),
      r AS (SELECT q_id, n_id, adc, cosine,
              ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) rnk
            FROM ex)
      SELECT q_id, n_id, adc, cosine, CAST(rnk AS INT) AS rank
      FROM r WHERE rnk <= 5 ORDER BY q_id, rank"""))

  /** OPTIMIZE-cadence maintenance as policy ([[graft.operators
    * .AnnIndex.maintain]]) — the trigger that keeps the
    * log-structured bargain bounded BY CONSTRUCTION: three O(delta)
    * grows leave the postings family over the entry's segment-count
    * threshold, `maintain` folds it back to ONE segment (partition
    * layout inferred from the segment dirs; sibling centroids under
    * threshold, untouched; each compaction its own atomic commit),
    * and the probe of the maintained store must hash-match the
    * from-scratch batch recompute — so the maintenance path is
    * oracle-gated, not just spec-gated. The fixture REQUIRES that
    * maintain reported exactly the postings fold, so a silently
    * no-op trigger fails the build rather than passing on the
    * unmaintained store. Oracle: frozen label centroids from
    * installment 1, installments 2-4 assigned by frozen-centroid
    * argmax (s17's rule). */
  val s27 = QueryDef(
    "s27_ivf_maintain",
    (sp, dir) => {
      val fp = graft.sources.IngestFixtures.fingerprint(s"$dir/embeddings.parquet")
      val store = graft.sources.IngestFixtures.path(s"s27_store_$fp")
      val qland = graft.sources.IngestFixtures.path(s"s27_q_$fp")
      graft.sources.IngestFixtures.once(s"s27_$fp") {
        import scala.reflect.io.Directory
        Seq(store, qland).foreach(p =>
          new Directory(new java.io.File(p)).deleteRecursively())
        val embs = Tables(sp, dir, "embeddings")
        val corpus0 = Similarity.prep(
            embs.filter(col("vec_id") >= 10 && col("vec_id") % 4 === 0),
            "vec_id", "embedding")
          .join(embs.select(col("vec_id").as("id"), col("label")), "id")
        graft.operators.AnnIndex.writeIvf(corpus0, "label", store)
        (1L to 3L).foreach { r =>
          graft.operators.AnnIndex.appendVectors(sp, store,
            Similarity.prep(
              embs.filter(col("vec_id") >= 10 && col("vec_id") % 4 === r),
              "vec_id", "embedding"))
        }
        val done = graft.operators.AnnIndex.maintain(sp, store, threshold = 3)
        require(done.map(_._1) == Seq("postings"),
          s"s27: maintain must fold exactly the postings family, got $done")
        graft.sources.IngestFixtures.addLandingFile(qland,
          embs.filter(col("vec_id") < 10).select("vec_id", "embedding"),
          "queries.parquet", 1700001500000L)
      }
      val queries = Similarity.prep(
        sp.read.parquet(qland), "vec_id", "embedding")
      graft.operators.AnnIndex.probeIvf(sp, store, queries,
          k = 5, nProbe = 2)
        .orderBy("q_id", "rank")
    },
    Some(s"""
      WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] v FROM embeddings),
      n AS (SELECT vec_id, label, v, sqrt(${foldDot.format("v", "v")}) nrm FROM e),
      q AS (SELECT vec_id q_id, v qv, nrm qn FROM n WHERE vec_id < 10),
      c0 AS (SELECT vec_id n_id, label cl, v cv, nrm cn FROM n
             WHERE vec_id >= 10 AND vec_id % 4 = 0),
      crest AS (SELECT vec_id n_id, v cv, nrm cn FROM n
                WHERE vec_id >= 10 AND vec_id % 4 <> 0),
      cx AS (SELECT n_id, cl,
               unnest(list_transform(cv, (x, i) -> {'pos': i - 1, 'x': x}),
                 recursive := true)
             FROM c0),
      cm AS (SELECT cl, pos,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list(x ORDER BY n_id)), (a, b) -> a + b) / COUNT(*) AS m
             FROM cx GROUP BY cl, pos),
      cents AS (SELECT cl, list(m ORDER BY pos) AS cv FROM cm
                GROUP BY cl),
      cn AS (SELECT cl, cv, sqrt(${foldDot.format("cv", "cv")}) AS cn
             FROM cents),
      assign AS (SELECT n_id, cl, cv0 AS cv, cn0 AS cn FROM (
            SELECT o.n_id, c.cl, o.cv AS cv0, o.cn AS cn0,
              ROW_NUMBER() OVER (PARTITION BY o.n_id ORDER BY
                ${foldDot.format("o.cv", "c.cv")} / (o.cn * c.cn) DESC,
                c.cl) AS rk
            FROM crest o CROSS JOIN cn c) WHERE rk = 1),
      posts AS (SELECT n_id, cl, cv, cn FROM c0
                UNION ALL SELECT n_id, cl, cv, cn FROM assign),
      probe AS (SELECT q_id, qv, qn, cl,
                  ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY
                    ${foldDot.format("qv", "cv")} / (qn * cn.cn) DESC, cl)
                    AS probe_rank
                FROM q CROSS JOIN cn),
      routed AS (SELECT q_id, qv, qn, cl FROM probe WHERE probe_rank <= 2),
      s AS (SELECT q_id, n_id, ${foldDot.format("qv", "cv")} / (qn * cn) AS cosine
            FROM routed r JOIN posts USING (cl)),
      r AS (SELECT q_id, n_id, cosine,
              ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) rnk
            FROM s)
      SELECT q_id, n_id, cosine, CAST(rnk AS INT) AS rank
      FROM r WHERE rnk <= 5 ORDER BY q_id, rank"""))

  /** Stored-index HYBRID search — the production RAG probe [[s21]]
    * promises, run end to end against TWO PERSISTED indexes with no
    * corpus rescan on either arm: the lexical arm probes the stored
    * BM25 inverted index (s22's `TextIndex.searchBm25` — Σ df(query
    * terms)-bounded scan, bucket prune + word-IN pushdown, dl
    * denormalized in the postings), the vector arm probes the stored
    * IVF index (s15's `AnnIndex.probeIvf` — broadcast routing,
    * partition-pruned postings scan), and the two top-20 rank lists
    * fuse by reciprocal-rank fusion (RRF k=60, s21's exact fold:
    * fixed lex-then-vec sum of exact-rank divisions, no rounding
    * needed). documents.parquet and embeddings.parquet are BOTH
    * absent from the plan's scan set (plan-audited) — at 100 TB the
    * corpus is touched only through the two indexes' pruned
    * partitions. The oracle recomputes both arms from scratch
    * (full-corpus BM25 + label-frozen IVF routing) and fuses in SQL,
    * so the hash proves the stored-index composition ≡ the batch
    * recompute. */
  val s24 = QueryDef(
    "s24_stored_hybrid",
    (sp, dir) => {
      import org.apache.spark.sql.expressions.Window
      val fpD = graft.sources.IngestFixtures.fingerprint(s"$dir/documents.parquet")
      val fpE = graft.sources.IngestFixtures.fingerprint(s"$dir/embeddings.parquet")
      val tstore = graft.sources.IngestFixtures.path(s"s24_text_$fpD")
      val vstore = graft.sources.IngestFixtures.path(s"s24_ivf_$fpE")
      val qtext = graft.sources.IngestFixtures.path(s"s24_qt_$fpD")
      val qvec = graft.sources.IngestFixtures.path(s"s24_qv_$fpE")
      graft.sources.IngestFixtures.once(s"s24_${fpD}_$fpE") {
        import scala.reflect.io.Directory
        Seq(tstore, vstore, qtext, qvec).foreach(p =>
          new Directory(new java.io.File(p)).deleteRecursively())
        val docs = Tables(sp, dir, "documents").select("doc_id", "text")
        graft.operators.TextIndex.writePostings(
          docs.filter(col("doc_id") >= 10 && col("doc_id") % 2 === 0), tstore)
        graft.operators.TextIndex.appendDocs(sp, tstore,
          docs.filter(col("doc_id") >= 10 && col("doc_id") % 2 =!= 0))
        graft.sources.IngestFixtures.addLandingFile(qtext,
          docs.filter(col("doc_id") < 10),
          "queries.parquet", 1700001100000L)
        val embs = Tables(sp, dir, "embeddings")
        val corpus = Similarity.prep(embs, "vec_id", "embedding")
          .join(embs.select(col("vec_id").as("id"), col("label")), "id")
          .filter(col("id") >= 10)
        graft.operators.AnnIndex.writeIvf(corpus, "label", vstore)
        graft.sources.IngestFixtures.addLandingFile(qvec,
          embs.filter(col("vec_id") < 10).select("vec_id", "embedding"),
          "queries.parquet", 1700001200000L)
      }
      val lex20 = graft.operators.TextIndex.searchBm25(sp, tstore,
          sp.read.parquet(qtext), k = 20)
        .select(col("q_id"), col("n_id"), col("rank").as("lex_rank"))
      val vec20 = graft.operators.AnnIndex.probeIvf(sp, vstore,
          Similarity.prep(sp.read.parquet(qvec), "vec_id", "embedding"),
          k = 20, nProbe = 2)
        .select(col("q_id"), col("n_id"),
          col("rank").cast("int").as("vec_rank"))
      val pool = lex20.join(vec20, Seq("q_id", "n_id"), "full_outer")
      val rrf =
        coalesce(lit(1.0) / (lit(60.0) + col("lex_rank").cast("double")), lit(0.0)) +
        coalesce(lit(1.0) / (lit(60.0) + col("vec_rank").cast("double")), lit(0.0))
      val wf = Window.partitionBy("q_id").orderBy(col("rrf").desc, col("n_id"))
      pool.withColumn("rrf", rrf)
        .withColumn("rank", row_number().over(wf))
        .filter(col("rank") <= 10)
        .select(col("q_id"), col("n_id"), col("lex_rank"), col("vec_rank"),
          col("rrf"), col("rank").cast("int").as("rank"))
        .orderBy("q_id", "rank")
    },
    Some(s"""
      WITH ctf AS (SELECT n_id, word, CAST(COUNT(*) AS BIGINT) AS tf FROM (
             SELECT doc_id AS n_id, unnest(string_split(text, ' ')) AS word
             FROM documents WHERE doc_id >= 10)
           WHERE word <> '' GROUP BY 1, 2),
      dl AS (SELECT n_id, CAST(SUM(tf) AS BIGINT) AS dl FROM ctf GROUP BY 1),
      st AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd,
               CAST(SUM(dl) AS BIGINT) AS tok FROM dl),
      dfw AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS df FROM ctf GROUP BY 1),
      qt AS (SELECT DISTINCT q_id, word FROM (
               SELECT doc_id AS q_id, unnest(string_split(text, ' ')) AS word
               FROM documents WHERE doc_id < 10)
             WHERE word <> ''),
      terms AS (SELECT q.q_id, c.n_id, q.word, c.tf, f.df, d.dl
                FROM qt q JOIN ctf c USING (word) JOIN dfw f USING (word)
                JOIN dl d ON c.n_id = d.n_id),
      sc AS (SELECT q_id, n_id,
               ROUND(list_reduce(list_prepend(0.0, list(
                 ln((CAST(nd - df AS DOUBLE) + 0.5) /
                    (CAST(df AS DOUBLE) + 0.5) + 1.0)
                 * ((CAST(tf AS DOUBLE) * 2.2) /
                    (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 *
                      (CAST(dl AS DOUBLE) /
                        (CAST(tok AS DOUBLE) / CAST(nd AS DOUBLE))))))
                 ORDER BY word)), (a, b) -> a + b), 4) AS score
             FROM terms CROSS JOIN st GROUP BY q_id, n_id),
      lex20 AS (SELECT q_id, n_id, CAST(lr AS INT) AS lex_rank FROM (
                  SELECT q_id, n_id, ROW_NUMBER() OVER (PARTITION BY q_id
                    ORDER BY score DESC, n_id) AS lr FROM sc)
                WHERE lr <= 20),
      e AS (SELECT vec_id, label, embedding::DOUBLE[] v FROM embeddings),
      n AS (SELECT vec_id, label, v, sqrt(${foldDot.format("v", "v")}) nrm FROM e),
      q2 AS (SELECT vec_id q_id, v qv, nrm qn FROM n WHERE vec_id < 10),
      c2 AS (SELECT vec_id n_id, label cl, v cv, nrm cn FROM n WHERE vec_id >= 10),
      cx AS (SELECT n_id, cl,
               unnest(list_transform(cv, (x, i) -> {'pos': i - 1, 'x': x}),
                 recursive := true)
             FROM c2),
      cm AS (SELECT cl, pos,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list(x ORDER BY n_id)), (a, b) -> a + b) / COUNT(*) AS m
             FROM cx GROUP BY cl, pos),
      cents AS (SELECT cl, list(m ORDER BY pos) AS cv FROM cm GROUP BY cl),
      cn AS (SELECT cl, cv, sqrt(${foldDot.format("cv", "cv")}) AS cn
             FROM cents),
      probe AS (SELECT q_id, qv, qn, cl,
                  ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY
                    ${foldDot.format("qv", "cv")} / (qn * cn.cn) DESC, cl)
                    AS probe_rank
                FROM q2 CROSS JOIN cn),
      routed AS (SELECT q_id, qv, qn, cl FROM probe WHERE probe_rank <= 2),
      s2 AS (SELECT q_id, n_id, ${foldDot.format("qv", "cv")} / (qn * cn) AS cosine
             FROM routed r JOIN c2 USING (cl)),
      vec20 AS (SELECT q_id, n_id, CAST(vr AS INT) AS vec_rank FROM (
                  SELECT q_id, n_id, ROW_NUMBER() OVER (PARTITION BY q_id
                    ORDER BY cosine DESC, n_id) AS vr FROM s2)
                WHERE vr <= 20),
      pool AS (SELECT COALESCE(l.q_id, v.q_id) AS q_id,
                 COALESCE(l.n_id, v.n_id) AS n_id, l.lex_rank, v.vec_rank
               FROM lex20 l FULL OUTER JOIN vec20 v
                 ON l.q_id = v.q_id AND l.n_id = v.n_id),
      fused AS (SELECT q_id, n_id, lex_rank, vec_rank,
                  COALESCE(1.0 / (60.0 + CAST(lex_rank AS DOUBLE)), 0.0)
                  + COALESCE(1.0 / (60.0 + CAST(vec_rank AS DOUBLE)), 0.0)
                    AS rrf
                FROM pool),
      r AS (SELECT q_id, n_id, lex_rank, vec_rank, rrf,
              ROW_NUMBER() OVER (PARTITION BY q_id
                ORDER BY rrf DESC, n_id) AS rnk
            FROM fused)
      SELECT q_id, n_id, lex_rank, vec_rank, rrf, CAST(rnk AS INT) AS rank
      FROM r WHERE rnk <= 10 ORDER BY q_id, rank"""))

  /** DELETE from the persisted BM25 text index — [[s23]]'s
    * `remove_ids` contract on the LEXICAL store, completing its verb
    * set (build s22 / grow s22 / compact via the MoR-aware
    * [[graft.operators.TextIndex.compactIndexMoR]] / DELETE here):
    * doomed docs commit as ONE keys-only tombstone segment carrying
    * (n_id, dl) — O(deleted docs), zero postings rewritten — and the
    * search subtracts them with the version-aware MoR anti-join
    * (bucket/word pruning pushes through its left side, so the scan
    * stays Σ df(query terms)-bounded) while the corpus stats (nd,
    * tok) subtract the recorded doc lengths exactly. The entry
    * searches the TOMBSTONED store, so both subtractions sit inside
    * the oracle-hashed plan; the oracle recomputes full BM25 from
    * scratch over the SURVIVING docs — df, dl, nd and tok must all
    * agree exactly or the scores (and the hash) diverge. Raw
    * compactFamily on a tombstoned postings family is guarded
    * loudly (it would resurrect the deleted rows; spec-proven in
    * TextIndexSpec). */
  val s25 = QueryDef(
    "s25_text_delete",
    (sp, dir) => {
      val fp = graft.sources.IngestFixtures.fingerprint(s"$dir/documents.parquet")
      val store = graft.sources.IngestFixtures.path(s"s25_store_$fp")
      val qland = graft.sources.IngestFixtures.path(s"s25_q_$fp")
      graft.sources.IngestFixtures.once(s"s25_$fp") {
        import scala.reflect.io.Directory
        Seq(store, qland).foreach(p =>
          new Directory(new java.io.File(p)).deleteRecursively())
        val docs = Tables(sp, dir, "documents").select("doc_id", "text")
        graft.operators.TextIndex.writePostings(
          docs.filter(col("doc_id") >= 10 && col("doc_id") % 2 === 0), store)
        graft.operators.TextIndex.appendDocs(sp, store,
          docs.filter(col("doc_id") >= 10 && col("doc_id") % 2 =!= 0))
        graft.operators.TextIndex.deleteDocs(sp, store,
          docs.select("doc_id")
            .filter(col("doc_id") >= 10 && pmod(col("doc_id"), lit(7L)) === 0))
        graft.sources.IngestFixtures.addLandingFile(qland,
          docs.filter(col("doc_id") < 10),
          "queries.parquet", 1700001000000L)
      }
      graft.operators.TextIndex.searchBm25(sp, store,
          sp.read.parquet(qland), k = 10)
        .orderBy("q_id", "rank")
    },
    Some("""
      WITH ctf AS (SELECT n_id, word, CAST(COUNT(*) AS BIGINT) AS tf FROM (
             SELECT doc_id AS n_id, unnest(string_split(text, ' ')) AS word
             FROM documents WHERE doc_id >= 10 AND doc_id % 7 <> 0)
           WHERE word <> '' GROUP BY 1, 2),
      dl AS (SELECT n_id, CAST(SUM(tf) AS BIGINT) AS dl FROM ctf GROUP BY 1),
      st AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd,
               CAST(SUM(dl) AS BIGINT) AS tok FROM dl),
      dfw AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS df FROM ctf GROUP BY 1),
      qt AS (SELECT DISTINCT q_id, word FROM (
               SELECT doc_id AS q_id, unnest(string_split(text, ' ')) AS word
               FROM documents WHERE doc_id < 10)
             WHERE word <> ''),
      terms AS (SELECT q.q_id, c.n_id, q.word, c.tf, f.df, d.dl
                FROM qt q JOIN ctf c USING (word) JOIN dfw f USING (word)
                JOIN dl d ON c.n_id = d.n_id),
      sc AS (SELECT q_id, n_id,
               ROUND(list_reduce(list_prepend(0.0, list(
                 ln((CAST(nd - df AS DOUBLE) + 0.5) /
                    (CAST(df AS DOUBLE) + 0.5) + 1.0)
                 * ((CAST(tf AS DOUBLE) * 2.2) /
                    (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 *
                      (CAST(dl AS DOUBLE) /
                        (CAST(tok AS DOUBLE) / CAST(nd AS DOUBLE))))))
                 ORDER BY word)), (a, b) -> a + b), 4) AS score
             FROM terms CROSS JOIN st GROUP BY q_id, n_id),
      r AS (SELECT q_id, n_id, score,
              ROW_NUMBER() OVER (PARTITION BY q_id
                ORDER BY score DESC, n_id) AS rnk
            FROM sc)
      SELECT q_id, n_id, score, CAST(rnk AS INT) AS rank
      FROM r WHERE rnk <= 10 ORDER BY q_id, rank"""))

  /** Hybrid search over the IVFPQ arm — [[s24]]'s stored-index RAG
    * probe upgraded to the BIG-CORPUS vector posture: the lexical arm
    * is unchanged (stored BM25, Σ df(query terms)-bounded), but the
    * vector arm probes the s26-GROWN IVFPQ store through the full ADC
    * chain ([[graft.operators.AnnIndex.probeIvfPq]] — broadcast
    * centroid routing, partition-pruned PQ code lists at m small ints
    * per candidate, exact re-rank on the shortlist only), so at
    * 100 TB the vector arm's full-precision reads are
    * shortlist × |queries| rows, never the candidates. Both arms'
    * top-20 lists fuse by RRF (k=60, s24's exact fold); both
    * documents.parquet and embeddings.parquet are absent from the
    * plan's scan set (plan-audited). The oracle recomputes the
    * lexical arm from scratch AND the full IVFPQ chain (frozen
    * centroids, frozen codebook, grown assignments, ADC shortlist,
    * exact re-rank) in SQL, then fuses — the stored three-family
    * composition must hash-match the batch recompute end to end. */
  val s28 = QueryDef(
    "s28_ivfpq_hybrid",
    (sp, dir) => {
      import org.apache.spark.sql.expressions.Window
      val fpD = graft.sources.IngestFixtures.fingerprint(s"$dir/documents.parquet")
      val fpE = graft.sources.IngestFixtures.fingerprint(s"$dir/embeddings.parquet")
      val tstore = graft.sources.IngestFixtures.path(s"s28_text_$fpD")
      val vstore = graft.sources.IngestFixtures.path(s"s28_pq_$fpE")
      val qtext = graft.sources.IngestFixtures.path(s"s28_qt_$fpD")
      val qvec = graft.sources.IngestFixtures.path(s"s28_qv_$fpE")
      graft.sources.IngestFixtures.once(s"s28_${fpD}_$fpE") {
        import scala.reflect.io.Directory
        Seq(tstore, vstore, qtext, qvec).foreach(p =>
          new Directory(new java.io.File(p)).deleteRecursively())
        val docs = Tables(sp, dir, "documents").select("doc_id", "text")
        graft.operators.TextIndex.writePostings(
          docs.filter(col("doc_id") >= 10 && col("doc_id") % 2 === 0), tstore)
        graft.operators.TextIndex.appendDocs(sp, tstore,
          docs.filter(col("doc_id") >= 10 && col("doc_id") % 2 =!= 0))
        graft.sources.IngestFixtures.addLandingFile(qtext,
          docs.filter(col("doc_id") < 10),
          "queries.parquet", 1700001600000L)
        val embs = Tables(sp, dir, "embeddings")
        val corpus0 = Similarity.prep(
            embs.filter(col("vec_id") >= 10 && col("vec_id") % 2 === 0),
            "vec_id", "embedding")
          .join(embs.select(col("vec_id").as("id"), col("label")), "id")
        graft.operators.AnnIndex.writeIvf(corpus0, "label", vstore)
        graft.operators.AnnIndex.writePq(
          corpus0.select("id", "v"),
          corpus0.select(col("id"), col("v"), col("label")),
          m = 2, dim = 64, vstore)
        graft.operators.AnnIndex.writePqPostings(sp, vstore, m = 2, dim = 64)
        graft.operators.AnnIndex.appendPqVectors(sp, vstore,
          Similarity.prep(
            embs.filter(col("vec_id") >= 10 && col("vec_id") % 2 =!= 0),
            "vec_id", "embedding"),
          m = 2, dim = 64)
        graft.sources.IngestFixtures.addLandingFile(qvec,
          embs.filter(col("vec_id") < 10).select("vec_id", "embedding"),
          "queries.parquet", 1700001700000L)
      }
      val lex20 = graft.operators.TextIndex.searchBm25(sp, tstore,
          sp.read.parquet(qtext), k = 20)
        .select(col("q_id"), col("n_id"), col("rank").as("lex_rank"))
      val vec20 = graft.operators.AnnIndex.probeIvfPq(sp, vstore,
          Similarity.prep(sp.read.parquet(qvec), "vec_id", "embedding"),
          k = 20, nProbe = 2, shortlist = 30, m = 2, dim = 64)
        .select(col("q_id"), col("n_id"),
          col("rank").cast("int").as("vec_rank"))
      val pool = lex20.join(vec20, Seq("q_id", "n_id"), "full_outer")
      val rrf =
        coalesce(lit(1.0) / (lit(60.0) + col("lex_rank").cast("double")), lit(0.0)) +
        coalesce(lit(1.0) / (lit(60.0) + col("vec_rank").cast("double")), lit(0.0))
      val wf = Window.partitionBy("q_id").orderBy(col("rrf").desc, col("n_id"))
      pool.withColumn("rrf", rrf)
        .withColumn("rank", row_number().over(wf))
        .filter(col("rank") <= 10)
        .select(col("q_id"), col("n_id"), col("lex_rank"), col("vec_rank"),
          col("rrf"), col("rank").cast("int").as("rank"))
        .orderBy("q_id", "rank")
    },
    Some(s"""
      WITH ctf AS (SELECT n_id, word, CAST(COUNT(*) AS BIGINT) AS tf FROM (
             SELECT doc_id AS n_id, unnest(string_split(text, ' ')) AS word
             FROM documents WHERE doc_id >= 10)
           WHERE word <> '' GROUP BY 1, 2),
      dl AS (SELECT n_id, CAST(SUM(tf) AS BIGINT) AS dl FROM ctf GROUP BY 1),
      st AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd,
               CAST(SUM(dl) AS BIGINT) AS tok FROM dl),
      dfw AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS df FROM ctf GROUP BY 1),
      qt AS (SELECT DISTINCT q_id, word FROM (
               SELECT doc_id AS q_id, unnest(string_split(text, ' ')) AS word
               FROM documents WHERE doc_id < 10)
             WHERE word <> ''),
      terms AS (SELECT q.q_id, c.n_id, q.word, c.tf, f.df, d.dl
                FROM qt q JOIN ctf c USING (word) JOIN dfw f USING (word)
                JOIN dl d ON c.n_id = d.n_id),
      sc AS (SELECT q_id, n_id,
               ROUND(list_reduce(list_prepend(0.0, list(
                 ln((CAST(nd - df AS DOUBLE) + 0.5) /
                    (CAST(df AS DOUBLE) + 0.5) + 1.0)
                 * ((CAST(tf AS DOUBLE) * 2.2) /
                    (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 *
                      (CAST(dl AS DOUBLE) /
                        (CAST(tok AS DOUBLE) / CAST(nd AS DOUBLE))))))
                 ORDER BY word)), (a, b) -> a + b), 4) AS score
             FROM terms CROSS JOIN st GROUP BY q_id, n_id),
      lex20 AS (SELECT q_id, n_id, CAST(lr AS INT) AS lex_rank FROM (
                  SELECT q_id, n_id, ROW_NUMBER() OVER (PARTITION BY q_id
                    ORDER BY score DESC, n_id) AS lr FROM sc)
                WHERE lr <= 20),
      e AS (SELECT vec_id, label, embedding::DOUBLE[] v FROM embeddings),
      n AS (SELECT vec_id, label, v, sqrt(${foldDot.format("v", "v")}) nrm FROM e),
      q AS (SELECT vec_id q_id, v qv, nrm qn FROM n WHERE vec_id < 10),
      ceven AS (SELECT vec_id n_id, label cl, v cv, nrm cn FROM n
                WHERE vec_id >= 10 AND vec_id % 2 = 0),
      codd AS (SELECT vec_id n_id, v cv, nrm cn FROM n
               WHERE vec_id >= 10 AND vec_id % 2 <> 0),
      cx AS (SELECT n_id, cl,
               unnest(list_transform(cv, (x, i) -> {'pos': i - 1, 'x': x}),
                 recursive := true)
             FROM ceven),
      cm AS (SELECT cl, pos,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list(x ORDER BY n_id)), (a, b) -> a + b) / COUNT(*) AS m
             FROM cx GROUP BY cl, pos),
      cents AS (SELECT cl, list(m ORDER BY pos) AS cv FROM cm
                GROUP BY cl),
      cnn AS (SELECT cl, cv, sqrt(${foldDot.format("cv", "cv")}) AS cn
              FROM cents),
      assign AS (SELECT n_id, cl, cv0 AS cv, cn0 AS cn FROM (
            SELECT o.n_id, c.cl, o.cv AS cv0, o.cn AS cn0,
              ROW_NUMBER() OVER (PARTITION BY o.n_id ORDER BY
                ${foldDot.format("o.cv", "c.cv")} / (o.cn * c.cn) DESC,
                c.cl) AS rk
            FROM codd o CROSS JOIN cnn c) WHERE rk = 1),
      posts AS (SELECT n_id, cl, cv, cn FROM ceven
                UNION ALL SELECT n_id, cl, cv, cn FROM assign),
      probe AS (SELECT q_id, cl,
                  ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY
                    ${foldDot.format("qv", "cv")} / (qn * cnn.cn) DESC, cl)
                    AS probe_rank
                FROM q CROSS JOIN cnn),
      routed AS (SELECT q_id, cl FROM probe WHERE probe_rank <= 2),
      pairs AS (SELECT n_id, cl AS cb,
          ${foldDot.format("list_slice(pv, 1, 32)", "list_slice(pv, 1, 32)")}
            - 2.0 * ${foldDot.format("list_slice(pv, 1, 32)", "list_slice(cents.cv, 1, 32)")}
            + ${foldDot.format("list_slice(cents.cv, 1, 32)", "list_slice(cents.cv, 1, 32)")} AS d0,
          ${foldDot.format("list_slice(pv, 33, 64)", "list_slice(pv, 33, 64)")}
            - 2.0 * ${foldDot.format("list_slice(pv, 33, 64)", "list_slice(cents.cv, 33, 64)")}
            + ${foldDot.format("list_slice(cents.cv, 33, 64)", "list_slice(cents.cv, 33, 64)")} AS d1
        FROM (SELECT n_id, cv AS pv FROM posts) cc CROSS JOIN cents),
      b0 AS (SELECT n_id, cb AS code0 FROM (
               SELECT n_id, cb, ROW_NUMBER() OVER (PARTITION BY n_id
                 ORDER BY d0, cb) rn FROM pairs) WHERE rn = 1),
      b1 AS (SELECT n_id, cb AS code1 FROM (
               SELECT n_id, cb, ROW_NUMBER() OVER (PARTITION BY n_id
                 ORDER BY d1, cb) rn FROM pairs) WHERE rn = 1),
      codes AS (SELECT b0.n_id, code0, code1 FROM b0 JOIN b1 USING (n_id)),
      lut AS (SELECT q_id, cl AS cb,
          ${foldDot.format("list_slice(qv, 1, 32)", "list_slice(qv, 1, 32)")}
            - 2.0 * ${foldDot.format("list_slice(qv, 1, 32)", "list_slice(cents.cv, 1, 32)")}
            + ${foldDot.format("list_slice(cents.cv, 1, 32)", "list_slice(cents.cv, 1, 32)")} AS d0,
          ${foldDot.format("list_slice(qv, 33, 64)", "list_slice(qv, 33, 64)")}
            - 2.0 * ${foldDot.format("list_slice(qv, 33, 64)", "list_slice(cents.cv, 33, 64)")}
            + ${foldDot.format("list_slice(cents.cv, 33, 64)", "list_slice(cents.cv, 33, 64)")} AS d1
        FROM q CROSS JOIN cents),
      cand AS (SELECT r.q_id, posts.n_id, codes.code0, codes.code1
               FROM routed r JOIN posts USING (cl)
               JOIN codes ON codes.n_id = posts.n_id),
      adc AS (SELECT cand.q_id, cand.n_id, l0.d0 + l1.d1 AS adc
              FROM cand
              JOIN lut l0 ON l0.q_id = cand.q_id AND l0.cb = cand.code0
              JOIN lut l1 ON l1.q_id = cand.q_id AND l1.cb = cand.code1),
      short AS (SELECT q_id, n_id FROM (
                  SELECT q_id, n_id, ROW_NUMBER() OVER (
                    PARTITION BY q_id ORDER BY adc, n_id) sr FROM adc)
                WHERE sr <= 30),
      ex AS (SELECT s2.q_id, s2.n_id,
               ${foldDot.format("q.qv", "posts.cv")} / (q.qn * posts.cn) AS cosine
             FROM short s2 JOIN posts ON posts.n_id = s2.n_id
             JOIN q ON q.q_id = s2.q_id),
      vec20 AS (SELECT q_id, n_id, CAST(vr AS INT) AS vec_rank FROM (
                  SELECT q_id, n_id, ROW_NUMBER() OVER (PARTITION BY q_id
                    ORDER BY cosine DESC, n_id) AS vr FROM ex)
                WHERE vr <= 20),
      pool AS (SELECT COALESCE(l.q_id, v.q_id) AS q_id,
                 COALESCE(l.n_id, v.n_id) AS n_id, l.lex_rank, v.vec_rank
               FROM lex20 l FULL OUTER JOIN vec20 v
                 ON l.q_id = v.q_id AND l.n_id = v.n_id),
      fused AS (SELECT q_id, n_id, lex_rank, vec_rank,
                  COALESCE(1.0 / (60.0 + CAST(lex_rank AS DOUBLE)), 0.0)
                  + COALESCE(1.0 / (60.0 + CAST(vec_rank AS DOUBLE)), 0.0)
                    AS rrf
                FROM pool),
      r AS (SELECT q_id, n_id, lex_rank, vec_rank, rrf,
              ROW_NUMBER() OVER (PARTITION BY q_id
                ORDER BY rrf DESC, n_id) AS rnk
            FROM fused)
      SELECT q_id, n_id, lex_rank, vec_rank, rrf, CAST(rnk AS INT) AS rank
      FROM r WHERE rnk <= 10 ORDER BY q_id, rank"""))

  /** OPTIMIZE cadence UNDER DELETE TRAFFIC — [[s27]]'s maintain
    * trigger re-proven on a TOMBSTONED store: three O(delta) grows
    * push the postings family past the threshold, a delete lands
    * tombstones over it, and `maintain` must DISPATCH to the
    * MoR-aware compactor ([[graft.operators.AnnIndex
    * .compactPostingsMoR]] — applying the tombstones physically and
    * retiring them in the same atomic commit) instead of either
    * raw-compacting (which would resurrect every deleted row — the
    * structural guard refuses it) or silently deferring forever (the
    * r12 behavior this entry closes: under continuous deletes the
    * cadence would never fire and segment counts would grow without
    * bound). The fixture REQUIRES maintain to report exactly the
    * postings fold and the tombstones to be gone; the probe of the
    * maintained store must hash-match the oracle's from-scratch
    * recompute over the SURVIVING vectors — a resurrected or
    * over-deleted row breaks the hash. */
  val s29 = QueryDef(
    "s29_maintain_mor",
    (sp, dir) => {
      val fp = graft.sources.IngestFixtures.fingerprint(s"$dir/embeddings.parquet")
      val store = graft.sources.IngestFixtures.path(s"s29_store_$fp")
      val qland = graft.sources.IngestFixtures.path(s"s29_q_$fp")
      graft.sources.IngestFixtures.once(s"s29_$fp") {
        import scala.reflect.io.Directory
        Seq(store, qland).foreach(p =>
          new Directory(new java.io.File(p)).deleteRecursively())
        val embs = Tables(sp, dir, "embeddings")
        val corpus0 = Similarity.prep(
            embs.filter(col("vec_id") >= 10 && col("vec_id") % 4 === 0),
            "vec_id", "embedding")
          .join(embs.select(col("vec_id").as("id"), col("label")), "id")
        graft.operators.AnnIndex.writeIvf(corpus0, "label", store)
        (1L to 3L).foreach { r =>
          graft.operators.AnnIndex.appendVectors(sp, store,
            Similarity.prep(
              embs.filter(col("vec_id") >= 10 && col("vec_id") % 4 === r),
              "vec_id", "embedding"))
        }
        graft.operators.AnnIndex.deleteVectors(sp, store,
          embs.select(col("vec_id").as("id"))
            .filter(col("vec_id") >= 10 &&
              pmod(col("vec_id"), lit(7L)) === 0))
        val done = graft.operators.AnnIndex.maintain(sp, store, threshold = 3)
        require(done.map(_._1) == Seq("postings"),
          s"s29: maintain must dispatch the tombstoned postings to the " +
            s"MoR fold, got $done")
        require(graft.sources.TxLog.familySegments(store,
            graft.sources.TxLog.DeletesFamily).isEmpty,
          "s29: the MoR fold must retire the tombstones it applied")
        graft.sources.IngestFixtures.addLandingFile(qland,
          embs.filter(col("vec_id") < 10).select("vec_id", "embedding"),
          "queries.parquet", 1700001800000L)
      }
      val queries = Similarity.prep(
        sp.read.parquet(qland), "vec_id", "embedding")
      graft.operators.AnnIndex.probeIvf(sp, store, queries,
          k = 5, nProbe = 2)
        .orderBy("q_id", "rank")
    },
    Some(s"""
      WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] v FROM embeddings),
      n AS (SELECT vec_id, label, v, sqrt(${foldDot.format("v", "v")}) nrm FROM e),
      q AS (SELECT vec_id q_id, v qv, nrm qn FROM n WHERE vec_id < 10),
      c0 AS (SELECT vec_id n_id, label cl, v cv, nrm cn FROM n
             WHERE vec_id >= 10 AND vec_id % 4 = 0),
      crest AS (SELECT vec_id n_id, v cv, nrm cn FROM n
                WHERE vec_id >= 10 AND vec_id % 4 <> 0),
      cx AS (SELECT n_id, cl,
               unnest(list_transform(cv, (x, i) -> {'pos': i - 1, 'x': x}),
                 recursive := true)
             FROM c0),
      cm AS (SELECT cl, pos,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list(x ORDER BY n_id)), (a, b) -> a + b) / COUNT(*) AS m
             FROM cx GROUP BY cl, pos),
      cents AS (SELECT cl, list(m ORDER BY pos) AS cv FROM cm
                GROUP BY cl),
      cn AS (SELECT cl, cv, sqrt(${foldDot.format("cv", "cv")}) AS cn
             FROM cents),
      assign AS (SELECT n_id, cl, cv0 AS cv, cn0 AS cn FROM (
            SELECT o.n_id, c.cl, o.cv AS cv0, o.cn AS cn0,
              ROW_NUMBER() OVER (PARTITION BY o.n_id ORDER BY
                ${foldDot.format("o.cv", "c.cv")} / (o.cn * c.cn) DESC,
                c.cl) AS rk
            FROM crest o CROSS JOIN cn c) WHERE rk = 1),
      posts AS (SELECT n_id, cl, cv, cn FROM c0
                UNION ALL SELECT n_id, cl, cv, cn FROM assign),
      live AS (SELECT n_id, cl, cv, cn FROM posts WHERE n_id % 7 <> 0),
      probe AS (SELECT q_id, qv, qn, cl,
                  ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY
                    ${foldDot.format("qv", "cv")} / (qn * cn.cn) DESC, cl)
                    AS probe_rank
                FROM q CROSS JOIN cn),
      routed AS (SELECT q_id, qv, qn, cl FROM probe WHERE probe_rank <= 2),
      s AS (SELECT q_id, n_id, ${foldDot.format("qv", "cv")} / (qn * cn) AS cosine
            FROM routed r JOIN live USING (cl)),
      r AS (SELECT q_id, n_id, cosine,
              ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) rnk
            FROM s)
      SELECT q_id, n_id, cosine, CAST(rnk AS INT) AS rank
      FROM r WHERE rnk <= 5 ORDER BY q_id, rank"""))

  val defs: Seq[QueryDef] = Seq(s01, s02, s03, s04, s05, s06, s07, s08,
    s09, s10, s11, s12, s13, s14, s15, s16, s17, s18, s19, s20, s21, s22,
    s23, s24, s25, s26, s27, s28, s29)
}
