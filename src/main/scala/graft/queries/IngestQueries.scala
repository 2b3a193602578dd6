package graft.queries

import graft.{QueryDef, Tables}
import graft.sources.{IngestFixtures, Sinks}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Semi-structured ingest entries (SURVEY.md §2 sources): the same
  * documents table round-tripped through CSV and JSON Lines and read
  * back with an explicit schema — no sampling-based inference, which
  * at 100 TB means no extra pass over the files. The DuckDB oracle
  * aggregates the original parquet, so a pass proves the ingest path
  * is byte-faithful (per-row text lengths feed the checked sums).
  */
object IngestQueries {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  private def fixtureKey(dir: String, format: String) =
    s"${format}_documents_${IngestFixtures.fingerprint(s"$dir/documents.parquet")}"

  /** CSV ingest: read the CSV copy, aggregate per (lang, source).
    * sum(length(text)) would drift on any quoting/escaping bug. */
  val e01 = QueryDef(
    "e01_csv_ingest",
    (sp, dir) => {
      val path = IngestFixtures.materialize(fixtureKey(dir, "csv"), "csv",
        Tables(sp, dir, "documents"))
      Sinks.readCsv(sp, path, docSchema)
        .groupBy("lang", "source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          sum(length(col("text"))).as("sum_text_len"),
          min(col("doc_id")).as("min_id"),
          max(col("doc_id")).as("max_id"))
        .orderBy("lang", "source")
    },
    Some("""
      SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        CAST(SUM(length(text)) AS BIGINT) AS sum_text_len,
        MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
      FROM documents
      GROUP BY lang, source
      ORDER BY lang, source"""))

  /** JSON Lines ingest: same table through the JSON reader, distinct
    * aggregation shape (per-source language profile). */
  val e02 = QueryDef(
    "e02_json_ingest",
    (sp, dir) => {
      val path = IngestFixtures.materialize(fixtureKey(dir, "json"), "json",
        Tables(sp, dir, "documents"))
      Sinks.readJson(sp, path, docSchema)
        .groupBy("source")
        .agg(countDistinct(col("lang")).as("n_langs"),
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          sum(length(col("text"))).as("sum_text_len"))
        .orderBy("source")
    },
    Some("""
      SELECT source, CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
        CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        CAST(SUM(length(text)) AS BIGINT) AS sum_text_len
      FROM documents
      GROUP BY source
      ORDER BY source"""))

  val defs: Seq[QueryDef] = Seq(e01, e02)
}
