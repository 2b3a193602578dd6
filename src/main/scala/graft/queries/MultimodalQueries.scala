package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal-column suite (SURVEY.md §2 rows 40–41): binary payloads
  * with typed metadata, and the batched decode/feature-extract
  * pipeline (decoder stubbed — see Multimodal.FakeDecoder).
  */
object MultimodalQueries {

  /** Binary payload + typed metadata extraction. */
  val m01 = QueryDef(
    "m01_binary_meta",
    (sp, dir) => {
      Multimodal.withPayload(Tables(sp, dir, "documents"), "text")
        .select(col("doc_id"),
          length(col("payload")).cast("int").as("n_bytes"),
          upper(substring(hex(col("payload")), 1, 16)).as("header_hex"))
        .withColumn("kind",
          when(col("n_bytes") < 150, "small")
            .when(col("n_bytes") < 350, "medium")
            .otherwise("large"))
        .orderBy("doc_id")
    },
    Some("""
      SELECT doc_id,
        CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        upper(substring(hex(encode(text)), 1, 16)) AS header_hex,
        CASE WHEN octet_length(encode(text)) < 150 THEN 'small'
             WHEN octet_length(encode(text)) < 350 THEN 'medium'
             ELSE 'large' END AS kind
      FROM documents ORDER BY doc_id"""))

  /** Batched feature extraction through the typed Dataset pipeline
    * (rows-only: mapPartitions is not SQL-expressible; exact values
    * exercised in MultimodalSpec). */
  val m02 = QueryDef(
    "m02_feature_extract",
    (sp, dir) => {
      Multimodal.featureFrame(sp, Tables(sp, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    },
    None)

  /** Frame-sampling plumbing over fake video payloads (rows-only:
    * flatMap fan-out; shape and determinism exercised in
    * MultimodalSpec). */
  val m03 = QueryDef(
    "m03_frame_sample",
    (sp, dir) => {
      import sp.implicits._
      val media = Multimodal.withPayload(Tables(sp, dir, "documents"), "text")
        .select(col("doc_id"), col("payload")).as[Multimodal.MediaRow]
      Multimodal.sampleFrames(media, stride = 64).toDF()
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_frames"),
          max(col("frame_idx")).as("last_idx"))
        .orderBy("doc_id")
    },
    None)

  val defs: Seq[QueryDef] = Seq(m01, m02, m03)
}
