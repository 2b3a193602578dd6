package graft.pipelines

import graft.sources.Sinks
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The reference's end-to-end workflow shape, Spark-native: ingest
  * semi-structured records → clean/type/normalize → star-schema
  * aggregates → database sink.
  *
  * The reference scrapes → builds SQLite; here each stage is a
  * declarative DataFrame transform so the same pipeline runs
  * identically on one laptop file or a 100 TB distributed ingest —
  * the JDBC sink call is unchanged (SQLite locally, warehouse JDBC on
  * a cluster, connection fan-in bounded by `numPartitions`).
  */
object EtlPipeline {

  /** Stage 1 — ingest: JSON lines with an explicit schema (never
    * inferSchema on a large source: one pass, typed, null-safe). */
  def ingestJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    Sinks.readJson(spark, path, schema)

  /** Stage 2 — normalize: trim/case-fold keys, drop corrupt rows,
    * deduplicate on the natural key keeping the latest record. */
  def normalize(raw: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol).desc)
    raw
      .filter(col(keyCol).isNotNull)
      .withColumn(keyCol, lower(trim(col(keyCol))))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Stage 3 — aggregate: grouped stats ready for the serving store. */
  def aggregate(clean: DataFrame, groupCol: String, valueCol: String): DataFrame =
    clean.groupBy(groupCol)
      .agg(count(lit(1)).as("n_records"),
        sum(col(valueCol)).as("total"),
        avg(col(valueCol)).as("mean"))

  /** Stage 4 — sink: any JDBC target (the reference writes SQLite). */
  def sink(df: DataFrame, jdbcUrl: String, table: String): Unit =
    Sinks.writeJdbc(df, jdbcUrl, table)

  /** Stage-level observability (`Dataset.observe`): named metric
    * aggregates that compute INSIDE the same job that materializes the
    * pipeline — per-stage row counts / null counts / attrition with
    * ZERO extra scans, where e23's standalone DQ report pays its own
    * pass. Harvest with `obs.get` after the first action; metrics must
    * be scan-streamable aggregates (no distinct). */
  def observed(df: DataFrame,
      obs: org.apache.spark.sql.Observation,
      metrics: (String, org.apache.spark.sql.Column)*): DataFrame = {
    require(metrics.nonEmpty, "observed() needs at least one metric")
    df.observe(obs, metrics.head._2.as(metrics.head._1),
      metrics.tail.map { case (n, c) => c.as(n) }: _*)
  }

  /** Whole pipeline, composed. */
  def run(spark: SparkSession, jsonPath: String, schema: StructType,
      keyCol: String, tsCol: String, groupCol: String, valueCol: String,
      jdbcUrl: String, table: String): Unit = {
    val raw = ingestJson(spark, jsonPath, schema)
    val clean = normalize(raw, keyCol, tsCol)
    sink(aggregate(clean, groupCol, valueCol), jdbcUrl, table)
  }
}
