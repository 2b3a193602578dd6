package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{LongType, StructType, TimestampNTZType, TimestampType}

/** Source registry for the driver-generated star schema (TESTDATA.md).
  *
  * Every read is a plain parquet scan so Catalyst can push filters and
  * prune columns (`PushedFilters` / `ReadSchema` in the physical plan).
  * At cluster scale the same entry points accept directories of many
  * files; nothing here assumes a single file.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // One unresolved read per (session, dir, table): `spark.read.parquet`
  // lists files and reads footers for schema on every call, a fixed
  // ~100 ms tax each of the catalog's ~80 queries was paying again.
  // DataFrames are immutable plans, so sharing across queries is safe.
  // Plan reuse only — UNPINNED through the shared
  // [[graft.operators.DfCache]] (no persist: the cost avoided is file
  // listing + footer schema reads, not recompute).
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    graft.operators.DfCache.unpinned(spark, s"tbl:$dir:$name") {
      build(spark, dir, name)
    }

  private def build(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      eventsTs(spark.read.parquet(s"$dir/$name.parquet"))
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }

  /** Raw (pre-normalization) schema of `dir/events.parquet`, with the
    * nanos-as-long fallback armed first. The producer's physical `ts`
    * encoding has drifted between TIMESTAMP(NANOS) and
    * TIMESTAMP(MICROS) across testdata generations; arming
    * `nanosAsLong` makes BOTH readable (the flag only affects NANOS
    * columns — micros files are untouched by it), and the returned
    * schema tells [[eventsTs]] which case this file is. Streaming
    * sources need this schema explicitly (`readStream.schema(...)`).
    */
  def eventsRawSchema(spark: SparkSession, dir: String): StructType = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet").schema
  }

  /** Normalize the events `ts` column to session-zoned TimestampType
    * whatever the writer's physical encoding:
    *   - LongType (TIMESTAMP(NANOS) read under nanosAsLong) → floor
    *     to micros — the same truncation DuckDB applies, so oracles
    *     agree;
    *   - TimestampNTZType (TIMESTAMP(MICROS), isAdjustedToUTC=false)
    *     → cast; with the UTC session zone the wall-clock values are
    *     preserved bit-for-bit;
    *   - TimestampType → already normal, pass through.
    * Works on batch and streaming DataFrames alike. Every reader of
    * raw events parquet MUST route through here — schema drift on
    * this one column once took out 50 catalog entries (VERDICT r7).
    */
  def eventsTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType =>
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    case TimestampNTZType =>
      df.withColumn("ts", col("ts").cast(TimestampType))
    case _ => df
  }
}
