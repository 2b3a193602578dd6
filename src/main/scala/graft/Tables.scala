package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

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
      // events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
      // reader rejects; read it as raw nanos and floor to micros — the
      // same truncation DuckDB applies, so oracles agree.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
}
