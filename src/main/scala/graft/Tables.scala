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
  // Weak session keys: test suites churn sessions; dead ones must not
  // pin their plans (or their SparkContexts) in a process-wide map.
  // SOFT references around the values: a DataFrame strong-references
  // its SparkSession, i.e. the weak KEY — held strongly, the entry
  // could never be collected (the WeakHashMap value→key caveat); held
  // softly, the chain breaks under memory pressure and the entry (and
  // with it the dead session) becomes reclaimable. A cleared ref just
  // rebuilds the plan.
  private val cache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[(String, String),
        java.lang.ref.SoftReference[DataFrame]]]())

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val perSession = cache.synchronized {
      var m = cache.get(spark)
      if (m == null) {
        m = scala.collection.concurrent.TrieMap.empty
        cache.put(spark, m)
      }
      m
    }
    perSession.get((dir, name)).flatMap(r => Option(r.get())) match {
      case Some(df) => df
      case None =>
        val df = build(spark, dir, name)
        perSession.put((dir, name), new java.lang.ref.SoftReference(df))
        df
    }
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
