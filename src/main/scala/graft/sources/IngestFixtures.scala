package graft.sources

import org.apache.spark.sql.DataFrame

/** Once-per-JVM materialization of semi-structured copies of a parquet
  * table, so catalog entries can exercise the CSV/JSON ingest path
  * ([[Sinks.readCsv]]/[[Sinks.readJson]]) against the driver's DuckDB
  * oracle (which reads the original parquet): identical data, two
  * encodings. The fixture is an artifact of the single-box test
  * harness — a real deployment reads its own landing-zone files.
  */
object IngestFixtures {

  private val done = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Write `df` as `format` under a deterministic path derived from
    * `key`, at most once per JVM (and skipped entirely when a complete
    * `_SUCCESS`-marked copy already exists on disk). Multiple part
    * files on purpose: the read side must handle a directory, not a
    * single file. */
  def materialize(key: String, format: String, df: => DataFrame): String = {
    val path = s"/tmp/graft_ingest_v1/$key"
    done.computeIfAbsent(path, _ => {
      if (!new java.io.File(path, "_SUCCESS").exists()) {
        df.coalesce(4).write.mode("overwrite").format(format)
          .option("header", "true").save(path)
      }
      path
    })
  }
}
