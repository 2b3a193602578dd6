package graft

import graft.pipelines.EtlPipeline
import org.apache.spark.sql.types._

class EtlPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("ingest -> normalize -> aggregate -> jdbc sink round-trips") {
    val dir = java.nio.file.Files.createTempDirectory("graft_etl").toString
    // raw "scraped" records: dirty keys, a stale duplicate, a corrupt row
    Seq(
      """{"name": "  Alice ", "ts": 2, "team": "red", "score": 10.0}""",
      """{"name": "alice", "ts": 1, "team": "blue", "score": 99.0}""",
      """{"name": "Bob", "ts": 1, "team": "red", "score": 5.0}""",
      """{"name": null, "ts": 1, "team": "red", "score": 1.0}"""
    ).toDF("value").coalesce(1).write.text(s"$dir/raw")

    val schema = StructType(Seq(
      StructField("name", StringType), StructField("ts", LongType),
      StructField("team", StringType), StructField("score", DoubleType)))
    val url = "jdbc:derby:memory:etl;create=true"
    EtlPipeline.run(spark, s"$dir/raw", schema,
      keyCol = "name", tsCol = "ts", groupCol = "team", valueCol = "score",
      jdbcUrl = url, table = "team_stats")

    val back = graft.sources.Sinks.readJdbc(spark, "jdbc:derby:memory:etl", "team_stats")
      .orderBy("team").collect()
    // alice's latest record (ts=2, red 10.0) wins; stale blue row dropped;
    // corrupt null-key row dropped; bob red 5.0
    assert(back.map(_.getString(0)).toSeq === Seq("red"))
    assert(back.head.getLong(1) === 2L)          // n_records
    assert(back.head.getDouble(2) === 15.0)      // total
  }

  test("observed() harvests stage metrics from the SAME job, no second scan") {
    import org.apache.spark.sql.functions._
    val raw = Seq(
      ("a", 1L, 10.0), ("a", 2L, 20.0), ("b", 1L, 5.0),
      (null.asInstanceOf[String], 1L, 1.0)
    ).toDF("name", "ts", "score")
    val obsRaw = org.apache.spark.sql.Observation("raw_metrics")
    val obsClean = org.apache.spark.sql.Observation("clean_metrics")
    val clean = EtlPipeline.observed(
      EtlPipeline.normalize(
        EtlPipeline.observed(raw, obsRaw,
          "n_rows" -> count(lit(1)),
          "n_null_keys" -> sum(when(col("name").isNull, 1L).otherwise(0L))),
        keyCol = "name", tsCol = "ts"),
      obsClean, "n_rows" -> count(lit(1)))
    // ONE action drives the pipeline; both stages' metrics harvest
    // from it without any further scan of the inputs
    val out = clean.groupBy("name").agg(sum("score").as("s")).collect()
    assert(out.length == 2)
    assert(obsRaw.get("n_rows") === 4L)
    assert(obsRaw.get("n_null_keys") === 1L)     // the corrupt row
    assert(obsClean.get("n_rows") === 2L)        // post-dedup survivors
    // attrition computed from the two stage observations: 4 -> 2
  }
}
