package graft

import graft.sources.IngestFixtures
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class CorruptIngestSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("n", LongType),
    StructField("_corrupt_record", StringType)))

  test("permissive read quarantines exactly the malformed rows") {
    val dir = IngestFixtures.badCsvDir("spec_corrupt_mixed",
      header = "id,name,n",
      rows = Seq(
        "1,alpha,10",          // clean
        "2,beta,20",           // clean
        "x,gamma,30",          // type violation on id
        "3,delta",             // too few fields
        "4,eps,40,extra",      // too many fields
        "5,zeta,notanum"))     // type violation on n
    // cache() first: Spark disallows queries over raw CSV whose
    // referenced columns are ONLY the corrupt-record column (the
    // parser would have nothing real to parse) — the documented
    // pattern is to materialize the parsed result, then slice it
    val df = spark.read.schema(schema)
      .option("header", "true").option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(dir)
      .cache()
    val clean = df.filter(col("_corrupt_record").isNull)
    val bad = df.filter(col("_corrupt_record").isNotNull)
    assert(bad.count() === 4L)
    assert(clean.select("id", "name", "n").as[(Long, String, Long)]
      .collect().sorted.toSeq ===
      Seq((1L, "alpha", 10L), (2L, "beta", 20L)))
    // the quarantined originals survive verbatim for replay/forensics
    assert(bad.select("_corrupt_record").as[String].collect().toSet ===
      Set("x,gamma,30", "3,delta", "4,eps,40,extra", "5,zeta,notanum"))
  }

  test("streaming routeCorrupt preserves raw records and loses no clean row") {
    val dir = IngestFixtures.badCsvDir("spec_corrupt_stream",
      header = "id,name,n",
      rows = Seq(
        "1,alpha,10",          // clean
        "2,beta,20",           // clean
        "x,gamma,30",          // type violation on id
        "3,delta"))            // too few fields
    val out = java.nio.file.Files
      .createTempDirectory("spec_route_corrupt").toString
    val stream = spark.readStream.schema(schema)
      .option("header", "true").option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(dir)
    graft.streaming.StreamOps.routeCorrupt(stream, "_corrupt_record", out)
    // quarantine carries the malformed originals VERBATIM for replay
    assert(spark.read.parquet(s"$out/quarantine")
      .select("raw").as[String].collect().toSet ===
      Set("x,gamma,30", "3,delta"))
    // the clean sink has exactly the parseable rows, corrupt col gone
    val clean = spark.read.parquet(s"$out/clean")
    assert(!clean.columns.contains("_corrupt_record"))
    assert(clean.select("id", "name", "n").as[(Long, String, Long)]
      .collect().sorted.toSeq ===
      Seq((1L, "alpha", 10L), (2L, "beta", 20L)))
  }

  test("routeCorrupt sinks stay readable when a side — or the stream — is empty") {
    // all-clean source: the quarantine side must read back as 0 rows,
    // not an unable-to-infer-schema error (the healthy-producer case)
    val cleanDir = IngestFixtures.badCsvDir("spec_all_clean_stream",
      header = "id,name,n",
      rows = Seq("1,alpha,10", "2,beta,20"))
    val out1 = java.nio.file.Files
      .createTempDirectory("spec_route_allclean").toString
    def src(path: String) = spark.readStream.schema(schema)
      .option("header", "true").option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(path)
    graft.streaming.StreamOps.routeCorrupt(src(cleanDir), "_corrupt_record", out1)
    assert(spark.read.parquet(s"$out1/quarantine").count() === 0L)
    assert(spark.read.parquet(s"$out1/clean").count() === 2L)
    // zero-batch source (empty landing zone): BOTH sides must still
    // read back, with the right schemas
    val emptyLand = java.nio.file.Files
      .createTempDirectory("spec_route_emptyland").toString
    val out2 = java.nio.file.Files
      .createTempDirectory("spec_route_empty").toString
    graft.streaming.StreamOps.routeCorrupt(src(emptyLand), "_corrupt_record", out2)
    val q2 = spark.read.parquet(s"$out2/quarantine")
    assert(q2.count() === 0L && q2.columns.contains("raw"))
    val c2 = spark.read.parquet(s"$out2/clean")
    assert(c2.count() === 0L && c2.columns.toSet.contains("id")
      && !c2.columns.contains("_corrupt_record"))
  }

  test("e32 streaming quarantine result carries the clean aggregate + count") {
    val dir = "/root/testdata/sf0.001"
    val got = Catalog.byName("e32_stream_quarantine").build(spark, dir).collect()
    val q = got.filter(_.getString(0) == "__quarantine__")
    assert(q.length === 1 && q.head.getLong(1) === 3L)
    val langs = Tables(spark, dir, "documents")
      .select("lang").distinct().count()
    assert(got.length.toLong === langs + 1)
  }

  test("e16 clean-row aggregate equals the direct parquet aggregate") {
    val dir = "/root/testdata/sf0.001"
    val got = Catalog.byName("e16_corrupt_quarantine").build(spark, dir)
    val want = Tables(spark, dir, "documents")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        sum(length(col("text"))).as("sum_text_len"),
        min(col("doc_id")).as("min_id"),
        max(col("doc_id")).as("max_id"))
      .orderBy("lang")
    assert(got.exceptAll(want).count() === 0)
    assert(want.exceptAll(got).count() === 0)
  }
}
