package graft

import graft.sources.Compactor
import org.apache.spark.sql.functions._

class CompactorSpec extends SparkSpec {
  import spark.implicits._

  test("compaction collapses small files and preserves every row") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val in = s"$dir/in"
    val out = s"$dir/out"
    val df = (1 to 50000).map(i => (i.toLong, s"payload_$i", i % 7)).toDF("id", "s", "k")
    df.repartition(40).write.parquet(in)
    assert(Compactor.dataFileCount(spark, in) === 40)
    val nOut = Compactor.compact(spark, in, out, targetBytes = 64L * 1024 * 1024)
    assert(nOut === 1, s"tiny table must compact to one file, got $nOut")
    val a = spark.read.parquet(in).orderBy("id").collect().map(_.toSeq)
    val b = spark.read.parquet(out).orderBy("id").collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
  }

  test("target bytes controls the output file count") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact2").toString
    val in = s"$dir/in"
    val out = s"$dir/out"
    (1 to 80000).map(i => (i.toLong, ("x" * 64) + i)).toDF("id", "s")
      .repartition(32).write.parquet(in)
    val total = Compactor.dataBytes(spark, in)
    val nOut = Compactor.compact(spark, in, out, targetBytes = total / 4 + 1)
    // ceil(total / (total/4 + 1)) = 4
    assert(nOut === 4, s"expected 4 output files, got $nOut")
    assert(spark.read.parquet(out).count() === 80000L)
  }

  test("record container round-trips byte-identically") {
    import graft.operators.Multimodal
    val docs = Seq(
      (1L, "src_a", "alpha beta"),
      (2L, "src_a", ""),                    // zero-length record
      (3L, "src_a", "gamma"),
      (4L, "src_b", "delta epsilon zeta")
    ).toDF("doc_id", "source", "text")
      .withColumn("payload", col("text").cast("binary"))
      .withColumn("shard", pmod(col("doc_id"), lit(2L)))
    val packed = Multimodal.packRecords(docs, "source", "shard",
      "doc_id", "payload").as[Multimodal.PackedShard]
    val got = Multimodal.unpackRecords(packed)
      .collect()
      .map(r => (r.source, r.shard, r.rec_idx) -> new String(r.rec, "UTF-8"))
      .toMap
    assert(got === Map(
      ("src_a", 1L, 0) -> "alpha beta",
      ("src_a", 0L, 0) -> "",
      ("src_a", 1L, 1) -> "gamma",
      ("src_b", 0L, 0) -> "delta epsilon zeta"))
  }
}
