package graft

import java.io.File
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Checkpoint recovery: a file-source → file-sink stream stopped and
  * restarted against the same checkpoint must process each input file
  * exactly once — the committed-offset log (source side) and the file
  * sink's transaction log (sink side) together give end-to-end
  * exactly-once for replayed files, which is the recovery contract a
  * 100 TB ingest pipeline leans on after executor/driver loss. */
class StreamRecoverySpec extends SparkSpec {
  import spark.implicits._

  test("file-sink stream restarted from its checkpoint is exactly-once") {
    val root = Files.createTempDirectory("graft_recovery").toFile
    val land = new File(root, "land"); land.mkdirs()
    val out = new File(root, "out")
    val ckpt = new File(root, "ckpt")
    val schema = new StructType().add("id", LongType).add("v", DoubleType)

    def writeBatch(name: String, data: Seq[(Long, Double)], mtime: Long): Unit = {
      val tmp = new File(root, s"tmp_$name")
      data.toDF("id", "v").coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = tmp.listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      val dst = new File(land, name)
      Files.move(part.toPath, dst.toPath)
      dst.setLastModified(mtime)
    }

    def runOnce(): Unit = {
      val q = spark.readStream.schema(schema).parquet(land.toString)
        .withColumn("v2", col("v") * 2)
        .writeStream.format("parquet")
        .option("path", out.toString)
        .option("checkpointLocation", ckpt.toString)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    def sinkRows(): Seq[(Long, Double, Double)] =
      spark.read.parquet(out.toString).collect()
        .map(r => (r.getAs[Long]("id"), r.getAs[Double]("v"),
          r.getAs[Double]("v2"))).toSeq.sortBy(_._1)

    writeBatch("a.parquet", Seq((1L, 1.0), (2L, 2.0)), 1700000000000L)
    runOnce()
    assert(sinkRows() === Seq((1L, 1.0, 2.0), (2L, 2.0, 4.0)))

    // restart against the same checkpoint with one NEW file: only the
    // new file may be processed (no reprocessing of a.parquet)
    writeBatch("b.parquet", Seq((3L, 3.0)), 1700000100000L)
    runOnce()
    assert(sinkRows() === Seq((1L, 1.0, 2.0), (2L, 2.0, 4.0), (3L, 3.0, 6.0)))

    // idle restart: no new data -> no new output, no duplication
    runOnce()
    assert(sinkRows() === Seq((1L, 1.0, 2.0), (2L, 2.0, 4.0), (3L, 3.0, 6.0)))
  }
}
