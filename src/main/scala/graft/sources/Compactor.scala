package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{SaveMode, SparkSession}

/** Small-file compaction — the table-maintenance pass every long-lived
  * ingest needs: streaming/incremental writers leave thousands of tiny
  * files, and at 100 TB the resulting task-per-file scheduling and
  * footer overhead dominate scan cost. Compaction rewrites a directory
  * into ~`targetBytes` outputs sized from the ACTUAL on-disk bytes
  * (filesystem listing, not a row-count guess), using a round-robin
  * repartition so output files are even regardless of input skew.
  * Data is byte-identical in value terms; only the layout changes —
  * which is exactly what an oracle compare can pin.
  */
object Compactor {

  /** Total length of the data files under `path` (ignores _SUCCESS
    * and other metadata side-files). */
  def dataBytes(spark: SparkSession, path: String): Long = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    var total = 0L
    while (it.hasNext) {
      val f = it.next()
      if (!f.getPath.getName.startsWith("_")) total += f.getLen
    }
    total
  }

  def dataFileCount(spark: SparkSession, path: String): Int = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    var n = 0
    while (it.hasNext) {
      if (!it.next().getPath.getName.startsWith("_")) n += 1
    }
    n
  }

  /** Rewrite `inPath` (parquet) into `outPath` with ~targetBytes per
    * output file. Returns the output file count. */
  def compact(spark: SparkSession, inPath: String, outPath: String,
      targetBytes: Long): Int = {
    val total = dataBytes(spark, inPath)
    val nOut = math.max(1, math.ceil(total.toDouble / targetBytes).toInt)
    spark.read.parquet(inPath)
      .repartition(nOut)
      .write.mode(SaveMode.Overwrite).parquet(outPath)
    dataFileCount(spark, outPath)
  }
}
