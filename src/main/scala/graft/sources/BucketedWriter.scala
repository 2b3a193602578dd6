package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed table writer: pre-shuffles data into a fixed number of
  * buckets on the join/aggregation key so repeated joins and
  * aggregations on that key skip their exchange entirely — the
  * canonical way to amortize the big shuffle once at 100 TB.
  * Bucketing requires the table catalog (`saveAsTable`).
  */
object BucketedWriter {

  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      nBuckets: Int, sortCol: Option[String] = None): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(nBuckets, bucketCol)
    sortCol.fold(w)(c => w.sortBy(c)).saveAsTable(table)
  }

  def readTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
