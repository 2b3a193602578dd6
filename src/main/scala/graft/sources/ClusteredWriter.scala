package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions.col

/** Range-clustered parquet layout: `repartitionByRange` + in-partition
  * sort before writing, so each output file covers a narrow key range
  * and parquet min/max row-group statistics prune non-matching files
  * at scan time — the poor-man's Z-order, and the single highest-value
  * layout decision for selective scans over 100 TB.
  */
object ClusteredWriter {

  def writeRangeClustered(df: DataFrame, path: String, nFiles: Int,
      clusterCols: Seq[String]): Unit = {
    val cols: Seq[Column] = clusterCols.map(col)
    df.repartitionByRange(nFiles, cols: _*)
      .sortWithinPartitions(cols: _*)
      .write.mode(SaveMode.Overwrite).parquet(path)
  }
}
