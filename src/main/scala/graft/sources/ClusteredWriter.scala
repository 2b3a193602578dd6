package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

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

  /** Z-order (Morton-curve) bit-interleave of `cols`, each min-max
    * scaled to `bitsPerCol` bits. Lexicographic range clustering
    * (above) only prunes on the LEADING column; interleaving gives
    * every dimension locality, so selective scans filtered on ANY of
    * the clustered columns skip most files/row-groups — the multi-
    * dimensional layout a 100 TB lake wants when queries band-filter
    * on several independent columns. Pure column expression (codegen
    * bitwise ops); `los`/`spans` come from a one-pass stats job over
    * the frame being laid out — a fixed per-layout cost, same class
    * as the sampling pass `repartitionByRange` itself runs. */
  def zValue(cols: Seq[Column], los: Seq[Double], spans: Seq[Double],
      bitsPerCol: Int): Column = {
    val n = cols.size
    val top = (1L << bitsPerCol) - 1
    val scaled = cols.zipWithIndex.map { case (c, i) =>
      val span = math.max(spans(i), java.lang.Double.MIN_NORMAL)
      least(greatest(floor((c.cast("double") - lit(los(i))) / lit(span)
        * lit(top.toDouble)), lit(0.0)), lit(top.toDouble)).cast("long")
    }
    (0 until bitsPerCol).flatMap { b =>
      scaled.zipWithIndex.map { case (s, i) =>
        shiftleft(shiftright(s, b).bitwiseAND(lit(1L)), b * n + i)
      }
    }.reduce(_.bitwiseOR(_))
  }

  def writeZOrdered(df: DataFrame, path: String, nFiles: Int,
      zCols: Seq[String], bitsPerCol: Int = 16): Unit = {
    val stats = df.select(zCols.flatMap(c =>
      Seq(min(col(c).cast("double")), max(col(c).cast("double")))): _*).head()
    if (zCols.indices.exists(i => stats.isNullAt(2 * i)))
      // empty input (or an all-null column): nothing to interleave on
      df.write.mode(SaveMode.Overwrite).parquet(path)
    else {
      val los = zCols.indices.map(i => stats.getDouble(2 * i))
      val spans = zCols.indices.map(i => stats.getDouble(2 * i + 1) - los(i))
      df.withColumn("__z", zValue(zCols.map(col), los, spans, bitsPerCol))
        .repartitionByRange(nFiles, col("__z"))
        .sortWithinPartitions(col("__z"))
        .drop("__z")
        .write.mode(SaveMode.Overwrite).parquet(path)
    }
  }
}
