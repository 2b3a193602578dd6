package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Manual drive of the scale utilities through the public API. */
object DriveScaleOps {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables(spark, "/root/testdata/sf0.1", "documents")
    val capped = operators.Dedup.ngramJaccard(docs, "doc_id", "text", 3, 0.2, maxDf = Some(10)).count()
    val uncapped = operators.Dedup.ngramJaccard(docs, "doc_id", "text", 3, 0.2).count()
    println(s"SCALE_PROBE capped=$capped uncapped=$uncapped")
    val dir = java.nio.file.Files.createTempDirectory("drv_cluster").toString
    sources.ClusteredWriter.writeRangeClustered(
      Tables(spark, "/root/testdata/sf0.1", "lineitem"), dir, 16, Seq("l_orderkey"))
    val pruned = spark.read.parquet(dir).filter(col("l_orderkey") === 42L).count()
    println(s"CLUSTER_PROBE files=${new java.io.File(dir).list().count(_.endsWith("parquet"))} lookup=$pruned")
    spark.stop()
  }
}
