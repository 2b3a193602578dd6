package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off profiling driver (`sbt "Test/runMain graft.ProfileD04"`). */
object ProfileD04 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(s"PROF $label rows=$n t=${(System.nanoTime() - t0) / 1e9}")
    }
    val docs = Tables(spark, dir, "documents")
    time("warmup")(docs.count())
    val sh = operators.Dedup.shingleHashSet(docs, "doc_id", "text", 3)
    time("shingle_gen")(sh.count())
    time("shingle_gen2")(sh.count())
    time("full_d04")(operators.Dedup.ngramJaccard(docs, "doc_id", "text", 3, 0.2).count())
    spark.stop()
  }
}
