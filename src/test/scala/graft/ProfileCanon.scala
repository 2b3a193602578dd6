package graft

import org.apache.spark.sql.SparkSession

/** One-off profiling driver for the shared components path
  * (`sbt "Test/runMain graft.ProfileCanon"`): separates d04 candidate
  * generation cost from the iterative component resolution. */
object ProfileCanon {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(s"PROF $label t=${(System.nanoTime() - t0) / 1e9}")
      r
    }
    val docs = Tables(spark, dir, "documents")
    time("warmup")(docs.count())
    val pairs = operators.Dedup.ngramJaccard(docs, "doc_id", "text", 3, 0.2,
      maxDf = Some(64))
    time("pairs_count")(pairs.count())
    val pairsP = time("pairs_persist")(pairs.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    time("pairs_materialize")(pairsP.count())
    time("components")(operators.Components
      .canonicalize(docs, "doc_id", pairsP, "d1", "d2").count())
    spark.stop()
  }
}
