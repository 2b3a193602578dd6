package graft

import org.apache.spark.sql.SparkSession

/** Plan audit driver (`sbt "Test/runMain graft.ExplainAudit"`): prints
  * the physical-plan properties that matter at scale. */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    def audit(name: String): Unit = {
      val plan = Catalog.byName(name).build(spark, dir)
        .queryExecution.executedPlan.toString
      val pushed = "PushedFilters: \\[[^\\]]*\\]".r.findFirstIn(plan).getOrElse("PushedFilters: none")
      val schema = "ReadSchema: [^\n]*".r.findAllIn(plan).toList
      val nShuffle = "Exchange".r.findAllIn(plan).length
      val nBcast = "BroadcastHashJoin|BroadcastNestedLoopJoin".r.findAllIn(plan).length
      val wsc = "WholeStageCodegen".r.findAllIn(plan).length
      println(s"AUDIT $name shuffles=$nShuffle broadcasts=$nBcast codegenSpans=$wsc")
      println(s"  $pushed")
      schema.take(2).foreach(s => println(s"  ${s.take(160)}"))
    }
    val defaults = Seq("q01_pricing_summary", "q02_filter_project",
      "q03_join_agg_topk", "q05_star_join", "q06_conditional_agg",
      "d04_ngram_jaccard", "d05_embedding_dedup", "s01_cosine_topk",
      "q23_sessionize")
    (if (args.nonEmpty) args.toSeq else defaults).foreach(audit)
    spark.stop()
  }
}
