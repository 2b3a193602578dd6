package graft

import org.apache.spark.sql.SparkSession

object ExplainOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = Catalog.byName(args(0)).build(spark, "/root/testdata/sf0.01")
    println("===PLAN===")
    println(df.queryExecution.executedPlan.toString.take(4000))
    spark.stop()
  }
}
