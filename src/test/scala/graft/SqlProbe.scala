package graft
object SqlProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[2]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("SQL_PROBE=" + spark.sql(
      "SELECT graft_hash62('abc') h, graft_simhash(graft_token_hashes('a b c')) s, graft_dot(array(1.0d,2.0d), array(3.0d,4.0d)) d"
    ).collect().head)
    spark.stop()
  }
}
