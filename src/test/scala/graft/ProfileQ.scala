package graft

import org.apache.spark.sql.SparkSession

/** Per-query profiling driver: times each named catalog query N times
  * against a warm session (`sbt "Test/runMain graft.ProfileQ q18_having q35_stats_moments"`). */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    Tables(spark, dir, "lineitem").count() // warm scan path
    args.foreach { name =>
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        Catalog.byName(name).build(spark, dir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROF $name%-24s ${times.map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
