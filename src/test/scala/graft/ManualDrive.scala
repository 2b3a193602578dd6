package graft

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamOps
import graft.streaming.StreamOps.Evt
import graft.sources.Sinks

/** Manual end-to-end driver for the streaming + sink surfaces
  * (`sbt "Test/runMain graft.ManualDrive"`). */
object ManualDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Evt]
    in.addData(
      Evt(1L, Timestamp.valueOf("2024-01-01 10:05:00"), "click", 1.5),
      Evt(1L, Timestamp.valueOf("2024-01-01 10:20:00"), "click", 2.0))
    val q = StreamOps.windowedCounts(in.toDF()).writeStream
      .format("memory").queryName("drv").outputMode(OutputMode.Update()).start()
    q.processAllAvailable()
    println("STREAM_OUT=" + spark.sql(
      "select event_type, n_events, sum_value from drv").collect().mkString(";"))
    q.stop()
    val df = Seq((1L, "x", 1.25), (2L, "y", 2.5)).toDF("id", "name", "v")
    Sinks.writeJdbc(df, "jdbc:derby:memory:drv;create=true", "t1", 2)
    println("JDBC_BACK=" + Sinks.readJdbc(spark, "jdbc:derby:memory:drv", "t1")
      .orderBy("id").collect().mkString(";"))
    spark.stop()
  }
}
