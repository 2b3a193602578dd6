package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: print every table's post-[[Tables]] schema (the logical
  * contract the catalog compiles against) — input for
  * TablesSchemaSpec's full-catalog drift tripwire. */
object SchemaProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    Tables.all.foreach { t =>
      val s = Tables(spark, dir, t).schema
        .map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", ")
      println(s"SCHEMA $t :: $s")
    }
    spark.stop()
  }
}
