package graft.sources

import java.util.Properties
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Sources and sinks beyond parquet (SURVEY.md §2 sources/sinks).
  *
  * The reference's pipeline ends in a SQLite database; the Spark
  * re-expression is `DataFrameWriter.jdbc` — the same call targets
  * SQLite, Postgres, or any warehouse JDBC endpoint. At cluster scale
  * `numPartitions` bounds the connection fan-in.
  */
object Sinks {

  def writeJdbc(df: DataFrame, url: String, table: String,
      numPartitions: Int = 8, props: Properties = new Properties()): Unit =
    df.coalesce(numPartitions).write.mode(SaveMode.Overwrite)
      .jdbc(url, table, props)

  def readJdbc(spark: SparkSession, url: String, table: String,
      props: Properties = new Properties()): DataFrame =
    spark.read.jdbc(url, table, props)

  /** Hive-style partitioned parquet layout — partition pruning on the
    * partition columns at read time. */
  def writePartitionedParquet(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*).parquet(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true): DataFrame =
    spark.read.schema(schema).option("header", header.toString).csv(path)

  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)
}
