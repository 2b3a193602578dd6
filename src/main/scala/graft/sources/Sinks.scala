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

  /** Upsert into a JDBC table without engine MERGE support (SQLite-
    * class targets): union the incoming batch with the current rows,
    * keep the winner per key (incoming beats existing; ties within the
    * batch break on the version column, then deterministically on the
    * remaining columns), rewrite. The read-modify-write is the
    * portable JDBC merge; at warehouse scale swap the final write for
    * the engine's native MERGE and keep the same dedup plan. */
  def upsertJdbc(spark: SparkSession, batch: DataFrame, url: String,
      table: String, keyCols: Seq[String], versionCol: String,
      numPartitions: Int = 8, props: Properties = new Properties()): Unit = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // existence is decided by catalog metadata, not by whether a read
    // throws: a transient read failure must surface as an error, never
    // silently downgrade the merge to a table-clobbering first load
    val existing =
      if (jdbcTableExists(url, table, props)) Some(readJdbc(spark, url, table, props))
      else None
    // the batch itself dedups through the same window whether or not
    // the table exists — duplicate keys within a first-load batch must
    // not survive either
    val tagged = existing.foldLeft(batch.withColumn("__new", lit(1))) {
      (b, cur) => b.unionByName(cur.withColumn("__new", lit(0)))
    }
    val others = batch.columns.filterNot(keyCols.contains)
      .filterNot(_ == versionCol).map(col).toSeq
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__new").desc +: col(versionCol).desc +: others.map(_.desc): _*)
    val merged = tagged.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__new", "__rn")
    // checkpoint before overwrite: the merged plan still reads `table`,
    // and SaveMode.Overwrite truncates it first. localCheckpoint cuts
    // the lineage distributively (no driver collect).
    writeJdbc(merged.localCheckpoint(eager = true), url, table,
      numPartitions, props)
  }

  private def jdbcTableExists(url: String, table: String,
      props: Properties): Boolean = {
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val md = conn.getMetaData
      // getTables treats the name as a LIKE pattern: escape _ and %
      // so "user_stats" can't wildcard-match "userXstats"
      val esc = Option(md.getSearchStringEscape).getOrElse("\\")
      def escaped(name: String) = name
        .replace(esc, esc + esc).replace("_", esc + "_").replace("%", esc + "%")
      def probe(name: String) = {
        val rs = md.getTables(null, null, escaped(name), null)
        try rs.next() finally rs.close()
      }
      probe(table) || probe(table.toUpperCase) || probe(table.toLowerCase)
    } finally conn.close()
  }

  /** Hive-style partitioned parquet layout — partition pruning on the
    * partition columns at read time. */
  def writePartitionedParquet(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*).parquet(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true): DataFrame =
    spark.read.schema(schema).option("header", header.toString)
      // multiLine: Spark's CSV writer quotes embedded newlines; without
      // it the reader splits such records mid-row. Explicit quote/escape
      // pins the dialect to what the writer emits.
      .option("multiLine", "true")
      .option("quote", "\"").option("escape", "\\")
      .csv(path)

  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)
}
