package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One catalog entry: a Spark-first DataFrame build plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle.
  * Determinism rules for oracle hash-matching are in SURVEY.md §4.
  */
final case class QueryDef(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)
