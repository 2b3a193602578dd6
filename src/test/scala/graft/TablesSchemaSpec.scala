package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Drift tripwire for the events reader (VERDICT r7 #1): the testdata
  * producer has shipped `ts` as parquet TIMESTAMP(NANOS) in some
  * generations and TIMESTAMP(MICROS) in others, and a reader wired to
  * one encoding loses every events-reading catalog entry when the
  * other shows up. This spec writes the SAME logical events rows in
  * each encoding the producer has used and asserts [[Tables]] reads
  * them back identically — TimestampType schema, identical values.
  *
  * Encoding fixtures:
  *   - "micros-ntz": ts as TimestampNTZType — Spark writes parquet
  *     TIMESTAMP(MICROS, isAdjustedToUTC=false), byte-compatible with
  *     the current (r7+) testdata generation.
  *   - "micros-ltz": ts as TimestampType — TIMESTAMP(MICROS,
  *     isAdjustedToUTC=true), the other micros variant a producer
  *     could emit.
  *   - "nanos-long": ts as LongType nanoseconds. Spark cannot WRITE
  *     TIMESTAMP(NANOS), but under the armed `nanosAsLong` flag a real
  *     NANOS file surfaces exactly as this LongType column does, so
  *     the post-schema code path (the branch [[Tables.eventsTs]] takes)
  *     is identical to the pre-r7 testdata generations.
  */
class TablesSchemaSpec extends SparkSpec {

  // 2021-03-04T05:06:07.123456Z and a second row an hour later —
  // sub-second precision so a millis-flooring bug would also surface.
  private val microsOfDay = Seq(
    ("2021-03-04 05:06:07.123456", 1L, "click", 10.5),
    ("2021-03-04 06:06:07.654321", 2L, "purchase", 20.25))

  private def writeFixture(encoding: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"ts_$encoding").toString
    import spark.implicits._
    val base = microsOfDay.toDF("ts_str", "user_id", "event_type", "value")
    val df = encoding match {
      case "micros-ntz" =>
        base.withColumn("ts", to_timestamp_ntz(col("ts_str")))
      case "micros-ltz" =>
        base.withColumn("ts", to_timestamp(col("ts_str")))
      case "nanos-long" =>
        base.withColumn("ts",
          unix_micros(to_timestamp(col("ts_str"))) * 1000L)
    }
    df.drop("ts_str").select("ts", "user_id", "event_type", "value")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def readBack(dir: String): Seq[Row] = {
    val df = Tables(spark, dir, "events")
    assert(df.schema("ts").dataType === TimestampType,
      s"$dir: ts must normalize to TimestampType")
    df.select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts"),
        col("user_id"), col("event_type"), col("value"))
      .orderBy("user_id").collect().toSeq
  }

  test("events reads identically across all three physical ts encodings") {
    val byEncoding =
      Seq("micros-ntz", "micros-ltz", "nanos-long").map { enc =>
        enc -> readBack(writeFixture(enc))
      }
    val (refEnc, refRows) = byEncoding.head
    assert(refRows.map(_.getString(0)) ===
      Seq("2021-03-04 05:06:07.123456", "2021-03-04 06:06:07.654321"),
      s"$refEnc: absolute values wrong, not just cross-encoding drift")
    byEncoding.tail.foreach { case (enc, rows) =>
      assert(rows === refRows, s"$enc != $refEnc")
    }
  }

  /** Post-[[Tables]] logical schema every catalog entry compiles
    * against, pinned per table. When the testdata producer drifts a
    * physical type again (r7: events.ts nanos→micros, 50 entries
    * dead), THIS fails first with a readable one-line diff — fix by
    * teaching Tables to normalize (the eventsTs pattern), not by
    * editing the expectation to match the accident. */
  private val expectedSchemas = Map(
    "region" -> "r_regionkey:int, r_name:string",
    "nation" -> "n_nationkey:int, n_name:string, n_regionkey:int",
    "customer" -> ("c_custkey:bigint, c_name:string, c_nationkey:int, " +
      "c_acctbal:double, c_mktsegment:string"),
    "supplier" -> "s_suppkey:bigint, s_name:string, s_nationkey:int, s_acctbal:double",
    "part" -> ("p_partkey:bigint, p_name:string, p_brand:string, " +
      "p_type:string, p_size:int, p_retailprice:double"),
    "orders" -> ("o_orderkey:bigint, o_custkey:bigint, o_orderstatus:string, " +
      "o_totalprice:double, o_orderdate:timestamp_ntz, o_orderpriority:string"),
    "lineitem" -> ("l_orderkey:bigint, l_partkey:bigint, l_suppkey:bigint, " +
      "l_linenumber:int, l_quantity:double, l_extendedprice:double, " +
      "l_discount:double, l_tax:double, l_returnflag:string, " +
      "l_linestatus:string, l_shipdate:timestamp_ntz"),
    "events" -> ("event_id:bigint, ts:timestamp, user_id:bigint, " +
      "event_type:string, value:double, props:string"),
    "documents" -> "doc_id:bigint, text:string, lang:string, source:string, n_chars:bigint",
    "embeddings" -> "vec_id:bigint, embedding:array<float>, label:int")

  test("every table reads with its pinned logical schema (drift tripwire)") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/events.parquet").exists())
    val drifted = Tables.all.flatMap { t =>
      val got = Tables(spark, dir, t).schema
        .map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", ")
      expectedSchemas.get(t) match {
        case Some(want) if got == want => None
        case Some(want) => Some(s"$t:\n  expected $want\n  got      $got")
        case None => Some(s"$t: new table — pin its schema here")
      }
    }
    assert(drifted.isEmpty,
      s"testdata schema drift — normalize in Tables (eventsTs pattern):\n" +
        drifted.mkString("\n"))
  }

  test("real testdata events reads with ts as TimestampType, rows > 0") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/events.parquet").exists())
    val df = Tables(spark, dir, "events")
    assert(df.schema("ts").dataType === TimestampType)
    assert(df.limit(1).count() === 1L)
  }
}
