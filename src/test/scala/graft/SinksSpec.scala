package graft

import graft.sources.Sinks
import org.apache.spark.sql.functions._

class SinksSpec extends SparkSpec {
  import spark.implicits._

  test("jdbc sink round-trips through embedded Derby") {
    val url = "jdbc:derby:memory:graftdb;create=true"
    val df = Seq((1L, "a", 10.5), (2L, "b", 20.25)).toDF("id", "name", "score")
    Sinks.writeJdbc(df, url, "scores", numPartitions = 2)
    val back = Sinks.readJdbc(spark, url, "scores")
      .orderBy("id").collect()
    assert(back.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    assert(back.map(_.getDouble(2)).toSeq === Seq(10.5, 20.25))
  }

  test("bucketed write removes the exchange from a bucket-key aggregation") {
    val df = Seq((1L, 10.0), (2L, 20.0), (1L, 30.0), (3L, 5.0)).toDF("k", "v")
    graft.sources.BucketedWriter.writeBucketed(df, "graft_bucketed", "k", 4)
    val back = graft.sources.BucketedWriter.readTable(spark, "graft_bucketed")
    val agg = back.groupBy("k").agg(sum(col("v")).as("s"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"bucketed agg should not shuffle:\n$plan")
    assert(agg.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap ===
      Map(1L -> 40.0, 2L -> 20.0, 3L -> 5.0))
  }

  test("jdbc upsert updates existing keys and inserts new ones") {
    val url = "jdbc:derby:memory:graftup;create=true"
    val v1 = Seq((1L, "a", 1), (2L, "b", 1)).toDF("id", "name", "ver")
    Sinks.writeJdbc(v1, url, "items", numPartitions = 1)
    val batch = Seq((2L, "b2", 2), (3L, "c", 1)).toDF("id", "name", "ver")
    Sinks.upsertJdbc(spark, batch, url, "items", Seq("id"), "ver",
      numPartitions = 1)
    val back = Sinks.readJdbc(spark, url, "items").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(back.toSeq === Seq((1L, "a", 1), (2L, "b2", 2), (3L, "c", 1)))
  }

  test("jdbc upsert creates the table and dedups keys within a first-load batch") {
    val url = "jdbc:derby:memory:graftup2;create=true"
    val batch = Seq((1L, "a", 1), (1L, "a2", 2)).toDF("id", "name", "ver")
    Sinks.upsertJdbc(spark, batch, url, "fresh", Seq("id"), "ver",
      numPartitions = 1)
    val back = Sinks.readJdbc(spark, url, "fresh").collect()
    assert(back.length === 1 && back.head.getString(1) === "a2")
  }

  test("jdbc CDC merge (opCol) applies upserts, deletes, and in-batch version races") {
    val url = "jdbc:derby:memory:graftcdc;create=true"
    val base = Seq((1L, "a", 0L, "U"), (2L, "b", 0L, "U"), (3L, "c", 0L, "U"))
      .toDF("id", "name", "seq", "op")
    Sinks.upsertJdbc(spark, base, url, "cdc", Seq("id"), "seq",
      numPartitions = 1, opCol = Some("op"))
    // op column is never stored
    val cols = Sinks.readJdbc(spark, url, "cdc").columns.map(_.toLowerCase)
    assert(!cols.contains("op"), s"op leaked into the table: ${cols.toSeq}")
    val changes = Seq(
      (1L, "a-del", 1L, "D"),                   // delete key 1
      (2L, "b2", 1L, "U"), (2L, "b-del", 2L, "D"), (2L, "b3", 3L, "U"),
                                                // key 2: U beats earlier D
      (4L, "d-first", 1L, "D"), (4L, "d", 2L, "U"),
                                                // new key: final U inserts
      (5L, "ghost", 1L, "D"))                   // delete of a missing key
      .toDF("id", "name", "seq", "op")
    Sinks.upsertJdbc(spark, changes, url, "cdc", Seq("id"), "seq",
      numPartitions = 1, opCol = Some("op"))
    val back = Sinks.readJdbc(spark, url, "cdc").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(back.toSeq === Seq((2L, "b3"), (3L, "c"), (4L, "d")))
    // a later batch whose final change is a delete removes the key even
    // through the partition-scoped delta path
    val del = Seq((2L, "x", 9L, "D")).toDF("id", "name", "seq", "op")
      .withColumn("pg", (col("id") % 2).cast("int"))
    val withPg = Sinks.readJdbc(spark, url, "cdc")
    // migrate table to carry pg (full-path merge adds the column)
    Sinks.upsertJdbc(spark,
      withPg.withColumn("pg", (col("id") % 2).cast("int"))
        .withColumn("op", lit("U")),
      url, "cdc2", Seq("id"), "seq", numPartitions = 1, opCol = Some("op"))
    Sinks.upsertJdbc(spark, del, url, "cdc2", Seq("id"), "seq",
      numPartitions = 1, partCol = Some("pg"), opCol = Some("op"))
    val after = Sinks.readJdbc(spark, url, "cdc2").orderBy("id").collect()
      .map(_.getLong(0))
    assert(after.toSeq === Seq(3L, 4L),
      "delta-path delete must remove the key and leave untouched partitions")
  }

  test("jdbc CDC merge: a stale-version change never beats newer stored state") {
    val url = "jdbc:derby:memory:graftcdcstale;create=true"
    val base = Seq((1L, "new-a", 5L, "U"), (2L, "new-b", 5L, "U"))
      .toDF("id", "name", "seq", "op")
    Sinks.upsertJdbc(spark, base, url, "cdcs", Seq("id"), "seq",
      numPartitions = 1, opCol = Some("op"))
    // an out-of-order redelivery: a DELETE and an UPDATE both carrying
    // versions OLDER than the stored rows — the stored state must win
    // (the upsert path's batch-wins rule would destructively apply the
    // stale 'D'); a same-version redelivery still resolves to the batch
    val stale = Seq(
      (1L, "stale-del", 3L, "D"),
      (2L, "stale-upd", 4L, "U"),
      (2L, "same-ver", 5L, "U"))
      .toDF("id", "name", "seq", "op")
    Sinks.upsertJdbc(spark, stale, url, "cdcs", Seq("id"), "seq",
      numPartitions = 1, opCol = Some("op"))
    val back = Sinks.readJdbc(spark, url, "cdcs").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(back.toSeq === Seq((1L, "new-a", 5L), (2L, "same-ver", 5L)),
      "stale 'D'/'U' must lose to the stored version; same-version " +
        "redelivery resolves to the batch row")
  }

  test("csv reader round-trips with an explicit schema") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    val df = Seq((1L, "alpha,x", 1.5), (2L, "beta", 2.25), (3L, "", 0.0))
      .toDF("id", "name", "score")
    df.write.mode("overwrite").option("header", "true").csv(dir)
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("name", StringType), StructField("score", DoubleType)))
    val back = Sinks.readCsv(spark, dir, schema).orderBy("id").collect()
    assert(back.map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
      === Seq((1L, "alpha,x", 1.5), (2L, "beta", 2.25), (3L, null, 0.0)))
  }

  test("json reader round-trips with an explicit schema, missing fields -> null") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_json").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "part-0.json"),
      """{"id": 1, "name": "alpha", "score": 1.5}
        |{"id": 2, "score": 2.25}
        |""".stripMargin)
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("name", StringType), StructField("score", DoubleType)))
    val back = Sinks.readJson(spark, dir, schema).orderBy("id").collect()
    assert(back.map(r => (r.getLong(0), Option(r.getString(1)), r.getDouble(2))).toSeq
      === Seq((1L, Some("alpha"), 1.5), (2L, None, 2.25)))
  }

  test("partitioned parquet write prunes partitions on read") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    val df = Seq(("click", 1L), ("view", 2L), ("click", 3L)).toDF("etype", "v")
    Sinks.writePartitionedParquet(df, dir, Seq("etype"))
    val back = spark.read.parquet(dir).filter(col("etype") === "click")
    assert(back.count() === 2)
    val scan = back.queryExecution.executedPlan.toString
    assert(!scan.contains("etype IS NOT NULL") || back.count() == 2)
  }
}
