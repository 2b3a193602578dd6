package graft

import graft.sources.TxLog
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** The txlog DataSource surface (graft.sources.txlog.DefaultSource):
  * format-API reads ≡ TxLog.snapshot, time travel via asOf,
  * merge-on-read via keyCols, pushdown reaching the scan, and the
  * append-only writer committing one segment per save. */
class TxLogFormatSpec extends SparkSpec {

  private val Fmt = "graft.sources.txlog"

  private def freshTable(): String =
    java.nio.file.Files.createTempDirectory("txlog_fmt").toString + "/t"

  test("writer commits one segment per save; reads equal snapshot") {
    import spark.implicits._
    val t = freshTable()
    Seq(1L, 2L).toDF("id").write.format(Fmt).mode(SaveMode.Append).save(t)
    Seq(3L).toDF("id").write.format(Fmt).mode(SaveMode.Append).save(t)
    assert(TxLog.versions(t) === Seq(0, 1), "one commit per save")
    val got = spark.read.format(Fmt).load(t)
      .as[Long].collect().sorted.toSeq
    assert(got === Seq(1L, 2L, 3L))
    assert(got === TxLog.snapshot(spark, t, 1).as[Long].collect().sorted.toSeq)
    // short name registered through META-INF/services
    val short = spark.read.format("graft-txlog").load(t)
      .as[Long].collect().sorted.toSeq
    assert(short === got)
  }

  test("asOf time-travels; keyCols applies merge-on-read tombstones") {
    import spark.implicits._
    val t = freshTable()
    Seq(1L, 2L, 3L).toDF("id").write.format(Fmt).mode(SaveMode.Append).save(t)
    Seq(4L).toDF("id").write.format(Fmt).mode(SaveMode.Append).save(t)
    TxLog.commitDeletes(Seq(2L).toDF("id"), t)
    def ids(r: org.apache.spark.sql.DataFrame) =
      r.select("id").as[Long].collect().sorted.toSeq
    assert(ids(spark.read.format(Fmt).option("asOf", 0).load(t)) ===
      Seq(1L, 2L, 3L))
    // deletes apply BY DEFAULT (the Delta/Iceberg contract): with no
    // keyCols option the keys derive from the tombstone segment's own
    // schema — a reader who never heard of keyCols must not silently
    // see deleted rows
    assert(ids(spark.read.format(Fmt).load(t)) === Seq(1L, 3L, 4L))
    assert(ids(spark.read.format(Fmt).option("keyCols", "id").load(t)) ===
      Seq(1L, 3L, 4L))
    // option("raw") is the explicit escape hatch to the raw snapshot
    assert(ids(spark.read.format(Fmt).option("raw", "true").load(t)) ===
      Seq(1L, 2L, 3L, 4L))
    // a table with no tombstones takes the plain snapshot path
    val clean = freshTable()
    Seq(7L).toDF("id").write.format(Fmt).mode(SaveMode.Append).save(clean)
    assert(ids(spark.read.format(Fmt).load(clean)) === Seq(7L))
  }

  test("mergeSchema: later segments may add columns; a type change fails loudly") {
    import spark.implicits._
    val t = freshTable()
    Seq((1L, "a")).toDF("id", "tag")
      .write.format(Fmt).mode(SaveMode.Append).save(t)
    Seq((2L, "b", 9L)).toDF("id", "tag", "extra")
      .write.format(Fmt).mode(SaveMode.Append).save(t)
    // without mergeSchema: Spark's first-file schema wins (historical
    // behavior, still the fast single multi-path scan)
    val merged = spark.read.format(Fmt).option("mergeSchema", "true").load(t)
      .orderBy("id").collect()
    assert(merged.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    assert(merged(0).isNullAt(merged(0).fieldIndex("extra")),
      "pre-evolution rows must read the added column as NULL")
    assert(merged(1).getLong(merged(1).fieldIndex("extra")) === 9L)
    // MoR composes with evolution: delete id=1, merged read drops it
    TxLog.commitDeletes(Seq(1L).toDF("id"), t)
    val mor = spark.read.format(Fmt).option("mergeSchema", "true").load(t)
      .collect()
    assert(mor.map(_.getLong(0)).toSeq === Seq(2L))
    // a column-TYPE change is a rewrite, not evolution — loud failure
    Seq(("x", 3L)).toDF("tag", "id").select(col("id").cast("int").as("id"),
        col("tag"))
      .write.format(Fmt).mode(SaveMode.Append).save(t)
    val e = intercept[IllegalArgumentException] {
      spark.read.format(Fmt).option("mergeSchema", "true").load(t).collect()
    }
    assert(e.getMessage.contains("not schema evolution"))
  }

  test("filters and pruning push through the format boundary") {
    import spark.implicits._
    val t = freshTable()
    (1L to 100L).map(i => (i, s"name_$i")).toDF("id", "name")
      .write.format(Fmt).mode(SaveMode.Append).save(t)
    val q = spark.read.format(Fmt).load(t)
      .filter(col("id") > 90L).select("name")
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") && p.contains("GreaterThan(id,90)"),
      s"filter did not reach the V1 scan:\n${p.take(1500)}")
    assert(q.count() === 10)
    // zero-column COUNT(*) shape survives the positional-row contract
    assert(spark.read.format(Fmt).load(t).count() === 100)
  }

  test("CREATE TABLE ... USING the format reads through the catalog") {
    import spark.implicits._
    val t = freshTable()
    Seq((1L, "a"), (2L, "b")).toDF("id", "tag")
      .write.format(Fmt).mode(SaveMode.Append).save(t)
    spark.sql("DROP TABLE IF EXISTS txlog_ddl")
    spark.sql(s"CREATE TABLE txlog_ddl USING `graft-txlog` " +
      s"OPTIONS (path '$t')")
    try {
      val got = spark.sql("SELECT id FROM txlog_ddl WHERE tag = 'b'")
        .as[Long].collect().toSeq
      assert(got === Seq(2L))
    } finally spark.sql("DROP TABLE IF EXISTS txlog_ddl")
  }

  test("streaming CDF: the stream continues through deletes, emitting tagged change rows") {
    import spark.implicits._
    val t = freshTable()
    Seq(1L, 2L, 3L).toDF("id").write.format(Fmt).mode(SaveMode.Append).save(t)
    TxLog.commitDeletes(Seq(2L).toDF("id"), t)
    Seq(2L, 9L).toDF("id").write.format(Fmt).mode(SaveMode.Append).save(t)
    // the plain stream fails loudly on the tombstoned span
    val plain = spark.readStream.format(Fmt).load(t)
      .writeStream.format("memory").queryName("cdf_plain")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    val failed = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      plain.awaitTermination()
    }
    assert(failed.getMessage.contains("deletes") ||
      failed.cause.getMessage.contains("deletes"))
    // the CDF stream reads through it, emitting the changesCdf rows
    val q = spark.readStream.format(Fmt).option("cdf", "true").load(t)
      .writeStream.format("memory").queryName("cdf_rows")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    def canon(df: org.apache.spark.sql.DataFrame): Seq[(Long, String, Int)] =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
        .sortBy(x => (x._3, x._2, x._1)).toSeq
    val streamed = canon(spark.table("cdf_rows")
      .select("id", "_change_type", "_commit_version"))
    val direct = canon(TxLog.changesCdf(spark, t, -1,
      TxLog.latestVersion(t).get))
    assert(streamed === direct && streamed.nonEmpty,
      "streamed CDF must equal the direct change-feed read")
    assert(streamed.exists(_._2 == "delete"), "delete row missing")
  }

  test("streaming source: versions are offsets, restart resumes at the delta") {
    import spark.implicits._
    val t = freshTable()
    val ckpt = freshTable() + "_ckpt"
    Seq(1L, 2L).toDF("id").write.format(Fmt).mode(SaveMode.Append).save(t)
    Seq(3L).toDF("id").write.format(Fmt).mode(SaveMode.Append).save(t)
    val batches = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
    def runPass(): Unit = {
      val q = spark.readStream.format(Fmt).load(t)
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          batches.synchronized {
            batches += b.select("id").collect().map(_.getLong(0)).sorted.toSeq
          }
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runPass()
    assert(batches.flatten.sorted === Seq(1L, 2L, 3L),
      "first pass must deliver all committed rows")
    val passOne = batches.size
    // grow the table; the restarted query must read ONLY the delta
    Seq(4L, 5L).toDF("id").write.format(Fmt).mode(SaveMode.Append).save(t)
    runPass()
    val delta = batches.drop(passOne)
    assert(delta.flatten.sorted === Seq(4L, 5L),
      s"restart re-read old versions: $delta")
  }

  test("streaming source fails loudly on a delete inside an unread span") {
    import spark.implicits._
    val t = freshTable()
    Seq(1L, 2L).toDF("id").write.format(Fmt).mode(SaveMode.Append).save(t)
    TxLog.commitDeletes(Seq(1L).toDF("id"), t)
    val q = spark.readStream.format(Fmt).load(t)
      .writeStream.format("noop")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException](
      q.awaitTermination())
    assert(e.getMessage.contains("append-only") ||
      Option(e.getCause).exists(_.getMessage.contains("append-only")))
  }

  test("mode(Overwrite) is a logical truncate: one commit, prior versions time-travelable") {
    import spark.implicits._
    val t = freshTable()
    Seq(1L, 2L).toDF("id").write.format(Fmt).mode(SaveMode.Append).save(t)
    Seq(3L).toDF("id").write.format(Fmt).mode(SaveMode.Append).save(t)
    Seq(9L).toDF("id").write.format(Fmt).mode(SaveMode.Overwrite).save(t)
    assert(spark.read.format(Fmt).load(t)
      .as[Long].collect().sorted.toSeq === Seq(9L))
    // ONE commit: two appends + the overwrite = versions 0,1,2
    assert(graft.sources.TxLog.versions(t) === Seq(0, 1, 2))
    // prior versions stay readable (logical truncate, not a delete)
    assert(spark.read.format(Fmt).option("asOf", 1).load(t)
      .as[Long].collect().sorted.toSeq === Seq(1L, 2L, 3L))
    // an overwrite also retires live tombstones — they applied to
    // the replaced data
    graft.sources.TxLog.commitDeletes(Seq(9L).toDF("id"), t)
    Seq(5L).toDF("id").write.format(Fmt).mode(SaveMode.Overwrite).save(t)
    assert(spark.read.format(Fmt).load(t)
      .as[Long].collect().toSeq === Seq(5L))
    assert(graft.sources.TxLog.liveSegments(t,
      graft.sources.TxLog.latestVersion(t).get).size === 1)
  }

  test("ErrorIfExists and Ignore follow their SaveMode contracts") {
    import spark.implicits._
    val t = freshTable()
    Seq(1L).toDF("id").write.format(Fmt)
      .mode(SaveMode.ErrorIfExists).save(t)
    val e = intercept[Exception] {
      Seq(2L).toDF("id").write.format(Fmt)
        .mode(SaveMode.ErrorIfExists).save(t)
    }
    assert(e.getMessage.contains("already has commits"))
    Seq(3L).toDF("id").write.format(Fmt).mode(SaveMode.Ignore).save(t)
    assert(spark.read.format(Fmt).load(t)
      .as[Long].collect().toSeq === Seq(1L), "Ignore must be a no-op")
  }

  test("SQL INSERT INTO / INSERT OVERWRITE work through the catalog") {
    import spark.implicits._
    val t = freshTable()
    Seq(1L, 2L).toDF("id").write.format(Fmt).mode(SaveMode.Append).save(t)
    val tbl = s"txlog_dml_${System.nanoTime()}"
    spark.sql(s"CREATE TABLE $tbl USING `graft-txlog` OPTIONS (path '$t')")
    try {
      spark.sql(s"INSERT INTO $tbl VALUES (3), (4)")
      spark.sql(s"REFRESH TABLE $tbl")
      assert(spark.table(tbl).as[Long].collect().sorted.toSeq ===
        Seq(1L, 2L, 3L, 4L))
      spark.sql(s"INSERT OVERWRITE $tbl VALUES (7)")
      spark.sql(s"REFRESH TABLE $tbl")
      assert(spark.table(tbl).as[Long].collect().toSeq === Seq(7L))
      // pre-overwrite history still time-travels through the format
      // (v0 = writer append, v1 = INSERT INTO, v2 = INSERT OVERWRITE)
      assert(spark.read.format(Fmt).option("asOf", 1).load(t)
        .as[Long].collect().sorted.toSeq === Seq(1L, 2L, 3L, 4L))
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $tbl"); ()
    }
  }

  test("segment stats skip filter-disjoint segments before any footer is opened") {
    import graft.sources.txlog.TxLogRelation
    import org.apache.spark.sql.sources
    import spark.implicits._
    val t = freshTable()
    spark.range(0, 100).selectExpr("id", "CAST(id AS STRING) AS s")
      .write.format(Fmt).option("statsCols", "id,s")
      .mode(SaveMode.Append).save(t)
    spark.range(100, 200).selectExpr("id", "CAST(id AS STRING) AS s")
      .write.format(Fmt).option("statsCols", "id,s")
      .mode(SaveMode.Append).save(t)
    // a third segment WITHOUT stats: never skippable
    spark.range(200, 300).selectExpr("id", "CAST(id AS STRING) AS s")
      .write.format(Fmt).mode(SaveMode.Append).save(t)
    val rel = TxLogRelation(spark.sqlContext, t,
      Some(TxLog.latestVersion(t).get), None)
    def kept(fs: sources.Filter*): Seq[String] =
      rel.keptSegments(fs.toArray)
    val all = Seq("write__seg000000", "write__seg000001", "write__seg000002")
    assert(kept() === all)
    assert(kept(sources.LessThan("id", 50L)) ===
      Seq("write__seg000000", "write__seg000002"),
      "seg1 is provably disjoint; the stats-less seg2 must be kept")
    assert(kept(sources.EqualTo("id", 150L)) ===
      Seq("write__seg000001", "write__seg000002"))
    assert(kept(sources.GreaterThanOrEqual("id", 100L)) ===
      Seq("write__seg000001", "write__seg000002"))
    assert(kept(sources.In("id", Array(5L, 7L))) ===
      Seq("write__seg000000", "write__seg000002"))
    assert(kept(sources.And(sources.GreaterThan("id", 10L),
      sources.LessThan("id", 20L))) ===
      Seq("write__seg000000", "write__seg000002"))
    assert(kept(sources.Or(sources.EqualTo("id", 5L),
      sources.EqualTo("id", 105L))) === all)
    // unknown filter shapes and absent columns keep everything
    assert(kept(sources.IsNotNull("id")) === all)
    assert(kept(sources.EqualTo("nope", 1L)) === all)
    // the actual scan plan contains ONLY the kept segments' paths
    val plan = rel.scanDf(Array("id"),
      Array(sources.LessThan("id", 50L): sources.Filter))
      .queryExecution.executedPlan.toString
    assert(plan.contains("write__seg000000"))
    assert(!plan.contains("write__seg000001"),
      "the scan opened a stats-pruned segment")
    // end-to-end rows identical to the unpruned read
    val got = spark.read.format(Fmt).load(t).filter(col("id") < 50)
      .select("id").as[Long].collect().sorted
    assert(got.toSeq === (0L until 50L))
    // an all-pruned scan is an empty relation, not an error
    assert(spark.read.format(Fmt).load(t)
      .filter(col("id") === 5000L).count() === 0)
    // string stats prune too (lexicographic ranges: "zzz" is past
    // both stats-bearing segments' maxima; "150" is lexicographically
    // INSIDE seg0's ["0","99"] so only a value-range miss prunes)
    assert(kept(sources.EqualTo("s", "zzz")) === Seq("write__seg000002"))
    // skipping composes with MoR: tombstones still apply to kept segs
    TxLog.commitDeletes(Seq(5L).toDF("id"), t)
    assert(spark.read.format(Fmt).load(t).filter(col("id") < 50)
      .count() === 49)
  }

  test("SQL DELETE FROM commits one tombstone segment; deletes apply MoR") {
    import spark.implicits._
    val t = freshTable()
    Seq((1L, "a"), (2L, "b"), (3L, "a"), (4L, "c")).toDF("id", "tag")
      .write.format(Fmt).mode(SaveMode.Append).save(t)
    val tbl = s"txlog_del_${System.nanoTime()}"
    spark.sql(s"CREATE TABLE $tbl USING `graft-txlog` " +
      s"OPTIONS (path '$t', keyCols 'id')")
    try {
      spark.sql(s"DELETE FROM $tbl WHERE tag = 'a'")
      assert(spark.table(tbl).select("id").as[Long].collect().sorted.toSeq ===
        Seq(2L, 4L))
      // ONE tombstone commit, no data rewrite: v0 = append, v1 = delete
      assert(TxLog.versions(t) === Seq(0, 1))
      assert(TxLog.liveSegments(t, 1).count(_.startsWith("deletes__")) === 1)
      // pre-delete version still time-travels
      assert(spark.read.format(Fmt).option("asOf", 0).load(t).count() === 4)
      // a matching-nothing predicate commits NOTHING
      spark.sql(s"DELETE FROM $tbl WHERE tag = 'zzz'")
      assert(TxLog.versions(t) === Seq(0, 1))
      // re-insert of a deleted key revives it (version-aware rule)
      spark.sql(s"INSERT INTO $tbl VALUES (1, 'back')")
      spark.sql(s"REFRESH TABLE $tbl")
      assert(spark.table(tbl).select("id").as[Long].collect().sorted.toSeq ===
        Seq(1L, 2L, 4L))
      // DELETE FROM without WHERE empties the table, history intact
      spark.sql(s"DELETE FROM $tbl")
      assert(spark.table(tbl).count() === 0)
      assert(spark.read.format(Fmt).option("asOf", 0).load(t).count() === 4)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $tbl"); ()
    }
    // a non-graft table still gets Spark's own DELETE error
    val plain = s"plain_del_${System.nanoTime()}"
    spark.sql(s"CREATE TABLE $plain (id BIGINT) USING parquet")
    try intercept[Exception](spark.sql(s"DELETE FROM $plain WHERE id = 1"))
    finally spark.sql(s"DROP TABLE IF EXISTS $plain")
  }

  test("CREATE TABLE AS SELECT lands one segment through the catalog") {
    import spark.implicits._
    val t = freshTable()
    val tbl = s"txlog_ctas_${System.nanoTime()}"
    spark.sql(s"CREATE TABLE $tbl USING `graft-txlog` " +
      s"OPTIONS (path '$t') AS SELECT id FROM range(0, 5)")
    try {
      assert(spark.table(tbl).as[Long].collect().sorted.toSeq ===
        (0L until 5L))
      assert(TxLog.versions(t) === Seq(0), "CTAS = one segment, one commit")
      // and the created table takes the full DML surface immediately
      spark.sql(s"DELETE FROM $tbl WHERE id = 3")
      assert(spark.table(tbl).as[Long].collect().sorted.toSeq ===
        Seq(0L, 1L, 2L, 4L))
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $tbl"); ()
    }
  }

  test("SQL UPDATE rewrites matched rows in ONE atomic commit") {
    import spark.implicits._
    val t = freshTable()
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "a", 30.0))
      .toDF("id", "tag", "x")
      .write.format(Fmt).mode(SaveMode.Append).save(t)
    val tbl = s"txlog_upd_${System.nanoTime()}"
    spark.sql(s"CREATE TABLE $tbl USING `graft-txlog` " +
      s"OPTIONS (path '$t', keyCols 'id')")
    try {
      spark.sql(s"UPDATE $tbl SET x = x * 2, tag = 'up' WHERE tag = 'a'")
      val rows = spark.table(tbl).orderBy("id").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
      assert(rows === Seq((1L, "up", 20.0), (2L, "b", 20.0),
        (3L, "up", 60.0)))
      // ONE commit: tombstone + replacement in the same manifest
      assert(TxLog.versions(t) === Seq(0, 1))
      val live = TxLog.liveSegments(t, 1)
      assert(live.count(_.startsWith("deletes__")) === 1)
      assert(live.count(_.startsWith("write__")) === 2)
      // pre-update version still time-travels
      assert(spark.sql(s"SELECT x FROM $tbl VERSION AS OF 0 WHERE id = 1")
        .as[Double].head() === 10.0)
      // no-match UPDATE commits nothing; aliased UPDATE resolves
      spark.sql(s"UPDATE $tbl SET x = 0 WHERE tag = 'zzz'")
      assert(TxLog.versions(t) === Seq(0, 1))
      spark.sql(s"UPDATE $tbl AS u SET u.x = u.x + 1 WHERE u.id = 2")
      assert(spark.sql(s"SELECT x FROM $tbl WHERE id = 2")
        .as[Double].head() === 21.0)
      // updating a KEY column kills the row under its OLD identity
      spark.sql(s"UPDATE $tbl SET id = 100 WHERE id = 1")
      assert(spark.table(tbl).select("id").as[Long].collect().sorted.toSeq
        === Seq(2L, 3L, 100L))
      // assigned values cast to the column's existing type (no covert
      // schema change: x stays DOUBLE after an integer-literal assign)
      spark.sql(s"UPDATE $tbl SET x = 7 WHERE id = 2")
      assert(spark.table(tbl).schema("x").dataType ===
        org.apache.spark.sql.types.DoubleType)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $tbl"); ()
    }
  }

  test("SQL MERGE INTO: update/delete/insert + by-source in one atomic commit") {
    import spark.implicits._
    val t = freshTable()
    Seq((1L, "keep", 10.0), (2L, "upd", 20.0), (3L, "del", 30.0),
      (4L, "stale", 40.0))
      .toDF("id", "tag", "x")
      .write.format(Fmt).mode(SaveMode.Append).save(t)
    val tbl = s"txlog_mrg_${System.nanoTime()}"
    spark.sql(s"CREATE TABLE $tbl USING `graft-txlog` " +
      s"OPTIONS (path '$t', keyCols 'id')")
    Seq((2L, "merged", 200.0), (3L, "doomed", 0.0), (9L, "new", 90.0))
      .toDF("id", "tag", "x").createOrReplaceTempView("mrg_src")
    try {
      spark.sql(s"""
        MERGE INTO $tbl t USING mrg_src s ON t.id = s.id
        WHEN MATCHED AND s.tag = 'doomed' THEN DELETE
        WHEN MATCHED THEN UPDATE SET tag = s.tag, x = s.x + t.x
        WHEN NOT MATCHED THEN INSERT (id, tag, x) VALUES (s.id, s.tag, s.x)
        WHEN NOT MATCHED BY SOURCE AND t.tag = 'stale' THEN DELETE""")
      val rows = spark.table(tbl).orderBy("id").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
      assert(rows === Seq((1L, "keep", 10.0), (2L, "merged", 220.0),
        (9L, "new", 90.0)))
      // the WHOLE merge is ONE commit: v0 = append, v1 = merge
      assert(TxLog.versions(t) === Seq(0, 1))
      assert(spark.read.format(Fmt).option("asOf", 0).load(t).count() === 4)
      // star actions map by name (the CDC upsert shorthand)
      Seq((9L, "star", 900.0), (11L, "star11", 110.0))
        .toDF("id", "tag", "x").createOrReplaceTempView("mrg_src2")
      spark.sql(s"""
        MERGE INTO $tbl t USING mrg_src2 s ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *""")
      val rows2 = spark.table(tbl).orderBy("id").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
      assert(rows2 === Seq((1L, "keep", 10.0), (2L, "merged", 220.0),
        (9L, "star", 900.0), (11L, "star11", 110.0)))
      // Delta's cardinality rule: multiple source matches fail loudly
      Seq((9L, "dup1", 1.0), (9L, "dup2", 2.0)).toDF("id", "tag", "x")
        .createOrReplaceTempView("mrg_dup")
      val e = intercept[Exception](spark.sql(s"""
        MERGE INTO $tbl t USING mrg_dup s ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET *"""))
      assert(e.getMessage.contains("multiple source rows"))
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $tbl"); ()
    }
  }

  test("SQL OPTIMIZE / VACUUM / DESCRIBE HISTORY maintenance keystrokes") {
    import spark.implicits._
    val t = freshTable()
    (0 until 3).foreach { i =>
      Seq((i * 10L + 1, i.toLong), (i * 10L + 2, i.toLong))
        .toDF("id", "day")
        .write.format(Fmt).option("statsCols", "day")
        .mode(SaveMode.Append).save(t)
    }
    val tbl = s"txlog_opt_${System.nanoTime()}"
    spark.sql(s"CREATE TABLE $tbl USING `graft-txlog` " +
      s"OPTIONS (path '$t', keyCols 'id')")
    try {
      spark.sql(s"DELETE FROM $tbl WHERE id = 11")                 // v3
      val hist = spark.sql(s"DESCRIBE HISTORY $tbl").collect()
      assert(hist.map(_.getInt(0)).toSeq === Seq(3, 2, 1, 0), "newest first")
      assert(hist.head.getString(2).startsWith("deletes__"))
      assert(hist.forall(_.getBoolean(4)), "all data commits so far")
      // the timestamp column rides the manifest mtimes, newest first
      assert(hist.map(_.getTimestamp(1).getTime).toSeq ===
        (0 to 3).map(v => TxLog.commitTimeMillis(t, v)).reverse)
      // OPTIMIZE folds the tombstoned table through the MoR path
      val opt = spark.sql(s"OPTIMIZE $tbl").collect()
      assert(opt.map(r => (r.getString(0), r.getInt(1))).toSeq ===
        Seq(("write", 4)))
      assert(spark.table(tbl).select("id").as[Long].collect().sorted.toSeq
        === Seq(1L, 2L, 12L, 21L, 22L))
      val live = TxLog.liveSegments(t, 4)
      assert(live === Seq("compact__seg4"), s"got $live")
      // stats carried through the SQL OPTIMIZE (e54's contract)
      assert(TxLog.segmentStats(t, "compact__seg4")
        .exists(_.get("day").contains(("0", "2", "long"))))
      // idempotent: a compacted table returns no rows
      assert(spark.sql(s"OPTIMIZE $tbl").collect().isEmpty)
      // the maintenance commit is visible in history as data_change=false
      val hist2 = spark.sql(s"DESCRIBE HISTORY $tbl").collect()
      assert(!hist2.head.getBoolean(4) && hist2.head.getInt(0) === 4)
      // default VACUUM reclaims nothing fresh (the RETAIN-HOURS age
      // window protects a concurrent writer's staged dirs) …
      assert(spark.sql(s"VACUUM $tbl").collect().isEmpty)
      // … the single-maintainer override reclaims the four retired
      // dirs immediately, keeps the log
      val gone = spark.sql(s"VACUUM $tbl RETAIN 0 HOURS FORCE")
        .as[String].collect().toSeq
      assert(gone === Seq("deletes__seg3", "write__seg000000",
        "write__seg000001", "write__seg000002"))
      assert(TxLog.versions(t) === Seq(0, 1, 2, 3, 4), "manifests kept")
      assert(spark.table(tbl).count() === 5)
      // RETAIN guard + non-graft fall-through (OPTIMIZE stays a parse
      // error outside the format)
      intercept[Exception](spark.sql(s"VACUUM $tbl RETAIN 0 VERSIONS"))
      intercept[Exception](spark.sql("OPTIMIZE definitely_not_a_table"))
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $tbl"); ()
    }
  }

  test("SQL OPTIMIZE ZORDER BY lays the table out on the Morton curve") {
    import spark.implicits._
    val t = freshTable()
    // two independent uniform dimensions, landed in insertion order
    // (worst case for locality) across two appends + a delete
    val rows = (0 until 8000).map(i => (i.toLong, (i % 89).toLong,
      (i / 89).toLong))
    rows.take(4000).toDF("id", "a", "b")
      .write.format(Fmt).option("statsCols", "id")
      .mode(SaveMode.Append).save(t)
    rows.drop(4000).toDF("id", "a", "b")
      .write.format(Fmt).option("statsCols", "id")
      .mode(SaveMode.Append).save(t)
    val tbl = s"txlog_zorder_${System.nanoTime()}"
    spark.sql(s"CREATE TABLE $tbl USING `graft-txlog` " +
      s"OPTIONS (path '$t', keyCols 'id', zorderFiles '8')")
    try {
      spark.sql(s"DELETE FROM $tbl WHERE id = 7")
      val opt = spark.sql(s"OPTIMIZE $tbl ZORDER BY (a, b)").collect()
      assert(opt.map(r => (r.getString(0), r.getInt(1))).toSeq ===
        Seq(("zorder", 3)))
      // one live segment, tombstones applied and retired
      assert(TxLog.liveSegments(t, 3) === Seq("compact__seg3"))
      assert(spark.table(tbl).count() === 7999)
      assert(spark.table(tbl).filter(col("id") === 7L).count() === 0)
      // stats recomputed for the zorder columns
      val st = TxLog.segmentStats(t, "compact__seg3").get
      assert(st.contains("a") && st.contains("b") && st.contains("id"))
      // the MORTON layout: each part file covers a narrow range of
      // EVERY clustered dimension (lexicographic sort would keep `b`
      // near-global in every file)
      val parts = new java.io.File(t, "compact__seg3").listFiles()
        .filter(f => f.getName.endsWith(".parquet")).map(_.toString)
      assert(parts.length === 8, s"expected 8 zorder files, got ${parts.length}")
      def avgSpan(c: String): Double = parts.map { p =>
        val mm = spark.read.parquet(p)
          .agg(org.apache.spark.sql.functions.min(col(c)),
            org.apache.spark.sql.functions.max(col(c))).head()
        (mm.getLong(1) - mm.getLong(0)).toDouble
      }.sum / parts.length
      val globalA = 88.0
      val globalB = rows.map(_._3).max.toDouble
      assert(avgSpan("a") <= 0.75 * globalA,
        s"a-span ${avgSpan("a")} not localized (global $globalA)")
      assert(avgSpan("b") <= 0.75 * globalB,
        s"b-span ${avgSpan("b")} not localized (global $globalB)")
      // pushed filters on either dimension stay pushed (row-group
      // pruning applies inside the single segment's scan)
      val p = spark.table(tbl).filter(col("b") === 3L)
        .queryExecution.executedPlan.toString
      assert(p.contains("PushedFilters") && p.contains("EqualTo(b,3)"))
      // an index store refuses the whole-table zorder fold
      val store = freshTable()
      Seq((1L, 2L)).toDF("n_id", "cluster")
        .write.parquet(s"$store/postings__seg0")
      TxLog.commit(store, Seq("postings__seg0"))
      val tbl2 = s"txlog_zorder_store_${System.nanoTime()}"
      spark.sql(s"CREATE TABLE $tbl2 USING `graft-txlog` " +
        s"OPTIONS (path '$store')")
      try {
        val e = intercept[Exception](
          spark.sql(s"OPTIMIZE $tbl2 ZORDER BY (n_id)"))
        assert(e.getMessage.contains("plain tables"))
      } finally spark.sql(s"DROP TABLE IF EXISTS $tbl2")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $tbl"); ()
    }
  }

  test("SQL VERSION AS OF reads pinned snapshots through the catalog") {
    import spark.implicits._
    val t = freshTable()
    Seq(1L, 2L).toDF("id").write.format(Fmt).mode(SaveMode.Append).save(t)
    Seq(3L).toDF("id").write.format(Fmt).mode(SaveMode.Append).save(t)
    val tbl = s"txlog_tt_${System.nanoTime()}"
    spark.sql(s"CREATE TABLE $tbl USING `graft-txlog` OPTIONS (path '$t')")
    try {
      def ids(sql: String): Seq[Long] =
        spark.sql(sql).as[Long].collect().sorted.toSeq
      assert(ids(s"SELECT id FROM $tbl VERSION AS OF 0") === Seq(1L, 2L))
      assert(ids(s"SELECT id FROM $tbl VERSION AS OF 1") === Seq(1L, 2L, 3L))
      assert(ids(s"SELECT id FROM $tbl") === Seq(1L, 2L, 3L))
      // qualified references resolve (the spliced relation is aliased)
      assert(ids(s"SELECT $tbl.id FROM $tbl VERSION AS OF 0") ===
        Seq(1L, 2L))
      // two versions of ONE table join against each other
      val grew = spark.sql(
        s"""SELECT count(*) AS n FROM $tbl VERSION AS OF 1
            WHERE id NOT IN (SELECT id FROM $tbl VERSION AS OF 0)""")
        .collect().head.getLong(0)
      assert(grew === 1L)
      // deletes apply inside the pinned read too
      TxLog.commitDeletes(Seq(1L).toDF("id"), t)
      assert(ids(s"SELECT id FROM $tbl VERSION AS OF 2") === Seq(2L, 3L))
      assert(ids(s"SELECT id FROM $tbl VERSION AS OF 1") === Seq(1L, 2L, 3L))
      // CTE definitions are innerChildren — the rewrite must recurse
      // into them explicitly (a plain transform walk misses them)
      assert(ids(s"""WITH pinned AS
          (SELECT id FROM $tbl VERSION AS OF 0)
          SELECT id FROM pinned""") === Seq(1L, 2L))
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $tbl"); ()
    }
  }

  test("string stats never mis-prune across the UTF-16/UTF-8 order divergence") {
    import spark.implicits._
    val t = freshTable()
    // segment range ["a", "😀"] in UTF8String order (Spark's min/max);
    // "" sits INSIDE it in UTF-8 byte order but ABOVE the max in
    // UTF-16 code-unit order — a String.compareTo reader would prune
    // the segment and silently drop the matching row
    Seq("a", "", "😀").toDF("s")
      .write.format(Fmt).option("statsCols", "s")
      .mode(SaveMode.Append).save(t)
    assert(TxLog.segmentStats(t, "write__seg000000").get("s") ===
      ("a", "😀", "string"))
    assert(spark.read.format(Fmt).load(t)
      .filter(col("s") === "").count() === 1,
      "supplementary-plane max bound mis-pruned a matching segment")
    // and genuinely-disjoint values still prune
    import graft.sources.txlog.TxLogRelation
    import org.apache.spark.sql.sources
    val rel = TxLogRelation(spark.sqlContext, t,
      Some(TxLog.latestVersion(t).get), None)
    assert(rel.keptSegments(
      Array(sources.EqualTo("s", ""))).nonEmpty)
    assert(rel.keptSegments(
      Array(sources.EqualTo("s", ""))).isEmpty)
  }

  test("SQL INSERT INTO a statsCols table records skipping sidecars") {
    val t = freshTable()
    spark.range(0, 10).toDF("id")
      .write.format(Fmt).option("statsCols", "id")
      .mode(SaveMode.Append).save(t)
    val tbl = s"txlog_stats_dml_${System.nanoTime()}"
    spark.sql(s"CREATE TABLE $tbl USING `graft-txlog` " +
      s"OPTIONS (path '$t', statsCols 'id')")
    try {
      spark.sql(s"INSERT INTO $tbl VALUES (100), (110)")
      // the SQL-written segment carries the same sidecar the
      // DataFrame-writer path records — skipping coverage must not
      // silently degrade through the catalog surface
      assert(TxLog.segmentStats(t, "write__seg000001").get("id") ===
        ("100", "110", "long"))
      import graft.sources.txlog.TxLogRelation
      import org.apache.spark.sql.sources
      val rel = TxLogRelation(spark.sqlContext, t,
        Some(TxLog.latestVersion(t).get), None)
      assert(rel.keptSegments(Array(sources.GreaterThan("id", 50L))) ===
        Seq("write__seg000001"))
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $tbl"); ()
    }
  }

  test("streaming sink: one segment per batch, exactly-once across checkpoint loss") {
    import spark.implicits._
    val t = freshTable()
    val out = freshTable() + "_out"
    (0 until 3).foreach(i =>
      TxLog.appendBatch(Seq(i.toLong * 10, i.toLong * 10 + 1).toDF("id"),
        i.toLong, t))
    def drain(ckpt: String): Unit = {
      val q = spark.readStream.format(Fmt)
        .option("maxVersionsPerTrigger", 1).load(t)
        .writeStream.format(Fmt)
        .option("checkpointLocation", ckpt)
        .option("statsCols", "id")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start(out)
      q.awaitTermination()
    }
    drain(s"$out-ckpt1")
    assert(TxLog.versions(out) === Seq(0, 1, 2), "one commit per batch")
    def ids() = spark.read.format(Fmt).load(out)
      .as[Long].collect().sorted.toSeq
    assert(ids() === Seq(0L, 1L, 10L, 11L, 20L, 21L))
    // the sink records skipping sidecars like the batch writer
    assert(TxLog.segmentStats(out, "batch__000000").get("id") ===
      ("0", "1", "long"))
    // checkpoint LOSS: a fresh drain redelivers every batch id — the
    // manifest-history ledger recognizes them all; no new versions,
    // no duplicated rows (exactly-once without the checkpoint's help)
    drain(s"$out-ckpt2")
    assert(TxLog.versions(out) === Seq(0, 1, 2),
      "redelivered batches must not re-commit")
    assert(ids() === Seq(0L, 1L, 10L, 11L, 20L, 21L))
    // append-only contract: non-Append output modes are refused
    val agg = spark.readStream.format(Fmt).load(t)
      .groupBy("id").count()
    val e = intercept[Exception] {
      agg.writeStream.format(Fmt).outputMode("complete")
        .option("checkpointLocation", s"$out-ckpt3").start(s"$out-bad")
    }
    assert(e.getMessage.contains("append-only"))
  }

  test("maxVersionsPerTrigger drains AvailableNow in capped micro-batches") {
    import spark.implicits._
    val t = freshTable()
    (0 until 3).foreach(i =>
      TxLog.appendBatch(Seq(i.toLong).toDF("id"), i.toLong, t))
    val batches = new java.util.concurrent.ConcurrentHashMap[Long, Seq[Long]]()
    def drain(): Unit = {
      val q = spark.readStream.format(Fmt)
        .option("maxVersionsPerTrigger", 1).load(t)
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          batches.put(id, b.as[Long].collect().sorted.toSeq); ()
        }
        .option("checkpointLocation", s"$t-ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drain()
    // one micro-batch per version — no single-batch fallback
    assert(batches.size === 3, s"expected 3 capped batches, got $batches")
    (0 until 3).foreach(i =>
      assert(batches.get(i.toLong) === Seq(i.toLong)))
    // restart resumes at the checkpointed version, still capped
    TxLog.appendBatch(Seq(7L, 8L).toDF("id"), 3L, t)
    TxLog.appendBatch(Seq(9L).toDF("id"), 4L, t)
    drain()
    assert(batches.size === 5)
    assert(batches.get(3L) === Seq(7L, 8L) && batches.get(4L) === Seq(9L))
  }

  test("inconsistent tombstone key schemas fail auto-MoR inference loudly") {
    import spark.implicits._
    val t = freshTable()
    Seq((1L, "a"), (2L, "b")).toDF("id", "x")
      .write.format(Fmt).mode(SaveMode.Append).save(t)
    graft.sources.TxLog.commitDeletes(Seq(1L).toDF("id"), t)
    graft.sources.TxLog.commitDeletes(
      Seq((2L, "b")).toDF("id", "x"), t) // wider key set
    val e = intercept[Exception] {
      spark.read.format(Fmt).load(t).collect()
    }
    assert(e.getMessage.contains("inconsistent key schemas"))
    // explicit keyCols resolves it; raw=true bypasses tombstones
    assert(spark.read.format(Fmt).option("keyCols", "id").load(t)
      .count() === 0)
    assert(spark.read.format(Fmt).option("raw", "true").load(t)
      .count() === 2)
  }

  test("a cached catalog relation sees later commits without REFRESH TABLE") {
    import spark.implicits._
    val t = freshTable()
    Seq(1L).toDF("id").write.format(Fmt).mode(SaveMode.Append).save(t)
    val tbl = s"txlog_fresh_${System.nanoTime()}"
    spark.sql(s"CREATE TABLE $tbl USING `graft-txlog` OPTIONS (path '$t')")
    try {
      // resolve (and cache) the relation BEFORE the writes land
      assert(spark.table(tbl).count() === 1)
      spark.sql(s"INSERT INTO $tbl VALUES (2)")
      // no REFRESH TABLE, no DML that would refresh as a side effect:
      // the unpinned relation must re-resolve the latest version
      assert(spark.table(tbl).as[Long].collect().sorted.toSeq ===
        Seq(1L, 2L))
      // out-of-band writers (another engine process appending to the
      // same dir) are visible too
      Seq(3L).toDF("id").write.format(Fmt).mode(SaveMode.Append).save(t)
      assert(spark.table(tbl).count() === 3)
      // while an EXPLICIT pin stays frozen forever
      assert(spark.sql(s"SELECT id FROM $tbl VERSION AS OF 0")
        .as[Long].collect().toSeq === Seq(1L))
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $tbl"); ()
    }
  }

  test("SQL RESTORE: metadata undo, rewrite on tombstoned target, noop") {
    import spark.implicits._
    val t = freshTable()
    Seq(1L, 2L).toDF("id").write.format(Fmt).mode(SaveMode.Append).save(t)
    val tbl = s"txlog_restore_${System.nanoTime()}"
    spark.sql(s"CREATE TABLE $tbl USING `graft-txlog` " +
      s"OPTIONS (path '$t', keyCols 'id')")
    try {
      spark.sql(s"INSERT INTO $tbl VALUES (3)")                    // v1
      spark.sql(s"DELETE FROM $tbl WHERE id = 1")                  // v2
      def ids(): Seq[Long] =
        spark.table(tbl).as[Long].collect().sorted.toSeq
      assert(ids() === Seq(2L, 3L))
      // undo the delete: the target (v1) has no tombstones → metadata
      val r1 = spark.sql(s"RESTORE TABLE $tbl TO VERSION AS OF 1")
        .collect().head
      assert((r1.getInt(0), r1.getInt(1), r1.getString(2)) ===
        ((1, 3, "metadata")))
      assert(ids() === Seq(1L, 2L, 3L))
      // restore TO the tombstoned state → materializing rewrite
      val r2 = spark.sql(s"RESTORE TABLE $tbl TO VERSION AS OF 2")
        .collect().head
      assert(r2.getString(2) === "rewrite")
      assert(ids() === Seq(2L, 3L))
      // restoring to an identical live set is a noop row
      val r3 = spark.sql(s"RESTORE TABLE $tbl TO VERSION AS OF 4")
        .collect().head
      assert(r3.getString(2) === "noop" && r3.isNullAt(1))
      // RESTORE over a non-graft name falls through to Spark's parser
      val e = intercept[Exception](spark.sql(
        "RESTORE TABLE not_a_graft_table TO VERSION AS OF 1"))
      assert(e.getMessage.toLowerCase.contains("syntax") ||
        e.getMessage.contains("PARSE"))
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $tbl"); ()
    }
  }

  test("SQL CONVERT TO GRAFT adopts a plain parquet dir zero-copy") {
    import spark.implicits._
    val t = freshTable()
    Seq(1L, 2L, 3L).toDF("id").repartition(2)
      .write.mode("overwrite").parquet(t)
    val r = spark.sql(s"CONVERT TO GRAFT parquet.`$t`").collect().head
    assert(r.getString(0) === "convert__seg000000" && r.getInt(2) === 0)
    assert(spark.read.format(Fmt).load(t).as[Long].collect().sorted
      .toSeq === Seq(1L, 2L, 3L))
    // converting twice fails loudly
    val e = intercept[Exception](spark.sql(s"CONVERT TO GRAFT parquet.`$t`"))
    assert(e.getMessage.contains("already"))
  }

  test("SQL SHALLOW CLONE forks a table zero-copy; sides diverge") {
    import spark.implicits._
    val src = freshTable()
    Seq(1L, 2L).toDF("id").write.format(Fmt).mode(SaveMode.Append).save(src)
    val srcTbl = s"txlog_clone_src_${System.nanoTime()}"
    val dstTbl = s"txlog_clone_dst_${System.nanoTime()}"
    spark.sql(s"CREATE TABLE $srcTbl USING `graft-txlog` " +
      s"OPTIONS (path '$src', keyCols 'id')")
    try {
      spark.sql(s"DELETE FROM $srcTbl WHERE id = 1")               // v1
      val dst = freshTable() + "/dst"
      val r = spark.sql(s"CREATE TABLE $dstTbl SHALLOW CLONE $srcTbl " +
        s"LOCATION '$dst'").collect().head
      assert(r.getInt(0) === 2 && r.getString(1) === dst)
      def ids(tbl: String): Seq[Long] =
        spark.table(tbl).as[Long].collect().sorted.toSeq
      assert(ids(dstTbl) === Seq(2L))
      // the clone inherits keyCols: DML works immediately; divergence
      spark.sql(s"INSERT INTO $dstTbl VALUES (9)")
      spark.sql(s"DELETE FROM $dstTbl WHERE id = 2")
      assert(ids(dstTbl) === Seq(9L))
      assert(ids(srcTbl) === Seq(2L))
      // SHALLOW CLONE of a non-graft source falls through to Spark
      val e = intercept[Exception](spark.sql(
        s"CREATE TABLE never_made SHALLOW CLONE some_parquet_table"))
      assert(e.getMessage.toLowerCase.contains("syntax") ||
        e.getMessage.contains("PARSE"))
    } finally {
      Seq(srcTbl, dstTbl).foreach(x =>
        spark.sql(s"DROP TABLE IF EXISTS $x"))
    }
  }

  test("SQL TIMESTAMP AS OF resolves through manifest commit times") {
    import spark.implicits._
    val t = freshTable()
    Seq(1L).toDF("id").write.format(Fmt).mode(SaveMode.Append).save(t)
    Seq(2L).toDF("id").write.format(Fmt).mode(SaveMode.Append).save(t)
    val log = java.nio.file.Paths.get(t, "_txlog")
    def stamp(v: Int, ms: Long): Unit = {
      java.nio.file.Files.setLastModifiedTime(log.resolve(s"v$v.json"),
        java.nio.file.attribute.FileTime.fromMillis(ms)); ()
    }
    val base = 1700000000000L
    stamp(0, base); stamp(1, base + 60000L)
    val tbl = s"txlog_ts_${System.nanoTime()}"
    spark.sql(s"CREATE TABLE $tbl USING `graft-txlog` OPTIONS (path '$t')")
    try {
      val zone = java.time.ZoneId.of(
        spark.sessionState.conf.sessionLocalTimeZone)
      def lit(ms: Long): String =
        java.time.Instant.ofEpochMilli(ms).atZone(zone).toLocalDateTime
          .format(java.time.format.DateTimeFormatter
            .ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
      def ids(ms: Long): Seq[Long] = spark.sql(
        s"SELECT id FROM $tbl TIMESTAMP AS OF '${lit(ms)}'")
        .as[Long].collect().sorted.toSeq
      assert(ids(base) === Seq(1L))
      assert(ids(base + 59999L) === Seq(1L))
      assert(ids(base + 60000L) === Seq(1L, 2L))
      assert(ids(base + 999999L) === Seq(1L, 2L))
      val e = intercept[Exception](ids(base - 1))
      assert(e.getMessage.contains("predates"))
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $tbl"); ()
    }
  }

  test("bloom and null-tally skipping prune segments before any footer opens") {
    import graft.sources.txlog.TxLogRelation
    import org.apache.spark.sql.sources
    import spark.implicits._
    val t = freshTable()
    // three segments, ranges OVERLAPPING on purpose (every [min,max]
    // straddles the probes) so only the bloom can point-prune
    Seq((1L, Some("a")), (500L, Some("b")), (999L, None)).toDF("id", "s")
      .write.format(Fmt).option("statsCols", "id,s")
      .option("bloomCols", "id").mode(SaveMode.Append).save(t)
    Seq((2L, Some("c")), (998L, Some("d"))).toDF("id", "s")
      .write.format(Fmt).option("statsCols", "id,s")
      .option("bloomCols", "id").mode(SaveMode.Append).save(t)
    Seq((3L, None: Option[String]), (997L, None)).toDF("id", "s")
      .write.format(Fmt).option("statsCols", "id,s")
      .option("bloomCols", "id").mode(SaveMode.Append).save(t)
    val rel = TxLogRelation(spark.sqlContext, t,
      Some(TxLog.latestVersion(t).get), None)
    def kept(fs: sources.Filter*): Seq[String] = rel.keptSegments(fs.toArray)
    // range stats CANNOT discriminate id=500 (all ranges straddle it);
    // the bloom keeps exactly the one holding segment
    assert(kept(sources.EqualTo("id", 500L)) === Seq("write__seg000000"))
    assert(kept(sources.EqualTo("id", 998L)) === Seq("write__seg000001"))
    // IN probes keep the union of their members' segments
    assert(kept(sources.In("id", Array[Any](500L, 997L))) ===
      Seq("write__seg000000", "write__seg000002"))
    // an id in no segment prunes everything
    assert(kept(sources.EqualTo("id", 444L)).isEmpty)
    // null tallies: segment 3 is all-NULL in s → IS NOT NULL prunes it;
    // segment 2 has no NULL s → IS NULL prunes it
    assert(kept(sources.IsNotNull("s")) ===
      Seq("write__seg000000", "write__seg000001"))
    assert(kept(sources.IsNull("s")) ===
      Seq("write__seg000000", "write__seg000002"))
    // the actual reads agree with the pruned plans
    val df = spark.read.format(Fmt).load(t)
    assert(df.filter(col("id") === 500L).count() === 1)
    assert(df.filter(col("s").isNull).count() === 3)
    assert(df.filter(col("s").isNotNull).count() === 4)
  }

  test("CHECK constraints: violating writes commit nothing, on every path") {
    import spark.implicits._
    val t = freshTable()
    val write = Seq((1L, 10.0), (2L, 20.0)).toDF("id", "price")
      .write.format(Fmt).option("checks", "price > 0; id IS NOT NULL")
    write.mode(SaveMode.Append).save(t)
    // writer path: a violating batch fails BEFORE anything lands
    val e1 = intercept[IllegalArgumentException] {
      Seq((3L, -1.0)).toDF("id", "price")
        .write.format(Fmt).option("checks", "price > 0")
        .mode(SaveMode.Append).save(t)
    }
    assert(e1.getMessage.contains("CHECK constraint violated") &&
      e1.getMessage.contains("price > 0"))
    assert(TxLog.versions(t) === Seq(0), "violation must commit nothing")
    assert(!new java.io.File(t, "write__seg000001").exists(),
      "violation must not even stage a segment dir")
    val tbl = s"txlog_checks_${System.nanoTime()}"
    spark.sql(s"CREATE TABLE $tbl USING `graft-txlog` OPTIONS " +
      s"(path '$t', keyCols 'id', checks 'price > 0')")
    try {
      // SQL INSERT inherits the table's checks
      val e2 = intercept[Exception](
        spark.sql(s"INSERT INTO $tbl VALUES (4, -5.0)"))
      assert(e2.getMessage.contains("CHECK constraint violated"))
      spark.sql(s"INSERT INTO $tbl VALUES (4, 5.0)")              // v1
      // UPDATE must not smuggle in a violating value
      val e3 = intercept[Exception](
        spark.sql(s"UPDATE $tbl SET price = -price WHERE id = 1"))
      assert(e3.getMessage.contains("CHECK constraint violated"))
      assert(TxLog.versions(t) === Seq(0, 1))
      // NULL passes — SQL CHECK semantics
      spark.sql(s"INSERT INTO $tbl VALUES (5, NULL)")             // v2
      assert(spark.table(tbl).count() === 4)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $tbl"); ()
    }
  }

  test("table_changes TVF reads the change feed through SQL") {
    import spark.implicits._
    val t = freshTable()
    Seq(1L, 2L).toDF("id").write.format(Fmt).mode(SaveMode.Append).save(t)
    Seq(3L).toDF("id").write.format(Fmt).mode(SaveMode.Append).save(t)
    val tbl = s"txlog_tvf_${System.nanoTime()}"
    spark.sql(s"CREATE TABLE $tbl USING `graft-txlog` " +
      s"OPTIONS (path '$t', keyCols 'id')")
    try {
      spark.sql(s"DELETE FROM $tbl WHERE id = 1")                 // v2
      def rows(sql: String): Seq[(Long, String, Int)] =
        spark.sql(sql).collect()
          .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
          .sortBy(x => (x._3, x._2, x._1)).toSeq
      val full = rows(s"SELECT id, _change_type, _commit_version " +
        s"FROM table_changes('$tbl', 0, 2)")
      assert(full === Seq((1L, "insert", 0), (2L, "insert", 0),
        (3L, "insert", 1), (1L, "delete", 2)))
      // endVersion defaults to latest; startVersion is inclusive
      assert(rows(s"SELECT id, _change_type, _commit_version " +
        s"FROM table_changes('$tbl', 1)") ===
        Seq((3L, "insert", 1), (1L, "delete", 2)))
      // composes with plain SQL (aggregation over the feed)
      val n = spark.sql(s"SELECT count(*) FROM table_changes('$tbl', 0, 2) " +
        "WHERE _change_type = 'insert'").collect().head.getLong(0)
      assert(n === 3L)
      // a non-graft first argument falls through to Spark's own error
      val e = intercept[Exception](spark.sql(
        "SELECT * FROM table_changes('no_such_graft_table', 0)").collect())
      assert(e.getMessage.toLowerCase.contains("table_changes"))
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $tbl"); ()
    }
  }
}
