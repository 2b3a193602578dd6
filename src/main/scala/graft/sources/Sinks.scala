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

  /** Full-table JDBC write, installed ATOMICALLY: rows land in a
    * scratch stage table, then a rename (pair) inside one transaction
    * swaps it live — readers of `table` see the old state or the new
    * one, never a truncated in-between, and a crash mid-write leaves
    * the previous table untouched (scratch is swept on the next
    * call). */
  def writeJdbc(df: DataFrame, url: String, table: String,
      numPartitions: Int = 8, props: Properties = new Properties()): Unit = {
    val stage = table + "__stage"
    val old = table + "__old"
    dropIfExists(url, stage, props)
    dropIfExists(url, old, props)
    writeRaw(df, url, stage, numPartitions, props)
    inTransaction(url, props) { conn =>
      if (jdbcTableExists(url, table, props)) renameTable(conn, table, old)
      renameTable(conn, stage, table)
    }
    dropIfExists(url, old, props)
  }

  /** The unstaged write primitive (used for scratch/stage tables,
    * where atomicity is meaningless). `columnTypes` optionally
    * overrides created column DDL (`"c VARCHAR(1024)"` syntax). */
  private def writeRaw(df: DataFrame, url: String, table: String,
      numPartitions: Int, props: Properties,
      columnTypes: Option[String] = None): Unit = {
    val w = df.coalesce(numPartitions).write.mode(SaveMode.Overwrite)
    columnTypes.foreach(ct => w.option("createTableColumnTypes", ct))
    w.jdbc(url, table, props)
  }

  def readJdbc(spark: SparkSession, url: String, table: String,
      props: Properties = new Properties()): DataFrame =
    spark.read.jdbc(url, table, props)

  /** Upsert into a JDBC table without engine MERGE support (SQLite-
    * class targets): union the incoming batch with the current rows,
    * keep the winner per key (incoming beats existing; ties within the
    * batch break on the version column, then deterministically on the
    * remaining columns). The read-modify-write is the portable JDBC
    * merge; at warehouse scale swap the terminal hop for the engine's
    * native MERGE and keep the same dedup plan.
    *
    * ATOMICITY: the live table is NEVER truncated. The merged result
    * is written to a scratch stage table (`table__stage`), and only
    * then installed — first load via ONE transactional rename, an
    * existing table via a rename pair inside one transaction (full
    * path) or a DELETE+INSERT inside one transaction (delta path). A
    * crash anywhere before the final commit leaves the previous table
    * byte-identical (SinksAtomicSpec kills the stage write mid-flight
    * and proves survival); a crash after it leaves the new state.
    * Leftover `__stage`/`__old` scratch from a crashed run is swept on
    * the next call.
    *
    * O(DELTA): pass `partCol` (a column whose values cluster each
    * batch — a date, a source, a key-range bucket) and the merge is
    * scoped to the TOUCHED partitions only: the existing-side read
    * pushes `partCol IN (touched)` down to the database, the stage
    * holds only touched-partition rows, and the install transaction
    * deletes+reinserts exactly those partitions — the e22 dynamic-
    * partition-overwrite contract, composed with the upsert. Without
    * `partCol` every installment rewrites the whole table (still
    * atomically), which at 100 TB makes the terminal hop O(table) per
    * batch — fine for dimension-sized tables, wrong for fact sinks. */
  /** CDC extension: pass `opCol` (a batch column holding 'U' upsert /
    * 'D' delete) and the merge becomes MERGE-INTO with deletes — the
    * key's winning change row is picked by the same window (version
    * desc, then op desc so a tie resolves U-before-D deterministically,
    * then the remaining columns), a winning 'U' upserts, a winning 'D'
    * removes the key from the table. The op column itself is never
    * stored: existing rows participate in the window as implicit 'U's.
    * Delete scoping composes with `partCol`: a change row carries its
    * key's (stable) partition value, so the touched-partition
    * delete+refill drops deleted keys without scanning untouched
    * partitions. */
  def upsertJdbc(spark: SparkSession, batch: DataFrame, url: String,
      table: String, keyCols: Seq[String], versionCol: String,
      numPartitions: Int = 8, props: Properties = new Properties(),
      partCol: Option[String] = None,
      opCol: Option[String] = None,
      txnHook: java.sql.Connection => Unit = _ => ()): Unit = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // NOTE: a partition column outside the key must be STABLE per key
    // (a key that moves partitions would leave its old row behind in a
    // partition the batch didn't touch) — contract on the caller, like
    // e22's partition column.
    require(partCol.forall(batch.columns.contains),
      s"partCol $partCol must be a batch column")
    require(opCol.forall(batch.columns.contains),
      s"opCol $opCol must be a batch column")
    require(opCol.forall(c => !keyCols.contains(c) && c != versionCol &&
      !partCol.contains(c)), s"opCol $opCol must be a dedicated column")
    val stage = table + "__stage"
    val old = table + "__old"
    // sweep scratch from a previous crashed run BEFORE deciding paths
    dropIfExists(url, stage, props)
    dropIfExists(url, old, props)
    // existence is decided by catalog metadata, not by whether a read
    // throws: a transient read failure must surface as an error, never
    // silently downgrade the merge to a table-clobbering first load
    val tableExists = jdbcTableExists(url, table, props)
    val touched: Option[Seq[Any]] = partCol.filter(_ => tableExists).map { p =>
      // distinct partition values in the batch: small by the partCol
      // contract (a batch clusters in few partitions), so the collect
      // is bounded — this is partition METADATA, not data. The cap
      // makes a broken contract fail LOUDLY at the driver instead of
      // oom-ing it or ballooning the install transaction: a batch
      // touching >10k partitions means partCol is not a partition
      // column for this workload — use the full path.
      val vals = batch.select(col(p)).distinct().limit(10001)
        .collect().map(_.get(0)).toSeq
      require(vals.size <= 10000,
        s"batch touches >10000 distinct '$p' partitions — partCol is " +
          "not clustering this workload; drop partCol for the full path")
      // NULL partition values would silently corrupt the merge: both
      // the pushed `IN` filter and the scoped DELETE evaluate to NULL
      // (never true) for a NULL partition, so existing NULL-partition
      // rows are neither read into the merge nor deleted while the
      // stage still inserts the batch's NULL rows — duplicate keys
      // accumulate. Fail loudly, like the partition-count cap.
      require(!vals.contains(null),
        s"batch contains NULL '$p' partition values — NULL never " +
          "matches the pushed IN filter or the partition-scoped " +
          "DELETE, so the merge would silently duplicate keys; map " +
          "NULL to a sentinel value or drop partCol for the full path")
      vals
    }
    val existing =
      if (!tableExists) None
      else Some {
        val full = readJdbc(spark, url, table, props)
        // the IN filter is pushed down to the database scan (JDBC
        // filter pushdown), so the delta path reads only touched
        // partitions — O(batch + matching partitions), not O(table)
        touched.zip(partCol) match {
          case Some((vals, p)) => full.filter(col(p).isin(vals: _*))
          case None => full
        }
      }
    // the batch itself dedups through the same window whether or not
    // the table exists — duplicate keys within a first-load batch must
    // not survive either. With opCol, existing rows are implicit 'U's
    // (the table never stores the op column).
    val tagged = existing.foldLeft(batch.withColumn("__new", lit(1))) {
      (b, cur) => b.unionByName(opCol.foldLeft(cur.withColumn("__new", lit(0))) {
        (c, op) => c.withColumn(op, lit("U"))
      })
    }
    val others = batch.columns.filterNot(keyCols.contains)
      .filterNot(_ == versionCol).filterNot(opCol.contains).map(col).toSeq
    // tie-break order differs by mode. Upsert (no opCol): batch-wins —
    // `__new` before version is the documented "a batch row replaces
    // the stored row" contract. CDC (opCol): VERSION-wins — a late or
    // redelivered change row with a STALE version must never beat the
    // newer stored state (a stale 'D' would otherwise DELETE a newer
    // row — destructive, unlike the upsert path's mere rewrite);
    // same-version ties still resolve to the batch row via `__new`.
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy((if (opCol.isDefined)
          Seq(col(versionCol).desc, col("__new").desc)
        else Seq(col("__new").desc, col(versionCol).desc)) ++
        (opCol.map(c => col(c).desc).toSeq ++ others.map(_.desc)): _*)
    val merged0 = tagged.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__new", "__rn")
    // a key whose winning change is a delete leaves the table: it is
    // absent from the staged result, and the install path (full
    // rewrite, rename pair, or touched-partition delete+refill) makes
    // that absence the new truth
    val merged = opCol.foldLeft(merged0) { (m, op) =>
      m.filter(col(op) === "U").drop(op)
    }
    // stage write: the live table is read-only during this — the merge
    // plan reads `table`, the writer targets `table__stage` — so no
    // lineage checkpoint is needed and a failure here costs nothing.
    // A string partCol is created as VARCHAR, not the dialect's LOB
    // default: Derby-class engines cannot COMPARE a CLOB, and both the
    // pushed IN filter and the scoped DELETE compare the partition
    // column. Partition values are short identifiers by contract
    // (a date, a source, a bucket id) — 1024 is generous headroom, and
    // an oversized value fails loudly at the write, never silently.
    val stageTypes = partCol
      .filter(p => batch.schema(p).dataType ==
        org.apache.spark.sql.types.StringType)
      .map(p => s"$p VARCHAR(1024)")
    writeRaw(merged, url, stage, numPartitions, props, stageTypes)
    // install: one transaction, previous state survives any crash
    // strictly before the commit
    if (!tableExists) {
      inTransaction(url, props) { conn =>
        renameTable(conn, stage, table)
        txnHook(conn)
      }
    } else touched.zip(partCol) match {
      case Some((vals, p)) =>
        // delta install: delete ONLY touched partitions, refill from
        // the stage (which holds exactly those partitions' merged
        // rows). Untouched partitions are never rewritten.
        inTransaction(url, props) { conn =>
          // chunked IN lists: SQLite-class targets cap bind variables
          // (999 historically); several DELETEs inside the ONE
          // transaction are exactly as atomic as one
          vals.grouped(500).foreach { chunk =>
            val in = chunk.map(_ => "?").mkString(", ")
            val del = conn.prepareStatement(
              s"""DELETE FROM $table WHERE "$p" IN ($in)""")
            try {
              chunk.zipWithIndex.foreach { case (v, i) =>
                del.setObject(i + 1, v)
              }
              del.executeUpdate()
            } finally del.close()
          }
          val colList = merged.columns.map(c => "\"" + c + "\"").mkString(", ")
          val ins = conn.createStatement()
          try ins.executeUpdate(
            s"INSERT INTO $table ($colList) SELECT $colList FROM $stage")
          finally ins.close()
          txnHook(conn)
        }
        dropIfExists(url, stage, props)
      case None =>
        // full install: rename pair in ONE transaction — the table is
        // either entirely the old state or entirely the new one
        inTransaction(url, props) { conn =>
          renameTable(conn, table, old)
          renameTable(conn, stage, table)
          txnHook(conn)
        }
        dropIfExists(url, old, props)
    }
  }

  /** Exactly-once foreachBatch terminal hop: apply `batch` via
    * [[upsertJdbc]] UNLESS this (table, batchId) already committed —
    * the bookkeeping row (`table__applied`) is written INSIDE the same
    * install transaction as the data, so "applied" and "recorded" are
    * one atomic fact:
    *
    *  - crash before the install commit → neither data nor record;
    *    Structured Streaming redelivers the batch, it applies cleanly;
    *  - crash after the commit → record present; the redelivered batch
    *    is SKIPPED (returns false) — never double-applied.
    *
    * That is exactly-once sink semantics on top of foreachBatch's
    * at-least-once delivery, the standard batchId-bookkeeping recipe.
    * (A replay from a FRESH checkpoint restarts batch ids; the merge's
    * key-dedup then makes the reapply value-idempotent — both replay
    * shapes end in the same table.) Returns true iff applied. */
  def upsertBatchExactlyOnce(spark: SparkSession, batch: DataFrame,
      batchId: Long, url: String, table: String, keyCols: Seq[String],
      versionCol: String, numPartitions: Int = 8,
      props: Properties = new Properties(),
      partCol: Option[String] = None,
      opCol: Option[String] = None): Boolean = {
    val bk = table + "__applied"
    if (!jdbcTableExists(url, bk, props)) {
      // idempotent bootstrap: losing a race to another creator is fine
      val conn = java.sql.DriverManager.getConnection(url, props)
      try {
        val st = conn.createStatement()
        try st.executeUpdate(s"CREATE TABLE $bk (batch_id BIGINT)")
        catch { case _: java.sql.SQLException => }
        finally st.close()
      } finally conn.close()
    }
    val applied = {
      val conn = java.sql.DriverManager.getConnection(url, props)
      try {
        val st = conn.prepareStatement(
          s"SELECT 1 FROM $bk WHERE batch_id = ?")
        try { st.setLong(1, batchId); val rs = st.executeQuery()
          try rs.next() finally rs.close()
        } finally st.close()
      } finally conn.close()
    }
    if (applied) false
    else {
      upsertJdbc(spark, batch, url, table, keyCols, versionCol,
        numPartitions, props, partCol, opCol,
        txnHook = { conn =>
          // unconditional insert: if the skip check ever regressed, a
          // reapply would double-record and any count over the
          // bookkeeping table breaks loudly
          val st = conn.prepareStatement(s"INSERT INTO $bk VALUES (?)")
          try { st.setLong(1, batchId); st.executeUpdate() }
          finally st.close()
        })
      true
    }
  }

  /** Run `body` on a connection with autocommit off; commit on
    * success, roll back on any throw. */
  private def inTransaction(url: String, props: Properties)(
      body: java.sql.Connection => Unit): Unit = {
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      conn.setAutoCommit(false)
      try { body(conn); conn.commit() }
      catch { case e: Throwable =>
        try conn.rollback() catch { case _: Throwable => }
        throw e
      }
    } finally conn.close()
  }

  /** Dialect-bridging rename: Derby spells it `RENAME TABLE a TO b`,
    * SQLite/PostgreSQL-class engines `ALTER TABLE a RENAME TO b`. The
    * dialect is chosen from the connection's driver METADATA, never by
    * probing with a failing statement: engines like PostgreSQL abort
    * the surrounding transaction after ANY failed statement ("current
    * transaction is aborted"), which would break the atomic install
    * the rename runs inside. */
  private def renameTable(conn: java.sql.Connection, from: String,
      to: String): Unit = {
    val product = Option(conn.getMetaData.getDatabaseProductName)
      .getOrElse("").toLowerCase
    val sql =
      if (product.contains("derby")) s"RENAME TABLE $from TO $to"
      else s"ALTER TABLE $from RENAME TO $to"
    val st = conn.createStatement()
    try st.executeUpdate(sql) finally st.close()
  }

  private def dropIfExists(url: String, table: String,
      props: Properties): Unit =
    if (jdbcTableExists(url, table, props)) {
      val conn = java.sql.DriverManager.getConnection(url, props)
      try {
        val st = conn.createStatement()
        try st.executeUpdate(s"DROP TABLE $table") finally st.close()
      } finally conn.close()
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
