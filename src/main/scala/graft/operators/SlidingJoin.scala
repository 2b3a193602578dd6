package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sliding-window aggregate join ("point-in-time feature join"): for
  * each probe row, aggregate the build rows with the same key whose
  * event time falls in the trailing band `[t - window, t]`. This is
  * the feature-store backfill primitive — "clicks in the last hour at
  * the moment of each purchase" — and the windowed-aggregate
  * generalization of [[AsOfJoin]] (which carries only the latest row).
  *
  * Spark-first plan: NO JOIN. A band join + groupBy materializes one
  * row per (probe, build) match before collapsing them — quadratic in
  * hot keys and a shuffle of pair volume, the classic skew bomb.
  * Instead the two sides are tagged and UNIONed, probe rows carry NULL
  * in the build-side value columns, and each aggregate is computed
  * with a time-RANGE window frame per key. Empty frames then reproduce
  * LEFT JOIN + aggregate semantics exactly (COUNT = 0, SUM/MIN/MAX/AVG
  * = NULL) because the only non-null values inside any frame are build
  * rows. One shuffle on (key), one sort on (time) — each input row
  * moves once, aggregation state never leaves the window operator, and
  * the frame buffer is bounded by the time band, not the corpus.
  *
  * Skew note: with the plain path a single hot key sorts on one task
  * (the window partitioning is the key alone); the frame STATE stays
  * band-bounded even then. When one key's row count itself breaks the
  * task, pass `chunkMs`: the partition key becomes (key, time-chunk)
  * and build rows are duplicated into every later chunk whose probes
  * can still see them (≤ `ceil(maxWindow/chunkMs)+1` copies — the
  * [[ChunkedWindow]] halo idea in time units), so a hot key spreads
  * over its time range while every probe still sees its full band.
  * Results are hash-identical to the plain path (spec-asserted).
  */
object SlidingJoin {

  /** One output aggregate: `fn` over build-side column `valueCol`,
    * emitted as `outName`. `fn` ∈ sum | count | min | max | avg.
    * `windowMs` overrides the call-level band for THIS aggregate —
    * multi-horizon features ("clicks in 1 h" next to "clicks in 24 h")
    * come from one partition+sort: every distinct horizon is just
    * another RANGE frame over the same shuffled order, so extra
    * horizons cost no extra shuffle. */
  final case class Agg(fn: String, valueCol: String, outName: String,
      windowMs: Option[Long] = None)

  private val fns = Set("sum", "count", "min", "max", "avg")

  /** @param probe    rows to produce output for (all kept, LEFT
    *                 semantics); must share ONLY `keyCol` and `tsCol`
    *                 with `build` — select/rename beforehand
    * @param build    rows to aggregate over the trailing band
    * @param keyCol   equi-key column name present on both sides
    * @param tsCol    event-time (timestamp) column name on both sides
    * @param windowMs trailing band width in milliseconds, inclusive at
    *                 both ends: build rows with
    *                 `probe.ts - windowMs <= build.ts <= probe.ts`
    * @param aggs     aggregates to attach to each probe row
    *
    * Contract: `keyCol`/`tsCol` must be non-null on both sides. A null
    * timestamp would place the row in the window's null peer group —
    * aggregating null-ts build rows together — where a LEFT band join
    * (null never satisfies the ON range) matches nothing; filter nulls
    * out first if the source allows them.
    *
    * @param chunkMs hot-key splitting (see skew note): partition by
    *                (key, floor(t/chunkMs)) with build rows duplicated
    *                into the later chunks whose probes still see them.
    *                Halo fanout `ceil(maxWindow/chunkMs) + 1` must
    *                stay ≤ 64.
    */
  def trailingAgg(
      probe: DataFrame,
      build: DataFrame,
      keyCol: String,
      tsCol: String,
      windowMs: Long,
      aggs: Seq[Agg],
      chunkMs: Option[Long] = None): DataFrame = {
    require(aggs.nonEmpty, "at least one aggregate required")
    require(windowMs >= 0L, s"windowMs must be >= 0, got $windowMs")
    aggs.foreach { a =>
      require(fns.contains(a.fn), s"unsupported agg fn: ${a.fn}")
      require(build.columns.contains(a.valueCol),
        s"build side missing value column ${a.valueCol}")
      require(a.windowMs.forall(_ >= 0L),
        s"windowMs must be >= 0 for ${a.outName}")
    }
    val maxW = aggs.map(_.windowMs.getOrElse(windowMs)).max
    chunkMs.foreach { c =>
      require(c > 0, s"chunkMs must be > 0, got $c")
      // worst case floor((c-1+maxW)/c)+1 = ceil(maxW/c)+1 copies (one
      // more than floor(maxW/c)+1 whenever c does not divide maxW)
      val copies = (maxW + c - 1) / c + 1
      require(copies <= 64, s"chunkMs $c gives up to $copies " +
        s"halo copies per build row; raise chunkMs")
    }
    val shared = probe.columns.toSet.intersect(build.columns.toSet)
    require(shared == Set(keyCol, tsCol),
      s"probe and build must share exactly ($keyCol, $tsCol); " +
        s"shared: ${shared.mkString(", ")}")
    val outNames = aggs.map(_.outName)
    require(outNames.distinct.size == outNames.size,
      s"duplicate agg outName in ${outNames.mkString(", ")}")
    outNames.foreach(o =>
      require(!probe.columns.contains(o) && !build.columns.contains(o),
        s"agg outName $o collides with an input column"))
    val reserved = Seq("__side", "__tms", "__chunk")
    (probe.columns ++ build.columns ++ outNames).foreach(c =>
      require(!reserved.contains(c),
        s"column $c collides with an internal name (${reserved.mkString(", ")})"))

    // unionByName(allowMissingColumns) pads probe rows with NULL in
    // every build-only column — the padding that makes empty frames
    // behave like an unmatched LEFT JOIN.
    val unioned = probe.withColumn("__side", lit(1))
      .unionByName(build.withColumn("__side", lit(0)),
        allowMissingColumns = true)
      .withColumn("__tms", unix_millis(col(tsCol)))

    // Chunked path: probes live only in their own chunk; a build row
    // at t is copied into chunks floor(t/c)..floor((t+maxW)/c) — every
    // chunk whose probes can still see it. A probe p then finds each
    // in-band build row exactly once (in p's chunk), and copies landing
    // out of band are cut by the RANGE frame as usual. floor division
    // via pmod so pre-epoch timestamps chunk consistently.
    val (rows, partCols) = chunkMs match {
      case None => (unioned, Seq(col(keyCol)))
      case Some(c) =>
        def fdiv(e: String) = s"((($e) - pmod(($e), ${c}L)) DIV ${c}L)"
        val chunks = when(col("__side") === 1,
            array(expr(fdiv("__tms"))))
          .otherwise(expr(
            s"sequence(${fdiv("__tms")}, ${fdiv(s"__tms + ${maxW}L")})"))
        (unioned.withColumn("__chunk", explode(chunks)),
          Seq(col(keyCol), col("__chunk")))
    }

    def overFrame(a: Agg): Column = (a.fn match {
      case "sum"   => sum(col(a.valueCol))
      case "count" => count(col(a.valueCol))
      case "min"   => min(col(a.valueCol))
      case "max"   => max(col(a.valueCol))
      case "avg"   => avg(col(a.valueCol))
    }).over(Window.partitionBy(partCols: _*).orderBy(col("__tms"))
      .rangeBetween(-a.windowMs.getOrElse(windowMs), 0L))

    val withAggs = aggs.foldLeft(rows) { (df, a) =>
      df.withColumn(a.outName, overFrame(a))
    }
    val out = probe.columns.map(col) ++ aggs.map(a => col(a.outName))
    withAggs.filter(col("__side") === 1).select(out.toIndexedSeq: _*)
  }
}
