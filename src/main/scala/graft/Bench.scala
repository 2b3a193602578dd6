package graft
import org.apache.spark.sql.SparkSession

object Bench {

  /** The driver captures only the LAST 2000 chars of stdout; a JSON
    * line longer than that gets decapitated before its last-line
    * parser runs (BENCH_r03: line ~2900 chars, tail starts mid-object,
    * parsed:null). Budget with margin. */
  private val MaxLine = 1800

  /** `q01_pricing_summary` → `q01`. Every catalog name's prefix before
    * the first underscore is unique (q01–q50, d01–d06, p01–p09,
    * s01–s03, t01–t05, m01–m04, e01–e02); guarded at runtime below. */
  private def shortKey(name: String): String = name.takeWhile(_ != '_')

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/codegen/scan paths once so per-query timings measure
    // the queries, not first-query JIT + session init. e01/e02 warm-up
    // also materializes the CSV/JSON fixtures OUTSIDE the timed region.
    // Every fixture-backed entry warms up too, so one-off fixture /
    // bucketed-table / Derby writes land outside the timed region on a
    // clean machine (their guards skip the write on the timed pass).
    Seq("q01_pricing_summary", "e01_csv_ingest", "e02_json_ingest",
        "e03_partitioned_roundtrip", "e07_bucketed_join",
        "e08_stream_sessions", "e09_clustered_scan",
        "e10_jdbc_roundtrip", "e11_zorder_scan", "e12_stream_join",
        "e14_schema_evolution", "e15_orc_roundtrip",
        "e16_corrupt_quarantine").foreach {
      n => SparkEntry.queries.get(n)
        .foreach(f => try f(spark, sfDir).count() catch { case _: Throwable => })
    }
    // The shared near-dup builds (Jaccard pair set + components) are
    // cached once per (session, dir) and consumed by seven catalog
    // entries. Materialize them HERE, timed separately, so the one-off
    // build cost stops landing on whichever consumer runs first — that
    // attribution drift made per-query diffs across rounds noise.
    val tShared = System.nanoTime()
    try graft.queries.DedupQueries.warmShared(spark, sfDir)
    catch { case e: Throwable =>
      System.err.println(s"[bench] shared warm-up failed: ${e.getMessage}")
    }
    val sharedSec = (System.nanoTime() - tShared) / 1e9
    // Sorted keys: hash-map iteration order reshuffles whenever the
    // catalog grows, which both scrambles round-over-round comparisons
    // and moves first-consumer cache effects between queries. A fixed
    // lexicographic order makes BENCH_r{N} diffable per query.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop sink: materializes every output column (count() would let
      // Catalyst prune projection-only queries down to nothing).
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false
        }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    // total keeps its round-over-round meaning (all work done once per
    // session): per-query sum PLUS the separately-attributed shared
    // build, which previous rounds counted inside its first consumer.
    val total = results.map(_._2).sum + sharedSec
    def line(keyOf: String => String, fmt: Double => String): String = {
      val qs = results.map { case (k, v, _) => "\"" + keyOf(k) + "\":" + fmt(v) }
        .mkString("{", ",", "}")
      // A failed query must not pass off its (near-zero) elapsed time
      // as a healthy run: the failure list rides in the same JSON line.
      val failed = results.collect { case (k, _, false) => "\"" + keyOf(k) + "\"" }
        .mkString("[", ",", "]")
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","shared_builds":${fmt(sharedSec)},"queries":$qs,"failed":$failed,"sf":"$sfDir"}"""
    }
    // Full precision + full names to a side file for humans/tooling...
    val full = line(identity, _.toString)
    try {
      val out = java.nio.file.Paths.get("target", "bench_full.json")
      java.nio.file.Files.createDirectories(out.getParent)
      java.nio.file.Files.write(out,
        (full + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case e: Throwable =>
      System.err.println(s"[bench] side file write failed: ${e.getMessage}")
    }
    // ...and a compact line on stdout for the driver: short keys, ms
    // precision. Fall back to full names if prefixes ever collide;
    // degrade float precision rather than ever exceeding the budget.
    val keys = results.map(_._1)
    val keyOf: String => String =
      if (keys.map(shortKey).distinct.size == keys.size) shortKey else identity
    // Locale.ROOT: the f-interpolator uses the default locale, whose
    // decimal separator may be ',' — which would make the line invalid
    // JSON and silently null the driver's perf gate on such JVMs.
    def fixed(digits: Int)(v: Double): String =
      String.format(java.util.Locale.ROOT, s"%.${digits}f", Double.box(v))
    // The catalog has grown past the point where even 1-decimal
    // per-query values fit the 2000-char tail (196 entries ≈ 2050
    // chars): degrade to integer seconds next, and as the terminal
    // fallback drop the per-query map entirely — a parseable total
    // (full detail is always in target/bench_full.json) beats a
    // decapitated line the driver reads as parsed:null.
    val summaryOnly =
      s"""{"metric":"total","value":${fixed(1)(total)},"unit":"sec",""" +
        s""""shared_builds":${fixed(1)(sharedSec)},"queries":{},""" +
        s""""failed":${results.collect { case (k, _, false) => "\"" + keyOf(k) + "\"" }
            .mkString("[", ",", "]")},""" +
        s""""queries_file":"target/bench_full.json","sf":"$sfDir"}"""
    val candidates =
      Seq(fixed(3) _, fixed(2) _, fixed(1) _, fixed(0) _).map(line(keyOf, _)) :+
        summaryOnly
    println(candidates.find(_.length <= MaxLine).getOrElse(candidates.last))
    spark.stop()
  }
}
