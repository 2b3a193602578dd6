package graft

import org.apache.spark.sql.SparkSession

/** Plan-capture driver for the optimization rounds: writes each named
  * catalog query's `.explain("formatted")` output to
  * `plans/<tag>/<name>_<suffix>.txt` (the judge checks plan claims
  * against these files; it cannot run Spark itself).
  *
  * {{{
  * sbt 'Test/runMain graft.ExplainQ r17 before q100_triangle_count ...'
  * }}}
  *
  * Fixture-backed entries run their builds as a side effect of plan
  * resolution where needed (the catalog builders are lazy DataFrames;
  * explain does not execute the noop sink, but `once`-fixture bodies
  * run during `build`). That is fine for plan capture — the captured
  * plan is the read-path plan the bench times.
  */
object ExplainQ {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: ExplainQ <tag> <suffix> <query>...")
    val tag = args(0)
    val suffix = args(1)
    val names = args.drop(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outDir = java.nio.file.Paths.get("plans", tag)
    java.nio.file.Files.createDirectories(outDir)
    names.foreach { name =>
      try {
        val df = Catalog.byName(name).build(spark, dir)
        // SPARK_GRAFT_EXPLAIN_EXEC=1: execute THIS DataFrame's own
        // QueryExecution first (collect — catalog outputs are oracle-
        // sized, so small), so AdaptiveSparkPlan is final — join-
        // strategy switches, AQEShuffleRead coalescing, and stage
        // reuse are visible instead of the pre-execution estimates.
        // (A noop write would plan its OWN QueryExecution and leave
        // this one un-executed.)
        if (sys.env.get("SPARK_GRAFT_EXPLAIN_EXEC").contains("1"))
          df.collect()
        // queryExecution.explainString gives the same text explain()
        // prints, without capturing stdout
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(outDir.resolve(s"${name}_$suffix.txt"),
          txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        println(s"EXPLAINED $name -> plans/$tag/${name}_$suffix.txt")
      } catch { case e: Throwable =>
        System.err.println(s"EXPLAIN $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
