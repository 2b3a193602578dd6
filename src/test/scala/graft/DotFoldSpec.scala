package graft

import org.apache.spark.sql.functions._

class DotFoldSpec extends SparkSpec {
  import spark.implicits._

  test("native DotFold is bit-identical to the HOF fold on real vectors") {
    // exclude the RewriteDotFold optimizer rule so the HOF side really
    // runs interpreted — otherwise this test compares native to native
    val prev = spark.conf.getOption("spark.sql.optimizer.excludedRules")
    spark.conf.set("spark.sql.optimizer.excludedRules",
      "graft.plans.RewriteDotFold")
    try {
      val e = Tables(spark, "/root/testdata/sf0.001", "embeddings")
        .select(Dsl.asDoubleArray(col("embedding")).as("v"))
      val both = e.select(
        Dsl.dotFold(col("v"), col("v")).as("native"),
        Dsl.dotFoldHof(col("v"), col("v")).as("hof"))
      // the exclusion must actually work, or the comparison is vacuous
      assert(!both.queryExecution.optimizedPlan.toString.contains("graft_dot(v, v) AS hof"))
      assert(both.filter(col("native") =!= col("hof")).count() === 0)
      assert(both.filter(col("native").isNull).count() === 0)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.optimizer.excludedRules", v)
      case None => spark.conf.unset("spark.sql.optimizer.excludedRules")
    }
  }

  test("optimizer rewrites the HOF dot-product pattern to the native kernel") {
    val e = Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .select(Dsl.asDoubleArray(col("embedding")).as("v"))
    val hof = e.select(Dsl.dotFoldHof(col("v"), col("v")).as("d"))
    assert(hof.queryExecution.optimizedPlan.toString.contains("graft_dot"))
    // rewritten plan still computes the right value
    val native = e.select(Dsl.dotFold(col("v"), col("v")).as("d"))
    assert(hof.collect().map(_.getDouble(0)).toSeq ===
      native.collect().map(_.getDouble(0)).toSeq)
  }

  test("rewrite does not fire for a non-zero seed or a non-product zip") {
    val e = Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .select(Dsl.asDoubleArray(col("embedding")).as("v"))
    val wrongZero = e.select(
      aggregate(zip_with(col("v"), col("v"), (x, y) => x * y),
        lit(1.0), (acc, x) => acc + x).as("d"))
    assert(!wrongZero.queryExecution.optimizedPlan.toString.contains("graft_dot"))
    val wrongOp = e.select(
      aggregate(zip_with(col("v"), col("v"), (x, y) => x + y),
        lit(0.0), (acc, x) => acc + x).as("d"))
    assert(!wrongOp.queryExecution.optimizedPlan.toString.contains("graft_dot"))
  }

  test("DotFold null semantics: length mismatch and null elements") {
    val df = Seq(
      (Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](3.0, 4.0)),
      (Seq[java.lang.Double](1.0), Seq[java.lang.Double](3.0, 4.0)),
      (Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](3.0, 4.0))
    ).toDF("a", "b")
    val out = df.select(Dsl.dotFold(col("a"), col("b")).as("d")).collect()
    assert(out(0).getDouble(0) === 11.0)
    assert(out(1).isNullAt(0))
    assert(out(2).isNullAt(0))
  }

  test("graft_dot is registered via GraftExtensions for SQL") {
    val r = spark.sql("SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .collect().head.getDouble(0)
    assert(r === 11.0)
  }
}
