package graft

import org.apache.spark.sql.functions._

class DotFoldSpec extends SparkSpec {
  import spark.implicits._

  test("native DotFold is bit-identical to the HOF fold on real vectors") {
    val e = Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .select(Dsl.asDoubleArray(col("embedding")).as("v"))
    val both = e.select(
      Dsl.dotFold(col("v"), col("v")).as("native"),
      Dsl.dotFoldHof(col("v"), col("v")).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() === 0)
    assert(both.filter(col("native").isNull).count() === 0)
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
