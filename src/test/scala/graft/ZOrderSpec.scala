package graft

import graft.sources.ClusteredWriter
import org.apache.spark.sql.functions._

/** [[ClusteredWriter.writeZOrdered]]: the Morton expression must match
  * a plain-Scala model bit-for-bit, and the layout it produces must
  * give BOTH clustered dimensions narrow per-file ranges — the
  * property parquet min/max pruning needs, and the one lexicographic
  * range clustering cannot provide for the trailing column.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def modelZ(vals: Seq[Double], los: Seq[Double],
      spans: Seq[Double], bits: Int): Long = {
    val n = vals.size
    val top = (1L << bits) - 1
    val scaled = vals.indices.map { i =>
      val span = math.max(spans(i), java.lang.Double.MIN_NORMAL)
      val s = math.floor((vals(i) - los(i)) / span * top).toLong
      math.min(math.max(s, 0L), top)
    }
    (0 until bits).flatMap { b =>
      scaled.zipWithIndex.map { case (s, i) => (((s >> b) & 1L) << (b * n + i)) }
    }.reduce(_ | _)
  }

  test("zValue column expression agrees with the Scala model") {
    val lo = Seq(0.0, -50.0)
    val span = Seq(1000.0, 200.0)
    // seeded: covers out-of-band values (clamped) and the full span
    val rnd = new scala.util.Random(42)
    val pts = List.fill(500)(
      (rnd.between(-100.0, 1200.0), rnd.between(-80.0, 180.0)))
    val df = pts.toDF("x", "y")
    val got = df.select(ClusteredWriter.zValue(
      Seq(col("x"), col("y")), lo, span, bitsPerCol = 16).as("z"))
      .as[Long].collect().toSeq
    val want = pts.map(p => modelZ(Seq(p._1, p._2), lo, span, 16))
    assert(got === want)
  }

  test("z-ordered layout keeps BOTH dimensions narrow per file") {
    val grid = for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong)
    val dir = java.nio.file.Files.createTempDirectory("graft_z").toString + "/g"
    ClusteredWriter.writeZOrdered(grid.toDF("x", "y"), dir, nFiles = 16,
      zCols = Seq("x", "y"))
    val perFile = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
      .select("sx", "sy").as[(Long, Long)].collect()
    assert(perFile.length >= 8, "expected a multi-file layout")
    // 4096 points into >=8 files: a z-curve cell spans at most half the
    // 64-wide domain in each dimension (lexicographic layout would show
    // sy = 63 on every file).
    assert(perFile.forall { case (sx, sy) => sx <= 32 && sy <= 32 },
      s"per-file spans not locality-bounded: ${perFile.toSeq}")
  }

  test("z-ordered round trip preserves the rows exactly") {
    val rows = (0 until 500).map(i => (i.toLong % 37, i.toLong, s"r$i"))
    val dir = java.nio.file.Files.createTempDirectory("graft_z").toString + "/r"
    ClusteredWriter.writeZOrdered(rows.toDF("k", "seq", "tag"), dir,
      nFiles = 4, zCols = Seq("k", "seq"))
    val back = spark.read.parquet(dir).as[(Long, Long, String)].collect()
    assert(back.sortBy(_._2).toSeq === rows.sortBy(_._2))
  }

  test("empty input still writes a readable dataset") {
    val dir = java.nio.file.Files.createTempDirectory("graft_z").toString + "/e"
    ClusteredWriter.writeZOrdered(
      Seq.empty[(Long, Long)].toDF("a", "b"), dir, nFiles = 4,
      zCols = Seq("a", "b"))
    assert(spark.read.parquet(dir).count() === 0)
  }
}
