package graft

import graft.operators.IntervalSweep
import org.apache.spark.sql.functions._

class IntervalSweepSpec extends SparkSpec {
  import spark.implicits._

  test("peak matches brute-force overlap counting") {
    val rnd = new scala.util.Random(13)
    val iv = Seq.fill(500) {
      val g = rnd.nextInt(4)
      val s = rnd.nextInt(10000).toLong
      (g, s, s + 1 + rnd.nextInt(500))
    }
    val df = iv.toDF("g", "s", "e")
    val got = IntervalSweep.peakConcurrency(df, Seq("g"), "s", "e")
      .select("g", "peak").as[(Int, Long)].collect().toMap
    // brute force: concurrency at time t = #{[s,e) : s <= t < e},
    // and the peak is attained at some interval's start
    val byG = iv.groupBy(_._1)
    byG.foreach { case (g, is) =>
      val peak = is.map { case (_, t, _) =>
        is.count { case (_, s, e) => s <= t && t < e }
      }.max
      assert(got(g) === peak.toLong, s"group $g")
    }
  }

  test("end-exclusive: back-to-back intervals never overlap") {
    val df = Seq((1, 0L, 10L), (1, 10L, 20L), (1, 20L, 30L)).toDF("g", "s", "e")
    val r = IntervalSweep.peakConcurrency(df, Seq("g"), "s", "e")
      .select("n_intervals", "peak").as[(Long, Long)].head()
    assert(r === ((3L, 1L)))
  }

  test("identical intervals stack") {
    val df = Seq.fill(7)((1, 5L, 6L)).toDF("g", "s", "e")
    val peak = IntervalSweep.peakConcurrency(df, Seq("g"), "s", "e")
      .select("peak").as[Long].head()
    assert(peak === 7L)
  }

  test("a null boundary fails loudly instead of corrupting the sweep") {
    // Spark windows sort nulls FIRST, SQL oracles ORDER BY NULLS LAST —
    // a null boundary would corrupt the running sum differently in each
    // engine, so the operator raises per-row instead
    val df = Seq((1, Some(0L), Some(10L)), (1, Some(5L), None))
      .toDF("g", "s", "e")
    val ex = intercept[Exception] {
      IntervalSweep.peakConcurrency(df, Seq("g"), "s", "e").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
    assert(msgs(ex).exists(m => m != null && m.contains("null e boundary")))
  }
}
