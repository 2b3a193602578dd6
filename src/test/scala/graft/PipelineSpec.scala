package graft

import graft.operators.Pipeline
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (0L until 200L).map(i =>
    (i, if (i % 2 == 0) "en" else "de", s"word$i text")).toDF("doc_id", "lang", "text")

  test("stratified sample is deterministic and rate-ordered by stratum") {
    val s1 = Pipeline.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 800, "de" -> 200), 0).select("doc_id").collect().map(_.getLong(0)).toSet
    val s2 = Pipeline.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 800, "de" -> 200), 0).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s1 === s2)                                  // reproducible
    val en = s1.count(_ % 2 == 0)
    val de = s1.size - en
    assert(en > de)                                    // 80% vs 20% rate
    assert(s1.forall(id => id % 2 == 0 || de > 0))
  }

  test("idHash is overflow-safe for ids past 2^31 and unchanged below") {
    // The sf~10 regression class: ids past ~4·10^9 overflowed the
    // raw id·mult product (ANSI error). The pre-reduced form must
    // (a) evaluate without error at any 64-bit id, (b) agree with
    // exact modular arithmetic, and (c) be the identity change for
    // ids below the modulus (every recorded gate hash rides on that).
    val P = BigInt(2147483647L)
    val ids = Seq(0L, 7L, 2147483646L, 2147483647L, 4294967296L + 3L,
      10000000000L, Long.MaxValue, -5L)
    val got = ids.toDF("id")
      .select(Pipeline.idHash(col("id")).as("h")).as[Long].collect()
    ids.zip(got).foreach { case (id, h) =>
      val exact = ((BigInt(id) * 1103515245L + 12345L) mod P).toLong
      assert(h === exact, s"id $id")
    }
  }

  test("zero default rate drops unlisted strata entirely") {
    val s = Pipeline.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 1000), 0).select("lang").distinct().as[String].collect()
    assert(s.toSeq === Seq("en"))
  }

  test("deterministic shuffle gives dense 1..n positions per shard, stable across runs") {
    val out = Pipeline.deterministicShuffle(docs, "doc_id", shards = 4)
      .select("doc_id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(out.length === 200)
    out.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (1L to rows.length).toSeq)
    }
    val again = Pipeline.deterministicShuffle(docs.repartition(7), "doc_id", shards = 4)
      .select("doc_id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(out.sortBy(_._1).toSeq === again.sortBy(_._1).toSeq)  // layout-independent
  }

  test("sequence packing chops the cumulative token stream at the bin size") {
    val d = Seq((0L, "g", 100), (1L, "g", 100), (2L, "g", 100), (3L, "g", 100))
      .toDF("doc_id", "grp", "n_tokens")
    val out = Pipeline.packSequences(d, "grp", "doc_id", "n_tokens", maxTokens = 250)
      .select("doc_id", "start_off", "bin_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(out.toSeq === Seq((0L, 0L, 0L), (1L, 100L, 0L),
      (2L, 200L, 0L), (3L, 300L, 1L)))
  }

  test("best-fit packing matches a sequential reference, bounded open bins") {
    val rnd = new scala.util.Random(7)
    val rows = (0L until 3000L).map(i =>
      (i, "g" + (i % 3), 10L + rnd.nextInt(200)))
    val got = Pipeline.packBestFit(rows.toDF("doc_id", "grp", "n_tokens"),
        "grp", "doc_id", "n_tokens", maxTokens = 256, maxOpenBins = 4)
      .collect().map(r => r.getAs[Long]("o") -> r.getAs[Long]("bin_id")).toMap
    // reference: literal best-fit with a 4-bin look-back
    val want = scala.collection.mutable.Map.empty[Long, Long]
    rows.groupBy(_._2).foreach { case (_, grp) =>
      var lo = 0L
      val rem = scala.collection.mutable.ArrayBuffer.empty[Long]
      grp.sortBy(_._1).foreach { case (id, _, n) =>
        val fit = rem.zipWithIndex.filter(_._1 >= n)
        if (fit.nonEmpty) {
          val i = fit.minBy(_._1)._2
          rem(i) -= n
          want(id) = lo + i
        } else {
          rem += math.max(256L - n, 0L)
          want(id) = lo + rem.length - 1
          if (rem.length > 4) { rem.remove(0); lo += 1 }
        }
      }
    }
    assert(got === want.toMap)
  }

  test("best-fit opens no more bins than next-fit and never splits a doc") {
    val rnd = new scala.util.Random(13)
    val rows = (0L until 2000L).map(i => (i, "g", 10L + rnd.nextInt(200)))
    val d = rows.toDF("doc_id", "grp", "n_tokens")
    val bf = Pipeline.packBestFit(d, "grp", "doc_id", "n_tokens", 256, 4)
      .groupBy("bin_id").agg(sum(col("n")).as("fill"))
      .collect().map(r => r.getAs[Long]("fill"))
    // next-fit = the comparable no-split greedy (only the newest bin
    // is a candidate). p03's concat-and-chop is NOT comparable: it
    // straddles docs, so its fill exceeds the cap by construction.
    var nfBins = 0
    var remNf = -1L
    rows.sortBy(_._1).foreach { case (_, _, n) =>
      if (remNf >= n) remNf -= n
      else { nfBins += 1; remNf = math.max(256L - n, 0L) }
    }
    assert(bf.length <= nfBins,
      s"best-fit ${bf.length} bins must be <= next-fit $nfBins")
    // no bin overflows (whole-doc contract; singleton oversize allowed)
    assert(bf.forall(_ <= 256L))
    // oversized doc gets a bin of its own and the bin closes at 0 rem
    val big = Seq((0L, "g", 500L), (1L, "g", 10L))
      .toDF("doc_id", "grp", "n_tokens")
    val gotBig = Pipeline.packBestFit(big, "grp", "doc_id", "n_tokens", 256, 4)
      .collect().map(r => r.getAs[Long]("o") -> r.getAs[Long]("bin_id")).toMap
    assert(gotBig === Map(0L -> 0L, 1L -> 1L))
  }

  test("classBalance undersamples every class toward the rarest class's count") {
    // 3 classes with 40/200/1000 members: balanced output keeps ~40 each
    val rows = (0 until 40).map(i => (i.toLong, "rare")) ++
      (1000 until 1200).map(i => (i.toLong, "mid")) ++
      (10000 until 11000).map(i => (i.toLong, "big"))
    val d = rows.toDF("doc_id", "cls")
    val kept = Pipeline.classBalance(d, "doc_id", "cls")
      .groupBy("cls").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // the rare class keeps everything (threshold = resolution)
    assert(kept("rare") === 40L)
    // LCG-hash membership is approximate at small n — allow ±40%
    assert(kept("mid") >= 24 && kept("mid") <= 56, s"mid=${kept("mid")}")
    assert(kept("big") >= 24 && kept("big") <= 56, s"big=${kept("big")}")
    // deterministic: a re-run keeps exactly the same rows
    val a = Pipeline.classBalance(d, "doc_id", "cls")
      .select("doc_id").as[Long].collect().sorted.toSeq
    val b = Pipeline.classBalance(d, "doc_id", "cls")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(a === b)
  }

  test("p16 quota allocation sums to the budget exactly at every sf") {
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val q = Catalog.byName("p16_quota_sample")
        .build(spark, s"/root/testdata/$sf")
        .agg(sum(col("quota"))).collect()(0).getLong(0)
      assert(q === 100L, s"quota sum at $sf")
    }
  }

  test("distributedNtile matches the window ntile exactly, ties and remainders included") {
    import org.apache.spark.sql.expressions.Window
    // heavy ties (v = i/7) + sizes where N < n, N % n == 0, N % n != 0
    for (size <- Seq(2, 12, 17, 200); n <- Seq(3, 4, 5)) {
      val d = (0L until size.toLong).map(i => (i, i / 7)).toDF("id", "v")
      val expected = d.withColumn("ntile",
          ntile(n).over(Window.orderBy(col("v"), col("id"))))
        .select("id", "ntile").collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1)
      val got = Pipeline.distributedNtile(d, n, "v", "id")
        .select("id", "ntile").collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1)
      assert(got.toSeq === expected.toSeq, s"size=$size n=$n")
    }
  }

  test("priority sample matches the u^(1/w) reference selection and is partition-invariant") {
    val rows = (0L until 500L).map { i =>
      (i, if (i % 3 == 0) "a" else "b", (i % 50) + 1) // weights 1..50
    }
    val df = rows.toDF("id", "stratum", "w")
    // driver-side Efraimidis–Spirakis reference: top-k by u^(1/w)
    def hash(id: Long) = ((id * 1103515245L + 12345L) % 2147483647L + 2147483647L) % 2147483647L
    val expected = rows.groupBy(_._2).flatMap { case (s, rs) =>
      rs.map { case (id, _, w) =>
        val u = (hash(id) + 1).toDouble / 2147483648.0
        (s, id, math.pow(u, 1.0 / w))
      }.sortBy { case (_, id, p) => (-p, id) }.take(7)
        .zipWithIndex.map { case ((_, id, _), r) => (s, r + 1, id) }
    }.toSet
    val got = Pipeline.prioritySample(df, "id", "w", "stratum", 7)
      .select("stratum", "rank", "id").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(1 + 1))).toSet
    assert(got === expected)
    // partition-invariant
    val got32 = Pipeline.prioritySample(df.repartition(32), "id", "w", "stratum", 7)
      .select("stratum", "rank", "id").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(got32 === expected)
  }

  test("priority sample is weight-biased: heavy rows are overrepresented") {
    // one stratum, weights 1 vs 100 alternating: the k survivors
    // should be overwhelmingly heavy rows
    val df = (0L until 1000L).map(i => (i, "s", if (i % 2 == 0) 100L else 1L))
      .toDF("id", "stratum", "w")
    val picked = Pipeline.prioritySample(df, "id", "w", "stratum", 50)
      .select("w").as[Long].collect()
    val heavy = picked.count(_ == 100L)
    assert(heavy >= 45, s"expected mostly heavy rows, got $heavy/50")
  }
}
