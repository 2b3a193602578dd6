package graft

import graft.operators.{Dedup, DfCache}
import graft.sources.Sinks

/** Guards for the shared get-or-build cache (graft.operators.DfCache)
  * and the Sinks NULL-partition contract.
  *
  * The collision test is the regression the r6 ADVICE predicted: a
  * plan-STRING key is not injective (`LocalRelation` prints its schema,
  * not its data), so two same-schema corpora in one session must be
  * told apart by the stored-plan guard, never served each other's
  * cached tables. */
class DfCacheSpec extends SparkSpec {
  import spark.implicits._

  test("persistedForSource: same-schema different-data sources do not collide") {
    val a = Seq((1L, "x")).toDF("id", "v")
    val b = Seq((2L, "y")).toDF("id", "v")
    val outA = DfCache.persistedForSource(a, "collide-test")(a)
    val outB = DfCache.persistedForSource(b, "collide-test")(b)
    assert(outA.collect().map(_.getLong(0)).toSeq === Seq(1L))
    assert(outB.collect().map(_.getLong(0)).toSeq === Seq(2L))
  }

  test("persistedForSource: semantically equal plans share one entry") {
    def src = Seq((7L, "z")).toDF("id", "v")
    var builds = 0
    val first = DfCache.persistedForSource(src, "reuse-test") {
      builds += 1; src.select("id")
    }
    val second = DfCache.persistedForSource(src, "reuse-test") {
      builds += 1; src.select("id")
    }
    assert(builds === 1, "second call must reuse the cached build")
    assert(second eq first, "hit must return the same DataFrame instance")
  }

  test("uncapped ngramJaccard routes its shingle pin through the cache") {
    // repeated uncapped calls over the same corpus must not each pin a
    // fresh orphaned copy: the DfCache entry count for the session is
    // stable across a second invocation (observable via reuse — the
    // same persisted plan instance backs both runs, so results agree
    // and the cache serves rather than rebuilds)
    val corpus = Seq(
      (1L, "one two three four five six"),
      (2L, "one two three four five seven")).toDF("doc_id", "text")
    val r1 = Dedup.ngramJaccard(corpus, "doc_id", "text", 3, 0.0).collect()
    val r2 = Dedup.ngramJaccard(corpus, "doc_id", "text", 3, 0.0).collect()
    assert(r1.toSeq === r2.toSeq)
    assert(r1.nonEmpty)
  }

  test("upsertJdbc rejects NULL partition values loudly") {
    val url = "jdbc:derby:memory:graft_nullpart;create=true"
    val seed = Seq((1L, "d1", "a", 1)).toDF("id", "day", "v", "ver")
    Sinks.upsertJdbc(spark, seed, url, "t", Seq("id"), "ver",
      numPartitions = 1, partCol = Some("day"))
    val withNull = Seq((2L, null.asInstanceOf[String], "b", 1))
      .toDF("id", "day", "v", "ver")
    val e = intercept[IllegalArgumentException] {
      Sinks.upsertJdbc(spark, withNull, url, "t", Seq("id"), "ver",
        numPartitions = 1, partCol = Some("day"))
    }
    assert(e.getMessage.contains("NULL"))
    // the live table is untouched by the refused merge
    assert(Sinks.readJdbc(spark, url, "t").count() === 1L)
  }
}
