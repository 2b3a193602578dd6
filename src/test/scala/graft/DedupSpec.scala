package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog again and again today"
  private def docs = Seq(
    (0L, base),
    (1L, base),                                      // exact dup of 0
    (2L, base + " extra tail words"),                // near dup of 0
    (3L, "completely different content about spark engines and shuffles here"),
    (4L, "  THE  quick brown fox jumps over the lazy dog again and again today ")
  ).toDF("doc_id", "text")

  test("exact dedup groups normalized duplicates") {
    val out = Dedup.exact(docs, "doc_id", "text")
      .orderBy("rep_id").collect()
    // 0,1,4 normalize identically -> rep 0 with 3 copies
    assert(out.length === 3)
    assert(out.head.getAs[Long]("rep_id") === 0L)
    assert(out.head.getAs[Long]("n_copies") === 3L)
  }

  test("ngram jaccard finds near dups, not unrelated docs") {
    val pairs = Dedup.ngramJaccard(docs, "doc_id", "text", n = 3, minJaccard = 0.3)
      .collect().map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"))).toSet
    assert(pairs.contains((0L, 1L)))   // identical
    assert(pairs.contains((0L, 2L)))   // near dup
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("identical docs get identical minhash signatures and become candidates") {
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", shingleN = 3, k = 16)
    val m = sigs.collect().map(r => r.getAs[Long]("doc_id") ->
      r.getSeq[Long](1)).toMap
    assert(m(0L) === m(1L))
    assert(m(0L) !== m(3L))
    val cands = Dedup.minhashCandidates(sigs, bands = 4, rows = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands.contains((0L, 1L)))
  }

  test("short docs (<3 tokens) get null signatures and never become candidates") {
    val short = Seq((0L, "hi"), (1L, "yo"), (2L, "one two"),
      (3L, "a proper sentence with enough words to shingle"),
      (4L, "a proper sentence with enough words to shingle"))
      .toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(short, "doc_id", "text", shingleN = 3, k = 16)
    val m = sigs.collect().map(r => r.getAs[Long]("doc_id") -> r.getSeq[Any](1)).toMap
    assert(m.size === 5)                        // every doc keeps a row
    assert(m(0L).forall(_ == null))             // empty shingle set -> null sig
    val cands = Dedup.minhashCandidates(sigs, bands = 4, rows = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // two null-sig docs must NOT bucket together; real dups still match
    assert(cands === Set((3L, 4L)))
  }

  test("simhash: identical fingerprints at hamming 0, near dups close") {
    val fps = Dedup.simhashFingerprints(docs, "doc_id", "text")
    val m = fps.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(0L) === m(1L))
    assert(java.lang.Long.bitCount(m(0L) ^ m(2L)) < 12)
    assert(java.lang.Long.bitCount(m(0L) ^ m(3L)) > 12)
  }

  test("embedding near-dup pairs by cosine threshold") {
    val e = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.99f, 0.1f, 0.0f)),  // nearly parallel to 0
      (2L, Array(0.0f, 1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    // nearly-parallel vectors land in the same sign-LSH bucket in every
    // band (the larger component dominates every ±1 hyperplane dot), so
    // the candidate path must surface (0,1); (0,2)/(1,2) are orthogonal
    // and die at the cosine verify even when buckets collide
    val pairs = Dedup.embeddingNearDups(e, "vec_id", "embedding",
      minCosine = 0.9, dim = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((0L, 1L)))
  }

  test("maxDf cap bounds pair generation on a boilerplate-heavy corpus") {
    // 40 docs sharing one boilerplate trigram; each otherwise unique.
    // Uncapped, that single hot shingle alone emits C(40,2) = 780 pairs.
    val boiler = "all rights reserved"
    val hot = (0L until 40L).map(i =>
      (i, s"$boiler unique$i content$i marker$i")).toDF("doc_id", "text")
    val uncapped = Dedup.ngramJaccard(hot, "doc_id", "text",
      n = 3, minJaccard = 0.0).count()
    assert(uncapped === 780L)
    val capped = Dedup.ngramJaccard(hot, "doc_id", "text",
      n = 3, minJaccard = 0.0, maxDf = Some(10))
    assert(capped.count() === 0L)
    // the cap must also rescale the Jaccard denominator: with the hot
    // shingle dropped, a surviving pair's n1/n2 count only the capped set
    val twin = hot.unionByName(Seq(
      (100L, "all rights reserved shared tail here"),
      (101L, "all rights reserved shared tail here")).toDF("doc_id", "text"))
    val pair = Dedup.ngramJaccard(twin, "doc_id", "text",
      n = 3, minJaccard = 0.5, maxDf = Some(10))
      .filter(col("d1") === 100L && col("d2") === 101L).collect()
    assert(pair.length === 1)
    assert(pair.head.getAs[Double]("jaccard") === 1.0)
  }

  test("d14 canonicalization collapses case/port/utm/slash/fragment variants") {
    val out = Catalog.byName("d14_url_dedup")
      .build(spark, "/root/testdata/sf0.001").collect()
    val urls = out.map(_.getAs[String]("canon_url"))
    // every variant class is normalized away
    urls.foreach { u =>
      assert(u == u.toLowerCase || !u.takeWhile(_ != '?').exists(_.isUpper),
        s"host not lowercased: $u")
      assert(!u.contains(":443"), s"default port kept: $u")
      assert(!u.contains("utm_"), s"tracking param kept: $u")
      assert(!u.contains("#"), s"fragment kept: $u")
      assert(!u.takeWhile(_ != '?').endsWith("/"), s"trailing slash kept: $u")
    }
    // the fan-in is real: at least one canonical url covers >1 raw url
    assert(out.exists(_.getAs[Long]("n_urls") > 1L))
  }

  test("d13 block dedup counts shared 16-word blocks and drops partial tails") {
    val block = (1 to 16).map(i => s"w$i").mkString(" ")
    val other = (1 to 16).map(i => s"x$i").mkString(" ")
    val docs = Seq(
      (1L, s"$block $other"),          // 2 blocks, 1 shared
      (2L, s"$block extra tail"),      // 1 block (tail dropped), shared
      (3L, "too short")                // 0 blocks
    ).toDF("doc_id", "text")
    // route through the same plan shape as the catalog entry
    val toks = graft.functions.TextFunctions.tokens(col("text"))
    val nb = (size(toks) - size(toks) % 16) / 16
    val idxs = when(nb >= 1, sequence(lit(0), nb.cast("int") - 1))
      .otherwise(array().cast("array<int>"))
    val blocks = docs.select(col("doc_id"), toks.as("w"), explode(idxs).as("i"))
      .select(col("doc_id"),
        concat_ws(" ", slice(col("w"), col("i") * 16 + 1, lit(16))).as("btext"))
    val got = blocks.groupBy("doc_id").count().as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 2L, 2L -> 1L)) // doc 3 has no blocks
    val dupText = blocks.groupBy("btext").count()
      .filter(col("count") > 1).collect()
    assert(dupText.length === 1 && dupText.head.getString(0) === block)
  }

  test("prefix-filter join is lossless vs the exhaustive bucket join") {
    val real = Tables(spark, "/root/testdata/sf0.001", "documents")
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("d1"), r.getAs[Long]("d2"),
        r.getAs[Long]("common"), r.getAs[Long]("n1"), r.getAs[Long]("n2"))
    val viaPrefix = Dedup.prefixFilterJaccard(
        real, "doc_id", "text", n = 3, num = 3, den = 5, maxDf = Some(64))
      .collect().map(key).toSet
    val viaBuckets = Dedup.ngramJaccard(
        real, "doc_id", "text", n = 3, minJaccard = 0.6, maxDf = Some(64))
      .collect().map(key).toSet
    assert(viaPrefix.nonEmpty, "fixture should contain near-dup pairs")
    assert(viaPrefix === viaBuckets)
  }

  test("prefix-filter: qualifying pair found through prefixes, boundary exact") {
    // 10 shingles each, overlap 9 -> J = 9/11 >= 3/5; and an exact
    // boundary pair: 6 vs 6 with overlap 4.5.. use 3/5 = common 6 of
    // sizes 8,8 -> J = 6/10 = 3/5 exactly (integer gate must KEEP it).
    def doc(words: Seq[String]) = words.mkString(" ")
    val w = (1 to 20).map(i => s"tok$i")
    val a = doc(w.take(10))                   // shingles over 10 words: 8
    val b = doc(w.take(9) ++ Seq("zz"))       // shares 7-of-8 prefix path
    val d = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val out = Dedup.prefixFilterJaccard(d, "doc_id", "text",
      n = 3, num = 3, den = 5).collect()
    // 8 trigrams each; first 7 shared -> common=7, union=9, J=7/9>3/5
    assert(out.length === 1)
    val r = out.head
    assert((r.getAs[Long]("common"), r.getAs[Long]("n1"),
      r.getAs[Long]("n2")) === ((7L, 8L, 8L)))

    // exact boundary: common*den == num*(union) stays included
    val c = doc(w.take(8))                    // 6 trigrams
    val e = doc(w.take(6) ++ Seq("q1", "q2")) // 4 shared + 2 own? -> verify
    val d2 = Seq((1L, c), (2L, e)).toDF("doc_id", "text")
    val out2 = Dedup.prefixFilterJaccard(d2, "doc_id", "text",
      n = 3, num = 1, den = 2).collect()      // J threshold 1/2
    // c: 6 trigrams, e: 6 trigrams, shared 4 -> J = 4/8 = 1/2 exactly
    out2.foreach { rr =>
      assert((rr.getAs[Long]("common"), rr.getAs[Long]("n1"),
        rr.getAs[Long]("n2")) === ((4L, 6L, 6L)))
    }
    assert(out2.length === 1)
  }

  test("prefix-filter candidates stay under the exhaustive bucket volume") {
    val real = Tables(spark, "/root/testdata/sf0.001", "documents")
    val sh = Dedup.shingleHashSet(real, "doc_id", "text", 3)
    val exhaustive = sh.groupBy("shingle").count()
      .filter(col("count") > 1)
      .agg(sum(col("count") * (col("count") - 1) / 2).cast("long"))
      .head().getLong(0)
    // candidate volume through prefixes, same accounting
    val wSh = org.apache.spark.sql.expressions.Window.partitionBy("shingle")
    val wDoc = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
    val wRank = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
      .orderBy(col("df"), col("shingle"))
    val prefixes = sh.withColumn("df", count(lit(1)).over(wSh))
      .withColumn("n", count(lit(1)).over(wDoc))
      .withColumn("rk", row_number().over(wRank))
      .filter(col("rk") <= col("n") - expr("(n * 3 + 4) DIV 5") + 1)
    val viaPrefix = prefixes.groupBy("shingle").count()
      .filter(col("count") > 1)
      .agg(sum(col("count") * (col("count") - 1) / 2).cast("long"))
      .head().getLong(0)
    assert(viaPrefix < exhaustive,
      s"prefix candidates $viaPrefix should undercut exhaustive $exhaustive")
  }

  test("d24 hash-keyed windows == string-keyed reference at sf0.001") {
    // the oracle mirrors the 62-bit window hashing, so keep an
    // independent identity check: duplicate 8-gram detection on the
    // window STRINGS must flag exactly the same per-doc totals
    import graft.functions.TextFunctions
    import org.apache.spark.sql.expressions.Window
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val hashKeyed = graft.queries.DedupQueries.substringDupScan(docs, n = 8)
      .select("doc_id", "n_spans", "dup_tokens")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val toks = TextFunctions.tokens(col("text"))
    val wins = docs.select(col("doc_id"),
      posexplode(TextFunctions.wordShingles(toks, 8)).as(Seq("pos", "g")))
    val dup = wins.groupBy("g").agg(count(lit(1)).as("c")).filter(col("c") >= 2)
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val spans = wins.join(dup, "g")
      .withColumn("prev", lag("pos", 1).over(w))
      .withColumn("ni", when(col("prev").isNull || col("pos") > col("prev") + 8,
        1L).otherwise(0L))
      .withColumn("island", sum("ni").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("doc_id", "island")
      .agg(min("pos").as("s"), max("pos").as("m"))
      .select(col("doc_id"), (col("m") + 8 - col("s")).as("st"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"), sum("st").as("dup_tokens"))
    val stringKeyed = docs.select("doc_id")
      .join(spans, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("n_spans"), lit(0L)),
        coalesce(col("dup_tokens"), lit(0L)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(hashKeyed === stringKeyed)
  }

  test("d24 substring scan finds a planted shared passage with exact span geometry") {
    import spark.implicits._
    // docs 0 and 1 share a 12-token passage embedded at different
    // offsets in otherwise-unique text; doc 2 is fully unique.
    val passage = (0 until 12).map(i => s"p$i").mkString(" ")
    def unique(tag: String, n: Int) = (0 until n).map(i => s"$tag$i").mkString(" ")
    val docs = Seq(
      (0L, s"${unique("a", 10)} $passage ${unique("b", 10)}"),
      (1L, s"${unique("c", 4)} $passage ${unique("d", 16)}"),
      (2L, unique("e", 30))
    ).toDF("doc_id", "text")
    val out = graft.queries.DedupQueries.substringDupScan(docs, n = 8)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_spans"), r.getAs[Long]("dup_tokens"))).toMap
    // an 8-gram window duplicates iff fully inside the 12-token
    // passage -> 5 window positions -> ONE merged span of 12 tokens
    assert(out(0L) === ((1L, 12L)), s"doc 0: ${out(0L)}")
    assert(out(1L) === ((1L, 12L)), s"doc 1: ${out(1L)}")
    assert(out(2L) === ((0L, 0L)), s"doc 2: ${out(2L)}")
    // a doc repeating ITS OWN passage twice is flagged too (within-doc)
    val selfRep = Seq((0L, s"$passage ${unique("x", 5)} $passage"))
      .toDF("doc_id", "text")
    val self = graft.queries.DedupQueries.substringDupScan(selfRep, n = 8)
      .collect().head
    assert(self.getAs[Long]("n_spans") == 2L &&
      self.getAs[Long]("dup_tokens") == 24L,
      s"self-repeat: ${self}")
  }
}
