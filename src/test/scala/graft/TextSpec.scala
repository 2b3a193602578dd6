package graft

import graft.functions.{HashFunctions, TextFunctions}
import org.apache.spark.sql.functions._

class TextSpec extends SparkSpec {
  import spark.implicits._

  test("langid picks the language with most marker hits") {
    val docs = Seq(
      (0L, "the cat is in the house and it is warm"),
      (1L, "der hund ist nicht das problem und die katze"),
      (2L, "le chat est dans la maison et les oiseaux"),
      (3L, "el perro y los gatos es una familia por ahora"),
      (4L, "xyzzy plugh quux")
    ).toDF("doc_id", "text")
    val toks = TextFunctions.tokens(col("text"))
    val scored = docs.select(
      col("doc_id") +: TextFunctions.langMarkers.map { case (l, m) =>
        TextFunctions.markerScore(toks, m).as(s"s_$l")
      }: _*)
    val out = scored.withColumn("predicted", TextFunctions.langidPredict(
        TextFunctions.langMarkers.map { case (l, _) => l -> col(s"s_$l") }))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("predicted")).toMap
    assert(out === Map(0L -> "en", 1L -> "de", 2L -> "fr", 3L -> "es", 4L -> "und"))
  }

  test("polyHash matches a reference implementation") {
    def ref(s: String): Long =
      s.foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % 2147483647L)
    val out = Seq("hello world", "a", "").toDF("s")
      .select(HashFunctions.polyHash(col("s")).as("h"))
      .collect().map(_.getLong(0))
    assert(out(0) === ref("hello world"))
    assert(out(1) === ref("a"))
    assert(out(2) === 0L)
  }

  test("wordShingles handles docs shorter than n") {
    val out = Seq("one two", "one two three four").toDF("text")
      .select(TextFunctions.wordShingles(TextFunctions.tokens(col("text")), 3).as("sh"))
      .collect().map(_.getSeq[String](0))
    assert(out(0) === Seq.empty)
    assert(out(1) === Seq("one two three", "two three four"))
  }

  test("token counts: regex tokenizer splits words, digits, symbols") {
    val out = Seq("ab cd7, x!").toDF("text")
      .select(TextFunctions.regexTokenCount(col("text")).as("n"))
      .collect().head.getInt(0)
    // ab, cd, 7, ',', x, '!'
    assert(out === 6)
  }

  test("t06 hash-keyed pipeline == string-keyed reference at sf0.001") {
    // The DuckDB oracle mirrors the 62-bit hashing (d01 precedent), so
    // this spec keeps an INDEPENDENT identity check: group on the
    // bigram STRINGS themselves and demand identical results — a hash
    // collision or a hash-kernel bug shared with the oracle would
    // diverge here. Low threshold so the tiny corpus yields survivors.
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val hashKeyed = graft.queries.TextQueries
      .collocations(docs, minCount = 3L).collect()
    assert(hashKeyed.nonEmpty, "threshold too high for sf0.001 — vacuous test")
    val toks = TextFunctions.tokens(col("text"))
    val bi = docs.select(
      explode(TextFunctions.wordShingles(toks, 2)).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("c_xy"))
      .filter(col("c_xy") >= 3)
    val uni = docs.select(explode(toks).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c_x"))
    val stringKeyed = bi
      .join(uni, substring_index(col("bigram"), " ", 1) === col("w"))
      .select(col("bigram"), col("c_xy"), col("c_x"),
        (col("c_xy").cast("double") / col("c_x")).as("cond_prob"))
      .orderBy(col("cond_prob").desc, col("bigram"))
      .limit(25).collect()
    assert(hashKeyed.map(_.toSeq).toSeq === stringKeyed.map(_.toSeq).toSeq)
  }

  test("t17 bigram perplexity: frequent phrasing scores low, novel phrasing high") {
    // Ten docs repeat the same phrase (their bigrams dominate the
    // corpus LM), one doc uses each word exactly once in an unseen
    // order, one doc is a single token (no bigrams -> NULL scores).
    val common = (0L until 10L).map(i => (i, "the cat sat on the mat"))
    val docs = (common :+ (10L, "mat the on sat cat banana") :+ (11L, "solo"))
      .toDF("doc_id", "text")
    val out = graft.queries.TextQueries.bigramPerplexity(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), Option(r.getAs[java.lang.Double]("ppl"))))
      .toMap
    val commonPpl = out(0L)._2.get
    val novelPpl = out(10L)._2.get
    assert(out(0L)._1 == 5L)
    // all ten repeats score identically, and far below the novel doc
    (1L until 10L).foreach(i => assert(out(i)._2.get == commonPpl))
    assert(novelPpl > 2 * commonPpl,
      s"novel doc should be high-perplexity: $novelPpl vs $commonPpl")
    assert(commonPpl >= 1.0, "perplexity is bounded below by 1")
    // the bigram-less doc reports zero bigrams and NULL scores
    assert(out(11L)._1 == 0L && out(11L)._2.isEmpty)
  }

  test("t17 hash-keyed pipeline == string-keyed reference at sf0.001") {
    // the DuckDB oracle mirrors the 62-bit hashing (t06 precedent), so
    // keep an INDEPENDENT identity check alive on a real corpus: build
    // the LM on the bigram/unigram STRINGS themselves and demand the
    // same scores (to the entry's own rounding) — a hash collision or
    // a hash-kernel bug shared with the oracle would diverge here
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val hashKeyed = graft.queries.TextQueries.bigramPerplexity(docs)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), Option(r.getAs[java.lang.Double]("ppl"))))
      .toMap
    val toks = TextFunctions.tokens(col("text"))
    val cx = docs.select(explode(toks).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c_x"))
    val vocab = cx.count()
    val cxy = docs
      .select(explode(TextFunctions.wordShingles(toks, 2)).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("c_xy"))
    val cells = docs
      .select(col("doc_id"), explode(TextFunctions.wordShingles(toks, 2)).as("bg"))
      .groupBy("doc_id", "bg").agg(count(lit(1)).as("n"))
      .join(cxy, "bg")
      .join(cx, substring_index(col("bg"), " ", 1) === col("w"))
    val stringKeyed = cells.groupBy("doc_id")
      .agg(sum("n").as("nb"),
        sum(col("n").cast("double") *
          log2((col("c_xy") + lit(1L)).cast("double") /
            (col("c_x") + lit(vocab)).cast("double"))).as("sum_logp"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), math.pow(2.0, -r.getDouble(2) / r.getLong(1))))
      .toMap
    assert(hashKeyed.count(_._2._2.isDefined) == stringKeyed.size)
    stringKeyed.foreach { case (id, (nb, ppl)) =>
      val (hn, hp) = hashKeyed(id)
      assert(hn == nb, s"doc $id bigram count: $hn vs $nb")
      assert(math.abs(hp.get - ppl) <= 0.0001 + 1e-9,
        s"doc $id ppl: ${hp.get} vs string-keyed $ppl")
    }
  }

  test("t17 add-one smoothing matches a driver-side reference LM on a tiny corpus") {
    val corpus = Seq(
      (0L, "a b a b c"),
      (1L, "b c a a b"),
      (2L, "c c b a b a"))
    val docs = corpus.toDF("doc_id", "text")
    // reference: exact string-keyed bigram LM with add-one smoothing
    val allToks = corpus.map(_._2.split(" ", -1).toSeq)
    val cx = allToks.flatten.groupBy(identity).map { case (k, v) => k -> v.size }
    val cxy = allToks.flatMap(t => t.zip(t.drop(1)))
      .groupBy(identity).map { case (k, v) => k -> v.size }
    val v = cx.size
    def expect(text: String): (Long, Double) = {
      val t = text.split(" ", -1).toSeq
      val terms = t.zip(t.drop(1)).map { case (w1, w2) =>
        math.log((cxy((w1, w2)) + 1).toDouble / (cx(w1) + v)) / math.log(2.0)
      }
      val avg = terms.sum / terms.size
      (terms.size.toLong,
        BigDecimal(math.pow(2.0, -avg)).setScale(4,
          BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val got = graft.queries.TextQueries.bigramPerplexity(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("ppl"))).toMap
    corpus.foreach { case (id, text) =>
      val (nb, ppl) = expect(text)
      assert(got(id)._1 == nb, s"doc $id bigram count")
      // the engine folds hash-keyed cells in (hb, hw) order vs the
      // reference's arbitrary order: equality holds to the rounding
      // the entry itself applies (4 decimals), modulo one last-ulp
      // reorder step
      assert(math.abs(got(id)._2 - ppl) <= 0.0001 + 1e-9,
        s"doc $id ppl ${got(id)._2} vs reference $ppl")
    }
  }

  test("keyness: unique vocabulary tops its language; uniform words filtered") {
    import spark.implicits._
    // 'aardvark' appears only in lang X; 'shared' is spread evenly
    // (same per-lang count, so a·n2 = b·n1 exactly — NOT overrepresented);
    // 'common' leans toward Y.
    val docs = Seq(
      ("x", "aardvark shared common filler filler"),
      ("x", "aardvark shared filler filler filler"),
      ("y", "shared common common common filler"),
      ("y", "shared common filler filler filler"))
      .toDF("lang", "text")
    val out = graft.queries.TextQueries.keyness(docs, topK = 3).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Int]("rank")) ->
        (r.getAs[String]("word"), r.getAs[Long]("lang_count"),
          r.getAs[Long]("rest_count"), r.getAs[Double]("g2")))
      .toMap
    // unique word ranks first for its language, with b = 0
    assert(out(("x", 1))._1 == "aardvark")
    assert(out(("x", 1))._3 == 0L)
    assert(out(("x", 1))._4 > 0.0)
    // 'common' is y's top distinctive term (4 in y vs 1 in x)
    assert(out(("y", 1))._1 == "common")
    // the evenly-spread word passes nowhere: both langs have 10
    // tokens, 'shared' is 2 vs 2 → a·n2 == b·n1 on both sides
    assert(!out.values.exists(_._1 == "shared"))
    // G² of a unique word equals the closed form 2·a·ln(N/n1)
    val g2 = out(("x", 1))._4
    val expect = BigDecimal(2.0 * 2.0 * math.log(20.0 / 10.0))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(g2 - expect) <= 1e-9, s"g2 $g2 vs $expect")
  }
}
