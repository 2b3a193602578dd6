package graft

import graft.functions.{Hash62Expr, HashFunctions, ShingleHashes, TextFunctions}
import org.apache.spark.sql.functions._

class ShingleHashesSpec extends SparkSpec {
  import spark.implicits._

  private val tricky = Seq(
    "one two three four five",
    "a  b c d",            // empty token from double space
    "one two",             // shorter than n
    "",                    // empty text
    "trailing space ok ",  // trailing empty token
    "x y z x y z x y z")   // repeated shingles -> dedupe
    .toDF("text")

  test("fused shingle hashes == composed HOF + Hash62 chain") {
    val composed = tricky.select(
      array_sort(array_distinct(transform(
        TextFunctions.wordShingles(TextFunctions.tokens(col("text")), 3),
        s => Hash62Expr(s)))).as("h"))
    val fused = tricky.select(
      array_sort(ShingleHashes(col("text"), 3)).as("h"))
    val c = composed.collect().map(_.getSeq[Long](0))
    val f = fused.collect().map(_.getSeq[Long](0))
    assert(f.toSeq === c.toSeq)
  }

  test("per-occurrence mode == composed chain without the distinct") {
    // n=1 backs t06's unigram counts (each token must hash exactly as
    // Hash62Expr does), n=2 its bigram counts, n=3 the trigram family,
    // n=8 the d24 substring-scan windows
    for (n <- Seq(1, 2, 3, 8)) {
      val composed = tricky.select(
        transform(
          TextFunctions.wordShingles(TextFunctions.tokens(col("text")), n),
          s => Hash62Expr(s)).as("h"))
      val fused = tricky.select(
        ShingleHashes(col("text"), n, dedupe = false).as("h"))
      val c = composed.collect().map(_.getSeq[Long](0))
      val f = fused.collect().map(_.getSeq[Long](0))
      // order AND multiplicity must match: t06 counts occurrences
      assert(f.toSeq === c.toSeq, s"per-occurrence mismatch at n=$n")
    }
  }

  test("SQL graft_shingle_hashes matches the Column API, both arities") {
    tricky.createOrReplaceTempView("sh_sql")
    try {
      val api2 = tricky.select(ShingleHashes(col("text"), 3).as("h"))
        .collect().map(_.getSeq[Long](0)).toSeq
      val sql2 = spark.sql("SELECT graft_shingle_hashes(text, 3) AS h FROM sh_sql")
        .collect().map(_.getSeq[Long](0)).toSeq
      assert(sql2 === api2)
      val api3 = tricky.select(ShingleHashes(col("text"), 2, dedupe = false).as("h"))
        .collect().map(_.getSeq[Long](0)).toSeq
      val sql3 = spark.sql(
        "SELECT graft_shingle_hashes(text, 2, false) AS h FROM sh_sql")
        .collect().map(_.getSeq[Long](0)).toSeq
      assert(sql3 === api3)
      // kernel parameters must be literals
      val e = intercept[Exception] {
        spark.sql(
          "SELECT graft_shingle_hashes(text, length(text)) FROM sh_sql").head()
      }
      assert(e.getMessage.contains("must be a literal"), e.getMessage)
    } finally spark.catalog.dropTempView("sh_sql")
  }

  test("native Hash62 matches the HOF hash62 on ascii strings") {
    val df = Seq("hello world", "", "a", "the quick brown fox").toDF("s")
    val out = df.select(Hash62Expr(col("s")).as("native"),
      HashFunctions.hash62(col("s")).as("hof")).collect()
    out.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }
}
