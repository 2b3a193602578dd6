package graft

import graft.operators.Decontaminate
import org.apache.spark.sql.functions._

/** Detection contract for the decontamination report: a verbatim
  * benchmark passage planted in a training doc IS flagged with the
  * exact n-gram evidence count, clean docs are NOT, and the Bloom
  * prefilter changes nothing but the shuffle volume (value-identity
  * vs the unfiltered exact join — a Bloom filter has no false
  * negatives). The full-pipeline value exactness is covered by the
  * t16 DuckDB oracle.
  */
class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private val passage =
    "the quick brown fox jumps over the lazy dog tonight" // 10 tokens

  private lazy val train = Seq(
    // doc 1: the eval passage verbatim, embedded mid-document
    (1L, s"training text begins here $passage and continues onward"),
    // doc 2: clean — shares words but no 8-gram run
    (2L, "the quick brown fox sat down while the dog slept at home"),
    // doc 3: clean and unrelated
    (3L, "completely different subject matter about spark partitions")
  ).toDF("doc_id", "text")

  private lazy val eval = Seq(
    (100L, s"benchmark question: $passage answer below"),
    (101L, "another benchmark item with its own unique phrasing entirely")
  ).toDF("doc_id", "text")

  test("planted verbatim passage is flagged with exact evidence counts") {
    val out = Decontaminate.report(train, eval, "doc_id", "text", n = 8)
      .collect()
    assert(out.length === 1, s"expected exactly the planted pair: ${out.toSeq}")
    val r = out.head
    assert(r.getAs[Long]("train_id") === 1L)
    assert(r.getAs[Long]("eval_id") === 100L)
    // a 10-token shared run contains exactly 3 distinct 8-grams
    assert(r.getAs[Long]("n_shared") === 3L)
    assert(r.getAs[Double]("contamination") > 0
      && r.getAs[Double]("contamination") <= 1.0)
  }

  test("bloom prefilter is value-identical to the unfiltered exact join") {
    // tiny filter = high fpp: correctness must not depend on Bloom
    // selectivity, only the shuffle volume does
    val tight = Decontaminate.report(train, eval, "doc_id", "text",
      n = 8, mBits = 64).collect().map(_.toSeq).toSet
    val roomy = Decontaminate.report(train, eval, "doc_id", "text",
      n = 8, mBits = 1 << 20).collect().map(_.toSeq).toSet
    assert(tight === roomy)
    assert(tight.nonEmpty)
  }

  test("n-gram length tunes sensitivity: short n flags phrase reuse too") {
    // at n=4, doc 2's "the quick brown fox" prefix also matches
    val pairs = Decontaminate.report(train, eval, "doc_id", "text", n = 4)
      .select("train_id", "eval_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 100L)))
    assert(pairs.contains((2L, 100L)), s"n=4 should catch the shared prefix: $pairs")
  }

  test("catalog t16 finds the corpus's real cross-split leaks") {
    val out = Catalog.byName("t16_decontamination")
      .build(spark, "/root/testdata/sf0.001").collect()
    // the synthetic corpus's near-dup clusters straddle the 80/20
    // split, so leaks MUST exist — an empty report means a broken join
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("n_shared") > 0L)
      assert(r.getAs[Long]("n_shared") <= r.getAs[Long]("n_train_ngrams"))
    }
  }
}
