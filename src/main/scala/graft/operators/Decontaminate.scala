package graft.operators

import graft.functions.ShingleHashes
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: find every training document sharing
  * any n-gram with an evaluation corpus, with per-(train, eval) pair
  * evidence counts — the "is the benchmark leaked into the training
  * set" report every LLM data pipeline runs before training. n = 8
  * tokens is the standard contamination length: only near-verbatim
  * passages survive it, so hits are real leaks, not phrase
  * coincidences.
  *
  * Scale shape: the eval side is a few benchmarks — tiny next to a
  * 100 TB train corpus — so the join is built eval-side: a bounded
  * Bloom filter over the eval n-gram hashes ([[BloomSemi]], fixed
  * 128 KiB at the default whatever the corpus size) prunes the train
  * side AT THE SCAN, before any exchange. Only ~fpp of clean train
  * n-grams ever shuffle; the exact hash join then keeps the result
  * precise (a Bloom filter has no false negatives, and false
  * positives die in the join). 8-byte fused-kernel hash keys
  * throughout (the d01/t15 lesson — no n-gram string is ever
  * materialized); per-pair counts are map-side combinable.
  */
object Decontaminate {

  /** @param train training documents (idCol, textCol)
    * @param eval  evaluation/benchmark documents (idCol, textCol)
    * @param n     n-gram length in tokens (8 = standard)
    * @param mBits Bloom filter size in bits
    * @return (train_id, eval_id, n_shared, n_train_ngrams,
    *         contamination) — one row per contaminated pair
    */
  def report(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, n: Int = 8, mBits: Int = 1 << 20): DataFrame = {
    def grams(df: DataFrame, as: String) =
      df.select(col(idCol).as(as),
        explode(ShingleHashes(col(textCol), n)).as("h"))
    val ev = grams(eval, "eval_id")
    val bits = BloomSemi.buildBits(ev.select("h").distinct(), "h",
      mBits = mBits, nHashes = 3)
    val pairs = grams(train, "train_id")
      .filter(BloomSemi.mightContain(col("h"), bits, mBits, 3))
      .join(ev, "h")
      .groupBy("train_id", "eval_id")
      .agg(count(lit(1)).as("n_shared"))
    // per-doc gram totals come from the kernel's array size in the
    // SAME narrow projection shape as the scan — no second explode,
    // no groupBy; and the contaminated-pair set is the small side, so
    // IT broadcasts and the train projection never shuffles
    val sizes = train.select(col(idCol).as("train_id"),
      size(ShingleHashes(col(textCol), n)).cast("long").as("n_train_ngrams"))
    sizes.join(broadcast(pairs), "train_id")
      .withColumn("contamination",
        col("n_shared").cast("double") / col("n_train_ngrams").cast("double"))
      .select("train_id", "eval_id", "n_shared", "n_train_ngrams",
        "contamination")
  }
}
