package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter-accelerated semi-join — the explicit form of the
  * runtime-filter idiom: build a fixed-size bit set over the dim-side
  * keys, pre-filter the fact side with it BEFORE the join shuffle,
  * then verify exactly. A Bloom filter has no false negatives, so the
  * result is identical to the plain semi-join; the oracle for any
  * query using it stays a plain EXISTS.
  *
  * Scale shape: the bit build is a distributed aggregation whose
  * OUTPUT is bounded by `mBits` (128 KiB of words at the default),
  * never by the dim row count — only that fixed-size word array is
  * collected and shipped inside the filter expression. The fact side
  * is filtered scan-side (codegen'd `element_at` + mask tests), so
  * with a selective dim only ~fpp of non-matching fact rows ever
  * reach the exchange. At 100 TB that is the difference between
  * shuffling the table and shuffling the answer.
  */
object BloomSemi {

  /** 64 single-bit masks — element_at lookup beats a variable-shift
    * expression (no codegen-unfriendly dynamic shifts). */
  private val masks: Column = typedlit((0 until 64).map(1L << _))

  private def positions(key: Column, mBits: Int, nHashes: Int): Seq[Column] =
    positionsMulti(Seq(key), mBits, nHashes)

  private def positionsMulti(keys: Seq[Column], mBits: Int,
      nHashes: Int): Seq[Column] =
    // per-hash seed via an extra hashed column; murmur3 int → pmod to m
    (0 until nHashes).map(i => pmod(hash(keys :+ lit(i): _*), lit(mBits)))

  /** Distributed build: explode each key into its bit positions,
    * bit_or per 64-bit word, collect the (word, bits) pairs — at most
    * `mBits/64` rows regardless of input size. */
  def buildBits(keys: DataFrame, keyCol: String, mBits: Int,
      nHashes: Int): Array[Long] =
    buildBitsMulti(keys, Seq(keyCol), mBits, nHashes)

  /** [[buildBits]] over a COMPOSITE key hashed field-by-field —
    * murmur3 folds the fields with the running hash as seed, so no
    * per-row struct is materialized on either side (the probe runs
    * per WEDGE in Triangles: tens of millions of rows pay for any
    * per-row allocation). Pair with [[mightContainMulti]]. */
  def buildBitsMulti(keys: DataFrame, keyCols: Seq[String], mBits: Int,
      nHashes: Int): Array[Long] = {
    require(mBits % 64 == 0, "mBits must be a multiple of 64")
    val words = keys
      .select(explode(array(
        positionsMulti(keyCols.map(col), mBits, nHashes): _*))
        .as("pos"))
      .select(shiftright(col("pos"), 6).as("w"),
        element_at(masks, pmod(col("pos"), lit(64)) + 1).as("m"))
      .groupBy("w").agg(expr("bit_or(m)").as("bits"))
      .collect()
    val arr = new Array[Long](mBits / 64)
    words.foreach(r => arr(r.getAs[Int]("w")) = r.getAs[Long]("bits"))
    arr
  }

  /** Membership test as a pure column expression over the built bits:
    * every hash's bit must be set. */
  def mightContain(key: Column, bits: Array[Long], mBits: Int,
      nHashes: Int): Column =
    mightContainMulti(Seq(key), bits, mBits, nHashes)

  /** [[mightContain]] for a composite key (see [[buildBitsMulti]]). */
  def mightContainMulti(keys: Seq[Column], bits: Array[Long], mBits: Int,
      nHashes: Int): Column = {
    val bitsLit = typedlit(bits.toSeq)
    positionsMulti(keys, mBits, nHashes).map { pos =>
      element_at(bitsLit, shiftright(pos, 6) + 1)
        .bitwiseAND(element_at(masks, pmod(pos, lit(64)) + 1)) =!= 0L
    }.reduce(_ && _)
  }

  /** Exact semi-join with a Bloom pre-filter on the fact side. */
  def semiJoin(fact: DataFrame, factKey: String, dim: DataFrame,
      dimKey: String, mBits: Int = 1 << 20, nHashes: Int = 3): DataFrame = {
    val dimKeys = dim.select(col(dimKey)).distinct()
    val bits = buildBits(dimKeys, dimKey, mBits, nHashes)
    fact.filter(mightContain(col(factKey), bits, mBits, nHashes))
      .join(dimKeys, col(factKey) === col(dimKey), "left_semi")
  }
}
