package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable hashing primitives (SURVEY.md §4
  * rule 6): explicit integer arithmetic only, so any oracle can
  * re-express them — never an engine-internal hash().
  *
  * All expressions are Catalyst higher-order functions: they run
  * inside WholeStageCodegen, per row, with no shuffle and no UDF
  * serialization overhead — the right shape for a 100 TB scan.
  */
object HashFunctions {

  /** Modulus: 2^31 - 1 (Mersenne prime). */
  val P: Long = 2147483647L

  /** Polynomial rolling hash of a string column (or lambda variable):
    * fold of `acc * mult + ascii(char) mod P`. */
  def polyHash(c: Column, mult: Long = 31L): Column =
    aggregate(
      transform(sequence(lit(1), length(c)), i => ascii(c.substr(i, lit(1))).cast("long")),
      lit(0L),
      (acc, x) => (acc * lit(mult) + x) % lit(P))

  /** 62-bit word hash: two independent polynomial hashes packed. */
  def hash62(c: Column): Column =
    polyHash(c, 31L) + shiftleft(polyHash(c, 131L), 31)

  /** Fixed MinHash permutation parameters (a_i, b_i), LCG-derived from
    * seed 42 — stable across versions so signatures are reproducible. */
  def minhashPerms(k: Int): Seq[(Long, Long)] = {
    var s = 42L
    def next(): Long = {
      s = s * 6364136223846793005L + 1442695040888963407L
      (s >>> 33) % (P - 1)
    }
    Seq.fill(k)((next() + 1, next()))
  }

  /** MinHash signature (array of k minima) over an array of base
    * hashes (e.g. `transform(shingles, polyHash(_))`). */
  def minhashSig(baseHashes: Column, k: Int): Column = {
    val perms = minhashPerms(k)
    array(perms.map { case (a, b) =>
      array_min(transform(baseHashes, h => (h * lit(a) + lit(b)) % lit(P)))
    }: _*)
  }

  /** 63-bit SimHash over an array of word hashes with unit weights:
    * majority vote per bit, folded into a single BIGINT. The per-bit
    * vote re-folds the (precomputed) hash array — O(63·|words|) per
    * row, no shuffle. */
  def simhash(wordHashes: Column): Column =
    aggregate(
      sequence(lit(0), lit(62)),
      lit(0L),
      (acc, j) => acc + call_function("shiftleft",
        when(aggregate(wordHashes, lit(0L),
          (s, h) => s + (call_function("shiftright", h, j) % lit(2L)) * lit(2L) - lit(1L)) > 0, lit(1L))
          .otherwise(lit(0L)), j))

  /** Hamming distance between two simhash fingerprints. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
