package graft

import graft.operators.BloomSemi
import org.apache.spark.sql.functions._

class BloomSemiSpec extends SparkSpec {
  import spark.implicits._

  test("bloom semi-join returns exactly the plain semi-join result") {
    val rnd = new scala.util.Random(7)
    val fact = List.fill(5000)((rnd.nextLong(1000000L), rnd.nextInt(100)))
      .toDF("k", "v")
    val dim = List.fill(200)(rnd.nextLong(1000000L)).distinct.toDF("k")
      .select(col("k").as("dk"))
    val got = BloomSemi.semiJoin(fact, "k", dim, "dk", mBits = 1 << 12)
      .select("k", "v").as[(Long, Int)].collect().sorted.toSeq
    val want = fact.join(dim, col("k") === col("dk"), "left_semi")
      .select("k", "v").as[(Long, Int)].collect().sorted.toSeq
    assert(got === want)
  }

  test("membership has no false negatives and a sane false-positive rate") {
    val keys = (0L until 1000L).map(_ * 7919L).toDF("k")
    val mBits = 1 << 16
    val bits = BloomSemi.buildBits(keys, "k", mBits, nHashes = 3)
    val member = (0L until 1000L).map(_ * 7919L).toDF("p")
      .filter(BloomSemi.mightContain(col("p"), bits, mBits, 3)).count()
    assert(member === 1000L, "a bloom filter must never reject a member")
    // 3k/m = 3000/65536: expected fpp well under 1%
    val probes = (1L to 20000L).map(_ * 7919L + 3L).toDF("p")
    val fp = probes.filter(BloomSemi.mightContain(col("p"), bits, mBits, 3))
      .count()
    assert(fp < 400L, s"false-positive rate too high: $fp / 20000")
  }

  test("built bits are bounded by mBits, not by the key count") {
    val many = (0L until 50000L).toDF("k")
    val bits = BloomSemi.buildBits(many, "k", mBits = 1 << 10, nHashes = 3)
    assert(bits.length === (1 << 10) / 64)
  }
}
