package graft

import graft.functions.{BloomSketch, CmsSketch, HllSketch, MinHashGroupSig}
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property-based contracts for the mergeable sketch families over
  * randomized key sets — pure-JVM (the aggregate buffers' own
  * add/merge/serialize), so hundreds of trials cost milliseconds.
  * These pin the ALGEBRAIC laws the oracle entries rely on: merge is
  * exactly the union's sketch (order- and duplication-invariant),
  * serialization round-trips bit-identically, and each family's
  * headline guarantee (no false negatives / never undercount / no
  * false "distinct drop") holds on arbitrary inputs, not just the
  * spec's fixtures.
  */
object SketchProperties extends Properties("graft.sketches") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(50)

  private val keys: Gen[List[Long]] =
    Gen.chooseNum(0, 300).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(Long.MinValue, Long.MaxValue)))

  private def bloomOf(ks: Seq[Long], m: Int, k: Int): BloomSketch = {
    val s = new BloomSketch(m, k)
    ks.foreach(s.add)
    s
  }

  property("Bloom: merge == union's sketch; no false negatives; round-trip") =
    forAll(keys, keys) { (a, b) =>
      val sa = bloomOf(a, 1024, 3)
      val sb = bloomOf(b, 1024, 3)
      sa.mergeWith(sb)
      val union = bloomOf(a ++ b, 1024, 3)
      java.util.Arrays.equals(sa.toBytes, union.toBytes) &&
        (a ++ b).forall(union.mightContain) &&
        java.util.Arrays.equals(
          BloomSketch.fromBytes(union.toBytes).toBytes, union.toBytes)
    }

  property("HLL: merge == union's sketch, whatever the split or order") =
    forAll(keys, keys) { (a0, b0) =>
      val a = a0.map(k => math.abs(k % 2147483647L))
      val b = b0.map(k => math.abs(k % 2147483647L))
      val sa = new HllSketch(6); a.foreach(sa.add)
      val sb = new HllSketch(6); b.foreach(sb.add)
      sa.mergeWith(sb)
      val union = new HllSketch(6)
      scala.util.Random.shuffle(a ++ b).foreach(union.add)
      java.util.Arrays.equals(sa.toBytes, union.toBytes)
    }

  property("CMS: estimate never undercounts; merge == concatenation's sketch") =
    forAll(keys, keys) { (a, b) =>
      val sa = new CmsSketch(32); a.foreach(sa.add(_, 1L))
      val sb = new CmsSketch(32); b.foreach(sb.add(_, 1L))
      sa.mergeWith(sb)
      val both = new CmsSketch(32); (a ++ b).foreach(both.add(_, 1L))
      val counts = (a ++ b).groupBy(identity).map { case (k, v) => k -> v.size }
      java.util.Arrays.equals(sa.toBytes, both.toBytes) &&
        counts.forall { case (k, n) => both.query(k) >= n.toLong }
    }

  property("MinHash: merge == union's signature; J(S,S)=1; duplication-invariant") =
    forAll(keys, keys) { (a, b) =>
      val sa = new MinHashGroupSig(16); a.foreach(sa.add)
      val sb = new MinHashGroupSig(16); b.foreach(sb.add)
      sa.mergeWith(sb)
      val union = new MinHashGroupSig(16)
      (a ++ b ++ a).foreach(union.add) // duplicates must not matter
      val self = new MinHashGroupSig(16); a.foreach(self.add)
      val selfAgain = new MinHashGroupSig(16)
      scala.util.Random.shuffle(a).foreach(selfAgain.add)
      java.util.Arrays.equals(sa.toBytes, union.toBytes) &&
        self.jaccardEst(selfAgain) == 1.0
    }

  private val prioRows: Gen[List[(Long, Long)]] =
    Gen.chooseNum(0, 300).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.chooseNum(0L, 40L),
        Gen.chooseNum(Long.MinValue, Long.MaxValue))))

  property("Sample: merge/split/order/trim-invariant == exact top-k by max prio") =
    forAll(prioRows, prioRows) { (a, b) =>
      import graft.functions.SampleSketch
      val k = 5
      val sa = new SampleSketch(k); a.foreach { case (key, p) => sa.add(key, p) }
      val sb = new SampleSketch(k); b.foreach { case (key, p) => sb.add(key, p) }
      sa.mergeWith(sb)
      val direct = new SampleSketch(k)
      scala.util.Random.shuffle(a ++ b).foreach { case (key, p) => direct.add(key, p) }
      // driver reference: exact top-k keys by (max priority desc, key asc)
      // sortWith, not sortBy(-p, …): negating Long.MinValue overflows
      val expect = (a ++ b).groupBy(_._1)
        .map { case (key, rs) => (key, rs.map(_._2).max) }.toSeq
        .sortWith((x, y) => x._2 > y._2 || (x._2 == y._2 && x._1 < y._1))
        .take(k)
      val nonEmpty = (a ++ b).nonEmpty
      (!nonEmpty || (java.util.Arrays.equals(sa.toBytes, direct.toBytes) &&
        sa.entries.toSeq == expect &&
        java.util.Arrays.equals(
          SampleSketch.fromBytes(sa.toBytes).toBytes, sa.toBytes))) &&
        (nonEmpty || sa.entries.isEmpty)
    }
}
