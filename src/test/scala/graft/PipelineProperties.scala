package graft

import graft.operators.Pipeline
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property-based invariants for the training-pipeline operators over
  * randomized corpora.
  */
object PipelineProperties extends Properties("graft.pipeline") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = SparkSpec.session

  private val corpus: Gen[List[(Long, String, Int)]] =
    Gen.chooseNum(1, 60).flatMap { n =>
      Gen.listOfN(n, Gen.zip(Gen.oneOf("s0", "s1", "s2"), Gen.chooseNum(1, 500)))
        .map(_.zipWithIndex.map { case ((src, tok), i) => (i.toLong, src, tok) })
    }

  property("packing: offsets are monotone and gap-free within each group") =
    forAll(corpus) { rows =>
      import spark.implicits._
      val df = rows.toDF("doc_id", "source", "n_tokens")
      val out = Pipeline.packSequences(df, "source", "doc_id", "n_tokens", 256)
        .select("source", "doc_id", "n_tokens", "start_off", "bin_id")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2),
          r.getLong(3), r.getLong(4)))
      out.groupBy(_._1).forall { case (_, g) =>
        val sorted = g.sortBy(_._2)
        val offsetsChain = sorted.zip(sorted.scanLeft(0L)(_ + _._3.toLong))
          .forall { case (row, expectedOff) => row._4 == expectedOff }
        val binsMatch = sorted.forall(r => r._5 == r._4 / 256)
        offsetsChain && binsMatch
      }
    }

  property("stratified sample is a subset, reproducible, and per-mille-monotone") =
    forAll(corpus) { rows =>
      import spark.implicits._
      val df = rows.toDF("doc_id", "source", "n_tokens")
      def ids(rate: Int) = Pipeline.stratifiedSample(df, "doc_id", "source",
        Map("s0" -> rate), 0).select("doc_id").collect().map(_.getLong(0)).toSet
      val lo = ids(300)
      val hi = ids(700)
      lo.subsetOf(hi) && ids(300) == lo && ids(1000).size ==
        rows.count(_._2 == "s0")
    }

  property("deterministic shuffle is a permutation with dense per-shard positions") =
    forAll(corpus) { rows =>
      import spark.implicits._
      val df = rows.toDF("doc_id", "source", "n_tokens")
      val out = Pipeline.deterministicShuffle(df, "doc_id", 4)
        .select("doc_id", "shard", "pos").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      out.length == rows.length &&
        out.map(_._1).toSet == rows.map(_._1).toSet &&
        out.groupBy(_._2).values.forall { g =>
          g.map(_._3).sorted.toSeq == (1L to g.length).toSeq
        }
    }

  property("priority sample == the u^(1/w) reference on arbitrary corpora") =
    forAll(corpus) { rows =>
      import spark.implicits._
      val df = rows.toDF("doc_id", "source", "n_tokens")
      val k = 5
      val got = Pipeline.prioritySample(df, "doc_id", "n_tokens", "source", k)
        .select("source", "rank", "doc_id").collect()
        .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
      def hash(id: Long) =
        ((id * 1103515245L + 12345L) % 2147483647L + 2147483647L) % 2147483647L
      val expect = rows.groupBy(_._2).flatMap { case (s, rs) =>
        rs.map { case (id, _, w) =>
          val u = (hash(id) + 1).toDouble / 2147483648.0
          (id, math.pow(u, 1.0 / math.max(w, 1)))
        }.sortBy { case (id, p) => (-p, id) }.take(k)
          .zipWithIndex.map { case ((id, _), r) => (s, r + 1, id) }
      }.toSet
      got == expect
    }
}
