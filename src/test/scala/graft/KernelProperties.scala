package graft

import graft.functions.{Hash62Expr, ShingleHashes, TextFunctions}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property-based equivalence checks for the native kernels against
  * their composed/reference forms, over randomized ASCII corpora.
  */
object KernelProperties extends Properties("graft.kernels") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = SparkSpec.session
  import org.apache.spark.sql.{Encoders, Row}

  private val asciiWord: Gen[String] =
    Gen.chooseNum(1, 8).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))

  private val doc: Gen[String] =
    Gen.chooseNum(0, 30).flatMap(n => Gen.listOfN(n, asciiWord).map(_.mkString(" ")))

  private def refPoly(s: String, mult: Long): Long =
    s.foldLeft(0L)((acc, c) => (acc * mult + c.toLong) % 2147483647L)

  private def refHash62(s: String): Long =
    refPoly(s, 31) + (refPoly(s, 131) << 31)

  property("Hash62Expr == reference dual-poly hash") = forAll(Gen.listOfN(30, doc)) { docs =>
    import spark.implicits._
    val got = docs.toDF("s").select(Hash62Expr(col("s"))).collect().map(_.getLong(0))
    got.sameElements(docs.map(refHash62))
  }

  property("ShingleHashes == reference shingle set") = forAll(Gen.listOfN(20, doc)) { docs =>
    import spark.implicits._
    val got = docs.toDF("s")
      .select(array_sort(ShingleHashes(col("s"), 3)).as("h"))
      .collect().map(_.getSeq[Long](0).toVector)
    val want = docs.map { d =>
      val toks = d.split(" ", -1)
      toks.sliding(3).filter(_.length == 3).map(w => refHash62(w.mkString(" ")))
        .toVector.distinct.sorted
    }
    got.sameElements(want)
  }

  property("DotFold == reference left fold") = forAll(
    Gen.listOfN(10, Gen.listOfN(16, Gen.chooseNum(-100.0, 100.0)))) { vecs =>
    import spark.implicits._
    val got = vecs.toDF("v")
      .select(Dsl.dotFold(col("v"), col("v"))).collect().map(_.getDouble(0))
    val want = vecs.map(v => v.foldLeft(0.0)((acc, x) => acc + x * x))
    got.sameElements(want)
  }
}
