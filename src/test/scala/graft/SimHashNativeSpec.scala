package graft

import graft.functions.{HashFunctions, SimHashExpr, TextFunctions, TokenHashes}
import org.apache.spark.sql.functions._

class SimHashNativeSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    "the quick brown fox", "a  b", "", "single",
    "repeat repeat repeat word").toDF("text")

  test("TokenHashes == HOF hash62 over split tokens") {
    val native = docs.select(TokenHashes(col("text")).as("h"))
      .collect().map(_.getSeq[Long](0))
    val hof = docs.select(transform(TextFunctions.tokens(col("text")),
      w => HashFunctions.hash62(w)).as("h"))
      .collect().map(_.getSeq[Long](0))
    assert(native.toSeq === hof.toSeq)
  }

  test("PolyHashExpr == HOF polyHash on ascii") {
    val native = docs.select(graft.functions.PolyHashExpr(col("text"), 31L).as("h"))
      .collect().map(_.getLong(0))
    val hof = docs.select(HashFunctions.polyHash(col("text")).as("h"))
      .collect().map(_.getLong(0))
    assert(native.toSeq === hof.toSeq)
  }

  test("MinHashSigExpr == HOF minhashSig incl. empty-shingle docs") {
    val d = Seq("one two three four five", "short", "").toDF("text")
    val base = graft.functions.ShingleHashes(col("text"), 3)
    val native = d.select(graft.functions.MinHashSigExpr(base, 16).as("s"))
      .collect().map(r => Option(r.getSeq[Any](0)).map(_.toVector))
    val hof = d.select(HashFunctions.minhashSig(
      transform(base, h => h % lit(HashFunctions.P)), 16).as("s"))
      .collect().map(r => Option(r.getSeq[Any](0)).map(_.toVector))
    assert(native.toSeq === hof.toSeq)
  }

  test("SimHashExpr == HOF simhash fold") {
    val native = docs.select(
      SimHashExpr(TokenHashes(col("text"))).as("s"))
      .collect().map(_.getLong(0))
    val hof = docs.select(HashFunctions.simhash(
      transform(TextFunctions.tokens(col("text")),
        w => HashFunctions.hash62(w))).as("s"))
      .collect().map(_.getLong(0))
    assert(native.toSeq === hof.toSeq)
  }
}
