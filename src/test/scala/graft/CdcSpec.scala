package graft

import graft.operators.Cdc

class CdcSpec extends SparkSpec {
  import spark.implicits._

  test("cdc apply: latest version wins, deletes remove, untouched survive") {
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "s", "v")
    val changes = Seq(
      // key 1: U then D — delete is final
      (1L, "a2", 11.0, "U", 1), (1L, "a3", 12.0, "D", 2),
      // key 2: D then U — upsert is final, latest version's values win
      (2L, "b2", 21.0, "D", 1), (2L, "b3", 22.0, "U", 2),
      // key 4: pure insert
      (4L, "d", 40.0, "U", 1))
      .toDF("k", "s", "v", "op", "seq")
    val out = Cdc(base, changes, "k", "op", "seq")
      .as[(Long, String, Double)].collect().sortBy(_._1)
    assert(out.toSeq === Seq((2L, "b3", 22.0), (3L, "c", 30.0), (4L, "d", 40.0)))
  }

  test("cdc apply: empty change batch is the identity") {
    val base = Seq((1L, "a", 1.0)).toDF("k", "s", "v")
    val none = Seq.empty[(Long, String, Double, String, Int)]
      .toDF("k", "s", "v", "op", "seq")
    assert(Cdc(base, none, "k", "op", "seq")
      .as[(Long, String, Double)].collect().toSeq === Seq((1L, "a", 1.0)))
  }
}
