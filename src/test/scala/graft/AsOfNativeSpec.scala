package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._

/** The native as-of physical operator (plans.AsOfJoinExec): semantics
  * against a Scala-side reference, determinism of the tie rule, and
  * the physical contract (clustered exchanges, no window/union). */
class AsOfNativeSpec extends SparkSpec {
  import spark.implicits._

  // left probes; key 3 has no right rows, key 2 probes before any right
  private val left = Seq(
    (1L, 100L, "a"), (1L, 250L, "b"), (1L, 300L, "c"),
    (2L, 50L, "d"), (2L, 500L, "e"),
    (3L, 400L, "f")).toDF("k", "ts", "tag")

  private val right = Seq(
    (1L, 100L, 10L, 1.0), (1L, 200L, 11L, 2.0), (1L, 200L, 12L, 3.0),
    (1L, 300L, 13L, 4.0),
    (2L, 100L, 20L, 5.0), (2L, 450L, 21L, 6.0),
    (9L, 1L, 90L, 7.0)).toDF("rk", "rts", "rid", "rv")

  private def run() =
    AsOfJoin.nativeLeftAsOf(left, right, "k", "ts", "rk", "rts", "rid")
      .select("k", "ts", "tag", "rid", "rv").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1.0 else r.getDouble(4)))
      .toSet

  test("native as-of attaches the latest right row at or before each probe") {
    assert(run() === Set(
      (1L, 100L, "a", 10L, 1.0),     // exact-ts match counts (<=)
      (1L, 250L, "b", 12L, 3.0),     // (1,200) tie -> max rid 12
      (1L, 300L, "c", 13L, 4.0),
      (2L, 50L, "d", -1L, -1.0),     // probe before first right row
      (2L, 500L, "e", 21L, 6.0),
      (3L, 400L, "f", -1L, -1.0)))   // key with no right rows
  }

  test("result is stable under adversarial input partitioning") {
    val base = run()
    val shuffledLeft = left.repartition(7, col("ts"))
    val shuffledRight = right.repartition(5, col("rv"))
    val again = AsOfJoin.nativeLeftAsOf(shuffledLeft, shuffledRight,
        "k", "ts", "rk", "rts", "rid")
      .select("k", "ts", "tag", "rid", "rv").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1.0 else r.getDouble(4)))
      .toSet
    assert(again === base)
  }

  test("native as-of agrees with the window formulation on timestamped data") {
    val l = Seq((1L, "2024-01-01 10:00:00"), (1L, "2024-01-01 12:00:00"),
        (2L, "2024-01-01 09:00:00"))
      .toDF("k", "s").select(col("k"), to_timestamp(col("s")).as("ts"))
    val r = Seq((1L, "2024-01-01 09:30:00", 1L, 10.0),
        (1L, "2024-01-01 11:00:00", 2L, 20.0),
        (2L, "2024-01-01 09:30:00", 3L, 30.0))
      .toDF("rk", "s", "rid", "rv")
      .select(col("rk"), to_timestamp(col("s")).as("rts"), col("rid"), col("rv"))
    val native = AsOfJoin.nativeLeftAsOf(l, r, "k", "ts", "rk", "rts", "rid")
      .select("k", "ts", "rid", "rv").collect()
      .map(x => (x.getLong(0), x.getTimestamp(1).getTime,
        if (x.isNullAt(2)) -1L else x.getLong(2),
        if (x.isNullAt(3)) -1.0 else x.getDouble(3))).toSet
    val window = AsOfJoin.leftAsOf(
        l, r.select(col("rk").as("k"), col("rts").as("ts"),
          col("rid"), col("rv")),
        "k", "ts", Map("rid" -> "rid", "rv" -> "rv"))
      .select("k", "ts", "rid", "rv").collect()
      .map(x => (x.getLong(0), x.getTimestamp(1).getTime,
        if (x.isNullAt(2)) -1L else x.getLong(2),
        if (x.isNullAt(3)) -1.0 else x.getDouble(3))).toSet
    assert(native === window)
  }

  test("physical plan is the custom exec fed by clustered exchanges, no window") {
    val df = AsOfJoin.nativeLeftAsOf(left, right, "k", "ts", "rk", "rts", "rid")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), s"expected the custom exec:\n$p")
    assert(!p.contains("Window"), s"native path must not plan a window:\n$p")
    assert("hashpartitioning".r.findAllIn(p).length >= 2,
      s"both sides must hash-cluster on their keys:\n$p")
  }

  test("null keys or timestamps never match, and null right rows are skipped") {
    val l = Seq((Some(1L), Some(100L)), (None, Some(100L)), (Some(1L), None))
      .toDF("k", "ts")
    val r = Seq((Some(1L), Some(50L), 1L), (Some(1L), None, 2L),
        (None, Some(10L), 3L))
      .toDF("rk", "rts", "rid")
    val out = AsOfJoin.nativeLeftAsOf(l, r, "k", "ts", "rk", "rts", "rid")
      .select("k", "ts", "rid").collect()
      .map(x => (if (x.isNullAt(0)) -1L else x.getLong(0),
        if (x.isNullAt(1)) -1L else x.getLong(1),
        if (x.isNullAt(2)) -1L else x.getLong(2))).toSet
    assert(out === Set((1L, 100L, 1L), (-1L, 100L, -1L), (1L, -1L, -1L)))
  }
}
