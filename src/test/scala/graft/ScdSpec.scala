package graft

import java.sql.Timestamp
import graft.operators.Scd
import org.apache.spark.sql.functions._

class ScdSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("scd2 closes open rows and chains in-batch changes") {
    val history = Seq(
      (1L, "bronze", t("2024-01-01 00:00:00"), Option.empty[Timestamp]),
      (2L, "gold", t("2024-01-01 00:00:00"), Option.empty[Timestamp]),
      (1L, "trial", t("2023-06-01 00:00:00"), Some(t("2024-01-01 00:00:00"))))
      .toDF("cust_id", "tier", "valid_from", "valid_to")
    val changes = Seq(
      (1L, "silver", t("2024-03-01 00:00:00")),
      (1L, "gold", t("2024-06-01 00:00:00")))
      .toDF("cust_id", "tier", "change_ts")

    val out = Scd.applyChanges(history, changes, "cust_id", Seq("tier"))
      .orderBy("cust_id", "valid_from")
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        Option(r.getTimestamp(3)).map(_.toString), r.getBoolean(4)))

    assert(out.toSeq === Seq(
      (1L, "trial", Some("2024-01-01 00:00:00.0"), false),
      (1L, "bronze", Some("2024-03-01 00:00:00.0"), false),
      (1L, "silver", Some("2024-06-01 00:00:00.0"), false),
      (1L, "gold", None, true),
      (2L, "gold", None, true)))
  }

  test("scd2 is deterministic under equal change timestamps (last attr wins open)") {
    val history = Seq((1L, "a", t("2024-01-01 00:00:00"), Option.empty[Timestamp]))
      .toDF("k", "v", "valid_from", "valid_to")
    val dup = t("2024-02-01 00:00:00")
    val changes = Seq((1L, "z", dup), (1L, "m", dup)).toDF("k", "v", "change_ts")
    (1 to 2).foreach { _ =>
      val cur = Scd.applyChanges(history, changes.repartition(3), "k", Seq("v"))
        .filter(col("is_current")).collect()
      assert(cur.length === 1 && cur.head.getString(1) === "z")
    }
  }
}
