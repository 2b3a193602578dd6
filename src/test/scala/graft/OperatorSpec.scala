package graft

import java.sql.Timestamp
import graft.operators.{AsOfJoin, Multimodal, Sessionize}
import org.apache.spark.sql.functions._

class OperatorSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("as-of join attaches most recent prior right row per key") {
    val purchases = Seq(
      (100L, 1L, t("2024-01-01 10:30:00")),
      (101L, 1L, t("2024-01-01 12:00:00")),
      (102L, 2L, t("2024-01-01 09:00:00"))   // no prior click
    ).toDF("event_id", "user_id", "ts")
    val clicks = Seq(
      (200L, 1L, t("2024-01-01 10:00:00")),
      (201L, 1L, t("2024-01-01 11:00:00")),
      (202L, 2L, t("2024-01-01 09:30:00"))   // after the purchase
    ).toDF("event_id", "user_id", "ts")
    val out = AsOfJoin.leftAsOf(purchases, clicks, "user_id", "ts",
      Map("event_id" -> "click_event_id"))
      .collect().map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[Any]("click_event_id"))).toMap
    assert(out(100L) === Some(200L))
    assert(out(101L) === Some(201L))
    assert(out(102L) === None)
  }

  test("as-of join keeps a carried column whose name collides with a right-only column") {
    val purchases = Seq((100L, 1L, t("2024-01-01 10:30:00")))
      .toDF("event_id", "user_id", "ts")
    val clicks = Seq((1L, t("2024-01-01 10:00:00"), 9.5))
      .toDF("user_id", "ts", "price")
    // "price" -> "price": dst is absent from the left schema, so the
    // right-only cleanup must not drop the carried value.
    val out = AsOfJoin.leftAsOf(purchases, clicks, "user_id", "ts",
      Map("price" -> "price")).collect()
    assert(out.head.getAs[Double]("price") === 9.5)
  }

  test("as-of join breaks equal (key, ts) right-side ties deterministically (max payload)") {
    val purchases = Seq((100L, 1L, t("2024-01-01 10:30:00")))
      .toDF("event_id", "user_id", "ts")
    val dup = t("2024-01-01 10:00:00")
    val clicks = Seq((200L, 1L, dup), (203L, 1L, dup), (201L, 1L, dup))
      .toDF("event_id", "user_id", "ts")
    (1 to 3).foreach { _ =>
      val out = AsOfJoin.leftAsOf(
        purchases, clicks.repartition(4), "user_id", "ts",
        Map("event_id" -> "click_event_id")).collect()
      assert(out.head.getAs[Long]("click_event_id") === 203L)
    }
  }

  test("as-of join carries map-typed columns via the orderable-fallback path") {
    val purchases = Seq((100L, 1L, t("2024-01-01 10:30:00")))
      .toDF("event_id", "user_id", "ts")
    val clicks = Seq((1L, t("2024-01-01 10:00:00"), Map("k" -> 2L)))
      .toDF("user_id", "ts", "attrs")
    val out = AsOfJoin.leftAsOf(purchases, clicks, "user_id", "ts",
      Map("attrs" -> "attrs")).collect()
    assert(out.head.getAs[Map[String, Long]]("attrs") === Map("k" -> 2L))
  }

  test("sessionize splits on gaps larger than the threshold") {
    val ev = Seq(
      (1L, t("2024-01-01 10:00:00"), 1L),
      (2L, t("2024-01-01 10:10:00"), 1L),
      (3L, t("2024-01-01 11:30:00"), 1L),   // > 30 min gap -> new session
      (4L, t("2024-01-01 10:00:00"), 2L)
    ).toDF("event_id", "ts", "user_id")
    val out = Sessionize.withSessionId(ev, "user_id", "ts", 30 * 60 * 1000L, "event_id")
      .collect().map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("session_id")).toMap
    assert(out === Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 0L))
  }

  test("multimodal feature extraction produces deterministic features") {
    val docs = Seq((7L, "abc")).toDF("doc_id", "text")
    val out = Multimodal.featureFrame(spark, docs, "doc_id", "text").collect().head
    assert(out.getAs[Long]("doc_id") === 7L)
    assert(out.getAs[Int]("n_bytes") === 3)
    val f = out.getSeq[Double](2)
    assert(f === Seq(3.0, ('a' + 'b' + 'c').toDouble % 997, 'a'.toDouble, 'c'.toDouble))
  }

  test("frame sampling fans out strided deterministic frames") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val media = Seq(Multimodal.MediaRow(1L, Array.tabulate(150)(_.toByte)))
      .toDS()
    val frames = Multimodal.sampleFrames(media, stride = 64).collect()
    assert(frames.length === 3)                      // offsets 0, 64, 128
    assert(frames.map(_.offset).toSeq === Seq(0, 64, 128))
    assert(frames.forall(f => f.width == 32 && f.height == 32))
    assert(frames(2).frame_features(0) === 22.0)     // last chunk is 150-128 bytes
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
