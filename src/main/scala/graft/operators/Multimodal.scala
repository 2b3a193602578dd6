package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2 rows 40–41): media
  * payloads ride as opaque `binary` columns with typed metadata; the
  * decode/feature-extract step is a per-partition batch pipeline —
  * the Scala analogue of `mapInPandas` batches.
  *
  * The decoder itself is STUBBED (no image/audio libs in this
  * container): `FakeDecoder` is a deterministic stand-in with the
  * same shape a real decoder would have (bytes in, fixed-width
  * feature vector out). The Spark-side plumbing — schema, typed
  * Dataset, partition batching, feature schema — is real.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, payload: Array[Byte])
  case class FeatureRow(doc_id: Long, n_bytes: Int, features: Array[Double])

  /** Stand-in for an image/audio decoder: deterministic features from
    * raw bytes. A real deployment swaps only this function. */
  object FakeDecoder {
    val dim = 4
    def decode(bytes: Array[Byte]): Array[Double] = {
      var sum = 0L
      var i = 0
      while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
      Array(
        bytes.length.toDouble,
        (sum % 997L).toDouble,
        if (bytes.nonEmpty) (bytes(0) & 0xff).toDouble else 0.0,
        if (bytes.nonEmpty) (bytes(bytes.length - 1) & 0xff).toDouble else 0.0)
    }
  }

  /** Attach a binary payload column (UTF-8 bytes of the text — the
    * deterministic fake "media blob" for the synthetic corpus). */
  def withPayload(docs: DataFrame, textCol: String): DataFrame =
    docs.withColumn("payload", col(textCol).cast("binary"))

  /** Batched decode: one decoder instantiation per partition (the
    * expensive-init pattern for real codecs), rows streamed through. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[FeatureRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init site for a real decoder/model handle
      rows.map { r =>
        FeatureRow(r.doc_id, r.payload.length, FakeDecoder.decode(r.payload))
      }
    }
  }

  case class FrameRow(doc_id: Long, frame_idx: Int, offset: Int,
      width: Int, height: Int, frame_features: Array[Double])

  /** Frame sampling for "video" payloads: every `stride`-th chunk of
    * the byte stream becomes a frame record, "decoded" and "resized"
    * by the stub to fixed W×H metadata + features. One input row fans
    * out to ~len/stride frame rows — the Spark-side shape (explode-in-
    * mapPartitions, bounded memory per row) is what matters; a real
    * demuxer replaces only the inner loop. */
  def sampleFrames(media: Dataset[MediaRow], stride: Int,
      resizeTo: (Int, Int) = (32, 32)): Dataset[FrameRow] = {
    import media.sparkSession.implicits._
    val (w, h) = resizeTo
    media.flatMap { r =>
      Iterator.range(0, math.max(r.payload.length, 1), stride).zipWithIndex.map {
        case (off, idx) =>
          val chunk = r.payload.slice(off, math.min(off + stride, r.payload.length))
          FrameRow(r.doc_id, idx, off, w, h, FakeDecoder.decode(chunk))
      }
    }
  }

  /** End-to-end: docs -> payload -> typed rows -> features frame. */
  def featureFrame(spark: SparkSession, docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    import spark.implicits._
    val media = withPayload(docs, textCol)
      .select(col(idCol).as("doc_id"), col("payload")).as[MediaRow]
    extractFeatures(media).toDF()
  }

  case class PackedShard(source: String, shard: Long, blob: Array[Byte])
  case class UnpackedRecord(source: String, shard: Long, rec_idx: Int,
      rec: Array[Byte])

  /** Pack each (source, shard)'s payloads into ONE length-prefixed
    * container blob — the record-file framing (tar/TFRecord-shaped)
    * large media ships in. Each record is [4-byte big-endian length ||
    * payload], concatenated in `orderCol` order, all as codegen'd
    * column expressions. The concatenation is O(total bytes): each
    * framed record is rendered as hex, the hex strings are joined in
    * ONE `array_join` pass, and a single `unhex` restores the bytes —
    * a binary `aggregate` fold would copy the accumulator every step
    * (O(n²) bytes per blob), which silently breaks the scaling story
    * on fat shards. The 2× transient hex expansion is the price of the
    * linear join; it is bounded by the shard, like everything here.
    * The SHARD is what keeps this scalable: a blob is one shard's
    * rows, never a whole source, so row size stays bounded however
    * large the corpus grows. */
  def packRecords(df: DataFrame, sourceCol: String, shardCol: String,
      orderCol: String, payloadCol: String): DataFrame =
    df.groupBy(col(sourceCol).as("source"), col(shardCol).as("shard"))
      .agg(unhex(array_join(
        transform(
          array_sort(collect_list(struct(col(orderCol).as("o"),
            col(payloadCol).as("p")))),
          s => concat(
            lpad(hex(length(s.getField("p"))), 8, "0"),
            hex(s.getField("p")))),
        "")).as("blob"))

  /** Unpack container blobs back into per-record rows — the decode
    * half of the round trip, a streamed per-row parser (a real format
    * swaps only the framing logic). Fails loudly on truncated or
    * trailing bytes rather than emitting a short record. */
  def unpackRecords(packed: Dataset[PackedShard]): Dataset[UnpackedRecord] = {
    import packed.sparkSession.implicits._
    packed.flatMap { p =>
      val buf = java.nio.ByteBuffer.wrap(p.blob)
      val out = Seq.newBuilder[UnpackedRecord]
      var idx = 0
      while (buf.remaining() >= 4) {
        val len = buf.getInt
        require(len >= 0 && len <= buf.remaining(),
          s"corrupt record length $len at record $idx of ${p.source}/${p.shard}")
        val rec = new Array[Byte](len)
        buf.get(rec)
        out += UnpackedRecord(p.source, p.shard, idx, rec)
        idx += 1
      }
      require(buf.remaining() == 0,
        s"trailing ${buf.remaining()} bytes in ${p.source}/${p.shard}")
      out.result()
    }
  }
}
