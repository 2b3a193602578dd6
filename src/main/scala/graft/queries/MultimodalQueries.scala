package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal-column suite (SURVEY.md §2 rows 40–41): binary payloads
  * with typed metadata, and the batched decode/feature-extract
  * pipeline (decoder stubbed — see Multimodal.FakeDecoder).
  */
object MultimodalQueries {

  /** Binary payload + typed metadata extraction. */
  val m01 = QueryDef(
    "m01_binary_meta",
    (sp, dir) => {
      Multimodal.withPayload(Tables(sp, dir, "documents"), "text")
        .select(col("doc_id"),
          length(col("payload")).cast("int").as("n_bytes"),
          upper(substring(hex(col("payload")), 1, 16)).as("header_hex"))
        .withColumn("kind",
          when(col("n_bytes") < 150, "small")
            .when(col("n_bytes") < 350, "medium")
            .otherwise("large"))
        .orderBy("doc_id")
    },
    Some("""
      SELECT doc_id,
        CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        upper(substring(hex(encode(text)), 1, 16)) AS header_hex,
        CASE WHEN octet_length(encode(text)) < 150 THEN 'small'
             WHEN octet_length(encode(text)) < 350 THEN 'medium'
             ELSE 'large' END AS kind
      FROM documents ORDER BY doc_id"""))

  /** Batched feature extraction through the typed Dataset pipeline.
    * The mapPartitions decode runs for real; the output projects the
    * feature vector to scalar columns so downstream consumers (and the
    * driver's pandas compare) see a flat schema. The stub decoder is
    * integer arithmetic over the payload bytes, so a full DuckDB
    * oracle exists: byte sums are recomputed from hex() pairs. */
  val m02 = QueryDef(
    "m02_feature_extract",
    (sp, dir) => {
      Multimodal.featureFrame(sp, Tables(sp, dir, "documents"), "doc_id", "text")
        .select(col("doc_id"), col("n_bytes"),
          element_at(col("features"), 1).as("f_len"),
          element_at(col("features"), 2).as("f_sum_mod"),
          element_at(col("features"), 3).as("f_first"),
          element_at(col("features"), 4).as("f_last"))
        .orderBy("doc_id")
    },
    Some("""
      WITH b AS (
        SELECT doc_id, hex(encode(text)) AS hx,
               octet_length(encode(text)) AS n
        FROM documents)
      SELECT doc_id, CAST(n AS INT) AS n_bytes,
        CAST(n AS DOUBLE) AS f_len,
        CAST(COALESCE(list_sum(list_transform(range(1, n + 1),
               i -> CAST('0x' || substring(hx, 2*i - 1, 2) AS INT))), 0) % 997
             AS DOUBLE) AS f_sum_mod,
        CAST(CASE WHEN n > 0 THEN CAST('0x' || substring(hx, 1, 2) AS INT)
                  ELSE 0 END AS DOUBLE) AS f_first,
        CAST(CASE WHEN n > 0 THEN CAST('0x' || substring(hx, 2*n - 1, 2) AS INT)
                  ELSE 0 END AS DOUBLE) AS f_last
      FROM b ORDER BY doc_id"""))

  /** Frame-sampling plumbing over fake video payloads. The flatMap
    * fan-out runs for real; the frame count per doc is a closed form
    * of the byte length (ceil(max(len,1)/stride)), so the aggregate
    * shape is DuckDB-checkable. */
  val m03 = QueryDef(
    "m03_frame_sample",
    (sp, dir) => {
      import sp.implicits._
      val media = Multimodal.withPayload(Tables(sp, dir, "documents"), "text")
        .select(col("doc_id"), col("payload")).as[Multimodal.MediaRow]
      Multimodal.sampleFrames(media, stride = 64).toDF()
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_frames"),
          max(col("frame_idx")).as("last_idx"))
        .orderBy("doc_id")
    },
    Some("""
      SELECT doc_id,
        CAST(ceil(greatest(octet_length(encode(text)), 1) / 64.0) AS BIGINT)
          AS n_frames,
        CAST(ceil(greatest(octet_length(encode(text)), 1) / 64.0) - 1 AS INT)
          AS last_idx
      FROM documents ORDER BY doc_id"""))

  /** Chunked-blob round trip: split each payload into bounded 64-byte
    * chunk rows (the shape large media ships in — no row ever holds
    * more than a chunk) and reassemble by ordered position, verifying
    * byte equality with the original. All pure Catalyst: explode for
    * the split, sorted collect + hex join for the reassembly. */
  val m04 = QueryDef(
    "m04_chunk_roundtrip",
    (sp, dir) => {
      val chunked = Multimodal.withPayload(Tables(sp, dir, "documents"), "text")
        .select(col("doc_id"), col("payload"),
          explode(sequence(lit(0),
            greatest(ceil(length(col("payload")) / 64.0).cast("int"), lit(1))
              - lit(1))).as("i"))
        .select(col("doc_id"), col("payload"), col("i"),
          hex(substring(col("payload"), col("i") * 64 + 1, lit(64))).as("chunk_hex"))
      chunked.groupBy("doc_id")
        .agg(count(lit(1)).as("n_chunks"),
          (array_join(transform(
            sort_array(collect_list(struct(col("i"), col("chunk_hex")))),
            s => s.getField("chunk_hex")), "")
            === first(hex(col("payload")))).as("roundtrip_ok"))
        .orderBy("doc_id")
    },
    Some("""
      SELECT doc_id,
        CAST(greatest(ceil(octet_length(encode(text)) / 64.0), 1) AS BIGINT)
          AS n_chunks,
        TRUE AS roundtrip_ok
      FROM documents ORDER BY doc_id"""))

  /** Exact binary dedup: group payloads by SHA-256 digest — the
    * content-addressed identity every multimodal lake dedups and
    * caches on (hash the BYTES, never decode). Spark's `sha2` over the
    * binary column and DuckDB's `sha256` over the source string hash
    * the same UTF-8 bytes, so the digests — and the groups — match
    * exactly. */
  val m05 = QueryDef(
    "m05_payload_dedup",
    (sp, dir) => {
      Multimodal.withPayload(Tables(sp, dir, "documents"), "text")
        .select(col("doc_id"), sha2(col("payload"), 256).as("digest"),
          length(col("payload")).cast("long").as("n_bytes"))
        .groupBy("digest")
        .agg(min(col("doc_id")).as("rep_id"),
          count(lit(1)).as("n_copies"),
          min(col("n_bytes")).as("n_bytes"))
        .select("rep_id", "n_copies", "n_bytes", "digest")
        .orderBy("rep_id")
    },
    Some("""
      SELECT MIN(doc_id) AS rep_id, COUNT(*) AS n_copies,
        CAST(MIN(octet_length(encode(text))) AS BIGINT) AS n_bytes,
        sha256(text) AS digest
      FROM documents GROUP BY sha256(text) ORDER BY rep_id"""))

  /** Record-container round trip: payloads packed into length-prefixed
    * shard blobs ([[Multimodal.packRecords]] — the record-file framing
    * media corpora ship in), then unpacked by the streamed parser and
    * verified per record: byte length and a SHA-256 digest of the RAW
    * recovered bytes, both against the ORIGINAL documents in DuckDB —
    * a single corrupted length prefix or swapped record breaks the
    * digest. Hashing the binary column directly (not a decoded string)
    * is what makes this a true byte-integrity check: a string round
    * trip would fold invalid UTF-8 sequences to U+FFFD and silently
    * normalize exactly the corruption this query exists to catch.
    * Shards (doc_id mod 8 per source) bound every blob. */
  val m06 = QueryDef(
    "m06_record_unpack",
    (sp, dir) => {
      import sp.implicits._
      val docs = Multimodal.withPayload(Tables(sp, dir, "documents"), "text")
        .withColumn("shard", pmod(col("doc_id"), lit(8L)))
      val packed = Multimodal.packRecords(docs, "source", "shard",
        "doc_id", "payload").as[Multimodal.PackedShard]
      Multimodal.unpackRecords(packed).toDF()
        .select(col("source"), col("shard"), col("rec_idx"),
          length(col("rec")).cast("int").as("rec_len"),
          sha2(col("rec"), 256).as("rec_digest"))
        .orderBy("source", "shard", "rec_idx")
    },
    Some("""
      WITH r AS (SELECT source, doc_id % 8 AS shard, text,
          CAST(ROW_NUMBER() OVER (PARTITION BY source, doc_id % 8
            ORDER BY doc_id) - 1 AS INT) AS rec_idx
        FROM documents)
      SELECT source, CAST(shard AS BIGINT) AS shard, rec_idx,
        CAST(octet_length(encode(text)) AS INT) AS rec_len,
        sha256(text) AS rec_digest
      FROM r ORDER BY source, shard, rec_idx"""))

  /** Shard-packing manifest (webdataset-style): binary payloads are
    * assigned to size-bounded shards by the same greedy cumulative
    * split p03 uses for tokens ([[graft.operators.Pipeline
    * .packSequences]] over BYTE lengths, 4 KiB bins, doc order), and
    * the output is the per-shard MANIFEST — record count, byte total,
    * id span — the index a training loader reads instead of listing
    * the archive. A payload longer than its bin's remainder spills
    * (bin fill can exceed the nominal cap, never splits a record) —
    * same contract as p03/p15, mirrored in the oracle's window. */
  val m07 = QueryDef(
    "m07_shard_manifest",
    (sp, dir) => {
      val docs = Multimodal
        .withPayload(Tables(sp, dir, "documents"), "text")
        .select(col("doc_id"), col("source"),
          length(col("payload")).cast("long").as("n_bytes"))
      graft.operators.Pipeline.packSequences(docs, "source", "doc_id",
          "n_bytes", maxTokens = 4096)
        .groupBy(col("source"), col("bin_id").as("shard"))
        .agg(count(lit(1)).as("n_records"),
          sum(col("n_bytes")).as("shard_bytes"),
          min(col("doc_id")).as("first_doc"),
          max(col("doc_id")).as("last_doc"))
        .orderBy("source", "shard")
    },
    Some("""
      WITH sized AS (
        SELECT doc_id, source,
          CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        FROM documents),
      packed AS (
        SELECT doc_id, source, n_bytes,
          CAST(floor(COALESCE(SUM(n_bytes) OVER (
            PARTITION BY source ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 4096.0)
            AS BIGINT) AS shard
        FROM sized)
      SELECT source, shard, COUNT(*) AS n_records,
        CAST(SUM(n_bytes) AS BIGINT) AS shard_bytes,
        MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
      FROM packed GROUP BY source, shard
      ORDER BY source, shard"""))

  /** Bitrot / corruption scan: every payload travels with its SHA-256
    * content digest; a transport fault (here: a byte appended to every
    * 17th payload) must be caught by recomputing the digest at the
    * destination — the periodic integrity pass every content-addressed
    * blob store runs. The Spark side verifies REAL digests over the
    * corrupted bytes; the oracle states the ground truth (exactly the
    * doc_id ≡ 0 mod 17 rows mismatch) — any hash collision, missed
    * corruption, or false alarm breaks the match. Per-row kernels +
    * one aggregate: scales as a single scan. */
  val m08 = QueryDef(
    "m08_corruption_scan",
    (sp, dir) => {
      val base = Multimodal.withPayload(Tables(sp, dir, "documents"), "text")
        .select(col("doc_id"), col("source"), col("payload"),
          sha2(col("payload"), 256).as("stored_digest"))
      val transported = base.withColumn("payload",
        when(col("doc_id") % 17 === 0,
          concat(col("payload"), lit("X").cast("binary")))
          .otherwise(col("payload")))
      transported
        .withColumn("ok", sha2(col("payload"), 256) === col("stored_digest"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_payloads"),
          sum(when(col("ok"), 0L).otherwise(1L)).as("n_corrupt"),
          min(when(!col("ok"), col("doc_id"))).as("first_corrupt"))
        .orderBy("source")
    },
    Some("""
      SELECT source, COUNT(*) AS n_payloads,
        CAST(SUM(CASE WHEN doc_id % 17 = 0 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_corrupt,
        MIN(CASE WHEN doc_id % 17 = 0 THEN doc_id END) AS first_corrupt
      FROM documents GROUP BY source ORDER BY source"""))

  /** Payload size distribution in power-of-two buckets — the storage
    * planner's histogram (which sizes dominate; what a shard/chunk
    * cap should be). The log2 bucket is the INTEGER identity
    * `length(bin(n))` = ⌊log2 n⌋ + 1 — no floating log (libm drift),
    * both engines render the same binary string. */
  val m09 = QueryDef(
    "m09_size_histogram",
    (sp, dir) => {
      Multimodal.withPayload(Tables(sp, dir, "documents"), "text")
        .select(length(col("payload")).cast("long").as("n_bytes"))
        .filter(col("n_bytes") > 0)
        .withColumn("log2_bucket", length(bin(col("n_bytes"))) - 1)
        .groupBy("log2_bucket")
        .agg(count(lit(1)).as("n_payloads"),
          sum(col("n_bytes")).as("sum_bytes"),
          min(col("n_bytes")).as("min_bytes"),
          max(col("n_bytes")).as("max_bytes"))
        .orderBy("log2_bucket")
    },
    Some("""
      WITH b AS (
        SELECT CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        FROM documents
        WHERE octet_length(encode(text)) > 0)
      SELECT CAST(length(bin(n_bytes)) - 1 AS INT) AS log2_bucket,
        COUNT(*) AS n_payloads,
        CAST(SUM(n_bytes) AS BIGINT) AS sum_bytes,
        MIN(n_bytes) AS min_bytes, MAX(n_bytes) AS max_bytes
      FROM b GROUP BY 1 ORDER BY log2_bucket"""))

  val defs: Seq[QueryDef] = Seq(m01, m02, m03, m04, m05, m06, m07, m08,
    m09)
}
