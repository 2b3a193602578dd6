package graft.queries

import graft.{QueryDef, Tables}
import graft.functions.{Hash62Expr, HashFunctions, TextFunctions}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import TextFunctions._

/** Text-analysis suite over the documents table (SURVEY.md §2 rows
  * 35–39). All per-row codegen'd expressions — a single scan, no
  * shuffle except the final order/aggregation.
  */
object TextQueries {

  private def markerSqlList(markers: Seq[String]): String =
    markers.map(m => s"'$m'").mkString("[", ", ", "]")

  private def scoreSql(lang: String, markers: Seq[String]): String =
    s"CAST(len(list_filter(string_split(text, ' '), w -> list_contains(${markerSqlList(markers)}, w))) AS INT) AS s_$lang"

  /** Stopword-score language identification. */
  val t01 = QueryDef(
    "t01_langid",
    (sp, dir) => {
      val toks = tokens(col("text"))
      val scored = Tables(sp, dir, "documents").select(
        col("doc_id") +: langMarkers.map { case (lang, m) =>
          markerScore(toks, m).as(s"s_$lang")
        }: _*)
      scored
        .withColumn("predicted", langidPredict(
          langMarkers.map { case (lang, _) => lang -> col(s"s_$lang") }))
        .orderBy("doc_id")
    },
    Some {
      val scores = langMarkers.map { case (l, m) => scoreSql(l, m) }.mkString(",\n        ")
      val best = langMarkers.map { case (l, _) => s"s_$l" }.mkString("GREATEST(", ", ", ")")
      val cases = langMarkers.map { case (l, _) =>
        s"WHEN s_$l = best AND s_$l > 0 THEN '$l'"
      }.mkString(" ")
      s"""
      WITH scored AS (
        SELECT doc_id,
        $scores
        FROM documents),
      withbest AS (SELECT *, $best AS best FROM scored)
      SELECT doc_id, s_en, s_de, s_fr, s_es,
        CASE $cases ELSE 'und' END AS predicted
      FROM withbest ORDER BY doc_id"""
    })

  /** Quality scoring: length/punctuation/stopword signals combined
    * into one score, all in identical IEEE double arithmetic. */
  val t02 = QueryDef(
    "t02_quality_score",
    (sp, dir) => {
      val toks = tokens(col("text"))
      val enStops = langMarkers.head._2
      Tables(sp, dir, "documents")
        .select(col("doc_id"),
          length(col("text")).cast("int").as("n_chars"),
          size(toks).cast("int").as("n_tokens"),
          punctCount(col("text")).as("punct_n"),
          markerScore(toks, enStops).as("stop_n"))
        .withColumn("quality",
          // try_divide: an empty doc (n_chars = 0) must yield NULL like
          // DuckDB's x/0, not an ANSI divide-by-zero error
          lit(0.5) * least(col("n_tokens") / lit(50.0), lit(1.0)) +
            lit(0.3) * try_divide(col("stop_n"), col("n_tokens").cast("double")) +
            lit(0.2) * (lit(1.0) - try_divide(col("punct_n"), col("n_chars").cast("double"))))
        .orderBy("doc_id")
    },
    Some(s"""
      WITH base AS (
        SELECT doc_id,
          CAST(len(text) AS INT) AS n_chars,
          CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
          CAST(len(text) - len(regexp_replace(text, '[.,;:!?]', '', 'g')) AS INT) AS punct_n,
          CAST(len(list_filter(string_split(text, ' '), w -> list_contains(${markerSqlList(langMarkers.head._2)}, w))) AS INT) AS stop_n
        FROM documents)
      SELECT doc_id, n_chars, n_tokens, punct_n, stop_n,
        0.5 * LEAST(n_tokens / 50.0, 1.0)
          + 0.3 * (stop_n / CAST(n_tokens AS DOUBLE))
          + 0.2 * (1.0 - punct_n / CAST(n_chars AS DOUBLE)) AS quality
      FROM base ORDER BY doc_id"""))

  /** Token counting: whitespace vs BPE-ish regex tokenization. */
  val t03 = QueryDef(
    "t03_token_count",
    (sp, dir) => {
      Tables(sp, dir, "documents")
        .select(col("doc_id"),
          size(tokens(col("text"))).cast("int").as("ws_tokens"),
          regexTokenCount(col("text")).as("re_tokens"),
          length(col("text")).cast("int").as("n_chars"))
        .withColumn("chars_per_token",
          // NULL (not ANSI error) when an empty doc has zero regex tokens
          try_divide(col("n_chars").cast("double"), col("re_tokens")))
        .orderBy("doc_id")
    },
    Some("""
      SELECT doc_id,
        CAST(len(string_split(text, ' ')) AS INT) AS ws_tokens,
        CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS INT) AS re_tokens,
        CAST(len(text) AS INT) AS n_chars,
        CAST(len(text) AS DOUBLE)
          / len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS chars_per_token
      FROM documents ORDER BY doc_id"""))

  /** Rolling polynomial-hash document fingerprint (HashFunctions —
    * explicit integer arithmetic, engine-portable). */
  val t04 = QueryDef(
    "t04_fingerprint",
    (sp, dir) => {
      Tables(sp, dir, "documents")
        .select(col("doc_id"),
          graft.functions.PolyHashExpr(col("text"), 31L).as("fingerprint"))
        .orderBy("doc_id")
    },
    Some("""
      SELECT doc_id,
        CAST(list_reduce(
          list_prepend(CAST(0 AS BIGINT),
            list_transform(generate_series(1, CAST(len(text) AS INT)),
                           i -> CAST(ascii(substr(text, i, 1)) AS BIGINT))),
          (acc, x) -> (acc * 31 + x) % 2147483647) AS BIGINT) AS fingerprint
      FROM documents ORDER BY doc_id"""))

  /** Corpus word-frequency top-k. */
  val t05 = QueryDef(
    "t05_word_freq",
    (sp, dir) => {
      Tables(sp, dir, "documents")
        .select(explode(tokens(col("text"))).as("word"))
        .filter(col("word") =!= "")
        .groupBy("word")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("word"))
        .limit(25)
    },
    Some("""
      SELECT word, COUNT(*) AS n FROM (
        SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      WHERE word <> ''
      GROUP BY word ORDER BY n DESC, word LIMIT 25"""))

  /** DuckDB mirror of [[HashFunctions.hash62]] over a string-valued
    * SQL expression (the t15 inline pattern, factored for reuse). */
  private def duckHash62(s: String): String =
    s"""(list_reduce(list_prepend(CAST(0 AS BIGINT),
       |    list_transform(generate_series(1, CAST(len($s) AS INT)),
       |      i -> CAST(ascii(substr($s, i, 1)) AS BIGINT))),
       |    (a, b) -> (a * 31 + b) % 2147483647)
       |  + (list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(generate_series(1, CAST(len($s) AS INT)),
       |        i -> CAST(ascii(substr($s, i, 1)) AS BIGINT))),
       |      (a, b) -> (a * 131 + b) % 2147483647) << 31))""".stripMargin

  /** t06's hash-keyed pipeline with the count threshold exposed:
    * TextSpec re-runs it at sf0.001 with a low threshold against a
    * string-keyed reference, keeping an INDEPENDENT identity check
    * alive now that the DuckDB oracle mirrors the 62-bit hashing. */
  private[graft] def collocations(
      docs: org.apache.spark.sql.DataFrame,
      minCount: Long): org.apache.spark.sql.DataFrame = {
    import graft.functions.ShingleHashes
    // Pass 1 never materializes a bigram string: the fused kernel
    // emits one 62-bit hash per occurrence straight off the text
    // bytes, and only those 8-byte values explode and shuffle.
    val biCounts = docs
      .select(explode(ShingleHashes(col("text"), 2, dedupe = false)).as("hb"))
      .groupBy("hb").agg(count(lit(1)).as("c_xy"))
      .filter(col("c_xy") >= minCount)
    val survivors = docs
      .select(explode(wordShingles(tokens(col("text")), 2)).as("bigram"))
      .select(Hash62Expr(col("bigram")).as("hb"), col("bigram"))
      .join(broadcast(biCounts), "hb")
      .groupBy("hb", "c_xy").agg(min("bigram").as("bigram"))
    val uniCounts = docs
      .select(explode(ShingleHashes(col("text"), 1, dedupe = false)).as("hw"))
      .groupBy("hw").agg(count(lit(1)).as("c_x"))
    uniCounts
      .join(broadcast(survivors.withColumn("hw",
        Hash62Expr(substring_index(col("bigram"), " ", 1)))), "hw")
      .select(col("bigram"), col("c_xy"), col("c_x"),
        (col("c_xy").cast("double") / col("c_x")).as("cond_prob"))
      .orderBy(col("cond_prob").desc, col("bigram"))
      .limit(25)
  }

  /** Collocation mining: corpus bigram statistics scored by forward
    * association P(w2|w1) = c(w1 w2)/c(w1). Integer counts plus ONE
    * IEEE double division — engine-portable without logs (PMI ranking
    * by lift needs no logarithm: log is monotone).
    *
    * Scale shape (the d01/t15 lesson, applied after r7 flagged the
    * 28 s string-keyed form): both aggregations group on the 62-bit
    * polynomial hash — 8-byte shuffle keys via the codegen'd
    * [[Hash62Expr]] kernel (byte-level ≡ the oracle's ascii() fold on
    * this ASCII corpus, d01's declared precedent), the strings dropped
    * at the scan projection — then example strings are re-attached ONLY for
    * the ≥20 survivors via a second map-only pass filtered by a
    * broadcast of the survivor hashes. The broadcast is the frequent-
    * bigram heavy-hitter set, bounded by the count threshold (raise
    * the threshold with corpus size — it is a relative-frequency knob);
    * the only string shuffle left is the survivors' min-example
    * aggregate. The oracle mirrors the hashing exactly, so even a
    * 62-bit collision (merging two bigrams' counts) stays hash-equal. */
  val t06 = QueryDef(
    "t06_collocations",
    (sp, dir) => collocations(Tables(sp, dir, "documents"), minCount = 20L),
    Some(s"""
      WITH toks AS (SELECT string_split(text, ' ') w FROM documents),
      bi AS (SELECT unnest(CASE WHEN len(w) < 2 THEN []
               ELSE list_transform(generate_series(1, CAST(len(w) - 1 AS INT)),
                      i -> w[i] || ' ' || w[i+1]) END) AS bigram
             FROM toks),
      bh AS (SELECT bigram, ${duckHash62("bigram")} AS hb FROM bi),
      bc AS (SELECT hb, CAST(COUNT(*) AS BIGINT) AS c_xy,
               MIN(bigram) AS bigram
             FROM bh GROUP BY hb HAVING COUNT(*) >= 20),
      un AS (SELECT unnest(w) AS w1 FROM toks),
      uh AS (SELECT ${duckHash62("w1")} AS hw, CAST(COUNT(*) AS BIGINT) AS c_x
             FROM un GROUP BY 1),
      bw AS (SELECT bigram, c_xy,
               ${duckHash62("split_part(bigram, ' ', 1)")} AS hw
             FROM bc)
      SELECT bigram, c_xy, c_x, CAST(c_xy AS DOUBLE) / c_x AS cond_prob
      FROM bw JOIN uh USING (hw)
      ORDER BY cond_prob DESC, bigram LIMIT 25"""))

  /** Readability scoring (ARI formula over chars/words/sentences):
    * per-row codegen'd arithmetic, one scan, no shuffle before the
    * output sort. Portability: both divisions are single IEEE ops on
    * exact integers and the 4.71/0.5/21.43 literals parse to the same
    * binary64 in both engines, so the double chain is bit-identical;
    * `try_divide` mirrors DuckDB's NULL on a sentence-less doc. */
  val t07 = QueryDef(
    "t07_readability",
    (sp, dir) => {
      Tables(sp, dir, "documents")
        .select(col("doc_id"),
          length(col("text")).cast("long").as("n_chars_txt"),
          size(split(col("text"), " ")).cast("long").as("n_words"),
          (length(col("text")) -
            length(expr("replace(text, '.', '')"))).cast("long").as("n_sentences"))
        .withColumn("ari",
          lit(4.71) * expr("try_divide(n_chars_txt, n_words)")
            + lit(0.5) * expr("try_divide(n_words, n_sentences)")
            - lit(21.43))
        .withColumn("band",
          when(col("ari").isNull, "unscored")
            .when(col("ari") < 8, "easy")
            .when(col("ari") < 12, "medium")
            .otherwise("hard"))
        .orderBy("doc_id")
    },
    Some("""
      WITH t AS (
        SELECT doc_id,
          CAST(length(text) AS BIGINT) AS n_chars_txt,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
          CAST(length(text) - length(replace(text, '.', '')) AS BIGINT)
            AS n_sentences
        FROM documents),
      s AS (
        SELECT *, 4.71 * (n_chars_txt / n_words)
                + 0.5 * (n_words / n_sentences) - 21.43 AS ari
        FROM t)
      SELECT doc_id, n_chars_txt, n_words, n_sentences, ari,
        CASE WHEN ari IS NULL THEN 'unscored'
             WHEN ari < 8 THEN 'easy'
             WHEN ari < 12 THEN 'medium'
             ELSE 'hard' END AS band
      FROM s ORDER BY doc_id"""))

  /** Character-trigram language profile — the classic n-gram feature
    * table a fastText-style language identifier trains on: the top 10
    * trigrams per language with corpus counts. One scan; the explode
    * fans each doc into length-2 trigram rows but the shuffle carries
    * only (lang, trigram) compact keys, and the per-lang top-k is a
    * rank-window cut over the aggregated (not raw) rows. */
  val t08 = QueryDef(
    "t08_char_ngrams",
    (sp, dir) => {
      val tri = Tables(sp, dir, "documents")
        .select(col("lang"),
          explode(
            when(length(col("text")) < 3, array().cast("array<string>"))
              .otherwise(transform(
                sequence(lit(1), length(col("text")) - lit(2)),
                i => col("text").substr(i, lit(3))))).as("trigram"))
      val counted = tri.groupBy("lang", "trigram")
        .agg(count(lit(1)).as("n"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy(col("n").desc, col("trigram"))
      counted.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 10)
        .select(col("lang"), col("trigram"), col("n"),
          col("rank").cast("int").as("rank"))
        .orderBy("lang", "rank")
    },
    Some("""
      WITH tri AS (
        SELECT lang, unnest(CASE WHEN length(text) < 3 THEN []
          ELSE list_transform(generate_series(1, CAST(length(text) - 2 AS INT)),
                 i -> text[i:i+2]) END) AS trigram
        FROM documents),
      c AS (SELECT lang, trigram, COUNT(*) AS n FROM tri
            GROUP BY lang, trigram),
      r AS (SELECT lang, trigram, CAST(n AS BIGINT) AS n,
              ROW_NUMBER() OVER (PARTITION BY lang
                ORDER BY n DESC, trigram) AS rank
            FROM c)
      SELECT lang, trigram, n, CAST(rank AS INT) AS rank
      FROM r WHERE rank <= 10 ORDER BY lang, rank"""))

  /** Corpus novelty scoring: the fraction of each doc's trigram
    * shingles that appear in ANY other doc — the redundancy signal a
    * curation pipeline thresholds on before paying for near-dup
    * resolution. One shingle shuffle for the document frequencies,
    * one join back; the ratio is a single integer-over-integer double
    * division (NULL for docs too short to shingle). Shares the d04
    * shingle kernel, so the oracle reuses the same SQL chain. */
  val t09 = QueryDef(
    "t09_novelty",
    (sp, dir) => {
      val docs = Tables(sp, dir, "documents")
      val sh = graft.operators.Dedup.shingleHashSet(docs, "doc_id", "text", 3)
      val dfh = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
      val per = sh.join(dfh, "shingle")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_shingles"),
          sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_shared"))
      docs.select("doc_id").join(per, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
          coalesce(col("n_shared"), lit(0L)).as("n_shared"),
          when(col("n_shingles") > 0,
            col("n_shared") / col("n_shingles")).as("shared_ratio"))
        .orderBy("doc_id")
    },
    Some(s"""
      WITH ${graft.queries.DedupQueries.shingleHashSql},
      dfh AS (SELECT h, COUNT(*) AS df FROM hs GROUP BY h),
      per AS (SELECT doc_id, COUNT(*) AS n_shingles,
                SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS n_shared
              FROM hs JOIN dfh USING (h) GROUP BY doc_id)
      SELECT d.doc_id,
        CAST(COALESCE(per.n_shingles, 0) AS BIGINT) AS n_shingles,
        CAST(COALESCE(per.n_shared, 0) AS BIGINT) AS n_shared,
        CASE WHEN per.n_shingles > 0
             THEN CAST(per.n_shared AS DOUBLE) / per.n_shingles END
          AS shared_ratio
      FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
      ORDER BY d.doc_id"""))

  /** Per-language vocabulary statistics: token volume, vocabulary
    * size, hapax legomena (words occurring exactly once in the
    * language's slice), type-token ratio and hapax share — the
    * corpus-linguistics health report, chosen over a Zipf-slope fit
    * because ln() is NOT bit-portable across engines (libm vs JVM
    * differ in the last ulp) while these are exact integers plus two
    * double divisions. One word-keyed aggregation with map-side
    * combine; shuffle follows vocabulary size, not corpus size. */
  val t10 = QueryDef(
    "t10_vocab_stats",
    (sp, dir) => {
      val wc = Tables(sp, dir, "documents")
        .select(col("lang"), explode(tokens(col("text"))).as("word"))
        .filter(col("word") =!= "")
        .groupBy("lang", "word").agg(count(lit(1)).as("n"))
      wc.groupBy("lang")
        .agg(sum(col("n")).as("n_tokens"),
          count(lit(1)).as("vocab"),
          sum(when(col("n") === 1, 1L).otherwise(0L)).as("hapax"))
        .withColumn("type_token_ratio", col("vocab") / col("n_tokens"))
        .withColumn("hapax_share", col("hapax") / col("vocab"))
        .orderBy("lang")
    },
    Some("""
      WITH wc AS (
        SELECT lang, word, COUNT(*) AS n FROM (
          SELECT lang, unnest(string_split(text, ' ')) AS word
          FROM documents)
        WHERE word <> ''
        GROUP BY lang, word)
      SELECT lang, CAST(SUM(n) AS BIGINT) AS n_tokens,
        CAST(COUNT(*) AS BIGINT) AS vocab,
        CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
        CAST(COUNT(*) AS DOUBLE) / SUM(n) AS type_token_ratio,
        CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
          AS hapax_share
      FROM wc GROUP BY lang ORDER BY lang"""))

  /** HTML strip + link extraction — the scraper's first transform:
    * raw fetched markup → clean text + outlink count + title. Markup
    * is synthesized deterministically around each document (title tag,
    * body paragraph, `doc_id mod 4` trailing anchors) so every
    * structural element the stripper must handle is present; the
    * strip itself is pure regex kernels (tags → space, whitespace
    * squeeze, trim) and the link count is the occurrence-count
    * identity `(len − len(without 'href=')) / 5` — no UDF, all
    * codegen. Cleaning 100 TB of crawl HTML is exactly this shape:
    * one scan, per-row string kernels, no shuffle at all before the
    * output sort. */
  val t11 = QueryDef(
    "t11_html_strip",
    (sp, dir) => {
      val html = concat(
        lit("<html><head><title>Doc "), col("doc_id").cast("string"),
        lit("</title></head><body><p>"), col("text"), lit("</p>"),
        expr("repeat('<a href=\"/d/0\">next</a>', CAST(doc_id % 4 AS INT))"),
        lit("</body></html>"))
      Tables(sp, dir, "documents")
        .select(col("doc_id"), html.as("html"))
        .select(col("doc_id"),
          regexp_extract(col("html"), "<title>([^<]*)</title>", 1).as("title"),
          ((length(col("html")) -
            length(regexp_replace(col("html"), "href=", ""))) / 5)
            .cast("long").as("n_links"),
          length(trim(regexp_replace(
            regexp_replace(col("html"), "<[^>]*>", " "), "  +", " ")))
            .as("stripped_len"))
        .orderBy("doc_id")
    },
    Some("""
      WITH h AS (
        SELECT doc_id,
          '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) ||
          '</title></head><body><p>' || text || '</p>' ||
          repeat('<a href="/d/0">next</a>', CAST(doc_id % 4 AS INT)) ||
          '</body></html>' AS html
        FROM documents)
      SELECT doc_id,
        regexp_extract(html, '<title>([^<]*)</title>', 1) AS title,
        CAST((length(html) -
              length(regexp_replace(html, 'href=', '', 'g'))) / 5
          AS BIGINT) AS n_links,
        CAST(length(trim(regexp_replace(
          regexp_replace(html, '<[^>]*>', ' ', 'g'), '  +', ' ', 'g')))
          AS INT) AS stripped_len
      FROM h ORDER BY doc_id"""))

  /** Script-mix profile: per language, the corpus share of
    * non-printable-ASCII BYTES — the cheap writing-system signal that
    * separates CJK text from Latin-script languages without any
    * unicode tables. Byte (not codepoint) arithmetic on both engines:
    * Spark's length() counts UTF-16 units while DuckDB's counts
    * codepoints, so the portable measure is octet length of the
    * UTF-8 encoding. Two exact integer sums per group + one double
    * division. */
  val t12 = QueryDef(
    "t12_script_mix",
    (sp, dir) => {
      val asciiStripped = regexp_replace(col("text"), "[ -~]", "")
      Tables(sp, dir, "documents")
        .select(col("lang"),
          length(col("text").cast("binary")).cast("long").as("n_bytes"),
          length(asciiStripped.cast("binary")).cast("long")
            .as("n_nonascii_bytes"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_bytes")).as("total_bytes"),
          sum(col("n_nonascii_bytes")).as("nonascii_bytes"))
        .withColumn("nonascii_share",
          col("nonascii_bytes").cast("double") /
            col("total_bytes").cast("double"))
        .orderBy("lang")
    },
    Some("""
      WITH b AS (
        SELECT lang,
          CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
          CAST(octet_length(encode(
            regexp_replace(text, '[ -~]', '', 'g'))) AS BIGINT)
            AS n_nonascii_bytes
        FROM documents)
      SELECT lang, COUNT(*) AS n_docs,
        CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
        CAST(SUM(n_nonascii_bytes) AS BIGINT) AS nonascii_bytes,
        CAST(SUM(n_nonascii_bytes) AS DOUBLE) / CAST(SUM(n_bytes) AS DOUBLE)
          AS nonascii_share
      FROM b GROUP BY lang ORDER BY lang"""))

  /** Sentence-level dedup (C4-style): documents split into sentences
    * ('. ' boundary), each normalized and 62-bit dual-poly-hashed;
    * a sentence is "shared" when its hash occurs in more than one
    * document — the granularity C4's cleaning made famous, between
    * d01's whole-doc and d13's fixed 16-word blocks. The shuffle
    * carries 8-byte hash keys (d01's lesson), and per-doc shares are
    * one double division. */
  val t13 = QueryDef(
    "t13_sentence_dedup",
    (sp, dir) => {
      val docs = Tables(sp, dir, "documents")
      val sents = docs
        .select(col("doc_id"), explode(split(col("text"), "\\. ")).as("s0"))
        .select(col("doc_id"), lower(trim(col("s0"))).as("s"))
        .filter(length(col("s")) > 0)
        .select(col("doc_id"),
          (graft.functions.PolyHashExpr(col("s"), 31L) +
            shiftleft(graft.functions.PolyHashExpr(col("s"), 131L), 31))
            .as("h"))
      val df = sents.groupBy("h")
        .agg(countDistinct(col("doc_id")).as("docs_with"))
      val per = sents.join(df, "h")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_sentences"),
          sum(when(col("docs_with") >= 2, 1L).otherwise(0L))
            .as("n_shared_sentences"))
      docs.select("doc_id").join(per, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_sentences"), lit(0L)).as("n_sentences"),
          coalesce(col("n_shared_sentences"), lit(0L))
            .as("n_shared_sentences"),
          when(col("n_sentences") > 0,
            col("n_shared_sentences") / col("n_sentences"))
            .as("shared_share"))
        .orderBy("doc_id")
    },
    Some(s"""
      WITH sent AS (
        SELECT doc_id, lower(trim(s0)) AS s
        FROM (SELECT doc_id, unnest(string_split(text, '. ')) AS s0
              FROM documents)
        WHERE length(lower(trim(s0))) > 0),
      hs AS (SELECT doc_id,
          ${duckHash62("s")} AS h
        FROM sent),
      df AS (SELECT h, COUNT(DISTINCT doc_id) AS docs_with
             FROM hs GROUP BY h),
      per AS (SELECT doc_id, COUNT(*) AS n_sentences,
                SUM(CASE WHEN docs_with >= 2 THEN 1 ELSE 0 END)
                  AS n_shared_sentences
              FROM hs JOIN df USING (h) GROUP BY doc_id)
      SELECT d.doc_id,
        CAST(COALESCE(per.n_sentences, 0) AS BIGINT) AS n_sentences,
        CAST(COALESCE(per.n_shared_sentences, 0) AS BIGINT)
          AS n_shared_sentences,
        CASE WHEN per.n_sentences > 0
             THEN CAST(per.n_shared_sentences AS DOUBLE) / per.n_sentences
        END AS shared_share
      FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
      ORDER BY d.doc_id"""))

  /** Language-ID confusion matrix — t01's classifier EVALUATED against
    * the ground-truth lang column (the same in-catalog eval discipline
    * s06/s10/s12 apply to the ANN indexes): per (true, predicted)
    * cell counts and each cell's share of its true-language row. The
    * share window runs over ≤ |langs|² matrix rows. */
  val t14 = QueryDef(
    "t14_langid_confusion",
    (sp, dir) => {
      import org.apache.spark.sql.expressions.Window
      val toks = tokens(col("text"))
      val scored = Tables(sp, dir, "documents").select(
        col("lang").as("true_lang") +: langMarkers.map { case (l, m) =>
          markerScore(toks, m).as(s"s_$l")
        }: _*)
      val pred = scored.withColumn("predicted", langidPredict(
        langMarkers.map { case (l, _) => l -> col(s"s_$l") }))
      val w = Window.partitionBy("true_lang")
      pred.groupBy("true_lang", "predicted")
        .agg(count(lit(1)).as("n_docs"))
        .withColumn("row_share", col("n_docs").cast("double") /
          sum(col("n_docs")).over(w).cast("double"))
        .orderBy("true_lang", "predicted")
    },
    Some {
      val scores = langMarkers.map { case (l, m) => scoreSql(l, m) }
        .mkString(",\n        ")
      val best = langMarkers.map { case (l, _) => s"s_$l" }
        .mkString("GREATEST(", ", ", ")")
      val cases = langMarkers.map { case (l, _) =>
        s"WHEN s_$l = best AND s_$l > 0 THEN '$l'"
      }.mkString(" ")
      s"""
      WITH scored AS (
        SELECT doc_id, lang AS true_lang,
        $scores
        FROM documents),
      withbest AS (SELECT *, $best AS best FROM scored),
      pred AS (SELECT true_lang,
                 CASE $cases ELSE 'und' END AS predicted
               FROM withbest),
      cm AS (SELECT true_lang, predicted, CAST(COUNT(*) AS BIGINT) AS n_docs
             FROM pred GROUP BY true_lang, predicted)
      SELECT true_lang, predicted, n_docs,
        CAST(n_docs AS DOUBLE) /
          CAST(SUM(n_docs) OVER (PARTITION BY true_lang) AS DOUBLE)
          AS row_share
      FROM cm ORDER BY true_lang, predicted"""
    })

  /** Held-out LM novelty: hash-split the corpus 80/20 into train/eval
    * (p11's portable LCG split), build the train bigram vocabulary,
    * and score every eval document by its share of bigrams NEVER seen
    * in train — the out-of-vocabulary / distribution-shift signal an
    * n-gram language model would report as high perplexity, computed
    * here with exact integers only (no log(), which is not
    * bit-portable across libm implementations).
    *
    * Scale shape: bigrams join on their 62-bit polynomial hash, not
    * the string (the d01 lesson — 8-byte shuffle keys); the vocabulary
    * side is DISTINCT hashes, so the join's build side follows
    * vocabulary size, not corpus size; per-doc counts are map-side
    * combinable sums.
    */
  val t15 = QueryDef(
    "t15_unseen_ngrams",
    (sp, dir) => {
      val split = Tables(sp, dir, "documents")
        .select(col("doc_id"), col("text"),
          (graft.operators.Pipeline.idHash(col("doc_id")) % 1000 < 800)
            .as("is_train"))
      // fused per-occurrence kernel (t06's r8 treatment): one 62-bit
      // hash per bigram occurrence straight off the text bytes —
      // byte-level ≡ the oracle's ascii() fold on this ASCII corpus
      val bi = split.select(col("doc_id"), col("is_train"),
          explode(graft.functions.ShingleHashes(col("text"), 2,
            dedupe = false)).as("h"))
      val vocab = bi.filter(col("is_train")).select("h").distinct()
        .withColumn("seen", lit(1))
      bi.filter(!col("is_train"))
        .join(vocab, Seq("h"), "left_outer")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          sum(when(col("seen").isNull, 1L).otherwise(0L)).as("n_unseen"))
        .withColumn("unseen_ratio",
          col("n_unseen").cast("double") / col("n_bigrams").cast("double"))
        .orderBy("doc_id")
    },
    Some(s"""
      WITH toks AS (SELECT doc_id,
             ((doc_id % 2147483647) * 1103515245 + 12345) % 2147483647 % 1000 < 800
               AS is_train,
             string_split(text, ' ') w
           FROM documents),
      bg AS (SELECT doc_id, is_train, unnest(
               CASE WHEN len(w) < 2 THEN []
                    ELSE list_transform(generate_series(1, CAST(len(w) - 1 AS INT)),
                           i -> w[i] || ' ' || w[i+1]) END) AS s
             FROM toks),
      bh AS (SELECT doc_id, is_train,
               ${duckHash62("s")} AS h
             FROM bg),
      vocab AS (SELECT DISTINCT h FROM bh WHERE is_train)
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        CAST(SUM(CASE WHEN vocab.h IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS n_unseen,
        CAST(SUM(CASE WHEN vocab.h IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
          / CAST(COUNT(*) AS DOUBLE) AS unseen_ratio
      FROM bh LEFT JOIN vocab ON bh.h = vocab.h
      WHERE NOT bh.is_train
      GROUP BY doc_id ORDER BY doc_id"""))

  /** Benchmark decontamination, pair-evidence form — p08's per-doc
    * trigram flag upgraded to the audit-grade report: WHICH eval doc
    * leaked into WHICH train doc, with 8-gram evidence counts
    * (8 tokens is the standard contamination n-gram length; only
    * near-verbatim passages survive it, so hits are real leaks, not
    * phrase coincidences — p08's n=3 needs its ≥5-shingle threshold
    * for the same reason).
    *
    * Scale shape: the eval side of a real deployment is a few
    * benchmarks — its distinct 8-gram hash set is tiny next to a
    * 100 TB train corpus. So the join is built eval-side: a bounded
    * Bloom filter over the eval hashes ([[graft.operators.BloomSemi]],
    * 128 KiB whatever the corpus size) prunes the train side AT THE
    * SCAN, before any exchange — only ~fpp of clean train 8-grams
    * ever shuffle — and the exact hash join then keeps the result
    * precise (no false negatives by construction, false positives
    * die in the join). 8-byte hash keys throughout (the d01/t15
    * lesson); per-pair counts are map-side combinable. */
  val t16 = QueryDef(
    "t16_decontamination",
    (sp, dir) => {
      val split = Tables(sp, dir, "documents")
        .select(col("doc_id"), col("text"),
          (graft.operators.Pipeline.idHash(col("doc_id")) % 1000 < 800)
            .as("is_train"))
      graft.operators.Decontaminate.report(
          split.filter(col("is_train")), split.filter(!col("is_train")),
          "doc_id", "text", n = 8)
        .orderBy("train_id", "eval_id")
    },
    Some {
      val gram8 = (0 until 8).map(j => s"w[i+$j]").mkString(" || ' ' || ")
      s"""
      WITH toks AS (SELECT doc_id,
             ((doc_id % 2147483647) * 1103515245 + 12345) % 2147483647 % 1000 < 800
               AS is_train,
             string_split(text, ' ') w
           FROM documents),
      g AS (SELECT doc_id, is_train, unnest(list_distinct(
              CASE WHEN len(w) < 8 THEN []
                   ELSE list_transform(generate_series(1, CAST(len(w) - 7 AS INT)),
                          i -> $gram8) END)) AS s
            FROM toks),
      gh AS (SELECT doc_id, is_train, ${duckHash62("s")} AS h FROM g),
      tr AS (SELECT doc_id, h FROM gh WHERE is_train),
      ev AS (SELECT doc_id AS eval_id, h FROM gh WHERE NOT is_train),
      sizes AS (SELECT doc_id, COUNT(*) n FROM tr GROUP BY doc_id)
      SELECT t.doc_id AS train_id, e.eval_id,
        CAST(COUNT(*) AS BIGINT) AS n_shared,
        CAST(s.n AS BIGINT) AS n_train_ngrams,
        CAST(COUNT(*) AS DOUBLE) / s.n AS contamination
      FROM tr t JOIN ev e ON t.h = e.h JOIN sizes s ON t.doc_id = s.doc_id
      GROUP BY 1, 2, s.n ORDER BY train_id, eval_id"""
    })

  /** Per-document bigram perplexity against the corpus's own language
    * model — the CCNet-style quality filter (Wenzek et al. 2020): a
    * doc whose word sequences are improbable under the corpus bigram
    * LM (add-one smoothing, P(w2|w1) = (c(w1 w2)+1)/(c(w1)+V)) is
    * boilerplate, gibberish, or wrong-language, and perplexity
    * thresholds are the standard curation gate. Scale shape: every
    * count pipeline rides the fused [[graft.functions.ShingleHashes]]
    * kernel — only 8-byte per-occurrence hashes explode and shuffle
    * (the d01/t06 lesson); per-doc cells group on (doc_id, hb, hw)
    * compact keys; the per-doc state is bounded by the doc's own
    * distinct-bigram count (the doc is the unit of work). At real
    * scale the two count joins stay as shuffles only for the EXACT
    * form — a production variant prunes the LM to a top-V vocabulary
    * + OOV bucket and broadcasts it, turning the scoring pass into a
    * map-only scan.
    *
    * Determinism: the per-doc log-prob sum is an ORDERED fold over
    * (hb, hw)-sorted cells (the e35 χ² rule — an unordered double sum
    * differs in the last ulp between engines), each term is one
    * division + one log2 + one multiply on exact-integer-valued
    * doubles, and only the final avg/perplexity round to 4 decimals
    * (the q104 ln() concession: libm vs fdlibm may differ in the last
    * ulp of log2/pow; ~200 accumulated ulps is still 1e-12 relative —
    * far inside the rounding). */
  /** t17's scoring pipeline over an arbitrary (doc_id, text) frame —
    * factored so TextSpec can assert the LM semantics on synthetic
    * corpora (frequent-bigram docs score low perplexity, unique-
    * bigram docs high, bigram-less docs NULL). */
  def bigramPerplexity(
      docs0: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import graft.functions.ShingleHashes
    val docs = docs0.select(col("doc_id"), col("text"))
    val cx = docs
      .select(explode(ShingleHashes(col("text"), 1, dedupe = false)).as("hw"))
      .groupBy("hw").agg(count(lit(1)).as("c_x"))
    val vocab = cx.agg(count(lit(1)).as("vocab"))
      .withColumn("j", pmod(col("vocab"), lit(1L)))
    val cxy = docs
      .select(explode(ShingleHashes(col("text"), 2, dedupe = false)).as("hb"))
      .groupBy("hb").agg(count(lit(1)).as("c_xy"))
    val cells = docs
      .select(col("doc_id"),
        ShingleHashes(col("text"), 2, dedupe = false).as("hbs"),
        ShingleHashes(col("text"), 1, dedupe = false).as("hws"))
      .select(col("doc_id"), col("hbs"),
        slice(col("hws"), lit(1), size(col("hbs"))).as("hws"))
      .select(col("doc_id"),
        explode(arrays_zip(col("hbs"), col("hws"))).as("z"))
      .select(col("doc_id"), col("z.hbs").as("hb"), col("z.hws").as("hw"))
      .groupBy("doc_id", "hb", "hw").agg(count(lit(1)).as("n"))
    val scored = cells
      .join(cxy, "hb").join(cx, "hw")
      .groupBy("doc_id")
      .agg(sum("n").as("n_bigrams"),
        array_sort(collect_list(struct(col("hb"), col("hw"), col("n"),
          col("c_xy"), col("c_x")))).as("cells"))
      .withColumn("j", pmod(col("doc_id"), lit(1L)))
      .join(broadcast(vocab), Seq("j"))
      .withColumn("sum_logp", aggregate(col("cells"), lit(0.0),
        (acc, x) => acc + x.getField("n").cast("double") *
          log2((x.getField("c_xy") + lit(1L)).cast("double") /
            (x.getField("c_x") + col("vocab")).cast("double"))))
    docs.select("doc_id").join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        round(col("sum_logp") / col("n_bigrams"), 4).as("avg_logp"),
        round(pow(lit(2.0), -col("sum_logp") / col("n_bigrams")), 4)
          .as("ppl"))
      .orderBy("doc_id")
  }

  val t17 = QueryDef(
    "t17_bigram_perplexity",
    (sp, dir) => bigramPerplexity(Tables(sp, dir, "documents")),
    Some(s"""
      WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      un AS (SELECT unnest(w) AS w1 FROM toks),
      cx AS (SELECT ${duckHash62("w1")} AS hw,
               CAST(COUNT(*) AS BIGINT) AS c_x
             FROM un GROUP BY 1),
      vocab AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM cx),
      bi AS (SELECT doc_id, unnest(CASE WHEN len(w) < 2 THEN []
               ELSE list_transform(generate_series(1, CAST(len(w) - 1 AS INT)),
                      i -> {'bg': w[i] || ' ' || w[i+1], 'w1': w[i]}) END) AS z
             FROM toks),
      bh AS (SELECT doc_id, ${duckHash62("z.bg")} AS hb,
               ${duckHash62("z.w1")} AS hw
             FROM bi),
      cxy AS (SELECT hb, CAST(COUNT(*) AS BIGINT) AS c_xy
              FROM bh GROUP BY 1),
      cells AS (SELECT doc_id, hb, hw, CAST(COUNT(*) AS BIGINT) AS n
                FROM bh GROUP BY 1, 2, 3),
      terms AS (SELECT c.doc_id, c.hb, c.hw, c.n, y.c_xy, x.c_x
                FROM cells c JOIN cxy y USING (hb) JOIN cx x USING (hw)),
      folded AS (
        SELECT t.doc_id, CAST(SUM(t.n) AS BIGINT) AS n_bigrams,
          list_reduce(list_prepend(0.0,
            list(CAST(t.n AS DOUBLE) *
                   log2(CAST(t.c_xy + 1 AS DOUBLE) /
                        CAST(t.c_x + v.v AS DOUBLE))
                 ORDER BY t.hb, t.hw)),
            (a, b) -> a + b) AS sum_logp
        FROM terms t CROSS JOIN vocab v GROUP BY 1)
      SELECT d.doc_id,
        COALESCE(f.n_bigrams, 0) AS n_bigrams,
        ROUND(f.sum_logp / f.n_bigrams, 4) AS avg_logp,
        ROUND(POWER(2.0, -(f.sum_logp / f.n_bigrams)), 4) AS ppl
      FROM documents d LEFT JOIN folded f USING (doc_id)
      ORDER BY d.doc_id"""))

  /** Per-language keyness: the top-10 most DISTINCTIVE words of each
    * language by the Rayson–Garside log-likelihood ratio (G² = 2·(a·
    * ln(a/E1) + b·ln(b/E2)) over the 2×2 word-vs-rest contingency
    * table) — the corpus-linguistics standard for "what vocabulary
    * characterizes this slice", and the building block for
    * domain/register drift reports between corpus shards.
    *
    * Scale shape: ONE wordcount shuffle on (lang, word) builds the
    * contingency cells; per-word totals re-aggregate from those cells
    * (no second corpus scan), per-language totals and the corpus total
    * are language-cardinality-sized and join broadcast; the top-10
    * window runs over the vocabulary-sized aggregate partitioned by
    * language — nothing after the first groupBy is
    * corpus-proportional.
    *
    * Determinism: a, b, n1, n2 are exact integers; each G² term's
    * argument is an exact-bigint ratio cast to double (products stay
    * under 2^53 through sf~100), ln is the only transcendental
    * (fixed a-term + b-term order, final round to 4 decimals — the
    * q104/t17 concession), ranking is round-then-rank with a word
    * tiebreak, and the over-representation predicate cross-multiplies
    * in exact integers (a·n2 > b·n1) so no double ever drives the
    * filter. */
  /** t18's scoring pipeline over an arbitrary (lang, text) frame —
    * factored so TextSpec can assert the G² semantics on synthetic
    * corpora (a word unique to one language tops its ranking; a
    * uniformly-spread word never passes the over-representation
    * filter). */
  def keyness(docs: org.apache.spark.sql.DataFrame,
      topK: Int = 10): org.apache.spark.sql.DataFrame = {
      val toks = docs
        .select(col("lang"), explode(split(col("text"), " ")).as("word"))
        .filter(col("word") =!= "")
      val cell = toks.groupBy("lang", "word").agg(count(lit(1)).as("a"))
      val wordTot = cell.groupBy("word").agg(sum("a").as("cw"))
      val langTot = cell.groupBy("lang").agg(sum("a").as("n1"))
      val total = langTot.agg(sum("n1").as("n"))
        .withColumn("j", pmod(col("n"), lit(1L)))
      val j = cell.join(wordTot, "word")
        .join(broadcast(langTot), "lang")
        .withColumn("j", pmod(col("a"), lit(1L)))
        .join(broadcast(total), "j")
        .withColumn("b", col("cw") - col("a"))
        .withColumn("n2", col("n") - col("n1"))
      val aT = when(col("a") > 0,
        col("a").cast("double") *
          log((col("a") * col("n")).cast("double") /
            (col("n1") * col("cw")).cast("double"))).otherwise(lit(0.0))
      val bT = when(col("b") > 0,
        col("b").cast("double") *
          log((col("b") * col("n")).cast("double") /
            (col("n2") * col("cw")).cast("double"))).otherwise(lit(0.0))
      val scored = j
        .filter(col("a") * col("n2") > col("b") * col("n1"))
        .withColumn("g2", round(lit(2.0) * (aT + bT), 4))
      val w = Window.partitionBy("lang").orderBy(col("g2").desc, col("word"))
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= topK)
        .select(col("lang"), col("word"), col("a").as("lang_count"),
          col("b").as("rest_count"), col("g2"), col("rank").cast("int"))
        .orderBy("lang", "rank")
  }

  val t18 = QueryDef(
    "t18_keyness",
    (sp, dir) => keyness(Tables(sp, dir, "documents")),
    Some("""
      WITH toks AS (
        SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents),
      tk AS (SELECT lang, word FROM toks WHERE word <> ''),
      cell AS (SELECT lang, word, CAST(COUNT(*) AS BIGINT) AS a
               FROM tk GROUP BY 1, 2),
      wt AS (SELECT word, CAST(SUM(a) AS BIGINT) AS cw FROM cell GROUP BY 1),
      lt AS (SELECT lang, CAST(SUM(a) AS BIGINT) AS n1 FROM cell GROUP BY 1),
      tot AS (SELECT CAST(SUM(n1) AS BIGINT) AS n FROM lt),
      j AS (SELECT c.lang, c.word, c.a, w.cw - c.a AS b,
              l.n1, t.n - l.n1 AS n2, w.cw, t.n
            FROM cell c JOIN wt w USING (word) JOIN lt l USING (lang)
            CROSS JOIN tot t),
      sc AS (SELECT lang, word, a, b,
              ROUND(2.0 * (
                (CASE WHEN a > 0 THEN CAST(a AS DOUBLE) *
                   ln(CAST(a * n AS DOUBLE) / CAST(n1 * cw AS DOUBLE))
                 ELSE 0.0 END)
                + (CASE WHEN b > 0 THEN CAST(b AS DOUBLE) *
                   ln(CAST(b * n AS DOUBLE) / CAST(n2 * cw AS DOUBLE))
                 ELSE 0.0 END)), 4) AS g2
             FROM j WHERE a * n2 > b * n1),
      r AS (SELECT lang, word, a AS lang_count, b AS rest_count, g2,
              ROW_NUMBER() OVER (PARTITION BY lang
                ORDER BY g2 DESC, word) AS rnk
            FROM sc)
      SELECT lang, word, lang_count, rest_count, g2, CAST(rnk AS INT) AS rank
      FROM r WHERE rnk <= 10 ORDER BY lang, rank"""))

  val defs: Seq[QueryDef] =
    Seq(t01, t02, t03, t04, t05, t06, t07, t08, t09, t10, t11, t12, t13,
      t14, t15, t16, t17, t18)
}
