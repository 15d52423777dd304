package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analytics query pack over the `documents` table.
  *
  * Re-expresses the reference's corpus-text operators — word cloud
  * (src/server.ts:3833-3893 incl. its 38-word stoplist), readability
  * (src/server.ts:4104-4121 Flesch arithmetic / vowel-group syllables),
  * language detection stopword families (src/server.ts:4193-4204),
  * sentiment word lists (src/server.ts:4335-4336), exact dedup by content
  * hash (monitor_changes md5, src/server.ts:3293) — as distributed
  * `groupBy`/`explode` pipelines with DuckDB oracles.
  *
  * Float-free outputs (counts / scaled-integer scores) keep the driver's
  * value hashing stable across engines.
  */
object TextQueries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Stoplist verbatim from the reference word-cloud filter
    * (src/server.ts:3864). */
  val StopWords: Seq[String] = Seq(
    "the", "and", "or", "but", "in", "on", "at", "to", "for", "of", "with",
    "by", "is", "are", "was", "were", "be", "been", "have", "has", "had",
    "do", "does", "did", "will", "would", "could", "should", "may", "might",
    "can", "this", "that", "these", "those", "a", "an")

  /** Sentiment lexica verbatim from src/server.ts:4335-4336. */
  val PositiveWords: Seq[String] = Seq(
    "good", "great", "excellent", "amazing", "wonderful", "fantastic",
    "awesome", "love", "like", "happy", "pleased", "satisfied", "perfect",
    "best", "brilliant", "outstanding", "superb", "magnificent", "marvelous",
    "terrific")
  val NegativeWords: Seq[String] = Seq(
    "bad", "terrible", "awful", "horrible", "hate", "dislike", "angry",
    "sad", "disappointed", "frustrated", "worst", "disgusting", "annoying",
    "boring", "useless", "pathetic", "ridiculous", "stupid", "ugly", "nasty")

  /** Language marker stopwords from the detect_language regex families
    * (src/server.ts:4195-4200), word-boundary semantics. */
  val LangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "or", "but", "in", "on", "at", "to", "for", "of", "with", "by"),
    "es" -> Seq("el", "la", "los", "las", "y", "o", "pero", "en", "con", "de", "por", "para"),
    "fr" -> Seq("le", "la", "les", "et", "ou", "mais", "dans", "sur", "avec", "de", "par", "pour"),
    "de" -> Seq("der", "die", "das", "und", "oder", "aber", "in", "auf", "mit", "von", "für"))

  private def sqlList(ws: Seq[String]): String =
    ws.map(w => s"'$w'").mkString("(", ", ", ")")

  private def tokens(c: Column): Column = split(lower(c), "\\s+")

  /** Count of tokens of `c` that are members of `ws` (exact token match). */
  private def hitCount(c: Column, ws: Seq[String]): Column =
    size(filter(tokens(c), w => w.isin(ws.map(lit): _*)))

  def sqlHitCount(expr: String, ws: Seq[String]): String =
    s"len(list_filter(regexp_split_to_array(lower($expr), '\\s+'), w -> w IN ${sqlList(ws)}))"

  val specs: Seq[QuerySpec] = Seq(
    // --- word cloud: tokenized top-k frequency (src/server.ts:3855-3874) --
    QuerySpec(
      "q10_word_cloud",
      (s, dir) => {
        val d = t(s, dir, "documents")
        d.select(explode(tokens(col("text"))).as("word"))
          .filter(length(col("word")) >= 3)
          .filter(!col("word").isin(StopWords.map(lit): _*))
          .groupBy(col("word"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("word").asc)
          .limit(50)
      },
      Some(s"""SELECT word, count(*) AS n FROM (
              |  SELECT unnest(regexp_split_to_array(lower(text), '\\s+')) AS word
              |  FROM documents)
              |WHERE length(word) >= 3 AND word NOT IN ${sqlList(StopWords)}
              |GROUP BY word
              |ORDER BY n DESC, word ASC
              |LIMIT 50""".stripMargin)),

    // --- token stats per document (countWords, src/extract.ts:207-209) ----
    QuerySpec(
      "q11_token_stats",
      (s, dir) => {
        val d = t(s, dir, "documents")
        d.select(
            col("doc_id"),
            size(tokens(col("text"))).as("n_tokens"),
            length(col("text")).as("n_chars_actual"),
            size(array_distinct(tokens(col("text")))).as("n_distinct"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
             |       len(regexp_split_to_array(lower(text), '\s+')) AS n_tokens,
             |       length(text) AS n_chars_actual,
             |       len(list_distinct(regexp_split_to_array(lower(text), '\s+'))) AS n_distinct
             |FROM documents
             |ORDER BY doc_id""".stripMargin)),

    // --- quality scoring: stopword ratio signals for corpus filtering -----
    QuerySpec(
      "q12_quality",
      (s, dir) => {
        val d = t(s, dir, "documents")
        val toks = tokens(col("text"))
        d.select(
            col("doc_id"),
            size(toks).as("n_tokens"),
            hitCount(col("text"), StopWords).as("n_stop"),
            size(filter(toks, w => length(w) >= 8)).as("n_long"),
            length(regexp_replace(col("text"), "[a-z\\s]", "")).as("n_nonalpha"))
          .orderBy(col("doc_id"))
      },
      Some(s"""SELECT doc_id,
              |       len(regexp_split_to_array(lower(text), '\\s+')) AS n_tokens,
              |       ${sqlHitCount("text", StopWords)} AS n_stop,
              |       len(list_filter(regexp_split_to_array(lower(text), '\\s+'), w -> length(w) >= 8)) AS n_long,
              |       length(regexp_replace(text, '[a-z\\s]', '', 'g')) AS n_nonalpha
              |FROM documents
              |ORDER BY doc_id""".stripMargin)),

    // --- exact dedup by content hash (md5, src/server.ts:3293) -----------
    QuerySpec(
      "q13_dup_exact",
      (s, dir) => {
        val d = t(s, dir, "documents")
        d.groupBy(md5(col("text").cast("binary")).as("h"))
          .agg(count(lit(1)).as("n"), min(col("doc_id")).as("first_doc"))
          .orderBy(col("n").desc, col("h").asc)
          .limit(20)
      },
      Some("""SELECT md5(text) AS h, count(*) AS n, min(doc_id) AS first_doc
             |FROM documents
             |GROUP BY 1
             |ORDER BY n DESC, h ASC
             |LIMIT 20""".stripMargin)),

    // --- language ID via stopword families (src/server.ts:4193-4211) ------
    QuerySpec(
      "q14_lang_id",
      (s, dir) => {
        val d = t(s, dir, "documents")
        val en = hitCount(col("text"), LangMarkers("en"))
        val es = hitCount(col("text"), LangMarkers("es"))
        val fr = hitCount(col("text"), LangMarkers("fr"))
        val de = hitCount(col("text"), LangMarkers("de"))
        d.select(col("doc_id"),
            en.as("en_hits"), es.as("es_hits"), fr.as("fr_hits"), de.as("de_hits"))
          .withColumn("pred",
            when(col("en_hits") >= col("es_hits") && col("en_hits") >= col("fr_hits")
              && col("en_hits") >= col("de_hits"), "en")
            .when(col("es_hits") >= col("fr_hits") && col("es_hits") >= col("de_hits"), "es")
            .when(col("fr_hits") >= col("de_hits"), "fr")
            .otherwise("de"))
          .orderBy(col("doc_id"))
      },
      Some(s"""SELECT doc_id, en_hits, es_hits, fr_hits, de_hits,
              |       CASE WHEN en_hits >= es_hits AND en_hits >= fr_hits AND en_hits >= de_hits THEN 'en'
              |            WHEN es_hits >= fr_hits AND es_hits >= de_hits THEN 'es'
              |            WHEN fr_hits >= de_hits THEN 'fr'
              |            ELSE 'de' END AS pred
              |FROM (SELECT doc_id,
              |        ${sqlHitCount("text", LangMarkers("en"))} AS en_hits,
              |        ${sqlHitCount("text", LangMarkers("es"))} AS es_hits,
              |        ${sqlHitCount("text", LangMarkers("fr"))} AS fr_hits,
              |        ${sqlHitCount("text", LangMarkers("de"))} AS de_hits
              |      FROM documents)
              |ORDER BY doc_id""".stripMargin)),

    // --- sentiment (src/server.ts:4335-4351), integer-exact banding -------
    QuerySpec(
      "q15_sentiment",
      (s, dir) => {
        val d = t(s, dir, "documents")
        d.select(col("doc_id"),
            hitCount(col("text"), PositiveWords).as("pos"),
            hitCount(col("text"), NegativeWords).as("neg"))
          // score>(0.1) ⇔ (pos-neg)*10 > (pos+neg); exact in integers
          .withColumn("label",
            when(col("pos") + col("neg") === 0, "neutral")
            .when((col("pos") - col("neg")) * 10 > col("pos") + col("neg"), "positive")
            .when((col("pos") - col("neg")) * 10 < -(col("pos") + col("neg")), "negative")
            .otherwise("neutral"))
          .orderBy(col("doc_id"))
      },
      Some(s"""SELECT doc_id, pos, neg,
              |       CASE WHEN pos + neg = 0 THEN 'neutral'
              |            WHEN (pos - neg) * 10 > (pos + neg) THEN 'positive'
              |            WHEN (pos - neg) * 10 < -(pos + neg) THEN 'negative'
              |            ELSE 'neutral' END AS label
              |FROM (SELECT doc_id,
              |        ${sqlHitCount("text", PositiveWords)} AS pos,
              |        ${sqlHitCount("text", NegativeWords)} AS neg
              |      FROM documents)
              |ORDER BY doc_id""".stripMargin)),

    // --- readability components (src/server.ts:4104-4121): sentence/word/
    //     syllable counts, float Flesch surfaced as scaled integer ---------
    QuerySpec(
      "q16_readability",
      (s, dir) => {
        val d = t(s, dir, "documents")
        val words = filter(split(col("text"), "\\s+"), w => length(w) > 0)
        val syll = aggregate(
          transform(words, w =>
            greatest(lit(1), size(regexp_extract_all(lower(w), lit("[aeiouy]+"), lit(0))))),
          lit(0), (acc, x) => acc + x)
        d.select(col("doc_id"),
            size(words).as("n_words"),
            syll.as("n_syllables"),
            length(regexp_replace(col("text"), "\\s", "")).as("n_chars_nospace"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
             |       len(list_filter(regexp_split_to_array(text, '\s+'), w -> length(w) > 0)) AS n_words,
             |       CAST(list_sum(list_transform(
             |         list_filter(regexp_split_to_array(text, '\s+'), w -> length(w) > 0),
             |         w -> greatest(1, len(regexp_extract_all(lower(w), '[aeiouy]+'))))) AS INTEGER) AS n_syllables,
             |       length(regexp_replace(text, '\s', '', 'g')) AS n_chars_nospace
             |FROM documents
             |ORDER BY doc_id""".stripMargin)),

    // --- n-gram (bigram) frequency: extract_keywords phrase pass
    //     (src/server.ts:4033-4058) ----------------------------------------
    QuerySpec(
      "q17_bigrams",
      (s, dir) => {
        val d = t(s, dir, "documents")
        val toks = tokens(col("text"))
        // zip words with their successors → "w1 w2" bigram strings
        val bigrams = zip_with(
          slice(toks, lit(1), size(toks) - 1),
          slice(toks, lit(2), size(toks) - 1),
          (a, b) => concat(a, lit(" "), b))
        d.select(explode(bigrams).as("bigram"))
          .groupBy(col("bigram"))
          .agg(count(lit(1)).as("n"))
          .filter(col("n") >= 2)
          .orderBy(col("n").desc, col("bigram").asc)
          .limit(30)
      },
      Some("""SELECT bigram, count(*) AS n FROM (
             |  SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
             |                               i -> toks[i] || ' ' || toks[i+1])) AS bigram
             |  FROM (SELECT regexp_split_to_array(lower(text), '\s+') AS toks FROM documents))
             |GROUP BY bigram
             |HAVING count(*) >= 2
             |ORDER BY n DESC, bigram ASC
             |LIMIT 30""".stripMargin)),

    // --- BPE-ish regex tokenization: letter-runs / digit-runs / punct-runs
    //     (the GPT-2 pre-tokenizer shape, lookahead-free so the RE2 oracle
    //     agrees) ----------------------------------------------------------
    QuerySpec(
      "q74_bpe_tokens",
      (s, dir) => {
        val d = t(s, dir, "documents")
        val pat = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]+"
        d.select(col("doc_id"),
            size(regexp_extract_all(col("text"), lit(pat), lit(0))).as("n_bpe_tokens"),
            size(filter(regexp_extract_all(col("text"), lit(pat), lit(0)),
              t => t.rlike("^[0-9]+$"))).as("n_number_tokens"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
             |       len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]+')) AS n_bpe_tokens,
             |       len(list_filter(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]+'),
             |                       t -> regexp_matches(t, '^[0-9]+$'))) AS n_number_tokens
             |FROM documents
             |ORDER BY doc_id""".stripMargin)),

    // --- rolling-hash fingerprint (winnowing): min Rabin-Karp hash over a
    //     sliding byte window — robust doc identity under local edits ------
    QuerySpec(
      "q75_rolling_fp",
      (s, dir) => {
        val winnow = udf { (text: String) =>
          // Rabin-Karp rolling hash, window 16 bytes, base 257 mod 2^61-1;
          // fingerprint = min hash over all windows (winnowing w=all)
          val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val w = 16
          val mod = (1L << 61) - 1
          val base = 257L
          if (bytes.length < w)
            graft.core.UrlNorm.xxh64(bytes, 0L)
          else {
            var pow = 1L
            var i = 0
            while (i < w - 1) { pow = pow * base % mod; i += 1 }
            var h = 0L
            i = 0
            while (i < w) { h = (h * base + (bytes(i) & 0xFF)) % mod; i += 1 }
            var minH = h
            while (i < bytes.length) {
              h = (h - (bytes(i - w) & 0xFF) * pow % mod + mod * 256) % mod
              h = (h * base + (bytes(i) & 0xFF)) % mod
              if (h < minH) minH = h
              i += 1
            }
            minH
          }
        }
        val d = t(s, dir, "documents")
        val fps = OracleMat(s, "q75_fp")(
          d.select(col("doc_id"), winnow(col("text")).as("rolling_fp")))
        // dup-group size per fingerprint — the downstream identity use of a
        // winnowing fp; recomputed by the oracle over the materialized fps
        fps.withColumn("n_sharing", count(lit(1)).over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("rolling_fp"))))
          .orderBy(col("doc_id"))
      },
      Some(s"""SELECT doc_id, rolling_fp,
              |       count(*) OVER (PARTITION BY rolling_fp) AS n_sharing
              |FROM ${OracleMat.src("q75_fp")} ORDER BY doc_id""".stripMargin)),

    // --- document fingerprint: rolling/content hash per doc ---------------
    QuerySpec(
      "q18_fingerprint",
      (s, dir) => {
        val d = t(s, dir, "documents")
        d.select(col("doc_id"),
            md5(col("text").cast("binary")).as("content_md5"),
            sha2(col("text").cast("binary"), 256).as("content_sha256"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, md5(text) AS content_md5,
             |       sha256(text) AS content_sha256
             |FROM documents
             |ORDER BY doc_id""".stripMargin))
  )
}
