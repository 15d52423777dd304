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

  /** q90's deterministic sentiment injection: base = text + a lexicon
    * snippet repeated 1+doc_id%3 times, family keyed on doc_id%6 (0 = no
    * injection → the neutral/zero-confidence path). One shared SQL
    * expression, parsed by Spark's expr() and run verbatim in DuckDB. */
  val SentimentBaseSql: String = {
    val snips = Seq(
      "", // neutral
      "good great excellent",
      "bad terrible awful",
      "good bad", // tie -> score 0 -> neutral
      "love happy perfect best amazing bad",
      "hate worst boring good wonderful")
    val cases = snips.zipWithIndex
      .map { case (t, i) => s"WHEN $i THEN '$t'" }.mkString(" ")
    s"concat(text, ' ', repeat((CASE CAST(doc_id % 6 AS INT) $cases ELSE '' END) || ' ', " +
      "CAST(1 + doc_id % 3 AS INT)))"
  }

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

    // --- analyze_readability, FULL reference semantics (server.ts:4104-
    //     4150): markdown-char strip, sentence/word/syllable components,
    //     Flesch Reading Ease 206.835−1.015·w/s−84.6·syl/w, Flesch-Kincaid
    //     grade, Automated Readability Index, the 7 level bands (on the
    //     UNROUNDED Flesch) and the <60 recommendation trigger. The corpus
    //     has no sentence punctuation, so both engines first derive the
    //     same sentence-structured text (a '.' after every 12 tokens);
    //     scores are surfaced as Math.round(x*100) ≡ floor(x*100+0.5)
    //     ints, with identical literal/operation order so IEEE doubles
    //     agree bit-for-bit. ------------------------------------------------
    QuerySpec(
      "q16_readability",
      (s, dir) => {
        val d = t(s, dir, "documents")
        val rd = regexp_replace( // markdown-char strip (server.ts:4101)
          regexp_replace(col("text"), "((?:\\S+ ){11}\\S+) ", "$1. "),
          "[\\[\\]\\(\\)\\*_`#]", " ")
        val words = filter(split(rd, "\\s+", -1), w => length(w) > 0)
        val sentences = filter(split(rd, "[.!?]+", -1),
          x => length(trim(x)) > 0)
        val syll = aggregate(
          transform(words, w =>
            greatest(lit(1), size(regexp_extract_all(lower(w), lit("[aeiouy]+"), lit(0))))),
          lit(0), (acc, x) => acc + x)
        val base = d.select(col("doc_id"),
          size(words).as("n_words"),
          size(sentences).as("n_sentences"),
          syll.as("n_syllables"),
          length(regexp_replace(rd, "\\s", "")).as("n_chars_nospace"))
        val wps = col("n_words") / col("n_sentences")
        val spw = col("n_syllables") / col("n_words")
        val flesch = lit(206.835) - lit(1.015) * wps - lit(84.6) * spw
        val fk = lit(0.39) * wps + lit(11.8) * spw - lit(15.59)
        val ari = lit(4.71) * (col("n_chars_nospace") / col("n_words")) +
          lit(0.5) * wps - lit(21.43)
        def x100(c: Column) = floor(c * 100 + lit(0.5)).cast("long")
        base.select(col("doc_id"), col("n_words"), col("n_sentences"),
            col("n_syllables"), col("n_chars_nospace"),
            x100(flesch).as("flesch_x100"),
            x100(fk).as("fk_grade_x100"),
            x100(ari).as("ari_x100"),
            when(flesch >= 90, "Very Easy").when(flesch >= 80, "Easy")
              .when(flesch >= 70, "Fairly Easy").when(flesch >= 60, "Standard")
              .when(flesch >= 50, "Fairly Difficult").when(flesch >= 30, "Difficult")
              .otherwise("Very Difficult").as("level"),
            when(flesch < 60, 4).otherwise(1).as("n_recommendations"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH rd AS (
             |  SELECT doc_id,
             |         regexp_replace(
             |           regexp_replace(text, '((?:\S+ ){11}\S+) ', '\1. ', 'g'),
             |           '[\[\]\(\)\*_`#]', ' ', 'g') AS rt
             |  FROM documents),
             |comp AS (
             |  SELECT doc_id,
             |    len(list_filter(regexp_split_to_array(rt, '\s+'), w -> length(w) > 0)) AS n_words,
             |    len(list_filter(regexp_split_to_array(rt, '[.!?]+'), x -> length(trim(x)) > 0)) AS n_sentences,
             |    CAST(list_sum(list_transform(
             |      list_filter(regexp_split_to_array(rt, '\s+'), w -> length(w) > 0),
             |      w -> greatest(1, len(regexp_extract_all(lower(w), '[aeiouy]+'))))) AS INTEGER) AS n_syllables,
             |    length(regexp_replace(rt, '\s', '', 'g')) AS n_chars_nospace
             |  FROM rd),
             |scored AS (
             |  SELECT *,
             |    206.835 - 1.015 * (n_words / n_sentences) - 84.6 * (n_syllables / n_words) AS flesch,
             |    0.39 * (n_words / n_sentences) + 11.8 * (n_syllables / n_words) - 15.59 AS fk,
             |    4.71 * (n_chars_nospace / n_words) + 0.5 * (n_words / n_sentences) - 21.43 AS ari
             |  FROM comp)
             |SELECT doc_id, n_words, n_sentences, n_syllables, n_chars_nospace,
             |  CAST(floor(flesch * 100 + 0.5) AS BIGINT) AS flesch_x100,
             |  CAST(floor(fk * 100 + 0.5) AS BIGINT) AS fk_grade_x100,
             |  CAST(floor(ari * 100 + 0.5) AS BIGINT) AS ari_x100,
             |  CASE WHEN flesch >= 90 THEN 'Very Easy' WHEN flesch >= 80 THEN 'Easy'
             |       WHEN flesch >= 70 THEN 'Fairly Easy' WHEN flesch >= 60 THEN 'Standard'
             |       WHEN flesch >= 50 THEN 'Fairly Difficult' WHEN flesch >= 30 THEN 'Difficult'
             |       ELSE 'Very Difficult' END AS level,
             |  CASE WHEN flesch < 60 THEN 4 ELSE 1 END AS n_recommendations
             |FROM scored ORDER BY doc_id""".stripMargin)),

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
             |ORDER BY doc_id""".stripMargin)),

    // --- detect_language, FULL reference semantics (server.ts:4180-4233):
    //     all TEN families incl. the non-Latin unicode-range ones (and the
    //     ja 8-literal-chars quirk at :4202), htmlLang lang||xml:lang
    //     falsy-fallthrough precedence, the min(1, m/(w*0.1)) confidence
    //     formula with 2-dp rounding, candidate threshold on the UNROUNDED
    //     value, stable-sort primary selection, isConfident >= 0.8, and
    //     textSample substring(0,200)+'...' (:4233). Runs over a synthetic
    //     multilingual corpus both engines derive from documents with one
    //     shared SQL expression; q93 is the same detector over REAL parsed
    //     pages. ----------------------------------------------------------
    QuerySpec(
      "q88_lang_detect_full",
      (s, dir) => {
        import LangDetect._
        val d = t(s, dir, "documents")
        detect(d.select(col("doc_id"), expr(MlTextSql).as("mlt"),
          expr(HtmlLangSql).as("html_lang"),
          expr(sampleSql(RawMlTextSql)).as("text_sample")))
      },
      Some {
        import LangDetect._
        detectSql(s"""  SELECT doc_id, $MlTextSql AS mlt,
           |         $HtmlLangSql AS html_lang,
           |         ${sampleSql(RawMlTextSql)} AS text_sample
           |  FROM documents""".stripMargin)
      }),

    // --- detect_language over REAL PARSED PAGES (the reference's actual
    //     integration path, server.ts:4181-4233: fetch -> cheerio.load ->
    //     $('html').attr('lang') || attr('xml:lang') -> extractContent ->
    //     detector over extracted.content.toLowerCase() -> textSample).
    //     The pages are deterministic HTML wrapping the same multilingual
    //     corpus as q88, with a doc_id-keyed mix of lang="fam",
    //     lang="" + xml:lang (the falsy fallthrough, '' || x -> x), only
    //     xml:lang, and no attr at all. The KERNEL (Html parse -> root
    //     attrs -> full extract pipeline) materializes per-page rows; the
    //     oracle recomputes EVERYTHING downstream — the fallthrough, the
    //     ten-family detector and the sample — from the raw attrs +
    //     content, sharing [[LangDetect.detectSql]] with q88. ---------------
    QuerySpec(
      "q93_lang_detect_pages",
      (s, dir) => {
        import s.implicits._
        import LangDetect._
        val docs = t(s, dir, "documents")
          .select(col("doc_id").cast("long"), expr(RawMlTextSql).as("raw"),
            expr(FamCodeSql).as("fam"))
        val kernel = docs.as[(Long, String, String)].map { case (id, raw, fam) =>
          val attr = (id % 4) match {
            case 0 => s""" lang="$fam""""
            case 1 => s""" lang="" xml:lang="x-$fam"""" // '' is falsy -> xml:lang wins
            case 2 => s""" xml:lang="$fam""""
            case _ => ""
          }
          val html =
            s"""<!DOCTYPE html>
               |<html$attr><head><title>Doc $id</title></head>
               |<body><main><p>$raw</p></main></body></html>""".stripMargin
          val doc = graft.core.Html.parse(html)
          val e = graft.core.Extract.extract(html, s"http://docs.example/$id", 0L)
          (id, doc.root.attr("lang").getOrElse(""),
            doc.root.attr("xml:lang").getOrElse(""), e.content)
        }.toDF("doc_id", "lang_attr", "xml_lang_attr", "content")
        // identical SQL text on both sides for every downstream expression
        val ml = OracleMat(s, "q93")(kernel).select(col("doc_id"),
          expr("lower(content)").as("mlt"),
          expr("""CASE WHEN lang_attr <> '' THEN lang_attr
                 |     WHEN xml_lang_attr <> '' THEN xml_lang_attr
                 |     ELSE '' END""".stripMargin).as("html_lang"),
          expr(sampleSql("content")).as("text_sample"))
        detect(ml)
      },
      Some {
        import LangDetect._
        detectSql(s"""  SELECT doc_id, lower(content) AS mlt,
           |         CASE WHEN lang_attr <> '' THEN lang_attr
           |              WHEN xml_lang_attr <> '' THEN xml_lang_attr
           |              ELSE '' END AS html_lang,
           |         ${sampleSql("content")} AS text_sample
           |  FROM ${OracleMat.src("q93")}""".stripMargin)
      }),

    // --- sentiment_analysis, FULL granularity semantics (server.ts:4311-
    //     4405): overall + paragraph (split /\n\s*\n/) + sentence (split
    //     /[.!?]+/, first 20) modes, each through the same analyzeSentiment
    //     — \W+ tokenization (KEEPING empty edge tokens in the confidence
    //     denominator, exactly like JS split), lexicon hit counts, score
    //     (p−n)/(p+n) with the >0.1/<−0.1 banding done in exact integer
    //     arithmetic, confidence min(1, total/(words*0.1)), and the
    //     substring(0,100)+'...' preview. The corpus is single-line, so
    //     both engines derive the same paragraph/sentence structure and
    //     sentiment-bearing injections from documents first. ----------------
    QuerySpec(
      "q90_sentiment_granular",
      (s, dir) => {
        val d = t(s, dir, "documents")
        // deterministic sentiment injection + structure (shared derivation)
        val baseCol = expr(SentimentBaseSql).as("base")
        val paraCol = regexp_replace(col("base"), "((?:\\S+ ){15}\\S+) ", "$1\n\n")
        val sentCol = regexp_replace(col("base"), "((?:\\S+ ){7}\\S+) ", "$1. ")
        val src = d.select(col("doc_id"), baseCol)
          .select(col("doc_id"), col("base"), paraCol.as("ptext"), sentCol.as("stext"))
        def sentimentCols(unit: Column): Seq[Column] = {
          val toks = split(lower(unit), "[^A-Za-z0-9_]+", -1)
          val pos = size(filter(toks, w => w.isin(PositiveWords.map(lit): _*)))
          val neg = size(filter(toks, w => w.isin(NegativeWords.map(lit): _*)))
          val total = pos + neg
          val score100 = when(total === 0, lit(0L)).otherwise(
            floor((pos - neg) / total.cast("double") * 100 + lit(0.5)).cast("long"))
          val label = when(total === 0, "neutral")
            .when((pos - neg) * 10 > total, "positive")
            .when((pos - neg) * 10 < -total, "negative")
            .otherwise("neutral")
          val conf100 = floor(least(lit(1.0),
            total / (size(toks) * lit(0.1))) * lit(100) + lit(0.5)).cast("long")
          Seq(pos.as("pos"), neg.as("neg"), score100.as("score_x100"),
            label.as("label"), conf100.as("conf_x100"))
        }
        val overall = src.select(Seq(col("doc_id"), lit("overall").as("mode"),
          lit(0).as("idx"), lit("").as("preview")) ++ sentimentCols(col("base")): _*)
        val paras = src.select(col("doc_id"),
            posexplode(filter(split(col("ptext"), "\\n\\s*\\n", -1),
              p => length(trim(p)) > 0)).as(Seq("idx", "unit")))
          .select(Seq(col("doc_id"), lit("paragraph").as("mode"), col("idx"),
            concat(substring(col("unit"), 1, 100), lit("...")).as("preview")) ++
            sentimentCols(col("unit")): _*)
        val sents = src.select(col("doc_id"),
            posexplode(slice(filter(split(col("stext"), "[.!?]+", -1),
              x => length(trim(x)) > 0), 1, 20)).as(Seq("idx", "unit")))
          // preview trims (reference :4394) but analyzeSentiment gets the
          // RAW sentence — a leading space adds an empty \W+ token to the
          // confidence denominator, faithfully
          .select(Seq(col("doc_id"), lit("sentence").as("mode"), col("idx"),
            concat(substring(trim(col("unit")), 1, 100), lit("...")).as("preview")) ++
            sentimentCols(col("unit")): _*)
        overall.unionByName(paras).unionByName(sents)
          .orderBy(col("doc_id"), col("mode"), col("idx"))
      },
      Some {
        def sqlSent(unit: String): String = {
          val toks = s"regexp_split_to_array(lower($unit), '[^A-Za-z0-9_]+')"
          s"""len(list_filter($toks, w -> w IN ${sqlList(PositiveWords)})) AS pos,
             |    len(list_filter($toks, w -> w IN ${sqlList(NegativeWords)})) AS neg,
             |    len($toks) AS wl""".stripMargin
        }
        val derive = """
          |base AS (
          |  SELECT doc_id, """.stripMargin + SentimentBaseSql + """ AS base FROM documents),
          |structured AS (
          |  SELECT doc_id, base,
          |    regexp_replace(base, '((?:\S+ ){15}\S+) ', '\1' || chr(10) || chr(10), 'g') AS ptext,
          |    regexp_replace(base, '((?:\S+ ){7}\S+) ', '\1. ', 'g') AS stext
          |  FROM base)""".stripMargin
        s"""WITH $derive,
           |overall AS (
           |  SELECT doc_id, 'overall' AS mode, 0 AS idx, '' AS preview,
           |    ${sqlSent("base")}
           |  FROM structured),
           |punits AS (
           |  SELECT doc_id,
           |    unnest(pl) AS unit,
           |    unnest(generate_series(1, len(pl))) AS k
           |  FROM (SELECT doc_id, list_filter(
           |          regexp_split_to_array(ptext, '\\n\\s*\\n'),
           |          p -> length(trim(p)) > 0) AS pl FROM structured)),
           |paras AS (
           |  SELECT doc_id, 'paragraph' AS mode, k - 1 AS idx,
           |    substr(unit, 1, 100) || '...' AS preview,
           |    ${sqlSent("unit")}
           |  FROM punits),
           |sunits AS (
           |  SELECT doc_id,
           |    unnest(sl) AS unit,
           |    unnest(generate_series(1, len(sl))) AS k
           |  FROM (SELECT doc_id, list_filter(
           |          regexp_split_to_array(stext, '[.!?]+'),
           |          x -> length(trim(x)) > 0)[1:20] AS sl FROM structured)),
           |sents AS (
           |  SELECT doc_id, 'sentence' AS mode, k - 1 AS idx,
           |    substr(trim(unit), 1, 100) || '...' AS preview,
           |    ${sqlSent("unit")}
           |  FROM sunits),
           |allu AS (
           |  SELECT * FROM overall UNION ALL SELECT * FROM paras
           |  UNION ALL SELECT * FROM sents)
           |SELECT doc_id, mode, idx, preview, pos, neg,
           |  CAST(CASE WHEN pos + neg = 0 THEN 0
           |       ELSE floor((pos - neg) / CAST(pos + neg AS DOUBLE) * 100 + 0.5)
           |       END AS BIGINT) AS score_x100,
           |  CASE WHEN pos + neg = 0 THEN 'neutral'
           |       WHEN (pos - neg) * 10 > pos + neg THEN 'positive'
           |       WHEN (pos - neg) * 10 < -(pos + neg) THEN 'negative'
           |       ELSE 'neutral' END AS label,
           |  CAST(floor(least(1.0, (pos + neg) / (wl * CAST(0.1 AS DOUBLE))) * 100 + 0.5) AS BIGINT) AS conf_x100
           |FROM allu ORDER BY doc_id, mode, idx""".stripMargin
      })
  )

}
