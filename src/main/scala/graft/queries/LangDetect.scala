package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Full detect_language semantics (reference src/server.ts:4180-4233),
  * shared by q88 and q84's language gate.
  *
  * The reference scores TEN families: six stopword-regex families
  * (en/es/fr/de/it/pt) plus four unicode-range families — ru Cyrillic
  * `[а-я]`, zh CJK `[\u4e00-\u9fff]`, ja a character class of the EIGHT
  * LITERAL chars of the string "ひらがなカタカナ" (the quirk SURVEY §2c
  * flags at server.ts:4202 — NOT the kana ranges), and ar Arabic
  * `[\u0600-\u06ff]` — all matched against the LOWERCASED content.
  * Per family (server.ts:4206-4219):
  *
  *   confidence = min(1, matches / (words * 0.1))   // words = split(/\s+/)
  *   candidates = families with UNROUNDED confidence > 0.1
  *   displayed  = Math.round(confidence * 100) / 100  // 2-dp rounding
  *   sort by displayed confidence desc; ties keep family order (JS stable
  *   sort over the languagePatterns object-key insertion order)
  *   primary    = head, or {language:'unknown', confidence:0}
  *   isConfident = primary.confidence >= 0.8 (the rounded value)
  *
  * Every numeric formula here is emitted with IDENTICAL literals and
  * operation order on the Spark and DuckDB sides, so IEEE-754 doubles
  * agree bit-for-bit and the driver's hash compare holds; JS
  * Math.round(x) ≡ floor(x + 0.5) in both engines (incl. negatives).
  * Word-boundary `\b` is ASCII-\w in JS, Java regex and RE2 alike.
  */
object LangDetect {

  final case class Family(code: String, idx: Int, pattern: String)

  /** Patterns verbatim from server.ts:4193-4204 (object-key order). */
  val Families: Seq[Family] = Seq(
    Family("en", 0, "\\b(the|and|or|but|in|on|at|to|for|of|with|by)\\b"),
    Family("es", 1, "\\b(el|la|los|las|y|o|pero|en|con|de|por|para)\\b"),
    Family("fr", 2, "\\b(le|la|les|et|ou|mais|dans|sur|avec|de|par|pour)\\b"),
    Family("de", 3, "\\b(der|die|das|und|oder|aber|in|auf|mit|von|f\u00fcr)\\b"),
    Family("it", 4, "\\b(il|la|lo|gli|le|e|o|ma|in|su|con|di|per)\\b"),
    Family("pt", 5, "\\b(o|a|os|as|e|ou|mas|em|com|de|por|para)\\b"),
    Family("ru", 6, "[\u0430-\u044f]"),
    Family("zh", 7, "[\u4e00-\u9fff]"),
    Family("ja", 8, "[\u3072\u3089\u304c\u306a\u30ab\u30bf\u30ab\u30ca]"),
    Family("ar", 9, "[\u0600-\u06ff]"))

  // ---- shared formula pieces (Spark Column + DuckDB SQL twins) ----------

  /** JS `text.split(/\s+/).length` — split KEEPS leading/trailing empty
    * elements (limit -1 on the Java side; DuckDB keeps them natively). */
  def words(textLower: Column): Column = size(split(textLower, "\\s+", -1))
  def sqlWords(e: String): String = s"len(regexp_split_to_array($e, '\\s+'))"

  def matches(textLower: Column, f: Family): Column =
    regexp_count(textLower, lit(f.pattern))
  def sqlMatches(e: String, f: Family): String =
    s"len(regexp_extract_all($e, '${f.pattern}'))"

  /** 2-dp-rounded confidence scaled x100: floor(min(1, m/(w*0.1))*100+0.5). */
  def conf100(m: Column, w: Column): Column =
    floor(least(lit(1.0), m / (w * lit(0.1))) * lit(100) + lit(0.5)).cast("long")
  // NB: DuckDB parses bare 0.1 as DECIMAL and keeps `w * 0.1` EXACT
  // (9.6, not the double 9.600000000000001 Spark computes) — the CAST
  // forces the same IEEE double arithmetic on both engines
  def sqlConf100(m: String, w: String): String =
    s"CAST(floor(least(1.0, $m / ($w * CAST(0.1 AS DOUBLE))) * 100 + 0.5) AS BIGINT)"

  /** Candidate-list membership uses the UNROUNDED confidence (:4213). */
  def included(m: Column, w: Column): Column = m / (w * lit(0.1)) > lit(0.1)
  def sqlIncluded(m: String, w: String): String =
    s"$m / ($w * CAST(0.1 AS DOUBLE)) > 0.1"

  /** Primary-selection encoding: sort key (rounded conf desc, family order
    * asc) packed into one integer — conf100*16 + (15-idx), -1 if not a
    * candidate — so `greatest` over the ten scores picks the JS sort head. */
  def score(m: Column, w: Column, f: Family): Column =
    when(included(m, w), conf100(m, w) * 16 + lit(15L - f.idx)).otherwise(lit(-1L))
  def sqlScore(m: String, w: String, f: Family): String =
    s"CASE WHEN ${sqlIncluded(m, w)} THEN ${sqlConf100(m, w)} * 16 + ${15 - f.idx} ELSE -1 END"

  /** Decode the packed best score back to the family code. */
  def primaryLang(best: Column): Column =
    Families.foldLeft(when(best < 0, lit("unknown"))) { (acc, f) =>
      acc.when(best % 16 === lit(15L - f.idx), lit(f.code))
    }.otherwise(lit("unknown"))
  def sqlPrimaryLang(best: String): String =
    (s"CASE WHEN $best < 0 THEN 'unknown' " +
      Families.map(f => s"WHEN $best % 16 = ${15 - f.idx} THEN '${f.code}'")
        .mkString(" ") + " ELSE 'unknown' END")

  def primaryConf100(best: Column): Column =
    when(best < 0, lit(0L)).otherwise(floor(best / 16).cast("long"))
  def sqlPrimaryConf100(best: String): String =
    s"CAST(CASE WHEN $best < 0 THEN 0 ELSE floor($best / 16) END AS BIGINT)"

  // ---- q88's synthetic multilingual corpus --------------------------------
  // The driver's documents table is English word-soup; the ten-family
  // detector needs multilingual inputs. Both engines derive the SAME
  // corpus from documents with ONE shared SQL expression (Spark parses it
  // with expr(), DuckDB verbatim): each doc gets a per-family snippet
  // appended 1..4 times keyed on doc_id, then the whole content is
  // lowercased exactly as the reference lowercases extracted.content.

  /** One characteristic snippet per family, in family order. The ru
    * snippet includes 'ещё' — ё (U+0451) sits OUTSIDE the reference's
    * [а-я] class, a faithful quirk. The ja snippet contains ひらがな and
    * カタカナ (8 class hits per repeat); テスト contributes none. */
  val Snippets: Seq[(String, String)] = Seq(
    "en" -> "the cat and the dog sat on the mat with joy",
    "es" -> "el perro y la casa de los gatos para el pueblo",
    "fr" -> "le chien et la maison dans les rues avec le pain",
    "de" -> "der hund und die katze auf dem tisch mit der zeit für uns",
    "it" -> "il gatto e la casa ma con il vino di roma per il mare",
    "pt" -> "o gato e a casa mas em com o mar de lisboa para os campos",
    "ru" -> "привет мир это тест русского языка и слова ещё",
    "zh" -> "这是一个中文测试文档 包含汉字 数据处理系统",
    "ja" -> "ひらがなとカタカナのテストです",
    "ar" -> "هذا اختبار باللغة العربية للنص والكلمات")

  /** doc_id % 10 → family code, as a simple-CASE both dialects parse. */
  val FamCodeSql: String =
    "CASE CAST(doc_id % 10 AS INT) " +
      Snippets.zipWithIndex.map { case ((c, _), i) => s"WHEN $i THEN '$c'" }
        .mkString(" ") + " ELSE 'en' END"

  private val SnippetCaseSql: String =
    "CASE CAST(doc_id % 10 AS INT) " +
      Snippets.zipWithIndex.map { case ((_, t), i) => s"WHEN $i THEN '$t'" }
        .mkString(" ") + " ELSE '' END"

  /** The multilingual text RAW (reference: extracted.content — original
    * case; textSample samples THIS, :4233): base doc + snippet repeated
    * 1+doc_id%4 times. */
  val RawMlTextSql: String =
    s"concat(text, ' ', repeat(($SnippetCaseSql) || ' ', CAST(1 + doc_id % 4 AS INT)))"

  /** The detector input: the raw text lowercased (reference lowercases the
    * whole content before matching, :4191). */
  val MlTextSql: String = s"lower($RawMlTextSql)"

  /** textSample = content.substring(0, 200) + '...' (:4233 — the '...' is
    * appended unconditionally, even for content shorter than 200 chars).
    * Samples the RAW content, not the lowercased detector input. */
  def sampleSql(rawExpr: String): String = s"substr($rawExpr, 1, 200) || '...'"

  // ---- the full detector projection, shared by q88 and q93 ---------------

  /** Runs the whole detect_language output shape over an input that
    * carries (doc_id, mlt = lowercased content, html_lang, text_sample).
    * One implementation serves both the synthetic corpus (q88) and the
    * real parsed-pages path (q93); [[detectSql]] is its DuckDB twin. */
  def detect(ml: DataFrame): DataFrame = {
    val withM = Families.foldLeft(ml.withColumn("w", words(col("mlt")))) {
      (df, f) => df.withColumn(s"m_${f.code}", matches(col("mlt"), f))
    }
    val best = greatest(
      Families.map(f => score(col(s"m_${f.code}"), col("w"), f)): _*)
    val nDet = least(lit(5), Families.map(f =>
      when(included(col(s"m_${f.code}"), col("w")), 1).otherwise(0))
      .reduce(_ + _))
    withM.withColumn("best", best)
      .select(Seq(col("doc_id"), col("html_lang"), col("w")) ++
        Families.map(f => col(s"m_${f.code}")) ++ Seq(
          primaryLang(col("best")).as("primary_lang"),
          primaryConf100(col("best")).as("primary_conf_x100"),
          (col("best") >= 0 && primaryConf100(col("best")) >= 80)
            .as("is_confident"),
          nDet.as("n_detected"),
          col("text_sample")): _*)
      .orderBy(col("doc_id"))
  }

  /** DuckDB twin of [[detect]]: `mlSelect` must be a SELECT yielding
    * (doc_id, mlt, html_lang, text_sample). */
  def detectSql(mlSelect: String): String = {
    val mCols = Families.map(f =>
      s"${sqlMatches("mlt", f)} AS m_${f.code}").mkString(",\n    ")
    val scores = Families.map(f =>
      sqlScore(s"m_${f.code}", "w", f)).mkString(",\n      ")
    val incSum = Families.map(f =>
      s"CASE WHEN ${sqlIncluded(s"m_${f.code}", "w")} THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH ml AS (
       |$mlSelect),
       |m AS (
       |  SELECT doc_id, html_lang, text_sample, ${sqlWords("mlt")} AS w,
       |    $mCols
       |  FROM ml),
       |sc AS (
       |  SELECT *, greatest(
       |      $scores) AS best
       |  FROM m)
       |SELECT doc_id, html_lang, w,
       |  ${Families.map(f => s"m_${f.code}").mkString(", ")},
       |  ${sqlPrimaryLang("best")} AS primary_lang,
       |  ${sqlPrimaryConf100("best")} AS primary_conf_x100,
       |  (best >= 0 AND ${sqlPrimaryConf100("best")} >= 80) AS is_confident,
       |  least(5, $incSum) AS n_detected,
       |  text_sample
       |FROM sc ORDER BY doc_id""".stripMargin
  }

  /** htmlLang: `$('html').attr('lang') || $('html').attr('xml:lang')` —
    * the JS `||` falls through EMPTY strings (falsy), not just missing
    * ones (:4189). Synthetic: a lang attr on every 3rd doc, an xml:lang
    * on every 4th-plus-1, both derived from the doc's snippet family. */
  val HtmlLangSql: String = {
    val langAttr = s"CASE WHEN doc_id % 3 = 0 THEN ($FamCodeSql) ELSE '' END"
    val xmlAttr = s"CASE WHEN doc_id % 4 = 1 THEN 'x-' || ($FamCodeSql) ELSE '' END"
    s"CASE WHEN ($langAttr) <> '' THEN ($langAttr) " +
      s"WHEN ($xmlAttr) <> '' THEN ($xmlAttr) ELSE '' END"
  }
}
