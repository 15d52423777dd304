package graft.tools

import graft.core.{Extract, Html, Selector, UrlNorm}
import graft.core.Html.{Doc, Element}

/** Per-page tool kernels — scalar ports of the reference's MCP tool surface
  * (SURVEY.md §2b/§2c). Each is a pure function over a parsed Doc; the
  * distributed form is a UDF + explode in ToolQueries. file:line citations
  * are to /root/reference/src/server.ts unless noted.
  */
object PageTools {

  // Precompiled hot-path patterns (guide §4: these kernels run once per row
  // inside Dataset closures; String.replaceAll/split/matches compile their
  // regex on every call — per token for the keyword alpha filter). Pattern
  // strings and replacement strings are byte-identical to the previous
  // inline literals, so output is unchanged (golden suites pin this).
  private val SentenceSplitRe = java.util.regex.Pattern.compile("[.!?]+")
  private val PhoneNonDigitPlusRe = java.util.regex.Pattern.compile("[^\\d+]")
  private val PhonePlusRe = java.util.regex.Pattern.compile("\\+")
  private val PhoneYearRe = java.util.regex.Pattern.compile("(19|20)\\d{2}")
  private val PhoneRepeatRe = java.util.regex.Pattern.compile("(\\d)\\1{6,}")
  private val TelStripRe = java.util.regex.Pattern.compile("[^\\d+\\-\\s()]")
  private val NonDigitRe = java.util.regex.Pattern.compile("[^\\d]")
  private val MdImgRe = java.util.regex.Pattern.compile("!\\[.*?\\]\\(.*?\\)")
  private val MdLinkRe = java.util.regex.Pattern.compile("\\[.*?\\]\\(.*?\\)")
  private val MdFenceRe = java.util.regex.Pattern.compile("(?s)```.*?```")
  private val MdCodeRe = java.util.regex.Pattern.compile("`.*?`")
  private val MdHeadingRe = java.util.regex.Pattern.compile("#{1,6}\\s")
  private val MdBoldRe = java.util.regex.Pattern.compile("\\*\\*.*?\\*\\*")
  private val MdItalicRe = java.util.regex.Pattern.compile("\\*.*?\\*")
  private val MdBulletRe = java.util.regex.Pattern.compile("[-*+]\\s")
  private val MdNumListRe = java.util.regex.Pattern.compile("\\d+\\.\\s")
  private val MdNewlinesRe = java.util.regex.Pattern.compile("\\n+")

  // ---------------- get_page_metadata (:1590-1636) ----------------
  final case class PageMeta(
      title: String, description: String, keywords: String, author: String,
      canonical: String, ogTitle: String, ogImage: String, ogUrl: String,
      twitterCard: String, viewport: String, robots: String,
      language: String, charset: String)

  private def metaAttr(doc: Doc, sel: String, a: String = "content"): String =
    doc.first(sel).flatMap(_.attr(a)).getOrElse("")

  def pageMetadata(doc: Doc): PageMeta = {
    val extractedTitle = Extract.extractTitle(doc)
    val extractedAuthor = Extract.extractAuthor(doc)
    val titleText = doc.first("title").map(_.text()).getOrElse("")
    PageMeta(
      title = if (titleText.nonEmpty) titleText else extractedTitle,
      description = {
        val d = metaAttr(doc, "meta[name=\"description\"]")
        if (d.nonEmpty) d else metaAttr(doc, "meta[property=\"og:description\"]")
      },
      keywords = metaAttr(doc, "meta[name=\"keywords\"]"),
      author = {
        val a = metaAttr(doc, "meta[name=\"author\"]")
        if (a.nonEmpty) a else extractedAuthor.getOrElse("")
      },
      canonical = metaAttr(doc, "link[rel=\"canonical\"]", "href"),
      ogTitle = metaAttr(doc, "meta[property=\"og:title\"]"),
      ogImage = metaAttr(doc, "meta[property=\"og:image\"]"),
      ogUrl = metaAttr(doc, "meta[property=\"og:url\"]"),
      twitterCard = metaAttr(doc, "meta[name=\"twitter:card\"]"),
      viewport = metaAttr(doc, "meta[name=\"viewport\"]"),
      robots = metaAttr(doc, "meta[name=\"robots\"]"),
      language = doc.root.attr("lang").getOrElse(
        metaAttr(doc, "meta[http-equiv=\"content-language\"]")),
      charset = {
        val c = metaAttr(doc, "meta[charset]", "charset")
        if (c.nonEmpty) c else metaAttr(doc, "meta[http-equiv=\"content-type\"]")
      })
  }

  // ---------------- extract_links (:1699-1774) ----------------
  // NB reference quirk: hrefs resolve against the ORIGIN, not the page URL
  // (`new URL(href, baseUrl.origin)`, :1737) — '/a/b' and 'a/b' both land
  // under the host root. Distinct from the sitemap BFS resolution (:3568).
  final case class Link(href: String, text: String, title: String, internal: Boolean)

  def extractLinks(doc: Doc, pageUrl: String): Seq[Link] = {
    val canonical = UrlNorm.canonicalize(pageUrl).getOrElse(pageUrl)
    val srcHost = UrlNorm.host(canonical)
    val origin = UrlNorm.parse(canonical)
      .map(p => p.copy(path = "/", query = "").render).getOrElse(canonical)
    doc.select("a[href]").flatMap { a =>
      a.attr("href").flatMap { href =>
        UrlNorm.resolve(href, origin).map { abs =>
          Link(abs, a.text().trim, a.attr("title").getOrElse(""),
            UrlNorm.host(abs) == srcHost)
        }
      }
    }
  }

  // ---------------- extract_images (:1776-1850) ----------------
  final case class Image(src: String, alt: String, title: String,
      width: String, height: String)

  def extractImages(doc: Doc, pageUrl: String): Seq[Image] = {
    val canonical = UrlNorm.canonicalize(pageUrl).getOrElse(pageUrl)
    val origin = UrlNorm.parse(canonical)
      .map(p => p.copy(path = "/", query = "").render).getOrElse(canonical)
    doc.select("img[src]").flatMap { img =>
      img.attr("src").flatMap { src =>
        UrlNorm.resolve(src, origin).map { abs =>
          Image(abs, img.attr("alt").getOrElse(""), img.attr("title").getOrElse(""),
            img.attr("width").getOrElse(""), img.attr("height").getOrElse(""))
        }
      }
    }
  }

  // ---------------- extract_forms (:2491-2584) ----------------
  final case class FormField(ftype: String, name: String, id: String,
      placeholder: String, required: Boolean, disabled: Boolean,
      hidden: Boolean, label: String, options: Seq[String])
  final case class Form(action: String, method: String, enctype: String,
      name: String, id: String, fields: Seq[FormField])

  def extractForms(doc: Doc, includeHidden: Boolean = false,
      includeDisabled: Boolean = false): Seq[Form] = {
    doc.select("form").map { f =>
      val fields = Selector.select(f, "input, textarea, select").flatMap { el =>
        val ftype = el.attr("type").getOrElse(el.tag)
        val hidden = el.attr("type").contains("hidden")
        val disabled = el.hasAttr("disabled")
        if ((!includeHidden && hidden) || (!includeDisabled && disabled)) None
        else {
          val id = el.id
          val label =
            if (id.nonEmpty)
              Selector.select(f, s"""label[for="$id"]""").headOption
                .map(_.text().trim).getOrElse("")
            else ""
          val options =
            if (el.tag == "select")
              Selector.select(el, "option").map(_.text().trim)
            else Seq.empty
          Some(FormField(ftype, el.attr("name").getOrElse(""), id,
            el.attr("placeholder").getOrElse(""), el.hasAttr("required"),
            disabled, hidden, label, options))
        }
      }
      Form(f.attr("action").getOrElse(""),
        f.attr("method").getOrElse("GET"),
        f.attr("enctype").getOrElse("application/x-www-form-urlencoded"),
        f.attr("name").getOrElse(""), f.id, fields)
    }
  }

  // ---------------- extract_tables (:2586-2688) ----------------
  final case class Table(index: Int, headers: Seq[String], rows: Seq[Seq[String]],
      columnCount: Int)

  def extractTables(doc: Doc, includeHeaders: Boolean = true,
      minRows: Int = 1): Seq[Table] = {
    doc.select("table").zipWithIndex.flatMap { case (t, idx) =>
      val headers =
        if (includeHeaders)
          Selector.select(t, "thead tr, tr:first-child").headOption.toSeq
            .flatMap(tr => Selector.select(tr, "th, td").map(_.text().trim))
        else Seq.empty
      val dataRows =
        if (includeHeaders) Selector.select(t, "tbody tr, tr:not(:first-child)")
        else Selector.select(t, "tr")
      val rows = dataRows.map(tr =>
        Selector.select(tr, "td, th").map(_.text().trim)).filter(_.nonEmpty)
      if (rows.length >= minRows)
        Some(Table(idx, headers, rows,
          math.max(headers.length, if (rows.isEmpty) 0 else rows.map(_.length).max)))
      else None
    }
  }

  /** CSV rendering with quote doubling (:2652-2656). */
  def tableCsv(t: Table): String = {
    def row(r: Seq[String]) = r.map(c => "\"" + c.replace("\"", "\"\"") + "\"").mkString(",")
    val head = if (t.headers.nonEmpty) row(t.headers) + "\n" else ""
    head + t.rows.map(row).mkString("\n")
  }

  /** Markdown pipes rendering (:2658-2666). */
  def tableMarkdown(t: Table): String = {
    val head =
      if (t.headers.nonEmpty)
        "| " + t.headers.mkString(" | ") + " |\n| " +
          t.headers.map(_ => "---").mkString(" | ") + " |\n"
      else ""
    head + t.rows.map(r => "| " + r.mkString(" | ") + " |").mkString("\n")
  }

  // ---------------- extract_headings (:3092-3163) ----------------
  final case class Heading(level: Int, index: Int, id: String, cls: String, text: String)

  def extractHeadings(doc: Doc, levels: Seq[Int] = 1 to 6): Seq[Heading] = {
    val hs = levels.flatMap { level =>
      doc.select(s"h$level").zipWithIndex.map { case (h, i) =>
        Heading(level, i, h.id, h.attr("class").getOrElse(""), h.text().trim)
      }
    }
    hs.sortBy(h => (h.level, h.index)) // (:3138-3141)
  }

  // ---------------- extract_contact_info (:2951-3090) ----------------
  final case class Contacts(emails: Seq[String], phones: Seq[String], addresses: Seq[String])

  private val EmailRe = "\\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Z|a-z]{2,}\\b".r
  private val IntlPhoneRe = "\\+[1-9]\\d{0,3}[\\s\\-(]?\\(?\\d{1,4}\\)?[\\s\\-]?\\d{1,4}[\\s\\-]?\\d{1,4}[\\s\\-]?\\d{0,4}".r
  private val UsPhoneRe = "\\(?\\d{3}\\)?[\\s\\-]?\\d{3}[\\s\\-]?\\d{4}(?!\\d)".r

  /** Phone false-positive filter (:3017-3043). */
  private[tools] def validPhone(phone: String): Boolean = {
    val clean = PhoneNonDigitPlusRe.matcher(phone).replaceAll("")
    val numeric = PhonePlusRe.matcher(clean).replaceFirst("")
    if (numeric.length < 7 || numeric.length > 15) return false
    if (PhoneYearRe.matcher(numeric).matches()) return false // years
    if (PhoneRepeatRe.matcher(numeric).matches()) return false // repeats
    if (clean.startsWith("+") && numeric.length < 8) return false
    if (!phone.exists(c => c == ' ' || c == '-' || c == '(' || c == ')') && numeric.length < 10) return false
    true
  }

  def extractContacts(doc: Doc): Contacts = {
    val pageText = doc.root.text()
    val emails = EmailRe.findAllIn(pageText).toSeq
    val mailto = doc.select("a[href^=\"mailto:\"]").flatMap(_.attr("href"))
      .map(_.stripPrefix("mailto:").split("\\?")(0)).filter(_.nonEmpty)
    val phones = (IntlPhoneRe.findAllIn(pageText).toSeq ++
      UsPhoneRe.findAllIn(pageText).toSeq).filter(validPhone)
    val tel = doc.select("a[href^=\"tel:\"]").flatMap(_.attr("href"))
      .map(p => TelStripRe.matcher(p.stripPrefix("tel:")).replaceAll(""))
      .filter(p => NonDigitRe.matcher(p).replaceAll("").length >= 7)
    val addresses = (doc.select("[class*=\"address\"], [id*=\"address\"], address") ++
      doc.select("[itemtype*=\"PostalAddress\"], [typeof*=\"PostalAddress\"]"))
      .map(_.text().trim).filter(_.length > 10)
    Contacts((emails ++ mailto).distinct, (phones ++ tel).distinct, addresses.distinct)
  }

  // ---------------- extract_entities (:4245-4309) ----------------
  final case class Entities(emails: Seq[String], urls: Seq[String],
      phones: Seq[String], dates: Seq[String], times: Seq[String],
      currencies: Seq[String], percentages: Seq[String],
      hashtags: Seq[String], mentions: Seq[String], coordinates: Seq[String])

  // Family patterns precompiled once (was ten Pattern.compile per document);
  // strings identical to the previous inline literals, incl. the "(?i)"
  // prefix the `flags = "i"` argument used to add to the dates pattern.
  private val EntEmailRe = "\\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Z|a-z]{2,}\\b".r
  private val EntUrlRe = "https?://[^\\s]+".r
  private val EntPhoneRe = "\\b(?:\\+?1[-.]?)?\\(?([0-9]{3})\\)?[-.]?([0-9]{3})[-.]?([0-9]{4})\\b".r
  private val EntDateRe = "(?i)\\b(?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)[a-z]*\\s+\\d{1,2},?\\s+\\d{4}\\b".r
  private val EntTimeRe = "\\b\\d{1,2}:\\d{2}(?::\\d{2})?\\s*(?:AM|PM|am|pm)?\\b".r
  private val EntCurrencyRe = "\\$\\d+(?:,\\d{3})*(?:\\.\\d{2})?|\\d+(?:,\\d{3})*(?:\\.\\d{2})?\\s*(?:USD|EUR|GBP|JPY)".r
  private val EntPercentRe = "\\d+(?:\\.\\d+)?%".r
  private val EntHashtagRe = "#\\w+".r
  private val EntMentionRe = "@\\w+".r
  private val EntCoordRe = "\\b-?\\d{1,3}\\.\\d+,\\s*-?\\d{1,3}\\.\\d+\\b".r

  def extractEntities(content: String): Entities = {
    def all(re: scala.util.matching.Regex): Seq[String] =
      re.findAllIn(content).toSeq.distinct
    Entities(
      emails = all(EntEmailRe),
      urls = all(EntUrlRe),
      phones = all(EntPhoneRe),
      dates = all(EntDateRe),
      times = all(EntTimeRe),
      currencies = all(EntCurrencyRe),
      percentages = all(EntPercentRe),
      hashtags = all(EntHashtagRe),
      mentions = all(EntMentionRe),
      coordinates = all(EntCoordRe))
  }

  // ---------------- extract_keywords (:3949-4077) ----------------
  /** Enhanced stopword set incl. technical terms (:3993-4008). */
  val KeywordStopWords: Set[String] = Set(
    "the", "and", "or", "but", "in", "on", "at", "to", "for", "of", "with", "by",
    "is", "are", "was", "were", "be", "been", "have", "has", "had", "do", "does", "did",
    "will", "would", "could", "should", "may", "might", "can", "this", "that", "these", "those",
    "a", "an", "as", "if", "so", "no", "not", "all", "any", "both", "each", "few", "more",
    "most", "other", "some", "such", "only", "own", "same", "than", "too", "very", "just",
    "now", "here", "there", "when", "where", "why", "how", "what", "which", "who", "whom",
    "png", "jpg", "jpeg", "gif", "svg", "webp", "pdf", "doc", "docx", "xls", "xlsx",
    "ppt", "pptx", "zip", "rar", "tar", "gz", "mp3", "mp4", "avi", "mov", "wmv",
    "html", "css", "js", "javascript", "php", "asp", "jsp", "xml", "json",
    "http", "https", "www", "com", "org", "net", "edu", "gov", "mil",
    "alt", "src", "href", "title", "class", "div", "span", "img", "link",
    "width", "height", "size", "px", "em", "rem", "pt", "pc", "mm", "cm", "in",
    "rgb", "rgba", "hex", "color", "background", "border", "margin", "padding")

  /** Markdown stripping pre-pass — including the reference's quirk that
    * `'$1'` replacements reference a nonexistent capture group, inserting a
    * literal `$1` (:3981, 3985-3986). Replicated faithfully. */
  def stripMarkdown(content: String): String = {
    var r = content
    r = MdImgRe.matcher(r).replaceAll("")
    r = MdLinkRe.matcher(r).replaceAll("\\$1") // reference quirk: literal $1
    r = MdFenceRe.matcher(r).replaceAll("")
    r = MdCodeRe.matcher(r).replaceAll("")
    r = MdHeadingRe.matcher(r).replaceAll("")
    r = MdBoldRe.matcher(r).replaceAll("\\$1") // reference quirk: literal $1
    r = MdItalicRe.matcher(r).replaceAll("\\$1") // reference quirk: literal $1
    r = MdBulletRe.matcher(r).replaceAll("")
    r = MdNumListRe.matcher(r).replaceAll("")
    r = MdNewlinesRe.matcher(r).replaceAll(" ")
    r.trim
  }

  final case class Keyword(keyword: String, frequency: Int, isPhrase: Boolean)

  def extractKeywords(content: String, maxKeywords: Int = 10,
      includePhrases: Boolean = true): Seq[Keyword] = {
    val plain = stripMarkdown(content)
    // Single-scan tokenizer, provably ≡ the reference formula
    // lowercase → replaceAll("[^a-z\\s]"," ") → split("\\s+") → filters:
    // after the replace, every char outside [a-z] is a separator (original
    // \s chars become split separators, every other non-[a-z] char becomes
    // a space), so tokens are exactly the maximal [a-z] runs of the
    // lowercased string, in order; the post-split [a-z]+ filter is then
    // always true, and the length/stopword filters commute per token.
    def tokensOf(s: String): Seq[String] = {
      val lower = s.toLowerCase
      val out = scala.collection.mutable.ArrayBuffer[String]()
      var i = 0
      val n = lower.length
      while (i < n) {
        val c = lower.charAt(i)
        if (c >= 'a' && c <= 'z') {
          var j = i + 1
          while (j < n && { val d = lower.charAt(j); d >= 'a' && d <= 'z' }) j += 1
          val len = j - i
          if (len >= 3 && len <= 20) {
            val w = lower.substring(i, j)
            if (!KeywordStopWords.contains(w)) out += w
          }
          i = j
        } else i += 1
      }
      out.toSeq
    }
    val words = tokensOf(plain)
    val singles = words.groupBy(identity).view.mapValues(_.size).toSeq
      .sortBy { case (w, c) => (-c, w) }
      .take(maxKeywords)
      .map { case (w, c) => Keyword(w, c, isPhrase = false) }
    val phrases = if (!includePhrases) Seq.empty else {
      val counts = scala.collection.mutable.Map[String, Int]()
      SentenceSplitRe.split(plain).foreach { sentence =>
        val sw = tokensOf(sentence)
        sw.sliding(2).filter(_.size == 2).foreach { pair =>
          val p = pair.mkString(" ")
          counts(p) = counts.getOrElse(p, 0) + 1
        }
      }
      counts.toSeq.filter(_._2 >= 2)
        .sortBy { case (p, c) => (-c, p) }
        .take(maxKeywords / 2)
        .map { case (p, c) => Keyword(p, c, isPhrase = true) }
    }
    (singles ++ phrases).take(maxKeywords)
  }

  // ---------------- classify_content (:4407-4503) ----------------
  val CategoryKeywords: Map[String, Seq[String]] = Map(
    "technology" -> Seq("software", "programming", "code", "developer", "tech", "computer", "digital", "app", "website", "api", "database", "algorithm", "javascript", "python", "react", "node"),
    "business" -> Seq("company", "business", "market", "sales", "revenue", "profit", "customer", "service", "product", "strategy", "management", "finance", "investment", "startup", "enterprise"),
    "education" -> Seq("learn", "education", "school", "university", "course", "student", "teacher", "study", "knowledge", "skill", "training", "academic", "research", "degree", "certification"),
    "health" -> Seq("health", "medical", "doctor", "patient", "treatment", "medicine", "hospital", "care", "wellness", "fitness", "nutrition", "disease", "therapy", "clinic", "pharmaceutical"),
    "news" -> Seq("news", "report", "article", "journalist", "media", "press", "breaking", "update", "story", "headline", "coverage", "interview", "investigation", "politics", "government"),
    "entertainment" -> Seq("movie", "music", "game", "entertainment", "celebrity", "show", "film", "video", "streaming", "concert", "album", "artist", "actor", "director", "review"),
    "sports" -> Seq("sport", "team", "player", "game", "match", "score", "league", "championship", "tournament", "football", "basketball", "soccer", "baseball", "tennis", "golf"),
    "travel" -> Seq("travel", "trip", "vacation", "hotel", "flight", "destination", "tourism", "adventure", "explore", "journey", "booking", "resort", "guide", "attraction", "culture"),
    "food" -> Seq("food", "recipe", "cooking", "restaurant", "chef", "cuisine", "meal", "ingredient", "dish", "kitchen", "dining", "taste", "flavor", "nutrition", "diet"),
    "fashion" -> Seq("fashion", "style", "clothing", "brand", "design", "trend", "outfit", "wear", "collection", "designer", "model", "beauty", "accessories", "luxury", "retail"))

  final case class Classification(category: String, matches: Int, matchedKeywords: Seq[String])

  // keyword -> categories lookup, built once. All category keywords are pure
  // lowercase alpha, so the reference's `\b<kw>\b` whole-word regex match is
  // exactly token equality under a \W+ tokenizer — one pass over the text
  // instead of ~160 regex compilations per document (was ~20 ms/doc).
  private val KeywordToCategories: Map[String, Seq[String]] = {
    val pairs = for ((cat, kws) <- CategoryKeywords.toSeq; k <- kws) yield (k, cat)
    pairs.groupBy(_._1).map { case (k, cs) => k -> cs.map(_._2) }
  }
  private val CategoriesSorted: Seq[String] = CategoryKeywords.keys.toSeq.sorted

  /** Whole-word match counts per category; confidence banding left to the
    * caller (confidence = min(1, matches/(wordCount*0.01)), :4461 — a
    * float; we surface raw integer matches for oracle-stable output). */
  def classify(content: String): Seq[Classification] = {
    // single tokenize pass: count occurrences of each known keyword
    val counts = scala.collection.mutable.HashMap.empty[String, Int]
    var i = 0
    val lower = content.toLowerCase
    val n = lower.length
    val sb = new java.lang.StringBuilder(24)
    while (i <= n) {
      val c = if (i < n) lower.charAt(i) else ' '
      // ASCII \w only — Java's \b word boundary (no UNICODE_CHARACTER_CLASS)
      // treats é etc. as non-word chars, so the tokenizer must too
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == '_') sb.append(c)
      else if (sb.length > 0) {
        val w = sb.toString
        if (KeywordToCategories.contains(w)) counts(w) = counts.getOrElse(w, 0) + 1
        sb.setLength(0)
      }
      i += 1
    }
    CategoriesSorted.flatMap { cat =>
      val kws = CategoryKeywords(cat)
      val matched = kws.filter(k => counts.getOrElse(k, 0) > 0)
      val total = kws.map(k => counts.getOrElse(k, 0)).sum
      if (total > 0) Some(Classification(cat, total, matched)) else None
    }
  }

  // ---------------- calculateTextSimilarity (:24-39) ----------------
  /** Jaccard over lowercase word sets.
    *
    * Word sets are built with a single scan: split("\\s+") + nonEmpty ≡
    * the maximal runs of non-\s chars (Java \s is exactly
    * [ \t\n \x0B \f\r]), so membership and set contents are identical to
    * the previous regex-split form without allocating every token array.
    */
  private def isJavaWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == 11.toChar || c == '\f' || c == '\r'

  private def wordSet(s: String): Set[String] = {
    val lower = s.toLowerCase
    val out = Set.newBuilder[String]
    var i = 0
    val n = lower.length
    while (i < n) {
      if (!isJavaWs(lower.charAt(i))) {
        var j = i + 1
        while (j < n && !isJavaWs(lower.charAt(j))) j += 1
        out += lower.substring(i, j)
        i = j
      } else i += 1
    }
    out.result()
  }

  def textSimilarity(a: String, b: String): Double = {
    val wa = wordSet(a)
    val wb = wordSet(b)
    if (wa.isEmpty && wb.isEmpty) 1.0
    else {
      val inter = wa.intersect(wb).size
      inter.toDouble / (wa.size + wb.size - inter)
    }
  }

  // ---------------- validate_html (:3620-3733) ----------------
  final case class HtmlValidation(
      hasHtml: Boolean, hasHead: Boolean, hasBody: Boolean, hasTitle: Boolean,
      duplicateIds: Int, imagesWithoutAlt: Int, unlabeledInputs: Int,
      h1Count: Int, inlineScripts: Int, score: Int)

  def validateHtml(doc: Doc): HtmlValidation = {
    val ids = doc.root.descendants.map(_.id).filter(_.nonEmpty).toSeq
    val dupIds = ids.groupBy(identity).count(_._2.size > 1)
    val noAlt = doc.select("img").count(!_.hasAttr("alt"))
    val inputs = doc.select("input").filterNot(i =>
      i.attr("type").exists(t => t == "hidden" || t == "submit" || t == "button"))
    val unlabeled = inputs.count { i =>
      i.id.isEmpty || doc.select(s"""label[for="${i.id}"]""").isEmpty
    }
    val h1s = doc.select("h1").size
    val inline = doc.select("script").count(!_.hasAttr("src"))
    var issues = 0; var warnings = 0
    if (doc.first("title").isEmpty) issues += 1
    if (dupIds > 0) issues += dupIds
    if (noAlt > 0) warnings += noAlt
    if (unlabeled > 0) warnings += unlabeled
    if (h1s == 0 || h1s > 1) warnings += 1
    if (inline > 5) warnings += 1
    HtmlValidation(
      hasHtml = true, hasHead = true, hasBody = true,
      hasTitle = doc.first("title").isDefined,
      duplicateIds = dupIds, imagesWithoutAlt = noAlt,
      unlabeledInputs = unlabeled, h1Count = h1s, inlineScripts = inline,
      score = math.max(0, 100 - 10 * issues - 2 * warnings)) // (:3722)
  }

  // ---------------- detect_tracking (:5657-5837) ----------------
  final case class Tracking(googleAnalytics: Boolean, facebookPixel: Boolean,
      gtm: Boolean, hotjar: Boolean, trackingPixels: Int, privacyScore: Int)

  def detectTracking(html: String, doc: Doc): Tracking = {
    val ga = html.contains("google-analytics.com") || html.contains("gtag(") ||
      html.contains("ga('create'")
    val fb = html.contains("facebook.net/tr") || html.contains("fbq(")
    val gtm = html.contains("googletagmanager.com")
    val hj = html.contains("hotjar.com") || html.contains("hj(")
    val pixels = doc.select("img").count { i =>
      (i.attr("width").contains("1") && i.attr("height").contains("1")) ||
        i.attr("src").exists(s => s.contains("pixel") || s.contains("track"))
    }
    val high = Seq(fb).count(identity)
    val med = Seq(ga, gtm).count(identity)
    val low = Seq(hj).count(identity) + (if (pixels > 0) 1 else 0)
    Tracking(ga, fb, gtm, hj, pixels,
      math.max(0, 100 - 20 * high - 10 * med - 5 * low)) // (:5798-5803)
  }

  // ---------------- scan_vulnerabilities (:5184-5345) ----------------
  final case class VulnScan(mixedContent: Int, inlineScripts: Int,
      passwordFormOverGet: Boolean, jquery1x: Boolean, score: Int)

  private val Jq1Re = "jquery[/-]1\\.\\d".r

  def scanVulnerabilities(html: String, doc: Doc, pageUrl: String): VulnScan = {
    val isHttps = pageUrl.startsWith("https://")
    val mixed = if (isHttps)
      doc.select("img[src], script[src], link[href]").count(e =>
        e.attr("src").orElse(e.attr("href")).exists(_.startsWith("http://")))
    else 0
    val inline = doc.select("script").count(!_.hasAttr("src"))
    val pwGet = doc.select("form").exists { f =>
      f.attr("method").forall(_.equalsIgnoreCase("get")) &&
        Selector.select(f, "input[type=\"password\"]").nonEmpty
    }
    val jq1 = Jq1Re.findFirstIn(html.toLowerCase).isDefined
    var critical = 0; var highC = 0; var medium = 0; var lowC = 0
    if (pwGet) critical += 1
    if (mixed > 0) highC += 1
    if (jq1) highC += 1
    if (inline > 5) medium += 1
    VulnScan(mixed, inline, pwGet, jq1,
      math.max(0, 100 - 25 * critical - 15 * highC - 10 * medium - 5 * lowC)) // (:5308-5313)
  }

  // ---------------- check_ssl_certificate stand-in (:5347-5490) ----------
  /** The reference SIMULATES certificates (random issue/expiry dates,
    * fixed fingerprints, RSA-2048/SHA256). Deterministic stand-in: the
    * days-until-expiry is hash-derived from the host (0..364, replacing
    * `Math.random()*365`), everything else reproduces the reference's
    * fixed fields and its grade logic (:5472: no issues ⇒ A, any high ⇒ C,
    * else B — with RSA-2048+SHA256 only expiry issues can fire). */
  final case class SslCheck(isSecure: Boolean, commonName: String,
      daysUntilExpiry: Int, expiringSoon: Boolean, keySize: Int,
      sigAlgorithm: String, sha256Fp: String, grade: String)

  def sslStandIn(url: String): SslCheck = {
    val isHttps = url.startsWith("https://")
    val host = UrlNorm.host(url).getOrElse("")
    if (!isHttps)
      SslCheck(isSecure = false, host, -1, expiringSoon = false, 0, "", "", "")
    else {
      val days = java.lang.Math.floorMod(
        UrlNorm.xxh64(host.getBytes("UTF-8"), 7L), 365L).toInt
      val soon = days < 30 // (:5414)
      SslCheck(isSecure = true, host, days, soon, 2048, "SHA256withRSA",
        "AA:BB:CC:DD:EE:FF:00:11:22:33:44:55:66:77:88:99:AA:BB:CC:DD:EE:FF:00:11:22:33:44:55:66:77:88:99:AA:BB",
        if (soon) "B" else "A") // medium severity only ⇒ B (:5472)
    }
  }

  // ---------------- benchmark_performance stand-in (:6480-6620) ----------
  /** The reference's benchmark_performance simulates every metric with
    * Math.random() inside the documented ranges (server.ts:6485-6510); the
    * stand-in draws the same ranges deterministically from per-url salted
    * hashes. The score/grade/recommendation arithmetic (:6513-6585) is
    * left to the query layer so the DuckDB oracle recomputes it. Fractional
    * metrics are surfaced as scaled integers (cls x1000, MB x100) per the
    * oracle-parity conventions. */
  final case class BenchmarkPerf(fcpMs: Int, lcpMs: Int, clsX1000: Int,
      totalRequests: Int, totalSizeX100: Int, acc: Int, bp: Int, seo: Int)

  def benchmarkStandIn(url: String): BenchmarkPerf = {
    val bytes = url.getBytes("UTF-8")
    def in(salt: Long, lo: Int, span: Int): Int =
      lo + java.lang.Math.floorMod(UrlNorm.xxh64(bytes, salt), span.toLong).toInt
    BenchmarkPerf(
      fcpMs = in(1, 800, 1200), // 0.8-2.0s (:6487)
      lcpMs = in(2, 1200, 1800), // 1.2-3.0s (:6488)
      clsX1000 = in(3, 0, 300), // 0-0.3 (:6490)
      totalRequests = in(4, 25, 50), // (:6495)
      totalSizeX100 = in(5, 150, 300), // 1.5-4.5 MB (:6496)
      acc = in(6, 85, 15), // (:6516)
      bp = in(7, 80, 20), // (:6517)
      seo = in(8, 75, 25)) // (:6518)
  }

  // ---------------- check_privacy_policy checklist (:5839-5990) ----------
  /** Real parts of check_privacy_policy: the privacy/terms/cookie link
    * harvest (:5865-5893), consent selectors (:5896-5903). The GDPR/CCPA
    * 5-point arithmetic (:5931-5961) is left to the query layer so the
    * DuckDB oracle recomputes it from these raw counts. */
  final case class PrivacyChecklist(nPrivacyLinks: Int, nTermsLinks: Int,
      nCookieLinks: Int, cookieBanner: Boolean, optOutLinks: Boolean,
      dataRequestForm: Boolean)

  def privacyChecklist(doc: Doc): PrivacyChecklist = {
    var nP = 0; var nT = 0; var nC = 0
    doc.select("a").foreach { a =>
      a.attr("href").foreach { href =>
        val text = a.text().toLowerCase.trim
        if (text.contains("privacy") || text.contains("policy") || href.contains("privacy")) nP += 1
        if (text.contains("terms") || text.contains("service") || href.contains("terms")) nT += 1
        if (text.contains("cookie") || href.contains("cookie")) nC += 1
      }
    }
    val banner = doc.select(
      "[class*=\"cookie\"], [id*=\"cookie\"], [class*=\"consent\"], [id*=\"consent\"]").nonEmpty
    val optOut = doc.select("a[href*=\"opt-out\"], a[href*=\"unsubscribe\"]").nonEmpty
    val form = doc.select("form").exists { f =>
      val t = f.text().toLowerCase
      t.contains("data") && (t.contains("request") || t.contains("delete"))
    }
    PrivacyChecklist(nP, nT, nC, banner, optOut, form)
  }

  // ---------------- analyze_cookies stand-in (:5492-5655) ----------------
  /** The reference hard-codes a 4-cookie list whose only page-dependent
    * inputs are (https?, consent-banner present?, privacy link present?)
    * (:5517-5566, :5614-5615). This kernel extracts those inputs; the
    * count/issue/score arithmetic (:5570-5647) is pure and recomputed by
    * both engines in the query layer. */
  final case class CookiePageFlags(isHttps: Boolean, hasConsentBanner: Boolean,
      hasPrivacyPolicyLink: Boolean)

  def cookiePageFlags(doc: Doc, url: String): CookiePageFlags = CookiePageFlags(
    isHttps = url.startsWith("https://"),
    hasConsentBanner = doc.select(
      "[class*=\"cookie\"], [id*=\"cookie\"], [class*=\"consent\"], [id*=\"consent\"]").nonEmpty,
    hasPrivacyPolicyLink =
      doc.select("a[href*=\"privacy\"], a[href*=\"policy\"]").nonEmpty) // (:5615)

  // ---------------- analyze_page_speed (:4916-5034) ----------------------
  /** Deterministic parts of analyze_page_speed: resource counts, html size,
    * optimization-factor flags (:4946-4963). The wall-clock loadTime leg is
    * excluded (self-declared simulated); its score deductions never fire
    * with loadTime=0. NB reference quirk (:4981): the gradeMap lookup
    * iterates Object.entries ascending and `find`s the FIRST threshold
    * score >= t — key '0' always wins, so grade is always 'F'. Replicated
    * at the query layer. */
  final case class PageSpeed(images: Int, scripts: Int, stylesheets: Int,
      fonts: Int, videos: Int, htmlSize: Int, hasMinCss: Boolean,
      hasMinJs: Boolean, hasLazy: Boolean, hasCdn: Boolean, hasSw: Boolean,
      hasPreload: Boolean, hasPrefetch: Boolean)

  def pageSpeed(html: String, doc: Doc): PageSpeed = PageSpeed(
    images = doc.select("img").size,
    scripts = doc.select("script[src]").size,
    stylesheets = doc.select("link[rel=\"stylesheet\"]").size,
    fonts = doc.select("link[href*=\"font\"]").size,
    videos = doc.select("video, iframe[src*=\"youtube\"], iframe[src*=\"vimeo\"]").size,
    htmlSize = html.length,
    hasMinCss = doc.select("link[href*=\".min.css\"]").nonEmpty,
    hasMinJs = doc.select("script[src*=\".min.js\"]").nonEmpty,
    hasLazy = doc.select("img[loading=\"lazy\"]").nonEmpty,
    hasCdn = doc.select("script[src*=\"cdn\"], link[href*=\"cdn\"]").nonEmpty,
    hasSw = html.contains("serviceWorker") || html.contains("sw.js"),
    hasPreload = doc.select("link[rel=\"preload\"]").nonEmpty,
    hasPrefetch = doc.select("link[rel=\"prefetch\"]").nonEmpty)

  // ---------------- convert_to_pdf stand-in (:3736-3781) ----------------
  /** Deterministic page-count estimate: ceil(words/500) (:3767). */
  def pdfPageCount(wordCount: Int): Int = math.max(1, math.ceil(wordCount / 500.0).toInt)

  // ---------------- translate_content stand-in (:3895-3947) ----------------
  /** The reference "translates" by prefix-tagging (:3931-3936). */
  def translateStandIn(content: String, targetLang: String): String =
    s"[$targetLang] $content"
}
