package graft.core

import Html.{Comment, Element, Node, Text}

/** HTML→Markdown renderer — a faithful port of the Turndown v7.2.1 engine
  * as configured by the reference (/root/reference/src/extract.ts:23-47:
  * atx headings, fenced code, `-` bullets, `*` em, `**` strong, plus the
  * two custom rules removeScripts and preserveCodeBlocks, which are
  * consulted BEFORE the defaults — so every `<pre>` takes the custom
  * fenced path).
  *
  * The engine reproduces turndown.cjs.js structurally:
  *  - phase 1 `collapseWhitespace` (:455-527): document-order pass that
  *    collapses [ \r\n\t]+ runs, strips leading spaces after block
  *    boundaries, keeps them after void/inline-pre elements, and trims the
  *    trailing space before each block boundary — without mutating the
  *    shared DOM (per-Text collapsed values live in an identity map);
  *  - phase 2 `process`/`join` (:855-930): per-node rule replacement with
  *    newline-deduping joins (max 2), and `flankingWhitespace` (:647-677)
  *    computed from the COLLAPSED textContent — including the quirk that
  *    an inline element whose first child is an <img> duplicates the space
  *    after the image outside the delimiter (textContent ignores the img);
  *  - the escape table (:705-719) with its string-START-only anchors (the
  *    JS regexes carry /g but not /m), applied per text node.
  *
  * Byte-identity vs the real turndown is pinned by ReferenceGoldenSpec
  * (synthetic web + crafted rule-coverage + 120-doc differential fuzz).
  */
object Markdown {

  // turndown.cjs.js:28-35
  private val BlockTags = Set("address", "article", "aside", "audio",
    "blockquote", "body", "canvas", "center", "dd", "dir", "div", "dl", "dt",
    "fieldset", "figcaption", "figure", "footer", "form", "frameset", "h1",
    "h2", "h3", "h4", "h5", "h6", "header", "hgroup", "hr", "html", "isindex",
    "li", "main", "menu", "nav", "noframes", "noscript", "ol", "output", "p",
    "pre", "section", "table", "tbody", "td", "tfoot", "th", "thead", "tr",
    "ul")
  // turndown.cjs.js:41-44
  private val VoidTags = Set("area", "base", "br", "col", "command", "embed",
    "hr", "img", "input", "keygen", "link", "meta", "param", "source",
    "track", "wbr")
  // turndown.cjs.js:54-57
  private val MeaningfulWhenBlank = Set("a", "table", "thead", "tbody",
    "tfoot", "th", "td", "iframe", "script", "audio", "video")

  def isBlock(e: Element): Boolean = BlockTags.contains(e.tag)

  // JS \s (unicode whitespace set) vs the ASCII [ \t\r\n] subclass — the
  // flanking regex distinguishes them (edgeWhitespace, :668-677)
  private val WsClass =
    " \\t\\r\\n\\x0B\\f\\u00A0\\u1680\\u2000-\\u200A\\u2028\\u2029\\u202F\\u205F\\u3000\\uFEFF"
  private val EdgeRe = java.util.regex.Pattern.compile(
    "^(([ \\t\\r\\n]*)([" + WsClass + "]*))" +
      "(?:(?=[^" + WsClass + "])(?s:.)*[^" + WsClass + "])?" +
      "(([" + WsClass + "]*?)([ \\t\\r\\n]*))$")
  private val AllWsRe = java.util.regex.Pattern.compile("^[" + WsClass + "]*$")

  private val TrimRe = java.util.regex.Pattern.compile(
    "^[" + WsClass + "]+|[" + WsClass + "]+$")

  /** JS String.prototype.trim (unicode whitespace set). */
  private def jsTrim(s: String): String = TrimRe.matcher(s).replaceAll("")

  // Precompiled per-node patterns (these run once per text node / element
  // during render; String.replaceAll compiled them on every call). Pattern
  // and replacement strings are identical to the previous inline literals —
  // the 385-doc byte-identity goldens pin the output.
  private val EscDashRe = java.util.regex.Pattern.compile("^-")
  private val EscPlusRe = java.util.regex.Pattern.compile("^\\+ ")
  private val EscEqRe = java.util.regex.Pattern.compile("^(=+)")
  private val EscHeadingRe = java.util.regex.Pattern.compile("^(#{1,6}) ")
  private val EscFenceRe = java.util.regex.Pattern.compile("^~~~")
  private val EscGtRe = java.util.regex.Pattern.compile("^>")
  private val EscOlRe = java.util.regex.Pattern.compile("^(\\d+)\\. ")
  private val CleanAttrRe = java.util.regex.Pattern.compile("(\\n+\\s*)+")
  private val TrailSpaceRe = java.util.regex.Pattern.compile(" $")
  private val CollapseWsRe = java.util.regex.Pattern.compile("[ \\r\\n\\t]+")
  private val LeadCtlRe = java.util.regex.Pattern.compile("^[\\t\\r\\n]+")
  private val TrailCtlWsRe = java.util.regex.Pattern.compile("[\\t\\r\\n" + WsClass + "]+$")
  private val EdgeNlRe = java.util.regex.Pattern.compile("^\\n+|\\n+$")
  private val LineStartRe = java.util.regex.Pattern.compile("(?m)^")
  private val LeadNlRe = java.util.regex.Pattern.compile("^\\n+")
  private val TrailNlRe = java.util.regex.Pattern.compile("\\n+$")
  private val NlRe = java.util.regex.Pattern.compile("\n")
  private val ParenRe = java.util.regex.Pattern.compile("([()])")
  private val CodeNlRe = java.util.regex.Pattern.compile("\\r?\\n|\\r")
  private val BacktickRunRe = "`+".r
  private val CodeLangRe = "language-(\\w+)".r

  /** Entry point: render the (cleaned) content element to Markdown. */
  def render(content: Element): String = new Renderer(content).run()

  /** Turndown's escape table (:705-719). NB the ^ anchors are STRING-start
    * (the JS regexes have /g but no /m) — relevant only for raw multi-line
    * text under a code-less <pre>, which turndown escapes too. */
  def escape(s: String): String = {
    var r = s
    r = r.replace("\\", "\\\\")
    r = r.replace("*", "\\*")
    r = EscDashRe.matcher(r).replaceAll("\\\\-")
    r = EscPlusRe.matcher(r).replaceAll("\\\\+ ")
    r = EscEqRe.matcher(r).replaceAll("\\\\$1")
    r = EscHeadingRe.matcher(r).replaceAll("\\\\$1 ")
    r = r.replace("`", "\\`")
    r = EscFenceRe.matcher(r).replaceAll("\\\\~~~")
    r = r.replace("[", "\\[")
    r = r.replace("]", "\\]")
    r = EscGtRe.matcher(r).replaceAll("\\\\>")
    r = r.replace("_", "\\_")
    r = EscOlRe.matcher(r).replaceAll("$1\\\\. ")
    r
  }

  /** join (:919-930): dedupe the newline seam to at most two. */
  private def join(a: String, b: String): String = {
    var e1 = a.length
    while (e1 > 0 && a.charAt(e1 - 1) == '\n') e1 -= 1
    var s2 = 0
    while (s2 < b.length && b.charAt(s2) == '\n') s2 += 1
    val nls = math.min(2, math.max(a.length - e1, s2))
    a.substring(0, e1) + "\n\n".substring(0, nls) + b.substring(s2)
  }

  // cleanAttribute (:337-339)
  private def cleanAttribute(a: String): String =
    if (a == null || a.isEmpty) "" else CleanAttrRe.matcher(a).replaceAll("\n")

  private final class Renderer(root0: Element) {

    // ---- phase 0: normalize — reproduce cheerio .html() → reparse --------
    // The reference serializes mainContent (detached elements gone) and
    // turndown reparses the string: adjacent text nodes separated only by
    // removed elements come back MERGED as one text node (comments survive
    // serialization, so they remain merge boundaries). Working directly on
    // our DOM requires the same normalization, or a space kept after an
    // <img> (keepLeadingWs) would be preserved once per split text node.
    private def cloneNorm(e: Element): Element = {
      val out = new Element(e.tag)
      e.attrNamesSeq.foreach(n => out.putAttr(n, e.attrRaw(n)))
      var lastText: Text = null
      e.children.foreach {
        case el: Element if el.removed => // dropped from the serialization
        case el: Element =>
          out.append(cloneNorm(el)); lastText = null
        case t: Text =>
          if (lastText != null) lastText.data = lastText.data + t.data
          else { val nt = new Text(t.data); out.append(nt); lastText = nt }
        case c: Comment =>
          out.append(new Comment(c.data)); lastText = null
      }
      out
    }
    private val root: Element = cloneNorm(root0)

    // ---- phase 1: collapseWhitespace (:455-527), non-mutating ------------
    private val textData = new java.util.IdentityHashMap[Text, String]()
    private val removedTexts =
      java.util.Collections.newSetFromMap(new java.util.IdentityHashMap[Text, java.lang.Boolean]())

    private def isPreEl(e: Element) = e.tag == "pre"

    private def collapse(): Unit = {
      if (isPreEl(root)) return
      var prevText: Text = null
      var keepLeadingWs = false
      def elementEvent(e: Element): Unit = {
        if (BlockTags.contains(e.tag) || e.tag == "br") {
          if (prevText != null)
            textData.put(prevText, TrailSpaceRe.matcher(textData.get(prevText)).replaceAll(""))
          prevText = null
          keepLeadingWs = false
        } else if (VoidTags.contains(e.tag) || isPreEl(e)) {
          // keep space around inline void elements (img!) and inline pre
          prevText = null
          keepLeadingWs = true
        } else if (prevText != null) {
          keepLeadingWs = false
        }
      }
      def visit(n: Node): Unit = n match {
        case t: Text =>
          var text = CollapseWsRe.matcher(t.data).replaceAll(" ")
          if ((prevText == null || textData.get(prevText).endsWith(" ")) &&
            !keepLeadingWs && text.startsWith(" "))
            text = text.substring(1)
          if (text.isEmpty) removedTexts.add(t)
          else { textData.put(t, text); prevText = t }
        case _: Comment => // removed by collapse (:506-508)
        case e: Element if e.removed => // detached before turndown runs
        case e: Element =>
          // the JS while/next traversal (:547-553) visits an element as
          // `current` on entry AND again on every step back up — so an
          // element with children fires its event twice (a </table>-like
          // exit resets prevText, stripping the space before a following
          // inline node); pre subtrees are never entered
          elementEvent(e)
          if (!isPreEl(e)) {
            val kids = e.children.filter {
              case el: Element => !el.removed
              case _ => true
            }
            if (kids.nonEmpty) { kids.foreach(visit); elementEvent(e) }
          }
      }
      root.children.foreach(visit)
      if (prevText != null) {
        val d = TrailSpaceRe.matcher(textData.get(prevText)).replaceAll("")
        if (d.isEmpty) { removedTexts.add(prevText); textData.remove(prevText) }
        else textData.put(prevText, d)
      }
    }
    collapse()

    /** Post-collapse data of a text node (raw under <pre>). */
    private def dataOf(t: Text): String =
      if (removedTexts.contains(t)) ""
      else if (textData.containsKey(t)) textData.get(t)
      else t.data

    /** Post-collapse textContent. */
    private def tc(n: Node): String = n match {
      case t: Text => dataOf(t)
      case e: Element if e.removed => ""
      case e: Element =>
        val sb = new StringBuilder
        e.children.foreach(c => sb.append(tc(c)))
        sb.toString
      case _ => ""
    }

    private def live(n: Node): Boolean = n match {
      case t: Text => !removedTexts.contains(t)
      case e: Element => !e.removed
      case _ => false // comments removed
    }

    private def siblings(e: Element): (Option[Node], Option[Node]) = {
      val p = e.parent
      if (p == null) (None, None)
      else {
        val sibs = p.children.filter(live)
        val i = sibs.indexWhere(_ eq e)
        (if (i > 0) Some(sibs(i - 1)) else None,
          if (i >= 0 && i < sibs.length - 1) Some(sibs(i + 1)) else None)
      }
    }

    // ---- flankingWhitespace (:647-702) -----------------------------------
    private def isFlanked(side: Int, e: Element): Boolean = {
      val (prevS, nextS) = siblings(e)
      val sib = if (side < 0) prevS else nextS
      sib.exists {
        case t: Text =>
          val d = dataOf(t)
          if (side < 0) d.endsWith(" ") else d.startsWith(" ")
        case s: Element if !BlockTags.contains(s.tag) =>
          val d = tc(s)
          if (side < 0) d.endsWith(" ") else d.startsWith(" ")
        case _ => false
      }
    }

    private def flanking(e: Element): (String, String) = {
      if (BlockTags.contains(e.tag)) return ("", "")
      val m = EdgeRe.matcher(tc(e))
      if (!m.matches()) return ("", "")
      var leading = m.group(1)
      var trailing = m.group(4)
      val leadingAscii = m.group(2); val leadingNonAscii = m.group(3)
      val trailingNonAscii = m.group(5); val trailingAscii = m.group(6)
      if (leadingAscii.nonEmpty && isFlanked(-1, e)) leading = leadingNonAscii
      if (trailingAscii.nonEmpty && isFlanked(1, e)) trailing = trailingNonAscii
      (leading, trailing)
    }

    // ---- isBlank (:638-645) ----------------------------------------------
    private def hasAny(e: Element, tags: Set[String]): Boolean =
      e.descendants.exists(d => tags.contains(d.tag))

    private def isBlank(e: Element): Boolean =
      !VoidTags.contains(e.tag) &&
        !MeaningfulWhenBlank.contains(e.tag) &&
        AllWsRe.matcher(tc(e)).matches() &&
        !hasAny(e, VoidTags) &&
        !hasAny(e, MeaningfulWhenBlank)

    // ---- phase 2: process / replacementForNode (:855-907) ----------------
    def run(): String = {
      val out = process(root, insideCode = false)
      // postProcess (:887): trim leading [\t\r\n]+ and trailing [\t\r\n\s]+
      TrailCtlWsRe.matcher(LeadCtlRe.matcher(out).replaceAll("")).replaceAll("")
    }

    private def process(parent: Element, insideCode: Boolean): String = {
      var out = ""
      parent.children.foreach {
        case t: Text if removedTexts.contains(t) => // removed by collapse
        case t: Text =>
          val v = dataOf(t)
          out = join(out, if (insideCode) v else escape(v))
        case _: Comment => // removed by collapse
        case e: Element if e.removed => // detached
        case e: Element =>
          out = join(out, replacementForNode(e, insideCode))
      }
      out
    }

    private def replacementForNode(e: Element, insideCode: Boolean): String = {
      val childCode = insideCode || e.tag == "code"
      val content0 = process(e, childCode)
      val (leading, trailing) = flanking(e)
      val content =
        if (leading.nonEmpty || trailing.nonEmpty) jsTrim(content0) else content0
      leading + ruleReplacement(e, content) + trailing
    }

    private def ruleReplacement(e: Element, content: String): String = {
      // blank rule first (Rules.forNode, :385)
      if (isBlank(e)) return if (isBlock(e)) "\n\n" else ""
      e.tag match {
        // reference custom rule preserveCodeBlocks (extract.ts:37-47) —
        // unshifted to the FRONT of the rule array, so it shadows the
        // default fenced-code rule for every <pre>. NB single \n edges.
        case "pre" =>
          e.descendants.find(_.tag == "code") match {
            case Some(code) =>
              val lang = code.attr("class")
                .flatMap(c => CodeLangRe.findFirstMatchIn(c).map(_.group(1)))
                .getOrElse("")
              "\n```" + lang + "\n" + tc(code) + "\n```\n"
            case None =>
              "\n```\n" + content + "\n```\n"
          }
        // reference custom rule removeScripts (extract.ts:32-35)
        case "script" | "style" | "noscript" => ""
        case "p" => "\n\n" + content + "\n\n"
        case "br" => "  \n"
        case t if t.length == 2 && t.charAt(0) == 'h' &&
          t.charAt(1) >= '1' && t.charAt(1) <= '6' =>
          val level = t.charAt(1) - '0'
          "\n\n" + ("#" * level) + " " + content + "\n\n"
        case "blockquote" =>
          val inner = LineStartRe.matcher(
            EdgeNlRe.matcher(content).replaceAll("")).replaceAll("> ")
          "\n\n" + inner + "\n\n"
        case "ul" | "ol" =>
          val p = e.parent
          if (p != null && p.tag == "li" && p.childElements.lastOption.exists(_ eq e))
            "\n" + content
          else "\n\n" + content + "\n\n"
        case "li" =>
          val p = e.parent
          val prefix =
            if (p != null && p.tag == "ol") {
              val start = p.attr("start").flatMap(s => scala.util.Try(s.toInt).toOption)
              val index = p.childElements.indexWhere(_ eq e)
              (start.map(_ + index).getOrElse(index + 1)).toString + ".  "
            } else "-   "
          val c = NlRe.matcher(
            TrailNlRe.matcher(
              LeadNlRe.matcher(content).replaceAll("")).replaceAll("\n"))
            .replaceAll("\n" + (" " * prefix.length))
          val hasNextSibling = siblings(e)._2.isDefined
          prefix + c + (if (hasNextSibling && !c.endsWith("\n")) "\n" else "")
        case "hr" => "\n\n* * *\n\n"
        case "a" if Option(e.attrRaw("href")).exists(_.nonEmpty) =>
          val href = ParenRe.matcher(e.attrRaw("href")).replaceAll("\\\\$1")
          val title = {
            val t = cleanAttribute(e.attrRaw("title"))
            if (t.nonEmpty) " \"" + t.replace("\"", "\\\"") + "\"" else ""
          }
          "[" + content + "](" + href + title + ")"
        case "em" | "i" =>
          if (jsTrim(content).isEmpty) "" else "*" + content + "*"
        case "strong" | "b" =>
          if (jsTrim(content).isEmpty) "" else "**" + content + "**"
        case "code" => // inline code (pre>code-only is shadowed by pre rule)
          if (content.isEmpty) ""
          else {
            val c = CodeNlRe.matcher(content).replaceAll(" ")
            val extraSpace =
              if (c.startsWith("`") || c.endsWith("`") ||
                (c.length > 1 && c.startsWith(" ") && c.endsWith(" ") && jsTrim(c).nonEmpty)) " "
              else ""
            var delim = "`"
            val runs = BacktickRunRe.findAllIn(c).toSet
            while (runs.contains(delim)) delim += "`"
            delim + extraSpace + c + extraSpace + delim
          }
        case "img" =>
          val alt = cleanAttribute(e.attrRaw("alt"))
          val src = Option(e.attrRaw("src")).getOrElse("")
          val title = cleanAttribute(e.attrRaw("title"))
          val titlePart = if (title.nonEmpty) " \"" + title + "\"" else ""
          if (src.isEmpty) "" else "![" + alt + "](" + src + titlePart + ")"
        case _ => // defaultReplacement (:744-746)
          if (isBlock(e)) "\n\n" + content + "\n\n" else content
      }
    }
  }
}
