package graft.core

import Html.{Comment, Element, Node, Text}

/** HTML→Markdown renderer with Turndown semantics, re-derived from the
  * library's published behavior as configured by the reference
  * (/root/reference/src/extract.ts:23-47): atx headings, fenced code,
  * `-` bullets, `*` em, `**` strong, plus the reference's two custom rules
  * (script/style/noscript removed; `<pre>` rendered as a fenced block with
  * the `language-*` class and raw `textContent`).
  *
  * Operates directly on our DOM — no HTML re-serialization round-trip.
  * Pure scalar function: the extract UDF wraps it; goldens pin its output.
  */
object Markdown {

  private val BlockTags = Set("address", "article", "aside", "audio",
    "blockquote", "body", "canvas", "center", "dd", "dir", "div", "dl", "dt",
    "fieldset", "figcaption", "figure", "footer", "form", "frameset", "h1",
    "h2", "h3", "h4", "h5", "h6", "header", "hgroup", "hr", "html", "isindex",
    "li", "main", "menu", "nav", "noframes", "noscript", "ol", "output", "p",
    "pre", "section", "table", "tbody", "td", "tfoot", "th", "thead", "tr",
    "ul")

  def isBlock(e: Element): Boolean = BlockTags.contains(e.tag)

  /** Entry point: render the (cleaned) content element to Markdown. */
  def render(content: Element): String = {
    val out = processChildren(content, preformatted = false)
    // post-process exactly like TurndownService.turndown: trim leading/
    // trailing whitespace-ish newlines
    out.replaceAll("^[\\t\\r\\n]+", "").replaceAll("[\\t\\r\\n\\s]+$", "")
  }

  // --- whitespace-collapsed view of a text node ------------------------
  // Turndown collapses whitespace runs to single spaces and drops spaces
  // adjacent to block boundaries before rules run. We do it on the fly:
  // each text node is collapsed, and block-level joins trim the seams.
  private def collapse(s: String): String = s.replaceAll("[ \\t\\r\\n]+", " ")

  private def processChildren(parent: Element, preformatted: Boolean): String = {
    var output = ""
    parent.children.foreach {
      case _: Comment => // dropped
      case t: Text =>
        val piece =
          if (preformatted) t.data
          else escape(collapse(t.data))
        output = joinInline(output, piece)
      case e: Element if e.removed => // dropped
      case e: Element =>
        output = join(output, replacement(e), isBlock(e))
    }
    output
  }

  /** Join two rendered fragments, deduping newlines (max 2) at the seam. */
  private def join(a: String, b: String, blockSeam: Boolean): String = {
    val aTrim = a.reverse.dropWhile(_ == '\n').reverse
    val bTrim = b.dropWhile(_ == '\n')
    val nls = math.max(a.length - aTrim.length, b.length - bTrim.length)
    val sep = "\n\n".take(nls)
    val left = if (blockSeam) aTrim.reverse.dropWhile(_ == ' ').reverse else aTrim
    left + sep + bTrim
  }

  private def joinInline(a: String, b: String): String = {
    // avoid duplicate spaces at inline seams (collapse pass artifact)
    if (a.endsWith(" ") && b.startsWith(" ")) a + b.drop(1)
    else if ((a.isEmpty || a.endsWith("\n")) && b.startsWith(" ")) a + b.drop(1)
    else a + b
  }

  private def textContent(e: Element): String = e.text()

  private def isBlankInline(e: Element): Boolean =
    !Html.VoidTags.contains(e.tag) && textContent(e).trim.isEmpty &&
      !e.descendants.exists(d => Html.VoidTags.contains(d.tag))

  private def replacement(e: Element): String = e.tag match {
    // reference custom rule: removeScripts (extract.ts:32-35)
    case "script" | "style" | "noscript" => ""
    // reference custom rule: preserveCodeBlocks (extract.ts:37-47)
    case "pre" =>
      e.descendants.find(_.tag == "code") match {
        case Some(code) =>
          val lang = code.attr("class")
            .flatMap(c => "language-(\\w+)".r.findFirstMatchIn(c).map(_.group(1)))
            .getOrElse("")
          s"\n```$lang\n${textContent(code)}\n```\n"
        case None =>
          s"\n```\n${processChildren(e, preformatted = true)}\n```\n"
      }
    case "p" =>
      val c = processChildren(e, preformatted = false)
      if (c.trim.isEmpty) "\n\n" else "\n\n" + c + "\n\n"
    case "br" => "  \n"
    case t if t.length == 2 && t(0) == 'h' && t(1).isDigit && t(1) >= '1' && t(1) <= '6' =>
      val level = t(1) - '0'
      "\n\n" + ("#" * level) + " " + processChildren(e, preformatted = false) + "\n\n"
    case "blockquote" =>
      val inner = processChildren(e, preformatted = false)
        .replaceAll("^\\n+", "").replaceAll("\\n+$", "")
        .linesWithSeparators.map(l => "> " + l).mkString
      "\n\n" + inner + "\n\n"
    case "ul" | "ol" =>
      val inner = processChildren(e, preformatted = false)
      e.parent match {
        case p if p != null && p.tag == "li" &&
          p.childElements.lastOption.contains(e) => "\n" + inner
        case _ => "\n\n" + inner + "\n\n"
      }
    case "li" =>
      var c = processChildren(e, preformatted = false)
        .replaceAll("^\\n+", "")
        .replaceAll("\\n+$", "\n")
        .replaceAll("\n", "\n    ")
      val prefix = e.parent match {
        case p if p != null && p.tag == "ol" =>
          val start = p.attr("start").flatMap(s => scala.util.Try(s.toInt).toOption).getOrElse(1)
          val index = p.childElements.indexOf(e)
          s"${start + index}.  "
        case _ => "-   "
      }
      val needsNl = {
        val siblings = if (e.parent != null) e.parent.childElements else Seq(e)
        val notLast = siblings.lastOption.exists(_ ne e)
        notLast && !c.endsWith("\n")
      }
      prefix + c + (if (needsNl) "\n" else "")
    case "code" => // inline (pre>code handled above via pre)
      if (e.parent != null && e.parent.tag == "pre") "" // consumed by pre rule
      else {
        var c = textContent(e).replaceAll("\\r?\\n|\\r", " ")
        if (c.isEmpty) ""
        else {
          val extraSpace =
            if (c.startsWith("`") || c.endsWith("`") ||
              (c.startsWith(" ") && c.endsWith(" ") && c.trim.nonEmpty)) " "
            else ""
          var delim = "`"
          while (c.contains(delim)) delim += "`"
          delim + extraSpace + c + extraSpace + delim
        }
      }
    case "em" | "i" =>
      inlineWrap(e, "*")
    case "strong" | "b" =>
      inlineWrap(e, "**")
    case "a" if e.hasAttr("href") =>
      val (lead, inner, trail) = flank(e)
      if (inner.isEmpty) lead + trail
      else {
        val href = e.attr("href").getOrElse("").replaceAll("([()])", "\\\\$1")
        val title = e.attr("title")
          .map(t => " \"" + t.replaceAll("\"", "\\\\\"") + "\"").getOrElse("")
        s"$lead[$inner]($href$title)$trail"
      }
    case "img" =>
      val alt = collapse(e.attr("alt").getOrElse("")).trim
      val src = e.attr("src").getOrElse("")
      val title = e.attr("title")
        .map(t => " \"" + t.replaceAll("\"", "\\\\\"") + "\"").getOrElse("")
      if (src.isEmpty) "" else s"![$alt]($src$title)"
    case "hr" => "\n\n* * *\n\n"
    case "iframe" | "embed" | "object" | "head" | "meta" | "link" | "title" => ""
    case _ =>
      val c = processChildren(e, preformatted = false)
      if (isBlock(e)) {
        if (isBlankInline(e) && c.trim.isEmpty) "\n\n"
        else "\n\n" + c.stripPrefix("\n\n").stripSuffix("\n\n") + "\n\n"
      } else c
  }

  private def inlineWrap(e: Element, delim: String): String = {
    val (lead, inner, trail) = flank(e)
    if (inner.isEmpty) lead + trail
    else lead + delim + inner + delim + trail
  }

  /** Flanking whitespace: shift the content's edge whitespace outside the
    * delimiters (Turndown's flankingWhitespace behavior). */
  private def flank(e: Element): (String, String, String) = {
    val c = processChildren(e, preformatted = false)
    val lead = if (c.startsWith(" ")) " " else ""
    val trail = if (c.endsWith(" ") && c.trim.nonEmpty) " " else ""
    (lead, c.trim, trail)
  }

  /** Turndown's escape table (published escape rules, v7). */
  def escape(s: String): String = {
    var r = s
    r = r.replace("\\", "\\\\")
    r = r.replaceAll("\\*", "\\\\*")
    r = r.replaceAll("^-", "\\\\-")
    r = r.replaceAll("^\\+ ", "\\\\+ ")
    r = r.replaceAll("(?m)^(=+)", "\\\\$1")
    r = r.replaceAll("(?m)^(#{1,6}) ", "\\\\$1 ")
    r = r.replace("`", "\\`")
    r = r.replaceAll("(?m)^~~~", "\\\\~~~")
    r = r.replace("[", "\\[")
    r = r.replace("]", "\\]")
    r = r.replaceAll("(?m)^>", "\\\\>")
    r = r.replace("_", "\\_")
    r = r.replaceAll("(?m)^(\\d+)\\. ", "$1\\\\. ")
    r
  }
}
