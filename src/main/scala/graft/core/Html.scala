package graft.core

import scala.collection.mutable.ArrayBuffer

/** Deterministic minimal HTML parser + the CSS-selector subset the reference
  * exercises (see SURVEY.md §7 module 2). The reference parses with cheerio
  * (parse5 + css-select); we implement from scratch the behaviors its
  * extraction paths depend on:
  *
  *  - tokenizer: tags, quoted/unquoted attributes, comments, doctype,
  *    raw-text elements (script/style/textarea/title keep verbatim bodies),
  *    void elements, self-closing syntax;
  *  - tree builder with implied html/head/body and basic <p>-closing rules,
  *    deterministic for well-formed input (our fixtures are well-formed);
  *  - entity decoding of the named set + numeric escapes;
  *  - `.text()` = concatenation of descendant text nodes in document order
  *    (cheerio semantics — no whitespace normalization);
  *  - selectors: tag, #id, .class, [attr], [attr=v], [attr^=v], [attr*=v],
  *    compound, descendant combinator, comma groups, :first-child,
  *    :not(:first-child) (used by extract.ts:54-63,83-90,111-122,152-173 and
  *    server.ts:2620-2628);
  *  - mutation: remove, replaceWith(text) (extract.ts:177,247).
  */
object Html {

  sealed trait Node { var parent: Element = _ }
  final class Text(var data: String) extends Node
  final class Comment(val data: String) extends Node
  final class Element(val tag: String) extends Node {
    // attrs stored as parallel arrays — most elements carry 0-3 attributes,
    // so a map per element is pure GC pressure on the extraction hot path
    private var attrNames: Array[String] = null
    private var attrVals: Array[String] = null
    private var attrN = 0
    val children = ArrayBuffer[Node]()
    var removed = false
    private var classesCache: Array[String] = null

    def putAttr(name: String, value: String): Unit = {
      if (attrNames == null) { attrNames = new Array[String](4); attrVals = new Array[String](4) }
      var i = 0
      while (i < attrN) { if (attrNames(i) == name) { attrVals(i) = value; return }; i += 1 }
      if (attrN == attrNames.length) {
        attrNames = java.util.Arrays.copyOf(attrNames, attrN * 2)
        attrVals = java.util.Arrays.copyOf(attrVals, attrN * 2)
      }
      attrNames(attrN) = name; attrVals(attrN) = value; attrN += 1
      if (name == "class") classesCache = null
    }

    def attrRaw(name: String): String = {
      var i = 0
      while (i < attrN) { if (attrNames(i) == name) return attrVals(i); i += 1 }
      null
    }
    def attr(name: String): Option[String] = Option(attrRaw(name))
    def hasAttr(name: String): Boolean = attrRaw(name) != null
    def attrNamesSeq: Seq[String] = (0 until attrN).map(attrNames(_))
    def id: String = { val v = attrRaw("id"); if (v == null) "" else v }
    def hasClass(c: String): Boolean = {
      if (classesCache == null) {
        val v = attrRaw("class")
        classesCache = if (v == null) Array.empty
        else v.split("\\s+").filter(_.nonEmpty)
      }
      var i = 0
      while (i < classesCache.length) { if (classesCache(i) == c) return true; i += 1 }
      false
    }
    def classes: Set[String] = {
      val v = attrRaw("class")
      if (v == null) Set.empty else v.split("\\s+").filter(_.nonEmpty).toSet
    }

    def append(n: Node): Unit = { n.parent = this; children += n }

    /** All descendant elements in document order (excluding self). */
    def descendants: Iterator[Element] = children.iterator.flatMap {
      case e: Element if !e.removed => Iterator.single(e) ++ e.descendants
      case _ => Iterator.empty
    }

    /** cheerio `.text()`: raw text-node concatenation, document order. */
    def text(): String = {
      val sb = new StringBuilder
      def walk(n: Node): Unit = n match {
        case t: Text => sb.append(t.data)
        case e: Element if !e.removed => e.children.foreach(walk)
        case _ =>
      }
      children.foreach(walk)
      sb.toString
    }

    def remove(): Unit = removed = true

    def replaceWithText(s: String): Unit = {
      if (parent != null) {
        val idx = parent.children.indexOf(this)
        if (idx >= 0) {
          val t = new Text(s); t.parent = parent
          parent.children.update(idx, t)
        }
      }
      removed = true
    }

    /** Live (non-removed) child elements. */
    def childElements: Seq[Element] =
      children.collect { case e: Element if !e.removed => e }.toSeq
  }

  final class Doc(val root: Element) {
    def body: Element =
      root.descendants.find(_.tag == "body").getOrElse(root)
    def select(selector: String): Seq[Element] = Selector.select(root, selector)
    def first(selector: String): Option[Element] = select(selector).headOption
  }

  val VoidTags: Set[String] = Set("area", "base", "br", "col", "embed", "hr",
    "img", "input", "link", "meta", "param", "source", "track", "wbr")
  private val RawTextTags = Set("script", "style", "textarea", "title", "noscript")
  // tags that implicitly close an open <p>
  private val PClosers = Set("p", "div", "ul", "ol", "li", "h1", "h2", "h3",
    "h4", "h5", "h6", "blockquote", "pre", "table", "section", "article",
    "aside", "header", "footer", "nav", "main", "form", "hr")

  private val NamedEntities = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    "nbsp" -> " ", "copy" -> "©", "reg" -> "®",
    "mdash" -> "—", "ndash" -> "–", "hellip" -> "…",
    "lsquo" -> "‘", "rsquo" -> "’", "ldquo" -> "“",
    "rdquo" -> "”", "laquo" -> "«", "raquo" -> "»",
    "times" -> "×", "middot" -> "·", "bull" -> "•",
    "eacute" -> "é", "egrave" -> "è", "agrave" -> "à",
    "uuml" -> "ü", "ouml" -> "ö", "auml" -> "ä",
    "szlig" -> "ß", "ntilde" -> "ñ", "ccedil" -> "ç")

  def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 10) {
          val name = s.substring(i + 1, semi)
          if (name.startsWith("#x") || name.startsWith("#X")) {
            try { sb.appendAll(Character.toChars(Integer.parseInt(name.drop(2), 16))); i = semi + 1 }
            catch { case _: Exception => sb.append(c); i += 1 }
          } else if (name.startsWith("#")) {
            try { sb.appendAll(Character.toChars(name.drop(1).toInt)); i = semi + 1 }
            catch { case _: Exception => sb.append(c); i += 1 }
          } else NamedEntities.get(name) match {
            case Some(rep) => sb.append(rep); i = semi + 1
            case None => sb.append(c); i += 1
          }
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Parse an HTML document; always yields an <html><head/><body/> skeleton
    * (cheerio/parse5 imply these wrappers). */
  def parse(html: String): Doc = {
    val tokens = tokenize(html)
    val root = new Element("html")
    val head = new Element("head"); root.append(head)
    val body = new Element("body")
    var htmlAttrsSeen = false
    // stack of open elements; body appended once head content done
    val stack = ArrayBuffer[Element]()
    var inHead = true
    var bodyAppended = false
    def ensureBody(): Unit = if (!bodyAppended) { root.append(body); bodyAppended = true }
    def current: Element =
      if (stack.nonEmpty) stack.last else if (inHead) head else { ensureBody(); body }

    val headTags = Set("title", "meta", "link", "base", "style")

    tokens.foreach {
      case TText(data) =>
        if (inHead && stack.isEmpty) {
          if (data.exists(!_.isWhitespace)) { inHead = false; ensureBody(); body.append(new Text(decodeEntities(data))) }
          else head.append(new Text(data))
        } else current.append(new Text(if (isRaw(current.tag)) data else decodeEntities(data)))
      case TComment(d) => current.append(new Comment(d))
      case TOpen(tag, attrs, selfClosing) =>
        tag match {
          case "html" =>
            if (!htmlAttrsSeen) { attrs.foreach { case (k, v) => root.putAttr(k, v) }; htmlAttrsSeen = true }
          case "head" => // implied
          case "body" =>
            inHead = false; ensureBody()
            attrs.foreach { case (k, v) => body.putAttr(k, v) }
          case t =>
            if (inHead && stack.isEmpty && !headTags.contains(t)) { inHead = false; ensureBody() }
            val el = new Element(t)
            attrs.foreach { case (k, v) => el.putAttr(k, v) }
            // <p> auto-close: a new block tag closes an open <p>
            if (PClosers.contains(t))
              while (stack.nonEmpty && stack.last.tag == "p") stack.remove(stack.length - 1)
            // <li> closes an open <li>
            if (t == "li")
              while (stack.nonEmpty && stack.last.tag == "li") stack.remove(stack.length - 1)
            if (t == "tr")
              while (stack.nonEmpty && (stack.last.tag == "tr" || stack.last.tag == "td" || stack.last.tag == "th")) stack.remove(stack.length - 1)
            if (t == "td" || t == "th")
              while (stack.nonEmpty && (stack.last.tag == "td" || stack.last.tag == "th")) stack.remove(stack.length - 1)
            current.append(el)
            if (!VoidTags.contains(t) && !selfClosing) stack += el
        }
      case TClose(tag) =>
        tag match {
          case "html" | "body" | "head" => if (tag == "head") { inHead = false; ensureBody() }
          case t =>
            // pop to matching open tag if present
            val idx = stack.lastIndexWhere(_.tag == t)
            if (idx >= 0) stack.remove(idx, stack.length - idx)
        }
    }
    ensureBody()
    new Doc(root)
  }

  private def isRaw(tag: String): Boolean = tag == "script" || tag == "style" || tag == "textarea"

  /** XML-mode parse (cheerio xmlMode equivalent, used for RSS/Atom feeds):
    * no void elements, no implied html/head/body, no auto-closing. Returns
    * a synthetic root wrapping the document's top-level nodes. */
  def parseXml(xml: String): Element = {
    val root = new Element("#root")
    val stack = ArrayBuffer[Element](root)
    tokenize(xml).foreach {
      case TText(d) => stack.last.append(new Text(decodeEntities(d)))
      case TComment(d) => stack.last.append(new Comment(d))
      case TOpen(tag, attrs, selfClosing) =>
        val el = new Element(tag)
        attrs.foreach { case (k, v) => el.putAttr(k, v) }
        stack.last.append(el)
        if (!selfClosing) stack += el
      case TClose(tag) =>
        val idx = stack.lastIndexWhere(_.tag == tag)
        if (idx > 0) stack.remove(idx, stack.length - idx)
    }
    root
  }

  // ---------------- tokenizer ----------------
  private sealed trait Token
  private final case class TText(data: String) extends Token
  private final case class TComment(data: String) extends Token
  private final case class TOpen(tag: String, attrs: Seq[(String, String)], selfClosing: Boolean) extends Token
  private final case class TClose(tag: String) extends Token

  private def tokenize(html: String): Seq[Token] = {
    val out = ArrayBuffer[Token]()
    var i = 0
    val n = html.length
    while (i < n) {
      val lt = html.indexOf('<', i)
      if (lt < 0) { if (i < n) out += TText(html.substring(i)); i = n }
      else {
        if (lt > i) out += TText(html.substring(i, lt))
        if (lt + 1 >= n) { out += TText("<"); i = n }
        else if (html.startsWith("<!--", lt)) {
          val end = html.indexOf("-->", lt + 4)
          val stop = if (end < 0) n else end
          out += TComment(html.substring(lt + 4, stop))
          i = if (end < 0) n else end + 3
        } else if (html.charAt(lt + 1) == '!' || html.charAt(lt + 1) == '?') {
          val end = html.indexOf('>', lt)
          i = if (end < 0) n else end + 1 // doctype / PI: skip
        } else if (html.charAt(lt + 1) == '/') {
          val end = html.indexOf('>', lt)
          if (end < 0) { out += TText(html.substring(lt)); i = n }
          else {
            val name = html.substring(lt + 2, end).trim.toLowerCase
            if (name.nonEmpty) out += TClose(name)
            i = end + 1
          }
        } else if (html.charAt(lt + 1).isLetter) {
          val (tok, next) = readTag(html, lt)
          out += tok
          i = next
          // raw-text elements: swallow until the matching close tag
          tok match {
            case TOpen(tag, _, false) if RawTextTags.contains(tag) =>
              val closeSeq = "</" + tag
              val idx = indexOfIgnoreCase(html, closeSeq, i)
              if (idx < 0) { out += TText(html.substring(i)); i = n }
              else {
                if (idx > i) out += TText(html.substring(i, idx))
                val end = html.indexOf('>', idx)
                out += TClose(tag)
                i = if (end < 0) n else end + 1
              }
            case _ =>
          }
        } else { out += TText("<"); i = lt + 1 }
      }
    }
    out.toSeq
  }

  /** Case-insensitive indexOf without copying the haystack (the raw-text
    * close-tag scan runs once per script/style element per page). */
  private def indexOfIgnoreCase(s: String, needle: String, from: Int): Int = {
    val n = s.length; val m = needle.length
    var i = math.max(0, from)
    while (i + m <= n) {
      if (s.regionMatches(true, i, needle, 0, m)) return i
      i += 1
    }
    -1
  }

  private def readTag(html: String, lt: Int): (Token, Int) = {
    var i = lt + 1
    val n = html.length
    val nameStart = i
    while (i < n && (html.charAt(i).isLetterOrDigit || html.charAt(i) == '-')) i += 1
    val tag = html.substring(nameStart, i).toLowerCase
    val attrs = ArrayBuffer[(String, String)]()
    var selfClosing = false
    var done = false
    while (!done && i < n) {
      while (i < n && html.charAt(i).isWhitespace) i += 1
      if (i < n && html.charAt(i) == '>') { i += 1; done = true }
      else if (i < n && html.charAt(i) == '/' && i + 1 < n && html.charAt(i + 1) == '>') {
        selfClosing = true; i += 2; done = true
      } else if (i < n && html.charAt(i) == '/') {
        i += 1 // stray slash inside a tag (e.g. <a / x>): skip, don't loop
      } else if (i < n) {
        // attribute name
        val as = i
        while (i < n && !html.charAt(i).isWhitespace && html.charAt(i) != '=' &&
          html.charAt(i) != '>' && html.charAt(i) != '/') i += 1
        val name = html.substring(as, i).toLowerCase
        while (i < n && html.charAt(i).isWhitespace) i += 1
        var value = ""
        if (i < n && html.charAt(i) == '=') {
          i += 1
          while (i < n && html.charAt(i).isWhitespace) i += 1
          if (i < n && (html.charAt(i) == '"' || html.charAt(i) == '\'')) {
            val q = html.charAt(i); i += 1
            val vs = i
            while (i < n && html.charAt(i) != q) i += 1
            value = html.substring(vs, i)
            if (i < n) i += 1
          } else {
            val vs = i
            while (i < n && !html.charAt(i).isWhitespace && html.charAt(i) != '>') i += 1
            value = html.substring(vs, i)
          }
        }
        if (name.nonEmpty && !attrs.exists(_._1 == name))
          attrs += name -> decodeEntities(value)
      } else done = true
    }
    (TOpen(tag, attrs.toSeq, selfClosing), i)
  }
}
