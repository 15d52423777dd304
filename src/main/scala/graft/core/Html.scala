package graft.core

import scala.collection.mutable.ArrayBuffer

/** Deterministic HTML parser implementing the WHATWG HTML5 tree-construction
  * subset the reference exercises (cheerio = parse5 + css-select; parse5 is
  * invoked from /root/reference/src/extract.ts:227). Round 3 replaces the
  * well-formed-only builder with spec error recovery, differentially verified
  * against the reference extractor over a malformed-HTML fuzz corpus:
  *
  *  - tokenizer: tags, quoted/unquoted attributes, comments, bogus comments,
  *    doctype skip, raw-text elements (script/style/iframe/xmp/noembed/
  *    noframes/noscript verbatim; title/textarea RCDATA with entity decode),
  *    void elements, CR normalization;
  *  - entities: the full WHATWG named-character-reference table (2231 names,
  *    106 legacy no-semicolon forms — src/main/resources/html_entities.tsv),
  *    longest-match semantics (&notit; → ¬it;), numeric refs with C1
  *    remapping and U+FFFD replacement, the attribute-mode suppression rule;
  *  - tree builder ("in body" + table insertion modes): implied html/head/
  *    body, element scopes (button/list-item/table), generate-implied-end-
  *    tags, the list of active formatting elements with reconstruction and
  *    Noah's Ark, the adoption agency algorithm, foster parenting;
  *  - `.text()` = concatenation of descendant text nodes in document order
  *    (cheerio semantics — no whitespace normalization);
  *  - selectors: see [[Selector]]; mutation: remove, replaceWith(text).
  */
object Html {

  // precompiled: class-attribute splitting runs on every [class] selector
  // probe; String.split("\\s+") compiled the pattern per call
  private val WsSplitRe = java.util.regex.Pattern.compile("\\s+")

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

    def putAttrIfAbsent(name: String, value: String): Unit =
      if (attrRaw(name) == null) putAttr(name, value)

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
        else WsSplitRe.split(v).filter(_.nonEmpty)
      }
      var i = 0
      while (i < classesCache.length) { if (classesCache(i) == c) return true; i += 1 }
      false
    }
    def classes: Set[String] = {
      val v = attrRaw("class")
      if (v == null) Set.empty else WsSplitRe.split(v).filter(_.nonEmpty).toSet
    }

    /** Shallow copy with the same tag and attributes (adoption agency /
      * active-formatting reconstruction clones). */
    def cloneShallow: Element = {
      val e = new Element(tag)
      var i = 0
      while (i < attrN) { e.putAttr(attrNames(i), attrVals(i)); i += 1 }
      e
    }

    /** Attribute-set equality (Noah's Ark clause). */
    def sameAttrs(o: Element): Boolean = {
      if (attrN != o.attrN) return false
      var i = 0
      while (i < attrN) {
        if (o.attrRaw(attrNames(i)) != attrVals(i)) return false
        i += 1
      }
      true
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

  // ---------------- entities ----------------
  // WHATWG named character references (public spec data; generated by
  // scripts/gen_entities.mjs — same table parse5/cheerio decode with).
  private val (entSemi, entLegacy, maxEntLen, maxLegacyLen) = {
    val semi = new java.util.HashMap[String, String]()
    val leg = new java.util.HashMap[String, String]()
    var maxS = 0; var maxL = 0
    val in = getClass.getResourceAsStream("/html_entities.tsv")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    def unesc(v: String): String =
      if (v.indexOf('\\') < 0) v
      else v.replace("\\n", "\n").replace("\\t", "\t").replace("\\r", "\r").replace("\\\\", "\\")
    src.getLines().foreach { line =>
      val i = line.indexOf('\t')
      if (i > 0) {
        val name = line.substring(0, i)
        val value = unesc(line.substring(i + 1))
        if (name.endsWith(";")) {
          val n = name.substring(0, name.length - 1)
          semi.put(n, value); if (n.length > maxS) maxS = n.length
        } else { leg.put(name, value); if (name.length > maxL) maxL = name.length }
      }
    }
    src.close()
    (semi, leg, maxS, maxL)
  }

  // numeric reference C1-control remapping (HTML spec "character reference
  // code" table)
  private val C1Remap: Map[Int, Int] = Map(
    0x80 -> 0x20AC, 0x82 -> 0x201A, 0x83 -> 0x0192, 0x84 -> 0x201E,
    0x85 -> 0x2026, 0x86 -> 0x2020, 0x87 -> 0x2021, 0x88 -> 0x02C6,
    0x89 -> 0x2030, 0x8A -> 0x0160, 0x8B -> 0x2039, 0x8C -> 0x0152,
    0x8E -> 0x017D, 0x91 -> 0x2018, 0x92 -> 0x2019, 0x93 -> 0x201C,
    0x94 -> 0x201D, 0x95 -> 0x2022, 0x96 -> 0x2013, 0x97 -> 0x2014,
    0x98 -> 0x02DC, 0x99 -> 0x2122, 0x9A -> 0x0161, 0x9B -> 0x203A,
    0x9C -> 0x0153, 0x9E -> 0x017E, 0x9F -> 0x0178)

  private def isAlnum(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')

  private def appendCodepoint(sb: java.lang.StringBuilder, v: Long): Unit = {
    if (v == 0 || v > 0x10FFFF || (v >= 0xD800 && v <= 0xDFFF)) sb.append('�')
    else {
      val cp = C1Remap.getOrElse(v.toInt, v.toInt)
      sb.appendCodePoint(cp)
    }
  }

  /** Text-mode HTML entity decoding (legacy no-semicolon forms allowed). */
  def decodeEntities(s: String): String = decode(s, attr = false)
  /** Attribute-mode: a legacy match followed by [a-zA-Z0-9=] is NOT decoded. */
  private[core] def decodeAttr(s: String): String = decode(s, attr = true)

  private def decode(s: String, attr: Boolean): String = {
    if (s.indexOf('&') < 0) return s
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val amp = s.indexOf('&', i)
      if (amp < 0) { sb.append(s, i, n); i = n }
      else {
        if (amp > i) sb.append(s, i, amp)
        i = decodeOne(s, amp, sb, attr)
      }
    }
    sb.toString
  }

  /** Decode one reference starting at `start` (s(start) == '&'); returns the
    * index after the consumed chars ('&' alone if no reference matched). */
  private def decodeOne(s: String, start: Int, sb: java.lang.StringBuilder,
      attr: Boolean): Int = {
    val n = s.length
    var i = start + 1
    if (i >= n) { sb.append('&'); return n }
    if (s.charAt(i) == '#') {
      i += 1
      var hex = false
      if (i < n && (s.charAt(i) == 'x' || s.charAt(i) == 'X')) { hex = true; i += 1 }
      val digStart = i
      var v = 0L
      while (i < n && {
        val c = s.charAt(i)
        if (hex) (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')
        else c >= '0' && c <= '9'
      }) {
        val c = s.charAt(i)
        val d = if (c <= '9') c - '0' else (c | 0x20) - 'a' + 10
        if (v <= 0x110000) v = v * (if (hex) 16 else 10) + d
        i += 1
      }
      if (i == digStart) { sb.append('&'); return start + 1 }
      if (i < n && s.charAt(i) == ';') i += 1
      appendCodepoint(sb, v)
      i
    } else {
      var j = i
      while (j < n && isAlnum(s.charAt(j)) && j - i <= maxEntLen) j += 1
      if (j == i) { sb.append('&'); return i }
      val run = s.substring(i, j)
      if (j < n && s.charAt(j) == ';') {
        val v = entSemi.get(run)
        if (v != null) { sb.append(v); return j + 1 }
      }
      // legacy longest-prefix (only the longest match is considered — the
      // attribute invalid-end rule then suppresses it entirely, not retries)
      var l = math.min(run.length, maxLegacyLen)
      while (l >= 2) {
        val v = entLegacy.get(if (l == run.length) run else run.substring(0, l))
        if (v != null) {
          val after = i + l
          if (attr && after < n && (isAlnum(s.charAt(after)) || s.charAt(after) == '='))
            { sb.append('&'); return i }
          sb.append(v); return after
        }
        l -= 1
      }
      sb.append('&'); i
    }
  }

  /** XML-mode entity decoding (cheerio xmlMode / RSS feeds): only the five
    * XML entities, semicolon required, plus numeric references. */
  private def decodeXmlEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val amp = s.indexOf('&', i)
      if (amp < 0) { sb.append(s, i, n); i = n }
      else {
        if (amp > i) sb.append(s, i, amp)
        val semi = s.indexOf(';', amp + 1)
        var consumed = false
        if (semi > amp && semi - amp <= 12) {
          val name = s.substring(amp + 1, semi)
          val rep = name match {
            case "amp" => "&"
            case "lt" => "<"
            case "gt" => ">"
            case "quot" => "\""
            case "apos" => "'"
            case _ =>
              if (name.startsWith("#")) {
                try {
                  val v = if (name.startsWith("#x") || name.startsWith("#X"))
                    java.lang.Long.parseLong(name.substring(2), 16)
                  else java.lang.Long.parseLong(name.substring(1))
                  val tmp = new java.lang.StringBuilder(2)
                  appendCodepoint(tmp, v)
                  tmp.toString
                } catch { case _: Exception => null }
              } else null
          }
          if (rep != null) { sb.append(rep); i = semi + 1; consumed = true }
        }
        if (!consumed) { sb.append('&'); i = amp + 1 }
      }
    }
    sb.toString
  }

  /** Parse an HTML document with spec error recovery; always yields an
    * <html><head/><body/> skeleton (cheerio/parse5 imply these wrappers). */
  def parse(html: String): Doc = {
    // preprocessor: normalize CRLF / CR to LF (HTML spec input stream)
    val norm =
      if (html.indexOf('\r') < 0) html
      else html.replace("\r\n", "\n").replace('\r', '\n')
    val b = new TreeBuilder
    tokenize(norm, xml = false).foreach(b.process)
    b.finish()
    new Doc(b.root)
  }

  /** XML-mode parse (cheerio xmlMode equivalent, used for RSS/Atom feeds):
    * no void elements, no implied html/head/body, no auto-closing. Returns
    * a synthetic root wrapping the document's top-level nodes. */
  def parseXml(xml: String): Element = {
    val root = new Element("#root")
    val stack = ArrayBuffer[Element](root)
    tokenize(xml, xml = true).foreach {
      case TText(d) => stack.last.append(new Text(decodeXmlEntities(d)))
      case TRaw(d) => stack.last.append(new Text(d))
      case TCdata(d, _) => stack.last.append(new Text(d)) // CDATA is literal text
      case TComment(d) => stack.last.append(new Comment(d))
      case TOpen(tag, attrs, selfClosing) =>
        val el = new Element(tag)
        attrs.foreach { case (k, v) => el.putAttr(k, v) }
        stack.last.append(el)
        if (!selfClosing && stack.length < 512) stack += el
      case TClose(tag) =>
        val idx = stack.lastIndexWhere(_.tag == tag)
        if (idx > 0) stack.remove(idx, stack.length - idx)
    }
    root
  }

  // ---------------- tree builder ----------------

  // the "special" element category (tree-construction spec), HTML-only
  private val Special: Set[String] = Set(
    "address", "applet", "area", "article", "aside", "base", "basefont",
    "bgsound", "blockquote", "body", "br", "button", "caption", "center",
    "col", "colgroup", "dd", "details", "dir", "div", "dl", "dt", "embed",
    "fieldset", "figcaption", "figure", "footer", "form", "frame",
    "frameset", "h1", "h2", "h3", "h4", "h5", "h6", "head", "header",
    "hgroup", "hr", "html", "iframe", "img", "input", "keygen", "li",
    "link", "listing", "main", "marquee", "menu", "meta", "nav", "noembed",
    "noframes", "noscript", "object", "ol", "p", "param", "plaintext",
    "pre", "script", "section", "select", "source", "style", "summary",
    "table", "tbody", "td", "template", "textarea", "tfoot", "th", "thead",
    "title", "tr", "track", "ul", "wbr", "xmp")

  private val FormattingTags: Set[String] = Set("a", "b", "big", "code",
    "em", "font", "i", "nobr", "s", "small", "strike", "strong", "tt", "u")

  private val ImpliedEnd: Set[String] =
    Set("dd", "dt", "li", "optgroup", "option", "p", "rb", "rp", "rt", "rtc")

  private val BaseScopeBarrier: Set[String] = Set("applet", "caption",
    "html", "table", "td", "th", "marquee", "object", "template")

  // block start tags that close an open <p> (in-body group rule)
  private val PClosingBlocks: Set[String] = Set("address", "article",
    "aside", "blockquote", "center", "details", "dialog", "dir", "div",
    "dl", "fieldset", "figcaption", "figure", "footer", "header", "hgroup",
    "main", "menu", "nav", "ol", "p", "section", "summary", "ul")

  // end tags handled by the generic block close rule
  private val BlockEndTags: Set[String] = PClosingBlocks ++
    Set("button", "listing", "pre")

  private val TableIsh: Set[String] = Set("table", "tbody", "tfoot", "thead", "tr")

  private val HeadTags: Set[String] = Set("title", "meta", "link", "base",
    "basefont", "bgsound", "style", "script", "noscript")

  // derived insertion modes (computed from the stack — the spec's "reset
  // the insertion mode appropriately", run per token)
  private final val MBody = 0
  private final val MTable = 1
  private final val MTbody = 2
  private final val MRow = 3
  private final val MCell = 4
  private final val MCaption = 5
  private final val MColgroup = 6
  private final val MSelect = 7

  private final class AfeEntry(var el: Element) // el == null => marker

  private final class TreeBuilder {
    val root = new Element("html")
    private val head = new Element("head")
    private val body = new Element("body")
    root.append(head)

    private val stack = ArrayBuffer[Element](root)
    private val afe = ArrayBuffer[AfeEntry]()
    private var formPtr: Element = null
    private var htmlAttrsSeen = false
    private var bodyStarted = false
    private var headClosed = false
    private var headPushed = false
    private var fosterParenting = false
    // element whose first text child must drop a leading newline (pre/
    // listing/textarea)
    private var skipNewlineIn: Element = null

    private def current: Element = stack(stack.length - 1)

    def finish(): Unit = if (!bodyStarted) startBody(Nil)

    private def startBody(attrs: Seq[(String, String)]): Unit = {
      if (!bodyStarted) {
        // close the head phase: pop everything above <html>
        if (stack.length > 1) stack.remove(1, stack.length - 1)
        attrs.foreach { case (k, v) => body.putAttrIfAbsent(k, v) }
        root.append(body)
        stack += body
        bodyStarted = true
      }
    }

    // ---- scope / stack helpers ----

    private def stackContains(el: Element): Boolean = {
      var i = stack.length - 1
      while (i >= 0) { if (stack(i) eq el) return true; i -= 1 }
      false
    }

    private def hasInScope(tag: String, extra: String = null,
        extra2: String = null): Boolean = {
      var i = stack.length - 1
      while (i >= 0) {
        val t = stack(i).tag
        if (t == tag) return true
        if (BaseScopeBarrier.contains(t) || t == extra || t == extra2) return false
        i -= 1
      }
      false
    }
    private def inScope(tag: String): Boolean = hasInScope(tag)
    private def inButtonScope(tag: String): Boolean = hasInScope(tag, "button")
    private def inListItemScope(tag: String): Boolean = hasInScope(tag, "ol", "ul")
    private def inTableScope(tag: String): Boolean = {
      var i = stack.length - 1
      while (i >= 0) {
        val t = stack(i).tag
        if (t == tag) return true
        if (t == "html" || t == "table" || t == "template") return false
        i -= 1
      }
      false
    }
    private def elementInScope(el: Element): Boolean = {
      var i = stack.length - 1
      while (i >= 0) {
        if (stack(i) eq el) return true
        if (BaseScopeBarrier.contains(stack(i).tag)) return false
        i -= 1
      }
      false
    }
    private def anyHeadingInScope: Boolean = {
      var i = stack.length - 1
      while (i >= 0) {
        val t = stack(i).tag
        if (t.length == 2 && t.charAt(0) == 'h' && t.charAt(1) >= '1' && t.charAt(1) <= '6')
          return true
        if (BaseScopeBarrier.contains(t)) return false
        i -= 1
      }
      false
    }

    /** Pop one element unless it's <body> or <html> (never removed). */
    private def pop(): Unit = {
      val top = current
      if ((top ne body) && (top ne root)) stack.remove(stack.length - 1)
    }

    private def popUntilTag(tag: String): Unit = {
      while (stack.length > 1 && (current ne body)) {
        val e = stack.remove(stack.length - 1)
        if (e.tag == tag) return
      }
    }

    private def popUntilEl(el: Element): Unit = {
      while (stack.length > 1 && (current ne body)) {
        val e = stack.remove(stack.length - 1)
        if (e eq el) return
      }
    }

    private def generateImpliedEndTags(except: String = null): Unit =
      while ((current ne body) && (current ne root) &&
        ImpliedEnd.contains(current.tag) && current.tag != except) pop()

    private def closeP(): Unit = {
      generateImpliedEndTags(except = "p")
      popUntilTag("p")
    }

    private def isHeading(t: String): Boolean =
      t.length == 2 && t.charAt(0) == 'h' && t.charAt(1) >= '1' && t.charAt(1) <= '6'

    // ---- insertion ----

    private def detach(n: Node): Unit = {
      val p = n.parent
      if (p != null) {
        val idx = p.children.indexWhere(_ eq n)
        if (idx >= 0) p.children.remove(idx)
      }
      n.parent = null
    }

    /** (parent, index-or-append) for the foster-parenting insertion place
      * (rare path: only reached when fosterParenting is on AND the target
      * is a table container). */
    private def fosterPlace: (Element, Int) = {
      val ti = stack.lastIndexWhere(_.tag == "table")
      if (ti < 0) return (body, -1)
      val table = stack(ti)
      val par = table.parent
      if (par != null) (par, par.children.indexWhere(_ eq table))
      else (stack(ti - 1), -1)
    }

    // fosterParenting (a plain boolean) is checked FIRST: the hot path
    // appends directly with no tuple allocation and no set lookup
    private def insertNodeAt(target: Element, n: Node): Unit = {
      if (fosterParenting && TableIsh.contains(target.tag)) {
        val (par, idx) = fosterPlace
        if (idx < 0) par.append(n)
        else { n.parent = par; par.children.insert(idx, n) }
      } else target.append(n)
    }

    private def insertNode(n: Node): Unit = insertNodeAt(current, n)

    private def insertText(data: String): Unit = {
      if (data.isEmpty) return
      val target = current
      if (fosterParenting && TableIsh.contains(target.tag)) {
        val (par, idx) = fosterPlace
        val prev: Node =
          if (idx < 0) { if (par.children.nonEmpty) par.children.last else null }
          else if (idx > 0) par.children(idx - 1)
          else null
        prev match {
          case t: Text => t.data += data
          case _ =>
            val t = new Text(data)
            if (idx < 0) par.append(t)
            else { t.parent = par; par.children.insert(idx, t) }
        }
      } else {
        val cs = target.children
        if (cs.nonEmpty) cs(cs.length - 1) match {
          case t: Text => t.data += data
          case _ => target.append(new Text(data))
        } else target.append(new Text(data))
      }
    }

    private def mkElement(tag: String, attrs: Seq[(String, String)]): Element = {
      val el = new Element(tag)
      attrs.foreach { case (k, v) => el.putAttr(k, v) }
      el
    }

    // Open-elements depth cap: a crawl-scale parser must not let an
    // adversarial 100k-deep <div><div>... page stack-overflow the executor
    // (tree recursion in text()/render is bounded by DOM depth). parse5 has
    // no such cap — divergence is confined to >512-deep pages, which the
    // reference would crash on rather than extract.
    private val MaxOpenDepth = 512

    private def insertElement(tag: String, attrs: Seq[(String, String)]): Element = {
      val el = mkElement(tag, attrs)
      insertNode(el)
      if (stack.length < MaxOpenDepth) stack += el
      el
    }

    private def insertVoid(tag: String, attrs: Seq[(String, String)]): Unit =
      insertNode(mkElement(tag, attrs))

    // ---- active formatting elements ----

    private def afeIndexOf(el: Element): Int = {
      var i = afe.length - 1
      while (i >= 0) {
        val e = afe(i)
        if ((e.el ne null) && (e.el eq el)) return i
        i -= 1
      }
      -1
    }

    private def afeIndexOfTagAfterMarker(tag: String): Int = {
      var i = afe.length - 1
      while (i >= 0 && (afe(i).el ne null)) {
        if (afe(i).el.tag == tag) return i
        i -= 1
      }
      -1
    }

    private def clearAfeToMarker(): Unit = {
      while (afe.nonEmpty) {
        val e = afe.remove(afe.length - 1)
        if (e.el eq null) return
      }
    }

    private def pushAfe(el: Element): Unit = {
      // Noah's Ark clause: max 3 identical (tag+attrs) entries per marker
      var count = 0
      var earliest = -1
      var i = afe.length - 1
      while (i >= 0 && (afe(i).el ne null)) {
        val e = afe(i).el
        if (e.tag == el.tag && e.sameAttrs(el)) { count += 1; earliest = i }
        i -= 1
      }
      if (count >= 3 && earliest >= 0) afe.remove(earliest)
      afe += new AfeEntry(el)
    }

    private def reconstructAfe(): Unit = {
      if (afe.isEmpty) return
      val last = afe(afe.length - 1)
      if ((last.el eq null) || stackContains(last.el)) return
      var i = afe.length - 1
      var done = false
      while (!done && i > 0) {
        val prev = afe(i - 1)
        if ((prev.el eq null) || stackContains(prev.el)) done = true else i -= 1
      }
      while (i < afe.length) {
        val entry = afe(i)
        val el = insertElement(entry.el.tag, Nil)
        // copy attributes from the template element
        entry.el.attrNamesSeq.foreach(n => el.putAttr(n, entry.el.attrRaw(n)))
        entry.el = el
        i += 1
      }
    }

    // ---- adoption agency ----

    private def adoptionAgency(subject: String): Unit = {
      // fast path for the well-formed close: the subject element is both
      // the current node and the newest formatting entry — the full
      // algorithm reduces to pop + remove (no furthest block can exist
      // above the top of the stack)
      if (afe.nonEmpty && current.tag == subject) {
        val lastE = afe(afe.length - 1)
        if ((lastE.el ne null) && (lastE.el eq current)) {
          afe.remove(afe.length - 1)
          stack.remove(stack.length - 1)
          return
        }
      }
      if (current.tag == subject && afeIndexOf(current) < 0) { pop(); return }
      var outer = 0
      while (outer < 8) {
        outer += 1
        val feAfe = afeIndexOfTagAfterMarker(subject)
        if (feAfe < 0) { anyOtherEndTag(subject); return }
        val fe = afe(feAfe).el
        val feStack = stack.indexWhere(_ eq fe)
        if (feStack < 0) { afe.remove(feAfe); return }
        if (!elementInScope(fe)) return
        // furthest block: lowest stack element above fe that is special
        var fbStack = -1
        var j = feStack + 1
        while (j < stack.length && fbStack < 0) {
          if (Special.contains(stack(j).tag)) fbStack = j
          j += 1
        }
        if (fbStack < 0) {
          stack.remove(feStack, stack.length - feStack)
          afe.remove(feAfe)
          return
        }
        val furthestBlock = stack(fbStack)
        val commonAncestor = stack(feStack - 1)
        var bookmark = feAfe
        var nodeIdx = fbStack
        var lastNode: Node = furthestBlock
        var inner = 0
        var brk = false
        while (!brk) {
          inner += 1
          nodeIdx -= 1
          var node = stack(nodeIdx)
          if (node eq fe) brk = true
          else {
            var nAfe = afeIndexOf(node)
            if (inner > 3 && nAfe >= 0) {
              afe.remove(nAfe)
              if (nAfe < bookmark) bookmark -= 1
              nAfe = -1
            }
            if (nAfe < 0) {
              stack.remove(nodeIdx)
            } else {
              val clone = node.cloneShallow
              afe(nAfe).el = clone
              stack(nodeIdx) = clone
              node = clone
              if (lastNode eq furthestBlock) bookmark = nAfe + 1
              detach(lastNode)
              node.append(lastNode)
              lastNode = node
            }
          }
        }
        detach(lastNode)
        if (TableIsh.contains(commonAncestor.tag)) {
          // appropriate place with foster parenting (common ancestor is a
          // table container)
          val savedFoster = fosterParenting
          fosterParenting = true
          insertNodeAt(commonAncestor, lastNode)
          fosterParenting = savedFoster
        } else commonAncestor.append(lastNode)
        val feClone = fe.cloneShallow
        furthestBlock.children.foreach { c => c.parent = feClone; feClone.children += c }
        furthestBlock.children.clear()
        furthestBlock.append(feClone)
        val feAfe2 = afeIndexOf(fe)
        if (feAfe2 >= 0) {
          afe.remove(feAfe2)
          if (feAfe2 < bookmark) bookmark -= 1
        }
        afe.insert(math.min(bookmark, afe.length), new AfeEntry(feClone))
        val feStack2 = stack.indexWhere(_ eq fe)
        if (feStack2 >= 0) stack.remove(feStack2)
        val fbStack2 = stack.indexWhere(_ eq furthestBlock)
        stack.insert(fbStack2 + 1, feClone)
      }
    }

    private def anyOtherEndTag(tag: String): Unit = {
      var i = stack.length - 1
      while (i >= 1) {
        val node = stack(i)
        if (node.tag == tag) {
          generateImpliedEndTags(except = tag)
          popUntilEl(node)
          return
        }
        if (Special.contains(node.tag)) return
        i -= 1
      }
    }

    // ---- derived insertion mode ----

    private def mode: Int = {
      var i = stack.length - 1
      while (i >= 0) {
        stack(i).tag match {
          case "select" => return MSelect
          case "td" | "th" => return MCell
          case "tr" => return MRow
          case "tbody" | "thead" | "tfoot" => return MTbody
          case "caption" => return MCaption
          case "colgroup" => return MColgroup
          case "table" => return MTable
          case "body" | "html" => return MBody
          case _ =>
        }
        i -= 1
      }
      MBody
    }

    /** Pop until the nearest <select> is popped ("in select" recovery). */
    private def popToSelect(): Unit = popUntilTag("select")

    private def selectHasTableAncestor: Boolean = {
      var i = stack.length - 1
      while (i >= 0) {
        val t = stack(i).tag
        if (t == "table") return true
        if (t == "select") () // keep walking below the select
        i -= 1
      }
      false
    }

    private def clearToTableContext(): Unit =
      while (current.tag != "table" && current.tag != "html" && (current ne body)) pop()
    private def clearToTbodyContext(): Unit =
      while (!Set("tbody", "thead", "tfoot", "html").contains(current.tag) && (current ne body)) pop()
    private def clearToRowContext(): Unit =
      while (current.tag != "tr" && current.tag != "html" && (current ne body)) pop()

    private def closeCell(): Unit = {
      generateImpliedEndTags()
      while (stack.length > 1 && (current ne body)) {
        val e = stack.remove(stack.length - 1)
        if (e.tag == "td" || e.tag == "th") {
          clearAfeToMarker()
          return
        }
      }
    }

    private def closeCaption(): Unit = {
      generateImpliedEndTags()
      popUntilTag("caption")
      clearAfeToMarker()
    }

    // ---- token processing ----

    def process(tok: Token): Unit = {
      tok match {
        case TText(raw) =>
          var data = decodeEntities(raw)
          if (data.indexOf('\u0000') >= 0) data = data.replace("\u0000", "")
          if ((skipNewlineIn ne null) && (skipNewlineIn eq currentOrNull) &&
            data.startsWith("\n")) data = data.substring(1)
          skipNewlineIn = null
          if (!bodyStarted) headText(data)
          else bodyText(data)
        case TRaw(raw) =>
          var data = raw
          if ((skipNewlineIn ne null) && (skipNewlineIn eq currentOrNull) &&
            data.startsWith("\n")) data = data.substring(1)
          skipNewlineIn = null
          if (data.nonEmpty) insertText(data)
        case TCdata(d, terminated) =>
          skipNewlineIn = null
          if (bodyStarted && d.nonEmpty &&
            stack.exists(e => e.tag == "svg" || e.tag == "math")) {
            // foreign (svg/math) content: CDATA is literal text
            insertText(d)
          } else {
            // HTML content: parse5 degrades `<![CDATA[` to a bogus comment
            // ending at the FIRST '>' — everything after it inside our span
            // RE-ENTERS THE TOKENIZER (tags become elements, entities
            // decode), plus the "]]>" tail ONLY when the tokenizer actually
            // consumed one (a span truncated at EOF has no tail; appending
            // a fabricated "]]>" would emit text parse5 never produces on
            // truncated pages)
            val gt = d.indexOf('>')
            if (gt >= 0) {
              val tail = if (terminated) "]]>" else ""
              val rest = d.substring(gt + 1) + tail
              if (rest.nonEmpty) tokenize(rest, xml = false).foreach(process)
            }
          }
        case TComment(d) =>
          skipNewlineIn = null
          insertNode(new Comment(d))
        case t: TOpen =>
          skipNewlineIn = null
          if (!bodyStarted) headStart(t) else startTag(t)
        case TClose(tag) =>
          skipNewlineIn = null
          if (!bodyStarted) headEnd(tag) else endTag(tag)
      }
    }

    private def currentOrNull: Element =
      if (stack.nonEmpty) current else null

    // ---- head phase ----

    private def headText(data: String): Unit = {
      if (stack.length > 1) insertText(data) // inside title/script/etc
      else if (data.forall(c => c == ' ' || c == '\t' || c == '\n' || c == '\f')) {
        if (!headClosed) head.append(new Text(data))
        else root.append(new Text(data))
      } else {
        startBody(Nil)
        bodyText(data)
      }
    }

    private def headStart(t: TOpen): Unit = t.tag match {
      case "html" =>
        if (!htmlAttrsSeen) {
          t.attrs.foreach { case (k, v) => root.putAttrIfAbsent(k, v) }
          htmlAttrsSeen = true
        }
      case "head" => ()
      case "body" => startBody(t.attrs)
      case tag if HeadTags.contains(tag) && stack.length == 1 && !headClosed =>
        if (!headPushed) { stack += head; headPushed = true }
        tag match {
          case "title" | "style" | "script" | "noscript" =>
            insertElement(tag, t.attrs) // raw content + TClose follow
          case _ =>
            insertVoid(tag, t.attrs)
            // void head element: return the stack to [html] immediately
            stack.remove(stack.length - 1); headPushed = false
        }
      case _ =>
        startBody(Nil)
        startTag(t)
    }

    private def headEnd(tag: String): Unit = tag match {
      case "head" =>
        if (stack.length > 1) stack.remove(1, stack.length - 1)
        headPushed = false
        headClosed = true
      case "html" | "body" | "br" =>
        startBody(Nil)
        if (tag == "br") endTag("br")
      case t =>
        // close of an open head element (title/script/style/noscript)
        if (stack.length > 1 && current.tag == t) {
          stack.remove(stack.length - 1)
          if (stack.length == 2 && (stack.last eq head)) {
            stack.remove(1); headPushed = false
          }
        }
    }

    // ---- body phase: text ----

    private def bodyText(data: String): Unit = {
      if (data.isEmpty) return
      // the pending-table-characters algorithm matters exactly when the
      // CURRENT node is a table container (foster-insertion only triggers
      // on table-ish targets anyway) — no derived-mode walk needed here
      val t = current.tag
      val tableIsh = t.length <= 5 && (t == "table" || t == "tbody" ||
        t == "thead" || t == "tfoot" || t == "tr")
      if (tableIsh) {
        if (data.forall(c => c == ' ' || c == '\t' || c == '\n' || c == '\f'))
          insertText(data)
        else {
          fosterParenting = true
          reconstructAfe()
          insertText(data)
          fosterParenting = false
        }
      } else {
        // in-select text inserts without reconstruction (for text inside an
        // <option> the reconstruction is a no-op there anyway: nothing can
        // pop a formatting element inside a select, where blocks are
        // ignored)
        if (t != "select" && t != "optgroup") reconstructAfe()
        insertText(data)
      }
    }

    // ---- body phase: start tags ----

    private def startTag(t: TOpen): Unit = mode match {
      case MSelect => startInSelect(t)
      case MTable => startInTable(t)
      case MTbody => startInTbody(t)
      case MRow => startInRow(t)
      case MColgroup => startInColgroup(t)
      case MCell => t.tag match {
        case "caption" | "col" | "colgroup" | "tbody" | "td" | "tfoot" |
             "th" | "thead" | "tr" =>
          if (inTableScope("td") || inTableScope("th")) { closeCell(); startTag(t) }
        case _ => inBodyStart(t)
      }
      case MCaption => t.tag match {
        case "caption" | "col" | "colgroup" | "tbody" | "td" | "tfoot" |
             "th" | "thead" | "tr" =>
          if (inTableScope("caption")) { closeCaption(); startTag(t) }
        case _ => inBodyStart(t)
      }
      case _ => inBodyStart(t)
    }

    // "in select" (spec 13.2.6.4.16): only option/optgroup/script content
    // is legal; other start tags are IGNORED (their text still flows into
    // the select), a nested <select> acts as </select>, input/keygen/
    // textarea close the select and reprocess, and table tags close it
    // when a table is open below ("in select in table").
    private def startInSelect(t: TOpen): Unit = t.tag match {
      case "option" =>
        if (current.tag == "option") pop()
        insertElement("option", t.attrs)
      case "optgroup" =>
        if (current.tag == "option") pop()
        if (current.tag == "optgroup") pop()
        insertElement("optgroup", t.attrs)
      case "select" => popToSelect()
      case "input" | "keygen" | "textarea" =>
        popToSelect(); startTag(t)
      case "script" | "style" | "title" => inBodyStart(t)
      case "caption" | "table" | "tbody" | "tfoot" | "thead" | "tr" |
           "td" | "th" =>
        if (selectHasTableAncestor) { popToSelect(); startTag(t) }
      case _ => () // parse error: ignore
    }

    private def endInSelect(tag: String): Unit = tag match {
      case "select" => popToSelect()
      case "option" =>
        if (current.tag == "option") pop()
      case "optgroup" =>
        if (current.tag == "option" && stack.length >= 2 &&
          stack(stack.length - 2).tag == "optgroup") { pop(); pop() }
        else if (current.tag == "optgroup") pop()
      case "caption" | "table" | "tbody" | "tfoot" | "thead" | "tr" |
           "td" | "th" =>
        if (selectHasTableAncestor) { popToSelect(); endTag(tag) }
      case _ => () // parse error: ignore
    }

    private def startInTable(t: TOpen): Unit = t.tag match {
      case "caption" =>
        clearToTableContext()
        afe += new AfeEntry(null)
        insertElement("caption", t.attrs)
      case "colgroup" =>
        clearToTableContext()
        insertElement("colgroup", t.attrs)
      case "col" =>
        clearToTableContext()
        insertElement("colgroup", Nil)
        startTag(t)
      case "tbody" | "tfoot" | "thead" =>
        clearToTableContext()
        insertElement(t.tag, t.attrs)
      case "td" | "th" | "tr" =>
        clearToTableContext()
        insertElement("tbody", Nil)
        startTag(t)
      case "table" =>
        if (inTableScope("table")) { popUntilTag("table"); startTag(t) }
      case "style" | "script" => inBodyStart(t)
      case "input" if t.attrs.exists { case (k, v) =>
          k == "type" && v.equalsIgnoreCase("hidden") } =>
        insertVoid("input", t.attrs)
      case "form" =>
        if (formPtr == null) {
          val el = mkElement("form", t.attrs)
          current.append(el)
          formPtr = el
        }
      case _ =>
        fosterParenting = true
        inBodyStart(t)
        fosterParenting = false
    }

    private def startInTbody(t: TOpen): Unit = t.tag match {
      case "tr" =>
        clearToTbodyContext()
        insertElement("tr", t.attrs)
      case "td" | "th" =>
        clearToTbodyContext()
        insertElement("tr", Nil)
        startTag(t)
      case "caption" | "col" | "colgroup" | "tbody" | "tfoot" | "thead" =>
        if (inTableScope("tbody") || inTableScope("thead") || inTableScope("tfoot")) {
          clearToTbodyContext()
          pop()
          startTag(t)
        }
      case _ => startInTable(t)
    }

    private def startInRow(t: TOpen): Unit = t.tag match {
      case "td" | "th" =>
        clearToRowContext()
        insertElement(t.tag, t.attrs)
        afe += new AfeEntry(null)
      case "caption" | "col" | "colgroup" | "tbody" | "tfoot" | "thead" | "tr" =>
        if (inTableScope("tr")) { clearToRowContext(); pop(); startTag(t) }
      case _ => startInTable(t)
    }

    private def startInColgroup(t: TOpen): Unit = t.tag match {
      case "col" => insertVoid("col", t.attrs)
      case "html" => ()
      case _ =>
        if (current.tag == "colgroup") { pop(); startTag(t) }
    }

    private def inBodyStart(t: TOpen): Unit = {
      val tag = t.tag
      tag match {
        case "html" =>
          if (!htmlAttrsSeen) {
            t.attrs.foreach { case (k, v) => root.putAttrIfAbsent(k, v) }
            htmlAttrsSeen = true
          }
        case "body" =>
          t.attrs.foreach { case (k, v) => body.putAttrIfAbsent(k, v) }
        case "head" => ()
        case "base" | "basefont" | "bgsound" | "link" | "meta" =>
          insertVoid(tag, t.attrs)
        case "title" | "style" | "script" | "noscript" | "iframe" |
             "noembed" | "noframes" =>
          insertElement(tag, t.attrs) // raw/RCDATA content follows
        case "xmp" =>
          if (inButtonScope("p")) closeP()
          reconstructAfe()
          insertElement(tag, t.attrs)
        case tg if PClosingBlocks.contains(tg) =>
          if (inButtonScope("p")) closeP()
          insertElement(tg, t.attrs)
        case tg if isHeading(tg) =>
          if (inButtonScope("p")) closeP()
          if (isHeading(current.tag)) pop()
          insertElement(tg, t.attrs)
        case "pre" | "listing" =>
          if (inButtonScope("p")) closeP()
          val el = insertElement(tag, t.attrs)
          skipNewlineIn = el
        case "plaintext" =>
          if (inButtonScope("p")) closeP()
          insertElement("plaintext", t.attrs) // tokenizer delivers the rest raw
        case "form" =>
          if (formPtr == null) {
            if (inButtonScope("p")) closeP()
            formPtr = insertElement("form", t.attrs)
          }
        case "li" =>
          liDdDtLoop(isLi = true)
          if (inButtonScope("p")) closeP()
          insertElement("li", t.attrs)
        case "dd" | "dt" =>
          liDdDtLoop(isLi = false)
          if (inButtonScope("p")) closeP()
          insertElement(tag, t.attrs)
        case "button" =>
          if (inScope("button")) { generateImpliedEndTags(); popUntilTag("button") }
          reconstructAfe()
          insertElement("button", t.attrs)
        case "a" =>
          val i = afeIndexOfTagAfterMarker("a")
          if (i >= 0) {
            val el = afe(i).el
            adoptionAgency("a")
            val i2 = afeIndexOf(el)
            if (i2 >= 0) afe.remove(i2)
            val si = stack.indexWhere(_ eq el)
            if (si >= 0) stack.remove(si)
          }
          reconstructAfe()
          pushAfe(insertElement("a", t.attrs))
        case "nobr" =>
          reconstructAfe()
          if (inScope("nobr")) { adoptionAgency("nobr"); reconstructAfe() }
          pushAfe(insertElement("nobr", t.attrs))
        case tg if FormattingTags.contains(tg) =>
          reconstructAfe()
          pushAfe(insertElement(tg, t.attrs))
        case "applet" | "marquee" | "object" =>
          reconstructAfe()
          insertElement(tag, t.attrs)
          afe += new AfeEntry(null)
        case "table" =>
          if (inButtonScope("p")) closeP() // no-quirks documents
          insertElement("table", t.attrs)
        case "area" | "br" | "embed" | "img" | "wbr" | "keygen" =>
          reconstructAfe()
          insertVoid(tag, t.attrs)
        case "image" =>
          reconstructAfe()
          insertVoid("img", t.attrs) // spec: "Don't ask." (change to img)
        case "input" =>
          reconstructAfe()
          insertVoid("input", t.attrs)
        case "param" | "source" | "track" =>
          insertVoid(tag, t.attrs)
        case "hr" =>
          if (inButtonScope("p")) closeP()
          insertVoid("hr", t.attrs)
        case "textarea" =>
          val el = insertElement("textarea", t.attrs)
          skipNewlineIn = el
        case "select" =>
          reconstructAfe()
          insertElement("select", t.attrs)
        case "option" | "optgroup" =>
          if (current.tag == "option") pop()
          reconstructAfe()
          insertElement(tag, t.attrs)
        case "rb" | "rtc" =>
          if (inScope("ruby")) generateImpliedEndTags()
          insertElement(tag, t.attrs)
        case "rp" | "rt" =>
          if (inScope("ruby")) generateImpliedEndTags(except = "rtc")
          insertElement(tag, t.attrs)
        case "caption" | "col" | "colgroup" | "frame" | "tbody" | "td" |
             "tfoot" | "th" | "thead" | "tr" =>
          () // parse error: ignore
        case _ =>
          reconstructAfe()
          if (VoidTags.contains(tag) || t.selfClosing && isForeignish(tag))
            insertVoid(tag, t.attrs)
          else insertElement(tag, t.attrs)
      }
    }

    // self-closing syntax is honored only for foreign (svg/math) subtrees;
    // html elements ignore the flag per spec
    private def isForeignish(tag: String): Boolean =
      tag == "svg" || tag == "math" || tag == "path" || tag == "circle" ||
        tag == "rect" || tag == "line" || tag == "polygon" || tag == "use" ||
        tag == "ellipse" || tag == "polyline"

    private def liDdDtLoop(isLi: Boolean): Unit = {
      var i = stack.length - 1
      var done = false
      while (!done && i >= 1) {
        val node = stack(i)
        val tg = node.tag
        if (isLi && tg == "li") {
          generateImpliedEndTags(except = "li")
          popUntilTag("li")
          done = true
        } else if (!isLi && (tg == "dd" || tg == "dt")) {
          generateImpliedEndTags(except = tg)
          popUntilTag(tg)
          done = true
        } else if (Special.contains(tg) && tg != "address" && tg != "div" && tg != "p") {
          done = true
        } else i -= 1
      }
    }

    // ---- body phase: end tags ----

    private def endTag(tag: String): Unit = mode match {
      case MSelect => endInSelect(tag)
      case MTable => endInTable(tag)
      case MTbody => endInTbody(tag)
      case MRow => endInRow(tag)
      case MColgroup => tag match {
        case "colgroup" => if (current.tag == "colgroup") pop()
        case "col" => ()
        case _ => if (current.tag == "colgroup") { pop(); endTag(tag) }
      }
      case MCell => tag match {
        case "td" | "th" =>
          if (inTableScope(tag)) {
            generateImpliedEndTags()
            popUntilTag(tag)
            clearAfeToMarker()
          }
        case "body" | "caption" | "col" | "colgroup" | "html" => ()
        case "table" | "tbody" | "tfoot" | "thead" | "tr" =>
          if (inTableScope(tag)) { closeCell(); endTag(tag) }
        case _ => inBodyEnd(tag)
      }
      case MCaption => tag match {
        case "caption" => if (inTableScope("caption")) closeCaption()
        case "table" =>
          if (inTableScope("caption")) { closeCaption(); endTag(tag) }
        case "body" | "col" | "colgroup" | "html" | "tbody" | "td" |
             "tfoot" | "th" | "thead" | "tr" => ()
        case _ => inBodyEnd(tag)
      }
      case _ => inBodyEnd(tag)
    }

    private def endInTable(tag: String): Unit = tag match {
      case "table" => if (inTableScope("table")) popUntilTag("table")
      case "body" | "caption" | "col" | "colgroup" | "html" | "tbody" |
           "td" | "tfoot" | "th" | "thead" | "tr" => ()
      case _ =>
        fosterParenting = true
        inBodyEnd(tag)
        fosterParenting = false
    }

    private def endInTbody(tag: String): Unit = tag match {
      case "tbody" | "tfoot" | "thead" =>
        if (inTableScope(tag)) { clearToTbodyContext(); pop() }
      case "table" =>
        if (inTableScope("tbody") || inTableScope("thead") || inTableScope("tfoot")) {
          clearToTbodyContext(); pop(); endTag(tag)
        }
      case "body" | "caption" | "col" | "colgroup" | "html" | "td" | "th" | "tr" => ()
      case _ => endInTable(tag)
    }

    private def endInRow(tag: String): Unit = tag match {
      case "tr" =>
        if (inTableScope("tr")) { clearToRowContext(); pop() }
      case "table" =>
        if (inTableScope("tr")) { clearToRowContext(); pop(); endTag(tag) }
      case "tbody" | "tfoot" | "thead" =>
        if (inTableScope(tag) && inTableScope("tr")) {
          clearToRowContext(); pop(); endTag(tag)
        }
      case "body" | "caption" | "col" | "colgroup" | "html" | "td" | "th" => ()
      case _ => endInTable(tag)
    }

    private def inBodyEnd(tag: String): Unit = {
      tag match {
        case "body" | "html" => () // content after </body> stays in body
        case "p" =>
          if (!inButtonScope("p")) {
            insertElement("p", Nil) // stray </p>: insert an empty <p>
            closeP()
          } else closeP()
        case tg if BlockEndTags.contains(tg) =>
          if (inScope(tg)) { generateImpliedEndTags(); popUntilTag(tg) }
        case "form" =>
          val node = formPtr
          formPtr = null
          if (node != null && elementInScope(node)) {
            generateImpliedEndTags()
            // spec: remove the node (not pop-until) — elements above stay
            val i = stack.indexWhere(_ eq node)
            if (i >= 0) stack.remove(i)
          }
        case "li" =>
          if (inListItemScope("li")) {
            generateImpliedEndTags(except = "li")
            popUntilTag("li")
          }
        case "dd" | "dt" =>
          if (inScope(tag)) {
            generateImpliedEndTags(except = tag)
            popUntilTag(tag)
          }
        case tg if isHeading(tg) =>
          if (anyHeadingInScope) {
            generateImpliedEndTags()
            while (stack.length > 1 && (current ne body)) {
              val e = stack.remove(stack.length - 1)
              if (isHeading(e.tag)) return
            }
          }
        case tg if FormattingTags.contains(tg) =>
          adoptionAgency(tg)
        case "applet" | "marquee" | "object" =>
          if (inScope(tag)) {
            generateImpliedEndTags()
            popUntilTag(tag)
            clearAfeToMarker()
          }
        case "br" =>
          // spec: </br> acts as <br>
          reconstructAfe()
          insertVoid("br", Nil)
        case _ => anyOtherEndTag(tag)
      }
    }
  }

  // ---------------- tokenizer ----------------
  private[core] sealed trait Token
  private[core] final case class TText(data: String) extends Token
  /** Raw-text / RCDATA content: entity handling already final. */
  private[core] final case class TRaw(data: String) extends Token
  /** `<![CDATA[...]]>` span: text in foreign (svg/math) context, dropped
    * in HTML context (the tree builder decides — the tokenizer here is a
    * context-free pre-pass, unlike the spec's feedback loop). */
  private[core] final case class TCdata(data: String,
      terminated: Boolean = true) extends Token
  private[core] final case class TComment(data: String) extends Token
  private[core] final case class TOpen(tag: String, attrs: Seq[(String, String)],
      selfClosing: Boolean) extends Token
  private[core] final case class TClose(tag: String) extends Token

  // elements whose content is swallowed verbatim until the matching close
  private val RawSwallow = Set("script", "style", "textarea", "title",
    "noscript", "iframe", "xmp", "noembed", "noframes")
  // RCDATA: entities ARE decoded (title/textarea); the rest stay verbatim
  private val Rcdata = Set("title", "textarea")

  private[core] def tokenize(html: String, xml: Boolean): Seq[Token] = {
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
        } else if (html.startsWith("<![CDATA[", lt)) {
          val end = html.indexOf("]]>", lt + 9)
          val stop = if (end < 0) n else end
          out += TCdata(html.substring(lt + 9, stop), terminated = end >= 0)
          i = if (end < 0) n else end + 3
        } else if (html.charAt(lt + 1) == '!' || html.charAt(lt + 1) == '?') {
          val end = html.indexOf('>', lt) // doctype / PI / bogus comment: skip
          i = if (end < 0) n else end + 1
        } else if (html.charAt(lt + 1) == '/') {
          if (lt + 2 >= n) { out += TText(html.substring(lt)); i = n }
          else {
            val c = html.charAt(lt + 2)
            if (c == '>') i = lt + 3 // `</>`: ignored entirely
            else if (!c.isLetter) {
              // bogus comment: `</` + non-letter swallows to `>`
              val end = html.indexOf('>', lt)
              i = if (end < 0) n else end + 1
            } else {
              val (name, next) = readCloseTag(html, lt)
              if (name.nonEmpty) out += TClose(name)
              i = next
            }
          }
        } else if (html.charAt(lt + 1).isLetter) {
          val (tok, next) = readTag(html, lt)
          out += tok
          i = next
          tok match {
            case TOpen("plaintext", _, _) if !xml =>
              // PLAINTEXT state: the rest of the input is literal text —
              // no tags, no entities, no way out (HTML spec 13.2.5.5)
              if (i < n) out += TRaw(html.substring(i))
              i = n
            case TOpen(tag, _, _) if !xml && RawSwallow.contains(tag) =>
              // swallow until a real close tag (`</tag` + ws|/|>|EOF)
              val idx = findRawClose(html, tag, i)
              val decode = Rcdata.contains(tag)
              if (idx < 0) {
                val body = html.substring(i)
                out += TRaw(if (decode) decodeEntities(body) else body)
                i = n
              } else {
                if (idx > i) {
                  val body = html.substring(i, idx)
                  out += TRaw(if (decode) decodeEntities(body) else body)
                }
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

  /** First index of `</tag` (case-insensitive) followed by ws / '/' / '>' /
    * EOF — the spec's "appropriate end tag" condition for raw text. */
  private def findRawClose(s: String, tag: String, from: Int): Int = {
    val needle = "</" + tag
    val m = needle.length
    var i = math.max(0, from)
    val n = s.length
    while (i + m <= n) {
      if (s.regionMatches(true, i, needle, 0, m)) {
        if (i + m == n) return i
        val c = s.charAt(i + m)
        if (c == '>' || c == '/' || c.isWhitespace) return i
      }
      i += 1
    }
    -1
  }

  /** Parse a close tag (attributes allowed per tokenizer grammar, ignored;
    * quoted values may contain '>'). Returns (lowercased name, next index). */
  private def readCloseTag(html: String, lt: Int): (String, Int) = {
    var i = lt + 2
    val n = html.length
    val nameStart = i
    while (i < n && html.charAt(i) != '>' && html.charAt(i) != '/' &&
      !html.charAt(i).isWhitespace) i += 1
    val name = html.substring(nameStart, i).toLowerCase
    // skip (and discard) anything until '>', honoring quotes
    var done = false
    while (!done && i < n) {
      val c = html.charAt(i)
      if (c == '>') { i += 1; done = true }
      else if (c == '"' || c == '\'') {
        val q = c
        i += 1
        while (i < n && html.charAt(i) != q) i += 1
        if (i < n) i += 1
      } else i += 1
    }
    (name, i)
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
          attrs += name -> decodeAttr(value)
      } else done = true
    }
    (TOpen(tag, attrs.toSeq, selfClosing), i)
  }
}
