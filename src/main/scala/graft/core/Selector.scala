package graft.core

import Html.Element

/** CSS selector subset used by the reference's cheerio calls (SURVEY.md §2b):
  * tag, `#id`, `.class`, `[attr]`, `[attr=v]`, `[attr^=v]`, `[attr*=v]`,
  * compound simple selectors, descendant combinator (whitespace), `>` child
  * combinator, comma groups, `:first-child`, `:not(<simple>)`.
  *
  * Matching returns elements in document order with duplicates removed —
  * the order cheerio exposes and the BFS link-order contract depends on.
  */
object Selector {

  sealed trait Simple
  final case class Tag(name: String) extends Simple
  final case class Id(v: String) extends Simple
  final case class Cls(v: String) extends Simple
  final case class Attr(name: String, op: String, v: String) extends Simple // op: "", "=", "^=", "*=", "$="
  final case class FirstChild() extends Simple
  final case class Not(inner: Seq[Simple]) extends Simple

  final case class Compound(simples: Seq[Simple])
  /** combinators(i) applies between compounds(i) and compounds(i+1):
    * ' ' descendant, '>' child. */
  final case class Chain(compounds: Seq[Compound], combinators: Seq[Char])

  // Selector strings are a small fixed vocabulary (the extraction cascades),
  // but select() runs per page per selector — cache the parsed form.
  private val parseCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[Chain]]()

  private def parsedGroups(selector: String): Seq[Chain] = {
    val hit = parseCache.get(selector)
    if (hit != null) hit
    else {
      val parsed = parseGroups(selector)
      if (parseCache.size < 4096) parseCache.put(selector, parsed)
      parsed
    }
  }

  def select(root: Element, selector: String): Seq[Element] = {
    val chains = parsedGroups(selector)
    val out = scala.collection.mutable.ArrayBuffer[Element]()
    // single recursive document-order walk (each element visited once, so
    // no dedupe structure needed; iterator chains here were the extraction
    // hot path's main allocation source)
    def walk(parent: Element): Unit = {
      val cs = parent.children
      var i = 0
      while (i < cs.length) {
        cs(i) match {
          case e: Element if !e.removed =>
            var m = false
            var c = 0
            while (!m && c < chains.length) {
              if (matchesChain(e, chains(c))) m = true
              c += 1
            }
            if (m) out += e
            walk(e)
          case _ =>
        }
        i += 1
      }
    }
    // root itself can match (rare: $('html'))
    if (chains.exists(c => matchesChain(root, c))) out += root
    walk(root)
    out.toSeq
  }

  def matches(el: Element, selector: String): Boolean =
    parsedGroups(selector).exists(c => matchesChain(el, c))

  private def matchesChain(el: Element, chain: Chain): Boolean = {
    // match last compound on el, then walk ancestors for the rest
    def step(e: Element, idx: Int): Boolean = {
      if (!matchesCompound(e, chain.compounds(idx))) return false
      if (idx == 0) return true
      val comb = chain.combinators(idx - 1)
      comb match {
        case '>' =>
          val p = e.parent
          p != null && step(p, idx - 1)
        case _ => // descendant: any ancestor
          var p = e.parent
          while (p != null) {
            if (step(p, idx - 1)) return true
            p = p.parent
          }
          false
      }
    }
    step(el, chain.compounds.length - 1)
  }

  private def matchesCompound(el: Element, c: Compound): Boolean =
    c.simples.forall(s => matchesSimple(el, s))

  private def matchesSimple(el: Element, s: Simple): Boolean = s match {
    case Tag("*") => true
    case Tag(t) => el.tag == t
    case Id(v) => el.id == v
    case Cls(v) => el.hasClass(v)
    case Attr(name, "", _) => el.hasAttr(name)
    case Attr(name, "=", v) => el.attrRaw(name) == v
    case Attr(name, "^=", v) => { val a = el.attrRaw(name); a != null && a.startsWith(v) }
    case Attr(name, "*=", v) => { val a = el.attrRaw(name); a != null && a.contains(v) }
    case Attr(name, "$=", v) => { val a = el.attrRaw(name); a != null && a.endsWith(v) }
    case Attr(_, _, _) => false
    case FirstChild() =>
      el.parent != null && {
        val cs = el.parent.children
        var i = 0
        var first: Element = null
        while (first == null && i < cs.length) {
          cs(i) match {
            case e: Element if !e.removed => first = e
            case _ =>
          }
          i += 1
        }
        first eq el
      }
    case Not(inner) => !inner.forall(s2 => matchesSimple(el, s2))
  }

  // ---------------- parsing ----------------
  def parseGroups(selector: String): Seq[Chain] =
    splitTop(selector, ',').map(_.trim).filter(_.nonEmpty).map(parseChain)

  /** split on `sep` at bracket-depth 0 (so `[attr*=","]` is safe). */
  private def splitTop(s: String, sep: Char): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    val cur = new StringBuilder
    var depth = 0; var inQ: Char = 0
    s.foreach { ch =>
      if (inQ != 0) { cur.append(ch); if (ch == inQ) inQ = 0 }
      else ch match {
        case '"' | '\'' => inQ = ch; cur.append(ch)
        case '[' => depth += 1; cur.append(ch)
        case ']' => depth -= 1; cur.append(ch)
        case '(' => depth += 1; cur.append(ch)
        case ')' => depth -= 1; cur.append(ch)
        case c if c == sep && depth == 0 => out += cur.toString; cur.clear()
        case c => cur.append(c)
      }
    }
    out += cur.toString
    out.toSeq
  }

  private def parseChain(s: String): Chain = {
    // tokenize into compounds and combinators
    val compounds = scala.collection.mutable.ArrayBuffer[Compound]()
    val combinators = scala.collection.mutable.ArrayBuffer[Char]()
    var i = 0
    val n = s.length
    var pendingComb = ' '
    var first = true
    while (i < n) {
      while (i < n && s.charAt(i).isWhitespace) i += 1
      if (i < n && s.charAt(i) == '>') {
        pendingComb = '>'; i += 1
        while (i < n && s.charAt(i).isWhitespace) i += 1
      }
      if (i < n) {
        val start = i
        var depth = 0; var inQ: Char = 0
        while (i < n && (depth > 0 || inQ != 0 ||
          (!s.charAt(i).isWhitespace && s.charAt(i) != '>'))) {
          val ch = s.charAt(i)
          if (inQ != 0) { if (ch == inQ) inQ = 0 }
          else if (ch == '"' || ch == '\'') inQ = ch
          else if (ch == '[' || ch == '(') depth += 1
          else if (ch == ']' || ch == ')') depth -= 1
          i += 1
        }
        val comp = parseCompound(s.substring(start, i))
        if (!first) combinators += pendingComb
        compounds += comp
        first = false
        pendingComb = ' '
      }
    }
    Chain(compounds.toSeq, combinators.toSeq)
  }

  def parseCompound(s0: String): Compound = {
    val s = s0.trim
    val simples = scala.collection.mutable.ArrayBuffer[Simple]()
    var i = 0
    val n = s.length
    while (i < n) {
      s.charAt(i) match {
        case '#' =>
          val st = i + 1; i = st
          while (i < n && !isDelim(s.charAt(i))) i += 1
          simples += Id(s.substring(st, i))
        case '.' =>
          val st = i + 1; i = st
          while (i < n && !isDelim(s.charAt(i))) i += 1
          simples += Cls(s.substring(st, i))
        case '[' =>
          val end = matchingBracket(s, i)
          simples += parseAttr(s.substring(i + 1, end))
          i = end + 1
        case ':' =>
          val st = i + 1; i = st
          while (i < n && s.charAt(i) != '(' && !isDelim(s.charAt(i))) i += 1
          val name = s.substring(st, i)
          if (i < n && s.charAt(i) == '(') {
            val end = matchingParen(s, i)
            val inner = s.substring(i + 1, end)
            i = end + 1
            name match {
              case "not" => simples += Not(parseCompound(inner).simples)
              case _ => // unsupported functional pseudo: never matches
                simples += Attr(" unsupported", "=", name)
            }
          } else name match {
            case "first-child" => simples += FirstChild()
            case _ => simples += Attr(" unsupported", "=", name)
          }
        case _ =>
          val st = i
          while (i < n && !isDelim(s.charAt(i))) i += 1
          val t = s.substring(st, i).toLowerCase
          if (t.nonEmpty) simples += Tag(t)
          else i += 1 // stray delimiter (e.g. unmatched ']'): skip, don't loop
      }
    }
    Compound(simples.toSeq)
  }

  private def isDelim(c: Char): Boolean =
    c == '#' || c == '.' || c == '[' || c == ':' || c == ']'

  private def matchingBracket(s: String, open: Int): Int = {
    var i = open + 1; var inQ: Char = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      if (inQ != 0) { if (ch == inQ) inQ = 0 }
      else if (ch == '"' || ch == '\'') inQ = ch
      else if (ch == ']') return i
      i += 1
    }
    s.length - 1
  }

  private def matchingParen(s: String, open: Int): Int = {
    var i = open + 1; var depth = 1; var inQ: Char = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      if (inQ != 0) { if (ch == inQ) inQ = 0 }
      else if (ch == '"' || ch == '\'') inQ = ch
      else if (ch == '(') depth += 1
      else if (ch == ')') { depth -= 1; if (depth == 0) return i }
      i += 1
    }
    s.length - 1
  }

  /** Parse the inside of `[...]`: name, optional op (=, ^=, *=, $=), value
    * (optionally quoted). */
  private def parseAttr(body0: String): Attr = {
    val body = body0.trim
    val ops = Seq("^=", "*=", "$=", "=")
    ops.collectFirst {
      case op if body.contains(op) && !body.startsWith(op) =>
        val idx = body.indexOf(op)
        val name = body.substring(0, idx).trim.toLowerCase
        var v = body.substring(idx + op.length).trim
        if (v.length >= 2 && (v.head == '"' || v.head == '\'') && v.last == v.head)
          v = v.substring(1, v.length - 1)
        Attr(name, op, v)
    }.getOrElse(Attr(body.toLowerCase, "", ""))
  }
}
