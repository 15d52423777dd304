package graft.engine

/** Deterministic generator of WELL-FORMED random HTML documents for
  * differential testing against the reference extractor (cheerio+turndown).
  * The grammar respects HTML content models (no block elements inside <p>,
  * list items only inside lists, proper table structure) so both parsers
  * build the same tree — the differential surface is extraction semantics
  * (cascades, cleaning, text whitespace, Turndown rendering), not HTML5
  * error-recovery, which is out of the minimal parser's documented domain.
  */
object FuzzHtml {

  private val words = Vector("data", "spark", "crawl", "frontier", "page",
    "robot", "index", "shard", "vector", "token", "marker", "quality",
    "filter", "select", "render", "sample", "window", "batch", "stream")
  private val specials = Vector("*star*", "under_score", "#hash", "[br]",
    "`tick`", "2 * 3", "a-b", "1. item", "+ plus", "> gt", "&amp;", "&lt;",
    "&gt;", "&quot;", "100%", "(paren)")

  final class Gen(seed: Long) {
    private val rnd = new scala.util.Random(seed)
    private def pick[A](xs: Vector[A]): A = xs(rnd.nextInt(xs.size))
    private def words(n: Int): String =
      (1 to n).map(_ => if (rnd.nextInt(6) == 0) pick(specials) else pick(FuzzHtml.words))
        .mkString(" ")

    private def inline(depth: Int): String = rnd.nextInt(8) match {
      case 0 => s"<em>${words(2)}</em>"
      case 1 => s"<strong>${words(2)}</strong>"
      case 2 => s"<code>${words(2)}</code>"
      case 3 => s"""<a href="http://x.example/p${rnd.nextInt(40)}${if (rnd.nextBoolean()) "(v)" else ""}">${words(2)}</a>"""
      case 4 => s"""<img src="http://x.example/i${rnd.nextInt(20)}.png" alt="${words(1)}">"""
      case 5 if depth > 0 => s"<em>${inline(depth - 1)} ${words(1)}</em>"
      case _ => words(rnd.nextInt(5) + 1)
    }

    private def listItems(ordered: Boolean, depth: Int): String =
      (1 to rnd.nextInt(3) + 1).map { _ =>
        val nested = if (depth > 0 && rnd.nextInt(3) == 0)
          (if (ordered) s"<ol>${listItems(ordered, depth - 1)}</ol>"
          else s"<ul>${listItems(ordered, depth - 1)}</ul>")
        else ""
        s"<li>${words(rnd.nextInt(3) + 1)}$nested</li>"
      }.mkString

    private def block(depth: Int): String = rnd.nextInt(10) match {
      case 0 =>
        val lvl = rnd.nextInt(6) + 1
        s"<h$lvl>${words(3)}</h$lvl>"
      case 1 => s"<p>${(1 to rnd.nextInt(3) + 1).map(_ => inline(1)).mkString(" ")}</p>"
      case 2 => s"<ul>${listItems(ordered = false, 1)}</ul>"
      case 3 => s"<ol>${listItems(ordered = true, 1)}</ol>"
      case 4 => s"<blockquote><p>${words(4)}</p>${if (rnd.nextBoolean()) s"<p>${words(3)}</p>" else ""}</blockquote>"
      case 5 => s"""<pre><code${if (rnd.nextBoolean()) " class=\"language-scala\"" else ""}>val x${rnd.nextInt(9)} = ${rnd.nextInt(99)}
                   |print(x)</code></pre>""".stripMargin
      case 6 => "<hr>"
      case 7 if depth > 0 =>
        s"""<div class="c${rnd.nextInt(5)}">${(1 to rnd.nextInt(2) + 1).map(_ => block(depth - 1)).mkString}</div>"""
      case 8 =>
        val cols = rnd.nextInt(2) + 2
        def row(tag: String) = s"<tr>${(1 to cols).map(_ => s"<$tag>${words(1)}</$tag>").mkString}</tr>"
        s"<table><thead>${row("th")}</thead><tbody>${row("td")}${row("td")}</tbody></table>"
      case _ => s"<p>${words(rnd.nextInt(6) + 2)}</p>"
    }

    def doc(): String = {
      val h = rnd.nextInt(6) + 1
      val heading = s"<h$h>${words(3)}</h$h>"
      val body = heading + (1 to rnd.nextInt(6) + 3).map(_ => block(2)).mkString
      s"""<!DOCTYPE html><html><head><title>${words(4)}</title></head>
         |<body><main>$body
         |<p>Deterministic padding paragraph keeping the main content block above
         |the one-hundred-character extraction threshold for all fuzz documents.</p>
         |</main></body></html>""".stripMargin
    }
  }

  /** The fuzz corpus: n docs from seeds 1000..1000+n-1. */
  def corpus(n: Int): Seq[(String, String)] =
    (0 until n).map { i =>
      (s"http://fuzz.example/doc$i", new Gen(1000L + i).doc())
    }

  /** MALFORMED-HTML differential corpus (round 3): documents exercising the
    * HTML5 error-recovery rules a real crawl depends on — unclosed
    * p/li/td/tr, stray close tags, mis-nested inline/block formatting
    * (adoption agency + active-formatting reconstruction), unquoted
    * attributes, bad/legacy entities, heading auto-close, nested anchors,
    * self-closed non-voids, foster-parented table text, CRLF, uppercase
    * tags. Both parsers (ours and the reference's parse5) must build the
    * same tree: the goldens pin extracted text AND markdown byte-for-byte.
    */
  final class MalGen(seed: Long) {
    private val rnd = new scala.util.Random(seed)
    private def pick[A](xs: Vector[A]): A = xs(rnd.nextInt(xs.size))
    private def w(n: Int): String =
      (1 to n).map(_ => if (rnd.nextInt(7) == 0) pick(specials) else pick(words))
        .mkString(" ")

    private def fmtTag(): String = pick(Vector("b", "i", "em", "strong", "code", "u", "s", "small"))

    private def badEntityText(): String = rnd.nextInt(3) match {
      case 0 =>
        // sampled from the real 2231-entity WHATWG table (multi-codepoint
        // values, case-sensitive names, legacy forms included)
        val n1 = pick(FuzzHtml.entityNames)
        val n2 = pick(FuzzHtml.entityNames)
        val n3 = pick(FuzzHtml.entityNames)
        s"${w(1)} &$n1 x &$n2;${w(1)} &${n3}tail"
      case _ => pick(Vector(
        s"fish &amp chips ${w(1)}", s"&copy 2020 ${w(1)}", s"x &lt y &gt z",
        s"${w(1)} &nosuch; ${w(1)}", s"${w(1)} &notit; tail", s"&#65 and &#x42 go",
        s"&#153; curly &#8212 dash", s"100&nbsp200 units", s"q &quotmarks&quot q",
        s"&; alone & bare &# num &#x hex", s"&ampamp; doubled ${w(1)}"))
    }

    private def block(depth: Int): String = rnd.nextInt(18) match {
      case 0 => s"<p>${w(3)} <p>${w(3)}" // unclosed p chain
      case 1 => s"<ul><li>${w(2)}<li>${w(2)}<li><${fmtTag()}>${w(2)}<li>${w(2)}</ul>"
      case 2 => s"<table><tr><td>${w(1)}<td>${w(1)}<tr><td>${w(1)}<td>${w(1)}</table>"
      case 3 => // stray close tags
        s"<p>${w(2)}</${pick(Vector("div", "span", "em", "section"))}> ${w(2)}</p></p>"
      case 4 => s"${w(2)}</br>${w(2)}" // </br> acts as <br>
      case 5 => // formatting element left open across blocks
        val t = fmtTag()
        s"<$t>${w(2)}<p>${w(3)}</p>${w(1)}</$t>"
      case 6 => // adoption agency: mis-nested inline pair
        val (a, b) = (fmtTag(), fmtTag())
        s"<p><$a>${w(1)} <$b>${w(2)}</$a> ${w(2)}</$b> ${w(1)}</p>"
      case 7 => // p interrupted by block while formatting open
        s"<p>${w(1)} <${fmtTag()}>${w(2)} <p>${w(2)}"
      case 8 => // unquoted attrs + UPPERCASE tags
        s"""<P CLASS=big><A HREF=http://x.example/p${rnd.nextInt(40)} TITLE=t${rnd.nextInt(9)}>${w(2)}</a> ${w(2)}</p>"""
      case 9 => s"<p>${badEntityText()}</p>"
      case 10 => s"<h${rnd.nextInt(3) + 1}>${w(2)}<h${rnd.nextInt(3) + 2}>${w(2)}</h6>" // heading auto-close + wrong close
      case 11 => // nested <a>
        s"""<p><a href="http://x.example/${rnd.nextInt(20)}">${w(1)} <a href="http://x.example/n${rnd.nextInt(20)}">${w(1)}</a> ${w(1)}</a></p>"""
      case 12 => s"<div/>${w(3)}<p>${w(2)}</p>" // self-closed non-void stays open
      case 13 => s"<table>${w(2)}<tr><td>${w(1)}</td></tr></table>" // foster-parented text
      case 14 => // list item left open w/ nested list malformation
        s"<ol><li>${w(2)}<ol><li>${w(1)}<li>${w(1)}</ol><li>${w(2)}</ol>"
      case 15 => // select: unclosed options; stray tags ignored inside
        s"""<p>${w(1)} <select name="s${rnd.nextInt(9)}"><option>${w(1)}<option>${w(1)}<div>${w(1)}</div><optgroup label="g"><option>${w(1)}</select> ${w(1)}</p>"""
      case 16 => // inline svg icon (foreign content): self-closing shapes,
        // title/desc text, optional CDATA text island
        val cdata = if (rnd.nextBoolean()) s"<text><![CDATA[${w(1)} > ${w(1)}]]></text>" else ""
        s"""<p>${w(1)} <svg viewBox="0 0 1${rnd.nextInt(9)} 10" class="ic${rnd.nextInt(4)}"><path d="M0 ${rnd.nextInt(9)}L5 5"/><circle cx="1" cy="1" r="${rnd.nextInt(5)}"/><title>${w(2)}</title>$cdata</svg> ${w(2)}</p>"""
      case _ if depth > 0 =>
        s"""<div class="m${rnd.nextInt(4)}">${block(depth - 1)}${block(depth - 1)}</div>"""
      case _ => s"<p>${w(4)}</p>"
    }

    def doc(): String = {
      val nl = if (rnd.nextInt(4) == 0) "\r\n" else "\n"
      val pre = if (rnd.nextInt(5) == 0) s"<pre>\ncode line ${rnd.nextInt(9)}\n  indented</pre>" else ""
      val body = (1 to rnd.nextInt(5) + 3).map(_ => block(2)).mkString(nl) + pre
      (s"<!DOCTYPE html><html><head><title>${w(3)} &amp co</title></head>" + nl +
        s"<body><main>$body" + nl +
        "<p>Deterministic padding paragraph keeping the main content block above" + nl +
        "the one-hundred-character extraction threshold for all fuzz documents.</p>" + nl +
        "</main></body></html>")
    }
  }

  /** All entity names (semicolons stripped) from the WHATWG table shipped
    * as a main resource — the fuzz draws real names so the differential
    * covers the whole reference table, not a hand-picked subset. */
  lazy val entityNames: Vector[String] = {
    val in = getClass.getResourceAsStream("/html_entities.tsv")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    val names = src.getLines().map(_.split("\t")(0).stripSuffix(";")).toVector.distinct
    src.close()
    names
  }

  /** The malformed corpus: n docs from seeds 5000..5000+n-1, plus crafted
    * cases targeting specific tree-construction algorithm steps. */
  def malformedCorpus(n: Int): Seq[(String, String)] =
    (0 until n).map { i =>
      (s"http://malfuzz.example/doc$i", new MalGen(5000L + i).doc())
    } ++ craftedMalformed.zipWithIndex.map { case (b, i) =>
      (s"http://malfuzz.example/crafted$i", malDoc(b))
    }

  private def malDoc(body: String): String =
    s"""<!DOCTYPE html><html><head><title>Crafted Malformed Case Page</title></head>
       |<body><main>$body
       |<p>Padding paragraph so the main content selector's one-hundred-character
       |threshold is comfortably exceeded by every crafted fixture document.</p>
       |</main></body></html>""".stripMargin

  /** Hand-written malformations pinning individual spec algorithm steps:
    * adoption agency inner/outer loops, Noah's Ark, foster parenting of
    * elements, caption/colgroup recovery, button scope, the form pointer,
    * deep wrong-order close stacks. */
  private val craftedMalformed: Seq[String] = Seq(
    // adoption agency with a real furthest block (b wraps a div)
    """<b>bold <div>in div</div> still bold</b> plain after""",
    // adoption outer loop: same formatting tag closed repeatedly
    """<b>one<b>two<b>three</b>four</b>five</b>six""",
    // adoption inner loop >3: many formatting elements between fe and block
    """<p><a href="/x"><b><i><u><s><code>deep<div>block</div>text</a> tail</p>""",
    // Noah's Ark: four identical <b> entries collapse to three
    """<p><b class="x">1<b class="x">2<b class="x">3<b class="x">4</p><p>after paragraph</p>""",
    // foster parenting of ELEMENTS out of a table
    """<table><div>fostered div</div><b>fostered bold</b><tr><td>cell</td></tr></table>""",
    // caption and colgroup recovery
    """<table><caption>cap <p>in cap<tr><td>one</td></table>""",
    """<table><colgroup><col><col><td>cell</td></table>""",
    // button scope: p inside button does not close outer p
    """<p>one <button>two <p>three</button> four</p>""",
    // form pointer: nested form ignored
    """<form action="/a"><p>first</p><form action="/b"><p>second</p></form></form>""",
    // wrong-order close stack across blocks
    """<div><em>e1 <strong>s1</div> outside</strong> more</em> done""",
    // li interrupted by div (address/div/p exception in the li loop)
    """<ul><li>item <div>block in li<li>second</div></li></ul>""",
    // stray </td> </tr> outside tables; td outside table dropped
    """<p>a</td>b</tr>c</p><td>loose cell</td><p>tail</p>""",
    // select with options (no inSelect mode divergence for simple content)
    """<p><select><option>opt one<option>opt two</select> after</p>""",
    // table inside table (spec: new table closes the old)
    """<table><tr><td>outer<table><tr><td>inner</td></tr></table></td></tr></table>""",
    // heading closed by different heading end tag + residue formatting
    """<h2>head <em>emp</h3> text after""",
    // rcdata/raw edges: textarea keeps markup, title entity, xmp verbatim
    """<p>before</p><textarea rows=2><b>not bold</b> &amp; kept</textarea><p>after</p>""",
    """<xmp>raw <b>verbatim</b> *stars*</xmp><p>tail para</p>""",
    // character reference torture in text and attributes
    """<p><a href="/q?a=1&amp=2&ampx=3&not=4&notin;=5" title="&copy 2020 &copyz">q</a></p>
      |<p>&notit; &Notit; &CounterClockwiseContourIntegral; &#x1D49C; &#xD801; &#0; &#151; &ampamp</p>""".stripMargin,
    // nested anchors with formatting spanning the implied close
    """<a href="/1">one <b>two <a href="/2">three</a> four</b> five""",
    // mis-nested blockquote/list with trailing unclosed everything
    """<blockquote><p>q1<ul><li>x<blockquote>q2</p></ul> tail""",
    // in-select rules: ignored tags keep their text, nested select closes,
    // optgroup auto-close, input closes the select and reprocesses
    """<p>pick <select name="s"><option>one<option selected>two</select> end</p>""",
    """<select><div>div in select</div><option>opt</option></select><p>after</p>""",
    """<select><optgroup label="g"><option>a<option>b</optgroup><option>c</select>""",
    """<select><option>a<select><option>b</select><p>tail one</p>""",
    """<p>x <select><option>o1<input name="i"> after-input</p>""",
    """<table><tr><td><select><option>x</select></td></tr></table>""",
    // foreign content (svg/math): self-closing shapes, svg title text,
    // foreignObject html island, CDATA text, </p> breakout, MathML
    """<p>before <svg viewBox="0 0 10 10" class="icon"><path d="M0 0L5 5"/><circle cx="1" cy="1" r="1"/></svg> after</p>""",
    """<p>x <svg><title>icon title</title><desc>description</desc><rect/></svg> y</p>""",
    """<svg><foreignObject><div>html island</div></foreignObject></svg><p>tail text</p>""",
    """<p>a <svg><path d="M0 0"> b</p><p>next para</p>""",
    """<p>E: <math><mi>x</mi><mo>+</mo><mn>1</mn></math> done</p>""",
    """<svg><text><![CDATA[raw > cdata]]></text></svg><p>end cd</p>""",
    """<p>naked <![CDATA[dropped > in html]]> cdata</p>""",
    // CDATA-as-bogus-comment: tags after the first '>' re-enter the
    // tokenizer as real elements (incl. blocks), entities decode
    """<p>a <![CDATA[x>y<i>ital</i> z &amp; w]]> b</p>""",
    """<p>a <![CDATA[x>y<div>block</div> t]]> b</p>""",
    // truncated at EOF: no fabricated "]]>" tail, unclosed tags recover
    """<p>a <![CDATA[x>y<i>unclosed b""",
    """<p>a <![CDATA[never closed no gt""")
}
