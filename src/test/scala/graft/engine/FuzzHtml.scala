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
}
