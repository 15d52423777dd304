package graft.engine

/** Dumps the synthetic-web fixture HTML to /tmp/graft_fixtures so the
  * REFERENCE extractor (node + /root/reference/dist/extract.js, i.e. the
  * actual cheerio+turndown pipeline) can be run over the same corpus to
  * produce reference-true goldens. See scripts/gen_reference_goldens.mjs.
  */
object ExportFixtures {
  def main(args: Array[String]): Unit = {
    val outDir = java.nio.file.Paths.get(
      if (args.nonEmpty) args(0) else "/tmp/graft_fixtures")
    java.nio.file.Files.createDirectories(outDir)
    val web = SyntheticWeb.Config(nHosts = 8, pagesPerHost = 32, megaFactor = 4)
    val manifest = new StringBuilder
    var n = 0
    for (h <- 0 until 8; p <- 0 until 8) {
      val u = SyntheticWeb.pageUrl(h, p)
      val fr = SyntheticWeb.fetch(web, u)
      if (fr.status == 200 && fr.contentType.contains("text/html") && fr.html.nonEmpty) {
        val name = s"page_${h}_$p.html"
        java.nio.file.Files.writeString(outDir.resolve(name), fr.html)
        manifest.append(s"$name\t$u\n")
        n += 1
      }
    }
    // crafted fixtures: Turndown rule coverage beyond what the synthetic
    // web exercises — escaping table, fence/backtick widening, nested and
    // ordered lists, blockquotes, links needing ()-escapes, images, hr,
    // em/strong nesting, pre>code language classes
    for ((html, i) <- CraftedFixtures.all.zipWithIndex) {
      val name = s"crafted_$i.html"
      java.nio.file.Files.writeString(outDir.resolve(name), html)
      manifest.append(s"$name\thttp://crafted.example/doc$i\n")
      n += 1
    }
    // differential-fuzz corpus: 120 random well-formed documents — the
    // byte-identity claim must hold beyond hand-picked cases
    for ((url, html) <- FuzzHtml.corpus(120)) {
      val name = url.stripPrefix("http://fuzz.example/") + ".html"
      java.nio.file.Files.writeString(outDir.resolve(name), html)
      manifest.append(s"$name\t$url\n")
      n += 1
    }
    // malformed-HTML corpus (round 3): error-recovery differential — real
    // crawl HTML is mostly malformed, so the byte-identity claim must hold
    // through parse5's tree-construction recovery rules too
    for ((url, html) <- FuzzHtml.malformedCorpus(160)) {
      val name = "mal_" + url.stripPrefix("http://malfuzz.example/") + ".html"
      java.nio.file.Files.writeString(outDir.resolve(name), html)
      manifest.append(s"$name\t$url\n")
      n += 1
    }
    java.nio.file.Files.writeString(outDir.resolve("manifest.tsv"), manifest.toString)
    println(s"$n fixtures -> $outDir")
  }
}

/** Turndown-rule-coverage HTML, shared by the golden generator and (via the
  * manifest) ReferenceGoldenSpec. Each doc wraps content in <main> so the
  * reference's main-content gate (>100 chars) selects it deterministically. */
object CraftedFixtures {
  private def doc(body: String): String =
    s"""<!DOCTYPE html><html><head><title>Crafted Fixture Page For Rules</title></head>
       |<body><main>$body
       |<p>Padding paragraph so the main content selector's one-hundred-character
       |threshold is comfortably exceeded by every crafted fixture document.</p>
       |</main></body></html>""".stripMargin

  val all: Seq[String] = Seq(
    // headings + paragraphs + hr
    doc("""<h1>Top</h1><h2>Sub heading</h2><h3>Deeper</h3><p>Plain text para.</p><hr><p>After rule.</p>"""),
    // unordered + nested + ordered lists
    doc("""<ul><li>alpha</li><li>beta<ul><li>nested one</li><li>nested two</li></ul></li></ul>
          |<ol><li>first</li><li>second<ol><li>inner</li></ol></li><li>third</li></ol>""".stripMargin),
    // em/strong/nesting + code spans incl. backtick widening
    doc("""<p>Some <em>emphasis</em> and <strong>bold</strong> and <em><strong>both</strong></em>.</p>
          |<p>Inline <code>code span</code> and <code>span `with` backticks</code>.</p>""".stripMargin),
    // pre>code with language class + plain pre
    doc("""<pre><code class="language-scala">val x = 1
          |def f(y: Int) = y * 2</code></pre>
          |<pre>plain preformatted
          |  with indentation</pre>""".stripMargin),
    // links: plain, with title, with parens in href; images with alt/title
    doc("""<p><a href="http://a.example/x">link text</a> and
          |<a href="http://a.example/p(1)">parens link</a> and
          |<a href="http://a.example/y" title="the title">titled</a>.</p>
          |<p><img src="http://a.example/i.png" alt="alt text"> and
          |<img src="http://a.example/j.png" alt="with title" title="img title">.</p>""".stripMargin),
    // blockquote incl. nested + multiple paragraphs
    doc("""<blockquote><p>quoted one</p><p>quoted two</p><blockquote><p>deep quote</p></blockquote></blockquote>"""),
    // markdown-escape table: *, _, #, [, ], `, > at line starts and inline
    doc("""<p>star * and under_score and #hash and [bracket] and back`tick`.</p>
          |<p>1. not a list and - not a bullet and + not either.</p>
          |<p>&gt; not a quote. Literal 2 * 3 = 6 and snake_case_name.</p>""".stripMargin),
    // whitespace collapse + <br> + &nbsp; and entities
    doc("""<p>spaced     out
          |   across lines</p><p>line<br>break</p>
          |<p>&amp; &lt; &gt; &quot; &#39; &nbsp; entities</p>""".stripMargin),
    // tables (turndown default: no gfm plugin — emits inner text semantics)
    doc("""<table><thead><tr><th>H1</th><th>H2</th></tr></thead>
          |<tbody><tr><td>a</td><td>b</td></tr><tr><td>c</td><td>d</td></tr></tbody></table>""".stripMargin),
    // divs/spans pass-through + empty elements dropped by cleanContent
    doc("""<div><span>span text</span> in a div.</div><p></p><div></div><p>tail para.</p>"""),
    // inline edge cases: img-only emphasis, empty href, spaced/backticked
    // code spans, strong containing a link
    doc("""<p><em><img src="http://x.example/i.png" alt="only img"></em> tail text.</p>
          |<p><a href="">empty href anchor</a> and <a href="/x"></a> empty-text link.</p>
          |<p><code>back`tick</code> and <code> spaced ends </code> and <strong><a href="/y">bold link</a></strong>.</p>""".stripMargin),
    // multi-paragraph list items + ordered start attribute + nested blocks
    doc("""<ol start="5"><li><p>first para</p><p>second para</p></li><li>short item</li></ol>
          |<ul><li>item with<blockquote><p>a quote inside</p></blockquote></li></ul>""".stripMargin),
    // figure/figcaption + dl (default-rule block coverage) + headings with
    // inline markup
    doc("""<figure><img src="http://x.example/f.png" alt="fig"><figcaption>the caption</figcaption></figure>
          |<dl><dt>term</dt><dd>definition text</dd></dl>
          |<h2>head <code>c()</code> and <a href="/x">a link</a></h2>""".stripMargin)
  )
}
