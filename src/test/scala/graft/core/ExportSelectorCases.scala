package graft.core

/** Exports the selector vocabulary for the css-select differential: every
  * selector family the library's extraction/tool paths rely on (see
  * Extract/PageTools/StructuredData), exercised by
  * scripts/gen_selector_goldens.mjs over the fixture corpus that
  * ExportFixtures already wrote (run ExportFixtures FIRST). The golden
  * signature per (doc, selector) is the matched elements' document-order
  * ordinals + tags — a full tree-shape + selector-semantics parity check
  * against cheerio's css-select, now including the malformed docs whose
  * trees exercise adoption-agency/foster-parenting recovery.
  */
object ExportSelectorCases {

  /** Fixed order — the golden joins signatures per doc in this order. */
  val selectors: Seq[String] = Seq(
    // tag + comma groups
    "h1", "title", "main", "article", "table", "form", "img", "a",
    "p, div", "div, section, article", "th, td",
    "script, style, nav, header, footer, aside",
    // id / class
    "#content", "#main-content", ".title", ".headline", ".content",
    ".author", ".byline", ".ads", ".social-share",
    // attribute operators
    "[itemscope]", "a[href]", "img[src]", "meta[property]",
    "[property=\"og:title\"]", "[name=\"author\"]", "[rel=\"author\"]",
    "[role=\"main\"]", "[itemprop=\"author\"]",
    "a[href^=\"http\"]", "a[href^=\"mailto:\"]", "link[rel=\"stylesheet\"]",
    "[class*=\"ad-\"]", "[id*=\"ad-\"]", "[class*=\"social\"]",
    "[class*=\"share\"]", "script[src*=\"analytics\"]",
    "img[src], script[src], link[href]",
    // descendant / child combinators + structural pseudos
    "header h1", "article h1", "thead tr, tr:first-child",
    "tbody tr, tr:not(:first-child)", "ul li", "ol > li", "li:first-child",
    "table tr td", "blockquote p", "div code", "em strong",
    "p:not(:first-child)", "main > p", "div > span")

  def main(args: Array[String]): Unit = {
    val outDir = java.nio.file.Paths.get(
      if (args.nonEmpty) args(0) else "/tmp/graft_fixtures")
    java.nio.file.Files.createDirectories(outDir)
    val b64 = java.util.Base64.getEncoder
    val body = selectors.map(s => b64.encodeToString(s.getBytes("UTF-8"))).mkString("\n")
    java.nio.file.Files.writeString(outDir.resolve("selectors.tsv"), body + "\n")
    println(s"${selectors.size} selectors -> $outDir/selectors.tsv")
  }
}
