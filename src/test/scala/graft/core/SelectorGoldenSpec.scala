package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.SyntheticWeb

/** REFERENCE-TRUE selector differential: golden_selectors.tsv is generated
  * by running cheerio's css-select (the engine the reference queries with)
  * over the full fixture corpus — synthetic pages, crafted Turndown docs,
  * the well-formed fuzz corpus, AND the malformed corpus whose trees come
  * out of parse5's error recovery. Each signature is the matched elements'
  * document-order ordinals + tags, so a pass verifies both that our tree
  * builder produced the same tree SHAPE and that [[Selector]] matches the
  * same nodes in the same order. Regenerate with ExportFixtures +
  * ExportSelectorCases + scripts/gen_selector_goldens.mjs.
  */
class SelectorGoldenSpec extends AnyFunSuite {

  private val web = SyntheticWeb.Config(nHosts = 8, pagesPerHost = 32, megaFactor = 4)

  private lazy val fuzzHtml: Map[String, String] =
    graft.engine.FuzzHtml.corpus(120).toMap
  private lazy val malHtml: Map[String, String] =
    graft.engine.FuzzHtml.malformedCorpus(160).toMap

  private def htmlFor(url: String): String =
    if (url.startsWith("http://crafted.example/doc"))
      graft.engine.CraftedFixtures.all(url.stripPrefix("http://crafted.example/doc").toInt)
    else if (url.startsWith("http://fuzz.example/")) fuzzHtml(url)
    else if (url.startsWith("http://malfuzz.example/")) malHtml(url)
    else SyntheticWeb.fetch(web, url).html

  test("css-select differential: same matches, same document order, all fixtures") {
    val in = getClass.getResourceAsStream("/golden_selectors.tsv")
    assume(in != null, "golden_selectors.tsv not generated yet")
    val lines = scala.io.Source.fromInputStream(in, "UTF-8").getLines().toSeq
    val selectors = ExportSelectorCases.selectors
    var checked = 0
    lines.foreach { line =>
      val Array(url, joined) = line.split("\t", -1)
      val expected = joined.split("\\|", -1)
      assert(expected.length == selectors.length, s"$url: golden arity")
      val doc = Html.parse(htmlFor(url))
      val all: IndexedSeq[Html.Element] =
        (doc.root +: doc.root.descendants.toSeq).toIndexedSeq
      val ord = new java.util.IdentityHashMap[Html.Element, Integer]()
      all.zipWithIndex.foreach { case (e, i) => ord.put(e, i) }
      selectors.zip(expected).foreach { case (sel, exp) =>
        if (exp != "!ERR") {
          val got = Selector.select(doc.root, sel)
            .map(e => s"${ord.get(e)}/${e.tag}").mkString(",")
          assert(got == exp, s"$url  [$sel]\n  ref:  $exp\n  ours: $got")
          checked += 1
        }
      }
    }
    info(s"$checked (doc, selector) cases byte-identical to css-select")
    assert(checked > 10000)
  }
}
