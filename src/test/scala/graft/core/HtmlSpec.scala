package graft.core

import org.scalatest.funsuite.AnyFunSuite

class HtmlSpec extends AnyFunSuite {

  test("basic parse + text concatenation") {
    val doc = Html.parse("<html><body><p>Hello <b>world</b>!</p></body></html>")
    assert(doc.body.text() == "Hello world!")
  }

  test("implied html/head/body wrappers") {
    val doc = Html.parse("<p>just a paragraph</p>")
    assert(doc.body.text() == "just a paragraph")
    assert(doc.first("p").isDefined)
  }

  test("entities decoded in text and attributes") {
    val doc = Html.parse("""<p title="a&amp;b">x &lt; y &#65; &#x42;</p>""")
    assert(doc.body.text() == "x < y A B")
    assert(doc.first("p").flatMap(_.attr("title")).contains("a&b"))
  }

  test("script/style bodies are raw text (no tag soup)") {
    val doc = Html.parse("<body><script>if (a<b) {alert('<p>')}</script><p>ok</p></body>")
    assert(doc.select("p").map(_.text()) == Seq("ok"))
    assert(doc.first("script").map(_.text()).contains("if (a<b) {alert('<p>')}"))
  }

  test("void elements do not swallow siblings") {
    val doc = Html.parse("<p>a<br>b<img src=x>c</p>")
    assert(doc.body.text() == "abc")
    assert(doc.select("img").nonEmpty)
  }

  test("selector: tag, id, class, compound") {
    val doc = Html.parse(
      """<div id="main" class="content box"><span class="x">1</span>
        |<span>2</span><p class="x">3</p></div>""".stripMargin)
    assert(doc.select("#main").size == 1)
    assert(doc.select(".content").size == 1)
    assert(doc.select("span.x").map(_.text()) == Seq("1"))
    assert(doc.select(".x").size == 2)
    assert(doc.select("span").size == 2)
  }

  test("selector: attribute operators") {
    val doc = Html.parse(
      """<meta property="og:title" content="T"/>
        |<div class="ad-banner">ad</div>
        |<div class="social-share">s</div>
        |<a rel="author" href="/a">A</a>""".stripMargin)
    assert(doc.first("[property=\"og:title\"]").flatMap(_.attr("content")).contains("T"))
    assert(doc.select("[class*=\"ad-\"]").size == 1)
    assert(doc.select("[class*=\"social\"]").size == 1)
    assert(doc.first("[rel=\"author\"]").map(_.text()).contains("A"))
  }

  test("selector: descendant combinator and groups") {
    val doc = Html.parse(
      "<header><h1>H</h1></header><article><h1>A</h1></article><h1>Top</h1>")
    assert(doc.select("header h1").map(_.text()) == Seq("H"))
    assert(doc.select("article h1").map(_.text()) == Seq("A"))
    assert(doc.select("h1").size == 3)
    assert(doc.select("header h1, article h1").size == 2)
  }

  test("selector: first-child and :not(:first-child)") {
    val doc = Html.parse("<table><tr><td>h</td></tr><tr><td>d1</td></tr><tr><td>d2</td></tr></table>")
    assert(doc.select("tr:first-child").size == 1)
    assert(doc.select("tr:not(:first-child)").size == 2)
  }

  test("document order and duplicate elimination in selects") {
    val doc = Html.parse("<div class='a b'><p>1</p></div><div class='a'><p>2</p></div>")
    val sel = doc.select(".a, .b, div")
    assert(sel.size == 2)
    assert(sel.map(_.attr("class").get) == Seq("a b", "a"))
  }

  test("remove() hides from text and selects") {
    val doc = Html.parse("<div><span class='ads'>buy</span><p>keep</p></div>")
    doc.select(".ads").foreach(_.remove())
    assert(doc.body.text() == "keep")
    assert(doc.select("span").isEmpty)
  }

  test("replaceWithText substitutes the node") {
    val doc = Html.parse("<p>go <a href='/x'>here</a> now</p>")
    doc.select("a").foreach(a => a.replaceWithText(a.text()))
    assert(doc.body.text() == "go here now")
    assert(doc.select("a").isEmpty)
  }

  test("p auto-close keeps siblings flat") {
    val doc = Html.parse("<p>one<p>two<div>three</div>")
    assert(doc.select("p").map(_.text()) == Seq("one", "two"))
  }

  test("li auto-close") {
    val doc = Html.parse("<ul><li>a<li>b<li>c</ul>")
    assert(doc.select("li").map(_.text()) == Seq("a", "b", "c"))
  }

  test("unclosed tags at EOF don't crash") {
    val doc = Html.parse("<div><p>dangling")
    assert(doc.body.text() == "dangling")
  }

  test("comments are ignored in text") {
    val doc = Html.parse("<p>a<!-- hidden -->b</p>")
    assert(doc.body.text() == "ab")
  }

  test("adversarial 100k-deep nesting cannot stack-overflow extraction") {
    // open-elements depth is capped at 512: tree depth stays bounded, so
    // the recursive text()/descendants/markdown walks survive pages a
    // crawl at scale WILL eventually hit (the reference would crash)
    val deep = "<div>" * 100000 + "payload text" + "</div>" * 100000
    val doc = Html.parse(deep)
    assert(doc.body.text().contains("payload text"))
    val e = Extract.extract(deep, "http://deep.example/", 0L,
      Extract.Options(format = "markdown"))
    assert(e.content.nonEmpty)
  }
}
