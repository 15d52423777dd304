package graft.core

import org.scalatest.funsuite.AnyFunSuite

class MarkdownSpec extends AnyFunSuite {

  private def md(html: String): String =
    Markdown.render(Html.parse(s"<body>$html</body>").body)

  test("paragraphs separated by blank line") {
    assert(md("<p>one</p><p>two</p>") == "one\n\ntwo")
  }

  test("atx headings (extract.ts:24 headingStyle)") {
    assert(md("<h1>A</h1><h2>B</h2><h6>C</h6>") == "# A\n\n## B\n\n###### C")
  }

  test("bullet list with - marker (extract.ts:26)") {
    assert(md("<ul><li>a</li><li>b</li></ul>") == "-   a\n-   b")
  }

  test("ordered list with start attribute") {
    assert(md("<ol start='3'><li>x</li><li>y</li></ol>") == "3.  x\n4.  y")
  }

  test("nested list indents 4 spaces") {
    val out = md("<ul><li>a<ul><li>b</li></ul></li></ul>")
    assert(out == "-   a\n    -   b")
  }

  test("em and strong delimiters (extract.ts:27-28)") {
    assert(md("<p>a <em>e</em> and <strong>s</strong></p>") == "a *e* and **s**")
  }

  test("inline code with backtick widening") {
    assert(md("<p>run <code>x=1</code></p>") == "run `x=1`")
    assert(md("<p><code>a`b</code></p>") == "``a`b``")
  }

  test("fenced code block with language (extract.ts:37-47 custom rule)") {
    val out = md("<pre><code class=\"language-scala\">val x = 1\nval y = 2</code></pre>")
    assert(out == "```scala\nval x = 1\nval y = 2\n```")
  }

  test("fenced code block without language") {
    assert(md("<pre><code>plain()</code></pre>") == "```\nplain()\n```")
  }

  test("script/style/noscript dropped (extract.ts:32-35 custom rule)") {
    assert(md("<p>keep</p><script>drop()</script><noscript>n</noscript>") == "keep")
  }

  test("links with href and title; parens escaped") {
    assert(md("<p><a href=\"/x\">go</a></p>") == "[go](/x)")
    assert(md("<p><a href=\"/x\" title=\"t\">go</a></p>") == "[go](/x \"t\")")
    assert(md("<p><a href=\"/x(1)\">go</a></p>") == "[go](/x\\(1\\))")
  }

  test("images with alt and title") {
    assert(md("<p><img src=\"/i.png\" alt=\"pic\"/></p>") == "![pic](/i.png)")
    assert(md("<p><img src=\"/i.png\" alt=\"p\" title=\"t\"/></p>") == "![p](/i.png \"t\")")
  }

  test("blockquote prefixes lines") {
    assert(md("<blockquote><p>q1</p><p>q2</p></blockquote>") == "> q1\n> \n> q2")
  }

  test("br is two-space newline; hr is * * *") {
    assert(md("<p>a<br/>b</p>") == "a  \nb")
    assert(md("<p>a</p><hr/><p>b</p>") == "a\n\n* * *\n\nb")
  }

  test("whitespace collapsed in prose, preserved in pre") {
    assert(md("<p>a\n   b\t\tc</p>") == "a b c")
    assert(md("<pre><code>a\n   b</code></pre>") == "```\na\n   b\n```")
  }

  test("markdown special chars escaped in text") {
    assert(md("<p>2 * 3 = 6</p>") == "2 \\* 3 = 6")
    assert(md("<p>a_b</p>") == "a\\_b")
    assert(md("<p>[not a link]</p>") == "\\[not a link\\]")
    assert(md("<p>1. not a list</p>") == "1\\. not a list")
  }

  test("blank inline elements vanish") {
    assert(md("<p>a <em></em> b</p>") == "a b")
  }

  test("deeply mixed document is stable") {
    val html =
      """<h1>Title</h1><p>Intro <strong>bold</strong> text.</p>
        |<ul><li>first</li><li>second <em>em</em></li></ul>
        |<blockquote>quoted</blockquote>
        |<pre><code class="language-js">f();</code></pre>""".stripMargin
    val out1 = md(html)
    val out2 = md(html)
    assert(out1 == out2)
    assert(out1.startsWith("# Title"))
    assert(out1.contains("-   first"))
    assert(out1.contains("> quoted"))
    assert(out1.contains("```js\nf();\n```"))
  }
}
