package graft.core

import org.scalatest.funsuite.AnyFunSuite

class RobotsSpec extends AnyFunSuite {

  private val UA = "mcp-web-scrape/1.0"

  test("empty robots (404/error path) allows everything (robots.ts:51-72)") {
    val r = Robots.parse("")
    assert(Robots.isAllowed(r, "http://a.com/anything", UA))
  }

  test("blanket disallow blocks all paths") {
    val r = Robots.parse("User-agent: *\nDisallow: /")
    assert(!Robots.isAllowed(r, "http://a.com/", UA))
    assert(!Robots.isAllowed(r, "http://a.com/x/y", UA))
  }

  test("path-prefix disallow blocks subtree only") {
    val r = Robots.parse("User-agent: *\nDisallow: /private/")
    assert(!Robots.isAllowed(r, "http://a.com/private/x", UA))
    assert(Robots.isAllowed(r, "http://a.com/public/x", UA))
    assert(Robots.isAllowed(r, "http://a.com/", UA))
  }

  test("allow longest-match beats shorter disallow") {
    val r = Robots.parse(
      "User-agent: *\nDisallow: /private/\nAllow: /private/open/")
    assert(Robots.isAllowed(r, "http://a.com/private/open/x", UA))
    assert(!Robots.isAllowed(r, "http://a.com/private/closed", UA))
  }

  test("allow wins exact-length ties") {
    val r = Robots.parse("User-agent: *\nDisallow: /a/\nAllow: /a/")
    assert(Robots.isAllowed(r, "http://a.com/a/x", UA))
  }

  test("wildcard * and end-anchor $") {
    val r = Robots.parse("User-agent: *\nDisallow: /*.pdf$\nDisallow: /tmp*")
    assert(!Robots.isAllowed(r, "http://a.com/docs/file.pdf", UA))
    assert(Robots.isAllowed(r, "http://a.com/docs/file.pdfx", UA))
    assert(!Robots.isAllowed(r, "http://a.com/tmp/x", UA))
    assert(!Robots.isAllowed(r, "http://a.com/tmpfoo", UA))
  }

  test("UA-specific group preferred over *") {
    val r = Robots.parse(
      """User-agent: mcp-web-scrape
        |Disallow: /only-for-us/
        |
        |User-agent: *
        |Disallow: /
        |""".stripMargin)
    assert(Robots.isAllowed(r, "http://a.com/anything", UA)) // our group allows
    assert(!Robots.isAllowed(r, "http://a.com/only-for-us/x", UA))
    assert(!Robots.isAllowed(r, "http://a.com/anything", "otherbot"))
  }

  test("multiple user-agent lines share one group") {
    val r = Robots.parse(
      "User-agent: a\nUser-agent: b\nDisallow: /x/")
    assert(!Robots.isAllowed(r, "http://h.com/x/1", "a-bot"))
    assert(!Robots.isAllowed(r, "http://h.com/x/1", "b-bot"))
  }

  test("comments and empty disallow") {
    val r = Robots.parse(
      "# header comment\nUser-agent: * # inline\nDisallow: # empty = allow all")
    assert(Robots.isAllowed(r, "http://a.com/x", UA))
  }

  test("query string participates in matching") {
    val r = Robots.parse("User-agent: *\nDisallow: /*?session=")
    assert(!Robots.isAllowed(r, "http://a.com/p?session=1", UA))
    assert(Robots.isAllowed(r, "http://a.com/p?other=1", UA))
  }

  test("crawl-delay parsed") {
    val r = Robots.parse("User-agent: *\nCrawl-delay: 2.5\nDisallow: /x")
    assert(r.groups.head.crawlDelay.contains(2.5))
  }
}
