package graft.tools

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Html

class StructuredDataSpec extends AnyFunSuite {

  test("JSON-LD parsed, nested @type harvested recursively (server.ts:2058-2081)") {
    val doc = Html.parse(
      """<head><script type="application/ld+json">
        |{"@context":"https://schema.org","@type":"Article",
        | "author":{"@type":"Person","name":"A"},
        | "publisher":{"@type":["Organization","NewsMediaOrganization"]}}
        |</script></head><body/>""".stripMargin)
    val sd = StructuredData.extract(doc)
    assert(sd.jsonLdCount == 1)
    assert(sd.schemaTypes.toSet ==
      Set("Article", "Person", "Organization", "NewsMediaOrganization"))
  }

  test("JSON-LD array form and malformed JSON skipped (server.ts:2054, 2087)") {
    val doc = Html.parse(
      """<head><script type="application/ld+json">[{"@type":"FAQPage"},{"@type":"Question"}]</script>
        |<script type="application/ld+json">{not json</script></head><body/>""".stripMargin)
    val sd = StructuredData.extract(doc)
    assert(sd.jsonLdCount == 2)
    assert(sd.schemaTypes.toSet == Set("FAQPage", "Question"))
  }

  test("OpenGraph prefixes + twitter meta counted (server.ts:2101-2122)") {
    val doc = Html.parse(
      """<head><meta property="og:title" content="T"/>
        |<meta property="article:author" content="A"/>
        |<meta property="unrelated:x" content="no"/>
        |<meta name="twitter:card" content="summary"/></head><body/>""".stripMargin)
    val sd = StructuredData.extract(doc)
    assert(sd.ogCount == 2)
    assert(sd.twitterCount == 1)
  }

  test("microdata items with per-tag value rules (server.ts:2165-2180)") {
    val doc = Html.parse(
      """<div itemscope itemtype="https://schema.org/Person">
        |<meta itemprop="name" content="Meta Name"/>
        |<img itemprop="image" src="/i.png"/>
        |<a itemprop="url" href="/p">link</a>
        |<time itemprop="birthDate" datetime="2000-01-01">Jan 1</time>
        |<span itemprop="jobTitle">Engineer</span></div>""".stripMargin)
    val sd = StructuredData.extract(doc)
    assert(sd.microdataCount == 1)
    assert(sd.schemaTypes.contains("Person"))
  }

  test("score = min(100, items*10 + types*5) (server.ts:2271)") {
    val doc = Html.parse(
      """<head><script type="application/ld+json">{"@type":"Thing"}</script></head><body/>""")
    val sd = StructuredData.extract(doc)
    assert(sd.score == sd.totalItems * 10 + sd.schemaTypes.size * 5)
  }

  test("social platform patterns + username capture (server.ts:2714-2721)") {
    val doc = Html.parse(
      """<body><a href="https://twitter.com/someuser">t</a>
        |<a href="https://x.com/other_user">x</a>
        |<a href="https://www.youtube.com/@channelname">y</a>
        |<a href="https://linkedin.com/company/acme-co">l</a>
        |<a href="https://tiktok.com/@tik.user">k</a>
        |<a href="https://twitter.com/someuser">dup</a></body>""".stripMargin)
    val links = StructuredData.extractSocial(doc)
    val byPlatform = links.groupBy(_.platform)
    assert(byPlatform("twitter").map(_.username).toSet == Set("someuser", "other_user"))
    assert(byPlatform("youtube").head.username == "channelname")
    assert(byPlatform("linkedin").head.username == "acme-co")
    assert(byPlatform("tiktok").head.username == "tik.user")
    // dedupe by lowercase url keeps first
    assert(links.count(_.url == "https://twitter.com/someuser") == 1)
  }

  test("feed discovery: declared link + common paths (server.ts:3191-3210)") {
    val doc = Html.parse(
      """<head><link rel="alternate" type="application/rss+xml" href="/custom.rss"/></head><body/>""")
    val urls = StructuredData.discoverFeedUrls(doc, "http://h.example/page")
    assert(urls.head == "http://h.example/custom.rss")
    assert(urls.contains("http://h.example/rss"))
    assert(urls.contains("http://h.example/atom.xml"))
  }

  test("RSS feed parse: channel, items, pubDate (server.ts:3216-3248)") {
    val xml = graft.engine.SyntheticWeb.feedXml(3)
    val f = StructuredData.parseFeed("http://host3.example/rss", xml)
    assert(f.feedType == "RSS")
    assert(f.title == "host3 feed")
    assert(f.description.contains("host3.example"))
    assert(f.items.size == 3)
    assert(f.items.head.title == "Feed item 0 of host3")
    assert(f.items.head.link == "http://host3.example/p/0")
    assert(f.items.head.pubDate.contains("Jan 2024"))
  }

  test("parseXml: no void-element rules (link/meta nest content)") {
    val root = Html.parseXml("<channel><link>http://x/</link><title>T</title></channel>")
    val link = root.descendants.find(_.tag == "link").get
    assert(link.text() == "http://x/")
  }
}
