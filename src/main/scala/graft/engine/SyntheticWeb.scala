package graft.engine

import graft.core.UrlNorm

/** A deterministic synthetic web (FIXTURES.md §1, §3, §4): the whole "web"
  * is a pure function of the URL, so the scalar BFS oracle and the
  * distributed engine fetch byte-identical content with no shared state and
  * no network. Seeded by xxh64 — no RNG at test time.
  *
  * Shapes covered (all driven by the url hash):
  *  - one mega-host (host0 has `megaFactor`× the pages) to exercise skew;
  *  - ~6% non-200 statuses, ~3% non-HTML content-type, ~1% oversized —
  *    the reject paths of /root/reference/src/fetch.ts:203-242;
  *  - robots.txt variants per host (FIXTURES.md §3);
  *  - links in controlled document order incl. relative forms, duplicates,
  *    cross-host edges, fragments and mailto (dropped by resolution).
  */
object SyntheticWeb {

  final case class Config(
      nHosts: Int = 8,
      pagesPerHost: Int = 32,
      megaFactor: Int = 4,
      linksPerPage: Int = 6,
      userAgent: String = "mcp-web-scrape/1.0")

  final case class FetchResult(
      url: String,
      status: Int,
      contentType: String,
      sizeBytes: Long,
      etag: String,
      html: String)

  def hostName(h: Int): String = s"host$h.example"

  def pageUrl(h: Int, p: Int): String = s"http://${hostName(h)}/p/$p"

  def pageCount(cfg: Config, h: Int): Int =
    if (h == 0) cfg.pagesPerHost * cfg.megaFactor else cfg.pagesPerHost

  private def h64(s: String): Long = UrlNorm.urlHash(s)

  private val UrlRe = "http://host(\\d+)\\.example/p/(\\d+)".r

  /** Parse a synthetic URL back to (host, page) if it is one of ours. */
  def parseUrl(url: String): Option[(Int, Int)] = url match {
    case UrlRe(h, p) => Some((h.toInt, p.toInt))
    case _ => None
  }

  /** robots.txt per host — 5 variants (FIXTURES.md §3). */
  def robotsTxt(h: Int): String = h % 5 match {
    case 0 => "" // 404 ⇒ allow all
    case 1 => "User-agent: *\nDisallow: /private/\n"
    case 2 => s"User-agent: *\nDisallow: /p/7\nDisallow: /p/13\n" // block a few pages
    case 3 => "User-agent: mcp-web-scrape\nAllow: /\n\nUser-agent: *\nDisallow: /\n"
    case _ => "User-agent: *\nAllow: /\n"
  }

  /** Deterministic RSS feed served at /rss per host (extract_feeds
    * fixtures, server.ts:3165-3266). */
  def feedXml(host: Int): String = {
    val items = (0 until 3).map { i =>
      s"""<item><title>Feed item $i of host$host</title>
         |<link>http://${hostName(host)}/p/$i</link>
         |<description>Summary $i for ${hostName(host)}</description>
         |<pubDate>Mon, 0${i + 1} Jan 2024 00:00:00 GMT</pubDate></item>""".stripMargin
    }.mkString("\n")
    s"""<?xml version="1.0"?>
       |<rss version="2.0"><channel>
       |<title>host$host feed</title>
       |<description>Updates from ${hostName(host)}</description>
       |<link>http://${hostName(host)}/</link>
       |$items
       |</channel></rss>""".stripMargin
  }

  private val FeedRe = "http://host(\\d+)\\.example/rss".r

  /** Deterministic fetch: status/content-type/size derived from url hash.
    * URLs outside the synthetic universe (e.g. dangling relative links)
    * return 404 — the error-row path of server.ts:3583-3590. */
  def fetch(cfg: Config, url: String): FetchResult = {
    url match {
      case FeedRe(h) =>
        val body = feedXml(h.toInt)
        return FetchResult(url, 200, "application/rss+xml",
          body.getBytes("UTF-8").length.toLong, "", body)
      case _ =>
    }
    if (parseUrl(url).isEmpty)
      return FetchResult(url, 404, "text/html", 0L, "", "")
    val h = h64(url)
    val mod = java.lang.Math.floorMod(h, 100L).toInt
    val status =
      if (mod < 90) 200
      else if (mod < 94) 404
      else if (mod < 96) 500
      else 200
    val contentType =
      if (mod >= 96 && mod < 99) "application/pdf" // non-HTML reject
      else "text/html; charset=utf-8"
    val body = if (status == 200 && contentType.startsWith("text/html")) html(cfg, url) else ""
    val size =
      if (mod == 99) 6L * 1024 * 1024 // oversized reject (> 5 MB cap)
      else body.getBytes("UTF-8").length.toLong
    FetchResult(url, status, contentType, size, f"$h%016x", body)
  }

  /** Links of a page in document order — mix of same-host (BFS fuel),
    * cross-host, relative, duplicate, fragment and mailto forms. */
  def rawLinks(cfg: Config, host: Int, page: Int): Seq[String] = {
    val n = pageCount(cfg, host)
    val base = h64(s"links:$host:$page")
    (0 until cfg.linksPerPage).flatMap { i =>
      val r = java.lang.Math.floorMod(base + i * 2654435761L, 1000L).toInt
      val target = java.lang.Math.floorMod(base + i * 40503L, n.toLong).toInt
      r % 10 match {
        case 0 | 1 | 2 | 3 => Seq(s"/p/$target") // same-host absolute path
        case 4 => Seq(s"./$target") // relative, resolves to /p/<target>
        case 5 => Seq(s"../p/$target") // relative with dot-segment
        case 6 =>
          val oh = java.lang.Math.floorMod(base + i, cfg.nHosts.toLong).toInt
          Seq(s"http://${hostName(oh)}/p/${target % cfg.pagesPerHost}") // cross-host
        case 7 => Seq(s"/p/$target#section-$i") // fragment (same page identity)
        case 8 => Seq(s"/p/$target", s"/p/$target") // duplicate edge
        case _ => Seq("mailto:editor@example.com") // dropped by resolution
      }
    }
  }

  private val Authors = Seq("Ada Writer", "Bo Author", "Cy Penner", "")
  private val Topics = Seq(
    "distributed systems and the great shuffle that sorts the web",
    "a careful treatise on politeness budgets for honest crawlers",
    "deterministic parsing of tag soup considered delightful",
    "frontier scheduling with bloom filters and exact confirmation")

  /** Deterministic page HTML exercising the extraction cascades
    * (FIXTURES.md §1). Template selected by url hash. */
  def html(cfg: Config, url: String): String = {
    val Some((host, page)) = parseUrl(url): @unchecked
    val h = h64(s"tpl:$url")
    val tpl = java.lang.Math.floorMod(h, 4L).toInt
    val topic = Topics(java.lang.Math.floorMod(h >> 8, Topics.length.toLong).toInt)
    val author = Authors(java.lang.Math.floorMod(h >> 16, Authors.length.toLong).toInt)
    val para1 = s"Page $page of ${hostName(host)} discusses $topic. " * 3
    val para2 = s"Further notes on $topic appear in part ${page % 7}. " * 2
    val anchors = rawLinks(cfg, host, page).zipWithIndex.map { case (href, i) =>
      s"""<a href="$href">link $i</a>"""
    }.mkString("\n")

    val titleBlock = tpl match {
      case 0 => s"<h1>Doc $host-$page</h1>"
      case 1 => s"<title>Titled $host-$page</title>"
      case 2 => s"""<meta property="og:title" content="OG $host-$page"/>"""
      case _ => "" // → Untitled
    }
    val authorBlock =
      if (author.isEmpty) ""
      else tpl match {
        case 0 => s"""<a rel="author">$author</a>"""
        case 1 => s"""<meta name="author" content="$author"/>"""
        case _ => s"""<span class="byline">$author</span>"""
      }
    val mainOpen = tpl match {
      case 0 => """<main>"""
      case 1 => """<article>"""
      case 2 => """<div class="post-content">"""
      case _ => """<div id="content">"""
    }
    val mainClose = tpl match {
      case 0 => "</main>"
      case 1 => "</article>"
      case _ => "</div>"
    }
    // feature-tool material (FIXTURES.md §1): tables, forms, contacts,
    // social links, JSON-LD, images, meta tags — present on a hash-selected
    // subset so the tool queries have non-vacuous inputs
    val tableBlock =
      if (java.lang.Math.floorMod(h >> 24, 3L) == 0L)
        s"""<table><thead><tr><th>metric</th><th>value</th></tr></thead>
           |<tbody><tr><td>depth</td><td>${page % 5}</td></tr>
           |<tr><td>links</td><td>${cfg.linksPerPage}</td></tr></tbody></table>""".stripMargin
      else ""
    val formBlock =
      if (java.lang.Math.floorMod(h >> 28, 4L) == 0L)
        s"""<form action="/search" method="get" id="f$page">
           |<label for="q$page">query</label>
           |<input type="text" name="q" id="q$page" placeholder="search"/>
           |<input type="hidden" name="site" value="h$host"/>
           |<select name="scope"><option value="all">all pages</option>
           |<option value="host" selected>this host</option></select>
           |<input type="submit" value="go"/></form>""".stripMargin
      else ""
    val contactBlock =
      if (java.lang.Math.floorMod(h >> 32, 4L) == 0L)
        s"""<div class="contact-address">Office: 12${page % 90} Example Street, Crawl City</div>
           |<a href="mailto:editor$host@example.com">mail us</a>
           |<a href="tel:+1-555-01${(page % 90) + 10}">call +1 (555) 010-2${(page % 80) + 10}</a>""".stripMargin
      else ""
    val socialBlock =
      if (java.lang.Math.floorMod(h >> 36, 4L) == 1L)
        s"""<a href="https://twitter.com/host$host">@host$host</a>
           |<a href="https://www.youtube.com/@host${host}channel">videos</a>""".stripMargin
      else ""
    val jsonLdBlock =
      if (java.lang.Math.floorMod(h >> 40, 4L) == 2L)
        s"""<script type="application/ld+json">{"@context":"https://schema.org",
           |"@type":"Article","headline":"Doc $host-$page",
           |"author":{"@type":"Person","name":"$author"}}</script>""".stripMargin
      else ""
    val imgBlock =
      if (java.lang.Math.floorMod(h >> 44, 3L) == 1L)
        s"""<img src="/img/$page.png" alt="figure $page" width="640" height="480"/>"""
      else ""
    val metaExtra =
      s"""<meta name="description" content="Notes on $topic, part ${page % 7}."/>
         |<meta name="keywords" content="crawl, $topic"/>
         |<link rel="canonical" href="$url"/>
         |<link rel="alternate" type="application/rss+xml" href="/rss"/>""".stripMargin

    s"""<!DOCTYPE html>
       |<html lang="en">
       |<head>$titleBlock
       |$metaExtra
       |<meta name="viewport" content="width=device-width"/>
       |</head>
       |<body>
       |<nav class="nav">home | about</nav>
       |$authorBlock
       |$mainOpen
       |<h2>Part ${page % 7}</h2>
       |<p>$para1</p>
       |<script>track("$page")</script>
       |<div class="ads">buy things</div>
       |<p>$para2</p>
       |<h3>Details</h3>
       |<ul><li>point one about $topic</li><li>point two</li></ul>
       |$tableBlock
       |$imgBlock
       |$jsonLdBlock
       |$anchors
       |$mainClose
       |$formBlock
       |$contactBlock
       |$socialBlock
       |<div class="sidebar">clutter</div>
       |<footer class="footer">footer text</footer>
       |</body>
       |</html>""".stripMargin
  }

  /** Extract + resolve + filter the crawlable links of a fetched page —
    * shared by oracle and engine (semantics of generate_sitemap,
    * /root/reference/src/server.ts:3563-3582: a[href] in document order,
    * resolved against the current url, same-host only, fragments dropped
    * by canonicalization).
    */
  def pageLinks(htmlStr: String, pageUrl: String, sameHostOnly: Boolean): Seq[String] = {
    val doc = graft.core.Html.parse(htmlStr)
    val base = UrlNorm.canonicalize(pageUrl).getOrElse(pageUrl)
    val srcHost = UrlNorm.host(base)
    doc.select("a").flatMap { a =>
      a.attr("href").flatMap(href => UrlNorm.resolve(href, base))
    }.filter(u => !sameHostOnly || UrlNorm.host(u) == srcHost)
  }
}
