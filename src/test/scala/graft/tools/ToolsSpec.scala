package graft.tools

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Html

class ToolsSpec extends AnyFunSuite {

  test("pageMetadata: title tag wins; cascades fall back (server.ts:1610-1625)") {
    val doc = Html.parse(
      """<html lang="de"><head><title>Tag Title</title>
        |<meta name="description" content="Desc"/>
        |<meta name="keywords" content="k1, k2"/>
        |<meta property="og:title" content="OG"/>
        |<link rel="canonical" href="http://a.com/x"/>
        |</head><body><h1>H1 Title</h1></body></html>""".stripMargin)
    val m = PageTools.pageMetadata(doc)
    assert(m.title == "Tag Title")
    assert(m.description == "Desc")
    assert(m.keywords == "k1, k2")
    assert(m.ogTitle == "OG")
    assert(m.canonical == "http://a.com/x")
    assert(m.language == "de")
  }

  test("pageMetadata: og:description fallback") {
    val doc = Html.parse(
      """<head><meta property="og:description" content="OGD"/></head><body/>""")
    assert(PageTools.pageMetadata(doc).description == "OGD")
  }

  test("extractLinks resolves against ORIGIN (server.ts:1737 quirk)") {
    val doc = Html.parse(
      """<body><a href="sub/page.html">rel</a>
        |<a href="/abs">abs</a>
        |<a href="http://other.example/x" title="t">ext</a></body>""".stripMargin)
    val links = PageTools.extractLinks(doc, "http://host.example/deep/dir/page.html")
    // relative resolves against origin, NOT the /deep/dir/ directory
    assert(links(0).href == "http://host.example/sub/page.html")
    assert(links(0).internal)
    assert(links(1).href == "http://host.example/abs")
    assert(links(2).href == "http://other.example/x")
    assert(!links(2).internal)
    assert(links(2).title == "t")
    assert(links(0).text == "rel")
  }

  test("extractImages: src against origin, alt/title/dims") {
    val doc = Html.parse("""<body><img src="i/p.png" alt="a" width="10" height="20"/></body>""")
    val imgs = PageTools.extractImages(doc, "http://h.example/d/x.html")
    assert(imgs.head.src == "http://h.example/i/p.png")
    assert(imgs.head.alt == "a")
    assert(imgs.head.width == "10" && imgs.head.height == "20")
  }

  test("extractForms: fields, labels, selects, hidden filter (server.ts:2517-2564)") {
    val doc = Html.parse(
      """<form action="/go" method="post" id="f1">
        |<label for="n1">Name</label>
        |<input type="text" name="n" id="n1" required/>
        |<input type="hidden" name="h" value="x"/>
        |<input type="text" name="d" disabled/>
        |<select name="s"><option value="1">one</option><option value="2" selected>two</option></select>
        |</form>""".stripMargin)
    val forms = PageTools.extractForms(doc)
    assert(forms.size == 1)
    val f = forms.head
    assert(f.action == "/go" && f.method == "post" && f.id == "f1")
    // hidden and disabled excluded by default
    assert(f.fields.map(_.name) == Seq("n", "s"))
    assert(f.fields.head.label == "Name")
    assert(f.fields.head.required)
    assert(f.fields(1).options == Seq("one", "two"))
    val withHidden = PageTools.extractForms(doc, includeHidden = true, includeDisabled = true)
    assert(withHidden.head.fields.map(_.name) == Seq("n", "h", "d", "s"))
  }

  test("extractTables: thead headers, tbody rows, renderers (server.ts:2620-2666)") {
    val doc = Html.parse(
      """<table><thead><tr><th>a</th><th>b</th></tr></thead>
        |<tbody><tr><td>1</td><td>x"y</td></tr><tr><td>2</td><td>z</td></tr></tbody></table>""".stripMargin)
    val ts = PageTools.extractTables(doc)
    assert(ts.size == 1)
    val t = ts.head
    assert(t.headers == Seq("a", "b"))
    assert(t.rows == Seq(Seq("1", "x\"y"), Seq("2", "z")))
    assert(t.columnCount == 2)
    assert(PageTools.tableCsv(t) == "\"a\",\"b\"\n\"1\",\"x\"\"y\"\n\"2\",\"z\"")
    assert(PageTools.tableMarkdown(t) ==
      "| a | b |\n| --- | --- |\n| 1 | x\"y |\n| 2 | z |")
  }

  test("extractTables: headerless first-row fallback") {
    // parse5/cheerio imply <tbody> around bare <tr>s, so the reference's
    // `tbody tr, tr:not(:first-child)` row selector matches EVERY row —
    // the first-row "header" is also emitted as a data row (verified
    // against cheerio directly; our spec tree builder now reproduces the
    // implied-tbody tree, so we inherit the same quirk byte-for-byte)
    val doc = Html.parse("<table><tr><td>h1</td><td>h2</td></tr><tr><td>1</td><td>2</td></tr></table>")
    val t = PageTools.extractTables(doc).head
    assert(t.headers == Seq("h1", "h2"))
    assert(t.rows == Seq(Seq("h1", "h2"), Seq("1", "2")))
  }

  test("extractHeadings: sorted by (level, index) (server.ts:3138-3141)") {
    val doc = Html.parse("<h2>b</h2><h1 id='top'>a</h1><h2 class='x'>c</h2>")
    val hs = PageTools.extractHeadings(doc)
    assert(hs.map(_.text) == Seq("a", "b", "c"))
    assert(hs.head.id == "top")
    assert(hs(2).cls == "x")
  }

  test("extractContacts: emails, mailto, phones with false-positive filter") {
    val doc = Html.parse(
      """<body><p>Write to team@example.org or call (555) 123-4567.
        |The year 2024 is not a phone. Also +44 20 7946 0958.</p>
        |<a href="mailto:x@y.com?subject=hi">mail</a>
        |<a href="tel:+1-555-010-2020">tel</a>
        |<div class="office-address">1 Long Example Street, Townsville</div></body>""".stripMargin)
    val c = PageTools.extractContacts(doc)
    assert(c.emails.contains("team@example.org"))
    assert(c.emails.contains("x@y.com"))
    assert(c.phones.exists(_.contains("555")))
    assert(!c.phones.contains("2024"))
    assert(c.addresses.exists(_.contains("Example Street")))
  }

  test("validPhone filters years and short numbers (server.ts:3017-3043)") {
    assert(!PageTools.validPhone("2024"))
    assert(!PageTools.validPhone("1999"))
    assert(PageTools.validPhone("(555) 123-4567"))
    assert(!PageTools.validPhone("12345"))
    assert(!PageTools.validPhone("1111111"))
  }

  test("extractEntities: regex families (server.ts:4270-4280)") {
    val e = PageTools.extractEntities(
      "Email a@b.co, visit https://x.org/page, 50% off for $1,234.56, " +
        "meet Jan 5, 2024 at 10:30 AM, #tag @user, coords 12.34, -56.78")
    assert(e.emails == Seq("a@b.co"))
    assert(e.urls.head.startsWith("https://x.org/page"))
    assert(e.percentages == Seq("50%"))
    assert(e.currencies.contains("$1,234.56"))
    assert(e.dates == Seq("Jan 5, 2024"))
    assert(e.times.exists(_.startsWith("10:30")))
    assert(e.hashtags == Seq("#tag"))
    // "@b" from the email is matched too — faithful to the reference's
    // unanchored @\w+ (server.ts:4279)
    assert(e.mentions == Seq("@b", "@user"))
    assert(e.coordinates == Seq("12.34, -56.78"))
  }

  test("stripMarkdown replicates the literal-$1 quirk (server.ts:3981-3986)") {
    assert(PageTools.stripMarkdown("see [link text](http://x)") == "see $1")
    assert(PageTools.stripMarkdown("**bold** word") == "$1 word")
    assert(PageTools.stripMarkdown("![img](u) x") == "x")
    assert(PageTools.stripMarkdown("# Head\nbody") == "Head body")
  }

  test("extractKeywords: stopwords, length bounds, phrase pass") {
    val text = ("crawler frontier scheduling " * 3) +
      "the and for with crawler frontier. crawler frontier again."
    val ks = PageTools.extractKeywords(text, maxKeywords = 6)
    val singles = ks.filterNot(_.isPhrase).map(_.keyword)
    assert(singles.contains("crawler"))
    assert(!singles.exists(PageTools.KeywordStopWords.contains))
    val phrases = ks.filter(_.isPhrase)
    assert(phrases.exists(_.keyword == "crawler frontier"))
  }

  test("classify: whole-word category matching (server.ts:4448-4461)") {
    val cs = PageTools.classify(
      "The software developer wrote code for the api and database")
    val tech = cs.find(_.category == "technology")
    assert(tech.isDefined)
    assert(tech.get.matchedKeywords.toSet == Set("software", "developer", "code", "api", "database"))
    assert(cs.forall(_.matches > 0))
  }

  test("textSimilarity: Jaccard over word sets (server.ts:24-39)") {
    assert(PageTools.textSimilarity("a b c", "a b c") == 1.0)
    assert(PageTools.textSimilarity("a b", "b c") == 1.0 / 3)
    assert(PageTools.textSimilarity("A b", "a B") == 1.0) // lowercase sets
  }

  test("validateHtml: scores and counts (server.ts:3655-3722)") {
    val doc = Html.parse(
      """<html><head><title>t</title></head><body>
        |<h1>one</h1><img src="x"/><img src="y" alt="ok"/>
        |<input type="text" id="i1"/><label for="i1">L</label>
        |<input type="text"/></body></html>""".stripMargin)
    val v = PageTools.validateHtml(doc)
    assert(v.hasTitle)
    assert(v.h1Count == 1)
    assert(v.imagesWithoutAlt == 1)
    assert(v.unlabeledInputs == 1)
    assert(v.score <= 100 && v.score > 50)
  }

  test("detectTracking + scanVulnerabilities substring heuristics") {
    val html = """<html><body><script src="https://www.googletagmanager.com/gtm.js"></script>
                 |<script>gtag('config','G-1');</script>
                 |<img src="http://insecure.example/pixel.gif" width="1" height="1"/>
                 |<form method="get"><input type="password" name="p"/></form>
                 |</body></html>""".stripMargin
    val doc = Html.parse(html)
    val t = PageTools.detectTracking(html, doc)
    assert(t.googleAnalytics && t.gtm)
    assert(t.trackingPixels >= 1)
    assert(t.privacyScore < 100)
    val v = PageTools.scanVulnerabilities(html, doc, "https://h.example/")
    assert(v.passwordFormOverGet)
    assert(v.mixedContent >= 1)
    assert(v.score <= 100 - 25 - 15)
  }

  test("SIM stand-ins are deterministic (server.ts:3767, 3931-3936)") {
    assert(PageTools.pdfPageCount(499) == 1)
    assert(PageTools.pdfPageCount(501) == 2)
    assert(PageTools.translateStandIn("hello", "es") == "[es] hello")
  }

  test("sslStandIn: http insecure; https deterministic fields + grade (server.ts:5347-5490)") {
    val http = PageTools.sslStandIn("http://a.example/x")
    assert(!http.isSecure && http.grade == "")
    val a = PageTools.sslStandIn("https://a.example/x")
    val b = PageTools.sslStandIn("https://a.example/other")
    assert(a.isSecure && a.commonName == "a.example")
    assert(a.daysUntilExpiry == b.daysUntilExpiry, "host-derived, path-independent")
    assert(a.daysUntilExpiry >= 0 && a.daysUntilExpiry < 365)
    assert(a.keySize == 2048 && a.sigAlgorithm == "SHA256withRSA")
    assert(a.grade == (if (a.daysUntilExpiry < 30) "B" else "A")) // (:5472)
    assert(a == PageTools.sslStandIn("https://a.example/x"), "deterministic")
  }

  test("privacyChecklist: link harvest + consent selectors (server.ts:5865-5903)") {
    val html = """<html><body>
                 |<a href="/privacy">Privacy Policy</a>
                 |<a href="/tos">Terms of Service</a>
                 |<a href="/cookies-info">about cookies</a>
                 |<a href="/opt-out">stop emails</a>
                 |<div class="cookie-banner">We use cookies</div>
                 |<form><p>Request data deletion</p><input name="email"/></form>
                 |</body></html>""".stripMargin
    val c = PageTools.privacyChecklist(Html.parse(html))
    // "Privacy Policy" matches both privacy and policy branches → 1 link;
    // href /cookies-info matches cookie; /opt-out link text has no
    // privacy words but href drives optOut detection
    assert(c.nPrivacyLinks == 1)
    assert(c.nTermsLinks == 1)
    assert(c.nCookieLinks == 1)
    assert(c.cookieBanner)
    assert(c.optOutLinks)
    assert(c.dataRequestForm)
    val none = PageTools.privacyChecklist(Html.parse("<html><body><p>hi</p></body></html>"))
    assert(none == PageTools.PrivacyChecklist(0, 0, 0, false, false, false))
  }

  test("cookiePageFlags: https/consent/privacy-link inputs (server.ts:5614-5615)") {
    val html = """<html><body><div id="consent-box">ok</div>
                 |<a href="/privacy">privacy</a></body></html>""".stripMargin
    val f = PageTools.cookiePageFlags(Html.parse(html), "https://h.example/")
    assert(f.isHttps && f.hasConsentBanner && f.hasPrivacyPolicyLink)
    val g = PageTools.cookiePageFlags(
      Html.parse("<html><body><p>x</p></body></html>"), "http://h.example/")
    assert(!g.isHttps && !g.hasConsentBanner && !g.hasPrivacyPolicyLink)
  }
}
