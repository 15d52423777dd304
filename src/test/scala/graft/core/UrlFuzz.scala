package graft.core

/** Deterministic URL-resolution differential corpus: (base, href) cases
  * evaluated against node's WHATWG `new URL(href, base).toString()` (the
  * exact call the reference's crawler uses to resolve links,
  * server.ts:3568) and pinned in golden_urls.tsv. Our UrlNorm.resolve must
  * agree — link resolution decides crawl ordering and the seen-set.
  *
  * Scope note: cases stay inside the crawl engine's actual input domain
  * (http/https, ASCII hosts/paths as the synthetic web and Common-Crawl
  * frontier URLs produce them).
  */
object UrlFuzz {

  val Bases: Seq[String] = Seq(
    "http://host0.example/p/5",
    "http://host0.example/p/5/",
    "http://host0.example/",
    "http://host0.example/a/b/c?q=1",
    "https://host1.example:8080/deep/path/page.html",
    "http://host2.example/a/b/../c/./d")

  val Hrefs: Seq[String] = Seq(
    // absolute
    "http://other.example/x", "https://other.example/x?y=2",
    // protocol-relative
    "//third.example/z",
    // root-relative, relative, with dots
    "/abs/path", "rel/path", "./same", "../up", "../../up2", "../../../up3",
    "..", ".", "",
    // query/fragment forms
    "?q=2", "#frag", "x?a=1#f", "/p/9?x=%20y",
    // traversal beyond root + odd dots
    "/../x", "a/./b/../c", ".././..",
    // trailing slashes, repeated slashes
    "dir/", "//host4.example//double//slash", "a//b",
    // percent and specials (ASCII printable)
    "%7Euser", "a%2Fb", "p?x=a+b", "p;params",
    // dot segments encoded
    "%2e%2e/enc", "./%2e",
    // default-port forms
    "http://host5.example:80/x", "https://host6.example:443/y",
    // uppercase scheme/host
    "HTTP://HOST7.EXAMPLE/MiXeD")

  def cases: Seq[(String, String)] =
    for (b <- Bases; h <- Hrefs) yield (b, h)
}
