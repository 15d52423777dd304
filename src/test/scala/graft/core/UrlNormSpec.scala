package graft.core

import org.scalatest.funsuite.AnyFunSuite

class UrlNormSpec extends AnyFunSuite {

  test("canonicalize lowercases scheme and host") {
    assert(UrlNorm.canonicalize("HTTP://Example.COM/Path").contains("http://example.com/Path"))
  }

  test("default port stripped, non-default kept") {
    assert(UrlNorm.canonicalize("http://a.com:80/x").contains("http://a.com/x"))
    assert(UrlNorm.canonicalize("https://a.com:443/x").contains("https://a.com/x"))
    assert(UrlNorm.canonicalize("http://a.com:8080/x").contains("http://a.com:8080/x"))
  }

  test("dot segments removed") {
    assert(UrlNorm.canonicalize("http://a.com/b/./c/../d").contains("http://a.com/b/d"))
    assert(UrlNorm.canonicalize("http://a.com/../../x").contains("http://a.com/x"))
  }

  test("empty path becomes /") {
    assert(UrlNorm.canonicalize("http://a.com").contains("http://a.com/"))
  }

  test("fragment dropped, query kept") {
    assert(UrlNorm.canonicalize("http://a.com/p?q=1#frag").contains("http://a.com/p?q=1"))
  }

  test("percent-encoding normalized: unreserved decoded, others uppercased") {
    assert(UrlNorm.canonicalize("http://a.com/%7Euser").contains("http://a.com/~user"))
    assert(UrlNorm.canonicalize("http://a.com/a%2fb").contains("http://a.com/a%2Fb"))
  }

  test("non-http schemes rejected") {
    assert(UrlNorm.canonicalize("ftp://a.com/x").isEmpty)
    assert(UrlNorm.canonicalize("mailto:x@y.com").isEmpty)
    assert(UrlNorm.canonicalize("javascript:alert(1)").isEmpty)
  }

  test("resolve: relative paths against base (server.ts:3568 semantics)") {
    val base = "http://host.example/dir/page.html"
    assert(UrlNorm.resolve("other.html", base).contains("http://host.example/dir/other.html"))
    assert(UrlNorm.resolve("/abs", base).contains("http://host.example/abs"))
    assert(UrlNorm.resolve("../up", base).contains("http://host.example/up"))
    assert(UrlNorm.resolve("//cdn.example/x", base).contains("http://cdn.example/x"))
    assert(UrlNorm.resolve("https://other.example/y", base).contains("https://other.example/y"))
    assert(UrlNorm.resolve("#frag", base).contains("http://host.example/dir/page.html"))
    assert(UrlNorm.resolve("?q=2", base).contains("http://host.example/dir/page.html?q=2"))
    assert(UrlNorm.resolve("mailto:a@b.c", base).isEmpty)
    assert(UrlNorm.resolve("tel:+123", base).isEmpty)
  }

  test("canonicalization is idempotent (exhaustive over the grammar)") {
    for {
      host <- Seq("a.com", "B.Example.COM", "x-y.z")
      port <- Seq("", ":80", ":8080")
      path <- Seq("", "/", "/a/b", "/a/../b", "/%7Ea", "/A/./B/")
      q <- Seq("", "?k=v", "?a=%2f")
    } {
      val u = s"http://$host$port$path$q"
      val c1 = UrlNorm.canonicalize(u)
      assert(c1.isDefined, u)
      assert(UrlNorm.canonicalize(c1.get) == c1, u)
    }
  }

  test("xxh64 matches known reference vectors") {
    // XXH64 of empty input with seed 0 is 0xEF46DB3751D8E999 (public spec)
    assert(UrlNorm.xxh64(Array.emptyByteArray, 0L) == 0xEF46DB3751D8E999L)
    // "a" with seed 0 → 0xD24EC4F1A98C6E5B
    assert(UrlNorm.xxh64("a".getBytes("UTF-8"), 0L) == 0xD24EC4F1A98C6E5BL)
    // long input exercises the 32-byte stripe loop
    val s = ("0123456789abcdef" * 8).getBytes("UTF-8")
    assert(UrlNorm.xxh64(s, 0L) != UrlNorm.xxh64(s, 1L))
  }

  test("urlHash is stable and collision-free over distinct canonical urls") {
    val urls = (0 until 10000).map(i => s"http://host${i % 64}.example/p/$i")
    assert(urls.map(UrlNorm.urlHash).distinct.size == urls.size)
  }
}
