package graft.core

/** URL canonicalization + 64-bit hashing for frontier membership tests.
  *
  * Canonical form follows RFC 3986 §6 normalization — lowercase scheme/host,
  * default-port strip, dot-segment removal, uppercase percent-encoding with
  * decode of unreserved characters — plus the WHATWG behaviors the reference
  * relies on when it resolves links with `new URL(href, base)`
  * (/root/reference/src/server.ts:3568): empty path ⇒ "/", fragment dropped
  * for crawl identity (the reference's visited-set keys are full
  * `URL.toString()` values; fragments are kept by WHATWG but we key the
  * frontier on the fragment-free form — the BFS oracle uses the same rule,
  * so ordering and seen-set equality hold).
  *
  * Everything here is pure and allocation-lean: it runs per-row inside the
  * frontier pipeline at 10^10-URL scale.
  */
object UrlNorm {

  final case class Parsed(
      scheme: String, host: String, port: Int, path: String, query: String) {
    def render: String = {
      val p = if (port < 0) "" else ":" + port
      val q = if (query.isEmpty) "" else "?" + query
      s"$scheme://$host$p$path$q"
    }
    def hostPort: String = if (port < 0) host else s"$host:$port"
  }

  private val DefaultPorts = Map("http" -> 80, "https" -> 443)

  /** Parse + normalize an absolute http(s) URL. Returns None for other
    * schemes / malformed input (the validateUrl gate,
    * /root/reference/src/fetch.ts:64-87, only passes http/https).
    */
  def parse(url: String): Option[Parsed] = {
    val schemeEnd = url.indexOf("://")
    if (schemeEnd <= 0) return None
    val scheme = url.substring(0, schemeEnd).toLowerCase
    if (scheme != "http" && scheme != "https") return None
    val rest = url.substring(schemeEnd + 3)
    if (rest.isEmpty) return None
    // authority ends at first of / ? #
    var i = 0
    while (i < rest.length && rest.charAt(i) != '/' && rest.charAt(i) != '?' && rest.charAt(i) != '#') i += 1
    val authority = rest.substring(0, i)
    if (authority.isEmpty) return None
    val afterAuth = rest.substring(i)
    // strip userinfo (rare; the reference never emits it)
    val hostPort = {
      val at = authority.lastIndexOf('@')
      if (at >= 0) authority.substring(at + 1) else authority
    }
    val (host0, port0) = {
      val colon = hostPort.lastIndexOf(':')
      if (colon >= 0 && hostPort.drop(colon + 1).forall(_.isDigit) && colon != hostPort.length - 1)
        (hostPort.substring(0, colon), hostPort.substring(colon + 1).toInt)
      else (hostPort, -1)
    }
    if (host0.isEmpty) return None
    val host = host0.toLowerCase
    val port = if (port0 == DefaultPorts(scheme)) -1 else port0
    // split path / query, drop fragment
    val hashIdx = afterAuth.indexOf('#')
    val noFrag = if (hashIdx >= 0) afterAuth.substring(0, hashIdx) else afterAuth
    val qIdx = noFrag.indexOf('?')
    val (rawPath, query) =
      if (qIdx >= 0) (noFrag.substring(0, qIdx), noFrag.substring(qIdx + 1))
      else (noFrag, "")
    val path = normalizePath(if (rawPath.isEmpty) "/" else rawPath)
    Some(Parsed(scheme, host, port, normalizePercent(path), normalizePercent(query)))
  }

  /** Canonical string form, or None if not an http(s) URL. */
  def canonicalize(url: String): Option[String] = parse(url.trim).map(_.render)

  /** Host of an absolute URL (already lowercased), or None. */
  def host(url: String): Option[String] = parse(url.trim).map(_.host)

  /** RFC 3986 §5.2.4 remove_dot_segments (always yields an absolute path). */
  // WHATWG URL spec: a path segment is a single-dot segment if it is "."
  // or "%2e" (case-insensitive); double-dot if "..", ".%2e", "%2e.", or
  // "%2e%2e" — percent-encoded dots participate in dot-segment removal
  private def isSingleDot(s: String): Boolean =
    s == "." || s.equalsIgnoreCase("%2e")
  private def isDoubleDot(s: String): Boolean =
    s == ".." || {
      val l = s.toLowerCase
      l == ".%2e" || l == "%2e." || l == "%2e%2e"
    }

  def normalizePath(path: String): String = {
    val out = new scala.collection.mutable.ArrayBuffer[String]
    path.split("/", -1).foreach {
      case "" => // empty segments vanish
      case s if isSingleDot(s) => // same-dir segments vanish
      case s if isDoubleDot(s) => if (out.nonEmpty) out.remove(out.length - 1)
      case s => out += s
    }
    val lastSeg = path.substring(path.lastIndexOf('/') + 1)
    val trailingSlash =
      path.endsWith("/") || isSingleDot(lastSeg) || isDoubleDot(lastSeg)
    val base = "/" + out.mkString("/")
    if (trailingSlash && base != "/") base + "/" else base
  }

  private def isUnreserved(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') ||
      c == '-' || c == '.' || c == '_' || c == '~'

  /** Uppercase %XX escapes; decode escapes of unreserved chars. */
  def normalizePercent(s: String): String = {
    if (s.indexOf('%') < 0) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length && isHex(s.charAt(i + 1)) && isHex(s.charAt(i + 2))) {
        val v = Integer.parseInt(s.substring(i + 1, i + 3), 16)
        if (v < 128 && isUnreserved(v.toChar)) sb.append(v.toChar)
        else sb.append('%').append(Character.toUpperCase(s.charAt(i + 1)))
          .append(Character.toUpperCase(s.charAt(i + 2)))
        i += 3
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  /** WHATWG-style relative resolution against a base URL (the reference
    * resolves sitemap links as `new URL(href, currentUrl)`,
    * /root/reference/src/server.ts:3568, and extract_links against the
    * origin, :1737). Returns canonical absolute form.
    */
  def resolve(href0: String, base: String): Option[String] = {
    val href = href0.trim
    if (href.isEmpty) return canonicalize(base)
    val lower = href.toLowerCase
    if (lower.startsWith("http://") || lower.startsWith("https://")) return canonicalize(href)
    // non-hierarchical schemes we never crawl
    if (lower.startsWith("mailto:") || lower.startsWith("tel:") || lower.startsWith("javascript:") ||
        lower.startsWith("data:") || lower.startsWith("ftp:") || lower.startsWith("file:")) return None
    parse(base).flatMap { b =>
      if (href.startsWith("//")) canonicalize(b.scheme + ":" + href)
      else if (href.startsWith("/")) Some(b.copy(path = normalizePercent(normalizePath(stripFragQ(href)._1)), query = stripFragQ(href)._2).render)
      else if (href.startsWith("#")) Some(b.render) // fragment-only: same page
      else if (href.startsWith("?")) {
        val (_, q) = stripFragQ(href)
        Some(b.copy(query = q).render)
      } else {
        // relative path: resolve against base directory
        val dir = b.path.substring(0, b.path.lastIndexOf('/') + 1)
        val (p, q) = stripFragQ(href)
        Some(b.copy(path = normalizePercent(normalizePath(dir + p)), query = q).render)
      }
    }
  }

  /** (path-without-query-or-fragment, query) of a reference string. */
  private def stripFragQ(s: String): (String, String) = {
    val h = s.indexOf('#')
    val noFrag = if (h >= 0) s.substring(0, h) else s
    val q = noFrag.indexOf('?')
    if (q >= 0) (noFrag.substring(0, q), normalizePercent(noFrag.substring(q + 1)))
    else (noFrag, "")
  }

  // ------------------------------------------------------------------
  // xxHash64 (public algorithm, XXH64 spec) over the canonical URL's
  // UTF-8 bytes — the frontier's 64-bit membership key. Pure Scala so the
  // scalar oracle and the distributed path share one implementation.
  // ------------------------------------------------------------------
  private val P1 = -7046029288634856825L // 0x9E3779B185EBCA87
  private val P2 = -4417276706812531889L // 0xC2B2AE3D27D4EB4F
  private val P3 = 1609587929392839161L
  private val P4 = -8796714831421723037L // 0x85EBCA77C2B2AE63
  private val P5 = 2870177450012600261L

  def xxh64(data: Array[Byte], seed: Long = 42L): Long = {
    val len = data.length
    var h: Long = 0L
    var i = 0
    if (len >= 32) {
      var v1 = seed + P1 + P2; var v2 = seed + P2; var v3 = seed; var v4 = seed - P1
      while (i + 32 <= len) {
        v1 = round(v1, getLong(data, i)); v2 = round(v2, getLong(data, i + 8))
        v3 = round(v3, getLong(data, i + 16)); v4 = round(v4, getLong(data, i + 24))
        i += 32
      }
      h = java.lang.Long.rotateLeft(v1, 1) + java.lang.Long.rotateLeft(v2, 7) +
        java.lang.Long.rotateLeft(v3, 12) + java.lang.Long.rotateLeft(v4, 18)
      h = mergeRound(h, v1); h = mergeRound(h, v2); h = mergeRound(h, v3); h = mergeRound(h, v4)
    } else h = seed + P5
    h += len
    while (i + 8 <= len) {
      h ^= round(0L, getLong(data, i)); h = java.lang.Long.rotateLeft(h, 27) * P1 + P4; i += 8
    }
    if (i + 4 <= len) {
      h ^= (getInt(data, i) & 0xFFFFFFFFL) * P1
      h = java.lang.Long.rotateLeft(h, 23) * P2 + P3; i += 4
    }
    while (i < len) {
      h ^= (data(i) & 0xFFL) * P5; h = java.lang.Long.rotateLeft(h, 11) * P1; i += 1
    }
    h ^= h >>> 33; h *= P2; h ^= h >>> 29; h *= P3; h ^= h >>> 32
    h
  }

  def urlHash(canonicalUrl: String): Long =
    xxh64(canonicalUrl.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  private def round(acc: Long, in: Long): Long =
    java.lang.Long.rotateLeft(acc + in * P2, 31) * P1
  private def mergeRound(acc0: Long, v: Long): Long = {
    val acc = acc0 ^ round(0L, v)
    acc * P1 + P4
  }
  private def getLong(b: Array[Byte], i: Int): Long =
    (b(i) & 0xFFL) | (b(i + 1) & 0xFFL) << 8 | (b(i + 2) & 0xFFL) << 16 |
      (b(i + 3) & 0xFFL) << 24 | (b(i + 4) & 0xFFL) << 32 | (b(i + 5) & 0xFFL) << 40 |
      (b(i + 6) & 0xFFL) << 48 | (b(i + 7) & 0xFFL) << 56
  private def getInt(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | (b(i + 1) & 0xFF) << 8 | (b(i + 2) & 0xFF) << 16 | (b(i + 3) & 0xFF) << 24
}
