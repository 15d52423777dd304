package graft.core

/** robots.txt evaluator — semantics of the reference's robots gate
  * (/root/reference/src/robots.ts:31-119, which wraps the `robots-parser`
  * npm package): user-agent groups, Allow/Disallow with longest-match
  * precedence (Allow wins ties), `*` wildcards and `$` end anchors,
  * missing/404/error robots ⇒ allow-all (robots.ts:51-54, 66-72),
  * `respectRobots=false` or bypass flag ⇒ allow-all (robots.ts:80-85,
  * 110-119).
  *
  * Pure Scala; parsed rules are broadcast per host and evaluated inside
  * `mapPartitions` on the fetch path (SURVEY.md §2a).
  */
object Robots {

  final case class Rule(allow: Boolean, pattern: String)
  final case class Group(agents: Seq[String], rules: Seq[Rule], crawlDelay: Option[Double])
  final case class RobotsRules(groups: Seq[Group]) {

    /** Most-specific-match decision for `path` (+query) and user agent. */
    def isAllowed(pathAndQuery: String, userAgent: String): Boolean = {
      val group = matchGroup(userAgent)
      group match {
        case None => true // no applicable group ⇒ allowed
        case Some(g) =>
          // longest-pattern match wins; Allow wins length ties
          var bestLen = -1
          var bestAllow = true
          g.rules.foreach { r =>
            if (r.pattern.nonEmpty && patternMatches(r.pattern, pathAndQuery)) {
              val len = r.pattern.length
              if (len > bestLen || (len == bestLen && r.allow && !bestAllow)) {
                bestLen = len; bestAllow = r.allow
              }
            }
          }
          if (bestLen < 0) true else bestAllow
      }
    }

    /** Pick the group whose agent token is the longest substring match of
      * the UA (robots-parser behavior); `*` group is the fallback. */
    private def matchGroup(userAgent: String): Option[Group] = {
      val ua = userAgent.toLowerCase
      val named = groups.flatMap { g =>
        g.agents.collect {
          case a if a != "*" && ua.contains(a.toLowerCase) => (a.length, g)
        }
      }
      if (named.nonEmpty) Some(named.maxBy(_._1)._2)
      else groups.find(_.agents.contains("*"))
    }
  }

  /** `*` matches any char sequence; `$` at end anchors; otherwise prefix. */
  private[core] def patternMatches(pattern: String, path: String): Boolean = {
    val anchored = pattern.endsWith("$")
    val p = if (anchored) pattern.dropRight(1) else pattern
    val parts = p.split("\\*", -1)
    // greedy sequential match of literal parts
    var pos = 0
    var i = 0
    while (i < parts.length) {
      val part = parts(i)
      if (i == 0) {
        if (!path.startsWith(part)) return false
        pos = part.length
      } else {
        val idx = path.indexOf(part, pos)
        if (idx < 0) return false
        pos = idx + part.length
      }
      i += 1
    }
    if (anchored) {
      // last part must reach the end (with trailing * it always can)
      if (parts.last.isEmpty) true else pos == path.length
    } else true
  }

  // ---- robots-parser encoding normalization (Robots.js:84-105) ----------
  // patterns: normaliseEncoding = urlEncodeToUpper(encodeURI(p).replace(
  // /%25/g,'%')) — i.e. percent-encode everything encodeURI would, leave
  // existing %XX intact, uppercase hex. match paths: the WHATWG URL
  // serializer has already percent-encoded specials (new URL(...).pathname)
  // before urlEncodeToUpper.
  private val PctRe = "%[0-9a-fA-F]{2}".r
  private def pctUpper(s: String): String =
    PctRe.replaceAllIn(s, m => m.matched.toUpperCase)

  private def utf8Pct(cp: Int): String =
    new String(Character.toChars(cp)).getBytes("UTF-8")
      .map(b => f"%%${b & 0xff}%02X").mkString

  // chars encodeURI leaves unescaped (MDN): alnum + ;,/?:@&=+$-_.!~*'()#
  private def encodeUriKeeps(c: Char): Boolean =
    c.isLetterOrDigit && c < 128 || ";,/?:@&=+$-_.!~*'()#%".indexOf(c) >= 0

  private[core] def normalisePattern(p: String): String =
    pctUpper(p.flatMap(c => if (encodeUriKeeps(c)) c.toString else utf8Pct(c)))

  // WHATWG path+query percent-encode set (space, quotes, angle brackets,
  // backtick, braces, controls, non-ASCII); '%' and existing escapes kept
  private def whatwgKeeps(c: Char): Boolean =
    c > ' ' && c < 127 && "\"<>`{}".indexOf(c) < 0

  private[core] def normalisePath(p: String): String =
    pctUpper(p.flatMap(c => if (whatwgKeeps(c)) c.toString else utf8Pct(c)))

  /** Parse robots.txt body. Empty/erroring body ⇒ allow-all rules. */
  def parse(body: String): RobotsRules = {
    if (body == null || body.trim.isEmpty) return RobotsRules(Seq.empty)
    val groups = scala.collection.mutable.ArrayBuffer[Group]()
    var agents = scala.collection.mutable.ArrayBuffer[String]()
    var rules = scala.collection.mutable.ArrayBuffer[Rule]()
    var delay: Option[Double] = None
    var sawRule = false

    def flush(): Unit = {
      if (agents.nonEmpty)
        groups += Group(agents.toSeq, rules.toSeq, delay)
      agents = scala.collection.mutable.ArrayBuffer[String]()
      rules = scala.collection.mutable.ArrayBuffer[Rule]()
      delay = None
      sawRule = false
    }

    body.linesIterator.foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      if (line.nonEmpty) {
        val colon = line.indexOf(':')
        if (colon > 0) {
          val key = line.substring(0, colon).trim.toLowerCase
          val value = line.substring(colon + 1).trim
          key match {
            case "user-agent" =>
              if (sawRule) flush()
              agents += value.toLowerCase
            case "disallow" =>
              sawRule = true
              if (value.nonEmpty) rules += Rule(allow = false, normalisePattern(value))
            // empty Disallow ⇒ allow everything (no rule)
            case "allow" =>
              sawRule = true
              if (value.nonEmpty) rules += Rule(allow = true, normalisePattern(value))
            case "crawl-delay" =>
              sawRule = true
              delay = scala.util.Try(value.toDouble).toOption
            case _ => // sitemap, host, unknown keys: ignored
          }
        }
      }
    }
    flush()
    RobotsRules(groups.toSeq)
  }

  /** Gate for a full URL (mirrors checkRobots, robots.ts:78-105). */
  def isAllowed(rules: RobotsRules, url: String, userAgent: String): Boolean =
    UrlNorm.parse(url) match {
      case Some(p) =>
        val pathQ = p.path + (if (p.query.nonEmpty) "?" + p.query else "")
        rules.isAllowed(normalisePath(pathQ), userAgent)
      case None => false
    }
}
