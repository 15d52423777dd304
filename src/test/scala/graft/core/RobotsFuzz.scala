package graft.core

/** Deterministic robots.txt differential corpus: grammar variants × paths ×
  * user agents, evaluated against the reference's actual `robots-parser`
  * library (scripts/gen_robots_goldens.mjs) and pinned in
  * golden_robots.tsv. Our Robots evaluator must agree on every verdict —
  * robots gating decides the crawl's seen-set, which the north rule pins
  * to reference exactness.
  */
object RobotsFuzz {

  val RobotsTxts: Seq[String] = Seq(
    // plain wildcard group
    "User-agent: *\nDisallow: /private/\nAllow: /private/ok\n",
    // specific group wins over *
    "User-agent: graft-bot\nDisallow: /only-graft/\n\nUser-agent: *\nDisallow: /everyone/\n",
    // multiple UA lines sharing one group
    "User-agent: graft-bot\nUser-agent: other-bot\nDisallow: /shared/\n",
    // longest-match precedence
    "User-agent: *\nDisallow: /a/\nAllow: /a/b/\nDisallow: /a/b/c/\n",
    // wildcards and $ anchors
    "User-agent: *\nDisallow: /*.pdf$\nDisallow: /tmp*/\nAllow: /tmp-ok/\n",
    // empty disallow = allow all
    "User-agent: *\nDisallow:\n",
    // disallow everything
    "User-agent: *\nDisallow: /\n",
    // allow-only group
    "User-agent: *\nAllow: /\n",
    // comments + crawl-delay noise
    "# note\nUser-agent: * # inline\nCrawl-delay: 2\nDisallow: /x/ # trailing\n",
    // case of the UA token
    "User-agent: Graft-Bot\nDisallow: /cased/\n",
    // group for another bot only
    "User-agent: not-us\nDisallow: /\n",
    // empty file
    "",
    // percent-encoded path rule
    "User-agent: *\nDisallow: /enc%20oded/\n",
    // query-string pattern
    "User-agent: *\nDisallow: /*?session=\n",
    // multiple wildcards
    "User-agent: *\nDisallow: /a*b*c\n")

  val Paths: Seq[String] = Seq(
    "/", "/private/x", "/private/ok", "/private/okay", "/only-graft/p",
    "/everyone/p", "/shared/p", "/a/x", "/a/b/x", "/a/b/c/x", "/doc.pdf",
    "/doc.pdf?x=1", "/dir/doc.pdf", "/tmp1/f", "/tmp-ok/f", "/x/y",
    "/cased/z", "/enc%20oded/f", "/enc oded/f", "/p?session=1",
    "/p?other=1&session=2", "/aXbYc", "/aXbYcZ", "/abc")

  val Agents: Seq[String] = Seq("graft-bot", "Graft-Bot", "other-bot", "somebody")

  /** All (robotsIdx, path, ua) cases. */
  def cases: Seq[(Int, String, String)] =
    for {
      (_, i) <- RobotsTxts.zipWithIndex
      p <- Paths
      ua <- Agents
    } yield (i, p, ua)

  def urlFor(path: String): String = s"http://fuzz-robots.example$path"
}
