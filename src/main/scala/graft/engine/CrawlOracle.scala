package graft.engine

import graft.core.{Robots, UrlNorm}
import scala.collection.mutable

/** Single-threaded scalar crawl oracle — the ground truth the distributed
  * engine must match exactly (north rule: "crawl ordering and the final
  * URL-seen set must exactly match the reference given the same seed list
  * and politeness budget").
  *
  * Semantics mirror generate_sitemap's BFS
  * (/root/reference/src/server.ts:3505-3618):
  *  - FIFO queue, children appended in document order (:3563-3575);
  *  - membership on the canonicalized URL string;
  *  - visited marked at dequeue before fetch (:3543);
  *  - depth > maxDepth entries skipped (:3534);
  *  - maxPages counts all emitted rows incl. errors (:3531, :3583-3590);
  *  - robots denial / HTTP errors / content gates produce error rows
  *    (fetch.ts:124-129, 203-242) and do not expand links;
  * generalized with the per-host politeness budget B per round
  * (fetch.ts:44-59's 30/min token bucket, round-synchronized): each round
  * takes at most B queued URLs per host in FIFO order; the rest defer to
  * the next round. B = Int.MaxValue degenerates to the reference's plain
  * sequential BFS.
  */
object CrawlOracle {

  final case class Config(
      maxDepth: Int = 2,
      maxPages: Int = 50,
      hostBudget: Int = Int.MaxValue,
      sameHostOnly: Boolean = true,
      respectRobots: Boolean = true,
      web: SyntheticWeb.Config = SyntheticWeb.Config())

  final case class Emitted(
      orderIdx: Long, url: String, depth: Int, round: Int, status: String,
      title: String, text: String)

  final case class Result(rows: Seq[Emitted], seen: Set[String], rounds: Int)

  private final case class Entry(url: String, depth: Int, parentOrder: Long, linkPos: Int)

  def run(seeds: Seq[String], cfg: Config): Result = {
    val robotsByHost = mutable.Map[String, Robots.RobotsRules]()
    def robotsFor(host: String): Robots.RobotsRules =
      robotsByHost.getOrElseUpdate(host, {
        val h = SyntheticWeb.parseUrl(s"http://$host/p/0").map(_._1)
        Robots.parse(h.map(SyntheticWeb.robotsTxt).getOrElse(""))
      })

    val seen = mutable.LinkedHashSet[String]()
    var queue = seeds.flatMap(UrlNorm.canonicalize).zipWithIndex.map {
      case (u, i) => Entry(u, 0, -1L, i)
    }.toVector
    val out = mutable.ArrayBuffer[Emitted]()
    var order = 0L
    var round = 0

    while (queue.nonEmpty && out.length < cfg.maxPages) {
      // dedupe queue (first occurrence wins) and drop already-seen / too-deep
      val pending = mutable.LinkedHashSet[String]()
      val cands = queue
        .sortBy(e => (e.parentOrder, e.linkPos))
        .filter { e =>
          val fresh = !seen.contains(e.url) && !pending.contains(e.url) &&
            e.depth <= cfg.maxDepth
          if (fresh) pending += e.url
          fresh
        }
      // per-host budget in FIFO order
      val hostTaken = mutable.Map[String, Int]()
      val (taken0, deferred) = cands.partition { e =>
        val host = UrlNorm.host(e.url).getOrElse("")
        val k = hostTaken.getOrElse(host, 0)
        if (k < cfg.hostBudget) { hostTaken(host) = k + 1; true } else false
      }
      if (taken0.isEmpty) return Result(out.toSeq, seen.toSet, round)
      // global maxPages cap (FIFO prefix)
      val room = cfg.maxPages - out.length
      val taken = taken0.take(room)

      val children = mutable.ArrayBuffer[Entry]()
      taken.foreach { e =>
        seen += e.url // visited marked at dequeue (server.ts:3543)
        val host = UrlNorm.host(e.url).getOrElse("")
        val fr = SyntheticWeb.fetch(cfg.web, e.url)
        val status =
          if (cfg.respectRobots &&
            !Robots.isAllowed(robotsFor(host), e.url, cfg.web.userAgent)) "ROBOTS_DENIED"
          else if (fr.status == 404) "HTTP_404"
          else if (fr.status == 500) "HTTP_500"
          else if (!fr.contentType.contains("text/html")) "UNSUPPORTED_CONTENT_TYPE"
          else if (fr.sizeBytes > 5L * 1024 * 1024) "CONTENT_TOO_LARGE"
          else "OK"
        val (title, text) =
          if (status == "OK") {
            val ex = graft.core.Extract.extract(fr.html, e.url, 0L,
              graft.core.Extract.Options(format = "text"))
            (ex.title, ex.content)
          } else ("", "")
        out += Emitted(order, e.url, e.depth, round, status, title, text)
        if (status == "OK" && e.depth < cfg.maxDepth) {
          val links = SyntheticWeb.pageLinks(fr.html, e.url, cfg.sameHostOnly)
          links.zipWithIndex.foreach { case (u, i) =>
            if (!seen.contains(u)) children += Entry(u, e.depth + 1, order, i)
          }
        }
        order += 1
      }
      queue = deferred ++ children
      round += 1
    }
    Result(out.toSeq, seen.toSet, round)
  }
}
