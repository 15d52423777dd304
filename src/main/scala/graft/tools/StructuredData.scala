package graft.tools

import graft.core.{Html, Selector}
import graft.core.Html.{Doc, Element}
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** extract_structured_data / extract_social_media / extract_feeds kernels
  * (/root/reference/src/server.ts:2015-2305, 2690-2949, 3165-3266).
  * JSON-LD parsed with Jackson (ships in /opt/spark/jars); schema types
  * harvested recursively from `@type` incl. nested objects/arrays; score =
  * min(100, items*10 + types*5) (:2271).
  */
object StructuredData {

  private val mapper = new ObjectMapper()

  final case class Structured(
      jsonLdCount: Int, ogCount: Int, twitterCount: Int,
      microdataCount: Int, rdfaCount: Int,
      schemaTypes: Seq[String], totalItems: Int, score: Int)

  /** Recursive `@type` harvest (:2058-2081). */
  private def harvestTypes(node: JsonNode, out: scala.collection.mutable.LinkedHashSet[String]): Unit = {
    if (node.isObject) {
      val t = node.get("@type")
      if (t != null) {
        if (t.isArray) t.elements().asScala.foreach(e => out += e.asText())
        else out += t.asText()
      }
      node.properties().asScala.foreach(e => harvestTypes(e.getValue, out))
    } else if (node.isArray) {
      node.elements().asScala.foreach(harvestTypes(_, out))
    }
  }

  def extract(doc: Doc): Structured = {
    val types = scala.collection.mutable.LinkedHashSet[String]()

    // JSON-LD (:2046-2098)
    val jsonLd = doc.select("script[type=\"application/ld+json\"]").flatMap { s =>
      try {
        val node = mapper.readTree(s.text())
        val items = if (node.isArray) node.elements().asScala.toSeq else Seq(node)
        items.filter(_.isObject).map { item => harvestTypes(item, types); item }
      } catch { case _: Exception => Seq.empty }
    }

    // OpenGraph + article/book/profile/video/music/fb prefixes (:2101-2112)
    val ogPrefixes = Seq("og:", "fb:", "article:", "book:", "profile:", "video:", "music:")
    val og = doc.select("meta[property]").filter { m =>
      m.attr("property").exists(p => ogPrefixes.exists(p.startsWith)) &&
        m.attr("content").exists(_.nonEmpty)
    }
    // Twitter card meta (:2115-2122)
    val tw = doc.select("meta[name^=\"twitter:\"]")
      .filter(_.attr("content").exists(_.nonEmpty))

    // microdata (:2132-2205)
    val micro = doc.select("[itemscope]").flatMap { el =>
      el.attr("itemtype").foreach { it =>
        it.split("/").lastOption.filter(_.nonEmpty).foreach(types += _)
      }
      val props = Selector.select(el, "[itemprop]").flatMap { p =>
        val value = p.tag match {
          case "meta" => p.attrRaw("content")
          case "img" => p.attrRaw("src")
          case "a" | "area" | "link" => p.attrRaw("href")
          case "object" => p.attrRaw("data")
          case "data" | "meter" => p.attrRaw("value")
          case "time" => Option(p.attrRaw("datetime")).getOrElse(p.text().trim)
          case _ => p.text().trim
        }
        Option(value).filter(_.nonEmpty).map(v => p.attrRaw("itemprop") -> v)
      }
      if (props.nonEmpty || el.hasAttr("itemtype")) Some(props) else None
    }

    // RDFa (:2208-2262)
    val rdfa = doc.select("[typeof], [property], [resource], [about]").flatMap { el =>
      el.attr("typeof").foreach(_.split(" ").foreach { t =>
        val st = t.split("/").lastOption.getOrElse(t).split(":").lastOption.getOrElse(t)
        if (st.nonEmpty) types += st
      })
      val hasAny = el.hasAttr("typeof") || el.hasAttr("property") ||
        el.hasAttr("resource") || el.hasAttr("about")
      if (hasAny) Some(el.tag) else None
    }

    val totalItems = jsonLd.size +
      (if (og.nonEmpty || tw.nonEmpty) og.size + tw.size else 0) +
      micro.size + rdfa.size
    Structured(jsonLd.size, og.size, tw.size, micro.size, rdfa.size,
      types.toSeq, totalItems,
      math.min(100, totalItems * 10 + types.size * 5)) // (:2271)
  }

  // ---------------- extract_social_media (:2690-2949) ----------------
  /** Platform patterns verbatim from :2714-2721. */
  val PlatformPatterns: Seq[(String, scala.util.matching.Regex)] = Seq(
    "twitter" -> "(?i)(?:twitter\\.com|x\\.com)/([a-zA-Z0-9_]+)".r,
    "facebook" -> "(?i)(?:facebook\\.com|fb\\.com)/([a-zA-Z0-9._-]+)".r,
    "instagram" -> "(?i)instagram\\.com/([a-zA-Z0-9._]+)".r,
    "linkedin" -> "(?i)linkedin\\.com/(?:in|company)/([a-zA-Z0-9-]+)".r,
    "youtube" -> "(?i)youtube\\.com/(?:channel/|user/|c/|@)?([a-zA-Z0-9_-]+)".r,
    "tiktok" -> "(?i)tiktok\\.com/@([a-zA-Z0-9._]+)".r)

  final case class SocialLink(platform: String, url: String, username: String, linkText: String)

  /** Direct-link detection + dedupe by lowercase URL (:2746-2762, 2913-2922). */
  def extractSocial(doc: Doc): Seq[SocialLink] = {
    val found = doc.select("a[href]").flatMap { a =>
      val href = a.attrRaw("href")
      PlatformPatterns.flatMap { case (platform, re) =>
        re.findFirstMatchIn(href).map { m =>
          SocialLink(platform, href, m.group(1), a.text().trim)
        }
      }
    }
    // dedupe by lowercase url, first wins
    val seen = scala.collection.mutable.LinkedHashMap[String, SocialLink]()
    found.foreach { l =>
      val k = l.url.toLowerCase
      if (!seen.contains(k)) seen(k) = l
    }
    seen.values.toSeq
  }

  // ---------------- extract_feeds (:3165-3266) ----------------
  final case class FeedItem(title: String, link: String, description: String,
      pubDate: String)
  final case class Feed(url: String, feedType: String, title: String,
      description: String, items: Seq[FeedItem])

  /** Feed URLs: declared <link> tags resolved against the page, plus the
    * probed common paths (:3191-3210). */
  def discoverFeedUrls(doc: Doc, pageUrl: String): Seq[String] = {
    val declared = doc.select(
      "link[type=\"application/rss+xml\"], link[type=\"application/atom+xml\"]")
      .flatMap(_.attr("href"))
      .flatMap(h => graft.core.UrlNorm.resolve(h, pageUrl))
    val common = Seq("/rss", "/feed", "/atom.xml", "/rss.xml", "/feed.xml")
      .flatMap(p => graft.core.UrlNorm.resolve(p, pageUrl))
    (declared ++ common).distinct
  }

  /** Parse an RSS/Atom body (xmlMode cheerio equivalent: no HTML void/
    * implied-tag rules — our Html.parseXml). RSS vs Atom by `<rss`
    * substring (:3220). */
  def parseFeed(feedUrl: String, xml: String, maxItems: Int = 10): Feed = {
    val root = Html.parseXml(xml)
    def firstText(el: Element, tag: String): String =
      el.children.collectFirst {
        case e: Element if e.tag == tag => e.text().trim
      }.getOrElse("")
    val channel = root.descendants.find(e => e.tag == "channel" || e.tag == "feed")
    val items = root.descendants
      .filter(e => e.tag == "item" || e.tag == "entry").take(maxItems).toSeq
    Feed(
      url = feedUrl,
      feedType = if (xml.contains("<rss")) "RSS" else "Atom",
      title = channel.map(firstText(_, "title")).getOrElse(""),
      description = channel.map(c =>
        Seq(firstText(c, "description"), firstText(c, "subtitle"))
          .find(_.nonEmpty).getOrElse("")).getOrElse(""),
      items = items.map { it =>
        FeedItem(firstText(it, "title"),
          it.children.collectFirst {
            case e: Element if e.tag == "link" =>
              e.attr("href").getOrElse(e.text().trim)
          }.getOrElse(""),
          Seq(firstText(it, "description"), firstText(it, "summary"))
            .find(_.nonEmpty).getOrElse(""),
          Seq(firstText(it, "pubdate"), firstText(it, "published"))
            .find(_.nonEmpty).getOrElse(""))
      })
  }
}
