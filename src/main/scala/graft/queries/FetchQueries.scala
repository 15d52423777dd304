package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.engine.SyntheticWeb
import graft.tools.{PageTools, StructuredData}

/** Fetch-pipeline + structured-data query pack: the remaining §2a/§2b ops —
  * url status checks, batch extract, broken-link checks, the cache/
  * conditional-GET (304) path, structured data, social links, feeds.
  */
object FetchQueries {

  private val web = SyntheticWeb.Config(nHosts = 8, pagesPerHost = 32, megaFactor = 4)

  private def urls(s: SparkSession, perHost: Int = 24) = {
    import s.implicits._
    s.createDataset((0 until web.nHosts).flatMap(h =>
      (0 until perHost).map(p => SyntheticWeb.pageUrl(h, p)))).repartition(16)
  }

  private def okPages(s: SparkSession) = {
    import s.implicits._
    urls(s).flatMap { u =>
      val fr = SyntheticWeb.fetch(web, u)
      if (fr.status == 200 && fr.contentType.contains("text/html") && fr.html.nonEmpty)
        Some((u, fr.html))
      else None
    }.toDF("url", "html")
  }

  val specs: Seq[QuerySpec] = Seq(
    // check_url_status (server.ts:1638-1697): status/content-type per url
    QuerySpec("q57_url_status", (s, _) => {
      import s.implicits._
      urls(s).map { u =>
        val fr = SyntheticWeb.fetch(web, u)
        (u, fr.status, fr.contentType, fr.sizeBytes)
      }.toDF("url", "status", "content_type", "size_bytes")
        .groupBy(col("status"), col("content_type"))
        .agg(count(lit(1)).as("n"), sum(col("size_bytes")).as("bytes"))
        .orderBy(col("status"), col("content_type"))
    }, None),

    // batch_extract (server.ts:2397-2489): per-URL error rows kept
    QuerySpec("q58_batch_extract", (s, _) => {
      import s.implicits._
      urls(s).map { u =>
        val fr = SyntheticWeb.fetch(web, u)
        if (fr.status == 200 && fr.contentType.contains("text/html") && fr.html.nonEmpty) {
          val e = graft.core.Extract.extract(fr.html, u, 0L,
            graft.core.Extract.Options(format = "text"))
          (u, true, e.title, e.wordCount, "")
        } else (u, false, "", 0, s"HTTP_${fr.status}")
      }.toDF("url", "success", "title", "word_count", "error")
        .orderBy("url")
    }, None),

    // check_broken_links (server.ts:4781-4914): extract+dedupe links, then
    // check each target's status (real fetch, not the reference's SIM rand)
    QuerySpec("q59_broken_links", (s, _) => {
      import s.implicits._
      val targets = okPages(s).as[(String, String)].flatMap { case (u, h) =>
        SyntheticWeb.pageLinks(h, u, sameHostOnly = false).map(dst => (u, dst))
      }.toDF("src", "dst").dropDuplicates("dst")
      targets.as[(String, String)].map { case (src, dst) =>
        val fr = SyntheticWeb.fetch(web, dst)
        (dst, fr.status, fr.status >= 400)
      }.toDF("dst", "status", "broken")
        .groupBy(col("broken")).agg(count(lit(1)).as("n"))
        .orderBy(col("broken"))
    }, None),

    // cache lookup + conditional GET 304 path (fetch.ts:136-199): second
    // crawl round joins the cached (url, etag); unchanged etag ⇒ 304 ⇒
    // served from cache
    QuerySpec("q60_recrawl_304", (s, _) => {
      import s.implicits._
      val first = urls(s).map { u =>
        val fr = SyntheticWeb.fetch(web, u); (u, fr.etag)
      }.toDF("url", "etag")
      val second = urls(s).map { u =>
        val fr = SyntheticWeb.fetch(web, u); (u, fr.etag, fr.status)
      }.toDF("url", "etag2", "status")
      second.join(first, Seq("url"), "left")
        .withColumn("from_cache",
          col("etag").isNotNull && col("etag") === col("etag2") && col("status") === 200)
        .groupBy(col("from_cache")).agg(count(lit(1)).as("n"))
        .orderBy(col("from_cache"))
    }, None),

    // extract_structured_data (server.ts:2015-2305)
    QuerySpec("q54_structured_data", (s, _) => {
      import s.implicits._
      okPages(s).as[(String, String)].map { case (u, h) =>
        val sd = StructuredData.extract(graft.core.Html.parse(h))
        (u, sd.jsonLdCount, sd.ogCount, sd.microdataCount, sd.rdfaCount,
          sd.schemaTypes.mkString("|"), sd.totalItems, sd.score)
      }.toDF("url", "json_ld", "og", "microdata", "rdfa", "schema_types",
          "total_items", "score")
        .filter(col("total_items") > 0)
        .orderBy("url")
    }, None),

    // extract_social_media (server.ts:2690-2949)
    QuerySpec("q55_social", (s, _) => {
      import s.implicits._
      okPages(s).as[(String, String)].flatMap { case (u, h) =>
        StructuredData.extractSocial(graft.core.Html.parse(h))
          .map(l => (u, l.platform, l.username, l.url))
      }.toDF("url", "platform", "username", "link")
        .groupBy(col("platform")).agg(count(lit(1)).as("n"),
          countDistinct(col("username")).as("n_users"))
        .orderBy(col("platform"))
    }, None),

    // extract_feeds (server.ts:3165-3266): discover → fetch → XML parse
    QuerySpec("q56_feeds", (s, _) => {
      import s.implicits._
      okPages(s).as[(String, String)].flatMap { case (u, h) =>
        StructuredData.discoverFeedUrls(graft.core.Html.parse(h), u)
      }.distinct().flatMap { feedUrl =>
        val fr = SyntheticWeb.fetch(web, feedUrl)
        if (fr.status == 200 && fr.html.nonEmpty && !fr.contentType.contains("text/html")) {
          val f = StructuredData.parseFeed(feedUrl, fr.html)
          f.items.map(i => (feedUrl, f.feedType, f.title, i.title, i.link, i.pubDate))
        } else Seq.empty
      }.toDF("feed_url", "type", "feed_title", "item_title", "item_link", "pub_date")
        .orderBy("feed_url", "item_title")
    }, None)
  )
}
