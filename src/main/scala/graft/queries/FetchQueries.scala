package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.engine.SyntheticWeb
import graft.tools.{PageTools, StructuredData}

/** Fetch-pipeline + structured-data query pack: the remaining §2a/§2b ops —
  * url status checks, batch extract, broken-link checks, the cache/
  * conditional-GET (304) path, structured data, social links, feeds.
  *
  * Each query materializes its kernel rows ([[OracleMat]]); DuckDB
  * recomputes the downstream aggregation — and for batch_extract the word
  * count is INDEPENDENTLY recomputed from the materialized text, so the
  * extract kernel's countWords is cross-engine-verified, not round-tripped.
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
    // check_url_status (server.ts:1638-1697): status/content-type per url;
    // the oracle recomputes the per-status rollup
    QuerySpec("q57_url_status", (s, _) => {
      import s.implicits._
      val kernel = urls(s).map { u =>
        val fr = SyntheticWeb.fetch(web, u)
        (u, fr.status, fr.contentType, fr.sizeBytes)
      }.toDF("url", "status", "content_type", "size_bytes")
      OracleMat(s, "q57")(kernel)
        .groupBy(col("status"), col("content_type"))
        .agg(count(lit(1)).as("n"), sum(col("size_bytes")).cast("long").as("bytes"))
        .orderBy(col("status"), col("content_type"))
    }, Some(s"""SELECT status, content_type, count(*) AS n,
               |       CAST(sum(size_bytes) AS BIGINT) AS bytes
               |FROM ${OracleMat.src("q57")}
               |GROUP BY status, content_type
               |ORDER BY status, content_type""".stripMargin)),

    // batch_extract (server.ts:2397-2489): per-URL error rows kept; the
    // oracle independently recounts words from the materialized text
    QuerySpec("q58_batch_extract", (s, _) => {
      import s.implicits._
      val kernel = urls(s).map { u =>
        val fr = SyntheticWeb.fetch(web, u)
        if (fr.status == 200 && fr.contentType.contains("text/html") && fr.html.nonEmpty) {
          val e = graft.core.Extract.extract(fr.html, u, 0L,
            graft.core.Extract.Options(format = "text"))
          (u, true, e.title, e.content, e.wordCount, "")
        } else (u, false, "", "", 0, s"HTTP_${fr.status}")
      }.toDF("url", "success", "title", "text", "word_count", "error")
      OracleMat(s, "q58")(kernel)
        .select(col("url"), col("success"), col("title"), col("word_count"),
          col("error"))
        .orderBy("url")
    }, Some(s"""SELECT url, success, title,
               |       CASE WHEN success
               |            THEN len(list_filter(regexp_split_to_array(text, '\\s+'),
               |                     x -> x <> ''))
               |            ELSE 0 END AS word_count,
               |       error
               |FROM ${OracleMat.src("q58")} ORDER BY url""".stripMargin)),

    // check_broken_links (server.ts:4781-4914): extract+dedupe links, then
    // check each target's status (real fetch, not the reference's SIM rand)
    QuerySpec("q59_broken_links", (s, _) => {
      import s.implicits._
      val targets = okPages(s).as[(String, String)].flatMap { case (u, h) =>
        SyntheticWeb.pageLinks(h, u, sameHostOnly = false).map(dst => (u, dst))
      }.toDF("src", "dst").dropDuplicates("dst")
      val kernel = targets.as[(String, String)].map { case (_, dst) =>
        val fr = SyntheticWeb.fetch(web, dst)
        (dst, fr.status, fr.status >= 400)
      }.toDF("dst", "status", "broken")
      OracleMat(s, "q59")(kernel)
        .groupBy(col("broken")).agg(count(lit(1)).as("n"),
          countDistinct(col("status")).as("n_statuses"))
        .orderBy(col("broken"))
    }, Some(s"""SELECT broken, count(*) AS n,
               |       count(DISTINCT status) AS n_statuses
               |FROM ${OracleMat.src("q59")}
               |GROUP BY broken ORDER BY broken""".stripMargin)),

    // cache lookup + conditional GET 304 path (fetch.ts:136-199): second
    // crawl round joins the cached (url, etag); unchanged etag ⇒ 304 ⇒
    // served from cache. The JOIN + from_cache derivation + rollup are all
    // recomputed by the oracle from the two materialized rounds.
    QuerySpec("q60_recrawl_304", (s, _) => {
      import s.implicits._
      val first = OracleMat(s, "q60_first")(urls(s).map { u =>
        val fr = SyntheticWeb.fetch(web, u); (u, fr.etag)
      }.toDF("url", "etag"))
      val second = OracleMat(s, "q60_second")(urls(s).map { u =>
        val fr = SyntheticWeb.fetch(web, u); (u, fr.etag, fr.status)
      }.toDF("url", "etag2", "status"))
      second.join(first, Seq("url"), "left")
        .withColumn("from_cache",
          col("etag").isNotNull && col("etag") === col("etag2") && col("status") === 200)
        .groupBy(col("from_cache")).agg(count(lit(1)).as("n"))
        .orderBy(col("from_cache"))
    }, Some(s"""SELECT (f.etag IS NOT NULL AND f.etag = s.etag2 AND s.status = 200)
               |         AS from_cache,
               |       count(*) AS n
               |FROM ${OracleMat.src("q60_second")} s
               |LEFT JOIN ${OracleMat.src("q60_first")} f USING (url)
               |GROUP BY 1 ORDER BY from_cache""".stripMargin)),

    // extract_structured_data (server.ts:2015-2305); the reference's score
    // formula min(100, items*10 + types*5) (:2271) recomputed by the oracle
    // from the materialized counts
    QuerySpec("q54_structured_data", (s, _) => {
      import s.implicits._
      val kernel = okPages(s).as[(String, String)].map { case (u, h) =>
        val sd = StructuredData.extract(graft.core.Html.parse(h))
        (u, sd.jsonLdCount, sd.ogCount, sd.microdataCount, sd.rdfaCount,
          sd.schemaTypes.mkString("|"), sd.schemaTypes.length, sd.totalItems, sd.score)
      }.toDF("url", "json_ld", "og", "microdata", "rdfa", "schema_types",
          "n_types", "total_items", "score")
      OracleMat(s, "q54")(kernel)
        .filter(col("total_items") > 0)
        .orderBy("url")
    }, Some(s"""SELECT url, json_ld, og, microdata, rdfa, schema_types,
               |       n_types, total_items,
               |       least(100, total_items * 10 + n_types * 5) AS score
               |FROM ${OracleMat.src("q54")}
               |WHERE total_items > 0 ORDER BY url""".stripMargin)),

    // extract_social_media (server.ts:2690-2949)
    QuerySpec("q55_social", (s, _) => {
      import s.implicits._
      val kernel = okPages(s).as[(String, String)].flatMap { case (u, h) =>
        StructuredData.extractSocial(graft.core.Html.parse(h))
          .map(l => (u, l.platform, l.username, l.url))
      }.toDF("url", "platform", "username", "link")
      OracleMat(s, "q55")(kernel)
        .groupBy(col("platform")).agg(count(lit(1)).as("n"),
          countDistinct(col("username")).as("n_users"))
        .orderBy(col("platform"))
    }, Some(s"""SELECT platform, count(*) AS n,
               |       count(DISTINCT username) AS n_users
               |FROM ${OracleMat.src("q55")}
               |GROUP BY platform ORDER BY platform""".stripMargin)),

    // extract_feeds (server.ts:3165-3266): discover → fetch → XML parse;
    // per-feed rollup recomputed by the oracle from materialized items
    QuerySpec("q56_feeds", (s, _) => {
      import s.implicits._
      val kernel = okPages(s).as[(String, String)].flatMap { case (u, h) =>
        StructuredData.discoverFeedUrls(graft.core.Html.parse(h), u)
      }.distinct().flatMap { feedUrl =>
        val fr = SyntheticWeb.fetch(web, feedUrl)
        if (fr.status == 200 && fr.html.nonEmpty && !fr.contentType.contains("text/html")) {
          val f = StructuredData.parseFeed(feedUrl, fr.html)
          f.items.map(i => (feedUrl, f.feedType, f.title, i.title, i.link, i.pubDate))
        } else Seq.empty
      }.toDF("feed_url", "type", "feed_title", "item_title", "item_link", "pub_date")
      OracleMat(s, "q56")(kernel)
        .groupBy(col("feed_url"), col("type"), col("feed_title"))
        .agg(count(lit(1)).as("n_items"),
          countDistinct(col("item_link")).as("n_links"),
          max(col("pub_date")).as("latest_pub"))
        .orderBy("feed_url")
    }, Some(s"""SELECT feed_url, type, feed_title, count(*) AS n_items,
               |       count(DISTINCT item_link) AS n_links,
               |       max(pub_date) AS latest_pub
               |FROM ${OracleMat.src("q56")}
               |GROUP BY feed_url, type, feed_title
               |ORDER BY feed_url""".stripMargin))
  )
}
