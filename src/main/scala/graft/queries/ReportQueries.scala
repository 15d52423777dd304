package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.engine.SyntheticWeb
import graft.tools.PageTools

/** Remaining §2c/§2d operator shapes: week-over-week trend windows
  * (analyze_traffic_patterns, server.ts:6403-6408), meta-tag generation
  * (:5036-5181), competitor stat averaging (:4506-4624), report
  * composition (:6665-6940), embedding-cosine near-dup, and the
  * cache-as-catalog resources surface (server.ts:1407-1454).
  */
object ReportQueries {

  private val web = SyntheticWeb.Config(nHosts = 8, pagesPerHost = 32, megaFactor = 4)

  private def okPages(s: org.apache.spark.sql.SparkSession) = {
    import s.implicits._
    s.createDataset((0 until web.nHosts).flatMap(h =>
      (0 until 24).map(p => SyntheticWeb.pageUrl(h, p)))).repartition(16)
      .flatMap { u =>
        val fr = SyntheticWeb.fetch(web, u)
        if (fr.status == 200 && fr.contentType.contains("text/html") && fr.html.nonEmpty)
          Some((u, fr.html))
        else None
      }.toDF("url", "html")
  }

  val specs: Seq[QuerySpec] = Seq(
    // analyze_traffic_patterns: daily series + week-over-week lag trend —
    // SQL-oracled (the reference's data is SIM; the aggregation shape is
    // what we reproduce, over the real events table)
    QuerySpec("q65_traffic_wow",
      (s, dir) => {
        val e = s.read.parquet(s"$dir/events.parquet")
        val daily = e.groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
          .agg(count(lit(1)).as("n"),
            round(sum(col("value")) * 100).cast("long").as("value_cents"))
        val w = Window.orderBy(col("day"))
        daily
          .withColumn("n_prev_week", lag(col("n"), 7).over(w))
          .withColumn("wow_delta",
            when(col("n_prev_week").isNotNull, col("n") - col("n_prev_week")))
          .orderBy(col("day"))
      },
      Some("""SELECT day, n, value_cents,
             |       lag(n, 7) OVER (ORDER BY day) AS n_prev_week,
             |       CASE WHEN lag(n, 7) OVER (ORDER BY day) IS NOT NULL
             |            THEN n - lag(n, 7) OVER (ORDER BY day) END AS wow_delta
             |FROM (SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS n,
             |             CAST(round(sum(value)*100) AS BIGINT) AS value_cents
             |      FROM events GROUP BY 1)
             |ORDER BY day""".stripMargin)),

    // generate_meta_tags (server.ts:5097-5169): og/twitter/basic tag
    // strings templated from extracted metadata + keyword core
    QuerySpec("q66_meta_tags", (s, _) => {
      import s.implicits._
      okPages(s).as[(String, String)].map { case (u, h) =>
        val doc = graft.core.Html.parse(h)
        val m = PageTools.pageMetadata(doc)
        val kws = PageTools.extractKeywords(
          graft.core.Extract.extract(h, u, 0L,
            graft.core.Extract.Options(format = "text")).content,
          maxKeywords = 10, includePhrases = false)
        val titleOk = m.title.length >= 30 && m.title.length <= 60
        val descOk = m.description.length >= 120 && m.description.length <= 160
        val seoScore = (if (titleOk) 25 else 10) + (if (descOk) 25 else 10) +
          (if (kws.nonEmpty) 25 else 0) + (if (m.canonical.nonEmpty) 25 else 0)
        (u,
          s"""<meta property="og:title" content="${m.title}"/>""",
          s"""<meta name="twitter:card" content="summary"/>""",
          s"""<meta name="keywords" content="${kws.map(_.keyword).mkString(", ")}"/>""",
          titleOk, descOk, seoScore)
      }.toDF("url", "og_tag", "twitter_tag", "keywords_tag",
          "title_len_ok", "desc_len_ok", "seo_score")
        .orderBy("url")
    }, None),

    // analyze_competitors (server.ts:4525-4567): per-URL stats struct +
    // cross-competitor averages
    QuerySpec("q67_competitors", (s, _) => {
      import s.implicits._
      val stats = okPages(s).as[(String, String)].map { case (u, h) =>
        val doc = graft.core.Html.parse(h)
        val e = graft.core.Extract.extract(h, u, 0L,
          graft.core.Extract.Options(format = "text"))
        val host = graft.core.UrlNorm.host(u).getOrElse("")
        (host, u, e.wordCount,
          PageTools.extractHeadings(doc).size,
          PageTools.extractImages(doc, u).size,
          PageTools.extractLinks(doc, u).size)
      }.toDF("host", "url", "word_count", "n_headings", "n_images", "n_links")
      stats.groupBy(col("host"))
        .agg(count(lit(1)).as("n_pages"),
          round(avg(col("word_count")), 1).cast("double").as("avg_words"),
          round(avg(col("n_headings")), 1).as("avg_headings"),
          round(avg(col("n_links")), 1).as("avg_links"))
        .orderBy(col("host"))
    }, None),

    // generate_reports (server.ts:6692-6910): composed seo/perf/security
    // sections per page, rendered as a markdown report string
    QuerySpec("q68_reports", (s, _) => {
      import s.implicits._
      okPages(s).as[(String, String)].map { case (u, h) =>
        val doc = graft.core.Html.parse(h)
        val v = PageTools.validateHtml(doc)
        val t = PageTools.detectTracking(h, doc)
        val vs = PageTools.scanVulnerabilities(h, doc, u)
        val md =
          s"""# Report for $u
             |## SEO
             |- title: ${v.hasTitle}, h1s: ${v.h1Count}
             |## Security
             |- score: ${vs.score}, inline scripts: ${vs.inlineScripts}
             |## Privacy
             |- score: ${t.privacyScore}""".stripMargin
        (u, v.score, vs.score, t.privacyScore, md)
      }.toDF("url", "html_score", "security_score", "privacy_score", "report_md")
        .orderBy("url")
    }, None),

    // embedding-cosine near-dup: pairs above 0.95 via LSH buckets + exact
    // cosine confirm (the embedding leg of the dedup family)
    QuerySpec("q23_embedding_dup", (s, dir) => {
      val e = s.read.parquet(s"$dir/embeddings.parquet")
        .withColumn("sig", SimilarityQueries.rhpSignature(col("embedding"), 16))
      val banded = e.select(col("vec_id"), col("embedding"), posexplode(
        array((0 until 4).map(b =>
          shiftrightunsigned(col("sig"), b * 4).bitwiseAND(0xFL)): _*)))
        .withColumnRenamed("pos", "band_id").withColumnRenamed("col", "bucket")
      val a = banded.select(col("band_id"), col("bucket"),
        col("vec_id").as("id_a"), col("embedding").as("va"))
      val b = banded.select(col("band_id"), col("bucket"),
        col("vec_id").as("id_b"), col("embedding").as("vb"))
      a.join(b, Seq("band_id", "bucket"))
        .filter(col("id_a") < col("id_b"))
        .dropDuplicates("id_a", "id_b")
        .withColumn("sim", SimilarityQueries.cosine(col("va"), col("vb")))
        // threshold sits in the top tail of this corpus's cosine
        // distribution (max observed ~0.44; a real near-dup corpus would
        // use ~0.95) so the operator is exercised non-vacuously
        .filter(col("sim") >= 0.40)
        .select(col("id_a"), col("id_b"),
          round(col("sim") * 10000).cast("long").as("sim_x10000"))
        .orderBy(col("id_a"), col("id_b"))
    }, None),

    // resources/list catalog surface (server.ts:1407-1419): the pages
    // table as a listable catalog with cache:// URIs + re-extract on read
    QuerySpec("q69_catalog", (s, _) => {
      import s.implicits._
      okPages(s).as[(String, String)].map { case (u, h) =>
        val e = graft.core.Extract.extract(h, u, 0L,
          graft.core.Extract.Options(format = "text"))
        ("cache://" + java.net.URLEncoder.encode(u, "UTF-8"),
          e.title, e.wordCount, h.getBytes("UTF-8").length)
      }.toDF("resource_uri", "title", "word_count", "size_bytes")
        .orderBy("resource_uri")
    }, None)
  )
}
