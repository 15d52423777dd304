package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.engine.SyntheticWeb
import graft.tools.PageTools

/** Distributed forms of the per-page tool kernels (SURVEY.md §2b/2c/2d) —
  * each tool runs as a UDF/flatMap over the synthetic pages and aggregates
  * with groupBy/explode. Queries-only (no DuckDB oracle): the scalar
  * semantics are pinned by ToolsSpec unit tests; these entries prove the
  * distributed plumbing (rows>0 gate) and give the bench surface.
  */
object ToolQueries {

  private val web = SyntheticWeb.Config(nHosts = 8, pagesPerHost = 32, megaFactor = 4)

  /** (url, html) for all OK pages of the small synthetic web. */
  private def pages(s: SparkSession): DataFrame = {
    import s.implicits._
    val urls = (0 until web.nHosts).flatMap(h =>
      (0 until SyntheticWeb.pageCount(web, h)).map(p => SyntheticWeb.pageUrl(h, p)))
    s.createDataset(urls).repartition(16).flatMap { u =>
      val fr = SyntheticWeb.fetch(web, u)
      if (fr.status == 200 && fr.contentType.contains("text/html") && fr.html.nonEmpty)
        Some((u, fr.html))
      else None
    }.toDF("url", "html")
  }

  val specs: Seq[QuerySpec] = Seq(
    // get_page_metadata: meta fields per page
    QuerySpec("q40_page_metadata", (s, _) => {
      import s.implicits._
      pages(s).as[(String, String)].map { case (u, h) =>
        val m = PageTools.pageMetadata(graft.core.Html.parse(h))
        (u, m.title, m.description, m.keywords, m.canonical, m.language)
      }.toDF("url", "title", "description", "keywords", "canonical", "language")
        .orderBy("url")
    }, None),

    // extract_links: origin-resolution variant, internal/external split
    QuerySpec("q41_links", (s, _) => {
      import s.implicits._
      pages(s).as[(String, String)].flatMap { case (u, h) =>
        PageTools.extractLinks(graft.core.Html.parse(h), u)
          .map(l => (u, l.href, l.text, l.internal))
      }.toDF("src", "href", "text", "internal")
        .groupBy(col("internal")).agg(count(lit(1)).as("n"),
          countDistinct(col("href")).as("n_distinct"))
        .orderBy(col("internal"))
    }, None),

    // extract_images
    QuerySpec("q42_images", (s, _) => {
      import s.implicits._
      pages(s).as[(String, String)].flatMap { case (u, h) =>
        PageTools.extractImages(graft.core.Html.parse(h), u)
          .map(i => (u, i.src, i.alt, i.width, i.height))
      }.toDF("url", "src", "alt", "width", "height").orderBy("url", "src")
    }, None),

    // extract_forms: exploded field rows
    QuerySpec("q43_forms", (s, _) => {
      import s.implicits._
      pages(s).as[(String, String)].flatMap { case (u, h) =>
        PageTools.extractForms(graft.core.Html.parse(h)).flatMap(f =>
          f.fields.map(fl => (u, f.action, f.method, fl.ftype, fl.name, fl.label,
            fl.options.mkString("|"))))
      }.toDF("url", "action", "method", "ftype", "name", "label", "options")
        .orderBy("url", "name")
    }, None),

    // extract_tables incl. CSV/markdown renderers
    QuerySpec("q44_tables", (s, _) => {
      import s.implicits._
      pages(s).as[(String, String)].flatMap { case (u, h) =>
        PageTools.extractTables(graft.core.Html.parse(h)).map(t =>
          (u, t.index, t.headers.mkString("|"), t.rows.length, t.columnCount,
            PageTools.tableCsv(t), PageTools.tableMarkdown(t)))
      }.toDF("url", "idx", "headers", "n_rows", "n_cols", "csv", "markdown")
        .orderBy("url", "idx")
    }, None),

    // extract_headings + per-level structure counts
    QuerySpec("q45_headings", (s, _) => {
      import s.implicits._
      pages(s).as[(String, String)].flatMap { case (u, h) =>
        PageTools.extractHeadings(graft.core.Html.parse(h))
          .map(hd => (u, hd.level, hd.index, hd.text))
      }.toDF("url", "level", "idx", "text")
        .groupBy(col("level")).agg(count(lit(1)).as("n"))
        .orderBy(col("level"))
    }, None),

    // extract_contact_info
    QuerySpec("q46_contacts", (s, _) => {
      import s.implicits._
      pages(s).as[(String, String)].flatMap { case (u, h) =>
        val c = PageTools.extractContacts(graft.core.Html.parse(h))
        if (c.emails.nonEmpty || c.phones.nonEmpty || c.addresses.nonEmpty)
          Some((u, c.emails.mkString("|"), c.phones.mkString("|"),
            c.addresses.mkString("|")))
        else None
      }.toDF("url", "emails", "phones", "addresses").orderBy("url")
    }, None),

    // extract_entities over documents.text (regex families)
    QuerySpec("q47_entities", (s, dir) => {
      import s.implicits._
      s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id").cast("long"), col("text")).as[(Long, String)]
        .map { case (id, text) =>
          val e = PageTools.extractEntities(text)
          (id, e.emails.length, e.urls.length, e.dates.length,
            e.percentages.length, e.hashtags.length)
        }.toDF("doc_id", "n_emails", "n_urls", "n_dates", "n_pct", "n_tags")
        .orderBy("doc_id")
    }, None),

    // extract_keywords (with the reference's markdown-strip quirks)
    QuerySpec("q48_keywords", (s, dir) => {
      import s.implicits._
      s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id").cast("long"), col("text")).as[(Long, String)]
        .flatMap { case (id, text) =>
          PageTools.extractKeywords(text, maxKeywords = 5)
            .map(k => (id, k.keyword, k.frequency, k.isPhrase))
        }.toDF("doc_id", "keyword", "frequency", "is_phrase")
        .orderBy("doc_id", "keyword")
    }, None),

    // classify_content (10-category keyword matching)
    QuerySpec("q49_classify", (s, dir) => {
      import s.implicits._
      s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id").cast("long"), col("text")).as[(Long, String)]
        .flatMap { case (id, text) =>
          PageTools.classify(text).map(c => (id, c.category, c.matches))
        }.toDF("doc_id", "category", "matches")
        .groupBy(col("category")).agg(count(lit(1)).as("n_docs"),
          sum(col("matches")).as("total_matches"))
        .orderBy(col("category"))
    }, None),

    // validate_html + detect_tracking + scan_vulnerabilities (DOM audits)
    QuerySpec("q50_html_audit", (s, _) => {
      import s.implicits._
      pages(s).as[(String, String)].map { case (u, h) =>
        val doc = graft.core.Html.parse(h)
        val v = PageTools.validateHtml(doc)
        val t = PageTools.detectTracking(h, doc)
        val vs = PageTools.scanVulnerabilities(h, doc, u)
        (u, v.hasTitle, v.h1Count, v.imagesWithoutAlt, v.score,
          t.privacyScore, vs.inlineScripts, vs.score)
      }.toDF("url", "has_title", "h1_count", "img_no_alt", "html_score",
          "privacy_score", "inline_scripts", "vuln_score")
        .orderBy("url")
    }, None),

    // compare_content (:2307-2395): pairwise page compare on url pairs
    QuerySpec("q51_compare", (s, _) => {
      import s.implicits._
      val p = pages(s).as[(String, String)]
        .map { case (u, h) =>
          val e = graft.core.Extract.extract(h, u, 0L,
            graft.core.Extract.Options(format = "text"))
          (u, e.title, e.content, e.wordCount)
        }.toDF("url", "title", "text", "word_count")
      // pair pages within the same host group: the group key is the JOIN key
      // (hash/sort-merge equi-join), `<` is a post-join filter — a theta-only
      // join would plan as BroadcastNestedLoop (cartesian at scale)
      val keyed = p.withColumn("grp", substring(col("url"), 12, 1))
      val a = keyed.select(col("grp"), col("url").as("url_a"),
        col("title").as("title_a"), col("text").as("text_a"))
      val b = keyed.select(col("grp"), col("url").as("url_b"),
        col("title").as("title_b"), col("text").as("text_b"))
      val sim = udf((x: String, y: String) =>
        math.round(PageTools.textSimilarity(x, y) * 10000))
      a.join(b, Seq("grp"))
        .filter(col("url_a") < col("url_b"))
        .withColumn("jaccard_x10000", sim(col("text_a"), col("text_b")))
        .select(col("url_a"), col("url_b"),
          (col("title_a") === col("title_b")).as("title_match"),
          col("jaccard_x10000"))
        .orderBy(col("url_a"), col("url_b"))
    }, None),

    // monitor_changes (:3268-3347): snapshot-over-snapshot md5 + similarity
    QuerySpec("q52_monitor_changes", (s, _) => {
      import s.implicits._
      val curr = pages(s).as[(String, String)].map { case (u, h) =>
        val t = graft.core.Extract.extract(h, u, 0L,
          graft.core.Extract.Options(format = "text")).content
        (u, t)
      }.toDF("url", "text")
      // previous snapshot simulated as a deterministic subset with edits
      val prev = curr.withColumn("text",
        when(xxhash64(col("url")) % 5 === 0,
          concat(col("text"), lit(" edited section"))).otherwise(col("text")))
      val sim = udf((x: String, y: String) =>
        math.round(PageTools.textSimilarity(x, y) * 10000))
      curr.as("c").join(prev.as("p"), "url")
        .select(col("url"),
          md5(col("c.text").cast("binary")).as("curr_md5"),
          md5(col("p.text").cast("binary")).as("prev_md5"),
          sim(col("c.text"), col("p.text")).as("similarity_x10000"))
        .withColumn("changed", col("curr_md5") =!= col("prev_md5"))
        .filter(col("changed"))
        .orderBy(col("url"))
    }, None),

    // SIM-family deterministic stand-ins (§2d): pdf page estimate +
    // translate tagging, as a distributed projection
    QuerySpec("q53_sim_standins", (s, dir) => {
      import s.implicits._
      s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id").cast("long"), col("text")).as[(Long, String)]
        .map { case (id, text) =>
          val wc = graft.core.Extract.countWords(text)
          (id, wc, PageTools.pdfPageCount(wc),
            PageTools.translateStandIn(text, "es").take(12))
        }.toDF("doc_id", "word_count", "pdf_pages", "translated_prefix")
        .orderBy("doc_id")
    }, None)
  )
}
