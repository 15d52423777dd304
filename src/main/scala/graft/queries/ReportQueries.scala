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
        val daily = e.groupBy(col("event_type"),
            date_format(col("ts"), "yyyy-MM-dd").as("day"))
          .agg(count(lit(1)).as("n"),
            round(sum(col("value")) * 100).cast("long").as("value_cents"))
        // window partitioned by the series key — a global ORDER BY-only
        // window pulls every row into one partition (scale-killer on a
        // years-long series); per-type partitions shuffle-scale instead
        val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
        daily
          .withColumn("n_prev_week", lag(col("n"), 7).over(w))
          .withColumn("wow_delta",
            when(col("n_prev_week").isNotNull, col("n") - col("n_prev_week")))
          .orderBy(col("event_type"), col("day"))
      },
      Some("""SELECT event_type, day, n, value_cents,
             |       lag(n, 7) OVER (PARTITION BY event_type ORDER BY day) AS n_prev_week,
             |       CASE WHEN lag(n, 7) OVER (PARTITION BY event_type ORDER BY day) IS NOT NULL
             |            THEN n - lag(n, 7) OVER (PARTITION BY event_type ORDER BY day) END AS wow_delta
             |FROM (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, count(*) AS n,
             |             CAST(round(sum(value)*100) AS BIGINT) AS value_cents
             |      FROM events GROUP BY 1, 2)
             |ORDER BY event_type, day""".stripMargin)),

    // generate_meta_tags (server.ts:5097-5169): og/twitter/basic tag
    // strings templated from extracted metadata + keyword core. Raw kernel
    // fields are materialized; the TAG TEMPLATING, the length bands and the
    // seoScore formula (:5164-5169) are computed as Spark SQL expressions
    // and independently recomputed by DuckDB.
    QuerySpec("q66_meta_tags", (s, _) => {
      import s.implicits._
      val kernel = okPages(s).as[(String, String)].map { case (u, h) =>
        val doc = graft.core.Html.parse(h)
        val m = PageTools.pageMetadata(doc)
        val kws = PageTools.extractKeywords(
          graft.core.Extract.extract(h, u, 0L,
            graft.core.Extract.Options(format = "text")).content,
          maxKeywords = 10, includePhrases = false)
        (u, m.title, m.description, m.canonical, kws.map(_.keyword).mkString(", "))
      }.toDF("url", "title", "description", "canonical", "keywords_csv")
      OracleMat(s, "q66")(kernel)
        .select(col("url"),
          concat(lit("<meta property=\"og:title\" content=\""), col("title"),
            lit("\"/>")).as("og_tag"),
          concat(lit("<meta name=\"keywords\" content=\""), col("keywords_csv"),
            lit("\"/>")).as("keywords_tag"),
          length(col("title")).between(30, 60).as("title_len_ok"),
          length(col("description")).between(120, 160).as("desc_len_ok"),
          (when(length(col("title")).between(30, 60), 25).otherwise(10) +
            when(length(col("description")).between(120, 160), 25).otherwise(10) +
            when(col("keywords_csv") =!= "", 25).otherwise(0) +
            when(col("canonical") =!= "", 25).otherwise(0)).as("seo_score"))
        .orderBy("url")
    }, Some(s"""SELECT url,
               |  '<meta property="og:title" content="' || title || '"/>' AS og_tag,
               |  '<meta name="keywords" content="' || keywords_csv || '"/>' AS keywords_tag,
               |  length(title) BETWEEN 30 AND 60 AS title_len_ok,
               |  length(description) BETWEEN 120 AND 160 AS desc_len_ok,
               |  (CASE WHEN length(title) BETWEEN 30 AND 60 THEN 25 ELSE 10 END +
               |   CASE WHEN length(description) BETWEEN 120 AND 160 THEN 25 ELSE 10 END +
               |   CASE WHEN keywords_csv <> '' THEN 25 ELSE 0 END +
               |   CASE WHEN canonical <> '' THEN 25 ELSE 0 END) AS seo_score
               |FROM ${OracleMat.src("q66")} ORDER BY url""".stripMargin)),

    // analyze_competitors (server.ts:4525-4567): per-URL stats struct +
    // cross-competitor averages, recomputed by the oracle (averages of
    // integer stats are exact in both engines; surfaced as x10 ints)
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
      OracleMat(s, "q67")(stats)
        .groupBy(col("host"))
        .agg(count(lit(1)).as("n_pages"),
          round(avg(col("word_count")) * 10).cast("long").as("avg_words_x10"),
          round(avg(col("n_headings")) * 10).cast("long").as("avg_headings_x10"),
          round(avg(col("n_links")) * 10).cast("long").as("avg_links_x10"))
        .orderBy(col("host"))
    }, Some(s"""SELECT host, count(*) AS n_pages,
               |       CAST(round(avg(word_count) * 10) AS BIGINT) AS avg_words_x10,
               |       CAST(round(avg(n_headings) * 10) AS BIGINT) AS avg_headings_x10,
               |       CAST(round(avg(n_links) * 10) AS BIGINT) AS avg_links_x10
               |FROM ${OracleMat.src("q67")}
               |GROUP BY host ORDER BY host""".stripMargin)),

    // generate_reports (server.ts:6692-6910): composed seo/perf/security
    // sections per page rendered as a markdown report string — the
    // TEMPLATING ITSELF is the distributed computation, so both engines
    // rebuild report_md from the materialized audit scores
    QuerySpec("q68_reports", (s, _) => {
      import s.implicits._
      val kernel = okPages(s).as[(String, String)].map { case (u, h) =>
        val doc = graft.core.Html.parse(h)
        val v = PageTools.validateHtml(doc)
        val t = PageTools.detectTracking(h, doc)
        val vs = PageTools.scanVulnerabilities(h, doc, u)
        (u, v.score, v.hasTitle, v.h1Count, vs.score, vs.inlineScripts,
          t.privacyScore)
      }.toDF("url", "html_score", "has_title", "h1_count", "security_score",
        "inline_scripts", "privacy_score")
      OracleMat(s, "q68")(kernel)
        .select(col("url"), col("html_score"), col("security_score"),
          col("privacy_score"),
          concat(
            lit("# Report for "), col("url"),
            lit("\n## SEO\n- title: "), col("has_title").cast("string"),
            lit(", h1s: "), col("h1_count").cast("string"),
            lit("\n## Security\n- score: "), col("security_score").cast("string"),
            lit(", inline scripts: "), col("inline_scripts").cast("string"),
            lit("\n## Privacy\n- score: "), col("privacy_score").cast("string"))
            .as("report_md"))
        .orderBy("url")
    }, Some(s"""SELECT url, html_score, security_score, privacy_score,
               |  '# Report for ' || url ||
               |  chr(10) || '## SEO' || chr(10) || '- title: ' || CAST(has_title AS VARCHAR) ||
               |  ', h1s: ' || CAST(h1_count AS VARCHAR) ||
               |  chr(10) || '## Security' || chr(10) || '- score: ' || CAST(security_score AS VARCHAR) ||
               |  ', inline scripts: ' || CAST(inline_scripts AS VARCHAR) ||
               |  chr(10) || '## Privacy' || chr(10) || '- score: ' || CAST(privacy_score AS VARCHAR)
               |  AS report_md
               |FROM ${OracleMat.src("q68")} ORDER BY url""".stripMargin)),

    // generate_reports html/json render variants (server.ts:6844-6910; q68
    // pins the markdown render). Same deterministic report content; the
    // reportId is a per-url hash stand-in for the reference's random id and
    // generatedAt is the injected epoch clock. Both render templates are
    // string-assembled in the query layer so the DuckDB oracle rebuilds
    // them character-for-character (structural template: header block,
    // overall score line, data section, recommendations list; the
    // reference's static CSS block is elided from the stand-in)
    QuerySpec("q86_report_renders", (s, _) => {
      import s.implicits._
      val kernel = okPages(s).as[(String, String)].map { case (u, h) =>
        val doc = graft.core.Html.parse(h)
        val v = PageTools.validateHtml(doc)
        val t = PageTools.detectTracking(h, doc)
        val vs = PageTools.scanVulnerabilities(h, doc, u)
        val rid = "report_" + java.lang.Math.floorMod(
          graft.core.UrlNorm.xxh64(u.getBytes("UTF-8"), 86L), 100000000L)
        (u, rid, v.score, v.h1Count, vs.score, vs.inlineScripts, t.privacyScore)
      }.toDF("url", "report_id", "html_score", "h1_count", "security_score",
        "inline_scripts", "privacy_score")
      val overall = round(
        (col("html_score") + col("security_score") + col("privacy_score")) / lit(3.0))
        .cast("long")
      val recsLi = concat(
        when(col("h1_count") === 0, "<li>Add an H1 heading</li>").otherwise(""),
        when(col("inline_scripts") > 0,
          "<li>Move inline scripts to external files</li>").otherwise(""),
        when(col("privacy_score") < 80, "<li>Reduce tracking scripts</li>").otherwise(""))
      OracleMat(s, "q86")(kernel)
        .withColumn("overall_score", overall)
        .withColumn("report_json", concat(
          lit("{\n  \"reportId\": \""), col("report_id"),
          lit("\",\n  \"url\": \""), col("url"),
          lit("\",\n  \"generatedAt\": \"1970-01-01T00:00:00.000Z\",\n  \"type\": \"Comprehensive Analysis Report\",\n  \"overallScore\": "),
          col("overall_score").cast("string"), lit("\n}")))
        .withColumn("report_html", concat(
          lit("<!DOCTYPE html>\n<html>\n<head>\n    <title>Comprehensive Analysis Report</title>\n</head>\n<body>\n    <div class=\"header\">\n        <h1>Comprehensive Analysis Report</h1>\n        <p><strong>URL:</strong> "),
          col("url"),
          lit("</p>\n        <p><strong>Generated:</strong> 1970-01-01T00:00:00.000Z</p>\n        <p class=\"score\">Overall Score: "),
          col("overall_score").cast("string"),
          lit("/100</p>\n    </div>\n    <div class=\"section recommendations\">\n        <h2>Recommendations</h2>\n        <ul>"),
          recsLi,
          lit("</ul>\n    </div>\n</body>\n</html>")))
        .select("url", "report_id", "overall_score", "report_json", "report_html")
        .orderBy("url")
    }, Some(s"""WITH k AS (
               |  SELECT *,
               |         CAST(round((html_score + security_score + privacy_score) / 3.0)
               |              AS BIGINT) AS overall_score,
               |         (CASE WHEN h1_count = 0 THEN '<li>Add an H1 heading</li>' ELSE '' END ||
               |          CASE WHEN inline_scripts > 0 THEN '<li>Move inline scripts to external files</li>' ELSE '' END ||
               |          CASE WHEN privacy_score < 80 THEN '<li>Reduce tracking scripts</li>' ELSE '' END)
               |           AS recs_li
               |  FROM ${OracleMat.src("q86")})
               |SELECT url, report_id, overall_score,
               |  '{' || chr(10) || '  "reportId": "' || report_id || '",' || chr(10) ||
               |  '  "url": "' || url || '",' || chr(10) ||
               |  '  "generatedAt": "1970-01-01T00:00:00.000Z",' || chr(10) ||
               |  '  "type": "Comprehensive Analysis Report",' || chr(10) ||
               |  '  "overallScore": ' || CAST(overall_score AS VARCHAR) || chr(10) || '}'
               |    AS report_json,
               |  '<!DOCTYPE html>' || chr(10) || '<html>' || chr(10) || '<head>' || chr(10) ||
               |  '    <title>Comprehensive Analysis Report</title>' || chr(10) || '</head>' || chr(10) ||
               |  '<body>' || chr(10) || '    <div class="header">' || chr(10) ||
               |  '        <h1>Comprehensive Analysis Report</h1>' || chr(10) ||
               |  '        <p><strong>URL:</strong> ' || url || '</p>' || chr(10) ||
               |  '        <p><strong>Generated:</strong> 1970-01-01T00:00:00.000Z</p>' || chr(10) ||
               |  '        <p class="score">Overall Score: ' || CAST(overall_score AS VARCHAR) || '/100</p>' || chr(10) ||
               |  '    </div>' || chr(10) ||
               |  '    <div class="section recommendations">' || chr(10) ||
               |  '        <h2>Recommendations</h2>' || chr(10) ||
               |  '        <ul>' || recs_li || '</ul>' || chr(10) ||
               |  '    </div>' || chr(10) || '</body>' || chr(10) || '</html>'
               |    AS report_html
               |FROM k ORDER BY url""".stripMargin)),

    // embedding-cosine near-dup at a realistic 0.999 threshold. The corpus
    // has no natural near-dups (max pairwise cosine ~0.44), so the query
    // plants them: every vector gets a deterministic clone (vec_id+10^6,
    // each dim scaled by 1 + ((vec_id+dim) mod 5 - 2)·1e-4 ⇒ cosine
    // ≈ 1-1e-8) — the standard recall-measurement setup for a dedup
    // pipeline. Scale path: 32-plane RHP signatures, 4 bands × 8 bits
    // (≥256 buckets/band — never Θ(n²/16) mega-buckets), single-pass UDF
    // cosine confirm only inside colliding buckets. DuckDB oracles the
    // end result by brute force (all pairs ≥ 0.999 == exactly the planted
    // pairs; band collision for cosine 1-1e-8 misses with prob ~1e-14).
    QuerySpec("q23_embedding_dup", (s, dir) => {
      val base = s.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))
      val clone = udf { (id: Long, v: Seq[Float]) =>
        val out = new Array[Float](v.length)
        var i = 0
        while (i < v.length) {
          out(i) = (v(i).toDouble * (1.0 + (((id + i) % 5) - 2) * 1e-4)).toFloat
          i += 1
        }
        out
      }
      val cloned = base.select((col("vec_id") + 1000000L).as("vec_id"),
        clone(col("vec_id"), col("embedding")).as("embedding"))
      val corpus = base.unionByName(cloned)
        .withColumn("sig", SimilarityQueries.rhpSignature(col("embedding"), 32))
        // one clone+signature pass: the self-join's branches are separate
        // subtrees and each re-ran both UDFs over the corpus (same fix as
        // DedupQueries.minhashCandidates). The cut sits ABOVE the UDFs but
        // BELOW the band explode, so the codegen'd 8-bit band arithmetic
        // stays in the final plan (PlanSpec pins it) while the expensive
        // pass runs once.
        .localCheckpoint(true)
      val banded = corpus.select(col("vec_id"), col("embedding"), posexplode(
        array((0 until 4).map(b =>
          shiftrightunsigned(col("sig"), b * 8).bitwiseAND(0xFFL)): _*)))
        .withColumnRenamed("pos", "band_id").withColumnRenamed("col", "bucket")
      val a = banded.select(col("band_id"), col("bucket"),
        col("vec_id").as("id_a"), col("embedding").as("va"))
      val b = banded.select(col("band_id"), col("bucket"),
        col("vec_id").as("id_b"), col("embedding").as("vb"))
      a.join(b, Seq("band_id", "bucket"))
        .filter(col("id_a") < col("id_b"))
        .dropDuplicates("id_a", "id_b")
        .withColumn("sim", SimilarityQueries.cosineUdf(col("va"), col("vb")))
        .filter(col("sim") >= 0.999)
        .select(col("id_a"), col("id_b"),
          round(col("sim") * 10000).cast("long").as("sim_x10000"))
        .orderBy(col("id_a"), col("id_b"))
    }, Some("""WITH corpus AS (
              |  SELECT vec_id, embedding FROM embeddings
              |  UNION ALL
              |  SELECT vec_id + 1000000 AS vec_id,
              |         list_transform(generate_series(1, len(embedding)),
              |           i -> CAST(CAST(embedding[i] AS DOUBLE) *
              |                (1.0 + (((vec_id + i - 1) % 5) - 2) * 0.0001) AS FLOAT))
              |           AS embedding
              |  FROM embeddings),
              |normed AS (
              |  SELECT vec_id, embedding,
              |         sqrt(list_sum(list_transform(generate_series(1, len(embedding)),
              |           i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))) AS nrm
              |  FROM corpus),
              |pairs AS (
              |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
              |    list_sum(list_transform(generate_series(1, len(a.embedding)),
              |      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
              |    / (a.nrm * b.nrm) AS sim
              |  FROM normed a, normed b WHERE a.vec_id < b.vec_id)
              |SELECT id_a, id_b, CAST(round(sim * 10000) AS BIGINT) AS sim_x10000
              |FROM pairs WHERE sim >= 0.999
              |ORDER BY id_a, id_b""".stripMargin)),

    // resources/list catalog surface (server.ts:1407-1419): the pages
    // table as a listable catalog with cache:// URIs + re-extract on read;
    // uri scheme/size stats recomputed by the oracle
    QuerySpec("q69_catalog", (s, _) => {
      import s.implicits._
      val kernel = okPages(s).as[(String, String)].map { case (u, h) =>
        val e = graft.core.Extract.extract(h, u, 0L,
          graft.core.Extract.Options(format = "text"))
        ("cache://" + java.net.URLEncoder.encode(u, "UTF-8"),
          e.title, e.wordCount, h.getBytes("UTF-8").length)
      }.toDF("resource_uri", "title", "word_count", "size_bytes")
      OracleMat(s, "q69")(kernel)
        .withColumn("uri_ok", col("resource_uri").startsWith("cache://"))
        .withColumn("kb_bucket", (col("size_bytes") / 1024).cast("long"))
        .orderBy("resource_uri")
    }, Some(s"""SELECT resource_uri, title, word_count, size_bytes,
               |       starts_with(resource_uri, 'cache://') AS uri_ok,
               |       CAST(size_bytes // 1024 AS BIGINT) AS kb_bucket
               |FROM ${OracleMat.src("q69")} ORDER BY resource_uri""".stripMargin))
  )
}
