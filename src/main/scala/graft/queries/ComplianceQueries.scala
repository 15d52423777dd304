package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import graft.engine.SyntheticWeb
import graft.tools.PageTools

/** §2d completion: check_ssl_certificate (server.ts:5347-5490),
  * check_privacy_policy (:5839-5990), analyze_cookies (:5492-5655) as
  * deterministic stand-ins. The page-dependent inputs come from the HTML
  * kernels (PageTools); ALL the reference's checklist/score arithmetic is
  * expressed as Spark SQL and independently recomputed by the DuckDB
  * oracle over the materialized kernel rows.
  *
  * The synthetic web is http-only; hosts with an even index are remapped
  * to https deterministically so both protocol branches are exercised.
  */
object ComplianceQueries {

  private val web = SyntheticWeb.Config(nHosts = 8, pagesPerHost = 32, megaFactor = 4)

  /** (url_for_tool, html) — even-host pages presented as https. */
  private def pagesWithScheme(s: SparkSession) = {
    import s.implicits._
    val urls = (0 until web.nHosts).flatMap(h =>
      (0 until 24).map(p => (SyntheticWeb.pageUrl(h, p), h % 2 == 0)))
    s.createDataset(urls).repartition(16).flatMap { case (u, https) =>
      val fr = SyntheticWeb.fetch(web, u)
      if (fr.status == 200 && fr.contentType.contains("text/html") && fr.html.nonEmpty)
        Some((if (https) "https://" + u.stripPrefix("http://") else u, fr.html))
      else None
    }.toDF("url", "html")
  }

  val specs: Seq[QuerySpec] = Seq(
    // check_ssl_certificate: deterministic cert-fields stand-in; the
    // expiring-soon band (:5414) and grade logic (:5472) recomputed in SQL
    QuerySpec("q78_ssl_cert", (s, _) => {
      import s.implicits._
      val kernel = pagesWithScheme(s).as[(String, String)].map { case (u, _) =>
        val c = PageTools.sslStandIn(u)
        (u, c.isSecure, c.commonName, c.daysUntilExpiry, c.keySize, c.sigAlgorithm)
      }.toDF("url", "is_secure", "common_name", "days_until_expiry",
        "key_size", "sig_algorithm")
      OracleMat(s, "q78")(kernel)
        .withColumn("expiring_soon",
          col("is_secure") && col("days_until_expiry") < 30)
        .withColumn("grade",
          when(!col("is_secure"), "").when(col("days_until_expiry") < 30, "B")
            .otherwise("A"))
        .orderBy("url")
    }, Some(s"""SELECT url, is_secure, common_name, days_until_expiry,
               |       key_size, sig_algorithm,
               |       is_secure AND days_until_expiry < 30 AS expiring_soon,
               |       CASE WHEN NOT is_secure THEN ''
               |            WHEN days_until_expiry < 30 THEN 'B'
               |            ELSE 'A' END AS grade
               |FROM ${OracleMat.src("q78")} ORDER BY url""".stripMargin)),

    // check_privacy_policy: link harvest + consent selectors from the
    // kernel; the GDPR/CCPA 5-point checklists (:5931-5961) and overall
    // score rebuilt in both engines. policyAnalysis exists iff any link
    // found (:5909); retention is always false in it, user-rights/contact
    // always true — so gdpr = (privacy>0) + banner + 2·any, ccpa =
    // (privacy>0) + optout + 3·any, each ×20; overall = avg (×10 int).
    QuerySpec("q79_privacy_policy", (s, _) => {
      import s.implicits._
      val kernel = pagesWithScheme(s).as[(String, String)].map { case (u, h) =>
        val c = PageTools.privacyChecklist(graft.core.Html.parse(h))
        (u, c.nPrivacyLinks, c.nTermsLinks, c.nCookieLinks,
          c.cookieBanner, c.optOutLinks, c.dataRequestForm)
      }.toDF("url", "n_privacy_links", "n_terms_links", "n_cookie_links",
        "cookie_banner", "opt_out_links", "data_request_form")
      val anyLinks = (col("n_privacy_links") + col("n_terms_links") +
        col("n_cookie_links")) > 0
      val gdpr = ((col("n_privacy_links") > 0).cast("int") +
        col("cookie_banner").cast("int") + when(anyLinks, 2).otherwise(0)) * 20
      val ccpa = ((col("n_privacy_links") > 0).cast("int") +
        col("opt_out_links").cast("int") + when(anyLinks, 3).otherwise(0)) * 20
      OracleMat(s, "q79")(kernel)
        .withColumn("gdpr_score", gdpr.cast("long"))
        .withColumn("ccpa_score", ccpa.cast("long"))
        .withColumn("overall_x10", ((gdpr + ccpa) * 5).cast("long"))
        .orderBy("url")
    }, Some(s"""SELECT url, n_privacy_links, n_terms_links, n_cookie_links,
               |       cookie_banner, opt_out_links, data_request_form,
               |       CAST(((n_privacy_links > 0)::INT + cookie_banner::INT +
               |         CASE WHEN n_privacy_links + n_terms_links + n_cookie_links > 0
               |              THEN 2 ELSE 0 END) * 20 AS BIGINT) AS gdpr_score,
               |       CAST(((n_privacy_links > 0)::INT + opt_out_links::INT +
               |         CASE WHEN n_privacy_links + n_terms_links + n_cookie_links > 0
               |              THEN 3 ELSE 0 END) * 20 AS BIGINT) AS ccpa_score,
               |       CAST((((n_privacy_links > 0)::INT + cookie_banner::INT +
               |         CASE WHEN n_privacy_links + n_terms_links + n_cookie_links > 0
               |              THEN 2 ELSE 0 END) * 20 +
               |         ((n_privacy_links > 0)::INT + opt_out_links::INT +
               |         CASE WHEN n_privacy_links + n_terms_links + n_cookie_links > 0
               |              THEN 3 ELSE 0 END) * 20) * 5 AS BIGINT) AS overall_x10
               |FROM ${OracleMat.src("q79")} ORDER BY url""".stripMargin)),

    // analyze_cookies: the reference's fixed 4-cookie list depends only on
    // (https?, consent?, privacy-link?); the count/issue/score arithmetic
    // (:5570-5647) rebuilt in both engines: secure = 2+https;
    // issues = (https ? 2 : 1) + (no consent ⇒ +1, third-party always >0);
    // complianceScore = 100 − 15·issues (:5649)
    QuerySpec("q80_cookies", (s, _) => {
      import s.implicits._
      val kernel = pagesWithScheme(s).as[(String, String)].map { case (u, h) =>
        val f = PageTools.cookiePageFlags(graft.core.Html.parse(h), u)
        (u, f.isHttps, f.hasConsentBanner, f.hasPrivacyPolicyLink)
      }.toDF("url", "is_https", "has_consent_banner", "has_privacy_link")
      val issues = when(col("is_https"), 2).otherwise(1) +
        when(!col("has_consent_banner"), 1).otherwise(0)
      OracleMat(s, "q80")(kernel)
        .withColumn("total_cookies", lit(4))
        .withColumn("third_party", lit(2))
        .withColumn("secure_cookies", (lit(2) + col("is_https").cast("int")).cast("int"))
        .withColumn("same_site_none", lit(3))
        .withColumn("n_issues", issues.cast("long"))
        .withColumn("compliance_score", (lit(100) - issues * 15).cast("long"))
        .orderBy("url")
    }, Some(s"""SELECT url, is_https, has_consent_banner, has_privacy_link,
               |       4 AS total_cookies, 2 AS third_party,
               |       CAST(2 + is_https::INT AS INT) AS secure_cookies,
               |       3 AS same_site_none,
               |       CAST((CASE WHEN is_https THEN 2 ELSE 1 END +
               |             CASE WHEN NOT has_consent_banner THEN 1 ELSE 0 END)
               |            AS BIGINT) AS n_issues,
               |       CAST(100 - (CASE WHEN is_https THEN 2 ELSE 1 END +
               |             CASE WHEN NOT has_consent_banner THEN 1 ELSE 0 END) * 15
               |            AS BIGINT) AS compliance_score
               |FROM ${OracleMat.src("q80")} ORDER BY url""".stripMargin)),

    // analyze_page_speed (:4916-5034): deterministic resource counts +
    // optimization flags from the kernel; score arithmetic (:4965-4977,
    // loadTime leg zero by construction) and the always-'F' gradeMap quirk
    // (:4981) rebuilt in both engines
    QuerySpec("q81_page_speed", (s, _) => {
      import s.implicits._
      val kernel = pagesWithScheme(s).as[(String, String)].map { case (u, h) =>
        val p = PageTools.pageSpeed(h, graft.core.Html.parse(h))
        (u, p.images, p.scripts, p.stylesheets, p.fonts, p.videos, p.htmlSize,
          p.hasMinCss, p.hasMinJs, p.hasLazy, p.hasCdn, p.hasSw)
      }.toDF("url", "images", "scripts", "stylesheets", "fonts", "videos",
        "html_size", "min_css", "min_js", "lazy_img", "cdn", "sw")
      val raw = lit(100) -
        when(col("images") > 20, 15).otherwise(0) -
        when(col("scripts") > 10, 10).otherwise(0) -
        when(col("html_size") * 1.5 > 2000000d, 20).otherwise(0) +
        when(col("min_css"), 5).otherwise(0) + when(col("min_js"), 5).otherwise(0) +
        when(col("lazy_img"), 10).otherwise(0) + when(col("cdn"), 10).otherwise(0) +
        when(col("sw"), 15).otherwise(0)
      OracleMat(s, "q81")(kernel)
        .withColumn("score", greatest(lit(0), least(lit(100), raw)).cast("long"))
        .withColumn("grade", lit("F")) // reference gradeMap quirk (:4981)
        .orderBy("url")
    }, Some(s"""SELECT url, images, scripts, stylesheets, fonts, videos,
               |       html_size, min_css, min_js, lazy_img, cdn, sw,
               |       CAST(greatest(0, least(100,
               |         100 - CASE WHEN images > 20 THEN 15 ELSE 0 END
               |             - CASE WHEN scripts > 10 THEN 10 ELSE 0 END
               |             - CASE WHEN html_size * 1.5 > 2000000 THEN 20 ELSE 0 END
               |             + CASE WHEN min_css THEN 5 ELSE 0 END
               |             + CASE WHEN min_js THEN 5 ELSE 0 END
               |             + CASE WHEN lazy_img THEN 10 ELSE 0 END
               |             + CASE WHEN cdn THEN 10 ELSE 0 END
               |             + CASE WHEN sw THEN 15 ELSE 0 END)) AS BIGINT) AS score,
               |       'F' AS grade
               |FROM ${OracleMat.src("q81")} ORDER BY url""".stripMargin)),

    // benchmark_performance (:6480-6620): dedicated stand-in. Metrics are
    // deterministic per-url draws over the reference's simulated ranges
    // (PageTools.benchmarkStandIn); the performance score (100 - LCP/30,
    // floored at 0, :6514), the A-F grade bands on the UNROUNDED scores
    // (:6521-6527), the overall average (:6611-6616, averaging the
    // unrounded performance leg), and the four recommendation triggers
    // (:6552-6585) are all recomputed by the DuckDB oracle
    QuerySpec("q85_benchmark_perf", (s, _) => {
      import s.implicits._
      val kernel = pagesWithScheme(s).as[(String, String)].map { case (u, _) =>
        val b = PageTools.benchmarkStandIn(u)
        (u, b.fcpMs, b.lcpMs, b.clsX1000, b.totalRequests, b.totalSizeX100,
          b.acc, b.bp, b.seo)
      }.toDF("url", "fcp_ms", "lcp_ms", "cls_x1000", "total_requests",
        "total_size_x100", "acc", "bp", "seo")
      val perf = greatest(lit(0.0), lit(100.0) - col("lcp_ms") / lit(30.0))
      def grade(c: org.apache.spark.sql.Column) =
        when(c >= 90, "A").when(c >= 80, "B").when(c >= 70, "C")
          .when(c >= 60, "D").otherwise("F")
      OracleMat(s, "q85")(kernel)
        .withColumn("score_performance", round(perf).cast("long"))
        .withColumn("score_overall",
          round((perf + col("acc") + col("bp") + col("seo")) / lit(4.0)).cast("long"))
        .withColumn("grade_performance", grade(perf))
        .withColumn("grade_accessibility", grade(col("acc")))
        .withColumn("grade_best_practices", grade(col("bp")))
        .withColumn("grade_seo", grade(col("seo")))
        .withColumn("n_recommendations",
          (when(col("lcp_ms") > 4000, 1).otherwise(0) +
            when(col("cls_x1000") > 250, 1).otherwise(0) +
            when(col("total_size_x100") > 300, 1).otherwise(0) +
            when(col("total_requests") > 50, 1).otherwise(0)).cast("long"))
        .orderBy("url")
    }, Some(s"""WITH k AS (
               |  SELECT *, greatest(0.0, 100.0 - lcp_ms / 30.0) AS perf
               |  FROM ${OracleMat.src("q85")})
               |SELECT url, fcp_ms, lcp_ms, cls_x1000, total_requests,
               |       total_size_x100, acc, bp, seo,
               |       CAST(round(perf) AS BIGINT) AS score_performance,
               |       CAST(round((perf + acc + bp + seo) / 4.0) AS BIGINT) AS score_overall,
               |       CASE WHEN perf >= 90 THEN 'A' WHEN perf >= 80 THEN 'B'
               |            WHEN perf >= 70 THEN 'C' WHEN perf >= 60 THEN 'D'
               |            ELSE 'F' END AS grade_performance,
               |       CASE WHEN acc >= 90 THEN 'A' WHEN acc >= 80 THEN 'B'
               |            WHEN acc >= 70 THEN 'C' WHEN acc >= 60 THEN 'D'
               |            ELSE 'F' END AS grade_accessibility,
               |       CASE WHEN bp >= 90 THEN 'A' WHEN bp >= 80 THEN 'B'
               |            WHEN bp >= 70 THEN 'C' WHEN bp >= 60 THEN 'D'
               |            ELSE 'F' END AS grade_best_practices,
               |       CASE WHEN seo >= 90 THEN 'A' WHEN seo >= 80 THEN 'B'
               |            WHEN seo >= 70 THEN 'C' WHEN seo >= 60 THEN 'D'
               |            ELSE 'F' END AS grade_seo,
               |       CAST((CASE WHEN lcp_ms > 4000 THEN 1 ELSE 0 END +
               |             CASE WHEN cls_x1000 > 250 THEN 1 ELSE 0 END +
               |             CASE WHEN total_size_x100 > 300 THEN 1 ELSE 0 END +
               |             CASE WHEN total_requests > 50 THEN 1 ELSE 0 END)
               |            AS BIGINT) AS n_recommendations
               |FROM k ORDER BY url""".stripMargin))
  )
}
