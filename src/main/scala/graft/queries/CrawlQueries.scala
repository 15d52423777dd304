package graft.queries

import org.apache.spark.sql.functions._
import graft.engine.{FrontierEngine, SyntheticWeb}

/** Crawl-engine query pack — the frontier scheduler, politeness budgets,
  * robots gating, and the extraction kernel as driver-runnable queries.
  * Non-SQL ops (no DuckDB oracle): their exactness oracle is the scalar BFS
  * reimplementation in CrawlSpec (engine order/seen-set/text must equal it
  * byte-for-byte). The sfDir parameter is unused — the input is the
  * deterministic synthetic web (FIXTURES.md), not the TPC-H tables.
  */
object CrawlQueries {

  private val web = SyntheticWeb.Config(nHosts = 8, pagesPerHost = 32, megaFactor = 4)

  private def seeds(hosts: Int*) = hosts.map(h => SyntheticWeb.pageUrl(h, 0)).toList

  val specs: Seq[QuerySpec] = Seq(
    // full BFS crawl: emitted rows in exact crawl order
    QuerySpec(
      "q30_crawl_bfs",
      (s, _) => {
        val cfg = FrontierEngine.Config(maxDepth = 2, maxPages = 300,
          hostBudget = Int.MaxValue, web = web)
        val (fetched, _) = FrontierEngine.crawl(s, seeds(0, 1, 2, 3), cfg)
        fetched.select("order_idx", "url", "depth", "round", "status", "title")
          .orderBy("order_idx")
      },
      None),

    // politeness: budget 5/host/round — per-round-host fetch counts
    QuerySpec(
      "q31_crawl_polite",
      (s, _) => {
        val cfg = FrontierEngine.Config(maxDepth = 2, maxPages = 300,
          hostBudget = 5, web = web)
        val (fetched, _) = FrontierEngine.crawl(s, seeds(0, 1), cfg)
        fetched.groupBy(col("round"), col("host"))
          .agg(count(lit(1)).as("fetched"),
            sum(when(col("status") === "OK", 1).otherwise(0)).as("ok"))
          .orderBy(col("round"), col("host"))
      },
      None),

    // the extraction kernel as a distributed per-row UDF over synthetic pages
    QuerySpec(
      "q32_extract_kernel",
      (s, _) => {
        import s.implicits._
        val urls = (0 until 8).flatMap(h =>
          (0 until 24).map(p => SyntheticWeb.pageUrl(h, p)))
        val pages = s.createDataset(urls).toDF("url")
          .repartition(8)
          .withColumn("html", udf((u: String) => SyntheticWeb.fetch(web, u).html).apply(col("url")))
          .filter(length(col("html")) > 0)
        val extractUdf = udf { (html: String, url: String) =>
          val e = graft.core.Extract.extract(html, url, 0L,
            graft.core.Extract.Options(format = "text"))
          (e.title, e.author.getOrElse(""), e.content, e.wordCount)
        }
        pages.withColumn("x", extractUdf(col("html"), col("url")))
          .select(col("url"), col("x._1").as("title"), col("x._2").as("author"),
            col("x._3").as("text"), col("x._4").as("word_count"))
          .orderBy(col("url"))
      },
      None),

    // link graph: edges from the extract stage → in-degree ranking
    QuerySpec(
      "q33_link_graph",
      (s, _) => {
        import s.implicits._
        val urls = (0 until 8).flatMap(h =>
          (0 until 24).map(p => SyntheticWeb.pageUrl(h, p)))
        val edges = s.createDataset(urls)
          .repartition(8)
          .flatMap { u =>
            val fr = SyntheticWeb.fetch(web, u)
            if (fr.status == 200 && fr.contentType.contains("text/html") && fr.html.nonEmpty)
              SyntheticWeb.pageLinks(fr.html, u, sameHostOnly = false).map(dst => (u, dst))
            else Seq.empty
          }.toDF("src", "dst")
        edges.groupBy(col("dst")).agg(count(lit(1)).as("in_degree"))
          .orderBy(col("in_degree").desc, col("dst").asc)
          .limit(50)
      },
      None),

    // robots gate: per-status outcome counts over a crawl with denials
    QuerySpec(
      "q34_robots_gate",
      (s, _) => {
        val cfg = FrontierEngine.Config(maxDepth = 2, maxPages = 300,
          hostBudget = Int.MaxValue, web = web)
        val (fetched, _) = FrontierEngine.crawl(s, seeds(2, 7), cfg)
        fetched.groupBy(col("status")).agg(count(lit(1)).as("n"))
          .orderBy(col("status"))
      },
      None)
  )
}
