package graft

import org.apache.spark.sql.SparkSession

/** Dev-only single-threaded microbenchmark of the per-row scalar kernels
  * (guide §1.4 isolation at the function level — NOT part of the graded
  * harness, like [[BenchExtra]]). Times repeated passes of each kernel over
  * the real sf inputs so closure-internal changes (e.g. regex precompile)
  * can be A/B'd without Spark scheduling noise.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.KernelMicro [reps]"
  */
object KernelMicro {

  private def time[A](label: String, reps: Int)(body: => A): Unit = {
    var best = Double.MaxValue
    var sink = 0L
    (1 to reps).foreach { _ =>
      val t0 = System.nanoTime()
      val r = body
      best = math.min(best, (System.nanoTime() - t0) / 1e9)
      sink += r.hashCode()
    }
    println(f"[micro] $label%-28s best=$best%.3f s  (sink=${sink & 0xff})")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[4]")
      .appName("graft-kernel-micro").config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val texts = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("text").collect().map(_.getString(0))
    println(s"[micro] docs=${texts.length} totalChars=${texts.map(_.length.toLong).sum}")

    val web = graft.engine.SyntheticWeb.Config(nHosts = 8, pagesPerHost = 32, megaFactor = 4)
    val pages = (0 until web.nHosts).flatMap(h => (0 until 24).map(p =>
        graft.engine.SyntheticWeb.pageUrl(h, p)))
      .map(u => (u, graft.engine.SyntheticWeb.fetch(web, u)))
      .collect { case (u, fr) if fr.status == 200 && fr.html.nonEmpty => (u, fr.html) }
    println(s"[micro] pages=${pages.length} totalChars=${pages.map(_._2.length.toLong).sum}")

    // JIT warmup pass over everything once
    texts.take(200).foreach { t =>
      graft.tools.PageTools.extractKeywords(t, maxKeywords = 5)
      graft.tools.PageTools.extractEntities(t)
      graft.core.Extract.countWords(t)
    }
    pages.take(30).foreach { case (u, h) =>
      graft.core.Extract.extract(h, u, 0L, graft.core.Extract.Options(format = "markdown"))
    }

    time("extractKeywords(docs)", reps) {
      texts.map(t => graft.tools.PageTools.extractKeywords(t, maxKeywords = 5).size).sum
    }
    time("extractEntities(docs)", reps) {
      texts.map(t => graft.tools.PageTools.extractEntities(t).emails.size).sum
    }
    time("summarize(docs)", reps) {
      texts.map(t => graft.core.Extract.summarize(t).length).sum
    }
    time("countWords(docs)", reps) {
      texts.map(graft.core.Extract.countWords).sum
    }
    time("textSimilarity(doc pairs)", reps) {
      texts.sliding(2, 2).map { w =>
        if (w.length == 2) (graft.tools.PageTools.textSimilarity(w(0), w(1)) * 1000).toInt else 0
      }.sum
    }
    time("extract text(pages)", reps) {
      pages.map { case (u, h) =>
        graft.core.Extract.extract(h, u, 0L, graft.core.Extract.Options(format = "text")).wordCount
      }.sum
    }
    time("extract markdown(pages)", reps) {
      pages.map { case (u, h) =>
        graft.core.Extract.extract(h, u, 0L, graft.core.Extract.Options(format = "markdown")).content.length
      }.sum
    }
    time("contacts+headings(pages)", reps) {
      pages.map { case (u, h) =>
        val doc = graft.core.Html.parse(h)
        graft.tools.PageTools.extractContacts(doc).emails.size +
          graft.tools.PageTools.extractHeadings(doc).size
      }.sum
    }
    spark.stop()
  }
}
