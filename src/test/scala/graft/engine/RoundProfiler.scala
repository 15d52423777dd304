package graft.engine

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Scratch profiler for per-round crawl fixed costs: counts Spark jobs /
  * stages / tasks per crawl round and prints round wall times. Dev-only
  * (test scope) — drives the same FrontierEngine.crawl the bench uses. */
object RoundProfiler {
  def main(args: Array[String]): Unit = {
    val cpus = args.headOption.getOrElse("32").toInt
    val aqe = args.lift(1).getOrElse("true")
    val shufP = args.lift(2).getOrElse(cpus.toString)
    val pf = args.lift(3).getOrElse("true")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("round-profiler")
      .config("spark.sql.shuffle.partitions", shufP)
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", pf)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1; tasks += s.stageInfo.numTasks
      }
    })

    val web = SyntheticWeb.Config(
      nHosts = 64, pagesPerHost = 2000, megaFactor = 4, linksPerPage = 12)
    val cfg = FrontierEngine.Config(
      maxDepth = 4, maxPages = 20000, hostBudget = 1000,
      sameHostOnly = false, respectRobots = true, saltBuckets = 8, web = web)
    val seeds = (0 until 32).map(h => SyntheticWeb.pageUrl(h, 0))

    // manual round loop (mirrors crawl()) with per-round accounting
    import spark.implicits._
    val emptySeen = Seq.empty[(Long, String)].toDF("url_hash", "url")
    var state = FrontierEngine.CrawlState(
      FrontierEngine.seedFrontier(spark, seeds).toDF(), emptySeen,
      FrontierEngine.emptyFetched(spark), 0, 0L)
    var continue = true
    val t00 = System.nanoTime()
    while (continue) {
      val (j0, s0, k0) = (jobs, stages, tasks)
      val t0 = System.nanoTime()
      val r = FrontierEngine.round(spark, state.frontier.as[FrontierEngine.FrontierRow],
        state.seen, state.round, state.fetchedCount, cfg)
      val tSched = System.nanoTime()
      if (r.taken == 0) continue = false
      else {
        val nf = r.newFrontier.toDF().localCheckpoint(true)
        val tFetch = System.nanoTime()
        val sd = r.seenDelta.localCheckpoint(true)
        val tSeen = System.nanoTime()
        state = FrontierEngine.CrawlState(nf, state.seen.union(sd),
          state.fetched.union(r.fetched), state.round + 1,
          state.fetchedCount + r.taken)
        println(f"round=${state.round}%2d taken=${r.taken}%6d " +
          f"sched=${(tSched - t0) / 1e9}%5.2fs fetch+frontier=${(tFetch - tSched) / 1e9}%5.2fs " +
          f"seen=${(tSeen - tFetch) / 1e9}%5.2fs jobs=${jobs - j0}%3d stages=${stages - s0}%3d tasks=${tasks - k0}%5d")
        if (state.fetchedCount >= cfg.maxPages) continue = false
      }
    }
    println(f"TOTAL pages=${state.fetchedCount} wall=${(System.nanoTime() - t00) / 1e9}%.1fs " +
      f"jobs=$jobs stages=$stages tasks=$tasks")
    spark.stop()
  }
}
