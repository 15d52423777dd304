package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Extra, non-graded benchmark main (guide §1): per-query isolation with
  * repetitions, per-Spark-job timing breakdowns, and plan dumps. The graded
  * harness ([[Bench]]) is frozen; every number cited from here in
  * OPTIMIZATION_r10.md is labelled as BenchExtra output.
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *     sbt "runMain graft.BenchExtra q30_crawl_bfs q20_minhash_lsh"
  * Env: SPARK_GRAFT_EXTRA_REPS (default 2), SPARK_GRAFT_EXTRA_JOBS=1
  * (print per-job lines), SPARK_GRAFT_EXTRA_PLANS=dir (write
  * explain("formatted") of each query's DataFrame to dir/<name>.txt).
  */
object BenchExtra {

  private final case class JobRec(id: Int, start: Long, var end: Long = 0L,
      desc: String = "")

  def main(args: Array[String]): Unit = {
    if (!sys.props.contains("graft.kernel.root"))
      System.setProperty("graft.kernel.root", "/tmp/graft_kernel_extra")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_EXTRA_REPS", "2").toInt
    val showJobs = sys.env.get("SPARK_GRAFT_EXTRA_JOBS").contains("1")
    val plansDir = sys.env.get("SPARK_GRAFT_EXTRA_PLANS")

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-extra-$cpus")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JobRec]()
    val order = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = js.stageInfos.lastOption.map(_.name).getOrElse("")
        val nst = js.stageInfos.size
        jobs.put(js.jobId, JobRec(js.jobId, js.time, desc = s"stages=$nst  $site"))
        order.add(js.jobId); ()
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobs.get(je.jobId)).foreach(_.end = je.time)
      }
    })

    // same warm-up as the graded pack
    spark.read.parquet(s"$sfDir/region.parquet").count()
    spark.range(1000).selectExpr("sum(id)").collect()

    val wanted = if (args.nonEmpty) args.toSet else Set.empty[String]
    val specs = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => wanted.isEmpty || wanted.contains(n) }

    // experiment toggle: measure AQE driver overhead on tiny-round queries
    sys.env.get("SPARK_GRAFT_EXTRA_NOAQE").foreach(v =>
      spark.conf.set("spark.sql.adaptive.enabled", v != "1"))
    sys.env.get("SPARK_GRAFT_EXTRA_SHUFPARTS").foreach(v =>
      spark.conf.set("spark.sql.shuffle.partitions", v))

    specs.foreach { case (name, fn) =>
      val times = (1 to reps).map { rep =>
        jobs.clear(); order.clear()
        spark.sparkContext.setJobDescription(s"$name rep$rep")
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        df.count()
        val secs = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.setJobDescription(null)
        if (showJobs && rep == reps) {
          val it = order.iterator()
          while (it.hasNext) {
            val r = jobs.get(it.next())
            val d = if (r.end > 0) (r.end - r.start) / 1e3 else -1.0
            println(f"[extra]   job ${r.id}%4d ${d}%8.3f s  ${r.desc}")
          }
          println(s"[extra]   n_jobs=${jobs.size()}")
        }
        if (plansDir.isDefined && rep == reps) {
          val dir = java.nio.file.Paths.get(plansDir.get)
          java.nio.file.Files.createDirectories(dir)
          java.nio.file.Files.write(dir.resolve(s"$name.txt"),
            df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
              .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        }
        secs
      }
      val ts = times.map(t => f"$t%.3f").mkString(",")
      println(f"[extra] $name%-28s min=${times.min}%.3f reps=[$ts]")
    }
    spark.stop()
  }
}
