package graft.engine

/** Plain-JVM extraction microbench (no Spark) to isolate scaling. */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val web = SyntheticWeb.Config(nHosts = 256, pagesPerHost = 1 << 20)
    def work(tid: Int, n: Int): Long = {
      var i = 0; var acc = 0L
      while (i < n) {
        val u = s"http://host${(tid * 100003 + i) % 256}.example/p/${tid * 1000000 + i}"
        val fr = SyntheticWeb.fetch(web, u)
        if (fr.status == 200 && fr.html.nonEmpty) {
          val e = graft.core.Extract.extract(fr.html, u, 0L,
            graft.core.Extract.Options(format = "text"))
          acc += e.wordCount
        }
        i += 1
      }
      acc
    }
    // warmup
    work(99, 3000)
    for (threads <- Seq(1, 8, 32)) {
      val perThread = 6000
      val t0 = System.nanoTime()
      val ts = (0 until threads).map { t =>
        val th = new Thread(() => { work(t, perThread); () })
        th.start(); th
      }
      ts.foreach(_.join())
      val secs = (System.nanoTime() - t0) / 1e9
      val rate = threads * perThread / secs
      println(f"threads=$threads%2d pages/sec=$rate%.0f secs=$secs%.1f")
    }
  }
}
