package graft.engine

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch A/B: dedupe keyed on (url_hash,url,host) [old] vs url_hash
  * alone [new] — the single-key form leaves the frame partitioned on the
  * anti-join key so the join reuses the exchange. Measures the sched
  * pipeline (dedupe → anti-join → budget window → count) at N rows. */
object SchedShapeBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.getOrElse("16000000").toLong
    val spark = SparkSession.builder().master("local[32]")
      .appName("sched-shape")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val hosts = 4096
    def frontier = spark.range(n)
      .select(
        concat(lit("http://host"), (col("id") % hosts).cast("string"),
          lit(".example/p/"), (col("id") % (n * 7 / 10)).cast("string")).as("url"),
        (col("id") % hosts).cast("string").as("host"),
        (col("id") / 64).cast("long").as("parent_order"),
        (col("id") % 64).cast("int").as("link_pos"))
      .withColumn("url_hash", xxhash64(col("url")))
    def seen = spark.range(n / 5)
      .select(xxhash64(concat(lit("http://host"), (col("id") % hosts).cast("string"),
        lit(".example/p/"), (col("id") % (n * 7 / 10)).cast("string"))).as("url_hash"))

    def dedupeOld = frontier
      .groupBy(col("url_hash"), col("url"), col("host"))
      .agg(min(struct(col("parent_order"), col("link_pos"))).as("seq"))
      .select(col("url_hash"), col("url"), col("host"),
        col("seq.parent_order").as("parent_order"), col("seq.link_pos").as("link_pos"))
    def dedupeNew = frontier
      .groupBy(col("url_hash"))
      .agg(min(struct(col("parent_order"), col("link_pos"), col("url"), col("host"))).as("seq"))
      .select(col("url_hash"), col("seq.url").as("url"), col("seq.host").as("host"),
        col("seq.parent_order").as("parent_order"), col("seq.link_pos").as("link_pos"))

    def downstream(d: org.apache.spark.sql.DataFrame): Long = {
      val fresh = d.join(seen, Seq("url_hash"), "left_anti")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("host")).orderBy(col("parent_order"), col("link_pos"))
      fresh.withColumn("rk", row_number().over(w)).filter(col("rk") <= 100000).count()
    }
    // warmup both
    downstream(dedupeOld.limit(100000)); downstream(dedupeNew.limit(100000))
    for (rep <- 1 to 3; which <- Seq("old", "new")) {
      val t0 = System.nanoTime()
      val c = downstream(if (which == "old") dedupeOld else dedupeNew)
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"rep=$rep $which%s rows=$c secs=$secs%.2f rate=${(c / secs / 1e6)}%.1fM/s")
    }
    // plan evidence: exchanges in each
    def exchanges(df: org.apache.spark.sql.DataFrame): Int = {
      df.count()
      val p = df.queryExecution.executedPlan.toString
      val cut = p.indexOf("== Initial Plan ==")
      "Exchange".r.findAllIn(if (cut >= 0) p.substring(0, cut) else p).size
    }
    println(s"exchanges old=${exchanges(dedupeOld.join(seen, Seq("url_hash"), "left_anti"))} " +
      s"new=${exchanges(dedupeNew.join(seen, Seq("url_hash"), "left_anti"))}")
    spark.stop()
  }
}
