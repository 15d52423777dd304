package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.Multimodal
import graft.streaming.Streams

/** Structured Streaming + multimodal + remaining text-op queries. */
object StreamQueries {

  /** Streaming file source needs a directory; stage the single parquet
    * file into a temp dir (per-run unique memory-sink names keep reruns
    * from colliding). */
  private def stage(sfDir: String, table: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"stream-$table")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/$table.parquet"),
      dir.resolve(s"$table.parquet"))
    dir.toString
  }

  private val counter = new java.util.concurrent.atomic.AtomicInteger(0)

  val specs: Seq[QuerySpec] = Seq(
    // windowed event-time aggregation with watermark (monitor_uptime's
    // hourly stats, server.ts:6058-6075, as a continuous query)
    QuerySpec("q61_stream_windows", (s, dir) => {
      val q = s"win${counter.incrementAndGet()}"
      Streams.windowedStats(s, stage(dir, "events"), q)
    }, None),

    // stateful sessionization via flatMapGroupsWithState
    QuerySpec("q62_stream_sessions", (s, dir) => {
      val q = s"sess${counter.incrementAndGet()}"
      Streams.sessionize(s, stage(dir, "events"), q)
    }, None),

    // multimodal: binary media column → batched stub-decode + features
    QuerySpec("q63_multimodal", (s, _) => {
      val media = Multimodal.mediaTable(s, 2000)
      Multimodal.decodeAndFeaturize(s, media)
        .select(col("media_id"), col("format"), col("width"), col("height"),
          col("channels"), col("size_bytes"), col("n_sampled_frames"),
          round(element_at(col("channel_means"), 1), 2).as("mean_c0"))
        .orderBy(col("media_id"))
    }, None),

    // search_content (server.ts:1852-1936): literal scan with ±50-char
    // context, first match per document — SQL-oracled
    QuerySpec("q19_search_content", (s, dir) => {
      val d = s.read.parquet(s"$dir/documents.parquet")
      val term = "spark"
      d.withColumn("pos", locate(term, col("text")))
        .filter(col("pos") > 0)
        .select(col("doc_id"),
          col("pos"),
          substring_index( // context window: 50 chars either side
            expr(s"substring(text, greatest(1, pos - 50), ${50 * 2} + length('$term'))"),
            "\n", 1).as("context"))
        .orderBy(col("doc_id"))
    }, Some("""SELECT doc_id, pos,
              |       CASE WHEN strpos(context0, chr(10)) > 0
              |            THEN substr(context0, 1, strpos(context0, chr(10)) - 1)
              |            ELSE context0 END AS context
              |FROM (
              |  SELECT doc_id, strpos(text, 'spark') AS pos,
              |         substr(text, greatest(1, strpos(text, 'spark') - 50),
              |                100 + length('spark')) AS context0
              |  FROM documents WHERE strpos(text, 'spark') > 0)
              |ORDER BY doc_id""".stripMargin)),

    // summarize_content (extract.ts:294-340) over documents
    QuerySpec("q64_summarize", (s, dir) => {
      import s.implicits._
      s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id").cast("long"), col("text")).as[(Long, String)]
        .map { case (id, text) =>
          (id, graft.core.Extract.summarize(text, maxLength = 120),
            graft.core.Extract.summarize(text, maxLength = 120, bullets = true))
        }.toDF("doc_id", "summary", "bullets")
        .orderBy("doc_id")
    }, None)
  )
}
