package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Structured Streaming forms of the reference's monitor-family analytics
  * (SURVEY.md §2e: the reference's monitor tools are one-shot; the
  * streaming generalization is ours). Two shapes:
  *
  *  - windowed uptime stats: watermark + tumbling window over event time,
  *    per event_type counts/min/max — the monitor_uptime hourly groupBy
  *    (server.ts:6058-6075) as a continuous query;
  *  - sessionization via mapGroupsWithState: per-user sessions split on a
  *    gap timeout — custom state the built-in windows can't express.
  *
  * Both run batch-drivable (memory sink + processAllAvailable) so the
  * driver's local run exercises real streaming plumbing.
  */
object Streams {

  /** Size the stateful-shuffle fan from the INPUT BYTES instead of the
    * session default: state-store partitions are fixed per streaming query
    * (AQE never coalesces stateful operators), and every partition pays
    * per-micro-batch state-store open/commit/delta-file IO. A ~10 MB
    * staged input does not need a cluster-wide state fan; above ~256 MB
    * the session default is kept. Scoped to the query build/run (the conf
    * is captured at query start) and always restored. Results are
    * partitioning-independent (grouping keys decide state ownership). */
  private def withScaledStateFan[A](spark: SparkSession, inputDir: String)(f: => A): A = {
    val bytes =
      try Option(new java.io.File(inputDir).listFiles())
        .map(_.map(_.length).sum).getOrElse(-1L)
      catch { case _: Exception => -1L }
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    val small = bytes >= 0 && bytes < (256L << 20)
    if (small)
      spark.conf.set("spark.sql.shuffle.partitions",
        math.max(8L, bytes / (16L << 20)).toString)
    try f
    finally if (small) spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class SessionState(start: Long, last: Long, n: Int)
  final case class Session(user_id: Long, start_ms: Long, end_ms: Long, n_events: Int)

  /** Tumbling-window aggregation with watermark over a parquet stream. */
  def windowedStats(spark: SparkSession, inputDir: String, queryName: String): DataFrame =
      withScaledStateFan(spark, inputDir) {
    val schema = spark.read.parquet(inputDir).schema
    val stream = spark.readStream.schema(schema).parquet(inputDir)
      // parquet NTZ timestamps -> session-tz instants (watermarks require
      // TIMESTAMP, not TIMESTAMP_NTZ)
      .withColumn("ts", col("ts").cast("timestamp"))
    val agg = stream
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "6 hours"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(min(col("value")) * 100).cast("long").as("min_cents"),
        round(max(col("value")) * 100).cast("long").as("max_cents"))
    val q = agg.writeStream
      .outputMode(OutputMode.Complete())
      .format("memory").queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
      // window start rendered as a string: parquet instant-vs-naive
      // timestamp types don't survive a cross-engine hash compare
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("event_type"), col("n"), col("min_cents"), col("max_cents"))
      .orderBy(col("win_start"), col("event_type"))
  }

  /** Streaming exact dedup: stateful dropDuplicates on the content hash
    * over a parquet stream — the keep-first ingest dedup a training-data
    * pipeline runs continuously as documents arrive. State is one entry
    * per distinct hash in the state store (the EXACT, unbounded form);
    * [[streamDedupBounded]] is the watermark-bounded 100 TB form (q91).
    * Output is the distinct hash set — order-independent, so the batch
    * oracle (SELECT DISTINCT md5(text)) pins it exactly regardless of
    * file-arrival order. */
  def streamDedup(spark: SparkSession, inputDir: String, queryName: String): DataFrame =
      withScaledStateFan(spark, inputDir) {
    val schema = spark.read.parquet(inputDir).schema
    val stream = spark.readStream.schema(schema).parquet(inputDir)
      .select(md5(col("text").cast("binary")).as("content_hash"))
      .dropDuplicates("content_hash")
    val q = stream.writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName).select("content_hash").orderBy("content_hash")
  }

  /** Watermark-BOUNDED streaming dedup (the 100 TB form of
    * [[streamDedup]]): `dropDuplicatesWithinWatermark` keeps a state row
    * only until the watermark passes its event time + delay, so state is
    * O(hashes inside the delay window), not O(every hash ever ingested) —
    * duplicates farther apart than the delay re-emit (by design; see
    * StreamsSpec's multi-batch eviction test, which drives its own
    * timestamps + delay to prove eviction). The driver query derives the
    * ingest time FROM the content hash, so all duplicates of a hash share
    * one event time; the hash-derived times span a 3600 s window, and the
    * DEFAULT delay (70 min) exceeds that spread — so no row can ever be
    * late no matter how the source splits files into micro-batches
    * (maxFilesPerTrigger etc.), no state row is evicted mid-run, and the
    * output equals the batch DISTINCT unconditionally. A sub-spread delay
    * would silently drop hashes as late data if the input ever arrived in
    * more than one micro-batch. */
  def streamDedupBounded(spark: SparkSession, inputDir: String,
      queryName: String, delay: String = "70 minutes"): DataFrame =
      withScaledStateFan(spark, inputDir) {
    val schema = spark.read.parquet(inputDir).schema
    val stream = spark.readStream.schema(schema).parquet(inputDir)
      .select(md5(col("text").cast("binary")).as("content_hash"))
      .withColumn("ingest_ts", timestamp_seconds(
        lit(1700000000L) + pmod(xxhash64(col("content_hash")), lit(3600L))))
      .withWatermark("ingest_ts", delay)
      .dropDuplicatesWithinWatermark("content_hash")
    val q = stream.writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName).select("content_hash").orderBy("content_hash")
  }

  /** Test-observable instrumentation for the bounded session buffer (local
    * mode shares the JVM; on a cluster these are per-executor and harmless).
    * High-water mark of events buffered for any single (user, chunk), and
    * the count of forced chunk-boundary session splits. */
  val sessionBufferHighWater = new java.util.concurrent.atomic.AtomicInteger(0)
  val sessionForcedSplits = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Gap-based sessionization with flatMapGroupsWithState (processing-time
    * batch drive; state = open session per user).
    *
    * Per-task memory is bounded by MECHANISM, not convention: a user's
    * micro-batch slice is consumed in chunks of at most `maxBuffered`
    * events. Each chunk is sorted and run through the gap logic; if more
    * events remain after a chunk, the open session is FORCE-CLOSED at the
    * chunk boundary (emitted as a session, counted in
    * [[sessionForcedSplits]]) so the buffer can be released. A forced
    * split can only alter semantics for a user exceeding `maxBuffered`
    * events in ONE micro-batch — the default (100k) is far above any
    * test-scale per-user rate, and StreamsSpec drives a pathological
    * single-user batch with a tiny bound to prove memory stays bounded
    * while event counts are conserved. */
  def sessionize(spark: SparkSession, inputDir: String, queryName: String,
      gapMs: Long = 30 * 60 * 1000L, maxBuffered: Int = 100000): DataFrame =
      withScaledStateFan(spark, inputDir) {
    import spark.implicits._
    val schema = spark.read.parquet(inputDir).schema
    val stream = spark.readStream.schema(schema).parquet(inputDir)
      .select(col("event_id").cast("long"), col("ts"),
        col("user_id").cast("long"), col("event_type"), col("value"))
      .as[Event]

    val sessions = stream
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, events: Iterator[Event], state: GroupState[SessionState]) =>
          val out = scala.collection.mutable.ArrayBuffer[Session]()
          var st = state.getOption.getOrElse(SessionState(-1L, -1L, 0))
          val buf = scala.collection.mutable.ArrayBuffer[Event]()
          def runChunk(): Unit = {
            val n = buf.length
            var hw = sessionBufferHighWater.get()
            while (n > hw && !sessionBufferHighWater.compareAndSet(hw, n))
              hw = sessionBufferHighWater.get()
            val sorted = buf.sortBy(e => (e.ts.getTime, e.event_id))
            sorted.foreach { e =>
              val t = e.ts.getTime
              if (st.n == 0) st = SessionState(t, t, 1)
              else if (t - st.last > gapMs) {
                out += Session(userId, st.start, st.last, st.n)
                st = SessionState(t, t, 1)
              } else st = SessionState(st.start, t, st.n + 1)
            }
            buf.clear()
          }
          events.foreach { e =>
            if (buf.length >= maxBuffered) {
              // flush BEFORE admitting the overflowing event: `e` proves
              // more input follows, so the open session must be released
              // (forced split) — a final chunk never force-closes
              runChunk()
              if (st.n > 0) {
                out += Session(userId, st.start, st.last, st.n)
                st = SessionState(-1L, -1L, 0)
                sessionForcedSplits.incrementAndGet()
              }
            }
            buf += e
          }
          runChunk()
          state.update(st)
          out.iterator
      }

    val q = sessions.writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("n_events")).cast("long").as("events_in_closed_sessions"),
        max(col("end_ms") - col("start_ms")).as("longest_ms"))
      .orderBy(col("user_id"))
  }
}
