package graft.streaming

import java.nio.file.{Files, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** State-boundedness proof for the watermark-bounded streaming dedup
  * (q91): with `dropDuplicatesWithinWatermark`, a hash's state row is
  * EVICTED once the watermark passes its event time + delay — so a
  * duplicate arriving later than the delay re-emits (the documented
  * trade-off vs the exact unbounded form), and the state-store row count
  * stays bounded by the window's hash cardinality instead of growing with
  * every hash ever ingested. */
class StreamsSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("streams-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Write one single-file parquet batch of (content_hash, ingest_ts) and
    * stamp its modification time so the file source orders batches. */
  private def writeBatch(streamDir: Path, name: String, mtime: Long,
      rows: Seq[(String, Long)]): Unit = {
    import spark.implicits._
    val tmp = Files.createTempDirectory("dedupb-batch")
    rows.toDF("content_hash", "epoch_s")
      .withColumn("ingest_ts", timestamp_seconds(col("epoch_s")))
      .drop("epoch_s")
      .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = Files.list(tmp).filter(_.toString.endsWith(".parquet"))
      .findFirst().get()
    val dst = streamDir.resolve(s"$name.parquet")
    Files.move(part, dst)
    dst.toFile.setLastModified(mtime)
  }

  test("dropDuplicatesWithinWatermark evicts state and re-emits far dups") {
    val dir = Files.createTempDirectory("dedupb-stream")
    val t0 = 1700000000L
    val h2 = 2 * 3600L
    val base = System.currentTimeMillis() - 60000
    // Eviction happens at batch END, after dedup ran with the batch-start
    // watermark. batch 1: A B @ t0. batch 2: A C @ t0+2h — A's state row
    // (expiry t0+10min) is still present during processing, so this far
    // dup is DEDUPED; at batch end the watermark (t0+2h−10min) evicts A
    // and B. batch 3: filler E @ t0+4h (advances the watermark past every
    // old expiry). batch 4: B @ t0+6h — B's state is gone → RE-EMITS.
    writeBatch(dir, "f1", base, Seq(("A", t0), ("B", t0)))
    writeBatch(dir, "f2", base + 10000, Seq(("A", t0 + h2), ("C", t0 + h2)))
    writeBatch(dir, "f3", base + 20000, Seq(("E", t0 + 2 * h2)))
    writeBatch(dir, "f4", base + 30000, Seq(("B", t0 + 3 * h2)))

    val schema = spark.read.parquet(dir.toString).schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1) // one file per micro-batch
      .parquet(dir.toString)
      .withWatermark("ingest_ts", "10 minutes")
      .dropDuplicatesWithinWatermark("content_hash")
      .writeStream.outputMode("append")
      .format("memory").queryName("dedupb_spec")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val out = spark.table("dedupb_spec").select("content_hash")
      .collect().map(_.getString(0)).toSeq
    // A,B from batch 1; C from batch 2 (far-dup A deduped — its state row
    // was still live at batch start); E filler; B RE-EMITTED in batch 4
    // after its state row was evicted — the bounded-state trade-off
    assert(out.sorted == Seq("A", "B", "B", "C", "E"),
      s"unexpected emissions: $out")

    // bounded state: 4 distinct hashes were ingested but the final state
    // holds only the last window's entries — eviction demonstrably ran
    val lastState = q.recentProgress.flatMap(p => Option(p.stateOperators))
      .flatten.lastOption
    assert(lastState.isDefined, "no state operator metrics reported")
    assert(lastState.get.numRowsTotal < 4,
      s"state grew unbounded: ${lastState.get.numRowsTotal} rows")
  }

  test("sessionize bounds per-user buffering by mechanism (forced splits)") {
    import spark.implicits._
    // pathological batch: ONE user floods 5000 events into a single
    // micro-batch — orders of magnitude past the tiny maxBuffered bound
    val dir = Files.createTempDirectory("sess-burst")
    val t0 = 1700000000000L
    val events = (0 until 5000).map { i =>
      (i.toLong, new java.sql.Timestamp(t0 + i * 1000L), 1L, "click", 0.0)
    }
    events.toDF("event_id", "ts", "user_id", "event_type", "value")
      .coalesce(1).write.mode("overwrite").parquet(dir.toString)

    Streams.sessionBufferHighWater.set(0)
    Streams.sessionForcedSplits.set(0L)
    val out = Streams.sessionize(spark, dir.toString, "sess_burst_spec",
      gapMs = 30 * 60 * 1000L, maxBuffered = 256)
    val row = out.collect()
    val emitted = spark.table("sess_burst_spec")

    // memory stayed bounded by the mechanism: no chunk ever buffered more
    // than maxBuffered events, despite the 5000-event single-user batch
    val hw = Streams.sessionBufferHighWater.get()
    assert(hw <= 256 && hw > 0, s"buffer high-water $hw vs bound 256")
    // the bound was enforced via forced chunk-boundary splits...
    val forced = Streams.sessionForcedSplits.get()
    assert(forced >= 5000 / 256 - 1, s"only $forced forced splits")
    // ...and no event was lost: emitted sessions + the open session left
    // in state account for all 5000 (1s cadence => one logical session,
    // chopped only by the forced splits)
    val emittedEvents = emitted.agg(sum(col("n_events"))).collect()(0).getLong(0)
    assert(emittedEvents >= 5000 - 256 && emittedEvents < 5000,
      s"emitted $emittedEvents of 5000 (at most one open chunk stays in state)")
    // chunk boundaries (iterator order) may add genuine gap splits on top
    // of the forced ones, so sessions >= forced splits
    assert(row.nonEmpty && row(0).getLong(1) >= forced,
      s"n_sessions ${row(0).getLong(1)} < forced splits $forced")
  }
}
