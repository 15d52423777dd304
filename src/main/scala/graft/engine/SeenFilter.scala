package graft.engine

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Distributed Bloom seen-filter (SURVEY.md §7 module 7).
  *
  * `DataFrameStatFunctions.bloomFilter` collects one filter to the driver;
  * at 10^10 URLs that's the bottleneck, so we build **per-bucket** filters
  * with a custom [[Aggregator]] over the url-hash (bucket = hash % buckets,
  * a normal partial-aggregated groupBy) and the filters STAY DISTRIBUTED:
  * [[build]] returns a (bucket, bloom) DataFrame, never a driver-side map.
  * [[split]] co-partitions candidates and filters on the bucket key with
  * the same hash partitioner and probes inside `zipPartitions`, so each
  * task materializes only the filters of its own buckets — at the 10^10
  * sizing (~1526 buckets x 8 MiB) that is ONE 8 MiB filter per task instead
  * of a ~12 GiB whole-map broadcast on every executor.
  *
  * Bloom answers "possibly seen" — false positives would *drop* URLs the
  * reference would crawl (SURVEY.md §7 hard parts), so the engine uses the
  * filter only as a shuffle-saving prefilter and confirms every positive
  * with the exact anti-join. No false negatives by construction: both
  * probe hashes derive from the already-uniform xxh64 url_hash.
  */
object SeenFilter {

  /** Debug lineage of the most recent probe RDD, captured BEFORE the
    * localCheckpoint truncates it — lets CrawlSpec assert the probe is a
    * co-partitioned zip with no broadcast without re-running it. */
  @volatile private[engine] var lastProbeLineage: String = ""

  /** Bits sized for ~1% fp at `expectedPerBucket` items, k=7. */
  final case class Params(buckets: Int = 64, bitsPerBucket: Int = 1 << 16, k: Int = 7)

  object Params {
    /** Size the filter from the actual seen-set cardinality: ~10 bits/item
      * at k=7 ⇒ <1% false positives (the default 64×2^16 bits saturates —
      * ~100% FP, dead-weight prefilter — past ~4M URLs). Buckets scale with
      * the item count so each bucket's filter stays ≤ 2^26 bits (8 MiB);
      * at 10^10 URLs that is ~1526 buckets of 8 MiB, and because [[split]]
      * probes in bucket-co-partitioned tasks, per-task filter memory is one
      * bucket (8 MiB) — independent of total seen-set size. */
    def forCount(seenCount: Long): Params = {
      val totalBits = math.max(1L << 16, seenCount * 10)
      val maxBitsPerBucket = 1L << 26
      val buckets = math.max(64L, (totalBits + maxBitsPerBucket - 1) / maxBitsPerBucket)
      var bits = 1L << 16
      while (bits < (totalBits + buckets - 1) / buckets && bits < maxBitsPerBucket)
        bits <<= 1
      Params(buckets.toInt, bits.toInt, k = 7)
    }
  }

  final class BloomAgg(bits: Int, k: Int)
      extends Aggregator[Long, Array[Byte], Array[Byte]] {
    override def zero: Array[Byte] = new Array[Byte](bits / 8)
    override def reduce(buf: Array[Byte], urlHash: Long): Array[Byte] = {
      set(buf, urlHash); buf
    }
    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      var i = 0
      while (i < a.length) { a(i) = (a(i) | b(i)).toByte; i += 1 }
      a
    }
    override def finish(buf: Array[Byte]): Array[Byte] = buf
    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY

    private def set(buf: Array[Byte], h: Long): Unit = {
      // double hashing: g_i = h1 + i*h2 (Kirsch–Mitzenmacher)
      val h1 = (h & 0x7FFFFFFFFFFFFFFFL).toInt
      val h2 = ((h >>> 32) | 1L).toInt
      var i = 0
      while (i < k) {
        val bit = java.lang.Math.floorMod(h1 + i * h2, bits)
        buf(bit >> 3) = (buf(bit >> 3) | (1 << (bit & 7))).toByte
        i += 1
      }
    }
  }

  def mightContain(buf: Array[Byte], h: Long, bits: Int, k: Int): Boolean = {
    val h1 = (h & 0x7FFFFFFFFFFFFFFFL).toInt
    val h2 = ((h >>> 32) | 1L).toInt
    var i = 0
    while (i < k) {
      val bit = java.lang.Math.floorMod(h1 + i * h2, bits)
      if ((buf(bit >> 3) & (1 << (bit & 7))) == 0) return false
      i += 1
    }
    true
  }

  /** Build per-bucket Bloom filters from a seen table's `url_hash` column.
    * Returns a DISTRIBUTED (bucket INT, bloom BINARY) DataFrame — at 10^10
    * URLs the filter set is ~12 GiB and must never be collected or
    * broadcast whole. */
  def build(spark: SparkSession, seen: DataFrame, p: Params): DataFrame = {
    val agg = udaf(new BloomAgg(p.bitsPerBucket, p.k))
    seen.select(pmod(col("url_hash"), lit(p.buckets)).cast("int").as("bucket"),
        col("url_hash"))
      .groupBy(col("bucket"))
      .agg(agg(col("url_hash")).as("bloom"))
  }

  /** Prefilter: keep candidate rows whose hash is NOT possibly-seen, plus
    * (separately) the possibly-seen rows for exact confirmation.
    *
    * Candidates and filters are co-partitioned on `bucket = url_hash %
    * buckets` with the same [[org.apache.spark.HashPartitioner]] (Int keys
    * hash to themselves, so partition i holds exactly bucket-i rows when
    * numPartitions == buckets) and probed inside `zipPartitions`: each task
    * loads only its own buckets' filters into a local map. A joined-row
    * approach would embed the 8 MiB bloom bytes into every candidate row;
    * a broadcast would ship ALL buckets to every executor — this ships each
    * filter exactly once over the wire and bounds per-task filter memory at
    * ceil(buckets / numPartitions) x bits/8 (= one filter at full sizing).
    * RDD zipPartitions is the one place the engine drops below the
    * DataFrame API: Catalyst has no co-partitioned-zip operator, and both
    * downstream filters re-read the persisted co-partitioning shuffle, not
    * the upstream plan. */
  def split(spark: SparkSession, candidates: DataFrame, filters: DataFrame,
      p: Params): (DataFrame, DataFrame) = {
    val bits = p.bitsPerBucket
    val k = p.k
    val buckets = p.buckets
    val schema = candidates.schema
    val hashIdx = schema.fieldIndex("url_hash")
    val part = new org.apache.spark.HashPartitioner(buckets)
    val candKv = candidates.rdd
      .map(r => (java.lang.Math.floorMod(r.getLong(hashIdx), buckets.toLong).toInt, r))
      .partitionBy(part)
    val filtKv = filters.rdd
      .map(r => (r.getInt(0), r.getAs[Array[Byte]](1)))
      .partitionBy(part)
    val flagged = candKv.zipPartitions(filtKv, preservesPartitioning = true) {
      (cit, fit) =>
        val local = new java.util.HashMap[Int, Array[Byte]]()
        fit.foreach { case (b, f) => local.put(b, f) }
        cit.map { case (b, row) =>
          val f = local.get(b)
          org.apache.spark.sql.Row.fromSeq(row.toSeq :+
            (f != null && mightContain(f, row.getLong(hashIdx), bits, k)))
        }
    }
    // single probe pass: the flag rides as an extra column and the flagged
    // rows are eagerly localCheckpointed, so the k-hash Bloom probe (and
    // the co-partitioning shuffle read) executes exactly ONCE per round —
    // both output branches re-read the checkpointed partitions (old
    // checkpoint blocks are dropped by the ContextCleaner once the round's
    // DataFrames go out of scope). Previously the uncached probe RDD fed
    // two separate filter jobs, running the whole zipPartitions twice.
    val flaggedSchema = org.apache.spark.sql.types.StructType(
      schema.fields :+ org.apache.spark.sql.types.StructField(
        "__maybe_seen", org.apache.spark.sql.types.BooleanType, nullable = false))
    lastProbeLineage = flagged.toDebugString // pre-truncation, for the
    // CrawlSpec no-broadcast/co-partition gate (checkpointing hides it)
    val flaggedDf = spark.createDataFrame(flagged, flaggedSchema)
      .localCheckpoint(true)
    val keep = schema.fieldNames.map(col)
    (flaggedDf.filter(!col("__maybe_seen")).select(keep: _*),
      flaggedDf.filter(col("__maybe_seen")).select(keep: _*))
  }
}
