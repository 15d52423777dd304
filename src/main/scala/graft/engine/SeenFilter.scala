package graft.engine

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Distributed Bloom seen-filter (SURVEY.md §7 module 7).
  *
  * `DataFrameStatFunctions.bloomFilter` collects one filter to the driver;
  * at 10^10 URLs that's the bottleneck, so we build **per-bucket** filters
  * with a custom [[Aggregator]] over the url-hash: frontier candidates are
  * checked against only their bucket's filter (broadcast map, bucket =
  * hash % buckets, so each filter stays small and the build is a normal
  * partial-aggregated groupBy).
  *
  * Bloom answers "possibly seen" — false positives would *drop* URLs the
  * reference would crawl (SURVEY.md §7 hard parts), so the engine uses the
  * filter only as a shuffle-saving prefilter and confirms every positive
  * with the exact anti-join. No false negatives by construction: both
  * probe hashes derive from the already-uniform xxh64 url_hash.
  */
object SeenFilter {

  /** Bits sized for ~1% fp at `expectedPerBucket` items, k=7. */
  final case class Params(buckets: Int = 64, bitsPerBucket: Int = 1 << 16, k: Int = 7)

  object Params {
    /** Size the filter from the actual seen-set cardinality: ~10 bits/item
      * at k=7 ⇒ <1% false positives (the default 64×2^16 bits saturates —
      * ~100% FP, dead-weight prefilter — past ~4M URLs). Buckets scale with
      * the item count so each broadcast filter stays ≤ 2^26 bits (8 MiB);
      * at 10^10 URLs that is ~1526 buckets of 8 MiB — each executor only
      * needs the buckets its partition probes. */
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
    * Returns bucket → filter bytes (small: buckets × bits/8). */
  def build(spark: SparkSession, seen: DataFrame, p: Params): Map[Int, Array[Byte]] = {
    import spark.implicits._
    val agg = udaf(new BloomAgg(p.bitsPerBucket, p.k))
    seen.select(pmod(col("url_hash"), lit(p.buckets)).cast("int").as("bucket"),
        col("url_hash"))
      .groupBy(col("bucket"))
      .agg(agg(col("url_hash")).as("bloom"))
      .as[(Int, Array[Byte])]
      .collect()
      .toMap
  }

  /** Prefilter: keep candidate rows whose hash is NOT possibly-seen, plus
    * (separately) the possibly-seen rows for exact confirmation. */
  def split(spark: SparkSession, candidates: DataFrame, filters: Map[Int, Array[Byte]],
      p: Params): (DataFrame, DataFrame) = {
    val b = spark.sparkContext.broadcast(filters)
    val bits = p.bitsPerBucket
    val k = p.k
    val buckets = p.buckets
    val maybeSeen = udf { (h: Long) =>
      val bucket = java.lang.Math.floorMod(h, buckets.toLong).toInt
      b.value.get(bucket).exists(f => mightContain(f, h, bits, k))
    }
    val flagged = candidates.withColumn("__maybe", maybeSeen(col("url_hash")))
    (flagged.filter(!col("__maybe")).drop("__maybe"),
      flagged.filter(col("__maybe")).drop("__maybe"))
  }
}
