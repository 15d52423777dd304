package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for a training-data pipeline: media as
  * opaque `binary` columns with typed metadata, processed per-partition in
  * batches (the Scala analogue of `mapInPandas`: one buffer of rows in,
  * one buffer out, columnar-friendly batch shape).
  *
  * The container has no image/audio codecs, so the DECODE STEP IS A STUB:
  * blobs are synthesized with a deterministic 16-byte header
  * (magic|format|width|height|channels) + xxh64-seeded payload, and
  * "decode" parses that header — clearly marked fake. Everything around
  * it (schema, partitioning, batch iteration, feature aggregation,
  * frame sampling) is the real Spark plumbing a codec-backed UDF would
  * drop into.
  */
object Multimodal {

  val Magic: Int = 0x47524654 // "GRFT"

  final case class MediaMeta(format: String, width: Int, height: Int, channels: Int)

  private val Formats = Seq("png", "jpeg", "webp", "wav")

  /** Deterministic synthetic blob for id: header + pseudo-random payload. */
  def synthesizeBlob(id: Long): Array[Byte] = {
    val h = graft.core.UrlNorm.xxh64(BigInt(id).toByteArray, 7L)
    val fmt = (java.lang.Math.floorMod(h, 4L)).toInt
    val w = 16 + java.lang.Math.floorMod(h >> 8, 48L).toInt
    val ht = 16 + java.lang.Math.floorMod(h >> 16, 48L).toInt
    val ch = if (fmt == 3) 1 else 3
    val payload = new Array[Byte](w * ht * ch)
    var i = 0
    var x = h | 1L
    while (i < payload.length) {
      x = x * 6364136223846793005L + 1442695040888963407L
      payload(i) = (x >>> 56).toByte
      i += 1
    }
    val buf = java.nio.ByteBuffer.allocate(16 + payload.length)
    buf.putInt(Magic).putInt(fmt).putShort(w.toShort).putShort(ht.toShort)
      .putShort(ch.toShort).putShort(0)
    buf.put(payload)
    buf.array()
  }

  /** STUB decode — parses the synthetic header. A real deployment replaces
    * this body with an actual codec call; the signature and batch shape
    * stay identical. */
  def decodeStub(blob: Array[Byte]): Option[MediaMeta] = {
    if (blob == null || blob.length < 16) return None
    val buf = java.nio.ByteBuffer.wrap(blob)
    if (buf.getInt() != Magic) return None
    val fmt = buf.getInt()
    val w = buf.getShort().toInt
    val h = buf.getShort().toInt
    val ch = buf.getShort().toInt
    Some(MediaMeta(Formats(fmt % Formats.length), w, h, ch))
  }

  /** Per-channel mean of the payload — the "feature extraction" stand-in
    * (same batch shape as an embedding model invocation). */
  def channelMeans(blob: Array[Byte], meta: MediaMeta): Array[Double] = {
    val sums = new Array[Long](meta.channels)
    val counts = new Array[Long](meta.channels)
    var i = 16
    var c = 0
    while (i < blob.length) {
      sums(c) += (blob(i) & 0xFF)
      counts(c) += 1
      c = (c + 1) % meta.channels
      i += 1
    }
    sums.zip(counts).map { case (s, n) => if (n == 0) 0.0 else s.toDouble / n }
  }

  /** "Frame sampling": every k-th row-stride of the payload (the video
    * analogue — offsets are real, frames are the stub payload). */
  def sampleFrames(blob: Array[Byte], meta: MediaMeta, everyK: Int): Seq[Int] = {
    val frameSize = meta.width * meta.channels
    if (frameSize == 0) Seq.empty
    else (16 until blob.length by frameSize * everyK).map(identity).take(8)
  }

  /** The media table: (media_id, blob, lang) — binary column + metadata. */
  def mediaTable(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    spark.range(n).repartition(16).as[Long]
      .map(id => (id, synthesizeBlob(id)))
      .toDF("media_id", "blob")
  }

  /** Batched decode + feature extraction via mapPartitions (mapInPandas
    * shape: iterator of rows in, iterator of rows out, no per-row UDF
    * dispatch overhead). */
  def decodeAndFeaturize(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.flatMap { case (id, blob) =>
          decodeStub(blob).map { meta =>
            val means = channelMeans(blob, meta)
            val frames = sampleFrames(blob, meta, everyK = 4)
            (id, meta.format, meta.width, meta.height, meta.channels,
              blob.length, means, frames.length)
          }
        }
      }
      .toDF("media_id", "format", "width", "height", "channels",
        "size_bytes", "channel_means", "n_sampled_frames")
  }
}
