package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** Multimodal-column handling for a training-data pipeline: media as
  * opaque `binary` columns, decoded and featurized per-partition in
  * batches (the Scala analogue of `mapInPandas`: one iterator of rows in,
  * one out, no per-row UDF dispatch).
  *
  * The decode step is REAL: PNG/JPEG/BMP/GIF via the JDK's bundled
  * `javax.imageio.ImageIO` and WAV (PCM) via `javax.sound.sampled` — both
  * ship in `java.desktop`, zero extra dependencies. The generator likewise
  * encodes real bytes with the same codecs, so the pipeline exercises a
  * genuine encode → binary column → distributed decode round trip;
  * q63's oracle independently re-aggregates the per-row decoded
  * width/height/channels/pixel-hash rows.
  *
  * Scale notes (100 TB of media): blobs stay opaque binary until the
  * mapPartitions decode — Parquet scans prune to (media_id, blob), no
  * driver-side materialization, and per-task memory is one decoded item at
  * a time (the iterator is consumed lazily). Formats the codec cannot
  * parse yield None and are filtered, the usual corrupt-sample discipline
  * of a crawl-derived media corpus.
  */
object Multimodal {

  // ImageIO's default stream cache backs every created image input/output
  // stream with a DISK temp file — one create/write/read/delete cycle per
  // encoded and per decoded item, pure syscall overhead when the blobs are
  // already in-memory byte arrays. Memory-cached streams carry the exact
  // same bytes, so every decode/encode result is bit-identical (the pinned
  // pixel hashes in MultimodalSpec and q63's xor-fold oracle gate this).
  // Set once per JVM at object load (driver and executors alike).
  ImageIO.setUseCache(false)

  /** Decoded media: still images have nFrames=1, an animated GIF its real
    * frame count (pixels/features stay frame-0); audio reports PCM frame
    * count in nFrames and (0,0) spatial dims. `channels` is the color
    * model's component count for images (gray 1, RGB 3, RGBA 4 — a
    * palette GIF reports its expanded RGB components) and the channel
    * count for audio. */
  final case class MediaMeta(format: String, width: Int, height: Int,
      channels: Int, nFrames: Long)

  /** Decoded payload: exactly one of pixels (ARGB row-major) / samples
    * (PCM 16-bit) is non-empty. */
  final case class Decoded(meta: MediaMeta, pixels: Array[Int],
      samples: Array[Short])

  // ---------------------------------------------------------------- sniff

  /** Container sniffing from magic bytes (the real-world step: a crawled
    * blob's claimed content-type is untrusted). */
  def sniffFormat(blob: Array[Byte]): Option[String] = {
    if (blob == null || blob.length < 12) return None
    def b(i: Int) = blob(i) & 0xFF
    if (b(0) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') Some("png")
    else if (b(0) == 0xFF && b(1) == 0xD8) Some("jpeg")
    else if (b(0) == 'B' && b(1) == 'M') Some("bmp")
    else if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') Some("gif")
    else if (b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') Some("wav")
    else None
  }

  // --------------------------------------------------------------- decode

  /** Real decode. Returns None for unrecognized/corrupt blobs (no throw —
    * corrupt samples are data, not errors, in a crawled corpus). */
  def decode(blob: Array[Byte], maxPixels: Long = MaxPixels): Option[Decoded] =
    sniffFormat(blob).flatMap {
      case "wav" => decodeWav(blob)
      case fmt => decodeImage(blob, fmt, maxPixels)
    }

  /** Decompression-bomb guard: a few-KB container can declare gigapixel
    * dimensions and OOM the task on pixel allocation. Read the header's
    * dimensions FIRST (no pixel decode) and reject oversized images —
    * at corpus scale a malicious sample must cost O(header), not a task.
    *
    * Peak per-task decode memory is ~8 bytes/pixel — the BufferedImage
    * raster plus the getRGB int array (the former third full copy inside
    * [[pixelHash]] is now a reused 4 MB chunk) — so the default admits
    * ≤512 MB transient per in-flight item. Tune per deployment via the
    * `maxPixels` parameter on [[decode]]. */
  val MaxPixels: Long = 64L * 1024 * 1024

  private def decodeImage(blob: Array[Byte], fmt: String,
      maxPixels: Long): Option[Decoded] =
    try {
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(blob))
      try {
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return None
        val reader = readers.next()
        try {
          // GIF needs a searchable stream: getNumImages(allowSearch=true)
          // throws under seekForwardOnly (the stream is in-memory either way)
          reader.setInput(iis, fmt != "gif", true)
          val w = reader.getWidth(0)
          val h = reader.getHeight(0)
          if (w.toLong * h > maxPixels) return None
          // frame count: real for GIF (the one container here that can
          // animate). getNumImages(true) is a stream scan — O(blob bytes),
          // already bounded by the fetch pipeline's 5 MB body gate — and
          // allocation stays bounded regardless: pixels come from frame 0
          // only (features are frame-0 + frame count, the usual
          // frame-sample discipline for corpus media).
          val frames =
            if (fmt == "gif") math.max(1, reader.getNumImages(true)).toLong
            else 1L
          val img = reader.read(0)
          val px = img.getRGB(0, 0, w, h, null, 0, w)
          Some(Decoded(
            MediaMeta(fmt, w, h, img.getColorModel.getNumComponents, frames),
            px, Array.emptyShortArray))
        } finally reader.dispose()
      } finally if (iis != null) iis.close()
    } catch { case _: Exception => None }

  private def decodeWav(blob: Array[Byte]): Option[Decoded] =
    try {
      val ain = AudioSystem.getAudioInputStream(new ByteArrayInputStream(blob))
      val af = ain.getFormat
      if (af.getSampleSizeInBits != 16) { ain.close(); None }
      else {
        val bytes = ain.readAllBytes()
        ain.close()
        val n = bytes.length / 2
        val samples = new Array[Short](n)
        var i = 0
        while (i < n) {
          // PCM 16-bit little-endian (the generator's AudioFormat)
          samples(i) = ((bytes(2 * i) & 0xFF) | (bytes(2 * i + 1) << 8)).toShort
          i += 1
        }
        Some(Decoded(
          MediaMeta("wav", 0, 0, af.getChannels, ain.getFrameLength max n / af.getChannels),
          Array.emptyIntArray, samples))
      }
    } catch { case _: Exception => None }

  // ------------------------------------------------------------- features

  /** Content fingerprint over the DECODED data (not the container bytes):
    * two encodings of the same pixels (png vs bmp) hash identically.
    * Hashed in reused 4 MB chunks (hash-chaining xxh64: each chunk seeds
    * the next) rather than one full-copy buffer — a max-size image's hash
    * no longer adds a third ~256 MB transient to the decode's peak. */
  def pixelHash(d: Decoded): Long = {
    val ChunkBytes = 1 << 22
    // buffer sized to min(chunk, payload): a full 4 MB allocation PER ITEM
    // dominated the decode stage's allocation rate on small-media corpora
    // (2000 thumbnails ⇒ ~8 GB of dead buffers). Chunk BOUNDARIES are
    // unchanged — payloads ≤ 4 MB were a single chunk before and still
    // are; larger payloads still flush at exactly 4 MB — so the chained
    // hash is bit-identical.
    val needed =
      if (d.pixels.nonEmpty) d.pixels.length.toLong * 4
      else d.samples.length.toLong * 2
    val buf = new Array[Byte](math.max(1L, math.min(ChunkBytes.toLong, needed)).toInt)
    var h = 63L
    var filled = 0
    def flush(): Unit = if (filled > 0) {
      val b = if (filled == ChunkBytes) buf else java.util.Arrays.copyOf(buf, filled)
      h = graft.core.UrlNorm.xxh64(b, h)
      filled = 0
    }
    if (d.pixels.nonEmpty) {
      var i = 0
      while (i < d.pixels.length) {
        val p = d.pixels(i)
        buf(filled) = (p >>> 24).toByte; buf(filled + 1) = (p >>> 16).toByte
        buf(filled + 2) = (p >>> 8).toByte; buf(filled + 3) = p.toByte
        filled += 4
        if (filled == ChunkBytes) flush()
        i += 1
      }
    } else {
      var i = 0
      while (i < d.samples.length) {
        val s = d.samples(i)
        buf(filled) = (s >> 8).toByte; buf(filled + 1) = s.toByte
        filled += 2
        if (filled == ChunkBytes) flush()
        i += 1
      }
    }
    flush()
    h
  }

  /** Per-channel means of the decoded data — the feature-extraction stand-in
    * with the same batch shape as an embedding-model invocation. Images:
    * mean R/G/B (0-255, and mean alpha first if the model has 4
    * components); audio: mean absolute amplitude per channel. */
  def channelMeans(d: Decoded): Array[Double] = {
    if (d.pixels.nonEmpty) {
      var r = 0L; var g = 0L; var b = 0L; var a = 0L
      var i = 0
      while (i < d.pixels.length) {
        val p = d.pixels(i)
        a += (p >>> 24) & 0xFF; r += (p >>> 16) & 0xFF
        g += (p >>> 8) & 0xFF; b += p & 0xFF
        i += 1
      }
      val n = d.pixels.length.toDouble
      if (d.meta.channels == 4) Array(a / n, r / n, g / n, b / n)
      else if (d.meta.channels == 1) Array((r + g + b) / (3.0 * n))
      else Array(r / n, g / n, b / n)
    } else {
      val ch = math.max(1, d.meta.channels)
      val sums = new Array[Long](ch)
      val counts = new Array[Long](ch)
      var i = 0
      while (i < d.samples.length) {
        val c = i % ch
        sums(c) += math.abs(d.samples(i).toLong)
        counts(c) += 1
        i += 1
      }
      sums.zip(counts).map { case (s, n) => if (n == 0) 0.0 else s.toDouble / n }
    }
  }

  /** "Frame sampling" (video/audio analogue): byte offsets of every k-th
    * frame — rows for images, PCM frames for audio — capped at 8. */
  def sampleFrameOffsets(d: Decoded, everyK: Int): Seq[Int] = {
    val frameSize =
      if (d.pixels.nonEmpty) d.meta.width * 4
      else d.meta.channels * 2
    val total = if (d.pixels.nonEmpty) d.pixels.length * 4 else d.samples.length * 2
    if (frameSize <= 0) Seq.empty
    else (0 until total by frameSize * everyK).take(8)
  }

  // ------------------------------------------------------------ generator

  /** Deterministic synthetic media blob for `id`: REAL encoded bytes —
    * png/jpeg/bmp/gif via ImageIO, wav via AudioSystem — with
    * id-seeded content. */
  def synthesizeBlob(id: Long): Array[Byte] = {
    val h = graft.core.UrlNorm.xxh64(BigInt(id).toByteArray, 7L)
    java.lang.Math.floorMod(h, 5L).toInt match {
      case 4 => synthesizeWav(h)
      case 3 =>
        // every 4th GIF is ANIMATED (2-4 frames) so the decoded n_frames
        // field is exercised beyond the still-image constant 1
        val frames =
          if (java.lang.Math.floorMod(h >> 24, 4L) == 0L)
            2 + java.lang.Math.floorMod(h >> 28, 3L).toInt
          else 1
        synthesizeImage(h, "gif", frames)
      case f => synthesizeImage(h, Seq("png", "jpeg", "bmp")(f))
    }
  }

  private def frameImage(h: Long, w: Int, ht: Int, frame: Int): BufferedImage = {
    val img = new BufferedImage(w, ht, BufferedImage.TYPE_INT_RGB)
    var x = (h + frame * 0x9E3779B97F4A7C15L) | 1L
    var yy = 0
    while (yy < ht) {
      var xx = 0
      while (xx < w) {
        x = x * 6364136223846793005L + 1442695040888963407L
        img.setRGB(xx, yy, ((x >>> 24) & 0xFFFFFF).toInt)
        xx += 1
      }
      yy += 1
    }
    img
  }

  private def synthesizeImage(h: Long, fmt: String, nFrames: Int = 1): Array[Byte] = {
    val w = 16 + java.lang.Math.floorMod(h >> 8, 48L).toInt
    val ht = 16 + java.lang.Math.floorMod(h >> 16, 48L).toInt
    val bos = new ByteArrayOutputStream()
    if (nFrames <= 1) ImageIO.write(frameImage(h, w, ht, 0), fmt, bos)
    else writeAnimated(fmt, bos,
      (0 until nFrames).map(f => frameImage(h, w, ht, f)))
    bos.toByteArray
  }

  /** Multi-frame encode via the writer's sequence API (GIF here — the one
    * bundled codec that animates). */
  private def writeAnimated(fmt: String, bos: ByteArrayOutputStream,
      frames: Seq[BufferedImage]): Unit = {
    val writer = ImageIO.getImageWritersByFormatName(fmt).next()
    val ios = ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach(img =>
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null))
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
  }

  private def synthesizeWav(h: Long): Array[Byte] = {
    val n = 400 + java.lang.Math.floorMod(h >> 8, 1600L).toInt
    val pcm = new Array[Byte](n * 2)
    var x = h | 1L
    var i = 0
    while (i < n) {
      x = x * 6364136223846793005L + 1442695040888963407L
      val v = (x >>> 48).toShort
      pcm(2 * i) = v.toByte
      pcm(2 * i + 1) = (v >> 8).toByte
      i += 1
    }
    val af = new AudioFormat(8000f, 16, 1, true, false)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new ByteArrayInputStream(pcm), af, n.toLong),
      AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** The media table: (media_id, blob) — real encoded binary column. */
  def mediaTable(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    spark.range(n).repartition(spark.sparkContext.defaultParallelism).as[Long]
      .map(id => (id, synthesizeBlob(id)))
      .toDF("media_id", "blob")
  }

  /** Batched decode + feature extraction via mapPartitions (mapInPandas
    * shape: iterator in, iterator out; decode cost amortizes over the
    * batch, corrupt blobs drop out via flatMap). */
  def decodeAndFeaturize(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.flatMap { case (id, blob) =>
          decode(blob).map { d =>
            val means = channelMeans(d)
            val frames = sampleFrameOffsets(d, everyK = 4)
            (id, d.meta.format, d.meta.width, d.meta.height, d.meta.channels,
              blob.length, d.meta.nFrames, pixelHash(d), means, frames.length)
          }
        }
      }
      .toDF("media_id", "format", "width", "height", "channels",
        "size_bytes", "n_frames", "pixel_hash", "channel_means",
        "n_sampled_frames")
  }
}
