package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

/** Real-codec multimodal decode: JDK ImageIO images + javax.sound WAV.
  * Goldens here are built INDEPENDENTLY of the generator (hand-encoded
  * images with known pixels), so decode correctness is not a round trip
  * through the code under test. */
class MultimodalSpec extends AnyFunSuite {

  System.setProperty("graft.kernel.root", "/tmp/graft_kernel_test")

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("multimodal-spec")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def encode(img: BufferedImage, fmt: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    assert(ImageIO.write(img, fmt, bos), s"no $fmt writer")
    bos.toByteArray
  }

  private def knownImage(w: Int, h: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, (x * 31 + y * 17) & 0xFFFFFF)
    img
  }

  test("decode reads real PNG dimensions, channels and pixels") {
    val blob = encode(knownImage(20, 10), "png")
    val d = Multimodal.decode(blob).get
    assert(d.meta.format == "png")
    assert(d.meta.width == 20 && d.meta.height == 10)
    assert(d.meta.channels == 3)
    assert(d.meta.nFrames == 1L)
    // PNG is lossless: decoded ARGB must equal the source pixels exactly
    val expected = (for (y <- 0 until 10; x <- 0 until 20)
      yield 0xFF000000 | ((x * 31 + y * 17) & 0xFFFFFF)).toArray
    assert(d.pixels.sameElements(expected))
  }

  test("pixel hash is over DECODED content: png and bmp of the same pixels agree") {
    val img = knownImage(24, 16)
    val png = Multimodal.decode(encode(img, "png")).get
    val bmp = Multimodal.decode(encode(img, "bmp")).get
    assert(png.meta.format == "png" && bmp.meta.format == "bmp")
    assert(Multimodal.pixelHash(png) == Multimodal.pixelHash(bmp))
    // jpeg is lossy: dimensions survive, content hash may differ
    val jpg = Multimodal.decode(encode(img, "jpeg")).get
    assert(jpg.meta.width == 24 && jpg.meta.height == 16)
  }

  test("channel means are the real per-channel pixel averages") {
    // 2x1 image: pixels (255,0,0) and (0,0,255) -> means R=127.5, G=0, B=127.5
    val img = new BufferedImage(2, 1, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xFF0000); img.setRGB(1, 0, 0x0000FF)
    val d = Multimodal.decode(encode(img, "png")).get
    val m = Multimodal.channelMeans(d)
    assert(m.length == 3)
    assert(m(0) == 127.5 && m(1) == 0.0 && m(2) == 127.5)
  }

  test("wav decode recovers channel count, frame count and samples") {
    val blob = Multimodal.synthesizeBlob(9L) // format id 4 not guaranteed; find a wav id
    val wavId = (0L until 64L).find(i =>
      Multimodal.sniffFormat(Multimodal.synthesizeBlob(i)).contains("wav")).get
    val _ = blob
    val d = Multimodal.decode(Multimodal.synthesizeBlob(wavId)).get
    assert(d.meta.format == "wav")
    assert(d.meta.channels == 1)
    assert(d.samples.length.toLong == d.meta.nFrames)
    assert(d.meta.nFrames >= 400L && d.meta.nFrames < 2000L)
    assert(d.pixels.isEmpty)
  }

  test("decompression-bomb guard: declared gigapixel dimensions rejected at header cost") {
    // hand-build a PNG whose IHDR declares 60000x60000 (3.6 Gpx) with no
    // real pixel data: the guard must reject from the header without
    // attempting the multi-GB pixel allocation
    val bos = new ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', 13, 10, 26, 10))
    val ihdr = new ByteArrayOutputStream()
    val d = new java.io.DataOutputStream(ihdr)
    d.writeBytes("IHDR"); d.writeInt(60000); d.writeInt(60000)
    d.writeByte(8); d.writeByte(2); d.writeByte(0); d.writeByte(0); d.writeByte(0)
    val body = ihdr.toByteArray
    out.writeInt(body.length - 4)
    out.write(body)
    val crc = new java.util.zip.CRC32(); crc.update(body)
    out.writeInt(crc.getValue.toInt)
    val bomb = bos.toByteArray
    assert(Multimodal.sniffFormat(bomb).contains("png"))
    assert(Multimodal.decode(bomb).isEmpty)
    // sanity: the guard threshold still admits every generator size
    assert(64L * 64L <= Multimodal.MaxPixels)
  }

  test("animated GIF: hand-built 2-frame sequence reports nFrames=2, stills stay 1") {
    // hand-encode via the writer's sequence API — independent of the
    // generator's writeAnimated path in what it asserts (frame COUNT comes
    // back from the reader's stream scan, not from our own bookkeeping)
    val bos = new ByteArrayOutputStream()
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val ios = ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    writer.writeToSequence(new javax.imageio.IIOImage(knownImage(12, 8), null, null), null)
    writer.writeToSequence(new javax.imageio.IIOImage(knownImage(12, 8), null, null), null)
    writer.endWriteSequence()
    writer.dispose(); ios.close()
    val d = Multimodal.decode(bos.toByteArray).get
    assert(d.meta.format == "gif")
    assert(d.meta.nFrames == 2L)
    assert(d.meta.width == 12 && d.meta.height == 8)
    // a still GIF through the plain writer stays nFrames=1
    val still = Multimodal.decode(encode(knownImage(12, 8), "gif")).get
    assert(still.meta.nFrames == 1L)
  }

  test("generator emits animated GIFs; their pixels decode from frame 0") {
    val gifs = (0L until 400L).map(Multimodal.synthesizeBlob)
      .filter(b => Multimodal.sniffFormat(b).contains("gif"))
      .map(b => Multimodal.decode(b).get)
    assert(gifs.nonEmpty)
    val animated = gifs.filter(_.meta.nFrames > 1L)
    assert(animated.nonEmpty, "the deterministic subset of animated GIFs must appear")
    assert(animated.forall(d => d.pixels.length == d.meta.width * d.meta.height))
    assert(gifs.exists(_.meta.nFrames == 1L), "still GIFs must remain too")
  }

  test("chunked pixel hash: single-chunk path equals a direct whole-buffer hash; multi-chunk chains") {
    val d = Multimodal.decode(encode(knownImage(20, 10), "png")).get
    val bb = java.nio.ByteBuffer.allocate(d.pixels.length * 4)
    d.pixels.foreach(bb.putInt)
    assert(Multimodal.pixelHash(d) == graft.core.UrlNorm.xxh64(bb.array(), 63L),
      "sub-4MB media must hash exactly as one buffer")
    // >1 chunk (4 MB = 1M pixels): expected value is the explicit chain
    val big = Multimodal.Decoded(
      Multimodal.MediaMeta("png", 1500, 1000, 3, 1L),
      Array.tabulate(1500 * 1000)(i => i * 2654435761L.toInt), Array.emptyShortArray)
    val chunkInts = (1 << 22) / 4
    var h = 63L
    big.pixels.grouped(chunkInts).foreach { chunk =>
      val cb = java.nio.ByteBuffer.allocate(chunk.length * 4)
      chunk.foreach(cb.putInt)
      h = graft.core.UrlNorm.xxh64(cb.array(), h)
    }
    assert(Multimodal.pixelHash(big) == h)
  }

  test("corrupt and unknown blobs decode to None, not an exception") {
    assert(Multimodal.decode(null).isEmpty)
    assert(Multimodal.decode(Array.emptyByteArray).isEmpty)
    assert(Multimodal.decode(Array.fill[Byte](64)(0x41)).isEmpty)
    // valid PNG magic, garbage body
    val fake = Array[Byte](0x89.toByte, 'P', 'N', 'G', 13, 10, 26, 10) ++
      Array.fill[Byte](32)(7)
    assert(Multimodal.decode(fake).isEmpty)
  }

  test("distributed decode pipeline: every synthesized blob decodes; formats cover all five codecs") {
    val media = Multimodal.mediaTable(spark, 500)
    val out = Multimodal.decodeAndFeaturize(spark, media)
    val rows = out.collect()
    assert(rows.length == 500, "every real encoded blob must decode")
    val formats = rows.map(_.getAs[String]("format")).toSet
    assert(formats == Set("png", "jpeg", "bmp", "gif", "wav"))
    // decode is deterministic across runs (same partitioning or not)
    val again = Multimodal.decodeAndFeaturize(spark, media.repartition(3))
      .collect().map(r => (r.getAs[Long]("media_id"), r.getAs[Long]("pixel_hash"))).toMap
    rows.foreach(r => assert(
      again(r.getAs[Long]("media_id")) == r.getAs[Long]("pixel_hash")))
  }
}
