package graft.multimodal

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/**
 * JPEG codec correctness. The format is lossy, so the pin is not pixel
 * replay but CROSS-DECODER agreement: the JDK's ImageIO ships an
 * independent, battle-tested baseline JPEG implementation (test-side
 * only — never a runtime dependency), and both decoders reading the same
 * bytes must agree within the spec's IDCT rounding tolerance. Both
 * directions run: our encoder's output through ImageIO, and ImageIO's
 * encoder output (4:2:0 subsampled — the shape real crawls carry)
 * through our decoder.
 */
class JpegSpec extends SparkTestBase {
  import spark.implicits._

  private def smoothRgb(w: Int, h: Int): Array[Byte] =
    Array.tabulate(w * h * 3) { i =>
      val k = i / 3
      val x = k % w
      val y = k / w
      (i % 3 match {
        case 0 => x * 255 / math.max(1, w - 1)
        case 1 => y * 255 / math.max(1, h - 1)
        case 2 => (x + y) * 255 / math.max(1, w + h - 2)
      }).toByte
    }

  private def imageIoDecode(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "ImageIO failed to read the payload")
    val w = img.getWidth
    val h = img.getHeight
    val out = new Array[Byte](w * h * 3)
    val grayBands = img.getRaster.getNumBands == 1
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val o = (y * w + x) * 3
        if (grayBands) {
          // getRGB on TYPE_BYTE_GRAY applies a colorspace transform
          // (gamma); the raw raster sample is the decoded luma
          val g = img.getRaster.getSample(x, y, 0).toByte
          out(o) = g; out(o + 1) = g; out(o + 2) = g
        } else {
          val argb = img.getRGB(x, y)
          out(o) = ((argb >> 16) & 0xFF).toByte
          out(o + 1) = ((argb >> 8) & 0xFF).toByte
          out(o + 2) = (argb & 0xFF).toByte
        }
        x += 1
      }
      y += 1
    }
    (w, h, out)
  }

  private def imageIoEncode(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val o = (y * w + x) * 3
        img.setRGB(x, y, ((rgb(o) & 0xFF) << 16) | ((rgb(o + 1) & 0xFF) << 8)
          | (rgb(o + 2) & 0xFF))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    bos.toByteArray
  }

  private def maxAbsDiff(a: Array[Byte], b: Array[Byte]): Int = {
    assert(a.length === b.length)
    var m = 0
    var i = 0
    while (i < a.length) {
      m = math.max(m, math.abs((a(i) & 0xFF) - (b(i) & 0xFF)))
      i += 1
    }
    m
  }

  test("encode->decode round-trip stays within quantization error on smooth content") {
    val w = 40; val h = 24 // w % 8 != 0: edge-replicated partial MCUs
    val rgb = smoothRgb(w, h)
    val enc = Jpeg.encode(w, h, rgb, quality = 95)
    val Some((dw, dh, dec)) = Jpeg.decode(enc)
    assert((dw, dh) === (w, h))
    assert(maxAbsDiff(rgb, dec) <= 12,
      s"q95 smooth gradient should round-trip tightly, got ${maxAbsDiff(rgb, dec)}")
  }

  test("our encoder's bytes decode identically in ImageIO (color, gray, RST)") {
    val w = 33; val h = 17
    val rgb = smoothRgb(w, h)
    for (ri <- Seq(0, 2)) {
      val enc = Jpeg.encode(w, h, rgb, quality = 90, restartInterval = ri)
      val Some((_, _, mine)) = Jpeg.decode(enc)
      val (iw, ih, theirs) = imageIoDecode(enc)
      assert((iw, ih) === (w, h), s"ri=$ri")
      assert(maxAbsDiff(mine, theirs) <= 2,
        s"independent decoders must agree within IDCT rounding (ri=$ri), " +
          s"got ${maxAbsDiff(mine, theirs)}")
    }
    // grayscale single-component scan
    val g = Array.tabulate(w * h)(k => (k * 255 / (w * h - 1)).toByte)
    val encG = Jpeg.encode(w, h, g, quality = 90, gray = true)
    val Some((_, _, mineG)) = Jpeg.decode(encG)
    val (_, _, theirsG) = imageIoDecode(encG)
    assert(maxAbsDiff(mineG, theirsG) <= 2,
      s"gray: got ${maxAbsDiff(mineG, theirsG)}")
  }

  test("ImageIO-encoded 4:2:0 JPEGs decode to the same image as ImageIO reads") {
    val w = 48; val h = 32
    val rgb = smoothRgb(w, h)
    val enc = imageIoEncode(w, h, rgb) // default writer: 4:2:0 subsampled
    val Some((dw, dh, mine)) = Jpeg.decode(enc)
    assert((dw, dh) === (w, h))
    val (_, _, theirs) = imageIoDecode(enc)
    // different chroma upsampling kernels (ours nearest, theirs fancier):
    // smooth content bounds the divergence tightly
    assert(maxAbsDiff(mine, theirs) <= 16,
      s"4:2:0 cross-decode diverged ${maxAbsDiff(mine, theirs)}")
    val mean = mine.indices.map(i =>
      math.abs((mine(i) & 0xFF) - (theirs(i) & 0xFF))).sum.toDouble / mine.length
    assert(mean <= 2.0, s"mean cross-decode divergence $mean")
  }

  test("rejects mislabeled, truncated, and corrupt payloads without throwing") {
    val w = 24; val h = 16
    val enc = Jpeg.encode(w, h, smoothRgb(w, h))
    assert(Jpeg.decode(enc).isDefined)
    // flip SOF0 (FFC0) to SOF2 (FFC2): a baseline-shaped scan (Ss=0,
    // Se=63) is illegal inside a progressive frame - still None
    val prog = enc.clone()
    val sofAt = (0 until enc.length - 1).find(i =>
      (enc(i) & 0xFF) == 0xFF && (enc(i + 1) & 0xFF) == 0xC0).get
    prog(sofAt + 1) = 0xC2.toByte
    assert(Jpeg.decode(prog).isEmpty)
    // truncations at every region: header, tables, scan
    Seq(1, 3, 30, 200, enc.length / 2, enc.length - 3).foreach { cut =>
      Jpeg.decode(java.util.Arrays.copyOf(enc, cut)) // None or garbage, no throw
    }
    assert(Jpeg.decode(Array[Byte](0, 1, 2, 3)).isEmpty)
    assert(Jpeg.decode(null).isEmpty)
    // corrupt a Huffman table byte: must not throw
    Jpeg.decode { val c = enc.clone(); c(enc.length / 3) = 0x7F; c }
  }

  private def imageIoEncodeProgressive(w: Int, h: Int,
                                       rgb: Array[Byte]): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val o = (y * w + x) * 3
        img.setRGB(x, y, ((rgb(o) & 0xFF) << 16) | ((rgb(o + 1) & 0xFF) << 8)
          | (rgb(o + 2) & 0xFF))
        x += 1
      }
      y += 1
    }
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    writer.dispose(); ios.close()
    val bytes = bos.toByteArray
    // sanity: the writer really emitted SOF2
    assert((0 until bytes.length - 1).exists(i =>
      (bytes(i) & 0xFF) == 0xFF && (bytes(i + 1) & 0xFF) == 0xC2),
      "ImageIO progressive fixture must contain SOF2")
    bytes
  }

  test("progressive encode->decode round-trips; ImageIO agrees both directions") {
    val w = 41; val h = 23 // partial MCUs on both axes
    val rgb = smoothRgb(w, h)
    for (ri <- Seq(0, 3)) {
      val enc = Jpeg.encodeProgressive(w, h, rgb, quality = 92,
        restartInterval = ri)
      // our own decoder
      val Some((dw, dh, mine)) = Jpeg.decode(enc)
      assert((dw, dh) === (w, h), s"ri=$ri")
      assert(maxAbsDiff(rgb, mine) <= 14,
        s"q92 smooth progressive round-trip (ri=$ri): ${maxAbsDiff(rgb, mine)}")
      // an independent decoder reads our progressive stream identically
      val (iw, ih, theirs) = imageIoDecode(enc)
      assert((iw, ih) === (w, h))
      assert(maxAbsDiff(mine, theirs) <= 2,
        s"cross-decoder progressive divergence (ri=$ri): " +
          s"${maxAbsDiff(mine, theirs)}")
    }
    // grayscale progressive: DC scan + single AC scan
    val g = Array.tabulate(w * h)(k => (k * 255 / (w * h - 1)).toByte)
    val encG = Jpeg.encodeProgressive(w, h, g, quality = 92, gray = true)
    val Some((_, _, mineG)) = Jpeg.decode(encG)
    val (_, _, theirsG) = imageIoDecode(encG)
    assert(maxAbsDiff(mineG, theirsG) <= 2,
      s"gray progressive: ${maxAbsDiff(mineG, theirsG)}")
  }

  test("ImageIO-written progressive (successive approximation) decodes") {
    // the JDK writer emits a libjpeg-style multi-scan script with DC/AC
    // successive approximation AND 4:2:0 subsampling - the refinement
    // scan kinds our own encoder does not produce
    val w = 48; val h = 32
    val rgb = smoothRgb(w, h)
    val enc = imageIoEncodeProgressive(w, h, rgb)
    val Some((dw, dh, mine)) = Jpeg.decode(enc)
    assert((dw, dh) === (w, h))
    val (_, _, theirs) = imageIoDecode(enc)
    assert(maxAbsDiff(mine, theirs) <= 16,
      s"progressive 4:2:0 cross-decode diverged ${maxAbsDiff(mine, theirs)}")
    val mean = mine.indices.map(i =>
      math.abs((mine(i) & 0xFF) - (theirs(i) & 0xFF))).sum.toDouble / mine.length
    assert(mean <= 2.0, s"mean progressive cross-decode divergence $mean")
  }

  test("progressive corrupt/truncated payloads are total") {
    val w = 32; val h = 24
    val enc = Jpeg.encodeProgressive(w, h, smoothRgb(w, h), quality = 90)
    assert(Jpeg.decode(enc).isDefined)
    Seq(1, 3, 30, 200, enc.length / 2, enc.length - 3).foreach { cut =>
      Jpeg.decode(java.util.Arrays.copyOf(enc, cut)) // None or garbage, no throw
    }
    // corrupt entropy bytes mid-stream: must not throw
    Jpeg.decode { val c = enc.clone(); c(enc.length / 2) = 0x55; c }
    Jpeg.decode { val c = enc.clone(); c(2 * enc.length / 3) = 0xFF.toByte; c }
  }

  test("fixture rows all decode with exact dimensions through the Spark path") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(60)
    val meta = Multimodal.jpegMeta(
      Multimodal.syntheticJpegMedia(docs, "doc_id", "text"))
    val rows = meta.as[(Long, Int, Int, Boolean)].collect()
    assert(rows.length === 60)
    rows.foreach { case (id, w, h, ok) =>
      assert(ok, s"doc $id must fully decode")
      assert(w === 16 + (id % 16).toInt && h === 16 + (id % 8).toInt)
    }
    // and the dispatch integration: JPEG payloads flow through
    // decodeFrames/extractFeatures like every other container
    val media = Multimodal.syntheticJpegMedia(docs, "doc_id", "text")
    val feats = Multimodal.extractFeatures(media)
    assert(feats.filter(f => f.byte_len <= 0).count() === 0)
  }
}
