package graft.multimodal

/**
 * JPEG (ITU T.81) codec, dependency-free — the image container crawl
 * data actually arrives in. The DECODER is the production artifact:
 * baseline/extended sequential (SOF0/SOF1) AND progressive (SOF2 — all
 * four Annex G scan kinds, including successive-approximation
 * refinement), grayscale or YCbCr with any 1–2 sampling factors (4:4:4,
 * 4:2:2, 4:2:0), multiple DQT/DHT segments, restart markers (DRI/RSTn),
 * APPn/COM skipping, entropy-stream byte de-stuffing, and a
 * double-precision separable IDCT. Corrupt, truncated,
 * arithmetic-coded, lossless, and 12-bit inputs all yield None —
 * never a task failure (the [[Multimodal.decodeFrames]] contract).
 *
 * The ENCODER exists for fixtures and specs: 4:4:4 (or grayscale),
 * quality-scaled quantization tables, optional restart intervals, and the
 * standard Annex K Huffman tables (libjpeg's DHT validator rejects
 * self-invented layouts even when canonically valid, so standard tables
 * are the portability choice) — any conformant decoder (the spec
 * cross-checks against the JDK's ImageIO) reads the output.
 *
 * JPEG is lossy, so unlike P6/BMP/PNG/GIF the decoded pixels are not
 * bit-replayable in a SQL oracle; correctness is pinned by (a) the
 * metadata-exact `media_jpeg_meta` query (dimensions + decodability
 * through the real parser) and (b) ImageIO cross-check specs asserting
 * per-pixel agreement within the IDCT rounding tolerance.
 */
object Jpeg {

  // ------------------------------------------------------------------
  // Shared constants
  // ------------------------------------------------------------------

  /** Zig-zag order: zigzag(i) = raster index of the i-th scanned coeff. */
  private val Zigzag: Array[Int] = {
    val out = new Array[Int](64)
    var i = 0
    var x = 0; var y = 0
    var up = true
    while (i < 64) {
      out(i) = y * 8 + x
      if (up) {
        if (x == 7) { y += 1; up = false }
        else if (y == 0) { x += 1; up = false }
        else { x += 1; y -= 1 }
      } else {
        if (y == 7) { x += 1; up = true }
        else if (x == 0) { y += 1; up = true }
        else { x -= 1; y += 1 }
      }
      i += 1
    }
    out
  }

  /** Annex-K-shaped base quantization tables (luma, chroma). */
  private val BaseQLuma = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)
  private val BaseQChroma = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  /** libjpeg's quality→scale mapping over the base tables. */
  private def scaledQ(base: Array[Int], quality: Int): Array[Int] = {
    val q = math.max(1, math.min(100, quality))
    val scale = if (q < 50) 5000 / q else 200 - 2 * q
    base.map(v => math.max(1, math.min(255, (v * scale + 50) / 100)))
  }

  // ------------------------------------------------------------------
  // DCT (double-precision separable — decode batches are mapPartitions
  // work; clarity over the last 2x of a fixed small constant)
  // ------------------------------------------------------------------

  private val CosTable: Array[Double] = {
    val t = new Array[Double](64) // t(u*8 + x) = cos((2x+1)uπ/16)
    var u = 0
    while (u < 8) {
      var x = 0
      while (x < 8) {
        t(u * 8 + x) = math.cos((2 * x + 1) * u * math.Pi / 16)
        x += 1
      }
      u += 1
    }
    t
  }

  /** In-place 8x8 inverse DCT: `coeffs` raster-order → spatial samples
    * (still centered on 0; caller level-shifts +128). */
  private def idct8x8(coeffs: Array[Double], out: Array[Double]): Unit = {
    val tmp = new Array[Double](64)
    // rows: for each row y, spatial x from frequency u
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) {
          val cu = if (u == 0) 0.70710678118654752 else 1.0
          s += cu * coeffs(y * 8 + u) * CosTable(u * 8 + x)
          u += 1
        }
        tmp(y * 8 + x) = s / 2
        x += 1
      }
      y += 1
    }
    var x = 0
    while (x < 8) {
      var yy = 0
      while (yy < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) {
          val cv = if (v == 0) 0.70710678118654752 else 1.0
          s += cv * tmp(v * 8 + x) * CosTable(v * 8 + yy)
          v += 1
        }
        out(yy * 8 + x) = s / 2
        yy += 1
      }
      x += 1
    }
  }

  /** Forward 8x8 DCT (encoder side), raster in, raster out. */
  private def fdct8x8(px: Array[Double], out: Array[Double]): Unit = {
    val tmp = new Array[Double](64)
    var y = 0
    while (y < 8) {
      var u = 0
      while (u < 8) {
        var s = 0.0
        var x = 0
        while (x < 8) {
          s += px(y * 8 + x) * CosTable(u * 8 + x)
          x += 1
        }
        val cu = if (u == 0) 0.70710678118654752 else 1.0
        tmp(y * 8 + u) = s * cu / 2
        u += 1
      }
      y += 1
    }
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0.0
        var yy = 0
        while (yy < 8) {
          s += tmp(yy * 8 + u) * CosTable(v * 8 + yy)
          yy += 1
        }
        val cv = if (v == 0) 0.70710678118654752 else 1.0
        out(v * 8 + u) = s * cv / 2
        v += 1
      }
      u += 1
    }
  }

  // ------------------------------------------------------------------
  // Huffman tables
  // ------------------------------------------------------------------

  /** A decodable Huffman table: canonical codes from DHT's BITS/HUFFVAL,
    * looked up bit-by-bit via (code, length) → symbol. `lookup(len)` maps
    * code values of that length; `minCode`/`maxCode` bound validity. */
  private final class HuffTable(bits: Array[Int], vals: Array[Byte]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    var ok = true
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += bits(l - 1)
        k += bits(l - 1)
        maxCode(l) = code - 1 // inclusive; -1 when none of this length
        if (bits(l - 1) == 0) maxCode(l) = minCode(l) - 1
        if (code > (1 << l)) ok = false // Kraft violation: overfull table
        code <<= 1
        l += 1
      }
      ok = ok && k == vals.length && k > 0 && k <= 256
    }
    def symbol(len: Int, code: Int): Int = {
      if (len < 1 || len > 16) return -1
      if (maxCode(len) < minCode(len) || code < minCode(len) ||
        code > maxCode(len)) return -1
      vals(valPtr(len) + code - minCode(len)) & 0xFF
    }
  }

  /** Encoder-side canonical code assignment from the same BITS/HUFFVAL. */
  private final class HuffEncoder(bits: Array[Int], vals: Array[Byte]) {
    val codeOf = new Array[Int](256)
    val lenOf = new Array[Int](256)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        var i = 0
        while (i < bits(l - 1)) {
          codeOf(vals(k) & 0xFF) = code
          lenOf(vals(k) & 0xFF) = l
          code += 1
          k += 1
          i += 1
        }
        code <<= 1
        l += 1
      }
    }
  }

  // The standard ITU T.81 Annex K Huffman tables (the ones every baseline
  // encoder ships; libjpeg's DHT validator rejects degenerate layouts, so
  // self-invented tables — even canonically valid ones — are a
  // portability trap). AC symbols stop at size 10 ((run, size) ≤ 0xFA):
  // the encoder clamps quantized AC coefficients to ±1023 accordingly.
  private val StdDcLumaBits =
    Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val StdDcLumaVals = Array.tabulate[Byte](12)(_.toByte)
  private val StdDcChromaBits =
    Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val StdDcChromaVals = Array.tabulate[Byte](12)(_.toByte)
  private val StdAcLumaBits =
    Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val StdAcLumaVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa).map(_.toByte)
  private val StdAcChromaBits =
    Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val StdAcChromaVals = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15, 0x62, 0x72, 0xd1,
    0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a,
    0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa).map(_.toByte)

  // ------------------------------------------------------------------
  // Encoder
  // ------------------------------------------------------------------

  /** Encode a baseline JPEG from a top-down RGB stream (`gray = true`
    * takes 1 byte/px and writes a single-component scan). 4:4:4, JFIF
    * APP0, quality-scaled Annex-K-shaped quant tables, flat Huffman
    * tables, optional restart interval in MCUs (0 = none). */
  def encode(w: Int, h: Int, px: Array[Byte], quality: Int = 90,
             gray: Boolean = false, restartInterval: Int = 0): Array[Byte] = {
    val ncomp = if (gray) 1 else 3
    require(px.length == w * h * (if (gray) 1 else 3),
      s"JPEG needs w*h*${if (gray) 1 else 3} bytes, got ${px.length}")
    require(w > 0 && h > 0 && w <= 65535 && h <= 65535, "bad dimensions")
    val qLuma = scaledQ(BaseQLuma, quality)
    val qChroma = scaledQ(BaseQChroma, quality)
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xFF); out.write(v & 0xFF) }
    def marker(m: Int): Unit = { out.write(0xFF); out.write(m) }
    marker(0xD8) // SOI
    marker(0xE0) // APP0 / JFIF
    u16(16)
    out.write("JFIF".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    out.write(0); out.write(1); out.write(1) // version 1.1
    out.write(0); u16(1); u16(1)             // no density
    out.write(0); out.write(0)               // no thumbnail
    // DQT: table 0 = luma, table 1 = chroma (zig-zag order)
    def dqt(id: Int, tbl: Array[Int]): Unit = {
      marker(0xDB); u16(67); out.write(id)
      var i = 0
      while (i < 64) { out.write(tbl(Zigzag(i))); i += 1 }
    }
    dqt(0, qLuma)
    if (!gray) dqt(1, qChroma)
    // SOF0
    marker(0xC0)
    u16(8 + 3 * ncomp)
    out.write(8) // precision
    u16(h); u16(w)
    out.write(ncomp)
    var c = 0
    while (c < ncomp) {
      out.write(c + 1)          // component id
      out.write(0x11)           // 1x1 sampling (4:4:4)
      out.write(if (c == 0) 0 else 1) // quant table
      c += 1
    }
    // DHT: flat tables — DC class 0 id 0, AC class 1 id 0 (+ id 1 pair
    // for chroma so the stream shape matches real files)
    def dht(clazz: Int, id: Int, bits: Array[Int], vals: Array[Byte]): Unit = {
      marker(0xC4); u16(19 + vals.length)
      out.write((clazz << 4) | id)
      bits.foreach(out.write)
      out.write(vals, 0, vals.length)
    }
    dht(0, 0, StdDcLumaBits, StdDcLumaVals)
    dht(1, 0, StdAcLumaBits, StdAcLumaVals)
    if (!gray) {
      dht(0, 1, StdDcChromaBits, StdDcChromaVals)
      dht(1, 1, StdAcChromaBits, StdAcChromaVals)
    }
    if (restartInterval > 0) { marker(0xDD); u16(4); u16(restartInterval) }
    // SOS
    marker(0xDA)
    u16(6 + 2 * ncomp)
    out.write(ncomp)
    c = 0
    while (c < ncomp) {
      out.write(c + 1)
      out.write(if (c == 0) 0x00 else 0x11) // DC/AC table ids
      c += 1
    }
    out.write(0); out.write(63); out.write(0) // Ss/Se/AhAl
    // entropy-coded data
    val dcEncL = new HuffEncoder(StdDcLumaBits, StdDcLumaVals)
    val acEncL = new HuffEncoder(StdAcLumaBits, StdAcLumaVals)
    val dcEncC = new HuffEncoder(StdDcChromaBits, StdDcChromaVals)
    val acEncC = new HuffEncoder(StdAcChromaBits, StdAcChromaVals)
    var acc = 0L
    var nbits = 0
    def putBits(code: Int, len: Int): Unit = {
      if (len == 0) return
      acc = (acc << len) | (code & ((1L << len) - 1))
      nbits += len
      while (nbits >= 8) {
        nbits -= 8
        val b = ((acc >> nbits) & 0xFF).toInt
        out.write(b)
        if (b == 0xFF) out.write(0x00) // byte stuffing
      }
      acc &= (1L << nbits) - 1 // drop flushed bits: acc stays < 8 bits
    }
    def category(v: Int): Int = {
      var m = math.abs(v)
      var s = 0
      while (m != 0) { m >>= 1; s += 1 }
      s
    }
    val mcusX = (w + 7) / 8
    val mcusY = (h + 7) / 8
    val dcPrev = new Array[Int](3)
    val block = new Array[Double](64)
    val freq = new Array[Double](64)
    val quant = new Array[Int](64)
    // planar YCbCr (or the gray plane alone), edge-replicated to MCU grid
    val pw = mcusX * 8
    val ph = mcusY * 8
    val planes = Array.ofDim[Byte](ncomp, pw * ph)
    var y = 0
    while (y < ph) {
      val sy = math.min(y, h - 1)
      var x = 0
      while (x < pw) {
        val sx = math.min(x, w - 1)
        if (gray) planes(0)(y * pw + x) = px(sy * w + sx)
        else {
          val p = (sy * w + sx) * 3
          val r = px(p) & 0xFF
          val g = px(p + 1) & 0xFF
          val b = px(p + 2) & 0xFF
          val yy = (19595 * r + 38470 * g + 7471 * b + 32768) >> 16
          val cb = ((-11059 * r - 21709 * g + 32768 * b + 32768) >> 16) + 128
          val cr = ((32768 * r - 27439 * g - 5329 * b + 32768) >> 16) + 128
          planes(0)(y * pw + x) = math.max(0, math.min(255, yy)).toByte
          planes(1)(y * pw + x) = math.max(0, math.min(255, cb)).toByte
          planes(2)(y * pw + x) = math.max(0, math.min(255, cr)).toByte
        }
        x += 1
      }
      y += 1
    }
    var mcu = 0
    var sinceRestart = 0
    var restartId = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      if (restartInterval > 0 && sinceRestart == restartInterval) {
        // flush to byte boundary with 1-bits, emit RSTn, reset DC
        if (nbits > 0) putBits((1 << (8 - nbits)) - 1, 8 - nbits)
        marker(0xD0 + restartId)
        restartId = (restartId + 1) % 8
        java.util.Arrays.fill(dcPrev, 0)
        sinceRestart = 0
      }
      val bx = (mcu % mcusX) * 8
      val by = (mcu / mcusX) * 8
      c = 0
      while (c < ncomp) {
        val qt = if (c == 0) qLuma else qChroma
        val dcEnc = if (c == 0) dcEncL else dcEncC
        val acEnc = if (c == 0) acEncL else acEncC
        var i = 0
        while (i < 64) {
          block(i) = (planes(c)((by + i / 8) * pw + bx + i % 8) & 0xFF) - 128.0
          i += 1
        }
        fdct8x8(block, freq)
        i = 0
        while (i < 64) {
          val q = math.round(freq(Zigzag(i)) / qt(Zigzag(i))).toInt
          // the standard AC tables stop at size 10: clamp to ±1023
          quant(i) =
            if (i == 0) q else math.max(-1023, math.min(1023, q))
          i += 1
        }
        // DC
        val diff = quant(0) - dcPrev(c)
        dcPrev(c) = quant(0)
        val s = category(diff)
        putBits(dcEnc.codeOf(s), dcEnc.lenOf(s))
        if (s > 0) putBits(if (diff >= 0) diff else diff + (1 << s) - 1, s)
        // AC with run-lengths, ZRL, EOB
        var k = 1
        var run = 0
        while (k < 64) {
          val v = quant(k)
          if (v == 0) run += 1
          else {
            while (run >= 16) {
              putBits(acEnc.codeOf(0xF0), acEnc.lenOf(0xF0)) // ZRL
              run -= 16
            }
            val sz = category(v)
            val sym = (run << 4) | sz
            putBits(acEnc.codeOf(sym), acEnc.lenOf(sym))
            putBits(if (v >= 0) v else v + (1 << sz) - 1, sz)
            run = 0
          }
          k += 1
        }
        if (run > 0) putBits(acEnc.codeOf(0x00), acEnc.lenOf(0x00)) // EOB
        c += 1
      }
      sinceRestart += 1
      mcu += 1
    }
    if (nbits > 0) putBits((1 << (8 - nbits)) - 1, 8 - nbits) // pad with 1s
    marker(0xD9) // EOI
    out.toByteArray
  }

  /**
   * Progressive (SOF2) encoder: the spectral-selection script -- one
   * interleaved DC scan (Ss=0, Se=0) followed by one full-band AC scan
   * per component (Ss=1, Se=63), EOB-per-block, no successive
   * approximation. 4:4:4 (or grayscale) like [[encode]], same
   * quality-scaled tables and Annex K Huffman tables, optional restart
   * interval applied per scan. Every conformant progressive decoder
   * (ImageIO cross-checked in spec) reads the output; successive-
   * approximation DECODE coverage comes from ImageIO-written fixtures.
   */
  def encodeProgressive(w: Int, h: Int, px: Array[Byte], quality: Int = 90,
                        gray: Boolean = false,
                        restartInterval: Int = 0): Array[Byte] = {
    val ncomp = if (gray) 1 else 3
    require(px.length == w * h * (if (gray) 1 else 3),
      s"JPEG needs w*h*${if (gray) 1 else 3} bytes, got ${px.length}")
    require(w > 0 && h > 0 && w <= 65535 && h <= 65535, "bad dimensions")
    val qLuma = scaledQ(BaseQLuma, quality)
    val qChroma = scaledQ(BaseQChroma, quality)
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xFF); out.write(v & 0xFF) }
    def marker(m: Int): Unit = { out.write(0xFF); out.write(m) }
    marker(0xD8)
    marker(0xE0); u16(16)
    out.write("JFIF".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    out.write(0); out.write(1); out.write(1)
    out.write(0); u16(1); u16(1)
    out.write(0); out.write(0)
    def dqt(id: Int, tbl: Array[Int]): Unit = {
      marker(0xDB); u16(67); out.write(id)
      var i = 0
      while (i < 64) { out.write(tbl(Zigzag(i))); i += 1 }
    }
    dqt(0, qLuma)
    if (!gray) dqt(1, qChroma)
    marker(0xC2) // SOF2: progressive
    u16(8 + 3 * ncomp)
    out.write(8)
    u16(h); u16(w)
    out.write(ncomp)
    var c = 0
    while (c < ncomp) {
      out.write(c + 1)
      out.write(0x11)
      out.write(if (c == 0) 0 else 1)
      c += 1
    }
    def dht(clazz: Int, id: Int, bits: Array[Int], vals: Array[Byte]): Unit = {
      marker(0xC4); u16(19 + vals.length)
      out.write((clazz << 4) | id)
      bits.foreach(out.write)
      out.write(vals, 0, vals.length)
    }
    dht(0, 0, StdDcLumaBits, StdDcLumaVals)
    dht(1, 0, StdAcLumaBits, StdAcLumaVals)
    if (!gray) {
      dht(0, 1, StdDcChromaBits, StdDcChromaVals)
      dht(1, 1, StdAcChromaBits, StdAcChromaVals)
    }
    if (restartInterval > 0) { marker(0xDD); u16(4); u16(restartInterval) }
    // ---- quantize every block of every component up front
    val mcusX = (w + 7) / 8
    val mcusY = (h + 7) / 8
    val nMcus = mcusX * mcusY
    val pw = mcusX * 8
    val ph = mcusY * 8
    val planes = Array.ofDim[Byte](ncomp, pw * ph)
    var y = 0
    while (y < ph) {
      val sy = math.min(y, h - 1)
      var x = 0
      while (x < pw) {
        val sx = math.min(x, w - 1)
        if (gray) planes(0)(y * pw + x) = px(sy * w + sx)
        else {
          val p = (sy * w + sx) * 3
          val r = px(p) & 0xFF
          val g = px(p + 1) & 0xFF
          val b = px(p + 2) & 0xFF
          val yy = (19595 * r + 38470 * g + 7471 * b + 32768) >> 16
          val cb = ((-11059 * r - 21709 * g + 32768 * b + 32768) >> 16) + 128
          val cr = ((32768 * r - 27439 * g - 5329 * b + 32768) >> 16) + 128
          planes(0)(y * pw + x) = math.max(0, math.min(255, yy)).toByte
          planes(1)(y * pw + x) = math.max(0, math.min(255, cb)).toByte
          planes(2)(y * pw + x) = math.max(0, math.min(255, cr)).toByte
        }
        x += 1
      }
      y += 1
    }
    val block = new Array[Double](64)
    val freq = new Array[Double](64)
    // quant(c)(mcu * 64 + k): zig-zag order, AC clamped to table range
    val quant = Array.ofDim[Int](ncomp, nMcus * 64)
    var mcu = 0
    while (mcu < nMcus) {
      val bx = (mcu % mcusX) * 8
      val by = (mcu / mcusX) * 8
      c = 0
      while (c < ncomp) {
        val qt = if (c == 0) qLuma else qChroma
        var i = 0
        while (i < 64) {
          block(i) = (planes(c)((by + i / 8) * pw + bx + i % 8) & 0xFF) - 128.0
          i += 1
        }
        fdct8x8(block, freq)
        i = 0
        while (i < 64) {
          val q = math.round(freq(Zigzag(i)) / qt(Zigzag(i))).toInt
          quant(c)(mcu * 64 + i) =
            if (i == 0) q else math.max(-1023, math.min(1023, q))
          i += 1
        }
        c += 1
      }
      mcu += 1
    }
    // ---- per-scan bit writer
    var acc = 0L
    var nbits = 0
    def putBits(code: Int, len: Int): Unit = {
      if (len == 0) return
      acc = (acc << len) | (code & ((1L << len) - 1))
      nbits += len
      while (nbits >= 8) {
        nbits -= 8
        val b = ((acc >> nbits) & 0xFF).toInt
        out.write(b)
        if (b == 0xFF) out.write(0x00)
      }
      acc &= (1L << nbits) - 1
    }
    def flushBits(): Unit =
      if (nbits > 0) putBits((1 << (8 - nbits)) - 1, 8 - nbits)
    def category(v: Int): Int = {
      var m = math.abs(v)
      var s = 0
      while (m != 0) { m >>= 1; s += 1 }
      s
    }
    val dcEnc = Array.tabulate(ncomp)(i =>
      if (i == 0) new HuffEncoder(StdDcLumaBits, StdDcLumaVals)
      else new HuffEncoder(StdDcChromaBits, StdDcChromaVals))
    val acEnc = Array.tabulate(ncomp)(i =>
      if (i == 0) new HuffEncoder(StdAcLumaBits, StdAcLumaVals)
      else new HuffEncoder(StdAcChromaBits, StdAcChromaVals))
    def sos(compIds: Seq[Int], ss: Int, se: Int): Unit = {
      marker(0xDA)
      u16(6 + 2 * compIds.length)
      out.write(compIds.length)
      compIds.foreach { ci =>
        out.write(ci + 1)
        out.write(if (ci == 0) 0x00 else 0x11)
      }
      out.write(ss); out.write(se); out.write(0) // Ah=Al=0
    }
    // ---- scan 1: interleaved DC
    sos(0 until ncomp, 0, 0)
    val dcPrev = new Array[Int](ncomp)
    var sinceRestart = 0
    var restartId = 0
    mcu = 0
    while (mcu < nMcus) {
      if (restartInterval > 0 && sinceRestart == restartInterval) {
        flushBits()
        marker(0xD0 + restartId)
        restartId = (restartId + 1) % 8
        java.util.Arrays.fill(dcPrev, 0)
        sinceRestart = 0
      }
      c = 0
      while (c < ncomp) {
        val dc = quant(c)(mcu * 64)
        val diff = dc - dcPrev(c)
        dcPrev(c) = dc
        val s = category(diff)
        putBits(dcEnc(c).codeOf(s), dcEnc(c).lenOf(s))
        if (s > 0) putBits(if (diff >= 0) diff else diff + (1 << s) - 1, s)
        c += 1
      }
      sinceRestart += 1
      mcu += 1
    }
    flushBits()
    // ---- one AC scan per component
    c = 0
    while (c < ncomp) {
      sos(Seq(c), 1, 63)
      sinceRestart = 0
      restartId = 0
      mcu = 0
      while (mcu < nMcus) {
        if (restartInterval > 0 && sinceRestart == restartInterval) {
          flushBits()
          marker(0xD0 + restartId)
          restartId = (restartId + 1) % 8
          sinceRestart = 0
        }
        var k = 1
        var run = 0
        while (k < 64) {
          val v = quant(c)(mcu * 64 + k)
          if (v == 0) run += 1
          else {
            while (run >= 16) {
              putBits(acEnc(c).codeOf(0xF0), acEnc(c).lenOf(0xF0))
              run -= 16
            }
            val sz = category(v)
            val sym = (run << 4) | sz
            putBits(acEnc(c).codeOf(sym), acEnc(c).lenOf(sym))
            putBits(if (v >= 0) v else v + (1 << sz) - 1, sz)
            run = 0
          }
          k += 1
        }
        if (run > 0) // EOB: an EOB-run of exactly one block
          putBits(acEnc(c).codeOf(0x00), acEnc(c).lenOf(0x00))
        sinceRestart += 1
        mcu += 1
      }
      flushBits()
      c += 1
    }
    marker(0xD9)
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // Decoder
  // ------------------------------------------------------------------

  private final case class Component(id: Int, hs: Int, vs: Int, qId: Int) {
    var dcTable = 0
    var acTable = 0
  }

  /** Decode a baseline/extended-sequential JPEG into (width, height,
    * top-down RGB). None on anything corrupt or unsupported. */
  def decode(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (bytes == null || bytes.length < 4 ||
      (bytes(0) & 0xFF) != 0xFF || (bytes(1) & 0xFF) != 0xD8) return None
    def u16(at: Int): Int =
      ((bytes(at) & 0xFF) << 8) | (bytes(at + 1) & 0xFF)
    val qTables = new Array[Array[Int]](4)
    val dcTables = new Array[HuffTable](4)
    val acTables = new Array[HuffTable](4)
    var comps: Array[Component] = null
    var w = 0
    var h = 0
    var restartInterval = 0
    var pos = 2
    var sosAt = -1
    // ---- marker segment walk up to SOS
    while (sosAt < 0) {
      if (pos + 4 > bytes.length) return None
      if ((bytes(pos) & 0xFF) != 0xFF) return None
      var m = bytes(pos + 1) & 0xFF
      while (m == 0xFF) { pos += 1; if (pos + 2 > bytes.length) return None; m = bytes(pos + 1) & 0xFF }
      if (m == 0xD9) return None // EOI before any scan: no image
      if (m == 0xD8 || m == 0x01 || (m >= 0xD0 && m <= 0xD7)) {
        pos += 2 // TEM / stray SOI / RSTn carry no body
      } else {
        val len = u16(pos + 2)
        if (len < 2 || pos + 2 + len > bytes.length) return None
        val body = pos + 4
        val bodyLen = len - 2
        m match {
          case 0xC0 | 0xC1 => // baseline / extended sequential
            if (bodyLen < 6) return None
            if ((bytes(body) & 0xFF) != 8) return None // 12-bit unsupported
            h = u16(body + 1)
            w = u16(body + 3)
            val nc = bytes(body + 5) & 0xFF
            if (w <= 0 || h <= 0 || (nc != 1 && nc != 3)) return None
            if (w.toLong * h * 3 > Int.MaxValue) return None
            if (bodyLen < 6 + 3 * nc) return None
            comps = Array.tabulate(nc) { i =>
              val o = body + 6 + 3 * i
              val hv = bytes(o + 1) & 0xFF
              Component(bytes(o) & 0xFF, (hv >> 4) & 0xF, hv & 0xF,
                bytes(o + 2) & 0xFF)
            }
            if (comps.exists(c => c.hs < 1 || c.hs > 2 || c.vs < 1 ||
              c.vs > 2 || c.qId > 3)) return None
          case 0xC2 =>
            // progressive: multi-scan coefficient accumulation over the
            // same Huffman/dequant/IDCT pieces -- its own walk
            return decodeProgressive(bytes)
          case 0xC3 | 0xC5 | 0xC6 | 0xC7 | 0xC9 | 0xCA | 0xCB |
               0xCD | 0xCE | 0xCF =>
            return None // lossless / arithmetic / hierarchical
          case 0xDB => // DQT: one or more tables
            var p = body
            while (p < body + bodyLen) {
              val pq = (bytes(p) >> 4) & 0xF
              val tq = bytes(p) & 0xF
              if (tq > 3) return None
              if (pq == 0) {
                if (p + 65 > body + bodyLen) return None
                val t = new Array[Int](64)
                var i = 0
                while (i < 64) { t(Zigzag(i)) = bytes(p + 1 + i) & 0xFF; i += 1 }
                qTables(tq) = t
                p += 65
              } else if (pq == 1) {
                if (p + 129 > body + bodyLen) return None
                val t = new Array[Int](64)
                var i = 0
                while (i < 64) { t(Zigzag(i)) = u16(p + 1 + 2 * i); i += 1 }
                qTables(tq) = t
                p += 129
              } else return None
            }
          case 0xC4 => // DHT: one or more tables
            var p = body
            while (p < body + bodyLen) {
              if (p + 17 > body + bodyLen) return None
              val clazz = (bytes(p) >> 4) & 0xF
              val id = bytes(p) & 0xF
              if (clazz > 1 || id > 3) return None
              val bits = Array.tabulate(16)(i => bytes(p + 1 + i) & 0xFF)
              val n = bits.sum
              if (n == 0 || n > 256 || p + 17 + n > body + bodyLen) return None
              val vals = java.util.Arrays.copyOfRange(bytes, p + 17, p + 17 + n)
              val t = new HuffTable(bits, vals)
              if (!t.ok) return None
              if (clazz == 0) dcTables(id) = t else acTables(id) = t
              p += 17 + n
            }
          case 0xDD => // DRI: Lr=4, so the body is exactly 2 bytes
            if (bodyLen < 2) return None
            restartInterval = u16(body)
          case 0xDA => // SOS
            if (comps == null) return None
            val ns = bytes(body) & 0xFF
            if (ns != comps.length || bodyLen < 1 + 2 * ns + 3) return None
            var i = 0
            while (i < ns) {
              val cid = bytes(body + 1 + 2 * i) & 0xFF
              val tt = bytes(body + 2 + 2 * i) & 0xFF
              val comp = comps.find(_.id == cid).getOrElse(return None)
              comp.dcTable = (tt >> 4) & 0xF
              comp.acTable = tt & 0xF
              i += 1
            }
            sosAt = pos + 2 + len
          case _ => () // APPn, COM, others: skip by length
        }
        if (sosAt < 0) pos += 2 + len
      }
    }
    // ---- entropy-coded scan
    val hmax = comps.map(_.hs).max
    val vmax = comps.map(_.vs).max
    val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
    val planes = comps.map(c =>
      new Array[Byte](mcusX * 8 * c.hs * mcusY * 8 * c.vs))
    val planeW = comps.map(c => mcusX * 8 * c.hs)
    for (c <- comps) {
      if (qTables(c.qId) == null) return None
      if (dcTables(c.dcTable) == null || acTables(c.acTable) == null)
        return None
    }
    var bitBuf = 0L
    var bitCnt = 0
    var p = sosAt
    var hitMarker = false // a non-RST marker ends the entropy stream
    def fillTo(n: Int): Boolean = {
      while (bitCnt < n) {
        if (hitMarker || p >= bytes.length) { // pad; decode fails on use
          bitBuf = (bitBuf << 8) | 0xFF
          bitCnt += 8
        } else {
          val b = bytes(p) & 0xFF
          if (b == 0xFF) {
            val nxt = if (p + 1 < bytes.length) bytes(p + 1) & 0xFF else -1
            if (nxt == 0x00) { // stuffed data byte
              bitBuf = (bitBuf << 8) | 0xFF
              bitCnt += 8
              p += 2
            } else { hitMarker = true } // leave marker for the outer loop
          } else {
            bitBuf = (bitBuf << 8) | b
            bitCnt += 8
            p += 1
          }
        }
      }
      true
    }
    def getBits(n: Int): Int = {
      if (n == 0) return 0
      fillTo(n)
      val v = ((bitBuf >> (bitCnt - n)) & ((1L << n) - 1)).toInt
      bitCnt -= n
      v
    }
    def decodeHuff(t: HuffTable): Int = {
      var code = 0
      var len = 0
      while (len < 16) {
        code = (code << 1) | getBits(1)
        len += 1
        val s = t.symbol(len, code)
        if (s >= 0) return s
      }
      -1
    }
    def extend(v: Int, s: Int): Int =
      if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v
    val dcPrev = new Array[Int](comps.length)
    val coeffs = new Array[Double](64)
    val spatial = new Array[Double](64)
    var mcu = 0
    val nMcus = mcusX * mcusY
    var sinceRestart = 0
    while (mcu < nMcus) {
      if (restartInterval > 0 && sinceRestart == restartInterval) {
        // align to byte, expect RSTn
        bitCnt = 0
        bitBuf = 0
        if (!hitMarker) {
          // skip to the marker if not already there
          while (p + 1 < bytes.length && !((bytes(p) & 0xFF) == 0xFF &&
            (bytes(p + 1) & 0xFF) != 0x00)) p += 1
        }
        if (p + 1 >= bytes.length) return None
        val m = bytes(p + 1) & 0xFF
        if (m < 0xD0 || m > 0xD7) return None
        p += 2
        hitMarker = false
        java.util.Arrays.fill(dcPrev, 0)
        sinceRestart = 0
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      var ci = 0
      while (ci < comps.length) {
        val comp = comps(ci)
        val qt = qTables(comp.qId)
        val dct = dcTables(comp.dcTable)
        val act = acTables(comp.acTable)
        var blk = 0
        while (blk < comp.hs * comp.vs) {
          val bx = (mx * comp.hs + blk % comp.hs) * 8
          val by = (my * comp.vs + blk / comp.hs) * 8
          java.util.Arrays.fill(coeffs, 0.0)
          val s = decodeHuff(dct)
          if (s < 0 || s > 15) return None
          val diff = extend(getBits(s), s)
          dcPrev(ci) += diff
          coeffs(0) = dcPrev(ci).toDouble * qt(0)
          var k = 1
          var eob = false
          while (k < 64 && !eob) {
            val rs = decodeHuff(act)
            if (rs < 0) return None
            val run = (rs >> 4) & 0xF
            val sz = rs & 0xF
            if (sz == 0) {
              if (run == 15) k += 16 // ZRL
              else eob = true        // EOB
            } else {
              k += run
              if (k > 63) return None
              val v = extend(getBits(sz), sz)
              coeffs(Zigzag(k)) = v.toDouble * qt(Zigzag(k))
              k += 1
            }
          }
          idct8x8(coeffs, spatial)
          val pw = planeW(ci)
          var i = 0
          while (i < 64) {
            val v = math.round(spatial(i) + 128.0).toInt
            planes(ci)((by + i / 8) * pw + bx + i % 8) =
              math.max(0, math.min(255, v)).toByte
            i += 1
          }
          blk += 1
        }
        ci += 1
      }
      sinceRestart += 1
      mcu += 1
    }
    Some((w, h, planesToRgb(w, h, comps, planes, planeW, hmax, vmax)))
  }

  /**
   * Progressive JPEG (SOF2) decoder: coefficients accumulate across
   * scans in per-component Int arrays (zig-zag order per block), then
   * dequantize + IDCT once at EOI. All four scan kinds of T.81 Annex G:
   * DC first (interleaved or not, `<< Al`), DC refinement (one bit per
   * block), AC first with EOB runs (spectral selection, single
   * component), and AC successive-approximation refinement (correction
   * bits). Restart markers reset DC predictors AND the EOB run per
   * interval, in any scan. Corrupt/truncated input yields None.
   *
   * Memory: coefficient storage is 4 bytes/sample, capped at 1 GiB
   * total (a 268-megasample image) -- beyond that a progressive file
   * reads as undecodable rather than an executor OOM.
   */
  private def decodeProgressive(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    def u16(at: Int): Int =
      ((bytes(at) & 0xFF) << 8) | (bytes(at + 1) & 0xFF)
    val qTables = new Array[Array[Int]](4)
    val dcTables = new Array[HuffTable](4)
    val acTables = new Array[HuffTable](4)
    var comps: Array[Component] = null
    var w = 0
    var h = 0
    var restartInterval = 0
    var hmax = 1
    var vmax = 1
    var mcusX = 0
    var mcusY = 0
    var blocksWFull: Array[Int] = null // MCU-padded block dims (storage)
    var blocksHFull: Array[Int] = null
    var blocksW: Array[Int] = null     // true component block dims (T.81)
    var blocksH: Array[Int] = null
    var coefs: Array[Array[Int]] = null // per comp: block-major, zigzag idx
    var eoiSeen = false
    var pos = 2

    // ---- one scan's entropy decode; returns the position after the scan
    // data (at the next marker) or -1 on corrupt input
    def decodeScan(sosBody: Int, sosBodyLen: Int, scanStart: Int): Int = {
      val ns = bytes(sosBody) & 0xFF
      if (ns < 1 || ns > comps.length || sosBodyLen < 1 + 2 * ns + 3) return -1
      val scanComps = new Array[Int](ns)
      var i = 0
      while (i < ns) {
        val cid = bytes(sosBody + 1 + 2 * i) & 0xFF
        val tt = bytes(sosBody + 2 + 2 * i) & 0xFF
        val ci = comps.indexWhere(_.id == cid)
        if (ci < 0) return -1
        comps(ci).dcTable = (tt >> 4) & 0xF
        comps(ci).acTable = tt & 0xF
        scanComps(i) = ci
        i += 1
      }
      val ss = bytes(sosBody + 1 + 2 * ns) & 0xFF
      val se = bytes(sosBody + 2 + 2 * ns) & 0xFF
      val ahal = bytes(sosBody + 3 + 2 * ns) & 0xFF
      val ah = (ahal >> 4) & 0xF
      val al = ahal & 0xF
      if (ss > 63 || se > 63 || se < ss || al > 13) return -1
      if (ss == 0 && se != 0) return -1  // progressive DC scans are DC-only
      if (ss > 0 && ns != 1) return -1   // AC scans are non-interleaved
      // bit reader (identical shape to the sequential path)
      var bitBuf = 0L
      var bitCnt = 0
      var p = scanStart
      var hitMarker = false
      def fillTo(n: Int): Unit = {
        while (bitCnt < n) {
          if (hitMarker || p >= bytes.length) {
            bitBuf = (bitBuf << 8) | 0xFF
            bitCnt += 8
          } else {
            val b = bytes(p) & 0xFF
            if (b == 0xFF) {
              val nxt = if (p + 1 < bytes.length) bytes(p + 1) & 0xFF else -1
              if (nxt == 0x00) {
                bitBuf = (bitBuf << 8) | 0xFF
                bitCnt += 8
                p += 2
              } else hitMarker = true
            } else {
              bitBuf = (bitBuf << 8) | b
              bitCnt += 8
              p += 1
            }
          }
        }
      }
      def getBits(n: Int): Int = {
        if (n == 0) return 0
        fillTo(n)
        val v = ((bitBuf >> (bitCnt - n)) & ((1L << n) - 1)).toInt
        bitCnt -= n
        v
      }
      def decodeHuff(t: HuffTable): Int = {
        var code = 0
        var len = 0
        while (len < 16) {
          code = (code << 1) | getBits(1)
          len += 1
          val sym = t.symbol(len, code)
          if (sym >= 0) return sym
        }
        -1
      }
      def extend(v: Int, sz: Int): Int =
        if (sz == 0) 0 else if (v < (1 << (sz - 1))) v - (1 << sz) + 1 else v
      val dcPrev = new Array[Int](comps.length)
      var eobrun = 0
      var sinceRestart = 0
      def expectRestart(): Boolean = {
        bitCnt = 0
        bitBuf = 0
        if (!hitMarker) {
          while (p + 1 < bytes.length && !((bytes(p) & 0xFF) == 0xFF &&
            (bytes(p + 1) & 0xFF) != 0x00)) p += 1
        }
        if (p + 1 >= bytes.length) return false
        val m = bytes(p + 1) & 0xFF
        if (m < 0xD0 || m > 0xD7) return false
        p += 2
        hitMarker = false
        java.util.Arrays.fill(dcPrev, 0)
        eobrun = 0
        sinceRestart = 0
        true
      }
      val p1 = 1 << al  // refinement magnitudes
      val m1 = -1 << al
      // refine one nonzero coefficient in place (correction bit)
      def refineBit(arr: Array[Int], at: Int): Unit = {
        if (getBits(1) == 1 && (arr(at) & p1) == 0)
          arr(at) += (if (arr(at) >= 0) p1 else m1)
      }
      // ---- decode one block's worth of one scan kind
      def dcFirst(ci: Int, idx: Int): Boolean = {
        val t = dcTables(comps(ci).dcTable)
        if (t == null) return false
        val sz = decodeHuff(t)
        if (sz < 0 || sz > 15) return false
        val diff = extend(getBits(sz), sz)
        dcPrev(ci) += diff
        coefs(ci)(idx) = dcPrev(ci) << al
        true
      }
      def dcRefine(ci: Int, idx: Int): Boolean = {
        if (getBits(1) == 1) coefs(ci)(idx) |= p1
        true
      }
      def acFirst(ci: Int, idx: Int): Boolean = {
        if (eobrun > 0) { eobrun -= 1; return true }
        val t = acTables(comps(ci).acTable)
        if (t == null) return false
        val arr = coefs(ci)
        var k = ss
        while (k <= se) {
          val rs = decodeHuff(t)
          if (rs < 0) return false
          val r = (rs >> 4) & 0xF
          val sz = rs & 0xF
          if (sz == 0) {
            if (r < 15) {
              eobrun = (1 << r) - 1
              if (r > 0) eobrun += getBits(r)
              k = se + 1
            } else k += 16 // ZRL
          } else {
            k += r
            if (k > se) return false
            arr(idx + k) = extend(getBits(sz), sz) << al
            k += 1
          }
        }
        true
      }
      def acRefine(ci: Int, idx: Int): Boolean = {
        val arr = coefs(ci)
        var k = ss
        if (eobrun == 0) {
          val t = acTables(comps(ci).acTable)
          if (t == null) return false
          var broke = false
          while (k <= se && !broke) {
            val rs = decodeHuff(t)
            if (rs < 0) return false
            var r = (rs >> 4) & 0xF
            val sz = rs & 0xF
            var newVal = 0
            if (sz == 0) {
              if (r < 15) {
                eobrun = (1 << r)
                if (r > 0) eobrun += getBits(r)
                broke = true // this block's tail refines in the EOB branch
              }
              // r == 15: ZRL -- skip 16 zero-history coefs below
            } else {
              if (sz != 1) return false
              newVal = if (getBits(1) != 0) p1 else m1
            }
            if (!broke) {
              // advance over r zero-history coefs, correcting nonzero ones
              var placed = false
              while (k <= se && !placed) {
                if (arr(idx + k) != 0) refineBit(arr, idx + k)
                else {
                  if (r == 0) {
                    if (newVal != 0) arr(idx + k) = newVal
                    placed = true
                  } else r -= 1
                }
                k += 1
              }
              if (!placed && newVal != 0) return false // ran off the band
            }
          }
        }
        if (eobrun > 0) {
          while (k <= se) {
            if (arr(idx + k) != 0) refineBit(arr, idx + k)
            k += 1
          }
          eobrun -= 1
        }
        true
      }
      def blockAt(ci: Int, bx: Int, by: Int): Int =
        (by * blocksWFull(ci) + bx) * 64
      // ---- drive the units
      if (ss == 0) { // DC scan: MCU-interleaved when ns > 1
        if (ns > 1) {
          val nMcus = mcusX * mcusY
          var mcu = 0
          while (mcu < nMcus) {
            if (restartInterval > 0 && sinceRestart == restartInterval &&
              !expectRestart()) return -1
            val mx = mcu % mcusX
            val my = mcu / mcusX
            var si = 0
            while (si < ns) {
              val ci = scanComps(si)
              val c = comps(ci)
              var blk = 0
              while (blk < c.hs * c.vs) {
                val idx = blockAt(ci, mx * c.hs + blk % c.hs,
                  my * c.vs + blk / c.hs)
                val okB = if (ah == 0) dcFirst(ci, idx) else dcRefine(ci, idx)
                if (!okB) return -1
                blk += 1
              }
              si += 1
            }
            sinceRestart += 1
            mcu += 1
          }
        } else {
          val ci = scanComps(0)
          val bw = blocksW(ci)
          val nBlocks = bw * blocksH(ci)
          var b = 0
          while (b < nBlocks) {
            if (restartInterval > 0 && sinceRestart == restartInterval &&
              !expectRestart()) return -1
            val idx = blockAt(ci, b % bw, b / bw)
            val okB = if (ah == 0) dcFirst(ci, idx) else dcRefine(ci, idx)
            if (!okB) return -1
            sinceRestart += 1
            b += 1
          }
        }
      } else { // AC scan: single component, raster block order
        val ci = scanComps(0)
        val bw = blocksW(ci)
        val nBlocks = bw * blocksH(ci)
        var b = 0
        while (b < nBlocks) {
          if (restartInterval > 0 && sinceRestart == restartInterval &&
            !expectRestart()) return -1
          val idx = blockAt(ci, b % bw, b / bw)
          val okB = if (ah == 0) acFirst(ci, idx) else acRefine(ci, idx)
          if (!okB) return -1
          sinceRestart += 1
          b += 1
        }
      }
      // resync to the next marker for the outer walk
      if (!hitMarker) {
        while (p + 1 < bytes.length && !((bytes(p) & 0xFF) == 0xFF &&
          (bytes(p + 1) & 0xFF) != 0x00)) p += 1
      }
      p
    }

    // ---- marker walk across ALL scans, up to EOI
    while (!eoiSeen) {
      if (pos + 2 > bytes.length) return None
      if ((bytes(pos) & 0xFF) != 0xFF) return None
      var m = bytes(pos + 1) & 0xFF
      while (m == 0xFF) {
        pos += 1
        if (pos + 2 > bytes.length) return None
        m = bytes(pos + 1) & 0xFF
      }
      if (m == 0xD9) eoiSeen = true
      else if (m == 0xD8 || m == 0x01 || (m >= 0xD0 && m <= 0xD7)) pos += 2
      else {
        if (pos + 4 > bytes.length) return None
        val len = u16(pos + 2)
        if (len < 2 || pos + 2 + len > bytes.length) return None
        val body = pos + 4
        val bodyLen = len - 2
        var posAdvanced = false
        m match {
          case 0xC2 =>
            if (comps != null) return None // one frame only
            if (bodyLen < 6) return None
            if ((bytes(body) & 0xFF) != 8) return None
            h = u16(body + 1)
            w = u16(body + 3)
            val nc = bytes(body + 5) & 0xFF
            if (w <= 0 || h <= 0 || (nc != 1 && nc != 3)) return None
            if (w.toLong * h * 3 > Int.MaxValue) return None
            if (bodyLen < 6 + 3 * nc) return None
            comps = Array.tabulate(nc) { i =>
              val o = body + 6 + 3 * i
              val hv = bytes(o + 1) & 0xFF
              Component(bytes(o) & 0xFF, (hv >> 4) & 0xF, hv & 0xF,
                bytes(o + 2) & 0xFF)
            }
            if (comps.exists(c => c.hs < 1 || c.hs > 2 || c.vs < 1 ||
              c.vs > 2 || c.qId > 3)) return None
            hmax = comps.map(_.hs).max
            vmax = comps.map(_.vs).max
            mcusX = (w + 8 * hmax - 1) / (8 * hmax)
            mcusY = (h + 8 * vmax - 1) / (8 * vmax)
            blocksWFull = comps.map(c => mcusX * c.hs)
            blocksHFull = comps.map(c => mcusY * c.vs)
            blocksW = comps.map(c => ((w * c.hs + hmax - 1) / hmax + 7) / 8)
            blocksH = comps.map(c => ((h * c.vs + vmax - 1) / vmax + 7) / 8)
            // 1 GiB coefficient-storage cap (4 B/sample)
            val totalSamples = comps.indices.map(i =>
              blocksWFull(i).toLong * blocksHFull(i) * 64).sum
            if (totalSamples * 4 > (1L << 30)) return None
            coefs = comps.indices.map(i =>
              new Array[Int]((blocksWFull(i) * blocksHFull(i) * 64))).toArray
          case 0xC0 | 0xC1 | 0xC3 | 0xC5 | 0xC6 | 0xC7 | 0xC9 | 0xCA |
               0xCB | 0xCD | 0xCE | 0xCF =>
            return None // a second/other frame type inside the stream
          case 0xDB =>
            var p2 = body
            while (p2 < body + bodyLen) {
              val pq = (bytes(p2) >> 4) & 0xF
              val tq = bytes(p2) & 0xF
              if (tq > 3) return None
              if (pq == 0) {
                if (p2 + 65 > body + bodyLen) return None
                val t = new Array[Int](64)
                var i = 0
                while (i < 64) { t(Zigzag(i)) = bytes(p2 + 1 + i) & 0xFF; i += 1 }
                qTables(tq) = t
                p2 += 65
              } else if (pq == 1) {
                if (p2 + 129 > body + bodyLen) return None
                val t = new Array[Int](64)
                var i = 0
                while (i < 64) { t(Zigzag(i)) = u16(p2 + 1 + 2 * i); i += 1 }
                qTables(tq) = t
                p2 += 129
              } else return None
            }
          case 0xC4 =>
            var p2 = body
            while (p2 < body + bodyLen) {
              if (p2 + 17 > body + bodyLen) return None
              val clazz = (bytes(p2) >> 4) & 0xF
              val id = bytes(p2) & 0xF
              if (clazz > 1 || id > 3) return None
              val bits = Array.tabulate(16)(i => bytes(p2 + 1 + i) & 0xFF)
              val n = bits.sum
              if (n == 0 || n > 256 || p2 + 17 + n > body + bodyLen) return None
              val vals = java.util.Arrays.copyOfRange(bytes, p2 + 17, p2 + 17 + n)
              val t = new HuffTable(bits, vals)
              if (!t.ok) return None
              if (clazz == 0) dcTables(id) = t else acTables(id) = t
              p2 += 17 + n
            }
          case 0xDD =>
            if (bodyLen < 2) return None
            restartInterval = u16(body)
          case 0xDA =>
            if (comps == null) return None
            val next = decodeScan(body, bodyLen, pos + 2 + len)
            if (next < 0) return None
            pos = next
            posAdvanced = true
          case _ => () // APPn / COM / DNL: skip by length
        }
        if (!posAdvanced) pos += 2 + len
      }
    }
    if (comps == null) return None
    // ---- dequantize + IDCT every stored block into the planes
    for (c <- comps) if (qTables(c.qId) == null) return None
    val planes = comps.indices.map(i =>
      new Array[Byte](blocksWFull(i) * 8 * blocksHFull(i) * 8)).toArray
    val planeW = comps.indices.map(i => blocksWFull(i) * 8).toArray
    val coeffs = new Array[Double](64)
    val spatial = new Array[Double](64)
    var ci = 0
    while (ci < comps.length) {
      val qt = qTables(comps(ci).qId)
      val arr = coefs(ci)
      val bw = blocksWFull(ci)
      val nBlocks = bw * blocksHFull(ci)
      val pw = planeW(ci)
      var b = 0
      while (b < nBlocks) {
        val idx = b * 64
        var k = 0
        while (k < 64) {
          val rz = Zigzag(k)
          coeffs(rz) = arr(idx + k).toDouble * qt(rz)
          k += 1
        }
        idct8x8(coeffs, spatial)
        val bx = (b % bw) * 8
        val by = (b / bw) * 8
        var i = 0
        while (i < 64) {
          val v = math.round(spatial(i) + 128.0).toInt
          planes(ci)((by + i / 8) * pw + bx + i % 8) =
            math.max(0, math.min(255, v)).toByte
          i += 1
        }
        b += 1
      }
      ci += 1
    }
    Some((w, h, planesToRgb(w, h, comps, planes, planeW, hmax, vmax)))
  }

  /** Shared decode tail: nearest-neighbor upsample + YCbCr→RGB (or gray
    * replication) from the component planes to top-down RGB. */
  private def planesToRgb(w: Int, h: Int, comps: Array[Component],
                          planes: Array[Array[Byte]], planeW: Array[Int],
                          hmax: Int, vmax: Int): Array[Byte] = {
    val rgb = new Array[Byte](w * h * 3)
    if (comps.length == 1) {
      val pw = planeW(0)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val g = planes(0)(y * pw + x)
          val o = (y * w + x) * 3
          rgb(o) = g; rgb(o + 1) = g; rgb(o + 2) = g
          x += 1
        }
        y += 1
      }
    } else {
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val yy = planes(0)(
            (y * comps(0).vs / vmax) * planeW(0) + x * comps(0).hs / hmax) & 0xFF
          val cb = (planes(1)(
            (y * comps(1).vs / vmax) * planeW(1) + x * comps(1).hs / hmax) & 0xFF) - 128
          val cr = (planes(2)(
            (y * comps(2).vs / vmax) * planeW(2) + x * comps(2).hs / hmax) & 0xFF) - 128
          val r = yy + ((91881 * cr + 32768) >> 16)
          val g = yy - ((22554 * cb + 46802 * cr + 32768) >> 16)
          val b = yy + ((116130 * cb + 32768) >> 16)
          val o = (y * w + x) * 3
          rgb(o) = math.max(0, math.min(255, r)).toByte
          rgb(o + 1) = math.max(0, math.min(255, g)).toByte
          rgb(o + 2) = math.max(0, math.min(255, b)).toByte
          x += 1
        }
        y += 1
      }
    }
    rgb
  }
}
