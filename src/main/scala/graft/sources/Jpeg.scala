package graft.sources

import scala.collection.mutable.ArrayBuffer

/** Baseline-sequential JPEG codec (ITU-T T.81) for 8-bit grayscale, written
  * from the public spec with no codec library — the same discipline as
  * [[Nc3]]/[[Hdf5]]/[[Npy]]/[[Png]]. One component, no subsampling, one
  * quantization table, the Annex-K example luminance quant/Huffman tables.
  *
  * The encoder emits SOI / DQT / SOF0 / DHT / SOS / entropy-coded data / EOI
  * with canonical Huffman codes and 0xFF00 byte stuffing; the decoder parses
  * the tables FROM the stream (it does not assume the encoder's constants),
  * entropy-decodes with DC prediction, EOB/ZRL runs and sign extension,
  * dequantizes and runs the float64 IDCT.
  *
  * Exactness contract for the oracle path: the DCT DC term of a block is
  * Σ(p−128)/8, computed exactly in double (integer sums, ×0.125 — all
  * dyadic), quantized as floor(dc/q₀ + 0.5). The reconstruction's true block
  * mean is then EXACTLY 128 + q₀·DCq/8 (every AC basis function has zero
  * mean), which [[JpegImage.dcMean]] reports straight from the decoded
  * coefficient — a dyadic rational, bit-identical to a relational oracle
  * computing floor((S − 8192)/(8·q₀) + 0.5) from the raw pixels.
  *
  * Reference behavior mirrored: xsarsea ships no image codecs (its rasters
  * are netCDF) — this is part of the multimodal training-data surface, not
  * the §2 reference surface.
  */
object Jpeg {

  /** Decoded image: clamped pixels (the luma plane for color streams) plus
    * the per-block exact DC means (block-major row order, blocksW = ⌈w/8⌉
    * columns). 3-component 4:2:0 streams also carry the half-resolution
    * chroma planes (`chromaW`×`chromaH`, clamped bytes). */
  final case class JpegImage(width: Int, height: Int, pixels: Array[Byte],
      blocksW: Int, blocksH: Int, dcMeans: Array[Double],
      cb: Array[Byte] = null, cr: Array[Byte] = null,
      chromaW: Int = 0, chromaH: Int = 0) {
    def dcMean(blockRow: Int, blockCol: Int): Double = dcMeans(blockRow * blocksW + blockCol)
    def isColor: Boolean = cb != null
  }

  /** Annex K.1 example luminance quantization table (row-major). q₀ = 16. */
  val QuantLuma: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  /** Zigzag scan: zigzag position → row-major coefficient index (Fig. A.6). */
  val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Annex K.3.1: luminance DC Huffman spec (BITS counts for lengths 1..16,
    * then HUFFVAL in order). */
  val DcBits: Array[Int] = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  val DcVals: Array[Int] = (0 to 11).toArray

  /** Annex K.3.2: luminance AC Huffman spec. */
  val AcBits: Array[Int] = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  val AcVals: Array[Int] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
    0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
    0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)

  /** Annex K.1 example chrominance quantization table (row-major). */
  val QuantChroma: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  /** Annex K.3.3/K.3.4: chrominance DC/AC Huffman specs. */
  val DcChromaBits: Array[Int] = Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  val DcChromaVals: Array[Int] = (0 to 11).toArray
  val AcChromaBits: Array[Int] = Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  val AcChromaVals: Array[Int] = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91, 0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0,
    0x15, 0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3,
    0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)

  // cos((2x+1)·u·π/16); column u = 0 is exactly 1.0 (Math.cos(0.0) == 1.0)
  private val CosT: Array[Array[Double]] = Array.tabulate(8, 8) { (x, u) =>
    math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }
  // combined DCT scale 0.25·C(u)·C(v); the (0,0) entry is pinned to the
  // exact dyadic 1/8 so the DC term stays bit-exact (0.25·(1/√2)² ≠ 0.125
  // in float64 — it rounds to 0.12500000000000003)
  private val Scale: Array[Array[Double]] = {
    val c = Array.tabulate(8)(u => if (u == 0) 1.0 / math.sqrt(2.0) else 1.0)
    val s = Array.tabulate(8, 8)((u, v) => 0.25 * c(u) * c(v))
    s(0)(0) = 0.125
    s
  }

  // ---------------------------------------------------------------- encode

  /** Canonical Huffman codes from a (BITS, HUFFVAL) spec: value → (code, len). */
  private def buildCodes(bits: Array[Int], vals: Array[Int]): Array[(Int, Int)] = {
    val out = new Array[(Int, Int)](256)
    var code = 0
    var k = 0
    for (len <- 1 to 16) {
      var i = 0
      while (i < bits(len - 1)) {
        out(vals(k)) = (code, len)
        code += 1; k += 1; i += 1
      }
      code <<= 1
    }
    out
  }

  // the Annex-K code tables are constant — building them per encode call
  // was measurable at 200k-frames-per-query scale
  private lazy val DefaultDcCodes = buildCodes(DcBits, DcVals)
  private lazy val DefaultAcCodes = buildCodes(AcBits, AcVals)
  private lazy val DefaultDcChromaCodes = buildCodes(DcChromaBits, DcChromaVals)
  private lazy val DefaultAcChromaCodes = buildCodes(AcChromaBits, AcChromaVals)

  private final class BitWriter(out: ArrayBuffer[Byte]) {
    private var acc = 0L
    private var nbits = 0
    def put(code: Int, len: Int): Unit = {
      acc = (acc << len) | (code & ((1L << len) - 1))
      nbits += len
      while (nbits >= 8) {
        val b = ((acc >>> (nbits - 8)) & 0xff).toInt
        out += b.toByte
        if (b == 0xff) out += 0x00 // byte stuffing (B.1.1.5)
        nbits -= 8
      }
    }
    /** Pad the final partial byte with 1-bits (B.2.1.1). */
    def flush(): Unit = if (nbits > 0) {
      val pad = 8 - nbits
      put((1 << pad) - 1, pad)
    }
  }

  /** Magnitude category: smallest s with |v| < 2^s (0 for v == 0). */
  private def category(v: Int): Int = 32 - Integer.numberOfLeadingZeros(math.abs(v))

  /** Encode a `width`×`height` row-major gray matrix (dimensions must be
    * multiples of 8 — callers pad or truncate; [[graft.operators.Multimodal]]
    * truncates like the PNG path drops partial rows). */
  def encodeGray(width: Int, height: Int, gray: Array[Byte],
      quant: Array[Int] = QuantLuma): Array[Byte] = {
    require(width % 8 == 0 && height % 8 == 0,
      s"encodeGray needs block-aligned dims, got ${width}x$height")
    require(gray.length >= width * height, "pixel buffer short")
    val out = ArrayBuffer.empty[Byte]
    def u8(v: Int): Unit = out += (v & 0xff).toByte
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xff); u8(m) }

    marker(0xd8) // SOI
    marker(0xdb); u16(2 + 1 + 64); u8(0x00) // DQT: 8-bit precision, table 0
    var z = 0
    while (z < 64) { u8(quant(Zigzag(z))); z += 1 }
    marker(0xc0) // SOF0: baseline DCT
    u16(8 + 3 * 1); u8(8); u16(height); u16(width); u8(1)
    u8(1); u8(0x11); u8(0) // component 1, 1x1 sampling, quant table 0
    def dht(cls: Int, id: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(0xc4); u16(2 + 1 + 16 + vals.length); u8((cls << 4) | id)
      bits.foreach(u8); vals.foreach(u8)
    }
    dht(0, 0, DcBits, DcVals)
    dht(1, 0, AcBits, AcVals)
    marker(0xda) // SOS
    u16(6 + 2 * 1); u8(1); u8(1); u8(0x00); u8(0); u8(63); u8(0)

    val dcCodes = DefaultDcCodes
    val acCodes = DefaultAcCodes
    val bw = new BitWriter(out)
    val coef = new Array[Int](64)
    val tmp = new Array[Double](64)
    var prevDc = 0
    var by = 0
    while (by < height / 8) {
      var bx = 0
      while (bx < width / 8) {
        // separable float64 FDCT of the level-shifted block (row pass into
        // tmp, column pass into coef — 8× fewer flops than the direct
        // double sum; DC stays bit-exact: CosT(_)(0)==1.0 so both passes
        // sum INTEGERS), quantized with floor(x/q + 0.5) — the rounding
        // the relational oracle mirrors
        var ry = 0
        while (ry < 8) {
          val base = (by * 8 + ry) * width + bx * 8
          var u = 0
          while (u < 8) {
            var s = 0.0
            var x = 0
            while (x < 8) {
              s += ((gray(base + x) & 0xff) - 128).toDouble * CosT(x)(u)
              x += 1
            }
            tmp(ry * 8 + u) = s
            u += 1
          }
          ry += 1
        }
        var v = 0
        while (v < 8) {
          var u = 0
          while (u < 8) {
            var s = 0.0
            var y = 0
            while (y < 8) {
              s += tmp(y * 8 + u) * CosT(y)(v)
              y += 1
            }
            coef(v * 8 + u) = math.floor(s * Scale(u)(v) / quant(v * 8 + u) + 0.5).toInt
            u += 1
          }
          v += 1
        }
        // DC: differential, category + extend bits (F.1.2.1)
        val diff = coef(0) - prevDc
        prevDc = coef(0)
        val s = category(diff)
        val (c, l) = dcCodes(s)
        bw.put(c, l)
        if (s > 0) bw.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
        // AC: zigzag run-lengths with ZRL and EOB (F.1.2.2)
        var run = 0
        var zz = 1
        while (zz < 64) {
          val ac = coef(Zigzag(zz))
          if (ac == 0) run += 1
          else {
            while (run > 15) { val (zc, zl) = acCodes(0xf0); bw.put(zc, zl); run -= 16 }
            val as = category(ac)
            val (c2, l2) = acCodes((run << 4) | as)
            bw.put(c2, l2)
            bw.put(if (ac < 0) ac + (1 << as) - 1 else ac, as)
            run = 0
          }
          zz += 1
        }
        if (run > 0) { val (ec, el) = acCodes(0x00); bw.put(ec, el) }
        bx += 1
      }
      by += 1
    }
    bw.flush()
    marker(0xd9) // EOI
    out.toArray
  }

  /** FDCT + quantize + entropy-code ONE 8×8 block from an int plane;
    * returns the new DC predictor. Shared by the color MCU writer. */
  private def writeBlock(bw: BitWriter, plane: Array[Int], stride: Int,
      ox: Int, oy: Int, quant: Array[Int], dcCodes: Array[(Int, Int)],
      acCodes: Array[(Int, Int)], prevDc: Int): Int = {
    // separable FDCT: row pass then column pass — 1k mult-adds per block
    // instead of the 8k of the direct double sum. The DC term stays
    // bit-exact (CosT(_)(0) == 1.0, so both passes sum INTEGERS, exact in
    // float64 regardless of grouping — the q77/q108/q123 oracle contract);
    // AC terms may round ±1 quant step differently, which only shifts the
    // lossy pixel error the specs already bound.
    val coef = new Array[Int](64)
    val tmp = new Array[Double](64) // tmp(y*8+u) = Σ_x (p-128)·CosT(x)(u)
    var y = 0
    while (y < 8) {
      val base = (oy + y) * stride + ox
      var u = 0
      while (u < 8) {
        var s = 0.0
        var x = 0
        while (x < 8) {
          s += (plane(base + x) - 128).toDouble * CosT(x)(u)
          x += 1
        }
        tmp(y * 8 + u) = s
        u += 1
      }
      y += 1
    }
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        var s = 0.0
        var yy = 0
        while (yy < 8) {
          s += tmp(yy * 8 + u) * CosT(yy)(v)
          yy += 1
        }
        coef(v * 8 + u) = math.floor(s * Scale(u)(v) / quant(v * 8 + u) + 0.5).toInt
        u += 1
      }
      v += 1
    }
    val diff = coef(0) - prevDc
    val cs = category(diff)
    val (c, l) = dcCodes(cs)
    bw.put(c, l)
    if (cs > 0) bw.put(if (diff < 0) diff + (1 << cs) - 1 else diff, cs)
    var run = 0
    var zz = 1
    while (zz < 64) {
      val ac = coef(Zigzag(zz))
      if (ac == 0) run += 1
      else {
        while (run > 15) { val (zc, zl) = acCodes(0xf0); bw.put(zc, zl); run -= 16 }
        val as = category(ac)
        val (c2, l2) = acCodes((run << 4) | as)
        bw.put(c2, l2)
        bw.put(if (ac < 0) ac + (1 << as) - 1 else ac, as)
        run = 0
      }
      zz += 1
    }
    if (run > 0) { val (ec, el) = acCodes(0x00); bw.put(ec, el) }
    coef(0)
  }

  /** Encode interleaved-RGB pixels (3 bytes per pixel, row-major) as a
    * 3-component baseline JPEG with 4:2:0 chroma subsampling — the
    * mainstream web/camera shape: JFIF BT.601 color transform, 2×2-average
    * chroma downsample, Annex-K luma+chroma quant and Huffman tables,
    * interleaved Y00 Y01 Y10 Y11 Cb Cr MCUs with per-component DC
    * prediction. Dimensions must be multiples of 16 (one full MCU).
    */
  def encodeRgb420(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(width % 16 == 0 && height % 16 == 0,
      s"encodeRgb420 needs MCU-aligned dims, got ${width}x$height")
    require(rgb.length >= 3 * width * height, "pixel buffer short")
    // JFIF BT.601 planes, rounded and clamped
    val yP = new Array[Int](width * height)
    val cbF = new Array[Double](width * height)
    val crF = new Array[Double](width * height)
    var i = 0
    while (i < width * height) {
      val r = rgb(3 * i) & 0xff
      val g = rgb(3 * i + 1) & 0xff
      val b = rgb(3 * i + 2) & 0xff
      yP(i) = math.max(0, math.min(255, math.round(0.299 * r + 0.587 * g + 0.114 * b).toInt))
      cbF(i) = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
      crF(i) = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
      i += 1
    }
    val cw = width / 2
    val ch = height / 2
    val cbP = new Array[Int](cw * ch)
    val crP = new Array[Int](cw * ch)
    var cy = 0
    while (cy < ch) {
      var cx = 0
      while (cx < cw) {
        var sb = 0.0
        var sr = 0.0
        var dy = 0
        while (dy < 2) {
          var dx = 0
          while (dx < 2) {
            val p = (2 * cy + dy) * width + 2 * cx + dx
            sb += cbF(p); sr += crF(p)
            dx += 1
          }
          dy += 1
        }
        cbP(cy * cw + cx) = math.max(0, math.min(255, math.round(sb / 4.0).toInt))
        crP(cy * cw + cx) = math.max(0, math.min(255, math.round(sr / 4.0).toInt))
        cx += 1
      }
      cy += 1
    }

    val out = ArrayBuffer.empty[Byte]
    def u8(v: Int): Unit = out += (v & 0xff).toByte
    def u16v(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xff); u8(m) }
    def dqt(id: Int, q: Array[Int]): Unit = {
      marker(0xdb); u16v(2 + 1 + 64); u8(id)
      var z = 0
      while (z < 64) { u8(q(Zigzag(z))); z += 1 }
    }
    def dht(cls: Int, id: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(0xc4); u16v(2 + 1 + 16 + vals.length); u8((cls << 4) | id)
      bits.foreach(u8); vals.foreach(u8)
    }
    marker(0xd8)
    dqt(0, QuantLuma); dqt(1, QuantChroma)
    marker(0xc0); u16v(8 + 3 * 3); u8(8); u16v(height); u16v(width); u8(3)
    u8(1); u8(0x22); u8(0) // Y: 2x2 sampling, quant 0
    u8(2); u8(0x11); u8(1) // Cb
    u8(3); u8(0x11); u8(1) // Cr
    dht(0, 0, DcBits, DcVals); dht(1, 0, AcBits, AcVals)
    dht(0, 1, DcChromaBits, DcChromaVals); dht(1, 1, AcChromaBits, AcChromaVals)
    marker(0xda); u16v(6 + 2 * 3); u8(3)
    u8(1); u8(0x00); u8(2); u8(0x11); u8(3); u8(0x11)
    u8(0); u8(63); u8(0)

    val dcY = DefaultDcCodes
    val acY = DefaultAcCodes
    val dcC = DefaultDcChromaCodes
    val acC = DefaultAcChromaCodes
    val bw = new BitWriter(out)
    var pY = 0
    var pCb = 0
    var pCr = 0
    var my = 0
    while (my < height / 16) {
      var mx = 0
      while (mx < width / 16) {
        var sv = 0
        while (sv < 2) {
          var sh = 0
          while (sh < 2) {
            pY = writeBlock(bw, yP, width, mx * 16 + sh * 8, my * 16 + sv * 8,
              QuantLuma, dcY, acY, pY)
            sh += 1
          }
          sv += 1
        }
        pCb = writeBlock(bw, cbP, cw, mx * 8, my * 8, QuantChroma, dcC, acC, pCb)
        pCr = writeBlock(bw, crP, cw, mx * 8, my * 8, QuantChroma, dcC, acC, pCr)
        mx += 1
      }
      my += 1
    }
    bw.flush()
    marker(0xd9)
    out.toArray
  }

  // ---------------------------------------------------------------- decode

  /** Canonical Huffman decode tables (F.2.2.3): per code length, the first
    * code value and the HUFFVAL offset. */
  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      for (l <- 1 to 16) {
        valPtr(l) = k
        minCode(l) = code
        code += bits(l - 1); k += bits(l - 1)
        maxCode(l) = code - 1
        if (bits(l - 1) == 0) maxCode(l) = -1
        code <<= 1
      }
    }
    def value(len: Int, code: Int): Int = vals(valPtr(len) + (code - minCode(len)))
  }

  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0
    /** Next entropy bit; 0xFF00 unstuffing; a marker mid-stream is an error. */
    def bit(): Int = {
      if (nbits == 0) {
        if (pos >= data.length) throw new IllegalArgumentException("jpeg: truncated entropy data")
        var b = data(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          val b2 = if (pos < data.length) data(pos) & 0xff else -1
          if (b2 == 0x00) pos += 1
          else throw new IllegalArgumentException(f"jpeg: marker 0xff$b2%02x inside entropy data")
        }
        acc = b; nbits = 8
      }
      nbits -= 1
      (acc >> nbits) & 1
    }
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def decode(t: HuffTable): Int = {
      var code = bit()
      var l = 1
      while (l <= 16 && (t.maxCode(l) < 0 || code > t.maxCode(l))) {
        code = (code << 1) | bit(); l += 1
      }
      if (l > 16) throw new IllegalArgumentException("jpeg: bad huffman code")
      t.value(l, code)
    }
  }

  /** Sign extension of an s-bit magnitude value (F.2.2.1 EXTEND). */
  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  def decode(bytes: Array[Byte]): JpegImage = decodeImpl(bytes, pixelsToo = true)

  /** DC-only decode: the full entropy stream still parses (AC runs must be
    * walked to keep the bit position and DC predictors honest) but every
    * IDCT is skipped, so `dcMean` is exact and `pixels` stays zeroed. The
    * perceptual paths (frame dHash, DC-mean sampling) read ONLY the DC
    * surface — at 200k frames per sf0.1 clip query the skipped IDCTs are
    * the bulk of the decode cost.
    */
  def decodeDc(bytes: Array[Byte]): JpegImage = decodeImpl(bytes, pixelsToo = false)

  private def decodeImpl(bytes: Array[Byte], pixelsToo: Boolean): JpegImage = {
    require(bytes.length >= 4 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8,
      "jpeg: missing SOI")
    var pos = 2
    val quant = Array.fill(4)(null: Array[Int])
    val dcTab = Array.fill(4)(null: HuffTable)
    val acTab = Array.fill(4)(null: HuffTable)
    var width = 0
    var height = 0
    var nComp = 0
    val compId = new Array[Int](3)
    val compSamp = new Array[Int](3)
    val compQuant = new Array[Int](3)
    val compDc = new Array[Int](3)
    val compAc = new Array[Int](3)
    def u16(p: Int): Int = ((bytes(p) & 0xff) << 8) | (bytes(p + 1) & 0xff)

    var sosAt = -1
    while (sosAt < 0) {
      require(pos + 4 <= bytes.length, "jpeg: truncated")
      require((bytes(pos) & 0xff) == 0xff, f"jpeg: expected marker at $pos")
      val m = bytes(pos + 1) & 0xff
      val len = u16(pos + 2)
      require(pos + 2 + len <= bytes.length, "jpeg: truncated segment")
      val seg = pos + 4
      m match {
        case 0xdb => // DQT — possibly several tables per segment
          var p = seg
          while (p < pos + 2 + len) {
            val pq = (bytes(p) & 0xff) >> 4
            val tq = bytes(p) & 0x0f
            require(pq == 0, "jpeg: only 8-bit quant tables supported")
            val t = new Array[Int](64)
            var z = 0
            while (z < 64) { t(Zigzag(z)) = bytes(p + 1 + z) & 0xff; z += 1 }
            quant(tq) = t
            p += 65
          }
        case 0xc0 => // SOF0 baseline: gray (1×1) or YCbCr 4:2:0 (2×2,1×1,1×1)
          require((bytes(seg) & 0xff) == 8, "jpeg: only 8-bit precision")
          height = u16(seg + 1); width = u16(seg + 3)
          nComp = bytes(seg + 5) & 0xff
          require(nComp == 1 || nComp == 3, s"jpeg: $nComp components unsupported")
          var ci = 0
          while (ci < nComp) {
            compId(ci) = bytes(seg + 6 + 3 * ci) & 0xff
            compSamp(ci) = bytes(seg + 7 + 3 * ci) & 0xff
            compQuant(ci) = bytes(seg + 8 + 3 * ci) & 0xff
            ci += 1
          }
          if (nComp == 1)
            require(compSamp(0) == 0x11, "jpeg: only 1x1 sampling for gray")
          else
            require(compSamp(0) == 0x22 && compSamp(1) == 0x11 && compSamp(2) == 0x11,
              "jpeg: only 4:2:0 subsampling supported for color")
        case 0xc1 | 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
          throw new IllegalArgumentException(f"jpeg: unsupported SOF marker 0xff$m%02x (baseline only)")
        case 0xc4 => // DHT — possibly several tables per segment
          var p = seg
          while (p < pos + 2 + len) {
            val tc = (bytes(p) & 0xff) >> 4
            val th = bytes(p) & 0x0f
            val bits = Array.tabulate(16)(i => bytes(p + 1 + i) & 0xff)
            val n = bits.sum
            val vals = Array.tabulate(n)(i => bytes(p + 17 + i) & 0xff)
            val t = new HuffTable(bits, vals)
            if (tc == 0) dcTab(th) = t else acTab(th) = t
            p += 17 + n
          }
        case 0xda => // SOS — single interleaved scan, components in SOF order
          val ns = bytes(seg) & 0xff
          require(ns == nComp, "jpeg: scan must cover all components")
          var si = 0
          while (si < ns) {
            val sid = bytes(seg + 1 + 2 * si) & 0xff
            val ci = compId.indexOf(sid)
            require(ci >= 0 && ci < nComp, s"jpeg: scan component $sid not in frame")
            compDc(ci) = (bytes(seg + 2 + 2 * si) & 0xff) >> 4
            compAc(ci) = bytes(seg + 2 + 2 * si) & 0x0f
            si += 1
          }
          sosAt = pos + 2 + len
        case 0xd9 => throw new IllegalArgumentException("jpeg: EOI before SOS")
        case _ => // APPn / COM / others: skip
      }
      if (sosAt < 0) pos += 2 + len
    }

    val br = new BitReader(bytes, sosAt)
    val coef = new Array[Int](64)

    /** Entropy-decode one block into `coef` (dequantized); returns the new
      * DC predictor (QUANTIZED units, like the encoder's). */
    def decodeBlock(dct: HuffTable, act: HuffTable, q: Array[Int], prevDc: Int): Int = {
      java.util.Arrays.fill(coef, 0)
      val s = br.decode(dct)
      val dc = prevDc + extend(br.bits(s), s)
      coef(0) = dc * q(0)
      var zz = 1
      while (zz < 64) {
        val rs = br.decode(act)
        val run = rs >> 4
        val size = rs & 0x0f
        if (size == 0) {
          if (run == 15) zz += 16 // ZRL
          else zz = 64 // EOB
        } else {
          zz += run
          require(zz < 64, "jpeg: AC run past block end")
          coef(Zigzag(zz)) = extend(br.bits(size), size) * q(Zigzag(zz))
          zz += 1
        }
      }
      dc
    }

    /** Float64 IDCT of `coef` + level shift + clamp into a byte plane.
      * No-op in DC-only mode (the plane stays zeroed). */
    def idctInto(plane: Array[Byte], stride: Int, rows: Int, ox: Int, oy: Int): Unit = {
      if (!pixelsToo) return
      var y = 0
      while (y < 8) {
        val py = oy + y
        var x = 0
        while (x < 8) {
          val px = ox + x
          if (py < rows && px < stride) {
            var sum = 0.0
            var v = 0
            while (v < 8) {
              var u = 0
              while (u < 8) {
                val c = coef(v * 8 + u)
                if (c != 0) sum += Scale(u)(v) * c * CosT(x)(u) * CosT(y)(v)
                u += 1
              }
              v += 1
            }
            val p = math.round(sum + 128.0).toInt
            plane(py * stride + px) = math.max(0, math.min(255, p)).toByte
          }
          x += 1
        }
        y += 1
      }
    }

    def tablesFor(ci: Int): (HuffTable, HuffTable, Array[Int]) = {
      val q = quant(compQuant(ci))
      val d = dcTab(compDc(ci))
      val a = acTab(compAc(ci))
      require(q != null, s"jpeg: missing quant table for component $ci")
      require(d != null && a != null, s"jpeg: missing huffman table for component $ci")
      (d, a, q)
    }

    if (nComp == 1) {
      val (dct, act, q) = tablesFor(0)
      val blocksW = (width + 7) / 8
      val blocksH = (height + 7) / 8
      val pixels = new Array[Byte](width * height)
      val dcMeans = new Array[Double](blocksW * blocksH)
      var prevDc = 0
      var by = 0
      while (by < blocksH) {
        var bx = 0
        while (bx < blocksW) {
          prevDc = decodeBlock(dct, act, q, prevDc)
          // exact block mean: AC bases are zero-mean, so mean = 128 + DC/8
          // (dyadic when q(0) is — never touched by IDCT float noise)
          dcMeans(by * blocksW + bx) = 128.0 + coef(0) / 8.0
          idctInto(pixels, width, height, bx * 8, by * 8)
          bx += 1
        }
        by += 1
      }
      JpegImage(width, height, pixels, blocksW, blocksH, dcMeans)
    } else {
      // 4:2:0 interleaved MCUs: Y00 Y01 Y10 Y11 Cb Cr, per-component DC
      // prediction; planes padded to whole MCUs, output cropped
      val (dctY, actY, qY) = tablesFor(0)
      val (dctCb, actCb, qCb) = tablesFor(1)
      val (dctCr, actCr, qCr) = tablesFor(2)
      val mcuW = (width + 15) / 16
      val mcuH = (height + 15) / 16
      val yW = mcuW * 16
      val yH = mcuH * 16
      val cW = mcuW * 8
      val cH = mcuH * 8
      val yPlane = new Array[Byte](yW * yH)
      val cbPlane = new Array[Byte](cW * cH)
      val crPlane = new Array[Byte](cW * cH)
      val blocksW = yW / 8
      val blocksH = yH / 8
      val dcMeans = new Array[Double](blocksW * blocksH)
      var pY = 0
      var pCb = 0
      var pCr = 0
      var my = 0
      while (my < mcuH) {
        var mx = 0
        while (mx < mcuW) {
          var sv = 0
          while (sv < 2) {
            var sh = 0
            while (sh < 2) {
              pY = decodeBlock(dctY, actY, qY, pY)
              val bx = mx * 2 + sh
              val byy = my * 2 + sv
              dcMeans(byy * blocksW + bx) = 128.0 + coef(0) / 8.0
              idctInto(yPlane, yW, yH, bx * 8, byy * 8)
              sh += 1
            }
            sv += 1
          }
          pCb = decodeBlock(dctCb, actCb, qCb, pCb)
          idctInto(cbPlane, cW, cH, mx * 8, my * 8)
          pCr = decodeBlock(dctCr, actCr, qCr, pCr)
          idctInto(crPlane, cW, cH, mx * 8, my * 8)
          mx += 1
        }
        my += 1
      }
      // crop the luma plane to the frame size
      val pixels =
        if (yW == width && yH == height) yPlane
        else {
          val out = new Array[Byte](width * height)
          var r = 0
          while (r < height) {
            System.arraycopy(yPlane, r * yW, out, r * width, width)
            r += 1
          }
          out
        }
      JpegImage(width, height, pixels, blocksW, blocksH, dcMeans,
        cb = cbPlane, cr = crPlane, chromaW = cW, chromaH = cH)
    }
  }
}
