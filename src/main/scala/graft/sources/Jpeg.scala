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

  /** Decoded image: clamped pixels plus the per-block exact DC means
    * (block-major row order, blocksW = ⌈w/8⌉ columns). */
  final case class JpegImage(width: Int, height: Int, pixels: Array[Byte],
      blocksW: Int, blocksH: Int, dcMeans: Array[Double]) {
    def dcMean(blockRow: Int, blockCol: Int): Double = dcMeans(blockRow * blocksW + blockCol)
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

    val dcCodes = buildCodes(DcBits, DcVals)
    val acCodes = buildCodes(AcBits, AcVals)
    val bw = new BitWriter(out)
    val coef = new Array[Int](64)
    var prevDc = 0
    var by = 0
    while (by < height / 8) {
      var bx = 0
      while (bx < width / 8) {
        // float64 FDCT of the level-shifted block, quantized with
        // floor(x/q + 0.5) — the rounding the relational oracle mirrors
        var v = 0
        while (v < 8) {
          var u = 0
          while (u < 8) {
            var s = 0.0
            var y = 0
            while (y < 8) {
              var x = 0
              while (x < 8) {
                val p = gray((by * 8 + y) * width + bx * 8 + x) & 0xff
                s += (p - 128).toDouble * CosT(x)(u) * CosT(y)(v)
                x += 1
              }
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

  def decode(bytes: Array[Byte]): JpegImage = {
    require(bytes.length >= 4 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8,
      "jpeg: missing SOI")
    var pos = 2
    val quant = Array.fill(4)(null: Array[Int])
    val dcTab = Array.fill(4)(null: HuffTable)
    val acTab = Array.fill(4)(null: HuffTable)
    var width = 0
    var height = 0
    var compQuant = 0
    var compDc = 0
    var compAc = 0
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
        case 0xc0 => // SOF0 baseline
          require((bytes(seg) & 0xff) == 8, "jpeg: only 8-bit precision")
          height = u16(seg + 1); width = u16(seg + 3)
          require((bytes(seg + 5) & 0xff) == 1, "jpeg: only single-component (gray)")
          require((bytes(seg + 7) & 0xff) == 0x11, "jpeg: only 1x1 sampling")
          compQuant = bytes(seg + 8) & 0xff
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
        case 0xda => // SOS
          require((bytes(seg) & 0xff) == 1, "jpeg: single-scan gray only")
          compDc = (bytes(seg + 2) & 0xff) >> 4
          compAc = bytes(seg + 2) & 0x0f
          sosAt = pos + 2 + len
        case 0xd9 => throw new IllegalArgumentException("jpeg: EOI before SOS")
        case _ => // APPn / COM / others: skip
      }
      if (sosAt < 0) pos += 2 + len
    }

    val q = quant(compQuant)
    require(q != null, "jpeg: missing quant table")
    val dct = dcTab(compDc)
    val act = acTab(compAc)
    require(dct != null && act != null, "jpeg: missing huffman table")
    val blocksW = (width + 7) / 8
    val blocksH = (height + 7) / 8
    val pixels = new Array[Byte](width * height)
    val dcMeans = new Array[Double](blocksW * blocksH)
    val br = new BitReader(bytes, sosAt)
    val coef = new Array[Int](64)
    var prevDc = 0
    var by = 0
    while (by < blocksH) {
      var bx = 0
      while (bx < blocksW) {
        java.util.Arrays.fill(coef, 0)
        val s = br.decode(dct)
        prevDc += extend(br.bits(s), s)
        coef(0) = prevDc * q(0)
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
        // exact block mean: AC bases are zero-mean, so mean = 128 + DC/8
        // (dyadic when q(0) is — never touched by IDCT float noise)
        dcMeans(by * blocksW + bx) = 128.0 + coef(0) / 8.0
        // float64 IDCT + level shift + clamp for the pixel surface
        var y = 0
        while (y < 8) {
          val py = by * 8 + y
          var x = 0
          while (x < 8) {
            val px = bx * 8 + x
            if (py < height && px < width) {
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
              pixels(py * width + px) = math.max(0, math.min(255, p)).toByte
            }
            x += 1
          }
          y += 1
        }
        bx += 1
      }
      by += 1
    }
    JpegImage(width, height, pixels, blocksW, blocksH, dcMeans)
  }
}
