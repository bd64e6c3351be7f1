package graft.sources

import java.util.zip.{CRC32, Deflater, Inflater}

/** Pure-JVM PNG codec — no image library, implemented from the public spec
  * (W3C PNG, RFC 2083): 8-byte signature, length/type/data/CRC chunk walk,
  * zlib-deflated IDAT, and the five scanline filters (None/Sub/Up/Average/
  * Paeth). Decodes bit-depth-8 images of every color type — grayscale (0),
  * truecolor (2), palette (3, via PLTE), gray+alpha (4), RGBA (6) — to an
  * interleaved row-major byte matrix. Adam7 interlace and 1/2/4/16-bit
  * depths are rejected with a clear error (not silently mis-read); the
  * multimodal corpus shapes this engine targets are 8-bit.
  *
  * This retires the PNG half of the codec-decode stub
  * ([[graft.operators.Multimodal.decodeStub]]): the decode → gray →
  * pool pipeline now runs on REAL compressed image bytes. The same
  * container-constraint discipline as the other from-scratch format
  * readers (Nc3, Hdf5, Npy, Pickle): public spec, spec-fixture-verified
  * against independently (Python-)written files.
  *
  * Scale shape: decode is a per-row partition kernel — payloads never
  * shuffle; headers are read without inflating, so width/height metadata
  * extraction is O(chunk walk).
  */
object Png {

  /** Decoded image: `pixels` is row-major, `channels`-interleaved, 8-bit. */
  final case class Image(width: Int, height: Int, channels: Int,
      pixels: Array[Byte])

  private val Signature: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def beInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def chunkType(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Channels per pixel for each PNG color type (palette counts as 1
    * pre-expansion). */
  private def rawChannels(colorType: Int): Int = colorType match {
    case 0 => 1 // grayscale
    case 2 => 3 // truecolor
    case 3 => 1 // palette index
    case 4 => 2 // gray + alpha
    case 6 => 4 // RGBA
    case t => throw new IllegalArgumentException(s"PNG: unknown color type $t")
  }

  /** Decode a PNG byte array. Palette images expand to RGB. */
  def decode(bytes: Array[Byte]): Image = {
    require(bytes.length >= 8 && Signature.indices.forall(i => bytes(i) == Signature(i)),
      "PNG: bad signature")
    var off = 8
    var width = -1; var height = -1; var bitDepth = -1; var colorType = -1
    var interlace = -1
    var palette: Array[Byte] = null
    val idat = new java.io.ByteArrayOutputStream()
    var sawEnd = false
    while (!sawEnd && off + 8 <= bytes.length) {
      val len = beInt(bytes, off)
      val typ = chunkType(bytes, off + 4)
      require(len >= 0 && off + 12 + len <= bytes.length,
        s"PNG: truncated $typ chunk at offset $off")
      typ match {
        case "IHDR" =>
          width = beInt(bytes, off + 8)
          height = beInt(bytes, off + 12)
          bitDepth = bytes(off + 16) & 0xff
          colorType = bytes(off + 17) & 0xff
          // compression (18) and filter method (19) must be 0 per spec
          require((bytes(off + 18) & 0xff) == 0, "PNG: unknown compression method")
          require((bytes(off + 19) & 0xff) == 0, "PNG: unknown filter method")
          interlace = bytes(off + 20) & 0xff
        case "PLTE" =>
          palette = java.util.Arrays.copyOfRange(bytes, off + 8, off + 8 + len)
        case "IDAT" =>
          idat.write(bytes, off + 8, len)
        case "IEND" =>
          sawEnd = true
        case _ => // ancillary chunks (tEXt, gAMA, …) are skippable
      }
      off += 12 + len
    }
    require(width > 0 && height > 0, "PNG: missing or empty IHDR")
    require(bitDepth == 8, s"PNG: only bit depth 8 supported, got $bitDepth")
    require(interlace == 0, "PNG: Adam7 interlace not supported")
    val ch = rawChannels(colorType)
    if (colorType == 3) require(palette != null, "PNG: palette image without PLTE")

    // inflate the concatenated IDAT stream: height * (1 filter byte + w*ch)
    val raw = inflate(idat.toByteArray, height * (1 + width * ch))

    // unfilter in place into the output matrix
    val stride = width * ch
    val out = new Array[Byte](height * stride)
    val bpp = ch // bytes per pixel at depth 8
    var r = 0
    while (r < height) {
      val fOff = r * (1 + stride)
      val filter = raw(fOff) & 0xff
      val rowOff = r * stride
      val prevOff = rowOff - stride
      var i = 0
      while (i < stride) {
        val x = raw(fOff + 1 + i) & 0xff
        val left = if (i >= bpp) out(rowOff + i - bpp) & 0xff else 0
        val above = if (r > 0) out(prevOff + i) & 0xff else 0
        val upLeft = if (r > 0 && i >= bpp) out(prevOff + i - bpp) & 0xff else 0
        val recon = filter match {
          case 0 => x
          case 1 => x + left
          case 2 => x + above
          case 3 => x + ((left + above) >> 1)
          case 4 => x + paeth(left, above, upLeft)
          case f => throw new IllegalArgumentException(s"PNG: unknown filter type $f in row $r")
        }
        out(rowOff + i) = (recon & 0xff).toByte
        i += 1
      }
      r += 1
    }

    if (colorType == 3) {
      // expand palette indices to RGB
      val rgb = new Array[Byte](height * width * 3)
      var p = 0
      while (p < height * width) {
        val idx = (out(p) & 0xff) * 3
        require(idx + 2 < palette.length, s"PNG: palette index ${out(p) & 0xff} out of range")
        rgb(p * 3) = palette(idx)
        rgb(p * 3 + 1) = palette(idx + 1)
        rgb(p * 3 + 2) = palette(idx + 2)
        p += 1
      }
      Image(width, height, 3, rgb)
    } else Image(width, height, ch, out)
  }

  /** PaethPredictor, exactly as specified (RFC 2083 §6.6). */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def inflate(data: Array[Byte], expected: Int): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(data)
    val out = new Array[Byte](expected)
    var got = 0
    while (got < expected && !inf.finished()) {
      val n = inf.inflate(out, got, expected - got)
      require(n > 0 || !inf.needsInput(), "PNG: truncated IDAT stream")
      got += n
    }
    inf.end()
    require(got == expected, s"PNG: inflated $got bytes, expected $expected")
    out
  }

  /** Integer ITU-R BT.601 luma — deterministic gray from any decoded image:
    * gray = (299·R + 587·G + 114·B + 500) / 1000 (exact integer arithmetic,
    * engine-portable); gray/gray+alpha images pass their gray channel
    * through; alpha is ignored (decode-side compositing is a policy choice
    * left to callers).
    */
  def toGray(img: Image): Array[Byte] = img.channels match {
    case 1 => img.pixels
    case 2 =>
      val g = new Array[Byte](img.width * img.height)
      var p = 0
      while (p < g.length) { g(p) = img.pixels(p * 2); p += 1 }
      g
    case c =>
      val g = new Array[Byte](img.width * img.height)
      var p = 0
      while (p < g.length) {
        val r = img.pixels(p * c) & 0xff
        val gg = img.pixels(p * c + 1) & 0xff
        val b = img.pixels(p * c + 2) & 0xff
        g(p) = ((299 * r + 587 * gg + 114 * b + 500) / 1000).toByte
        p += 1
      }
      g
  }

  /** Encode an 8-bit grayscale matrix as a PNG. `filterCycle` applies
    * filter type (row mod 5) per scanline — every decode filter path gets
    * exercised by any image of ≥5 rows; `false` writes all-None filters.
    * Used by the round-trip oracle query (encode → decode == identity) and
    * the spec fixtures.
    */
  def encodeGray(width: Int, height: Int, pixels: Array[Byte],
      filterCycle: Boolean = true): Array[Byte] = {
    require(pixels.length >= width * height, "PNG: pixel buffer too small")
    val stride = width
    val filtered = new Array[Byte](height * (1 + stride))
    var r = 0
    while (r < height) {
      val f = if (filterCycle) r % 5 else 0
      filtered(r * (1 + stride)) = f.toByte
      var i = 0
      while (i < stride) {
        val x = pixels(r * stride + i) & 0xff
        val left = if (i >= 1) pixels(r * stride + i - 1) & 0xff else 0
        val above = if (r > 0) pixels((r - 1) * stride + i) & 0xff else 0
        val upLeft = if (r > 0 && i >= 1) pixels((r - 1) * stride + i - 1) & 0xff else 0
        val v = f match {
          case 0 => x
          case 1 => x - left
          case 2 => x - above
          case 3 => x - ((left + above) >> 1)
          case 4 => x - paeth(left, above, upLeft)
        }
        filtered(r * (1 + stride) + 1 + i) = (v & 0xff).toByte
        i += 1
      }
      r += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write(Signature, 0, Signature.length)
    val ihdr = new Array[Byte](13)
    putBeInt(ihdr, 0, width); putBeInt(ihdr, 4, height)
    ihdr(8) = 8 // bit depth
    ihdr(9) = 0 // color type: grayscale
    // compression 0, filter 0, interlace 0 already zeroed
    writeChunk(out, "IHDR", ihdr)
    writeChunk(out, "IDAT", deflate(filtered))
    writeChunk(out, "IEND", Array.empty[Byte])
    out.toByteArray
  }

  private def putBeInt(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v >>> 24).toByte; b(off + 1) = (v >>> 16).toByte
    b(off + 2) = (v >>> 8).toByte; b(off + 3) = v.toByte
  }

  private def writeChunk(out: java.io.ByteArrayOutputStream, typ: String,
      data: Array[Byte]): Unit = {
    val len = new Array[Byte](4); putBeInt(len, 0, data.length)
    out.write(len, 0, 4)
    val typB = typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    out.write(typB, 0, 4)
    out.write(data, 0, data.length)
    val crc = new CRC32()
    crc.update(typB); crc.update(data)
    val crcB = new Array[Byte](4); putBeInt(crcB, 0, crc.getValue.toInt)
    out.write(crcB, 0, 4)
  }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(data); d.finish()
    val buf = new Array[Byte](math.max(64, data.length + data.length / 2 + 32))
    val out = new java.io.ByteArrayOutputStream()
    while (!d.finished()) {
      val n = d.deflate(buf)
      out.write(buf, 0, n)
    }
    d.end()
    out.toByteArray
  }
}
