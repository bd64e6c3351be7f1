package graft.sources

import java.io.ByteArrayOutputStream

/** GIF87a/89a reader/writer (grayscale-palette subset) — the fourth image
  * codec beside [[Png]]/[[Jpeg]] raster formats: palette-indexed pixels
  * under GIF-LZW entropy coding, written from the public spec (the W3C
  * GIF89a recommendation) with no imaging library. Web crawls are full of
  * GIFs; a curation pipeline that fingerprints images needs to open them.
  *
  * Writer: GIF89a, one image, 256-entry grayscale global palette, full
  * variable-code-size LZW (9→12 bits, clear-on-full). Reader: skips
  * extension blocks, handles any palette (non-gray entries collapse by
  * the BT.601 luma), general LZW including degenerate clear-code-heavy
  * streams; interlaced images are rejected loudly (documented subset).
  */
object Gif {

  final case class GifImage(width: Int, height: Int, gray: Array[Byte])

  // ------------------------------------------------------------------ write

  /** LSB-first bit packer feeding 255-byte sub-blocks. */
  private final class SubBlockWriter(out: ByteArrayOutputStream) {
    private val block = new Array[Byte](255)
    private var nBlock = 0
    private var acc = 0L
    private var nBits = 0
    def put(code: Int, size: Int): Unit = {
      acc |= (code.toLong << nBits)
      nBits += size
      while (nBits >= 8) {
        block(nBlock) = (acc & 0xff).toByte
        nBlock += 1
        if (nBlock == 255) flushBlock()
        acc >>>= 8
        nBits -= 8
      }
    }
    private def flushBlock(): Unit = {
      out.write(nBlock)
      out.write(block, 0, nBlock)
      nBlock = 0
    }
    def finish(): Unit = {
      if (nBits > 0) { block(nBlock) = (acc & 0xff).toByte; nBlock += 1 }
      if (nBlock > 0) flushBlock()
      out.write(0) // block terminator
    }
  }

  /** 8-bit gray pixels → one GIF89a byte stream (identity palette). */
  def encodeGray(width: Int, height: Int, gray: Array[Byte]): Array[Byte] = {
    require(gray.length >= width * height, "gif: pixel buffer too small")
    val out = new ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >>> 8) & 0xff) }
    out.write("GIF89a".getBytes("US-ASCII"))
    u16(width); u16(height)
    out.write(0xf7) // global table, 8 bits/pixel, 256 entries
    out.write(0); out.write(0)
    (0 until 256).foreach(i => { out.write(i); out.write(i); out.write(i) })
    out.write(0x2c) // image descriptor
    u16(0); u16(0); u16(width); u16(height)
    out.write(0) // no local table, not interlaced
    out.write(8) // LZW minimum code size
    // GIF-LZW: dict of strings → codes; 256=clear, 257=EOI, first free 258
    val bw = new SubBlockWriter(out)
    val Clear = 256
    val Eoi = 257
    var dict = scala.collection.mutable.HashMap.empty[(Int, Int), Int] // (prefixCode, k) → code
    var nextCode = 258
    var codeSize = 9
    bw.put(Clear, codeSize)
    var prefix = -1
    var i = 0
    val n = width * height
    while (i < n) {
      val k = gray(i) & 0xff
      if (prefix < 0) prefix = k
      else dict.get((prefix, k)) match {
        case Some(c) => prefix = c
        case None =>
          bw.put(prefix, codeSize)
          dict((prefix, k)) = nextCode
          nextCode += 1
          if (nextCode - 1 == (1 << codeSize) && codeSize < 12) codeSize += 1
          if (nextCode == 4096) {
            bw.put(Clear, codeSize)
            dict = scala.collection.mutable.HashMap.empty
            nextCode = 258
            codeSize = 9
          }
          prefix = k
      }
      i += 1
    }
    if (prefix >= 0) bw.put(prefix, codeSize)
    bw.put(Eoi, codeSize)
    bw.finish()
    out.write(0x3b) // trailer
    out.toByteArray
  }

  // ------------------------------------------------------------------- read

  private final class SubBlockReader(bytes: Array[Byte], start: Int) {
    private var pos = start
    private var blockEnd = start // empty: next read pulls a length byte
    private var acc = 0L
    private var nBits = 0
    def read(size: Int): Int = {
      while (nBits < size) {
        if (pos == blockEnd) {
          val len = bytes(pos) & 0xff
          if (len == 0) return -1 // terminator mid-code: truncated stream
          pos += 1
          blockEnd = pos + len
        }
        acc |= (bytes(pos) & 0xffL) << nBits
        pos += 1
        nBits += 8
      }
      val v = (acc & ((1L << size) - 1)).toInt
      acc >>>= size
      nBits -= size
      v
    }
  }

  /** Parse a (non-interlaced) GIF into gray pixels; colored palettes
    * collapse by rounded BT.601 luma. */
  def decode(bytes: Array[Byte]): GifImage = {
    val sig = new String(bytes, 0, 6, "US-ASCII")
    require(sig == "GIF89a" || sig == "GIF87a", s"gif: bad signature $sig")
    def u16(p: Int): Int = (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8)
    var pos = 6
    pos += 4 // logical screen size
    val flags = bytes(pos) & 0xff
    pos += 3
    var palette: Array[Byte] = null
    def readPalette(sizeBits: Int): Unit = {
      val n = 1 << (sizeBits + 1)
      palette = new Array[Byte](n)
      (0 until n).foreach { i =>
        val r = bytes(pos + 3 * i) & 0xff
        val g = bytes(pos + 3 * i + 1) & 0xff
        val b = bytes(pos + 3 * i + 2) & 0xff
        palette(i) =
          if (r == g && g == b) r.toByte
          else math.round(0.299 * r + 0.587 * g + 0.114 * b).toInt.min(255).toByte
      }
      pos += 3 * n
    }
    if ((flags & 0x80) != 0) readPalette(flags & 7)
    while (true) {
      (bytes(pos) & 0xff) match {
        case 0x21 => // extension: label + sub-blocks
          pos += 2
          while ((bytes(pos) & 0xff) != 0) pos += 1 + (bytes(pos) & 0xff)
          pos += 1
        case 0x3b =>
          throw new IllegalArgumentException("gif: no image block before trailer")
        case 0x2c =>
          val w = u16(pos + 5)
          val h = u16(pos + 7)
          val iflags = bytes(pos + 9) & 0xff
          require((iflags & 0x40) == 0, "gif: interlaced images unsupported (subset)")
          pos += 10
          if ((iflags & 0x80) != 0) readPalette(iflags & 7)
          require(palette != null, "gif: no color table")
          val minCode = bytes(pos) & 0xff
          pos += 1
          val Clear = 1 << minCode
          val Eoi = Clear + 1
          val br = new SubBlockReader(bytes, pos)
          // LZW dictionary as (prefixCode, tailByte) arrays
          val prefixOf = new Array[Int](4096)
          val tailOf = new Array[Byte](4096)
          var nextCode = Eoi + 1
          var codeSize = minCode + 1
          val px = new Array[Byte](w * h)
          var out = 0
          var prev = -1
          def emit(code: Int): Byte = { // expand a code, return its FIRST byte
            var stack = List.empty[Byte]
            var c = code
            while (c >= Clear) { stack = tailOf(c) :: stack; c = prefixOf(c) }
            val first = c.toByte
            stack = first :: stack
            stack.foreach { b =>
              if (out < px.length) { px(out) = palette(b & 0xff); out += 1 }
            }
            first
          }
          var done = false
          while (!done) {
            val code = br.read(codeSize)
            if (code == -1 || code == Eoi) done = true
            else if (code == Clear) { nextCode = Eoi + 1; codeSize = minCode + 1; prev = -1 }
            else if (prev < 0) { emit(code); prev = code }
            else {
              val first =
                if (code < nextCode) emit(code)
                else { // KwKwK case: code == nextCode
                  require(code == nextCode, s"gif: LZW code $code out of range")
                  var c = prev
                  while (c >= Clear) c = prefixOf(c)
                  // emit prev + firstOf(prev)
                  val f = c.toByte
                  var stack = List.empty[Byte]
                  var cc = prev
                  while (cc >= Clear) { stack = tailOf(cc) :: stack; cc = prefixOf(cc) }
                  stack = cc.toByte :: stack
                  (stack :+ f).foreach { b =>
                    if (out < px.length) { px(out) = palette(b & 0xff); out += 1 }
                  }
                  f
                }
              if (nextCode < 4096) {
                prefixOf(nextCode) = prev
                tailOf(nextCode) = first
                nextCode += 1
                if (nextCode == (1 << codeSize) && codeSize < 12) codeSize += 1
              }
              prev = code
            }
          }
          require(out == w * h, s"gif: decoded $out of ${w * h} pixels")
          return GifImage(w, h, px)
        case other =>
          throw new IllegalArgumentException(f"gif: unexpected block 0x$other%02x at $pos")
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
