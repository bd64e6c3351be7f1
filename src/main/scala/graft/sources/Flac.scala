package graft.sources

import scala.collection.mutable.ArrayBuffer

/** FLAC codec (subset) for 16-bit mono audio, written from the public FLAC
  * format specification with no codec library — the audio sibling of
  * [[Jpeg]]/[[Png]]. LOSSLESS: decode(encode(x)) == x exactly, which is what
  * lets a relational oracle check the whole bitstream with no tolerance.
  *
  * Encoder: fLaC magic + STREAMINFO, then one frame per `blockSize` samples.
  * Each frame carries a fixed-blocksize header (UTF-8-coded frame number,
  * explicit 16-bit blocksize, CRC-8), one subframe — CONSTANT, VERBATIM, or
  * FIXED order 0–4 (residuals are exactly the k-th finite differences) with
  * Rice-coded residuals (4-bit parameter, escape to raw) — byte-alignment
  * padding, and a CRC-16 over the whole frame.
  *
  * Decoder: parses STREAMINFO, skips other metadata blocks, then decodes
  * frames until EOF, verifying sync codes and both CRCs, reconstructing
  * fixed predictors by reverse difference integration.
  *
  * Reference behavior mirrored: none — xsarsea has no audio surface; this is
  * the multimodal training-data path (codec-compressed audio columns).
  */
object Flac {

  final case class FlacAudio(sampleRate: Int, frames: Array[Array[Int]]) {
    def samples: Array[Int] = frames.flatten
  }

  // CRC-8, poly x^8+x^2+x+1 (0x07), init 0 — frame header checksum
  private val Crc8T: Array[Int] = Array.tabulate(256) { i =>
    var c = i
    var k = 0
    while (k < 8) { c = if ((c & 0x80) != 0) (c << 1) ^ 0x07 else c << 1; k += 1 }
    c & 0xff
  }
  private def crc8(bytes: scala.collection.IndexedSeq[Byte], from: Int, until: Int): Int = {
    var c = 0
    var i = from
    while (i < until) { c = Crc8T((c ^ bytes(i)) & 0xff); i += 1 }
    c
  }

  // CRC-16, poly x^16+x^15+x^2+1 (0x8005), init 0 — whole-frame checksum
  private val Crc16T: Array[Int] = Array.tabulate(256) { i =>
    var c = i << 8
    var k = 0
    while (k < 8) { c = if ((c & 0x8000) != 0) (c << 1) ^ 0x8005 else c << 1; k += 1 }
    c & 0xffff
  }
  private def crc16(bytes: scala.collection.IndexedSeq[Byte], from: Int, until: Int): Int = {
    var c = 0
    var i = from
    while (i < until) { c = ((c << 8) ^ Crc16T(((c >> 8) ^ (bytes(i) & 0xff)) & 0xff)) & 0xffff; i += 1 }
    c
  }

  private final class BitWriter(val out: ArrayBuffer[Byte]) {
    private var acc = 0L
    private var n = 0
    def put(v: Long, bits: Int): Unit = {
      acc = (acc << bits) | (v & ((1L << bits) - 1))
      n += bits
      while (n >= 8) { out += ((acc >>> (n - 8)) & 0xff).toByte; n -= 8 }
    }
    def alignZero(): Unit = if (n > 0) put(0, 8 - n)
  }

  private final class BitReader(data: Array[Byte]) {
    var pos = 0
    private var acc = 0
    private var n = 0
    def eof: Boolean = n == 0 && pos >= data.length
    def bit(): Int = {
      if (n == 0) {
        require(pos < data.length, "flac: truncated stream")
        acc = data(pos) & 0xff; pos += 1; n = 8
      }
      n -= 1
      (acc >> n) & 1
    }
    def bits(b: Int): Long = {
      var v = 0L
      var i = 0
      while (i < b) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def sbits(b: Int): Int = {
      val v = bits(b)
      if ((v & (1L << (b - 1))) != 0) (v - (1L << b)).toInt else v.toInt
    }
    def unary(): Int = {
      var q = 0
      while (bit() == 0) q += 1
      q
    }
    def align(): Unit = { n = 0 }
  }

  /** UTF-8-style coded number (frame numbering), values up to 31 bits. */
  private def putUtf8Num(bw: BitWriter, v: Long): Unit = {
    if (v < 0x80) bw.put(v, 8)
    else if (v < 0x800) { bw.put(0xc0 | (v >> 6), 8); bw.put(0x80 | (v & 0x3f), 8) }
    else if (v < 0x10000) {
      bw.put(0xe0 | (v >> 12), 8); bw.put(0x80 | ((v >> 6) & 0x3f), 8); bw.put(0x80 | (v & 0x3f), 8)
    } else {
      bw.put(0xf0 | (v >> 18), 8); bw.put(0x80 | ((v >> 12) & 0x3f), 8)
      bw.put(0x80 | ((v >> 6) & 0x3f), 8); bw.put(0x80 | (v & 0x3f), 8)
    }
  }

  private def readUtf8Num(br: BitReader): Long = {
    val b0 = br.bits(8).toInt
    val extra =
      if ((b0 & 0x80) == 0) return b0.toLong
      else if ((b0 & 0xe0) == 0xc0) 1
      else if ((b0 & 0xf0) == 0xe0) 2
      else if ((b0 & 0xf8) == 0xf0) 3
      else throw new IllegalArgumentException("flac: bad UTF-8 frame number")
    var v = (b0 & (0x3f >> extra)).toLong
    var i = 0
    while (i < extra) {
      val b = br.bits(8).toInt
      require((b & 0xc0) == 0x80, "flac: bad UTF-8 continuation")
      v = (v << 6) | (b & 0x3f)
      i += 1
    }
    v
  }

  /** Rice zigzag fold: signed residual → non-negative (spec 9.2.7.1). */
  @inline private def fold(e: Int): Long = ((e.toLong << 1) ^ (e.toLong >> 63))
  @inline private def unfold(u: Long): Int = (((u >>> 1) ^ -(u & 1))).toInt

  /** The spec's rice-parameter fit: smallest r with n·2^r ≥ Σ|folded|. */
  private def riceParam(sum: Long, n: Int): Int = {
    var r = 0
    while (r < 14 && (n.toLong << r) < sum) r += 1
    r
  }

  // ---------------------------------------------------------------- encode

  /** Encode 16-bit mono samples. `blockSize` samples per frame (last frame
    * shorter); picks per-frame CONSTANT / best FIXED order 0–4 / VERBATIM
    * by estimated size.
    */
  def encode(samples: Array[Int], blockSize: Int = 256, sampleRate: Int = 8000): Array[Byte] = {
    require(blockSize >= 16 && blockSize <= 65535, "flac: blockSize out of range")
    require(samples.forall(s => s >= -32768 && s <= 32767), "flac: samples must be 16-bit")
    val out = ArrayBuffer.empty[Byte]
    val bw = new BitWriter(out)
    // magic + STREAMINFO (last-metadata=1, type=0, length=34)
    "fLaC".foreach(c => bw.put(c.toLong, 8))
    bw.put(1, 1); bw.put(0, 7); bw.put(34, 24)
    val lastBlock = if (samples.isEmpty) blockSize else ((samples.length - 1) % blockSize) + 1
    bw.put(math.min(blockSize, if (samples.isEmpty) blockSize else lastBlock), 16) // min blocksize
    bw.put(blockSize, 16) // max blocksize
    bw.put(0, 24); bw.put(0, 24) // min/max framesize unknown
    bw.put(sampleRate, 20)
    bw.put(0, 3) // channels - 1 (mono)
    bw.put(15, 5) // bits per sample - 1 (16)
    bw.put(samples.length.toLong, 36)
    (0 until 16).foreach(_ => bw.put(0, 8)) // MD5 unset (spec: 0 = unknown)

    var frameNo = 0L
    var off = 0
    while (off < samples.length) {
      val n = math.min(blockSize, samples.length - off)
      encodeFrame(bw, out, samples, off, n, frameNo)
      frameNo += 1
      off += n
    }
    out.toArray
  }

  private def encodeFrame(bw: BitWriter, out: ArrayBuffer[Byte], s: Array[Int],
      off: Int, n: Int, frameNo: Long): Unit = {
    val headStart = out.length
    bw.put(0x3ffe, 14) // sync
    bw.put(0, 1) // reserved
    bw.put(0, 1) // fixed blocksize stream
    bw.put(0x7, 4) // blocksize: 16-bit value at header end
    bw.put(0, 4) // sample rate: from STREAMINFO
    bw.put(0, 4) // channel assignment: mono
    bw.put(4, 3) // sample size: 16 bits (0b100)
    bw.put(0, 1) // reserved
    putUtf8Num(bw, frameNo)
    bw.put(n - 1, 16)
    bw.put(crc8(out, headStart, out.length), 8)

    // choose subframe: constant / best fixed order / verbatim
    var allEqual = true
    var i = 1
    while (allEqual && i < n) { allEqual = s(off + i) == s(off); i += 1 }
    if (allEqual) {
      bw.put(0, 1); bw.put(0, 6); bw.put(0, 1) // CONSTANT
      bw.put(s(off).toLong, 16)
    } else {
      // residuals of FIXED order k are the k-th finite differences
      val diffs = new Array[Array[Long]](5)
      diffs(0) = Array.tabulate(n)(j => s(off + j).toLong)
      for (k <- 1 to 4)
        diffs(k) = if (n > k) Array.tabulate(n - k)(j => diffs(k - 1)(j + 1) - diffs(k - 1)(j))
          else Array.emptyLongArray
      val maxOrder = math.min(4, n - 1)
      val costs = (0 to maxOrder).map { k =>
        val sum = diffs(k).iterator.map(e => math.abs(e)).sum
        val r = riceParam(diffs(k).iterator.map(e => fold32(e)).sum, math.max(diffs(k).length, 1))
        val resBits = diffs(k).iterator.map(u => (fold32(u) >>> r) + 1 + r).sum
        (k, 16L * k + 6 + resBits, r)
      }
      val (order, cost, r0) = costs.minBy(_._2)
      val verbatimCost = 16L * n
      if (cost >= verbatimCost) {
        bw.put(0, 1); bw.put(1, 6); bw.put(0, 1) // VERBATIM
        var j = 0
        while (j < n) { bw.put(s(off + j).toLong, 16); j += 1 }
      } else {
        bw.put(0, 1); bw.put(8 | order, 6); bw.put(0, 1) // FIXED order
        var j = 0
        while (j < order) { bw.put(s(off + j).toLong, 16); j += 1 }
        bw.put(0, 2) // residual method: rice, 4-bit params
        bw.put(0, 4) // partition order 0
        val res = diffs(order)
        // escape to raw if a residual won't rice-code efficiently (|u| huge)
        val maxU = if (res.isEmpty) 0L else res.iterator.map(e => fold32(e)).max
        if (r0 >= 14 && maxU > (1L << 30)) {
          bw.put(0xf, 4) // escape
          val bitsNeeded = 64 - java.lang.Long.numberOfLeadingZeros(math.max(1, maxU)) + 1
          bw.put(bitsNeeded, 5)
          res.foreach(e => bw.put(e, bitsNeeded.toInt))
        } else {
          bw.put(r0, 4)
          res.foreach { e =>
            val u = fold32(e)
            val q = u >>> r0
            var z = 0L
            while (z < q) { bw.put(0, 1); z += 1 }
            bw.put(1, 1)
            if (r0 > 0) bw.put(u, r0)
          }
        }
      }
    }
    bw.alignZero()
    bw.put(crc16(out, headStart, out.length), 16)
  }

  @inline private def fold32(e: Long): Long = (e << 1) ^ (e >> 63)

  // ---------------------------------------------------------------- decode

  def decode(bytes: Array[Byte]): FlacAudio = {
    require(bytes.length >= 42 && bytes(0) == 'f' && bytes(1) == 'L' &&
      bytes(2) == 'a' && bytes(3) == 'C', "flac: missing fLaC magic")
    val br = new BitReader(bytes)
    br.pos = 4
    // metadata blocks
    var sampleRate = 0
    var bps = 0
    var totalSamples = 0L
    var last = false
    while (!last) {
      last = br.bit() == 1
      val btype = br.bits(7).toInt
      val len = br.bits(24).toInt
      if (btype == 0) { // STREAMINFO
        br.bits(16); br.bits(16); br.bits(24); br.bits(24)
        sampleRate = br.bits(20).toInt
        val channels = br.bits(3).toInt + 1
        require(channels == 1, "flac: mono subset only")
        bps = br.bits(5).toInt + 1
        require(bps == 16, "flac: 16-bit subset only")
        totalSamples = br.bits(36)
        (0 until 16).foreach(_ => br.bits(8))
      } else (0 until len).foreach(_ => br.bits(8))
    }
    require(sampleRate > 0, "flac: missing STREAMINFO")

    val frames = ArrayBuffer.empty[Array[Int]]
    var decoded = 0L
    while (decoded < totalSamples) {
      val headStart = br.pos
      require(br.bits(14) == 0x3ffe, "flac: lost frame sync")
      require(br.bit() == 0, "flac: reserved bit set")
      br.bit() // blocking strategy
      val bsCode = br.bits(4).toInt
      val srCode = br.bits(4).toInt
      val chan = br.bits(4).toInt
      require(chan == 0, "flac: mono subset only")
      val ssCode = br.bits(3).toInt
      require(ssCode == 4, "flac: 16-bit subset only")
      br.bit() // reserved
      readUtf8Num(br)
      val blockLen = bsCode match {
        case 1 => 192
        case c if c >= 2 && c <= 5 => 576 << (c - 2)
        case 6 => br.bits(8).toInt + 1
        case 7 => br.bits(16).toInt + 1
        case c if c >= 8 => 256 << (c - 8)
        case _ => throw new IllegalArgumentException("flac: reserved blocksize code")
      }
      if (srCode == 12) br.bits(8)
      else if (srCode == 13 || srCode == 14) br.bits(16)
      val hcrc = br.bits(8).toInt
      require(hcrc == crc8(bytes, headStart, br.pos - 1), "flac: header CRC mismatch")

      // subframe
      require(br.bit() == 0, "flac: subframe pad bit set")
      val stype = br.bits(6).toInt
      require(br.bit() == 0, "flac: wasted bits unsupported in subset")
      val frame = new Array[Int](blockLen)
      if (stype == 0) { // CONSTANT
        val v = br.sbits(16)
        java.util.Arrays.fill(frame, v)
      } else if (stype == 1) { // VERBATIM
        var j = 0
        while (j < blockLen) { frame(j) = br.sbits(16); j += 1 }
      } else if ((stype & 0x38) == 8) { // FIXED order 0..4
        val order = stype & 0x07
        require(order <= 4, "flac: bad fixed order")
        var j = 0
        while (j < order) { frame(j) = br.sbits(16); j += 1 }
        val method = br.bits(2).toInt
        require(method == 0, "flac: only 4-bit rice in subset")
        val partOrder = br.bits(4).toInt
        val nParts = 1 << partOrder
        var idx = order
        var p = 0
        while (p < nParts) {
          val cnt = if (partOrder == 0) blockLen - order
            else if (p == 0) (blockLen >> partOrder) - order
            else blockLen >> partOrder
          val rp = br.bits(4).toInt
          if (rp == 0xf) {
            val raw = br.bits(5).toInt
            var c = 0
            while (c < cnt) { frame(idx) = reconstruct(frame, idx, order, br.sbitsL(raw)); idx += 1; c += 1 }
          } else {
            var c = 0
            while (c < cnt) {
              val q = br.unary().toLong
              val u = (q << rp) | (if (rp > 0) br.bits(rp) else 0L)
              frame(idx) = reconstruct(frame, idx, order, unfold(u).toLong)
              idx += 1; c += 1
            }
          }
          p += 1
        }
      } else throw new IllegalArgumentException(s"flac: unsupported subframe type $stype (LPC not in subset)")

      br.align()
      val fcrc = br.bits(16).toInt
      require(fcrc == crc16(bytes, headStart, br.pos - 2), "flac: frame CRC mismatch")
      frames += frame
      decoded += blockLen
    }
    FlacAudio(sampleRate, frames.toArray)
  }

  /** Undo the fixed predictor: s[i] = residual + Σ binom-weighted history. */
  @inline private def reconstruct(f: Array[Int], i: Int, order: Int, e: Long): Int = {
    val v = order match {
      case 0 => e
      case 1 => e + f(i - 1)
      case 2 => e + 2L * f(i - 1) - f(i - 2)
      case 3 => e + 3L * f(i - 1) - 3L * f(i - 2) + f(i - 3)
      case _ => e + 4L * f(i - 1) - 6L * f(i - 2) + 4L * f(i - 3) - f(i - 4)
    }
    v.toInt
  }

  private implicit final class RdOps(private val br: BitReader) {
    def sbitsL(b: Int): Long = {
      if (b == 0) return 0L
      val v = br.bits(b)
      if ((v & (1L << (b - 1))) != 0) v - (1L << b) else v
    }
  }
}
