package graft.sources

import java.io.ByteArrayOutputStream

/** RIFF/AVI MJPEG container reader/writer — video as a training-data
  * modality: an AVI whose `00dc` chunks are independent JPEG frames
  * (Motion-JPEG), the simplest container shape whose frames are
  * independently decodable — which is exactly what a distributed
  * frame-sampling pipeline needs. Written from the public RIFF/AVI layout
  * (avih/strh/strf headers, `movi` LIST, `idx1` index) with no media
  * library, like the other from-scratch sources
  * ([[Png]]/[[Jpeg]]/[[Flac]]/[[Warc]]/[[Tar]]).
  *
  * The `idx1` index is the scale hook: it maps every frame to an exact
  * `(offset, size)` without scanning `movi`, so a sampler touches ONLY the
  * sampled frames' bytes — the same header-only-index discipline as
  * [[Tar.memberIndex]] and [[Warc.memberOffsets]].
  */
object Avi {

  private def fourcc(s: String): Int =
    (s.charAt(0) & 0xff) | ((s.charAt(1) & 0xff) << 8) |
      ((s.charAt(2) & 0xff) << 16) | ((s.charAt(3) & 0xff) << 24)

  private val RIFF = fourcc("RIFF")
  private val LIST = fourcc("LIST")

  // ------------------------------------------------------------------ write

  private final class W {
    val out = new ByteArrayOutputStream()
    def u32(v: Long): Unit =
      (0 until 4).foreach(i => out.write(((v >>> (8 * i)) & 0xff).toInt))
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >>> 8) & 0xff) }
    def cc(s: String): Unit = s.foreach(c => out.write(c & 0xff))
    def bytes(b: Array[Byte]): Unit = out.write(b)
    def pos: Int = out.size
  }

  /** JPEG frames → one MJPEG AVI byte stream (avih + vids/MJPG strh/strf,
    * word-aligned `00dc` chunks, `idx1` with movi-relative offsets). */
  def write(frames: Seq[Array[Byte]], width: Int, height: Int,
      fps: Int = 25): Array[Byte] = {
    val w = new W
    // movi body first so sizes and index offsets are known
    val movi = new W
    movi.cc("movi")
    val index = frames.map { f =>
      val off = movi.pos // ckid position from the 'movi' fourcc (first = 4), the idx1 norm
      movi.cc("00dc"); movi.u32(f.length.toLong); movi.bytes(f)
      if (f.length % 2 == 1) movi.out.write(0) // RIFF word alignment
      (off.toLong, f.length.toLong)
    }
    val moviBytes = movi.out.toByteArray

    val hdrl = new W
    hdrl.cc("hdrl")
    hdrl.cc("avih"); hdrl.u32(56)
    hdrl.u32(1000000L / fps); hdrl.u32(0); hdrl.u32(0)
    hdrl.u32(0x10)                    // AVIF_HASINDEX
    hdrl.u32(frames.length.toLong); hdrl.u32(0); hdrl.u32(1); hdrl.u32(0)
    hdrl.u32(width.toLong); hdrl.u32(height.toLong)
    (0 until 4).foreach(_ => hdrl.u32(0))
    val strl = new W
    strl.cc("strl")
    strl.cc("strh"); strl.u32(56)
    strl.cc("vids"); strl.cc("MJPG")
    strl.u32(0); strl.u32(0); strl.u32(0)
    strl.u32(1); strl.u32(fps.toLong) // dwScale / dwRate
    strl.u32(0); strl.u32(frames.length.toLong); strl.u32(0)
    strl.u32(0xffffffffL); strl.u32(0)
    strl.u16(0); strl.u16(0); strl.u16(width); strl.u16(height) // rcFrame
    strl.cc("strf"); strl.u32(40)
    strl.u32(40); strl.u32(width.toLong); strl.u32(height.toLong)
    strl.u16(1); strl.u16(24)
    strl.cc("MJPG")
    strl.u32(0); strl.u32(0); strl.u32(0); strl.u32(0); strl.u32(0)
    val strlBytes = strl.out.toByteArray
    hdrl.cc("LIST"); hdrl.u32(strlBytes.length.toLong); hdrl.bytes(strlBytes)
    val hdrlBytes = hdrl.out.toByteArray

    val idx = new W
    index.foreach { case (off, len) =>
      idx.cc("00dc"); idx.u32(0x10) // AVIIF_KEYFRAME: every MJPEG frame
      idx.u32(off); idx.u32(len)
    }
    val idxBytes = idx.out.toByteArray

    val body = new W
    body.cc("AVI ")
    body.cc("LIST"); body.u32(hdrlBytes.length.toLong); body.bytes(hdrlBytes)
    body.cc("LIST"); body.u32(moviBytes.length.toLong); body.bytes(moviBytes)
    body.cc("idx1"); body.u32(idxBytes.length.toLong); body.bytes(idxBytes)
    val bodyBytes = body.out.toByteArray

    w.cc("RIFF"); w.u32(bodyBytes.length.toLong); w.bytes(bodyBytes)
    w.out.toByteArray
  }

  // ------------------------------------------------------------------- read

  private def rdU32(b: Array[Byte], p: Int): Long =
    (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
      ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)

  private def rdCc(b: Array[Byte], p: Int): Int = rdU32(b, p).toInt

  /** Locate the `movi` LIST fourcc position and the `idx1` chunk, walking
    * top-level RIFF chunks. */
  private def topLevel(bytes: Array[Byte]): (Int, Int, Int) = {
    require(bytes.length >= 12 && rdCc(bytes, 0) == RIFF &&
      rdCc(bytes, 8) == fourcc("AVI "), "avi: not a RIFF AVI stream")
    var p = 12
    var moviPos = -1
    var idxPos = -1
    var idxLen = 0
    while (p + 8 <= bytes.length) {
      val id = rdCc(bytes, p)
      val sz = rdU32(bytes, p + 4).toInt
      if (id == LIST && p + 12 <= bytes.length && rdCc(bytes, p + 8) == fourcc("movi"))
        moviPos = p + 8
      else if (id == fourcc("idx1")) { idxPos = p + 8; idxLen = sz }
      p += 8 + sz + (sz % 2)
    }
    require(moviPos >= 0, "avi: no movi LIST")
    (moviPos, idxPos, idxLen)
  }

  /** Every video frame's exact `(dataOffset, size)`, from `idx1` when
    * present (no movi scan — 16 bytes read per frame) with tolerance for
    * both offset conventions in the wild (movi-relative and absolute),
    * else by scanning `movi` chunks. */
  def frameIndex(bytes: Array[Byte]): Seq[(Long, Long)] = {
    val (moviPos, idxPos, idxLen) = topLevel(bytes)
    val dc = fourcc("00dc")
    if (idxPos >= 0) {
      (0 until idxLen / 16).flatMap { i =>
        val e = idxPos + 16 * i
        if (rdCc(bytes, e) != dc) None
        else {
          val off = rdU32(bytes, e + 8)
          val len = rdU32(bytes, e + 12)
          // offset conventions in the wild: from the 'movi' fourcc (the
          // norm, first chunk = 4), from the movi DATA (first = 0), or
          // absolute file offsets
          val cand = Seq(moviPos + off, moviPos + 4 + off, off).find(p =>
            p + 8 <= bytes.length && rdCc(bytes, p.toInt) == dc)
          require(cand.isDefined, s"avi: idx1 entry $i resolves to no 00dc chunk")
          Some((cand.get + 8, len))
        }
      }
    } else {
      val end = moviPos + rdU32(bytes, moviPos - 4).toInt
      val fs = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var p = moviPos + 4
      while (p + 8 <= end) {
        val sz = rdU32(bytes, p + 4).toInt
        if (rdCc(bytes, p) == dc) fs += ((p + 8L, sz.toLong))
        p += 8 + sz + (sz % 2)
      }
      fs.toSeq
    }
  }

  /** Declared (width, height, totalFrames) from the avih header. */
  def header(bytes: Array[Byte]): (Int, Int, Int) = {
    var p = 12
    while (p + 8 <= bytes.length) {
      val id = rdCc(bytes, p)
      val sz = rdU32(bytes, p + 4).toInt
      if (id == LIST && rdCc(bytes, p + 8) == fourcc("hdrl")) {
        val a = p + 12
        require(rdCc(bytes, a) == fourcc("avih"), "avi: hdrl must start with avih")
        return (rdU32(bytes, a + 8 + 32).toInt, rdU32(bytes, a + 8 + 36).toInt,
          rdU32(bytes, a + 8 + 16).toInt)
      }
      p += 8 + sz + (sz % 2)
    }
    throw new IllegalArgumentException("avi: no hdrl LIST")
  }

  /** All frames, materialized. */
  def readFrames(bytes: Array[Byte]): Seq[Array[Byte]] =
    frameIndex(bytes).map { case (o, n) =>
      java.util.Arrays.copyOfRange(bytes, o.toInt, (o + n).toInt)
    }
}
