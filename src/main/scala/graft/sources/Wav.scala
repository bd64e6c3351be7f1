package graft.sources

import java.io.ByteArrayOutputStream

/** RIFF/WAVE PCM reader/writer — the uncompressed audio container between
  * raw PCM byte columns ([[graft.operators.Multimodal.pcmWindowRms]]'s
  * framing) and the FLAC codec ([[Flac]]): 16-bit little-endian PCM in a
  * `fmt `+`data` RIFF layout, written from the public spec with no audio
  * library. The reader skips unknown chunks (LIST/INFO/fact…) like any
  * tolerant consumer.
  */
object Wav {

  final case class Pcm(sampleRate: Int, channels: Int, samples: Array[Int])

  private def u32(b: Array[Byte], p: Int): Long =
    (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
      ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)

  private def u16(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)

  private def cc(b: Array[Byte], p: Int): String =
    new String(b, p, 4, "US-ASCII")

  /** int16 samples → one `.wav` byte stream (PCM fmt + data). */
  def write(pcm: Pcm): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def w32(v: Long): Unit =
      (0 until 4).foreach(i => out.write(((v >>> (8 * i)) & 0xff).toInt))
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >>> 8) & 0xff) }
    def wcc(s: String): Unit = s.foreach(c => out.write(c & 0xff))
    val dataLen = 2 * pcm.samples.length
    wcc("RIFF"); w32(4 + 24 + 8 + dataLen.toLong); wcc("WAVE")
    wcc("fmt "); w32(16)
    w16(1)                                   // PCM
    w16(pcm.channels)
    w32(pcm.sampleRate.toLong)
    w32(pcm.sampleRate.toLong * pcm.channels * 2) // byte rate
    w16(pcm.channels * 2)                    // block align
    w16(16)                                  // bits per sample
    wcc("data"); w32(dataLen.toLong)
    pcm.samples.foreach(s => w16(s & 0xffff))
    out.toByteArray
  }

  /** Parse a PCM WAVE stream; unknown chunks are skipped, `fmt ` must
    * declare integer PCM 16-bit. */
  def read(bytes: Array[Byte]): Pcm = {
    require(bytes.length >= 12 && cc(bytes, 0) == "RIFF" && cc(bytes, 8) == "WAVE",
      "wav: not a RIFF WAVE stream")
    var p = 12
    var rate = -1
    var channels = -1
    var samples: Array[Int] = null
    while (p + 8 <= bytes.length) {
      val id = cc(bytes, p)
      val sz = u32(bytes, p + 4).toInt
      id match {
        case "fmt " =>
          val fmt = u16(bytes, p + 8)
          require(fmt == 1, s"wav: only integer PCM supported, got format $fmt")
          channels = u16(bytes, p + 10)
          rate = u32(bytes, p + 12).toInt
          val bits = u16(bytes, p + 22)
          require(bits == 16, s"wav: only 16-bit PCM supported, got $bits")
        case "data" =>
          require(rate > 0, "wav: data chunk before fmt")
          val n = sz / 2
          samples = Array.tabulate(n) { i =>
            val v = u16(bytes, p + 8 + 2 * i)
            if (v >= 0x8000) v - 0x10000 else v // sign-extend int16
          }
        case _ => () // LIST/fact/cue… — skip
      }
      p += 8 + sz + (sz % 2)
    }
    require(samples != null, "wav: no data chunk")
    Pcm(rate, channels, samples)
  }
}
