package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Wav
import graft.operators.Audio

/** WAV + resampling gates: cross-check against Python's stdlib `wave`
  * module in BOTH directions (a second RIFF/WAVE implementation), unknown-
  * chunk tolerance, sign handling, and the linear-resampler's closed-form
  * cases.
  */
class WavSpec extends AnyFunSuite {

  private def pythonOk: Boolean = {
    import scala.sys.process._
    scala.util.Try(Seq("python3", "-c", "import wave").! == 0).getOrElse(false)
  }

  test("python wave reads our bytes; we read python wave's bytes") {
    assume(pythonOk, "python3 unavailable")
    import scala.sys.process._
    val samples = Array(0, 1, -1, 32767, -32768, 12345, -12345)
    val ours = java.nio.file.Files.createTempFile("graft_wav", ".wav")
    java.nio.file.Files.write(ours, Wav.write(Wav.Pcm(8000, 1, samples)))
    val theirs = java.nio.file.Files.createTempFile("py_wav", ".wav")
    val py =
      s"""import wave, struct
         |w = wave.open('$ours')
         |assert (w.getframerate(), w.getnchannels(), w.getsampwidth()) == (8000, 1, 2)
         |vals = struct.unpack('<%dh' % w.getnframes(), w.readframes(w.getnframes()))
         |assert list(vals) == [0, 1, -1, 32767, -32768, 12345, -12345], vals
         |o = wave.open('$theirs', 'w')
         |o.setnchannels(1); o.setsampwidth(2); o.setframerate(44100)
         |o.writeframes(struct.pack('<5h', 7, -7, 100, -30000, 30000))
         |o.close()
         |""".stripMargin
    assert(Seq("python3", "-c", py).! == 0, "python wave rejected graft's output")
    val pcm = Wav.read(java.nio.file.Files.readAllBytes(theirs))
    assert(pcm.sampleRate == 44100 && pcm.channels == 1)
    assert(pcm.samples.toSeq == Seq(7, -7, 100, -30000, 30000))
  }

  test("reader skips unknown chunks and rejects non-PCM") {
    val base = Wav.write(Wav.Pcm(16000, 1, Array(5, 6, 7)))
    // splice a LIST chunk between fmt and data
    val listChunk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes("US-ASCII")
    val spliced = base.take(36) ++ listChunk ++ base.drop(36)
    // patch RIFF size
    val total = spliced.length - 8
    (0 until 4).foreach(i => spliced(4 + i) = ((total >> (8 * i)) & 0xff).toByte)
    val pcm = Wav.read(spliced)
    assert(pcm.samples.toSeq == Seq(5, 6, 7) && pcm.sampleRate == 16000)
    val bad = base.clone()
    bad(20) = 3 // fmt code 3 = IEEE float
    intercept[IllegalArgumentException](Wav.read(bad))
  }

  test("resampler closed forms: identity, doubling midpoints, 4/3 quarters, edges") {
    assert(Audio.resample(Array(10, 20, 30), 1, 1).toSeq == Seq(10, 20, 30))
    // 2× upsample inserts exact midpoints (half-up rounding on .5)
    assert(Audio.resample(Array(0, 10), 2, 1).toSeq == Seq(0, 5, 10))
    assert(Audio.resample(Array(0, 1), 2, 1).toSeq == Seq(0, 1, 1), "0.5 rounds half-up")
    // 4/3: positions 0, 3/4, 3/2, 9/4, 3 over samples 0,4,8,12
    assert(Audio.resample(Array(0, 4, 8, 12), 4, 3).toSeq == Seq(0, 3, 6, 9, 12))
    // downsample 1/2 keeps every other sample exactly
    assert(Audio.resample(Array(1, 2, 3, 4, 5), 1, 2).toSeq == Seq(1, 3, 5))
    assert(Audio.resample(Array.emptyIntArray, 4, 3).isEmpty)
    assert(Audio.resample(Array(42), 4, 3).toSeq == Seq(42), "singleton clamps")
    // negative samples interpolate identically
    assert(Audio.resample(Array(-8, 8), 4, 1).toSeq == Seq(-8, -4, 0, 4, 8))
  }

  test("stereo resample keeps channels independent") {
    // interleaved L/R: L constant, R a ramp. Interpolating across the raw
    // interleaved stream would drag L toward R values; per-channel
    // resampling must keep L exactly flat and R a clean ramp.
    val frames = 16
    val inter = Array.tabulate(frames * 2) { k =>
      if (k % 2 == 0) 1000 else (k / 2) * 8
    }
    val up = Audio.resampleInterleaved(inter, 2, 2, 1)
    assert(up.length % 2 == 0)
    val (l, r) = (up.indices.collect { case i if i % 2 == 0 => up(i) },
      up.indices.collect { case i if i % 2 == 1 => up(i) })
    assert(l.forall(_ == 1000), s"L channel polluted: ${l.take(8)}")
    assert(r.toSeq == Audio.resample(Array.tabulate(frames)(_ * 8), 2, 1).toSeq)
    // per-channel output frame count matches the mono resampler's
    assert(up.length == 2 * Audio.resample(Array.tabulate(frames)(_ * 8), 2, 1).length)
    // mono path unchanged
    assert(Audio.resampleInterleaved(Array(0, 10), 1, 2, 1).toSeq == Seq(0, 5, 10))
    // trailing partial frame dropped, not misaligned
    val odd = Audio.resampleInterleaved(Array(1, 2, 3, 4, 5), 2, 1, 1)
    assert(odd.toSeq == Seq(1, 2, 3, 4))
  }

  test("wav roundtrip through resample keeps rate bookkeeping") {
    val in = Wav.Pcm(4000, 1, Array.tabulate(100)(i => (i * 131) % 2000 - 1000))
    val out = Wav.read(Wav.write(in))
    assert(out.samples.sameElements(in.samples) && out.sampleRate == 4000)
    val res = Audio.resample(in.samples, 4, 3)
    assert(res.length == (99 * 4) / 3 + 1)
  }
}
