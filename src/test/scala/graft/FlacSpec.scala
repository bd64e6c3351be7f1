package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Flac

/** From-spec FLAC subset gates: losslessness across every subframe type,
  * frame-boundary shapes, and the corrupted-stream rejections the CRCs
  * exist for.
  */
class FlacSpec extends AnyFunSuite {

  private def rt(samples: Array[Int], blockSize: Int = 256): Array[Int] =
    Flac.decode(Flac.encode(samples, blockSize)).samples

  private def lcg(seed: Long): () => Long = {
    var s = seed
    () => { s = s * 6364136223846793005L + 1442695040888963407L; s >>> 33 }
  }

  test("random 16-bit noise round-trips exactly (verbatim-ish frames)") {
    val r = lcg(1)
    val s = Array.fill(1000)((r() % 65536 - 32768).toInt)
    assert(rt(s).sameElements(s))
  }

  test("smooth ramps round-trip exactly (fixed-predictor frames)") {
    val s = Array.tabulate(2000)(i => (i % 3000) - 1000)
    val out = rt(s)
    assert(out.sameElements(s))
    // a linear ramp's order-2 residuals are ~0: the stream must be much
    // smaller than raw — proves a predictor was actually chosen
    assert(Flac.encode(s, 256).length < 2 * s.length / 2)
  }

  test("constant stretches round-trip exactly (constant frames)") {
    val s = Array.fill(512)(1234)
    assert(rt(s).sameElements(s))
    val enc = Flac.encode(s, 256)
    assert(enc.length < 100, s"constant frames should be tiny, got ${enc.length} bytes")
  }

  test("mixed content, partial last frame, many block sizes") {
    val r = lcg(7)
    for (bs <- Seq(16, 64, 256, 4096); n <- Seq(1, 15, 16, 255, 257, 1000)) {
      val s = Array.tabulate(n) { i =>
        if (i % 100 < 50) i % 32768 else (r() % 65536 - 32768).toInt
      }
      assert(rt(s, bs).sameElements(s), s"bs=$bs n=$n")
    }
  }

  test("frame structure is preserved (frames sized blockSize, last partial)") {
    val s = Array.tabulate(600)(i => i)
    val audio = Flac.decode(Flac.encode(s, 256))
    assert(audio.frames.map(_.length).toSeq == Seq(256, 256, 88))
    assert(audio.sampleRate == 8000)
  }

  test("empty input yields an empty, valid stream") {
    val audio = Flac.decode(Flac.encode(Array.emptyIntArray))
    assert(audio.frames.isEmpty)
  }

  test("corruption is caught by CRCs and structure checks") {
    val s = Array.tabulate(300)(i => (i * 37) % 4096)
    val enc = Flac.encode(s, 256)
    intercept[IllegalArgumentException](Flac.decode(enc.take(30))) // truncated
    intercept[IllegalArgumentException](Flac.decode("nope".getBytes ++ enc.drop(4)))
    // flip a bit inside the first frame's payload: CRC-16 must catch it
    val bad = enc.clone()
    bad(60) = (bad(60) ^ 0x10).toByte
    intercept[IllegalArgumentException](Flac.decode(bad))
  }
}
