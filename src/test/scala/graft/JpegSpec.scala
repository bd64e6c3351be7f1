package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Jpeg

/** From-spec JPEG codec gates. The DC exactness contract is the one the
  * q77 relational oracle rides on; pixel fidelity bounds the lossy AC path;
  * the stress image forces the ZRL/EOB/byte-stuffing corners of the
  * entropy coder.
  */
class JpegSpec extends AnyFunSuite {

  private def mkGray(w: Int, h: Int)(f: (Int, Int) => Int): Array[Byte] =
    Array.tabulate(w * h)(i => (f(i / w, i % w) & 0xff).toByte)

  private def rng(seed: Long): () => Int = {
    var s = seed
    () => { s = s * 6364136223846793005L + 1442695040888963407L; ((s >>> 33) % 256).toInt }
  }

  test("DC block means survive the full bitstream round trip exactly") {
    val w = 32; val h = 24
    val r = rng(7)
    val gray = mkGray(w, h)((_, _) => r())
    val img = Jpeg.decode(Jpeg.encodeGray(w, h, gray))
    assert(img.width == w && img.height == h && img.blocksW == 4 && img.blocksH == 3)
    for (by <- 0 until h / 8; bx <- 0 until w / 8) {
      var s = 0L
      for (y <- 0 until 8; x <- 0 until 8) s += gray((by * 8 + y) * w + bx * 8 + x) & 0xff
      // mean of the reconstruction = 128 + q0*floor(((S-8192)/8)/q0 + 0.5)/8,
      // dyadic at q0 = 16: 128 + 2*DCq — the oracle's formula
      val dcq = math.floor((s - 8192) / 128.0 + 0.5)
      assert(img.dcMean(by, bx) == 128.0 + 2.0 * dcq,
        s"block ($by,$bx): got ${img.dcMean(by, bx)}, want ${128.0 + 2.0 * dcq}")
    }
  }

  test("near-lossless quant table reconstructs pixels within the quant error bound") {
    val w = 16; val h = 16
    // smooth ramp + mild texture; all-ones quant → error only from
    // coefficient rounding, bounded well under 4 gray levels
    val gray = mkGray(w, h)((y, x) => 40 + 6 * y + 5 * x + ((x * y) % 3))
    val ones = Array.fill(64)(1)
    val img = Jpeg.decode(Jpeg.encodeGray(w, h, gray, ones))
    val maxErr = (0 until w * h).map(i => math.abs((img.pixels(i) & 0xff) - (gray(i) & 0xff))).max
    assert(maxErr <= 4, s"max pixel error $maxErr with unit quant table")
  }

  test("annex-K table keeps smooth images visually close (bounded mean error)") {
    val w = 32; val h = 32
    val gray = mkGray(w, h)((y, x) => 60 + 3 * y + 2 * x)
    val img = Jpeg.decode(Jpeg.encodeGray(w, h, gray))
    val meanErr = (0 until w * h).map(i => math.abs((img.pixels(i) & 0xff) - (gray(i) & 0xff))).sum.toDouble / (w * h)
    assert(meanErr <= 8.0, s"mean pixel error $meanErr too large for a smooth ramp")
  }

  test("entropy coder corners: ZRL runs, EOB-only blocks, byte stuffing") {
    val w = 24; val h = 8
    // block 0: flat (DC + immediate EOB); block 1: single hot pixel (long
    // zero runs → ZRL); block 2: alternating extremes (dense ACs, more
    // 0xFF-prone bytes)
    val gray = mkGray(w, h) { (y, x) =>
      if (x < 8) 128
      else if (x < 16) { if (x == 12 && y == 4) 255 else 0 }
      else { if ((x + y) % 2 == 0) 255 else 0 }
    }
    val enc = Jpeg.encodeGray(w, h, gray)
    // every 0xFF inside the entropy segment must be stuffed or a marker
    val img = Jpeg.decode(enc)
    assert(img.blocksW == 3 && img.blocksH == 1)
    var s0 = 0L
    for (y <- 0 until 8; x <- 0 until 8) s0 += gray(y * w + x) & 0xff
    assert(img.dcMean(0, 0) == 128.0 + 2.0 * math.floor((s0 - 8192) / 128.0 + 0.5))
    // flat block reconstructs flat
    for (y <- 0 until 8; x <- 0 until 8)
      assert((img.pixels(y * w + x) & 0xff) == 128)
  }

  test("random-noise images round-trip DC exactly across many blocks") {
    val w = 16
    for (seed <- 1 to 5) {
      val h = 8 * (1 + seed % 3)
      val r = rng(seed * 1000003L)
      val gray = mkGray(w, h)((_, _) => r())
      val img = Jpeg.decode(Jpeg.encodeGray(w, h, gray))
      for (by <- 0 until h / 8; bx <- 0 until w / 8) {
        var s = 0L
        for (y <- 0 until 8; x <- 0 until 8) s += gray((by * 8 + y) * w + bx * 8 + x) & 0xff
        assert(img.dcMean(by, bx) == 128.0 + 2.0 * math.floor((s - 8192) / 128.0 + 0.5))
      }
    }
  }

  test("4:2:0 color: Y-plane DC means survive the interleaved round trip exactly") {
    val w = 32; val h = 32
    val r = rng(42)
    val rgb = Array.tabulate(3 * w * h)(_ => (r() & 0xff).toByte)
    val enc = Jpeg.encodeRgb420(w, h, rgb)
    val img = Jpeg.decode(enc)
    assert(img.isColor && img.chromaW == 16 && img.chromaH == 16)
    assert(img.width == w && img.height == h)
    // recompute the encoder's Y plane and check every 8x8 block's DC
    // invariant (mean = 128 + 2*DCq at the Annex-K q0=16), through the
    // full 6-blocks-per-MCU interleave and 3 DC predictor chains
    for (by <- 0 until h / 8; bx <- 0 until w / 8) {
      var s = 0L
      for (y <- 0 until 8; x <- 0 until 8) {
        val i = (by * 8 + y) * w + bx * 8 + x
        val (rr, gg, bb) = (rgb(3 * i) & 0xff, rgb(3 * i + 1) & 0xff, rgb(3 * i + 2) & 0xff)
        s += math.max(0, math.min(255,
          math.round(0.299 * rr + 0.587 * gg + 0.114 * bb).toInt))
      }
      val dcq = math.floor((s - 8192) / 128.0 + 0.5)
      assert(img.dcMean(by, bx) == 128.0 + 2.0 * dcq, s"Y block ($by,$bx)")
    }
  }

  test("4:2:0 color: smooth chroma reconstructs within the quant error bound") {
    val w = 16; val h = 16
    // constant color: chroma blocks are flat → error only from DC rounding
    val rgb = Array.tabulate(3 * w * h) { i =>
      (i % 3 match { case 0 => 200; case 1 => 80; case _ => 40 }).toByte
    }
    val img = Jpeg.decode(Jpeg.encodeRgb420(w, h, rgb))
    // expected chroma of (200,80,40): Cb = 128 - .168736*200 - .331264*80 + .5*40
    val cbE = math.round(128.0 - 0.168736 * 200 - 0.331264 * 80 + 0.5 * 40).toInt
    val crE = math.round(128.0 + 0.5 * 200 - 0.418688 * 80 - 0.081312 * 40).toInt
    val cbGot = img.cb.map(_ & 0xff)
    val crGot = img.cr.map(_ & 0xff)
    assert(cbGot.forall(v => math.abs(v - cbE) <= 9), // q0=17 → DC step ~2.1, flat ACs
      s"cb ${cbGot.min}..${cbGot.max} vs $cbE")
    assert(crGot.forall(v => math.abs(v - crE) <= 9),
      s"cr ${crGot.min}..${crGot.max} vs $crE")
    // luma of a constant image is constant: Y = .299*200+.587*80+.114*40
    val yE = math.round(0.299 * 200 + 0.587 * 80 + 0.114 * 40).toInt
    assert(img.pixels.map(_ & 0xff).forall(v => math.abs(v - yE) <= 3))
  }

  test("decoder parses tables from the stream and rejects malformed input") {
    val gray = mkGray(8, 8)((y, x) => 16 * y + x)
    val enc = Jpeg.encodeGray(8, 8, gray)
    assert((enc(0) & 0xff) == 0xff && (enc(1) & 0xff) == 0xd8, "SOI")
    assert((enc(enc.length - 2) & 0xff) == 0xff && (enc.last & 0xff) == 0xd9, "EOI")
    intercept[IllegalArgumentException](Jpeg.decode(Array[Byte](1, 2, 3, 4)))
    intercept[IllegalArgumentException](Jpeg.decode(enc.take(20))) // truncated mid-tables
    // progressive SOF2 must be rejected, not mis-decoded
    val prog = enc.clone()
    val sof = prog.indices.find(i => (prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0).get
    prog(sof + 1) = 0xc2.toByte
    intercept[IllegalArgumentException](Jpeg.decode(prog))
  }
}
