package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Gif

/** GIF codec gates: the independently-packed Python fixture (color
  * palette, 3-bit codes, degenerate clear-heavy LZW, 2-byte sub-blocks,
  * extension skipping), full-LZW roundtrip incl. code growth and the
  * KwKwK case, and subset rejections.
  */
class GifSpec extends AnyFunSuite {

  private lazy val fixture: Array[Byte] = {
    val in = getClass.getResourceAsStream("/tile_fixture.gif")
    assert(in != null, "tile_fixture.gif missing — run tools/make_gif_fixture.py")
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    out.toByteArray
  }

  test("independent Python fixture: palette luma, extension skip, degenerate LZW") {
    val img = Gif.decode(fixture)
    assert(img.width == 6 && img.height == 4)
    // palette red/green/blue/white → BT.601 luma 76, 150, 29, 255
    val luma = Array(76, 150, 29, 255)
    val want = (for (y <- 0 until 4; x <- 0 until 6) yield luma((x + y) % 4).toByte)
    assert(img.gray.toSeq == want)
  }

  test("encoder roundtrip: gradient, constant, and KwKwK-inducing runs") {
    // gradient exercises dictionary growth; aaaa… runs hit the KwKwK case
    val cases = Seq(
      Array.tabulate[Byte](64 * 48)(i => (i % 251).toByte),
      Array.fill[Byte](40 * 40)(7),
      Array.tabulate[Byte](33 * 9)(i => (if (i % 5 < 3) 200 else i % 17).toByte))
    for ((px, ci) <- cases.zipWithIndex) {
      val (w, h) = ci match {
        case 0 => (64, 48); case 1 => (40, 40); case _ => (33, 9)
      }
      val img = Gif.decode(Gif.encodeGray(w, h, px))
      assert(img.width == w && img.height == h, s"case $ci geometry")
      assert(img.gray.sameElements(px), s"case $ci pixels differ")
    }
  }

  test("big image crosses the 4096-code dictionary reset") {
    // high-entropy 300×300 forces thousands of dictionary entries
    val px = Array.tabulate[Byte](300 * 300)(i => ((i * 2654435761L >>> 13) & 0xff).toByte)
    val img = Gif.decode(Gif.encodeGray(300, 300, px))
    assert(img.gray.sameElements(px))
  }

  test("subset rejections are loud") {
    intercept[IllegalArgumentException](Gif.decode("NOTAGIF!".getBytes))
    // flip the interlace bit in a tiny encoded image
    val g = Gif.encodeGray(4, 4, Array.fill[Byte](16)(3))
    val idesc = {
      var p = 6 + 7 + 768 // header + LSD + global palette
      while ((g(p) & 0xff) != 0x2c) p += 1
      p
    }
    val bad = g.clone()
    bad(idesc + 9) = (bad(idesc + 9) | 0x40).toByte
    intercept[IllegalArgumentException](Gif.decode(bad))
  }
}
