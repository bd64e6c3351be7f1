package graft

import org.apache.spark.sql.functions._
import graft.sources.{Avi, Jpeg}
import graft.operators.Video

/** MJPEG-AVI gates: the independently-written Python-struct fixture
  * (movi-relative idx1 offsets, an odd-sized frame exercising RIFF word
  * alignment), writer↔reader roundtrip, index-vs-scan equivalence, and
  * the Spark frame-sampling operators (assemble shuffle, stride
  * arithmetic, per-frame DC decode).
  */
class AviSpec extends SparkSpec {

  private lazy val fixture: Array[Byte] = {
    val in = getClass.getResourceAsStream("/clip_fixture.avi")
    assert(in != null, "clip_fixture.avi missing — run tools/make_avi_fixture.py")
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    out.toByteArray
  }

  test("independent Python fixture: header, frames, odd-size padding, idx1 offsets") {
    assert(Avi.header(fixture) == ((16, 16, 3)))
    val fs = Avi.readFrames(fixture)
    assert(fs.length == 3)
    assert(fs(0).sameElements(Array.tabulate[Byte](64)(_.toByte)))
    assert(fs(1).length == 101 && fs(1).forall(_ == -1),
      "odd-sized frame must come back unpadded")
    assert(fs(2).sameElements(Array.tabulate[Byte](32)(i => (31 - i).toByte)))
  }

  test("idx1 index agrees with a movi scan and survives idx1 removal") {
    val viaIdx = Avi.frameIndex(fixture)
    // strip idx1: truncate at the idx1 chunk header
    val idxAt = {
      var p = 12
      var found = -1
      while (found < 0 && p + 8 <= fixture.length) {
        if (new String(fixture.slice(p, p + 4), "US-ASCII") == "idx1") found = p
        else {
          val sz = (fixture(p + 4) & 0xff) | ((fixture(p + 5) & 0xff) << 8) |
            ((fixture(p + 6) & 0xff) << 16) | ((fixture(p + 7) & 0xff) << 24)
          p += 8 + sz + (sz % 2)
        }
      }
      found
    }
    assert(idxAt > 0)
    val noIdx = fixture.take(idxAt)
    assert(Avi.frameIndex(noIdx) == viaIdx, "movi scan must find identical frames")
  }

  test("writer roundtrip with real JPEG frames; sampler touches only sampled offsets") {
    val jpegs = (0 until 5).map { k =>
      Jpeg.encodeGray(16, 16, Array.tabulate(256)(i => ((i * 7 + k * 31) % 251).toByte))
    }
    val avi = Avi.write(jpegs, 16, 16)
    assert(Avi.header(avi) == ((16, 16, 5)))
    val back = Avi.readFrames(avi)
    assert(back.length == 5)
    assert(back.zip(jpegs).forall { case (a, b) => a.sameElements(b) },
      "MJPEG framing must keep frames byte-identical")
    // every decoded frame is a valid JPEG of the declared geometry
    assert(back.forall(f => { val d = Jpeg.decode(f); d.blocksW == 2 && d.blocksH == 2 }))
  }

  test("Video operators: assemble → stride sampling → DC decode") {
    import spark.implicits._
    val frames = (for {
      vid <- 1L to 3L
      k <- 0 until 6
    } yield (vid, k,
      // odd frames reverse the ramp so sampled frames 0 and 3 differ in
      // gradient DIRECTION (dHash is invariant to constant shifts)
      Jpeg.encodeGray(16, 16, Array.tabulate(256) { i =>
        val ramp = ((i + k * 10 + vid).toInt % 200)
        (if (k % 2 == 0) ramp else 199 - ramp).toByte
      }))).toDF("video_id", "frame_no", "jpeg")
    val vids = Video.mjpegAssemble(frames, 16, 16)
    assert(vids.count() == 3)
    val sampled = Video.sampleFrames(vids, stride = 3)
    val byVid = sampled.select($"video_id", $"frame_no").as[(Long, Int)]
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(byVid == Map(1L -> Seq(0, 3), 2L -> Seq(0, 3), 3L -> Seq(0, 3)))
    val dc = Video.sampleDcMeans(vids, stride = 3)
    assert(dc.count() == 3 * 2 * 4, "3 videos × 2 sampled frames × 4 blocks")
    // sampled frame content must match the originally-encoded frame, not an
    // off-by-one neighbor: compare against direct decode of the source JPEG
    val direct = Jpeg.decode(Jpeg.encodeGray(16, 16,
      Array.tabulate(256)(i => (199 - (i + 3 * 10 + 1) % 200).toByte))).dcMean(0, 0)
    val got = dc.filter($"video_id" === 1 && $"frame_no" === 3 &&
      $"block_row" === 0 && $"block_col" === 0).select($"dc_mean").as[Double].head()
    assert(got == direct)
    val dh = Video.frameDHash(vids, stride = 3)
    assert(dh.count() == 6 && dh.select("dhash").distinct().count() >= 2)
  }
}
