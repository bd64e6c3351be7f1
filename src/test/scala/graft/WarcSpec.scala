package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Warc

/** WARC reader gates: the independently-written Python fixture (stdlib
  * gzip, one member per record), exact member-boundary discovery, record
  * skipping, and the writer↔reader roundtrip.
  */
class WarcSpec extends AnyFunSuite {

  private lazy val fixture: Array[Byte] = {
    val in = getClass.getResourceAsStream("/crawl_fixture.warc.gz")
    assert(in != null, "crawl_fixture.warc.gz missing — run tools/make_warc_fixture.py")
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    out.toByteArray
  }

  test("independent Python fixture: 5 members found exactly, 3 responses read") {
    assert(Warc.memberOffsets(fixture).length == 5)
    val recs = Warc.readAll(fixture)
    assert(recs.map(_.recordId) ==
      Seq("<urn:uuid:r1>", "<urn:uuid:r2>", "<urn:uuid:r3>"),
      "warcinfo and request records must be skipped, responses kept in order")
    assert(recs(0).bodyText == "hello warc world")
    assert(recs(1).body.isEmpty)
    assert(recs(2).bodyText.startsWith("line one\r\nline two\r\n"),
      "CRLFs inside a body are content, not framing")
    assert(recs(2).body.length == 20 + 880)
  }

  test("members decompress independently at their discovered offsets") {
    val offs = Warc.memberOffsets(fixture)
    val bounds = offs.zip(offs.drop(1) :+ fixture.length.toLong)
    // member 1 (0-based) is response r1; read it WITHOUT touching others
    val (o1, e1) = bounds(1)
    assert(Warc.readMember(fixture, o1, e1 - o1).get.bodyText == "hello warc world")
    val (o0, e0) = bounds(0)
    assert(Warc.readMember(fixture, o0, e0 - o0).isEmpty, "warcinfo → None")
  }

  test("writer output reads back identically (roundtrip) and is multi-member") {
    val recs = (1 to 20).map { i =>
      Warc.Record(s"<urn:uuid:w$i>", "response", s"http://x/$i",
        (s"doc $i body " * i).getBytes("UTF-8"))
    }
    val gz = Warc.write(recs)
    assert(Warc.memberOffsets(gz).length == 20, "one gzip member per record")
    val back = Warc.readAll(gz)
    assert(back.map(_.recordId) == recs.map(_.recordId))
    assert(back.zip(recs).forall { case (a, b) => a.body.sameElements(b.body) })
    // the stream is also plain-gunzip-able by any consumer
    val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(gz))
    val all = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) { all.write(buf, 0, n); n = in.read(buf) }
    assert(new String(all.toByteArray, "UTF-8").contains("WARC/1.0"))
  }

  test("malformed input fails loudly") {
    intercept[IllegalArgumentException](Warc.memberOffsets("not gzip".getBytes))
    intercept[IllegalArgumentException](
      Warc.memberOffsets(fixture.take(40))) // truncated mid-member
  }
}
