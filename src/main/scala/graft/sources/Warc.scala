package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{CRC32, Deflater, GZIPInputStream}

/** WARC 1.0 (ISO 28500) reader/writer for web-crawl corpora — the container
  * format training-data pipelines ingest (Common Crawl ships it) — written
  * from the public spec with no crawl library, like the other from-scratch
  * sources ([[Nc3]]/[[Hdf5]]/[[Png]]/[[Jpeg]]/[[Flac]]).
  *
  * Files are `.warc.gz` in the standard SPLITTABLE layout: every record is
  * its own gzip MEMBER and members are concatenated — the property that
  * lets a distributed reader split one crawl file at member boundaries.
  * [[memberOffsets]] finds those boundaries (deflate-parsing each member —
  * the only exact way; the 1f8b magic can occur inside compressed bytes),
  * so records within one file can fan out across tasks; [[readAll]] is the
  * single-pass path.
  *
  * Records: `WARC/1.0` version line, CRLF header lines until the empty
  * line, `Content-Length`-octets body, two CRLFs. The reader tolerates
  * LF-only input and skips non-`response` records (warcinfo, request,
  * metadata) like a crawl consumer does.
  */
object Warc {

  final case class Record(recordId: String, warcType: String, targetUri: String,
      body: Array[Byte]) {
    def bodyText: String = new String(body, StandardCharsets.UTF_8)
  }

  // ------------------------------------------------------------------ write

  /** One record as an uncompressed WARC 1.0 entry. */
  private def recordBytes(r: Record): Array[Byte] = {
    val head = new StringBuilder
    head ++= "WARC/1.0\r\n"
    head ++= s"WARC-Type: ${r.warcType}\r\n"
    head ++= s"WARC-Record-ID: ${r.recordId}\r\n"
    head ++= "WARC-Date: 2024-01-01T00:00:00Z\r\n"
    head ++= s"WARC-Target-URI: ${r.targetUri}\r\n"
    head ++= "Content-Type: text/plain\r\n"
    head ++= s"Content-Length: ${r.body.length}\r\n"
    head ++= "\r\n"
    val h = head.toString.getBytes(StandardCharsets.UTF_8)
    val out = new Array[Byte](h.length + r.body.length + 4)
    System.arraycopy(h, 0, out, 0, h.length)
    System.arraycopy(r.body, 0, out, h.length, r.body.length)
    out(out.length - 4) = '\r'; out(out.length - 3) = '\n'
    out(out.length - 2) = '\r'; out(out.length - 1) = '\n'
    out
  }

  /** One gzip member (header + raw deflate + CRC32/ISIZE trailer) —
    * built explicitly so each record is ITS OWN member (GZIPOutputStream
    * would need one stream per record; this is the same spec-level
    * construction, deterministic). */
  private def gzipMember(data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    // 10-byte header: magic, deflate, no flags, mtime 0, XFL 0, OS 255
    out.write(Array[Byte](0x1f, 0x8b.toByte, 8, 0, 0, 0, 0, 0, 0, 0xff.toByte))
    val d = new Deflater(Deflater.DEFAULT_COMPRESSION, true)
    d.setInput(data); d.finish()
    val buf = new Array[Byte](8192)
    while (!d.finished()) {
      val n = d.deflate(buf)
      out.write(buf, 0, n)
    }
    d.end()
    val crc = new CRC32(); crc.update(data)
    def le32(v: Long): Unit =
      (0 until 4).foreach(i => out.write(((v >>> (8 * i)) & 0xff).toInt))
    le32(crc.getValue)
    le32(data.length.toLong & 0xffffffffL)
    out.toByteArray
  }

  /** Records → one `.warc.gz` byte stream (one gzip member per record). */
  def write(records: Seq[Record]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    records.foreach(r => out.write(gzipMember(recordBytes(r))))
    out.toByteArray
  }

  // ------------------------------------------------------------------- read

  /** Byte offsets of every gzip member in a `.warc.gz` file — the split
    * points a distributed reader fans out on. Found EXACTLY, by walking
    * each member's deflate stream to its end (Inflater reports bytes
    * consumed); magic-byte scanning would false-positive inside compressed
    * data. One cheap sequential pass; the expensive per-member inflate +
    * parse then runs wherever the task lands.
    */
  def memberOffsets(bytes: Array[Byte]): Seq[Long] = {
    val offs = scala.collection.mutable.ArrayBuffer.empty[Long]
    var pos = 0
    while (pos < bytes.length) {
      require(bytes.length - pos >= 18 &&
        (bytes(pos) & 0xff) == 0x1f && (bytes(pos + 1) & 0xff) == 0x8b,
        s"warc.gz: not a gzip member at offset $pos")
      offs += pos.toLong
      require(bytes(pos + 2) == 8, "warc.gz: not deflate")
      val flg = bytes(pos + 3) & 0xff
      var p = pos + 10
      if ((flg & 4) != 0) { // FEXTRA
        val xlen = ((bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8)); p += 2 + xlen
      }
      if ((flg & 8) != 0) while (bytes(p) != 0) p += 1 // FNAME
      if ((flg & 8) != 0) p += 1
      if ((flg & 16) != 0) { while (bytes(p) != 0) p += 1; p += 1 } // FCOMMENT
      if ((flg & 2) != 0) p += 2 // FHCRC
      val inf = new java.util.zip.Inflater(true)
      inf.setInput(bytes, p, bytes.length - p)
      val buf = new Array[Byte](65536)
      while (!inf.finished()) {
        if (inf.inflate(buf) == 0 && inf.needsInput())
          throw new IllegalArgumentException("warc.gz: truncated member")
      }
      pos = p + inf.getBytesRead.toInt + 8 // + CRC32 + ISIZE
      inf.end()
    }
    offs.toSeq
  }

  /** Decompress ONE gzip member (`offset` until `offset + length`) and
    * parse its record (None for non-response records). Bounding by length
    * matters: GZIPInputStream reads THROUGH concatenated members, so an
    * unbounded slice would re-decompress the rest of the file per record.
    */
  def readMember(bytes: Array[Byte], offset: Long, length: Long): Option[Record] = {
    val in = new GZIPInputStream(new ByteArrayInputStream(
      bytes, offset.toInt, length.toInt))
    parseRecord(readFully(in))
  }

  /** All records of a `.warc.gz` byte stream (multi-member aware). */
  def readAll(bytes: Array[Byte]): Seq[Record] = {
    val offs = memberOffsets(bytes)
    offs.zip(offs.drop(1) :+ bytes.length.toLong).flatMap {
      case (off, end) => readMember(bytes, off, end - off)
    }
  }

  private def readFully(in: java.io.InputStream): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](65536)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    out.toByteArray
  }

  /** Parse one uncompressed record: version line, headers, body. */
  private[sources] def parseRecord(rec: Array[Byte]): Option[Record] = {
    // header section ends at the first empty line; tolerate \n-only
    var i = 0
    def line(): String = {
      val start = i
      while (i < rec.length && rec(i) != '\n') i += 1
      val end = if (i > start && rec(i - 1) == '\r') i - 1 else i
      i += 1 // past \n
      new String(rec, start, end - start, StandardCharsets.UTF_8)
    }
    val version = line()
    require(version.startsWith("WARC/"), s"warc: bad version line '$version'")
    var warcType = ""
    var recordId = ""
    var uri = ""
    var contentLength = -1L
    var l = line()
    while (l.nonEmpty) {
      val c = l.indexOf(':')
      require(c > 0, s"warc: bad header line '$l'")
      val (k, v) = (l.substring(0, c).trim.toLowerCase, l.substring(c + 1).trim)
      k match {
        case "warc-type" => warcType = v
        case "warc-record-id" => recordId = v
        case "warc-target-uri" => uri = v
        case "content-length" => contentLength = v.toLong
        case _ =>
      }
      l = line()
    }
    require(contentLength >= 0, "warc: missing Content-Length")
    require(i + contentLength <= rec.length, "warc: body truncated")
    val body = java.util.Arrays.copyOfRange(rec, i, i + contentLength.toInt)
    if (warcType == "response") Some(Record(recordId, warcType, uri, body))
    else None
  }
}
