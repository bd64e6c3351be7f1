package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

/** POSIX ustar tar reader/writer — the WebDataset shard container that
  * large-scale multimodal training pipelines read (a dataset is a fleet of
  * `.tar` shards; each *sample* is a run of adjacent members sharing one
  * basename key: `000123.jpg`, `000123.txt`, `000123.json`). Written from
  * the public ustar spec (POSIX.1-1988 / pax ustar header layout) with no
  * archive library, like the other from-scratch sources
  * ([[Nc3]]/[[Hdf5]]/[[Png]]/[[Jpeg]]/[[Flac]]/[[Warc]]).
  *
  * The container is deliberately uncompressed (the WebDataset norm —
  * members such as JPEG/FLAC payloads are already entropy-coded), which
  * buys the 100 TB property gzip would destroy: a header-only index pass
  * ([[memberIndex]]) yields exact `(name, dataOffset, size)` split points,
  * so one shard's members can fan out across tasks that each seek and read
  * ONLY their own byte ranges — no sequential decode, nothing read twice.
  *
  * Layout per member: one 512-byte header block (name[100] mode[8] uid[8]
  * gid[8] size[12-octal] mtime[12] chksum[8] typeflag[1] linkname[100]
  * magic "ustar\0" version "00" uname[32] gname[32] devmajor[8]
  * devminor[8] prefix[155]), then the body padded to a 512 multiple; the
  * archive ends with two zero blocks.
  */
object Tar {

  final case class Entry(name: String, body: Array[Byte]) {
    def bodyText: String = new String(body, StandardCharsets.UTF_8)
  }

  /** One member's location inside a shard: data starts at `dataOffset`
    * (its header block is the 512 bytes before it). */
  final case class Member(name: String, dataOffset: Long, size: Long)

  private val Block = 512

  // ------------------------------------------------------------------ write

  /** Zero-padded octal field, NUL-terminated, as the spec's numeric form. */
  private def octal(v: Long, width: Int): Array[Byte] = {
    val s = java.lang.Long.toOctalString(v)
    val b = new Array[Byte](width)
    val digits = ("0" * (width - 1 - s.length)) + s
    var i = 0
    while (i < width - 1) { b(i) = digits.charAt(i).toByte; i += 1 }
    b(width - 1) = 0
    b
  }

  private def putStr(dst: Array[Byte], off: Int, s: String, max: Int): Unit = {
    val b = s.getBytes(StandardCharsets.UTF_8)
    require(b.length <= max, s"tar field overflows $max bytes: $s")
    System.arraycopy(b, 0, dst, off, b.length)
  }

  /** ustar long-name split: names over 100 bytes break at a `/` into
    * (prefix[155], name[100]) per POSIX.1-1988 §10.1 — readers join them
    * with a slash. */
  private def splitName(name: String): (String, String) = {
    val b = name.getBytes(StandardCharsets.UTF_8)
    if (b.length <= 100) ("", name)
    else {
      // candidate slashes right-to-left; accept the FIRST whose tail fits
      // name[100] AND whose head fits prefix[155] — both measured in UTF-8
      // BYTES (char indices undercount multi-byte names; and stopping at
      // the rightmost slash would wrongly reject names whose valid split
      // sits at an earlier slash). Splitting at a '/' byte never lands
      // mid-codepoint: UTF-8 continuation bytes are all >= 0x80.
      var c = b.length - 1
      var found = -1
      while (c > 0 && found < 0) {
        if (b(c) == '/'.toByte && b.length - c - 1 <= 100 && c <= 155) found = c
        c -= 1
      }
      require(found > 0,
        s"tar member name not splittable under ustar prefix/name limits: $name")
      (new String(b, 0, found, StandardCharsets.UTF_8),
        new String(b, found + 1, b.length - found - 1, StandardCharsets.UTF_8))
    }
  }

  /** 512-byte ustar header for a regular file. mtime pinned to 0 so writes
    * are deterministic (same reason Warc pins WARC-Date). */
  def headerBytes(name: String, size: Long): Array[Byte] = {
    val h = new Array[Byte](Block)
    val (prefix, base) = splitName(name)
    putStr(h, 0, base, 100)                              // name[100]
    if (prefix.nonEmpty) putStr(h, 345, prefix, 155)     // prefix[155]
    System.arraycopy(octal(420, 8), 0, h, 100, 8)        // mode 0644
    System.arraycopy(octal(0, 8), 0, h, 108, 8)          // uid
    System.arraycopy(octal(0, 8), 0, h, 116, 8)          // gid
    System.arraycopy(octal(size, 12), 0, h, 124, 12)     // size
    System.arraycopy(octal(0, 12), 0, h, 136, 12)        // mtime
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)       // chksum = spaces while summing
    h(156) = '0'                                         // typeflag: regular file
    putStr(h, 257, "ustar", 6)                           // magic "ustar\0"
    h(263) = '0'; h(264) = '0'                           // version "00"
    var sum = 0L
    var i = 0
    while (i < Block) { sum += (h(i) & 0xff); i += 1 }
    val chk = octal(sum, 7)                              // 6 digits + NUL, then space
    System.arraycopy(chk, 0, h, 148, 7)
    h(155) = ' '
    h
  }

  /** Entries → one `.tar` byte stream (ustar headers, 512-padding, two
    * terminating zero blocks). */
  def write(entries: Seq[Entry]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    entries.foreach { e =>
      out.write(headerBytes(e.name, e.body.length.toLong))
      out.write(e.body)
      val pad = (Block - (e.body.length % Block)) % Block
      out.write(new Array[Byte](pad))
    }
    out.write(new Array[Byte](2 * Block))
    out.toByteArray
  }

  // ------------------------------------------------------------------- read

  private def parseOctal(b: Array[Byte], off: Int, len: Int): Long = {
    var v = 0L
    var i = off
    val end = off + len
    while (i < end && (b(i) == ' ' || b(i) == 0)) i += 1
    while (i < end && b(i) >= '0' && b(i) <= '7') { v = v * 8 + (b(i) - '0'); i += 1 }
    v
  }

  private def parseName(b: Array[Byte], off: Int): String = {
    var n = 0
    while (n < 100 && b(off + n) != 0) n += 1
    val base = new String(b, off, n, StandardCharsets.UTF_8)
    // ustar prefix[155] at header offset 345 joins with '/'
    var p = 0
    while (p < 155 && b(off + 345 + p) != 0) p += 1
    if (p == 0) base
    else new String(b, off + 345, p, StandardCharsets.UTF_8) + "/" + base
  }

  /** Parse one header block starting at `off`; None at the end-of-archive
    * zero block. Verifies the spec checksum — a corrupt or misaligned
    * header fails loudly instead of yielding garbage offsets. */
  private def parseHeader(bytes: Array[Byte], off: Int): Option[(String, Long)] = {
    if (bytes(off) == 0) return None // zero block terminator
    var sum = 0L
    var i = 0
    while (i < Block) {
      sum += (if (i >= 148 && i < 156) ' '.toLong else (bytes(off + i) & 0xff).toLong)
      i += 1
    }
    val stored = parseOctal(bytes, off + 148, 8)
    require(sum == stored, s"tar: header checksum mismatch at offset $off ($sum != $stored)")
    Some((parseName(bytes, off), parseOctal(bytes, off + 124, 12)))
  }

  /** One standalone 512-byte header block → `(name, size)`; None at the
    * end-of-archive zero block. For seek-read index passes that never load
    * member data. */
  def parseHeaderBlock(hdr: Array[Byte]): Option[(String, Long)] = {
    require(hdr.length >= Block, "tar: short header block")
    parseHeader(hdr, 0)
  }

  /** Header-only walk → exact member split points. Touches 512 bytes per
    * member regardless of member size — the cheap pass a distributed
    * reader runs once per shard before fanning data reads out. */
  def memberIndex(bytes: Array[Byte]): Seq[Member] = {
    val ms = scala.collection.mutable.ArrayBuffer.empty[Member]
    var pos = 0L
    while (pos + Block <= bytes.length) {
      parseHeader(bytes, pos.toInt) match {
        case None => pos = bytes.length.toLong
        case Some((name, size)) =>
          ms += Member(name, pos + Block, size)
          pos += Block + ((size + Block - 1) / Block) * Block
      }
    }
    ms.toSeq
  }

  /** Single-pass read of a whole shard. */
  def readAll(bytes: Array[Byte]): Seq[Entry] =
    memberIndex(bytes).map(m =>
      Entry(m.name, java.util.Arrays.copyOfRange(bytes, m.dataOffset.toInt,
        (m.dataOffset + m.size).toInt)))

  /** WebDataset key/ext split: basename up to the FIRST dot is the sample
    * key (so `x.seg.json` keeps the compound extension `seg.json`). */
  def keyExt(name: String): (String, String) = {
    val base = name.substring(name.lastIndexOf('/') + 1)
    val dot = base.indexOf('.')
    if (dot < 0) (base, "") else (base.substring(0, dot), base.substring(dot + 1))
  }
}
