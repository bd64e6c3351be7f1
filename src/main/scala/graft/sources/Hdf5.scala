package graft.sources

import java.io.RandomAccessFile
import java.nio.{ByteBuffer, ByteOrder}

import scala.collection.mutable.ArrayBuffer

/** Pure-Scala reader for the netCDF-4/HDF5 container subset that real
  * Sentinel-1 OWI scene files use — the reference's actual scene open is
  * `xr.open_dataset(owi_file, group="owiInversionTables_UV")`
  * (detrend.py:76-79), and those files are HDF5, not classic CDF. Written
  * from the PUBLIC HDF5 File Format Specification (v1.8 "earliest" layout,
  * which is what the netCDF-4 C library emits by default):
  *
  *  - superblock versions 0/2/3 (8-byte offsets/lengths);
  *  - version-1 object headers incl. continuation blocks;
  *  - old-style groups: symbol-table message → v1 B-tree (node type 0) →
  *    SNOD symbol nodes + local heap names, traversed recursively;
  *  - dataspace v1/v2, datatype classes 0 (fixed-point) and 1 (float),
  *    data layout v3 contiguous and chunked (v1 B-tree node type 1),
  *    filter pipeline v1/v2 with deflate (id 1) and shuffle (id 2);
  *  - attributes (v1-v3) with numeric, fixed-length-string, and
  *    vlen-string values (global heap lookup) — the netCDF-4 global-attr
  *    shapes both the C library and xarray emit;
  *  - numeric data widens to Double (matching the Nc3 reader contract).
  *
  * Deliberately NOT supported (clear errors instead): version-2 object
  * headers with dense (fractal-heap) links, vlen/compound/string DATASET
  * values, compact layout for >1-D data, szip. None appear in OWI scene
  * or LUT files.
  */
object Hdf5 {

  private val Undef = -1L // 0xFFFFFFFFFFFFFFFF in the file

  final case class Filter(id: Int, clientData: Array[Int])

  sealed trait Layout
  final case class Contiguous(addr: Long, size: Long) extends Layout
  /** chunkDims excludes the trailing element-size pseudo-dimension. */
  final case class Chunked(chunkDims: Array[Int], btreeAddr: Long) extends Layout

  /** Dataset metadata: everything needed to read any slice on any reader
    * (driver or executor) without holding the values. `attrs`: char attrs →
    * Left(string), numeric → Right(doubles) (the Nc3.Att convention). */
  final case class DsetMeta(name: String, dims: Array[Long], dtClass: Int, dtSize: Int,
      littleEndian: Boolean, signed: Boolean, layout: Layout, filters: Seq[Filter],
      attrs: Map[String, Either[String, Array[Double]]] = Map.empty) {
    def rank: Int = dims.length
    def nElems: Long = dims.product
  }

  /** One filtered chunk: logical element offsets (per dataset dim), file
    * address, and on-disk (post-filter) byte count. */
  final case class ChunkRef(offsets: Array[Long], addr: Long, nbytes: Int)

  // ------------------------------------------------------------- low level

  private final class R(path: String) extends AutoCloseable {
    val raf = new RandomAccessFile(path, "r")
    def close(): Unit = raf.close()
    def bytesAt(addr: Long, n: Int): Array[Byte] = {
      val b = new Array[Byte](n)
      raf.seek(addr)
      raf.readFully(b)
      b
    }
    def bufAt(addr: Long, n: Int): ByteBuffer =
      ByteBuffer.wrap(bytesAt(addr, n)).order(ByteOrder.LITTLE_ENDIAN)
  }

  private def u16(bb: ByteBuffer): Int = bb.getShort() & 0xffff
  private def u32(bb: ByteBuffer): Long = bb.getInt() & 0xffffffffL

  // ------------------------------------------------------------ superblock

  private val Signature = Array[Byte](0x89.toByte, 'H', 'D', 'F', 0x0d, 0x0a, 0x1a, 0x0a)

  /** Root group object header address (+ sanity checks). The superblock is
    * at offset 0 for netCDF files (no user block). */
  private def rootAddr(r: R, path: String): Long = {
    val head = r.bufAt(0, 160)
    val sig = new Array[Byte](8); head.get(sig)
    require(sig.sameElements(Signature), s"$path: not an HDF5 file")
    val version = head.get() & 0xff
    version match {
      case 0 | 1 =>
        head.get(); head.get(); head.get() // freespace, root group, reserved versions
        head.get() // shared header version
        val so = head.get() & 0xff; val sl = head.get() & 0xff
        require(so == 8 && sl == 8, s"$path: only 8-byte offsets/lengths supported ($so/$sl)")
        head.get() // reserved
        u16(head); u16(head) // group k's
        if (version == 1) { u16(head); u16(head) } // v1: indexed storage k + reserved
        head.getInt() // consistency flags
        val base = head.getLong()
        require(base == 0, s"$path: nonzero base address unsupported")
        head.getLong(); head.getLong(); head.getLong() // freespace, EOF, driver info
        // root group symbol table entry
        head.getLong() // link name offset
        head.getLong() // object header address
      case 2 | 3 =>
        val so = head.get() & 0xff; val sl = head.get() & 0xff
        require(so == 8 && sl == 8, s"$path: only 8-byte offsets/lengths supported ($so/$sl)")
        head.get() // flags
        val base = head.getLong()
        require(base == 0, s"$path: nonzero base address unsupported")
        head.getLong() // superblock extension
        head.getLong() // EOF
        head.getLong() // root group object header address
      case v => sys.error(s"$path: unsupported superblock version $v")
    }
  }

  // -------------------------------------------------------- object headers

  private final case class Msg(typ: Int, body: ByteBuffer)

  /** All messages of a version-1 object header, following continuations. */
  private def readMessages(r: R, addr: Long, path: String): Seq[Msg] = {
    val prefix = r.bufAt(addr, 16)
    val version = prefix.get() & 0xff
    require(version == 1,
      s"$path: object header version $version unsupported (v1 'earliest' layout only)")
    prefix.get() // reserved
    val nMsgs = u16(prefix)
    prefix.getInt() // reference count
    val chunk0Size = u32(prefix).toInt
    // chunk 0 starts after the 12-byte prefix + 4 bytes alignment padding
    val out = ArrayBuffer.empty[Msg]
    val blocks = scala.collection.mutable.Queue[(Long, Int)]((addr + 16, chunk0Size))
    while (out.length < nMsgs && blocks.nonEmpty) {
      val (at, len) = blocks.dequeue()
      val bb = r.bufAt(at, len)
      while (out.length < nMsgs && bb.remaining() >= 8) {
        val typ = u16(bb)
        val size = u16(bb)
        bb.get(); bb.get(); bb.get(); bb.get() // flags + reserved
        val body = bb.slice().order(ByteOrder.LITTLE_ENDIAN)
        body.limit(size)
        bb.position(bb.position() + size)
        if (typ == 0x0010) { // continuation: points at another raw block
          val cont = body.duplicate().order(ByteOrder.LITTLE_ENDIAN)
          blocks.enqueue((cont.getLong(), cont.getLong().toInt))
        }
        out += Msg(typ, body)
      }
    }
    out.toSeq
  }

  // ---------------------------------------------------------------- groups

  /** (name → object header address) links of an old-style group. */
  private def groupLinks(r: R, ohAddr: Long, path: String): Seq[(String, Long)] = {
    val stab = readMessages(r, ohAddr, path).find(_.typ == 0x0011)
      .getOrElse(sys.error(s"$path: object at $ohAddr is not an old-style group"))
    val b = stab.body.duplicate().order(ByteOrder.LITTLE_ENDIAN)
    val btreeAddr = b.getLong()
    val heapAddr = b.getLong()
    // local heap: names live in its data segment
    val hh = r.bufAt(heapAddr, 32)
    val hsig = new Array[Byte](4); hh.get(hsig)
    require(new String(hsig, "US-ASCII") == "HEAP", s"$path: bad local heap at $heapAddr")
    hh.getInt() // version + reserved
    val heapSize = hh.getLong()
    hh.getLong() // free list head
    val heapData = r.bytesAt(hh.getLong(), heapSize.toInt)
    def name(off: Long): String = {
      var end = off.toInt
      while (heapData(end) != 0) end += 1
      new String(heapData, off.toInt, end - off.toInt, "UTF-8")
    }
    // v1 B-tree (node type 0) → SNOD leaves
    def walk(nodeAddr: Long): Seq[(String, Long)] = {
      val sig = new String(r.bytesAt(nodeAddr, 4), "US-ASCII")
      if (sig == "SNOD") {
        val sb = r.bufAt(nodeAddr, 8)
        sb.getInt() // signature
        sb.get(); sb.get() // version + reserved
        val n = u16(sb)
        val entries = r.bufAt(nodeAddr + 8, n * 40)
        (0 until n).map { _ =>
          val nameOff = entries.getLong()
          val oh = entries.getLong()
          entries.getInt(); entries.getInt() // cache type + reserved
          entries.position(entries.position() + 16) // scratch
          (name(nameOff), oh)
        }
      } else {
        require(sig == "TREE", s"$path: bad group B-tree node at $nodeAddr")
        val nb = r.bufAt(nodeAddr, 24)
        nb.getInt() // signature
        val typ = nb.get() & 0xff
        require(typ == 0, s"$path: B-tree node type $typ where group tree expected")
        nb.get() // level (children may be TREE or SNOD; sniffed recursively)
        val n = u16(nb)
        val body = r.bufAt(nodeAddr + 24, 8 * (2 * n + 1))
        body.getLong() // key 0
        (0 until n).flatMap { _ =>
          val child = body.getLong()
          body.getLong() // next key
          walk(child)
        }
      }
    }
    walk(btreeAddr)
  }

  // ------------------------------------------------- datatypes, dataspaces

  /** Parsed datatype message. Classes used here: 0 fixed-point, 1 float,
    * 3 fixed-length string, 9 variable-length (base inside; bits0 low
    * nibble 1 = vlen string). */
  private final case class Dtype(cls: Int, size: Int, bits0: Int, base: Option[Dtype]) {
    def littleEndian: Boolean = (bits0 & 1) == 0
    def signed: Boolean = cls != 0 || (bits0 & 0x08) != 0
    def isVlenString: Boolean = cls == 9 && (bits0 & 0x0f) == 1
  }

  private def parseDatatype(bb: ByteBuffer): Dtype = {
    val clsVer = bb.get() & 0xff
    val cls = clsVer & 0x0f
    val bits0 = bb.get() & 0xff
    bb.get(); bb.get() // bit fields 1-2
    val size = bb.getInt()
    val base = if (cls == 9) Some(parseDatatype(bb)) else None
    Dtype(cls, size, bits0, base)
  }

  private def parseDataspaceDims(bb: ByteBuffer): Array[Long] = {
    val ver = bb.get() & 0xff
    val rank = bb.get() & 0xff
    bb.get() // flags
    if (ver == 1) { bb.get(); bb.getInt() } // reserved
    else bb.get() // v2: dataspace type
    Array.fill(rank)(bb.getLong())
  }

  // --------------------------------------------------- attributes + gheap

  /** Object from a global heap collection (vlen attribute payloads). */
  private def gheapObject(r: R, addr: Long, index: Int, path: String): Array[Byte] = {
    val head = r.bufAt(addr, 16)
    val sig = new Array[Byte](4); head.get(sig)
    require(new String(sig, "US-ASCII") == "GCOL", s"$path: bad global heap at $addr")
    head.getInt() // version + reserved
    val size = head.getLong()
    val body = r.bufAt(addr + 16, (size - 16).toInt)
    while (body.remaining() >= 16) {
      val idx = u16(body)
      body.getShort(); body.getInt() // refcount + reserved
      val objSize = body.getLong()
      if (idx == index) {
        val out = new Array[Byte](objSize.toInt)
        body.get(out)
        return out
      }
      if (idx == 0) // free-space object: end of the collection's objects
        sys.error(s"$path: global heap object $index not in collection at $addr")
      body.position(body.position() + ((objSize + 7) & ~7L).toInt)
    }
    sys.error(s"$path: global heap object $index not found at $addr")
  }

  /** Attribute messages (v1/v2/v3) of an object header → the Nc3.Att-style
    * map. Strings: fixed-length (class 3) inline, vlen (class 9/string)
    * via the global heap — both shapes netCDF-4 writers emit. */
  private def parseAttrs(r: R, msgs: Seq[Msg], path: String): Map[String, Either[String, Array[Double]]] =
    msgs.filter(_.typ == 0x000C).flatMap { m =>
      val bb = m.body.duplicate().order(ByteOrder.LITTLE_ENDIAN)
      val ver = bb.get() & 0xff
      val flags = bb.get() & 0xff // v1: reserved (0)
      val nameSize = u16(bb)
      val dtSize = u16(bb)
      val dsSize = u16(bb)
      if (ver == 3) bb.get() // name character-set encoding
      require(ver >= 1 && ver <= 3, s"$path: attribute message version $ver unsupported")
      require(ver == 1 || (flags & 0x03) == 0,
        s"$path: shared attribute datatype/dataspace unsupported")
      def padded(n: Int): Int = if (ver == 1) (n + 7) & ~7 else n
      val nameB = new Array[Byte](nameSize); bb.get(nameB)
      bb.position(bb.position() + (padded(nameSize) - nameSize))
      val name = new String(nameB, 0, math.max(0, nameSize - 1), "UTF-8") // NUL-terminated
      val dtB = bb.slice().order(ByteOrder.LITTLE_ENDIAN); dtB.limit(dtSize)
      bb.position(bb.position() + padded(dtSize))
      val dsB = bb.slice().order(ByteOrder.LITTLE_ENDIAN); dsB.limit(dsSize)
      bb.position(bb.position() + padded(dsSize))
      val dt = parseDatatype(dtB)
      val n = parseDataspaceDims(dsB).product.toInt.max(1)
      val data = bb.slice().order(ByteOrder.LITTLE_ENDIAN)
      dt.cls match {
        case 3 => // fixed-length string
          val raw = new Array[Byte](dt.size * n); data.get(raw)
          Some(name -> Left(new String(raw, "UTF-8").takeWhile(_ != '\u0000')))
        case 9 if dt.isVlenString =>
          // vlen string: n × {length(4), gheap collection addr(8), index(4)}
          // records — array-valued attrs (n > 1) join elementwise with ", "
          // (ncdump's rendering of multi-valued string attributes)
          val parts = (0 until n).map { _ =>
            data.getInt()
            val gaddr = data.getLong()
            val gidx = data.getInt()
            new String(gheapObject(r, gaddr, gidx, path), "UTF-8")
          }
          Some(name -> Left(parts.mkString(", ")))
        case 0 | 1 =>
          val raw = new Array[Byte](dt.size * n); data.get(raw)
          val m2 = DsetMeta(name, Array(n.toLong), dt.cls, dt.size, dt.littleEndian,
            dt.signed, Contiguous(0, 0), Nil)
          Some(name -> Right(decodeValues(m2, raw, 0, n)))
        case _ => None // reference/compound/etc. attrs: ignored
      }
    }.toMap

  /** Attributes on a GROUP's object header — netCDF-4 global attributes
    * live on the root (or sub-) group. */
  def groupAttrs(path: String, group: String): Map[String, Either[String, Array[Double]]] = {
    val r = new R(path)
    try {
      val parts = group.split("/").filter(_.nonEmpty)
      val addr = parts.foldLeft(rootAddr(r, path)) { (at, part) =>
        groupLinks(r, at, path).find(_._1 == part)
          .getOrElse(sys.error(s"$path: no group '$part'"))._2
      }
      parseAttrs(r, readMessages(r, addr, path), path)
    } finally r.close()
  }

  // -------------------------------------------------------------- datasets

  private def parseDataset(r: R, name: String, ohAddr: Long, path: String): Option[DsetMeta] = {
    val msgs = readMessages(r, ohAddr, path)
    if (msgs.exists(_.typ == 0x0011)) return None // a (sub)group, not a dataset
    val space = msgs.find(_.typ == 0x0001).getOrElse(return None)
    val dtype = msgs.find(_.typ == 0x0003).getOrElse(return None)
    val layout = msgs.find(_.typ == 0x0008).getOrElse(return None)

    val dims = parseDataspaceDims(space.body.duplicate().order(ByteOrder.LITTLE_ENDIAN))
    val dt = parseDatatype(dtype.body.duplicate().order(ByteOrder.LITTLE_ENDIAN))
    val dtClass = dt.cls
    require(dtClass == 0 || dtClass == 1,
      s"$path: dataset $name has datatype class $dtClass (only fixed/float supported)")
    val dtSize = dt.size
    require(Seq(1, 2, 4, 8).contains(dtSize), s"$path: $name: unsupported type size $dtSize")
    val littleEndian = dt.littleEndian
    val signed = dt.signed

    val lb = layout.body.duplicate().order(ByteOrder.LITTLE_ENDIAN)
    val lVer = lb.get() & 0xff
    require(lVer == 3, s"$path: $name: data layout version $lVer unsupported (v3 only)")
    val lClass = lb.get() & 0xff
    val lay: Layout = lClass match {
      case 1 => Contiguous(lb.getLong(), lb.getLong())
      case 2 =>
        val d = lb.get() & 0xff // rank + 1 (element-size pseudo-dim)
        val btree = lb.getLong()
        val cd = Array.fill(d - 1)(lb.getInt())
        lb.getInt() // element size pseudo-dim
        Chunked(cd, btree)
      case c => sys.error(s"$path: $name: layout class $c unsupported (contiguous/chunked only)")
    }

    val filters: Seq[Filter] = msgs.find(_.typ == 0x000B).map { f =>
      val fb = f.body.duplicate().order(ByteOrder.LITTLE_ENDIAN)
      val fVer = fb.get() & 0xff
      val n = fb.get() & 0xff
      if (fVer == 1) { fb.getShort(); fb.getInt() } // reserved
      (0 until n).map { _ =>
        val id = u16(fb)
        val nameLen = if (fVer == 1 || id >= 256) u16(fb) else { 0 }
        u16(fb) // flags
        val nv = u16(fb)
        if (nameLen > 0) fb.position(fb.position() + (if (fVer == 1) (nameLen + 7) & ~7 else nameLen))
        val cd = Array.fill(nv)(fb.getInt())
        if (fVer == 1 && nv % 2 == 1) fb.getInt() // pad to 8
        Filter(id, cd)
      }
    }.getOrElse(Nil)
    filters.foreach(f => require(f.id == 1 || f.id == 2,
      s"$path: $name: filter id ${f.id} unsupported (deflate/shuffle only)"))

    Some(DsetMeta(name, dims, dtClass, dtSize, littleEndian, signed, lay, filters,
      parseAttrs(r, msgs, path)))
  }

  /** Walk the chunk B-tree into a flat chunk list (driver-side; the list is
    * O(chunks) — a few thousand entries for a full scene). */
  def chunkIndex(path: String, meta: DsetMeta): Seq[ChunkRef] = {
    val ch = meta.layout match {
      case c: Chunked => c
      case _ => return Nil
    }
    val r = new R(path)
    try {
      val rank1 = meta.rank + 1
      def walk(nodeAddr: Long): Seq[ChunkRef] = {
        if (nodeAddr == Undef) return Nil
        val head = r.bufAt(nodeAddr, 24)
        val sig = new Array[Byte](4); head.get(sig)
        require(new String(sig, "US-ASCII") == "TREE", s"$path: bad chunk B-tree at $nodeAddr")
        val typ = head.get() & 0xff
        require(typ == 1, s"$path: B-tree node type $typ where chunk tree expected")
        val level = head.get() & 0xff
        val n = u16(head)
        val keySize = 8 + 8 * rank1
        val body = r.bufAt(nodeAddr + 24, (keySize + 8) * n + keySize)
        (0 until n).flatMap { _ =>
          val nbytes = body.getInt()
          body.getInt() // filter mask
          val offs = Array.fill(rank1)(body.getLong())
          val child = body.getLong()
          if (level == 0) Seq(ChunkRef(offs.dropRight(1), child, nbytes))
          else walk(child)
        }
      }
      walk(ch.btreeAddr)
    } finally r.close()
  }

  // ------------------------------------------------------------ public API

  /** Dataset metadata for every dataset directly inside `group` ("" or "/"
    * for the root group; nested paths with '/'). */
  def openGroup(path: String, group: String): Seq[DsetMeta] = {
    val r = new R(path)
    try {
      val parts = group.split("/").filter(_.nonEmpty)
      val groupAddr = parts.foldLeft(rootAddr(r, path)) { (at, part) =>
        groupLinks(r, at, path).find(_._1 == part)
          .getOrElse(sys.error(s"$path: no group '$part' " +
            s"(have ${groupLinks(r, at, path).map(_._1).mkString(", ")})"))._2
      }
      groupLinks(r, groupAddr, path).sortBy(_._1).flatMap { case (nm, oh) =>
        parseDataset(r, nm, oh, path)
      }
    } finally r.close()
  }

  /** Undo the filter pipeline (applied in reverse): raw file bytes →
    * element bytes. */
  def defilter(data: Array[Byte], filters: Seq[Filter], elemSize: Int,
      expected: Int): Array[Byte] = {
    var cur = data
    filters.reverse.foreach { f =>
      f.id match {
        case 1 => // deflate
          val inf = new java.util.zip.Inflater()
          inf.setInput(cur)
          val out = new Array[Byte](expected)
          var off = 0
          var stalled = false
          while (off < expected && !inf.finished() && !stalled) {
            val got = inf.inflate(out, off, expected - off)
            if (got == 0 && (inf.needsInput() || inf.needsDictionary())) stalled = true
            else off += got
          }
          inf.end()
          require(off == expected, s"deflate: got $off of $expected bytes")
          cur = out
        case 2 => // shuffle: byte-plane transpose
          val es = if (f.clientData.nonEmpty) f.clientData(0) else elemSize
          if (es > 1 && cur.length % es == 0) {
            val n = cur.length / es
            val out = new Array[Byte](cur.length)
            var b = 0
            while (b < es) {
              var i = 0
              while (i < n) { out(i * es + b) = cur(b * n + i); i += 1 }
              b += 1
            }
            cur = out
          }
        case id => sys.error(s"unsupported filter $id")
      }
    }
    cur
  }

  /** Decode `count` elements from `bytes` at byte `off` per the dataset's
    * type, widening to Double. */
  def decodeValues(m: DsetMeta, bytes: Array[Byte], off: Int, count: Int): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
      .order(if (m.littleEndian) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    val out = new Array[Double](count)
    var i = 0
    var p = off
    while (i < count) {
      out(i) = (m.dtClass, m.dtSize, m.signed) match {
        case (1, 4, _) => bb.getFloat(p).toDouble
        case (1, 8, _) => bb.getDouble(p)
        case (0, 1, true) => bytes(p).toDouble
        case (0, 1, false) => (bytes(p) & 0xff).toDouble
        case (0, 2, true) => bb.getShort(p).toDouble
        case (0, 2, false) => (bb.getShort(p) & 0xffff).toDouble
        case (0, 4, true) => bb.getInt(p).toDouble
        case (0, 4, false) => (bb.getInt(p) & 0xffffffffL).toDouble
        case (0, 8, _) => bb.getLong(p).toDouble
        case other => sys.error(s"unsupported datatype $other")
      }
      p += m.dtSize
      i += 1
    }
    out
  }

  /** Read a whole dataset into a row-major Double array (driver-side; for
    * the bounded LUT/fixture shapes — scene ingest reads spans on
    * executors instead, see SceneIngest.readOwiH5). */
  def readAll(path: String, m: DsetMeta): Array[Double] = {
    val n = m.nElems.toInt
    m.layout match {
      case Contiguous(addr, size) =>
        require(addr != Undef, s"${m.name}: no data allocated")
        val r = new R(path)
        try decodeValues(m, r.bytesAt(addr, size.toInt), 0, n)
        finally r.close()
      case Chunked(chunkDims, _) =>
        val out = new Array[Double](n)
        val r = new R(path)
        try {
          chunkIndex(path, m).foreach { c =>
            val raw = r.bytesAt(c.addr, c.nbytes)
            val elems = chunkDims.map(_.toLong).product.toInt
            val bytes = defilter(raw, m.filters, m.dtSize, elems * m.dtSize)
            val vals = decodeValues(m, bytes, 0, elems)
            copyChunk(m, chunkDims, c.offsets, vals, out)
          }
        } finally r.close()
        out
    }
  }

  /** Copy a decoded chunk into the full row-major array, clipping edge
    * chunks (any rank). */
  private def copyChunk(m: DsetMeta, chunkDims: Array[Int], offs: Array[Long],
      vals: Array[Double], out: Array[Double]): Unit = {
    val rank = m.rank
    // iterate over all chunk-local coordinates except the fastest dim,
    // copying contiguous runs along the fastest dim
    val runLen = math.min(chunkDims(rank - 1).toLong,
      m.dims(rank - 1) - offs(rank - 1)).toInt
    if (runLen <= 0) return
    val outer = chunkDims.dropRight(1)
    val idx = new Array[Int](math.max(outer.length, 1))
    def rec(d: Int): Unit = {
      if (d == outer.length) {
        var srcOff = 0L
        var dstOff = 0L
        var k = 0
        var inBounds = true
        while (k < rank - 1 && inBounds) {
          val coord = offs(k) + idx(k)
          if (coord >= m.dims(k)) inBounds = false // clipped edge: skip this run only
          else {
            srcOff = srcOff * chunkDims(k) + idx(k)
            dstOff = dstOff * m.dims(k) + coord
            k += 1
          }
        }
        if (inBounds) {
          srcOff = srcOff * chunkDims(rank - 1)
          dstOff = dstOff * m.dims(rank - 1) + offs(rank - 1)
          System.arraycopy(vals, srcOff.toInt, out, dstOff.toInt, runLen)
        }
      } else {
        var i = 0
        while (i < outer(d)) { idx(d) = i; rec(d + 1); i += 1 }
      }
    }
    rec(0)
  }
}
