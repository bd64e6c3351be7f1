package graft.sources

import java.nio.ByteBuffer
import java.nio.file.{Files, Paths}

import scala.collection.mutable.ArrayBuffer

/** Pure-Scala NetCDF-3 "classic" reader/writer (public CDF-1/CDF-2 format
  * spec; big-endian XDR layout). This is the S1/S2 ingest substrate: the
  * reference opens scene and LUT files with `xr.open_dataset`
  * (detrend.py:71-93, models.py:350-411); we read the classic-format subset
  * and convert once to Parquet — Spark's native scale format.
  *
  * Supported: CDF-1 and CDF-2 magic, fixed-size and record variables, all
  * six classic types (byte/char/short/int/float/double), dimension lists,
  * global + per-variable attributes. Numeric data widens to Double; char
  * attributes surface as Strings. netCDF-4/HDF5 containers (the reference's
  * `group="owiInversionTables_UV"` scene read) are handled by the sibling
  * [[Hdf5]] reader — SceneIngest.readOwiAuto sniffs the magic bytes.
  */
object Nc3 {

  val NcByte = 1; val NcChar = 2; val NcShort = 3
  val NcInt = 4; val NcFloat = 5; val NcDouble = 6

  final case class Dim(name: String, length: Int) { def isRecord: Boolean = length == 0 }

  /** Attribute value: char attrs → Left(string), numeric → Right(doubles). */
  final case class Att(name: String, ncType: Int, value: Either[String, Array[Double]]) {
    def text: String = value.left.getOrElse(sys.error(s"attr $name is numeric"))
    def nums: Array[Double] = value.toOption.getOrElse(sys.error(s"attr $name is char"))
  }

  final case class Var(name: String, dimIds: Seq[Int], atts: Seq[Att], ncType: Int,
      data: Array[Double]) {
    def att(n: String): Option[Att] = atts.find(_.name == n)
  }

  final case class Nc3File(dims: Seq[Dim], gatts: Seq[Att], vars: Seq[Var]) {
    def gatt(n: String): Option[Att] = gatts.find(_.name == n)
    def variable(n: String): Var =
      vars.find(_.name == n).getOrElse(sys.error(s"no variable $n (have ${vars.map(_.name)})"))
    def shapeOf(v: Var, numrecs: Int = -1): Seq[Int] =
      v.dimIds.map(d => if (dims(d).isRecord) math.max(numrecs, 0) else dims(d).length)
  }

  private[sources] def typeSize(t: Int): Int = t match {
    case NcByte | NcChar => 1
    case NcShort => 2
    case NcInt | NcFloat => 4
    case NcDouble => 8
    case _ => sys.error(s"unknown nc type $t")
  }

  private def pad4(n: Long): Long = (n + 3) & ~3L

  // ---------------------------------------------------------------- reader

  /** Variable metadata only — enough to locate and decode any slice of its
    * data on ANY reader (driver or executor) without holding the values. */
  final case class VarMeta(name: String, dimIds: Seq[Int], atts: Seq[Att], ncType: Int,
      vsize: Long, begin: Long) {
    def att(n: String): Option[Att] = atts.find(_.name == n)
  }

  /** Parsed file header: dims, attributes, variable layout — no data. */
  final case class Header(numrecs: Int, dims: Seq[Dim], gatts: Seq[Att],
      varms: Seq[VarMeta]) {
    def isRecordVar(v: VarMeta): Boolean = v.dimIds.headOption.exists(d => dims(d).isRecord)
    /** Record slab stride: sum of record-var vsizes, except a SINGLE record
      * var is packed contiguously without per-record padding (spec note 2). */
    lazy val recSize: Long = {
      val recVars = varms.filter(isRecordVar)
      if (recVars.length == 1) {
        val v = recVars.head
        v.dimIds.drop(1).map(d => dims(d).length.toLong).product * typeSize(v.ncType)
      } else recVars.map(_.vsize).sum
    }
  }

  /** Parse only the header — a sequential few-KB read however large the
    * data section is. This is the driver half of the distributed scene
    * ingest: executors use the returned layout to read their own byte
    * ranges (see SceneIngest).
    */
  def readHeader(path: String): Header = {
    val in = new java.io.DataInputStream(
      new java.io.BufferedInputStream(new java.io.FileInputStream(path)))
    try {
      require(in.readByte() == 'C' && in.readByte() == 'D' && in.readByte() == 'F',
        s"$path: not a NetCDF file")
      val version = in.readByte()
      require(version == 1 || version == 2,
        s"$path: classic CDF-1/CDF-2 only (got version byte $version; for netCDF-4/HDF5 use Hdf5/SceneIngest.readOwiH5)")
      val wideOffsets = version == 2
      val numrecs = in.readInt()

      def readName(): String = {
        val n = in.readInt()
        val s = new Array[Byte](n)
        in.readFully(s)
        // skipBytes may skip fewer bytes at a buffer boundary (its
        // documented contract) — loop until the padding is consumed
        var toSkip = (pad4(n) - n).toInt
        while (toSkip > 0) {
          val k = in.skipBytes(toSkip)
          require(k > 0, s"$path: truncated header padding")
          toSkip -= k
        }
        new String(s, "UTF-8")
      }

      def readTagged(expectTag: Int): Int = {
        val tag = in.readInt(); val n = in.readInt()
        require(tag == expectTag || (tag == 0 && n == 0), s"$path: bad tag $tag (want $expectTag)")
        n
      }

      def readValues(t: Int, n: Int): Either[String, Array[Double]] = {
        val raw = pad4(n.toLong * typeSize(t)).toInt
        val buf = new Array[Byte](raw)
        in.readFully(buf)
        if (t == NcChar) Left(new String(buf, 0, n, "UTF-8"))
        else Right(decodeValues(t, buf, 0, n))
      }

      def readAtts(): Seq[Att] = {
        val n = readTagged(12) // NC_ATTRIBUTE
        (0 until n).map { _ =>
          val name = readName()
          val t = in.readInt()
          val count = in.readInt()
          Att(name, t, readValues(t, count))
        }
      }

      val nDims = readTagged(10) // NC_DIMENSION
      val dims = (0 until nDims).map(_ => Dim(readName(), in.readInt()))
      val gatts = readAtts()

      val nVars = readTagged(11) // NC_VARIABLE
      val varms = (0 until nVars).map { _ =>
        val name = readName()
        val nd = in.readInt()
        val dimIds = (0 until nd).map(_ => in.readInt())
        val atts = readAtts()
        val t = in.readInt()
        val vsize = java.lang.Integer.toUnsignedLong(in.readInt())
        val begin = if (wideOffsets) in.readLong() else java.lang.Integer.toUnsignedLong(in.readInt())
        VarMeta(name, dimIds, atts, t, vsize, begin)
      }
      Header(numrecs, dims, gatts, varms)
    } finally in.close()
  }

  /** Decode `count` big-endian values of nc type `t` starting at byte
    * `off` — the shared executor-side decode primitive. */
  private[sources] def decodeValues(t: Int, bytes: Array[Byte], off: Int, count: Int): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes) // big-endian by default
    val out = new Array[Double](count)
    val ts = typeSize(t)
    var p = off
    var i = 0
    while (i < count) {
      out(i) = t match {
        case NcByte => bytes(p).toDouble
        case NcChar => java.lang.Byte.toUnsignedInt(bytes(p)).toDouble
        case NcShort => bb.getShort(p).toDouble
        case NcInt => bb.getInt(p).toDouble
        case NcFloat => bb.getFloat(p).toDouble
        case NcDouble => bb.getDouble(p)
      }
      p += ts
      i += 1
    }
    out
  }

  def read(path: String): Nc3File = {
    val h = readHeader(path)
    val bytes = Files.readAllBytes(Paths.get(path))

    def decode(t: Int, at: Long, count: Int): Array[Double] =
      decodeValues(t, bytes, at.toInt, count)

    val vars = h.varms.map { rv =>
      if (!h.isRecordVar(rv)) {
        val count = rv.dimIds.map(d => h.dims(d).length.toLong).product.toInt
        Var(rv.name, rv.dimIds, rv.atts, rv.ncType, decode(rv.ncType, rv.begin, count))
      } else {
        val perRec = rv.dimIds.drop(1).map(d => h.dims(d).length.toLong).product.toInt
        val out = new Array[Double](perRec * h.numrecs)
        var r = 0
        while (r < h.numrecs) {
          val slab = decode(rv.ncType, rv.begin + r * h.recSize, perRec)
          System.arraycopy(slab, 0, out, r * perRec, perRec)
          r += 1
        }
        Var(rv.name, rv.dimIds, rv.atts, rv.ncType, out)
      }
    }
    Nc3File(h.dims, h.gatts, vars)
  }

  // ---------------------------------------------------------------- writer

  /** Header bytes + per-variable data begin offsets for a fixed-var CDF-1
    * file. Callers that stream huge variables (e.g. the ScaleBench 38M-px
    * ingest fixture) write this header then append each variable's values
    * at its begin offset, without ever holding the data in memory —
    * `write` below is the convenience all-in-memory form. `vars` data
    * arrays are ignored here; sizes come from the dims.
    */
  def headerAndOffsets(dims: Seq[Dim], gatts: Seq[Att],
      vars: Seq[Var]): (Array[Byte], Seq[Long]) = {
    require(dims.forall(!_.isRecord), "Nc3 writer: record dimension unsupported")

    def nameBytes(s: String): Array[Byte] = {
      val b = s.getBytes("UTF-8")
      val out = new Array[Byte](4 + pad4(b.length).toInt)
      ByteBuffer.wrap(out).putInt(b.length).put(b)
      out
    }

    def attBytes(a: Att): Array[Byte] = {
      val vals: Array[Byte] = a.value match {
        case Left(s) =>
          val b = s.getBytes("UTF-8")
          java.util.Arrays.copyOf(b, pad4(b.length).toInt)
        case Right(ds) =>
          val ts = typeSize(a.ncType)
          val out = new Array[Byte](pad4(ds.length.toLong * ts).toInt)
          val vb = ByteBuffer.wrap(out)
          ds.foreach { d =>
            a.ncType match {
              case NcByte => vb.put(d.toByte)
              case NcShort => vb.putShort(d.toShort)
              case NcInt => vb.putInt(d.toInt)
              case NcFloat => vb.putFloat(d.toFloat)
              case NcDouble => vb.putDouble(d)
              case t => sys.error(s"attr type $t")
            }
          }
          out
      }
      val count = a.value match {
        case Left(s) => s.getBytes("UTF-8").length
        case Right(ds) => ds.length
      }
      val head = ByteBuffer.allocate(8).putInt(a.ncType).putInt(count).array()
      nameBytes(a.name) ++ head ++ vals
    }

    def attList(atts: Seq[Att]): Array[Byte] =
      if (atts.isEmpty) Array.fill[Byte](8)(0)
      else ByteBuffer.allocate(8).putInt(12).putInt(atts.length).array() ++
        atts.flatMap(attBytes)

    def varHeader(v: Var, begin: Long): Array[Byte] = {
      val nelems = v.dimIds.map(d => dims(d).length.toLong).product
      val vsize = pad4(nelems * typeSize(v.ncType))
      val dimsB = ByteBuffer.allocate(4 + 4 * v.dimIds.length)
      dimsB.putInt(v.dimIds.length)
      v.dimIds.foreach(dimsB.putInt)
      val tail = ByteBuffer.allocate(12).putInt(v.ncType).putInt(vsize.toInt)
        .putInt(begin.toInt).array()
      nameBytes(v.name) ++ dimsB.array() ++ attList(v.atts) ++ tail
    }

    // header with zeroed begins to learn its size, then real offsets
    def header(begins: Seq[Long]): Array[Byte] = {
      val out = new ArrayBuffer[Byte]()
      out ++= Array[Byte]('C', 'D', 'F', 1)
      out ++= ByteBuffer.allocate(4).putInt(0).array() // numrecs
      if (dims.isEmpty) out ++= Array.fill[Byte](8)(0)
      else {
        out ++= ByteBuffer.allocate(8).putInt(10).putInt(dims.length).array()
        dims.foreach { d =>
          out ++= nameBytes(d.name)
          out ++= ByteBuffer.allocate(4).putInt(d.length).array()
        }
      }
      out ++= attList(gatts)
      if (vars.isEmpty) out ++= Array.fill[Byte](8)(0)
      else {
        out ++= ByteBuffer.allocate(8).putInt(11).putInt(vars.length).array()
        vars.zip(begins).foreach { case (v, b) => out ++= varHeader(v, b) }
      }
      out.toArray
    }

    val headerSize = header(vars.map(_ => 0L)).length.toLong
    val sizes = vars.map { v =>
      pad4(v.dimIds.map(d => dims(d).length.toLong).product * typeSize(v.ncType))
    }
    val begins = sizes.scanLeft(headerSize)(_ + _).init
    (header(begins), begins)
  }

  /** Write a CDF-1 classic file with fixed-size variables only (fixture /
    * export sink; record dims not needed for LUTs or materialized scenes).
    * Numeric data is written as the variable's declared `ncType`.
    */
  def write(path: String, dims: Seq[Dim], gatts: Seq[Att], vars: Seq[Var]): Unit = {
    Option(Paths.get(path).getParent).foreach(Files.createDirectories(_))
    val (hdr, _) = headerAndOffsets(dims, gatts, vars)
    val sizes = vars.map { v =>
      pad4(v.dimIds.map(d => dims(d).length.toLong).product * typeSize(v.ncType))
    }
    val total = hdr.length.toLong + sizes.sum
    val bb = ByteBuffer.allocate(total.toInt)
    bb.put(hdr)
    vars.foreach { v =>
      val start = bb.position()
      v.data.foreach { d =>
        v.ncType match {
          case NcByte | NcChar => bb.put(d.toByte)
          case NcShort => bb.putShort(d.toShort)
          case NcInt => bb.putInt(d.toInt)
          case NcFloat => bb.putFloat(d.toFloat)
          case NcDouble => bb.putDouble(d)
          case t => sys.error(s"var type $t")
        }
      }
      bb.position(start + pad4(v.data.length.toLong * typeSize(v.ncType)).toInt)
    }
    Files.write(Paths.get(path), bb.array())
  }
}
