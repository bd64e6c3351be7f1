package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

/** Minimal NumPy `.npy` reader/writer (format spec: numpy NEP-1 / public
  * `numpy.lib.format` docs) — the S5 ingest path for the reference's
  * sarwing pickle LUT directories (windspeed/pickle_luts.py:20-133:
  * `sigma.npy` + axis files).
  *
  * Supported dtypes: little-endian float32/float64 (`<f4`/`<f8`) and
  * int32/int64 (`<i4`/`<i8`), C or Fortran order, format versions 1.x/2.x.
  * All values are widened to Double. The reference's axis `.pkl` files load
  * via the narrow [[Pickle]] reader (numpy-array pickles only).
  */
object Npy {

  final case class NpyArray(shape: Array[Int], fortranOrder: Boolean, data: Array[Double]) {
    def size: Int = data.length

    /** Value at a multi-index, regardless of storage order (Fortran =
      * column-major, first axis fastest; C = row-major, last axis fastest). */
    def at(idx: Array[Int]): Double = {
      require(idx.length == shape.length, "rank mismatch")
      var off = 0
      var stride = 1
      if (fortranOrder) {
        var d = 0
        while (d < shape.length) {
          off += idx(d) * stride
          stride *= shape(d)
          d += 1
        }
      } else {
        var d = shape.length - 1
        while (d >= 0) {
          off += idx(d) * stride
          stride *= shape(d)
          d -= 1
        }
      }
      data(off)
    }
  }

  private val Magic: Array[Byte] = Array(0x93.toByte, 'N', 'U', 'M', 'P', 'Y')

  def read(path: String): NpyArray = {
    val bytes = Files.readAllBytes(Paths.get(path))
    require(bytes.length > 10 && bytes.take(6).sameElements(Magic), s"$path: not an npy file")
    val major = bytes(6)
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val (headerLen, headerStart) =
      if (major == 1) (java.lang.Short.toUnsignedInt(bb.getShort(8)), 10)
      else (bb.getInt(8), 12) // v2.x: 4-byte header length
    val header = new String(bytes, headerStart, headerLen, "ISO-8859-1")
    val descr = "'descr'\\s*:\\s*'([^']+)'".r.findFirstMatchIn(header)
      .getOrElse(sys.error(s"$path: no descr in npy header")).group(1)
    val fortran = "'fortran_order'\\s*:\\s*(True|False)".r.findFirstMatchIn(header)
      .getOrElse(sys.error(s"$path: no fortran_order")).group(1) == "True"
    val shapeStr = "'shape'\\s*:\\s*\\(([^)]*)\\)".r.findFirstMatchIn(header)
      .getOrElse(sys.error(s"$path: no shape")).group(1)
    val shape = shapeStr.split(",").map(_.trim).filter(_.nonEmpty).map(_.toInt)
    val n = if (shape.isEmpty) 1 else shape.product
    val dataStart = headerStart + headerLen
    bb.position(dataStart)
    val out = new Array[Double](n)
    descr match {
      case "<f8" | "=f8" => var i = 0; while (i < n) { out(i) = bb.getDouble; i += 1 }
      case "<f4" | "=f4" => var i = 0; while (i < n) { out(i) = bb.getFloat.toDouble; i += 1 }
      case "<i8" | "=i8" => var i = 0; while (i < n) { out(i) = bb.getLong.toDouble; i += 1 }
      case "<i4" | "=i4" => var i = 0; while (i < n) { out(i) = bb.getInt.toDouble; i += 1 }
      case d => sys.error(s"$path: unsupported npy dtype $d (little-endian f4/f8/i4/i8 only)")
    }
    NpyArray(shape, fortran, out)
  }

  /** Write a C-order float64 `.npy` (v1.0) — test-fixture / export helper. */
  def write(path: String, shape: Array[Int], data: Array[Double]): Unit = {
    require(shape.product == data.length, "shape/data mismatch")
    val shapeTxt = if (shape.length == 1) s"(${shape(0)},)" else shape.mkString("(", ", ", ")")
    val dict = s"{'descr': '<f8', 'fortran_order': False, 'shape': $shapeTxt, }"
    val pad = 64 - ((10 + dict.length + 1) % 64) // newline-terminated, 64-aligned
    val header = dict + (" " * pad) + "\n"
    val bb = ByteBuffer.allocate(10 + header.length + 8 * data.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.put(Magic).put(1.toByte).put(0.toByte).putShort(header.length.toShort)
    bb.put(header.getBytes("ISO-8859-1"))
    data.foreach(bb.putDouble)
    Files.write(Paths.get(path), bb.array())
  }
}
