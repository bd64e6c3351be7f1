package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import graft.models.Lut

/** S4 — CMOD7 Fortran binary ingest (windspeed/cmod7.py:19-75 behavior):
  * `gmf_cmod7_vv.dat_little_endian` is a little-endian float32 stream with a
  * 4-byte Fortran record head and tail to strip, holding a column-major
  * (Fortran-ordered) m×n×p = 250×73×51 table over dims (wspd, phi,
  * incidence); axes wspd 0.2..50 step 0.2, phi 0..180 step 2.5, incidence
  * 16..66 step 1; values are LINEAR sigma0.
  *
  * Output is the in-memory [[graft.models.Lut]] in its canonical
  * (incidence, wspd, phi) row-major layout — ready for
  * [[graft.models.LutIO]] Parquet write or broadcast inversion.
  */
object Cmod7Dat {

  val NWspd = 250
  val NPhi = 73
  val NInc = 51

  private def axis(from: Double, step: Double, n: Int): Array[Double] =
    Array.tabulate(n)(i => from + i * step)

  def read(datPath: String): Lut = {
    val bytes = Files.readAllBytes(Paths.get(datPath))
    val total = NWspd * NPhi * NInc
    require(bytes.length == 4 * (total + 2),
      s"$datPath: expected ${4 * (total + 2)} bytes (head + $total floats + tail), got ${bytes.length}")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    bb.position(4) // strip the Fortran record head; tail is simply not read
    val raw = new Array[Float](total)
    var i = 0
    while (i < total) { raw(i) = bb.getFloat; i += 1 }

    val inc = axis(16.0, 1.0, NInc)
    val wspd = axis(0.2, 0.2, NWspd)
    val phi = axis(0.0, 2.5, NPhi)
    // Fortran order over (wspd, phi, inc): element (w, f, c) lives at
    // w + NWspd*(f + NPhi*c); canonical layout wants ((c*NWspd + w)*NPhi + f)
    val values = new Array[Double](total)
    var c = 0
    while (c < NInc) {
      var w = 0
      while (w < NWspd) {
        var f = 0
        while (f < NPhi) {
          values((c * NWspd + w) * NPhi + f) =
            raw(w + NWspd * (f + NPhi * c)).toDouble
          f += 1
        }
        w += 1
      }
      c += 1
    }
    Lut(inc, wspd, phi, values, units = "linear")
  }

  /** Test-fixture writer: wrap a float table back into the Fortran-record
    * little-endian layout (head/tail are record-length markers). */
  def writeFixture(datPath: String, fortranOrderedFloats: Array[Float]): Unit = {
    val bb = ByteBuffer.allocate(4 * (fortranOrderedFloats.length + 2))
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4 * fortranOrderedFloats.length)
    fortranOrderedFloats.foreach(bb.putFloat)
    bb.putInt(4 * fortranOrderedFloats.length)
    Files.write(Paths.get(datPath), bb.array())
  }
}
