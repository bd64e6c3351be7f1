package graft.sources

import java.io.RandomAccessFile

/** Serializable per-variable read recipe for one (nL × nS) scene grid:
  * everything an EXECUTOR needs to decode any contiguous pixel-id span
  * `[lo, hi]` (row-major ids, `id = line*nS + sample`) straight from the
  * scene file, with the driver having parsed only the few-KB metadata.
  *
  * Shared by the [[SceneIngest]] mapPartitions ingest and the
  * [[OwiDataSource]] DataSource V2 reader, so both paths decode through
  * one implementation — classic netCDF-3 slabs ([[Nc3Var]]) and HDF5
  * contiguous/chunked+filtered layouts ([[H5Var]]).
  */
sealed trait VarRecipe extends Serializable {
  def name: String

  /** Decode values for pixel ids `[lo, hi]` of a row-major (nL × nS) grid. */
  def readSpan(raf: RandomAccessFile, lo: Long, hi: Long, nL: Int, nS: Int): Array[Double]
}

/** netCDF-3 classic variable: fixed vars are one contiguous slab at `begin`;
  * record vars store line `l`'s row slab at `begin + l*recSize`
  * (spec: detrend.py:71-93 reads these via xarray — here the byte layout
  * comes straight from the public CDF-1/2 format). */
final case class Nc3Var(name: String, ncType: Int, begin: Long, isRec: Boolean,
    recSize: Long) extends VarRecipe {

  def readSpan(raf: RandomAccessFile, lo: Long, hi: Long, nL: Int, nS: Int): Array[Double] = {
    val count = (hi - lo + 1).toInt
    val ts = Nc3.typeSize(ncType)
    if (!isRec) {
      val buf = new Array[Byte](count * ts)
      raf.seek(begin + lo * ts)
      raf.readFully(buf)
      Nc3.decodeValues(ncType, buf, 0, count)
    } else {
      val out = new Array[Double](count)
      var l = (lo / nS).toInt
      val lHi = (hi / nS).toInt
      while (l <= lHi) {
        val rowLo = math.max(lo, l.toLong * nS)
        val rowHi = math.min(hi, l.toLong * nS + nS - 1)
        val n = (rowHi - rowLo + 1).toInt
        val buf = new Array[Byte](n * ts)
        raf.seek(begin + l * recSize + (rowLo - l.toLong * nS) * ts)
        raf.readFully(buf)
        System.arraycopy(Nc3.decodeValues(ncType, buf, 0, n), 0, out, (rowLo - lo).toInt, n)
        l += 1
      }
      out
    }
  }
}

/** HDF5 variable: contiguous layout reads one byte range; chunked layout
  * reads + de-filters exactly the chunks intersecting the span (chunk
  * addresses were walked once on the driver from the v1 chunk B-tree). */
final case class H5Var(meta: Hdf5.DsetMeta, chunks: Array[Hdf5.ChunkRef])
    extends VarRecipe {

  def name: String = meta.name

  def readSpan(raf: RandomAccessFile, lo: Long, hi: Long, nL: Int, nS: Int): Array[Double] = {
    val count = (hi - lo + 1).toInt
    meta.layout match {
      case Hdf5.Contiguous(addr, _) =>
        val buf = new Array[Byte](count * meta.dtSize)
        raf.seek(addr + lo * meta.dtSize)
        raf.readFully(buf)
        Hdf5.decodeValues(meta, buf, 0, count)
      case Hdf5.Chunked(cd, _) =>
        val out = new Array[Double](count)
        val lLo = lo / nS; val lHi = hi / nS
        chunks.foreach { c =>
          val r0 = c.offsets(0); val c0 = c.offsets(1)
          if (r0 <= lHi && r0 + cd(0) > lLo) {
            val raw = new Array[Byte](c.nbytes)
            raf.seek(c.addr)
            raf.readFully(raw)
            val elems = cd(0) * cd(1)
            val bytes = Hdf5.defilter(raw, meta.filters, meta.dtSize, elems * meta.dtSize)
            val vals = Hdf5.decodeValues(meta, bytes, 0, elems)
            // copy each chunk row's intersection with the span
            var r = math.max(r0, lLo)
            val rEnd = math.min(r0 + cd(0) - 1, math.min(lHi, nL - 1L))
            while (r <= rEnd) {
              val rowLo = math.max(lo, r * nS + c0)
              val rowHi = math.min(hi, r * nS + math.min(c0 + cd(1), nS.toLong) - 1)
              if (rowLo <= rowHi) {
                val n = (rowHi - rowLo + 1).toInt
                val src = ((r - r0) * cd(1) + (rowLo - r * nS - c0)).toInt
                System.arraycopy(vals, src, out, (rowLo - lo).toInt, n)
              }
              r += 1
            }
          }
        }
        out
    }
  }
}
