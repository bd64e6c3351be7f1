package graft.sources

import java.io.File

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.types._

import graft.core.GraftSession

/** S1 — scene ingest: netCDF-3 classic OWI scene file → long-format Parquet
  * scene, with `read_sarwing_owi` semantics (detrend.py:71-93):
  *
  *  - dims `owiAzSize`/`owiRaSize` rename to `line`/`sample` (already-named
  *    `line`/`sample` pass through);
  *  - calibration-constant vars `owiCalConstObsi`/`owiCalConstInci` drop;
  *  - coords become dense 0-based integer indexes.
  *
  * Every (line, sample)-shaped variable becomes a column of the output; the
  * result is the engine's canonical scene table (same shape as
  * [[graft.queries.SceneDef]]).
  *
  * Scale shape: the DRIVER parses only the few-KB header; every executor
  * partition then reads its own pixel span's byte ranges for each variable
  * straight from the file (fixed vars are contiguous slabs; record vars are
  * per-row slabs at `begin + line*recSize`). Driver memory is O(header),
  * executor memory is O(pixels-per-partition × vars) — nothing scales with
  * the whole scene, so a 38M-px × 10-var scene ingests with a flat driver
  * heap. The file path must be visible from executors (local[n] or shared
  * storage — where a real Spark cluster keeps scene files anyway).
  */
object SceneIngest {

  private val DimRename = Map("owiAzSize" -> "line", "owiRaSize" -> "sample")
  private val DropVars = Set("owiCalConstObsi", "owiCalConstInci")

  /** Max pixels per ingest partition: bounds executor slab memory at
    * ~`2M × nVars × 8B` (≈160 MB at 10 vars) while keeping per-partition
    * reads large enough to be sequential-ish. */
  private val PxPerPartition = 2000000L

  def readOwi(spark: SparkSession, ncPath: String): DataFrame = {
    val h = Nc3.readHeader(ncPath)
    def dimName(id: Int): String = {
      val n = h.dims(id).name
      DimRename.getOrElse(n, n)
    }
    val gridVars = h.varms.filter { v =>
      !DropVars(v.name) && v.dimIds.length == 2 &&
        v.dimIds.map(dimName) == Seq("line", "sample")
    }
    require(gridVars.nonEmpty, s"$ncPath: no (line, sample) variables found")
    val lineDim = h.dims(gridVars.head.dimIds(0))
    val nL = if (lineDim.isRecord) h.numrecs else lineDim.length
    val nS = h.dims(gridVars.head.dimIds(1)).length

    val names = gridVars.map(_.name)
    val schema = StructType(
      StructField("line", IntegerType, nullable = false) +:
      StructField("sample", IntegerType, nullable = false) +:
      names.map(n => StructField(n, DoubleType, nullable = false)))
    val nVars = names.length
    // serializable per-var read recipe: (ncType, begin, record-layout?)
    val metas = gridVars.map(v => (v.ncType, v.begin, h.isRecordVar(v))).toArray
    val recSize = h.recSize
    val nPx = nL.toLong * nS
    val nParts = math.max(spark.sparkContext.defaultParallelism.toLong,
      (nPx + PxPerPartition - 1) / PxPerPartition).toInt

    spark.range(0, nPx, 1, nParts).mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else {
        // spark.range partitions are contiguous id spans; buffer the span,
        // bulk-read each variable's covering byte range, then emit rows
        val ids = it.map(_.toLong).toArray
        val lo = ids.head
        val hi = ids.last
        val count = (hi - lo + 1).toInt
        val raf = new java.io.RandomAccessFile(ncPath, "r")
        val planes = try {
          metas.map { case (t, begin, isRec) =>
            val ts = Nc3.typeSize(t)
            if (!isRec) {
              val buf = new Array[Byte](count * ts)
              raf.seek(begin + lo * ts)
              raf.readFully(buf)
              Nc3.decodeValues(t, buf, 0, count)
            } else {
              // record layout: line l's row slab starts at begin + l*recSize
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
                System.arraycopy(Nc3.decodeValues(t, buf, 0, n), 0, out, (rowLo - lo).toInt, n)
                l += 1
              }
              out
            }
          }
        } finally raf.close()
        ids.iterator.map { id =>
          val off = (id - lo).toInt
          val vals = new Array[Any](nVars + 2)
          vals(0) = (id / nS).toInt
          vals(1) = (id % nS).toInt
          var v = 0
          while (v < nVars) { vals(v + 2) = planes(v)(off); v += 1 }
          Row.fromSeq(vals.toIndexedSeq)
        }
      }
    }(RowEncoder.encoderFor(schema))
  }

  /** netCDF-4/HDF5 OWI scene → the same canonical pixel table as [[readOwi]]
    * — the reference's real open path (`xr.open_dataset(owi_file,
    * group="owiInversionTables_UV")`, detrend.py:76-79; the actual
    * Sentinel-1 OWI files are HDF5 containers, not classic CDF). Same scale
    * shape: the driver walks only the metadata (object headers + chunk
    * B-trees — O(chunks) entries); executors read and de-filter exactly the
    * chunks/byte-ranges overlapping their pixel span.
    */
  def readOwiH5(spark: SparkSession, h5Path: String,
      group: String = "owiInversionTables_UV"): DataFrame = {
    val metas = Hdf5.openGroup(h5Path, group)
    val gridVars = metas.filter(m => !DropVars(m.name) && m.rank == 2)
    require(gridVars.nonEmpty, s"$h5Path: no 2-D variables in group '$group'")
    val nL = gridVars.head.dims(0).toInt
    val nS = gridVars.head.dims(1).toInt
    require(gridVars.forall(_.dims.sameElements(Array(nL.toLong, nS.toLong))),
      s"$h5Path: inconsistent grid shapes: ${gridVars.map(v => v.name -> v.dims.toSeq)}")

    // serializable per-var recipe: chunk lists are walked ONCE on the driver
    val recipes: Array[(Hdf5.DsetMeta, Array[Hdf5.ChunkRef])] = gridVars.map { m =>
      (m, Hdf5.chunkIndex(h5Path, m).toArray)
    }.toArray
    val names = gridVars.map(_.name)
    val schema = StructType(
      StructField("line", IntegerType, nullable = false) +:
      StructField("sample", IntegerType, nullable = false) +:
      names.map(n => StructField(n, DoubleType, nullable = false)))
    val nVars = names.length
    val nPx = nL.toLong * nS
    val nParts = math.max(spark.sparkContext.defaultParallelism.toLong,
      (nPx + PxPerPartition - 1) / PxPerPartition).toInt

    spark.range(0, nPx, 1, nParts).mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else {
        val ids = it.map(_.toLong).toArray
        val lo = ids.head
        val hi = ids.last
        val count = (hi - lo + 1).toInt
        val raf = new java.io.RandomAccessFile(h5Path, "r")
        val planes = try {
          recipes.map { case (m, chunks) =>
            m.layout match {
              case Hdf5.Contiguous(addr, _) =>
                val buf = new Array[Byte](count * m.dtSize)
                raf.seek(addr + lo * m.dtSize)
                raf.readFully(buf)
                Hdf5.decodeValues(m, buf, 0, count)
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
                    val bytes = Hdf5.defilter(raw, m.filters, m.dtSize, elems * m.dtSize)
                    val vals = Hdf5.decodeValues(m, bytes, 0, elems)
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
        } finally raf.close()
        ids.iterator.map { id =>
          val off = (id - lo).toInt
          val vals = new Array[Any](nVars + 2)
          vals(0) = (id / nS).toInt
          vals(1) = (id % nS).toInt
          var v = 0
          while (v < nVars) { vals(v + 2) = planes(v)(off); v += 1 }
          Row.fromSeq(vals.toIndexedSeq)
        }
      }
    }(RowEncoder.encoderFor(schema))
  }

  /** Sniff classic CDF vs HDF5 by magic bytes — `xr.open_dataset` parity. */
  def readOwiAuto(spark: SparkSession, path: String): DataFrame = {
    val magic = new Array[Byte](8)
    val in = new java.io.FileInputStream(path)
    try in.read(magic) finally in.close()
    if (magic(0) == 0x89.toByte && magic(1) == 'H') readOwiH5(spark, path)
    else readOwi(spark, path)
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: SceneIngest <out-dir> <owi.nc> [more.nc ...]")
    val outDir = args.head
    val spark = GraftSession.getOrCreate(
      master = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]",
      appName = "graft-scene-ingest")
    args.tail.foreach { nc =>
      val name = new File(nc).getName.stripSuffix(".nc")
      readOwiAuto(spark, nc).write.mode("overwrite").parquet(s"$outDir/$name")
      println(s"[scene-ingest] $nc -> $outDir/$name")
    }
    spark.stop()
  }
}
