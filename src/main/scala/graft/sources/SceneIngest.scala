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
  * Scale shape: one scene file = one bounded unit (a real OWI scene is
  * O(10⁷) pixels); the pixel table is materialized DISTRIBUTED — a
  * spark.range over pixel ids with the per-variable planes broadcast once —
  * so the driver never holds the row set, only the raw planes it already
  * read (the nc header demands random access, so file decode itself is
  * driver-side — at fleet scale, run one converter per file in parallel).
  */
object SceneIngest {

  private val DimRename = Map("owiAzSize" -> "line", "owiRaSize" -> "sample")
  private val DropVars = Set("owiCalConstObsi", "owiCalConstInci")

  def readOwi(spark: SparkSession, ncPath: String): DataFrame = {
    val nc = Nc3.read(ncPath)
    def dimName(id: Int): String = {
      val n = nc.dims(id).name
      DimRename.getOrElse(n, n)
    }
    val gridVars = nc.vars.filter { v =>
      !DropVars(v.name) && v.dimIds.length == 2 &&
        v.dimIds.map(dimName) == Seq("line", "sample")
    }
    require(gridVars.nonEmpty, s"$ncPath: no (line, sample) variables found")
    val nL = nc.dims(gridVars.head.dimIds(0)).length
    val nS = nc.dims(gridVars.head.dimIds(1)).length
    require(gridVars.forall(v => v.data.length == nL * nS),
      s"$ncPath: inconsistent grid variable sizes")

    val names = gridVars.map(_.name)
    val planes = spark.sparkContext.broadcast(gridVars.map(_.data).toArray)
    val schema = StructType(
      StructField("line", IntegerType, nullable = false) +:
      StructField("sample", IntegerType, nullable = false) +:
      names.map(n => StructField(n, DoubleType, nullable = false)))
    val nVars = names.length
    spark.range(nL.toLong * nS).mapPartitions { it =>
      val pl = planes.value
      it.map { id =>
        val px = id.toInt
        val vals = new Array[Any](nVars + 2)
        vals(0) = px / nS
        vals(1) = px % nS
        var v = 0
        while (v < nVars) { vals(v + 2) = pl(v)(px); v += 1 }
        Row.fromSeq(vals.toIndexedSeq)
      }
    }(RowEncoder.encoderFor(schema))
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: SceneIngest <out-dir> <owi.nc> [more.nc ...]")
    val outDir = args.head
    val spark = GraftSession.getOrCreate(
      master = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]",
      appName = "graft-scene-ingest")
    args.tail.foreach { nc =>
      val name = new File(nc).getName.stripSuffix(".nc")
      readOwi(spark, nc).write.mode("overwrite").parquet(s"$outDir/$name")
      println(s"[scene-ingest] $nc -> $outDir/$name")
    }
    spark.stop()
  }
}
