package graft.models

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Canonical Parquet LUT source/sink (replaces the reference's netCDF /
  * npy+pickle / Fortran-binary LUT files — S2/S4/S5/S6 in SURVEY.md §2.1).
  *
  * Layout per FIXTURES.md §2: long-format rows (incidence, wspd, phi,
  * sigma0) with model metadata carried as constant columns, so a LUT is
  * both a broadcastable kernel input and an ordinary queryable table.
  */
object LutIO {

  /** S6 — materialize a registered model's LUT and write it as Parquet. */
  def writeLut(spark: SparkSession, modelName: String, path: String,
      highRes: Boolean = false): Unit = {
    val m = ModelRegistry.get(modelName)
    writeLutData(spark, m.toLut(highRes), path,
      Map("model" -> m.name, "pol" -> m.pol,
        "resolution" -> (if (highRes) "high" else "low")))
  }

  /** Write a raw in-memory [[Lut]] in the canonical Parquet form — shared by
    * the model export above and the external-format ingests
    * ([[graft.sources.LutIngest]]). `meta` needs model/pol/resolution;
    * units comes from the Lut itself.
    */
  def writeLutData(spark: SparkSession, lut: Lut, path: String,
      meta: Map[String, String]): Unit = {
    val nP = math.max(lut.phi.length, 1)
    val nW = lut.wspd.length
    // rows materialize distributed off a spark.range (a cmod7 LUT is ~1M
    // cells — big enough that a driver-built Seq trips task-size warnings)
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(lut)
    spark.range(lut.values.length.toLong)
      .map { id =>
        val l = bc.value
        val i = (id / (nW * nP)).toInt
        val w = ((id / nP) % nW).toInt
        val p = (id % nP).toInt
        (l.inc(i), l.wspd(w), if (l.hasPhi) Some(l.phi(p)) else None, l.values(id.toInt))
      }
      .toDF("incidence", "wspd", "phi", "sigma0")
      .withColumn("model", lit(meta("model")))
      .withColumn("pol", lit(meta("pol")))
      .withColumn("units", lit(lut.units))
      .withColumn("resolution", lit(meta("resolution")))
      .repartition(1)
      .write.mode("overwrite").parquet(path)
  }

  /** S2 — read a Parquet LUT back into a broadcastable [[Lut]] plus its
    * metadata. Axis order is reconstructed from the sorted distinct values
    * (the reference's dim-order validation, models.py:94-103, is implied by
    * the dense-grid check below).
    */
  def readLut(spark: SparkSession, path: String): (Lut, Map[String, String]) = {
    val df = spark.read.parquet(path)
    // BOUND: 1 metadata row + the dense LUT grid (≤ ~1M cells by the model axes)
    val meta = df.select("model", "pol", "units", "resolution").distinct().collect()
    require(meta.length == 1, s"LUT at $path must carry uniform metadata")
    val m = meta.head
    val rows = df.select("incidence", "wspd", "phi", "sigma0").collect()
    val inc = rows.map(_.getDouble(0)).distinct.sorted
    val wspd = rows.map(_.getDouble(1)).distinct.sorted
    val hasPhi = !rows.head.isNullAt(2)
    val phi = if (hasPhi) rows.map(_.getDouble(2)).distinct.sorted else Array.empty[Double]
    val nP = math.max(phi.length, 1)
    require(rows.length == inc.length * wspd.length * nP, s"LUT at $path is not a dense grid")
    val incIdx = inc.zipWithIndex.toMap
    val wspdIdx = wspd.zipWithIndex.toMap
    val phiIdx = phi.zipWithIndex.toMap
    val values = new Array[Double](rows.length)
    rows.foreach { r =>
      val p = if (hasPhi) phiIdx(r.getDouble(2)) else 0
      values((incIdx(r.getDouble(0)) * wspd.length + wspdIdx(r.getDouble(1))) * nP + p) =
        r.getDouble(3)
    }
    (Lut(inc, wspd, phi, values, m.getString(2)),
      Map("model" -> m.getString(0), "pol" -> m.getString(1),
        "units" -> m.getString(2), "resolution" -> m.getString(3)))
  }

  /** S6 — `Model.to_netcdf` analogue (models.py:232-262): materialize a
    * registered model's LUT and write it as a NetCDF-3 classic file in the
    * reference's nc-LUT layout — var `sigma0_model` over dims
    * (incidence, wspd[, phi]) with coordinate vars, global attrs units/
    * pol/model/resolution + ranges/steps. [[graft.sources.LutIngest]]'s
    * `nc` mode reads these back (roundtrip spec-verified), so LUTs trained
    * here are consumable by the reference's own `register_nc_luts`.
    */
  def writeLutNc(spark: SparkSession, modelName: String, path: String,
      highRes: Boolean = false): Unit = {
    import graft.sources.Nc3
    import graft.sources.Nc3.{Att, Dim, NcChar, NcDouble, Var}
    val m = ModelRegistry.get(modelName)
    val lut = m.toLut(highRes)
    val dims = Seq(Dim("incidence", lut.inc.length), Dim("wspd", lut.wspd.length)) ++
      (if (lut.hasPhi) Seq(Dim("phi", lut.phi.length)) else Nil)
    def dstep(a: Array[Double]): Double = if (a.length > 1) a(1) - a(0) else 0.0
    val gatts = Seq(
      Att("units", NcChar, Left(lut.units)),
      Att("pol", NcChar, Left(m.pol)),
      Att("model", NcChar, Left(m.name)),
      Att("resolution", NcChar, Left(if (highRes) "high" else "low")),
      Att("inc_range", NcDouble, Right(Array(lut.inc.head, lut.inc.last))),
      Att("wspd_range", NcDouble, Right(Array(lut.wspd.head, lut.wspd.last))),
      Att("inc_step", NcDouble, Right(Array(dstep(lut.inc)))),
      Att("wspd_step", NcDouble, Right(Array(dstep(lut.wspd))))) ++
      (if (lut.hasPhi) Seq(
        Att("phi_range", NcDouble, Right(Array(lut.phi.head, lut.phi.last))),
        Att("phi_step", NcDouble, Right(Array(dstep(lut.phi))))) else Nil)
    val coordVars = Seq(
      Var("incidence", Seq(0), Nil, NcDouble, lut.inc),
      Var("wspd", Seq(1), Nil, NcDouble, lut.wspd)) ++
      (if (lut.hasPhi) Seq(Var("phi", Seq(2), Nil, NcDouble, lut.phi)) else Nil)
    val s0 = Var("sigma0_model", dims.indices, Nil, NcDouble, lut.values)
    Nc3.write(path, dims, gatts, coordVars :+ s0)
  }

  /** S2/S3 — register a Parquet LUT directory as a lookup-backed model
    * (nearest-incidence + exact-grid evaluation like LutModel.__call__,
    * models.py:318-347).
    */
  def registerParquetLut(spark: SparkSession, path: String, priority: Int = 10): Model = {
    val (lut, meta) = readLut(spark, path)
    val name = meta("model")
    val fn: (Double, Double, Double) => Double = { (i, w, p) =>
      val ii = Lut.nearestIndex(lut.inc, i)
      val wi = Lut.nearestIndex(lut.wspd, w)
      val pi = if (lut.hasPhi) Lut.nearestIndex(lut.phi, p) else 0
      lut(ii, wi, pi)
    }
    ModelRegistry.register(Model(
      name, meta("pol"), meta("units"), fn, hasPhi = lut.hasPhi,
      incRange = (lut.inc.head, lut.inc.last),
      wspdRange = (lut.wspd.head, lut.wspd.last),
      phiRange = if (lut.hasPhi) (lut.phi.head, lut.phi.last) else (0.0, 180.0),
      priority = priority))
  }
}
