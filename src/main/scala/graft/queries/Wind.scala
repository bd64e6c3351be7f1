package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GmfColumns
import graft.operators.{Directions, Inversion, WindUtils}
import QueryDef._

/** Wind-inversion operator surface (SURVEY.md §2.6-§2.7). */
object Wind {

  private def sceneCte: String = s"scene AS (\n${SceneDef.sceneSql}\n)"

  /** q14: nesz_flattening — per-line polyfit == regr_slope/regr_intercept. */
  def q14NeszFlat(spark: SparkSession, sfDir: String): DataFrame = {
    val sc = SceneDef.scene(spark, sfDir)
    WindUtils.neszFlattening(sc)
      .select(col("okey"), col("lnum"), r6(col("nesz_flat_db")).as("nesz_flat_db"))
  }

  val q14Sql: String =
    s"""WITH $sceneCte,
       |ps AS (
       |  SELECT sample, AVG(nesz) AS noise_mean, AVG(incidence) AS inc_mean
       |  FROM scene GROUP BY sample
       |),
       |fd AS (
       |  SELECT s.okey, s.lnum, s.line, p.inc_mean,
       |         10e0 * LOG10(COALESCE(s.nesz, p.noise_mean)) AS noise_db
       |  FROM scene s JOIN ps p USING (sample)
       |),
       |fit AS (
       |  SELECT line, REGR_SLOPE(noise_db, inc_mean) AS fit_a,
       |         REGR_INTERCEPT(noise_db, inc_mean) AS fit_b
       |  FROM fd GROUP BY line
       |)
       |SELECT f.okey, f.lnum, ROUND(f.inc_mean * t.fit_a + t.fit_b - 1e0, 6) AS nesz_flat_db
       |FROM fd f JOIN fit t USING (line)""".stripMargin

  /** q15: crosspol wind inversion — broadcast-LUT argmin kernel. The input
    * sigma0 is forward-modeled from the scene's wspd_vh, so the inversion
    * recovering it is itself a correctness property; the DuckDB oracle
    * re-expresses the kernel as a cross join + lexicographic arg_min.
    */
  def q15InvertCrosspol(spark: SparkSession, sfDir: String): DataFrame = {
    val sc = SceneDef.scene(spark, sfDir)
    val luts = Inversion.buildLuts(spark, None, Some("gmf_s1_v2"), highRes = true)
    val nan = lit(Double.NaN)
    // (okey, lnum) is not unique in the generated lineitem — dedupe the
    // pixel set so the oracle's per-pixel argmin groups line up 1:1
    val px = sc.select(
      col("okey"), col("lnum"), col("incidence").as("inc"),
      nan.as("s0co_db"),
      Directions.toDb(GmfColumns.s1V2(col("incidence"), col("wspd_vh"))).as("s0cr_db"),
      lit(0.1).as("dsig_cr"), nan.as("anc_re"), nan.as("anc_im"))
      .distinct()
    Inversion.invert(px, luts)
      .select(col("okey"), col("lnum"), round(col("crRe"), 4).as("wspd"))
  }

  val q15Sql: String = {
    // high-res crosspol axes: inc = linspace(16,66,501), wspd = linspace(3,80,771)
    val lutGmf = GmfColumns.s1V2Sql("p.inc_near", "a.w")
    val obsGmf = GmfColumns.s1V2Sql("incidence", "wspd_vh")
    s"""WITH $sceneCte,
       |px AS (
       |  SELECT DISTINCT okey, lnum,
       |    10e0 * LOG10($obsGmf + 1e-15) AS s0db,
       |    16e0 + 50e0 * ROUND((incidence - 16e0) / 1e-1) / 500e0 AS inc_near
       |  FROM scene
       |),
       |axis AS (SELECT 3e0 + 77e0 * k / 770e0 AS w FROM range(0, 771) t(k)),
       |cand AS (
       |  SELECT p.okey, p.lnum, p.s0db, a.w,
       |    POW((10e0 * LOG10($lutGmf + 1e-15) - p.s0db) / 1e-1, 2) AS j
       |  FROM px p CROSS JOIN axis a
       |)
       |SELECT okey, lnum, ROUND(w, 4) AS wspd
       |FROM cand
       |QUALIFY ROW_NUMBER() OVER (PARTITION BY okey, lnum, s0db ORDER BY j, w) = 1""".stripMargin
  }

  /** q16: dual-pol inversion — copol cost + crosspol refinement + blend
    * (windspeed.py:183-282, 424-428). The 930k-cell copol LUT stays a
    * broadcast kernel; no SQL oracle (driver records rows-only) — covered
    * by ForwardModelSpec's invert(forward(w)) ≈ w property instead.
    */
  def q16InvertDualpol(spark: SparkSession, sfDir: String): DataFrame = {
    val sc = SceneDef.scene(spark, sfDir)
    val luts = Inversion.buildLuts(spark, Some("gmf_cmod5n"), Some("gmf_s1_v2"), highRes = false)
    // forward-model both pols from the scene's truth wind (wspd, phi),
    // ancillary = truth components in antenna convention
    val px = sc.select(
      col("okey"), col("lnum"), col("incidence").as("inc"),
      Directions.toDb(GmfColumns.cmod5n(col("incidence"), col("wspd"), col("phi"))).as("s0co_db"),
      Directions.toDb(GmfColumns.s1V2(col("incidence"), col("wspd"))).as("s0cr_db"),
      lit(0.1).as("dsig_cr"),
      (col("wspd") * cos(radians(col("phi")))).as("anc_re"),
      (col("wspd") * sin(radians(col("phi")))).as("anc_im"))
    val out = Inversion.invert(px, luts)
    Inversion.dualpolBlend(out.toDF())
      .select(col("okey"), col("lnum"),
        round(col("wspd"), 4).as("wspd"),
        round(degrees(col("dir_rad")), 4).as("dir_deg"))
  }

  /** q17: model catalog browsing surface (M9, models.py:453-507) — driver-
    * side registry exposed as a DataFrame; no external table → rows-only. */
  def q17ModelCatalog(spark: SparkSession, sfDir: String): DataFrame =
    graft.models.ModelRegistry.availableModels(spark)

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q14_nesz_flat", q14NeszFlat, Some(q14Sql)),
    QueryDef("q15_invert_crosspol", q15InvertCrosspol, Some(q15Sql)),
    QueryDef("q16_invert_dualpol", q16InvertDualpol, None),
    QueryDef("q17_model_catalog", q17ModelCatalog, None))
}
