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
    // the forward-model GMF below runs BEFORE the dedup shuffle — spread
    // the single-split cached scene so it isn't single-core (the kernel
    // itself already parallelizes inside Inversion.invert)
    val sc = graft.core.Plans.ensureMinPartitions(
      SceneDef.scene(spark, sfDir), spark.sparkContext.defaultParallelism)
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

  /** q16: dual-pol inversion — copol cost + phi-ambiguity + crosspol
    * refinement + blend (windspeed.py:183-282, 424-428), on a deterministic
    * 1/50 pixel subset so the DuckDB oracle (a full relational re-expression
    * of the kernel over the 930k-cell LUT) stays tractable. Full-scene
    * throughput is covered by q15 and ScaleBench. Direction is emitted
    * mod 360 (±180° is the same heading — the phi=180 ambiguity tie is
    * ULP-sensitive in sign only).
    */
  def q16InvertDualpol(spark: SparkSession, sfDir: String): DataFrame = {
    val sc = SceneDef.scene(spark, sfDir).filter(col("okey") % 50 === 0)
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
      .distinct()
    val out = Inversion.invert(px, luts)
    Inversion.dualpolBlend(out.toDF())
      .select(col("okey"), col("lnum"),
        round(col("wspd"), 4).as("wspd"),
        round(pmod(degrees(col("dir_rad")), lit(360.0)), 4).as("dir_deg"))
  }

  val q16Sql: String = {
    // low-res copol LUT grid (51×250×73, models.py:42-44) with the CMOD5N
    // pipeline; w_axis carried alongside (cmod5Sql consumes `wspd` internally)
    val coGrid =
      s"""(SELECT ia.v AS incidence, wa.v AS w_axis, wa.v AS wspd, pa.v AS phi
         | FROM (SELECT 16e0 + (66e0 - 16e0) * i / 50e0 AS v FROM range(0, 51) t(i)) ia
         | CROSS JOIN (SELECT 2e-1 + (50e0 - 2e-1) * k / 249e0 AS v FROM range(0, 250) t(k)) wa
         | CROSS JOIN (SELECT 0e0 + (180e0 - 0e0) * p / 72e0 AS v FROM range(0, 73) t(p)) pa) cg""".stripMargin
    val coLut = GmfColumns.cmod5nSql(coGrid, Seq("incidence", "w_axis", "phi"))
    // observation pipeline carries everything px needs — computed inline per
    // row (a join back on (okey, lnum) would cross-multiply duplicate keys)
    val obsCo = GmfColumns.cmod5nSql(
      "(SELECT okey, lnum, incidence, wspd, wspd AS w_obs, phi FROM sc) so",
      Seq("okey", "lnum", "incidence", "w_obs", "phi"))
    val obsCr = GmfColumns.s1V2Sql("incidence", "w_obs")
    s"""WITH scene AS (
       |${SceneDef.sceneSql}
       |),
       |sc AS (SELECT * FROM scene WHERE okey % 50 = 0),
       |obs AS ($obsCo),
       |px AS (
       |  SELECT DISTINCT okey, lnum, incidence,
       |    16e0 + ROUND(incidence - 16e0) AS inc_near,
       |    10e0 * LOG10(sigma0_gmf + 1e-15) AS s0co,
       |    10e0 * LOG10($obsCr + 1e-15) AS s0cr,
       |    w_obs * COS(RADIANS(phi)) AS anc_re,
       |    w_obs * SIN(RADIANS(phi)) AS anc_im
       |  FROM obs
       |),
       |colut AS (
       |  SELECT incidence AS linc, w_axis AS w, phi AS lphi,
       |         10e0 * LOG10(sigma0_gmf + 1e-15) AS lutdb,
       |         COS(RADIANS(phi)) AS cp, SIN(RADIANS(phi)) AS sp
       |  FROM ($coLut) cl
       |),
       |co AS (
       |  SELECT okey, lnum, inc_near, s0co, s0cr, anc_re, anc_im,
       |         w AS wspd_co, lphi AS phi_co
       |  FROM (
       |    SELECT p.*, l.w, l.lphi,
       |      ((l.w * l.cp - p.anc_re) / 2e0) * ((l.w * l.cp - p.anc_re) / 2e0)
       |        + ((l.w * l.sp - ABS(p.anc_im)) / 2e0) * ((l.w * l.sp - ABS(p.anc_im)) / 2e0)
       |        + ((l.lutdb - p.s0co) / 1e-1) * ((l.lutdb - p.s0co) / 1e-1) AS j
       |    FROM px p JOIN colut l ON l.linc = p.inc_near
       |  ) cc
       |  QUALIFY ROW_NUMBER() OVER (
       |    PARTITION BY okey, lnum, s0co, s0cr, anc_re ORDER BY j, w, lphi) = 1
       |),
       |sel AS (
       |  SELECT *, sre AS co_re,
       |    CASE WHEN ABS(ATAN2(anc_im * sre - anc_re * sim, anc_re * sre + anc_im * sim))
       |           <= ABS(ATAN2(anc_im * sre + anc_re * sim, anc_re * sre - anc_im * sim))
       |         THEN sim ELSE -sim END AS co_im
       |  FROM (
       |    SELECT *, wspd_co * COS(RADIANS(phi_co)) AS sre,
       |              wspd_co * SIN(RADIANS(phi_co)) AS sim
       |    FROM co
       |  ) amb
       |),
       |crlut AS (
       |  SELECT linc, w, 10e0 * LOG10(${GmfColumns.s1V2Sql("linc", "w")} + 1e-15) AS lutdb
       |  FROM (
       |    SELECT 16e0 + (66e0 - 16e0) * i / 50e0 AS linc, 3e0 + (80e0 - 3e0) * k / 385e0 AS w
       |    FROM range(0, 51) t1(i) CROSS JOIN range(0, 386) t2(k)
       |  ) g
       |),
       |cr AS (
       |  SELECT okey, lnum, s0co, s0cr, anc_re, wspd_co, co_re, co_im, w AS wspd_dual
       |  FROM (
       |    SELECT s.*, l.w,
       |      ((l.lutdb - s.s0cr) / 1e-1) * ((l.lutdb - s.s0cr) / 1e-1)
       |        + ((l.w - s.wspd_co) / 2e0) * ((l.w - s.wspd_co) / 2e0) AS j
       |    FROM sel s JOIN crlut l ON l.linc = s.inc_near
       |  ) cc
       |  QUALIFY ROW_NUMBER() OVER (
       |    PARTITION BY okey, lnum, s0co, s0cr, anc_re ORDER BY j, w) = 1
       |)
       |SELECT okey, lnum,
       |  ROUND(CASE WHEN wspd_co < 5e0 OR wspd_dual < 5e0 THEN wspd_co ELSE wspd_dual END, 4) AS wspd,
       |  ROUND((((DEGREES(CASE WHEN wspd_co < 5e0 OR wspd_dual < 5e0
       |                        THEN ATAN2(co_im, co_re)
       |                        ELSE ATAN2(wspd_dual * SIN(ATAN2(co_im, co_re)),
       |                                   wspd_dual * COS(ATAN2(co_im, co_re))) END)
       |           % 360e0) + 360e0) % 360e0), 4) AS dir_deg
       |FROM cr""".stripMargin
  }

  /** q17: model catalog browsing surface (M9, models.py:453-507) — driver-
    * side registry exposed as a DataFrame. The oracle is a VALUES literal
    * generated from the SAME registry (no query mutates it, so query-time
    * and dump-time state agree) — upgrading q17 from the driver's weaker
    * rows-only check to a full schema+hash gate. */
  def q17ModelCatalog(spark: SparkSession, sfDir: String): DataFrame =
    graft.models.ModelRegistry.availableModels(spark)

  lazy val q17Sql: String = {
    val vals = graft.models.ModelRegistry.all.map { m =>
      s"('${m.shortName}', '${m.name}', '${m.pol}', '${m.units}', " +
        s"${if (m.hasPhi) "TRUE" else "FALSE"}, " +
        s"${m.incRange._1}e0, ${m.incRange._2}e0, ${m.wspdRange._1}e0, ${m.wspdRange._2}e0)"
    }.mkString(", ")
    "SELECT * FROM (VALUES " + vals +
      ") AS t(alias, name, pol, units, has_phi, inc_min, inc_max, wspd_min, wspd_max)"
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q14_nesz_flat", q14NeszFlat, Some(q14Sql)),
    QueryDef("q15_invert_crosspol", q15InvertCrosspol, Some(q15Sql)),
    QueryDef("q16_invert_dualpol", q16InvertDualpol, Some(q16Sql)),
    QueryDef("q17_model_catalog", q17ModelCatalog, Some(q17Sql)))
}
