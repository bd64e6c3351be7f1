package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GmfColumns
import graft.operators.{Detrend, Directions}
import QueryDef._

/** Geophysical operator surface (SURVEY.md §2.2-§2.5) exercised over the
  * deterministic lineitem-derived scene (SceneDef). Outputs are emitted in
  * dB / rounded so Spark-vs-DuckDB libm ULP differences can't flip hashes.
  */
object Geo {

  private def sceneCte: String = s"scene AS (\n${SceneDef.sceneSql}\n)"

  /** q10: CMOD5N copol GMF evaluated per pixel as a codegen'd expression. */
  def q10Cmod5n(spark: SparkSession, sfDir: String): DataFrame = {
    // per-pixel expression work — spread the single-split cached scene
    // across cores (no-op when the input already has enough partitions)
    val sc = graft.core.Plans.ensureMinPartitions(
      SceneDef.scene(spark, sfDir), spark.sparkContext.defaultParallelism)
    sc.select(
      col("okey"), col("lnum"),
      r6(Directions.toDb(GmfColumns.cmod5n(col("incidence"), col("wspd"), col("phi"))))
        .as("sigma0_db"))
  }

  val q10Sql: String = {
    val gmf = GmfColumns.cmod5nSql("(SELECT okey, lnum, incidence, wspd, phi FROM scene) s0",
      Seq("okey", "lnum"))
    s"""WITH $sceneCte
       |SELECT okey, lnum, ROUND(10.0 * LOG10(sigma0_gmf + 1e-15), 6) AS sigma0_db
       |FROM ($gmf) g""".stripMargin
  }

  /** q11: VH (crosspol) GMFs — sigmoid-blend family + the dummy power law. */
  def q11VhGmfs(spark: SparkSession, sfDir: String): DataFrame = {
    // per-pixel expression work — spread the single-split cached scene
    // across cores (no-op when the input already has enough partitions)
    val sc = graft.core.Plans.ensureMinPartitions(
      SceneDef.scene(spark, sfDir), spark.sparkContext.defaultParallelism)
    sc.select(
      col("okey"), col("lnum"),
      r6(Directions.toDb(GmfColumns.s1V2(col("incidence"), col("wspd_vh")))).as("s1_v2_db"),
      r6(Directions.toDb(GmfColumns.dummy(col("incidence"), col("wspd_vh")))).as("dummy_db"))
  }

  val q11Sql: String =
    s"""WITH $sceneCte
       |SELECT okey, lnum,
       |  ROUND(10.0 * LOG10(${GmfColumns.s1V2Sql("incidence", "wspd_vh")} + 1e-15), 6) AS s1_v2_db,
       |  ROUND(10.0 * LOG10(${GmfColumns.dummySql("incidence", "wspd_vh")} + 1e-15), 6) AS dummy_db
       |FROM scene""".stripMargin

  /** q12: direction-convention conversions E1-E6 (detrend.py:96-201). */
  def q12Directions(spark: SparkSession, sfDir: String): DataFrame = {
    // per-pixel expression work — spread the single-split cached scene
    // across cores (no-op when the input already has enough partitions)
    val sc = graft.core.Plans.ensureMinPartitions(
      SceneDef.scene(spark, sfDir), spark.sparkContext.defaultParallelism)
    val dirMeteo = (col("okey") % 360).cast("double")
    sc.select(
      col("okey"), col("lnum"),
      r6(Directions.meteoToSample(dirMeteo, col("ground_heading"))).as("dir_sample"),
      r6(Directions.meteoToOceano(dirMeteo)).as("dir_oceano"),
      r6(Directions.oceanoToMeteo(dirMeteo)).as("dir_meteo_back"),
      r6(Directions.dirTo180(dirMeteo * lit(1.7))).as("dir_180"),
      r6(Directions.dirTo360(dirMeteo - lit(270.0))).as("dir_360"))
  }

  val q12Sql: String =
    s"""WITH $sceneCte
       |SELECT okey, lnum,
       |  ROUND(PI()/2 - RADIANS((okey % 360) - ground_heading), 6) AS dir_sample,
       |  ROUND(((((okey % 360) + 180e0) % 360e0) + 360e0) % 360e0, 6) AS dir_oceano,
       |  ROUND(((((okey % 360) - 180e0) % 360e0) + 360e0) % 360e0, 6) AS dir_meteo_back,
       |  ROUND((((((okey % 360) * 1.7e0 + 180e0) % 360e0) + 360e0) % 360e0) - 180e0, 6) AS dir_180,
       |  ROUND(((((okey % 360) - 270e0 + 360e0) % 360e0) + 360e0) % 360e0, 6) AS dir_360
       |FROM scene""".stripMargin

  /** q13: the full sigma0_detrend pipeline (detrend.py:9-68). */
  def q13Detrend(spark: SparkSession, sfDir: String): DataFrame = {
    val sc = SceneDef.scene(spark, sfDir)
    Detrend.sigma0Detrend(sc, GmfColumns.cmod5n)
      .select(col("okey"), col("lnum"), col("line"), col("sample"),
        round(col("sigma0_detrend"), 8).as("sigma0_detrend"))
  }

  val q13Sql: String = {
    val gmf = GmfColumns.cmod5nSql(
      "(SELECT sample, incidence, 10.0 AS wspd, 45.0 AS phi FROM prof0) ps", Seq("sample"))
    s"""WITH $sceneCte,
       |prof0 AS (
       |  SELECT DISTINCT sample, incidence FROM scene
       |  WHERE line = (SELECT MIN(line) FROM scene)
       |),
       |prof AS ($gmf),
       |ratio AS (
       |  SELECT sample AS r_sample,
       |         sigma0_gmf / (SELECT AVG(sigma0_gmf) FROM prof) AS ratio
       |  FROM prof
       |)
       |SELECT s.okey, s.lnum, s.line, s.sample,
       |       ROUND(s.sigma0 / r.ratio, 8) AS sigma0_detrend
       |FROM scene s JOIN ratio r ON s.sample = r.r_sample""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q10_gmf_cmod5n", q10Cmod5n, Some(q10Sql)),
    QueryDef("q11_gmf_vh", q11VhGmfs, Some(q11Sql)),
    QueryDef("q12_directions", q12Directions, Some(q12Sql)),
    QueryDef("q13_detrend", q13Detrend, Some(q13Sql)))
}
