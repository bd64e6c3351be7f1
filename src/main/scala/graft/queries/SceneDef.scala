package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Deterministic synthetic SAR scene derived from the driver's `lineitem`
  * table (TESTDATA.md — we must consume driver data, not synthesize our own).
  *
  * Layout mirrors FIXTURES.md §1: a (line, sample) pixel grid where
  * incidence varies across samples only (like a real SAR scene — detrend's
  * line-0 profile semantics depend on this, detrend.py:55), plus per-pixel
  * wind-parameter and noise columns. The Scala builder and [[sceneSql]] are
  * kept in exact lockstep: only IEEE-exact +,-,*,/,% arithmetic, so Spark
  * and DuckDB produce bit-identical scenes.
  */
object SceneDef {

  // Grid axes derive from the independently-random partkey/suppkey columns
  // ((orderkey, linenumber) alone has 2 degrees of freedom and linear forms
  // collapse to 1-D orbits): dense coverage of the 48×64 grid is required
  // for the 3×3-stencil operators (q40+) to have full neighborhoods.
  val nLines = 48
  val nSamples = 64

  // One persisted scene per (session, sfDir): the wind/detrend/inversion
  // family (q10-q19) each derive from this same 11-column projection, and
  // several (detrend's profile+mean+apply) scan it more than once per
  // query — the shared-Scharr/shared-shingle pattern applied to the scene.
  // The cached columnar batches serve pruned reads, so narrow queries
  // still read narrow.
  // every query that reads the scene, directly or through a helper — the
  // CacheLife release set (the cache drops once all of them have run)
  private val SceneConsumers: Set[String] = Set(
    "q10_gmf_cmod5n", "q11_gmf_vh", "q12_directions", "q13_detrend",
    "q14_nesz_flat", "q15_invert_crosspol", "q16_invert_dualpol",
    "q17_model_catalog", "q18_gmf_grid", "q19_dsig",
    "q40_scharr", "q41_coarsen", "q42_grad_hist", "q43_circ_smooth",
    "q44_peak", "q45_multiscale", "q46_smooth", "q47_local_stats",
    "q48_local_gradients", "q49_filtering_params", "q50_hist_overlap")

  def scene(spark: SparkSession, sfDir: String): DataFrame =
    graft.core.CacheLife.shared(spark, sfDir, "scene", SceneConsumers)(
      build(spark, sfDir))

  private def build(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
    val line = (col("l_orderkey") + col("l_partkey") * 13) % nLines
    val sample = (col("l_orderkey") + col("l_suppkey") * 17) % nSamples
    li.select(
      col("l_orderkey").as("okey"),
      col("l_linenumber").cast("long").as("lnum"),
      line.cast("int").as("line"),
      sample.cast("int").as("sample"),
      (lit(16.0) + lit(34.0) * sample / lit(63.0)).as("incidence"),
      (lit(0.2) + (col("l_partkey") % 249) * lit(0.2)).as("wspd"),
      ((col("l_suppkey") % 360) * lit(0.5)).as("phi"),
      (lit(3.0) + (col("l_partkey") % 154) * lit(0.5)).as("wspd_vh"),
      (lit(0.001) + col("l_quantity") * lit(0.0005) + (sample % 7) * lit(0.0001)).as("sigma0"),
      (lit(0.0001) + (col("l_suppkey") % 10) * lit(0.00002)).as("nesz"),
      ((col("l_orderkey") % 72) * lit(5.0)).as("ground_heading"))
  }

  /** DuckDB-dialect SELECT producing the identical scene from `lineitem`.
    * Float literals use `e0` scientific notation: DuckDB types those DOUBLE
    * (plain `0.2` would be DECIMAL and diverge from Spark's binary doubles).
    */
  val sceneSql: String =
    s"""SELECT
       |  l_orderkey AS okey,
       |  CAST(l_linenumber AS BIGINT) AS lnum,
       |  CAST((l_orderkey + l_partkey * 13) % $nLines AS INTEGER) AS line,
       |  CAST((l_orderkey + l_suppkey * 17) % $nSamples AS INTEGER) AS sample,
       |  16e0 + 34e0 * ((l_orderkey + l_suppkey * 17) % $nSamples) / 63e0 AS incidence,
       |  2e-1 + (l_partkey % 249) * 2e-1 AS wspd,
       |  (l_suppkey % 360) * 5e-1 AS phi,
       |  3e0 + (l_partkey % 154) * 5e-1 AS wspd_vh,
       |  1e-3 + l_quantity * 5e-4 + (((l_orderkey + l_suppkey * 17) % $nSamples) % 7) * 1e-4 AS sigma0,
       |  1e-4 + (l_suppkey % 10) * 2e-5 AS nesz,
       |  (l_orderkey % 72) * 5e0 AS ground_heading
       |FROM lineitem""".stripMargin
}
