package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Gradients
import QueryDef._

/** Gradient/streak surface (SURVEY.md §2.8) over the deterministic scene
  * grid. The Spark side runs the tile+halo kernels; the DuckDB oracle
  * re-expresses each stencil as 9-way self-joins — so a PASS proves the
  * tiling layer (halo duplication, ownership, dense assembly) implements
  * exactly the neighborhood semantics.
  */
object Streaks {

  /** Unique dense grid from the scene: per-(line,sample) decimal-exact mean
    * sigma0 (engine-order-independent — groupBy avg over plain doubles would
    * not be bit-stable across engines).
    */
  def grid(spark: SparkSession, sfDir: String): DataFrame =
    SceneDef.scene(spark, sfDir)
      .groupBy(col("line"), col("sample"))
      .agg((sum(col("sigma0").cast("decimal(18,6)")).cast("double") / count(lit(1))).as("v"))

  private val gridCte: String =
    s"""scene AS (
       |${SceneDef.sceneSql}
       |),
       |grid AS (
       |  SELECT line, sample,
       |         CAST(SUM(CAST(sigma0 AS DECIMAL(18,6))) AS DOUBLE) / COUNT(1) AS v
       |  FROM scene GROUP BY line, sample
       |)""".stripMargin

  // 8-neighbor self-join + Scharr, term order identical to Gradients.scharrG2
  private val scharrCte: String =
    """g2 AS (
      |  SELECT c.line, c.sample,
      |    (-3e0*nw.v + 3e0*ne.v - 10e0*w.v + 10e0*e.v - 3e0*sw.v + 3e0*se.v) AS gx,
      |    (-3e0*nw.v - 10e0*n.v - 3e0*ne.v + 3e0*sw.v + 10e0*s.v + 3e0*se.v) AS gy
      |  FROM grid c
      |  JOIN grid nw ON nw.line = c.line-1 AND nw.sample = c.sample-1
      |  JOIN grid n  ON n.line  = c.line-1 AND n.sample  = c.sample
      |  JOIN grid ne ON ne.line = c.line-1 AND ne.sample = c.sample+1
      |  JOIN grid w  ON w.line  = c.line   AND w.sample  = c.sample-1
      |  JOIN grid e  ON e.line  = c.line   AND e.sample  = c.sample+1
      |  JOIN grid sw ON sw.line = c.line+1 AND sw.sample = c.sample-1
      |  JOIN grid s  ON s.line  = c.line+1 AND s.sample  = c.sample
      |  JOIN grid se ON se.line = c.line+1 AND se.sample = c.sample+1
      |)""".stripMargin

  /** q40: Scharr squared-gradient field via the tile+halo kernel. */
  def q40Scharr(spark: SparkSession, sfDir: String): DataFrame =
    Gradients.scharrG2(grid(spark, sfDir))
      .select(col("line"), col("sample"),
        (QueryDef.r6t(col("g2r")) + lit(0.0)).as("g2r"), // +0 folds -0.0 → 0.0
        (QueryDef.r6t(col("g2i")) + lit(0.0)).as("g2i"))

  val q40Sql: String =
    s"""WITH $gridCte,
       |$scharrCte
       |SELECT line, sample, ROUND(gx*gx - gy*gy + 5e-10, 6) + 0e0 AS g2r, ROUND(2e0*gx*gy + 5e-10, 6) + 0e0 AS g2i
       |FROM g2""".stripMargin

  /** q41: 2× block-mean downsample (R3 coarsen / R12 INTER_AREA). */
  def q41Coarsen(spark: SparkSession, sfDir: String): DataFrame =
    SceneDef.scene(spark, sfDir)
      .groupBy(expr("CAST(line DIV 2 AS INT)").as("cline"),
               expr("CAST(sample DIV 2 AS INT)").as("csample"))
      .agg((sum(col("sigma0").cast("decimal(18,6)")).cast("double") / count(lit(1))).as("v"),
        count(lit(1)).as("n_px"))

  val q41Sql: String =
    s"""WITH scene AS (
       |${SceneDef.sceneSql}
       |)
       |SELECT CAST(FLOOR(line / 2) AS INTEGER) AS cline,
       |       CAST(FLOOR(sample / 2) AS INTEGER) AS csample,
       |       CAST(SUM(CAST(sigma0 AS DECIMAL(18,6))) AS DOUBLE) / COUNT(1) AS v,
       |       COUNT(1) AS n_px
       |FROM scene GROUP BY 1, 2""".stripMargin

  private val windowSize = 16

  // shared histogram CTE chain (median two-pass + 72-bin weights)
  private val histCte: String =
    s"""mags AS (
       |  SELECT CAST(FLOOR(line / $windowSize) AS INTEGER) AS win_line,
       |         CAST(FLOOR(sample / $windowSize) AS INTEGER) AS win_sample,
       |         gx*gx - gy*gy AS g2r, 2e0*gx*gy AS g2i,
       |         SQRT((gx*gx - gy*gy)*(gx*gx - gy*gy) + (2e0*gx*gy)*(2e0*gx*gy)) AS m
       |  FROM g2
       |),
       |med AS (
       |  SELECT win_line, win_sample, MEDIAN(m) AS med_m, COUNT(1) AS n_valid
       |  FROM mags WHERE m > 0 GROUP BY win_line, win_sample
       |),
       |hist AS (
       |  SELECT b.win_line, b.win_sample,
       |         LEAST(CAST(FLOOR(ROUND((ATAN2(b.g2i, b.g2r) / 2e0 + PI()/2) / (PI()/72), 9)) AS INTEGER), 71) AS bin,
       |         SUM(b.m / (b.m + d.med_m)) AS weight,
       |         COUNT(1) AS n_px,
       |         MIN(d.n_valid) AS n_valid
       |  FROM mags b JOIN med d USING (win_line, win_sample)
       |  WHERE b.m > 0
       |  GROUP BY 1, 2, 3
       |)""".stripMargin

  /** q42: windowed weighted angular histogram (R10) — the UDAF surface. */
  def q42GradHist(spark: SparkSession, sfDir: String): DataFrame =
    Gradients.gradientHistogram(Gradients.scharrG2(grid(spark, sfDir)), windowSize)
      .select(col("win_line"), col("win_sample"), col("bin"),
        round(col("weight"), 6).as("weight"), col("n_px"), col("n_valid"))

  val q42Sql: String =
    s"""WITH $gridCte,
       |$scharrCte,
       |$histCte
       |SELECT win_line, win_sample, bin, ROUND(weight, 6) AS weight, n_px, n_valid
       |FROM hist""".stripMargin

  /** q43: circular smoothing of the histogram (R15), dilations 1,2,4. */
  def q43CircSmooth(spark: SparkSession, sfDir: String): DataFrame =
    Gradients.circSmooth(
        Gradients.gradientHistogram(Gradients.scharrG2(grid(spark, sfDir)), windowSize))
      .select(col("win_line"), col("win_sample"), col("bin"),
        round(col("weight"), 6).as("weight"))

  private def smoothPass(src: String, d: Int): String =
    s"""SELECT win_line, win_sample,
       |       (((bin + off) % 72) + 72) % 72 AS bin,
       |       SUM(weight * k) AS weight
       |FROM $src CROSS JOIN (VALUES (-$d, 25e-2), (0, 5e-1), ($d, 25e-2)) o(off, k)
       |GROUP BY 1, 2, 3""".stripMargin

  val q43Sql: String =
    s"""WITH $gridCte,
       |$scharrCte,
       |$histCte,
       |s1 AS (${smoothPass("hist", 1)}),
       |s2 AS (${smoothPass("s1", 2)}),
       |s3 AS (${smoothPass("s2", 4)})
       |SELECT win_line, win_sample, bin, ROUND(weight, 6) AS weight FROM s3""".stripMargin

  /** q44: streak-direction peak per window (R16 + the +π/2 orthogonal). */
  def q44Peak(spark: SparkSession, sfDir: String): DataFrame =
    Gradients.peak(
      Gradients.circSmooth(
        Gradients.gradientHistogram(Gradients.scharrG2(grid(spark, sfDir)), windowSize)))

  val q44Sql: String =
    s"""WITH $gridCte,
       |$scharrCte,
       |$histCte,
       |s1 AS (${smoothPass("hist", 1)}),
       |s2 AS (${smoothPass("s1", 2)}),
       |s3 AS (${smoothPass("s2", 4)})
       |SELECT win_line, win_sample, CAST(bin AS INTEGER) AS peak_bin,
       |       ROUND(weight, 6) AS peak_weight,
       |       ROUND(-PI()/2 + (bin + 5e-1) * (PI()/72) + PI()/2, 6) AS streak_dir_rad
       |FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY win_line, win_sample
       |                               ORDER BY ROUND(weight, 6) DESC, bin) AS rk
       |  FROM s3
       |) WHERE rk = 1""".stripMargin

  /** q45: multiscale fan-out (R13) — union over downscale configs with
    * literal config columns; each config runs the verified scharr+histogram
    * chain on its (optionally coarsened) grid.
    */
  def q45Multiscale(spark: SparkSession, sfDir: String): DataFrame =
    Gradients.multiscale(grid(spark, sfDir), downscales = Seq(1, 2), windowSizes = Seq(40))
      .select(col("win_line"), col("win_sample"), col("bin"),
        round(col("weight"), 6).as("weight"),
        col("downscale_factor"), col("window_size"))

  // scharr + histogram CTE chain over grid relation `src`, suffix `sfx`
  private def chainCtes(src: String, ws: Int, sfx: String): String =
    s"""g2$sfx AS (
       |  SELECT c.line, c.sample,
       |    (-3e0*nw.v + 3e0*ne.v - 10e0*w.v + 10e0*e.v - 3e0*sw.v + 3e0*se.v) AS gx,
       |    (-3e0*nw.v - 10e0*n.v - 3e0*ne.v + 3e0*sw.v + 10e0*s.v + 3e0*se.v) AS gy
       |  FROM $src c
       |  JOIN $src nw ON nw.line = c.line-1 AND nw.sample = c.sample-1
       |  JOIN $src n  ON n.line  = c.line-1 AND n.sample  = c.sample
       |  JOIN $src ne ON ne.line = c.line-1 AND ne.sample = c.sample+1
       |  JOIN $src w  ON w.line  = c.line   AND w.sample  = c.sample-1
       |  JOIN $src e  ON e.line  = c.line   AND e.sample  = c.sample+1
       |  JOIN $src sw ON sw.line = c.line+1 AND sw.sample = c.sample-1
       |  JOIN $src s  ON s.line  = c.line+1 AND s.sample  = c.sample
       |  JOIN $src se ON se.line = c.line+1 AND se.sample = c.sample+1
       |),
       |mags$sfx AS (
       |  SELECT CAST(FLOOR(line / $ws) AS INTEGER) AS win_line,
       |         CAST(FLOOR(sample / $ws) AS INTEGER) AS win_sample,
       |         gx*gx - gy*gy AS g2r, 2e0*gx*gy AS g2i,
       |         SQRT((gx*gx - gy*gy)*(gx*gx - gy*gy) + (2e0*gx*gy)*(2e0*gx*gy)) AS m
       |  FROM g2$sfx
       |),
       |med$sfx AS (
       |  SELECT win_line, win_sample, MEDIAN(m) AS med_m
       |  FROM mags$sfx WHERE m > 0 GROUP BY win_line, win_sample
       |),
       |hist$sfx AS (
       |  SELECT b.win_line, b.win_sample,
       |         LEAST(CAST(FLOOR(ROUND((ATAN2(b.g2i, b.g2r) / 2e0 + PI()/2) / (PI()/72), 9)) AS INTEGER), 71) AS bin,
       |         SUM(b.m / (b.m + d.med_m)) AS weight
       |  FROM mags$sfx b JOIN med$sfx d USING (win_line, win_sample)
       |  WHERE b.m > 0
       |  GROUP BY 1, 2, 3
       |)""".stripMargin

  val q45Sql: String =
    s"""WITH $gridCte,
       |grid2 AS (
       |  SELECT CAST(FLOOR(line / 2) AS INTEGER) AS line,
       |         CAST(FLOOR(sample / 2) AS INTEGER) AS sample,
       |         AVG(v) AS v
       |  FROM grid GROUP BY 1, 2
       |),
       |${chainCtes("grid", 40, "_a")},
       |${chainCtes("grid2", 20, "_b")}
       |SELECT win_line, win_sample, bin, ROUND(weight, 6) AS weight,
       |       1 AS downscale_factor, 40 AS window_size FROM hist_a
       |UNION ALL
       |SELECT win_line, win_sample, bin, ROUND(weight, 6) AS weight,
       |       2 AS downscale_factor, 40 AS window_size FROM hist_b""".stripMargin

  /** q46: B2 Gaussian smoothing with edge renormalization (R2). Unlike the
    * Scharr query, edge pixels ARE emitted — the renormalizing denominator
    * is exactly the reference's `conv(ones)` edge handling.
    */
  def q46Smooth(spark: SparkSession, sfDir: String): DataFrame =
    Gradients.smoothB2(grid(spark, sfDir))
      .select(col("line"), col("sample"),
        QueryDef.r6t(col("v_smooth")).as("v_smooth"), round(col("w_used"), 2).as("w_used"))

  val q46Sql: String =
    s"""WITH $gridCte
       |SELECT c.line, c.sample,
       |  ROUND(SUM((CASE WHEN n.line = c.line THEN 2e0 ELSE 1e0 END)
       |          * (CASE WHEN n.sample = c.sample THEN 2e0 ELSE 1e0 END) * n.v)
       |      / SUM((CASE WHEN n.line = c.line THEN 2e0 ELSE 1e0 END)
       |          * (CASE WHEN n.sample = c.sample THEN 2e0 ELSE 1e0 END)) + 5e-10, 6) AS v_smooth,
       |  ROUND(SUM((CASE WHEN n.line = c.line THEN 2e0 ELSE 1e0 END)
       |          * (CASE WHEN n.sample = c.sample THEN 2e0 ELSE 1e0 END)), 2) AS w_used
       |FROM grid c JOIN grid n
       |  ON n.line BETWEEN c.line - 1 AND c.line + 1
       | AND n.sample BETWEEN c.sample - 1 AND c.sample + 1
       |GROUP BY c.line, c.sample""".stripMargin

  /** q47: local mean/std over a 5×5 window (R4 Mean operator shape; P1 =
    * std/mean is the rain-artifact heterogeneity input, gradients.py:783-787).
    */
  def q47LocalStats(spark: SparkSession, sfDir: String): DataFrame =
    Gradients.localStats(grid(spark, sfDir), radius = 2)
      .select(col("line"), col("sample"),
        QueryDef.r6t(col("local_mean")).as("local_mean"),
        QueryDef.r6t(col("local_std")).as("local_std"),
        round(col("local_std") / col("local_mean"), 6).as("p1"))

  val q47Sql: String =
    s"""WITH $gridCte
       |SELECT c.line, c.sample,
       |  ROUND(SUM(n.v) / COUNT(1) + 5e-10, 6) AS local_mean,
       |  ROUND(SQRT(GREATEST(SUM(n.v * n.v) / COUNT(1)
       |    - (SUM(n.v) / COUNT(1)) * (SUM(n.v) / COUNT(1)), 0e0)) + 5e-10, 6) AS local_std,
       |  ROUND(SQRT(GREATEST(SUM(n.v * n.v) / COUNT(1)
       |    - (SUM(n.v) / COUNT(1)) * (SUM(n.v) / COUNT(1)), 0e0))
       |    / (SUM(n.v) / COUNT(1)), 6) AS p1
       |FROM grid c JOIN grid n
       |  ON n.line BETWEEN c.line - 2 AND c.line + 2
       | AND n.sample BETWEEN c.sample - 2 AND c.sample + 2
       |GROUP BY c.line, c.sample""".stripMargin

  /** q48: the complete R5 local-gradients chain — Scharr → g² → R2 pyramid
    * downsample of (re, im, |g²|) → quality c (gradients.py:588-634).
    */
  def q48LocalGradients(spark: SparkSession, sfDir: String): DataFrame =
    Gradients.localGradientsFused(grid(spark, sfDir))
      .select(col("line"), col("sample"),
        (QueryDef.r6t(col("g2r")) + lit(0.0)).as("g2r"),
        (QueryDef.r6t(col("g2i")) + lit(0.0)).as("g2i"),
        QueryDef.r6t(col("g3")).as("g3"),
        round(col("c"), 6).as("c"))

  // one renormalized-B2 pass over 3 channels of `src`
  private def smooth3Sql(src: String): String = {
    val w = """(CASE WHEN n.line = c.line THEN 2e0 ELSE 1e0 END)
              | * (CASE WHEN n.sample = c.sample THEN 2e0 ELSE 1e0 END)""".stripMargin
    s"""SELECT c.line, c.sample,
       |  SUM($w * n.a) / SUM($w) AS a,
       |  SUM($w * n.b) / SUM($w) AS b,
       |  SUM($w * n.m) / SUM($w) AS m
       |FROM $src c JOIN $src n
       |  ON n.line BETWEEN c.line - 1 AND c.line + 1
       | AND n.sample BETWEEN c.sample - 1 AND c.sample + 1
       |GROUP BY c.line, c.sample""".stripMargin
  }

  val q48Sql: String =
    s"""WITH $gridCte,
       |$scharrCte,
       |c0 AS (
       |  SELECT line, sample, gx*gx - gy*gy AS a, 2e0*gx*gy AS b,
       |         SQRT((gx*gx - gy*gy)*(gx*gx - gy*gy) + (2e0*gx*gy)*(2e0*gx*gy)) AS m
       |  FROM g2
       |),
       |s1 AS (${smooth3Sql("c0")}),
       |s2 AS (${smooth3Sql("s1")}),
       |co AS (
       |  SELECT CAST(FLOOR(line / 2) AS INTEGER) AS line,
       |         CAST(FLOOR(sample / 2) AS INTEGER) AS sample,
       |         AVG(a) AS a, AVG(b) AS b, AVG(m) AS m
       |  FROM s2 GROUP BY 1, 2
       |),
       |s3 AS (${smooth3Sql("co")})
       |SELECT line, sample,
       |  ROUND(a + 5e-10, 6) + 0e0 AS g2r,
       |  ROUND(b + 5e-10, 6) + 0e0 AS g2i,
       |  ROUND(m + 5e-10, 6) AS g3,
       |  ROUND(CASE WHEN SQRT(a*a + b*b) / (m + 1e-5) <= 1e0
       |             THEN SQRT(a*a + b*b) / (m + 1e-5) ELSE 0e0 END, 6) AS c
       |FROM s3""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q40_scharr", q40Scharr, Some(q40Sql)),
    QueryDef("q41_coarsen", q41Coarsen, Some(q41Sql)),
    QueryDef("q42_grad_hist", q42GradHist, Some(q42Sql)),
    QueryDef("q43_circ_smooth", q43CircSmooth, Some(q43Sql)),
    QueryDef("q44_peak", q44Peak, Some(q44Sql)),
    QueryDef("q45_multiscale", q45Multiscale, Some(q45Sql)),
    QueryDef("q46_smooth", q46Smooth, Some(q46Sql)),
    QueryDef("q47_local_stats", q47LocalStats, Some(q47Sql)),
    QueryDef("q48_local_gradients", q48LocalGradients, Some(q48Sql)),
    QueryDef("q49_filtering_params", q49FilteringParams, Some(q49Sql)),
    QueryDef("q50_hist_overlap", q50HistOverlap, Some(q50Sql)))

  /** q50: overlapping rolling-window histogram (R7-R9) — windows of 16 px
    * at centers every 4 px, each pixel feeding up to 16 windows.
    */
  def q50HistOverlap(spark: SparkSession, sfDir: String): DataFrame =
    Gradients.gradientHistogramOverlapping(
        Gradients.scharrG2(grid(spark, sfDir)), windowSize = 16, step = 4)
      .select(col("cl"), col("cs"), col("bin"),
        round(col("weight"), 6).as("weight"), col("n_px"), col("n_valid"))

  lazy val q50Sql: String = {
    val h = 8; val step = 4
    val kL = (SceneDef.nLines - 1 + h) / step + 1  // center index count per axis
    val kS = (SceneDef.nSamples - 1 + h) / step + 1
    s"""WITH $gridCte,
       |$scharrCte,
       |mags0 AS (
       |  SELECT line, sample, gx*gx - gy*gy AS g2r, 2e0*gx*gy AS g2i,
       |         SQRT((gx*gx - gy*gy)*(gx*gx - gy*gy) + (2e0*gx*gy)*(2e0*gx*gy)) AS m
       |  FROM g2
       |),
       |centers AS (
       |  SELECT CAST(kl * $step AS INTEGER) AS cl, CAST(ks * $step AS INTEGER) AS cs
       |  FROM range(0, $kL) a(kl) CROSS JOIN range(0, $kS) b(ks)
       |),
       |assigned AS (
       |  SELECT c.cl, c.cs, m.g2r, m.g2i, m.m
       |  FROM mags0 m JOIN centers c
       |    ON c.cl > m.line - $h AND c.cl <= m.line + $h
       |   AND c.cs > m.sample - $h AND c.cs <= m.sample + $h
       |),
       |med2 AS (
       |  SELECT cl, cs, MEDIAN(m) AS med_m, COUNT(1) AS n_valid
       |  FROM assigned WHERE m > 0 GROUP BY cl, cs
       |)
       |SELECT b.cl, b.cs,
       |  LEAST(CAST(FLOOR(ROUND((ATAN2(b.g2i, b.g2r) / 2e0 + PI()/2) / (PI()/72), 9)) AS INTEGER), 71) AS bin,
       |  ROUND(SUM(b.m / (b.m + d.med_m)), 6) AS weight,
       |  COUNT(1) AS n_px,
       |  MIN(d.n_valid) AS n_valid
       |FROM assigned b JOIN med2 d USING (cl, cs)
       |WHERE b.m > 0
       |GROUP BY 1, 2, 3""".stripMargin
  }

  /** q49: R19 rain/artifact filtering parameters (gradients.py:758-825) —
    * the full composite: P1 heterogeneity via the Mean operator (B4+B42
    * dilated), P2 high-frequency residual vs a smoothed bilinear-upsampled
    * background, P3 gradient-energy ratio, P4 sqrt(quality), affine-clipped
    * and combined. The oracle re-expresses every stage relationally.
    */
  def q49FilteringParams(spark: SparkSession, sfDir: String): DataFrame =
    Gradients.filteringParameters(grid(spark, sfDir),
      knownDims = Some((SceneDef.nLines / 2, SceneDef.nSamples / 2)))
      .select(col("line"), col("sample"),
        round(col("f1"), 6).as("f1"), round(col("f2"), 6).as("f2"),
        round(col("f3"), 6).as("f3"), round(col("f4"), 6).as("f4"),
        round(col("f"), 6).as("f"))

  // single-channel renormalized B2 smoothing pass at dilation d
  private def smooth1Sql(src: String, d: Int = 1): String = {
    val w = s"""(CASE WHEN n.line = c.line THEN 2e0 ELSE 1e0 END)
               | * (CASE WHEN n.sample = c.sample THEN 2e0 ELSE 1e0 END)""".stripMargin
    s"""SELECT c.line, c.sample, SUM($w * n.v) / SUM($w) AS v
       |FROM $src c JOIN $src n
       |  ON n.line IN (c.line - $d, c.line, c.line + $d)
       | AND n.sample IN (c.sample - $d, c.sample, c.sample + $d)
       |GROUP BY c.line, c.sample""".stripMargin
  }

  private def coarsen1Sql(src: String): String =
    s"""SELECT CAST(FLOOR(line / 2) AS INTEGER) AS line,
       |       CAST(FLOOR(sample / 2) AS INTEGER) AS sample, AVG(v) AS v
       |FROM $src GROUP BY 1, 2""".stripMargin

  // the R4 Mean operator: B2, B2, then dilated-by-2 B2 twice (B4 then B42)
  private def meanOpCtes(src: String, sfx: String): String =
    s"""mo1$sfx AS (${smooth1Sql(src)}),
       |mo2$sfx AS (${smooth1Sql(s"mo1$sfx")}),
       |mo3$sfx AS (${smooth1Sql(s"mo2$sfx", d = 2)}),
       |mean$sfx AS (${smooth1Sql(s"mo3$sfx", d = 2)})""".stripMargin

  lazy val q49Sql: String = {
    val nL2 = SceneDef.nLines / 2; val nS2 = SceneDef.nSamples / 2
    val (zL, zS) = ((nL2 + 1) / 2, (nS2 + 1) / 2) // coarse dims under r2
    val fl = s"(${zL - 1}e0 / ${nL2 - 1}e0)"
    val fs = s"(${zS - 1}e0 / ${nS2 - 1}e0)"
    s"""WITH $gridCte,
       |img AS (SELECT line, sample, SQRT(v) AS v FROM grid),
       |i1 AS (${smooth1Sql("img")}),
       |i2 AS (${smooth1Sql("i1")}),
       |ic AS (${coarsen1Sql("i2")}),
       |r2 AS (${smooth1Sql("ic")}),
       |${meanOpCtes("r2", "_j")},
       |r2sq AS (SELECT line, sample, v * v AS v FROM r2),
       |${meanOpCtes("r2sq", "_j1")},
       |g2i AS (
       |  SELECT c.line, c.sample,
       |    (-3e0*nw.v + 3e0*ne.v - 10e0*w.v + 10e0*e.v - 3e0*sw.v + 3e0*se.v) AS gx,
       |    (-3e0*nw.v - 10e0*n.v - 3e0*ne.v + 3e0*sw.v + 10e0*s.v + 3e0*se.v) AS gy
       |  FROM img c
       |  JOIN img nw ON nw.line = c.line-1 AND nw.sample = c.sample-1
       |  JOIN img n  ON n.line  = c.line-1 AND n.sample  = c.sample
       |  JOIN img ne ON ne.line = c.line-1 AND ne.sample = c.sample+1
       |  JOIN img w  ON w.line  = c.line   AND w.sample  = c.sample-1
       |  JOIN img e  ON e.line  = c.line   AND e.sample  = c.sample+1
       |  JOIN img sw ON sw.line = c.line+1 AND sw.sample = c.sample-1
       |  JOIN img s  ON s.line  = c.line+1 AND s.sample  = c.sample
       |  JOIN img se ON se.line = c.line+1 AND se.sample = c.sample+1
       |),
       |lg0 AS (
       |  SELECT line, sample, gx*gx - gy*gy AS a, 2e0*gx*gy AS b,
       |         SQRT((gx*gx - gy*gy)*(gx*gx - gy*gy) + (2e0*gx*gy)*(2e0*gx*gy)) AS m
       |  FROM g2i
       |),
       |lg1 AS (${smooth3Sql("lg0")}),
       |lg2 AS (${smooth3Sql("lg1")}),
       |lgc AS (
       |  SELECT CAST(FLOOR(line / 2) AS INTEGER) AS line,
       |         CAST(FLOOR(sample / 2) AS INTEGER) AS sample,
       |         AVG(a) AS a, AVG(b) AS b, AVG(m) AS m
       |  FROM lg2 GROUP BY 1, 2
       |),
       |lg AS (${smooth3Sql("lgc")}),
       |lgq AS (
       |  SELECT line, sample, m AS g3,
       |    CASE WHEN SQRT(a*a + b*b) / (m + 1e-5) <= 1e0
       |         THEN SQRT(a*a + b*b) / (m + 1e-5) ELSE 0e0 END AS c
       |  FROM lg
       |),
       |g3ch AS (SELECT line, sample, g3 AS v FROM lgq),
       |${meanOpCtes("g3ch", "_g4")},
       |rz AS (${coarsen1Sql("r2")}),
       |rzs AS (${smooth1Sql("rz")}),
       |zt AS (
       |  SELECT line, sample,
       |    CAST(FLOOR(line * $fl) AS INTEGER) AS i0,
       |    line * $fl - FLOOR(line * $fl) AS wi,
       |    CAST(FLOOR(sample * $fs) AS INTEGER) AS j0,
       |    sample * $fs - FLOOR(sample * $fs) AS wj
       |  FROM r2
       |),
       |bg AS (
       |  SELECT t.line, t.sample,
       |    (v00.v * (1e0 - t.wj) + v01.v * t.wj) * (1e0 - t.wi)
       |      + (v10.v * (1e0 - t.wj) + v11.v * t.wj) * t.wi AS bg
       |  FROM (SELECT *, LEAST(i0 + 1, ${zL - 1}) AS i1, LEAST(j0 + 1, ${zS - 1}) AS j1 FROM zt) t
       |  JOIN rzs v00 ON v00.line = t.i0 AND v00.sample = t.j0
       |  JOIN rzs v01 ON v01.line = t.i0 AND v01.sample = t.j1
       |  JOIN rzs v10 ON v10.line = t.i1 AND v10.sample = t.j0
       |  JOIN rzs v11 ON v11.line = t.i1 AND v11.sample = t.j1
       |)
       |SELECT r2.line, r2.sample,
       |  ROUND(LEAST(GREATEST(-50e0 * (SQRT(GREATEST(j1c.v - jj.v * jj.v, 0e0)) / (jj.v + 1e-5)) + 2.75e0, 0e0), 1e0), 6) AS f1,
       |  ROUND(LEAST(GREATEST(-5000e0 * ((r2.v - bg.bg) * (r2.v - bg.bg) / (jj.v * jj.v + 1e-5)) + 3e0, 0e0), 1e0), 6) AS f2,
       |  ROUND(LEAST(GREATEST(-2.5e0 * (lgq.g3 / (g4.v + 1e-5)) + 4e0, 0e0), 1e0), 6) AS f3,
       |  ROUND(LEAST(GREATEST(-10e0 * SQRT(lgq.c) + 6.3e0, 0e0), 1e0), 6) AS f4,
       |  ROUND(CASE WHEN fr < 15e-4 THEN 0e0 ELSE fr END, 6) AS f
       |FROM r2
       |JOIN mean_j jj USING (line, sample)
       |JOIN mean_j1 j1c USING (line, sample)
       |JOIN bg USING (line, sample)
       |JOIN lgq USING (line, sample)
       |JOIN mean_g4 g4 USING (line, sample),
       |LATERAL (SELECT SQRT((
       |    LEAST(GREATEST(-50e0 * (SQRT(GREATEST(j1c.v - jj.v * jj.v, 0e0)) / (jj.v + 1e-5)) + 2.75e0, 0e0), 1e0) * LEAST(GREATEST(-50e0 * (SQRT(GREATEST(j1c.v - jj.v * jj.v, 0e0)) / (jj.v + 1e-5)) + 2.75e0, 0e0), 1e0)
       |  + LEAST(GREATEST(-5000e0 * ((r2.v - bg.bg) * (r2.v - bg.bg) / (jj.v * jj.v + 1e-5)) + 3e0, 0e0), 1e0) * LEAST(GREATEST(-5000e0 * ((r2.v - bg.bg) * (r2.v - bg.bg) / (jj.v * jj.v + 1e-5)) + 3e0, 0e0), 1e0)
       |  + LEAST(GREATEST(-2.5e0 * (lgq.g3 / (g4.v + 1e-5)) + 4e0, 0e0), 1e0) * LEAST(GREATEST(-2.5e0 * (lgq.g3 / (g4.v + 1e-5)) + 4e0, 0e0), 1e0)
       |  + LEAST(GREATEST(-10e0 * SQRT(lgq.c) + 6.3e0, 0e0), 1e0) * LEAST(GREATEST(-10e0 * SQRT(lgq.c) + 6.3e0, 0e0), 1e0)
       |  ) / 4e0) AS fr) fcalc""".stripMargin
  }
}
