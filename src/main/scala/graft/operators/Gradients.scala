package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gradient / streak-direction analysis (reference gradients.py, SURVEY.md
  * §2.8) re-expressed Spark-first:
  *
  *  - Scharr local gradients (R5, gradients.py:588-634) run as a tile+halo
  *    kernel ([[Tiles.stencil3x3]]);
  *  - pyramid downsampling (R3/R12, gradients.py:689-721, :336-362) is a
  *    `groupBy(line/f, sample/f).avg` — exact INTER_AREA for integer factors;
  *  - the windowed weighted angular histogram (R10, gradients.py:828-879)
  *    is a two-pass aggregation: in-window median first (it breaks one-pass
  *    partial aggregation — SURVEY.md §7.4 risk 3), then the 72-bin weight
  *    sum, both partial-agg-friendly groupBys keyed by window id;
  *  - circular smoothing (R15, gradients.py:882-923) is a wraparound
  *    band-join over bin offsets, applied at dilations 1,2,4 sequentially;
  *  - peak extraction (R16, gradients.py:419-428) is a deterministic
  *    row_number argmax over (weight desc, bin).
  *
  * Angles: the squared-gradient trick (gradients.py:619-621) makes ±g
  * equivalent; angle(√(g²)) = atan2(g2i, g2r)/2 ∈ [-π/2, π/2].
  */
object Gradients {

  val NAngles = 72

  /** R5: Scharr x/y gradients → squared complex gradient (g2r, g2i).
    * Emits interior (full-neighborhood) pixels only.
    */
  def scharrG2(grid: DataFrame, tileSize: Int = 64): DataFrame =
    Tiles.stencil3x3(grid, tileSize) { nb =>
      // nb row-major: 0:(l-1,s-1) 1:(l-1,s) 2:(l-1,s+1) 3:(l,s-1) 4:center
      //               5:(l,s+1) 6:(l+1,s-1) 7:(l+1,s) 8:(l+1,s+1)
      // cv2.Scharr kernels (gradients.py:612-613); term order mirrors the
      // SQL oracle exactly for bit-stable sums
      val gx = -3.0 * nb(0) + 3.0 * nb(2) - 10.0 * nb(3) + 10.0 * nb(5) - 3.0 * nb(6) + 3.0 * nb(8)
      val gy = -3.0 * nb(0) - 10.0 * nb(1) - 3.0 * nb(2) + 3.0 * nb(6) + 10.0 * nb(7) + 3.0 * nb(8)
      (gx * gx - gy * gy, 2.0 * gx * gy) // (gx + i·gy)²
    }.withColumnsRenamed(Map("a" -> "g2r", "b" -> "g2i"))

  /** R2: 3×3 Gaussian B2 = [1,2,1;2,4,2;1,2,1]/16 smoothing with edge
    * renormalization — missing/edge neighbors drop out of BOTH numerator
    * and denominator (`conv(v·w)/conv(ones·w)`, gradients.py:675-686).
    * Output channel b carries the weight mass actually used.
    */
  def smoothB2(grid: DataFrame, tileSize: Int = 64): DataFrame =
    Tiles.stencil(grid, tileSize, 1) { (nb, mask) =>
      var num = 0.0; var den = 0.0
      var k = 0
      while (k < 9) {
        if (mask(k)) {
          val wl = if (k / 3 == 1) 2.0 else 1.0
          val ws = if (k % 3 == 1) 2.0 else 1.0
          num += wl * ws * nb(k); den += wl * ws
        }
        k += 1
      }
      Some((num / den, den))
    }.withColumnsRenamed(Map("a" -> "v_smooth", "b" -> "w_used"))

  /** R4/R19-P1: local mean + std over a (2r+1)² uniform window of present
    * pixels; P1 = std/mean is the Koch/Zhao heterogeneity mask input
    * (gradients.py:783-787). std via sqrt(max(E[x²]−E[x]², 0)).
    */
  def localStats(grid: DataFrame, radius: Int = 2, tileSize: Int = 64): DataFrame =
    Tiles.stencil(grid, tileSize, radius) { (nb, mask) =>
      var s = 0.0; var s2 = 0.0; var n = 0
      var k = 0
      while (k < nb.length) {
        if (mask(k)) { s += nb(k); s2 += nb(k) * nb(k); n += 1 }
        k += 1
      }
      val mean = s / n
      val std = math.sqrt(math.max(s2 / n - mean * mean, 0.0))
      Some((mean, std))
    }.withColumnsRenamed(Map("a" -> "local_mean", "b" -> "local_std"))

  /** R3/R12: integer-factor downsample by block mean (exact INTER_AREA). */
  def coarsen(grid: DataFrame, factor: Int): DataFrame =
    grid.groupBy(
        (col("line") / factor).cast("int").as("line"),
        (col("sample") / factor).cast("int").as("sample"))
      .agg(avg(col("v")).as("v"), count(lit(1)).as("n_px"))

  /** R10: windowed weighted angular histogram over squared gradients.
    *
    * @param g2 output of [[scharrG2]]
    * @param windowSize window side length in pixels
    * @return one row per (win_line, win_sample, bin): weight sum + counts
    */
  def gradientHistogram(g2: DataFrame, windowSize: Int): DataFrame = {
    val mag = hypot(col("g2r"), col("g2i"))
    val base = g2.select(
      (col("line") / windowSize).cast("int").as("win_line"),
      (col("sample") / windowSize).cast("int").as("win_sample"),
      col("g2r"), col("g2i"), mag.as("m"))

    // pass 1: in-window median of |g2| over valid gradients (gradients.py:869)
    val med = base.filter(col("m") > 0)
      .groupBy(col("win_line"), col("win_sample"))
      .agg(median(col("m")).as("med_m"), count(lit(1)).as("n_valid"))

    // pass 2: weight r = m/(m+median), bin by angle(sqrt(g2)) (gradients.py:853-877)
    val angle = atan2(col("g2i"), col("g2r")) / 2.0
    val bin = least(
      floor((angle + lit(math.Pi / 2)) / lit(math.Pi / NAngles)).cast("int"),
      lit(NAngles - 1))
    base.filter(col("m") > 0)
      .join(med, Seq("win_line", "win_sample"))
      .select(col("win_line"), col("win_sample"),
        bin.as("bin"),
        (col("m") / (col("m") + col("med_m"))).as("r"),
        col("n_valid"))
      .groupBy(col("win_line"), col("win_sample"), col("bin"))
      .agg(sum(col("r")).as("weight"), count(lit(1)).as("n_px"),
        min(col("n_valid")).as("n_valid"))
  }

  /** R15: circular smoothing — [1,2,1]/4 kernel at dilations 1,2,4 applied
    * sequentially on the wrapped 72-bin axis. Wraparound join, no arrays.
    */
  def circSmooth(hist: DataFrame, dilations: Seq[Int] = Seq(1, 2, 4)): DataFrame = {
    dilations.foldLeft(hist.select(col("win_line"), col("win_sample"), col("bin"), col("weight"))) {
      (h, d) =>
        val spark = h.sparkSession
        import spark.implicits._
        val offsets = Seq((-d, 0.25), (0, 0.5), (d, 0.25)).toDF("off", "k")
        h.crossJoin(broadcast(offsets))
          .groupBy(col("win_line"), col("win_sample"),
            pmod(col("bin") + col("off"), lit(NAngles)).as("bin"))
          .agg(sum(col("weight") * col("k")).as("weight"))
    }
  }

  /** R16: histogram peak per window — deterministic argmax on rounded
    * weights (rounding first keeps cross-engine ordering stable).
    */
  def peak(hist: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("win_line"), col("win_sample"))
      .orderBy(round(col("weight"), 6).desc, col("bin").asc)
    hist.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("win_line"), col("win_sample"),
        col("bin").as("peak_bin"),
        round(col("weight"), 6).as("peak_weight"),
        // orthogonal streak direction: bin center + π/2 (streaks notebook)
        round(lit(-math.Pi / 2) + (col("bin") + 0.5) * lit(math.Pi / NAngles) + lit(math.Pi / 2), 6)
          .as("streak_dir_rad"))
  }

  /** R13: multiscale fan-out — union of per-config pipelines with literal
    * config columns (pol/window/downscale become ordinary columns).
    */
  def multiscale(grid: DataFrame, downscales: Seq[Int], windowSizes: Seq[Int],
      tileSize: Int = 64): DataFrame = {
    val configs = for (f <- downscales; ws <- windowSizes) yield (f, ws)
    configs.map { case (f, ws) =>
      val g = if (f == 1) grid else coarsen(grid, f).drop("n_px")
      gradientHistogram(scharrG2(g, tileSize), ws / f)
        .withColumn("downscale_factor", lit(f))
        .withColumn("window_size", lit(ws))
    }.reduce(_ unionAll _)
  }
}
