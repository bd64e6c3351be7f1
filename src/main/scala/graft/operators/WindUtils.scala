package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Inversion support functions (reference windspeed/utils.py, SURVEY.md §2.7).
  * All pure Column expressions / built-in grouped aggregations.
  */
object WindUtils {

  /** W1 — get_dsig (utils.py:47-91): named heuristics for the crosspol cost
    * weight. Selected by model name at plan time (driver `match`).
    */
  def getDsig(name: String, inc: Column, sigma0Cr: Column, neszCr: Column): Column = name match {
    case "gmf_s1_v2" =>
      val c = lit(1.46852088) + lit(1.4058646) /
        (lit(1.0) + exp(-lit(1.57952257) * (inc - lit(25.61843791))))
      lit(1.0) / sqrt(pow(sigma0Cr / neszCr, c))
    case "gmf_rs2_v2" =>
      lit(1.0) / sqrt(pow(sigma0Cr / neszCr, lit(8.0)))
    case "sarwing_lut_cmodms1ahw" | "nc_lut_cmodms1ahw" =>
      pow(lit(1.25) / (sigma0Cr / neszCr), lit(4.0))
    case other => throw new IllegalArgumentException(s"no dsig heuristic for $other")
  }

  /** W2 — get_dsig_wspd (utils.py:18-44): sigmoid×drop alpha weight. */
  def getDsigWspd(name: String, uCrosspol: Column, snrCr: Column): Column = {
    val (b, c0Base, gamma, k) = name match {
      case "dsig_wspd_rs2_v3" =>
        (-0.4908643753212401, 16.763199934792965, 1.3891445172991084, 20.616914824394343)
      case "dsig_wspd_s1_ew_rec_v3" =>
        (-0.5858970325653666, 16.50039320910609, 1.1032031322520397, 7.434663633997121)
      case "dsig_wspd_rcm_v3" =>
        (-0.7920301376936547, 15.8288289109038, 0.24040294696606557, 0.2538177092195224)
      case other => throw new IllegalArgumentException(s"unknown dsig_wspd $other")
    }
    val c0 = lit(c0Base) - lit(gamma) * snrCr
    val alphaCore = lit(1.0) / (lit(1.0) + exp(-lit(b) * (uCrosspol - c0)))
    val drop = lit(1.0) / (lit(1.0) + exp((uCrosspol - lit(30.0)) * lit(k)))
    least(greatest(alphaCore * drop, lit(0.0)), lit(1.0))
  }

  /** W3 — nesz_flattening (utils.py:94-163): noise flattened by a per-line
    * 1st-order fit of noise_dB against the line-meaned incidence profile.
    *
    * Spark shape: two grouped aggregations + two broadcast joins — the
    * np.polyfit(deg=1) IS `regr_slope`/`regr_intercept` (built-in, partial-agg
    * friendly). Per-line/per-sample frames are tiny → broadcast; the raster
    * itself never shuffles.
    */
  def neszFlattening(scene: DataFrame,
      noiseCol: String = "nesz", incCol: String = "incidence"): DataFrame = {
    val nn = Detrend.nanToNull _

    // per-sample means across lines (nanmean axis=0, utils.py:129, :163)
    val perSample = scene.groupBy(col("sample"))
      .agg(avg(nn(col(noiseCol))).as("noise_mean"),
           avg(nn(col(incCol))).as("inc_mean"))

    val filled = scene.join(broadcast(perSample), "sample")
      .withColumn("noise_filled", coalesce(nn(col(noiseCol)), col("noise_mean")))
      .withColumn("noise_db", lit(10.0) * log10(col("noise_filled")))

    // polyfit(inc_mean, noise_db, 1) per line (utils.py:150-153)
    val fits = filled.groupBy(col("line"))
      .agg(regr_slope(col("noise_db"), col("inc_mean")).as("fit_a"),
           regr_intercept(col("noise_db"), col("inc_mean")).as("fit_b"))

    filled.join(broadcast(fits), "line")
      .withColumn("nesz_flat_db", col("inc_mean") * col("fit_a") + col("fit_b") - lit(1.0))
      .withColumn("nesz_flat", pow(lit(10.0), col("nesz_flat_db") / lit(10.0)))
  }
}
