package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** sigma0 detrending (reference detrend.py:9-68, D1 in SURVEY.md §2.5).
  *
  * Semantics preserved from the reference:
  *  1. the reference incidence profile is taken from the FIRST line only
  *     (`inc_angle.isel(line=0)`, detrend.py:55) — incidence varies across
  *     samples, so one GMF value per sample at fixed wind (10 m/s, 45°);
  *  2. the profile is normalized by its NaN-skipping mean (detrend.py:63) —
  *     NaNs are converted to nulls first so Spark's `avg` matches `nanmean`;
  *  3. every pixel divides by the per-sample ratio (detrend.py:64) — a
  *     broadcast equi-join on `sample`, NOT a shuffle of the raster.
  *
  * Scale: the profile/ratio frame is O(samples-per-line) rows (KBs even for
  * a 100k-wide scene) — both joins below broadcast, so the full-scene pass
  * stays shuffle-free.
  */
object Detrend {

  def nanToNull(c: Column): Column = when(isnan(c), lit(null)).otherwise(c)

  /** @param scene long-format pixel frame with line/sample/incidence/sigma0
    * @param gmf   GMF as Column expression (inc, wspd, phi) => sigma0
    */
  def sigma0Detrend(
      scene: DataFrame,
      gmf: (Column, Column, Column) => Column,
      wspd0: Double = 10.0,
      phi0: Double = 45.0): DataFrame = {

    val firstLine = scene.agg(min(col("line")).as("l0"))

    // one GMF value per sample of the first line (dedup BEFORE evaluating:
    // keeps profile exact and engine-independent)
    val profile = scene
      .join(broadcast(firstLine), col("line") === col("l0"))
      .select(col("sample"), col("incidence"))
      .distinct()
      .select(col("sample"),
        gmf(col("incidence"), lit(wspd0), lit(phi0)).as("gmf_profile"))

    val mean = profile.agg(avg(nanToNull(col("gmf_profile"))).as("gmf_mean"))

    val ratio = profile
      .crossJoin(broadcast(mean))
      .select(col("sample").as("r_sample"), (col("gmf_profile") / col("gmf_mean")).as("ratio"))

    scene
      .join(broadcast(ratio), col("sample") === col("r_sample"))
      .drop("r_sample")
      .withColumn("sigma0_detrend", col("sigma0") / col("ratio"))
  }
}
