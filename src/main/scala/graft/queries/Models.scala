package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GmfColumns
import graft.operators.{Directions, WindUtils}
import QueryDef._

/** Model-framework surface: grid materialization (M3's outer-product mode,
  * gmfs.py:317-331) and the dsig weight heuristics (W1/W2) as queries.
  */
object Models {

  /** q18: LUT grid materialization as a distributed outer product —
    * `spark.range` axes cross-joined, GMF evaluated per cell (the DataFrame
    * twin of `GmfModel.__call__` with 1-D inputs; grid steps follow
    * models.py:42-44 low-res defaults for the crosspol class).
    */
  def q18GmfGrid(spark: SparkSession, sfDir: String): DataFrame = {
    val inc = spark.range(51).select((lit(16.0) + col("id") * 1.0).as("incidence"))
    val wspd = spark.range(155).select((lit(3.0) + col("id") * 0.5).as("wspd"))
    inc.crossJoin(wspd)
      .select(col("incidence"), col("wspd"),
        r6(Directions.toDb(GmfColumns.s1V2(col("incidence"), col("wspd")))).as("sigma0_db"))
  }

  val q18Sql: String =
    s"""WITH inc AS (SELECT 16e0 + i * 1e0 AS incidence FROM range(0, 51) t(i)),
       |wspd AS (SELECT 3e0 + w * 5e-1 AS wspd FROM range(0, 155) t(w))
       |SELECT incidence, wspd,
       |  ROUND(10e0 * LOG10(${GmfColumns.s1V2Sql("incidence", "wspd")} + 1e-15), 6) AS sigma0_db
       |FROM inc CROSS JOIN wspd""".stripMargin

  /** q19: dsig cost-weight heuristics (W1 utils.py:47-91, W2 utils.py:18-44)
    * evaluated over the scene.
    */
  def q19Dsig(spark: SparkSession, sfDir: String): DataFrame = {
    // per-pixel GMF + dsig expression work — spread the single-split
    // cached scene across cores (no-op with enough input partitions)
    val sc = graft.core.Plans.ensureMinPartitions(
      SceneDef.scene(spark, sfDir), spark.sparkContext.defaultParallelism)
    val sigma0Cr = GmfColumns.s1V2(col("incidence"), col("wspd_vh"))
    sc.select(
      col("okey"), col("lnum"),
      r6(WindUtils.getDsig("gmf_s1_v2", col("incidence"), sigma0Cr, col("nesz"))).as("dsig_s1"),
      r6(WindUtils.getDsig("gmf_rs2_v2", col("incidence"), sigma0Cr, col("nesz"))).as("dsig_rs2"),
      r6(WindUtils.getDsigWspd("dsig_wspd_rs2_v3", col("wspd_vh"),
        sigma0Cr / col("nesz"))).as("alpha_rs2_v3"))
  }

  val q19Sql: String = {
    val s0 = GmfColumns.s1V2Sql("incidence", "wspd_vh")
    s"""WITH scene AS (
       |${SceneDef.sceneSql}
       |),
       |b AS (SELECT okey, lnum, incidence, wspd_vh, nesz, $s0 AS s0cr FROM scene)
       |SELECT okey, lnum,
       |  ROUND(1e0 / SQRT(POW(s0cr / nesz,
       |    1.46852088e0 + 1.4058646e0 / (1e0 + EXP(-(1.57952257e0) * (incidence - 25.61843791e0))))), 6) AS dsig_s1,
       |  ROUND(1e0 / SQRT(POW(s0cr / nesz, 8e0)), 6) AS dsig_rs2,
       |  ROUND(LEAST(GREATEST(
       |    (1e0 / (1e0 + EXP(-(-0.4908643753212401e0) * (wspd_vh -
       |      (16.763199934792965e0 - 1.3891445172991084e0 * (s0cr / nesz))))))
       |    * (1e0 / (1e0 + EXP((wspd_vh - 30e0) * 20.616914824394343e0))), 0e0), 1e0), 6) AS alpha_rs2_v3
       |FROM b""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q18_gmf_grid", q18GmfGrid, Some(q18Sql)),
    QueryDef("q19_dsig", q19Dsig, Some(q19Sql)))
}
