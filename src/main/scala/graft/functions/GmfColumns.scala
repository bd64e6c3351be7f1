package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** GMFs as Catalyst Column expressions — whole-stage-codegen'd, no UDF.
  *
  * Same math as [[Gmf]] (provenance cited there); branches become `when`.
  * Branch *conditions* involve only exact IEEE +,-,*,/ arithmetic of the
  * inputs, so Spark and an external SQL engine take identical branches and
  * results agree to libm ULPs — rounded outputs hash-match across engines.
  */
object GmfColumns {

  private def cmod5Generic(c: Array[Double])(inc: Column, wspd: Column, phi: Column): Column = {
    val y0 = lit(c(19)); val pn = lit(c(20))
    val aC = c(19) - (c(19) - 1.0) / c(20)
    val bC = 1.0 / (c(20) * math.pow(c(19) - 1.0, c(20) - 1.0))
    val cosphi = cos(radians(phi))
    val x = (inc - lit(40.0)) / lit(25.0)
    val x2 = x * x
    val a0 = lit(c(1)) + lit(c(2)) * x + lit(c(3)) * x2 + lit(c(4)) * x * x2
    val a1 = lit(c(5)) + lit(c(6)) * x
    val a2 = lit(c(7)) + lit(c(8)) * x
    val gam = lit(c(9)) + lit(c(10)) * x + lit(c(11)) * x2
    val s0 = lit(c(12)) + lit(c(13)) * x
    val s = a2 * wspd
    val a3base = lit(1.0) / (lit(1.0) + exp(-s0))
    val a3 = when(s < s0, a3base * pow(s / s0, s0 * (lit(1.0) - a3base)))
      .otherwise(lit(1.0) / (lit(1.0) + exp(-s)))
    val b0 = pow(a3, gam) * pow(lit(10.0), a0 + a1 * wspd)
    val b1raw = lit(c(15)) * wspd * (lit(0.5) + x - tanh(lit(4.0) * (x + lit(c(16)) + lit(c(17)) * wspd)))
    val b1 = (lit(c(14)) * (lit(1.0) + x) - b1raw) / (exp(lit(0.34) * (wspd - lit(c(18)))) + lit(1.0))
    val v0 = lit(c(21)) + lit(c(22)) * x + lit(c(23)) * x2
    val d1 = lit(c(24)) + lit(c(25)) * x + lit(c(26)) * x2
    val d2 = lit(c(27)) + lit(c(28)) * x
    val v2raw = wspd / v0 + lit(1.0)
    val v2 = when(v2raw < y0, lit(aC) + lit(bC) * pow(v2raw - lit(1.0), pn)).otherwise(v2raw)
    val b2 = (-d1 + d2 * v2) * exp(-v2)
    b0 * pow(lit(1.0) + b1 * cosphi + b2 * (lit(2.0) * cosphi * cosphi - lit(1.0)), lit(1.6))
  }

  private val cmod5C = Array(0.0, -0.688, -0.793, 0.338, -0.173, 0.0, 0.004, 0.111,
    0.0162, 6.34, 2.57, -2.18, 0.4, -0.6, 0.045, 0.007, 0.33, 0.012, 22.0, 1.95,
    3.0, 8.39, -3.44, 1.36, 5.35, 1.99, 0.29, 3.80, 1.53)
  private val cmod5nC = Array(0.0, -0.6878, -0.7957, 0.338, -0.1728, 0.0, 0.004, 0.1103,
    0.0159, 6.7329, 2.7713, -2.2885, 0.4971, -0.725, 0.045, 0.0066, 0.3222, 0.012, 22.7,
    2.0813, 3.0, 8.3659, -3.3428, 1.3236, 6.2437, 2.3893, 0.3249, 4.159, 1.693)

  def cmod5(inc: Column, wspd: Column, phi: Column): Column = cmod5Generic(cmod5C)(inc, wspd, phi)
  def cmod5n(inc: Column, wspd: Column, phi: Column): Column = cmod5Generic(cmod5nC)(inc, wspd, phi)

  /** DuckDB SQL pipeline for cmod5/cmod5n — kept adjacent to the Column
    * builder so the two stay in lockstep. Wraps relation `src` (which must
    * expose columns `incidence`, `wspd`, `phi`) in nested SELECTs and emits
    * `carry` columns plus `sigma0_gmf`.
    */
  def cmod5Sql(c: Array[Double], src: String, carry: Seq[String]): String = {
    val aC = c(19) - (c(19) - 1.0) / c(20)
    val bC = 1.0 / (c(20) * math.pow(c(19) - 1.0, c(20) - 1.0))
    val cs = carry.mkString(", ")
    s"""SELECT $cs, b0 * POW(1.0 + b1*cosphi + b2*(2.0*cosphi*cosphi - 1.0), 1.6) AS sigma0_gmf
       |FROM (
       |  SELECT $cs, cosphi, b1,
       |    POW(CASE WHEN s < s0 THEN a3base * POW(s/s0, s0*(1.0-a3base))
       |             ELSE 1.0/(1.0+EXP(-s)) END, gam) * POW(10.0, a0 + a1*wspd) AS b0,
       |    (-d1 + d2*v2) * EXP(-v2) AS b2
       |  FROM (
       |    SELECT $cs, wspd, cosphi, s, s0, a3base, gam, a0, a1, b1, d1, d2,
       |      CASE WHEN v2raw < ${c(19)} THEN $aC + ($bC)*POW(v2raw-1.0, ${c(20)}) ELSE v2raw END AS v2
       |    FROM (
       |      SELECT $cs, wspd, cosphi, x,
       |        (${c(7)} + ${c(8)}*x) * wspd AS s,
       |        ${c(12)} + ${c(13)}*x AS s0,
       |        1.0/(1.0 + EXP(-(${c(12)} + ${c(13)}*x))) AS a3base,
       |        ${c(9)} + ${c(10)}*x + ${c(11)}*x*x AS gam,
       |        ${c(1)} + ${c(2)}*x + ${c(3)}*x*x + ${c(4)}*x*x*x AS a0,
       |        ${c(5)} + ${c(6)}*x AS a1,
       |        (${c(14)}*(1.0+x) - ${c(15)}*wspd*(0.5 + x -
       |          ((EXP(2.0*(4.0*(x + ${c(16)} + ${c(17)}*wspd))) - 1.0)
       |           / (EXP(2.0*(4.0*(x + ${c(16)} + ${c(17)}*wspd))) + 1.0))))
       |          / (EXP(0.34*(wspd - ${c(18)})) + 1.0) AS b1,
       |        ${c(24)} + ${c(25)}*x + ${c(26)}*x*x AS d1,
       |        ${c(27)} + ${c(28)}*x AS d2,
       |        wspd/(${c(21)} + ${c(22)}*x + ${c(23)}*x*x) + 1.0 AS v2raw
       |      FROM (
       |        SELECT $cs, wspd, COS(RADIANS(phi)) AS cosphi, (incidence - 40.0)/25.0 AS x
       |        FROM $src
       |      ) g0
       |    ) g1
       |  ) g2
       |) g3""".stripMargin
  }

  def cmod5nSql(src: String, carry: Seq[String]): String = cmod5Sql(cmod5nC, src, carry)

  /** VH sigmoid-blend family (gmfs_impl.py:325-514) as Column expressions. */
  private def vhBlend(z1: Array[Double], z2: Array[Double], fp: Array[Double])(
      inc: Column, u10: Column): Column = {
    val sigZ1 = lit(z1(0)) * pow(u10, lit(z1(1)) + lit(z1(2)) * inc)
    val aZ2 = lit(z2(0)) + lit(z2(1)) * inc + lit(z2(2)) * inc * inc
    val bZ2 = lit(z2(3)) + lit(z2(4)) * inc + lit(z2(5)) * inc * inc
    val sigZ2 = aZ2 * pow(u10, bZ2)
    val s1 = lit(1.0) / (lit(1.0) + exp(-lit(fp(0)) * (u10 - lit(fp(1)))))
    val s2 = lit(1.0) / (lit(1.0) + exp(-lit(fp(2)) * (u10 - lit(fp(3)))))
    sigZ1 * s1 + sigZ2 * s2
  }

  private val s1V2Z1 = Array(2.13755392e-06, 2.47395267, -2.85775085e-03)
  private val s1V2Z2 = Array(6.54058552e-05, -2.43845137e-06, 2.87698338e-08,
    1.14509104, 3.41828829e-02, -4.79715441e-04)
  private val s1V2Fp = Array(-0.23257086, 12.39717002, 0.21667263, 12.22862991)

  def s1V2(inc: Column, u10: Column): Column = vhBlend(s1V2Z1, s1V2Z2, s1V2Fp)(inc, u10)

  def s1V2Sql(i: String, w: String): String = {
    val (z1, z2, fp) = (s1V2Z1, s1V2Z2, s1V2Fp)
    s"""(${z1(0)} * POW($w, ${z1(1)} + ${z1(2)}*($i))
       |  * (1.0/(1.0 + EXP(-(${fp(0)})*(($w) - ${fp(1)}))))
       | + (${z2(0)} + ${z2(1)}*($i) + ${z2(2)}*($i)*($i))
       |  * POW($w, ${z2(3)} + ${z2(4)}*($i) + ${z2(5)}*($i)*($i))
       |  * (1.0/(1.0 + EXP(-(${fp(2)})*(($w) - ${fp(3)})))))""".stripMargin
  }

  /** gmf_dummy power law (test/test_xsarsea.py:8-21). */
  def dummy(inc: Column, u10: Column): Column = {
    val a = lit(0.00013106836021008122) + lit(-4.530598283705591e-06) * inc +
      lit(4.429277425062766e-08) * inc * inc
    val b = lit(1.3925444179360706) + lit(0.004157838450541205) * inc +
      lit(3.4735809771069953e-05) * inc * inc
    a * pow(u10, b)
  }

  def dummySql(i: String, w: String): String =
    s"""((0.00013106836021008122 + -4.530598283705591e-06*($i) + 4.429277425062766e-08*($i)*($i))
       | * POW($w, 1.3925444179360706 + 0.004157838450541205*($i) + 3.4735809771069953e-05*($i)*($i)))""".stripMargin
}
