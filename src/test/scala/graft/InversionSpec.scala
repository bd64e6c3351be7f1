package graft

import org.apache.spark.sql.functions._
import graft.functions.Gmf
import graft.models.ModelRegistry
import graft.operators.Inversion
import graft.operators.Inversion.{InvLuts, PxIn}

/** Forward-model recovery property (FIXTURES.md §3): sigma0 generated from a
  * GMF at known wind must invert back to that wind within one LUT step.
  * The reference asserts types only (test_xsarsea.py:109-143); this is the
  * golden bar it lacks.
  */
class InversionSpec extends SparkSpec {

  def db(x: Double): Double = 10.0 * math.log10(x + 1e-15)

  lazy val crLut: InvLuts = {
    val cr = Inversion.toDbValues(ModelRegistry.get("gmf_s1_v2").toLut(highRes = true))
    InvLuts(Inversion.toDbValues(ModelRegistry.get("gmf_cmod5n").toLut()),
      coPhi180 = true,
      ModelRegistry.get("gmf_cmod5n").toLut().phi.map(p => math.cos(math.toRadians(p))),
      ModelRegistry.get("gmf_cmod5n").toLut().phi.map(p => math.sin(math.toRadians(p))),
      cr)
  }

  test("crosspol inversion recovers forward-model wind within one LUT step") {
    val nan = Double.NaN
    for (inc <- Seq(18.0, 30.0, 45.0); truth <- Seq(3.5, 7.0, 15.0, 42.0, 79.0)) {
      val s0 = db(Gmf.s1V2(inc, truth))
      val out = Inversion.invertOne(crLut, 0.1,
        PxIn(0, 0, inc, nan, s0, 0.1, nan, nan))
      assert(math.abs(out.crRe - truth) <= 0.1 + 1e-9,
        s"inc=$inc truth=$truth got ${out.crRe}")
      assert(out.crIm == 0.0) // no copol → no direction (windspeed.py:275)
      assert(out.coRe.isNaN && out.coIm.isNaN)
    }
  }

  test("copol inversion recovers speed and direction with ancillary wind") {
    for (inc <- Seq(20.0, 35.0); wspd <- Seq(5.0, 12.0, 30.0); phi <- Seq(30.0, 120.0)) {
      val s0co = db(Gmf.cmod5n(inc, wspd, phi))
      val ancRe = wspd * math.cos(math.toRadians(phi))
      val ancIm = wspd * math.sin(math.toRadians(phi))
      val out = Inversion.invertOne(crLut, 0.1,
        PxIn(0, 0, inc, s0co, Double.NaN, 0.1, ancRe, ancIm))
      val gotW = math.hypot(out.coRe, out.coIm)
      val gotPhi = math.toDegrees(math.atan2(out.coIm, out.coRe))
      assert(math.abs(gotW - wspd) <= 0.2 + 1e-9, s"speed: inc=$inc w=$wspd phi=$phi got $gotW")
      assert(math.abs(gotPhi - phi) <= 2.5 + 1e-9, s"dir: inc=$inc w=$wspd phi=$phi got $gotPhi")
    }
  }

  test("phi ambiguity resolves toward ancillary sign (windspeed.py:234-245)") {
    val inc = 30.0; val wspd = 12.0; val phi = 60.0
    val s0co = db(Gmf.cmod5n(inc, wspd, phi))
    // ancillary pointing to -phi: inversion must choose the -phi branch
    val out = Inversion.invertOne(crLut, 0.1,
      PxIn(0, 0, inc, s0co, Double.NaN, 0.1,
        wspd * math.cos(math.toRadians(-phi)), wspd * math.sin(math.toRadians(-phi))))
    assert(out.coIm < 0.0, s"expected negative-phi solution, got (${out.coRe}, ${out.coIm})")
  }

  test("NaN propagation rules (windspeed.py:197-207)") {
    val nan = Double.NaN
    val o1 = Inversion.invertOne(crLut, 0.1, PxIn(0, 0, nan, -10.0, -25.0, 0.1, 1.0, 1.0))
    assert(o1.coRe.isNaN && o1.crRe.isNaN) // NaN incidence → all NaN
    val o2 = Inversion.invertOne(crLut, 0.1, PxIn(0, 0, 30.0, -10.0, -25.0, 0.1, nan, nan))
    assert(o2.coRe.isNaN && o2.crRe.isNaN) // copol present + NaN ancillary → NaN
  }

  test("dualpol blend keeps copol wind below 5 m/s (windspeed.py:424-428)") {
    import spark.implicits._
    val df = Seq(
      (3.0, 0.0, 3.0, 8.0, 0.0, 8.0),   // ws_co < 5 → copol kept
      (10.0, 0.0, 10.0, 9.0, 1.0, 9.1)  // both ≥ 5 → dual kept
    ).toDF("coRe", "coIm", "coWspd", "crRe", "crIm", "crWspd")
    val r = Inversion.dualpolBlend(df).select("wspd").as[Double].collect()
    assert(math.abs(r(0) - 3.0) < 1e-12)
    assert(math.abs(r(1) - 9.1) < 1e-12)
  }
}
