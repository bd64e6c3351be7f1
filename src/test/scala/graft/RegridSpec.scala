package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Gmf
import graft.models.ModelRegistry

/** M6 multilinear regrid (models.py:154-167). */
class RegridSpec extends AnyFunSuite {

  test("regrid is exact at source grid points") {
    val low = ModelRegistry.get("gmf_s1_v2").toLut()
    val re = low.regrid(low.inc, low.wspd, Array.empty)
    assert(re.values.zip(low.values).forall { case (a, b) => math.abs(a - b) < 1e-12 })
  }

  test("regrid midpoints are the neighbor average (bilinear, 2-D)") {
    val low = ModelRegistry.get("gmf_s1_v2").toLut()
    val midW = (low.wspd(10) + low.wspd(11)) / 2
    val re = low.regrid(Array(low.inc(5)), Array(midW), Array.empty)
    val expect = (low(5, 10) + low(5, 11)) / 2
    assert(math.abs(re.values(0) - expect) < 1e-12)
  }

  test("low-res + interp approximates direct high-res eval (crosspol)") {
    val m = ModelRegistry.get("gmf_s1_v2")
    val interp = m.toLutInterpolated()
    val direct = m.toLut(highRes = true)
    assert(interp.inc.length == direct.inc.length && interp.wspd.length == direct.wspd.length)
    // GMFs are smooth: linear interp on a 0.2 m/s grid is accurate to well
    // under 1% relative over the validity range
    val relErrs = interp.values.zip(direct.values).map { case (a, b) =>
      math.abs(a - b) / math.max(math.abs(b), 1e-12)
    }
    assert(relErrs.max < 0.01, s"max rel err ${relErrs.max}")
  }

  test("trilinear regrid on copol LUT matches direct eval within tolerance") {
    val m = ModelRegistry.get("gmf_cmod5n")
    val low = m.toLut()
    // probe a handful of off-grid points against the analytic function
    for ((i, w, p) <- Seq((20.5, 10.1, 46.25), (33.3, 25.7, 121.25))) {
      val re = low.regrid(Array(i), Array(w), Array(p))
      val exact = Gmf.cmod5n(i, w, p)
      assert(math.abs(re.values(0) - exact) / exact < 0.01,
        s"($i,$w,$p): ${re.values(0)} vs $exact")
    }
  }

  test("regrid outside bounds raises (bounds_error=True)") {
    val low = ModelRegistry.get("gmf_s1_v2").toLut()
    intercept[IllegalArgumentException] {
      low.regrid(Array(10.0), Array(5.0), Array.empty)
    }
  }
}
