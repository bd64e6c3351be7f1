package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Gmf
import graft.models.ModelRegistry

/** Golden values: the reference publishes no numeric tests, so these pins
  * were evaluated from the reference's own closed-form coefficient sets
  * (gmfs_impl.py) with numpy float64 — reproducible exactly per FIXTURES.md §3.
  */
class GmfSpec extends AnyFunSuite {
  val eps = 1e-12

  def near(a: Double, b: Double): Unit =
    assert(math.abs(a - b) <= eps * math.max(1.0, math.abs(b)), s"$a != $b")

  test("cmod5 matches reference formula at pinned points") {
    near(Gmf.cmod5(17.0, 0.5, 0.0), 0.2793919772293649)
    near(Gmf.cmod5(25.0, 10.0, 45.0), 0.2380789780126059)
    near(Gmf.cmod5(40.0, 10.0, 45.0), 0.03661042907897672)
    near(Gmf.cmod5(40.0, 25.0, 90.0), 0.10122941617440903)
    near(Gmf.cmod5(55.0, 3.0, 180.0), 0.0025196662499063294)
    near(Gmf.cmod5(35.0, 49.0, 137.5), 0.27253988290270037)
    near(Gmf.cmod5(30.0, 0.2, 10.0), 0.0017420870782551068) // s<s0 branch
  }

  test("cmod5n matches reference formula at pinned points") {
    near(Gmf.cmod5n(17.0, 0.5, 0.0), 0.2269121842917431)
    near(Gmf.cmod5n(25.0, 10.0, 45.0), 0.221159835585956)
    near(Gmf.cmod5n(40.0, 10.0, 45.0), 0.032308167286175714)
    near(Gmf.cmod5n(40.0, 25.0, 90.0), 0.09648316737569881)
    near(Gmf.cmod5n(55.0, 3.0, 180.0), 0.0019049665744241124)
    near(Gmf.cmod5n(35.0, 49.0, 137.5), 0.272308817700265)
    near(Gmf.cmod5n(30.0, 0.2, 10.0), 0.0007655172901458221)
  }

  test("s1_v2 matches reference formula at pinned points") {
    near(Gmf.s1V2(25.0, 3.0), 4.421830704559354e-05)
    near(Gmf.s1V2(35.0, 15.0), 0.0016091678171579853)
    near(Gmf.s1V2(45.0, 80.0), 0.025233882147580437)
    near(Gmf.s1V2(20.0, 7.3), 0.0003861924162625461)
  }

  test("v4 variants apply the 1.01 b0_Z2 tweak (gmfs_impl.py:662,701)") {
    assert(Gmf.rs2V4(30.0, 10.0) !== Gmf.rs2V3(30.0, 10.0))
    assert(Gmf.rcmV4(30.0, 10.0) !== Gmf.rcmV3(30.0, 10.0))
  }

  test("phi periodicity: copol GMFs symmetric about 0/360") {
    for (m <- Seq(Gmf.cmod5, Gmf.cmod5n)) {
      assert(math.abs(m(30.0, 10.0, 30.0) - m(30.0, 10.0, 330.0)) < 1e-12)
    }
  }

  test("registry: 14 models, alias resolution, catalog") {
    assert(ModelRegistry.all.size == 14)
    assert(ModelRegistry.get("cmod5n").name == "gmf_cmod5n")
    assert(ModelRegistry.get("gmf_s1_v2").pol == "VH")
    intercept[NoSuchElementException](ModelRegistry.get("nope"))
  }

  test("LUT materialization: low-res copol grid shape matches models.py:42-44") {
    val lut = ModelRegistry.get("gmf_cmod5n").toLut()
    assert(lut.inc.length == 51)    // 16..66 step 1
    assert(lut.wspd.length == 250)  // 0.2..50 step 0.2
    assert(lut.phi.length == 73)    // 0..180 step 2.5
    assert(lut.values.length == 51 * 250 * 73)
    // cell value equals direct evaluation
    val v = lut(10, 49, 18)
    near(v, Gmf.cmod5n(lut.inc(10), lut.wspd(49), lut.phi(18)))
  }

  test("crosspol LUT is 2-D and nearest-incidence lookup works") {
    val lut = ModelRegistry.get("gmf_s1_v2").toLut()
    assert(!lut.hasPhi)
    assert(lut.nearestInc(33.4) == ((33.4 - 16.0).round.toInt))
    assert(lut.nearestInc(15.0) == 0 && lut.nearestInc(90.0) == lut.inc.length - 1)
  }

  test("probing registration guesses phi periodicity like the reference (gmfs.py:145-158)") {
    import graft.models.ModelRegistry
    // cmod5n is cos-series symmetric: f(phi) == f(-phi) → [0, 180]
    val sym = ModelRegistry.registerProbed("probe_sym", "VV", "linear", graft.functions.Gmf.cmod5n)
    assert(sym.phiRange == ((0.0, 180.0)))
    // an asymmetric toy: sin term breaks f(phi) == f(-phi) → [0, 360]
    val asym = ModelRegistry.registerProbed("probe_asym", "VV", "linear",
      (i: Double, w: Double, p: Double) => 1e-3 * (1 + 0.5 * math.sin(math.toRadians(p))) * w / i)
    assert(asym.phiRange == ((0.0, 360.0)))
    // phi-less crosspol path registers without phi
    val cross = ModelRegistry.registerProbed("probe_cross", "VH", "linear",
      (i: Double, w: Double) => 1e-4 * w / i, (3.0, 80.0))
    assert(!cross.hasPhi)
  }
}
