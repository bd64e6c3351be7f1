package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.Gmf

/** ScalaCheck property tests (SURVEY.md §5c): convention-conversion
  * roundtrips, dB↔linear, inversion-recovers-forward-model across the
  * domain, scalar-side — the Column versions are covered by the oracle gate.
  * (Deterministic seed; no scalatestplus bridge in the offline cache.)
  */
class PropertySpec extends AnyFunSuite {

  private def forAll[A](g: Gen[A])(f: A => Unit): Unit = {
    var seed = Seed(42L)
    (1 to 200).foreach { _ =>
      f(g.pureApply(Gen.Parameters.default, seed))
      seed = seed.next
    }
  }
  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb))(t => f(t._1, t._2))
  private def forAll[A, B, C](ga: Gen[A], gb: Gen[B], gc: Gen[C])(f: (A, B, C) => Unit): Unit =
    forAll(Gen.zip(ga, gb, gc))(t => f(t._1, t._2, t._3))

  private def pmod(a: Double, m: Double): Double = ((a % m) + m) % m
  val dirGen: Gen[Double] = Gen.choose(0.0, 360.0)

  test("meteo↔oceano conversions roundtrip (E3/E4)") {
    forAll(dirGen) { d =>
      val there = pmod(d + 180.0, 360.0)
      val back = pmod(there - 180.0, 360.0)
      assert(math.abs(back - pmod(d, 360.0)) < 1e-9)
    }
  }

  test("dir_to_180 wraps into [-180, 180) and preserves angle mod 360 (E5)") {
    forAll(Gen.choose(-1000.0, 1000.0)) { d =>
      val w = pmod(d + 180.0, 360.0) - 180.0
      assert(w >= -180.0 && w < 180.0)
      assert(math.abs(pmod(w - d, 360.0)) < 1e-9 || math.abs(pmod(w - d, 360.0) - 360.0) < 1e-9)
    }
  }

  test("dB ↔ linear roundtrips within epsilon floor (E7)") {
    forAll(Gen.choose(1e-10, 10.0)) { x =>
      val db = 10.0 * math.log10(x + 1e-15)
      val back = math.pow(10.0, db / 10.0)
      assert(math.abs(back - x) / x < 1e-9)
    }
  }

  test("copol GMFs are 360-periodic and 180-symmetric in phi") {
    forAll(Gen.choose(17.0, 60.0), Gen.choose(1.0, 45.0), Gen.choose(0.0, 180.0)) {
      (inc, w, phi) =>
        assert(math.abs(Gmf.cmod5n(inc, w, phi) - Gmf.cmod5n(inc, w, phi + 360.0)) < 1e-12)
        assert(math.abs(Gmf.cmod5n(inc, w, phi) - Gmf.cmod5n(inc, w, -phi)) < 1e-12)
    }
  }

  test("VH GMFs are monotone increasing in wind speed over the validity range") {
    forAll(Gen.choose(17.0, 60.0), Gen.choose(3.0, 79.0)) { (inc, w) =>
      assert(Gmf.s1V2(inc, w + 0.5) > Gmf.s1V2(inc, w))
      assert(Gmf.rs2V2(inc, w + 0.5) > Gmf.rs2V2(inc, w))
    }
  }

  test("crosspol inversion recovers any forward-model wind within one step") {
    val luts = new graft.operators.Inversion.InvLuts(
      graft.models.Lut(Array.empty, Array.empty, Array.empty, Array.empty, "dB"),
      false, Array.empty, Array.empty,
      graft.operators.Inversion.toDbValues(
        graft.models.ModelRegistry.get("gmf_s1_v2").toLut(highRes = true)))
    forAll(Gen.choose(17.0, 60.0), Gen.choose(3.1, 79.9)) { (inc, truth) =>
      val s0 = 10.0 * math.log10(Gmf.s1V2(inc, truth) + 1e-15)
      val out = graft.operators.Inversion.invertOne(luts, 0.1,
        graft.operators.Inversion.PxIn(0, 0, inc, Double.NaN, s0, 0.1, Double.NaN, Double.NaN))
      // tolerance: one wspd step + one more for the nearest-incidence
      // discretization (±0.05° maps to an extra bin where ∂σ/∂w flattens
      // at high wind — inherent to windspeed.py:212-213 nearest semantics)
      assert(math.abs(out.crRe - truth) <= 0.2 + 1e-9, s"inc=$inc truth=$truth got=${out.crRe}")
    }
  }

  test("histogram bin mapping covers [0,71] for all angles") {
    forAll(Gen.choose(-math.Pi / 2, math.Pi / 2)) { angle =>
      val bin = math.min(math.floor((angle + math.Pi / 2) / (math.Pi / 72)).toInt, 71)
      assert(bin >= 0 && bin <= 71)
    }
  }
}
