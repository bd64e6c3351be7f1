package graft.functions

import java.lang.Math._

/** Geophysical model functions: sigma0_linear = f(incidence_deg, wspd_ms, phi_deg).
  *
  * Pure scalar doubles — used by the inversion kernel's LUT materialization
  * (driver-side) and by specs; the DataFrame surface uses [[GmfColumns]]
  * (same math as codegen'd Column expressions).
  *
  * Formula provenance (reference file:line under /root/reference/src/xsarsea/windspeed/):
  *  - CMOD5 / CMOD5N Fourier-series GMF: gmfs_impl.py:116-203, coeffs :23-55 / :59-92
  *  - Zhang-A HH polarization ratio: gmfs_impl.py:94-98, applied :165-172
  *  - Mouche-1 HH polarization ratio: gmfs_impl.py:100-114, applied :174-199
  *  - CMOD-IFR2 Legendre/Chebyshev GMF: gmfs_impl.py:213-303
  *  - VH two-power-law sigmoid blends (rs2_v2/s1_v2/rcm_noaa): gmfs_impl.py:325-514
  *  - VH dB-space blends (s1_v3_ew_rec/rs2_v3/rcm_v3/rcm_v4/rs2_v4): gmfs_impl.py:517-707
  *  - gmf_dummy power law: /root/reference/test/test_xsarsea.py:8-21
  */
object Gmf {

  private val cmod5C = Array(0.0, -0.688, -0.793, 0.338, -0.173, 0.0, 0.004, 0.111,
    0.0162, 6.34, 2.57, -2.18, 0.4, -0.6, 0.045, 0.007, 0.33, 0.012, 22.0, 1.95,
    3.0, 8.39, -3.44, 1.36, 5.35, 1.99, 0.29, 3.80, 1.53)

  private val cmod5nC = Array(0.0, -0.6878, -0.7957, 0.338, -0.1728, 0.0, 0.004, 0.1103,
    0.0159, 6.7329, 2.7713, -2.2885, 0.4971, -0.725, 0.045, 0.0066, 0.3222, 0.012, 22.7,
    2.0813, 3.0, 8.3659, -3.3428, 1.3236, 6.2437, 2.3893, 0.3249, 4.159, 1.693)

  private def cmod5Generic(c: Array[Double])(inc: Double, wspd: Double, phi: Double): Double = {
    val zpow = 1.6; val thetm = 40.0; val thethr = 25.0
    val y0 = c(19); val pn = c(20)
    val a = y0 - (y0 - 1.0) / pn
    val b = 1.0 / (pn * pow(y0 - 1.0, pn - 1.0))
    val cosphi = cos(toRadians(phi))
    val x = (inc - thetm) / thethr
    val x2 = x * x
    val a0 = c(1) + c(2) * x + c(3) * x2 + c(4) * x * x2
    val a1 = c(5) + c(6) * x
    val a2 = c(7) + c(8) * x
    val gam = c(9) + c(10) * x + c(11) * x2
    val s0 = c(12) + c(13) * x
    val s = a2 * wspd
    var a3 = 1.0 / (1.0 + exp(-s0))
    if (s < s0) a3 = a3 * pow(s / s0, s0 * (1.0 - a3))
    else a3 = 1.0 / (1.0 + exp(-s))
    val b0 = pow(a3, gam) * pow(10.0, a0 + a1 * wspd)
    var b1 = c(15) * wspd * (0.5 + x - tanh(4.0 * (x + c(16) + c(17) * wspd)))
    b1 = (c(14) * (1.0 + x) - b1) / (exp(0.34 * (wspd - c(18))) + 1.0)
    val v0 = c(21) + c(22) * x + c(23) * x2
    val d1 = c(24) + c(25) * x + c(26) * x2
    val d2 = c(27) + c(28) * x
    var v2 = wspd / v0 + 1.0
    if (v2 < y0) v2 = a + b * pow(v2 - 1.0, pn)
    val b2 = (-d1 + d2 * v2) * exp(-v2)
    b0 * pow(1.0 + b1 * cosphi + b2 * (2.0 * cosphi * cosphi - 1.0), zpow)
  }

  val cmod5: (Double, Double, Double) => Double = cmod5Generic(cmod5C)
  val cmod5n: (Double, Double, Double) => Double = cmod5Generic(cmod5nC)

  /** HH via Zhang-A polarization ratio over CMOD5N (gmfs_impl.py:94-98, 165-172). */
  def cmod5nPrZhangA(inc: Double, wspd: Double, phi: Double): Double = {
    val ar = 1.3794 + (-3.19e-2) * inc + 1.4e-3 * inc * inc
    val br = -0.1711 + 2.6e-3 * inc
    cmod5n(inc, wspd, phi) / (ar * pow(wspd, br))
  }

  /** HH via Mouche et al. (2005) polarization ratio (gmfs_impl.py:100-114, 174-199). */
  def cmod5nPrMouche1(inc: Double, wspd: Double, phi: Double): Double = {
    val p0 = 0.00650704 * exp(0.128983 * inc) + 0.992839
    val ppi2 = 0.00782194 * exp(0.121405 * inc) + 0.992839
    val ppi = 0.00598416 * exp(0.140952 * inc) + 0.992885
    val c0 = (p0 + ppi + 2 * ppi2) / 4
    val c1 = (p0 - ppi) / 2
    val c2 = (p0 + ppi - 2 * ppi2) / 4
    val pr = c0 + c1 * cos(toRadians(phi)) + c2 * cos(2 * toRadians(phi))
    cmod5n(inc, wspd, phi) / pr
  }

  /** CMOD-IFR2 (gmfs_impl.py:213-303). */
  def cmodifr2(inc: Double, wspd: Double, phi: Double): Double = {
    val C = Array(0.0, -2.437597, -1.5670307, 0.3708242, -0.040590, 0.404678, 0.188397,
      -0.027262, 0.064650, 0.054500, 0.086350, 0.055100, -0.058450, -0.096100, 0.412754,
      0.121785, -0.024333, 0.072163, -0.062954, 0.015958, -0.069514, -0.062945, 0.035538,
      0.023049, 0.074654, -0.014713)
    val tetai = (inc - 36.0) / 19.0
    val xSQ = tetai * tetai
    val p1 = tetai
    val p2 = (3.0 * xSQ - 1.0) / 2.0
    val p3 = (5.0 * xSQ - 3.0) * tetai / 2.0
    val alph = C(1) + C(2) * p1 + C(3) * p2 + C(4) * p3
    val beta = C(5) + C(6) * p1 + C(7) * p2
    val cosi = cos(toRadians(phi))
    val cos2i = 2.0 * cosi * cosi - 1.0
    val tetanor = (2.0 * inc - (18.0 + 58.0)) / (58.0 - 18.0)
    val vitnor = (2.0 * wspd - (25.0 + 3.0)) / (25.0 - 3.0)
    val pv1 = vitnor
    val pv2 = 2 * vitnor * pv1 - 1.0
    val pv3 = 2 * vitnor * pv2 - pv1
    val pt1 = tetanor
    val pt2 = 2 * tetanor * pt1 - 1.0
    val b1 = C(8) + C(9) * pv1 + (C(10) + C(11) * pv1) * pt1 + (C(12) + C(13) * pv1) * pt2
    val b2 = C(14) + C(15) * pt1 + C(16) * pt2 +
      (C(17) + C(18) * pt1 + C(19) * pt2) * pv1 +
      (C(20) + C(21) * pt1 + C(22) * pt2) * pv2 +
      (C(23) + C(24) * pt1 + C(25) * pt2) * pv3
    val b0 = pow(10.0, alph + beta * sqrt(wspd))
    b0 * (1.0 + b1 * cosi + tanh(b2) * cos2i)
  }

  /** VH linear-space sigmoid blend template (gmfs_impl.py:325-514). */
  private def vhBlend(z1: Array[Double], z2: Array[Double], fp: Array[Double])(
      inc: Double, u10: Double): Double = {
    val sigZ1 = z1(0) * pow(u10, z1(1) + z1(2) * inc)
    val aZ2 = z2(0) + z2(1) * inc + z2(2) * inc * inc
    val bZ2 = z2(3) + z2(4) * inc + z2(5) * inc * inc
    val sigZ2 = aZ2 * pow(u10, bZ2)
    val s1 = 1.0 / (1.0 + exp(-fp(0) * (u10 - fp(1))))
    val s2 = 1.0 / (1.0 + exp(-fp(2) * (u10 - fp(3))))
    sigZ1 * s1 + sigZ2 * s2
  }

  /** VH dB-space sigmoid blend template (gmfs_impl.py:517-707). */
  private def vhBlendDb(z1: Array[Double], z2: Array[Double], fp: Array[Double],
      b0Z2Scale: Double = 1.0)(inc: Double, u10: Double): Double = {
    val sigZ1 = z1(0) * pow(u10, z1(1) + z1(2) * inc)
    val aZ2 = z2(0) + z2(1) * inc + z2(2) * inc * inc
    val bZ2 = z2(3) * b0Z2Scale + z2(4) * inc + z2(5) * inc * inc
    val sigZ2 = aZ2 * pow(u10, bZ2)
    val s1 = 1.0 / (1.0 + exp(-fp(0) * (u10 - fp(1))))
    val s2 = 1.0 / (1.0 + exp(-fp(2) * (u10 - fp(3))))
    pow(10.0, (10.0 * log10(sigZ1) * s1 + 10.0 * log10(sigZ2) * s2) / 10.0)
  }

  val rs2V2: (Double, Double) => Double = vhBlend(
    Array(6.55519203e-06, 2.49753154e00, -1.35734881e-02),
    Array(1.47342197e-04, -4.07334797e-06, 3.43593382e-08, 1.10188639e00, 1.40782758e-02, -1.53748743e-04),
    Array(-0.18675905, 24.48859492, 0.19185442, 25.38275738))

  val s1V2: (Double, Double) => Double = vhBlend(
    Array(2.13755392e-06, 2.47395267e00, -2.85775085e-03),
    Array(6.54058552e-05, -2.43845137e-06, 2.87698338e-08, 1.14509104e00, 3.41828829e-02, -4.79715441e-04),
    Array(-0.23257086, 12.39717002, 0.21667263, 12.22862991))

  val rcmNoaa: (Double, Double) => Double = vhBlend(
    Array(2.2309436836414871e-12, 8.3374911282878728, -0.033443488982800210),
    Array(7.7945050373193260e-05, -2.4425748662769216e-06, 2.7625550632547159e-08,
      1.2524896108831316, 0.019203092214131894, -0.00028408046502692580),
    Array(-0.34498737004629487, 12.558975188752012, 0.12713502524515713, 4.2806865431046752))

  val s1V3EwRec: (Double, Double) => Double = vhBlendDb(
    Array(3.5033427638479895e-06, 2.5486758595982275, -0.009042529888607539),
    Array(4.142689709809047e-05, -1.6620917447744406e-06, 2.4331104610101826e-08,
      1.277314996198736, 0.03813903872809897, -0.0006506765114704733),
    Array(-0.2522916645939956, 15.3393676653533, 0.24259895576004784, 15.203063214062643))

  private val rs2V3Z1 = Array(8.423384272498706e-06, 2.4351127340627374, -0.01450322326682606)
  private val rs2V3Z2 = Array(0.00014955206131320428, -4.737691852310481e-06, 3.813107432709729e-08,
    1.524883207000445, -0.01322253424944054, 0.00037527120092119504)
  private val rs2V3Fp = Array(-0.2222881984904166, 13.118282628673661, 0.21426139278646567, 12.768845054319682)

  val rs2V3: (Double, Double) => Double = vhBlendDb(rs2V3Z1, rs2V3Z2, rs2V3Fp)
  val rs2V4: (Double, Double) => Double = vhBlendDb(rs2V3Z1, rs2V3Z2, rs2V3Fp, b0Z2Scale = 1.01)

  private val rcmV3Z1 = Array(7.093964676135241e-06, 2.3722948391886542, -0.009516840375089524)
  private val rcmV3Z2 = Array(6.689451099284358e-05, -1.3956325894252652e-06, 9.227949977841212e-09,
    1.4687699534267797, 0.005735224541037088, -7.164130353316848e-05)
  private val rcmV3Fp = Array(-0.2454472887447197, 15.537961353644508, 0.24011368010838255, 15.332883245452303)

  val rcmV3: (Double, Double) => Double = vhBlendDb(rcmV3Z1, rcmV3Z2, rcmV3Fp)
  val rcmV4: (Double, Double) => Double = vhBlendDb(rcmV3Z1, rcmV3Z2, rcmV3Fp, b0Z2Scale = 1.01)

  /** The reference's user-registered example GMF (test/test_xsarsea.py:8-21). */
  def dummy(inc: Double, wspd: Double): Double = {
    val a = 0.00013106836021008122 + (-4.530598283705591e-06) * inc + 4.429277425062766e-08 * inc * inc
    val b = 1.3925444179360706 + 0.004157838450541205 * inc + 3.4735809771069953e-05 * inc * inc
    a * pow(wspd, b)
  }
}
