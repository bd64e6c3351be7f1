package graft

import graft.operators.Multimodal

/** Closed-form gates for the radix-2 FFT kernel: the properties any DFT
  * must satisfy, independent of the oracle's O(n²) spelling. */
class FftSpec extends SparkSpec {
  import spark.implicits._

  private val N = 64

  private def spectrumOf(samples: Array[Int]): Map[Int, Double] = {
    val payload = samples.map(_.toByte)
    val media = Seq(Multimodal.MediaRow(1L, "pcm8", payload, 0, 0)).toDS()
    Multimodal.fftSpectrum(media, N)
      .select($"bin", $"mag").as[(Int, Double)].collect().toMap
  }

  test("impulse has a flat spectrum") {
    val x = new Array[Int](N); x(0) = 200
    val sp = spectrumOf(x)
    assert(sp.size == N / 2 + 1)
    assert(sp.values.forall(m => math.abs(m - 200.0) < 1e-9),
      s"impulse spectrum must be flat at the impulse height: $sp")
  }

  test("constant signal concentrates all energy in the DC bin") {
    val sp = spectrumOf(Array.fill(N)(100))
    assert(math.abs(sp(0) - 100.0 * N) < 1e-9)
    assert((1 to N / 2).forall(k => sp(k) < 1e-8), s"non-DC leakage: $sp")
  }

  test("pure cosine at bin 5 puts N/2 of its amplitude there and nowhere else") {
    // 8-bit unsigned samples: offset 128 + 60·cos — the offset lands in DC
    val x = Array.tabulate(N)(n => (128 + 60.0 * math.cos(2 * math.Pi * 5 * n / N)).round.toInt)
    val sp = spectrumOf(x)
    // rounding of samples perturbs bins by <= N/2 per unit: allow 0.5·N/2
    assert(math.abs(sp(5) - 60.0 * N / 2) < N,
      s"bin 5 must carry the tone: ${sp(5)}")
    val leak = (1 to N / 2).filter(_ != 5).map(sp).max
    assert(leak < N, s"off-tone leakage too high: $leak")
  }

  test("Parseval: time energy equals spectral energy / N") {
    val x = Array.tabulate(N)(n => (n * 37 + 11) % 251)
    val re = x.map(_.toDouble)
    val im = new Array[Double](N)
    Multimodal.fftInPlace(re, im)
    val timeE = x.map(v => v.toDouble * v).sum
    val freqE = (0 until N).map(k => re(k) * re(k) + im(k) * im(k)).sum / N
    assert(math.abs(timeE - freqE) / timeE < 1e-12,
      s"Parseval violated: $timeE vs $freqE")
  }

  test("kernel matches a direct O(n²) DFT on arbitrary data") {
    val x = Array.tabulate(N)(n => (n * 73 + 5) % 256)
    val re = x.map(_.toDouble)
    val im = new Array[Double](N)
    Multimodal.fftInPlace(re, im)
    for (k <- 0 until N) {
      var dr = 0.0; var di = 0.0
      for (n <- 0 until N) {
        val ang = -2 * math.Pi * k * n / N
        dr += x(n) * math.cos(ang)
        di += x(n) * math.sin(ang)
      }
      assert(math.abs(dr - re(k)) < 1e-8 && math.abs(di - im(k)) < 1e-8,
        s"bin $k: fft (${re(k)},${im(k)}) vs dft ($dr,$di)")
    }
  }
}
