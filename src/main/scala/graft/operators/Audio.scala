package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import graft.sources.Wav
import Multimodal.MediaRow

/** Audio-column operators over real WAV containers: encode raw PCM byte
  * payloads as RIFF/WAVE, decode, and rational-ratio linear resampling —
  * the normalization step an audio training corpus needs (models want one
  * sample rate; crawls deliver many).
  *
  * Scale shape: per-partition kernels, payloads never shuffle (the
  * [[Multimodal]] discipline). Resampling emits bounded per-clip stats or
  * resampled payloads 1:1 with input rows — no fan-out.
  */
object Audio {

  /** Raw PCM payloads (little-endian int16, trailing odd byte dropped) →
    * real `.wav` payloads at `sampleRate`. */
  def wavEncode(media: Dataset[MediaRow], sampleRate: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map { m =>
      val b = if (m.payload == null) Array.empty[Byte] else m.payload
      val n = b.length / 2
      val samples = Array.tabulate(n) { i =>
        val v = (b(2 * i) & 0xff) | ((b(2 * i + 1) & 0xff) << 8)
        if (v >= 0x8000) v - 0x10000 else v
      }
      m.copy(kind = "wav", payload = Wav.write(Wav.Pcm(sampleRate, 1, samples)))
    }
  }

  /** Linear resampling of int16 samples by the rational ratio
    * `num/den` (output rate = input rate × num/den). Output sample j sits
    * at source position `p = j·den/num`; with den/num a dyadic-friendly
    * ratio the interpolation weights are exact in doubles, so results are
    * engine-exact (the correctness gate exploits this; real ratios are
    * just as valid, merely float-rounded). Half-up rounding to int16.
    */
  private[graft] def resample(samples: Array[Int], num: Int, den: Int): Array[Int] = {
    val n = samples.length
    if (n == 0) return Array.emptyIntArray
    val m = ((n - 1).toLong * num / den).toInt + 1
    Array.tabulate(m) { j =>
      val i0 = (j.toLong * den / num).toInt
      val fr = (j.toLong * den % num).toDouble / num
      val a = samples(i0)
      val b = if (i0 + 1 < n) samples(i0 + 1) else a
      math.floor(a + (b - a) * fr + 0.5).toInt
    }
  }

  /** Interleaved multi-channel resampling: de-interleave, run [[resample]]
    * per channel, re-interleave — interpolating across the raw interleaved
    * stream would mix L into R and desync the channels. A trailing partial
    * frame (stream length not a channel multiple) is dropped.
    */
  private[graft] def resampleInterleaved(samples: Array[Int], channels: Int,
      num: Int, den: Int): Array[Int] = {
    require(channels >= 1, s"channels=$channels")
    if (channels == 1) resample(samples, num, den)
    else {
      val frames = samples.length / channels
      val perCh = Array.tabulate(channels) { c =>
        resample(Array.tabulate(frames)(i => samples(i * channels + c)), num, den)
      }
      val m = if (frames == 0) 0 else perCh(0).length
      val out = new Array[Int](m * channels)
      var j = 0
      while (j < m) {
        var c = 0
        while (c < channels) { out(j * channels + c) = perCh(c)(j); c += 1 }
        j += 1
      }
      out
    }
  }

  /** WAV payloads → resampled WAV payloads at rate·num/den. */
  def wavResample(media: Dataset[MediaRow], num: Int, den: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map { m =>
      if (m.payload == null || m.payload.isEmpty) m
      else {
        val pcm = Wav.read(m.payload)
        m.copy(payload = Wav.write(Wav.Pcm(pcm.sampleRate * num / den, pcm.channels,
          resampleInterleaved(pcm.samples, pcm.channels, num, den))))
      }
    }
  }

  /** WAV payloads → per-clip resample audit row:
    * `(media_id, rate_in, rate_out, n_in, n_out, sum_out, max_out)` —
    * integer-exact, the oracle shape. */
  def resampleStats(media: Dataset[MediaRow], num: Int, den: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      if (m.payload == null || m.payload.isEmpty) None
      else {
        val pcm = Wav.read(m.payload)
        val out = resampleInterleaved(pcm.samples, pcm.channels, num, den)
        Some((m.media_id, pcm.sampleRate, pcm.sampleRate * num / den,
          pcm.samples.length.toLong, out.length.toLong,
          out.foldLeft(0L)(_ + _), if (out.isEmpty) 0 else out.max))
      }
    }.toDF("media_id", "rate_in", "rate_out", "n_in", "n_out", "sum_out", "max_out")
  }
}
