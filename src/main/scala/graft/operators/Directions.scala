package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Direction-convention and unit conversions (reference detrend.py:96-201,
  * models.py:215-221, windspeed.py:126-128). All pure Column arithmetic —
  * whole-stage codegen, no shuffle, no UDF.
  *
  * Conventions: meteo = direction wind comes FROM, clockwise from north;
  * oceano = direction wind goes TO; sample = trigonometric angle in radians
  * relative to the antenna sample axis.
  */
object Directions {

  /** E1 (detrend.py:96-111): meteo deg → sample-axis rad. */
  def meteoToSample(meteoDir: Column, groundHeading: Column): Column =
    lit(math.Pi / 2) - radians(meteoDir - groundHeading)

  /** E2 (detrend.py:114-129): sample-axis angle → meteo deg.
    *
    * NOTE an intentional convention difference from the reference: the
    * reference's `dir_sample_to_meteo` takes DEGREES; this takes RADIANS so
    * that `sampleToMeteo(meteoToSample(d, h), h) == d` round-trips with E1
    * (which produces radians). Callers porting reference code that passes
    * degrees must `radians(...)` first.
    */
  def sampleToMeteo(sampleDir: Column, groundHeading: Column): Column =
    lit(90.0) - degrees(sampleDir) + groundHeading

  /** E3 (detrend.py:132-147). */
  def meteoToOceano(d: Column): Column = pmod(d + lit(180.0), lit(360.0))

  /** E4 (detrend.py:150-165). */
  def oceanoToMeteo(d: Column): Column = pmod(d - lit(180.0), lit(360.0))

  /** E5 (detrend.py:168-183): wrap to [-180, 180). */
  def dirTo180(d: Column): Column = pmod(d + lit(180.0), lit(360.0)) - lit(180.0)

  /** E6 (detrend.py:186-201): wrap to [0, 360). */
  def dirTo360(d: Column): Column = pmod(d + lit(360.0), lit(360.0))

  /** E7 (models.py:215-221): linear → dB with the reference's epsilon guard. */
  def toDb(linear: Column): Column = lit(10.0) * log10(linear + lit(1e-15))

  /** E7 inverse (windspeed.py:126-128). */
  def toLinear(db: Column): Column = pow(lit(10.0), db / lit(10.0))

  /** E10: complex antenna-convention wind encode from U/V model components
    * (windspeed_retrieval_L1 notebook; test/test_xsarsea.py:87-88).
    */
  def ancillaryWindRe(spd: Column, dirSampleRad: Column): Column = spd * cos(dirSampleRad)
  def ancillaryWindIm(spd: Column, dirSampleRad: Column): Column = spd * sin(dirSampleRad)

  /** E11: wind decode — speed and meteo direction from re/im (windspeed.py:422). */
  def windSpeed(re: Column, im: Column): Column = hypot(re, im)
  def windDirMeteo(re: Column, im: Column, groundHeading: Column): Column =
    pmod(lit(90.0) - degrees(atan2(im, re)) + groundHeading, lit(360.0))
}
