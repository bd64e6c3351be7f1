package graft

import org.apache.spark.sql.functions._
import graft.operators.ZOrder

/** Z-order gates: closed-form interleave values, and the data-skipping
  * effect MEASURED — per-file min/max envelopes over a secondary filter
  * dimension must shrink from "every file intersects" (linear layout) to
  * a small fraction (z-ordered layout).
  */
class ZOrderSpec extends SparkSpec {

  test("zValue matches hand-computed Morton codes") {
    import spark.implicits._
    val df = Seq((0, 0), (1, 0), (0, 1), (1, 1), (2, 0), (0, 2), (3, 5), (255, 255))
      .toDF("x", "y")
    val got = df.select(col("x"), col("y"),
      ZOrder.zValue(Seq(col("x"), col("y")), bits = 8).as("z"))
      .as[(Int, Int, Long)].collect().map { case (x, y, z) => (x, y) -> z }.toMap
    def morton(x: Int, y: Int): Long =
      (0 until 8).map(b => (((x >> b) & 1).toLong << (2 * b)) |
        (((y >> b) & 1).toLong << (2 * b + 1))).sum
    got.foreach { case ((x, y), z) => assert(z == morton(x, y), s"($x,$y)") }
    assert(got((1, 0)) == 1L && got((0, 1)) == 2L && got((1, 1)) == 3L)
    assert(got((255, 255)) == 65535L)
    // three-column interleave stays within a long and is injective on a sample
    val z3 = ZOrder.zValue(Seq(col("x"), col("y"), col("x") + col("y")), bits = 8)
    assert(df.select(z3).distinct().count() == df.distinct().count())
  }

  test("z-ordered files bound BOTH dimensions; linear layout only the first") {
    import spark.implicits._
    val n = 64
    val grid = (for { x <- 0 until n; y <- 0 until n } yield (x, y))
      .toDF("x", "y").repartition(8) // arrival order is random-ish
    val base = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    // linear: sort by x only — y is unconstrained within every file
    grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(s"$base/linear")
    ZOrder.clusterWrite(grid, s"$base/zorder", Seq("x", "y"), bits = 6, files = 16)

    // the box a two-dimension filter would probe
    val (yLo, yHi) = (8, 15)
    def intersectingFiles(dir: String): (Int, Int) = {
      val files = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSeq
      val hit = files.count { f =>
        val r = spark.read.parquet(f).agg(min(col("y")), max(col("y"))).head()
        r.getInt(0) <= yHi && r.getInt(1) >= yLo // file's y-envelope meets the box
      }
      (hit, files.size)
    }
    val (linHit, linTotal) = intersectingFiles(s"$base/linear")
    val (zHit, zTotal) = intersectingFiles(s"$base/zorder")
    assert(linTotal == 16 && zTotal == 16)
    assert(linHit == linTotal,
      s"x-sorted files should ALL intersect a y-box ($linHit/$linTotal)")
    assert(zHit <= zTotal / 2,
      s"z-ordered files must skip most of a y-box scan ($zHit/$zTotal)")
    // and the data survives intact
    assert(spark.read.parquet(s"$base/zorder").count() == n.toLong * n)
  }
}
