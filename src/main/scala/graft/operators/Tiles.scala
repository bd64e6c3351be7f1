package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Tile+halo execution layer for 2-D stencils — the Spark analogue of the
  * reference's dask `map_overlap` (gradients.py:658-667, SURVEY.md §4.1).
  *
  * Long-format pixels are flatMapped to their owning tile plus any neighbor
  * tiles whose halo they fall in, grouped by tile id (ONE shuffle whose
  * volume is `(1 + 2·halo/tileSize)²` × the raster — ~6% duplication for
  * 64-px tiles with a 1-px halo), then each tile materializes a dense
  * (T+2h)² array and runs the kernel over the pixels it owns.
  *
  * At 100 TB this is the only viable shape: neighborhoods never cross
  * executors, tile state is O(tileSize²) — far under spill thresholds
  * (SURVEY.md §4.3) — and the shuffle partitions by tile id, which is
  * uniform by construction (no skew).
  */
object Tiles {

  final case class TilePx(tl: Int, ts: Int, line: Int, sample: Int, v: Double)

  /** Emitted cell: a pixel owned by the tile with its dense neighborhood. */
  final case class StencilOut(line: Int, sample: Int, a: Double, b: Double)

  /** Run a 3×3-neighborhood kernel over a (line, sample, v) grid.
    *
    * @param kernel given the 9 neighborhood values (row-major, NW..SE),
    *               returns the two output channels. Only pixels whose full
    *               3×3 neighborhood is present are emitted (inner-join
    *               semantics — matches the relational oracle and avoids
    *               boundary-policy ambiguity at scene edges).
    */
  def stencil3x3(grid: DataFrame, tileSize: Int)(
      kernel: Array[Double] => (Double, Double)): DataFrame = {
    val spark = grid.sparkSession
    import spark.implicits._
    val t = tileSize
    val halo = 1

    val tiled: Dataset[TilePx] = grid
      .select(col("line").cast("int"), col("sample").cast("int"), col("v").cast("double"))
      .as[(Int, Int, Double)]
      .flatMap { case (l, s, v) =>
        // tiles that need this pixel: owner + any neighbor within the halo
        val tl0 = Math.floorDiv(l, t); val ts0 = Math.floorDiv(s, t)
        for {
          dl <- -1 to 1
          ds <- -1 to 1
          tl = tl0 + dl
          ts = ts0 + ds
          if tl >= 0 && ts >= 0 &&
            l >= tl * t - halo && l <= tl * t + t - 1 + halo &&
            s >= ts * t - halo && s <= ts * t + t - 1 + halo
        } yield TilePx(tl, ts, l, s, v)
      }

    tiled
      .groupByKey(p => (p.tl, p.ts))
      .flatMapGroups { (key: (Int, Int), it: Iterator[TilePx]) =>
        val (tl, ts) = key
        val w = t + 2 * halo
        val vals = new Array[Double](w * w)
        val present = new Array[Boolean](w * w)
        val l0 = tl * t - halo; val s0 = ts * t - halo
        it.foreach { p =>
          val i = (p.line - l0) * w + (p.sample - s0)
          vals(i) = p.v; present(i) = true
        }
        val out = Iterator.range(0, t).flatMap { li =>
          Iterator.range(0, t).flatMap { si =>
            val l = tl * t + li; val s = ts * t + si
            val ci = (l - l0) * w + (s - s0)
            val nb = new Array[Double](9)
            var ok = true
            var k = 0
            var dl = -1
            while (dl <= 1) {
              var ds = -1
              while (ds <= 1) {
                val j = ci + dl * w + ds
                if (!present(j)) ok = false else nb(k) = vals(j)
                k += 1; ds += 1
              }
              dl += 1
            }
            if (ok) {
              val (a, b) = kernel(nb)
              Iterator.single(StencilOut(l, s, a, b))
            } else Iterator.empty
          }
        }
        out
      }
      .toDF()
  }
}
