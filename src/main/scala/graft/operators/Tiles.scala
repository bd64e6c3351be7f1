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

  /** Run a masked neighborhood kernel of the given radius over a
    * (line, sample, v) grid.
    *
    * @param kernel (values, presentMask) over the (2r+1)² row-major
    *               neighborhood (NW..SE) of a *present* center pixel →
    *               Some((a, b)) to emit, None to drop.
    */
  def stencil(grid: DataFrame, tileSize: Int, radius: Int)(
      kernel: (Array[Double], Array[Boolean]) => Option[(Double, Double)]): DataFrame = {
    val spark = grid.sparkSession
    import spark.implicits._
    val t = tileSize
    require(t >= radius, s"tile $t must be >= kernel radius $radius (map_overlap rule)")
    val halo = radius

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

    val side = 2 * radius + 1
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
        Iterator.range(0, t).flatMap { li =>
          Iterator.range(0, t).flatMap { si =>
            val l = tl * t + li; val s = ts * t + si
            val ci = (l - l0) * w + (s - s0)
            if (!present(ci)) Iterator.empty
            else {
              val nb = new Array[Double](side * side)
              val mask = new Array[Boolean](side * side)
              var k = 0
              var dl = -radius
              while (dl <= radius) {
                var ds = -radius
                while (ds <= radius) {
                  val j = ci + dl * w + ds
                  mask(k) = present(j)
                  if (present(j)) nb(k) = vals(j)
                  k += 1; ds += 1
                }
                dl += 1
              }
              kernel(nb, mask) match {
                case Some((a, b)) => Iterator.single(StencilOut(l, s, a, b))
                case None => Iterator.empty
              }
            }
          }
        }
      }
      .toDF()
  }

  /** 3×3 full-neighborhood kernel (inner-join semantics: pixels with any
    * missing neighbor are dropped — matches the relational 8-join oracle).
    */
  def stencil3x3(grid: DataFrame, tileSize: Int)(
      kernel: Array[Double] => (Double, Double)): DataFrame =
    stencil(grid, tileSize, 1) { (nb, mask) =>
      if (mask.forall(identity)) Some(kernel(nb)) else None
    }
}
