package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Generic stencil-chain fusion — the engine's answer to composed pyramid
  * operators (SURVEY.md §4.2 "collapse tile-halo duplication for composed
  * stencils").
  *
  * A chain of plane-local steps (renormalized dilated-B2 smoothing, 2×2
  * block-mean coarsening, point maps) normally costs one shuffle per step:
  * every stencil is its own tile+halo exchange. Fused, the whole chain runs
  * on a dense per-tile plane after ONE shuffle whose halo is the chain's
  * total reach, computed automatically by [[halo]]:
  *
  *   backward over steps:  Smooth(d) → need += d;   Coarsen2 → need ×= 2
  *
  * Exactness: each step shrinks the plane's exact region by its radius (at
  * the current resolution); owned output cells sit `halo` inside the plane
  * edge, so they only ever read cells whose true global neighborhoods were
  * in the plane — dask's `map_overlap` chunk rule generalized to a fused
  * multi-resolution chain.
  *
  * Semantics per step match the compositional operators exactly (same
  * weights, same accumulation order):
  *  - [[Smooth]](d) = [[Gradients.smoothB2]] for d=1, [[Gradients.smoothB2Dilated]] else;
  *  - [[Coarsen2]] = [[Gradients.coarsen]](…, 2) (mean over present cells);
  *  - [[Map1]] = a pointwise `withColumn`.
  * GradientsSpec asserts fused == chained to 1e-9 (the 2×2 mean's sum order
  * is the only ULP-level difference).
  */
object PlaneChain {

  sealed trait Step
  /** Renormalized B2 smoothing dilated by `d`: taps {-d,0,d}² × [1,2,1]²/16
    * with missing-neighbor renormalization. */
  final case class Smooth(d: Int) extends Step
  /** 2×2 block mean at the current resolution (present cells only); halves
    * the grid (block id = floorDiv(coord, 2)). */
  case object Coarsen2 extends Step
  /** Pointwise map on present cells. */
  final case class Map1(f: Double => Double) extends Step

  /** Fine-pixel halo required by `steps` (backward recurrence, see above). */
  def halo(steps: Seq[Step]): Int = steps.reverse.foldLeft(0) {
    case (n, Smooth(d)) => n + d
    case (n, Coarsen2)  => 2 * n
    case (n, Map1(_))   => n
  }

  /** Total downsampling factor of the chain. */
  def factor(steps: Seq[Step]): Int =
    steps.count(_ == Coarsen2) match { case c => 1 << c }

  final case class PcPx(tl: Int, ts: Int, l: Int, s: Int, v: Double)
  final case class PcOut(line: Int, sample: Int, v: Double)

  // a dense plane: values+presence over global cells [l0, l0+side) × [s0, s0+side)
  // (shared with localGradientsFused, the multi-channel fused chain)
  private[operators] final case class Plane(vals: Array[Double], pres: Array[Boolean],
      side: Int, l0: Int, s0: Int)

  private[operators] def smoothPlane(p: Plane, d: Int): Plane = {
    val side = p.side
    val out = new Array[Double](side * side)
    var r = 0
    while (r < side) {
      var c = 0
      while (c < side) {
        val i = r * side + c
        if (p.pres(i)) {
          var num = 0.0; var den = 0.0
          var dl = -1
          while (dl <= 1) {
            var ds = -1
            while (ds <= 1) {
              val rr = r + dl * d; val cc = c + ds * d
              if (rr >= 0 && rr < side && cc >= 0 && cc < side && p.pres(rr * side + cc)) {
                val w = (if (dl == 0) 2.0 else 1.0) * (if (ds == 0) 2.0 else 1.0)
                num += w * p.vals(rr * side + cc); den += w
              }
              ds += 1
            }
            dl += 1
          }
          out(i) = num / den
        }
        c += 1
      }
      r += 1
    }
    Plane(out, p.pres, side, p.l0, p.s0)
  }

  private[operators] def coarsenPlane(p: Plane): Plane = {
    // the square-plane shortcut below (single `side` for both axes) only
    // holds when l0 and s0 share parity — enforce the invariant
    require((p.l0 - p.s0) % 2 == 0,
      s"coarsenPlane requires l0/s0 parity equality (l0=${p.l0}, s0=${p.s0})")
    val nl0 = Math.floorDiv(p.l0, 2); val ns0 = Math.floorDiv(p.s0, 2)
    val side = Math.floorDiv(p.l0 + p.side - 1, 2) - nl0 + 1 // square plane; s-extent equal
    val vals = new Array[Double](side * side)
    val pres = new Array[Boolean](side * side)
    var cl = 0
    while (cl < side) {
      var cs = 0
      while (cs < side) {
        var sum = 0.0; var n = 0
        var fi = 0
        while (fi < 2) {
          var fj = 0
          while (fj < 2) {
            val fl = 2 * (nl0 + cl) + fi - p.l0
            val fs = 2 * (ns0 + cs) + fj - p.s0
            if (fl >= 0 && fl < p.side && fs >= 0 && fs < p.side && p.pres(fl * p.side + fs)) {
              sum += p.vals(fl * p.side + fs); n += 1
            }
            fj += 1
          }
          fi += 1
        }
        if (n > 0) { vals(cl * side + cs) = sum / n; pres(cl * side + cs) = true }
        cs += 1
      }
      cl += 1
    }
    Plane(vals, pres, side, nl0, ns0)
  }

  private def mapPlane(p: Plane, f: Double => Double): Plane = {
    val out = new Array[Double](p.side * p.side)
    var i = 0
    while (i < out.length) { if (p.pres(i)) out(i) = f(p.vals(i)); i += 1 }
    Plane(out, p.pres, p.side, p.l0, p.s0)
  }

  /** Run the fused chain over a (line, sample, v) grid. `tileSize` is the
    * tile side at OUTPUT resolution.
    */
  def run(grid: DataFrame, steps: Seq[Step], tileSize: Int = 32): DataFrame = {
    val spark = grid.sparkSession
    import spark.implicits._
    val t = tileSize
    val f = factor(steps)
    val h = halo(steps)
    val span = t * f // fine pixels per tile side
    require(span > h, s"tile fine-span $span must exceed chain halo $h")

    val tiled: Dataset[PcPx] = grid
      .select(col("line").cast("int"), col("sample").cast("int"), col("v").cast("double"))
      .as[(Int, Int, Double)]
      .flatMap { case (l, s, v) =>
        val tl0 = Math.floorDiv(l, span); val ts0 = Math.floorDiv(s, span)
        for {
          dl <- -1 to 1
          ds <- -1 to 1
          tl = tl0 + dl
          ts = ts0 + ds
          if tl >= 0 && ts >= 0 &&
            l >= tl * span - h && l <= (tl + 1) * span - 1 + h &&
            s >= ts * span - h && s <= (ts + 1) * span - 1 + h
        } yield PcPx(tl, ts, l, s, v)
      }

    tiled.groupByKey(p => (p.tl, p.ts)).flatMapGroups { (key: (Int, Int), it: Iterator[PcPx]) =>
      val (tl, ts) = key
      val side = span + 2 * h
      val l0 = tl * span - h; val s0 = ts * span - h
      val vals = new Array[Double](side * side)
      val pres = new Array[Boolean](side * side)
      it.foreach { p => val i = (p.l - l0) * side + (p.s - s0); vals(i) = p.v; pres(i) = true }
      var plane = Plane(vals, pres, side, l0, s0)
      steps.foreach {
        case Smooth(d) => plane = smoothPlane(plane, d)
        case Coarsen2  => plane = coarsenPlane(plane)
        case Map1(g)   => plane = mapPlane(plane, g)
      }
      // owned output cells at final resolution
      Iterator.range(0, t).flatMap { ol =>
        Iterator.range(0, t).flatMap { os =>
          val gl = tl * t + ol; val gs = ts * t + os
          val row = gl - plane.l0; val cc = gs - plane.s0
          if (row < 0 || row >= plane.side || cc < 0 || cc >= plane.side ||
              !plane.pres(row * plane.side + cc)) Iterator.empty
          else Iterator.single(PcOut(gl, gs, plane.vals(row * plane.side + cc)))
        }
      }
    }.toDF()
  }

  /** [[Gradients.reduce2]] as one shuffle. */
  val Reduce2Steps: Seq[Step] = Seq(Smooth(1), Smooth(1), Coarsen2, Smooth(1))

  /** [[Gradients.meanOp]] as one shuffle. */
  val MeanOpSteps: Seq[Step] = Seq(Smooth(1), Smooth(1), Smooth(2), Smooth(2))
}
