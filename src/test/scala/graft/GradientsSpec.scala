package graft

import org.apache.spark.sql.functions._
import graft.operators.{Gradients, Tiles}

class GradientsSpec extends SparkSpec {
  import spark.implicits._

  /** Dense synthetic grid with a periodic streak pattern at a known angle:
    * bands constant along direction (cos θ, sin θ) → gradients point along
    * θ, so the histogram peak must land at θ (mod π).
    */
  def streakGrid(n: Int, theta: Double): org.apache.spark.sql.DataFrame = {
    val rows = for (l <- 0 until n; s <- 0 until n) yield {
      // phase varies along the gradient direction θ
      val phase = (l * math.cos(theta) + s * math.sin(theta)) * 2 * math.Pi / 8.0
      (l, s, 1.0 + 0.5 * math.sin(phase))
    }
    rows.toDF("line", "sample", "v")
  }

  test("tile+halo stencil equals direct window computation (property, SURVEY §7.4 risk 2)") {
    val g = streakGrid(50, 0.7)
    // reference computation: single-tile (tileSize covers the whole grid)
    val whole = Gradients.scharrG2(g, tileSize = 64)
      .select("line", "sample", "g2r", "g2i").as[(Int, Int, Double, Double)]
      .collect().sortBy(r => (r._1, r._2))
    // tiled with halo crossings every 16 px
    val tiled = Gradients.scharrG2(g, tileSize = 16)
      .select("line", "sample", "g2r", "g2i").as[(Int, Int, Double, Double)]
      .collect().sortBy(r => (r._1, r._2))
    assert(whole.length == 48 * 48) // interior only
    assert(whole.sameElements(tiled), "tile boundaries must not change results")
  }

  test("fused local-gradients chain matches the compositional one (13 shuffles → 1)") {
    val g = streakGrid(40, 0.5)
    val slow = Gradients.localGradients(g).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    val fast = Gradients.localGradientsFused(g, tileSize = 8).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    assert(slow.keySet == fast.keySet, s"cell sets differ: ${(slow.keySet diff fast.keySet).take(5)} / ${(fast.keySet diff slow.keySet).take(5)}")
    slow.foreach { case (k, (r1, i1, g1, c1)) =>
      val (r2, i2, g2, c2) = fast(k)
      def close(x: Double, y: Double) = math.abs(x - y) <= 1e-9 * (1 + math.abs(x))
      assert(close(r1, r2) && close(i1, i2) && close(g1, g2) && close(c1, c2),
        s"$k: ($r1,$i1,$g1,$c1) vs ($r2,$i2,$g2,$c2)")
    }
  }

  test("PlaneChain fused reduce2 and meanOp match the compositional operators") {
    import graft.operators.PlaneChain
    val g = streakGrid(40, 1.1)
    def toMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    def close(x: Double, y: Double) = math.abs(x - y) <= 1e-9 * (1 + math.abs(x))

    val r2slow = toMap(Gradients.reduce2(g).select("line", "sample", "v"))
    val r2fast = toMap(PlaneChain.run(g, PlaneChain.Reduce2Steps, tileSize = 8))
    assert(r2slow.keySet == r2fast.keySet)
    r2slow.foreach { case (k, v) => assert(close(v, r2fast(k)), s"reduce2 $k: $v vs ${r2fast(k)}") }

    val mSlow = toMap(Gradients.meanOp(g).select("line", "sample", "v"))
    val mFast = toMap(PlaneChain.run(g, PlaneChain.MeanOpSteps, tileSize = 8))
    assert(mSlow.keySet == mFast.keySet)
    mSlow.foreach { case (k, v) => assert(close(v, mFast(k)), s"meanOp $k: $v vs ${mFast(k)}") }

    // composed chain incl. a point map: meanOp(reduce2(g)²)
    val sq = Gradients.reduce2(g).select(col("line"), col("sample"), (col("v") * col("v")).as("v"))
    val jSlow = toMap(Gradients.meanOp(sq).select("line", "sample", "v"))
    val jFast = toMap(PlaneChain.run(g,
      PlaneChain.Reduce2Steps ++ (PlaneChain.Map1(x => x * x) +: PlaneChain.MeanOpSteps),
      tileSize = 16)) // composed halo is 16 fine px; tile span must exceed it
    assert(jSlow.keySet == jFast.keySet)
    jSlow.foreach { case (k, v) => assert(close(v, jFast(k)), s"composed $k: $v vs ${jFast(k)}") }
  }

  test("PlaneChain fusion matches compositional execution for random chains") {
    import graft.operators.PlaneChain
    import graft.operators.PlaneChain.{Coarsen2, Map1, Smooth, Step}
    val g = streakGrid(48, 0.8)
    val sq: Double => Double = x => x * x
    val rnd = new scala.util.Random(7)
    def runCompositional(steps: Seq[Step]): Map[(Int, Int), Double] = {
      import spark.implicits._
      val res = steps.foldLeft(g) {
        case (df, Smooth(d)) => Gradients.smoothB2Dilated(df, d)
        case (df, Coarsen2) => Gradients.coarsen(df, 2).drop("n_px")
        case (df, Map1(f)) =>
          df.select(col("line"), col("sample"), col("v")).as[(Int, Int, Double)]
            .map { case (l, s, v) => (l, s, f(v)) }.toDF("line", "sample", "v")
      }
      res.collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    }
    (1 to 6).foreach { trial =>
      val steps: Seq[Step] = Seq.fill(1 + rnd.nextInt(4))(rnd.nextInt(4) match {
        case 0 => Smooth(1)
        case 1 => Smooth(2)
        case 2 => Coarsen2
        case 3 => Map1(sq)
      })
      val slow = runCompositional(steps)
      val fast = PlaneChain.run(g, steps, tileSize = 12).collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
      assert(slow.keySet == fast.keySet, s"trial $trial $steps: cell sets differ")
      slow.foreach { case (k, v) =>
        assert(math.abs(v - fast(k)) <= 1e-9 * (1 + math.abs(v)),
          s"trial $trial $steps at $k: $v vs ${fast(k)}")
      }
    }
  }

  test("R14 nearest-center alignment snaps off-grid centers and merges weights") {
    import spark.implicits._
    // centers at step 10; rows at 4 (→0), 5 (→10, half-up), 12 (→10), 26 (→30)
    val df = Seq((4, 0, 1, 1.0), (5, 0, 1, 2.0), (12, 0, 1, 4.0), (26, 0, 1, 8.0))
      .toDF("line", "sample", "bin", "weight")
    val aligned = Gradients.alignToCenters(df, step = 10.0,
        keyCols = Seq("bin"), sumCols = Seq("weight"))
      .collect().map(r => (r.getInt(0), r.getDouble(3))).toMap
    assert(aligned == Map(0 -> 1.0, 10 -> 6.0, 30 -> 8.0), aligned.toString)
  }

  test("histogram peak recovers the planted streak direction") {
    for (theta <- Seq(0.3, 1.1)) {
      val g = streakGrid(64, theta)
      val hist = Gradients.gradientHistogram(Gradients.scharrG2(g, 32), windowSize = 62)
      val peak = Gradients.peak(Gradients.circSmooth(hist)).collect().head
      // gx differentiates along `sample`, gy along `line`, so the measured
      // angle atan2(gy, gx) for a phase along (cosθ, sinθ) is π/2 − θ
      val raw = math.Pi / 2 - theta
      val expected = if (raw > math.Pi / 2) raw - math.Pi else if (raw < -math.Pi / 2) raw + math.Pi else raw
      val gotGradDir = peak.getAs[Double]("streak_dir_rad") - math.Pi / 2
      val binWidth = math.Pi / Gradients.NAngles
      assert(math.abs(gotGradDir - expected) < 3 * binWidth,
        s"theta=$theta expected=$expected got=$gotGradDir")
    }
  }

  test("coarsen halves the grid with block means") {
    val g = streakGrid(8, 0.0)
    val c = Gradients.coarsen(g, 2).collect()
    assert(c.length == 16)
    assert(c.forall(_.getAs[Long]("n_px") == 4L))
  }

  test("circular smoothing conserves total weight") {
    val g = streakGrid(40, 0.5)
    val hist = Gradients.gradientHistogram(Gradients.scharrG2(g, 32), windowSize = 38)
    val before = hist.agg(sum("weight")).as[Double].collect().head
    val after = Gradients.circSmooth(hist).agg(sum("weight")).as[Double].collect().head
    assert(math.abs(before - after) < 1e-9, s"$before vs $after")
  }

  test("filtering parameters are in [0,1] and flag the heterogeneous region") {
    // homogeneous field + a high-variance patch: f-scores must stay in range
    val n = 64
    val rows = for (l <- 0 until n; s <- 0 until n) yield {
      val noise = if (l >= 20 && l < 30 && s >= 20 && s < 30)
        0.5 * (((l * 31 + s * 17) % 97) / 97.0) else 0.0
      (l, s, 0.05 + noise)
    }
    import spark.implicits._
    val g = rows.toDF("line", "sample", "v")
    val f = Gradients.filteringParameters(g).collect()
    assert(f.nonEmpty)
    for (r <- f; cName <- Seq("f1", "f2", "f3", "f4", "f")) {
      val v = r.getAs[Double](cName)
      assert(v >= 0.0 && v <= 1.0, s"$cName=$v out of range")
    }
    // the noisy patch (half-res ~[10,15]²) must score lower than the calm corner
    val inPatch = f.filter(r => (10 to 14).contains(r.getAs[Int]("line")) &&
      (10 to 14).contains(r.getAs[Int]("sample"))).map(_.getAs[Double]("f"))
    val calm = f.filter(r => r.getAs[Int]("line") > 20 && r.getAs[Int]("sample") > 20)
      .map(_.getAs[Double]("f"))
    assert(inPatch.nonEmpty && calm.nonEmpty)
    assert(inPatch.min < calm.max, "heterogeneous patch should reduce F somewhere")
  }

  test("zoom bilinear reproduces exact values at aligned nodes") {
    import spark.implicits._
    val src = (for (l <- 0 until 4; s <- 0 until 4) yield (l, s, (l * 10 + s).toDouble))
      .toDF("line", "sample", "v")
    val z = Gradients.zoomBilinear(src, 4, 4, 7, 7).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    // odd target indices are midpoints; even align with source nodes
    assert(z((0, 0)) == 0.0 && z((6, 6)) == 33.0)
    assert(math.abs(z((2, 2)) - 11.0) < 1e-12) // node (1,1)
    assert(math.abs(z((1, 0)) - 5.0) < 1e-12)  // midpoint of 0 and 10
  }

  test("stencil drops pixels with incomplete neighborhoods") {
    val g = streakGrid(10, 0.0).filter(!(col("line") === 5 && col("sample") === 5))
    val out = Gradients.scharrG2(g, 8).collect()
    // 8x8 interior minus the 3x3 neighborhood of the hole
    assert(out.length == 64 - 9)
  }
}
