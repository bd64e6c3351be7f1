package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gradient / streak-direction analysis (reference gradients.py, SURVEY.md
  * §2.8) re-expressed Spark-first:
  *
  *  - Scharr local gradients (R5, gradients.py:588-634) run as a tile+halo
  *    kernel ([[Tiles.stencil3x3]]);
  *  - pyramid downsampling (R3/R12, gradients.py:689-721, :336-362) is a
  *    `groupBy(line/f, sample/f).avg` — exact INTER_AREA for integer factors;
  *  - the windowed weighted angular histogram (R10, gradients.py:828-879)
  *    is a two-pass aggregation: in-window median first (it breaks one-pass
  *    partial aggregation — SURVEY.md §7.4 risk 3), then the 72-bin weight
  *    sum, both partial-agg-friendly groupBys keyed by window id;
  *  - circular smoothing (R15, gradients.py:882-923) pivots each window's
  *    bins into a dense 72-array once, then runs the dilated 1,2,4 kernel
  *    cascade as map-side array `transform`s — no per-dilation shuffle;
  *  - peak extraction (R16, gradients.py:419-428) is a deterministic
  *    row_number argmax over (weight desc, bin).
  *
  * Angles: the squared-gradient trick (gradients.py:619-621) makes ±g
  * equivalent; angle(√(g²)) = atan2(g2i, g2r)/2 ∈ [-π/2, π/2].
  */
object Gradients {

  val NAngles = 72

  /** R5: Scharr x/y gradients → squared complex gradient (g2r, g2i).
    * Emits interior (full-neighborhood) pixels only.
    */
  def scharrG2(grid: DataFrame, tileSize: Int = 64): DataFrame =
    Tiles.stencil3x3(grid, tileSize) { nb =>
      // nb row-major: 0:(l-1,s-1) 1:(l-1,s) 2:(l-1,s+1) 3:(l,s-1) 4:center
      //               5:(l,s+1) 6:(l+1,s-1) 7:(l+1,s) 8:(l+1,s+1)
      // cv2.Scharr kernels (gradients.py:612-613); term order mirrors the
      // SQL oracle exactly for bit-stable sums
      val gx = -3.0 * nb(0) + 3.0 * nb(2) - 10.0 * nb(3) + 10.0 * nb(5) - 3.0 * nb(6) + 3.0 * nb(8)
      val gy = -3.0 * nb(0) - 10.0 * nb(1) - 3.0 * nb(2) + 3.0 * nb(6) + 10.0 * nb(7) + 3.0 * nb(8)
      (gx * gx - gy * gy, 2.0 * gx * gy) // (gx + i·gy)²
    }.withColumnsRenamed(Map("a" -> "g2r", "b" -> "g2i"))

  /** R2: 3×3 Gaussian B2 = [1,2,1;2,4,2;1,2,1]/16 smoothing with edge
    * renormalization — missing/edge neighbors drop out of BOTH numerator
    * and denominator (`conv(v·w)/conv(ones·w)`, gradients.py:675-686).
    * Output channel b carries the weight mass actually used.
    */
  def smoothB2(grid: DataFrame, tileSize: Int = 64): DataFrame =
    Tiles.stencil(grid, tileSize, 1) { (nb, mask) =>
      var num = 0.0; var den = 0.0
      var k = 0
      while (k < 9) {
        if (mask(k)) {
          val wl = if (k / 3 == 1) 2.0 else 1.0
          val ws = if (k % 3 == 1) 2.0 else 1.0
          num += wl * ws * nb(k); den += wl * ws
        }
        k += 1
      }
      Some((num / den, den))
    }.withColumnsRenamed(Map("a" -> "v_smooth", "b" -> "w_used"))

  /** R4/R19-P1: local mean + std over a (2r+1)² uniform window of present
    * pixels; P1 = std/mean is the Koch/Zhao heterogeneity mask input
    * (gradients.py:783-787). std via sqrt(max(E[x²]−E[x]², 0)).
    */
  def localStats(grid: DataFrame, radius: Int = 2, tileSize: Int = 64): DataFrame =
    Tiles.stencil(grid, tileSize, radius) { (nb, mask) =>
      var s = 0.0; var s2 = 0.0; var n = 0
      var k = 0
      while (k < nb.length) {
        if (mask(k)) { s += nb(k); s2 += nb(k) * nb(k); n += 1 }
        k += 1
      }
      val mean = s / n
      val std = math.sqrt(math.max(s2 / n - mean * mean, 0.0))
      Some((mean, std))
    }.withColumnsRenamed(Map("a" -> "local_mean", "b" -> "local_std"))

  /** R3/R12: integer-factor downsample by block mean (exact INTER_AREA).
    *
    * Plain double `avg` is used deliberately: its partial-merge order is
    * nondeterministic, but a block has ≤ factor² values, so order variants
    * differ by a few ULPs (~1e-19 relative). Unlike [[graft.queries.Streaks.grid]]
    * — whose inputs are exact decimal quanta that land exactly ON rounding
    * boundaries, forcing the decimal-sum pattern there — coarsen's inputs are
    * generic doubles (post-smoothing weighted means), so the probability of a
    * value sitting within a ULP of a 1e-6/1e-8 rounding boundary is ~1e-14
    * per cell; oracle comparisons round to ≥6 decimals on both sides.
    */
  def coarsen(grid: DataFrame, factor: Int): DataFrame =
    grid.groupBy(
        (col("line") / factor).cast("int").as("line"),
        (col("sample") / factor).cast("int").as("sample"))
      .agg(avg(col("v")).as("v"), count(lit(1)).as("n_px"))

  /** R3 — the anti-moiré reduce-by-2 pyramid step on one channel:
    * pre-smooth ≈B4 (two renormalized B2 passes), 2×2 coarsen, post-smooth
    * B2 (gradients.py:689-721; B4 = B2∗B2 exactly away from edges).
    */
  def reduce2(channel: DataFrame, tileSize: Int = 64): DataFrame = {
    def sm(df: DataFrame): DataFrame =
      smoothB2(df, tileSize).select(col("line"), col("sample"), col("v_smooth").as("v"))
    sm(coarsen(sm(sm(channel)), 2).drop("n_px"))
  }

  /** R5 complete — local gradients at half resolution with quality:
    * Scharr → squared complex gradient → R2 of (re, im, |g²|) → quality
    * c = |R2(g²)| / (R2(|g²|) + 1e-5), clipped to ≤1 else 0
    * (gradients.py:588-634).
    */
  def localGradients(grid: DataFrame, tileSize: Int = 64): DataFrame = {
    val g2 = scharrG2(grid, tileSize)
    def ch(c: String): DataFrame = g2.select(col("line"), col("sample"), col(c).as("v"))
    val mag = g2.select(col("line"), col("sample"), hypot(col("g2r"), col("g2i")).as("v"))
    val re2 = reduce2(ch("g2r"), tileSize).withColumnRenamed("v", "g2r")
    val im2 = reduce2(ch("g2i"), tileSize).withColumnRenamed("v", "g2i")
    val g3 = reduce2(mag, tileSize).withColumnRenamed("v", "g3")
    val joined = re2.join(im2, Seq("line", "sample")).join(g3, Seq("line", "sample"))
    val cRaw = hypot(col("g2r"), col("g2i")) / (col("g3") + lit(1e-5))
    joined.withColumn("c", when(cRaw <= 1.0, cRaw).otherwise(lit(0.0)))
  }

  final case class LgPx(tl: Int, ts: Int, l: Int, s: Int, v: Double)
  final case class LgOut(line: Int, sample: Int, g2r: Double, g2i: Double, g3: Double, c: Double)

  /** R5∘R3 FUSED — the whole local-gradients chain (Scharr → g² → two B2
    * pre-smooths → 2× coarsen → B2 post-smooth → quality c) in ONE tile+halo
    * shuffle, the stencil-fusion optimization SURVEY.md §4.2 plans for
    * composed pyramids: [[localGradients]] runs the identical math as 13
    * exchanges (1 Scharr + 3 channels × (2 smooths + coarsen + smooth)) plus
    * 2 joins; here each fine pixel is shuffled ONCE into the coarse tiles
    * whose widened halo needs it, and every pyramid stage runs on the dense
    * in-memory plane.
    *
    * Halo accounting (fine pixels): post-smooth needs coarse ±1 → fine ±2;
    * the two pre-smooths need ±2; Scharr ±1 → halo 5. Exactness shrinks by
    * one plane ring per stage, so owned coarse cells (≥5 from the plane
    * edge, depending on cells ≥3 deep) always see their true global
    * neighborhoods — the map_overlap rule generalized to a fused chain.
    *
    * Equivalence with the compositional version is bit-exact per stage
    * (identical term order) except the 2×2 coarsen mean, whose shuffle-order
    * sum can differ by ULPs (see [[coarsen]]); GradientsSpec asserts
    * agreement to 1e-9.
    */
  def localGradientsFused(grid: DataFrame, tileSize: Int = 32): DataFrame = {
    val spark = grid.sparkSession
    import spark.implicits._
    val t = tileSize // coarse tile side; a tile spans 2t fine pixels
    val H = 5        // fine-pixel halo (see scaladoc)
    require(2 * t > H, s"fine tile span ${2 * t} must exceed halo $H")

    val tiled: Dataset[LgPx] = grid
      .select(col("line").cast("int"), col("sample").cast("int"), col("v").cast("double"))
      .as[(Int, Int, Double)]
      .flatMap { case (l, s, v) =>
        val tl0 = Math.floorDiv(l, 2 * t); val ts0 = Math.floorDiv(s, 2 * t)
        for {
          dl <- -1 to 1
          ds <- -1 to 1
          tl = tl0 + dl
          ts = ts0 + ds
          if tl >= 0 && ts >= 0 &&
            l >= 2 * tl * t - H && l <= 2 * (tl + 1) * t - 1 + H &&
            s >= 2 * ts * t - H && s <= 2 * (ts + 1) * t - 1 + H
        } yield LgPx(tl, ts, l, s, v)
      }

    tiled.groupByKey(p => (p.tl, p.ts)).flatMapGroups { (key: (Int, Int), it: Iterator[LgPx]) =>
      val (tl, ts) = key
      val w = 2 * t + 2 * H
      val l0 = 2 * tl * t - H; val s0 = 2 * ts * t - H
      val v = new Array[Double](w * w); val pres = new Array[Boolean](w * w)
      it.foreach { p => val i = (p.l - l0) * w + (p.s - s0); v(i) = p.v; pres(i) = true }

      // Scharr → squared complex gradient; full-neighborhood cells only
      // (term order identical to scharrG2 for bit-equality)
      val a = new Array[Double](w * w); val b = new Array[Double](w * w)
      val m = new Array[Double](w * w); val pS = new Array[Boolean](w * w)
      var r = 1
      while (r < w - 1) {
        var c = 1
        while (c < w - 1) {
          val i = r * w + c
          if (pres(i - w - 1) && pres(i - w) && pres(i - w + 1) &&
              pres(i - 1) && pres(i) && pres(i + 1) &&
              pres(i + w - 1) && pres(i + w) && pres(i + w + 1)) {
            val gx = -3.0 * v(i - w - 1) + 3.0 * v(i - w + 1) - 10.0 * v(i - 1) +
              10.0 * v(i + 1) - 3.0 * v(i + w - 1) + 3.0 * v(i + w + 1)
            val gy = -3.0 * v(i - w - 1) - 10.0 * v(i - w) - 3.0 * v(i - w + 1) +
              3.0 * v(i + w - 1) + 10.0 * v(i + w) + 3.0 * v(i + w + 1)
            a(i) = gx * gx - gy * gy; b(i) = 2.0 * gx * gy
            m(i) = math.hypot(a(i), b(i)); pS(i) = true
          }
          c += 1
        }
        r += 1
      }

      // pyramid tail = PlaneChain's shared plane kernels, per channel
      // (identical weights/order as smoothB2/coarsen, see PlaneChain)
      def chain(vs: Array[Double]): PlaneChain.Plane = {
        def sm(p: PlaneChain.Plane) = PlaneChain.smoothPlane(p, 1)
        sm(PlaneChain.coarsenPlane(sm(sm(PlaneChain.Plane(vs, pS, w, l0, s0)))))
      }
      val fa = chain(a); val fb = chain(b); val fm = chain(m)

      // quality + emit owned coarse cells (fa/fb/fm share geometry: same
      // input presence and the same deterministic chain)
      Iterator.range(0, t).flatMap { ol =>
        Iterator.range(0, t).flatMap { os =>
          val gl = tl * t + ol; val gs = ts * t + os
          val row = gl - fa.l0; val cc = gs - fa.s0
          if (row < 0 || row >= fa.side || cc < 0 || cc >= fa.side ||
              !fa.pres(row * fa.side + cc)) Iterator.empty
          else {
            val i = row * fa.side + cc
            val cRaw = math.hypot(fa.vals(i), fb.vals(i)) / (fm.vals(i) + 1e-5)
            val cQ = if (cRaw <= 1.0) cRaw else 0.0
            Iterator.single(LgOut(gl, gs, fa.vals(i), fb.vals(i), fm.vals(i), cQ))
          }
        }
      }
    }.toDF()
  }

  /** R10: windowed weighted angular histogram over squared gradients.
    *
    * @param g2 output of [[scharrG2]]
    * @param windowSize window side length in pixels
    * @return one row per (win_line, win_sample, bin): weight sum + counts
    */
  def gradientHistogram(g2: DataFrame, windowSize: Int): DataFrame = {
    val mag = hypot(col("g2r"), col("g2i"))
    val base = g2.select(
      (col("line") / windowSize).cast("int").as("win_line"),
      (col("sample") / windowSize).cast("int").as("win_sample"),
      col("g2r"), col("g2i"), mag.as("m"))
      .filter(col("m") > 0)

    // in-window median of |g2| (gradients.py:869) as a WINDOW aggregate, not
    // a groupBy + self-join: the join formulation re-executes the whole
    // upstream (Scharr tile shuffle included) for each side unless runtime
    // stage reuse happens to fire; the window keeps ONE pass, one shuffle on
    // the window key, and the same exact median
    val w = Window.partitionBy(col("win_line"), col("win_sample"))
    val withMed = base.select(col("win_line"), col("win_sample"),
      col("g2r"), col("g2i"), col("m"),
      median(col("m")).over(w).as("med_m"),
      count(lit(1)).over(w).as("n_valid"))

    // weight r = m/(m+median), bin by angle(sqrt(g2)) (gradients.py:853-877)
    val angle = atan2(col("g2i"), col("g2r")) / 2.0
    // quantize before discretizing: an exactly-axis-aligned gradient makes
    // g2i a summation-order-sensitive +-1e-17, and atan2's sign
    // discontinuity would flip the FLOOR a full bin between engines;
    // rounding the quotient to 9 decimals collapses that noise class
    val bin = least(
      floor(round((angle + lit(math.Pi / 2)) / lit(math.Pi / NAngles), 9)).cast("int"),
      lit(NAngles - 1))
    withMed
      .select(col("win_line"), col("win_sample"),
        bin.as("bin"),
        (col("m") / (col("m") + col("med_m"))).as("r"),
        col("n_valid"))
      .groupBy(col("win_line"), col("win_sample"), col("bin"))
      .agg(sum(col("r")).as("weight"), count(lit(1)).as("n_px"),
        min(col("n_valid")).as("n_valid"))
  }

  /** R7-R9 proper: OVERLAPPING windowed histogram — the reference's rolling
    * windows sampled at centers every `step` pixels
    * (gradients.py:150-205: rolling(center=True).construct + sel(centers)).
    * Each gradient pixel is flatMapped to every window containing it
    * ((ws/step)² duplication — the shuffle-volume/overlap tradeoff of
    * SURVEY.md R7), then the same two-pass median + binning as
    * [[gradientHistogram]], keyed by center coordinates.
    */
  def gradientHistogramOverlapping(g2: DataFrame, windowSize: Int, step: Int): DataFrame = {
    val spark = g2.sparkSession
    import spark.implicits._
    val h = windowSize / 2
    val assigned = g2.select(col("line"), col("sample"), col("g2r"), col("g2i"))
      .as[(Int, Int, Double, Double)]
      .flatMap { case (l, s, re, im) =>
        for {
          kl <- math.max(Math.floorDiv(l - h, step) + 1, 0) to Math.floorDiv(l + h, step)
          ks <- math.max(Math.floorDiv(s - h, step) + 1, 0) to Math.floorDiv(s + h, step)
        } yield (kl * step, ks * step, re, im)
      }
      .toDF("cl", "cs", "g2r", "g2i")
      .withColumn("m", hypot(col("g2r"), col("g2i")))
      .filter(col("m") > 0)

    // window-aggregate median, same rationale as [[gradientHistogram]]
    val w = Window.partitionBy(col("cl"), col("cs"))
    val withMed = assigned.select(col("cl"), col("cs"), col("g2r"), col("g2i"), col("m"),
      median(col("m")).over(w).as("med_m"),
      count(lit(1)).over(w).as("n_valid"))

    val angle = atan2(col("g2i"), col("g2r")) / 2.0
    // quantize before discretizing: an exactly-axis-aligned gradient makes
    // g2i a summation-order-sensitive +-1e-17, and atan2's sign
    // discontinuity would flip the FLOOR a full bin between engines;
    // rounding the quotient to 9 decimals collapses that noise class
    val bin = least(
      floor(round((angle + lit(math.Pi / 2)) / lit(math.Pi / NAngles), 9)).cast("int"),
      lit(NAngles - 1))
    withMed
      .select(col("cl"), col("cs"), bin.as("bin"),
        (col("m") / (col("m") + col("med_m"))).as("r"), col("n_valid"))
      .groupBy(col("cl"), col("cs"), col("bin"))
      .agg(sum(col("r")).as("weight"), count(lit(1)).as("n_px"),
        min(col("n_valid")).as("n_valid"))
  }

  /** R15: circular smoothing — [1,2,1]/4 kernel at dilations 1,2,4 applied
    * sequentially on the wrapped 72-bin axis (gradients.py:882-923).
    *
    * Scale shape: ONE groupBy pivots each window's sparse bins into a dense
    * 72-slot array (72 codegen'd conditional sums — map-side combinable),
    * then the whole dilation cascade runs as per-row `transform` array
    * arithmetic with zero additional exchanges, and `posexplode` restores
    * the long format. The previous formulation shuffled the histogram once
    * per dilation (3 extra exchanges); SURVEY §2.8 R15 prescribes the
    * no-shuffle array transform. Downstream [[peak]]'s window keys match
    * the groupBy partitioning, so the whole smooth→peak tail is
    * exchange-free after the pivot.
    *
    * Support tracking: bins reachable from an occupied bin through the
    * dilation offsets get a row (even if numerically tiny); unreachable
    * bins don't — exactly the row-existence semantics of the join
    * formulation (and of the SQL oracle), which never manufactures rows
    * for fully-empty neighborhoods.
    */
  def circSmooth(hist: DataFrame, dilations: Seq[Int] = Seq(1, 2, 4)): DataFrame = {
    val n = NAngles
    def at(a: Column, i: Column): Column = element_at(a, i + 1)
    def sh(a: Column, d: Int, i: Column): Column = at(a, pmod(i + lit(d), lit(n)))
    val sums = (0 until n).map(b =>
      sum(when(col("bin") === b, col("weight"))).as(s"w$b"))
    val dense = hist
      .groupBy(col("win_line"), col("win_sample"))
      .agg(sums.head, sums.tail: _*)
      .select(col("win_line"), col("win_sample"),
        array((0 until n).map(b => coalesce(col(s"w$b"), lit(0.0))): _*).as("w"),
        array((0 until n).map(b => col(s"w$b").isNotNull): _*).as("sup"))
    val idx = sequence(lit(0), lit(n - 1))
    // one SELECT per dilation: the alias boundary makes each pass's array
    // an attribute the next pass references, so every intermediate is
    // evaluated once per row. Folding the lambdas into one expression would
    // inline the prior pass 3x per tap (27x per layer) — a silent
    // exponential blowup in the higher-order-function tree.
    val cascaded = dilations.foldLeft(dense) { (df, d) =>
      df.select(col("win_line"), col("win_sample"),
        transform(idx, i =>
          sh(col("w"), -d, i) * lit(0.25) + at(col("w"), i) * lit(0.5) +
            sh(col("w"), d, i) * lit(0.25)).as("w"),
        transform(idx, i =>
          sh(col("sup"), -d, i) || at(col("sup"), i) || sh(col("sup"), d, i))
          .as("sup"))
    }
    cascaded
      .select(col("win_line"), col("win_sample"),
        posexplode(zip_with(col("w"), col("sup"), (w, s) => struct(w.as("w"), s.as("s")))))
      .where(col("col.s"))
      .select(col("win_line"), col("win_sample"),
        col("pos").as("bin"), col("col.w").as("weight"))
  }

  /** Dilated renormalized B2 smoothing: taps at offsets {-d, 0, d}² with
    * [1,2,1]² weights. B4-dilated-by-2 == (B2 dilated)∘(B2 dilated) since
    * dilation distributes over convolution (gradients.py:741-744 B42).
    */
  def smoothB2Dilated(grid: DataFrame, d: Int, tileSize: Int = 64): DataFrame =
    Tiles.stencil(grid, tileSize, d) { (nb, mask) =>
      val side = 2 * d + 1
      var num = 0.0; var den = 0.0
      var ti = 0
      while (ti < 3) {
        var tj = 0
        while (tj < 3) {
          val k = (ti * d) * side + (tj * d)
          if (mask(k)) {
            val w = (if (ti == 1) 2.0 else 1.0) * (if (tj == 1) 2.0 else 1.0)
            num += w * nb(k); den += w
          }
          tj += 1
        }
        ti += 1
      }
      Some((num / den, den))
    }.select(col("line"), col("sample"), col("a").as("v"))

  /** R4 — the `Mean` local-mean operator: B4 (≈B2∘B2) then B42 (dilated B4)
    * (gradients.py:724-755).
    */
  def meanOp(channel: DataFrame, tileSize: Int = 64): DataFrame = {
    def sm(df: DataFrame): DataFrame =
      smoothB2(df, tileSize).select(col("line"), col("sample"), col("v_smooth").as("v"))
    smoothB2Dilated(smoothB2Dilated(sm(sm(channel)), 2, tileSize), 2, tileSize)
  }

  /** Bilinear zoom regrid (ndimage.zoom order=1 analogue): maps each target
    * cell to fractional source coords with the symmetric endpoint-preserving
    * map src = dst·(nSrc−1)/(nDst−1), 4-neighbor inner join.
    */
  def zoomBilinear(src: DataFrame, srcNL: Int, srcNS: Int, dstNL: Int, dstNS: Int): DataFrame = {
    val spark = src.sparkSession
    // target grid generated distributed (one spark.range, id → (line, sample))
    // — never materialized on the driver; the source raster is never
    // broadcast (it grows with the scene). Shape: tag-explode each target's
    // 4 corner keys, ONE shuffle equi-join against the source on (i, j),
    // then pivot the tags back to v00..v11 columns so the final combine is
    // the exact textbook bilinear expression (deterministic — no unordered
    // float summation; boundary-clamped duplicate corners land on distinct
    // tags, so each tag resolves to exactly one value per target).
    val targets = spark.range(dstNL.toLong * dstNS).select(
      (col("id") / dstNS).cast("int").as("line"),
      (col("id") % dstNS).cast("int").as("sample"))
    val fl = col("line") * ((srcNL - 1).toDouble / math.max(dstNL - 1, 1))
    val fs = col("sample") * ((srcNS - 1).toDouble / math.max(dstNS - 1, 1))
    val t = targets.select(col("line"), col("sample"),
      floor(fl).cast("int").as("i0"), (fl - floor(fl)).as("wi"),
      floor(fs).cast("int").as("j0"), (fs - floor(fs)).as("wj"))
      .withColumn("i1", least(col("i0") + 1, lit(srcNL - 1)))
      .withColumn("j1", least(col("j0") + 1, lit(srcNS - 1)))
    def corner(tag: String, i: Column, j: Column): Column =
      struct(lit(tag).as("tag"), i.as("i"), j.as("j"))
    val corners = t.select(col("line"), col("sample"), col("wi"), col("wj"),
        explode(array(
          corner("00", col("i0"), col("j0")), corner("01", col("i0"), col("j1")),
          corner("10", col("i1"), col("j0")), corner("11", col("i1"), col("j1")))).as("c"))
      .select(col("line"), col("sample"), col("wi"), col("wj"),
        col("c.tag").as("tag"), col("c.i").as("i"), col("c.j").as("j"))
    val s = src.select(col("line").as("i"), col("sample").as("j"), col("v"))
    def tagged(tag: String): Column =
      max(when(col("tag") === tag, col("v"))).as("v" + tag)
    corners.join(s, Seq("i", "j"))
      .groupBy(col("line"), col("sample"), col("wi"), col("wj"))
      .agg(tagged("00"), tagged("01"), tagged("10"), tagged("11"))
      .select(col("line"), col("sample"),
        ((col("v00") * (lit(1.0) - col("wj")) + col("v01") * col("wj")) * (lit(1.0) - col("wi")) +
         (col("v10") * (lit(1.0) - col("wj")) + col("v11") * col("wj")) * col("wi")).as("v"))
  }

  /** R19 — rain/artifact mask filtering parameters (Zhao 2021;
    * gradients.py:758-825): P1 local heterogeneity, P2 high-frequency
    * residual vs a smoothed-upsampled background, P3 gradient-energy ratio,
    * P4 sqrt(quality); affine-clipped to [0,1] and combined
    * F = sqrt(¼Σfᵢ²) with the small-F suppression.
    *
    * Input: full-res sigma0 grid (line, sample, v). Output at half
    * resolution (r2 grid), inner-joined across components.
    */
  def filteringParameters(grid: DataFrame, tileSize: Int = 64,
      knownDims: Option[(Int, Int)] = None): DataFrame = {
    import PlaneChain.{Coarsen2, Map1, Reduce2Steps, MeanOpSteps, Smooth}
    val image = grid.select(col("line"), col("sample"), sqrt(col("v")).as("v"))
    // fused chains emit at HALF input resolution → their tile side is
    // tileSize/2 fine... output cells (floored at 16 so span always exceeds
    // the chain halo)
    val t2 = math.max(tileSize / 2, 16)
    // every pyramid chain below is ONE fused shuffle (PlaneChain) — the
    // compositional spelling (reduce2/meanOp per channel) costs 4 exchanges
    // per chain and re-executes shared prefixes per branch
    val r2 = PlaneChain.run(image, Reduce2Steps, t2)
    val lg = localGradientsFused(image, t2)
    val j = PlaneChain.run(image, Reduce2Steps ++ MeanOpSteps, t2).withColumnRenamed("v", "j")
    val j1 = PlaneChain.run(image, Reduce2Steps ++ (Map1(x => x * x) +: MeanOpSteps), t2)
      .withColumnRenamed("v", "j1")

    // half-res dims: from the caller when known (skips a driver action)
    val (nL, nS) = knownDims.getOrElse {
      val dims = r2.agg(max("line"), max("sample")).head()
      (dims.getInt(0) + 1, dims.getInt(1) + 1)
    }
    // coarsen-by-2 of a dense [0, n) index range has ceil(n/2) cells
    val bg = zoomBilinear(
      PlaneChain.run(image, Reduce2Steps ++ Seq(Coarsen2, Smooth(1)), math.max(t2 / 2, 16)),
      (nL + 1) / 2, (nS + 1) / 2, nL, nS)
      .withColumnRenamed("v", "bg")

    val g4 = PlaneChain.run(lg.select(col("line"), col("sample"), col("g3").as("v")), MeanOpSteps, t2)
      .withColumnRenamed("v", "g4")

    def clip01(c: Column): Column = least(greatest(c, lit(0.0)), lit(1.0))

    val joined = r2
      .join(j, Seq("line", "sample"))
      .join(j1, Seq("line", "sample"))
      .join(bg, Seq("line", "sample"))
      .join(lg.select(col("line"), col("sample"), col("g3"), col("c")), Seq("line", "sample"))
      .join(g4, Seq("line", "sample"))
    val p1 = sqrt(greatest(col("j1") - col("j") * col("j"), lit(0.0))) / (col("j") + lit(1e-5))
    val p2 = pow(col("v") - col("bg"), 2) / (col("j") * col("j") + lit(1e-5))
    val p3 = col("g3") / (col("g4") + lit(1e-5))
    val p4 = sqrt(col("c"))
    val f1 = clip01(lit(-50.0) * p1 + lit(2.75))
    val f2 = clip01(lit(-5000.0) * p2 + lit(3.0))
    val f3 = clip01(lit(-2.5) * p3 + lit(4.0))
    val f4 = clip01(lit(-10.0) * p4 + lit(6.3))
    val fRaw = sqrt((f1 * f1 + f2 * f2 + f3 * f3 + f4 * f4) / 4.0)
    joined.select(col("line"), col("sample"),
      f1.as("f1"), f2.as("f2"), f3.as("f3"), f4.as("f4"),
      when(fRaw < 0.0015, 0.0).otherwise(fRaw).as("f"))
  }

  /** R16: histogram peak per window — deterministic argmax on rounded
    * weights (rounding first keeps cross-engine ordering stable).
    */
  def peak(hist: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("win_line"), col("win_sample"))
      .orderBy(round(col("weight"), 6).desc, col("bin").asc)
    hist.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("win_line"), col("win_sample"),
        col("bin").as("peak_bin"),
        round(col("weight"), 6).as("peak_weight"),
        // orthogonal streak direction: bin center + π/2 (streaks notebook)
        round(lit(-math.Pi / 2) + (col("bin") + 0.5) * lit(math.Pi / NAngles) + lit(math.Pi / 2), 6)
          .as("streak_dir_rad"))
  }

  /** R14 — nearest-center alignment for configs whose window-center grids
    * differ (gradients.py:229-245 `sel(..., method='nearest')`): snap each
    * row's (line, sample) onto the regular reference-center grid
    * {origin + k·step} and re-aggregate whatever measure columns ride along
    * (histogram weights sum per bin). Shared-grid configs make this a no-op
    * (the multiscale fan-out's case); differing grids get a deterministic
    * half-up snap. Pure column arithmetic + one groupBy — no join.
    */
  def alignToCenters(df: DataFrame, step: Double, keyCols: Seq[String],
      sumCols: Seq[String], originLine: Double = 0.0, originSample: Double = 0.0): DataFrame = {
    // the int cast below would silently collide distinct centers on a
    // fractional grid — the snapped value must itself be integral
    require(step == math.rint(step) && step > 0 &&
      originLine == math.rint(originLine) && originSample == math.rint(originSample),
      s"alignToCenters requires an integral grid (step=$step, origins=($originLine,$originSample))")
    def snap(c: Column, origin: Double): Column =
      (floor((c - lit(origin)) / lit(step) + lit(0.5)) * lit(step) + lit(origin)).cast("int")
    df.withColumn("line", snap(col("line"), originLine))
      .withColumn("sample", snap(col("sample"), originSample))
      .groupBy((Seq(col("line"), col("sample")) ++ keyCols.map(col)): _*)
      .agg(sumCols.head match { case h => sum(col(h)).as(h) },
        sumCols.tail.map(c => sum(col(c)).as(c)): _*)
  }

  /** R13: multiscale fan-out — union of per-config pipelines with literal
    * config columns (pol/window/downscale become ordinary columns).
    *
    * The Scharr+g² prefix is shared by every window size at the same
    * downscale, but Spark's ReuseExchange cannot canonicalize it across
    * union branches (the tile kernels are mapPartitions closures, and
    * closure identity differs per branch) — so with >1 window size the
    * per-downscale gradient grid is persisted explicitly and computed once
    * instead of |windowSizes| times. MEMORY_AND_DISK: the grid is
    * pixel-sized, spills harmlessly if executors are tight.
    */
  def multiscale(grid: DataFrame, downscales: Seq[Int], windowSizes: Seq[Int],
      tileSize: Int = 64): DataFrame =
    downscales.map { f =>
      val g = if (f == 1) grid else coarsen(grid, f).drop("n_px")
      val g2 = scharrG2(g, tileSize)
      val shared =
        if (windowSizes.length > 1)
          graft.core.CacheLife.scoped(
            g2.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
        else g2
      windowSizes.map { ws =>
        gradientHistogram(shared, ws / f)
          .withColumn("downscale_factor", lit(f))
          .withColumn("window_size", lit(ws))
      }.reduce(_ unionAll _)
    }.reduce(_ unionAll _)
}
