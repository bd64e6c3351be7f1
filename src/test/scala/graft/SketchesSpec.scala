package graft

import org.apache.spark.sql.functions._
import graft.operators.Sketches

/** Sketches: HLL accuracy + mergeability, CMS bounds + mergeability,
  * exact-quantile equivalence with a brute-force sort. */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def ids(from: Int, until: Int) =
    (from until until).map(i => s"item_$i").toDF("v").withColumn("g", lit("all"))

  test("HLL estimate within the 512-register error envelope") {
    for (trueN <- Seq(100, 1000, 20000)) {
      val regs = Sketches.hllRegisters(ids(0, trueN), col("v"), Seq("g"))
      val est = Sketches.hllEstimate(regs, Seq("g")).head().getDouble(1)
      // 1.04/sqrt(512) ≈ 4.6% standard error; allow 4 sigma
      assert(math.abs(est - trueN) < 4 * 0.046 * trueN + 3,
        s"trueN=$trueN est=$est")
    }
  }

  test("HLL registers merge: max-union of shards == registers of the union") {
    // overlapping shards, so the union is NOT the concatenation
    val a = ids(0, 6000)
    val b = ids(4000, 10000)
    val ra = Sketches.hllRegisters(a, col("v"), Seq("g"))
    val rb = Sketches.hllRegisters(b, col("v"), Seq("g"))
    val merged = ra.union(rb).groupBy("g", "bucket").agg(max("reg").as("reg"))
    val whole = Sketches.hllRegisters(a.union(b), col("v"), Seq("g"))
    assert(merged.except(whole).isEmpty && whole.except(merged).isEmpty)
    val eM = Sketches.hllEstimate(merged, Seq("g")).head().getDouble(1)
    val eW = Sketches.hllEstimate(whole, Seq("g")).head().getDouble(1)
    assert(eM == eW)
  }

  test("CMS never underestimates and is exact off-collision; cells merge by addition") {
    val freq = (0 until 500).map(i => (s"tok_$i", (i % 7 + 1).toLong)).toDF("tok", "cnt")
    val cells = Sketches.cmsCells(freq, col("tok"), col("cnt"))
    val probes = freq.filter(col("cnt") >= 6).select("tok")
    val est = Sketches.cmsEstimate(cells, probes, "tok")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = freq.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    est.foreach { case (t, e) => assert(e >= exact(t), s"$t under-estimated") }
    // merge: cells of two halves summed == cells of the whole
    val (h1, h2) = (freq.filter(col("cnt") <= 3), freq.filter(col("cnt") > 3))
    val merged = Sketches.cmsCells(h1, col("tok"), col("cnt"))
      .union(Sketches.cmsCells(h2, col("tok"), col("cnt")))
      .groupBy("r", "c").agg(sum("cnt").as("cnt"))
    assert(merged.except(cells).isEmpty && cells.except(merged).isEmpty)
  }

  test("groupedQuantiles equals per-key brute force; single-valued keys survive") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 4000).map { i =>
      val k = s"key_${i % 5}"
      // key_4 is single-valued: zero-width histogram must still resolve
      val x = if (i % 5 == 4) 42.0 else math.floor(rnd.nextGaussian() * 50) / 8.0
      (k, x)
    }
    val df = rows.toDF("k", "x")
    val qs = Seq(0.1, 0.5, 0.99)
    val got = graft.operators.Sketches.groupedQuantiles(df, "k", "x", qs)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val byKey = rows.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    for ((k, sorted) <- byKey; q <- qs) {
      val want = sorted(math.floor(q * (sorted.size - 1)).toInt)
      assert(got((k, q)) == want, s"key=$k q=$q got=${got((k, q))} want=$want")
    }
  }

  test("exactQuantiles equals brute-force order statistics, incl. skewed data") {
    val rnd = new scala.util.Random(7)
    // heavy-tailed + duplicates: many rows collapse into few histogram buckets
    val vals = Seq.fill(5000)(math.floor(math.pow(rnd.nextDouble(), 4) * 100) / 4.0)
    val df = vals.toDF("x")
    val qs = Seq(0.1, 0.5, 0.9, 0.999)
    val got = Sketches.exactQuantiles(df, "x", qs)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val sorted = vals.sorted
    qs.foreach { q =>
      val k = math.floor(q * (vals.size - 1)).toInt
      assert(got(q) == sorted(k), s"q=$q got=${got(q)} want=${sorted(k)}")
    }
  }

  test("HLL inclusion-exclusion tracks planted set overlaps") {
    import spark.implicits._
    // A = 0..19999, B = 10000..29999 → |A|=|B|=20000, |A∩B|=10000
    val rows = ((0 until 20000).map(i => ("A", s"v$i")) ++
      (10000 until 30000).map(i => ("B", s"v$i"))).toDF("source", "tok")
    val regs = Sketches.hllRegisters(rows, col("tok"), Seq("source"))
    val per = Sketches.hllEstimate(regs, Seq("source"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val union = Sketches.hllEstimate(
      regs.groupBy(col("bucket")).agg(max(col("reg")).as("reg"))
        .withColumn("g", lit(1)), Seq("g"))
      .collect()(0).getDouble(1)
    val inter = per("A") + per("B") - union
    assert(math.abs(per("A") - 20000) / 20000 < 0.10, s"estA=${per("A")}")
    assert(math.abs(union - 30000) / 30000 < 0.10, s"estU=$union")
    assert(math.abs(inter - 10000) / 10000 < 0.20,
      s"inclusion-exclusion intersection off: $inter want ~10000")
  }

  test("exactHeavyHitters == brute force, partitioning-independent, threshold strict") {
    import spark.implicits._
    // planted so n = 60000 exactly, k = 100, threshold n/k = 600:
    // five heavy items (3000,2500,2000,1500,1100), m0 at EXACTLY 600
    // (must be excluded — the threshold is strict), 49300 singleton tail
    // — vocabulary ≫ k so the Misra–Gries prune actually prunes
    val k = 100
    val all = Seq(("h0", 3000), ("h1", 2500), ("h2", 2000), ("h3", 1500),
      ("h4", 1100), ("m0", 600)) ++ (0 until 49300).map(i => (s"t$i", 1))
    val n = all.map(_._2).sum
    assert(n == 60000)
    val rows = all.flatMap { case (t, cnt) => Seq.fill(cnt)(t) }.toDF("tok")
    val want = Set(("h0", 3000L), ("h1", 2500L), ("h2", 2000L),
      ("h3", 1500L), ("h4", 1100L))
    for (parts <- Seq(1, 7, 32)) {
      val got = Sketches.exactHeavyHitters(rows.repartition(parts), "tok", k)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got == want, s"parts=$parts got=$got")
    }
  }
}
