package graft

import org.apache.spark.sql.functions._
import graft.operators.{LmOps, Profile, Skyline}

/** Closed-form gates for the evaluation / data-QA operators: ROUGE-N's
  * clipped multiset overlap, the per-class classifier report, median/MAD
  * outlier flags, and the Pareto-front sweep against brute-force dominance.
  */
class EvalOpsSpec extends SparkSpec {
  import spark.implicits._

  test("rougeN: identical, disjoint, clipped and degenerate pairs") {
    val pairs = Seq(
      (1L, "a b c d", "a b c d"), // identical: P = R = F1 = 1.0
      (2L, "x y z", "a b c"),     // disjoint: all 0
      (3L, "a a a", "a a b"),     // clip: cand has "a a"×2, ref ×1 → ov 1
      (4L, "a", "a b c"))         // 1-token cand: no bigrams, P defined as 0
      .toDF("id", "cand", "ref")
    val m = LmOps.rougeN(pairs, "cand", "ref", n = 2)
      .select("id", "n_overlap", "n_cand", "n_ref",
        "precision_micro", "recall_micro", "f1_micro")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    assert(m(1L) == ((3L, 3L, 3L, 1000000L, 1000000L, 1000000L)))
    assert(m(2L) == ((0L, 2L, 2L, 0L, 0L, 0L)))
    assert(m(3L) == ((1L, 2L, 2L, 500000L, 500000L, 500000L)))
    assert(m(4L) == ((0L, 0L, 2L, 0L, 0L, 0L)))
  }

  test("classifierEval: hallucinated and never-predicted classes get full rows") {
    // actual ∈ {en, fr, de}; model never predicts de, hallucinates xx
    val pairs = Seq(
      ("en", "en"), ("en", "en"), ("en", "fr"),
      ("fr", "fr"), ("fr", "xx"),
      ("de", "en"))
      .toDF("actual", "pred")
    val m = LmOps.classifierEval(pairs, "actual", "pred")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7), r.getLong(8)))
      .toMap
    assert(m.keySet == Set("en", "fr", "de", "xx"))
    // en: support 3, predicted 3 (2 tp + de's miss), tp 2
    assert(m("en") == ((3L, 3L, 2L, 1L, 1L, 666666L, 666666L, 666666L)))
    // fr: support 2, predicted 2 (1 tp + en's miss), tp 1
    assert(m("fr") == ((2L, 2L, 1L, 1L, 1L, 500000L, 500000L, 500000L)))
    // de: never predicted → precision 0 by convention
    assert(m("de") == ((1L, 0L, 0L, 0L, 1L, 0L, 0L, 0L)))
    // xx: hallucinated → no support, recall 0
    assert(m("xx") == ((0L, 1L, 0L, 1L, 0L, 0L, 0L, 0L)))
  }

  test("madOutliers: doubled-median arithmetic is exact for odd and even groups") {
    // key A (even count 6): values 1..5 + spike 1000
    //   med2 = 3+4 = 7; dev2 = {5,3,1,1,3,1993}; mad4 = 3+3 = 6
    //   flag: 2·dev2 > 3·6 = 18 → only the spike
    // key B (odd count 5): values 1..5 → med2 = 6, dev2 = {4,2,0,2,4},
    //   mad4 = 2·2 = 4 → flag: 2·dev2 > 12 → none
    val rows = (Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L), (5L, 5L), (6L, 1000L))
      .map { case (id, v) => ("A", id, v) } ++
      Seq((11L, 1L), (12L, 2L), (13L, 3L), (14L, 4L), (15L, 5L))
        .map { case (id, v) => ("B", id, v) })
      .toDF("key", "id", "v")
    val out = Profile.madOutliers(rows, "key", "id", "v")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6)))
      .toMap
    assert(out(("A", 6L)) == ((7L, 1993L, 6L, true)), s"spike row: $out")
    assert(out.count { case ((k, _), (_, _, _, f)) => k == "A" && f } == 1)
    assert(out(("B", 13L)) == ((6L, 0L, 4L, false)))
    assert(out.forall { case ((k, _), (_, _, _, f)) => k == "A" || !f },
      "no flags in the uncorrupted group")
  }

  test("agreementKappa: perfect, chance-level and textbook agreement") {
    // perfect agreement → kappa = 1e6
    val perfect = Seq(("a", "a"), ("b", "b"), ("a", "a")).toDF("x", "y")
    val p = LmOps.agreementKappa(perfect, "x", "y").head()
    assert(p.getLong(2) == 1000000L && p.getLong(4) == 1000000L)
    // textbook 2×2: 20 yes-yes, 5 yes-no, 10 no-yes, 15 no-no (n=50)
    // po = 0.7, pe = (25·30 + 25·20)/2500 = 0.5 → kappa = 0.4
    val tb = (Seq.fill(20)(("y", "y")) ++ Seq.fill(5)(("y", "n")) ++
      Seq.fill(10)(("n", "y")) ++ Seq.fill(15)(("n", "n"))).toDF("x", "y")
    val t = LmOps.agreementKappa(tb, "x", "y").head()
    assert(t.getLong(0) == 50L && t.getLong(1) == 35L)
    assert(t.getLong(2) == 700000L && t.getLong(3) == 500000L &&
      t.getLong(4) == 400000L, s"textbook kappa: $t")
    // systematic disagreement → negative kappa (sign-magnitude division)
    val neg = (Seq.fill(10)(("a", "b")) ++ Seq.fill(10)(("b", "a"))).toDF("x", "y")
    val nk = LmOps.agreementKappa(neg, "x", "y").head().getLong(4)
    assert(nk == -1000000L, s"anti-agreement kappa must be -1e6: $nk")
  }

  test("largestRemainderQuota: quotas sum to the budget exactly") {
    // shares of 100: 33.4, 33.3, 33.3 → base 33,33,33; one seat left →
    // largest remainder (.4) gets it
    val counts = Seq(("a", 334L), ("b", 333L), ("c", 333L)).toDF("src", "cnt")
    val q = graft.operators.TextOps.largestRemainderQuota(counts, "src", "cnt", 100L)
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(q("a") == ((33L, 1L, 34L)) && q("b") == ((33L, 0L, 33L)) &&
      q("c") == ((33L, 0L, 33L)), s"$q")
    // remainder ties break to the smaller key
    val tied = Seq(("z", 1L), ("a", 1L), ("m", 1L)).toDF("src", "cnt")
    val t = graft.operators.TextOps.largestRemainderQuota(tied, "src", "cnt", 4L)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(t == Map("a" -> 2L, "m" -> 1L, "z" -> 1L), s"tie must favor 'a': $t")
  }

  test("concentration: uniform vs dominated mix HHI") {
    val uniform = (0 until 100).map(i => ("s" + i % 4)).toDF("src")
    val u = graft.operators.Profile.concentration(uniform, "src").head()
    assert(u.getLong(3) == 250000L, s"uniform 4-way HHI = 1e6/4: $u")
    val mono = (0 until 100).map(_ => "only").toDF("src")
    val m = graft.operators.Profile.concentration(mono, "src").head()
    assert(m.getLong(2) == 1000000L && m.getLong(3) == 1000000L)
  }

  test("kAnonymity flags groups under k") {
    val rows = (Seq.fill(5)(("US", "A")) ++ Seq.fill(2)(("US", "B")) ++
      Seq(("FR", "A"))).toDF("c1", "c2")
    val a = graft.operators.Profile.kAnonymity(rows, Seq("c1", "c2"), k = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getBoolean(3))).toMap
    assert(a(("US", "A")) == ((5L, false)))
    assert(a(("US", "B")) == ((2L, true)))
    assert(a(("FR", "A")) == ((1L, true)))
  }

  test("winsorize clamps to the exact-rank band, values stay in-domain") {
    // 11 values 0..100 step 10 per key: rank ⌊0.1·10⌋=1 → lo=10,
    // ⌊0.9·10⌋=9 → hi=90; 0 clamps up, 100 clamps down, rest untouched
    val rows = (0 to 10).map(i => ("k", i.toLong, i * 10L)).toDF("key", "id", "v")
    val w = graft.operators.Profile.winsorize(rows, "key", "id", "v", 0.1, 0.9)
      .collect().map(r => r.getLong(1) ->
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6), r.getBoolean(7)))
      .toMap
    assert(w(0L) == ((10L, 90L, 10L, true, false)))
    assert(w(10L) == ((10L, 90L, 90L, false, true)))
    assert(w(5L) == ((10L, 90L, 50L, false, false)))
    assert(w.values.forall { case (lo, hi, v, _, _) => lo == 10L && hi == 90L && v % 10 == 0 })
  }

  test("property: kappa is symmetric in its two raters") {
    val rnd = new scala.util.Random(7)
    val labels = Array("a", "b", "c", "d")
    val pairs = Seq.fill(300)((labels(rnd.nextInt(4)), labels(rnd.nextInt(4))))
      .toDF("x", "y")
    val k1 = LmOps.agreementKappa(pairs, "x", "y").head().getLong(4)
    val k2 = LmOps.agreementKappa(pairs, "y", "x").head().getLong(4)
    assert(k1 == k2, s"kappa must not care which rater is 'first': $k1 vs $k2")
  }

  test("property: pareto front is partitioning-invariant and idempotent") {
    val rnd = new scala.util.Random(13)
    val pts = Seq.tabulate(400)(i =>
      ("g" + i % 3, i.toLong, rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .toDF("g", "id", "x", "y")
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("id").as[Long].collect().toSet
    val front = Skyline.paretoFront2D(pts, Seq("g"), "x", "y")
    val shuffled = Skyline.paretoFront2D(pts.repartition(7, col("id")), Seq("g"), "x", "y")
    assert(ids(front) == ids(shuffled), "front must not depend on partitioning")
    val again = Skyline.paretoFront2D(front, Seq("g"), "x", "y")
    assert(ids(again) == ids(front), "front of a front must be itself")
  }

  test("property: quota always sums to the budget, extras are 0/1") {
    val rnd = new scala.util.Random(23)
    for (round <- 1 to 5) {
      val counts = Seq.tabulate(17)(i => ("s" + i, (rnd.nextInt(100000) + 1).toLong))
        .toDF("src", "cnt")
      val budget = rnd.nextInt(1000000).toLong + 1
      val q = graft.operators.TextOps.largestRemainderQuota(counts, "src", "cnt", budget)
        .select("base_quota", "extra", "quota").collect()
      assert(q.map(_.getLong(2)).sum == budget, s"round $round: sum != budget")
      assert(q.forall(r => r.getLong(1) == 0L || r.getLong(1) == 1L))
      assert(q.forall(r => r.getLong(2) == r.getLong(0) + r.getLong(1)))
    }
  }

  test("property: classBalance leaves every class at exactly the min size") {
    val rnd = new scala.util.Random(31)
    val rows = Seq.tabulate(500)(i => (i.toLong, "c" + rnd.nextInt(5))).toDF("id", "cls")
    val minSize = rows.groupBy("cls").count().agg(min("count")).head().getLong(0)
    val bal = graft.operators.TextOps.classBalance(rows, "cls", "id")
    val sizes = bal.groupBy("cls").count().select("count").as[Long].collect()
    assert(sizes.length == 5 && sizes.forall(_ == minSize), s"sizes: ${sizes.toSeq}")
    // determinism across partitioning
    val bal2 = graft.operators.TextOps.classBalance(rows.repartition(9), "cls", "id")
    assert(bal.select("id").as[Long].collect().toSet ==
      bal2.select("id").as[Long].collect().toSet)
  }

  test("property: rougeN of a text against itself is perfect") {
    val rnd = new scala.util.Random(41)
    val texts = Seq.tabulate(50)(i =>
      (i.toLong, Seq.fill(rnd.nextInt(30) + 2)("w" + rnd.nextInt(8)).mkString(" ")))
      .toDF("id", "t")
    val m = LmOps.rougeN(texts.select(col("id"), col("t").as("cand"), col("t").as("ref")),
      "cand", "ref", n = 2)
    assert(m.filter(col("f1_micro") =!= 1000000L).count() == 0,
      "self-ROUGE must be exactly 1.0 everywhere")
  }

  test("rendezvous sharding: growing the pool moves only keys won by the new worker") {
    val keys = (0L until 4000L).toDF("k")
    val w8 = graft.operators.TextOps.rendezvousShard(keys, "k", 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val w9 = graft.operators.TextOps.rendezvousShard(keys, "k", 9)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w8.values.toSet.subsetOf((0L until 8L).toSet))
    val moved = w8.keys.filter(k => w8(k) != w9(k)).toSeq
    assert(moved.forall(k => w9(k) == 8L),
      "every moved key must land on the NEW worker — the rendezvous guarantee")
    val frac = moved.size / 4000.0
    assert(frac > 0.06 && frac < 0.17, s"moved fraction $frac should be ~1/9")
    // balance: each of the 8 shards holds roughly n/8
    val sizes = w8.values.groupBy(identity).map(_._2.size)
    assert(sizes.min > 4000 / 8 * 0.7 && sizes.max < 4000 / 8 * 1.3,
      s"shard sizes too skewed: $sizes")
  }

  test("chrF: identical pair is perfect, char grams credit partial words") {
    val pairs = Seq(
      (1L, "ab cd", "ab cd"),       // identical
      (2L, "abcd", "abce"))         // 3 bigrams each, 2 shared (ab, bc)
      .toDF("id", "cand", "ref")
    val m = LmOps.chrF(pairs, "cand", "ref", n = 2)
      .select("id", "n_overlap", "n_cand", "precision_micro", "f1_micro")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(m(1L) == ((3L, 3L, 1000000L, 1000000L)))
    assert(m(2L) == ((2L, 3L, 666666L, 666666L)), s"partial credit: ${m(2L)}")
  }

  test("destutter collapses runs but never non-adjacent repeats") {
    val docs = Seq(
      (1L, "the the the cat sat sat"),  // runs collapse
      (2L, "a b a b"),                  // non-adjacent repeats survive
      (3L, "x"))                        // single token untouched
      .toDF("doc_id", "text")
    val out = graft.operators.TextOps.destutter(docs)
      .collect().map(r => r.getLong(0) -> (r.getString(2), r.getLong(3))).toMap
    assert(out(1L) == (("the cat sat", 3L)))
    assert(out(2L) == (("a b a b", 0L)))
    assert(out(3L) == (("x", 0L)))
  }

  test("paretoFront2D matches brute-force dominance, duplicates survive") {
    val pts = Seq(
      ("g1", 1L, 5L, 5L), ("g1", 2L, 5L, 5L), // exact duplicates: both stay
      ("g1", 3L, 4L, 6L), ("g1", 4L, 6L, 4L), // frontier corners
      ("g1", 5L, 4L, 4L), ("g1", 6L, 5L, 4L), // dominated
      ("g2", 7L, 1L, 1L),                     // other group: its own front
      ("g2", 8L, 0L, 9L))
      .toDF("g", "id", "x", "y")
    val got = Skyline.paretoFront2D(pts, Seq("g"), "x", "y")
      .select("id").as[Long].collect().toSet
    // brute force over the same points
    val raw = pts.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val want = raw.filter { case (g, _, x, y) =>
      !raw.exists { case (g2, _, x2, y2) =>
        g2 == g && x2 >= x && y2 >= y && (x2 > x || y2 > y) }
    }.map(_._2).toSet
    assert(got == want, s"got $got want $want")
    assert(got == Set(1L, 2L, 3L, 4L, 7L, 8L))
  }

  test("paretoFront2DGlobal == brute force, partitioning-invariant, nulls dropped") {
    val rnd = new scala.util.Random(41)
    val base = Seq.tabulate(600)(i =>
      (i.toLong, rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
    val pts = (base.map { case (i, x, y) => (i, Some(x), Some(y)) } ++
      Seq((600L, None, Some(99L)), (601L, Some(99L), None))) // null x/y never win
      .toDF("id", "x", "y")
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("id").as[Long].collect().toSet
    val want = base.filter { case (_, x, y) =>
      !base.exists { case (_, x2, y2) => x2 >= x && y2 >= y && (x2 > x || y2 > y) }
    }.map(_._1).toSet
    assert(ids(Skyline.paretoFront2DGlobal(pts, "x", "y")) == want)
    assert(ids(Skyline.paretoFront2DGlobal(pts.repartition(11, col("id")),
      "x", "y")) == want, "global front must not depend on partitioning")
    // single-partition degenerate case
    assert(ids(Skyline.paretoFront2DGlobal(pts.coalesce(1), "x", "y")) == want)
  }

  test("paretoFront2DGlobal keeps exact duplicates and agrees with grouped path") {
    val pts = Seq((1L, 5L, 5L), (2L, 5L, 5L), (3L, 4L, 6L), (4L, 6L, 4L),
      (5L, 4L, 4L), (6L, 5L, 4L)).toDF("id", "x", "y")
    val global = Skyline.paretoFront2DGlobal(pts, "x", "y")
      .select("id").as[Long].collect().toSet
    val grouped = Skyline.paretoFront2D(pts.withColumn("g", lit(1)),
      Seq("g"), "x", "y").select("id").as[Long].collect().toSet
    assert(global == grouped && global == Set(1L, 2L, 3L, 4L))
  }

  test("paretoFront2D rejects fractional x/y loudly") {
    val pts = Seq((1L, 1.5, 2L)).toDF("id", "x", "y")
    intercept[IllegalArgumentException] {
      Skyline.paretoFront2D(pts, Seq("id"), "x", "y")
    }
    intercept[IllegalArgumentException] {
      Skyline.paretoFront2DGlobal(pts, "x", "y")
    }
  }

  // ---------------------------------------------------------------- AUC

  private def aucOf(rows: Seq[(Long, Long)]): (Long, Long, Long, Long, Long) = {
    val r = LmOps.binaryAuc(rows.toDF("score", "y"), "score", "y").collect()(0)
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
  }

  test("binaryAuc: separation, pure ties, mixed ties, negative scores, degenerate") {
    // perfect separation → 1.0
    assert(aucOf(Seq((10L, 1L), (9L, 1L), (2L, 0L), (1L, 0L))) ==
      ((4L, 2L, 2L, 1000000L, 1000000L)))
    // every score tied → 0.5, gini 0
    assert(aucOf(Seq((5L, 1L), (5L, 1L), (5L, 0L), (5L, 0L))) ==
      ((4L, 2L, 2L, 500000L, 0L)))
    // hand case: pairs 3 wins + 1 tie of 4 → 0.875
    assert(aucOf(Seq((1L, 0L), (2L, 1L), (2L, 0L), (3L, 1L))) ==
      ((4L, 2L, 2L, 875000L, 750000L)))
    // same case shifted below zero — the equal-width buckets must keep
    // ascending score order across the 0 boundary
    assert(aucOf(Seq((-4L, 0L), (-3L, 1L), (-3L, 0L), (-2L, 1L)))._4 == 875000L)
    assert(aucOf(Seq((-2L, 0L), (-1L, 0L), (1L, 1L), (2L, 1L)))._4 == 1000000L)
    // no negatives → defined as 0, not NaN
    assert(aucOf(Seq((1L, 1L), (2L, 1L))) == ((2L, 2L, 0L, 0L, -1000000L)))
  }

  test("binaryAuc matches the O(n²) pairwise count on a pseudo-random input") {
    // deterministic LCG — no Math.random in specs
    val xs = Iterator.iterate(48271L)(x => (x * 25214903917L + 11) & 0xffffffffL)
      .drop(1).take(60).toSeq
    val rows = xs.map(x => ((x >> 7) % 19 - 9, (x >> 3) % 2)) // scores in [-9,9], ~half pos
    val pos = rows.filter(_._2 == 1L).map(_._1)
    val neg = rows.filter(_._2 == 0L).map(_._1)
    val num2 = (for (p <- pos; n <- neg)
      yield if (p > n) 2L else if (p == n) 1L else 0L).sum
    val expected = 1000000L * num2 / (2L * pos.size * neg.size)
    assert(aucOf(rows)._4 == expected)
  }

  test("binaryAucBy equals per-group binaryAuc, groups never leak into each other") {
    val xs = Iterator.iterate(7919L)(x => (x * 6364136223846793005L + 1442695040888963407L) & 0x7fffffffL)
      .drop(1).take(120).toSeq
    val rows = xs.zipWithIndex.map { case (x, i) =>
      (s"g${i % 3}", (x >> 5) % 23 - 11, (x >> 2) % 2) }
    val grouped = LmOps.binaryAucBy(rows.toDF("k", "score", "y"),
      Seq("k"), "score", "y")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(grouped.size == 3)
    for (g <- Seq("g0", "g1", "g2")) {
      val solo = LmOps.binaryAuc(
        rows.filter(_._1 == g).map(t => (t._2, t._3)).toDF("score", "y"),
        "score", "y").collect()(0)
      assert(grouped(g) ==
        ((solo.getLong(0), solo.getLong(1), solo.getLong(2), solo.getLong(3))),
        s"group $g disagrees with the global operator on its slice")
    }
  }

  test("binaryAucSe: DeLong hand case, placement identity, degenerate") {
    // pos {2,3}, neg {1,2}: placements q = {0.75, 1.0}, r = {1.0, 0.75}
    // → S10 = S01 = 1/32, SE = √(1/32) = 0.176777
    val rows = Seq((2L, 1L), (3L, 1L), (1L, 0L), (2L, 0L)).toDF("score", "y")
    val r = LmOps.binaryAucSe(rows, "score", "y").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((4L, 2L, 2L, 875000L)))
    val se = r.getDouble(4)
    assert(se == BigDecimal(math.sqrt(1.0 / 32.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val lo = BigDecimal(math.max(0.0, 0.875 - 1.959964 * se))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val hi = BigDecimal(math.min(1.0, 0.875 + 1.959964 * se))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(5) == lo && r.getDouble(6) == hi)
    // the AUC itself must agree with the plain operator on any input
    val xs = Iterator.iterate(23L)(x => (x * 48271) % 2147483647L)
      .drop(1).take(80).toSeq
    val rnd = xs.map(x => ((x >> 5) % 17 - 8, (x >> 2) % 2)).toDF("score", "y")
    assert(LmOps.binaryAucSe(rnd, "score", "y").collect()(0).getLong(3) ==
      LmOps.binaryAuc(rnd, "score", "y").collect()(0).getLong(3))
    // nPos < 2 → SE and CI collapse to the point estimate bounds
    val degen = Seq((5L, 1L), (1L, 0L), (2L, 0L)).toDF("score", "y")
    val d = LmOps.binaryAucSe(degen, "score", "y").collect()(0)
    assert(d.getLong(3) == 1000000L && d.getDouble(4) == 0.0)
  }

  test("binaryAucCompare: brute-force paired DeLong, identical scorers, constant baseline") {
    val xs = Iterator.iterate(311L)(x => (x * 48271) % 2147483647L)
      .drop(1).take(70).toSeq
    val rows = xs.map { x =>
      val y = (x >> 2) % 2
      // scorer A is informative, B is a noisier copy — correlated scorers
      val sa = (x >> 5) % 13 + y * 4
      val sb = (x >> 7) % 13 + y * 2
      (sa, sb, y)
    }
    val r = LmOps.binaryAucCompare(rows.toDF("sa", "sb", "y"), "sa", "sb", "y")
      .collect()(0)
    // brute force: per-observation placements, paired variance components
    val pos = rows.filter(_._3 == 1L)
    val neg = rows.filter(_._3 == 0L)
    def plPos(s: Long, f: ((Long, Long, Long)) => Long) =
      (neg.count(n => f(n) < s) + 0.5 * neg.count(n => f(n) == s)) / neg.size
    def plNeg(s: Long, f: ((Long, Long, Long)) => Long) =
      (pos.count(p => f(p) > s) + 0.5 * pos.count(p => f(p) == s)) / pos.size
    def comps(pl: Seq[(Double, Double)], m: Int) = {
      val (ma, mb) = (pl.map(_._1).sum / m, pl.map(_._2).sum / m)
      (pl.map(t => (t._1 - ma) * (t._1 - ma)).sum / (m - 1),
        pl.map(t => (t._2 - mb) * (t._2 - mb)).sum / (m - 1),
        pl.map(t => (t._1 - ma) * (t._2 - mb)).sum / (m - 1))
    }
    val p10 = pos.map(t => (plPos(t._1, _._1), plPos(t._2, _._2)))
    val p01 = neg.map(t => (plNeg(t._1, _._1), plNeg(t._2, _._2)))
    val (va10, vb10, cab10) = comps(p10, pos.size)
    val (va01, vb01, cab01) = comps(p01, neg.size)
    val se = math.sqrt((va10 + vb10 - 2 * cab10) / pos.size +
      (va01 + vb01 - 2 * cab01) / neg.size)
    val aucA = p10.map(_._1).sum / pos.size
    val aucB = p10.map(_._2).sum / pos.size
    assert(r.getLong(3) == (aucA * 1000000).round ||
      r.getLong(3) == math.floor(aucA * 1000000).toLong) // floor contract
    assert(math.abs(r.getDouble(6) - se) < 2e-6,
      s"se mismatch: op=${r.getDouble(6)} brute=$se")
    val z = (r.getLong(5).toDouble / 1000000.0) / r.getDouble(6)
    assert(math.abs(r.getDouble(7) - z) < 2e-6)
    assert(r.getLong(3) - r.getLong(4) == r.getLong(5))
    assert((aucA - aucB) * (r.getLong(5).toDouble) >= 0.0) // same sign
    // identical scorers: diff, SE and z all collapse to zero
    val same = LmOps.binaryAucCompare(
      rows.map(t => (t._1, t._1, t._3)).toDF("sa", "sb", "y"), "sa", "sb", "y")
      .collect()(0)
    assert(same.getLong(5) == 0L && same.getDouble(6) == 0.0 &&
      same.getDouble(7) == 0.0)
    // constant baseline scores exactly 0.5 (all ties)
    val const = LmOps.binaryAucCompare(
      rows.map(t => (t._1, 7L, t._3)).toDF("sa", "sb", "y"), "sa", "sb", "y")
      .collect()(0)
    assert(const.getLong(4) == 500000L)
  }

  test("calibrationReport: hand-computed bins, Brier and ECE; top-edge bin clamp") {
    val rows = Seq((100000L, 0L), (300000L, 1L), (900000L, 1L), (950000L, 0L))
    val out = LmOps.calibrationReport(rows.toDF("pm", "y"), "pm", "y", bins = 10)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    // brier = (1e10 + 4.9e11 + 1e10 + 9.025e11) DIV (4·1e6) = 353125
    // ece   = (1·100000 + 1·700000 + 2·425000) DIV 4 = 412500
    assert(out(1L) == ((1L, 0L, 100000L, 0L, 353125L, 412500L)))
    assert(out(3L) == ((1L, 1L, 300000L, 1000000L, 353125L, 412500L)))
    assert(out(9L) == ((2L, 1L, 925000L, 500000L, 353125L, 412500L)))
    assert(out.size == 3)
    // pm = 10⁶ exactly lands in the top bin, not a phantom bin 10
    val edge = LmOps.calibrationReport(
      Seq((1000000L, 1L)).toDF("pm", "y"), "pm", "y", bins = 10).collect()(0)
    assert(edge.getLong(0) == 9L && edge.getLong(5) == 0L)
  }

  test("property: eval/drift invariances — AUC monotone/complement, Spearman/chi2/KS symmetry") {
    // three deterministic LCG datasets; each property is exact, not
    // approximate, so a handful of draws is a real check
    for (seed <- Seq(3L, 17L, 91L)) {
      val xs = Iterator.iterate(seed * 2654435761L)(x =>
        (x * 6364136223846793005L + 1442695040888963407L) & 0x7fffffffL)
        .drop(1).take(60).toSeq
      val rows = xs.map(x => ((x >> 4) % 31 - 15, (x >> 2) % 2))
      def auc(df: org.apache.spark.sql.DataFrame) =
        LmOps.binaryAuc(df, "score", "y").collect()(0).getLong(3)
      val base = auc(rows.toDF("score", "y"))
      // strictly monotone transforms preserve every pairwise comparison
      assert(auc(rows.map(t => (t._1 * 3 - 7, t._2)).toDF("score", "y")) == base)
      // complement: num2(s) + num2(−s) = 2·nPos·nNeg exactly, so the two
      // floored AUCs sum to 10⁶ or 10⁶−1
      val comp = auc(rows.map(t => (-t._1, t._2)).toDF("score", "y"))
      assert(base + comp == 1000000L || base + comp == 999999L,
        s"auc complement broke: $base + $comp")
      // Spearman: symmetric in its arguments; self-correlation is exactly 1
      val pairs = xs.map(x => ((x >> 3) % 23, (x >> 6) % 19))
      val pdf = pairs.toDF("x", "y")
      val rxy = Profile.spearman(pdf, "x", "y").collect()(0).getLong(1)
      val ryx = Profile.spearman(pdf, "y", "x").collect()(0).getLong(1)
      assert(rxy == ryx)
      assert(Profile.spearman(pdf, "x", "x").collect()(0).getLong(1) == 1000000L)
      // χ²: swapping the two categorical columns transposes the grid —
      // identical statistic, swapped cardinalities
      val cats = xs.map(x => (s"a${(x >> 2) % 3}", s"b${(x >> 5) % 4}"))
      val cdf = cats.toDF("u", "v")
      val c1 = Profile.chiSquare(cdf, "u", "v").collect()(0)
      val c2 = Profile.chiSquare(cdf, "v", "u").collect()(0)
      assert(c1.getLong(4) == c2.getLong(4) && c1.getLong(3) == c2.getLong(3) &&
        c1.getLong(1) == c2.getLong(2) && c1.getLong(2) == c2.getLong(1))
      // KS: swapping sides flips cum_a/cum_b but D and its argmax agree
      val ks = xs.map(x => ((x >> 4) % 41, if ((x & 1) == 0) "A" else "B"))
      val kdf = ks.toDF("v", "g")
      val k1 = Profile.ksTwoSample(kdf, "v", "g", "A", "B").collect()(0)
      val k2 = Profile.ksTwoSample(kdf, "v", "g", "B", "A").collect()(0)
      assert(k1.getLong(5) == k2.getLong(5) && k1.getLong(0) == k2.getLong(0) &&
        k1.getLong(3) == k2.getLong(4) && k1.getLong(4) == k2.getLong(3))
      // τ-b: symmetric in its arguments (concordance is a pair property);
      // reversing one axis swaps conc↔disc and flips the sign exactly;
      // self-association is exactly 1
      val t1 = Profile.kendallTauB(pdf, "x", "y").collect()(0)
      val t2 = Profile.kendallTauB(pdf, "y", "x").collect()(0)
      assert(t1.getLong(1) == t2.getLong(1) && t1.getLong(2) == t2.getLong(2) &&
        t1.getDouble(5) == t2.getDouble(5) &&
        t1.getLong(3) == t2.getLong(4) && t1.getLong(4) == t2.getLong(3))
      val tr = Profile.kendallTauB(
        pairs.map(t => (t._1, -t._2)).toDF("x", "y"), "x", "y").collect()(0)
      assert(tr.getLong(1) == t1.getLong(2) && tr.getLong(2) == t1.getLong(1) &&
        tr.getDouble(5) == -t1.getDouble(5),
        s"axis reversal must swap conc/disc and negate tau: $t1 vs $tr")
      assert(Profile.kendallTauB(pdf, "x", "x").collect()(0).getDouble(5) == 1.0)
      // MI: symmetric in its arguments (swapped cardinalities/entropies)
      val m1 = Profile.mutualInfo(cdf, "u", "v").collect()(0)
      val m2 = Profile.mutualInfo(cdf, "v", "u").collect()(0)
      assert(m1.getDouble(3) == m2.getDouble(3) &&
        m1.getDouble(6) == m2.getDouble(6) &&
        m1.getLong(1) == m2.getLong(2) && m1.getLong(2) == m2.getLong(1) &&
        m1.getDouble(4) == m2.getDouble(5) && m1.getDouble(5) == m2.getDouble(4))
    }
  }

  test("null inputs are complete-case across the eval/drift family") {
    // binaryAuc: a null score group must not inflate neg_below (it used
    // to sort NULLS FIRST into every offset while the null-unsafe join
    // dropped its own row → auc_micro 5.0)
    val withNull = Seq((Some(1L), 0L), (Some(2L), 1L), (None, 0L), (None, 0L))
      .toDF("score", "y")
    val a = LmOps.binaryAuc(withNull, "score", "y").collect()(0)
    assert((a.getLong(0), a.getLong(1), a.getLong(2), a.getLong(3)) ==
      ((2L, 1L, 1L, 1000000L)))
    // binaryAucBy: null keys and null scores both drop, by contract
    val byNull = Seq((Some("g"), Some(1L), 0L), (Some("g"), Some(2L), 1L),
      (None: Option[String], Some(9L), 1L), (Some("g"), None: Option[Long], 0L))
      .toDF("k", "score", "y")
    val by = LmOps.binaryAucBy(byNull, Seq("k"), "score", "y").collect()
    assert(by.length == 1 && by(0).getLong(1) == 2L && by(0).getLong(4) == 1000000L)
    // chiSquare: null categories excluded from totals AND grid
    val chiNull = Seq((Some("s1"), Some("en")), (Some("s1"), Some("fr")),
      (Some("s2"), Some("en")), (Some("s2"), Some("fr")),
      (Some("s1"), None: Option[String]), (None: Option[String], Some("en")))
      .toDF("a", "b")
    val c = Profile.chiSquare(chiNull, "a", "b").collect()(0)
    assert((c.getLong(0), c.getLong(4)) == ((4L, 0L))) // uniform 2×2 → χ² 0
    // spearman: pairwise deletion keeps the rank spaces consistent
    val spNull = Seq((Some(1L), Some(10L)), (Some(2L), Some(20L)),
      (None: Option[Long], Some(5L)), (Some(3L), None: Option[Long]),
      (Some(3L), Some(30L))).toDF("x", "y")
    val sp = Profile.spearman(spNull, "x", "y").collect()(0)
    assert((sp.getLong(0), sp.getLong(1)) == ((3L, 1000000L)))
    // ksTwoSample: null values excluded from both CDFs and totals
    val ksNull = Seq((Some(1L), "A"), (Some(2L), "A"), (None: Option[Long], "A"),
      (Some(1L), "B"), (Some(2L), "B")).toDF("v", "g")
    val k = Profile.ksTwoSample(ksNull, "v", "g", "A", "B").collect()(0)
    assert((k.getLong(1), k.getLong(2), k.getLong(5)) == ((2L, 2L, 0L)))
    // calibrationReport: a null probability neither bins nor counts
    val calNull = Seq((Some(500000L), 1L), (None: Option[Long], 0L))
      .toDF("pm", "y")
    val cal = LmOps.calibrationReport(calNull, "pm", "y").collect()
    assert(cal.length == 1 && cal(0).getLong(1) == 1L)
  }

  test("pavFit: monotone passes through, violators pool, chains collapse") {
    // already monotone → untouched rates
    assert(LmOps.pavFit(Seq((0L, 10L, 1L), (1L, 10L, 5L), (2L, 10L, 9L))) ==
      Seq(0L -> 100000L, 1L -> 500000L, 2L -> 900000L))
    // single violation pools both bins at the joint rate
    assert(LmOps.pavFit(Seq((0L, 10L, 8L), (1L, 10L, 2L))) ==
      Seq(0L -> 500000L, 1L -> 500000L))
    // textbook 1,0,1 → first two pool, third stands
    assert(LmOps.pavFit(Seq((0L, 1L, 1L), (1L, 1L, 0L), (2L, 1L, 1L))) ==
      Seq(0L -> 500000L, 1L -> 500000L, 2L -> 1000000L))
    // strictly decreasing chain collapses to one block
    assert(LmOps.pavFit(Seq((0L, 2L, 2L), (1L, 2L, 1L), (2L, 2L, 0L))) ==
      Seq(0L -> 500000L, 1L -> 500000L, 2L -> 500000L))
    // sparse / unsorted bin ids are sorted first
    assert(LmOps.pavFit(Seq((9L, 4L, 4L), (2L, 4L, 0L))) ==
      Seq(2L -> 0L, 9L -> 1000000L))
  }

  test("isotonicCalibrate: output is non-decreasing and preserves bin counts") {
    val rows = (0 until 200).map { i =>
      val pm = (i.toLong * 2654435761L) % 1000001L
      // noisy-but-rising label probability in the score
      (pm, if ((pm / 1000L + (i % 7) * 40L) % 97L > 45L) 1L else 0L)
    }
    val out = LmOps.isotonicCalibrate(rows.toDF("pm", "y"), "pm", "y", bins = 8)
      .orderBy("bin").collect()
    assert(out.map(_.getLong(1)).sum == 200L)
    val iso = out.map(_.getLong(4))
    assert(iso.zip(iso.tail).forall { case (a, b) => a <= b },
      s"iso_micro not monotone: ${iso.mkString(",")}")
    // each bin's pooled value is bounded by the raw rate extremes
    assert(iso.head >= 0L && iso.last <= 1000000L)
  }

  test("krippendorffAlpha: hand case, m<2 exclusion, perfect, single-value") {
    // u1 aaa, u2 aab, u3 bbb, u4 abc → do 5e6/12, de 82e6/132, alpha 329270
    val obs = Seq(
      (1L, "a"), (1L, "a"), (1L, "a"),
      (2L, "a"), (2L, "a"), (2L, "b"),
      (3L, "b"), (3L, "b"), (3L, "b"),
      (4L, "a"), (4L, "b"), (4L, "c")).toDF("u", "v")
    val r = LmOps.krippendorffAlpha(obs, "u", "v").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((4L, 12L, 416666L, 621212L, 329270L)))
    // a singleton unit carries no pair information — identical output
    val r2 = LmOps.krippendorffAlpha(
      obs.unionByName(Seq((5L, "c")).toDF("u", "v")), "u", "v").collect()(0)
    assert((r2.getLong(0), r2.getLong(4)) == ((4L, 329270L)))
    // perfect agreement → alpha = 1
    val perfect = Seq((1L, "x"), (1L, "x"), (2L, "y"), (2L, "y")).toDF("u", "v")
    assert(LmOps.krippendorffAlpha(perfect, "u", "v")
      .collect()(0).getLong(4) == 1000000L)
    // one value everywhere → de = 0 → alpha reported 0 per contract
    val mono = Seq((1L, "x"), (1L, "x"), (2L, "x"), (2L, "x")).toDF("u", "v")
    assert(LmOps.krippendorffAlpha(mono, "u", "v")
      .collect()(0).getLong(4) == 0L)
  }

  test("spearman: perfect, inverse, tie hand case, degenerate") {
    def rho(rows: Seq[(Long, Long)]): (Long, Long) = {
      val r = Profile.spearman(rows.toDF("x", "y"), "x", "y").collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    assert(rho(Seq((1L, 10L), (2L, 20L), (5L, 21L), (9L, 90L))) == ((4L, 1000000L)))
    assert(rho(Seq((1L, 3L), (2L, 2L), (3L, 1L))) == ((3L, -1000000L)))
    // tie on x = 2 (avg rank 2.5): Σd2² = 2 → ρ = 1 − 3/60 = 0.95
    assert(rho(Seq((1L, 1L), (2L, 2L), (2L, 3L), (3L, 4L))) == ((4L, 950000L)))
    assert(rho(Seq((7L, 7L))) == ((1L, 0L)))
  }

  test("ksTwoSampleBy equals per-group ksTwoSample; WindowGroupLimit argmax") {
    val xs = Iterator.iterate(101L)(x => (x * 48271) % 2147483647L)
      .drop(1).take(150).toSeq
    val rows = xs.zipWithIndex.map { case (x, i) =>
      (s"k${i % 3}", (x >> 4) % 37, if ((x & 2) == 0) "A" else "B") }
    val by = Profile.ksTwoSampleBy(rows.toDF("k", "v", "g"),
      Seq("k"), "v", "g", "A", "B")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(by.size == 3)
    for (grp <- Seq("k0", "k1", "k2")) {
      val solo = Profile.ksTwoSample(
        rows.filter(_._1 == grp).map(t => (t._2, t._3)).toDF("v", "g"),
        "v", "g", "A", "B").collect()(0)
      assert(by(grp) == ((solo.getLong(0), solo.getLong(1), solo.getLong(2),
        solo.getLong(3), solo.getLong(4), solo.getLong(5))),
        s"slice $grp disagrees with the global operator")
    }
    // the rank<=1 argmax must plan WindowGroupLimit, not a full per-key sort
    val plan = Profile.ksTwoSampleBy(rows.toDF("k", "v", "g"),
      Seq("k"), "v", "g", "A", "B").queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      "per-key argmax lost the WindowGroupLimit shape")
  }

  test("chiSquare: hand 2x2, independence, perfect association with zero cells") {
    def chi(rows: Seq[(String, String)]): (Long, Long, Long, Long, Long, Double) = {
      val r = Profile.chiSquare(rows.toDF("a", "b"), "a", "b").collect()(0)
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getDouble(5))
    }
    // 30/10 vs 10/30 over 80: e = 20 per cell, χ² = 4·(10²/20) = 20, V = 0.5
    val hand = Seq.fill(30)(("s1", "en")) ++ Seq.fill(10)(("s1", "fr")) ++
      Seq.fill(10)(("s2", "en")) ++ Seq.fill(30)(("s2", "fr"))
    assert(chi(hand) == ((80L, 2L, 2L, 1L, 20000000L, 0.5)))
    // perfectly independent uniform grid → 0
    val indep = for (a <- Seq("s1", "s2"); b <- Seq("en", "fr");
      _ <- 1 to 20) yield (a, b)
    assert(chi(indep) == ((80L, 2L, 2L, 1L, 0L, 0.0)))
    // perfect association: the off-diagonal cells are ZERO-observed and
    // must still contribute e = r·c/n each; χ² = n, V = 1
    val assoc = Seq.fill(10)(("u", "p")) ++ Seq.fill(10)(("v", "q"))
    assert(chi(assoc) == ((20L, 2L, 2L, 1L, 20000000L, 1.0)))
    // degenerate single column value → dof 0, V defined as 0
    val mono = Seq(("s1", "en"), ("s2", "en"))
    assert(chi(mono) == ((2L, 2L, 1L, 0L, 0L, 0.0)))
  }

  test("ksTwoSample: identical, disjoint, negative values, empty side") {
    def ks(rows: Seq[(Long, String)]): (Long, Long, Long, Long, Long, Long) = {
      val r = Profile.ksTwoSample(rows.toDF("v", "g"), "v", "g", "A", "B").collect()(0)
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
    }
    val same = Seq((1L, "A"), (2L, "A"), (3L, "A"), (1L, "B"), (2L, "B"), (3L, "B"))
    assert(ks(same) == ((1L, 3L, 3L, 1L, 1L, 0L)))
    val disj = Seq((1L, "A"), (2L, "A"), (5L, "B"), (6L, "B"))
    assert(ks(disj) == ((2L, 2L, 2L, 2L, 0L, 1000000L)))
    // negatives exercise bucketing over a negative value range; per-side
    // floors make the two directions land 333333 vs 333334
    val neg = Seq((-5L, "A"), (-1L, "A"), (3L, "A"), (-3L, "B"), (2L, "B"), (4L, "B"))
    assert(ks(neg) == ((3L, 3L, 3L, 3L, 2L, 333334L)))
    // an empty side is undefined — deterministic d = 0 row, not an error
    val only = Seq((1L, "A"), (2L, "A"))
    assert(ks(only) == ((1L, 2L, 0L, 1L, 0L, 0L)))
  }

  test("cusum: hand recursion replication; cusumBy equals per-key global") {
    // hand fold of the Page recursion on a drifting series
    val xs = Iterator.iterate(67L)(x => (x * 48271) % 2147483647L)
      .drop(1).take(60).toSeq
    val series = xs.zipWithIndex.map { case (x, i) =>
      (i.toLong, 100L + (x % 21) - 10 + (if (i >= 40) 15L else 0L)) }
    def hand(s: Seq[(Long, Long)], tg: Long, ka: Long, h: Long) = {
      var (hi, lo) = (0L, 0L)
      s.sortBy(_._1).map { case (o, x) =>
        hi = math.max(0L, hi + x - tg - ka); lo = math.max(0L, lo + tg - ka - x)
        (o, x, hi, lo, if (hi >= h) 1L else 0L, if (lo >= h) 1L else 0L)
      }
    }
    val df = series.toDF("b", "x")
      .withColumn("target", lit(100L)).withColumn("allowance", lit(5L))
      .withColumn("threshold", lit(60L))
    val got = Profile.cusum(df, "b", "x", "target", "allowance", "threshold")
      .orderBy("b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == hand(series, 100L, 5L, 60L),
      "window closed form must equal the Page recursion")
    assert(got.exists(_._5 == 1L), "the planted late drift must alarm")
    // keyed: two series with opposite drifts, each must match its solo run
    val keyed = series.map { case (o, x) => ("up", o, x) } ++
      series.map { case (o, x) => ("down", o, 200L - x) }
    val by = Profile.cusumBy(keyed.toDF("k", "b", "x")
        .withColumn("target", lit(100L)).withColumn("allowance", lit(5L))
        .withColumn("threshold", lit(60L)),
      Seq("k"), "b", "x", "target", "allowance", "threshold")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.toSeq.drop(1)).toMap
    for (k <- Seq("up", "down")) {
      val solo = Profile.cusum(keyed.filter(_._1 == k)
          .map(t => (t._2, t._3)).toDF("b", "x")
          .withColumn("target", lit(100L)).withColumn("allowance", lit(5L))
          .withColumn("threshold", lit(60L)),
        "b", "x", "target", "allowance", "threshold")
        .collect().map(r => r.getLong(0) -> r.toSeq).toMap
      solo.foreach { case (o, row) =>
        assert(by((k, o)) == row, s"slice $k ord $o disagrees with the global operator")
      }
    }
  }

  test("wasserstein1: shift closed form, point masses, identical/empty sides, BigInt replication, store merge") {
    def w1(rows: Seq[(Long, String)]): Long = {
      val out = Profile.wasserstein1(rows.toDF("v", "g"), "v", "g", "A", "B")
        .collect()
      assert(out.length == 1); out(0).getLong(3)
    }
    // shift by δ: W1 = δ exactly, independent of the base distribution
    val base = Seq(0L, 1L, 1L, 4L, 9L, 9L, 9L, 23L)
    val shift = base.map(v => (v, "A")) ++ base.map(v => (v + 7L, "B"))
    assert(w1(shift) == 7000000L, "shift-by-7 must report exactly 7.0")
    // point masses 0 vs 10 with UNEQUAL counts: W1 = 10 exactly
    assert(w1(Seq((0L, "A"), (10L, "B"), (10L, "B"))) == 10000000L)
    // identical distributions: 0; empty side: 0 by contract
    assert(w1(Seq((3L, "A"), (5L, "A"), (3L, "B"), (5L, "B"))) == 0L)
    assert(w1(Seq((3L, "A"), (5L, "A"))) == 0L)
    // BigInt replication of Σ|cumA·tb − cumB·ta|·Δv on pseudo-random data
    val xs = Iterator.iterate(41L)(x => (x * 48271) % 2147483647L)
      .drop(1).take(300).toSeq
    val rnd = xs.zipWithIndex.map { case (x, i) =>
      ((x >> 4) % 97 - 20, if (i % 2 == 0) "A" else "B") }
    val aCnt = rnd.filter(_._2 == "A").groupBy(_._1).view.mapValues(_.size).toMap
    val bCnt = rnd.filter(_._2 == "B").groupBy(_._1).view.mapValues(_.size).toMap
    val vs = (aCnt.keySet ++ bCnt.keySet).toSeq.sorted
    val (ta, tb) = (BigInt(aCnt.values.sum), BigInt(bCnt.values.sum))
    var (ca, cb, area) = (BigInt(0), BigInt(0), BigInt(0))
    for ((v, nv) <- vs.zip(vs.drop(1))) {
      ca += BigInt(aCnt.getOrElse(v, 0)); cb += BigInt(bCnt.getOrElse(v, 0))
      area += (ca * tb - cb * ta).abs * (nv - v)
    }
    val want = (BigInt(1000000) * area / (ta * tb)).toLong
    assert(w1(rnd) == want, s"W1 disagrees with the replayed formula")
    // the (v, ca, cb) store is mergeable: two batch deltas ≡ the whole
    val counts = rnd.toDF("v", "g")
      .groupBy(col("v"))
      .agg(sum(when(col("g") === "A", 1L).otherwise(0L)).as("ca"),
        sum(when(col("g") === "B", 1L).otherwise(0L)).as("cb"))
    val half1 = rnd.take(150); val half2 = rnd.drop(150)
    def delta(rs: Seq[(Long, String)]) = rs.toDF("v", "g")
      .groupBy(col("v"))
      .agg(sum(when(col("g") === "A", 1L).otherwise(0L)).as("ca"),
        sum(when(col("g") === "B", 1L).otherwise(0L)).as("cb"))
    val merged = Profile.wasserstein1FromCounts(
      delta(half1).unionByName(delta(half2))).collect()(0)
    val whole = Profile.wasserstein1FromCounts(counts).collect()(0)
    assert(merged.toSeq == whole.toSeq, "batch deltas must merge to the whole")
    // empty store → zero rows, not a null row
    assert(Profile.wasserstein1FromCounts(counts.limit(0)).collect().isEmpty)
  }

  test("wasserstein1By equals per-group wasserstein1 (incl. shifted ranges and an empty side)") {
    val xs = Iterator.iterate(83L)(x => (x * 48271) % 2147483647L)
      .drop(1).take(400).toSeq
    // k0/k1 differ in value RANGE (per-key min/max must not alias); k2's
    // B side is empty (w1 = 0 by contract, still one row)
    val rows = xs.zipWithIndex.map { case (x, i) =>
      val k = s"k${i % 3}"
      val v = if (i % 3 == 0) (x >> 4) % 50 else 5000 + (x >> 4) % 900
      val g = if (i % 3 == 2) "A" else if ((x >> 9) % 2 == 0) "A" else "B"
      (k, v, g)
    }
    val by = Profile.wasserstein1By(rows.toDF("k", "v", "g"),
      Seq("k"), "v", "g", "A", "B")
      .collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    assert(by.size == 3)
    for (grp <- Seq("k0", "k1", "k2")) {
      val solo = Profile.wasserstein1(
        rows.filter(_._1 == grp).map(t => (t._2, t._3)).toDF("v", "g"),
        "v", "g", "A", "B").collect()(0)
      assert(by(grp) == solo.toSeq, s"slice $grp disagrees with the global operator")
    }
    assert(by("k2").last == 0L, "an empty side must report w1 = 0")
  }

  test("jsDivergence: identical 0, disjoint ln2, one-sided buckets kept, symmetric, merge") {
    def js(rows: Seq[(Long, String)], buckets: Int = 16) =
      Profile.jsDivergence(rows.toDF("v", "g"), "v", "g", "A", "B", buckets)
        .collect()
    // identical distributions: every term is ln 1 = 0 exactly
    val same = Seq(1L, 5L, 9L).flatMap(v => Seq((v, "A"), (v, "B")))
    assert(js(same).forall(_.getAs[Double]("js6") == 0.0))
    // fully disjoint: every bucket one-sided, each contributing
    // share·ln2/2 — the total is EXACTLY the ln 2 bound at round-6
    val disj = Seq.fill(40)((0L, "A")) ++ Seq.fill(60)((1000L, "B"))
    val d = js(disj)
    assert(d.forall(_.getAs[Double]("js6") == 0.693147),
      s"disjoint sides must hit the ln2 bound: ${d.toSeq}")
    // a one-sided bucket gets a FINITE term (psi excludes it: n_skipped)
    val mixed = Seq.fill(10)((0L, "A")) ++ Seq.fill(10)((0L, "B")) ++
      Seq.fill(5)((1000L, "A"))
    val m = js(mixed)
    assert(m.forall(r => !r.isNullAt(r.fieldIndex("term9"))),
      "JS terms must be finite on one-sided buckets")
    val psiSkipped = Profile.psi(mixed.toDF("v", "g"), "v", "g", "A", "B")
      .collect().head.getAs[Long]("n_skipped")
    assert(psiSkipped == 1L, "the same data must trip psi's exclusion")
    val mJs = m.head.getAs[Double]("js6")
    assert(mJs > 0.0 && mJs < 0.693148, s"JS must stay inside [0, ln2]: $mJs")
    // symmetry: swapping the groups leaves js6 unchanged
    val swapped = Profile.jsDivergence(mixed.toDF("v", "g"), "v", "g",
      "B", "A").collect().head.getAs[Double]("js6")
    assert(swapped == mJs, s"JS must be symmetric: $mJs vs $swapped")
    // the (v, ca, cb) store merges: two batch deltas ≡ the whole
    def delta(rs: Seq[(Long, String)]) = rs.toDF("v", "g")
      .groupBy(col("v"))
      .agg(sum(when(col("g") === "A", 1L).otherwise(0L)).as("ca"),
        sum(when(col("g") === "B", 1L).otherwise(0L)).as("cb"))
    val whole = Profile.jsDivergenceFromCounts(delta(mixed))
      .orderBy("bucket").collect().map(_.toSeq).toSeq
    val merged = Profile.jsDivergenceFromCounts(
      delta(mixed.take(12)).unionByName(delta(mixed.drop(12))))
      .orderBy("bucket").collect().map(_.toSeq).toSeq
    assert(merged == whole, "batch deltas must merge to the whole")
  }

  test("binaryAucCompareBy equals per-group binaryAucCompare; keyed plan has no SinglePartition") {
    val xs = Iterator.iterate(577L)(x => (x * 48271) % 2147483647L)
      .drop(1).take(150).toSeq
    val rows = xs.zipWithIndex.map { case (x, i) =>
      val y = (x >> 2) % 2
      // scorer a correlates with y, scorer b is a noisier transform of a
      (s"g${i % 3}", (x >> 5) % 19 + y * 5, (x >> 7) % 13 + y * 2, y)
    }
    val df = rows.toDF("k", "sa", "sb", "y")
    val by = LmOps.binaryAucCompareBy(df, Seq("k"), "sa", "sb", "y")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getDouble(7), r.getDouble(8))).toMap
    assert(by.size == 3)
    for (g <- Seq("g0", "g1", "g2")) {
      val solo = LmOps.binaryAucCompare(
        rows.filter(_._1 == g).map(t => (t._2, t._3, t._4))
          .toDF("sa", "sb", "y"), "sa", "sb", "y").collect()(0)
      assert(by(g) == ((solo.getLong(0), solo.getLong(1), solo.getLong(2),
        solo.getLong(3), solo.getLong(4), solo.getLong(5),
        solo.getDouble(6), solo.getDouble(7))),
        s"slice $g disagrees with the global paired DeLong on its subset")
    }
    // the whole point of the keyed form: ZERO SinglePartition exchanges
    val plan = LmOps.binaryAucCompareBy(df, Seq("k"), "sa", "sb", "y")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"),
      "keyed paired DeLong plans a SinglePartition exchange")
    // null keys/scores drop by contract
    val withNulls = df.unionByName(
      Seq[(Option[String], Option[Long], Option[Long], Long)](
        (None, Some(1L), Some(1L), 1L),
        (Some("g0"), None, Some(1L), 1L),
        (Some("g0"), Some(1L), None, 0L))
      .toDF("k", "sa", "sb", "y"))
    assert(LmOps.binaryAucCompareBy(withNulls, Seq("k"), "sa", "sb", "y")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap ==
      by.map { case (k, v) => k -> v._1 })
  }

  test("isotonicCalibrateBy: independent per-key PAV, planted violators, cap, keyed plan") {
    // key A: monotone (passes through untouched); key B: planted violator
    // in bins 1-2 (pools); key C: strictly decreasing (collapses). Ten
    // rows per (key, bin) so rates are exact tenths; bins = 4 over
    // prob_micro in [0, 1e6] → bin width 250000.
    def mk(k: String, bin: Int, pos: Int): Seq[(String, Long, Long)] =
      (0 until 10).map(i => (k, bin * 250000L + 100L, if (i < pos) 1L else 0L))
    val rows =
      mk("A", 0, 1) ++ mk("A", 1, 5) ++ mk("A", 2, 9) ++
      mk("B", 0, 2) ++ mk("B", 1, 8) ++ mk("B", 2, 4) ++
      mk("C", 0, 9) ++ mk("C", 1, 6) ++ mk("C", 2, 3)
    val df = rows.toDF("k", "pm", "y")
    val out = LmOps.isotonicCalibrateBy(df, Seq("k"), "pm", "y", bins = 4)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(5))).toMap
    assert(out.size == 9)
    // A monotone: raw rates preserved
    assert(out(("A", 0L))._3 == 100000L && out(("A", 1L))._3 == 500000L &&
      out(("A", 2L))._3 == 900000L)
    // B: bins 1,2 pool at (8+4)/20; bin 0 untouched — and A/C unaffected
    assert(out(("B", 0L))._3 == 200000L && out(("B", 1L))._3 == 600000L &&
      out(("B", 2L))._3 == 600000L)
    // C: full collapse at (9+6+3)/30
    assert(Seq(0L, 1L, 2L).forall(b => out(("C", b))._3 == 600000L))
    // counts preserved per (key, bin)
    assert(out.values.map(_._1).sum == 90L)
    // single-scan contract: the RETURNED frame is literal-built from the
    // collected bin table (LocalTableScan, zero exchanges) — consuming it
    // re-runs no corpus work
    val outPlan = LmOps.isotonicCalibrateBy(df, Seq("k"), "pm", "y", bins = 4)
      .queryExecution.executedPlan.toString
    assert(outPlan.contains("LocalTableScan") && !outPlan.contains("Exchange"),
      s"isotonicCalibrateBy output is not literal-built:\n$outPlan")
    // the explicit cap fails loudly instead of collecting unbounded rows
    val e = intercept[IllegalArgumentException] {
      LmOps.isotonicCalibrateBy(df, Seq("k"), "pm", "y", bins = 4,
        maxCollect = 4)
    }
    assert(e.getMessage.contains("maxCollect"))
  }

  test("calibration bin-count deltas merge exactly: two halves equal the whole") {
    val rows = (0 until 300).map { i =>
      val pm = (i.toLong * 2654435761L) % 1000001L
      (pm, if ((pm / 997L + i % 5) % 11L > 4L) 1L else 0L)
    }
    val (h1, h2) = rows.splitAt(137)
    val merged = LmOps.calibrationReportFromCounts(
      LmOps.calibrationBinCounts(h1.toDF("pm", "y"), "pm", "y", 10)
        .unionByName(
          LmOps.calibrationBinCounts(h2.toDF("pm", "y"), "pm", "y", 10)))
      .orderBy("bin").collect().map(_.toSeq)
    val whole = LmOps.calibrationReport(rows.toDF("pm", "y"), "pm", "y", 10)
      .orderBy("bin").collect().map(_.toSeq)
    assert(merged.toSeq == whole.toSeq,
      "merged per-batch bin counts disagree with the single-pass report")
  }

  test("pavFit violation test survives counts that overflow a Long cross-multiply") {
    // two blocks with n ≈ 4e9: pp·bn ≈ 1.56e19 > Long.MaxValue (9.2e18),
    // so a raw Long comparison would wrap negative and MISS the violation
    val big = 4000000000L
    val fit = LmOps.pavFit(Seq((0L, big, 3900000000L), (1L, big, 100000000L)))
    // pooled rate = (3.9e9 + 1e8) / 8e9 = 0.5 exactly
    assert(fit == Seq(0L -> 500000L, 1L -> 500000L),
      s"overflow inverted the PAV violation test: $fit")
  }

  test("calibration binning clamps the LOW edge too") {
    // a (contract-violating) negative prob must land in bin 0, not a
    // negative bin id; an over-1e6 one in the top bin
    val rows = Seq((-50000L, 0L), (500000L, 1L), (2000000L, 1L))
      .toDF("pm", "y")
    val bins = LmOps.calibrationReport(rows, "pm", "y", bins = 10)
      .collect().map(r => r.getLong(0)).sorted
    assert(bins.toSeq == Seq(0L, 5L, 9L), s"bins: ${bins.mkString(",")}")
  }

  test("binaryAp: hand case, ties pool, separated/constant closed forms, brute force") {
    def ap(rows: Seq[(Long, Long)]): (Long, Long, Long, Long, Long) = {
      val r = LmOps.binaryAp(rows.toDF("score", "y"), "score", "y").collect()(0)
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    }
    // descending: s=3 → P=1/1 (Δr=1/2), s=1 → P=2/3 (Δr=1/2):
    // terms 10⁶ and ⌊2·10⁶/3⌋ = 666666 → ap = ⌊1666666/2⌋ = 833333
    assert(ap(Seq((3L, 1L), (2L, 0L), (1L, 1L))) == ((3L, 2L, 1L, 833333L, 666666L)))
    // a tied block pools: one distinct score, P = 1/2 at full recall
    assert(ap(Seq((2L, 1L), (2L, 0L))) == ((2L, 1L, 1L, 500000L, 500000L)))
    // perfectly separated → AP = 1; constant scorer → AP = prevalence
    assert(ap(Seq((9L, 1L), (8L, 1L), (2L, 0L), (1L, 0L)))._4 == 1000000L)
    val const = ap(Seq((5L, 1L), (5L, 0L), (5L, 0L), (5L, 0L)))
    assert(const._4 == const._5 && const._5 == 250000L)
    // no positives → 0, not NaN
    assert(ap(Seq((1L, 0L), (2L, 0L))) == ((2L, 0L, 2L, 0L, 0L)))
    // brute force with the exact per-threshold floor contract
    val xs = Iterator.iterate(131L)(x => (x * 48271) % 2147483647L)
      .drop(1).take(90).toSeq
    val rnd = xs.map(x => ((x >> 5) % 21 - 10, (x >> 2) % 2))
    val g = rnd.groupBy(_._1).toSeq.sortBy(-_._1).map { case (s, rs) =>
      (s, rs.count(_._2 == 1L).toLong, rs.size.toLong) }
    val tp = g.map(_._2).sum
    var (cp, ca, ts) = (0L, 0L, BigInt(0))
    g.foreach { case (_, p, a) =>
      cp += p; ca += a; ts += BigInt(1000000L) * p * cp / ca }
    assert(ap(rnd)._4 == (ts / tp).toLong)
  }

  test("binaryApBy equals per-group binaryAp; keyed plan has no SinglePartition") {
    val xs = Iterator.iterate(419L)(x => (x * 48271) % 2147483647L)
      .drop(1).take(150).toSeq
    val rows = xs.zipWithIndex.map { case (x, i) =>
      (s"g${i % 3}", (x >> 5) % 23 - 11, (x >> 2) % 2) }
    val df = rows.toDF("k", "score", "y")
    val by = LmOps.binaryApBy(df, Seq("k"), "score", "y")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(by.size == 3)
    for (g <- Seq("g0", "g1", "g2")) {
      val solo = LmOps.binaryAp(
        rows.filter(_._1 == g).map(t => (t._2, t._3)).toDF("score", "y"),
        "score", "y").collect()(0)
      assert(by(g) == ((solo.getLong(0), solo.getLong(1), solo.getLong(2),
        solo.getLong(3), solo.getLong(4))),
        s"slice $g disagrees with the global AP on its subset")
    }
    val plan = LmOps.binaryApBy(df, Seq("k"), "score", "y")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"),
      "keyed AP plans a SinglePartition exchange")
  }

  test("binaryAucSeBy equals per-group binaryAucSe; keyed plan has no SinglePartition") {
    val xs = Iterator.iterate(863L)(x => (x * 48271) % 2147483647L)
      .drop(1).take(150).toSeq
    val rows = xs.zipWithIndex.map { case (x, i) =>
      (s"g${i % 3}", (x >> 5) % 19 - 9, (x >> 2) % 2) }
    val df = rows.toDF("k", "score", "y")
    val by = LmOps.binaryAucSeBy(df, Seq("k"), "score", "y")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6),
        r.getDouble(7))).toMap
    assert(by.size == 3)
    for (g <- Seq("g0", "g1", "g2")) {
      val solo = LmOps.binaryAucSe(
        rows.filter(_._1 == g).map(t => (t._2, t._3)).toDF("score", "y"),
        "score", "y").collect()(0)
      assert(by(g) == ((solo.getLong(0), solo.getLong(1), solo.getLong(2),
        solo.getLong(3), solo.getDouble(4), solo.getDouble(5),
        solo.getDouble(6))),
        s"slice $g disagrees with the global DeLong interval on its subset")
    }
    val plan = LmOps.binaryAucSeBy(df, Seq("k"), "score", "y")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"),
      "keyed AUC-CI plans a SinglePartition exchange")
  }

  test("calibrationReportBy equals per-group calibrationReport, null keys drop") {
    val xs = Iterator.iterate(271L)(x => (x * 48271) % 2147483647L)
      .drop(1).take(240).toSeq
    val rows = xs.zipWithIndex.map { case (x, i) =>
      val pm = x % 1000001L
      (s"g${i % 3}", pm, if ((pm / 991L + i % 3) % 7L > 2L) 1L else 0L) }
    val by = LmOps.calibrationReportBy(rows.toDF("k", "pm", "y"),
      Seq("k"), "pm", "y", bins = 8)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.toSeq.drop(1)).toMap
    for (g <- Seq("g0", "g1", "g2")) {
      val solo = LmOps.calibrationReport(
        rows.filter(_._1 == g).map(t => (t._2, t._3)).toDF("pm", "y"),
        "pm", "y", bins = 8)
        .collect().map(r => (g, r.getLong(0)) -> r.toSeq).toMap
      solo.foreach { case (k, v) =>
        assert(by(k) == v, s"slice $k disagrees with the global report") }
    }
    // a null key row drops without disturbing the real slices
    val withNull = rows.toDF("k", "pm", "y").unionByName(
      Seq((Option.empty[String], 1L, 1L)).toDF("k", "pm", "y"))
    assert(LmOps.calibrationReportBy(withNull, Seq("k"), "pm", "y", bins = 8)
      .collect().length == by.size)
  }

  test("psi: hand two-bucket case, identical distributions, one-sided buckets skipped") {
    // A: 80/20 over two buckets, B: 50/50 → PSI = 0.3·ln(1.6) + 0.3·ln(2.5)
    // (second term: (0.2−0.5)·ln(0.4) = 0.3·ln(2.5)) — round-9 terms sum
    // to 0.415888 at 6 decimals
    val hand = Seq.fill(80)((0L, "A")) ++ Seq.fill(20)((9L, "A")) ++
      Seq.fill(50)((0L, "B")) ++ Seq.fill(50)((9L, "B"))
    val h = Profile.psi(hand.toDF("v", "g"), "v", "g", "A", "B", buckets = 2)
      .orderBy("bucket").collect()
    assert(h.length == 2)
    assert(h(0).getLong(2) == 80L && h(0).getLong(3) == 50L) // n_a, n_b
    assert(h(0).getLong(4) == 800000L && h(0).getLong(5) == 500000L)
    assert(h.forall(_.getDouble(7) == 0.415888)) // psi6 rides every row
    assert(h.forall(_.getLong(8) == 0L))
    // identical distributions → every term 0, psi 0
    val same = Seq.fill(30)((1L, "A")) ++ Seq.fill(10)((5L, "A")) ++
      Seq.fill(30)((1L, "B")) ++ Seq.fill(10)((5L, "B"))
    assert(Profile.psi(same.toDF("v", "g"), "v", "g", "A", "B", buckets = 4)
      .collect().forall(r => r.getDouble(7) == 0.0))
    // a bucket observed on one side only: term NULL, counted in n_skipped,
    // the remaining buckets still sum
    val oneSided = Seq.fill(10)((0L, "A")) ++ Seq.fill(10)((9L, "A")) ++
      Seq.fill(20)((0L, "B"))
    val o = Profile.psi(oneSided.toDF("v", "g"), "v", "g", "A", "B", buckets = 2)
      .orderBy("bucket").collect()
    assert(o.length == 2 && o.forall(_.getLong(8) == 1L))
    assert(o(1).isNullAt(6) && !o(0).isNullAt(6))
  }

  test("psiBy equals per-group psi; keyed plan has no SinglePartition") {
    val xs = Iterator.iterate(733L)(x => (x * 48271) % 2147483647L)
      .drop(1).take(300).toSeq
    val rows = xs.zipWithIndex.map { case (x, i) =>
      (s"k${i % 3}", (x >> 4) % 40, if ((x & 4) == 0) "A" else "B") }
    val df = rows.toDF("k", "v", "g")
    val by = Profile.psiBy(df, Seq("k"), "v", "g", "A", "B", buckets = 4)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.toSeq.drop(1)).toMap
    for (grp <- Seq("k0", "k1", "k2")) {
      val solo = Profile.psi(
        rows.filter(_._1 == grp).map(t => (t._2, t._3)).toDF("v", "g"),
        "v", "g", "A", "B", buckets = 4)
        .collect().map(r => (grp, r.getLong(0)) -> r.toSeq).toMap
      solo.foreach { case (kk, v) =>
        assert(by(kk) == v, s"slice $kk disagrees with the global psi") }
    }
    val plan = Profile.psiBy(df, Seq("k"), "v", "g", "A", "B", buckets = 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"),
      "keyed PSI plans a SinglePartition exchange")
  }

  test("mutualInfo: perfect association, independence, degenerate column") {
    def mi(rows: Seq[(String, String)]) = {
      val r = Profile.mutualInfo(rows.toDF("a", "b"), "a", "b").collect()(0)
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6))
    }
    // 2×2 perfect association at 50/50: every cell term .5·ln2, H = ln2,
    // NMI exactly 1
    val assoc = Seq.fill(10)(("u", "p")) ++ Seq.fill(10)(("v", "q"))
    assert(mi(assoc) == ((20L, 2L, 2L, 0.693147, 0.693147, 0.693147, 1.0)))
    // independent uniform grid → MI 0, NMI 0, entropies ln2
    val indep = for (a <- Seq("u", "v"); b <- Seq("p", "q"); _ <- 1 to 20)
      yield (a, b)
    assert(mi(indep) == ((80L, 2L, 2L, 0.0, 0.693147, 0.693147, 0.0)))
    // one-valued B column → H(B) = 0 → NMI defined as 0
    val degen = Seq(("u", "p"), ("v", "p"), ("u", "p"))
    val d = mi(degen)
    assert(d._6 == 0.0 && d._7 == 0.0 && d._4 == 0.0)
  }

  test("kendallTauB: hand cases and O(n²) brute force under heavy ties") {
    def tau(rows: Seq[(Long, Long)]): (Long, Long, Long, Long, Long, Double) = {
      val r = Profile.kendallTauB(rows.toDF("x", "y"), "x", "y").collect()(0)
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getDouble(5))
    }
    def brute(rows: Seq[(Long, Long)]): (Long, Long) = {
      var c = 0L; var d = 0L
      for (i <- rows.indices; j <- i + 1 until rows.size) {
        val s = java.lang.Long.signum(rows(i)._1 - rows(j)._1) *
          java.lang.Long.signum(rows(i)._2 - rows(j)._2)
        if (s > 0) c += 1 else if (s < 0) d += 1
      }
      (c, d)
    }
    // perfect / inverse monotone, no ties → τ-b = ±1
    assert(tau(Seq((1L, 10L), (2L, 20L), (5L, 21L), (9L, 90L))) ==
      ((4L, 6L, 0L, 0L, 0L, 1.0)))
    assert(tau(Seq((1L, 3L), (2L, 2L), (3L, 1L))) == ((3L, 0L, 3L, 0L, 0L, -1.0)))
    // tie hand case: x=2 twice → n1=1, C=5, D=0, τ-b = 5/√(5·6) = 0.912871
    assert(tau(Seq((1L, 1L), (2L, 2L), (2L, 3L), (3L, 4L))) ==
      ((4L, 5L, 0L, 1L, 0L, 0.912871)))
    // degenerate: n<2, and a constant column (n0 − n1 = 0)
    assert(tau(Seq((7L, 7L)))._6 == 0.0)
    assert(tau(Seq((1L, 1L), (1L, 2L), (1L, 3L)))._6 == 0.0)
    // pseudo-random coarse input (heavy ties by construction) vs brute
    val xs = Iterator.iterate(7L)(x => (x * 48271) % 2147483647L)
      .drop(1).take(120).toSeq
    val rows = xs.map(x => ((x >> 3) % 7, (x >> 9) % 5))
    val (bc, bd) = brute(rows)
    val got = tau(rows)
    assert((got._2, got._3) == ((bc, bd)),
      s"conc/disc disagree with brute force: got ${(got._2, got._3)}, want ${(bc, bd)}")
    // τ from the brute counts through the same formula
    val n = rows.size.toLong
    val n0 = n * (n - 1) / 2
    val n1 = rows.groupBy(_._1).values.map(g => g.size.toLong * (g.size - 1) / 2).sum
    val n2 = rows.groupBy(_._2).values.map(g => g.size.toLong * (g.size - 1) / 2).sum
    assert((got._4, got._5) == ((n1, n2)))
    val want = (bc - bd).toDouble /
      (math.sqrt((n0 - n1).toDouble) * math.sqrt((n0 - n2).toDouble))
    assert(math.abs(got._6 - want) < 1e-6)
  }

  test("kendallTauBBy equals per-group kendallTauB, slices never leak") {
    val xs = Iterator.iterate(13L)(x => (x * 48271) % 2147483647L)
      .drop(1).take(210).toSeq
    val rows = xs.zipWithIndex.map { case (x, i) =>
      (s"k${i % 3}", (x >> 3) % 7, (x >> 9) % 5) }
    val by = Profile.kendallTauBBy(rows.toDF("k", "x", "y"), Seq("k"), "x", "y")
      .collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    assert(by.size == 3)
    for (grp <- Seq("k0", "k1", "k2")) {
      val solo = Profile.kendallTauB(
        rows.filter(_._1 == grp).map(t => (t._2, t._3)).toDF("x", "y"),
        "x", "y").collect()(0)
      assert(by(grp) == solo.toSeq, s"slice $grp disagrees with the global operator")
    }
  }

  test("mutualInfoBy equals per-group mutualInfo, slices never leak") {
    val xs = Iterator.iterate(11L)(x => (x * 48271) % 2147483647L)
      .drop(1).take(180).toSeq
    val rows = xs.zipWithIndex.map { case (x, i) =>
      (s"k${i % 3}", s"a${(x >> 4) % 4}", s"b${(x >> 7) % 3}") }
    val by = Profile.mutualInfoBy(rows.toDF("k", "u", "w"), Seq("k"), "u", "w")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5), r.getDouble(6),
        r.getDouble(7))).toMap
    assert(by.size == 3)
    for (grp <- Seq("k0", "k1", "k2")) {
      val solo = Profile.mutualInfo(
        rows.filter(_._1 == grp).map(t => (t._2, t._3)).toDF("u", "w"),
        "u", "w").collect()(0)
      assert(by(grp) == ((solo.getLong(0), solo.getLong(1), solo.getLong(2),
        solo.getDouble(3), solo.getDouble(4), solo.getDouble(5),
        solo.getDouble(6))), s"slice $grp disagrees with the global operator")
    }
  }

  test("chiSquareBy equals per-group chiSquare, slices never leak") {
    val xs = Iterator.iterate(17L)(x => (x * 48271) % 2147483647L)
      .drop(1).take(240).toSeq
    val rows = xs.zipWithIndex.map { case (x, i) =>
      (s"k${i % 3}", s"a${(x >> 4) % 3}", s"b${(x >> 7) % 4}") }
    val by = Profile.chiSquareBy(rows.toDF("k", "u", "w"), Seq("k"), "u", "w")
      .collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    assert(by.size == 3)
    for (grp <- Seq("k0", "k1", "k2")) {
      val solo = Profile.chiSquare(
        rows.filter(_._1 == grp).map(t => (t._2, t._3)).toDF("u", "w"),
        "u", "w").collect()(0)
      assert(by(grp) == solo.toSeq, s"slice $grp disagrees with the global operator")
    }
  }

  test("spearmanBy equals per-group spearman, slices never leak") {
    val xs = Iterator.iterate(19L)(x => (x * 48271) % 2147483647L)
      .drop(1).take(240).toSeq
    val rows = xs.zipWithIndex.map { case (x, i) =>
      (s"k${i % 3}", (x >> 3) % 101, (x >> 9) % 37) }
    val by = Profile.spearmanBy(rows.toDF("k", "x", "y"), Seq("k"), "x", "y")
      .collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    assert(by.size == 3)
    for (grp <- Seq("k0", "k1", "k2")) {
      val solo = Profile.spearman(
        rows.filter(_._1 == grp).map(t => (t._2, t._3)).toDF("x", "y"),
        "x", "y").collect()(0)
      assert(by(grp) == solo.toSeq, s"slice $grp disagrees with the global operator")
    }
  }

  test("binaryApCi: point estimate matches binaryAp, interval brackets it, deterministic") {
    val xs = Iterator.iterate(23L)(x => (x * 48271) % 2147483647L)
      .drop(1).take(200).toSeq
    val rows = xs.zipWithIndex.map { case (x, i) =>
      (i.toLong, (x >> 5) % 50, if ((x >> 3) % 3 == 0) 1L else 0L) }
    val df = rows.toDF("id", "s", "y")
    val ci = LmOps.binaryApCi(df, "id", "s", "y", resamples = 8).collect()(0)
    val ap = LmOps.binaryAp(df, "s", "y").collect()(0)
    // point columns are the exact binaryAp contract, untouched by the boot
    assert((ci.getLong(0), ci.getLong(1), ci.getLong(2), ci.getLong(3),
      ci.getLong(4)) == ((ap.getLong(0), ap.getLong(1), ap.getLong(2),
      ap.getLong(3), ap.getLong(4))))
    assert(ci.getLong(5) == 8L, "b must equal the resample count")
    val (apm, se, lo, hi) =
      (ci.getLong(3), ci.getDouble(6), ci.getDouble(7), ci.getDouble(8))
    assert(se > 0.0, "mixed-label input must have positive bootstrap se")
    assert(lo <= apm / 1e6 + 1e-9 && apm / 1e6 <= hi + 1e-9)
    // md5-coin determinism: a second run is bit-identical
    val again = LmOps.binaryApCi(df, "id", "s", "y", resamples = 8).collect()(0)
    assert(again.toSeq == ci.toSeq, "bootstrap must be deterministic")
    // degenerate: no positives → ap 0, every resample 0, se 0
    val neg = rows.map(t => (t._1, t._2, 0L)).toDF("id", "s", "y")
    val d = LmOps.binaryApCi(neg, "id", "s", "y", resamples = 8).collect()(0)
    assert(d.getLong(3) == 0L && d.getDouble(6) == 0.0)
  }

  test("binaryApCiBy equals per-group binaryApCi (coins depend only on id and resample)") {
    val xs = Iterator.iterate(31L)(x => (x * 48271) % 2147483647L)
      .drop(1).take(240).toSeq
    val rows = xs.zipWithIndex.map { case (x, i) =>
      (s"k${i % 3}", i.toLong, (x >> 5) % 40, if ((x >> 2) % 4 == 0) 1L else 0L) }
    val by = LmOps.binaryApCiBy(rows.toDF("k", "id", "s", "y"),
      Seq("k"), "id", "s", "y", resamples = 8)
      .collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    assert(by.size == 3)
    for (grp <- Seq("k0", "k1", "k2")) {
      val solo = LmOps.binaryApCi(
        rows.filter(_._1 == grp).map(t => (t._2, t._3, t._4)).toDF("id", "s", "y"),
        "id", "s", "y", resamples = 8).collect()(0)
      assert(by(grp) == solo.toSeq, s"slice $grp disagrees with the global operator")
    }
  }

  test("binaryApCi scoreBuckets: width-1 buckets are exact, coarse buckets equal pre-quantized input") {
    val xs = Iterator.iterate(57L)(x => (x * 48271) % 2147483647L)
      .drop(1).take(200).toSeq
    val rows = xs.zipWithIndex.map { case (x, i) =>
      (i.toLong, (x >> 5) % 40, if ((x >> 3) % 3 == 0) 1L else 0L) }
    val df = rows.toDF("id", "s", "y")
    val exact = LmOps.binaryApCi(df, "id", "s", "y", resamples = 8).collect()(0)
    // scores span < 64, so 64 buckets give width 1: quantization is the
    // identity shift score−min — order-isomorphic, bit-identical outputs
    val w1 = LmOps.binaryApCi(df, "id", "s", "y", resamples = 8,
      scoreBuckets = 64).collect()(0)
    assert(w1.toSeq == exact.toSeq,
      "width-1 bucketing must be bit-identical to the exact bootstrap")
    // coarse buckets: the operator must equal running the EXACT form on
    // scores quantized by hand with the same min/max width rule (weights
    // hash only (id, resample), so the whole row agrees, not just AP)
    val mn = rows.map(_._2).min; val mx = rows.map(_._2).max
    val w = (mx - mn) / 4 + 1
    val pre = rows.map(t => (t._1, (t._2 - mn) / w, t._3)).toDF("id", "s", "y")
    val coarse = LmOps.binaryApCi(df, "id", "s", "y", resamples = 8,
      scoreBuckets = 4).collect()(0)
    val byHand = LmOps.binaryApCi(pre, "id", "s", "y", resamples = 8).collect()(0)
    assert(coarse.toSeq == byHand.toSeq,
      "scoreBuckets must equal the exact bootstrap over pre-quantized scores")
  }

  test("binaryApCiBy scoreBuckets buckets each key's own min/max (equals per-group global)") {
    val xs = Iterator.iterate(91L)(x => (x * 48271) % 2147483647L)
      .drop(1).take(240).toSeq
    // k1's scores sit in a shifted, wider range than k0's — a shared
    // global grid would alias them; per-key min/max must not
    val rows = xs.zipWithIndex.map { case (x, i) =>
      val k = s"k${i % 2}"
      val s = if (i % 2 == 0) (x >> 5) % 40 else 1000 + (x >> 5) % 400
      (k, i.toLong, s, if ((x >> 2) % 4 == 0) 1L else 0L) }
    val by = LmOps.binaryApCiBy(rows.toDF("k", "id", "s", "y"),
      Seq("k"), "id", "s", "y", resamples = 8, scoreBuckets = 4)
      .collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    assert(by.size == 2)
    for (grp <- Seq("k0", "k1")) {
      val solo = LmOps.binaryApCi(
        rows.filter(_._1 == grp).map(t => (t._2, t._3, t._4)).toDF("id", "s", "y"),
        "id", "s", "y", resamples = 8, scoreBuckets = 4).collect()(0)
      assert(by(grp) == solo.toSeq,
        s"slice $grp disagrees with the global bucketed operator")
    }
  }

  test("cmh2x2: Simpson's paradox hand case, formula replication, n<2 exclusion") {
    // Two strata, each EXACTLY independent (within-stratum OR = 1), but
    // pooling marginally manufactures a strong association (OR ≈ 0.117)
    // — the precise failure CMH exists to avoid: cmh6 must be 0.0 and
    // or_mh6 exactly 1.0 while the MARGINAL chi-square fires loudly.
    def rows2x2(k: String, o11: Int, o10: Int, o01: Int, o00: Int) =
      Seq.fill(o11)((k, 1L, 1L)) ++ Seq.fill(o10)((k, 1L, 0L)) ++
        Seq.fill(o01)((k, 0L, 1L)) ++ Seq.fill(o00)((k, 0L, 0L))
    val simpson = rows2x2("s1", 8, 2, 80, 20) ++ rows2x2("s2", 20, 80, 2, 8)
    val df = simpson.toDF("k", "a", "b")
    val r = Profile.cmh2x2(df, Seq("k"), "a", "b").collect()(0)
    assert(r.getLong(0) == 2L && r.getLong(1) == 220L && r.getLong(2) == 0L)
    assert(r.getDouble(3) == 0.0, s"stratified association must vanish: $r")
    assert(r.getDouble(4) == 1.0, s"MH pooled OR must be exactly 1: $r")
    val marg = Profile.chiSquare(
      simpson.map(t => (t._2.toString, t._3.toString)).toDF("a", "b"),
      "a", "b").collect()(0)
    assert(marg.getLong(4) > 20000000L,
      s"the pooled marginal must show the spurious association: $marg")
    // formula replication on a pseudo-random 3-stratum table: the
    // operator's round-9/DECIMAL-sum/round-6 pipeline replayed in Scala
    val xs = Iterator.iterate(29L)(x => (x * 48271) % 2147483647L)
      .drop(1).take(300).toSeq
    val rnd = xs.zipWithIndex.map { case (x, i) =>
      (s"k${i % 3}", (x >> 3) % 2, (x >> 7) % 2) }
    def r9(v: Double): BigDecimal =
      BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val byK = rnd.groupBy(_._1).values.map { g =>
      val o11 = g.count(t => t._2 == 1 && t._3 == 1).toDouble
      val o10 = g.count(t => t._2 == 1 && t._3 == 0).toDouble
      val o01 = g.count(t => t._2 == 0 && t._3 == 1).toDouble
      val o00 = g.count(t => t._2 == 0 && t._3 == 0).toDouble
      val n = g.size.toDouble
      (r9(o11 - (o11 + o10) * (o11 + o01) / n),
        r9((o11 + o10) * (o01 + o00) * (o11 + o01) * (o10 + o00)
          / (n * n * (n - 1))),
        r9(o11 * o00 / n), r9(o10 * o01 / n))
    }
    val (sd, sv, sp, sq) = byK.foldLeft((BigDecimal(0), BigDecimal(0),
      BigDecimal(0), BigDecimal(0))) { case ((a, b, c, d), (w, x, y, z)) =>
      (a + w, b + x, c + y, d + z) }
    def r6(v: Double): Double =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = Profile.cmh2x2(rnd.toDF("k", "a", "b"), Seq("k"), "a", "b")
      .collect()(0)
    assert(got.getDouble(3) == r6(sd.toDouble * sd.toDouble / sv.toDouble),
      s"cmh6 disagrees with the replayed formula: $got")
    assert(got.getDouble(4) == r6(sp.toDouble / sq.toDouble),
      s"or_mh6 disagrees with the replayed formula: $got")
    // a 1-row stratum carries no information: excluded from the sums,
    // counted in n_skipped, statistic unchanged
    val plus = (rnd ++ Seq(("zz", 1L, 1L))).toDF("k", "a", "b")
    val got2 = Profile.cmh2x2(plus, Seq("k"), "a", "b").collect()(0)
    assert(got2.getLong(0) == 4L && got2.getLong(2) == 1L &&
      got2.getDouble(3) == got.getDouble(3) &&
      got2.getDouble(4) == got.getDouble(4))
  }

  test("trendTest: perfect/flat/degenerate closed forms, BigInt formula replication") {
    def ca(rows: Seq[(Long, Long)]): (Long, Long, Long, Long, Double) = {
      val r = Profile.trendTest(rows.toDF("w", "y"), "w", "y").collect()(0)
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
    }
    // perfect 2-band separation: the trend χ²₁ equals N exactly
    val perfect = Seq.fill(50)((0L, 0L)) ++ Seq.fill(50)((1L, 1L))
    assert(ca(perfect) == ((100L, 50L, 2L, 1L, 100.0)))
    // reversed bands: same magnitude, negative trend
    val rev = perfect.map(t => (1L - t._1, t._2))
    assert(ca(rev) == ((100L, 50L, 2L, -1L, 100.0)))
    // exact independence across 5 bands: A = 0, flat trend
    val indep = for (w <- 0L until 5L; y <- Seq(0L, 1L); _ <- 1 to 10)
      yield (w, y)
    assert(ca(indep) == ((100L, 50L, 5L, 0L, 0.0)))
    // degenerate: all-positive outcome, and a single band (B = 0)
    assert(ca(Seq((1L, 1L), (2L, 1L)))._5 == 0.0)
    assert(ca(Seq((3L, 0L), (3L, 1L)))._5 == 0.0)
    // BigInt formula replication on a pseudo-random banded input
    val xs = Iterator.iterate(37L)(x => (x * 48271) % 2147483647L)
      .drop(1).take(400).toSeq
    val rnd = xs.map(x => ((x >> 3) % 8, if ((x >> 6) % (3 + (x >> 3) % 8) == 0L) 1L else 0L))
    val n = BigInt(rnd.size); val r = BigInt(rnd.count(_._2 == 1L))
    val s1 = rnd.filter(_._2 == 1L).map(t => BigInt(t._1)).sum
    val s2 = rnd.map(t => BigInt(t._1)).sum
    val q = rnd.map(t => BigInt(t._1) * t._1).sum
    val a = n * s1 - r * s2
    val b = n * q - s2 * s2
    val want = BigDecimal(n.toDouble * a.toDouble * a.toDouble /
      (r.toDouble * (n - r).toDouble * b.toDouble))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = ca(rnd)
    assert(got._4 == a.signum.toLong && got._5 == want,
      s"trend stat disagrees with the replayed formula: $got vs $want")
  }

  test("trendTestBy equals per-group trendTest (incl. a slice inverting the pooled trend)") {
    val xs = Iterator.iterate(73L)(x => (x * 48271) % 2147483647L)
      .drop(1).take(300).toSeq
    // k0 rises with the band, k1 FALLS (the Simpson's inversion the slice
    // dashboard exists to expose), k2 is pseudo-random
    val rows = xs.zipWithIndex.map { case (x, i) =>
      val k = s"k${i % 3}"
      val w = (x >> 3) % 6
      val y = i % 3 match {
        case 0 => if ((x >> 7) % 6 <= w) 1L else 0L
        case 1 => if ((x >> 7) % 6 >= w) 1L else 0L
        case _ => if ((x >> 5) % 3 == 0) 1L else 0L
      }
      (k, w, y)
    }
    val by = Profile.trendTestBy(rows.toDF("k", "w", "y"), Seq("k"), "w", "y")
      .collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    assert(by.size == 3)
    for (grp <- Seq("k0", "k1", "k2")) {
      val solo = Profile.trendTest(
        rows.filter(_._1 == grp).map(t => (t._2, t._3)).toDF("w", "y"),
        "w", "y").collect()(0)
      assert(by(grp) == solo.toSeq, s"slice $grp disagrees with the global operator")
    }
    assert(by("k0")(3) == 1L && by("k1")(3) == -1L,
      "planted rising/falling slices must carry opposite trend signs")
  }

  test("bhFdr: planted alternatives flagged exactly, step-up pull-in, ties, empty rejection set") {
    def run(ps: Seq[Long]): Map[Long, (Long, Long, Long, Long)] =
      Profile.bhFdr(ps.zipWithIndex.map { case (p, i) => (i.toLong, p) }
          .toDF("slice", "p_micro"), "p_micro")
        .collect().map(r => r.getLong(0) ->       // output: slice, p_micro,
          ((r.getLong(2), r.getLong(3),           // bh_rank, m,
            r.getLong(4), r.getLong(5)))).toMap   // bh_thresh_micro, significant
    // 5 planted alternatives (p = 0.0001) among 95 nulls spread 0.2..0.96:
    // at q = 0.05 exactly the planted five clear (rank 5: 100·100 ≤
    // 50000·5; the best null at rank 6: 200000·100 >> 50000·6)
    val planted = Seq.fill(5)(100L) ++ (0 until 95).map(i => 200000L + i * 8000L)
    val got = run(planted)
    assert(got.values.forall(_._2 == 100L), "m must be the slice count")
    val sig = got.filter(_._2._4 == 1L).keySet
    assert(sig == (0 until 5).map(_.toLong).toSet,
      s"exactly the planted slices must be flagged, got $sig")
    assert(got(0L)._3 == 100L, "threshold must be the planted p")
    assert(got(0L)._1 == 5L, "tied planted p-values share the max rank")
    // step-up pull-in — the signature BH behavior a step-DOWN gets wrong:
    // rank 2 fails its own test (3·40000 > 2·50000) but rank 3 passes
    // (3·45000 ≤ 3·50000), so ALL THREE are rejected
    val pull = run(Seq(1000L, 40000L, 45000L))
    assert(pull.values.forall(v => v._4 == 1L && v._3 == 45000L),
      s"step-up must pull the failing middle rank in: $pull")
    // nothing clears: threshold sentinel −1, zero flags
    val none = run(Seq(900000L, 950000L, 990000L))
    assert(none.values.forall(v => v._4 == 0L && v._3 == -1L))
  }

  test("withTwoSidedNormPMicro: z²=0 → p=1, erfc(1) reference value, degenerate denominator") {
    val df = Seq(
      (1L, 0L, 100L),      // z² = 0 → p = 1
      (2L, 200L, 100L),    // z² = 2 → x = 1 → p = erfc(1) ≈ 0.157299
      (3L, 5000L, 100L),   // z² = 50 → p ≈ 0 (1.5e-12 rounds to 0)
      (4L, 7L, 0L))        // degenerate denominator → p = 1 by contract
      .toDF("slice", "__zn", "__zd")
    val p = Profile.withTwoSidedNormPMicro(df)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(p(1L) == 1000000L && p(4L) == 1000000L && p(3L) == 0L)
    assert(math.abs(p(2L) - 157299L) <= 2,
      s"erfc(1) must be ≈ 0.157299 within the A&S 7.1.26 error bound, got ${p(2L)}")
  }

  test("permTestRate: separation floors p at 1/(B+1), null stays insignificant, deterministic") {
    // perfect separation: A all positive, B all negative → d_obs = 10⁶;
    // no coin reassignment of 200 rows can reproduce |d| = 10⁶ unless a
    // resample reproduces the exact split (P ≈ 2⁻²⁰⁰), so n_ge = 0 and
    // p hits its floor (0+1)/(B+1)
    val sep = (0 until 100).map(i => (i.toLong, "A", 1L)) ++
      (100 until 200).map(i => (i.toLong, "B", 0L))
    val s = Profile.permTestRate(sep.toDF("id", "g", "y"), "id", "g", "y",
      "A", "B", resamples = 16).collect()(0)
    assert(s.getLong(4) == 1000000L && s.getLong(6) == 0L &&
      s.getLong(7) == 1000000L / 17L,
      s"separated groups must floor the permutation p: $s")
    // exact null: y alternates independently of the group → the observed
    // diff is tiny and many resamples beat it (deterministic given the
    // md5 coins; the assertion pins "clearly insignificant")
    val nul = (0 until 400).map(i => (i.toLong, if (i % 2 == 0) "A" else "B",
      (i / 2 % 2).toLong))
    val p = Profile.permTestRate(nul.toDF("id", "g", "y"), "id", "g", "y",
      "A", "B", resamples = 64).collect()(0)
    assert(p.getLong(4) == 0L, s"alternating labels give d_obs = 0: $p")
    assert(p.getLong(7) == 1000000L,
      s"d_obs = 0 is beaten-or-tied by every resample — p must be 1: $p")
    // md5-coin determinism: a second run is bit-identical
    val again = Profile.permTestRate(nul.toDF("id", "g", "y"), "id", "g", "y",
      "A", "B", resamples = 64).collect()(0)
    assert(again.toSeq == p.toSeq, "the randomization test must be deterministic")
    // a mild real difference (0.60 vs 0.56 on 150/150 — inside the null
    // noise band): p lands strictly between the floor and 1
    val mild = (0 until 300).map { i =>
      (i.toLong, if (i % 2 == 0) "A" else "B",
        if (i % 2 == 0) (if (i % 50 < 30) 1L else 0L)
        else (if (i % 50 < 28) 1L else 0L))
    }
    val m = Profile.permTestRate(mild.toDF("id", "g", "y"), "id", "g", "y",
      "A", "B", resamples = 64).collect()(0)
    assert(m.getLong(7) > 1000000L / 65L && m.getLong(7) < 1000000L,
      s"a mild difference must land between the floor and 1: $m")
  }

  test("permTestRateBy equals per-group permTestRate (per-key thresholds, shared coins)") {
    val xs = Iterator.iterate(47L)(x => (x * 48271) % 2147483647L)
      .drop(1).take(360).toSeq
    // k0 balanced groups, k1 lopsided 2:1 (its own coin threshold), k2
    // strongly separated (p must floor)
    val rows = xs.zipWithIndex.map { case (x, i) =>
      val k = s"k${i % 3}"
      val g = i % 3 match {
        case 1 => if (i % 9 < 6) "A" else "B"
        case _ => if (i % 2 == 0) "A" else "B"
      }
      val y = i % 3 match {
        case 2 => if (g == "A") 1L else 0L
        case _ => if ((x >> 6) % 3 == 0) 1L else 0L
      }
      (k, i.toLong, g, y)
    }
    val by = Profile.permTestRateBy(rows.toDF("k", "id", "g", "y"),
      Seq("k"), "id", "g", "y", "A", "B", resamples = 16)
      .collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    assert(by.size == 3)
    for (grp <- Seq("k0", "k1", "k2")) {
      val solo = Profile.permTestRate(
        rows.filter(_._1 == grp).map(t => (t._2, t._3, t._4)).toDF("id", "g", "y"),
        "id", "g", "y", "A", "B", resamples = 16).collect()(0)
      assert(by(grp) == solo.toSeq, s"slice $grp disagrees with the global operator")
    }
    assert(by("k2").last == 1000000L / 17L,
      "the separated slice must floor its permutation p")
  }

  test("w1Attribution: single-bucket shift attributes 100%, scalar matches wasserstein1") {
    // both sides hold values 0..999 except B moves the mass at value 100
    // to 110 — the whole CDF difference lives on [100, 110), inside
    // attribution bucket 100 DIV 63 = 1 of 16 (width = 999 DIV 16 + 1)
    val rows = (0 until 1000).map(v => (s"a$v", "A", v.toLong)) ++
      (0 until 1000).map(v => (s"b$v", "B", if (v == 100) 110L else v.toLong))
    val df = rows.toDF("id", "g", "v")
    val out = Profile.w1Attribution(df, "v", "g", "A", "B", buckets = 16)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(out.size == 16, s"all 16 observed buckets must emit: ${out.size}")
    assert(out(1L)._4 == 1000000L,
      s"the shifted bucket must carry 100% of the area: ${out(1L)}")
    assert(out.filter(_._1 != 1L).values.forall(_._4 == 0L),
      "untouched buckets must attribute zero")
    // the riding scalar equals the wasserstein1 operator's w1_micro:
    // area = 10 values × |Δcum|·tb = 10 × 1000 ⇒ 10⁶·10⁴/(10³·10³) = 10⁴
    val w1 = Profile.wasserstein1(df, "v", "g", "A", "B")
      .collect()(0).getLong(3)
    assert(w1 == 10000L && out.values.forall(_._5 == w1),
      s"attribution's riding w1_micro must equal wasserstein1's: $w1 vs ${out(1L)}")
    // empty side → zero rows (the W1/KS convention)
    val oneSided = Profile.w1Attribution(
      rows.filter(_._2 == "A").toDF("id", "g", "v"), "v", "g", "A", "B")
    assert(oneSided.count() == 0L, "an empty side must emit zero rows")
  }

  test("permTestMean: separation floors p, null means p=1, negatives deterministic") {
    // perfect separation: A all value 1000, B all value 0 → d_obs =
    // 10⁹ micro; no coin reassignment of 200 rows reproduces |d| = 10⁹
    // (it would need a pure resample split, P ≈ 2⁻²⁰⁰), so p floors
    val sep = (0 until 100).map(i => (i.toLong, "A", 1000L)) ++
      (100 until 200).map(i => (i.toLong, "B", 0L))
    val s = Profile.permTestMean(sep.toDF("id", "g", "x"), "id", "g", "x",
      "A", "B", resamples = 16).collect()(0)
    assert(s.getLong(2) == 100000L && s.getLong(3) == 0L,
      s"exact sums must ride the output: $s")
    assert(s.getLong(4) == 1000000000L && s.getLong(6) == 0L &&
      s.getLong(7) == 1000000L / 17L,
      s"separated means must floor the permutation p: $s")
    // exact null: the value depends only on i/2, the group alternates
    // within each value pair → d_obs = 0 and every resample ties it
    val nul = (0 until 400).map(i =>
      (i.toLong, if (i % 2 == 0) "A" else "B", (i / 2 % 7).toLong))
    val p = Profile.permTestMean(nul.toDF("id", "g", "x"), "id", "g", "x",
      "A", "B", resamples = 64).collect()(0)
    assert(p.getLong(4) == 0L && p.getLong(7) == 1000000L,
      s"paired values give d_obs = 0 and p = 1: $p")
    // NEGATIVE values: the trunc-DIV micro-mean contract must be
    // deterministic (Spark DIV and DuckDB // share C semantics); the
    // shifted-by-constant run must agree with the original on n_ge
    // (|d| comparisons are shift-invariant up to the shared remainder,
    // and with values ≡ 0 mod nothing here we pin plain determinism)
    val neg = (0 until 300).map(i =>
      (i.toLong, if (i % 2 == 0) "A" else "B", (i % 13).toLong - 6L))
    val n1 = Profile.permTestMean(neg.toDF("id", "g", "x"), "id", "g", "x",
      "A", "B", resamples = 32).collect()(0)
    val n2 = Profile.permTestMean(neg.toDF("id", "g", "x"), "id", "g", "x",
      "A", "B", resamples = 32).collect()(0)
    assert(n1.toSeq == n2.toSeq, "negative-valued runs must be deterministic")
    assert(n1.getLong(2) + n1.getLong(3) == neg.map(_._3).sum,
      s"signed sums must be exact: $n1")
    // null values drop (complete-case): adding value-null rows changes nothing
    val withNulls = neg.map(t => (t._1, t._2, Option(t._3))) ++
      Seq((900L, "A", Option.empty[Long]), (901L, "B", Option.empty[Long]))
    val n3 = Profile.permTestMean(withNulls.toDF("id", "g", "x"), "id", "g",
      "x", "A", "B", resamples = 32).collect()(0)
    assert(n3.toSeq == n1.toSeq, "value-null rows must be dropped complete-case")
  }

  test("permTestMeanBy equals per-group permTestMean (per-key thresholds, shared coins)") {
    val xs = Iterator.iterate(47L)(x => (x * 48271) % 2147483647L)
      .drop(1).take(360).toSeq
    // k0 balanced, k1 lopsided 2:1 (its own coin threshold), k2 strongly
    // separated in the value (p must floor)
    val rows = xs.zipWithIndex.map { case (x, i) =>
      val k = s"k${i % 3}"
      val g = i % 3 match {
        case 1 => if (i % 9 < 6) "A" else "B"
        case _ => if (i % 2 == 0) "A" else "B"
      }
      val v = i % 3 match {
        case 2 => if (g == "A") 5000L else 0L
        case _ => (x >> 6) % 97
      }
      (k, i.toLong, g, v)
    }
    val by = Profile.permTestMeanBy(rows.toDF("k", "id", "g", "x"),
      Seq("k"), "id", "g", "x", "A", "B", resamples = 16)
      .collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    assert(by.size == 3)
    for (grp <- Seq("k0", "k1", "k2")) {
      val solo = Profile.permTestMean(
        rows.filter(_._1 == grp).map(t => (t._2, t._3, t._4)).toDF("id", "g", "x"),
        "id", "g", "x", "A", "B", resamples = 16).collect()(0)
      assert(by(grp) == solo.toSeq, s"slice $grp disagrees with the global operator")
    }
    assert(by("k2").last == 1000000L / 17L,
      "the separated slice must floor its permutation p")
  }

  test("mcnemar: hand case, perfect agreement, swap antisymmetry") {
    def mc(rows: Seq[(Long, Long)]): Seq[Any] =
      Profile.mcnemar(rows.toDF("a", "b"), "a", "b").collect()(0).toSeq
    val hand = Seq.fill(3)((1L, 1L)) ++ Seq.fill(5)((1L, 0L)) ++
      Seq.fill(2)((0L, 1L)) ++ Seq.fill(4)((0L, 0L))
    // (5−2)²·10⁶ / 7 = 1 285 714 (floored)
    assert(mc(hand) == Seq(14L, 3L, 5L, 2L, 4L, 1L, 1285714L))
    // perfect agreement: zero discordant pairs, statistic 0, flat trend
    val agree = Seq((1L, 1L), (0L, 0L), (1L, 1L))
    assert(mc(agree) == Seq(3L, 2L, 0L, 0L, 1L, 0L, 0L))
    // swapping the policies flips the trend, keeps the statistic
    val swapped = hand.map(_.swap)
    val (h, s) = (mc(hand), mc(swapped))
    assert(s(6) == h(6) && s(5) == -1L && s(2) == h(3) && s(3) == h(2))
  }

  test("memoFit key is data-aware: rewriting the input under the same tag refits") {
    // pins the q194 contract (r15 verdict): the memo key derives from the
    // canonicalized plan + backing files, so an input rewrite under an
    // UNCHANGED config tag must recompute, not serve stale fit state
    import java.nio.file.Files
    val dir = Files.createTempDirectory("memofit").toString
    var calls = 0
    Seq((1L, 10.0)).toDF("id", "v").write.mode("overwrite").parquet(dir)
    def fit(): String = graft.operators.Similarity.memoFit(
      spark.read.parquet(dir), "algo|k=2|v") { calls += 1; s"fit$calls" }
    assert(fit() == "fit1" && calls == 1)
    assert(fit() == "fit1" && calls == 1, "same data + tag must memo-hit")
    // Spark overwrite writes fresh part-file names → new key → refit
    Seq((2L, 20.0), (3L, 30.0)).toDF("id", "v").write.mode("overwrite").parquet(dir)
    assert(fit() == "fit2" && calls == 2,
      "input rewrite under the same tag served a stale fit")
  }
}
