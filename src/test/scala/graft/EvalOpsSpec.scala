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
}
