package graft

import org.apache.spark.sql.functions._
import graft.operators.LmOps

class LmSpec extends SparkSpec {

  // ------------------------------------------------------------- HTML

  test("htmlExtract drops script/nav/footer boilerplate, keeps body text, unescapes entities") {
    import spark.implicits._
    val html =
      "<html><head><title>t</title><script>var x = 1 < 2;</script></head><body>" +
        "<nav><a href=\"/\">home</a> <a href=\"/b\">about</a></nav>" +
        "<h1>Q&amp;A notes &#39;one&#39; two three</h1>" +
        "<p>alpha beta gamma delta epsilon zeta</p>" +
        "<div>short one</div>" +
        "<footer><a href=\"/t\">terms</a> copyright</footer></body></html>"
    val out = LmOps.htmlExtract(Seq((1L, html)).toDF("doc_id", "html")).collect()(0)
    assert(out.getAs[String]("text") ==
      "Q&A notes 'one' two three\nalpha beta gamma delta epsilon zeta")
    // title, nav, h1, p, div, footer all non-empty; h1 + p kept
    assert(out.getAs[Long]("n_blocks") == 6L)
    assert(out.getAs[Long]("n_kept") == 2L)
  }

  test("htmlExtract link-density rule drops a long link farm but keeps long prose with one link") {
    import spark.implicits._
    val farm = "<p>" + (1 to 10).map(i => s"<a href=i>link$i word$i</a>").mkString(" ") + "</p>"
    val prose = "<p>one two three four five six seven <a href=x>eight</a></p>"
    val out = LmOps.htmlExtract(Seq((1L, farm + prose)).toDF("doc_id", "html"))
      .collect()(0)
    // farm: 20 words, 10 links -> 10*4 > 20 dropped; prose: 8 words, 1 link kept
    assert(out.getAs[String]("text") == "one two three four five six seven eight")
    assert(out.getAs[Long]("n_blocks") == 2L && out.getAs[Long]("n_kept") == 1L)
  }

  // -------------------------------------------------------- bigram LM

  test("bigram LM scores predictable sequences as more fluent than one-off bigrams") {
    import spark.implicits._
    // 20 copies of the same 10-token loop: its bigrams dominate the counts.
    // One doc of 10 tokens never repeated elsewhere: every bigram count 1.
    val loopDoc = Array.fill(10)("a b c d e f g h i j").mkString(" ")
    val rare = (1 to 10).map(i => s"z$i").mkString(" ")
    val docs = ((1L to 20L).map(i => (i, loopDoc)) :+ (99L, rare)).toDF("doc_id", "text")
    val out = LmOps.lmPerplexity(docs, buckets = 1024, nllThreshold = 4.0)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    val fluentNll = out(1L).getAs[Double]("nll")
    val rareNll = out(99L).getAs[Double]("nll")
    assert(fluentNll < rareNll,
      s"repeated-structure doc must score lower nll ($fluentNll vs $rareNll)")
    assert(out(1L).getAs[Boolean]("is_fluent") && !out(99L).getAs[Boolean]("is_fluent"))
    assert(out(1L).getAs[Long]("n_bigrams") == 99L) // 100 tokens
    assert(out(99L).getAs[Long]("n_bigrams") == 9L)
  }

  test("lmScoreAgainst handles unseen bigrams via smoothing (streaming-batch contract)") {
    import spark.implicits._
    val train = Seq((1L, "a b a b a b a b")).toDF("doc_id", "text")
    val (c2, c1) = LmOps.lmCounts(train, buckets = 4096)
    val out = LmOps.lmScoreAgainst(
      Seq((7L, "q r s t")).toDF("doc_id", "text"), c2, c1, buckets = 4096)
      .collect()(0)
    // all-unseen contexts: p = alpha/(0 + alpha*B) = 1/B per bigram -> nll = ln(B)
    assert(math.abs(out.getAs[Double]("nll") - math.log(4096.0)) < 1e-4)
  }

  // ------------------------------------------------------ Naive Bayes

  test("NB classifier separates disjoint-vocabulary classes and ties break by class name") {
    import spark.implicits._
    val aDocs = (1L to 10L).map(i => (i, "apple ant acorn apple ant", "A"))
    val bDocs = (11L to 20L).map(i => (i, "bear bolt bream bear bolt", "B"))
    val docs = (aDocs ++ bDocs).toDF("doc_id", "text", "lab")
    val out = LmOps.nbClassify(docs, labelCol = "lab").collect()
    assert(out.length == 20 && out.forall(_.getAs[Boolean]("correct")))
  }

  test("nbScoreAgainst scores a new batch with the trained model") {
    import spark.implicits._
    val train = ((1L to 10L).map(i => (i, "apple ant acorn", "A")) ++
      (11L to 20L).map(i => (i, "bear bolt bream", "B"))).toDF("doc_id", "text", "lab")
    val (w, p) = LmOps.nbTrain(train, "lab")
    val preds = LmOps.nbScoreAgainst(
      Seq((100L, "apple acorn apple"), (101L, "bolt bear bolt")).toDF("doc_id", "text"), w, p)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("pred")).toMap
    assert(preds(100L) == "A" && preds(101L) == "B")
  }

  // ------------------------------------------------------------- BM25

  test("BM25 ranks higher-tf docs first and rewards rare terms over common ones") {
    import spark.implicits._
    val docs = Seq(
      (1L, "cat cat cat dog bird fish mouse wolf"),
      (2L, "cat dog bird fish mouse wolf deer elk"),
      (3L, "dog bird fish mouse wolf deer elk fox"),
      (4L, "rare dog bird fish mouse wolf deer elk")).toDF("doc_id", "text")
    val queries = Seq(("q1", "cat"), ("q2", "rare"), ("q3", "dog")).toDF("qid", "term")
    val out = LmOps.bm25TopK(docs, queries, k = 3).collect()
    val q1 = out.filter(_.getAs[String]("qid") == "q1").sortBy(_.getAs[Int]("rank"))
    assert(q1.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 2L), "tf ordering")
    val q2 = out.filter(_.getAs[String]("qid") == "q2")
    assert(q2.map(_.getAs[Long]("doc_id")).toSeq == Seq(4L), "only the matching doc")
    // 'rare' (df=1) must out-score 'dog' (df=4) at equal tf and dl
    val rareScore = q2(0).getAs[Double]("score")
    val dogTop = out.filter(r => r.getAs[String]("qid") == "q3" && r.getAs[Int]("rank") == 1)(0)
    assert(rareScore > dogTop.getAs[Double]("score"), "idf must reward rarity")
  }

  test("bm25/lm/nb plans stay broadcast-only (no SortMergeJoin)") {
    val sf = sfDir
    for (q <- Seq("q86_lm_perplexity", "q88_bm25", "q111_kn_perplexity")) {
      val plan = SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString
      assert(!plan.contains("SortMergeJoin"), s"$q plans a SortMergeJoin:\n$plan")
    }
  }

  test("Kneser-Ney: seen-context distribution sums to 1; continuation beats raw frequency") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 'of course' 20× makes 'course' FREQUENT but PREDICTABLE (one left
    // context); 'cat' appears 4× total but after 4 DIFFERENT words
    val corpus = ((0 until 20).map(i => (i.toLong, "of course")) ++
      Seq((20L, "a cat"), (21L, "b cat"), (22L, "c cat"), (23L, "d cat")))
      .toDF("doc_id", "text")
    val (c2, c1n, rt, tv) = LmOps.knCounts(corpus, buckets = 1024)
    val Seq((tT, vT)) = tv.as[(Long, Long)].collect().toSeq
    assert(tT == 5 && vT == 2, "5 bigram types over 2 right words")
    // continuation counts: 'cat' follows 4 distinct contexts, 'course' 1 —
    // KN's point: backoff mass goes to versatile words, not frequent ones
    val n1pr = rt.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(n1pr.values.toSeq.sorted == Seq(1L, 4L))
    // full probability over the bucket space for context 'of' sums to 1
    val ofB = (math.BigInt(java.security.MessageDigest.getInstance("MD5")
      .digest("of".getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
      .take(15), 16) % 1024).toLong
    val all = (0 until 1024).map(_.toLong).toDF("b2")
    val d = 0.75
    val probs = all
      .join(c2.filter(col("b1") === ofB), Seq("b2"), "left")
      .join(rt, Seq("b2"), "left")
      .crossJoin(broadcast(tv))
      .crossJoin(broadcast(c1n.filter(col("b1") === ofB).select(col("c1"), col("n1pl"))))
      .select(((greatest(coalesce(col("c"), lit(0L)) - d, lit(0.0)) +
        lit(d) * col("n1pl") * ((greatest(coalesce(col("n1pr"), lit(0L)) - d, lit(0.0)) /
          col("t_types")) + (lit(d) * col("v_types") / col("t_types")) * (lit(1.0) / 1024))) /
        col("c1")).as("p"))
      .agg(sum(col("p"))).as[Double].head()
    assert(math.abs(probs - 1.0) < 1e-9, s"P(·|of) must sum to 1, got $probs")
    // scoring yields finite positive perplexity on a NEW doc with unseen context
    val newDoc = Seq((99L, "zzz cat")).toDF("doc_id", "text")
    val scored = LmOps.knScoreAgainst(newDoc, c2, c1n, rt, tv).collect()
    assert(scored.length == 1 && scored(0).getAs[Double]("ppl") > 0 &&
      !scored(0).getAs[Double]("ppl").isInfinite)
  }

  test("rankingMetrics: planted lists give exact micro-unit recall/precision/MRR") {
    import spark.implicits._
    val truth = Seq(
      (1L, 1L, 1), (1L, 2L, 2), (1L, 3L, 3),
      (2L, 10L, 1), (2L, 11L, 2),
      (3L, 20L, 1)).toDF("query_id", "doc_id", "rank")
    val system = Seq(
      (1L, 3L, 1), (1L, 9L, 2), (1L, 1L, 3),
      (2L, 12L, 1), (2L, 13L, 2), (2L, 11L, 3),
      (3L, 21L, 1), (3L, 22L, 2), (3L, 23L, 3)).toDF("query_id", "doc_id", "rank")
    val got = LmOps.rankingMetrics(truth, system, k = 3).collect()
      .map(r => r.getAs[Long]("query_id") ->
        (r.getAs[Int]("n_rel"), r.getAs[Int]("n_hits"), r.getAs[Long]("recall_micro"),
          r.getAs[Long]("precision_micro"), r.getAs[Long]("mrr_micro"))).toMap
    assert(got(1L) == ((3, 2, 666666L, 666666L, 1000000L)))
    assert(got(2L) == ((2, 1, 500000L, 333333L, 333333L)))
    // no hits: metrics zero, query still present (left join from truth)
    assert(got(3L) == ((1, 0, 0L, 0L, 0L)))
  }

  test("rbo: identical lists 1.0, disjoint 0.0, one-sided query, replayed-formula check") {
    import spark.implicits._
    def lists(rows: Seq[(Long, Long, Int)]) = rows.toDF("query_id", "doc_id", "rank")
    val a = lists((1 to 5).map(r => (1L, r.toLong, r)))
    // identical lists: RBO_EXT = (1−p)Σp^{d−1} + p^k = 1 exactly at round-6
    val same = LmOps.rbo(a, a, k = 5).collect().head
    assert(same.getAs[Long]("n_common") == 5L &&
      same.getAs[Long]("agreement_k_micro") == 1000000L &&
      same.getAs[Double]("rbo6") == 1.0, s"identical lists must score 1.0: $same")
    // disjoint lists: 0 everywhere
    val b = lists((1 to 5).map(r => (1L, 100L + r, r)))
    val disj = LmOps.rbo(a, b, k = 5).collect().head
    assert(disj.getAs[Long]("n_common") == 0L && disj.getAs[Double]("rbo6") == 0.0)
    // a query present on ONE side only still reports a zero row
    val c = lists((1 to 5).map(r => (7L, r.toLong, r)))
    val oneSided = LmOps.rbo(a, c, k = 5).collect()
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Double]("rbo6")).toMap
    assert(oneSided.keySet == Set(1L, 7L) && oneSided.values.forall(_ == 0.0))
    // replayed formula on a cyclic shift: ranks (1..k) vs (2..k,1) give
    // A_d = d−1 for d < k and A_k = k
    val k = 5; val p = 0.9
    val shifted = lists((1 to k).map(r => (1L, r.toLong, r % k + 1)))
    val got = LmOps.rbo(a, shifted, k = k, p = p).collect().head
    def r9(x: Double) = BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val want = BigDecimal((1 to k).map { d =>
      val ad = if (d == k) k else d - 1
      r9((1.0 - p) * math.pow(p, d - 1) * ad.toDouble / d) +
        (if (d == k) r9(math.pow(p, k) * ad.toDouble / d) else BigDecimal(0))
    }.sum.toDouble).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.getAs[Double]("rbo6") == want,
      s"rbo disagrees with the replayed formula: $got vs $want")
    assert(got.getAs[Long]("n_common") == k.toLong)
  }

  test("rboBy: exact integer slice means; unmapped queries drop") {
    import spark.implicits._
    def lists(rows: Seq[(Long, Long, Int)]) = rows.toDF("query_id", "doc_id", "rank")
    // q1/q2 → slice s0 (identical + disjoint: mean = (10⁶+0) DIV 2),
    // q3 → s1 (identical: mean = 10⁶); q9 has rankings but NO slice row
    val a = lists(for (q <- Seq(1L, 2L, 3L, 9L); r <- 1 to 3)
      yield (q, q * 10 + r, r))
    val b = lists(for (q <- Seq(1L, 2L, 3L, 9L); r <- 1 to 3)
      yield (q, if (q == 2L) 900 + r else q * 10 + r, r))
    val slices = Seq((1L, "s0"), (2L, "s0"), (3L, "s1")).toDF("query_id", "slice")
    val got = LmOps.rboBy(a, b, slices, k = 3)
      .collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    assert(got.keySet == Set("s0", "s1"), s"unmapped q9 must drop: $got")
    assert(got("s0") == Seq(2L, 500000L, 0L, 1000000L, 500000L),
      s"s0 must average the identical and disjoint queries exactly: ${got("s0")}")
    assert(got("s1") == Seq(1L, 1000000L, 1000000L, 1000000L, 1000000L),
      s"s1 is a single identical query: ${got("s1")}")
  }

  test("rboQuantiles: rank-at-floor(q(n-1)) over the per-query rbo_micro") {
    import spark.implicits._
    def lists(rows: Seq[(Long, Long, Int)]) = rows.toDF("query_id", "doc_id", "rank")
    // 10 queries: 0..4 identical (rbo_micro 10⁶), 5..9 disjoint (0) —
    // deciles pick rank floor(q·9): q=0.1→0 (value 0), q=0.5→4 (0),
    // q=0.6→5 (10⁶), q=0.9→8 (10⁶)
    val a = lists(for (q <- 0L until 10L; r <- 1 to 3) yield (q, q * 10 + r, r))
    val b = lists(for (q <- 0L until 10L; r <- 1 to 3)
      yield (q, if (q >= 5L) 900 + q * 10 + r else q * 10 + r, r))
    val got = LmOps.rboQuantiles(a, b, k = 3,
      qs = Seq(0.1, 0.5, 0.6, 0.9))
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(got == Map(0.1 -> 0L, 0.5 -> 0L, 0.6 -> 1000000L, 0.9 -> 1000000L),
      s"decile ranks must split the bimodal distribution: $got")
  }

  test("rankingMetrics ignores ranks beyond k on both sides") {
    import spark.implicits._
    val truth = Seq((1L, 1L, 1), (1L, 2L, 9)).toDF("query_id", "doc_id", "rank")
    val system = Seq((1L, 2L, 1), (1L, 1L, 9)).toDF("query_id", "doc_id", "rank")
    val r = LmOps.rankingMetrics(truth, system, k = 2).collect().head
    // only truth(1@1) and system(2@1) are inside k=2: no overlap
    assert(r.getAs[Int]("n_rel") == 1 && r.getAs[Int]("n_hits") == 0 &&
      r.getAs[Long]("mrr_micro") == 0L)
  }
}
