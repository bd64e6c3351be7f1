package graft

import org.apache.spark.sql.functions._
import graft.operators.Kll
import graft.operators.Kll.KllBuf

/** KLL sketch: exactness in the no-compaction regime, measured rank-error
  * bounds in the approximate regime, mergeability (shard-merge within the
  * same bound), the SQL aggregate plumbing, and the declarative extractor
  * agreeing with the driver-side estimator. */
class KllSpec extends SparkSpec {
  import spark.implicits._

  private val Qs = Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)

  // deterministic permutation of 0 until n (multiplicative hash order)
  private def permuted(n: Int): Seq[Long] =
    (0 until n).map(_.toLong).sortBy(v => (v * 2654435761L) % 1000000007L)

  test("exact regime: capacity >= n reproduces brute-force rank quantiles") {
    val data = permuted(500)
    val b = new KllBuf(1024)
    data.foreach(b.update)
    val sorted = data.sorted.toArray
    val got = Kll.quantiles(b, Qs)
    val want = Qs.map(q => sorted(math.floor(q * (sorted.length - 1)).toInt))
    assert(got == want, s"got=$got want=$want")
  }

  test("approximate regime: k=128 rank error within 3% of n at n=100k") {
    val n = 100000
    val data = permuted(n)
    val b = new KllBuf(128)
    data.foreach(b.update)
    assert(b.comps > 0, "expected compactions at n >> k")
    // data is a permutation of 0..n-1, so value v has true rank v
    val got = Kll.quantiles(b, Qs)
    Qs.zip(got).foreach { case (q, v) =>
      val trueRank = math.floor(q * (n - 1)).toLong
      assert(math.abs(v - trueRank) <= 0.03 * n,
        s"q=$q value=$v trueRank=$trueRank err=${math.abs(v - trueRank)}")
    }
  }

  test("merge of 8 shards stays within the same rank-error bound") {
    val n = 100000
    val data = permuted(n)
    val shards = data.grouped(n / 8).toSeq.map { chunk =>
      val s = new KllBuf(128); chunk.foreach(s.update); s
    }
    val merged = new KllBuf(128)
    shards.foreach(merged.mergeIn)
    val got = Kll.quantiles(merged, Qs)
    Qs.zip(got).foreach { case (q, v) =>
      val trueRank = math.floor(q * (n - 1)).toLong
      assert(math.abs(v - trueRank) <= 0.03 * n,
        s"q=$q value=$v trueRank=$trueRank")
    }
  }

  test("serialize/deserialize roundtrip is identity") {
    val b = new KllBuf(64)
    permuted(5000).foreach(b.update)
    val r = Kll.deserialize(Kll.serialize(b))
    assert(r.k == b.k && r.comps == b.comps &&
      r.levels.map(_.toSeq) == b.levels.map(_.toSeq))
  }

  test("kll_sketch SQL aggregate + declarative extractor == exact ranks (exact regime)") {
    val df = permuted(2000).zipWithIndex
      .map { case (v, i) => (if (i % 2 == 0) "a" else "b", v) }
      .toDF("g", "v")
    val sk = df.groupBy("g").agg(expr("kll_sketch(v, 4096)").as("sk"))
    val got = Kll.quantilesFromSketch(sk, Seq("g"), "sk", Seq(0.5, 0.9))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getLong(2)).toMap
    for (g <- Seq("a", "b"); q <- Seq(0.5, 0.9)) {
      val vals = df.where(col("g") === g).select("v").as[Long].collect().sorted
      val want = vals(math.floor(q * (vals.length - 1)).toInt)
      assert(got((g, q)) == want, s"g=$g q=$q got=${got((g, q))} want=$want")
    }
  }

  test("kll_merge rollup == single-pass sketch (exact regime) and approx within bound") {
    // exact regime: shard by day, merge per group — extraction must equal
    // the brute rank because no compaction ever fires
    val df = permuted(3000).zipWithIndex
      .map { case (v, i) => ("g", i % 7, v) }.toDF("g", "day", "v")
    val daily = df.groupBy("g", "day").agg(expr("kll_sketch(v, 8192)").as("sk"))
    val rolled = daily.groupBy("g").agg(expr("kll_merge(sk)").as("sk"))
    val got = Kll.quantilesFromSketch(rolled, Seq("g"), "sk", Seq(0.25, 0.75))
      .collect().map(r => r.getDouble(1) -> r.getLong(2)).toMap
    val vals = (0 until 3000).map(_.toLong).toArray
    assert(got(0.25) == vals(math.floor(0.25 * 2999).toInt))
    assert(got(0.75) == vals(math.floor(0.75 * 2999).toInt))

    // approximate regime through SQL: one group, small k, distributed input
    val n = 50000
    val big = permuted(n).toDF("v").repartition(8)
      .groupBy().agg(expr("kll_sketch(v, 128)").as("sk"))
    val approx = Kll.quantilesFromSketch(big.withColumn("g", lit(1)),
        Seq("g"), "sk", Seq(0.5)).collect()
    assert(approx.length == 1)
    val v = approx(0).getLong(2)
    assert(math.abs(v - n / 2) <= 0.03 * n, s"p50=$v")
  }

  test("compaction preserves total weight exactly, unweighted and weighted") {
    def mass(b: KllBuf): Long =
      (for (h <- b.levels.indices; _ <- b.levels(h)) yield 1L << h).sum
    for (k <- Seq(8, 64, 256)) {
      val b = new KllBuf(k)
      permuted(50000).foreach(b.update)
      assert(b.comps > 0)
      assert(mass(b) == 50000L, s"k=$k drifted to ${mass(b)}")
      val wb = new KllBuf(k)
      (0 until 3000).foreach(v => wb.updateWeighted(v.toLong, (v % 13 + 1).toLong))
      val want = (0 until 3000).map(v => (v % 13 + 1).toLong).sum
      assert(mass(wb) == want, s"k=$k weighted drifted to ${mass(wb)} want $want")
    }
  }

  test("property: quantile values are non-decreasing in q, at any k") {
    for (k <- Seq(8, 32, 256)) {
      val b = new KllBuf(k)
      permuted(20000).foreach(b.update)
      val qs = (0 to 20).map(_ / 20.0)
      val vs = Kll.quantiles(b, qs)
      assert(vs == vs.sorted, s"k=$k quantiles not monotone: $vs")
      assert(vs.head >= 0 && vs.last <= 19999, "estimates must be real items")
    }
  }

  test("all-null group through SQL: kll_merge yields an empty sketch, extractor yields no rows") {
    val df = spark.range(4).selectExpr("CAST(null AS BIGINT) AS v", "'g' AS g")
    val sk = df.groupBy("g").agg(expr("kll_sketch(v, 64)").as("sk"))
      .groupBy("g").agg(expr("kll_merge(sk)").as("sk"))
    assert(Kll.quantilesFromSketch(sk, Seq("g"), "sk", Seq(0.5)).count() == 0)
  }

  test("weighted update == repeat-expanded update, exact and approximate") {
    // exact regime: weighted build of a frequency table must equal brute
    // ranks of the expanded multiset
    val freqs = Seq((5L, 7L), (9L, 1L), (2L, 12L), (14L, 3L), (1L, 130L))
    val expanded = freqs.flatMap { case (v, w) => Seq.fill(w.toInt)(v) }
    val b = new KllBuf(1024)
    freqs.foreach { case (v, w) => b.updateWeighted(v, w) }
    val sorted = expanded.sorted.toArray
    val got = Kll.quantiles(b, Qs)
    val want = Qs.map(q => sorted(math.floor(q * (sorted.length - 1)).toInt))
    assert(got == want, s"got=$got want=$want")
    // zero weight adds nothing
    val before = Kll.serialize(b).toSeq
    b.updateWeighted(42L, 0L)
    assert(Kll.serialize(b).toSeq == before)

    // approximate regime: weighted build over a 100k-mass frequency table
    // stays inside the same 3% rank-error envelope as the raw-row build
    val n = 100000
    val wb = new KllBuf(128)
    // values 0..9999, each with weight 10 → total mass 100k, true rank of
    // value v is 10·v
    (0 until 10000).foreach(v => wb.updateWeighted(v.toLong, 10L))
    Qs.zip(Kll.quantiles(wb, Qs)).foreach { case (q, v) =>
      val trueRank = math.floor(q * (n - 1)).toLong
      assert(math.abs(v * 10 - trueRank) <= 0.03 * n,
        s"q=$q value=$v trueRank=$trueRank")
    }
  }

  test("property: rank error holds across distribution shapes at k=128") {
    val n = 60000
    // constant: every quantile IS the value, exactly, at any k
    val cb = new KllBuf(16)
    (0 until n).foreach(_ => cb.update(7L))
    assert(Kll.quantiles(cb, Qs).forall(_ == 7L))
    // zipf-ish: value v = floor(n / (i mod 1000 + 1)) — heavy ties at the
    // head, long sparse tail; and bimodal: two tight clusters
    val shapes = Seq(
      "zipf" -> (0 until n).map(i => (n / (i % 1000 + 1)).toLong),
      "bimodal" -> (0 until n).map(i =>
        if (i % 2 == 0) (i % 50).toLong else 1000000L + (i % 50)))
    for ((name, data) <- shapes) {
      val b = new KllBuf(128)
      // insertion order scrambled deterministically
      data.sortBy(v => (v * 2654435761L) % 999983L).foreach(b.update)
      val sorted = data.sorted.toArray
      Qs.zip(Kll.quantiles(b, Qs)).foreach { case (q, v) =>
        // translate value error to rank error via the sorted multiset
        val lo = sorted.indexWhere(_ >= v)
        val hi = sorted.lastIndexWhere(_ <= v)
        val trueRank = math.floor(q * (n - 1)).toLong
        val rankErr =
          if (lo <= trueRank && trueRank <= hi) 0L
          else math.min(math.abs(lo - trueRank), math.abs(hi - trueRank))
        assert(rankErr <= 0.03 * n, s"$name q=$q v=$v rankErr=$rankErr")
      }
    }
  }

  test("deterministic: same input order gives an identical sketch") {
    val data = permuted(30000)
    val a = new KllBuf(64); data.foreach(a.update)
    val b = new KllBuf(64); data.foreach(b.update)
    assert(a.comps == b.comps && a.levels.map(_.toSeq) == b.levels.map(_.toSeq))
  }

  test("driver and SQL extraction quantize q identically at edge ranks") {
    // q = 0.0999999999999999 rounds to 0.1 at 15 decimal digits (the SQL
    // path's DECIMAL(16,15) cast); with 11 items (tw-1 = 10) that's target
    // rank 1, while the raw binary expansion would floor to rank 0. Both
    // paths must agree — the driver now applies the same HALF_UP
    // quantization before the floor.
    val q = 0.0999999999999999
    val vals = (0L to 10L).map(_ * 100L) // distinct values, rank i -> i*100
    val b = new KllBuf(64)
    vals.foreach(b.update)
    val driver = Kll.quantiles(b, Seq(q)).head
    assert(driver == 100L, s"driver picked rank ${driver / 100} (want 1)")
    val sk = vals.toDF("v").withColumn("g", lit("g"))
      .groupBy("g").agg(expr("kll_sketch(v, 64)").as("sk"))
    val sql = Kll.quantilesFromSketch(sk, Seq("g"), "sk", Seq(q))
      .select("value").as[Long].head()
    assert(sql == driver, s"SQL=$sql driver=$driver diverged at edge q")
  }

  test("k mismatch is rejected on merge; EMPTY sketches merge as no-ops at any k") {
    // direct: different-k non-empty sketches must not silently merge (the
    // result would keep one k label with the other's error bound)
    val a = new KllBuf(64); (1L to 100L).foreach(a.update)
    val b = new KllBuf(128); (1L to 100L).foreach(b.update)
    val e = intercept[IllegalArgumentException](a.mergeIn(b))
    assert(e.getMessage.contains("different k"))
    // SQL rollup: mixed-k NON-EMPTY shards fail loudly...
    val mixed = spark.range(10).selectExpr("kll_sketch(id, 64) AS sk")
      .unionByName(spark.range(10).selectExpr("kll_sketch(id, 128) AS sk"))
    val err = intercept[Throwable](mixed.selectExpr("kll_merge(sk) AS m").collect())
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(err).exists(_.contains("different k")), s"unexpected error: $err")
    // ...but an EMPTY shard (e.g. a partition that saw no rows — its
    // buffer carries the default k=8 label) never poisons the rollup
    val withEmpty = spark.range(0).selectExpr("kll_sketch(id, 64) AS sk")
      .unionByName(spark.range(10).selectExpr("kll_sketch(id, 128) AS sk"))
    val m = withEmpty.selectExpr("kll_merge(sk) AS m").select("m.k").head()
    assert(m.getInt(0) == 128, "merge must adopt the non-empty shard's k")
  }
}
