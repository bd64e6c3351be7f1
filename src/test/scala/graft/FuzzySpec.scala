package graft

import org.apache.spark.sql.functions._
import graft.operators.Fuzzy

/** Fuzzy-matching gates: the Jaro-Winkler kernel against the published
  * golden pairs and its algebraic properties, the blocked levenshtein
  * join's candidate semantics, and the banded Hamming join's pigeonhole
  * recall guarantee.
  */
class FuzzySpec extends SparkSpec {

  private def jw(a: String, b: String): Double = Fuzzy.JaroWinkler.similarity(a, b)

  test("Jaro-Winkler matches the published golden pairs") {
    // Winkler (1990) examples, 4-decimal values
    assert(math.abs(jw("martha", "marhta") - 0.9611) < 5e-5)
    assert(math.abs(jw("dixon", "dicksonx") - 0.8133) < 5e-5)
    assert(math.abs(jw("jellyfish", "smellyfish") - 0.8963) < 5e-5)
  }

  test("Jaro-Winkler edge semantics mirror DuckDB: empty scores 0, equal scores 1") {
    assert(jw("", "") == 0.0)      // DuckDB's convention, not the textbook 1
    assert(jw("", "abc") == 0.0)
    assert(jw("abc", "abc") == 1.0)
    assert(jw("a", "a") == 1.0)
  }

  test("Jaro-Winkler properties: symmetry, range, prefix boost only above 0.7") {
    val words = Seq("sort", "short", "sport", "stream", "steam", "a", "ab",
      "query", "queue", "window", "widow", "xyz", "abc")
    for (a <- words; b <- words) {
      val s = jw(a, b)
      assert(s == jw(b, a), s"symmetry broke on ($a,$b)")
      assert(s >= 0.0 && s <= 1.0, s"range broke on ($a,$b): $s")
    }
    // disjoint alphabets → jaro 0 → no boost applies
    assert(jw("abcd", "wxyz") == 0.0)
  }

  test("jaro_winkler SQL expression equals the kernel and runs codegen'd") {
    val df = spark.sql(
      "SELECT jaro_winkler('martha', 'marhta') AS s1, jaro_winkler('abc', 'abc') AS s2")
    val r = df.collect().head
    assert(r.getDouble(0) == jw("martha", "marhta"))
    assert(r.getDouble(1) == 1.0)
  }

  test("blocked levenshtein join pairs within blocks only, at the threshold") {
    import spark.implicits._
    val rows = Seq(
      ("b1", "sort table"), ("b1", "sort cable"), ("b1", "sort stream"),
      ("b2", "sort table"),  // same string, different block: must not pair
      ("b2", "join fast"), ("b2", "join hash")).toDF("blk", "s")
    val got = Fuzzy.blockedLevenshteinPairs(rows, "blk", "s", maxDist = 2)
      .select("str_a", "str_b", "lev_dist")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(got == Set(("sort cable", "sort table", 1), ("join fast", "join hash", 2)))
    // "sort stream" sits > 2 edits from both b1 partners; cross-block
    // identical strings produce no pair (a < b fails on equality anyway)
  }

  test("wide 128-bit Hamming join: exact recall with 32-bit bands") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val base = Seq.fill(50)((rnd.nextLong(), rnd.nextLong()))
    def flip(h: (Long, Long), bitsToFlip: Seq[Int]): (Long, Long) =
      bitsToFlip.foldLeft(h) { case ((w0, w1), b) =>
        if (b < 64) (w0 ^ (1L << b), w1) else (w0, w1 ^ (1L << (b - 64)))
      }
    val near = base.zipWithIndex.map { case (h, i) =>
      flip(h, Seq(i % 128, (i * 37 + 5) % 128).distinct.take(1 + i % 3)) }
    val far = base.map(h => flip(h, Seq(0, 19, 40, 66, 90, 101, 120)))
    val all = (base ++ near ++ far).distinct.toDF("h0", "h1")
    val got = Fuzzy.hammingNearDupPairsWide(all, Seq("h0", "h1"), bands = 4, maxHamming = 3)
      .select("hash_a.h0", "hash_a.h1", "hash_b.h0", "hash_b.h1", "hamming")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3)), r.getInt(4)))
    def ham(a: (Long, Long), b: (Long, Long)): Int =
      java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
    base.zip(near).foreach { case (a, b) =>
      if (a != b) {
        val found = got.exists(p => Set(p._1, p._2) == Set(a, b))
        assert(found, s"planted wide pair (ham ${ham(a, b)}) missed")
      }
    }
    got.foreach { case (a, b, h) =>
      assert(h == ham(a, b) && h <= 3, s"bad pair ($a,$b,$h)")
    }
  }

  test("two-table linkage joins within blocks, keeps identical strings, no self-dedup") {
    import spark.implicits._
    val a = Seq(("b1", "acme corp"), ("b2", "zenith ltd")).toDF("blk", "s")
    val b = Seq(("b1", "acme corp"), ("b1", "acme co"), ("b2", "acme corp")).toDF("blk", "s")
    val got = Fuzzy.blockedLevenshteinJoin(a, b, "blk", "s", maxDist = 2)
      .select("str_a", "str_b", "lev_dist")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    // exact match links at distance 0 (no a < b suppression in A×B mode);
    // cross-block "acme corp" in b2 must not link to a's b1 row
    assert(got == Set(("acme corp", "acme corp", 0), ("acme corp", "acme co", 2)))
  }

  test("banded Hamming join: exact recall at <= maxHamming, none beyond") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val bits = 56
    val mask = (1L << bits) - 1
    val base = Seq.fill(40)(rnd.nextLong() & mask).distinct
    // plant: for each base hash, a partner at hamming d (1..3 kept, 4+ dropped)
    def flip(h: Long, n: Int): Long = {
      var v = h
      val picked = scala.collection.mutable.Set.empty[Int]
      while (picked.size < n) picked += rnd.nextInt(bits)
      picked.foreach(b => v ^= (1L << b))
      v
    }
    val near = base.zipWithIndex.map { case (h, i) => flip(h, 1 + i % 3) }
    val far = base.map(h => flip(h, 9))
    val all = (base ++ near ++ far).distinct.toDF("h")
    val pairs = Fuzzy.hammingNearDupPairs(all, "h", bits = bits, bands = 4, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    base.zip(near).foreach { case (a, b) =>
      if (a != b) {
        val k = (math.min(a, b), math.max(a, b))
        assert(pairs.contains(k), s"planted near pair $k missed — recall guarantee broken")
      }
    }
    pairs.foreach { case (a, b) =>
      assert(java.lang.Long.bitCount(a ^ b) <= 3, s"pair ($a,$b) beyond maxHamming")
    }
  }

  test("narrow and wide Hamming paths share one band family: identical pairs") {
    import spark.implicits._
    // a 64-bit population where the two paths must agree exactly: the
    // wide path with hashCols=Seq(h) IS the narrow path (shared
    // bandValue + confirmedPairs core), so any band-family drift between
    // them flips this set equality
    val rnd = new scala.util.Random(11)
    val base = Seq.fill(60)(rnd.nextLong()).distinct
    val near = base.map(h => h ^ (1L << rnd.nextInt(64)) ^ (1L << rnd.nextInt(64)))
    val all = (base ++ near).distinct.toDF("h")
    val narrow = Fuzzy.hammingNearDupPairs(all, "h", bits = 64, bands = 4, maxHamming = 3)
      .select("hash_a", "hash_b", "hamming")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val wide = Fuzzy.hammingNearDupPairsWide(all, Seq("h"), bands = 4, maxHamming = 3)
      .select(col("hash_a.h"), col("hash_b.h"), col("hamming"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(narrow.nonEmpty && narrow == wide, s"narrow $narrow != wide $wide")
  }

  test("goldenRecord: every survivorship rule picks its documented winner") {
    import spark.implicits._
    val records = Seq(
      // cluster 1: name lengths 2,3,3 — longest wins, tie breaks to
      // binary-smallest ("Abc" < "abc"); balance max; version 3 wins the
      // segment; null contact loses to both non-nulls
      (1L, 1L, "ab", 100L, "s1", "N9": String),
      (1L, 2L, "abc", 300L, "s2", null.asInstanceOf[String]),
      (1L, 3L, "Abc", 200L, "s3", "N2"),
      // cluster 2: a singleton passes through unchanged
      (2L, 7L, "solo", 50L, "sX", "N5"))
      .toDF("cluster", "version", "name", "bal", "segment", "contact")
    val g = Fuzzy.goldenRecord(records, "cluster", Seq(
      "name" -> Fuzzy.Survivor.LongestString,
      "bal" -> Fuzzy.Survivor.MaxNumeric,
      "segment" -> Fuzzy.Survivor.LatestBy("version"),
      "contact" -> Fuzzy.Survivor.MinString))
      .collect().map(r => r.getLong(0) -> r).toMap
    val c1 = g(1L)
    assert(c1.getLong(1) == 3L, "n_records")
    assert(c1.getString(2) == "Abc", "longest name, tie to binary-smallest")
    assert(c1.getLong(3) == 300L, "max balance")
    assert(c1.getString(4) == "s3", "last-write segment by version")
    assert(c1.getString(5) == "N2", "min non-null contact")
    val c2 = g(2L)
    assert(c2.getLong(1) == 1L && c2.getString(2) == "solo" &&
      c2.getLong(3) == 50L && c2.getString(4) == "sX" && c2.getString(5) == "N5")
  }

  test("sortedNeighborhood == brute single-window pairs across layouts and widths") {
    import spark.implicits._
    val rnd = new scala.util.Random(97)
    // duplicate keys, NEGATIVE keys (trunc-div buckets stay monotone),
    // and ids shuffled so rank ties break on id
    val rows = Seq.tabulate(500)(i =>
      (i.toLong, (rnd.nextInt(400) - 200).toLong)).toDF("id", "key")
    val w = 4
    val brute = rows.collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (id, k) => (k, id) }.zipWithIndex
    val want = (for {
      (a, ra) <- brute; (b, rb) <- brute
      if rb > ra && rb - ra < w
    } yield (a._1, a._2, b._1, b._2, (rb - ra).toLong)).toSet
    for ((parts, bw) <- Seq((1, 1024L), (7, 16L), (32, 1L), (13, 1000000L))) {
      val got = Fuzzy.sortedNeighborhood(rows.repartition(parts), "id", "key",
          w, bucketWidth = bw)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
      assert(got == want, s"parts=$parts bw=$bw: ${got.size} vs ${want.size}")
    }
  }

  test("sortedNeighborhoodBy over string keys: prefix buckets match brute pairs") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val names = Seq("smith", "smyth", "smithe", "jones", "jonas", "brown",
      "braun", "miller", "muller", "mueller")
    val rows = Seq.tabulate(300)(i =>
      (i.toLong, names(rnd.nextInt(names.length)) + rnd.nextInt(10)))
      .toDF("id", "name")
    val w = 3
    val brute = rows.collect().map(r => (r.getLong(0), r.getString(1)))
      .sortBy { case (id, k) => (k, id) }.zipWithIndex
    val want = (for {
      (a, ra) <- brute; (b, rb) <- brute
      if rb > ra && rb - ra < w
    } yield (a._1, b._1, (rb - ra).toLong)).toSet
    val got = Fuzzy.sortedNeighborhoodBy(rows.repartition(9), "id", "name",
        w, org.apache.spark.sql.functions.substring(
          org.apache.spark.sql.functions.col("name"), 1, 2))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(4))).toSet
    assert(got == want, s"${got.size} vs ${want.size}")
  }

  test("sortedNeighborhood offsets join falls back off-broadcast above the bucket cap") {
    import spark.implicits._
    // high-cardinality bucketing (width 1, every key distinct): with
    // maxBroadcastBuckets = 0 the offsets table must NOT broadcast —
    // results stay identical, only the join strategy changes
    val rows = Seq.tabulate(200)(i => (i.toLong, (i * 7 % 200).toLong))
      .toDF("id", "key")
    val w = 3
    val bucket = org.apache.spark.sql.functions.expr("key DIV 1")
    val warns = scala.collection.mutable.ArrayBuffer.empty[String]
    val prior = Fuzzy.onBroadcastFallback
    Fuzzy.onBroadcastFallback = warns += _
    try {
      val viaBroadcast = Fuzzy.sortedNeighborhoodBy(rows, "id", "key", w, bucket)
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(4))).toSet
      assert(warns.isEmpty, "the broadcast path must not warn")
      val viaShuffle = Fuzzy.sortedNeighborhoodBy(rows, "id", "key", w, bucket,
          maxBroadcastBuckets = 0L)
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(4))).toSet
      assert(viaShuffle == viaBroadcast && viaShuffle.nonEmpty)
      // the fallback must be LOUD — users should learn their bucketExpr is
      // finer than the data, not silently eat a shuffled join
      assert(warns.exists(_.contains("maxBroadcastBuckets")),
        s"expected a fallback warning, got $warns")
    } finally Fuzzy.onBroadcastFallback = prior
  }
}
