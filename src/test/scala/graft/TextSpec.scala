package graft

import org.apache.spark.sql.functions._
import graft.operators.{Similarity, TextOps}

class TextSpec extends SparkSpec {
  lazy val docs = graft.core.Tables.load(spark, sfDir, "documents")
  lazy val emb = graft.core.Tables.load(spark, sfDir, "embeddings")

  test("minhash LSH finds the planted near-duplicates and jaccard confirms them") {
    val pairs = TextOps.lshCandidatePairs(TextOps.minhashSignatures(docs))
    val j = TextOps.jaccardPairs(docs, pairs).collect()
    assert(j.nonEmpty, "generator plants near-dups; LSH must surface some")
    // candidates from 4x4 banding at these signature lengths are high-sim
    assert(j.forall(_.getAs[Double]("jaccard") > 0.5),
      s"low-sim false positive: ${j.mkString(",")}")
  }

  test("simhash of near-duplicates differs in few bits") {
    val pairs = TextOps.lshCandidatePairs(TextOps.minhashSignatures(docs))
    val sh = TextOps.simhash(docs)
    val joined = pairs
      .join(sh.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("simhash", "sim_a"), "doc_a")
      .join(sh.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("simhash", "sim_b"), "doc_b")
      .select(bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).as("hamming"))
      .collect()
    assert(joined.nonEmpty && joined.forall(_.getAs[Int]("hamming") <= 8),
      s"near-dups should have small hamming distance: ${joined.mkString(",")}")
  }

  test("exact dedup marks exactly one canonical per hash group") {
    val d = TextOps.exactDedup(docs)
    val perHash = d.groupBy("content_hash")
      .agg(sum(when(col("is_canonical"), 1).otherwise(0)).as("n_canon"))
      .collect()
    assert(perHash.forall(_.getAs[Long]("n_canon") == 1L))
  }

  test("cosine top-k is self-consistent and ranked") {
    val top = Similarity.cosineTopK(emb, emb.filter(col("vec_id") < 3), k = 5).collect()
    assert(top.length == 15)
    val byQ = top.groupBy(_.getAs[Long]("query_id"))
    byQ.values.foreach { rows =>
      val sims = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("cos_sim"))
      assert(sims.sameElements(sims.sorted.reverse), "rank must follow similarity desc")
    }
  }

  test("quality filter drops each Gopher-rule violation for the right reason") {
    import spark.implicits._
    // 50 words, all distinct, 4 stopword kinds, no repeated bigrams
    val goodDoc = "the a of and " + (1 to 46).map(i => s"alpha$i").mkString(" ")
    val tooShort = "the a of and tiny"
    val noStops = (1 to 40).map(i => s"w$i").mkString(" ")
    val repeated = ("the a of and " + Array.fill(36)("spam").mkString(" "))
    val fixture = Seq(
      (1L, goodDoc), (2L, tooShort), (3L, noStops), (4L, repeated)
    ).toDF("doc_id", "text")
    val out = TextOps.qualityFilter(fixture).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Boolean]("keep"), s"clean doc dropped: ${out(1L)}")
    assert(!out(2L).getAs[Boolean]("keep") && out(2L).getAs[Int]("n_words") < 30)
    assert(!out(3L).getAs[Boolean]("keep") && out(3L).getAs[Int]("n_stop_kinds") < 2)
    assert(!out(4L).getAs[Boolean]("keep") &&
      out(4L).getAs[Double]("top_word_frac") > 0.12 &&
      out(4L).getAs[Double]("dup_bigram_frac") > 0.05,
      s"repetition signals must fire: ${out(4L)}")
    // signals are self-consistent on the corpus table too
    val corpus = TextOps.qualityFilter(docs).collect()
    assert(corpus.forall { r =>
      val f = r.getAs[Double]("dup_bigram_frac")
      f >= 0.0 && f <= 1.0 && r.getAs[Double]("top_word_frac") <= 1.0 + 1e-12
    })
  }

  test("semantic dedup keeps each cluster's first member and drops true dups") {
    import spark.implicits._
    // two orthogonal directions; ids 11/12 are near-copies of id 10
    def v(dir: Int, eps: Float): Seq[Float] =
      (0 until 8).map(i => (if (i == dir) 1.0f else 0.0f) + (if (i == 7) eps else 0.0f))
    val fixture = Seq(
      (10L, v(0, 0.0f)), (11L, v(0, 0.01f)), (12L, v(0, 0.02f)),
      (20L, v(3, 0.0f)), (21L, v(3, 0.015f)),
      (30L, (0 until 8).map(i => if (i % 2 == 0) 1.0f else -1.0f))
    ).toDF("vec_id", "embedding")
    // md5-order sample of 3 = ids {30, 21, 11}: one centroid per direction
    // group, so each near-copy family shares a cluster
    val out = Similarity.semanticDedup(fixture, threshold = 0.99, numCents = 3)
      .collect().map(r => r.getAs[Long]("vec_id") -> r).toMap
    assert(out.size == 6, "every corpus row must appear in the decision")
    for (id <- Seq(11L, 12L, 21L))
      assert(out(id).getAs[Boolean]("is_semantic_dup") && !out(id).getAs[Boolean]("keep"),
        s"near-copy $id must drop: ${out(id)}")
    for (id <- Seq(10L, 20L, 30L))
      assert(out(id).getAs[Boolean]("keep"), s"cluster-first $id must keep: ${out(id)}")
    // keep-first-by-id: a dropped row's max_prior_cos comes from an earlier id
    assert(out(11L).getAs[Double]("max_prior_cos") >= 0.99)
  }

  test("PCA: planted 2-factor covariance recovers axes, variances, projections") {
    import spark.implicits._
    val s2 = math.sqrt(2.0)
    // points a·d1 + b·d2 with d1=(1,1,0,0)/√2, d2=(1,−1,0,0)/√2,
    // (a,b) ∈ {±2}×{±1}: mean 0, eigenvalues exactly (4, 1, 0, 0)
    val pts = for (a <- Seq(-2.0, 2.0); b <- Seq(-1.0, 1.0)) yield
      Array((a + b) / s2, (a - b) / s2, 0.0, 0.0).map(_.toFloat).toSeq
    val df = pts.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
    val (mean, evals, comps) = Similarity.pcaComponents(df, 4)
    // float32 inputs: exactness is at 1e-7-ish scale, not 1e-15
    mean.foreach(m => assert(math.abs(m) < 1e-6))
    assert(math.abs(evals(0) - 4.0) < 1e-5 && math.abs(evals(1) - 1.0) < 1e-5)
    assert(math.abs(evals(2)) < 1e-6 && math.abs(evals(3)) < 1e-6)
    // sign-normalized components match the planted directions
    assert(comps(0).zip(Array(1 / s2, 1 / s2, 0, 0)).forall { case (x, y) => math.abs(x - y) < 1e-5 })
    assert(comps(1).zip(Array(1 / s2, -1 / s2, 0, 0)).forall { case (x, y) => math.abs(x - y) < 1e-5 })
    // distributed projection == driver-side dot products
    val proj = Similarity.pcaProject(df, 2, round6 = false).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    pts.zipWithIndex.foreach { case (v, i) =>
      val want1 = v.zip(comps(0)).map { case (x, c) => x * c }.sum
      val want2 = v.zip(comps(1)).map { case (x, c) => x * c }.sum
      assert(math.abs(proj(i.toLong)._1 - want1) < 1e-6)
      assert(math.abs(proj(i.toLong)._2 - want2) < 1e-6)
    }
  }

  test("PCA: eigen residuals, orthonormality and ordering on the corpus embeddings") {
    // full decomposition (k = d) so trace == sum of eigenvalues holds
    val dAll = emb.select(size(col("embedding"))).head().getInt(0)
    val (mean, evals, comps) = Similarity.pcaComponents(emb, dAll)
    val d = mean.length
    assert(evals.sliding(2).forall(p => p(0) >= p(1) - 1e-12), "eigenvalues must descend")
    // brute covariance from the collected corpus (test-scale only)
    val rows = emb.collect().map(_.getAs[Seq[Float]]("embedding").map(_.toDouble).toArray)
    val n = rows.length.toDouble
    val cov = Array.tabulate(d, d) { (i, j) =>
      rows.map(v => (v(i) - mean(i)) * (v(j) - mean(j))).sum / n
    }
    // trace == Σλ (rotation preserves total variance)
    val trace = (0 until d).map(i => cov(i)(i)).sum
    assert(math.abs(trace - evals.sum) < 1e-6 * math.max(1.0, trace))
    for (j <- 0 until d) {
      val v = comps(j)
      val cv = Array.tabulate(d)(i => (0 until d).map(l => cov(i)(l) * v(l)).sum)
      val resid = cv.zip(v).map { case (x, y) => math.abs(x - evals(j) * y) }.max
      assert(resid < 1e-6, s"eigen residual $resid at component $j")
      for (l <- j until d) {
        val dot = comps(j).zip(comps(l)).map { case (x, y) => x * y }.sum
        val want = if (l == j) 1.0 else 0.0
        assert(math.abs(dot - want) < 1e-9, s"orthonormality broke at ($j, $l)")
      }
    }
  }

  test("PCA: partition-local Gramian agrees with the explode formulation") {
    // same corpus through both moment passes: identical row count, sums
    // and second moments (1e-9 relative — the two pass orders differ only
    // in double-addition association), and the USER-VISIBLE projection
    // (round 6) must be bit-identical
    val (mE, sE, nE) = Similarity.pcaMomentsExplode(emb, "embedding")
    val (mL, sL, nL) = Similarity.pcaMoments(emb, "embedding")
    assert(nE == nL, s"row counts diverged: $nE vs $nL")
    def close(a: Double, b: Double): Boolean =
      math.abs(a - b) <= 1e-9 * math.max(1.0, math.max(math.abs(a), math.abs(b)))
    sE.indices.foreach(i => assert(close(sE(i), sL(i)), s"sum[$i]: ${sE(i)} vs ${sL(i)}"))
    for (i <- mE.indices; j <- mE.indices)
      assert(close(mE(i)(j), mL(i)(j)), s"moment[$i][$j]: ${mE(i)(j)} vs ${mL(i)(j)}")
  }

  test("budgetSelect == brute greedy prefix, with score ties and null scores") {
    import spark.implicits._
    import graft.operators.TextOps
    val rnd = new scala.util.Random(17)
    // quantized scores force bucket collisions AND exact ties; a few nulls
    // must drop out of the order entirely
    val rows = Seq.tabulate(300) { i =>
      val score = if (i % 41 == 0) null
        else java.lang.Double.valueOf(rnd.nextInt(20) / 20.0)
      (i.toLong, score, (rnd.nextInt(50) + 1).toLong)
    }
    val df = rows.toDF("doc_id", "score", "cost")
    for (budget <- Seq(0L, 500L, 3000L, 100000L); buckets <- Seq(1, 7, 256)) {
      val got = TextOps.budgetSelect(df, "score", "cost", budget,
          buckets = buckets).collect()
        .map(r => r.getLong(0) -> (r.getLong(3), r.getBoolean(4))).toMap
      var cum = 0L
      val want = rows.filter(_._2 != null)
        .sortBy { case (id, s, _) => (-s, id) }
        .map { case (id, _, c) => cum += c; id -> (cum, cum <= budget) }.toMap
      assert(got == want, s"budget=$budget buckets=$buckets")
    }
  }

  test("text stats are sane") {
    val s = TextOps.textStats(docs).collect()
    assert(s.forall { r =>
      r.getAs[Int]("n_tokens") > 0 &&
      r.getAs[Double]("ttr") <= 1.0 + 1e-12 &&
      r.getAs[Double]("stop_ratio") >= 0.0
    })
  }

  test("IVF top-k: ranked per query, no self matches, overlaps brute force") {
    val queries = emb.filter(col("vec_id") < 5)
    val ivf = Similarity.ivfTopK(emb, queries, k = 5, numCents = 45, nprobe = 2).collect()
    assert(ivf.nonEmpty)
    ivf.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rows) =>
      assert(rows.forall(_.getAs[Long]("neighbor_id") != q), "self match leaked")
      val ranks = rows.map(_.getAs[Int]("rank")).sorted
      assert(ranks.sameElements(1 to rows.length), s"ranks not consecutive for $q")
      val sims = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("cos_sim"))
      assert(sims.sameElements(sims.sorted.reverse), "rank must follow similarity desc")
    }
    // approximate ≠ exact, but probing 2 of ~45 lists must still recover
    // some of the true top-5 across 5 queries
    val exact = Similarity.cosineTopK(emb, queries, k = 5).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val hits = ivf.count(r =>
      exact((r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))))
    assert(hits > 0, "IVF recall collapsed to zero")
  }

  test("native rp_bucket is bit-identical to the Catalyst fold spelling") {
    for ((planes, offset) <- Seq((4, 0), (10, 0), (17, 0), (5, 32), (11, 96))) {
      val mismatch = emb.select(
        Similarity.rpBucket(col("embedding"), planes, offset).as("native"),
        Similarity.rpBucketFold(col("embedding"), planes, offset).as("fold"))
        .filter(col("native") =!= col("fold")).count()
      assert(mismatch == 0, s"rp_bucket diverges from the fold at planes=$planes offset=$offset")
    }
  }

  test("native gopher_signals is bit-identical to the Catalyst HOF spelling") {
    import spark.implicits._
    // the corpus plus edge shapes: empty text (split -> [""]), one token,
    // interior double space (empty token is a countable word), trailing
    // space, all-same tokens (top_word_frac 1.0, dup bigrams), unicode,
    // stopword-only docs
    val edges = Seq("", "a", "a  b", "a b ", "spam spam spam spam",
      "the a of and the a of and", "é ü 中 文 é ü", "x y x y x y z")
      .zipWithIndex.map { case (t, i) => (20000L + i, t) }.toDF("doc_id", "text")
    for (d <- Seq(docs, edges)) {
      val native = TextOps.qualityFilter(d)
      val fold = TextOps.qualityFilterFold(d)
      assert(native.schema == fold.schema, "schemas must match exactly")
      val mismatch = native.as("a").join(fold.as("b"), "doc_id")
        .filter(Seq("n_words", "mean_word_len", "ttr", "n_stop_kinds",
          "top_word_frac", "dup_bigram_frac", "keep")
          .map(c => col(s"a.$c") =!= col(s"b.$c")).reduce(_ || _))
        .count()
      assert(mismatch == 0, "gopher_signals diverges from the HOF fold")
    }
  }

  test("native poly_hash is bit-identical to the Catalyst fold spelling") {
    val mismatch = docs.select(
        TextOps.fingerprint("text").as("native"),
        TextOps.fingerprintFold("text").as("fold"))
      .filter(col("native") =!= col("fold")).count()
    assert(mismatch == 0, "poly_hash diverges from the ascii fold")
  }

  test("native shingle_hashes is bit-identical to the Catalyst HOF spelling") {
    import spark.implicits._
    // the full corpus plus the edge shapes: empty, sub-n, exact-n, interior
    // double space (empty token), trailing space, unicode, repeats (distinct
    // order must match array_distinct's first-occurrence order)
    val edges = Seq("", "a", "a b", "a b c", "a  b c d", "a b c ",
      "é ü 中 文 字", "x y z x y z x y z w").zipWithIndex
      .map { case (t, i) => (10000L + i, t) }.toDF("doc_id", "text")
    for (d <- Seq(docs, edges); n <- Seq(1, 3)) {
      val native = d.select(col("doc_id"),
        call_function("shingle_hashes", col("text"), lit(n), lit(TextOps.HashP)).as("hs"))
      val fold = d.select(col("doc_id"), col("text"))
        .select(col("doc_id"), split(col("text"), " ").as("__toks"))
        .select(col("doc_id"), array_distinct(transform(
          when(size(col("__toks")) >= n,
            transform(sequence(lit(0), size(col("__toks")) - n),
              i => concat_ws(" ", slice(col("__toks"), i + 1, lit(n)))))
            .otherwise(array().cast("array<string>")),
          s => conv(substring(md5(s), 1, 15), 16, 10).cast("long") % TextOps.HashP))
          .as("hs"))
      val mismatch = native.as("a").join(fold.as("b"), "doc_id")
        .filter(col("a.hs") =!= col("b.hs")).count()
      assert(mismatch == 0, s"shingle_hashes(n=$n) diverges from the HOF fold")
    }
  }

  test("native l2sub_f32 is bit-identical to the Catalyst fold spelling") {
    import spark.implicits._
    // codeword = subspace 2 of vector 7 (float->double widened), compared
    // against every vector over all 4 subspaces of the 64-dim embeddings
    val w = emb.filter(col("vec_id") === 7)
      .select(transform(sequence(lit(33), lit(48)),
        i => element_at(col("embedding"), i.cast("int")).cast("double")).as("w"))
      .head().getSeq[Double](0)
    for (sub <- 0 until 4) {
      val mismatch = emb.select(col("embedding"), typedLit(w).as("w"))
        .select(
          call_function("l2sub_f32", col("embedding"), col("w"), lit(sub)).as("native"),
          Similarity.l2sqSubFold(col("embedding"), col("w"), lit(sub), 16).as("fold"))
        .filter(col("native") =!= col("fold")).count()
      assert(mismatch == 0, s"l2sub_f32 diverges from the fold at sub=$sub")
    }
    // out-of-range subspace yields NULL, not garbage
    val oob = emb.limit(1).select(
      call_function("l2sub_f32", col("embedding"),
        transform(sequence(lit(1), lit(64)), _ => lit(0.0)), lit(1)).as("x"))
      .head()
    assert(oob.isNullAt(0), "subspace past the vector end must be NULL")
  }

  test("rpTopK k>1: consecutive ranks, no duplicate neighbors, scores nonincreasing") {
    // k>1 exercises the deduped-candidate path (k=1 skips the distinct —
    // duplicate scored rows can't change a top-1 — so duplicates WOULD
    // surface here if the dedup gate broke)
    val top = Similarity.rpTopK(emb, k = 3).collect()
    assert(top.nonEmpty)
    top.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rows) =>
      val neighbors = rows.map(_.getAs[Long]("neighbor_id"))
      assert(neighbors.distinct.length == neighbors.length,
        s"query $q ranked a neighbor twice: ${neighbors.mkString(",")}")
      val ranks = rows.map(_.getAs[Int]("rank")).sorted
      assert(ranks.sameElements(1 to rows.length), s"ranks not consecutive for $q")
      val sims = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("cos_sim"))
      assert(sims.sameElements(sims.sorted.reverse), "rank must follow similarity desc")
    }
  }

  test("autoBands holds the 0.95-cosine recall target as planes grow") {
    // b = ceil(ln(1-R) / ln(1-s^planes)), s = 1 - acos(0.95)/pi ≈ 0.899
    assert(Similarity.autoBands(1) == 2)   // one plane: s ≈ 0.899, just under R=0.9
    assert(Similarity.autoBands(5) == 3)
    assert(Similarity.autoBands(11) == 7)
    assert(Similarity.autoBands(16) == 12)
    assert(Similarity.autoBands(22) == 23) // the 10M-vector point (no cap)
    assert(Similarity.autoBands(32) == 64) // cap binds past planes 31
    // the banded scheme must actually meet the target at every plane count
    // where the cap doesn't bind: 1 - (1 - s^p)^b >= 0.9. planes <= 31
    // covers corpora to ~occ·2^31 ≈ 8.6B vectors at occupancy 4
    val s = 1.0 - math.acos(0.95) / math.Pi
    for (p <- 1 to 31) {
      val b = Similarity.autoBands(p)
      assert(b <= 64, s"cap exceeded at planes=$p")
      val recall = 1.0 - math.pow(1.0 - math.pow(s, p), b)
      assert(recall >= 0.9, f"recall $recall%.3f below target at planes=$p bands=$b")
    }
  }

  test("banded LSH recovers >=85% of planted cosine>=0.95 near-dups at 20k vectors") {
    // synthetic corpus: even ids are hash-mixed base vectors, odd ids are
    // small perturbations of their preceding even id (amp such that pair
    // cosines spread over ~[0.93, 0.99]); single-band sign-LSH at the
    // autoPlanes(20k)=13 plane count would keep only s^13 ≈ 25% of the
    // 0.95-cosine pairs — the band union is what lifts recall over 0.9
    val n = 20000
    val base = transform(sequence(lit(0), lit(15)),
      i => (pmod(hash(col("id") - col("id") % 2, i), lit(2000)) - 1000).cast("double") / 1000.0)
    val noise = transform(sequence(lit(0), lit(15)),
      i => (pmod(hash(col("id"), i, lit(7)), lit(2000)) - 1000).cast("double") / 1000.0 * 0.245)
    val corpus = spark.range(n).select(col("id").as("vec_id"),
      when(col("id") % 2 === 1, zip_with(base, noise, (x, d) => x + d))
        .otherwise(base).cast("array<float>").as("embedding"))
      .cache()
    val va = corpus.filter(col("vec_id") % 2 === 0)
      .select(col("vec_id").as("doc_a"), col("embedding").as("va"))
    val vb = corpus.filter(col("vec_id") % 2 === 1)
      .select((col("vec_id") - 1).as("doc_a"), col("vec_id").as("doc_b"), col("embedding").as("vb"))
    val truth = va.join(vb, "doc_a")
      .select(col("doc_a"), col("doc_b"),
        round(Similarity.dot(col("va"), col("vb")) /
          (sqrt(Similarity.norm2(col("va"))) * sqrt(Similarity.norm2(col("vb")))), 6).as("cos"))
      .filter(col("cos") >= 0.95)
      .select("doc_a", "doc_b").cache()
    val nTruth = truth.count()
    assert(nTruth > 1000, s"fixture must plant a real truth set, got $nTruth")
    val found = Similarity.nearDupPairs(corpus, threshold = 0.95, n = Some(n.toLong))
      .select("doc_a", "doc_b")
    val recall = found.join(truth, Seq("doc_a", "doc_b")).count().toDouble / nTruth
    assert(recall >= 0.85, f"banded LSH recall $recall%.3f below gate at n=$n")
    corpus.unpersist(); truth.unpersist()
  }

  test("autoPlanes targets bounded bucket occupancy with exact power-of-two edges") {
    // smallest p with 2^p * 4 >= n, clamped to [4, 32]
    assert(Similarity.autoPlanes(0) == 4)
    assert(Similarity.autoPlanes(16) == 4)      // m=4 -> p=2 -> clamp
    assert(Similarity.autoPlanes(1000) == 8)    // m=250, 2^8=256 >= 250
    assert(Similarity.autoPlanes(1024) == 8)    // m=256 exactly: 2^8 suffices
    assert(Similarity.autoPlanes(1028) == 9)    // m=257 -> 2^9
    assert(Similarity.autoPlanes(1L << 40) == 32) // clamp at maxPlanes
    assert(Similarity.autoPlanes(100000, targetOccupancy = 16, maxPlanes = 64) == 13)
  }

  test("IVF recall@5 is nondecreasing in nprobe and the dial buys recall") {
    // probed lists are supersets as nprobe grows (deterministic
    // assignment), so recall vs the exact top-5 can only improve — the
    // spec-scale mirror of the ScaleBench 1M sweep gate
    val queries = emb.filter(col("vec_id") < 5)
    val exact = Similarity.cosineTopK(emb, queries, k = 5).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recalls = Seq(1, 2, 4, 8).map { nprobe =>
      Similarity.ivfTopK(emb, queries, k = 5, numCents = 45, nprobe = nprobe).collect()
        .count(r => exact((r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))))
        .toDouble / exact.size
    }
    assert(recalls.zip(recalls.tail).forall { case (a, b) => b >= a - 1e-9 },
      s"IVF recall must be nondecreasing in nprobe: $recalls")
    assert(recalls.last > recalls.head, s"nprobe dial bought no recall: $recalls")
  }

  test("IVF with Lloyd-refined centroids still returns ranked non-self results") {
    val queries = emb.filter(col("vec_id") < 3)
    val ivf = Similarity.ivfTopK(emb, queries, k = 3, numCents = 8, nprobe = 2,
      lloydIters = 1).collect()
    assert(ivf.nonEmpty)
    assert(ivf.forall(r => r.getAs[Long]("neighbor_id") != r.getAs[Long]("query_id")))
  }

  test("Lloyd refinement strictly improves k-means cost on the embeddings") {
    val cents0 = emb.filter(col("vec_id") % 37 === 0)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent_vec"))
    def wcss(cents: org.apache.spark.sql.DataFrame): Double = {
      val c = cents.select(col("cent_id"),
        org.apache.spark.sql.functions.transform(col("cent_vec"), x => x.cast("double")).as("c_vec"))
      emb.crossJoin(org.apache.spark.sql.functions.broadcast(c))
        .select(col("vec_id"),
          (Similarity.norm2(col("embedding")) + Similarity.norm2(col("c_vec"))
            - lit(2.0) * Similarity.dot(col("embedding"), col("c_vec"))).as("d2"))
        .groupBy("vec_id").agg(min(col("d2")).as("d2"))
        .agg(sum(col("d2"))).head().getDouble(0)
    }
    val before = wcss(cents0)
    val refined = Similarity.lloydRefine(emb, cents0, iters = 2)
    assert(refined.count() == cents0.count(), "centroid count must be preserved")
    val after = wcss(refined)
    assert(after < before, s"Lloyd must not increase WCSS: $before -> $after")
  }

  test("BPE pre-tokenizer splits letter/digit/punct runs with leading-space glue") {
    import spark.implicits._
    val got = Seq("Hello, world 42 it's x9y!")
      .toDF("text")
      .select(TextOps.bpeTokens(col("text")).as("t"))
      .head().getSeq[String](0)
    assert(got == Seq("Hello", ",", " world", " 42", " it", "'", "s", " x", "9", "y", "!"),
      got.mkString("|"))
  }

  test("PQ ADC top-k: ranked per query, no self; trained+reranked recalls exact top-k") {
    val queries = emb.filter(col("vec_id") < 10)
    val pq = Similarity.pqTopK(emb, queries, k = 10).collect()
    assert(pq.nonEmpty)
    val byQ = pq.groupBy(_.getAs[Long]("query_id"))
    byQ.foreach { case (q, rows) =>
      val ranked = rows.sortBy(_.getAs[Int]("rank"))
      assert(ranked.map(_.getAs[Int]("rank")).toSeq == (1 to rows.length))
      assert(!rows.exists(_.getAs[Long]("neighbor_id") == q), "self in results")
      val d2 = ranked.map(_.getAs[Double]("d2_adc"))
      assert(d2.zip(d2.tail).forall { case (a, b) => a <= b }, "ADC not ascending")
    }
    // quality gate on the production path: 3 Lloyd passes + exact rerank
    // of the ADC top-100 shortlist. Embeddings are unit-norm, so exact
    // L2 order == exact cosine order; the reference numpy implementation
    // measures 0.96 recall@10 at this configuration
    val exact = Similarity.cosineTopK(emb, queries, k = 10).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val trained = Similarity.pqTopK(emb, queries, k = 10,
        lloydIters = 3, rerank = 100).collect()
      .groupBy(_.getAs[Long]("query_id"))
    val recalls = trained.map { case (q, rows) =>
      rows.map(_.getAs[Long]("neighbor_id")).count(exact(q)) / 10.0
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.85, f"trained+reranked PQ recall@10 $mean%.2f below 0.85")
  }

  test("IVFADC: ranked per query, no self, nprobe dial buys candidates, rerank recalls") {
    val queries = emb.filter(col("vec_id") < 10)
    val adc = Similarity.ivfadcTopK(emb, queries, k = 5, numCents = 8, nprobe = 2).collect()
    assert(adc.nonEmpty)
    adc.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rows) =>
      assert(rows.forall(_.getAs[Long]("neighbor_id") != q), "self match leaked")
      val ranked = rows.sortBy(_.getAs[Int]("rank"))
      assert(ranked.map(_.getAs[Int]("rank")).toSeq == (1 to rows.length))
      val d2 = ranked.map(_.getAs[Double]("d2_adc"))
      assert(d2.zip(d2.tail).forall { case (a, b) => a <= b }, "ADC not ascending")
    }
    // probing every list with exact rerank must recover most of the exact
    // L2 top-5 (unit-norm embeddings: L2 order == cosine order)
    val exact = Similarity.cosineTopK(emb, queries, k = 5).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val full = Similarity.ivfadcTopK(emb, queries, k = 5, numCents = 8, nprobe = 8,
        lloydIters = 1, rerank = 100).collect()
    val recall = full.count(r =>
      exact((r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))).toDouble / exact.size
    assert(recall >= 0.7, f"IVFADC full-probe reranked recall $recall%.2f below 0.7")
  }

  test("stratified sampling is deterministic, rate-calibrated, and honors rate>=1") {
    import spark.implicits._
    val rows = (0L until 4000L).map(i => (i, if (i % 2 == 0) "a" else "b")).toDF("id", "s")
    val flag = TextOps.sampleFlag(col("s"), col("id"),
      Map("a" -> 0.25, "b" -> 1.0), defaultRate = 0.5)
    val got = rows.select(col("s"), flag.as("keep"))
      .groupBy("s").agg(sum(when(col("keep"), 1).otherwise(0)).as("kept"),
        count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got("b")._1 == got("b")._2, "rate 1.0 keeps everything")
    val rateA = got("a")._1.toDouble / got("a")._2
    assert(math.abs(rateA - 64.0 / 256) < 0.05, s"realized a-rate $rateA vs 0.25")
    // determinism: same flags on re-evaluation
    val twice = rows.select(flag.as("k1"), flag.as("k2"))
      .filter(col("k1") =!= col("k2")).count()
    assert(twice == 0)
  }

  test("packSequences start offsets are the exclusive prefix sum, any bucketing") {
    val packedDefault = TextOps.packSequences(docs, seqLen = 128)
    val rows = packedDefault.orderBy("doc_id").collect()
    var acc = 0L
    rows.foreach { r =>
      assert(r.getAs[Long]("start_tok") == acc,
        s"doc ${r.getAs[Long]("doc_id")}: start ${r.getAs[Long]("start_tok")} != $acc")
      assert(r.getAs[Long]("seq_id") == acc / 128)
      assert(r.getAs[Long]("seq_off") == acc % 128)
      val last = acc + r.getAs[Long]("n_tok") - 1
      assert(r.getAs[Boolean]("spans_boundary") == (last / 128 != acc / 128))
      acc += r.getAs[Long]("n_tok")
    }
    // bucket count must not change the layout (two-phase scan correctness)
    val packed1 = TextOps.packSequences(docs, seqLen = 128, nBuckets = 1)
      .orderBy("doc_id").collect()
    val packed7 = TextOps.packSequences(docs, seqLen = 128, nBuckets = 7)
      .orderBy("doc_id").collect()
    assert(packed1.map(_.toSeq).toSeq == rows.map(_.toSeq).toSeq)
    assert(packed7.map(_.toSeq).toSeq == rows.map(_.toSeq).toSeq)
  }

  test("decontaminate flags eval-overlapping train docs by shingle fraction") {
    import spark.implicits._
    val d = Seq(
      0L  -> "a b c d e f",  // the eval doc
      11L -> "a b c d e f",  // verbatim copy: overlap 1.0
      12L -> "x y z w q r",  // disjoint: overlap 0.0
      13L -> "a b c q r s",  // shares 1 of 4 shingles: 0.25
      14L -> "a b"           // too short for a 3-gram: trivially clean
    ).toDF("doc_id", "text")
    val got = TextOps.decontaminate(d, isEval = col("doc_id") === 0, minFrac = 0.5)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_shingles"), r.getAs[Double]("overlap_frac"),
          r.getAs[Boolean]("contaminated")))).toMap
    assert(got.keySet == Set(11L, 12L, 13L, 14L), "every train doc present, eval absent")
    assert(got(11L) == ((4L, 1.0, true)))
    assert(got(12L) == ((4L, 0.0, false)))
    assert(got(13L) == ((4L, 0.25, false)))
    assert(got(14L) == ((0L, 0.0, false)))
  }

  test("decontaminateFromHashes (shared-hash path) matches decontaminate exactly") {
    val isEval = col("doc_id") % 11 === 0
    val direct = TextOps.decontaminate(docs, isEval, minFrac = 0.1)
    val sh = TextOps.shingleHashes(docs)
    val shared = TextOps.decontaminateFromHashes(
      trainIds = docs.filter(!isEval).select("doc_id"),
      trainHashes = sh.filter(col("doc_id") % 11 =!= 0),
      evalHashes = sh.filter(col("doc_id") % 11 === 0)
        .select("h").distinct().withColumn("__hit", lit(1)),
      minFrac = 0.1)
    assert(direct.count() == shared.count())
    assert(direct.except(shared).isEmpty && shared.except(direct).isEmpty)
  }

  test("mixtureEpochs hits the target mixture with deterministic fractional epochs") {
    import spark.implicits._
    val rows = (0L until 4000L).map(i => (i, if (i % 4 == 0) "rare" else "common"))
      .toDF("doc_id", "s")  // 1000 rare / 3000 common
    val got = TextOps.mixtureEpochs(rows, col("s"),
      Map("rare" -> 0.5, "common" -> 0.5))
    val per = got.groupBy("stratum")
      .agg(sum(col("n_copies")).as("tok"), count(lit(1)).as("n"),
        min(col("rate")).as("rate")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // rare: rate 0.5*4000/1000 = 2.0 exactly — every doc gets exactly 2 copies
    assert(per("rare")._3 == 2.0)
    assert(per("rare")._1 == 2000L, "integral rate 2.0 means exactly 2 copies each")
    assert(got.filter(col("stratum") === "rare" && col("n_copies") =!= 2).count() == 0)
    // common: rate 2/3 — realized copy rate within 5% of target
    val realized = per("common")._1.toDouble / per("common")._2
    assert(math.abs(realized - 2.0 / 3) < 0.05, s"realized common rate $realized")
    // deterministic: the same doc gets the same n_copies on re-evaluation
    val again = TextOps.mixtureEpochs(rows, col("s"),
      Map("rare" -> 0.5, "common" -> 0.5))
    assert(got.select("doc_id", "n_copies").except(
      again.select("doc_id", "n_copies")).count() == 0)
  }

  test("lengthBuckets: contiguous near-equal buckets in global length order") {
    val nb = 8
    val got = TextOps.lengthBuckets(docs, nBuckets = nb)
    val n = got.count()
    // ranks are a permutation of 0..n-1
    val ranks = got.select("rank").collect().map(_.getLong(0)).sorted
    assert(ranks.sameElements(0L until n))
    // bucket sizes differ by at most 1
    val sizes = got.groupBy("bucket").count().collect().map(_.getLong(1))
    assert(sizes.length == nb && (sizes.max - sizes.min) <= 1, sizes.toSeq.toString)
    // buckets are contiguous in length order: max length of bucket b never
    // exceeds min length of bucket b+1
    val stats = got.groupBy("bucket")
      .agg(min(col("n_tok")).as("lo"), max(col("n_tok")).as("hi"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    stats.sliding(2).foreach {
      case Array((_, _, hi), (_, lo, _)) => assert(hi <= lo, stats.toSeq.toString)
      case _ =>
    }
  }

  test("weightedSample favors heavy rows, is deterministic, and plans top-k") {
    import spark.implicits._
    val rows = (0L until 10000L).map(i => (i, if (i % 2 == 0) 10.0 else 1.0))
      .toDF("doc_id", "w")
    val s = TextOps.weightedSample(rows, col("w"), k = 1000)
    assert(s.count() == 1000)
    val heavy = s.filter(col("weight") === 10.0).count()
    assert(heavy > 700, s"weight-10 rows should dominate the sample: $heavy/1000")
    val again = TextOps.weightedSample(rows, col("w"), k = 1000)
    assert(s.except(again).isEmpty && again.except(s).isEmpty)
    val plan = s.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"weighted sample must plan per-partition top-k, not a global sort:\n$plan")
  }

  test("epochShuffle is a deterministic permutation that changes across epochs") {
    val n = docs.count()
    val e1 = TextOps.epochShuffle(docs, epoch = 1)
    val pos = e1.select("shuffle_pos").collect().map(_.getLong(0)).sorted
    assert(pos.sameElements(0L until n), "positions must be exactly 0..n-1")
    // deterministic across re-evaluation
    val again = TextOps.epochShuffle(docs, epoch = 1)
    assert(e1.except(again).isEmpty && again.except(e1).isEmpty)
    // a different epoch is a different permutation (but still a permutation)
    val e2 = TextOps.epochShuffle(docs, epoch = 2)
    val moved = e1.as("a").join(e2.as("b"), "doc_id")
      .filter(col("a.shuffle_pos") =!= col("b.shuffle_pos")).count()
    assert(moved > n / 2, s"epoch 2 should reorder most docs, moved only $moved")
  }

  test("dupSpans finds cross-doc repeated runs and ignores unique text") {
    import spark.implicits._
    val run = (1 to 12).map(i => s"c$i").mkString(" ")     // 12 shared tokens
    val d = Seq(
      1L -> (run + " u1 u2 u3"),   // 15 toks: 6 spans, 3 dup (within run)
      2L -> ("v1 v2 v3 " + run),   // 15 toks: 6 spans, 3 dup
      3L -> ((100 to 114).map(i => s"w$i").mkString(" ")), // unique: 6 spans, 0 dup
      4L -> "short text"            // < 10 toks: 0 spans
    ).toDF("doc_id", "text")
    val got = TextOps.dupSpans(d, n = 10, minFrac = 0.5)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_spans"), r.getAs[Long]("n_dup_spans"),
          r.getAs[Boolean]("dup_heavy")))).toMap
    assert(got(1L) == ((6L, 3L, true)) && got(2L) == ((6L, 3L, true)),
      s"docs sharing a 12-token run must flag its 3 common 10-spans: $got")
    assert(got(3L) == ((6L, 0L, false)))
    assert(got(4L) == ((0L, 0L, false)))
  }

  test("removeDupSpans excises covered tokens and is identity elsewhere") {
    import spark.implicits._
    val run = (1 to 12).map(i => s"c$i").mkString(" ") // shared 12-token run
    val uniq = (100 to 114).map(i => s"w$i").mkString(" ")
    val d = Seq(
      1L -> (run + " u1 u2 u3"),  // dup starts 0,1,2 → tokens 0..11 covered
      2L -> ("v1 v2 v3 " + run),  // dup starts 3,4,5 → tokens 3..14 covered
      3L -> uniq,                 // untouched: must come back byte-identical
      4L -> "short text",         // < 10 toks: no spans, identity
      5L -> run                   // fully covered → empty rewrite
    ).toDF("doc_id", "text")
    val got = TextOps.removeDupSpans(d, n = 10)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tok"), r.getAs[Long]("n_removed"),
          r.getAs[String]("clean_text")))).toMap
    // doc 1: 15 toks, overlapping spans [0,10),[1,11),[2,12) merge to 0..11
    assert(got(1L) == ((15L, 12L, "u1 u2 u3")), s"got ${got(1L)}")
    // doc 2: covered 3..14 — the head gap survives
    assert(got(2L) == ((15L, 12L, "v1 v2 v3")), s"got ${got(2L)}")
    assert(got(3L) == ((15L, 0L, uniq)))
    assert(got(4L) == ((2L, 0L, "short text")))
    assert(got(5L) == ((12L, 12L, "")), s"got ${got(5L)}")
  }

  test("removeDupSpans keeps interior gaps between separated dup spans") {
    import spark.implicits._
    val a = (1 to 10).map(i => s"a$i").mkString(" ")
    val b = (1 to 10).map(i => s"b$i").mkString(" ")
    // doc 10/11 share run `a`, 12/13 share run `b`; doc 14 carries both
    // with a 5-token unique island between → only the island survives
    val d = Seq(
      10L -> a, 11L -> a, 12L -> b, 13L -> b,
      14L -> (a + " m1 m2 m3 m4 m5 " + b)
    ).toDF("doc_id", "text")
    val got = TextOps.removeDupSpans(d, n = 10)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("clean_text")).toMap
    assert(got(14L) == "m1 m2 m3 m4 m5", s"got ${got(14L)}")
    assert(got(10L) == "" && got(12L) == "")
  }

  test("piiScrub masks emails, phones and IPs, counts per category") {
    import spark.implicits._
    val d = Seq(
      (1L, "mail me at jane.doe+x@corp.example.com or call 555-123-4567"),
      (2L, "server at 10.0.42.7 and +1 (650) 555-0199 office"),
      (3L, "no pii here at all"),
      (4L, "two mails a@b.io c@d.net one ip 1.2.3.4")
    ).toDF("doc_id", "text")
    val got = TextOps.piiScrub(d).collect().map(r =>
      r.getAs[Long]("doc_id") -> ((r.getAs[Long]("n_email"), r.getAs[Long]("n_phone"),
        r.getAs[Long]("n_ipv4"), r.getAs[String]("scrubbed_text")))).toMap
    assert(got(1L) == ((1L, 1L, 0L, "mail me at <EMAIL> or call <PHONE>")), s"got ${got(1L)}")
    assert(got(2L) == ((0L, 1L, 1L, "server at <IP> and <PHONE> office")), s"got ${got(2L)}")
    assert(got(3L) == ((0L, 0L, 0L, "no pii here at all")))
    assert(got(4L) == ((2L, 0L, 1L, "two mails <EMAIL> <EMAIL> one ip <IP>")), s"got ${got(4L)}")
  }

  test("dsirScoreAgainst keeps docs whose tokens miss the reference corpus") {
    import spark.implicits._
    val corpus = (0L until 20L).map(i => (i, i < 10, "alpha beta gamma"))
      .toDF("doc_id", "is_t", "text")
    val weights = TextOps.dsirWeights(corpus, isTarget = col("is_t"), buckets = 1024)
    // every token of this doc hashes to buckets the corpus never touched —
    // a sparse weights table would silently drop the doc entirely
    val novel = Seq((99L, "zzz qqq www")).toDF("doc_id", "text")
    val got = TextOps.dsirScoreAgainst(novel, weights, buckets = 1024).collect()
    assert(got.length == 1, "new-domain doc must not vanish from the output")
    assert(got.head.getAs[Long]("n_toks") == 3L, "every token counted")
    // unseen buckets carry the smoothed count-0 weight: with equal target
    // and raw totals here the ratio is ~log((nt+a*B)/(nr... ) — just check
    // the score is finite
    assert(!got.head.getAs[Double]("dsir_score").isNaN)
    // the table is dense: exactly `buckets` rows regardless of corpus
    assert(weights.count() == 1024L)
  }

  test("pqTopK rejects a corpus smaller than the codebook with a clear error") {
    val tiny = emb.filter(col("vec_id") < 5)
    val e = intercept[IllegalArgumentException] {
      Similarity.pqTopK(tiny, emb.filter(col("vec_id") < 2), k = 2, codebookSize = 16)
    }
    assert(e.getMessage.contains("codebook seed"), e.getMessage)
  }

  test("dsirScores separates target-domain from off-domain documents") {
    import spark.implicits._
    val d = (0L until 100L).map { i =>
      val t = i < 50
      (i, t, if (t) "alpha beta gamma delta" else "omega psi chi phi")
    }.toDF("doc_id", "is_t", "text")
    val got = TextOps.dsirScores(d, isTarget = col("is_t"), buckets = 1024)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Double]("dsir_score"), r.getAs[Boolean]("is_target_like")))).toMap
    assert(got.size == 100)
    (0L until 50L).foreach(i => assert(got(i)._1 > 0 && got(i)._2,
      s"target doc $i should score positive: ${got(i)._1}"))
    (50L until 100L).foreach(i => assert(got(i)._1 < 0 && !got(i)._2,
      s"off-domain doc $i should score negative: ${got(i)._1}"))
    // identical docs score identically (pure function of content + corpus)
    assert(got(0L)._1 == got(1L)._1)
  }

  test("sq8_roundtrip expression is bit-equal to the fold spelling") {
    val scales = Similarity.sq8Scales(emb, "embedding")
    val mnA = array(scales.map(s => lit(s._1)): _*)
    val wA = array(scales.map(s => lit(s._2)): _*)
    val both = emb.select(col("vec_id"),
      Similarity.sq8Decode(Similarity.sq8Encode(col("embedding"), scales), scales)
        .as("fold"),
      call_function("sq8_roundtrip", col("embedding"), mnA, wA).as("expr"))
    val bad = both.filter(not(col("fold") <=> col("expr"))).count()
    assert(bad == 0, s"$bad vectors differ between fold and codegen sq8")
    // mismatched shapes yield NULL, not garbage
    val n = both.select(call_function("sq8_roundtrip", col("fold"),
      array(lit(1.0)), array(lit(1.0))).isNull.as("n")).filter(!col("n")).count()
    assert(n == 0)
  }

  test("chunk: window coverage, overlap, and short-tail merging") {
    import spark.implicits._
    val d = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // n=10 < size → 1 chunk
      (2L, (1 to 40).map(i => s"t$i").mkString(" ")), // 2 chunks, tail merged
      (3L, (1 to 60).map(i => s"t$i").mkString(" "))  // 3 chunks
    ).toDF("doc_id", "text")
    val got = TextOps.chunk(d, size = 32, overlap = 8).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getInt(2), r.getString(3)))
      .toMap
    assert(got((1L, 0))._1 == 10)
    assert(got.keys.count(_._1 == 2L) == 2)
    assert(got((2L, 1))._1 == 16 && got((2L, 1))._2.startsWith("t25 "),
      "second chunk starts at token 25 (stride 24)")
    // consecutive chunks overlap by exactly `overlap` tokens
    val c0 = got((3L, 0))._2.split(" ").toSeq
    val c1 = got((3L, 1))._2.split(" ").toSeq
    assert(c0.takeRight(8) == c1.take(8))
    assert(got.keys.count(_._1 == 3L) == 3)
    // full coverage: union of chunks = original tokens, in order
    val rebuilt = (0 until 3).map(k => got((3L, k))._2.split(" ").toSeq)
      .reduce((a, b) => a ++ b.drop(8))
    assert(rebuilt == (1 to 60).map(i => s"t$i"))
  }

  test("resizeBilinear: identity at same size, exact midpoints at 3-to-5 upscale") {
    import spark.implicits._
    import graft.operators.Multimodal
    val px = Array.tabulate[Byte](9)(i => (i * 10).toByte) // 3×3 ramp 0..80
    val m = Seq(Multimodal.MediaRow(1L, "gray", px, 3, 3)).toDS()
    val same = Multimodal.resizeBilinear(m, width = 3, outW = 3, outH = 3)
      .collect().map(r => (r.getInt(1), r.getInt(2)) -> r.getInt(3)).toMap
    (0 until 3).foreach(r => (0 until 3).foreach(c =>
      assert(same((r, c)) == r * 30 + c * 10, s"identity at ($r,$c)")))
    // 3→5: positions 0, .5, 1, 1.5, 2 — midpoints average neighbors exactly
    val up = Multimodal.resizeBilinear(m, width = 3, outW = 5, outH = 5)
      .collect().map(r => (r.getInt(1), r.getInt(2)) -> r.getInt(3)).toMap
    assert(up((0, 0)) == 0 && up((0, 1)) == 5 && up((0, 2)) == 10)
    assert(up((1, 1)) == 20, "center of a bilinear patch averages 4 corners")
    assert(up((4, 4)) == 80)
  }

  test("kmeans|| init covers skew-hidden clusters that uniform sampling misses") {
    import spark.implicits._
    // 8 well-separated 4-dim clusters with heavy size skew: cluster 0 has
    // 930 points, clusters 1-7 have 10 each — a uniform 8-sample lands in
    // cluster 0 with p≈.56 per draw; k-means||'s d²-weighted rounds must
    // seed every cluster
    val centers = (0 until 8).map(c => Array.tabulate(4)(d => (c * 100 + d * 3).toFloat))
    val pts = (0 until 1000).map { i =>
      val c = if (i < 930) 0 else 1 + (i - 930) / 10
      val v = centers(c).zipWithIndex.map { case (x, d) =>
        x + ((i * 31 + d * 7) % 11 - 5) * 0.1f // ±0.5 jitter, deterministic
      }
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
    val init = Similarity.kmeansParallelInit(pts, k = 8, rounds = 5)
    val got = init.collect().map(_.getSeq[Double](1).toArray)
    assert(got.length == 8)
    val covered = centers.count(c => got.exists(g =>
      math.sqrt(c.zip(g).map { case (a, b) => (a - b) * (a - b) }.sum) < 10))
    assert(covered == 8, s"k-means|| covered only $covered/8 planted clusters")
    // the uniform md5-order 8-sample (ivfTopK's oracle-portable init) must
    // cover strictly fewer — the scenario this initializer exists for
    val uniform = pts.orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(8).collect().map(_.getSeq[Float](1).map(_.toDouble).toArray)
    val uniformCovered = centers.count(c => uniform.exists(g =>
      math.sqrt(c.zip(g).map { case (a, b) => (a - b) * (a - b) }.sum) < 10))
    assert(uniformCovered < 8, s"uniform sample covered $uniformCovered/8 — " +
      "test data no longer exercises the skew failure")
    // and a Lloyd pass from the kmeans|| seed converges to tight centroids
    val refined = Similarity.lloydRefine(pts, init, iters = 2)
    val rc = refined.collect().map(_.getSeq[Double](1).toArray)
    val tight = centers.count(c => rc.exists(g =>
      math.sqrt(c.zip(g).map { case (a, b) => (a - b) * (a - b) }.sum) < 2))
    assert(tight == 8, s"refined centroids tight on $tight/8 clusters")
  }

  test("c4Clean applies the published line and page rules") {
    import spark.implicits._
    val docs = Seq(
      // 1: clean 3-sentence page — kept, short/unterminated/js lines dropped
      (1L, "This is a perfectly fine sentence today.\n" +
        "too short.\n" +
        "this line has no terminal punctuation at all\n" +
        "Enable javascript to view this content please!\n" +
        "Another good long sentence stands here.\n" +
        "And one more closing sentence arrives now."),
      // 2: blocked page — lorem ipsum
      (2L, "A good first long sentence sits here.\n" +
        "lorem ipsum dolor sit amet consectetur adipiscing.\n" +
        "A good second long sentence sits here.\n" +
        "A good third long sentence sits here."),
      // 3: blocked page — curly brace (code heuristic)
      (3L, "One fine long sentence is right here.\nfunction f() { return 1; }\n" +
        "Two fine long sentences are right here.\nThree fine long sentences are right here."),
      // 4: too few sentences survive
      (4L, "Only one good long sentence exists here.\nshort one.\nshort two."),
      // 5: multi-sentence single line counts every terminal mark
      (5L, "First point. Second point! Third point? All on one long line.")
    ).toDF("doc_id", "text")
    val got = TextOps.c4Clean(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(got(1L).getAs[Int]("n_lines_kept") == 3)
    assert(got(1L).getAs[Boolean]("keep"))
    assert(got(1L).getAs[String]("cleaned_text") ==
      "This is a perfectly fine sentence today.\n" +
        "Another good long sentence stands here.\n" +
        "And one more closing sentence arrives now.")
    assert(got(2L).getAs[Boolean]("page_blocked") && !got(2L).getAs[Boolean]("keep"))
    assert(got(3L).getAs[Boolean]("page_blocked") && !got(3L).getAs[Boolean]("keep"))
    assert(!got(4L).getAs[Boolean]("page_blocked") && !got(4L).getAs[Boolean]("keep"),
      "pages with <3 surviving sentences drop without being 'blocked'")
    assert(got(5L).getAs[Int]("n_sentences") == 4 && got(5L).getAs[Boolean]("keep"),
      "sentence count is per terminal mark, not per line")
  }

  test("pHash64: invariant to Nyquist noise, sensitive to low-frequency change, ≤31 bits") {
    import spark.implicits._
    import graft.operators.Multimodal
    // textured base (full-spectrum content, so the 63 AC coefficients are
    // well spread around their median — a smooth ramp would park 49 of
    // them AT the median and make any hash unstable by construction);
    // the +1 checkerboard is pure Nyquist-frequency noise, whose
    // projection on the kept 8 lowest frequencies is only the cosine
    // table's rounding residue — orders of magnitude below the
    // coefficient spread
    def img(f: (Int, Int) => Int): Array[Byte] =
      Array.tabulate(1024)(i => f(i / 32, i % 32).toByte)
    val tex = (y: Int, x: Int) => (y * 37 + x * 101 + y * x * 13) % 199
    val base = img(tex)
    val noisy = img((y, x) => tex(y, x) + (if ((x + y) % 2 == 0) 1 else 0))
    val tilted = img((y, x) => tex(y, x) + x / 2) // low-frequency ramp
    val rows = Seq((1L, base), (2L, noisy), (3L, tilted))
      .map { case (id, p) => Multimodal.MediaRow(id, "gray", p, 32, 32) }.toDS()
    val h = Multimodal.pHash64(rows).collect()
      .map(r => r.getAs[Long]("media_id") -> r.getAs[Long]("phash")).toMap
    assert(h(1L) == h(2L), "high-frequency checkerboard must not move the hash")
    assert(h(1L) != h(3L), "a low-frequency ramp must move the hash")
    // 63 AC coeffs vs their 32nd order statistic: at most 31 can exceed it
    h.values.foreach(v => assert(java.lang.Long.bitCount(v) <= 31))
  }

  test("mmrTopK: a diverse lower-relevance candidate beats an equal-relevance near-dup") {
    import spark.implicits._
    // id 2 is id 1 scaled by 2 (cos is scale-invariant: rel ties at 0.9,
    // sim(1,2) = 1 exactly); id 3 is less relevant (0.85) but diverse
    val rows = Seq(
      (0L, Seq(1.0f, 0.0f)),
      (1L, Seq(0.9f, 0.43589f)),
      (2L, Seq(1.8f, 0.87178f)),
      (3L, Seq(0.85f, -0.5268f)),
      (4L, Seq(0.7f, 0.714f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.mmrTopK(rows, rows.filter(col("vec_id") === 0),
        kCand = 4, kOut = 3)
      .orderBy("pick").collect()
    // pick 1: rel tie (1 vs 2) broken by id; pick 2: the near-dup's
    // mmr = ½(0.9 − 1) < the diverse candidate's ½(0.85 − 0.535); pick 3:
    // the near-dup still beats id 4 (rel 0.7, max_sim ≈ 0.94)
    assert(out.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(1L, 3L, 2L))
    assert(out(1).getAs[Double]("rel") < out(0).getAs[Double]("rel"),
      "diversity must beat raw relevance at pick 2")
  }

  test("vocabCoverage: histogram closed form equals the brute rank walk") {
    import spark.implicits._
    val words = Seq.fill(60)("the") ++ Seq.fill(25)("of") ++ Seq.fill(25)("to") ++
      (1 to 40).map(i => s"rare$i")
    val docs = words.grouped(10).zipWithIndex
      .map { case (g, i) => (i.toLong, g.mkString(" ")) }.toSeq.toDF("doc_id", "text")
    val pcts = Seq(10, 40, 50, 90, 100)
    val got = TextOps.vocabCoverage(docs, pcts)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val freq = words.groupBy(identity).view.mapValues(_.length.toLong)
      .toSeq.sortBy { case (t, c) => (-c, t) }
    val total = words.length.toLong
    pcts.foreach { p =>
      val needed = (total * p + 99) / 100
      var (cum, rank) = (0L, 0L)
      while (cum < needed) { cum += freq(rank.toInt)._2; rank += 1 }
      val (gr, gc, gt) = got(p)
      assert(gr == rank && gc == cum && gt == total,
        s"pct=$p got ($gr,$gc,$gt) want ($rank,$cum,$total)")
    }
    // ties must not matter: 'of'/'to' share count 25; pct=40 needs 60
    // (all 'the'), pct=50 needs 75 — one tied token more, either one
    assert(got(40)._1 == 1L && got(50)._1 == 2L)
  }

  test("paddingWaste: power-of-two buckets, exact integer waste") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a"),                                  // len 1  -> bucket 1
      (2L, "a b c"),                              // len 3  -> bucket 4
      (3L, (1 to 4).map(_ => "x").mkString(" ")), // len 4  -> bucket 4
      (4L, (1 to 9).map(_ => "x").mkString(" "))  // len 9  -> bucket 16
    ).toDF("doc_id", "text")
    val got = TextOps.paddingWaste(docs, cap = 16)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    assert(got(1) == (1L, 1L, 0L, 0L))
    assert(got(4) == (2L, 7L, 1L, 125000L))   // 1/8 waste
    assert(got(16) == (1L, 9L, 7L, 437500L))  // 7/16 waste
    // clipping: a doc longer than cap lands in the cap bucket at len=cap
    val clipped = TextOps.paddingWaste(
      Seq((9L, (1 to 40).map(_ => "x").mkString(" "))).toDF("doc_id", "text"),
      cap = 16).collect()
    assert(clipped.length == 1 &&
      clipped.head.getInt(0) == 16 && clipped.head.getLong(2) == 16L)
  }

  test("PPJoin length+positional filters cut candidates with zero recall loss") {
    import spark.implicits._
    // mixed-length corpus: (1,2) near-dups; 6 shares 1's rare tokens but
    // is 4× longer (length filter kills it); 7 shares one late-prefix
    // token with 3 but their positions cap the overlap below α
    // (positional filter kills it); brute Jaccard is the ground truth
    val c = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta iota"),
      (3L, "one two three four five six seven eight nine ten"),
      (6L, ("alpha beta gamma delta " + (1 to 30).map(i => s"pad$i ").mkString).trim),
      (7L, "one two eleven twelve thirteen fourteen fifteen sixteen")
    ).toDF("doc_id", "text")
    val sh = TextOps.shingleHashes(c)
    val unfiltered = TextOps.prefixCandidates(sh, 4, 5,
      lengthFilter = false, positionalFilter = false).count()
    val filtered = TextOps.prefixCandidates(sh, 4, 5).count()
    info(s"candidates: $unfiltered prefix-only -> $filtered with PPJoin filters")
    assert(filtered < unfiltered,
      s"PPJoin filters pruned nothing ($unfiltered -> $filtered) — fixture rot?")
    // exactness vs brute force must hold WITH the filters active
    val s = sh.collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val brute = (for {
      a <- s.keys; b <- s.keys if a < b
      inter = (s(a) & s(b)).size; union = (s(a) | s(b)).size
      if inter * 5 >= union * 4
    } yield (a, b)).toSet
    val got = TextOps.prefixFilterJoin(c, 4, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute, s"filters lost recall: got $got want $brute")
  }

  test("property: prefix join == brute Jaccard on random corpora, any threshold") {
    import spark.implicits._
    // randomized recall/precision sweep: mixed doc lengths, shared-token
    // families, dup pairs, disjoint noise — 5 seeds × 3 thresholds, each
    // compared to exact brute force over the same shingle sets
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed * 1000 + 7)
      val docs = (0 until 30).map { i =>
        val fam = i % 5
        val n = 5 + rnd.nextInt(40)
        val words = (0 until n).map { _ =>
          if (rnd.nextInt(10) < 6) s"f${fam}_w${rnd.nextInt(12)}"
          else s"u${rnd.nextInt(5000)}"
        }
        (i.toLong, words.mkString(" "))
      }.toDF("doc_id", "text")
      val sh = TextOps.shingleHashes(docs)
      val sets = sh.collect().map(r => r.getLong(0) -> r.getLong(1))
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
      for ((tn, td) <- Seq((1, 3), (1, 2), (4, 5))) {
        val brute = (for {
          a <- sets.keys; b <- sets.keys if a < b
          inter = (sets(a) & sets(b)).size; union = (sets(a) | sets(b)).size
          if inter * td >= union * tn
        } yield (a, b)).toSet
        val got = TextOps.prefixFilterFromHashes(sh, tn, td).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(got == brute,
          s"seed=$seed thr=$tn/$td: missing=${brute -- got} extra=${got -- brute}")
      }
    }
  }

  test("prefix-filter join equals brute-force exact Jaccard (no false negatives)") {
    import spark.implicits._
    // small corpus with known structure: near-dup pair (1,2), partial
    // overlap (3,4) below threshold, unrelated 5
    val c = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
      (3L, "one two three four five six seven eight"),
      (4L, "one two three nine ten eleven twelve thirteen"),
      (5L, "completely different words appear here today")
    ).toDF("doc_id", "text")
    val sh = TextOps.shingleHashes(c)
    def brute(thrNum: Int, thrDen: Int): Set[(Long, Long)] = {
      val s = sh.collect().map(r => r.getLong(0) -> r.getLong(1))
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
      (for {
        a <- s.keys; b <- s.keys if a < b
        inter = (s(a) & s(b)).size; union = (s(a) | s(b)).size
        if inter * thrDen >= union * thrNum
      } yield (a, b)).toSet
    }
    for ((n, d) <- Seq((4, 5), (1, 2), (1, 4))) {
      val got = TextOps.prefixFilterFromHashes(sh, n, d).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == brute(n, d), s"threshold $n/$d diverged")
    }
    // sanity: the structure is actually exercised at 1/2
    val at12 = TextOps.prefixFilterFromHashes(sh, 1, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(at12.contains((1L, 2L)) && !at12.contains((3L, 4L)))
  }

  test("prefix-filter join reports exact integer intersection/union sizes") {
    import spark.implicits._
    val c = Seq(
      (1L, "a b c d e f"),   // shingles: abc bcd cde def (4)
      (2L, "a b c d e g")    // shingles: abc bcd cde deg (4) -> inter 3, union 5
    ).toDF("doc_id", "text")
    val r = TextOps.prefixFilterJoin(c, 1, 2).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("n_inter") == 3L && r.head.getAs[Long]("n_union") == 5L)
  }

  test("corpus line dedup: first occurrence wins within and across docs, order kept") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha\nbeta\nalpha\ngamma"),       // in-doc dup: 2nd alpha drops
      (2L, "beta\ndelta\n  beta  \nepsilon"),  // cross-doc dup + trim-match
      (3L, "alpha\nbeta\ndelta"),              // all dups -> empty
      (4L, "\n\n  \n")                         // only blank lines
    ).toDF("doc_id", "text")
    val out = TextOps.corpusLineDedup(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_lines"), r.getAs[Int]("n_kept"), r.getAs[String]("deduped_text")))
      .toMap
    assert(out(1L) == ((4, 3, "alpha\nbeta\ngamma")))
    // doc 2: beta already seen in doc 1; "  beta  " trims to beta -> dup too
    assert(out(2L) == ((4, 2, "delta\nepsilon")))
    assert(out(3L) == ((3, 0, "")))
    assert(out(4L) == ((0, 0, "")))
  }

  test("corpus line dedup keeps the surviving lines' ORIGINAL (untrimmed) text") {
    import spark.implicits._
    val docs = Seq((1L, "  padded  \nplain")).toDF("doc_id", "text")
    val out = TextOps.corpusLineDedup(docs).collect().head
    assert(out.getAs[String]("deduped_text") == "  padded  \nplain")
  }
}
