package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Embedding similarity search over `array<float>` columns.
  *
  * Two tiers, per the scale plan:
  *  - [[cosineTopK]]: brute-force exact top-k — broadcast the (small) query
  *    set against the full corpus; the corpus never shuffles. Right answer
  *    for "few queries × huge corpus".
  *  - [[nearDupPairs]] / [[rpTopK]]: banded random-hyperplane LSH — each
  *    vector gets one sign-bit bucket per band from deterministic
  *    pseudo-random hyperplanes ([[autoPlanes]] bits per band for bounded
  *    occupancy, [[autoBands]] bands for flat recall); pairs only meet
  *    inside a shared band bucket. Right shape for "all-pairs at 100 TB":
  *    the band equi-join replaces the quadratic cross join.
  *
  * All arithmetic is double (floats cast first), folds run left-to-right —
  * bit-reproducible against the DuckDB oracle.
  */
object Similarity {

  /** Left-to-right dot product of two float-array columns, in double —
    * the codegen'd [[graft.sql.DotProductExpression]] (registered by
    * GraftExtensions, required in the session). Bit-identical to the
    * Catalyst `aggregate(zip_with(...))` fold it replaces, but a primitive
    * loop inside whole-stage codegen instead of per-element interpreted
    * lambdas.
    */
  def dot(a: Column, b: Column): Column = call_function("dot_f32", a, b)

  def norm2(a: Column): Column = call_function("dot_f32", a, a)

  def cosine(a: Column, b: Column): Column = dot(a, b) / (sqrt(norm2(a)) * sqrt(norm2(b)))

  /** Exact top-k neighbors for each query vector (queries broadcast).
    * Norms are computed once per vector, not per pair — only the dot product
    * runs in the pairwise inner loop.
    */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
      sqrt(norm2(col(vecCol))).as("q_nrm"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"),
      sqrt(norm2(col(vecCol))).as("c_nrm"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(dot(col("q_vec"), col("c_vec")) / (col("q_nrm") * col("c_nrm")), 6).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Hard-negative mining — the contrastive-training data prep: for each
    * query vector, the k most similar vectors with a DIFFERENT label
    * (cosine), i.e. the negatives the model currently confuses and learns
    * most from (the in-batch/ANCE shape). Same audited few-queries
    * broadcast scan as [[cosineTopK]] with the label-mismatch predicate
    * riding the join, so same-label rows drop before scoring; top-k is a
    * rank-≤-k window (WindowGroupLimit). For query sets past broadcast
    * scale, mine from an ANN tier's candidates instead (q76's shape) and
    * filter labels there.
    *
    * Output: query_id, query_label, neighbor_id, neighbor_label, cos_sim,
    * rank.
    */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      labelCol: String = "label"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
      col(labelCol).as("query_label"), sqrt(norm2(col(vecCol))).as("q_nrm"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"),
      col(labelCol).as("neighbor_label"), sqrt(norm2(col(vecCol))).as("c_nrm"))
    val scored = c.join(broadcast(q), col("query_label") =!= col("neighbor_label"))
      .select(col("query_id"), col("query_label"), col("neighbor_id"),
        col("neighbor_label"),
        round(dot(col("q_vec"), col("c_vec")) / (col("q_nrm") * col("c_nrm")), 6)
          .as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Maximal Marginal Relevance re-selection (Carbonell & Goldstein,
    * SIGIR 1998) — the diversity step a retrieval stack runs on a
    * candidate list before using it for training-data selection or RAG
    * context: greedily pick `kOut` of the `kCand` cosine candidates,
    * each round maximizing λ·rel − (1−λ)·max_sim-to-already-picked
    * (λ = 1/2 here, so both factors are exact binary halves).
    *
    * Scale shape: [[cosineTopK]] bounds everything downstream at kCand
    * rows per query — the pairwise sim table is kCand² per query and the
    * greedy rounds unroll into kOut−1 window+join levels over those
    * bounded frames, so cost is independent of corpus size once the
    * candidate scan is done. Every arithmetic step is on 6-rounded
    * doubles with exact-half λ, so the argmax chain replays
    * bit-identically in the relational oracle.
    *
    * Output: (query_id, neighbor_id, rel, max_sim, mmr, pick) — pick is
    * the selection round (1-based).
    */
  def mmrTopK(corpus: DataFrame, queries: DataFrame, kCand: Int, kOut: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(kOut >= 1 && kOut <= kCand, s"kOut $kOut must be in [1, $kCand]")
    // both frames are read by every unrolled greedy round below — persist
    // (query-scoped, kCand·|queries| and kCand²·|queries| rows) so the
    // corpus-wide candidate scan runs ONCE, not once per round per branch
    val cands = graft.core.CacheLife.scoped(
      cosineTopK(corpus, queries, kCand, idCol, vecCol)
        .select(col("query_id"), col("neighbor_id"), col("cos_sim").as("rel"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val withVec = cands.join(
      corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("v")), "neighbor_id")
    // candidate-pairwise cosine, kCand² rows per query
    val sims = graft.core.CacheLife.scoped(
      withVec.select(col("query_id"), col("neighbor_id"), col("v"))
        .join(withVec.select(col("query_id"), col("neighbor_id").as("other_id"),
          col("v").as("w")), Seq("query_id"))
        .filter(col("neighbor_id") =!= col("other_id"))
        .select(col("query_id"), col("neighbor_id"), col("other_id"),
          round(dot(col("v"), col("w"))
            / (sqrt(norm2(col("v"))) * sqrt(norm2(col("w")))), 6).as("sim"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val wRel = Window.partitionBy(col("query_id"))
      .orderBy(col("rel").desc, col("neighbor_id").asc)
    var selected = cands.withColumn("rn", row_number().over(wRel))
      .filter(col("rn") === 1)
      .select(col("query_id"), col("neighbor_id"), col("rel"),
        lit(0.0).as("max_sim"), lit(1).as("pick"))
    // `state` = remaining candidates with their RUNNING max similarity to
    // the picked set — the textbook incremental MMR update. Each round
    // touches only the LAST pick's sim rows (left join vs a 1-row-per-
    // query frame + `greatest`) instead of re-aggregating max(sim) over
    // the whole picked set, which grew the per-round work linearly in t.
    // Associativity of max over the rounded sims makes the running value
    // bit-identical to the re-aggregated one. The initial −2.0 sits below
    // the cosine range so a NEGATIVE best similarity survives the first
    // greatest() (a 0.0 start silently clamped it — caught by the q140
    // oracle); after round 2 every remaining candidate carries a real sim.
    var state = cands.withColumn("max_sim", lit(-2.0))
    var lastPick = selected.select(col("query_id"), col("neighbor_id").as("other_id"))
    for (t <- 2 to kOut) {
      val updated = state
        .join(lastPick.withColumnRenamed("other_id", "neighbor_id"),
          Seq("query_id", "neighbor_id"), "left_anti")
        .join(sims.join(lastPick, Seq("query_id", "other_id"))
          .select(col("query_id"), col("neighbor_id"), col("sim")),
          Seq("query_id", "neighbor_id"), "left")
        .select(col("query_id"), col("neighbor_id"), col("rel"),
          greatest(col("max_sim"), coalesce(col("sim"), lit(-2.0))).as("max_sim"))
        // `updated` is read three ways (pick window, next round's state,
        // next anti-join) — truncate lineage HERE, once per round, so the
        // plan stays linear in t (without it planning dominates wall time:
        // measured 11.6 s → ~1 s at sf0.1). Same lazy-localCheckpoint
        // pattern as ConnectedComponents; kCand·|queries| rows. The pick
        // and selected-union stay lazy views over the checkpointed state.
        .localCheckpoint(false)
      val wMmr = Window.partitionBy(col("query_id"))
        .orderBy((col("rel") * 0.5 - col("max_sim") * 0.5).desc,
          col("neighbor_id").asc)
      val pick = updated.withColumn("rn", row_number().over(wMmr))
        .filter(col("rn") === 1)
        .select(col("query_id"), col("neighbor_id"), col("rel"),
          col("max_sim"), lit(t).as("pick"))
      selected = selected.unionByName(pick)
      lastPick = pick.select(col("query_id"), col("neighbor_id").as("other_id"))
      state = updated
    }
    selected.withColumn("mmr",
      round(col("rel") * 0.5 - col("max_sim") * 0.5, 6))
  }

  /** Deterministic pseudo-random hyperplane component for (dim i, plane j):
    * integer-seeded, portable across engines. Values in [-0.5, 0.5).
    *
    * Family: m = ((i+1)·C1 mod P) · ((j+1)·C2 mod P) mod P, r = (m² mod P)
    * mod 1000 − 500, with P = 1000003 prime. The multiplicative i×j mix +
    * squaring decorrelates PLANES from each other — the previous additive
    * LCG (`(i+1)·C1 + (j+1)·C2 mod 1000`) shifted every component by the
    * same constant between consecutive planes, making sign bits strongly
    * correlated: at 1M vectors × 16 dims × 16 planes it occupied only 158
    * of 65536 buckets (max bucket 323k — quadratic blowup); this family
    * occupies ~41k with max ~1.7k. All intermediates < 2^63 on both
    * engines (no BIGINT overflow in the DuckDB mirror).
    */
  def planeComponent(i: Column, j: Int): Column = {
    val m = (((i + 1) * lit(2654435761L)) % 1000003L) *
      lit((40503L * (j + 1)) % 1000003L) % 1000003L
    ((m * m) % 1000003L % 1000L - lit(500L)).cast("double") / 1000.0
  }

  /** Hyperplane count targeting a bounded expected bucket occupancy: the
    * smallest p with 2^p ≥ ⌈n / targetOccupancy⌉, clamped to [minPlanes,
    * maxPlanes]. Pure integer math (no log2 doubles) so the DuckDB oracle's
    * `LENGTH(bin(m-1))` mirror is bit-exact at power-of-two boundaries.
    * Scaling planes with log2(n) keeps per-bucket pair work ~targetOccupancy²
    * (total ~n·targetOccupancy — linear), where any fixed plane count would
    * go quadratic at scale; the per-band recall loss is repaid by
    * [[autoBands]].
    *
    * Occupancy default: candidate volume per band is ~n·occ/2 and the band
    * count needed for fixed recall shrinks only slowly as occ grows (b ∝
    * occ^-0.15 at the 0.95 design point), so TOTAL candidate work scales
    * like occ^0.85 — smaller occupancy is strictly cheaper until buckets
    * go singleton. occ=4 (vs the earlier 16) cuts the 1M-vector all-pairs
    * candidate volume ~3× at the same ≥0.9 recall (18 planes × 15 bands vs
    * 16 × 12), while staying under the autoBands cap up to ~1M vectors.
    *
    * Dimensionality PRECONDITION: the ~targetOccupancy² bucket-pair model
    * assumes the embeddings span at least ~planes dimensions. Sign bits of
    * a d-dim direction sphere stop decorrelating past d planes, and at low
    * d the pair-angle distribution is wide, so E[(1−θ/π)^planes] — the
    * bucket collision rate — stays heavy regardless of the plane count:
    * measured 2063 candidates/vec (22× the occ·bands bound, recall intact)
    * on 16-dim vectors at 10M, vs in-bound on 64-dim at the same n
    * (ScaleBench `big`). Sign-LSH is the linear-cost dedup for n ≲ occ·2^d;
    * low-dim corpora past that knee belong on [[semanticDedup]]/IVF.
    */
  def autoPlanes(n: Long, targetOccupancy: Int = 4,
      minPlanes: Int = 4, maxPlanes: Int = 32): Int = {
    val m = (n + targetOccupancy - 1) / targetOccupancy
    val p = if (m <= 1) 0 else 64 - java.lang.Long.numberOfLeadingZeros(m - 1)
    math.min(maxPlanes, math.max(minPlanes, p))
  }

  /** Plane-index stride between bands: band B draws its hyperplanes from
    * global indices `B*BandStride + (0 until planes)`. The stride equals
    * maxPlanes so bands never share a plane regardless of the auto-scaled
    * per-band plane count — and stays STATIC, so the DuckDB oracle can
    * derive each plane's coefficients from (band, slot) without knowing the
    * runtime plane count.
    */
  val BandStride = 32

  /** Band count holding recall at `targetRecall` for pairs at the
    * `designCos` design point, given `planes` sign bits per band: a true
    * pair agrees on one plane with probability s = 1 − θ/π, on a whole band
    * with s^planes, and is recovered iff SOME band fully agrees —
    * b = ⌈ln(1−R) / ln(1−s^planes)⌉. As [[autoPlanes]] grows with the
    * corpus, per-band recall shrinks geometrically; scaling bands like this
    * keeps end-to-end recall flat at linear (b×) cost. Capped at `maxBands`
    * (= 64: holds the 0.9-recall target through planes ≤ 31, i.e. corpora
    * to ~occ·2^31 ≈ 8.6B vectors at occupancy 4 — the 10⁹-vector story;
    * beyond that raise the cap again, cost is linear in it. The old 32
    * cap bound past planes 24 / ~67M vectors; a 10M-vector corpus runs at
    * planes 22 × 23 bands, under either cap — ScaleBench `big` gates
    * recall ≥ 0.9 and linear candidate volume there).
    *
    * Cross-engine note: evaluated on the DRIVER and mirrored into the
    * DuckDB oracle as a static CASE table over planes∈[4,32], so no
    * transcendental math ever runs inside either engine's query. Band
    * families never collide regardless of the band count: band B draws
    * planes `B·BandStride + (0 until planes)` and the stride equals
    * maxPlanes, not maxBands.
    */
  def autoBands(planes: Int, designCos: Double = 0.95, targetRecall: Double = 0.9,
      maxBands: Int = 64): Int = {
    val s = 1.0 - math.acos(designCos) / math.Pi
    val pBand = math.pow(s, planes)
    if (pBand >= targetRecall) 1
    else math.min(maxBands,
      math.max(1, math.ceil(math.log1p(-targetRecall) / math.log1p(-pBand)).toInt))
  }

  /** Sign-bit LSH bucket id from `planes` hyperplanes starting at global
    * plane index `offset` — the codegen'd [[graft.sql.RpBucketExpression]]
    * (one compiled pass over the vector for ALL planes; the interpreted
    * higher-order spelling costs 4 lambda evaluations per element per plane
    * and grows with the auto-scaled plane count). [[rpBucketFold]] keeps
    * the Catalyst spelling as the bit-identity witness.
    */
  def rpBucket(vec: Column, planes: Int = 8, offset: Int = 0): Column =
    call_function("rp_bucket", vec, lit(planes), lit(offset)).as("bucket")

  /** Reference spelling of [[rpBucket]] via Catalyst higher-order folds —
    * slow, used by specs to prove the native expression bit-identical. */
  private[graft] def rpBucketFold(vec: Column, planes: Int, offset: Int = 0): Column = {
    val v = transform(vec, x => x.cast("double"))
    (0 until planes).map { j =>
      val proj = aggregate(
        zip_with(v, transform(sequence(lit(0), size(vec) - 1), i => planeComponent(i, offset + j)),
          (x, r) => x * r),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _).as("bucket")
  }

  /** (id, band, bucket) rows: each vector lands in `bands` buckets, one per
    * independent hyperplane family. The explode multiplies only (id, band,
    * bucket) triples — vectors do NOT ride through the band shuffle.
    */
  private[graft] def bandBuckets(corpus: DataFrame, planes: Int, bands: Int,
      idCol: String, vecCol: String): DataFrame = {
    val entries = (0 until bands).map { b =>
      struct(lit(b).as("band"), rpBucket(col(vecCol), planes, b * BandStride).as("bucket"))
    }
    corpus.select(col(idCol), explode(array(entries: _*)).as("e"))
      .select(col(idCol), col("e.band"), col("e.bucket"))
  }

  /** Distinct undirected candidate pairs (a < b) colliding in ANY band —
    * the banded-LSH recall fix: a true near-pair only needs ONE band's
    * planes to all agree, so recall stays flat as [[autoPlanes]] grows with
    * the corpus, where the old single-band scheme lost recall geometrically
    * (at 1M vectors / 16 planes a cosine≈0.95 pair survived with p≈0.2).
    * Work stays linear: per-band occupancy is bounded by [[autoPlanes]],
    * and the id-only band join keeps shuffle volume at bands×(id,band,
    * bucket) triples, never bands× vectors.
    */
  private[graft] def bandedCandidates(corpus: DataFrame, planes: Int, bands: Int,
      idCol: String, vecCol: String, dedup: Boolean = true): DataFrame = {
    val bb = bandBuckets(corpus, planes, bands, idCol, vecCol)
    val l = bb.select(col(idCol).as("doc_a"), col("band"), col("bucket"))
    val r = bb.select(col(idCol).as("doc_b"), col("band"), col("bucket"))
    val pairs = l.join(r, Seq("band", "bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
    if (dedup) pairs.distinct() else pairs
  }

  /** Embedding-cosine near-duplicate pairs: all (a < b) pairs colliding in
    * any LSH band with cosine ≥ threshold — the O(n²)-free dedup path for
    * embedding spaces (candidates only ever meet inside band buckets).
    * `planes = None` (the default) sizes each band's bucket space from the
    * corpus count via [[autoPlanes]] (pass `n` to skip the count job when
    * the row count is already known); `bands = None` sizes the band count
    * via [[autoBands]] so recall holds at the 0.95-cosine design point.
    * Candidates are deduped BEFORE vectors are re-joined, so each surviving
    * pair is scored exactly once however many bands it collided in.
    */
  def nearDupPairs(corpus: DataFrame, threshold: Double, planes: Option[Int] = None,
      bands: Option[Int] = None, n: Option[Long] = None,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    val np = planes.getOrElse(autoPlanes(n.getOrElse(corpus.count())))
    val nb = bands.getOrElse(autoBands(np))
    val par = spark.sparkContext.defaultParallelism
    val cp = graft.core.Plans.ensureMinPartitions(corpus, par)
    // codegen'd dot_f32 keeps the pair scoring on Tungsten rows (see rpTopK)
    scorePairs(cp, bandedCandidates(cp, np, nb, idCol, vecCol), idCol, vecCol)
      .filter(col("cos_sim") >= threshold)
  }

  /** Exact cosine for each candidate (doc_a, doc_b) pair: vectors and norms
    * re-join the (deduped) candidate set by id — two hash joins whose build
    * side is the bounded candidate list, never a vectors×bands blow-up.
    * Accumulation is left-to-right double via the codegen'd dot_f32 —
    * bit-identical to the DuckDB oracle's list_reduce.
    */
  private def scorePairs(corpus: DataFrame, cand: DataFrame,
      idCol: String, vecCol: String): DataFrame = {
    val vecs = corpus.select(col(idCol), col(vecCol), sqrt(norm2(col(vecCol))).as("nrm"))
    cand
      .join(vecs.select(col(idCol).as("doc_a"), col(vecCol).as("q_vec"),
        col("nrm").as("q_nrm")), "doc_a")
      .join(vecs.select(col(idCol).as("doc_b"), col(vecCol).as("c_vec"),
        col("nrm").as("c_nrm")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        round(dot(col("q_vec"), col("c_vec")) / (col("q_nrm") * col("c_nrm")), 6).as("cos_sim"))
  }

  /** Approximate all-pairs top-k neighbor via banded LSH. Candidates come
    * from [[bandedCandidates]] (union over bands, deduped, so recall holds
    * as planes scale — see autoBands); each undirected pair is scored ONCE
    * (cosine is symmetric) and then mirrored into both directions before
    * the per-query ranking.
    *
    * Coverage note: a vector that collides with nothing in ANY band emits
    * no rows — LSH surfaces near neighbors at the autoBands design point
    * (cosine ≈ 0.95), not an arbitrary nearest vector. For guaranteed
    * coverage of isolated vectors use [[cosineTopK]] (exact) or
    * [[ivfTopK]] (every vector belongs to a probed list).
    */
  def rpTopK(corpus: DataFrame, k: Int, planes: Option[Int] = None,
      bands: Option[Int] = None, n: Option[Long] = None,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    val np = planes.getOrElse(autoPlanes(n.getOrElse(corpus.count())))
    val nb = bands.getOrElse(autoBands(np))
    val par = spark.sparkContext.defaultParallelism
    val cp = graft.core.Plans.ensureMinPartitions(corpus, par)
    // k == 1: skip the candidate dedup shuffle — a pair colliding in
    // several bands just yields identical scored rows, and identical rows
    // cannot change a top-1 ranking (ties order by neighbor_id). k > 1
    // needs the dedup or one neighbor could occupy several ranks.
    val scored = scorePairs(cp,
      bandedCandidates(cp, np, nb, idCol, vecCol, dedup = k > 1), idCol, vecCol)
    // mirror each undirected pair into both directions via ONE Generate —
    // a self-union here would duplicate the whole candidate+scoring
    // subplan (union branches don't share non-exchange work)
    val directed = scored.select(explode(array(
        struct(col("doc_a").as("query_id"), col("doc_b").as("neighbor_id")),
        struct(col("doc_b").as("query_id"), col("doc_a").as("neighbor_id")))).as("d"),
        col("cos_sim"))
      .select(col("d.query_id"), col("d.neighbor_id"), col("cos_sim"))
    // rank via row_number, NOT a max-struct groupBy: Spark 4 plans the
    // rank<=k filter as WindowGroupLimit with a map-side partial pass (each
    // partition keeps only k rows per group before the exchange), which
    // measured 5× faster than the hash aggregation at the 1M-vector
    // ScaleBench target — a 1M-group hash map per task thrashes where the
    // sort-based group limit streams.
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    directed.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** One-or-more Lloyd (k-means) refinement passes over the IVF coarse
    * quantizer, entirely as DataFrame ops:
    *  - assignment is map-side (centroids broadcast, L2 argmin with
    *    deterministic cent_id tiebreak);
    *  - the update is `posexplode` → `groupBy(cent_id, dim).avg` →
    *    re-assembled vectors — partial-agg friendly, one shuffle whose key
    *    count is centroids × dims (tiny), so it scales to any corpus size;
    *  - empty clusters keep their previous centroid (standard Lloyd fix).
    * At 100 TB this is exactly how you'd train the quantizer in-engine
    * before [[ivfTopK]]; a few passes on a sample suffice in practice.
    */
  def lloydRefine(corpus: DataFrame, centroids: DataFrame, iters: Int = 1,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(iters >= 0, "iters must be >= 0")
    (1 to iters).foldLeft(centroids) { (cents, _) =>
      val c = cents.select(col("cent_id"), transform(col("cent_vec"),
        x => x.cast("double")).as("c_vec"))
      // L2 argmin: ||v - c||² ordered by (dist², cent_id); norm2(v) is
      // constant per row so dist² ≡ norm2(c) − 2·dot(v,c) up to ordering
      val scored = corpus.select(col(idCol), col(vecCol))
        .crossJoin(broadcast(c))
        .select(col(idCol), col(vecCol), col("cent_id"),
          (norm2(col("c_vec")) - lit(2.0) * dot(col(vecCol), col("c_vec"))).as("d2"))
      val w = Window.partitionBy(col(idCol)).orderBy(col("d2").asc, col("cent_id").asc)
      val assigned = scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      val updated = assigned
        .select(col("cent_id"), posexplode(col(vecCol)).as(Seq("dim", "x")))
        .groupBy(col("cent_id"), col("dim"))
        .agg(avg(col("x").cast("double")).as("m"))
        .groupBy(col("cent_id"))
        .agg(transform(array_sort(collect_list(struct(col("dim"), col("m")))),
          e => e.getField("m")).as("cent_vec"))
      // empty clusters: carry the previous centroid forward
      cents.select(col("cent_id"), transform(col("cent_vec"), x => x.cast("double")).as("prev"))
        .join(updated, Seq("cent_id"), "left")
        .select(col("cent_id"), coalesce(col("cent_vec"), col("prev")).as("cent_vec"))
    }
  }

  /** SemDeDup-style SEMANTIC deduplication (Abbas et al. 2023): cluster the
    * corpus with the IVF coarse quantizer, then mark as duplicates the
    * later-id side of any within-cluster pair whose exact cosine meets
    * `threshold` — the keep-first-by-id rule, no connected components.
    *
    * Scale anatomy (the reason SemDeDup exists): clustering first turns
    * the O(n²) all-pairs problem into per-cluster problems of size
    * ~(n/numCents)². The centroid table is broadcast and BOUNDED at
    * `numCents` rows, assignment is map-side (no corpus shuffle), and the
    * only shuffle is the self-join's hash partitioning on cent_id — at
    * 100 TB, numCents grows with the corpus to hold cluster sizes flat.
    * Returns every corpus row: (id, cent_id, max_prior_cos, is_semantic_dup,
    * keep), where max_prior_cos is the best cosine against EARLIER-id
    * cluster members (NULL for each cluster's first member).
    */
  def semanticDedup(corpus: DataFrame, threshold: Double, numCents: Int = 64,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cents = corpus
      .select(col(idCol).as("cent_id"), col(vecCol).as("cent_vec"))
      .orderBy(md5(col("cent_id").cast("string")), col("cent_id"))
      .limit(numCents)
      .select(col("cent_id"), col("cent_vec"),
        sqrt(norm2(col("cent_vec"))).as("cent_nrm"))
    // the assignment is read by THREE plan branches (pair left, pair right,
    // final decision) — persist so the numCents-way scoring pass runs once,
    // the standard SemDeDup shape (materialize assignments, then pairwise)
    val assigned = corpus
      .select(col(idCol), col(vecCol).as("v"), sqrt(norm2(col(vecCol))).as("v_nrm"))
      .crossJoin(broadcast(cents))
      .select(col(idCol), col("v"), col("v_nrm"), col("cent_id"),
        (dot(col("v"), col("cent_vec")) / (col("v_nrm") * col("cent_nrm"))).as("c_cos"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col(idCol)).orderBy(col("c_cos").desc, col("cent_id").asc)))
      .filter(col("rn") === 1).drop("rn", "c_cos")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // query-scoped: released by CacheLife.afterQuery once the consuming
    // query's output is materialized (the returned frame references it)
    graft.core.CacheLife.scoped(assigned)
    val a = assigned.select(col("cent_id"), col(idCol).as("id_a"),
      col("v").as("va"), col("v_nrm").as("na"))
    val b = assigned.select(col("cent_id"), col(idCol).as("id_b"),
      col("v").as("vb"), col("v_nrm").as("nb"))
    // within-cluster pairs: both sides corpus-sized → shuffled hash join,
    // never a runtime broadcast (same rationale as jaccardFromHashes)
    val prior = a.hint("shuffle_hash").join(b.hint("shuffle_hash"), Seq("cent_id"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_b"),
        round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 6).as("c"))
      .groupBy(col("id_b")).agg(max(col("c")).as("max_prior_cos"))
    assigned.select(col(idCol), col("cent_id"))
      .join(prior.withColumnRenamed("id_b", idCol), Seq(idCol), "left")
      .select(col(idCol), col("cent_id"), col("max_prior_cos"),
        coalesce(col("max_prior_cos") >= threshold, lit(false)).as("is_semantic_dup"))
      .withColumn("keep", !col("is_semantic_dup"))
  }

  /** k-means|| initialization (Bahmani et al., VLDB 2012) — the SCALABLE
    * seeding for [[lloydRefine]]/[[ivfTopK]]'s quantizer: where k-means++
    * needs k strictly sequential passes, k-means|| oversamples ~`l`
    * points per round for O(log n)≈`rounds` rounds, each point kept with
    * probability `l·d²(x,C)/φ(C)` — so far-from-center regions are seeded
    * preferentially — then reduces the ≤ `1 + rounds·l` candidates to k
    * by weighted k-means++ on the driver (bounded like the LUT collects).
    *
    * Per round: ONE map-side d² pass against the broadcast candidate set
    * and one scalar aggregate (φ); the sampling coin is the seedless md5
    * hash ([[TextOps.hashUnit]] keyed by id×round), so the init is fully
    * deterministic and cluster-order-independent. Total cost: `rounds`
    * corpus scans, zero corpus shuffles.
    */
  def kmeansParallelInit(corpus: DataFrame, k: Int, rounds: Int = 5,
      oversample: Int = 0, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val l = if (oversample > 0) oversample else 2 * k
    val vecs = corpus.select(col(idCol).as("__id"),
      transform(col(vecCol), x => x.cast("double")).as("__v"))
      .as[(Long, Seq[Double])]
    def d2To(cents: Array[Array[Double]], v: Seq[Double]): Double = {
      val a = v.toArray
      var best = Double.MaxValue
      var j = 0
      while (j < cents.length) {
        val c = cents(j)
        var s = 0.0; var i = 0
        while (i < a.length) { val d = a(i) - c(i); s += d * d; i += 1 }
        if (s < best) best = s
        j += 1
      }
      best
    }
    // deterministic first center: minimum md5(id)
    val first = vecs.toDF("__id", "__v")
      .orderBy(md5(col("__id").cast("string")), col("__id")).limit(1)
      .collect()(0)
    var cand: Seq[(Long, Seq[Double])] =
      Seq((first.getLong(0), first.getSeq[Double](1)))
    for (r <- 1 to rounds) {
      // broadcast-kernel d² pass (the Inversion mapPartitions discipline —
      // a per-round column fold over ~rounds·l centroids would blow codegen)
      val bc = spark.sparkContext.broadcast(cand.map(_._2.toArray).toArray)
      val scored = vecs.mapPartitions(it =>
          it.map { case (id, v) => (id, v, d2To(bc.value, v)) })
        .toDF("__id", "__v", "__d2")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val phi = scored.agg(sum(col("__d2"))).head().getDouble(0)
      if (phi > 0) {
        // BOUND: kmeans|| oversample — E[rows] = l per round (≲ 2·l w.h.p.), never corpus-sized
        val picked = scored
          .where(TextOps.hashUnit(concat_ws("#", col("__id"), lit(r))) <
            lit(l.toDouble) * col("__d2") / lit(phi))
          .select(col("__id"), col("__v")).collect()
          .map(row => (row.getLong(0), row.getSeq[Double](1)))
        cand = (cand ++ picked).distinctBy(_._1)
      }
      scored.unpersist(false)
    }
    // weight candidates by their attracted corpus mass, then weighted
    // k-means++ down to k on the driver (candidates are bounded)
    val bcW = spark.sparkContext.broadcast(
      cand.map { case (id, v) => (id, v.toArray) }.toArray)
    val weights = vecs.mapPartitions { it =>
        it.map { case (_, v) =>
          val a = v.toArray
          var bestId = Long.MaxValue; var best = Double.MaxValue
          bcW.value.foreach { case (id, c) =>
            var s = 0.0; var i = 0
            while (i < a.length) { val d = a(i) - c(i); s += d * d; i += 1 }
            if (s < best || (s == best && id < bestId)) { best = s; bestId = id }
          }
          bestId
        }
      // BOUND: one (centroid, weight) row per kmeans|| candidate — ≤ k + l·rounds rows
      }.toDF("__c")
      .groupBy("__c").agg(count(lit(1)).as("__w"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pts = cand.map { case (id, v) => (id, v.toArray, weights.getOrElse(id, 0L).toDouble) }
    // weighted k-means++ (deterministic: md5-unit coin per step)
    def dist2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val chosen = scala.collection.mutable.ArrayBuffer[(Long, Array[Double])]()
    chosen += (pts.maxBy(p => (p._3, p._1)) match { case (id, v, _) => (id, v) })
    while (chosen.size < math.min(k, pts.size)) {
      val costs = pts.filterNot(p => chosen.exists(_._1 == p._1)).map { case (id, v, w) =>
        (id, v, w * chosen.map(c => dist2(v, c._2)).min)
      }
      val total = costs.map(_._3).sum
      val next =
        if (total <= 0) costs.maxBy(p => (p._3, p._1))
        else {
          // deterministic "spin": md5-unit of the running step index
          val u = (BigInt(java.security.MessageDigest.getInstance("MD5")
            .digest(s"kmpp#${chosen.size}".getBytes("UTF-8")).take(8)
            .map("%02x".format(_)).mkString.take(15), 16).toDouble / math.pow(2, 60))
          val target = u * total
          var acc = 0.0
          costs.sortBy(_._1).find { p => acc += p._3; acc >= target }
            .getOrElse(costs.maxBy(p => (p._3, p._1)))
        }
      chosen += ((next._1, next._2))
    }
    chosen.toSeq.zipWithIndex
      .map { case ((_, v), i) => (i.toLong, v.toSeq) }
      .toDF("cent_id", "cent_vec")
  }

  /** IVF-flat approximate nearest neighbor — the third ANN tier.
    *
    * Coarse quantizer: a FIXED-size centroid set — the `numCents` corpus
    * vectors first in deterministic md5(id) order (a cross-engine-portable
    * uniform sample; Spark plans it as TakeOrderedAndProject, a per-partition
    * partial top-K, never a full sort). `lloydIters > 0` refines the sample
    * with [[lloydRefine]] — the offline-k-means training path (not used by
    * the oracle-gated query: centroid averaging sums floats in shuffle
    * order, which is not bit-reproducible). Each corpus vector joins its
    * nearest centroid's inverted list; a query probes its `nprobe` nearest
    * centroids and brute-forces only those lists.
    *
    * Scale anatomy: the centroid table is a broadcast BOUNDED at `numCents`
    * rows regardless of corpus size (assignment is map-side, no corpus
    * shuffle; per-vector assignment cost is numCents dots, constant), the
    * inverted lists ARE the shuffle partitioning (one exchange on cent_id),
    * and per-query candidate work is ~(n/numCents)·nprobe instead of the
    * full corpus — the classic IVF recall/cost dial. All cosines are
    * left-to-right double folds → bit-identical to the DuckDB oracle, so
    * nearest-centroid ranking needs no rounding guard.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int, numCents: Int = 64,
      nprobe: Int = 2, lloydIters: Int = 0,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val sampled = corpus
      .select(col(idCol).as("cent_id"), col(vecCol).as("cent_vec"))
      .orderBy(md5(col("cent_id").cast("string")), col("cent_id"))
      .limit(numCents)
    val trained =
      if (lloydIters <= 0) sampled
      else lloydRefine(corpus, sampled, lloydIters, idCol, vecCol)
        .select(col("cent_id"), transform(col("cent_vec"), x => x.cast("float")).as("cent_vec"))
    val cents = trained.select(col("cent_id"), col("cent_vec"),
      sqrt(norm2(col("cent_vec"))).as("cent_nrm"))

    // nearest `n` centroids of each vector in `df` (by exact cosine,
    // cent_id tiebreak); assignment is a broadcast nested loop — map-side
    def nearestCents(df: DataFrame, outId: String, n: Int): DataFrame = {
      val scored = df.select(col(idCol).as(outId), col(vecCol).as("v"),
          sqrt(norm2(col(vecCol))).as("v_nrm"))
        .crossJoin(broadcast(cents))
        .select(col(outId), col("v"), col("v_nrm"), col("cent_id"),
          (dot(col("v"), col("cent_vec")) / (col("v_nrm") * col("cent_nrm"))).as("c_cos"))
      val w = Window.partitionBy(col(outId)).orderBy(col("c_cos").desc, col("cent_id").asc)
      scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= n)
        .drop("rn", "c_cos")
    }

    val lists = nearestCents(corpus, "neighbor_id", 1)
      .select(col("cent_id"), col("neighbor_id"), col("v").as("c_vec"), col("v_nrm").as("c_nrm"))
    val probes = nearestCents(queries, "query_id", nprobe)
      .select(col("cent_id"), col("query_id"), col("v").as("q_vec"), col("v_nrm").as("q_nrm"))

    val scored = probes.join(lists, Seq("cent_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(dot(col("q_vec"), col("c_vec")) / (col("q_nrm") * col("c_nrm")), 6).as("cos_sim"))
    // no dedup needed: every corpus vector lives in exactly one inverted
    // list, so a (query, neighbor) pair meets at most once across probes
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Squared L2 between one SUBSPACE of a full vector and a subDim-length
    * codeword: Σ_{i=1..subDim} (a[sub·subDim+i] − w[i])², elements widened
    * to double BEFORE the subtraction — bit-identical to the oracle's
    * double fold (the oracle indexes the full sampled vector at the same
    * offset; the elements are the same). Backed by the codegen'd
    * [[graft.sql.L2SubExpression]] — the PQ encode path evaluates
    * m·codebookSize of these per vector, where the interpreted fold
    * spelling ([[l2sqSubFold]], kept as the spec's bit-equality mirror)
    * pays 4 lambda interpretations per element. */
  private def l2sqSub(a: Column, w: Column, sub: Column, subDim: Int): Column =
    call_function("l2sub_f32", a, w, sub.cast("int"))

  /** Reference fold spelling of [[l2sqSub]] — SqlExtensionsSpec asserts
    * bit-equality with the native expression. */
  private[graft] def l2sqSubFold(a: Column, w: Column, sub: Column, subDim: Int): Column =
    aggregate(sequence(lit(1), lit(subDim)), lit(0.0), (acc, i) => {
      val idx = (sub * subDim + i).cast("int")
      val d = element_at(a, idx).cast("double") - element_at(w, i).cast("double")
      acc + d * d
    })

  /** Per-subspace Lloyd training of a FLAT PQ codebook
    * (`cb[(s·k + c)·subDim + i]`): assignment is the zero-shuffle codegen'd
    * `pq_encode` over the current codebook literal; the update is a
    * per-(sub, code, dim) average — partial-aggregable, key count bounded
    * at m·k·subDim, so one light shuffle per pass at any corpus size. The
    * updated means (a broadcast-scale result by construction) overlay the
    * previous codebook on the driver; empty cells keep their codeword.
    * NOT bit-reproducible across engines (averaging in shuffle order) —
    * the quality path, not the oracle path, like [[ivfTopK]]'s
    * `lloydIters`.
    */
  private def pqLloyd(corpus: DataFrame, cb0: Array[Double], iters: Int, m: Int,
      codebookSize: Int, subDim: Int, vecCol: String): Array[Double] =
    (1 to iters).foldLeft(cb0) { (cb, _) =>
      val assigned = corpus.select(col(vecCol).as("v"),
          posexplode(call_function("pq_encode", col(vecCol),
            typedLit(cb.toSeq), lit(m))).as(Seq("sub", "code")))
      val updates = assigned
        .select(col("sub"), col("code"),
          posexplode(transform(sequence(lit(1), lit(subDim)), i =>
            element_at(col("v"), (col("sub") * subDim + i).cast("int"))
              .cast("double"))).as(Seq("i", "x")))
        // BOUND: ≤ m·codebookSize·subDim rows — the PQ codebook grid, never corpus-sized
        .groupBy(col("sub"), col("code"), col("i"))
        .agg(avg(col("x")).as("mn"))
        .collect()
      val next = cb.clone()
      updates.foreach { r =>
        next((r.getInt(0) * codebookSize + r.getInt(1)) * subDim + r.getInt(2)) =
          r.getDouble(3)
      }
      next
    }

  /** Product-quantization ANN with asymmetric distance computation (ADC) —
    * the fourth ANN tier (Jégou et al., "Product Quantization for Nearest
    * Neighbor Search", TPAMI 2011). The vector space splits into `m`
    * subspaces; each subspace gets a `codebookSize`-entry codebook (seeded
    * from the same deterministic md5-order corpus sample as [[ivfTopK]]'s
    * coarse quantizer, restricted to the subspace; `lloydIters` per-subspace
    * k-means passes refine it); every corpus vector is encoded as `m` small
    * codes; a query scores a vector by summing its per-subspace distances
    * to the vector's codewords — m table lookups per pair instead of a
    * dim-length dot product. `rerank > 0` adds the production IVFADC+R
    * step: the ADC top-`rerank` shortlist is re-scored with EXACT distances
    * (shortlist broadcast, corpus never shuffles) before the final top-k.
    *
    * Scale anatomy (why PQ is the 100 TB memory answer):
    *  - codes are m small ints per vector vs 4·dim bytes of floats — the
    *    scan set shrinks ~16× at (dim 64, m 16);
    *  - encoding is ZERO-shuffle: one codegen'd `pq_encode` call per row
    *    over the codebook literal (bounded at m·codebookSize·subDim
    *    doubles) — no codebook join, no m·k-row explosion per vector;
    *  - scoring is map-side: codes × broadcast per-query LUT (an audited
    *    bounded BNLJ, the [[cosineTopK]] shape), the ADC sum is an O(m)
    *    fold, and the top-k window prunes map-side (WindowGroupLimit)
    *    before its single exchange.
    *
    * Output (rerank = 0): (query_id, neighbor_id, d2_adc, rank) — rank
    * ascending by ADC distance, ties to the smaller neighbor id, self
    * excluded; with `lloydIters = 0` every fold is left-to-right double —
    * bit-reproducible vs the DuckDB oracle. With rerank > 0 the distance
    * column is `d2_exact` and ranking is by exact squared L2.
    */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int, m: Int = 16,
      codebookSize: Int = 16, lloydIters: Int = 0, rerank: Int = 0,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val dim = corpus.select(size(col(vecCol))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val subDim = dim / m

    // codebook seed: the first `codebookSize` corpus vectors in md5(id)
    // order (a few-KB collect, bounded by construction — the PQ analogue
    // of collecting IVF's centroid sample), flattened driver-side to the
    // (s·k + c)·subDim layout pq_encode expects
    val sampleRows = corpus.select(col(idCol), col(vecCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol)).limit(codebookSize)
      .collect()
    val sampleVecs = sampleRows.map(_.getSeq[Any](1).map(
      _.asInstanceOf[Number].doubleValue()).toArray)
    require(sampleVecs.length >= codebookSize,
      s"corpus has ${sampleVecs.length} vectors, need >= $codebookSize for the codebook seed")
    val seedFlat = Array.tabulate(m * codebookSize * subDim) { flat =>
      val i = flat % subDim
      val c = flat / subDim % codebookSize
      val s = flat / subDim / codebookSize
      sampleVecs(c)(s * subDim + i)
    }
    val cbFlat =
      if (lloydIters <= 0) seedFlat
      else pqLloyd(corpus, seedFlat, lloydIters, m, codebookSize, subDim, vecCol)

    // encode: one codegen'd pq_encode per row — zero shuffle, no join
    val encoded = corpus.select(col(idCol).as("neighbor_id"),
      call_function("pq_encode", col(vecCol), typedLit(cbFlat.toSeq), lit(m))
        .as("codes"))

    // (sub, code, w) rows of the final codebook, for the per-query LUT join
    val cw = (for (s <- 0 until m; c <- 0 until codebookSize) yield
        (s, c, cbFlat.slice((s * codebookSize + c) * subDim,
          (s * codebookSize + c + 1) * subDim).toSeq))
      .toDF("sub", "code", "w")

    // per-query ADC lookup table: d2(query subspace, codeword) for every
    // (sub, code), flattened in (sub, code) order — queries are few, the
    // LUT is m·codebookSize doubles per query
    val lut = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .crossJoin(broadcast(cw))
      .select(col("query_id"), col("sub"), col("code"),
        l2sqSub(col("qv"), col("w"), col("sub"), subDim).as("d2"))
      .groupBy(col("query_id"))
      .agg(transform(
        array_sort(collect_list(struct(col("sub"), col("code"), col("d2")))),
        s => s("d2")).as("lut"))

    val scored = encoded
      .join(broadcast(lut), col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(aggregate(sequence(lit(0), lit(m - 1)), lit(0.0), (acc, s) =>
          acc + element_at(col("lut"),
            (s * codebookSize + element_at(col("codes"), s + 1) + 1).cast("int"))),
          6).as("d2_adc"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("d2_adc").asc, col("neighbor_id").asc)
    val adcRanked = scored.withColumn("rank", row_number().over(w))
    if (rerank <= 0) adcRanked.filter(col("rank") <= k)
    else {
      // IVFADC+R: exact distances on the broadcast shortlist only; the
      // corpus side stays map-side (its vectors are re-read by the join,
      // never shuffled)
      val shortlist = adcRanked.filter(col("rank") <= rerank)
        .select(col("query_id"), col("neighbor_id"))
        .join(broadcast(queries.select(col(idCol).as("query_id"),
          col(vecCol).as("qv"))), "query_id")
      val exact = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
        .join(broadcast(shortlist), "neighbor_id")
        .select(col("query_id"), col("neighbor_id"),
          round(norm2(col("qv")) + norm2(col("cv"))
            - lit(2.0) * dot(col("qv"), col("cv")), 6).as("d2_exact"))
      val w2 = Window.partitionBy(col("query_id"))
        .orderBy(col("d2_exact").asc, col("neighbor_id").asc)
      exact.withColumn("rank", row_number().over(w2)).filter(col("rank") <= k)
    }
  }

  /** TRUE IVFADC — the production-composed fifth ANN tier (Jégou et al.
    * TPAMI 2011 §IV): [[ivfTopK]]'s inverted lists × [[pqTopK]]'s codes.
    * Corpus vectors assign to their nearest coarse centroid and
    * PQ-encode their RESIDUAL (v − centroid) against a shared residual
    * codebook; a query probes its `nprobe` nearest lists, builds one ADC
    * lookup table PER PROBED LIST (distances from the query's residual in
    * that list's frame), and ADC-scores ONLY those lists' codes.
    * `rerank > 0` re-scores the ADC shortlist with exact distances
    * (IVFADC+R) — the full 100 TB memory+compute answer: the scan set is
    * m bytes/vector, the candidate set is nprobe/numCents of the corpus,
    * and the exact pass touches `rerank` vectors per query.
    *
    * Scale anatomy:
    *  - coarse assignment is the codegen'd `pq_encode` with m=1 over the
    *    flat centroid literal (bounded at numCents·dim doubles) — ZERO
    *    shuffle, no window, unlike a join-against-centroids spelling;
    *  - residuals are one broadcast join (numCents rows) + a per-row
    *    zip_with; codes are one `pq_encode` per row — zero shuffle;
    *  - per-query LUTs are (queries × nprobe × m·codebookSize) rows —
    *    broadcast-scale by construction; scoring joins them to the codes
    *    ON cent_rank, so each code row meets only the queries probing its
    *    list; the top-k window prunes map-side (WindowGroupLimit).
    *
    * With `lloydIters = 0` every fold is a left-to-right double —
    * bit-reproducible vs the DuckDB oracle (q76). `lloydIters > 0`
    * refines the RESIDUAL codebook per subspace ([[pqLloyd]] on the
    * residual frame) — the quality path, spec/ScaleBench-gated.
    * Output: (query_id, neighbor_id, d2_adc | d2_exact, rank).
    */
  def ivfadcTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      numCents: Int = 16, nprobe: Int = 2, m: Int = 16, codebookSize: Int = 16,
      lloydIters: Int = 0, rerank: Int = 0,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val dim = corpus.select(size(col(vecCol))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val subDim = dim / m

    // coarse centroids: md5-order sample (the cross-engine-portable uniform
    // sample every quantizer here uses), collected — bounded at
    // numCents·dim doubles, the IVF-centroid analogue of the PQ-seed collect
    val centRows = corpus.select(col(vecCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol)).limit(numCents)
      .collect()
      .map(_.getSeq[Any](0).map(_.asInstanceOf[Number].doubleValue()).toArray)
    require(centRows.length >= numCents,
      s"corpus has ${centRows.length} vectors, need >= $numCents coarse centroids")
    val centFlat = centRows.flatten
    val centsDf = broadcast(
      centRows.zipWithIndex.map { case (cv, i) => (i, cv.toSeq) }.toSeq
        .toDF("cent_rank", "cv"))

    // assignment + residual: argmin is pq_encode with ONE subspace spanning
    // the whole vector (strict < keeps the smaller rank — the usual
    // tiebreak); the residual joins the numCents-row broadcast
    def withResidual(df: DataFrame, outId: String): DataFrame =
      df.select(col(idCol).as(outId), col(vecCol).as("v"),
          element_at(call_function("pq_encode", col(vecCol),
            typedLit(centFlat.toSeq), lit(1)), 1).as("cent_rank"))
        .join(centsDf, "cent_rank")
        .select(col(outId), col("cent_rank"),
          zip_with(col("v"), col("cv"),
            (a, b) => a.cast("double") - b).as("rv"))

    val assigned = withResidual(corpus, "neighbor_id")

    // residual codebook seed: a SALTED md5-order sample's residuals ('cb'
    // appended before hashing), flattened to pq_encode's (s·k + c)·subDim
    // layout. The salt makes the sample independent of the CENTROID
    // sample: the unsalted order would pick the centroid rows themselves,
    // whose residuals are all ZERO (v − c(v) = 0 when v is its own
    // nearest centroid) — a degenerate all-zero codebook that ties every
    // code and collapses ADC ranking to noise (measured: recall 0.04 at
    // 1M vs 0.6+ salted).
    val seedRows = assigned
      .orderBy(md5(concat(col("neighbor_id").cast("string"), lit("cb"))),
        col("neighbor_id"))
      .limit(codebookSize)
      .select(col("rv")).collect()
      .map(_.getSeq[Double](0).toArray)
    require(seedRows.length >= codebookSize,
      s"corpus has ${seedRows.length} vectors, need >= $codebookSize for the codebook seed")
    val seedFlat = Array.tabulate(m * codebookSize * subDim) { flat =>
      val i = flat % subDim
      val c = flat / subDim % codebookSize
      val s = flat / subDim / codebookSize
      seedRows(c)(s * subDim + i)
    }
    val cbFlat =
      if (lloydIters <= 0) seedFlat
      else pqLloyd(assigned.select(col("rv")), seedFlat, lloydIters, m,
        codebookSize, subDim, "rv")

    // codes: one codegen'd pq_encode per row over the residual — zero shuffle
    val encoded = assigned.select(col("cent_rank"), col("neighbor_id"),
      call_function("pq_encode", col("rv"), typedLit(cbFlat.toSeq), lit(m)).as("codes"))

    // probes: nprobe nearest lists per query (queries are few; the window
    // is over queries × numCents rows)
    val qScored = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .crossJoin(centsDf)
      .select(col("query_id"), col("qv"), col("cent_rank"),
        // ||q−c||² ordering ≡ norm2(c) − 2·q·c (norm2(q) constant per query)
        (norm2(col("cv")) - lit(2.0) * dot(col("qv"), col("cv"))).as("cd2"))
    val pw = Window.partitionBy(col("query_id")).orderBy(col("cd2").asc, col("cent_rank").asc)
    val probes = qScored.withColumn("rn", row_number().over(pw)).filter(col("rn") <= nprobe)
      .join(centsDf, "cent_rank")
      .select(col("query_id"), col("cent_rank"),
        zip_with(col("qv"), col("cv"), (a, b) => a.cast("double") - b).as("qrv"))

    // per-(query, probed list) ADC LUT in (sub, code) order — the §IV
    // residual trick: distances are query-residual vs codeword, one table
    // per probed list
    val cw = (for (s <- 0 until m; c <- 0 until codebookSize) yield
        (s, c, cbFlat.slice((s * codebookSize + c) * subDim,
          (s * codebookSize + c + 1) * subDim).toSeq))
      .toDF("sub", "code", "w")
    val lut = probes.crossJoin(broadcast(cw))
      .select(col("query_id"), col("cent_rank"), col("sub"), col("code"),
        l2sqSub(col("qrv"), col("w"), col("sub"), subDim).as("d2"))
      .groupBy(col("query_id"), col("cent_rank"))
      .agg(transform(
        array_sort(collect_list(struct(col("sub"), col("code"), col("d2")))),
        s => s("d2")).as("lut"))

    // ADC scoring: codes meet ONLY the LUTs of queries probing their list
    val scored = encoded
      .join(broadcast(lut), Seq("cent_rank"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(aggregate(sequence(lit(0), lit(m - 1)), lit(0.0), (acc, s) =>
          acc + element_at(col("lut"),
            (s * codebookSize + element_at(col("codes"), s + 1) + 1).cast("int"))),
          6).as("d2_adc"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("d2_adc").asc, col("neighbor_id").asc)
    val adcRanked = scored.withColumn("rank", row_number().over(w))
    if (rerank <= 0) adcRanked.filter(col("rank") <= k)
    else {
      // IVFADC+R exact tail — identical to pqTopK's: the corpus side is
      // re-read map-side against the broadcast shortlist, never shuffled
      val shortlist = adcRanked.filter(col("rank") <= rerank)
        .select(col("query_id"), col("neighbor_id"))
        .join(broadcast(queries.select(col(idCol).as("query_id"),
          col(vecCol).as("qv"))), "query_id")
      val exact = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
        .join(broadcast(shortlist), "neighbor_id")
        .select(col("query_id"), col("neighbor_id"),
          round(norm2(col("qv")) + norm2(col("cv"))
            - lit(2.0) * dot(col("qv"), col("cv")), 6).as("d2_exact"))
      val w2 = Window.partitionBy(col("query_id"))
        .orderBy(col("d2_exact").asc, col("neighbor_id").asc)
      exact.withColumn("rank", row_number().over(w2)).filter(col("rank") <= k)
    }
  }

  // ------------------------------------------------------- SQ8 (scalar)

  /** Per-dimension SQ8 scales from the corpus: (pos, mn, w) with
    * w = (mx−mn)/255 (1.0 when the dimension is constant, so codes land on
    * 0 and dequantize back to mn exactly). One posexplode + groupBy pass;
    * the result is dim-bounded (like the PQ codebooks and LUT collects).
    */
  def sq8Scales(corpus: DataFrame, vecCol: String): Array[(Double, Double)] = {
    val rows = corpus
      .select(posexplode(col(vecCol)).as(Seq("pos", "v")))
      // BOUND: one (min, max) row per vector dimension — ≤ dim rows
      .groupBy(col("pos"))
      .agg(min(col("v").cast("double")).as("mn"), max(col("v").cast("double")).as("mx"))
      .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1)
    rows.map { case (_, (mn, mx)) =>
      (mn, if (mx > mn) (mx - mn) / 255.0 else 1.0)
    }
  }

  /** 8-bit scalar codes for a vector column under `scales`: code[d] =
    * clamp(round((v[d]−mn[d]) / w[d]), 0, 255) — a 4× memory cut at ~w/2
    * max reconstruction error per component (the FAISS SQ8 tier).
    */
  def sq8Encode(vec: Column, scales: Array[(Double, Double)]): Column = {
    val mnA = array(scales.map(s => lit(s._1)): _*)
    val wA = array(scales.map(s => lit(s._2)): _*)
    transform(sequence(lit(1), lit(scales.length)), i =>
      least(lit(255L), greatest(lit(0L),
        round((element_at(vec, i).cast("double") - element_at(mnA, i))
          / element_at(wA, i)).cast("long"))).cast("int"))
  }

  /** Dequantized FLOAT vector from SQ8 codes — scored through the same
    * codegen'd dot_f32 as every other tier, so the hot loop never runs an
    * interpreted lambda. */
  def sq8Decode(codes: Column, scales: Array[(Double, Double)]): Column = {
    val mnA = array(scales.map(s => lit(s._1)): _*)
    val wA = array(scales.map(s => lit(s._2)): _*)
    transform(sequence(lit(1), lit(scales.length)), i =>
      (element_at(mnA, i) + element_at(codes, i).cast("double") * element_at(wA, i))
        .cast("float"))
  }

  /** SQ8 ANN: encode the corpus to 8-bit codes (trained on its own per-dim
    * ranges), score queries against the DEQUANTIZED vectors, top-k per
    * query. Same shape as [[cosineTopK]] — broadcast queries, map-side
    * scoring, WindowGroupLimit top-k — but the corpus side the scan feeds
    * is 4× smaller at rest; at 100 TB that is the difference between codes
    * fitting in page cache or not. Returns (query_id, neighbor_id,
    * est_cos, rank).
    */
  def sq8TopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val scales = sq8Scales(corpus, vecCol)
    // quantize→dequantize in ONE codegen pass (sql.Sq8RoundtripExpression);
    // sq8Decode∘sq8Encode below stays as the bit-equality spec mirror
    val mnA = array(scales.map(s => lit(s._1)): _*)
    val wA = array(scales.map(s => lit(s._2)): _*)
    val dq = corpus.select(col(idCol).as("neighbor_id"),
      call_function("sq8_roundtrip", col(vecCol), mnA, wA).as("c_vec"))
      .withColumn("c_nrm", sqrt(norm2(col("c_vec"))))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
      sqrt(norm2(col(vecCol))).as("q_nrm"))
    val scored = dq.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(dot(col("q_vec"), col("c_vec")) / (col("q_nrm") * col("c_nrm")), 6)
          .as("est_cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("est_cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** PCA over an embedding column — the standard preprocessing rotation
    * before product quantization / IVF (decorrelated axes make per-
    * subspace codebooks far more efficient; same role as in Faiss's
    * OPQ/PCAR transforms). Returns (mean, eigenvalues desc, row-major
    * components: k rows of d).
    *
    * Scale shape, MLlib-style split: the corpus-sized work is ONE
    * partition-local accumulator pass ([[pcaMoments]] — each task folds
    * its rows into a packed d(d+1)/2 upper-triangle, treeAggregate merges
    * one triangle per partition, so shuffle volume is partitions × d²
    * doubles, NEVER corpus-sized and independent of embedding width per
    * row); the eigensolve then runs driver-side on the d×d covariance — a
    * BOUNDED collect (d² doubles) with a cyclic Jacobi solver, O(d³) on
    * constants the executor count never sees.
    */
  // memoized full decompositions — re-executions of the same projection
  // (bench reps, multiple queries over one corpus) pay the Gramian pass
  // once per session. The key is DATA-AWARE, not just plan-shaped: the
  // SHA-256 of the full canonicalized analyzed plan (a 32-bit semanticHash
  // could collide and silently serve another dataset's components — this
  // is a correctness output, unlike RangeJoin's bucketing heuristic) plus
  // the sorted list of backing input files. Overwriting a source table
  // mid-session writes new part-<uuid> file names, so the key changes and
  // the memo misses; in-memory data is embedded in the canonical plan
  // itself. The one blind spot — a non-Spark writer mutating a file IN
  // PLACE under the same name — is covered by [[invalidatePcaMemo]].
  // Bounded: one (d + d² + k·d) double payload per distinct key.
  private val pcaMemo = scala.collection.concurrent.TrieMap
    .empty[(org.apache.spark.sql.SparkSession, String),
      (Array[Double], Array[Double], Array[Array[Double]])]

  /** Drop every memoized fit (PCA decompositions and [[memoFit]] results).
    * Only needed when a source file was rewritten IN PLACE under an
    * unchanged name (Spark's own overwrite writes fresh part-file names,
    * which the memo key already sees). */
  def invalidatePcaMemo(): Unit = { pcaMemo.clear(); fitMemo.clear() }

  // generic data-aware fit memo under the SAME key contract as pcaMemo —
  // for every bounded driver-side fit whose re-executions shouldn't repay
  // the training jobs (q194's k-means centroids; bench reps and plan
  // audits re-invoke the query fn). The tag must encode the algorithm and
  // every hyper-parameter.
  private val fitMemo = scala.collection.concurrent.TrieMap
    .empty[(org.apache.spark.sql.SparkSession, String), AnyRef]

  private[graft] def memoFit[T <: AnyRef](df: DataFrame, tag: String)(
      compute: => T): T = {
    fitMemo.filterInPlace((key, _) => !key._1.sparkContext.isStopped)
    fitMemo.getOrElseUpdate((df.sparkSession, pcaMemoKey(df, tag)), compute)
      .asInstanceOf[T]
  }

  private def pcaMemoKey(vectors: DataFrame, vecCol: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.update(vectors.queryExecution.analyzed.canonicalized.toString
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    vectors.inputFiles.sorted.foreach { f =>
      md.update(f.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    md.update(vecCol.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.util.Base64.getEncoder.encodeToString(md.digest())
  }

  def pcaComponents(vectors: DataFrame, k: Int,
      vecCol: String = "embedding"): (Array[Double], Array[Double], Array[Array[Double]]) = {
    pcaMemo.filterInPlace((key, _) => !key._1.sparkContext.isStopped)
    val memoKey = (vectors.sparkSession, pcaMemoKey(vectors, vecCol))
    val (mean, evals, evecs) = pcaMemo.getOrElseUpdate(memoKey, {
      val (moment, sums, nRows) = pcaMoments(vectors, vecCol)
      val d = sums.length
      val n = nRows.toDouble
      val mean = Array.tabulate(d)(i => sums(i) / n)
      val cov = Array.tabulate(d, d)((i, j) => moment(i)(j) / n - mean(i) * mean(j))
      val (ev, vecs) = jacobiEigen(cov)
      (mean, ev, vecs)
    })
    require(k >= 1 && k <= mean.length, s"k=$k must lie in [1, ${mean.length}]")
    (mean, evals.take(k), evecs.take(k))
  }

  /** Raw second-moment matrix, per-dimension sums, and non-null row count
    * in ONE partition-local pass: each task folds its rows into a packed
    * d(d+1)/2-double upper-triangle accumulator (a pure multiply-add loop
    * — nothing per-row is materialized), and `treeAggregate` merges one
    * triangle per partition. Shuffle volume is partitions × O(d²) doubles,
    * independent of the corpus; the explode formulation it replaces
    * ([[pcaMomentsExplode]]) materialized d(d+1)/2 struct cells PER ROW
    * through a CodegenFallback nested transform — fine at d = 16-64,
    * ~525k cells/row at d = 1024. Null vectors contribute nothing (same
    * rule as explode over a null array). */
  private[graft] def pcaMoments(vectors: DataFrame, vecCol: String)
      : (Array[Array[Double]], Array[Double], Long) = {
    val d = vectors.select(size(col(vecCol)).as("d")).head().getInt(0)
    val tri = d * (d + 1) / 2
    val (triSum, sums, n) = vectors.select(col(vecCol).cast("array<double>")).rdd
      .treeAggregate((new Array[Double](tri), new Array[Double](d), 0L))(
        seqOp = (acc, row) =>
          if (row.isNullAt(0)) acc
          else {
            val v = row.getSeq[Double](0)
            val t = acc._1
            val s = acc._2
            var i = 0
            var kk = 0
            while (i < d) {
              val xi = v(i)
              s(i) += xi
              var j = i
              while (j < d) { t(kk) += xi * v(j); kk += 1; j += 1 }
              i += 1
            }
            (t, s, acc._3 + 1)
          },
        combOp = { case ((t1, s1, n1), (t2, s2, n2)) =>
          var kk = 0
          while (kk < tri) { t1(kk) += t2(kk); kk += 1 }
          var i = 0
          while (i < d) { s1(i) += s2(i); i += 1 }
          (t1, s1, n1 + n2)
        })
    val moment = Array.ofDim[Double](d, d)
    var kk = 0
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        moment(i)(j) = triSum(kk); moment(j)(i) = triSum(kk); kk += 1; j += 1
      }
      i += 1
    }
    (moment, sums, n)
  }

  /** The declarative explode formulation of [[pcaMoments]], kept for the
    * agreement spec and the ScaleBench wide-d cost comparison: the upper
    * triangle of outer-product cells (d(d+1)/2 per row) explodes into a
    * map-side-combined d²-group aggregate, plus a posexplode pass for the
    * sums. Correct and corpus-shuffle-free, but per-row cell
    * materialization grows quadratically with embedding width. */
  private[graft] def pcaMomentsExplode(vectors: DataFrame, vecCol: String)
      : (Array[Array[Double]], Array[Double], Long) = {
    val d = vectors.select(size(col(vecCol)).as("d")).head().getInt(0)
    val cells = vectors.select(explode(expr(
      s"""flatten(transform($vecCol, (x, i) ->
         |  transform(slice($vecCol, i + 1, $d - i), (y, jj) ->
         |    struct(i AS i, i + jj AS j,
         |           CAST(x AS DOUBLE) * CAST(y AS DOUBLE) AS p))))""".stripMargin)))
      .select(col("col.i"), col("col.j"), col("col.p"))
      // BOUND: ≤ d·(d+1)/2 moment cells — dimension-squared, never corpus-sized
      .groupBy(col("i"), col("j")).agg(sum(col("p")).as("s"), count(lit(1)).as("n"))
      .collect()
    val n = cells.head.getLong(3)
    val moment = Array.ofDim[Double](d, d)
    cells.foreach { r =>
      moment(r.getInt(0))(r.getInt(1)) = r.getDouble(2)
      moment(r.getInt(1))(r.getInt(0)) = r.getDouble(2)
    }
    // BOUND: one sum row per vector dimension — ≤ dim rows
    val sumsMap = vectors.select(posexplode(col(vecCol)))
      .groupBy(col("pos")).agg(sum(col("col").cast("double")).as("s"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    (moment, Array.tabulate(d)(sumsMap), n)
  }

  /** Cyclic Jacobi eigensolver for a symmetric matrix — returns
    * (eigenvalues desc, matching row eigenvectors), deterministic.
    * Driver-side by design: the input is the d×d covariance of
    * [[pcaComponents]], bounded by the embedding width. */
  private[graft] def jacobiEigen(m: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = Array.tabulate(d, d)((i, j) => m(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < 64 && off > 1e-14) {
      off = 0.0
      for (p <- 0 until d; q <- p + 1 until d) {
        off = math.max(off, math.abs(a(p)(q)))
        if (math.abs(a(p)(q)) > 1e-18) {
          val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
          val t = math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0)) match {
            case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
            case tt => tt
          }
          val c = 1.0 / math.sqrt(t * t + 1.0)
          val s = t * c
          for (i <- 0 until d) {
            val aip = a(i)(p); val aiq = a(i)(q)
            a(i)(p) = c * aip - s * aiq
            a(i)(q) = s * aip + c * aiq
          }
          for (j <- 0 until d) {
            val apj = a(p)(j); val aqj = a(q)(j)
            a(p)(j) = c * apj - s * aqj
            a(q)(j) = s * apj + c * aqj
          }
          for (i <- 0 until d) {
            val vip = v(i)(p); val viq = v(i)(q)
            v(i)(p) = c * vip - s * viq
            v(i)(q) = s * vip + c * viq
          }
        }
      }
      sweep += 1
    }
    // eigenpairs sorted by eigenvalue desc; sign normalized so the first
    // non-negligible coordinate is positive (eigenvectors are sign-free —
    // pin one for determinism)
    val pairs = (0 until d).map { j =>
      val vec = Array.tabulate(d)(i => v(i)(j))
      val lead = vec.find(x => math.abs(x) > 1e-12).getOrElse(1.0)
      (a(j)(j), if (lead < 0) vec.map(-_) else vec)
    }.sortBy { case (ev, vec) => (-ev, vec.headOption.getOrElse(0.0)) }
    (pairs.map(_._1).toArray, pairs.map(_._2).toArray)
  }

  /** Project vectors onto the top-k PCA components: (id, pc1..pck).
    * The components ride as FOLDED LITERALS inside one codegen'd
    * expression per output column — projection is pure map-side column
    * math, no join, no shuffle, no UDF. */
  def pcaProject(vectors: DataFrame, k: Int, idCol: String = "vec_id",
      vecCol: String = "embedding", round6: Boolean = true): DataFrame = {
    val (mean, _, comps) = pcaComponents(vectors, k, vecCol)
    val pcs = comps.zipWithIndex.map { case (c, j) =>
      val e = expr(projectionTerms(mean, c, i => s"$vecCol[$i]"))
      (if (round6) round(e, 6) else e).as(s"pc${j + 1}")
    }
    vectors.select(col(idCol) +: pcs: _*)
  }

  /** Centered-dot-product term text for ONE principal component. Shared by
    * [[pcaProject]] and the q193 DuckDB oracle builder: both engines parse
    * the IDENTICAL shortest-round-trip Double.toString literals and the
    * identical left-associated `+` chain, so the pre-round projection is
    * bit-equal across Spark and DuckDB. `idx` renders each engine's array
    * access (Spark 0-based `embedding[i]`, DuckDB 1-based `embedding[i+1]`).
    */
  private[graft] def projectionTerms(mean: Array[Double], comp: Array[Double],
      idx: Int => String): String =
    mean.indices.map(i =>
      s"(CAST(${idx(i)} AS DOUBLE) - (${mean(i)})) * (${comp(i)})").mkString(" + ")

  /** Squared-L2-to-centroid term text: ||c||² − 2·(v·c), with ||c||²
    * pre-folded to ONE double literal and the dot chained left-to-right.
    * Shared by the q194 Spark plan and its DuckDB oracle (the
    * [[projectionTerms]] contract: identical shortest-round-trip literals,
    * identical association, so argmin ties agree bitwise). The v·v term is
    * omitted — constant per row, it cancels in every within-row
    * comparison, and the reported distance is defined as this expression.
    */
  private[graft] def centroidDistTerms(cent: Array[Double],
      idx: Int => String): String = {
    val c2 = cent.map(x => x * x).sum
    val dotTerms = cent.indices.map(i =>
      s"(CAST(${idx(i)} AS DOUBLE)) * (${cent(i)})").mkString(" + ")
    s"(($c2) - 2e0 * ($dotTerms))"
  }

  /** ||v||² term text (companion of [[centroidDistTerms]] — adding it back
    * turns the relative argmin value into the true squared distance). */
  private[graft] def vnorm2Terms(d: Int, idx: Int => String): String =
    (0 until d).map(i =>
      s"(CAST(${idx(i)} AS DOUBLE)) * (CAST(${idx(i)} AS DOUBLE))").mkString(" + ")
}
