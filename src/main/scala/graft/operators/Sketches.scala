package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable sketch operators — the cardinality / frequency / order-statistic
  * primitives a 100 TB telemetry-and-curation pipeline runs continuously
  * (per-domain distinct counts, token heavy hitters, corpus length
  * percentiles) where exact global state is either too big or needs one
  * extra pass.
  *
  * Engine-portability discipline (shared with TextOps): every hash is the
  * 60-bit md5-hex prefix, every float reduction that feeds a hash-compared
  * output is either exact-integer-scaled or provably order-independent, so
  * the DuckDB oracle can mirror the arithmetic bit-for-bit. In particular
  * the HyperLogLog harmonic sum is accumulated as exact BIGINTs scaled by
  * 2^52 (each term 2^(52-reg) is an integer; the total is < 2^61), because a
  * double-precision sum over terms spanning 60 binary orders of magnitude
  * would be summation-order-dependent and flip hashes between engines.
  *
  * Scale story:
  *  - HLL registers are a groupBy(key, bucket).max — map-side-combinable,
  *    m=512 rows per key, mergeable across shards/days by another max.
  *  - CMS cells are a groupBy(row, col).sum over PRE-AGGREGATED token
  *    counts — d·w = 4096 cells total regardless of corpus size, mergeable
  *    by addition.
  *  - Exact quantiles never globally sort: a 1-row extrema pass, a bounded
  *    histogram pass (≤ nBuckets rows collected, same class as the two-phase
  *    prefix-scan offset tables), then a sort restricted to the few buckets
  *    that contain the requested ranks.
  *
  * References: Flajolet et al. 2007 (HyperLogLog, incl. the linear-counting
  * small-range correction), Cormode & Muthukrishnan 2005 (Count-Min).
  * The rank statistic rho uses trailing zeros of the post-bucket hash bits
  * (the PCSA/"Probabilistic Counting" convention, Flajolet–Martin 1985) —
  * identically distributed to leading zeros on an i.i.d. uniform hash and
  * exactly expressible in portable SQL as log2(w & -w).
  */
object Sketches {

  // ------------------------------------------------------------------ HLL

  /** Register count m = 2^p. p=9 → 512 registers → ~1.04/sqrt(512) ≈ 4.6%
    * standard error: the classic telemetry operating point. */
  val HllP = 9
  val HllM = 1 << HllP

  /** Max rho: the 60-bit hash leaves 51 post-bucket bits; w == 0 (all 51
    * zero) reports one more than the max observable trailing-zero count. */
  val HllMaxRho = 52

  private def md5Hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** (bucket, rho) for one hashed value: bucket = low p bits, rho = trailing
    * zeros of the remaining 51 bits + 1 (log2 of w & -w is exact: the
    * argument is a power of two, so no libm rounding can differ between
    * engines; `round` guards the integer conversion anyway).
    */
  def hllBucketRho(value: Column): (Column, Column) = {
    val h = md5Hash60(value)
    // integer div/mod — h spans 60 bits, so a double-typed `/` would round
    val w = shiftright(h, HllP)
    val bucket = pmod(h, lit(HllM)).cast("int")
    val rho = when(w === 0, lit(HllMaxRho))
      .otherwise(round(log2(w.bitwiseAND(-w))).cast("int") + 1)
    (bucket, rho)
  }

  /** HLL register table for `value` grouped by the named key columns: one
    * row per (keys, bucket) holding max(rho). Mergeable: registers of a
    * union of shards = max over the shards' registers (see SketchesSpec).
    */
  def hllRegisters(df: DataFrame, value: Column, keys: Seq[String]): DataFrame = {
    val (bucket, rho) = hllBucketRho(value)
    df.select((keys.map(col) :+ bucket.as("bucket") :+ rho.as("rho")): _*)
      .groupBy((keys :+ "bucket").map(col): _*)
      .agg(max(col("rho")).as("reg"))
  }

  /** Distinct-count estimate per key group from a register table with
    * columns (groupCols..., bucket, reg). Harmonic sum is exact-integer:
    * sum(2^(52-reg)) + zeros·2^52 as BIGINT (< 2^61), divided back in one
    * double op so both engines round identically. Applies the
    * linear-counting small-range correction below 2.5·m.
    */
  def hllEstimate(registers: DataFrame, groupCols: Seq[String]): DataFrame = {
    val m = HllM.toDouble
    // alpha_512 spelled as the same literal expression in the SQL oracle
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m))
    // 2^(52-reg) as an exact BIGINT (reg ∈ [1,52] ⇒ exponent ∈ [0,51], every
    // value exactly representable; functions.shiftleft only takes a literal
    // shift, so spell it as pow)
    val scaled = pow(lit(2.0), lit(HllMaxRho) - col("reg")).cast("long")
    val agg = registers.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("filled"), sum(scaled).as("s_scaled"))
      .withColumn("zeros", lit(HllM.toLong) - col("filled"))
      .withColumn("s_total",
        col("s_scaled") + col("zeros") * lit(1L << HllMaxRho))
    val z = col("s_total").cast("double") / lit(math.pow(2.0, HllMaxRho))
    val raw = alpha * lit(m) * lit(m) / z
    val est = when(raw <= lit(2.5 * m) && col("zeros") > 0,
      lit(m) * log(lit(m) / col("zeros").cast("double")))
      .otherwise(raw)
    agg.select((groupCols.map(col) :+
      round(est + lit(5e-10), 4).as("est_distinct")): _*)
  }

  // ------------------------------------------------------------------ CMS

  /** Count-Min geometry: d=4 hash rows × w=1024 columns — 4096 counters
    * whatever the corpus size. */
  val CmsD = 4
  val CmsW = 1024

  /** Column index of `value` under hash row i (seeded by prefixing "i:"). */
  def cmsCol(i: Int, value: Column): Column =
    pmod(md5Hash60(concat(lit(s"$i:"), value)), lit(CmsW)).cast("int")

  /** CMS cell table (row, col, cnt) from a PRE-AGGREGATED (value, weight)
    * frequency table — d rows per distinct value, summed per cell.
    * Mergeable by addition across shards/days.
    */
  def cmsCells(freq: DataFrame, value: Column, weight: Column): DataFrame = {
    val rows = (0 until CmsD).map { i =>
      struct(lit(i).as("r"), cmsCol(i, value).as("c"))
    }
    freq.select(explode(array(rows: _*)).as("rc"), weight.as("w"))
      .groupBy(col("rc.r").as("r"), col("rc.c").as("c"))
      .agg(sum(col("w")).as("cnt"))
  }

  /** Point-estimate the counts of `probes` (a small DataFrame with column
    * `probeCol`) against a cell table: min over the d per-row counters.
    * The probe side is broadcast; each probe reads d cells.
    */
  def cmsEstimate(cells: DataFrame, probes: DataFrame, probeCol: String): DataFrame = {
    val rows = (0 until CmsD).map { i =>
      struct(lit(i).as("r"), cmsCol(i, col(probeCol)).as("c"))
    }
    val probeCells = probes.select(col(probeCol), explode(array(rows: _*)).as("rc"))
      .select(col(probeCol), col("rc.r").as("r"), col("rc.c").as("c"))
    cells.join(broadcast(probeCells), Seq("r", "c"))
      .groupBy(col(probeCol))
      .agg(min(col("cnt")).as("cms_est"))
  }

  // ------------------------------------------------ exact quantiles

  /** Exact order statistics without a global sort. Quantile q maps to the
    * 0-indexed rank floor(q·(n-1)) ("lower" interpolation); the value at a
    * rank is found by (1) a 1-row extrema/count pass, (2) a fixed-width
    * histogram pass whose ≤ nBuckets counts are collected and prefix-summed
    * driver-side (bounded, same class as the prefix-scan offset tables),
    * then (3) sorting ONLY the buckets that contain requested ranks — at
    * uniform fill that is qs.length · n/nBuckets rows, and the per-bucket
    * window keeps even a skewed bucket parallel across buckets.
    * Duplicate values make any tie order rank-correct: ordering is by value
    * alone, so the value at a global rank is unique.
    *
    * Returns (q, value) with q as a double column.
    */
  /** Half-life-decayed popularity score — the trending/recency aggregate
    * (the Reddit/HN-style decay), INTEGER-EXACT: each event contributes
    * `1e6 >> age_days` micro-units (halving per day relative to the
    * corpus's newest event), so the score is a sum of exact powers of two
    * — no float pow/exp, engine-identical, and MERGEABLE (shard scores
    * sum). Ages > 20 days shift to zero and are clamped explicitly —
    * Java's `>>` silently wraps the shift count at 64, DuckDB's does not,
    * so the clamp is part of the operator's portable semantics. `dayCol`
    * is an integer day number (epoch-ns DIV 86400e9 — the q99 pattern).
    *
    * One map-side-combinable groupBy on the key; the reference day rides
    * a broadcast 1-row frame. Output: key, n_events, score_micro.
    */
  def halfLifeScore(df: DataFrame, keyCol: String, dayCol: String): DataFrame = {
    val ref = df.agg(max(col(dayCol)).as("__ref"))
    df.select(col(keyCol), col(dayCol).as("__d"))
      .crossJoin(broadcast(ref))
      .withColumn("__w", expr(
        """CASE WHEN __ref - __d > 20 THEN 0
           |ELSE shiftright(CAST(1000000 AS BIGINT), CAST(__ref - __d AS INT))
           |END""".stripMargin))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"), sum(col("__w")).as("score_micro"))
  }

  /** EXACT heavy hitters — every token with count strictly above n/k —
    * with bounded memory and a candidate-only shuffle, the two-pass
    * Misra–Gries prune (Misra & Gries 1982): a vocabulary-wide
    * `groupBy(tok)` shuffles every distinct token, which at web scale is
    * billions of near-singleton rows shuffled to find a few hundred heavy
    * ones. Instead pass 1 runs an O(k)-memory Misra–Gries summary PER
    * PARTITION in one scan (survivor guarantee: any item with local count
    * > n_p/k keeps a counter; by pigeonhole a GLOBAL count > n/k forces
    * local count > n_p/k in at least one partition, so the union of
    * survivors is a superset of every true heavy hitter — candidates are
    * ≤ partitions·(k−1) however large the vocabulary). Pass 2 re-scans,
    * semi-joins the broadcast candidate set, and counts ONLY candidates
    * exactly — map-side combine leaves ≤ |candidates| rows per partition
    * on the wire. The final `cnt·k > n` filter makes the output exact and
    * partitioning-independent (the candidate superset varies with layout;
    * the reported set never does). Output: (tok, cnt), cnt exact.
    *
    * CONTRACT: `toks` must be deterministic under re-evaluation — the two
    * passes each scan it (caching a corpus-sized token stream is exactly
    * what this operator avoids), so a nondeterministic upstream (sampling,
    * rand() salting) could recount data pass 1 never summarized, voiding
    * the superset guarantee. Persist upstream first in that case.
    */
  def exactHeavyHitters(toks: DataFrame, tokCol: String, k: Int): DataFrame = {
    require(k >= 2, "exactHeavyHitters needs k >= 2")
    val spark = toks.sparkSession
    import spark.implicits._
    // null tokens drop (SQL aggregates skip nulls; and a null candidate
    // could never match the pass-2 semi-join anyway)
    val t = toks.select(col(tokCol).cast("string").as("tok"))
      .where(col("tok").isNotNull)
    // pass 1: Misra–Gries survivors per partition + the partition's token
    // count, one scan; the count rides a null-token sentinel row
    val pass1 = t.as[String].mapPartitions { it =>
      val counters = scala.collection.mutable.HashMap.empty[String, Long]
      var np = 0L
      while (it.hasNext) {
        val tok = it.next()
        np += 1
        val cur = counters.getOrElse(tok, -1L)
        if (cur >= 0L) counters(tok) = cur + 1L
        else if (counters.size < k - 1) counters(tok) = 1L
        else {
          // decrement-all, dropping zeros: amortized O(1) per token
          // (each event burns k-1 count units)
          counters.toArray.foreach { case (kk, c) =>
            if (c == 1L) counters.remove(kk) else counters(kk) = c - 1L
          }
        }
      }
      counters.keysIterator.map(tk => (tk, 0L)) ++ Iterator(((null: String), np))
    }.toDF("tok", "np")
    val p1 = graft.core.CacheLife.scoped(pass1.persist())
    val cands = p1.where(col("tok").isNotNull).select("tok").distinct()
    val nDf = p1.agg(sum(col("np")).as("__n"))
    t.join(broadcast(cands), Seq("tok"), "left_semi")
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(nDf))
      .where(col("cnt") * k > col("__n"))
      .select(col("tok"), col("cnt"))
  }

  def exactQuantiles(
      df: DataFrame, valueCol: String, qs: Seq[Double],
      nBuckets: Int = 1024): DataFrame = {
    val spark = df.sparkSession
    val v = col(valueCol)
    val head = df.agg(min(v).as("mn"), max(v).as("mx"), count(lit(1)).as("n")).head()
    val (mn, mx, n) = (head.getDouble(0), head.getDouble(1), head.getLong(2))
    require(n > 0, "exactQuantiles on empty input")
    val width = math.max((mx - mn) / nBuckets, java.lang.Double.MIN_NORMAL)
    val bucketOf = least(floor((v - lit(mn)) / lit(width)), lit(nBuckets - 1))
      .cast("int").as("bucket")
    // BOUND: one count per histogram bucket — ≤ nBuckets rows
    val hist = df.select(bucketOf).groupBy("bucket").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // cumulative count strictly below each bucket
    val below = {
      var acc = 0L
      (0 until nBuckets).map { b => val r = b -> acc; acc += hist.getOrElse(b, 0L); r }
    }.toMap
    // rank (0-indexed) per requested quantile → (bucket, local 1-indexed row)
    val targets = qs.map { q =>
      val k = math.floor(q * (n - 1)).toLong
      val b = (0 until nBuckets).find { b =>
        below(b) <= k && k < below(b) + hist.getOrElse(b, 0L)
      }.get
      (q, b, k - below(b) + 1)
    }
    val wantedBuckets = targets.map(_._2).distinct
    val win = Window.partitionBy(col("bucket")).orderBy(v)
    val ranked = df.select(v, bucketOf)
      .filter(col("bucket").isin(wantedBuckets.map(Integer.valueOf): _*))
      .withColumn("rn", row_number().over(win).cast("long"))
    val wanted = targets.map { case (q, b, rn) => (q, b, rn) }
    import spark.implicits._
    val wantDf = broadcast(wanted.toDF("q", "bucket", "rn"))
    ranked.join(wantDf, Seq("bucket", "rn"))
      .select(col("q"), v.as("value"))
  }

  /** Per-key exact quantiles, FULLY distributed — no driver collect at all,
    * so key cardinality is unbounded (per-domain latency percentiles over
    * millions of domains). Same two-phase shape as [[exactQuantiles]] but
    * every driver step becomes a plan step:
    *  - per-key extrema/count (groupBy agg),
    *  - per-key fixed-width histogram (groupBy (key,bucket)),
    *  - per-key cumulative-below via a window over the HISTOGRAM (≤
    *    nBuckets rows per key — never over the data),
    *  - rank→bucket resolution as a join against the histogram,
    *  - and a per-(key,bucket) row_number over ONLY the rank-bearing
    *    buckets (semi-join filter), never a global or per-key full sort.
    * Quantile semantics match [[exactQuantiles]]: value at 0-indexed rank
    * floor(q·(n_key−1)).
    *
    * SCALE CONTRACT: `keyCol` must be BOUNDED cardinality (grouping keys:
    * nations, languages, deciles — not row ids). The per-key extrema and
    * rank frames are driver-broadcast (≤ |keys| and ≤ |keys|·|qs| rows);
    * a row-id-cardinality key would build a data-sized broadcast where
    * the pre-r19 sort-merge join merely degraded gracefully.
    */
  def groupedQuantiles(
      df: DataFrame, keyCol: String, valueCol: String, qs: Seq[Double],
      nBuckets: Int = 256): DataFrame = {
    val k = col(keyCol)
    val v = col(valueCol)
    // The three data passes (extrema, histogram, rank-bucket selection)
    // each re-evaluate `df`; when the input is anything beyond a pruned
    // scan (a join, a whole upstream pipeline as in the rbo deciles), that
    // triples the dominant cost. Persist the two-column projection once —
    // scoped, so the bench/verify lifecycle drops it right after the query
    // — and let all passes read the narrow cache. A bare scan/filter/
    // project input stays unpersisted: re-reading two pruned parquet
    // columns is cheaper than materializing them to storage at any scale.
    val narrow = df.select(k, v)
    val base =
      if (cheapRescan(narrow)) narrow
      else graft.core.CacheLife.scoped(narrow.persist())
    val ext = base.groupBy(keyCol).agg(
      min(v).as("mn"), max(v).as("mx"), count(lit(1)).as("n"))
      .withColumn("w",
        greatest((col("mx") - col("mn")) / lit(nBuckets.toDouble),
          lit(java.lang.Double.MIN_NORMAL)))
    // ext is ≤ |keys| rows — broadcast it so the data side is NEVER
    // shuffled for the bucket assignment (was a sort-merge join: one
    // Exchange+Sort of the whole input per call)
    val rows = base.join(broadcast(ext), keyCol)
      .withColumn("bucket",
        least(floor((v - col("mn")) / col("w")), lit(nBuckets - 1)).cast("int"))
      .select(k, v, col("bucket"))
    val hist = rows.groupBy(k, col("bucket")).agg(count(lit(1)).as("c"))
    val wcum = Window.partitionBy(k).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val hb = hist.withColumn("below", sum(col("c")).over(wcum) - col("c"))
    val ranks = ext.select(k, col("n"))
      .withColumn("q", explode(array(qs.map(lit): _*)))
      .withColumn("k0", floor(col("q") * (col("n") - 1).cast("double")).cast("long"))
    // ranks (≤ |keys|·|qs| rows) vs hb (≤ |keys|·nBuckets rows): both
    // histogram-sized; broadcasting the smaller keeps this join off the
    // exchange path too
    val targets = broadcast(ranks).join(hb, keyCol)
      .filter(col("below") <= col("k0") && col("k0") < col("below") + col("c"))
      .select(k, col("q"), col("bucket"), (col("k0") - col("below") + 1).as("rn"))
    // targets is ≤ |keys|·|qs| rows; ONE broadcast inner join both prunes
    // rows to the rank-bearing buckets and attaches (q, rn) — the old
    // semi-join + rank + second join shape paid two broadcast builds and
    // re-ran the histogram subtree for each. A bucket holding several
    // requested ranks duplicates its rows ≤|qs|×, so the rank window adds
    // q to its partition key and the rn filter picks the order statistic.
    val winB = Window.partitionBy(k, col("bucket"), col("q")).orderBy(v)
    val out = rows.join(broadcast(targets), Seq(keyCol, "bucket"))
      .withColumn("__rn", row_number().over(winB).cast("long"))
      .filter(col("__rn") === col("rn"))
      .select(k, col("q"), v.as("value"))
    // ≤ |keys|·|qs| rows; callers routinely reference the result once per
    // quantile (lo/hi fence filters) — persist so each reference reads the
    // tiny cache instead of re-running the whole two-phase machinery
    graft.core.CacheLife.scoped(out.persist())
  }

  /** True when re-evaluating `df` is just a pruned scan (leaf / Filter /
    * Project chain): such plans are cheaper to re-read than to persist.
    * Anything with a join, aggregate, window, generate, union … is worth
    * caching before a multi-pass consumer. */
  private def cheapRescan(df: DataFrame): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter, Project => LProject}
    df.queryExecution.optimizedPlan.find { p =>
      !(p.isInstanceOf[LProject] || p.isInstanceOf[LFilter] || p.children.isEmpty)
    }.isEmpty
  }
}
