package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.{Sketches, TextOps}

/** Sketch surface: the mergeable cardinality/frequency/order-statistic
  * primitives (operators.Sketches) exercised over the documents and
  * lineitem tables, with oracles that mirror the hash and the
  * exact-integer-scaled arithmetic bit-for-bit (see Sketches' scaladoc for
  * why the HLL harmonic sum must not be a double summation).
  */
object Sketch {

  private val tokCte =
    """tk AS (
      |  SELECT source, tok
      |  FROM (SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents)
      |  WHERE tok <> ''
      |)""".stripMargin

  private def toks(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "documents")
      .select(col("source"), explode(TextOps.tokens(col("text"))).as("tok"))
      .filter(col("tok") =!= "")

  // q95 reports per-source estimates from the SAME register table q125's
  // set algebra merges — one corpus tokenize+groupBy-max per session,
  // released after the later consumer (before round 12 the reuse was
  // accidental, via the cache manager matching q125's persisted plan)
  private def sharedHllRegisters(spark: SparkSession, sfDir: String): DataFrame =
    graft.core.CacheLife.shared(spark, sfDir, "hll_registers",
        Set("q95_hll_distinct", "q125_hll_setops"))(
      Sketches.hllRegisters(toks(spark, sfDir), col("tok"), Seq("source")))

  // ---------------------------------------------------------------- q95

  /** q95: per-source distinct-token estimate via HyperLogLog (p=9, 512
    * registers) next to the exact distinct count — the per-domain
    * cardinality telemetry a corpus pipeline keeps continuously. The
    * register table is a map-side-combinable groupBy max and is mergeable
    * across shards (SketchesSpec proves union == merge); the estimate's
    * harmonic sum is exact-integer BIGINT so the oracle hash cannot drift.
    */
  def q95HllDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    val t = toks(spark, sfDir)
    val est = Sketches.hllEstimate(sharedHllRegisters(spark, sfDir), Seq("source"))
    val exact = t.groupBy("source").agg(countDistinct(col("tok")).as("exact_distinct"))
    est.join(exact, "source")
      .select(col("source"), col("est_distinct"), col("exact_distinct"))
  }

  val q95Sql: String =
    s"""WITH $tokCte,
       |h AS (
       |  SELECT source, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM tk
       |),
       |br AS (
       |  SELECT source, CAST(h % 512 AS INT) AS bucket,
       |    CASE WHEN h // 512 = 0 THEN 52
       |         ELSE CAST(round(log2((h // 512) & (-(h // 512)))) AS INT) + 1
       |    END AS rho
       |  FROM h
       |),
       |reg AS (SELECT source, bucket, MAX(rho) AS reg FROM br GROUP BY source, bucket),
       |e AS (
       |  SELECT source, COUNT(1) AS filled,
       |    SUM(1::BIGINT << (52 - reg)) AS s_scaled
       |  FROM reg GROUP BY source
       |),
       |z AS (
       |  SELECT source, (512 - filled) AS zeros,
       |    s_scaled + (512 - filled) * (1::BIGINT << 52) AS s_total
       |  FROM e
       |),
       |est AS (
       |  SELECT source, zeros,
       |    (0.7213e0 / (1e0 + 1.079e0 / 512e0)) * 512e0 * 512e0 /
       |      (CAST(s_total AS DOUBLE) / 4503599627370496e0) AS raw
       |  FROM z
       |),
       |ex AS (SELECT source, COUNT(DISTINCT tok) AS exact_distinct FROM tk GROUP BY source)
       |SELECT est.source,
       |  round(CASE WHEN raw <= 1280e0 AND zeros > 0
       |             THEN 512e0 * ln(512e0 / CAST(zeros AS DOUBLE))
       |             ELSE raw END + 5e-10, 4) AS est_distinct,
       |  ex.exact_distinct
       |FROM est JOIN ex USING (source)""".stripMargin

  // ---------------------------------------------------------------- q125

  /** q125: HLL SET ALGEBRA — the cross-domain overlap telemetry sketches
    * exist for: per-source register tables merge by bucket-max into every
    * source PAIR's union estimate (the mergeability that makes HLL the
    * shard/day primitive), and inclusion-exclusion turns union into an
    * intersection estimate, reported next to the exact overlap. All
    * register and estimate arithmetic mirrors q95 bit-for-bit; the pair
    * merge is two broadcast equi-joins + a bucket-max groupBy (never an
    * OR-join).
    */
  def q125HllSetOps(spark: SparkSession, sfDir: String): DataFrame = {
    val t = toks(spark, sfDir)
    val regs = sharedHllRegisters(spark, sfDir)
    val td = t.distinct()
    val srcs = t.select("source").distinct()
    val pairs = srcs.select(col("source").as("sa"))
      .crossJoin(srcs.select(col("source").as("sb")))
      .filter(col("sa") < col("sb"))
    val perSrc = Sketches.hllEstimate(regs, Seq("source"))
    val uregs = pairs.join(regs, col("source") === col("sa"))
      .select(col("sa"), col("sb"), col("bucket"), col("reg"))
      .unionAll(pairs.join(regs, col("source") === col("sb"))
        .select(col("sa"), col("sb"), col("bucket"), col("reg")))
      .groupBy(col("sa"), col("sb"), col("bucket"))
      .agg(max(col("reg")).as("reg"))
    val eu = Sketches.hllEstimate(uregs, Seq("sa", "sb"))
      .withColumnRenamed("est_distinct", "est_union")
    val ex = td.select(col("source").as("xa"), col("tok"))
      .join(td.select(col("source").as("xb"), col("tok")), "tok")
      .filter(col("xa") < col("xb"))
      .groupBy(col("xa"), col("xb")).agg(count(lit(1)).as("exact_intersection"))
    pairs
      .join(broadcast(perSrc.select(col("source").as("sa"),
        col("est_distinct").as("est_a"))), "sa")
      .join(broadcast(perSrc.select(col("source").as("sb"),
        col("est_distinct").as("est_b"))), "sb")
      .join(broadcast(eu), Seq("sa", "sb"))
      .join(broadcast(ex.withColumnRenamed("xa", "sa").withColumnRenamed("xb", "sb")),
        Seq("sa", "sb"), "left")
      .select(col("sa").as("source_a"), col("sb").as("source_b"),
        col("est_a"), col("est_b"), col("est_union"),
        round(col("est_a") + col("est_b") - col("est_union"), 4)
          .as("est_intersection"),
        coalesce(col("exact_intersection"), lit(0L)).as("exact_intersection"))
  }

  /** The q95 estimate pipeline over a register table, as reusable SQL. */
  private def estFragSql(key: String, regTable: String, outName: String): String =
    s"""SELECT $key,
       |  round(CASE WHEN raw <= 1280e0 AND zeros > 0
       |        THEN 512e0 * ln(512e0 / CAST(zeros AS DOUBLE))
       |        ELSE raw END + 5e-10, 4) AS $outName
       |FROM (
       |  SELECT $key, zeros,
       |    (0.7213e0 / (1e0 + 1.079e0 / 512e0)) * 512e0 * 512e0 /
       |      (CAST(s_total AS DOUBLE) / 4503599627370496e0) AS raw
       |  FROM (
       |    SELECT $key, (512 - filled) AS zeros,
       |      s_scaled + (512 - filled) * (1::BIGINT << 52) AS s_total
       |    FROM (
       |      SELECT $key, COUNT(1) AS filled,
       |        SUM(1::BIGINT << (52 - reg)) AS s_scaled
       |      FROM $regTable GROUP BY $key
       |    )
       |  )
       |)""".stripMargin

  val q125Sql: String =
    s"""WITH $tokCte,
       |h AS (
       |  SELECT source, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM tk
       |),
       |br AS (
       |  SELECT source, CAST(h % 512 AS INT) AS bucket,
       |    CASE WHEN h // 512 = 0 THEN 52
       |         ELSE CAST(round(log2((h // 512) & (-(h // 512)))) AS INT) + 1
       |    END AS rho
       |  FROM h
       |),
       |reg AS (SELECT source, bucket, MAX(rho) AS reg FROM br GROUP BY source, bucket),
       |srcs AS (SELECT DISTINCT source FROM tk),
       |pairs AS (
       |  SELECT a.source AS sa, b.source AS sb
       |  FROM srcs a JOIN srcs b ON a.source < b.source
       |),
       |ureg AS (
       |  SELECT p.sa, p.sb, r.bucket, MAX(r.reg) AS reg
       |  FROM pairs p JOIN reg r ON r.source = p.sa OR r.source = p.sb
       |  GROUP BY 1, 2, 3
       |),
       |ea AS (${estFragSql("source", "reg", "est")}),
       |eu AS (${estFragSql("sa, sb", "ureg", "est_union")}),
       |td AS (SELECT DISTINCT source, tok FROM tk),
       |ex AS (
       |  SELECT t1.source AS sa, t2.source AS sb, COUNT(1) AS exact_intersection
       |  FROM td t1 JOIN td t2 ON t1.tok = t2.tok AND t1.source < t2.source
       |  GROUP BY 1, 2
       |)
       |SELECT p.sa AS source_a, p.sb AS source_b,
       |  a1.est AS est_a, a2.est AS est_b, eu.est_union,
       |  round(a1.est + a2.est - eu.est_union, 4) AS est_intersection,
       |  COALESCE(ex.exact_intersection, 0) AS exact_intersection
       |FROM pairs p
       |JOIN ea a1 ON a1.source = p.sa
       |JOIN ea a2 ON a2.source = p.sb
       |JOIN eu ON eu.sa = p.sa AND eu.sb = p.sb
       |LEFT JOIN ex ON ex.sa = p.sa AND ex.sb = p.sb""".stripMargin

  // ---------------------------------------------------------------- q96

  /** q96: token heavy hitters via a Count-Min sketch (4×1024 counters)
    * probed at the exact global top-10 — est ≥ exact by construction, and
    * the d·w cell table is corpus-size-independent and mergeable by
    * addition. The cells build runs over the PRE-AGGREGATED token frequency
    * table (groupBy first, then 4 cells per distinct token), so the sketch
    * pass shuffles vocabulary-sized data, not corpus-sized.
    */
  def q96HeavyHitters(spark: SparkSession, sfDir: String): DataFrame = {
    val freq = graft.core.CacheLife.scoped(
      toks(spark, sfDir).groupBy("tok").agg(count(lit(1)).as("cnt")).persist())
    val cells = Sketches.cmsCells(freq, col("tok"), col("cnt"))
    val probes = freq.orderBy(col("cnt").desc, col("tok")).limit(10)
    val est = Sketches.cmsEstimate(cells, probes.select("tok"), "tok")
    probes.join(est, "tok")
      .select(col("tok"), col("cnt").as("exact_count"), col("cms_est"))
  }

  val q96Sql: String =
    s"""WITH $tokCte,
       |f AS (SELECT tok, COUNT(1) AS cnt FROM tk GROUP BY tok),
       |rs AS (SELECT unnest(generate_series(0, 3)) AS r),
       |cells AS (
       |  SELECT r,
       |    CAST(('0x' || substr(md5(CAST(r AS VARCHAR) || ':' || tok), 1, 15))::BIGINT
       |      % 1024 AS INT) AS c,
       |    SUM(cnt) AS cellcnt
       |  FROM f CROSS JOIN rs GROUP BY 1, 2
       |),
       |probes AS (SELECT tok, cnt FROM f ORDER BY cnt DESC, tok LIMIT 10),
       |pc AS (
       |  SELECT p.tok, r,
       |    CAST(('0x' || substr(md5(CAST(r AS VARCHAR) || ':' || p.tok), 1, 15))::BIGINT
       |      % 1024 AS INT) AS c
       |  FROM probes p CROSS JOIN rs
       |),
       |est AS (
       |  SELECT pc.tok, CAST(MIN(cells.cellcnt) AS BIGINT) AS cms_est
       |  FROM pc JOIN cells USING (r, c) GROUP BY pc.tok
       |)
       |SELECT probes.tok, probes.cnt AS exact_count, est.cms_est
       |FROM probes JOIN est USING (tok)""".stripMargin

  // ---------------------------------------------------------------- q97

  /** q97: exact order statistics over lineitem prices without a global
    * sort — extrema pass, bounded histogram pass (≤1024 counts collected,
    * the two-phase prefix-scan pattern), then a per-bucket window over ONLY
    * the rank-bearing buckets. The oracle computes the same "lower" ranks
    * by brute-force row_number, so any histogram/rank bookkeeping slip
    * breaks the hash.
    */
  val Quantiles: Seq[Double] = Seq(0.25, 0.5, 0.9, 0.99)

  def q97Quantiles(spark: SparkSession, sfDir: String): DataFrame =
    Sketches.exactQuantiles(
      Tables.load(spark, sfDir, "lineitem"), "l_extendedprice", Quantiles)

  val q97Sql: String = {
    val vals = Quantiles.map(q => s"($q)").mkString(", ")
    s"""WITH v AS (SELECT l_extendedprice AS v FROM lineitem),
       |n AS (SELECT COUNT(1) AS c FROM v),
       |r AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM v),
       |qs AS (SELECT CAST(q AS DOUBLE) AS q FROM (VALUES $vals) t(q))
       |SELECT q, r.v AS value
       |FROM qs JOIN r
       |  ON r.rn = CAST(floor(q * ((SELECT c FROM n) - 1)) AS BIGINT) + 1""".stripMargin
  }

  // ---------------------------------------------------------------- q98

  /** q98: per-key exact quantiles with NO driver step at all
    * (Sketches.groupedQuantiles — the histogram, the cumulative ranks, and
    * the bucket resolution are all plan operators), so the key cardinality
    * is unbounded. Probed at order-priority price percentiles; the oracle
    * is the brute-force per-key row_number.
    */
  val GroupedQs: Seq[Double] = Seq(0.5, 0.95)

  def q98GroupedQuantiles(spark: SparkSession, sfDir: String): DataFrame =
    Sketches.groupedQuantiles(
      Tables.load(spark, sfDir, "orders"), "o_orderpriority", "o_totalprice",
      GroupedQs)

  val q98Sql: String = {
    val vals = GroupedQs.map(q => s"($q)").mkString(", ")
    s"""WITH v AS (SELECT o_orderpriority AS k, o_totalprice AS v FROM orders),
       |n AS (SELECT k, COUNT(1) AS c FROM v GROUP BY k),
       |r AS (SELECT k, v, row_number() OVER (PARTITION BY k ORDER BY v) AS rn FROM v),
       |qs AS (SELECT CAST(q AS DOUBLE) AS q FROM (VALUES $vals) t(q))
       |SELECT r.k AS o_orderpriority, q, r.v AS value
       |FROM qs CROSS JOIN n
       |JOIN r ON r.k = n.k AND r.rn = CAST(floor(q * (n.c - 1)) AS BIGINT) + 1""".stripMargin
  }

  // ---------------------------------------------------------------- q183

  /** q183: WEIGHTED KLL over the pre-aggregated (source, n_chars, count)
    * histogram — the shape quantile work actually arrives in at 100 TB
    * (an upstream groupBy already collapsed the corpus): `kll_sketch_w`
    * inserts each value once per set bit of its count, so the sketch
    * build is O(distinct values · popcount), never corpus-sized, and the
    * result is IDENTICAL to sketching the raw rows (the extractor's
    * 2^level weights see exactly the same multiset). Exact regime at test
    * scale — the oracle is the same brute rank SQL as the raw-row path,
    * which is the point: pre-aggregation must not change a single answer.
    */
  val WeightedQs: Seq[Double] = Seq(0.1, 0.5, 0.95)

  def q183KllWeighted(spark: SparkSession, sfDir: String): DataFrame = {
    val hist = Tables.load(spark, sfDir, "documents")
      .groupBy("source", "n_chars").agg(count(lit(1)).as("cnt"))
    val sk = hist.groupBy("source")
      .agg(expr("kll_sketch_w(n_chars, cnt, 8192)").as("sk"))
    graft.operators.Kll.quantilesFromSketch(sk, Seq("source"), "sk", WeightedQs)
  }

  val q183Sql: String = {
    val vals = WeightedQs.map(q => s"($q)").mkString(", ")
    s"""WITH v AS (SELECT source, n_chars AS v FROM documents),
       |n AS (SELECT source, COUNT(1) AS c FROM v GROUP BY source),
       |r AS (SELECT source, v, row_number() OVER (PARTITION BY source ORDER BY v) AS rn FROM v),
       |qs AS (SELECT CAST(q AS DOUBLE) AS q FROM (VALUES $vals) t(q))
       |SELECT r.source, q, r.v AS value
       |FROM qs CROSS JOIN n
       |JOIN r ON r.source = n.source
       |  AND r.rn = CAST(floor(q * (n.c - 1)) AS BIGINT) + 1""".stripMargin
  }

  // ---------------------------------------------------------------- q178

  /** q178: EXACT heavy hitters (count > n/200) without a vocabulary-wide
    * shuffle — `Sketches.exactHeavyHitters`, the two-pass Misra–Gries
    * prune: per-partition O(k) summaries make a bounded candidate set
    * (superset guaranteed by pigeonhole), then an exact candidate-only
    * recount. Complements q96 (CMS needs a probe list and over-counts;
    * this finds the heavy set itself, exactly). The oracle is the brute
    * vocabulary groupBy with the same strict threshold — the engine must
    * reproduce it from bounded memory.
    */
  def q178ExactHeavyHitters(spark: SparkSession, sfDir: String): DataFrame =
    Sketches.exactHeavyHitters(toks(spark, sfDir), "tok", k = 200)

  val q178Sql: String =
    s"""WITH $tokCte,
       |n AS (SELECT COUNT(1) AS c FROM tk)
       |SELECT tok, CAST(COUNT(1) AS BIGINT) AS cnt
       |FROM tk GROUP BY tok
       |HAVING COUNT(1) * 200 > (SELECT c FROM n)""".stripMargin

  // ---------------------------------------------------------------- q176

  /** q176: per-source document-length quantiles via the MERGEABLE KLL
    * sketch (`kll_sketch` — the native TypedImperativeAggregate) +
    * the declarative explode/window extractor. At test scale the
    * capacity (k=8192) exceeds every group, so no compaction fires and
    * the sketch is EXACT — which lets the brute rank-SQL oracle verify
    * the aggregate → struct → extractor plumbing end to end; the
    * APPROXIMATE regime (small k, forced compactions, measured rank-error
    * bounds, shard merges) is gated by KllSpec and the ScaleBench kll
    * gate instead, since no SQL oracle can replay compaction.
    */
  val KllQs: Seq[Double] = Seq(0.5, 0.9, 0.99)

  def q176KllQuantiles(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val sk = docs.groupBy("source").agg(expr("kll_sketch(n_chars, 8192)").as("sk"))
    graft.operators.Kll.quantilesFromSketch(sk, Seq("source"), "sk", KllQs)
  }

  val q176Sql: String = {
    val vals = KllQs.map(q => s"($q)").mkString(", ")
    s"""WITH v AS (SELECT source, n_chars AS v FROM documents),
       |n AS (SELECT source, COUNT(1) AS c FROM v GROUP BY source),
       |r AS (SELECT source, v, row_number() OVER (PARTITION BY source ORDER BY v) AS rn FROM v),
       |qs AS (SELECT CAST(q AS DOUBLE) AS q FROM (VALUES $vals) t(q))
       |SELECT r.source, q, r.v AS value
       |FROM qs CROSS JOIN n
       |JOIN r ON r.source = n.source
       |  AND r.rn = CAST(floor(q * (n.c - 1)) AS BIGINT) + 1""".stripMargin
  }

  // ---------------------------------------------------------------- q177

  /** q177: the ROLLUP path — per-source KLL sketches re-aggregated with
    * `kll_merge` into ONE corpus-level sketch, then extracted. This is
    * the shape that matters at 100 TB: per-shard/per-day sketches of
    * O(k·log) longs roll up to any coarser grain WITHOUT re-touching the
    * data (the exact passes q97/q98 re-scan the union instead). Exact
    * regime at test scale (capacity > corpus) keeps the brute rank
    * oracle valid through BOTH aggregation levels.
    */
  val RollupQs: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.95)

  def q177KllRollup(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val perSource = docs.groupBy("source")
      .agg(expr("kll_sketch(n_chars, 8192)").as("sk"))
    val rolled = perSource.agg(expr("kll_merge(sk)").as("sk"))
    graft.operators.Kll.quantilesFromSketch(rolled, Seq.empty, "sk", RollupQs)
  }

  val q177Sql: String = {
    val vals = RollupQs.map(q => s"($q)").mkString(", ")
    s"""WITH v AS (SELECT n_chars AS v FROM documents),
       |n AS (SELECT COUNT(1) AS c FROM v),
       |r AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM v),
       |qs AS (SELECT CAST(q AS DOUBLE) AS q FROM (VALUES $vals) t(q))
       |SELECT q, r.v AS value
       |FROM qs JOIN r
       |  ON r.rn = CAST(floor(q * ((SELECT c FROM n) - 1)) AS BIGINT) + 1""".stripMargin
  }

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q95_hll_distinct", q95HllDistinct, Some(q95Sql)),
    QueryDef("q176_kll_quantiles", q176KllQuantiles, Some(q176Sql)),
    QueryDef("q177_kll_rollup", q177KllRollup, Some(q177Sql)),
    QueryDef("q178_exact_heavy_hitters", q178ExactHeavyHitters, Some(q178Sql)),
    QueryDef("q183_kll_weighted", q183KllWeighted, Some(q183Sql)),
    QueryDef("q96_heavy_hitters", q96HeavyHitters, Some(q96Sql)),
    QueryDef("q97_quantiles", q97Quantiles, Some(q97Sql)),
    QueryDef("q98_grouped_quantiles", q98GroupedQuantiles, Some(q98Sql)),
    QueryDef("q125_hll_setops", q125HllSetOps, Some(q125Sql)))
}
