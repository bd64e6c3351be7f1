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
    val est = Sketches.hllEstimate(
      Sketches.hllRegisters(t, col("tok"), Seq("source")), Seq("source"))
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

  // ---------------------------------------------------------------- q96

  /** q96: token heavy hitters via a Count-Min sketch (4×1024 counters)
    * probed at the exact global top-10 — est ≥ exact by construction, and
    * the d·w cell table is corpus-size-independent and mergeable by
    * addition. The cells build runs over the PRE-AGGREGATED token frequency
    * table (groupBy first, then 4 cells per distinct token), so the sketch
    * pass shuffles vocabulary-sized data, not corpus-sized.
    */
  def q96HeavyHitters(spark: SparkSession, sfDir: String): DataFrame = {
    val freq = toks(spark, sfDir).groupBy("tok").agg(count(lit(1)).as("cnt")).persist()
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
       |  SELECT pc.tok, MIN(cells.cellcnt) AS cms_est
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

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q95_hll_distinct", q95HllDistinct, Some(q95Sql)),
    QueryDef("q96_heavy_hitters", q96HeavyHitters, Some(q96Sql)),
    QueryDef("q97_quantiles", q97Quantiles, Some(q97Sql)),
    QueryDef("q98_grouped_quantiles", q98GroupedQuantiles, Some(q98Sql)))
}
