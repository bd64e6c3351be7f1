package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pareto-front (skyline) selection — the multi-criteria shortlist
  * operator (Börzsönyi, Kossmann & Stocker, ICDE 2001): keep the rows no
  * other row dominates. The curation use: pick the quality/length or
  * quality/recency frontier of a candidate pool per domain instead of a
  * single weighted score that hides the trade-off.
  */
object Skyline {

  /** Per-group 2D Pareto front over integral columns `xCol`, `yCol`, both
    * maximized: row q dominates p (same group) iff q.x ≥ p.x ∧ q.y ≥ p.y
    * with at least one strict. Exact (x, y) duplicates do not dominate
    * each other — all copies survive together.
    *
    * The sweep is declarative — two window passes over ONE hash exchange
    * on the group keys: a row survives iff its y equals the max y of its
    * exact-x block (same-x dominance) AND strictly exceeds the max y over
    * all STRICTLY greater x (cross-x dominance, a range frame ending at
    * offset −1 under descending x — which is why x must be integral:
    * offset arithmetic defines strictness). O(n log n) per group against
    * the O(n²) dominance self-join, parallel across groups; the oracle
    * replays the same semantics as a brute NOT EXISTS, so the two
    * independent formulations must agree row-for-row.
    *
    * Group count is the parallelism at scale; for one global group use a
    * per-partition pre-prune (`mapPartitions` local sweep) before this —
    * the classic two-phase skyline — since a single group serializes onto
    * one reducer.
    */
  def paretoFront2D(df: DataFrame, keys: Seq[String], xCol: String,
      yCol: String): DataFrame = {
    require(keys.nonEmpty, "paretoFront2D needs at least one group key")
    val part = keys.map(col)
    val wStrict = Window.partitionBy(part: _*).orderBy(col(xCol).desc)
      .rangeBetween(Window.unboundedPreceding, -1)
    val wBlock = Window.partitionBy(part :+ col(xCol): _*)
    df.withColumn("__besty", max(col(yCol)).over(wStrict))
      .withColumn("__blocky", max(col(yCol)).over(wBlock))
      .where(col(yCol) === col("__blocky") &&
        (col("__besty").isNull || col(yCol) > col("__besty")))
      .drop("__besty", "__blocky")
  }
}
