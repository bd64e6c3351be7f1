package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Pareto-front (skyline) selection — the multi-criteria shortlist
  * operator (Börzsönyi, Kossmann & Stocker, ICDE 2001): keep the rows no
  * other row dominates. The curation use: pick the quality/length or
  * quality/recency frontier of a candidate pool per domain instead of a
  * single weighted score that hides the trade-off.
  */
object Skyline {

  private def requireIntegral(df: DataFrame, c: String): Unit =
    df.schema(c).dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case other => throw new IllegalArgumentException(
        s"paretoFront2D: column '$c' must be integral (the strict-dominance " +
          s"window uses offset-1 range arithmetic, undefined for $other); " +
          "pre-scale fractional scores to fixed-point integers first")
    }

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
    * offset arithmetic defines strictness; enforced by a schema check so
    * a fractional x fails loudly instead of silently missing dominators
    * with 0 < Δx < 1). O(n log n) per group against the O(n²) dominance
    * self-join, parallel across groups; the oracle replays the same
    * semantics as a brute NOT EXISTS, so the two independent formulations
    * must agree row-for-row.
    *
    * Group count is the parallelism at scale; for ONE global group (or a
    * constant key) use [[paretoFront2DGlobal]] — the classic two-phase
    * skyline — since a single group serializes onto one reducer here.
    */
  def paretoFront2D(df: DataFrame, keys: Seq[String], xCol: String,
      yCol: String): DataFrame = {
    require(keys.nonEmpty, "paretoFront2D needs at least one group key; " +
      "use paretoFront2DGlobal for the keyless skyline")
    requireIntegral(df, xCol)
    requireIntegral(df, yCol)
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

  /** Global (keyless) 2D Pareto front by the classic two-phase sweep: a
    * single logical group would serialize all n rows onto one reducer in
    * [[paretoFront2D]]'s window, so phase 1 computes each PARTITION's
    * local skyline first — `sortWithinPartitions(x desc, y desc)` (Spark's
    * spillable per-partition sort, no exchange) followed by a streaming
    * one-pass scan holding only the running cross-x max and the current
    * x-block head — and only those survivors, bounded by the union of
    * local front sizes (typically ≪ n), reach the single-group window of
    * phase 2. A local skyline is a superset of the global front's members
    * in that partition (dominance is partition-independent), so the prune
    * is lossless; null x or y never dominates and never survives (matching
    * the window path, where null comparisons are false).
    */
  def paretoFront2DGlobal(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    requireIntegral(df, xCol)
    requireIntegral(df, yCol)
    require(!df.columns.contains("__g"), "__g is reserved by paretoFront2DGlobal")
    val schema = df.schema
    val xi = schema.fieldIndex(xCol)
    val yi = schema.fieldIndex(yCol)
    val pruned = df
      .where(col(xCol).isNotNull && col(yCol).isNotNull)
      .sortWithinPartitions(col(xCol).desc, col(yCol).desc)
      .mapPartitions { it =>
        // rows arrive x-desc, y-desc within x: the first row of each
        // x-block carries the block max y; survive iff head-of-block and
        // strictly above every y seen at greater x
        var hasPrev = false
        var bestPrevY = 0L // max y over strictly greater x, when hasPrev
        var curX = 0L
        var curBlockMax = 0L
        var first = true
        it.filter { row =>
          val x = row.get(xi).asInstanceOf[Number].longValue()
          val y = row.get(yi).asInstanceOf[Number].longValue()
          if (first || x != curX) {
            if (!first && (!hasPrev || curBlockMax > bestPrevY)) {
              bestPrevY = curBlockMax; hasPrev = true
            }
            curX = x; curBlockMax = y; first = false
          }
          y == curBlockMax && (!hasPrev || y > bestPrevY)
        }
      }(Encoders.row(schema))
    paretoFront2D(pruned.withColumn("__g", lit(1)), Seq("__g"), xCol, yCol)
      .drop("__g")
  }
}
