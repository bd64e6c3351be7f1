package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the most recent right row at or before
  * its timestamp, per key. Spark has no native ASOF operator; composing
  * existing ops (SURVEY.md §2 preference (a)): union both sides, sort
  * within key, carry the latest right values forward with
  * `last_value(..., ignoreNulls)` — ONE shuffle on the key, no range
  * explosion, monotone memory. At 100 TB this beats the join+filter+rank
  * formulation (which materializes every candidate pair) by the full
  * right-side fan-in factor.
  *
  * [[asOfDirected]] extends the same union+window pass to the full
  * pandas/kdb as-of surface: direction `backward` (at-or-before, the
  * default), `forward` (at-or-after), `nearest` (closest in time, ties to
  * backward), and a `tolerance` bound that nulls matches farther than the
  * given timestamp gap. Forward is the mirrored frame
  * (`first(ignoreNulls)` over currentRow→following); nearest runs BOTH
  * frames over the SAME sorted partition — one extra window function,
  * still exactly one shuffle.
  *
  * Tie policy (deterministic): right rows AT the left timestamp are
  * eligible in every direction; among equal timestamps the largest
  * `rightOrd` wins; `nearest` breaks an exact |Δts| tie toward backward.
  */
object AsOfJoin {

  /** @param left      rows to annotate; must contain `keyCol`, `tsCol`
    * @param right     reference stream; must contain `keyCol`, `tsCol`, `rightOrd`, payload
    * @param payload   right columns carried onto left rows (as-of values)
    */
  def asOf(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
      rightOrd: String, payload: Seq[String]): DataFrame =
    asOfDirected(left, right, keyCol, tsCol, rightOrd, payload)

  /** [[asOf]] with direction and tolerance. `tolerance` is in `tsCol`
    * units; a match farther than it from the left timestamp yields nulls
    * (the row is kept — as-of is always a left join). */
  def asOfDirected(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, rightOrd: String, payload: Seq[String],
      direction: String = "backward",
      tolerance: Long = Long.MaxValue): DataFrame = {
    require(Set("backward", "forward", "nearest")(direction),
      s"direction must be backward/forward/nearest, got '$direction'")
    require(tolerance >= 0, s"tolerance must be non-negative, got $tolerance")
    val leftCols = left.columns
    // ALL payload columns (plus the right row's own timestamp, for
    // tolerance/nearest arithmetic) ride in one struct so the window's
    // last/first(ignoreNulls) picks the whole latest right row atomically —
    // a per-column pick would skip genuinely-NULL payload values and could
    // mix values from different right rows (the struct itself is never
    // null for right rows).
    val payloadStruct = struct(col(tsCol).cast("long").as("__ats") +:
      payload.map(col): _*)
    val nullStruct = lit(null).cast(
      org.apache.spark.sql.types.StructType(
        org.apache.spark.sql.types.StructField("__ats",
          org.apache.spark.sql.types.LongType) +:
          payload.map(p => right.schema(p))))
    // side marker: 0 = right, 1 = left. Backward orders right BEFORE left
    // at equal timestamps (so at-ts rights are inside the preceding
    // frame); forward orders left before right (inside the following one).
    val l = left
      .withColumn("__side", lit(1))
      .withColumn("__ord", lit(Long.MaxValue))
      .select((Seq(col(keyCol), col(tsCol), col("__side"), col("__ord")) ++
        leftCols.filterNot(c => c == keyCol || c == tsCol).map(col) :+
        nullStruct.as("__p")): _*)
    val r = right
      .withColumn("__side", lit(0))
      .withColumn("__ord", col(rightOrd).cast("long"))
      .select((Seq(col(keyCol), col(tsCol), col("__side"), col("__ord")) ++
        leftCols.filterNot(c => c == keyCol || c == tsCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        payloadStruct.as("__p")): _*)
    val u = l.unionByName(r)
    val wB = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col("__side").asc, col("__ord").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col("__side").desc, col("__ord").desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val back = last(col("__p"), ignoreNulls = true).over(wB)
    val fwd = first(col("__p"), ignoreNulls = true).over(wF)
    val picked = direction match {
      case "backward" => back
      case "forward" => fwd
      case "nearest" =>
        // closest |Δts| wins; an exact tie goes backward. Either side may
        // be null — coalesce through the comparison.
        val db = abs(col(tsCol).cast("long") - back.getField("__ats"))
        val df_ = abs(col(tsCol).cast("long") - fwd.getField("__ats"))
        when(back.isNull, fwd)
          .when(fwd.isNull, back)
          .when(df_ < db, fwd)
          .otherwise(back)
    }
    val annotated = u
      .select((Seq(col(keyCol), col(tsCol), col("__side")) ++
        leftCols.filterNot(c => c == keyCol || c == tsCol).map(col) :+
        picked.as("__cand")): _*)
      // tolerance: keep the row (left join), null the match beyond the gap
      .withColumn("__asof",
        when(abs(col(tsCol).cast("long") - col("__cand.__ats")) <= tolerance,
          col("__cand")))
    annotated.filter(col("__side") === 1)
      .select((Seq(col(keyCol), col(tsCol)) ++
        leftCols.filterNot(c => c == keyCol || c == tsCol).map(col) ++
        payload.map(p => col(s"__asof.$p").as(s"asof_$p"))): _*)
  }
}
