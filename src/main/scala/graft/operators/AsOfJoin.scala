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
  * Tie policy (deterministic): right rows AT the left timestamp are
  * eligible; among equal timestamps the largest `rightOrd` wins.
  */
object AsOfJoin {

  /** @param left      rows to annotate; must contain `keyCol`, `tsCol`
    * @param right     reference stream; must contain `keyCol`, `tsCol`, `rightOrd`, payload
    * @param payload   right columns carried onto left rows (as-of values)
    */
  def asOf(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
      rightOrd: String, payload: Seq[String]): DataFrame = {
    val leftCols = left.columns
    // ALL payload columns ride in one struct so last(ignoreNulls) picks the
    // whole latest right row atomically — a per-column last() would skip
    // genuinely-NULL payload values and could mix values from different
    // right rows (the struct itself is never null for right rows).
    val payloadStruct = struct(payload.map(col): _*)
    val nullStruct = lit(null).cast(
      org.apache.spark.sql.types.StructType(payload.map(p => right.schema(p))))
    // marker orders right (0) before left (1) at equal timestamps
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
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col("__side").asc, col("__ord").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val annotated = l.unionByName(r)
      .select((Seq(col(keyCol), col(tsCol), col("__side")) ++
        leftCols.filterNot(c => c == keyCol || c == tsCol).map(col) :+
        last(col("__p"), ignoreNulls = true).over(w).as("__asof")): _*)
    annotated.filter(col("__side") === 1)
      .select((Seq(col(keyCol), col(tsCol)) ++
        leftCols.filterNot(c => c == keyCol || c == tsCol).map(col) ++
        payload.map(p => col(s"__asof.$p").as(s"asof_$p"))): _*)
  }
}
