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
    * (the row is kept — as-of is always a left join).
    *
    * `bucketWidth` (in `tsCol` units, cast to long) is the SKEW option:
    * the plain path's `Window.partitionBy(key)` funnels one hot entity's
    * full history through a single task — a straggler cliff when one key
    * holds most of the rows. With `bucketWidth > 0` the window runs per
    * (key, floor(ts/bucketWidth)) instead, and cross-bucket matches are
    * carried by a BUCKET-SUMMARY side pass: one combinable groupBy reduces
    * the right side to its per-bucket best backward/forward candidate,
    * a per-key window over that summary table (rows = #buckets, never
    * data-sized) accumulates each bucket's carry-in/carry-out, and a
    * co-partitioned (key, bucket) join hands them back. Results are
    * IDENTICAL to the plain path (AsOfJoinSpec proves equality across
    * directions and tolerances); only the partitioning changes. */
  def asOfDirected(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, rightOrd: String, payload: Seq[String],
      direction: String = "backward",
      tolerance: Long = Long.MaxValue,
      bucketWidth: Long = 0L): DataFrame = {
    require(Set("backward", "forward", "nearest")(direction),
      s"direction must be backward/forward/nearest, got '$direction'")
    require(tolerance >= 0, s"tolerance must be non-negative, got $tolerance")
    if (bucketWidth > 0)
      return asOfBucketed(left, right, keyCol, tsCol, rightOrd, payload,
        direction, tolerance, bucketWidth)
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

  /** Skew-safe two-pass as-of (see [[asOfDirected]]'s `bucketWidth` doc).
    *
    * Pass 1 (big data, per-BUCKET windows): the same union+window as the
    * plain path but partitioned by (key, ts-bucket) — the hot key's
    * history splits across #buckets tasks.
    * Pass 2 (summary-sized): the best within-bucket candidate can miss a
    * match in another bucket, so each (key, bucket) gets a carry-in (the
    * latest right row of any EARLIER bucket — a backward match is best
    * when latest, and anything in a later-yet-still-earlier bucket beats
    * every older bucket's rows) and a carry-out (the earliest right row of
    * any LATER bucket, mirrored). Both come from one combinable groupBy
    * over the right side plus one per-key window over the bucket-summary
    * table; the local candidate, when present, always wins (same bucket ⇒
    * strictly closer in ts than any carried row), so
    * `coalesce(local, carry)` is exact, including the largest-ord tie
    * policy (equal timestamps land in the same bucket, where the window
    * order already breaks them; the summary picks max (ts, ord) / min
    * (ts, -ord) for the same reason).
    */
  private def asOfBucketed(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, rightOrd: String, payload: Seq[String],
      direction: String, tolerance: Long, bucketWidth: Long): DataFrame = {
    val leftCols = left.columns
    def tsL(c: Column): Column = c.cast("long")
    // Exact Long bucket ids at ANY timestamp magnitude: the width rounds
    // UP to a power of two (results are width-invariant — the boundary
    // carry makes bucketed ≡ plain for every width, spec-asserted — only
    // the bucket count shifts by <2×), so the floor division is an
    // arithmetic shift after the pmod subtraction. Column `/` on longs
    // is DOUBLE division (rounds the numerator past 2⁵³ — nanosecond
    // epochs would get drifting, non-integral, double-typed keys) and
    // DECIMAL division costs ~whole-stage codegen (measured +23 s on the
    // 22M-row skew gate); the shift is exact and free.
    val w2log: Int = math.min(62,
      64 - java.lang.Long.numberOfLeadingZeros(math.max(bucketWidth, 1L) - 1))
    val w2: Long = 1L << w2log
    def bktOf(c: Column): Column =
      shiftright(tsL(c) - pmod(tsL(c), lit(w2)), w2log)

    // the same atomic payload struct as the plain path
    val payloadStruct = struct(tsL(col(tsCol)).as("__ats") +: payload.map(col): _*)
    val nullStruct = lit(null).cast(
      org.apache.spark.sql.types.StructType(
        org.apache.spark.sql.types.StructField("__ats",
          org.apache.spark.sql.types.LongType) +:
          payload.map(p => right.schema(p))))
    // carried summary structs hold an extra ordering field — strip it so
    // coalesce(local, carry) sees one struct type (guarded: getField on a
    // NULL struct yields a non-null struct of nulls)
    def strip(c: Column): Column = when(c.isNotNull,
      struct(c.getField("__ats").as("__ats") +:
        payload.map(p => c.getField(p).as(p)): _*))

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
    val u = l.unionByName(r).withColumn("__bkt", bktOf(col(tsCol)))

    // per-(key, bucket) right summaries: struct comparison is field-
    // lexicographic, so max(ts, ord, ...) IS "latest, largest ord on tie"
    // and min(ts, -ord, ...) IS "earliest, largest ord on tie"
    val rs = right.groupBy(col(keyCol), bktOf(col(tsCol)).as("__bkt")).agg(
      max(struct(tsL(col(tsCol)).as("__ats") +:
        col(rightOrd).cast("long").as("__o") +: payload.map(col): _*)).as("__lastb"),
      min(struct(tsL(col(tsCol)).as("__ats") +:
        negate(col(rightOrd).cast("long")).as("__o") +: payload.map(col): _*)).as("__firstb"))
    // bucket universe over BOTH sides, so left-only buckets still carry
    val universe = u.select(col(keyCol), col("__bkt")).distinct()
    val wPrev = Window.partitionBy(col(keyCol)).orderBy(col("__bkt").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wNext = Window.partitionBy(col(keyCol)).orderBy(col("__bkt").asc)
      .rowsBetween(1, Window.unboundedFollowing)
    val carry = universe.join(rs, Seq(keyCol, "__bkt"), "left")
      .select(col(keyCol), col("__bkt"),
        last(col("__lastb"), ignoreNulls = true).over(wPrev).as("__carryB"),
        first(col("__firstb"), ignoreNulls = true).over(wNext).as("__carryF"))

    val wB = Window.partitionBy(col(keyCol), col("__bkt"))
      .orderBy(col(tsCol).asc, col("__side").asc, col("__ord").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(col(keyCol), col("__bkt"))
      .orderBy(col(tsCol).asc, col("__side").desc, col("__ord").desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val needB = direction != "forward"
    val needF = direction != "backward"
    val withLocal = u
      .withColumn("__lb", if (needB) last(col("__p"), ignoreNulls = true).over(wB) else lit(null))
      .withColumn("__lf", if (needF) first(col("__p"), ignoreNulls = true).over(wF) else lit(null))
      .join(carry, Seq(keyCol, "__bkt"), "left")
    val bestB = coalesce(col("__lb"), strip(col("__carryB")))
    val bestF = coalesce(col("__lf"), strip(col("__carryF")))
    val picked = direction match {
      case "backward" => bestB
      case "forward" => bestF
      case "nearest" =>
        val db = abs(tsL(col(tsCol)) - bestB.getField("__ats"))
        val df_ = abs(tsL(col(tsCol)) - bestF.getField("__ats"))
        when(bestB.isNull, bestF)
          .when(bestF.isNull, bestB)
          .when(df_ < db, bestF)
          .otherwise(bestB)
    }
    withLocal
      .withColumn("__cand", picked)
      .withColumn("__asof",
        when(abs(tsL(col(tsCol)) - col("__cand.__ats")) <= tolerance,
          col("__cand")))
      .filter(col("__side") === 1)
      .select((Seq(col(keyCol), col(tsCol)) ++
        leftCols.filterNot(c => c == keyCol || c == tsCol).map(col) ++
        payload.map(p => col(s"__asof.$p").as(s"asof_$p"))): _*)
  }
}
