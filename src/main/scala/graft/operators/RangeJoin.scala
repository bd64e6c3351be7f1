package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join via bucket expansion.
  *
  * Spark has no range-join operator: a bare `p.ts BETWEEN i.start AND i.end`
  * predicate with no equi-key plans as BroadcastNestedLoopJoin —
  * O(|points|·|intervals|) comparisons, the classic 100 TB cliff. Bucketizing
  * time turns it into an EQUI join: each interval explodes to the buckets it
  * overlaps (len/bucketWidth + 1 rows), each point maps to exactly one
  * bucket, the hash join meets candidates only within a bucket, and the
  * residual range predicate filters exactly. Work is proportional to true
  * overlaps, shuffles partition uniformly by bucket, and AQE can split a hot
  * bucket.
  *
  * Pick `bucketWidth` near the median interval length: much smaller means
  * wide expansion of long intervals; much larger means many false candidates
  * per bucket.
  */
object RangeJoin {

  /** Join each point row (integer `ptCol`) to every interval row whose
    * `[startCol, endCol)` contains it. All three columns must be the same
    * integer unit (e.g. epoch ns).
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame, ptCol: String,
      startCol: String, endCol: String, bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(!points.columns.contains("__bucket") && !intervals.columns.contains("__bucket"),
      "__bucket is reserved by RangeJoin")
    // empty/inverted intervals ([s, e) with e <= s) contain no point and
    // would explode to a DESCENDING bucket sequence (spurious buckets);
    // drop them before the expansion — exactly the half-open semantics
    val p = points.withColumn("__bucket", expr(s"$ptCol DIV $bucketWidth"))
    val iv = intervals.where(col(endCol) > col(startCol))
      .withColumn("__bucket",
        explode(sequence(expr(s"$startCol DIV $bucketWidth"),
          expr(s"($endCol - 1) DIV $bucketWidth"))))
    iv.join(p, Seq("__bucket"))
      .where(col(ptCol) >= col(startCol) && col(ptCol) < col(endCol))
      .drop("__bucket")
  }

  /** Join each left interval `[lStart, lEnd)` to every right interval
    * `[rStart, rEnd)` it overlaps (lStart < rEnd AND rStart < lEnd).
    * Both sides explode to the buckets they cover and candidates meet
    * per bucket, but a pair overlapping across SEVERAL shared buckets
    * is kept only in its CANONICAL one — the bucket containing
    * max(lStart, rStart), which every overlapping pair covers on both
    * sides exactly once — so no dedup shuffle is needed (the
    * reference-point trick from spatial joins). A bare overlap
    * predicate has no equi-key and plans the O(|L|·|R|) BNLJ cliff;
    * this is one equi-shuffle each side with work proportional to
    * bucket-local candidate pairs. Columns must be non-negative
    * integers in one unit (epoch ns). Empty/inverted intervals
    * ([s, e) with e <= s) overlap nothing under half-open semantics
    * and are dropped before the expansion — without the filter they
    * would explode to descending (spurious) bucket sequences and
    * [s, s) would wrongly match any interval containing s.
    */
  def intervalOverlap(left: DataFrame, right: DataFrame,
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(!left.columns.contains("__bucket") && !right.columns.contains("__bucket"),
      "__bucket is reserved by RangeJoin")
    val l = left.where(col(lEnd) > col(lStart))
      .withColumn("__bucket",
        explode(sequence(expr(s"$lStart DIV $bucketWidth"),
          expr(s"($lEnd - 1) DIV $bucketWidth"))))
    val r = right.where(col(rEnd) > col(rStart))
      .withColumn("__bucket",
        explode(sequence(expr(s"$rStart DIV $bucketWidth"),
          expr(s"($rEnd - 1) DIV $bucketWidth"))))
    l.join(r, Seq("__bucket"))
      .where(col(lStart) < col(rEnd) && col(rStart) < col(lEnd))
      .where(expr(s"greatest($lStart, $rStart) DIV $bucketWidth") === col("__bucket"))
      .drop("__bucket")
  }
}
