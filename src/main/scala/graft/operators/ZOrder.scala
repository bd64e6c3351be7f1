package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering — the lakehouse data-skipping layout
  * (Delta/Iceberg `OPTIMIZE ZORDER BY`): interleave the bits of several
  * filter dimensions into one sort key, range-partition + sort files by
  * it, and every file ends up covering a TIGHT hyper-rectangle of all the
  * interleaved dimensions at once — so min/max file stats prune scans
  * filtered on ANY of them, where a linear sort only ever serves its
  * leading column.
  *
  * At 100 TB this is the difference between "point-range query reads the
  * whole table" and "reads a few files": the write pays one range
  * shuffle; every subsequent multi-dimension scan skips. The interleave
  * itself is a pure arithmetic column expression (whole-stage codegen,
  * no UDF).
  */
object ZOrder {

  /** Morton interleave of `cols` (non-negative ints < 2^bits; caller
    * buckets/ranks first — modular bucketing or quantile ranks both
    * work). Bit b of column i lands at position `b·n + i`. Requires
    * `bits · n ≤ 63`. */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    val n = cols.size
    require(n >= 1 && bits * n <= 63, s"z-order: $n cols × $bits bits exceeds a long")
    val terms = for {
      b <- 0 until bits
      (c, i) <- cols.zipWithIndex
    } yield shiftright(c.cast("long"), b).bitwiseAND(lit(1L)) * lit(1L << (b * n + i))
    terms.reduce(_ + _)
  }

  /** Write `df` z-clustered on `cols` into `files` parquet files: range
    * partition by the z-value, sort within each file. Each output file
    * then spans a contiguous z-range = a small hyper-rectangle in the
    * original dimensions (the skipping precondition ZOrderSpec measures).
    */
  def clusterWrite(df: DataFrame, dir: String, cols: Seq[String], bits: Int,
      files: Int): Unit =
    df.withColumn("__z", zValue(cols.map(col), bits))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(dir)
}
