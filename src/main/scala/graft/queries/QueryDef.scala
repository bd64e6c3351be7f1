package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One engine query + its DuckDB oracle.
  *
  * The driver's correctness gate (Verify → DuckDB → hash compare) sorts
  * columns by name and hashes values, so:
  *   - every computed column is aliased identically in Spark and SQL;
  *   - floating outputs are rounded (or decimal-exact-summed) on BOTH sides
  *     so libm/summation-order ULP differences can't flip the hash.
  *
  * `oracle` is the usual static SQL;
  * `dynamicOracle` covers queries whose oracle embeds DATA-DEPENDENT
  * constants computed while the query ran (q193: the fitted PCA mean and
  * components become literals, the q141 interpolation pattern) — Verify
  * dumps oracle_sql.json AFTER running every query, so the thunk sees the
  * fitted values; it returns None when the query never ran (driver then
  * records the weaker rows-only check, same as a missing oracle). */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    dynamicOracle: Option[() => Option[String]] = None)

object QueryDef {

  /** Exact double sum: round to 2 decimals per element, sum as decimal
    * (associative, engine-order-independent), return as double. Matches
    * `CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)` in DuckDB bit-for-bit.
    */
  def exactSum(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast("double")

  /** Same with 6 fractional digits for small-magnitude values. */
  def exactSum6(c: Column): Column = sum(c.cast(DecimalType(24, 6))).cast("double")

  /** 2-decimal column as exact decimal. Inputs that ARE 2-decimal values
    * stored as doubles cast safely (the binary error is ~1e-13, never near
    * the .005 rounding boundary). Products must be computed AFTER this cast:
    * a double product like 1148.145 sits exactly on the half boundary and
    * Spark/DuckDB round it differently.
    */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Exact sum of a·b where both factors carry ≤2 decimals. */
  def exactSumProd(a: Column, b: Column): Column =
    sum(dec2(a) * dec2(b)).cast("double")

  def r4(c: Column): Column = round(c, 4)
  def r6(c: Column): Column = round(c, 6)

  /** Tie-broken 6-decimal round for values whose DECIMAL EXPANSION
    * TERMINATES on the half boundary (window means of 6-decimal grid
    * values land exactly on x.xxxxx5, where Spark's shortest-string
    * HALF_UP and DuckDB's binary rounding disagree). The 5e-10 nudge moves
    * the ambiguity zone off every representable data point; the SQL twin
    * is `ROUND(x + 5e-10, 6)`. Direction-consistent for negatives too —
    * both engines see the same nudged double.
    */
  def r6t(c: Column): Column = round(c + lit(5e-10), 6)
}
