package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salt-based skew-resistant equi-join.
  *
  * A hot join key at 100 TB lands every matching row on ONE reducer — the
  * stage runs at the speed of its most skewed task. Salting fans a hot key
  * out over `salts` reducers: the large (skewed) side gets a deterministic
  * salt in [0, salts) derived from a row-unique column, the small side is
  * replicated once per salt value, and the join key becomes (key, salt).
  * Row-for-row equivalent to the plain equi-join (verified by the q54
  * oracle, which IS the plain join).
  *
  * This is the manual fallback for when AQE skew-join splitting
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default in our sessions)
  * can't help: AQE only splits map-output partitions of *sort-merge* joins,
  * while salting also covers hash joins, pre-shuffle bucketing, and
  * streaming state stores (no AQE there).
  *
  * The reference has no relational joins (SURVEY.md §2.9) — this belongs to
  * the engine's scale layer, like the LSH bucket join in [[Similarity]].
  */
object SkewJoin {

  /** Join `big` (skew-prone) with `small` on `bigKey == smallKey`.
    *
    * @param saltSrc row-level expression on `big` that varies within a hot
    *                key (e.g. its primary key) — hashed into the salt so the
    *                hot key's rows spread uniformly
    * @param salts   fan-out factor; replication cost is `salts` × |small|
    */
  def salted(big: DataFrame, small: DataFrame, bigKey: String, smallKey: String,
      saltSrc: Column, salts: Int = 8): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(!big.columns.contains("__salt") && !small.columns.contains("__salt"),
      "__salt is reserved by SkewJoin")
    val b = big.withColumn("__salt", pmod(hash(saltSrc), lit(salts)))
    val s = small.withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    // side-qualified key references: col(...) would be ambiguous whenever
    // both sides use the same key column name
    b.join(s, b("__salt") === s("__salt") && b(bigKey) === s(smallKey))
      .drop("__salt")
  }
}
