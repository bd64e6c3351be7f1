package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-pruned equi-join — the "runtime filter" pattern made an explicit,
  * composable operator.
  *
  * The 100 TB problem this solves: a fact↔dimension join where the dimension
  * is too big to broadcast-join (tens of GB) still forces a full shuffle of
  * the fact side — every fact row pays an exchange even though only a few
  * percent survive the join. But the dimension's KEY SET, compressed to a
  * Bloom filter, IS broadcastable at a fixed budget (`numBits/8` bytes
  * regardless of key count), so the fact side can be pruned map-side,
  * BEFORE its shuffle, at a configurable false-positive rate. The join that
  * follows eliminates the false positives, and Bloom filters have no false
  * negatives, so the result is bit-identical to the plain join — the bloom
  * is purely a shuffle/I-O reducer, never a correctness dependency.
  *
  * Spark-first: this IS the machinery of Catalyst's `InjectRuntimeFilter`
  * rule (`BloomFilterAggregate` → `BloomFilterMightContain`, both codegen'd,
  * exposed by graft.sql.GraftExtensions as `bloom_agg`/`bloom_might_contain`),
  * driven explicitly so it fires deterministically — the built-in rule keys
  * off byte-size estimates (`spark.sql.optimizer.runtimeFilter.*`) that
  * don't trip at test scale and can mis-judge skewed/compressed inputs
  * either way. Both sides hash with `xxhash64`, matching the aggregate's
  * put and the probe's might-contain.
  *
  * The one-row collect of the serialized filter is a BOUNDED driver
  * materialization (numBits/8 bytes, default 1 MB) of the same kind as the
  * LUT/codebook broadcasts audited in VERDICT — the key set itself never
  * reaches the driver.
  */
object BloomJoin {

  /** Default sized for ~1M distinct build keys at ~1% fpp. At larger build
    * cardinality raise both together (numBits ≈ -n·ln(fpp)/ln(2)²). */
  val DefaultItems: Long = 1000000L
  val DefaultBits: Long = 8L * 1024 * 1024

  /** Serialized Bloom filter (spark.util.sketch format) over
    * `xxhash64(keyCol)` of `build` — one distributed aggregate (map-side
    * partial blooms OR-merged), one bounded row back to the driver. */
  def buildFilter(build: DataFrame, keyCol: String,
      estItems: Long = DefaultItems, numBits: Long = DefaultBits): Array[Byte] = {
    build
      .select(call_function("bloom_agg",
        xxhash64(col(keyCol)), lit(estItems), lit(numBits)).as("bf"))
      .head().getAs[Array[Byte]]("bf")
  }

  /** `might_contain(serialized, xxhash64(key))` as a Column — codegen'd;
    * the deserialized filter is cached inside the expression (plan-lifetime),
    * not re-parsed per row. */
  def mightContain(serialized: Array[Byte], key: Column): Column =
    call_function("bloom_might_contain", lit(serialized), xxhash64(key))

  /** Equi-join `probe ⋈ build` with the probe side Bloom-pruned before its
    * shuffle. Result is bit-identical to `probe.join(build, keys)` (the
    * inner join re-checks every candidate); the bloom only thins the probe
    * side's exchange. Caller controls the join strategy via `build`-side
    * hints as usual (e.g. `.hint("shuffle_hash")` for the big-dimension
    * case this operator exists for).
    */
  def bloomPrunedJoin(probe: DataFrame, build: DataFrame,
      probeKey: String, buildKey: String,
      estItems: Long = DefaultItems, numBits: Long = DefaultBits): DataFrame = {
    val bf = buildFilter(build, buildKey, estItems, numBits)
    probe.where(mightContain(bf, col(probeKey)))
      .join(build, col(probeKey) === col(buildKey))
  }

  /** Bloom-pruned LEFT SEMI join (`probe` rows with a match in `build`). */
  def bloomSemiJoin(probe: DataFrame, build: DataFrame,
      probeKey: String, buildKey: String,
      estItems: Long = DefaultItems, numBits: Long = DefaultBits): DataFrame = {
    val bf = buildFilter(build, buildKey, estItems, numBits)
    probe.where(mightContain(bf, col(probeKey)))
      .join(build, col(probeKey) === col(buildKey), "left_semi")
  }
}
