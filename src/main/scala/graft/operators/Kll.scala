package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** KLL quantile sketch (Karnin, Lang & Liberty, FOCS 2016) — the MERGEABLE
  * order-statistic summary the exact passes ([[Sketches.exactQuantiles]],
  * [[Sketches.groupedQuantiles]]) deliberately are not: per-shard /
  * per-day sketches of O(k·log(n/k)) longs roll up by merge without ever
  * re-touching the data, which is what per-day → per-month quantile
  * rollups over 100 TB actually need (the exact passes re-scan the union).
  *
  * Structure: a ladder of weight-2^h buffers ("compactors"). Level h
  * holds items each standing for 2^h original rows. When the sketch
  * exceeds its capacity, the lowest over-full level sorts itself and
  * promotes every other item to level h+1 (the survivors' weight doubles,
  * the rest are discarded); capacities decay geometrically (2/3) below
  * the top level, which is what gives the O(1/k) rank-error guarantee
  * with O(k) total space. This implementation uses the DETERMINISTIC
  * alternating selector (the compaction counter's parity picks odd/even
  * positions) instead of a random coin, trading a small constant in the
  * error bound for run-to-run reproducibility — KllSpec measures the
  * realized bound rather than assuming the randomized one.
  *
  * Exactness regime: while total size stays within capacity nothing is
  * ever compacted, every item keeps weight 1, and quantile extraction is
  * EXACT (value at 0-indexed rank floor(q·(n−1)), the same convention as
  * [[Sketches.exactQuantiles]]) — which is what lets q176/q177's DuckDB
  * oracle verify the full aggregate → merge → extract plumbing by brute
  * rank SQL at test scale, while the spec and ScaleBench gate the
  * APPROXIMATE regime (small k, forced compactions) against measured
  * rank-error bounds.
  *
  * The aggregation itself is the native Catalyst
  * `graft.sql.KllSketchAgg` (TypedImperativeAggregate — real JVM buffer,
  * binary-serialized only across the partial-aggregation shuffle),
  * registered as `kll_sketch(value, k)` and re-aggregated with
  * `kll_merge(sketch)`; this object holds the algorithm and the
  * DECLARATIVE quantile extractor (explode + one window — no UDF).
  */
object Kll {

  /** Mutable aggregation state: levels(h) holds weight-2^h items. */
  final class KllBuf(val k: Int) extends Serializable {
    require(k >= 8, s"kll sketch needs k >= 8, got $k")
    val levels: ArrayBuffer[ArrayBuffer[Long]] = ArrayBuffer(ArrayBuffer.empty[Long])
    var comps: Long = 0L
    // hot-path counters: update() is the per-row map side of the
    // aggregate, so size/capacity are O(1) running values — the capacity
    // table recomputes only when the ladder grows (O(log n) times total),
    // never per row
    private var size: Long = 0L
    private var caps: Array[Int] = Array(k)
    private var capTotal: Long = k.toLong

    private def refreshCaps(): Unit = {
      val height = levels.length
      caps = Array.tabulate(height) { h =>
        // top level capacity k, decaying by 2/3 per level below it
        math.max(2, math.ceil(k * math.pow(2.0 / 3.0, (height - 1 - h).toDouble)).toInt)
      }
      capTotal = 0L
      caps.foreach(capTotal += _)
    }

    private def addLevel(): Unit = {
      // level h items weigh 2^h; an index-63 level would weigh 2^63 —
      // unrepresentable in a 64-bit weight (and total weight would have
      // overflowed Long already). Reachable only past ~2^62 total weight.
      require(levels.length < 63,
        "kll sketch total weight exceeds 2^62 — weights no longer fit in 64 bits")
      levels += ArrayBuffer.empty[Long]
      refreshCaps()
    }

    /** Recompute the derived counters from `levels` — deserializers that
      * populate the ladder directly must call this before further use. */
    private[graft] def recount(): Unit = {
      size = levels.iterator.map(_.length.toLong).sum
      refreshCaps()
    }

    def update(v: Long): Unit = { levels(0) += v; size += 1; compactIfNeeded() }

    /** Weighted update — the pre-aggregated form: an item carrying count
      * `w` enters as one copy per SET BIT of w at that bit's level (level
      * h items weigh 2^h, so the binary decomposition adds exactly w of
      * total weight with ≤ 64 insertions however large the count). This
      * is what lets a (value, count) table from an upstream groupBy feed
      * the sketch without re-expanding rows. */
    def updateWeighted(v: Long, w: Long): Unit = {
      require(w >= 0, s"negative weight $w")
      var b = 0
      var rest = w
      while (rest != 0L) {
        if ((rest & 1L) == 1L) {
          while (levels.length <= b) addLevel()
          levels(b) += v
          size += 1
        }
        rest >>>= 1
        b += 1
      }
      compactIfNeeded()
    }

    def mergeIn(o: KllBuf): Unit = {
      // sketches built at different k carry different error bounds; a
      // silent merge would keep this side's k label while inheriting the
      // other side's weaker accuracy — make the mismatch an error
      require(o.k == k,
        s"cannot merge kll sketches with different k: $k vs ${o.k}")
      while (levels.length < o.levels.length) addLevel()
      var h = 0
      while (h < o.levels.length) {
        levels(h) ++= o.levels(h)
        size += o.levels(h).length
        h += 1
      }
      comps += o.comps
      compactIfNeeded()
    }

    private def compactIfNeeded(): Unit = {
      while (size > capTotal) {
        // lowest level at-or-over its capacity; one must exist when the
        // total is over (all-under levels sum below capTotal)
        val h = (0 until levels.length).find(i => levels(i).length >= caps(i)).get
        val buf = levels(h)
        val sorted = buf.toArray
        java.util.Arrays.sort(sorted)
        if (h + 1 == levels.length) addLevel()
        // compact only an EVEN count so total weight is preserved exactly
        // (even·2^h removed == even/2 promoted at 2^(h+1)); an odd
        // straggler — deterministically the sorted max — stays behind at
        // level h, as canonical KLL prescribes (promoting ceil(s/2) would
        // drift the sketch's total mass by ±2^h per odd compaction)
        val even = sorted.length & ~1
        val offset = (comps % 2).toInt // deterministic alternating selector
        var i = offset
        val up = levels(h + 1)
        while (i < even) { up += sorted(i); i += 2 }
        buf.clear()
        if (even < sorted.length) buf += sorted(sorted.length - 1)
        size -= (even / 2)
        comps += 1L
      }
    }
  }

  /** Binary wire format: k, comps, nLevels, then (size, items)* — the
    * shuffle representation of the aggregate buffer. */
  def serialize(b: KllBuf): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(b.k); out.writeLong(b.comps); out.writeInt(b.levels.length)
    b.levels.foreach { l => out.writeInt(l.length); l.foreach(out.writeLong) }
    out.flush(); bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): KllBuf = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val b = new KllBuf(in.readInt())
    b.comps = in.readLong()
    val n = in.readInt()
    while (b.levels.length < n) b.levels += ArrayBuffer.empty[Long]
    var h = 0
    while (h < n) {
      val sz = in.readInt()
      var i = 0
      while (i < sz) { b.levels(h) += in.readLong(); i += 1 }
      h += 1
    }
    b.recount()
    b
  }

  /** Driver-side estimator (spec/gate use): value at weighted 0-indexed
    * rank floor(q·(W−1)) over the weight-expanded multiset. */
  def quantiles(b: KllBuf, qs: Seq[Double]): Seq[Long] = {
    val items = (for {
      h <- b.levels.indices.iterator
      v <- b.levels(h).iterator
    } yield (v, 1L << h)).toArray.sortBy(_._1)
    val w = items.iterator.map(_._2).sum
    require(w > 0, "quantiles on empty sketch")
    qs.map { q =>
      // 0-indexed target rank in exact decimal arithmetic: double
      // multiplication loses integer precision past 2^53 total weight.
      // q is quantized to 15 decimal digits HALF_UP FIRST — the same
      // quantization the SQL path's CAST(q AS DECIMAL(16,15)) applies in
      // quantilesFromSketch — so driver and SQL extraction compute the
      // identical target rank even for q values whose binary expansion
      // differs past the 15th decimal digit
      val t = (BigDecimal(q).setScale(15, BigDecimal.RoundingMode.HALF_UP) *
          BigDecimal(w - 1))
        .setScale(0, BigDecimal.RoundingMode.FLOOR).toLong
      var cw = 0L
      var i = 0
      while (cw <= t && i < items.length) { cw += items(i)._2; i += 1 }
      items(i - 1)._1
    }
  }

  /** Declarative per-key quantile extraction from a sketch column (the
    * struct `kll_sketch`/`kll_merge` emit): posexplode the level ladder,
    * explode items at weight 2^h, then ONE cumulative window per key picks
    * the value whose inclusive weight straddles the target rank — sketch
    * size is O(k·log), so the exploded table is tiny regardless of the
    * data the sketch summarized. Output: keys..., q, value.
    */
  def quantilesFromSketch(df: DataFrame, keys: Seq[String], sketchCol: String,
      qs: Seq[Double]): DataFrame = {
    val reserved = Set("h", "lvl", "v", "w", "cw", "tw", "q", "value")
    (keys :+ sketchCol).foreach { c =>
      require(!reserved.contains(c.toLowerCase),
        s"quantilesFromSketch reserves columns ${reserved.mkString("/")} " +
          s"(case-insensitive) for the extractor — rename '$c'")
    }
    val kcols = keys.map(col)
    val items = df
      .select(kcols :+ posexplode(col(s"$sketchCol.levels")).as(Seq("h", "lvl")): _*)
      .select(kcols ++ Seq(col("h"), explode(col("lvl")).as("v")): _*)
      .withColumn("w", expr("shiftleft(CAST(1 AS BIGINT), CAST(h AS INT))"))
    val wOrd = Window.partitionBy(kcols: _*)
      .orderBy(col("v"), col("h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(kcols: _*)
    val ranked = items
      .withColumn("cw", sum(col("w")).over(wOrd))
      .withColumn("tw", sum(col("w")).over(wAll)) // total weight ("w" vs
      // "W" would collide under Spark's case-insensitive resolution)
    val spark = df.sparkSession
    import spark.implicits._
    val qdf = broadcast(qs.toDF("q"))
    // target rank t = floor(q·(tw−1)) in DECIMAL: q at 15 exact decimal
    // places times a BIGINT stays within DECIMAL(37,15), so the product is
    // computed exactly — a DOUBLE product loses integer precision past
    // 2^53 total weight, silently shifting the extracted rank
    val target = "CAST(floor(CAST(q AS DECIMAL(16,15)) * (tw - 1)) AS BIGINT)"
    ranked.join(qdf,
        // inclusive cumulative weight straddles the target rank:
        // previous cw (= cw - w) <= t < cw — exactly one item per (key, q)
        expr(s"cw - w <= $target") && expr(s"$target < cw"))
      .select(kcols ++ Seq(col("q"), col("v").as("value")): _*)
  }
}
