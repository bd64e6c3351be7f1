package graft

import org.apache.spark.sql.Row

import org.apache.spark.sql.functions._

import graft.operators.BloomJoin

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  private def facts = (1L to 10000L).map(i => (i, i % 997)).toDF("fid", "fk")
  private def dim = (0L to 996L by 10).map(k => (k, s"d$k")).toDF("dk", "dname")

  test("bloom-pruned join is bit-identical to the plain join (no false negatives)") {
    val plain = facts.join(dim, $"fk" === $"dk")
      .select($"fid", $"dname").collect().toSet
    val pruned = BloomJoin.bloomPrunedJoin(facts, dim, "fk", "dk",
      estItems = 1000, numBits = 1 << 16)
      .select($"fid", $"dname").collect().toSet
    assert(pruned == plain)
    assert(plain.nonEmpty)
  }

  test("bloom semi join matches LEFT SEMI exactly") {
    val plain = facts.join(dim, $"fk" === $"dk", "left_semi").collect().toSet
    val pruned = BloomJoin.bloomSemiJoin(facts, dim, "fk", "dk",
      estItems = 1000, numBits = 1 << 16).collect().toSet
    assert(pruned == plain)
  }

  test("a tiny bloom (high fpp) still loses nothing — join removes false positives") {
    val plain = facts.join(dim, $"fk" === $"dk").count()
    val pruned = BloomJoin.bloomPrunedJoin(facts, dim, "fk", "dk",
      estItems = 100, numBits = 256).count() // ~saturated filter
    assert(pruned == plain)
  }

  test("the might-contain filter sits BELOW the probe side's shuffle") {
    // the whole point of the operator: fact rows are pruned before the
    // exchange, so the bloom predicate must appear in a shuffle's child
    // subtree, not above the join. File-backed tables — over a
    // LocalRelation the optimizer folds the filter away entirely
    // (ConvertToLocalRelation), which hides the shape being audited.
    val lineitem = graft.core.Tables.load(spark, sfDir, "lineitem")
    val parts = graft.core.Tables.load(spark, sfDir, "part")
      .filter($"p_size" <= 5).select($"p_partkey", $"p_brand")
    val bf = BloomJoin.buildFilter(parts, "p_partkey", 1000, 1 << 16)
    val joined = lineitem.where(BloomJoin.mightContain(bf, $"l_partkey"))
      .join(parts.hint("shuffle_hash"), $"l_partkey" === $"p_partkey")
      .groupBy($"p_brand").count()
    joined.collect()
    // AQE's executed plan is a leaf AdaptiveSparkPlanExec — collect() can't
    // descend into query stages — so audit the printed tree: children print
    // BELOW parents, so the probe exchange line must be followed by the
    // `might_contain(<hex>)` Filter (the expression's prettyName)
    val plan = joined.queryExecution.executedPlan.toString
    val probeShuffle = plan.indexOf("Exchange hashpartitioning(l_partkey")
    assert(probeShuffle >= 0, s"probe side lost its shuffle:\n${plan.take(3000)}")
    assert(plan.indexOf("might_contain", probeShuffle) >= 0,
      s"no bloom filter beneath the probe shuffle:\n${plan.take(3000)}")
  }

  test("pruning really thins the probe side at the configured fpp") {
    val bf = BloomJoin.buildFilter(dim, "dk", estItems = 1000, numBits = 1 << 16)
    val kept = facts.where(BloomJoin.mightContain(bf, $"fk")).count()
    val trueMatches = facts.join(dim, $"fk" === $"dk", "left_semi").count()
    // ~10% of fk values are dim keys; with fpp << 1 the kept count must be
    // far below the full fact count and at least every true match
    assert(kept >= trueMatches)
    assert(kept < facts.count() / 2,
      s"bloom kept $kept of ${facts.count()} — filter not selective")
  }
}
