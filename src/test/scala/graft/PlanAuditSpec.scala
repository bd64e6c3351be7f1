package graft

import org.apache.spark.sql.execution.QueryExecution

/** Automated plan-hygiene sweep over every registered query: the scale
  * anti-patterns the VERDICT audits by hand, enforced in CI. A query that
  * silently regresses to a cartesian product or an unintended
  * BroadcastNestedLoopJoin fails here before it ever reaches a cluster.
  */
class PlanAuditSpec extends SparkSpec {

  /** Deliberate, audited tiny-broadcast BNLJs (bounded build sides that do
    * NOT grow with the data): q13 scalar scene mean, q18 literal grid
    * generator, q38/q51 fixed query/centroid sets, q43/q44 11-row
    * smoothing-offset table. Everything else must plan hash/broadcast-hash
    * equi-joins only.
    */
  private val bnljAllowed = Set(
    "q13_detrend", "q18_gmf_grid", "q38_ann_topk",
    "q43_circ_smooth", "q44_peak", "q51_ann_ivf")

  private def planOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.queryExecution.executedPlan.toString
  }

  test("no registered query plans a CartesianProduct") {
    SparkEntry.queries.keys.foreach { name =>
      assert(!planOf(name).contains("CartesianProduct"),
        s"$name plans a CartesianProduct — unbounded pairwise work at scale")
    }
  }

  test("BroadcastNestedLoopJoin appears only where a bounded broadcast is deliberate") {
    SparkEntry.queries.keys.filterNot(bnljAllowed).foreach { name =>
      assert(!planOf(name).contains("BroadcastNestedLoopJoin"),
        s"$name plans an unaudited BroadcastNestedLoopJoin — if the build side is " +
          "bounded and deliberate, add it to bnljAllowed with a justification")
    }
    // the whitelist must not rot: entries that stopped planning BNLJ get removed
    bnljAllowed.foreach { name =>
      assert(planOf(name).contains("BroadcastNestedLoopJoin"),
        s"$name no longer plans a BNLJ — drop it from bnljAllowed")
    }
  }

  test("filters and projections reach the parquet scan (q06 probe)") {
    val plan = planOf("q06_filter_revenue")
    assert(plan.contains("PushedFilters: [IsNotNull"),
      "q06 filter did not push down to the parquet scan")
    // projection pruning: the lineitem scan must read a narrow struct, not
    // all 16 columns
    val readSchemas = "ReadSchema: struct<([^>]*)>".r.findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(readSchemas.nonEmpty && readSchemas.forall(_.split(",").length <= 4),
      s"q06 scan reads an unpruned schema: $readSchemas")
  }
}
