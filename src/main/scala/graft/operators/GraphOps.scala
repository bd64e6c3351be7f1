package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Link-graph analytics for web-crawl curation: PageRank as the
  * crawl-frontier / quality prior (Page et al. 1999 — the role it plays in
  * Common-Crawl-style corpus curation: a link-based document prior that
  * composes with the content-based quality signals).
  *
  * Arithmetic is FIXED-POINT: ranks are BIGINT micro-units (`Scale` = 1e12)
  * and every step is integer division/multiplication, so the result is
  * bit-identical on any engine and any partitioning — no float summation
  * order, no rounding-boundary coin flips, regardless of iteration count.
  * Mass lost to truncation is ≤ 1 micro-unit per edge per iteration
  * (bounded, deterministic, and identical in the DuckDB oracle which
  * mirrors the same `//` arithmetic).
  *
  * Scale shape (the 100 TB story):
  *   - Edges join their out-degree ONCE, up front, and that frame is
  *     persisted and reused every iteration — per iteration the only work
  *     is one broadcast-or-shuffle join of the (node, rank) frame against
  *     it plus one `groupBy(dst)` SUM (map-side combinable, one shuffle).
  *   - Ranks stay (node, rank) pairs end-to-end — never densified, never
  *     collected; the dangling-mass term is a scalar aggregate that
  *     collapses map-side and rides in via a 1-row broadcast cross join,
  *     keeping each iteration fully lazy.
  *   - Lineage is truncated with `localCheckpoint` every
  *     `checkpointEvery` iterations so deep iteration counts don't grow
  *     the plan unboundedly (the CC operator's convergence-loop
  *     discipline, ConnectedComponents.scala).
  */
object GraphOps {

  /** 1e12 micro-units = rank 1.0. At 1e9 nodes the initial per-node rank
    * is still 1e3 units — three digits of headroom below any realistic
    * corpus size. */
  val Scale: Long = 1000000000000L

  /** PageRank over `edges` (cols `src`, `dst`; duplicates allowed — they
    * are weighted like parallel links) restricted to the node universe
    * `nodes` (col `node`). Damping is the rational `dampNum/dampDen`
    * (default 85/100) so the update rule stays in integers:
    *
    *   r₀(v)    = Scale // N
    *   rᵢ₊₁(v)  = (dampDen-dampNum)·Scale // (dampDen·N)
    *            + dampNum·(Σ_{u→v} rᵢ(u) // od(u)  +  dangling // N) // dampDen
    *
    * Returns (node, pr_micro) — exact BIGINT micro-unit ranks.
    */
  def pageRank(nodes: DataFrame, edges: DataFrame, iters: Int,
      dampNum: Int = 85, dampDen: Int = 100,
      checkpointEvery: Int = 8): DataFrame = {
    require(iters >= 1 && dampNum > 0 && dampNum < dampDen)
    val spark = nodes.sparkSession

    // One shuffle, once: per-source out-degree riding on every edge.
    val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("od"))
    val linked = edges.join(outdeg, "src")
      .select(col("src"), col("dst"), col("od"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    val n = nodes.count() // bounded driver scalar (a node COUNT, not data)
    val base = (dampDen - dampNum) * Scale / (dampDen * n)

    var ranks = nodes.select(col("node"), lit(Scale / n).as("pr_micro"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var i = 0
    while (i < iters) {
      // Σ incoming rᵢ(u)//od(u), one map-side-combinable shuffle.
      val contrib = linked.join(ranks, linked("src") === ranks("node"))
        .groupBy(col("dst"))
        .agg(sum(expr("pr_micro div od")).as("inc"))
      // Mass parked on sink nodes, redistributed uniformly. 1-row frame →
      // broadcast cross join keeps the iteration lazy (no per-iter action).
      val dangling = ranks.join(outdeg, ranks("node") === outdeg("src"), "left_anti")
        .agg(coalesce(sum(col("pr_micro")), lit(0L)).as("dm"))
      val next = nodes
        .join(contrib, nodes("node") === contrib("dst"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("node"),
          (lit(base) +
            expr(s"(($dampNum * (coalesce(inc, 0L) + (dm div ${n}L))) div $dampDen)")
          ).as("pr_micro"))
      val persisted =
        (if ((i + 1) % checkpointEvery == 0) next.localCheckpoint(false) else next)
          .persist(StorageLevel.MEMORY_AND_DISK)
      persisted.count() // materialize BEFORE dropping the parent: each
      // iteration computes from the previous iteration's cached frame,
      // never re-runs the whole chain (O(k) total, not O(k²))
      ranks.unpersist(false)
      ranks = persisted
      i += 1
    }
    ranks
  }
}
