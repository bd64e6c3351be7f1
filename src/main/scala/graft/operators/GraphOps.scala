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
      checkpointEvery: Int = 8, smallGraphThreshold: Long = 1000000L): DataFrame = {
    require(iters >= 1 && dampNum > 0 && dampNum < dampDen)
    val spark = nodes.sparkSession

    // AQE-style size-decides-strategy (the ConnectedComponents.run
    // pattern): a graph at or below broadcast scale pays 2·iters shuffles
    // + iters materialization actions for nothing — solve it driver-side
    // with the SAME integer recurrence (exact long arithmetic, so both
    // paths are bit-identical — GraphOpsSpec asserts it) and skip the
    // per-iteration job overhead entirely.
    if (smallGraphThreshold > 0 && edges.limit((smallGraphThreshold + 1).toInt)
        .count() <= smallGraphThreshold)
      return pageRankLocal(nodes, edges, iters, dampNum, dampDen)

    // One shuffle, once: per-source out-degree riding on every edge.
    val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("od"))
    val linked = graft.core.CacheLife.scoped(
      edges.join(outdeg, "src")
        .select(col("src"), col("dst"), col("od"))
        .persist(StorageLevel.MEMORY_AND_DISK))

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
    // the final iteration's cache backs the returned frame — query-scoped,
    // released once the consumer's output is materialized
    graft.core.CacheLife.scoped(ranks)
  }

  /** Driver-side twin of the distributed recurrence for bounded graphs:
    * identical integer update rule, so results are bit-equal. Collects
    * ≤ `smallGraphThreshold` (src, dst) longs (~16 MB at the 1M default)
    * — the same bounded-collect contract as ConnectedComponents' small
    * path and the LUT broadcasts. */
  private def pageRankLocal(nodes: DataFrame, edges: DataFrame, iters: Int,
      dampNum: Int, dampDen: Int): DataFrame = {
    val spark = nodes.sparkSession
    import spark.implicits._
    // BOUND: gated by smallGraphThreshold — the caller proved |nodes|/|edges| under it
    val nodeIds = nodes.select(col("node").cast("long")).as[Long].collect()
    val idx = nodeIds.zipWithIndex.toMap
    val es = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .as[(Long, Long)].collect()
    val n = nodeIds.length.toLong
    val od = new Array[Long](nodeIds.length)
    // edges from/to ids outside the universe behave as in the distributed
    // joins: they count nothing and contribute nothing
    es.foreach { case (s, _) => idx.get(s).foreach(od(_) += 1) }
    val base = (dampDen - dampNum) * Scale / (dampDen * n)
    var r = Array.fill(nodeIds.length)(Scale / n)
    for (_ <- 1 to iters) {
      val inc = new Array[Long](nodeIds.length)
      es.foreach { case (s, d) =>
        for (si <- idx.get(s); di <- idx.get(d))
          inc(di) += r(si) / od(si) // = SQL `pr_micro div od`, summed
      }
      var dm = 0L
      var i = 0
      while (i < r.length) { if (od(i) == 0) dm += r(i); i += 1 }
      r = Array.tabulate(r.length)(v =>
        base + (dampNum * (inc(v) + dm / n)) / dampDen)
    }
    nodeIds.zip(r).toSeq.toDF("node", "pr_micro")
  }

  /** Personalized PageRank (the topic-sensitive variant, Haveliwala 2002)
    * — random walks teleport back to the SEED set instead of everywhere,
    * so the ranks measure proximity to the seeds: the related-content /
    * recommendation primitive ("documents like these trusted ones").
    * Identical integer recurrence to [[pageRank]] with the uniform base
    * and dangling redistribution restricted to seeds:
    *
    *   b(v)     = [v∈S] · Scale // |S|
    *   r₀       = b
    *   rᵢ₊₁(v)  = [v∈S]·(dampDen−dampNum)·Scale // (dampDen·|S|)
    *            + dampNum·(Σ_{u→v} rᵢ(u)//od(u) + [v∈S]·(dangling//|S|)) // dampDen
    *
    * With S = all nodes this reduces bit-for-bit to [[pageRank]]
    * (GraphOpsSpec asserts it). Seeds ride a broadcast membership join;
    * everything else shares pageRank's shuffle shape and lineage
    * discipline. Exact BIGINT micro-units; returns (node, ppr_micro).
    */
  def personalizedPageRank(nodes: DataFrame, edges: DataFrame,
      seeds: DataFrame, iters: Int, dampNum: Int = 85, dampDen: Int = 100,
      checkpointEvery: Int = 8, smallGraphThreshold: Long = 1000000L): DataFrame = {
    require(iters >= 1 && dampNum > 0 && dampNum < dampDen)
    val seedSet = seeds.select(col("node")).distinct()
      .join(nodes.select(col("node")), Seq("node"), "left_semi")
    val nSeeds = seedSet.count()
    require(nSeeds > 0, "personalizedPageRank needs at least one seed in the universe")

    // the pageRank small-graph cutover: below broadcast scale, 5
    // distributed iterations cost ~10 shuffle+action rounds for nothing —
    // run the IDENTICAL integer recurrence driver-side (bit-equal,
    // GraphOpsSpec asserts it against the distributed path)
    if (smallGraphThreshold > 0 && edges.limit((smallGraphThreshold + 1).toInt)
        .count() <= smallGraphThreshold)
      return personalizedPageRankLocal(nodes, edges, seedSet, nSeeds, iters,
        dampNum, dampDen)

    val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("od"))
    val linked = graft.core.CacheLife.scoped(
      edges.join(outdeg, "src")
        .select(col("src"), col("dst"), col("od"))
        .persist(StorageLevel.MEMORY_AND_DISK))
    val seeded = graft.core.CacheLife.scoped(
      nodes.select(col("node"))
        .join(seedSet.withColumn("__s", lit(true)), Seq("node"), "left")
        .select(col("node"), coalesce(col("__s"), lit(false)).as("__s"))
        .persist(StorageLevel.MEMORY_AND_DISK))
    val base = (dampDen - dampNum) * Scale / (dampDen * nSeeds)

    var ranks = seeded.select(col("node"),
      when(col("__s"), lit(Scale / nSeeds)).otherwise(lit(0L)).as("ppr_micro"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var i = 0
    while (i < iters) {
      val contrib = linked.join(ranks, linked("src") === ranks("node"))
        .groupBy(col("dst"))
        .agg(sum(expr("ppr_micro div od")).as("inc"))
      val dangling = ranks.join(outdeg, ranks("node") === outdeg("src"), "left_anti")
        .agg(coalesce(sum(col("ppr_micro")), lit(0L)).as("dm"))
      val next = seeded
        .join(contrib, seeded("node") === contrib("dst"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("node"),
          (when(col("__s"), lit(base)).otherwise(lit(0L)) +
            expr(s"""($dampNum * (coalesce(inc, 0L) +
              (CASE WHEN __s THEN dm div ${nSeeds}L ELSE 0L END))) div $dampDen""")
          ).as("ppr_micro"))
      val persisted =
        (if ((i + 1) % checkpointEvery == 0) next.localCheckpoint(false) else next)
          .persist(StorageLevel.MEMORY_AND_DISK)
      persisted.count()
      ranks.unpersist(false)
      ranks = persisted
      i += 1
    }
    graft.core.CacheLife.scoped(ranks)
  }

  /** Driver-side twin of the seeded recurrence for bounded graphs —
    * identical integer rule, bit-equal (the pageRankLocal contract). */
  private def personalizedPageRankLocal(nodes: DataFrame, edges: DataFrame,
      seedSet: DataFrame, nSeeds: Long, iters: Int, dampNum: Int,
      dampDen: Int): DataFrame = {
    val spark = nodes.sparkSession
    import spark.implicits._
    // BOUND: gated by smallGraphThreshold — the caller proved |nodes|/|edges| under it
    val nodeIds = nodes.select(col("node").cast("long")).as[Long].collect()
    val idx = nodeIds.zipWithIndex.toMap
    val isSeed = {
      // BOUND: seed set — ≤ smallGraphThreshold by the same gate
    val s = seedSet.select(col("node").cast("long")).as[Long].collect().toSet
      nodeIds.map(s.contains)
    }
    val es = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .as[(Long, Long)].collect()
    val od = new Array[Long](nodeIds.length)
    es.foreach { case (s, _) => idx.get(s).foreach(od(_) += 1) }
    val base = (dampDen - dampNum) * Scale / (dampDen * nSeeds)
    var r = Array.tabulate(nodeIds.length)(v =>
      if (isSeed(v)) Scale / nSeeds else 0L)
    for (_ <- 1 to iters) {
      val inc = new Array[Long](nodeIds.length)
      es.foreach { case (s, d) =>
        for (si <- idx.get(s); di <- idx.get(d))
          inc(di) += r(si) / od(si)
      }
      var dm = 0L
      var i = 0
      while (i < r.length) { if (od(i) == 0) dm += r(i); i += 1 }
      r = Array.tabulate(r.length)(v =>
        (if (isSeed(v)) base else 0L) +
          (dampNum * (inc(v) + (if (isSeed(v)) dm / nSeeds else 0L))) / dampDen)
    }
    nodeIds.zip(r).toSeq.toDF("node", "ppr_micro")
  }

  /** Synchronous label propagation (Raghavan, Albert & Kumara 2007) over
    * the undirected view of `edges` (symmetrized, de-duplicated, self-loops
    * dropped) restricted to the node universe `nodes` (col `node`). Every
    * node starts with its own id as its label; each round every node
    * adopts the most frequent label among its neighbors PLUS one vote for
    * its own current label, ties broken by the SMALLEST label — fully
    * deterministic, so the unrolled relational oracle replays every round
    * bit-for-bit (float-free: labels are ids, votes are counts).
    *
    * Scale shape: per round, one shuffle join of the cached symmetric edge
    * list against the (node, label) frame — labels only, never payloads —
    * then two map-side-combinable groupBys ((node, label) count, then the
    * per-node argmax via `max_by` over (count, −label)). Lineage is cut
    * with `localCheckpoint` every `checkpointEvery` rounds, and each round
    * materializes before dropping its parent cache, so k rounds cost O(k)
    * jobs, not O(k²) recomputation (same discipline as [[pageRank]]).
    * Graphs at or below `smallGraphThreshold` edges solve driver-side with
    * the identical rule (bit-equal — GraphOpsSpec asserts it).
    *
    * Returns (node, label) after `iters` rounds — or earlier, at the first
    * round where no label changed: synchronous LPA is then at a fixed
    * point, so the early exit is result-identical and skips the remaining
    * rounds' shuffles on fast-converging graphs (the convergence probe
    * doubles as the per-round materialization, replacing the bare count).
    */
  def labelPropagation(nodes: DataFrame, edges: DataFrame, iters: Int,
      checkpointEvery: Int = 4, smallGraphThreshold: Long = 1000000L): DataFrame = {
    require(iters >= 1)
    // restrict the receiving endpoint to the universe up front (one-time),
    // so the per-round groupBy never manufactures labels for non-nodes;
    // the sending endpoint is restricted implicitly by the labels join
    val ue = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .where(col("src") =!= col("dst"))
      .distinct()
      .join(nodes.select(col("node").as("dst")), Seq("dst"), "left_semi")
    if (smallGraphThreshold > 0 && ue.limit((smallGraphThreshold + 1).toInt)
        .count() <= smallGraphThreshold)
      return labelPropagationLocal(nodes, ue, iters)

    val linked = graft.core.CacheLife.scoped(
      ue.persist(StorageLevel.MEMORY_AND_DISK))
    // `cached` carries (node, label[, __prev]); `labels` is its 2-column
    // view fed to the next round's join/union
    var cached = nodes.select(col("node"), col("node").as("label"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels: DataFrame = cached
    var i = 0
    var converged = false
    while (i < iters && !converged) {
      // the self-vote row smuggles the node's CURRENT label through the
      // vote aggregates (__self is null on neighbor votes, so max(__self)
      // per (node,label) group is non-null exactly for the prev-label
      // group, and max of that per node is prev) — the convergence probe
      // then reads `label != __prev` off the same pass instead of
      // re-joining this round's labels against last round's
      val votes = linked.join(labels, linked("src") === labels("node"))
        .select(linked("dst").as("node"), col("label"),
          lit(null).cast(labels.schema("label").dataType).as("__self"))
        .unionByName(labels.select(col("node"), col("label"),
          col("label").as("__self")))
      val next = votes.groupBy(col("node"), col("label"))
        .agg(count(lit(1)).as("cnt"), max(col("__self")).as("__pv"))
        .groupBy(col("node"))
        .agg(max_by(col("label"), struct(col("cnt"), negate(col("label")))).as("label"),
          max(col("__pv")).as("__prev"))
      val persisted =
        (if ((i + 1) % checkpointEvery == 0) next.localCheckpoint(false) else next)
          .persist(StorageLevel.MEMORY_AND_DISK)
      // materialize via the convergence probe instead of a bare count():
      // synchronous LPA at an all-labels-stable round is a FIXED POINT
      // (identical labels produce identical votes), so stopping early is
      // result-identical while saving every remaining round's shuffles
      val changed = persisted.where(col("label") =!= col("__prev")).count()
      cached.unpersist(false)
      cached = persisted
      labels = persisted.select(col("node"), col("label"))
      i += 1
      if (changed == 0L) converged = true
    }
    graft.core.CacheLife.scoped(cached)
    labels
  }

  /** Driver-side twin for bounded graphs: identical vote/tie rule over
    * collected adjacency, so results are bit-equal to the distributed
    * recurrence. `ue` must already be the symmetric de-duplicated edge
    * set (≤ `smallGraphThreshold` rows — the bounded-collect contract). */
  private def labelPropagationLocal(nodes: DataFrame, ue: DataFrame,
      iters: Int): DataFrame = {
    val spark = nodes.sparkSession
    import spark.implicits._
    // BOUND: gated by smallGraphThreshold — the caller proved |nodes|/|edges| under it
    val nodeIds = nodes.select(col("node").cast("long")).as[Long].collect()
    val idx = nodeIds.zipWithIndex.toMap
    val es = ue.select(col("src").cast("long"), col("dst").cast("long"))
      .as[(Long, Long)].collect()
    // edges touching ids outside the universe vote nothing, as in the
    // distributed join (labels exist only for universe nodes)
    val adj = Array.fill(nodeIds.length)(List.empty[Int])
    es.foreach { case (s, d) =>
      for (si <- idx.get(s); di <- idx.get(d)) adj(di) ::= si
    }
    var lab = nodeIds.clone()
    var r = 0
    var stable = false
    while (r < iters && !stable) {
      val nl = Array.tabulate(lab.length) { v =>
        val cnt = collection.mutable.Map.empty[Long, Long]
        cnt(lab(v)) = 1L // the self-vote
        adj(v).foreach { u => cnt(lab(u)) = cnt.getOrElse(lab(u), 0L) + 1L }
        cnt.maxBy { case (l, c) => (c, -l) }._1 // max count, then min label
      }
      stable = java.util.Arrays.equals(nl, lab) // fixed point — same early
      lab = nl                                  // exit as the distributed path
      r += 1
    }
    nodeIds.zip(lab).toSeq.toDF("node", "label")
  }

  /** Deterministic GraphSAGE-style neighbor sampling (Hamilton et al.
    * 2017): per source, keep the first `k` neighbors in md5-hash order of
    * the (src, dst) pair — a seedless shuffle both engines replay, so the
    * sampled adjacency is reproducible across epochs and engines. One
    * shuffle on src (the rank window); a hub's fan-out truncates to k
    * BEFORE any downstream join, which is the whole point — multi-hop
    * expansion over sampled adjacency is O(k^hops) per node, never
    * O(degree^hops). Output: src, dst, rank (1..k).
    */
  def sampleNeighbors(edges: DataFrame, k: Int): DataFrame = {
    require(k >= 1)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("src"))
      .orderBy(md5(concat(col("src").cast("string"), lit("_"),
        col("dst").cast("string"))), col("dst"))
    edges.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
  }

  /** Two-hop sampled neighborhoods — the mini-batch expansion a GNN
    * trainer materializes: hop-1 samples `k1` neighbors per node, hop-2
    * samples `k2` per hop-1 neighbor (from the same deterministic
    * adjacency), immediate back-edges (n2 = node) dropped. ≤ k1·k2 rows
    * per node by construction. Output: node, n1, n2, rank1, rank2.
    */
  def twoHopSample(edges: DataFrame, k1: Int, k2: Int): DataFrame = {
    val s1 = sampleNeighbors(edges, k1)
      .select(col("src").as("node"), col("dst").as("n1"), col("rank").as("rank1"))
    val s2 = sampleNeighbors(edges, k2)
      .select(col("src").as("n1"), col("dst").as("n2"), col("rank").as("rank2"))
    s1.join(s2, "n1").where(col("n2") =!= col("node"))
      .select(col("node"), col("n1"), col("n2"), col("rank1"), col("rank2"))
  }

  /** Deterministic negative-edge sampling for link-prediction training:
    * per node, `m` multiplicative-hash candidates in [0, n), self-loops
    * dropped, TRUE edges removed by an anti-join against the adjacency,
    * first `k` survivors kept in probe order. The anti-join is the exact
    * filter random-rejection sampling approximates — no false negatives
    * ever enter the training set. Probe collisions (i·2654435761 mod n
    * repeats within m probes when n shares a factor with the multiplier)
    * are deduplicated to the FIRST probe index per (node, cand), so no
    * duplicate negatives reach the rank window. One shuffle of the
    * (node, cand) probes against the edge set, one rank window. Output:
    * node, neg, i (the probe index), rank (1..k).
    */
  def negativeEdges(nodes: DataFrame, edges: DataFrame, n: Long, m: Int,
      k: Int): DataFrame = {
    require(m >= k && k >= 1)
    val wDedup = org.apache.spark.sql.expressions.Window
      .partitionBy(col("node"), col("cand"))
    val cand = nodes.select(col("node"))
      .withColumn("i", explode(sequence(lit(0L), lit((m - 1).toLong))))
      .withColumn("cand", (col("node") * 31 + col("i") * 2654435761L) % n)
      .where(col("cand") =!= col("node"))
      .withColumn("__mini", min(col("i")).over(wDedup))
      .where(col("i") === col("__mini")).drop("__mini")
    val neg = cand.join(
      edges.select(col("src").as("node"), col("dst").as("cand")),
      Seq("node", "cand"), "left_anti")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("node"))
      .orderBy(col("i"))
    neg.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("node"), col("cand").as("neg"), col("i"), col("rank"))
  }

  /** Per-node triangle counts by degree-ordered wedge counting (Suri &
    * Vassilvitskii, WWW 2011 — "the curse of the last reducer"): undirect
    * + dedup, then orient every edge from its lower-(degree, id) endpoint
    * to the higher one. Each triangle survives as exactly one wedge at its
    * minimum-order vertex, and — the scale point — a star hub of degree d
    * generates not d² wedges but only pairs among its FEW higher-degree
    * neighbors, so the worst reducer is O(m^{1/2}) wide, not O(n).
    *
    * Three shuffles (distinct, degree, wedge join) on the edge key space;
    * the closing-edge join is a shuffle join on the oriented edge set
    * itself — nothing is ever broadcast, so web-scale graphs fit.
    * Returns one row per node: `(node, n_triangles)`, zeros included.
    */
  def triangleCounts(nodes: DataFrame, edges: DataFrame): DataFrame = {
    val und = edges
      .select(least(col("src"), col("dst")).as("u"), greatest(col("src"), col("dst")).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
    val deg = und.select(explode(array(col("u"), col("v"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("d"))
    // ord(x) = (deg, id): a total order; orient low → high
    val withDeg = und
      .join(deg.withColumnRenamed("node", "u").withColumnRenamed("d", "du"), "u")
      .join(deg.withColumnRenamed("node", "v").withColumnRenamed("d", "dv"), "v")
    val uord = struct(col("du").as("d"), col("u").as("n"))
    val vord = struct(col("dv").as("d"), col("v").as("n"))
    val oriented = withDeg.select(
      when(uord < vord, col("u")).otherwise(col("v")).as("a"),
      when(uord < vord, col("v")).otherwise(col("u")).as("b"),
      when(uord < vord, vord).otherwise(uord).as("bord"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.CacheLife.scoped(oriented)
    val e1 = oriented.select(col("a"), col("b").as("x"), col("bord").as("xord"))
    val e2 = oriented.select(col("a"), col("b").as("y"), col("bord").as("yord"))
    val wedges = e1.join(e2, Seq("a")).where(col("xord") < col("yord"))
      .select(col("a"), col("x"), col("y"))
    val closing = oriented.select(col("a").as("x"), col("b").as("y"))
    val tri = wedges.join(closing, Seq("x", "y"))
    val perNode = tri
      .select(explode(array(col("a"), col("x"), col("y"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
    nodes.join(perNode, Seq("node"), "left")
      .select(col("node"), coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
  }
}
