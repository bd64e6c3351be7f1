package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed connected components over an undirected edge list — the
  * clustering step a fuzzy-dedup pipeline runs AFTER near-dup pair detection
  * (MinHash/LSH pairs → clusters → one canonical document per cluster). The
  * reference has no graph operator; this extends the training-data surface
  * the same way dedup does (SURVEY.md "training-data extensions").
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14). Each half-round
  * is one aggregation plus one equi-join on the same key; the edge set never
  * grows beyond the input size, every node ends pointed at its component's
  * minimum id, and the round count is O(log² n) worst-case — in practice a
  * handful, since dedup clusters are near-cliques. Label propagation would
  * need DIAMETER rounds and GraphX would leave the Tungsten/codegen path;
  * this stays in DataFrame ops end-to-end.
  *
  * Scale notes (100 TB shape):
  *  - every join carries a `shuffle_hash` hint: both sides are edge-set
  *    sized, so a runtime broadcast (AQE seeing a small post-filter stat)
  *    would build an executor-heap hash map proportional to the node count;
  *  - each round ends in `localCheckpoint(eager = true)`: iterative
  *    DataFrame loops otherwise re-analyze an exponentially growing plan
  *    (Catalyst has no fixpoint operator). On a multi-node cluster prefer
  *    `sparkContext.setCheckpointDir` + `.checkpoint()` for fault tolerance;
  *    local checkpointing trades re-computability for speed, which matches
  *    the local[32] harness;
  *  - convergence is detected from a 4-statistic aggregate fingerprint of
  *    the edge set (count / hash-sum / endpoint sums) instead of an
  *    `exceptAll` anti-join — one cheap job, no extra shuffle.
  */
object ConnectedComponents {

  /** (count, sum(xxhash64(src,dst)), sum(src), sum(dst)) of an edge set —
    * equality across rounds is the convergence signal. Sums run in
    * decimal(38,0): a sum of 64-bit hashes overflows Long immediately under
    * ANSI arithmetic (and endpoint sums would at corpus scale). */
  private def fingerprint(e: DataFrame): (Long, String, String, String) = {
    val dec = (c: Column) => sum(c.cast("decimal(38,0)"))
    val r = e.agg(count(lit(1)), dec(xxhash64(col("src"), col("dst"))),
      dec(col("src")), dec(col("dst"))).head()
    (r.getLong(0), String.valueOf(r.get(1)), String.valueOf(r.get(2)), String.valueOf(r.get(3)))
  }

  /** Large-star: connect every neighbor v > u to m(u) = min(Γ(u) ∪ {u}).
    * Input and output edges both satisfy src > dst. */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
    val mins = sym.groupBy(col("src")).agg(min(col("dst")).as("mn"))
      .select(col("src"), least(col("src"), col("mn")).as("m"))
    sym.hint("shuffle_hash").join(mins, "src")
      .filter(col("dst") > col("src")) // v > u ≥ m ⇒ emitted (v, m) keeps src > dst
      .select(col("dst").as("src"), col("m").as("dst"))
      .distinct()
  }

  /** Small-star: for each node u over its smaller neighbors N (dst side of
    * src>dst edges), connect every v ∈ N ∪ {u}, v ≠ m, to m = min(N).
    * Preserves src > dst. */
  private def smallStar(e: DataFrame): DataFrame = {
    val mins = e.groupBy(col("src")).agg(min(col("dst")).as("m"))
    val moved = e.hint("shuffle_hash").join(mins, "src")
      .filter(col("dst") =!= col("m"))
      .select(col("dst").as("src"), col("m").as("dst"))
    moved.unionByName(mins.select(col("src"), col("m").as("dst"))).distinct()
  }

  /** Component labels for an undirected edge list: one row per node that
    * appears in any edge, `component` = the minimum node id reachable.
    * Nodes absent from `edges` are absent here — join the full node list
    * with a coalesce for singleton components (see queries.Text.q59).
    *
    * Adaptive small-graph path: the initial fingerprint job already knows
    * the deduped edge count; at or below `smallGraphThreshold` edges
    * (default 1M ≈ 16 MB — the same order as a broadcast side) the graph
    * is collected and solved with driver-side union-find in one pass
    * instead of paying several shuffle rounds of fixed overhead. This is
    * the AQE philosophy applied to an iterative operator: runtime size
    * decides the physical strategy. Near-dup graphs after thresholding are
    * typically ≪1% of the corpus, but pass `smallGraphThreshold = 0` to
    * force the distributed star algorithm at any size.
    */
  def run(edges: DataFrame, srcCol: String = "src", dstCol: String = "dst",
      maxIter: Int = 50, smallGraphThreshold: Long = 1000000L): DataFrame = {
    val spark = edges.sparkSession
    var e = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
      .select(greatest(col("src"), col("dst")).as("src"),
        least(col("src"), col("dst")).as("dst"))
      .distinct()
      .localCheckpoint(false)
    var fp = fingerprint(e) // materializes the lazy checkpoint
    if (fp._1 > 0L && fp._1 <= smallGraphThreshold) {
      import spark.implicits._
      // BOUND: gated — fp._1 (edge count) ≤ smallGraphThreshold
      val local = e.collect().map(r => (r.getLong(0), r.getLong(1)))
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x // path compression
        while (parent.getOrElse(c, c) != r) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      local.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = local.iterator.flatMap(t => Iterator(t._1, t._2)).toSet
      return nodes.iterator.map(v => (v, find(v))).toSeq.toDF("node", "component")
    }
    var it = 0
    var converged = fp._1 == 0L
    while (!converged && it < maxIter) {
      // lazy checkpoint: the fingerprint aggregate is the materializing job,
      // so each round costs ONE action instead of checkpoint + fingerprint
      val next = smallStar(largeStar(e)).localCheckpoint(false)
      val nfp = fingerprint(next)
      converged = nfp == fp
      fp = nfp
      e = next
      it += 1
    }
    require(converged, s"connected components did not converge in $maxIter rounds")
    // converged state is a star forest: dst IS the component minimum
    e.select(col("src").as("node"), col("dst").as("component"))
      .unionByName(e.select(col("dst").as("node"), col("dst").as("component")))
      .distinct()
  }
}
