package graft

import org.apache.spark.sql.functions._
import graft.operators.GraphOps

class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ranksOf(nodes: Seq[Long], edges: Seq[(Long, Long)],
      iters: Int = 5): Map[Long, Long] =
    GraphOps.pageRank(
      nodes.toDF("node"), edges.toDF("src", "dst"), iters)
      .as[(Long, Long)].collect().toMap

  test("pagerank: symmetric 2-cycle splits mass equally") {
    val r = ranksOf(Seq(0L, 1L), Seq((0L, 1L), (1L, 0L)))
    assert(r(0L) == r(1L))
    // mass conserved up to integer-truncation dust
    assert(math.abs(r.values.sum - GraphOps.Scale) < 1000)
  }

  test("pagerank: star center outranks leaves, leaves tie") {
    // 4 leaves all point at the hub; hub points back at one leaf
    val edges = Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 0L), (0L, 1L))
    val r = ranksOf(Seq(0L, 1L, 2L, 3L, 4L), edges)
    assert(r(0L) > r(1L), s"hub must outrank: $r")
    assert(r(2L) == r(3L) && r(3L) == r(4L), s"plain leaves must tie: $r")
    assert(r(1L) > r(2L), s"the hub-endorsed leaf outranks plain leaves: $r")
  }

  test("pagerank: dangling node's mass is redistributed, not lost") {
    // 0 -> 1, 1 has no out-links (dangling)
    val r = ranksOf(Seq(0L, 1L), Seq((0L, 1L)))
    assert(r(1L) > r(0L), s"sink receives 0's mass: $r")
    assert(math.abs(r.values.sum - GraphOps.Scale) < 1000,
      s"dangling mass must be recycled: $r")
  }

  test("pagerank: iterations are exact integer arithmetic (repeat-stable)") {
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
    val n = docs.count()
    val edges = docs.crossJoin(spark.range(3).select($"id".as("k")))
      .select($"doc_id".as("src"),
        (($"doc_id" * 31 + $"n_chars" * 7 + $"k" * 13) % n).as("dst"))
      .filter($"dst" =!= $"src").distinct()
    val nodes = docs.select($"doc_id".as("node"))
    val a = GraphOps.pageRank(nodes, edges, 5).as[(Long, Long)].collect().toMap
    val b = GraphOps.pageRank(nodes, edges, 5).as[(Long, Long)].collect().toMap
    assert(a == b, "fixed-point ranks must be bit-identical across runs")
    assert(a.values.sum <= GraphOps.Scale &&
      a.values.sum > GraphOps.Scale - 100L * n,
      s"mass drift beyond truncation bound: ${a.values.sum}")
  }

  test("pagerank: more in-links means more rank on the real corpus graph") {
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
    val n = docs.count()
    val edges = docs.crossJoin(spark.range(3).select($"id".as("k")))
      .select($"doc_id".as("src"),
        (($"doc_id" * 31 + $"n_chars" * 7 + $"k" * 13) % n).as("dst"))
      .filter($"dst" =!= $"src").distinct()
    val nodes = docs.select($"doc_id".as("node"))
    val pr = GraphOps.pageRank(nodes, edges, 5)
    val indeg = edges.groupBy($"dst".as("node")).agg(count(lit(1)).as("ind"))
    val joined = pr.join(indeg, Seq("node"), "left")
      .select($"node", $"pr_micro", coalesce($"ind", lit(0L)).as("ind"))
      .as[(Long, Long, Long)].collect()
    val zeroIn = joined.filter(_._3 == 0L).map(_._2)
    val manyIn = joined.filter(_._3 >= 5L).map(_._2)
    if (zeroIn.nonEmpty && manyIn.nonEmpty)
      assert(manyIn.min > zeroIn.max,
        "heavily-linked docs must outrank unlinked ones")
  }

  test("small-graph pageRank path is bit-identical to the distributed recurrence") {
    import spark.implicits._
    // messy graph: dangling nodes, parallel edges, a hub, an edge to a
    // node outside the universe (must be ignored by both paths)
    val nodes = (0L until 40L).toDF("node")
    val edges = ((0L until 40L).flatMap(s => Seq((s, (s * 7 + 1) % 40), (s, (s * 3 + 2) % 40)))
      ++ Seq((1L, 5L), (1L, 5L), (7L, 999L)) // parallel links + out-of-universe dst
      ).filter { case (s, _) => s % 5 != 0 } // every 5th node dangling
      .toDF("src", "dst")
    val local = GraphOps.pageRank(nodes, edges, iters = 4)
      .as[(Long, Long)].collect().toMap
    val dist = GraphOps.pageRank(nodes, edges, iters = 4, smallGraphThreshold = 0)
      .as[(Long, Long)].collect().toMap
    assert(local == dist, "driver-side and distributed PageRank must be bit-equal")
    assert(local.size == 40 && local.values.sum > 0)
  }

  test("label propagation: disjoint cliques converge to their min id") {
    import spark.implicits._
    // two triangles (0,1,2) and (10,11,12) plus an isolated node 20
    val nodes = Seq(0L, 1L, 2L, 10L, 11L, 12L, 20L).toDF("node")
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L),
      (10L, 11L), (11L, 12L), (12L, 10L)).toDF("src", "dst")
    val lab = GraphOps.labelPropagation(nodes, edges, iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(lab(0L) == 0L && lab(1L) == 0L && lab(2L) == 0L, s"clique A: $lab")
    assert(lab(10L) == 10L && lab(11L) == 10L && lab(12L) == 10L, s"clique B: $lab")
    assert(lab(20L) == 20L, s"isolated node keeps itself: $lab")
  }

  test("label propagation: smallest label wins vote ties") {
    import spark.implicits._
    // node 5 has neighbors 1 and 2 (one vote each) plus its own self-vote
    // of 5: three-way tie after round 1 → label 1 (the smallest)
    val nodes = Seq(1L, 2L, 5L).toDF("node")
    val edges = Seq((1L, 5L), (2L, 5L)).toDF("src", "dst")
    val lab = GraphOps.labelPropagation(nodes, edges, iters = 1)
      .as[(Long, Long)].collect().toMap
    assert(lab(5L) == 1L, s"tie must break to the smallest label: $lab")
  }

  test("small-graph label propagation is bit-identical to the distributed recurrence") {
    import spark.implicits._
    // messy: parallel edges, self-loop, an edge to a node outside the
    // universe (dropped by both paths), a dangling-receiver-only node
    val nodes = (0L until 30L).toDF("node")
    val edges = ((0L until 30L).flatMap(s => Seq((s, (s * 7 + 1) % 30), (s, (s * 3 + 2) % 30)))
      ++ Seq((1L, 5L), (1L, 5L), (4L, 4L), (7L, 999L))).toDF("src", "dst")
    val local = GraphOps.labelPropagation(nodes, edges, iters = 4)
      .as[(Long, Long)].collect().toMap
    val dist = GraphOps.labelPropagation(nodes, edges, iters = 4, smallGraphThreshold = 0)
      .as[(Long, Long)].collect().toMap
    assert(local == dist, "driver-side and distributed LPA must be bit-equal")
    assert(local.size == 30)
  }

  test("personalized PageRank with all-node seeds reduces to PageRank bit-for-bit") {
    import spark.implicits._
    val nodes = (0L until 30L).toDF("node")
    val edges = (0L until 30L).flatMap(s => Seq((s, (s * 7 + 1) % 30), (s, (s * 3 + 2) % 30)))
      .filter { case (a, b) => a != b }.toDF("src", "dst")
    val pr = GraphOps.pageRank(nodes, edges, iters = 4, smallGraphThreshold = 0)
      .as[(Long, Long)].collect().toMap
    val pprLocal = GraphOps.personalizedPageRank(nodes, edges, nodes, iters = 4)
      .as[(Long, Long)].collect().toMap
    val pprDist = GraphOps.personalizedPageRank(nodes, edges, nodes, iters = 4,
      smallGraphThreshold = 0).as[(Long, Long)].collect().toMap
    assert(pr == pprDist, "uniform seeds must reproduce plain PageRank exactly")
    assert(pprLocal == pprDist, "driver-side and distributed PPR must be bit-equal")
  }

  test("personalized PageRank concentrates mass near the seeds") {
    import spark.implicits._
    // two disjoint rings; seeds only in ring A → ring B gets ZERO mass
    val ringA = (0L until 10L).map(i => (i, (i + 1) % 10))
    val ringB = (10L until 20L).map(i => (i, 10L + (i + 1) % 10))
    val nodes = (0L until 20L).toDF("node")
    val seeds = Seq(0L, 5L).toDF("node")
    val ppr = GraphOps.personalizedPageRank(nodes,
      (ringA ++ ringB).toDF("src", "dst"), seeds, iters = 5)
      .as[(Long, Long)].collect().toMap
    assert((10L until 20L).forall(ppr(_) == 0L),
      s"the unreachable component must hold zero mass: $ppr")
    assert(ppr(0L) > 0L && ppr(1L) > 0L, "seeds and their successors rank")
    assert(ppr.values.sum <= GraphOps.Scale, "mass never exceeds Scale")
  }

  test("neighbor sampling truncates hubs to k; two-hop stays within k1*k2") {
    import spark.implicits._
    // hub 0 with 20 neighbors; each leaf links back to the hub and one peer
    val edges = ((1L to 20L).flatMap(l => Seq((0L, l), (l, 0L), (l, l % 20 + 1)))).toDF("src", "dst")
    val s = GraphOps.sampleNeighbors(edges, k = 3)
    val perSrc = s.groupBy("src").count().as[(Long, Long)].collect().toMap
    assert(perSrc(0L) == 3L, s"hub must truncate to k: $perSrc")
    assert(perSrc.values.forall(_ <= 3L))
    // determinism across partitionings
    val s2 = GraphOps.sampleNeighbors(edges.repartition(5), k = 3)
    assert(s.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      s2.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
    val hop2 = GraphOps.twoHopSample(edges, k1 = 2, k2 = 2)
    val perNode = hop2.groupBy("node").count().as[(Long, Long)].collect().toMap
    assert(perNode.values.forall(_ <= 4L), s"two-hop must stay within k1*k2: $perNode")
    assert(hop2.filter($"n2" === $"node").count() == 0, "no immediate back-edges")
  }

  test("negative sampling never emits a true edge or a self-loop") {
    import spark.implicits._
    val n = 50L
    val nodes = (0L until n).toDF("node")
    // ring + chords
    val e0 = (0L until n).flatMap(u => Seq((u, (u + 1) % n), (u, (u * 7 + 3) % n)))
      .filter { case (a, b) => a != b }
    val ue = (e0 ++ e0.map(_.swap)).distinct.toDF("src", "dst")
    val neg = GraphOps.negativeEdges(nodes, ue, n, m = 8, k = 3)
    val negSet = neg.select("node", "neg").as[(Long, Long)].collect().toSet
    val trueSet = ue.as[(Long, Long)].collect().toSet
    assert(negSet.nonEmpty && negSet.intersect(trueSet).isEmpty,
      "negatives must not contain true edges")
    assert(negSet.forall { case (a, b) => a != b }, "no self-loops")
    val perNode = neg.groupBy("node").count().as[(Long, Long)].collect().toMap
    assert(perNode.values.forall(_ <= 3L))
  }

  test("triangleCounts: K4 + star + disconnected match closed form") {
    import spark.implicits._
    // K4 on 0-3 (4 triangles, each node in 3 of them); star hub 10 with
    // leaves 11-14 (0 triangles — the spam-farm shape); isolated 20;
    // duplicate and reversed edges must not inflate counts
    val k4 = for { a <- 0L to 3L; b <- 0L to 3L if a != b } yield (a, b)
    val star = (11L to 14L).flatMap(l => Seq((10L, l), (l, 10L)))
    val edges = (k4 ++ star ++ Seq((0L, 1L), (1L, 0L))).toDF("src", "dst")
    val nodes = ((0L to 3L) ++ (10L to 14L) :+ 20L).toDF("node")
    val got = GraphOps.triangleCounts(nodes, edges).as[(Long, Long)]
      .collect().toMap
    (0L to 3L).foreach(n => assert(got(n) == 3L, s"K4 node $n"))
    ((10L to 14L) :+ 20L).foreach(n => assert(got(n) == 0L, s"triangle-free node $n"))
    assert(got.size == 10)
  }
}
