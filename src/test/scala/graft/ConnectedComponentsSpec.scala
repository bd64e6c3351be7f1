package graft

import org.apache.spark.sql.functions._
import graft.operators.{ConnectedComponents, TextOps}

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force ground truth: union-find over the edge list. */
  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    (0 until n).map(i => i.toLong -> find(i).toLong).toMap
  }

  private def check(n: Int, edges: Seq[(Long, Long)]): Unit = {
    val truth = unionFind(n, edges)
    val touched = edges.flatMap(e => Seq(e._1, e._2)).toSet
    // threshold default → driver union-find path; 0 → distributed stars.
    // Both must produce identical min-id labels.
    for (thr <- Seq(1000000L, 0L)) {
      val got = ConnectedComponents.run(edges.toDF("src", "dst"),
          smallGraphThreshold = thr)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got.keySet == touched,
        s"thr=$thr: labels exactly the nodes that appear in edges")
      touched.foreach { v =>
        assert(got(v) == truth(v), s"thr=$thr node $v: got ${got(v)}, want ${truth(v)}")
      }
    }
  }

  test("random sparse graphs match union-find ground truth") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      val n = 40 + trial * 30
      val edges = Seq.fill(n / 2)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      check(n, edges)
    }
  }

  test("a long path (worst diameter for label propagation) converges") {
    val n = 257
    check(n, (1 until n).map(i => (i - 1).toLong -> i.toLong))
  }

  test("reversed ids, duplicate + self edges, and isolated stars") {
    val edges = Seq[(Long, Long)](
      (9, 8), (8, 9), (7, 7), (9, 7),   // triangle w/ dup + self edge
      (20, 21),                          // separate pair
      (3, 2), (2, 1), (1, 0))            // chain into 0
    check(25, edges)
  }

  test("empty edge set yields empty labels") {
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(ConnectedComponents.run(empty).isEmpty)
  }

  test("near-dup clusters: every member reaches the canonical by pairs") {
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
    val sh = TextOps.shingleHashes(docs).persist()
    val pairs = TextOps.jaccardFromHashes(sh,
        TextOps.lshCandidatePairs(TextOps.minhashFromHashes(sh)))
      .filter(col("jaccard") >= 0.8)
      .select(col("doc_a"), col("doc_b"))
    val pairSet = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val cc = ConnectedComponents.run(pairs, "doc_a", "doc_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    sh.unpersist()
    val maxId = (pairSet.flatMap(e => Seq(e._1, e._2)) :+ 0L).max
    val truth = unionFind(maxId.toInt + 1, pairSet)
    cc.foreach { case (v, c) => assert(c == truth(v)) }
    // component label is the min member: exactly one canonical per cluster
    cc.groupBy(_._2).foreach { case (comp, members) =>
      assert(members.keys.min == comp)
    }
  }
}
