package graft

import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("as-of picks the latest right row at-or-before, per key") {
    val left = Seq((1L, 100L, "a"), (1L, 250L, "b"), (2L, 50L, "c"))
      .toDF("k", "ts", "tag")
    val right = Seq((1L, 90L, 10L, 0.9), (1L, 100L, 11L, 1.0), (1L, 200L, 12L, 2.0),
      (2L, 60L, 13L, 6.0))
      .toDF("k", "ts", "rid", "v")
    val out = AsOfJoin.asOf(left, right, "k", "ts", "rid", Seq("v"))
      .select("tag", "asof_v").collect().map(r => r.getString(0) -> r.get(1)).toMap
    assert(out("a") == 1.0) // equal timestamp row IS eligible
    assert(out("b") == 2.0) // latest preceding
    assert(out("c") == null) // no right row at or before ts=50
  }

  test("ties at equal right timestamps resolve to the largest rightOrd") {
    val left = Seq((1L, 100L)).toDF("k", "ts")
    val right = Seq((1L, 100L, 5L, 5.0), (1L, 100L, 9L, 9.0), (1L, 100L, 7L, 7.0))
      .toDF("k", "ts", "rid", "v")
    val out = AsOfJoin.asOf(left, right, "k", "ts", "rid", Seq("v")).collect()
    assert(out.head.getAs[Double]("asof_v") == 9.0)
  }

  test("forward direction picks the first at-or-after; tolerance nulls far matches") {
    val left = Seq((1L, 100L, "a"), (1L, 250L, "b"), (2L, 50L, "c"))
      .toDF("k", "ts", "tag")
    val right = Seq((1L, 100L, 10L, 1.0), (1L, 180L, 11L, 1.8), (1L, 600L, 12L, 6.0),
      (2L, 40L, 13L, 4.0))
      .toDF("k", "ts", "rid", "v")
    def run(tol: Long) = AsOfJoin.asOfDirected(left, right, "k", "ts", "rid",
        Seq("v"), direction = "forward", tolerance = tol)
      .select("tag", "asof_v").collect().map(r => r.getString(0) -> r.get(1)).toMap
    val noTol = run(Long.MaxValue)
    assert(noTol("a") == 1.0)  // equal timestamp eligible forward too
    assert(noTol("b") == 6.0)  // first at-or-after 250
    assert(noTol("c") == null) // only earlier rows exist for key 2
    val tol = run(200L)
    assert(tol("a") == 1.0 && tol("c") == null)
    assert(tol("b") == null, "600 is 350 out — beyond the 200 tolerance")
  }

  test("nearest picks the closest side; exact |dt| ties go backward") {
    val left = Seq((1L, 100L, "a"), (1L, 205L, "b"), (1L, 500L, "c"))
      .toDF("k", "ts", "tag")
    val right = Seq((1L, 90L, 10L, 0.9), (1L, 110L, 11L, 1.1),
      (1L, 200L, 12L, 2.0), (1L, 210L, 13L, 2.1))
      .toDF("k", "ts", "rid", "v")
    val out = AsOfJoin.asOfDirected(left, right, "k", "ts", "rid", Seq("v"),
        direction = "nearest")
      .select("tag", "asof_v").collect().map(r => r.getString(0) -> r.get(1)).toMap
    assert(out("a") == 0.9, "tie |100-90| == |110-100| must go backward")
    assert(out("b") == 2.0, "tie |205-200| == |210-205| must go backward")
    assert(out("c") == 2.1, "only earlier rows — nearest falls back to backward side")
  }

  test("directed variants equal a brute scan on random data, all directions") {
    val rnd = new scala.util.Random(41)
    val left = Seq.tabulate(200)(i => (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, i.toLong))
      .toDF("k", "ts", "lid")
    val rightRows = Seq.tabulate(300)(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, i.toLong, rnd.nextInt(100).toDouble))
    val right = rightRows.toDF("k", "ts", "rid", "v")
    val byKey = rightRows.groupBy(_._1)
    def brute(k: Long, ts: Long, dir: String, tol: Long): Option[Double] = {
      val rs = byKey.getOrElse(k, Seq.empty)
      // backward: max ts then max rid; forward: min ts then max rid
      val cand = dir match {
        case "backward" => rs.filter(_._2 <= ts).sortBy(r => (r._2, r._3)).lastOption
        case "forward" => rs.filter(_._2 >= ts).sortBy(r => (r._2, -r._3)).headOption
        case "nearest" =>
          val b = rs.filter(_._2 <= ts).sortBy(r => (r._2, r._3)).lastOption
          val f = rs.filter(_._2 >= ts).sortBy(r => (r._2, -r._3)).headOption
          (b, f) match {
            case (Some(bb), Some(ff)) =>
              if (math.abs(ff._2 - ts) < math.abs(bb._2 - ts)) Some(ff) else Some(bb)
            case (x, y) => x.orElse(y)
          }
      }
      cand.filter(r => math.abs(r._2 - ts) <= tol).map(_._4)
    }
    for (dir <- Seq("backward", "forward", "nearest"); tol <- Seq(Long.MaxValue, 50L);
         width <- Seq(0L, 1L, 64L, 100000L)) {
      val got = AsOfJoin.asOfDirected(left, right, "k", "ts", "rid", Seq("v"),
          direction = dir, tolerance = tol, bucketWidth = width)
        .select("lid", "asof_v").collect()
        .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Double])).toMap
      left.collect().foreach { r =>
        val (k, ts, lid) = (r.getLong(0), r.getLong(1), r.getLong(2))
        assert(got(lid) == brute(k, ts, dir, tol),
          s"dir=$dir tol=$tol width=$width lid=$lid k=$k ts=$ts: " +
            s"${got(lid)} vs ${brute(k, ts, dir, tol)}")
      }
    }
  }

  test("bucketed mode: carries, ties, and negative timestamps match the plain path") {
    // crafted cross-bucket cases at width 100: a left row at a bucket start
    // whose only backward match is two buckets back; a forward match three
    // buckets ahead; equal-ts ord ties inside one bucket; negative ts
    // exercising floor (not truncate-toward-zero) bucketing
    val left = Seq((1L, 300L, "carryB"), (1L, 310L, "carryF2"),
      (2L, 100L, "tie"), (3L, -150L, "neg"))
      .toDF("k", "ts", "tag")
    val right = Seq(
      (1L, 95L, 1L, 0.95),   // two buckets before 300
      (1L, 650L, 2L, 6.5),   // three buckets after 310
      (2L, 100L, 3L, 3.0), (2L, 100L, 9L, 9.0), // ord tie at equal ts
      (3L, -160L, 4L, -1.6), (3L, -90L, 5L, -0.9))
      .toDF("k", "ts", "rid", "v")
    for (dir <- Seq("backward", "forward", "nearest")) {
      val plain = AsOfJoin.asOfDirected(left, right, "k", "ts", "rid", Seq("v"),
        direction = dir).select("tag", "asof_v").collect()
        .map(r => r.getString(0) -> r.get(1)).toMap
      val bucketed = AsOfJoin.asOfDirected(left, right, "k", "ts", "rid", Seq("v"),
        direction = dir, bucketWidth = 100L).select("tag", "asof_v").collect()
        .map(r => r.getString(0) -> r.get(1)).toMap
      assert(bucketed == plain, s"dir=$dir: $bucketed vs $plain")
    }
    // plan shape: the data-sized window must partition by BOTH key and
    // ts-bucket (the skew fix — a bare per-key window is the hot-key
    // cliff), and nothing may collapse to a single partition
    val plan = AsOfJoin.asOfDirected(left, right, "k", "ts", "rid", Seq("v"),
      direction = "nearest", bucketWidth = 100L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"),
      "bucketed as-of planned a SinglePartition exchange")
    assert("windowspecdefinition\\(k#\\d+L?, __bkt".r.findFirstIn(plan).isDefined,
      "the main window must partition by (key, __bkt)")

    // spot-check the interesting values through the bucketed path
    val near = AsOfJoin.asOfDirected(left, right, "k", "ts", "rid", Seq("v"),
      direction = "nearest", bucketWidth = 100L).select("tag", "asof_v")
      .collect().map(r => r.getString(0) -> r.get(1)).toMap
    assert(near("carryB") == 0.95, "carry-in from two buckets back")
    assert(near("carryF2") == 0.95, "|310-95|=215 < |650-310|=340 — backward wins")
    assert(near("tie") == 9.0, "largest ord at the equal timestamp")
    assert(near("neg") == -1.6, "floor bucketing on negatives: −160 (|Δ|=10) beats −90 (|Δ|=60)")
  }
}
