package graft

import graft.queries.Relational

class RelationalSpec extends SparkSpec {

  test("q01 pricing summary groups by flag+status and aggregates") {
    val df = Relational.q01PricingSummary(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 8)
    assert(df.columns.sorted.toSeq ==
      Seq("avg_disc", "avg_qty", "count_order", "l_linestatus", "l_returnflag",
          "sum_base_price", "sum_disc_price", "sum_qty"))
    val total = rows.map(_.getAs[Long]("count_order")).sum
    assert(total > 1000, s"expected >1000 rows summarized, got $total")
  }

  test("q02 join plan broadcasts dimension tables") {
    val df = Relational.q02JoinRevenue(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast joins in:\n$plan")
    assert(df.count() > 0)
  }

  test("q06 filter reaches the parquet scan (pushdown)") {
    val df = Relational.q06Revenue(spark, sfDir)
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: ["), s"no pushed filters in:\n$scan")
    assert(scan.contains("l_discount"), "discount filter not pushed")
    assert(df.collect().head.getAs[Long]("n_rows") > 0)
  }

  test("q04 running total is monotone within a customer") {
    val rows = Relational.q04RunningTotal(spark, sfDir)
      .filter("o_custkey = 1").orderBy("order_seq").collect()
    val totals = rows.map(_.getAs[Double]("running_total"))
    assert(totals.sameElements(totals.sorted), "running total must be nondecreasing")
  }

  test("salted skew join is row-equivalent to the plain equi-join") {
    import org.apache.spark.sql.functions._
    val orders = graft.core.Tables.load(spark, sfDir, "orders")
    val customer = graft.core.Tables.load(spark, sfDir, "customer")
    val salted = graft.operators.SkewJoin
      .salted(orders, customer, "o_custkey", "c_custkey", col("o_orderkey"), salts = 4)
      .select(col("o_orderkey"), col("c_custkey"), col("c_mktsegment"))
    val plain = orders.join(customer, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_custkey"), col("c_mktsegment"))
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("bucketized range join equals the naive range predicate incl. boundaries") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // points at bucket edges, interval edges, and interior; intervals
    // spanning multiple buckets, sub-bucket, and bucket-aligned
    val points = Seq(0L, 9L, 10L, 19L, 20L, 25L, 99L, 100L, 101L)
      .toDF("pt")
    val intervals = Seq((1L, 0L, 10L), (2L, 10L, 20L), (3L, 5L, 105L), (4L, 20L, 21L))
      .toDF("iv_id", "s", "e")
    val got = graft.operators.RangeJoin
      .pointInInterval(points, intervals, "pt", "s", "e", bucketWidth = 10L)
      .select("iv_id", "pt").as[(Long, Long)].collect().toSet
    val want = (for {
      p <- Seq(0L, 9L, 10L, 19L, 20L, 25L, 99L, 100L, 101L)
      (id, s, e) <- Seq((1L, 0L, 10L), (2L, 10L, 20L), (3L, 5L, 105L), (4L, 20L, 21L))
      if p >= s && p < e
    } yield (id, p)).toSet
    assert(got == want, s"diff: missing=${want diff got} extra=${got diff want}")
  }

  test("interval overlap join: exact pair set, one emission per multi-bucket overlap") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // overlaps spanning several shared buckets (the dedup case), touching
    // endpoints (half-open: NOT a match), sub-bucket slivers, containment
    val ls = Seq((1L, 0L, 25L), (2L, 10L, 20L), (3L, 30L, 31L), (4L, 5L, 105L))
    val rs = Seq((10L, 0L, 100L), (11L, 20L, 30L), (12L, 24L, 26L), (13L, 31L, 40L))
    val got = graft.operators.RangeJoin
      .intervalOverlap(ls.toDF("l_id", "ls", "le"), rs.toDF("r_id", "rs", "re"),
        "ls", "le", "rs", "re", bucketWidth = 10L)
      .select("l_id", "r_id").as[(Long, Long)].collect().toList
    val want = (for {
      (lid, s1, e1) <- ls
      (rid, s2, e2) <- rs
      if s1 < e2 && s2 < e1
    } yield (lid, rid)).toList
    // toList, not toSet: a pair emitted from two shared buckets would
    // survive a set compare — duplicates must be caught
    assert(got.sorted == want.sorted,
      s"diff: missing=${want diff got} extra=${got diff want}")
  }

  test("range join auto bucketWidth: median pinned on fixture, results unchanged") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // lengths 10, 10, 100, 30, 1 (and one empty interval excluded) —
    // median interval length is 10
    val intervals = Seq((1L, 0L, 10L), (2L, 10L, 20L), (3L, 5L, 105L),
      (4L, 20L, 50L), (5L, 7L, 8L), (6L, 9L, 9L)).toDF("iv_id", "s", "e")
    assert(graft.operators.RangeJoin.medianWidth(intervals, "s", "e") == 10L)
    // empty interval set falls back to width 1 rather than failing
    assert(graft.operators.RangeJoin.medianWidth(
      intervals.where(col("e") <= col("s")), "s", "e") == 1L)
    val points = Seq(0L, 5L, 9L, 10L, 25L, 49L, 104L, 105L).toDF("pt")
    def pairs(width: Long): Set[(Long, Long)] = graft.operators.RangeJoin
      .pointInInterval(points, intervals, "pt", "s", "e", bucketWidth = width)
      .select("iv_id", "pt").as[(Long, Long)].collect().toSet
    assert(pairs(0L) == pairs(7L), "auto width changed the result set")
    // two-sided: pooled-median auto width, same exact pair list (dup-safe)
    val rs = Seq((10L, 0L, 100L), (11L, 20L, 30L), (12L, 104L, 106L)).toDF("r_id", "rs", "re")
    def overlaps(width: Long): List[(Long, Long)] = graft.operators.RangeJoin
      .intervalOverlap(intervals, rs, "s", "e", "rs", "re", bucketWidth = width)
      .select("iv_id", "r_id").as[(Long, Long)].collect().toList.sorted
    assert(overlaps(0L) == overlaps(13L), "auto width changed the overlap list")
  }

  test("bucketed tables co-locate the join: no exchange on the join key") {
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("graft-bucketed").toString
    val orders = graft.core.Tables.load(spark, sfDir, "orders")
    val customer = graft.core.Tables.load(spark, sfDir, "customer")
    orders.write.mode("overwrite").option("path", s"$tmp/b_orders")
      .bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable("b_orders")
    customer.write.mode("overwrite").option("path", s"$tmp/b_cust")
      .bucketBy(8, "c_custkey").sortBy("c_custkey").saveAsTable("b_cust")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
      val j = spark.table("b_orders")
        .join(spark.table("b_cust"), col("o_custkey") === col("c_custkey"))
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle either side:\n${plan.take(3000)}")
      assert(j.count() == orders.count(), "inner join on FK must preserve order rows")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_cust")
    }
  }

  test("every registered query runs on sf0.001") {
    graft.queries.Registry.all.foreach { q =>
      val n = q.fn(spark, sfDir).count()
      assert(n >= 0, s"${q.name} failed")
    }
  }

  test("pivot with explicit values plans ONE aggregate pass and no extra job") {
    val df = graft.queries.Relational.q113Pivot(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    // explicit pivot values ⇒ no distinct-values collect job and a single
    // hash-aggregate chain (partial + final), never a join or expand
    assert(!plan.contains("Expand") && !plan.contains("Join"),
      s"pivot should be pure aggregation:\n$plan")
    assert(df.columns.toSeq == Seq("o_orderpriority", "total_f", "total_o", "total_p"))
    // cube grouping ids partition the output: 4 grouping sets present
    val gids = graft.queries.Relational.q114Cube(spark, sfDir)
      .select("gid").distinct().collect().map(_.getLong(0)).sorted.toSeq
    assert(gids == Seq(0L, 1L, 2L, 3L))
  }

  test("IQR fences flag planted outliers and only them") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // body: 100 values 10.00..10.99 per group; outliers planted far out
    val rows = (for (g <- Seq("A", "B"); i <- 0 until 100)
      yield (s"$g$i", g, 10.0 + i / 100.0)) ++
      Seq(("oA", "A", 99.0), ("oB", "B", -50.0))
    val df = rows.toDF("o_orderkey", "o_orderpriority", "o_totalprice")
    val qs = graft.operators.Sketches.groupedQuantiles(
      df, "o_orderpriority", "o_totalprice", Seq(0.25, 0.75))
    val q1 = qs.filter(col("q") === 0.25)
      .select(col("o_orderpriority"), col("value").as("q1"))
    val q3 = qs.filter(col("q") === 0.75)
      .select(col("o_orderpriority"), col("value").as("q3"))
    val flagged = df.join(broadcast(q1), "o_orderpriority")
      .join(broadcast(q3), "o_orderpriority")
      .select(col("o_orderkey"),
        (col("o_totalprice") < col("q1") - lit(1.5) * (col("q3") - col("q1")) ||
          col("o_totalprice") > col("q3") + lit(1.5) * (col("q3") - col("q1")))
          .as("is_outlier"))
      .filter(col("is_outlier")).select("o_orderkey")
      .as[String].collect().sorted.toSeq
    assert(flagged == Seq("oA", "oB"), s"got $flagged")
  }

  test("loadEvents normalizes ts to epoch-ns longs whatever the parquet type") {
    import org.apache.spark.sql.types.LongType
    // the driver regenerates testdata between rounds; events.ts has shipped
    // both as TIMESTAMP(NANOS)-read-as-long and as timestamp[us] (NTZ) —
    // every events consumer does integer bucket math on ns, so the loader
    // must yield LongType for either physical shape (a silent TIMESTAMP
    // here broke q20-q23 for two whole rounds)
    val ev = graft.core.Tables.loadEvents(spark, sfDir)
    assert(ev.schema("ts").dataType == LongType, s"got ${ev.schema("ts").dataType}")
    // and the values must be epoch NANOSECONDS (2020..2040 range check)
    val t = ev.selectExpr("min(ts)", "max(ts)").head()
    assert(t.getLong(0) > 1500000000L * 1000000000L &&
      t.getLong(1) < 2300000000L * 1000000000L,
      s"ts range ${t.getLong(0)}..${t.getLong(1)} is not epoch-ns")
  }
}
