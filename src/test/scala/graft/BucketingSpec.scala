package graft

import org.apache.spark.sql.functions._

import graft.core.{Bucketing, Tables}

/** The bucketing layout contract: co-bucketed tables join and aggregate
  * WITHOUT exchanges — the shuffle was paid once at write time.
  */
class BucketingSpec extends SparkSpec {

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def noBroadcast[A](f: => A): A = {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
      (64L * 1024 * 1024).toString)
  }

  test("co-bucketed equi-join + agg plans no Exchange on either side") {
    val orders = Tables.load(spark, sfDir, "orders")
    val li = Tables.load(spark, sfDir, "lineitem")
    Bucketing.writeBucketed(orders.select("o_orderkey", "o_custkey", "o_totalprice"),
      "b_orders", Seq("o_orderkey"), nBuckets = 8)
    Bucketing.writeBucketed(
      li.select(col("l_orderkey").as("o_orderkey"), col("l_quantity")),
      "b_lineitem", Seq("o_orderkey"), nBuckets = 8)

    // disable broadcast so the planner must pick a shuffled strategy —
    // bucketing is what removes the exchanges, not broadcast
    noBroadcast {
      val q = Bucketing.bucketedJoin(spark, "b_orders", "b_lineitem", Seq("o_orderkey"))
        .groupBy(col("o_orderkey")).agg(sum(col("l_quantity")).as("q"))
      val plan = planOf(q)
      assert(!plan.contains("Exchange"),
        s"co-bucketed join/agg should be exchange-free, got:\n$plan")
      assert(q.limit(1).count() == 1) // and it actually runs
    }
  }

  test("mismatched bucket counts fall back to a shuffle (the contract matters)") {
    val orders = Tables.load(spark, sfDir, "orders")
    Bucketing.writeBucketed(orders.select("o_orderkey", "o_totalprice"),
      "b_orders_4", Seq("o_orderkey"), nBuckets = 4)
    noBroadcast {
      val j = Bucketing.bucketedJoin(spark, "b_orders_4", "b_lineitem", Seq("o_orderkey"))
      assert(planOf(j).contains("Exchange"),
        "4-bucket x 8-bucket join cannot be fully exchange-free")
    }
  }
}
