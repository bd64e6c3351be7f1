package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.core.Tables
import QueryDef._

/** Core relational surface over the TESTDATA star schema.
  *
  * Design notes for 100 TB scale:
  *  - dimension tables (region/nation/supplier/customer) are broadcast —
  *    no shuffle of the fact table for those joins;
  *  - aggregations are partial-agg friendly (hash agg with map-side combine);
  *  - filters sit directly on the scan so parquet pushdown + column pruning
  *    apply (verified via explain in RelationalSpec).
  */
object Relational {

  /** q01: TPC-H Q1-style pricing summary — scan+filter+groupBy agg. */
  def q01PricingSummary(spark: SparkSession, sfDir: String): DataFrame = {
    // decimal-aggregate map CPU straight off the scan — parallelize a
    // single-split input (no-op at scale; Tables.loadPar)
    val lineitem = Tables.loadPar(spark, sfDir, "lineitem")
    lineitem
      .filter(col("l_shipdate") < lit("1997-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        exactSum(col("l_quantity")).as("sum_qty"),
        exactSum(col("l_extendedprice")).as("sum_base_price"),
        exactSumProd(col("l_extendedprice"), lit(1.0) - col("l_discount")).as("sum_disc_price"),
        r6(exactSum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        r6(exactSum(col("l_discount")) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  val q01Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc_price,
      |  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(1), 6) AS avg_qty,
      |  ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(1), 6) AS avg_disc,
      |  COUNT(1) AS count_order
      |FROM lineitem
      |WHERE l_shipdate < TIMESTAMP '1997-09-01'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** q02: 5-way join, dims broadcast — revenue by nation and order status. */
  def q02JoinRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    // the fact side of the broadcast joins + the revenue DECIMAL math is
    // map CPU straight off the scan — parallelize single-split input
    val lineitem = Tables.loadPar(spark, sfDir, "lineitem")
    val orders   = Tables.load(spark, sfDir, "orders")
    val customer = Tables.load(spark, sfDir, "customer")
    val nation   = Tables.load(spark, sfDir, "nation")
    val region   = Tables.load(spark, sfDir, "region")
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"), col("o_orderstatus"))
      .agg(
        exactSumProd(col("l_extendedprice"), lit(1.0) - col("l_discount")).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  val q02Sql: String =
    """SELECT r_name, n_name, o_orderstatus,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  COUNT(1) AS n_items
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name, o_orderstatus""".stripMargin

  /** q03: top-20 customers by exact revenue (deterministic tie-break). */
  def q03TopCustomers(spark: SparkSession, sfDir: String): DataFrame = {
    val lineitem = Tables.loadPar(spark, sfDir, "lineitem")
    val orders   = Tables.load(spark, sfDir, "orders")
    val customer = Tables.load(spark, sfDir, "customer")
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(sum(col("l_extendedprice").cast(DecimalType(18, 2))).as("rev_dec"))
      .orderBy(col("rev_dec").desc, col("c_custkey").asc)
      .limit(20)
      .select(col("c_custkey"), col("c_name"), col("rev_dec").cast("double").as("revenue"))
  }

  val q03Sql: String =
    """SELECT c_custkey, c_name, CAST(rev_dec AS DOUBLE) AS revenue FROM (
      |  SELECT c_custkey, c_name, SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev_dec
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  GROUP BY c_custkey, c_name
      |  ORDER BY rev_dec DESC, c_custkey ASC LIMIT 20
      |) t""".stripMargin

  /** q04: SQL window function — running order total per customer. */
  def q04RunningTotal(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables.load(spark, sfDir, "orders")
    val w = Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders.select(
      col("o_custkey"),
      col("o_orderkey"),
      sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w).cast("double").as("running_total"),
      row_number().over(w).as("order_seq"))
  }

  val q04Sql: String =
    """SELECT o_custkey, o_orderkey,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS running_total,
      |  CAST(ROW_NUMBER() OVER w AS INTEGER) AS order_seq
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin

  /** q06: selective filter + narrow projection — pushdown showcase. */
  def q06Revenue(spark: SparkSession, sfDir: String): DataFrame = {
    val lineitem = Tables.load(spark, sfDir, "lineitem")
    lineitem
      .filter(
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24.0)
      .agg(
        exactSumProd(col("l_extendedprice"), col("l_discount")).as("revenue"),
        count(lit(1)).as("n_rows"))
  }

  val q06Sql: String =
    """SELECT
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  COUNT(1) AS n_rows
      |FROM lineitem
      |WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24.0""".stripMargin

  /** q07: anti+semi join — parts never ordered vs ordered (set-op surface). */
  def q07PartOrderCoverage(spark: SparkSession, sfDir: String): DataFrame = {
    val part     = Tables.load(spark, sfDir, "part")
    val lineitem = Tables.load(spark, sfDir, "lineitem")
    val ordered = part
      .join(lineitem, col("p_partkey") === col("l_partkey"), "left_semi")
      .agg(count(lit(1)).as("n"))
      .select(lit("ordered").as("status"), col("n"))
    val never = part
      .join(lineitem, col("p_partkey") === col("l_partkey"), "left_anti")
      .agg(count(lit(1)).as("n"))
      .select(lit("never_ordered").as("status"), col("n"))
    ordered.unionAll(never)
  }

  val q07Sql: String =
    """SELECT 'ordered' AS status, COUNT(1) AS n FROM part
      |WHERE p_partkey IN (SELECT l_partkey FROM lineitem)
      |UNION ALL
      |SELECT 'never_ordered' AS status, COUNT(1) AS n FROM part
      |WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem)""".stripMargin

  /** q53: ROLLUP multi-level aggregation — per (flag, status), per flag, and
    * grand total. TWO-LEVEL: decimal partials aggregate at the finest grain
    * first (corpus → #distinct-group rows), then the rollup's Expand
    * triplication and its grouping sets re-sum those EXACT decimals —
    * bit-identical (decimal addition is associative), but the 3× row
    * expansion and two of the three decimal aggregations now run over a
    * handful of rows instead of the corpus. The naive single-pass rollup
    * expands every corpus row 3× before the hash agg.
    */
  def q53Rollup(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val lineitem = Tables.loadPar(spark, sfDir, "lineitem")
    val base = lineitem
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec2(col("l_quantity"))).as("sq"),
        sum(dec2(col("l_extendedprice")) * dec2(lit(1.0) - col("l_discount"))).as("sp"),
        count(lit(1)).as("n"))
    base
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("sq")).cast("double").as("sum_qty"),
        sum(col("sp")).cast("double").as("sum_disc_price"),
        sum(col("n")).as("n_rows"),
        grouping_id().as("gid"))
  }

  val q53Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc_price,
      |  COUNT(1) AS n_rows,
      |  CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid
      |FROM lineitem
      |GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin

  /** q113: pivot — reshape order totals to one column per status (the
    * report/feature-matrix shape; Spark's `RelationalGroupedDataset.pivot`
    * with EXPLICIT values, the form that skips the extra distinct-values
    * job and keeps the plan a single hash aggregate). The oracle is the
    * portable spelling: one CASE-filtered aggregate per pivoted value.
    */
  def q113Pivot(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables.load(spark, sfDir, "orders")
    orders.groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(sum(dec2(col("o_totalprice"))).cast("double"))
      .withColumnRenamed("F", "total_f")
      .withColumnRenamed("O", "total_o")
      .withColumnRenamed("P", "total_p")
  }

  val q113Sql: String =
    """SELECT o_orderpriority,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS total_f,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS total_o,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS total_p
      |FROM orders GROUP BY o_orderpriority""".stripMargin

  /** q114: full CUBE over (returnflag, linestatus) — all four grouping
    * sets in one pass (q53 covers the ROLLUP prefix subset). Same
    * decimal-exact partial-sum discipline; `gid` disambiguates the null
    * produced BY the cube from a null grouping value.
    */
  def q114Cube(spark: SparkSession, sfDir: String): DataFrame = {
    val lineitem = Tables.loadPar(spark, sfDir, "lineitem")
    lineitem
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"),
        count(lit(1)).as("n_rows"),
        grouping_id().as("gid"))
  }

  val q114Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  COUNT(1) AS n_rows,
      |  CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid
      |FROM lineitem
      |GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin

  /** q115: Morton/Z-order interleave — the sort key under lakehouse
    * `OPTIMIZE ZORDER BY` (operators.ZOrder; the clustered-write path and
    * its measured file-skipping effect are gated in ZOrderSpec). The
    * oracle recomputes the 8-bit two-column interleave as a closed-form
    * arithmetic sum, so every bit position is checked on every row.
    */
  def q115ZOrder(spark: SparkSession, sfDir: String): DataFrame = {
    val lineitem = Tables.load(spark, sfDir, "lineitem")
    lineitem.select(col("l_orderkey"), col("l_linenumber"),
      graft.operators.ZOrder.zValue(
        Seq(col("l_partkey") % 256, col("l_suppkey") % 256), bits = 8).as("z"))
  }

  val q115Sql: String = {
    val terms = (0 until 8).flatMap { b =>
      Seq(s"((l_partkey % 256 // ${1 << b}) % 2) * ${1L << (2 * b)}",
        s"((l_suppkey % 256 // ${1 << b}) % 2) * ${1L << (2 * b + 1)}")
    }
    s"""SELECT l_orderkey, l_linenumber,
       |  CAST(${terms.mkString("\n    + ")} AS BIGINT) AS z
       |FROM lineitem""".stripMargin
  }

  /** q127: Tukey IQR outlier fences per group — the data-quality flag
    * pass after q103's profile: per order priority, rows outside
    * [q1 − 1.5·IQR, q3 + 1.5·IQR] flag as outliers. Quartiles come from
    * the sort-free grouped exact quantiles (no per-group global sort);
    * fences broadcast and the flag is map-side. Quartile values are data
    * values (2-decimal doubles), so fence arithmetic and comparisons are
    * engine-exact.
    */
  def q127IqrOutliers(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.operators.Sketches
    val orders = Tables.load(spark, sfDir, "orders")
    val qs = Sketches.groupedQuantiles(orders, "o_orderpriority", "o_totalprice",
      Seq(0.25, 0.75))
    val q1 = qs.filter(col("q") === 0.25)
      .select(col("o_orderpriority"), col("value").as("q1"))
    val q3 = qs.filter(col("q") === 0.75)
      .select(col("o_orderpriority"), col("value").as("q3"))
    orders
      .join(broadcast(q1), "o_orderpriority")
      .join(broadcast(q3), "o_orderpriority")
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
        (col("o_totalprice") < col("q1") - lit(1.5) * (col("q3") - col("q1")) ||
          col("o_totalprice") > col("q3") + lit(1.5) * (col("q3") - col("q1")))
          .as("is_outlier"))
  }

  val q127Sql: String =
    """WITH n AS (
      |  SELECT o_orderpriority AS k, COUNT(1) AS c FROM orders GROUP BY 1
      |),
      |r AS (
      |  SELECT o_orderpriority AS k, o_totalprice AS v,
      |    row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice) AS rn
      |  FROM orders
      |),
      |b AS (
      |  SELECT n.k,
      |    MAX(CASE WHEN rn = CAST(floor(0.25 * (c - 1)) AS BIGINT) + 1 THEN v END) AS q1,
      |    MAX(CASE WHEN rn = CAST(floor(0.75 * (c - 1)) AS BIGINT) + 1 THEN v END) AS q3
      |  FROM n JOIN r ON r.k = n.k GROUP BY n.k
      |)
      |SELECT o.o_orderkey, o.o_orderpriority, o.o_totalprice,
      |  (o.o_totalprice < b.q1 - 1.5 * (b.q3 - b.q1)
      |   OR o.o_totalprice > b.q3 + 1.5 * (b.q3 - b.q1)) AS is_outlier
      |FROM orders o JOIN b ON b.k = o.o_orderpriority""".stripMargin

  /** q54: skew-resistant salted join (SkewJoin.salted) — result must equal
    * the PLAIN equi-join, which is exactly what the oracle runs; the salt
    * fan-out is invisible in the output by construction.
    */
  def q54SkewJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val orders   = Tables.load(spark, sfDir, "orders")
    val customer = Tables.load(spark, sfDir, "customer")
    graft.operators.SkewJoin
      .salted(orders, customer, "o_custkey", "c_custkey", col("o_orderkey"), salts = 8)
      .groupBy(col("c_mktsegment"))
      .agg(
        exactSum(col("o_totalprice")).as("total_price"),
        count(lit(1)).as("n_orders"))
  }

  val q54Sql: String =
    """SELECT c_mktsegment,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
      |  COUNT(1) AS n_orders
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment""".stripMargin

  /** q103: one-pass numeric data-quality profile (operators.Profile) over
    * the lineitem measures — the pre-flight drop validation: null counts,
    * cardinalities, ranges, decimal-exact means; every metric computed in
    * a single combinable aggregation pass and pivoted from the 1-row
    * result.
    */
  val ProfileCols: Seq[String] =
    Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  def q103DataProfile(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.Profile.numeric(
      Tables.load(spark, sfDir, "lineitem"), ProfileCols)

  val q103Sql: String = ProfileCols.map { c =>
    s"""SELECT '$c' AS col_name,
       |  CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       |  COUNT(DISTINCT $c) AS n_distinct,
       |  CAST(MIN($c) AS DOUBLE) AS min_v,
       |  CAST(MAX($c) AS DOUBLE) AS max_v,
       |  CAST((CAST(SUM(CAST($c AS DECIMAL(18,2))) * 100 AS BIGINT) * 20000
       |        + COUNT($c)) // (2 * COUNT($c)) AS DOUBLE) / 1e6 AS mean_v
       |FROM lineitem""".stripMargin
  }.mkString("\nUNION ALL\n")

  /** q143: Bloom-pruned fact↔dimension join (the explicit runtime-filter
    * operator, `operators.BloomJoin`). The dimension is filtered to ~10%
    * of parts and joined `shuffle_hash` — the too-big-to-broadcast shape —
    * with the fact side Bloom-pruned BEFORE its exchange so ~90% of
    * lineitem rows never shuffle. The inner join removes Bloom false
    * positives, so the oracle is the plain relational join.
    */
  def q143BloomJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val lineitem = Tables.load(spark, sfDir, "lineitem")
    val smallParts = Tables.load(spark, sfDir, "part")
      .filter(col("p_size") <= 5)
      .select(col("p_partkey"), col("p_brand"))
      .hint("shuffle_hash")
    graft.operators.BloomJoin
      .bloomPrunedJoin(lineitem, smallParts, "l_partkey", "p_partkey")
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast("long")).as("sum_qty"))
  }

  val q143Sql: String =
    """SELECT p_brand, COUNT(1) AS n_items,
      |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_size <= 5
      |GROUP BY p_brand""".stripMargin

  /** q151: robust per-group outlier detection (`Profile.madOutliers`) —
    * the median/MAD data-QA pass over customer balances per nation, with
    * deterministic planted corruptions (every 97th key's balance ×100, the
    * classic unit-glitch) so the flag set is non-trivial. All medians ride
    * DOUBLED (med2/dev2/mad4) so every comparison is exact BIGINT — the
    * oracle replays the identical rank arithmetic through its own window
    * formulation. One hash exchange on the nation key serves the whole
    * plan (rank windows, both median groupBys, both join-backs).
    */
  def q151MadOutliers(spark: SparkSession, sfDir: String): DataFrame = {
    val vals = Tables.load(spark, sfDir, "customer").select(
      col("c_nationkey").as("nation"), col("c_custkey").as("custkey"),
      ((dec2(col("c_acctbal")) * 100).cast("long") *
        when(col("c_custkey") % 97 === 0, 100L).otherwise(1L)).as("bal_cents"))
    graft.operators.Profile.madOutliers(vals, "nation", "custkey", "bal_cents")
  }

  val q151Sql: String =
    """WITH vals AS (
      |  SELECT c_nationkey AS nation, c_custkey AS custkey,
      |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      * (CASE WHEN c_custkey % 97 = 0 THEN 100 ELSE 1 END) AS bal_cents
      |  FROM customer
      |),
      |r1 AS (
      |  SELECT nation, custkey, bal_cents,
      |    row_number() OVER (PARTITION BY nation ORDER BY bal_cents, custkey) AS rn,
      |    COUNT(1) OVER (PARTITION BY nation) AS n
      |  FROM vals
      |),
      |med AS (
      |  SELECT nation, CAST(SUM(CASE
      |    WHEN rn = (n - 1) // 2 + 1 AND rn = n // 2 + 1 THEN 2 * bal_cents
      |    WHEN rn = (n - 1) // 2 + 1 OR  rn = n // 2 + 1 THEN bal_cents
      |    ELSE 0 END) AS BIGINT) AS med2
      |  FROM r1 GROUP BY nation
      |),
      |dev AS (
      |  SELECT v.nation, v.custkey, v.bal_cents, m.med2,
      |    abs(2 * v.bal_cents - m.med2) AS dev2
      |  FROM vals v JOIN med m USING (nation)
      |),
      |r2 AS (
      |  SELECT nation, custkey, dev2,
      |    row_number() OVER (PARTITION BY nation ORDER BY dev2, custkey) AS rn,
      |    COUNT(1) OVER (PARTITION BY nation) AS n
      |  FROM dev
      |),
      |mad AS (
      |  SELECT nation, CAST(SUM(CASE
      |    WHEN rn = (n - 1) // 2 + 1 AND rn = n // 2 + 1 THEN 2 * dev2
      |    WHEN rn = (n - 1) // 2 + 1 OR  rn = n // 2 + 1 THEN dev2
      |    ELSE 0 END) AS BIGINT) AS mad4
      |  FROM r2 GROUP BY nation
      |)
      |SELECT d.nation, d.custkey, d.bal_cents, d.med2, d.dev2, m.mad4,
      |  2 * d.dev2 > 3 * m.mad4 AS is_outlier
      |FROM dev d JOIN mad m USING (nation)""".stripMargin

  /** q152: per-brand Pareto front (`operators.Skyline`) — the
    * multi-criteria shortlist: parts not dominated within their brand on
    * (size, price), both maximized. The engine runs the declarative
    * two-window sweep (one exchange, O(n log n) per group); the oracle is
    * the brute-force NOT EXISTS dominance anti-join — two independent
    * formulations of the same dominance relation that must agree
    * row-for-row, duplicates included.
    */
  def q152ParetoFront(spark: SparkSession, sfDir: String): DataFrame = {
    val parts = Tables.load(spark, sfDir, "part").select(
      col("p_brand").as("brand"), col("p_partkey").as("partkey"),
      col("p_size").cast("long").as("size"),
      (dec2(col("p_retailprice")) * 100).cast("long").as("price_cents"))
    graft.operators.Skyline.paretoFront2D(parts, Seq("brand"), "size", "price_cents")
      .select(col("brand"), col("partkey"), col("size"), col("price_cents"))
  }

  val q152Sql: String =
    """WITH p AS (
      |  SELECT p_brand AS brand, p_partkey AS partkey,
      |    CAST(p_size AS BIGINT) AS size,
      |    CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_cents
      |  FROM part
      |)
      |SELECT brand, partkey, size, price_cents FROM p a
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM p b WHERE b.brand = a.brand
      |    AND b.size >= a.size AND b.price_cents >= a.price_cents
      |    AND (b.size > a.size OR b.price_cents > a.price_cents))""".stripMargin

  /** q175: GLOBAL Pareto front (`Skyline.paretoFront2DGlobal`) — the
    * value/recency frontier over ALL events, no grouping key: the shape
    * where the grouped sweep (q152) would serialize every row onto one
    * reducer. The engine runs the classic two-phase skyline instead —
    * a zero-exchange per-partition local sweep (spillable
    * sortWithinPartitions + one streaming pass) prunes to the union of
    * local fronts, and only those rows reach the single-group window.
    * The oracle replays dominance with DuckDB's own window machinery
    * (ascending RANGE frame), while SkylineSpec pins the global path to
    * the brute-force dominance scan on planted data.
    */
  def q175GlobalPareto(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.loadEvents(spark, sfDir).select(
      col("event_id"),
      (dec2(col("value")) * 100).cast("long").as("value_cents"),
      expr("ts DIV 1000").as("ts_us")) // loadEvents normalizes ts to epoch ns
    graft.operators.Skyline.paretoFront2DGlobal(ev, "value_cents", "ts_us")
      .select(col("event_id"), col("value_cents"), col("ts_us"))
  }

  val q175Sql: String =
    """WITH e AS (
      |  SELECT event_id,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS value_cents,
      |    epoch_us(ts) AS ts_us
      |  FROM events
      |),
      |s AS (
      |  SELECT e.*,
      |    MAX(ts_us) OVER (ORDER BY value_cents
      |      RANGE BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS besty,
      |    MAX(ts_us) OVER (PARTITION BY value_cents) AS blocky
      |  FROM e
      |)
      |SELECT event_id, value_cents, ts_us FROM s
      |WHERE ts_us = blocky AND (besty IS NULL OR ts_us > besty)""".stripMargin

  /** q179: sorted-neighborhood candidate pairs (`Fuzzy.sortedNeighborhood`,
    * Hernández & Stolfo 1995) — the ER blocking family token blocks and
    * Hamming bands can't replace: records pair with their w−1 SUCCESSORS
    * in a total sort order (here: account balance in cents), so near-ties
    * meet regardless of shared tokens. The engine computes the global
    * rank with the two-phase bucket-offset scheme (no single-reducer
    * window anywhere — per-bucket windows + a broadcast cumulative
    * offset table) and pairs by EQUI join on rank+d; the oracle is the
    * brute single-window row_number + rank-arithmetic join, so any slip
    * in the distributed ranking breaks the hash.
    */
  def q179SortedNeighborhood(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.load(spark, sfDir, "customer").select(
      col("c_custkey").as("id"),
      (dec2(col("c_acctbal")) * 100).cast("long").as("bal"))
    graft.operators.Fuzzy.sortedNeighborhood(cust, "id", "bal", w = 5)
      .select(col("id_a"), col("key_a").as("bal_a"),
        col("id_b"), col("key_b").as("bal_b"), col("d"))
  }

  val q179Sql: String =
    """WITH c AS (
      |  SELECT c_custkey AS id,
      |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal
      |  FROM customer
      |),
      |r AS (SELECT id, bal, row_number() OVER (ORDER BY bal, id) AS rn FROM c),
      |ds AS (SELECT CAST(unnest(generate_series(1, 4)) AS BIGINT) AS d)
      |SELECT a.id AS id_a, a.bal AS bal_a, b.id AS id_b, b.bal AS bal_b, d
      |FROM r a CROSS JOIN ds JOIN r b ON b.rn = a.rn + d""".stripMargin

  /** q181: percentile-rank feature normalization — the rank-based
    * transform feature pipelines apply before mixing heterogeneous
    * scores (quantile normalization): each balance maps to its
    * within-nation percent rank in exact integer micro-units,
    * `(rank−1)·1e6 DIV (n−1)`, with `rank()` (min-rank) so exact ties
    * share a value, and singleton groups pin to 0. One hash exchange per
    * nation serves both windows; output is order-preserving and bounded
    * [0, 1e6] whatever the raw scale.
    */
  def q181PercentileRank(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("nation")).orderBy(col("bal_cents"))
    val wAll = Window.partitionBy(col("nation"))
    Tables.load(spark, sfDir, "customer").select(
        col("c_custkey").as("custkey"), col("c_nationkey").as("nation"),
        (dec2(col("c_acctbal")) * 100).cast("long").as("bal_cents"))
      // rank() is IntegerType — cast BEFORE the 1e6 multiply (INT wraps
      // past rank ~2148); the numerator then rides DECIMAL(38,0) like
      // every other micro-share in the repo (exact past 9.2e12-row groups)
      .withColumn("__rk", rank().over(w).cast("long"))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("pr_micro",
        expr("""CASE WHEN __n < 2 THEN 0
                ELSE CAST((CAST(__rk - 1 AS DECIMAL(38,0)) * 1000000)
                          DIV (__n - 1) AS BIGINT) END"""))
      .drop("__rk", "__n")
  }

  val q181Sql: String =
    """WITH c AS (
      |  SELECT c_custkey AS custkey, c_nationkey AS nation,
      |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal_cents
      |  FROM customer
      |),
      |r AS (
      |  SELECT custkey, nation, bal_cents,
      |    rank() OVER (PARTITION BY nation ORDER BY bal_cents) AS rk,
      |    COUNT(1) OVER (PARTITION BY nation) AS n
      |  FROM c
      |)
      |SELECT custkey, nation, bal_cents,
      |  CAST(CASE WHEN n < 2 THEN 0
      |       ELSE (CAST(rk - 1 AS HUGEINT) * 1000000) // (n - 1) END AS BIGINT)
      |    AS pr_micro
      |FROM r""".stripMargin

  /** q185: Benford first-digit profile — the fraud / synthetic-data
    * screen (Benford 1938; Nigrini's audit use): naturally-occurring
    * multi-magnitude amounts put digit d first with probability
    * log10(1+1/d); fabricated or truncated data visibly deviates. One
    * map-side-combinable 9-row groupBy over price cents; shares ride the
    * repo's DECIMAL micro-unit discipline and the expected shares are
    * PRECOMPUTED integer constants (301029µ..45757µ) so no engine ever
    * evaluates log10. Output: digit, n, share_micro, benford_micro,
    * dev_micro (|observed − expected|).
    */
  def q185Benford(spark: SparkSession, sfDir: String): DataFrame = {
    val expect = Seq(301029L, 176091L, 124938L, 96910L, 79181L, 66946L,
      57991L, 51152L, 45757L)
    val expectSql = expect.zipWithIndex
      .map { case (m, i) => s"WHEN ${i + 1} THEN ${m}L" }.mkString(" ")
    val wAll = Window.partitionBy()
    Tables.load(spark, sfDir, "lineitem")
      .select((dec2(col("l_extendedprice")) * 100).cast("long").as("cents"))
      .where(col("cents") > 0)
      .withColumn("digit", substring(col("cents").cast("string"), 1, 1).cast("long"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
      .withColumn("__tot", sum(col("n")).over(wAll))
      .withColumn("share_micro",
        expr("CAST((CAST(n AS DECIMAL(38,0)) * 1000000) DIV __tot AS BIGINT)"))
      .withColumn("benford_micro", expr(s"CASE digit $expectSql END"))
      .withColumn("dev_micro", abs(col("share_micro") - col("benford_micro")))
      .drop("__tot")
  }

  val q185Sql: String = {
    val expect = Seq(301029L, 176091L, 124938L, 96910L, 79181L, 66946L,
      57991L, 51152L, 45757L)
    val expectSql = expect.zipWithIndex
      .map { case (m, i) => s"WHEN ${i + 1} THEN $m" }.mkString(" ")
    s"""WITH c AS (
       |  SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
       |  FROM lineitem
       |),
       |d AS (
       |  SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit,
       |    CAST(COUNT(1) AS BIGINT) AS n
       |  FROM c WHERE cents > 0 GROUP BY 1
       |)
       |SELECT digit, n,
       |  CAST((CAST(n AS HUGEINT) * 1000000) // SUM(n) OVER () AS BIGINT) AS share_micro,
       |  CAST(CASE digit $expectSql END AS BIGINT) AS benford_micro,
       |  abs(CAST((CAST(n AS HUGEINT) * 1000000) // SUM(n) OVER () AS BIGINT)
       |      - (CASE digit $expectSql END)) AS dev_micro
       |FROM d""".stripMargin
  }

  /** q186: equi-depth discretization (per-nation balance deciles via
    * `ntile(10)`) — the feature-binning step before crosses/monotonic
    * encodings: each nation's balances split into ten equal-count ranks,
    * remainder to the first buckets (the SQL-standard ntile rule both
    * engines share). Total order fixed by (bal, custkey) so ties are
    * deterministic; one hash exchange per nation.
    */
  def q186Deciles(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("nation")).orderBy(col("bal_cents"), col("custkey"))
    Tables.load(spark, sfDir, "customer").select(
        col("c_custkey").as("custkey"), col("c_nationkey").as("nation"),
        (dec2(col("c_acctbal")) * 100).cast("long").as("bal_cents"))
      .withColumn("decile", ntile(10).over(w).cast("long"))
  }

  val q186Sql: String =
    """SELECT c_custkey AS custkey, c_nationkey AS nation,
      |  CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal_cents,
      |  CAST(ntile(10) OVER (PARTITION BY c_nationkey
      |    ORDER BY CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT), c_custkey)
      |    AS BIGINT) AS decile
      |FROM customer""".stripMargin

  /** q157: k-anonymity audit (`Profile.kAnonymity`) — the privacy QA
    * before a data release: every (nation, segment, $1000-balance-bucket)
    * quasi-identifier combination smaller than k=3 re-identifies its
    * members. The bucket rides a +100000-cent offset so the integer
    * division never sees a negative numerator (Spark DIV truncates toward
    * zero, DuckDB // floors — they disagree below zero). One map-side-
    * combinable groupBy over the QI tuple.
    */
  def q157KAnonymity(spark: SparkSession, sfDir: String): DataFrame = {
    val qi = Tables.load(spark, sfDir, "customer").select(
      col("c_nationkey").as("nation"), col("c_mktsegment").as("segment"),
      expr("""(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) + 100000)
              DIV 100000""").as("bal_bucket"))
    graft.operators.Profile.kAnonymity(qi, Seq("nation", "segment", "bal_bucket"), k = 3)
  }

  val q157Sql: String =
    """WITH qi AS (
      |  SELECT c_nationkey AS nation, c_mktsegment AS segment,
      |    (CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) + 100000) // 100000 AS bal_bucket
      |  FROM customer
      |)
      |SELECT nation, segment, bal_bucket, CAST(COUNT(1) AS BIGINT) AS n_rows,
      |  COUNT(1) < 3 AS is_risky
      |FROM qi GROUP BY nation, segment, bal_bucket""".stripMargin

  /** q158: per-group winsorization (`Profile.winsorize`) — the repair
    * companion to q151's outlier flags: clamp balances into the nation's
    * [p5, p95] exact-rank band. Bounds come from the sort-free histogram-
    * rank machinery (`Sketches.groupedQuantiles` — q98's shape), so no
    * per-key full sort exists anywhere; clamped values are order
    * statistics from the data domain, never interpolated floats. The
    * oracle derives the same ⌊q·(n−1)⌋-rank bounds through a window
    * formulation — two independent quantile computations that must agree.
    */
  def q158Winsorize(spark: SparkSession, sfDir: String): DataFrame = {
    val vals = Tables.load(spark, sfDir, "customer").select(
      col("c_nationkey").as("nation"), col("c_custkey").as("custkey"),
      (dec2(col("c_acctbal")) * 100).cast("long").as("bal_cents"))
    graft.operators.Profile.winsorize(vals, "nation", "custkey", "bal_cents",
      loQ = 0.05, hiQ = 0.95)
  }

  val q158Sql: String =
    """WITH vals AS (
      |  SELECT c_nationkey AS nation, c_custkey AS custkey,
      |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal_cents
      |  FROM customer
      |),
      |r AS (
      |  SELECT nation, bal_cents,
      |    row_number() OVER (PARTITION BY nation ORDER BY bal_cents, custkey) AS rn,
      |    COUNT(1) OVER (PARTITION BY nation) AS n
      |  FROM vals
      |),
      |lo AS (SELECT nation, bal_cents AS lo FROM r
      |       WHERE rn = CAST(floor(0.05 * (n - 1)) AS BIGINT) + 1),
      |hi AS (SELECT nation, bal_cents AS hi FROM r
      |       WHERE rn = CAST(floor(0.95 * (n - 1)) AS BIGINT) + 1)
      |SELECT v.nation, v.custkey, v.bal_cents, lo, hi,
      |  least(greatest(bal_cents, lo), hi) AS value_w,
      |  bal_cents < lo AS clamped_low, bal_cents > hi AS clamped_high
      |FROM vals v JOIN lo USING (nation) JOIN hi USING (nation)""".stripMargin

  /** q166: snapshot distribution drift (`Profile.bucketDrift`) — the
    * training-data drift monitor: bucket-share total-variation distance
    * (the PSI role, log-free so integer-exact) between lineitem prices and
    * a deterministically drifted refresh (+5% on every third order's
    * lines). Two combinable groupBys shuffle |buckets| rows; TV rides a
    * broadcast 1-row frame onto every bucket row.
    */
  def q166BucketDrift(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
    val cents = "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
    val a = li.select(expr(s"$cents DIV 500000").as("bucket"))
    val b = li.select(expr(
      s"""(CASE WHEN l_orderkey % 3 = 0 THEN ($cents * 105) DIV 100
         | ELSE $cents END) DIV 500000""".stripMargin).as("bucket"))
    graft.operators.Profile.bucketDrift(a, b, "bucket")
  }

  val q166Sql: String =
    """WITH pc AS (
      |  SELECT l_orderkey,
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM lineitem
      |),
      |a AS (SELECT cents // 500000 AS bucket FROM pc),
      |b AS (
      |  SELECT (CASE WHEN l_orderkey % 3 = 0 THEN (cents * 105) // 100
      |          ELSE cents END) // 500000 AS bucket
      |  FROM pc
      |),
      |ca AS (SELECT bucket, CAST(COUNT(1) AS BIGINT) AS n_a FROM a GROUP BY bucket),
      |cb AS (SELECT bucket, CAST(COUNT(1) AS BIGINT) AS n_b FROM b GROUP BY bucket),
      |ta AS (SELECT SUM(n_a) AS t FROM ca),
      |tb AS (SELECT SUM(n_b) AS t FROM cb),
      |sa AS (SELECT bucket, n_a, CAST(n_a * 1000000 // t AS BIGINT) AS share_a_micro FROM ca, ta),
      |sb AS (SELECT bucket, n_b, CAST(n_b * 1000000 // t AS BIGINT) AS share_b_micro FROM cb, tb),
      |j AS (
      |  SELECT COALESCE(sa.bucket, sb.bucket) AS bucket,
      |    COALESCE(n_a, 0) AS n_a, COALESCE(n_b, 0) AS n_b,
      |    COALESCE(share_a_micro, 0) AS share_a_micro,
      |    COALESCE(share_b_micro, 0) AS share_b_micro
      |  FROM sa FULL JOIN sb ON sa.bucket = sb.bucket
      |),
      |tv AS (SELECT CAST(SUM(abs(share_a_micro - share_b_micro)) // 2 AS BIGINT) AS tv_micro FROM j)
      |SELECT bucket, n_a, n_b, share_a_micro, share_b_micro, tv_micro FROM j, tv""".stripMargin

  /** q170: schema-dependency profile (`Profile.fdViolations` /
    * `inclusionOrphans`, the Metanome-style discovery primitives) — the
    * audit a pipeline runs before trusting join/dedup keys: two FD checks
    * (one that genuinely holds, one that genuinely fails on this data) and
    * three referential-integrity checks (both true FKs plus the reverse
    * direction, which orphans customers without orders). Each check
    * shuffles key columns only.
    */
  def q170DependencyProfile(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.operators.Profile
    val orders = Tables.load(spark, sfDir, "orders")
    val cust = Tables.load(spark, sfDir, "customer")
    val li = Tables.load(spark, sfDir, "lineitem")
    val part = Tables.load(spark, sfDir, "part")
    def tag(name: String, df: DataFrame): DataFrame =
      df.select(lit(name).as("check"), col("n_keys"),
        col("n_violations"), (col("n_violations") === 0).as("holds"))
    tag("fd_orderkey_custkey", Profile.fdViolations(orders, "o_orderkey", "o_custkey"))
      .unionByName(tag("fd_custkey_priority",
        Profile.fdViolations(orders, "o_custkey", "o_orderpriority")))
      .unionByName(tag("ind_orders_customer",
        Profile.inclusionOrphans(orders, "o_custkey", cust, "c_custkey")))
      .unionByName(tag("ind_customer_orders",
        Profile.inclusionOrphans(cust, "c_custkey", orders, "o_custkey")))
      .unionByName(tag("ind_lineitem_part",
        Profile.inclusionOrphans(li, "l_partkey", part, "p_partkey")))
  }

  val q170Sql: String =
    """WITH fd1 AS (
      |  SELECT CAST(COUNT(1) AS BIGINT) AS n_keys,
      |    CAST(COALESCE(SUM(CASE WHEN n > 1 THEN 1 END), 0) AS BIGINT) AS n_violations
      |  FROM (SELECT o_orderkey, COUNT(1) AS n FROM
      |        (SELECT DISTINCT o_orderkey, o_custkey FROM orders) GROUP BY o_orderkey)
      |),
      |fd2 AS (
      |  SELECT CAST(COUNT(1) AS BIGINT) AS n_keys,
      |    CAST(COALESCE(SUM(CASE WHEN n > 1 THEN 1 END), 0) AS BIGINT) AS n_violations
      |  FROM (SELECT o_custkey, COUNT(1) AS n FROM
      |        (SELECT DISTINCT o_custkey, o_orderpriority FROM orders) GROUP BY o_custkey)
      |),
      |i1 AS (
      |  SELECT (SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) FROM orders) AS n_keys,
      |    CAST((SELECT COUNT(1) FROM (SELECT DISTINCT o_custkey FROM orders) o
      |     WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)) AS BIGINT) AS n_violations
      |),
      |i2 AS (
      |  SELECT (SELECT CAST(COUNT(DISTINCT c_custkey) AS BIGINT) FROM customer) AS n_keys,
      |    CAST((SELECT COUNT(1) FROM (SELECT DISTINCT c_custkey FROM customer) c
      |     WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)) AS BIGINT) AS n_violations
      |),
      |i3 AS (
      |  SELECT (SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) FROM lineitem) AS n_keys,
      |    CAST((SELECT COUNT(1) FROM (SELECT DISTINCT l_partkey FROM lineitem) l
      |     WHERE l_partkey NOT IN (SELECT p_partkey FROM part)) AS BIGINT) AS n_violations
      |)
      |SELECT 'fd_orderkey_custkey' AS check, n_keys, n_violations, n_violations = 0 AS holds FROM fd1
      |UNION ALL SELECT 'fd_custkey_priority', n_keys, n_violations, n_violations = 0 FROM fd2
      |UNION ALL SELECT 'ind_orders_customer', n_keys, n_violations, n_violations = 0 FROM i1
      |UNION ALL SELECT 'ind_customer_orders', n_keys, n_violations, n_violations = 0 FROM i2
      |UNION ALL SELECT 'ind_lineitem_part', n_keys, n_violations, n_violations = 0 FROM i3""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q151_mad_outliers", q151MadOutliers, Some(q151Sql)),
    QueryDef("q152_pareto_front", q152ParetoFront, Some(q152Sql)),
    QueryDef("q175_global_pareto", q175GlobalPareto, Some(q175Sql)),
    QueryDef("q179_sorted_neighborhood", q179SortedNeighborhood, Some(q179Sql)),
    QueryDef("q181_percentile_rank", q181PercentileRank, Some(q181Sql)),
    QueryDef("q185_benford", q185Benford, Some(q185Sql)),
    QueryDef("q186_deciles", q186Deciles, Some(q186Sql)),
    QueryDef("q157_k_anonymity", q157KAnonymity, Some(q157Sql)),
    QueryDef("q158_winsorize", q158Winsorize, Some(q158Sql)),
    QueryDef("q166_bucket_drift", q166BucketDrift, Some(q166Sql)),
    QueryDef("q170_dependency_profile", q170DependencyProfile, Some(q170Sql)),
    QueryDef("q143_bloom_join", q143BloomJoin, Some(q143Sql)),
    QueryDef("q53_rollup", q53Rollup, Some(q53Sql)),
    QueryDef("q54_skew_join", q54SkewJoin, Some(q54Sql)),
    QueryDef("q113_pivot", q113Pivot, Some(q113Sql)),
    QueryDef("q114_cube", q114Cube, Some(q114Sql)),
    QueryDef("q115_zorder", q115ZOrder, Some(q115Sql)),
    QueryDef("q127_iqr_outliers", q127IqrOutliers, Some(q127Sql)),
    QueryDef("q01_pricing_summary", q01PricingSummary, Some(q01Sql)),
    QueryDef("q02_join_revenue", q02JoinRevenue, Some(q02Sql)),
    QueryDef("q03_top_customers", q03TopCustomers, Some(q03Sql)),
    QueryDef("q04_running_total", q04RunningTotal, Some(q04Sql)),
    QueryDef("q06_filter_revenue", q06Revenue, Some(q06Sql)),
    QueryDef("q07_part_coverage", q07PartOrderCoverage, Some(q07Sql)),
    QueryDef("q103_data_profile", q103DataProfile, Some(q103Sql)))
}
