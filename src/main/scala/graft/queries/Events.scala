package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.core.Tables
import QueryDef._

/** Event-stream surface over the `events` table. These run as batch here;
  * Streaming.scala wires the identical transformations to readStream with
  * watermarks (micro-batch per scene/file, SURVEY.md §7.1 pipeline/).
  *
  * Timestamps are compared across engines in integer epoch units only
  * (micros/seconds) — never as raw timestamps — to dodge ns/µs precision
  * differences between Spark (µs) and DuckDB (ns).
  */
object Events {

  /** q20: tumbling 1-hour window aggregation per event type. `ts` arrives
    * as nanosecond longs (nanosAsLong) — hour bucketing is exact integer
    * division, bit-identical to DuckDB's date_trunc+epoch.
    */
  def q20HourlyAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.loadEvents(spark, sfDir)
    ev.groupBy(
        expr("(ts DIV 3600000000000) * 3600").as("hour_epoch"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        exactSum(col("value")).as("sum_value"),
        countDistinct(col("user_id")).as("n_users"))
  }

  val q20Sql: String =
    """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
      |       event_type,
      |       COUNT(1) AS n_events,
      |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
      |       COUNT(DISTINCT user_id) AS n_users
      |FROM events
      |GROUP BY 1, 2""".stripMargin

  /** q21: sessionization — a session breaks on a >30 min gap. Pure lag()
    * window + aggregation; at scale this shuffles once on user_id.
    */
  def q21Sessionize(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.loadEvents(spark, sfDir)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    ev.select(col("user_id"), col("event_id"), expr("ts DIV 1000").as("ts_us"))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_us").isNull || col("ts_us") - col("prev_us") > 1800000000L, 1L)
          .otherwise(0L))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("new_session")).as("n_sessions"),
        max(col("ts_us") - col("prev_us")).as("max_gap_us"))
  }

  val q21Sql: String =
    """WITH t AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
      |         LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_us
      |  FROM events
      |)
      |SELECT user_id,
      |       COUNT(1) AS n_events,
      |       CAST(SUM(CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
      |       MAX(ts_us - prev_us) AS max_gap_us
      |FROM t GROUP BY user_id""".stripMargin

  /** q180: event-type Markov transition matrix — the user-journey /
    * session-grammar profile (what follows what, and how often): per-user
    * lag in (ts, event_id) order yields (prev_type → type) transitions,
    * counted and row-normalized into integer micro-probabilities
    * (`1e6·cnt // prev_total`, exact in both engines). First events have
    * no predecessor and drop, as Markov chains define. One user-keyed
    * window shuffle + one |types|²-bounded groupBy — the output is
    * vocabulary-of-types-sized whatever the event volume.
    */
  def q180Transitions(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val wPrev = Window.partitionBy(col("prev_type"))
    Tables.loadEvents(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("ts DIV 1000").as("ts_us"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .where(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("__tot", sum(col("n")).over(wPrev))
      // DECIMAL(38,0) numerator, like every micro-share in the repo —
      // BIGINT n·1e6 would wrap past ~9.2e12 transitions per prev_type
      .withColumn("p_micro",
        expr("CAST((CAST(n AS DECIMAL(38,0)) * 1000000) DIV __tot AS BIGINT)"))
      .drop("__tot")
  }

  val q180Sql: String =
    """WITH t AS (
      |  SELECT event_type,
      |    LAG(event_type) OVER (PARTITION BY user_id
      |      ORDER BY epoch_us(ts), event_id) AS prev_type
      |  FROM events
      |),
      |c AS (
      |  SELECT prev_type, event_type, CAST(COUNT(1) AS BIGINT) AS n
      |  FROM t WHERE prev_type IS NOT NULL GROUP BY prev_type, event_type
      |)
      |SELECT prev_type, event_type, n,
      |  CAST((CAST(n AS HUGEINT) * 1000000)
      |    // SUM(n) OVER (PARTITION BY prev_type) AS BIGINT) AS p_micro
      |FROM c""".stripMargin

  /** q22: as-of join — each click annotated with the most recent purchase
    * by the same user at or before it (AsOfJoin: union + carry-forward
    * window, one shuffle; the oracle is the quadratic join+rank form).
    */
  def q22AsOfJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.loadEvents(spark, sfDir)
      .select(col("event_id"), col("user_id"), expr("ts DIV 1000").as("ts_us"),
        col("event_type"), col("value"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts_us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("value"), col("ts_us").as("pts"))
    graft.operators.AsOfJoin.asOf(clicks, purchases,
        keyCol = "user_id", tsCol = "ts_us", rightOrd = "event_id",
        payload = Seq("value", "pts"))
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("asof_pts"), col("asof_value"))
  }

  val q22Sql: String =
    """WITH e AS (
      |  SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type, value FROM events
      |),
      |clicks AS (SELECT event_id, user_id, ts_us FROM e WHERE event_type = 'click'),
      |purch AS (SELECT event_id, user_id, ts_us, value FROM e WHERE event_type = 'purchase')
      |SELECT c.event_id, c.user_id, c.ts_us, p.ts_us AS asof_pts, p.value AS asof_value
      |FROM clicks c LEFT JOIN purch p
      |  ON p.user_id = c.user_id AND p.ts_us <= c.ts_us
      |QUALIFY p.event_id IS NULL
      |  OR ROW_NUMBER() OVER (PARTITION BY c.event_id ORDER BY p.ts_us DESC, p.event_id DESC) = 1""".stripMargin

  /** q191: FORWARD as-of join with tolerance — each click annotated with
    * the NEXT purchase by the same user at or after it, nulled when it is
    * more than one hour out (AsOfJoin.asOfDirected: the mirrored
    * first-over-following frame of q22's carry-forward window, still one
    * shuffle; the oracle is the quadratic join+rank form with the
    * tolerance folded into the range predicate — equivalent because the
    * first at-or-after match is the minimum timestamp, so it is within
    * tolerance iff any match is).
    */
  def q191AsOfForward(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.loadEvents(spark, sfDir)
      .select(col("event_id"), col("user_id"), expr("ts DIV 1000").as("ts_us"),
        col("event_type"), col("value"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts_us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("value"), col("ts_us").as("pts"))
    graft.operators.AsOfJoin.asOfDirected(clicks, purchases,
        keyCol = "user_id", tsCol = "ts_us", rightOrd = "event_id",
        payload = Seq("value", "pts"),
        direction = "forward", tolerance = 3600000000L)
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("asof_pts"), col("asof_value"))
  }

  val q191Sql: String =
    """WITH e AS (
      |  SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type, value FROM events
      |),
      |clicks AS (SELECT event_id, user_id, ts_us FROM e WHERE event_type = 'click'),
      |purch AS (SELECT event_id, user_id, ts_us, value FROM e WHERE event_type = 'purchase')
      |SELECT c.event_id, c.user_id, c.ts_us, p.ts_us AS asof_pts, p.value AS asof_value
      |FROM clicks c LEFT JOIN purch p
      |  ON p.user_id = c.user_id AND p.ts_us >= c.ts_us
      |  AND p.ts_us <= c.ts_us + 3600000000
      |QUALIFY p.event_id IS NULL
      |  OR ROW_NUMBER() OVER (PARTITION BY c.event_id ORDER BY p.ts_us ASC, p.event_id DESC) = 1""".stripMargin

  /** q192: NEAREST as-of join — each click annotated with the closest
    * purchase in time (either direction), ties to the backward side, then
    * to the largest purchase id (AsOfJoin.asOfDirected 'nearest': both
    * carry frames over ONE sorted partition — two window functions, one
    * shuffle; the oracle ranks the quadratic join by |Δts| with the same
    * tie chain).
    */
  def q192AsOfNearest(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.loadEvents(spark, sfDir)
      .select(col("event_id"), col("user_id"), expr("ts DIV 1000").as("ts_us"),
        col("event_type"), col("value"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts_us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("value"), col("ts_us").as("pts"))
    graft.operators.AsOfJoin.asOfDirected(clicks, purchases,
        keyCol = "user_id", tsCol = "ts_us", rightOrd = "event_id",
        payload = Seq("value", "pts"), direction = "nearest")
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("asof_pts"), col("asof_value"))
  }

  val q192Sql: String =
    """WITH e AS (
      |  SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type, value FROM events
      |),
      |clicks AS (SELECT event_id, user_id, ts_us FROM e WHERE event_type = 'click'),
      |purch AS (SELECT event_id, user_id, ts_us, value FROM e WHERE event_type = 'purchase')
      |SELECT c.event_id, c.user_id, c.ts_us, p.ts_us AS asof_pts, p.value AS asof_value
      |FROM clicks c LEFT JOIN purch p ON p.user_id = c.user_id
      |QUALIFY p.event_id IS NULL
      |  OR ROW_NUMBER() OVER (PARTITION BY c.event_id
      |       ORDER BY ABS(p.ts_us - c.ts_us) ASC,
      |                (p.ts_us > c.ts_us) ASC, p.event_id DESC) = 1""".stripMargin

  /** q23: point-in-interval range join (operators.RangeJoin) — per-order
    * 90-minute deterministic windows over January 2024 vs the event stream.
    * Spark side runs the bucketized equi-join (a bare range predicate would
    * plan as BroadcastNestedLoopJoin); the oracle runs the plain range join
    * — matching proves the bucketization is exact, including the
    * half-open [start, end) boundary.
    */
  def q23RangeJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val base = 1704067200000000000L // 2024-01-01T00:00Z epoch ns
    val hour = 3600000000000L
    // 10% of orders get a 90-minute window: keeps the TRUE overlap volume
    // (events × covering-intervals) linear-ish in sf — the full order set
    // over a fixed 30-day event span would make every event match O(|orders|)
    // intervals, a quadratic blow-up inherent to the query, not the join
    val orders = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderkey") % 10 === 0)
    val intervals = orders.select(col("o_orderkey"),
      (lit(base) + (col("o_orderkey") % 29) * lit(24 * hour) +
        (col("o_custkey") % 24) * lit(hour)).as("start_ns"))
      .withColumn("end_ns", col("start_ns") + lit(hour + hour / 2))
    val events = Tables.loadEvents(spark, sfDir)
      .select(col("ts").as("ts_ns"), col("event_type"), col("value"))
    graft.operators.RangeJoin
      // bucketWidth = 0: auto-selected median interval length (90 min here)
      .pointInInterval(events, intervals, "ts_ns", "start_ns", "end_ns", bucketWidth = 0L)
      .groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("n_events"),
        exactSum(col("value")).as("sum_value"))
  }

  val q23Sql: String =
    """WITH iv AS (
      |  SELECT o_orderkey,
      |    CAST(1704067200000000000 + (o_orderkey % 29) * 86400000000000
      |         + (o_custkey % 24) * 3600000000000 AS BIGINT) AS start_ns
      |  FROM orders WHERE o_orderkey % 10 = 0
      |),
      |ev AS (SELECT epoch_ns(ts) AS ts_ns, value FROM events)
      |SELECT o_orderkey, COUNT(1) AS n_events,
      |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM iv JOIN ev ON ev.ts_ns >= iv.start_ns AND ev.ts_ns < iv.start_ns + 5400000000000
      |GROUP BY o_orderkey""".stripMargin

  /** q142: interval-OVERLAP join — the two-sided sibling of q23's
    * point-in-interval: each sparse order window `[start, start+90min)`
    * joins every event's 30-minute activity interval `[ts, ts+30min)` it
    * overlaps. Bucketized like q23, plus the reference-point dedup: a
    * pair overlapping across several shared buckets is emitted only from
    * the bucket containing max(starts), so no distinct pass — the oracle
    * is the bare overlap predicate, and matching proves bucketization
    * AND single-emission are exact across bucket spans.
    */
  def q142IntervalJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val base = 1704067200000000000L
    val hour = 3600000000000L
    val orders = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderkey") % 10 === 0)
    val a = orders.select(col("o_orderkey"),
      (lit(base) + (col("o_orderkey") % 29) * lit(24 * hour) +
        (col("o_custkey") % 24) * lit(hour)).as("a_start"))
      .withColumn("a_end", col("a_start") + lit(hour + hour / 2))
    val b = Tables.loadEvents(spark, sfDir)
      .select(col("ts").as("b_start"), (col("ts") + lit(hour / 2)).as("b_end"),
        col("value"))
    graft.operators.RangeJoin
      // bucketWidth = 0: auto median over BOTH sides' interval lengths
      .intervalOverlap(a, b, "a_start", "a_end", "b_start", "b_end",
        bucketWidth = 0L)
      .groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("n_overlaps"), exactSum(col("value")).as("sum_value"))
  }

  val q142Sql: String =
    """WITH iv AS (
      |  SELECT o_orderkey,
      |    CAST(1704067200000000000 + (o_orderkey % 29) * 86400000000000
      |         + (o_custkey % 24) * 3600000000000 AS BIGINT) AS a_start
      |  FROM orders WHERE o_orderkey % 10 = 0
      |),
      |ev AS (SELECT epoch_ns(ts) AS b_start,
      |       epoch_ns(ts) + 1800000000000 AS b_end, value FROM events)
      |SELECT o_orderkey, COUNT(1) AS n_overlaps,
      |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM iv JOIN ev ON iv.a_start < ev.b_end
      |  AND ev.b_start < iv.a_start + 5400000000000
      |GROUP BY o_orderkey""".stripMargin

  /** q99: cohort retention — users grouped by first-seen day, counted
    * distinct at each later-day offset: the standard product-analytics
    * rollup over an append-only event log. Two aggregations and one join,
    * all shuffling on user/cohort keys (map-side combinable); day math is
    * exact integer division on epoch-ns, bit-identical to the oracle's
    * epoch_ns // 86400e9. (Declared ABOVE `val defs`: QueryDef vals
    * capture these members at object-init time, in declaration order.)
    */
  def q99CohortRetention(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.loadEvents(spark, sfDir)
      .select(col("user_id"), expr("ts DIV 86400000000000").as("day"))
    val cohorts = ev.groupBy("user_id").agg(min(col("day")).as("cohort_day"))
    ev.join(cohorts, "user_id")
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  val q99Sql: String =
    """WITH ev AS (
      |  SELECT user_id, epoch_ns(ts) // 86400000000000 AS day FROM events
      |),
      |cohorts AS (SELECT user_id, MIN(day) AS cohort_day FROM ev GROUP BY user_id)
      |SELECT c.cohort_day, ev.day - c.cohort_day AS day_offset,
      |       COUNT(DISTINCT ev.user_id) AS n_users
      |FROM ev JOIN cohorts c USING (user_id)
      |GROUP BY 1, 2""".stripMargin

  /** q101: latest-wins compaction (operators.Delta.latestWins) — the
    * "current state per entity" view of an append-only log: per user, the
    * single most recent event (ties on ts broken by event_id, so the
    * survivor is total-order deterministic). One shuffle on the key; the
    * oracle brute-forces the same rank.
    */
  def q101LatestWins(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.loadEvents(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
    graft.operators.Delta.latestWins(ev, "user_id", "ts", "event_id")
  }

  val q101Sql: String =
    """SELECT user_id, ts, event_id, event_type
      |FROM (
      |  SELECT user_id, epoch_ns(ts) AS ts, event_id, event_type,
      |    row_number() OVER (PARTITION BY user_id
      |                       ORDER BY epoch_ns(ts) DESC, event_id DESC) AS rn
      |  FROM events
      |)
      |WHERE rn = 1""".stripMargin

  /** q116: SCD Type-2 history — each user's event_type change log becomes
    * versioned `[valid_from, valid_to)` dimension rows (operators.Delta
    * .scd2): consecutive duplicates collapse, the last version stays open
    * (`is_current`), ties on ts break by event_id. One shuffle on the
    * key; the oracle replays the same lag/lead/row_number windows.
    */
  def q116Scd2(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.loadEvents(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
    graft.operators.Delta.scd2(ev, "user_id", "ts", "event_id", "event_type")
      .select(col("user_id"), col("version"), col("value"),
        col("valid_from"), col("valid_to"), col("is_current"))
  }

  val q116Sql: String =
    """WITH o AS (
      |  SELECT user_id, epoch_ns(ts) AS ts, event_id, event_type,
      |    lag(event_type) OVER (PARTITION BY user_id
      |                          ORDER BY epoch_ns(ts), event_id) AS prev
      |  FROM events
      |),
      |c AS (SELECT * FROM o WHERE prev IS NULL OR prev <> event_type),
      |v AS (
      |  SELECT user_id,
      |    CAST(row_number() OVER w AS INTEGER) AS version,
      |    event_type AS value, ts AS valid_from,
      |    lead(ts) OVER w AS valid_to
      |  FROM c WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |)
      |SELECT user_id, version, value, valid_from, valid_to,
      |  valid_to IS NULL AS is_current
      |FROM v""".stripMargin

  /** q124: hourly gap-fill + forward-fill — the regular-grid resampling
    * every time-series consumer wants from an irregular event log: per
    * user, every hour boundary inside the user's span carries the latest
    * event value at or before it. Composes the engine's own as-of join
    * (grid = exploded hour sequence, right side deduped latest-wins per
    * (user, ts)); the oracle uses DuckDB's native ASOF JOIN — an
    * independent implementation of the semantics.
    */
  def q124GapFill(spark: SparkSession, sfDir: String): DataFrame = {
    val H = 3600L * 1000000000L
    val ev = Tables.loadEvents(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), col("ts")).orderBy(col("event_id").desc)
    val e1 = ev.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    val grid = e1.groupBy(col("user_id"))
      .agg(min(col("ts")).as("lo"), max(col("ts")).as("hi"))
      .select(col("user_id"),
        explode(sequence(expr(s"(lo + ${H - 1}L) div ${H}L"),
          expr(s"hi div ${H}L"))).as("h"))
      .select(col("user_id"), (col("h") * H).as("ts"))
    graft.operators.AsOfJoin.asOf(grid,
        e1.select(col("user_id"), col("ts"), col("event_id"), col("value")),
        "user_id", "ts", "event_id", Seq("value"))
      .select(col("user_id"), col("ts"), col("asof_value").as("value"))
  }

  val q124Sql: String =
    """WITH e AS (
      |  SELECT user_id, epoch_ns(ts) AS ts, event_id, value,
      |    row_number() OVER (PARTITION BY user_id, epoch_ns(ts)
      |                       ORDER BY event_id DESC) AS rn
      |  FROM events
      |),
      |e1 AS (SELECT user_id, ts, value FROM e WHERE rn = 1),
      |mm AS (SELECT user_id, MIN(ts) AS lo, MAX(ts) AS hi FROM e1 GROUP BY user_id),
      |grid AS (
      |  SELECT user_id,
      |    unnest(generate_series((lo + 3599999999999) // 3600000000000,
      |                           hi // 3600000000000)) * 3600000000000 AS ts
      |  FROM mm
      |)
      |SELECT g.user_id, g.ts, e1.value
      |FROM grid g ASOF JOIN e1 ON g.user_id = e1.user_id AND g.ts >= e1.ts""".stripMargin

  /** q102: ordered funnel view → click → purchase (operators.Funnel) —
    * per-user earliest completion time of each step strictly after the
    * previous one; null = the funnel broke there. All shuffles keyed on
    * user_id.
    */
  def q102Funnel(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.Funnel.steps(
      Tables.loadEvents(spark, sfDir), "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"))

  val q102Sql: String =
    """WITH ev AS (SELECT user_id, epoch_ns(ts) AS ts, event_type FROM events),
      |u AS (SELECT DISTINCT user_id FROM ev),
      |s1 AS (SELECT user_id, MIN(ts) AS t_view FROM ev
      |       WHERE event_type = 'view' GROUP BY 1),
      |s2 AS (SELECT ev.user_id, MIN(ev.ts) AS t_click
      |       FROM ev JOIN s1 USING (user_id)
      |       WHERE event_type = 'click' AND ev.ts > s1.t_view GROUP BY 1),
      |s3 AS (SELECT ev.user_id, MIN(ev.ts) AS t_purchase
      |       FROM ev JOIN s2 USING (user_id)
      |       WHERE event_type = 'purchase' AND ev.ts > s2.t_click GROUP BY 1)
      |SELECT u.user_id, s1.t_view, s2.t_click, s3.t_purchase
      |FROM u
      |LEFT JOIN s1 USING (user_id)
      |LEFT JOIN s2 USING (user_id)
      |LEFT JOIN s3 USING (user_id)""".stripMargin

  /** q105: hopping (sliding) 1-hour window with a 15-minute hop via
    * Spark's NATIVE window() function — each event lands in exactly
    * windowDuration/slide = 4 windows (Spark explodes the assignment
    * map-side; one shuffle on (window, type), map-side-combinable). The
    * oracle replays the assignment as an explicit ×4 explode in integer
    * epoch math: start_k = (ts div 15min − k)·15min, k = 0..3 — every k
    * qualifies because slide × 4 = duration exactly.
    */
  def q105HoppingWindow(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.loadEvents(spark, sfDir)
      .withColumn("tss", timestamp_micros(expr("ts DIV 1000")))
    ev.groupBy(window(col("tss"), "1 hour", "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), exactSum(col("value")).as("sum_value"))
      .select(unix_timestamp(col("w.start")).as("win_start"), col("event_type"),
        col("n_events"), col("sum_value"))
  }

  val q105Sql: String =
    """WITH ev AS (SELECT epoch_ns(ts) AS tn, event_type, value FROM events),
      |w AS (
      |  SELECT (tn // 900000000000 - k) * 900 AS win_start, event_type, value
      |  FROM ev CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS k) ks
      |)
      |SELECT win_start, event_type, COUNT(1) AS n_events,
      |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM w GROUP BY 1, 2""".stripMargin

  /** q145: SFT chat assembly (`TextOps.chatAssemble`) — the event log as
    * an interaction trace: each user's first 6 events (ts order,
    * event_id tie-break) become alternating user/assistant turns rendered
    * through a ChatML-style template. Values are rendered in integer
    * cents (2-decimal doubles scale to near-integers, never half-way
    * cases, so both engines round identically). The turn cap plans
    * WindowGroupLimit — over-long histories drop map-side.
    */
  def q145ChatAssembly(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.loadEvents(spark, sfDir)
    graft.operators.TextOps.chatAssemble(
      ev, "user_id", "ts", "event_id",
      concat(col("event_type"), lit(" "),
        round(col("value") * 100).cast("long").cast("string")),
      maxTurns = 6)
      .select(col("user_id"), col("n_turns"), col("n_chars"), col("rendered"))
  }

  val q145Sql: String =
    """WITH ev AS (
      |  SELECT user_id, event_id, epoch_ns(ts) AS tsn,
      |    event_type || ' ' ||
      |      CAST(CAST(ROUND(value * 100, 0) AS BIGINT) AS VARCHAR) AS content
      |  FROM events
      |),
      |t AS (
      |  SELECT user_id, content,
      |    row_number() OVER (PARTITION BY user_id ORDER BY tsn, event_id) AS turn_no
      |  FROM ev
      |),
      |r AS (
      |  SELECT user_id, turn_no,
      |    CASE WHEN turn_no % 2 = 1 THEN '<|user|>' || chr(10)
      |         ELSE '<|assistant|>' || chr(10) END || content || '<|end|>' AS turn_txt
      |  FROM t WHERE turn_no <= 6
      |),
      |a AS (
      |  SELECT user_id, CAST(COUNT(*) AS INTEGER) AS n_turns,
      |    '<|system|>' || chr(10) || 'You are a helpful assistant.<|end|>' || chr(10)
      |      || string_agg(turn_txt, chr(10) ORDER BY turn_no) AS rendered
      |  FROM r GROUP BY user_id
      |)
      |SELECT user_id, n_turns, CAST(length(rendered) AS INTEGER) AS n_chars, rendered
      |FROM a""".stripMargin

  /** q171: half-life-decayed trending scores (`Sketches.halfLifeScore`) —
    * the recency-weighted popularity every feed/recsys pipeline keeps:
    * each event contributes 1e6 >> age_days micro-units (exact powers of
    * two — no float exp), summed per event type. Mergeable across shards;
    * one combinable groupBy.
    */
  def q171HalfLifeTrend(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.loadEvents(spark, sfDir)
      .select(col("event_type"), expr("ts DIV 86400000000000").as("day"))
    graft.operators.Sketches.halfLifeScore(ev, "event_type", "day")
  }

  val q171Sql: String =
    """WITH ev AS (
      |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day FROM events
      |),
      |ref AS (SELECT MAX(day) AS r FROM ev)
      |SELECT event_type, CAST(COUNT(1) AS BIGINT) AS n_events,
      |  CAST(SUM(CASE WHEN r - day > 20 THEN 0
      |    ELSE 1000000 >> (r - day) END) AS BIGINT) AS score_micro
      |FROM ev, ref GROUP BY event_type""".stripMargin

  /** q174: per-user inter-arrival (burstiness) profile — the bot/abuse
    * signal an event pipeline keeps per actor: event count, active span,
    * LARGEST silence (a lag window over the user-keyed sort), and the mean
    * gap — which is exactly span DIV (n−1) by telescoping, so it needs no
    * window at all. Integer epoch-ns math throughout; one hash exchange on
    * user_id serves the window and the aggregate.
    */
  def q174InterArrival(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.loadEvents(spark, sfDir)
      .select(col("user_id"), col("ts").cast("long").as("ts"), col("event_id"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    ev.withColumn("__gap", col("ts") - lag(col("ts"), 1).over(w))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        (max(col("ts")) - min(col("ts"))).as("span_ns"),
        coalesce(max(col("__gap")), lit(0L)).as("max_gap_ns"))
      .withColumn("mean_gap_ns",
        expr("CASE WHEN n_events < 2 THEN 0 ELSE span_ns DIV (n_events - 1) END"))
  }

  val q174Sql: String =
    """WITH ev AS (
      |  SELECT user_id, epoch_ns(ts) AS ts, event_id FROM events
      |),
      |g AS (
      |  SELECT user_id, ts,
      |    ts - lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
      |  FROM ev
      |)
      |SELECT user_id, CAST(COUNT(1) AS BIGINT) AS n_events,
      |  CAST(MAX(ts) - MIN(ts) AS BIGINT) AS span_ns,
      |  CAST(COALESCE(MAX(gap), 0) AS BIGINT) AS max_gap_ns,
      |  CAST(CASE WHEN COUNT(1) < 2 THEN 0
      |    ELSE (MAX(ts) - MIN(ts)) // (COUNT(1) - 1) END AS BIGINT) AS mean_gap_ns
      |FROM g GROUP BY user_id""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q171_half_life_trend", q171HalfLifeTrend, Some(q171Sql)),
    QueryDef("q174_inter_arrival", q174InterArrival, Some(q174Sql)),
    QueryDef("q180_transitions", q180Transitions, Some(q180Sql)),
    QueryDef("q145_chat_assembly", q145ChatAssembly, Some(q145Sql)),
    QueryDef("q20_event_hourly", q20HourlyAgg, Some(q20Sql)),
    QueryDef("q21_sessionize", q21Sessionize, Some(q21Sql)),
    QueryDef("q22_asof_join", q22AsOfJoin, Some(q22Sql)),
    QueryDef("q191_asof_forward", q191AsOfForward, Some(q191Sql)),
    QueryDef("q192_asof_nearest", q192AsOfNearest, Some(q192Sql)),
    QueryDef("q23_range_join", q23RangeJoin, Some(q23Sql)),
    QueryDef("q142_interval_join", q142IntervalJoin, Some(q142Sql)),
    QueryDef("q99_cohort_retention", q99CohortRetention, Some(q99Sql)),
    QueryDef("q101_latest_wins", q101LatestWins, Some(q101Sql)),
    QueryDef("q116_scd2", q116Scd2, Some(q116Sql)),
    QueryDef("q124_gap_fill", q124GapFill, Some(q124Sql)),
    QueryDef("q102_funnel", q102Funnel, Some(q102Sql)),
    QueryDef("q105_hopping_window", q105HoppingWindow, Some(q105Sql)))
}
