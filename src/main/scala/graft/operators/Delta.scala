package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Snapshot-delta operators for an incrementally refreshed corpus — the
  * daily-crawl bookkeeping around the content pipeline: what changed
  * between two snapshots, and which record wins when a key is re-fetched.
  *
  * Scale shape: both operators ship only (key, content-hash/version)
  * columns into their shuffles — never document payloads. The diff is one
  * co-partitioned full-outer join on the key; latest-wins is one
  * per-key window max (map-side-combinable groupBy-free rank over the
  * key-partitioned frame). Payloads rejoin by key afterwards if needed.
  */
object Delta {

  /** Diff snapshot `b` (new) against `a` (old) by `idCol`, comparing
    * md5(`contentCol`): one row per id present in either side, with
    * `status` ∈ added | removed | changed | unchanged. Only (id, hash)
    * pairs shuffle.
    */
  def snapshotDiff(a: DataFrame, b: DataFrame, idCol: String,
      contentCol: String): DataFrame = {
    val ha = a.select(col(idCol), md5(col(contentCol)).as("hash_a"))
    val hb = b.select(col(idCol), md5(col(contentCol)).as("hash_b"))
    ha.join(hb, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("hash_a").isNull, "added")
          .when(col("hash_b").isNull, "removed")
          .when(col("hash_a") === col("hash_b"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** Latest-wins upsert semantics: keep, per `keyCol`, the single row with
    * the greatest `versionCol` (ties broken by greatest `tieCol` so the
    * survivor is total-order deterministic). The standard crawl-refresh /
    * SCD-1 compaction. One shuffle on the key; the rank window never sees
    * more than one key per partition group.
    */
  def latestWins(df: DataFrame, keyCol: String, versionCol: String,
      tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(versionCol).desc, col(tieCol).desc)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** SCD Type-2 history build from a change log: per key, collapse
    * consecutive duplicate values (idempotent re-deliveries and no-op
    * updates vanish), then stamp each surviving version with
    * `[valid_from, valid_to)` and `is_current` — the slowly-changing-
    * dimension contract every warehouse merge implements, here as three
    * window passes over ONE shuffle on the key (lag to collapse, lead to
    * close intervals, row_number to version). Ties on `versionCol` break
    * by `tieCol` so the history is total-order deterministic.
    *
    * Output: key, version (1-based), value, valid_from, valid_to
    * (null = open), is_current.
    */
  def scd2(changes: DataFrame, keyCol: String, versionCol: String,
      tieCol: String, valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(versionCol), col(tieCol))
    val collapsed = changes
      .withColumn("_prev", lag(col(valueCol), 1).over(w))
      .filter(col("_prev").isNull || col("_prev") =!= col(valueCol))
    val w2 = Window.partitionBy(col(keyCol))
      .orderBy(col(versionCol), col(tieCol))
    collapsed
      .withColumn("version", row_number().over(w2))
      .withColumn("valid_from", col(versionCol))
      .withColumn("valid_to", lead(col(versionCol), 1).over(w2))
      .withColumn("is_current", col("valid_to").isNull)
      .select(col(keyCol), col("version"), col(valueCol).as("value"),
        col("valid_from"), col("valid_to"), col("is_current"))
  }
}
