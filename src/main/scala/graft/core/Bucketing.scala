package graft.core

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers — the pre-shuffle side of the 100 TB join story.
  *
  * A fact table that is joined repeatedly on the same key (scene pixels on
  * (line, sample), documents on doc_id, events on user_id) should pay its
  * shuffle ONCE at write time: `bucketBy` hashes rows into a fixed number
  * of buckets per key, and Spark then plans co-bucketed equi-joins and
  * aggregations with NO Exchange on either side (verified by
  * BucketingSpec: the join plan over two co-bucketed tables is
  * exchange-free).
  *
  * Bucket count is a layout contract, not a tuning knob per query: pick
  * buckets ≈ (table size / healthy partition size) at the LARGEST
  * consumer's scale and keep it identical on both join sides — mismatched
  * counts reintroduce the shuffle on one side.
  */
object Bucketing {

  /** Write `df` as a bucketed (and optionally sorted) saved table. Bucketed
    * layouts require the table catalog (plain `.parquet(path)` writes drop
    * the bucket metadata), so this goes through `saveAsTable` with an
    * explicit warehouse path.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String], nBuckets: Int,
      sortCols: Seq[String] = Nil, mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(bucketCols.nonEmpty, "bucketBy needs at least one column")
    val spark = df.sparkSession
    if (mode == SaveMode.Overwrite) {
      spark.sql(s"DROP TABLE IF EXISTS `$table`")
      // a session-local catalog (fresh derby metastore) can leave the
      // managed location orphaned on disk from a previous JVM — saveAsTable
      // refuses to reuse it (LOCATION_ALREADY_EXISTS), so clear the orphan
      val loc = new org.apache.hadoop.fs.Path(
        spark.sessionState.catalog.defaultTablePath(
          org.apache.spark.sql.catalyst.TableIdentifier(table)))
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
    val w = df.write.mode(mode).format("parquet")
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** Co-located equi-join of two tables bucketed on the join keys with the
    * SAME bucket count: no Exchange is planned on either side. */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      on: Seq[String], joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), on, joinType)
}
