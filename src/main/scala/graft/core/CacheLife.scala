package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel
import scala.collection.concurrent.TrieMap

/** Lifecycle manager for the session-shared persisted frames the query
  * modules memoize (shingle tables, LSH candidates, the scene projection,
  * KN scores, dHash groups, ...) and for per-query temporary persists.
  *
  * Why it exists: the shared caches used to live for the WHOLE bench
  * session — 127 queries — while only a handful of queries read each one.
  * The accumulated storage memory (plus per-call persists that were never
  * unpersisted at all) degraded unrelated queries 2-3× late in the run via
  * eviction churn. Each shared cache therefore declares its CONSUMER SET
  * (the query names that read it, directly or transitively); the bench and
  * verify drivers call [[afterQuery]] after each query completes, and a
  * cache is unpersisted as soon as every consumer has run (or was never
  * selected). Sessions that never call [[afterQuery]] — specs, ScaleBench,
  * ad-hoc use — keep today's behavior: caches live until the session stops.
  *
  * Per-query persists (a postings table read by several plan branches
  * inside ONE query) register with [[scoped]] and are dropped wholesale on
  * the next [[afterQuery]] — after the query's output is materialized, the
  * cached frame has no further reader.
  */
object CacheLife {

  private final case class Shared(df: DataFrame, consumers: Set[String])
  // (session, sfDir, cacheKey) → shared entry
  private val sharedStore = TrieMap.empty[(SparkSession, String, String), Shared]
  private val tempStore = TrieMap.empty[SparkSession, List[DataFrame]]

  private def evictStopped(): Unit = {
    // session-keyed memos need eviction for stopped sessions (ADVICE r7)
    sharedStore.filterInPlace((k, _) => !k._1.sparkContext.isStopped)
    tempStore.filterInPlace((k, _) => !k.sparkContext.isStopped)
  }

  /** Memoized MEMORY_AND_DISK persist of `build`, keyed by
    * (session, sfDir, key), released by [[afterQuery]] once every name in
    * `consumers` has completed. The consumer set may be a SUPERSET of the
    * true readers — an extra name only delays the release to that query.
    */
  def shared(spark: SparkSession, sfDir: String, key: String,
      consumers: Set[String])(build: => DataFrame): DataFrame = {
    evictStopped()
    sharedStore.getOrElseUpdate((spark, sfDir, key),
      Shared(build.persist(StorageLevel.MEMORY_AND_DISK), consumers)).df
  }

  /** Register an already-persisted frame as query-scoped: it is
    * unpersisted on the next [[afterQuery]] call. Returns the frame. */
  def scoped(df: DataFrame): DataFrame = {
    evictStopped()
    val spark = df.sparkSession
    tempStore.updateWith(spark) {
      case Some(l) => Some(df :: l)
      case None => Some(df :: Nil)
    }
    df
  }

  /** Drop this session's scoped temps only — callable between bench
    * repetitions (each rep re-persists its own temp copy, so rep 2 would
    * otherwise double the footprint until the query-level release). */
  def releaseScoped(spark: SparkSession): Unit =
    tempStore.remove(spark).foreach(_.foreach(_.unpersist(false)))

  /** Release caches after a query completes: every scoped temp goes, and
    * every shared cache whose consumer set ⊆ `completed` goes (callers
    * pass completed ∪ never-selected so filtered runs release too).
    * Returns the released shared cache keys, for telemetry. */
  def afterQuery(spark: SparkSession, completed: Set[String]): Seq[String] = {
    releaseScoped(spark)
    val dead = sharedStore.keys.toSeq.filter { k =>
      k._1 == spark && sharedStore.get(k).exists(_.consumers.subsetOf(completed))
    }
    dead.foreach { k =>
      sharedStore.remove(k).foreach(_.df.unpersist(false))
    }
    dead.map(_._3).sorted
  }

  /** Test-visible view of this session's live shared caches:
    * cacheKey → (cached frame, declared consumer set). CacheLifeSpec uses
    * it to rot-proof the consumer declarations against the actual plans. */
  private[graft] def sharedEntries(spark: SparkSession): Map[String, (DataFrame, Set[String])] =
    sharedStore.iterator.collect {
      case ((s, _, key), Shared(df, cons)) if s == spark => key -> (df, cons)
    }.toMap

  /** (cached RDD count, storage bytes mem+disk) — the bench telemetry that
    * makes in-session storage drift attributable from the artifact. */
  def storageStats(spark: SparkSession): (Int, Long) = {
    val infos = spark.sparkContext.getRDDStorageInfo
    (infos.length, infos.map(i => i.memSize + i.diskSize).sum)
  }
}
