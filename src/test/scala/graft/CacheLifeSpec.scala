package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.columnar.InMemoryRelation

/** Rot-proofs the CacheLife consumer declarations against reality.
  *
  * The shared-cache release policy is only sound if (a) every declared
  * consumer name is a real registered query (a typo'd name never
  * "completes", so its cache would live to end-of-session — the r11 drift
  * class all over again) and (b) every query whose plan actually READS a
  * shared cached relation is in that cache's consumer set (a missing name
  * means the cache can be unpersisted while a later query still needs it,
  * silently recomputing the cached subtree). Both directions are checked
  * from the ANALYZED plans, so adding a query that joins a cache family
  * without updating its consumer set fails here, not in a 2× bench entry
  * three rounds later.
  */
class CacheLifeSpec extends SparkSpec {

  /** Construct every registered query once — shared caches materialize
    * their store entries at DataFrame-construction time. */
  private lazy val queryPlans: Map[String, DataFrame] =
    SparkEntry.queries.map { case (name, fn) => name -> fn(spark, sfDir) }

  /** The cache-substitution builders of a frame's plan — CacheManager
    * swaps persisted subtrees for InMemoryRelations sharing the SAME
    * CachedRDDBuilder instance, so reference identity maps a relation in
    * any query's plan back to the shared entry that owns it. */
  private def buildersOf(df: DataFrame): Seq[AnyRef] =
    df.queryExecution.withCachedData.collect {
      case r: InMemoryRelation => r.cacheBuilder
    }

  private lazy val entries: Map[String, (DataFrame, Set[String])] = {
    queryPlans // force construction so every shared cache registers
    graft.core.CacheLife.sharedEntries(spark)
  }

  private lazy val entryBuilders: Map[String, Seq[AnyRef]] =
    entries.map { case (key, (df, _)) => key -> buildersOf(df) }

  test("shared caches exist to audit (fixture sanity)") {
    assert(entries.nonEmpty, "no shared caches registered — did the query " +
      "modules stop using CacheLife.shared?")
  }

  test("every declared consumer is a registered query name") {
    val known = SparkEntry.queries.keySet
    for ((key, (_, consumers)) <- entries) {
      val ghosts = consumers -- known
      assert(ghosts.isEmpty,
        s"cache '$key' declares consumers that are not registered queries " +
          s"(they would never 'complete', pinning the cache for the whole " +
          s"session): ${ghosts.toSeq.sorted.mkString(", ")}")
    }
  }

  test("every query reading a shared cache is in that cache's consumer set") {
    for ((name, df) <- queryPlans) {
      val reads = buildersOf(df)
      for ((key, (_, consumers)) <- entries) {
        val readsThis = entryBuilders(key).exists(b => reads.exists(_ eq b))
        if (readsThis)
          assert(consumers.contains(name),
            s"query '$name' reads shared cache '$key' but is missing from " +
              s"its consumer set — the cache could be released before " +
              s"'$name' runs, recomputing the subtree")
      }
    }
  }

  test("driver-materialized readers are declared by hand (plan-audit blind spot)") {
    // q93 and q184 read the jaccard cache THROUGH q59's
    // ConnectedComponents pass, which materializes driver-side (iterative
    // localCheckpoint / small-graph collect) — their analyzed plans carry
    // no InMemoryRelation lineage back to the cache, so the plan-based
    // test above can NEVER catch these declarations going missing (r15:
    // the cache released after q74 and every q93 bench rep paid a partial
    // or full 5.5 s shingle→jaccard rebuild). Pin them explicitly; any
    // future query that consumes a shared cache through a driver-side
    // materialization must be added here AND to the module's consumer set.
    val (_, cons) = entries("jaccard")
    val handDeclared = Set("q93_cluster_pick", "q184_leakage_safe_folds")
    assert(handDeclared.subsetOf(cons),
      s"jaccard consumer set lost its driver-materialized readers: " +
        s"${(handDeclared -- cons).toSeq.sorted.mkString(", ")}")
    // q204 reads anchor_scored inside its construction-time collect and
    // returns a literal-built plan — same blind-spot class
    val (_, anchorCons) = entries("anchor_scored")
    assert(anchorCons.contains("q204_isotonic"),
      "anchor_scored consumer set lost its literal-built reader q204")
  }

  test("release follows RUN order, never name order (q208-sorts-before-q30 class)") {
    // Query NAMES do not sort numerically: "q208_x" < "q20_y" < "q30_z"
    // as strings (digits beat '_'; '2' beats '3'), so the nine r16 eval
    // queries q208–q216 RUN before q30–q99 in the name-sorted bench loop.
    // The release rule must therefore be EVENT-driven — a cache drops only
    // when every consumer has actually completed, whatever order the
    // driver iterates — never a precomputed "release after name X" point
    // (a lexicographic-max point is correct only while the run order
    // happens to be lexicographic; a numeric or filtered run breaks it).
    // Probe with synthetic names reproducing the quirk: numeric intuition
    // says zz_q30 < zz_q65 < zz_q208, strings sort zz_q208 first.
    import spark.implicits._
    val consumers = Set("zz_q208_probe", "zz_q65_probe") // zz_q30 not a consumer
    def register(): Unit = {
      graft.core.CacheLife.shared(spark, sfDir, "spec_order_probe", consumers)(
        Seq(1).toDF("x"))
      ()
    }
    def runSuite(order: Seq[String]): Map[String, Seq[String]] = {
      var completed = Set.empty[String]
      order.map { n =>
        completed += n
        n -> graft.core.CacheLife.afterQuery(spark, completed)
          .filter(_ == "spec_order_probe")
      }.toMap
    }
    val names = Seq("zz_q208_probe", "zz_q30_probe", "zz_q65_probe")
    // bench order = name-sorted: zz_q208 runs FIRST; release must wait
    // for zz_q65 (the last-RUN consumer) even though zz_q208 is the
    // numerically-last name
    register()
    val lex = runSuite(names.sorted)
    assert(lex("zz_q208_probe").isEmpty,
      "cache released at its numerically-last consumer before the " +
        "lexicographically-later one had run")
    assert(lex("zz_q65_probe").nonEmpty, "cache failed to release once " +
      "every consumer had completed (lexicographic run order)")
    // numeric order: zz_q30, zz_q65, zz_q208 — now zz_q208 runs LAST and
    // release must wait for it (a string-max release point would fire at
    // zz_q65, one query early)
    register()
    val num = runSuite(Seq("zz_q30_probe", "zz_q65_probe", "zz_q208_probe"))
    assert(num("zz_q65_probe").isEmpty,
      "cache released at its string-max consumer before the " +
        "numerically-later one had run")
    assert(num("zz_q208_probe").nonEmpty, "cache failed to release once " +
      "every consumer had completed (numeric run order)")
  }

  test("cache-on-cache dependencies imply consumer-set containment") {
    // if cache X is BUILT FROM cache Y, Y must outlive X's readers: every
    // consumer of X must also be declared on Y (the modules encode this
    // with superset unions — this pins it against drift)
    for ((x, (xdf, xCons)) <- entries; (y, (_, yCons)) <- entries if x != y) {
      val xReadsY = entryBuilders(y).exists(b => buildersOf(xdf).exists(_ eq b))
      if (xReadsY) {
        val missing = xCons -- yCons
        assert(missing.isEmpty,
          s"cache '$x' is built from cache '$y' but '$y' does not declare " +
            s"all of '$x''s consumers: ${missing.toSeq.sorted.mkString(", ")}")
      }
    }
  }
}
