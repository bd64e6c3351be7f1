package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main — one JSON line with per-query wall seconds at the sf dir
  * given by SPARK_GRAFT_SF_DIR. Results are materialized through the noop
  * sink so Catalyst cannot prune the measured expressions (a bare count()
  * would skip every projected column).
  */
object Bench {

  /** Cumulative JVM GC wall-time in ms across all collectors. */
  private def gcMillis(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(_.getCollectionTime.max(0L)).sum
  }

  /** Prior-ROUND committed per-query seconds, for anomaly auto-rep: the
    * env override SPARK_GRAFT_PRIOR, else the latest bench_r*.json from a
    * COMPLETED round. The prior round's number is read off the driver's
    * BENCH_r{NN}.json artifacts (written once per finished round) — the
    * numerically-latest bench_r*.json alone would be this round's own
    * intra-round refresh, which resets the comparison baseline exactly
    * when a cross-round regression needs catching (the r14 loophole:
    * q129 at 2.85× r13 sailed through with anom:{}). Parsed with a narrow
    * regex — the snapshot's "queries" map is the only place a qNN key maps
    * to a bare decimal (cache_mb values are [n,mb] arrays, cache_peak's
    * "at" maps to a string), so no JSON library is needed.
    */
  private def loadPrior(): Map[String, Double] = {
    val path = sys.env.get("SPARK_GRAFT_PRIOR").orElse {
      val names = Option(new java.io.File(".").listFiles()).toSeq.flatten
        .map(_.getName)
      def num(n: String): Int = n.replaceAll("\\D", "").toInt
      val snaps = names.filter(_.matches("bench_r\\d+\\.json"))
      val priorRound = names.filter(_.matches("BENCH_r\\d+\\.json"))
        .map(num).maxOption
      priorRound.flatMap(pr => snaps.filter(num(_) <= pr).maxByOption(num))
        .orElse(snaps.maxByOption(num))
    }
    path.flatMap { p =>
      try {
        val txt = java.nio.file.Files.readString(java.nio.file.Paths.get(p))
        val re = """"(q\w+)":([0-9]+(?:\.[0-9]+)?)""".r
        Some(re.findAllMatchIn(txt).map(m => m.group(1) -> m.group(2).toDouble).toMap)
      } catch { case _: Throwable => None }
    }.getOrElse(Map.empty)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.sql.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // let AQE plan the SUBTREES UNDER persisted frames too (off by
      // default only to keep cached output partitioning stable for
      // downstream reuse): the shared/scoped caches (KN scores, shingle
      // tables, quantile bases) otherwise materialize with the static
      // shuffle-partition count and every cached-scan stage inherits it —
      // partition counts should come from AQE's size estimates at ANY
      // scale, not from a constant (guide §2: scale-adaptive partitioning)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      // sf0.1 tables are single ~10-60MB files; smaller splits let the
      // CPU-dense expression work (GMFs, folds) use all local cores
      .config("spark.sql.files.maxPartitionBytes", (4L * 1024 * 1024).toString)
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // optional comma-separated substring filter, e.g. SPARK_GRAFT_QUERIES=q40,q42
    val filter = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val all = SparkEntry.queries.toSeq.sortBy(_._1)
    val selected = filter match {
      case None => all
      case Some(tokens) =>
        val sel = QueryFilter.selector(tokens, all.map(_._1))
        all.filter { case (name, _) => sel(name) }
    }
    // warm up codegen/JIT + parquet footer caches outside the measurements;
    // additionally warm the GMF/LUT model registry through a scene-family
    // query — its first-touch materialization used to be measured inside
    // q10's min (≈2.8 s of session setup, not query work)
    val warmups = selected.headOption.toSeq ++
      selected.find(_._1.startsWith("q10_")).toSeq
    warmups.foreach { case (_, fn) =>
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => }
    }
    graft.core.CacheLife.releaseScoped(spark)
    // HOST CALIBRATION — fixed deterministic work, timed after warmup:
    // [0] a 32-thread Spark aggregate over 200M longs, [1] a single-thread
    // ALU loop. Two sessions' artifacts divide these out: a uniformly
    // drifted query set WITH a drifted calibration is the host (thermal /
    // noisy neighbor), not the code — the round-12/13 "moving outlier
    // cluster" class becomes attributable from the artifacts alone.
    // (Round-14 control: re-running the round-13 COMMITTED code on the
    // round-14 host reproduced the same ~1.2-1.6× inflation on untouched
    // queries, so the cross-round total drift was host-side.)
    val calSpark = {
      val t0 = System.nanoTime()
      spark.range(200000000L).selectExpr("sum(id % 97)").head()
      (System.nanoTime() - t0) / 1e9
    }
    val calCpu = {
      val t0 = System.nanoTime()
      var acc = 0L; var i = 0L
      while (i < 200000000L) { acc = acc * 6364136223846793005L + i; i += 1 }
      if (acc == 42L) System.err.println("") // consume acc (defeat DCE)
      (System.nanoTime() - t0) / 1e9
    }
    // Per-query wall seconds as the MIN over `reps` executions. Single-run
    // timings on this shared host carry multi-second environmental spikes
    // (observed 8×+ on random queries across otherwise-identical runs, no
    // GC/Full-pause correlation); the min is the reproducible number and is
    // what BASELINE comparisons should read.
    val reps = sys.env.get("SPARK_GRAFT_REPS").map(_.toInt).getOrElse(2).max(1)
    val prior = loadPrior()
    // compact stdout keys (sans-q, sans-suffix) must be unique — validated
    // UP FRONT so a collision fails in seconds, not after a ~30-minute
    // session has already done all its work (ADVICE r16)
    locally {
      val cs = selected.map { case (n, _) => n.takeWhile(_ != '_').stripPrefix("q") }
      require(cs.distinct.size == cs.size,
        "compact stdout keys collide — rename the offending query: " +
          cs.diff(cs.distinct).distinct.mkString(","))
    }
    // cache lifecycle: after each query's reps, scoped temps drop and any
    // shared cache whose consumers have all run (or were never selected)
    // unpersists — the r11 drift root cause was 127 queries' worth of
    // accumulated storage degrading late queries 2-3× via eviction churn
    val unselected = all.map(_._1).toSet -- selected.map(_._1).toSet
    var completed = unselected
    case class QRes(name: String, min: Double, ok: Boolean,
                    repSecs: Seq[Double], repGcMs: Seq[Long], winRep: Int,
                    extraRep: Boolean, cacheInMb: Long,
                    nCached: Int, cacheOutMb: Long)
    val results = selected.map { case (name, fn) =>
      // storage going IN: what earlier queries left cached — eviction-churn
      // attribution needs the before picture, not just the after
      val (_, bytesIn) = graft.core.CacheLife.storageStats(spark)
      val runs = scala.collection.mutable.ArrayBuffer.empty[(Double, Boolean, Long)]
      def runOnce(): Unit = {
        val g0 = gcMillis()
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch {
            case e: Throwable => System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
          }
        // capture elapsed BEFORE the inter-rep cache release so unpersist
        // cost never bills to the measured query (it used to sit inside
        // reps 1..n-1's timing)
        val elapsed = (System.nanoTime() - t0) / 1e9
        runs += ((elapsed, ok, gcMillis() - g0))
      }
      (1 to reps).foreach { r =>
        runOnce()
        if (r < reps) graft.core.CacheLife.releaseScoped(spark)
      }
      // anomaly auto-rep: when this session's min exceeds 2× the committed
      // prior-round value (and isn't sub-half-second noise), run a third
      // rep so the artifact itself shows whether the spike was transient
      val extra = prior.get(name).exists { p =>
        val m = runs.map(_._1).min
        p > 0.05 && m > 2 * p && m > 0.5
      }
      if (extra) { graft.core.CacheLife.releaseScoped(spark); runOnce() }
      completed += name
      graft.core.CacheLife.afterQuery(spark, completed)
      // storage telemetry AFTER the release: what this query leaves cached
      // for later ones — makes any future in-session drift attributable
      // from the artifact alone
      val (nCached, bytesOut) = graft.core.CacheLife.storageStats(spark)
      val secs = runs.map(_._1).toSeq
      QRes(name, secs.min, runs.forall(_._2), secs, runs.map(_._3).toSeq,
        secs.indexOf(secs.min) + 1, extra, bytesIn >> 20, nCached, bytesOut >> 20)
    }
    // END-OF-SESSION retry for every anomaly-tier AND watch-tier query
    // (r17 verdict asked for anom; r18 for watch — its "?"-cause records
    // kept needing next-round reruns to corroborate): the inline extra
    // rep above shares the spike's moment; a rep at session end —
    // different cache/heap/host state, minutes later — is what confirms
    // or refutes the 'env' attribution from THIS artifact alone, instead
    // of by the next round's rerun. Evidence only: the reported min (and
    // totals) keep their in-place reps. Caveats a reader needs: by
    // session end every shared cache is released, so a retry of a
    // cache-consumer query includes the cache rebuild its in-place reps
    // amortized — read retry against the FIRST in-place rep, not the
    // min; and a retry that THROWS records the -1.0 sentinel (ADVICE
    // r18) so a fast crash never reads as environmental refutation.
    val fnByName = selected.toMap
    // watch tier (r15 verdict): sub-anomaly creep — min ≥ 1.5× the
    // committed prior AND ≥ 0.5 s, under the 2× extra-rep trigger
    def isWatch(r: QRes): Boolean =
      !r.extraRep && prior.get(r.name).exists(p =>
        p > 0.05 && r.min > 1.5 * p && r.min > 0.5)
    val retrySecs: Map[String, Double] =
      results.filter(r => r.extraRep || isWatch(r)).map { r =>
        graft.core.CacheLife.releaseScoped(spark)
        val t0 = System.nanoTime()
        val ok =
          try { fnByName(r.name)(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] ${r.name} retry failed: ${e.getMessage}"); false }
        r.name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
      }.toMap
    // The driver keeps a 2000-char stdout TAIL, which ALSO captures
    // sbt's trailing "[success] Total time..." line (~75 bytes) — round
    // 13's 2000-byte budget lost the line's head to that trailer. So the
    // whole line is budgeted at 1900 bytes (2000 − 75 − margin): summary
    // keys first, the complete per-query string next, slim anom/watch
    // telemetry last, 2-decimal trailing-zero-stripped seconds, and — if
    // the line would still overrun — the per-query string drops its
    // FASTEST entries first (slow queries are the ones BASELINE
    // comparison needs; "qtrunc" then records how many sub-threshold
    // entries were dropped so the truncation is never silent). The
    // committed bench_rNN.json snapshot always carries every query at 3
    // decimals plus full rep/GC/cache telemetry.
    def fmt(v: Double): String = BigDecimal(v)
      .setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    def fmt2(v: Double): String = {
      val s = BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP).toString
      if (s.contains('.')) s.reverse.dropWhile(_ == '0').reverse.stripSuffix(".")
      else s
    }
    def short(n: String): String = n.takeWhile(_ != '_')
    val qsFull = results.map(r => "\"" + r.name + "\":" + fmt(r.min))
      .mkString("{", ",", "}")
    // full per-query cache telemetry goes to the committed snapshot; the
    // stdout line carries only the peak (staying inside the tail window)
    val cacheFull = results.map { r =>
      "\"" + r.name + "\":[" + r.nCached + "," + r.cacheOutMb + "]"
    }.mkString("{", ",", "}")
    val cachePeak = if (results.isEmpty) """"cache_peak":{}""" else {
      val peak = results.maxBy(_.cacheOutMb)
      s""""cache_peak":{"at":"${short(peak.name)}","rdds":${peak.nCached},"mb":${peak.cacheOutMb}}"""
    }
    // per-query rep telemetry for the committed snapshot: every rep's wall
    // seconds and GC-time delta (ms), which rep won, and cache-in MB —
    // enough to attribute any cross-session drift (GC pause / storage
    // pressure / first-rep JIT) from the two artifacts alone
    val repsFull = results.map { r =>
      "\"" + r.name + "\":{\"s\":[" + r.repSecs.map(fmt2).mkString(",") +
        "],\"gc\":[" + r.repGcMs.mkString(",") + "],\"win\":" + r.winRep +
        ",\"in_mb\":" + r.cacheInMb + "}"
    }.mkString("{", ",", "}")
    // anomaly records (one per query whose min exceeded 2× its committed
    // prior-round value) carry rep times, GC deltas, winning rep, and a
    // named cause heuristic — full records in the snapshot, count on the line
    def cause(r: QRes): String = {
      val winGc = r.repGcMs(r.winRep - 1)
      val p = prior.getOrElse(r.name, 0.0)
      if (winGc > (r.min * 1000 * 0.3).toLong) "gc"
      else if (r.repSecs.drop(1).nonEmpty && r.repSecs.tail.min <= 2 * p) "first-rep-jit"
      else if (r.cacheInMb > 2048) "storage-pressure"
      else "env"
    }
    // watch-tier cause is MACHINE-derived from the record's own reps (r16
    // verdict: README hand-attributed three watch creeps to "session GC
    // pressure" while one record's own telemetry showed gc:[0,0]). A creep
    // whose winning rep spent >30% of its wall time in GC is "gc"; heavy
    // inherited storage is "storage"; anything else stays an honest "?" —
    // unattributable from this artifact alone, so nobody should prose it.
    def watchCause(r: QRes): String = {
      val winGc = r.repGcMs(r.winRep - 1)
      if (winGc > (r.min * 1000 * 0.3).toLong) "gc"
      else if (r.cacheInMb > 2048) "storage"
      else "?"
    }
    def csKey(n: String): String = short(n).stripPrefix("q")
    // anomaly records (rep times, GC, winner, retry, cause) go ONLY to the
    // committed snapshot since r20 — in r19 the slim stdout copies
    // displaced 7 per-query map entries (qtrunc: 7); the line now carries
    // just the counts ("anomn"/"watchn") so the map always has the budget
    val anomRecsAll = results.filter(_.extraRep).sortBy(-_.min).map { r =>
      // retry = the END-OF-SESSION rerun (seconds): retry ≈ prior refutes
      // the spike (env confirmed); retry ≈ min says the slowdown
      // reproduces outside the spike's moment — code-side
      val retry = retrySecs.getOrElse(r.name, 0.0)
      "\"" + short(r.name) + "\":{\"s\":[" + r.repSecs.map(fmt2).mkString(",") +
        "],\"gc\":[" + r.repGcMs.mkString(",") + "],\"win\":" + r.winRep +
        ",\"p\":" + fmt2(prior.getOrElse(r.name, 0.0)) +
        ",\"retry\":" + fmt2(retry) + ",\"cause\":\"" + cause(r) + "\"}"
    }
    // WATCH tier (r15 verdict): sub-anomaly creep — min ≥ 1.5× the
    // committed prior AND ≥ 0.5 s, but under the 2× extra-rep trigger —
    // gets a snapshot record (no inline extra rep, but an end-of-session
    // retry like the anom tier: r18 verdict) so q93-class drift
    // self-reports AND self-adjudicates from the artifact instead of
    // sailing two hundredths under the alarm.
    val watchRecsAll = results.filter(isWatch).sortBy(-_.min).map { r =>
      val retry = retrySecs.getOrElse(r.name, 0.0)
      "\"" + short(r.name) + "\":{\"s\":[" + r.repSecs.map(fmt2).mkString(",") +
        "],\"gc\":[" + r.repGcMs.mkString(",") + "],\"p\":" + fmt2(prior(r.name)) +
        ",\"retry\":" + fmt2(retry) + ",\"cause\":\"" + watchCause(r) + "\"}"
    }
    val anomFull = anomRecsAll.mkString("{", ",", "}")
    val watchFull = watchRecsAll.mkString("{", ",", "}")
    val failed = results.collect { case r if !r.ok => "\"" + r.name + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_.min).sum
    // host telemetry in the cal block (r19 verdict): logical core count and
    // 1-min load average, so a local[32]-on-fewer-cores oversubscription or
    // a busy host is attributable from the artifact alone
    val physCores = Runtime.getRuntime.availableProcessors()
    val load1m = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    val cal =
      s""""cal":[${fmt2(calSpark)},${fmt2(calCpu)},$physCores,${fmt2(load1m)}]"""
    // STDOUT LINE LAYOUT (the driver keeps a 2000-char stdout tail, parses
    // the JSON line found in it, and sbt appends a ~75-byte trailer; the
    // whole line budgets at 1900 — under the derived 1915 for margin):
    //  1. fixed head — metric/value/unit/cal/failed/sf and the anom/watch
    //     COUNTS ("anomn"/"watchn"; the full records live only in the
    //     committed snapshot since r20 — they displaced 7 map entries in
    //     r19);
    //  2. "queries" — the driver-contract JSON OBJECT mapping FULL query
    //     names to seconds, filled SLOWEST-FIRST with as many entries as
    //     the budget allows. The full-name map for all 231 queries is
    //     ~5.6 KB and a 2000-char tail cannot carry it (r19 verdict asked
    //     for the full map + qtrunc 0: arithmetically impossible
    //     together), so the object carries the slow tier the comparator
    //     needs most and "qrest" (next) completes the line;
    //  3. "qrest" — every query NOT in the object, as the r17-19 compact
    //     csv string "id:centiseconds" (id = query number sans 'q'/suffix,
    //     collision-checked up front), so the LINE still reports all
    //     queries: "qtrunc" counts queries missing from BOTH (expected 0;
    //     fastest-first drops only if the line genuinely cannot fit).
    // The committed bench_rNN.json keeps every query under its full name
    // at 3-decimal seconds plus full rep/GC/cache/anom/watch telemetry.
    val head =
      s""""metric":"total","value":${fmt2(total)},"unit":"sec",$cal,"failed":$failed,"sf":"${new java.io.File(sfDir).getName}","anomn":${anomRecsAll.length},"watchn":${watchRecsAll.length}"""
    val stdoutBudget = 1900
    case class Entry(min: Double, obj: String, csv: String)
    val entries = results.map(r => Entry(r.min,
      "\"" + r.name + "\":" + fmt2(r.min),
      csKey(r.name) + ":" + Math.round(r.min * 100)))
    // admission: start with every entry in the csv string, then promote
    // the slowest into the JSON object while the rendered line fits; if
    // even csv-only overruns, drop the fastest csv entries (qtrunc counts
    // them). Sets are tracked by index so two identically-rendered
    // entries can never both slip in on one budget charge.
    val byMinDesc = entries.zipWithIndex.sortBy { case (e, i) => (-e.min, i) }
    def lineOf(objIdx: Set[Int], csvIdx: Set[Int]): String = {
      val obj = entries.zipWithIndex
        .collect { case (e, i) if objIdx(i) => e.obj }.mkString("{", ",", "}")
      val csv = entries.zipWithIndex
        .collect { case (e, i) if csvIdx(i) => e.csv }.mkString("\"", ",", "\"")
      val qtrunc = entries.length - objIdx.size - csvIdx.size
      s"""{$head,"queries":$obj,"qrest":$csv,"qtrunc":$qtrunc}"""
    }
    var objIdx = Set.empty[Int]
    var csvIdx = entries.indices.toSet
    // fastest-first eviction only if csv alone cannot fit (defensive)
    byMinDesc.reverseIterator.takeWhile(_ =>
      lineOf(objIdx, csvIdx).length > stdoutBudget)
      .foreach { case (_, i) => csvIdx -= i }
    // slowest-first promotion into the driver-parseable object
    byMinDesc.foreach { case (_, i) =>
      if (csvIdx(i) && lineOf(objIdx + i, csvIdx - i).length <= stdoutBudget) {
        objIdx += i; csvIdx -= i
      }
    }
    val line = lineOf(objIdx, csvIdx)
    val snapshot =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec",$cal,"queries":$qsFull,"cache_mb":$cacheFull,$cachePeak,"reps":$repsFull,"anom":$anomFull,"watch":$watchFull,"failed":$failed,"sf":"$sfDir"}"""
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench_last.json"), snapshot + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] snapshot write failed: $e") }
    spark.stop()
    // last line of stdout, after spark shutdown, so nothing prints below it
    println(line)
  }
}
