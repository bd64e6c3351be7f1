package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main — one JSON line with per-query wall seconds at the sf dir
  * given by SPARK_GRAFT_SF_DIR. Results are materialized through the noop
  * sink so Catalyst cannot prune the measured expressions (a bare count()
  * would skip every projected column).
  */
object Bench {
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
    // Per-query wall seconds as the MIN over `reps` executions. Single-run
    // timings on this shared host carry multi-second environmental spikes
    // (observed 8×+ on random queries across otherwise-identical runs, no
    // GC/Full-pause correlation); the min is the reproducible number and is
    // what BASELINE comparisons should read.
    val reps = sys.env.get("SPARK_GRAFT_REPS").map(_.toInt).getOrElse(2).max(1)
    // cache lifecycle: after each query's reps, scoped temps drop and any
    // shared cache whose consumers have all run (or were never selected)
    // unpersists — the r11 drift root cause was 127 queries' worth of
    // accumulated storage degrading late queries 2-3× via eviction churn
    val unselected = all.map(_._1).toSet -- selected.map(_._1).toSet
    var completed = unselected
    val results = selected.map { case (name, fn) =>
      val runs = (1 to reps).map { r =>
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
        if (r < reps) graft.core.CacheLife.releaseScoped(spark)
        (elapsed, ok)
      }
      completed += name
      graft.core.CacheLife.afterQuery(spark, completed)
      // storage telemetry AFTER the release: what this query leaves cached
      // for later ones — makes any future in-session drift attributable
      // from the artifact alone
      val (nCached, bytes) = graft.core.CacheLife.storageStats(spark)
      (name, runs.map(_._1).min, runs.forall(_._2), nCached, bytes >> 20)
    }
    // The driver keeps only a ~2.3 KB stdout TAIL (plus sbt's trailing
    // "[success]" line); round 12's 165-entry 3-decimal line overran it,
    // the line's FRONT scrolled off, and the driver recorded parsed:null.
    // So the stdout line is built to FIT: summary keys first, per-query
    // entries last, 2-decimal trailing-zero-stripped seconds, and — if the
    // line would still overrun the window — the per-query map drops its
    // FASTEST entries first (slow queries are the ones BASELINE comparison
    // needs; "qtrunc" then records how many sub-threshold entries were
    // dropped so the truncation is never silent). The committed
    // bench_rNN.json snapshot always carries every query at 3 decimals.
    def fmt(v: Double): String = BigDecimal(v)
      .setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    def fmt2(v: Double): String = {
      val s = BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP).toString
      if (s.contains('.')) s.reverse.dropWhile(_ == '0').reverse.stripSuffix(".")
      else s
    }
    def short(n: String): String = n.takeWhile(_ != '_')
    val qsFull = results.map { case (k, v, _, _, _) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    // full per-query cache telemetry goes to the committed snapshot; the
    // stdout line carries only the peak (staying inside the tail window)
    val cacheFull = results.map { case (k, _, _, n, mb) =>
      "\"" + k + "\":[" + n + "," + mb + "]"
    }.mkString("{", ",", "}")
    val cachePeak = if (results.isEmpty) """"cache_peak":{}""" else {
      val (peakName, _, _, peakN, peakMb) =
        results.maxBy { case (_, _, _, _, mb) => mb }
      s""""cache_peak":{"at":"${short(peakName)}","rdds":$peakN,"mb":$peakMb}"""
    }
    val failed = results.collect { case (k, _, false, _, _) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).sum
    val head =
      s""""metric":"total","value":${fmt(total)},"unit":"sec",$cachePeak,"failed":$failed,"sf":"$sfDir""""
    val stdoutBudget = 2000 // bytes for the whole line, < the tail window
    val entries = results.map { case (k, v, _, _, _) =>
      (v, "\"" + short(k) + "\":" + fmt2(v))
    }
    // keep the slowest entries that fit the budget, emit in name order
    val fixed = head.length + """{,"queries":{},"qtrunc":999}""".length
    var room = stdoutBudget - fixed
    val keepSet = scala.collection.mutable.Set.empty[String]
    entries.sortBy(-_._1).foreach { case (_, e) =>
      if (room - (e.length + 1) >= 0) { room -= e.length + 1; keepSet += e }
    }
    val kept = entries.collect { case (_, e) if keepSet(e) => e }
    val qsShort = kept.mkString("{", ",", "}")
    val qtrunc = entries.length - kept.length
    val line = s"""{$head,"queries":$qsShort,"qtrunc":$qtrunc}"""
    val snapshot =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qsFull,"cache_mb":$cacheFull,$cachePeak,"failed":$failed,"sf":"$sfDir"}"""
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench_last.json"), snapshot + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] snapshot write failed: $e") }
    spark.stop()
    // last line of stdout, after spark shutdown, so nothing prints below it
    println(line)
  }
}
