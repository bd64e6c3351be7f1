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
    // warm up codegen/JIT + parquet footer caches outside the measurements
    try selected.headOption.foreach(_._2(spark, sfDir).write
      .format("noop").mode("overwrite").save())
    catch { case _: Throwable => }
    // Per-query wall seconds as the MIN over `reps` executions. Single-run
    // timings on this shared host carry multi-second environmental spikes
    // (observed 8×+ on random queries across otherwise-identical runs, no
    // GC/Full-pause correlation); the min is the reproducible number and is
    // what BASELINE comparisons should read.
    val reps = sys.env.get("SPARK_GRAFT_REPS").map(_.toInt).getOrElse(2).max(1)
    val results = selected.map { case (name, fn) =>
      val runs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch {
            case e: Throwable => System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
          }
        ((System.nanoTime() - t0) / 1e9, ok)
      }
      (name, runs.map(_._1).min, runs.forall(_._2))
    }
    // seconds at ms resolution: full-precision doubles made the line long
    // enough that the driver's tail capture truncated the first third of
    // the per-query dict in round 10 — keep it compact AND persist a copy
    // to a file the driver can snapshot even if stdout is clipped
    def fmt(v: Double): String = BigDecimal(v)
      .setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).sum
    val line =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}"""
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench_last.json"), line + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] snapshot write failed: $e") }
    spark.stop()
    // last line of stdout, after spark shutdown, so nothing prints below it
    println(line)
  }
}
