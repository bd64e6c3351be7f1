package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Recipes

class RecipesSpec extends SparkSpec {
  import spark.implicits._

  /** Forward-modeled scene: truth wind everywhere, sigma0 from the GMFs. */
  def syntheticScene(n: Int, wspd: Double, dirDeg: Double): org.apache.spark.sql.DataFrame = {
    val rows = for (l <- 0 until n; s <- 0 until n) yield {
      val inc = 20.0 + 20.0 * s / (n - 1)
      val s0co = graft.functions.Gmf.cmod5n(inc, wspd, dirDeg)
      val s0cr = graft.functions.Gmf.s1V2(inc, wspd)
      (l, s, inc, s0co, s0cr, 1e-4,
        // ancillary u/v chosen so the meteo→sample chain lands on dirDeg
        // with ground_heading 0: u = sin(rad(dirMeteo)), dirMeteo = 270-dir
        wspd * math.sin(math.toRadians(270.0 - dirDeg)),
        wspd * math.cos(math.toRadians(270.0 - dirDeg)),
        0.0)
    }
    rows.toDF("line", "sample", "incidence", "sigma0", "sigma0_cr", "nesz",
      "ancillary_u", "ancillary_v", "ground_heading")
  }

  test("wind retrieval recipe recovers the forward-model speed end-to-end") {
    val scene = syntheticScene(20, wspd = 12.0, dirDeg = 40.0)
    val out = Recipes.windRetrieval(scene).collect()
    assert(out.length == 400)
    val speeds = out.map(_.getAs[Double]("wspd")).filterNot(_.isNaN)
    assert(speeds.nonEmpty, "all speeds NaN")
    val medianSpeed = speeds.sorted.apply(speeds.length / 2)
    assert(math.abs(medianSpeed - 12.0) < 1.0, s"median recovered $medianSpeed vs truth 12.0")
  }

  test("detrend recipe flattens the incidence trend") {
    val scene = syntheticScene(24, wspd = 10.0, dirDeg = 45.0)
      .select(col("line"), col("sample"), col("incidence"), col("sigma0"))
    val out = Recipes.detrend(scene)
    // detrended sigma0 at fixed wind should be nearly constant across samples
    val stats = out.agg(
      (stddev(col("sigma0_detrend")) / avg(col("sigma0_detrend"))).as("cv")).head
    assert(stats.getDouble(0) < 0.05, s"residual variation ${stats.getDouble(0)}")
  }

  test("streaks recipe produces a peak per window per config-mean") {
    val g = (for (l <- 0 until 64; s <- 0 until 64) yield {
      val phase = (l * math.cos(0.6) + s * math.sin(0.6)) * 2 * math.Pi / 8.0
      (l, s, 1.0 + 0.5 * math.sin(phase))
    }).toDF("line", "sample", "v")
    val peaks = Recipes.streaks(g, downscales = Seq(1, 2), windowSize = 32).collect()
    assert(peaks.nonEmpty)
    assert(peaks.forall(r => r.getAs[Int]("peak_bin") >= 0 && r.getAs[Int]("peak_bin") < 72))
  }

  test("curateAndShard: kept docs exactly once, contiguous shards, deterministic") {
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
    val keep = docs.select(col("doc_id"), (col("doc_id") % 3 =!= 0).as("keep"))
    val out = Recipes.curateAndShard(docs, keep, seqLen = 256, nShards = 4,
      epoch = 1).cache()
    val keptIds = keep.filter(col("keep")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val outIds = out.select("doc_id").collect().map(_.getLong(0))
    assert(outIds.length == keptIds.size && outIds.toSet == keptIds,
      "every kept doc exactly once, no dropped doc")
    // shards partition the window stream into contiguous ranges
    val ranges = out.groupBy("shard")
      .agg(min(col("seq_id")).as("lo"), max(col("seq_id")).as("hi"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(ranges.map(_._1).toSeq == (0L until 4L).toSeq, ranges.toSeq.toString)
    ranges.sliding(2).foreach {
      case Array((_, _, hi), (_, lo, _)) => assert(hi <= lo, ranges.toSeq.toString)
      case _ =>
    }
    // deterministic end to end
    val again = Recipes.curateAndShard(docs, keep, seqLen = 256, nShards = 4,
      epoch = 1)
    assert(out.except(again).isEmpty && again.except(out).isEmpty)
    out.unpersist()
  }
}
