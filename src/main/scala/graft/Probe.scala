package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Round-20 scratch instrumentation main (not part of the library API):
  * runs named queries under the EXACT Bench session shape with a listener
  * that attributes wall time to jobs / stages / executor task time, and
  * optionally dumps `.explain("formatted")` to plans/r20/<name>_<tag>.txt.
  *
  * Usage: SPARK_GRAFT_PLAN_TAG=before runMain graft.Probe q142 q23
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val planTag = sys.env.get("SPARK_GRAFT_PLAN_TAG")
    val reps = sys.env.get("SPARK_GRAFT_REPS").map(_.toInt).getOrElse(2).max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.sql.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.files.maxPartitionBytes", (4L * 1024 * 1024).toString)
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var taskMs = 0L
    @volatile var gcMs = 0L
    @volatile var shuffleReadB = 0L
    @volatile var shuffleWriteB = 0L
    val stageRows = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Int, Long, Long, String)]
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1
        val i = s.stageInfo
        tasks += i.numTasks
        taskMs += i.taskMetrics.executorRunTime
        gcMs += i.taskMetrics.jvmGCTime
        shuffleReadB += i.taskMetrics.shuffleReadMetrics.totalBytesRead
        shuffleWriteB += i.taskMetrics.shuffleWriteMetrics.bytesWritten
        stageRows.add((i.stageId, i.numTasks, i.taskMetrics.executorRunTime,
          i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L),
          i.name.take(60)))
      }
    }
    spark.sparkContext.addSparkListener(listener)

    val tokens = args.toSeq
    val all = SparkEntry.queries.toSeq.sortBy(_._1)
    val sel = QueryFilter.selector(tokens, all.map(_._1))
    val selected = all.filter { case (n, _) => sel(n) }
    require(selected.nonEmpty, s"no query matches ${tokens.mkString(",")}")

    selected.foreach { case (name, fn) =>
      planTag.foreach { tag =>
        val qe = fn(spark, sfDir).queryExecution
        val txt = qe.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get("plans/r20"))
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"plans/r20/${name}_$tag.txt"), txt)
      }
      var best = Double.MaxValue
      (1 to reps).foreach { rep =>
        jobs = 0; stages = 0; tasks = 0; taskMs = 0; gcMs = 0
        shuffleReadB = 0; shuffleWriteB = 0; stageRows.clear()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        // tiny settle so listener events drain before reading counters
        Thread.sleep(120)
        println(f"[probe] $name wall=$wall%.3f jobs=$jobs stages=$stages " +
          f"tasks=$tasks taskSec=${taskMs / 1e3}%.2f gcSec=${gcMs / 1e3}%.2f " +
          f"shufR=${shuffleReadB >> 20}MB shufW=${shuffleWriteB >> 20}MB")
        if (rep == reps && sys.env.contains("SPARK_GRAFT_STAGES")) {
          import scala.jdk.CollectionConverters._
          stageRows.asScala.toSeq.sortBy(-_._4).take(8).foreach {
            case (id, nt, ems, wms, nm) =>
              println(f"[stage]   id=$id%-4d tasks=$nt%-3d taskSec=${ems / 1e3}%6.2f " +
                f"wallSec=${wms / 1e3}%6.2f  $nm")
          }
        }
        best = math.min(best, wall)
        graft.core.CacheLife.releaseScoped(spark)
      }
      println(f"[probe] $name BEST=$best%.3f")
    }
    spark.stop()
  }
}
