package graft.sources

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed WARC crawl ingest/egest over [[Warc]] — the Spark face of
  * the web-crawl container: write a corpus as the standard splittable
  * `.warc.gz` layout (one gzip member per record, one file per partition),
  * and read a crawl directory back with record-level parallelism.
  *
  * Scale shape: writes are per-partition kernels through the Hadoop
  * FileSystem API (HDFS/S3-safe, no driver funnel). Reads come in two
  * plans: [[readCrawl]] parses whole files per task (fine when the crawl
  * has many files — the usual Common-Crawl shape of ~1 GB segments), and
  * [[readCrawlFanout]] splits WITHIN files at the exact gzip-member
  * boundaries [[Warc.memberOffsets]] discovers — a cheap offsets pass per
  * file, then (path, offset, length) rows shuffle to tasks that each open,
  * seek, and inflate only their own member ranges. That second plan is the
  * 100 TB path: record-level parallelism without decompressing anything
  * twice.
  */
object WarcIO {

  /** Write (id, text) rows as `part-NNNNN.warc.gz` files, one per
    * partition, one gzip member per record. */
  def writeCrawl(docs: DataFrame, dir: String,
      idCol: String = "doc_id", textCol: String = "text"): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sessionState.newHadoopConf())
    docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .foreachPartition { (it: Iterator[(Long, String)]) =>
        if (it.hasNext) {
          val recs = it.map { case (id, t) =>
            Warc.Record(s"<urn:uuid:doc-$id>", "response",
              s"http://corpus.local/doc/$id",
              Option(t).getOrElse("").getBytes("UTF-8"))
          }.toSeq
          val pid = TaskContext.get().partitionId()
          val path = new org.apache.hadoop.fs.Path(dir, f"part-$pid%05d.warc.gz")
          val fs = path.getFileSystem(conf.value)
          val out = fs.create(path, true)
          try out.write(Warc.write(recs)) finally out.close()
        }
      }
  }

  private val recordSchema = "record_id STRING, target_uri STRING, text STRING"

  /** Whole-file-per-task read of a crawl directory. */
  def readCrawl(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // pathGlobFilter instead of a "$dir/*.ext" glob path: FileStreamSink
    // .hasMetadata probes the glob STRING as a literal path and logs a
    // full FileNotFoundException stack trace at WARN (it polluted the
    // round-14 bench stdout tail); loading the directory keeps the probe
    // on a real path
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc.gz").load(dir)
      .select(col("content"))
      .flatMap(r => Warc.readAll(r.getAs[Array[Byte]](0))
        .map(w => (w.recordId, w.targetUri, w.bodyText)))
      .toDF("record_id", "target_uri", "text")
  }

  /** Member-parallel read: discover every gzip member's (offset, length)
    * per file, shuffle the bounded offset rows across the cluster, and
    * inflate each member where its row lands (seek + bounded read through
    * the Hadoop FileSystem — no whole-file buffering on the read side).
    */
  def readCrawlFanout(spark: SparkSession, dir: String,
      partitions: Int = 0): DataFrame = {
    import spark.implicits._
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sessionState.newHadoopConf())
    // pathGlobFilter, not a glob path — see readCrawl's note
    val members = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc.gz").load(dir)
      .select(col("path"), col("content"))
      .flatMap { r =>
        val bytes = r.getAs[Array[Byte]](1)
        val offs = Warc.memberOffsets(bytes)
        offs.zip(offs.drop(1) :+ bytes.length.toLong)
          .map { case (o, e) => (r.getString(0), o, e - o) }
      }.toDF("path", "offset", "length")
    val fanned = members.repartition(
        if (partitions > 0) partitions
        else spark.sparkContext.defaultParallelism) // spread member rows round-robin
      // members of one file that land together inflate through ONE reused
      // stream in offset order (opens ≈ files/task, not members/task — the
      // same stream-reuse pattern as TarIO.readShardsFanout)
      .sortWithinPartitions(col("path"), col("offset"))
    fanned.as[(String, Long, Long)].mapPartitions { it =>
      var curPath: String = null
      var in: org.apache.hadoop.fs.FSDataInputStream = null
      def closeIn(): Unit = if (in != null) { in.close(); in = null; curPath = null }
      // close on early termination (limit/take) and task failure too — the
      // hasNext==false close only covers a fully-drained iterator
      TaskContext.get().addTaskCompletionListener[Unit](_ => closeIn())
      val recs = it.flatMap { case (path, off, len) =>
        if (path != curPath) {
          closeIn()
          val p = new org.apache.hadoop.fs.Path(new java.net.URI(path))
          in = p.getFileSystem(conf.value).open(p)
          curPath = path
        }
        in.seek(off)
        val buf = new Array[Byte](len.toInt)
        in.readFully(buf)
        Warc.readMember(buf, 0, len).map(w => (w.recordId, w.targetUri, w.bodyText))
      }
      new Iterator[(String, String, String)] {
        def hasNext: Boolean = { val h = recs.hasNext; if (!h) closeIn(); h }
        def next(): (String, String, String) = recs.next()
      }
    }.toDF("record_id", "target_uri", "text")
  }
}
