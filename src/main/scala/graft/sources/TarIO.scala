package graft.sources

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed WebDataset shard ingest/egest over [[Tar]] — a multimodal
  * corpus as a fleet of `.tar` shards whose members group into samples by
  * basename key (`000123.jpg` + `000123.txt` + `000123.json` = one
  * sample).
  *
  * Scale shape: writes are per-partition kernels through the Hadoop
  * FileSystem API (no driver funnel); one shard per partition with a
  * sample's members adjacent (the WebDataset contract, kept by an
  * in-partition sort on key). Reads come in two plans: [[readShards]]
  * parses whole shards per task — the production WebDataset model, where
  * parallelism IS the shard count — and [[readShardsFanout]] goes one
  * step further than any tar library: because ustar headers put every
  * member's exact `(offset, size)` 512 bytes ahead of its data, an index
  * task walks ONLY the headers (seek-read, 512 B per member, no data
  * touched), and the bounded `(path, name, offset, size)` rows shuffle to
  * tasks that each read just their own byte ranges. Member-level
  * parallelism for skewed shards (one 4 GB video next to 10k captions)
  * without reading anything twice.
  */
object TarIO {

  /** Write `(key, ext, bytes)` member rows as `part-NNNNN.tar` shards, one
    * per partition, members of one sample adjacent and `{key}.{ext}`-named.
    *
    * The WebDataset adjacency contract is GLOBAL: a sample's members must
    * land in the same shard, so the write hash-partitions on the key
    * (keeping the caller's partition count as the shard count) before the
    * in-shard sort. Without it, callers that union member frames (txt +
    * json built separately — the common shape) would split every sample
    * across two shards; in-repo readers hide that behind [[samples]]'s
    * shuffle, but an external sequential WebDataset consumer would see
    * broken samples. One payload shuffle on the write path is the price of
    * the format's contract.
    */
  def writeShards(members: DataFrame, dir: String, keyCol: String = "key",
      extCol: String = "ext", bytesCol: String = "bytes"): Unit = {
    val spark = members.sparkSession
    import spark.implicits._
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sessionState.newHadoopConf())
    val selected = members.select(
      col(keyCol).cast("string").as(keyCol), col(extCol), col(bytesCol))
    val nShards = math.max(1, selected.rdd.getNumPartitions)
    // sample adjacency comes from the shuffle's in-partition sort (no
    // per-task toSeq.sortBy copy), and each entry streams straight to the
    // filesystem as header+body+padding — the task's memory bound is ONE
    // member's bytes, not the whole shard (a hot sample key concentrates
    // its members in one shard by design; it no longer concentrates the
    // shard in memory)
    selected.repartition(nShards, col(keyCol))
      .sortWithinPartitions(col(keyCol), col(extCol))
      .as[(String, String, Array[Byte])]
      .foreachPartition { (it: Iterator[(String, String, Array[Byte])]) =>
        if (it.hasNext) {
          val pid = TaskContext.get().partitionId()
          val path = new org.apache.hadoop.fs.Path(dir, f"part-$pid%05d.tar")
          val fs = path.getFileSystem(conf.value)
          val out = fs.create(path, true)
          try {
            it.foreach { case (k, e, b0) =>
              val b = Option(b0).getOrElse(Array.emptyByteArray)
              out.write(Tar.headerBytes(if (e.isEmpty) k else s"$k.$e", b.length.toLong))
              out.write(b)
              val pad = (512 - (b.length % 512)) % 512
              if (pad > 0) out.write(new Array[Byte](pad))
            }
            out.write(new Array[Byte](2 * 512)) // ustar terminator blocks
          } finally out.close()
        }
      }
  }

  /** Header-only member walk of one shard: seek-read 512 bytes per member,
    * never touch data blocks. `(path, name, dataOffset, size)` rows — the
    * index pass [[readShardsFanout]] fans out, and the per-shard kernel of
    * the streaming census twin. */
  private[graft] def indexShard(path: String,
      conf: org.apache.hadoop.conf.Configuration): Seq[(String, String, Long, Long)] = {
    val p = new org.apache.hadoop.fs.Path(new java.net.URI(path))
    val fs = p.getFileSystem(conf)
    val fileLen = fs.getFileStatus(p).getLen
    val in = fs.open(p)
    try {
      val hdr = new Array[Byte](512)
      val ms = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long, Long)]
      var pos = 0L
      var done = false
      while (!done && pos + 512 <= fileLen) {
        in.seek(pos)
        in.readFully(hdr)
        Tar.parseHeaderBlock(hdr) match {
          case None => done = true
          case Some((name, size)) =>
            ms += ((path, name, pos + 512, size))
            pos += 512 + ((size + 511) / 512) * 512
        }
      }
      ms.toSeq
    } finally in.close()
  }

  private def memberRow(shard: String, name: String, body: Array[Byte]) = {
    val (key, ext) = Tar.keyExt(name)
    (shard, key, ext, body)
  }

  /** Whole-shard-per-task read: `(shard, key, ext, bytes)` member rows.
    * Parallelism = shard count — the standard WebDataset plan. */
  def readShards(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // pathGlobFilter instead of a "$dir/*.ext" glob path: FileStreamSink
    // .hasMetadata probes the glob STRING as a literal path and logs a
    // full FileNotFoundException stack trace at WARN (it polluted the
    // round-14 bench stdout tail); loading the directory keeps the probe
    // on a real path
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.tar").load(dir)
      .select(col("path"), col("content"))
      .flatMap(r => Tar.readAll(r.getAs[Array[Byte]](1))
        .map(e => memberRow(r.getString(0), e.name, e.body)))
      .toDF("shard", "key", "ext", "bytes")
  }

  /** Member-parallel read: a header-only index pass per shard (512 bytes
    * seek-read per member), then bounded `(path, name, offset, size)` rows
    * spread across the cluster; each task opens, seeks, and reads only its
    * own member ranges.
    */
  def readShardsFanout(spark: SparkSession, dir: String,
      partitions: Int = 0): DataFrame = {
    import spark.implicits._
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sessionState.newHadoopConf())
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val fs0 = dirPath.getFileSystem(spark.sessionState.newHadoopConf())
    val shards = fs0.globStatus(new org.apache.hadoop.fs.Path(dir, "*.tar"))
      .map(_.getPath.toString).toSeq.sorted
    val index = spark.createDataset(shards).repartition(math.max(1, shards.size))
      .flatMap(path => indexShard(path, conf.value))
      .toDF("path", "name", "offset", "size")
    val fanned = index.repartition(
        if (partitions > 0) partitions else spark.sparkContext.defaultParallelism)
      // members of one shard that land together read through ONE reused
      // stream in offset order (sequential-ish I/O; opens ≈ shards/task,
      // not members/task — measured 5× on the 1M-member scale gate)
      .sortWithinPartitions(col("path"), col("offset"))
    fanned.as[(String, String, Long, Long)].mapPartitions { it =>
      var curPath: String = null
      var in: org.apache.hadoop.fs.FSDataInputStream = null
      def closeIn(): Unit = if (in != null) { in.close(); in = null; curPath = null }
      // the hasNext==false close only fires when the iterator fully drains;
      // a downstream limit/take or a task failure would otherwise leak the
      // stream for the task's lifetime
      TaskContext.get().addTaskCompletionListener[Unit](_ => closeIn())
      val rows = it.map { case (path, name, off, size) =>
        if (path != curPath) {
          closeIn()
          val p = new org.apache.hadoop.fs.Path(new java.net.URI(path))
          in = p.getFileSystem(conf.value).open(p)
          curPath = path
        }
        in.seek(off)
        val buf = new Array[Byte](size.toInt)
        in.readFully(buf)
        memberRow(path, name, buf)
      }
      new Iterator[(String, String, String, Array[Byte])] {
        def hasNext: Boolean = { val h = rows.hasNext; if (!h) closeIn(); h }
        def next(): (String, String, String, Array[Byte]) = rows.next()
      }
    }.toDF("shard", "key", "ext", "bytes")
  }

  /** Member rows → one row per SAMPLE: `(key, exts sorted, map ext→bytes)`.
    * One shuffle on the sample key. */
  def samples(members: DataFrame): DataFrame =
    members.groupBy("key")
      .agg(sort_array(collect_list(col("ext"))).as("exts"),
        map_from_entries(sort_array(collect_list(struct(col("ext"), col("bytes")))))
          .as("members"))
}
