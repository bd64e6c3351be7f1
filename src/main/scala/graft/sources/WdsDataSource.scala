package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, In}
import org.apache.spark.sql.types.{BinaryType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 reader for WebDataset tar shards —
  * `spark.read.format("wds").load(dir)` opens a shard fleet as a
  * first-class member table `(shard, key, ext, size, bytes)`:
  *
  *  - **Payload pruning reaches the file**: drop `bytes` from the
  *    projection and the reader walks ONLY the 512-byte ustar headers —
  *    a member census / size audit over a petabyte of shards reads
  *    ~0.005% of it.
  *  - **ext/key filter pushdown**: `WHERE ext = 'txt'` (or `IN`, or a
  *    key equality) is applied at the member index, so only matching
  *    members' payload ranges are ever read — reading the captions out
  *    of an image-heavy corpus skips the image bytes entirely. Filters
  *    are also re-applied by Spark above the scan: the pushdown is an
  *    I/O reduction, never a correctness dependency.
  *  - **Shard = partition**: one input partition per `.tar` (the
  *    WebDataset parallelism model); the driver only LISTS the
  *    directory — headers are parsed on executors.
  */
class WdsDataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "wds"

  private def pathsOf(m: util.Map[String, String]): Seq[String] = {
    val multi = Option(m.get("paths")).map { js =>
      new com.fasterxml.jackson.databind.ObjectMapper()
        .readValue(js, classOf[Array[String]]).toSeq
    }.getOrElse(Nil)
    val single = Option(m.get("path")).filter(_.nonEmpty).toSeq
    val all = (single ++ multi).distinct
    require(all.nonEmpty, "wds source requires .load(<shard dir or .tar path(s)>)")
    all
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WdsTable.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new WdsTable(pathsOf(properties))
}

private[sources] object WdsTable {
  val Schema: StructType = StructType(Seq(
    StructField("shard", StringType, nullable = false),
    StructField("key", StringType, nullable = false),
    StructField("ext", StringType, nullable = false),
    StructField("size", LongType, nullable = false),
    StructField("bytes", BinaryType, nullable = true)))
}

private[sources] class WdsTable(paths: Seq[String]) extends Table with SupportsRead {

  /** Driver side only LISTS: directories glob to their .tar files. */
  private[sources] val shards: Seq[String] = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    paths.flatMap { p =>
      val hp = new org.apache.hadoop.fs.Path(p)
      val fs = hp.getFileSystem(conf)
      if (fs.getFileStatus(hp).isDirectory)
        fs.globStatus(new org.apache.hadoop.fs.Path(p, "*.tar"))
          .map(_.getPath.toString).toSeq
      else Seq(hp.toString)
    }.distinct.sorted
  }
  require(shards.nonEmpty, s"wds: no .tar shards under ${paths.mkString(",")}")

  override def name(): String = s"wds:${paths.mkString(",")}"
  override def schema(): StructType = WdsTable.Schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new WdsScanBuilder(shards)
}

private[sources] class WdsScanBuilder(shards: Seq[String])
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var required: StructType = WdsTable.Schema
  private var extIn: Option[Set[String]] = None
  private var keyIn: Option[Set[String]] = None
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Accept ext/key membership predicates as an I/O filter; everything is
    * also returned as residual — the scan may only ever UNDER-emit bytes,
    * never change results. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    def strs(vs: Array[Any]): Option[Set[String]] = {
      val s = vs.collect { case x: String => x }.toSet
      if (s.size == vs.length) Some(s) else None
    }
    def and(cur: Option[Set[String]], add: Set[String]): Option[Set[String]] =
      Some(cur.fold(add)(_ intersect add))
    pushed = filters.filter {
      case EqualTo("ext", v: String) => extIn = and(extIn, Set(v)); true
      case In("ext", vs) => strs(vs).exists { s => extIn = and(extIn, s); true }
      case EqualTo("key", v: String) => keyIn = and(keyIn, Set(v)); true
      case In("key", vs) => strs(vs).exists { s => keyIn = and(keyIn, s); true }
      case _ => false
    }
    filters
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = {
    val outPlan = required.fieldNames.map {
      case "shard" => 0
      case "key" => 1
      case "ext" => 2
      case "size" => 3
      case "bytes" => 4
    }
    WdsScan(shards.toArray, required, outPlan,
      extIn.map(_.toArray.sorted).orNull, keyIn.map(_.toArray.sorted).orNull,
      needBytes = required.fieldNames.contains("bytes"))
  }
}

private[graft] case class WdsScan(shards: Array[String], required: StructType,
    outPlan: Array[Int], extFilter: Array[String], keyFilter: Array[String],
    needBytes: Boolean) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"WdsScan(shards=${shards.length}, " +
      s"ext=${Option(extFilter).map(_.mkString("[", ",", "]")).getOrElse("*")}, " +
      s"key=${Option(keyFilter).map(_.mkString("[", ",", "]")).getOrElse("*")}, " +
      s"bytes=$needBytes)"

  override def planInputPartitions(): Array[InputPartition] =
    shards.map(WdsShard(_): InputPartition)

  override def createReaderFactory(): PartitionReaderFactory = {
    val conf = new org.apache.spark.util.SerializableConfiguration(
      SparkSession.active.sessionState.newHadoopConf())
    WdsReaderFactory(outPlan, extFilter, keyFilter, needBytes, conf)
  }
}

private[sources] case class WdsShard(path: String) extends InputPartition

private[sources] case class WdsReaderFactory(outPlan: Array[Int],
    extFilter: Array[String], keyFilter: Array[String], needBytes: Boolean,
    conf: org.apache.spark.util.SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new WdsPartitionReader(partition.asInstanceOf[WdsShard].path, outPlan,
      Option(extFilter).map(_.toSet), Option(keyFilter).map(_.toSet),
      needBytes, conf.value)
}

/** Walks one shard's headers via seek; reads a member's payload ONLY when
  * it passes the pushed filters and `bytes` is projected. */
private[sources] final class WdsPartitionReader(path: String,
    outPlan: Array[Int], extFilter: Option[Set[String]],
    keyFilter: Option[Set[String]], needBytes: Boolean,
    conf: org.apache.hadoop.conf.Configuration)
    extends PartitionReader[InternalRow] {

  private val hp = new org.apache.hadoop.fs.Path(path)
  private val fs = hp.getFileSystem(conf)
  private val fileLen = fs.getFileStatus(hp).getLen
  private val in = fs.open(hp)
  private val shardUtf8 = UTF8String.fromString(path)
  private val hdr = new Array[Byte](512)

  private var pos = 0L
  private var cur: (String, String, Long, Array[Byte]) = _ // key, ext, size, bytes?

  override def next(): Boolean = {
    while (pos + 512 <= fileLen) {
      in.seek(pos)
      in.readFully(hdr)
      Tar.parseHeaderBlock(hdr) match {
        case None => return false // end-of-archive zero block
        case Some((name, size)) =>
          val dataAt = pos + 512
          pos += 512 + ((size + 511) / 512) * 512
          val (key, ext) = Tar.keyExt(name)
          if (extFilter.forall(_(ext)) && keyFilter.forall(_(key))) {
            val bytes =
              if (!needBytes) null
              else {
                val buf = new Array[Byte](size.toInt)
                in.seek(dataAt)
                in.readFully(buf)
                buf
              }
            cur = (key, ext, size, bytes)
            return true
          }
      }
    }
    false
  }

  override def get(): InternalRow = {
    val vals = new Array[Any](outPlan.length)
    var i = 0
    while (i < outPlan.length) {
      vals(i) = outPlan(i) match {
        case 0 => shardUtf8
        case 1 => UTF8String.fromString(cur._1)
        case 2 => UTF8String.fromString(cur._2)
        case 3 => cur._3
        case 4 => cur._4
      }
      i += 1
    }
    new GenericInternalRow(vals)
  }

  override def close(): Unit = in.close()
}
