package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 reader for OWI scene files — `spark.read.format("owi")
  * .load(path)` opens a netCDF-3 classic or netCDF-4/HDF5 scene (magic-byte
  * dispatch, `xr.open_dataset(owi_file, group=...)` parity, reference
  * detrend.py:71-93) as a first-class Spark source:
  *
  *  - **Column pruning reaches the file**: `pruneColumns` drops unused
  *    variables from the scan, so a 2-column projection over a 10-variable
  *    scene reads and decodes 2 planes, not 10 — the custom-source
  *    equivalent of parquet's ReadSchema pruning.
  *  - **Line-range filter pushdown**: `line` predicates clamp the pixel-id
  *    span before partition planning, so `WHERE line BETWEEN a AND b` reads
  *    only the covering byte ranges/chunks (filters are still re-applied by
  *    Spark above the scan — the pushdown is an I/O reduction, never a
  *    correctness dependency).
  *  - **Metadata on the driver, bytes on executors**: the driver parses the
  *    few-KB header / chunk B-tree once per table; each input partition is a
  *    contiguous pixel span whose reader bulk-reads its own byte ranges via
  *    the same [[VarRecipe]] span decoders as [[SceneIngest]].
  *
  * A MULTI-SCENE read is the production shape — `load(paths: _*)` unions
  * every scene's pixel table in one scan (one input-partition set across
  * all files, pruning/clamping applied per file). Pass
  * `.option("sceneColumn", "scene")` to prepend each row's source file
  * path, since (line, sample) alone is ambiguous across scenes.
  *
  * Registered via META-INF/services as short name `owi`; options: `path` /
  * `paths` (set by `.load`), `group` (HDF5 group, default
  * owiInversionTables_UV), `sceneColumn` (off unless set).
  */
class OwiDataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "owi"

  private def pathsOf(m: util.Map[String, String]): Seq[String] = {
    val multi = Option(m.get("paths")).map { js =>
      // DataFrameReader.load(paths*) JSON-encodes the list into `paths`
      new com.fasterxml.jackson.databind.ObjectMapper()
        .readValue(js, classOf[Array[String]]).toSeq
    }.getOrElse(Nil)
    val single = Option(m.get("path")).filter(_.nonEmpty).toSeq
    val all = (single ++ multi).distinct
    require(all.nonEmpty, "owi source requires .load(<scene file path(s)>)")
    all
  }

  private def groupOf(m: util.Map[String, String]): String =
    Option(m.get("group")).getOrElse("owiInversionTables_UV")

  private def sceneColOf(m: util.Map[String, String]): Option[String] =
    Option(m.get("sceneColumn")).filter(_.nonEmpty)

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    // schema from the FIRST scene; getTable validates the rest agree
    val (_, _, recipes) = SceneIngest.sceneRecipes(pathsOf(options).head, groupOf(options))
    OwiTable.withSceneCol(SceneIngest.sceneSchema(recipes), sceneColOf(options))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new OwiTable(pathsOf(properties), groupOf(properties), sceneColOf(properties))
}

private[sources] object OwiTable {
  def withSceneCol(schema: StructType, sceneCol: Option[String]): StructType =
    sceneCol.fold(schema)(c =>
      StructType(StructField(c, StringType, nullable = false) +: schema.fields))
}

/** Per-scene geometry + read recipes — the unit [[OwiScan]] plans over. */
private[sources] case class SceneMeta(path: String, nL: Int, nS: Int,
    recipes: IndexedSeq[VarRecipe])

private[sources] class OwiTable(paths: Seq[String], group: String,
    sceneCol: Option[String]) extends Table with SupportsRead {

  // one driver-side metadata walk per table (header + chunk B-trees); grid
  // shapes may differ per scene, variable sets must agree
  private val scenes: Seq[SceneMeta] = paths.map { p =>
    val (nL, nS, recipes) = SceneIngest.sceneRecipes(p, group)
    SceneMeta(p, nL, nS, recipes)
  }
  require(scenes.map(_.recipes.map(_.name)).distinct.size == 1,
    s"scene files disagree on variables: " +
      scenes.map(s => s"${s.path}: ${s.recipes.map(_.name).mkString(",")}").mkString("; "))

  override def name(): String = s"owi:${paths.mkString(",")}"
  override def schema(): StructType =
    OwiTable.withSceneCol(SceneIngest.sceneSchema(scenes.head.recipes), sceneCol)
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new OwiScanBuilder(scenes, sceneCol)
}

private[sources] class OwiScanBuilder(scenes: Seq[SceneMeta], sceneCol: Option[String])
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var required: StructType =
    OwiTable.withSceneCol(SceneIngest.sceneSchema(scenes.head.recipes), sceneCol)
  private var lineLo: Long = 0L
  private var lineHi: Long = Long.MaxValue
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Accept `line` bound predicates as an I/O clamp; every filter is also
    * returned as residual, so Spark re-evaluates above the scan and the
    * clamp can never change results — only how many bytes are read. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    def num(v: Any): Option[Long] = v match {
      case n: Number => Some(n.longValue())
      case _ => None
    }
    pushed = filters.filter {
      case EqualTo("line", v) => num(v).exists { x =>
        lineLo = math.max(lineLo, x); lineHi = math.min(lineHi, x); true
      }
      case GreaterThan("line", v) => num(v).exists { x =>
        lineLo = math.max(lineLo, x + 1); true
      }
      case GreaterThanOrEqual("line", v) => num(v).exists { x =>
        lineLo = math.max(lineLo, x); true
      }
      case LessThan("line", v) => num(v).exists { x =>
        lineHi = math.min(lineHi, x - 1); true
      }
      case LessThanOrEqual("line", v) => num(v).exists { x =>
        lineHi = math.min(lineHi, x); true
      }
      case _ => false
    }
    filters // all residual: pushdown is an optimization, not a contract
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = {
    // output plan per required column: -3 = scene path, -2 = line,
    // -1 = sample, else index into each file's pruned recipe array (only
    // pruned vars are read and decoded; the var ORDER is shared across
    // files, so one outPlan serves every scene)
    val varCols = scenes.head.recipes.map(_.name)
      .filter(required.fieldNames.contains).toArray
    val varIdx = varCols.zipWithIndex.toMap
    val outPlan = required.fieldNames.map {
      case c if sceneCol.contains(c) => -3
      case "line" => -2
      case "sample" => -1
      case n => varIdx(n)
    }
    val pruned = scenes.map { s =>
      val byName = s.recipes.map(r => r.name -> r).toMap
      SceneMeta(s.path, s.nL, s.nS, varCols.map(byName).toIndexedSeq)
    }
    OwiScan(pruned.toArray, required, outPlan, math.max(0L, lineLo), lineHi)
  }
}

/** Scan + Batch: pixel spans over every scene's (line-clamped) grid. */
private[graft] case class OwiScan(scenes: Array[SceneMeta], required: StructType,
    outPlan: Array[Int], lineLo: Long, lineHi: Long) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"OwiScan(scenes=${scenes.length}, " +
      s"vars=[${scenes.head.recipes.map(_.name).mkString(",")}], lines=[$lineLo,$lineHi])"

  override def planInputPartitions(): Array[InputPartition] = {
    val minParts = SparkSession.active.sparkContext.defaultParallelism.toLong
    scenes.zipWithIndex.flatMap { case (s, fileIdx) =>
      val fileHi = math.min(s.nL - 1L, lineHi)
      if (lineLo > fileHi) Array.empty[InputPartition]
      else {
        val lo = lineLo * s.nS
        val hi = (fileHi + 1) * s.nS - 1
        val nPx = hi - lo + 1
        // at least the default parallelism ACROSS the table, split evenly
        // over scenes; spans within a scene stay contiguous byte ranges
        val nParts = math.max(1L, math.max(minParts / scenes.length,
          (nPx + OwiScan.PxPerPartition - 1) / OwiScan.PxPerPartition)).toInt
        val per = (nPx + nParts - 1) / nParts
        (0 until nParts).iterator
          .map(i => OwiSpan(fileIdx, lo + i * per, math.min(hi, lo + (i + 1) * per - 1)))
          .filter(sp => sp.lo <= sp.hi)
          .toArray[InputPartition]
      }
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    OwiReaderFactory(scenes, outPlan)
}

private[sources] object OwiScan {
  /** Same span bound as [[SceneIngest]]: caps executor slab memory while
    * keeping reads sequential-ish. */
  val PxPerPartition = 2000000L
}

private[sources] case class OwiSpan(fileIdx: Int, lo: Long, hi: Long)
    extends InputPartition

private[sources] case class OwiReaderFactory(scenes: Array[SceneMeta],
    outPlan: Array[Int]) extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val span = partition.asInstanceOf[OwiSpan]
    new OwiPartitionReader(scenes(span.fileIdx), outPlan, span.lo, span.hi)
  }
}

private[sources] final class OwiPartitionReader(scene: SceneMeta,
    outPlan: Array[Int], lo: Long, hi: Long) extends PartitionReader[InternalRow] {

  private val nS = scene.nS
  private val sceneUtf8 = org.apache.spark.unsafe.types.UTF8String.fromString(scene.path)
  // bulk-read each pruned variable's covering byte ranges once per span
  private val planes: Array[Array[Double]] = {
    val raf = new java.io.RandomAccessFile(scene.path, "r")
    try scene.recipes.map(_.readSpan(raf, lo, hi, scene.nL, nS)).toArray
    finally raf.close()
  }
  private var id: Long = lo - 1

  override def next(): Boolean = { id += 1; id <= hi }

  override def get(): InternalRow = {
    val off = (id - lo).toInt
    val vals = new Array[Any](outPlan.length)
    var i = 0
    while (i < outPlan.length) {
      vals(i) = outPlan(i) match {
        case -3 => sceneUtf8
        case -2 => (id / nS).toInt
        case -1 => (id % nS).toInt
        case v => planes(v)(off)
      }
      i += 1
    }
    new GenericInternalRow(vals)
  }

  override def close(): Unit = ()
}
