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
import org.apache.spark.sql.types.StructType
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
  * Registered via META-INF/services as short name `owi`; options: `path`
  * (set by `.load`), `group` (HDF5 group, default owiInversionTables_UV).
  */
class OwiDataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "owi"

  private def pathOf(m: util.Map[String, String]): String = {
    val p = m.get("path")
    require(p != null && p.nonEmpty, "owi source requires .load(<scene file path>)")
    p
  }

  private def groupOf(m: util.Map[String, String]): String =
    Option(m.get("group")).getOrElse("owiInversionTables_UV")

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val (_, _, recipes) = SceneIngest.sceneRecipes(pathOf(options), groupOf(options))
    SceneIngest.sceneSchema(recipes)
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new OwiTable(pathOf(properties), groupOf(properties))
}

private[sources] class OwiTable(path: String, group: String)
    extends Table with SupportsRead {

  // one driver-side metadata walk per table (header + chunk B-trees)
  private val (nL, nS, recipes) = SceneIngest.sceneRecipes(path, group)

  override def name(): String = s"owi:$path"
  override def schema(): StructType = SceneIngest.sceneSchema(recipes)
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new OwiScanBuilder(path, nL, nS, recipes)
}

private[sources] class OwiScanBuilder(path: String, nL: Int, nS: Int,
    recipes: IndexedSeq[VarRecipe])
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var required: StructType = SceneIngest.sceneSchema(recipes)
  private var lineLo: Long = 0L
  private var lineHi: Long = nL - 1L
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
    val byName = recipes.map(r => r.name -> r).toMap
    // output plan per required column: -2 = line, -1 = sample, else index
    // into the pruned recipe array (only pruned vars are read and decoded)
    val varCols = required.fieldNames.filter(byName.contains)
    val prunedRecipes = varCols.map(byName)
    val varIdx = varCols.zipWithIndex.toMap
    val outPlan = required.fieldNames.map {
      case "line" => -2
      case "sample" => -1
      case n => varIdx(n)
    }
    OwiScan(path, nL, nS, prunedRecipes.toArray, required, outPlan,
      math.max(0L, lineLo), math.min(nL - 1L, lineHi))
  }
}

/** Scan + Batch: pixel spans over the (possibly line-clamped) grid. */
private[graft] case class OwiScan(path: String, nL: Int, nS: Int,
    recipes: Array[VarRecipe], required: StructType, outPlan: Array[Int],
    lineLo: Long, lineHi: Long) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"OwiScan(vars=[${recipes.map(_.name).mkString(",")}], lines=[$lineLo,$lineHi])"

  override def planInputPartitions(): Array[InputPartition] = {
    if (lineLo > lineHi) return Array.empty
    val lo = lineLo * nS
    val hi = (lineHi + 1) * nS - 1
    val nPx = hi - lo + 1
    val minParts = SparkSession.active.sparkContext.defaultParallelism.toLong
    val nParts = math.max(1L, math.max(minParts,
      (nPx + OwiScan.PxPerPartition - 1) / OwiScan.PxPerPartition)).toInt
    val per = (nPx + nParts - 1) / nParts
    (0 until nParts).iterator
      .map(i => OwiSpan(lo + i * per, math.min(hi, lo + (i + 1) * per - 1)))
      .filter(s => s.lo <= s.hi)
      .toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory =
    OwiReaderFactory(path, nL, nS, recipes, outPlan)
}

private[sources] object OwiScan {
  /** Same span bound as [[SceneIngest]]: caps executor slab memory while
    * keeping reads sequential-ish. */
  val PxPerPartition = 2000000L
}

private[sources] case class OwiSpan(lo: Long, hi: Long) extends InputPartition

private[sources] case class OwiReaderFactory(path: String, nL: Int, nS: Int,
    recipes: Array[VarRecipe], outPlan: Array[Int]) extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val span = partition.asInstanceOf[OwiSpan]
    new OwiPartitionReader(path, nL, nS, recipes, outPlan, span.lo, span.hi)
  }
}

private[sources] final class OwiPartitionReader(path: String, nL: Int, nS: Int,
    recipes: Array[VarRecipe], outPlan: Array[Int], lo: Long, hi: Long)
    extends PartitionReader[InternalRow] {

  // bulk-read each pruned variable's covering byte ranges once per span
  private val planes: Array[Array[Double]] = {
    val raf = new java.io.RandomAccessFile(path, "r")
    try recipes.map(_.readSpan(raf, lo, hi, nL, nS))
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
