package graft

import graft.core.GraftSession
import graft.models.{LutIO, ModelRegistry}

/** S7 — batch LUT export CLI (the reference's `models_to_nc` typer command,
  * src/scripts/xsarsea_cli.py:12-29): materialize every registered model's
  * LUT and write the canonical Parquet form.
  *
  * Usage: runMain graft.LutExport <outDir> [modelName ...]
  */
object LutExport {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: LutExport <outDir> [modelName ...]")
    val outDir = args.head
    val only = args.tail.toSet
    val spark = GraftSession.getOrCreate(
      master = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]",
      appName = "graft-lut-export")
    val models = ModelRegistry.all.filter(m => only.isEmpty || only(m.name))
    models.foreach { m =>
      val path = s"$outDir/${m.name}"
      LutIO.writeLut(spark, m.name, path)
      println(s"[lut-export] ${m.name} -> $path")
    }
    spark.stop()
  }
}
