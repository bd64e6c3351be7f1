package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions.col

import graft.sources.{Nc3, OwiScan, SceneIngest}

/** DataSource V2 surface for OWI scenes: `spark.read.format("owi")` must
  * match the SceneIngest path row-for-row, prune unused variable planes out
  * of the scan, and clamp the scanned line range from pushed filters.
  */
class OwiSourceSpec extends SparkSpec {

  private lazy val h5Fixture: String = {
    val url = getClass.getResource("/owi_fixture.h5")
    assert(url != null, "owi_fixture.h5 missing — run: python3 tools/make_h5_fixture.py")
    new java.io.File(url.toURI).getAbsolutePath
  }

  private def owiScan(df: org.apache.spark.sql.DataFrame): OwiScan =
    df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan
    }.collect { case s: OwiScan => s }
      .getOrElse(fail(s"no OwiScan in plan:\n${df.queryExecution.executedPlan}"))

  test("format(\"owi\") reads an HDF5 scene identically to SceneIngest") {
    val dsv2 = spark.read.format("owi").load(h5Fixture)
    val direct = SceneIngest.readOwiAuto(spark, h5Fixture)
    assert(dsv2.schema == direct.schema)
    assert(dsv2.count() == 57L * 83)
    assert(dsv2.exceptAll(direct).isEmpty && direct.exceptAll(dsv2).isEmpty)
  }

  test("format(\"owi\") reads a classic netCDF-3 scene identically to SceneIngest") {
    val dir = Files.createTempDirectory("owidsv2").toString
    import Nc3._
    val nL = 6; val nS = 8
    val s0 = Array.tabulate(nL * nS)(i => 0.001 + i * 1e-5)
    val incPlane = Array.tabulate(nL * nS)(i => 16.0 + (i % nS) * 0.5)
    Nc3.write(s"$dir/owi.nc",
      Seq(Dim("owiAzSize", nL), Dim("owiRaSize", nS), Dim("obs", 2)),
      Seq(Att("title", NcChar, Left("owi test scene"))),
      Seq(
        Var("owiNrcs", Seq(0, 1), Nil, NcDouble, s0),
        Var("owiIncidenceAngle", Seq(0, 1), Nil, NcDouble, incPlane),
        Var("owiCalConstObsi", Seq(2), Nil, NcDouble, Array(1.0, 2.0))))
    val dsv2 = spark.read.format("owi").load(s"$dir/owi.nc")
    val direct = SceneIngest.readOwi(spark, s"$dir/owi.nc")
    assert(dsv2.schema == direct.schema)
    assert(dsv2.exceptAll(direct).isEmpty && direct.exceptAll(dsv2).isEmpty)
  }

  test("column pruning reaches the scan: a 2-column projection decodes one plane") {
    val df = spark.read.format("owi").load(h5Fixture)
      .select(col("line"), col("owiWindSpeed"))
    val scan = owiScan(df)
    assert(scan.readSchema().fieldNames.toSeq == Seq("line", "owiWindSpeed"))
    assert(scan.scenes.head.recipes.map(_.name) == Seq("owiWindSpeed"),
      s"unpruned planes would be decoded: ${scan.scenes.head.recipes.map(_.name)}")
    // pruned read is still correct
    val r = df.filter(col("line") === 2).agg(org.apache.spark.sql.functions
      .sum(col("owiWindSpeed"))).head().getDouble(0)
    assert(r == (0 until 83).map(s => 2 * 1000 + s).sum.toDouble)
  }

  test("line predicates clamp the scanned pixel span (I/O pushdown)") {
    val df = spark.read.format("owi").load(h5Fixture)
      .filter(col("line") >= 10 && col("line") < 13)
      .select(col("line"), col("sample"), col("owiMask"))
    val scan = owiScan(df)
    assert(scan.lineLo == 10 && scan.lineHi == 12, s"clamp: [${scan.lineLo},${scan.lineHi}]")
    // the filter is still applied above the scan — results exact
    assert(df.count() == 3L * 83)
    val bad = df.filter(col("owiMask") =!= (col("line") + col("sample")) % 5).count()
    assert(bad == 0)
  }

  test("multi-scene load unions pixel tables with a scene id column") {
    val dir = Files.createTempDirectory("owimulti").toString
    import Nc3._
    // two scenes with the same variables but DIFFERENT grid shapes
    def writeScene(path: String, nL: Int, nS: Int, scale: Double): Unit =
      Nc3.write(path,
        Seq(Dim("owiAzSize", nL), Dim("owiRaSize", nS)),
        Nil,
        Seq(Var("owiNrcs", Seq(0, 1), Nil, NcDouble,
          Array.tabulate(nL * nS)(i => scale + i * 1e-3))))
    writeScene(s"$dir/a.nc", 4, 6, 1.0)
    writeScene(s"$dir/b.nc", 3, 5, 100.0)
    val df = spark.read.format("owi").option("sceneColumn", "scene")
      .load(s"$dir/a.nc", s"$dir/b.nc")
    assert(df.columns.toSeq == Seq("scene", "line", "sample", "owiNrcs"))
    assert(df.count() == 4 * 6 + 3 * 5)
    import spark.implicits._
    val bySceneMax = df.groupBy("scene")
      .agg(org.apache.spark.sql.functions.max(col("owiNrcs")).as("m"),
        org.apache.spark.sql.functions.max(col("line")).as("l"))
      .as[(String, Double, Int)].collect()
      .map { case (k, v, l) => (k.split('/').last, (v, l)) }.toMap
    assert(bySceneMax("a.nc") == ((1.0 + 23 * 1e-3, 3)))
    assert(bySceneMax("b.nc") == ((100.0 + 14 * 1e-3, 2)))
    // line clamp applies per scene: line 3 only exists in scene a
    val l3 = spark.read.format("owi").option("sceneColumn", "scene")
      .load(s"$dir/a.nc", s"$dir/b.nc").filter(col("line") === 3)
    assert(l3.count() == 6)
  }

  test("contradictory line bounds plan an empty scan, not a failed read") {
    val df = spark.read.format("owi").load(h5Fixture)
      .filter(col("line") > 100 && col("line") < 50)
    assert(df.count() == 0)
  }
}
