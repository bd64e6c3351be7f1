package graft

import graft.functions.Gmf

class SqlExtensionsSpec extends SparkSpec {

  test("GMFs are SQL-callable via SparkSessionExtensions") {
    val r = spark.sql("SELECT gmf_cmod5n(30.0, 10.0, 45.0) AS s").head.getDouble(0)
    assert(r == Gmf.cmod5n(30.0, 10.0, 45.0))
    val r2 = spark.sql("SELECT gmf_s1_v2(35.0, 15.0) AS s").head.getDouble(0)
    assert(r2 == Gmf.s1V2(35.0, 15.0))
  }

  test("codegen path evaluates over a projection and handles nulls") {
    import spark.implicits._
    Seq((30.0, 10.0, 45.0), (40.0, 25.0, 90.0)).toDF("i", "w", "p")
      .createOrReplaceTempView("pts")
    val vals = spark.sql("SELECT gmf_cmod5(i, w, p) AS s FROM pts")
      .collect().map(_.getDouble(0)).sorted
    val exp = Array(Gmf.cmod5(30.0, 10.0, 45.0), Gmf.cmod5(40.0, 25.0, 90.0)).sorted
    assert(vals.sameElements(exp))
    // null in → null out (nullIntolerant)
    val n = spark.sql("SELECT gmf_cmod5(CAST(NULL AS DOUBLE), 10.0, 45.0) AS s").head
    assert(n.isNullAt(0))
  }

  test("expression stays inside whole-stage codegen (no fallback)") {
    import spark.implicits._
    val df = spark.range(100).select(
      org.apache.spark.sql.functions.expr("gmf_s1_v2(16.0 + id % 50, 3.0 + id % 70)").as("s"))
    val codegen = org.apache.spark.sql.execution.debug.codegenString(df.queryExecution.executedPlan)
    assert(codegen.contains("gmfFn") || codegen.contains(".eval("),
      s"expected inlined gmf call in generated code:\n${codegen.take(2000)}")
    assert(df.agg(org.apache.spark.sql.functions.sum("s")).head.getDouble(0) > 0)
  }

  test("dot_f32 matches the higher-order fold bit-for-bit and is SQL-callable") {
    import org.apache.spark.sql.functions.col
    val emb = graft.core.Tables.load(spark, sfDir, "embeddings").limit(50)
    val fold = emb.select(
      org.apache.spark.sql.functions.aggregate(
        org.apache.spark.sql.functions.zip_with(
          org.apache.spark.sql.functions.transform(col("embedding"), x => x.cast("double")),
          org.apache.spark.sql.functions.transform(col("embedding"), x => x.cast("double")),
          (x, y) => x * y),
        org.apache.spark.sql.functions.lit(0.0), (acc, x) => acc + x).as("d")).collect()
    val fast = emb.select(graft.operators.Similarity.norm2(col("embedding")).as("d")).collect()
    fold.zip(fast).foreach { case (a, b) =>
      assert(a.getDouble(0) == b.getDouble(0), "codegen dot must be bit-identical to the fold")
    }
    val viaSql = spark.sql(
      "SELECT dot_f32(embedding, embedding) AS d FROM parquet.`" + sfDir + "/embeddings.parquet` LIMIT 1")
    assert(viaSql.head.getDouble(0) > 0)
  }

  test("all-literal GMF calls constant-fold in the optimized plan") {
    val df = spark.sql("SELECT gmf_cmod5n(35.0, 10.0, 45.0) AS s FROM range(5)")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("gmf_cmod5n"),
      s"expected ConstantFolding to eliminate the call:\n$optimized")
    assert(math.abs(df.head.getDouble(0) - graft.functions.Gmf.cmod5n(35.0, 10.0, 45.0)) < 1e-15)
  }
}
