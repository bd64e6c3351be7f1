package graft

import org.apache.spark.sql.functions._

import graft.core.GraftSession
import graft.functions.GmfColumns
import graft.models.ModelRegistry
import graft.operators.{Directions, Gradients, Inversion}

/** Engine-side domain targets (BASELINE.md): timings at the reference's
  * full-scene sizes, validating the 100 TB design assumptions (broadcast
  * LUTs, tile+halo shuffles) far beyond the sf0.1 gate. Prints one line per
  * target. Usage: runMain graft.ScaleBench [lines samples]
  */
object ScaleBench {
  def main(args: Array[String]): Unit = {
    val (nL, nS) = args match {
      case Array(l, s) => (l.toInt, s.toInt)
      case _ => (1700, 2500)
    }
    val spark = GraftSession.getOrCreate(
      master = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]",
      appName = "graft-scale")
    import spark.implicits._

    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scale] $name%-42s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // 1. high-res copol LUT generation — 501×499×181 ≈ 45M cells (driver)
    timed("lut_gen_highres_copol_45M") {
      ModelRegistry.get("gmf_cmod5n").toLut(highRes = true).values.length
    }

    // 2. low-res + multilinear interp to high-res (the reference default)
    timed("lut_interp_low_to_high_copol") {
      ModelRegistry.get("gmf_cmod5n").toLutInterpolated().values.length
    }

    // synthetic full scene, forward-modeled wind (distributed generation)
    val scene = spark.range(nL.toLong * nS)
      .select(
        (col("id") / nS).cast("int").as("line"),
        (col("id") % nS).cast("int").as("sample"))
      .withColumn("incidence", lit(16.0) + lit(34.0) * col("sample") / lit(nS - 1.0))
      .withColumn("wspd_t", lit(4.0) + (col("line") % 40) * lit(0.7))
      .withColumn("phi_t", (col("sample") % 360) * lit(0.5))

    // 3. dual-pol inversion over the full scene (4.25M px default)
    timed(s"dualpol_inversion_${nL}x$nS") {
      val luts = Inversion.buildLuts(spark, Some("gmf_cmod5n"), Some("gmf_s1_v2"), highRes = false)
      val px = scene.select(
        col("line").cast("long").as("okey"), col("sample").cast("long").as("lnum"),
        col("incidence").as("inc"),
        Directions.toDb(GmfColumns.cmod5n(col("incidence"), col("wspd_t"), col("phi_t"))).as("s0co_db"),
        Directions.toDb(GmfColumns.s1V2(col("incidence"), col("wspd_t"))).as("s0cr_db"),
        lit(0.1).as("dsig_cr"),
        (col("wspd_t") * cos(radians(col("phi_t")))).as("anc_re"),
        (col("wspd_t") * sin(radians(col("phi_t")))).as("anc_im"))
      Inversion.invert(px, luts).write.format("noop").mode("overwrite").save()
    }

    // 4. multiscale gradient histogram (2 downscales × 2 window sizes)
    timed(s"gradients_multiscale_${nL}x$nS") {
      val grid = scene.select(col("line"), col("sample"),
        (lit(1.0) + sin(col("line") * 0.7 + col("sample") * 0.35)).as("v"))
      Gradients.multiscale(grid, downscales = Seq(1, 2), windowSizes = Seq(160, 320))
        .write.format("noop").mode("overwrite").save()
    }

    // 5. R5∘R3 local-gradients: compositional (13 exchanges) vs fused (1)
    val grid = scene.select(col("line"), col("sample"),
      (lit(1.0) + sin(col("line") * 0.7 + col("sample") * 0.35)).as("v"))
    timed(s"local_gradients_chained_${nL}x$nS") {
      Gradients.localGradients(grid).write.format("noop").mode("overwrite").save()
    }
    timed(s"local_gradients_fused_${nL}x$nS") {
      Gradients.localGradientsFused(grid).write.format("noop").mode("overwrite").save()
    }

    // 6. rain/artifact filtering parameters — exercises the distributed
    // zoomBilinear (spark.range targets + corner equi-join; no driver grid,
    // no raster broadcast) on the full scene
    timed(s"filtering_params_${nL}x$nS") {
      Gradients.filteringParameters(grid, knownDims = Some(((nL + 1) / 2, (nS + 1) / 2)))
        .write.format("noop").mode("overwrite").save()
    }

    // synthetic 1M-vector embedding corpus, dim 16, deterministic — murmur3
    // mixed per (id, dim) so vectors are genuinely distinct (a plain linear
    // congruence mod 2000 has period 2000 in id: only 2000 distinct vectors
    // in the corpus, which collapses LSH buckets into duplicate mega-groups
    // and explodes the pair count)
    val nVec = 1000000
    val emb = spark.range(nVec)
      .select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(15)),
          i => (pmod(hash(col("id"), i), lit(2000)) - 1000).cast("double") / 1000.0)
          .cast("array<float>").as("embedding"))

    // 7. LSH all-pairs top-1 at 1M vectors: autoPlanes gives 16 planes →
    // 65536 buckets → ~15 vectors/bucket (bounded pair work; a fixed
    // planes=4 would put 62.5k vectors in each of 16 buckets — 4G pairs
    // per bucket)
    timed(s"ann_lsh_top1_${nVec / 1000}k_auto_planes") {
      operators.Similarity.rpTopK(emb, k = 1)
        .write.format("noop").mode("overwrite").save()
    }

    // 8. IVF-flat: fixed 64-centroid quantizer (bounded broadcast), 10
    // queries probing 2 lists of ~15.6k vectors each
    timed(s"ann_ivf_top5_${nVec / 1000}k_64cents") {
      operators.Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 10),
          k = 5, numCents = 64, nprobe = 2)
        .write.format("noop").mode("overwrite").save()
    }

    // 9. MinHash+LSH near-dup dedup at 1M docs (~30 words each, Zipf-ish
    // vocab): 10% are near-copies of a base doc (2 words perturbed) so the
    // banded LSH has real work. shingle explode → 16 minhashes → 4×4 bands
    // → band equi-join → exact Jaccard on candidates; never all-pairs.
    val nDocs = 1000000
    val base = spark.range(nDocs).select(col("id").as("doc_id"),
      concat_ws(" ", transform(sequence(lit(0), lit(29)), i =>
        concat(lit("w"), pmod(hash((col("id") % (nDocs / 10) * 10), i), lit(5000))))).as("text"))
    val docs = base.select(col("doc_id"),
      when(col("doc_id") % 10 === 0, col("text"))
        .otherwise(concat(col("text"), lit(" x"), (col("doc_id") % 97).cast("string")))
        .as("text"))
    timed(s"minhash_lsh_jaccard_${nDocs / 1000}k_docs") {
      val pairs = operators.TextOps.lshCandidatePairs(
        operators.TextOps.minhashSignatures(docs))
      operators.TextOps.jaccardPairs(docs, pairs)
        .write.format("noop").mode("overwrite").save()
    }

    spark.stop()
  }
}
