package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.{Index, Similarity, TextOps}

/** LLM-training-data pipeline surface over `documents` and `embeddings`. */
object Text {

  private val P = TextOps.HashP

  // DuckDB fragments shared by the oracles
  private val hashSql = "('0x' || substr(md5(%s), 1, 15))::BIGINT" // 60-bit md5-prefix hash

  /** q30: exact dedup via content hash. */
  def q30DedupExact(spark: SparkSession, sfDir: String): DataFrame =
    TextOps.exactDedup(Tables.load(spark, sfDir, "documents"))
      .select(col("doc_id"), col("content_hash"), col("is_canonical"),
        col("n_copies").cast("long").as("n_copies"))

  val q30Sql: String =
    """WITH h AS (SELECT doc_id, md5(text) AS content_hash FROM documents),
      |g AS (SELECT content_hash, MIN(doc_id) AS canonical_id, COUNT(1) AS n_copies
      |      FROM h GROUP BY content_hash)
      |SELECT h.doc_id, h.content_hash, h.doc_id = g.canonical_id AS is_canonical, g.n_copies
      |FROM h JOIN g USING (content_hash)""".stripMargin

  /** q31: token counting + quality signals. */
  def q31TextStats(spark: SparkSession, sfDir: String): DataFrame =
    TextOps.textStats(Tables.load(spark, sfDir, "documents"))
      .select(col("doc_id"),
        col("n_chars").cast("long").as("n_chars"),
        col("n_tokens").cast("long").as("n_tokens"),
        col("n_distinct").cast("long").as("n_distinct"),
        col("ttr"), col("stop_ratio"), col("mean_tok_len"))

  val q31Sql: String =
    """SELECT doc_id,
      |  length(text) AS n_chars,
      |  len(string_split(text, ' ')) AS n_tokens,
      |  len(list_distinct(string_split(text, ' '))) AS n_distinct,
      |  ROUND(len(list_distinct(string_split(text, ' '))) / len(string_split(text, ' ')), 6) AS ttr,
      |  ROUND(len(list_filter(string_split(text, ' '), t -> t IN ('the', 'a', 'of', 'and')))
      |        / len(string_split(text, ' ')), 6) AS stop_ratio,
      |  ROUND((length(text) - (len(string_split(text, ' ')) - 1))
      |        / len(string_split(text, ' ')), 6) AS mean_tok_len
      |FROM documents""".stripMargin

  /** q32: marker-token language-ID heuristic. */
  def q32LangId(spark: SparkSession, sfDir: String): DataFrame =
    TextOps.langId(Tables.load(spark, sfDir, "documents"))
      .select(col("doc_id"), col("pred_lang"), col("best_score").cast("long").as("best_score"))

  // lang-ID SQL fragments shared by q32, q60, q153 and q154. The CTE and
  // the argmax are parameterized (source text expression, column
  // qualifier) so the dual-annotator evals can score the same doc twice.
  private def langScoreCteFor(cteName: String, textExpr: String): String = {
    val score = TextOps.LangMarkers.map { case (name, markers) =>
      val set = markers.map(m => s"'$m'").mkString(", ")
      s"len(list_filter(string_split($textExpr, ' '), t -> t IN ($set))) AS score_$name"
    }.mkString(",\n  ")
    s"$cteName AS (SELECT doc_id,\n  $score\nFROM documents)"
  }
  private def langPredSqlFor(q: String): String = {
    val names = TextOps.LangMarkers.map(_._1)
    names.zipWithIndex.init.foldRight(s"'${names.last}'") { case ((name, i), rest) =>
      val cond = names.drop(i + 1).map(o => s"${q}score_$name >= ${q}score_$o")
        .mkString(" AND ")
      s"CASE WHEN $cond THEN '$name' ELSE $rest END"
    }
  }
  private val langScoreCte: String = langScoreCteFor("langscore", "text")
  private val langPredSql: String = langPredSqlFor("")

  val q32Sql: String = {
    val great = TextOps.LangMarkers.map(n => s"score_${n._1}").mkString(", ")
    s"""WITH $langScoreCte
       |SELECT doc_id, $langPredSql AS pred_lang, GREATEST($great) AS best_score
       |FROM langscore""".stripMargin
  }

  /** q33: rolling-hash document fingerprint (exact integer arithmetic). */
  def q33Fingerprint(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), TextOps.fingerprint("text").as("fp"))

  val q33Sql: String =
    s"""SELECT doc_id,
       |  list_reduce(
       |    list_concat([CAST(0 AS BIGINT)],
       |      list_transform(generate_series(1, length(text)), i -> CAST(unicode(substr(text, i, 1)) AS BIGINT))),
       |    (x, y) -> (x * 31 + y) % $P) AS fp
       |FROM documents""".stripMargin

  /** q34: 32-bit SimHash over distinct token hashes. */
  def q34Simhash(spark: SparkSession, sfDir: String): DataFrame =
    TextOps.simhash(Tables.load(spark, sfDir, "documents"))

  val q34Sql: String = {
    val sums = (0 until 32).map(k =>
      s"SUM(CASE WHEN (h >> $k) & 1 = 1 THEN 1 ELSE -1 END) AS s$k").mkString(",\n    ")
    val bits = (0 until 32).map(k =>
      s"(CASE WHEN s$k > 0 THEN CAST(${1L << k} AS BIGINT) ELSE 0 END)").mkString(" + ")
    s"""WITH tok AS (
       |  SELECT DISTINCT doc_id, ${hashSql.format("tok")} % $P AS h
       |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents) t
       |),
       |s AS (SELECT doc_id,
       |    $sums
       |  FROM tok GROUP BY doc_id)
       |SELECT doc_id, $bits AS simhash FROM s""".stripMargin
  }

  // shared shingle CTE (word 3-grams, distinct md5-prefix hashes)
  private val shingleCte: String =
    s"""shing AS (
       |  SELECT DISTINCT doc_id, ${hashSql.format("sh")} % $P AS h
       |  FROM (
       |    SELECT doc_id,
       |      unnest(list_transform(generate_series(1, greatest(len(toks) - 2, 0)),
       |        i -> array_to_string(toks[i:i+2], ' '))) AS sh
       |    FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents) t0
       |  ) t1
       |)""".stripMargin

  private def sigCte(numHashes: Int): String = {
    val mins = (0 until numHashes).map { j =>
      val a = 1000003L + 7919L * j
      val b = 104729L * j + 12345L
      s"MIN(($a * h + $b) % $P) AS mh$j"
    }.mkString(",\n    ")
    s"""sig AS (SELECT doc_id,
       |    $mins
       |  FROM shing GROUP BY doc_id)""".stripMargin
  }

  private def bandsCte(numHashes: Int, rows: Int): String = {
    val bands = (0 until numHashes / rows).map { b =>
      val cols = (0 until rows).map(r => s"mh${b * rows + r}::VARCHAR").mkString(" || ':' || ")
      s"SELECT doc_id, $b AS band_id, md5($cols) AS band_hash FROM sig"
    }
    s"bands AS (\n  ${bands.mkString("\n  UNION ALL\n  ")}\n)"
  }

  private val candCte: String =
    """cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM bands a JOIN bands b
      |    ON a.band_id = b.band_id AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
      |)""".stripMargin

  // q35/q36 share their common computation per (session, sfDir), persisted
  // — the shared-Scharr pattern that won 5× in the gradients family:
  //  - the (doc, shingle-hash) table: the explode+distinct both the MinHash
  //    signatures (q35) AND the exact-Jaccard join (q36) scan;
  //  - the candidate-pair set: q36 scores exactly q35's output pairs.
  // consumer sets for CacheLife release: every query reading the cache
  // directly or through a helper (q64 reaches jaccard via q56, q74 via
  // q64, q65 reads the shingle hashes straight). q93 and q184 read
  // jaccard THROUGH q59's ConnectedComponents pass, which materializes
  // driver-side (iterative localCheckpoint / small-graph collect) — so
  // their analyzed plans carry NO InMemoryRelation lineage back to the
  // cache and CacheLifeSpec's plan-based audit cannot see the read; they
  // must be declared BY HAND here. Missing them cost q93 a full
  // shingle→jaccard rebuild per bench run (r15: 5.5 s first rep, in_mb 0).
  private val JacConsumers: Set[String] = Set("q36_jaccard",
    "q56_dedup_decision", "q59_neardup_clusters", "q64_curation_decision",
    "q74_curation_funnel", "q93_cluster_pick", "q172_dedup_sweep",
    "q184_leakage_safe_folds")
  private val CandConsumers: Set[String] =
    JacConsumers ++ Set("q35_minhash_pairs", "q129_containment")
  private val ShConsumers: Set[String] =
    CandConsumers ++ Set("q65_decontaminate", "q147_prefix_join")

  private def sharedShingleHashes(spark: SparkSession, sfDir: String): DataFrame =
    graft.core.CacheLife.shared(spark, sfDir, "shingle_hashes", ShConsumers)(
      TextOps.shingleHashes(Tables.load(spark, sfDir, "documents")))

  private def sharedCandidatePairs(spark: SparkSession, sfDir: String): DataFrame =
    graft.core.CacheLife.shared(spark, sfDir, "lsh_candidates", CandConsumers)(
      TextOps.lshCandidatePairs(
        TextOps.minhashFromHashes(sharedShingleHashes(spark, sfDir))))

  // the exact-Jaccard scores over the shared candidates — q36 reports them,
  // q56 and q59 threshold them at 0.8; pair-count-sized, so persisting is
  // cheap and saves the shuffle-heavy confirm join twice per session
  private def sharedJaccard(spark: SparkSession, sfDir: String): DataFrame =
    graft.core.CacheLife.shared(spark, sfDir, "jaccard", JacConsumers)(
      TextOps.jaccardFromHashes(sharedShingleHashes(spark, sfDir),
        sharedCandidatePairs(spark, sfDir)))

  /** q35: MinHash+LSH near-duplicate candidate pairs. */
  def q35MinhashPairs(spark: SparkSession, sfDir: String): DataFrame =
    sharedCandidatePairs(spark, sfDir)

  val q35Sql: String =
    s"""WITH $shingleCte,
       |${sigCte(16)},
       |${bandsCte(16, 4)},
       |$candCte
       |SELECT doc_a, doc_b FROM cand""".stripMargin

  /** q36: exact n-gram Jaccard over the (shared, persisted) shingle table
    * and LSH candidate pairs — only the candidate-bounded equi-join and
    * per-doc size aggregation run here. */
  def q36Jaccard(spark: SparkSession, sfDir: String): DataFrame =
    sharedJaccard(spark, sfDir)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))

  val q36Sql: String =
    s"""WITH $shingleCte,
       |${sigCte(16)},
       |${bandsCte(16, 4)},
       |$candCte,
       |sizes AS (SELECT doc_id, COUNT(1) AS n_sh FROM shing GROUP BY doc_id),
       |common AS (
       |  SELECT c.doc_a, c.doc_b, COUNT(1) AS n_common
       |  FROM cand c
       |  JOIN shing sa ON sa.doc_id = c.doc_a
       |  JOIN shing sb ON sb.doc_id = c.doc_b AND sa.h = sb.h
       |  GROUP BY c.doc_a, c.doc_b
       |)
       |SELECT m.doc_a, m.doc_b,
       |       ROUND(m.n_common / (na.n_sh + nb.n_sh - m.n_common), 6) AS jaccard
       |FROM common m
       |JOIN sizes na ON na.doc_id = m.doc_a
       |JOIN sizes nb ON nb.doc_id = m.doc_b""".stripMargin

  /** q129: Broder containment over the shared candidate pairs — the
    * asymmetric companion to q36's Jaccard (a short doc quoted inside a
    * long one scores containment ≈ 1 on the short side while Jaccard
    * stays low). Reuses the session's persisted shingle table and LSH
    * candidates; only the candidate-bounded joins run here.
    */
  def q129Containment(spark: SparkSession, sfDir: String): DataFrame =
    TextOps.containmentFromHashes(sharedShingleHashes(spark, sfDir),
      sharedCandidatePairs(spark, sfDir))

  val q129Sql: String =
    s"""WITH $shingleCte,
       |${sigCte(16)},
       |${bandsCte(16, 4)},
       |$candCte,
       |sizes AS (SELECT doc_id, COUNT(1) AS n_sh FROM shing GROUP BY doc_id),
       |common AS (
       |  SELECT c.doc_a, c.doc_b, COUNT(1) AS n_common
       |  FROM cand c
       |  JOIN shing sa ON sa.doc_id = c.doc_a
       |  JOIN shing sb ON sb.doc_id = c.doc_b AND sa.h = sb.h
       |  GROUP BY c.doc_a, c.doc_b
       |)
       |SELECT m.doc_a, m.doc_b, m.n_common, na.n_sh AS n_a, nb.n_sh AS n_b,
       |       ROUND(CAST(m.n_common AS DOUBLE) / na.n_sh, 6) AS cont_a,
       |       ROUND(CAST(m.n_common AS DOUBLE) / nb.n_sh, 6) AS cont_b
       |FROM common m
       |JOIN sizes na ON na.doc_id = m.doc_a
       |JOIN sizes nb ON nb.doc_id = m.doc_b""".stripMargin

  // DuckDB left-fold dot product over double-cast list elements
  private def dotSql(a: String, b: String): String =
    s"""list_reduce(list_concat([CAST(0 AS DOUBLE)],
       |  list_transform(generate_series(1, len($a)), i -> $a[i]::DOUBLE * $b[i]::DOUBLE)),
       |  (x, y) -> x + y)""".stripMargin

  /** q38: brute-force cosine top-5 for the first 10 query vectors. */
  def q38AnnTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.load(spark, sfDir, "embeddings")
    Similarity.cosineTopK(emb, emb.filter(col("vec_id") < 10), k = 5)
      .select(col("query_id"), col("neighbor_id"), col("cos_sim"), col("rank"))
  }

  /** q193: PCA projection of the embedding corpus onto its top-4
    * principal axes (`Similarity.pcaProject`) — the decorrelating
    * rotation that precedes PQ/IVF codebook training (Faiss's PCAR/OPQ
    * role). The Gramian is ONE map-side-combinable d²-cell pass, the
    * eigensolve is a bounded d×d driver-side Jacobi, and the projection
    * is folded-literal column math (no join, no UDF). The EIGENSOLVE has
    * no DuckDB twin, but the projection does: the fitted mean/components
    * are stashed while the query runs and interpolated into the oracle as
    * literals (the q141 integer-DCT pattern), so the centered dot
    * product, null handling, rounding and ordering are all hash-verified;
    * only the eigensolve itself stays spec-gated (SimilaritySpec: planted
    * covariance closed form, eigen residuals, orthonormality, projection
    * equivalence).
    */
  def q193PcaProject(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.load(spark, sfDir, "embeddings")
    // fit first (memoized — pcaProject below hits the same memo key) so
    // the dynamic oracle can replay the projection with these literals
    val (mean, _, comps) = Similarity.pcaComponents(emb, k = 4)
    q193Fitted.put(sfDir, (mean, comps))
    Similarity.pcaProject(emb, k = 4)
  }

  // the fits q193 ran with, KEYED BY sfDir (ADVICE r15 on q204 — the
  // single-Option memo class yields a wrong oracle if one Verify JVM
  // replays multiple sfDirs); read by the dynamic oracle AFTER Verify
  // has executed every query
  private val q193Fitted = scala.collection.concurrent.TrieMap
    .empty[String, (Array[Double], Array[Array[Double]])]

  /** Data-dependent q193 oracle: replay the folded-literal projection in
    * DuckDB with the SAME [[Similarity.projectionTerms]] text as the Spark
    * plan — 1-based list access, identical double literals, identical
    * left-to-right summation, same ROUND(..., 6). None until the query has
    * run, or if it ran against more than one sfDir in this JVM (the driver
    * then falls back to the rows-only check). */
  def q193Oracle: Option[String] = (q193Fitted.toMap match {
    case m if m.size == 1 => Some(m.head._2)
    case _ => None
  }).map { case (mean, comps) =>
    val pcs = comps.zipWithIndex.map { case (c, j) =>
      s"ROUND(${Similarity.projectionTerms(mean, c, i => s"embedding[${i + 1}]")}, 6) AS pc${j + 1}"
    }
    s"SELECT vec_id, ${pcs.mkString(", ")} FROM embeddings"
  }

  /** q194: k-means cluster assignment report — the offline quantizer
    * training path (k-means|| seeding, Bahmani et al. 2012, + two Lloyd
    * passes, both pure DataFrame ops) exposed end-to-end: every embedding
    * gets its cluster and true squared distance. The fitted centroids fold
    * into ONE codegen'd argmin expression as literals (map-side, no join,
    * no shuffle — the assignment you'd run over 100 TB once the k-row
    * centroid table is trained) AND into the DuckDB oracle via the
    * dynamic-oracle channel (the q193 pattern) — so the distance
    * arithmetic, smallest-index tie policy, and rounding are all
    * hash-verified; the training itself is spec-gated (TextSpec planted
    * clusters, kmeans|| seeding quality).
    */
  def q194KmeansAssign(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.load(spark, sfDir, "embeddings")
    // bounded collect: k centroid vectors (re-indexed 0..k-1 in cent_id
    // order — the ids the seeding picked are arbitrary corpus ids).
    // Memoized data-aware (the pcaMemo contract): bench reps and plan
    // audits re-invoke the query fn, and the ~10 training jobs dwarf the
    // assignment itself
    val cents = Similarity.memoFit(emb, "kmeans||3rounds|lloyd2|k=8|embedding") {
      val init = Similarity.kmeansParallelInit(emb, k = 8, rounds = 3)
      // BOUND: k = 8 centroid rows
      Similarity.lloydRefine(emb, init, iters = 2)
        .orderBy(col("cent_id")).collect()
        .map(_.getSeq[Double](1).toArray)
    }
    q194Fitted.put(sfDir, cents)
    val d = cents.head.length
    val sel = q194SelectParts(cents, d, i => s"embedding[$i]")
    emb.select(col("vec_id") +: sel._1.map { case (t, n) => expr(t).as(n) }: _*)
      .select(col("vec_id"), expr(sel._2).as("cent_id"), expr(sel._3).as("d2"))
  }

  // the fits q194 ran with, keyed by sfDir (the q193Fitted contract)
  private val q194Fitted =
    scala.collection.concurrent.TrieMap.empty[String, Array[Array[Double]]]

  /** Shared q194 select fragments from the fitted centroids: per-centroid
    * relative-distance columns d0..dk-1 plus ||v||² as vv, the
    * smallest-index argmin CASE, and the rounded true distance — one text,
    * two engines ([[Similarity.centroidDistTerms]] contract). */
  private def q194SelectParts(cents: Array[Array[Double]], d: Int,
      idx: Int => String): (Seq[(String, String)], String, String) = {
    val k = cents.length
    val defs = cents.zipWithIndex.map { case (c, j) =>
      (Similarity.centroidDistTerms(c, idx), s"d$j")
    }.toSeq :+ ((Similarity.vnorm2Terms(d, idx), "vv"))
    val whens = (0 until k - 1).map { j =>
      val rest = (j + 1 until k).map(i => s"d$i").mkString(", ")
      val least = if (j + 1 == k - 1) rest else s"LEAST($rest)"
      s"WHEN d$j <= $least THEN $j"
    }.mkString(" ")
    val allD = (0 until k).map(i => s"d$i").mkString(", ")
    (defs,
      s"CAST(CASE $whens ELSE ${k - 1} END AS INT)",
      s"ROUND(vv + LEAST($allD), 6)")
  }

  /** Data-dependent q194 oracle (the q193 pattern): replay the folded-
    * literal argmin in DuckDB — 1-based list access, identical double
    * literals and association, identical LEAST/CASE tie policy. */
  def q194Oracle: Option[String] = (q194Fitted.toMap match {
    case m if m.size == 1 => Some(m.head._2)
    case _ => None
  }).map { cents =>
    val d = cents.head.length
    val (defs, centSql, d2Sql) = q194SelectParts(cents, d, i => s"embedding[${i + 1}]")
    val defsSql = defs.map { case (t, n) => s"$t AS $n" }.mkString(", ")
    s"""WITH s AS (SELECT vec_id, $defsSql FROM embeddings)
       |SELECT vec_id, $centSql AS cent_id, $d2Sql AS d2 FROM s""".stripMargin
  }

  /** q195: token-budget curation (`TextOps.budgetSelect`) — keep the
    * lexically richest documents (type-token ratio, the q57 Gopher signal
    * through the same codegen'd `gopher_signals` kernel) until a hard
    * 100k-character budget is spent: the greedy best-score prefix, exact
    * inclusive running cost, ties (score, doc_id). Two-phase: only the
    * ≤257-row bucket-total table crosses SinglePartition; the corpus sees
    * per-bucket windows only. The oracle replays the full global-order
    * window relationally (fine at oracle scale; the two-phase form is the
    * point at 100 TB).
    */
  val BudgetChars = 100000L

  def q195BudgetSelect(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val prepared = docs.select(col("doc_id"), col("n_chars"),
      call_function("gopher_signals", col("text")).as("__sig"))
    val scored = prepared.select(col("doc_id"), col("n_chars"),
      round(col("__sig.n_distinct").cast("double") / col("__sig.n_words"), 6)
        .as("ttr"))
    TextOps.budgetSelect(scored, "ttr", "n_chars", BudgetChars)
  }

  val q195Sql: String =
    s"""WITH sig AS (
       |  SELECT doc_id, n_chars,
       |    ROUND(len(list_distinct(string_split(text, ' ')))::DOUBLE
       |          / len(string_split(text, ' ')), 6) AS ttr
       |  FROM documents
       |)
       |SELECT doc_id, ttr, CAST(n_chars AS BIGINT) AS n_chars,
       |  CAST(SUM(n_chars) OVER (ORDER BY ttr DESC, doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cost,
       |  CAST(SUM(n_chars) OVER (ORDER BY ttr DESC, doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |    <= $BudgetChars AS keep
       |FROM sig""".stripMargin

  /** q160: hard-negative mining (`Similarity.hardNegatives`) — the
    * contrastive-training prep: per query vector, the 5 most-similar
    * DIFFERENT-label vectors (the negatives the model confuses). q38's
    * audited broadcast scan with the label-mismatch predicate riding the
    * join; oracle replays the same fold-ordered dot and filter.
    */
  def q160HardNegatives(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.load(spark, sfDir, "embeddings")
    Similarity.hardNegatives(emb, emb.filter(col("vec_id") < 10), k = 5)
      .select(col("query_id"), col("query_label"), col("neighbor_id"),
        col("neighbor_label"), col("cos_sim"), col("rank"))
  }

  val q160Sql: String =
    s"""WITH q AS (SELECT vec_id AS query_id, label AS query_label, embedding AS qv
       |           FROM embeddings WHERE vec_id < 10),
       |scored AS (
       |  SELECT q.query_id, q.query_label, e.vec_id AS neighbor_id,
       |    e.label AS neighbor_label,
       |    ROUND(${dotSql("q.qv", "e.embedding")}
       |      / (SQRT(${dotSql("q.qv", "q.qv")}) * SQRT(${dotSql("e.embedding", "e.embedding")})), 6) AS cos_sim
       |  FROM embeddings e CROSS JOIN q
       |  WHERE e.label <> q.query_label
       |)
       |SELECT query_id, query_label, neighbor_id, neighbor_label, cos_sim,
       |  CAST(rn AS INTEGER) AS rank
       |FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY cos_sim DESC, neighbor_id) AS rn
       |  FROM scored
       |) WHERE rn <= 5""".stripMargin

  val q38Sql: String =
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
       |scored AS (
       |  SELECT q.query_id, e.vec_id AS neighbor_id,
       |    ROUND(${dotSql("q.qv", "e.embedding")}
       |      / (SQRT(${dotSql("q.qv", "q.qv")}) * SQRT(${dotSql("e.embedding", "e.embedding")})), 6) AS cos_sim
       |  FROM embeddings e CROSS JOIN q
       |  WHERE e.vec_id != q.query_id
       |)
       |SELECT query_id, neighbor_id, cos_sim, CAST(rn AS INTEGER) AS rank FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rn
       |  FROM scored
       |) WHERE rn <= 5""".stripMargin

  /** q104: SQ8 scalar-quantized ANN (Similarity.sq8TopK) — the 4×-
    * compressed tier between raw floats and PQ codes (per-dim 8-bit codes
    * trained on corpus ranges). Scoring runs on DEQUANTIZED vectors through
    * the same codegen'd dot_f32 as q38; the oracle replays the scales, the
    * encode clamp, the FLOAT dequantization, and the fold-ordered dot.
    */
  def q104Sq8Ann(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.load(spark, sfDir, "embeddings")
    Similarity.sq8TopK(emb, emb.filter(col("vec_id") < 10), k = 5)
  }

  val q104Sql: String =
    s"""WITH mm AS (
       |  SELECT pos, MIN(v::DOUBLE) AS mn, MAX(v::DOUBLE) AS mx
       |  FROM (SELECT unnest(embedding) AS v,
       |               unnest(generate_series(1, len(embedding))) AS pos
       |        FROM embeddings)
       |  GROUP BY pos
       |),
       |sc AS (SELECT pos, mn,
       |         CASE WHEN mx > mn THEN (mx - mn) / 255e0 ELSE 1e0 END AS w
       |       FROM mm),
       |scl AS (SELECT list(mn ORDER BY pos) AS mnl, list(w ORDER BY pos) AS wl FROM sc),
       |dq AS (
       |  SELECT vec_id AS neighbor_id,
       |    list_transform(generate_series(1, len(embedding)), i ->
       |      CAST(scl.mnl[i]
       |        + CAST(LEAST(255, GREATEST(0,
       |            CAST(round((embedding[i]::DOUBLE - scl.mnl[i]) / scl.wl[i])
       |                 AS BIGINT))) AS DOUBLE) * scl.wl[i]
       |        AS FLOAT)) AS cv
       |  FROM embeddings CROSS JOIN scl
       |),
       |q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
       |scored AS (
       |  SELECT q.query_id, d.neighbor_id,
       |    ROUND(${dotSql("q.qv", "d.cv")}
       |      / (SQRT(${dotSql("q.qv", "q.qv")}) * SQRT(${dotSql("d.cv", "d.cv")})), 6)
       |      AS est_cos
       |  FROM dq d CROSS JOIN q
       |  WHERE d.neighbor_id != q.query_id
       |)
       |SELECT query_id, neighbor_id, est_cos, CAST(rn AS INTEGER) AS rank FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |                               ORDER BY est_cos DESC, neighbor_id) AS rn
       |  FROM scored
       |) WHERE rn <= 5""".stripMargin

  /** q106: positional-index phrase search (operators.Index) — postings
    * built by posexplode, the corpus's top bigram picked deterministically
    * (count desc, then lexicographic), then exact-phrase occurrence counts
    * per document via selective term filters chained on (doc, aligned
    * start-pos) equi-joins. The 1-row top-bigram head() is a bounded
    * driver scalar (same class as the LUT collects).
    */
  def q106PhraseSearch(spark: SparkSession, sfDir: String): DataFrame = {
    // NOT spread: partitioning the postings cache turned the bigram
    // self-join into a 196-task shuffle join (probe A/B 1.60 -> 3.38 s);
    // the 1-partition cache keeps both probes broadcast-local
    val docs = Tables.load(spark, sfDir, "documents")
    val post = graft.core.CacheLife.scoped(Index.positionalPostings(docs).persist())
    val a = post.as("a")
    val b = post.as("b")
    val top = a.join(b,
        col("a.doc_id") === col("b.doc_id") && col("b.pos") === col("a.pos") + 1)
      .groupBy(col("a.term").as("w1"), col("b.term").as("w2"))
      .agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w1"), col("w2")).limit(1).head()
    val (w1, w2) = (top.getString(0), top.getString(1))
    Index.phraseSearch(post, Seq(w1, w2))
      .select(col("doc_id"), lit(w1).as("w1"), lit(w2).as("w2"),
        col("n_occurrences"))
  }

  val q106Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term,
      |         unnest(generate_series(1, len(string_split(text, ' ')))) AS pos
      |  FROM documents
      |),
      |big AS (SELECT a.term AS w1, b.term AS w2, COUNT(1) AS c
      |        FROM toks a JOIN toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
      |        GROUP BY 1, 2),
      |top1 AS (SELECT w1, w2 FROM big ORDER BY c DESC, w1, w2 LIMIT 1),
      |occ AS (SELECT a.doc_id, COUNT(1) AS n_occurrences
      |        FROM toks a
      |        JOIN toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
      |        JOIN top1 t ON a.term = t.w1 AND b.term = t.w2
      |        GROUP BY 1)
      |SELECT occ.doc_id, t.w1, t.w2, occ.n_occurrences
      |FROM occ CROSS JOIN top1 t""".stripMargin

  // Banded-LSH candidate CTEs shared by q37/q39 — mirror of
  // Similarity.bandedCandidates. `np` mirrors autoPlanes (pure integer math
  // — LENGTH(bin(m-1)) is ceil(log2(m)) for m >= 2); `nb` mirrors autoBands
  // as a STATIC CASE table computed in Scala at SQL-build time (no
  // transcendental math in-engine, so no cross-engine libm drift can flip a
  // ceil). Projections are computed dynamically per (band, slot) from the
  // same integer hyperplane family as Similarity.planeComponent, at global
  // plane index band*32 + k (SQL's i is 1-based = Scala's i+1); the
  // division by 1000 happens INSIDE the per-element product's parentheses,
  // matching the Scala x * (r/1000) rounding order.
  private val bandCtes: String = {
    val nbCase = (4 to 32).map(p => s"WHEN $p THEN ${Similarity.autoBands(p)}").mkString(" ")
    val m = "(((i * 2654435761) % 1000003) * ((40503 * (g.band * 32 + g.k + 1)) % 1000003) % 1000003)"
    s"""np AS (
       |  SELECT LEAST(32, GREATEST(4, CASE WHEN m <= 1 THEN 0 ELSE LENGTH(bin(m - 1)) END)) AS p
       |  FROM (SELECT (COUNT(1) + 3) // 4 AS m FROM embeddings)
       |),
       |nb AS (SELECT CASE p $nbCase END AS b FROM np),
       |grid AS (
       |  SELECT band, k
       |  FROM (SELECT unnest(generate_series(0, b - 1)) AS band FROM nb),
       |       (SELECT unnest(generate_series(0, p - 1)) AS k FROM np)
       |),
       |proj AS (
       |  SELECT e.vec_id, g.band, g.k,
       |    list_reduce(list_concat([CAST(0 AS DOUBLE)],
       |      list_transform(generate_series(1, len(e.embedding)),
       |        i -> e.embedding[i]::DOUBLE * ((($m * $m) % 1000003 % 1000 - 500)::DOUBLE / 1000e0))),
       |      (x, y) -> x + y) AS proj
       |  FROM embeddings e, grid g
       |),
       |bb AS (
       |  SELECT vec_id, band,
       |    CAST(SUM(CASE WHEN proj > 0 THEN (CAST(1 AS BIGINT) << k) ELSE 0 END) AS BIGINT) AS bucket
       |  FROM proj GROUP BY vec_id, band
       |),
       |cand AS (
       |  SELECT DISTINCT l.vec_id AS doc_a, r.vec_id AS doc_b
       |  FROM bb l JOIN bb r ON l.band = r.band AND l.bucket = r.bucket AND l.vec_id < r.vec_id
       |)""".stripMargin
  }

  // exact cosine over the deduped candidate pairs (vectors re-joined by id)
  private lazy val scoredCandCte: String =
    s"""scored AS (
       |  SELECT c.doc_a, c.doc_b,
       |    ROUND(${dotSql("a.embedding", "b.embedding")}
       |      / (SQRT(${dotSql("a.embedding", "a.embedding")}) * SQRT(${dotSql("b.embedding", "b.embedding")})), 6) AS cos_sim
       |  FROM cand c
       |  JOIN embeddings a ON a.vec_id = c.doc_a
       |  JOIN embeddings b ON b.vec_id = c.doc_b
       |)""".stripMargin

  /** q39: banded-LSH approximate nearest neighbor (the 100 TB scale path:
    * band equi-join instead of quadratic cross join; per-band plane count
    * from the corpus size for bounded occupancy, band count from the recall
    * target so recall stays flat as planes grow). */
  def q39AnnLsh(spark: SparkSession, sfDir: String): DataFrame =
    Similarity.rpTopK(Tables.load(spark, sfDir, "embeddings"), k = 1,
        n = Some(Tables.rowCount(spark, sfDir, "embeddings")))
      .select(col("query_id"), col("neighbor_id"), col("cos_sim"))

  lazy val q39Sql: String = {
    s"""WITH $bandCtes,
       |$scoredCandCte,
       |directed AS (
       |  SELECT doc_a AS query_id, doc_b AS neighbor_id, cos_sim FROM scored
       |  UNION ALL
       |  SELECT doc_b AS query_id, doc_a AS neighbor_id, cos_sim FROM scored
       |)
       |SELECT query_id, neighbor_id, cos_sim FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rn
       |  FROM directed
       |) WHERE rn <= 1""".stripMargin
  }

  /** q37: embedding-cosine near-duplicate pairs — banded-LSH candidates,
    * cosine ≥ 0.3 (the corpus plants no true dups; max pairwise cosine
    * ≈ 0.51) on the rounded score (threshold applied post-rounding on both
    * sides so the cliff is ULP-safe).
    */
  def q37EmbedNearDup(spark: SparkSession, sfDir: String): DataFrame =
    Similarity.nearDupPairs(Tables.load(spark, sfDir, "embeddings"), threshold = 0.3,
      n = Some(Tables.rowCount(spark, sfDir, "embeddings")))

  lazy val q37Sql: String = {
    s"""WITH $bandCtes,
       |$scoredCandCte
       |SELECT doc_a, doc_b, cos_sim FROM scored WHERE cos_sim >= 3e-1""".stripMargin
  }

  /** q51: IVF-flat ANN — coarse-quantizer inverted lists, nprobe=2 probe,
    * brute-force only inside probed lists (the third ANN tier next to the
    * q38 brute force and q39 LSH; see Similarity.ivfTopK scale anatomy).
    */
  def q51AnnIvf(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.load(spark, sfDir, "embeddings")
    Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 10), k = 5, numCents = 16, nprobe = 2)
      .select(col("query_id"), col("neighbor_id"), col("cos_sim"), col("rank"))
  }

  val q51Sql: String = {
    // nearest-`n` centroids of rel (aliased e) by exact cosine, cent_id tiebreak
    def probeCte(filter: String, n: Int, outId: String): String =
      s"""SELECT $outId, v, cent_id FROM (
         |  SELECT e.vec_id AS $outId, e.embedding AS v, c.cent_id,
         |    ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
         |      ${dotSql("e.embedding", "c.cent_vec")}
         |        / (SQRT(${dotSql("e.embedding", "e.embedding")}) * SQRT(${dotSql("c.cent_vec", "c.cent_vec")})) DESC,
         |      c.cent_id ASC) AS rn
         |  FROM embeddings e CROSS JOIN cents c $filter
         |) WHERE rn <= $n""".stripMargin
    s"""WITH cents AS (
       |  SELECT vec_id AS cent_id, embedding AS cent_vec FROM embeddings
       |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16
       |),
       |lists AS (${probeCte("", 1, "neighbor_id")}),
       |probes AS (${probeCte("WHERE e.vec_id < 10", 2, "query_id")}),
       |scored AS (
       |  SELECT p.query_id, a.neighbor_id,
       |    ROUND(${dotSql("p.v", "a.v")}
       |      / (SQRT(${dotSql("p.v", "p.v")}) * SQRT(${dotSql("a.v", "a.v")})), 6) AS cos_sim
       |  FROM probes p JOIN lists a USING (cent_id)
       |  WHERE p.query_id != a.neighbor_id
       |)
       |SELECT query_id, neighbor_id, cos_sim, CAST(rn AS INTEGER) AS rank FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rn
       |  FROM scored
       |) WHERE rn <= 5""".stripMargin
  }

  /** q52: BPE-style pre-tokenization counts (token counting beyond the
    * whitespace splitter of q31 — the training-data budget estimator).
    */
  def q52TokenBpe(spark: SparkSession, sfDir: String): DataFrame = {
    val bpe = TextOps.bpeTokens(col("text"))
    Tables.load(spark, sfDir, "documents").select(
      col("doc_id"),
      size(bpe).as("n_bpe"),
      size(array_distinct(bpe)).as("n_bpe_unique"),
      size(TextOps.tokens(col("text"))).as("n_ws"),
      // zero-token guard: Spark double/0 and DuckDB double/0 disagree
      // (NULL vs inf) — both sides emit NULL explicitly
      when(size(bpe) > 0,
        round(length(col("text")).cast("double") / size(bpe), 6)).as("chars_per_tok"))
  }

  val q52Sql: String = {
    val pat = "' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+'"
    s"""SELECT doc_id,
       |  CAST(len(regexp_extract_all(text, $pat)) AS INTEGER) AS n_bpe,
       |  CAST(len(list_distinct(regexp_extract_all(text, $pat))) AS INTEGER) AS n_bpe_unique,
       |  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_ws,
       |  CASE WHEN len(regexp_extract_all(text, $pat)) = 0 THEN NULL
       |       ELSE ROUND(CAST(LENGTH(text) AS DOUBLE) / len(regexp_extract_all(text, $pat)), 6)
       |  END AS chars_per_tok
       |FROM documents""".stripMargin
  }

  /** q55: multimodal binary-column pipeline — documents' text re-enters as
    * opaque binary payloads (UTF-8 bytes stand in for media blobs; the
    * decode itself is stubbed per the container constraints, see
    * operators.Multimodal), flows through the partition-kernel feature
    * extractor (byte count + byte-histogram entropy), and carries typed
    * metadata (magic prefix, frame count at 64-byte frames). This is the
    * oracle gate for the multimodal plumbing: schema, batching, map-side
    * execution.
    */
  def q55Multimodal(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import graft.operators.Multimodal
    val docs = Tables.load(spark, sfDir, "documents")
    val media = docs.select(col("doc_id").as("media_id"), lit("text").as("kind"),
        encode(col("text"), "UTF-8").as("payload"), lit(0).as("width"), lit(0).as("height"))
      .as[Multimodal.MediaRow]
    val feats = Multimodal.extractFeatures(media).toDF()
      .select(col("media_id").as("doc_id"), col("n_bytes"),
        // + 0.0 normalizes -0.0 (single-byte/empty docs: -SUM(1·ln1) = -0.0)
        // to +0.0 on both engines — Spark round() and DuckDB ROUND disagree
        // on signed-zero preservation
        (round(col("byte_entropy"), 6) + lit(0.0)).as("entropy"))
    val meta = docs.select(col("doc_id"),
      substring(hex(encode(col("text"), "UTF-8")), 1, 8).as("magic_hex"),
      expr("CAST(octet_length(encode(text, 'UTF-8')) DIV 64 AS BIGINT)").as("n_frames"))
    feats.join(meta, Seq("doc_id"))
  }

  // byte-histogram entropy re-expressed relationally: documents are ASCII
  // (octet_length == length, asserted at fixture build), so per-byte
  // grouping is per-char ascii grouping; term order matches the kernel
  // ((p*ln p)/ln 2, summed then negated)
  val q55Sql: String =
    """WITH pos AS (
      |  SELECT doc_id, text, unnest(generate_series(1, length(text))) AS i FROM documents
      |),
      |hist AS (
      |  SELECT doc_id, ascii(substr(text, CAST(i AS BIGINT), 1)) AS byte, COUNT(1) AS c
      |  FROM pos GROUP BY 1, 2
      |),
      |ent AS (
      |  SELECT h.doc_id,
      |    -SUM((h.c::DOUBLE / length(d.text)) * LN(h.c::DOUBLE / length(d.text)) / LN(2e0)) AS entropy
      |  FROM hist h JOIN documents d USING (doc_id)
      |  GROUP BY h.doc_id
      |)
      |SELECT d.doc_id,
      |  CAST(octet_length(encode(d.text)) AS BIGINT) AS n_bytes,
      |  COALESCE(ROUND(e.entropy, 6), 0e0) + 0e0 AS entropy,
      |  upper(substr(hex(encode(d.text)), 1, 8)) AS magic_hex,
      |  CAST(octet_length(encode(d.text)) // 64 AS BIGINT) AS n_frames
      |FROM documents d LEFT JOIN ent e USING (doc_id)""".stripMargin

  /** q56: the dedup DECISION a training-data pipeline actually executes —
    * every document gets keep/drop flags with reasons, composed from the
    * shared exact-hash groups and near-dup machinery (shingle table +
    * LSH candidates + exact Jaccard, all persisted once per session):
    *  - `is_exact_dup`: not the minimum doc_id of its content-hash group;
    *  - `is_near_dup`: the larger side of any candidate pair with
    *    (rounded) Jaccard ≥ 0.8 — the keep-first-by-id rule, no iterative
    *    connected components needed;
    *  - `keep` = exact-canonical AND not near-dup — the filter column a
    *    100 TB dedup pass would apply.
    */
  def q56DedupDecision(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val exact = TextOps.exactDedup(docs).select(col("doc_id"), col("is_canonical"))
    val drops = sharedJaccard(spark, sfDir)
      .filter(round(col("jaccard"), 6) >= 0.8)
      .select(col("doc_b").as("doc_id")).distinct()
      .withColumn("near_dup", lit(true))
    exact.join(drops, Seq("doc_id"), "left")
      .select(col("doc_id"),
        (!col("is_canonical")).as("is_exact_dup"),
        coalesce(col("near_dup"), lit(false)).as("is_near_dup"),
        (col("is_canonical") && coalesce(!col("near_dup"), lit(true))).as("keep"))
  }

  val q56Sql: String =
    s"""WITH $shingleCte,
       |${sigCte(16)},
       |${bandsCte(16, 4)},
       |$candCte,
       |sizes AS (SELECT doc_id, COUNT(1) AS n_sh FROM shing GROUP BY doc_id),
       |common AS (
       |  SELECT c.doc_a, c.doc_b, COUNT(1) AS n_common
       |  FROM cand c
       |  JOIN shing sa ON sa.doc_id = c.doc_a
       |  JOIN shing sb ON sb.doc_id = c.doc_b AND sa.h = sb.h
       |  GROUP BY c.doc_a, c.doc_b
       |),
       |drops AS (
       |  SELECT DISTINCT m.doc_b AS doc_id
       |  FROM common m
       |  JOIN sizes na ON na.doc_id = m.doc_a
       |  JOIN sizes nb ON nb.doc_id = m.doc_b
       |  WHERE ROUND(m.n_common / (na.n_sh + nb.n_sh - m.n_common), 6) >= 8e-1
       |),
       |h AS (SELECT doc_id, md5(text) AS ch FROM documents),
       |g AS (SELECT ch, MIN(doc_id) AS canon FROM h GROUP BY ch)
       |SELECT h.doc_id,
       |  h.doc_id != g.canon AS is_exact_dup,
       |  d.doc_id IS NOT NULL AS is_near_dup,
       |  (h.doc_id = g.canon AND d.doc_id IS NULL) AS keep
       |FROM h JOIN g USING (ch) LEFT JOIN drops d USING (doc_id)""".stripMargin

  /** q57: Gopher-style quality FILTER decision (Rae et al. 2021 §A1.1) —
    * per-document length/diversity/repetition signals and the composed
    * `keep` column a 100 TB curation pass would apply before training.
    * Pure map-side codegen expressions: zero shuffle at any scale.
    */
  def q57QualityFilter(spark: SparkSession, sfDir: String): DataFrame =
    TextOps.qualityFilter(Tables.load(spark, sfDir, "documents"))
      .select(col("doc_id"), col("n_words").cast("long").as("n_words"),
        col("mean_word_len"), col("ttr"),
        col("n_stop_kinds").cast("long").as("n_stop_kinds"),
        col("top_word_frac"), col("dup_bigram_frac"), col("keep"))

  val q57Sql: String =
    """WITH sig AS (
      |  SELECT doc_id,
      |    len(string_split(text, ' ')) AS n_words,
      |    ROUND((length(text) - (len(string_split(text, ' ')) - 1))::DOUBLE
      |          / len(string_split(text, ' ')), 6) AS mean_word_len,
      |    ROUND(len(list_distinct(string_split(text, ' ')))::DOUBLE
      |          / len(string_split(text, ' ')), 6) AS ttr,
      |    len(list_filter(['the', 'a', 'of', 'and'],
      |        s -> list_contains(string_split(text, ' '), s))) AS n_stop_kinds,
      |    ROUND(list_max(list_transform(list_distinct(string_split(text, ' ')),
      |        w -> len(list_filter(string_split(text, ' '), t -> t = w))))::DOUBLE
      |          / len(string_split(text, ' ')), 6) AS top_word_frac,
      |    CASE WHEN len(string_split(text, ' ')) < 2 THEN 0e0
      |         ELSE ROUND(1.0 - len(list_distinct(list_transform(
      |                range(1, len(string_split(text, ' '))),
      |                i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1])))::DOUBLE
      |              / (len(string_split(text, ' ')) - 1), 6)
      |    END AS dup_bigram_frac
      |  FROM documents
      |)
      |SELECT doc_id, n_words, mean_word_len, ttr, n_stop_kinds,
      |  top_word_frac, dup_bigram_frac,
      |  (n_words BETWEEN 30 AND 100000 AND mean_word_len BETWEEN 3e0 AND 8e0
      |   AND ttr >= 35e-2 AND n_stop_kinds >= 2 AND top_word_frac <= 12e-2
      |   AND dup_bigram_frac <= 5e-2) AS keep
      |FROM sig""".stripMargin

  /** q58: SemDeDup-style semantic dedup decision (Abbas et al. 2023) —
    * IVF-cluster the embeddings (same deterministic md5-order coarse
    * quantizer as q51), then drop the later-id side of within-cluster
    * pairs with cosine ≥ 0.35. The cluster-then-pairwise shape is the
    * 100 TB answer to quadratic semantic dedup.
    */
  def q58SemanticDedup(spark: SparkSession, sfDir: String): DataFrame =
    Similarity.semanticDedup(Tables.load(spark, sfDir, "embeddings"),
        threshold = 0.35, numCents = 16)
      .select(col("vec_id"), col("cent_id"), col("max_prior_cos"),
        col("is_semantic_dup"), col("keep"))

  val q58Sql: String =
    s"""WITH cents AS (
       |  SELECT vec_id AS cent_id, embedding AS cent_vec FROM embeddings
       |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16
       |),
       |assign AS (
       |  SELECT vec_id, v, cent_id FROM (
       |    SELECT e.vec_id, e.embedding AS v, c.cent_id,
       |      ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
       |        ${dotSql("e.embedding", "c.cent_vec")}
       |          / (SQRT(${dotSql("e.embedding", "e.embedding")}) * SQRT(${dotSql("c.cent_vec", "c.cent_vec")})) DESC,
       |        c.cent_id ASC) AS rn
       |    FROM embeddings e CROSS JOIN cents c
       |  ) WHERE rn = 1
       |),
       |prior AS (
       |  SELECT b.vec_id, MAX(ROUND(${dotSql("a.v", "b.v")}
       |    / (SQRT(${dotSql("a.v", "a.v")}) * SQRT(${dotSql("b.v", "b.v")})), 6)) AS max_prior_cos
       |  FROM assign a JOIN assign b ON a.cent_id = b.cent_id AND a.vec_id < b.vec_id
       |  GROUP BY b.vec_id
       |)
       |SELECT s.vec_id, s.cent_id, p.max_prior_cos,
       |  COALESCE(p.max_prior_cos >= 35e-2, false) AS is_semantic_dup,
       |  NOT COALESCE(p.max_prior_cos >= 35e-2, false) AS keep
       |FROM assign s LEFT JOIN prior p USING (vec_id)""".stripMargin

  /** q59: near-dup CLUSTERS — the step after pair detection that a fuzzy
    * dedup pass actually needs: connected components over the jaccard≥0.8
    * pair graph (large-star/small-star, operators.ConnectedComponents),
    * every document labeled with its cluster's minimum doc_id, cluster
    * sizes, and the `is_canonical` keep flag. Oracle: DuckDB recursive CTE
    * computing min reachable id over the same edge set.
    */
  def q59NearDupClusters(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.operators.ConnectedComponents
    val docs = Tables.load(spark, sfDir, "documents").select(col("doc_id"))
    val pairs = sharedJaccard(spark, sfDir)
      .filter(round(col("jaccard"), 6) >= 0.8)
      .select(col("doc_a"), col("doc_b"))
    val cc = ConnectedComponents.run(pairs, "doc_a", "doc_b")
      .withColumnRenamed("node", "doc_id")
    val labeled = docs.join(cc, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("component"), col("doc_id")).as("cluster_id"))
    val sizes = labeled.groupBy(col("cluster_id")).agg(count(lit(1)).as("cluster_size"))
    labeled.join(sizes, "cluster_id")
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"),
        (col("doc_id") === col("cluster_id")).as("is_canonical"))
  }

  /** q93: cluster-representative SELECTION — the step after q59's
    * labeling that a fuzzy dedup pass actually ships: within each
    * near-dup cluster keep the highest-QUALITY member (type-token ratio,
    * the q57 spelling, doc_id tie-break), not blindly the lowest id.
    * The per-cluster argmax is a partitioned row_number window —
    * parallel in the cluster count, never a global sort.
    */
  def q93ClusterPick(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.load(spark, sfDir, "documents")
    val sig = docs.select(col("doc_id"),
      call_function("gopher_signals", col("text")).as("__sig"))
      .select(col("doc_id"),
        round(col("__sig.n_distinct").cast("double") / col("__sig.n_words"), 6)
          .as("quality"))
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(col("quality").desc, col("doc_id"))
    q59NearDupClusters(spark, sfDir)
      .join(sig, "doc_id")
      .withColumn("rn", row_number().over(w))
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"),
        col("quality"), (col("rn") === 1).as("is_kept"))
  }

  // lazy: embeds q59Sql, which is initialized later in source order
  lazy val q93Sql: String =
    s"""WITH cl AS (\n$q59Sql\n),
       |q AS (
       |  SELECT doc_id,
       |    ROUND(len(list_distinct(string_split(text, ' ')))::DOUBLE
       |          / len(string_split(text, ' ')), 6) AS quality
       |  FROM documents
       |),
       |r AS (
       |  SELECT cl.doc_id, cl.cluster_id, cl.cluster_size, q.quality,
       |    row_number() OVER (PARTITION BY cl.cluster_id
       |                       ORDER BY q.quality DESC, cl.doc_id) AS rn
       |  FROM cl JOIN q USING (doc_id)
       |)
       |SELECT doc_id, cluster_id, cluster_size, quality, rn = 1 AS is_kept
       |FROM r""".stripMargin

  val q59Sql: String =
    s"""WITH RECURSIVE $shingleCte,
       |${sigCte(16)},
       |${bandsCte(16, 4)},
       |$candCte,
       |sizes AS (SELECT doc_id, COUNT(1) AS n_sh FROM shing GROUP BY doc_id),
       |common AS (
       |  SELECT c.doc_a, c.doc_b, COUNT(1) AS n_common
       |  FROM cand c
       |  JOIN shing sa ON sa.doc_id = c.doc_a
       |  JOIN shing sb ON sb.doc_id = c.doc_b AND sa.h = sb.h
       |  GROUP BY c.doc_a, c.doc_b
       |),
       |pairs AS (
       |  SELECT m.doc_a, m.doc_b
       |  FROM common m
       |  JOIN sizes na ON na.doc_id = m.doc_a
       |  JOIN sizes nb ON nb.doc_id = m.doc_b
       |  WHERE ROUND(m.n_common / (na.n_sh + nb.n_sh - m.n_common), 6) >= 8e-1
       |),
       |edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION SELECT doc_b, doc_a FROM pairs
       |),
       |reach(v, m) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT e.dst, r.m FROM reach r JOIN edges e ON e.src = r.v
       |),
       |comp AS (SELECT v AS doc_id, MIN(m) AS cluster_id FROM reach GROUP BY v),
       |cs AS (SELECT cluster_id, COUNT(1) AS cluster_size FROM comp GROUP BY cluster_id)
       |SELECT c.doc_id, c.cluster_id, cs.cluster_size,
       |       c.doc_id = c.cluster_id AS is_canonical
       |FROM comp c JOIN cs USING (cluster_id)""".stripMargin

  /** q184: LEAKAGE-SAFE eval folds — the guard q182's per-document folds
    * can't give: near-duplicate documents must never straddle train/eval,
    * or the eval set silently scores memorization. Folds assign per
    * CLUSTER (q59's connected components over the jaccard≥0.8 graph) by
    * an md5 coin on the cluster id — map-side after the labeling, so the
    * assignment adds ZERO shuffles to the cluster pass and stays
    * scale-free (an exact round-robin over clusters would need a global
    * rank; the coin balances in expectation, which is what eval splits
    * need). Every cluster member shares its fold by construction.
    */
  def q184LeakageSafeFolds(spark: SparkSession, sfDir: String): DataFrame =
    q59NearDupClusters(spark, sfDir)
      .select(col("doc_id"), col("cluster_id"),
        pmod(conv(substring(md5(col("cluster_id").cast("string")), 1, 15), 16, 10)
          .cast("long"), lit(5L)).as("fold"))

  lazy val q184Sql: String =
    s"""WITH cl AS (\n$q59Sql\n)
       |SELECT doc_id, cluster_id,
       |  ('0x' || substr(md5(CAST(cluster_id AS VARCHAR)), 1, 15))::BIGINT % 5 AS fold
       |FROM cl""".stripMargin

  /** q187: dataset card — the one-row release summary every published
    * corpus ships (docs, chars, whitespace tokens, source/lang coverage,
    * exact-dup rate, mean length), all integer-exact: counts are BIGINT,
    * rates ride the repo's DECIMAL micro-unit discipline. One
    * map-side-combinable pass plus one md5-groupBy for the dup rate —
    * every number a release reviewer asks for without a notebook.
    */
  def q187DatasetCard(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val dups = docs.groupBy(md5(col("text")).as("__h"))
      .agg(count(lit(1)).as("__c"))
      .agg(sum(col("__c") - 1).as("dup_docs"))
    // plain aggregates and countDistincts in SEPARATE passes: mixing them
    // in one agg evaluates every plain aggregate on the Expand-multiplied
    // rows (the q103 lesson — 3× the scan work for two distincts)
    val plain = docs.agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_chars")).as("total_chars"),
      sum(size(split(col("text"), " "))).cast("long").as("total_tokens"))
    val distincts = docs.agg(
      countDistinct(col("source")).as("n_sources"),
      countDistinct(col("lang")).as("n_langs"))
    val card = plain.crossJoin(broadcast(distincts))
      .select(col("n_docs"), col("total_chars"), col("total_tokens"),
        col("n_sources"), col("n_langs"))
    card.crossJoin(broadcast(dups))
      .withColumn("dup_rate_micro",
        expr("CAST((CAST(dup_docs AS DECIMAL(38,0)) * 1000000) DIV n_docs AS BIGINT)"))
      .withColumn("mean_chars_micro",
        expr("CAST((CAST(total_chars AS DECIMAL(38,0)) * 1000000) DIV n_docs AS BIGINT)"))
  }

  val q187Sql: String =
    """WITH d AS (
      |  SELECT CAST(COUNT(1) AS BIGINT) AS n_docs,
      |    CAST(SUM(n_chars) AS BIGINT) AS total_chars,
      |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
      |    CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
      |    CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
      |  FROM documents
      |),
      |dup AS (
      |  SELECT CAST(SUM(c - 1) AS BIGINT) AS dup_docs
      |  FROM (SELECT COUNT(1) AS c FROM documents GROUP BY md5(text))
      |)
      |SELECT n_docs, total_chars, total_tokens, n_sources, n_langs, dup_docs,
      |  CAST((CAST(dup_docs AS HUGEINT) * 1000000) // n_docs AS BIGINT) AS dup_rate_micro,
      |  CAST((CAST(total_chars AS HUGEINT) * 1000000) // n_docs AS BIGINT) AS mean_chars_micro
      |FROM d, dup""".stripMargin

  /** q189: exact vocabulary-coverage curve (TextOps.vocabCoverage) — the
    * smallest vocab rank covering 50/90/99% of corpus tokens, computed
    * over the Zipf-small FREQUENCY HISTOGRAM instead of a vocab-sized
    * global window (the scale story; see the operator's scaladoc). The
    * oracle replays the bucket arithmetic directly.
    */
  def q189VocabCoverage(spark: SparkSession, sfDir: String): DataFrame =
    TextOps.vocabCoverage(Tables.load(spark, sfDir, "documents"), Seq(50, 90, 99))
      .select(col("pct").cast("long").as("pct"), col("vocab_rank"),
        col("covered_tokens"), col("total_tokens"))

  val q189Sql: String =
    """WITH toks AS (
      |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
      |tc AS (
      |  SELECT tok, COUNT(1) AS cnt FROM toks WHERE length(tok) > 0 GROUP BY tok),
      |hist AS (
      |  SELECT cnt, COUNT(1) AS n_toks, COUNT(1) * cnt AS mass FROM tc GROUP BY cnt),
      |cum AS (
      |  SELECT cnt, n_toks, mass,
      |    COALESCE(SUM(n_toks) OVER
      |      (ORDER BY cnt DESC ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS toks_before,
      |    COALESCE(SUM(mass) OVER
      |      (ORDER BY cnt DESC ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS mass_before
      |  FROM hist),
      |tot AS (SELECT SUM(cnt) AS total_tokens FROM tc)
      |SELECT CAST(p.pct AS BIGINT) AS pct,
      |  CAST(toks_before + ((total_tokens * p.pct + 99) // 100 - mass_before + cnt - 1) // cnt
      |    AS BIGINT) AS vocab_rank,
      |  CAST(mass_before + (((total_tokens * p.pct + 99) // 100 - mass_before + cnt - 1) // cnt) * cnt
      |    AS BIGINT) AS covered_tokens,
      |  CAST(total_tokens AS BIGINT) AS total_tokens
      |FROM cum, tot, (SELECT unnest([50, 90, 99]) AS pct) p
      |WHERE mass_before * 100 < total_tokens * p.pct
      |  AND (mass_before + mass) * 100 >= total_tokens * p.pct""".stripMargin

  /** q190: length-bucketed padding-waste report (TextOps.paddingWaste) —
    * the batch-shape audit before fixing training buckets, exact integer
    * micro-units, one map-side-combinable groupBy.
    */
  def q190PaddingWaste(spark: SparkSession, sfDir: String): DataFrame =
    TextOps.paddingWaste(Tables.load(spark, sfDir, "documents"))
      .select(col("bucket_top").cast("long").as("bucket_top"), col("n_seqs"),
        col("sum_len"), col("pad_tokens"), col("waste_micro"))

  val q190Sql: String = {
    val ladder = Iterator.iterate(1)(_ * 2).takeWhile(_ < 512)
      .map(t => s"WHEN len <= $t THEN $t").mkString("CASE ", " ", " ELSE 512 END")
    s"""WITH lens AS (
       |  SELECT LEAST(len(string_split(text, ' ')), 512) AS len FROM documents),
       |b AS (SELECT $ladder AS bucket_top, len FROM lens)
       |SELECT CAST(bucket_top AS BIGINT) AS bucket_top,
       |  CAST(COUNT(1) AS BIGINT) AS n_seqs,
       |  CAST(SUM(len) AS BIGINT) AS sum_len,
       |  CAST(COUNT(1) * bucket_top - SUM(len) AS BIGINT) AS pad_tokens,
       |  CAST((CAST(COUNT(1) * bucket_top - SUM(len) AS HUGEINT) * 1000000)
       |    // (COUNT(1) * bucket_top) AS BIGINT) AS waste_micro
       |FROM b GROUP BY bucket_top""".stripMargin
  }

  /** Per-language sampling rates for q60 — a domain-mix recipe: downsample
    * the dominant class hard, keep rarer classes at higher rates, keep one
    * entirely (the rate-≥1 path). Quantized to k/256 by the operator. */
  val SampleRates: Seq[(String, Double)] = Seq(
    "scanish" -> 0.25, "queryish" -> 0.5, "windowish" -> 0.75, "rowish" -> 1.0)

  /** q60: deterministic stratified sampling (domain mixing) — every doc is
    * kept/dropped by comparing an md5-prefix coin of its id against its
    * language stratum's rate. Same rows survive on every engine and every
    * re-run; zero shuffle beyond the langId projection.
    */
  def q60StratifiedSample(spark: SparkSession, sfDir: String): DataFrame = {
    val langs = TextOps.langId(Tables.load(spark, sfDir, "documents"))
      .select(col("doc_id"), col("pred_lang"))
    langs.select(col("doc_id"), col("pred_lang"),
      substring(md5(col("doc_id").cast("string")), 1, 2).as("sample_key"),
      TextOps.sampleFlag(col("pred_lang"), col("doc_id"),
        SampleRates.toMap, defaultRate = 0.5).as("keep"))
  }

  val q60Sql: String = {
    val thr = SampleRates.map { case (s, r) =>
      if (r >= 1.0) s"WHEN pred_lang = '$s' THEN TRUE"
      else f"WHEN pred_lang = '$s' THEN sample_key < '${(r * 256).toInt}%02x'"
    }.mkString("\n  ")
    s"""WITH $langScoreCte,
       |k AS (SELECT doc_id, $langPredSql AS pred_lang,
       |        substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS sample_key
       |      FROM langscore)
       |SELECT doc_id, pred_lang, sample_key,
       |  CASE $thr
       |  ELSE sample_key < '80' END AS keep
       |FROM k""".stripMargin
  }

  /** q182: stratified k-fold assignment — the deterministic
    * cross-validation / eval-split layout: within each stratum (source),
    * documents take folds 0..4 round-robin in md5(doc_id)-order, so every
    * fold holds an EXACT ⌈n_s/5⌉/⌊n_s/5⌋ share of each stratum (unlike
    * md5-mod coin flips, which only balance in expectation), the
    * assignment is seedless and replayable by any engine, and adding a
    * stratum never reshuffles another. One hash exchange on the stratum
    * for the rank window.
    */
  def q182StratifiedFolds(spark: SparkSession, sfDir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("source"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"))
      .withColumn("fold", (row_number().over(w) - 1) % 5)
      .withColumn("fold", col("fold").cast("long"))
  }

  val q182Sql: String =
    """WITH r AS (
      |  SELECT doc_id, source,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      |  FROM documents
      |)
      |SELECT doc_id, source, CAST((rn - 1) % 5 AS BIGINT) AS fold FROM r""".stripMargin

  /** q61: sequence PACKING — the layout step that turns a curated corpus
    * into fixed-size training windows: concatenate all documents in id
    * order, split every `seqLen`=2048 tokens, report each document's
    * (seq_id, seq_off) and whether it straddles a window boundary.
    * Implemented as a two-phase distributed prefix scan (range buckets →
    * broadcast offsets → per-bucket local windows); the oracle is the
    * single-sequence SQL definition.
    */
  def q61PackSequences(spark: SparkSession, sfDir: String): DataFrame =
    TextOps.packSequences(Tables.load(spark, sfDir, "documents"), seqLen = 2048)

  val q61Sql: String =
    """WITH t AS (
      |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      |  FROM documents
      |),
      |s AS (
      |  SELECT doc_id, n_tok,
      |    CAST(COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_tok
      |  FROM t
      |)
      |SELECT doc_id, n_tok, start_tok,
      |  start_tok // 2048 AS seq_id,
      |  start_tok % 2048 AS seq_off,
      |  ((start_tok + n_tok - 1) // 2048) != (start_tok // 2048) AS spans_boundary
      |FROM s""".stripMargin

  /** q62: REAL multimodal decode — documents' bytes re-enter as raw 8-bit
    * grayscale frames (16 px wide), are decoded and average-pool resized
    * 4×4 by the partition kernel (operators.Multimodal.decodeGrayPool; no
    * codec library involved, so nothing is stubbed), one row per pooled
    * block. The oracle recomputes every block mean relationally from the
    * same bytes.
    */
  def q62DecodePool(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import graft.operators.Multimodal
    val media = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id").as("media_id"), lit("gray").as("kind"),
        encode(col("text"), "UTF-8").as("payload"), lit(16).as("width"), lit(0).as("height"))
      .as[Multimodal.MediaRow]
    Multimodal.decodeGrayPool(media, width = 16, pool = 4)
      .select(col("media_id").as("doc_id"), col("block_row"), col("block_col"),
        col("mean_val"))
  }

  // documents are ASCII (asserted at fixture build), so byte (r,c) of the
  // 16-wide frame is ascii(char at r*16+c+1); full 4-row bands only
  val q62Sql: String =
    """WITH dims AS (
      |  SELECT doc_id, text,
      |    ((length(text) // 16) - (length(text) // 16) % 4) AS full_h
      |  FROM documents
      |),
      |px AS (
      |  SELECT doc_id,
      |    CAST((i - 1) // 16 AS INTEGER) AS r, CAST((i - 1) % 16 AS INTEGER) AS c,
      |    ascii(substr(text, CAST(i AS BIGINT), 1)) AS v
      |  FROM (SELECT doc_id, text, unnest(generate_series(1, full_h * 16)) AS i FROM dims) t
      |)
      |SELECT doc_id, CAST(r // 4 AS INTEGER) AS block_row,
      |  CAST(c // 4 AS INTEGER) AS block_col, AVG(v) AS mean_val
      |FROM px GROUP BY 1, 2, 3""".stripMargin

  /** q63: product-quantization ANN (ADC) — the fourth ANN tier: 16
    * subspaces × 16 codewords over the 64-dim embeddings, codebook seeded
    * from the same deterministic md5-order sample as q51's coarse
    * quantizer (untrained + unreranked here: the bit-reproducible oracle
    * path; Lloyd training and exact rerank are the spec-gated quality
    * path, like q51's lloydIters). ADC top-5 for the first 10 queries.
    */
  def q63PqAnn(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.load(spark, sfDir, "embeddings")
    Similarity.pqTopK(emb, emb.filter(col("vec_id") < 10), k = 5, m = 16,
        codebookSize = 16)
      .select(col("query_id"), col("neighbor_id"), col("d2_adc"), col("rank"))
  }

  // per-subspace squared-L2 left fold at offset sub*4 (dim 64, m=16):
  // element diffs in double, matching Similarity.l2sqSub bit-for-bit
  private def d2SubSql(a: String, b: String): String =
    s"""list_reduce(list_concat([CAST(0 AS DOUBLE)],
       |  list_transform(generate_series(1, 4), i ->
       |    ($a[c.sub*4 + i]::DOUBLE - $b[c.sub*4 + i]::DOUBLE)
       |    * ($a[c.sub*4 + i]::DOUBLE - $b[c.sub*4 + i]::DOUBLE))),
       |  (x, y) -> x + y)""".stripMargin

  val q63Sql: String =
    s"""WITH cb AS (
       |  SELECT ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS code,
       |         embedding AS cw
       |  FROM embeddings ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16
       |),
       |cw AS (SELECT s.sub, cb.code, cb.cw
       |       FROM cb CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS sub) s),
       |enc AS (
       |  SELECT vec_id, sub, code FROM (
       |    SELECT e.vec_id, c.sub, c.code,
       |      ROW_NUMBER() OVER (PARTITION BY e.vec_id, c.sub
       |        ORDER BY ${d2SubSql("e.embedding", "c.cw")} ASC, c.code ASC) AS rn
       |    FROM embeddings e CROSS JOIN cw c
       |  ) WHERE rn = 1
       |),
       |lut AS (
       |  SELECT q.vec_id AS query_id, c.sub, c.code,
       |    ${d2SubSql("q.embedding", "c.cw")} AS d2
       |  FROM embeddings q CROSS JOIN cw c WHERE q.vec_id < 10
       |),
       |summed AS (
       |  SELECT l.query_id, en.vec_id AS neighbor_id,
       |    ROUND(list_reduce(list_concat([CAST(0 AS DOUBLE)], list(l.d2 ORDER BY l.sub)),
       |      (x, y) -> x + y), 6) AS d2_adc
       |  FROM enc en JOIN lut l ON l.sub = en.sub AND l.code = en.code
       |  WHERE en.vec_id != l.query_id
       |  GROUP BY l.query_id, en.vec_id
       |)
       |SELECT query_id, neighbor_id, d2_adc, CAST(rn AS INTEGER) AS rank FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY d2_adc ASC, neighbor_id ASC) AS rn
       |  FROM summed
       |) WHERE rn <= 5""".stripMargin

  /** q76: TRUE IVFADC — the composed production ANN (Jégou TPAMI 2011
    * §IV): q51's inverted lists × q63's PQ codes. Corpus vectors
    * PQ-encode their RESIDUAL against their nearest of 8 coarse
    * centroids; each of the first 10 queries probes its 2 nearest lists,
    * builds one per-list ADC LUT from its residual in that list's frame,
    * and ADC-scores only those lists' codes. Untrained/unreranked here —
    * the bit-reproducible oracle path; Lloyd + exact rerank are the
    * spec/ScaleBench-gated quality path (same split as q51/q63).
    */
  def q76IvfadcAnn(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.load(spark, sfDir, "embeddings")
    Similarity.ivfadcTopK(emb, emb.filter(col("vec_id") < 10), k = 5,
        numCents = 8, nprobe = 2, m = 16, codebookSize = 16)
      .select(col("query_id"), col("neighbor_id"), col("d2_adc"), col("rank"))
  }

  // full-vector left-fold squared L2 (coarse assignment distance)
  private def d2FullSql(a: String, b: String): String =
    s"""list_reduce(list_concat([CAST(0 AS DOUBLE)],
       |  list_transform(generate_series(1, 64), i ->
       |    ($a[i]::DOUBLE - $b[i]::DOUBLE) * ($a[i]::DOUBLE - $b[i]::DOUBLE))),
       |  (x, y) -> x + y)""".stripMargin

  // per-subspace squared L2 over DOUBLE residual lists at offset sub*4
  private def d2SubResSql(a: String, b: String): String =
    s"""list_reduce(list_concat([CAST(0 AS DOUBLE)],
       |  list_transform(generate_series(1, 4), i ->
       |    ($a[c.sub*4 + i] - $b[c.sub*4 + i]) * ($a[c.sub*4 + i] - $b[c.sub*4 + i]))),
       |  (x, y) -> x + y)""".stripMargin

  // q76's CTE chain through `summed` (ADC candidate distances), shared
  // verbatim by the q138 rerank oracle, which re-ranks a longer ADC
  // shortlist with exact full-vector distances.
  private val q76Ctes: String =
    s"""WITH cents AS (
       |  SELECT ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cent,
       |         embedding AS cv
       |  FROM embeddings ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8
       |),
       |assign AS (
       |  SELECT vec_id, cent, rv FROM (
       |    SELECT e.vec_id, c.cent,
       |      list_transform(generate_series(1, 64), i ->
       |        e.embedding[i]::DOUBLE - c.cv[i]::DOUBLE) AS rv,
       |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${d2FullSql("e.embedding", "c.cv")} ASC, c.cent ASC) AS rn
       |    FROM embeddings e CROSS JOIN cents c
       |  ) WHERE rn = 1
       |),
       |cb AS (
       |  SELECT ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR) || 'cb'), vec_id) - 1 AS code,
       |         rv AS cw
       |  FROM assign ORDER BY md5(CAST(vec_id AS VARCHAR) || 'cb'), vec_id LIMIT 16
       |),
       |cw AS (SELECT s.sub, cb.code, cb.cw
       |       FROM cb CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS sub) s),
       |enc AS (
       |  SELECT vec_id, cent, sub, code FROM (
       |    SELECT a.vec_id, a.cent, c.sub, c.code,
       |      ROW_NUMBER() OVER (PARTITION BY a.vec_id, c.sub
       |        ORDER BY ${d2SubResSql("a.rv", "c.cw")} ASC, c.code ASC) AS rn
       |    FROM assign a CROSS JOIN cw c
       |  ) WHERE rn = 1
       |),
       |probes AS (
       |  SELECT query_id, cent, qrv FROM (
       |    SELECT q.vec_id AS query_id, c.cent,
       |      list_transform(generate_series(1, 64), i ->
       |        q.embedding[i]::DOUBLE - c.cv[i]::DOUBLE) AS qrv,
       |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |        ORDER BY ${dotSql("c.cv", "c.cv")} - 2 * ${dotSql("q.embedding", "c.cv")} ASC,
       |          c.cent ASC) AS rn
       |    FROM embeddings q CROSS JOIN cents c WHERE q.vec_id < 10
       |  ) WHERE rn <= 2
       |),
       |lut AS (
       |  SELECT p.query_id, p.cent, c.sub, c.code,
       |    ${d2SubResSql("p.qrv", "c.cw")} AS d2
       |  FROM probes p CROSS JOIN cw c
       |),
       |summed AS (
       |  SELECT l.query_id, en.vec_id AS neighbor_id,
       |    ROUND(list_reduce(list_concat([CAST(0 AS DOUBLE)], list(l.d2 ORDER BY l.sub)),
       |      (x, y) -> x + y), 6) AS d2_adc
       |  FROM enc en
       |  JOIN lut l ON l.cent = en.cent AND l.sub = en.sub AND l.code = en.code
       |  WHERE en.vec_id != l.query_id
       |  GROUP BY l.query_id, en.vec_id
       |)""".stripMargin

  val q76Sql: String =
    s"""$q76Ctes
       |SELECT query_id, neighbor_id, d2_adc, CAST(rn AS INTEGER) AS rank FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY d2_adc ASC, neighbor_id ASC) AS rn
       |  FROM summed
       |) WHERE rn <= 5""".stripMargin

  /** q138: IVFADC+R — the production refine step (Jégou TPAMI 2011 §VI;
    * faiss `IndexRefineFlat`): q76's ADC pipeline keeps a top-20
    * shortlist per query, which is re-scored with EXACT squared L2 on
    * the full vectors and cut to top-5. The 100 TB shape: the ADC scan
    * still reads only m bytes/vector; the exact pass touches
    * rerank·queries full vectors through a broadcast semi-join against
    * the corpus (vectors re-read map-side, never shuffled). Untrained
    * codebook (lloydIters = 0) keeps every fold left-to-right and the
    * d2_exact identity ||q||² + ||c||² − 2⟨q,c⟩ evaluates the same IEEE
    * sequence as the oracle's `dotSql` folds — bit-reproducible.
    */
  def q138IvfadcRerank(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.load(spark, sfDir, "embeddings")
    Similarity.ivfadcTopK(emb, emb.filter(col("vec_id") < 10), k = 5,
        numCents = 8, nprobe = 2, m = 16, codebookSize = 16, rerank = 20)
      .select(col("query_id"), col("neighbor_id"), col("d2_exact"), col("rank"))
  }

  val q138Sql: String =
    s"""$q76Ctes,
       |short AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY d2_adc ASC, neighbor_id ASC) AS rn
       |    FROM summed
       |  ) WHERE rn <= 20
       |),
       |exact AS (
       |  SELECT s.query_id, s.neighbor_id,
       |    ROUND(${dotSql("q.embedding", "q.embedding")}
       |      + ${dotSql("c.embedding", "c.embedding")}
       |      - 2 * ${dotSql("q.embedding", "c.embedding")}, 6) AS d2_exact
       |  FROM short s
       |  JOIN embeddings q ON q.vec_id = s.query_id
       |  JOIN embeddings c ON c.vec_id = s.neighbor_id
       |)
       |SELECT query_id, neighbor_id, d2_exact, CAST(rn AS INTEGER) AS rank FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY d2_exact ASC, neighbor_id ASC) AS rn
       |  FROM exact
       |) WHERE rn <= 5""".stripMargin

  /** q64: the END-TO-END curation decision — the one column a 100 TB
    * training-data pass actually filters on, composed from the session's
    * shared machinery: exact+near dedup (q56), Gopher quality (q57), the
    * stratified domain mix (q60), eval-split exclusion + decontamination
    * (q65), and cross-doc duplicated spans (q69) — with per-document
    * reason flags. Dedup/span/decontamination need corpus-wide joins
    * anyway; quality and sampling stay map-side; the final composition is
    * a co-partitioned join on doc_id. Eval docs are excluded from
    * training by definition (they ARE the benchmark), so `contaminated`
    * is false for them and `is_eval` carries the reason.
    */
  def q64CurationDecision(spark: SparkSession, sfDir: String): DataFrame =
    sharedCurationDecision(spark, sfDir)

  // the decision frame is the session's most expensive composed read
  // (six signals), and q74 is exactly one conditional aggregation over
  // it — share the persisted frame so the funnel re-reads instead of
  // re-composing (r16 verdict task: q64+q74 paid the compose twice, the
  // 2nd- and 4th-slowest committed queries). Row-per-document payload:
  // MEMORY_AND_DISK, released after q74 (name-sorted run order puts q64
  // first; the subset rule holds for any order).
  private val DecisionConsumers: Set[String] =
    Set("q64_curation_decision", "q74_curation_funnel")

  private def sharedCurationDecision(spark: SparkSession, sfDir: String): DataFrame =
    graft.core.CacheLife.shared(spark, sfDir, "curation_decision",
      DecisionConsumers)(buildCurationDecision(spark, sfDir))

  private def buildCurationDecision(spark: SparkSession, sfDir: String): DataFrame = {
    val dedup = q56DedupDecision(spark, sfDir)
      .select(col("doc_id"), col("is_exact_dup"), col("is_near_dup"))
    val quality = q57QualityFilter(spark, sfDir)
      .select(col("doc_id"), col("keep").as("quality_keep"))
    val sample = q60StratifiedSample(spark, sfDir)
      .select(col("doc_id"), col("sample_key"), col("keep").as("sample_keep"))
    val contam = q65Decontaminate(spark, sfDir)
      .select(col("doc_id"), col("contaminated"))
    val spans = q69DupSpans(spark, sfDir)
      .select(col("doc_id"), col("dup_heavy"))
    dedup.join(quality, "doc_id").join(sample, "doc_id")
      .join(contam, Seq("doc_id"), "left").join(spans, "doc_id")
      .select(col("doc_id"), col("is_exact_dup"), col("is_near_dup"),
        col("quality_keep"), col("sample_keep"),
        (col("doc_id") % 11 === 0).as("is_eval"),
        coalesce(col("contaminated"), lit(false)).as("contaminated"),
        col("dup_heavy"),
        (!col("is_exact_dup") && !col("is_near_dup") &&
          col("quality_keep") && col("sample_keep") &&
          !(col("doc_id") % 11 === 0) &&
          !coalesce(col("contaminated"), lit(false)) &&
          !col("dup_heavy")).as("keep"))
  }

  // lazy: interpolates q65Sql/q69Sql, which are initialized later in this object
  lazy val q64Sql: String =
    s"""SELECT e.doc_id, e.is_exact_dup, e.is_near_dup,
       |  q.keep AS quality_keep, s.keep AS sample_keep,
       |  e.doc_id % 11 = 0 AS is_eval,
       |  COALESCE(c.contaminated, FALSE) AS contaminated,
       |  z.dup_heavy,
       |  (NOT e.is_exact_dup AND NOT e.is_near_dup AND q.keep AND s.keep
       |   AND NOT e.doc_id % 11 = 0 AND NOT COALESCE(c.contaminated, FALSE)
       |   AND NOT z.dup_heavy) AS keep
       |FROM ($q56Sql) e
       |JOIN ($q57Sql) q USING (doc_id)
       |JOIN ($q60Sql) s USING (doc_id)
       |LEFT JOIN ($q65Sql) c USING (doc_id)
       |JOIN ($q69Sql) z USING (doc_id)""".stripMargin

  /** q65: eval-set DECONTAMINATION — hold out every 11th document as the
    * "benchmark" split, flag training docs whose word-3-gram overlap with
    * the eval shingle set reaches 10%. The eval shingle set is broadcast
    * (benchmarks are tiny next to a 100 TB corpus); the train side pays
    * one explode + broadcast join + map-side-combinable groupBy.
    */
  def q65Decontaminate(spark: SparkSession, sfDir: String): DataFrame = {
    // reuse the session-shared shingle hashes (the dominant cost, also paid
    // by q35/q36/q56) instead of re-hashing the corpus
    val sh = sharedShingleHashes(spark, sfDir)
    TextOps.decontaminateFromHashes(
        trainIds = Tables.load(spark, sfDir, "documents")
          .filter(col("doc_id") % 11 =!= 0).select(col("doc_id")),
        trainHashes = sh.filter(col("doc_id") % 11 =!= 0),
        evalHashes = sh.filter(col("doc_id") % 11 === 0)
          .select(col("h")).distinct().withColumn("__hit", lit(1)),
        minFrac = 0.1)
      .select(col("doc_id"), col("n_shingles"), col("n_overlap"),
        col("overlap_frac"), col("contaminated"))
  }

  val q65Sql: String =
    s"""WITH $shingleCte,
       |ev AS (SELECT DISTINCT h FROM shing WHERE doc_id % 11 = 0),
       |tr AS (SELECT doc_id FROM documents WHERE doc_id % 11 != 0),
       |ns AS (SELECT doc_id, COUNT(1) AS n_sh FROM shing
       |       WHERE doc_id % 11 != 0 GROUP BY doc_id),
       |ov AS (SELECT s.doc_id, COUNT(1) AS n_ov FROM shing s JOIN ev USING (h)
       |       WHERE s.doc_id % 11 != 0 GROUP BY s.doc_id)
       |SELECT t.doc_id,
       |  COALESCE(ns.n_sh, 0) AS n_shingles,
       |  COALESCE(ov.n_ov, 0) AS n_overlap,
       |  CASE WHEN COALESCE(ns.n_sh, 0) > 0
       |       THEN ROUND(COALESCE(ov.n_ov, 0)::DOUBLE / ns.n_sh, 6)
       |       ELSE 0e0 END AS overlap_frac,
       |  CASE WHEN COALESCE(ns.n_sh, 0) > 0
       |       THEN ROUND(COALESCE(ov.n_ov, 0)::DOUBLE / ns.n_sh, 6) >= 1e-1
       |       ELSE FALSE END AS contaminated
       |FROM tr t LEFT JOIN ns USING (doc_id) LEFT JOIN ov USING (doc_id)""".stripMargin

  /** Target mixture for q66: equal token budget per language — upsamples
    * the rare languages (rate > 1 ⇒ repeat epochs) and downsamples 'en'. */
  private val MixWeights: Seq[(String, Double)] =
    Seq("en" -> 0.2, "fr" -> 0.2, "de" -> 0.2, "es" -> 0.2, "zh" -> 0.2)

  /** q66: domain-mixture EPOCH WEIGHTING — the upsampling counterpart of
    * q60: per-language repeat counts (fractional epochs, Pile/Llama style)
    * that reshape the corpus to a uniform language mixture. One ≤5-group
    * aggregate + a broadcast rate table; the corpus is never shuffled.
    */
  def q66MixtureEpochs(spark: SparkSession, sfDir: String): DataFrame =
    TextOps.mixtureEpochs(Tables.load(spark, sfDir, "documents"),
      strata = col("lang"), weights = MixWeights.toMap)

  val q66Sql: String = {
    val wcase = MixWeights.map { case (s, w) => s"WHEN lang = '$s' THEN ${w}e0" }
      .mkString(" ")
    s"""WITH cnt AS (SELECT lang, COUNT(1) AS n FROM documents GROUP BY lang),
       |tot AS (SELECT SUM(n) AS total FROM cnt),
       |rates AS (
       |  SELECT lang, (CASE $wcase ELSE 0e0 END) * total / n AS rate
       |  FROM cnt CROSS JOIN tot
       |)
       |SELECT d.doc_id, d.lang AS stratum, ROUND(r.rate, 6) AS rate,
       |  CAST(FLOOR(r.rate) +
       |    CASE WHEN ${hashSql.format("CAST(d.doc_id AS VARCHAR)")}::DOUBLE
       |              / 1152921504606846976e0 < r.rate - FLOOR(r.rate)
       |         THEN 1 ELSE 0 END AS BIGINT) AS n_copies
       |FROM documents d JOIN rates r USING (lang)""".stripMargin
  }

  /** q67: DSIR importance scoring (Xie et al. 2023) — mean log-likelihood
    * ratio of each document's hashed unigrams under the target
    * distribution (lang='en') vs the raw corpus, add-0.5 smoothing over
    * 8192 hash features. Both frequency tables are bounded at 8192 rows ⇒
    * broadcast; per-doc scoring collapses map-side.
    */
  def q67DsirScore(spark: SparkSession, sfDir: String): DataFrame =
    TextOps.dsirScores(Tables.load(spark, sfDir, "documents"),
      isTarget = col("lang") === "en", buckets = 8192, alpha = 0.5)

  val q67Sql: String =
    s"""WITH tok AS (
       |  SELECT doc_id, t, ${hashSql.format("tk")} % 8192 AS b
       |  FROM (SELECT doc_id, lang = 'en' AS t,
       |          unnest(string_split(text, ' ')) AS tk FROM documents)
       |),
       |feat AS (
       |  SELECT b, COUNT(1) AS cr, COUNT(1) FILTER (WHERE t) AS ct
       |  FROM tok GROUP BY b
       |),
       |tots AS (SELECT SUM(cr) AS nr, SUM(ct) AS nt FROM feat),
       |w AS (
       |  SELECT b, ln((ct + 5e-1) / (nt + 5e-1 * 8192)) -
       |            ln((cr + 5e-1) / (nr + 5e-1 * 8192)) AS w
       |  FROM feat CROSS JOIN tots
       |),
       |sc AS (
       |  SELECT t2.doc_id, COUNT(1) AS n_toks,
       |    ROUND(SUM(w.w) / COUNT(1), 6) AS dsir_score
       |  FROM tok t2 JOIN w USING (b) GROUP BY t2.doc_id
       |)
       |SELECT doc_id, n_toks, dsir_score, dsir_score > 0e0 AS is_target_like
       |FROM sc""".stripMargin

  /** q68: deterministic EPOCH SHUFFLE — a reproducible global training
    * order per epoch (rank of md5(epoch:id)), computed as a two-phase
    * distributed rank: 256 md5-prefix range buckets → broadcast offsets →
    * per-bucket local windows. Never a single-partition global window.
    */
  def q68EpochShuffle(spark: SparkSession, sfDir: String): DataFrame =
    TextOps.epochShuffle(Tables.load(spark, sfDir, "documents"), epoch = 1)

  val q68Sql: String =
    """SELECT doc_id,
      |  ROW_NUMBER() OVER (ORDER BY md5('1:' || CAST(doc_id AS VARCHAR)), doc_id)
      |    - 1 AS shuffle_pos
      |FROM documents""".stripMargin

  /** q69: duplicated-SPAN detection (Lee et al. 2021) — 10-token spans
    * occurring in more than one document, and the per-doc fraction of such
    * spans; `dup_heavy` is the RefinedWeb-style drop signal. One span-hash
    * groupBy + a 1:1 flag join, both hash-partitioned on the span hash.
    */
  def q69DupSpans(spark: SparkSession, sfDir: String): DataFrame =
    TextOps.dupSpans(Tables.load(spark, sfDir, "documents"), n = 10, minFrac = 0.5)
      .select(col("doc_id"), col("n_spans"), col("n_dup_spans"),
        col("dup_span_frac"), col("dup_heavy"))

  val q69Sql: String =
    s"""WITH sp AS (
       |  SELECT DISTINCT doc_id, ${hashSql.format("sh")} % $P AS h
       |  FROM (
       |    SELECT doc_id,
       |      unnest(list_transform(generate_series(1, greatest(len(toks) - 9, 0)),
       |        i -> array_to_string(toks[i:i+9], ' '))) AS sh
       |    FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents) t0
       |  ) t1
       |),
       |dup AS (SELECT h FROM sp GROUP BY h HAVING COUNT(1) > 1),
       |per AS (
       |  SELECT s.doc_id, COUNT(1) AS n_spans, COUNT(d.h) AS n_dup
       |  FROM sp s LEFT JOIN dup d USING (h) GROUP BY s.doc_id
       |)
       |SELECT d0.doc_id,
       |  COALESCE(p.n_spans, 0) AS n_spans,
       |  COALESCE(p.n_dup, 0) AS n_dup_spans,
       |  CASE WHEN COALESCE(p.n_spans, 0) > 0
       |       THEN ROUND(COALESCE(p.n_dup, 0)::DOUBLE / p.n_spans, 6)
       |       ELSE 0e0 END AS dup_span_frac,
       |  CASE WHEN COALESCE(p.n_spans, 0) > 0
       |       THEN ROUND(COALESCE(p.n_dup, 0)::DOUBLE / p.n_spans, 6) >= 5e-1
       |       ELSE FALSE END AS dup_heavy
       |FROM documents d0 LEFT JOIN per p USING (doc_id)""".stripMargin

  /** q70: deterministic weighted sampling (A-ES priorities) — keep the 100
    * docs with the largest md5-coin priorities u^(1/n_chars): inclusion
    * odds proportional to length, reproducible everywhere. Plans as
    * TakeOrderedAndProject — per-partition top-k, k-row merge, no global
    * sort. Priorities are rounded for the cross-engine compare; the rank
    * itself uses the raw double (a boundary tie needs two priorities
    * within one ulp — vanishing at any scale).
    */
  def q70WeightedSample(spark: SparkSession, sfDir: String): DataFrame =
    TextOps.weightedSample(Tables.load(spark, sfDir, "documents"),
        weight = col("n_chars"), k = 100)
      .select(col("doc_id"), col("weight"), round(col("priority"), 6).as("priority"))

  val q70Sql: String =
    """SELECT doc_id, CAST(n_chars AS DOUBLE) AS weight,
      |  ROUND(pow(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT::DOUBLE
      |            / 1152921504606846976e0, 1.0 / n_chars), 6) AS priority
      |FROM documents
      |ORDER BY pow(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT::DOUBLE
      |             / 1152921504606846976e0, 1.0 / n_chars) DESC, doc_id
      |LIMIT 100""".stripMargin

  /** q71: length-bucketed batch assignment — 8 near-equal buckets of the
    * global (token count, id) ranking, via the two-phase scan (per-length
    * windows + broadcast offsets; never a single-partition NTILE).
    */
  def q71LengthBuckets(spark: SparkSession, sfDir: String): DataFrame =
    TextOps.lengthBuckets(Tables.load(spark, sfDir, "documents"), nBuckets = 8)

  val q71Sql: String =
    """WITH t AS (
      |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      |  FROM documents
      |),
      |r AS (
      |  SELECT doc_id, n_tok,
      |    ROW_NUMBER() OVER (ORDER BY n_tok, doc_id) - 1 AS rank
      |  FROM t
      |)
      |SELECT doc_id, n_tok, rank,
      |  (rank * 8) // (SELECT COUNT(1) FROM t) AS bucket
      |FROM r""".stripMargin

  /** q72: REAL raw-PCM audio framing — the audio sibling of q62: document
    * bytes as 16-bit LE PCM, 64-sample frames, per-frame RMS + exact
    * integer peak + the silence flag an ASR trimming pass filters on.
    * Pure map-side kernel; payloads never shuffle.
    */
  def q72PcmSilence(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import graft.operators.Multimodal
    val media = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id").as("media_id"), lit("pcm").as("kind"),
        encode(col("text"), "UTF-8").as("payload"), lit(0).as("width"), lit(0).as("height"))
      .as[Multimodal.MediaRow]
    Multimodal.pcmWindowRms(media, frameLen = 64, silenceRms = 25000.0)
      .select(col("media_id").as("doc_id"), col("frame"), col("rms"),
        col("peak"), col("is_silence"))
  }

  // documents are ASCII (high byte < 128), so LE sample i is
  // ascii(char 2i-1) + 256*ascii(char 2i), always positive
  val q72Sql: String =
    """WITH t AS (
      |  SELECT doc_id, text, length(text) // 2 AS n FROM documents
      |),
      |s AS (
      |  SELECT doc_id, CAST((i - 1) // 64 AS INTEGER) AS frame,
      |    ascii(substr(text, 2 * i - 1, 1)) + 256 * ascii(substr(text, 2 * i, 1)) AS v
      |  FROM (SELECT doc_id, text, unnest(generate_series(1, (n // 64) * 64)) AS i FROM t)
      |)
      |SELECT doc_id, frame,
      |  ROUND(sqrt(SUM(CAST(v AS DOUBLE) * v) / 64), 6) AS rms,
      |  CAST(MAX(abs(v)) AS INTEGER) AS peak,
      |  ROUND(sqrt(SUM(CAST(v AS DOUBLE) * v) / 64), 6) < 25e3 AS is_silence
      |FROM s GROUP BY doc_id, frame""".stripMargin

  /** q94: FFT magnitude spectrum per audio frame — the spectral-feature
    * step after q72's framing (bandwidth checks, tone detection, spectral
    * fingerprints): document bytes as 8-bit PCM, 64-sample frames, radix-2
    * FFT per frame (operators.Multimodal.fftSpectrum, O(n log n) partition
    * kernel), bins 0..32 by real-input symmetry. The oracle is the O(n²)
    * DIRECT DFT — an independent spelling of the transform; 8-bit samples
    * keep FFT-vs-DFT float deltas ~1e-10, invisible at 4 decimals.
    */
  def q94FftSpectrum(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import graft.operators.Multimodal
    val media = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id").as("media_id"), lit("pcm8").as("kind"),
        encode(col("text"), "UTF-8").as("payload"), lit(0).as("width"), lit(0).as("height"))
      .as[Multimodal.MediaRow]
    Multimodal.fftSpectrum(media, frameLen = 64)
      .select(col("media_id").as("doc_id"), col("frame"), col("bin"),
        round(col("mag"), 4).as("mag"))
  }

  val q94Sql: String =
    """WITH t AS (
      |  SELECT doc_id, text, length(text) AS n FROM documents
      |),
      |s AS (
      |  SELECT doc_id, CAST((i - 1) // 64 AS INTEGER) AS frame,
      |    CAST((i - 1) % 64 AS INTEGER) AS tpos,
      |    ascii(substr(text, CAST(i AS BIGINT), 1)) AS v
      |  FROM (SELECT doc_id, text, unnest(generate_series(1, (n // 64) * 64)) AS i FROM t)
      |),
      |x AS (
      |  SELECT doc_id, frame, k,
      |    SUM(v * cos(-2 * pi() * k * tpos / 64)) AS re,
      |    SUM(v * sin(-2 * pi() * k * tpos / 64)) AS im
      |  FROM s CROSS JOIN (SELECT unnest(generate_series(0, 32)) AS k) ks
      |  GROUP BY doc_id, frame, k
      |)
      |SELECT doc_id, frame, CAST(k AS INTEGER) AS bin,
      |  ROUND(sqrt(re * re + im * im), 4) AS mag
      |FROM x""".stripMargin

  /** q73: perceptual dHash dedup over the REAL grayscale decode — each
    * doc's 16-wide byte frame pools to 4×4 blocks, adjacent-block gradient
    * signs over the first 8 block rows form a 24-bit difference hash, and
    * exact hash groups mark perceptual duplicates (tail edits beyond the
    * hashed region keep the same hash, so this groups near-dups that
    * byte-exact dedup misses).
    */
  def q73ImageDhash(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import graft.operators.Multimodal
    val media = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id").as("media_id"), lit("gray").as("kind"),
        encode(col("text"), "UTF-8").as("payload"), lit(16).as("width"), lit(0).as("height"))
      .as[Multimodal.MediaRow]
    val h = Multimodal.dHash(media, width = 16, pool = 4)
      .select(col("media_id").as("doc_id"), col("dhash"))
    val g = h.groupBy(col("dhash"))
      .agg(min(col("doc_id")).as("__canon"), count(lit(1)).as("n_copies"))
    h.join(g, "dhash")
      .select(col("doc_id"), col("dhash"),
        (col("doc_id") === col("__canon")).as("is_canonical"), col("n_copies"))
  }

  val q73Sql: String =
    """WITH dims AS (
      |  SELECT doc_id, text,
      |    ((length(text) // 16) - (length(text) // 16) % 4) AS full_h
      |  FROM documents
      |),
      |px AS (
      |  SELECT doc_id,
      |    CAST((i - 1) // 16 AS INTEGER) AS r, CAST((i - 1) % 16 AS INTEGER) AS c,
      |    ascii(substr(text, CAST(i AS BIGINT), 1)) AS v
      |  FROM (SELECT doc_id, text, unnest(generate_series(1, full_h * 16)) AS i FROM dims) t
      |),
      |blk AS (
      |  SELECT doc_id, r // 4 AS br, c // 4 AS bc, AVG(v) AS m
      |  FROM px WHERE r // 4 < 8 GROUP BY 1, 2, 3
      |),
      |bits AS (
      |  SELECT a.doc_id,
      |    CASE WHEN a.m > b.m THEN 1::BIGINT << (a.br * 3 + a.bc)
      |         ELSE 0::BIGINT END AS bit
      |  FROM blk a JOIN blk b
      |    ON a.doc_id = b.doc_id AND a.br = b.br AND b.bc = a.bc + 1
      |),
      |h AS (SELECT doc_id, CAST(SUM(bit) AS BIGINT) AS dhash FROM bits GROUP BY doc_id),
      |g AS (SELECT dhash, MIN(doc_id) AS canon, COUNT(1) AS n_copies FROM h GROUP BY dhash)
      |SELECT h.doc_id, h.dhash, h.doc_id = g.canon AS is_canonical, g.n_copies
      |FROM h JOIN g USING (dhash)""".stripMargin

  /** q141: DCT perceptual hash (pHash) groups — the global-structure
    * sibling of q73's local-gradient dHash: each document renders as a
    * tiled 32×32 gray image and hashes through the FIXED-POINT integer
    * DCT ([[graft.operators.Multimodal.pHash64]]) — separable integer
    * DCT-II on the 8 lowest frequencies, 63 AC coefficients vs their
    * median, all exact Long math. The oracle replays the same matrix
    * products relationally against the SAME interpolated cosine table,
    * so the hash is bit-reproducible. The kernel is map-side; the only
    * shuffle is the hash-group aggregate.
    */
  def q141Phash(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import graft.operators.Multimodal
    val media = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val b = text.getBytes("UTF-8")
        Multimodal.MediaRow(id, "gray",
          Array.tabulate(1024)(i => b(i % b.length)), 32, 32)
      }
    val h = Multimodal.pHash64(media)
      .select(col("media_id").as("doc_id"), col("phash"))
    val g = h.groupBy(col("phash"))
      .agg(min(col("doc_id")).as("__canon"), count(lit(1)).as("n_copies"))
    h.join(g, "phash")
      .select(col("doc_id"), col("phash"),
        (col("doc_id") === col("__canon")).as("is_canonical"), col("n_copies"))
  }

  val q141Sql: String = {
    val ctVals = (for (k <- 0 until 8; n <- 0 until 32)
      yield s"($k, $n, ${graft.operators.Multimodal.PHashDctTable(k)(n)})")
      .mkString(", ")
    s"""WITH ct(k, n, w) AS (VALUES $ctVals),
       |px AS (
       |  SELECT doc_id,
       |    CAST((i - 1) // 32 AS INTEGER) AS y, CAST((i - 1) % 32 AS INTEGER) AS x,
       |    ascii(substr(text, CAST((i - 1) % length(text) + 1 AS BIGINT), 1)) AS v
       |  FROM documents CROSS JOIN (SELECT unnest(generate_series(1, 1024)) AS i) ii
       |),
       |s1 AS (
       |  SELECT px.doc_id, ct.k AS u, px.x, SUM(ct.w * px.v) AS s
       |  FROM px JOIN ct ON ct.n = px.y GROUP BY 1, 2, 3
       |),
       |s2 AS (
       |  SELECT s1.doc_id, s1.u, ct.k AS vf, SUM(ct.w * s1.s) AS s
       |  FROM s1 JOIN ct ON ct.n = s1.x GROUP BY 1, 2, 3
       |),
       |ac AS (SELECT doc_id, u, vf, s FROM s2 WHERE NOT (u = 0 AND vf = 0)),
       |med AS (
       |  SELECT doc_id, s AS med FROM (
       |    SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY s, u, vf) AS rn
       |    FROM ac
       |  ) WHERE rn = 32
       |),
       |h AS (
       |  SELECT ac.doc_id, CAST(SUM(CASE WHEN ac.s > med.med
       |    THEN 1::BIGINT << (ac.u * 8 + ac.vf - 1) ELSE 0::BIGINT END) AS BIGINT) AS phash
       |  FROM ac JOIN med USING (doc_id) GROUP BY 1
       |),
       |g AS (SELECT phash, MIN(doc_id) AS canon, COUNT(1) AS n_copies FROM h GROUP BY phash)
       |SELECT h.doc_id, h.phash, h.doc_id = g.canon AS is_canonical,
       |  g.n_copies
       |FROM h JOIN g USING (phash)""".stripMargin
  }

  /** q74: the curation FUNNEL — per-reason drop counts over the composed
    * q64 decision, attributing each document to its FIRST drop reason in
    * precedence order (the report every production curation pass emits).
    * One conditional aggregation over the decision table.
    */
  def q74CurationFunnel(spark: SparkSession, sfDir: String): DataFrame = {
    val reason = when(col("doc_id") % 11 === 0, "eval_holdout")
      .when(col("is_exact_dup"), "exact_dup")
      .when(col("is_near_dup"), "near_dup")
      .when(col("contaminated"), "contaminated")
      .when(col("dup_heavy"), "dup_spans")
      .when(!col("quality_keep"), "low_quality")
      .when(!col("sample_keep"), "downsampled")
      .otherwise("kept")
    sharedCurationDecision(spark, sfDir)
      .groupBy(reason.as("reason"))
      .agg(count(lit(1)).as("n_docs"))
  }

  lazy val q74Sql: String =
    s"""SELECT CASE
       |    WHEN doc_id % 11 = 0 THEN 'eval_holdout'
       |    WHEN is_exact_dup THEN 'exact_dup'
       |    WHEN is_near_dup THEN 'near_dup'
       |    WHEN contaminated THEN 'contaminated'
       |    WHEN dup_heavy THEN 'dup_spans'
       |    WHEN NOT quality_keep THEN 'low_quality'
       |    WHEN NOT sample_keep THEN 'downsampled'
       |    ELSE 'kept' END AS reason,
       |  COUNT(1) AS n_docs
       |FROM ($q64Sql)
       |GROUP BY 1""".stripMargin

  /** q75: REAL compressed-codec round trip — documents' bytes become 8-bit
    * grayscale frames (16 px wide, like q62), are PNG-ENCODED (zlib
    * deflate, scanline filters cycling all five spec types) and decoded
    * back by the from-scratch spec reader (sources.Png: chunk walk,
    * inflate, unfilter), then average-pool resized. The oracle recomputes
    * every block mean relationally from the TEXT — the query is green only
    * if encode → decode is the identity on every document, so the whole
    * codec path (both directions) is driver-gated, not just spec-gated.
    * Two chained map-side kernels: payloads never shuffle at any scale.
    */
  def q75PngRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import graft.operators.Multimodal
    val media = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id").as("media_id"), lit("gray").as("kind"),
        encode(col("text"), "UTF-8").as("payload"), lit(16).as("width"), lit(0).as("height"))
      .as[Multimodal.MediaRow]
    Multimodal.decodePngGrayPool(Multimodal.pngEncode(media, width = 16), pool = 4)
      .select(col("media_id").as("doc_id"), col("block_row"), col("block_col"),
        col("mean_val"))
  }

  // identical oracle to q62: the PNG encode→decode must be byte-identity,
  // so the expected block means are q62's — recomputed from the text
  val q75Sql: String = q62Sql

  /** q117: GIF round trip — same lossless-identity contract as q75 but
    * through the GIF-LZW codec (sources.Gif): documents' bytes become
    * 16-px-wide gray frames, are GIF-encoded (variable-code-size LZW,
    * identity palette) and decoded back, reporting exact pooled block
    * means. Any LZW packing, code-growth, sub-block, or palette defect
    * breaks the q62 hash.
    */
  def q117GifRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import graft.operators.Multimodal
    val media = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id").as("media_id"), lit("gray").as("kind"),
        encode(col("text"), "UTF-8").as("payload"), lit(16).as("width"), lit(0).as("height"))
      .as[Multimodal.MediaRow]
    Multimodal.decodeGifGrayPool(Multimodal.gifEncode(media, width = 16), pool = 4)
      .select(col("media_id").as("doc_id"), col("block_row"), col("block_col"),
        col("mean_val"))
  }

  val q117Sql: String = q62Sql

  /** q120: overlapping token-window chunking (size 32, overlap 8) — the
    * RAG / embedding-index unit splitter (TextOps.chunk): chunk k covers
    * tokens [k·24, k·24+32), short tails merge into the last window. The
    * oracle replays the chunk-count formula, slicing, and rejoin.
    */
  def q120ChunkOverlap(spark: SparkSession, sfDir: String): DataFrame =
    TextOps.chunk(Tables.load(spark, sfDir, "documents"), size = 32, overlap = 8)
      .select(col("doc_id"), col("chunk_id"), col("n_tokens"), col("chunk_text"))

  val q120Sql: String =
    """WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks,
      |    len(string_split(text, ' ')) AS n
      |  FROM documents
      |),
      |k AS (
      |  SELECT doc_id, toks, n,
      |    unnest(generate_series(0,
      |      GREATEST(1, CAST(ceil((n - 8) / 24.0) AS INT)) - 1)) AS chunk_id
      |  FROM t
      |),
      |c AS (
      |  SELECT doc_id, chunk_id,
      |    toks[chunk_id * 24 + 1 : LEAST(chunk_id * 24 + 32, n)] AS ck
      |  FROM k
      |)
      |SELECT doc_id, CAST(chunk_id AS INTEGER) AS chunk_id,
      |  CAST(len(ck) AS INTEGER) AS n_tokens,
      |  array_to_string(ck, ' ') AS chunk_text
      |FROM c""".stripMargin

  /** q126: token-dropout augmentation (rate 0.1, epoch 2) — the word-
    * dropout noising regularizer, deterministic per (doc, epoch, position)
    * via seedless md5 coins so every epoch is a different, reproducible
    * corruption (TextOps.tokenDropout; map-side, zero shuffles). The
    * oracle replays every coin and the ordered rejoin.
    */
  def q126TokenDropout(spark: SparkSession, sfDir: String): DataFrame =
    TextOps.tokenDropout(Tables.load(spark, sfDir, "documents"),
      rate = 0.1, epoch = 2)
      .select(col("doc_id"), col("n_tokens"), col("n_kept"), col("augmented_text"))

  val q126Sql: String =
    """WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
      |),
      |x AS (
      |  SELECT doc_id, len(toks) AS n, i, toks[i] AS tok,
      |    ('0x' || substr(md5(doc_id::VARCHAR || '#2#' || i::VARCHAR), 1, 15))::BIGINT
      |      / 1152921504606846976.0 AS u
      |  FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks))) AS i FROM t)
      |)
      |SELECT doc_id, CAST(MAX(n) AS INTEGER) AS n_tokens,
      |  CAST(COUNT(CASE WHEN u >= 0.1 THEN 1 END) AS INTEGER) AS n_kept,
      |  COALESCE(string_agg(CASE WHEN u >= 0.1 THEN tok END, ' ' ORDER BY i), '')
      |    AS augmented_text
      |FROM x GROUP BY doc_id""".stripMargin

  /** q119: unigram-LM tokenizer SEED vocabulary (Kudo 2018 §3 —
    * operators.Unigram): every ≤6-char substring of every distinct word,
    * weighted by corpus word frequency; top-200 multi-char pieces by
    * (weight, piece) plus all single chars. This is the distributed-heavy
    * half of SentencePiece training (the table everything EM does runs
    * on) and it is exactly relational — the EM refinement itself is
    * spec-gated (float Viterbi scores don't cross engines).
    */
  def q119UnigramSeed(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.Unigram.seedVocab(
      Tables.load(spark, sfDir, "documents"), vocabSize = 200)
      .select(col("piece"), col("weight"))

  val q119Sql: String =
    """WITH wf AS (
      |  SELECT word, COUNT(1) AS freq
      |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      |  WHERE length(word) > 0 GROUP BY word
      |),
      |s1 AS (SELECT word, freq, unnest(generate_series(1, length(word))) AS i FROM wf),
      |s2 AS (SELECT word, freq, i,
      |         unnest(generate_series(i, least(length(word), i + 5))) AS j FROM s1),
      |subs AS (
      |  SELECT substr(word, i, j - i + 1) AS piece, SUM(freq) AS weight
      |  FROM s2 GROUP BY piece
      |)
      |SELECT piece, CAST(weight AS BIGINT) AS weight FROM subs WHERE length(piece) = 1
      |UNION ALL
      |SELECT piece, CAST(weight AS BIGINT) AS weight FROM (
      |  SELECT piece, weight,
      |    row_number() OVER (ORDER BY weight DESC, piece ASC) AS rk
      |  FROM subs WHERE length(piece) > 1
      |) WHERE rk <= 200""".stripMargin

  /** q77: REAL lossy-codec round trip — documents' bytes become 16-px-wide
    * grayscale frames (height truncated to whole 8×8 blocks), are
    * JPEG-ENCODED (float64 FDCT, Annex-K quantization, Huffman entropy
    * coding with DC prediction and byte stuffing) and decoded back by the
    * from-scratch baseline codec (sources.Jpeg), reporting each block's
    * exact reconstruction mean. JPEG is lossy, so the oracle cannot demand
    * pixel identity — instead it recomputes the DC quantization arithmetic
    * relationally: block mean = 128 + q₀·floor((S−8192)/(8·q₀) + 0.5)/8
    * with q₀ = 16, a dyadic rational on both engines. Any defect in the
    * Huffman tables, bit packing, stuffing, DC prediction, or AC run
    * decoding desynchronizes every later block's DC, so the whole entropy
    * layer is driver-gated end-to-end, not just spec-gated.
    * Two chained map-side kernels: payloads never shuffle at any scale.
    */
  def q77JpegDc(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import graft.operators.Multimodal
    val media = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id").as("media_id"), lit("gray").as("kind"),
        encode(col("text"), "UTF-8").as("payload"), lit(16).as("width"), lit(0).as("height"))
      .as[Multimodal.MediaRow]
    Multimodal.decodeJpegDcMeans(Multimodal.jpegEncode(media, width = 16))
      .select(col("media_id").as("doc_id"), col("block_row"), col("block_col"),
        col("dc_mean"))
  }

  // the DC path of the codec re-derived relationally from the text: per
  // 8×8 block, S = Σ ascii; the reconstruction mean is exactly
  // 128 + 2·floor((S−8192)/128 + 0.5) at the Annex-K q₀ = 16 (dyadic —
  // engine-exact with no rounding)
  val q77Sql: String =
    """WITH dims AS (
      |  SELECT doc_id, text,
      |    ((length(text) // 16) - (length(text) // 16) % 8) AS full_h
      |  FROM documents
      |),
      |px AS (
      |  SELECT doc_id,
      |    CAST((i - 1) // 16 AS INTEGER) AS r, CAST((i - 1) % 16 AS INTEGER) AS c,
      |    ascii(substr(text, CAST(i AS BIGINT), 1)) AS v
      |  FROM (SELECT doc_id, text, unnest(generate_series(1, full_h * 16)) AS i FROM dims) t
      |)
      |SELECT doc_id, CAST(r // 8 AS INTEGER) AS block_row,
      |  CAST(c // 8 AS INTEGER) AS block_col,
      |  128.0 + 2.0 * FLOOR((SUM(v) - 8192) / 128.0 + 0.5) AS dc_mean
      |FROM px GROUP BY 1, 2, 3""".stripMargin

  /** q78: REAL lossless-codec round trip — documents' bytes become 16-bit
    * little-endian PCM (the q72 framing), are FLAC-ENCODED (fixed
    * predictors as finite differences, Rice-coded residuals, CRC-8/16,
    * UTF-8 frame numbering) and decoded back by the from-scratch subset
    * codec (sources.Flac), reporting per-codec-frame integer stats. FLAC
    * is lossless, so the oracle demands full identity: the per-frame sums
    * and maxima recomputed relationally from the text must hash-match —
    * any defect in rice coding, predictor reconstruction, bit packing, or
    * CRC checking breaks it. Two chained map-side kernels: payloads never
    * shuffle at any scale.
    */
  def q78FlacRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import graft.operators.Multimodal
    val media = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id").as("media_id"), lit("pcm").as("kind"),
        encode(col("text"), "UTF-8").as("payload"), lit(0).as("width"), lit(0).as("height"))
      .as[Multimodal.MediaRow]
    Multimodal.decodeFlacFrames(Multimodal.flacEncode(media, blockSize = 256))
      .select(col("media_id").as("doc_id"), col("frame"), col("n_samples"),
        col("sum_v"), col("max_v"))
  }

  // identity round trip: frames of 256 LE-int16 samples recomputed from
  // the text (ASCII → every sample positive), last frame partial
  val q78Sql: String =
    """WITH t AS (
      |  SELECT doc_id, text, length(text) // 2 AS n FROM documents
      |),
      |s AS (
      |  SELECT doc_id, CAST((i - 1) // 256 AS INTEGER) AS frame,
      |    ascii(substr(text, 2 * i - 1, 1)) + 256 * ascii(substr(text, 2 * i, 1)) AS v
      |  FROM (SELECT doc_id, text, unnest(generate_series(1, n)) AS i FROM t)
      |)
      |SELECT doc_id, frame, CAST(COUNT(1) AS INTEGER) AS n_samples,
      |  CAST(SUM(v) AS BIGINT) AS sum_v, CAST(MAX(v) AS INTEGER) AS max_v
      |FROM s GROUP BY doc_id, frame""".stripMargin

  /** q79: duplicate-span REMOVAL — the rewrite counterpart of q69's
    * flagging (Lee 2022's "dedup the spans, keep the doc" pass): tokens
    * covered by any corpus-duplicated 10-token shingle are excised and the
    * survivors rejoined, byte-identically for untouched docs. The Spark
    * side rebuilds each text map-side from its bounded sorted dup-start
    * array (fixed-length intervals → pairwise gap slices, no token
    * shuffle); the oracle rebuilds it the expensive relational way
    * (token-level anti join + ordered string_agg) — matching proves the
    * interval algebra exact, including overlapping and abutting spans.
    */
  def q79RemoveDupSpans(spark: SparkSession, sfDir: String): DataFrame =
    TextOps.removeDupSpans(Tables.load(spark, sfDir, "documents"), n = 10)
      .select(col("doc_id"), col("n_tok"), col("n_removed"), col("clean_text"))

  val q79Sql: String =
    s"""WITH t0 AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |tk AS (
       |  SELECT doc_id, i - 1 AS tpos, toks[i] AS tok
       |  FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks))) AS i FROM t0) z
       |),
       |sp AS (
       |  SELECT doc_id, i - 1 AS spos,
       |    ${hashSql.format("array_to_string(toks[i:i+9], ' ')")} AS h
       |  FROM (SELECT doc_id, toks,
       |          unnest(generate_series(1, greatest(len(toks) - 9, 0))) AS i FROM t0) z
       |),
       |dup AS (SELECT h FROM sp GROUP BY h HAVING COUNT(1) > 1),
       |cov AS (
       |  SELECT DISTINCT doc_id, spos + j AS tpos
       |  FROM (SELECT s.doc_id, s.spos, unnest(generate_series(0, 9)) AS j
       |        FROM sp s JOIN dup USING (h)) c
       |),
       |kept AS (
       |  SELECT tk.doc_id, tk.tpos, tk.tok
       |  FROM tk LEFT JOIN (SELECT doc_id, tpos, 1 AS cv FROM cov) v
       |    USING (doc_id, tpos)
       |  WHERE v.cv IS NULL
       |),
       |agg AS (
       |  SELECT doc_id, COUNT(1) AS n_kept,
       |    string_agg(tok, ' ' ORDER BY tpos) AS clean_text
       |  FROM kept GROUP BY doc_id
       |)
       |SELECT d.doc_id,
       |  CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tok,
       |  CAST(len(string_split(d.text, ' ')) - COALESCE(a.n_kept, 0) AS BIGINT) AS n_removed,
       |  COALESCE(a.clean_text, '') AS clean_text
       |FROM documents d LEFT JOIN agg a USING (doc_id)""".stripMargin

  // ---- distributed BPE tokenizer training (operators.Bpe) ----

  /** Merges trained once per (session, sfDir) — q80 reports them, q81
    * encodes with them; the memo keeps the 8-round training from running
    * twice (same contract as the shingle caches, evicted with the session).
    */
  private val bpeCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), Seq[graft.operators.Bpe.Merge]]
  private val BpeK = 8
  private def trainedMerges(spark: SparkSession, sfDir: String): Seq[graft.operators.Bpe.Merge] = {
    bpeCache.filterInPlace((k, _) => !k._1.sparkContext.isStopped)
    bpeCache.getOrElseUpdate((spark, sfDir),
      graft.operators.Bpe.train(
        graft.operators.Bpe.wordTable(Tables.load(spark, sfDir, "documents")), BpeK))
  }

  /** q80: the TRAINED merge table itself — k rounds of
    * pair-count-argmax-fuse over the word-frequency table (Sennrich 2016).
    * The oracle re-derives the identical training: a generated k-level CTE
    * chain where each level counts pairs, takes the (count DESC, pair ASC)
    * argmax, and applies the fold — so the training procedure, tie-breaks
    * included, is driver-gated, not just the output shape.
    */
  def q80BpeMerges(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    trainedMerges(spark, sfDir)
      .map(m => (m.rank, m.a, m.b, m.a + m.b))
      .toDF("rank", "a", "b", "merged")
  }

  /** q81: every document segmented with the q80 merges — per-doc BPE token
    * count and the first 8 tokens. Encoding is a map-side kernel over a
    * broadcast merge list; the oracle replays the k fold levels over each
    * document's word sequence.
    */
  def q81BpeEncode(spark: SparkSession, sfDir: String): DataFrame =
    // the greedy merge fold is per-doc map CPU over a broadcast merge list —
    // spread the single-split corpus first (no-op on a many-split corpus)
    graft.operators.Bpe.encode(Tables.loadPar(spark, sfDir, "documents"),
      trainedMerges(spark, sfDir))
      .select(col("doc_id"), col("n_bpe"), col("preview"))

  // the generated training chain shared by both BPE oracles: w0..wK over
  // the word-frequency table, m0..m{K-1} the per-round argmax pairs. The
  // fold mirrors Bpe.applyMerge: left-to-right, non-overlapping, acc as a
  // space-joined string (symbols never contain spaces — words are
  // space-split)
  private def bpeFoldSql(m: String): String =
    s"""string_split(list_reduce(syms, (acc, x) -> CASE
       |      WHEN string_split(acc, ' ')[-1] = $m.a AND x = $m.b
       |      THEN substr(acc, 1, length(acc) - length(string_split(acc, ' ')[-1])) || $m.a || $m.b
       |      ELSE acc || ' ' || x END), ' ')""".stripMargin
  private lazy val bpeTrainChainSql: String = {
    val base =
      """w0 AS (
        |  SELECT w, freq,
        |    list_append(list_transform(generate_series(1, length(w)), i -> substr(w, i, 1)), '</w>') AS syms
        |  FROM (
        |    SELECT w, COUNT(1) AS freq
        |    FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents) t
        |    WHERE length(w) > 0 GROUP BY w
        |  ) wt
        |)""".stripMargin
    val levels = (0 until BpeK).map { r =>
      s"""p$r AS (
         |  SELECT syms[i] AS a, syms[i + 1] AS b, SUM(freq) AS cnt
         |  FROM (SELECT freq, syms, unnest(generate_series(1, len(syms) - 1)) AS i FROM w$r) z
         |  GROUP BY 1, 2
         |),
         |m$r AS (SELECT a, b FROM p$r ORDER BY cnt DESC, a ASC, b ASC LIMIT 1),
         |w${r + 1} AS (
         |  SELECT w, freq, ${bpeFoldSql(s"m$r")} AS syms
         |  FROM w$r CROSS JOIN m$r
         |)""".stripMargin
    }
    (base +: levels).mkString(",\n")
  }

  lazy val q80Sql: String = {
    val rows = (0 until BpeK).map { r =>
      s"SELECT $r AS rank, a, b, a || b AS merged FROM m$r"
    }.mkString("\n  UNION ALL ")
    s"WITH $bpeTrainChainSql\n  $rows"
  }

  lazy val q81Sql: String = {
    val docBase =
      """d0 AS (
        |  SELECT doc_id, wpos,
        |    list_append(list_transform(generate_series(1, length(w)), i -> substr(w, i, 1)), '</w>') AS syms
        |  FROM (
        |    SELECT doc_id, i AS wpos, ws[i] AS w
        |    FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS i
        |          FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents) t0) t1
        |  ) t2 WHERE length(w) > 0
        |)""".stripMargin
    val docLevels = (0 until BpeK).map { r =>
      s"""d${r + 1} AS (
         |  SELECT doc_id, wpos, ${bpeFoldSql(s"m$r")} AS syms
         |  FROM d$r CROSS JOIN m$r
         |)""".stripMargin
    }
    s"""WITH $bpeTrainChainSql,
       |$docBase,
       |${docLevels.mkString(",\n")},
       |agg AS (
       |  SELECT doc_id, CAST(SUM(len(syms)) AS BIGINT) AS n_bpe,
       |    array_to_string(string_split(string_agg(array_to_string(syms, ' '), ' ' ORDER BY wpos), ' ')[1:8], ' ') AS preview
       |  FROM d$BpeK GROUP BY doc_id
       |)
       |SELECT d.doc_id, COALESCE(a.n_bpe, 0) AS n_bpe, COALESCE(a.preview, '') AS preview
       |FROM documents d LEFT JOIN agg a USING (doc_id)""".stripMargin
  }

  /** q82: WARC crawl round trip — the corpus leaves as a real splittable
    * web-crawl container (one `.warc.gz` per partition, one gzip member
    * per record, WARC/1.0 framing — sources.Warc, spec'd against an
    * independent Python-written fixture) and comes back through the
    * MEMBER-PARALLEL reader: exact gzip-member offsets discovered per
    * file, (path, offset, length) rows fanned across tasks, each seeking
    * and inflating only its own range. The oracle is the documents table
    * itself: any framing, compression, offset, or parsing defect loses or
    * corrupts a record and breaks the hash.
    */
  def q82WarcRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.sources.WarcIO
    val dir = java.nio.file.Files.createTempDirectory("graft_warc").toString
    WarcIO.writeCrawl(Tables.load(spark, sfDir, "documents"), dir)
    WarcIO.readCrawlFanout(spark, dir)
      .select(regexp_extract(col("record_id"), "doc-(\\d+)", 1).cast("long").as("doc_id"),
        length(col("text")).cast("long").as("n_chars"), col("text"))
  }

  val q82Sql: String =
    """SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars, text
      |FROM documents""".stripMargin

  /** q83: PII scrub — mask emails / phone shapes / dotted-quad IPs and
    * count per-category hits, the standard pre-release curation pass.
    * Patterns are RE2-safe so the identical strings drive Java regex and
    * DuckDB's RE2; the oracle replays the same ordered replace chain.
    */
  def q83PiiScrub(spark: SparkSession, sfDir: String): DataFrame =
    TextOps.piiScrub(Tables.load(spark, sfDir, "documents"))
      .select(col("doc_id"), col("n_email"), col("n_phone"), col("n_ipv4"),
        col("scrubbed_text"))

  val q83Sql: String = {
    // DuckDB single-quoted literals pass backslashes through untouched —
    // insert the Scala pattern strings verbatim
    val subs = TextOps.PiiPatterns.foldLeft("text") {
      case (expr, (_, pat, repl)) =>
        s"regexp_replace($expr, '$pat', '$repl', 'g')"
    }
    val counts = TextOps.PiiPatterns.map { case (name, pat, _) =>
      s"CAST(len(regexp_extract_all(text, '$pat')) AS BIGINT) AS n_$name"
    }.mkString(",\n  ")
    s"""SELECT doc_id,
       |  $counts,
       |  $subs AS scrubbed_text
       |FROM documents""".stripMargin
  }

  /** q84: COLOR JPEG round trip — documents' bytes become 16-px-wide
    * interleaved-RGB frames (3 bytes per pixel, height truncated to whole
    * 16-px MCUs), are encoded as real 4:2:0 YCbCr JPEGs (BT.601 transform,
    * chroma downsample, two quant + four Huffman tables, interleaved
    * Y00 Y01 Y10 Y11 Cb Cr MCUs with three DC predictor chains) and
    * decoded back. The oracle recomputes every luma block's DC invariant
    * from the text: Y per pixel is the same float64 expression in both
    * engines (identical IEEE op order → bit-equal), so block mean =
    * 128 + 2·floor((ΣY − 8192)/128 + 0.5) exactly. Any defect in the MCU
    * interleave, predictor separation, or chroma table plumbing
    * desynchronizes the luma DCs and breaks the hash.
    */
  def q84JpegColor(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import graft.operators.Multimodal
    // one 16×16-px RGB frame per doc (768 bytes): documents are shorter
    // than a full MCU of interleaved RGB, so the text tiles cyclically —
    // deterministic and exactly mirrored by the oracle's modular substr
    val media = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id").as("media_id"), lit("rgb").as("kind"),
        encode(substring(repeat(col("text"),
          (lit(768) / length(col("text"))).cast("int") + 1), 1, 768), "UTF-8").as("payload"),
        lit(16).as("width"), lit(0).as("height"))
      .as[Multimodal.MediaRow]
    Multimodal.jpegColorDcMeans(media, width = 16)
      .select(col("media_id").as("doc_id"), col("block_row"), col("block_col"),
        col("dc_mean"))
  }

  val q84Sql: String =
    """WITH px AS (
      |  SELECT doc_id,
      |    CAST((i - 1) // 16 AS INTEGER) AS r, CAST((i - 1) % 16 AS INTEGER) AS c,
      |    ROUND(0.299 * ascii(substr(text, CAST((3 * i - 3) % length(text) + 1 AS BIGINT), 1))
      |        + 0.587 * ascii(substr(text, CAST((3 * i - 2) % length(text) + 1 AS BIGINT), 1))
      |        + 0.114 * ascii(substr(text, CAST((3 * i - 1) % length(text) + 1 AS BIGINT), 1))) AS y
      |  FROM (SELECT doc_id, text, unnest(generate_series(1, 256)) AS i FROM documents) t
      |)
      |SELECT doc_id, CAST(r // 8 AS INTEGER) AS block_row,
      |  CAST(c // 8 AS INTEGER) AS block_col,
      |  128.0 + 2.0 * FLOOR((SUM(y) - 8192) / 128.0 + 0.5) AS dc_mean
      |FROM px GROUP BY 1, 2, 3""".stripMargin

  /** q110: C4 page cleaning (Raffel et al. 2020 §2.2) — the other
    * canonical curation recipe beside Gopher's q57: terminal-punctuation
    * line filtering, ≥5-word lines, line-level block words, page-level
    * block phrases / brace / ≥3-sentence rules. The corpus has no line
    * structure, so the input synthesizes it deterministically (every
    * `table` token ends a sentence+line — the q84 tiling trick), with
    * data-native vocab as the blocklists: lines containing `spark` drop,
    * pages containing `stream vector` block. The oracle replays line
    * splitting, trimming, the four line rules, ordered rejoin, and the
    * page decision relationally.
    */
  def q110C4Clean(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        regexp_replace(col("text"), "table", "table.\n").as("text"))
    TextOps.c4Clean(docs,
      blockPhrases = Seq("stream vector"), lineBlockWords = Seq("spark"))
      .select(col("doc_id"), col("n_lines_kept"), col("n_sentences"),
        col("page_blocked"), col("keep"), col("cleaned_text"))
  }

  val q110Sql: String =
    """WITH base AS (
      |  SELECT doc_id, replace(text, 'table', 'table.' || chr(10)) AS t FROM documents
      |),
      |lx AS (
      |  SELECT doc_id, ls, unnest(generate_series(1, len(ls))) AS i
      |  FROM (SELECT doc_id, string_split(t, chr(10)) AS ls FROM base)
      |),
      |lines AS (SELECT doc_id, i, trim(ls[i]) AS line FROM lx),
      |kept AS (
      |  SELECT doc_id, i, line FROM lines
      |  WHERE length(line) > 0
      |    AND substr(line, length(line), 1) IN ('.', '!', '?', '"')
      |    AND len(string_split(line, ' ')) >= 5
      |    AND NOT list_contains(string_split(line, ' '), 'spark')
      |),
      |agg AS (
      |  SELECT doc_id, CAST(COUNT(*) AS INTEGER) AS n_lines_kept,
      |    string_agg(line, chr(10) ORDER BY i) AS cleaned_text
      |  FROM kept GROUP BY doc_id
      |)
      |SELECT b.doc_id,
      |  COALESCE(a.n_lines_kept, 0) AS n_lines_kept,
      |  CAST(length(COALESCE(a.cleaned_text, ''))
      |    - length(regexp_replace(COALESCE(a.cleaned_text, ''), '[.!?]', '', 'g'))
      |    AS INTEGER) AS n_sentences,
      |  (position('stream vector' IN b.t) > 0 OR position('{' IN b.t) > 0) AS page_blocked,
      |  (CAST(length(COALESCE(a.cleaned_text, ''))
      |    - length(regexp_replace(COALESCE(a.cleaned_text, ''), '[.!?]', '', 'g'))
      |    AS INTEGER) >= 3
      |   AND NOT (position('stream vector' IN b.t) > 0 OR position('{' IN b.t) > 0)) AS keep,
      |  COALESCE(a.cleaned_text, '') AS cleaned_text
      |FROM base b LEFT JOIN agg a USING (doc_id)""".stripMargin

  /** q147: EXACT set-similarity self-join (prefix filtering, AllPairs/
    * PPJoin — `TextOps.prefixFilterJoin`) at Jaccard ≥ 4/5 over the
    * session's shared shingle table. The oracle is the FULL all-pairs
    * exact join — matching proves the prefix filter loses nothing, the
    * guarantee that separates this operator from the MinHash-LSH path.
    */
  def q147PrefixJoin(spark: SparkSession, sfDir: String): DataFrame =
    TextOps.prefixFilterFromHashes(sharedShingleHashes(spark, sfDir), 4, 5)

  val q147Sql: String =
    s"""WITH $shingleCte,
       |sizes AS (SELECT doc_id, COUNT(1) AS n_sh FROM shing GROUP BY doc_id),
       |common AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(1) AS n_inter
       |  FROM shing a JOIN shing b ON b.h = a.h AND b.doc_id > a.doc_id
       |  GROUP BY 1, 2
       |)
       |SELECT c.doc_a, c.doc_b, CAST(c.n_inter AS BIGINT) AS n_inter,
       |  CAST(na.n_sh + nb.n_sh - c.n_inter AS BIGINT) AS n_union
       |FROM common c
       |JOIN sizes na ON na.doc_id = c.doc_a
       |JOIN sizes nb ON nb.doc_id = c.doc_b
       |WHERE 5 * c.n_inter >= 4 * (na.n_sh + nb.n_sh - c.n_inter)""".stripMargin

  /** q144: corpus-global line dedup (C4's span rule / CCNet paragraph-hash
    * dedup — `TextOps.corpusLineDedup`). Line structure is synthesized the
    * q110 way (every `table` token ends a line); the small shared vocab
    * makes short segments collide heavily across docs, exercising the
    * first-occurrence-wins rule both within and across documents. The
    * oracle replays split/trim/md5, the first-occurrence window, and the
    * ordered rejoin relationally.
    */
  def q144LineDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        regexp_replace(col("text"), "table", "table\n").as("text"))
    TextOps.corpusLineDedup(docs)
  }

  val q144Sql: String =
    """WITH base AS (
      |  SELECT doc_id, replace(text, 'table', 'table' || chr(10)) AS t FROM documents
      |),
      |lx AS (
      |  SELECT doc_id, ls, unnest(generate_series(1, len(ls))) AS i
      |  FROM (SELECT doc_id, string_split(t, chr(10)) AS ls FROM base)
      |),
      |lines AS (
      |  SELECT doc_id, i, ls[i] AS line, md5(trim(ls[i])) AS h FROM lx
      |  WHERE length(trim(ls[i])) > 0
      |),
      |ranked AS (
      |  SELECT doc_id, i, line,
      |    row_number() OVER (PARTITION BY h ORDER BY doc_id, i) AS rn
      |  FROM lines
      |),
      |agg AS (
      |  SELECT doc_id, CAST(COUNT(*) AS INTEGER) AS n_lines,
      |    CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS INTEGER) AS n_kept,
      |    COALESCE(string_agg(CASE WHEN rn = 1 THEN line END, chr(10) ORDER BY i), '') AS deduped_text
      |  FROM ranked GROUP BY doc_id
      |)
      |SELECT d.doc_id, COALESCE(a.n_lines, 0) AS n_lines,
      |  COALESCE(a.n_kept, 0) AS n_kept,
      |  COALESCE(a.deduped_text, '') AS deduped_text
      |FROM base d LEFT JOIN agg a USING (doc_id)""".stripMargin

  // ---------------------------------------------------------------- q153

  /** q153: per-class classifier evaluation (`LmOps.classifierEval`) — the
    * eval report a curation pipeline keeps next to every filter model:
    * per-class support, confusion diagonal, precision/recall/F1 in integer
    * micro-units. The (reference, candidate) pairs are the q32 dialect
    * rater run twice per document — once on the full text (the reference
    * annotation) and once on the first half of the tokens (a rater with
    * less evidence) — so the confusion matrix is non-trivially off-
    * diagonal exactly where the evidence halving flips the argmax. One
    * map-side-combinable (actual, pred) groupBy shuffles |classes)|² count
    * rows regardless of corpus size.
    */
  private def halfDocs(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), expr(
      "array_join(slice(split(text, ' '), 1, greatest(size(split(text, ' ')) div 2, 1)), ' ')")
      .as("text"))

  private val halfTextSql: String =
    "array_to_string((string_split(text, ' '))" +
      "[1:greatest(len(string_split(text, ' ')) // 2, 1)], ' ')"

  def q153ClassifierEval(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val full = TextOps.langId(docs)
      .select(col("doc_id"), col("pred_lang").as("full_pred"))
    val half = TextOps.langId(halfDocs(docs))
      .select(col("doc_id"), col("pred_lang").as("half_pred"))
    graft.operators.LmOps.classifierEval(full.join(half, "doc_id"),
      "full_pred", "half_pred")
  }

  val q153Sql: String =
    s"""WITH ${langScoreCteFor("ls_full", "text")},
       |${langScoreCteFor("ls_half", halfTextSql)},
       |pairs AS (
       |  SELECT ${langPredSqlFor("f.")} AS actual, ${langPredSqlFor("h.")} AS pred
       |  FROM ls_full f JOIN ls_half h USING (doc_id)
       |),
       |cm AS (SELECT actual, pred, COUNT(1) AS n FROM pairs GROUP BY actual, pred),
       |cls AS (
       |  SELECT DISTINCT actual AS cls FROM cm
       |  UNION SELECT DISTINCT pred FROM cm
       |),
       |a AS (SELECT actual AS cls, CAST(SUM(n) AS BIGINT) AS n_actual FROM cm GROUP BY actual),
       |p AS (SELECT pred AS cls, CAST(SUM(n) AS BIGINT) AS n_pred FROM cm GROUP BY pred),
       |t AS (SELECT actual AS cls, CAST(SUM(n) AS BIGINT) AS tp FROM cm WHERE actual = pred GROUP BY actual),
       |m AS (
       |  SELECT cls.cls, COALESCE(n_actual, 0) AS n_actual,
       |    COALESCE(n_pred, 0) AS n_pred, COALESCE(tp, 0) AS tp
       |  FROM cls LEFT JOIN a USING (cls) LEFT JOIN p USING (cls) LEFT JOIN t USING (cls)
       |),
       |mm AS (
       |  SELECT cls, n_actual, n_pred, tp, n_pred - tp AS fp, n_actual - tp AS fn,
       |    CAST(CASE WHEN n_pred = 0 THEN 0 ELSE tp * 1000000 // n_pred END AS BIGINT) AS precision_micro,
       |    CAST(CASE WHEN n_actual = 0 THEN 0 ELSE tp * 1000000 // n_actual END AS BIGINT) AS recall_micro
       |  FROM m
       |)
       |SELECT cls, n_actual, n_pred, tp, fp, fn, precision_micro, recall_micro,
       |  CAST(CASE WHEN precision_micro + recall_micro = 0 THEN 0
       |    ELSE 2 * precision_micro * recall_micro // (precision_micro + recall_micro) END AS BIGINT) AS f1_micro
       |FROM mm""".stripMargin

  // ---------------------------------------------------------------- q154

  /** q154: Cohen's kappa (`LmOps.agreementKappa`) between q153's two
    * raters (full-text vs half-text dialect annotation) — the chance-
    * corrected inter-annotator agreement, the companion to q153's raw
    * per-class report (with few balanced classes, chance buys ~25%
    * agreement; kappa discounts it). po/pe land as micro-unit integers
    * first, kappa derives from those with sign-magnitude floor division —
    * bit-identical in both engines.
    */
  def q154Kappa(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val full = TextOps.langId(docs)
      .select(col("doc_id"), col("pred_lang").as("full_pred"))
    val half = TextOps.langId(halfDocs(docs))
      .select(col("doc_id"), col("pred_lang").as("half_pred"))
    graft.operators.LmOps.agreementKappa(full.join(half, "doc_id"),
      "full_pred", "half_pred")
  }

  val q154Sql: String =
    s"""WITH ${langScoreCteFor("ls_full", "text")},
       |${langScoreCteFor("ls_half", halfTextSql)},
       |pairs AS (
       |  SELECT ${langPredSqlFor("f.")} AS a, ${langPredSqlFor("h.")} AS b
       |  FROM ls_full f JOIN ls_half h USING (doc_id)
       |),
       |cm AS (SELECT a, b, COUNT(1) AS n FROM pairs GROUP BY a, b),
       |at2 AS (SELECT a, SUM(n) AS na FROM cm GROUP BY a),
       |bt2 AS (SELECT b, SUM(n) AS nb FROM cm GROUP BY b),
       |s AS (
       |  SELECT COALESCE(SUM(CAST(na AS HUGEINT) * nb), 0) AS s
       |  FROM at2 JOIN bt2 ON at2.a = bt2.b
       |),
       |tot AS (
       |  SELECT CAST(SUM(n) AS BIGINT) AS n,
       |    CAST(COALESCE(SUM(CASE WHEN a = b THEN n END), 0) AS BIGINT) AS n_agree
       |  FROM cm
       |),
       |m AS (
       |  SELECT n, n_agree,
       |    CAST(n_agree * 1000000 // n AS BIGINT) AS po_micro,
       |    CAST((1000000 * s) // (CAST(n AS HUGEINT) * n) AS BIGINT) AS pe_micro
       |  FROM tot, s
       |)
       |SELECT n, n_agree, po_micro, pe_micro,
       |  CAST(CASE WHEN pe_micro = 1000000 THEN 0 ELSE
       |    (CASE WHEN po_micro >= pe_micro THEN 1 ELSE -1 END) *
       |    (abs(po_micro - pe_micro) * 1000000 // (1000000 - pe_micro)) END
       |  AS BIGINT) AS kappa_micro
       |FROM m""".stripMargin

  // ---------------------------------------------------------------- q196

  // anchor-probe scoring shared by q196/q197: cosine of every embedding
  // to the vec_id-0 exemplar, micro-rounded, labeled 1 when the class
  // matches the anchor's. The dot runs through the codegen'd dot_f32 whose
  // left-to-right double fold is bit-identical to the oracle's
  // list_reduce, so the rounded integer scores agree exactly.
  private def anchorScored(spark: SparkSession, sfDir: String,
      dim: Int = 0): DataFrame = {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val trunc = if (dim > 0) slice(col("embedding"), 1, dim) else col("embedding")
    val anchor = emb.filter(col("vec_id") === 0)
      .select(trunc.as("__av"), col("label").as("__albl"))
    emb.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(anchor))
      .select(
        round(Similarity.cosine(trunc, col("__av")) * 1000000)
          .cast("long").as("score_micro"),
        when(col("label") === col("__albl"), 1L).otherwise(0L).as("y"))
  }

  // the full-dim anchor scoring feeds FIVE eval queries (q196 AUC, q197
  // calibration, q204 isotonic, q205 DeLong, q210 AP) — share the scored
  // (score_micro, y) frame per (session, sfDir) like the jaccard family
  // (it is embeddings-row-sized, tiny next to the cosine scan it saves).
  // q200 (truncated dims) and q207 (two scorers) compute different score
  // columns and stay direct. NOTE q204/q210 ALSO reach this cache from
  // inside driver-side collects at construction time; their returned
  // plans carry the lineage (q210) or not (q204, literal-built) — q204 is
  // a hand-declared consumer the plan audit cannot see (the q93 class,
  // pinned in CacheLifeSpec).
  private val AnchorConsumers: Set[String] = Set("q196_binary_auc",
    "q197_calibration", "q204_isotonic", "q205_auc_delong",
    "q210_avg_precision")

  private def sharedAnchorScored(spark: SparkSession, sfDir: String): DataFrame =
    graft.core.CacheLife.shared(spark, sfDir, "anchor_scored", AnchorConsumers)(
      anchorScored(spark, sfDir))

  private def anchorScoredSqlAt(dim: Int): String = {
    val e = if (dim > 0) s"e.embedding[1:$dim]" else "e.embedding"
    val av = if (dim > 0) s"av[1:$dim]" else "a.av"
    s"""a AS (SELECT embedding AS av, label AS albl FROM embeddings WHERE vec_id = 0),
       |scored AS (
       |  SELECT CAST(ROUND(${dotSql(e, av)}
       |      / (SQRT(${dotSql(e, e)}) * SQRT(${dotSql(av, av)}))
       |      * 1000000) AS BIGINT) AS score_micro,
       |    CASE WHEN e.label = a.albl THEN 1 ELSE 0 END AS y
       |  FROM embeddings e CROSS JOIN a
       |  WHERE e.vec_id != 0
       |)""".stripMargin
  }

  private val anchorScoredSql: String = anchorScoredSqlAt(0)

  /** q196: ROC-AUC of the anchor-probe retrieval score
    * (`LmOps.binaryAuc`) — does cosine similarity to one exemplar predict
    * same-class membership? The tie-corrected Mann–Whitney statistic in
    * exact integer micro-units, computed rank-free over the distinct-
    * score table (two-phase cumulative negatives — no corpus-sized sort).
    */
  def q196BinaryAuc(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.LmOps.binaryAuc(sharedAnchorScored(spark, sfDir),
      "score_micro", "y")

  private def aucSqlFor(dim: Int): String =
    s"""WITH ${anchorScoredSqlAt(dim)},
       |g AS (
       |  SELECT score_micro AS score, CAST(SUM(y) AS BIGINT) AS p,
       |    CAST(COUNT(1) - SUM(y) AS BIGINT) AS ng
       |  FROM scored GROUP BY score_micro
       |),
       |c AS (
       |  SELECT p, ng, COALESCE(SUM(ng) OVER (ORDER BY score
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS neg_below
       |  FROM g
       |),
       |r AS (
       |  SELECT CAST(COALESCE(SUM(p), 0) AS BIGINT) AS n_pos,
       |    CAST(COALESCE(SUM(ng), 0) AS BIGINT) AS n_neg,
       |    COALESCE(SUM(CAST(p AS HUGEINT) * (2 * neg_below + ng)), 0) AS num2
       |  FROM c
       |),
       |m AS (
       |  SELECT n_pos + n_neg AS n, n_pos, n_neg,
       |    CAST(CASE WHEN n_pos = 0 OR n_neg = 0 THEN 0
       |      ELSE (CAST(1000000 AS HUGEINT) * num2)
       |        // (2 * CAST(n_pos AS HUGEINT) * n_neg) END AS BIGINT) AS auc_micro
       |  FROM r
       |)
       |SELECT n, n_pos, n_neg, auc_micro,
       |  auc_micro * 2 - 1000000 AS gini_micro
       |FROM m""".stripMargin

  val q196Sql: String = aucSqlFor(0)

  // ---------------------------------------------------------------- q200

  /** q200: embedding-dimension truncation sweep — the matryoshka audit
    * (Kusupati et al. 2022): the anchor-probe AUC of q196 recomputed on
    * the first 8/16/32/64 dimensions of every embedding, one row per
    * width. The curve tells a pipeline how many dimensions its retrieval
    * probe can drop before same-class ranking degrades — the decision
    * input for truncated-index tiers. ONE corpus scan computes all four
    * truncated cosines per row (the prefix dots share nothing the
    * codegen'd dot_f32 wouldn't recompute, but the SCAN and the anchor
    * broadcast are shared), explodes (dim, score) pairs, and the keyed
    * `binaryAucBy` ranks every width in parallel — one shuffle keyed by
    * (dim, score), zero SinglePartition, instead of four independent
    * jobs re-reading the corpus.
    */
  def q200TruncationSweep(spark: SparkSession, sfDir: String): DataFrame = {
    val dims = Seq(8, 16, 32, 64)
    val emb = Tables.load(spark, sfDir, "embeddings")
    val anchor = emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("__av"), col("label").as("__albl"))
    val pairs = dims.map { d =>
      struct(lit(d.toLong).as("dim"),
        round(Similarity.cosine(slice(col("embedding"), 1, d),
          slice(col("__av"), 1, d)) * 1000000).cast("long").as("score_micro"))
    }
    val scored = emb.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(anchor))
      .select(explode(array(pairs: _*)).as("__p"),
        when(col("label") === col("__albl"), 1L).otherwise(0L).as("y"))
      .select(col("__p.dim").as("dim"), col("__p.score_micro").as("score_micro"),
        col("y"))
    graft.operators.LmOps.binaryAucBy(scored, Seq("dim"), "score_micro", "y")
  }

  val q200Sql: String =
    Seq(8, 16, 32, 64).map { d =>
      s"SELECT CAST($d AS BIGINT) AS dim, n, n_pos, n_neg, auc_micro, gini_micro FROM (${aucSqlFor(d)})"
    }.mkString("\nUNION ALL\n")

  // ---------------------------------------------------------------- q205

  /** q205: anchor-probe AUC with the DeLong standard error and 95% CI
    * (`LmOps.binaryAucSe`) — q196's point estimate upgraded to an
    * interval: the doubled placements both variance components need are
    * integer by construction and fall out of the same two-phase
    * cumulative pass, so the CI costs three extra sums over the
    * distinct-score table. The SE/CI doubles are computed from exact
    * integer sums with identical expression text in both engines.
    */
  def q205AucDelong(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.LmOps.binaryAucSe(sharedAnchorScored(spark, sfDir),
      "score_micro", "y")

  val q205Sql: String =
    s"""WITH $anchorScoredSql,
       |g AS (
       |  SELECT score_micro AS score, CAST(SUM(y) AS BIGINT) AS p,
       |    CAST(COUNT(1) - SUM(y) AS BIGINT) AS ng
       |  FROM scored GROUP BY score_micro
       |),
       |c AS (
       |  SELECT p, ng,
       |    COALESCE(SUM(ng) OVER (ORDER BY score
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS neg_below,
       |    COALESCE(SUM(p) OVER (ORDER BY score
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pos_below
       |  FROM g
       |),
       |t AS (
       |  SELECT CAST(COALESCE(SUM(p), 0) AS BIGINT) AS n_pos,
       |    CAST(COALESCE(SUM(ng), 0) AS BIGINT) AS n_neg,
       |    COALESCE(SUM(CAST(p AS HUGEINT) * (2 * neg_below + ng)), 0) AS a10,
       |    COALESCE(SUM(CAST(p AS HUGEINT) * (2 * neg_below + ng)
       |      * (2 * neg_below + ng)), 0) AS b10
       |  FROM c
       |),
       |r AS (
       |  SELECT n_pos, n_neg, a10, b10,
       |    COALESCE(SUM(CAST(ng AS HUGEINT)
       |      * ((n_pos - pos_below - p) * 2 + p)), 0) AS a01,
       |    COALESCE(SUM(CAST(ng AS HUGEINT)
       |      * ((n_pos - pos_below - p) * 2 + p)
       |      * ((n_pos - pos_below - p) * 2 + p)), 0) AS b01
       |  FROM c, t GROUP BY n_pos, n_neg, a10, b10
       |),
       |m AS (
       |  SELECT n_pos + n_neg AS n, n_pos, n_neg,
       |    CAST(CASE WHEN n_pos = 0 OR n_neg = 0 THEN 0
       |      ELSE (CAST(1000000 AS HUGEINT) * a10)
       |        // (2 * CAST(n_pos AS HUGEINT) * n_neg) END AS BIGINT) AS auc_micro,
       |    CASE WHEN n_pos < 2 OR n_neg < 2 THEN 0.0 ELSE
       |      ROUND(SQRT(
       |        CAST(n_pos * b10 - a10 * a10 AS DOUBLE)
       |          / (4.0 * CAST(n_neg AS DOUBLE) * CAST(n_neg AS DOUBLE)
       |             * CAST(n_pos AS DOUBLE) * CAST(n_pos - 1 AS DOUBLE)
       |             * CAST(n_pos AS DOUBLE)) +
       |        CAST(n_neg * b01 - a01 * a01 AS DOUBLE)
       |          / (4.0 * CAST(n_pos AS DOUBLE) * CAST(n_pos AS DOUBLE)
       |             * CAST(n_neg AS DOUBLE) * CAST(n_neg - 1 AS DOUBLE)
       |             * CAST(n_neg AS DOUBLE))), 6) END AS se6
       |  FROM r
       |)
       |SELECT n, n_pos, n_neg, auc_micro, se6,
       |  ROUND(GREATEST(0.0, CAST(auc_micro AS DOUBLE) / 1000000.0
       |    - 1.959964 * se6), 6) AS lo6,
       |  ROUND(LEAST(1.0, CAST(auc_micro AS DOUBLE) / 1000000.0
       |    + 1.959964 * se6), 6) AS hi6
       |FROM m""".stripMargin

  // ---------------------------------------------------------------- q207

  /** q207: paired DeLong comparison (`LmOps.binaryAucCompare`) of the
    * full-dim anchor probe against its 16-dim truncation — the
    * significance test behind q200's sweep: is the full-width AUC gap
    * over the cheap index REAL on this eval set, or noise? One scan
    * computes both scores; the paired covariance (the scorers share
    * every label) is what makes the z usable at eval-set sizes where an
    * unpaired test would shrug.
    */
  def q207AucCompare(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val anchor = emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("__av"), col("label").as("__albl"))
    val scored = emb.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(anchor))
      .select(
        round(Similarity.cosine(col("embedding"), col("__av")) * 1000000)
          .cast("long").as("score_a"),
        round(Similarity.cosine(slice(col("embedding"), 1, 16),
          slice(col("__av"), 1, 16)) * 1000000).cast("long").as("score_b"),
        when(col("label") === col("__albl"), 1L).otherwise(0L).as("y"))
    graft.operators.LmOps.binaryAucCompare(scored, "score_a", "score_b", "y")
  }

  val q207Sql: String = {
    val eFull = "e.embedding"
    val e16 = "e.embedding[1:16]"
    val avFull = "a.av"
    val av16 = "av[1:16]"
    def placements(tag: String, scoreCol: String): String =
      s"""g$tag AS (
         |  SELECT $scoreCol AS score, CAST(SUM(y) AS BIGINT) AS p,
         |    CAST(COUNT(1) - SUM(y) AS BIGINT) AS ng
         |  FROM scored2 GROUP BY $scoreCol
         |),
         |t$tag AS (SELECT CAST(SUM(p) AS BIGINT) AS tp FROM g$tag),
         |p$tag AS (
         |  SELECT score,
         |    2 * COALESCE(SUM(ng) OVER (ORDER BY score
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + ng AS p2,
         |    2 * (tp - COALESCE(SUM(p) OVER (ORDER BY score
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) - p) + p AS r2
         |  FROM g$tag, t$tag
         |)""".stripMargin
    s"""WITH a AS (SELECT embedding AS av, label AS albl FROM embeddings WHERE vec_id = 0),
       |scored2 AS (
       |  SELECT CAST(ROUND(${dotSql(eFull, avFull)}
       |      / (SQRT(${dotSql(eFull, eFull)}) * SQRT(${dotSql(avFull, avFull)}))
       |      * 1000000) AS BIGINT) AS sa,
       |    CAST(ROUND(${dotSql(e16, av16)}
       |      / (SQRT(${dotSql(e16, e16)}) * SQRT(${dotSql(av16, av16)}))
       |      * 1000000) AS BIGINT) AS sb,
       |    CASE WHEN e.label = a.albl THEN 1 ELSE 0 END AS y
       |  FROM embeddings e CROSS JOIN a
       |  WHERE e.vec_id != 0
       |),
       |${placements("a", "sa")},
       |${placements("b", "sb")},
       |placed AS (
       |  SELECT y,
       |    CASE WHEN y = 1 THEN pa.p2 ELSE pa.r2 END AS ua,
       |    CASE WHEN y = 1 THEN pb.p2 ELSE pb.r2 END AS ub
       |  FROM scored2 JOIN pa ON scored2.sa = pa.score
       |    JOIN pb ON scored2.sb = pb.score
       |),
       |s AS (
       |  SELECT CAST(SUM(y) AS BIGINT) AS n_pos,
       |    CAST(COUNT(1) - SUM(y) AS BIGINT) AS n_neg,
       |    COALESCE(SUM(CASE WHEN y = 1 THEN CAST(ua AS HUGEINT) END), 0) AS sa10,
       |    COALESCE(SUM(CASE WHEN y = 1 THEN CAST(ua AS HUGEINT) * ua END), 0) AS saa10,
       |    COALESCE(SUM(CASE WHEN y = 1 THEN CAST(ub AS HUGEINT) END), 0) AS sb10,
       |    COALESCE(SUM(CASE WHEN y = 1 THEN CAST(ub AS HUGEINT) * ub END), 0) AS sbb10,
       |    COALESCE(SUM(CASE WHEN y = 1 THEN CAST(ua AS HUGEINT) * ub END), 0) AS sab10,
       |    COALESCE(SUM(CASE WHEN y = 0 THEN CAST(ua AS HUGEINT) END), 0) AS sa01,
       |    COALESCE(SUM(CASE WHEN y = 0 THEN CAST(ua AS HUGEINT) * ua END), 0) AS saa01,
       |    COALESCE(SUM(CASE WHEN y = 0 THEN CAST(ub AS HUGEINT) END), 0) AS sb01,
       |    COALESCE(SUM(CASE WHEN y = 0 THEN CAST(ub AS HUGEINT) * ub END), 0) AS sbb01,
       |    COALESCE(SUM(CASE WHEN y = 0 THEN CAST(ua AS HUGEINT) * ub END), 0) AS sab01
       |  FROM placed
       |),
       |m AS (
       |  SELECT n_pos + n_neg AS n, n_pos, n_neg,
       |    CAST(CASE WHEN n_pos = 0 OR n_neg = 0 THEN 0
       |      ELSE (CAST(1000000 AS HUGEINT) * sa10)
       |        // (2 * CAST(n_pos AS HUGEINT) * n_neg) END AS BIGINT) AS auc_a_micro,
       |    CAST(CASE WHEN n_pos = 0 OR n_neg = 0 THEN 0
       |      ELSE (CAST(1000000 AS HUGEINT) * sb10)
       |        // (2 * CAST(n_pos AS HUGEINT) * n_neg) END AS BIGINT) AS auc_b_micro,
       |    CASE WHEN n_pos < 2 OR n_neg < 2 THEN 0.0 ELSE
       |      ROUND(SQRT(GREATEST(0.0,
       |        (CAST(n_pos * saa10 - sa10 * sa10 AS DOUBLE)
       |         + CAST(n_pos * sbb10 - sb10 * sb10 AS DOUBLE)
       |         - 2.0 * CAST(n_pos * sab10 - sa10 * sb10 AS DOUBLE))
       |          / (4.0 * CAST(n_neg AS DOUBLE) * CAST(n_neg AS DOUBLE)
       |             * CAST(n_pos AS DOUBLE) * CAST(n_pos - 1 AS DOUBLE)
       |             * CAST(n_pos AS DOUBLE)) +
       |        (CAST(n_neg * saa01 - sa01 * sa01 AS DOUBLE)
       |         + CAST(n_neg * sbb01 - sb01 * sb01 AS DOUBLE)
       |         - 2.0 * CAST(n_neg * sab01 - sa01 * sb01 AS DOUBLE))
       |          / (4.0 * CAST(n_pos AS DOUBLE) * CAST(n_pos AS DOUBLE)
       |             * CAST(n_neg AS DOUBLE) * CAST(n_neg - 1 AS DOUBLE)
       |             * CAST(n_neg AS DOUBLE)))), 6) END AS se6
       |  FROM s
       |)
       |SELECT n, n_pos, n_neg, auc_a_micro, auc_b_micro,
       |  auc_a_micro - auc_b_micro AS diff_micro, se6,
       |  CASE WHEN se6 <= 0.0 THEN 0.0
       |    ELSE ROUND((CAST(auc_a_micro - auc_b_micro AS DOUBLE) / 1000000.0)
       |      / se6, 6) END AS z6
       |FROM m""".stripMargin
  }

  // ---------------------------------------------------------------- q197

  /** q197: calibration report of the anchor probe as a same-class
    * "probability" ((cos+1)/2 in micro-units) — per-bin confidence vs
    * empirical accuracy plus global Brier score and ECE
    * (`LmOps.calibrationReport`): the reliability audit a curation
    * pipeline keeps next to every learned filter threshold. One
    * ≤10-bucket map-side-combinable groupBy; all-integer.
    */
  def q197Calibration(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.LmOps.calibrationReport(
      sharedAnchorScored(spark, sfDir)
        .select(expr("(score_micro + 1000000) DIV 2").as("prob_micro"), col("y")),
      "prob_micro", "y", bins = 10)

  val q197Sql: String =
    s"""WITH $anchorScoredSql,
       |p AS (SELECT (score_micro + 1000000) // 2 AS pm, y FROM scored),
       |binned AS (SELECT CAST(LEAST(pm * 10 // 1000000, 9) AS BIGINT) AS bin, pm, y FROM p),
       |perbin AS (
       |  SELECT bin, CAST(COUNT(1) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS n_pos,
       |    CAST(SUM(pm) AS BIGINT) AS spm,
       |    SUM(CAST(pm - y * 1000000 AS HUGEINT) * (pm - y * 1000000)) AS sq
       |  FROM binned GROUP BY bin
       |),
       |pb2 AS (
       |  SELECT bin, n, n_pos, spm // n AS conf_micro,
       |    n_pos * 1000000 // n AS acc_micro, sq
       |  FROM perbin
       |),
       |gl AS (
       |  SELECT CAST(SUM(n) AS BIGINT) AS nt, SUM(sq) AS sqt,
       |    CAST(SUM(n * abs(acc_micro - conf_micro)) AS BIGINT) AS ed
       |  FROM pb2
       |)
       |SELECT bin, n, n_pos, conf_micro, acc_micro,
       |  CAST(sqt // (CAST(nt AS HUGEINT) * 1000000) AS BIGINT) AS brier_micro,
       |  ed // nt AS ece_micro
       |FROM pb2, gl""".stripMargin

  // ---------------------------------------------------------------- q204

  /** q204: isotonic (PAV) calibration of the anchor probe
    * (`LmOps.isotonicCalibrate`) — the monotone recalibration a pipeline
    * fits when q197's reliability report shows the raw scores are off:
    * 32 confidence bins, pooled-adjacent-violators fit, per-bin
    * calibrated rate. The PAV fit itself is driver-side over the bounded
    * bin table (spec-gated closed forms); the ORACLE gets the fitted
    * step function as literals (the q193/q194 dynamicOracle pattern) and
    * replays the binning, counts and join relationally.
    */
  def q204Isotonic(spark: SparkSession, sfDir: String): DataFrame = {
    val probs = sharedAnchorScored(spark, sfDir)
      .select(expr("(score_micro + 1000000) DIV 2").as("prob_micro"), col("y"))
    // ONE corpus scan (ADVICE r15): collect the bounded bin table, fit
    // driver-side, rebuild the output from the SAME collected rows — the
    // old isotonicApply join against the uncached agg plan paid the
    // anchor cross-join cosine scan twice
    // BOUND: 32 calibration-bin rows
    val rows = graft.operators.LmOps.isotonicBins(probs, "prob_micro", "y", 32)
      .select(col("bin"), col("n"), col("n_pos"), col("conf_micro"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val fitted = graft.operators.LmOps.pavFit(rows.map(t => (t._1, t._2, t._3)))
    q204Fitted.put(sfDir, fitted)
    graft.operators.LmOps.isotonicFromCollected(spark, rows, fitted)
  }

  // the fits q204 ran with, KEYED BY sfDir (ADVICE r15: a single Option
  // memo yields a wrong oracle if one Verify JVM replays multiple sfDirs)
  // — read by the dynamic oracle AFTER Verify has executed every query
  private val q204Fitted =
    scala.collection.concurrent.TrieMap.empty[String, Seq[(Long, Long)]]

  /** Data-dependent q204 oracle: the PAV step function rides in as a
    * VALUES table; binning, counts and the join replay relationally.
    * None when the query never ran OR ran against MORE than one sfDir in
    * this JVM (no single correct oracle exists — the driver then records
    * the weaker rows-only check instead of hash-comparing a wrong one).
    * A degenerate empty fit (no input rows) emits a guaranteed-empty
    * oracle instead of a zero-tuple VALUES syntax error. */
  def q204Oracle: Option[String] = q204Fitted.toMap match {
    case m if m.size != 1 => None
    case m =>
      val fitted = m.head._2
      val cal =
        if (fitted.isEmpty)
          "cal(bin, iso_micro) AS (SELECT CAST(NULL AS BIGINT), CAST(NULL AS BIGINT) WHERE FALSE)"
        else {
          val values = fitted.map { case (b, v) => s"($b, $v)" }.mkString(", ")
          s"cal(bin, iso_micro) AS (SELECT * FROM (VALUES $values) v(b2, i2))"
        }
      Some(s"""WITH $anchorScoredSql,
        |p AS (SELECT (score_micro + 1000000) // 2 AS pm, y FROM scored),
        |b AS (
        |  SELECT CAST(GREATEST(LEAST(pm * 32 // 1000000, 31), 0) AS BIGINT) AS bin,
        |    CAST(COUNT(1) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS n_pos,
        |    CAST(SUM(pm) AS BIGINT) AS spm
        |  FROM p GROUP BY 1
        |),
        |$cal
        |SELECT b.bin, n, n_pos, spm // n AS conf_micro,
        |  CAST(iso_micro AS BIGINT) AS iso_micro
        |FROM b JOIN cal USING (bin)""".stripMargin)
  }

  // ---------------------------------------------------------------- q198

  /** q198: Krippendorff's alpha (`LmOps.krippendorffAlpha`) across THREE
    * evidence-starved raters — the q153/q154 dialect annotator run on the
    * full text, the first half, and the first quarter of each document's
    * tokens. The nominal-metric generalization of q154's two-rater kappa:
    * same chance-corrected family, but rater-count-agnostic and built on
    * the coincidence identity m² − Σcnt² (ordered disagreeing pairs), so
    * no |raters|² pair join ever materializes.
    */
  private def quarterDocs(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), expr(
      "array_join(slice(split(text, ' '), 1, greatest(size(split(text, ' ')) div 4, 1)), ' ')")
      .as("text"))

  private val quarterTextSql: String =
    "array_to_string((string_split(text, ' '))" +
      "[1:greatest(len(string_split(text, ' ')) // 4, 1)], ' ')"

  def q198Krippendorff(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val obs = Seq[DataFrame => DataFrame](identity, halfDocs, quarterDocs)
      .map(f => TextOps.langId(f(docs))
        .select(col("doc_id"), col("pred_lang").as("v")))
      .reduce(_ unionByName _)
    graft.operators.LmOps.krippendorffAlpha(obs, "doc_id", "v")
  }

  val q198Sql: String =
    s"""WITH ${langScoreCteFor("ls_full", "text")},
       |${langScoreCteFor("ls_half", halfTextSql)},
       |${langScoreCteFor("ls_quarter", quarterTextSql)},
       |obs AS (
       |  SELECT doc_id, ${langPredSqlFor("f.")} AS v FROM ls_full f
       |  UNION ALL SELECT doc_id, ${langPredSqlFor("h.")} FROM ls_half h
       |  UNION ALL SELECT doc_id, ${langPredSqlFor("q.")} FROM ls_quarter q
       |),
       |cnt AS (SELECT doc_id AS u, v, COUNT(1) AS c FROM obs GROUP BY u, v),
       |pu AS (
       |  SELECT u, CAST(SUM(c) AS BIGINT) AS m, CAST(SUM(c * c) AS BIGINT) AS ss
       |  FROM cnt GROUP BY u HAVING SUM(c) >= 2
       |),
       |dn AS (
       |  SELECT CAST(COUNT(1) AS BIGINT) AS n_units,
       |    CAST(COALESCE(SUM(m), 0) AS BIGINT) AS n,
       |    CAST(COALESCE(SUM(1000000 * (m * m - ss) // (m - 1)), 0) AS BIGINT) AS dnum
       |  FROM pu
       |),
       |nc AS (SELECT v, CAST(SUM(c) AS BIGINT) AS n_c FROM cnt JOIN pu USING (u) GROUP BY v),
       |sq AS (SELECT COALESCE(SUM(CAST(n_c AS HUGEINT) * n_c), 0) AS ncsq FROM nc),
       |m0 AS (
       |  SELECT n_units, n,
       |    CAST(CASE WHEN n = 0 THEN 0 ELSE dnum // n END AS BIGINT) AS do_micro,
       |    CAST(CASE WHEN n < 2 THEN 0 ELSE
       |      (CAST(1000000 AS HUGEINT) * (CAST(n AS HUGEINT) * n - ncsq))
       |        // (CAST(n AS HUGEINT) * (n - 1)) END AS BIGINT) AS de_micro
       |  FROM dn, sq
       |)
       |SELECT n_units, n, do_micro, de_micro,
       |  CAST(CASE WHEN de_micro = 0 THEN 0
       |    ELSE 1000000 - do_micro * 1000000 // de_micro END AS BIGINT) AS alpha_micro
       |FROM m0""".stripMargin

  // ---------------------------------------------------------------- q199

  /** q199: two-sample Kolmogorov–Smirnov drift between the two
    * lexicographically-first sources' document-length distributions
    * (`Profile.ksTwoSample`) — the ordered-axis complement of q166's
    * per-bucket share drift: a shift between ADJACENT length buckets
    * barely moves L1 shares but stacks up in the CDF gap. Exact integer
    * micro-units over the distinct-value table; argmax ties break to the
    * smallest length.
    */
  def q199KsDrift(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.Profile.ksTwoSample(
      Tables.load(spark, sfDir, "documents").select(col("n_chars"), col("source")),
      "n_chars", "source", "src0", "src1")

  val q199Sql: String =
    """WITH g AS (
      |  SELECT n_chars AS v,
      |    CAST(SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
      |    CAST(SUM(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS BIGINT) AS cb
      |  FROM documents WHERE source IN ('src0', 'src1') GROUP BY n_chars
      |),
      |c AS (
      |  SELECT v, ca, cb,
      |    SUM(ca) OVER w AS cum_a, SUM(cb) OVER w AS cum_b
      |  FROM g WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |),
      |t AS (SELECT CAST(SUM(ca) AS BIGINT) AS n_a, CAST(SUM(cb) AS BIGINT) AS n_b FROM g),
      |d AS (
      |  SELECT v, n_a, n_b, CAST(cum_a AS BIGINT) AS cum_a, CAST(cum_b AS BIGINT) AS cum_b,
      |    CAST(CASE WHEN n_a = 0 OR n_b = 0 THEN 0
      |      ELSE abs(cum_a * 1000000 // n_a - cum_b * 1000000 // n_b) END AS BIGINT) AS d_micro
      |  FROM c, t
      |)
      |SELECT v AS at_value, n_a, n_b, cum_a, cum_b, d_micro
      |FROM d ORDER BY d_micro DESC, at_value LIMIT 1""".stripMargin

  // ---------------------------------------------------------------- q201

  /** q201: χ² independence of (source × lang) with Cramér's V
    * (`Profile.chiSquare`) — the categorical association test next to
    * q199's ordered-axis KS: is the language mix independent of the
    * source shard, or did one shard drift monolingual? Exact-integer χ²
    * micro-units over the full cell grid (zero cells included), V as a
    * round-6 double from the exact integers.
    */
  def q201ChiSquare(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.Profile.chiSquare(
      Tables.load(spark, sfDir, "documents").select(col("source"), col("lang")),
      "source", "lang")

  val q201Sql: String =
    """WITH obs AS (
      |  SELECT source AS a, lang AS b, CAST(COUNT(1) AS BIGINT) AS o
      |  FROM documents GROUP BY 1, 2
      |),
      |ra AS (SELECT a, CAST(SUM(o) AS BIGINT) AS r FROM obs GROUP BY a),
      |cb AS (SELECT b, CAST(SUM(o) AS BIGINT) AS c FROM obs GROUP BY b),
      |tot AS (
      |  SELECT CAST(SUM(o) AS BIGINT) AS n,
      |    CAST(COUNT(DISTINCT a) AS BIGINT) AS n_a,
      |    CAST(COUNT(DISTINCT b) AS BIGINT) AS n_b
      |  FROM obs
      |),
      |cells AS (
      |  SELECT r, c, COALESCE(o, 0) AS o
      |  FROM ra CROSS JOIN cb LEFT JOIN obs ON obs.a = ra.a AND obs.b = cb.b
      |),
      |s AS (
      |  SELECT n, n_a, n_b,
      |    CAST(COALESCE(SUM(
      |      (1000000 * (CAST(o AS HUGEINT) * n - CAST(r AS HUGEINT) * c)
      |               * (CAST(o AS HUGEINT) * n - CAST(r AS HUGEINT) * c))
      |      // (CAST(n AS HUGEINT) * r * c)), 0) AS BIGINT) AS chi2_micro
      |  FROM cells, tot GROUP BY n, n_a, n_b
      |)
      |SELECT n, n_a, n_b, (n_a - 1) * (n_b - 1) AS dof, chi2_micro,
      |  CASE WHEN n = 0 OR LEAST(n_a - 1, n_b - 1) <= 0 THEN 0.0
      |    ELSE ROUND(SQRT(CAST(chi2_micro AS DOUBLE) / 1000000.0
      |      / (CAST(n AS DOUBLE) * LEAST(n_a - 1, n_b - 1))), 6) END AS cramers_v
      |FROM s""".stripMargin

  // ---------------------------------------------------------------- q202

  /** q202: per-source AUC slice dashboard (`LmOps.binaryAucBy`) — for
    * each source shard, does document length predict English? One AUC
    * row per source, fully keyed two-phase ranking (every window
    * partitioned by source — zero SinglePartition crossings, the
    * strictly-more-parallel form of q196).
    */
  def q202GroupAuc(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.LmOps.binaryAucBy(
      Tables.load(spark, sfDir, "documents")
        .select(col("source"), col("n_chars").as("len_score"),
          when(col("lang") === "en", 1L).otherwise(0L).as("is_en")),
      Seq("source"), "len_score", "is_en")

  val q202Sql: String =
    """WITH base AS (
      |  SELECT source, n_chars AS score,
      |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      |  FROM documents
      |  -- complete-case key/score mirror of binaryAucBy (ADVICE r15: the
      |  -- engine drops NULL keys by contract; encode it on BOTH sides)
      |  WHERE source IS NOT NULL AND n_chars IS NOT NULL
      |),
      |g AS (
      |  SELECT source, score, CAST(SUM(y) AS BIGINT) AS p,
      |    CAST(COUNT(1) - SUM(y) AS BIGINT) AS ng
      |  FROM base GROUP BY 1, 2
      |),
      |c AS (
      |  SELECT source, p, ng, COALESCE(SUM(ng) OVER (PARTITION BY source
      |    ORDER BY score ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |    AS neg_below
      |  FROM g
      |),
      |r AS (
      |  SELECT source, CAST(SUM(p) AS BIGINT) AS n_pos,
      |    CAST(SUM(ng) AS BIGINT) AS n_neg,
      |    COALESCE(SUM(CAST(p AS HUGEINT) * (2 * neg_below + ng)), 0) AS num2
      |  FROM c GROUP BY source
      |),
      |m AS (
      |  SELECT source, n_pos + n_neg AS n, n_pos, n_neg,
      |    CAST(CASE WHEN n_pos = 0 OR n_neg = 0 THEN 0
      |      ELSE (CAST(1000000 AS HUGEINT) * num2)
      |        // (2 * CAST(n_pos AS HUGEINT) * n_neg) END AS BIGINT) AS auc_micro
      |  FROM r
      |)
      |SELECT source, n, n_pos, n_neg, auc_micro,
      |  auc_micro * 2 - 1000000 AS gini_micro
      |FROM m""".stripMargin

  // ---------------------------------------------------------------- q203

  /** q203: Spearman rank correlation of characters vs whitespace tokens
    * per document (`Profile.spearman`) — the monotone-association QA dial
    * (a re-tokenization or encoding bug that breaks the length
    * relationship shows up here before anything else does). Average-rank
    * Σd² form, exact integer micro-units, rank maps built with the
    * two-phase bucket discipline.
    */
  def q203Spearman(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.Profile.spearman(
      Tables.load(spark, sfDir, "documents")
        .select(col("n_chars"), size(split(col("text"), " ")).as("n_toks")),
      "n_chars", "n_toks")

  val q203Sql: String =
    """WITH base AS (
      |  SELECT n_chars AS x, len(string_split(text, ' ')) AS y FROM documents
      |),
      |r AS (
      |  -- doubled average rank: 2·RANK + tieCount − 1 = 2·cumBelow + cnt + 1
      |  SELECT 2 * RANK() OVER (ORDER BY x) + COUNT(1) OVER (PARTITION BY x) - 1 AS r2x,
      |         2 * RANK() OVER (ORDER BY y) + COUNT(1) OVER (PARTITION BY y) - 1 AS r2y
      |  FROM base
      |),
      |s AS (
      |  SELECT CAST(COUNT(1) AS BIGINT) AS n,
      |    COALESCE(SUM(CAST(r2x - r2y AS HUGEINT) * (r2x - r2y)), 0) AS sd
      |  FROM r
      |)
      |SELECT n,
      |  CAST(CASE WHEN n < 2 THEN 0 ELSE 1000000 -
      |    (CAST(3000000 AS HUGEINT) * sd)
      |      // (2 * (CAST(n AS HUGEINT) * n * n - n)) END AS BIGINT) AS rho_micro
      |FROM s""".stripMargin

  // ---------------------------------------------------------------- q206

  /** q206: per-language KS drift slice dashboard (`Profile.ksTwoSampleBy`)
    * — q199's shard-drift statistic computed per language: WHICH slice's
    * length distribution moved between src0 and src1? Fully keyed
    * two-phase CDFs (every window partitioned by lang — zero
    * SinglePartition) with the per-key argmax as a rank ≤ 1
    * WindowGroupLimit.
    */
  def q206KsByLang(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.Profile.ksTwoSampleBy(
      Tables.load(spark, sfDir, "documents")
        .select(col("lang"), col("n_chars"), col("source")),
      Seq("lang"), "n_chars", "source", "src0", "src1")

  val q206Sql: String =
    """WITH g AS (
      |  SELECT lang, n_chars AS v,
      |    CAST(SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
      |    CAST(SUM(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS BIGINT) AS cb
      |  FROM documents WHERE source IN ('src0', 'src1')
      |    -- complete-case key mirror of ksTwoSampleBy (ADVICE r15)
      |    AND lang IS NOT NULL AND n_chars IS NOT NULL
      |  GROUP BY lang, n_chars
      |),
      |t AS (
      |  SELECT lang, CAST(SUM(ca) AS BIGINT) AS n_a, CAST(SUM(cb) AS BIGINT) AS n_b
      |  FROM g GROUP BY lang
      |),
      |c AS (
      |  SELECT g.lang, v, n_a, n_b,
      |    CAST(SUM(ca) OVER w AS BIGINT) AS cum_a,
      |    CAST(SUM(cb) OVER w AS BIGINT) AS cum_b
      |  FROM g JOIN t USING (lang)
      |  WINDOW w AS (PARTITION BY g.lang ORDER BY v
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |),
      |d AS (
      |  SELECT lang, v, n_a, n_b, cum_a, cum_b,
      |    CAST(CASE WHEN n_a = 0 OR n_b = 0 THEN 0
      |      ELSE abs(cum_a * 1000000 // n_a - cum_b * 1000000 // n_b)
      |      END AS BIGINT) AS d_micro,
      |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY
      |      CAST(CASE WHEN n_a = 0 OR n_b = 0 THEN 0
      |        ELSE abs(cum_a * 1000000 // n_a - cum_b * 1000000 // n_b)
      |        END AS BIGINT) DESC, v) AS rn
      |  FROM c
      |)
      |SELECT lang, v AS at_value, n_a, n_b, cum_a, cum_b, d_micro
      |FROM d WHERE rn = 1""".stripMargin

  // ---------------------------------------------------------------- q208

  /** q208: PER-SOURCE isotonic calibration (`LmOps.isotonicCalibrateBy`)
    * — the calibration sibling of the q202/q206 slice dashboards: for
    * each source shard, PAV-calibrate the length-based English
    * probability (prob_micro = min(1000·n_chars, 10⁶), the q202
    * predictor rescaled into the probability domain) against the is_en
    * label. One independent monotone fit per source from ONE
    * groupBy(source, bin) pass — no SinglePartition anywhere (keyed-plan
    * audit in PlanAuditSpec); the fitted steps land in the oracle as a
    * per-(source, bin) VALUES table (the q204 dynamicOracle pattern) so
    * binning, counts, join and the per-key step values are all
    * hash-verified; the PAV pooling itself is spec-gated (EvalOpsSpec
    * planted per-key violators).
    */
  def q208IsotonicBySource(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("source"),
        least(col("n_chars") * 1000L, lit(1000000L)).as("prob_micro"),
        when(col("lang") === "en", 1L).otherwise(0L).as("is_en"))
    val out = graft.operators.LmOps.isotonicCalibrateBy(docs, Seq("source"),
      "prob_micro", "is_en", bins = 32)
    // `out` is literal-built from the bounded collected bin table, so
    // harvesting the fitted steps for the oracle re-runs NO corpus work
    // BOUND: ≤ |sources| × 32 bin rows (out is literal-built from that table)
    q208Fitted.put(sfDir, out.select(col("source"), col("bin"), col("iso_micro"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq)
    out
  }

  // fits keyed by sfDir (the q193Fitted/q204Fitted contract)
  private val q208Fitted = scala.collection.concurrent.TrieMap
    .empty[String, Seq[(String, Long, Long)]]

  /** Data-dependent q208 oracle: per-(source, bin) fitted steps as a
    * VALUES table; binning, counts and the two-key join replay
    * relationally. None when never run or run on several sfDirs; empty
    * fits emit a guaranteed-empty oracle (the q204Oracle guards). */
  def q208Oracle: Option[String] = (q208Fitted.toMap match {
    case m if m.size == 1 => Some(m.head._2)
    case _ => None
  }).map { fitted =>
    val cal =
      if (fitted.isEmpty)
        "cal(source, bin, iso_micro) AS (SELECT CAST(NULL AS VARCHAR), " +
          "CAST(NULL AS BIGINT), CAST(NULL AS BIGINT) WHERE FALSE)"
      else {
        val values = fitted.map { case (s, b, v) =>
          s"('${s.replace("'", "''")}', $b, $v)"
        }.mkString(", ")
        s"cal(source, bin, iso_micro) AS (SELECT * FROM (VALUES $values) v(s2, b2, i2))"
      }
    s"""WITH p AS (
       |  SELECT source, LEAST(n_chars * 1000, 1000000) AS pm,
       |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
       |  FROM documents
       |  -- complete-case key/prob mirror of isotonicCalibrateBy
       |  WHERE source IS NOT NULL AND n_chars IS NOT NULL
       |),
       |b AS (
       |  SELECT source,
       |    CAST(GREATEST(LEAST(pm * 32 // 1000000, 31), 0) AS BIGINT) AS bin,
       |    CAST(COUNT(1) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS n_pos,
       |    CAST(SUM(pm) AS BIGINT) AS spm
       |  FROM p GROUP BY 1, 2
       |),
       |$cal
       |SELECT b.source, b.bin, n, n_pos, spm // n AS conf_micro,
       |  CAST(iso_micro AS BIGINT) AS iso_micro
       |FROM b JOIN cal USING (source, bin)""".stripMargin
  }

  // ---------------------------------------------------------------- q209

  /** q209: per-source paired DeLong comparison
    * (`LmOps.binaryAucCompareBy`) — q207's A/B significance test composed
    * with q202's keyed slice discipline: for each source shard, does raw
    * character length (scorer A) rank English documents better than
    * whitespace token count (scorer B), and is the per-slice gap real or
    * noise? The scorers share every label, so the paired covariance term
    * shrinks each slice's SE; every window in both placement maps is
    * partitioned by (source) or (source, b) — zero SinglePartition (the
    * per-slice A/B readout an eval team consumes after a scorer swap).
    */
  def q209AucCompareBySource(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.LmOps.binaryAucCompareBy(
      Tables.load(spark, sfDir, "documents")
        .select(col("source"), col("n_chars").as("len_score"),
          size(split(col("text"), " ")).as("tok_score"),
          when(col("lang") === "en", 1L).otherwise(0L).as("is_en")),
      Seq("source"), "len_score", "tok_score", "is_en")

  val q209Sql: String = {
    def placements(tag: String, scoreCol: String): String =
      s"""g$tag AS (
         |  SELECT source, $scoreCol AS score, CAST(SUM(y) AS BIGINT) AS p,
         |    CAST(COUNT(1) - SUM(y) AS BIGINT) AS ng
         |  FROM base GROUP BY 1, 2
         |),
         |t$tag AS (SELECT source, CAST(SUM(p) AS BIGINT) AS tp FROM g$tag GROUP BY source),
         |p$tag AS (
         |  SELECT g$tag.source, score,
         |    2 * COALESCE(SUM(ng) OVER w, 0) + ng AS p2,
         |    2 * (tp - COALESCE(SUM(p) OVER w, 0) - p) + p AS r2
         |  FROM g$tag JOIN t$tag USING (source)
         |  WINDOW w AS (PARTITION BY g$tag.source ORDER BY score
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |)""".stripMargin
    s"""WITH base AS (
       |  SELECT source, n_chars AS sa, len(string_split(text, ' ')) AS sb,
       |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
       |  FROM documents
       |  -- complete-case key/score mirror of binaryAucCompareBy
       |  WHERE source IS NOT NULL AND n_chars IS NOT NULL AND text IS NOT NULL
       |),
       |${placements("a", "sa")},
       |${placements("b", "sb")},
       |placed AS (
       |  SELECT base.source, y,
       |    CASE WHEN y = 1 THEN pa.p2 ELSE pa.r2 END AS ua,
       |    CASE WHEN y = 1 THEN pb.p2 ELSE pb.r2 END AS ub
       |  FROM base
       |  JOIN pa ON base.source = pa.source AND base.sa = pa.score
       |  JOIN pb ON base.source = pb.source AND base.sb = pb.score
       |),
       |s AS (
       |  SELECT source, CAST(SUM(y) AS BIGINT) AS n_pos,
       |    CAST(COUNT(1) - SUM(y) AS BIGINT) AS n_neg,
       |    COALESCE(SUM(CASE WHEN y = 1 THEN CAST(ua AS HUGEINT) END), 0) AS sa10,
       |    COALESCE(SUM(CASE WHEN y = 1 THEN CAST(ua AS HUGEINT) * ua END), 0) AS saa10,
       |    COALESCE(SUM(CASE WHEN y = 1 THEN CAST(ub AS HUGEINT) END), 0) AS sb10,
       |    COALESCE(SUM(CASE WHEN y = 1 THEN CAST(ub AS HUGEINT) * ub END), 0) AS sbb10,
       |    COALESCE(SUM(CASE WHEN y = 1 THEN CAST(ua AS HUGEINT) * ub END), 0) AS sab10,
       |    COALESCE(SUM(CASE WHEN y = 0 THEN CAST(ua AS HUGEINT) END), 0) AS sa01,
       |    COALESCE(SUM(CASE WHEN y = 0 THEN CAST(ua AS HUGEINT) * ua END), 0) AS saa01,
       |    COALESCE(SUM(CASE WHEN y = 0 THEN CAST(ub AS HUGEINT) END), 0) AS sb01,
       |    COALESCE(SUM(CASE WHEN y = 0 THEN CAST(ub AS HUGEINT) * ub END), 0) AS sbb01,
       |    COALESCE(SUM(CASE WHEN y = 0 THEN CAST(ua AS HUGEINT) * ub END), 0) AS sab01
       |  FROM placed GROUP BY source
       |),
       |m AS (
       |  SELECT source, n_pos + n_neg AS n, n_pos, n_neg,
       |    CAST(CASE WHEN n_pos = 0 OR n_neg = 0 THEN 0
       |      ELSE (CAST(1000000 AS HUGEINT) * sa10)
       |        // (2 * CAST(n_pos AS HUGEINT) * n_neg) END AS BIGINT) AS auc_a_micro,
       |    CAST(CASE WHEN n_pos = 0 OR n_neg = 0 THEN 0
       |      ELSE (CAST(1000000 AS HUGEINT) * sb10)
       |        // (2 * CAST(n_pos AS HUGEINT) * n_neg) END AS BIGINT) AS auc_b_micro,
       |    CASE WHEN n_pos < 2 OR n_neg < 2 THEN 0.0 ELSE
       |      ROUND(SQRT(GREATEST(0.0,
       |        (CAST(n_pos * saa10 - sa10 * sa10 AS DOUBLE)
       |         + CAST(n_pos * sbb10 - sb10 * sb10 AS DOUBLE)
       |         - 2.0 * CAST(n_pos * sab10 - sa10 * sb10 AS DOUBLE))
       |          / (4.0 * CAST(n_neg AS DOUBLE) * CAST(n_neg AS DOUBLE)
       |             * CAST(n_pos AS DOUBLE) * CAST(n_pos - 1 AS DOUBLE)
       |             * CAST(n_pos AS DOUBLE)) +
       |        (CAST(n_neg * saa01 - sa01 * sa01 AS DOUBLE)
       |         + CAST(n_neg * sbb01 - sb01 * sb01 AS DOUBLE)
       |         - 2.0 * CAST(n_neg * sab01 - sa01 * sb01 AS DOUBLE))
       |          / (4.0 * CAST(n_pos AS DOUBLE) * CAST(n_pos AS DOUBLE)
       |             * CAST(n_neg AS DOUBLE) * CAST(n_neg - 1 AS DOUBLE)
       |             * CAST(n_neg AS DOUBLE)))), 6) END AS se6
       |  FROM s
       |)
       |SELECT source, n, n_pos, n_neg, auc_a_micro, auc_b_micro,
       |  auc_a_micro - auc_b_micro AS diff_micro, se6,
       |  CASE WHEN se6 <= 0.0 THEN 0.0
       |    ELSE ROUND((CAST(auc_a_micro - auc_b_micro AS DOUBLE) / 1000000.0)
       |      / se6, 6) END AS z6
       |FROM m""".stripMargin
  }

  // ---------------------------------------------------------------- q210

  /** q210: average precision (`LmOps.binaryAp`) of the anchor probe —
    * the PR-curve companion to q196's AUC, and the metric that stays
    * informative under the class imbalance retrieval evals actually have
    * (AUC saturates when negatives dominate; AP ≈ precision mass).
    * Exact-integer micro AP over the distinct-score table (per-threshold
    * floors, descending two-phase cumulative counts), plus the
    * prevalence baseline the AP must beat.
    */
  def q210AvgPrecision(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.LmOps.binaryAp(sharedAnchorScored(spark, sfDir),
      "score_micro", "y")

  val q210Sql: String =
    s"""WITH $anchorScoredSql,
       |g AS (
       |  SELECT score_micro AS score, CAST(SUM(y) AS BIGINT) AS p,
       |    CAST(COUNT(1) - SUM(y) AS BIGINT) AS ng
       |  FROM scored GROUP BY score_micro
       |),
       |t AS (
       |  SELECT CAST(COALESCE(SUM(p), 0) AS BIGINT) AS tp,
       |    CAST(COALESCE(SUM(p + ng), 0) AS BIGINT) AS tot
       |  FROM g
       |),
       |c AS (
       |  SELECT p, ng, tp, tot,
       |    COALESCE(SUM(p) OVER w, 0) AS pos_below,
       |    COALESCE(SUM(p + ng) OVER w, 0) AS all_below
       |  FROM g, t
       |  WINDOW w AS (ORDER BY score
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |),
       |s AS (
       |  SELECT CAST(COALESCE(SUM(p), 0) AS BIGINT) AS n_pos,
       |    CAST(COALESCE(SUM(ng), 0) AS BIGINT) AS n_neg,
       |    COALESCE(SUM((CAST(1000000 AS HUGEINT) * p * (tp - pos_below))
       |      // (tot - all_below)), 0) AS ts
       |  FROM c
       |)
       |SELECT n_pos + n_neg AS n, n_pos, n_neg,
       |  CAST(CASE WHEN n_pos = 0 THEN 0 ELSE ts // n_pos END AS BIGINT)
       |    AS ap_micro,
       |  CAST(CASE WHEN n_pos + n_neg = 0 THEN 0
       |    ELSE CAST(1000000 AS HUGEINT) * n_pos // (n_pos + n_neg)
       |    END AS BIGINT) AS prevalence_micro
       |FROM s""".stripMargin

  // ---------------------------------------------------------------- q213

  /** q213: per-source average precision (`LmOps.binaryApBy`) — the
    * PR-metric slice dashboard closing the keyed eval family: per source
    * shard, how well does length rank English documents in PRECISION
    * terms, against each slice's own prevalence baseline? The slice form
    * matters most for AP because class imbalance varies by slice — the
    * slices where AUC is most misleading are exactly the ones a global
    * AP averages away. Fully keyed two-phase pass, zero SinglePartition.
    */
  def q213ApBySource(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.LmOps.binaryApBy(
      Tables.load(spark, sfDir, "documents")
        .select(col("source"), col("n_chars").as("len_score"),
          when(col("lang") === "en", 1L).otherwise(0L).as("is_en")),
      Seq("source"), "len_score", "is_en")

  val q213Sql: String =
    """WITH base AS (
      |  SELECT source, n_chars AS score,
      |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      |  FROM documents
      |  -- complete-case key/score mirror of binaryApBy
      |  WHERE source IS NOT NULL AND n_chars IS NOT NULL
      |),
      |g AS (
      |  SELECT source, score, CAST(SUM(y) AS BIGINT) AS p,
      |    CAST(COUNT(1) - SUM(y) AS BIGINT) AS ng
      |  FROM base GROUP BY 1, 2
      |),
      |t AS (
      |  SELECT source, CAST(SUM(p) AS BIGINT) AS tp,
      |    CAST(SUM(p + ng) AS BIGINT) AS tot
      |  FROM g GROUP BY source
      |),
      |c AS (
      |  SELECT g.source, p, ng, tp, tot,
      |    COALESCE(SUM(p) OVER w, 0) AS pos_below,
      |    COALESCE(SUM(p + ng) OVER w, 0) AS all_below
      |  FROM g JOIN t USING (source)
      |  WINDOW w AS (PARTITION BY g.source ORDER BY score
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |),
      |s AS (
      |  SELECT source, CAST(SUM(p) AS BIGINT) AS n_pos,
      |    CAST(SUM(ng) AS BIGINT) AS n_neg,
      |    COALESCE(SUM(CASE WHEN p = 0 THEN 0 ELSE
      |      (CAST(1000000 AS HUGEINT) * p * (tp - pos_below))
      |        // (tot - all_below) END), 0) AS ts
      |  FROM c GROUP BY source
      |)
      |SELECT source, n_pos + n_neg AS n, n_pos, n_neg,
      |  CAST(CASE WHEN n_pos = 0 THEN 0 ELSE ts // n_pos END AS BIGINT)
      |    AS ap_micro,
      |  CAST(CASE WHEN n_pos + n_neg = 0 THEN 0
      |    ELSE CAST(1000000 AS HUGEINT) * n_pos // (n_pos + n_neg)
      |    END AS BIGINT) AS prevalence_micro
      |FROM s""".stripMargin

  // ---------------------------------------------------------------- q211

  /** q211: per-source calibration report (`LmOps.calibrationReportBy`) —
    * the reliability slice dashboard completing the keyed eval family
    * (q202 AUC slices, q206 KS slices, q208 isotonic slices, q209
    * paired-z slices): per source shard, is the length-based English
    * probability over/under-confident, and what are the slice's Brier
    * and ECE? Per-key bins and scalars, zero SinglePartition.
    */
  def q211CalibrationBySource(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.LmOps.calibrationReportBy(
      Tables.load(spark, sfDir, "documents")
        .select(col("source"),
          least(col("n_chars") * 1000L, lit(1000000L)).as("prob_micro"),
          when(col("lang") === "en", 1L).otherwise(0L).as("is_en")),
      Seq("source"), "prob_micro", "is_en", bins = 10)

  val q211Sql: String =
    """WITH p AS (
      |  SELECT source, LEAST(n_chars * 1000, 1000000) AS pm,
      |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      |  FROM documents
      |  -- complete-case key/prob mirror of calibrationReportBy
      |  WHERE source IS NOT NULL AND n_chars IS NOT NULL
      |),
      |b AS (
      |  SELECT source,
      |    CAST(GREATEST(LEAST(pm * 10 // 1000000, 9), 0) AS BIGINT) AS bin,
      |    CAST(COUNT(1) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS n_pos,
      |    CAST(SUM(pm) AS BIGINT) AS spm,
      |    SUM(CAST(pm - y * 1000000 AS HUGEINT) * (pm - y * 1000000)) AS sq
      |  FROM p GROUP BY 1, 2
      |),
      |pb AS (
      |  SELECT source, bin, n, n_pos, spm // n AS conf_micro,
      |    n_pos * 1000000 // n AS acc_micro, sq
      |  FROM b
      |),
      |gl AS (
      |  SELECT source,
      |    CAST(SUM(sq) // (CAST(SUM(n) AS HUGEINT) * 1000000) AS BIGINT)
      |      AS brier_micro,
      |    CAST(SUM(n * abs(acc_micro - conf_micro)) // SUM(n) AS BIGINT)
      |      AS ece_micro
      |  FROM pb GROUP BY source
      |)
      |SELECT pb.source, bin, n, n_pos, conf_micro, acc_micro,
      |  brier_micro, ece_micro
      |FROM pb JOIN gl USING (source)""".stripMargin

  // ---------------------------------------------------------------- q212

  /** q212: PSI length drift between the q199 source pair
    * (`Profile.psi`) — the mass-weighted drift total (symmetric-KL over
    * equal-width buckets, the model-risk 0.1/0.25 dial) complementing
    * q199's KS (max CDF gap) and q166's per-bucket L1 shares: KS says
    * WHERE the distribution moved, PSI says HOW MUCH in aggregate.
    * Exact-integer shares; ln terms round-9 and decimal-summed so the
    * scalar is engine-order-free.
    */
  def q212PsiDrift(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.Profile.psi(
      Tables.load(spark, sfDir, "documents").select(col("n_chars"), col("source")),
      "n_chars", "source", "src0", "src1", buckets = 16)

  val q212Sql: String =
    """WITH base AS (
      |  SELECT n_chars AS v,
      |    CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS ia
      |  FROM documents
      |  WHERE source IN ('src0', 'src1') AND n_chars IS NOT NULL
      |),
      |st AS (SELECT MIN(v) AS mn, MAX(v) AS mx FROM base),
      |g AS (
      |  SELECT (v - mn) // ((mx - mn) // 16 + 1) AS bucket,
      |    CAST(SUM(ia) AS BIGINT) AS n_a,
      |    CAST(COUNT(1) - SUM(ia) AS BIGINT) AS n_b
      |  FROM base, st GROUP BY 1
      |),
      |t AS (
      |  SELECT CAST(COALESCE(SUM(n_a), 0) AS BIGINT) AS ta,
      |    CAST(COALESCE(SUM(n_b), 0) AS BIGINT) AS tb
      |  FROM g
      |),
      |terms AS (
      |  SELECT bucket,
      |    CAST(mn + bucket * ((mx - mn) // 16 + 1) AS BIGINT) AS lo,
      |    n_a, n_b,
      |    CAST(n_a * 1000000 // ta AS BIGINT) AS share_a_micro,
      |    CAST(n_b * 1000000 // tb AS BIGINT) AS share_b_micro,
      |    CASE WHEN n_a > 0 AND n_b > 0 THEN
      |      ROUND((CAST(n_a AS DOUBLE) / ta - CAST(n_b AS DOUBLE) / tb)
      |        * LN(CAST(n_a AS DOUBLE) * tb / (CAST(n_b AS DOUBLE) * ta)), 9)
      |    END AS term9
      |  FROM g, t, st
      |),
      |sc AS (
      |  SELECT ROUND(CAST(COALESCE(SUM(CAST(term9 AS DECIMAL(24,9))), 0)
      |      AS DOUBLE), 6) AS psi6,
      |    CAST(COALESCE(SUM(CASE WHEN (n_a = 0) != (n_b = 0) THEN 1 ELSE 0
      |      END), 0) AS BIGINT) AS n_skipped
      |  FROM terms
      |)
      |SELECT bucket, lo, n_a, n_b, share_a_micro, share_b_micro, term9,
      |  psi6, n_skipped
      |FROM terms, sc""".stripMargin

  // ---------------------------------------------------------------- q214

  /** q214: per-language PSI drift slices (`Profile.psiBy`) — q206's KS
    * slice dashboard in mass-weighted terms: WHICH language's length
    * distribution moved between src0 and src1, and by how much total?
    * Per-key bucket edges (each slice buckets its own min/max), per-key
    * scalars, zero SinglePartition.
    */
  def q214PsiByLang(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.Profile.psiBy(
      Tables.load(spark, sfDir, "documents")
        .select(col("lang"), col("n_chars"), col("source")),
      Seq("lang"), "n_chars", "source", "src0", "src1", buckets = 8)

  val q214Sql: String =
    """WITH base AS (
      |  SELECT lang, n_chars AS v,
      |    CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS ia
      |  FROM documents
      |  WHERE source IN ('src0', 'src1')
      |    AND lang IS NOT NULL AND n_chars IS NOT NULL
      |),
      |st AS (SELECT lang, MIN(v) AS mn, MAX(v) AS mx FROM base GROUP BY lang),
      |g AS (
      |  SELECT base.lang, (v - mn) // ((mx - mn) // 8 + 1) AS bucket,
      |    CAST(SUM(ia) AS BIGINT) AS n_a,
      |    CAST(COUNT(1) - SUM(ia) AS BIGINT) AS n_b
      |  FROM base JOIN st USING (lang) GROUP BY 1, 2
      |),
      |t AS (
      |  SELECT lang, CAST(SUM(n_a) AS BIGINT) AS ta,
      |    CAST(SUM(n_b) AS BIGINT) AS tb
      |  FROM g GROUP BY lang
      |),
      |terms AS (
      |  SELECT g.lang, bucket,
      |    CAST(mn + bucket * ((mx - mn) // 8 + 1) AS BIGINT) AS lo,
      |    n_a, n_b,
      |    CAST(n_a * 1000000 // ta AS BIGINT) AS share_a_micro,
      |    CAST(n_b * 1000000 // tb AS BIGINT) AS share_b_micro,
      |    CASE WHEN n_a > 0 AND n_b > 0 THEN
      |      ROUND((CAST(n_a AS DOUBLE) / ta - CAST(n_b AS DOUBLE) / tb)
      |        * LN(CAST(n_a AS DOUBLE) * tb / (CAST(n_b AS DOUBLE) * ta)), 9)
      |    END AS term9
      |  FROM g JOIN t USING (lang) JOIN st USING (lang)
      |),
      |sc AS (
      |  SELECT lang,
      |    ROUND(CAST(COALESCE(SUM(CAST(term9 AS DECIMAL(24,9))), 0)
      |      AS DOUBLE), 6) AS psi6,
      |    CAST(COALESCE(SUM(CASE WHEN (n_a = 0) != (n_b = 0) THEN 1 ELSE 0
      |      END), 0) AS BIGINT) AS n_skipped
      |  FROM terms GROUP BY lang
      |)
      |SELECT terms.lang, bucket, lo, n_a, n_b, share_a_micro,
      |  share_b_micro, term9, psi6, n_skipped
      |FROM terms JOIN sc USING (lang)""".stripMargin

  // ---------------------------------------------------------------- q215

  /** q215: mutual information of source × language
    * (`Profile.mutualInfo`) — the dependence-strength dial behind q201's
    * χ² significance: how many nats does a document's source shard give
    * about its language (and normalized to [0,1])? The metadata
    * leakage/redundancy triage a curation team runs — χ² saturates at
    * corpus n, MI doesn't. No cell grid: only observed cells shuffle.
    */
  def q215MutualInfo(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.Profile.mutualInfo(
      Tables.load(spark, sfDir, "documents").select(col("source"), col("lang")),
      "source", "lang")

  val q215Sql: String =
    """WITH obs AS (
      |  SELECT source AS a, lang AS b, CAST(COUNT(1) AS BIGINT) AS o
      |  FROM documents
      |  WHERE source IS NOT NULL AND lang IS NOT NULL
      |  GROUP BY 1, 2
      |),
      |ra AS (SELECT a, CAST(SUM(o) AS BIGINT) AS r FROM obs GROUP BY a),
      |cb AS (SELECT b, CAST(SUM(o) AS BIGINT) AS c FROM obs GROUP BY b),
      |t AS (
      |  SELECT CAST(COALESCE(SUM(o), 0) AS BIGINT) AS n,
      |    CAST(COUNT(DISTINCT a) AS BIGINT) AS n_a,
      |    CAST(COUNT(DISTINCT b) AS BIGINT) AS n_b
      |  FROM obs
      |),
      |mi AS (
      |  SELECT ROUND(CAST(COALESCE(SUM(CAST(
      |    ROUND(CAST(o AS DOUBLE) / n *
      |      LN(CAST(o AS DOUBLE) * n / (CAST(r AS DOUBLE) * c)), 9)
      |    AS DECIMAL(24,9))), 0) AS DOUBLE), 6) AS mi6
      |  FROM obs JOIN ra USING (a) JOIN cb USING (b), t
      |),
      |ha AS (
      |  SELECT ROUND(CAST(COALESCE(SUM(CAST(
      |    ROUND(-(CAST(r AS DOUBLE) / n) * LN(CAST(r AS DOUBLE) / n), 9)
      |    AS DECIMAL(24,9))), 0) AS DOUBLE), 6) AS h_a6
      |  FROM ra, t
      |),
      |hb AS (
      |  SELECT ROUND(CAST(COALESCE(SUM(CAST(
      |    ROUND(-(CAST(c AS DOUBLE) / n) * LN(CAST(c AS DOUBLE) / n), 9)
      |    AS DECIMAL(24,9))), 0) AS DOUBLE), 6) AS h_b6
      |  FROM cb, t
      |)
      |SELECT n, n_a, n_b, mi6, h_a6, h_b6,
      |  CASE WHEN h_a6 <= 0.0 OR h_b6 <= 0.0 THEN 0.0
      |    ELSE ROUND(mi6 / SQRT(h_a6 * h_b6), 6) END AS nmi6
      |FROM t, mi, ha, hb""".stripMargin

  // ---------------------------------------------------------------- q216

  /** q216: per-source AUC with DeLong CIs (`LmOps.binaryAucSeBy`) — the
    * q202 slice dashboard upgraded to intervals: a 300-row slice and a
    * 3M-row slice get very different error bars, and the point dashboard
    * hides exactly that. Keyed placements (no row join — one scorer's
    * variance needs only distinct-score sums), zero SinglePartition.
    */
  def q216GroupAucCi(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.LmOps.binaryAucSeBy(
      Tables.load(spark, sfDir, "documents")
        .select(col("source"), col("n_chars").as("len_score"),
          when(col("lang") === "en", 1L).otherwise(0L).as("is_en")),
      Seq("source"), "len_score", "is_en")

  val q216Sql: String =
    """WITH base AS (
      |  SELECT source, n_chars AS score,
      |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      |  FROM documents
      |  -- complete-case key/score mirror of binaryAucSeBy
      |  WHERE source IS NOT NULL AND n_chars IS NOT NULL
      |),
      |g AS (
      |  SELECT source, score, CAST(SUM(y) AS BIGINT) AS p,
      |    CAST(COUNT(1) - SUM(y) AS BIGINT) AS ng
      |  FROM base GROUP BY 1, 2
      |),
      |c AS (
      |  SELECT source, p, ng,
      |    COALESCE(SUM(ng) OVER w, 0) AS neg_below,
      |    COALESCE(SUM(p) OVER w, 0) AS pos_below
      |  FROM g
      |  WINDOW w AS (PARTITION BY source ORDER BY score
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |),
      |t AS (
      |  SELECT source, CAST(COALESCE(SUM(p), 0) AS BIGINT) AS n_pos,
      |    CAST(COALESCE(SUM(ng), 0) AS BIGINT) AS n_neg,
      |    COALESCE(SUM(CAST(p AS HUGEINT) * (2 * neg_below + ng)), 0) AS a10,
      |    COALESCE(SUM(CAST(p AS HUGEINT) * (2 * neg_below + ng)
      |      * (2 * neg_below + ng)), 0) AS b10
      |  FROM c GROUP BY source
      |),
      |r AS (
      |  SELECT c.source, t.n_pos, t.n_neg, t.a10, t.b10,
      |    COALESCE(SUM(CAST(ng AS HUGEINT)
      |      * ((n_pos - pos_below - p) * 2 + p)), 0) AS a01,
      |    COALESCE(SUM(CAST(ng AS HUGEINT)
      |      * ((n_pos - pos_below - p) * 2 + p)
      |      * ((n_pos - pos_below - p) * 2 + p)), 0) AS b01
      |  FROM c JOIN t ON c.source = t.source
      |  GROUP BY c.source, t.n_pos, t.n_neg, t.a10, t.b10
      |),
      |m AS (
      |  SELECT source, n_pos + n_neg AS n, n_pos, n_neg,
      |    CAST(CASE WHEN n_pos = 0 OR n_neg = 0 THEN 0
      |      ELSE (CAST(1000000 AS HUGEINT) * a10)
      |        // (2 * CAST(n_pos AS HUGEINT) * n_neg) END AS BIGINT) AS auc_micro,
      |    CASE WHEN n_pos < 2 OR n_neg < 2 THEN 0.0 ELSE
      |      ROUND(SQRT(
      |        CAST(n_pos * b10 - a10 * a10 AS DOUBLE)
      |          / (4.0 * CAST(n_neg AS DOUBLE) * CAST(n_neg AS DOUBLE)
      |             * CAST(n_pos AS DOUBLE) * CAST(n_pos - 1 AS DOUBLE)
      |             * CAST(n_pos AS DOUBLE)) +
      |        CAST(n_neg * b01 - a01 * a01 AS DOUBLE)
      |          / (4.0 * CAST(n_pos AS DOUBLE) * CAST(n_pos AS DOUBLE)
      |             * CAST(n_neg AS DOUBLE) * CAST(n_neg - 1 AS DOUBLE)
      |             * CAST(n_neg AS DOUBLE))), 6) END AS se6
      |  FROM r
      |)
      |SELECT source, n, n_pos, n_neg, auc_micro, se6,
      |  ROUND(GREATEST(0.0, CAST(auc_micro AS DOUBLE) / 1000000.0
      |    - 1.959964 * se6), 6) AS lo6,
      |  ROUND(LEAST(1.0, CAST(auc_micro AS DOUBLE) / 1000000.0
      |    + 1.959964 * se6), 6) AS hi6
      |FROM m""".stripMargin

  // ---------------------------------------------------------------- q217

  /** q217: per-language mutual information of source × length bucket
    * (`Profile.mutualInfoBy`) — q215's dependence dial SLICED the way the
    * leakage-triage dashboards consume it: within each language, how many
    * nats does a document's source shard still give about its length
    * band? A global MI (q215) can hide a slice where one shard's lengths
    * are fully determined. Per-key observed-cell tables and marginals
    * only (no |A|×|B| grid), every aggregate and join keyed — zero
    * SinglePartition.
    */
  def q217MutualInfoByLang(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.Profile.mutualInfoBy(
      Tables.load(spark, sfDir, "documents")
        .select(col("lang"), col("source"),
          expr("n_chars DIV 256").as("len_band")),
      Seq("lang"), "source", "len_band")

  val q217Sql: String =
    """WITH obs AS (
      |  SELECT lang, source AS a, CAST(n_chars // 256 AS VARCHAR) AS b,
      |    CAST(COUNT(1) AS BIGINT) AS o
      |  FROM documents
      |  -- complete-case key/column mirror of mutualInfoBy
      |  WHERE lang IS NOT NULL AND source IS NOT NULL AND n_chars IS NOT NULL
      |  GROUP BY 1, 2, 3
      |),
      |ra AS (SELECT lang, a, CAST(SUM(o) AS BIGINT) AS r FROM obs GROUP BY 1, 2),
      |cb AS (SELECT lang, b, CAST(SUM(o) AS BIGINT) AS c FROM obs GROUP BY 1, 2),
      |t AS (
      |  SELECT lang, CAST(COALESCE(SUM(o), 0) AS BIGINT) AS n,
      |    CAST(COUNT(DISTINCT a) AS BIGINT) AS n_a,
      |    CAST(COUNT(DISTINCT b) AS BIGINT) AS n_b
      |  FROM obs GROUP BY lang
      |),
      |mi AS (
      |  SELECT obs.lang, ROUND(CAST(COALESCE(SUM(CAST(
      |    ROUND(CAST(o AS DOUBLE) / n *
      |      LN(CAST(o AS DOUBLE) * n / (CAST(r AS DOUBLE) * c)), 9)
      |    AS DECIMAL(24,9))), 0) AS DOUBLE), 6) AS mi6
      |  FROM obs JOIN ra USING (lang, a) JOIN cb USING (lang, b)
      |    JOIN t USING (lang)
      |  GROUP BY obs.lang
      |),
      |ha AS (
      |  SELECT ra.lang, ROUND(CAST(COALESCE(SUM(CAST(
      |    ROUND(-(CAST(r AS DOUBLE) / n) * LN(CAST(r AS DOUBLE) / n), 9)
      |    AS DECIMAL(24,9))), 0) AS DOUBLE), 6) AS h_a6
      |  FROM ra JOIN t USING (lang) GROUP BY ra.lang
      |),
      |hb AS (
      |  SELECT cb.lang, ROUND(CAST(COALESCE(SUM(CAST(
      |    ROUND(-(CAST(c AS DOUBLE) / n) * LN(CAST(c AS DOUBLE) / n), 9)
      |    AS DECIMAL(24,9))), 0) AS DOUBLE), 6) AS h_b6
      |  FROM cb JOIN t USING (lang) GROUP BY cb.lang
      |)
      |SELECT lang, n, n_a, n_b, mi6, h_a6, h_b6,
      |  CASE WHEN h_a6 <= 0.0 OR h_b6 <= 0.0 THEN 0.0
      |    ELSE ROUND(mi6 / SQRT(h_a6 * h_b6), 6) END AS nmi6
      |FROM t JOIN mi USING (lang) JOIN ha USING (lang) JOIN hb USING (lang)""".stripMargin

  // ---------------------------------------------------------------- q218

  /** q218: Kendall's τ-b of length band × token band
    * (`Profile.kendallTauB`) — q203's monotone-association dial in its
    * tie-aware form, on the COARSE buckets where Σd²-Spearman's tie
    * correction is weakest (64-char length bands vs 8-token bands tie
    * heavily by construction). Exact concordant/discordant pair counts
    * from a dense-grid double cumulative — two chained windows, each
    * partitioned by one axis, zero SinglePartition, no pair join.
    */
  def q218KendallTau(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.Profile.kendallTauB(
      Tables.load(spark, sfDir, "documents")
        .select(expr("n_chars DIV 64").as("len_band"),
          expr("size(split(text, ' ')) DIV 8").as("tok_band")),
      "len_band", "tok_band")

  val q218Sql: String =
    """WITH base AS (
      |  SELECT n_chars // 64 AS x, len(string_split(text, ' ')) // 8 AS y
      |  FROM documents
      |  -- complete-case mirror of kendallTauB (both bands derive here)
      |  WHERE n_chars IS NOT NULL AND text IS NOT NULL
      |),
      |cells AS (SELECT x, y, CAST(COUNT(1) AS BIGINT) AS o FROM base GROUP BY 1, 2),
      |dx AS (SELECT x, CAST(SUM(o) AS BIGINT) AS tx FROM cells GROUP BY x),
      |dy AS (SELECT y, CAST(SUM(o) AS BIGINT) AS ty FROM cells GROUP BY y),
      |grid AS (
      |  SELECT dx.x, dy.y, COALESCE(c.o, 0) AS o
      |  FROM dx CROSS JOIN dy LEFT JOIN cells c ON c.x = dx.x AND c.y = dy.y
      |),
      |sl AS (
      |  SELECT x, y, o,
      |    COALESCE(SUM(o) OVER (PARTITION BY x ORDER BY y
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cyb,
      |    COALESCE(SUM(o) OVER (PARTITION BY x ORDER BY y
      |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), 0) AS cya
      |  FROM grid
      |),
      |dom AS (
      |  SELECT x, y, o,
      |    COALESCE(SUM(cyb) OVER wx, 0) AS bb,
      |    COALESCE(SUM(cya) OVER wx, 0) AS ba
      |  FROM sl
      |  WINDOW wx AS (PARTITION BY y ORDER BY x
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |),
      |s AS (
      |  SELECT CAST(COALESCE(SUM(o), 0) AS BIGINT) AS n,
      |    CAST(COALESCE(SUM(CAST(o AS HUGEINT) * bb), 0) AS BIGINT) AS conc,
      |    CAST(COALESCE(SUM(CAST(o AS HUGEINT) * ba), 0) AS BIGINT) AS disc
      |  FROM dom
      |),
      |tpx AS (
      |  SELECT CAST(COALESCE(SUM(CAST(tx AS HUGEINT) * (tx - 1)), 0) // 2
      |    AS BIGINT) AS tie_x_pairs FROM dx
      |),
      |tpy AS (
      |  SELECT CAST(COALESCE(SUM(CAST(ty AS HUGEINT) * (ty - 1)), 0) // 2
      |    AS BIGINT) AS tie_y_pairs FROM dy
      |)
      |SELECT n, conc, disc, tie_x_pairs, tie_y_pairs,
      |  CASE WHEN n < 2
      |    OR CAST(CAST(n AS HUGEINT) * (n - 1) // 2 AS BIGINT) - tie_x_pairs <= 0
      |    OR CAST(CAST(n AS HUGEINT) * (n - 1) // 2 AS BIGINT) - tie_y_pairs <= 0
      |    THEN 0.0
      |  ELSE ROUND(CAST(conc - disc AS DOUBLE) /
      |    (SQRT(CAST(CAST(CAST(n AS HUGEINT) * (n - 1) // 2 AS BIGINT)
      |       - tie_x_pairs AS DOUBLE)) *
      |     SQRT(CAST(CAST(CAST(n AS HUGEINT) * (n - 1) // 2 AS BIGINT)
      |       - tie_y_pairs AS DOUBLE))), 6) END AS tau_b6
      |FROM s, tpx, tpy""".stripMargin

  // ---------------------------------------------------------------- q219

  /** q219: average precision with a bootstrap CI (`LmOps.binaryApCi`) —
    * brings q210 to parity with the AUC family (q205): AP has no DeLong
    * closed form, so the interval is a deterministic md5-coin Poisson
    * bootstrap (64 resamples, each row's weight an md5 of (doc_id,
    * resample) — engine-replayable, no RNG state). Resamples ride the
    * keyed AP machinery with the resample id as the key; only the 64-row
    * AP table crosses a single partition.
    */
  def q219ApCi(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.LmOps.binaryApCi(
      Tables.load(spark, sfDir, "documents")
        .select(col("doc_id"), col("n_chars").as("len_score"),
          when(col("lang") === "en", 1L).otherwise(0L).as("is_en")),
      "doc_id", "len_score", "is_en", resamples = 64)

  private val apCiBootCte: String =
    """bo AS (
      |  SELECT bs, score, CAST(SUM(w * y) AS BIGINT) AS p,
      |    CAST(SUM(w * (1 - y)) AS BIGINT) AS ng
      |  FROM (
      |    SELECT bs, score, y,
      |      CASE WHEN h < 424136118829305329 THEN 0
      |           WHEN h < 848272237658610659 THEN 1
      |           WHEN h < 1060340297073263324 THEN 2
      |           WHEN h < 1131029650211480879 THEN 3
      |           WHEN h < 1148701988496035267 THEN 4
      |           WHEN h < 1152236456152946145 THEN 5
      |           WHEN h < 1152825534095764625 THEN 6
      |           ELSE 7 END AS w
      |    FROM (
      |      SELECT base.*, r.range AS bs,
      |        ('0x' || substr(md5(id || ':' || CAST(r.range AS VARCHAR)),
      |          1, 15))::BIGINT AS h
      |      FROM base CROSS JOIN range(0, 64) r
      |    )
      |  )
      |  GROUP BY 1, 2
      |)""".stripMargin

  val q219Sql: String =
    s"""WITH base AS (
       |  SELECT CAST(doc_id AS VARCHAR) AS id, n_chars AS score,
       |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
       |  FROM documents
       |  -- complete-case id/score mirror of binaryApCi
       |  WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL
       |),
       |g AS (
       |  SELECT score, CAST(SUM(y) AS BIGINT) AS p,
       |    CAST(COUNT(1) - SUM(y) AS BIGINT) AS ng
       |  FROM base GROUP BY 1
       |),
       |t AS (
       |  SELECT CAST(SUM(p) AS BIGINT) AS tp,
       |    CAST(SUM(p + ng) AS BIGINT) AS tot
       |  FROM g
       |),
       |c AS (
       |  SELECT score, p, ng, tp, tot,
       |    COALESCE(SUM(p) OVER w, 0) AS pos_below,
       |    COALESCE(SUM(p + ng) OVER w, 0) AS all_below
       |  FROM g, t
       |  WINDOW w AS (ORDER BY score
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |),
       |s AS (
       |  SELECT CAST(SUM(p) AS BIGINT) AS n_pos, CAST(SUM(ng) AS BIGINT) AS n_neg,
       |    COALESCE(SUM(CASE WHEN p = 0 THEN 0 ELSE
       |      (CAST(1000000 AS HUGEINT) * p * (tp - pos_below))
       |        // (tot - all_below) END), 0) AS ts
       |  FROM c
       |),
       |$apCiBootCte,
       |bt AS (
       |  SELECT bs, CAST(SUM(p) AS BIGINT) AS tp,
       |    CAST(SUM(p + ng) AS BIGINT) AS tot
       |  FROM bo GROUP BY bs
       |),
       |bc AS (
       |  SELECT bo.bs, score, p, ng, tp, tot,
       |    COALESCE(SUM(p) OVER w, 0) AS pos_below,
       |    COALESCE(SUM(p + ng) OVER w, 0) AS all_below
       |  FROM bo JOIN bt USING (bs)
       |  WINDOW w AS (PARTITION BY bo.bs ORDER BY score
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |),
       |baps AS (
       |  SELECT bs, CAST(SUM(p) AS BIGINT) AS bn_pos,
       |    COALESCE(SUM(CASE WHEN p = 0 THEN 0 ELSE
       |      (CAST(1000000 AS HUGEINT) * p * (tp - pos_below))
       |        // (tot - all_below) END), 0) AS bts
       |  FROM bc GROUP BY bs
       |),
       |bap AS (
       |  SELECT bs, CAST(CASE WHEN bn_pos = 0 THEN 0
       |    ELSE bts // bn_pos END AS BIGINT) AS ap_micro
       |  FROM baps
       |),
       |ci AS (
       |  SELECT CAST(COUNT(1) AS BIGINT) AS b,
       |    CAST(COALESCE(SUM(ap_micro), 0) AS BIGINT) AS sa,
       |    CAST(COALESCE(SUM(ap_micro * ap_micro), 0) AS BIGINT) AS sa2
       |  FROM bap
       |),
       |m AS (
       |  SELECT n_pos + n_neg AS n, n_pos, n_neg,
       |    CAST(CASE WHEN n_pos = 0 THEN 0 ELSE ts // n_pos END AS BIGINT)
       |      AS ap_micro,
       |    CAST(CASE WHEN n_pos + n_neg = 0 THEN 0
       |      ELSE CAST(1000000 AS HUGEINT) * n_pos // (n_pos + n_neg)
       |      END AS BIGINT) AS prevalence_micro,
       |    b,
       |    CASE WHEN b < 2 THEN 0.0 ELSE
       |      ROUND(SQRT(CAST(b * sa2 - sa * sa AS DOUBLE)
       |        / (CAST(b AS DOUBLE) * CAST(b - 1 AS DOUBLE)))
       |        / 1000000.0, 6) END AS se6
       |  FROM s, ci
       |)
       |SELECT n, n_pos, n_neg, ap_micro, prevalence_micro, b, se6,
       |  ROUND(GREATEST(0.0, CAST(ap_micro AS DOUBLE) / 1000000.0
       |    - 1.959964 * se6), 6) AS lo6,
       |  ROUND(LEAST(1.0, CAST(ap_micro AS DOUBLE) / 1000000.0
       |    + 1.959964 * se6), 6) AS hi6
       |FROM m""".stripMargin

  // ---------------------------------------------------------------- q220

  /** q220: per-source AP with bootstrap CIs (`LmOps.binaryApCiBy`) — the
    * q213 slice dashboard upgraded to intervals, completing the eval
    * family's uncertainty story (q216 did it for AUC): slices differ
    * 1000× in size and the point dashboard hides exactly that. The
    * resample id joins the source key through the same keyed machinery —
    * per-(key, resample) windows, zero SinglePartition anywhere.
    */
  def q220ApCiBySource(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.LmOps.binaryApCiBy(
      Tables.load(spark, sfDir, "documents")
        .select(col("source"), col("doc_id"), col("n_chars").as("len_score"),
          when(col("lang") === "en", 1L).otherwise(0L).as("is_en")),
      Seq("source"), "doc_id", "len_score", "is_en", resamples = 64)

  val q220Sql: String =
    """WITH base AS (
      |  SELECT source, CAST(doc_id AS VARCHAR) AS id, n_chars AS score,
      |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      |  FROM documents
      |  -- complete-case key/id/score mirror of binaryApCiBy
      |  WHERE source IS NOT NULL AND doc_id IS NOT NULL AND n_chars IS NOT NULL
      |),
      |g AS (
      |  SELECT source, score, CAST(SUM(y) AS BIGINT) AS p,
      |    CAST(COUNT(1) - SUM(y) AS BIGINT) AS ng
      |  FROM base GROUP BY 1, 2
      |),
      |t AS (
      |  SELECT source, CAST(SUM(p) AS BIGINT) AS tp,
      |    CAST(SUM(p + ng) AS BIGINT) AS tot
      |  FROM g GROUP BY source
      |),
      |c AS (
      |  SELECT g.source, score, p, ng, tp, tot,
      |    COALESCE(SUM(p) OVER w, 0) AS pos_below,
      |    COALESCE(SUM(p + ng) OVER w, 0) AS all_below
      |  FROM g JOIN t USING (source)
      |  WINDOW w AS (PARTITION BY g.source ORDER BY score
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |),
      |s AS (
      |  SELECT source, CAST(SUM(p) AS BIGINT) AS n_pos,
      |    CAST(SUM(ng) AS BIGINT) AS n_neg,
      |    COALESCE(SUM(CASE WHEN p = 0 THEN 0 ELSE
      |      (CAST(1000000 AS HUGEINT) * p * (tp - pos_below))
      |        // (tot - all_below) END), 0) AS ts
      |  FROM c GROUP BY source
      |),
      |bo AS (
      |  SELECT source, bs, score, CAST(SUM(w * y) AS BIGINT) AS p,
      |    CAST(SUM(w * (1 - y)) AS BIGINT) AS ng
      |  FROM (
      |    SELECT source, bs, score, y,
      |      CASE WHEN h < 424136118829305329 THEN 0
      |           WHEN h < 848272237658610659 THEN 1
      |           WHEN h < 1060340297073263324 THEN 2
      |           WHEN h < 1131029650211480879 THEN 3
      |           WHEN h < 1148701988496035267 THEN 4
      |           WHEN h < 1152236456152946145 THEN 5
      |           WHEN h < 1152825534095764625 THEN 6
      |           ELSE 7 END AS w
      |    FROM (
      |      SELECT base.*, r.range AS bs,
      |        ('0x' || substr(md5(id || ':' || CAST(r.range AS VARCHAR)),
      |          1, 15))::BIGINT AS h
      |      FROM base CROSS JOIN range(0, 64) r
      |    )
      |  )
      |  GROUP BY 1, 2, 3
      |),
      |bt AS (
      |  SELECT source, bs, CAST(SUM(p) AS BIGINT) AS tp,
      |    CAST(SUM(p + ng) AS BIGINT) AS tot
      |  FROM bo GROUP BY 1, 2
      |),
      |bc AS (
      |  SELECT bo.source, bo.bs, score, p, ng, tp, tot,
      |    COALESCE(SUM(p) OVER w, 0) AS pos_below,
      |    COALESCE(SUM(p + ng) OVER w, 0) AS all_below
      |  FROM bo JOIN bt USING (source, bs)
      |  WINDOW w AS (PARTITION BY bo.source, bo.bs ORDER BY score
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |),
      |baps AS (
      |  SELECT source, bs, CAST(SUM(p) AS BIGINT) AS bn_pos,
      |    COALESCE(SUM(CASE WHEN p = 0 THEN 0 ELSE
      |      (CAST(1000000 AS HUGEINT) * p * (tp - pos_below))
      |        // (tot - all_below) END), 0) AS bts
      |  FROM bc GROUP BY 1, 2
      |),
      |bap AS (
      |  SELECT source, bs, CAST(CASE WHEN bn_pos = 0 THEN 0
      |    ELSE bts // bn_pos END AS BIGINT) AS ap_micro
      |  FROM baps
      |),
      |ci AS (
      |  SELECT source, CAST(COUNT(1) AS BIGINT) AS b,
      |    CAST(COALESCE(SUM(ap_micro), 0) AS BIGINT) AS sa,
      |    CAST(COALESCE(SUM(ap_micro * ap_micro), 0) AS BIGINT) AS sa2
      |  FROM bap GROUP BY source
      |),
      |m AS (
      |  SELECT s.source, n_pos + n_neg AS n, n_pos, n_neg,
      |    CAST(CASE WHEN n_pos = 0 THEN 0 ELSE ts // n_pos END AS BIGINT)
      |      AS ap_micro,
      |    CAST(CASE WHEN n_pos + n_neg = 0 THEN 0
      |      ELSE CAST(1000000 AS HUGEINT) * n_pos // (n_pos + n_neg)
      |      END AS BIGINT) AS prevalence_micro,
      |    b,
      |    CASE WHEN b < 2 THEN 0.0 ELSE
      |      ROUND(SQRT(CAST(b * sa2 - sa * sa AS DOUBLE)
      |        / (CAST(b AS DOUBLE) * CAST(b - 1 AS DOUBLE)))
      |        / 1000000.0, 6) END AS se6
      |  FROM s JOIN ci USING (source)
      |)
      |SELECT source, n, n_pos, n_neg, ap_micro, prevalence_micro, b, se6,
      |  ROUND(GREATEST(0.0, CAST(ap_micro AS DOUBLE) / 1000000.0
      |    - 1.959964 * se6), 6) AS lo6,
      |  ROUND(LEAST(1.0, CAST(ap_micro AS DOUBLE) / 1000000.0
      |    + 1.959964 * se6), 6) AS hi6
      |FROM m""".stripMargin

  // ---------------------------------------------------------------- q221

  /** q221: per-language Kendall's τ-b of length band × token band
    * (`Profile.kendallTauBBy`) — q218's tie-aware association dial
    * SLICED: is the length↔token relationship still monotone in EVERY
    * language, or did one slice's tokenization break it? Per-key dense
    * grids via keyed equi-joins (no cross join), every window
    * partitioned by (key, one axis), zero SinglePartition.
    */
  def q221KendallTauByLang(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.Profile.kendallTauBBy(
      Tables.load(spark, sfDir, "documents")
        .select(col("lang"), expr("n_chars DIV 64").as("len_band"),
          expr("size(split(text, ' ')) DIV 8").as("tok_band")),
      Seq("lang"), "len_band", "tok_band")

  val q221Sql: String =
    """WITH base AS (
      |  SELECT lang, n_chars // 64 AS x, len(string_split(text, ' ')) // 8 AS y
      |  FROM documents
      |  -- complete-case key/column mirror of kendallTauBBy (both bands
      |  -- derive from n_chars/text)
      |  WHERE lang IS NOT NULL AND n_chars IS NOT NULL AND text IS NOT NULL
      |),
      |cells AS (
      |  SELECT lang, x, y, CAST(COUNT(1) AS BIGINT) AS o
      |  FROM base GROUP BY 1, 2, 3
      |),
      |dx AS (SELECT lang, x, CAST(SUM(o) AS BIGINT) AS tx FROM cells GROUP BY 1, 2),
      |dy AS (SELECT lang, y, CAST(SUM(o) AS BIGINT) AS ty FROM cells GROUP BY 1, 2),
      |grid AS (
      |  SELECT dx.lang, dx.x, dy.y, COALESCE(c.o, 0) AS o
      |  FROM dx JOIN dy USING (lang)
      |  LEFT JOIN cells c ON c.lang = dx.lang AND c.x = dx.x AND c.y = dy.y
      |),
      |sl AS (
      |  SELECT lang, x, y, o,
      |    COALESCE(SUM(o) OVER (PARTITION BY lang, x ORDER BY y
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cyb,
      |    COALESCE(SUM(o) OVER (PARTITION BY lang, x ORDER BY y
      |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), 0) AS cya
      |  FROM grid
      |),
      |dom AS (
      |  SELECT lang, x, y, o,
      |    COALESCE(SUM(cyb) OVER wx, 0) AS bb,
      |    COALESCE(SUM(cya) OVER wx, 0) AS ba
      |  FROM sl
      |  WINDOW wx AS (PARTITION BY lang, y ORDER BY x
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |),
      |s AS (
      |  SELECT lang, CAST(COALESCE(SUM(o), 0) AS BIGINT) AS n,
      |    CAST(COALESCE(SUM(CAST(o AS HUGEINT) * bb), 0) AS BIGINT) AS conc,
      |    CAST(COALESCE(SUM(CAST(o AS HUGEINT) * ba), 0) AS BIGINT) AS disc
      |  FROM dom GROUP BY lang
      |),
      |tpx AS (
      |  SELECT lang, CAST(COALESCE(SUM(CAST(tx AS HUGEINT) * (tx - 1)), 0) // 2
      |    AS BIGINT) AS tie_x_pairs FROM dx GROUP BY lang
      |),
      |tpy AS (
      |  SELECT lang, CAST(COALESCE(SUM(CAST(ty AS HUGEINT) * (ty - 1)), 0) // 2
      |    AS BIGINT) AS tie_y_pairs FROM dy GROUP BY lang
      |)
      |SELECT lang, n, conc, disc, tie_x_pairs, tie_y_pairs,
      |  CASE WHEN n < 2
      |    OR CAST(CAST(n AS HUGEINT) * (n - 1) // 2 AS BIGINT) - tie_x_pairs <= 0
      |    OR CAST(CAST(n AS HUGEINT) * (n - 1) // 2 AS BIGINT) - tie_y_pairs <= 0
      |    THEN 0.0
      |  ELSE ROUND(CAST(conc - disc AS DOUBLE) /
      |    (SQRT(CAST(CAST(CAST(n AS HUGEINT) * (n - 1) // 2 AS BIGINT)
      |       - tie_x_pairs AS DOUBLE)) *
      |     SQRT(CAST(CAST(CAST(n AS HUGEINT) * (n - 1) // 2 AS BIGINT)
      |       - tie_y_pairs AS DOUBLE))), 6) END AS tau_b6
      |FROM s JOIN tpx USING (lang) JOIN tpy USING (lang)""".stripMargin

  // ---------------------------------------------------------------- q222

  /** q222: per-language χ² of source × length band (`Profile.chiSquareBy`)
    * — the significance companion of q217's MI strength dial over the
    * SAME sliced pair: within each language, is the source×length-band
    * association statistically there, and how strong (Cramér's V)? The
    * per-key cell grid densifies by keyed equi-joins (the q221 grid
    * shape), zero SinglePartition.
    */
  def q222ChiSquareByLang(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.Profile.chiSquareBy(
      Tables.load(spark, sfDir, "documents")
        .select(col("lang"), col("source"),
          expr("n_chars DIV 256").as("len_band")),
      Seq("lang"), "source", "len_band")

  val q222Sql: String =
    """WITH obs AS (
      |  SELECT lang, source AS a, CAST(n_chars // 256 AS VARCHAR) AS b,
      |    CAST(COUNT(1) AS BIGINT) AS o
      |  FROM documents
      |  -- complete-case key/column mirror of chiSquareBy
      |  WHERE lang IS NOT NULL AND source IS NOT NULL AND n_chars IS NOT NULL
      |  GROUP BY 1, 2, 3
      |),
      |ra AS (SELECT lang, a, CAST(SUM(o) AS BIGINT) AS r FROM obs GROUP BY 1, 2),
      |cb AS (SELECT lang, b, CAST(SUM(o) AS BIGINT) AS c FROM obs GROUP BY 1, 2),
      |tot AS (
      |  SELECT lang, CAST(SUM(o) AS BIGINT) AS n,
      |    CAST(COUNT(DISTINCT a) AS BIGINT) AS n_a,
      |    CAST(COUNT(DISTINCT b) AS BIGINT) AS n_b
      |  FROM obs GROUP BY lang
      |),
      |cells AS (
      |  SELECT ra.lang, r, c, COALESCE(o, 0) AS o
      |  FROM ra JOIN cb USING (lang)
      |  LEFT JOIN obs ON obs.lang = ra.lang AND obs.a = ra.a AND obs.b = cb.b
      |),
      |s AS (
      |  SELECT cells.lang, n, n_a, n_b,
      |    CAST(COALESCE(SUM(
      |      (1000000 * (CAST(o AS HUGEINT) * n - CAST(r AS HUGEINT) * c)
      |               * (CAST(o AS HUGEINT) * n - CAST(r AS HUGEINT) * c))
      |      // (CAST(n AS HUGEINT) * r * c)), 0) AS BIGINT) AS chi2_micro
      |  FROM cells JOIN tot USING (lang) GROUP BY cells.lang, n, n_a, n_b
      |)
      |SELECT lang, n, n_a, n_b, (n_a - 1) * (n_b - 1) AS dof, chi2_micro,
      |  CASE WHEN n = 0 OR LEAST(n_a - 1, n_b - 1) <= 0 THEN 0.0
      |    ELSE ROUND(SQRT(CAST(chi2_micro AS DOUBLE) / 1000000.0
      |      / (CAST(n AS DOUBLE) * LEAST(n_a - 1, n_b - 1))), 6) END AS cramers_v
      |FROM s""".stripMargin

  // ---------------------------------------------------------------- q223

  /** q223: per-language Spearman of chars × tokens (`Profile.spearmanBy`)
    * — q203's monotone-association QA dial SLICED: is token count still
    * tracking char count in EVERY language (a per-language tokenizer
    * regression hides inside the global ρ)? Per-key rank maps via the
    * keyed two-phase bucket cumulative, ranks re-attach by keyed hash
    * joins, zero SinglePartition.
    */
  def q223SpearmanByLang(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.Profile.spearmanBy(
      Tables.load(spark, sfDir, "documents")
        .select(col("lang"), col("n_chars"),
          size(split(col("text"), " ")).as("n_toks")),
      Seq("lang"), "n_chars", "n_toks")

  val q223Sql: String =
    """WITH base AS (
      |  SELECT lang, n_chars AS x, len(string_split(text, ' ')) AS y
      |  FROM documents
      |  -- complete-case key/column mirror of spearmanBy (x from n_chars,
      |  -- y from text)
      |  WHERE lang IS NOT NULL AND n_chars IS NOT NULL AND text IS NOT NULL
      |),
      |r AS (
      |  -- doubled average rank PER KEY: 2·RANK + tieCount − 1
      |  SELECT lang,
      |    2 * RANK() OVER (PARTITION BY lang ORDER BY x)
      |      + COUNT(1) OVER (PARTITION BY lang, x) - 1 AS r2x,
      |    2 * RANK() OVER (PARTITION BY lang ORDER BY y)
      |      + COUNT(1) OVER (PARTITION BY lang, y) - 1 AS r2y
      |  FROM base
      |),
      |s AS (
      |  SELECT lang, CAST(COUNT(1) AS BIGINT) AS n,
      |    COALESCE(SUM(CAST(r2x - r2y AS HUGEINT) * (r2x - r2y)), 0) AS sd
      |  FROM r GROUP BY lang
      |)
      |SELECT lang, n,
      |  CAST(CASE WHEN n < 2 THEN 0 ELSE 1000000 -
      |    (CAST(3000000 AS HUGEINT) * sd)
      |      // (2 * (CAST(n AS HUGEINT) * n * n - n)) END AS BIGINT) AS rho_micro
      |FROM s""".stripMargin

  // ---------------------------------------------------------------- q224

  /** q224: Cochran–Mantel–Haenszel association controlled for language
    * (`Profile.cmh2x2`) — the Simpson's-paradox-safe capstone of the
    * association triple: q201 asks "is source associated with long
    * documents MARGINALLY" (confounded by language), q222 asks it per
    * slice (fragmenting power), q224 pools the per-language evidence
    * while holding language fixed, plus the Mantel-Haenszel pooled odds
    * ratio. One groupBy(lang) with four conditional sums — no cell grid,
    * scalar output.
    */
  def q224CmhSourceLength(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.Profile.cmh2x2(
      Tables.load(spark, sfDir, "documents")
        .select(col("lang"),
          when(col("source") === "src0", 1L).otherwise(0L).as("is_src0"),
          when(col("n_chars") >= 300L, 1L).otherwise(0L).as("is_long")),
      Seq("lang"), "is_src0", "is_long")

  val q224Sql: String =
    """WITH base AS (
      |  SELECT lang,
      |    CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS a,
      |    CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS b
      |  FROM documents
      |  -- complete-case stratum mirror of cmh2x2
      |  WHERE lang IS NOT NULL
      |),
      |g AS (
      |  SELECT lang,
      |    CAST(SUM(a * b) AS BIGINT) AS o11,
      |    CAST(SUM(a * (1 - b)) AS BIGINT) AS o10,
      |    CAST(SUM((1 - a) * b) AS BIGINT) AS o01,
      |    CAST(SUM((1 - a) * (1 - b)) AS BIGINT) AS o00,
      |    CAST(COUNT(1) AS BIGINT) AS n
      |  FROM base GROUP BY lang
      |),
      |t AS (
      |  SELECT n,
      |    CASE WHEN n >= 2 THEN ROUND(
      |      CAST(o11 AS DOUBLE) -
      |      CAST(o11 + o10 AS DOUBLE) * (o11 + o01) / n, 9) END AS d9,
      |    CASE WHEN n >= 2 THEN ROUND(
      |      CAST(o11 + o10 AS DOUBLE) * (o01 + o00) * (o11 + o01)
      |        * (o10 + o00)
      |        / (CAST(n AS DOUBLE) * n * (n - 1)), 9) END AS v9,
      |    CASE WHEN n >= 2 THEN ROUND(
      |      CAST(o11 AS DOUBLE) * o00 / n, 9) END AS p9,
      |    CASE WHEN n >= 2 THEN ROUND(
      |      CAST(o10 AS DOUBLE) * o01 / n, 9) END AS q9
      |  FROM g
      |),
      |s AS (
      |  SELECT CAST(COUNT(1) AS BIGINT) AS n_strata,
      |    CAST(COALESCE(SUM(n), 0) AS BIGINT) AS n,
      |    CAST(COALESCE(SUM(CASE WHEN n < 2 THEN 1 ELSE 0 END), 0) AS BIGINT)
      |      AS n_skipped,
      |    CAST(COALESCE(SUM(CAST(d9 AS DECIMAL(24,9))), 0) AS DOUBLE) AS sd,
      |    CAST(COALESCE(SUM(CAST(v9 AS DECIMAL(24,9))), 0) AS DOUBLE) AS sv,
      |    CAST(COALESCE(SUM(CAST(p9 AS DECIMAL(24,9))), 0) AS DOUBLE) AS sp,
      |    CAST(COALESCE(SUM(CAST(q9 AS DECIMAL(24,9))), 0) AS DOUBLE) AS sq
      |  FROM t
      |)
      |SELECT n_strata, n, n_skipped,
      |  CASE WHEN sv <= 0.0 THEN 0.0 ELSE ROUND(sd * sd / sv, 6) END AS cmh6,
      |  CASE WHEN sq <= 0.0 THEN NULL ELSE ROUND(sp / sq, 6) END AS or_mh6
      |FROM s""".stripMargin

  // ---------------------------------------------------------------- q225

  /** q225: Cochran–Armitage trend of English rate across length bands
    * (`Profile.trendTest`) — the dose-response dial of the association
    * family: not "is band associated with language" (q201's omnibus) but
    * "does the English rate rise or fall MONOTONICALLY with length" —
    * one degree of freedom spent on exactly the monotone alternative, so
    * it fires where the omnibus is still noise. Exact integers to the
    * last division; one bounded groupBy, no grid, no window, no join.
    */
  def q225TrendTest(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.Profile.trendTest(
      Tables.load(spark, sfDir, "documents")
        .select(expr("n_chars DIV 64").as("len_band"),
          when(col("lang") === "en", 1L).otherwise(0L).as("is_en")),
      "len_band", "is_en")

  val q225Sql: String =
    """WITH g AS (
      |  SELECT n_chars // 64 AS w, CAST(COUNT(1) AS BIGINT) AS n,
      |    CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS p
      |  FROM documents
      |  -- complete-case band mirror of trendTest
      |  WHERE n_chars IS NOT NULL
      |  GROUP BY 1
      |),
      |s AS (
      |  SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) AS n,
      |    CAST(COALESCE(SUM(p), 0) AS BIGINT) AS n_pos,
      |    CAST(COUNT(1) AS BIGINT) AS n_groups,
      |    COALESCE(SUM(CAST(w AS HUGEINT) * p), 0) AS s1,
      |    COALESCE(SUM(CAST(w AS HUGEINT) * n), 0) AS s2,
      |    COALESCE(SUM(CAST(w AS HUGEINT) * w * n), 0) AS q
      |  FROM g
      |),
      |t AS (
      |  SELECT n, n_pos, n_groups,
      |    CAST(n AS HUGEINT) * s1 - CAST(n_pos AS HUGEINT) * s2 AS a,
      |    CAST(n AS HUGEINT) * q - s2 * s2 AS b
      |  FROM s
      |)
      |SELECT n, n_pos, n_groups, CAST(SIGN(a) AS BIGINT) AS trend,
      |  CASE WHEN n_pos = 0 OR n_pos = n OR b <= 0 THEN 0.0
      |    ELSE ROUND(CAST(n AS DOUBLE) * CAST(a AS DOUBLE) * CAST(a AS DOUBLE)
      |      / (CAST(n_pos AS DOUBLE) * CAST(n - n_pos AS DOUBLE)
      |         * CAST(b AS DOUBLE)), 6) END AS ca6
      |FROM t""".stripMargin

  // ---------------------------------------------------------------- q233

  /** q233: randomization test of the en-rate difference between two
    * sources (`Profile.permTestRate`) — the assumption-free significance
    * dial beside the z/χ² family (q201/q227 lean on normal
    * approximations that misbehave on tiny or lopsided slices; the
    * permutation p needs only exchangeability). 128 deterministic
    * md5-coin reassignments, each row's coin an exact 60-bit hash of
    * (doc_id, resample) against the ⌊2⁶⁰·n_A/N⌋ integer threshold —
    * engine-replayable bit-for-bit, shuffle volume the 128-row resample
    * table.
    */
  def q233PermTest(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.Profile.permTestRate(
      Tables.load(spark, sfDir, "documents")
        .select(col("doc_id"), col("source"),
          when(col("lang") === "en", 1L).otherwise(0L).as("is_en")),
      "doc_id", "source", "is_en", "src0", "src1", resamples = 128)

  val q233Sql: String =
    """WITH base AS (
      |  SELECT CAST(doc_id AS VARCHAR) AS id,
      |    CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS ia,
      |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      |  FROM documents
      |  -- complete-case id mirror of permTestRate
      |  WHERE source IN ('src0', 'src1') AND doc_id IS NOT NULL
      |),
      |t AS (
      |  SELECT CAST(COALESCE(SUM(ia), 0) AS BIGINT) AS n_a,
      |    CAST(COALESCE(COUNT(1) - SUM(ia), 0) AS BIGINT) AS n_b,
      |    CAST(COALESCE(SUM(ia * y), 0) AS BIGINT) AS x_a,
      |    CAST(COALESCE(SUM((1 - ia) * y), 0) AS BIGINT) AS x_b
      |  FROM base
      |),
      |o AS (
      |  SELECT n_a, n_b, x_a, x_b,
      |    CAST(CASE WHEN n_a = 0 OR n_b = 0 THEN 0 ELSE
      |      (CAST(1000000 AS HUGEINT) * x_a) // n_a
      |      - (CAST(1000000 AS HUGEINT) * x_b) // n_b END AS BIGINT)
      |      AS d_obs_micro,
      |    CAST(CASE WHEN n_a + n_b = 0 THEN 0 ELSE
      |      (CAST(1152921504606846976 AS HUGEINT) * n_a)
      |        // (n_a + n_b) END AS BIGINT) AS thr
      |  FROM t
      |),
      |pb AS (
      |  SELECT b, CAST(SUM(ca) AS BIGINT) AS n1,
      |    CAST(SUM(ca * y) AS BIGINT) AS x1,
      |    CAST(SUM(1 - ca) AS BIGINT) AS n2,
      |    CAST(SUM((1 - ca) * y) AS BIGINT) AS x2
      |  FROM (
      |    SELECT y, r.range AS b,
      |      CASE WHEN ('0x' || substr(md5(id || ':' ||
      |        CAST(r.range AS VARCHAR)), 1, 15))::BIGINT < thr
      |        THEN 1 ELSE 0 END AS ca
      |    FROM base CROSS JOIN range(0, 128) r, o
      |  )
      |  GROUP BY b
      |),
      |pd AS (
      |  SELECT b, CAST(CASE WHEN n1 = 0 OR n2 = 0 THEN 0 ELSE
      |    (CAST(1000000 AS HUGEINT) * x1) // n1
      |    - (CAST(1000000 AS HUGEINT) * x2) // n2 END AS BIGINT) AS d
      |  FROM pb
      |),
      |c AS (
      |  SELECT CAST(COUNT(1) AS BIGINT) AS bb,
      |    CAST(COALESCE(SUM(CASE WHEN ABS(d) >= ABS(d_obs_micro)
      |      THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_ge
      |  FROM pd, o
      |)
      |SELECT n_a, n_b, x_a, x_b, d_obs_micro, bb AS b, n_ge,
      |  CAST((1000000 * (n_ge + 1)) // (bb + 1) AS BIGINT) AS p_micro
      |FROM o, c""".stripMargin

  // ---------------------------------------------------------------- q238

  /** q238: randomization test of the MEAN length difference between two
    * sources (`Profile.permTestMean`) — q233's continuous-outcome twin:
    * the rate test asks "did the long-doc SHARE move", this asks "did
    * the average length itself move", with the same md5-coin
    * reassignment and no normality lean (document lengths are exactly
    * the skewed distribution a t-test mishandles). 128 deterministic
    * resamples; exact DECIMAL sums, truncating-DIV micro-means; shuffle
    * volume the 128-row resample table.
    */
  def q238PermTestMean(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.Profile.permTestMean(
      Tables.load(spark, sfDir, "documents")
        .select(col("doc_id"), col("source"), col("n_chars")),
      "doc_id", "source", "n_chars", "src0", "src1", resamples = 128)

  val q238Sql: String =
    """WITH base AS (
      |  SELECT CAST(doc_id AS VARCHAR) AS id,
      |    CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS ia,
      |    n_chars AS x
      |  FROM documents
      |  -- complete-case id/value mirror of permTestMean
      |  WHERE source IN ('src0', 'src1') AND doc_id IS NOT NULL
      |    AND n_chars IS NOT NULL
      |),
      |t AS (
      |  SELECT CAST(COALESCE(SUM(ia), 0) AS BIGINT) AS n_a,
      |    CAST(COALESCE(COUNT(1) - SUM(ia), 0) AS BIGINT) AS n_b,
      |    CAST(COALESCE(SUM(ia * x), 0) AS HUGEINT) AS sa,
      |    CAST(COALESCE(SUM((1 - ia) * x), 0) AS HUGEINT) AS sb
      |  FROM base
      |),
      |o AS (
      |  SELECT n_a, n_b, sa, sb,
      |    CAST(CASE WHEN n_a = 0 OR n_b = 0 THEN 0 ELSE
      |      (CAST(1000000 AS HUGEINT) * sa) // n_a
      |      - (CAST(1000000 AS HUGEINT) * sb) // n_b END AS BIGINT)
      |      AS d_obs_micro,
      |    CAST(CASE WHEN n_a + n_b = 0 THEN 0 ELSE
      |      (CAST(1152921504606846976 AS HUGEINT) * n_a)
      |        // (n_a + n_b) END AS BIGINT) AS thr
      |  FROM t
      |),
      |pb AS (
      |  SELECT b, CAST(SUM(ca) AS BIGINT) AS n1,
      |    CAST(SUM(ca * x) AS HUGEINT) AS s1,
      |    CAST(SUM(1 - ca) AS BIGINT) AS n2,
      |    CAST(SUM((1 - ca) * x) AS HUGEINT) AS s2
      |  FROM (
      |    SELECT x, r.range AS b,
      |      CASE WHEN ('0x' || substr(md5(id || ':' ||
      |        CAST(r.range AS VARCHAR)), 1, 15))::BIGINT < thr
      |        THEN 1 ELSE 0 END AS ca
      |    FROM base CROSS JOIN range(0, 128) r, o
      |  )
      |  GROUP BY b
      |),
      |pd AS (
      |  SELECT b, CAST(CASE WHEN n1 = 0 OR n2 = 0 THEN 0 ELSE
      |    (CAST(1000000 AS HUGEINT) * s1) // n1
      |    - (CAST(1000000 AS HUGEINT) * s2) // n2 END AS BIGINT) AS d
      |  FROM pb
      |),
      |c AS (
      |  SELECT CAST(COUNT(1) AS BIGINT) AS bb,
      |    CAST(COALESCE(SUM(CASE WHEN ABS(d) >= ABS(d_obs_micro)
      |      THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_ge
      |  FROM pd, o
      |)
      |SELECT n_a, n_b, CAST(sa AS BIGINT) AS s_a, CAST(sb AS BIGINT) AS s_b,
      |  d_obs_micro, bb AS b, n_ge,
      |  CAST((1000000 * (n_ge + 1)) // (bb + 1) AS BIGINT) AS p_micro
      |FROM o, c""".stripMargin

  // ---------------------------------------------------------------- q239

  /** q239: per-language randomization test of the mean length
    * difference between two sources (`Profile.permTestMeanBy`) — q238
    * SLICED, the q235 symmetry: each language draws its own md5-coin
    * threshold from its margins, so the keyed output equals running the
    * global test on each slice alone; shuffle volume the (lang × 64)
    * resample table.
    */
  def q239PermTestMeanByLang(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.Profile.permTestMeanBy(
      Tables.load(spark, sfDir, "documents")
        .select(col("lang"), col("doc_id"), col("source"), col("n_chars")),
      Seq("lang"), "doc_id", "source", "n_chars", "src0", "src1",
      resamples = 64)

  val q239Sql: String =
    """WITH base AS (
      |  SELECT lang, CAST(doc_id AS VARCHAR) AS id,
      |    CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS ia,
      |    n_chars AS x
      |  FROM documents
      |  -- complete-case key/id/value mirror of permTestMeanBy
      |  WHERE source IN ('src0', 'src1') AND doc_id IS NOT NULL
      |    AND lang IS NOT NULL AND n_chars IS NOT NULL
      |),
      |t AS (
      |  SELECT lang, CAST(COALESCE(SUM(ia), 0) AS BIGINT) AS n_a,
      |    CAST(COALESCE(COUNT(1) - SUM(ia), 0) AS BIGINT) AS n_b,
      |    CAST(COALESCE(SUM(ia * x), 0) AS HUGEINT) AS sa,
      |    CAST(COALESCE(SUM((1 - ia) * x), 0) AS HUGEINT) AS sb
      |  FROM base GROUP BY lang
      |),
      |o AS (
      |  SELECT lang, n_a, n_b, sa, sb,
      |    CAST(CASE WHEN n_a = 0 OR n_b = 0 THEN 0 ELSE
      |      (CAST(1000000 AS HUGEINT) * sa) // n_a
      |      - (CAST(1000000 AS HUGEINT) * sb) // n_b END AS BIGINT)
      |      AS d_obs_micro,
      |    CAST(CASE WHEN n_a + n_b = 0 THEN 0 ELSE
      |      (CAST(1152921504606846976 AS HUGEINT) * n_a)
      |        // (n_a + n_b) END AS BIGINT) AS thr
      |  FROM t
      |),
      |pb AS (
      |  SELECT lang, b, CAST(SUM(ca) AS BIGINT) AS n1,
      |    CAST(SUM(ca * x) AS HUGEINT) AS s1,
      |    CAST(SUM(1 - ca) AS BIGINT) AS n2,
      |    CAST(SUM((1 - ca) * x) AS HUGEINT) AS s2
      |  FROM (
      |    SELECT base.lang, x, r.range AS b,
      |      CASE WHEN ('0x' || substr(md5(id || ':' ||
      |        CAST(r.range AS VARCHAR)), 1, 15))::BIGINT < thr
      |        THEN 1 ELSE 0 END AS ca
      |    FROM base CROSS JOIN range(0, 64) r JOIN o USING (lang)
      |  )
      |  GROUP BY 1, 2
      |),
      |pd AS (
      |  SELECT lang, b, CAST(CASE WHEN n1 = 0 OR n2 = 0 THEN 0 ELSE
      |    (CAST(1000000 AS HUGEINT) * s1) // n1
      |    - (CAST(1000000 AS HUGEINT) * s2) // n2 END AS BIGINT) AS d
      |  FROM pb
      |),
      |c AS (
      |  SELECT pd.lang, CAST(COUNT(1) AS BIGINT) AS bb,
      |    CAST(COALESCE(SUM(CASE WHEN ABS(d) >= ABS(d_obs_micro)
      |      THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_ge
      |  FROM pd JOIN o USING (lang)
      |  GROUP BY pd.lang
      |)
      |SELECT o.lang, n_a, n_b, CAST(sa AS BIGINT) AS s_a,
      |  CAST(sb AS BIGINT) AS s_b, d_obs_micro, bb AS b, n_ge,
      |  CAST((1000000 * (n_ge + 1)) // (bb + 1) AS BIGINT) AS p_micro
      |FROM o JOIN c ON c.lang = o.lang""".stripMargin

  // ---------------------------------------------------------------- q236

  /** q236: Jensen–Shannon drift between two sources' length
    * distributions (`Profile.jsDivergence`) — the BOUNDED dial closing
    * the drift quartet (q199 KS: where; q212 PSI: how much, but with
    * excluded one-sided buckets; q228 W1: how far): every JS term is
    * finite by construction (a one-sided bucket contributes exactly
    * share·ln2) and the total lives in [0, ln 2], so alert thresholds
    * transfer across datasets. Fourth reader of the same distinct-value
    * store.
    */
  def q236JsDrift(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.Profile.jsDivergence(
      Tables.load(spark, sfDir, "documents")
        .select(col("n_chars"), col("source")),
      "n_chars", "source", "src0", "src1", buckets = 16)

  val q236Sql: String =
    """WITH base AS (
      |  SELECT n_chars AS v,
      |    CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS ia
      |  FROM documents
      |  WHERE source IN ('src0', 'src1') AND n_chars IS NOT NULL
      |),
      |st AS (SELECT MIN(v) AS mn, MAX(v) AS mx FROM base),
      |g AS (
      |  SELECT (v - mn) // ((mx - mn) // 16 + 1) AS bucket,
      |    CAST(SUM(ia) AS BIGINT) AS n_a,
      |    CAST(COUNT(1) - SUM(ia) AS BIGINT) AS n_b
      |  FROM base, st GROUP BY 1
      |),
      |t AS (
      |  SELECT CAST(COALESCE(SUM(n_a), 0) AS BIGINT) AS ta,
      |    CAST(COALESCE(SUM(n_b), 0) AS BIGINT) AS tb
      |  FROM g
      |),
      |terms AS (
      |  SELECT bucket,
      |    CAST(mn + bucket * ((mx - mn) // 16 + 1) AS BIGINT) AS lo,
      |    n_a, n_b,
      |    CAST(n_a * 1000000 // ta AS BIGINT) AS share_a_micro,
      |    CAST(n_b * 1000000 // tb AS BIGINT) AS share_b_micro,
      |    ROUND(0.5e0 * (
      |      CASE WHEN n_a = 0 THEN 0.0e0 ELSE
      |        (CAST(n_a AS DOUBLE) / ta)
      |        * LN(2.0e0 * (CAST(n_a AS DOUBLE) / ta)
      |             / (CAST(n_a AS DOUBLE) / ta
      |                + CAST(n_b AS DOUBLE) / tb)) END
      |      + CASE WHEN n_b = 0 THEN 0.0e0 ELSE
      |        (CAST(n_b AS DOUBLE) / tb)
      |        * LN(2.0e0 * (CAST(n_b AS DOUBLE) / tb)
      |             / (CAST(n_a AS DOUBLE) / ta
      |                + CAST(n_b AS DOUBLE) / tb)) END), 9) AS term9
      |  -- empty-SIDE guard mirror of jsDivergenceFromCounts: zero rows
      |  FROM g, t, st WHERE ta > 0 AND tb > 0
      |),
      |sc AS (
      |  SELECT ROUND(CAST(COALESCE(SUM(CAST(term9 AS DECIMAL(24,9))), 0)
      |      AS DOUBLE), 6) AS js6
      |  FROM terms
      |)
      |SELECT bucket, lo, n_a, n_b, share_a_micro, share_b_micro, term9, js6
      |FROM terms, sc""".stripMargin

  // ---------------------------------------------------------------- q237

  /** q237: drift ATTRIBUTION over the source-length drift
    * (`Profile.w1Attribution`) — the actionable layer on the q228 W1
    * dial: W1 says how FAR the mass moved; this decomposes the same
    * exact area integral over 16 equal-width length ranges, so the
    * alarm comes with "WHICH lengths moved" (contrib_micro = each
    * range's exact integer share of the area; a shift confined to one
    * range attributes 10⁶ to exactly that range). Fifth reader of the
    * same (v, ca, cb) distinct-value store the KS/PSI/W1/JS monitors
    * share.
    */
  def q237DriftAttribution(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.Profile.w1Attribution(
      Tables.load(spark, sfDir, "documents")
        .select(col("n_chars"), col("source")),
      "n_chars", "source", "src0", "src1", buckets = 16)

  val q237Sql: String =
    """WITH base AS (
      |  SELECT n_chars AS v,
      |    CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS ia
      |  FROM documents
      |  WHERE source IN ('src0', 'src1') AND n_chars IS NOT NULL
      |),
      |g AS (
      |  SELECT v, CAST(SUM(ia) AS BIGINT) AS ca,
      |    CAST(COUNT(1) - SUM(ia) AS BIGINT) AS cb
      |  FROM base GROUP BY v
      |),
      |st AS (SELECT MIN(v) AS mn, MAX(v) AS mx FROM g),
      |t AS (
      |  SELECT CAST(COALESCE(SUM(ca), 0) AS BIGINT) AS na,
      |    CAST(COALESCE(SUM(cb), 0) AS BIGINT) AS nb
      |  FROM g
      |),
      |c AS (
      |  SELECT v, (v - mn) // ((mx - mn) // 16 + 1) AS bucket,
      |    CAST(mn + ((v - mn) // ((mx - mn) // 16 + 1))
      |      * ((mx - mn) // 16 + 1) AS BIGINT) AS lo,
      |    ca, cb,
      |    SUM(ca) OVER (ORDER BY v) AS cum_a,
      |    SUM(cb) OVER (ORDER BY v) AS cum_b,
      |    LEAD(v) OVER (ORDER BY v) AS nv
      |  FROM g, st
      |),
      |tm AS (
      |  SELECT bucket, lo, ca, cb,
      |    ABS(CAST(cum_a AS HUGEINT) * nb - CAST(cum_b AS HUGEINT) * na)
      |      * (COALESCE(nv, v) - v) AS term
      |  FROM c, t
      |),
      |pb AS (
      |  SELECT bucket, lo, CAST(SUM(ca) AS BIGINT) AS n_a,
      |    CAST(SUM(cb) AS BIGINT) AS n_b,
      |    CAST(COALESCE(SUM(term), 0) AS HUGEINT) AS area
      |  FROM tm GROUP BY 1, 2
      |),
      |ta AS (SELECT CAST(COALESCE(SUM(area), 0) AS HUGEINT) AS tarea FROM pb)
      |SELECT bucket, lo, n_a, n_b,
      |  CAST(CASE WHEN tarea = 0 THEN 0
      |    ELSE (CAST(1000000 AS HUGEINT) * area) // tarea END AS BIGINT)
      |    AS contrib_micro,
      |  CAST((CAST(1000000 AS HUGEINT) * tarea)
      |    // (CAST(na AS HUGEINT) * nb) AS BIGINT) AS w1_micro
      |-- empty-SIDE guard mirror of w1AttributionFromCounts: zero rows
      |FROM pb, ta, t WHERE na > 0 AND nb > 0""".stripMargin

  // ---------------------------------------------------------------- q235

  /** q235: per-language randomization test of the long-document-rate
    * difference between two sources (`Profile.permTestRateBy`) — q233's
    * assumption-free significance dial SLICED, exactly where it matters:
    * small/lopsided language slices are where the z/χ² normal
    * approximations (q227) break, and the permutation p needs only
    * exchangeability. Each language draws its own md5-coin threshold
    * from its margins; shuffle volume is the (lang × 64) resample table.
    */
  def q235PermTestByLang(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.Profile.permTestRateBy(
      Tables.load(spark, sfDir, "documents")
        .select(col("lang"), col("doc_id"), col("source"),
          when(col("n_chars") >= 512, 1L).otherwise(0L).as("is_long")),
      Seq("lang"), "doc_id", "source", "is_long", "src0", "src1",
      resamples = 64)

  val q235Sql: String =
    """WITH base AS (
      |  SELECT lang, CAST(doc_id AS VARCHAR) AS id,
      |    CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS ia,
      |    CASE WHEN n_chars >= 512 THEN 1 ELSE 0 END AS y
      |  FROM documents
      |  -- complete-case key/id mirror of permTestRateBy
      |  WHERE source IN ('src0', 'src1') AND doc_id IS NOT NULL
      |    AND lang IS NOT NULL
      |),
      |t AS (
      |  SELECT lang, CAST(COALESCE(SUM(ia), 0) AS BIGINT) AS n_a,
      |    CAST(COALESCE(COUNT(1) - SUM(ia), 0) AS BIGINT) AS n_b,
      |    CAST(COALESCE(SUM(ia * y), 0) AS BIGINT) AS x_a,
      |    CAST(COALESCE(SUM((1 - ia) * y), 0) AS BIGINT) AS x_b
      |  FROM base GROUP BY lang
      |),
      |o AS (
      |  SELECT lang, n_a, n_b, x_a, x_b,
      |    CAST(CASE WHEN n_a = 0 OR n_b = 0 THEN 0 ELSE
      |      (CAST(1000000 AS HUGEINT) * x_a) // n_a
      |      - (CAST(1000000 AS HUGEINT) * x_b) // n_b END AS BIGINT)
      |      AS d_obs_micro,
      |    CAST(CASE WHEN n_a + n_b = 0 THEN 0 ELSE
      |      (CAST(1152921504606846976 AS HUGEINT) * n_a)
      |        // (n_a + n_b) END AS BIGINT) AS thr
      |  FROM t
      |),
      |pb AS (
      |  SELECT lang, b, CAST(SUM(ca) AS BIGINT) AS n1,
      |    CAST(SUM(ca * y) AS BIGINT) AS x1,
      |    CAST(SUM(1 - ca) AS BIGINT) AS n2,
      |    CAST(SUM((1 - ca) * y) AS BIGINT) AS x2
      |  FROM (
      |    SELECT base.lang, y, r.range AS b,
      |      CASE WHEN ('0x' || substr(md5(id || ':' ||
      |        CAST(r.range AS VARCHAR)), 1, 15))::BIGINT < thr
      |        THEN 1 ELSE 0 END AS ca
      |    FROM base CROSS JOIN range(0, 64) r JOIN o USING (lang)
      |  )
      |  GROUP BY 1, 2
      |),
      |pd AS (
      |  SELECT lang, b, CAST(CASE WHEN n1 = 0 OR n2 = 0 THEN 0 ELSE
      |    (CAST(1000000 AS HUGEINT) * x1) // n1
      |    - (CAST(1000000 AS HUGEINT) * x2) // n2 END AS BIGINT) AS d
      |  FROM pb
      |),
      |c AS (
      |  SELECT pd.lang, CAST(COUNT(1) AS BIGINT) AS bb,
      |    CAST(COALESCE(SUM(CASE WHEN ABS(d) >= ABS(d_obs_micro)
      |      THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_ge
      |  FROM pd JOIN o USING (lang)
      |  GROUP BY pd.lang
      |)
      |SELECT o.lang, n_a, n_b, x_a, x_b, d_obs_micro, bb AS b, n_ge,
      |  CAST((1000000 * (n_ge + 1)) // (bb + 1) AS BIGINT) AS p_micro
      |FROM o JOIN c ON c.lang = o.lang""".stripMargin

  // ---------------------------------------------------------------- q232

  /** q232: per-language Wasserstein-1 drift between two sources' length
    * distributions (`Profile.wasserstein1By`) — q228's how-FAR dial
    * SLICED, completing the keyed drift matrix (q206 KS-by-lang = where,
    * q214 PSI-by-lang = how much): WHICH language's length distribution
    * moved between the sources, and by how many chars? Per-key two-phase
    * cumulative + per-key Δv lead, every window keyed — zero
    * SinglePartition.
    */
  def q232W1ByLang(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.Profile.wasserstein1By(
      Tables.load(spark, sfDir, "documents")
        .select(col("lang"), col("n_chars"), col("source")),
      Seq("lang"), "n_chars", "source", "src0", "src1")

  val q232Sql: String =
    """WITH g AS (
      |  SELECT lang, n_chars AS v,
      |    CAST(SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
      |    CAST(SUM(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS BIGINT) AS cb
      |  FROM documents
      |  -- complete-case key/value mirror of wasserstein1By
      |  WHERE source IN ('src0', 'src1') AND lang IS NOT NULL
      |    AND n_chars IS NOT NULL
      |  GROUP BY 1, 2
      |),
      |t AS (
      |  SELECT lang, CAST(SUM(ca) AS BIGINT) AS n_a,
      |    CAST(SUM(cb) AS BIGINT) AS n_b, CAST(COUNT(1) AS BIGINT) AS n_values
      |  FROM g GROUP BY lang
      |),
      |c AS (
      |  SELECT lang, v, SUM(ca) OVER w AS cum_a, SUM(cb) OVER w AS cum_b,
      |    LEAD(v) OVER (PARTITION BY lang ORDER BY v) AS nv
      |  FROM g
      |  WINDOW w AS (PARTITION BY lang ORDER BY v
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |),
      |s AS (
      |  SELECT c.lang, COALESCE(SUM(ABS(CAST(cum_a AS HUGEINT) * n_b
      |    - CAST(cum_b AS HUGEINT) * n_a) * (COALESCE(nv, v) - v)), 0) AS area
      |  FROM c JOIN t USING (lang)
      |  GROUP BY c.lang
      |)
      |SELECT lang, n_a, n_b, n_values,
      |  CAST(CASE WHEN n_a = 0 OR n_b = 0 THEN 0
      |    ELSE (CAST(1000000 AS HUGEINT) * area)
      |      // (CAST(n_a AS HUGEINT) * n_b) END AS BIGINT) AS w1_micro
      |FROM t JOIN s USING (lang)""".stripMargin

  // ---------------------------------------------------------------- q229

  /** q229: CUSUM change alarm over daily event volume (`Profile.cusum`) —
    * the "page now" layer on top of the per-snapshot drift dials
    * (q199/q212/q228): a persistent small shift in daily counts never
    * crosses a per-day threshold, but its CUSUM accumulates and fires.
    * Control limits derive from the data in ONE broadcast 1-row frame
    * (target = mean daily count, allowance = target/20, threshold =
    * target/2 — the ±5%-drift-ignored, half-day-of-evidence-to-page
    * convention); the window runs over the bounded day sequence. Exact
    * Long integers end-to-end.
    */
  def q229CusumDaily(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = Tables.load(spark, sfDir, "events")
      .where(col("ts").isNotNull)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
    val tgt = daily.agg(expr("SUM(x) DIV COUNT(1)").as("__tgt"))
    val seq = daily.crossJoin(broadcast(tgt))
      .withColumn("target", col("__tgt"))
      .withColumn("allowance", expr("__tgt DIV 20"))
      .withColumn("threshold", expr("__tgt DIV 2"))
      .drop("__tgt")
    graft.operators.Profile.cusum(seq, "day", "x",
      "target", "allowance", "threshold")
  }

  val q229Sql: String =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(1) AS BIGINT) AS x
      |  FROM events
      |  -- complete-case ts mirror of q229CusumDaily
      |  WHERE ts IS NOT NULL
      |  GROUP BY 1
      |),
      |t AS (SELECT CAST(SUM(x) // COUNT(1) AS BIGINT) AS tgt FROM daily),
      |s AS (
      |  SELECT day, x, tgt // 2 AS h,
      |    SUM(x - tgt - tgt // 20) OVER wo AS wp,
      |    SUM(tgt - tgt // 20 - x) OVER wo AS wn
      |  FROM daily, t
      |  WINDOW wo AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |),
      |c AS (
      |  SELECT day, x, h,
      |    wp - LEAST(0, MIN(wp) OVER wo) AS s_hi,
      |    wn - LEAST(0, MIN(wn) OVER wo) AS s_lo
      |  FROM s
      |  WINDOW wo AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |)
      |SELECT day, x, CAST(s_hi AS BIGINT) AS s_hi, CAST(s_lo AS BIGINT) AS s_lo,
      |  CASE WHEN s_hi >= h THEN 1 ELSE 0 END AS alarm_hi,
      |  CASE WHEN s_lo >= h THEN 1 ELSE 0 END AS alarm_lo
      |FROM c""".stripMargin

  // ---------------------------------------------------------------- q228

  /** q228: Wasserstein-1 drift between two sources' length distributions
    * (`Profile.wasserstein1`) — the third drift dial completing q199
    * (KS: max CDF gap, WHERE the mass moved) and q212 (PSI: how MUCH
    * moved): W1 is the area between the CDFs — how FAR it moved, in
    * chars — the dial that separates "5% of docs got 10 chars longer"
    * from "5% got 10k chars longer", which KS scores identically. Exact
    * integers over the same distinct-value table KS/PSI read; two-phase
    * bucket cumulative, no global sort.
    */
  def q228W1Drift(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.Profile.wasserstein1(
      Tables.load(spark, sfDir, "documents")
        .select(col("n_chars"), col("source")),
      "n_chars", "source", "src0", "src1")

  val q228Sql: String =
    """WITH g AS (
      |  SELECT n_chars AS v,
      |    CAST(SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
      |    CAST(SUM(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS BIGINT) AS cb
      |  FROM documents
      |  -- complete-case value mirror of wasserstein1
      |  WHERE source IN ('src0', 'src1') AND n_chars IS NOT NULL
      |  GROUP BY 1
      |),
      |t AS (
      |  SELECT CAST(SUM(ca) AS BIGINT) AS n_a, CAST(SUM(cb) AS BIGINT) AS n_b,
      |    CAST(COUNT(1) AS BIGINT) AS n_values
      |  FROM g
      |),
      |c AS (
      |  SELECT v, SUM(ca) OVER w AS cum_a, SUM(cb) OVER w AS cum_b,
      |    LEAD(v) OVER (ORDER BY v) AS nv
      |  FROM g
      |  WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |),
      |s AS (
      |  SELECT COALESCE(SUM(ABS(CAST(cum_a AS HUGEINT) * n_b
      |    - CAST(cum_b AS HUGEINT) * n_a) * (COALESCE(nv, v) - v)), 0) AS area
      |  FROM c, t
      |)
      |SELECT n_a, n_b, n_values,
      |  CAST(CASE WHEN n_a = 0 OR n_b = 0 THEN 0
      |    ELSE (CAST(1000000 AS HUGEINT) * area)
      |      // (CAST(n_a AS HUGEINT) * n_b) END AS BIGINT) AS w1_micro
      |FROM t, s""".stripMargin

  // ---------------------------------------------------------------- q227

  /** q227: FDR-controlled rate-deviation dashboard (`Profile.bhFdr`) —
    * the multiple-comparison layer the keyed stat family was missing:
    * per-(source, lang) long-document rates tested against the pooled
    * rate (one-sample two-sided z, exact integer z² = num/den, p via the
    * shared A&S erfc text), then Benjamini–Hochberg step-up at q = 0.05
    * over the whole slice table — so a 100-slice dashboard expects 5
    * false alarms CONTROLLED, not reported. Ranks ride the two-phase
    * bucket cumulative; only bucket-total/1-row frames cross a single
    * partition.
    */
  def q227RateFdr(spark: SparkSession, sfDir: String): DataFrame = {
    val sl = Tables.load(spark, sfDir, "documents")
      .where(col("source").isNotNull && col("lang").isNotNull &&
        col("n_chars").isNotNull)
      .select(col("source"), col("lang"),
        when(col("n_chars") >= 512, 1L).otherwise(0L).as("__yl"))
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n"), sum(col("__yl")).as("x"))
    val tot = sl.agg(sum(col("n")).as("__tn"), sum(col("x")).as("__tx"))
    val withP = graft.operators.Profile.withTwoSidedNormPMicro(
      sl.crossJoin(broadcast(tot))
        .withColumn("__zn", expr(
          """(CAST(x AS DECIMAL(38,0)) * __tn - CAST(n AS DECIMAL(38,0)) * __tx)
            | * (CAST(x AS DECIMAL(38,0)) * __tn - CAST(n AS DECIMAL(38,0)) * __tx)
            |""".stripMargin.replace("\n", "")))
        .withColumn("__zd",
          expr("CAST(n AS DECIMAL(38,0)) * __tx * (__tn - __tx)")))
      .drop("__zn", "__zd", "__tn", "__tx")
    graft.operators.Profile.bhFdr(withP, "p_micro", alphaMicro = 50000L)
  }

  val q227Sql: String = {
    val zn = """(CAST(x AS HUGEINT) * __tn - CAST(n AS HUGEINT) * __tx)
               | * (CAST(x AS HUGEINT) * __tn - CAST(n AS HUGEINT) * __tx)
               |""".stripMargin.replace("\n", "")
    s"""WITH d AS (
       |  SELECT source, lang, CASE WHEN n_chars >= 512 THEN 1 ELSE 0 END AS yl
       |  FROM documents
       |  -- complete-case key/value mirror of q227RateFdr
       |  WHERE source IS NOT NULL AND lang IS NOT NULL AND n_chars IS NOT NULL
       |),
       |sl AS (
       |  SELECT source, lang, CAST(COUNT(1) AS BIGINT) AS n,
       |    CAST(SUM(yl) AS BIGINT) AS x
       |  FROM d GROUP BY 1, 2
       |),
       |t AS (
       |  SELECT CAST(SUM(n) AS BIGINT) AS __tn, CAST(SUM(x) AS BIGINT) AS __tx
       |  FROM sl
       |),
       |z AS (
       |  SELECT source, lang, n, x, $zn AS __zn,
       |    CAST(n AS HUGEINT) * __tx * (__tn - __tx) AS __zd
       |  FROM sl, t
       |),
       |-- the three erfc steps splice Profile's shared expression text
       |xq AS (SELECT *, ${graft.operators.Profile.ZSqXqSql} AS __xq FROM z),
       |tt AS (SELECT *, ${graft.operators.Profile.ErfcTSql} AS __t FROM xq),
       |p AS (
       |  SELECT source, lang, n, x, __zd,
       |    ${graft.operators.Profile.ErfcPMicroSql} AS p_micro
       |  FROM tt
       |),
       |r AS (
       |  SELECT source, lang, n, x, p_micro,
       |    CAST(COUNT(1) OVER (ORDER BY p_micro) AS BIGINT) AS bh_rank,
       |    CAST(COUNT(1) OVER () AS BIGINT) AS m
       |  FROM p
       |),
       |th AS (
       |  SELECT MAX(CASE WHEN p_micro * m <= 50000 * bh_rank
       |    THEN p_micro END) AS thr
       |  FROM r
       |)
       |SELECT source, lang, n, x, p_micro, bh_rank, m,
       |  COALESCE(thr, -1) AS bh_thresh_micro,
       |  CASE WHEN thr IS NOT NULL AND p_micro <= thr THEN 1 ELSE 0 END
       |    AS significant
       |FROM r, th""".stripMargin
  }

  // ---------------------------------------------------------------- q230

  /** q230: per-source Cochran–Armitage trend of English rate across
    * length bands (`Profile.trendTestBy`) — q225's dose-response dial
    * SLICED, the last keyed twin in the eval-stat matrix: the pooled
    * trend (q225) can report "rate rises with length" while one source
    * INVERTS it (the q224 Simpson lesson applied to dose-response); the
    * slice dashboard shows which. One keyed groupBy over the bounded
    * (source × band) table, zero SinglePartition.
    */
  def q230TrendBySource(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.Profile.trendTestBy(
      Tables.load(spark, sfDir, "documents")
        .select(col("source"), expr("n_chars DIV 64").as("len_band"),
          when(col("lang") === "en", 1L).otherwise(0L).as("is_en")),
      Seq("source"), "len_band", "is_en")

  val q230Sql: String =
    """WITH g AS (
      |  SELECT source, n_chars // 64 AS w, CAST(COUNT(1) AS BIGINT) AS n,
      |    CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS p
      |  FROM documents
      |  -- complete-case key/band mirror of trendTestBy
      |  WHERE source IS NOT NULL AND n_chars IS NOT NULL
      |  GROUP BY 1, 2
      |),
      |s AS (
      |  SELECT source, CAST(COALESCE(SUM(n), 0) AS BIGINT) AS n,
      |    CAST(COALESCE(SUM(p), 0) AS BIGINT) AS n_pos,
      |    CAST(COUNT(1) AS BIGINT) AS n_groups,
      |    COALESCE(SUM(CAST(w AS HUGEINT) * p), 0) AS s1,
      |    COALESCE(SUM(CAST(w AS HUGEINT) * n), 0) AS s2,
      |    COALESCE(SUM(CAST(w AS HUGEINT) * w * n), 0) AS q
      |  FROM g GROUP BY source
      |),
      |t AS (
      |  SELECT source, n, n_pos, n_groups,
      |    CAST(n AS HUGEINT) * s1 - CAST(n_pos AS HUGEINT) * s2 AS a,
      |    CAST(n AS HUGEINT) * q - s2 * s2 AS b
      |  FROM s
      |)
      |SELECT source, n, n_pos, n_groups, CAST(SIGN(a) AS BIGINT) AS trend,
      |  CASE WHEN n_pos = 0 OR n_pos = n OR b <= 0 THEN 0.0
      |    ELSE ROUND(CAST(n AS DOUBLE) * CAST(a AS DOUBLE) * CAST(a AS DOUBLE)
      |      / (CAST(n_pos AS DOUBLE) * CAST(n - n_pos AS DOUBLE)
      |         * CAST(b AS DOUBLE)), 6) END AS ca6
      |FROM t""".stripMargin

  // ---------------------------------------------------------------- q226

  /** q226: McNemar policy-migration test of Gopher (q57) vs C4 (q110)
    * keep decisions over the SAME documents (`Profile.mcnemar`) — kappa
    * (q154) asks how SIMILAR two raters are; a curation team switching
    * quality filters asks the McNemar question instead: is the
    * disagreement DIRECTIONAL (one policy systematically keeps what the
    * other drops) beyond coin-flip noise, and which way? Only the
    * discordant documents carry information; exact integers end-to-end,
    * one scalar aggregate over the doc_id-joined decision pair.
    */
  def q226PolicyMcnemar(spark: SparkSession, sfDir: String): DataFrame = {
    val gopher = q57QualityFilter(spark, sfDir)
      .select(col("doc_id"), col("keep").as("gopher_keep"))
    val c4 = q110C4Clean(spark, sfDir)
      .select(col("doc_id"), col("keep").as("c4_keep"))
    graft.operators.Profile.mcnemar(
      gopher.join(c4, "doc_id"), "gopher_keep", "c4_keep")
  }

  lazy val q226Sql: String =
    s"""WITH gk AS (SELECT doc_id, keep AS a FROM ($q57Sql)),
       |ck AS (SELECT doc_id, keep AS b FROM ($q110Sql)),
       |p AS (
       |  SELECT CASE WHEN a THEN 1 ELSE 0 END AS a,
       |    CASE WHEN b THEN 1 ELSE 0 END AS b
       |  FROM gk JOIN ck USING (doc_id)
       |),
       |s AS (
       |  SELECT CAST(COUNT(1) AS BIGINT) AS n,
       |    CAST(COALESCE(SUM(a * b), 0) AS BIGINT) AS n_both,
       |    CAST(COALESCE(SUM(a * (1 - b)), 0) AS BIGINT) AS n_a_only,
       |    CAST(COALESCE(SUM((1 - a) * b), 0) AS BIGINT) AS n_b_only,
       |    CAST(COALESCE(SUM((1 - a) * (1 - b)), 0) AS BIGINT) AS n_neither
       |  FROM p
       |)
       |SELECT n, n_both, n_a_only, n_b_only, n_neither,
       |  CAST(SIGN(n_a_only - n_b_only) AS BIGINT) AS trend,
       |  CAST(CASE WHEN n_a_only + n_b_only = 0 THEN 0
       |    ELSE (CAST(1000000 AS HUGEINT)
       |      * (n_a_only - n_b_only) * (n_a_only - n_b_only))
       |      // (n_a_only + n_b_only) END AS BIGINT) AS mcnemar_micro
       |FROM s""".stripMargin

  // ---------------------------------------------------------------- q231

  /** q231: per-source AP bootstrap CI with SCORE QUANTIZATION
    * (`LmOps.binaryApCiBy(scoreBuckets = 32)`) — q220 with the bounded-
    * shuffle knob on: each slice's scores quantize into 32 equal-width
    * buckets from a per-key min/max pass BEFORE the ×(resamples+1)
    * expansion, so the bootstrap's shuffle volume is
    * (resamples+1) × buckets per key regardless of score ties — the cap
    * that tames the tie-free worst case (rows × resamples distinct
    * scores) at corpus scale. The oracle replays the bucketing exactly:
    * same per-source min/max, same width expression, then q220's entire
    * resample pipeline over the quantized scores.
    */
  def q231ApCiBucketed(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.LmOps.binaryApCiBy(
      Tables.load(spark, sfDir, "documents")
        .select(col("source"), col("doc_id"), col("n_chars").as("len_score"),
          when(col("lang") === "en", 1L).otherwise(0L).as("is_en")),
      Seq("source"), "doc_id", "len_score", "is_en", resamples = 16,
      scoreBuckets = 32)

  /** q220's whole pipeline from the `g` CTE on is the contract being
    * re-run over quantized scores, so q231 SPLICES that tail verbatim
    * (one copy to maintain) behind a bucketing base — only the resample
    * count literal differs. */
  lazy val q231Sql: String = {
    val tail = q220Sql.substring(q220Sql.indexOf("g AS ("))
    """WITH base0 AS (
      |  SELECT source, CAST(doc_id AS VARCHAR) AS id, n_chars AS score0,
      |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      |  FROM documents
      |  -- complete-case key/id/score mirror of binaryApCiBy
      |  WHERE source IS NOT NULL AND doc_id IS NOT NULL AND n_chars IS NOT NULL
      |),
      |st AS (
      |  SELECT source, MIN(score0) AS mn, MAX(score0) AS mx
      |  FROM base0 GROUP BY source
      |),
      |base AS (
      |  -- per-key equal-width quantization, the scoreBuckets=32 mirror
      |  SELECT source, id, (score0 - mn) // ((mx - mn) // 32 + 1) AS score, y
      |  FROM base0 JOIN st USING (source)
      |),
      |""".stripMargin + tail.replace("range(0, 64)", "range(0, 16)")
  }

  // ---------------------------------------------------------------- q155

  /** q155: corpus-mix concentration (`Profile.concentration`) — per-source
    * document shares plus the Herfindahl index of the whole mix, the
    * source-diversity dashboard row a curation run publishes with every
    * snapshot. One |sources|-row shuffle regardless of corpus size.
    */
  def q155MixReport(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.Profile.concentration(
      Tables.load(spark, sfDir, "documents").select(col("source")), "source")

  val q155Sql: String =
    """WITH c AS (
      |  SELECT source, CAST(COUNT(1) AS BIGINT) AS n_rows
      |  FROM documents GROUP BY source
      |),
      |t AS (
      |  SELECT CAST(SUM(n_rows) AS BIGINT) AS tot,
      |    SUM(CAST(n_rows AS HUGEINT) * n_rows) AS sq
      |  FROM c
      |)
      |SELECT source, n_rows,
      |  CAST((CAST(n_rows AS HUGEINT) * 1000000) // tot AS BIGINT) AS share_micro,
      |  CAST((1000000 * sq) // (CAST(tot AS HUGEINT) * tot) AS BIGINT) AS hhi_micro
      |FROM c, t""".stripMargin

  // ---------------------------------------------------------------- q156

  /** q156: largest-remainder token-quota allocation
    * (`TextOps.largestRemainderQuota`) — per-source character budgets that
    * sum to the 777,777-token target EXACTLY (Hamilton apportionment:
    * floor quotas, leftovers to the largest remainders, ties to the
    * smaller key). The step between a mixture spec (q66) and a sampler
    * that must hit a hard budget. The remainder rank is a window over
    * |sources| rows only.
    */
  val QuotaBudget = 777777L

  def q156QuotaAlloc(spark: SparkSession, sfDir: String): DataFrame = {
    val counts = Tables.load(spark, sfDir, "documents")
      .groupBy(col("source")).agg(sum(col("n_chars")).as("n_tokens"))
    TextOps.largestRemainderQuota(counts, "source", "n_tokens", QuotaBudget)
  }

  val q156Sql: String =
    s"""WITH c AS (
       |  SELECT source, CAST(SUM(n_chars) AS BIGINT) AS n_tokens
       |  FROM documents GROUP BY source
       |),
       |t AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot FROM c),
       |b AS (
       |  SELECT source, n_tokens,
       |    CAST(($QuotaBudget * CAST(n_tokens AS HUGEINT)) // tot AS BIGINT) AS base_quota,
       |    CAST(($QuotaBudget * CAST(n_tokens AS HUGEINT)) % tot AS BIGINT) AS rem
       |  FROM c, t
       |),
       |l AS (SELECT $QuotaBudget - SUM(base_quota) AS leftn FROM b),
       |r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, source) AS rk FROM b)
       |SELECT source, n_tokens, base_quota,
       |  CAST(CASE WHEN rk <= leftn THEN 1 ELSE 0 END AS BIGINT) AS extra,
       |  base_quota + CAST(CASE WHEN rk <= leftn THEN 1 ELSE 0 END AS BIGINT) AS quota
       |FROM r, l""".stripMargin

  // ---------------------------------------------------------------- q159

  /** q159: collocation mining (`TextOps.collocations`) — per-token top-3
    * co-occurrence partners by exact integer lift (the PMI ranking without
    * the log), the related-terms table a retrieval stack mines for query
    * expansion. Candidates come from a per-document distinct-token
    * self-join (quadratic in per-doc vocabulary only), counts are
    * combinable groupBys bounded by V², and the top-3 is a rank window
    * (WindowGroupLimit). Oracle replays the identical pair/count/lift
    * arithmetic relationally.
    */
  def q159Collocations(spark: SparkSession, sfDir: String): DataFrame =
    TextOps.collocations(Tables.load(spark, sfDir, "documents"),
      minSupport = 5, k = 3)

  val q159Sql: String =
    """WITH tk AS (
      |  SELECT DISTINCT doc_id, tok FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
      |  ) t WHERE tok <> ''
      |),
      |nd AS (SELECT CAST(COUNT(1) AS BIGINT) AS n FROM documents),
      |cx AS (SELECT tok, CAST(COUNT(1) AS BIGINT) AS c FROM tk GROUP BY tok),
      |p AS (
      |  SELECT a.tok AS x, b.tok AS y, CAST(COUNT(1) AS BIGINT) AS cxy
      |  FROM tk a JOIN tk b ON a.doc_id = b.doc_id AND a.tok < b.tok
      |  GROUP BY a.tok, b.tok HAVING COUNT(1) >= 5
      |),
      |sym AS (SELECT x, y, cxy FROM p UNION ALL SELECT y, x, cxy FROM p),
      |l AS (
      |  SELECT sym.x AS anchor, sym.y AS partner, cxy AS n_docs_pair,
      |    CAST((1000000 * CAST(cxy AS HUGEINT) * nd.n)
      |         // (CAST(ca.c AS HUGEINT) * cb.c) AS BIGINT) AS lift_micro
      |  FROM sym
      |  JOIN cx ca ON ca.tok = sym.x
      |  JOIN cx cb ON cb.tok = sym.y
      |  CROSS JOIN nd
      |),
      |r AS (
      |  SELECT *, row_number() OVER (PARTITION BY anchor
      |    ORDER BY lift_micro DESC, n_docs_pair DESC, partner) AS rank
      |  FROM l
      |)
      |SELECT anchor, partner, n_docs_pair, lift_micro, CAST(rank AS BIGINT) AS rank
      |FROM r WHERE rank <= 3""".stripMargin

  // ---------------------------------------------------------------- q161

  /** q161: deterministic class rebalancing (`TextOps.classBalance`) — the
    * classifier-training prep: every `lang` class downsamples to the
    * smallest class's size, rows picked by md5-hash order (a seedless
    * deterministic shuffle both engines replay). One label-keyed window;
    * counts and the min ride broadcast frames.
    */
  def q161ClassBalance(spark: SparkSession, sfDir: String): DataFrame =
    TextOps.classBalance(
      Tables.load(spark, sfDir, "documents").select(col("doc_id"), col("lang")),
      "lang", "doc_id")
      .select(col("doc_id"), col("lang"), col("pick_rank"))

  val q161Sql: String =
    """WITH m AS (
      |  SELECT MIN(n) AS m FROM (
      |    SELECT COUNT(1) AS n FROM documents GROUP BY lang
      |  ) s
      |),
      |r AS (
      |  SELECT doc_id, lang,
      |    row_number() OVER (PARTITION BY lang
      |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS pick_rank
      |  FROM documents
      |)
      |SELECT doc_id, lang, CAST(pick_rank AS BIGINT) AS pick_rank
      |FROM r, m WHERE pick_rank <= m""".stripMargin

  // ---------------------------------------------------------------- q162

  /** q162: T5-style span corruption (`TextOps.spanCorruption`) — the
    * denoising-objective data prep: the first 3 tokens of every 10 become
    * a numbered sentinel in the input, and the target spells each sentinel
    * followed by the hidden tokens. Pure map-side (zero shuffle); the
    * oracle replays the identical index arithmetic with list_transform.
    */
  def q162SpanCorruption(spark: SparkSession, sfDir: String): DataFrame =
    TextOps.spanCorruption(Tables.load(spark, sfDir, "documents"))
      .select(col("doc_id"), col("input"), col("target"), col("n_masked"))

  val q162Sql: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
      |SELECT doc_id,
      |  array_to_string(list_filter(list_transform(generate_series(1, len(toks)), i ->
      |    CASE WHEN (i - 1) % 10 < 3 THEN
      |      (CASE WHEN (i - 1) % 10 = 0
      |       THEN '<extra_id_' || CAST((i - 1) // 10 AS VARCHAR) || '>'
      |       ELSE NULL END)
      |    ELSE toks[i] END), x -> x IS NOT NULL), ' ') AS input,
      |  array_to_string(list_filter(list_transform(generate_series(1, len(toks)), i ->
      |    CASE WHEN (i - 1) % 10 = 0
      |      THEN '<extra_id_' || CAST((i - 1) // 10 AS VARCHAR) || '> ' || toks[i]
      |    WHEN (i - 1) % 10 < 3 THEN toks[i]
      |    ELSE NULL END), x -> x IS NOT NULL), ' ') AS target,
      |  CAST(len(list_filter(generate_series(1, len(toks)),
      |    i -> (i - 1) % 10 < 3)) AS BIGINT) AS n_masked
      |FROM t""".stripMargin

  // ---------------------------------------------------------------- q163

  /** q163: preference-pair assembly — the reward-model data prep: per
    * prompt group (source), pair the best-scored candidate against the
    * worst (chosen/rejected with margin), score = distinct-token count
    * (an integer quality proxy), ties to the smaller doc_id so the pair is
    * a total-order pick. One map-side-combinable groupBy via min/max over
    * sort-key structs (the q150 survivorship shape); groups whose margin
    * is zero (all candidates tied) drop — no degenerate pairs. The oracle
    * replays the same struct-ordered argmin/argmax.
    */
  def q163PreferencePairs(spark: SparkSession, sfDir: String): DataFrame = {
    val scored = Tables.load(spark, sfDir, "documents").select(
      col("source"), col("doc_id"),
      size(array_distinct(split(col("text"), " "))).cast("long").as("score"))
    scored.groupBy(col("source")).agg(
      min(struct(negate(col("score")).as("k"), col("doc_id").as("v"),
        col("score").as("s"))).as("__c"),
      min(struct(col("score").as("k"), col("doc_id").as("v"))).as("__r"))
      .select(col("source"),
        col("__c.v").as("chosen_id"), col("__r.v").as("rejected_id"),
        col("__c.s").as("chosen_score"), col("__r.k").as("rejected_score"),
        (col("__c.s") - col("__r.k")).as("margin"))
      .where(col("margin") > 0)
  }

  val q163Sql: String =
    """WITH s AS (
      |  SELECT source, doc_id,
      |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS score
      |  FROM documents
      |),
      |g AS (
      |  SELECT source,
      |    MIN({'k': -score, 'v': doc_id, 's': score}) AS c,
      |    MIN({'k': score, 'v': doc_id}) AS r
      |  FROM s GROUP BY source
      |)
      |SELECT source, (c).v AS chosen_id, (r).v AS rejected_id,
      |  (c).s AS chosen_score, (r).k AS rejected_score,
      |  (c).s - (r).k AS margin
      |FROM g WHERE (c).s - (r).k > 0""".stripMargin

  // ---------------------------------------------------------------- q168

  /** q168: rendezvous-hash shard routing (`TextOps.rendezvousShard`,
    * Thaler 1998) — per-doc worker assignment by maximal md5(key ‖ w)
    * over an 8-worker pool, the minimal-remapping router (growing the
    * pool moves only ≈ n/(W+1) keys — spec-gated). Zero shuffle; the
    * oracle replays the same argmax over the same hash strings.
    */
  def q168RendezvousShards(spark: SparkSession, sfDir: String): DataFrame =
    TextOps.rendezvousShard(
      Tables.load(spark, sfDir, "documents").select(col("doc_id")),
      "doc_id", workers = 8)

  val q168Sql: String = {
    val hashes = (0 until 8).map(w =>
      s"md5(CAST(doc_id AS VARCHAR) || '_w' || '$w')").mkString(", ")
    s"""WITH h AS (SELECT doc_id, [$hashes] AS hs FROM documents)
       |SELECT doc_id,
       |  CAST(list_position(hs, list_aggregate(hs, 'max')) - 1 AS BIGINT) AS shard
       |FROM h""".stripMargin
  }

  // ---------------------------------------------------------------- q172

  /** q172: dedup threshold sweep — the TUNING report behind q56's 0.8
    * cutoff: how many documents the keep-first-by-id near-dup rule drops
    * at Jaccard ≥ 0.7 / 0.8 / 0.9, from the SAME session-cached candidate
    * + Jaccard tables every other dedup consumer reads (one extra scan of
    * a pair-count-sized cache per threshold, nothing recomputed).
    */
  def q172DedupSweep(spark: SparkSession, sfDir: String): DataFrame = {
    val n = Tables.rowCount(spark, sfDir, "documents")
    val pairs = sharedJaccard(spark, sfDir)
      .select(col("doc_b"), round(col("jaccard"), 6).as("j"))
    Seq(0.7, 0.8, 0.9).map { t =>
      pairs.filter(col("j") >= t).select(col("doc_b")).distinct()
        .agg(count(lit(1)).as("n_dropped"))
        .select(lit(t).as("threshold"), col("n_dropped"),
          (lit(n) - col("n_dropped")).as("n_surviving"))
    }.reduce(_ unionByName _)
  }

  val q172Sql: String =
    s"""WITH $shingleCte,
       |${sigCte(16)},
       |${bandsCte(16, 4)},
       |$candCte,
       |sizes AS (SELECT doc_id, COUNT(1) AS n_sh FROM shing GROUP BY doc_id),
       |common AS (
       |  SELECT c.doc_a, c.doc_b, COUNT(1) AS n_common
       |  FROM cand c
       |  JOIN shing sa ON sa.doc_id = c.doc_a
       |  JOIN shing sb ON sb.doc_id = c.doc_b AND sa.h = sb.h
       |  GROUP BY c.doc_a, c.doc_b
       |),
       |jac AS (
       |  SELECT m.doc_b,
       |    ROUND(m.n_common / (na.n_sh + nb.n_sh - m.n_common), 6) AS j
       |  FROM common m
       |  JOIN sizes na ON na.doc_id = m.doc_a
       |  JOIN sizes nb ON nb.doc_id = m.doc_b
       |),
       |t(threshold) AS (VALUES (0.7), (0.8), (0.9)),
       |d AS (
       |  SELECT t.threshold, COUNT(DISTINCT jac.doc_b) AS n_dropped
       |  FROM t LEFT JOIN jac ON jac.j >= t.threshold
       |  GROUP BY t.threshold
       |)
       |SELECT CAST(threshold AS DOUBLE) AS threshold,
       |  CAST(n_dropped AS BIGINT) AS n_dropped,
       |  CAST((SELECT COUNT(1) FROM documents) - n_dropped AS BIGINT) AS n_surviving
       |FROM d""".stripMargin

  // ---------------------------------------------------------------- q173

  /** q173: run-length de-stuttering (`TextOps.destutter`) — collapse
    * immediate token repeats, the ASR/degenerate-generation cleanup pass.
    * Pure map-side index filter, zero shuffle; the oracle replays the same
    * previous-token comparison with DuckDB's 1-based lambda index.
    */
  def q173Destutter(spark: SparkSession, sfDir: String): DataFrame =
    TextOps.destutter(Tables.load(spark, sfDir, "documents"))
      .select(col("doc_id"), col("text_clean"), col("n_removed"))

  val q173Sql: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
      |SELECT doc_id,
      |  array_to_string(list_filter(toks, (x, i) -> i = 1 OR x <> toks[i - 1]), ' ') AS text_clean,
      |  CAST(len(toks) - len(list_filter(toks, (x, i) -> i = 1 OR x <> toks[i - 1])) AS BIGINT) AS n_removed
      |FROM t""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q153_classifier_eval", q153ClassifierEval, Some(q153Sql)),
    QueryDef("q154_kappa", q154Kappa, Some(q154Sql)),
    QueryDef("q155_mix_report", q155MixReport, Some(q155Sql)),
    QueryDef("q156_quota_alloc", q156QuotaAlloc, Some(q156Sql)),
    QueryDef("q159_collocations", q159Collocations, Some(q159Sql)),
    QueryDef("q161_class_balance", q161ClassBalance, Some(q161Sql)),
    QueryDef("q162_span_corruption", q162SpanCorruption, Some(q162Sql)),
    QueryDef("q163_preference_pairs", q163PreferencePairs, Some(q163Sql)),
    QueryDef("q168_rendezvous_shards", q168RendezvousShards, Some(q168Sql)),
    QueryDef("q172_dedup_sweep", q172DedupSweep, Some(q172Sql)),
    QueryDef("q173_destutter", q173Destutter, Some(q173Sql)),
    QueryDef("q147_prefix_join", q147PrefixJoin, Some(q147Sql)),
    QueryDef("q144_line_dedup", q144LineDedup, Some(q144Sql)),
    QueryDef("q110_c4_clean", q110C4Clean, Some(q110Sql)),
    QueryDef("q84_jpeg_color", q84JpegColor, Some(q84Sql)),
    QueryDef("q83_pii_scrub", q83PiiScrub, Some(q83Sql)),
    QueryDef("q82_warc_roundtrip", q82WarcRoundtrip, Some(q82Sql)),
    QueryDef("q81_bpe_encode", q81BpeEncode, Some(q81Sql)),
    QueryDef("q80_bpe_merges", q80BpeMerges, Some(q80Sql)),
    QueryDef("q79_remove_dup_spans", q79RemoveDupSpans, Some(q79Sql)),
    QueryDef("q78_flac_roundtrip", q78FlacRoundtrip, Some(q78Sql)),
    QueryDef("q77_jpeg_dc", q77JpegDc, Some(q77Sql)),
    QueryDef("q76_ivfadc_ann", q76IvfadcAnn, Some(q76Sql)),
    QueryDef("q138_ivfadc_rerank", q138IvfadcRerank, Some(q138Sql)),
    QueryDef("q75_png_roundtrip", q75PngRoundtrip, Some(q75Sql)),
    QueryDef("q117_gif_roundtrip", q117GifRoundtrip, Some(q117Sql)),
    QueryDef("q119_unigram_seed", q119UnigramSeed, Some(q119Sql)),
    QueryDef("q120_chunk_overlap", q120ChunkOverlap, Some(q120Sql)),
    QueryDef("q126_token_dropout", q126TokenDropout, Some(q126Sql)),
    QueryDef("q74_curation_funnel", q74CurationFunnel, Some(q74Sql)),
    QueryDef("q73_image_dhash", q73ImageDhash, Some(q73Sql)),
    QueryDef("q141_phash", q141Phash, Some(q141Sql)),
    QueryDef("q72_pcm_silence", q72PcmSilence, Some(q72Sql)),
    QueryDef("q94_fft_spectrum", q94FftSpectrum, Some(q94Sql)),
    QueryDef("q71_length_buckets", q71LengthBuckets, Some(q71Sql)),
    QueryDef("q70_weighted_sample", q70WeightedSample, Some(q70Sql)),
    QueryDef("q68_epoch_shuffle", q68EpochShuffle, Some(q68Sql)),
    QueryDef("q69_dup_spans", q69DupSpans, Some(q69Sql)),
    QueryDef("q65_decontaminate", q65Decontaminate, Some(q65Sql)),
    QueryDef("q66_mixture_epochs", q66MixtureEpochs, Some(q66Sql)),
    QueryDef("q67_dsir_score", q67DsirScore, Some(q67Sql)),
    QueryDef("q64_curation_decision", q64CurationDecision, Some(q64Sql)),
    QueryDef("q63_pq_ann", q63PqAnn, Some(q63Sql)),
    QueryDef("q62_decode_pool", q62DecodePool, Some(q62Sql)),
    QueryDef("q59_neardup_clusters", q59NearDupClusters, Some(q59Sql)),
    QueryDef("q93_cluster_pick", q93ClusterPick, Some(q93Sql)),
    QueryDef("q60_stratified_sample", q60StratifiedSample, Some(q60Sql)),
    QueryDef("q182_stratified_folds", q182StratifiedFolds, Some(q182Sql)),
    QueryDef("q184_leakage_safe_folds", q184LeakageSafeFolds, Some(q184Sql)),
    QueryDef("q187_dataset_card", q187DatasetCard, Some(q187Sql)),
    QueryDef("q189_vocab_coverage", q189VocabCoverage, Some(q189Sql)),
    QueryDef("q190_padding_waste", q190PaddingWaste, Some(q190Sql)),
    QueryDef("q61_pack_sequences", q61PackSequences, Some(q61Sql)),
    QueryDef("q58_semantic_dedup", q58SemanticDedup, Some(q58Sql)),
    QueryDef("q57_quality_filter", q57QualityFilter, Some(q57Sql)),
    QueryDef("q56_dedup_decision", q56DedupDecision, Some(q56Sql)),
    QueryDef("q55_multimodal", q55Multimodal, Some(q55Sql)),
    QueryDef("q37_embed_neardup", q37EmbedNearDup, Some(q37Sql)),
    QueryDef("q51_ann_ivf", q51AnnIvf, Some(q51Sql)),
    QueryDef("q52_token_bpe", q52TokenBpe, Some(q52Sql)),
    QueryDef("q30_dedup_exact", q30DedupExact, Some(q30Sql)),
    QueryDef("q31_text_stats", q31TextStats, Some(q31Sql)),
    QueryDef("q32_langid", q32LangId, Some(q32Sql)),
    QueryDef("q33_fingerprint", q33Fingerprint, Some(q33Sql)),
    QueryDef("q34_simhash", q34Simhash, Some(q34Sql)),
    QueryDef("q35_minhash_pairs", q35MinhashPairs, Some(q35Sql)),
    QueryDef("q36_jaccard", q36Jaccard, Some(q36Sql)),
    QueryDef("q129_containment", q129Containment, Some(q129Sql)),
    QueryDef("q38_ann_topk", q38AnnTopK, Some(q38Sql)),
    QueryDef("q193_pca_project", q193PcaProject, None,
      dynamicOracle = Some(() => q193Oracle)),
    QueryDef("q194_kmeans_assign", q194KmeansAssign, None,
      dynamicOracle = Some(() => q194Oracle)),
    QueryDef("q195_budget_select", q195BudgetSelect, Some(q195Sql)),
    QueryDef("q196_binary_auc", q196BinaryAuc, Some(q196Sql)),
    QueryDef("q197_calibration", q197Calibration, Some(q197Sql)),
    QueryDef("q198_krippendorff", q198Krippendorff, Some(q198Sql)),
    QueryDef("q199_ks_drift", q199KsDrift, Some(q199Sql)),
    QueryDef("q200_truncation_sweep", q200TruncationSweep, Some(q200Sql)),
    QueryDef("q201_chi_square", q201ChiSquare, Some(q201Sql)),
    QueryDef("q202_group_auc", q202GroupAuc, Some(q202Sql)),
    QueryDef("q203_spearman", q203Spearman, Some(q203Sql)),
    QueryDef("q204_isotonic", q204Isotonic, None,
      dynamicOracle = Some(() => q204Oracle)),
    QueryDef("q205_auc_delong", q205AucDelong, Some(q205Sql)),
    QueryDef("q206_ks_by_lang", q206KsByLang, Some(q206Sql)),
    QueryDef("q207_auc_compare", q207AucCompare, Some(q207Sql)),
    QueryDef("q208_isotonic_by_source", q208IsotonicBySource, None,
      dynamicOracle = Some(() => q208Oracle)),
    QueryDef("q209_auc_compare_by_source", q209AucCompareBySource, Some(q209Sql)),
    QueryDef("q210_avg_precision", q210AvgPrecision, Some(q210Sql)),
    QueryDef("q211_calibration_by_source", q211CalibrationBySource, Some(q211Sql)),
    QueryDef("q212_psi_drift", q212PsiDrift, Some(q212Sql)),
    QueryDef("q213_ap_by_source", q213ApBySource, Some(q213Sql)),
    QueryDef("q214_psi_by_lang", q214PsiByLang, Some(q214Sql)),
    QueryDef("q215_mutual_info", q215MutualInfo, Some(q215Sql)),
    QueryDef("q216_group_auc_ci", q216GroupAucCi, Some(q216Sql)),
    QueryDef("q217_mutual_info_by_lang", q217MutualInfoByLang, Some(q217Sql)),
    QueryDef("q218_kendall_tau", q218KendallTau, Some(q218Sql)),
    QueryDef("q219_ap_ci", q219ApCi, Some(q219Sql)),
    QueryDef("q220_ap_ci_by_source", q220ApCiBySource, Some(q220Sql)),
    QueryDef("q221_kendall_by_lang", q221KendallTauByLang, Some(q221Sql)),
    QueryDef("q222_chi_square_by_lang", q222ChiSquareByLang, Some(q222Sql)),
    QueryDef("q223_spearman_by_lang", q223SpearmanByLang, Some(q223Sql)),
    QueryDef("q224_cmh_pooled", q224CmhSourceLength, Some(q224Sql)),
    QueryDef("q225_trend_test", q225TrendTest, Some(q225Sql)),
    QueryDef("q226_policy_mcnemar", q226PolicyMcnemar, Some(q226Sql)),
    QueryDef("q227_rate_fdr", q227RateFdr, Some(q227Sql)),
    QueryDef("q228_w1_drift", q228W1Drift, Some(q228Sql)),
    QueryDef("q229_cusum_daily", q229CusumDaily, Some(q229Sql)),
    QueryDef("q232_w1_by_lang", q232W1ByLang, Some(q232Sql)),
    QueryDef("q233_perm_test", q233PermTest, Some(q233Sql)),
    QueryDef("q235_perm_test_by_lang", q235PermTestByLang, Some(q235Sql)),
    QueryDef("q238_perm_test_mean", q238PermTestMean, Some(q238Sql)),
    QueryDef("q239_perm_test_mean_by_lang", q239PermTestMeanByLang, Some(q239Sql)),
    QueryDef("q236_js_drift", q236JsDrift, Some(q236Sql)),
    QueryDef("q237_drift_attribution", q237DriftAttribution, Some(q237Sql)),
    QueryDef("q230_trend_by_source", q230TrendBySource, Some(q230Sql)),
    QueryDef("q231_ap_ci_bucketed", q231ApCiBucketed, Some(q231Sql)),
    QueryDef("q160_hard_negatives", q160HardNegatives, Some(q160Sql)),
    QueryDef("q39_ann_lsh", q39AnnLsh, Some(q39Sql)),
    QueryDef("q104_sq8_ann", q104Sq8Ann, Some(q104Sql)),
    QueryDef("q106_phrase_search", q106PhraseSearch, Some(q106Sql)))
}
