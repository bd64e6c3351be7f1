package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.{Fuzzy => F, Multimodal, WordPiece}

/** Fuzzy-matching and subword-tokenizer queries: blocked edit-distance
  * joins (record linkage), banded Hamming near-dup over perceptual
  * hashes, and the WordPiece greedy encode.
  */
object Fuzzy {

  /** q128: blocked fuzzy self-join over word-bigram phrases — the entity-
    * resolution shape: block on the first word (the stable attribute),
    * verify candidates with thresholded levenshtein (≤ 2) and score
    * survivors with the codegen'd Jaro-Winkler. Both engines replay the
    * same blocking, so the (documented) recall loss of blocking is part
    * of the operator's semantics, not a divergence.
    */
  def q128FuzzyJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val phrases = docs
      .select(split(col("text"), " ").as("bs"))
      .select(explode(expr(
        "transform(sequence(1, size(bs) - 1), i -> struct(bs[i-1] AS w1, bs[i] AS w2))"))
        .as("p"))
      .filter(col("p.w1") =!= "" && col("p.w2") =!= "")
      .select(col("p.w1").as("w1"),
        concat(col("p.w1"), lit(" "), col("p.w2")).as("phrase"))
      .distinct()
    F.blockedLevenshteinPairs(phrases, "w1", "phrase", maxDist = 2)
      .select(col("str_a").as("phrase_a"), col("str_b").as("phrase_b"),
        col("lev_dist"), col("jw_sim"))
  }

  val q128Sql: String =
    """WITH toks AS (SELECT string_split(text, ' ') AS bs FROM documents),
      |bg AS (
      |  SELECT DISTINCT bs[i] AS w1, bs[i] || ' ' || bs[i+1] AS phrase
      |  FROM (SELECT bs, unnest(generate_series(1, len(bs) - 1)) AS i FROM toks)
      |  WHERE bs[i] <> '' AND bs[i+1] <> ''
      |)
      |SELECT a.phrase AS phrase_a, b.phrase AS phrase_b,
      |  levenshtein(a.phrase, b.phrase) AS lev_dist,
      |  ROUND(jaro_winkler_similarity(a.phrase, b.phrase), 6) AS jw_sim
      |FROM bg a JOIN bg b ON a.w1 = b.w1 AND a.phrase < b.phrase
      |WHERE levenshtein(a.phrase, b.phrase) <= 2""".stripMargin

  /** q130: image near-duplicate pairs by banded Hamming search over the
    * 56-bit perceptual dHash (16-wide gray decode, 2×2 pooling — finer
    * than q73's exact-hash grouping, which misses near-dups that flip a
    * few gradient signs). Identical hashes collapse FIRST (exact-dup
    * cliques would pair quadratically), then distinct hashes pair via
    * bit-interleaved bands — 4 bands, Hamming ≤ 3, so recall is exact by
    * pigeonhole — and each side carries its collapsed group size.
    */
  // the (dhash, n_docs) groups and the confirmed Hamming pairs are shared
  // by q130 (pair report) and q134 (cluster labeling) — one decode+hash
  // pass and one banded join per session, the Text-module cache pattern
  // the three image-signal caches are all released after q136 (the last
  // consumer in CacheLife terms): q130 reads groups+pairs, q134 reads the
  // cluster map (built from both), q136 reads groups + the cluster map
  private val ImgConsumers: Set[String] =
    Set("q130_image_neardup", "q134_image_clusters", "q136_multimodal_curation")

  private def sharedDhashGroups(spark: SparkSession, sfDir: String): DataFrame =
    graft.core.CacheLife.shared(spark, sfDir, "dhash_groups", ImgConsumers) {
      import spark.implicits._
      val media = Tables.load(spark, sfDir, "documents")
        .select(col("doc_id").as("media_id"), lit("gray").as("kind"),
          encode(col("text"), "UTF-8").as("payload"), lit(16).as("width"), lit(0).as("height"))
        .as[Multimodal.MediaRow]
      Multimodal.dHash(media, width = 16, pool = 2)
        .groupBy(col("dhash")).agg(count(lit(1)).as("n_docs"))
    }

  private def sharedHammingPairs(spark: SparkSession, sfDir: String): DataFrame =
    graft.core.CacheLife.shared(spark, sfDir, "hamming_pairs", ImgConsumers)(
      F.hammingNearDupPairs(sharedDhashGroups(spark, sfDir).select(col("dhash")),
        "dhash", bits = 56, bands = 4, maxHamming = 3))

  def q130ImageNearDup(spark: SparkSession, sfDir: String): DataFrame = {
    val hg = sharedDhashGroups(spark, sfDir)
    sharedHammingPairs(spark, sfDir)
      .join(broadcast(hg.select(col("dhash").as("hash_a"), col("n_docs").as("n_a"))), "hash_a")
      .join(broadcast(hg.select(col("dhash").as("hash_b"), col("n_docs").as("n_b"))), "hash_b")
      .select(col("hash_a"), col("hash_b"), col("hamming"), col("n_a"), col("n_b"))
  }

  val q130Sql: String =
    """WITH dims AS (
      |  SELECT doc_id, text,
      |    ((length(text) // 16) - (length(text) // 16) % 2) AS full_h
      |  FROM documents
      |),
      |px AS (
      |  SELECT doc_id, CAST((i - 1) // 16 AS INTEGER) AS r,
      |    CAST((i - 1) % 16 AS INTEGER) AS c,
      |    ascii(substr(text, CAST(i AS BIGINT), 1)) AS v
      |  FROM (SELECT doc_id, text, unnest(generate_series(1, full_h * 16)) AS i FROM dims) t
      |),
      |blk AS (
      |  SELECT doc_id, r // 2 AS br, c // 2 AS bc, AVG(v) AS m
      |  FROM px WHERE r // 2 < 8 GROUP BY 1, 2, 3
      |),
      |bits AS (
      |  SELECT a.doc_id, CASE WHEN a.m > b.m
      |    THEN 1::BIGINT << (a.br * 7 + a.bc) ELSE 0::BIGINT END AS bit
      |  FROM blk a JOIN blk b
      |    ON a.doc_id = b.doc_id AND a.br = b.br AND b.bc = a.bc + 1
      |),
      |h AS (SELECT doc_id, CAST(SUM(bit) AS BIGINT) AS dhash FROM bits GROUP BY doc_id),
      |hg AS (SELECT dhash, COUNT(*) AS n_docs FROM h GROUP BY dhash),
      |bands AS (
      |  SELECT dhash, bi,
      |    (SELECT SUM(((dhash >> (4 * k + bi)) & 1) << k)
      |     FROM (SELECT unnest(generate_series(0, 13)) AS k)) AS bv
      |  FROM hg, (SELECT unnest(generate_series(0, 3)) AS bi) b
      |),
      |cand AS (
      |  SELECT DISTINCT a.dhash AS hash_a, b.dhash AS hash_b
      |  FROM bands a JOIN bands b ON a.bi = b.bi AND a.bv = b.bv AND a.dhash < b.dhash
      |)
      |SELECT c.hash_a, c.hash_b,
      |  CAST(bit_count(xor(c.hash_a, c.hash_b)) AS INTEGER) AS hamming,
      |  ga.n_docs AS n_a, gb.n_docs AS n_b
      |FROM cand c
      |JOIN hg ga ON ga.dhash = c.hash_a
      |JOIN hg gb ON gb.dhash = c.hash_b
      |WHERE bit_count(xor(c.hash_a, c.hash_b)) <= 3""".stripMargin

  /** q134: image near-dup CLUSTERS — the labeling step after q130's pair
    * detection (the q59 shape lifted to perceptual fingerprints): the
    * confirmed Hamming pairs become edges over the distinct-hash nodes,
    * large-star/small-star connected components assign every hash its
    * cluster (min member hash), and singleton hashes keep themselves.
    * Shares the session's persisted hash groups and pair table with q130.
    */
  // (dhash, n_docs, cluster_id) incl. singletons — shared by q134's
  // report and q136's doc-level image-canonical signal
  private def sharedImageClusterMap(spark: SparkSession, sfDir: String): DataFrame =
    graft.core.CacheLife.shared(spark, sfDir, "image_clusters",
        Set("q134_image_clusters", "q136_multimodal_curation")) {
      import graft.operators.ConnectedComponents
      val hg = sharedDhashGroups(spark, sfDir)
      val pairs = sharedHammingPairs(spark, sfDir).select(col("hash_a"), col("hash_b"))
      val cc = ConnectedComponents.run(pairs, "hash_a", "hash_b")
        .withColumnRenamed("node", "dhash")
      hg.join(cc, Seq("dhash"), "left")
        .select(col("dhash"), col("n_docs"),
          coalesce(col("component"), col("dhash")).as("cluster_id"))
    }

  def q134ImageClusters(spark: SparkSession, sfDir: String): DataFrame = {
    val labeled = sharedImageClusterMap(spark, sfDir)
    val sizes = labeled.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("cluster_size"), sum(col("n_docs")).as("cluster_docs"))
    labeled.join(sizes, "cluster_id")
      .select(col("dhash"), col("n_docs"), col("cluster_id"),
        col("cluster_size"), col("cluster_docs"),
        (col("dhash") === col("cluster_id")).as("is_canonical"))
  }

  val q134Sql: String = {
    // q130's chain up to confirmed pairs, then min-label reachability
    val confirmed =
      """SELECT c.hash_a, c.hash_b
        |  FROM cand c WHERE bit_count(xor(c.hash_a, c.hash_b)) <= 3""".stripMargin
    s"""WITH RECURSIVE dims AS (
       |  SELECT doc_id, text,
       |    ((length(text) // 16) - (length(text) // 16) % 2) AS full_h
       |  FROM documents
       |),
       |px AS (
       |  SELECT doc_id, CAST((i - 1) // 16 AS INTEGER) AS r,
       |    CAST((i - 1) % 16 AS INTEGER) AS c,
       |    ascii(substr(text, CAST(i AS BIGINT), 1)) AS v
       |  FROM (SELECT doc_id, text, unnest(generate_series(1, full_h * 16)) AS i FROM dims) t
       |),
       |blk AS (
       |  SELECT doc_id, r // 2 AS br, c // 2 AS bc, AVG(v) AS m
       |  FROM px WHERE r // 2 < 8 GROUP BY 1, 2, 3
       |),
       |bits AS (
       |  SELECT a.doc_id, CASE WHEN a.m > b.m
       |    THEN 1::BIGINT << (a.br * 7 + a.bc) ELSE 0::BIGINT END AS bit
       |  FROM blk a JOIN blk b
       |    ON a.doc_id = b.doc_id AND a.br = b.br AND b.bc = a.bc + 1
       |),
       |h AS (SELECT doc_id, CAST(SUM(bit) AS BIGINT) AS dhash FROM bits GROUP BY doc_id),
       |hg AS (SELECT dhash, COUNT(*) AS n_docs FROM h GROUP BY dhash),
       |bands AS (
       |  SELECT dhash, bi,
       |    (SELECT SUM(((dhash >> (4 * k + bi)) & 1) << k)
       |     FROM (SELECT unnest(generate_series(0, 13)) AS k)) AS bv
       |  FROM hg, (SELECT unnest(generate_series(0, 3)) AS bi) b
       |),
       |cand AS (
       |  SELECT DISTINCT a.dhash AS hash_a, b.dhash AS hash_b
       |  FROM bands a JOIN bands b ON a.bi = b.bi AND a.bv = b.bv AND a.dhash < b.dhash
       |),
       |pairs AS (
       |$confirmed
       |),
       |edges AS (
       |  SELECT hash_a AS src, hash_b AS dst FROM pairs
       |  UNION SELECT hash_b, hash_a FROM pairs
       |),
       |reach(v, m) AS (
       |  SELECT dhash, dhash FROM hg
       |  UNION
       |  SELECT e.dst, r.m FROM reach r JOIN edges e ON e.src = r.v
       |),
       |comp AS (SELECT v AS dhash, MIN(m) AS cluster_id FROM reach GROUP BY v),
       |cs AS (
       |  SELECT comp.cluster_id, COUNT(1) AS cluster_size, SUM(hg.n_docs) AS cluster_docs
       |  FROM comp JOIN hg USING (dhash) GROUP BY comp.cluster_id
       |)
       |SELECT hg.dhash, hg.n_docs, comp.cluster_id, cs.cluster_size,
       |  CAST(cs.cluster_docs AS BIGINT) AS cluster_docs,
       |  hg.dhash = comp.cluster_id AS is_canonical
       |FROM hg JOIN comp USING (dhash) JOIN cs USING (cluster_id)""".stripMargin
  }

  /** q131: WordPiece greedy encode over the corpus vocabulary — derived
    * vocab (all chars + top-20 word prefixes 2..4 as initial pieces +
    * top-20 word suffixes 2..3 as `##` continuations), longest-match-
    * first walk per distinct word. The oracle precomputes each
    * position's best piece with a window rank and replays the walk as a
    * recursive CTE — any greedy-order or piece-set divergence breaks the
    * encoded strings.
    */
  def q131WordPiece(spark: SparkSession, sfDir: String): DataFrame = {
    val words = WordPiece.wordFreq(Tables.load(spark, sfDir, "documents"))
    val vocab = WordPiece.deriveVocab(words, topWords = 20, maxPrefix = 4, maxSuffix = 3)
    WordPiece.encodeWords(spark, words, vocab)
  }

  val q131Sql: String =
    """WITH RECURSIVE
      |toks AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
      |words AS (SELECT w, COUNT(*) AS freq FROM toks WHERE w <> '' GROUP BY w),
      |top20 AS (SELECT w FROM words ORDER BY freq DESC, w LIMIT 20),
      |chars AS (
      |  SELECT DISTINCT substr(w, i, 1) AS p
      |  FROM (SELECT w, unnest(generate_series(1, length(w))) AS i FROM words)
      |),
      |prefixes AS (
      |  SELECT DISTINCT substr(w, 1, l) AS p
      |  FROM top20, (SELECT unnest([2, 3, 4]) AS l) ls WHERE length(w) >= l
      |),
      |sufs AS (
      |  SELECT DISTINCT substr(w, length(w) - l + 1, l) AS p
      |  FROM top20, (SELECT unnest([2, 3]) AS l) ls WHERE length(w) > l
      |),
      |vinit AS (SELECT p FROM chars UNION SELECT p FROM prefixes),
      |vcont AS (SELECT p FROM chars UNION SELECT p FROM sufs),
      |pos AS (SELECT w, unnest(generate_series(1, length(w))) AS p FROM words),
      |besti AS (
      |  SELECT w, p, piece FROM (
      |    SELECT pos.w, pos.p, v.p AS piece,
      |      row_number() OVER (PARTITION BY pos.w, pos.p
      |        ORDER BY length(v.p) DESC, v.p) AS rn
      |    FROM pos JOIN vinit v ON substr(pos.w, pos.p, length(v.p)) = v.p
      |  ) WHERE rn = 1
      |),
      |bestc AS (
      |  SELECT w, p, piece FROM (
      |    SELECT pos.w, pos.p, v.p AS piece,
      |      row_number() OVER (PARTITION BY pos.w, pos.p
      |        ORDER BY length(v.p) DESC, v.p) AS rn
      |    FROM pos JOIN vcont v ON substr(pos.w, pos.p, length(v.p)) = v.p
      |  ) WHERE rn = 1
      |),
      |walk(w, p, acc, n) AS (
      |  SELECT w, 1 + length(piece), piece, 1 FROM besti WHERE p = 1
      |  UNION ALL
      |  SELECT walk.w, walk.p + length(b.piece),
      |    walk.acc || ' ##' || b.piece, walk.n + 1
      |  FROM walk JOIN bestc b ON b.w = walk.w AND b.p = walk.p
      |)
      |SELECT words.w AS word, words.freq, walk.n AS n_pieces, walk.acc AS encoded
      |FROM walk JOIN words ON words.w = walk.w
      |WHERE walk.p = length(words.w) + 1""".stripMargin

  /** q137: TRAINED WordPiece vocabulary — the likelihood-driven merge
    * table (Wu 2016), complementing q131's derived-vocab greedy encode:
    * k rounds of score-argmax-fuse over the word-frequency table, score =
    * freq(ab)/(freq(a)·freq(b)) — the pair whose fusion most increases
    * corpus likelihood under a unigram piece LM. The oracle replays the
    * FULL training as a generated k-level CTE chain (pair counts, symbol
    * counts, the double-division score argmax with (score DESC, a, b)
    * tie-break, the fold) — so the training procedure itself is
    * driver-gated, like q80's BPE chain. All reported columns are
    * integers/strings; the IEEE double score is ordering-only and
    * identical on both engines by correct rounding.
    */
  private val WpK = 6

  // merges trained once per (session, sfDir) — the q80 BPE memo contract:
  // a driver-side Seq (no storage cost), evicted with the session
  private val wpCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), Seq[WordPiece.Merge]]
  private def trainedWpMerges(spark: SparkSession, sfDir: String): Seq[WordPiece.Merge] = {
    wpCache.filterInPlace((k, _) => !k._1.sparkContext.isStopped)
    wpCache.getOrElseUpdate((spark, sfDir),
      WordPiece.train(
        WordPiece.symTable(Tables.load(spark, sfDir, "documents")), WpK))
  }

  def q137WordPieceTrain(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    trainedWpMerges(spark, sfDir)
      .map(m => (m.rank, m.a, m.b, m.merged, m.cnt, m.fa, m.fb))
      .toDF("rank", "a", "b", "merged", "cnt", "fa", "fb")
  }

  // the WordPiece fold twin of Text.bpeFoldSql: fused piece strips b's ##
  private def wpFoldSql(m: String): String =
    s"""string_split(list_reduce(syms, (acc, x) -> CASE
       |      WHEN string_split(acc, ' ')[-1] = $m.a AND x = $m.b
       |      THEN substr(acc, 1, length(acc) - length(string_split(acc, ' ')[-1])) || $m.a || substr($m.b, 3)
       |      ELSE acc || ' ' || x END), ' ')""".stripMargin

  lazy val q137Sql: String = {
    val base =
      """s0 AS (
        |  SELECT w, freq,
        |    list_transform(generate_series(1, length(w)),
        |      i -> CASE WHEN i = 1 THEN substr(w, 1, 1) ELSE '##' || substr(w, i, 1) END) AS syms
        |  FROM (
        |    SELECT w, COUNT(1) AS freq
        |    FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents) t
        |    WHERE length(w) > 0 GROUP BY w
        |  ) wt
        |)""".stripMargin
    val levels = (0 until WpK).map { r =>
      s"""p$r AS (
         |  SELECT syms[i] AS a, syms[i + 1] AS b, SUM(freq) AS cnt
         |  FROM (SELECT freq, syms, unnest(generate_series(1, len(syms) - 1)) AS i FROM s$r) z
         |  GROUP BY 1, 2
         |),
         |f$r AS (
         |  SELECT s AS sym, SUM(freq) AS f
         |  FROM (SELECT freq, unnest(syms) AS s FROM s$r) z GROUP BY 1
         |),
         |m$r AS (
         |  SELECT p.a, p.b, p.cnt, fa.f AS fa, fb.f AS fb
         |  FROM p$r p JOIN f$r fa ON fa.sym = p.a JOIN f$r fb ON fb.sym = p.b
         |  ORDER BY CAST(p.cnt AS DOUBLE) / fa.f / fb.f DESC, p.a ASC, p.b ASC
         |  LIMIT 1
         |),
         |s${r + 1} AS (
         |  SELECT w, freq, ${wpFoldSql(s"m$r")} AS syms
         |  FROM s$r CROSS JOIN m$r
         |)""".stripMargin
    }
    val rows = (0 until WpK).map { r =>
      s"SELECT $r AS rank, a, b, a || substr(b, 3) AS merged, " +
        s"CAST(cnt AS BIGINT) AS cnt, CAST(fa AS BIGINT) AS fa, " +
        s"CAST(fb AS BIGINT) AS fb FROM m$r"
    }.mkString("\n  UNION ALL ")
    s"WITH ${(base +: levels).mkString(",\n")}\n  $rows"
  }

  /** q132: TF-IDF-style term salience, integer-exact — top-3 terms per
    * document ranked by `tf·N/df` in micro-units via BIGINT division (the
    * monotone idf ranking without `ln`'s cross-engine libm hazard). One
    * token explode feeds both the tf and df aggregations; the per-doc
    * top-3 window is a WindowGroupLimit (map-side top-k, no global sort);
    * the df side joins on term (AQE broadcasts it when the vocabulary is
    * small, shuffles when it isn't).
    */
  def q132TfidfSalience(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.load(spark, sfDir, "documents")
    val toks = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
    val tf = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfT = toks.groupBy(col("term")).agg(countDistinct(col("doc_id")).as("df"))
    val n = docs.agg(count(lit(1)).as("n"))
    tf.join(dfT, "term")
      .crossJoin(broadcast(n))
      .withColumn("salience_micro", expr("tf * n * 1000000L div df"))
      .withColumn("rank", row_number().over(Window.partitionBy(col("doc_id"))
        .orderBy(col("salience_micro").desc, col("term").asc)).cast("int"))
      .filter(col("rank") <= 3)
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        col("salience_micro"), col("rank"))
  }

  val q132Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
      |),
      |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks WHERE term <> '' GROUP BY doc_id, term),
      |df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks WHERE term <> '' GROUP BY term),
      |n AS (SELECT COUNT(*) AS n FROM documents),
      |sc AS (
      |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
      |    (tf.tf * n.n * 1000000) // df.df AS salience_micro
      |  FROM tf JOIN df USING (term), n
      |)
      |SELECT doc_id, term, tf, df, salience_micro, CAST(rn AS INTEGER) AS rank FROM (
      |  SELECT *, row_number() OVER (PARTITION BY doc_id
      |    ORDER BY salience_micro DESC, term) AS rn
      |  FROM sc
      |) WHERE rn <= 3""".stripMargin

  /** q135: audio near-dup by spectral-peak fingerprinting — the
    * frequency-domain companion to the image (q130/q134) and video (q123)
    * near-dup passes, closing the multimodal dedup triple: each clip's
    * first 4 audio frames (documents as 8-bit PCM, the q94 framing) FFT
    * through the real radix-2 kernel, every frame contributes its peak
    * bin (argmax over 4-decimal magnitudes, low-bin tiebreak — stable
    * across the engine's FFT and the oracle's direct DFT at ~1e-10
    * float delta), and the packed peak sequence (6 bits/frame) groups
    * clips exactly. Amplitude-preserving edits past the fingerprinted
    * region keep the same fingerprint — the audio analogue of q73's
    * hash-region semantics.
    */
  def q135AudioNearDup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val media = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id").as("media_id"), lit("pcm8").as("kind"),
        encode(col("text"), "UTF-8").as("payload"), lit(0).as("width"), lit(0).as("height"))
      .as[Multimodal.MediaRow]
    val pk = Multimodal.fftSpectrum(media, frameLen = 64)
      .filter(col("frame") < 4 && col("bin") >= 1)
      .withColumn("__mag", round(col("mag"), 4))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("media_id"), col("frame"))
          .orderBy(col("__mag").desc, col("bin").asc)))
      .filter(col("__rn") === 1)
      .select(col("media_id").as("doc_id"), col("frame"), col("bin").as("peak"))
    val fp = pk.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_frames"),
        sum(expr("CAST(peak AS BIGINT) << (6 * frame)")).as("fingerprint"))
    val g = fp.groupBy(col("n_frames"), col("fingerprint"))
      .agg(min(col("doc_id")).as("__canon"), count(lit(1)).as("n_copies"))
    fp.join(g, Seq("n_frames", "fingerprint"))
      .select(col("doc_id"), col("n_frames"), col("fingerprint"),
        (col("doc_id") === col("__canon")).as("is_canonical"), col("n_copies"))
  }

  val q135Sql: String =
    """WITH t AS (SELECT doc_id, text, length(text) AS n FROM documents),
      |s AS (
      |  SELECT doc_id, CAST((i - 1) // 64 AS INTEGER) AS frame,
      |    CAST((i - 1) % 64 AS INTEGER) AS tpos,
      |    ascii(substr(text, CAST(i AS BIGINT), 1)) AS v
      |  FROM (SELECT doc_id, text,
      |        unnest(generate_series(1, LEAST(n // 64, 4) * 64)) AS i FROM t)
      |),
      |x AS (
      |  SELECT doc_id, frame, k,
      |    SUM(v * cos(-2 * pi() * k * tpos / 64)) AS re,
      |    SUM(v * sin(-2 * pi() * k * tpos / 64)) AS im
      |  FROM s CROSS JOIN (SELECT unnest(generate_series(1, 32)) AS k) ks
      |  GROUP BY doc_id, frame, k
      |),
      |mg AS (SELECT doc_id, frame, k, ROUND(sqrt(re * re + im * im), 4) AS mag FROM x),
      |pk AS (
      |  SELECT doc_id, frame, k AS peak FROM (
      |    SELECT *, row_number() OVER (PARTITION BY doc_id, frame
      |      ORDER BY mag DESC, k) AS rn
      |    FROM mg
      |  ) WHERE rn = 1
      |),
      |fp AS (
      |  SELECT doc_id, COUNT(*) AS n_frames,
      |    CAST(SUM(CAST(peak AS BIGINT) << (6 * frame)) AS BIGINT) AS fingerprint
      |  FROM pk GROUP BY doc_id
      |),
      |g AS (SELECT n_frames, fingerprint, MIN(doc_id) AS canon, COUNT(*) AS n_copies
      |      FROM fp GROUP BY 1, 2)
      |SELECT fp.doc_id, fp.n_frames, fp.fingerprint,
      |  fp.doc_id = g.canon AS is_canonical, g.n_copies
      |FROM fp JOIN g USING (n_frames, fingerprint)""".stripMargin

  /** q136: the MULTIMODAL curation decision — the capstone compose over
    * the three modality dedup passes (the q64/q74 pattern lifted to
    * media): a document survives iff it is the canonical representative
    * of its text exact-dup group (md5), its image near-dup CLUSTER
    * (q134's Hamming components, doc-level), and its audio fingerprint
    * group (q135). A document too short to fingerprint in a modality
    * (no dHash rows, no audio frame) passes that modality trivially — with
    * the first failing modality as the drop reason. All three signals
    * ride the session caches; every join is keyed on doc_id.
    */
  def q136MultimodalCuration(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.load(spark, sfDir, "documents")
    val txt = docs.select(col("doc_id"), md5(col("text")).as("__k"))
      .withColumn("txt_canon",
        col("doc_id") === min(col("doc_id")).over(Window.partitionBy(col("__k"))))
      .select(col("doc_id"), col("txt_canon"))
    val media = docs
      .select(col("doc_id").as("media_id"), lit("gray").as("kind"),
        encode(col("text"), "UTF-8").as("payload"), lit(16).as("width"), lit(0).as("height"))
      .as[Multimodal.MediaRow]
    val img = Multimodal.dHash(media, width = 16, pool = 2)
      .join(sharedImageClusterMap(spark, sfDir).select(col("dhash"), col("cluster_id")), "dhash")
      .withColumn("img_canon",
        col("media_id") === min(col("media_id")).over(Window.partitionBy(col("cluster_id"))))
      .select(col("media_id").as("doc_id"), col("img_canon"))
    val aud = q135AudioNearDup(spark, sfDir)
      .select(col("doc_id"), col("is_canonical").as("aud_canon"))
    // img and aud are LEFT joins with a `true` default: a document whose
    // text is too short to fingerprint in a modality (< 2 pooled dHash
    // rows, < 1 audio frame) passes that modality trivially instead of
    // silently dropping out of the curation report
    txt.join(img, Seq("doc_id"), "left")
      .withColumn("img_canon", coalesce(col("img_canon"), lit(true)))
      .join(aud, Seq("doc_id"), "left")
      .withColumn("aud_canon", coalesce(col("aud_canon"), lit(true)))
      .select(col("doc_id"), col("txt_canon"), col("img_canon"), col("aud_canon"),
        (col("txt_canon") && col("img_canon") && col("aud_canon")).as("keep"),
        when(!col("txt_canon"), "text_dup")
          .when(!col("img_canon"), "image_dup")
          .when(!col("aud_canon"), "audio_dup")
          .otherwise("kept").as("drop_reason"))
  }

  val q136Sql: String =
    """WITH RECURSIVE
      |txt AS (
      |  SELECT doc_id,
      |    doc_id = MIN(doc_id) OVER (PARTITION BY md5(text)) AS txt_canon
      |  FROM documents
      |),
      |dims AS (
      |  SELECT doc_id, text,
      |    ((length(text) // 16) - (length(text) // 16) % 2) AS full_h
      |  FROM documents
      |),
      |px AS (
      |  SELECT doc_id, CAST((i - 1) // 16 AS INTEGER) AS r,
      |    CAST((i - 1) % 16 AS INTEGER) AS c,
      |    ascii(substr(text, CAST(i AS BIGINT), 1)) AS v
      |  FROM (SELECT doc_id, text, unnest(generate_series(1, full_h * 16)) AS i FROM dims) t
      |),
      |blk AS (
      |  SELECT doc_id, r // 2 AS br, c // 2 AS bc, AVG(v) AS m
      |  FROM px WHERE r // 2 < 8 GROUP BY 1, 2, 3
      |),
      |bits AS (
      |  SELECT a.doc_id, CASE WHEN a.m > b.m
      |    THEN 1::BIGINT << (a.br * 7 + a.bc) ELSE 0::BIGINT END AS bit
      |  FROM blk a JOIN blk b
      |    ON a.doc_id = b.doc_id AND a.br = b.br AND b.bc = a.bc + 1
      |),
      |h AS (SELECT doc_id, CAST(SUM(bit) AS BIGINT) AS dhash FROM bits GROUP BY doc_id),
      |hg AS (SELECT dhash FROM h GROUP BY dhash),
      |bands AS (
      |  SELECT dhash, bi,
      |    (SELECT SUM(((dhash >> (4 * k + bi)) & 1) << k)
      |     FROM (SELECT unnest(generate_series(0, 13)) AS k)) AS bv
      |  FROM hg, (SELECT unnest(generate_series(0, 3)) AS bi) b
      |),
      |cand AS (
      |  SELECT DISTINCT a.dhash AS hash_a, b.dhash AS hash_b
      |  FROM bands a JOIN bands b ON a.bi = b.bi AND a.bv = b.bv AND a.dhash < b.dhash
      |),
      |hpairs AS (
      |  SELECT hash_a, hash_b FROM cand WHERE bit_count(xor(hash_a, hash_b)) <= 3
      |),
      |edges AS (
      |  SELECT hash_a AS src, hash_b AS dst FROM hpairs
      |  UNION SELECT hash_b, hash_a FROM hpairs
      |),
      |reach(v, m) AS (
      |  SELECT dhash, dhash FROM hg
      |  UNION
      |  SELECT e.dst, r.m FROM reach r JOIN edges e ON e.src = r.v
      |),
      |comp AS (SELECT v AS dhash, MIN(m) AS cluster_id FROM reach GROUP BY v),
      |img AS (
      |  SELECT h.doc_id,
      |    h.doc_id = MIN(h.doc_id) OVER (PARTITION BY comp.cluster_id) AS img_canon
      |  FROM h JOIN comp USING (dhash)
      |),
      |at AS (SELECT doc_id, text, length(text) AS n FROM documents),
      |asx AS (
      |  SELECT doc_id, CAST((i - 1) // 64 AS INTEGER) AS frame,
      |    CAST((i - 1) % 64 AS INTEGER) AS tpos,
      |    ascii(substr(text, CAST(i AS BIGINT), 1)) AS v
      |  FROM (SELECT doc_id, text,
      |        unnest(generate_series(1, LEAST(n // 64, 4) * 64)) AS i FROM at)
      |),
      |ax AS (
      |  SELECT doc_id, frame, k,
      |    SUM(v * cos(-2 * pi() * k * tpos / 64)) AS re,
      |    SUM(v * sin(-2 * pi() * k * tpos / 64)) AS im
      |  FROM asx CROSS JOIN (SELECT unnest(generate_series(1, 32)) AS k) ks
      |  GROUP BY doc_id, frame, k
      |),
      |amg AS (SELECT doc_id, frame, k, ROUND(sqrt(re * re + im * im), 4) AS mag FROM ax),
      |apk AS (
      |  SELECT doc_id, frame, k AS peak FROM (
      |    SELECT *, row_number() OVER (PARTITION BY doc_id, frame
      |      ORDER BY mag DESC, k) AS rn
      |    FROM amg
      |  ) WHERE rn = 1
      |),
      |afp AS (
      |  SELECT doc_id, COUNT(*) AS n_frames,
      |    CAST(SUM(CAST(peak AS BIGINT) << (6 * frame)) AS BIGINT) AS fingerprint
      |  FROM apk GROUP BY doc_id
      |),
      |ag AS (SELECT n_frames, fingerprint, MIN(doc_id) AS canon
      |       FROM afp GROUP BY 1, 2),
      |aud AS (
      |  SELECT afp.doc_id, afp.doc_id = ag.canon AS aud_canon
      |  FROM afp JOIN ag USING (n_frames, fingerprint)
      |)
      |SELECT txt.doc_id, txt.txt_canon,
      |  COALESCE(img.img_canon, TRUE) AS img_canon,
      |  COALESCE(aud.aud_canon, TRUE) AS aud_canon,
      |  txt.txt_canon AND COALESCE(img.img_canon, TRUE)
      |    AND COALESCE(aud.aud_canon, TRUE) AS keep,
      |  CASE WHEN NOT txt.txt_canon THEN 'text_dup'
      |       WHEN NOT COALESCE(img.img_canon, TRUE) THEN 'image_dup'
      |       WHEN NOT COALESCE(aud.aud_canon, TRUE) THEN 'audio_dup'
      |       ELSE 'kept' END AS drop_reason
      |FROM txt LEFT JOIN img USING (doc_id) LEFT JOIN aud USING (doc_id)""".stripMargin

  // ---------------------------------------------------------------- q150

  /** q150: golden-record survivorship (`Fuzzy.goldenRecord`) — the merge
    * step that ends an entity-resolution pipeline: q128 links duplicate
    * records, THIS decides what the one merged record says. The dirty set
    * is customer plus two deterministic "re-imports" (a lower-cased
    * re-keyed copy for even keys, a suffixed later version for keys
    * divisible by 3), so clusters have 1–3 members with genuinely
    * conflicting fields. Rules: longest name (ties → binary-smallest),
    * freshest balance (max), last-write segment (by version), smallest
    * non-null contact code. One map-side-combinable groupBy is the whole
    * plan — survivorship cost is one aggregation pass at any scale.
    */
  def q150GoldenRecord(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Tables.load(spark, sfDir, "customer").select(
      col("c_custkey").as("custkey"), lit(1L).as("version"),
      col("c_name").as("name"),
      (QueryDef.dec2(col("c_acctbal")) * 100).cast("long").as("acctbal_cents"),
      col("c_mktsegment").as("segment"),
      concat(lit("N"), col("c_nationkey")).as("contact"))
    val v2 = base.filter(col("custkey") % 2 === 0).select(
      col("custkey"), lit(2L).as("version"),
      lower(col("name")).as("name"),
      (col("acctbal_cents") - 500).as("acctbal_cents"),
      concat(lit("REIMPORT-"), col("segment")).as("segment"),
      lit(null).cast("string").as("contact"))
    val v3 = base.filter(col("custkey") % 3 === 0).select(
      col("custkey"), lit(3L).as("version"),
      concat(col("name"), lit(" JR")).as("name"),
      (col("acctbal_cents") + 250).as("acctbal_cents"),
      lower(col("segment")).as("segment"), lower(col("contact")).as("contact"))
    F.goldenRecord(base.unionByName(v2).unionByName(v3), "custkey", Seq(
      "name" -> F.Survivor.LongestString,
      "acctbal_cents" -> F.Survivor.MaxNumeric,
      "segment" -> F.Survivor.LatestBy("version"),
      "contact" -> F.Survivor.MinString))
      .select(col("custkey"), col("n_records"), col("name"),
        col("acctbal_cents"), col("segment"), col("contact"))
  }

  val q150Sql: String =
    """WITH base AS (
      |  SELECT c_custkey AS custkey, CAST(1 AS BIGINT) AS version,
      |    c_name AS name,
      |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS acctbal_cents,
      |    c_mktsegment AS segment, 'N' || c_nationkey AS contact
      |  FROM customer
      |),
      |dirty AS (
      |  SELECT * FROM base
      |  UNION ALL
      |  SELECT custkey, CAST(2 AS BIGINT), lower(name), acctbal_cents - 500,
      |    'REIMPORT-' || segment, NULL
      |  FROM base WHERE custkey % 2 = 0
      |  UNION ALL
      |  SELECT custkey, CAST(3 AS BIGINT), name || ' JR', acctbal_cents + 250,
      |    lower(segment), lower(contact)
      |  FROM base WHERE custkey % 3 = 0
      |)
      |SELECT custkey, CAST(COUNT(1) AS BIGINT) AS n_records,
      |  (MIN(CASE WHEN name IS NOT NULL
      |     THEN {'k': -length(name), 'v': name} END)).v AS name,
      |  MAX(acctbal_cents) AS acctbal_cents,
      |  arg_max(segment, version) AS segment,
      |  MIN(contact) AS contact
      |FROM dirty GROUP BY custkey""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q128_fuzzy_join", q128FuzzyJoin, Some(q128Sql)),
    QueryDef("q150_golden_record", q150GoldenRecord, Some(q150Sql)),
    QueryDef("q130_image_neardup", q130ImageNearDup, Some(q130Sql)),
    QueryDef("q134_image_clusters", q134ImageClusters, Some(q134Sql)),
    QueryDef("q135_audio_neardup", q135AudioNearDup, Some(q135Sql)),
    QueryDef("q136_multimodal_curation", q136MultimodalCuration, Some(q136Sql)),
    QueryDef("q131_wordpiece", q131WordPiece, Some(q131Sql)),
    QueryDef("q132_tfidf_salience", q132TfidfSalience, Some(q132Sql)),
    QueryDef("q137_wordpiece_train", q137WordPieceTrain, Some(q137Sql)))
}
