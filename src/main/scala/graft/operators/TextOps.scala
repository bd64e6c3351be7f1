package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Large-scale training-data text operators: dedup (exact, MinHash+LSH,
  * SimHash), token analysis, quality scoring, language-ID heuristic, and
  * document fingerprinting. These are first-class engine components (see
  * BASELINE.json north_star) designed for the 100 TB shape:
  *
  *  - everything is expression-level (whole-stage codegen) or a single
  *    hash-partitioned groupBy — no driver-side loops, no UDFs;
  *  - token/shingle hashing is md5-prefix based: deterministic, seedless,
  *    and portable across engines (the DuckDB oracle reproduces it);
  *  - MinHash+LSH turns O(n²) near-dup search into per-bucket self-joins —
  *    the bucket join is the only shuffle, and band hashes distribute
  *    uniformly so AQE skew handling is rarely needed.
  */
object TextOps {

  val HashP = 1000000007L

  def tokens(text: Column): Column = split(text, " ")

  /** BPE-style pre-tokenization (GPT-2-ish): letter runs, digit runs, and
    * punctuation runs, each optionally glued to one leading space. RE2-safe
    * (no lookahead/backrefs), so the SAME pattern string runs in Java regex
    * (Spark) and RE2 (the DuckDB oracle) with identical leftmost-first
    * alternation semantics.
    */
  val BpePattern = " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"

  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit(BpePattern), lit(0))

  /** 60-bit token hash from the md5 hex prefix — portable across engines. */
  def tokenHash(tok: Column): Column =
    conv(substring(md5(tok), 1, 15), 16, 10).cast("long")

  /** Word n-gram shingles as strings ("w1 w2 w3"). */
  def shingles(toks: Column, n: Int = 3): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** Exact dedup: content-hash grouping; `is_canonical` marks the minimum
    * doc_id per hash group (the row a dedup pass would keep).
    */
  def exactDedup(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val groups = docs
      .groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_copies"))
    docs
      .select(col(idCol), md5(col(textCol)).as("content_hash"))
      .join(groups, "content_hash")
      .select(col(idCol), col("content_hash"),
        (col(idCol) === col("canonical_id")).as("is_canonical"), col("n_copies"))
  }

  /** Distinct (doc, shingle-hash) pairs over word-3-gram shingles — the
    * shared prefix of BOTH the MinHash signature computation and the exact
    * Jaccard join; callers running both should compute it once and persist
    * (see queries.Text.sharedShingleHashes).
    *
    * ZERO shuffle: distinctness is per document (doc_id is in every row),
    * so `array_distinct` over the in-row hash array replaces the
    * corpus-wide `.distinct()` exchange the naive spelling pays — dedup
    * happens map-side before the explode, exactly matching the oracle's
    * `SELECT DISTINCT doc_id, h` because it dedups the HASHES, not the
    * shingle strings. The token array is materialized by its own projection
    * first (interpreted HOFs re-evaluate non-cheap lambda references per
    * element — the measured ~30× re-split trap documented on
    * [[qualityFilter]]).
    */
  def shingleHashes(docs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    shingleHashArray(docs, idCol, textCol)
      .select(col(idCol), explode(col("__hs")).as("h"))

  /** MinHash signature columns mh0..mh{k-1} from a [[shingleHashes]] table
    * (one map-side-combinable groupBy). */
  def minhashFromHashes(sh: DataFrame, numHashes: Int = 16,
      idCol: String = "doc_id"): DataFrame = {
    val aggs = (0 until numHashes).map { j =>
      val a = 1000003L + 7919L * j
      val b = 104729L * j + 12345L
      min((lit(a) * col("h") + lit(b)) % HashP).as(s"mh$j")
    }
    sh.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** MinHash signatures per document over distinct word-3-gram shingles.
    * One explode + one groupBy (map-side combinable).
    */
  def minhashSignatures(docs: DataFrame, numHashes: Int = 16,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    minhashFromHashes(shingleHashes(docs, idCol, textCol), numHashes, idCol)

  /** LSH banding: (doc_id, band_id, band_hash) with `rows` signature values
    * hashed per band. Docs sharing any band bucket are near-dup candidates.
    */
  def lshBands(sigs: DataFrame, numHashes: Int = 16, rows: Int = 4,
      idCol: String = "doc_id"): DataFrame = {
    val bands = numHashes / rows
    val bandStructs = (0 until bands).map { b =>
      val cols = (0 until rows).map(r => col(s"mh${b * rows + r}"))
      struct(lit(b).as("band_id"), md5(concat_ws(":", cols: _*)).as("band_hash"))
    }
    sigs.select(col(idCol), explode(array(bandStructs: _*)).as("band"))
      .select(col(idCol), col("band.band_id"), col("band.band_hash"))
  }

  /** Distinct candidate near-dup pairs (a < b) from LSH bucket self-join. */
  def lshCandidatePairs(sigs: DataFrame, numHashes: Int = 16, rows: Int = 4,
      idCol: String = "doc_id"): DataFrame = {
    val bands = lshBands(sigs, numHashes, rows, idCol)
    val l = bands.select(col(idCol).as("doc_a"), col("band_id"), col("band_hash"))
    val r = bands.select(col(idCol).as("doc_b"), col("band_id"), col("band_hash"))
    l.join(r, Seq("band_id", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()
  }

  /** 32-bit SimHash over distinct token hashes. Like [[shingleHashes]],
    * per-doc distinctness runs map-side (`array_distinct` on the in-row
    * hash array) — no corpus-wide distinct exchange. */
  def simhash(docs: DataFrame, bits: Int = 32,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol),
      explode(call_function("shingle_hashes", col(textCol), lit(1), lit(HashP))).as("h"))
    val bitSums = (0 until bits).map { k =>
      sum(when(shiftright(col("h"), k).bitwiseAND(1) === 1, 1L).otherwise(-1L)).as(s"s$k")
    }
    val agg = toks.groupBy(col(idCol)).agg(bitSums.head, bitSums.tail: _*)
    val sim = (0 until bits).map { k =>
      when(col(s"s$k") > 0, lit(1L << k)).otherwise(lit(0L))
    }.reduce(_ + _)
    agg.select(col(idCol), sim.as("simhash"))
  }

  /** Exact n-gram Jaccard for candidate pairs: |A∩B| via an equi-join on
    * distinct shingle hashes — relational, no quadratic blowup beyond the
    * candidate set.
    */
  def jaccardPairs(docs: DataFrame, pairs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    jaccardFromHashes(shingleHashes(docs, idCol, textCol), pairs, idCol)

  /** [[jaccardPairs]] over a precomputed (ideally persisted) shingle-hash
    * table — the shape that shares the explode+distinct with MinHash.
    *
    * Every relation here is corpus-sized (candidate pairs, per-doc shingle
    * hashes, per-doc sizes), so every join carries a `shuffle_hash` hint:
    * at 1M docs AQE's runtime stats can put the pair table under the
    * broadcast threshold and build a multi-hundred-MB broadcast map (it
    * OOMed the 8 GiB scale harness under heap pressure), and at 1B docs
    * ANY broadcast here is catastrophic. Shuffled hash joins partition the
    * build side with the data — the only shape that survives 100 TB.
    */
  def jaccardFromHashes(shingleHash: DataFrame, pairs: DataFrame,
      idCol: String = "doc_id"): DataFrame = {
    val sh = shingleHash.select(col(idCol).as("jid"), col("h"))
    val sizes = sh.groupBy(col("jid")).agg(count(lit(1)).as("n_sh"))
    val common = pairs.hint("shuffle_hash")
      .join(sh.select(col("jid").as("doc_a"), col("h")), "doc_a")
      .join(sh.select(col("jid").as("doc_b"), col("h").as("h2")).hint("shuffle_hash"), "doc_b")
      .filter(col("h") === col("h2"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.select(col("jid").as("doc_a"), col("n_sh").as("n_a")).hint("shuffle_hash"), "doc_a")
      .join(sizes.select(col("jid").as("doc_b"), col("n_sh").as("n_b")).hint("shuffle_hash"), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common"))).as("jaccard"))
  }

  /** Broder shingle CONTAINMENT for candidate pairs — the asymmetric
    * near-dup signal Jaccard misses: a short document quoted wholesale
    * inside a long one has low Jaccard (the union is huge) but
    * containment ≈ 1 relative to the short side. Same join shape and
    * inputs as [[jaccardFromHashes]]; emits both directions plus the raw
    * integer counts (the cross-engine anchors).
    */
  def containmentFromHashes(shingleHash: DataFrame, pairs: DataFrame,
      idCol: String = "doc_id"): DataFrame = {
    val sh = shingleHash.select(col(idCol).as("jid"), col("h"))
    val sizes = sh.groupBy(col("jid")).agg(count(lit(1)).as("n_sh"))
    val common = pairs.hint("shuffle_hash")
      .join(sh.select(col("jid").as("doc_a"), col("h")), "doc_a")
      .join(sh.select(col("jid").as("doc_b"), col("h").as("h2")).hint("shuffle_hash"), "doc_b")
      .filter(col("h") === col("h2"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.select(col("jid").as("doc_a"), col("n_sh").as("n_a")).hint("shuffle_hash"), "doc_a")
      .join(sizes.select(col("jid").as("doc_b"), col("n_sh").as("n_b")).hint("shuffle_hash"), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("n_common"), col("n_a"), col("n_b"),
        round(col("n_common").cast("double") / col("n_a"), 6).as("cont_a"),
        round(col("n_common").cast("double") / col("n_b"), 6).as("cont_b"))
  }

  val StopWords: Seq[String] = Seq("the", "a", "of", "and")

  /** Text statistics + quality signals, all codegen'd expressions. */
  def textStats(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = tokens(col(textCol))
    val nTok = size(toks)
    val nDistinct = size(array_distinct(toks))
    val nStop = size(filter(toks, t => t.isInCollection(StopWords)))
    docs.select(
      col(idCol),
      length(col(textCol)).as("n_chars"),
      nTok.as("n_tokens"),
      nDistinct.as("n_distinct"),
      round(nDistinct.cast("double") / nTok, 6).as("ttr"),
      round(nStop.cast("double") / nTok, 6).as("stop_ratio"),
      round((length(col(textCol)) - (nTok - 1)).cast("double") / nTok, 6).as("mean_tok_len"))
  }

  /** Gopher-style document quality FILTER (Rae et al. 2021 §A1.1, adapted to
    * whitespace-token corpora): per-document signals plus the composed
    * `keep` decision a curation pass would apply before training.
    *
    *  - `n_words`, `mean_word_len`: length/structure bounds;
    *  - `ttr`: type-token ratio (lexical diversity);
    *  - `n_stop_kinds`: distinct stopwords present (Gopher's "2 of the
    *    common English words" rule);
    *  - `top_word_frac`: most-frequent-word mass — boilerplate/repetition;
    *  - `dup_bigram_frac`: duplicate word-bigram fraction — the n-gram
    *    repetition rule.
    *
    * Scale shape: one codegen'd [[graft.sql.GopherSignalsExpression]] call
    * per document computes all five counts in a single O(len) compiled
    * pass (map-side, zero shuffle, no UDFs) — embarrassingly parallel at
    * 100 TB with a linear per-doc constant. The interpreted higher-order
    * spelling ([[qualityFilterFold]], kept as the spec's bit-equality
    * mirror) pays an O(len²) top-word scan through lambda interpretation;
    * at r7 that made this the bench's slowest query (7.9 s, ~3× the next).
    * Ratio/rounding arithmetic stays in Catalyst `round` columns, so the
    * DuckDB-oracle-matched HALF_UP semantics are untouched.
    *
    * The signal struct is materialized by its OWN projection before the
    * ratio columns reference its fields: CollapseProject never inlines a
    * non-cheap expression referenced many times, so the kernel runs once
    * per row (same stage-split reasoning as the fold spelling's `__toks`).
    */
  def qualityFilter(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val prepared = docs.select(col(idCol),
      length(col(textCol)).as("__chars"),
      call_function("gopher_signals", col(textCol)).as("__sig"))
    val sig = col("__sig")
    val n = sig.getField("n_words")
    val meanWordLen =
      round((col("__chars") - (n - 1)).cast("double") / n, 6)
    val ttr = round(sig.getField("n_distinct").cast("double") / n, 6)
    // coalesce only to pin nullable=false, matching the fold spelling's
    // size(filter(lit(...))) schema — the field is never null in practice
    val nStopKinds = coalesce(sig.getField("n_stop_kinds"), lit(0))
    val topWordFrac =
      round(sig.getField("top_word_count").cast("double") / n, 6)
    val dupBigramFrac = when(n < lit(2), lit(0.0)).otherwise(
      round(lit(1.0) - sig.getField("n_distinct_bigrams").cast("double") / (n - 1), 6))
    prepared.select(col(idCol), n.as("n_words"), meanWordLen.as("mean_word_len"),
        ttr.as("ttr"), nStopKinds.as("n_stop_kinds"),
        topWordFrac.as("top_word_frac"), dupBigramFrac.as("dup_bigram_frac"))
      .withColumn("keep", keepRule)
  }

  /** The composed Gopher keep decision over the signal columns. */
  private def keepRule: Column =
    col("n_words").between(30, 100000) &&
      col("mean_word_len").between(3.0, 8.0) &&
      col("ttr") >= 0.35 &&
      col("n_stop_kinds") >= 2 &&
      col("top_word_frac") <= 0.12 &&
      col("dup_bigram_frac") <= 0.05

  /** Reference higher-order spelling of [[qualityFilter]] — TextSpec
    * asserts bit-equality with the native-expression path. Interpreted
    * HOFs with an O(len²) top-word scan; the token arrays are materialized
    * by their own projection first (interpreted lambdas re-evaluate
    * non-cheap references per element — the measured ~30× re-split trap).
    */
  private[graft] def qualityFilterFold(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val prepared = docs.select(col(idCol),
      length(col(textCol)).as("__chars"),
      tokens(col(textCol)).as("__toks"),
      array_distinct(tokens(col(textCol))).as("__dtoks"))
    val toks = col("__toks")
    val dtoks = col("__dtoks")
    val n = size(toks)
    val meanWordLen =
      round((col("__chars") - (n - 1)).cast("double") / n, 6)
    val ttr = round(size(dtoks).cast("double") / n, 6)
    val nStopKinds = size(filter(
      lit(StopWords.toArray), s => array_contains(toks, s)))
    val topWordFrac = round(
      array_max(transform(dtoks,
        w => size(filter(toks, t => t === w)))).cast("double") / n, 6)
    val bigrams = transform(sequence(lit(1), n - 1),
      i => concat(element_at(toks, i), lit(" "), element_at(toks, i + 1)))
    val dupBigramFrac = when(n < lit(2), lit(0.0)).otherwise(
      round(lit(1.0) - size(array_distinct(bigrams)).cast("double") / (n - 1), 6))
    prepared.select(col(idCol), n.as("n_words"), meanWordLen.as("mean_word_len"),
        ttr.as("ttr"), nStopKinds.as("n_stop_kinds"),
        topWordFrac.as("top_word_frac"), dupBigramFrac.as("dup_bigram_frac"))
      .withColumn("keep", keepRule)
  }

  /** Marker-token language/dialect classifier (n-gram-frequency heuristic):
    * score each class by marker hits, argmax with deterministic tie order.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "scanish" -> Seq("scan", "join", "merge"),
    "queryish" -> Seq("query", "filter", "group"),
    "windowish" -> Seq("window", "hash", "sort"),
    "rowish" -> Seq("row", "line", "column"))

  def langId(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = tokens(col(textCol))
    val scored = docs.select(
      (col(idCol) +: LangMarkers.map { case (name, markers) =>
        size(filter(toks, t => t.isInCollection(markers))).as(s"score_$name")
      }): _*)
    // argmax; earlier-listed class wins ties (chain order = priority)
    val names = LangMarkers.map(_._1)
    val pred = names.zipWithIndex.init.foldRight(lit(names.last)) { case ((name, i), rest) =>
      val geAllLater = names.drop(i + 1)
        .map(other => col(s"score_$name") >= col(s"score_$other"))
        .reduce(_ && _)
      when(geAllLater, lit(name)).otherwise(rest)
    }
    scored.select(col(idCol), pred.as("pred_lang"),
      greatest(names.map(n => col(s"score_$n")): _*).as("best_score"))
  }

  /** Polynomial rolling-hash fingerprint over characters — exact integer
    * arithmetic, portable across engines. `textCol` is a column name.
    * Backed by the codegen'd [[graft.sql.PolyHashExpression]]: the fold
    * spelling ([[fingerprintFold]], kept as the spec's bit-equality
    * mirror) interprets a lambda per character per row.
    */
  def fingerprint(textCol: String): Column =
    call_function("poly_hash", col(textCol), lit(HashP))

  /** Reference fold spelling of [[fingerprint]] — TextSpec asserts
    * bit-equality with the native expression. */
  private[graft] def fingerprintFold(textCol: String): Column =
    expr(s"aggregate(sequence(1, length($textCol)), 0L, " +
      s"(acc, i) -> (acc * 31 + ascii(substr($textCol, i, 1))) % $HashP)")

  /** Deterministic stratified (per-stratum-rate) sampling — the domain-mix
    * step of a training-data pipeline ("keep 25% of web, all of code"),
    * expressed so the SAME rows are kept on every engine and every re-run:
    * the sampling coin is the first two hex chars of md5(key), compared
    * lexicographically against a per-stratum threshold (rate quantized to
    * k/256). No RNG, no `sample()` (whose output is partitioning-dependent),
    * zero shuffle — a pure map-side filter that scales embarrassingly.
    *
    * `rates` maps stratum value → target fraction; strata not listed fall
    * back to `defaultRate`. Rates ≥ 1 keep everything.
    */
  def sampleFlag(strata: Column, key: Column,
      rates: Map[String, Double], defaultRate: Double): Column = {
    val bucket = substring(md5(key.cast("string")), 1, 2)
    def thr(rate: Double): Column =
      if (rate >= 1.0) lit(true)
      else bucket < lit(f"${math.max(0, (rate * 256).toInt)}%02x")
    rates.foldRight(thr(defaultRate)) { case ((s, rate), rest) =>
      when(strata === lit(s), thr(rate)).otherwise(rest)
    }
  }

  /** Greedy concat-and-split sequence packing — assign every document a
    * (seq_id, seq_off) position in the virtual token stream formed by
    * concatenating all documents in id order and splitting it into
    * fixed-size training context windows of `seqLen` tokens. This is the
    * GPT-style pretraining packing layout, computed WITHOUT a global
    * single-partition window:
    *
    *  1. range-bucket the id space into `nBuckets` contiguous ranges;
    *  2. per-bucket token totals (one map-side-combinable groupBy over
    *     ≤ nBuckets groups) → collected (≤ nBuckets rows) → exclusive
    *     prefix offsets, joined back as a broadcast;
    *  3. within-bucket running totals via a window partitioned BY BUCKET —
    *     each partition holds one id range, so the sort is local.
    *
    * This is the canonical two-phase distributed prefix scan: a naive
    * `Window.orderBy(id)` with no partition key funnels the corpus through
    * ONE task (Spark warns and then OOMs at scale); here the only global
    * structure is the nBuckets-row offset table. Size `nBuckets` ≥ the
    * cluster's parallelism at the target scale (driver cost stays trivial).
    */
  def packSequences(docs: DataFrame, seqLen: Int, nBuckets: Int = 64,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val base = docs.select(col(idCol), size(tokens(col(textCol))).cast("long").as("n_tok"))
    val bounds = base.agg(min(col(idCol)).cast("long"), max(col(idCol)).cast("long")).head()
    if (bounds.isNullAt(0))
      return base.select(col(idCol), col("n_tok"), lit(0L).as("start_tok"),
        lit(0L).as("seq_id"), lit(0L).as("seq_off"), lit(false).as("spans_boundary"))
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    val span = math.max(1L, (hi - lo) / nBuckets + 1)
    val bucketed = base.withColumn("__bucket",
      expr(s"(CAST(`$idCol` AS BIGINT) - ${lo}L) DIV ${span}L"))
    // BOUND: one total per id bucket — ≤ nBuckets rows by construction
    val totals = bucketed.groupBy(col("__bucket")).agg(sum(col("n_tok")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = totals.scanLeft((-1L, 0L)) { case ((_, acc), (b, t)) => (b, acc + t) }
      .sliding(2).map { case Array((_, acc), (b, _)) => (b, acc) }.toSeq
    val offDf = broadcast(offsets.toDF("__bucket", "__offset"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__bucket")).orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val start = coalesce(sum(col("n_tok")).over(w), lit(0L)) + col("__offset")
    bucketed.join(offDf, "__bucket")
      .withColumn("start_tok", start)
      .withColumn("seq_id", expr(s"start_tok DIV $seqLen"))
      .withColumn("seq_off", col("start_tok") % seqLen)
      .withColumn("spans_boundary",
        expr(s"(start_tok + n_tok - 1) DIV $seqLen") =!= col("seq_id"))
      .select(col(idCol), col("n_tok"), col("start_tok"), col("seq_id"),
        col("seq_off"), col("spans_boundary"))
  }

  /** Eval-set decontamination (the GPT-3 appendix-C / Llama pretraining
    * step, scaled to word 3-grams for this corpus): flag every TRAINING
    * document whose shingle overlap with a held-out EVALUATION split
    * exceeds `minFrac`, so benchmark text never leaks into training data.
    *
    * Scale shape: in a real pass the eval side (benchmark suites) is tiny
    * relative to the 100 TB corpus, so its distinct shingle-hash set is
    * BROADCAST; the corpus side pays one explode + one broadcast hash join
    * + one map-side-combinable groupBy. No corpus-side `.distinct()` and
    * no corpus×corpus shuffle — per-doc shingle dedup runs map-side via
    * `array_distinct` (same trick as [[shingleHashes]]), and `explode_outer`
    * keeps shingle-less docs in the output as trivially clean.
    */
  def decontaminate(docs: DataFrame, isEval: Column, minFrac: Double = 0.1,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    decontaminateAgainst(docs.filter(!isEval),
      evalShingleSet(docs.filter(isEval), textCol), minFrac, idCol, textCol)

  /** Per-doc array of distinct word-3-gram shingle hashes — map-side only,
    * one codegen'd `shingle_hashes` call per row (the HOF spelling below
    * is CodegenFallback and pays interpreted lambdas per shingle). */
  private[graft] def shingleHashArray(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs.select(col(idCol),
      call_function("shingle_hashes", col(textCol), lit(3), lit(HashP)).as("__hs"))

  /** Reference fold spelling of [[shingleHashArray]] — TextSpec asserts
    * bit-equality (values AND order) with the native expression. */
  private[graft] def shingleHashArrayFold(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs.select(col(idCol), tokens(col(textCol)).as("__toks"))
      .select(col(idCol),
        array_distinct(transform(shingles(col("__toks")),
          s => tokenHash(s) % HashP)).as("__hs"))

  /** The distinct shingle-hash set of an evaluation corpus, in the shape
    * [[decontaminateAgainst]] broadcasts. Compute (and persist) ONCE, then
    * score any number of training batches/streams against it. */
  def evalShingleSet(evalDocs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    shingleHashArray(evalDocs, idCol, textCol)
      .select(explode(col("__hs")).as("h")).distinct()
      .withColumn("__hit", lit(1))

  /** Score training docs against a prebuilt [[evalShingleSet]] — one scan
    * of `train` (explode_outer keeps shingle-less docs without a second
    * pass). */
  def decontaminateAgainst(train: DataFrame, evalHashes: DataFrame,
      minFrac: Double = 0.1, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    contaminationTail(minFrac,
      shingleHashArray(train, idCol, textCol)
        .select(col(idCol), explode_outer(col("__hs")).as("h"))
        .join(broadcast(evalHashes), Seq("h"), "left")
        .groupBy(col(idCol))
        .agg(count(col("h")).as("n_shingles"), count(col("__hit")).as("n_overlap")))

  /** [[decontaminateAgainst]] over an ALREADY-COMPUTED exploded
    * (id, shingle-hash) table — the path a session takes when the shingle
    * hashes are shared with MinHash/Jaccard dedup (computing them is the
    * dominant cost; see queries.Text.sharedShingleHashes). Because the
    * exploded table drops shingle-less documents, `trainIds` supplies the
    * full id universe; the recovery join is id-only rows on both sides, so
    * its shuffle stays negligible next to the shingle scan it saves.
    */
  def decontaminateFromHashes(trainIds: DataFrame, trainHashes: DataFrame,
      evalHashes: DataFrame, minFrac: Double = 0.1,
      idCol: String = "doc_id"): DataFrame = {
    val agg = trainHashes
      .join(broadcast(evalHashes), Seq("h"), "left")
      .groupBy(col(idCol))
      .agg(count(col("h")).as("n_shingles"), count(col("__hit")).as("n_overlap"))
    contaminationTail(minFrac,
      trainIds.join(agg, Seq(idCol), "left")
        .select(col(idCol),
          coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
          coalesce(col("n_overlap"), lit(0L)).as("n_overlap")))
  }

  private def contaminationTail(minFrac: Double, counts: DataFrame): DataFrame =
    counts
      .withColumn("overlap_frac",
        when(col("n_shingles") > 0,
          round(col("n_overlap").cast("double") / col("n_shingles"), 6))
          .otherwise(lit(0.0)))
      .withColumn("contaminated", col("overlap_frac") >= lit(minFrac))

  /** 60-bit md5-prefix hash mapped to a uniform double in [0, 1) — the
    * deterministic, engine-portable sampling coin shared by
    * [[mixtureEpochs]] (DuckDB reproduces it bit-for-bit from the same
    * md5 hex prefix). */
  def hashUnit(key: Column): Column =
    tokenHash(key.cast("string")).cast("double") / lit(math.pow(2, 60))

  /** Run-length de-stuttering — collapse IMMEDIATE token repeats ("the
    * the the" → "the"), the cleanup pass ASR transcripts and degenerate
    * model generations need before counting or training. Pure map-side
    * index filter (keep token i iff it differs from token i−1); reports
    * how many tokens vanished. split∘join identity as in
    * [[removeDupSpans]].
    *
    * Output: input columns + text_clean, n_removed.
    */
  def destutter(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("__toks", split(col(textCol), " "))
      // Spark HOF index is 0-based; element_at is 1-based, so
      // element_at(__toks, i) IS the previous token at index i
      .withColumn("__kept",
        filter(col("__toks"), (x, i) => i === 0 || x =!= element_at(col("__toks"), i)))
      .withColumn("text_clean", concat_ws(" ", col("__kept")))
      .withColumn("n_removed",
        (size(col("__toks")) - size(col("__kept"))).cast("long"))
      .drop("__toks", "__kept")

  /** Rendezvous (highest-random-weight) shard assignment (Thaler &
    * Ravishankar 1998) — route every record to the worker with the
    * maximal md5(key ‖ worker): when the worker pool grows from W to W+1,
    * ONLY the keys whose new hash wins move (≈ n/(W+1)), versus `key % W`
    * where nearly everything reshuffles. The shard router for stateful
    * stream workers, embedding-index shards, or cache affinity.
    *
    * ZERO shuffle: the argmax over the W candidate hashes is a per-row
    * array expression (W is bounded — a worker pool, not data). md5 makes
    * it seedless and engine-portable. Output: input columns + `shard`
    * (0-based worker index).
    */
  def rendezvousShard(df: DataFrame, keyCol: String, workers: Int): DataFrame = {
    require(workers >= 1, "need at least one worker")
    val hashes = array((0 until workers).map(w =>
      md5(concat(col(keyCol).cast("string"), lit("_w"), lit(w)))): _*)
    df.withColumn("__h", hashes)
      .withColumn("shard",
        (array_position(col("__h"), array_max(col("__h"))) - 1).cast("long"))
      .drop("__h")
  }

  /** T5-style span corruption (Raffel et al. 2020 §3.1.4) — turn raw text
    * into denoising (input, target) training pairs: fixed-position token
    * spans (the first `spanLen` of every `period` tokens) are replaced by
    * numbered sentinels in the input, and the target spells each sentinel
    * followed by the tokens it hid. Fixed positions (not sampled) keep the
    * pair construction seedless and engine-portable while masking
    * spanLen/period of every document.
    *
    * Pure map-side: one token split, two index-transform passes, zero
    * shuffle — corpus-size-independent like the rest of the augmentation
    * family (q126 dropout). Output: input columns + input, target,
    * n_masked.
    */
  def spanCorruption(docs: DataFrame, textCol: String = "text",
      period: Int = 10, spanLen: Int = 3): DataFrame = {
    require(period >= 2 && spanLen >= 1 && spanLen < period,
      "need 1 <= spanLen < period")
    docs
      .withColumn("__toks", split(col(textCol), " "))
      .withColumn("input", expr(
        s"""array_join(filter(transform(sequence(1, size(__toks)), i ->
           |  CASE WHEN (i - 1) % $period < $spanLen THEN
           |    (CASE WHEN (i - 1) % $period = 0
           |     THEN concat('<extra_id_', CAST((i - 1) DIV $period AS STRING), '>')
           |     ELSE NULL END)
           |  ELSE element_at(__toks, i) END), x -> x IS NOT NULL), ' ')""".stripMargin))
      .withColumn("target", expr(
        s"""array_join(filter(transform(sequence(1, size(__toks)), i ->
           |  CASE WHEN (i - 1) % $period = 0
           |    THEN concat('<extra_id_', CAST((i - 1) DIV $period AS STRING), '> ',
           |                element_at(__toks, i))
           |  WHEN (i - 1) % $period < $spanLen THEN element_at(__toks, i)
           |  ELSE NULL END), x -> x IS NOT NULL), ' ')""".stripMargin))
      .withColumn("n_masked", expr(
        s"size(filter(sequence(1, size(__toks)), i -> (i - 1) % $period < $spanLen))")
        .cast("long"))
      .drop("__toks")
  }

  /** Deterministic class rebalancing — downsample every class to the size
    * of the SMALLEST class (the classifier-training prep that stops a
    * 90/10 label skew from training a majority-class predictor). Rows are
    * picked by md5-hash order of their id (a seedless deterministic
    * shuffle — the [[hashUnit]] coin), so the same corpus always yields
    * the same balanced set, on any engine and any partitioning.
    *
    * One shuffle on the label (the pick-rank window); the per-class counts
    * are a combinable groupBy and the min rides a broadcast 1-row frame. A
    * pathologically hot majority class pays its own sort — for planet-
    * scale skew, pre-prune it with [[sampleFlag]]-style hash thresholds
    * before the exact rank.
    *
    * Output: input columns + pick_rank (1..min-class-size), kept rows only.
    */
  def classBalance(df: DataFrame, labelCol: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sizes = df.groupBy(col(labelCol)).agg(count(lit(1)).as("__n"))
    val minSize = sizes.agg(min(col("__n")).as("__m"))
    val w = Window.partitionBy(col(labelCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("pick_rank", row_number().over(w).cast("long"))
      .crossJoin(broadcast(minSize))
      .where(col("pick_rank") <= col("__m"))
      .drop("__m")
  }

  /** Document-level collocation mining — for every token, its top-k
    * co-occurrence partners by LIFT (P(x,y) / P(x)·P(y) — the PMI family
    * without the log, same ranking since log is monotone, and therefore
    * EXACT in integer micro-units: lift_micro = 1e6·c_xy·N // (c_x·c_y),
    * products on DECIMAL(38,0)). The query-expansion / related-terms table
    * a retrieval pipeline mines from its own corpus.
    *
    * Scale shape: the candidate generator is a per-document self-join of
    * DISTINCT tokens — quadratic only in per-doc distinct vocabulary
    * (bound it upstream with a top-V filter), shuffled once on doc id; the
    * (x, y) pair counts and per-token doc counts are map-side-combinable
    * groupBys bounded by V²/V; `minSupport` prunes the long tail before
    * the joins; top-k per anchor is a rank-≤-k window (WindowGroupLimit —
    * map-side group limit, no global sort).
    *
    * Output: anchor, partner, n_docs_pair, lift_micro, rank (1..k).
    */
  def collocations(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", minSupport: Long = 5, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    require(minSupport >= 1 && k >= 1, "need minSupport >= 1 and k >= 1")
    val toks = docs.select(col(idCol).as("__id"),
      explode(array_distinct(split(col(textCol), " "))).as("tok"))
      .where(col("tok") =!= "")
    val nDocs = docs.agg(count(lit(1)).as("__n"))
    val cx = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val a = toks.select(col("__id"), col("tok").as("x"))
    val b = toks.select(col("__id"), col("tok").as("y"))
    val pairs = a.join(b, Seq("__id")).where(col("x") < col("y"))
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("cxy"))
      .where(col("cxy") >= minSupport)
    val sym = pairs.unionByName(
      pairs.select(col("y").as("x"), col("x").as("y"), col("cxy")))
    val scored = sym
      .join(cx.select(col("tok").as("x"), col("c").as("cx")), "x")
      .join(cx.select(col("tok").as("y"), col("c").as("cy")), "y")
      .crossJoin(broadcast(nDocs))
      .select(col("x").as("anchor"), col("y").as("partner"),
        col("cxy").as("n_docs_pair"),
        expr("""CAST((CAST(1000000 AS DECIMAL(38,0)) * cxy * __n)
                DIV (CAST(cx AS DECIMAL(38,0)) * cy) AS BIGINT)""")
          .as("lift_micro"))
    val w = Window.partitionBy(col("anchor"))
      .orderBy(col("lift_micro").desc, col("n_docs_pair").desc, col("partner"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
  }

  /** Largest-remainder (Hamilton) quota allocation — turn per-stratum
    * sizes into INTEGER sample quotas that sum to `budget` EXACTLY: each
    * stratum gets ⌊budget·size/total⌋, and the leftover seats go one each
    * to the largest fractional remainders (ties → smaller key, so the
    * allocation is a total order). The step between a mixture spec and an
    * actual sampler: "give me exactly 10⁹ training tokens split
    * proportionally across domains" with no float drift and no ±1 slack.
    *
    * `counts` is the per-stratum size table (keyCol, cntCol) — ALREADY
    * aggregated, so its cardinality is the stratum count: the remainder
    * rank runs as a single-partition window over |strata| rows (bounded
    * by design — domains/languages/sources, not documents). Products
    * `budget·cnt` ride DECIMAL(38,0), so a 10¹² budget times 10¹⁵ tokens
    * cannot overflow. Output: key, cnt, base_quota, extra (0/1), quota;
    * Σ quota = budget exactly.
    */
  def largestRemainderQuota(counts: DataFrame, keyCol: String,
      cntCol: String, budget: Long): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val tot = counts.agg(sum(col(cntCol)).as("__tot"))
    val based = counts.crossJoin(broadcast(tot))
      .withColumn("__bp",
        (lit(budget).cast(DecimalType(38, 0)) * col(cntCol)))
      .withColumn("base_quota", expr("CAST(__bp DIV __tot AS BIGINT)"))
      .withColumn("__rem", expr("CAST(__bp % __tot AS BIGINT)"))
    // leftover seats: budget − Σ base (window over |strata| rows only)
    val wAll = Window.partitionBy(lit(1))
    val wRank = Window.partitionBy(lit(1))
      .orderBy(col("__rem").desc, col(keyCol))
    based
      .withColumn("__left", lit(budget) - sum(col("base_quota")).over(wAll))
      .withColumn("__rk", row_number().over(wRank))
      .withColumn("extra", when(col("__rk") <= col("__left"), 1L).otherwise(0L))
      .withColumn("quota", col("base_quota") + col("extra"))
      .select(col(keyCol), col(cntCol), col("base_quota"), col("extra"),
        col("quota"))
  }

  /** Domain-mixture epoch weighting — the UPsampling counterpart of
    * [[sampleFlag]]: reshape the corpus to target mixture `weights`
    * (stratum → fraction of the final token budget) by giving each
    * document a deterministic repeat count ("fractional epochs", the
    * Pile / Llama data-mixture recipe). A stratum at rate 1.4 repeats
    * every doc once and a deterministic 40% of docs twice; a stratum at
    * rate 0.46 keeps 46% of docs once.
    *
    * One tiny groupBy (≤ #strata groups, map-side combinable), a
    * broadcast of the per-stratum rate table, then pure map-side
    * arithmetic — the corpus is never shuffled.
    */
  def mixtureEpochs(docs: DataFrame, strata: Column,
      weights: Map[String, Double], defaultWeight: Double = 0.0,
      idCol: String = "doc_id"): DataFrame = {
    val counts = docs.groupBy(strata.as("__s")).agg(count(lit(1)).as("__n"))
    val total = counts.agg(sum(col("__n")).as("__total"))
    val weightCol = weights.foldRight(lit(defaultWeight)) {
      case ((s, w), rest) => when(col("__s") === lit(s), lit(w)).otherwise(rest)
    }
    val rates = counts.crossJoin(broadcast(total))
      .select(col("__s"),
        (weightCol * col("__total") / col("__n")).as("__rate"))
    val u = hashUnit(col(idCol))
    docs.select(col(idCol), strata.as("__s"))
      .join(broadcast(rates), "__s")
      .select(col(idCol), col("__s").as("stratum"),
        round(col("__rate"), 6).as("rate"),
        (floor(col("__rate")) +
          when(u < col("__rate") - floor(col("__rate")), 1L).otherwise(0L))
          .cast("long").as("n_copies"))
  }

  /** Duplicated-SPAN detection — the practical form of exact substring
    * dedup (Lee et al. 2021, "Deduplicating Training Data Makes Language
    * Models Better"): flag every span of `n` consecutive tokens that also
    * occurs in ANOTHER document, and the fraction of each document made of
    * such spans (RefinedWeb drops dup-heavy docs). Distinct span hashes
    * per doc come from one codegen'd `shingle_hashes` call; a span is
    * cross-doc duplicated iff its hash groups >1 row (per-doc distinctness
    * makes count ≡ distinct-doc count). Costs: the span-table groupBy and
    * the 1:1 flag join back — both hash-partitioned on the span hash, the
    * honest corpus-sized cost of exact span dedup (hot spans skew-split by
    * AQE; no row fan-out, the flag side is one row per hash).
    */
  def dupSpans(docs: DataFrame, n: Int = 10, minFrac: Double = 0.5,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val sp = docs.select(col(idCol),
      explode_outer(call_function("shingle_hashes", col(textCol), lit(n), lit(HashP)))
        .as("h"))
    val dup = sp.groupBy(col("h")).agg(count(lit(1)).as("__nd"))
      .filter(col("__nd") > 1).select(col("h"), lit(1).as("__dup"))
    sp.join(dup, Seq("h"), "left")
      .groupBy(col(idCol))
      .agg(count(col("h")).as("n_spans"), count(col("__dup")).as("n_dup_spans"))
      .withColumn("dup_span_frac",
        when(col("n_spans") > 0,
          round(col("n_dup_spans").cast("double") / col("n_spans"), 6))
          .otherwise(lit(0.0)))
      .withColumn("dup_heavy", col("dup_span_frac") >= lit(minFrac))
  }

  /** PII patterns for the scrub pass — RE2-safe (no lookarounds or
    * backrefs), so the SAME strings run in Java regex (Spark) and RE2
    * (the DuckDB oracle) with identical semantics, like [[BpePattern]].
    * Coverage is the standard curation set (emails, NANP-ish phone
    * shapes, dotted-quad IPs) — deliberately simple, deterministic
    * shapes: a production scrub would extend the table, not the
    * machinery.
    */
  val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+", "<EMAIL>"),
    ("phone", "(?:\\+?[0-9]{1,2}[-. ])?\\(?[0-9]{3}\\)?[-. ][0-9]{3}[-. ][0-9]{4}", "<PHONE>"),
    ("ipv4", "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}", "<IP>"))

  /** PII SCRUB — mask every match of [[PiiPatterns]] (applied in table
    * order, so a pattern never matches inside an earlier placeholder) and
    * count per-category hits. Pure map-side `regexp_replace`/
    * `regexp_count` chains: zero shuffles, codegen'd, linear in text.
    */
  def piiScrub(docs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val counted = PiiPatterns.foldLeft(docs.select(col(idCol), col(textCol))) {
      case (df, (name, pat, _)) =>
        df.withColumn(s"n_$name", regexp_count(col(textCol), lit(pat)).cast("long"))
    }
    val scrubbed = PiiPatterns.foldLeft(col(textCol)) {
      case (c, (_, pat, repl)) => regexp_replace(c, pat, repl)
    }
    counted.withColumn("scrubbed_text", scrubbed)
      .select(col(idCol) +: PiiPatterns.map(p => col(s"n_${p._1}")) :+
        col("scrubbed_text"): _*)
  }

  /** Cross-corpus duplicate-span REMOVAL — the rewrite counterpart of
    * [[dupSpans]] (Lee et al. 2022 "Deduplicating Training Data Makes
    * Language Models Better", word-shingle approximation of the
    * suffix-array exact-substring pass): every token covered by an n-token
    * shingle whose hash occurs more than once in the corpus is excised, the
    * survivors are rejoined on single spaces (split∘join is the identity on
    * the raw text, so untouched docs pass through byte-identical).
    *
    * Scale shape: the corpus-level work is ONE shingle-hash groupBy (the
    * same cost the flagging pass pays); the rewrite itself never shuffles
    * tokens — duplicated span STARTS come back as one bounded sorted array
    * per doc (doc-level equi-join), and the clean text is rebuilt map-side
    * by slicing the token array between covered intervals. Because every
    * interval has fixed length n and the starts are sorted, the kept gaps
    * are exactly the pairwise (sᵢ+n, sᵢ₊₁) windows — an O(n_tok + |starts|)
    * reconstruction with no quadratic HOF anywhere.
    *
    * Hash width matters here in a way it does not for [[dupSpans]]: the
    * flagging pass needs ≥ minFrac of a doc's spans to collide before
    * anything changes, but removal acts on EVERY colliding shingle, so the
    * ~1e9 [[HashP]] modulus would birthday-collide at ~20M corpus shingles
    * (measured: ⅓ of 1M unique docs falsely edited — caught by the
    * ScaleBench gate). Removal therefore uses the full 60-bit md5 prefix
    * (`Long.MaxValue` leaves it unmodded): ~2e-4 expected collision PAIRS
    * at 20M shingles, ~4e3 at the 100 TB scale of 1e11 shingles (a 4e-8
    * false-removal rate). Past that, add a string-equality confirm join on
    * the colliding groups — the same confirm pattern as [[jaccardFromHashes]].
    */
  def removeDupSpans(docs: DataFrame, n: Int = 10,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val sp = positionalShingleHashes(docs, n, idCol, textCol)
    val dup = sp.groupBy(col("h")).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > 1).select(col("h"))
    exciseSpans(docs, sp, dup, n, idCol, textCol)
  }

  /** (id, spos, h) rows: the position-keyed sibling of [[shingleHashes]],
    * hashed with the FULL 60-bit md5 prefix (see [[removeDupSpans]] for why
    * the [[HashP]] modulus is too narrow for span-level edits). */
  private[graft] def positionalShingleHashes(docs: DataFrame, n: Int,
      idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
      posexplode(call_function("shingle_hashes", col(textCol), lit(n), lit(Long.MaxValue)))
        .as(Seq("spos", "h")))

  /** Shared rewrite tail of [[removeDupSpans]] and its streaming twin:
    * given the docs, their positional shingle hashes and the duplicated
    * hash set, excise covered tokens map-side (fixed-length interval gaps
    * over the bounded sorted start array — see [[removeDupSpans]]). */
  private[graft] def exciseSpans(docs: DataFrame, sp: DataFrame, dup: DataFrame,
      n: Int, idCol: String, textCol: String): DataFrame = {
    val starts = sp.join(dup, Seq("h"))
      .groupBy(col(idCol))
      .agg(sort_array(collect_set(col("spos"))).as("__starts"))
    val keptExpr =
      s"""CASE WHEN size(__starts) = 0 THEN __toks ELSE
         |  flatten(concat(
         |    array(slice(__toks, 1, element_at(__starts, 1))),
         |    CASE WHEN size(__starts) >= 2 THEN
         |      transform(sequence(0, size(__starts) - 2),
         |        i -> slice(__toks, element_at(__starts, i + 1) + $n + 1,
         |          greatest(0, element_at(__starts, i + 2) - element_at(__starts, i + 1) - $n)))
         |    ELSE array() END,
         |    array(slice(__toks, element_at(__starts, -1) + $n + 1,
         |      greatest(0, size(__toks) - element_at(__starts, -1) - $n)))))
         |END""".stripMargin
    docs.join(starts, Seq(idCol), "left")
      .withColumn("__starts",
        coalesce(col("__starts"), array().cast("array<int>")))
      .withColumn("__toks", tokens(col(textCol)))
      .withColumn("__kept", expr(keptExpr))
      .select(col(idCol),
        size(col("__toks")).cast("long").as("n_tok"),
        (size(col("__toks")) - size(col("__kept"))).cast("long").as("n_removed"),
        array_join(col("__kept"), " ").as("clean_text"))
  }

  /** LENGTH-BUCKETED batching — the padding-efficiency step: assign every
    * document a global rank in (token count, id) order and split the
    * ranking into `nBuckets` near-equal buckets, so batches draw
    * similar-length docs and pad minimally. The global rank is the same
    * two-phase scan as [[epochShuffle]], keyed on the token count itself:
    * per-length totals (one map-side-combinable groupBy; group count is
    * bounded by the max document length, not the corpus) become broadcast
    * offsets, ranks are per-length local windows, and the bucket is pure
    * integer arithmetic `rank·nBuckets div n` — never a single-partition
    * NTILE.
    */
  def lengthBuckets(docs: DataFrame, nBuckets: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val base = docs.select(col(idCol), size(tokens(col(textCol))).cast("long").as("n_tok"))
    // BOUND: one row per distinct document token-count — ≤ max doc length values
    val counts = base.groupBy(col("n_tok")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    if (counts.isEmpty)
      return base.select(col(idCol), col("n_tok"), lit(0L).as("rank"),
        lit(0L).as("bucket")).limit(0)
    val n = counts.map(_._2).sum
    val offsets = counts.scanLeft((-1L, 0L)) { case ((_, acc), (t, c)) => (t, acc + c) }
      .sliding(2).map { case Array((_, acc), (t, _)) => (t, acc) }.toSeq
    val offDf = broadcast(offsets.toDF("n_tok", "__off"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("n_tok")).orderBy(col(idCol))
    base.join(offDf, "n_tok")
      .withColumn("rank", row_number().over(w).cast("long") - 1L + col("__off"))
      .select(col(idCol), col("n_tok"), col("rank"),
        expr(s"(rank * $nBuckets) DIV ${n}L").as("bucket"))
  }

  /** GREEDY BUDGET SELECTION — keep the highest-scoring rows until a hard
    * integer cost budget is spent: exactly the prefix of the global
    * (score desc, id asc) order whose INCLUSIVE running cost stays within
    * `budget` (the curation step after scoring — "train on the best N
    * tokens", the data-constrained-scaling recipe).
    *
    * Scale shape — no corpus-sized single-partition window: scores
    * (required in [0, 1]; rescale upstream otherwise) are quantized to
    * `buckets` integer levels, which is monotone in score, so bucket desc
    * + in-bucket (score desc, id asc) IS the global order; only the
    * ≤ buckets+1-row bucket-total table crosses a SinglePartition window
    * (the sortedNeighborhood/vocabCoverage two-phase contract), and the
    * running sums are ordinary per-bucket windows — raise `buckets` to
    * shrink per-task spans at larger corpora. Null scores are excluded
    * (they have no place in the order). Output: id, score, cost (long),
    * cum_cost (inclusive, exact), keep.
    */
  def budgetSelect(rows: DataFrame, scoreCol: String, costCol: String,
      budget: Long, idCol: String = "doc_id", buckets: Int = 256): DataFrame = {
    require(budget >= 0, s"budget must be non-negative, got $budget")
    require(buckets >= 1, s"buckets must be positive, got $buckets")
    val base = rows
      .select(col(idCol), col(scoreCol), col(costCol).cast("long").as("__cost"))
      .where(col(scoreCol).isNotNull)
      .withColumn("__bkt", floor(col(scoreCol) * buckets).cast("int"))
    val wOff = org.apache.spark.sql.expressions.Window
      .orderBy(col("__bkt").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = base.groupBy(col("__bkt"))
      .agg(sum(col("__cost")).as("__bc"))
      .withColumn("__off", coalesce(sum(col("__bc")).over(wOff), lit(0L)))
      .drop("__bc")
    val wLoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__bkt"))
      .orderBy(col(scoreCol).desc, col(idCol).asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    base.join(broadcast(offsets), Seq("__bkt"))
      .withColumn("cum_cost", col("__off") + sum(col("__cost")).over(wLoc))
      .select(col(idCol), col(scoreCol), col("__cost").as(costCol),
        col("cum_cost"), (col("cum_cost") <= budget).as("keep"))
  }

  /** Deterministic WEIGHTED sampling without replacement (Efraimidis &
    * Spirakis A-ES priority sampling): each row draws the reproducible
    * md5 coin u = [[hashUnit]](id) and keeps the k largest priorities
    * u^(1/w) — inclusion probability proportional to weight, identical on
    * every engine and re-run. The plan is a TakeOrderedAndProject (per-
    * partition top-k, then a k-row merge on one reducer) — no global sort,
    * no shuffle of the corpus; the driver never sees more than k rows.
    */
  def weightedSample(docs: DataFrame, weight: Column, k: Int,
      idCol: String = "doc_id"): DataFrame =
    docs
      .select(col(idCol), weight.cast("double").as("weight"),
        pow(hashUnit(col(idCol)), lit(1.0) / weight.cast("double")).as("priority"))
      .orderBy(col("priority").desc, col(idCol))
      .limit(k)

  /** Deterministic EPOCH SHUFFLE — the training-order step: a fresh,
    * reproducible global permutation of the corpus per epoch, computed as
    * the rank of md5(epoch:id). Same epoch ⇒ same order on every engine
    * and every re-run; successive epochs ⇒ independent orders.
    *
    * Global rank is the packSequences two-phase scan, not a
    * single-partition `Window.orderBy`: the first md5 hex byte
    * range-buckets rows into 256 uniform groups, per-bucket counts
    * (one ≤256-group map-side-combinable aggregate) become broadcast
    * offsets, and ranks are local windows per bucket. Bucket order equals
    * key order because the bucket IS the key's first byte.
    */
  def epochShuffle(docs: DataFrame, epoch: Int,
      idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val keyed = docs.select(col(idCol),
        md5(concat_ws(":", lit(epoch), col(idCol))).as("__k"))
      .withColumn("__b", conv(substring(col("__k"), 1, 2), 16, 10).cast("int"))
    // BOUND: 256 md5-prefix buckets
    val counts = keyed.groupBy(col("__b")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    if (counts.isEmpty)
      return keyed.select(col(idCol), lit(0L).as("shuffle_pos")).limit(0)
    val offsets = counts.scanLeft((-1, 0L)) { case ((_, acc), (b, n)) => (b, acc + n) }
      .sliding(2).map { case Array((_, acc), (b, _)) => (b, acc) }.toSeq
    val offDf = broadcast(offsets.toDF("__b", "__off"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__b")).orderBy(col("__k"), col(idCol))
    keyed.join(offDf, "__b")
      .select(col(idCol),
        (row_number().over(w).cast("long") - 1L + col("__off")).as("shuffle_pos"))
  }

  /** DSIR-style importance scoring (Xie et al. 2023, "Data Selection via
    * Importance Resampling"): score every document by the mean
    * log-likelihood ratio of its hashed unigram features under the TARGET
    * distribution (docs where `isTarget`) vs the RAW corpus distribution,
    * with add-`alpha` smoothing over `buckets` hash features. Documents
    * with positive scores look like the target domain; a curation pass
    * resamples by these weights.
    *
    * Scale shape: both n-gram frequency tables are bounded at `buckets`
    * rows regardless of corpus size (one conditional-aggregate groupBy,
    * map-side combinable), so the per-token feature-weight join is a
    * BROADCAST; per-doc scoring is one groupBy whose partial aggregation
    * collapses each doc map-side. Two corpus scans (one to build the
    * feature table, one to score) and exactly three shuffles total, none
    * proportional to corpus size beyond the doc-count rows themselves.
    */
  def dsirScores(docs: DataFrame, isTarget: Column, buckets: Int = 8192,
      alpha: Double = 0.5, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    dsirScoreAgainst(docs,
      dsirWeights(docs, isTarget, buckets, alpha, textCol), buckets,
      idCol, textCol)

  /** The per-feature log-likelihood-ratio table (bucket → weight) of a
    * reference corpus — `buckets` rows regardless of corpus size. Compute
    * (and persist) once, then score any number of batches/streams with
    * [[dsirScoreAgainst]]. */
  def dsirWeights(corpus: DataFrame, isTarget: Column, buckets: Int = 8192,
      alpha: Double = 0.5, textCol: String = "text"): DataFrame = {
    val spark = corpus.sparkSession
    val tok = graft.core.Plans.ensureMinPartitions(corpus,
        corpus.sparkSession.sparkContext.defaultParallelism)
      .select(isTarget.as("__t"), explode(tokens(col(textCol))).as("__tok"))
      .select(col("__t"), (tokenHash(col("__tok")) % buckets).as("b"))
    // persisted: feat (≤ `buckets` rows) is read by the totals broadcast
    // AND the dense left join — without the pin each build re-tokenizes
    // the whole corpus
    val feat = graft.core.CacheLife.scoped(
      tok.groupBy(col("b"))
        .agg(count(lit(1)).as("cr"), count(when(col("__t"), lit(1))).as("ct"))
        .persist())
    val tots = feat.agg(sum(col("cr")).as("nr"), sum(col("ct")).as("nt"))
    // DENSE over all bucket ids (the table is bounded at `buckets` rows by
    // construction): buckets unseen in the reference corpus carry the
    // smoothed count-0 weight instead of vanishing, so scoring a NEW batch
    // (the streaming twin's whole point) never drops tokens — an inner
    // join against a sparse table silently excluded new-domain tokens
    // from both n_toks and the score.
    spark.range(buckets).select(col("id").as("b"))
      .join(feat, Seq("b"), "left")
      .crossJoin(broadcast(tots))
      .select(col("b"),
        (log((coalesce(col("ct"), lit(0L)) + alpha) / (col("nt") + alpha * buckets)) -
          log((coalesce(col("cr"), lit(0L)) + alpha) / (col("nr") + alpha * buckets))).as("w"))
  }

  /** Score documents against a prebuilt [[dsirWeights]] table: one token
    * explode, one broadcast join, one per-doc groupBy whose partial
    * aggregation collapses map-side. */
  def dsirScoreAgainst(docs: DataFrame, weights: DataFrame, buckets: Int = 8192,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    graft.core.Plans.ensureMinPartitions(docs,
        docs.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol), explode(tokens(col(textCol))).as("__tok"))
      .select(col(idCol), (tokenHash(col("__tok")) % buckets).as("b"))
      .join(broadcast(weights), "b")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_toks"), sum(col("w")).as("__s"))
      .select(col(idCol), col("n_toks"),
        round(col("__s") / col("n_toks"), 6).as("dsir_score"))
      .withColumn("is_target_like", col("dsir_score") > lit(0.0))

  /** Overlapping token-window chunking — the RAG/embedding-index unit
    * splitter: chunk k covers tokens `[k·step, k·step + size)` with
    * `step = size − overlap`, and the chunk count is
    * `max(1, ⌈(n − overlap)/step⌉)` so a short tail merges into the last
    * full window instead of emitting a contained fragment. Pure column
    * math (sequence + slice), map-side, zero shuffles; output is one row
    * per chunk keyed (id, chunk_id) for downstream embedding/indexing.
    */
  def chunk(docs: DataFrame, size: Int, overlap: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(size > overlap && overlap >= 0, s"chunk: need size > overlap >= 0")
    val step = size - overlap
    val toks = col("__toks")
    val n = size_(toks)
    val m = greatest(lit(1), ceil((n - lit(overlap)).cast("double") / step).cast("int"))
    docs.select(col(idCol), tokens(col(textCol)).as("__toks"))
      .select(col(idCol), toks,
        explode(sequence(lit(0), m - 1)).as("chunk_id"))
      .select(col(idCol), col("chunk_id"),
        slice(toks, col("chunk_id") * step + 1, lit(size)).as("__c"))
      .select(col(idCol), col("chunk_id"),
        size_(col("__c")).as("n_tokens"),
        concat_ws(" ", col("__c")).as("chunk_text"))
  }

  private def size_(c: Column): Column = org.apache.spark.sql.functions.size(c)

  /** Deterministic token-dropout augmentation (the word-dropout /
    * SSL-noising regularizer): token at position i of doc d survives iff
    * the seedless md5 coin of (id, epoch, i) clears `rate` — so each
    * epoch yields a DIFFERENT corruption of the same doc, reproducibly on
    * any cluster layout, and the oracle can replay every coin. Pure
    * column math, map-side, zero shuffles.
    */
  def tokenDropout(docs: DataFrame, rate: Double, epoch: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = tokens(col(textCol))
    val kept = filter(
      zip_with(toks, sequence(lit(1), size_(toks)), (t, i) => struct(t.as("t"),
        hashUnit(concat_ws("#", col(idCol), lit(epoch), i)).as("u"))),
      p => p.getField("u") >= rate)
    // per-token md5 coins with no shuffle below — spread a single-split
    // input across cores (no-op when splits suffice)
    graft.core.Plans.ensureMinPartitions(docs,
        docs.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol),
      size_(toks).as("n_tokens"),
      size_(kept).as("n_kept"),
      concat_ws(" ", transform(kept, p => p.getField("t"))).as("augmented_text"))
  }

  /** C4-style page cleaning (Raffel et al. 2020 §2.2, the other canonical
    * curation recipe beside Gopher's [[qualityFilter]]): line-level rules
    * — keep only lines that end in terminal punctuation (`.` `!` `?` `"`),
    * carry at least `minLineWords` words, and contain none of
    * `lineBlockWords` (C4 drops "javascript" lines) — then page-level
    * rules: at least `minSentences` sentences survive, no `blockPhrases`
    * occurrence (C4 drops "lorem ipsum" pages), no curly brace (C4's
    * code-page heuristic). Emits flags + the cleaned text rather than
    * filtering, so downstream funnels can count reasons.
    *
    * Scale shape: pure column expressions, map-side, zero shuffles — a
    * 100 TB pass is embarrassingly parallel and pipeline-fused with the
    * scan.
    */
  def c4Clean(docs: DataFrame,
      blockPhrases: Seq[String] = Seq("lorem ipsum"),
      lineBlockWords: Seq[String] = Seq("javascript"),
      minLineWords: Int = 5, minSentences: Int = 3,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val terminal = Seq(".", "!", "?", "\"")
    val keptLines = filter(transform(split(col(textCol), "\n"), l => trim(l)), l =>
      (length(l) > 0) &&
        substring(l, -1, 1).isInCollection(terminal) &&
        (size(split(l, " ")) >= minLineWords) &&
        !lineBlockWords.map(w => array_contains(split(l, " "), w))
          .foldLeft(lit(false))(_ || _))
    val cleaned = array_join(keptLines, "\n")
    val nSentences = (length(cleaned) -
      length(regexp_replace(cleaned, "[.!?]", ""))).cast("int")
    val pageBlocked = blockPhrases.map(p => instr(col(textCol), p) > 0)
      .foldLeft(contains(col(textCol), lit("{")))(_ || _)
    docs.select(col(idCol), col(textCol))
      .withColumn("cleaned_text", cleaned)
      .withColumn("n_lines_kept", size(keptLines))
      .withColumn("n_sentences", nSentences)
      .withColumn("page_blocked", pageBlocked)
      .withColumn("keep", nSentences >= minSentences && !pageBlocked)
      .drop(textCol)
  }

  /** EXACT set-similarity self-join via prefix filtering (the
    * AllPairs/PPJoin family — Bayardo et al. 2007, Xiao et al. 2008):
    * every pair with Jaccard ≥ thrNum/thrDen is returned, with NO recall
    * loss — the exact complement to the probabilistic MinHash-LSH path
    * (q35/q36), for when "probably all near-dup pairs" isn't good enough
    * (legal dedup, eval decontamination audits).
    *
    * Canonical order = ascending document frequency (hash tie-break).
    * With each doc's shingle set sorted that way, a qualifying pair's
    * SMALLEST common token provably sits inside both docs' first
    * `m - ceil(t·m) + 1` tokens (else the preceding non-shared tokens
    * alone push the intersection below t·m ≤ t·|A∪B|) — so joining only
    * prefix tokens finds every qualifying pair, and rare-token prefixes
    * keep candidate groups small precisely because the order puts common
    * tokens last. Exact Jaccard over full sets then removes false
    * candidates. All-integer throughout: the threshold test is the cross
    * multiplication `thrDen·|∩| ≥ thrNum·|∪|`.
    *
    * On top of the prefix filter, both PPJoin candidate filters (Xiao
    * et al. 2008 §3) prune at match time, before the dedup/verify
    * shuffles, with zero recall loss:
    *
    *  - LENGTH: Jaccard ≥ t forces `t·max(|A|,|B|) ≤ min(|A|,|B|)` (the
    *    smaller set alone caps the intersection, the larger alone floors
    *    the union), i.e. `thrDen·min ≥ thrNum·max` in integers.
    *  - POSITIONAL: a shared prefix token at 1-based positions (i, j) in
    *    the SAME canonical order bounds the overlap by
    *    `1 + min(|A|−i, |B|−j)` (every other common token lies after it
    *    in both lists). Jaccard ≥ t needs overlap
    *    `α = ⌈t·(|A|+|B|)/(1+t)⌉` (from |∩| ≥ t·(|A|+|B|−|∩|)), so a
    *    token match with bound < α cannot witness a qualifying pair.
    *    Recall holds because for a qualifying pair the SMALLEST common
    *    token is in both prefixes and its bound ≥ the true overlap ≥ α.
    *
    * Scale shape: df count + rank join + per-doc sort are one shuffle
    * each on corpus-sized rows; the candidate join shuffles only prefix
    * tokens (≈ (1-t)·corpus tokens) and the PPJoin filters cut the
    * matched rows before the `distinct` shuffle; verification is
    * candidate-bounded, and carrying (|A|, |B|) through the candidate
    * row makes the final union arithmetic join-free. Every corpus-sized
    * join side carries `shuffle_hash` as in [[jaccardFromHashes]].
    */
  def prefixFilterJoin(docs: DataFrame, thrNum: Int = 4, thrDen: Int = 5,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    prefixFilterFromHashes(shingleHashes(docs, idCol, textCol), thrNum, thrDen, idCol)

  /** [[prefixFilterJoin]] over a precomputed (doc, shingle-hash) table. */
  def prefixFilterFromHashes(sh: DataFrame, thrNum: Int, thrDen: Int,
      idCol: String = "doc_id"): DataFrame = {
    val cand = prefixCandidates(sh, thrNum, thrDen, idCol)
    val sh2 = sh.select(col(idCol).as("pid"), col("h"))
    cand.hint("shuffle_hash")
      .join(sh2.select(col("pid").as("doc_a"), col("h")), "doc_a")
      .join(sh2.select(col("pid").as("doc_b"), col("h").as("h2")).hint("shuffle_hash"), "doc_b")
      .filter(col("h") === col("h2"))
      .groupBy(col("doc_a"), col("doc_b"), col("__na"), col("__nb"))
      .agg(count(lit(1)).as("n_inter"))
      .select(col("doc_a"), col("doc_b"), col("n_inter").cast("long").as("n_inter"),
        (col("__na") + col("__nb") - col("n_inter")).cast("long").as("n_union"))
      .filter(col("n_inter") * thrDen >= col("n_union") * thrNum)
  }

  /** Candidate pairs of [[prefixFilterFromHashes]] — (doc_a, doc_b, __na,
    * __nb) with a < b, distinct. Package-private with filter toggles so
    * TextSpec/ScaleBench can MEASURE the PPJoin filters' candidate-count
    * reduction; production callers always run both (zero recall loss —
    * see [[prefixFilterJoin]]'s proof sketch). */
  private[graft] def prefixCandidates(sh: DataFrame, thrNum: Int, thrDen: Int,
      idCol: String = "doc_id", lengthFilter: Boolean = true,
      positionalFilter: Boolean = true): DataFrame = {
    require(thrNum > 0 && thrDen > 0 && thrNum <= thrDen,
      s"threshold $thrNum/$thrDen must lie in (0, 1]")
    val sh2 = sh.select(col(idCol).as("pid"), col("h"))
    val dfreq = sh2.groupBy(col("h")).agg(count(lit(1)).as("__df"))
    val lists = sh2.join(dfreq.hint("shuffle_hash"), "h")
      .groupBy(col("pid")).agg(
        array_sort(collect_list(struct(col("__df"), col("h")))).as("__ks"),
        count(lit(1)).cast("int").as("__m"))
    // prefix length p = m - ceil(t·m) + 1 (integer ceil via (m·num+den-1) DIV den)
    val pfx = lists.select(col("pid"), col("__m"),
      posexplode(slice(col("__ks"), lit(1),
        col("__m") - expr(s"(__m * $thrNum + $thrDen - 1) DIV $thrDen").cast("int")
          + lit(1))))
      .select(col("pid"), col("__m"), (col("pos") + 1).as("__p"), col("col.h").as("h"))
    val matched = pfx.select(col("pid").as("doc_a"), col("__m").as("__na"),
        col("__p").as("__pa"), col("h")).hint("shuffle_hash")
      .join(pfx.select(col("pid").as("doc_b"), col("__m").as("__nb"),
        col("__p").as("__pb"), col("h")).hint("shuffle_hash"), "h")
      .filter(col("doc_a") < col("doc_b"))
    // PPJoin length filter: thrDen·min(na,nb) ≥ thrNum·max(na,nb)
    val lenFiltered = if (lengthFilter)
      matched.filter(least(col("__na"), col("__nb")) * thrDen >=
        greatest(col("__na"), col("__nb")) * thrNum)
    else matched
    // PPJoin positional filter: overlap upper bound from this token's
    // positions must reach α; integer form (1+min)·(num+den) ≥ num·(na+nb)
    val posFiltered = if (positionalFilter)
      lenFiltered.filter(
        (lit(1) + least(col("__na") - col("__pa"), col("__nb") - col("__pb"))) *
          (thrNum + thrDen) >= (col("__na") + col("__nb")) * thrNum)
    else lenFiltered
    // sizes are functionally dependent on the ids, so carrying them
    // through distinct is free and saves two size-rejoin shuffles later
    posFiltered.select(col("doc_a"), col("doc_b"), col("__na"), col("__nb"))
      .distinct()
  }

  /** Turn-threaded chat assembly — the SFT-formatting pass that turns an
    * interaction log into rendered training conversations: per
    * conversation key, order events into turns, alternate user/assistant
    * roles, cap at `maxTurns`, and render one template string per
    * conversation (ChatML-style role sentinels).
    *
    * Scale shape: the turn cap is a rank<=k window — Spark plans
    * WindowGroupLimit, so over-long conversations drop their tail
    * map-side BEFORE the shuffle carries content anywhere; then ONE
    * groupBy-key shuffle assembles surviving turns (content bytes move
    * exactly once). No driver materialization, no per-conversation state
    * beyond the sort.
    *
    * Ordering must be made total by (`tsCol`, `tieCol`) or turn roles are
    * nondeterministic — the same requirement every replayable event
    * pipeline carries.
    */
  def chatAssemble(events: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, contentCol: Column, maxTurns: Int,
      systemPrompt: String = "You are a helpful assistant."): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val turns = events
      .withColumn("turn_no", row_number().over(w))
      .where(col("turn_no") <= maxTurns)
      .withColumn("turn_txt", concat(
        when(col("turn_no") % 2 === 1, lit("<|user|>\n"))
          .otherwise(lit("<|assistant|>\n")),
        contentCol, lit("<|end|>")))
    turns.groupBy(col(keyCol)).agg(
      count(lit(1)).cast("int").as("n_turns"),
      concat(lit(s"<|system|>\n$systemPrompt<|end|>\n"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("turn_no"), col("turn_txt")))),
            s => s.getField("turn_txt")),
          "\n")).as("rendered"))
      .withColumn("n_chars", length(col("rendered")).cast("int"))
  }

  /** Cross-document line deduplication — the corpus-global half of C4/CCNet
    * cleaning that [[c4Clean]] (page-local) deliberately leaves out: C4
    * discards all but one of any span occurring more than once in the
    * corpus (Raffel et al. 2020 §2.2) and CCNet dedups paragraphs by hash
    * across shards (Wenzek et al. 2020 §3.1). Unit here is the line;
    * first occurrence in corpus order (`idCol`, line position) wins,
    * every later copy — in the same doc or any other — is dropped, and
    * docs are reassembled with surviving lines in original order.
    *
    * Scale shape: one `posexplode` pass (map-side, pipeline-fused with the
    * scan), ONE shuffle on the 128-bit line hash for the first-occurrence
    * window (partitions are per-distinct-line — millions of tiny groups,
    * which sort-based WindowExec streams), one shuffle back on `idCol` to
    * reassemble. Line text never shuffles twice: the window carries
    * (hash, doc, pos, line) once, and the rejoin with the original table is
    * id-only (column-pruned scan). No driver materialization.
    */
  def corpusLineDedup(docs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lines = docs
      .select(col(idCol), posexplode(split(col(textCol), "\n")))
      .toDF(idCol, "pos", "line")
      .withColumn("lnorm", trim(col("line")))
      .where(length(col("lnorm")) > 0)
      .withColumn("h", md5(col("lnorm")))
    val w = Window.partitionBy(col("h")).orderBy(col(idCol), col("pos"))
    val flagged = lines.withColumn("rn", row_number().over(w))
    val agg = flagged.groupBy(col(idCol)).agg(
      count(lit(1)).cast("int").as("n_lines"),
      sum(when(col("rn") === 1, 1).otherwise(0)).cast("int").as("n_kept"),
      // collect_list skips the nulls `when` leaves for dropped lines;
      // array_sort on (pos, line) structs restores document order
      array_join(
        transform(
          array_sort(collect_list(when(col("rn") === 1, struct(col("pos"), col("line"))))),
          s => s.getField("line")),
        "\n").as("deduped_text"))
    docs.select(col(idCol))
      .join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_lines"), lit(0)).as("n_lines"),
        coalesce(col("n_kept"), lit(0)).as("n_kept"),
        coalesce(col("deduped_text"), lit("")).as("deduped_text"))
  }

  /** Exact vocabulary-coverage curve — the tokenizer-design question "how
    * many vocabulary entries cover X% of corpus tokens?" answered with
    * integer arithmetic and NO vocabulary-sized single-reducer pass.
    *
    * The naive rank-the-vocab window funnels every distinct token through
    * one task (billions at web scale). Instead tokens aggregate to a
    * FREQUENCY HISTOGRAM (count → how many tokens have it, Zipf-small:
    * thousands of distinct counts however large the vocabulary), the
    * cumulative window runs over THAT, and each requested percentage
    * resolves inside its straddling bucket in closed form: within a
    * bucket every token contributes `cnt`, so
    * `rank = tokens_before + ceil((needed − mass_before) / cnt)`.
    * Ties are rank-agnostic by construction (any token order within a
    * bucket gives the same rank), which is what makes the answer exact
    * AND layout-independent. Output per pct: vocab_rank, covered_tokens,
    * total_tokens.
    */
  def vocabCoverage(docs: DataFrame, pcts: Seq[Int],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      s"pcts must lie in [1, 100], got $pcts")
    import org.apache.spark.sql.expressions.Window
    val spark = docs.sparkSession
    import spark.implicits._
    val counts = docs
      .select(explode(split(col(textCol), " ")).as("tok"))
      .where(length(col("tok")) > 0)
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    val hist = counts.groupBy(col("cnt"))
      .agg(count(lit(1)).as("n_toks"))
      .select(col("cnt"), col("n_toks"), (col("n_toks") * col("cnt")).as("mass"))
    // Two-phase cumulative over count DESC — the same distributed-ranking
    // discipline as sortedNeighborhood: the histogram is usually
    // Zipf-small, but its distinct-count cardinality is data-dependent,
    // so no single-partition window over it. Counts bucket by binary
    // magnitude (length of the base-2 string — integer-exact, no float
    // log2 edge at powers of two), per-bucket exclusive cumsums run in
    // parallel windows, and only the ≤64-row bucket-total table crosses a
    // SinglePartition exchange.
    val bucketed = hist.withColumn("b", length(conv(col("cnt"), 10, 2)))
    val wOff = Window.orderBy(col("b").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy(col("b"))
      .agg(sum(col("n_toks")).as("bt"), sum(col("mass")).as("bm"))
      .withColumn("off_t", coalesce(sum(col("bt")).over(wOff), lit(0L)))
      .withColumn("off_m", coalesce(sum(col("bm")).over(wOff), lit(0L)))
      .select(col("b"), col("off_t"), col("off_m"))
    val wLoc = Window.partitionBy(col("b")).orderBy(col("cnt").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = bucketed.join(broadcast(offsets), "b")
      .withColumn("toks_before",
        col("off_t") + coalesce(sum(col("n_toks")).over(wLoc), lit(0L)))
      .withColumn("mass_before",
        col("off_m") + coalesce(sum(col("mass")).over(wLoc), lit(0L)))
    val total = counts.agg(sum(col("cnt")).as("total_tokens"))
    val pctDf = broadcast(pcts.toDF("pct"))
    cum.crossJoin(broadcast(total)).join(pctDf,
        // the straddling bucket: coverage crosses `needed` inside it
        expr("mass_before * 100 < total_tokens * pct") &&
          expr("(mass_before + mass) * 100 >= total_tokens * pct"))
      .select(col("pct"),
        // needed = ceil(total·pct/100); rank = toks_before + ceil(gap/cnt)
        expr("toks_before + ((total_tokens * pct + 99) DIV 100 - mass_before + cnt - 1) DIV cnt")
          .as("vocab_rank"),
        expr("mass_before + (((total_tokens * pct + 99) DIV 100 - mass_before + cnt - 1) DIV cnt) * cnt")
          .as("covered_tokens"),
        col("total_tokens"))
  }

  /** Length-bucketed batch-shape report — the padding-waste audit a
    * training pipeline runs before fixing its batching buckets: sequences
    * (here: whitespace token counts, clipped at `cap`) land in
    * power-of-two length buckets, and each bucket reports how many pad
    * tokens batching at its top would burn, in exact integer micro-units.
    * One map-side-combinable groupBy over ≤ log2(cap)+1 buckets — no
    * other shuffle, no floats.
    *
    * Complement of [[lengthBuckets]], not a variant: that operator
    * ASSIGNS docs to near-equal-count rank buckets for batch drawing;
    * this one AUDITS the cost of a fixed power-of-two padding scheme
    * (the decision input for choosing bucket tops in the first place).
    */
  def paddingWaste(docs: DataFrame, cap: Int = 512,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(cap >= 1 && (cap & (cap - 1)) == 0, s"cap must be a power of 2, got $cap")
    // CASE ladder over the fixed power-of-two tops: integer-exact and
    // engine-portable (a log2-based bucket flips at exact powers under
    // float rounding)
    val tops = Iterator.iterate(1)(_ * 2).takeWhile(_ <= cap).toSeq
    val ladder = tops.dropRight(1).map(t => s"WHEN __len <= $t THEN $t")
      .mkString("CASE ", " ", s" ELSE $cap END")
    docs
      .select(least(size(split(col(textCol), " ")), lit(cap)).as("__len"))
      .withColumn("bucket_top", expr(ladder))
      .groupBy(col("bucket_top"))
      .agg(count(lit(1)).as("n_seqs"), sum(col("__len")).as("sum_len"))
      .select(col("bucket_top"), col("n_seqs"), col("sum_len"),
        (col("n_seqs") * col("bucket_top") - col("sum_len")).as("pad_tokens"),
        expr("CAST((CAST(n_seqs * bucket_top - sum_len AS DECIMAL(38,0)) * 1000000) " +
          "DIV (n_seqs * bucket_top) AS BIGINT)").as("waste_micro"))
  }
}
