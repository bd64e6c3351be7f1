package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SentencePiece-style unigram-LM tokenizer (Kudo 2018), distributed:
  * the OTHER production subword tokenizer beside [[Bpe]] — where BPE
  * greedily merges, unigram keeps a piece vocabulary with probabilities
  * and segments each word by Viterbi max-likelihood.
  *
  * Scale shape: everything runs on the WORD-FREQUENCY table (bounded by
  * distinct words, not corpus size — the same reduction [[Bpe]] uses), so
  * a 100 TB corpus costs one tokenize+count pass; EM then iterates over
  * the bounded word table with the piece model BROADCAST (vocabs are
  * ≤ ~100k pieces; Viterbi is a per-word kernel, counts are map-side
  * combinable longs, so every iteration is one bounded shuffle).
  *
  * Determinism: seed selection orders by (freq, piece); Viterbi breaks
  * score ties toward the LONGER first piece then lexicographic piece —
  * integer word frequencies and a fixed scan order make training
  * reproducible on any cluster layout.
  */
object Unigram {

  /** Distinct words with corpus frequencies (the bounded table everything
    * else runs on). */
  def wordFreqs(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Seed vocabulary: every substring of length ≤ `maxPieceLen` of every
    * word, weighted by word frequency; the top `vocabSize` by
    * (weight desc, piece asc) UNIONED with all single characters (so
    * segmentation can never fail). Pure relational — explode + groupBy +
    * top-k — and exactly oracle-expressible.
    */
  def seedVocab(docs: DataFrame, vocabSize: Int, maxPieceLen: Int = 6,
      textCol: String = "text"): DataFrame = {
    val wf = wordFreqs(docs, textCol)
    val subs = wf
      .select(col("word"), col("freq"), expr(
        s"""explode(flatten(transform(sequence(1, length(word)),
           |  i -> transform(sequence(i, least(length(word), i + ${maxPieceLen - 1})),
           |    j -> substring(word, i, j - i + 1)))))""".stripMargin).as("piece"))
      .groupBy("piece").agg(sum(col("freq")).as("weight"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("weight").desc, col("piece").asc)
    // single chars are mandatory; multi-char pieces compete for the rest
    val chars = subs.filter(length(col("piece")) === 1)
    val multi = subs.filter(length(col("piece")) > 1)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= vocabSize)
      .drop("rk")
    chars.unionByName(multi)
  }

  private final case class Piece(s: String, var count: Long)

  /** Viterbi segmentation of one word under piece log-probs; ties prefer
    * the longer piece at each boundary (deterministic). Returns piece
    * list, or None only if some character is out of vocabulary. */
  private def viterbi(word: String, logp: collection.Map[String, Double],
      maxLen: Int): Option[List[String]] = {
    val n = word.length
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val from = new Array[Int](n + 1)
    best(0) = 0.0
    var i = 1
    while (i <= n) {
      var l = math.min(i, maxLen)
      while (l >= 1) { // longer pieces first → ties keep the longer piece
        val p = word.substring(i - l, i)
        logp.get(p).foreach { lp =>
          val cand = best(i - l) + lp
          if (cand > best(i)) { best(i) = cand; from(i) = l }
        }
        l -= 1
      }
      i += 1
    }
    if (best(n).isNegInfinity) None
    else {
      var at = n
      var acc = List.empty[String]
      while (at > 0) { acc = word.substring(at - from(at), at) :: acc; at -= from(at) }
      Some(acc)
    }
  }

  /** EM-train piece probabilities over the seed, then prune to the final
    * vocabulary: `iters` rounds of (broadcast model → Viterbi per word →
    * freq-weighted piece counts → re-normalized log-probs), dropping
    * zero-count multi-char pieces each round; finally keep the top
    * `vocabSize` multi-char pieces by (count, piece) plus all single
    * chars. Returns (piece, count, logp).
    *
    * This is hard-EM (Viterbi counts, the common practical variant) —
    * integer counts keep every round bit-deterministic.
    */
  def train(docs: DataFrame, vocabSize: Int, iters: Int = 3,
      maxPieceLen: Int = 6, textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val wf = wordFreqs(docs, textCol)
      .as[(String, Long)].persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // seed weights act as the round-0 counts
    var model: DataFrame = seedVocab(docs, vocabSize, maxPieceLen, textCol)
      .select(col("piece"), col("weight").as("count"))
    for (_ <- 1 to iters) {
      // BOUND: the piece model — ≤ seed-vocab rows (vocabSize-scale), never corpus-sized
      val rows = model.select(col("piece"), col("count")).collect()
      val total = rows.map(_.getLong(1)).sum.toDouble
      val logp = rows.map(r => r.getString(0) ->
        math.log(math.max(r.getLong(1), 1L) / total)).toMap
      val bc = spark.sparkContext.broadcast(logp)
      val counts = wf.flatMap { case (word, freq) =>
          viterbi(word, bc.value, maxPieceLen).toList.flatten
            .map(p => (p, freq))
        }
        .groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _)
        .toDF("piece", "count")
      // chars survive at count ≥ 0 (never dropped); multi-char pieces must earn counts
      model = model.select(col("piece")).join(counts, Seq("piece"), "left")
        .select(col("piece"), coalesce(col("count"), lit(0L)).as("count"))
        .filter(length(col("piece")) === 1 || col("count") > 0)
    }
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("count").desc, col("piece").asc)
    val kept = model.filter(length(col("piece")) > 1)
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= vocabSize).drop("rk")
      .unionByName(model.filter(length(col("piece")) === 1))
    val total = kept.agg(sum(greatest(col("count"), lit(1L)))).head().getLong(0).toDouble
    wf.unpersist()
    kept.select(col("piece"), col("count"),
      log(greatest(col("count"), lit(1L)) / total).as("logp"))
  }

  /** Segment documents with a trained model: per doc, Viterbi each word,
    * emit `(idCol, n_words, n_pieces, preview)` — the tokenizer's
    * application pass (broadcast vocab, map-side kernel). */
  def encode(docs: DataFrame, model: DataFrame, maxPieceLen: Int = 6,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // BOUND: the trained piece model — ≤ vocabSize-scale rows
    val logp = model.select(col("piece"), col("logp")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val bc = spark.sparkContext.broadcast(logp)
    docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .map { case (id, text) =>
        val words = text.split(" ").filter(_.nonEmpty)
        val pieces = words.toSeq.flatMap(w =>
          viterbi(w, bc.value, maxPieceLen).getOrElse(w.map(_.toString).toList))
        (id, words.length, pieces.length, pieces.take(8).mkString(" "))
      }
      .toDF(idCol, "n_words", "n_pieces", "preview")
  }
}
