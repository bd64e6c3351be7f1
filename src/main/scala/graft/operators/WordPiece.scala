package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WordPiece-style greedy subword tokenizer (Wu et al. 2016; the
  * longest-match-first "max munch" encode BERT's tokenizer popularized) —
  * the third tokenizer family beside merge-replay BPE ([[Bpe]]) and
  * Viterbi unigram-LM ([[Unigram]]). Continuation pieces carry the
  * standard `##` prefix.
  *
  * The vocabulary here is DERIVED, not trained: every corpus character
  * (so encoding never fails), prefixes (length 2..4) of the top-K words
  * as word-initial pieces, and suffixes (length 2..3) of the top-K words
  * as continuation pieces. That keeps the whole derivation relational —
  * the oracle replays it in SQL — while exercising the real greedy
  * machinery: max-munch ties between a 4-prefix and shorter pieces,
  * char-fallback for out-of-top-K words, initial-vs-continuation piece
  * sets.
  *
  * Scale shape: the word-frequency table (corpus-bounded, like [[Bpe]])
  * is the only corpus-wide aggregation; the vocabulary is a few hundred
  * strings collected to the driver and broadcast; the encode itself is a
  * per-row kernel over DISTINCT words, never the corpus.
  */
object WordPiece {

  final case class Vocab(init: Set[String], cont: Set[String], maxLen: Int)
      extends Serializable

  /** Distinct corpus words with frequencies (split on single spaces,
    * empty tokens dropped — the [[TextOps.tokens]] convention). */
  def wordFreq(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Derive the vocabulary from the word table. Driver-side collect is
    * bounded by construction: ≤ topWords·(maxPrefix+maxSuffix) pieces
    * plus the distinct-character set of the corpus. */
  def deriveVocab(words: DataFrame, topWords: Int = 20, maxPrefix: Int = 4,
      maxSuffix: Int = 3): Vocab = {
    val top = words.orderBy(col("freq").desc, col("word").asc)
      .limit(topWords).select("word").collect().map(_.getString(0))
    val chars = words.select(explode(split(col("word"), "")).as("c"))
      .filter(col("c") =!= "").distinct().collect().map(_.getString(0)).toSet
    val prefixes = top.flatMap(w => (2 to maxPrefix).filter(_ <= w.length)
      .map(l => w.substring(0, l))).toSet
    val suffixes = top.flatMap(w => (2 to maxSuffix).filter(_ < w.length)
      .map(l => w.substring(w.length - l))).toSet
    val init = chars ++ prefixes
    val cont = chars ++ suffixes
    Vocab(init, cont, (init.iterator ++ cont.iterator).map(_.length).max)
  }

  /** Greedy longest-match-first encode of one word. Ties are impossible
    * (equal-length equal-string pieces are the same piece), so this is
    * deterministic and equals the oracle's window-ranked best-match walk.
    * Characters all being in-vocab guarantees termination and coverage. */
  def encodeWord(word: String, v: Vocab): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var p = 0
    while (p < word.length) {
      val set = if (p == 0) v.init else v.cont
      var l = math.min(v.maxLen, word.length - p)
      var found: String = null
      while (l >= 1 && found == null) {
        val cand = word.substring(p, p + l)
        if (set.contains(cand)) found = cand
        l -= 1
      }
      require(found != null, s"wordpiece: unencodable at $p in '$word'")
      out += (if (p == 0) found else "##" + found)
      p += found.length
    }
    out.toSeq
  }

  /** Corpus-level encode report: one row per DISTINCT word —
    * `(word, freq, n_pieces, encoded)` with pieces space-joined. */
  def encodeWords(spark: SparkSession, words: DataFrame, v: Vocab): DataFrame = {
    import spark.implicits._
    val bv = spark.sparkContext.broadcast(v)
    words.select(col("word"), col("freq")).as[(String, Long)]
      .map { case (w, f) =>
        val pieces = encodeWord(w, bv.value)
        (w, f, pieces.length, pieces.mkString(" "))
      }
      .toDF("word", "freq", "n_pieces", "encoded")
  }
}
