package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  // ---------------- likelihood-driven vocabulary TRAINING ----------------

  /** One trained merge: at `rank`, pieces `a` and `b` fused into `merged`
    * because they maximized the WordPiece likelihood score
    * freq(ab) / (freq(a)·freq(b)) (Wu 2016 §3: pick the pair whose merge
    * most increases corpus likelihood under a unigram piece LM — the
    * count ratio is that gain up to a constant). The score's factors ride
    * along so reports stay integer-exact. */
  final case class Merge(rank: Int, a: String, b: String, merged: String,
      cnt: Long, fa: Long, fb: Long)

  /** The bounded training table with WordPiece symbolization: one row per
    * DISTINCT word — corpus frequency and symbol sequence, first
    * character bare and every continuation `##`-prefixed. */
  def symTable(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .withColumn("syms", expr(
        "transform(sequence(1, length(w)), i -> " +
          "CASE WHEN i = 1 THEN substr(w, 1, 1) ELSE '##' || substr(w, i, 1) END)"))

  /** Fuse every adjacent (a, b) left-to-right, non-overlapping — the
    * [[Bpe.applyMerge]] fold with the WordPiece fusion rule: the merged
    * piece keeps a's continuation status and strips b's `##`. */
  private[graft] def applyMerge(syms: Column, a: String, b: String): Column = {
    val (qa, qb) = (lit(a), lit(b))
    val fused = lit(a + b.stripPrefix("##"))
    when(size(syms) < 2, syms).otherwise(
      aggregate(slice(syms, lit(2), greatest(lit(0), size(syms) - 1)),
        slice(syms, lit(1), lit(1)),
        (acc, x) => when(element_at(acc, -1) === qa && x === qb,
            concat(slice(acc, lit(1), size(acc) - 1), array(fused)))
          .otherwise(concat(acc, array(x)))))
  }

  /** Train `k` merges over the [[symTable]] output — the real
    * likelihood-driven vocabulary build (vs [[deriveVocab]]'s frequency
    * heuristic). Each round, over the vocabulary-sized table only (the
    * [[Bpe.train]] scale shape — the corpus is never re-scanned):
    *   - pair counts: adjacent (a, b) weighted by word frequency;
    *   - symbol counts: every current symbol weighted the same way;
    *   - argmax of cnt/(fa·fb), evaluated as the IEEE double
    *     `(CAST(cnt AS DOUBLE) / fa) / fb` — correctly-rounded and
    *     identical on every engine computing the same expression, so the
    *     relational oracle reproduces the argmax bit-for-bit — with
    *     (score DESC, a ASC, b ASC) tie-breaking;
    *   - the merge folded into every word map-side.
    * Stops early when no adjacent pair remains.
    */
  def train(words: DataFrame, k: Int): Seq[Merge] = {
    var cur = words.select(col("freq"), col("syms"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var r = 0
    var done = false
    while (r < k && !done) {
      val pairs = cur
        .select(col("freq"), explode(when(size(col("syms")) < 2,
            expr("array()").cast("array<struct<a:string,b:string>>"))
          .otherwise(expr(
            "transform(sequence(1, size(syms) - 1), " +
              "i -> struct(element_at(syms, i) AS a, element_at(syms, i + 1) AS b))")))
          .as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("cnt"))
      val symFreq = cur.select(col("freq"), explode(col("syms")).as("s"))
        .groupBy(col("s")).agg(sum(col("freq")).as("f"))
      val top = pairs
        .join(symFreq.select(col("s").as("a"), col("f").as("fa")), "a")
        .join(symFreq.select(col("s").as("b"), col("f").as("fb")), "b")
        .orderBy((col("cnt").cast("double") / col("fa") / col("fb")).desc,
          asc("a"), asc("b"))
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val row = top(0)
        val (a, b) = (row.getAs[String]("a"), row.getAs[String]("b"))
        merges += Merge(r, a, b, a + b.stripPrefix("##"),
          row.getAs[Long]("cnt"), row.getAs[Long]("fa"), row.getAs[Long]("fb"))
        val next = cur.withColumn("syms", applyMerge(col("syms"), a, b))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        next.count()
        cur.unpersist()
        cur = next
        r += 1
      }
    }
    cur.unpersist()
    merges.toSeq
  }

  /** Greedy-encode vocabulary from a trained merge list: every corpus
    * character (so encoding never fails) plus each merge product as an
    * initial or continuation piece by its `##` status. `words` is the
    * [[symTable]] output (column `w`). */
  def trainedVocab(words: DataFrame, merges: Seq[Merge]): Vocab = {
    // BOUND: distinct corpus characters — alphabet-sized (≲ a few hundred rows)
    val chars = words.select(explode(split(col("w"), "")).as("c"))
      .filter(col("c") =!= "").distinct().collect().map(_.getString(0)).toSet
    val init = chars ++ merges.map(_.merged).filterNot(_.startsWith("##"))
    val cont = chars ++ merges.map(_.merged).filter(_.startsWith("##"))
      .map(_.stripPrefix("##"))
    Vocab(init, cont, (init.iterator ++ cont.iterator).map(_.length).max)
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
