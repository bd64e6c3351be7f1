package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Positional inverted index + phrase search — the retrieval primitive
  * behind exact-phrase dedup/search over a corpus (BM25 ranks bags of
  * words; phrases need positions).
  *
  * Scale shape: postings are (term, doc_id, pos) rows — built map-side by
  * posexplode, stored/bucketed by term in production. A k-word phrase
  * resolves as k selective term filters (each a pushdown-friendly scan of
  * one posting list) chained by k−1 equi-joins on (doc_id, aligned start
  * pos) — co-partitioned after the first shuffle, no position arrays ever
  * collected per document.
  */
object Index {

  /** Positional postings from a (idCol, textCol) corpus. Tokens are the
    * plain space split WITHOUT empty-token filtering: positions must index
    * the raw split or phrase adjacency breaks on double spaces. */
  def positionalPostings(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(col(idCol),
        posexplode(split(col(textCol), " ")).as(Seq("pos", "term")))
      .select(col("term"), col(idCol), col("pos"))

  /** Docs containing the exact word sequence `words`, with occurrence
    * counts. Each join key is (doc, candidate start position): occurrence
    * i of word j aligns to start pos − j. */
  def phraseSearch(postings: DataFrame, words: Seq[String],
      idCol: String = "doc_id"): DataFrame = {
    require(words.nonEmpty)
    var acc = postings.filter(col("term") === words.head)
      .select(col(idCol), col("pos"))
    words.tail.zipWithIndex.foreach { case (w, i) =>
      val p = postings.filter(col("term") === w)
        .select(col(idCol), (col("pos") - (i + 1)).as("pos"))
      acc = acc.join(p, Seq(idCol, "pos"))
    }
    acc.groupBy(col(idCol)).agg(count(lit(1)).as("n_occurrences"))
  }
}
