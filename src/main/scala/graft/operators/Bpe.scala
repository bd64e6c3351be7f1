package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer TRAINING and encoding (Sennrich 2016,
  * "Neural Machine Translation of Rare Words with Subword Units" §3.2):
  * learn the top-k byte-pair merges from a corpus, then segment text with
  * them — the learn-a-vocab step of a pretraining data pipeline, as opposed
  * to the fixed regex pre-tokenization of [[TextOps]]' q52.
  *
  * Scale story (the reason BPE training is feasible at 100 TB): training
  * never iterates over the corpus — it iterates over the WORD-FREQUENCY
  * table (one corpus pass to build; vocabulary-sized thereafter, millions
  * of rows against billions of documents). Each merge round is one
  * pair-count aggregation over that bounded table plus a 1-row argmax to
  * the driver (count DESC, then lexicographic — deterministic on every
  * engine), then a map-side fold applying the merge. Encoding broadcasts
  * the k-row merge list and rewrites documents map-side.
  *
  * Merge application is the standard left-to-right non-overlapping fold:
  * `[a a a]` under merge (a,a) becomes `[aa a]`, and a token produced by a
  * merge participates in FURTHER pairs only in later rounds — exactly the
  * semantics the per-round fold gives for free.
  */
object Bpe {

  /** End-of-word marker (Sennrich's `</w>`): distinguishes "er" in
    * "higher</w>" from "er</w>" as a word suffix. */
  val Marker = "</w>"

  final case class Merge(rank: Int, a: String, b: String)

  /** The bounded training table: one row per DISTINCT word with its corpus
    * frequency and initial symbol sequence (characters + [[Marker]]).
    * Empty words (double spaces) are dropped.
    */
  def wordTable(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .withColumn("syms", concat(
        expr("transform(sequence(1, length(w)), i -> substr(w, i, 1))"),
        array(lit(Marker))))

  /** One merge round's pair application as a Catalyst fold: rebuild the
    * symbol array left-to-right, fusing every adjacent (a, b). */
  private[graft] def applyMerge(syms: Column, a: String, b: String): Column = {
    val (qa, qb) = (lit(a), lit(b))
    when(size(syms) < 2, syms).otherwise(
      aggregate(slice(syms, lit(2), greatest(lit(0), size(syms) - 1)),
        slice(syms, lit(1), lit(1)),
        (acc, x) => when(element_at(acc, -1) === qa && x === qb,
            concat(slice(acc, lit(1), size(acc) - 1), array(concat(qa, qb))))
          .otherwise(concat(acc, array(x)))))
  }

  /** Train `k` merges over the word table. Each round: count adjacent
    * symbol pairs weighted by word frequency (one shuffle over the
    * vocabulary-sized table), pick the (count DESC, a ASC, b ASC) argmax,
    * fuse it map-side. Stops early if no pair remains.
    */
  def train(words: DataFrame, k: Int): Seq[Merge] = {
    var cur = words.select(col("freq"), col("syms"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var r = 0
    var done = false
    while (r < k && !done) {
      val top = cur
        .select(col("freq"), explode(when(size(col("syms")) < 2,
            expr("array()").cast("array<struct<a:string,b:string>>"))
          .otherwise(expr(
            "transform(sequence(1, size(syms) - 1), " +
              "i -> struct(element_at(syms, i) AS a, element_at(syms, i + 1) AS b))")))
          .as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(desc("cnt"), asc("a"), asc("b"))
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (a, b) = (top(0).getAs[String]("a"), top(0).getAs[String]("b"))
        merges += Merge(r, a, b)
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

  /** Scalar mirror of char-split + k-round merge application — the encode
    * kernel ([[applyMerge]]'s per-row twin, asserted bit-identical in
    * BpeSpec). */
  private[graft] def encodeWord(w: String, merges: Seq[Merge]): Seq[String] = {
    var syms = (w.map(_.toString) :+ Marker).toIndexedSeq
    merges.foreach { m =>
      if (syms.length >= 2) {
        val out = scala.collection.mutable.ArrayBuffer(syms.head)
        syms.tail.foreach { x =>
          if (out.last == m.a && x == m.b) out(out.length - 1) = m.a + m.b
          else out += x
        }
        syms = out.toIndexedSeq
      }
    }
    syms
  }

  /** Segment every document with a trained merge list: the k-row list is
    * broadcast inside the closure, the rewrite is a per-partition kernel
    * (documents never shuffle). Output: (id, n_bpe, preview of the first
    * `previewTokens` tokens).
    */
  def encode(docs: DataFrame, merges: Seq[Merge], previewTokens: Int = 8,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(merges.sortBy(_.rank))
    docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions { it =>
        val ms = bc.value
        it.map { case (id, text) =>
          val toks = Option(text).getOrElse("").split(" ", -1).iterator
            .filter(_.nonEmpty).flatMap(w => encodeWord(w, ms)).toSeq
          (id, toks.length.toLong, toks.take(previewTokens).mkString(" "))
        }
      }.toDF(idCol, "n_bpe", "preview")
  }
}
