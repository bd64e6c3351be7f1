package graft

import org.apache.spark.sql.functions._
import graft.operators.Unigram

/** Unigram-LM tokenizer gates: seed coverage, EM convergence onto the
  * obviously-right pieces, Viterbi tie/fallback rules, determinism, and
  * measured compression on real documents.
  */
class UnigramSpec extends SparkSpec {

  test("seed vocab carries every char and ranks frequent substrings first") {
    import spark.implicits._
    val docs = Seq((1L, "banana banana band")).toDF("doc_id", "text")
    val seed = Unigram.seedVocab(docs, vocabSize = 5)
    val pieces = seed.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    Seq("b", "a", "n", "d").foreach(c => assert(pieces.contains(c), s"char $c"))
    // "an" occurs 2× in each banana + 1× in band = 5 total weight
    assert(pieces("an") == 5L)
    assert(pieces.keys.count(_.length > 1) == 5, "exactly vocabSize multi-char pieces")
  }

  test("EM concentrates probability on the repeating piece and encodes with it") {
    import spark.implicits._
    // 'abab…' dominates: the model must learn a multi-char piece covering
    // 'ab' (or longer) and encode new repetitions with far fewer pieces
    // than characters
    val docs = (1L to 50L).map(i => (i, "ababababab zq")).toDF("doc_id", "text")
    val model = Unigram.train(docs, vocabSize = 8, iters = 3)
    val got = model.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got.keys.exists(p => p.length > 1 && p.forall("ab".contains(_))),
      s"no ab-run piece survived EM: ${got.keys.toSeq.sorted}")
    val enc = Unigram.encode(Seq((9L, "ababababab")).toDF("doc_id", "text"), model)
      .collect()(0)
    assert(enc.getAs[Int]("n_pieces") <= 4,
      s"10-char ab-run should encode in few pieces, got ${enc.getAs[Int]("n_pieces")} " +
        s"(${enc.getAs[String]("preview")})")
    // OOV word (chars absent from training) falls back to per-char pieces
    val oov = Unigram.encode(Seq((10L, "xyz")).toDF("doc_id", "text"), model)
      .collect()(0)
    assert(oov.getAs[Int]("n_pieces") == 3 && oov.getAs[String]("preview") == "x y z")
  }

  test("training is deterministic and compresses real documents") {
    val docs = graft.core.Tables.load(spark, sfDir, "documents").limit(200)
    val m1 = Unigram.train(docs, vocabSize = 300, iters = 2)
    val m2 = Unigram.train(docs, vocabSize = 300, iters = 2)
    val s1 = m1.orderBy("piece").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val s2 = m2.orderBy("piece").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(s1 == s2, "identical corpus + params must yield an identical model")
    val enc = Unigram.encode(docs, m1)
    val a = enc.agg(sum(col("n_pieces")), sum(col("n_words"))).head()
    val nChars = docs.agg(sum(length(regexp_replace(col("text"), " ", ""))))
      .head().getLong(0)
    assert(a.getLong(0) < nChars / 2,
      s"subword encoding should at least halve char count: ${a.getLong(0)} vs $nChars")
    assert(a.getLong(0) >= a.getLong(1), "at least one piece per word")
  }
}
