package graft

import org.apache.spark.sql.functions._
import graft.operators.Bpe

/** Distributed BPE training gates: the textbook Sennrich example, the
  * left-to-right non-overlap fold corner, and scalar-encode ≡ Catalyst-fold
  * parity (the encode kernel and the training fold must segment
  * identically or q81's oracle would drift from q80's).
  */
class BpeSpec extends SparkSpec {

  test("training learns the textbook merges on a skewed vocabulary") {
    import spark.implicits._
    // 'lo' dominates: low x6, lower x3, newest x2, widest x1
    val docs = Seq((1L,
      (Seq.fill(6)("low") ++ Seq.fill(3)("lower") ++
        Seq.fill(2)("newest") :+ "widest").mkString(" "))).toDF("doc_id", "text")
    val merges = Bpe.train(Bpe.wordTable(docs), 4)
    assert(merges.length == 4)
    // round 0: (l, o) appears 9 times — more than any other pair
    assert((merges(0).a, merges(0).b) == (("l", "o")), s"got ${merges(0)}")
    // round 1: (lo, w) also 9 — low + lower both contain it
    assert((merges(1).a, merges(1).b) == (("lo", "w")), s"got ${merges(1)}")
    // round 2: (low, </w>) 6 beats (e,s)=3, (s,t)=3
    assert((merges(2).a, merges(2).b) == (("low", Bpe.Marker)), s"got ${merges(2)}")
  }

  test("merge application is left-to-right non-overlapping") {
    // [a a a] under (a,a) → [aa a]; a second round of (aa,a) then fuses
    assert(Bpe.encodeWord("aaa", Seq(Bpe.Merge(0, "a", "a"))) ==
      Seq("aa", "a", Bpe.Marker))
    assert(Bpe.encodeWord("aaaa", Seq(Bpe.Merge(0, "a", "a"))) ==
      Seq("aa", "aa", Bpe.Marker))
    assert(Bpe.encodeWord("aaa",
      Seq(Bpe.Merge(0, "a", "a"), Bpe.Merge(1, "aa", "a"))) ==
      Seq("aaa", Bpe.Marker))
  }

  test("scalar encode kernel matches the Catalyst training fold symbol-for-symbol") {
    import spark.implicits._
    val words = Seq("low", "lower", "newest", "aaa", "x").toDF("w")
      .withColumn("freq", lit(1L))
      .withColumn("syms", concat(
        expr("transform(sequence(1, length(w)), i -> substr(w, i, 1))"),
        array(lit(Bpe.Marker))))
    val merges = Seq(Bpe.Merge(0, "l", "o"), Bpe.Merge(1, "lo", "w"),
      Bpe.Merge(2, "a", "a"), Bpe.Merge(3, "e", "s"))
    val folded = merges.foldLeft(words) { (df, m) =>
      df.withColumn("syms", Bpe.applyMerge(col("syms"), m.a, m.b))
    }.select(col("w"), col("syms")).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    for ((w, viaFold) <- folded)
      assert(Bpe.encodeWord(w, merges).toList == viaFold,
        s"kernel/fold drift on '$w'")
  }

  test("encode counts and previews documents, empty docs included") {
    import spark.implicits._
    val docs = Seq((1L, "low low"), (2L, "")).toDF("doc_id", "text")
    val merges = Seq(Bpe.Merge(0, "l", "o"), Bpe.Merge(1, "lo", "w"))
    val got = Bpe.encode(docs, merges).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    // "low" → [low, </w>] per word → 4 tokens total
    assert(got(1L) == ((4L, s"low ${Bpe.Marker} low ${Bpe.Marker}")), s"got ${got(1L)}")
    assert(got(2L) == ((0L, "")))
  }
}
