package graft

import graft.operators.WordPiece

/** WordPiece greedy-encode gates: max-munch order, coverage (pieces
  * reassemble the word), char-fallback, and the derived-vocab bounds.
  */
class WordPieceSpec extends SparkSpec {

  private val v = WordPiece.Vocab(
    init = Set("a", "b", "c", "d", "ab", "abc", "cd"),
    cont = Set("a", "b", "c", "d", "cd", "bcd"),
    maxLen = 3)

  test("greedy encode takes the longest piece at every position") {
    // init has abc (3) > ab (2) > a: max munch picks abc
    assert(WordPiece.encodeWord("abcd", v) == Seq("abc", "##d"))
    // at pos 0 only 'a' matches "aa…"; then continuation chars until
    // 'bcd' (3) beats 'b' at position 2 — initial pieces never apply mid-word
    assert(WordPiece.encodeWord("aabcd", v) == Seq("a", "##a", "##bcd"))
    assert(WordPiece.encodeWord("dabcd", v) == Seq("d", "##a", "##bcd"))
  }

  test("char fallback keeps every word encodable and pieces reassemble it") {
    val words = Seq("abcd", "dcba", "aaaa", "abcabc", "d")
    words.foreach { w =>
      val pieces = WordPiece.encodeWord(w, v)
      val back = pieces.map(_.stripPrefix("##")).mkString
      assert(back == w, s"pieces $pieces do not reassemble '$w'")
      assert(pieces.head == pieces.head.stripPrefix("##"), "initial piece carries ##")
      pieces.tail.foreach(p => assert(p.startsWith("##"), s"continuation '$p' lacks ##"))
    }
  }

  test("training learns planted likelihood-maximal merges in order") {
    import spark.implicits._
    // corpus engineered so likelihood (cnt/(fa·fb)) and raw pair count
    // DISAGREE: "xy" appears as a pair 30× but x,y are everywhere (high
    // fa·fb); "qz" appears only 8× but q,z occur nowhere else, so its
    // score 8/(8·8) = 0.125 beats 30/(50·48) ≈ 0.0129 — a pure
    // count-argmax (BPE-style) would pick (x, ##y) first, the
    // likelihood trainer must pick (q, ##z) first.
    val docs = (Seq.fill(30)("xy") ++ Seq.fill(20)("xa") ++
        Seq.fill(18)("by") ++ Seq.fill(8)("qz"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val merges = WordPiece.train(WordPiece.symTable(docs), k = 2)
    assert(merges.head.a == "q" && merges.head.b == "##z",
      s"first merge should be the likelihood-maximal (q, ##z), got ${merges.head}")
    assert(merges.head.merged == "qz" && merges.head.cnt == 8L &&
      merges.head.fa == 8L && merges.head.fb == 8L)
    // next best: (b,##y) 18/(18·48) ≈ 0.0208 beats (x,##a) 0.02 and
    // (x,##y) 0.0125 — again NOT the raw-count argmax (x,##y)
    assert(merges(1).a == "b" && merges(1).b == "##y", s"got ${merges(1)}")
    // the trained vocab greedy-encodes merged words as single pieces and
    // still covers every word via char fallback
    val vocab = WordPiece.trainedVocab(WordPiece.symTable(docs), merges)
    assert(WordPiece.encodeWord("qz", vocab) == Seq("qz"))
    assert(WordPiece.encodeWord("by", vocab) == Seq("by"))
    assert(WordPiece.encodeWord("xy", vocab) == Seq("x", "##y"))
    assert(WordPiece.encodeWord("zq", vocab) == Seq("z", "##q"))
  }

  test("merge fold fuses left-to-right without overlap and keeps ## status") {
    import spark.implicits._
    // "aaa" under merge (a, ##a): [a ##a ##a] -> [aa ##a] (the fused
    // piece does not re-pair within the same round)
    val t = Seq((1L, "aaa aaa")).toDF("doc_id", "text")
    val sym = WordPiece.symTable(t)
    val folded = sym.select(
        WordPiece.applyMerge(org.apache.spark.sql.functions.col("syms"), "a", "##a").as("s"))
      .collect().head.getSeq[String](0)
    assert(folded == Seq("aa", "##a"), s"got $folded")
  }

  test("derived vocab is bounded and the corpus encode covers every word") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val words = WordPiece.wordFreq(docs)
    val vocab = WordPiece.deriveVocab(words, topWords = 20, maxPrefix = 4, maxSuffix = 3)
    // chars + at most 20·3 prefixes / 20·2 suffixes
    assert(vocab.init.size <= 26 + 20 * 3 + 10)
    assert(vocab.cont.size <= 26 + 20 * 2 + 10)
    val enc = WordPiece.encodeWords(spark, words, vocab).collect()
    assert(enc.nonEmpty)
    enc.foreach { r =>
      val word = r.getString(0)
      val pieces = r.getString(3).split(" ")
      assert(pieces.map(_.stripPrefix("##")).mkString == word)
      assert(pieces.length == r.getInt(2))
    }
  }
}
