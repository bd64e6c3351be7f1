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
