package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Unigram

/** Unigram-LM tokenizer: closed-form Viterbi fixtures (optimal path,
  * the longer-piece tie-break, the over-length contract) plus corpus
  * invariants tying vocab / encode / refit together.
  */
class UnigramSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("Viterbi picks the cheapest segmentation") {
    val costs = Map("ab" -> 10L, "a" -> 100L, "b" -> 100L, "c" -> 100L, "abc" -> 25L)
    assert(Unigram.segmentWord("abc", costs) === Seq("abc"))
    assert(Unigram.segmentWord("abcab", costs) === Seq("abc", "ab"))
    assert(Unigram.segmentWord("cab", costs) === Seq("c", "ab"))
  }

  test("equal-cost paths break toward the longer trailing piece") {
    // a|bc = 25+55 = 80; ab|c = 50+30 = 80; a|b|c = 80 — all tie
    val costs = Map("a" -> 25L, "b" -> 25L, "c" -> 30L, "ab" -> 50L, "bc" -> 55L)
    assert(Unigram.segmentWord("abc", costs) === Seq("a", "bc"))
  }

  test("words over the contract cap segment as ceil(len/4) opaque pieces") {
    val w = "x" * (Unigram.MaxWordChars + 3)
    assert(Unigram.segmentWord(w, Map("x" -> 1L)) === Seq.empty)
  }

  test("corpus invariants: chars covered, encode bounded, refit within vocab") {
    val sf = SparkTestSession.Sf
    val vocab = Unigram.unigramVocab(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val pieces = vocab.map(_._1).toSet
    // every single character of the corpus alphabet is in the vocab
    // (the segmentability guarantee)
    val chars = Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.explode(
        graft.functions.TextFunctions.tokens(
          org.apache.spark.sql.functions.col("text"))).as("w"))
      .collect().flatMap(_.getString(0)).map(_.toString).toSet
    assert(chars.subsetOf(pieces))
    // costs decrease with frequency (monotone quantized -ln)
    for (Array((_, f1, c1), (_, f2, c2)) <- vocab.sliding(2))
      if (f1 > f2) assert(c1 <= c2)

    val enc = Unigram.unigramEncode(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    for ((_, nw, np, fert) <- enc) {
      assert(np >= nw, "a word is at least one piece")
      assert(fert === math.floor(np.toDouble / math.max(nw, 1L) * 1e4 + 0.5) / 1e4)
    }
    // n_words agrees with the tokenizer
    val wantWords = Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.size(
          graft.functions.TextFunctions.tokens(
            org.apache.spark.sql.functions.col("text"))).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for ((id, nw, _, _) <- enc) assert(nw === wantWords(id))

    // refit counts only vocab pieces, and no piece count exceeds the
    // corpus character volume
    val refit = Unigram.unigramRefit(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(refit.map(_._1).toSet.subsetOf(pieces))
    val totalChars = Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.length(
          org.apache.spark.sql.functions.regexp_replace(
            org.apache.spark.sql.functions.col("text"), "[^a-z0-9]", ""))))
      .head().getLong(0)
    for ((_, c) <- refit) assert(c <= totalChars)
  }
}
