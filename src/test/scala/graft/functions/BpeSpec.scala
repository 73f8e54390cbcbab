package graft.functions

import graft.SparkSpec
import graft.functions.TextFunctions.words
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("learnLocal reproduces the classic Sennrich example merges") {
    // freq table: low x5, lower x2, newest x6, widest x3 — the
    // canonical worked example: 'es' then 'est' then 'est</w>' lead.
    val freq = Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val merges = Bpe.learnLocal(freq, numMerges = 4, minPairFreq = 2L)
    assert(merges.take(3) == Seq(("e", "s"), ("es", "t"), ("est", "</w>")))
    // 'lo' appears in low+lower = 7 — the next strongest pair
    assert(merges(3) == (("l", "o")))
  }

  test("merge learning is deterministic and respects minPairFreq") {
    val freq = Seq("ab" -> 3L, "cd" -> 1L)
    val m1 = Bpe.learnLocal(freq, 10, minPairFreq = 2L)
    val m2 = Bpe.learnLocal(freq, 10, minPairFreq = 2L)
    assert(m1 == m2)
    // pairs of 'cd' occur once — below the floor, never merged
    assert(!m1.exists { case (a, b) => (a + b).contains("cd") })
  }

  test("encodeWord greedily applies ranks; tokens rebuild the word") {
    val merges = Seq(("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o"), ("lo", "w"))
    val ranks = new java.util.HashMap[String, Integer]
    merges.zipWithIndex.foreach { case ((a, b), i) => ranks.put(a + " " + b, i) }
    assert(Bpe.encodeWord("lowest", ranks).toSeq == Seq("low", "est</w>"))
    assert(Bpe.encodeWord("low", ranks).toSeq == Seq("low", "</w>"))
    assert(Bpe.encodeWord("unseen", ranks).toSeq
      .mkString.replace("</w>", "") == "unseen")
    assert(Bpe.encodeWord("", ranks).isEmpty)
  }

  test("end-to-end: train on the corpus, encode as a column, tokens rebuild text") {
    val docs = Seq(
      (1L, "low low low low low lower lower newest newest newest"),
      (2L, "newest newest newest widest widest widest lowest")
    ).toDF("doc_id", "text")
    val merges = Bpe.learnMerges(
      docs.select(explode(words(col("text"))).as("w")), "w", numMerges = 8)
    assert(merges.nonEmpty)
    val toks = docs.select(col("doc_id"), Bpe.encode(words(col("text")), merges).as("t"))
      .as[(Long, Seq[String])].collect().toMap
    // lossless: replacing </w> with spaces rebuilds the exact text
    assert(toks(1L).mkString.replace(Bpe.Eow, " ").trim ==
      "low low low low low lower lower newest newest newest")
    assert(toks(2L).count(_.endsWith(Bpe.Eow)) == 7) // one terminal per word
  }

  test("encode survives nulls and empty arrays") {
    val df = Seq(
      (1L, Seq("ab", "cd")), (2L, Seq.empty[String]),
      (3L, Seq("ab", null, "cd")),       // null WORD skipped
      (4L, null: Seq[String])            // null input -> null output
    ).toDF("id", "ws")
    val merges = Seq(("a", "b"))
    val out = df.select(col("id"), Bpe.encode(col("ws"), merges).as("t"))
      .collect().map(r => r.getLong(0) -> Option(r.getSeq[String](1))).toMap
    assert(out(1L).get == Seq("ab", "</w>", "c", "d", "</w>"))
    assert(out(2L).get.isEmpty)
    assert(out(3L).get == Seq("ab", "</w>", "c", "d", "</w>"))
    assert(out(4L).isEmpty)
  }

  test("symbols split on code points, not UTF-16 units (non-BMP stays lossless)") {
    val word = "😀ok" // emoji (surrogate pair) + "ok"
    val toks = Bpe.encodeWord(word, new java.util.HashMap[String, Integer])
    assert(toks.toSeq == Seq("😀", "o", "k", Bpe.Eow))
    assert(toks.mkString.replace(Bpe.Eow, "") == word)
  }
}
