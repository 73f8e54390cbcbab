package graft.operators

import graft.SparkSpec

class RankingSpec extends SparkSpec {
  import spark.implicits._

  test("termScores: corpus-wide terms weigh zero, rare terms weigh high, bm25 length-normalizes") {
    val df = Seq(
      (1L, "shared rare shared"),
      (2L, "shared shared shared shared shared shared shared")).toDF("doc_id", "text")
    val rows = Ranking.termScores(df, "doc_id", "text")
      .select("doc_id", "term", "tf", "tfidf", "bm25")
      .as[(Long, String, Long, Double, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap

    // 'shared' appears in both docs: idf = ln(2/2) = 0 ⇒ tfidf 0.
    assert(rows((1L, "shared"))._4 == 0.0)
    assert(rows((2L, "shared"))._4 == 0.0)
    // 'rare' appears only in doc 1: tfidf = 1 * ln(2/1).
    assert(rows((1L, "rare"))._4 == math.BigDecimal(math.log(2.0)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // BM25 idf floor: even the everywhere-term keeps a small positive
    // weight (ln(1 + (N-df+0.5)/(df+0.5)) > 0), and the SHORT doc's
    // occurrence outweighs the long doc's per-occurrence score less
    // than tf growth adds: doc 2 has tf=7 but dl=7 vs avgdl=5.
    assert(rows((1L, "shared"))._5 > 0.0)
    // Same term, same df: the short doc (dl < avgdl) scores higher per
    // single occurrence than a single occurrence would in the long doc.
    val k1 = 1.2; val b = 0.75
    val idf = math.log((2 - 2 + 0.5) / (2 + 0.5) + 1.0)
    def bm25(tf: Double, dl: Double, avgdl: Double) =
      idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    assert(math.abs(rows((2L, "shared"))._5 - bm25(7.0, 7.0, 5.0)) < 1e-3)
    assert(math.abs(rows((1L, "shared"))._5 - bm25(2.0, 3.0, 5.0)) < 1e-3)
  }
}
