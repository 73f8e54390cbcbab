package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

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

  test("topNgrams counts multiset frequency with a deterministic tiebreak") {
    val df = Seq(
      (1L, "a b a b c"),   // bigrams: "a b","b a","a b","b c"
      (2L, "a b z"),       // "a b","b z"
      (3L, "solo")         // < 2 words: contributes no bigram
    ).toDF("doc_id", "text")
    val top = Ranking.topNgrams(df, "text", n = 2, k = 3)
      .as[(String, Long)].collect().toSeq
    assert(top == Seq(("a b", 3L), ("b a", 1L), ("b c", 1L))) // ties: gram asc
    val uni = Ranking.topNgrams(df, "text", n = 1, k = 2)
      .as[(String, Long)].collect().toSeq
    assert(uni == Seq(("a", 3L), ("b", 3L))) // a/b tie broken by gram
  }

  test("rrfFuse: hand-checked fusion, misses contribute zero") {
    val a = Seq(("x", 1L), ("y", 2L)).toDF("id", "rank")
    val b = Seq(("y", 1L), ("z", 2L)).toDF("id", "rank")
    val out = Ranking.rrfFuse(Seq(a, b), "id")
      .collect().map(r => r.getString(0) -> ((r.getInt(1), r.getDouble(2)))).toMap
    assert(out == Map(
      "x" -> ((1, 1.0 / 61.0 + 0.0)),
      "y" -> ((2, 1.0 / 62.0 + 1.0 / 61.0)),
      "z" -> ((1, 0.0 + 1.0 / 62.0))))
    // consensus id outranks every single-list id at these depths
    assert(out("y")._2 > out("x")._2 && out("x")._2 > out("z")._2)
    // three-ranker fusion keeps the fixed term order
    val c = Seq(("x", 1L)).toDF("id", "rank")
    val three = Ranking.rrfFuse(Seq(a, b, c), "id")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(three("x") == 1.0 / 61.0 + 0.0 + 1.0 / 61.0)
  }

  test("rankEval: nDCG/MRR/precision hand-checked against the closed form") {
    // query "a": retrieved docs 10,20,30 at ranks 1..3; relevance has
    // 20→3, 30→1 and an UNRETRIEVED 90→2 (hurts nDCG, not precision).
    val ranked = Seq(
      ("a", 10L, 1), ("a", 20L, 2), ("a", 30L, 3),
      ("b", 10L, 1), ("b", 20L, 2)).toDF("query", "doc_id", "rank")
    val rel = Seq(
      ("a", 20L, 3L), ("a", 30L, 1L), ("a", 90L, 2L)).toDF("query", "doc_id", "rel")
    val out = Ranking.rankEval(ranked, rel, "query", "doc_id", k = 3)
      .collect().map(r => r.getString(0) -> r).toMap

    def term(g: Double, r: Int) =
      BigDecimal(g / math.log(r + 1.0)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val dcg = term(3, 2) + term(1, 3)           // gains at ranks 2, 3
    val idcg = term(3, 1) + term(2, 2) + term(1, 3) // ideal: 3,2,1
    val expNdcg = BigDecimal(dcg.toDouble / idcg.toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val a = out("a")
    assert(a.getDouble(1) == expNdcg)
    assert(a.getDouble(2) == 0.5)               // first hit at rank 2
    assert(a.getDouble(3) == 2.0 / 3)           // 2 of k=3 relevant
    assert(a.getLong(4) == 3L)
    // query "b" has no relevance rows at all: all metrics zero
    val b = out("b")
    assert(b.getDouble(1) == 0.0 && b.getDouble(2) == 0.0 &&
      b.getDouble(3) == 0.0 && b.getLong(4) == 0L)
  }

  test("bcubed: textbook 3-item split scores P = R = F1 = 2/3; identity scores 1") {
    // pred {1,2},{3} vs gold {1},{2,3}
    val df = Seq((1L, "p1", "g1"), (2L, "p1", "g2"), (3L, "p2", "g2"))
      .toDF("id", "pred", "gold")
    val r = Ranking.bcubed(df, col("pred"), col("gold")).collect().head
    assert(r.getAs[Long]("n_items") == 3L)
    val twoThirds = math.rint(2.0 / 3.0 * 1e6) / 1e6
    assert(r.getAs[Double]("bcubed_precision") == twoThirds)
    assert(r.getAs[Double]("bcubed_recall") == twoThirds)
    assert(math.abs(r.getAs[Double]("bcubed_f1") - twoThirds) <= 1e-6)
    // identical labelings: perfect score; null-labeled items excluded
    val perfect = Seq((1L, "a", "a"), (2L, "a", "a"), (3L, "b", "b"),
      (4L, null, "b")).toDF("id", "pred", "gold")
    val p = Ranking.bcubed(perfect, col("pred"), col("gold")).collect().head
    assert(p.getAs[Long]("n_items") == 3L)
    assert(p.getAs[Double]("bcubed_precision") == 1.0 &&
      p.getAs[Double]("bcubed_recall") == 1.0 &&
      p.getAs[Double]("bcubed_f1") == 1.0)
  }

  test("adjustedRand: identity scores 1, the anti-correlated 3-item split scores -0.5") {
    val perfect = Seq((1L, "a", "a"), (2L, "a", "a"), (3L, "b", "b"))
      .toDF("id", "pred", "gold")
    val p = Ranking.adjustedRand(perfect, col("pred"), col("gold")).collect().head
    assert(p.getAs[Double]("ari") == 1.0)
    // pred {1,2},{3} vs gold {1},{2,3}: cells all singletons -> S_cells = 0,
    // S_pred = S_gold = 1, total pairs 3, E = 1/3 -> ARI = -0.5
    val split = Seq((1L, "p1", "g1"), (2L, "p1", "g2"), (3L, "p2", "g2"))
      .toDF("id", "pred", "gold")
    val s = Ranking.adjustedRand(split, col("pred"), col("gold")).collect().head
    assert(s.getAs[Double]("sum_comb_cells") == 0.0)
    assert(s.getAs[Double]("sum_comb_pred") == 1.0 &&
      s.getAs[Double]("sum_comb_gold") == 1.0)
    assert(s.getAs[Double]("ari") == -0.5)
  }

  test("phraseSearch: adjacency in order, overlaps counted, non-matches absent") {
    val docs = Seq(
      (1L, "hash table hash table"),  // "hash table" at 0 and 2
      (2L, "table hash"),             // reversed: no match
      (3L, "hash x table"),           // gap: no match
      (4L, "a hash table b"),         // one match at position 1
      (5L, "hash hash hash")          // self-overlap probe for ["hash","hash"]
    ).toDF("doc_id", "text")
    val got = Ranking.phraseSearch(docs, col("doc_id"), col("text"),
        Seq("hash", "table"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(got == Map(1L -> ((2L, 0)), 4L -> ((1L, 1))))
    val overlap = Ranking.phraseSearch(docs, col("doc_id"), col("text"),
        Seq("hash", "hash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(overlap == Map(5L -> 2L)) // starts 0 and 1
    val tri = Ranking.phraseSearch(docs, col("doc_id"), col("text"),
        Seq("hash", "table", "hash"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(tri == Map(1L -> ((1L, 0))))
  }

  test("skipgramPmi: window pairs, canonical order, counts and PMI sign") {
    // "a b a b": window-1 pairs = (a,b)x3; window-2 adds (a,a),(b,b)
    val docs = Seq((1L, "a b a b"), (2L, "a b a b")).toDF("doc_id", "text")
    val w1 = Ranking.skipgramPmi(docs, "doc_id", "text",
        window = 1, minCount = 1L, k = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // 6 (a,b) pairs across 2 docs; 4 occurrences of each token
    assert(w1 == Map(("a", "b") -> ((6L, 4L, 4L))))
    val w2 = Ranking.skipgramPmi(docs, "doc_id", "text",
        window = 2, minCount = 1L, k = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(w2 == Map(("a", "b") -> 6L, ("a", "a") -> 2L, ("b", "b") -> 2L))
    // uniform independent-ish corpus: the (a,b) PMI under window 1 is
    // ln((6/6)·(8/4)·(8/4)) = ln 4 — exact check of the fixed op chain
    val pmi = Ranking.skipgramPmi(docs, "doc_id", "text",
        window = 1, minCount = 1L, k = 10)
      .collect().head.getDouble(5)
    assert(math.abs(pmi - math.log(4.0)) < 1e-6)
  }

  test("chi2Terms: class-exclusive terms top the list, shared terms score 0") {
    // "hot" only in positives, "cold" only in negatives, "the" in all
    val docs = Seq(
      (1L, "the hot sun", 1L), (2L, "the hot fire", 1L),
      (3L, "the cold ice", 0L), (4L, "the cold snow", 0L)
    ).toDF("doc_id", "text", "y")
    val out = Ranking.chi2Terms(docs, "doc_id", "text", col("y"),
        minDf = 2L, k = 10)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))).toMap
    // perfectly separating term in a balanced 2+2 corpus: chi2 = N = 4
    assert(out("hot") == ((2L, 0L, 4.0, true)))
    assert(out("cold") == ((0L, 2L, 4.0, false)))
    assert(out("the") == ((2L, 2L, 0.0, false))) // df=4, no association
    // hapax terms fall below minDf and never surface
    assert(!out.contains("sun"))
  }

  test("coverageCurve: smallest frequency-ranked vocab hitting each target") {
    // corpus tokens: a x6, b x3, c x1 -> N = 10.
    // p=0.5 -> ceil 5 -> rank 1 (cum 6); p=0.9 -> ceil 9 -> rank 2 (cum 9);
    // p=0.99 -> ceil 10 -> rank 3 (cum 10)
    val df = Seq("a a a a a a", "b b b c").toDF("text")
    val out = Ranking.coverageCurve(df, col("text"), Seq(0.5, 0.9, 0.99))
      .collect().map(r => r.getDouble(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(0.5) == ((1L, 6L, 10L)))
    assert(out(0.9) == ((2L, 9L, 10L)))
    assert(out(0.99) == ((3L, 10L, 10L)))
  }

  test("simpsonIndex: uniform words -> 0, constant word -> 1000000") {
    // g1: 4 distinct words once each -> num 0 -> 0 ppm
    // g2: same word 5 times -> 5*4/(5*4) = 1000000 ppm
    val df = Seq(("g1", "a b c d"), ("g2", "x x x x x")).toDF("src", "text")
    val out = Ranking.simpsonIndex(df, col("src"), col("text"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out("g1") == ((4L, 0L)))
    assert(out("g2") == ((5L, 1000000L)))
  }

  test("typeTokenRatio: tokens/types/hapax exact ppm") {
    val df = Seq(("g1", "a a b"), ("g1", "b c"), ("g2", "x x x x"))
      .toDF("src", "text")
    val out = Ranking.typeTokenRatio(df, col("src"), col("text"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // g1: 5 tokens {a:2, b:2, c:1} -> 3 types, ttr 600000, hapax 1 (333333)
    assert(out("g1") == ((5L, 3L, 600000L, 1L, 333333L)))
    assert(out("g2") == ((4L, 1L, 250000L, 0L, 0L)))
  }

  test("zipfFit: exact power law recovers its slope") {
    // frequencies c_r = 1000 / r for ranks 1..4 exactly representable:
    // freqs 1000, 500, 250, 125 at distinct words -> slope ln-space of
    // f = C * r^-1? ln f = ln 1000 - s ln r with s chosen by halving:
    // ln(c_r) = ln 1000 - r? No: halving per rank is f ~ 2^-(r-1), not
    // a power law in r. Use exact r^-1: 1200/r for r in 1,2,3,4:
    // 1200, 600, 400, 300 -> perfect slope -1.
    val words = Seq.fill(1200)("w1") ++ Seq.fill(600)("w2") ++
      Seq.fill(400)("w3") ++ Seq.fill(300)("w4")
    val df = words.grouped(100).map(_.mkString(" ")).toSeq.toDF("text")
    val r = Ranking.zipfFit(df, col("text"), k = 4).collect().head
    assert(r.getLong(0) == 4L)
    // 6dp-rounded log terms: slope lands within 1e-4 of exactly -1
    assert(math.abs(r.getDouble(1) + 1.0) < 1e-4)
  }

  test("agreementStats: textbook kappa/MCC; perfect and constant-pred edges") {
    // gold a,a,b,b vs pred a,b,b,b: po = 3/4, pe = (2*1 + 2*3)/16 = 1/2,
    // kappa = (3*4-8)/(16-8) = 0.5; MCC = 4/(sqrt(6)*sqrt(8)) = 0.57735
    val df = Seq(("a", "a"), ("a", "b"), ("b", "b"), ("b", "b"))
      .toDF("gold", "pred")
    val r = Ranking.agreementStats(df, col("gold"), col("pred")).head()
    assert(r.getAs[Long]("n") == 4L && r.getAs[Long]("n_classes") == 2L)
    assert(r.getAs[Long]("po_ppm") == 750000L)
    assert(r.getAs[Long]("pe_ppm") == 500000L)
    assert(r.getAs[Long]("kappa_ppm") == 500000L)
    assert(r.getAs[Double]("mcc") == 0.57735)
    // perfect agreement -> kappa 1e6; constant prediction -> MCC null
    val perfect = Seq(("a", "a"), ("b", "b")).toDF("gold", "pred")
    assert(Ranking.agreementStats(perfect, col("gold"), col("pred"))
      .head().getAs[Long]("kappa_ppm") == 1000000L)
    val const = Seq(("a", "a"), ("b", "a")).toDF("gold", "pred")
    val c = Ranking.agreementStats(const, col("gold"), col("pred")).head()
    assert(c.isNullAt(5)) // mcc
  }

  test("yuleK: hand spectrum K, zero for all-singletons") {
    // "x x y y": S2 = 8, N = 4 -> K = 1e4*(8-4)/16 = 2500 -> 2500000 milli
    val rep = Seq("x x y y").toDF("text")
    val r = Ranking.yuleK(rep, col("text")).collect().head
    assert(r.getAs[Long]("n_tokens") == 4L && r.getAs[Long]("vocab") == 2L &&
      r.getAs[Long]("s2") == 8L)
    assert(r.getAs[Long]("yule_k_milli") == 2500000L)
    // all singletons: S2 = N -> K = 0
    val single = Seq("a b c").toDF("text")
    assert(Ranking.yuleK(single, col("text")).collect()
      .head.getAs[Long]("yule_k_milli") == 0L)
    // one type repeated n times: K = 1e4*(n^2-n)/n^2; n=5 -> 8000000 milli
    val mono = Seq("z z z z z").toDF("text")
    assert(Ranking.yuleK(mono, col("text")).collect()
      .head.getAs[Long]("yule_k_milli") == 8000000L)
  }

  test("vocabRichness: hand spectrum, all-singleton doubling, saturated coverage") {
    // "a b a" + "c b": counts a:2 b:2 c:1 -> N=5 V=3 f1=1 f2=2;
    // chao1 correction 1*0 div 6 = 0; coverage (5-1)/5 = 0.8
    val df = Seq("a b a", "c b").toDF("text")
    val r = Ranking.vocabRichness(df, col("text")).collect().head
    assert(r.getAs[Long]("n_tokens") == 5L && r.getAs[Long]("vocab") == 3L)
    assert(r.getAs[Long]("f1") == 1L && r.getAs[Long]("f2") == 2L)
    assert(r.getAs[Long]("chao1_est") == 3L)
    assert(r.getAs[Long]("coverage_ppm") == 800000L)
    // all singletons: chao1 = V + V(V-1)/2 = 6, coverage 0
    val single = Seq("a b c").toDF("text")
    val s = Ranking.vocabRichness(single, col("text")).collect().head
    assert(s.getAs[Long]("chao1_est") == 6L &&
      s.getAs[Long]("coverage_ppm") == 0L)
    // no singletons at all: chao1 = V exactly, coverage 1e6
    val sat = Seq("x x y y").toDF("text")
    val t = Ranking.vocabRichness(sat, col("text")).collect().head
    assert(t.getAs[Long]("chao1_est") == 2L &&
      t.getAs[Long]("coverage_ppm") == 1000000L)
  }

  test("gwetAc1: perfect 1, paradox-resistant under skew, single-category null") {
    // the fleiss perfect-panels case: Po = 1, Pe = 1/2 -> AC1 = 1
    val perfect = Seq(
      (1L, "x"), (1L, "x"), (1L, "x"),
      (2L, "y"), (2L, "y"), (2L, "y")).toDF("item", "cat")
    val p = Ranking.gwetAc1(perfect, col("item"), col("cat"), raters = 3)
      .collect().head
    assert(p.getAs[Long]("po_ppm") == 1000000L &&
      p.getAs[Long]("pe_ppm") == 500000L &&
      p.getAs[Long]("ac1_ppm") == 1000000L)
    // the kappa paradox: {x,x},{x,x},{x,y} has 2/3 raw agreement but
    // Fleiss kappa = -0.2; AC1 stays positive at 14/26
    val skew = Seq((1L, "x"), (1L, "x"), (2L, "x"), (2L, "x"),
      (3L, "x"), (3L, "y")).toDF("item", "cat")
    val s = Ranking.gwetAc1(skew, col("item"), col("cat"), raters = 2)
      .collect().head
    assert(s.getAs[Long]("ac1_ppm") == 538461L)
    assert(Ranking.fleissKappa(skew, col("item"), col("cat"), raters = 2)
      .collect().head.getAs[Long]("kappa_ppm") == -200000L)
    // mixed hand case: Po = 1/2, Pe = 3/8 -> AC1 = 1/5
    val mixed = Seq((1L, "x"), (1L, "x"), (2L, "x"), (2L, "y"))
      .toDF("item", "cat")
    assert(Ranking.gwetAc1(mixed, col("item"), col("cat"), raters = 2)
      .collect().head.getAs[Long]("ac1_ppm") == 200000L)
    // one observed category: no disagreement model -> null
    val const = Seq((1L, "x"), (1L, "x"), (2L, "x"), (2L, "x"))
      .toDF("item", "cat")
    val c = Ranking.gwetAc1(const, col("item"), col("cat"), raters = 2)
      .collect().head
    assert(c.isNullAt(c.fieldIndex("ac1_ppm")))
    graft.core.CacheRegistry.unpersistAll()
  }

  test("krippendorffAlpha: hand cases across agreement levels, singletons drop") {
    // u1 {x,x}, u2 {x,y}: Do = 1/2 = De -> alpha = 0
    val zero = Seq((1L, "x"), (1L, "x"), (2L, "x"), (2L, "y")).toDF("u", "c")
    val z = Ranking.krippendorffAlpha(zero, col("u"), col("c")).collect().head
    assert(z.getAs[Long]("n_units") == 2L && z.getAs[Long]("n_pairable") == 4L)
    assert(z.getAs[Long]("alpha_ppm") == 0L)
    // unanimous units on different categories: Do = 0 -> alpha = 1
    val perfect = Seq((1L, "x"), (1L, "x"), (2L, "y"), (2L, "y"))
      .toDF("u", "c")
    assert(Ranking.krippendorffAlpha(perfect, col("u"), col("c"))
      .collect().head.getAs[Long]("alpha_ppm") == 1000000L)
    // systematic within-unit disagreement: alpha = -0.5
    val anti = Seq((1L, "x"), (1L, "y"), (2L, "x"), (2L, "y")).toDF("u", "c")
    assert(Ranking.krippendorffAlpha(anti, col("u"), col("c"))
      .collect().head.getAs[Long]("alpha_ppm") == -500000L)
    // a 1-rating unit is unpairable: dropped + counted; one category
    // everywhere -> De = 0 -> alpha null
    val const = Seq((1L, "x"), (1L, "x"), (2L, "x")).toDF("u", "c")
    val c = Ranking.krippendorffAlpha(const, col("u"), col("c"))
      .collect().head
    assert(c.getAs[Long]("n_units") == 1L && c.getAs[Long]("n_dropped") == 1L)
    assert(c.isNullAt(c.fieldIndex("alpha_ppm")))
    // variable panel sizes mix exactly: u1 {x,x,x} (du 0), u2 {x,y}
    // (du 2): np 5, B = 16+1 -> ratio = 2e6*4 div 8 = 1e6 -> alpha 0
    val varSize = Seq((1L, "x"), (1L, "x"), (1L, "x"), (2L, "x"), (2L, "y"))
      .toDF("u", "c")
    assert(Ranking.krippendorffAlpha(varSize, col("u"), col("c"))
      .collect().head.getAs[Long]("alpha_ppm") == 0L)
    graft.core.CacheRegistry.unpersistAll()
  }

  test("fleissKappa: perfect panels 1, below-chance negative, off-size items drop") {
    // two items, three raters each, unanimous but on different
    // categories: Po = 1, Pe = 1/2 -> kappa = 1
    val perfect = Seq(
      (1L, "x"), (1L, "x"), (1L, "x"),
      (2L, "y"), (2L, "y"), (2L, "y")).toDF("item", "cat")
    val p = Ranking.fleissKappa(perfect, col("item"), col("cat"), raters = 3)
      .collect().head
    assert(p.getAs[Long]("n_items") == 2L && p.getAs[Long]("k") == 2L)
    assert(p.getAs[Long]("po_ppm") == 1000000L &&
      p.getAs[Long]("pe_ppm") == 500000L &&
      p.getAs[Long]("kappa_ppm") == 1000000L)
    // item1 {x,x}, item2 {x,y}: A=2, B=10 -> Po=1/2, Pe=5/8,
    // kappa = -1/3 -> sign-split floor -333333
    val mixed = Seq((1L, "x"), (1L, "x"), (2L, "x"), (2L, "y"))
      .toDF("item", "cat")
    val m = Ranking.fleissKappa(mixed, col("item"), col("cat"), raters = 2)
      .collect().head
    assert(m.getAs[Long]("po_ppm") == 500000L &&
      m.getAs[Long]("pe_ppm") == 625000L &&
      m.getAs[Long]("kappa_ppm") == -333333L)
    // one category everywhere: Pe = 1 -> kappa null; the 1-rating
    // item drops and is counted
    val const = Seq((1L, "x"), (1L, "x"), (2L, "x"), (2L, "x"), (3L, "x"))
      .toDF("item", "cat")
    val c = Ranking.fleissKappa(const, col("item"), col("cat"), raters = 2)
      .collect().head
    assert(c.getAs[Long]("n_items") == 2L && c.getAs[Long]("n_dropped") == 1L)
    assert(c.getAs[Long]("po_ppm") == 1000000L &&
      c.isNullAt(c.fieldIndex("kappa_ppm")))
    graft.core.CacheRegistry.unpersistAll()
  }

  test("logOddsTerms: side-exclusive terms rank first with opposite signs") {
    // a says "alpha" a lot, b says "beta"; "shared" is balanced
    val a = (Seq.fill(20)("alpha") ++ Seq.fill(10)("shared")).toDF("w")
    val b = (Seq.fill(20)("beta") ++ Seq.fill(10)("shared")).toDF("w")
    val out = Ranking.logOddsTerms(a, b, col("w"), a0 = 10.0, k = 3).collect()
    assert(out.map(_.getAs[String]("term")).take(2).toSet == Set("alpha", "beta"))
    val byTerm = out.map(r => r.getAs[String]("term") -> r.getAs[Double]("z")).toMap
    assert(byTerm("alpha") > 0.0 && byTerm("beta") < 0.0)
    // the balanced term scores (near) zero and ranks last
    assert(math.abs(byTerm("shared")) < 0.1)
    assert(out.last.getAs[String]("term") == "shared")
  }

  test("heapsFit: first-occurrence vocab walk — exact counts, sane exponent") {
    // docs in id order: "a b" (+2 vocab), "a c" (+1), "a b c d" (+1)
    // -> T = 2,4,8 ; V = 2,3,4 ; growth strictly sublinear (beta < 1)
    val df = Seq((1L, "a b"), (2L, "a c"), (3L, "a b c d")).toDF("id", "text")
    val r = Ranking.heapsFit(df, col("id"), col("text")).collect().head
    assert(r.getAs[Long]("n_docs") == 3L)
    assert(r.getAs[Long]("n_tokens") == 8L)
    assert(r.getAs[Long]("vocab") == 4L)
    val beta = r.getAs[Double]("beta")
    assert(beta > 0.0 && beta < 1.0)
    // a wordless doc is excluded, counts unchanged
    val withEmpty = df.unionAll(Seq((4L, "...")).toDF("id", "text"))
    assert(Ranking.heapsFit(withEmpty, col("id"), col("text"))
      .collect().head.getAs[Long]("n_docs") == 3L)
  }

  test("confusionStats: per-class P/R/F1 ppm, absent-side classes surface") {
    // gold a,a,b,c ; pred a,b,b,d — class c never predicted, d never gold
    val df = Seq(("a", "a"), ("a", "b"), ("b", "b"), ("c", "d"))
      .toDF("gold", "pred")
    val out = Ranking.confusionStats(df, col("gold"), col("pred"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), Option(r.get(4)), Option(r.get(5)), Option(r.get(6))))).toMap
    assert(out("a") == ((2L, 1L, 1L, Some(1000000L), Some(500000L), Some(666666L))))
    assert(out("b") == ((1L, 2L, 1L, Some(500000L), Some(1000000L), Some(666666L))))
    assert(out("c") == ((1L, 0L, 0L, None, Some(0L), None)))       // never predicted
    assert(out("d") == ((0L, 1L, 0L, Some(0L), None, None)))       // never in gold
  }

  test("weightedKappa: perfect 1e6, balanced swap -1e6, near-miss mild") {
    def kw(pairs: (Long, Long)*) = Ranking.weightedKappa(
      pairs.toSeq.toDF("g", "p"), col("g"), col("p"))
      .collect().head
    // perfect ordinal agreement: Σw·O = 0 -> exactly 1e6
    val perf = kw(1L -> 1L, 2L -> 2L, 3L -> 3L)
    assert(perf.getAs[Long]("kappa_w_ppm") == 1000000L)
    // balanced 2-class swap: κ_w = −1 exactly
    assert(kw(1L -> 2L, 2L -> 1L).getAs[Long]("kappa_w_ppm") == -1000000L)
    // near-miss vs far-miss on a 3-point scale: (1→2) is punished
    // FAR less than (1→3) against the same margins
    val near = kw(1L -> 2L, 2L -> 2L, 3L -> 3L).getAs[Long]("kappa_w_ppm")
    val far = kw(1L -> 3L, 2L -> 2L, 3L -> 3L).getAs[Long]("kappa_w_ppm")
    assert(near > far)
    // degenerate: single class on both sides -> null
    assert(kw(2L -> 2L, 2L -> 2L).isNullAt(3))
  }

  test("termBurstiness: CF/DF and VMR exact; single-doc terms null VMR") {
    val docs = Seq(
      (1L, "cat cat cat dog"), (2L, "cat dog dog"), (3L, "bird"))
      .toDF("doc_id", "text")
    val out = Ranking.termBurstiness(docs, col("doc_id"), col("text"), k = 10)
      .collect()
    assert(out.map(_.getString(0)).toSeq == Seq("cat", "dog", "bird"))
    val m = out.map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
      r.getLong(3), Option(r.get(4)).map(_.asInstanceOf[Long])))).toMap
    // cat: counts (3,1) -> burst 2.0, variance 2 / mean 2 -> VMR 1
    assert(m("cat") == ((2L, 4L, 2000000L, Some(1000000L))))
    // dog: counts (1,2) -> burst 1.5, VMR (10−9)/3
    assert(m("dog") == ((2L, 3L, 1500000L, Some(333333L))))
    // bird appears in one doc: VMR undefined
    assert(m("bird") == ((1L, 1L, 1000000L, None)))
  }

  test("rankBiasedOverlap: identical, swapped-top and disjoint rankings") {
    def rk(items: (String, Long)*) = items.toSeq.toDF("id", "rank")
    val abc = rk("x" -> 1L, "y" -> 2L, "z" -> 3L)
    // identical 3-item lists at depth 4: ov = 1,2,3,3 ->
    // 500000 + 250000 + 125000 + 3e6 div 64 = 921875
    val same = Ranking.rankBiasedOverlap(abc, abc, "id", "rank", depth = 4)
      .collect().head
    assert(same.getAs[Long]("n_a") == 3L && same.getAs[Long]("n_b") == 3L)
    assert(same.getAs[Long]("overlap_full") == 3L)
    assert(same.getAs[Long]("rbo_ppm") == 921875L)
    // swapped top-2 at depth 2: both items only align at depth 2 ->
    // 0 + 2e6 div 8 = 250000
    val sw = Ranking.rankBiasedOverlap(
      rk("x" -> 1L, "y" -> 2L), rk("y" -> 1L, "x" -> 2L),
      "id", "rank", depth = 2).collect().head
    assert(sw.getAs[Long]("overlap_full") == 2L)
    assert(sw.getAs[Long]("rbo_ppm") == 250000L)
    // disjoint lists: zero everywhere
    val dj = Ranking.rankBiasedOverlap(
      rk("x" -> 1L), rk("q" -> 1L), "id", "rank", depth = 3)
      .collect().head
    assert(dj.getAs[Long]("overlap_full") == 0L && dj.getAs[Long]("rbo_ppm") == 0L)
    // ranks beyond depth are ignored on BOTH sides
    val deep = Ranking.rankBiasedOverlap(
      rk("x" -> 1L, "far" -> 9L), rk("x" -> 1L, "far" -> 9L),
      "id", "rank", depth = 2).collect().head
    assert(deep.getAs[Long]("n_a") == 1L && deep.getAs[Long]("overlap_full") == 1L)
  }

  test("tokenizerFertility: hand counts and ppm floors") {
    import spark.implicits._
    // "aa bb": 2 words, 2 subwords, 5 chars; "abcdefgh": 1 word,
    // ceil(8/4)=2 subwords, 8 chars
    val df = Seq(("x", "aa bb"), ("x", "abcdefgh"), ("y", "zz"))
      .toDF("lang", "text")
    val out = Ranking.tokenizerFertility(df, col("lang"), col("text"))
      .collect().map(r => r.getString(0) -> r).toMap
    val x = out("x")
    assert(x.getAs[Long]("n_docs") == 2L && x.getAs[Long]("n_chars") == 13L)
    assert(x.getAs[Long]("n_words") == 3L && x.getAs[Long]("n_subwords") == 4L)
    assert(x.getAs[Long]("chars_per_subword_ppm") == 3250000L)
    assert(x.getAs[Long]("fertility_ppm") == 1333333L)
    val y = out("y")
    assert(y.getAs[Long]("n_subwords") == 1L &&
      y.getAs[Long]("fertility_ppm") == 1000000L)
  }

  test("burrowsDelta: z-gap distances on a 3-source toy corpus") {
    import spark.implicits._
    // A: "x x", B: "x y", C: "y y" — rates 1e6/0, 5e5/5e5, 0/1e6;
    // S_w = 1.5e12 for both words; term = 3·|Δr|/√S_w
    val df = Seq(("A", "x x"), ("B", "x y"), ("C", "y y"))
      .toDF("src", "text")
    val out = Ranking.burrowsDelta(df, col("src"), col("text"), k = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getAs[Double]("delta")).toMap
    val near = BigDecimal(3.0 * 500000 / math.sqrt(1.5e12))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val far = BigDecimal(3.0 * 1000000 / math.sqrt(1.5e12))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(("A", "B")) == near && out(("B", "C")) == near)
    assert(out(("A", "C")) == far && far > near)
    // identical sources: every gap zero
    val same = Seq(("A", "x y z"), ("B", "x y z")).toDF("src", "text")
    val rs = Ranking.burrowsDelta(same, col("src"), col("text"), k = 3)
      .collect().head
    assert(rs.getAs[Double]("delta") == 0.0d)
  }

  test("cronbachAlpha: duplicate items 1.0; cancelling pair 0; sparse zeros") {
    import spark.implicits._
    def alpha(rows: Seq[(Long, String, Long)]): Option[Double] = {
      val r = Ranking.cronbachAlpha(rows.toDF("u", "i", "x"),
        col("u"), col("i"), col("x")).collect().head
      if (r.isNullAt(r.fieldIndex("alpha"))) None
      else Some(r.getAs[Double]("alpha"))
    }
    // item b duplicates item a exactly -> perfectly consistent
    val dup = Seq((1L, "a", 1L), (2L, "a", 2L), (3L, "a", 3L),
      (1L, "b", 1L), (2L, "b", 2L), (3L, "b", 3L))
    assert(alpha(dup).contains(1.0d))
    // S_items == S_tot -> alpha 0: x_a=[0,1,0,1], x_b=[0,1,1,0]
    val zero = Seq((1L, "a", 0L), (2L, "a", 1L), (3L, "a", 0L), (4L, "a", 1L),
      (1L, "b", 0L), (2L, "b", 1L), (3L, "b", 1L), (4L, "b", 0L))
    assert(alpha(zero).contains(0.0d))
    // anti-items: every unit total identical -> S_tot = 0 -> null
    val anti = Seq((1L, "a", 0L), (2L, "a", 1L), (1L, "b", 1L), (2L, "b", 0L))
    assert(alpha(anti).isEmpty)
    // sparse convention: unit 3 has no item-b cell -> scores 0 there
    // S_a = S_b = 6, S_tot = 6 -> alpha = 2·(6−12)/6 = −2
    val sparse = Seq((1L, "a", 1L), (2L, "a", 2L), (3L, "a", 3L),
      (1L, "b", 1L), (2L, "b", 2L))
    assert(alpha(sparse).contains(-2.0d))
  }

  test("iccOneWay: perfect panels 1.0; pure rater noise hits -1/(k-1)") {
    import spark.implicits._
    // two units, two raters in perfect agreement
    val perfect = Seq((10L, 1L), (10L, 1L), (20L, 5L), (20L, 5L))
      .toDF("u", "x")
    val rp = Ranking.iccOneWay(perfect, col("u"), col("x"), raters = 2)
      .collect().head
    assert(rp.getAs[Long]("n_units") == 2L && rp.getAs[Long]("n_dropped") == 0L)
    assert(rp.getAs[Double]("icc") == 1.0d)
    // identical unit totals, all variance within -> ICC = −1/(k−1) = −1
    val noise = Seq((10L, 1L), (10L, 5L), (20L, 5L), (20L, 1L))
      .toDF("u", "x")
    val rn = Ranking.iccOneWay(noise, col("u"), col("x"), raters = 2)
      .collect().head
    assert(rn.getAs[Double]("icc") == -1.0d)
    // an incomplete panel is dropped, not silently kept
    val mixed = Seq((10L, 1L), (10L, 1L), (20L, 5L), (20L, 5L), (30L, 9L))
      .toDF("u", "x")
    val rm = Ranking.iccOneWay(mixed, col("u"), col("x"), raters = 2)
      .collect().head
    assert(rm.getAs[Long]("n_units") == 2L && rm.getAs[Long]("n_dropped") == 1L)
    // all ratings identical everywhere: denominator 0 -> null
    val flat = Seq((10L, 3L), (10L, 3L), (20L, 3L), (20L, 3L)).toDF("u", "x")
    val rf = Ranking.iccOneWay(flat, col("u"), col("x"), raters = 2)
      .collect().head
    assert(rf.isNullAt(rf.fieldIndex("icc")))
  }

  test("textRank: path-graph integer pagerank closed form; short words cut") {
    // "alpha beta beta gamma xy beta": self-pair and <3-char bigrams
    // drop, leaving the path alpha—beta—gamma. 3 scaled-integer
    // pagerank iterations on the path give exactly
    // beta = 1741625000, alpha = gamma = 629187500 (hand-unrolled).
    val docs = Seq("alpha beta beta gamma xy beta").toDF("text")
    val out = Ranking.textRank(docs, "text", iters = 3, k = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(out == Seq("beta" -> 1741625000L, "alpha" -> 629187500L,
      "gamma" -> 629187500L))
    graft.core.CacheRegistry.unpersistAll()
  }
}
