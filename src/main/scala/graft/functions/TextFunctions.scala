package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for document pipelines. All are pure
  * `functions._` compositions — codegen'd, no UDFs — so they inline into
  * whole-stage codegen and never break predicate pushdown around them.
  * (Generalizes the reference's hand-rolled words-count pipeline,
  * reference: test/examples/words_count_test.exs:11-41.)
  */
object TextFunctions {

  /** Whitespace tokenization. `split(trim(x), "\s+")`. */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  /** Token count (whitespace tokenizer). */
  def tokenCount(c: Column): Column = size(tokens(c))

  /** Word tokens after lowercasing and punctuation strip — the
    * words-count tokenizer (split on non-word runs).
    *
    * `array_remove(_, "")` rather than a `filter(len > 0)` lambda:
    * identical result (split never yields nulls, so the only
    * non-words are empty edge tokens), but higher-order functions are
    * CodegenFallback — one lambda here would knock EVERY downstream
    * text projection (shingles, sketches, quality stats) out of
    * whole-stage codegen (pinned by PlanShapeSpec).
    */
  def words(c: Column): Column =
    array_remove(split(lower(c), "\\W+"), "")

  /** A BPE-ish subword count approximation: words + digit runs counted
    * separately, long words counted as ceil(len/4) subtokens — a cheap,
    * deterministic stand-in for a real tokenizer's token count.
    * Fused kernel; [[subwordCountApproxHof]] is the aggregate-HOF
    * reference form.
    */
  def subwordCountApprox(c: Column): Column =
    HashFunctions.subwordCountFused(words(c))

  /** Composable HOF REFERENCE form of [[subwordCountApprox]]. */
  def subwordCountApproxHof(c: Column): Column =
    aggregate(
      words(c),
      lit(0L),
      (acc, w) => acc + ceil(length(w).cast("double") / lit(4.0)).cast("long"))

  /** Whitespace-normalized form: lowercase, collapse whitespace, trim. */
  def normalize(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  /** Document fingerprint: md5 of the normalized text. Stable across
    * engines (md5 is standardized), usable as an exact-dedup key.
    */
  def fingerprint(c: Column): Column = md5(normalize(c))

  /** Word-level n-gram shingles ("a b c", n=2 → ["a b","b c"]) — the
    * fused codegen kernel [[HashFunctions.wordShinglesFused]]: one
    * loop per row, the input array evaluated once, and the projection
    * stays inside whole-stage codegen (the HOF reference form below is
    * a CodegenFallback lambda that would break the stage).
    */
  def wordShinglesFromWords(ws: Column, n: Int): Column =
    HashFunctions.wordShinglesFused(ws, n)

  /** Composable HOF REFERENCE form of [[wordShinglesFromWords]]
    * (`sequence` + `transform` + `slice`), kept for the bit-identity
    * spec. PERFORMANCE hazard of this form: a non-attribute `ws`
    * argument is re-evaluated once per shingle inside the lambda —
    * O(words²) per document — which is one more reason the fused
    * kernel is the production path.
    */
  def wordShinglesFromWordsHof(ws: Column, n: Int): Column =
    when(size(ws) < n, array(array_join(ws, " ")))
      .otherwise(
        transform(
          sequence(lit(1), size(ws) - lit(n - 1)),
          i => array_join(slice(ws, i, lit(n)), " ")))

  def wordShingles(c: Column, n: Int): Column = wordShinglesFromWords(words(c), n)

  /** Character k-shingles of the normalized text (fused kernel;
    * [[charShinglesHof]] is the transform-HOF reference form).
    */
  def charShingles(c: Column, k: Int): Column =
    HashFunctions.charShinglesFused(normalize(c), k)

  /** Composable HOF REFERENCE form of [[charShingles]]. */
  def charShinglesHof(c: Column, k: Int): Column = {
    val s = normalize(c)
    when(length(s) <= k, array(s))
      .otherwise(
        transform(sequence(lit(1), length(s) - lit(k - 1)), i => substring(s, i, lit(k))))
  }

  /** Punctuation character count. */
  def punctCount(c: Column): Column =
    length(c) - length(regexp_replace(c, "[.,;:!?]", ""))

  private val Stopwords =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  /** Fraction of tokens that are common English stopwords (fused
    * membership count; [[stopwordRatioHof]] is the filter-HOF
    * reference form).
    */
  def stopwordRatio(c: Column): Column = {
    val ws = words(c)
    when(size(ws) === 0, lit(0.0))
      .otherwise(
        HashFunctions.stopwordCountFused(ws, Stopwords).cast("double") / size(ws))
  }

  /** Composable HOF REFERENCE form of [[stopwordRatio]]. */
  def stopwordRatioHof(c: Column): Column = {
    val ws = words(c)
    val stops = filter(ws, w => w.isInCollection(Stopwords))
    when(size(ws) === 0, lit(0.0)).otherwise(size(stops).cast("double") / size(ws))
  }

  /** Heuristic quality score in [0,1]: rewards mid-length documents,
    * normal word lengths, and some-but-not-all stopwords. Deterministic
    * arithmetic only (oracle-reproducible).
    */
  def qualityScore(c: Column): Column = {
    val nWords = size(words(c)).cast("double")
    val lenScore = least(nWords / lit(50.0), lit(1.0))
    val avgWordLen =
      when(nWords === 0, lit(0.0)).otherwise(length(regexp_replace(c, "\\s", "")) / nWords)
    val wordLenScore = when(avgWordLen.between(3.0, 10.0), lit(1.0)).otherwise(lit(0.5))
    val stopScore = when(stopwordRatio(c).between(0.01, 0.6), lit(1.0)).otherwise(lit(0.5))
    round((lenScore + wordLenScore + stopScore) / lit(3.0), 4)
  }

  /** Stopword-profile language ID. Scores a handful of languages by
    * counting language-specific function words; returns the argmax or
    * 'und' when nothing matches. Regex-count based — runs entirely in
    * codegen, no dictionary broadcast needed.
    */
  def langId(c: Column): Column = {
    val lc = lower(c)
    def score(wordsRe: String): Column = regexp_count(lc, lit("\\b(" + wordsRe + ")\\b"))
    val en = score("the|and|of|to|is|in|that|it")
    val es = score("el|la|los|las|que|de|en|es|una?")
    val de = score("der|die|das|und|ist|nicht|ein|zu")
    val fr = score("le|les|des|est|une?|et|dans|que")
    val best = greatest(en, es, de, fr)
    when(best === 0, lit("und"))
      .when(en === best, lit("en"))
      .when(es === best, lit("es"))
      .when(de === best, lit("de"))
      .otherwise(lit("fr"))
  }

  /** Flesch-style readability readout, engine-portable: sentences are
    * non-empty `[.!?]+` segments, words come from [[words]], and the
    * syllable stand-in is vowel-group count (`[aeiouy]+` runs) — the
    * standard dictionary-free approximation. All three counts are
    * exact integers; the score is a fixed-shape double expression
    * (206.835 − 1.015·w/s − 84.6·syl/w, rounded to 4), so a second
    * engine reproduces it bit-for-bit. NULL when the text has no
    * sentence or no word. Pure codegen — regex counts, no UDF.
    */
  def sentenceCount(c: Column): Column =
    size(filter(split(c, "[.!?]+"), s => length(trim(s)) > 0))

  def syllableCountApprox(c: Column): Column =
    size(regexp_extract_all(lower(c), lit("[aeiouy]+"), lit(0)))

  def readability(c: Column): Column = {
    val w = size(words(c)).cast("double")
    val s = sentenceCount(c).cast("double")
    val syl = syllableCountApprox(c).cast("double")
    when(w > 0 && s > 0,
      round(lit(206.835) - lit(1.015) * (w / s) - lit(84.6) * (syl / w), 4))
  }

  /** Rolling (polynomial) document fingerprint of the normalized text:
    * h = (h * 31 + code(c_i)) mod 1_000_000_007 — order-sensitive,
    * cheap, computed via aggregate over the char codes (codegen path).
    * The explicit prime modulus keeps every intermediate < 2^35, so the
    * same value is reproducible in any engine with 64-bit ints (no
    * silent two's-complement wraparound semantics required).
    */
  val RollingHashMod = 1000000007L

  /** Fused kernel; [[rollingHashHof]] is the split/aggregate reference
    * form.
    */
  def rollingHash(c: Column): Column =
    HashFunctions.rollingHashFused(normalize(c))

  /** Composable HOF REFERENCE form of [[rollingHash]]. */
  def rollingHashHof(c: Column): Column = {
    val chars = split(normalize(c), "")
    aggregate(
      filter(chars, ch => length(ch) > 0),
      lit(0L),
      (acc, ch) => pmod(acc * lit(31L) + ascii(ch).cast("long"), lit(RollingHashMod)))
  }
}
