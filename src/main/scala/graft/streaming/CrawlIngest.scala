package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

import graft.functions.UrlFunctions._
import graft.operators.Dedup
import graft.sources.Warc

/** The production streaming raw-crawl ingestion pipeline, packaged:
  *
  * {{{
  *   readStream(binaryFile over a landing dir)
  *     → Warc.warcRecords                  (narrow record split)
  *     → http_body / http_header           (envelope split; bare-html
  *                                          payloads fall back raw)
  *     → charset chain → html_text         (header beats meta beats
  *                                          utf-8)
  *     → url_normalize
  *     → foreachBatch: drop against the PARQUET standing index
  *       (url-exact + fingerprint-exact + MinHash-band near-dup via
  *       [[Dedup.dropAgainstIndex]]), append survivors to the corpus
  *       dir, append their index rows to the index dir.
  * }}}
  *
  * ALL dedup state lives in the two parquet directories — bounded by
  * the DISTINCT documents of the standing corpus, never by feed
  * length, and never in driver memory (the StreamingSpec harness
  * that proved batch-parity with a driver-side set was the prototype;
  * this is the composition a cluster actually runs). The standing
  * corpus is never rescanned: each batch anti-joins the index on
  * short keys (url, fingerprint, band/bucket) exactly like
  * [[Dedup.dropAgainstIndex]]'s day-2 contract.
  *
  * Restart safety: outputs are partitioned by `batch_id` and written
  * with DYNAMIC partition overwrite, so a replayed micro-batch
  * rewrites its own partitions instead of appending twice — and the
  * dedup joins EXCLUDE the replayed batch's own index partition, so
  * a replay cannot drop its own rows as duplicates of themselves.
  *
  * Scale shape: everything before foreachBatch is a narrow map over
  * landing files; inside the batch the only shuffles are the
  * short-key anti-joins and the band explode of the batch's OWN
  * documents. At 100 TB the index dir is additionally partitionable
  * by band/bucket (see [[Dedup.buildDedupIndex]]).
  */
object CrawlIngest {

  /** binaryFile source schema (fixed by the format). */
  val binarySchema: StructType = StructType(Seq(
    StructField("path", StringType),
    StructField("modificationTime", TimestampType),
    StructField("length", LongType),
    StructField("content", BinaryType)))

  /** Canonicalized documents of a WARC record frame — the shared
    * record→document transform of the streaming pipeline and its
    * batch twin: envelope split with raw fallback, charset chain,
    * visible text, canonical url. Emits (path, record_idx, url, body);
    * rows whose url or body reject to NULL are dropped (a record with
    * no parseable target/text feeds nothing downstream).
    */
  def recordsToDocs(records: DataFrame): DataFrame = {
    val payload = col("payload")
    // a payload that is not an HTTP message (bare html, or a
    // non-response record) decodes as-is — but an HTTP message whose
    // BODY is undecodable (Content-Encoding: br, corrupt gzip,
    // malformed chunking) must REJECT, not fall back: the raw
    // envelope (status line + headers + compressed binary) through
    // the charset chain would inject garbage documents into the
    // corpus and the dedup index. "Not an HTTP message" is exactly
    // http_status = NULL, so the fallback fires only there.
    val bodyBin = coalesce(httpBody(payload),
      when(httpStatus(payload).isNull, payload))
    val charset = coalesce(
      charsetParam(httpHeader(payload, lit("content-type"))),
      sniffCharset(bodyBin), lit("utf-8"))
    records.select(
      col("path"), col("record_idx"),
      urlNormalize(col("target_uri")).as("url"),
      htmlText(decodeText(bodyBin, charset)).as("body"))
      .where(col("url").isNotNull && col("body").isNotNull)
  }

  /** One micro-batch against the standing parquet index; exposed for
    * the spec's determinism/idempotency assertions. See the object
    * scaladoc for the contract.
    */
  private[streaming] def ingestBatch(batch: DataFrame, batchId: Long,
      corpusDir: String, indexDir: String, shingleSize: Int,
      numHashes: Int, bands: Int): Unit = {
    val spark = batch.sparkSession
    // batch-internal url dedup: FIRST occurrence in (path, record_idx)
    // order — deterministic because that pair is unique per record
    val w = Window.partitionBy(col("url"))
      .orderBy(col("path"), col("record_idx"))
    val urlFirsts = batch.withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1).drop("_rn")
    // batch-internal NEAR-dup guard: among url-unique rows, the first
    // occurrence per exact content fingerprint wins — without this,
    // two same-batch documents with identical text at different urls
    // would BOTH enter the index, breaking the "bounded by DISTINCT
    // documents" contract. (Band-level intra-batch near-dups are
    // deliberately deferred to day-2: the next batch's index join
    // catches them, and verifying bands within the batch would cost a
    // second band shuffle per micro-batch.)
    val wFp = Window
      .partitionBy(graft.functions.TextFunctions.fingerprint(col("body")))
      .orderBy(col("path"), col("record_idx"))
    val firsts = urlFirsts.withColumn("_rn", row_number().over(wFp))
      .where(col("_rn") === 1).drop("_rn")
    val fs = new org.apache.hadoop.fs.Path(indexDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val standing: Option[DataFrame] =
      if (fs.exists(new org.apache.hadoop.fs.Path(indexDir)))
        // exclude THIS batch's own partition: on a replay the index
        // already carries batch N's rows, and deduping batch N against
        // them would drop every row of the replay (data loss on the
        // overwrite below)
        Some(spark.read.parquet(indexDir)
          .where(col("batch_id") =!= lit(batchId)))
      else None
    val survivors = standing match {
      case None => firsts
      case Some(idx) =>
        val notUrlDup = firsts.join(
          idx.select(col("id").as("url")).distinct(), Seq("url"), "left_anti")
        Dedup.dropAgainstIndex(notUrlDup, idx, "url", "body",
          shingleSize, numHashes, bands)
    }
    // one materialization feeds both writes (recomputing the plan
    // twice would re-read the index and re-shuffle the anti-joins)
    val surv = survivors.localCheckpoint(true)
    // an all-duplicate (or all-unparseable) micro-batch writes NOTHING:
    // a zero-row partitioned write would create the corpus/index dirs
    // with only _SUCCESS, and the NEXT batch's schema inference over
    // the empty index dir would throw and kill the streaming query
    if (surv.isEmpty) return
    val dynamic = Map("partitionOverwriteMode" -> "dynamic")
    surv.withColumn("batch_id", lit(batchId))
      .write.mode("overwrite").options(dynamic)
      .partitionBy("batch_id").parquet(corpusDir)
    Dedup.buildDedupIndex(surv, "url", "body", shingleSize, numHashes, bands)
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite").options(dynamic)
      .partitionBy("batch_id").parquet(indexDir)
  }

  /** Start the pipeline: returns the running query (callers own its
    * lifecycle). `corpusDir` accumulates survivor documents
    * (path, record_idx, url, body, batch_id); `indexDir` accumulates
    * their [[Dedup.buildDedupIndex]] rows.
    */
  def start(spark: SparkSession, landingDir: String, corpusDir: String,
      indexDir: String, checkpointDir: String, glob: String = "*.warc",
      shingleSize: Int = 3, numHashes: Int = 64, bands: Int = 16): StreamingQuery = {
    val stream = spark.readStream.format("binaryFile")
      .option("pathGlobFilter", glob).schema(binarySchema)
      .load(landingDir)
    val docs = recordsToDocs(Warc.warcRecords(stream, "path", "content"))
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(batch, batchId, corpusDir, indexDir,
          shingleSize, numHashes, bands)
      }
      .start()
  }
}
