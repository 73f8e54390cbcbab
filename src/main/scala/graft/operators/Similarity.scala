package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over an embedding column.
  * (North-star extension; the reference has no vector surface.)
  *
  * Scale design: the query set is always the broadcast side — corpus
  * partitions stream once past an in-memory query table, so brute force
  * is a single corpus scan regardless of corpus size. The LSH variant
  * prunes the per-query candidate set by joining on hyperplane buckets,
  * trading recall for a much smaller scoring join at 100 TB.
  */
object Similarity {

  /** Exact top-k cosine neighbors for each query vector.
    * `queries` MUST be small (driver-broadcastable); corpus any size.
    */
  def bruteForceTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
    val scored = c.join(q, col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("q_vec"), col("c_vec")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), round(col("cosine"), 4).as("cosine"), col("rank"))
  }

  /** LSH-bucketed ANN: both sides keyed by sign-random-projection
    * buckets over `tables` independent hash tables; candidates scored
    * exactly, top-k per query. Recall < 1 by construction; raise
    * `tables` or lower `bits` to trade compute for recall.
    */
  def lshTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      bits: Int = 8,
      tables: Int = 4): DataFrame = {
    def bucketize(df: DataFrame, id: String, vec: String) =
      df.select(
        col(idCol).as(id),
        col(vecCol).as(vec),
        explode(array((0 until tables).map { t =>
          struct(lit(t).as("tbl"), hyperplaneBucket(col(vecCol), bits, seed = 7L + t).as("bucket"))
        }: _*)).as("tb"))
        .select(col(id), col(vec), col("tb.tbl"), col("tb.bucket"))

    val q = broadcast(bucketize(queries, "query_id", "q_vec"))
    val c = bucketize(corpus, "neighbor_id", "c_vec")
    val cand = c.join(q, Seq("tbl", "bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("cosine", cosine(col("q_vec"), col("c_vec")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    cand
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), round(col("cosine"), 4).as("cosine"), col("rank"))
  }

  /** Reusable IVF (inverted-file) index: coarse-quantizer centroids
    * (tiny: nlist × dim, always broadcast) plus the corpus with its
    * cell assignment (persisted — released via CacheRegistry like every
    * other staged intermediate). Build once, serve many query batches;
    * at 100 TB the `assigned` frame is what you'd write to
    * cell-partitioned parquet so probes prune at scan time.
    */
  final case class IvfIndex(centroids: DataFrame, assigned: DataFrame, nlist: Int)

  /** Train the quantizer on a bounded driver-side sample (default 4096
    * vectors via `takeSample` — two cheap projected passes, never a
    * full-corpus k-means), then assign every corpus vector to its cell
    * in one distributed transform.
    */
  def buildIvfIndex(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nlist: Int = 16,
      trainSample: Int = 4096,
      seed: Long = 42L): IvfIndex = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    require(nlist >= 1, s"nlist must be >= 1, got $nlist")
    require(trainSample >= nlist, s"trainSample ($trainSample) must be >= nlist ($nlist)")

    val corpusVec = corpus.select(
      col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"),
      array_to_vector(col(vecCol).cast("array<double>")).as("features"))

    val spark = corpus.sparkSession
    import spark.implicits._
    // Bounded quantizer training set: k-means iterations run over at
    // most `trainSample` vectors on one partition instead of 10 full
    // corpus scans. Deterministic for a fixed corpus + partitioning.
    val sample = corpusVec.select(col("features"))
      .rdd.map(_.getAs[org.apache.spark.ml.linalg.Vector](0))
      .takeSample(withReplacement = false, trainSample, seed)
    val k = math.min(nlist, sample.length)
    require(k >= 1, "buildIvfIndex: corpus is empty")
    val trainDf = spark.createDataFrame(sample.toIndexedSeq.map(Tuple1(_))).toDF("features")
    val model = new KMeans().setK(k).setSeed(seed).setMaxIter(10).fit(trainDf)

    val assigned = graft.core.CacheRegistry.persist(
      model.transform(corpusVec)
        .select(col("neighbor_id"), col("c_vec"), col("prediction").as("cell")),
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // centroids kept as double; the query side is cast to match so the
    // probe works for both array<float> and array<double> vectors.
    val centroids = model.clusterCenters.zipWithIndex.toSeq
      .map { case (c, i) => (i, c.toArray) }
      .toDF("cell", "centroid")
    IvfIndex(centroids, assigned, k)
  }

  /** Probe an [[IvfIndex]]: queries pick their `nprobe` nearest
    * centroids (broadcast × broadcast, driver-cheap), candidates are an
    * equi-join on cell id — the shuffle carries each probed corpus
    * vector once. Recall < 1 by construction; raise `nprobe` to trade
    * compute for recall.
    */
  def ivfQuery(
      index: IvfIndex,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nprobe: Int = 4): DataFrame = {
    val probed = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec")))
      .crossJoin(broadcast(index.centroids))
      .withColumn("c_dist", cosine(col("q_vec").cast("array<double>"), col("centroid")))
      .withColumn("c_rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("c_dist").desc, col("cell"))))
      .where(col("c_rank") <= nprobe)
      .select(col("query_id"), col("q_vec"), col("cell"))

    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    index.assigned.join(broadcast(probed), Seq("cell"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("q_vec"), col("c_vec")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), round(col("cosine"), 4).as("cosine"), col("rank"))
  }

  /** One-shot IVF ANN: build (sampled training) + probe. Prefer
    * [[buildIvfIndex]] + [[ivfQuery]] when serving repeated batches —
    * the index is the expensive part and it is reusable.
    */
  def ivfTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nlist: Int = 16,
      nprobe: Int = 4,
      seed: Long = 42L): DataFrame =
    ivfQuery(buildIvfIndex(corpus, idCol, vecCol, nlist, seed = seed), queries, idCol, vecCol, k, nprobe)

  /** Count of near-neighbor pairs above a cosine threshold (corpus
    * self-similarity profile) — brute force within hyperplane buckets.
    */
  def thresholdPairs(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double): DataFrame =
    Dedup.embeddingCosinePairs(corpus, idCol, vecCol, threshold)
}
