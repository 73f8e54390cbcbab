package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed k-means (Lloyd's) over an embedding column.
  *
  * [[Similarity.trainCentroids]] trains coarse quantizers driver-local
  * over a bounded sample — the right cost profile for IVF/SemDeDup cell
  * layouts. This operator is the full-corpus refinement for when the
  * centroids themselves are the product (corpus clustering, topic
  * buckets, balanced sharding): sampled k-means++ init, then
  * distributed Lloyd's iterations where
  *
  *  - assignment is the fused codegen `NearestCentroid` expression
  *    (centroids ride into codegen as a reference object — no join,
  *    no ML pipeline, no netlib), and
  *  - the mean recompute is `posexplode → groupBy(cell, pos) → sum/n`,
  *    a plain partial-aggregating shuffle whose keyspace is k × dim
  *    rows regardless of corpus size.
  *
  * One action per iteration; the corpus is rescanned each round
  * (classic Lloyd's) — persist the input upstream if it is a derived
  * pipeline. Vectors whose dimension differs from the trained majority
  * dimension get a null cell at assignment and drop out of the stats,
  * same contract as IVF. Empty cells keep their previous centroid.
  */
object Clustering {

  final case class KmeansResult(centroids: Array[Array[Double]], iters: Int, lastShift: Double)

  def kmeans(
      df: DataFrame,
      vecCol: String,
      k: Int,
      maxIter: Int = 10,
      tol: Double = 1e-4,
      trainSample: Int = 4096,
      seed: Long = 42L): KmeansResult = {
    require(k >= 1, s"kmeans: k must be >= 1, got $k")
    require(maxIter >= 0, s"kmeans: maxIter must be >= 0, got $maxIter")
    var cents = Similarity.trainCentroids(df, vecCol, k, trainSample, seed)
    val dim = cents.head.length
    var iter = 0
    var shift = Double.MaxValue
    while (iter < maxIter && shift > tol) {
      val stats = assign(df.select(col(vecCol)), vecCol, cents)
        .where(col("cell").isNotNull)
        .select(col("cell"), posexplode(col(vecCol).cast("array<double>")).as(Seq("pos", "x")))
        .groupBy(col("cell"), col("pos"))
        .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
        .collect()
      val next = cents.map(_.clone())
      val counts = new Array[Long](cents.length)
      stats.foreach { r =>
        val c = r.getInt(0); val p = r.getInt(1)
        next(c)(p) = r.getDouble(2) / r.getLong(3)
        counts(c) = r.getLong(3)
      }
      shift = 0.0
      var c = 0
      while (c < cents.length) {
        if (counts(c) > 0L) {
          var d2 = 0.0
          var p = 0
          while (p < dim) {
            val dd = next(c)(p) - cents(c)(p); d2 += dd * dd; p += 1
          }
          shift = math.max(shift, math.sqrt(d2))
        } // empty cell: centroid unchanged, contributes no shift
        c += 1
      }
      cents = next
      iter += 1
    }
    KmeansResult(cents, iter, if (shift == Double.MaxValue) 0.0 else shift)
  }

  /** Adds an integer `cell` column = index of the nearest centroid
    * (null for dimension-mismatched or null vectors).
    */
  def assign(df: DataFrame, vecCol: String, centroids: Array[Array[Double]]): DataFrame =
    df.withColumn("cell", VectorFunctions.nearestCentroid(col(vecCol), centroids))
}
