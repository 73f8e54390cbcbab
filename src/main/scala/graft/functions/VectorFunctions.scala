package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import org.apache.spark.sql.GraftBridge

/** Dense-vector column functions over `array<float>` embedding columns.
  * The hot kernels (dot, cosine, hyperplane bucketing) are custom
  * codegen Expressions ([[VectorExpressions]]) — a fused primitive
  * loop inside whole-stage codegen, no per-element lambda dispatch.
  * The `zip_with`/`aggregate` higher-order forms are kept (suffixed
  * Hof) as the dependency-free reference implementations.
  */
object VectorFunctions {

  /** Dot product of two float-array columns (computed in double). */
  def dot(a: Column, b: Column): Column =
    GraftBridge.column(DotProduct(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Reference HOF implementation of [[dot]] (bit-identical). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  /** L2 norm. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in [-1, 1]; 0 when either vector is zero.
    * One fused codegen pass (dot + both norms).
    */
  def cosine(a: Column, b: Column): Column =
    GraftBridge.column(CosineSimilarity(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Reference HOF implementation of [[cosine]] (bit-identical). */
  def cosineHof(a: Column, b: Column): Column = {
    val denom = sqrt(dotHof(a, a)) * sqrt(dotHof(b, b))
    when(denom === 0.0, lit(0.0)).otherwise(dotHof(a, b) / denom)
  }

  /** Squared euclidean distance. */
  def sqDist(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double")
        d * d
      }),
      lit(0.0),
      (acc, x) => acc + x)

  /** Sign-random-projection (SimHash-for-vectors) signature: `bits`
    * pseudo-random hyperplanes derived deterministically from a
    * splitmix64 of (seed, planeIdx, dimIdx) — no stored plane matrix,
    * so executors need no broadcast and the signature is reproducible
    * run-to-run. Returns a bucket id in [0, 2^bits). Fused codegen
    * loop over all planes (one array traversal per plane, zero
    * allocation).
    */
  def hyperplaneBucket(vec: Column, bits: Int, seed: Long = 42L): Column =
    GraftBridge.column(
      HyperplaneBucket(GraftBridge.expression(vec), GraftBridge.expression(lit(seed)), bits))

  /** Nearest-centroid cell id (squared euclidean, ties to the lowest
    * cell) — IVF assignment as one fused codegen loop; the centroid
    * table rides along as a reference object, no join or ML pass.
    */
  def nearestCentroid(vec: Column, centroids: Array[Array[Double]]): Column =
    GraftBridge.column(NearestCentroid(GraftBridge.expression(vec), centroids))

  /** The `p` nearest cell ids, ascending by distance — multi-probe
    * assignment (a vector participates in p cells, so near-dup pairs
    * that straddle one cell boundary still share a cell).
    */
  def nearestCentroids(vec: Column, centroids: Array[Array[Double]], p: Int): Column =
    GraftBridge.column(NearestCentroids(GraftBridge.expression(vec), centroids, p))

  /** Product-quantization codes: per contiguous subspace, the index of
    * the nearest codeword (one fused scan, no slicing).
    */
  def pqEncode(vec: Column, codebooks: Array[Array[Array[Double]]]): Column =
    GraftBridge.column(PqEncode(GraftBridge.expression(vec), codebooks))

  /** Per-query ADC lookup table (subspace-major dot products against
    * every codeword).
    */
  def pqLut(vec: Column, codebooks: Array[Array[Array[Double]]]): Column =
    GraftBridge.column(PqLut(GraftBridge.expression(vec), codebooks))

  /** ADC lookup sum Σ_j lut[j·kSub + codes[j]] over a subspace-major
    * lookup table.
    */
  def codeLookupSum(codes: Column, lut: Column, kSub: Int): Column =
    GraftBridge.column(
      CodeLookupSum(GraftBridge.expression(codes), GraftBridge.expression(lut), kSub))

  /** Bloom-filter membership probe (probe-side kernel of
    * bloomPrunedJoin).
    */
  def bloomMightContain(key: Column, bloom: org.apache.spark.util.sketch.BloomFilter): Column =
    GraftBridge.column(BloomMightContain(GraftBridge.expression(key), bloom))
}
