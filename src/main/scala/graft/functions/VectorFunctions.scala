package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector column functions over `array<float>` embedding columns.
  * Built on `zip_with`/`aggregate` higher-order functions — evaluated
  * natively on Tungsten rows, no UDF serialization, usable inside any
  * join/window without breaking the plan.
  */
object VectorFunctions {

  /** Dot product of two float-array columns (computed in double). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  /** L2 norm. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in [-1, 1]; 0 when either vector is zero. */
  def cosine(a: Column, b: Column): Column = {
    val denom = l2Norm(a) * l2Norm(b)
    when(denom === 0.0, lit(0.0)).otherwise(dot(a, b) / denom)
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
    * pseudo-random hyperplanes derived deterministically from
    * xxhash64(planeIdx, dimIdx) — no stored plane matrix, so executors
    * need no broadcast and the signature is reproducible run-to-run.
    * Returns an int bucket id in [0, 2^bits).
    */
  def hyperplaneBucket(vec: Column, bits: Int, seed: Long = 42L): Column = {
    val planeDots = (0 until bits).map { p =>
      // plane weight for (p, dim i): map hash to {-1, +1}
      val weighted = zip_with(
        vec,
        sequence(lit(0), size(vec) - 1),
        (x, i) =>
          x.cast("double") *
            when(pmod(xxhash64(lit(seed), lit(p), i), lit(2)) === 0, lit(1.0))
              .otherwise(lit(-1.0)))
      aggregate(weighted, lit(0.0), (acc, x) => acc + x)
    }
    planeDots.zipWithIndex
      .map { case (d, p) => when(d >= 0, lit(1L << p)).otherwise(lit(0L)) }
      .reduce(_ + _)
  }
}
