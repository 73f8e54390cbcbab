package graft.operators

import graft.functions.InterleaveBits
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.functions._

/** Data-layout clustering: multi-dimensional (Z-order) file layout.
  *
  * At 100 TB the scan is won or lost before the first executor runs:
  * parquet min/max footer stats prune whole files, but only if rows
  * that are close in the predicate dimensions actually sit in the
  * same files. Sorting by one column clusters one dimension;
  * [[zorderBy]] range-partitions and sorts by an interleaved-bit
  * Morton key instead, so EVERY participating dimension gets locality
  * and predicates on any subset of the keys prune.
  */
object Layout {

  /** The Morton key: interleave the low `bits` of each column (col 0
    * owns the least-significant lane). Inputs are cast to long and
    * masked; normalize/bucket skewed domains first.
    */
  def zValue(bits: Int, cols: Column*): Column =
    GraftBridge.column(
      InterleaveBits(cols.map(c => GraftBridge.expression(c.cast("long"))).toSeq, bits))

  /** Small-file compaction (the OPTIMIZE half without the clustering):
    * size the partition count so each output file lands near
    * `targetRowsPerFile`. One count action; at 100 TB the small-file
    * problem is the metadata + open-cost killer this exists for —
    * thousands of drip-fed streaming files become
    * ceil(rows/target) right-sized ones.
    */
  def compact(df: DataFrame, targetRowsPerFile: Long): DataFrame = {
    require(targetRowsPerFile > 0, s"targetRowsPerFile must be positive")
    val n = df.count()
    val parts = math.max(1L, (n + targetRowsPerFile - 1) / targetRowsPerFile)
    require(parts <= Int.MaxValue,
      s"compact: ceil($n / $targetRowsPerFile) = $parts exceeds the partition limit — raise targetRowsPerFile")
    df.repartition(parts.toInt)
  }

  /** Cluster `df` along the Z-curve of `cols`: compute `zval`,
    * range-partition on it (`numPartitions` when given, else the
    * session shuffle default) and sort each partition by it. Writing
    * the result produces files whose footer ranges tile the curve —
    * the layout a lakehouse OPTIMIZE ZORDER BY pass would emit.
    */
  def zorderBy(df: DataFrame, bits: Int, cols: Seq[Column],
      numPartitions: Option[Int] = None): DataFrame = {
    val withZ = df.withColumn("zval", zValue(bits, cols: _*))
    val ranged = numPartitions match {
      case Some(p) => withZ.repartitionByRange(p, col("zval"))
      case None => withZ.repartitionByRange(col("zval"))
    }
    ranged.sortWithinPartitions(col("zval"))
  }

  /** Rendezvous (highest-random-weight) sharding: assign each key to
    * `argmax_i md5("rdv:<i>:<key>")` over the shard ids. The property
    * plain `hash(key) mod n` lacks: resizing n → n−1 moves ONLY the
    * keys whose winning shard was removed (~1/n of them) — every
    * other key's argmax is untouched. That is the difference between
    * re-ingesting 1/n of a 100 TB corpus and re-ingesting all of it
    * when a shard/bucket/consumer count changes.
    *
    * Row-local codegen builtins (md5/conv/greatest) — no shuffle, no
    * state, and the md5-derived 32-bit scores are reproducible by any
    * engine (same contract as the CMS bucket and doc-embed hashes).
    * Ties (p ≈ 2⁻³²) go to the LOWEST shard id, pinned via the
    * negated-id struct compare.
    */
  def rendezvousShard(df: DataFrame, keyCol: Column, shards: Int,
      shardCol: String = "shard"): DataFrame = {
    require(shards >= 1, s"rendezvousShard: shards must be >= 1, got $shards")
    if (shards == 1) df.withColumn(shardCol, lit(0))
    else {
      val ks = keyCol.cast("string")
      val candidates = (0 until shards).map { i =>
        struct(
          conv(substring(md5(concat(lit(s"rdv:$i:"), ks)), 1, 8), 16, 10)
            .cast("long").as("s"),
          lit(-i).as("negShard"))
      }
      df.withColumn(shardCol, -greatest(candidates: _*).getField("negShard"))
    }
  }
}
