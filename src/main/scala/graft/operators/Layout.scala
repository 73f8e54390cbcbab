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
}
