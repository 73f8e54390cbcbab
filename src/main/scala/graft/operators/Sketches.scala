package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable-sketch operators: compute a sketch ONCE at the finest
  * grouping, then merge partial sketches upward through coarser
  * levels without ever rescanning the raw data. This is THE
  * hierarchical-distinct pattern at 100 TB — `count(DISTINCT)` per
  * rollup level rescans (and reshuffles) the fact table once per
  * level, while sketch rollup scans it once and every coarser level
  * is an aggregate over the previous level's (tiny) sketch frame.
  * The reference's analytics loop has no sketch layer at all
  * (lib/transformer.ex folds are exact single-stream state); this is
  * the distributed replacement.
  */
object Sketches {

  /** Hierarchical distinct-count rollup via Datasketches HLL: one
    * `hll_sketch_agg` pass at the deepest level, then a cascade of
    * `hll_union_agg` merges — level d is built from level d+1's
    * sketches, exercising merged-of-merged re-aggregation the way a
    * daily→monthly→yearly pipeline would. Output: one row per group
    * at every depth (coarser levels null-fill the unused level
    * columns, ROLLUP-style): `<level cols>..., depth, estimate`.
    *
    * Scale shape: the raw table is scanned exactly once (the base
    * aggregate, hash-partitioned on the full key with map-side
    * partial sketches); every cascade step aggregates |groups(d+1)|
    * rows of ≤ 2^lgK-byte sketches — driver never sees a sketch, no
    * action is taken, the whole cascade is one lazy plan. Estimates
    * are engine-specific (Datasketches HLL_8), so correctness gates
    * should pin a tolerance against exact counts, not the estimate
    * value itself.
    */
  def distinctRollup(
      df: DataFrame,
      levels: Seq[(String, Column)],
      value: Column,
      lgK: Int = 14): DataFrame = {
    require(levels.nonEmpty, "distinctRollup: need at least one level")
    require(lgK >= 4 && lgK <= 21, s"distinctRollup: lgK out of [4,21]: $lgK")
    val names = levels.map(_._1)
    val base = df
      .select(levels.map { case (n, c) => c.as(n) } :+ value.as("_v"): _*)
      .groupBy(names.map(col): _*)
      .agg(hll_sketch_agg(col("_v"), lgK).as("_sk"))
    val types = names.map(n => base.schema(n).dataType)
    def finish(fr: DataFrame, depth: Int): DataFrame =
      fr.select(names.map(col) :+ lit(depth).as("depth") :+
        hll_sketch_estimate(col("_sk")).cast("long").as("estimate"): _*)
    var cur = base
    var out = finish(base, names.size)
    for (d <- names.size - 1 to 0 by -1) {
      val keep = names.take(d)
      val merged = cur.groupBy(keep.map(col): _*)
        .agg(hll_union_agg(col("_sk")).as("_sk"))
      cur = merged.select(keep.map(col) ++
        names.drop(d).zip(types.drop(d)).map { case (n, t) =>
          lit(null).cast(t).as(n)
        } :+ col("_sk"): _*)
      out = out.unionAll(finish(cur, d))
    }
    out
  }
}
