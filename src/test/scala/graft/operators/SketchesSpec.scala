package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("distinctRollup: exact at small cardinality, ROLLUP null-fill shape") {
    // (group, day, user): a=2 users over 2 days, b=3 users on 1 day;
    // u1 appears in both groups so the grand total dedups to 4
    val df = Seq(
      ("a", "d1", 1L), ("a", "d1", 1L), ("a", "d2", 2L),
      ("b", "d1", 1L), ("b", "d1", 3L), ("b", "d1", 4L))
      .toDF("g", "d", "u")
    val out = Sketches.distinctRollup(
        df, Seq("g" -> col("g"), "d" -> col("d")), col("u"), lgK = 12)
      .collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1)),
        r.getInt(2), r.getLong(3)))
      .toSet
    // HLL is exact at these cardinalities (far below 2^lgK buckets)
    assert(out == Set(
      (Some("a"), Some("d1"), 2, 1L),
      (Some("a"), Some("d2"), 2, 1L),
      (Some("b"), Some("d1"), 2, 3L),
      (Some("a"), None, 1, 2L),
      (Some("b"), None, 1, 3L),
      (None, None, 0, 4L)))
  }

  test("distinctRollup: single level degenerates to per-group + total") {
    val df = Seq(("x", 1L), ("x", 2L), ("y", 2L)).toDF("g", "u")
    val out = Sketches.distinctRollup(df, Seq("g" -> col("g")), col("u"))
      .collect().map(r => (Option(r.getString(0)), r.getInt(1), r.getLong(2))).toSet
    assert(out == Set(
      (Some("x"), 1, 2L), (Some("y"), 1, 1L), (None, 0, 2L)))
  }
}
