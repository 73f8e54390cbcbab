package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  // Reference interleave for the oracle-side semantics.
  private def refZ(bits: Int, vs: Seq[Long]): Long = {
    var z = 0L
    val n = vs.size
    val mask = (1L << bits) - 1L
    for (c <- vs.indices; i <- 0 until bits)
      z |= (((vs(c) & mask) >>> i) & 1L) << (i * n + c)
    z
  }

  test("zValue matches the reference interleave, masks, and handles 3 columns") {
    val rows = Seq((0L, 0L, 0L), (1L, 0L, 0L), (0L, 1L, 0L), (0L, 0L, 1L),
      (255L, 255L, 255L), (257L, 2L, 300L), (12345L, 678L, 91L))
    val out = rows.toDF("a", "b", "c")
      .select(col("a"), col("b"), col("c"),
        Layout.zValue(8, col("a"), col("b"), col("c")).as("z"))
      .collect()
    out.foreach { r =>
      assert(r.getLong(3) == refZ(8, Seq(r.getLong(0), r.getLong(1), r.getLong(2))))
    }
    // column 0 owns the least-significant lane
    assert(refZ(8, Seq(1L, 0L, 0L)) == 1L)
    assert(refZ(8, Seq(0L, 1L, 0L)) == 2L)
    assert(refZ(8, Seq(0L, 0L, 1L)) == 4L)
  }

  test("zValue is null when any input is null") {
    val out = Seq((Some(1L), None: Option[Long]), (Some(1L), Some(2L)))
      .toDF("a", "b")
      .select(Layout.zValue(8, col("a"), col("b")).as("z"))
      .collect().map(r => Option(r.get(0)))
    assert(out.toSeq == Seq(None, Some(refZ(8, Seq(1L, 2L)))))
  }

  test("zValue locality: adjacent cells differ in fewer high bits than distant ones") {
    // Z-curve property worth pinning: the interleaved key of (x,y) and
    // (x+1,y) shares the high bits whenever x+1 doesn't carry far.
    assert((refZ(8, Seq(2L, 3L)) >> 4) == (refZ(8, Seq(3L, 3L)) >> 4))
    assert((refZ(8, Seq(2L, 3L)) >> 4) != (refZ(8, Seq(200L, 3L)) >> 4))
  }

  test("zorderBy yields non-overlapping sorted partition ranges") {
    val df = spark.range(4096).select(
      (col("id") % 64).as("x"), (col("id") / 64 % 64).as("y"))
    val parts = Layout.zorderBy(df, 6, Seq(col("x"), col("y")), numPartitions = Some(8))
      .select(spark_partition_id().as("p"), col("zval"))
      .as[(Int, Long)].collect().toSeq
    // sorted within each partition as encountered order
    parts.groupBy(_._1).values.foreach { rows =>
      assert(rows.map(_._2) == rows.map(_._2).sorted)
    }
    // ranges of distinct partitions never overlap
    val ranges = parts.groupBy(_._1).view.mapValues(rs => (rs.map(_._2).min, rs.map(_._2).max))
      .values.toSeq.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) => assert(hi <= lo2)
      case _ =>
    }
  }

  test("interleave_bits is reachable from SQL") {
    graft.GraftFunctions.register(spark)
    val out = Seq((3L, 5L)).toDF("a", "b")
      .selectExpr("interleave_bits(8, a, b) AS z").as[Long].collect()
    assert(out.head == refZ(8, Seq(3L, 5L)))
  }

  test("compact right-sizes partition count to the row target") {
    val df = spark.range(1000).toDF("id")
    assert(Layout.compact(df, 300).rdd.getNumPartitions == 4) // ceil(1000/300)
    assert(Layout.compact(df, 5000).rdd.getNumPartitions == 1)
    assert(Layout.compact(df.where(col("id") < 0), 100).rdd.getNumPartitions == 1)
    intercept[IllegalArgumentException](Layout.compact(df, 0))
  }

  test("interleave guards reject bit overflows") {
    intercept[IllegalArgumentException](Layout.zValue(32, col("a"), col("b"), col("c")))
    intercept[IllegalArgumentException](Layout.zValue(0, col("a")))
  }

  test("rendezvousShard: minimal disruption on resize, every shard populated") {
    val keys = (1L to 2000L).toDF("k")
    val both = Layout.rendezvousShard(
      Layout.rendezvousShard(keys, col("k"), 8, "s8"), col("k"), 7, "s7")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    // all 8 shards see traffic, roughly balanced (md5 uniformity)
    val by8 = both.groupBy(_._2).view.mapValues(_.size).toMap
    assert(by8.keySet == (0 until 8).toSet)
    assert(by8.values.forall(c => c > 150 && c < 350)) // 250 ± wide band
    // THE law: dropping shard 7 moves exactly the keys that were on 7
    both.foreach { case (k, s8, s7) =>
      if (s8 != 7) assert(s7 == s8, s"key $k moved needlessly: $s8 -> $s7")
      else assert(s7 != 7 && s7 >= 0 && s7 < 7)
    }
    // assignment is a pure function of (key, n): stable across evaluations
    val again = Layout.rendezvousShard(keys, col("k"), 8, "s8")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    both.foreach { case (k, s8, _) => assert(again(k) == s8) }
  }

  test("rendezvousShard: single shard short-circuits to 0") {
    val out = Layout.rendezvousShard(Seq(1L, 2L).toDF("k"), col("k"), 1)
      .select("shard").as[Int].collect().toSet
    assert(out == Set(0))
  }
}
