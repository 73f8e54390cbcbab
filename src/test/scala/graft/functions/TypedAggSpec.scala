package graft.functions

import graft.{Flow, SparkSpec}
import graft.operators.Transformer
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class TypedAggSpec extends SparkSpec {
  import spark.implicits._

  test("countMap aggregator equals groupBy count (words-count acc parity)") {
    val words = Seq("a", "b", "a", "c", "a", "b")
    val viaAgg = words.toDS().select(TypedAggregators.countMap.toColumn).head()
    val viaGroupBy = words.toDS().groupBy("value").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaAgg == viaGroupBy)
    assert(viaAgg == Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
  }

  test("moments aggregator computes mean and sample variance with map-side merge") {
    val xs = Seq(2.0, 4.0, 4.0, 4.0, 5.0, 5.0, 7.0, 9.0)
    val (n, mean, variance) = xs.toDS().repartition(4)
      .select(TypedAggregators.moments.toColumn).head()
    assert(n == 8)
    assert(math.abs(mean - 5.0) < 1e-12) // merge order varies across partitions
    assert(math.abs(variance - 32.0 / 7.0) < 1e-9)
  }

  test("keyedStateful folds per key in order with end-of-key flush") {
    // per user: running sum emitted when it crosses 10, remainder flushed
    val df = Seq(
      (1L, 0L, 4), (1L, 1L, 7), (1L, 2L, 2), // 4+7=11 emit, then 2 flushed
      (2L, 0L, 12), (2L, 1L, 1) // 12 emit, 1 flushed
    ).toDF("user", "seq", "x")
    val schema = StructType(Seq(
      StructField("user", LongType), StructField("total", IntegerType)))
    val out = Transformer.keyedStateful[Long, (Long, Int)](
      "s",
      keyOf = _.getLong(0),
      orderBy = Seq(col("seq")),
      schema,
      init = () => (-1L, 0),
      finish = { case (k, (_, acc)) => if (acc > 0) Seq(Row(k, acc)) else Nil }) {
      case (r, (_, acc)) =>
        val next = acc + r.getInt(2)
        if (next >= 10) (Seq(Row(r.getLong(0), next)), (r.getLong(0), 0))
        else (Nil, (r.getLong(0), next))
    }.apply(Map("s" -> df))("s")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(out == Set((1L, 11), (1L, 2), (2L, 12), (2L, 1)))
  }
}
