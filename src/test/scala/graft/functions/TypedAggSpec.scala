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

  test("countMin sketch equals the sequential fold and overestimates one-sidedly") {
    val rnd = new scala.util.Random(3)
    // zipfy-ish: key k appears ~60/(k+1) times over 30 distinct keys
    val keys = (0 until 30).flatMap(k => Seq.fill(60 / (k + 1))(s"k$k"))
    val shuffled = rnd.shuffle(keys)
    val d = 3; val w = 8 // tiny width forces real collisions
    val sketch = shuffled.toDS().repartition(4)
      .select(TypedAggregators.countMin(d, w).toColumn).head()
    // distributed merge-order-independent: equals the sequential fold
    val expected = new Array[Long](d * w)
    for (k <- keys; i <- 0 until d)
      expected(i * w + TypedAggregators.cmsBucket(i, k, w)) += 1L
    assert(sketch.sameElements(expected))
    // point estimates: never below truth, and exact when no row collides
    val exact = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val estimates = exact.keys.map { k =>
      k -> (0 until d).map(i => sketch(i * w + TypedAggregators.cmsBucket(i, k, w))).min
    }.toMap
    assert(exact.forall { case (k, n) => estimates(k) >= n })
    assert(estimates.exists { case (k, e) => e > exact(k) }) // collisions really happened
    // null inputs are skipped, not counted
    val withNulls = (shuffled :+ null).toDS()
      .select(TypedAggregators.countMin(d, w).toColumn).head()
    assert(withNulls.sameElements(expected))
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

  test("heavyHitters keeps every item above n/(capacity+1) with bounded undercount") {
    // planted zipf-ish skew: a=500, b=300, c=100, then 60 singletons
    val items = Seq.fill(500)("a") ++ Seq.fill(300)("b") ++ Seq.fill(100)("c") ++
      (1 to 60).map(i => s"rare$i")
    val n = items.length // 960
    val cap = 4
    val sketch = scala.util.Random.shuffle(items).toDS().repartition(8)
      .select(TypedAggregators.heavyHitters(cap).toColumn).head()
    assert(sketch.size <= cap)
    val slack = n.toDouble / (cap + 1) // 192
    for ((item, exact) <- Seq("a" -> 500L, "b" -> 300L)) { // both > 192
      assert(sketch.contains(item), s"$item must survive (freq $exact > $slack)")
      assert(sketch(item) <= exact && sketch(item) >= exact - slack,
        s"$item count ${sketch(item)} outside [${exact - slack}, $exact]")
    }
    // distinct <= capacity: the sketch is exact (no eviction ever fires)
    val small = Seq("x", "y", "x", "z", "x", "y").toDS()
      .select(TypedAggregators.heavyHitters(5).toColumn).head()
    assert(small == Map("x" -> 3L, "y" -> 2L, "z" -> 1L))
    intercept[IllegalArgumentException](TypedAggregators.heavyHitters(0))
  }

  test("vectorMean pools embeddings element-wise per group; empty groups are null") {
    val vecs = Seq(
      ("a", Array(1.0f, 2.0f)), ("a", Array(3.0f, 6.0f)),
      ("b", Array(10.0f, 0.0f))).toDS()
    val out = vecs.groupByKey(_._1).mapValues(_._2)
      .agg(TypedAggregators.vectorMean.toColumn.name("centroid"))
      .collect().toMap
    assert(out("a").toSeq == Seq(2.0, 4.0))
    assert(out("b").toSeq == Seq(10.0, 0.0))
    // a 40-partition spread exercises merge(), not just reduce()
    val spread = spark.range(0, 40).repartition(40)
      .selectExpr("cast(id as double) d")
      .as[Double].map(d => ("k", Array(d.toFloat)))
    val pooled = spread.groupByKey(_._1).mapValues(_._2)
      .agg(TypedAggregators.vectorMean.toColumn.name("c"))
      .collect().head._2
    assert(math.abs(pooled(0) - 19.5) < 1e-9) // mean of 0..39
    // mixed dimensions in one group fail fast instead of averaging junk
    val bad = Seq(("x", Array(1.0f)), ("x", Array(1.0f, 2.0f))).toDS()
    intercept[org.apache.spark.SparkException] {
      bad.groupByKey(_._1).mapValues(_._2)
        .agg(TypedAggregators.vectorMean.toColumn.name("c")).collect()
    }
  }
}
