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

  test("kmv: exact mode below the cap, partitioning-invariant") {
    import graft.functions.TypedAggregators
    val agg = udaf(TypedAggregators.kmv(64))
    val df = Seq.tabulate(200)(i => ("g", i.toLong % 40)).toDF("g", "v")
    def sketch(parts: Int): Seq[Long] = df.repartition(parts)
      .select(xxhash64(col("v")).as("h"))
      .agg(agg(col("h"))).collect()(0).getSeq[Long](0)
    val s4 = sketch(4)
    assert(s4.length == 40 && s4 == s4.sorted) // exact distinct set, sorted
    assert(sketch(13) == s4)                   // merge-order invariant
  }

  test("kmvIntersectEstimate: exact when under cap, ~right when over") {
    import graft.functions.TypedAggregators
    val k = 1024
    def mix(z0: Long): Long = { // splitmix64 finalizer: uniform 64-bit
      var z = z0 + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    def sk(vs: Seq[Long]): Array[Long] = {
      val agg = TypedAggregators.kmv(k)
      var b = agg.zero
      vs.foreach(v => b = agg.reduce(b, mix(v)))
      b
    }
    // under cap: exact intersection of {0..99} and {50..149} = 50
    val a = sk(0L until 100L)
    val b = sk(50L until 150L)
    assert(Sketches.kmvIntersectEstimate(a, b, k) == 50.0)
    // over cap: |A|=20k, |B|=20k, overlap 10k — estimate within 20 %
    val bigA = sk(0L until 20000L)
    val bigB = sk(10000L until 30000L)
    val est = Sketches.kmvIntersectEstimate(bigA, bigB, k)
    assert(est > 8000.0 && est < 12000.0, s"estimate $est")
    // disjoint sets estimate (near) zero
    val dA = sk(0L until 5000L)
    val dB = sk(100000L until 105000L)
    assert(Sketches.kmvIntersectEstimate(dA, dB, k) < 500.0)
    assert(Sketches.kmvIntersectEstimate(Array.empty[Long], dB, k) == 0.0)
    // union: exact under cap, ~|A∪B| over; jaccard ~ 1/3 for the big pair
    assert(Sketches.kmvUnionEstimate(a, b, k) == 150.0)
    val u = Sketches.kmvUnionEstimate(bigA, bigB, k)
    assert(u > 25000.0 && u < 35000.0, s"union $u")
    val j = Sketches.kmvJaccardEstimate(bigA, bigB, k)
    assert(j > 0.25 && j < 0.42, s"jaccard $j")
    assert(Sketches.kmvJaccardEstimate(dA, dA, k) == 1.0)
  }

  test("distinctRollup: single level degenerates to per-group + total") {
    val df = Seq(("x", 1L), ("x", 2L), ("y", 2L)).toDF("g", "u")
    val out = Sketches.distinctRollup(df, Seq("g" -> col("g")), col("u"))
      .collect().map(r => (Option(r.getString(0)), r.getInt(1), r.getLong(2))).toSet
    assert(out == Set(
      (Some("x"), 1, 2L), (Some("y"), 1, 1L), (None, 0, 2L)))
  }

  test("joinSizeEstimate: one-sided bound holds, exact on collision-free keys") {
    val a = Seq("a", "a", "b").toDF("k")
    val b = Seq("a", "b", "b", "c").toDF("k")
    val r = Sketches.joinSizeEstimate(a, col("k"), b, col("k")).collect().head
    val est = r.getAs[Long]("join_size_est")
    // exact inner product: 2*1 + 1*2 = 4; w=2048 over 4 keys -> no collisions
    assert(est == 4L)
    assert(r.getAs[Long]("n_a") == 3L && r.getAs[Long]("n_b") == 4L)
    // disjoint keyspaces estimate 0 (min over d rows kills any 1-row collision)
    val z = Sketches.joinSizeEstimate(
      Seq("x").toDF("k"), col("k"), Seq("y").toDF("k"), col("k")).collect().head
    assert(z.getAs[Long]("join_size_est") == 0L)
  }

  test("joinSizeEstimate is partition-layout-proof (mergeable sketches)") {
    val a = (1 to 200).map(i => s"k${i % 50}").toDF("k")
    val b = (1 to 100).map(i => s"k${i % 25}").toDF("k")
    val one = Sketches.joinSizeEstimate(a.coalesce(1), col("k"), b.coalesce(1), col("k"))
      .collect().head.getAs[Long]("join_size_est")
    val many = Sketches.joinSizeEstimate(a.repartition(7), col("k"), b.repartition(5), col("k"))
      .collect().head.getAs[Long]("join_size_est")
    assert(one == many)
    // exact = sum over 25 shared keys of 4*4 = 400; CMS never undercounts
    assert(one >= 400L)
  }

  test("amsF2: single-key input is estimated exactly; |est−F2| is hash-bound") {
    // all rows one key: every replicate's counter is ±n, est = n² = F2
    val same = Seq.fill(4)("a").toDF("k")
    val rs = Sketches.amsF2(same, col("k"), replicates = 3).collect().head
    assert(rs.getAs[Long]("n_rows") == 4L && rs.getAs[Long]("f2_exact") == 16L)
    assert(rs.getAs[Long]("f2_est") == 16L && rs.getAs[Long]("err_ppm") == 0L)
    // {a,a,b}: F2 = 5; one replicate's est = (±2±1)² ∈ {1, 9} — either
    // way |est−5| = 4 -> err_ppm = 800000 independent of the hash draw
    val df = Seq("a", "a", "b").toDF("k")
    val r = Sketches.amsF2(df, col("k"), replicates = 1).collect().head
    assert(r.getAs[Long]("f2_exact") == 5L)
    assert(Set(1L, 9L).contains(r.getAs[Long]("f2_est")))
    assert(r.getAs[Long]("err_ppm") == 800000L)
    // layout-proof: the signed counters are map-combinable sums
    val big = (1 to 300).map(i => s"k${i % 7}").toDF("k")
    val one = Sketches.amsF2(big.coalesce(1), col("k")).collect().head
    val many = Sketches.amsF2(big.repartition(11), col("k")).collect().head
    assert(one.getAs[Long]("f2_est") == many.getAs[Long]("f2_est"))
    assert(one.getAs[Long]("f2_exact") == many.getAs[Long]("f2_exact"))
  }
}
