package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DiagnosticsSpec extends SparkSpec {
  import spark.implicits._

  test("keySkew surfaces a planted hot key and sizes the salt for it") {
    // 5000 rows of key "hot", 100 keys with 10 rows each
    val df = (spark.range(5000).select(lit("hot").as("k")) unionAll
      spark.range(1000).select(concat(lit("k"), col("id") % 100).as("k")))
    val report = Diagnostics.keySkew(df, Seq(col("k")))
    assert(report.totalRows == 6000L)
    assert(report.topKeys.head._1 == "hot")
    // MG undercount bound: rows/capacity = 6 at capacity 1000
    assert(math.abs(report.topKeys.head._2 - 5000L) <= 6L)
    assert(report.topShare > 0.8)
    // hot = 5000 rows vs mean partition load 6000/4 = 1500 -> 3.3x
    assert(report.isSkewed(3.0) && !report.isSkewed(4.0))
    // hot key is ~83% of 6000 rows at 4 partitions: ceil(0.83 * 4) = 4
    // = the partition-count cap — an independent expectation, not the
    // formula restated
    assert(report.saltFactorFor == 4)
  }

  test("keySkew on a uniform key space reports no skew") {
    val df = spark.range(4000).select((col("id") % 400).cast("string").as("k"))
    val report = Diagnostics.keySkew(df, Seq(col("k")))
    assert(!report.isSkewed())
    assert(report.saltFactorFor == 1)
  }

  test("keySkew never aliases composite keys through nulls") {
    val df = (Seq.fill(300)((Some("x"), None: Option[String])) ++
      Seq.fill(300)((None: Option[String], Some("x"))) ++
      Seq.fill(300)((Some(""), Some(""))))
      .toDF("a", "b")
    val report = Diagnostics.keySkew(df, Seq(col("a"), col("b")), topK = 5)
    // three DISTINCT key shapes: ("x", null), (null, "x"), ("", "") —
    // concat_ws alone would merge the first two into "x"
    assert(report.topKeys.length == 3)
    assert(report.topKeys.forall(_._2 == 300L))
  }

  test("partitionHistogram accounts for every row") {
    val df = spark.range(1000).toDF("id").repartition(8)
    val hist = Diagnostics.partitionHistogram(df).collect()
    assert(hist.map(_.getLong(1)).sum == 1000L)
    assert(hist.length <= 8)
  }

  test("profile: one-scan null/distinct/min/max per column, hand-checked") {
    val df = Seq(
      (Some(3L), Some("b")),
      (Some(1L), None),
      (Some(1L), Some("a")),
      (None, Some("a"))).toDF("k", "s")
    val rows = Diagnostics.profile(df, Seq("k", "s")).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("k", "s"))
    val k = rows("k")
    assert((k.getLong(1), k.getLong(2), k.getLong(3)) == ((4L, 1L, 2L)))
    assert((k.getString(4), k.getString(5)) == (("1", "3")))
    val s = rows("s")
    assert((s.getLong(1), s.getLong(2), s.getLong(3)) == ((4L, 1L, 2L)))
    assert((s.getString(4), s.getString(5)) == (("a", "b")))
  }

  test("profile scans the source once: both aggregates read the cached projection") {
    val df = spark.range(100).selectExpr("id AS a", "id % 7 AS b", "id % 3 AS c")
    val plan = Diagnostics.profile(df, Seq("a", "b", "c"))
      .queryExecution.executedPlan.toString
    try {
      // the multi count-DISTINCT side keeps its Expand+aggregate shape
      assert(plan.contains("Expand"))
      // the plain legs are SPLIT OUT of the distinct aggregate (fusing
      // them drags min/max through the Expand, measured ~9x slower) and
      // both sides read the SAME cached pruned projection, so the
      // source itself is scanned once at cache fill
      assert("InMemoryTableScan".r.findAllIn(plan).size == 2,
        s"expected both aggs on the cached projection:\n$plan")
    } finally graft.core.CacheRegistry.unpersistAll()
  }

  test("profileState merge: exact legs equal the full profile; HLL estimate exact at small cardinality") {
    val full = spark.range(1000)
      .selectExpr("id AS k", "CASE WHEN id % 10 = 0 THEN NULL ELSE id % 97 END AS v")
    val cols = Seq("k", "v")
    val a = Diagnostics.profileState(full.where("id < 400"), cols)
    val b = Diagnostics.profileState(full.where("id >= 400"), cols)
    val merged = Diagnostics.mergeProfileStates(Seq(a, b), cols)
    val out = Diagnostics.profileFinish(merged, cols).collect()
      .map(r => r.getString(0) -> r).toMap
    val k = out("k")
    assert((k.getLong(1), k.getLong(2)) == ((1000L, 0L)))
    assert((k.getString(4), k.getString(5)) == (("0", "999")))
    val v = out("v")
    assert((v.getLong(1), v.getLong(2)) == ((1000L, 100L)))
    // HLL at lgK=12: within 5% (not exact — estimation mode engages
    // well below 2^lgK; 1000 distincts measured 988 here)
    assert(math.abs(k.getLong(3) - 1000L) <= 50L, s"k est ${k.getLong(3)}")
    assert(math.abs(v.getLong(3) - 96L) <= 5L, s"v est ${v.getLong(3)}")
    // merge order must not matter (associative/commutative state)
    val flipped = Diagnostics.profileFinish(
      Diagnostics.mergeProfileStates(Seq(b, a), cols), cols).collect()
      .map(r => r.getString(0) -> r.toSeq).toMap
    assert(out.keys.forall(c => flipped(c) == out(c).toSeq))
    // an EMPTY delta state is a merge identity (day with no data)
    val empty = Diagnostics.profileState(full.where("id < 0"), cols)
    val withEmpty = Diagnostics.profileFinish(
      Diagnostics.mergeProfileStates(Seq(empty, a, b), cols), cols)
      .collect().map(r => r.getString(0) -> r.toSeq).toMap
    assert(withEmpty.keys.forall(c => withEmpty(c) == out(c).toSeq))
  }

  test("skewReport: exact counts, integer share/salt math, key tiebreak") {
    // 60 "hot", 20 "warm", 20 "cold" -> total 100; P = 10
    val df = (spark.range(60).select(lit("hot").as("k")) unionAll
      spark.range(20).select(lit("warm").as("k")) unionAll
      spark.range(20).select(lit("cold").as("k")))
    val rows = Diagnostics.skewReport(df, Seq(col("k")), topK = 3, partitions = 10)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // hot: share 600000 ppm, salt ceil(60*10/100)=6
    // tie warm/cold at 20 -> key ASC puts cold first; salt ceil(2)=2
    assert(rows.toSeq == Seq(
      (1, "hot", 60L, 600000L, 6L),
      (2, "cold", 20L, 200000L, 2L),
      (3, "warm", 20L, 200000L, 2L)))
  }

  test("skewReport caps salt at the partition count and floors at 1") {
    val oneKey = spark.range(100).select(lit("only").as("k"))
    val r1 = Diagnostics.skewReport(oneKey, Seq(col("k")), topK = 1, partitions = 8)
      .collect().head
    assert(r1.getLong(4) == 8L) // 100% share -> ceil(8) capped at P
    val uniform = spark.range(1000).select(col("id").as("k"))
    val r2 = Diagnostics.skewReport(uniform, Seq(col("k")), topK = 1, partitions = 8)
      .collect().head
    assert(r2.getLong(4) == 1L) // 1-row keys -> ceil(8/1000) -> 1
  }

  test("fdCheck: violations counted exactly; null rhs is a value") {
    val bad = Seq((1L, "a"), (1L, "a"), (2L, "a"), (2L, "b")).toDF("l", "r")
    val b = Diagnostics.fdCheck(bad, Seq(col("l")), col("r")).collect().head
    assert(b.getLong(0) == 2L && b.getLong(1) == 1L && b.getLong(2) == 2L)
    assert(!b.getBoolean(3))
    val good = Seq((1L, "a"), (1L, "a"), (2L, "b")).toDF("l", "r")
    val g = Diagnostics.fdCheck(good, Seq(col("l")), col("r")).collect().head
    assert(g.getBoolean(3) && g.getLong(1) == 0L)
    // (3, "x") vs (3, null): two distinct rhs values -> violation
    val withNull = Seq((3L, "x"), (3L, null.asInstanceOf[String])).toDF("l", "r")
    val n = Diagnostics.fdCheck(withNull, Seq(col("l")), col("r")).collect().head
    assert(!n.getBoolean(3) && n.getLong(2) == 2L)
  }

  test("planLint flags cartesians, global windows, unbounded sorts; clean plans pass") {
    import org.apache.spark.sql.expressions.Window
    val a = spark.range(100).toDF("a")
    val b = spark.range(100).toDF("b")
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val cart = Diagnostics.planLint(a.crossJoin(b)).collect()
      assert(cart.exists(_.getString(0) == "cartesian-product"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    val gw = Diagnostics.planLint(
      a.withColumn("rn", row_number().over(Window.orderBy(col("a"))))).collect()
    assert(gw.exists(r => r.getString(0) == "global-window" &&
      r.getString(1) == "error"))
    val gs = Diagnostics.planLint(a.orderBy(col("a"))).collect()
    assert(gs.exists(_.getString(0) == "global-sort-no-limit"))
    // clean: keyed window; global sort feeding a take
    val keyed = a.withColumn("g", col("a") % 5)
      .withColumn("rn", row_number().over(Window.partitionBy("g").orderBy("a")))
    assert(Diagnostics.planLint(keyed).collect().isEmpty)
    assert(Diagnostics.planLint(a.orderBy(col("a")).limit(5)).collect().isEmpty)
  }

  test("benfordDigits: integer ppm surface, ln-ratio expectation, positives only") {
    val df = ((1L to 9L) ++ Seq(-5L, 0L)).toDF("v") // negatives/zero excluded
    val rows = Diagnostics.benfordDigits(df, col("v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows.keySet == (1 to 9).map(_.toString).toSet)
    // uniform digits: 9 values, each 1/9 = 111111 ppm
    assert(rows.values.forall { case (n, ppm, _, _) => n == 1L && ppm == 111111L })
    // digit 1: floor(log10(2) * 1e6) = 301029
    assert(rows("1")._3 == 301029L)
    assert(rows("1")._4 == 111111L - 301029L)
    // expectations sum to ~1e6 (floor slack < 9)
    val s = rows.values.map(_._3).sum
    assert(s > 999990L && s <= 1000000L)
  }
}
