package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("tumblingCountWindow chops the global order into fixed batches") {
    val df = (1 to 10).toDF("v")
    val out = Relational.tumblingCountWindow(
      df, Seq(col("v")), 4, Seq(count(lit(1)).as("n"), sum(col("v")).as("s")))
      .orderBy("window_id").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(4, 4, 2)) // ns
    assert(out.map(_.getLong(2)).toSeq == Seq(1 + 2 + 3 + 4, 5 + 6 + 7 + 8, 9 + 10))
  }

  test("slidingAvg matches the reference's trailing-window semantics") {
    val df = Seq((1, 1.0), (1, 2.0), (1, 3.0), (1, 4.0)).toDF("k", "v")
    val out = Relational.slidingAvg(df, Seq(col("k")), Seq(col("v")), 3, col("v"))
      .orderBy("v").select("sliding_avg").as[Double].collect().toSeq
    assert(out == Seq(1.0, 1.5, 2.0, 3.0))
  }

  test("tumbling window averages match the reference example " +
    "(window_test.exs:7-32: [1..6] size 3 -> 2.0, 5.0)") {
    val df = (1 to 6).toDF("v")
    val out = Relational.tumblingCountWindow(
      df, Seq(col("v")), 3, Seq(avg(col("v")).as("a")))
      .orderBy("window_id").select("a").as[Double].collect().toSeq
    assert(out == Seq(2.0, 5.0))
  }

  test("zipByIndexN zips three streams into aligned tuples (simple_numbers n-way parity)") {
    val a = Seq(1, 2, 3).toDF("x")
    val b = Seq(10, 20, 30, 40).toDF("y")
    val c = Seq(100, 200).toDF("z")
    val out = Relational.zipByIndexN(Seq(
      (a, Seq(col("x"))), (b, Seq(col("y"))), (c, Seq(col("z")))))
      .orderBy("x").collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSeq
    assert(out == Seq((1, 10, 100), (2, 20, 200))) // truncated to shortest
  }

  test("zipByIndex pairs i-th rows (round-robin pairing parity)") {
    val a = Seq("x", "y", "z").toDF("l")
    val b = Seq(10, 20).toDF("r")
    val out = Relational.zipByIndex(a, Seq(col("l")), b, Seq(col("r")))
      .orderBy("l").collect()
    assert(out.map(r => (r.getString(0), r.getInt(1))).toSeq == Seq(("x", 10), ("y", 20)))
  }

  test("asOfJoin picks the latest right row at or before the left timestamp") {
    val left = Seq((1, ts("2024-01-01 10:00:00")), (1, ts("2024-01-01 12:00:00")),
      (2, ts("2024-01-01 10:00:00")))
      .toDF("k", "lts")
    val right = Seq(
      (1, ts("2024-01-01 09:00:00"), "a"), (1, ts("2024-01-01 11:00:00"), "b"),
      (2, ts("2024-01-01 11:00:00"), "c"))
      .toDF("k", "rts", "tag")
    val out = Relational.asOfJoin(left, right, "k", "lts", "rts", Seq("tag"))
      .orderBy("k", "lts").collect()
    assert(out.map(_.getAs[String]("tag")).toSeq == Seq("a", "b", null))
  }

  test("asOfJoin forward picks the earliest right row at or after the left timestamp") {
    val left = Seq((1, ts("2024-01-01 10:00:00")), (1, ts("2024-01-01 12:00:00")),
      (2, ts("2024-01-01 12:00:00")))
      .toDF("k", "lts")
    val right = Seq(
      (1, ts("2024-01-01 11:00:00"), "a"), (1, ts("2024-01-01 12:00:00"), "b"),
      (2, ts("2024-01-01 11:00:00"), "c"))
      .toDF("k", "rts", "tag")
    val out = Relational.asOfJoin(left, right, "k", "lts", "rts", Seq("tag"),
      direction = "forward")
      .orderBy("k", "lts").collect()
    // 10:00 -> earliest at/after is 11:00 "a"; 12:00 ties with "b"
    // (inclusive); key 2 has nothing at/after 12:00
    assert(out.map(_.getAs[String]("tag")).toSeq == Seq("a", "b", null))
  }

  test("asOfJoin matches nothing for null timestamps, both directions") {
    val left = Seq((1, Some(ts("2024-01-01 10:00:00"))), (1, None)).toDF("k", "lts")
    val right = Seq(
      (1, Some(ts("2024-01-01 09:00:00")), "a"),
      (1, None: Option[java.sql.Timestamp], "poison")).toDF("k", "rts", "tag")
    for (dir <- Seq("backward", "forward")) {
      val out = Relational.asOfJoin(left, right, "k", "lts", "rts", Seq("tag"), dir)
        .collect().map(r => Option(r.getTimestamp(1)).isDefined -> r.getAs[String]("tag")).toMap
      // null-ts left row joins nothing; null-ts right row never leaks
      assert(out(false) == null, dir)
      assert(out(true) == (if (dir == "backward") "a" else null), dir)
    }
  }

  test("intervalOverlapJoin fails loud on an open-ended interval instead of exploding") {
    val l = Seq((1L, 0L, Long.MaxValue - 1)).toDF("lid", "lo", "hi")
    val r = Seq((10L, 5L, 6L)).toDF("rid", "lo2", "hi2")
    val ex = intercept[Exception] {
      Relational.intervalOverlapJoin(l, "lo", "hi", r, "lo2", "hi2", 10L).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("raise binWidth")))
  }

  test("intervalOverlapJoin equals the quadratic overlap join across bin widths") {
    val l = Seq((1L, 0L, 10L), (2L, 5L, 6L), (3L, 20L, 30L), (4L, -7L, -3L))
      .toDF("lid", "lo", "hi")
    val r = Seq((10L, 9L, 25L), (11L, 6L, 6L), (12L, 40L, 50L), (13L, -5L, -4L))
      .toDF("rid", "lo2", "hi2")
    val expect = Set((1L, 10L), (1L, 11L), (2L, 11L), (3L, 10L), (4L, 13L))
    for (w <- Seq(1L, 3L, 7L, 100L)) {
      val got = Relational.intervalOverlapJoin(l, "lo", "hi", r, "lo2", "hi2", w)
        .select("lid", "rid").as[(Long, Long)].collect().toSet
      assert(got == expect, s"binWidth=$w")
    }
  }

  test("sessionize splits on gaps larger than gapSeconds") {
    val df = Seq(
      (1, ts("2024-01-01 10:00:00")), (1, ts("2024-01-01 10:10:00")),
      (1, ts("2024-01-01 12:00:00")), (2, ts("2024-01-01 10:00:00")))
      .toDF("k", "t")
    val out = Relational.sessionize(df, col("k"), col("t"), 3600)
      .groupBy("k", "session_id").count().orderBy("k", "session_id").collect()
    assert(out.map(_.getLong(2)).toSeq == Seq(2, 1, 1))
  }

  test("shipmentSla: deadline precedes completeness; late extras after completion ignored " +
    "(parcels decide/2 parity in event-time order)") {
    val orders = Seq(
      (1L, ts("2024-01-01 00:00:00"), 2), // incomplete + late ship -> THRESHOLD
      (2L, ts("2024-01-01 00:00:00"), 1), // one in-time ship -> ALL
      (3L, ts("2024-01-01 00:00:00"), 1), // no ships -> PENDING
      (4L, ts("2024-01-01 00:00:00"), 1)  // completes day2, extra late ship day20 -> ALL
    ).toDF("k", "ots", "expected")
    val ships = Seq(
      (1L, ts("2024-01-20 00:00:00")),
      (2L, ts("2024-01-02 00:00:00")),
      (4L, ts("2024-01-02 00:00:00")), (4L, ts("2024-01-20 00:00:00")))
      .toDF("k", "sts")
    val out = Relational.shipmentSla(orders, ships, "k", "ots", "expected", "sts", 7)
      .orderBy("k").select("status").as[String].collect().toSeq
    assert(out == Seq(
      "THRESHOLD_EXCEEDED", "ALL_PARCELS_SHIPPED", "PENDING", "ALL_PARCELS_SHIPPED"))
  }

  test("shipmentSla drops null ship timestamps (they carry no state-machine information)") {
    val orders = Seq((1L, ts("2024-01-01 00:00:00"), 1)).toDF("k", "ots", "expected")
    // one real in-time shipment + one null row: the null must not count
    // toward n_shipped nor perturb the sorted ship-time list.
    val ships = Seq(
      (1L, Option(ts("2024-01-02 00:00:00"))),
      (1L, Option.empty[java.sql.Timestamp])).toDF("k", "sts")
    val out = Relational.shipmentSla(orders, ships, "k", "ots", "expected", "sts", 7)
      .select("n_shipped", "status").collect().head
    assert(out.getLong(0) == 1L) // null row excluded from the count
    assert(out.getString(1) == "ALL_PARCELS_SHIPPED")
  }

  test("binnedRangeJoin equals the naive range join") {
    val intervals = Seq((0L, 10L, "a"), (5L, 25L, "b"), (100L, 100L, "c"))
      .toDF("lo", "hi", "tag")
    val points = Seq(0L, 5L, 10L, 11L, 25L, 99L, 100L).toDF("p")
    val naive = intervals.join(points, col("p") >= col("lo") && col("p") <= col("hi"))
      .orderBy("tag", "p").collect().toSeq
    for (bw <- Seq(1L, 7L, 64L)) {
      val binned = Relational.binnedRangeJoin(intervals, "lo", "hi", points, "p", bw)
        .select("lo", "hi", "tag", "p").orderBy("tag", "p").collect().toSeq
      assert(binned == naive, s"binWidth=$bw")
    }

    // negative domain: truncating division would mis-bin without the floor fix
    val negI = Seq((-10L, -2L, "n")).toDF("lo", "hi", "tag")
    val negP = Seq(-10L, -7L, -2L, -1L, 0L).toDF("p")
    val negNaive = negI.join(negP, col("p") >= col("lo") && col("p") <= col("hi"))
      .select("p").orderBy("p").as[Long].collect().toSeq
    val negBinned = Relational.binnedRangeJoin(negI, "lo", "hi", negP, "p", 4L)
      .select("p").orderBy("p").as[Long].collect().toSeq
    assert(negBinned == negNaive && negNaive == Seq(-10L, -7L, -2L))
  }

  test("saltedJoin equals the plain join on skewed data") {
    val left = ((1 to 500).map(i => (1L, i)) ++ Seq((2L, 9000), (3L, 9001)))
      .toDF("k", "payload") // key 1 is hot
    val right = Seq((1L, "a"), (2L, "b"), (4L, "d")).toDF("k", "tag")
    val plain = left.join(right, Seq("k")).orderBy("k", "payload", "tag").collect().toSeq
    val salted = Relational.saltedJoin(left, right, Seq("k"), saltFactor = 8)
      .orderBy("k", "payload", "tag").collect().toSeq
    assert(salted == plain)
    val plainLeft = left.join(right, Seq("k"), "left")
      .orderBy("k", "payload", "tag").collect().toSeq
    val saltedLeft = Relational.saltedJoin(left, right, Seq("k"), 8, "left")
      .orderBy("k", "payload", "tag").collect().toSeq
    assert(saltedLeft == plainLeft)
  }

  test("bloomPrunedJoin equals the plain join; the bloom filter actually prunes") {
    val probe = (1L to 1000L).map(i => (i % 100, i)).toDF("k", "payload")
    val build = Seq((3L, "a"), (7L, "b"), (42L, "c")).toDF("k", "tag")
    val plain = probe.join(build, Seq("k")).orderBy("k", "payload").collect().toSeq
    val pruned = Relational.bloomPrunedJoin(probe, build, Seq("k"), expectedItems = 3)
      .orderBy("k", "payload").collect().toSeq
    assert(pruned == plain)
    // semi form and string keys
    val probeS = Seq("x", "y", "z", "w").toDF("k")
    val buildS = Seq("y", "w").toDF("k")
    val semi = Relational.bloomPrunedJoin(probeS, buildS, Seq("k"), "left_semi", 2)
      .as[String].collect().toSet
    assert(semi == Set("y", "w"))
    // the filter itself removes most non-matching keys pre-join
    val bloom = Relational.buildBloom(build, "k", 3)
    val survivors = probe.where(
      graft.functions.VectorFunctions.bloomMightContain(col("k"), bloom)).count()
    assert(survivors >= 30 && survivors < 200) // 30 true + few false positives
    // outer joins are rejected: pruning would change their result
    intercept[IllegalArgumentException](
      Relational.bloomPrunedJoin(probe, build, Seq("k"), "left"))
  }

  test("topKPerGroup returns exactly k per group with deterministic ties") {
    val df = Seq(("a", 3), ("a", 2), ("a", 1), ("b", 9)).toDF("g", "v")
    val out = Relational.topKPerGroup(df, Seq(col("g")), Seq(col("v").desc), 2)
    assert(out.where(col("g") === "a").count() == 2)
    assert(out.where(col("g") === "b").count() == 1)
  }

  test("gapFill densifies each key's own range, LOCF carries, defaults fill, gaps flagged") {
    val df = Seq(
      ("a", 10L, 5L, Some(100L)),
      ("a", 13L, 2L, Some(70L)),   // ticks 11, 12 missing
      ("b", 20L, 1L, None: Option[Long])) // single-tick key: no spine growth
      .toDF("k", "tick", "n", "v")
    val out = Relational.gapFill(df, Seq("k"), "tick", step = 1L,
      locf = Seq("v"), defaults = Map("n" -> lit(0L)))
      .orderBy("k", "tick")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getBoolean(4)))
    assert(out.toSeq == Seq(
      ("a", 10L, 5L, Some(100L), false),
      ("a", 11L, 0L, Some(100L), true),   // gap: n defaulted, v carried
      ("a", 12L, 0L, Some(100L), true),
      ("a", 13L, 2L, Some(70L), false),   // real row wins over carry
      ("b", 20L, 1L, None, false)))       // key 'b' never had a v: stays null
    // step > 1 builds a coarser grid off the key's own min
    val coarse = Relational.gapFill(df.where(col("k") === "a"), Seq("k"), "tick",
      step = 3L, locf = Seq("v"), defaults = Map("n" -> lit(0L)))
    assert(coarse.select("tick").as[Long].collect().sorted.toSeq == Seq(10L, 13L))
  }

  test("quantileBins assigns equal-frequency quartiles; nulls stay null") {
    // values 1..8: q25=2.75, q50=4.5, q75=6.25
    val df = (1L to 8L).map(i => (i, Some(i.toDouble))).toDF("id", "v")
      .unionAll(Seq((9L, None: Option[Double])).toDF("id", "v"))
    val out = Relational.quantileBins(df, col("v"), Seq(0.25, 0.5, 0.75))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L,
      5L -> 2L, 6L -> 2L, 7L -> 3L, 8L -> 3L, 9L -> -1L))
    // ~equal bucket sizes on a bigger uniform set
    val big = (1L to 1000L).map(i => (i, i.toDouble)).toDF("id", "v")
    val sizes = Relational.quantileBins(big, col("v"), Seq(0.25, 0.5, 0.75))
      .groupBy("bin").count().as[(Long, Long)].collect().toMap
    assert(sizes.values.forall(c => c >= 249 && c <= 251))
  }

  test("applyChangelog: latest-wins upserts, deletes, inserts, pass-through") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("k", "v")
    val changes = Seq(
      (2L, "x", 1L, "D"),             // delete key 2
      (3L, "c1", 1L, "U"),            // superseded...
      (3L, "c2", 2L, "U"),            // ...by seq 2
      (9L, "new", 1L, "I"),           // brand-new key
      (5L, "ghost", 1L, "I"),         // insert...
      (5L, "gone", 2L, "D")           // ...then deleted: never appears
    ).toDF("k", "v", "seq", "op")
    val out = Relational.applyChangelog(base, changes, Seq("k"),
        col("seq"), col("op"))
      .as[(Long, String)].collect().toSet
    assert(out == Set((1L, "a"), (3L, "c2"), (4L, "d"), (9L, "new")))
  }

  test("prefixSums: exact inclusive running totals, partition-layout-proof") {
    val df = Seq((3L, 10L, 1L), (1L, 5L, 2L), (2L, 7L, 3L), (4L, 0L, 4L))
      .toDF("o", "a", "b")
    def run(d: org.apache.spark.sql.DataFrame) =
      Relational.prefixSums(d, Seq(col("o")), Seq(col("a") -> "ca", col("b") -> "cb"))
        .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4))).toSet
    val expected = Set(
      (1L, 5L, 2L), (2L, 12L, 5L), (3L, 22L, 6L), (4L, 22L, 10L))
    assert(run(df) == expected)
    assert(run(df.repartition(7)) == expected)
    graft.core.CacheRegistry.unpersistAll()
  }

  test("prefixSum treats null addends as zero and keeps every row") {
    val df = Seq((1L, Some(2L)), (2L, None), (3L, Some(5L))).toDF("o", "v")
    val got = Relational.prefixSum(df, Seq(col("o")), col("v"), "c")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 7L))
    graft.core.CacheRegistry.unpersistAll()
  }

  test("applyChangelog with an empty changelog is the identity") {
    val base = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val none = Seq.empty[(Long, String, Long, String)].toDF("k", "v", "seq", "op")
    val out = Relational.applyChangelog(base, none, Seq("k"), col("seq"), col("op"))
      .as[(Long, String)].collect().toSet
    assert(out == Set((1L, "a"), (2L, "b")))
  }

  test("debounce: gap rule splits bursts, boundary gap stays merged") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000L)
    // key 1: events at 0s, 5s, 6s, 100s with 10s gap -> bursts {0,5,6}, {100}
    // an event exactly gapUs after the previous (5s -> 15s would break;
    // 5s -> 15s is > 10s? no: strict > breaks; equal stays merged)
    val df = Seq(
      (1L, ts(0), 1L), (1L, ts(5), 2L), (1L, ts(6), 3L), (1L, ts(100), 4L),
      (2L, ts(0), 5L), (2L, ts(10), 6L) // exactly the gap: same burst
    ).toDF("k", "ts", "id")
    val out = Relational.debounce(df, col("k"), col("ts"), Seq(col("id")),
        gapUs = 10L * 1000000L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out == Map(
      (1L, 1L) -> ((0L, 6000000L, 3L)),
      (1L, 2L) -> ((100000000L, 100000000L, 1L)),
      (2L, 1L) -> ((0L, 10000000L, 2L))))
  }

  test("islands: consecutive runs collapse, gaps split, duplicates ignored") {
    val df = Seq(
      (1L, 10L), (1L, 11L), (1L, 12L), (1L, 14L), (1L, 14L), (1L, 15L),
      (2L, 7L)
    ).toDF("k", "d")
    val out = Relational.islands(df, col("k"), col("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(out == Set((1L, 10L, 12L, 3L), (1L, 14L, 15L, 2L), (2L, 7L, 7L, 1L)))
  }

  test("asOfJoinNearest: closer side wins, ties go backward, no-match is null") {
    val left = Seq((1L, 100L, "p1"), (1L, 200L, "p2"), (2L, 50L, "p3"))
      .toDF("k", "t", "id")
    // k=1 clicks at 90 and 130: p1(100) -> 90 (dist 10) vs 130 (30) = back;
    // p2(200) -> 130 (dist 70) forward side empty beyond -> back 130
    // k=2 has no right rows -> nulls
    val right = Seq((1L, 90L), (1L, 130L)).toDF("k", "rt")
      .withColumn("rv", col("rt"))
    val out = Relational.asOfJoinNearest(left, right, "k", "t", "rt", Seq("rv"))
      .collect().map(r => r.getString(2) -> ((Option(r.get(3)), Option(r.get(4))))).toMap
    assert(out("p1") == ((Some(90L), Some(10L))))
    assert(out("p2") == ((Some(130L), Some(70L))))
    assert(out("p3") == ((None, None)))
    // exact tie: left at 110 sits 20 from both 90 and 130 -> backward 90
    val tieL = Seq((1L, 110L, "pt")).toDF("k", "t", "id")
    val tie = Relational.asOfJoinNearest(tieL, right, "k", "t", "rt", Seq("rv"))
      .collect().head
    assert(tie.getLong(3) == 90L && tie.getLong(4) == 20L)
  }

  test("gapFillInterp: exact line between anchors, edges stay null") {
    // key a: (0, 100), (4, 300) -> day 1..3 interpolate 150, 200, 250;
    // key b: single point -> no gaps, value passes through
    val df = Seq(("a", 0L, 100L), ("a", 4L, 300L), ("b", 7L, 9L))
      .toDF("k", "tick", "v")
    val out = Relational.gapFillInterp(df, Seq("k"), "tick", 1L, "v")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((Option(r.get(2)), r.getBoolean(3)))).toMap
    assert(out(("a", 0L)) == ((Some(100L), false)))
    assert(out(("a", 1L)) == ((Some(150L), true)))
    assert(out(("a", 2L)) == ((Some(200L), true)))
    assert(out(("a", 3L)) == ((Some(250L), true)))
    assert(out(("a", 4L)) == ((Some(300L), false)))
    assert(out(("b", 7L)) == ((Some(9L), false)))
    // downward slope truncates toward zero, matching DuckDB //:
    // (10, 0) to (13, -2): num at day 11 = -2*1 -> -2 div 3 = 0
    val down = Seq(("c", 10L, 0L), ("c", 13L, -2L)).toDF("k", "tick", "v")
    val d2 = Relational.gapFillInterp(down, Seq("k"), "tick", 1L, "v")
      .collect().map(r => r.getLong(1) -> r.get(2)).toMap
    assert(d2(11L) == 0L && d2(12L) == -1L)
  }

  test("modePerKey: max count wins, ties break to the smallest value") {
    val df = Seq(
      (1L, "b"), (1L, "b"), (1L, "a"),           // b wins on count
      (2L, "z"), (2L, "y"),                      // tie -> lexicographic min y
      (3L, "x")
    ).toDF("k", "v")
    val out = Relational.modePerKey(df, col("k"), col("v"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out == Map(1L -> (("b", 2L)), 2L -> (("y", 1L)), 3L -> (("x", 1L))))
  }

  test("paretoFrontier2d: staircase survives, equal-y larger-x dominates") {
    // per-x maxima: 1→9, 2→7, 3→7, 4→3, 5→3; staircase keeps (1,9),
    // (3,7), (5,3): x=2 is dominated by x=3 at EQUAL y, x=4 by x=5
    val df = Seq((1L, 9L), (1L, 2L), (2L, 7L), (3L, 7L), (3L, 7L),
      (3L, 1L), (4L, 3L), (5L, 3L)).toDF("x", "y")
    val out = Relational.paretoFrontier2d(df, col("x"), col("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((1L, 9L, 1L), (3L, 7L, 2L), (5L, 3L, 1L)))
    // a single point is trivially the whole frontier
    assert(Relational.paretoFrontier2d(
      Seq((4L, 4L)).toDF("x", "y"), col("x"), col("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((4L, 4L)))
    // a strictly increasing diagonal keeps ONLY the max corner
    val diag = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("x", "y")
    assert(Relational.paretoFrontier2d(diag, col("x"), col("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((3L, 3L)))
  }
}
