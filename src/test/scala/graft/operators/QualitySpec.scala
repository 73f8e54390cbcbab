package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualitySpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (1L, Some("a"), 5.0), (2L, Some("b"), 50.0), (2L, Some("b"), 7.0),
    (3L, None, -1.0)
  ).toDF("id", "tag", "v")

  test("expect counts violations per check in one report") {
    val report = Quality.expect(df,
      Seq(
        Quality.notNull("tag"),                       // 1 null
        Quality.inRange("v", 0.0, 10.0),              // 50.0 and -1.0
        Quality.accepted("tag", Seq("a", "b")),       // null not accepted
        Quality.satisfies("id_positive", col("id") > 0),
        Quality.rowCountBetween(1L, 100L)),
      unique = Seq(Seq("id"), Seq("id", "tag")))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(report("not_null(tag)") == ((1L, false)))
    assert(report("in_range(v)") == ((2L, false)))
    assert(report("accepted(tag)") == ((1L, false)))
    assert(report("satisfies(id_positive)") == ((0L, true)))
    assert(report("row_count[1,100]") == ((0L, true)))
    assert(report("unique(id)") == ((1L, false)))      // id=2 duplicated
    assert(report("unique(id,tag)") == ((1L, false)))  // (2,b) duplicated
  }

  test("requireAll throws listing every failed check, passes on a clean frame") {
    val ex = intercept[IllegalStateException] {
      Quality.requireAll(df, Seq(Quality.notNull("tag"), Quality.inRange("v", 0, 10)))
    }
    assert(ex.getMessage.contains("not_null(tag): 1"))
    assert(ex.getMessage.contains("in_range(v): 2"))
    Quality.requireAll(df, Seq(Quality.notNull("id")), unique = Seq(Seq("id", "tag", "v")))
  }

  test("snapshotDiff classifies added/removed/changed/unchanged by normalized fingerprint") {
    val v1 = Seq((1L, "alpha beta"), (2L, "gamma"), (3L, "delta")).toDF("id", "text")
    val v2 = Seq((1L, "ALPHA   beta"), (2L, "gamma prime"), (4L, "epsilon")).toDF("id", "text")
    val out = Quality.snapshotDiff(v1, v2, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(
      1L -> "unchanged", // case/whitespace normalize away
      2L -> "changed",
      3L -> "removed",
      4L -> "added"))
  }

  test("expect rejects duplicate check names up front with the culprits listed") {
    val ex = intercept[IllegalArgumentException] {
      Quality.expect(df, Seq(Quality.inRange("v", 0, 10), Quality.inRange("v", 5, 50)))
    }
    assert(ex.getMessage.contains("in_range(v)"))
  }

  test("null predicate rows count as satisfies violations (coalesce false)") {
    val d2 = Seq((Some(1.0)), (None: Option[Double])).toDF("x")
    val r = Quality.expect(d2, Seq(Quality.satisfies("x_pos", col("x") > 0)))
      .head()
    assert(r.getLong(1) == 1L) // the null row fails the predicate
  }

  test("scd2Merge covers all five branches in one merge") {
    // history: k=1 unchanged, k=2 changed, k=3 deleted, k=4 arrives
    // new; k=2 also carries an already-closed prior version that must
    // pass through untouched.
    val hist = Seq(
      (1L, "a", Some(0L), None: Option[Long]),
      (2L, "b", Some(5L), None: Option[Long]),
      (2L, "b0", Some(0L), Some(5L)),
      (3L, "c", Some(0L), None: Option[Long])
    ).toDF("k", "attr", "valid_from", "valid_to")
    val snap = Seq((1L, "a"), (2L, "B!"), (4L, "d")).toDF("k", "attr")
    val out = Quality.scd2Merge(hist, snap, Seq("k"), Seq("attr"), asOf = 10L)
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getLong(2), if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet
    assert(out == Set(
      (1L, "a", 0L, None),          // unchanged: still open
      (2L, "b", 5L, Some(10L)),     // changed: closed at asOf...
      (2L, "B!", 10L, None),        // ...new version opened
      (2L, "b0", 0L, Some(5L)),     // closed history passes through
      (3L, "c", 0L, Some(10L)),     // missing from snapshot: closed
      (4L, "d", 10L, None)))        // insert
  }

  test("scd2Merge closeMissing=false leaves absent keys open; null attrs compare null-safe") {
    val hist = Seq((1L, None: Option[String], Some(0L), None: Option[Long]))
      .toDF("k", "attr", "valid_from", "valid_to")
    val snapSame = Seq((1L, None: Option[String])).toDF("k", "attr")
    val same = Quality.scd2Merge(hist, snapSame, Seq("k"), Seq("attr"), asOf = 7L)
      .collect()
    assert(same.length == 1 && same.head.isNullAt(3)) // null == null: unchanged
    val snapEmpty = Seq.empty[(Long, Option[String])].toDF("k", "attr")
    val open = Quality.scd2Merge(hist, snapEmpty, Seq("k"), Seq("attr"),
      asOf = 7L, closeMissing = false).collect()
    assert(open.length == 1 && open.head.isNullAt(3)) // left open
  }

  test("chiSquareDrift: hand-checked cleared-denominator statistic") {
    // base g: bins {0:3, 1:1}; current g: {0:1, 1:3} — smoothed
    // a1={4,2} o1={2,4}, A=B=6; terms: 144e6/144 + 144e6/72 = 3e6
    val base = Seq(("g", 0L), ("g", 0L), ("g", 0L), ("g", 1L)).toDF("g", "bin")
    val cur = Seq(("g", 0L), ("g", 1L), ("g", 1L), ("g", 1L)).toDF("g", "bin")
    val r = Quality.chiSquareDrift(base, cur, Seq("g"), col("bin")).head()
    assert((r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)) ==
      (("g", 2L, 3000000L, 3.0)))
    // identical distributions: zero drift exactly
    val same = Quality.chiSquareDrift(base, base, Seq("g"), col("bin")).head()
    assert(same.getLong(2) == 0L && same.getDouble(3) == 0.0)
    // disjoint bin sets still finite (smoothing), one-sided bins count
    val shifted = Quality.chiSquareDrift(
      base, Seq(("g", 9L), ("g", 9L)).toDF("g", "bin"), Seq("g"), col("bin")).head()
    assert(shifted.getLong(1) == 3L && shifted.getLong(2) > 0L)
  }

  test("psi: identical distributions score ~0; a full shift scores large") {
    import spark.implicits._
    val ref = Seq(1L, 1L, 2L, 2L, 3L, 3L).toDF("bin")
    val same = Quality.psi(ref, ref, col("bin")).head()
    assert(same.getAs[Long]("n_bins") == 3L)
    assert(same.getAs[Long]("n_ref") == 6L && same.getAs[Long]("n_cur") == 6L)
    assert(same.getAs[Double]("psi") == 0.0) // shares identical bin-by-bin
    // disjoint supports: smoothing keeps it finite but large
    val cur = Seq(8L, 8L, 9L, 9L, 9L, 9L).toDF("bin")
    val far = Quality.psi(ref, cur, col("bin")).head()
    assert(far.getAs[Long]("n_bins") == 5L)
    assert(far.getAs[Double]("psi") > 1.0)
    // null bins are excluded from both sides
    val withNull = ref.unionAll(Seq[Option[Long]](None).toDF("bin"))
    assert(Quality.psi(withNull, ref, col("bin")).head()
      .getAs[Long]("n_ref") == 6L)
  }

  test("jsDivergence: identical corpora 0, disjoint corpora ln 2 (6dp terms)") {
    import spark.implicits._
    val a = Seq("x", "x", "y").toDF("w")
    val same = Quality.jsDivergence(a, a, col("w")).head()
    assert(same.getAs[Long]("n_tokens") == 2L)
    assert(same.getAs[Long]("n_a") == 3L && same.getAs[Long]("n_b") == 3L)
    assert(same.getAs[Double]("js") == 0.0)
    // disjoint vocabularies: js = ln 2, as two 6dp-rounded half-terms
    val b = Seq("p", "p", "q").toDF("w")
    val far = Quality.jsDivergence(a, b, col("w")).head()
    assert(far.getAs[Long]("n_tokens") == 4L)
    // each one-sided token contributes p·ln2/2; rounded terms sum to
    // 0.693148 (vs ln2 = 0.6931472 — the 6dp discipline, not drift)
    assert(math.abs(far.getAs[Double]("js") - math.log(2.0)) < 1e-5)
  }

  test("lDiversity: a large uniform class violates what k-anonymity misses") {
    // class (a): 4 rows but all sensitive 's1' -> k-anon fine at k=3,
    // l-diversity violated at l=2; class (b): 2 rows, 2 values -> ok
    val df = Seq(("a", "s1"), ("a", "s1"), ("a", "s1"), ("a", "s1"),
      ("b", "s1"), ("b", "s2")).toDF("q", "s")
    val kr = Quality.kAnonymity(df, Seq(col("q")), k = 3L).collect().head
    assert(kr.getLong(2) == 1L) // only the small class violates k-anon
    val lr = Quality.lDiversity(df, Seq(col("q")), col("s"), l = 2L)
      .collect().head
    assert(lr.getLong(1) == 2L && lr.getLong(2) == 1L)
    assert(lr.getLong(3) == 4L && lr.getLong(4) == 1L) // the UNIFORM class
  }

  test("tCloseness: one-sided classes score the exact integer EMD; matched class scores 0") {
    // A: 4×v0, B: 4×v1, C: 2×v0 + 2×v1. Global v0=6, v1=6, N=12, m=2.
    // EMD numerators: A |4·12−6·4| = 24 -> t = 24e6/(1·4·12) = 500000;
    // B |0·12−6·4| = 24 -> 500000; C |2·12−6·4| = 0 -> 0.
    val df = (Seq.fill(4)(("A", 0L)) ++ Seq.fill(4)(("B", 1L)) ++
      Seq(("C", 0L), ("C", 0L), ("C", 1L), ("C", 1L))).toDF("q", "v")
    val r = Quality.tCloseness(df, Seq(col("q")), col("v"), tPpm = 400000L)
      .collect().head
    assert(r.getAs[Long]("n_rows") == 12L && r.getAs[Long]("n_classes") == 3L)
    assert(r.getAs[Long]("m") == 2L)
    assert(r.getAs[Long]("n_violating_classes") == 2L)
    assert(r.getAs[Long]("rows_at_risk") == 8L)
    assert(r.getAs[Long]("max_t_ppm") == 500000L)
    // a class missing a domain value still accumulates its -q·nc term:
    // single class == global -> t = 0 everywhere
    val uni = Seq(("A", 0L), ("A", 1L), ("A", 2L)).toDF("q", "v")
    val u = Quality.tCloseness(uni, Seq(col("q")), col("v"), tPpm = 0L)
      .collect().head
    assert(u.getAs[Long]("max_t_ppm") == 0L && u.getAs[Long]("m") == 3L)
  }

  test("kAnonymity: small classes counted, nulls form their own class") {
    // classes: (a,x):3 ok, (a,y):1 violating, (null,x):2 violating at k=3
    val df = Seq(
      (Some("a"), "x"), (Some("a"), "x"), (Some("a"), "x"),
      (Some("a"), "y"), (None, "x"), (None, "x")
    ).toDF("q1", "q2")
    val r = Quality.kAnonymity(df, Seq(col("q1"), col("q2")), k = 3L)
      .collect().head
    assert(r.getLong(0) == 6L && r.getLong(1) == 3L)
    assert(r.getLong(2) == 2L && r.getLong(3) == 3L && r.getLong(4) == 500000L)
  }
}
