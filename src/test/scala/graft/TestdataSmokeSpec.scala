package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Environment-drift tripwire: loads every driver-generated testdata table
  * through `SparkEntry.t()` and pins the schema contract the 125 driver
  * queries rely on. A previous testdata regeneration silently changed
  * events.ts from INT64-TIMESTAMP(NANOS) to TIMESTAMP(MICROS) and broke 31
  * queries while `sbt test` stayed green for two rounds — because no spec
  * ever read `/root/testdata`. This one does; the next physical-type drift
  * fails HERE, loudly, instead of vanishing from the driver's compare.
  *
  * Skips (with an informative cancel) if the testdata dir is absent, so the
  * suite still runs on machines without the driver volume.
  */
class TestdataSmokeSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def available = new java.io.File(dir).isDirectory
  private val tables = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  test("every testdata table loads through t() with rows") {
    assume(available, s"$dir not present on this machine")
    tables.foreach { name =>
      val df = SparkEntry.t(spark, dir, name)
      assert(df.limit(1).count() == 1L, s"$name is empty")
    }
  }

  test("events.ts normalizes to µs TimestampType whatever the physical type") {
    assume(available, s"$dir not present on this machine")
    val ev = SparkEntry.t(spark, dir, "events")
    assert(ev.schema("ts").dataType == TimestampType,
      s"t() must yield TimestampType, got ${ev.schema("ts").dataType}")
    // Sanity-bound the epoch range: a unit mix-up (ns read as µs, or µs as
    // ns) lands thousands of years away from any plausible testdata date.
    val row = ev.agg(
      min(unix_micros(col("ts"))).as("lo"),
      max(unix_micros(col("ts"))).as("hi")).head()
    val (lo, hi) = (row.getLong(0), row.getLong(1))
    val y2000 = 946684800000000L
    val y2100 = 4102444800000000L
    assert(lo >= y2000 && hi <= y2100,
      s"events.ts epoch-µs range [$lo,$hi] outside [2000,2100] — unit drift?")
  }

  test("a tiny events aggregate evaluates end-to-end") {
    assume(available, s"$dir not present on this machine")
    val ev = SparkEntry.t(spark, dir, "events")
    val counted = ev
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"))
      .agg(sum(col("n")).as("total")).head().getLong(0)
    assert(counted == ev.count(), "windowed count must cover every event")
  }

  test("documents generator invariants the closed-form web oracles lean on") {
    // q_url_norm / q_url_domain / q_html_text / q_warc recompute their
    // expected outputs arithmetically from (source, text) — which is
    // only sound while the generator keeps source lowercase/dot-free
    // (so url host-lowercasing and registrable-domain label math are
    // identity) and text single-spaced printable ASCII with no '&'/'<'
    // and no edge whitespace (so html entity decoding, tag stripping
    // and whitespace collapsing are identity). A future dataset change
    // fails HERE with a named cause instead of as a bare hash mismatch.
    assume(available, s"$dir not present on this machine")
    val docs = SparkEntry.t(spark, dir, "documents")
    val bad = docs.where(
      !col("source").rlike("^[a-z0-9_]+$") ||
        !col("text").rlike("^[ -~]*$") || // printable ASCII only
        col("text").contains("&") || col("text").contains("<") ||
        col("text").contains("  ") ||
        col("text").startsWith(" ") || col("text").endsWith(" "))
    val offenders = bad.select("doc_id").limit(3).collect().toSeq
    assert(offenders.isEmpty,
      "documents.(source,text) drifted from the shape the closed-form " +
        s"url/html/warc oracles assume — re-derive those oracles: $offenders")
  }

  test("key non-events schema columns hold their contract types") {
    assume(available, s"$dir not present on this machine")
    val li = SparkEntry.t(spark, dir, "lineitem").schema
    assert(li("l_orderkey").dataType == LongType || li("l_orderkey").dataType == IntegerType)
    val docs = SparkEntry.t(spark, dir, "documents").schema
    assert(docs("text").dataType == StringType)
    val emb = SparkEntry.t(spark, dir, "embeddings").schema
    assert(emb("embedding").dataType.isInstanceOf[ArrayType],
      s"embeddings.embedding must be an array, got ${emb("embedding").dataType}")
  }
}
