package graft.functions

import graft.SparkSpec
import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class StringExpressionSpec extends SparkSpec {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinkler.sim(UTF8String.fromString(a), UTF8String.fromString(b))

  test("jaroWinkler pins the DuckDB-verified reference values") {
    // Every expected value below is DuckDB jaro_winkler_similarity
    // output, captured verbatim — full-double equality.
    assert(jw("martha", "marhta") == 0.9611111111111111)
    assert(jw("dwayne", "duane") == 0.8400000000000001)
    assert(jw("dixon", "dicksonx") == 0.8133333333333332)
    assert(jw("abc", "abc") == 1.0)
    assert(jw("", "") == 0.0)   // DuckDB: empty input => 0, even both-empty
    assert(jw("a", "") == 0.0)
    assert(jw("abc", "xyz") == 0.0)
  }

  test("jaroWinkler operates on UTF-8 bytes like DuckDB") {
    // 'ï' is 2 bytes; byte-level semantics give these exact values
    // (captured from DuckDB) — code-point semantics would differ.
    assert(jw("naïve", "naive") == 0.8577777777777779)
    assert(jw("eeba", "naïve") == 0.47222222222222215)
  }

  test("jaro_winkler is reachable from SQL and codegen matches eval") {
    graft.GraftFunctions.register(spark)
    val rows = Seq(("martha", "marhta"), ("dwayne", "duane"), ("", ""), ("résumé", "resume"))
      .toDF("a", "b")
    val viaSql = rows.selectExpr("jaro_winkler(a, b) AS s").as[Double].collect().toSeq
    val viaCol = rows.select(StringFunctions.jaroWinkler(col("a"), col("b")).as("s"))
      .as[Double].collect().toSeq
    val direct = Seq(jw("martha", "marhta"), jw("dwayne", "duane"), jw("", ""),
      jw("résumé", "resume"))
    assert(viaSql == direct)
    assert(viaCol == direct)
  }

  test("jaroWinkler is null on null input") {
    val out = Seq((Some("a"), None: Option[String]), (Some("ab"), Some("ab")))
      .toDF("a", "b")
      .select(StringFunctions.jaroWinkler(col("a"), col("b")).as("s"))
      .collect().map(r => Option(r.get(0)))
    assert(out.toSeq == Seq(None, Some(1.0)))
  }

  test("linkageJoin blocks then verifies at the threshold") {
    val left = Seq((1L, 10, "jonathan smith"), (2L, 10, "mary jones"), (3L, 20, "mary jones"))
      .toDF("id", "block", "name")
    val right = Seq((101L, 10, "jonathon smith"), (102L, 20, "mary janes"), (103L, 30, "mary jones"))
      .toDF("rid", "rblock", "rname")
    val out = Dedup.linkageJoin(left, right,
      Seq(col("block") -> col("rblock")), col("name"), col("rname"), threshold = 0.9)
      .select("id", "rid").as[(Long, Long)].collect().toSet
    // (1,101): same block, 1 substitution -> high sim. (2,102): blocks
    // differ (10 vs 20) so never considered despite similar names.
    // (3,102): same block 20, "mary jones"/"mary janes" -> high sim.
    // (2,103)/(3,103): block 30 exists only on the right.
    assert(out == Set((1L, 101L), (3L, 102L)))
  }
}
