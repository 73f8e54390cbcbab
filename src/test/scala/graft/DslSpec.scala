package graft

import graft.Dsl._
import org.apache.spark.sql.functions._

/** The DSL-built words-count pipeline end-to-end (reference:
  * lib/dsl.ex:7-41 used by test/examples/words_count_test.exs) —
  * builder sugar must compose to the same result as the raw
  * constructors.
  */
class DslSpec extends SparkSpec {
  import spark.implicits._

  test("a DSL-built pipeline runs end-to-end and matches the raw-constructor result") {
    val counted = new java.util.concurrent.atomic.AtomicReference[Map[String, Long]](Map.empty)
    val pipeline = composite(
      sourceOf("docs", Seq("a b a", "b c").toDF("text")),
      Dsl.transform("docs")(_.select(explode(org.apache.spark.sql.functions.split(col("text"), " ")).as("word"))),
      Dsl.split("docs", "ab" -> col("word").isin("a", "b"), "rest" -> !col("word").isin("a", "b")),
      mix(Seq("ab", "rest"), "merged"),
      rename("merged" -> "words"),
      sink("words", df => counted.set(
        df.groupBy("word").count().as[(String, Long)].collect().toMap), sync = true))
    val out = pipeline(EmptyFlow)
    assert(out.isEmpty) // the sink consumed the final stream
    assert(counted.get() == Map("a" -> 2L, "b" -> 2L, "c" -> 1L))
  }
}
