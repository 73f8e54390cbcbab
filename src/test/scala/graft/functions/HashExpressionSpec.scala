package graft.functions

import graft.SparkSpec
import graft.functions.HashFunctions._
import graft.functions.TextFunctions.words
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** The fused hash-sketch kernels must be BIT-IDENTICAL to the
  * composable Spark forms they replace — otherwise swapping them would
  * silently change which near-dup pairs LSH banding surfaces.
  */
class HashExpressionSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumped over the lazy dog"),
    (3L, "completely different text with other words entirely"),
    (4L, "singleword"),
    (5L, "") // no words: minhash sig all-null, simhash dropped
  ).toDF("id", "text")

  test("fused minhash signature is bit-identical to the composable transform/array_min form") {
    val sh = docs.select(col("id"), array_distinct(words(col("text"))).as("sh"))
    val both = sh.select(
      col("id"),
      minhashSignatureFused(col("sh"), 16).as("fused"),
      Dedup.minhashSignature(transform(col("sh"), s => xxhash64(s)), 16).as("ref"))
    both.collect().foreach { r =>
      assert(r.getSeq[Any](1) == r.getSeq[Any](2), s"signature mismatch for id ${r.getLong(0)}")
    }
    // the empty doc's signature is 16 nulls, like array_min over empty
    val empty = both.where(col("id") === 5).select(col("fused")).collect().head.getSeq[Any](0)
    assert(empty.size == 16 && empty.forall(_ == null))
  }

  test("fused simhash64 is bit-identical to the explode/aggregate form; empty docs drop") {
    val fused = Dedup.simhash64(docs, "id", "text")
    val agg = Dedup.simhash64Agg(docs, "id", "text")
    val joined = fused.as("f").join(agg.as("a"), "id")
      .select(col("id"), col("f.simhash").as("sf"), col("a.simhash").as("sa"))
      .collect()
    assert(joined.length == 4) // doc 5 absent from both
    joined.foreach(r => assert(r.getLong(1) == r.getLong(2), s"simhash mismatch id ${r.getLong(0)}"))
    assert(fused.count() == 4 && agg.count() == 4)
  }

  test("fused kernels agree across codegen and interpreted eval paths") {
    val sh = docs.select(array_distinct(words(col("text"))).as("sh"))
    val sel = sh.select(
      minhashSignatureFused(col("sh"), 8).as("sig"),
      simhash64Fused(col("sh")).as("sim"))
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      val cg = sel.collect().map(_.toSeq).toSeq
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interp = sel.collect().map(_.toSeq).toSeq
      assert(cg == interp)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("fused word shingles are bit-identical to the HOF sequence/slice form") {
    val ws = docs.select(col("id"), words(col("text")).as("ws"))
    Seq(1, 2, 3, 9).foreach { n =>
      val both = ws.select(
        col("id"),
        wordShinglesFused(col("ws"), n).as("fused"),
        graft.functions.TextFunctions.wordShinglesFromWordsHof(col("ws"), n).as("ref"))
      both.collect().foreach { r =>
        assert(r.getSeq[String](1) == r.getSeq[String](2),
          s"shingle mismatch for id ${r.getLong(0)} at n=$n")
      }
    }
    // the empty doc yields the single empty-join shingle, like the HOF form
    val empty = ws.where(col("id") === 5)
      .select(wordShinglesFused(col("ws"), 2)).collect().head.getSeq[String](0)
    assert(empty == Seq(""))
  }

  test("fused char shingles, stopword ratio, subword count, rolling hash match their HOF forms") {
    import graft.functions.TextFunctions._
    val texts = Seq(
      (1L, "The quick  brown fox, and a dog!"),
      (2L, "a"),
      (3L, "it is the end of an era and the tide turns to it"),
      (4L, "numbers 12345 and w0rds mix 678"),
      (5L, ""),
      (6L, "café déjà vu naïve") // Spark ascii() is code-point based, like DuckDB ord
    ).toDF("id", "text")
    Seq(2, 3, 5).foreach { k =>
      texts.select(
        charShingles(col("text"), k).as("f"), charShinglesHof(col("text"), k).as("h"))
        .collect().foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1), s"k=$k"))
    }
    texts.select(
      stopwordRatio(col("text")).as("f"), stopwordRatioHof(col("text")).as("h"),
      subwordCountApprox(col("text")).as("sf"), subwordCountApproxHof(col("text")).as("sh"),
      rollingHash(col("text")).as("rf"), rollingHashHof(col("text")).as("rh"))
      .collect().foreach { r =>
        assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
          java.lang.Double.doubleToLongBits(r.getDouble(1)))
        assert(r.getLong(2) == r.getLong(3))
        assert(r.getLong(4) == r.getLong(5))
      }
  }

  test("non-array input is rejected at analysis") {
    intercept[org.apache.spark.sql.AnalysisException](
      docs.select(minhashSignatureFused(col("text"), 4)).collect())
    intercept[org.apache.spark.sql.AnalysisException](
      docs.select(simhash64Fused(col("id"))).collect())
  }
}
