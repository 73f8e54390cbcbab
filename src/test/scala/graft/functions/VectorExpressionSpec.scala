package graft.functions

import graft.SparkSpec
import graft.functions.VectorFunctions._
import org.apache.spark.sql.functions._

class VectorExpressionSpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (1L, Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
    (2L, Array(0.0f, 0.0f, 0.0f), Array(1.0f, 1.0f, 1.0f)),
    (3L, Array(-1.5f, 2.25f, 0.125f), Array(0.5f, -0.25f, 8.0f))
  ).toDF("id", "a", "b")

  test("codegen dot and cosine are bit-identical to the HOF reference forms") {
    val out = vecs.select(
      dot(col("a"), col("b")).as("d_cg"), dotHof(col("a"), col("b")).as("d_hof"),
      cosine(col("a"), col("b")).as("c_cg"), cosineHof(col("a"), col("b")).as("c_hof"))
      .collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(3)))
    }
  }

  test("cosine of a zero vector is 0.0, not NaN") {
    val c = vecs.where(col("id") === 2).select(cosine(col("a"), col("b"))).as[Double].head()
    assert(c == 0.0)
  }

  test("null arrays, null elements, and length mismatches all propagate null (HOF contract)") {
    val df = Seq((Some(Array(1.0f)), Option.empty[Array[Float]])).toDF("a", "b")
    assert(df.select(cosine(col("a"), col("b"))).collect().head.isNullAt(0))

    val ragged = Seq((Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f))).toDF("a", "b")
    val r = ragged.select(dot(col("a"), col("b")).as("d"), dotHof(col("a"), col("b")).as("h"))
      .collect().head
    assert(r.isNullAt(0) && r.isNullAt(1)) // codegen and HOF agree

    val withNullElem = Seq((Seq(Some(1.0f), None, Some(2.0f)), Seq(Some(1.0f), Some(1.0f), Some(1.0f))))
      .toDF("a", "b")
    val n = withNullElem
      .select(cosine(col("a"), col("b")).as("c"), cosineHof(col("a"), col("b")).as("h"))
      .collect().head
    assert(n.isNullAt(0) && n.isNullAt(1))
  }

  test("expressions survive both codegen and interpreted paths") {
    val interp = vecs.select(cosine(col("a"), col("b")).as("c"))
    // force interpreted eval by filtering through a plan with codegen off
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val a = interp.as[Double].collect().toSeq
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      val b = interp.as[Double].collect().toSeq
      assert(a == b)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("hyperplaneBucket is deterministic and within range") {
    val buckets = vecs.select(hyperplaneBucket(col("a"), bits = 6, seed = 7L).as("bk"))
      .as[Long].collect().toSeq
    assert(buckets == vecs.select(hyperplaneBucket(col("a"), 6, 7L)).as[Long].collect().toSeq)
    assert(buckets.forall(b => b >= 0 && b < 64))
    assert(HyperplaneBucket.weight(7L, 0, 0) == HyperplaneBucket.weight(7L, 0, 0))
  }

  test("type mismatch is rejected at analysis") {
    val bad = Seq((Array(1), Array(1.0f))).toDF("x", "y")
    intercept[org.apache.spark.sql.AnalysisException](
      bad.select(cosine(col("x"), col("y"))).collect())
  }

  test("nearestCentroid assigns the closest cell, ties to the lowest id, both eval paths") {
    val cents = Array(Array(0.0, 0.0), Array(10.0, 0.0), Array(10.0, 0.0))
    val pts = Seq(
      (1L, Array(1.0f, 1.0f)),   // nearest cell 0
      (2L, Array(9.0f, 0.5f)),   // nearest cells 1 and 2 tie -> 1
      (3L, Array(5.0f, 0.0f))    // equidistant 0 vs 1/2 tie -> 0
    ).toDF("id", "v")
    val sel = pts.orderBy("id").select(nearestCentroid(col("v"), cents).as("c"))
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      val cg = sel.as[Int].collect().toSeq
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interp = sel.as[Int].collect().toSeq
      assert(cg == Seq(0, 1, 0))
      assert(interp == cg)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    // dimension mismatch against every centroid -> null, not a crash
    val ragged = Seq((1L, Array(1.0f, 2.0f, 3.0f))).toDF("id", "v")
    assert(ragged.select(nearestCentroid(col("v"), cents)).collect().head.isNullAt(0))
  }

  test("nearestCentroids returns the p nearest cells ascending, both eval paths") {
    val cents = Array(Array(0.0, 0.0), Array(10.0, 0.0), Array(0.0, 10.0))
    val pts = Seq(
      (1L, Array(1.0f, 1.0f)),   // order: 0, then 1 (dist 82) ties 2 (82) -> 1
      (2L, Array(9.0f, 1.0f))    // order: 1, then 0 (82) vs 2 (162) -> 0
    ).toDF("id", "v")
    val sel = pts.orderBy("id").select(nearestCentroids(col("v"), cents, 2).as("c"))
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      val cg = sel.as[Seq[Int]].collect().toSeq
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interp = sel.as[Seq[Int]].collect().toSeq
      assert(cg == Seq(Seq(0, 1), Seq(1, 0)))
      assert(interp == cg)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    // dim-mismatched centroids are skipped; all mismatched -> null
    val mixed = Array(Array(0.0, 0.0), Array(1.0, 2.0, 3.0))
    val pts2 = Seq((1L, Array(1.0f, 1.0f))).toDF("id", "v")
    assert(pts2.select(nearestCentroids(col("v"), mixed, 2)).as[Seq[Int]].head() == Seq(0))
    val ragged = Seq((1L, Array(1.0f, 2.0f, 3.0f, 4.0f))).toDF("id", "v")
    assert(ragged.select(nearestCentroids(col("v"), mixed, 2)).collect().head.isNullAt(0))
    intercept[IllegalArgumentException](nearestCentroids(col("v"), mixed, 3))
  }

  test("pqEncode/pqLut/codeLookupSum: ADC equals the exact dot against the reconstruction") {
    // 2 subspaces × 2 codewords of dim 2
    val codebooks = Array(
      Array(Array(0.0, 0.0), Array(1.0, 1.0)),
      Array(Array(2.0, 0.0), Array(0.0, 2.0)))
    val df = Seq(
      (1L, Array(0.9f, 1.1f, 1.9f, 0.1f)),  // codes (1, 0), reconstruction (1,1,2,0)
      (2L, Array(0.1f, -0.1f, 0.0f, 1.8f))  // codes (0, 1), reconstruction (0,0,0,2)
    ).toDF("id", "v")
    val enc = df.orderBy("id").select(pqEncode(col("v"), codebooks).as("c"))
      .as[Seq[Int]].collect().toSeq
    assert(enc == Seq(Seq(1, 0), Seq(0, 1)))
    // query (1,0,0,1): lut = [dot((1,0),cw) per sub1, dot((0,1),cw) per sub2]
    val q = Seq((Array(1.0f, 0.0f, 0.0f, 1.0f), enc.head.toArray, enc(1).toArray))
      .toDF("qv", "c1", "c2")
    val out = q.select(
      pqLut(col("qv"), codebooks).as("lut"),
      codeLookupSum(col("c1"), pqLut(col("qv"), codebooks), 2).as("s1"),
      codeLookupSum(col("c2"), pqLut(col("qv"), codebooks), 2).as("s2"))
      .collect().head
    assert(out.getSeq[Double](out.fieldIndex("lut")).toList == List(0.0, 1.0, 0.0, 2.0))
    assert(out.getAs[Double]("s1") == 1.0) // dot((1,0,0,1),(1,1,2,0)) = 1
    assert(out.getAs[Double]("s2") == 2.0) // dot((1,0,0,1),(0,0,0,2)) = 2
    // defensive nulls: wrong dim -> null encode; out-of-range code -> null sum
    val bad = Seq((Array(1.0f, 2.0f, 3.0f), Array(5, 0), Array(0.0, 1.0, 0.0, 2.0)))
      .toDF("v", "c", "lut")
    assert(bad.select(pqEncode(col("v"), codebooks)).collect().head.isNullAt(0))
    assert(bad.select(codeLookupSum(col("c"), col("lut"), 2)).collect().head.isNullAt(0))
  }
}
