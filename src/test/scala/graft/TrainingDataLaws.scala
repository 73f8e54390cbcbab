package graft

import graft.operators.TrainingData
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Algebraic laws of the corpus-preparation operators: chunking must
  * partition the token stream exactly when stride == window and cover
  * it (with overlap ≤ window−stride) otherwise; packing offsets must
  * tile each shard's token tape with no gaps; sampling must be a
  * deterministic filter (idempotent, subset-monotone in the fraction).
  */
object TrainingDataLaws extends Properties("TrainingData") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val genWords = Gen.chooseNum(0, 40).flatMap(n =>
    Gen.listOfN(n, Gen.oneOf("alpha", "beta", "gamma", "delta")))
  private val genDocs = Gen.listOfN(5, genWords)

  property("chunkWords with stride == window partitions the tokens exactly") =
    forAll(genDocs, Gen.chooseNum(1, 10)) { (docs, w) =>
      val df = docs.zipWithIndex.map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      val chunks = TrainingData.chunkWords(df, Seq("doc_id"), "text", w, w)
        .select("doc_id", "chunk_id", "chunk")
        .as[(Long, Long, String)].collect()
      docs.zipWithIndex.forall { case (ws, i) =>
        val mine = chunks.filter(_._1 == i.toLong).sortBy(_._2)
        val rebuilt = mine.map(_._3).filter(_.nonEmpty).flatMap(_.split(" ")).toSeq
        rebuilt == ws // concatenating the chunks rebuilds the token stream
      }
    }

  property("packSequences offsets tile each shard tape with no gaps") =
    forAll(Gen.listOfN(12, Gen.chooseNum(0, 600)), Gen.chooseNum(100L, 1000L)) { (tokens, budget) =>
      val df = tokens.zipWithIndex
        .map { case (n, i) => (i.toLong, s"s${i % 3}", n) }.toDF("id", "src", "n")
      val out = TrainingData.packSequences(df, Seq(col("src")), Seq(col("id")), col("n"), budget)
        .select("src", "id", "n", "seq_index", "seq_offset")
        .as[(String, Long, Int, Long, Long)].collect()
      out.groupBy(_._1).forall { case (_, rows) =>
        val sorted = rows.sortBy(_._2)
        val begins = sorted.map(r => r._4 * budget + r._5) // absolute tape offset
        begins.head == 0L &&
          sorted.zip(begins).forall { case (r, b) => r._5 < budget && b >= 0 } &&
          begins.zip(sorted).toSeq.sliding(2).forall {
            case Seq((b1, r1), (b2, _)) => b2 == b1 + r1._3 // next doc starts where this ends
            case _ => true
          }
      }
    }

  property("hashSample is an idempotent, fraction-monotone filter") =
    forAll(Gen.chooseNum(0.0, 1.0), Gen.chooseNum(0.0, 1.0)) { (f1, f2) =>
      val (lo, hi) = if (f1 <= f2) (f1, f2) else (f2, f1)
      val df = spark.range(300).toDF("id")
      val small = TrainingData.hashSample(df, col("id"), lo).as[Long].collect().toSet
      val big = TrainingData.hashSample(df, col("id"), hi).as[Long].collect().toSet
      val again = TrainingData.hashSample(
        TrainingData.hashSample(df, col("id"), hi), col("id"), hi).as[Long].collect().toSet
      small.subsetOf(big) && again == big
    }
}
