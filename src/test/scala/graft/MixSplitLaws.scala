package graft

import graft.operators.{Mixer, Splitter, SplitterTree}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Algebraic laws of mixing and splitting (SURVEY §5): bag-union count
  * preservation and multiset equality for Mixer; completeness +
  * disjointness for hash splitting; completeness for complementary
  * predicates. Small generated datasets — each case runs Spark jobs.
  */
object MixSplitLaws extends Properties("MixSplit") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val genData = Gen.listOfN(40, Gen.chooseNum(-50, 50))

  property("mixer preserves the input multiset") = forAll(genData, genData) { (a, b) =>
    val flow: Flow = Map("a" -> a.toDF("v"), "b" -> b.toDF("v"))
    val out = Mixer(Seq("a", "b"), "m")(flow)("m").as[Int].collect().toSeq
    out.sorted == (a ++ b).sorted
  }

  property("hash split is a disjoint, complete partition for any fan-out") =
    forAll(genData, Gen.chooseNum(1, 5)) { (a, n) =>
      val flow: Flow = Map("in" -> a.toDF("v"))
      val names = (0 until n).map(i => s"p$i")
      val out = SplitterTree.hash("in", names, Seq(col("v")))(flow)
      val parts = names.map(out(_).as[Int].collect().toSeq)
      parts.flatten.sorted == a.sorted // complete and disjoint (multiset-exact)
    }

  property("complementary predicates partition completely") = forAll(genData) { a =>
    val flow: Flow = Map("in" -> a.toDF("v"))
    val p = col("v") >= 0
    val out = Splitter.predicates("in", Seq("pos" -> p, "neg" -> !p))(flow)
    val both = out("pos").as[Int].collect().toSeq ++ out("neg").as[Int].collect().toSeq
    both.sorted == a.sorted
  }

  property("duplicate split copies the full stream to every output") =
    forAll(genData) { a =>
      val flow: Flow = Map("in" -> a.toDF("v"))
      val out = Splitter("in", Seq("x", "y"))(flow)
      out("x").count() == a.size && out("y").count() == a.size
    }
}
