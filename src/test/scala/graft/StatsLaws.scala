package graft

import graft.operators.{Analytics, Quality, Ranking}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Algebraic laws of the round-8 statistical family — the invariances
  * each estimator is DEFINED by, checked on random small frames:
  * Kruskal-Wallis must not move under any monotone value transform
  * (it sees only ranks), ANOVA F must not move under group relabeling
  * or value translation, McNemar under arm swap mirrors its discordant
  * cells, JS divergence and Cohen's κ are symmetric in their two
  * inputs, and the BH step-up's reject set must grow monotonically
  * with the FDR budget.
  */
object StatsLaws extends Properties("Stats") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val genGrouped: Gen[List[(String, Long)]] = for {
    n <- Gen.chooseNum(6, 30)
    rows <- Gen.listOfN(n, for {
      g <- Gen.oneOf("a", "b", "c")
      v <- Gen.chooseNum(-50L, 50L)
    } yield (g, v))
  } yield rows

  property("kruskalWallis is invariant under monotone value transforms") =
    forAll(genGrouped) { rows =>
      val df = rows.toDF("g", "v")
      val base = Analytics.kruskalWallis(df, col("g"), col("v")).head()
      // 3v + 7 is strictly monotone: identical midranks, identical H
      val mono = Analytics.kruskalWallis(df, col("g"), col("v") * 3L + 7L).head()
      base.toSeq == mono.toSeq
    }

  property("anovaF is invariant under group relabeling and value translation") =
    forAll(genGrouped) { rows =>
      val df = rows.toDF("g", "v")
      val base = Analytics.anovaF(df, col("g"), col("v")).head()
      val relabeled = Analytics.anovaF(
        rows.map { case (g, v) => (g.toUpperCase, v) }.toDF("g", "v"),
        col("g"), col("v")).head()
      val shifted = Analytics.anovaF(df, col("g"), col("v") + 1000L).head()
      def f(r: org.apache.spark.sql.Row) =
        if (r.isNullAt(2)) None else Some(r.getDouble(2))
      val ok = base.getLong(0) == relabeled.getLong(0) &&
        f(base) == f(relabeled) &&
        // translation: exact up to the 6dp per-group term rounding
        ((f(base), f(shifted)) match {
          case (Some(x), Some(y)) => math.abs(x - y) < 1e-3 * math.max(1.0, x.abs)
          case (a, b) => a.isEmpty == b.isEmpty
        })
      ok
    }

  private val genPairs: Gen[List[(Long, Long, Long)]] = for {
    n <- Gen.chooseNum(3, 25)
    rows <- Gen.listOfN(n, for {
      a <- Gen.oneOf(0L, 1L)
      b <- Gen.oneOf(0L, 1L)
    } yield (a, b))
  } yield rows.zipWithIndex.map { case ((a, b), i) => (i.toLong, a, b) }

  property("mcnemar arm swap mirrors discordant cells, chi2 unchanged") =
    forAll(genPairs) { rows =>
      val df = rows.toDF("u", "a", "b")
      val x = Analytics.mcnemar(df, col("u"), col("a") === 1L, col("b") === 1L).head()
      val y = Analytics.mcnemar(df, col("u"), col("b") === 1L, col("a") === 1L).head()
      x.getLong(1) == y.getLong(2) && x.getLong(2) == y.getLong(1) &&
        (x.isNullAt(3) == y.isNullAt(3)) &&
        (x.isNullAt(3) || x.getLong(3) == y.getLong(3))
    }

  private val genTokens: Gen[List[String]] = for {
    n <- Gen.chooseNum(1, 40)
    ts <- Gen.listOfN(n, Gen.oneOf("x", "y", "z", "w"))
  } yield ts

  property("jsDivergence is symmetric and bounded by ln 2") =
    forAll(genTokens, genTokens) { (ta, tb) =>
      val a = ta.toDF("w"); val b = tb.toDF("w")
      val ab = Quality.jsDivergence(a, b, col("w")).head()
      val ba = Quality.jsDivergence(b, a, col("w")).head()
      val js = ab.getAs[Double]("js")
      js == ba.getAs[Double]("js") &&
        ab.getAs[Long]("n_a") == ba.getAs[Long]("n_b") &&
        js >= -1e-6 && js <= math.log(2.0) + 1e-5
    }

  private val genLabels: Gen[List[(String, String)]] = for {
    n <- Gen.chooseNum(2, 30)
    rows <- Gen.listOfN(n, for {
      g <- Gen.oneOf("a", "b", "c")
      p <- Gen.oneOf("a", "b", "c")
    } yield (g, p))
  } yield rows

  property("agreementStats kappa is symmetric in gold and pred") =
    forAll(genLabels) { rows =>
      val df = rows.toDF("gold", "pred")
      val x = Ranking.agreementStats(df, col("gold"), col("pred")).head()
      val y = Ranking.agreementStats(df, col("pred"), col("gold")).head()
      // S = Sigma t_c p_c, A and N all symmetric under the swap
      (x.isNullAt(4) == y.isNullAt(4)) &&
        (x.isNullAt(4) || x.getLong(4) == y.getLong(4)) &&
        x.getLong(2) == y.getLong(2) && x.getLong(3) == y.getLong(3)
    }

  private val genP: Gen[List[(Long, Long)]] = for {
    n <- Gen.chooseNum(1, 30)
    ps <- Gen.listOfN(n, Gen.chooseNum(0L, 1000000L))
  } yield ps.zipWithIndex.map { case (p, i) => (i.toLong, p) }

  property("bhFdr reject set is monotone in the FDR budget") =
    forAll(genP, Gen.chooseNum(1L, 500000L), Gen.chooseNum(500001L, 1000000L)) {
      (rows, qLo, qHi) =>
        val df = rows.toDF("id", "p")
        def rejected(q: Long): Set[Long] =
          Analytics.bhFdr(df, col("id"), col("p"), qPpm = q)
            .where(col("rejected")).select("id").as[Long].collect().toSet
        rejected(qLo).subsetOf(rejected(qHi))
    }

  // DISTINCT days: a per-row shift only translates the DAILY series
  // uniformly when each day holds one row (Σ(v+c) over a day adds
  // m_d·c) — the laws below are about the daily series
  private val genSeries: Gen[List[(String, Long, Long)]] = for {
    n <- Gen.chooseNum(4, 20)
    vs <- Gen.listOfN(n, Gen.chooseNum(-40L, 40L))
  } yield vs.zipWithIndex.map { case (v, i) => ("k", (i + 1).toLong, v) }

  property("changePoint D is invariant under value translation") =
    forAll(genSeries, Gen.chooseNum(-100L, 100L)) { (rows, c) =>
      // S_t -> S_t + t·c makes n·S_t − t·S_n cancel the shift exactly
      val df = rows.toDF("g", "d", "v")
      val a = Analytics.changePoint(df, col("g"), col("d"), col("v"))
        .collect().toList
      val b = Analytics.changePoint(df, col("g"), col("d"), col("v") + c)
        .collect().toList
      a.map(r => (r.getLong(1), r.getLong(2), r.getLong(3))) ==
        b.map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    }

  property("mannKendall sees only signs: invariant under monotone transforms") =
    forAll(genSeries) { rows =>
      val df = rows.toDF("g", "d", "v")
      val a = Analytics.mannKendall(df, col("g"), col("d"), col("v")).head()
      // pure scaling commutes with the daily sum (an additive shift
      // would not: Σ(5v−3) = 5Σv − 3·count mixes in the day's row count)
      val b = Analytics.mannKendall(df, col("g"), col("d"),
        col("v") * 5L).head()
      a.toSeq == b.toSeq
    }

  property("friedman is invariant under per-block value translation") =
    forAll(Gen.chooseNum(2, 6), Gen.chooseNum(2, 4)) { (nBlocks, k) =>
      // within-block ranks don't move when a block's values all shift
      val treats = (0 until k).map(i => s"t$i")
      val rows = for {
        b <- 1 to nBlocks; (t, i) <- treats.zipWithIndex
      } yield (b.toLong, t, ((b * 7 + i * i * 3) % 11).toLong)
      val df = rows.toDF("b", "t", "v")
      val shifted = rows.map { case (b, t, v) => (b, t, v + b * 100L) }
        .toDF("b", "t", "v")
      val a = Analytics.friedman(df, col("b"), col("t"), col("v")).head()
      val c = Analytics.friedman(shifted, col("b"), col("t"), col("v")).head()
      a.toSeq == c.toSeq
    }

  property("cochranQ is invariant under condition reordering") =
    forAll(Gen.listOfN(12, Gen.chooseNum(0, 7))) { masks =>
      // each unit's mask encodes its 3 condition flags
      val rows = masks.zipWithIndex.flatMap { case (m, u) =>
        Seq(("a", m & 1), ("b", (m >> 1) & 1), ("c", (m >> 2) & 1))
          .collect { case (cnd, 1) => (u.toLong, cnd) }
      }
      if (rows.isEmpty) true
      else {
        val df = rows.toDF("u", "cond")
        def q(order: Seq[String]) =
          Analytics.cochranQ(df, col("u"),
            order.map(c => c -> (col("cond") === c))).head()
        val x = q(Seq("a", "b", "c"))
        val y = q(Seq("c", "a", "b"))
        x.toSeq == y.toSeq
      }
    }
}
