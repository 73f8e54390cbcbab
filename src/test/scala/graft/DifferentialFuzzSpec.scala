package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Relational

/** Randomized differential harness vs DuckDB (round-9 verdict #4).
  *
  * The parity-trap class — ANSI+CSE eager division, round(·,6) past
  * 2^53, HUGEINT/DECIMAL pandas double-rounding, rank ties on
  * non-unique keys, Spark `div` vs DuckDB `//` — kept being caught
  * one hand-written oracle at a time. This spec generates seeded
  * RANDOM frames and RANDOM parameters (filters, group keys, k,
  * thresholds, join directions) over ~20 operator entry points, runs
  * each case through Spark AND mirrors it in DuckDB SQL, and
  * hash-compares through the exact normalization the driver gate uses
  * (scripts/fuzz_verify.py reuses local_verify.py's comparator,
  * including the fragile-output-type check).
  *
  * Reproducibility: the seed is printed and overridable via
  * SPARK_GRAFT_FUZZ_SEED; every random draw flows from that one seed,
  * so a red case replays exactly. The default seed changes nothing
  * run-to-run — CI-stable — while any seed can be swept locally
  * (for (s <- 1 to 100) SPARK_GRAFT_FUZZ_SEED=s ...).
  *
  * The case mirrors follow the house oracle discipline
  * (graft-oracle-parity-traps): CAST every aggregate to
  * BIGINT/DOUBLE (DuckDB sum(BIGINT) is HUGEINT — fragile through
  * pandas), keep `div`/`//` numerators non-negative, give every rank
  * a total order, guard denominators in BOTH engines.
  */
class DifferentialFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val seed =
    sys.env.getOrElse("SPARK_GRAFT_FUZZ_SEED", "20260815").toLong

  test(s"randomized Spark-vs-DuckDB parity over operator entry points (seed $seed)") {
    assume(pythonAvailable, "python3 with duckdb/pandas not available on this box")

    val rnd = new scala.util.Random(seed)
    def pick[T](xs: Seq[T]): T = xs(rnd.nextInt(xs.size))

    // ---- seeded random base frames -------------------------------- //
    val n1 = 200 + rnd.nextInt(200)
    val letters = Seq("a", "b", "c", "d", "e")
    val t1 = (0L until n1).map { i =>
      (i,                                   // id: unique
        (rnd.nextInt(7) - 2).toLong,        // k: -2..4, negative keys too
        pick(letters),                      // g: small domain -> real ties
        if (rnd.nextInt(10) == 0) None      // v: nullable, negative
        else Some((rnd.nextInt(2001) - 1000).toLong),
        rnd.nextInt(100000).toLong,         // c: non-negative "cents"
        rnd.nextInt(500).toLong)            // ts: NON-unique ticks
    }.toDF("id", "k", "g", "v", "c", "ts")
    val n2 = 30 + rnd.nextInt(30)
    val t2 = (0L until n2).map { i =>
      ((rnd.nextInt(7) - 2).toLong, rnd.nextInt(500).toLong,
        pick(letters), rnd.nextInt(1000).toLong)
    }.toDF("k", "ts", "label", "w")

    val base = java.nio.file.Files.createTempDirectory("fuzz").toString
    val tablesDir = s"$base/tables"; val outDir = s"$base/out"
    t1.write.mode("overwrite").parquet(s"$tablesDir/ft1.parquet")
    t2.write.mode("overwrite").parquet(s"$tablesDir/ft2.parquet")
    val ft1 = spark.read.parquet(s"$tablesDir/ft1.parquet")
    val ft2 = spark.read.parquet(s"$tablesDir/ft2.parquet")

    // ---- randomized cases: (name, sparkFrame, duckdbSql) ---------- //
    val cases = scala.collection.mutable.ArrayBuffer.empty[(String, DataFrame, String)]

    // 1. filtered group aggregate, random key + threshold
    locally {
      val key = pick(Seq("k", "g")); val thr = 10000 + rnd.nextInt(80000)
      cases += (("filter_agg",
        ft1.where(col("v").isNotNull && col("c") < thr)
          .groupBy(col(key)).agg(sum(col("c")).as("sum_c"),
            count(lit(1)).as("n")),
        s"""SELECT $key, CAST(sum(c) AS BIGINT) AS sum_c, count(*) AS n
           |FROM ft1 WHERE v IS NOT NULL AND c < $thr GROUP BY 1""".stripMargin))
    }

    // 2. min/max over a NULLABLE column + distinct count
    cases += (("minmax_distinct",
      ft1.groupBy(col("g")).agg(min(col("v")).as("min_v"),
        max(col("v")).as("max_v"), count_distinct(col("k")).as("nk")),
      """SELECT g, CAST(min(v) AS BIGINT) AS min_v,
        |CAST(max(v) AS BIGINT) AS max_v, count(DISTINCT k) AS nk
        |FROM ft1 GROUP BY 1""".stripMargin))

    // 3. distributed prefix sum on a tied order + unique tiebreak
    cases += (("prefix_sum",
      Relational.prefixSum(ft1, Seq(col("ts"), col("id")), col("c"), "cum")
        .select(col("id"), col("cum")),
      """SELECT id, CAST(sum(c) OVER (ORDER BY ts, id
        |ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM ft1""".stripMargin))

    // 4. top-k per group, random k, desc order with id tiebreak
    locally {
      val kk = 1 + rnd.nextInt(4)
      cases += (("topk_group",
        Relational.topKPerGroup(ft1, Seq(col("g")),
          Seq(col("c").desc, col("id").asc), kk)
          .select(col("g"), col("id"), col("rank")),
        s"""SELECT g, id, rank FROM (SELECT g, id,
           |CAST(row_number() OVER (PARTITION BY g ORDER BY c DESC, id)
           |AS INTEGER) AS rank FROM ft1) WHERE rank <= $kk""".stripMargin))
    }

    // 5. deterministic mode with forced ties (tiny value domain)
    cases += (("mode_per_key",
      Relational.modePerKey(ft1, col("k"), col("g")),
      """WITH cnt AS (SELECT k, g, count(*) AS n FROM ft1
        |WHERE g IS NOT NULL GROUP BY 1, 2)
        |SELECT k AS key, g AS mode, n FROM (SELECT k, g, n,
        |row_number() OVER (PARTITION BY k ORDER BY n DESC, g) AS rn
        |FROM cnt) WHERE rn = 1""".stripMargin))

    // 6. gaps-and-islands over non-unique positions, random sparsifier
    locally {
      val m = 2 + rnd.nextInt(4)
      cases += (("islands",
        Relational.islands(ft1.where(col("c") % m === 0), col("g"), col("ts")),
        s"""WITH pts AS (SELECT DISTINCT g AS key, ts AS p FROM ft1
           |WHERE c % $m = 0 AND ts IS NOT NULL),
           |a AS (SELECT key, p, p - row_number() OVER (PARTITION BY key
           |ORDER BY p) AS anchor FROM pts)
           |SELECT key, CAST(min(p) AS BIGINT) AS start_pos,
           |CAST(max(p) AS BIGINT) AS end_pos, count(*) AS n_steps
           |FROM a GROUP BY key, anchor""".stripMargin))
    }

    // 7. as-of join, random direction, deduped right side
    locally {
      val dir = pick(Seq("backward", "forward"))
      val rightU = ft2.groupBy(col("k"), col("ts")).agg(max(col("w")).as("w"))
      val cmp = if (dir == "backward") "<=" else ">="
      val mm = if (dir == "backward") "max" else "min"
      cases += (("asof_" + dir,
        Relational.asOfJoin(ft1.select(col("id"), col("k"), col("ts")),
            rightU, "k", "ts", "ts", Seq("w"), dir)
          .select(col("id"), col("w")),
        s"""WITH r AS (SELECT k, ts, CAST(max(w) AS BIGINT) AS w
           |FROM ft2 GROUP BY 1, 2),
           |m AS (SELECT l.id, (SELECT $mm(r.ts) FROM r
           |WHERE r.k = l.k AND r.ts $cmp l.ts) AS rts, l.k FROM ft1 l)
           |SELECT m.id, r.w FROM m LEFT JOIN r
           |ON r.k = m.k AND r.ts = m.rts""".stripMargin))
    }

    // 8. semi + anti join counts in one row
    cases += (("semi_anti",
      ft1.join(ft2.select(col("k")).distinct(), Seq("k"), "left_semi")
        .agg(count(lit(1)).as("n_semi"))
        .crossJoin(ft1.join(ft2.select(col("k")).distinct(), Seq("k"), "left_anti")
          .agg(count(lit(1)).as("n_anti"))),
      """SELECT (SELECT count(*) FROM ft1 WHERE EXISTS
        |(SELECT 1 FROM ft2 WHERE ft2.k = ft1.k)) AS n_semi,
        |(SELECT count(*) FROM ft1 WHERE NOT EXISTS
        |(SELECT 1 FROM ft2 WHERE ft2.k = ft1.k)) AS n_anti""".stripMargin))

    // 9. set op on two random slices, random op
    locally {
      val t1a = 20000 + rnd.nextInt(60000); val t2a = rnd.nextInt(500) - 250
      val a = ft1.where(col("c") < t1a).select(col("g"), col("k"))
      val b = ft1.where(col("v") > t2a).select(col("g"), col("k"))
      val useIntersect = rnd.nextBoolean()
      val op = if (useIntersect) "INTERSECT" else "EXCEPT"
      cases += (("setop_" + op.toLowerCase,
        if (useIntersect) a.intersect(b) else a.except(b),
        s"""SELECT g, k FROM ft1 WHERE c < $t1a
           |$op SELECT g, k FROM ft1 WHERE v > $t2a""".stripMargin))
    }

    // 10. rollup with grouping-null rows
    cases += (("rollup",
      ft1.rollup(col("g"), col("k")).agg(count(lit(1)).as("n")),
      "SELECT g, k, count(*) AS n FROM ft1 GROUP BY ROLLUP (g, k)"))

    // 11. lag delta along a tied-then-tiebroken per-group order
    cases += (("lag_delta",
      ft1.withColumn("delta",
          col("c") - lag(col("c"), 1).over(
            Window.partitionBy(col("g")).orderBy(col("ts"), col("id"))))
        .select(col("id"), col("delta")),
      """SELECT id, CAST(c - lag(c, 1) OVER (PARTITION BY g
        |ORDER BY ts, id) AS BIGINT) AS delta FROM ft1""".stripMargin))

    // 12. exact ppm share: non-negative numerator, integer floor
    cases += (("ratio_ppm",
      ft1.groupBy(col("g"))
        .agg(sum(when(col("k") > 0, col("c")).otherwise(0L)).as("_a"),
          sum(col("c")).as("_b"))
        .where(col("_b") > 0)
        .select(col("g"), expr("CAST(_a * 1000000 div _b AS BIGINT)").as("share_ppm")),
      """SELECT g, CAST(CAST(sum(CASE WHEN k > 0 THEN c ELSE 0 END) AS BIGINT)
        |* 1000000 // CAST(sum(c) AS BIGINT) AS BIGINT) AS share_ppm
        |FROM ft1 GROUP BY 1 HAVING CAST(sum(c) AS BIGINT) > 0""".stripMargin))

    // 13. one IEEE division of exact integers, 6dp, guarded denominator
    cases += (("round6_mean",
      ft1.groupBy(col("k"))
        .agg(sum(col("v")).as("_sv"), count(col("v")).as("n_v"))
        .where(col("n_v") > 0)
        .select(col("k"), col("n_v"),
          round(col("_sv").cast("double") / col("n_v").cast("double"), 6)
            .as("mean_v")),
      """SELECT k, count(v) AS n_v, round(CAST(sum(v) AS DOUBLE) /
        |CAST(count(v) AS DOUBLE), 6) AS mean_v
        |FROM ft1 GROUP BY 1 HAVING count(v) > 0""".stripMargin))

    // 14. string kernel: case, concat, substring at a random offset
    locally {
      val pos = 1 + rnd.nextInt(3)
      cases += (("string_funcs",
        ft1.select(col("id"), upper(col("g")).as("ug"),
          substring(concat(col("g"), col("g")), pos, 2).as("sub2"),
          length(col("g")).cast("long").as("len_g")),
        s"""SELECT id, upper(g) AS ug, substring(g || g, $pos, 2) AS sub2,
           |CAST(length(g) AS BIGINT) AS len_g FROM ft1""".stripMargin))
    }

    // 15. date arithmetic off an integer tick
    cases += (("date_funcs",
      ft1.select(col("id"),
        date_add(to_date(lit("2026-01-01")), col("ts").cast("int")).as("d"))
        .select(col("id"), month(col("d")).cast("long").as("m"),
          dayofmonth(col("d")).cast("long").as("dom")),
      """SELECT id, CAST(month(DATE '2026-01-01' + ts::INTEGER) AS BIGINT) AS m,
        |CAST(day(DATE '2026-01-01' + ts::INTEGER) AS BIGINT) AS dom
        |FROM ft1""".stripMargin))

    // 16. distributed global index on a desc order with tiebreak
    cases += (("global_index",
      Relational.globalIndex(ft1, Seq(col("c").desc, col("id")), "_rn")
        .select(col("id"), col("_rn")),
      """SELECT id, CAST(row_number() OVER (ORDER BY c DESC, id)
        |AS BIGINT) AS _rn FROM ft1""".stripMargin))

    // 17. 2-D Pareto frontier (staircase + NOT EXISTS mirror)
    cases += (("pareto",
      Relational.paretoFrontier2d(ft1, col("k"), col("c")),
      """WITH s AS (SELECT k AS x, CAST(max(c) AS BIGINT) AS y FROM ft1
        |GROUP BY 1),
        |f AS (SELECT x, y FROM s WHERE NOT EXISTS
        |(SELECT 1 FROM s s2 WHERE s2.x > s.x AND s2.y >= s.y))
        |SELECT f.x, f.y, (SELECT count(*) FROM ft1
        |WHERE ft1.k = f.x AND ft1.c = f.y) AS n_rows FROM f""".stripMargin))

    // 18. integer-width histogram, random width
    locally {
      val w = 500 + rnd.nextInt(1500)
      cases += (("histogram",
        ft1.groupBy(expr(s"CAST(c div $w AS BIGINT)").as("bin"))
          .agg(count(lit(1)).as("n")),
        s"""SELECT CAST(c // $w AS BIGINT) AS bin, count(*) AS n
           |FROM ft1 GROUP BY 1""".stripMargin))
    }

    // 19. time-weighted ppm: products summed exactly, floor division
    cases += (("twap_ppm",
      ft1.groupBy(col("g"))
        .agg(sum(col("c") * col("ts")).as("_num"), sum(col("ts")).as("_den"))
        .where(col("_den") > 0)
        .select(col("g"), expr("CAST(_num * 1000000 div _den AS BIGINT)").as("twap_ppm")),
      """SELECT g, CAST(CAST(sum(c * ts) AS BIGINT) * 1000000 //
        |CAST(sum(ts) AS BIGINT) AS BIGINT) AS twap_ppm
        |FROM ft1 GROUP BY 1 HAVING CAST(sum(ts) AS BIGINT) > 0""".stripMargin))

    // 20. join to the dim side + aggregate over its label
    cases += (("join_label",
      ft1.join(ft2.select(col("k"), col("label")), Seq("k"))
        .groupBy(col("label")).agg(count(lit(1)).as("n"), sum(col("c")).as("sum_c")),
      """SELECT label, count(*) AS n, CAST(sum(c) AS BIGINT) AS sum_c
        |FROM ft1 JOIN (SELECT k, label FROM ft2) USING (k)
        |GROUP BY 1""".stripMargin))

    compareCases(tablesDir, outDir, cases.toSeq)
  }

  private def pythonAvailable: Boolean =
    try {
      new ProcessBuilder("python3", "-c", "import duckdb, pandas, numpy")
        .start().waitFor() == 0
    } catch { case _: Exception => false }

  private def compareCases(tablesDir: String, outDir: String,
      cases: Seq[(String, DataFrame, String)]): Unit = {
    cases.foreach { case (name, df, _) =>
      df.write.mode("overwrite").parquet(s"$outDir/$name")
    }
    val oracleJson = cases.map { case (name, _, sql) =>
      val esc = sql.replace("\\", "\\\\").replace("\"", "\\\"")
        .replace("\n", " ")
      s""""$name": "$esc""""
    }.mkString("{", ",", "}")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"),
      oracleJson.getBytes("UTF-8"))
    val proc = new ProcessBuilder("python3", "scripts/fuzz_verify.py",
      tablesDir, outDir).redirectErrorStream(true).start()
    val out = scala.io.Source.fromInputStream(proc.getInputStream).mkString
    val code = proc.waitFor()
    assert(code == 0,
      s"differential fuzz (seed $seed) found divergence:\n${out.takeRight(4000)}")
  }

  /** Round-11 extension (r10 verdict #1): the r9 parity traps lived in
    * the STATISTICS family (eager-division CSE, round(·,6) past 2^53,
    * midrank ties, `div` vs `//`), yet the original harness fuzzed only
    * the relational primitives. These cases drive the highest-trap
    * stats/graph entry points — grouped exact/weighted quantiles,
    * Mann-Whitney / Wilcoxon / Kruskal-Wallis / Spearman / Chatterjee
    * midranks, the ewma/cusum/holt IEEE folds (recursive-CTE mirrors),
    * entropy / mutual-information term sums, KS, target encoding, and
    * 1-2 PageRank supersteps on a random graph — with random ties
    * (tick domain 0..500 over 200-400 rows), nullable negative values,
    * and randomly degenerate groups (a random pre-filter can empty a
    * letter). Each case mirrors its gate oracle's exact arithmetic
    * shape; comparison runs through the same driver-style normalizer.
    */
  test(s"randomized stats/graph parity vs DuckDB (seed $seed)") {
    assume(pythonAvailable, "python3 with duckdb/pandas not available on this box")
    import graft.operators.{Analytics, Graph}

    val rnd = new scala.util.Random(seed + 1)
    def pick[T](xs: Seq[T]): T = xs(rnd.nextInt(xs.size))

    val n1 = 200 + rnd.nextInt(200)
    val letters = Seq("a", "b", "c", "d", "e")
    val t1 = (0L until n1).map { i =>
      (i,
        (rnd.nextInt(7) - 2).toLong,             // k: -2..4
        pick(letters),                           // g: ties
        if (rnd.nextInt(10) == 0) None           // v: nullable, negative
        else Some((rnd.nextInt(2001) - 1000).toLong),
        rnd.nextInt(100000).toLong,              // c: non-negative cents
        rnd.nextInt(500).toLong)                 // ts: NON-unique ticks
    }.toDF("id", "k", "g", "v", "c", "ts")
    // random small directed graph (self-loops + duplicate edges kept:
    // the operator dedups, the oracle mirrors with DISTINCT)
    val nv = 8 + rnd.nextInt(12)
    val ne = 40 + rnd.nextInt(40)
    val t3 = (0 until ne).map { _ =>
      (rnd.nextInt(nv).toLong, rnd.nextInt(nv).toLong)
    }.toDF("src", "dst")

    val base = java.nio.file.Files.createTempDirectory("fuzzstats").toString
    val tablesDir = s"$base/tables"; val outDir = s"$base/out"
    t1.write.mode("overwrite").parquet(s"$tablesDir/fs1.parquet")
    t3.write.mode("overwrite").parquet(s"$tablesDir/fs3.parquet")
    val fs1 = spark.read.parquet(s"$tablesDir/fs1.parquet")
    val fs3 = spark.read.parquet(s"$tablesDir/fs3.parquet")

    val cases = scala.collection.mutable.ArrayBuffer.empty[(String, DataFrame, String)]

    // exactly-representable smoothing constants so `1 - a` folds to the
    // same double literal on both engines
    val alphas = Seq(0.125 -> ("0.125", "0.875"), 0.25 -> ("0.25", "0.75"),
      0.5 -> ("0.5", "0.5"), 0.75 -> ("0.75", "0.25"))

    // 1. grouped exact quantiles over the heavy-tie tick column
    locally {
      val probs = rnd.shuffle(Seq(0.25, 0.5, 0.75, 0.9)).take(2).sorted
      val qsql = probs.map(p => s"SELECT CAST($p AS DOUBLE) AS p")
        .mkString(" UNION ALL ")
      cases += (("grouped_quantiles",
        Analytics.groupedExactQuantiles(fs1, col("g"), col("ts"), probs),
        s"""WITH counts AS (SELECT g, ts AS v, count(*) AS c FROM fs1
           |  GROUP BY 1, 2),
           |cdf AS (SELECT g, v, c, sum(c) OVER (PARTITION BY g ORDER BY v
           |  ROWS UNBOUNDED PRECEDING) AS cum FROM counts),
           |nn AS (SELECT g, CAST(sum(c) AS BIGINT) AS n FROM counts GROUP BY 1),
           |q AS ($qsql)
           |SELECT cdf.g AS "group", p, min(v) AS value, nn.n
           |FROM cdf JOIN nn ON cdf.g = nn.g CROSS JOIN q
           |WHERE cum >= ceil(p * nn.n)
           |GROUP BY 1, 2, 4""".stripMargin))
    }

    // 2. grouped WEIGHTED quantiles, weight = c % m + 1 (always > 0)
    locally {
      val m = 3 + rnd.nextInt(8)
      val p = pick(Seq(0.5, 0.75, 0.9))
      cases += (("grouped_wquantiles",
        Analytics.groupedWeightedQuantiles(fs1, col("g"), col("ts"),
          col("c") % m + 1L, Seq(p)),
        s"""WITH counts AS (SELECT g, ts AS v,
           |  CAST(sum(c % $m + 1) AS BIGINT) AS c FROM fs1 GROUP BY 1, 2),
           |cdf AS (SELECT g, v, c, sum(c) OVER (PARTITION BY g ORDER BY v
           |  ROWS UNBOUNDED PRECEDING) AS cum FROM counts),
           |nn AS (SELECT g, CAST(sum(c) AS BIGINT) AS w FROM counts GROUP BY 1)
           |SELECT cdf.g AS "group", CAST($p AS DOUBLE) AS p,
           |  min(v) AS value, nn.w
           |FROM cdf JOIN nn ON cdf.g = nn.g
           |WHERE cum >= ceil($p * nn.w)
           |GROUP BY 1, 2, 4""".stripMargin))
    }

    // 3. Mann-Whitney midranks on the tied tick scores, random label cut
    locally {
      val cut = rnd.nextInt(4) - 1 // -1..2: can make one class tiny
      cases += (("mannwhitney",
        Analytics.mannWhitney(fs1,
          when(col("k") > cut, 1L).otherwise(0L), col("ts")),
        s"""WITH c AS (SELECT ts AS s, count(*) AS c,
           |  sum(CASE WHEN k > $cut THEN 1 ELSE 0 END) AS p
           |  FROM fs1 GROUP BY 1),
           |cum AS (SELECT s, c, p, sum(c) OVER (ORDER BY s) AS cu FROM c)
           |SELECT CAST(sum(p) AS BIGINT) AS n_pos,
           |  CAST(sum(c - p) AS BIGINT) AS n_neg,
           |  CAST(sum(p * (2 * (cu - c) + c + 1)) - sum(p) * (sum(p) + 1)
           |    AS BIGINT) AS u_x2,
           |  CASE WHEN sum(p) = 0 OR sum(c - p) = 0 THEN NULL
           |  ELSE round((sum(p * (2 * (cu - c) + c + 1)) -
           |    sum(p) * (sum(p) + 1))::DOUBLE /
           |    (sum(p)::DOUBLE * sum(c - p)::DOUBLE) - 1.0, 6) END
           |    AS rank_biserial
           |FROM cum""".stripMargin))
    }

    // 4. Wilcoxon signed-rank over the nullable signed values (zeros drop)
    cases += (("wilcoxon",
      Analytics.wilcoxonSignedRank(fs1, col("v")),
      """WITH pair AS (SELECT v AS d FROM fs1 WHERE v IS NOT NULL AND v != 0),
        |c AS (SELECT abs(d) AS a, count(*) AS c,
        |  sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS p FROM pair GROUP BY 1),
        |cum AS (SELECT a, c, p, sum(c) OVER (ORDER BY a) AS cu FROM c)
        |SELECT CAST(sum(c) AS BIGINT) AS n_pairs,
        |  CAST(sum(p * (2 * (cu - c) + c + 1)) AS BIGINT) AS w_plus_x2,
        |  CASE WHEN sum(c) = 0 THEN NULL
        |  ELSE round((2 * sum(p * (2 * (cu - c) + c + 1)) -
        |    sum(c) * (sum(c) + 1))::DOUBLE /
        |    (sum(c) * (sum(c) + 1))::DOUBLE, 6) END AS rank_biserial
        |FROM cum""".stripMargin))

    // 5. ewma fold, exact-binary alpha, nullable values skip state
    locally {
      val (a, (as_, bs)) = { val x = pick(alphas); (x._1, x._2) }
      cases += (("ewma_fold",
        Analytics.ewma(fs1, col("k"), Seq(col("ts"), col("id")), col("id"),
          col("v"), a).where(col("ewma").isNotNull),
        s"""WITH RECURSIVE e AS (
           |  SELECT k, id, CAST(v AS DOUBLE) AS v,
           |    row_number() OVER (PARTITION BY k ORDER BY ts, id) AS rn
           |  FROM fs1 WHERE v IS NOT NULL),
           |r AS (
           |  SELECT k, id, rn, v AS s FROM e WHERE rn = 1
           |  UNION ALL
           |  SELECT e.k, e.id, e.rn, $as_ * e.v + $bs * r.s
           |  FROM e JOIN r ON e.k = r.k AND e.rn = r.rn + 1)
           |SELECT id, k AS key, s AS ewma FROM r""".stripMargin))
    }

    // 6. cusum fold: integer drift/threshold (exact doubles), clamp branch
    locally {
      val drift = rnd.nextInt(51)        // 0..50
      val thr = 100 + rnd.nextInt(901)   // 100..1000
      cases += (("cusum_fold",
        Analytics.cusum(fs1, col("k"), Seq(col("ts"), col("id")), col("id"),
          col("v"), drift.toDouble, thr.toDouble)
          .where(col("cusum").isNotNull),
        s"""WITH RECURSIVE e AS (
           |  SELECT k, id, CAST(v AS DOUBLE) AS v,
           |    row_number() OVER (PARTITION BY k ORDER BY ts, id) AS rn
           |  FROM fs1 WHERE v IS NOT NULL),
           |r AS (
           |  SELECT k, id, rn,
           |    CASE WHEN (0.0 + (v - $drift.0)) > 0
           |         THEN (0.0 + (v - $drift.0)) ELSE 0.0 END AS s
           |  FROM e WHERE rn = 1
           |  UNION ALL
           |  SELECT e.k, e.id, e.rn,
           |    CASE WHEN (r.s + (e.v - $drift.0)) > 0
           |         THEN (r.s + (e.v - $drift.0)) ELSE 0.0 END
           |  FROM e JOIN r ON e.k = r.k AND e.rn = r.rn + 1)
           |SELECT id, k AS key, s AS cusum, s > $thr.0 AS alarm
           |FROM r""".stripMargin))
    }

    // 7. holt fold: level+trend IEEE chain, lNew expression spelled twice
    locally {
      val (a, (as_, a2)) = { val x = pick(alphas); (x._1, x._2) }
      val (b, (bs_, b2)) = {
        val x = pick(alphas.take(3)); (x._1, x._2)
      }
      cases += (("holt_fold",
        Analytics.holt(fs1, col("k"), Seq(col("ts"), col("id")), col("id"),
          col("v"), a, b).where(col("level").isNotNull),
        s"""WITH RECURSIVE e AS (
           |  SELECT k, id, CAST(v AS DOUBLE) AS v,
           |    row_number() OVER (PARTITION BY k ORDER BY ts, id) AS rn
           |  FROM fs1 WHERE v IS NOT NULL),
           |r AS (
           |  SELECT k, id, rn, v AS l, CAST(0.0 AS DOUBLE) AS b
           |  FROM e WHERE rn = 1
           |  UNION ALL
           |  SELECT e.k, e.id, e.rn,
           |    $as_ * e.v + $a2 * (r.l + r.b),
           |    $bs_ * (($as_ * e.v + $a2 * (r.l + r.b)) - r.l) + $b2 * r.b
           |  FROM e JOIN r ON e.k = r.k AND e.rn = r.rn + 1)
           |SELECT id, k AS key, l AS level, b AS trend, l + b AS forecast
           |FROM r""".stripMargin))
    }

    // 8. entropy term sum under a random pre-filter (can thin a letter out)
    locally {
      val thr = 5000 + rnd.nextInt(95000)
      cases += (("entropy",
        Analytics.entropy(fs1.where(col("c") < thr), col("g")),
        s"""WITH c AS (SELECT g AS x, CAST(count(*) AS BIGINT) AS n
           |  FROM fs1 WHERE c < $thr AND g IS NOT NULL GROUP BY 1),
           |s AS (SELECT CAST(sum(n) AS BIGINT) AS n,
           |  CAST(count(*) AS BIGINT) AS k,
           |  sum(CAST(round(CAST(n AS DOUBLE) * ln(CAST(n AS DOUBLE)), 6)
           |    AS DECIMAL(18,6))) AS sd
           |  FROM c)
           |SELECT n, k,
           |  round(ln(CAST(n AS DOUBLE)) -
           |    CAST(sd AS DOUBLE) / CAST(n AS DOUBLE), 6) AS entropy,
           |  CASE WHEN k <= 1 THEN 0.0
           |       ELSE round(round(ln(CAST(n AS DOUBLE)) -
           |         CAST(sd AS DOUBLE) / CAST(n AS DOUBLE), 6) /
           |         ln(CAST(k AS DOUBLE)), 6) END AS entropy_norm
           |FROM s""".stripMargin))
    }

    // 9. mutual information term sum over the (letter, small-int) grid
    cases += (("mutual_info",
      Analytics.mutualInfo(fs1, col("g"), col("k")),
      """WITH cells AS (SELECT g AS x, k AS y, CAST(count(*) AS BIGINT) AS n_xy
        |  FROM fs1 GROUP BY 1, 2),
        |mx AS (SELECT x, CAST(sum(n_xy) AS BIGINT) AS n_x FROM cells GROUP BY x),
        |my AS (SELECT y, CAST(sum(n_xy) AS BIGINT) AS n_y FROM cells GROUP BY y),
        |n AS (SELECT CAST(sum(n_xy) AS BIGINT) AS nn FROM cells),
        |t AS (SELECT x, y, n_xy, n_x, n_y, nn,
        |  CAST(round(CAST(n_xy AS DOUBLE) *
        |    ln(CAST(n_xy AS DOUBLE) * CAST(nn AS DOUBLE) /
        |      (CAST(n_x AS DOUBLE) * CAST(n_y AS DOUBLE))), 6)
        |    AS DECIMAL(18,6)) AS term
        |  FROM cells JOIN mx USING (x) JOIN my USING (y), n)
        |SELECT x, y, n_xy, n_x, n_y, CAST(term AS DOUBLE) AS term,
        |  round(CAST(sum(term) OVER () AS DOUBLE) / CAST(nn AS DOUBLE), 6) AS mi
        |FROM t""".stripMargin))

    // 10. Spearman rho: midranks on BOTH axes, nullable x, tied y
    cases += (("spearman",
      Analytics.spearman(fs1, col("v"), col("ts")),
      """WITH pair AS (SELECT v AS x, ts AS y FROM fs1 WHERE v IS NOT NULL),
        |rx AS (SELECT vv AS x, 2 * (cu - c) + c + 1 AS r FROM (
        |  SELECT x AS vv, count(*) AS c,
        |    sum(count(*)) OVER (ORDER BY x) AS cu FROM pair GROUP BY x)),
        |ry AS (SELECT vv AS y, 2 * (cu - c) + c + 1 AS r FROM (
        |  SELECT y AS vv, count(*) AS c,
        |    sum(count(*)) OVER (ORDER BY y) AS cu FROM pair GROUP BY y)),
        |m AS (SELECT count(*) AS n,
        |  CAST(sum(rx.r) AS HUGEINT) AS sx, CAST(sum(ry.r) AS HUGEINT) AS sy,
        |  sum(CAST(rx.r AS HUGEINT) * ry.r) AS sxy,
        |  sum(CAST(rx.r AS HUGEINT) * rx.r) AS sxx,
        |  sum(CAST(ry.r AS HUGEINT) * ry.r) AS syy
        |  FROM pair JOIN rx USING (x) JOIN ry USING (y))
        |SELECT n,
        |  CASE WHEN n < 3 OR CAST(n * sxx - sx * sx AS DOUBLE) <= 0
        |    OR CAST(n * syy - sy * sy AS DOUBLE) <= 0 THEN NULL
        |  ELSE round(CAST(n * sxy - sx * sy AS DOUBLE) /
        |    (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
        |     sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6) END AS rho
        |FROM m""".stripMargin))

    // 11. Kruskal-Wallis H with the tie correction on heavy tick ties
    cases += (("kruskal",
      Analytics.kruskalWallis(fs1, col("g"), col("ts")),
      """WITH cells AS (SELECT g, ts AS v, count(*) AS cgv FROM fs1
        |  GROUP BY 1, 2),
        |vc AS (SELECT v, CAST(sum(cgv) AS BIGINT) AS c FROM cells GROUP BY 1),
        |cdf AS (SELECT v, c, sum(c) OVER (ORDER BY v
        |  ROWS UNBOUNDED PRECEDING) AS cum FROM vc),
        |mr AS (SELECT v, 2 * (cum - c) + c + 1 AS mr2,
        |  CAST(c AS HUGEINT) * c * c - c AS tie FROM cdf),
        |pg AS (SELECT g, CAST(sum(cgv) AS BIGINT) AS ng,
        |  sum(CAST(cgv AS HUGEINT) * mr2) AS r2
        |  FROM cells JOIN mr USING (v) GROUP BY 1),
        |bt AS (SELECT ng,
        |  CAST(round((r2 * r2)::DOUBLE / ng::DOUBLE, 6) AS DECIMAL(38,6)) AS b
        |  FROM pg),
        |agg AS (SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(ng) AS BIGINT) AS n,
        |  sum(b) AS bt FROM bt),
        |tt AS (SELECT sum(tie) AS t FROM mr)
        |SELECT k, n,
        |  CASE WHEN k >= 2 AND n >= 2 THEN
        |    round(3.0 * bt::DOUBLE / (n::DOUBLE * (n::DOUBLE + 1.0)) -
        |      3.0 * (n::DOUBLE + 1.0), 6) END AS h,
        |  CASE WHEN k >= 2 AND n >= 2
        |    AND 1.0 - t::DOUBLE / (n::DOUBLE * n::DOUBLE * n::DOUBLE - n::DOUBLE) > 0 THEN
        |    round((3.0 * bt::DOUBLE / (n::DOUBLE * (n::DOUBLE + 1.0)) -
        |      3.0 * (n::DOUBLE + 1.0)) /
        |      (1.0 - t::DOUBLE / (n::DOUBLE * n::DOUBLE * n::DOUBLE - n::DOUBLE)),
        |      6) END AS h_corrected
        |FROM agg, tt""".stripMargin))

    // 12. Chatterjee xi: rank walk with (x, id, y) full-tie order
    cases += (("chatterjee",
      Analytics.chatterjeeXi(fs1, col("id"), col("v"), col("ts")),
      """WITH base AS (SELECT id, v AS x, ts AS y FROM fs1
        |  WHERE id IS NOT NULL AND v IS NOT NULL AND ts IS NOT NULL),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM base),
        |yc AS (SELECT y, CAST(count(*) AS BIGINT) AS c FROM base GROUP BY 1),
        |ycdf AS (SELECT y, c,
        |  CAST(sum(c) OVER (ORDER BY y ROWS UNBOUNDED PRECEDING)
        |    AS BIGINT) AS r FROM yc),
        |yl AS (SELECT y, c, r, n - r + c AS l FROM ycdf CROSS JOIN nn),
        |dd AS (SELECT CAST(COALESCE(sum(c::HUGEINT * l * (n - l)), 0) * 2
        |  AS HUGEINT) AS denom2 FROM yl CROSS JOIN nn),
        |rws AS (SELECT b.id, b.x, b.y, yl.r FROM base b JOIN yl
        |  ON b.y = yl.y),
        |sd AS (SELECT COALESCE(sum(CAST(abs(nr - r) AS HUGEINT)), 0)
        |  AS sdr FROM (SELECT r, lead(r) OVER (ORDER BY x, id, y) AS nr
        |  FROM rws) WHERE nr IS NOT NULL)
        |SELECT n, CAST(sdr AS BIGINT) AS sum_dr,
        |  CAST(denom2 AS BIGINT) AS denom2,
        |  CAST(CASE WHEN denom2 > 0 THEN
        |    1000000 - (n::HUGEINT * sdr * 1000000) // denom2
        |  END AS BIGINT) AS xi_ppm
        |FROM nn CROSS JOIN dd CROSS JOIN sd""".stripMargin))

    // 13. exact two-sample KS between two random letters on ties
    locally {
      val Seq(ga, gb) = rnd.shuffle(letters).take(2).sorted
      cases += (("ks_test",
        Analytics.ksTest(fs1, col("g"), col("ts"), ga, gb),
        s"""WITH pv AS (SELECT ts AS v,
           |  CAST(sum(CASE WHEN g = '$ga' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
           |  CAST(sum(CASE WHEN g = '$gb' THEN 1 ELSE 0 END) AS BIGINT) AS cb
           |  FROM fs1 WHERE g IN ('$ga', '$gb') GROUP BY ts),
           |c AS (SELECT v, sum(ca) OVER (ORDER BY v) AS cuma,
           |  sum(cb) OVER (ORDER BY v) AS cumb FROM pv),
           |t AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
           |  CAST(sum(cb) AS BIGINT) AS nb FROM pv)
           |SELECT na AS n_a, nb AS n_b,
           |  CAST(max(abs(nb * cuma - na * cumb)) AS BIGINT) AS ks_num,
           |  na * nb AS ks_denom,
           |  round(CAST(max(abs(nb * cuma - na * cumb)) AS DOUBLE) /
           |    CAST(na * nb AS DOUBLE), 6) AS ks
           |FROM c, t GROUP BY na, nb""".stripMargin))
    }

    // 14. smoothed target encoding: floor-div chain, random smoothing m
    locally {
      val m = rnd.nextInt(41)
      cases += (("target_encode",
        Analytics.targetEncode(fs1, col("g"), col("c"), m.toLong),
        s"""WITH per AS (SELECT g AS category, count(*) AS n,
           |  CAST(sum(c) AS BIGINT) AS s FROM fs1 GROUP BY 1),
           |gm AS (SELECT CAST(sum(s) // sum(n) AS BIGINT) AS gmean FROM per)
           |SELECT category, n, CAST(s // n AS BIGINT) AS mean_cents,
           |  CAST((s + $m * gmean) // (n + $m) AS BIGINT) AS enc_cents
           |FROM per, gm""".stripMargin))
    }

    // 15. PageRank, 1-2 scaled-integer supersteps on the random graph
    locally {
      val iters = 1 + rnd.nextInt(2)
      val steps = (1 to iters).map { i =>
        s""",
           |inf$i AS (SELECT e.dst, CAST(SUM(sc.score // od.deg) AS BIGINT) AS f
           |  FROM e0 e JOIN it${i - 1} sc ON e.src = sc.node
           |  JOIN outdeg od ON e.src = od.src GROUP BY e.dst),
           |it$i AS (SELECT vv.node, 150000000 + (85 * COALESCE(i.f, 0)) // 100
           |    AS score
           |  FROM verts vv LEFT JOIN inf$i i ON vv.node = i.dst)""".stripMargin
      }.mkString
      cases += (("pagerank_super",
        Graph.pageRank(fs3, "src", "dst", iters),
        s"""WITH e0 AS (SELECT DISTINCT src, dst FROM fs3
           |  WHERE src IS NOT NULL AND dst IS NOT NULL),
           |verts AS (SELECT DISTINCT node FROM
           |  (SELECT src AS node FROM e0 UNION ALL SELECT dst FROM e0)),
           |outdeg AS (SELECT src, count(*) AS deg FROM e0 GROUP BY src),
           |it0 AS (SELECT node, CAST(1000000000 AS BIGINT) AS score FROM verts)
           |$steps
           |SELECT node, CAST(score AS BIGINT) AS score FROM it$iters""".stripMargin))
    }

    compareCases(tablesDir, outDir, cases.toSeq)
  }

  /** Wave 3: the trap families still un-fuzzed after the stats/graph
    * wave — concentration readouts (gini / Lorenz blocks / winsorized
    * and trimmed means, all CDF-boundary arithmetic where an
    * off-by-one in the ceil-rank pick silently shifts a block),
    * digit-string kernels (Benford), and the nine-moment
    * partial-correlation shape whose eager-division CSE bit round 9.
    */
  test(s"randomized concentration/digit/moment parity vs DuckDB (seed $seed)") {
    assume(pythonAvailable, "python3 with duckdb/pandas not available on this box")
    import graft.operators.{Analytics, Diagnostics}

    val rnd = new scala.util.Random(seed + 2)
    def pick[T](xs: Seq[T]): T = xs(rnd.nextInt(xs.size))

    val n1 = 250 + rnd.nextInt(200)
    val letters = Seq("a", "b", "c", "d", "e")
    val t1 = (0L until n1).map { i =>
      (i,
        (i % (20 + rnd.nextInt(30))).toLong,     // k: 20-50 mid-card keys
        pick(letters),
        if (rnd.nextInt(10) == 0) None
        else Some((rnd.nextInt(2001) - 1000).toLong),
        (rnd.nextInt(99999) + 1).toLong,         // c: POSITIVE cents
        rnd.nextInt(400).toLong)
    }.toDF("id", "k", "g", "v", "c", "ts")
    val base = java.nio.file.Files.createTempDirectory("fuzzconc").toString
    val tablesDir = s"$base/tables"; val outDir = s"$base/out"
    t1.write.mode("overwrite").parquet(s"$tablesDir/fc1.parquet")
    val fc1 = spark.read.parquet(s"$tablesDir/fc1.parquet")

    val cases = scala.collection.mutable.ArrayBuffer.empty[(String, DataFrame, String)]

    // 1. gini over per-key totals (rank-weighted decimal sum)
    cases += (("gini",
      Analytics.gini(fc1, col("k"), col("c")),
      """WITH tot AS (SELECT k, CAST(sum(c) AS BIGINT) AS x FROM fc1
        |  GROUP BY 1),
        |r AS (SELECT k, x, row_number() OVER (ORDER BY x, k) AS i FROM tot)
        |SELECT CAST(count(*) AS BIGINT) AS n_keys,
        |  CAST(sum(x) AS BIGINT) AS sum_val,
        |  CAST(sum(CAST(i AS DECIMAL(38,0)) * x) AS DOUBLE) AS weighted_sum,
        |  round(CAST(sum(CAST(i AS DECIMAL(38,0)) * x) AS DOUBLE) * 2.0 /
        |      (CAST(count(*) AS DOUBLE) * CAST(sum(x) AS DOUBLE)) -
        |    CAST(count(*) + 1 AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS gini
        |FROM r""".stripMargin))

    // 2. trimmed mean on heavy ties, random trim fraction
    locally {
      val alpha = pick(Seq(25000L, 50000L, 100000L))
      cases += (("trimmed_mean",
        Analytics.groupedTrimmedMean(fc1, col("g"), col("ts"), alpha),
        s"""WITH r AS (SELECT g, ts AS v,
           |  row_number() OVER (PARTITION BY g ORDER BY ts) AS rn,
           |  count(*) OVER (PARTITION BY g) AS n FROM fc1),
           |tt AS (SELECT g, v, rn, n, n * $alpha // 1000000 AS t FROM r)
           |SELECT g AS "group", CAST(max(n) AS BIGINT) AS n,
           |  CAST(max(n) - 2 * max(t) AS BIGINT) AS n_trimmed,
           |  CAST(sum(CASE WHEN rn > t AND rn <= n - t THEN v ELSE 0 END)
           |    // (max(n) - 2 * max(t)) AS BIGINT) AS trimmed_mean
           |FROM tt GROUP BY 1""".stripMargin))
    }

    // 3. winsorized mean (5/95 CDF-boundary clamp) on the same ties
    cases += (("winsor_group",
      Analytics.groupedWinsorizedMean(fc1, col("g"), col("ts")),
      """WITH c1 AS (SELECT g, ts AS v, count(*) AS c FROM fc1 GROUP BY 1, 2),
        |cdf AS (SELECT g, v, c, sum(c) OVER (PARTITION BY g ORDER BY v
        |  ROWS UNBOUNDED PRECEDING) AS cum FROM c1),
        |nn AS (SELECT g, CAST(sum(c) AS BIGINT) AS n FROM c1 GROUP BY 1),
        |lo AS (SELECT cdf.g, min(v) AS lo FROM cdf JOIN nn ON cdf.g = nn.g
        |  WHERE cum >= ceil(CAST(0.05 AS DOUBLE) * nn.n) GROUP BY 1),
        |hi AS (SELECT cdf.g, min(v) AS hi FROM cdf JOIN nn ON cdf.g = nn.g
        |  WHERE cum >= ceil(CAST(0.95 AS DOUBLE) * nn.n) GROUP BY 1)
        |SELECT fc1.g AS "group", count(*) AS n,
        |  any_value(lo.lo) AS lo, any_value(hi.hi) AS hi,
        |  CAST(sum(greatest(lo.lo, least(hi.hi, ts))) // count(*) AS BIGINT)
        |    AS winsorized_mean
        |FROM fc1 JOIN lo ON fc1.g = lo.g JOIN hi ON fc1.g = hi.g
        |GROUP BY 1""".stripMargin))

    // 4. Benford first digit off the exact integer STRING
    cases += (("benford",
      Diagnostics.benfordDigits(fc1.select(col("c").as("cents")), col("cents")),
      """WITH c AS (SELECT substr(CAST(c AS VARCHAR), 1, 1) AS digit,
        |  CAST(count(*) AS BIGINT) AS n
        |  FROM fc1 WHERE c IS NOT NULL AND c > 0 GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS tt FROM c)
        |SELECT digit, n, CAST(n * 1000000 // tt AS BIGINT) AS obs_ppm,
        |  CAST(floor(ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0) * 1000000.0)
        |    AS BIGINT) AS benford_ppm,
        |  CAST(n * 1000000 // tt AS BIGINT) -
        |  CAST(floor(ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0) * 1000000.0)
        |    AS BIGINT) AS dev_ppm
        |FROM c, t""".stripMargin))

    // 5. Lorenz curve blocks at random probs (ceil-rank boundary picks)
    locally {
      val probs = rnd.shuffle(Seq(0.25, 0.5, 0.75, 0.9, 1.0)).take(3).sorted
      val vals = probs.map(p => s"($p)").mkString(",")
      cases += (("lorenz",
        Analytics.lorenzCurve(fc1, col("c"), probs),
        s"""WITH c AS (SELECT c AS v, count(*) AS cnt FROM fc1 GROUP BY 1),
           |cum AS (SELECT v, cnt,
           |  sum(cnt) OVER (ORDER BY v) AS cumc,
           |  sum(v * cnt) OVER (ORDER BY v) AS cumv FROM c),
           |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS n,
           |  CAST(sum(v * cnt) AS BIGINT) AS total FROM c),
           |ps AS (SELECT CAST(p AS DOUBLE) AS p FROM (VALUES $vals) x(p)),
           |blk AS (SELECT p, CAST(ceil(p * n) AS BIGINT) AS rank, n, total,
           |  min(struct_pack(v := v, cumc := cumc, cumv := cumv)
           |    ORDER BY v) AS b
           |  FROM cum, t, ps WHERE cumc >= ceil(p * n)
           |  GROUP BY p, n, total)
           |SELECT p, rank, n, total,
           |  CAST(b.cumv - (b.cumc - rank) * b.v AS BIGINT) AS lorenz,
           |  CAST(CAST(b.cumv - (b.cumc - rank) * b.v AS HUGEINT) * 1000000
           |    // total AS BIGINT) AS share_ppm
           |FROM blk""".stripMargin))
    }

    // 6. partial correlation: nine HUGEINT moments, the CSE-trap shape
    cases += (("partial_corr",
      Analytics.partialCorr(fc1, col("v"), col("ts"), col("c")),
      """WITH j AS (SELECT v AS x, ts AS y, c AS z FROM fc1
        |  WHERE v IS NOT NULL AND ts IS NOT NULL AND c IS NOT NULL),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |  sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
        |  sum(CAST(z AS HUGEINT)) AS sz,
        |  sum(CAST(x AS HUGEINT) * x) AS sxx,
        |  sum(CAST(y AS HUGEINT) * y) AS syy,
        |  sum(CAST(z AS HUGEINT) * z) AS szz,
        |  sum(CAST(x AS HUGEINT) * y) AS sxy,
        |  sum(CAST(x AS HUGEINT) * z) AS sxz,
        |  sum(CAST(y AS HUGEINT) * z) AS syz FROM j),
        |r AS (SELECT n,
        |  CAST(n * sxx - sx * sx AS DOUBLE) AS vxx,
        |  CAST(n * syy - sy * sy AS DOUBLE) AS vyy,
        |  CAST(n * szz - sz * sz AS DOUBLE) AS vzz,
        |  CAST(n * sxy - sx * sy AS DOUBLE) /
        |    (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
        |     sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS rxy,
        |  CAST(n * sxz - sx * sz AS DOUBLE) /
        |    (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
        |     sqrt(CAST(n * szz - sz * sz AS DOUBLE))) AS rxz,
        |  CAST(n * syz - sy * sz AS DOUBLE) /
        |    (sqrt(CAST(n * syy - sy * sy AS DOUBLE)) *
        |     sqrt(CAST(n * szz - sz * sz AS DOUBLE))) AS ryz
        |  FROM m)
        |SELECT n,
        |  CASE WHEN vxx > 0 AND vyy > 0 AND vzz > 0 THEN round(rxy, 6) END
        |    AS r_xy,
        |  CASE WHEN vxx > 0 AND vyy > 0 AND vzz > 0 THEN round(rxz, 6) END
        |    AS r_xz,
        |  CASE WHEN vxx > 0 AND vyy > 0 AND vzz > 0 THEN round(ryz, 6) END
        |    AS r_yz,
        |  CASE WHEN vxx > 0 AND vyy > 0 AND vzz > 0
        |      AND (1.0 - rxz * rxz) * (1.0 - ryz * ryz) > 0 THEN
        |    round((rxy - rxz * ryz) /
        |      sqrt((1.0 - rxz * rxz) * (1.0 - ryz * ryz)), 6)
        |  END AS r_xy_z
        |FROM r""".stripMargin))

    compareCases(tablesDir, outDir, cases.toSeq)
  }
}
