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
    val pyOk =
      try {
        new ProcessBuilder("python3", "-c", "import duckdb, pandas, numpy")
          .start().waitFor() == 0
      } catch { case _: Exception => false }
    assume(pyOk, "python3 with duckdb/pandas not available on this box")

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

    // ---- run Spark sides, dump oracles, compare in DuckDB --------- //
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
}
