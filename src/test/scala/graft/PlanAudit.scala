package graft

import org.apache.spark.sql.SparkSession

/** Plan + timing audit: prints the physical-plan headlines the scale
  * design depends on (pushed filters, join strategies, partial aggs,
  * AQE) and per-query 2nd-run timings (codegen/warmup separated).
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def headline(name: String): Unit = {
      val plan = SparkEntry.queries(name)(spark, d).queryExecution.executedPlan.toString
      val interesting = plan.linesIterator.filter(l =>
        l.contains("PushedFilters") || l.contains("Join") || l.contains("HashAggregate") ||
          l.contains("Exchange") || l.contains("ReadSchema"))
        .map(_.trim.take(160)).take(12)
      println(s"\n=== $name ===")
      interesting.foreach(println)
    }
    Seq("q_filter", "q_bcast_join", "q_join_multi", "q_agg", "q_dedup_minhash").foreach(headline)

    // cold vs warm: run twice, report both
    val targets = Seq("q_dedup_fp", "q_dedup_minhash", "q_embed_pairs", "q_dedup_ngram")
    targets.foreach { name =>
      def run(): Double = {
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, d).count()
        (System.nanoTime() - t0) / 1e9
      }
      val cold = run(); val warm = run()
      println(f"\n$name cold=$cold%.1fs warm=$warm%.1fs")
    }
    spark.stop()
  }
}
