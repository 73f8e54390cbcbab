package graft
import org.apache.spark.sql.SparkSession
object Bench {

  /** Per-query resource telemetry, accumulated from task-end events +
    * driver MX beans. Exists to make full-run inflation DIAGNOSABLE:
    * when a query's in-run time drifts from its isolated median, these
    * columns say whether the drift is GC pressure, spill, leaked cache
    * entries, or shuffle-file accumulation (round-9 verdict #1).
    */
  private final class QueryTelemetry extends org.apache.spark.scheduler.SparkListener {
    import java.util.concurrent.atomic.AtomicLong
    val shuffleReadB = new AtomicLong; val shuffleWriteB = new AtomicLong
    val memSpillB = new AtomicLong; val diskSpillB = new AtomicLong
    val taskGcMs = new AtomicLong; val peakExecMemB = new AtomicLong
    val nTasks = new AtomicLong
    override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) {
        nTasks.incrementAndGet()
        shuffleReadB.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        shuffleWriteB.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        memSpillB.addAndGet(m.memoryBytesSpilled)
        diskSpillB.addAndGet(m.diskBytesSpilled)
        taskGcMs.addAndGet(m.jvmGCTime)
        peakExecMemB.accumulateAndGet(m.peakExecutionMemory, Math.max _)
      }
    }
    def resetPeak(): Unit = peakExecMemB.set(0L)
    def snapshot(): Map[String, Long] = Map(
      "tasks" -> nTasks.get, "shuffle_read_b" -> shuffleReadB.get,
      "shuffle_write_b" -> shuffleWriteB.get, "mem_spill_b" -> memSpillB.get,
      "disk_spill_b" -> diskSpillB.get, "task_gc_ms" -> taskGcMs.get,
      "peak_exec_mem_b" -> peakExecMemB.get)
  }

  private def driverGcMs(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(b => math.max(0L, b.getCollectionTime)).sum
  }

  private def heapUsedB(): Long = {
    val r = Runtime.getRuntime; r.totalMemory() - r.freeMemory()
  }

  private def poolUsedB(nameContains: String): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(_.getName.toLowerCase.contains(nameContains))
      .map(p => Option(p.getUsage).map(_.getUsed).getOrElse(0L)).sum
  }

  /** Bytes + file count under the bench's pinned spark.local.dir —
    * shuffle/spill files that ContextCleaner has not yet removed.
    */
  private def localDirStats(dir: java.io.File): (Long, Long) = {
    var bytes = 0L; var files = 0L
    def walk(f: java.io.File): Unit = {
      val kids = f.listFiles()
      if (kids != null) kids.foreach { k =>
        if (k.isDirectory) walk(k)
        else { bytes += k.length(); files += 1L }
      }
    }
    if (dir.exists()) walk(dir)
    (bytes, files)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Pinned local dir: makes shuffle-file accumulation measurable
    // (and leaves nothing behind — deleted on exit below).
    val localDir = new java.io.File(
      sys.props("java.io.tmpdir"),
      s"graft-bench-local-${ProcessHandle.current().pid()}")
    localDir.mkdirs()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.local.dir", localDir.getAbsolutePath)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val telemetry = new QueryTelemetry
    spark.sparkContext.addSparkListener(telemetry)
    // Untimed warmup: JIT/codegen/shuffle-machinery bootstrap so the
    // per-query numbers measure the queries, not JVM cold start.
    Seq("q_agg", "q_words_count", "q_sim_brute").foreach { q =>
      try SparkEntry.queries(q)(spark, sfDir).count()
      catch { case _: Throwable => () }
    }
    // Drain warmup events and reset the peak high-water so warmup-phase
    // peaks don't leak into the FIRST timed query's peak_exec_mem_b.
    org.apache.spark.GraftListenerBridge.waitUntilEmpty(
      spark.sparkContext, 10000L)
    telemetry.resetPeak()
    // Per-query MEDIAN of `runs` measurements: single-shot totals vary
    // ±25% run-to-run on a shared box, so builder- and driver-side
    // numbers only converge on medians (BASELINE.md methodology).
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt.max(1)
    // Dev-loop filter: SPARK_GRAFT_BENCH_ONLY=q_a,q_b times a subset.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // A BENCH_ONLY subset run must never clobber the committed
    // full-set artifact (it has, twice) — subsets write *_subset.
    val detailName =
      if (only.isDefined) "bench_detail_subset.json" else "bench_detail.json"
    // The driver captures only the LAST 2000 chars of stdout (measured
    // from the BENCH_r05 artifact), so the stdout line must stay well
    // under that: it carries the total + the slowest `topN` queries at
    // millisecond precision. The FULL per-query map is written to
    // bench_detail.json in the repo root (committed, judge-readable)
    // and rewritten to /tmp/graft_bench.json after every query so no
    // truncation or kill can lose the measurements.
    // Locale-pinned formatting: f"" uses the JVM default locale, which in
    // comma-decimal locales (de_DE, …) emits "1,234" — invalid JSON.
    def r3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def jq(s: String): String =
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
        .replaceAll("[\\x00-\\x1f]", " ") + "\""
    // A query that ERRORS must never masquerade as a fast timing: it is
    // excluded from `queries`/total and reported in an "errors" map with a
    // top-level nonzero "nerrors" (this hid a 31-query breakage once).
    def jsonLine(rs: Seq[(String, Double)], errs: Seq[(String, String)],
                 complete: Boolean, topN: Int,
                 tel: Seq[(String, Map[String, Long])] = Nil): String = {
      val shown =
        if (topN >= rs.size) rs
        else rs.sortBy(-_._2).take(topN).sortBy(_._1)
      val qs = shown.map { case (k, v) => jq(k) + ":" + r3(v) }
        .mkString("{", ",", "}")
      val es = errs.map { case (k, v) => jq(k) + ":" + jq(v.take(200)) }
        .mkString("{", ",", "}")
      val total = r3(rs.map(_._2).sum)
      // Family rollup + budget check (round-9 verdict #3): gate growth
      // must not silently consume the 2x-of-baseline margin — each
      // family carries a seconds budget; violations are recorded in
      // the artifact and (under SPARK_GRAFT_BENCH_ENFORCE=1) fail the
      // run at exit so a round-close regression is loud.
      val famTotals = rs.groupBy(p => BenchFamilies.family(p._1))
        .map { case (f, ps) => f -> ps.map(_._2).sum }.toSeq.sortBy(_._1)
      val ft = famTotals.map { case (f, v) => jq(f) + ":" + r3(v) }
        .mkString("{", ",", "}")
      val viol = famTotals.flatMap { case (f, v) =>
        BenchFamilies.budgetSec.get(f).filter(b => v > b)
          .map(b => jq(f) + ":" + s"""{"spent":${r3(v)},"budget":${r3(b)}}""")
      }.mkString("{", ",", "}")
      val telJson =
        if (tel.isEmpty) ""
        else "," + "\"telemetry\":" + tel.map { case (k, m) =>
          jq(k) + ":" + m.toSeq.sortBy(_._1)
            .map { case (mk, mv) => jq(mk) + ":" + mv }
            .mkString("{", ",", "}")
        }.mkString("{", ",", "}")
      s"""{"metric":"total","value":$total,"unit":"sec","nqueries":${rs.size},"nerrors":${errs.size},"queries":$qs,"queries_truncated":${shown.size < rs.size},"errors":$es,"sf":"$sfDir","complete":$complete,"detail":"$detailName","families":$ft,"budget_violations":$viol$telJson}"""
    }
    // bench_detail.json must land in the REPO ROOT (committed, judge-read),
    // not the driver's CWD; and a failed write is a real problem, not noise.
    val repoRoot = sys.env.getOrElse("SPARK_GRAFT_REPO", "/root/repo")
    def writeTo(path: String, rs: Seq[(String, Double)],
                errs: Seq[(String, String)], complete: Boolean,
                tel: Seq[(String, Map[String, Long])]): Unit =
      try java.nio.file.Files.write(
        java.nio.file.Paths.get(path),
        (jsonLine(rs, errs, complete, Int.MaxValue, tel) + "\n").getBytes("UTF-8"))
      catch { case e: Throwable =>
        System.err.println(s"[bench] FAILED writing $path: $e")
      }
    val results = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    val errors = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val telemetries =
      scala.collection.mutable.ArrayBuffer.empty[(String, Map[String, Long])]
    def snapshot(complete: Boolean): Unit = {
      writeTo("/tmp/graft_bench.json", results.toSeq, errors.toSeq, complete,
        telemetries.toSeq)
      writeTo(s"$repoRoot/$detailName", results.toSeq, errors.toSeq, complete,
        telemetries.toSeq)
    }
    selected.foreach { case (name, fn) =>
      var err: Option[String] = None
      val telBefore = telemetry.snapshot()
      val gcBefore = driverGcMs()
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case e: Throwable =>
          err = Some(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).takeWhile(_ != '\n')}")
        }
        val elapsed = (System.nanoTime() - t0) / 1e9 // cache release untimed
        // blocking: an async drain would race the next run's re-persist
        // of the same frames (storage-memory churn, inflated timings)
        graft.core.CacheRegistry.unpersistAll(blocking = true)
        elapsed
      }.sorted
      err match {
        case Some(m) =>
          errors += (name -> m)
          System.err.println(s"[bench] $name ERRORED: $m")
        case None => results += (name -> times(runs / 2))
      }
      // Isolation barrier between queries (untimed): leaked cache
      // entries + heap pressure from earlier queries inflate the tail
      // of a back-to-back run 3-7x vs isolated medians (measured on
      // q_jaro_link / q_join_size in round 7). clearCache sweeps
      // anything CacheRegistry missed; the explicit GC drains the old
      // query's garbage before the next timing starts. Opt out with
      // SPARK_GRAFT_BENCH_NOGC=1.
      if (!sys.env.get("SPARK_GRAFT_BENCH_NOGC").contains("1")) {
        spark.catalog.clearCache()
        System.gc()
      }
      // Post-barrier resource snapshot. Deterministic drain: wait for
      // the listener bus to deliver every queued task-end event (bounded
      // — telemetry must not hang the bench) so stragglers can't be
      // attributed to the FOLLOWING query's row.
      org.apache.spark.GraftListenerBridge.waitUntilEmpty(
        spark.sparkContext, 10000L)
      val telAfter = telemetry.snapshot()
      telemetry.resetPeak()  // per-query high-water, not run-global
      val (ldB, ldF) = localDirStats(localDir)
      telemetries += (name -> (
        telAfter.map { case (k, v) =>
          if (k == "peak_exec_mem_b") k -> v  // high-water, not a delta
          else k -> (v - telBefore.getOrElse(k, 0L))
        } ++ Map(
          "driver_gc_ms" -> (driverGcMs() - gcBefore),
          "heap_after_gc_b" -> heapUsedB(),
          "metaspace_b" -> poolUsedB("metaspace"),
          "codecache_b" -> poolUsedB("codeheap"),
          "localdir_b" -> ldB, "localdir_files" -> ldF,
          "persisted_rdds" -> spark.sparkContext.getPersistentRDDs.size.toLong)))
      snapshot(complete = false)
    }
    snapshot(complete = true)
    println(jsonLine(results.toSeq, errors.toSeq, complete = true, topN = 40))
    spark.stop()
    // Remove the pinned local dir (Spark deletes its own subdirs on
    // stop, but be thorough — the bench must leave no residue).
    def rmrf(f: java.io.File): Unit = {
      val kids = f.listFiles(); if (kids != null) kids.foreach(rmrf)
      f.delete()
    }
    rmrf(localDir)
    // Budget enforcement (opt-in, round-close runs): exit nonzero if
    // any family overran its budget (the budget IS the cap — it
    // already carries the +25% headroom over the measured floor).
    // A 1.1x slack absorbs shared-box run-to-run variance (documented
    // ~±25% on single queries; family SUMS drift far less) so a noisy
    // ENFORCE=1 run doesn't fail spuriously; an enforce violation that
    // survives the slack still requires a confirming re-run before
    // being treated as a regression (close-discipline rule).
    if (sys.env.get("SPARK_GRAFT_BENCH_ENFORCE").contains("1")) {
      val famTotals = results.groupBy(p => BenchFamilies.family(p._1))
        .map { case (f, ps) => f -> ps.map(_._2).sum }
      val bad = famTotals.flatMap { case (f, v) =>
        BenchFamilies.budgetSec.get(f).filter(b => v > b * 1.1)
          .map(b => f"$f: ${v}%.1fs > 1.1x budget ${b}%.1fs")
      }
      if (bad.nonEmpty) {
        bad.foreach(m => System.err.println(s"[bench] BUDGET VIOLATION $m"))
        sys.exit(3)
      }
    }
  }
}

/** Query-family classification + per-family time budgets (seconds,
  * sf0.1, median-of-3, full-gate run). Budgets are set ~25% above the
  * measured post-round-10 family floors; the bench records any family
  * OVER its budget in `budget_violations` and fails the run under
  * SPARK_GRAFT_BENCH_ENFORCE=1 — so gate growth or a perf regression
  * shows up as a named family, not as silent total creep.
  */
object BenchFamilies {
  private val graphQs: Set[String] = Set(
    "q_pagerank", "q_pagerank_w", "q_sssp", "q_harmonic", "q_kcore",
    "q_lpa", "q_triangles", "q_adamic", "q_hop_distance", "q_trustrank",
    "q_hits", "q_modularity", "q_assortativity", "q_reciprocity",
    "q_clustering_coef", "q_common_neighbors", "q_degree_dist",
    "q_centralization", "q_rich_club", "q_walks", "q_paths", "q_islands",
    "q_prank", "q_follows", "q_transitions", "q_concurrency",
    "q_betweenness", "q_graph_dist")
  private val simQs: Set[String] = Set(
    "q_sim_brute", "q_sim_lsh", "q_sim_ivf", "q_sim_pq", "q_sim_ivfpq",
    "q_knn_graph", "q_knn_eval", "q_ann_graph", "q_matryoshka",
    "q_jlproj", "q_hard_negatives", "q_doc_embed", "q_embed_pairs",
    "q_embed_norms", "q_pca2", "q_whiten", "q_mahalanobis",
    "q_power_iter", "q_semdedup", "q_semdedup_knn", "q_cluster",
    "q_silhouette", "q_db_index", "q_ch", "q_dunn", "q_mixture",
    "q_cka", "q_kcenter", "q_shapley", "q_shapley_ann", "q_mmr")
  def family(name: String): String =
    if (name.startsWith("q_dedup") || name.startsWith("q_dup") ||
      Set("q_chunk_dedup", "q_para_dedup", "q_span_dup", "q_span_removal",
        "q_prefix_dup", "q_jaccard_sweep", "q_containment", "q_edit_dist",
        "q_jaro_link", "q_fuzzy_join", "q_split_assign", "q_cdc_chunks",
        "q_cdc_merge", "q_boilerplate", "q_novelty", "q_contamination")
        .contains(name)) "dedup"
    else if (graphQs.contains(name)) "graph"
    else if (simQs.contains(name)) "similarity"
    else "other"
  /** sf0.1 full-run budgets; "other" is ~230 sub-second-median
    * statistics/text/relational queries and gets the widest envelope.
    * RATCHETED round 11 (r10 verdict #6): each budget is the r10
    * driver-measured family total +25% headroom (dedup 56.6, graph
    * 70.3, similarity 35.2 + ~5 s for the new q_shapley_ann, other
    * 187.6 + q_decode_real), and the budget IS the cap — the old
    * >1.5x-budget trigger left graph an effective 102 s ceiling on a
    * 70 s family, too loose to bite once the family stops growing.
    */
  val budgetSec: Map[String, Double] = Map(
    "dedup" -> 71.0, "graph" -> 88.0, "similarity" -> 50.0,
    "other" -> 237.0)
}
