package graft

/** Gate-wide plan lint: every SparkEntry query's plan must be free of
  * the two silent cluster-killers [[graft.operators.Diagnostics.planLint]]
  * classifies as errors —
  *
  *  - `global-window` (a WindowExec with no PARTITION BY collapses the
  *    whole input into one task; at 100 TB that is one executor thread
  *    sorting the corpus), and
  *  - `trivial-join-predicate` (an `a.id = a.id` self-join condition
  *    that is always true — the join quietly degrades toward a cross
  *    product and depends on Spark's version-fragile automatic
  *    self-join disambiguation).
  *
  * Construction-only where possible: planLint inspects the analyzed /
  * pre-adaptive physical plan without executing the query, but note
  * that some query builders (iterative graph operators, quantizer
  * training) legitimately run bounded driver-side actions while
  * CONSTRUCTING the frame, so this spec costs a small multiple of
  * analysis time at sf0.001, not a full gate run.
  */
class GateLintSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("all gate queries: no global window, no trivially-true join predicate") {
    val bad = scala.collection.mutable.ArrayBuffer.empty[String]
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.foreach { case (name, fn) =>
      try {
        val findings = graft.operators.Diagnostics.planLint(fn(spark, sfDir))
          .collect()
          .filter { r =>
            val rule = r.getString(0)
            rule == "global-window" || rule == "trivial-join-predicate"
          }
        findings.foreach(r =>
          bad += s"$name: ${r.getString(0)} -> ${r.getString(2)}")
      } catch {
        case e: Throwable => failed += s"$name: ${e.getClass.getSimpleName}: ${e.getMessage}"
      } finally graft.core.CacheRegistry.unpersistAll()
    }
    assert(failed.isEmpty, s"queries failed to construct:\n${failed.mkString("\n")}")
    assert(bad.isEmpty, s"plan lint errors:\n${bad.mkString("\n")}")
  }

  test("planLint flags a trivially-true self-join predicate") {
    import spark.implicits._
    // A condition whose both legs resolve to the SAME attribute. (The
    // Dataset-API `df("id") === df("id")` spelling is auto-repaired by
    // Spark's self-join disambiguation before analysis completes, so
    // the SQL form below is the shape that actually reaches the plan.)
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .createOrReplaceTempView("lint_t")
    val joined = spark.sql(
      "SELECT x.id FROM lint_t x JOIN lint_t y ON x.id = x.id")
    val rules = graft.operators.Diagnostics.planLint(joined)
      .collect().map(_.getString(0)).toSet
    spark.catalog.dropTempView("lint_t")
    assert(rules.contains("trivial-join-predicate"), s"got rules: $rules")
  }
}
