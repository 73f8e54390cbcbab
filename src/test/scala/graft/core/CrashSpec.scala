package graft.core

import graft.{EmptyFlow, Flow, SparkSpec}
import graft.operators.{Splitter, Transformer}
import graft.sinks.Sink
import org.apache.spark.sql.functions._

/** The reference's crash matrix (reference: test/crash_test.exs:34-198)
  * re-expressed for Spark's execution model. The reference restarts a
  * crashed task with its last accumulator and drops only the in-flight
  * chunk; Spark's deterministic replay instead fails the job on a
  * poisoned record (fail-stop), with `Transformer.skippingFailures` as
  * the opt-in skip-the-poisoned-record parity mode. These specs pin
  * where each kind of poison surfaces.
  */
class CrashSpec extends SparkSpec {
  import spark.implicits._

  /** Walk the cause chain for the poison marker (Spark wraps user
    * exceptions in SparkException layers).
    */
  private def poisoned(e: Throwable, marker: String): Boolean =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(10)
      .exists(t => Option(t.getMessage).exists(_.contains(marker)))

  private val boom = udf((v: Int) =>
    if (v == 3) throw new RuntimeException("poisoned-fn") else v)

  test("poisoned transformer fn fails the job at action time (fail-stop default)") {
    // reference: crash_test.exs poisoned source fn — Strom restarts the
    // task; Spark deterministically replays the same record, so the
    // default contract is job failure, surfaced at the ACTION.
    val flow: Flow = Map("s" -> Seq(1, 2, 3, 4, 5).toDF("v"))
    val out = Transformer("s")(_.select(boom(col("v")).as("v")))(flow)
    val e = intercept[Exception](out("s").count())
    assert(poisoned(e, "poisoned-fn"))
  }

  test("poisoned splitter predicate fails only the branch that evaluates it") {
    val flow: Flow = Map("in" -> Seq(1, 2, 3, 4).toDF("v"))
    val out = Splitter.predicates(
      "in",
      Seq("bad" -> (boom(col("v")) === 0), "good" -> (col("v") % 2 === 0)))(flow)
    assert(out("good").as[Int].collect().sorted.toSeq == Seq(2, 4)) // unaffected
    val e = intercept[Exception](out("bad").count())
    assert(poisoned(e, "poisoned-fn"))
  }

  test("poisoned sync sink propagates to the pipeline caller") {
    // reference: crash_test.exs poisoned sink fn crashes the component;
    // a sync sink runs in the caller, so the caller sees the crash.
    val pipeline = Composite(Seq(
      Sink("s", df => { df.count(); throw new RuntimeException("poisoned-sink") }, sync = true)))
    val e = intercept[RuntimeException](pipeline(Map("s" -> Seq(1).toDF("v"))))
    assert(poisoned(e, "poisoned-sink"))
  }

  test("poisoned async sink surfaces at drain, not at call") {
    val flow = Sink(
      "s", _ => throw new RuntimeException("poisoned-async"), sync = false)(
      Map("s" -> Seq(1).toDF("v")))
    assert(flow.isEmpty) // call returned: the crash is in the background runner
    val e = intercept[RuntimeException](Sink.drain())
    assert(poisoned(e, "poisoned-async"))
  }

  test("a crashing component aborts the composite fold before later members run") {
    // reference: composite crash propagation (lib/composite.ex:223-230,
    // crash_test.exs:171-198) — one dead member takes the composite down.
    val ran = new java.util.concurrent.atomic.AtomicBoolean(false)
    val pipeline = Composite(Seq(
      Transformer("does-not-exist")(identity), // rewire fails fast
      Transformer("s")(df => { ran.set(true); df })))
    intercept[IllegalArgumentException](pipeline(Map("s" -> Seq(1).toDF("v"))))
    assert(!ran.get()) // fail-stop: downstream members never started
  }

  test("skippingFailures keeps the pipeline alive and downstream components consume survivors") {
    // reference: crash_test.exs:34-57 — [1..5] with 3 poisoned, doubled
    // => [2,4,8,10]; the crashed task restarts and the stream continues.
    val drops = spark.sparkContext.longAccumulator("crash-spec-drops")
    val pipeline = Composite(Seq(
      Transformer.skippingFailures[Int, Int]("s", Some(drops)) { v =>
        if (v == 3) throw new RuntimeException("poisoned-rec") else v * 2
      },
      Transformer("s")(_.agg(sum(col("value")).cast("long").as("total")))))
    val out = pipeline(Map("s" -> Seq(1, 2, 3, 4, 5).toDF("value")))
    assert(out("s").as[Long].head() == 24L) // 2+4+8+10
    assert(drops.value == 1L) // exactly the poisoned record was dropped
  }

  test("Spark task retry (spark.task.maxFailures) recovers a once-failing task with exact results") {
    // SURVEY §2.1 #20 maps the reference's supervision/restart strategy
    // (test/crash_test.exs kill-and-resume) onto Spark's task-level
    // retry. The shared session is local[4] = fail-fast and a JVM holds
    // one SparkContext, so RetryProbe runs the local[2, 2] scenario in
    // its own JVM: every task's first attempt throws, the retry
    // succeeds, and the flow's results are exact.
    import scala.jdk.CollectionConverters._
    val javaBin = new java.io.File(
      new java.io.File(System.getProperty("java.home"), "bin"), "java").getAbsolutePath
    // reuse this (forked, Spark-configured) JVM's --add-opens flags;
    // flag and module may arrive as one "--add-opens=..." token or two
    val jvmArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.toSeq
    val addOpens = jvmArgs.zipWithIndex.flatMap {
      case (a, i) if a == "--add-opens" || a == "--add-exports" => Seq(a, jvmArgs(i + 1))
      case (a, _) if a.startsWith("--add-opens=") || a.startsWith("--add-exports=") => Seq(a)
      case _ => Nil
    }
    val cmd = Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx2g", "-cp", System.getProperty("java.class.path"), "graft.core.RetryProbe")
    val p = new ProcessBuilder(cmd.asJava).redirectErrorStream(true).start()
    val out = new String(p.getInputStream.readAllBytes())
    val code = p.waitFor()
    assert(code == 0, s"RetryProbe exited $code:\n${out.takeRight(2000)}")
  }

  test("poisoned Source.unfold step surfaces at origin time; runaway steps hit the backstops") {
    import graft.sources.Source
    // a step that throws mid-unfold: driver-side by design, so the
    // poison surfaces when the origin materializes (fail-stop — no
    // partial Dataset escapes)
    val poison = Source.unfold[Int, Int]("p", 0,
      s => if (s == 2) throw new RuntimeException("poisoned-step")
           else Some((Seq(s), s + 1)))
    val e = intercept[Exception](poison.origin(spark))
    assert(poisoned(e, "poisoned-step"))
    // a never-halting step trips maxChunks...
    val runaway = Source.unfold[Int, Int]("r", 0,
      s => Some((Seq(s), s + 1)), maxChunks = 16)
    val e2 = intercept[IllegalStateException](runaway.origin(spark))
    assert(e2.getMessage.contains("never halted"))
    // ...and a halting step whose chunks are huge trips maxRows before
    // the driver buffers them all (the rows bound is the real guard)
    val fat = Source.unfold[Int, Int]("f", 0,
      s => if (s < 4) Some((Seq.fill(100)(s), s + 1)) else None,
      maxRows = 150L)
    val e3 = intercept[IllegalStateException](fat.origin(spark))
    assert(e3.getMessage.contains("maxRows"))
  }
}
