package graft.operators

import graft.Flow
import graft.core.{Component, FlowOps}
import org.apache.spark.sql.{Column, DataFrame, Encoder, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder

/** The workhorse (reference: lib/transformer.ex:48-66,91-101). Applies a
  * DataFrame transformation to one or many named streams independently —
  * which preserves the reference's one-accumulator-per-input-stream rule
  * (lib/transformer.ex:77) for the stateful form, since each stream gets
  * its own fold.
  *
  * Three forms, in strict preference order for scale:
  *   - [[Transformer.apply]] / [[Transformer.select]]: declarative Column
  *     expressions — whole-stage-codegen'd, filter/projection pushed to
  *     the scan. Use this unless impossible.
  *   - [[Transformer.flatMap]]: typed 1→N row expansion; still distributed.
  *   - [[Transformer.stateful]]: ordered global fold — inherently
  *     sequential (telegram re-wrapping, round-robin pairing), so it
  *     sorts and collapses to ONE task. Never put this on the 100 TB
  *     path; it exists for parity with order-dependent reference
  *     examples (SURVEY §7.5).
  */
final case class Transformer(names: Seq[String], fn: DataFrame => DataFrame)
    extends Component {
  def apply(flow: Flow): Flow = {
    val missing = names.filterNot(flow.contains)
    require(missing.isEmpty, s"Transformer: missing stream(s): ${missing.mkString(", ")}")
    FlowOps.rewire(flow, names, names.map(n => n -> fn(flow(n))))
  }
}

object Transformer {
  def apply(name: String)(fn: DataFrame => DataFrame): Transformer =
    Transformer(Seq(name), fn)

  def onEach(names: Seq[String])(fn: DataFrame => DataFrame): Transformer =
    Transformer(names, fn)

  /** Scalar-map form (reference 1-arity fn, lib/transformer.ex:53-58):
    * pure projection, stays in codegen.
    */
  def select(name: String, cols: Column*): Transformer =
    Transformer(Seq(name), (df: DataFrame) => df.select(cols: _*))

  def withColumn(name: String, colName: String, col: Column): Transformer =
    Transformer(Seq(name), (df: DataFrame) => df.withColumn(colName, col))

  def filter(name: String, predicate: Column): Transformer =
    Transformer(Seq(name), (df: DataFrame) => df.filter(predicate))

  /** 1→N flat-map form (reference 2-arity fn emitting lists,
    * e.g. test/examples/telegram_test.exs:12-16). Prefer
    * `explode(...)` Columns over this typed path when expressible.
    */
  def flatMap[T: Encoder, U: Encoder](name: String)(fn: T => IterableOnce[U]): Transformer =
    Transformer(Seq(name), (df: DataFrame) => df.as[T].flatMap(fn).toDF())

  /** Keyed ordered stateful fold — the SCALABLE form of [[stateful]]:
    * one independent accumulator per key, keys processed in parallel
    * (`groupByKey` + sorted `flatMapGroups`), state never leaves one
    * executor. This is what per-key reference accumulators (the parcels
    * decide/2 memo keyed by order) become at 100 TB; reserve the
    * global [[stateful]] for genuinely total-order semantics.
    */
  def keyedStateful[K: Encoder, S](
      name: String,
      keyOf: Row => K,
      orderBy: Seq[Column],
      outputSchema: org.apache.spark.sql.types.StructType,
      init: () => S, // factory: each key gets a FRESH accumulator, so a
      // mutable S (the natural port of a reference memo map) is safe
      finish: (K, S) => Seq[Row] = (_: K, _: S) => Seq.empty[Row])(
      fn: (Row, S) => (Seq[Row], S)): Transformer =
    Transformer(Seq(name), (df: DataFrame) => {
      val grouped = df.groupByKey(keyOf)(implicitly[Encoder[K]])
      // flatMapSortedGroups sorts within the shuffle (secondary sort) —
      // the group streams through in order without materializing on the
      // heap, so a hot key cannot OOM the task.
      grouped.flatMapSortedGroups(orderBy: _*) { (key: K, rows: Iterator[Row]) =>
        var acc = init()
        val out = rows.flatMap { r =>
          val (emitted, next) = fn(r, acc)
          acc = next
          emitted
        }
        out ++ finish(key, acc)
      }(RowEncoder.encoderFor(outputSchema)).toDF()
    })

  /** Skip-poisoned-record map: rows whose `fn` throws are dropped and
    * counted in a named LongAccumulator; everything else flows on.
    *
    * This reproduces the reference's task-restart semantics — a crashed
    * task is restarted with its last good accumulator and only the
    * in-flight chunk is lost (reference: lib/gen_mix.ex:355-365,
    * behavior spec test/crash_test.exs:34-57: [1..5] with 3 poisoned
    * ⇒ [2,4,8,10]). Spark's native retry is stronger (deterministic
    * replay fails the job on a poisoned record), so dropping is opt-in
    * here, never default.
    */
  def skippingFailures[T: Encoder, U: Encoder](
      name: String,
      counter: Option[org.apache.spark.util.LongAccumulator] = None)(
      fn: T => U): Transformer =
    Transformer(Seq(name), (df: DataFrame) => {
      val acc = counter.getOrElse(
        df.sparkSession.sparkContext.longAccumulator("graft.dropped"))
      df.as[T].mapPartitions { it =>
        it.flatMap { t =>
          scala.util.Try(fn(t)) match {
            case scala.util.Success(u) => Iterator.single(u)
            case scala.util.Failure(_) => acc.add(1L); Iterator.empty
          }
        }
      }.toDF()
    })

  /** Ordered stateful flat-map: the reference's `fn(event, acc) ->
    * {[events], acc}` (lib/transformer.ex:44-47,91-101) over a GLOBAL
    * order. Sorts by `orderBy`, coalesces to a single partition, folds.
    * Sequential by construction — document-and-isolate per SURVEY §7.5.
    * For keyed state at scale use groupByKey + flatMapGroups (batch) or
    * flatMapGroupsWithState (streaming) instead.
    */
  def stateful[S](
      name: String,
      orderBy: Seq[Column],
      outputSchema: org.apache.spark.sql.types.StructType,
      init: S,
      finish: S => Seq[Row] = (_: S) => Seq.empty[Row])(
      fn: (Row, S) => (Seq[Row], S)): Transformer =
    Transformer(Seq(name), (df: DataFrame) => {
      implicit val enc: Encoder[Row] = RowEncoder.encoderFor(outputSchema)
      val sorted = if (orderBy.nonEmpty) df.orderBy(orderBy: _*) else df
      sorted.coalesce(1).mapPartitions { rows =>
        var acc = init
        // `++` takes its argument by name, so finish(acc) sees the final
        // accumulator — the reference's end-of-stream flush (the `:done`
        // sentinel in words_count_test.exs:12).
        rows.flatMap { r =>
          val (out, next) = fn(r, acc)
          acc = next
          out
        } ++ finish(acc)
      }
    })
}
