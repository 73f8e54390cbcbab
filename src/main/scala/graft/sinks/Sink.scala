package graft.sinks

import graft.Flow
import graft.core.Component
import org.apache.spark.sql.DataFrame
import scala.concurrent.{ExecutionContext, Future}

/** Consumes (runs) a named stream and removes it from the flow
  * (reference: lib/sink.ex:33-42,69-91). The `run` thunk is the Spark
  * action. `sync = true` blocks the caller (the reference's `sync: true`);
  * otherwise the action is launched on a background thread and the
  * returned Future is collected in [[Sink.drain]] — mirroring the
  * reference's spawned runner (lib/sink.ex:77-83).
  */
final case class Sink(name: String, run: DataFrame => Unit, sync: Boolean = false)
    extends Component {
  def apply(flow: Flow): Flow = {
    val df = flow.getOrElse(
      name, throw new IllegalArgumentException(s"Sink: no stream named '$name' in flow"))
    if (sync) run(df)
    else {
      // Capture the caller's scope and re-install it inside the future
      // body: pooled workers inherit whatever scope was active when the
      // pool spawned them (DynamicVariable is inheritable), so without
      // the explicit re-install a thunk can register caches/marks into
      // a dead foreign scope that no drain() will ever release.
      val scope = graft.core.RunScope.active
      Sink.register(
        Future(graft.core.RunScope.withScope(scope)(run(df)))(ExecutionContext.global))
    }
    flow - name
  }
}

object Sink {
  // Per-run-scope: the Future registers with the CALLER's scope before
  // launching, so drain() in one flow run never awaits (or releases the
  // caches of) a concurrent pipeline running in its own RunScope.
  private def register(f: Future[Unit]): Unit =
    graft.core.RunScope.active.pendingSinks.add(f)

  /** Await all async sinks started so far IN THIS RUN SCOPE, then
    * release the DataFrames cached by this scope's components
    * (test/process-exit helper).
    */
  def drain(): Unit = {
    import scala.concurrent.duration._
    val pending = graft.core.RunScope.active.pendingSinks
    var f = pending.poll()
    while (f != null) { scala.concurrent.Await.result(f, 10.minutes); f = pending.poll() }
    graft.core.CacheRegistry.unpersistAll()
  }

  def parquet(name: String, path: String, sync: Boolean = true): Sink =
    Sink(name, _.write.mode("overwrite").parquet(path), sync)

  def csv(name: String, path: String, header: Boolean = true, sync: Boolean = true): Sink =
    Sink(name, _.write.mode("overwrite").option("header", header.toString).csv(path), sync)

  def json(name: String, path: String, sync: Boolean = true): Sink =
    Sink(name, _.write.mode("overwrite").json(path), sync)

  def orc(name: String, path: String, sync: Boolean = true): Sink =
    Sink(name, _.write.mode("overwrite").orc(path), sync)

  /** Hive-style partitioned parquet — THE lakehouse layout primitive:
    * a reader filtering on a partition column scans only its
    * directories (partition pruning, visible as PartitionFilters in
    * the scan node), which at 100 TB is the difference between
    * touching one day and touching three years. Choose partition
    * columns with bounded cardinality (dates, regions — NOT user ids:
    * a million tiny directories is its own outage).
    */
  def partitionedParquet(name: String, path: String,
      partitionCols: Seq[String], sync: Boolean = true): Sink = {
    require(partitionCols.nonEmpty, "partitionedParquet: need partition columns")
    Sink(name,
      _.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path),
      sync)
  }

  /** Bucketed, sorted parquet table — the write side of the
    * co-located-join path (BucketingSpec proves two tables bucketed on
    * the same key join with ZERO exchanges): at 100 TB, bucketing the
    * big fact tables once amortizes the join shuffle across every
    * downstream query. Bucketed writes go through the catalog
    * (`saveAsTable`) — plain path writes cannot carry bucket metadata.
    */
  def bucketedTable(
      name: String,
      table: String,
      buckets: Int,
      bucketCols: Seq[String],
      sync: Boolean = true): Sink = {
    require(buckets > 0 && bucketCols.nonEmpty, "bucketedTable needs buckets > 0 and at least one column")
    Sink(name, _.write.mode("overwrite")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet").saveAsTable(table), sync)
  }

  /** Appends each event + separator to a text file
    * (reference: lib/sink/write_lines.ex:9-29). Single-column string
    * streams only, as in the reference.
    */
  def writeLines(name: String, path: String, sync: Boolean = true): Sink =
    Sink(name, _.write.mode("overwrite").text(path), sync)

  /** Prints events (reference: lib/sink/io_puts.ex:7-20). */
  def console(name: String, numRows: Int = 20, sync: Boolean = true): Sink =
    Sink(name, _.show(numRows, truncate = false), sync)

  /** Discards events after computing them (reference: lib/sink/null.ex:7-16).
    * Useful to force execution; `foreach(_ => ())` avoids driver collect.
    */
  def nullSink(name: String, sync: Boolean = true): Sink =
    Sink(name, _.foreach(_ => ()), sync)

  /** Side-effect per event via a user origin function
    * (reference: lib/sink.ex:17-19 behaviour). Runs distributed on
    * executors — the fn must be serializable.
    */
  def foreachRow(name: String, f: org.apache.spark.sql.Row => Unit, sync: Boolean = true): Sink =
    Sink(name, _.foreach(r => f(r)), sync)
}
