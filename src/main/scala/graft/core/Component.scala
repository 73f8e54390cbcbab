package graft.core

import graft.Flow
import org.apache.spark.sql.DataFrame

/** A dataflow component: a pure value transforming a [[graft.Flow]].
  *
  * Mirrors the reference's component contract `call(flow, component) ::
  * flow` (reference: lib/strom.ex:6, lib/composite.ex:93-97). Components
  * compose by ordinary function composition; a pipeline is a value, not
  * a process tree — Spark's driver/executor scheduling replaces the
  * reference's GenMix actor runtime (reference: lib/gen_mix.ex) wholesale.
  */
trait Component extends (Flow => Flow) {
  def apply(flow: Flow): Flow

  /** Sequential composition: `this andThen next` as a Composite. */
  def |>(next: Component): Composite = Composite(Seq(this, next))
}

/** Session-lifetime registry of DataFrames persisted by components
  * (today: cache=true Splitters), so callers can release cached blocks
  * deterministically instead of leaking them until session end.
  * `Sink.drain()` calls [[unpersistAll]] after awaiting async sinks.
  */
object CacheRegistry {
  private val persisted =
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  def persist(df: DataFrame, level: org.apache.spark.storage.StorageLevel): DataFrame = {
    val p = df.persist(level)
    persisted.add(p)
    p
  }

  def unpersistAll(): Unit = {
    var df = persisted.poll()
    while (df != null) { df.unpersist(); df = persisted.poll() }
  }
}

/** Session-lifetime registry marking streams whose mix was declared
  * `no_wait` (reference: lib/gen_mix.ex:377-387 — output halts as soon
  * as one input halts). Batch unions are all-finite so the flag is a
  * no-op there; for streams, [[graft.streaming.StreamSink]] consumes
  * the mark and applies the stop-when-an-input-drains policy.
  */
object NoWait {
  private val marked = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  def mark(stream: String): Unit = marked.add(stream)
  /** True if the stream was marked; clears the mark (one consumer). */
  def consume(stream: String): Boolean = marked.remove(stream)
}

object FlowOps {
  /** Name-collision rule: output landing on an existing stream name is
    * concatenated (bag union), never replaced
    * (reference: lib/gen_mix/streams.ex:18-23, lib/source.ex:108-112).
    */
  def merge(flow: Flow, name: String, df: DataFrame): Flow =
    flow.get(name) match {
      case Some(prev) => flow.updated(name, prev.unionByName(df))
      case None       => flow.updated(name, df)
    }

  /** Consume `inputs` from the flow, then merge `outputs` under the
    * collision rule — the core GenMix flow-rewrite step
    * (reference: lib/gen_mix/streams.ex:16-24). Inputs are plucked
    * first so a component may legally re-emit an input name.
    */
  def rewire(flow: Flow, inputs: Seq[String], outputs: Seq[(String, DataFrame)]): Flow = {
    val missing = inputs.filterNot(flow.contains)
    require(missing.isEmpty, s"flow is missing input stream(s): ${missing.mkString(", ")}")
    outputs.foldLeft(flow -- inputs) { case (f, (n, df)) => merge(f, n, df) }
  }
}

/** A pipeline of components that is itself a component
  * (reference: lib/composite.ex:93-97). Nested composites flatten
  * (reference: lib/composite.ex:40-52), so `Composite(a, Composite(b, c))`
  * ≡ `Composite(a, b, c)`.
  *
  * The reference's start/stop lifecycle and supervision tree have no
  * analog here: plans are immutable values and a failed action throws.
  * The live-manipulation API (insert/replace/delete) is preserved at the
  * value level — it returns a new Composite to re-run, since Catalyst
  * plans are cheap to rebuild (in-flight rewrite is out of scope; see
  * SURVEY §2.1 #17).
  */
final case class Composite(components: Seq[Component]) extends Component {
  def apply(flow: Flow): Flow = components.foldLeft(flow)((f, c) => c(f))

  /** Reference error contract (`:indicies_not_in_range`, reference:
    * test/composite/manipulations/delete_components_test.exs:36-55):
    * invalid indices fail loudly instead of silently clamping — a
    * `patch` on a bad range would quietly rewrite the wrong stages.
    * (The reference's `:cannot_replace_last_component` rule guards its
    * RUNNING actor topology; value-level rebuilds have no such hazard,
    * so it intentionally does not apply here.)
    */
  private def requireRange(from: Int, to: Int): Unit =
    require(
      from >= 0 && to >= from && to < components.length,
      s"indices [$from, $to] not in range [0, ${components.length - 1}]")

  /** Insert components at index `i` (reference: lib/composite.ex:102-117). */
  def insert(i: Int, comps: Component*): Composite = {
    require(
      i >= 0 && i <= components.length,
      s"insert index $i not in range [0, ${components.length}]")
    Composite(components.patch(i, Composite.flatten(comps), 0))
  }

  /** Replace components in `[from, to]` inclusive
    * (reference: lib/composite/manipulations.ex:30-52).
    */
  def replace(from: Int, to: Int, comps: Component*): Composite = {
    requireRange(from, to)
    Composite(components.patch(from, Composite.flatten(comps), to - from + 1))
  }

  /** Delete components in `[from, to]` inclusive
    * (reference: lib/composite/manipulations.ex:54-74).
    */
  def delete(from: Int, to: Int): Composite = {
    requireRange(from, to)
    Composite(components.patch(from, Nil, to - from + 1))
  }

  /** ASCII stream-graph (reference: lib/composite/topology.ex:9-33).
    * For the physical plan use `df.explain` on any flow stream instead.
    */
  def topology: String = Topology.draw(this)
}

/** Stream-graph rendering for composites (reference:
  * lib/composite/topology.ex:9-33 draws each component with the stream
  * names flowing in and out of it). Components are values here, so the
  * edges are recovered from their declared input/output names.
  */
object Topology {

  /** (consumed streams, produced streams) for a component, by shape. */
  def edges(c: Component): (Seq[String], Seq[String]) = c match {
    case s: graft.sources.Source          => (Nil, Seq(s.name))
    case s: graft.streaming.StreamSource  => (Nil, Seq(s.name))
    case k: graft.sinks.Sink              => (Seq(k.name), Nil)
    case k: graft.streaming.StreamSink    => (Seq(k.name), Nil)
    case w: graft.streaming.Watermark     => (Seq(w.name), Seq(w.name))
    case t: graft.operators.Transformer   => (t.names, t.names)
    case m: graft.operators.Mixer         => (m.inputs, Seq(m.output))
    case sp: graft.operators.Splitter     => (Seq(sp.input), sp.outputs.map(_._1))
    case l: graft.operators.Loop          => (Seq(l.name), Seq(l.name))
    case r: Renamer                       => (r.mapping.keys.toSeq, r.mapping.values.toSeq)
    case comp: Composite =>
      val es = comp.components.map(edges)
      (es.flatMap(_._1), es.flatMap(_._2))
    case _                                => (Nil, Nil)
  }

  /** One line per component: `[i] Name  ins ──▶ outs` (`·` = none). */
  def draw(composite: Composite): String =
    composite.components.zipWithIndex.map { case (c, i) =>
      val (ins, outs) = edges(c)
      val name = c.getClass.getSimpleName.stripSuffix("$")
      val in = if (ins.isEmpty) "·" else ins.distinct.mkString(", ")
      val out = if (outs.isEmpty) "·" else outs.distinct.mkString(", ")
      f"[$i] $name%-12s $in ──▶ $out"
    }.mkString("\n")
}

object Composite {
  /** Varargs constructor with reference flattening semantics. */
  def apply(comps: Component*)(implicit d: DummyImplicit): Composite =
    Composite(flatten(comps))

  def of(comps: Component*): Composite = Composite(flatten(comps))

  private[core] def flatten(comps: Seq[Component]): Seq[Component] =
    comps.flatMap {
      case Composite(inner) => flatten(inner)
      case c                => Seq(c)
    }
}

/** Renames flow keys; fails fast if a source name is absent
  * (reference: lib/renamer.ex:16-33). A rename landing on an existing
  * name concatenates under the collision rule.
  */
final case class Renamer(mapping: Map[String, String]) extends Component {
  def apply(flow: Flow): Flow = {
    val missing = mapping.keys.filterNot(flow.contains)
    require(missing.isEmpty, s"Renamer: missing stream(s): ${missing.mkString(", ")}")
    // A no_wait mark travels with the stream it describes — without the
    // transfer, renaming between the Mixer and the StreamSink would
    // silently drop the stop policy AND leave a stale mark behind.
    mapping.foreach { case (from, to) => if (NoWait.consume(from)) NoWait.mark(to) }
    val renamed = mapping.map { case (from, to) => to -> flow(from) }
    renamed.foldLeft(flow -- mapping.keys) { case (f, (n, df)) => FlowOps.merge(f, n, df) }
  }
}
