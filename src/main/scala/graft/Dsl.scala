package graft

import graft.core.{Component, Composite, Renamer}
import graft.operators.{Mixer, Splitter, Transformer}
import graft.sinks.Sink
import graft.sources.Source
import org.apache.spark.sql.{Column, DataFrame}

/** Thin builder sugar over the constructors — the reference's DSL macros
  * (reference: lib/dsl.ex:7-41) as plain functions.
  */
object Dsl {
  def source(name: String, path: String): Source = Source.parquet(name, path)
  def sourceOf(name: String, df: DataFrame): Source = Source.of(name, df)
  // sync defaults false, matching Sink and the reference (lib/sink.ex:77).
  def sink(name: String, run: DataFrame => Unit, sync: Boolean = false): Sink =
    Sink(name, run, sync)
  def mix(inputs: Seq[String], output: String): Mixer = Mixer(inputs, output)
  def split(input: String, preds: (String, Column)*): Splitter =
    Splitter.predicates(input, preds)
  def transform(name: String)(fn: DataFrame => DataFrame): Transformer =
    Transformer(name)(fn)
  def rename(pairs: (String, String)*): Renamer = Renamer(pairs.toMap)
  def composite(comps: Component*): Composite = Composite(comps.toSeq)
}
