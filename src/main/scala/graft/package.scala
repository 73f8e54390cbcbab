import org.apache.spark.sql.DataFrame

/** graft — a Spark-native composable dataflow / analytics engine.
  *
  * The central datum, following the reference's flow abstraction
  * (reference: lib/strom.ex:8), is a [[graft.Flow]]: an immutable map
  * from stream name to a lazy `DataFrame`. Components are pure values
  * `Flow => Flow`; nothing executes until a sink (or any Spark action)
  * runs — the same lazy construct/execute split the reference has, but
  * realized by Catalyst's transformation/action model instead of an
  * actor runtime.
  */
package object graft {
  /** A named set of lazy streams (batch or streaming DataFrames). */
  type Flow = Map[String, DataFrame]

  /** The empty flow — valid input to any pipeline of sources. */
  val EmptyFlow: Flow = Map.empty
}
