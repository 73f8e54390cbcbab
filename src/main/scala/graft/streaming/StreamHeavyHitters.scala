package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming Misra-Gries heavy hitters — the unbounded twin of
  * [[graft.functions.TypedAggregators.heavyHitters]]: approximate
  * top-frequency keys over a stream with state that NEVER grows with
  * distinct-key volume. A plain streaming `groupBy(key).count` keeps
  * one state row per distinct key forever (unbounded on open-world
  * keys: URLs, user agents, n-grams); this keeps `shards × capacity`
  * counters, period.
  *
  * Keys hash into `shards` state groups; each shard folds its batch
  * slice into one MG sketch (same batched-decrement prune as the batch
  * aggregator — sketches are mergeable summaries, Agarwal et al.
  * PODS'12, so per-shard results combine downstream exactly like the
  * batch aggregator's partials). After every batch each updated shard
  * re-emits its full sketch with its running item total `n_shard`; the
  * LATEST emission per shard is the current answer, carrying the
  * classic MG guarantee: every item with true shard frequency
  * > n_shard/(capacity+1) is present, counts undercount by at most
  * n_shard/(capacity+1).
  *
  * Scale shape: one stateful exchange on the shard key. `shards`
  * bounds both state and per-task fold width; size it near your
  * executor-core count — MG folds are O(1) amortized per event, so
  * throughput is shuffle-bound, not sketch-bound.
  */
object StreamHeavyHitters {

  /** One sketch counter: `count` is the MG lower bound for `item` in
    * `shard`; `n_shard` is the shard's total items seen, so the error
    * bound `n_shard/(capacity+1)` rides with every row.
    */
  case class HHRow(shard: Int, item: String, count: Long, n_shard: Long)

  private[streaming] case class HHState(counters: Map[String, Long], n: Long)

  /** The batch aggregator's batched MG decrement — literally the same
    * definition ([[graft.functions.TypedAggregators.mgPrune]]), so the
    * per-shard streaming sketches combine exactly like batch partials.
    */
  private[streaming] def prune(m: Map[String, Long], capacity: Int): Map[String, Long] =
    graft.functions.TypedAggregators.mgPrune(m, capacity)

  def apply(keys: Dataset[String], capacity: Int, shards: Int = 16): Dataset[HHRow] = {
    require(capacity >= 1, s"StreamHeavyHitters: capacity must be >= 1, got $capacity")
    require(shards >= 1, s"StreamHeavyHitters: shards must be >= 1, got $shards")
    import keys.sparkSession.implicits._
    keys
      .filter((k: String) => k != null)
      .groupByKey(k => math.floorMod(k.hashCode, shards))
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (shard: Int, it: Iterator[String], state: GroupState[HHState]) =>
          process(shard, it, state, capacity))
  }

  private[streaming] def process(
      shard: Int,
      it: Iterator[String],
      state: GroupState[HHState],
      capacity: Int): Iterator[HHRow] = {
    var s = state.getOption.getOrElse(HHState(Map.empty, 0L))
    var folded = 0L
    it.foreach { k =>
      s = HHState(prune(s.counters.updated(k, s.counters.getOrElse(k, 0L) + 1L), capacity),
        s.n + 1L)
      folded += 1L
    }
    if (folded == 0L) Iterator.empty
    else {
      state.update(s)
      s.counters.iterator.map { case (k, v) => HHRow(shard, k, v, s.n) }
    }
  }
}
