package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-key mode — the unbounded twin of
  * [[graft.operators.Relational.modePerKey]] for BOUNDED value domains
  * (event types, status codes, languages): per key the state is the
  * exact count map, so after any prefix of the stream the emitted mode
  * equals the batch operator run over that prefix — same max-count /
  * lexicographic-min tiebreak, checked bit-for-bit by the spec.
  *
  * The domain bound is the contract: state is `|domain|` (value,
  * count) pairs per key, and `maxDomain` is enforced — once a key has
  * seen that many distinct values, FURTHER NEW values are counted
  * only in `overflowed` (existing values keep counting exactly). An
  * overflowed row says "this column isn't categorical — use
  * [[StreamHeavyHitters]]", rather than silently growing state until
  * the job dies at 100 TB.
  *
  * One row per key per micro-batch (the current mode), `Update`-style
  * over an append sink: downstream reads the latest row per key.
  */
object StreamMode {

  case class MRow(key: Long, mode: Option[String], n: Long,
      distinct: Int, overflowed: Boolean)

  private[streaming] case class MState(
      counts: Map[String, Long], overflow: Long)

  def apply(
      events: Dataset[(Long, String)], // (key, value)
      maxDomain: Int = 1000): Dataset[MRow] = {
    require(maxDomain >= 1, s"StreamMode: maxDomain must be >= 1, got $maxDomain")
    import events.sparkSession.implicits._
    events
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (key: Long, it: Iterator[(Long, String)], state: GroupState[MState]) =>
          process(key, it, state, maxDomain))
  }

  private[streaming] def process(
      key: Long,
      it: Iterator[(Long, String)],
      state: GroupState[MState],
      maxDomain: Int): Iterator[MRow] = {
    var st = state.getOption.getOrElse(MState(Map.empty, 0L))
    it.foreach { case (_, v) =>
      if (v != null) {
        if (st.counts.contains(v))
          st = st.copy(counts = st.counts.updated(v, st.counts(v) + 1L))
        else if (st.counts.size < maxDomain)
          st = st.copy(counts = st.counts.updated(v, 1L))
        else st = st.copy(overflow = st.overflow + 1L)
      }
    }
    state.update(st)
    // batch tiebreak verbatim: max count, then smallest value
    val mode = st.counts.toSeq
      .sortBy { case (v, n) => (-n, v) }.headOption
    Iterator.single(MRow(key, mode.map(_._1), mode.map(_._2).getOrElse(0L),
      st.counts.size, st.overflow > 0L))
  }
}
