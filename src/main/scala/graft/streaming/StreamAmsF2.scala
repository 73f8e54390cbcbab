package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming AMS F₂ sketch — the live twin of
  * [[graft.operators.Sketches.amsF2]] and the textbook streaming-
  * native operator: per replicate ONE signed counter of O(1) state,
  * updated as keys arrive, and E[counter²] = F₂ = Σ count(key)² at
  * every instant. The batch operator's explode×R + hash-agg becomes R
  * `flatMapGroupsWithState` groups; the sign hash is the SAME
  * md5("ams<r>:"+key) parity, so on any prefix of the stream each
  * replicate's counter is bit-equal to the batch operator run over
  * that prefix (spec-pinned). The skew/self-join-size monitor you can
  * afford to keep running: state is R longs no matter how many
  * distinct keys flow past.
  *
  * Input: (replicate, key) pairs — callers fan each key out to
  * replicates 0..R−1 ([[explodeReplicates]] does it for a key
  * stream). Emits per replicate after each micro-batch:
  * (replicate, n_rows, counter, est = counter²). A reader takes the
  * median of the R `est`s, exactly like the batch operator.
  */
object StreamAmsF2 {

  case class ARow(replicate: Long, nRows: Long, counter: Long, est: Long)

  private[streaming] case class AState(n: Long, c: Long)

  /** md5("ams<r>:"+key) parity sign — must stay bit-compatible with
    * the batch operator's Spark-SQL md5/conv expression (both hash
    * the UTF-8 bytes; the first 8 hex chars fit a long).
    */
  private[streaming] def sign(r: Long, key: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"ams$r:$key".getBytes("UTF-8"))
      .take(4).map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex, 16) % 2L * 2L - 1L
  }

  /** Fan a key stream out to (replicate, key) pairs. */
  def explodeReplicates(keys: Dataset[String],
      replicates: Int): Dataset[(Long, String)] = {
    import keys.sparkSession.implicits._
    keys.flatMap(k => (0L until replicates.toLong).map(r => (r, k)))
  }

  def apply(pairs: Dataset[(Long, String)]): Dataset[ARow] = {
    import pairs.sparkSession.implicits._
    pairs
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (key: Long, it: Iterator[(Long, String)], state: GroupState[AState]) =>
          process(key, it, state))
  }

  private[streaming] def process(
      r: Long,
      it: Iterator[(Long, String)],
      state: GroupState[AState]): Iterator[ARow] = {
    var st = state.getOption.getOrElse(AState(0L, 0L))
    it.foreach { case (_, k) =>
      st = AState(st.n + 1L, st.c + sign(r, k))
    }
    state.update(st)
    Iterator.single(ARow(r, st.n, st.c, st.c * st.c))
  }
}
