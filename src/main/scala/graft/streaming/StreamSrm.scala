package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sample-ratio-mismatch monitor — the live twin of
  * [[graft.operators.Analytics.srmCheck]]: per experiment, two
  * counters of O(1) state, and after every micro-batch the exact
  * integer-ppm 1-df chi-square with the same pre-compared 95/99
  * fences. An SRM that fires DURING the ramp-up saves the experiment;
  * one found in the nightly batch readout only explains the corpse.
  * On any prefix of the stream the emitted row equals the batch
  * operator over that prefix (spec-pinned — the statistic is pure
  * counter arithmetic, so parity is exact by construction).
  */
object StreamSrm {

  case class SRow(experiment: Long, nA: Long, nB: Long, chi2Ppm: Long,
      srm95: Boolean, srm99: Boolean)

  private[streaming] case class SState(a: Long, b: Long)

  def apply(events: Dataset[(Long, Long)]): Dataset[SRow] = { // (experiment, arm)
    import events.sparkSession.implicits._
    events
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (key: Long, it: Iterator[(Long, Long)], state: GroupState[SState]) =>
          process(key, it, state))
  }

  private[streaming] def process(
      key: Long,
      it: Iterator[(Long, Long)],
      state: GroupState[SState]): Iterator[SRow] = {
    var st = state.getOption.getOrElse(SState(0L, 0L))
    it.foreach {
      case (_, 0L) => st = st.copy(a = st.a + 1L)
      case (_, 1L) => st = st.copy(b = st.b + 1L)
      case _       => () // non-binary arms ignored, like the batch filter
    }
    state.update(st)
    val tot = st.a + st.b
    val chi2 = if (tot == 0L) 0L
      else (st.a - st.b) * (st.a - st.b) * 1000000L / tot
    Iterator.single(SRow(key, st.a, st.b, chi2,
      chi2 > 3841459L, chi2 > 6634897L))
  }
}
