package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming running QUANTILE per key — the unbounded twin of
  * [[graft.operators.Analytics.exactQuantiles]]: each arriving value
  * updates a bounded row sample and the current p-quantile estimate is
  * emitted.
  *
  * Sampling is BOTTOM-k BY HASH (the KMV idea applied to rows, not
  * values): a row is kept iff the md5-derived hash of its seq is among
  * the k smallest seen — a deterministic uniform sample that needs no
  * RNG state, is replay-stable, and (like the other twins' exact
  * modes) IS the complete history while n ≤ k, so below the cap the
  * emitted quantile is EXACT type-1 — spec-pinned equal to the batch
  * definition — and `exact = false` flags the estimate regime past it.
  *
  * State per key: ≤ k (hash, value) pairs + count + high-water mark,
  * forever. Ordering/late contract shared with the other twins.
  */
object StreamQuantile {

  case class QRow(key: Long, seq: Long, n: Long, quantile: Option[Double],
      exact: Boolean, late: Boolean)

  private[streaming] case class QState(
      hashes: Array[Long], values: Array[Double], n: Long, maxSeq: Long)

  /** md5-derived 64-bit row hash — reproducible, no RNG state. */
  private[streaming] def rowHash(key: Long, seq: Long): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"sq:$key:$seq".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h ^ Long.MinValue // flip so signed order == unsigned hash order
  }

  def apply(events: Dataset[(Long, Long, Option[Double])], p: Double,
      k: Int = 256): Dataset[QRow] = {
    require(p > 0.0 && p <= 1.0, s"StreamQuantile: p must be in (0,1], got $p")
    require(k >= 16, s"StreamQuantile: k must be >= 16, got $k")
    import events.sparkSession.implicits._
    events
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (key: Long, it: Iterator[(Long, Long, Option[Double])],
            state: GroupState[QState]) => process(key, it, state, p, k))
  }

  /** Type-1 (lower) quantile of the sample — the batch definition. */
  private def sampleQuantile(values: Array[Double], p: Double): Double = {
    val sorted = values.clone()
    java.util.Arrays.sort(sorted)
    val rank = math.ceil(p * sorted.length).toLong.toInt.max(1)
    sorted(rank - 1)
  }

  private[streaming] def process(
      key: Long,
      it: Iterator[(Long, Long, Option[Double])],
      state: GroupState[QState],
      p: Double,
      k: Int): Iterator[QRow] = {
    var st = state.getOption.getOrElse(
      QState(Array.empty, Array.empty, 0L, Long.MinValue))
    val out = Vector.newBuilder[QRow]
    it.toVector.sortBy(_._2).foreach { case (_, seq, xOpt) =>
      if (seq <= st.maxSeq)
        out += QRow(key, seq, st.n, None, exact = false, late = true)
      else
        xOpt match {
          case None =>
            out += QRow(key, seq, st.n, None, exact = st.n <= k, late = false)
            st = st.copy(maxSeq = seq)
          case Some(x) =>
            val h = rowHash(key, seq)
            val pos = java.util.Arrays.binarySearch(st.hashes, h)
            val ins = if (pos >= 0) pos else -pos - 1
            val (hs, vs) =
              if (ins >= k) (st.hashes, st.values) // not among bottom-k
              else {
                val m = math.min(st.hashes.length + 1, k)
                val nh = new Array[Long](m); val nv = new Array[Double](m)
                System.arraycopy(st.hashes, 0, nh, 0, ins)
                System.arraycopy(st.values, 0, nv, 0, ins)
                nh(ins) = h; nv(ins) = x
                System.arraycopy(st.hashes, ins, nh, ins + 1, m - ins - 1)
                System.arraycopy(st.values, ins, nv, ins + 1, m - ins - 1)
                (nh, nv)
              }
            val n = st.n + 1
            st = QState(hs, vs, n, seq)
            out += QRow(key, seq, n, Some(sampleQuantile(vs, p)),
              exact = n <= k, late = false)
        }
    }
    state.update(st)
    out.result().iterator
  }
}
