package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** The reference's parcels CEP pipeline (order/shipment matching with a
  * delivery SLA, test/examples/parcels_test.exs:106-252) as a keyed
  * stateful streaming operator.
  *
  * Strom implements this with three hand-rolled actor accumulators:
  * `order_seen`/`force_order` reorder the mixed stream so no shipment
  * precedes its order (buffering shipments forever in a memo map), and
  * `decide` runs the per-order state machine. Here the reorder problem
  * disappears — state is keyed by order, so early shipments simply wait
  * in the order's state — and the unbounded memo becomes watermark-aged
  * state with a processing-time timeout, the bounded-memory form.
  *
  * Decision rules (parcels_test.exs decide/2, SLA precedence per the
  * reference: a late shipment trips the threshold even while the order
  * is incomplete):
  *  - any shipment with ts > order ts + slaDays  ⇒ THRESHOLD_EXCEEDED
  *  - all `toShip` parcels arrived in time       ⇒ ALL_PARCELS_SHIPPED
  *  - state times out before either              ⇒ TIMED_OUT (bounded-
  *    state divergence from the reference, which waits forever)
  */
object ParcelsCep {

  /** kind: "ORDER" (toShip meaningful) or "SHIPMENT". Epoch-micro
    * timestamps keep the state machine arithmetic engine-neutral.
    */
  case class OrderEvent(orderKey: Long, kind: String, tsUs: Long, toShip: Int)

  case class OrderState(
      orderTsUs: Long,
      toShip: Int,
      shipped: Int,
      pendingShipTsUs: List[Long], // shipments seen before their order
      done: Boolean)

  case class OrderStatus(orderKey: Long, status: String)

  private val UsPerDay = 86400000000L

  def apply(
      events: Dataset[OrderEvent],
      slaDays: Int,
      stateTimeoutMs: Long = 0L): Dataset[OrderStatus] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.orderKey)
      .flatMapGroupsWithState(
        OutputMode.Append(),
        if (stateTimeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
        else GroupStateTimeout.NoTimeout())(
        (key: Long, it: Iterator[OrderEvent], state: GroupState[OrderState]) =>
          process(key, it, state, slaDays, stateTimeoutMs))
  }

  private[streaming] def process(
      key: Long,
      it: Iterator[OrderEvent],
      state: GroupState[OrderState],
      slaDays: Int,
      stateTimeoutMs: Long): Iterator[OrderStatus] = {
    if (state.hasTimedOut) {
      val done = state.getOption.exists(_.done)
      state.remove()
      return if (done) Iterator.empty else Iterator(OrderStatus(key, "TIMED_OUT"))
    }
    var st = state.getOption.getOrElse(OrderState(-1L, -1, 0, Nil, done = false))
    val slaUs = slaDays.toLong * UsPerDay
    var emit: List[OrderStatus] = Nil

    def absorb(shipTsUs: Long): Unit =
      if (!st.done) {
        if (shipTsUs > st.orderTsUs + slaUs)
          { emit ::= OrderStatus(key, "THRESHOLD_EXCEEDED"); st = st.copy(done = true) }
        else {
          st = st.copy(shipped = st.shipped + 1)
          if (st.shipped >= st.toShip)
            { emit ::= OrderStatus(key, "ALL_PARCELS_SHIPPED"); st = st.copy(done = true) }
        }
      }

    // Spark gives no within-group iterator order; fold in event time
    // (ORDER first on ties) so results are deterministic regardless of
    // shuffle fetch order. Late-extra shipments after completion are
    // ignored (st.done), matching the reference's nil-memo branch.
    it.toSeq.sortBy(ev => (ev.tsUs, if (ev.kind == "ORDER") 0 else 1)).foreach { ev =>
      ev.kind match {
        case "ORDER" =>
          st = st.copy(orderTsUs = ev.tsUs, toShip = ev.toShip)
          // a zero-parcel order is complete the moment it exists —
          // decided BEFORE absorbing buffered shipments, so a late
          // pre-order shipment cannot trip the threshold (matches
          // shipmentSla's expected <= 0 branch)
          if (!st.done && st.shipped >= st.toShip)
            { emit ::= OrderStatus(key, "ALL_PARCELS_SHIPPED"); st = st.copy(done = true) }
          val pending = st.pendingShipTsUs.sorted
          st = st.copy(pendingShipTsUs = Nil)
          pending.foreach(absorb)
        case _ =>
          if (st.orderTsUs < 0) // shipment before its order: buffer (force_order)
            st = st.copy(pendingShipTsUs = ev.tsUs :: st.pendingShipTsUs)
          else absorb(ev.tsUs)
      }
    }

    // With a timeout configured, keep a done-tombstone so a shipment
    // arriving after completion is ignored rather than re-created as a
    // forever-buffered pre-order shipment; the timeout reclaims it.
    // Without a timeout there is nothing to reclaim tombstones, so
    // remove completed state immediately — bounded state wins over the
    // post-completion-orphan edge (which then re-buffers until the
    // (nonexistent) order returns, as the reference's memo also would).
    if (st.done && st.pendingShipTsUs.isEmpty && stateTimeoutMs <= 0) state.remove()
    else {
      state.update(st)
      if (stateTimeoutMs > 0) state.setTimeoutDuration(stateTimeoutMs)
    }
    emit.reverseIterator
  }
}
