package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** First-class relational/CEP operators for the query patterns the
  * reference implements with hand-rolled stateful Transformers
  * (SURVEY §2.2). Each is a declarative plan Catalyst can optimize —
  * partial aggregation, join-strategy selection and pushdown all apply.
  */
object Relational {

  /** Tumbling count-window aggregation (reference:
    * test/examples/window_test.exs:7-32): global row order chopped into
    * fixed-size batches. Order-dependent ⇒ single global sort; use the
    * time-window variant at scale.
    */
  def tumblingCountWindow(df: DataFrame, orderBy: Seq[Column], size: Int, aggs: Seq[Column]): DataFrame = {
    val w = Window.orderBy(orderBy: _*)
    df.withColumn("_rn", row_number().over(w))
      .withColumn("window_id", floor((col("_rn") - 1) / size))
      .groupBy(col("window_id"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Sliding count-window (reference: window_test.exs:36-63): each row
    * carries aggregates over the trailing `size` rows. `frameAggs`
    * receives the framed WindowSpec and returns the aggregate columns
    * (e.g. `w => Seq(avg(c).over(w).as("sliding_avg"))`), so any frame
    * aggregate — including exact-decimal sums that avoid float drift —
    * can ride the same single shuffle.
    */
  def slidingCountWindow(
      df: DataFrame,
      partitionBy: Seq[Column],
      orderBy: Seq[Column],
      size: Int)(
      frameAggs: org.apache.spark.sql.expressions.WindowSpec => Seq[Column]): DataFrame = {
    val w = Window.partitionBy(partitionBy: _*).orderBy(orderBy: _*)
      .rowsBetween(-(size - 1), Window.currentRow)
    df.select(df.columns.toIndexedSeq.map(col) ++ frameAggs(w): _*)
  }

  /** Convenience: trailing-window average of `valueCol`, computed as an
    * exact decimal sum divided by the frame row count — deterministic
    * bit-for-bit across engines (no incremental float add/retract drift).
    */
  def slidingAvg(
      df: DataFrame,
      partitionBy: Seq[Column],
      orderBy: Seq[Column],
      size: Int,
      valueCol: Column): DataFrame =
    slidingCountWindow(df, partitionBy, orderBy, size) { w =>
      Seq(
        (sum(valueCol.cast("decimal(18,6)")).over(w).cast("double") /
          count(lit(1)).over(w)).as("sliding_avg"))
    }

  /** Positional zip of two streams (the reference's round-robin pairing,
    * README.md:129-160): i-th row of `a` joined with i-th row of `b`.
    * Requires explicit total orders on both sides. Global row_number ⇒
    * single-partition window: inherently sequential semantics, kept for
    * parity (SURVEY §7.5); do not put on the hot path.
    */
  def zipByIndex(a: DataFrame, aOrder: Seq[Column], b: DataFrame, bOrder: Seq[Column]): DataFrame = {
    val ra = a.withColumn("_rn", row_number().over(Window.orderBy(aOrder: _*)))
    val rb = b.withColumn("_rn", row_number().over(Window.orderBy(bOrder: _*)))
    ra.join(rb, "_rn").drop("_rn")
  }

  /** N-way positional zip (reference: the n-way round-robin pairing in
    * test/examples/simple_numbers_test.exs:107-165): i-th rows of all
    * frames joined into one row. Truncates to the shortest frame, like
    * the reference's pairing accumulator that only emits complete
    * tuples.
    */
  def zipByIndexN(frames: Seq[(DataFrame, Seq[Column])]): DataFrame = {
    require(frames.size >= 2, "zipByIndexN needs at least two frames")
    frames.map { case (df, order) =>
      df.withColumn("_rn", row_number().over(Window.orderBy(order: _*)))
    }.reduce((a, b) => a.join(b, "_rn")).drop("_rn")
  }

  /** As-of join: for each left row, the latest right row with
    * `rightTs <= leftTs` on the same key. Implemented as a tagged union
    * + one window pass — one shuffle on (key), no range-join explosion,
    * the scale-correct form of the classic point-in-time join.
    */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      rightValueCols: Seq[String]): DataFrame = {
    val lTagged = left.withColumn("_ts", col(leftTs)).withColumn("_side", lit(1))
    val rTagged = right
      .select((Seq(col(key), col(rightTs).as("_ts")) ++ rightValueCols.map(col)): _*)
      .withColumn("_side", lit(0))
    val leftCols = left.columns
    val unioned = lTagged.unionByName(rTagged, allowMissingColumns = true)
    val w = Window.partitionBy(col(key)).orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rightValueCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(c, last(when(col("_side") === 0, col(c)), ignoreNulls = true).over(w))
    }
    filled.where(col("_side") === 1).select((leftCols.toIndexedSeq ++ rightValueCols).map(col): _*)
  }

  /** Gap-based sessionization: events within `gapSeconds` of the
    * previous event (per key) share a session. lag + conditional cumsum
    * — one shuffle on the key.
    */
  def sessionize(
      df: DataFrame,
      keyCol: Column,
      tsCol: Column,
      gapSeconds: Long,
      tieBreak: Seq[Column] = Nil): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(tsCol +: tieBreak: _*)
    df.withColumn("_prev_ts", lag(tsCol, 1).over(w))
      .withColumn(
        "_new_session",
        when(col("_prev_ts").isNull ||
          tsCol.cast("long") - col("_prev_ts").cast("long") > gapSeconds, 1).otherwise(0))
      .withColumn("session_id", sum(col("_new_session")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("_prev_ts", "_new_session")
  }

  /** The parcels CEP state machine (reference:
    * test/examples/parcels_test.exs:106-252) as one declarative plan:
    * per order, did all expected shipments arrive within `slaDays` of
    * the order? The reference buffers events in per-order actor state;
    * here it is a shuffle-on-order-key aggregate — same answer, scales
    * linearly, and AQE handles skewed orders.
    *
    * Precedence matches the reference's decide/2
    * (reference: test/examples/parcels_test.exs:144-201): a shipment
    * past the deadline flips the order to THRESHOLD_EXCEEDED even while
    * other parcels are still pending, so the deadline condition is
    * evaluated BEFORE the completeness condition.
    */
  def shipmentSla(
      orders: DataFrame,
      shipments: DataFrame,
      orderKey: String,
      orderTs: String,
      expectedCol: String,
      shipTs: String,
      slaDays: Int): DataFrame = {
    val shipped = shipments.groupBy(col(orderKey))
      .agg(count(lit(1)).as("n_shipped"), max(col(shipTs)).as("last_ship"))
    orders
      .join(shipped, Seq(orderKey), "left")
      .withColumn(
        "status",
        when(
          col("last_ship") > col(orderTs) + expr(s"INTERVAL $slaDays DAYS"),
          lit("THRESHOLD_EXCEEDED"))
          .when(col("n_shipped").isNull || col("n_shipped") < col(expectedCol), lit("PENDING"))
          .otherwise(lit("ALL_PARCELS_SHIPPED")))
  }

  /** Binned range join: `point ∈ [lo, hi]` with no usable equi-key.
    * A naive plan is a broadcast-nested-loop (O(|L|·|R|)); binning
    * turns it into an equi-join on bin id — each interval explodes to
    * the bins it overlaps, each point maps to one bin, candidates are
    * verified with the exact predicate. With `binWidth` close to the
    * median interval length each interval lands in O(1) bins and the
    * join is O(|L| + |R| + matches), the standard interval-join layout.
    * Intervals must be non-negative (`hi >= lo`).
    */
  def binnedRangeJoin(
      intervals: DataFrame,
      loCol: String,
      hiCol: String,
      points: DataFrame,
      pointCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val iBinned = intervals.withColumn(
      "_bin",
      explode(sequence(
        floor(col(loCol) / binWidth).cast("long"),
        floor(col(hiCol) / binWidth).cast("long"))))
    val pBinned = points.withColumn("_bin", floor(col(pointCol) / binWidth).cast("long"))
    iBinned.join(pBinned, Seq("_bin"))
      .where(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("_bin")
  }

  /** Skew-resistant equi-join: the classic salting pattern for when one
    * join key carries a disproportionate share of rows and AQE's skew
    * splitting isn't available or sufficient. The skewed (left) side
    * gets a deterministic salt in [0, saltFactor) derived from a hash
    * of its full row; the right side is replicated once per salt value.
    * The join key becomes (key, salt), so the hot key's rows spread
    * over `saltFactor` reducers instead of one.
    *
    * Cost model: right side × saltFactor replication — use when the
    * left is skewed and the right is modest (but too big to broadcast).
    * Inner and left-outer semantics are preserved exactly (the right
    * is fully present under every salt).
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      saltFactor: Int,
      joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0, s"saltFactor must be positive, got $saltFactor")
    require(
      joinType == "inner" || joinType == "left" || joinType == "left_outer",
      s"saltedJoin supports inner/left joins, got $joinType")
    val lSalted = left.withColumn(
      "_salt", pmod(hash(left.columns.toIndexedSeq.map(col): _*), lit(saltFactor)))
    val rSalted = right.withColumn(
      "_salt", explode(sequence(lit(0), lit(saltFactor - 1))))
    lSalted.join(rSalted, on :+ "_salt", joinType).drop("_salt")
  }

  /** Top-k per group via rank window — the scalable form of per-group
    * sort+limit (partial TopK pushed below the shuffle by Spark's
    * WindowGroupLimit optimization).
    */
  def topKPerGroup(df: DataFrame, partitionBy: Seq[Column], orderBy: Seq[Column], k: Int): DataFrame = {
    val w = Window.partitionBy(partitionBy: _*).orderBy(orderBy: _*)
    df.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }
}
