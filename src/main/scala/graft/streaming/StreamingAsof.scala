package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming as-of join — the incremental mirror of the batch
  * `Events.asofJoin` backward direction (one keyed window pass there;
  * per-key last-value carry in the state store here).
  *
  * Model: ONE union stream of tagged events per key — tag 0 = right
  * rows (the quote/reference side whose latest value is carried), tag
  * 1 = left rows (the probe side that gets matched). This is the same
  * union-then-order shape the batch plan uses, made incremental: the
  * state store holds exactly the "last right row seen" per key, which
  * is the whole backward as-of invariant.
  *
  * Semantics parity with the batch operator:
  *  - a left row matches the latest right row with rightTs <= leftTs;
  *  - at EQUAL ts the right row is visible to the left row (tag sorts
  *    0 before 1, as the batch window orders (ts, tag) ascending);
  *  - a left row before any right row emits no match (None fields).
  *
  * Ordering contract (same as [[StreamingScan]]): events arrive in
  * non-decreasing ts order per key ACROSS micro-batches; within a
  * batch they are sorted here. State carries forward — it cannot
  * reorder the past.
  *
  * Scale notes: state is one (ts, value) pair per key — O(#keys)
  * fixed-width, partitioned by key like any streaming agg. Use
  * watermark-based timeouts upstream if the key space is unbounded.
  */
object StreamingAsof {

  /** Union-stream element: tag 0 = right (carried side), 1 = left. */
  case class AsofEvent(key: Long, ts: Long, tag: Int, value: Double)

  /** A left row + its as-of match (None = no right row yet). */
  case class AsofMatch(key: Long, ts: Long, value: Double,
                       matchTs: Option[Long], matchValue: Option[Double])

  /** Per-key carry: the last right row seen. Flat primitives — the
    * state-store serializer rejects Option-typed fields. */
  case class LastRight(ts: Long, value: Double, has: Boolean)

  /** Backward as-of over the tagged union stream. Append-mode output:
    * one row per LEFT event; right events only update state. */
  def asofBackward(events: Dataset[AsofEvent]): Dataset[AsofMatch] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: Long, batch: Iterator[AsofEvent], state: GroupState[LastRight]) => {
          var carry = state.getOption.getOrElse(LastRight(0L, 0.0, has = false))
          // sorts ONE key's slice of ONE micro-batch by (ts, tag) —
          // right-before-left at equal ts, exactly the batch window
          // order; memory bounded by micro-batch size per key
          val out = batch.toSeq.sortBy(e => (e.ts, e.tag)).flatMap { e =>
            if (e.tag == 0) {
              carry = LastRight(e.ts, e.value, has = true)
              None
            } else Some(AsofMatch(key, e.ts, e.value,
              if (carry.has) Some(carry.ts) else None,
              if (carry.has) Some(carry.value) else None))
          }
          state.update(carry)
          out.iterator
        })(Encoders.product[LastRight], Encoders.product[AsofMatch])
  }
}
