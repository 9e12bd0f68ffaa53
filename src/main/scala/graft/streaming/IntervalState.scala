package graft.streaming

import java.sql.Timestamp

/** The gap-interval state machinery shared by
  * [[Streams.sessionsWithTimeout]] and [[ChatAssembly.assemble]]
  * (round-10 review: both carried verbatim copies of the insert/merge
  * fold, the strict sweep, and the timeout clamp — subtle boundary
  * semantics that must never diverge). Generic over the state element:
  * callers supply `start`/`last` accessors and a payload `merge`.
  *
  * All times are MICROSECONDS (the engine's event-time parity unit —
  * millisecond truncation broke stream==batch parity for sub-ms
  * timestamps, the other round-10 review finding).
  *
  * Boundary contract (shared comments live here now):
  *   - insert-then-merge: a singleton [t, t] is inserted in (start, last)
  *     order and any adjacent pair within the gap merges — one insertion
  *     can bridge its two neighbors (session_window's merge semantics, so
  *     stream output == the batch oracle even for non-late OUT-OF-ORDER
  *     events across batches);
  *   - strict sweep: an interval is FINAL once the watermark passes
  *     STRICTLY beyond last + gap — an event at ts == watermark is still
  *     non-late, and at ts == last + gap it still merges (inclusive gap);
  *     closing at equality would emit a session a boundary event may yet
  *     extend;
  *   - timeout clamp: a deadline exactly AT the watermark is legal state
  *     (strict sweep) but an illegal timeout — clamp one past it.
  */
private[graft] object IntervalState extends Serializable {

  def insert[S](ss: Seq[S], item: S, gapUs: Long)(
      start: S => Long, last: S => Long, merge: (S, S) => S): Seq[S] = {
    val withNew = (ss :+ item).sortBy(s => (start(s), last(s)))
    withNew.foldLeft(Vector.empty[S]) { (acc, s) =>
      acc.lastOption match {
        case Some(p) if start(s) - last(p) <= gapUs => acc.init :+ merge(p, s)
        case _ => acc :+ s
      }
    }
  }

  /** (closed, still-open) under the strict sweep rule. */
  def sweep[S](ss: Seq[S], wmUs: Long, gapUs: Long)(last: S => Long)
      : (Seq[S], Seq[S]) =
    ss.partition(s => last(s) + gapUs < wmUs)

  /** Next event-time timeout for the open set (see the clamp rule).
    * Both the deadline and the returned value are MICROSECONDS; callers
    * convert to the milliseconds `GroupState.setTimeoutTimestamp` takes.
    */
  def timeoutUs[S](open: Seq[S], wmUs: Long, gapUs: Long)(last: S => Long): Long =
    math.max(open.map(last).min + gapUs, wmUs + 1)

  /** Timestamp → microseconds since the epoch (full sub-ms precision). */
  def tsToUs(t: Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  /** Microseconds since the epoch → Timestamp (exact round-trip). */
  def usToTs(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000L))
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }
}
