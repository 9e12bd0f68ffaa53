package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One role-tagged interaction in the stream (the streaming twin of the
  * batch turn frame [[graft.operators.ChatSft.sessionTurns]] produces).
  */
final case class TurnEvent(
    event_id: Long, user_id: Long, ts: Timestamp, role: String, text: String)

/** A turn buffered inside an open conversation (event time in
  * microseconds — full Timestamp precision, see [[IntervalState]]).
  */
final case class ConvTurn(ts_us: Long, event_id: Long, role: String, text: String)

/** An open conversation interval: [start_us, last_us] plus its buffered
  * turns (bounded by session length — the gap bound — not history).
  */
final case class OpenConv(start_us: Long, last_us: Long, turns: Seq[ConvTurn])

/** Per-user state: the open-conversation interval list (the
  * [[OpenSessions]] shape, carrying turn payloads).
  */
final case class OpenConvs(convs: Seq[OpenConv])

/** A closed, fully-rendered conversation. */
final case class ClosedConv(
    user_id: Long, start_ts: Timestamp, end_ts: Timestamp,
    n_turns: Long, rendered: String)

/** Streaming SFT conversation assembly — the deployment shape of
  * [[graft.operators.ChatSft]]: conversations build up incrementally as
  * interaction events arrive and each emits EXACTLY ONCE, fully
  * rendered, when the watermark passes strictly beyond its gap deadline
  * ([[IntervalState]]'s interval-list contract, shared with
  * [[Streams.sessionsWithTimeout]], carrying turn payloads instead of
  * scalar aggregates). Non-late out-of-order turns still insert into
  * (or bridge) open conversations, so the rendered output equals the
  * batch `sessionTurns → renderConversations` composition on the same
  * events — at FULL microsecond precision (ChatAssemblySpec pins the
  * parity, including a sub-millisecond ordering case).
  *
  * State bound: each user's open conversations hold only turns newer
  * than (watermark − gap); the per-conversation buffer is bounded by
  * session length exactly like the batch render's collect_list.
  *
  * == File-source ordering contract (read this before pointing a
  * directory at `assemble`) ==
  * The file source consumes files in (modificationTime, path) order, NOT
  * path order. Part files written in parallel get arbitrary mtimes, so a
  * directory whose file names are sorted by event-time range can still
  * feed ranges out of order — the watermark races ahead on a newer range
  * and older ranges are then dropped as late, SILENTLY (a 10M-event
  * rehearsal lost 0.8M of 3.0M conversations to exactly this before the
  * producer stamped mtimes in range order). Guarantee mtime order matches
  * event-time order on the producer side. The detection side is on by
  * default: declaring the watermark here auto-installs the session's
  * [[WatermarkDropGuard]], so any `numRowsDroppedByWatermark` surfaces as
  * a loud ERROR log instead of as missing output (opt out with
  * `spark.graft.streaming.autoDropGuard=false`).
  */
object ChatAssembly {

  def assemble(
      events: Dataset[TurnEvent],
      gap: String = "30 minutes",
      delay: String = "10 minutes"): Dataset[ClosedConv] = {
    import events.sparkSession.implicits._
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(gap))
    require(iv.months == 0 && iv.days == 0, "conversation gap must be a sub-day interval")
    val gapUs = iv.microseconds
    // the chat template, textually in sync with
    // ChatSft.renderTurn / renderConversations(sep = "\n"); LOCAL defs
    // (like sessionsWithTimeout's) so the state closure captures no
    // object reference
    def render(turns: Seq[ConvTurn]): String =
      turns.sortBy(t => (t.ts_us, t.event_id))
        .map(t => s"<|${t.role}|>${t.text}").mkString("\n")
    def close(uid: Long, c: OpenConv): ClosedConv =
      ClosedConv(uid, IntervalState.usToTs(c.start_us),
        IntervalState.usToTs(c.last_us), c.turns.size.toLong, render(c.turns))
    Streams.wm(events, "ts", delay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenConvs, ClosedConv](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[TurnEvent], state: GroupState[OpenConvs]) =>
          val prior = state.getOption.map(_.convs).getOrElse(Seq.empty)
          val merged = rows.foldLeft(prior) { (cs, e) =>
            val t = ConvTurn(IntervalState.tsToUs(e.ts), e.event_id, e.role, e.text)
            IntervalState.insert(cs, OpenConv(t.ts_us, t.ts_us, Seq(t)), gapUs)(
              _.start_us, _.last_us,
              (p, c) => OpenConv(p.start_us, math.max(p.last_us, c.last_us),
                p.turns ++ c.turns))
          }
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val (done, open) =
            IntervalState.sweep(merged, wmUs, gapUs)(_.last_us)
          if (open.isEmpty) state.remove()
          else {
            state.update(OpenConvs(open))
            val tUs = IntervalState.timeoutUs(open, wmUs, gapUs)(_.last_us)
            state.setTimeoutTimestamp(
              math.max(Math.floorDiv(tUs, 1000L), state.getCurrentWatermarkMs() + 1))
          }
          done.map(close(uid, _)).iterator
      }
  }
}
