package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One role-tagged interaction in the stream (the streaming twin of the
  * batch turn frame [[graft.operators.ChatSft.sessionTurns]] produces).
  */
final case class TurnEvent(
    event_id: Long, user_id: Long, ts: Timestamp, role: String, text: String)

/** A turn buffered inside an open conversation. */
final case class ConvTurn(ts_ms: Long, event_id: Long, role: String, text: String)

/** An open conversation interval: [start_ms, last_ms] plus its buffered
  * turns (bounded by session length — the gap bound — not history).
  */
final case class OpenConv(start_ms: Long, last_ms: Long, turns: Seq[ConvTurn])

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
  * ([[Streams.sessionsWithTimeout]]'s interval-list contract, carrying
  * turn payloads instead of scalar aggregates). Non-late out-of-order
  * turns still insert into (or bridge) open conversations, so the
  * rendered output equals the batch
  * `sessionTurns → renderConversations` composition on the same events —
  * ChatAssemblySpec pins the parity.
  *
  * State bound: each user's open conversations hold only turns newer
  * than (watermark − gap); the per-conversation buffer is bounded by
  * session length exactly like the batch render's collect_list.
  */
object ChatAssembly {

  def assemble(
      events: Dataset[TurnEvent],
      gap: String = "30 minutes",
      delay: String = "10 minutes"): Dataset[ClosedConv] = {
    import events.sparkSession.implicits._
    // the chat template, textually in sync with
    // ChatSft.renderTurn / renderConversations(sep = "\n"); a LOCAL def
    // (like sessionsWithTimeout's helpers) so the state closure captures
    // no object reference
    def render(turns: Seq[ConvTurn]): String =
      turns.sortBy(t => (t.ts_ms, t.event_id))
        .map(t => s"<|${t.role}|>${t.text}").mkString("\n")
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(gap))
    require(iv.months == 0 && iv.days == 0, "conversation gap must be a sub-day interval")
    val gapMillis = iv.microseconds / 1000L
    def close(uid: Long, c: OpenConv): ClosedConv =
      ClosedConv(uid, new Timestamp(c.start_ms), new Timestamp(c.last_ms),
        c.turns.size.toLong, render(c.turns))
    // insert a singleton conversation, then merge any adjacent pair
    // within the gap (one insertion can bridge two open conversations —
    // the session_window merge semantics)
    def insert(cs: Seq[OpenConv], t: ConvTurn): Seq[OpenConv] = {
      val withNew = (cs :+ OpenConv(t.ts_ms, t.ts_ms, Seq(t)))
        .sortBy(c => (c.start_ms, c.last_ms))
      withNew.foldLeft(Vector.empty[OpenConv]) { (acc, c) =>
        acc.lastOption match {
          case Some(p) if c.start_ms - p.last_ms <= gapMillis =>
            acc.init :+ OpenConv(p.start_ms, math.max(p.last_ms, c.last_ms),
              p.turns ++ c.turns)
          case _ => acc :+ c
        }
      }
    }
    def sweep(uid: Long, cs: Seq[OpenConv], wm: Long)
        : (Seq[ClosedConv], Seq[OpenConv]) = {
      val (done, open) = cs.partition(_.last_ms + gapMillis < wm)
      (done.map(close(uid, _)), open)
    }
    events.withWatermark("ts", delay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenConvs, ClosedConv](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[TurnEvent], state: GroupState[OpenConvs]) =>
          val prior = state.getOption.map(_.convs).getOrElse(Seq.empty)
          val merged = rows.foldLeft(prior) { (cs, e) =>
            insert(cs, ConvTurn(e.ts.getTime, e.event_id, e.role, e.text))
          }
          val wm = state.getCurrentWatermarkMs()
          val (emitted, open) = sweep(uid, merged, wm)
          if (open.isEmpty) state.remove()
          else {
            state.update(OpenConvs(open))
            state.setTimeoutTimestamp(
              math.max(open.map(_.last_ms).min + gapMillis, wm + 1))
          }
          emitted.iterator
      }
  }
}
