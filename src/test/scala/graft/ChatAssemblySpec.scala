package graft

import java.sql.Timestamp

import graft.operators.ChatSft
import graft.streaming.{ChatAssembly, ClosedConv, TurnEvent}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** [[ChatAssembly]]: streamed conversation assembly must render the SAME
  * strings as the batch `sessionTurns → renderConversations` composition
  * — including out-of-order turns that arrive in a later micro-batch and
  * land in the MIDDLE of an open conversation.
  */
class ChatAssemblySpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int): Timestamp = new Timestamp((min + 1440) * 60000L)

  test("streamed conversations render identically to the batch composition") {
    implicit val sqlCtx = spark.sqlContext
    val all = Seq(
      // user 1, one conversation — the t=6 turn arrives LATE (batch 2)
      // and must slot between its neighbors in the rendered string
      TurnEvent(1, 1, ts(0), "user", "hello"),
      TurnEvent(2, 1, ts(12), "assistant", "reply two"),
      TurnEvent(3, 1, ts(6), "assistant", "reply one"),
      // user 1, second conversation past the 30-min gap
      TurnEvent(4, 1, ts(90), "user", "again"),
      // user 2, single-turn conversation
      TurnEvent(5, 2, ts(3), "system", "welcome"))
    val input = MemoryStream[TurnEvent]
    val q = ChatAssembly.assemble(input.toDS(), "30 minutes", "60 minutes")
      .writeStream.format("memory").queryName("t_chat_asm")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(Seq(all(0), all(1), all(4)))
      q.processAllAvailable()
      input.addData(Seq(all(2), all(3))) // late-but-valid + new conversation
      q.processAllAvailable()
      // flush: watermark far past every deadline (sentinel user stays open)
      input.addData(Seq(TurnEvent(9, 9, ts(600), "user", "x")))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("t_chat_asm").as[ClosedConv].collect()
      .map(c => (c.user_id, c.n_turns, c.rendered)).toSet
    assert(streamed === Set(
      (1L, 3L, "<|user|>hello\n<|assistant|>reply one\n<|assistant|>reply two"),
      (1L, 1L, "<|user|>again"),
      (2L, 1L, "<|system|>welcome")), streamed)

    // batch composition over the same closed events (full microsecond
    // precision — getTime*1000 would truncate sub-ms timestamps)
    val closed = all.map(e =>
      (e.user_id, e.event_id, graft.streaming.IntervalState.tsToUs(e.ts),
        e.role, e.text))
      .toDF("user_id", "event_id", "ts_us", "role", "turn_text")
    val batch = ChatSft.renderConversations(
        ChatSft.sessionTurns(closed, "user_id", "ts_us", "event_id",
          1800000000L),
        "user_id", "role", "turn_text")
      .select(col("user_id"), col("n_turns"), col("rendered"))
      .as[(Long, Long, String)].collect().toSet
    assert(streamed === batch, s"stream=$streamed batch=$batch")
  }

  test("sub-millisecond timestamps order identically in stream and batch") {
    // two turns 250us apart inside ONE millisecond, event ids in the
    // OPPOSITE order — ms truncation would sort by event_id and render
    // them backwards (the round-10 review finding)
    implicit val sqlCtx = spark.sqlContext
    def tsUs(min: Int, us: Int): Timestamp =
      graft.streaming.IntervalState.usToTs((min + 1440) * 60000000L + us)
    val evs = Seq(
      TurnEvent(7, 1, tsUs(0, 250), "user", "first"),
      TurnEvent(5, 1, tsUs(0, 500), "assistant", "second"))
    val input = MemoryStream[TurnEvent]
    val q = ChatAssembly.assemble(input.toDS(), "30 minutes", "10 minutes")
      .writeStream.format("memory").queryName("t_chat_subms")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(evs)
      q.processAllAvailable()
      input.addData(Seq(TurnEvent(9, 9, tsUs(600, 0), "user", "x")))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("t_chat_subms").as[ClosedConv].collect()
      .map(c => (c.user_id, c.rendered)).toSet
    assert(streamed === Set((1L, "<|user|>first\n<|assistant|>second")), streamed)
    val batch = ChatSft.renderConversations(
        ChatSft.sessionTurns(
          evs.map(e => (e.user_id, e.event_id,
            graft.streaming.IntervalState.tsToUs(e.ts), e.role, e.text))
            .toDF("user_id", "event_id", "ts_us", "role", "turn_text"),
          "user_id", "ts_us", "event_id", 1800000000L),
        "user_id", "role", "turn_text")
      .select(col("user_id"), col("rendered"))
      .as[(Long, String)].collect().toSet
    assert(streamed === batch)
  }
}
