package graft

import graft.operators.ChatSft
import org.apache.spark.sql.functions._

/** [[ChatSft]] (q155–q157): the span/render contract the oracle checks
  * only statistically is pinned exactly here — every loss-mask span,
  * substringed out of the rendered conversation, must reproduce the
  * rendered assistant turn byte-for-byte; session boundaries follow the
  * gap rule; the role map falls back to "user".
  */
class ChatSftSpec extends SparkSpec {

  private val gap = 1000L // microseconds, test-sized

  private def ev(rows: (Long, Long, Long, String, String)*) = {
    import spark.implicits._
    rows.toDF("user_id", "event_id", "ts_us", "event_type", "turn_text")
  }

  private def turnsOf(df: org.apache.spark.sql.DataFrame) =
    ChatSft.sessionTurns(
      df.withColumn("role", ChatSft.roleOf(col("event_type"))),
      "user_id", "ts_us", "event_id", gap)

  test("sessionization splits on gap and indexes turns per session") {
    val t = turnsOf(ev(
      (1L, 0L, 0L, "view", "a"), (1L, 1L, 500L, "click", "b"),
      (1L, 2L, 5000L, "view", "c"), // gap > 1000 -> new session
      (2L, 3L, 0L, "signup", "d")))
      .select("user_id", "session_id", "turn_idx", "event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3))).toSet
    assert(t === Set((1L, 1L, 1, 0L), (1L, 1L, 2, 1L), (1L, 2L, 1, 2L), (2L, 1L, 1, 3L)))
  }

  test("roleOf maps the taxonomy and falls back to user") {
    import spark.implicits._
    val r = Seq("view", "click", "purchase", "signup", "error", "mystery")
      .toDF("event_type")
      .select(col("event_type"), ChatSft.roleOf(col("event_type")).as("role"))
      .collect().map(x => x.getString(0) -> x.getString(1)).toMap
    assert(r === Map("view" -> "user", "click" -> "assistant",
      "purchase" -> "assistant", "signup" -> "system", "error" -> "user",
      "mystery" -> "user"))
  }

  test("property: spans are disjoint, in-bounds, and substring back to their turns on a random corpus") {
    // 60 users x random turn streams (multi-byte + empty + spacey texts,
    // random gaps that split sessions): every assistant span must cut the
    // rendered string back to exactly its turn, spans within one
    // conversation must be disjoint and in-bounds.
    val rng = new scala.util.Random(7L)
    val vocab = Array("alpha", "b b", "", "çé µ", "x", "tab\tok")
    val types = Array("view", "click", "purchase", "signup", "error")
    val rows = (0 until 60).flatMap { u =>
      var t = 0L
      (0 until 1 + rng.nextInt(9)).map { i =>
        t += 100L + rng.nextInt(3) * 1500L // some gaps split (gap=1000)
        (u.toLong, (u * 100 + i).toLong, t, types(rng.nextInt(types.length)),
          vocab(rng.nextInt(vocab.length)))
      }
    }
    val df = {
      import spark.implicits._
      rows.toDF("user_id", "event_id", "ts_us", "event_type", "turn_text")
    }
    val t = turnsOf(df).localCheckpoint(true)
    val rendered = ChatSft.renderConversations(t, "user_id", "role", "turn_text")
    val spans = ChatSft.lossMaskSpans(t, "user_id", "role", "turn_text")
    val joined = spans.join(rendered, Seq("user_id", "session_id"))
      .select(col("user_id"), col("session_id"), col("turn_idx"),
        col("span_start"), col("span_end"), length(col("rendered")).as("rlen"),
        expr("substr(rendered, cast(span_start as int), " +
          "cast(span_end - span_start + 1 as int))").as("cut"))
      .collect()
    assert(joined.nonEmpty)
    // substring contract + bounds
    val turnsByKey = t.select(col("user_id"), col("session_id"), col("turn_idx"),
        ChatSft.renderTurn(col("role"), col("turn_text")).as("turn"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)) -> r.getString(3)).toMap
    joined.foreach { r =>
      val key = (r.getLong(0), r.getLong(1), r.getInt(2))
      assert(r.getAs[String]("cut") === turnsByKey(key), key)
      assert(r.getLong(3) >= 1 && r.getLong(4) <= r.getInt(5), key)
    }
    // disjointness per conversation
    joined.groupBy(r => (r.getLong(0), r.getLong(1))).foreach { case (k, rs) =>
      val sorted = rs.sortBy(_.getLong(3))
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a.getLong(4) < b.getLong(3), k)
        case _ => ()
      }
    }
  }

  test("every loss-mask span substrings the rendered string back to its turn") {
    // mixed-length turns incl. one with spaces and one empty text
    val t = turnsOf(ev(
      (1L, 0L, 0L, "view", "hello there"), (1L, 1L, 10L, "click", "re ply one"),
      (1L, 2L, 20L, "error", ""), (1L, 3L, 30L, "purchase", "buy"),
      (2L, 4L, 0L, "click", "solo"))).localCheckpoint(true)
    val rendered = ChatSft.renderConversations(t, "user_id", "role", "turn_text")
    val spans = ChatSft.lossMaskSpans(t, "user_id", "role", "turn_text")
    val joined = spans.join(rendered, Seq("user_id", "session_id"))
      .select(col("user_id"), col("turn_idx"),
        expr("substr(rendered, cast(span_start as int), cast(span_end - span_start + 1 as int))").as("cut"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getString(2)).toMap
    assert(joined === Map(
      (1L, 2) -> "<|assistant|>re ply one",
      (1L, 4) -> "<|assistant|>buy",
      (2L, 1) -> "<|assistant|>solo"))
    // and the rendered conversation carries every turn in order
    val full = rendered.filter(col("user_id") === 1L).collect().head
      .getAs[String]("rendered")
    assert(full ===
      "<|user|>hello there\n<|assistant|>re ply one\n<|user|>\n<|assistant|>buy")
  }
}
