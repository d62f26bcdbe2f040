package graft

import graft.ops.Chat
import org.apache.spark.sql.functions._

/** Pins the SFT/chat-data operators (round 16): the alternation
  * CONTRACT (optional single system head, then non-empty strict
  * user/assistant alternation starting at user and ending at
  * assistant), per-role masses, the empty-conversation domain, and
  * the exact rendered training string.
  */
class ChatSpec extends SparkSpec {
  import spark.implicits._

  private def conv(turns: (String, String)*): String =
    turns.map { case (r, c) => s"""{"role":"$r","content":"$c"}""" }
      .mkString("[", ",", "]")

  private val fixtures = Seq(
    // 1: canonical valid with system head
    (1L, conv("system" -> "be concise", "user" -> "hi there",
      "assistant" -> "hello")),
    // 2: valid without system
    (2L, conv("user" -> "a b", "assistant" -> "c")),
    // 3: ODD body -> invalid (ends on user)
    (3L, conv("user" -> "q1", "assistant" -> "a1", "user" -> "q2")),
    // 4: starts with assistant -> invalid
    (4L, conv("assistant" -> "a", "user" -> "q")),
    // 5: double-user break -> invalid
    (5L, conv("user" -> "q1", "user" -> "q2", "assistant" -> "a")),
    // 6: system ONLY -> empty body -> invalid
    (6L, conv("system" -> "s")),
    // 7: empty array -> outside the op's domain (absent)
    (7L, "[]"))

  private val df = fixtures.toDF("doc_id", "conv")

  test("chatTurnStats: alternation contract, role masses, empty-conv domain") {
    val m = Chat.chatTurnStats(df, "doc_id", "conv")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4),
          r.getBoolean(5), r.getLong(6), r.getLong(7))).toMap
    assert(m.keySet === Set(1L, 2L, 3L, 4L, 5L, 6L),
      "the empty conversation must be absent")
    assert(m(1L) === ((3L, 1L, 1L, true, true, 8L, 5L)))
    assert(m(2L) === ((2L, 1L, 1L, false, true, 3L, 1L)))
    assert(m(3L)._5 === false, "odd body must be invalid")
    assert(m(4L)._5 === false, "assistant-first must be invalid")
    assert(m(5L)._5 === false, "double-user must be invalid")
    assert(m(6L) === ((1L, 0L, 0L, true, false, 0L, 0L)),
      "system-only: empty body is invalid but the row stays in-domain")
  }

  test("chatAssistantSpans: offsets slice the rendered string to exactly the assistant content") {
    val rendered = Chat.chatRender(df, "doc_id", "conv")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val spans = Chat.chatAssistantSpans(df, "doc_id", "conv")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // every span substring must be the turn's content, in order
    val expect = Map(
      1L -> Seq("hello"), 2L -> Seq("c"), 3L -> Seq("a1"),
      4L -> Seq("a"), 5L -> Seq("a"))
    expect.foreach { case (id, contents) =>
      val got = spans.filter(_._1 == id).sortBy(_._2)
        .map { case (_, _, s, e) => rendered(id).substring(s.toInt, e.toInt) }
      assert(got === contents, s"doc $id")
    }
    assert(!spans.exists(_._1 == 6L), "system-only conv has no assistant spans")
    // exact offsets for the canonical doc: <|system|>be concise = 20,
    // <|user|>hi there = 16 -> 36, <|assistant|> = 13 -> content [49, 54)
    assert(spans.filter(_._1 == 1L) === Array((1L, 0L, 49L, 54L)))
  }

  test("chatReport: integer-milli fractions over the planted contract outcomes") {
    // strata: docs 1-3 -> 'a' (valid, valid, invalid), 4-6 -> 'b'
    // (invalid x3); doc 7 (empty array) is out of domain everywhere
    val strat = df.withColumn("src",
      when($"doc_id" <= 3, "a").otherwise("b"))
    val m = Chat.chatReport(strat, "doc_id", "conv", "src")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(m("a") === ((3L, 2L, 666L, 2666L)),
      "a: 2/3 valid = 666 milli; (3+2+3)/3 turns = 2666 milli")
    assert(m("b") === ((3L, 0L, 0L, 2000L)),
      "b: 0/3 valid; (2+3+1)/3 turns = 2000 milli")
  }

  test("chatRender: exact training string + counts") {
    val m = Chat.chatRender(df, "doc_id", "conv")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(m(1L)._1 ===
      "<|system|>be concise<|user|>hi there<|assistant|>hello<|end|>")
    assert(m(1L)._2 === m(1L)._1.length.toLong)
    assert(m(2L)._1 === "<|user|>a b<|assistant|>c<|end|>")
    assert(!m.contains(7L), "the empty conversation must be absent")
  }
}
