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
    // columns: n_turns, n_user, n_assistant, n_tool, has_system, valid,
    // valid_ext, user_chars, assistant_chars
    val m = Chat.chatTurnStats(df, "doc_id", "conv")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getBoolean(5), r.getBoolean(6), r.getBoolean(7),
          r.getLong(8), r.getLong(9))).toMap
    assert(m.keySet === Set(1L, 2L, 3L, 4L, 5L, 6L),
      "the empty conversation must be absent")
    assert(m(1L) === ((3L, 1L, 1L, 0L, true, true, true, 8L, 5L)))
    assert(m(2L) === ((2L, 1L, 1L, 0L, false, true, true, 3L, 1L)))
    assert(m(3L)._6 === false, "odd body must be invalid")
    assert(m(4L)._6 === false, "assistant-first must be invalid")
    assert(m(5L)._6 === false, "double-user must be invalid")
    assert(m(6L) === ((1L, 0L, 0L, 0L, true, false, false, 0L, 0L)),
      "system-only: empty body is invalid but the row stays in-domain")
  }

  test("valid_ext: the tool-admitting grammar, branch by branch; strict valid is its tool-free fragment") {
    val tools = Seq(
      // (id, body roles, expect_strict, expect_ext)
      (10L, Seq("user", "assistant"), true, true),
      (11L, Seq("user", "assistant", "tool", "assistant"), false, true),
      (12L, Seq("user", "assistant", "tool", "tool", "assistant"), false, true),
      (13L, Seq("user", "tool", "assistant"), false, false), // tool after user
      (14L, Seq("user", "assistant", "tool"), false, false), // ends on tool
      (15L, Seq("tool", "assistant"), false, false), // starts on tool
      (16L, Seq("user", "assistant", "user", "assistant"), true, true),
      (17L, Seq("user", "judge", "assistant"), false, false), // unknown role
      (18L, Seq("user"), false, false), // single-turn body
      (19L, Seq("user", "assistant", "assistant"), false, false)) // double-assistant
    val tdf = tools.map { case (id, roles, _, _) =>
      (id, conv(("system" -> "s") +: roles.map(r => r -> "x"): _*))
    }.toDF("doc_id", "conv")
    val m = Chat.chatTurnStats(tdf, "doc_id", "conv")
      .select($"doc_id", $"valid", $"valid_ext", $"n_tool")
      .collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getBoolean(2), r.getLong(3))).toMap
    tools.foreach { case (id, roles, strict, ext) =>
      assert(m(id)._1 === strict, s"doc $id strict (${roles.mkString(",")})")
      assert(m(id)._2 === ext, s"doc $id ext (${roles.mkString(",")})")
      assert(m(id)._3 === roles.count(_ == "tool").toLong, s"doc $id n_tool")
      assert(!m(id)._1 || m(id)._2, s"doc $id: valid must imply valid_ext")
    }
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

  test("chatMaskTokens: decoding the token slice reproduces the turn content minus spaces") {
    // the trainer-consumable pin: for every span, the concatenation of
    // graft_bpe_tokens(rendered)[start_token, end_token) must equal the
    // assistant content stripped of spaces (spaces carry no tokens in
    // the BPE denomination; U+0001 is stripped — the documented
    // boundary convention), across multi-turn, multi-word, and
    // empty-content shapes
    val mdf = Seq(
      (1L, conv("system" -> "be concise", "user" -> "hi there",
        "assistant" -> "hello there friend")),
      (2L, conv("user" -> "a b", "assistant" -> "the thing",
        "user" -> "more", "assistant" -> "and another answer")),
      (3L, conv("user" -> "q", "assistant" -> "")), // empty content
      (4L, conv("user" -> "q", "assistant" -> "   ")), // all-space content
      (5L, conv("system" -> "s", "user" -> "u"))) // no assistant turn
      .toDF("doc_id", "conv")
    val toks = Chat.chatRender(mdf, "doc_id", "conv")
      .select($"doc_id", expr("graft_bpe_tokens(rendered)").as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val spans = Chat.chatMaskTokens(mdf, "doc_id", "conv")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expect = Map(
      1L -> Seq("hellotherefriend"),
      2L -> Seq("thething", "andanotheranswer"),
      3L -> Seq(""), 4L -> Seq(""))
    expect.foreach { case (id, contents) =>
      val got = spans.filter(_._1 == id).sortBy(_._2).map { case (_, _, s, e) =>
        toks(id).slice(s.toInt, e.toInt).mkString("")
      }
      assert(got === contents, s"doc $id")
    }
    assert(!spans.exists(_._1 == 5L), "no assistant turn -> no token span")
    // char/token span COUNTS agree turn-for-turn with chatAssistantSpans
    val charSpans = Chat.chatAssistantSpans(mdf, "doc_id", "conv")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(spans.map(s => (s._1, s._2)).sorted.toSeq === charSpans.sorted.toSeq)
  }

  test("chatPackMasked: packed-sequence mask positions decode to the assistant contents") {
    // THE trainer-batch property: build each packed sequence's token
    // stream by concatenating its documents' BPE token sequences in id
    // order, then every (start_token, end_token) span must decode to
    // that assistant turn's content minus spaces — across sequence
    // boundaries, multi-doc sequences, and multi-span docs
    val mdf = Seq(
      (1L, "s1", conv("user" -> "aa bb", "assistant" -> "the answer")),
      (2L, "s1", conv("user" -> "cc", "assistant" -> "another thing",
        "user" -> "dd", "assistant" -> "more")),
      (3L, "s1", conv("user" -> "ee", "assistant" -> "final words")),
      (4L, "s2", conv("system" -> "be brief", "user" -> "ff",
        "assistant" -> "other stratum")))
      .toDF("doc_id", "source", "conv")
    // budget 20 BPE tokens, 1 shard -> stratum s1 packs into multiple
    // sequences with at least one multi-doc sequence
    val masks = Chat.chatPackMasked(mdf, "doc_id", "conv", "source",
      budget = 20, shards = 1)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(masks.map(_._4).distinct.length > 1, "fixture must span multiple sequences")
    val toks = Chat.chatRender(mdf, "doc_id", "conv")
      .select($"doc_id", expr("graft_bpe_tokens(rendered)").as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val packed = graft.ops.Sampling.packSequencesSharded(
      Chat.chatRender(mdf, "doc_id", "conv")
        .join(mdf.select($"doc_id", $"source"), Seq("doc_id")),
      "doc_id", "rendered", "source", budget = 20, shards = 1,
      t => s"graft_bpe_count($t)")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(4)))
    // sequence token streams: docs in id order within (strata, shard, seq)
    val seqStream = packed.groupBy(p => (p._2, p._3, p._4)).map { case (k, ds) =>
      k -> ds.sortBy(_._1).flatMap(d => toks(d._1))
    }
    val expect = Map(
      (1L, 0L) -> "theanswer", (2L, 0L) -> "anotherthing", (2L, 1L) -> "more",
      (3L, 0L) -> "finalwords", (4L, 0L) -> "otherstratum")
    masks.foreach { case (id, st, sh, seq, spanIdx, s, e) =>
      val stream = seqStream((st, sh, seq))
      val got = stream.slice(s.toInt, e.toInt).mkString("")
      assert(got === expect((id, spanIdx)), s"doc $id span $spanIdx")
    }
    assert(masks.length === expect.size, "one mask row per assistant turn")
  }

  test("chatQuarantine: every contract rung lands in its reason; clean rows flow") {
    val qdf = Seq(
      (1L, conv("user" -> "q", "assistant" -> "a")), // ok
      (2L, null.asInstanceOf[String]), // null_conv
      (3L, """[{"role":"user","content":"q""""), // truncated -> malformed
      (4L, "[]"), // empty
      (5L, """[{"role":"user"},{"role":"assistant","content":"a"}]"""), // missing content
      (6L, """[{"role":null,"content":"q"}]"""), // JSON-null role
      (7L, """{"role":"user","content":"q"}"""), // top-level object
      (8L, "not json at all"), // garbage
      (9L, "  [{\"role\":\"user\",\"content\":\"q\"}]"), // leading spaces, ok
      (10L, """["loose text", 7]"""), // non-object elements -> malformed
      (11L, """[{"role":"user","content":"q"},"x"]""")) // one bad element poisons the parse
      .toDF("doc_id", "conv")
    val m = Chat.chatQuarantine(qdf, "doc_id", "conv")
      .collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getString(2))).toMap
    assert(m(1L) === ((true, "ok")))
    assert(m(2L) === ((false, "null_conv")))
    assert(m(3L) === ((false, "malformed")))
    assert(m(4L) === ((false, "empty")))
    assert(m(5L) === ((false, "null_field")))
    assert(m(6L) === ((false, "null_field")))
    assert(m(7L) === ((false, "malformed")))
    assert(m(8L) === ((false, "malformed")))
    assert(m(9L) === ((true, "ok")), "ltrim admits leading whitespace")
    assert(m(10L) === ((false, "malformed")),
      "non-object elements null the whole Spark parse")
    assert(m(11L) === ((false, "malformed")),
      "one bad element poisons the parse — malformed, not null_field")
    assert(m.size === qdf.count().toInt, "quarantine never drops a row")
  }

  test("chatTruncate: head always kept, longest fitting body suffix, exact render") {
    // per-turn cost = graft_token_count('<|role|>content'): the 4
    // delimiters + role = 5 tokens, content words 1 each
    val tdf = Seq(
      // 4-turn body, each turn cost 7 (5 + 2 words); head cost 7
      (1L, conv("system" -> "be concise", "user" -> "q one",
        "assistant" -> "a one", "user" -> "q two", "assistant" -> "a two")),
      // no system head: costs 6, 6
      (2L, conv("user" -> "x", "assistant" -> "y")),
      // system only: empty body
      (3L, conv("system" -> "s")),
      (4L, "[]")) // outside the domain -> absent
      .toDF("doc_id", "conv")

    def run(budget: Int) = Chat.chatTruncate(tdf, "doc_id", "conv", budget)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap

    val b14 = run(14)
    assert(b14.keySet === Set(1L, 2L, 3L), "the empty conversation is absent")
    assert(b14(1L) === ((3L, 2L, 21L,
      "<|system|>be concise<|user|>q two<|assistant|>a two<|end|>")),
      "budget 14 keeps the last two 7-token turns (suffix of 3 costs 21)")
    assert(b14(2L) === ((2L, 0L, 12L, "<|user|>x<|assistant|>y<|end|>")),
      "a body that already fits passes untouched")
    assert(b14(3L) === ((1L, 0L, 6L, "<|system|>s<|end|>")),
      "system-only: head kept, zero body turns")

    val b100 = run(100)
    assert(b100(1L) === ((5L, 0L, 35L,
      "<|system|>be concise<|user|>q one<|assistant|>a one" +
        "<|user|>q two<|assistant|>a two<|end|>")))

    val b5 = run(5)
    assert(b5(1L) === ((1L, 4L, 7L, "<|system|>be concise<|end|>")),
      "a budget below any single turn keeps head + terminator only")
    assert(b5(2L) === ((0L, 2L, 0L, "<|end|>")),
      "no head, nothing fits: zero turns, bare terminator")
  }

  test("assistantTurns: assistant content at 1-based turn positions, others filtered") {
    val tdf = Seq(
      (1L, conv("system" -> "s", "user" -> "q1", "assistant" -> "a1",
        "user" -> "q2", "assistant" -> "a2")),
      (2L, conv("user" -> "only user")),
      (3L, "[]"))
      .toDF("doc_id", "conv")
    val out = Chat.assistantTurns(tdf, "doc_id", "conv")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
    assert(out === Map((1L, 3L) -> "a1", (1L, 5L) -> "a2"),
      "turn_idx is the 1-based position in the FULL conversation")
  }

  test("chatTruncate in the BPE lens: renders never exceed the packed budget in BPE tokens") {
    // The round-17 finding: truncation budgeted word-ish tokens while
    // chatPackMasked budgets BPE — a "fitting" conversation could still
    // overflow the packed sequence. With cost = graft_bpe_count the
    // chain shares one denomination, and per-turn costs are ADDITIVE
    // (no committed merge crosses a non-alphanumeric turn junction), so
    // the whole-render BPE count is exactly tokens_kept + the
    // terminator's cost — merge-heavy content ('the', 'ing', 'and',
    // 'ion') exercises the merge table across turn boundaries.
    val tdf = Seq(
      (1L, conv("system" -> "the thing and the nation",
        "user" -> "quest ion ing the stand", "assistant" -> "band on the run",
        "user" -> "another round here", "assistant" -> "the ending notion")),
      (2L, conv("user" -> "in the beginning", "assistant" -> "and then")),
      (3L, conv("user" -> ("the quick brown fox " * 10).trim,
        "assistant" -> "short")))
      .toDF("doc_id", "conv")
    val budget = 40
    val out = graft.functions.VectorFunctions.attach(
      Chat.chatTruncate(tdf, "doc_id", "conv", budget,
        cost = graft.ops.Bpe.sparkTokenCountExpr))
      .withColumn("__rbpe", expr("graft_bpe_count(rendered)"))
      .withColumn("__head", expr(
        "IF(rendered LIKE '<|system|>%', " +
          "graft_bpe_count(substring(rendered, 1, " +
          "  coalesce(nullif(instr(substring(rendered, 11), '<|'), 0) + 9, " +
          "           length(rendered)))), cast(0 AS BIGINT))"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("tokens_kept"), r.getAs[Long]("__rbpe"),
          r.getAs[Long]("__head"), r.getAs[Long]("n_dropped"))).toMap
    val endCost = spark.sql(
      "SELECT graft_bpe_count('<|end|>')").head.getLong(0)
    out.foreach { case (id, (kept, rbpe, head, _)) =>
      assert(rbpe === kept + endCost,
        s"doc $id: per-turn BPE costs must be additive over the render")
      assert(kept - head <= budget,
        s"doc $id: kept body must fit the BPE budget")
    }
    assert(out(1L)._4 > 0L, "the merge-heavy 5-turn body actually truncates")
    assert(out(3L)._4 > 0L, "the long-content turn is dropped, not kept over-budget")
  }

  test("refusalReport: stem matching is case-insensitive, prefix-windowed, apostrophe-safe") {
    def conv(turns: (String, String)*): String =
      turns.map { case (r, c) => s"""{"role":"$r","content":"$c"}""" }
        .mkString("[", ",", "]")
    val pad = "x" * 200
    val df = Seq(
      // conv 1: 2 assistant turns, first refuses (uppercase + apostrophe)
      (1L, conv("user" -> "hi", "assistant" -> "I CAN'T do that.",
        "user" -> "ok", "assistant" -> "here is help")),
      // conv 2: refusal stem QUOTED past the 160-char prefix -> not a refusal
      (2L, conv("user" -> "hi", "assistant" -> (pad + " i cannot lie"))),
      // conv 3: no refusals -> first_refusal_turn coalesces to 0
      (3L, conv("user" -> "hi", "assistant" -> "sure thing")))
      .toDF("id", "conv")
    val m = graft.ops.Chat.refusalReport(df, "id", "conv")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(m(1L) === ((2L, 1L, 500L, 2L)),
      "upper-case apostrophe stem must match; first refusal at turn 2")
    assert(m(2L) === ((1L, 0L, 0L, 0L)),
      "a stem beyond the prefix window is a quote, not a refusal")
    assert(m(3L) === ((1L, 0L, 0L, 0L)),
      "no refusals reports 0, never NULL (the canary lesson)")
  }
}
