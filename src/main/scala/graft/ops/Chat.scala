package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SFT / chat-data preparation operators (round 16) — the
  * instruction-tuning stage of a training-data pipeline: conversations
  * arrive as JSON arrays of `{role, content}` turns (the de-facto
  * interchange shape of public SFT datasets), and the pipeline must
  * validate their structure, profile them, and render them into the
  * single training string a tokenizer consumes.
  *
  * Both operators parse the JSON ONCE per row into
  * `ARRAY<STRUCT<role, content>>` (`from_json` — a codegen'd Catalyst
  * expression, no UDF) and stay row-local until the final keyed
  * output: zero shuffles beyond the scan, the 100 TB shape by
  * construction. The DuckDB twins replay the same semantics through
  * `json_extract_string` over an unnested turn-index series.
  *
  * Domain: WELL-FORMED JSON arrays of turn objects with >= 1 turn (a
  * row whose JSON parses to an empty array is absent from both
  * engines' outputs — the [[Dedup.dedupSentences]] empty-domain
  * convention; a malformed conversation is out of contract — the
  * DuckDB twins' `::JSON` cast rejects it outright). Every turn must
  * carry a non-null `role` AND `content`: a missing/null field is out
  * of contract, and the engines' null propagation through string
  * concatenation differs (Spark nulls the whole render, DuckDB's
  * string_agg skips the null element) — validate upstream rather
  * than relying on either behavior.
  */
object Chat {

  private val turnsSchema = "array<struct<role:string,content:string>>"

  /** Domain filter + single parse. The non-empty check is the CHEAP
    * raw-string predicate `instr(conv, '{') > 0` (≡ "at least one
    * turn object" on well-formed arrays), NOT `size(__c) >= 1`: a
    * filter on the parsed column gets pushed below the projection
    * with `from_json` SUBSTITUTED in, so every row paid the parse
    * twice — once in the filter, once in the project (caught by the
    * PlanAuditSpec one-parse pin; the verify-skill pushdown trap).
    * After the cheap filter, `__c` is multiply referenced and
    * non-cheap, so CollapseProject keeps it materialized — exactly
    * one parse per row.
    */
  private def withTurns(df: DataFrame, conv: String): DataFrame =
    df.where(col(conv).isNotNull && expr(s"instr($conv, '{') > 0"))
      .withColumn("__c", expr(s"from_json($conv, '$turnsSchema')"))

  /** Per-conversation structural profile: turn counts by role, the
    * system-prompt flag, `valid` — the STRICT alternation CONTRACT of
    * chat fine-tuning data (an optional single leading `system` turn,
    * then a non-empty strict user/assistant alternation that starts
    * with `user` and ends with `assistant`; anything else breaks
    * masking assumptions downstream), `valid_ext` (round 17) — the
    * EXTENDED grammar that admits `tool` turns (function-call results:
    * optional system head; body starts with `user`, ends with
    * `assistant`, roles drawn from {user, assistant, tool}; `user`
    * follows only `assistant`, `assistant` follows `user` or `tool`,
    * and `tool` follows only `assistant` or `tool` — a tool result
    * answers an assistant call, possibly chained) — and per-role
    * character masses. `valid ⇒ valid_ext` (the strict grammar is the
    * tool-free fragment of the extended one).
    */
  def chatTurnStats(df: DataFrame, id: String, conv: String): DataFrame =
    withTurns(df, conv)
      .select(col(id),
        expr("cast(size(__c) AS BIGINT)").as("n_turns"),
        expr("cast(size(filter(__c, x -> x.role = 'user')) AS BIGINT)")
          .as("n_user"),
        expr("cast(size(filter(__c, x -> x.role = 'assistant')) AS BIGINT)")
          .as("n_assistant"),
        expr("cast(size(filter(__c, x -> x.role = 'tool')) AS BIGINT)")
          .as("n_tool"),
        expr("element_at(__c, 1).role = 'system'").as("has_system"),
        expr(PortableHash.let1("__b",
          "IF(element_at(__c, 1).role = 'system', " +
            "slice(__c, 2, size(__c) - 1), __c)",
          // IF guards keep the forall off descending sequence(0, -1)
          // (ANSI element_at would throw on the empty body)
          "IF(size(__b) = 0 OR size(__b) % 2 = 1, false, " +
            "forall(sequence(0, size(__b) - 1), i -> " +
            "element_at(__b, cast(i + 1 AS INT)).role = " +
            "IF(i % 2 = 0, 'user', 'assistant')))")).as("valid"),
        expr(PortableHash.let1("__b",
          "IF(element_at(__c, 1).role = 'system', " +
            "slice(__c, 2, size(__c) - 1), __c)",
          // size < 2 is false outright (first=user AND last=assistant
          // cannot both hold) — and it keeps the successor forall off
          // descending sequence(1, 0) (the ANSI element_at trap)
          "IF(size(__b) < 2, false, " +
            "element_at(__b, 1).role = 'user' AND " +
            "element_at(__b, size(__b)).role = 'assistant' AND " +
            "forall(__b, x -> x.role IN ('user', 'assistant', 'tool')) AND " +
            "forall(sequence(1, size(__b) - 1), i -> " +
            "CASE element_at(__b, cast(i + 1 AS INT)).role " +
            "WHEN 'user' THEN element_at(__b, cast(i AS INT)).role = 'assistant' " +
            "WHEN 'assistant' THEN element_at(__b, cast(i AS INT)).role IN ('user', 'tool') " +
            "ELSE element_at(__b, cast(i AS INT)).role IN ('assistant', 'tool') END))"))
          .as("valid_ext"),
        expr("aggregate(filter(__c, x -> x.role = 'user'), " +
          "cast(0 AS BIGINT), (a, x) -> a + length(x.content))")
          .as("user_chars"),
        expr("aggregate(filter(__c, x -> x.role = 'assistant'), " +
          "cast(0 AS BIGINT), (a, x) -> a + length(x.content))")
          .as("assistant_chars"))

  /** DuckDB twin of [[chatTurnStats]]: turns unnested by index,
    * per-row alternation checked against the windowed first-role
    * offset, re-aggregated per conversation.
    */
  def chatTurnStatsSql(table: String, id: String, conv: String): String =
    s"""WITH p AS (SELECT $id, $conv AS conv FROM $table),
       |t AS (
       |  SELECT $id, i,
       |    json_extract_string(conv, '$$[' || (i - 1) || '].role') AS role,
       |    json_extract_string(conv, '$$[' || (i - 1) || '].content') AS content
       |  FROM (SELECT $id, conv,
       |          unnest(generate_series(1, json_array_length(conv::JSON)::BIGINT)) AS i
       |        FROM p)),
       |t2 AS (
       |  SELECT *, CASE WHEN first_value(role) OVER (PARTITION BY $id ORDER BY i) = 'system'
       |                 THEN 1 ELSE 0 END AS off,
       |         lag(role) OVER (PARTITION BY $id ORDER BY i) AS prev
       |  FROM t),
       |a AS (
       |  SELECT $id,
       |    count(*) AS n_turns,
       |    sum(CASE WHEN role = 'user' THEN 1 ELSE 0 END)::BIGINT AS n_user,
       |    sum(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END)::BIGINT AS n_assistant,
       |    sum(CASE WHEN role = 'tool' THEN 1 ELSE 0 END)::BIGINT AS n_tool,
       |    max(off) = 1 AS has_system,
       |    bool_and(CASE WHEN i <= off THEN true
       |                  ELSE role = (CASE WHEN (i - off) % 2 = 1 THEN 'user'
       |                                    ELSE 'assistant' END) END) AS alt,
       |    bool_and(CASE WHEN i <= off THEN true
       |                  WHEN i = off + 1 THEN role = 'user'
       |                  ELSE CASE role
       |                       WHEN 'user' THEN prev = 'assistant'
       |                       WHEN 'assistant' THEN prev IN ('user', 'tool')
       |                       WHEN 'tool' THEN prev IN ('assistant', 'tool')
       |                       ELSE false END END) AS ext_alt,
       |    arg_max(role, i) = 'assistant' AS ends_assistant,
       |    (count(*) - max(off))::BIGINT AS body_n,
       |    sum(CASE WHEN role = 'user' THEN len(content) ELSE 0 END)::BIGINT AS user_chars,
       |    sum(CASE WHEN role = 'assistant' THEN len(content) ELSE 0 END)::BIGINT AS assistant_chars
       |  FROM t2 GROUP BY $id)
       |SELECT $id, n_turns, n_user, n_assistant, n_tool, has_system,
       |  (body_n > 0 AND body_n % 2 = 0 AND alt) AS valid,
       |  (body_n >= 2 AND ext_alt AND ends_assistant) AS valid_ext,
       |  user_chars, assistant_chars
       |FROM a""".stripMargin

  /** Template render: flatten each conversation to the single training
    * string (`<|role|>content` per turn, `<|end|>` terminator — a
    * neutral ChatML-like shape) with its char and token counts; the
    * string a packing stage ([[Sampling]]) or the BPE tokenizer
    * ([[Bpe]]) consumes. Row-local; token counts ride the compiled
    * `graft_token_count` kernel.
    */
  def chatRender(df: DataFrame, id: String, conv: String): DataFrame =
    withTurns(graft.functions.VectorFunctions.attach(df), conv)
      .withColumn("rendered",
        expr("concat(aggregate(__c, '', (acc, x) -> " +
          "concat(acc, '<|', x.role, '|>', x.content)), '<|end|>')"))
      .select(col(id), col("rendered"),
        expr("cast(length(rendered) AS BIGINT)").as("n_chars"),
        expr(s"cast(${TextAnalysis.nTokensExpr("rendered")} AS BIGINT)")
          .as("n_tokens"))

  /** Assistant LOSS-MASK spans — the reason renders matter: a chat
    * fine-tune masks the loss to assistant tokens only, so the trainer
    * needs, for every assistant turn, the character span its content
    * occupies inside the [[chatRender]] string. One row per assistant
    * turn: `(id, span_idx, start_char, end_char)` — 0-based,
    * end-exclusive offsets into the rendered string (each turn
    * contributes `len('<|' + role + '|>') + len(content)` =
    * `len(role) + 4 + len(content)` characters).
    *
    * Row-local single pass: a struct-accumulator `aggregate` carries
    * (cursor, spans) across the turn array — no per-turn re-scan, no
    * shuffle; the explode lands one small row per assistant turn.
    */
  def chatAssistantSpans(df: DataFrame, id: String, conv: String): DataFrame =
    withTurns(df, conv)
      .withColumn("__sp", expr(
        "aggregate(__c, " +
          "named_struct('pos', cast(0 AS BIGINT), " +
          "  'spans', cast(array() AS ARRAY<STRUCT<s: BIGINT, e: BIGINT>>)), " +
          "(acc, x) -> named_struct(" +
          "  'pos', acc.pos + length(x.role) + 4 + length(x.content), " +
          "  'spans', IF(x.role = 'assistant', " +
          "    concat(acc.spans, array(named_struct(" +
          "      's', acc.pos + length(x.role) + 4, " +
          "      'e', acc.pos + length(x.role) + 4 + length(x.content)))), " +
          "    acc.spans)), " +
          "acc -> acc.spans)"))
      // OUTER explode + a cheap null filter on the GENERATED column,
      // not plain posexplode: the optimizer infers `size(__sp) > 0`
      // from a non-outer Generate (InferFiltersFromGenerate) and
      // pushes it below the projection with the whole parse+aggregate
      // SUBSTITUTED in — every row paid the parse twice (caught by
      // the PlanAuditSpec one-parse pin). The outer form has nothing
      // to infer; no-assistant rows emit one null that the post-
      // generate filter drops for free.
      .select(col(id), posexplode_outer(col("__sp")).as(Seq("span_idx", "sp")))
      .where(col("sp").isNotNull)
      .select(col(id), col("span_idx").cast("long").as("span_idx"),
        col("sp.s").as("start_char"), col("sp.e").as("end_char"))

  /** DuckDB twin of [[chatAssistantSpans]]: cumulative turn lengths by
    * window, filtered to assistant turns.
    */
  def chatAssistantSpansSql(table: String, id: String, conv: String): String =
    s"""WITH p AS (SELECT $id, $conv AS conv FROM $table),
       |t AS (
       |  SELECT $id, i,
       |    json_extract_string(conv, '$$[' || (i - 1) || '].role') AS role,
       |    json_extract_string(conv, '$$[' || (i - 1) || '].content') AS content
       |  FROM (SELECT $id, conv,
       |          unnest(generate_series(1, json_array_length(conv::JSON)::BIGINT)) AS i
       |        FROM p)),
       |o AS (
       |  SELECT $id, i, role, content,
       |    coalesce(sum(len(role) + 4 + len(content))
       |      OVER (PARTITION BY $id ORDER BY i
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS prev
       |  FROM t)
       |SELECT $id,
       |  (row_number() OVER (PARTITION BY $id ORDER BY i) - 1)::BIGINT AS span_idx,
       |  (prev + len(role) + 4)::BIGINT AS start_char,
       |  (prev + len(role) + 4 + len(content))::BIGINT AS end_char
       |FROM o WHERE role = 'assistant'""".stripMargin

  /** Per-stratum SFT-corpus REPORT — the report-before-acting
    * companion ([[Sampling.packReport]] convention) over
    * [[chatTurnStats]]: conversation counts, the valid-alternation
    * fraction in integer MILLI units (the repo's exact-arithmetic
    * discipline — no float ratios in hashes), mean turns in milli,
    * and per-role character masses. One keyed partial-agg exchange of
    * stratum-grain rows — metadata-sized.
    */
  def chatReport(df: DataFrame, id: String, conv: String,
                 strata: String): DataFrame =
    withTurns(df, conv)
      .select(col(strata), expr("cast(size(__c) AS BIGINT)").as("n_turns"),
        expr(PortableHash.let1("__b",
          "IF(element_at(__c, 1).role = 'system', " +
            "slice(__c, 2, size(__c) - 1), __c)",
          "IF(size(__b) = 0 OR size(__b) % 2 = 1, false, " +
            "forall(sequence(0, size(__b) - 1), i -> " +
            "element_at(__b, cast(i + 1 AS INT)).role = " +
            "IF(i % 2 = 0, 'user', 'assistant')))")).as("valid"),
        expr("aggregate(filter(__c, x -> x.role = 'user'), " +
          "cast(0 AS BIGINT), (a, x) -> a + length(x.content))")
          .as("user_chars"),
        expr("aggregate(filter(__c, x -> x.role = 'assistant'), " +
          "cast(0 AS BIGINT), (a, x) -> a + length(x.content))")
          .as("assistant_chars"))
      .groupBy(col(strata))
      .agg(count(lit(1)).as("n_convs"),
        sum(when(col("valid"), 1L).otherwise(0L)).as("n_valid"),
        expr("cast(sum(IF(valid, 1, 0)) * 1000 div count(*) AS BIGINT)")
          .as("valid_milli"),
        expr("cast(sum(n_turns) * 1000 div count(*) AS BIGINT)")
          .as("mean_turns_milli"),
        sum(col("user_chars")).as("user_chars"),
        sum(col("assistant_chars")).as("assistant_chars"))

  /** DuckDB twin of [[chatReport]] (stats re-derived per conversation
    * through the shared unnested-turn shape, then one stratum agg).
    */
  def chatReportSql(table: String, id: String, conv: String,
                    strata: String): String =
    s"""WITH p AS (SELECT $id, $strata, $conv AS conv FROM $table),
       |t AS (
       |  SELECT $id, $strata, i,
       |    json_extract_string(conv, '$$[' || (i - 1) || '].role') AS role,
       |    json_extract_string(conv, '$$[' || (i - 1) || '].content') AS content
       |  FROM (SELECT $id, $strata, conv,
       |          unnest(generate_series(1, json_array_length(conv::JSON)::BIGINT)) AS i
       |        FROM p)),
       |t2 AS (
       |  SELECT *, CASE WHEN first_value(role) OVER (PARTITION BY $id ORDER BY i) = 'system'
       |                 THEN 1 ELSE 0 END AS off
       |  FROM t),
       |a AS (
       |  SELECT $id, any_value($strata) AS $strata,
       |    count(*) AS n_turns,
       |    bool_and(CASE WHEN i <= off THEN true
       |                  ELSE role = (CASE WHEN (i - off) % 2 = 1 THEN 'user'
       |                                    ELSE 'assistant' END) END)
       |      AND (count(*) - max(off)) > 0
       |      AND (count(*) - max(off)) % 2 = 0 AS valid,
       |    sum(CASE WHEN role = 'user' THEN len(content) ELSE 0 END)::BIGINT AS user_chars,
       |    sum(CASE WHEN role = 'assistant' THEN len(content) ELSE 0 END)::BIGINT AS assistant_chars
       |  FROM t2 GROUP BY $id)
       |SELECT $strata, count(*) AS n_convs,
       |  sum(CASE WHEN valid THEN 1 ELSE 0 END)::BIGINT AS n_valid,
       |  (sum(CASE WHEN valid THEN 1 ELSE 0 END) * 1000 // count(*))::BIGINT AS valid_milli,
       |  (sum(n_turns) * 1000 // count(*))::BIGINT AS mean_turns_milli,
       |  sum(user_chars)::BIGINT AS user_chars,
       |  sum(assistant_chars)::BIGINT AS assistant_chars
       |FROM a GROUP BY $strata""".stripMargin

  /** Stripped length of a string expression: codepoints excluding the
    * BPE unit separator (U+0001, stripped by the tokenizer before
    * unitization) and the space unit (the word boundary, dropped from
    * the token list) — the coordinate system of [[chatMaskTokens]].
    */
  private def strippedLen(x: String): String =
    s"length(replace(replace($x, '${Bpe.Sep}', ''), ' ', ''))"

  /** TOKEN-grain loss-mask spans (round 17) — the trainer-consumable
    * form of [[chatAssistantSpans]]: per assistant turn, the 0-based
    * end-exclusive span of TOKEN INDICES its content occupies in the
    * BPE token sequence (`graft_bpe_tokens`) of the [[chatRender]]
    * string. Char spans mask characters; a trainer masks token
    * positions — this is the rung between them.
    *
    * Alignment is EXACT by construction, not approximation: the merge
    * table's sides are alphanumeric ([[Bpe.merges]] invariant), so the
    * template delimiters `<`, `|`, `>` can never merge into a content
    * token and no token straddles a turn boundary. The BPE tokenizer
    * drops space units (and strips U+0001), so spans live in STRIPPED
    * coordinates — cumulative non-space codepoints — and the masked
    * token slice reproduces the turn content minus its spaces
    * (ChatSpec pins `concat(tokens[start, end)) = content \ spaces`).
    * A turn whose content is all spaces yields an empty span
    * (start_token = end_token) — present, zero tokens to mask.
    *
    * Plan shape: one `from_json`, one struct-accumulator pass for the
    * stripped-coordinate spans, one compiled tokenize of the inlined
    * render, one cumulative-ends accumulator — all row-local; the
    * explode lands one small row per assistant turn. Zero exchanges,
    * the [[chatAssistantSpans]] outer-explode idiom against the
    * InferFiltersFromGenerate double-parse trap.
    */
  def chatMaskTokens(df: DataFrame, id: String, conv: String): DataFrame =
    withTurns(graft.functions.VectorFunctions.attach(df), conv)
      // assistant spans in stripped coordinates: the accumulator cursor
      // advances by len_stripped('<|' role '|>' content) per turn
      // (the four delimiter chars are never spaces, so they count 4)
      .withColumn("__sp", expr(
        "aggregate(__c, " +
          "named_struct('pos', cast(0 AS BIGINT), " +
          "  'spans', cast(array() AS ARRAY<STRUCT<s: BIGINT, e: BIGINT>>)), " +
          s"(acc, x) -> named_struct(" +
          s"  'pos', acc.pos + ${strippedLen("x.role")} + 4 + ${strippedLen("x.content")}, " +
          s"  'spans', IF(x.role = 'assistant', " +
          s"    concat(acc.spans, array(named_struct(" +
          s"      's', acc.pos + ${strippedLen("x.role")} + 4, " +
          s"      'e', acc.pos + ${strippedLen("x.role")} + 4 + ${strippedLen("x.content")}))), " +
          s"    acc.spans)), " +
          "acc -> acc.spans)"))
      // cumulative token END offsets (stripped coords) over the BPE
      // sequence of the render — the compiled one-pass kernel, NOT a
      // declarative aggregate: `concat(acc, array(x))` copies the
      // accumulator per token, O(tokens²) per row — invisible on the
      // ~70-token oracle renders, catastrophic on 6k-token real
      // conversations (ProbeRound17's shape). The render is inlined
      // (referenced once) so no second materialization of the string
      .withColumn("__ce", expr(
        "graft_bpe_token_ends(concat(aggregate(__c, '', (acc, x) -> " +
          "concat(acc, '<|', x.role, '|>', x.content)), '<|end|>'))"))
      .select(col(id), posexplode_outer(col("__sp")).as(Seq("span_idx", "sp")),
        col("__ce"))
      .where(col("sp").isNotNull)
      // a token belongs LEFT of offset o iff its cumulative end <= o
      // (boundaries align, see scaladoc) -> the span's token indices
      // are [#ends <= s, #ends <= e); graft_count_le = binary search,
      // O(log tokens) per span vs the HOF filter's interpreted
      // whole-array walk
      .select(col(id), col("span_idx").cast("long").as("span_idx"),
        expr("graft_count_le(__ce, sp.s)").as("start_token"),
        expr("graft_count_le(__ce, sp.e)").as("end_token"))

  /** DuckDB twin of [[chatMaskTokens]]: the span CTE in stripped
    * coordinates (windowed prefix sums), the token sequence unnested
    * with cumulative ends, and a per-span count of ends at-or-below
    * each boundary.
    */
  def chatMaskTokensSql(table: String, id: String, conv: String): String = {
    def sl(x: String) = s"len(replace(replace($x, '${Bpe.Sep}', ''), ' ', ''))"
    s"""WITH p AS (SELECT $id, $conv AS conv FROM $table),
       |t AS (
       |  SELECT $id, i,
       |    json_extract_string(conv, '$$[' || (i - 1) || '].role') AS role,
       |    json_extract_string(conv, '$$[' || (i - 1) || '].content') AS content
       |  FROM (SELECT $id, conv,
       |          unnest(generate_series(1, json_array_length(conv::JSON)::BIGINT)) AS i
       |        FROM p)),
       |o AS (
       |  SELECT $id, i, role, content,
       |    coalesce(sum(${sl("role")} + 4 + ${sl("content")})
       |      OVER (PARTITION BY $id ORDER BY i
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS prev
       |  FROM t),
       |sp AS (
       |  SELECT $id,
       |    (row_number() OVER (PARTITION BY $id ORDER BY i) - 1)::BIGINT AS span_idx,
       |    (prev + ${sl("role")} + 4)::BIGINT AS s,
       |    (prev + ${sl("role")} + 4 + ${sl("content")})::BIGINT AS e
       |  FROM o WHERE role = 'assistant'),
       |r AS (
       |  SELECT $id,
       |    string_agg('<|' || role || '|>' || content, '' ORDER BY i) || '<|end|>' AS rendered
       |  FROM t GROUP BY $id),
       |ce AS (
       |  SELECT $id, ti,
       |    sum(len(tok)) OVER (PARTITION BY $id ORDER BY ti)::BIGINT AS ce
       |  FROM (SELECT $id, unnest(generate_series(1, len(toks))) AS ti,
       |               unnest(toks) AS tok
       |        FROM (SELECT $id, ${Bpe.duckTokensExpr("rendered")} AS toks FROM r)))
       |SELECT sp.$id, sp.span_idx,
       |  count(CASE WHEN ce.ce <= sp.s THEN 1 END)::BIGINT AS start_token,
       |  count(CASE WHEN ce.ce <= sp.e THEN 1 END)::BIGINT AS end_token
       |FROM sp LEFT JOIN ce ON sp.$id = ce.$id
       |GROUP BY sp.$id, sp.span_idx""".stripMargin
  }

  /** Packed-sequence LOSS MASKS (round 17) — the complete trainer-batch
    * shape, closing the chain render → tokenize → pack → mask: each
    * conversation's rendered string is packed into budgeted training
    * sequences ([[Sampling.packSequencesSharded]], BPE-token
    * denomination so mask indices and packing indices agree), and every
    * assistant turn's [[chatMaskTokens]] span is shifted by the
    * document's token offset WITHIN its packed sequence. One row per
    * assistant turn: `(id, strata, shard, seq_id, span_idx,
    * start_token, end_token)` — 0-based end-exclusive positions in the
    * concatenated token stream of sequence `(strata, shard, seq_id)`,
    * exactly what a loss-masking data loader consumes.
    *
    * Plan shape: two scan branches over the corpus (render+count for
    * packing; parse+spans for masks — re-scanning a columnar source is
    * cheaper at scale than shuffling the whole mask frame through an
    * extra exchange to share one scan), the packing stage's one
    * (strata, shard) window exchange (offset-in-sequence rides the SAME
    * sort via a second window function, no extra exchange), and one
    * doc-keyed join of metadata-sized frames.
    */
  def chatPackMasked(df: DataFrame, id: String, conv: String,
                     strata: String, budget: Int,
                     shards: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rendered = chatRender(df, id, conv)
      .join(df.select(col(id), col(strata)), Seq(id))
    val packed = Sampling.packSequencesSharded(
      rendered, id, "rendered", strata, budget, shards,
      t => s"graft_bpe_count($t)")
    val w = Window.partitionBy(col(strata), col("shard")).orderBy(col(id))
    val ws = Window.partitionBy(col(strata), col("shard"), col("seq_id"))
    // a doc's tokens occupy [doc_start - seq_start, +n_tokens) within
    // its sequence: doc_start is the running sum the packing computed,
    // seq_start the min doc_start of the sequence (docs are assigned to
    // the sequence where they START, so overflow never shifts offsets)
    val off = packed
      .withColumn("__ds", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("__off", col("__ds") - min(col("__ds")).over(ws))
      .select(col(id), col(strata), col("shard"), col("seq_id"), col("__off"))
    chatMaskTokens(df, id, conv)
      .join(off, Seq(id))
      .select(col(id), col(strata), col("shard"), col("seq_id"),
        col("span_idx"),
        (col("start_token") + col("__off")).as("start_token"),
        (col("end_token") + col("__off")).as("end_token"))
  }

  /** DuckDB twin of [[chatPackMasked]] (same portable shard hash,
    * running-sum packing, per-sequence offset window, mask-span shift).
    */
  def chatPackMaskedSql(table: String, id: String, conv: String,
                        strata: String, budget: Int,
                        shards: Int = 16): String = {
    val shard = s"(${PortableHash.duckStringHash(s"($id)::VARCHAR")} % $shards)"
    val ntok = Bpe.duckTokenCountExpr("rendered")
    s"""WITH rr AS (${chatRenderSql(table, id, conv)}),
       |rs AS (SELECT rr.$id, rr.rendered, t.$strata
       |       FROM rr JOIN (SELECT $id, $strata FROM $table) t USING ($id)),
       |p AS (
       |  SELECT $id, $strata, shard, n_tokens,
       |    floor((cum - n_tokens) / $budget.0)::BIGINT AS seq_id,
       |    (cum - n_tokens)::BIGINT AS ds
       |  FROM (SELECT $id, $strata, $shard AS shard, $ntok AS n_tokens,
       |          sum($ntok) OVER (PARTITION BY $strata, $shard ORDER BY $id) AS cum
       |        FROM rs)),
       |o AS (
       |  SELECT $id, $strata, shard, seq_id,
       |    (ds - min(ds) OVER (PARTITION BY $strata, shard, seq_id))::BIGINT AS off
       |  FROM p),
       |m AS (${chatMaskTokensSql(table, id, conv)})
       |SELECT m.$id, o.$strata, o.shard, o.seq_id, m.span_idx,
       |  (m.start_token + o.off)::BIGINT AS start_token,
       |  (m.end_token + o.off)::BIGINT AS end_token
       |FROM m JOIN o USING ($id)""".stripMargin
  }

  /** Conversation QUARANTINE (round 17) — the documented chat domain
    * contract, ENFORCED as a split instead of assumed: every row is
    * classified into the first failing rung of the contract ladder, and
    * the clean rows (`ok = true`) are exactly the domain every other
    * chat operator is specified over. The `decodeFailures` pattern of
    * the envelope layer (envelope/Envelope.scala) applied to
    * conversations: production SFT corpora contain malformed rows, and
    * without this split they produce engine-divergent behavior (Spark
    * nulls the parse; a strict JSON cast errors outright).
    *
    * Reasons, first match wins:
    *  - `null_conv`  — the conversation column is NULL;
    *  - `malformed`  — not a JSON ARRAY: doesn't start with `[` after
    *    trimming (cheap raw-string check BOTH engines agree on — it
    *    also fences off the engine-specific handling of top-level JSON
    *    objects) or fails to parse;
    *  - `empty`      — parses to zero turns;
    *  - `null_field` — some turn is missing `role` or `content` (JSON
    *    null and absent key are both null after extraction, on both
    *    engines);
    *  - `ok`         — in domain; flows on.
    *
    * One parse per row, no filter (every input row lands in exactly one
    * output row) — callers split on `ok`, audit on `reason`.
    */
  /** Token-budget conversation TRUNCATION (round 17) — the context-fit
    * pass an SFT pipeline runs before packing: a conversation longer
    * than the training context must shed turns, and the convention that
    * preserves the most signal is keep the system head (if any)
    * unconditionally + the LONGEST SUFFIX of body turns whose total
    * token cost fits `budget` (recent turns carry the conversation
    * state; ancient ones are the expendable prefix — the sliding-window
    * convention of public chat-training recipes).
    *
    * Token cost of a turn = `cost('<|role|>content')` — by default the
    * `graft_token_count` whitespace+punct lens ([[chatRender]]'s
    * `n_tokens`), or `graft_bpe_count` via [[Bpe.sparkTokenCountExpr]]
    * so the chain render → truncate → pack → mask agrees on ONE token
    * denomination (the round-17 review finding: truncation budgeted in
    * word-ish tokens while [[chatPackMasked]] budgets BPE — a
    * conversation truncated to "fit" could still overflow the packed
    * sequence). Per-turn costs are ADDITIVE in the BPE lens: every
    * committed merge joins two alphanumeric units, and turn junctions
    * (`…t<|role|>c…`) always interpose non-alphanumeric units, so no
    * merge crosses a turn boundary and the sum of per-turn counts
    * equals the whole-render count (ChatSpec pins
    * `graft_bpe_count(rendered) = tokens_kept + cost('<|end|>')`).
    * A truncated render's cost is the sum of its kept turns' costs
    * plus the `<|end|>` terminator (NOT counted against the budget;
    * it is constant overhead the caller prices into `budget`). A turn
    * whose own cost exceeds `budget` is dropped with the rest of the
    * prefix — output may keep ZERO body turns (head + terminator only)
    * rather than emit an over-budget render.
    *
    * Row-local single pass: per-turn costs via one `transform`, prefix
    * sums via the struct-accumulator idiom ([[chatAssistantSpans]] —
    * O(turns), not the O(turns²) per-suffix re-aggregate), the kept
    * count from one `filter` over suffix sums (suffix_sum(i) = total −
    * prefix(i−1), monotone decreasing in i, so "suffix fits" selects
    * exactly a suffix). Zero exchanges; one `from_json` (the
    * [[withTurns]] one-parse discipline — `__c` is multiply referenced
    * and stays materialized).
    *
    * Output: one row per in-domain conversation — kept/dropped turn
    * counts (kept INCLUDES the system head), `tokens_kept` (cost of
    * head + kept body, terminator excluded), and the truncated render.
    */
  def chatTruncate(df: DataFrame, id: String, conv: String,
                   budget: Int,
                   cost: String => String =
                     t => s"graft_token_count($t)"): DataFrame =
    withTurns(graft.functions.VectorFunctions.attach(df), conv)
      .withColumn("__costs", expr(
        "transform(__c, x -> cast(" +
          cost("concat('<|', x.role, '|>', x.content)") +
          " AS BIGINT))"))
      .withColumn("__sys", expr("element_at(__c, 1).role = 'system'"))
      .withColumn("__body", expr(
        "IF(__sys, slice(__c, 2, size(__c) - 1), __c)"))
      // prefix sums over BODY costs (struct accumulator, O(turns))
      .withColumn("__pre", expr(
        "aggregate(IF(__sys, slice(__costs, 2, size(__costs) - 1), __costs), " +
          "named_struct('t', cast(0 AS BIGINT), " +
          "  'a', cast(array() AS ARRAY<BIGINT>)), " +
          "(acc, c) -> named_struct('t', acc.t + c, " +
          "  'a', concat(acc.a, array(acc.t + c))), " +
          "acc -> acc.a)"))
      .withColumn("__tot", expr(
        "IF(size(__pre) = 0, cast(0 AS BIGINT), " +
          "element_at(__pre, size(__pre)))"))
      // kept body turns: i in [1, n] with total - prefix(i-1) <= budget
      // (the IF guards sequence(1, 0) — the descending-sequence ANSI trap)
      .withColumn("__keepn", expr(
        s"IF(size(__body) = 0, 0, size(filter(sequence(1, size(__body)), " +
          s"i -> __tot - IF(i = 1, cast(0 AS BIGINT), " +
          s"element_at(__pre, cast(i - 1 AS INT))) <= $budget)))"))
      .select(col(id),
        expr("cast(__keepn + IF(__sys, 1, 0) AS BIGINT)").as("n_kept"),
        expr("cast(size(__body) - __keepn AS BIGINT)").as("n_dropped"),
        expr("cast(IF(__sys, element_at(__costs, 1), cast(0 AS BIGINT)) + " +
          "__tot - IF(size(__body) = __keepn, cast(0 AS BIGINT), " +
          "element_at(__pre, cast(size(__body) - __keepn AS INT))) AS BIGINT)")
          .as("tokens_kept"),
        expr("concat(aggregate(concat(" +
          "IF(__sys, slice(__c, 1, 1), cast(array() AS " +
          "ARRAY<STRUCT<role: STRING, content: STRING>>)), " +
          "slice(__body, size(__body) - __keepn + 1, __keepn)), '', " +
          "(acc, x) -> concat(acc, '<|', x.role, '|>', x.content)), " +
          "'<|end|>')").as("rendered"))

  /** DuckDB twin of [[chatTruncate]]: turns unnested with per-turn
    * costs, suffix sums by a descending window, keep = head OR
    * suffix-fits, re-aggregated per conversation (string_agg skips the
    * dropped turns' NULLs; coalesce covers the all-dropped render).
    * `cost` mirrors the Spark side's lens (default whitespace+punct;
    * pass [[Bpe.duckTokenCountExpr]] for the BPE denomination).
    */
  def chatTruncateSql(table: String, id: String, conv: String,
                      budget: Int,
                      cost: String => String = t =>
                        s"len(regexp_extract_all($t, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]'))::BIGINT"
                     ): String =
    s"""WITH p AS (SELECT $id, $conv AS conv FROM $table),
       |t AS (
       |  SELECT $id, i,
       |    json_extract_string(conv, '$$[' || (i - 1) || '].role') AS role,
       |    json_extract_string(conv, '$$[' || (i - 1) || '].content') AS content
       |  FROM (SELECT $id, conv,
       |          unnest(generate_series(1, json_array_length(conv::JSON)::BIGINT)) AS i
       |        FROM p)),
       |c AS (
       |  SELECT *,
       |    ${cost("('<|' || role || '|>' || content)")} AS cost,
       |    CASE WHEN first_value(role) OVER (PARTITION BY $id ORDER BY i) = 'system'
       |         THEN 1 ELSE 0 END AS off
       |  FROM t),
       |s AS (
       |  SELECT *, sum(CASE WHEN i > off THEN cost ELSE 0 END)
       |      OVER (PARTITION BY $id ORDER BY i DESC) AS sufcost
       |  FROM c),
       |k AS (SELECT *, (i <= off OR sufcost <= $budget) AS keep FROM s)
       |SELECT $id,
       |  sum(CASE WHEN keep THEN 1 ELSE 0 END)::BIGINT AS n_kept,
       |  sum(CASE WHEN NOT keep THEN 1 ELSE 0 END)::BIGINT AS n_dropped,
       |  sum(CASE WHEN keep THEN cost ELSE 0 END)::BIGINT AS tokens_kept,
       |  coalesce(string_agg(CASE WHEN keep THEN '<|' || role || '|>' || content END,
       |    '' ORDER BY i), '') || '<|end|>' AS rendered
       |FROM k GROUP BY $id""".stripMargin

  /** ASSISTANT-turn grain (round 18): one row per assistant turn with
    * its 1-based position and raw content — the frame model-OUTPUT
    * quality ops run over (the user's side is input, not generation).
    * Row-local: one parse, one posexplode, a role filter; composes
    * with the text-analysis family via a turn key (see the
    * `chat_degeneration` composition — repetition scoring over
    * assistant turns catches decoding loops that document-grain
    * quality gates never see, because the loop lives inside one turn
    * of an otherwise-normal conversation).
    */
  def assistantTurns(df: DataFrame, id: String, conv: String): DataFrame =
    allTurns(df, id, conv)
      .where(col("role") === "assistant").drop("role")

  /** ALL-roles turn grain — the [[assistantTurns]] frame without the
    * role filter (PII hides in user turns too; the `chat_scrub`
    * composition scrubs every side). Turn-grain output is deliberate:
    * re-serializing the conversation to JSON would hash-compare
    * engine-specific escaping/key-order, while (id, turn_idx, role,
    * content) rows reassemble losslessly.
    */
  def allTurns(df: DataFrame, id: String, conv: String): DataFrame =
    withTurns(graft.functions.VectorFunctions.attach(df), conv)
      .select(col(id), posexplode(col("__c")))
      .select(col(id), (col("pos") + 1).cast("long").as("turn_idx"),
        col("col.role").as("role"), col("col.content").as("content"))

  /** DuckDB twin of [[allTurns]]. */
  def allTurnsSql(table: String, id: String, conv: String): String =
    s"""SELECT $id, i::BIGINT AS turn_idx, role, content FROM (
       |  SELECT $id, i,
       |    json_extract_string(conv, '$$[' || (i - 1) || '].role') AS role,
       |    json_extract_string(conv, '$$[' || (i - 1) || '].content') AS content
       |  FROM (SELECT $id, $conv AS conv,
       |          unnest(generate_series(1, json_array_length(($conv)::JSON)::BIGINT)) AS i
       |        FROM $table))""".stripMargin

  /** DuckDB twin of [[assistantTurns]] — the all-roles twin filtered,
    * so the turn-extraction scaffold lives in ONE place per dialect.
    */
  def assistantTurnsSql(table: String, id: String, conv: String): String =
    s"""SELECT $id, turn_idx, content
       |FROM (${allTurnsSql(table, id, conv)})
       |WHERE role = 'assistant'""".stripMargin

  /** Language-CONSISTENCY audit (round 18) — the code-switch check an
    * SFT curation runs per conversation: every turn gets the langid
    * argmax ([[TextAnalysis.langPredExpr]], the committed marker
    * lists), and the conversation reports its turn count, the number
    * of distinct non-'und' languages, the dominant language's share
    * of turns in milli, and a `consistent` flag (≤1 language).
    * Undetermined turns are NEUTRAL: they count in the share
    * denominator (they dilute dominance) but never as a language —
    * a conversation of one en turn and one und turn is consistent,
    * not bilingual. No dominant-language NAME column by design: the
    * argmax tie-break across engines would pin an arbitrary order on
    * a question the audit doesn't ask.
    *
    * Plan shape: one parse + row-local turn explode, then two
    * partial-agged keyed exchanges ((conv, lang) then conv) — the
    * langid kernel runs per turn inside the scan projection.
    */
  def chatLangConsistency(df: DataFrame, id: String,
                          conv: String): DataFrame =
    allTurns(df, id, conv)
      .select(col(id), expr(
        graft.ops.TextAnalysis.langPredExpr("content")).as("__lp"))
      .groupBy(col(id), col("__lp"))
      .agg(count(lit(1)).as("__n"))
      .groupBy(col(id))
      .agg(sum(col("__n")).as("n_turns"),
        sum(when(col("__lp") =!= "und", 1L).otherwise(0L)).as("n_langs"),
        max(when(col("__lp") =!= "und", col("__n")).otherwise(0L)).as("__top"))
      .select(col(id), col("n_turns"), col("n_langs"),
        expr("CAST(__top * 1000 div n_turns AS BIGINT)").as("top_share_milli"),
        (col("n_langs") <= 1L).as("consistent"))

  /** DuckDB twin of [[chatLangConsistency]]. */
  def chatLangConsistencySql(table: String, id: String,
                             conv: String): String =
    s"""SELECT $id, sum(n)::BIGINT AS n_turns,
       |  sum(CASE WHEN lang_pred <> 'und' THEN 1 ELSE 0 END)::BIGINT AS n_langs,
       |  (max(CASE WHEN lang_pred <> 'und' THEN n ELSE 0 END) * 1000
       |    // sum(n))::BIGINT AS top_share_milli,
       |  sum(CASE WHEN lang_pred <> 'und' THEN 1 ELSE 0 END) <= 1 AS consistent
       |FROM (
       |  SELECT $id, lang_pred, count(*) AS n
       |  FROM (${graft.ops.TextAnalysis.langIdSql(
              s"(${allTurnsSql(table, id, conv)})", id, "content")})
       |  GROUP BY 1, 2)
       |GROUP BY $id""".stripMargin

  def chatQuarantine(df: DataFrame, id: String, conv: String): DataFrame =
    df.withColumn("__c", expr(s"from_json($conv, '$turnsSchema')"))
      .withColumn("reason", expr(
        s"CASE WHEN $conv IS NULL THEN 'null_conv' " +
          s"WHEN NOT (ltrim($conv) LIKE '[%') THEN 'malformed' " +
          "WHEN __c IS NULL THEN 'malformed' " +
          "WHEN size(__c) = 0 THEN 'empty' " +
          "WHEN exists(__c, x -> x.role IS NULL OR x.content IS NULL) " +
          "THEN 'null_field' ELSE 'ok' END"))
      .select(col(id), (col("reason") === "ok").as("ok"), col("reason"))

  /** DuckDB twin of [[chatQuarantine]] — `json_valid` instead of the
    * erroring `::JSON` cast, the same ladder. The non-object-element
    * rung mirrors Spark's `from_json` PERMISSIVE behavior, which nulls
    * the WHOLE array when ANY element fails struct conversion (probed:
    * `["hi"]`, `[1,2]`, `[{...},"x"]`, `[[1]]` all parse to NULL on
    * Spark but are valid JSON to DuckDB — without the rung they land
    * in null_field there, breaking the engine-agreed classification;
    * wrong-TYPED fields inside an object element need no rung: both
    * engines render them as their JSON strings, probed identical).
    */
  def chatQuarantineSql(table: String, id: String, conv: String): String =
    s"""SELECT $id, (reason = 'ok') AS ok, reason FROM (
       |  SELECT $id,
       |    CASE WHEN conv IS NULL THEN 'null_conv'
       |         WHEN NOT (ltrim(conv) LIKE '[%') THEN 'malformed'
       |         WHEN NOT json_valid(conv) THEN 'malformed'
       |         WHEN len(list_filter(generate_series(1, json_array_length(conv::JSON)::BIGINT),
       |              i -> json_type(conv, '$$[' || (i - 1) || ']') <> 'OBJECT')) > 0
       |         THEN 'malformed'
       |         WHEN json_array_length(conv::JSON) = 0 THEN 'empty'
       |         WHEN len(list_filter(generate_series(1, json_array_length(conv::JSON)::BIGINT),
       |              i -> json_extract_string(conv, '$$[' || (i - 1) || '].role') IS NULL
       |                OR json_extract_string(conv, '$$[' || (i - 1) || '].content') IS NULL)) > 0
       |         THEN 'null_field' ELSE 'ok' END AS reason
       |  FROM (SELECT $id, $conv AS conv FROM $table))""".stripMargin

  /** Refusal-opener patterns (round 19) — a committed data table
    * (the lexicon convention: a Scala constant rendered identically
    * into both dialects, knowledge-bounded re-listing of the
    * refusal-stem phrasings the public SFT-audit recipes grep for).
    * Matching is SUBSTRING-in-PREFIX: the lowered first
    * [[refusalPrefixChars]] chars of the turn — refusals open a turn,
    * and a full-text match would flag an assistant QUOTING a refusal
    * mid-answer.
    */
  private[ops] val refusalPatterns: Seq[String] = Seq(
    "i cannot", "i can't", "i can not", "i won't", "i will not",
    "i'm sorry, but", "i am sorry, but", "i'm unable", "i am unable",
    "i'm not able to", "i am not able to", "as an ai", "i must decline",
    "against my guidelines", "i don't feel comfortable",
    "i do not feel comfortable")

  private[ops] val refusalPrefixChars = 160

  private def refusalFlag(lowered: String): String =
    refusalPatterns.map { p =>
      s"instr($lowered, '${p.replace("'", "''")}') > 0"
    }.mkString("(", " OR ", ")")

  /** REFUSAL-rate report (round 19) — the over-refusal audit an SFT
    * curation runs before a corpus teaches a model to say no to
    * everything: per conversation, assistant-turn count, how many open
    * with a refusal stem, the rate in milli, and the first refusing
    * turn index (0 = none — coalesced, the canary lesson: "no
    * refusals" must be a value, not a NULL). A corpus whose
    * refusal_milli distribution has mass far above the task mix's
    * genuine-harm rate is training in over-refusal; the per-turn flag
    * composes with [[Sampling]] filters to cap it.
    *
    * Plan shape: the [[assistantTurns]] parse (zero-exchange,
    * turn-grain) into one conversation-keyed partial-agg exchange; the
    * pattern ORs are builtin `instr` calls over a shared
    * lowered-prefix column — codegen-friendly, no UDF, and the turn
    * TEXT never shuffles (only the per-turn flag). Distributive
    * (complete-mode streaming family).
    */
  def refusalReport(df: DataFrame, id: String, conv: String): DataFrame =
    assistantTurns(df, id, conv)
      // the ASCII fold, not full lower(): the stem table is pure
      // ASCII, and Java-vs-utf8proc lowercase genuinely diverges on
      // final-sigma/İ content (İ → i+U+0307 on Spark, bare i on
      // DuckDB — which also shifts the prefix window; probed r20)
      .withColumn("__lp", expr(
        s"substring(${graft.ops.PortableHash.asciiLower("content")}, " +
          s"1, $refusalPrefixChars)"))
      .withColumn("__f", expr(refusalFlag("__lp")))
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_assistant_turns"),
        sum(when(col("__f"), 1L).otherwise(0L)).as("n_refusals"),
        coalesce(min(when(col("__f"), col("turn_idx"))), lit(0L))
          .as("first_refusal_turn"))
      .select(col(id), col("n_assistant_turns"), col("n_refusals"),
        expr("CAST(n_refusals * 1000 div n_assistant_turns AS BIGINT)")
          .as("refusal_milli"),
        col("first_refusal_turn"))

  /** DuckDB twin of [[refusalReport]]. */
  def refusalReportSql(table: String, id: String, conv: String): String =
    s"""SELECT $id, count(*) AS n_assistant_turns,
       |  sum(CASE WHEN f THEN 1 ELSE 0 END)::BIGINT AS n_refusals,
       |  (sum(CASE WHEN f THEN 1 ELSE 0 END) * 1000
       |    // count(*))::BIGINT AS refusal_milli,
       |  coalesce(min(CASE WHEN f THEN turn_idx END), 0)::BIGINT
       |    AS first_refusal_turn
       |FROM (
       |  SELECT $id, turn_idx,
       |    ${refusalFlag(s"substring(${graft.ops.PortableHash.asciiLower("content")}, 1, $refusalPrefixChars)")} AS f
       |  FROM (${assistantTurnsSql(table, id, conv)}))
       |GROUP BY $id""".stripMargin

  /** DuckDB twin of [[chatRender]]. */
  def chatRenderSql(table: String, id: String, conv: String): String =
    s"""WITH p AS (SELECT $id, $conv AS conv FROM $table),
       |t AS (
       |  SELECT $id, i,
       |    json_extract_string(conv, '$$[' || (i - 1) || '].role') AS role,
       |    json_extract_string(conv, '$$[' || (i - 1) || '].content') AS content
       |  FROM (SELECT $id, conv,
       |          unnest(generate_series(1, json_array_length(conv::JSON)::BIGINT)) AS i
       |        FROM p)),
       |r AS (
       |  SELECT $id,
       |    string_agg('<|' || role || '|>' || content, '' ORDER BY i) || '<|end|>' AS rendered
       |  FROM t GROUP BY $id)
       |SELECT $id, rendered,
       |  len(rendered)::BIGINT AS n_chars,
       |  len(regexp_extract_all(rendered, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]'))::BIGINT AS n_tokens
       |FROM r""".stripMargin
}
