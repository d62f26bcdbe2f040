package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Subword (BPE) tokenization — the denomination a training pipeline
  * actually budgets and packs in (regex word-tokens can be 2-3× off per
  * language, so every token-denominated decision drifts with them).
  *
  * The public byte-pair-encoding construction (Sennrich et al. 2016):
  * start from single characters and merge adjacent unit pairs according
  * to a learned, rank-ordered merge table. This engine ships a small
  * COMMITTED merge table (no external model can be trained or downloaded
  * in this environment — swapping in a learned table changes one
  * constant) and applies it with the apply-merges tokenizer shape, as a
  * pure closed-form expression both engines evaluate identically:
  *
  *  - the text becomes a unit string with U+0001 separators on BOTH
  *    sides of every character (`␁c␁c␁…␁` — one regexp pass, `(?s)` so
  *    newlines are units too);
  *  - each merge `(a, b)` in RANK ORDER rewrites the fully boundary-
  *    delimited pattern `␁a␁b␁ → ␁ab␁` with plain `replace`, TWICE:
  *    a left-to-right pass consumes the trailing `␁` of each match,
  *    which is the leading `␁` of an immediately adjacent occurrence,
  *    so one pass merges alternate occurrences of back-to-back pairs
  *    and the second pass catches the skipped ones (their neighbors are
  *    now merged units, so every remaining occurrence has both
  *    boundaries intact). For `a ≠ b` occurrences cannot overlap, so
  *    the two passes produce EXACTLY the standard left-to-right
  *    non-overlapping merge of one tokenizer epoch;
  *  - tokens are the remaining units minus the space units (space is
  *    the word boundary: merges never form across it because the space
  *    unit sits between the words' units).
  *
  * Table constraints (documented, enforced by require): merge sides are
  * alphanumeric (they ride inside string literals on both engines) and
  * `a != b` — a self-pair's left-to-right pairing over an odd-length run
  * is scan-order-dependent and not reproducible in this closed form; a
  * learned table simply skips self-pairs. DOCUMENTED DIVERGENCE from
  * the fixed-point tokenizer loop: each merge is applied once in rank
  * order, so a pair RE-CREATED by a later merge is not revisited (true
  * BPE iterates to a fixed point). With rank-ordered tables (a
  * compound's parts always rank earlier) the difference is rare on
  * natural text, and the single-epoch form is what keeps tokenization a
  * zero-shuffle whole-stage-codegen projection — linear at 100 TB.
  */
object Bpe {

  /** Unit separator: U+0001 cannot appear in sane corpus text; any
    * occurrence is stripped first so the representation stays
    * well-defined on adversarial input (both engines strip identically).
    */
  val Sep = "\u0001"

  /** The committed merge table, in BPE rank order (a compound's parts
    * always appear before the compound — the invariant a learned table
    * satisfies by construction). English-ish bigrams plus digit pairs so
    * number tokenization is exercised.
    */
  val merges: Seq[(String, String)] = Seq(
    "t" -> "h", "th" -> "e", // the
    "i" -> "n", "in" -> "g", // ing
    "a" -> "n", "an" -> "d", // and
    "e" -> "r", "o" -> "n", "r" -> "e", "a" -> "t", "e" -> "n",
    "o" -> "r", "e" -> "s", "t" -> "o", "i" -> "s", "o" -> "u",
    "a" -> "r", "e" -> "d", "o" -> "f", "i" -> "t", "a" -> "l",
    "s" -> "t", "l" -> "e",
    "i" -> "o", "io" -> "n", // ion
    "c" -> "h", "q" -> "u",
    "1" -> "0", "1" -> "2")

  require(merges.forall { case (a, b) =>
    a != b && (a + b).forall(_.isLetterOrDigit)
  }, "merge sides must be alphanumeric and distinct (see scaladoc)")

  /** One boundary-delimited merge pass, applied twice (see scaladoc). */
  private def mergePasses(base: String): String =
    merges.foldLeft(base) { case (acc, (a, b)) =>
      val once = s"replace($acc, '$Sep$a$Sep$b$Sep', '$Sep$a$b$Sep')"
      s"replace($once, '$Sep$a$Sep$b$Sep', '$Sep$a$b$Sep')"
    }

  /** Spark expression: ARRAY<STRING> of the BPE tokens of `text` — the
    * compiled kernel ([[graft.functions.HashOps.bpeTokens]]: one
    * unit-list pass per merge). Requires the graft functions to be
    * registered (`VectorFunctions.attach`).
    */
  def sparkTokensExpr(text: String): String = s"graft_bpe_tokens($text)"

  /** Spark expression: BIGINT BPE token count of `text` (compiled). */
  def sparkTokenCountExpr(text: String): String = s"graft_bpe_count($text)"

  /** Declarative boundary-replace twin of [[sparkTokensExpr]] — the
    * parity baseline BpeSpec pins the compiled kernel against (the
    * DuckDB oracle runs this same construction in its dialect). ~60
    * interpreted string scans per row; the kernel replaces it in the
    * hot path.
    */
  def hofTokensExpr(text: String): String = {
    val base =
      s"concat('$Sep', regexp_replace(replace($text, '$Sep', ''), '(?s)(.)', '$$1$Sep'))"
    s"filter(split(${mergePasses(base)}, '$Sep'), u -> u <> '' AND u <> ' ')"
  }

  /** DuckDB twin of [[sparkTokensExpr]]. */
  def duckTokensExpr(text: String): String = {
    val base =
      s"('$Sep' || regexp_replace(replace($text, '$Sep', ''), '(?s)(.)', '\\1$Sep', 'g'))"
    s"list_filter(string_split(${mergePasses(base)}, '$Sep'), u -> u <> '' AND u <> ' ')"
  }

  /** DuckDB twin of [[sparkTokenCountExpr]]. */
  def duckTokenCountExpr(text: String): String =
    s"len(${duckTokensExpr(text)})::BIGINT"

  /** Per-doc BPE tokenization: word count (the old denomination, kept so
    * the divergence is visible in the result itself), BPE token count,
    * and the first `firstK` tokens joined by '|' (the cross-engine
    * witness that both engines produced the SAME token sequence, not
    * just the same count).
    */
  def bpeTokens(df: DataFrame, id: String, text: String,
                firstK: Int = 8): DataFrame =
    graft.functions.VectorFunctions.attach(df).select(col(id),
      expr(s"cast(size(split($text, ' ')) AS BIGINT)").as("n_words"),
      expr(sparkTokensExpr(text)).as("__toks"))
      .select(col(id), col("n_words"),
        expr("cast(size(__toks) AS BIGINT)").as("n_bpe_tokens"),
        expr(s"array_join(slice(__toks, 1, $firstK), '|')").as("first_tokens"))

  /** DuckDB twin of [[bpeTokens]]. */
  def bpeTokensSql(table: String, id: String, text: String,
                   firstK: Int = 8): String =
    s"""SELECT $id, n_words,
       |  len(toks)::BIGINT AS n_bpe_tokens,
       |  array_to_string(list_slice(toks, 1, $firstK), '|') AS first_tokens
       |FROM (SELECT $id, len(string_split($text, ' '))::BIGINT AS n_words,
       |      ${duckTokensExpr(text)} AS toks FROM $table)""".stripMargin
}
