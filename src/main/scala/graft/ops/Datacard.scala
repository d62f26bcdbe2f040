package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus DATACARD — the one-call summary table a curation run
  * publishes with a release (the "data card" every corpus paper
  * ships): volume (docs/tokens/chars), exact-duplication rate,
  * language share, quality-gate pass rate, and mean document length,
  * as (metric, value) rows in exact integer arithmetic (ratios as
  * integer milli; an empty corpus yields defined zeros, not a
  * divide-by-zero). Every number is a composition of already-green
  * operator families — the card's value is that it is ONE call with
  * ONE schema a registry can ingest per corpus version.
  *
  * Scale shape: ONE corpus scan. [[TextAnalysis.gopherRules]]' carry
  * hook keeps text in the gate's own projection, the language scores
  * and the compiled token/length/digest projections stack as adjacent
  * Projects that Catalyst collapses, and everything funnels into a
  * single global agg (plus the digest-distinct expand inside it) and
  * a constant `stack`. No joins — which is also what keeps the
  * doc-count semantics identical to the oracle's plain `count(*)`
  * under duplicate or null ids (a doc-keyed join would fan out or
  * drop them).
  */
object Datacard {

  def datacard(df: DataFrame, id: String, text: String): DataFrame = {
    val flagged = TextAnalysis.gopherRules(df, id, text, carry = Seq(text))
    val perRow = flagged
      .select(col("keep").cast("long").as("__keep"),
        expr(s"graft_token_count($text)").cast("long").as("__tok"),
        length(col(text)).cast("long").as("__chars"),
        expr(PortableHash.sparkStringHash(text)).as("__h"),
        (expr(TextAnalysis.langPredExpr(text)) === "en").cast("long").as("__en"))
    perRow
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(col("__tok")), lit(0L)).as("n_tokens"),
        coalesce(sum(col("__chars")), lit(0L)).as("n_chars"),
        countDistinct(col("__h")).as("n_unique_texts"),
        coalesce(sum(col("__en")), lit(0L)).as("n_en"),
        coalesce(sum(col("__keep")), lit(0L)).as("n_pass"))
      .select(expr(
        """stack(8,
          |  'n_docs', n_docs,
          |  'n_tokens', n_tokens,
          |  'n_chars', n_chars,
          |  'n_unique_texts', n_unique_texts,
          |  'dup_milli', IF(n_docs = 0, 0L, 1000 * (n_docs - n_unique_texts) div n_docs),
          |  'lang_en_milli', IF(n_docs = 0, 0L, 1000 * n_en div n_docs),
          |  'gopher_pass_milli', IF(n_docs = 0, 0L, 1000 * n_pass div n_docs),
          |  'mean_tokens_milli', IF(n_docs = 0, 0L, 1000 * n_tokens div n_docs)
          |) AS (metric, value)""".stripMargin))
  }

  /** DuckDB twin of [[datacard]]. */
  def datacardSql(table: String, id: String, text: String): String = {
    val tok = s"len(regexp_extract_all($text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]'))"
    def milli(num: String) =
      s"CASE WHEN n_docs = 0 THEN 0 ELSE ($num) // n_docs END"
    s"""WITH m AS (
       |  SELECT count(*)::BIGINT AS n_docs,
       |    coalesce(CAST(sum($tok) AS BIGINT), 0) AS n_tokens,
       |    coalesce(CAST(sum(length($text)) AS BIGINT), 0) AS n_chars,
       |    count(DISTINCT ${PortableHash.duckStringHash(text)})::BIGINT AS n_unique_texts
       |  FROM $table),
       |l AS (SELECT count(*)::BIGINT AS n_en FROM (
       |${TextAnalysis.langIdSql(table, id, text)}) WHERE lang_pred = 'en'),
       |g AS (SELECT count(*)::BIGINT AS n_pass FROM (
       |${TextAnalysis.gopherRulesSql(table, id, text)}) WHERE keep = 1)
       |SELECT metric, CAST(value AS BIGINT) AS value FROM (
       |  SELECT 'n_docs' AS metric, n_docs AS value FROM m
       |  UNION ALL SELECT 'n_tokens', n_tokens FROM m
       |  UNION ALL SELECT 'n_chars', n_chars FROM m
       |  UNION ALL SELECT 'n_unique_texts', n_unique_texts FROM m
       |  UNION ALL SELECT 'dup_milli', ${milli("1000 * (n_docs - n_unique_texts)")} FROM m
       |  UNION ALL SELECT 'lang_en_milli', ${milli("1000 * n_en")} FROM m, l
       |  UNION ALL SELECT 'gopher_pass_milli', ${milli("1000 * n_pass")} FROM m, g
       |  UNION ALL SELECT 'mean_tokens_milli', ${milli("1000 * n_tokens")} FROM m)""".stripMargin
  }
}
