package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus DATACARD — the one-call summary table a curation run
  * publishes with a release (the "data card" every corpus paper
  * ships): volume (docs/tokens/chars), exact-duplication rate,
  * language share, quality-gate pass rate, and mean document length,
  * as (metric, value) rows in exact integer arithmetic (ratios as
  * integer milli). Every number is a composition of already-green
  * operator families — the card's value is that it is ONE call with
  * ONE schema a registry can ingest per corpus version.
  *
  * Scale shape: one corpus scan computes the per-row metrics (compiled
  * token count, length, content digest), one scan each for the langid
  * and Gopher flag frames (both zero-shuffle projections), two
  * doc-keyed joins to line the flags up, one global agg (plus the
  * digest-distinct expand inside it), then a constant `stack` to rows.
  * Everything exchanged is id/flag-grain — text never shuffles.
  */
object Datacard {

  def datacard(df: DataFrame, id: String, text: String): DataFrame = {
    val base = graft.functions.VectorFunctions.attach(df)
      .select(col(id),
        expr(s"graft_token_count($text)").cast("long").as("__tok"),
        length(col(text)).cast("long").as("__chars"),
        expr(PortableHash.sparkStringHash(text)).as("__h"))
    val lang = TextAnalysis.langId(df, id, text)
      .select(col(id), (col("lang_pred") === "en").cast("long").as("__en"))
    val gop = TextAnalysis.gopherRules(df, id, text)
      .select(col(id), col("keep").cast("long").as("__keep"))
    base.join(lang, Seq(id)).join(gop, Seq(id))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__tok")).as("n_tokens"),
        sum(col("__chars")).as("n_chars"),
        countDistinct(col("__h")).as("n_unique_texts"),
        sum(col("__en")).as("n_en"),
        sum(col("__keep")).as("n_pass"))
      .select(expr(
        """stack(8,
          |  'n_docs', n_docs,
          |  'n_tokens', n_tokens,
          |  'n_chars', n_chars,
          |  'n_unique_texts', n_unique_texts,
          |  'dup_milli', 1000 * (n_docs - n_unique_texts) div n_docs,
          |  'lang_en_milli', 1000 * n_en div n_docs,
          |  'gopher_pass_milli', 1000 * n_pass div n_docs,
          |  'mean_tokens_milli', 1000 * n_tokens div n_docs
          |) AS (metric, value)""".stripMargin))
  }

  /** DuckDB twin of [[datacard]]. */
  def datacardSql(table: String, id: String, text: String): String = {
    val tok = s"len(regexp_extract_all($text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]'))"
    s"""WITH m AS (
       |  SELECT count(*)::BIGINT AS n_docs,
       |    CAST(sum($tok) AS BIGINT) AS n_tokens,
       |    CAST(sum(length($text)) AS BIGINT) AS n_chars,
       |    count(DISTINCT ${PortableHash.duckStringHash(text)})::BIGINT AS n_unique_texts
       |  FROM $table),
       |l AS (SELECT count(*)::BIGINT AS n_en FROM (
       |${TextAnalysis.langIdSql(table, id, text)}) WHERE lang_pred = 'en'),
       |g AS (SELECT count(*)::BIGINT AS n_pass FROM (
       |${TextAnalysis.gopherRulesSql(table, id, text)}) WHERE keep = 1)
       |SELECT metric, value FROM (
       |  SELECT 'n_docs' AS metric, n_docs AS value FROM m
       |  UNION ALL SELECT 'n_tokens', n_tokens FROM m
       |  UNION ALL SELECT 'n_chars', n_chars FROM m
       |  UNION ALL SELECT 'n_unique_texts', n_unique_texts FROM m
       |  UNION ALL SELECT 'dup_milli', (1000 * (n_docs - n_unique_texts)) // n_docs FROM m
       |  UNION ALL SELECT 'lang_en_milli', (1000 * n_en) // n_docs FROM m, l
       |  UNION ALL SELECT 'gopher_pass_milli', (1000 * n_pass) // n_docs FROM m, g
       |  UNION ALL SELECT 'mean_tokens_milli', (1000 * n_tokens) // n_docs FROM m)""".stripMargin
  }
}
