package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** URL curation — the stage every web-corpus pipeline runs before any
  * text op (RefinedWeb/CCNet drop ~half their crawl on URL evidence
  * alone): canonicalization, URL-level dedup, and the per-domain census.
  * A crawl re-fetches the same page under cosmetic URL variants (case,
  * `www.`, default ports, fragments, query-parameter order, trailing
  * slashes); canonicalizing first makes URL dedup catch what exact text
  * dedup pays a full text hash for, at 8-byte-key cost.
  *
  * All string surgery is regex/array arithmetic with an identical
  * DuckDB twin — no JVM URL parser (whose quirks the oracle could not
  * replay). Canonical form: lowercased host without `www.`/default
  * port, path without trailing slashes, query parameters sorted,
  * fragment dropped. `domain` is the last-two-label approximation of
  * the registrable domain (a public-suffix list is a data file, not an
  * algorithm; the op takes the label count on faith and documents it).
  *
  * Scale shape: canonicalization is a zero-shuffle projection; dedup is
  * one keyed partial-agg exchange of (canon_url → min id); the census
  * is the same exchange at domain grain.
  */
object Url {

  private def sparkCanonParts(u: String): (String, String, String) = {
    val noFrag = s"regexp_replace($u, '#.*$$', '')"
    val host = s"regexp_extract($noFrag, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1)"
    val rest = s"regexp_replace($noFrag, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+', '')"
    val canonHost =
      s"regexp_replace(regexp_replace(lower($host), '^www\\\\.', ''), ':(80|443)$$', '')"
    val path = s"regexp_replace(regexp_extract($rest, '^([^?]*)', 1), '/+$$', '')"
    val query = s"regexp_extract($rest, '\\\\?(.*)$$', 1)"
    (canonHost, path, query)
  }

  /** Canonical-URL expression (Spark SQL dialect). */
  def sparkCanonExpr(u: String): String = {
    val (h, p, q) = sparkCanonParts(u)
    s"concat($h, $p, IF($q <> '', concat('?', array_join(array_sort(split($q, '&')), '&')), ''))"
  }

  /** Registrable-domain (last two labels) expression, Spark dialect. */
  def sparkDomainExpr(u: String): String = {
    val (h, _, _) = sparkCanonParts(u)
    s"regexp_extract($h, '([^.]+\\\\.[^.]+)$$', 1)"
  }

  private def duckCanonParts(u: String): (String, String, String) = {
    val noFrag = s"regexp_replace($u, '#.*$$', '')"
    val host = s"regexp_extract($noFrag, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1)"
    val rest = s"regexp_replace($noFrag, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+', '')"
    val canonHost =
      s"regexp_replace(regexp_replace(lower($host), '^www\\.', ''), ':(80|443)$$', '')"
    val path = s"regexp_replace(regexp_extract($rest, '^([^?]*)', 1), '/+$$', '')"
    val query = s"regexp_extract($rest, '\\?(.*)$$', 1)"
    (canonHost, path, query)
  }

  /** Canonical-URL expression (DuckDB dialect). */
  def duckCanonExpr(u: String): String = {
    val (h, p, q) = duckCanonParts(u)
    s"($h || $p || CASE WHEN $q <> '' THEN '?' || array_to_string(list_sort(string_split($q, '&')), '&') ELSE '' END)"
  }

  /** Registrable-domain expression, DuckDB dialect. */
  def duckDomainExpr(u: String): String = {
    val (h, _, _) = duckCanonParts(u)
    s"regexp_extract($h, '([^.]+\\.[^.]+)$$', 1)"
  }

  /** Per-row canonicalization: (id, url, canon_url, domain). */
  def canonicalize(df: DataFrame, id: String, urlCol: String): DataFrame =
    df.select(col(id), col(urlCol).as("url"),
      expr(sparkCanonExpr(urlCol)).as("canon_url"),
      expr(sparkDomainExpr(urlCol)).as("domain"))

  /** DuckDB twin of [[canonicalize]]. */
  def canonicalizeSql(table: String, id: String, urlCol: String): String =
    s"""SELECT $id, $urlCol AS url,
       |  ${duckCanonExpr(urlCol)} AS canon_url,
       |  ${duckDomainExpr(urlCol)} AS domain
       |FROM $table""".stripMargin

  /** URL dedup keepers: per canonical URL, keep the lowest id (the
    * engine-wide keeper priority). One keyed partial-agg exchange of
    * (canon_url, id) — no text ever moves.
    */
  def urlDedupKeepers(df: DataFrame, id: String, urlCol: String): DataFrame =
    df.select(col(id), expr(sparkCanonExpr(urlCol)).as("canon_url"))
      .groupBy(col("canon_url"))
      .agg(min(col(id)).as("keep_id"), count(lit(1)).as("n_variants"))

  /** DuckDB twin of [[urlDedupKeepers]]. */
  def urlDedupKeepersSql(table: String, id: String, urlCol: String): String =
    s"""SELECT ${duckCanonExpr(urlCol)} AS canon_url,
       |  min($id) AS keep_id, count(*) AS n_variants
       |FROM $table GROUP BY 1""".stripMargin

  /** Per-domain census: docs, distinct canonical URLs, and the
    * integer-milli URL-dup rate — the table that finds mirror/template
    * domains before any text op runs.
    */
  def domainReport(df: DataFrame, id: String, urlCol: String): DataFrame =
    df.select(expr(sparkDomainExpr(urlCol)).as("domain"),
        expr(sparkCanonExpr(urlCol)).as("canon_url"))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("canon_url")).as("n_urls"))
      .withColumn("dup_milli",
        expr("(1000 * (n_docs - n_urls)) div n_docs"))

  /** Domain blocklist filter — the ACTING twin of [[domainReport]]
    * (drop everything from domains the census flagged): rows whose
    * registrable domain is in the list are removed. The list is
    * metadata (a curation decision, rarely more than thousands of
    * entries) and rides the expression as a literal — zero shuffle,
    * streaming-safe. An allowlist is the same op with `keep = true`.
    */
  def domainFilter(df: DataFrame, urlCol: String, blocked: Seq[String],
                   allow: Boolean = false): DataFrame = {
    val lst = blocked.map(d => s"'${d.replace("'", "''")}'").mkString("array(", ", ", ")")
    val hit = s"array_contains($lst, ${sparkDomainExpr(urlCol)})"
    df.where(expr(if (allow) hit else s"NOT $hit"))
  }

  /** DuckDB twin of [[domainFilter]] — emits the WHERE predicate. */
  def domainFilterPredSql(urlCol: String, blocked: Seq[String],
                          allow: Boolean = false): String = {
    val lst = blocked.map(d => s"'${d.replace("'", "''")}'").mkString("[", ", ", "]")
    val hit = s"list_contains($lst, ${duckDomainExpr(urlCol)})"
    if (allow) hit else s"NOT $hit"
  }

  /** DuckDB twin of [[domainReport]]. */
  def domainReportSql(table: String, id: String, urlCol: String): String =
    s"""SELECT ${duckDomainExpr(urlCol)} AS domain,
       |  count(*) AS n_docs,
       |  count(DISTINCT ${duckCanonExpr(urlCol)}) AS n_urls,
       |  ((1000 * (count(*) - count(DISTINCT ${duckCanonExpr(urlCol)}))) // count(*))::BIGINT AS dup_milli
       |FROM $table GROUP BY 1""".stripMargin
}
