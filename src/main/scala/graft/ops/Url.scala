package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** URL curation — the stage every web-corpus pipeline runs before any
  * text op (RefinedWeb/CCNet drop ~half their crawl on URL evidence
  * alone): canonicalization, URL-level dedup, and the per-domain census.
  * A crawl re-fetches the same page under cosmetic URL variants (case,
  * `www.`, default ports, percent-encoding of unreserved characters,
  * fragments, query-parameter order, trailing slashes); canonicalizing
  * first makes URL dedup catch what exact text dedup pays a full text
  * hash for, at 8-byte-key cost.
  *
  * All string surgery is regex/array arithmetic generated ONCE per
  * rule and rendered into both dialects — no JVM URL parser (whose
  * quirks the oracle could not replay). Canonical form:
  *   - percent-encoding normalized per RFC 3986 §6.2.2: `%XX` of the
  *     unreserved set (ALPHA / DIGIT / `-._~`) decoded, remaining hex
  *     digits uppercased (`%3a` → `%3A`). Reserved escapes (`%2F`,
  *     `%26`, `%23`, `%25`, …) stay encoded, so path/query/fragment
  *     structure never changes under the rewrite. Assumes well-formed
  *     encoding (every `%` starts a hex triplet) — a crawl's URL field
  *     is; a bare `%` passes through untouched only if no later text
  *     happens to look like a triplet.
  *   - scheme-matching default port stripped (http↔80, https↔443 — an
  *     http://host:443 is a DIFFERENT resource and keeps its port);
  *   - lowercased host without `www.`; scheme dropped;
  *   - path without trailing slashes (case preserved — paths are
  *     case-sensitive); query parameters sorted; fragment dropped.
  *
  * `domain` is the REGISTRABLE domain under full PSL rule semantics
  * over the committed [[PublicSuffixes]] table: exception rules
  * prevail (`!www.ck` → any host under `www.ck` registers as
  * `www.ck`), then the LONGEST matching suffix — exact rules
  * (`shop.example.co.uk` → `example.co.uk`) and wildcard rules
  * (`*.ck`: `a.b.anything.ck` → `b.anything.ck`) at the same depth
  * resolve identically — then the implicit `*` fallback of the last
  * two labels. The lookup is a depth-descending CASE chain: one
  * last-k-labels extraction per rule depth probed against the
  * committed set (an IN list in the declarative dialects, a sorted-
  * array binary search in the compiled kernel) — the mechanism is
  * sized for the full ~9k-rule PSL, unlike the single regex
  * alternation it replaced, whose pattern grew with the table and
  * could not express wildcard/exception forms at all. A host that IS
  * a bare public suffix (no extra label) resolves to its last two
  * labels — documented approximation (the PSL proper says "no
  * registrable domain").
  *
  * Scale shape: canonicalization is a zero-shuffle projection (the
  * percent/port rewrite is a per-row constant-pattern replace chain —
  * no lookup, no state); dedup is one keyed partial-agg exchange of
  * (canon_url → min id); the census is the same exchange at domain
  * grain. The suffix table rides the compiled regex literal, never a
  * join.
  */
object Url {

  /** Dialect knobs: `esc` is the backslash as it must appear in the SQL
    * text (Spark string literals unescape `\\`→`\`; DuckDB's do not),
    * `ref(i)` the regexp_replace replacement backreference, `gFlag`
    * the trailing argument that makes an UNANCHORED regexp_replace
    * global — Spark replaces every match by default, DuckDB only the
    * FIRST unless `'g'` is passed (anchored patterns don't need it).
    */
  private final case class Dl(esc: String, ref: Int => String, gFlag: String) {
    def dot: String = esc + "."
  }
  private val SparkDl = Dl("\\\\", i => "$" + i, "")
  private val DuckDl  = Dl("\\", i => "\\" + i, ", 'g'")

  /** RFC 3986 §6.2.2 percent-normalization, as a constant replace
    * chain: (1) uppercase the hex digits of every triplet — six plain
    * replaces for a lowercase FIRST digit (`%a`→`%A`; safe: after `%`
    * only hex digits occur), then six backreference rewrites for a
    * lowercase SECOND digit (`%3a`→`%3A`); (2) decode the 66 unreserved
    * triplets (now uniformly uppercase) with plain replaces. No decoded
    * character is `%`, so decoding never fabricates a new triplet.
    */
  private def percentNormExpr(u: String, d: Dl): String = {
    val upFirst = "abcdef".foldLeft(u)((acc, c) =>
      s"replace($acc, '%$c', '%${c.toUpper}')")
    // UNANCHORED multi-match rewrite: needs the dialect's global flag
    // (DuckDB regexp_replace is first-match-only without 'g' — a URL
    // with two triplets sharing a lowercase second digit would
    // otherwise normalize differently in the oracle)
    val upSecond = "abcdef".foldLeft(upFirst)((acc, c) =>
      "regexp_replace(" + acc + ", '%([0-9A-F])" + c + "', '%" + d.ref(1) + c.toUpper + "'" + d.gFlag + ")")
    val unreserved = ('A' to 'Z') ++ ('a' to 'z') ++ ('0' to '9') ++ Seq('-', '.', '_', '~')
    unreserved.foldLeft(upSecond) { (acc, ch) =>
      val hex = f"${ch.toInt}%02X"
      "replace(" + acc + ", '%" + hex + "', '" + ch + "')"
    }
  }

  /** Scheme-matching default-port strip on the RAW url (before any part
    * extraction): `http://…:80` and `https://…:443` lose the port; a
    * mismatched default (`http://host:443`) names a different resource
    * and keeps it. Group 2 (the rest after the port) may be absent —
    * both engines substitute the empty string for an unmatched group.
    */
  private def portStripExpr(u: String, d: Dl): String = {
    val rep = "'" + d.ref(1) + d.ref(2) + "'"
    val h80 = s"regexp_replace($u, '(?i)^(http://[^/?#]*):80([/?#].*)?$$', $rep)"
    s"regexp_replace($h80, '(?i)^(https://[^/?#]*):443([/?#].*)?$$', $rep)"
  }

  private def canonParts(u0: String, d: Dl): (String, String, String) = {
    val u = portStripExpr(percentNormExpr(u0, d), d)
    val noFrag = s"regexp_replace($u, '#.*$$', '')"
    val host = s"regexp_extract($noFrag, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1)"
    val rest = s"regexp_replace($noFrag, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+', '')"
    // full lower() is safe here by DOMAIN: hosts are ASCII/punycode
    // (RFC 1035 LDH); a raw-unicode IDN host containing Σ/İ would hit
    // the Java-vs-utf8proc lowercase divergence (round-20 probe) —
    // punycode-encode upstream if that domain ever matters
    val canonHost = s"regexp_replace(lower($host), '^www${d.dot}', '')"
    val path = s"regexp_replace(regexp_extract($rest, '^([^?]*)', 1), '/+$$', '')"
    val query = s"regexp_extract($rest, '${d.esc}?(.*)$$', 1)"
    (canonHost, path, query)
  }

  /** The last `k` labels of `hp` as one extraction — '' when the host
    * has fewer than k labels or any of the last k is empty (label
    * atoms are `[^.]+`). The compiled kernel's `lastKStart` mirrors
    * exactly this contract.
    */
  private def lastKExpr(hp: String, k: Int, d: Dl): String =
    s"regexp_extract($hp, '([^.]+(?:${d.dot}[^.]+){${k - 1}})$$', 1)"

  /** Registrable domain from a (canonical) host expression: strip any
    * `:port`, then resolve against the committed [[PublicSuffixes]]
    * rule set as a depth-descending CASE chain —
    *
    *   1. exception rules (depth desc): host's last-depth(e) labels
    *      equal `e` → `e` IS the registrable domain (`!www.ck`);
    *   2. per suffix depth s (desc): last-s labels in the exact rules
    *      OR last-(s−1) labels in the wildcard tails, AND a valid
    *      (s+1)-label extraction exists → that extraction (suffix + 1
    *      label). A host that IS the bare suffix falls through;
    *   3. implicit `*` fallback: last two labels.
    *
    * Pure generated-constant SQL — IN lists over the committed table,
    * no join, no UDF — rendered identically into both dialects, so the
    * oracle replays the IDENTICAL rule set.
    */
  private def domainFromHost(h: String, d: Dl): String = {
    val hp = s"regexp_replace($h, ':[0-9]+$$', '')"
    def q(s: String) = "'" + s + "'"
    def lastK(k: Int) = lastKExpr(hp, k, d)
    val excBranches = PublicSuffixes.exceptions
      .sortBy(e => (-PublicSuffixes.depth(e), e))
      .map(e => s"WHEN ${lastK(PublicSuffixes.depth(e))} = ${q(e)} THEN ${q(e)}")
    val exactByDepth = PublicSuffixes.exact.groupBy(PublicSuffixes.depth)
    val tailsByDepth = PublicSuffixes.wildcardTails.groupBy(PublicSuffixes.depth)
    val sufBranches = (PublicSuffixes.maxSuffixDepth to 2 by -1).flatMap { s =>
      val conds = Seq(
        exactByDepth.get(s).map(xs =>
          s"${lastK(s)} IN (${xs.sorted.map(q).mkString(", ")})"),
        tailsByDepth.get(s - 1).map(ts =>
          s"${lastK(s - 1)} IN (${ts.sorted.map(q).mkString(", ")})")).flatten
      if (conds.isEmpty) None
      else Some(
        s"WHEN (${conds.mkString(" OR ")}) AND ${lastK(s + 1)} <> '' THEN ${lastK(s + 1)}")
    }
    (Seq("CASE") ++ excBranches ++ sufBranches ++
      Seq(s"ELSE ${lastK(2)} END")).mkString(" ")
  }

  /** Canonical-URL expression (Spark SQL dialect). */
  def sparkCanonExpr(u: String): String = {
    val (h, p, q) = canonParts(u, SparkDl)
    s"concat($h, $p, IF($q <> '', concat('?', array_join(array_sort(split($q, '&')), '&')), ''))"
  }

  /** Registrable-domain expression, Spark dialect. */
  def sparkDomainExpr(u: String): String = {
    val (h, _, _) = canonParts(u, SparkDl)
    domainFromHost(h, SparkDl)
  }

  /** Canonical-URL expression (DuckDB dialect). */
  def duckCanonExpr(u: String): String = {
    val (h, p, q) = canonParts(u, DuckDl)
    s"($h || $p || CASE WHEN $q <> '' THEN '?' || array_to_string(list_sort(string_split($q, '&')), '&') ELSE '' END)"
  }

  /** Registrable-domain expression, DuckDB dialect. */
  def duckDomainExpr(u: String): String = {
    val (h, _, _) = canonParts(u, DuckDl)
    domainFromHost(h, DuckDl)
  }

  /** Per-row canonicalization: (id, url, canon_url, domain). Runs the
    * compiled kernels (`graft_url_canon`/`graft_url_domain` —
    * [[graft.functions.UrlOps]], spec-pinned bit-equal to
    * [[sparkCanonExpr]]/[[sparkDomainExpr]]): the declarative chain's
    * ~90-node tree per instance is the measured 2–3× cost at sf0.1.
    */
  def canonicalize(df: DataFrame, id: String, urlCol: String): DataFrame =
    graft.functions.VectorFunctions.attach(df)
      .select(col(id), col(urlCol).as("url"),
        expr(s"graft_url_canon($urlCol)").as("canon_url"),
        expr(s"graft_url_domain($urlCol)").as("domain"))

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
    graft.functions.VectorFunctions.attach(df)
      .select(col(id), expr(s"graft_url_canon($urlCol)").as("canon_url"))
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
    graft.functions.VectorFunctions.attach(df)
      .select(expr(s"graft_url_domain($urlCol)").as("domain"),
        expr(s"graft_url_canon($urlCol)").as("canon_url"))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("canon_url")).as("n_urls"))
      .withColumn("dup_milli",
        expr("(1000 * (n_docs - n_urls)) div n_docs"))

  /** Domain blocklist filter — the ACTING twin of [[domainReport]]
    * (drop everything from domains the census flagged): rows whose
    * REGISTRABLE domain (public-suffix aware: blocking `example.co.uk`
    * drops `shop.example.co.uk` too) is in the list are removed. The
    * list is metadata (a curation decision, rarely more than thousands
    * of entries) and rides the expression as a literal — zero shuffle,
    * streaming-safe. An allowlist is the same op with `keep = true`.
    */
  def domainFilter(df: DataFrame, urlCol: String, blocked: Seq[String],
                   allow: Boolean = false): DataFrame = {
    val lst = blocked.map(d => s"'${d.replace("'", "''")}'").mkString("array(", ", ", ")")
    val hit = s"array_contains($lst, graft_url_domain($urlCol))"
    graft.functions.VectorFunctions.attach(df)
      .where(expr(if (allow) hit else s"NOT $hit"))
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
