package graft.functions

import java.util.regex.Pattern
import org.apache.spark.unsafe.types.UTF8String

/** Compiled URL canonicalization — the kernel behind `graft_url_canon`
  * and `graft_url_domain`.
  *
  * The declarative form ([[graft.ops.Url.sparkCanonExpr]]) is a ~90-op
  * nested replace/regex chain whose expression TREE is the cost: four
  * instances of the chain per canon column blow the generated method
  * past what whole-stage codegen keeps tight, and every node allocates
  * an intermediate UTF8String per row (measured 2–3.4× regressions on
  * the sf0.1 url queries when the RFC 3986 chain landed). This kernel
  * runs the SAME OPERATION SEQUENCE — each step a precompiled
  * java.util.regex Pattern or JDK String.replace, i.e. the identical
  * regex engine Spark's regexp_replace uses — in one static call, so
  * the projection is a single codegen'd expression again.
  *
  * BIT-PARITY CONTRACT (UrlKernelSpec pins it, including on MALFORMED
  * percent-encodings where a single-pass decoder would diverge from
  * the declarative chain's sequential-replace artifacts — e.g.
  * '%6%43', where replacing '%43'→'C' first CREATES '%6C' that the
  * earlier-ordered 'l' pass no longer sees): every step below mirrors
  * one step of [[graft.ops.Url.sparkCanonExpr]] in the same order —
  * percent-norm (first-digit replaces, second-digit backref rewrites,
  * 66 unreserved decodes in A–Z a–z 0–9 -._~ order), scheme-matching
  * port strip, fragment drop, host/rest extraction, Spark-semantics
  * lowercase (UTF8String.toLowerCase — NOT locale-sensitive
  * String.toLowerCase), www strip, trailing-slash strip, query split
  * with limit -1 (trailing empties kept, as Spark's split), sort in
  * UTF8String BINARY order (Spark's array_sort on strings — Java
  * String order differs on supplementary planes), '&' join. The
  * DuckDB oracle keeps running the declarative dialect.
  */
object UrlOps {

  // ---- RFC 3986 §6.2.2 percent-normalization (sequence-exact) ----
  private val upSecond: Array[Pattern] =
    ('a' to 'f').map(c => Pattern.compile("%([0-9A-F])" + c)).toArray
  private val unreservedChars: Array[Char] =
    (('A' to 'Z') ++ ('a' to 'z') ++ ('0' to '9') ++ Seq('-', '.', '_', '~')).toArray
  private val unreservedHex: Array[String] =
    unreservedChars.map(ch => "%%%02X".format(ch.toInt))
  private val unreservedStr: Array[String] = unreservedChars.map(String.valueOf)

  private def percentNorm(s: String): String = {
    if (s.indexOf('%') < 0) return s // every step below is a no-op without '%'
    var t = s
    var c = 'a'
    while (c <= 'f') {
      t = t.replace("%" + c, "%" + c.toUpper)
      c = (c + 1).toChar
    }
    var i = 0
    while (i < upSecond.length) {
      t = upSecond(i).matcher(t).replaceAll("%$1" + ('A' + i).toChar)
      i += 1
    }
    i = 0
    while (i < unreservedChars.length) {
      t = t.replace(unreservedHex(i), unreservedStr(i))
      i += 1
    }
    t
  }

  // ---- scheme-matching default-port strip ----
  private val port80 = Pattern.compile("(?i)^(http://[^/?#]*):80([/?#].*)?$")
  private val port443 = Pattern.compile("(?i)^(https://[^/?#]*):443([/?#].*)?$")

  private def portStrip(s: String): String =
    port443.matcher(port80.matcher(s).replaceAll("$1$2")).replaceAll("$1$2")

  // ---- part extraction (same patterns as the declarative dialect) ----
  private val fragP = Pattern.compile("#.*$")
  private val hostP = Pattern.compile("^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)")
  private val restP = Pattern.compile("^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+")
  private val wwwP = Pattern.compile("^www\\.")
  private val pathP = Pattern.compile("^([^?]*)")
  private val slashP = Pattern.compile("/+$")
  private val queryP = Pattern.compile("\\?(.*)$")

  /** (canonHost, rest) of the pre-normalized URL. */
  private def partsOf(raw: String): (String, String) = {
    val u = portStrip(percentNorm(raw))
    val noFrag = fragP.matcher(u).replaceAll("")
    val hm = hostP.matcher(noFrag)
    val host = if (hm.find()) hm.group(1) else ""
    val rest = restP.matcher(noFrag).replaceAll("")
    // Spark's lower(), not String.toLowerCase (locale-sensitive)
    val hostLower = UTF8String.fromString(host).toLowerCase.toString
    (wwwP.matcher(hostLower).replaceAll(""), rest)
  }

  def canon(u8: UTF8String): UTF8String = {
    val (canonHost, rest) = partsOf(u8.toString)
    val pm = pathP.matcher(rest)
    val path0 = if (pm.find()) pm.group(1) else ""
    val path = slashP.matcher(path0).replaceAll("")
    val qm = queryP.matcher(rest)
    val query = if (qm.find()) qm.group(1) else ""
    val sb = new java.lang.StringBuilder(canonHost).append(path)
    if (query.nonEmpty) {
      // split limit -1 (Spark keeps trailing empties); UTF8 binary sort
      val parts: Array[UTF8String] =
        query.split("&", -1).map(UTF8String.fromString)
      java.util.Arrays.sort(parts, (a: UTF8String, b: UTF8String) => a.compareTo(b))
      sb.append('?')
      var i = 0
      while (i < parts.length) {
        if (i > 0) sb.append('&')
        sb.append(parts(i).toString)
        i += 1
      }
    }
    UTF8String.fromString(sb.toString)
  }

  // ---- registrable domain: sorted-array longest-suffix probe ----
  // The declarative twin is a depth-descending CASE chain of last-k-
  // label extractions probed against IN lists (graft.ops.Url
  // .domainFromHost); this kernel runs the IDENTICAL resolution —
  // exceptions first, then suffix depth descending over exact rules
  // and wildcard tails, then the last-two-labels fallback — with the
  // committed table held as per-depth SORTED arrays and each probe a
  // binary search, so the full PSL rides without a regex alternation
  // whose pattern grows with the table.
  private val portAnyP = Pattern.compile(":[0-9]+$")

  /** Probe tables built from an arbitrary rule set — parameterized so
    * the spec can pin resolution semantics (exact+wildcard coexistence,
    * exception precedence) on tables the committed list doesn't happen
    * to contain; the production instance below is built once from
    * [[graft.ops.PublicSuffixes]].
    */
  private[graft] def buildLevels(exact: Seq[String], tails: Seq[String],
      exceptions: Seq[String])
      : (Array[(Int, Array[String])], Array[(Int, Array[String], Array[String])]) = {
    import graft.ops.PublicSuffixes.depth
    val exc = exceptions.groupBy(depth).toArray.sortBy(-_._1)
      .map { case (d, xs) => (d, xs.sorted.toArray) }
    // suffix depth s -> (sorted exact rules of depth s, sorted wildcard
    // tails of depth s-1), depth descending, empty levels dropped. An
    // exact rule and a wildcard tail MAY name the same suffix (legal
    // upstream): they land at DIFFERENT levels (tail X serves suffix
    // depth d+1, exact X depth d), so the descending walk resolves the
    // coexistence longest-match-first — upstream's prevailing-rule order
    val maxDepth = ((exact.map(depth) ++ tails.map(depth(_) + 1)) :+ 2).max
    val ex = exact.groupBy(depth)
    val wc = tails.groupBy(depth)
    val suf = (maxDepth to 2 by -1).toArray
      .map(s => (s, ex.getOrElse(s, Nil).sorted.toArray,
        wc.getOrElse(s - 1, Nil).sorted.toArray))
      .filter(l => l._2.nonEmpty || l._3.nonEmpty)
    (exc, suf)
  }

  private val (excLevels, sufLevels) = buildLevels(
    graft.ops.PublicSuffixes.exact,
    graft.ops.PublicSuffixes.wildcardTails,
    graft.ops.PublicSuffixes.exceptions)

  private def bsearch(a: Array[String], key: String): Boolean = {
    var lo = 0
    var hi = a.length - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val c = a(mid).compareTo(key)
      if (c == 0) return true
      if (c < 0) lo = mid + 1 else hi = mid - 1
    }
    false
  }

  /** Start index of the last `k` labels of `hp`, mirroring the
    * declarative `regexp_extract(hp, '([^.]+(?:\.[^.]+){k-1})$', 1)`
    * contract exactly: -1 when the host has fewer than k labels or
    * any of the last k is empty (the regex would not match).
    */
  private def lastKStart(hp: String, k: Int): Int = {
    var pos = hp.length // exclusive end of the label being scanned
    var start = -1
    var i = 0
    while (i < k) {
      if (pos <= 0) return -1
      val dot = hp.lastIndexOf('.', pos - 1)
      start = dot + 1
      if (start == pos) return -1 // empty label
      i += 1
      pos = dot
    }
    start
  }

  /** Full-PSL registrable-domain resolution on a port-stripped host. */
  private def registrable(hp: String): String =
    registrableWith(hp, excLevels, sufLevels)

  private[graft] def registrableWith(hp: String,
      excLevels: Array[(Int, Array[String])],
      sufLevels: Array[(Int, Array[String], Array[String])]): String = {
    var li = 0
    while (li < excLevels.length) {
      val (d, names) = excLevels(li)
      val st = lastKStart(hp, d)
      if (st >= 0) {
        val cand = hp.substring(st)
        if (bsearch(names, cand)) return cand
      }
      li += 1
    }
    li = 0
    while (li < sufLevels.length) {
      val (s, ex, tails) = sufLevels(li)
      val regSt = lastKStart(hp, s + 1)
      if (regSt >= 0) {
        // a valid (s+1)-label extraction implies valid s and s-1 ones
        val hit =
          (ex.length > 0 && bsearch(ex, hp.substring(lastKStart(hp, s)))) ||
            (tails.length > 0 && bsearch(tails, hp.substring(lastKStart(hp, s - 1))))
        if (hit) return hp.substring(regSt)
      }
      li += 1
    }
    val fSt = lastKStart(hp, 2)
    if (fSt >= 0) hp.substring(fSt) else ""
  }

  def domain(u8: UTF8String): UTF8String = {
    val (canonHost, _) = partsOf(u8.toString)
    val hp = portAnyP.matcher(canonHost).replaceAll("")
    UTF8String.fromString(registrable(hp))
  }
}
