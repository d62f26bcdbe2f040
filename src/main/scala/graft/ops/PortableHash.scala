package graft.ops

/** Engine-portable deterministic hashing: identical hash values from a
  * Spark SQL fragment and a DuckDB SQL fragment, so every hash-derived
  * operator (minhash, simhash, LSH buckets, fingerprints) is checkable by
  * the driver's DuckDB oracle.
  *
  * Spark's native `hash()`/`xxhash64()` are murmur3/xxhash with Spark-
  * specific seeding — fast but unreproducible elsewhere. `md5`, however,
  * is the same standard algorithm in both engines and hashes the string's
  * UTF-8 BYTES (so non-ASCII multilingual text is lossless and
  * consistent). The portable hash is therefore:
  *
  *   H(s) = bigint(first 15 hex digits of md5(s)) % P     (< P < 2^30)
  *
  * One native, codegen-friendly md5 call per value — crucially NOT a
  * per-byte SQL-lambda fold: Catalyst's higher-order functions
  * (`transform`/`aggregate`) are interpreted, so per-byte folds cost
  * O(bytes) interpreted expression evaluations each (measured ~2.5x the
  * whole remaining pipeline on sf0.1).
  *
  * The `% P` reduction keeps every subsequent universal-hash/fold
  * intermediate below 2^40 — no BIGINT overflow in either engine.
  */
object PortableHash {
  /** Modulus: large prime; hash values live in [0, P). */
  val P: Long = 1000000007L

  /** H(s) — Spark dialect. conv() parses the hex prefix to decimal. */
  def sparkStringHash(s: String): String =
    s"(cast(conv(substr(md5($s), 1, 15), 16, 10) AS BIGINT) % $P)"

  /** H(s) — DuckDB dialect ('0x…'::BIGINT parses hex). */
  def duckStringHash(s: String): String =
    s"(('0x' || substr(md5($s), 1, 15))::BIGINT % $P)"

  /** JVM reference implementation of H — for unit tests. */
  def jvmStringHash(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val hex = d.map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16) % P
  }

  /** Hash every string in an array expression. */
  def sparkHashArrayOf(xs: String): String =
    s"transform($xs, __s -> ${sparkStringHash("__s")})"

  def duckHashArrayOf(xs: String): String =
    s"list_transform($xs, __s -> ${duckStringHash("__s")})"

  /** SQL-level let-binding: evaluate `bound` ONCE and reference it many
    * times in `body`. Spark SQL has no LET; a single-element `transform`
    * gives one — the lambda variable is evaluated once and body references
    * are O(1) bound-variable reads. Without this, every reference to a
    * subexpression inside a lambda re-evaluates it per element (an
    * accidental O(n²) per row on split()/hex() chains).
    */
  def let1(varName: String, bound: String, body: String): String =
    s"element_at(transform(array($bound), $varName -> $body), 1)"

  /** Truncation toward zero of a numeric SQL expression, PORTABLE
    * across both engines AND Spark's parser (several specs replay
    * DuckDB twins through `spark.sql`): DuckDB's 1-arg `trunc()` does
    * it but Spark's `trunc` is date-only, and a bare `::BIGINT` /
    * `CAST` of a DOUBLE rounds half-even on DuckDB where Spark's cast
    * truncates (the round-18 ADVICE divergence: 0.7 → 0 on Spark, 1
    * on DuckDB). floor/ceil agree everywhere, so the sign CASE is the
    * portable truncation; integral inputs pass through exactly, NULL
    * propagates.
    */
  def truncToZero(x: String): String =
    s"CAST(CASE WHEN ($x) >= 0 THEN floor($x) ELSE ceil($x) END AS BIGINT)"

  /** ORACLE-PORTABLE ASCII-only lowercase (round 20) — the same
    * `translate` call parses and evaluates identically on both
    * engines, unlike full-Unicode `lower()`, which REALLY diverges:
    * Java (Spark) applies the SpecialCasing final-sigma rule
    * (`ΑΒΓΣ` → `αβγς`) where utf8proc (DuckDB) folds per-codepoint
    * (`αβγσ`), and Java lowers `İ` to `i`+U+0307 (two codepoints)
    * where DuckDB yields bare `i` — both probed this round. This is
    * the [[graft.functions.HashOps.normalizeText]] ASCII-fold stance
    * as a declarative fragment; non-ASCII case is deliberately left
    * untouched (a documented no-fold, not a divergence). Use this in
    * any HASHED column that lowercases text; full `lower()` is fine
    * only in fixtures that never feed Greek/dotted-I content.
    */
  def asciiLower(x: String): String =
    s"translate($x, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', " +
      "'abcdefghijklmnopqrstuvwxyz')"

  /** ROLLING token hash (round 14) — pure integer recurrence over the
    * token's CODEPOINTS, `h = fold(7, cp -> (h*31 + cp) % P)`, no md5.
    * This is the FINGERPRINT-DOMAIN hash of the winnow/containment
    * family, where hashes never leave the op (unlike backoff's H,
    * which keys broadcast reference tables and stays md5-based): it
    * removes the per-gram string build + md5 round-trip that dominated
    * `dedup_containment_cjk` (~6× codepoint-gram volume on the Han
    * third). Same-value implementations: the compiled kernel
    * ([[graft.functions.HashOps.tokenRollHash]]), the DuckDB fold
    * below (validated on ascii/han/empty/astral/combining classes),
    * and [[jvmTokenRoll]] for specs. Collision caveat: like H this
    * reduces mod P, but poly31 additionally has STRUCTURED collision
    * families md5 lacks (e.g. 2-char tokens "bA"/"a`" collide since
    * 31·'b'+'A' = 31·'a'+'`', and the final affine mix preserves any
    * pre-mix tie) — acceptable here because the fingerprints only
    * feed threshold-based winnow/containment scoring, never identity.
    */
  /** Final multiplicative mix of the token roll: a bare poly31 fold
    * leaves short tokens with systematically SMALL values (h ≈ 217 +
    * cp for a 1-char token, ~2^17 ≪ P), so winnowing's window-MINIMUM
    * selection would favor common short-token grams — observed as
    * +45% incidental cross-doc shared fingerprints on the fixture.
    * One Knuth multiply + offset mod P restores uniformity; products
    * stay < 2^62 (h < P < 2^30, A < 2^32) in both engines.
    */
  val rollMixA: Long = 2654435761L
  val rollMixB: Long = 40503L

  def duckTokenRoll(w: String): String =
    s"(list_reduce(list_prepend(7::BIGINT, " +
      s"list_transform(generate_series(1, len($w)), __j -> unicode(($w)[__j])::BIGINT)), " +
      s"(__a, __c) -> (__a * 31 + __c) % $P) * $rollMixA + $rollMixB) % $P"

  /** Rolling GRAM hashes over a bound token-hash array variable `th`:
    * per window the k-term fold `g = fold(7, h -> (g*31 + h) % P)`,
    * unrolled (k is a literal). Gram-less inputs yield the empty list
    * (generate_series(1, n<1) is empty in DuckDB).
    */
  def duckGramRollOf(th: String, k: Int): String = {
    val body = (0 until k).foldLeft("7::BIGINT") { (acc, j) =>
      s"(($acc * 31 + $th[__i + $j]) % $P)"
    }
    s"list_transform(generate_series(1, len($th) - ${k - 1}), __i -> $body)"
  }

  /** JVM reference of the rolling token hash — for unit tests. */
  def jvmTokenRoll(s: String): Long = {
    var h = 7L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 31 + cp) % P
      i += Character.charCount(cp)
    }
    (h * rollMixA + rollMixB) % P
  }

  /** i-th universal hash of a base hash value: (a_i*h + b_i) % P.
    * Pure arithmetic — dialect-independent (requires h < P).
    */
  def universal(i: Int, h: String): String =
    s"((${37L + 61L * i} * $h + ${101L + 97L * i}) % $P)"

  /** Left-fold combine of a list of hashes into one (order-sensitive
    * rolling hash): fold(hs, 7, (acc,h) -> (acc*31 + h) % P).
    */
  def sparkFoldHashes(hs: String): String =
    s"aggregate($hs, cast(7 AS BIGINT), (acc, h) -> (acc * 31 + h) % $P)"

  def duckFoldHashes(hs: String): String =
    s"list_reduce(list_prepend(7::BIGINT, $hs), (a, b) -> (a * 31 + b) % $P)"
}
