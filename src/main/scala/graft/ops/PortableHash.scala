package graft.ops

/** Engine-portable deterministic hashing: the same polynomial-hash
  * arithmetic expressed as a Spark SQL fragment and a DuckDB SQL fragment,
  * so every hash-derived operator (minhash, simhash, LSH buckets,
  * fingerprints) is checkable by the driver's DuckDB oracle.
  *
  * Spark's native `hash()`/`xxhash64()` are murmur3/xxhash with Spark-
  * specific seeding — fast but unreproducible elsewhere. These polynomial
  * hashes cost a few codegen'd long ops per byte; for shingle-sized
  * strings the parquet scan, not the hash, dominates at 100 TB. All
  * fragments use only Catalyst higher-order array functions — no UDFs, no
  * driver round-trips — so they pipeline like built-in projections.
  *
  * The fold runs over the string's UTF-8 BYTES (via `hex(encode(s,
  * 'utf-8'))` digit pairs), identically in both engines — so non-ASCII
  * text (multilingual training data) hashes losslessly and consistently.
  * (Spark's `ascii()` maps every non-ASCII char to '?'; DuckDB's
  * `unicode()` gives the codepoint — byte-level folding sidesteps both.)
  *
  * Both `aggregate` (Spark) and `list_reduce` (DuckDB) are guaranteed
  * left folds, so results match bit-for-bit.
  */
object PortableHash {
  /** Modulus: large prime; keeps every intermediate < 2^40 (no BIGINT
    * overflow in either engine).
    */
  val P: Long = 1000000007L

  private val HEX = "0123456789ABCDEF"

  /** fold(utf8_bytes(s), 7, (acc,b) -> (acc*31+b) % P) — Spark dialect.
    * Empty string folds to the seed 7 (sequence(1,0) in Spark is the
    * DESCENDING [1,0], so the empty case must be guarded explicitly to
    * keep the DuckDB twin's empty-list semantics).
    */
  def sparkStringHash(s: String): String = {
    val h = s"hex(encode($s, 'utf-8'))"
    val byteAt = s"cast(16 * (locate(substr($h, 2*i-1, 1), '$HEX') - 1) + " +
      s"(locate(substr($h, 2*i, 1), '$HEX') - 1) AS BIGINT)"
    s"IF(length($s) = 0, cast(7 AS BIGINT), " +
      s"aggregate(transform(sequence(1, cast(length($h) AS INT) div 2), i -> $byteAt), " +
      s"cast(7 AS BIGINT), (acc, c) -> (acc * 31 + c) % $P))"
  }

  /** Same byte fold — DuckDB dialect (generate_series(1,0) is empty, so
    * no empty-string guard is needed; the fold degenerates to the seed).
    */
  def duckStringHash(s: String): String = {
    val h = s"hex(encode($s))"
    val byteAt = s"(16 * (strpos('$HEX', substr($h, 2*i-1, 1)) - 1) + " +
      s"(strpos('$HEX', substr($h, 2*i, 1)) - 1))::BIGINT"
    s"list_reduce(list_prepend(7::BIGINT, " +
      s"list_transform(generate_series(1, length($h) // 2), i -> $byteAt)), " +
      s"(a, b) -> (a * 31 + b) % $P)"
  }

  /** JVM reference implementation of the same fold — for unit tests. */
  def jvmStringHash(s: String): Long =
    s.getBytes("UTF-8").foldLeft(7L)((acc, b) => (acc * 31 + (b & 0xff)) % P)

  /** i-th universal hash of a base hash value: (a_i*h + b_i) % P.
    * Pure arithmetic — dialect-independent.
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
