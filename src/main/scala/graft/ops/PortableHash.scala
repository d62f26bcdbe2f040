package graft.ops

/** Engine-portable deterministic hashing: the same polynomial-hash
  * arithmetic expressed as a Spark SQL fragment and a DuckDB SQL fragment,
  * so every hash-derived operator (minhash, simhash, LSH buckets,
  * fingerprints) is checkable by the driver's DuckDB oracle.
  *
  * Spark's native `hash()`/`xxhash64()` are murmur3/xxhash with Spark-
  * specific seeding — fast but unreproducible elsewhere. These polynomial
  * hashes cost a few codegen'd long ops per character; for shingle-sized
  * strings the parquet scan, not the hash, dominates at 100 TB. All
  * fragments use only Catalyst higher-order array functions — no UDFs, no
  * driver round-trips — so they pipeline like built-in projections.
  *
  * Both `aggregate` (Spark) and `list_reduce` (DuckDB) are guaranteed
  * left folds, so results match bit-for-bit.
  */
object PortableHash {
  /** Modulus: large prime; keeps every intermediate < 2^40 (no BIGINT
    * overflow in either engine).
    */
  val P: Long = 1000000007L

  /** fold(codepoints(s), 7, (acc,c) -> (acc*31+c) % P) — Spark dialect. */
  def sparkStringHash(s: String): String =
    s"aggregate(transform(regexp_extract_all($s, '.', 0), c -> cast(ascii(c) AS BIGINT)), " +
      s"cast(7 AS BIGINT), (acc, c) -> (acc * 31 + c) % $P)"

  /** Same fold — DuckDB dialect. */
  def duckStringHash(s: String): String =
    s"list_reduce(list_prepend(7::BIGINT, list_transform(regexp_extract_all($s, '.'), " +
      s"c -> unicode(c)::BIGINT)), (a, b) -> (a * 31 + b) % $P)"

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
