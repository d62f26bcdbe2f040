package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{BloomExpressions, VectorFunctions}

/** Bloom-prefiltered semi/anti joins — EXACT results, sketch-sized
  * left-side traffic.
  *
  * A plain `left_semi`/`left_anti` join shuffles the entire fact side on
  * the join key. At 100 TB that shuffle dwarfs everything else, yet most
  * rows' membership is decidable from a sketch of the (small) key set:
  *
  *  - SEMI: `might_contain = false` ⇒ definitely not a member ⇒ drop
  *    BEFORE any exchange. Survivors (true members + the fpp sliver of
  *    false positives) go through the exact semi join, which removes the
  *    false positives — the result is bit-identical to the plain join,
  *    but the exchange carries |matches| + fpp·|big| rows, not |big|.
  *  - ANTI: `might_contain = false` ⇒ definitely clean ⇒ emit with NO
  *    join at all (bloom filters have no false negatives). Only the
  *    maybe-members take the exact anti join to clear false positives.
  *
  * The sketch is built DISTRIBUTED (`DataFrame.stat.bloomFilter` is a
  * treeAggregate: executors build partial filters, the driver ORs
  * sketch-sized bitsets) and ships back inside the probe expression via
  * the task-binary broadcast — see [[graft.functions.BloomMightContain]].
  *
  * Relationship to Spark's runtime filters: AQE can inject the same
  * bloom prefilter into an equi-join on its own
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`), subject to
  * size/selectivity heuristics. The explicit operator exists for the
  * cases the heuristic can't reach — non-equi membership probes (array
  * elements, see [[Decontaminate.cleanDocsBloom]]), caller-controlled
  * fpp/size, and sketch reuse across several queries.
  *
  * Null keys: a null never equals anything, so the plain semi join drops
  * null-key rows and the plain anti join KEEPS them; both wrappers
  * reproduce that (the probe yields null for null input — coalesce picks
  * the branch the exact join would have picked).
  */
object BloomJoin {

  /** Distributed bloom sketch of `small.keyCol`, serialized. `expected`
    * oversized is benign (lower fpp); undersized raises fpp — never
    * correctness, because both join wrappers clear false positives
    * exactly.
    *
    * A ZERO-ROW input crashes Spark's `stat.bloomFilter` (the merge
    * buffer is never initialized — found by the r15 differential sweep
    * via an all-unsegmented benchmark with no shingles at all), so it
    * maps to an explicit EMPTY filter: every probe answers false,
    * which is exactly "nothing is a member". The isEmpty pre-check is
    * one short job over `small`, which is metadata-sized by every
    * caller's contract (benchmark shingle sets, join build sides).
    */
  def sketchOf(small: DataFrame, keyCol: String,
               expected: Long, fpp: Double = 0.01): Array[Byte] =
    BloomExpressions.serialize(
      if (small.isEmpty)
        org.apache.spark.util.sketch.BloomFilter.create(math.max(expected, 1L), fpp)
      else small.stat.bloomFilter(keyCol, expected, fpp))

  /** SQL fragment probing a serialized sketch (hex-embedded; the plan
    * broadcast ships it once per executor).
    */
  def containsSql(sketch: Array[Byte], keyExpr: String): String =
    s"graft_bloom_contains(unhex('${toHex(sketch)}'), $keyExpr)"

  def anySql(sketch: Array[Byte], arrayExpr: String): String =
    s"graft_bloom_any(unhex('${toHex(sketch)}'), $arrayExpr)"

  private def toHex(b: Array[Byte]): String = {
    val sb = new StringBuilder(b.length * 2)
    b.foreach(x => sb.append(f"${x & 0xff}%02X"))
    sb.toString
  }

  /** `big ⋉ small` on `bigKey = smallKey` — result equals the plain
    * left-semi join; the exchange sees only bloom survivors.
    */
  def semiJoin(big: DataFrame, small: DataFrame, bigKey: String, smallKey: String,
               expected: Long, fpp: Double = 0.01): DataFrame = {
    val keys = small.select(col(smallKey)).where(col(smallKey).isNotNull)
    val probe = containsSql(sketchOf(keys, smallKey, expected, fpp), bigKey)
    val pre = VectorFunctions.attach(big)
      .where(coalesce(expr(probe), lit(false))) // null key never joins in semi
    pre.join(keys, pre(bigKey) === keys(smallKey), "left_semi")
  }

  /** `big ▷ small` on `bigKey = smallKey` — result equals the plain
    * left-anti join; only maybe-members reach the exact join. The two
    * branches are two passes over `big`'s (pruned) columns — at scale a
    * second scan is far cheaper than shuffling the full side; callers
    * with an already-materialized `big` pay nothing extra.
    */
  def antiJoin(big: DataFrame, small: DataFrame, bigKey: String, smallKey: String,
               expected: Long, fpp: Double = 0.01): DataFrame = {
    val keys = small.select(col(smallKey)).where(col(smallKey).isNotNull)
    val probe = containsSql(sketchOf(keys, smallKey, expected, fpp), bigKey)
    val attached = VectorFunctions.attach(big)
    // null probe (null key) ⇒ plain anti join would KEEP the row ⇒ clean
    val clean = attached.where(!coalesce(expr(probe), lit(false)))
    val maybe = attached.where(coalesce(expr(probe), lit(false)))
    clean.unionAll(maybe.join(keys, maybe(bigKey) === keys(smallKey), "left_anti"))
  }
}
