package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins.
  *
  * A hash-partitioned join sends every row of one key to one reducer; a
  * hot key (the empty-string document, the null user, the bot account
  * that is 5% of a 100 TB event log) turns that reducer into the
  * straggler that dominates the stage. AQE's skew-join split handles
  * sort-merge cases at runtime; explicit salting is the deterministic,
  * planner-independent fallback — and the only option when the skewed
  * side feeds a stateful/streaming join where AQE can't re-plan.
  */
object Skew {

  /** Salted equi-join: `left` (skewed on `key`) × `right` (too big to
    * broadcast, small enough to replicate `salt`×).
    *
    * Each left row gets ONE salt value in [0, salt); the right side is
    * replicated once per salt value. The join key becomes (key, salt),
    * splitting a hot key's rows over `salt` reducers; every (l, r) match
    * survives exactly once, so the result set is identical to the
    * unsalted inner/left join — verified against the plain-join DuckDB
    * oracle in the `skew_salted_join` query.
    *
    * The salt is `pmod(hash(key, monotonically_increasing_id), salt)` —
    * uniform across a hot key's rows (the id varies per row) and cheap;
    * correctness does not depend on which salt a row draws.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 salt: Int, joinType: String = "inner"): DataFrame = {
    require(salt > 0, s"salt factor must be positive, got $salt")
    // the right side is replicated salt×, so only join types that never
    // emit unmatched RIGHT rows are result-equivalent to the unsalted
    // join — right/full outer would emit each unmatched right row salt
    // times
    val okTypes = Set("inner", "cross", "left", "left_outer", "leftouter",
      "left_semi", "leftsemi", "semi", "left_anti", "leftanti", "anti")
    require(okTypes.contains(joinType.toLowerCase.replace(" ", "_")),
      s"saltedJoin is only result-equivalent for $okTypes join types, got $joinType")
    val l = left.withColumn("__salt",
      pmod(hash(col(key), monotonically_increasing_id()), lit(salt)))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    l.join(r, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
