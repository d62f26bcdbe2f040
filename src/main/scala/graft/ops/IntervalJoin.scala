package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval join WITHOUT an equi key — attribution windows,
  * maintenance windows, validity ranges.
  *
  * Spark has no range-join optimization: `p JOIN iv ON p.t BETWEEN iv.s
  * AND iv.e` plans as a broadcast-nested-loop (or worse, a cartesian) —
  * every (point, interval) pair is tested, Θ(|P|·|I|), which is the end
  * of the road when both sides are large. Bucketing by a time grain
  * turns it into an equi join: each interval explodes into the grain
  * buckets it covers, each point maps to exactly ONE bucket, the join
  * runs on the bucket key, and the exact containment predicate filters
  * within the bucket. Because a point has one bucket, every true
  * (point, interval) pair is produced exactly once — no dedup pass.
  *
  * Cost: the interval side inflates by (duration/grain + 1) rows; the
  * per-bucket work is |points in bucket| × |intervals covering bucket|.
  * Pick `grainMs` near the typical interval length: shorter grains
  * shrink per-bucket cross products but replicate long intervals more.
  * A hot bucket (event spike) is ordinary equi-join skew — AQE's skew
  * split or a finer grain both apply.
  *
  * Intervals with `end < start` match nothing (same as the theta join)
  * and are dropped BEFORE the explode — Spark's `sequence(a, b)` with
  * b < a counts DOWN rather than returning empty, so the guard is
  * correctness-critical, not just hygiene.
  */
object IntervalJoin {

  /** `points` with long-millis column `ptMs` × `intervals` with
    * long-millis `[startMs, endMs]` (inclusive both ends, matching
    * BETWEEN). Result = the theta join's rows exactly, minus the `__b`
    * plumbing column.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      ptMs: String, startMs: String, endMs: String,
                      grainMs: Long): DataFrame = {
    require(grainMs > 0, s"grainMs must be positive, got $grainMs")
    val p = points.withColumn("__b", expr(s"$ptMs div $grainMs"))
    val iv = intervals
      .where(col(endMs) >= col(startMs))
      .withColumn("__b",
        explode(expr(s"sequence($startMs div $grainMs, $endMs div $grainMs)")))
    p.join(iv, Seq("__b"))
      .where(col(ptMs) >= col(startMs) && col(ptMs) <= col(endMs))
      .drop("__b")
  }
}
