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

  /** STREAMING attribution: two live event streams joined on a time
    * interval — each left row matches right rows whose event time falls
    * in [left.ts, left.ts + windowMs].
    *
    * Structured Streaming REFUSES a stream-stream join without an
    * equality predicate (state matching would be all-pairs), so the
    * range condition alone — the batch theta form — is not plannable.
    * The same time-grain bucket that de-quadratifies the batch join
    * ([[pointInInterval]]) is the equality key here: the left side
    * explodes into the (two, at grain = window) buckets its window
    * covers, the right side maps to its single bucket, and the join is
    * bucket-equality AND the exact range. Watermarks on both event-time
    * columns bound how long rows wait in state for late matches, so
    * state stays finite.
    *
    * The batch [[pointInInterval]] is the backfill analog over the same
    * semantics (intervals = [l.ts, l.ts+window]); use the batch form for
    * history, this for the live tail.
    */
  def streamAttribution(left: DataFrame, right: DataFrame,
                        leftTs: String, rightTs: String,
                        windowMs: Long, delay: String): DataFrame = {
    val l = left.withWatermark(leftTs, delay)
      .withColumn("__b", explode(expr(
        s"sequence(unix_millis($leftTs) div $windowMs, " +
          s"(unix_millis($leftTs) + $windowMs) div $windowMs)")))
    val r = right.withWatermark(rightTs, delay)
      .withColumn("__b", expr(s"unix_millis($rightTs) div $windowMs"))
    l.join(r,
        l("__b") === r("__b") &&
          col(rightTs) >= col(leftTs) &&
          col(rightTs) <= col(leftTs) + expr(s"INTERVAL $windowMs MILLISECONDS"))
      .drop("__b")
  }
}
