package graft

import org.apache.spark.sql.functions._

import graft.ops.IntervalJoin

/** Bucketed point-in-interval join: equality with the theta join across
  * every boundary class, at a grain that forces multi-bucket intervals.
  */
class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def points = Seq(
    (1L, 0L), (2L, 99L), (3L, 100L), (4L, 250L), (5L, 999L),
    (6L, 1000L), (7L, 2500L), (8L, 5000L)
  ).toDF("p_id", "ms")

  private def intervals = Seq(
    (10L, 0L, 99L),      // single bucket at grain 100
    (11L, 50L, 1050L),   // spans 11 buckets
    (12L, 250L, 250L),   // zero-length, matches exactly point 4
    (13L, 3000L, 2000L), // end < start: matches nothing
    (14L, 4900L, 5000L)  // boundary-inclusive on both ends
  ).toDF("iv_id", "s_ms", "e_ms")

  private def thetaPairs = points.join(intervals,
      $"ms" >= $"s_ms" && $"ms" <= $"e_ms")
    .select($"p_id", $"iv_id").as[(Long, Long)].collect().sorted

  test("bucketed join equals the theta join at several grains") {
    for (grain <- Seq(1L, 100L, 1000L, 10000L)) {
      val got = IntervalJoin.pointInInterval(points, intervals,
          "ms", "s_ms", "e_ms", grainMs = grain)
        .select($"p_id", $"iv_id").as[(Long, Long)].collect().sorted
      assert(got.sameElements(thetaPairs), s"mismatch at grain=$grain")
    }
    // the fixture is non-vacuous: multi-bucket, zero-length, inverted,
    // and boundary intervals all contribute
    assert(thetaPairs.map(_._2).distinct.sorted.sameElements(Array(10L, 11L, 12L, 14L)))
  }

  test("each true pair is produced exactly once (no dedup pass needed)") {
    val got = IntervalJoin.pointInInterval(points, intervals,
        "ms", "s_ms", "e_ms", grainMs = 100L)
      .select($"p_id", $"iv_id").as[(Long, Long)].collect()
    assert(got.length == got.distinct.length, "a point lives in one bucket")
  }

  test("the join is an equi join on the bucket, not a nested loop") {
    val q = IntervalJoin.pointInInterval(points, intervals,
      "ms", "s_ms", "e_ms", grainMs = 100L)
    val p = q.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"bucketed form must plan as an equi join:\n$p")
  }
}
