package graft

import graft.ops.Sessionize
import org.apache.spark.sql.functions._

/** Pins the one contract [[graft.ops.Sessionize]] cannot get from the
  * DuckDB oracle: that the gaps-and-islands batch form and the
  * `session_window` form agree on SESSION BOUNDARIES — including the
  * exact-gap edge (diff == gap EXTENDS the session in both; only
  * diff > gap breaks) — so the oracle-checked `session_agg` query and
  * the streaming-capable operator are the same semantics.
  */
class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(hm: (Int, Int)) =
    java.sql.Timestamp.valueOf(f"2024-01-01 ${hm._1}%02d:${hm._2}%02d:00")

  // user 1: 10:00, 10:10, 10:40, 11:20 with gap=30 -> 10:40 is EXACTLY
  //   30 min after 10:10: same session (boundary touch); 11:20 is 40 min
  //   after 10:40: new session.
  // user 2: 10:00, 10:29 -> one session (29 < 30).
  // user 3: single event -> its own session.
  private lazy val events = Seq(
    (1L, ts(10 -> 0), 101L, 1.0), (1L, ts(10 -> 10), 102L, 2.0),
    (1L, ts(10 -> 40), 103L, 4.0), (1L, ts(11 -> 20), 104L, 8.0),
    (2L, ts(10 -> 0), 201L, 1.5), (2L, ts(10 -> 29), 202L, 2.5),
    (3L, ts(10 -> 5), 301L, 9.0)
  ).toDF("user_id", "ts", "event_id", "value")

  test("gaps-and-islands: exact-gap boundary extends, strictly-greater breaks") {
    val got = Sessionize.sessions(events, "user_id", "ts", "event_id", "value")
      .orderBy($"user_id", $"session_no")
      .select($"user_id", $"session_no", $"n_events", $"sum_value")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got === Seq(
      (1L, 1L, 3L, 7.0), (1L, 2L, 1L, 8.0),
      (2L, 1L, 2L, 4.0),
      (3L, 1L, 1L, 9.0)))
  }

  test("session_window form emits the same (user, start, end, count, sum) set") {
    val batch = Sessionize.sessions(events, "user_id", "ts", "event_id", "value")
      .select($"user_id", $"start_ms", $"end_ms", $"n_events", $"sum_value")
    val sw = Sessionize.sessionsStreaming(events, "user_id", "ts", "value")
    assert(batch.except(sw).isEmpty && sw.except(batch).isEmpty,
      "gaps-and-islands and session_window must produce identical sessions")
  }

  test("session_window runs as a stream: sessions close and append on watermark") {
    implicit val sq = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val in = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val out = Sessionize.sessionsStreaming(
      in.toDF().toDF("user_id", "ts", "value")
        .withWatermark("ts", "1 hour"),
      "user_id", "ts", "value")
    val q = out.writeStream.format("memory").queryName("sess_stream")
      .outputMode("append").start()
    try {
      in.addData((1L, ts(10 -> 0), 1.0), (1L, ts(10 -> 10), 2.0), (1L, ts(10 -> 40), 4.0))
      q.processAllAvailable()
      // sentinel far ahead advances the watermark past user 1's session
      // end + gap, forcing its merged window-state to close and append
      in.addData((99L, ts(14 -> 0), 0.0))
      q.processAllAvailable()
      val rows = spark.table("sess_stream").where($"user_id" === 1L)
        .select($"n_events", $"sum_value").as[(Long, Double)].collect().toSeq
      assert(rows === Seq((3L, 7.0)),
        "the three boundary-touching events must close as ONE appended session")
    } finally q.stop()
  }
}
