package graft

import graft.ops.{Eval, Events}
import org.apache.spark.sql.functions._

/** Pins the contracts of [[graft.ops.Events]] (funnel strictness,
  * retention cohort arithmetic) and [[graft.ops.Eval]] (recall bounds
  * and nprobe monotonicity, exact centroids) on fixtures the sf testdata
  * cannot produce: out-of-order funnels, equal-timestamp steps, and
  * hand-computable centroids.
  */
class EventsEvalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  // user 1 completes signup -> view -> click in order; the purchase
  //   happens BEFORE the click, so it must not count (strict order).
  // user 2 has view before signup (out of order: only signup counts)
  //   and a view at EXACTLY the signup timestamp (strictly-after rule:
  //   must not advance the funnel).
  // user 3 never signs up: zero steps even though they view and click.
  private lazy val events = Seq(
    (1L, ts("2024-01-01 10:00:00"), "signup"),
    (1L, ts("2024-01-01 10:05:00"), "view"),
    (1L, ts("2024-01-01 10:06:00"), "purchase"), // before click: ignored
    (1L, ts("2024-01-01 10:07:00"), "click"),
    (2L, ts("2024-01-01 09:00:00"), "view"),     // before signup: ignored
    (2L, ts("2024-01-01 09:30:00"), "signup"),
    (2L, ts("2024-01-01 09:30:00"), "view"),     // same ts: NOT strictly after
    (3L, ts("2024-01-01 08:00:00"), "view"),
    (3L, ts("2024-01-01 08:01:00"), "click")
  ).toDF("user_id", "ts", "event_type")

  private val steps = Seq("signup", "view", "click", "purchase")

  test("funnel: strict ordering — later steps only count strictly after earlier ones") {
    val got = Events.funnel(events, "user_id", "ts", "event_type", steps)
      .select($"user_id", $"steps_completed",
        $"step1_ms".isNotNull, $"step2_ms".isNotNull,
        $"step3_ms".isNotNull, $"step4_ms".isNotNull)
      .as[(Long, Long, Boolean, Boolean, Boolean, Boolean)]
      .collect().sortBy(_._1).toSeq
    assert(got === Seq(
      (1L, 3L, true, true, true, false), // purchase-before-click ignored
      (2L, 1L, true, false, false, false), // equal-ts view does not advance
      (3L, 0L, false, false, false, false))) // no signup: nothing counts
  }

  test("funnel: step timestamps are the FIRST valid completion") {
    val row = Events.funnel(events, "user_id", "ts", "event_type", steps)
      .where($"user_id" === 1L).select($"step2_ms").as[Long].head()
    assert(row == ts("2024-01-01 10:05:00").getTime)
  }

  test("funnel plan: one exchange and one key-sort shared by all step windows") {
    val p = Events.funnel(events, "user_id", "ts", "event_type", steps)
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllMatchIn(p).length == 1,
      s"window chain + groupBy must share ONE user-key exchange:\n$p")
    assert("Sort ".r.findAllMatchIn(p).length == 1,
      s"all step windows must reuse one partition-key sort:\n$p")
    assert("partial_min".r.findAllMatchIn(p).length >= 1,
      s"the per-user grain must partial-aggregate:\n$p")
  }

  test("funnelStreaming: two in-order batches converge to the batch funnel") {
    implicit val sq = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val us = events.select($"user_id", unix_micros($"ts"), $"event_type")
      .as[(Long, Long, String)].collect().sortBy(e => (e._1, e._2))
    val (batch1, batch2) = us.splitAt(us.length / 2)
    val stream = MemoryStream[(Long, Long, String)]
    val q = Events.funnelStreaming(stream.toDS(), steps)
      .writeStream.format("memory").queryName("funnel_stream")
      .outputMode("update").start()
    try {
      stream.addData(batch1.toIndexedSeq); q.processAllAvailable()
      stream.addData(batch2.toIndexedSeq); q.processAllAvailable()
      // update sink: funnel state is monotone, so the max emitted
      // steps_completed per user IS its final state (last() would
      // depend on row order the memory sink doesn't guarantee)
      val got = spark.table("funnel_stream")
        .groupBy($"user_id").agg(max($"steps_completed").as("c"))
        .as[(Long, Long)].collect().toMap
      val want = Events.funnel(events, "user_id", "ts", "event_type", steps)
        .select($"user_id", $"steps_completed").as[(Long, Long)].collect().toMap
      assert(got === want, "streaming state must converge to the batch funnel")
    } finally q.stop()
  }

  test("retention: cohorts by first epoch-week, offsets count active users") {
    // epoch-week arithmetic: 2024-01-01 is day 19723 -> week 2817;
    // 2024-01-08 week 2818; 2024-01-15 week 2819.
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-08 10:00:00")),
      (1L, ts("2024-01-15 10:00:00")),
      (2L, ts("2024-01-01 12:00:00")), (2L, ts("2024-01-15 12:00:00")),
      (3L, ts("2024-01-08 09:00:00"))
    ).toDF("user_id", "ts")
    val got = Events.retention(ev, "user_id", "ts")
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got === Seq(
      (2817L, 0L, 2L), (2817L, 1L, 1L), (2817L, 2L, 2L),
      (2818L, 0L, 1L)))
  }

  // deterministic synthetic vectors: 40 corpus vectors in 8 dims
  private lazy val vecs = (0L until 40L).map { i =>
    (i, Array.tabulate(8)(d => (((i * 31 + d * 17) % 13).toFloat - 6f) / 6f))
  }.toDF("vec_id", "embedding")

  test("annRecallAtK: bounds hold and recall is monotone in nprobe") {
    def recalls(nprobe: Int): Map[Long, Double] =
      Eval.annRecallAtK(vecs, vecs.where($"vec_id" < 5), "vec_id", "embedding",
          k = 3, bits = 4, nprobe = nprobe)
        .select($"q_id", $"recall").as[(Long, Double)].collect().toMap
    val r1 = recalls(1)
    val r3 = recalls(3)
    assert(r1.keySet === (0L until 5L).toSet, "one row per query, always")
    assert(r1.values.forall(r => r >= 0.0 && r <= 1.0))
    assert((0L until 5L).forall(q => r3(q) >= r1(q)),
      s"more probes can only add true neighbors: r1=$r1 r3=$r3")
  }

  test("ivfRecallAtK: one row per query, recall bounded, probing all clusters is exact") {
    val r = Eval.ivfRecallAtK(vecs, "vec_id", "embedding", k = 3,
        nCentroids = 4, iters = 1, nprobe = 4, queryPred = $"v_id" < 5)
      .select($"q_id", $"recall").as[(Long, Double)].collect().toMap
    assert(r.keySet === (0L until 5L).toSet)
    assert(r.values.forall(v => v >= 0.0 && v <= 1.0))
    // nprobe == nCentroids searches every cluster => the full corpus =>
    // recall must be exactly 1 for every query
    assert(r.values.forall(_ == 1.0), s"all-cluster probe must be exact: $r")
  }

  test("dedupRecall: planted copies collapse, clean base stays unmerged") {
    // 20 long distinct docs — suffix copies sit at Jaccard ~0.9 and the
    // 4x4 banding must recall essentially all of them
    val docs = (0L until 20L).map(i =>
      (i, (0 until 40).map(w => s"w${i}_$w").mkString(" ")))
      .toDF("doc_id", "text")
    val r = Eval.dedupRecall(docs, "doc_id", "text", nPlant = 20)
      .as[(Long, Long, Long, Long, Long)].collect().head
    val (nPlanted, nRecalled, nBase, nBaseMerged, recallMilli) = r
    assert(nPlanted === 20L && nBase === 20L)
    assert(nRecalled === 20L, "every planted near-copy must collapse")
    assert(recallMilli === 1000L)
    assert(nBaseMerged === 0L, "fully-distinct base docs must not merge")
  }

  test("labelCentroids: exact mean per dimension and class sizes") {
    val df = Seq(
      (0, Array(1.0f, 2.0f)), (0, Array(3.0f, 4.0f)),
      (1, Array(10.0f, 20.0f))
    ).toDF("label", "embedding")
    val got = Eval.labelCentroids(df, "label", "embedding")
      .as[(Int, Long, Seq[Double])].collect().sortBy(_._1).toSeq
    assert(got === Seq(
      (0, 2L, Seq(2.0, 3.0)),
      (1, 1L, Seq(10.0, 20.0))))
  }

  test("centroidDrift: per-label cosine between sides; one-sided labels report NULL") {
    val df = Seq(
      // label 0: identical centroids -> cos 1
      ("ref", 0, Array(1.0f, 0.0f)), ("cur", 0, Array(1.0f, 0.0f)),
      // label 1: orthogonal centroids -> cos 0
      ("ref", 1, Array(1.0f, 0.0f)), ("ref", 1, Array(1.0f, 0.0f)),
      ("cur", 1, Array(0.0f, 1.0f)),
      // label 2: only on the reference side -> NULL cosine
      ("ref", 2, Array(0.5f, 0.5f)),
      // label 3: zero-vector centroid on one side -> cos 0 (the
      // engine-wide zero-magnitude convention, not NaN/NULL)
      ("ref", 3, Array(0.0f, 0.0f)), ("cur", 3, Array(1.0f, 1.0f)))
      .toDF("side", "label", "embedding")
    val rows = graft.ops.Eval.centroidDrift(df, "side", "ref",
      "label", "embedding")
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) null else r.getDouble(3))).toMap
    assert(rows(0) === ((1L, 1L, 1.0)))
    assert(rows(1) === ((2L, 1L, 0.0)))
    assert(rows(2) === ((1L, 0L, null)), "vanished class: counts, NULL cos")
    assert(rows(3) === ((1L, 1L, 0.0)), "zero-magnitude centroid reads 0")
  }
}
