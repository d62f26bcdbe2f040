package graft

import graft.ops.Stats
import org.apache.spark.sql.functions._

/** Pins [[graft.ops.Stats]] edge cases the sf testdata cannot produce:
  * percentile rank selection at exact boundaries, histogram edge
  * clamping, and the zero-variance z-score guard.
  */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("percentilesDisc: rank ceil(p*n) picks actual data values") {
    // group a: values 1..10 -> p50 = v@ceil(5.0)=5, p90 = v@9, p100 = v@10
    val df = (1 to 10).map(i => ("a", i.toDouble, i.toLong)).toDF("g", "v", "id")
    val got = Stats.percentilesDisc(df, "g", "v", "id", Seq(0.5, 0.9, 1.0))
      .as[(String, Double, Double, Double)].head()
    assert(got === (("a", 5.0, 9.0, 10.0)))
  }

  test("percentilesDisc: single-element group returns it for every p") {
    val df = Seq(("b", 7.0, 1L)).toDF("g", "v", "id")
    val got = Stats.percentilesDisc(df, "g", "v", "id", Seq(0.5, 0.99))
      .as[(String, Double, Double)].head()
    assert(got === (("b", 7.0, 7.0)))
  }

  test("percentiles plan: one exchange, one sort shared by both windows") {
    val df = (1 to 10).map(i => ("a", i.toDouble, i.toLong)).toDF("g", "v", "id")
    val p = Stats.percentilesDisc(df, "g", "v", "id", Seq(0.5))
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllMatchIn(p).length == 1, s"one keyed exchange:\n$p")
    assert("Sort ".r.findAllMatchIn(p).length == 1, s"one shared sort:\n$p")
  }

  test("histogram: out-of-range values clamp into edge bins, none dropped") {
    val df = Seq(-5.0, 0.0, 0.5, 9.99, 10.0, 25.0).toDF("v")
    val got = Stats.histogram(df, "v", lo = 0.0, hi = 10.0, nBins = 2)
      .select($"bin", $"n", $"bin_lo", $"bin_hi")
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1).toSeq
    // bin 0 [0,5): -5 (clamped), 0, 0.5 ; bin 1 [5,10): 9.99, 10 (clamped), 25 (clamped)
    assert(got === Seq((0L, 3L, 0.0, 5.0), (1L, 3L, 5.0, 10.0)))
    assert(got.map(_._2).sum == 6L, "every input row lands in a bin")
  }

  test("percentilesDiscPreagg: agrees with the row-sort form on duplicate-heavy data") {
    // heavy duplication + a rank boundary landing inside a duplicate run
    val rows = Seq.fill(7)(1.0) ++ Seq.fill(5)(2.0) ++ Seq.fill(3)(9.0) ++ Seq(40.0)
    val df = rows.zipWithIndex.map { case (v, i) => ("a", v, i.toLong) }
      .toDF("g", "v", "id")
    val ps = Seq(0.25, 0.5, 0.75, 0.95, 1.0)
    val viaSort = Stats.percentilesDisc(df, "g", "v", "id", ps).collect().head.toSeq
    val viaPreagg = Stats.percentilesDiscPreagg(df, "g", "v", ps).collect().head.toSeq
    assert(viaPreagg === viaSort)
  }

  test("zscoreOutliers: flags the spike, excludes zero-variance groups") {
    val df = (Seq.fill(20)(("a", 10.0)) :+ (("a", 1000.0))) ++ Seq.fill(5)(("b", 3.0))
    val got = Stats.zscoreOutliers(df.zipWithIndex.map { case ((g, v), i) => (g, v, i.toLong) }
        .toDF("g", "v", "id"), "g", "v", threshold = 3.0)
      .select($"g", $"v", $"z").as[(String, Double, Double)].collect().toSeq
    assert(got.map(r => (r._1, r._2)) === Seq(("a", 1000.0)),
      s"only the spike is >= 3 sigma (zero-variance group b must not divide by zero): $got")
    assert(got.head._3 > 4.0)
  }

  test("datacardApprox: estimate within 1.04/sqrt(m) of the exact card; empty corpus defined zeros") {
    // 3000 docs over 1200 distinct texts with >= 50 words each (the
    // gopher carry path needs real text); deterministic, so the
    // observed HLL error is a fixed number this test pins inside the
    // published standard-error band
    val docs = (0 until 3000).map { i =>
      val d = i % 1200
      (i.toLong, (1 to 55).map(w => s"tok${(d * 31 + w * 7) % 500}").mkString(" ") + s" doc$d")
    }.toDF("doc_id", "text")
    for (p <- Seq(6, 8)) {
      val card = graft.ops.Datacard.datacardApprox(docs, "doc_id", "text", p = p)
        .as[(String, Long)].collect().toMap
      val exact = graft.ops.Datacard.datacard(docs, "doc_id", "text")
        .as[(String, Long)].collect().toMap
      assert(exact("n_unique_texts") == 1200L)
      val est = card("n_unique_texts_est").toDouble
      val band = 1.04 / math.sqrt((1 << p).toDouble)
      assert(math.abs(est - 1200.0) / 1200.0 <= band,
        s"p=$p est=$est exact=1200 band=$band")
      assert(card("hll_p") == p.toLong)
      // shared metrics agree exactly with the exact card
      Seq("n_docs", "n_tokens", "n_chars", "lang_en_milli",
        "gopher_pass_milli", "mean_tokens_milli").foreach { k =>
        assert(card(k) == exact(k), s"p=$p metric $k diverged")
      }
    }
    // empty corpus: defined zeros (raw HLL on an empty sketch is alpha*m,
    // NOT zero - the n_docs guard must win)
    val empty = graft.ops.Datacard.datacardApprox(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), "doc_id", "text")
      .as[(String, Long)].collect().toMap
    assert(empty("n_unique_texts_est") == 0L && empty("dup_milli_est") == 0L)
    assert(empty("hll_n_zero_registers") == 64L)
    // plan-width guard: the folded 2^p-column shape refuses p > 10
    // (hllRegisters is the grouped shape for higher precisions)
    intercept[IllegalArgumentException] {
      graft.ops.Datacard.datacardApprox(docs, "doc_id", "text", p = 12)
    }
    intercept[IllegalArgumentException] {
      graft.ops.Datacard.datacardApproxSql("documents", "doc_id", "text", p = 12)
    }
  }

  test("distDrift: exact shares, NULL bin, edge clamping; TVD from the deltas") {
    import spark.implicits._
    // ref: values 5, 15, 15, 25 -> bins 0,1,1,2; cur: 15, 25, 25, 95,
    // NULL -> bins 1,2,2,9,-1; out-of-range 250 on ref clamps to bin 9
    val df = Seq(
      ("ref", Some(5.0)), ("ref", Some(15.0)), ("ref", Some(15.0)),
      ("ref", Some(25.0)), ("ref", Some(250.0)),
      ("cur", Some(15.0)), ("cur", Some(25.0)), ("cur", Some(25.0)),
      ("cur", Some(95.0)), ("cur", None))
      .toDF("side", "v")
    val m = graft.ops.Stats.distDrift(df, "side", "v", "ref",
      lo = 0.0, hi = 100.0, nBins = 10)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
      .toMap
    // ref total 5 (the clamped 250 counts), cur total 5 (NULL counts)
    assert(m(0L) === ((1L, 0L, 200L, 0L, 200L)))
    assert(m(1L) === ((2L, 1L, 400L, 200L, 200L)))
    assert(m(2L) === ((1L, 2L, 200L, 400L, 200L)))
    assert(m(9L) === ((1L, 1L, 200L, 200L, 0L)), "250 clamps into the top bin")
    assert(m(-1L) === ((0L, 1L, 0L, 200L, 200L)), "NULL values get their own bin")
    // TVD = sum(|delta|) div 2 = 800 div 2 = 400 milli, consumer-side
    assert(m.values.map(_._5).sum === 800L)

    // an empty current side: shares guard to 0 instead of ANSI-throwing
    val onlyRef = Seq(("ref", Some(5.0))).toDF("side", "v")
    val r = graft.ops.Stats.distDrift(onlyRef, "side", "v", "ref",
      0.0, 100.0, 10).collect().head
    assert(r.getLong(5) === 1000L && r.getLong(6) === 0L)
  }
}
