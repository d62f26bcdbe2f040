package graft

import graft.ops.Trajectory
import org.apache.spark.sql.functions._

/** Pins the RL trajectory analytics: the discounted-return recurrence
  * in integer milli (kernel vs the declarative floorDiv twin, signed
  * rounding included), episode stats, and the scaled-advantage
  * arithmetic.
  */
class TrajectorySpec extends SparkSpec {
  import spark.implicits._

  test("trajReturns: backward recurrence, hand-computed, negative rewards truncate") {
    // gamma = 0.9: G3 = 1000; G2 = -500 + trunc(900*1000/1000) = 400;
    // G1 = 2000 + trunc(900*400/1000) = 2360
    val df = Seq(
      (1L, 1L, 2000L), (1L, 2L, -500L), (1L, 3L, 1000L),
      // all-negative episode: G2 = -1000; G1 = -100 + trunc(-900000/1000)
      //                       = -100 - 900 = -1000
      (2L, 1L, -100L), (2L, 2L, -1000L))
      .toDF("traj", "step", "r")
    val g = Trajectory.trajReturns(df, "traj", "step", "r")
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(2)).toMap
    assert(g((1L, 1L)) === 2360L)
    assert(g((1L, 2L)) === 400L)
    assert(g((1L, 3L)) === 1000L)
    assert(g((2L, 1L)) === -1000L)
    assert(g((2L, 2L)) === -1000L)

    // TRUNCATE toward zero, not floor: G2 = -999 -> gamma*G2 = -899100;
    // trunc gives -899 where floorDiv gives -900 — BOTH engines
    // truncate (probed DuckDB -7 // 2 = -3); the adversarial sweep
    // caught the floorDiv draft of the kernel on exactly this class
    val neg = Seq((1L, 1L, 0L), (1L, 2L, -999L)).toDF("traj", "step", "r")
    val gn = Trajectory.trajReturns(neg, "traj", "step", "r")
      .collect().map(x => x.getLong(1) -> x.getLong(2)).toMap
    assert(gn(1L) === -899L,
      "negative discounting must TRUNCATE (both engines' semantics), not floor")
  }

  test("graft_disc_returns kernel = declarative div aggregate twin") {
    // the declarative twin: aggregate from the tail with Spark's
    // truncating `div` — property-style over signed rewards; the
    // kernel must be bit-identical.
    val rows = (1 to 50).map { i =>
      val n = 1 + (i * 7) % 12
      (i.toLong, (1 to n).map(k =>
        ((i * 31 + k * 17) % 4001) - 2000L).toArray)
    }
    val df = rows.toDF("id", "rs")
    val out = graft.functions.VectorFunctions.attach(df)
      .select($"id",
        expr("graft_disc_returns(transform(rs, x -> cast(x AS BIGINT)), cast(900 AS BIGINT))").as("k"),
        expr(
          "reverse(aggregate(reverse(transform(rs, x -> cast(x AS BIGINT))), " +
            "named_struct('g', cast(0 AS BIGINT), 'out', cast(array() AS ARRAY<BIGINT>)), " +
            "(acc, r) -> named_struct(" +
            "  'g', r + (900 * acc.g) div 1000, " +
            "  'out', concat(acc.out, array(r + (900 * acc.g) div 1000))), " +
            "acc -> acc.out))").as("d"))
      .collect()
    out.foreach { r =>
      assert(r.getSeq[Long](1) === r.getSeq[Long](2),
        s"kernel/declarative divergence on id ${r.getLong(0)}")
    }
  }

  test("trajReturns: NULL rewards coalesce to 0; steps re-emerge dense") {
    val df = Seq(
      (1L, 1L, Some(500L)), (1L, 2L, None), (1L, 3L, Some(1000L)))
      .toDF("traj", "step", "r")
    val g = Trajectory.trajReturns(df, "traj", "step", "r")
      .collect().map(x => x.getLong(1) -> x.getLong(2)).toMap
    // G3 = 1000; G2 = 0 + 900 = 900; G1 = 500 + 810 = 1310
    assert(g === Map(1L -> 1310L, 2L -> 900L, 3L -> 1000L))
  }

  test("trajReturns: maxSteps drops runaway episodes whole (SQL twin replays the guard)") {
    // a truncated return would be silently wrong (G_1 depends on every
    // later step), so oversized episodes drop WHOLE — and the twin's
    // HAVING guard must agree
    val df = ((1 to 5).map(s => (1L, s.toLong, 100L)) ++
      Seq((2L, 1L, 7L), (2L, 2L, 7L)))
      .toDF("traj", "step", "r")
    val g = Trajectory.trajReturns(df, "traj", "step", "r", maxSteps = 3)
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(2)).toMap
    assert(g.keySet.map(_._1) === Set(2L), "the 5-step episode is gone whole")
    assert(g((2L, 1L)) === 13L && g((2L, 2L)) === 7L)

    df.createOrReplaceTempView("traj_guard_fixture")
    // Spark SQL lacks recursive CTEs pre-4.x in this form; replay just
    // the guard semantics: the twin's surviving trajectory set
    val twinSql = Trajectory.trajReturnsSql(
      "traj_guard_fixture", "traj", "step", "r", maxSteps = 3)
    assert(twinSql.contains("HAVING count(*) <= 3"),
      "twin must carry the same episode-size guard")
  }

  test("trajStats: per-policy counts; signed totals stay sums") {
    val df = Seq(
      (1L, "a", 100L), (1L, "a", -300L),
      (2L, "a", 50L),
      (3L, "b", -10L), (3L, "b", -10L), (3L, "b", -10L))
      .toDF("traj", "policy", "r")
    val m = Trajectory.trajStats(df, "traj", "policy", "r")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(m("a") === ((2L, 3L, 1500L, -150L)))
    assert(m("b") === ((1L, 3L, 3000L, -30L)))
  }

  test("trajGae: hand-computed backward recurrence over signed values") {
    // gamma=900, lambda=950; (r, v) per step:
    //   step 3: d3 = 1000 + 0 - 200 = 800, A3 = 800
    //   step 2: d2 = -500 + trunc(900*200/1000) + 300 = -20,
    //           A2 = -20 + trunc(855000*800/1e6) = -20 + 684 = 664
    //   step 1: d1 = 2000 + trunc(900*-300/1000) - 500 = 1230,
    //           A1 = 1230 + trunc(855000*664/1e6) = 1230 + 567 = 1797
    val df = Seq(
      (1L, 1L, 2000L, 500L), (1L, 2L, -500L, -300L), (1L, 3L, 1000L, 200L))
      .toDF("traj", "step", "r", "v")
    val a = Trajectory.trajGae(df, "traj", "step", "r", "v",
      gammaMilli = 900, lambdaMilli = 950)
      .collect().map(x => x.getLong(1) -> x.getLong(2)).toMap
    assert(a === Map(1L -> 1797L, 2L -> 664L, 3L -> 800L))
  }

  test("trajGae: all-negative advantages TRUNCATE toward zero, not floor") {
    // A2 = -999; A1 = 0 + trunc(900000 * -999 / 1e6) = trunc(-899.1)
    // = -899 — a floorDiv draft would emit -900 (the exact class the
    // sweep caught on the returns kernel)
    val df = Seq((1L, 1L, 0L, 0L), (1L, 2L, -999L, 0L))
      .toDF("traj", "step", "r", "v")
    val a = Trajectory.trajGae(df, "traj", "step", "r", "v",
      gammaMilli = 900, lambdaMilli = 1000)
      .collect().map(x => x.getLong(1) -> x.getLong(2)).toMap
    assert(a(1L) === -899L,
      "negative GAE must TRUNCATE (both engines' semantics), not floor")
    assert(a(2L) === -999L)
  }

  test("trajGae: matches a Scala reference over signed episodes; lambda=0 is the TD residual") {
    val eps = (1 to 30).map { t =>
      val n = 1 + (t * 5) % 9
      (t.toLong, (1 to n).map { k =>
        (k.toLong,
          ((t * 31 + k * 17) % 4001) - 2000L,
          ((t * 13 + k * 29) % 3001) - 1500L)
      })
    }
    def ref(steps: Seq[(Long, Long, Long)], g: Long, l: Long): Map[Long, Long] = {
      var a = 0L; var vNext = 0L
      steps.sortBy(_._1).reverse.map { case (s, r, v) =>
        val d = r + g * vNext / 1000 - v
        a = d + g * l * a / 1000000
        vNext = v
        s -> a
      }.toMap
    }
    val df = eps.flatMap { case (t, ss) => ss.map(s => (t, s._1, s._2, s._3)) }
      .toDF("traj", "step", "r", "v")
    for ((g, l) <- Seq((900, 950), (900, 1000), (990, 0))) {
      val got = Trajectory.trajGae(df, "traj", "step", "r", "v",
        gammaMilli = g, lambdaMilli = l)
        .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(2)).toMap
      val want = eps.flatMap { case (t, ss) =>
        ref(ss, g, l).map { case (s, a) => (t, s) -> a } }.toMap
      assert(got === want, s"gamma=$g lambda=$l")
    }
    // lambda=0 degrades to the one-step TD residual: A_i = delta_i
    val td = Trajectory.trajGae(df, "traj", "step", "r", "v",
      gammaMilli = 990, lambdaMilli = 0)
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(2)).toMap
    eps.foreach { case (t, ss) =>
      val byStep = ss.map(s => s._1 -> s).toMap
      ss.foreach { case (s, r, v) =>
        val vNext = byStep.get(s + 1).map(_._3).getOrElse(0L)
        assert(td((t, s)) === r + 990L * vNext / 1000L - v)
      }
    }
  }

  test("NULL steps sort FIRST on the Spark side; twins pin NULLS FIRST to match") {
    // Spark's struct sort places a NULL sort field first (probed via
    // sort_array); DuckDB's ORDER BY defaults NULLS LAST — the twins
    // carry an explicit NULLS FIRST so a NULL-step row renumbers
    // identically instead of diverging silently
    val df = Seq((1L, Some(2L), 100L), (1L, None, 500L), (1L, Some(1L), 200L))
      .toDF("traj", "step", "r")
    val g = Trajectory.trajReturns(df, "traj", "step", "r", gammaMilli = 0)
      .collect().map(x => x.getLong(1) -> x.getLong(2)).toMap
    // gamma=0 makes returns = rewards, exposing the order: the NULL
    // step must re-rank to position 1
    assert(g === Map(1L -> 500L, 2L -> 200L, 3L -> 100L))
    assert(Trajectory.trajReturnsSql("t", "traj", "step", "r")
      .contains("NULLS FIRST"))
    assert(Trajectory.trajGaeSql("t", "traj", "step", "r", "v")
      .contains("NULLS FIRST"))
  }

  test("trajReturns: fractional DOUBLE steps tie under the TRUNCATED sort key on both dialects") {
    // round-20 ADVICE class: Spark sorts the collected struct by
    // cast(step AS BIGINT) — 0.5 and 0.9 TIE at 0 and re-rank by
    // reward, NOT by the raw fractional order. The twins must order
    // by the same truncated key or the dense renumbering silently
    // diverges (DuckDB would use raw 0.5 < 0.9).
    val df = Seq((1L, 0.5, 300L), (1L, 0.9, 100L), (1L, 2.0, 50L))
      .toDF("traj", "step", "r")
    val g = Trajectory.trajReturns(df, "traj", "step", "r", gammaMilli = 0)
      .collect().map(x => x.getLong(1) -> x.getLong(2)).toMap
    // gamma=0 exposes the order: ties (trunc 0) rank by reward, so
    // the 0.9-step row (r=100) comes FIRST
    assert(g === Map(1L -> 100L, 2L -> 300L, 3L -> 50L))
    // both twins carry the truncToZero(step0) sort key
    assert(Trajectory.trajReturnsSql("t", "traj", "step", "r")
      .contains("ORDER BY CAST(CASE WHEN (step0) >= 0"))
    assert(Trajectory.trajGaeSql("t", "traj", "step", "r", "v")
      .contains("ORDER BY CAST(CASE WHEN (step0) >= 0"))
  }

  test("trajGae: maxSteps drops oversized episodes whole; twin carries the guard") {
    val df = ((1 to 5).map(s => (1L, s.toLong, 100L, 10L)) ++
      Seq((2L, 1L, 7L, 5L))).toDF("traj", "step", "r", "v")
    val a = Trajectory.trajGae(df, "traj", "step", "r", "v", maxSteps = 3)
      .collect().map(x => x.getLong(0)).toSet
    assert(a === Set(2L), "the 5-step episode is gone whole")
    val twin = Trajectory.trajGaeSql("t", "traj", "step", "r", "v", maxSteps = 3)
    assert(twin.contains("HAVING count(*) <= 3"))
  }

  test("trajAdvantage: exact scaled centering; single-trajectory stratum is zero") {
    // policy p has two length-1 episodes with rewards 100 and 300:
    // baseline sum 400, n_peers 2 -> adv = 100*2-400 = -200 / 300*2-400 = 200.
    // policy q has one episode -> adv 0 by construction.
    val df = Seq(
      (1L, 1L, 100L, "p"), (2L, 1L, 300L, "p"), (3L, 1L, 999L, "q"))
      .toDF("traj", "step", "r", "policy")
    val a = Trajectory.trajAdvantage(df, "traj", "step", "r", "policy")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(a(1L) === ((100L, 2L, -200L)))
    assert(a(2L) === ((300L, 2L, 200L)))
    assert(a(3L) === ((999L, 1L, 0L)))
  }
}
