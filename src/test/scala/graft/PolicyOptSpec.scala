package graft

import graft.ops.PolicyOpt

/** Pins the policy-optimization prep ops: the GRPO exact scaled
  * centering (incl. single-sample groups and NULL rewards) and the
  * PPO milli-nat clip bounds arithmetic.
  */
class PolicyOptSpec extends SparkSpec {
  import spark.implicits._

  test("grpoAdvantage: exact group centering; singleton groups are zero; NULL rewards coalesce") {
    val df = Seq(
      (1L, 10L, Some(100L)), (1L, 11L, Some(300L)), (1L, 12L, None),
      (2L, 20L, Some(-50L)))
      .toDF("prompt", "sample", "r")
    val m = PolicyOpt.grpoAdvantage(df, "prompt", "sample", "r")
      .collect().map(x => x.getLong(1) ->
        (x.getLong(2), x.getLong(3), x.getLong(4))).toMap
    // group 1: rewards (100, 300, 0), sum 400, n 3
    assert(m(10L) === ((100L, 3L, -100L)), "100*3 - 400")
    assert(m(11L) === ((300L, 3L, 500L)))
    assert(m(12L) === ((0L, 3L, -400L)), "NULL reward coalesces to 0")
    assert(m(20L) === ((-50L, 1L, 0L)), "a singleton group centers to 0")
  }

  test("ppoClipStats: milli-nat deltas against the exact ln(1±eps) bounds") {
    // eps = 0.2: bounds [ln(0.8)*1000, ln(1.2)*1000] = [-223, 182].
    // -223 and 182 themselves are IN band (strict inequalities).
    val df = Seq(
      ("p", -1000L, -777L),  // d = -223 -> in band
      ("p", -1000L, -776L),  // d = -224 -> clip below
      ("p", -500L, -682L),   // d = 182 -> in band
      ("p", -500L, -683L),   // d = 183 -> clip above
      ("p", -600L, -600L))   // d = 0 -> in band
      .toDF("policy", "lp_new", "lp_old")
    val r = PolicyOpt.ppoClipStats(df, "policy", "lp_new", "lp_old")
      .collect().map(x => (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4))).head
    assert(r === ((5L, 1L, 1L, 400L)),
      "exactly the two out-of-band deltas clip; 2 of 5 -> 400 milli")

    // twin replay
    df.createOrReplaceTempView("ppo_fixture")
    val twin = spark.sql(PolicyOpt.ppoClipStatsSql("ppo_fixture",
      "policy", "lp_new", "lp_old")
      .replace("//", "div").replace("::BIGINT", ""))
      .collect().map(x => (x.getAs[Number](1).longValue,
        x.getAs[Number](2).longValue, x.getAs[Number](3).longValue,
        x.getAs[Number](4).longValue)).head
    assert(twin === r)
  }

  test("grpoGroupStats: exact scaled variance n*sum(r^2) - sum(r)^2; constant group is 0") {
    val df = Seq(
      (1L, Some(100L)), (1L, Some(300L)), (1L, None), // rewards 100,300,0
      (2L, Some(-50L)), // singleton
      (3L, Some(7L)), (3L, Some(7L))) // constant group
      .toDF("prompt", "r")
    val m = PolicyOpt.grpoGroupStats(df, "prompt", "r")
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4))).toMap
    // group 1: n=3, sum=400, sumsq=100000; var = 3*100000 - 160000 = 140000
    // (= 9 * pop-variance: mean 133.33, var 15555.6 -> *9 = 140000)
    assert(m(1L) === ((3L, 400L, 100000L, 140000L)))
    assert(m(2L) === ((1L, -50L, 2500L, 0L)), "singleton variance is 0")
    assert(m(3L) === ((2L, 14L, 98L, 0L)), "constant group variance is 0")
    // normalization contract with grpoAdvantage: adv_scaled/sqrt(var)
    // is the unit-variance advantage — here adv(100) = -100,
    // sqrt(140000) ~ 374.2, so the trainer reads ~-0.267 in float land
  }

  test("klReport: signed k1 mass as a sum; tail counts at the milli-nat thresholds") {
    val df = Seq(
      ("p", -700L, -650L), // d = lp_old - lp_new = 50 -> no tail
      ("p", -700L, -599L), // d = 101 -> tail 100
      ("p", -100L, -601L), // d = -501 -> tail 100 AND 500 (abs)
      ("p", -500L, -500L)) // d = 0
      .toDF("policy", "lp_new", "lp_old")
    val r = PolicyOpt.klReport(df, "policy", "lp_new", "lp_old")
      .collect().map(x => (x.getLong(1), x.getLong(2), x.getLong(3),
        x.getLong(4))).head
    assert(r === ((4L, -350L, 2L, 1L)),
      "sum 50+101-501+0 = -350; two |d|>100, one |d|>500")

    // twin replay
    df.createOrReplaceTempView("kl_fixture")
    val twin = spark.sql(PolicyOpt.klReportSql("kl_fixture",
      "policy", "lp_new", "lp_old")
      .replace("//", "div").replace("::BIGINT", ""))
      .collect().map(x => (x.getAs[Number](1).longValue,
        x.getAs[Number](2).longValue, x.getAs[Number](3).longValue,
        x.getAs[Number](4).longValue)).head
    assert(twin === r)
  }

  test("nllReport: malformed log-probs are counted out; mean is an unsigned truncating div") {
    val df = Seq(
      ("p", Some(-500L)),  // nll 500
      ("p", Some(0L)),     // lp = 0 is a valid (certain) token
      ("p", Some(-1000L)), // tail 1000 (boundary included)
      ("p", Some(-3500L)), // tail 1000 AND 3000
      ("p", Some(5L)),     // POSITIVE log-prob: malformed, out
      ("p", None),         // NULL: malformed, out
      ("q", Some(7L)))     // a policy with ONLY malformed rows
      .toDF("policy", "lp")
    val m = PolicyOpt.nllReport(df, "policy", "lp")
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4),
          x.getLong(5), x.getLong(6))).toMap
    // p: 4 tokens, 2 malformed, sum 0+500+1000+3500 = 5000,
    // tails 2/1, mean 5000 div 4 = 1250
    assert(m("p") === ((4L, 2L, 5000L, 2L, 1L, 1250L)))
    assert(m("q") === ((0L, 1L, 0L, 0L, 0L, 0L)),
      "all-malformed policy: zero tokens, mean 0, the div-by-zero guard")

    // twin replay (truncToZero's CASE parses on Spark)
    df.createOrReplaceTempView("nll_fixture")
    val twin = spark.sql(PolicyOpt.nllReportSql("nll_fixture", "policy", "lp")
      .replace("//", "div").replace("::BIGINT", ""))
      .collect().map(x => x.getString(0) ->
        (x.getAs[Number](1).longValue, x.getAs[Number](2).longValue,
          x.getAs[Number](3).longValue, x.getAs[Number](4).longValue,
          x.getAs[Number](5).longValue, x.getAs[Number](6).longValue)).toMap
    assert(twin === m)
  }

  test("nllReport: fractional log-probs truncate toward zero on both dialects") {
    // -999.7 truncates to -999 (toward zero), NOT floor -1000: the
    // tail boundary must not move between engines
    val df = Seq(("p", -999.7), ("p", -1000.0)).toDF("policy", "lp")
    val r = PolicyOpt.nllReport(df, "policy", "lp").collect().head
    assert(r.getLong(3) === 1999L, "sum 999 + 1000")
    assert(r.getLong(4) === 1L, "only the exact -1000 reaches the tail")
    df.createOrReplaceTempView("nll_frac_fixture")
    val twin = spark.sql(PolicyOpt.nllReportSql("nll_frac_fixture",
      "policy", "lp")
      .replace("//", "div").replace("::BIGINT", "")).collect().head
    assert(twin.getAs[Number](3).longValue === 1999L &&
      twin.getAs[Number](4).longValue === 1L)
  }
}
