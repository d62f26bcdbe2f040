package graft

import graft.ops.PassAtK

/** Pins the pass@k estimator: the unbiased binomial-ratio arithmetic
  * in stepwise-truncating fixed point, the n−c<k certainty branch,
  * the n<k exclusion rung, and the cross-prompt mean.
  */
class PassAtKSpec extends SparkSpec {
  import spark.implicits._

  test("passAtK: hand-computed fractions, certainty branch, exclusion, mean") {
    // prompt a: n=4, c=2 -> pass@2 = 1 - C(2,2)/C(4,2) = 5/6;
    //   fixed point: r = 1e6*2 div 4 = 500000; *1 div 3 = 166666;
    //   p = 1000 - 166 = 834 (within 1 milli of 833.33)
    // prompt b: n=5, c=0 -> pass@2 = 0 exactly (r stays 1e6)
    // prompt c: n=5, c=5 -> n-c < k -> 1000 exactly
    // prompt d: n=1, c=1 -> excluded from k=2, counted at k=1
    val samples =
      Seq(("a", true), ("a", true), ("a", false), ("a", false)) ++
      (1 to 5).map(_ => ("b", false)) ++
      (1 to 5).map(_ => ("c", true)) ++
      Seq(("d", true))
    val df = samples.toDF("prompt", "passed")
    val m = PassAtK.passAtK(df, "prompt", "passed", ks = Seq(1, 2))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // k=2: prompts a, b, c -> (834 + 0 + 1000) div 3 = 611
    assert(m(2L) === ((3L, 611L)))
    // k=1: a 500, b 0, c 1000, d 1000 -> 2500 div 4 = 625
    assert(m(1L) === ((4L, 625L)))
  }

  test("passAllK: hand-computed fractions, zero branch, exclusion, pass@k duality") {
    // prompt a: n=4, c=2 -> pass^2 = C(2,2)/C(4,2) = 1/6;
    //   fixed point: r = 1e6*2 div 4 = 500000; *1 div 3 = 166666;
    //   p = 166666 div 1000 = 166
    // prompt b: n=5, c=0 -> c < k -> 0 exactly
    // prompt c: n=5, c=5 -> pass^2 = 1000 (chain: 5/5 * 4/4 = 1e6)
    // prompt d: n=1 -> excluded from k=2, counted at k=1
    val samples =
      Seq(("a", true), ("a", true), ("a", false), ("a", false)) ++
      (1 to 5).map(_ => ("b", false)) ++
      (1 to 5).map(_ => ("c", true)) ++
      Seq(("d", true))
    val df = samples.toDF("prompt", "passed")
    val m = PassAtK.passAllK(df, "prompt", "passed", ks = Seq(1, 2))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // k=2: (166 + 0 + 1000) div 3 = 388
    assert(m(2L) === ((3L, 388L)))
    // k=1: pass^1 = pass@1 = c/n: a 500, b 0, c 1000, d 1000 -> 625
    assert(m(1L) === ((4L, 625L)))

    // duality at k=1: pass^1 == pass@1 on any fixture
    val at1 = PassAtK.passAtK(df, "prompt", "passed", ks = Seq(1))
      .collect().map(r => (r.getLong(1), r.getLong(2))).head
    assert(at1 === ((4L, 625L)))
  }

  test("passAtK: SQL twin replays the unrolled chain bit-identically (replayed in Spark)") {
    val samples = (1 to 200).map { i =>
      (s"p${i % 13}", (i * 7) % 3 == 0)
    }
    val df = samples.toDF("prompt", "passed")
    df.createOrReplaceTempView("passk_fixture")
    val op = PassAtK.passAtK(df, "prompt", "passed", ks = Seq(1, 3, 7))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val twin = spark.sql(
      PassAtK.passAtKSql("passk_fixture", "prompt", "passed", ks = Seq(1, 3, 7))
        .replace("//", "div").replace("::BIGINT", ""))
      .collect().map(r => r.getAs[Number](0).longValue ->
        (r.getAs[Number](1).longValue, r.getAs[Number](2).longValue)).toMap
    assert(twin === op)
  }
}
