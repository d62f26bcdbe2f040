package graft

import graft.ops.Mixture

/** Pins the mixture planner's integer arithmetic: desired mass, the
  * epoch cap, weight-0 report rows, and the achieved-mixture report
  * after caps bind.
  */
class MixtureSpec extends SparkSpec {
  import spark.implicits._

  test("mixPlan: cap binds, downsampling is free, weight-0 rows stay") {
    // three sources of 10 / 10 / 80 single-token docs ('x' = 1 token):
    // total 100. Targets a=600, b=100, c absent.
    //  a: desired 60 over mass 10 -> 6000 milli, CAPPED at 4000 ->
    //     effective 40
    //  b: desired 10 over mass 10 -> 1000 milli -> effective 10
    //  c: weight 0 -> epochs 0, effective 0, row KEPT
    // achieved: a 40*1000 div 50 = 800, b 200, c 0
    val df = ((1 to 10).map(i => (i.toLong, "x", "a")) ++
      (1 to 10).map(i => (i.toLong + 100, "x", "b")) ++
      (1 to 80).map(i => (i.toLong + 200, "x", "c")))
      .toDF("doc_id", "text", "source")
    val m = Mixture.mixPlan(df, "text", "source",
      Seq("a" -> 600, "b" -> 100))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(m("a") === ((10L, 600L, 4000L, 40L, 800L)))
    assert(m("b") === ((10L, 100L, 1000L, 10L, 200L)))
    assert(m("c") === ((80L, 0L, 0L, 0L, 0L)),
      "an untargeted source reports its mass but samples nothing")
  }

  test("mixPlan: empty target table and empty sources degrade to zeros, no division error") {
    val df = Seq((1L, "x y z", "a")).toDF("doc_id", "text", "source")
    val m = Mixture.mixPlan(df, "text", "source", Seq.empty)
      .collect().map(r => r.getString(0) -> (r.getLong(3), r.getLong(5))).toMap
    assert(m("a") === ((0L, 0L)), "all-zero effective mass must not divide by zero")
  }
}
