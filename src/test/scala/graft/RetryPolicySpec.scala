package graft

import graft.service.{RetryBackoff, RetryPolicy}
import org.scalatest.funsuite.AnyFunSuite
import scala.concurrent.duration._

/** Backoff schedule arithmetic, matching the reference exactly
  * (reference: KafkaBus.scala:223-228 — "Exponential" is attempt²·delay).
  */
class RetryPolicySpec extends AnyFunSuite {
  test("NoBackoff is constant") {
    val p = RetryPolicy(3, 100.millis, RetryBackoff.NoBackoff)
    assert((1 to 5).map(p.delayFor) === Seq.fill(5)(100.millis))
  }
  test("Linear is attempt * delay") {
    val p = RetryPolicy(3, 100.millis, RetryBackoff.Linear)
    assert((1 to 4).map(p.delayFor) === Seq(100.millis, 200.millis, 300.millis, 400.millis))
  }
  test("Exponential is attempt^2 * delay (the reference's quadratic)") {
    val p = RetryPolicy(3, 100.millis, RetryBackoff.Exponential)
    assert((1 to 4).map(p.delayFor) === Seq(100.millis, 400.millis, 900.millis, 1600.millis))
  }
}
