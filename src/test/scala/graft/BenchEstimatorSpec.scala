package graft

import org.scalatest.funsuite.AnyFunSuite

/** The contention-robust bench estimator, exercised with scripted timers —
  * no Spark session: the estimator's contract is pure arithmetic over the
  * sampling thunk.
  */
class BenchEstimatorSpec extends AnyFunSuite {

  private def scripted(runs: (Double, Boolean)*): (() => (Double, Boolean), () => Int) = {
    val it = runs.iterator
    var used = 0
    (() => { used += 1; it.next() }, () => used)
  }

  test("quiet box: two agreeing runs, no third sample drawn") {
    val (sample, used) = scripted((1.00, true), (1.04, true), (9.99, true))
    val (t, d) = Bench.robustTime(sample)
    assert(t === 1.00)
    assert(d === 1.04)
    assert(used() === 2, "agreeing runs must not pay for a third")
  }

  test("synthetic contention: a stalled first run triggers the third and the quiet time is recovered") {
    // run 1 hits a 3x scheduler stall, runs 2-3 are quiet — min-of-2 would
    // already recover here, but the dispersion must surface the stall
    val (sample, used) = scripted((3.00, true), (1.00, true), (1.02, true))
    val (t, d) = Bench.robustTime(sample)
    assert(t === 1.00)
    assert(d === 3.00 / 1.00)
    assert(used() === 3)
    // BOTH of the first two runs contended but unevenly (the r6 failure
    // mode was uniform inflation; the uneven flavor is detectable): the
    // disagreement triggers the third, quiet run, recovering the estimate
    // min-of-2 would have recorded as 1.80
    val (s2, u2) = scripted((3.00, true), (1.80, true), (1.00, true))
    val (t2, d2) = Bench.robustTime(s2)
    assert(t2 === 1.00)
    assert(d2 === 3.00)
    assert(u2() === 3)
  }

  test("failures: one failed run triggers a third; all-failed records -1") {
    val (sample, used) = scripted((0.10, false), (1.00, true), (1.01, true))
    val (t, d) = Bench.robustTime(sample)
    assert(t === 1.00)
    assert(d === 1.01)
    assert(used() === 3)
    val (s2, _) = scripted((0.10, false), (0.11, false), (0.09, false))
    val (t2, d2) = Bench.robustTime(s2)
    assert(t2 === -1.0, "an all-failed query must carry the visible -1 marker")
    assert(d2 === 1.0)
  }
}
