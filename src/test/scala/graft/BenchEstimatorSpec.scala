package graft

import org.scalatest.funsuite.AnyFunSuite
import Bench.Sample

/** The contention-robust bench estimator, exercised with scripted samples —
  * no Spark session: the estimator's contract is pure arithmetic over the
  * per-pass observations.
  */
class BenchEstimatorSpec extends AnyFunSuite {

  test("quiet box: two agreeing clean samples — min recorded, no extra pass") {
    val s = Vector(Sample(1.00, ok = true, 1.0), Sample(1.04, ok = true, 1.1))
    val (t, d, sent) = Bench.estimate(s)
    assert(t === 1.00)
    assert(d === 1.04)
    assert(sent === 1.0)
    assert(!Bench.needsExtraPass(s), "agreeing runs must not pay for a third")
  }

  test("contention burst on one pass: disagreement triggers the extra pass and min recovers") {
    // pass 0 hit a 3x burst, pass 1 was quiet — the mirrored order makes
    // this the common case; the disagreement still buys a third sample
    val two = Vector(Sample(3.00, ok = true, 5.2), Sample(1.00, ok = true, 1.0))
    assert(Bench.needsExtraPass(two))
    val all = two :+ Sample(1.02, ok = true, 1.0)
    val (t, d, sent) = Bench.estimate(all)
    assert(t === 1.00)
    // dispersion is the agreement of the two BEST samples — the dodged
    // burst observation must not poison the record the extra pass fixed
    assert(d === 1.02)
    assert(sent === 1.0, "the recorded min must carry ITS window's sentinel, not the burst's")
  }

  test("both primary samples in dirty windows: extra pass even when times agree") {
    // the r8 failure mode — uniform inflation across back-to-back samples
    // looks self-consistent; the sentinel is what detects it mechanically
    val s = Vector(Sample(2.00, ok = true, 8.0), Sample(2.05, ok = true, 7.5))
    assert(Bench.needsExtraPass(s),
      "agreeing-but-dirty samples must still buy a clean-window attempt")
    val clean = s :+ Sample(0.60, ok = true, 1.0)
    val (t, _, sent) = Bench.estimate(clean)
    assert(t === 0.60)
    assert(sent === 1.0)
  }

  test("failures: one failed sample triggers extra pass; all-failed records -1") {
    val s = Vector(Sample(0.10, ok = false, 1.0), Sample(1.00, ok = true, 1.0))
    assert(Bench.needsExtraPass(s))
    val (t, d, _) = Bench.estimate(s :+ Sample(1.01, ok = true, 1.0))
    assert(t === 1.00)
    assert(d === 1.01)
    val dead = Vector(Sample(0.10, ok = false, 1.0), Sample(0.11, ok = false, 1.0),
      Sample(0.09, ok = false, 1.0))
    val (t2, d2, _) = Bench.estimate(dead)
    assert(t2 === -1.0, "an all-failed query must carry the visible -1 marker")
    assert(d2 === 1.0)
  }

  test("pass orders: 0 and 1 are exact mirrors; extra pass tracks neither") {
    val names = ('a' to 'z').map(c => s"q_$c")
    val p0 = Bench.passOrder(names, 0)
    val p1 = Bench.passOrder(names, 1)
    val p2 = Bench.passOrder(names, 2)
    assert(p0 === names.sorted)
    assert(p1 === p0.reverse,
      "mirrored orders put a front-of-bench burst on DIFFERENT queries per pass")
    assert(p2.sorted === p0, "extra pass must be a permutation of the same set")
    assert((p2 != p0) && (p2 != p1), "extra pass must not repeat a primary order")
    assert(Bench.passOrder(names, 2) === p2, "orders must be deterministic")
  }

  test("sentinel gate: rolling-min baseline self-corrects after a loaded start") {
    // probe script: loaded calibration (0.12 s), then quiet probes (0.03 s)
    val script = Iterator(0.12, 0.12, 0.12, 0.12, 0.12, 0.03, 0.03, 0.09)
    val gate = new Bench.SentinelGate(() => script.next(), sleepMs = 0L, maxWaitMs = 0L)
    gate.calibrate(5)
    // first admission observes 0.03: baseline drops from 0.12 to 0.03 and
    // the ratio is computed against the corrected floor
    assert(gate.admit() === 1.0)
    assert(gate.admit() === 1.0)
    // a 3x-inflated window now reads as 3x, not as 0.09/0.12 < 1
    assert(math.abs(gate.admit() - 3.0) < 1e-9)
  }

  test("sentinel gate: waits for a dirty window to clear within the budget") {
    // sleepMs=0 keeps the test instant; the script goes clean on draw 4
    val script = Iterator(0.03, 0.30, 0.30, 0.04)
    val gate = new Bench.SentinelGate(() => script.next(), sleepMs = 0L, maxWaitMs = 10L)
    gate.calibrate(1)
    val r = gate.admit() // draws 0.30 (dirty), 0.30 (dirty), 0.04 (clean)
    assert(r < Bench.DirtySentinel, s"gate must re-probe until clean, got $r")
    assert(!script.hasNext, "gate must stop probing the moment the window is clean")
  }
}
