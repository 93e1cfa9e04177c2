package graft

import org.scalatest.funsuite.AnyFunSuite

/** Regression pins for the three r13 chaos-run findings that live in
  * Scala (the fork/pipe race and the read-ahead marker bug are python
  * harness fixes, regression-checked by scripts/chaos_bench.py's own
  * PASS/FAIL protocol). No Spark session — pure decision math. */
class BenchDefenseSpec extends AnyFunSuite {

  test("drift bar: +0.05 absolute floor binds for this control class") {
    // chaos finding #3: the old min+0.2 floor allowed ~3.9x drift on a
    // 0.07 s control — a 77 s rep of a 14 s query read "clean", and 24
    // hogs pushing the control to 0.15-0.17 cleared min+0.1. The r13
    // bar catches exactly those:
    assert(math.abs(BenchDefense.driftBar(0.075) - 0.125) < 1e-9)
    assert(0.15 > BenchDefense.driftBar(0.075)) // the chaos-run control
    // the ratio term takes over for slower controls
    assert(math.abs(BenchDefense.driftBar(0.2) - 0.3) < 1e-9)
  }

  test("median-of-3 confirmation: one blip passes, sustained load flags") {
    val bar = BenchDefense.driftBar(0.075) // 0.125
    // idle-tail blip (calibration saw single samples to 0.21 on an idle
    // box): two clean confirmations override the first sample
    assert(!BenchDefense.confirmed(0.21, 0.08, 0.09, bar))
    // sustained load reads high across the confirmation
    assert(BenchDefense.confirmed(0.15, 0.16, 0.14, bar))
    // exactly-at-bar is NOT drift (strict >)
    assert(!BenchDefense.confirmed(bar, bar, bar, bar))
  }

  test("baseline-loaded bar: calibrated clean/flagged sessions split correctly") {
    // observed data in Bench's comment: idle bases 0.089-0.134 clean,
    // chaos fullload bases 0.155/0.222 flagged, at min ~0.072
    for (idleBase <- Seq(0.089, 0.112, 0.134))
      assert(!BenchDefense.baselineLoaded(idleBase, 0.072), s"$idleBase")
    for (loadedBase <- Seq(0.155, 0.222))
      assert(BenchDefense.baselineLoaded(loadedBase, 0.072), s"$loadedBase")
  }
}
