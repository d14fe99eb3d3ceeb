package graft

import org.scalatest.funsuite.AnyFunSuite

/** Acceptance semantics of the r16 load-robust bench gates, proven on
  * synthetic artifacts (no real host load needed):
  *
  *  1. quiet run, real regression  → correction 1.0, still FAILS;
  *  2. loaded window, stable-but-slow samples (the r15 judged-artifact
  *     failure mode: q_join_semi 1.65 s / 4.1× budget with probes that
  *     would have read ~5× their quiet floor) → correction absorbs it,
  *     PASSES;
  *  3. loaded window AND a genuine regression bigger than the noise →
  *     still FAILS (the correction is bounded by the probes' own
  *     inflation, and capped at corrCap regardless);
  *  4. pre-probe artifacts (no "probes" node) → correction 1.0, judged
  *     exactly as before;
  *  5. (r18) sustained CPU-throughput contention — quiet scheduler
  *     probes but both CPU-leg readings above their floor — corrects;
  *     one-sided CPU bursts and quiet-CPU regressions do not.
  */
class BenchGateLogicSpec extends AnyFunSuite {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  test("quiet probes leave the measurement untouched (regression caught)") {
    // quiet probe floor ~0.38 s < probeRef 0.45 → correction exactly 1.0
    val corr = BenchGate.correction(Seq(0.35, 0.38, 0.40, 0.42))
    assert(corr == 1.0)
    val budget = 0.4
    val measured = 1.65 // the r15 q_join_semi reading, on a QUIET host
    assert(measured / corr > 2 * budget,
      "a real 4x regression on a quiet machine must still breach")
  }

  test("loaded-window breach with stable samples is absorbed") {
    // host noise inflates the bracketing probes ~5x their quiet floor;
    // the same noise inflated the query from ~0.3 s to 1.65 s
    val corr = BenchGate.correction(Seq(2.1, 2.4, 2.2, 2.3))
    assert(corr > 4.0 && corr < 6.0, s"expected ~5x correction, got $corr")
    val budget = 0.4
    val measured = 1.65
    assert(measured / corr <= 2 * budget,
      "a load-window breach must pass once corrected")
  }

  test("genuine regression under load still fails") {
    val corr = BenchGate.correction(Seq(2.1, 2.4, 2.2, 2.3)) // ~5x
    val budget = 0.4
    val measured = 8.0 // 20x budget — noise explains ~5x, not 20x
    assert(measured / corr > 2 * budget)
  }

  test("correction is capped at corrCap") {
    val corr = BenchGate.correction(Seq(100.0, 100.0, 100.0))
    assert(corr == BenchGate.corrCap)
  }

  test("artifacts without probes judge exactly as before") {
    assert(BenchGate.correction(Nil) == 1.0)
    val root = mapper.readTree("""{"queries":{"q_x":1.5}}""")
    assert(BenchGate.probesOf(root).isEmpty)
    assert(BenchGate.correctedQueries(root) == Map("q_x" -> 1.5))
  }

  test("correctedQueries divides by per-query probe medians") {
    val root = mapper.readTree(
      """{"queries":{"q_a":1.2,"q_b":0.6,"q_f":-1.0},
          "probes":{"q_a":[0.90,0.90,0.90,0.90],
                    "q_b":[0.40,0.40,0.40,0.40],
                    "q_f":[0.90,0.90,0.90,0.90]}}""")
    val c = BenchGate.correctedQueries(root)
    assert(math.abs(c("q_a") - 0.6) < 1e-9) // 2x correction
    assert(c("q_b") == 0.6)                 // quiet → untouched
    assert(c("q_f") == -1.0)                // failure marker preserved
  }

  test("CPU-throughput contention with quiet scheduler probes corrects") {
    // the r17 judged failure: q_text_decon_ngram's samples ran at
    // loadavg 12-13 (sustained core theft slowing its codegen'd
    // CPU-bound kernel ~1.26x: 2.48 s judged vs 1.97 s quiet) while
    // its SCHEDULER probes read a quiet 0.29-0.55 s → correction 1.0
    // and a gate red. The CPU-work leg reads the same core theft
    // directly: both bracketing readings above the quiet floor.
    val sched = Seq(0.29, 0.40, 0.44, 0.55) // quiet: median < probeRef
    assert(BenchGate.correction(sched) == 1.0)
    val cpu = Seq(0.17, 0.19) // both ~1.3-1.45x the 0.13 quiet ref
    val corr = BenchGate.correction(sched, cpu)
    assert(corr > 1.25 && corr < 1.5, s"expected ~1.3x, got $corr")
    val budget = 1.0
    val measured = 2.48 // the judged reading
    assert(measured / corr <= 2 * budget,
      "the r17 decon_ngram class must pass once CPU-corrected")
  }

  test("CPU correction needs sustained contention (min of the bracket)") {
    // a burst that touches only ONE end of the window must not excuse
    // a slow median — the scheduler probes and the resample loop own
    // transient noise; the CPU leg corrects only sustained theft
    val corr = BenchGate.correction(Seq(0.40, 0.40), Seq(0.09, 1.80))
    assert(corr == 1.0)
  }

  test("genuine regression with quiet CPU probes still fails") {
    val corr = BenchGate.correction(
      Seq(0.40, 0.40, 0.40, 0.40), Seq(0.09, 0.11))
    assert(corr == 1.0)
    assert(3.0 / corr > 2 * 1.0,
      "a quiet-host regression must breach regardless of the CPU leg")
  }

  test("artifacts without the CPU leg judge on scheduler probes alone") {
    val corr = BenchGate.correction(Seq(2.1, 2.4, 2.2, 2.3), Nil)
    assert(corr > 4.0 && corr < 6.0)
    val root = mapper.readTree(
      """{"queries":{"q_a":1.2},
          "probes":{"q_a":[0.90,0.90,0.90,0.90]}}""")
    assert(BenchGate.cpuProbesOf(root).isEmpty)
    assert(math.abs(BenchGate.correctedQueries(root)("q_a") - 0.6) < 1e-9)
  }

  test("two-signal correction stays capped at corrCap") {
    assert(BenchGate.correction(Seq(100.0), Seq(100.0, 100.0))
      == BenchGate.corrCap)
  }
}
