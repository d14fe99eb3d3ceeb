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
  *     exactly as before.
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
}
