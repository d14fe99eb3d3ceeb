package graft

import scala.jdk.CollectionConverters._

/** Shared load-correction logic for the bench gates (round 16).
  *
  * Problem (r7/r13/r14/r15 postmortems): BenchBudgetSpec and
  * BenchSlopeSpec judge absolute wall-clock, so a driver-conditions
  * artifact measured on a contended host fails budgets with STABLE
  * samples and no plan change — the gates became the flakiest
  * component the project ships. Run-level loadavg cannot fix this:
  * the r15 judged run breached q_join_semi at 4.1× budget while
  * trivial canary queries elsewhere in the same run measured
  * quiet-fast — host noise is temporally local to a query's own
  * measurement window.
  *
  * Fix: `graft.Bench` times a FIXED, SF-independent two-stage probe
  * job (1M-row range → groupBy → count) bracketing every timed sample
  * and records the per-query probe times in bench.json ("probes").
  * The probe's quiet cost is a committed constant ([[probeRef]]); a
  * probe median far above it means the host was contended during THAT
  * query's window, so the gates divide the query's median by
  * max(1, probeMedian / probeRef) before judging. On a quiet run the
  * correction is exactly 1.0 and the gates are as strict as ever; a
  * genuine plan regression leaves the probes at their quiet floor and
  * still fails.
  *
  * The correction is capped ([[corrCap]]): an artifact measured under
  * >corrCap× host noise is not a measurement, and letting the divisor
  * grow without bound would wave through anything.
  */
object BenchGate {

  /** Quiet-floor reference for the probe (seconds) — set just above a
    * quiet-machine probe distribution so ordinary quiet jitter never
    * produces a spurious correction. Calibrated round 16 on an IDLE
    * host (ProbeCal, 30 warm samples: min 0.33, p50 0.38, p90 0.42,
    * max 0.43) — the probe is a 2-3-AQE-job micro-query, so its cost
    * is dominated by scheduler latency, which is exactly the signal
    * being measured. */
  val probeRef: Double = 0.45

  /** Max correction divisor — beyond this the artifact is noise. */
  val corrCap: Double = 10.0

  /** Load-correction divisor for one query: max(1, probeMed/probeRef),
    * capped. Empty/absent probes → 1.0 (pre-r16 artifacts judge as
    * before). */
  def correction(probes: Seq[Double]): Double =
    if (probes.isEmpty) 1.0
    else {
      val med = probes.sorted.apply(probes.size / 2)
      math.min(corrCap, math.max(1.0, med / probeRef))
    }

  /** Per-query probe samples from a bench.json tree ("probes" node);
    * empty map when the artifact predates probe recording. */
  def probesOf(root: com.fasterxml.jackson.databind.JsonNode)
      : Map[String, Seq[Double]] = {
    val node = root.path("probes")
    if (!node.isObject) Map.empty
    else node.fieldNames.asScala.map { q =>
      q -> node.get(q).asScala.map(_.asDouble()).toSeq
    }.toMap
  }

  /** Load-corrected per-query medians: raw median ÷ correction. */
  def correctedQueries(root: com.fasterxml.jackson.databind.JsonNode)
      : Map[String, Double] = {
    val qs = root.path("queries")
    val probes = probesOf(root)
    qs.fieldNames.asScala.map { q =>
      val raw = qs.get(q).asDouble()
      val c = correction(probes.getOrElse(q, Nil))
      q -> (if (raw < 0) raw else raw / c)
    }.toMap
  }
}
