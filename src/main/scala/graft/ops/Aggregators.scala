package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed aggregators (§2.L q_udaf_wavg): the `Aggregator[IN,BUF,OUT]`
  * + `functions.udaf` surface, exercised deliberately (SURVEY.md §7.3).
  *
  * The buffer holds scaled integer sums (price/weight have ≤2 decimals in
  * the warehouse), so partial aggregation is exact and merge order —
  * which Spark does not guarantee — cannot change the result. A double
  * buffer here would be a nondeterminism bug at scale, the same class as
  * unordered double sums (SURVEY.md §7.5.2).
  */
object Aggregators {

  /** Exact decimal sums (price×weight, weight). BigDecimal, not scaled
    * longs: a cents-scaled long product is ~5e10 per row, which wraps
    * silently past ~2e8 rows per group — far below the 100 TB design
    * point. Spark encodes these as DECIMAL(38,18): exact and 38 digits
    * of headroom. */
  case class WavgBuf(sumPW: BigDecimal, sumW: BigDecimal)

  /** Weighted average of `price` weighted by `weight`, both 2-decimal
    * doubles; result rounded HALF_UP to 4 decimals. */
  class WeightedAvg extends Aggregator[(Double, Double), WavgBuf, Double] {
    private def d2(x: Double): BigDecimal =
      BigDecimal.valueOf(x).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    override def zero: WavgBuf = WavgBuf(BigDecimal(0), BigDecimal(0))
    override def reduce(b: WavgBuf, in: (Double, Double)): WavgBuf =
      WavgBuf(b.sumPW + d2(in._1) * d2(in._2), b.sumW + d2(in._2))
    override def merge(a: WavgBuf, b: WavgBuf): WavgBuf =
      WavgBuf(a.sumPW + b.sumPW, a.sumW + b.sumW)
    override def finish(b: WavgBuf): Double =
      if (b.sumW == 0) Double.NaN
      else {
        // mirror the oracle's evaluation: exact decimal sums → double →
        // divide → round(4)
        BigDecimal.valueOf(b.sumPW.toDouble / b.sumW.toDouble)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    override def bufferEncoder: Encoder[WavgBuf] = Encoders.product[WavgBuf]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Misra-Gries heavy-hitter summary buffer: ≤ k tracked keys plus the
    * processed-row count (the error denominator). */
  case class MgBuf(counts: Map[String, Long], n: Long)

  /** Misra-Gries heavy hitters with k counters — the DETERMINISTIC
    * frequency sketch next to q_agg_countmin's randomized one: fixed
    * memory (k entries), mergeable partials, and a hard guarantee
    * instead of a probabilistic one — every key with true count
    * > n/(k+1) is present, and every estimate underestimates by at most
    * n/(k+1) (Agarwal et al., "Mergeable Summaries": the bound SURVIVES
    * arbitrary merge trees, which is what makes it a valid Spark
    * aggregation — Spark guarantees nothing about partial merge order).
    *
    * reduce: hit → +1; room → insert; full → decrement ALL by 1 and
    * drop zeros (the classic k-way cancellation). merge: sum maps, and
    * if over k keys subtract the (k+1)-th largest count from all, drop
    * ≤0 — the merge-side cancellation that preserves the bound. When
    * the key domain has ≤ k distinct values no cancellation ever fires
    * and the summary is EXACT — the registered query runs in that
    * regime (oracle = plain counts); the eviction regime is spec-gated
    * against exact counts on a >k domain. */
  class MisraGries(k: Int) extends Aggregator[String, MgBuf, Map[String, Long]] {
    require(k >= 1, s"misra-gries: k must be >= 1, got $k")
    override def zero: MgBuf = MgBuf(Map.empty, 0L)
    override def reduce(b: MgBuf, key: String): MgBuf = {
      val c = b.counts
      val next =
        if (c.contains(key)) c.updated(key, c(key) + 1)
        else if (c.size < k) c.updated(key, 1L)
        else c.flatMap { case (kk, v) =>
          if (v > 1) Some(kk -> (v - 1)) else None
        }
      MgBuf(next, b.n + 1)
    }
    override def merge(a: MgBuf, b: MgBuf): MgBuf = {
      var m = a.counts
      b.counts.foreach { case (kk, v) =>
        m = m.updated(kk, m.getOrElse(kk, 0L) + v)
      }
      if (m.size > k) {
        // (k+1)-th largest count = the cancellation quantum
        val d = m.values.toSeq.sorted(Ordering[Long].reverse)(k)
        m = m.flatMap { case (kk, v) =>
          if (v > d) Some(kk -> (v - d)) else None
        }
      }
      MgBuf(m, a.n + b.n)
    }
    override def finish(b: MgBuf): Map[String, Long] = b.counts
    override def bufferEncoder: Encoder[MgBuf] = Encoders.product[MgBuf]
    override def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[Map[String, Long]]()
  }
}
