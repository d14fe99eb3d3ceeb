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
}
