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

  /** (sum of price×weight scaled 1e4, sum of weight scaled 1e2). */
  case class WavgBuf(sumPW: Long, sumW: Long)

  /** Weighted average of `price` weighted by `weight`, both 2-decimal
    * doubles; result rounded HALF_UP to 4 decimals. */
  class WeightedAvg extends Aggregator[(Double, Double), WavgBuf, Double] {
    override def zero: WavgBuf = WavgBuf(0L, 0L)
    override def reduce(b: WavgBuf, in: (Double, Double)): WavgBuf =
      WavgBuf(b.sumPW + math.round(in._1 * 100) * math.round(in._2 * 100),
        b.sumW + math.round(in._2 * 100))
    override def merge(a: WavgBuf, b: WavgBuf): WavgBuf =
      WavgBuf(a.sumPW + b.sumPW, a.sumW + b.sumW)
    override def finish(b: WavgBuf): Double =
      if (b.sumW == 0L) Double.NaN
      else {
        // mirror the oracle's evaluation: exact decimal sums → double →
        // divide → round(4)
        val num = (BigDecimal(b.sumPW) / 10000).toDouble
        val den = (BigDecimal(b.sumW) / 100).toDouble
        BigDecimal.valueOf(num / den)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    override def bufferEncoder: Encoder[WavgBuf] = Encoders.product[WavgBuf]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
