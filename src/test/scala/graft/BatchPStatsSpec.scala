package graft

/** Brute-force verification of the round-16 batch-P operators
  * (Bayes-Beta A/B, partial correlation, Cronbach's α, CCF, peaks,
  * systematic sampling) against independent in-memory references. */
class BatchPStatsSpec extends SparkSpecBase {
  import spark.implicits._

  private def r(x: Double, dp: Int): Double =
    BigDecimal(x).setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble

  private lazy val events
      : Array[(Long, Long, Int, Int, String, Double, Boolean)] =
    Tables.load(spark, sf0001, "events")
      .selectExpr("user_id",
        "CAST(unix_micros(ts) / 86400000000 AS LONG)",
        "CAST(hour(ts) AS INT)", "CAST(dayofweek(ts) AS INT)",
        "event_type", "coalesce(value, 0.0)", "value IS NULL")
      .as[(Long, Long, Int, Int, String, Double, Boolean)].collect()

  test("q_agg_bayes_beta matches closed-form Beta posteriors") {
    val users = events.groupBy(_._1).toSeq.map { case (u, es) =>
      (u % 2, if (es.exists(e => e._5 == "purchase" && e._6 > 90)) 1
              else 0)
    }
    def arm(a: Long) = {
      val g = users.filter(_._1 == a)
      (g.size.toLong, g.map(_._2).sum.toLong)
    }
    val (nt, ct) = arm(1); val (nc, cc) = arm(0)
    def m(a: Long, b: Long) = a.toDouble / (a + b)
    def v(a: Long, b: Long) =
      (a * b).toDouble / ((a + b).toDouble * (a + b) * (a + b + 1))
    val z = (m(ct + 1, nt - ct + 1) - m(cc + 1, nc - cc + 1)) /
      math.sqrt(v(ct + 1, nt - ct + 1) + v(cc + 1, nc - cc + 1))
    val row = SparkEntry.queries("q_agg_bayes_beta")(spark, sf0001)
      .selectExpr("n_t", "c_t", "n_c", "c_c", "post_mean_t", "z_post")
      .as[(Long, Long, Long, Long, Double, Double)].head()
    assert((row._1, row._2, row._3, row._4) == ((nt, ct, nc, cc)))
    assert(math.abs(row._5 - r(m(ct + 1, nt - ct + 1), 4)) < 1e-9)
    assert(math.abs(row._6 - r(z, 4)) < 2e-4,
      s"z ${row._6} vs reference ${r(z, 4)}")
  }

  test("q_agg_partial_corr matches the textbook recursion") {
    val got = SparkEntry.queries("q_agg_partial_corr")(spark, sf0001)
      .selectExpr("event_type", "r_value_hour", "r_partial")
      .as[(String, Double, Double)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    events.filter(!_._7).groupBy(_._5).foreach { case (t, es) =>
      val x = es.map(e => math.round(e._6 * 100).toDouble)
      val h = es.map(_._3.toDouble)
      val z = es.map(_._4.toDouble)
      def corr(a: Seq[Double], b: Seq[Double]): Double = {
        val n = a.size
        val num = n * a.zip(b).map(p => p._1 * p._2).sum -
          a.sum * b.sum
        val den = math.sqrt(n * a.map(v => v * v).sum -
          a.sum * a.sum) *
          math.sqrt(n * b.map(v => v * v).sum - b.sum * b.sum)
        num / den
      }
      val rxh = corr(x.toSeq, h.toSeq)
      val rxz = corr(x.toSeq, z.toSeq)
      val rhz = corr(h.toSeq, z.toSeq)
      val part = (rxh - rxz * rhz) /
        math.sqrt((1 - rxz * rxz) * (1 - rhz * rhz))
      assert(math.abs(got(t)._1 - r(rxh, 4)) < 2e-4,
        s"$t rxh ${got(t)._1} vs ${r(rxh, 4)}")
      assert(math.abs(got(t)._2 - r(part, 4)) < 2e-4,
        s"$t partial ${got(t)._2} vs ${r(part, 4)}")
    }
  }

  test("q_agg_cronbach matches the item-variance formula") {
    val grid = events.groupBy(e => (e._5, e._2))
      .map { case ((t, d), es) => (t, d, es.size.toDouble) }.toSeq
    val days = grid.map(_._2).distinct
    val n = days.size
    def varOf(xs: Seq[Double], nn: Int): Double = {
      val s = xs.sum; val s2 = xs.map(v => v * v).sum
      (s2 - s * s / nn) / (nn - 1)
    }
    val svi = grid.groupBy(_._1).values
      .map(g => r(varOf(g.map(_._3).toSeq, n), 8)).sum
    val totals = grid.groupBy(_._2).values
      .map(_.map(_._3).sum).toSeq
    val vt = varOf(totals, n)
    val k = grid.map(_._1).distinct.size
    val alpha = (k.toDouble / (k - 1)) * (1 - svi / vt)
    val row = SparkEntry.queries("q_agg_cronbach")(spark, sf0001)
      .selectExpr("k_items", "n_days", "alpha")
      .as[(Long, Long, Double)].head()
    assert(row._1 == k.toLong && row._2 == n.toLong)
    assert(math.abs(row._3 - r(alpha, 4)) < 2e-3,
      s"alpha ${row._3} vs reference ${r(alpha, 4)}")
  }

  test("q_ts_ccf matches per-lag Pearson on shifted days") {
    val daily = events.groupBy(e => (e._5, e._2))
      .map { case ((t, d), es) => (t, d, es.size.toDouble) }
    val x = daily.filter(_._1 == "click").map(t => t._2 -> t._3).toMap
    val y = daily.filter(_._1 == "view").map(t => t._2 -> t._3).toMap
    val got = SparkEntry.queries("q_ts_ccf")(spark, sf0001)
      .selectExpr("lag", "n_pairs", "r")
      .as[(Int, Long, Double)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    (-3 to 3).foreach { k =>
      val pairs = x.keys.toSeq.filter(d => y.contains(d + k))
        .map(d => (x(d), y(d + k)))
      val n = pairs.size
      val (a, b) = pairs.unzip
      val num = n * pairs.map(p => p._1 * p._2).sum - a.sum * b.sum
      val den = math.sqrt(n * a.map(v => v * v).sum - a.sum * a.sum) *
        math.sqrt(n * b.map(v => v * v).sum - b.sum * b.sum)
      assert(got(k)._1 == n.toLong)
      assert(math.abs(got(k)._2 - r(num / den, 4)) < 2e-4,
        s"lag $k: ${got(k)._2} vs ${r(num / den, 4)}")
    }
  }

  test("q_ts_peaks matches a sequential scan") {
    val daily = events.groupBy(e => (e._5, e._2))
      .map { case ((t, d), es) => (t, d, es.size) }
    val got = SparkEntry.queries("q_ts_peaks")(spark, sf0001)
      .selectExpr("event_type", "n_peaks", "max_prominence")
      .as[(String, Long, Long)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    daily.groupBy(_._1).foreach { case (t, ds) =>
      val y = ds.toSeq.sortBy(_._2).map(_._3)
      val peaks = (1 until y.size - 1).filter(i =>
        y(i) > y(i - 1) && y(i) >= y(i + 1))
      val maxProm =
        if (peaks.isEmpty) 0L
        else peaks.map(i => y(i) - math.max(y(i - 1), y(i + 1)))
          .max.toLong
      assert(got(t) == ((peaks.size.toLong, maxProm)),
        s"$t: ${got(t)} vs (${peaks.size}, $maxProm)")
    }
  }

  test("q_samp_systematic keeps every k-th doc and the source mix") {
    val docs = Tables.load(spark, sf0001, "documents")
      .selectExpr("doc_id", "source").as[(Long, String)].collect()
      .sortBy(_._1)
    val k = math.max(1, docs.length / 100)
    val kept = docs.zipWithIndex.filter(_._2 % k == 0).map(_._1)
    val got = SparkEntry.queries("q_samp_systematic")(spark, sf0001)
      .selectExpr("source", "n_docs", "n_sampled", "k")
      .as[(String, Long, Long, Long)].collect()
    assert(got.map(_._4).distinct.toSeq == Seq(k.toLong))
    assert(got.map(_._3).sum == kept.length.toLong)
    val bySrc = kept.groupBy(_._2).map { case (s0, v) => s0 -> v.size }
    got.foreach { case (src, nd, ns, _) =>
      assert(ns == bySrc.getOrElse(src, 0).toLong, s"$src: $ns")
      assert(nd == docs.count(_._2 == src).toLong)
    }
  }
}
