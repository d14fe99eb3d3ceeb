package graft

/** Brute-force verification of the round-16 batch-L operators
  * (Cochran Q, order-statistic quantile CI, SAX, hysteresis, LPA,
  * retention decay) against independent in-memory references — the
  * AnalyticsOpsSpec discipline: the DuckDB hash gate proves Spark and
  * the oracle agree; these prove they agree on the RIGHT answer. */
class BatchLStatsSpec extends SparkSpecBase {
  import spark.implicits._

  private def r(x: Double, dp: Int): Double =
    BigDecimal(x).setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q_agg_cochran_q matches the textbook statistic") {
    val orders = Tables.load(spark, sf0001, "orders")
      .selectExpr("o_custkey", "o_totalprice", "o_orderpriority")
      .as[(Long, Double, String)].collect()
    val rows = orders.groupBy(_._1).values.toSeq.map { os =>
      Seq(os.exists(_._2 > 300000.0), os.exists(_._3 == "1-URGENT"),
        os.exists(_._3 == "2-HIGH")).map(b => if (b) 1L else 0L)
    }
    val g = (0 to 2).map(j => rows.map(_(j)).sum)
    val l = rows.map(_.sum)
    val num = 2.0 * (3 * g.map(x => x * x).sum - math.pow(g.sum, 2))
    val den = (3 * l.sum - l.map(x => x * x).sum).toDouble
    val q = r(num / den, 4)
    val row = SparkEntry.queries("q_agg_cochran_q")(spark, sf0001)
      .selectExpr("n_blocks", "g_spend", "g_urgent", "g_high", "q")
      .as[(Long, Long, Long, Long, Double)].head()
    assert(row._1 == rows.size.toLong)
    assert((row._2, row._3, row._4) == ((g(0), g(1), g(2))))
    assert(math.abs(row._5 - q) < 1e-9, s"q ${row._5} vs reference $q")
  }

  test("q_agg_quantile_ci picks the exact order statistics") {
    val vals = Tables.load(spark, sf0001, "events")
      .filter("value IS NOT NULL")
      .selectExpr("event_type", "value").as[(String, Double)].collect()
    val got = SparkEntry.queries("q_agg_quantile_ci")(spark, sf0001)
      .selectExpr("event_type", "n", "p50", "ci_lo", "ci_hi")
      .as[(String, Long, Double, Double, Double)].collect()
      .map(t => t._1 -> t).toMap
    vals.groupBy(_._1).foreach { case (t, vs) =>
      val sorted = vs.map(_._2).sorted
      val n = sorted.length
      def stat(rank: Long): Double = sorted((rank - 1).toInt)
      val rMed = math.floor((n + 1) / 2.0).toLong
      val rLo = math.max(1L,
        math.floor(n / 2.0 - 1.96 * math.sqrt(n.toDouble) / 2).toLong)
      val rHi = math.min(n.toLong,
        math.ceil(n / 2.0 + 1.96 * math.sqrt(n.toDouble) / 2).toLong + 1)
      val (gn, p50, lo, hi) =
        (got(t)._2, got(t)._3, got(t)._4, got(t)._5)
      assert(gn == n.toLong)
      assert(p50 == stat(rMed), s"$t p50 $p50 vs ${stat(rMed)}")
      assert(lo == stat(rLo) && hi == stat(rHi))
      // the CI must bracket the median and be data-ordered
      assert(lo <= p50 && p50 <= hi)
    }
  }

  test("q_ts_sax words match an in-memory PAA + breakpoint pass") {
    val daily = Tables.load(spark, sf0001, "events")
      .selectExpr("event_type",
        "CAST(unix_micros(ts) / 86400000000 AS LONG)")
      .as[(String, Long)].collect()
      .groupBy(identity).map { case ((t, d), es) => (t, d, es.size) }
    val got = SparkEntry.queries("q_ts_sax")(spark, sf0001)
      .selectExpr("event_type", "sax_word").as[(String, String)]
      .collect().toMap
    daily.groupBy(_._1).foreach { case (t, ds) =>
      val y = ds.toSeq.sortBy(_._2).map(_._3.toDouble)
      val n = y.size
      val m = y.sum / n
      val sd = math.sqrt(
        (y.map(v => v * v).sum - n * m * m) / (n - 1))
      val word = y.grouped(5).map { seg =>
        val z = (seg.sum / seg.size - m) / sd
        if (z < -0.6745) "a"
        else if (z < 0.0) "b"
        else if (z < 0.6745) "c"
        else "d"
      }.mkString
      assert(got(t) == word, s"$t: ${got(t)} vs reference $word")
    }
  }

  test("q_ts_hysteresis episodes match a sequential state machine") {
    val daily = Tables.load(spark, sf0001, "events")
      .selectExpr("event_type",
        "CAST(unix_micros(ts) / 86400000000 AS LONG)")
      .as[(String, Long)].collect()
      .groupBy(identity).map { case ((t, d), es) => (t, d, es.size) }
    val got = SparkEntry.queries("q_ts_hysteresis")(spark, sf0001)
      .selectExpr("event_type", "n_alert_days", "n_episodes",
        "longest_run")
      .as[(String, Long, Long, Long)].collect()
      .map(t => t._1 -> (t._2, t._3, t._4)).toMap
    daily.groupBy(_._1).foreach { case (t, ds) =>
      val y = ds.toSeq.sortBy(_._2).map(_._3.toDouble)
      val n = y.size
      val m = y.sum / n
      val sd = math.sqrt(
        (y.map(v => v * v).sum - n * m * m) / (n - 1))
      var state = 0
      val states = y.map { v =>
        if (v > m + sd) state = 1 else if (v < m) state = 0
        state
      }
      val alertDays = states.count(_ == 1).toLong
      val runs = scala.collection.mutable.Buffer[Int]()
      var cur = 0
      states.foreach { s =>
        if (s == 1) cur += 1
        else { if (cur > 0) runs += cur; cur = 0 }
      }
      if (cur > 0) runs += cur
      assert(got(t) == ((alertDays, runs.size.toLong,
        if (runs.isEmpty) 0L else runs.max.toLong)),
        s"$t: ${got(t)} vs (${alertDays}, ${runs.size}, " +
          s"${if (runs.isEmpty) 0 else runs.max})")
    }
  }

  test("q_graph_lpa matches an in-memory synchronous propagation") {
    val items = Tables.load(spark, sf0001, "lineitem")
      .filter("l_partkey % 8 = 0")
      .selectExpr("l_orderkey", "l_partkey").distinct()
      .as[(Long, Long)].collect()
    val edges = items.groupBy(_._1).values.flatMap { ps =>
      val s = ps.map(_._2).distinct.sorted
      for (i <- s.indices; j <- i + 1 until s.size) yield (s(i), s(j))
    }.toSet
    val nbr = edges.toSeq.flatMap { case (u, v) =>
      Seq(u -> v, v -> u) }.groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2) }
    var lab: Map[Long, Long] = nbr.keys.map(k => k -> k).toMap
    for (_ <- 1 to 3) {
      lab = nbr.map { case (w, xs) =>
        val votes = xs.map(lab).groupBy(identity)
          .map { case (l, v) => (l, v.size) }
        val best = votes.toSeq.minBy { case (l, c) => (-c, l) }
        w -> best._1
      }
    }
    val census = lab.values.groupBy(identity)
      .map { case (l, v) => (l, v.size.toLong) }
      .toSeq.sortBy { case (l, c) => (-c, l) }.take(10)
    val got = SparkEntry.queries("q_graph_lpa")(spark, sf0001)
      .as[(Long, Long)].collect().toSeq
    assert(got == census, s"$got vs reference $census")
  }

  test("q_evt_decay matches a direct observable-pooled OLS fit") {
    val ev = Tables.load(spark, sf0001, "events")
      .filter("user_id IS NOT NULL")
      .selectExpr("user_id",
        "CAST(date_trunc('week', ts) AS DATE)")
      .as[(Long, java.sql.Date)].collect().distinct
    val byUser = ev.groupBy(_._1).map { case (u, ws) =>
      u -> ws.map(_._2.toLocalDate.toEpochDay).distinct
    }
    val ko = byUser.values.flatMap { ws =>
      val c = ws.min
      ws.map(w => (c, ((w - c) / 7).toInt))
    }.toSeq
    val grid = ko.groupBy(identity)
      .map { case ((c, k), v) => (c, k, v.size.toLong) }.toSeq
    val sizes = grid.collect { case (c, 0, n) => c -> n }.toMap
    val maxOff = grid.groupBy(_._1)
      .map { case (c, g) => c -> g.map(_._2).max }
    val h = maxOff.values.max
    val pts = (1 to h).flatMap { k =>
      val elig = sizes.collect {
        case (c, n) if maxOff(c) >= k => n }.sum
      val ret = grid.collect { case (_, `k`, n) => n }.sum
      if (ret > 0) Some((k, ret.toDouble / elig)) else None
    }
    val lr = pts.map { case (k, rate) =>
      (k.toDouble, r(math.log(rate), 8)) }
    val np = lr.size
    val sx = lr.map(_._1).sum; val sy = lr.map(_._2).sum
    val sxy = lr.map(p => p._1 * p._2).sum
    val sx2 = lr.map(p => p._1 * p._1).sum
    val b = (np * sxy - sx * sy) / (np * sx2 - sx * sx)
    val row = SparkEntry.queries("q_evt_decay")(spark, sf0001)
      .selectExpr("n_cohorts", "n_points", "decay_per_week")
      .as[(Long, Long, Double)].head()
    assert(row._1 == sizes.size.toLong && row._2 == np.toLong)
    assert(math.abs(row._3 - r(b, 4)) < 2e-4,
      s"decay ${row._3} vs reference ${r(b, 4)}")
  }
}
