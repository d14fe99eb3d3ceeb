package graft

/** Brute-force verification of the round-16 batch-Q operators
  * (Hurst R/S, EMA crossover, Hoeffding CI, graph power-law tail,
  * multiline CSV) against independent in-memory references. */
class BatchQStatsSpec extends SparkSpecBase {
  import spark.implicits._

  private def r(x: Double, dp: Int): Double =
    BigDecimal(x).setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble

  private lazy val daily: Map[String, Seq[Double]] =
    Tables.load(spark, sf0001, "events")
      .selectExpr("event_type",
        "CAST(unix_micros(ts) / 86400000000 AS LONG)")
      .as[(String, Long)].collect()
      .groupBy(identity).map { case ((t, d), es) => (t, d, es.size) }
      .groupBy(_._1).map { case (t, ds) =>
        t -> ds.toSeq.sortBy(_._2).map(_._3.toDouble)
      }

  test("q_ts_hurst matches an in-memory R/S computation") {
    val got = SparkEntry.queries("q_ts_hurst")(spark, sf0001)
      .selectExpr("event_type", "h").as[(String, Double)]
      .collect().toMap
    daily.foreach { case (t, y) =>
      val pts = Seq(5, 10, 15).flatMap { m =>
        val rss = y.grouped(m).filter(_.size == m).flatMap { blk =>
          val mean = blk.sum / m
          val cums = blk.map(_ - mean).scanLeft(0.0)(_ + _).drop(1)
          val rr = cums.max - cums.min
          val s = math.sqrt(blk.map(v => (v - mean) * (v - mean))
            .sum / m)
          if (s == 0.0) None else Some(r(rr / s, 8))
        }.toSeq
        if (rss.isEmpty) None
        else {
          val mrs = rss.sum / rss.size
          if (mrs <= 0) None
          else Some((r(math.log(m), 8), r(math.log(mrs), 8)))
        }
      }
      val n = pts.size
      val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
      val sxy = pts.map(p => p._1 * p._2).sum
      val sx2 = pts.map(p => p._1 * p._1).sum
      val h = (n * sxy - sx * sy) / (n * sx2 - sx * sx)
      assert(math.abs(got(t) - r(h, 4)) < 2e-3,
        s"$t: h ${got(t)} vs reference ${r(h, 4)}")
    }
  }

  test("q_win_ema_cross matches a sequential crossover scan") {
    val got = SparkEntry.queries("q_win_ema_cross")(spark, sf0001)
      .selectExpr("event_type", "n_crossings", "fast_above")
      .as[(String, Long, Int)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    daily.foreach { case (t, y) =>
      def ema(decay: Double, i: Int): Double = {
        val terms = (0 to 7).flatMap { k =>
          if (i - k < 0) None
          else Some((y(i - k) * math.pow(decay, k),
            math.pow(decay, k)))
        }
        terms.map(_._1).sum / terms.map(_._2).sum
      }
      val states = y.indices.map(i =>
        if (ema(0.5, i) > ema(0.75, i)) 1 else 0)
      val crossings = states.sliding(2).count(w => w(0) != w(1))
      assert(got(t) == ((crossings.toLong, states.last)),
        s"$t: ${got(t)} vs ($crossings, ${states.last})")
    }
  }

  test("q_agg_hoeffding brackets the mean and beats CLT width") {
    val rows = SparkEntry.queries("q_agg_hoeffding")(spark, sf0001)
      .selectExpr("event_type", "mean", "hoeff_lo", "hoeff_hi",
        "hoeff_half", "clt_half", "conservatism")
      .as[(String, Double, Double, Double, Double, Double, Double)]
      .collect()
    rows.foreach { case (t, m, lo, hi, hh, ch, cons) =>
      // m/hh are independently 4-dp rounded, so the reconstructed
      // bounds can differ by one rounding grain
      assert(math.abs(lo - (m - hh)) <= 1.1e-4 &&
        math.abs(hi - (m + hh)) <= 1.1e-4, s"$t: bounds")
      assert(hh > ch, s"$t: hoeffding not wider")
      assert(math.abs(cons - hh / ch) < 2e-3, s"$t: ratio")
    }
  }

  test("q_agg_hoeffding's hard-coded support bound holds on the fixture") {
    // the op pins B = 600 (the [0, 600] support the interval is valid
    // for); a fixture refresh with values outside that range would
    // silently produce a TOO-NARROW "assumption-free" interval while
    // still hash-matching the oracle (r16 advisor note) — this guard
    // makes such a refresh fail loudly instead
    val (lo, hi) = Tables.load(spark, sf0001, "events")
      .filter(org.apache.spark.sql.functions.col("value").isNotNull)
      .selectExpr("CAST(min(value) AS DOUBLE)",
        "CAST(max(value) AS DOUBLE)")
      .as[(Double, Double)].head()
    assert(lo >= 0.0 && hi <= 600.0,
      s"events.value range [$lo, $hi] escapes the pinned [0, 600] " +
        "support — update q_agg_hoeffding's B (and its oracle) together")
  }

  test("q_graph_powerlaw matches a direct Hill computation") {
    val items = Tables.load(spark, sf0001, "lineitem")
      .selectExpr("l_orderkey", "l_partkey").distinct()
      .as[(Long, Long)].collect()
    val edges = items.groupBy(_._1).values.flatMap { ps =>
      val s0 = ps.map(_._2).distinct.sorted
      for (i <- s0.indices; j <- i + 1 until s0.size)
        yield (s0(i), s0(j))
    }.toSet
    val deg = edges.toSeq.flatMap { case (u, v) => Seq(u, v) }
      .groupBy(identity).map { case (p, v) => p -> v.size }
    val sorted = deg.values.toSeq.sorted(Ordering[Int].reverse)
    val xmin = sorted.zipWithIndex
      .collectFirst { case (d, i) if i + 1 >= 50 => d }.get
    val tail = sorted.takeWhile(_ >= xmin)
    val st = deg.values.toSeq.filter(_ >= xmin)
      .map(d => r(math.log(d.toDouble / xmin), 8)).sum
    val alpha = 1.0 + tail.size / st
    val row = SparkEntry.queries("q_graph_powerlaw")(spark, sf0001)
      .selectExpr("n_nodes", "xmin", "k_tail", "alpha")
      .as[(Long, Long, Long, Double)].head()
    assert(row._1 == deg.size.toLong)
    assert(row._2 == xmin.toLong && row._3 == tail.size.toLong)
    assert(math.abs(row._4 - r(alpha, 4)) < 2e-3,
      s"alpha ${row._4} vs reference ${r(alpha, 4)}")
  }

  test("q_src_csv_multiline round-trips embedded newlines") {
    val got = SparkEntry.queries("q_src_csv_multiline")(spark, sf0001)
      .selectExpr("sum(n_chars)", "sum(n_multiline)", "sum(n_docs)")
      .as[(Long, Long, Long)].head()
    val base = Tables.load(spark, sf0001, "documents")
      .selectExpr(
        "sum(length(replace(text, ' a ', chr(10) || 'a ')))",
        "sum(CASE WHEN contains(replace(text, ' a ', " +
          "chr(10) || 'a '), chr(10)) THEN 1 ELSE 0 END)",
        "count(*)")
      .as[(Long, Long, Long)].head()
    assert(got == base, s"$got vs $base")
    assert(got._2 > 0, "no multiline docs exercised")
  }
}
