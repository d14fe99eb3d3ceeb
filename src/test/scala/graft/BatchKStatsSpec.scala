package graft

/** Brute-force verification of the round-16 batch-K operators
  * (McNemar, Wilcoxon signed-rank, Poisson rate ratio, KPSS, Croston,
  * switchback, sign-RFF MMD). The DuckDB oracle hash is the primary
  * gate; these pin the SEMANTICS against an independent in-memory
  * reference so a wrong-but-self-consistent oracle pair cannot slip
  * through (the AnalyticsOpsSpec discipline). */
class BatchKStatsSpec extends SparkSpecBase {
  import spark.implicits._

  /** events at sf0.001 as (user, epoch_day, hour, event_type, value,
    * value_is_null). */
  private lazy val events
      : Array[(Long, Long, Int, String, Double, Boolean)] =
    Tables.load(spark, sf0001, "events")
      .selectExpr("user_id", "CAST(unix_micros(ts) / 86400000000 AS LONG)",
        "CAST(hour(ts) AS INT)", "event_type",
        "coalesce(value, 0.0)", "value IS NULL")
      .as[(Long, Long, Int, String, Double, Boolean)].collect()

  private def r(x: Double, dp: Int): Double =
    BigDecimal(x).setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q_agg_mcnemar matches the set-algebra cell counts") {
    val orders = Tables.load(spark, sf0001, "orders")
      .selectExpr("o_custkey", "o_totalprice", "o_orderpriority")
      .as[(Long, Double, String)].collect()
    val flags = orders.groupBy(_._1).values.toSeq.map { os =>
      (os.exists(_._2 > 300000.0), os.exists(_._3 == "1-URGENT"))
    }
    val b = flags.count { case (a, bb) => a && !bb }
    val c = flags.count { case (a, bb) => !a && bb }
    val chi2 =
      if (b + c == 0) 0.0
      else r(math.pow(math.max(math.abs(b - c) - 1, 0), 2).toDouble
        / (b + c), 4)
    val row = SparkEntry.queries("q_agg_mcnemar")(spark, sf0001)
      .selectExpr("n", "n11", "n10", "n01", "n00", "chi2_cc")
      .as[(Long, Long, Long, Long, Long, Double)].head()
    assert(row._1 == flags.size.toLong)
    assert(row._2 == flags.count(f => f._1 && f._2).toLong)
    assert(row._3 == b.toLong && row._4 == c.toLong)
    assert(row._5 == flags.count(f => !f._1 && !f._2).toLong)
    assert(math.abs(row._6 - chi2) < 1e-9,
      s"chi2_cc ${row._6} vs reference $chi2")
  }

  test("q_agg_wilcoxon matches a hand-rolled signed-rank test") {
    val ev = events.filter(e => e._1 >= 0 && !e._6)
    val d0 = ev.map(_._2).min
    val d1 = ev.map(_._2).max
    val mid = d0 + (d1 - d0) / 2
    // mirror the query: exact 2-dp decimal sums, one double division,
    // 8-dp rounded diff
    def mean(vs: Seq[Double]): Double = {
      val s = vs.map(v => BigDecimal(v)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum
      s.toDouble / vs.size
    }
    val byUser = ev.groupBy(_._1)
    val diffs = byUser.toSeq.flatMap { case (_, es) =>
      val (pre, post) = es.partition(_._2 < mid)
      if (pre.isEmpty || post.isEmpty) None
      else {
        val dd = BigDecimal(mean(post.map(_._5).toSeq) -
          mean(pre.map(_._5).toSeq))
          .setScale(8, BigDecimal.RoundingMode.HALF_UP)
        if (dd == 0) None else Some(dd)
      }
    }
    val n = diffs.size
    // average ranks over |d| with ties
    val sorted = diffs.map(d => (d.abs, d.signum)).sortBy(_._1)
    val groups = sorted.zipWithIndex.groupBy(_._1._1)
    var wPlus = 0.0
    var tsum = 0L
    groups.foreach { case (_, g) =>
      val ranks = g.map(_._2 + 1)
      val avg = ranks.sum.toDouble / ranks.size
      wPlus += avg * g.count(_._1._2 > 0)
      val t = g.size.toLong
      tsum += t * t * t - t
    }
    val mu = n.toLong * (n + 1) / 4.0
    val v = n.toLong * (n + 1) * (2L * n + 1) / 24.0 - tsum / 48.0
    val z = r((wPlus - mu) / math.sqrt(v), 4)
    val row = SparkEntry.queries("q_agg_wilcoxon")(spark, sf0001)
      .selectExpr("n_pairs", "w_plus", "z")
      .as[(Long, Double, Double)].head()
    assert(row._1 == n.toLong)
    assert(math.abs(row._2 - wPlus) < 1e-9,
      s"w_plus ${row._2} vs reference $wPlus")
    assert(math.abs(row._3 - z) < 1e-9, s"z ${row._3} vs reference $z")
  }

  test("q_agg_rate_ratio matches direct counts and the Wald CI") {
    val ev = events.filter(_._1 >= 0)
    def side(arm: Long) = {
      val es = ev.filter(e => e._1 % 2 == arm)
      val errs = es.count(_._4 == "error").toLong
      val pt = es.map(e => (e._1, e._2)).distinct.length.toLong
      (errs, pt)
    }
    val (a, ptT) = side(1)
    val (b, ptC) = side(0)
    val rr = (a.toDouble / ptT) / (b.toDouble / ptC)
    val half = 1.96 * math.sqrt(1.0 / a + 1.0 / b)
    val row = SparkEntry.queries("q_agg_rate_ratio")(spark, sf0001)
      .selectExpr("ev_t", "pt_t", "ev_c", "pt_c", "rate_ratio",
        "ci_lo", "ci_hi")
      .as[(Long, Long, Long, Long, Double, Double, Double)].head()
    assert((row._1, row._2, row._3, row._4) == ((a, ptT, b, ptC)))
    assert(math.abs(row._5 - r(rr, 6)) < 1e-9)
    assert(math.abs(row._6 - r(math.exp(math.log(rr) - half), 6)) < 1e-9)
    assert(math.abs(row._7 - r(math.exp(math.log(rr) + half), 6)) < 1e-9)
  }

  test("q_ts_kpss matches a double-precision textbook computation") {
    val byType = events.groupBy(_._4)
    val got = SparkEntry.queries("q_ts_kpss")(spark, sf0001)
      .selectExpr("event_type", "eta").as[(String, Double)]
      .collect().toMap
    byType.foreach { case (t, es) =>
      val y = es.groupBy(_._2).toSeq.sortBy(_._1)
        .map(_._2.size.toDouble)
      val n = y.size
      val m = y.sum / n
      val e = y.map(_ - m)
      val s = e.scanLeft(0.0)(_ + _).drop(1)
      def gamma(j: Int): Double =
        (j until n).map(i => e(i) * e(i - j)).sum / n
      val lrv = gamma(0) + 2.0 * (1 to 4)
        .map(j => (1.0 - j / 5.0) * gamma(j)).sum
      val eta = s.map(x => x * x).sum / (n.toDouble * n * lrv)
      assert(math.abs(got(t) - eta) < 1e-3,
        s"$t: eta ${got(t)} vs reference $eta")
    }
  }

  test("q_ts_croston matches a hand-rolled two-EMA smoother") {
    val demand = events.filter(e => !e._6 && e._5 > 240.0)
      .groupBy(e => (e._4, e._2)).map { case ((t, d), es) =>
        (t, d, es.size.toDouble)
      }.toSeq
    def ema8(xs: Seq[Option[Double]]): Option[Double] = {
      // at readout position xs.last; lags 0..7 back from the end
      val terms = (0 to 7).flatMap { i =>
        val idx = xs.size - 1 - i
        if (idx < 0) None
        else xs(idx).map(v => (v * math.pow(0.5, i), math.pow(0.5, i)))
      }
      val den = terms.map(_._2).sum
      if (den == 0.0) None else Some(terms.map(_._1).sum / den)
    }
    val got = SparkEntry.queries("q_ts_croston")(spark, sf0001)
      .selectExpr("event_type", "n_demand_days", "z_hat", "p_hat")
      .as[(String, Long, Option[Double], Option[Double])]
      .collect().map(t => t._1 -> (t._2, t._3, t._4)).toMap
    demand.groupBy(_._1).foreach { case (t, ds) =>
      val seq = ds.sortBy(_._2)
      val z = seq.map(x => Option(x._3))
      val p =
        if (seq.size < 2) Seq.empty[Double]
        else seq.map(_._2).sliding(2).toSeq
          .map(w => (w(1) - w(0)).toDouble)
      val pOpt = None +: p.map(Option(_))
      val zh = ema8(z).map(r(_, 4))
      val ph = ema8(pOpt.take(seq.size)).map(r(_, 4))
      val (nd, gz, gp) = got(t)
      assert(nd == seq.size.toLong)
      assert(zh.isDefined == gz.isDefined &&
        zh.forall(e => math.abs(e - gz.get) < 1e-9),
        s"$t: z_hat $gz vs reference $zh")
      assert(ph.isDefined == gp.isDefined &&
        ph.forall(e => math.abs(e - gp.get) < 1e-9),
        s"$t: p_hat $gp vs reference $ph")
    }
  }

  test("q_evt_switchback matches window-mean Welch inference") {
    val wins = events.filter(!_._6)
      .groupBy(e => (e._2, e._3 / 6)).toSeq.map { case ((d, blk), es) =>
        val sv = es.map(e => BigDecimal(e._5)
          .setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum
        val m = r(sv.toDouble / es.size, 4)
        val arm = (d * 4 + blk) % 2
        (arm, m)
      }
    def stats(arm: Long) = {
      val ms = wins.filter(_._1 == arm).map(_._2)
      val n = ms.size
      val mean = ms.sum / n
      val v = ms.map(x => (x - mean) * (x - mean)).sum / (n - 1)
      (n, mean, v)
    }
    val (nt, mt, vt) = stats(1)
    val (nc, mc, vc) = stats(0)
    val se = math.sqrt(vt / nt + vc / nc)
    val row = SparkEntry.queries("q_evt_switchback")(spark, sf0001)
      .selectExpr("n_win_t", "n_win_c", "mean_t", "mean_c", "t_stat")
      .as[(Long, Long, Double, Double, Double)].head()
    assert(row._1 == nt.toLong && row._2 == nc.toLong)
    assert(math.abs(row._3 - r(mt, 4)) < 1e-9)
    assert(math.abs(row._4 - r(mc, 4)) < 1e-9)
    assert(math.abs(row._5 - r((mt - mc) / se, 4)) < 2e-4,
      s"t_stat ${row._5} vs reference ${r((mt - mc) / se, 4)}")
  }

  test("q_vec_mmd matches an exact integer replication") {
    val emb = Tables.load(spark, sf0001, "embeddings")
      .selectExpr("vec_id", "label", "embedding")
      .as[(Long, Int, Seq[Float])].collect()
    val weights: Array[Array[Long]] = Array.tabulate(32, 64) { (k, d) =>
      val i = k.toLong * 64 + d
      if (((i * 2654435761L) % 4294967296L) / 65536 % 2 == 0) 1L
      else -1L
    }
    val signs = emb.map { case (id, lab, v) =>
      val q = v.map(x => math.floor(x.toDouble * 1000).toLong)
      val sg = weights.map { wk =>
        val dot = q.zip(wk).map { case (x, w) => x * w }.sum
        java.lang.Long.signum(dot)
      }
      (id, lab, sg)
    }
    def mmd(grp: ((Long, Int)) => Boolean): (Double, Long, Long) = {
      val (ga, gb) = signs.partition(s => grp((s._1, s._2)))
      val terms = (0 until 32).map { k =>
        val m1 = ga.map(_._3(k)).sum.toDouble / ga.length
        val m0 = gb.map(_._3(k)).sum.toDouble / gb.length
        BigDecimal((m1 - m0) * (m1 - m0))
          .setScale(8, BigDecimal.RoundingMode.HALF_UP)
      }
      (r(terms.sum.toDouble / 32, 6), ga.length.toLong, gb.length.toLong)
    }
    val (mp, npa, npb) = mmd { case (id, _) => id % 2 == 0 }
    val (ml, nla, nlb) = mmd { case (_, lab) => lab < 5 }
    val got = SparkEntry.queries("q_vec_mmd")(spark, sf0001)
      .selectExpr("split", "n_a", "n_b", "mmd2", "drift_flag")
      .as[(String, Long, Long, Double, Int)].collect()
      .map(t => t._1 -> (t._2, t._3, t._4, t._5)).toMap
    assert(got("parity") ==
      ((npa, npb, mp, if (mp > 2.0 * (1.0 / npa + 1.0 / npb)) 1 else 0)))
    assert(got("label") ==
      ((nla, nlb, ml, if (ml > 2.0 * (1.0 / nla + 1.0 / nlb)) 1 else 0)))
    // the discrimination property (parity ≪ label) is asserted on the
    // sf0.01 fixture, whose label clusters separate; the sf0.001
    // slice's label halves happen not to
    val bigger = SparkEntry.queries("q_vec_mmd")(spark, sf001)
      .selectExpr("split", "mmd2", "drift_flag")
      .as[(String, Double, Int)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    assert(bigger("parity")._1 < bigger("label")._1)
    assert(bigger("parity")._2 == 0 && bigger("label")._2 == 1)
  }
}
