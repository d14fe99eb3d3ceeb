package graft

import org.apache.spark.sql.functions._

/** Brute-force verification of the round-8 batch-3 operators (pagerank,
  * purge, abandon, MAD, temperature sampling, unigram LM, boilerplate).
  * The DuckDB oracle hash is the primary gate; these pin the SEMANTICS
  * against an independent in-memory reference so a
  * wrong-but-self-consistent oracle pair cannot slip through. */
class AnalyticsOpsSpec extends SparkSpecBase {
  import spark.implicits._

  /** events at sf0.001 as (user, ts_us, event_id, event_type, value). */
  private lazy val events: Array[(Long, Long, Long, String, Double)] =
    Tables.load(spark, sf0001, "events")
      .selectExpr("user_id", "unix_micros(ts)", "event_id", "event_type",
        "value")
      .as[(Long, Long, Long, String, Double)].collect()

  test("q_graph_pagerank matches a hand-rolled power iteration") {
    val pairs = events.groupBy(_._1).values.flatMap { evs =>
      val seq = evs.sortBy(e => (e._2, e._3)).map(_._4)
      seq.zip(seq.tail)
    }.toSeq
    val edgeCnt = pairs.groupBy(identity).map { case (k, v) => k -> v.size }
    val outCnt = pairs.groupBy(_._1).map { case (k, v) => k -> v.size }
    val nodes = events.map(_._4).distinct.sorted
    val n = nodes.size.toDouble
    var rank = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to 5)
      rank = nodes.map { v =>
        val in = edgeCnt.collect { case ((u, t), c) if t == v =>
          rank(u) * c.toDouble / outCnt(u) }
        v -> (0.15 / n + 0.85 * in.sum)
      }.toMap
    val got = SparkEntry.queries("q_graph_pagerank")(spark, sf0001)
      .as[(String, Double)].collect().toMap
    assert(got.keySet == nodes.toSet)
    nodes.foreach { v =>
      // query output is 4-dp rounded → half a grid cell + drift
      assert(math.abs(got(v) - rank(v)) < 6e-5,
        s"$v: got ${got(v)} expected ${rank(v)}")
    }
    // every fixture type both emits and receives transitions, so no
    // dangling leak: total rank mass stays 1
    assert(math.abs(got.values.sum - 1.0) < 1e-3)
  }

  test("q_etl_purge counts match the set-algebra cascade") {
    val custkeys = Tables.load(spark, sf0001, "customer")
      .select("c_custkey").as[Long].collect()
    val del = custkeys.filter(_ % 53 == 0).toSet
    val ords = Tables.load(spark, sf0001, "orders")
      .select("o_orderkey", "o_custkey").as[(Long, Long)].collect()
    val delOrders = ords.collect { case (o, c) if del(c) => o }.toSet
    val liKeys = Tables.load(spark, sf0001, "lineitem")
      .select("l_orderkey").as[Long].collect()
    val expected = Map(
      "customer" -> ((custkeys.count(del), custkeys.length)),
      "orders" -> ((ords.count(o => del(o._2)), ords.length)),
      "lineitem" -> ((liKeys.count(delOrders), liKeys.length)))
    val got = SparkEntry.queries("q_etl_purge")(spark, sf0001)
      .as[(String, Long, Long)].collect()
      .map { case (t, p, k) => t -> ((p.toInt, p.toInt + k.toInt)) }.toMap
    assert(got == expected, s"got $got expected $expected")
    assert(del.nonEmpty, "fixture has no deletion requests — test is vacuous")
  }

  test("q_evt_abandon matches per-view next-purchase scanning") {
    val byUser = events.groupBy(_._1)
    val expected = byUser.map { case (u, evs) =>
      val sorted = evs.sortBy(e => (e._2, e._3))
      val views = sorted.filter(_._4 == "view")
      val conv = views.count { v =>
        val later = sorted.filter(e => (e._2, e._3) != (v._2, v._3) &&
          (e._2 > v._2 || (e._2 == v._2 && e._3 > v._3)))
        val np = later.filter(_._4 == "purchase").map(_._2)
        np.nonEmpty && np.min - v._2 <= 604800000000L
      }
      u -> ((views.length.toLong, conv.toLong,
        (views.length - conv).toLong))
    }.filter(_._2._1 > 0)
    val got = SparkEntry.queries("q_evt_abandon")(spark, sf0001)
      .as[(Long, Long, Long, Long)].collect()
      .map { case (u, v, c, a) => u -> ((v, c, a)) }.toMap
    assert(got == expected)
    assert(got.values.exists(_._2 > 0), "no conversions — window too tight")
    assert(got.values.exists(_._3 > 0), "no abandons — window too loose")
  }

  test("q_agg_mad matches interpolated median/MAD with the z-rule") {
    def quantile(xs: Seq[Double]): Double = {
      val s = xs.sorted
      val pos = 0.5 * (s.size - 1)
      val lo = pos.toInt
      if (lo + 1 >= s.size) s(lo)
      else s(lo) + (pos - lo) * (s(lo + 1) - s(lo))
    }
    val expected = events.groupBy(_._4).map { case (t, evs) =>
      val vs = evs.map(_._5)
      val med = quantile(vs.toSeq)
      val devs = vs.map(v => math.abs(v - med))
      val mad = quantile(devs.toSeq)
      val out =
        if (mad == 0.0) 0
        else devs.count(d => 0.6745 * d / mad > 3.5)
      t -> ((vs.length.toLong, out.toLong, med, mad))
    }
    val got = SparkEntry.queries("q_agg_mad")(spark, sf0001)
      .as[(String, Long, Long, Double, Double)].collect()
      .map { case (t, n, o, m, d) => t -> ((n, o, m, d)) }.toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (t, (n, o, med, mad)) =>
      val (gn, go, gmed, gmad) = got(t)
      assert(gn == n && go == o, s"$t: got ($gn,$go) expected ($n,$o)")
      assert(math.abs(gmed - med) < 1e-6 && math.abs(gmad - mad) < 1e-6)
    }
  }

  test("q_samp_temperature membership is the exact sha-bucket rule") {
    val docs = Tables.load(spark, sf0001, "documents")
      .select("doc_id", "lang").as[(Long, String)].collect()
    val counts = docs.groupBy(_._2).map { case (s, d) => s -> d.size }
    val nMin = counts.values.min
    def bucket(docId: Long): Long = {
      val md = java.security.MessageDigest.getInstance("SHA-256")
      val hex = md.digest(docId.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(7), 16) % 1000000
    }
    val expected = counts.map { case (s, n) =>
      val thresh = math.floor(math.sqrt(nMin.toDouble / n) * 1e6).toLong
      s -> ((n.toLong,
        docs.count(d => d._2 == s && bucket(d._1) < thresh).toLong))
    }
    val got = SparkEntry.queries("q_samp_temperature")(spark, sf0001)
      .as[(String, Long, Long, Double)].collect()
      .map { case (s, n, k, r) => (s, n, k, r) }
    assert(got.map(g => g._1 -> ((g._2, g._3))).toMap == expected)
    // the smallest language keeps everything (rate exactly 1)
    val smallest = got.minBy(_._2)
    assert(smallest._3 == smallest._2 && smallest._4 == 1.0,
      s"smallest language must keep 100%: $smallest")
    // the head language (en, ~40% of the fixture) downsamples for real
    assert(got.exists(g => g._4 < 1.0 && g._3 < g._2),
      "no language was downsampled")
  }

  test("q_text_ngram_lm matches a hand-rolled unigram cross-entropy") {
    val docs = Tables.load(spark, sf0001, "documents")
      .select("doc_id", "text").as[(Long, String)].collect()
    val toks = docs.flatMap { case (id, t) =>
      t.toLowerCase.split(" ", -1).filter(_.nonEmpty).map(id -> _) }
    val tf = toks.groupBy(_._2).map { case (w, v) => w -> v.size }
    val tot = tf.values.sum.toDouble
    val expected = toks.groupBy(_._1).map { case (id, ts) =>
      val xent = -ts.map(t => math.log(tf(t._2) / tot)).sum / ts.size
      id -> ((ts.size.toLong, xent))
    }
    val got = SparkEntry.queries("q_text_ngram_lm")(spark, sf0001)
      .as[(Long, Long, Double)].collect()
      .map { case (id, n, x) => id -> ((n, x)) }.toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (id, (n, x)) =>
      assert(got(id)._1 == n)
      assert(math.abs(got(id)._2 - x) < 1e-4, s"doc $id: ${got(id)._2} vs $x")
    }
  }

  test("q_text_boilerplate matches a hand-rolled bigram doc-frequency") {
    val docs = Tables.load(spark, sf0001, "documents")
      .select("source", "doc_id", "text").as[(String, Long, String)]
      .collect()
    val nd = docs.groupBy(_._1).map { case (s, d) => s -> d.size }
    val sh = docs.flatMap { case (src, id, t) =>
      val w = t.toLowerCase.split(" ", -1)
      w.zip(w.tail).map { case (a, b) => s"$a $b" }.distinct
        .map(sg => (src, sg))
    }
    val cnt = sh.groupBy(identity).map { case (k, v) => k -> v.size }
    val expected = cnt.groupBy(_._1._1).map { case (src, m) =>
      val n = nd(src)
      src -> ((n.toLong, m.size.toLong,
        m.count { case (_, c) => c >= 2 && c * 10 >= n * 3 }.toLong,
        m.values.max.toDouble / n))
    }
    val got = SparkEntry.queries("q_text_boilerplate")(spark, sf0001)
      .as[(String, Long, Long, Long, Double)].collect()
      .map { case (s, n, ns, nb, mx) => s -> ((n, ns, nb, mx)) }.toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (s, (n, ns, nb, mx)) =>
      val (gn, gns, gnb, gmx) = got(s)
      assert(gn == n && gns == ns && gnb == nb,
        s"$s: got ($gn,$gns,$gnb) expected ($n,$ns,$nb)")
      assert(math.abs(gmx - mx) < 1e-6)
    }
  }

  test("Misra-Gries eviction regime: hard bounds hold vs exact counts") {
    import org.apache.spark.sql.functions.{col, udaf}
    // l_suppkey at sf0.001: ~100 distinct keys >> k = 16 counters, so
    // cancellation fires constantly — the regime the oracle can't see
    val k = 16
    val keys = Tables.load(spark, sf0001, "lineitem")
      .select(col("l_suppkey").cast("string").as("key"))
    val n = keys.count()
    val exact = keys.groupBy("key").count().as[(String, Long)]
      .collect().toMap
    val mg = udaf(new graft.ops.Aggregators.MisraGries(k),
      org.apache.spark.sql.Encoders.STRING)
    val summary = keys.agg(mg(col("key"))).head()
      .getMap[String, Long](0).toMap
    assert(summary.size <= k, s"summary holds ${summary.size} > k keys")
    val bound = n.toDouble / (k + 1)
    // guarantee 1: estimates never overshoot, and undershoot <= n/(k+1)
    summary.foreach { case (key, est) =>
      val t = exact(key)
      assert(est <= t, s"$key: est $est > true $t")
      assert(t - est <= bound, s"$key: undershoot ${t - est} > $bound")
    }
    // guarantee 2: every true heavy hitter (count > n/(k+1)) survives
    exact.filter(_._2 > bound).keys.foreach { key =>
      assert(summary.contains(key), s"heavy hitter $key evicted")
    }
    // mergeability: the same guarantee under a different merge tree
    // (repartition changes partial grouping, not the bound)
    val re = keys.repartition(7).agg(mg(col("key"))).head()
      .getMap[String, Long](0).toMap
    re.foreach { case (key, est) =>
      assert(est <= exact(key) && exact(key) - est <= bound,
        s"post-repartition bound broken for $key")
    }
  }

  test("q_graph_kcore matches an independent in-memory peeling reference") {
    // rebuild the demo graph's edge list with the same SF-held
    // contraction, then peel it EXACTLY in memory — the reference
    // shares the construction (pinned elsewhere by the triangles
    // oracle) but none of the query's iterative join machinery
    val m = Tables.load(spark, sf0001, "part")
      .selectExpr("4 * greatest(1L, (max(p_partkey) + 1L) DIV 2000)")
      .as[Long].head()
    val items = Tables.load(spark, sf0001, "lineitem")
      .filter(col("l_partkey") % m === 0)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct().as[(Long, Long)].collect()
    val edges0 = items.groupBy(_._1).values.flatMap { ps =>
      val parts = ps.map(_._2).distinct.sorted
      for (i <- parts.indices; j <- (i + 1) until parts.size)
        yield (parts(i), parts(j))
    }.toSet

    def peelRef(k: Int): Set[(Long, Long)] = {
      var e = edges0
      var changed = true
      while (changed && e.nonEmpty) {
        val deg = (e.toSeq.map(_._1) ++ e.toSeq.map(_._2))
          .groupBy(identity).map { case (n, v) => n -> v.size }
        val e2 = e.filter(p => deg(p._1) >= k && deg(p._2) >= k)
        changed = e2.size != e.size
        e = e2
      }
      e
    }
    val expected = Iterator.from(1).map { k =>
      val core = peelRef(k)
      val nodes = (core.map(_._1) ++ core.map(_._2)).size.toLong
      (k.toLong, nodes, core.size.toLong)
    }.takeWhile(_._2 > 0).toSeq

    val got = graft.queries.GraphQueries.graphKcoreCensus(spark, sf0001)
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got == expected,
      s"census mismatch:\n got      $got\n expected $expected")
    // invariants: k=1 census is the full graph; cores shrink with k
    assert(got.head == ((1L,
      (edges0.map(_._1) ++ edges0.map(_._2)).size.toLong,
      edges0.size.toLong)))
    got.sliding(2).foreach {
      case Seq((_, n1, e1), (_, n2, e2)) =>
        assert(n2 <= n1 && e2 <= e1, "core census must shrink with k")
      case _ =>
    }
  }

  /** lineitem at sf0.001 as (returnflag, quantity). */
  private lazy val liQty: Array[(String, Double)] =
    Tables.load(spark, sf0001, "lineitem")
      .selectExpr("l_returnflag", "CAST(l_quantity AS DOUBLE)")
      .as[(String, Double)].collect()

  test("q_agg_auc matches a hand-rolled mid-rank AUC") {
    val scored = events.map(e => (e._5, e._4 == "purchase"))
    val nPos = scored.count(_._2).toDouble
    val nNeg = scored.count(!_._2).toDouble
    // mid-ranks over the pooled sample
    val byValue = scored.sortBy(_._1)
    val ranks = new Array[Double](byValue.length)
    var i = 0
    while (i < byValue.length) {
      var j = i
      while (j + 1 < byValue.length && byValue(j + 1)._1 == byValue(i)._1)
        j += 1
      val mid = (i + j + 2) / 2.0 // average of 1-based ranks i+1..j+1
      (i to j).foreach(k => ranks(k) = mid)
      i = j + 1
    }
    val rPos = byValue.zip(ranks).collect { case ((_, true), r) => r }.sum
    val expectedAuc = (rPos - nPos * (nPos + 1) / 2.0) / (nPos * nNeg)
    val row = SparkEntry.queries("q_agg_auc")(spark, sf0001)
      .selectExpr("n_pos", "n_neg", "auc").as[(Long, Long, Double)].head()
    assert(row._1 == nPos.toLong && row._2 == nNeg.toLong)
    assert(math.abs(row._3 - expectedAuc) < 2e-6,
      s"auc ${row._3} vs reference $expectedAuc")
  }

  test("q_agg_trimmed_mean matches the sorted-slice reference") {
    val got = SparkEntry.queries("q_agg_trimmed_mean")(spark, sf0001)
      .selectExpr("grp", "n", "n_kept", "trimmed_mean")
      .as[(String, Long, Long, Double)].collect()
    got.foreach { case (grp, n, nKept, tm) =>
      val xs = liQty.collect { case (g, q) if g == grp => q }.sorted
      val lo = xs.length / 10
      val kept = xs.slice(lo, xs.length - lo)
      assert(n == xs.length && nKept == kept.length,
        s"$grp: counts $n/$nKept vs ${xs.length}/${kept.length}")
      val ref = kept.sum / kept.length
      assert(math.abs(tm - ref) < 2e-4,
        s"$grp: trimmed mean $tm vs reference $ref")
    }
  }

  test("q_agg_hodges_lehmann matches the brute-force pairwise median") {
    val a = liQty.collect { case ("A", q) => q }
    val r = liQty.collect { case ("R", q) => q }
    val diffs = (for (x <- a; y <- r) yield x - y).sorted
    // lower weighted median convention: first d where 2*cum >= total
    val idx = (diffs.length + 1) / 2 - 1
    val expected = diffs(idx)
    val row = SparkEntry.queries("q_agg_hodges_lehmann")(spark, sf0001)
      .selectExpr("n_pairs", "hl_shift").as[(Long, Double)].head()
    assert(row._1 == diffs.length.toLong)
    assert(row._2 == expected,
      s"hl_shift ${row._2} vs reference $expected")
  }

  test("q_agg_friedman matches a hand-rolled blocked rank test") {
    // same cell grid the query builds: 8-dp rounded per-cell means
    val cells = events.groupBy(e => (dow(e._2), e._4)).map {
      case ((d, t), evs) =>
        // mirror the query: exact 2-dp decimal sum, one double
        // division, 8-dp round
        val sv = evs.map(_._5).map(v =>
          BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum
        val mean = BigDecimal(sv.toDouble / evs.size)
          .setScale(8, BigDecimal.RoundingMode.HALF_UP)
        (d, t, mean)
    }.toSeq
    val k = cells.map(_._2).distinct.size
    val nBlocks = cells.map(_._1).distinct.size
    val rj = cells.groupBy(_._1).values.flatMap { block =>
      block.sortBy(c => (c._3, c._2)).zipWithIndex
        .map { case (c, i) => c._2 -> (i + 1).toLong }
    }.groupBy(_._1).map { case (t, rs) => t -> rs.map(_._2).sum }
    val r2 = rj.values.map(r => r * r).sum
    val chi2 = 12.0 * r2 / (nBlocks.toLong * k * (k + 1)) -
      3.0 * nBlocks * (k + 1)
    val row = SparkEntry.queries("q_agg_friedman")(spark, sf0001)
      .selectExpr("n_blocks", "k", "chi2_f").as[(Long, Long, Double)]
      .head()
    assert(row._1 == nBlocks && row._2 == k)
    assert(math.abs(row._3 - chi2) < 2e-4,
      s"chi2_f ${row._3} vs reference $chi2")
  }

  test("q_ts_runs_test matches a hand-rolled runs count and z") {
    val daily = events.groupBy(e => (e._4, e._2 / 86400000000L))
      .map { case ((t, day), evs) => (t, day, evs.size) }.toSeq
    val got = SparkEntry.queries("q_ts_runs_test")(spark, sf0001)
      .selectExpr("event_type", "n_runs", "n_up", "n_dn", "z")
      .as[(String, Long, Long, Long, Double)].collect()
    got.foreach { case (t, nRuns, nUp, nDn, z) =>
      val series = daily.filter(_._1 == t).sortBy(_._2).map(_._3)
      val signs = series.zip(series.tail).map { case (a, b) => b - a }
        .filter(_ != 0).map(d => if (d > 0) 1 else -1)
      val runs = 1 + signs.zip(signs.tail).count { case (a, b) => a != b }
      val (u, d) = (signs.count(_ == 1).toDouble,
        signs.count(_ == -1).toDouble)
      val mu = 2.0 * u * d / (u + d) + 1.0
      val s2 = 2.0 * u * d * (2.0 * u * d - u - d) /
        ((u + d) * (u + d) * (u + d - 1.0))
      val zRef = (runs - mu) / math.sqrt(s2)
      assert(nRuns == runs.toLong && nUp == u.toLong && nDn == d.toLong,
        s"$t: counts ($nRuns,$nUp,$nDn) vs ($runs,$u,$d)")
      assert(math.abs(z - zRef) < 2e-4, s"$t: z $z vs reference $zRef")
    }
  }

  /** Day-of-week matching Spark's dayofweek() (1 = Sunday), from the
    * event-time micros (UTC). */
  private def dow(tsMicros: Long): Int = {
    val days = java.time.Instant.ofEpochSecond(tsMicros / 1000000L)
      .atZone(java.time.ZoneOffset.UTC).toLocalDate.getDayOfWeek.getValue
    // java DayOfWeek: 1 = Monday..7 = Sunday; Spark: 1 = Sunday
    if (days == 7) 1 else days + 1
  }

  test("q_ts_granger matches a direct residual-sum OLS reference") {
    // independent route: fit BOTH models by explicit normal-equation
    // solves and compute RSS as literal residual sums — no shared
    // co-moment closed form with the query
    val daily = events.groupBy(_._2 / 86400000000L).toSeq.sortBy(_._1)
      .map { case (_, evs) =>
        (evs.count(_._4 == "click").toDouble,
          evs.count(_._4 == "purchase").toDouble)
      }
    val rows = daily.zip(daily.tail).map { case ((xl, yl), (x, y)) =>
      (y, x, yl, xl) // response pair + lags
    }
    def ols(ys: Seq[Double], xs: Seq[Seq[Double]]): Double = {
      // least squares with intercept via normal equations
      // (tiny k: gaussian elimination), returns RSS
      val k = xs.head.size + 1
      val a = Array.ofDim[Double](k, k + 1)
      val design = xs.map(1.0 +: _)
      for (r <- design.indices; i <- 0 until k) {
        for (j <- 0 until k) a(i)(j) += design(r)(i) * design(r)(j)
        a(i)(k) += design(r)(i) * ys(r)
      }
      for (p0 <- 0 until k) {
        val piv = (p0 until k).maxBy(r => math.abs(a(r)(p0)))
        val tmp = a(p0); a(p0) = a(piv); a(piv) = tmp
        for (r <- 0 until k if r != p0) {
          val f = a(r)(p0) / a(p0)(p0)
          for (c <- p0 to k) a(r)(c) -= f * a(p0)(c)
        }
      }
      val beta = (0 until k).map(i => a(i)(k) / a(i)(i))
      ys.zip(design).map { case (yv, d) =>
        val e = yv - d.zip(beta).map(t => t._1 * t._2).sum
        e * e
      }.sum
    }
    val n = rows.size.toDouble
    val yR = rows.map(_._1)
    val rssU1 = ols(yR, rows.map(r => Seq(r._3, r._4)))
    val rssR1 = ols(yR, rows.map(r => Seq(r._3)))
    val fRef = (rssR1 - rssU1) / (rssU1 / (n - 3.0))
    val got = SparkEntry.queries("q_ts_granger")(spark, sf0001)
      .selectExpr("n_days", "f_click_to_purchase")
      .as[(Long, Double)].head()
    assert(got._1 == rows.size.toLong)
    assert(math.abs(got._2 - fRef) < 5e-3,
      s"f_click_to_purchase ${got._2} vs reference $fRef")
  }

  test("q_agg_levene matches a direct Brown-Forsythe reference") {
    val byGrp = liQty.groupBy(_._1).map { case (g, xs) =>
      g -> xs.map(_._2).sorted
    }
    val devs = byGrp.toSeq.flatMap { case (_, xs) =>
      val med =
        if (xs.length % 2 == 1) xs(xs.length / 2)
        else (xs(xs.length / 2 - 1) + xs(xs.length / 2)) / 2.0
      xs.map(x => math.abs(x - med))
    }
    val grpDevs = byGrp.toSeq.sortBy(_._1).map { case (_, xs) =>
      val med =
        if (xs.length % 2 == 1) xs(xs.length / 2)
        else (xs(xs.length / 2 - 1) + xs(xs.length / 2)) / 2.0
      xs.map(x => math.abs(x - med))
    }
    val k = grpDevs.size.toDouble
    val nTot = devs.size.toDouble
    val grand = devs.sum / nTot
    val msb = grpDevs.map { zs =>
      val m = zs.sum / zs.size
      zs.size * (m - grand) * (m - grand)
    }.sum / (k - 1)
    val msw = grpDevs.map { zs =>
      val m = zs.sum / zs.size
      zs.map(z => (z - m) * (z - m)).sum
    }.sum / (nTot - k)
    val got = SparkEntry.queries("q_agg_levene")(spark, sf0001)
      .selectExpr("f_bf").as[Double].head()
    assert(math.abs(got - msb / msw) < 5e-3,
      s"f_bf $got vs reference ${msb / msw}")
  }

  test("q_agg_tukey matches a direct pooled-variance reference") {
    val byGrp = liQty.groupBy(_._1).map { case (g, xs) =>
      g -> xs.map(_._2)
    }
    val k = byGrp.size.toDouble
    val nTot = liQty.length.toDouble
    val msw = byGrp.values.map { xs =>
      val m = xs.sum / xs.size
      xs.map(x => (x - m) * (x - m)).sum
    }.sum / (nTot - k)
    val got = SparkEntry.queries("q_agg_tukey")(spark, sf0001)
      .selectExpr("grp_a", "grp_b", "q_stat")
      .as[(String, String, Double)].collect()
    got.foreach { case (ga, gb, q) =>
      val a = byGrp(ga); val b = byGrp(gb)
      val ref = math.abs(a.sum / a.size - b.sum / b.size) /
        math.sqrt(msw / 2.0 * (1.0 / a.size + 1.0 / b.size))
      assert(math.abs(q - ref) < 5e-3, s"$ga-$gb: q $q vs reference $ref")
    }
  }
}
