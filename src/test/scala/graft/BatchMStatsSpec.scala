package graft

/** Brute-force verification of the round-16 batch-M operators (Holm,
  * Deming, Engle–Granger cointegration, hubness, late-arriving dims,
  * gzip CSV) against independent in-memory references. */
class BatchMStatsSpec extends SparkSpecBase {
  import spark.implicits._

  private def r(x: Double, dp: Int): Double =
    BigDecimal(x).setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q_agg_holm step-down agrees with fdr_bh's grid and the rule") {
    val holm = SparkEntry.queries("q_agg_holm")(spark, sf0001)
      .selectExpr("event_type", "p_bound", "rnk", "holm_thr",
        "discovery")
      .as[(String, Double, Long, Double, Int)].collect().sortBy(_._3)
    val bh = SparkEntry.queries("q_agg_fdr_bh")(spark, sf0001)
      .selectExpr("event_type", "p_bound", "rnk")
      .as[(String, Double, Long)].collect().sortBy(_._3)
    // same scored grid: identical (type, p, rank) triples
    assert(holm.map(t => (t._1, t._2, t._3)).toSeq ==
      bh.map(t => (t._1, t._2, t._3)).toSeq)
    val m = holm.length
    holm.foreach { case (_, _, rnk, thr, _) =>
      assert(thr == r(0.10 / (m - rnk + 1), 8))
    }
    // step-down: discoveries are exactly the prefix before the first
    // p > threshold
    val firstFail = holm.find(t => t._2 > t._4).map(_._3)
    holm.foreach { case (_, _, rnk, _, disc) =>
      val expected = firstFail.forall(rnk < _)
      assert(disc == (if (expected) 1 else 0))
    }
  }

  test("q_agg_deming matches the closed form and beats OLS dilution") {
    val l = Tables.load(spark, sf0001, "lineitem")
      .selectExpr("l_returnflag", "l_extendedprice", "l_discount")
      .as[(String, Double, Double)].collect()
    val got = SparkEntry.queries("q_agg_deming")(spark, sf0001)
      .selectExpr("l_returnflag", "deming_slope", "ols_slope")
      .as[(String, Double, Double)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    l.groupBy(_._1).foreach { case (f, rows) =>
      val xs = rows.map(_._2)
      val ys = rows.map(t => r(t._2 * (1.0 - t._3), 4))
      val n = xs.length.toDouble
      val mx = xs.sum / n; val my = ys.sum / n
      def cv(a: Seq[Double], b: Seq[Double]) =
        a.zip(b).map { case (p, q) => (p - mx0(a) ) * (q - mx0(b)) }
          .sum / (n - 1)
      def mx0(a: Seq[Double]) = a.sum / n
      val sxx = cv(xs.toSeq, xs.toSeq); val syy = cv(ys.toSeq, ys.toSeq)
      val sxy = cv(xs.toSeq, ys.toSeq)
      val dem = (syy - sxx +
        math.sqrt((syy - sxx) * (syy - sxx) + 4 * sxy * sxy)) /
        (2 * sxy)
      val ols = sxy / sxx
      val (gd, go) = got(f)
      assert(math.abs(gd - dem) < 2e-3, s"$f deming $gd vs $dem")
      assert(math.abs(go - ols) < 2e-3, s"$f ols $go vs $ols")
      // λ=1 Deming lies above OLS when both axes carry noise
      assert(gd > go, s"$f: deming $gd !> ols $go")
    }
  }

  test("q_ts_coint matches a textbook Engle-Granger computation") {
    val daily = Tables.load(spark, sf0001, "events")
      .selectExpr("event_type",
        "CAST(unix_micros(ts) / 86400000000 AS LONG)")
      .as[(String, Long)].collect()
      .groupBy(identity).map { case ((t, d), es) => (t, d, es.size) }
    val x = daily.filter(_._1 == "click").map(t => t._2 -> t._3).toMap
    val y = daily.filter(_._1 == "view").map(t => t._2 -> t._3).toMap
    val ds = x.keySet.intersect(y.keySet).toSeq.sorted
    val n = ds.size.toDouble
    val xs = ds.map(d => x(d).toDouble)
    val ys = ds.map(d => y(d).toDouble)
    val b = (n * xs.zip(ys).map(p => p._1 * p._2).sum -
      xs.sum * ys.sum) /
      (n * xs.map(v => v * v).sum - xs.sum * xs.sum)
    val a = ys.sum / n - b * (xs.sum / n)
    val resid = ds.map(d => d ->
      r(y(d) - a - b * x(d), 6)).toMap
    val pairs = ds.filter(d => resid.contains(d - 1))
      .map(d => (resid(d - 1), resid(d) - resid(d - 1)))
    val ssa = pairs.map(p => p._1 * p._2).sum
    val ssb = pairs.map(p => p._1 * p._1).sum
    val ssc = pairs.map(p => p._2 * p._2).sum
    val phi = ssa / ssb
    val tdf = phi / math.sqrt(((ssc - phi * ssa) / (pairs.size - 2))
      / ssb)
    val row = SparkEntry.queries("q_ts_coint")(spark, sf0001)
      .selectExpr("n_pairs", "beta", "phi", "t_df")
      .as[(Long, Double, Double, Double)].head()
    assert(row._1 == pairs.size.toLong)
    assert(math.abs(row._2 - r(b, 4)) < 1e-9)
    assert(math.abs(row._3 - r(phi, 4)) < 2e-4)
    assert(math.abs(row._4 - r(tdf, 4)) < 2e-3)
  }

  test("q_vec_hubness matches an exact in-memory 5-NN census") {
    val emb = Tables.load(spark, sf0001, "embeddings")
      .filter("vec_id < 256")
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>)")
      .as[(Long, Seq[Double])].collect()
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map(p => p._1 * p._2).sum
      val na = math.sqrt(a.map(v => v * v).sum)
      val nb = math.sqrt(b.map(v => v * v).sum)
      dot / (na * nb)
    }
    val indeg = scala.collection.mutable.Map.empty[Long, Int]
    emb.foreach { case (pid, pv) =>
      val top = emb.filter(_._1 != pid)
        .map { case (nid, nv) => (nid, r(cos(pv, nv), 4)) }
        .sortBy { case (nid, sim) => (-sim, nid) }.take(5)
      top.foreach { case (nid, _) =>
        indeg(nid) = indeg.getOrElse(nid, 0) + 1 }
    }
    val row = SparkEntry.queries("q_vec_hubness")(spark, sf0001)
      .selectExpr("n_vectors", "max_indegree", "antihub_share")
      .as[(Long, Long, Double)].head()
    assert(row._1 == emb.length.toLong)
    assert(row._2 == indeg.values.max.toLong,
      s"max ${row._2} vs ${indeg.values.max}")
    assert(row._3 ==
      r((emb.length - indeg.size).toDouble / emb.length, 4))
  }

  test("q_etl_late_dim census matches set algebra") {
    val orders = Tables.load(spark, sf0001, "orders")
      .selectExpr("o_custkey").as[Long].collect()
    val dim = Tables.load(spark, sf0001, "customer")
      .selectExpr("c_custkey").as[Long].collect()
      .filter(_ % 97 != 0).toSet
    val inferred = orders.filter(k => !dim.contains(k))
    val got = SparkEntry.queries("q_etl_late_dim")(spark, sf0001)
      .selectExpr("status", "n_facts", "n_keys")
      .as[(String, Long, Long)].collect()
    val cen = got.filter(t => t._1 == "inferred" || t._1 == "matched")
      .map(t => t._1 -> (t._2, t._3)).toMap
    assert(cen("inferred") ==
      ((inferred.length.toLong, inferred.distinct.length.toLong)))
    assert(cen("matched") ==
      ((orders.length - inferred.length).toLong,
        orders.filter(dim.contains).distinct.length.toLong))
    val top = got.filter(_._1 == "inferred_top")
    assert(top.length == math.min(5, inferred.distinct.length))
  }

  test("q_src_csv_gzip fixture parts are gzip and rows round-trip") {
    val row = SparkEntry.queries("q_src_csv_gzip")(spark, sf0001)
      .selectExpr("sum(n)", "max(max_id)").as[(Long, Long)].head()
    val base = Tables.load(spark, sf0001, "events")
      .selectExpr("count(*)", "max(event_id)").as[(Long, Long)].head()
    assert(row == base)
    // the fixture really is compressed: .csv.gz part files on disk
    val dir = new java.io.File(graft.queries.SourceQueries.scratch)
      .listFiles().filter(_.getName.startsWith("csvgz_"))
      .maxBy(_.lastModified)
    assert(dir.listFiles().exists(_.getName.endsWith(".csv.gz")))
  }
}
