package graft

/** Composition proofs for the round-16 batch-N showcases: each fused
  * pipeline row must equal the STANDALONE operator it composes — the
  * strongest form of "the operators compose without per-stage
  * materialization" (a showcase that silently recomputed different
  * numbers would be a second implementation, not a composition). */
class PipeShowcaseSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val abtest: Map[String, (Double, Double, Double, Int)] =
    SparkEntry.queries("q_pipe_abtest")(spark, sf0001)
      .selectExpr("check", "val_t", "val_c", "stat", "alarm")
      .as[(String, Double, Double, Double, Int)].collect()
      .map(t => t._1 -> (t._2, t._3, t._4, t._5)).toMap

  test("abtest CUPED row equals q_evt_cuped's adjusted means") {
    val cuped = SparkEntry.queries("q_evt_cuped")(spark, sf0001)
      .selectExpr("arm", "mean_adjusted")
      .as[(Long, Double)].collect().toMap
    val (vt, vc, _, _) = abtest("3_cuped")
    assert(vt == cuped(1L), s"adj_t $vt vs cuped ${cuped(1L)}")
    assert(vc == cuped(0L), s"adj_c $vc vs cuped ${cuped(0L)}")
  }

  test("abtest guardrail row equals q_agg_rate_ratio") {
    val rr = SparkEntry.queries("q_agg_rate_ratio")(spark, sf0001)
      .selectExpr("rate_t_1k", "rate_c_1k", "rate_ratio", "significant")
      .as[(Double, Double, Option[Double], Int)].head()
    val (vt, vc, stat, alarm) = abtest("4_error_guardrail")
    assert(vt == rr._1 && vc == rr._2)
    assert(rr._3.contains(stat))
    assert(alarm == rr._4)
  }

  test("abtest SRM row is the all-span q_evt_srm collapse") {
    // q_evt_srm is weekly; the showcase runs the same χ² over the
    // full span — totals must reconcile with the per-user table
    val users = Tables.load(spark, sf0001, "events")
      .filter("user_id IS NOT NULL")
      .selectExpr("user_id").distinct().as[Long].collect()
    val nt = users.count(_ % 2 == 1); val nc = users.count(_ % 2 == 0)
    val (vt, vc, stat, _) = abtest("1_srm")
    assert(vt == nt.toDouble && vc == nc.toDouble)
    val chi2 = BigDecimal(math.pow(nt - nc, 2) / (nt + nc))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(stat == chi2)
  }

  test("embed_qa drift rows equal q_vec_mmd's statistics") {
    val qa = SparkEntry.queries("q_pipe_embed_qa")(spark, sf0001)
      .selectExpr("check", "value").as[(String, Double)]
      .collect().toMap
    val mmd = SparkEntry.queries("q_vec_mmd")(spark, sf0001)
      .selectExpr("split", "mmd2").as[(String, Double)]
      .collect().toMap
    assert(qa("5_null_drift") == mmd("parity"))
    assert(qa("6_label_separation") == mmd("label"))
  }

  test("graph_health LPA leg equals q_graph_lpa's top community") {
    val panel = SparkEntry.queries("q_pipe_graph_health")(spark, sf0001)
      .selectExpr("check", "value").as[(String, Double)]
      .collect().toMap
    val lpa = SparkEntry.queries("q_graph_lpa")(spark, sf0001)
      .selectExpr("n_nodes").as[Long].collect()
    // top community size from the standalone op, share from the panel
    assert(panel("8_top_community_share") ==
      BigDecimal(lpa.head.toDouble / panel("1_nodes"))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // edge/degree census reconciles: avg_degree = 2E/N
    assert(panel("4_avg_degree") ==
      BigDecimal(2.0 * panel("2_edges") / panel("1_nodes"))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("ts_profile KPSS and episode columns equal the standalone ops") {
    val prof = SparkEntry.queries("q_pipe_ts_profile")(spark, sf0001)
      .selectExpr("event_type", "kpss_eta", "level_stationary",
        "alert_episodes")
      .as[(String, Double, Int, Long)].collect()
      .map(t => t._1 -> (t._2, t._3, t._4)).toMap
    val kpss = SparkEntry.queries("q_ts_kpss")(spark, sf0001)
      .selectExpr("event_type", "eta", "level_stationary")
      .as[(String, Double, Int)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    val hyst = SparkEntry.queries("q_ts_hysteresis")(spark, sf0001)
      .selectExpr("event_type", "n_episodes")
      .as[(String, Long)].collect().toMap
    kpss.foreach { case (t, (eta, flag)) =>
      assert(prof(t)._1 == eta && prof(t)._2 == flag,
        s"$t kpss: ${prof(t)} vs ($eta, $flag)")
    }
    hyst.foreach { case (t, n) =>
      assert(prof(t)._3 == n, s"$t episodes ${prof(t)._3} vs $n")
    }
  }

  test("embed_qa census rows match direct recomputation") {
    val qa = SparkEntry.queries("q_pipe_embed_qa")(spark, sf0001)
      .selectExpr("check", "value", "pass")
      .as[(String, Double, Int)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    val emb = Tables.load(spark, sf0001, "embeddings")
      .selectExpr("CAST(embedding AS ARRAY<DOUBLE>)")
      .as[Seq[Double]].collect()
    val qvs = emb.map(_.map(x => math.floor(x * 1000).toLong))
    assert(qa("1_corpus_size")._1 == emb.length.toDouble)
    assert(qa("2_zero_vectors")._1 ==
      qvs.count(_.forall(_ == 0L)).toDouble)
    val dup = BigDecimal((emb.length - qvs.distinct.length).toDouble /
      emb.length).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(qa("3_exact_dup_rate")._1 == dup)
  }
}
