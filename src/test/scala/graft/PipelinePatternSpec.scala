package graft

import org.apache.spark.sql.functions._

/** Brute-force verification of the round-7 pipeline patterns (the
  * oracle hash is the primary gate; these pin the SEMANTICS against an
  * in-memory reference so a wrong-but-self-consistent oracle pair
  * cannot slip through). */
class PipelinePatternSpec extends SparkSpecBase {
  import spark.implicits._

  test("q_etl_snapshot_diff classes partition the key space correctly") {
    val got = SparkEntry.queries("q_etl_snapshot_diff")(spark, sf0001)
      .select("class", "n").as[(String, Long)].collect().toMap
    val keys = Tables.load(spark, sf0001, "orders")
      .select("o_orderkey").as[Long].collect()
    // the snapshot grammar is pure arithmetic on the key:
    // %4==3 keys exist only in B (added); odd non-%4==3 keys are
    // mutated (changed); even keys are identical (unchanged); B holds
    // every key, so nothing is removed
    val expected = Map(
      "added" -> keys.count(_ % 4 == 3).toLong,
      "changed" -> keys.count(k => k % 2 == 1 && k % 4 != 3).toLong,
      "unchanged" -> keys.count(_ % 2 == 0).toLong)
    assert(got == expected, s"got $got expected $expected")
    assert(!got.contains("removed"))
    // delta direction: added contributes +price, changed +0.1*price
    val deltas = SparkEntry.queries("q_etl_snapshot_diff")(spark, sf0001)
      .select("class", "sum_delta").as[(String, Double)].collect().toMap
    assert(deltas("unchanged") == 0.0)
    assert(deltas("added") > 0 && deltas("changed") > 0)
  }

  test("batch sessionize and streaming session_window agree exactly") {
    // two formulations of the same 30-min-gap semantics: the window
    // composition (Relational.sessionize) and Structured Streaming's
    // session_window (batch shadow). With the >= boundary rule they
    // must produce the SAME sessions — same per-user session count and
    // the same (start, n_events) multiset — not merely the same total.
    val batch = SparkEntry.queries("q_win_sessionize")(spark, sf0001)
      .selectExpr("user_id", "count(*) OVER (PARTITION BY user_id) AS s")
      .distinct().as[(Long, Long)].collect().toMap
    val stream = SparkEntry.queries("q_stream_session")(spark, sf0001)
      .groupBy("user_id").count()
      .as[(Long, Long)].collect().toMap
    assert(batch == stream,
      "batch and streaming sessionizers disagree on session counts")
  }

  test("q_agg_ttest matches a two-pass Welch computation") {
    val got = SparkEntry.queries("q_agg_ttest")(spark, sf0001)
      .selectExpr("event_type", "n_t", "n_c", "mean_t", "mean_c",
        "t_welch")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(got.nonEmpty)
    val raw = Tables.load(spark, sf0001, "events")
      .select("event_type", "user_id", "value")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)
    def moments(xs: Seq[Double]): (Long, Double, Double) = {
      val n = xs.length
      val m = xs.sum / n
      val v = xs.map(x => (x - m) * (x - m)).sum / (n - 1)
      (n.toLong, m, v)
    }
    got.foreach { case (et, nT, nC, meanT, meanC, tW) =>
      val g = raw(et)
      val (en, em, ev) = moments(g.filter(_._2 % 2 == 1).map(_._3).toSeq)
      val (cn, cm, cv) = moments(g.filter(_._2 % 2 == 0).map(_._3).toSeq)
      assert(nT == en && nC == cn, s"$et cohort sizes")
      // the engine computes single-pass moments; a two-pass reference
      // agrees to ~1e-10, so rounded values sit within one last-digit
      // step of each other
      assert((meanT - em).abs < 2e-4 && (meanC - cm).abs < 2e-4, s"$et means")
      val t = (em - cm) / math.sqrt(ev / en + cv / cn)
      assert((tW - t).abs < 2e-4, s"$et t: got $tW expected $t")
    }
  }

  test("q_evt_paths counts conserve users and order deterministically") {
    val top = SparkEntry.queries("q_evt_paths")(spark, sf0001)
      .as[(String, Long)].collect().toSeq
    assert(top.size <= 20 && top.nonEmpty)
    // tie rule: (n desc, path asc) is a total order
    top.sliding(2).foreach { case Seq(a, b) =>
      assert(a._2 > b._2 || (a._2 == b._2 && a._1 < b._1))
    case _ => ()
    }
    // brute-force the full path histogram and check the top-20 cut
    val ev = Tables.load(spark, sf0001, "events")
      .selectExpr("user_id", "unix_micros(ts) AS us", "event_id",
        "event_type")
      .collect()
      .map(r => (r.get(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // null event_types are SKIPPED (not rendered as "null") to match
    // array_join semantics — the query's array_to_string drops null
    // elements, and mkString would silently diverge on them
    val hist = ev.groupBy(_._1).map { case (_, g) =>
      g.sortBy(e => (e._2, e._3)).take(50).map(_._4)
        .filter(_ != null).mkString(">")
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expected = hist.toSeq.sortBy { case (p, n) => (-n, p) }.take(20)
    assert(top == expected)
  }
}
