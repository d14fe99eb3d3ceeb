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

  // --- Null-divergence fixtures (round 8). The sf fixtures carry zero
  // null event_types / keys / values, so these engine-alignment edges
  // never fire in the driver's hash compare — each case below writes a
  // tiny synthetic table that DOES exercise them and pins the aligned
  // behavior. DuckDB parity for every pinned value was verified by
  // hand-running the corresponding OracleSql entry on the identical
  // fixture (round 8); the comments record the DuckDB results.

  private def nullFixtureDir(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_nullfix_$name")
      .toString

  test("q_agg_ttest: empty and singleton arms yield NULL t_welch") {
    val dir = nullFixtureDir("ttest")
    // 'x': both users even → treatment arm EMPTY; 'y': one odd user →
    // singleton treatment arm (var_samp over n=1 is NULL in BOTH
    // engines since divide-by-zero → NULL). DuckDB on this fixture:
    // ('x', 0, 2, NULL, 1.5, NULL), ('y', 1, 2, 5.0, 1.5, NULL).
    Seq(
      (1L, 1000000000L, 2L, "x", 1.0, "{}"),
      (2L, 2000000000L, 4L, "x", 2.0, "{}"),
      (3L, 3000000000L, 1L, "y", 5.0, "{}"),
      (4L, 4000000000L, 2L, "y", 1.0, "{}"),
      (5L, 5000000000L, 4L, "y", 2.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q_agg_ttest")(spark, dir).collect()
    val x = got.find(_.getString(0) == "x").get
    assert(x.getLong(1) == 0L && x.isNullAt(3) && x.isNullAt(5),
      s"empty treatment arm must yield NULL mean_t and t_welch: $x")
    val y = got.find(_.getString(0) == "y").get
    assert(y.getLong(1) == 1L && y.getDouble(3) == 5.0 && y.isNullAt(5),
      s"singleton arm must yield NULL t_welch (var_samp n=1): $y")
  }

  test("q_evt_paths: all-null event_types render as '' in both engines") {
    val dir = nullFixtureDir("paths")
    // user 1: a null type mid-sequence is SKIPPED by array_join →
    // 'a>b'; user 2: ALL types null → Spark array_join gives '' where
    // DuckDB array_to_string gives NULL — the oracle coalesces to ''.
    // Both engines' collected lists INCLUDE null elements, so the
    // first-50 cap windows agree. DuckDB on this fixture (with the
    // coalesce): ('', 1), ('a>b', 1).
    Seq(
      (1L, 1000000000L, 1L, Some("a"), 1.0, "{}"),
      (2L, 2000000000L, 1L, None, 1.0, "{}"),
      (3L, 3000000000L, 1L, Some("b"), 1.0, "{}"),
      (4L, 1000000000L, 2L, None, 1.0, "{}"),
      (5L, 2000000000L, 2L, None, 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q_evt_paths")(spark, dir)
      .as[(String, Long)].collect().toMap
    assert(got == Map("a>b" -> 1L, "" -> 1L), s"got $got")
  }

  test("q_etl_snapshot_diff: NULL keys never join and class as added") {
    val dir = nullFixtureDir("snapdiff")
    // A NULL key is dropped from snapshot A by the %4 filter (NULL
    // predicate) but kept in snapshot B, and NULL keys never equal in
    // a join — so each null-key row surfaces exactly once, as 'added',
    // in BOTH engines. DuckDB on this fixture: added(n=3, min/max
    // key=3, sum_delta=88.0 — key 3's 10→11 plus the two null-key
    // prices 33+44), changed(n=1, key 1, 10.0), unchanged(n=2,
    // keys 2/4, 0.0).
    Seq(
      (Some(1L), "O", 100.0), (Some(2L), "F", 50.0),
      (Some(3L), "O", 10.0), (Some(4L), "P", 20.0),
      (None, "O", 33.0), (None, "F", 44.0))
      .map { case (k, st, p) => (k, 7L, st, p,
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "1-URGENT") }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = SparkEntry.queries("q_etl_snapshot_diff")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), Option(r.get(2)),
        Option(r.get(3)), r.getDouble(4)))).toMap
    val expected = Map(
      "added" -> ((3L, Some(3L), Some(3L), 88.0)),
      "changed" -> ((1L, Some(1L), Some(1L), 10.0)),
      "unchanged" -> ((2L, Some(2L), Some(4L), 0.0)))
    assert(got == expected, s"got $got")
  }
}
