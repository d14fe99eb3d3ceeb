package graft

import graft.ops.Streaming
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** True incremental execution of the §2.K builders under MemoryStream:
  * watermarked state, session gaps, replay dedup, and late-data drop
  * semantics (q_stream_late, U-tier — SURVEY.md §2.K). */
class StreamingSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
                event_type: String, value: Double)

  private def runStream(events: Seq[Seq[Ev]], name: String,
                        build: org.apache.spark.sql.DataFrame =>
                          org.apache.spark.sql.DataFrame,
                        mode: String): org.apache.spark.sql.DataFrame = {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = build(mem.toDF()).writeStream
      .outputMode(mode).format("memory").queryName(name).start()
    events.foreach { batch => mem.addData(batch); q.processAllAvailable() }
    q.stop()
    spark.table(name)
  }

  test("tumbling window aggregates under watermark across epochs") {
    val out = runStream(
      Seq(Seq(Ev(1, ts(5), 1, "click", 1.0), Ev(2, ts(20), 1, "click", 2.0)),
        Seq(Ev(3, ts(40), 1, "click", 3.0))),
      "tumble_test",
      df => Streaming.tumbling(df.withWatermark("ts", "10 minutes"),
        "15 minutes"),
      "complete")
    val rows = out.select("window_start", "n").collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(1))).sorted
    assert(rows.toSeq == Seq(("2024-01-01 10:00:00.0", 1L),
      ("2024-01-01 10:15:00.0", 1L), ("2024-01-01 10:30:00.0", 1L)))
  }

  test("stream-static enrich joins every micro-batch against the dim") {
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val out = runStream(
      Seq(Seq(Ev(1, ts(1), 1, "click", 1.0)),
        // second micro-batch: dim row 2 AND an unknown user 9
        Seq(Ev(2, ts(2), 2, "view", 2.0), Ev(3, ts(3), 9, "view", 3.0))),
      "enrich_test",
      df => Streaming.enrich(df, dim, "user_id")
        .select("event_id", "user_id", "tier"),
      "append")
    val rows = out.collect()
      .map(r => (r.getLong(0), Option(r.getString(2)))).sortBy(_._1)
    // left join: the unknown user survives with a null tier (an inner
    // join would silently drop event 3 — the ingest data-loss bug)
    assert(rows.toSeq == Seq((1L, Some("gold")), (2L, Some("basic")),
      (3L, None)))
  }

  test("stream-stream interval join emits exactly the in-window pairs") {
    implicit val sq = spark.sqlContext
    val views = MemoryStream[Ev]
    val clicks = MemoryStream[Ev]
    val joined = Streaming.intervalJoin(
      views.toDF().withWatermark("ts", "10 minutes"),
      clicks.toDF().withWatermark("ts", "10 minutes"),
      "user_id", "30 minutes")
    val q = joined.select("l_event_id", "r_event_id").writeStream
      .outputMode("append").format("memory").queryName("ssjoin_test").start()
    views.addData(Ev(1, ts(0), 1, "view", 0), Ev(2, ts(5), 2, "view", 0))
    clicks.addData(
      Ev(10, ts(10), 1, "click", 0), // 10 min after view 1 — in window
      Ev(11, ts(45), 1, "click", 0), // 45 min after view 1 — outside
      Ev(12, ts(6), 2, "click", 0))  // 1 min after view 2 — in window
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("ssjoin_test").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(rows.toSeq == Seq((1L, 10L), (2L, 12L)))
  }

  test("stream-stream LEFT OUTER join emits unmatched views after the " +
      "watermark closes their window (q_stream_left)") {
    implicit val sq = spark.sqlContext
    val views = MemoryStream[Ev]
    val clicks = MemoryStream[Ev]
    val joined = Streaming.intervalJoinOuter(
      views.toDF().withWatermark("ts", "10 minutes"),
      clicks.toDF().withWatermark("ts", "10 minutes"),
      "user_id", "30 minutes")
    val q = joined.select("l_event_id", "r_event_id").writeStream
      .outputMode("append").format("memory").queryName("ssleft_test").start()
    try {
      views.addData(Ev(1, ts(0), 1, "view", 0), Ev(2, ts(5), 2, "view", 0))
      clicks.addData(Ev(10, ts(10), 1, "click", 0)) // converts view 1
      q.processAllAvailable()
      // push both watermarks far past view 2's 30-minute window: its
      // null row may only emit once no in-window click can still arrive
      views.addData(Ev(3, ts(120), 9, "view", 0))
      clicks.addData(Ev(11, ts(120), 9, "click", 0))
      q.processAllAvailable()
      views.addData(Ev(4, ts(200), 8, "view", 0))
      clicks.addData(Ev(12, ts(200), 8, "click", 0))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("ssleft_test").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet
    // view 1 matched; view 2 proven unmatched (null click); the late
    // watermark-pushing pairs matched each other
    assert(rows.contains((1L, Some(10L))), s"matched pair missing: $rows")
    assert(rows.contains((2L, None)),
      s"unmatched view did not emit a null row: $rows")
    assert(!rows.contains((2L, Some(10L))) && !rows.contains((2L, Some(11L))),
      s"view 2 wrongly matched: $rows")
  }

  test("session windows close on gap") {
    val out = runStream(
      Seq(Seq(Ev(1, ts(0), 7, "click", 1.0), Ev(2, ts(10), 7, "click", 1.0),
        Ev(3, ts(55), 7, "click", 1.0))),
      "session_test",
      df => Streaming.sessionize(df.withWatermark("ts", "1 minute"),
        "30 minutes"),
      "complete")
    val rows = out.select("session_start", "n_events").collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(1))).sorted
    // events at :00/:10 merge (gap < 30 min); :55 starts a new session
    assert(rows.toSeq == Seq(("2024-01-01 10:00:00.0", 2L),
      ("2024-01-01 10:55:00.0", 1L)))
  }

  test("streaming dedup drops replayed event_ids within the watermark") {
    val out = runStream(
      Seq(Seq(Ev(1, ts(1), 1, "a", 1.0), Ev(1, ts(1), 1, "a", 1.0)),
        Seq(Ev(1, ts(1), 1, "a", 1.0), Ev(2, ts(2), 1, "b", 1.0))),
      "dedup_test",
      df => Streaming.dedupStream(df, "ts", "10 minutes", Seq("event_id")),
      "append")
    assert(out.select("event_id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L))
  }

  test("streaming minhash suppresses near-dups within the watermark") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val q = Streaming.minhashClaimStream(
        mem.toDF().toDF("doc_id", "ts", "text"),
        "doc_id", "text", "ts", "10 minutes")
      .writeStream.outputMode("append").format("memory")
      .queryName("minhash_stream_test").start()
    val base = "the quick brown fox jumps over the lazy dog while " +
      "rain falls on the quiet gray town square tonight"
    val near = base.replace("gray", "grey") // one-token edit: near-dup
    val other = "completely different content about structured state " +
      "stores watermark eviction semantics and incremental checkpoints"
    try {
      mem.addData((1L, ts(0), base))
      q.processAllAvailable()
      mem.addData((2L, ts(1), base), (3L, ts(2), other), (4L, ts(3), near))
      q.processAllAvailable()
      // push the watermark (40 − 10 = ts(30)) past every claim's expiry
      // (claim_ts + 10 min ≤ ts(13)) so the bucket state is EVICTED
      mem.addData((8L, ts(40),
        "watermark pusher row with enough distinct tokens to shingle"))
      q.processAllAvailable()
      mem.addData((9L, ts(41), base)) // re-arrival AFTER eviction
      q.processAllAvailable()
    } finally q.stop()
    val claims = spark.table("minhash_stream_test")
      .groupBy("doc_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // first claimant owns all 16 buckets
    assert(claims.get(1L).contains(16L), s"doc1: $claims")
    // exact dup inside the watermark: every band collides → zero claims
    assert(!claims.contains(2L), s"doc2 should be fully suppressed: $claims")
    // unrelated doc: no band collides → all buckets claimed
    assert(claims.get(3L).contains(16L), s"doc3: $claims")
    // one-token near-dup: most (not necessarily all) bands collide
    assert(claims.getOrElse(4L, 0L) < 16L, s"doc4: $claims")
    // suppression is only promised WITHIN the watermark: the evicted
    // buckets are claimable again, so the late re-arrival reads as novel
    assert(claims.get(9L).contains(16L),
      s"doc9 should re-claim after eviction: $claims")
    // batch-shadow parity: the stream's suppressions agree with the
    // batch LSH candidate pairs on the same corpus
    val corpus = Seq((1L, base), (2L, base), (3L, other), (4L, near))
      .toDF("doc_id", "text")
    val pairs = graft.ops.TextSim
      .minhashCandidates(corpus, col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"pairs: $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), s"pairs: $pairs")
  }

  test("flatMapGroupsWithState accumulates per-user state across batches") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String, Double)]
    val q = Streaming.userActivityState(mem.toDS()).toDF()
      .writeStream.outputMode("append").format("memory")
      .queryName("state_test").start()
    mem.addData((1L, "click", 1.0), (1L, "purchase", 2.0), (2L, "view", 3.0))
    q.processAllAvailable()
    mem.addData((1L, "purchase", 9.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("state_test")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // batch 1 emits user1 (2 events, 1 purchase, 300 cents) and user2;
    // batch 2 emits user1 again with state carried over
    assert(rows.contains((1L, 2L, 1L, 300L)))
    assert(rows.contains((2L, 1L, 0L, 300L)))
    assert(rows.contains((1L, 3L, 2L, 1200L)), rows.mkString(", "))
  }

  test("transformWithState carries typed ValueState across batches") {
    implicit val sq = spark.sqlContext
    // transformWithState needs the RocksDB provider (multiple column
    // families); the HDFS-backed default cannot host it
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    val mem = MemoryStream[(Long, String, Double)]
    val q = Streaming.userActivityTws(mem.toDS()).toDF()
      .writeStream.outputMode("append").format("memory")
      .queryName("tws_test").start()
    try {
      mem.addData((5L, "click", 1.0))
      q.processAllAvailable()
      mem.addData((5L, "purchase", 2.5))
      q.processAllAvailable()
    } finally {
      // always restore the session default: leaking RocksDB into later
      // suites would silently change what the other streaming tests cover
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
    val rows = spark.table("tws_test").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.contains((5L, 1L, 0L, 100L)))
    assert(rows.contains((5L, 2L, 1L, 350L)), rows.mkString(", "))
  }

  test("transformWithState TTL expires idle keys and accumulates live ones") {
    implicit val sq = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    // Under TimeMode.ProcessingTime the stream NEVER idles (every
    // trigger interval runs a batch so processing-time timers/TTL can
    // fire), so `processAllAvailable` — which waits for idle — would
    // block forever. Poll the memory sink for the expected row instead.
    def awaitRow(table: String,
                 want: (Long, Long, Long, Long) => Boolean): Unit = {
      val deadline = System.nanoTime + 30L * 1000 * 1000 * 1000
      def rows() = spark.table(table).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      while (!rows().exists(want.tupled) && System.nanoTime < deadline)
        Thread.sleep(100)
      assert(rows().exists(want.tupled),
        s"timed out waiting on $table: ${rows().mkString(", ")}")
    }
    try {
      // live half: TTL far beyond the test's runtime — state must carry
      // across batches exactly like the no-TTL processor
      val live = MemoryStream[(Long, String, Double)]
      val qLive = Streaming
        .userActivityTwsTtl(live.toDS(), java.time.Duration.ofMinutes(10))
        .toDF().writeStream.outputMode("append").format("memory")
        .queryName("tws_ttl_live").start()
      try {
        live.addData((7L, "click", 1.0))
        awaitRow("tws_ttl_live", (u, n, _, _) => u == 7L && n == 1L)
        live.addData((7L, "purchase", 2.0))
        // within-TTL state must accumulate: 2 events, 1 purchase, 300c
        awaitRow("tws_ttl_live",
          (u, n, p, c) => u == 7L && n == 2L && p == 1L && c == 300L)
      } finally qLive.stop()

      // expiring half: TTL well under the enforced idle gap — the key's
      // state must read as null in the second batch and restart at zero
      val exp = MemoryStream[(Long, String, Double)]
      val qExp = Streaming
        .userActivityTwsTtl(exp.toDS(), java.time.Duration.ofMillis(500))
        .toDF().writeStream.outputMode("append").format("memory")
        .queryName("tws_ttl_exp").start()
      try {
        exp.addData((8L, "click", 1.0))
        awaitRow("tws_ttl_exp", (u, n, _, _) => u == 8L && n == 1L)
        // sleep 4x the TTL: generous margin so load jitter can't make
        // the second batch land inside the TTL window and flake
        Thread.sleep(2000)
        exp.addData((8L, "click", 1.0))
        // a second n_events=1 row — restarted from zero, not 2
        val deadline = System.nanoTime + 30L * 1000 * 1000 * 1000
        def expRows() = spark.table("tws_ttl_exp").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        while (expRows().length < 2 && System.nanoTime < deadline)
          Thread.sleep(100)
        assert(expRows().count(_ == (8L, 1L, 0L, 100L)) == 2 &&
          !expRows().exists(_._2 == 2L),
          s"expired state must restart from zero, never reach " +
            s"n_events=2: ${expRows().mkString(", ")}")
      } finally qExp.stop()
    } finally
      // always restore the session default: leaking RocksDB into later
      // suites would silently change what the other streaming tests cover
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("transformWithState state survives a checkpointed query restart") {
    // the recovery half of the arbitrary-state contract: the existing
    // exactly-once restart test covers a stateless sink; this one pins
    // that typed ValueState itself reloads from the checkpoint — a
    // 1000-executor job WILL lose executors and restart queries, and
    // "accumulates across batches" is worthless if a restart resets it
    implicit val sq = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    val base = java.nio.file.Files
      .createTempDirectory("graft_tws_ckpt").toString
    val out = s"$base/out"; val ckpt = s"$base/ckpt"
    try {
      val mem = MemoryStream[(Long, String, Double)]
      def runOnce(data: Seq[(Long, String, Double)]): Unit = {
        // data lands BEFORE start: AvailableNow snapshots the available
        // offsets at query start — data added after would be invisible
        // to this run and silently covered by the next
        mem.addData(data: _*)
        val q = Streaming.userActivityTws(mem.toDS()).toDF()
          .writeStream.outputMode("append").format("parquet")
          .option("path", out).option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      runOnce(Seq((3L, "click", 1.0), (3L, "purchase", 2.0)))
      runOnce(Seq((3L, "purchase", 4.5))) // restart from checkpoint
      val rows = spark.read.parquet(out).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      // run 2's row continues run 1's totals: 3 events, 2 purchases,
      // 100+200+450 cents — a reset would emit (3,1,1,450)
      assert(rows.contains((3L, 3L, 2L, 750L)),
        s"state did not survive the restart: ${rows.mkString(", ")}")
      assert(!rows.contains((3L, 1L, 1L, 450L)),
        s"restart reset the accumulator: ${rows.mkString(", ")}")
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("MapState seen-set flags first arrivals and counts per sub-key") {
    implicit val sq = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[(Long, String, Double)]
      // TimeMode.None: no self-triggering, processAllAvailable is safe
      val q = Streaming.userSeenTypes(mem.toDS()).toDF()
        .writeStream.outputMode("append").format("memory")
        .queryName("seen_test").start()
      try {
        mem.addData((4L, "view", 1.0), (4L, "view", 1.0),
          (4L, "click", 1.0))
        q.processAllAvailable()
        mem.addData((4L, "view", 1.0), (4L, "purchase", 9.0))
        q.processAllAvailable()
      } finally q.stop()
      val rows = spark.table("seen_test").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2),
          r.getLong(3), r.getLong(4))).toSet
      assert(rows == Set(
        // batch 1: both types first-seen; view already tallied twice
        (4L, "view", true, 2L, 2L),
        (4L, "click", true, 1L, 2L),
        // batch 2: view is a re-arrival continuing its count; purchase
        // is new — n_types reflects the post-batch cardinality
        (4L, "view", false, 3L, 3L),
        (4L, "purchase", true, 1L, 3L)), s"got $rows")
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("cdc stream: version guard, tombstone zombie shield, revive") {
    implicit val sq = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[(Long, String, Long, Double)]
      val q = Streaming.cdcApplyStream(mem.toDS()).toDF()
        .writeStream.outputMode("append").format("memory")
        .queryName("cdc_test").start()
      try {
        // batch 1: out-of-order WITHIN the batch — v2 arrives before
        // v1; the version-sorted fold must leave v2 current
        mem.addData((7L, "U", 2L, 20.0), (7L, "U", 1L, 10.0),
          (8L, "U", 1L, 80.0))
        q.processAllAvailable()
        // batch 2: delete 7 at v3 (tombstone); stale v0 update for 8
        // is older than its applied v1 — dropped by the version guard
        mem.addData((7L, "D", 3L, 0.0), (8L, "U", 0L, 99.0))
        q.processAllAvailable()
        // batch 3: pre-delete zombie update (v2 < tombstone v3) must
        // NOT resurrect 7 — the bug clearing state on delete causes
        mem.addData((7L, "U", 2L, 21.0))
        q.processAllAvailable()
        // batch 4: a NEWER upsert revives the key legitimately
        mem.addData((7L, "U", 4L, 40.0))
        q.processAllAvailable()
      } finally q.stop()
      val rows = spark.table("cdc_test").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getBoolean(3))).toSeq.sorted
      assert(rows == Seq(
        (7L, 2L, 20.0, true),   // b1: v2 wins the in-batch reorder
        (7L, 3L, 0.0, false),   // b2: tombstoned at v3
        (7L, 3L, 0.0, false),   // b3: zombie dropped, tombstone stands
        (7L, 4L, 40.0, true),   // b4: revived
        (8L, 1L, 80.0, true),   // b1
        (8L, 1L, 80.0, true)    // b2: stale v0 dropped, state unchanged
      ).sorted, s"got $rows")
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("timer fires an inactive tombstone after the key goes quiet") {
    implicit val sq = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[(Long, String, Double)]
      // 5 s timeout: must exceed worst-case inter-batch latency under
      // suite load (an 800 ms first cut expired between two addData
      // calls and the "active, 2" row never existed), while staying far
      // under the 30 s poll deadlines
      val q = Streaming.userInactivity(mem.toDS(),
          java.time.Duration.ofSeconds(5))
        .toDF().writeStream.outputMode("append").format("memory")
        .queryName("timer_test").start()
      def rows() = spark.table("timer_test").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      def awaitRow(want: ((Long, String, Long)) => Boolean): Unit = {
        val deadline = System.nanoTime + 30L * 1000 * 1000 * 1000
        while (!rows().exists(want) && System.nanoTime < deadline)
          Thread.sleep(100)
        assert(rows().exists(want),
          s"timed out: ${rows().mkString(", ")}")
      }
      try {
        mem.addData((9L, "click", 1.0))
        awaitRow(r => r == ((9L, "active", 1L)))
        mem.addData((9L, "click", 1.0))
        // re-arming must extend the deadline, not fire per event
        awaitRow(r => r == ((9L, "active", 2L)))
        // now go quiet: the timer fires and emits the tombstone with
        // the final count; the state clears with it
        awaitRow(r => r == ((9L, "inactive", 2L)))
        // a returning key starts a FRESH session (n resets), proving
        // the expiry handler cleared state, not just emitted: a SECOND
        // (active, 1) row must appear (the first batch already made
        // one, so wait on the count, not mere existence)
        mem.addData((9L, "view", 1.0))
        val deadline = System.nanoTime + 30L * 1000 * 1000 * 1000
        while (rows().count(_ == ((9L, "active", 1L))) < 2 &&
            System.nanoTime < deadline) Thread.sleep(100)
        assert(rows().count(_ == ((9L, "active", 1L))) == 2 &&
          !rows().contains((9L, "active", 3L)),
          s"state survived the timeout: ${rows().mkString(", ")}")
      } finally q.stop()
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("checkpointed file-sink restart is exactly-once") {
    import java.nio.file.Files
    val base = Files.createTempDirectory("graft_ckpt").toString
    val src = s"$base/src"; val out = s"$base/out"; val ckpt = s"$base/ckpt"
    def writeBatch(ids: Range): Unit =
      ids.map(i => (i.toLong, ts(i % 60), 1L, "a", 1.0))
        .toDF("event_id", "ts", "user_id", "event_type", "value")
        .write.mode("append").json(src)
    def runOnce(): Unit = {
      val q = spark.readStream
        .schema("event_id LONG, ts TIMESTAMP, user_id LONG, " +
          "event_type STRING, value DOUBLE")
        .json(src)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    writeBatch(0 until 10)
    runOnce()
    writeBatch(10 until 25) // new files arrive while "down"
    runOnce() //               restart from checkpoint
    val got = spark.read.parquet(out).select("event_id").as[Long]
      .collect().sorted
    // exactly once: every id exactly once despite the restart
    assert(got.toSeq == (0L until 25L), s"got ${got.length} rows")
  }

  test("late data beyond the watermark is dropped (q_stream_late)") {
    val out = runStream(
      Seq(
        Seq(Ev(1, ts(0), 1, "a", 1.0)),
        // advance event time to 10:40 → watermark 10:30
        Seq(Ev(2, ts(40), 1, "a", 1.0)),
        // 10:05 is a full window behind the watermark → dropped;
        // 10:39 lands in the still-open 10:30 window → kept
        Seq(Ev(3, ts(5), 1, "a", 1.0), Ev(4, ts(39), 1, "a", 1.0))),
      "late_test",
      df => Streaming.tumbling(df.withWatermark("ts", "0 seconds"),
        "15 minutes"),
      "update")
    // count rows attributed to the 10:00 window across all update batches:
    // the late event 3 must not have re-raised its count past 1
    val w10 = out.filter(col("window_start") === ts(0))
      .agg(max("n")).as[Long].head()
    assert(w10 == 1L, "late event was not dropped")
    val w30 = out.filter(col("window_start") === ts(30))
      .agg(max("n")).as[Long].head()
    assert(w30 == 2L, "in-watermark event was wrongly dropped")
  }

  test("foreachBatch merge-upsert: latest wins, replay is a no-op " +
      "(q_stream_foreachbatch)") {
    implicit val sq = spark.sqlContext
    val target = java.nio.file.Files.createTempDirectory("graft_fb_target").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_fb_ckpt").toString
    val mem = MemoryStream[(Long, String, Double)]
    val q = mem.toDS().writeStream
      .foreachBatch(Streaming.mergeBatch(target) _)
      .option("checkpointLocation", ckpt)
      .start()
    try {
      mem.addData((1L, "a", 1.0), (2L, "b", 1.0), (1L, "a2", 2.0))
      q.processAllAvailable()
      mem.addData((2L, "b2", 5.0), (3L, "c", 1.0), (2L, "bx", 4.0))
      q.processAllAvailable()
    } finally q.stop()
    def state() = Streaming.servingTable(spark, target)
      .select("key", "payload", "seq")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSet
    val expected = Set((1L, "a2", 2.0), (2L, "b2", 5.0), (3L, "c", 1.0))
    assert(state() == expected, s"got ${state()}")
    // crash-replay simulation: re-running an already-committed batchId
    // must be a no-op — the ledger guard is what turns foreachBatch's
    // at-least-once delivery into an effectively-once sink
    val replay = Seq((2L, "SHOULD_NOT_APPLY", 99.0)).toDS()
    Streaming.mergeBatch(target)(replay, 1L)
    assert(state() == expected, s"replayed batch mutated the table: ${state()}")
    // a genuinely NEW batch still applies
    Streaming.mergeBatch(target)(replay.map(t => (t._1, "b3", 6.0)), 2L)
    val committed = Set((1L, "a2", 2.0), (2L, "b3", 6.0), (3L, "c", 1.0))
    assert(state() == committed)
    // crash WINDOW recovery: pointer already flipped to v2 but the
    // ledger mark was lost (crash between the two steps). The replay
    // must NOT re-merge — rewriting the live v2 directory in place is
    // the partial-read hazard — only complete the missing ledger mark.
    val ledger2 = java.nio.file.Paths.get(s"$target/_batches/2")
    java.nio.file.Files.delete(ledger2)
    Streaming.mergeBatch(target)(
      Seq((9L, "MUST_NOT_APPLY", 99.0)).toDS(), 2L)
    assert(state() == committed,
      s"pointer-flipped replay re-merged: ${state()}")
    assert(java.nio.file.Files.exists(ledger2),
      "recovery must complete the ledger mark")
  }

  // ---- transformWithState checkpoint recovery (r16 verdict #6) ----
  // The live-semantics tests above pin WHAT each processor computes;
  // these four pin that its RocksDB state SURVIVES a kill-and-resume
  // from the checkpoint — the production state path: a 1000-executor
  // job loses executors and restarts queries as a matter of course,
  // and every stateful contract here is worthless if resume resets it.

  /** One AvailableNow run against a shared checkpoint: start, drain
    * the staged data, terminate — the second call IS the restart. */
  private def ckptRun[T](mem: MemoryStream[T],
      build: org.apache.spark.sql.Dataset[T] =>
        org.apache.spark.sql.DataFrame,
      out: String, ckpt: String, data: Seq[T]): Unit = {
    mem.addData(data: _*)
    val q = build(mem.toDS()).writeStream.outputMode("append")
      .format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Like [[ckptRun]] but await-output-then-stop: required for
    * ProcessingTime-time-mode processors (TTL, timers), where neither
    * AvailableNow nor processAllAvailable ever settles — the
    * wall-clock state machinery schedules no-data maintenance batches
    * forever, so "stream idle" is unreachable. Waiting for the
    * EXPECTED ROW in the (durable, committed-batch-consistent)
    * parquet sink bounds the run; the checkpoint still makes the
    * second call a genuine restart. */
  private def drainRun[T](mem: MemoryStream[T],
      build: org.apache.spark.sql.Dataset[T] =>
        org.apache.spark.sql.DataFrame,
      out: String, ckpt: String, data: Seq[T],
      done: Seq[org.apache.spark.sql.Row] => Boolean): Unit = {
    mem.addData(data: _*)
    val q = build(mem.toDS()).writeStream.outputMode("append")
      .format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .start()
    try {
      def rows(): Seq[org.apache.spark.sql.Row] =
        scala.util.Try(spark.read.parquet(out).collect().toSeq)
          .getOrElse(Seq.empty)
      val deadline = System.nanoTime + 120L * 1000 * 1000 * 1000
      while (!done(rows()) && System.nanoTime < deadline)
        Thread.sleep(200)
      assert(done(rows()),
        s"timed out waiting for streamed output in $out")
    } finally q.stop()
  }

  private def withRocksDb(body: => Unit): Unit = {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    try body
    finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("seen-set MapState survives a checkpointed restart " +
      "(q_stream_seen)") {
    withRocksDb {
      implicit val sq = spark.sqlContext
      val base = java.nio.file.Files
        .createTempDirectory("graft_seen_ckpt").toString
      val out = s"$base/out"; val ckpt = s"$base/ckpt"
      val mem = MemoryStream[(Long, String, Double)]
      def run(d: Seq[(Long, String, Double)]): Unit =
        ckptRun(mem, (ds: org.apache.spark.sql.Dataset[(Long, String,
          Double)]) => Streaming.userSeenTypes(ds).toDF(), out, ckpt, d)
      run(Seq((4L, "view", 1.0), (4L, "click", 1.0)))
      run(Seq((4L, "view", 1.0))) // restart from checkpoint
      val rows = spark.read.parquet(out).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2),
          r.getLong(3), r.getLong(4))).toSeq
      // the re-arrival must read as ALREADY SEEN with its per-type
      // count continued — a reset would emit a second first_seen=true
      assert(rows.contains((4L, "view", false, 2L, 2L)),
        s"seen-set did not survive the restart: ${rows.mkString(", ")}")
      assert(rows.count { case (_, t, f, _, _) =>
        t == "view" && f } == 1,
        s"restart re-flagged a seen type as new: ${rows.mkString(", ")}")
    }
  }

  test("cdc version-guard state survives a checkpointed restart " +
      "(q_stream_cdc)") {
    withRocksDb {
      implicit val sq = spark.sqlContext
      val base = java.nio.file.Files
        .createTempDirectory("graft_cdc_ckpt").toString
      val out = s"$base/out"; val ckpt = s"$base/ckpt"
      val mem = MemoryStream[(Long, String, Long, Double)]
      def run(d: Seq[(Long, String, Long, Double)]): Unit =
        ckptRun(mem, (ds: org.apache.spark.sql.Dataset[(Long, String,
          Long, Double)]) => Streaming.cdcApplyStream(ds).toDF(),
          out, ckpt, d)
      run(Seq((7L, "U", 2L, 20.0), (8L, "U", 1L, 80.0)))
      // restart, then a STALE v1 update for key 7: the reloaded
      // version guard must drop it — losing state would apply v1
      run(Seq((7L, "U", 1L, 10.0)))
      val rows = spark.read.parquet(out).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getBoolean(3))).toSeq
      assert(rows.count(_ == ((7L, 2L, 20.0, true))) == 2,
        s"version guard did not survive the restart: " +
          rows.mkString(", "))
      assert(!rows.contains((7L, 1L, 10.0, true)),
        s"restart let a stale version apply: ${rows.mkString(", ")}")
    }
  }

  test("TTL ValueState survives a checkpointed restart inside its " +
      "window (q_stream_ttl)") {
    withRocksDb {
      implicit val sq = spark.sqlContext
      val base = java.nio.file.Files
        .createTempDirectory("graft_ttl_ckpt").toString
      val out = s"$base/out"; val ckpt = s"$base/ckpt"
      val mem = MemoryStream[(Long, String, Double)]
      // TTL far above the test's wall time: this test pins RECOVERY
      // (state persists across restart while unexpired); the live
      // expiry test above pins the TTL semantics themselves.
      // drainRun, not ckptRun: TimeMode.ProcessingTime +
      // Trigger.AvailableNow self-triggers no-data batches without
      // terminating (the TTL/timer wall-clock machinery keeps the
      // query "not caught up") — drain-then-stop bounds the run
      def run(d: Seq[(Long, String, Double)],
              want: (Long, Long, Long, Long)): Unit =
        drainRun(mem, (ds: org.apache.spark.sql.Dataset[(Long, String,
          Double)]) => Streaming.userActivityTwsTtl(ds,
          java.time.Duration.ofMinutes(10)).toDF(), out, ckpt, d,
          rs => rs.exists(r => (r.getLong(0), r.getLong(1),
            r.getLong(2), r.getLong(3)) == want))
      run(Seq((3L, "click", 1.0), (3L, "purchase", 2.0)),
        (3L, 2L, 1L, 300L))
      // restart from checkpoint
      run(Seq((3L, "purchase", 4.5)), (3L, 3L, 2L, 750L))
      val rows = spark.read.parquet(out).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSeq
      assert(rows.contains((3L, 3L, 2L, 750L)),
        s"TTL state did not survive the restart: ${rows.mkString(", ")}")
      assert(!rows.contains((3L, 1L, 1L, 450L)),
        s"restart reset the TTL accumulator: ${rows.mkString(", ")}")
    }
  }

  test("inactivity timer state survives a checkpointed restart " +
      "(q_stream_timer)") {
    withRocksDb {
      implicit val sq = spark.sqlContext
      val base = java.nio.file.Files
        .createTempDirectory("graft_timer_ckpt").toString
      val out = s"$base/out"; val ckpt = s"$base/ckpt"
      val mem = MemoryStream[(Long, String, Double)]
      // timeout far above the test's wall time: the pending timer and
      // the per-key count must RELOAD, not fire or reset — the live
      // timer test above pins expiry itself. drainRun for the same
      // reason as the TTL restart test (ProcessingTime time mode)
      def run(d: Seq[(Long, String, Double)],
              want: (Long, String, Long)): Unit =
        drainRun(mem, (ds: org.apache.spark.sql.Dataset[(Long, String,
          Double)]) => Streaming.userInactivity(ds,
          java.time.Duration.ofMinutes(10)).toDF(), out, ckpt, d,
          rs => rs.exists(r => (r.getLong(0), r.getString(1),
            r.getLong(2)) == want))
      run(Seq((9L, "click", 1.0)), (9L, "active", 1L))
      // restart from checkpoint
      run(Seq((9L, "view", 1.0)), (9L, "active", 2L))
      val rows = spark.read.parquet(out).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
      assert(rows.contains((9L, "active", 2L)),
        s"timer-op state did not survive the restart: " +
          rows.mkString(", "))
      assert(rows.count(_ == ((9L, "active", 1L))) == 1,
        s"restart reset the session counter: ${rows.mkString(", ")}")
    }
  }
}
