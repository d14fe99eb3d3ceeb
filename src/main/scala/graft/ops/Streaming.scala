package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState, GroupStateTimeout, MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** §2.K streaming operator builders. Each takes a DataFrame and returns a
  * transformed one, so the same builder runs in batch (oracle-checkable
  * shadow) and under `readStream` (true incremental execution with state;
  * exercised in StreamingSpec with MemoryStream). The reference's
  * incremental-resume pattern (`web_scraper/web_scraping.py:513-521`) is
  * the batch shadow of watermarked streaming dedup. */
object Streaming {

  /** Tumbling window counts + exact sums per event type. */
  def tumbling(ev: DataFrame, width: String): DataFrame =
    ev.groupBy(window(col("ts"), width).as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        expr("CAST(round(sum(CAST(value AS DECIMAL(18,2))), 4) AS DOUBLE)")
          .as("sum_value"))
      .select(col("win.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Sliding (overlapping) window counts. */
  def sliding(ev: DataFrame, width: String, slide: String): DataFrame =
    ev.groupBy(window(col("ts"), width, slide).as("win"))
      .agg(count(lit(1)).as("n"))
      .select(col("win.start").as("window_start"),
        col("win.end").as("window_end"), col("n"))

  /** Gap-based session windows per user. */
  def sessionize(ev: DataFrame, gap: String): DataFrame =
    ev.groupBy(session_window(col("ts"), gap).as("win"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("win.start").as("session_start"),
        col("win.end").as("session_end"), col("n_events"))

  /** Watermarked streaming dedup on a key — bounded state: per-key state
    * is evicted once the watermark passes it. `dropDuplicatesWithinWatermark`
    * is required for eviction here: plain `dropDuplicates(keys)` only
    * bounds state when the event-time column is itself one of the keys,
    * otherwise the seen-set grows forever. Streaming only (batch shadow
    * below). */
  def dedupStream(ev: DataFrame, eventTimeCol: String, delay: String,
                  keys: Seq[String]): DataFrame =
    ev.withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** Batch shadow of dedup: replayed input → exactly-once output. */
  def dedupBatch(ev: DataFrame, keys: Seq[String]): DataFrame =
    ev.dropDuplicates(keys)

  /** Streaming NEAR-duplicate suppression — [[dedupStream]]'s watermarked
    * state composed with MinHash/LSH banding ([[TextSim]]'s batch corpus
    * dedup, incrementally): each arriving document's `bands` band hashes
    * CLAIM their LSH buckets, and `dropDuplicatesWithinWatermark` on
    * (band, band_hash) keeps only the FIRST claimant per bucket. A later
    * document that is a near-duplicate of anything inside the watermark
    * collides in (nearly) every band and so emits (nearly) zero claim
    * rows — per-doc novelty is `count(claims) > 0`, judged downstream
    * (foreachBatch / the consumer), keeping this a single stateful
    * operator. The reference's resume set (`web_scraping.py:513-521`)
    * is this with exact keys and an infinite watermark.
    *
    * State is one row per claimed bucket, EVICTED once the watermark
    * passes its claim time — bounded by throughput × delay × bands, not
    * by corpus size; suppression is only promised WITHIN the watermark
    * (a re-arrival after eviction claims afresh — the documented
    * semantics of watermarked dedup, tested in StreamingSpec). Per-row
    * work (signature + banding) is the same codegen'd kernel chain as
    * the batch path; the one shuffle is the dedup's (band, band_hash)
    * repartition. Docs with fewer than `shingleSize` tokens have an
    * EMPTY shingle set (every such doc would near-dup every other) and
    * are dropped, mirroring [[TextSim.minhashCandidates]]. */
  def minhashClaimStream(docs: DataFrame, idCol: String, textCol: String,
                         eventTimeCol: String, delay: String,
                         shingleSize: Int = 3, numHashes: Int = 64,
                         bands: Int = 16): DataFrame = {
    require(numHashes >= bands && numHashes % bands == 0,
      s"numHashes ($numHashes) must be a positive multiple of bands " +
        s"($bands)")
    docs
      .filter(size(TextSim.tokens(col(textCol))) >= shingleSize)
      .select(col(idCol).as("doc_id"), col(eventTimeCol).as("claim_ts"),
        TextSim.minhashSignature(col(textCol), shingleSize, numHashes)
          .as("sig"))
      .select(col("doc_id"), col("claim_ts"),
        posexplode(TextSim.bandHashesOfSig(
          col("sig"), numHashes / bands, bands)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_hash")
      .withWatermark("claim_ts", delay)
      .dropDuplicatesWithinWatermark("band", "band_hash")
  }

  /** Batch shadow of [[minhashClaimStream]] at the converged level:
    * over a finite corpus whose whole span sits inside the watermark,
    * `dropDuplicatesWithinWatermark(band, band_hash)` keeps the FIRST
    * claimant per bucket in arrival order — which a batch replay pins
    * as the (claim_ts, doc_id) total order. Same signature/banding
    * kernel chain; the first-claimant pick is one PARTITIONED
    * row_number over (band, band_hash) — per-bucket state, never a
    * global sort. Returns per-doc novelty: `n_claims` buckets won (a
    * near-duplicate of an earlier doc wins ~0; an exact duplicate
    * exactly 0), `novel` = won at least one. */
  def minhashClaimBatch(docs: DataFrame, idCol: String, textCol: String,
                        orderCol: String, shingleSize: Int = 3,
                        numHashes: Int = 64, bands: Int = 16)
      : DataFrame = {
    require(numHashes >= bands && numHashes % bands == 0,
      s"numHashes ($numHashes) must be a positive multiple of bands " +
        s"($bands)")
    val claims = docs
      .filter(size(TextSim.tokens(col(textCol))) >= shingleSize)
      .select(col(idCol).as("doc_id"), col(orderCol).as("claim_ord"),
        TextSim.minhashSignature(col(textCol), shingleSize, numHashes)
          .as("sig"))
      .select(col("doc_id"), col("claim_ord"),
        posexplode(TextSim.bandHashesOfSig(
          col("sig"), numHashes / bands, bands)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_hash")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("band", "band_hash")
      .orderBy(col("claim_ord"), col("doc_id"))
    claims.withColumn("rn", row_number().over(w))
      .groupBy("doc_id")
      .agg(count(when(col("rn") === 1, 1)).as("n_claims"))
      .withColumn("novel", col("n_claims") > 0)
  }

  /** Stream-static enrichment join: each micro-batch of the stream
    * joins the (slowly-changing, re-readable) dimension — the lookup
    * pattern of every event pipeline (ref: the scraper resolving each
    * search hit against its static category map,
    * `web_scraper/web_scraping.py:325-368`). Left join so an event
    * whose key is missing from the dim survives with nulls (an inner
    * join would silently drop it — a data-loss bug at ingest). The dim
    * is broadcast: in streaming it participates from every micro-batch
    * without shuffling the stream side; at 100 TB the dim either fits
    * (broadcast) or the join keys co-partition (bucketed dim). Same
    * builder runs batch (oracle shadow) and under readStream
    * (incremental run in StreamingSpec). */
  def enrich(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(broadcast(dim), Seq(key), "left")

  /** Stream-stream interval join: every left event matched to right
    * events of the same key that occur strictly after it and within
    * `window` — the attribution join (view → click within 30 min). The
    * equi-key plus BOTH time bounds is what makes this work in
    * streaming: with each side watermarked, the bounds tell the state
    * store exactly when a buffered row can never match again and is
    * evicted, so state is O(key-rate × window), not O(stream). The same
    * builder runs in batch (oracle shadow, registered) and under
    * readStream (watermarked incremental run in StreamingSpec).
    * Columns are prefixed l_/r_ before the join so the condition never
    * self-references one plan's attributes (ambiguous-self-join).
    * `tsCol` names the event-time column on both sides (misuse fails
    * with a clear require, not an unresolved l_ts deep in analysis);
    * the window string is validated up front for the same reason —
    * `expr` would otherwise surface a malformed interval as an opaque
    * parser error at plan time. */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   window: String, tsCol: String = "ts"): DataFrame = {
    require(window.trim.toLowerCase(java.util.Locale.ROOT)
        .matches("""\d+\s+(second|minute|hour|day)s?"""),
      s"window must look like '30 minutes' (got '$window')")
    require(left.columns.contains(tsCol) && right.columns.contains(tsCol),
      s"both sides need event-time column '$tsCol' " +
        s"(left: ${left.columns.mkString(",")}; " +
        s"right: ${right.columns.mkString(",")})")
    val l = left.select(
      left.columns.map(c => col(c).as(s"l_$c")).toIndexedSeq: _*)
    val r = right.select(
      right.columns.map(c => col(c).as(s"r_$c")).toIndexedSeq: _*)
    l.join(r,
      col(s"l_$key") === col(s"r_$key") &&
        col(s"r_$tsCol") > col(s"l_$tsCol") &&
        col(s"r_$tsCol") <= col(s"l_$tsCol") + expr(s"INTERVAL $window"))
  }

  /** q_stream_left — watermarked stream-stream LEFT OUTER interval
    * join: every left event emits, matched rows as they arrive, the
    * unmatched ones with a null right side once the watermark proves no
    * in-window partner can still come — the "views that never
    * converted" readout computed INCREMENTALLY (the batch shape is
    * q_join_left + q_join_range; q_stream_join is the inner half).
    * The outer semantics only exist at a live state store: an
    * unmatched left row is held in state until
    * watermark > l_ts + window, and THEN emitted with nulls — no batch
    * shadow can express "proven unmatched so far", which is why this
    * row is U-tier. Both sides carry the same interval condition as
    * [[intervalJoin]], so state eviction is bounded on both sides (the
    * condition + watermark give Spark the retention bound). */
  def intervalJoinOuter(left: DataFrame, right: DataFrame, key: String,
                        window: String,
                        tsCol: String = "ts"): DataFrame = {
    require(window.trim.toLowerCase(java.util.Locale.ROOT)
        .matches("""\d+\s+(second|minute|hour|day)s?"""),
      s"window must look like '30 minutes' (got '$window')")
    val l = left.select(
      left.columns.map(c => col(c).as(s"l_$c")).toIndexedSeq: _*)
    val r = right.select(
      right.columns.map(c => col(c).as(s"r_$c")).toIndexedSeq: _*)
    l.join(r,
      col(s"l_$key") === col(s"r_$key") &&
        col(s"r_$tsCol") > col(s"l_$tsCol") &&
        col(s"r_$tsCol") <= col(s"l_$tsCol") + expr(s"INTERVAL $window"),
      "left_outer")
  }

  /** Per-user accumulator. All fields are order-independent aggregates —
    * flatMapGroupsWithState gives no intra-batch row ordering after the
    * shuffle, so a "last value" field would be nondeterministic
    * (SURVEY §7.5); value_cents keeps the sum exact. */
  case class UserActivity(user_id: Long, n_events: Long, n_purchases: Long,
                          value_cents: Long)

  /** One shared accumulation for both state APIs — a drifting copy would
    * silently desynchronize the flatMapGroupsWithState and
    * transformWithState variants. */
  private def accumulate(user: Long, prev: UserActivity,
                         rows: Iterator[(Long, String, Double)])
      : UserActivity =
    rows.foldLeft(prev) { case (acc, (_, typ, v)) =>
      UserActivity(user, acc.n_events + 1,
        acc.n_purchases + (if (typ == "purchase") 1 else 0),
        acc.value_cents + math.round(v * 100))
    }

  /** Custom keyed state via `flatMapGroupsWithState`: a per-user running
    * activity profile that emits an updated row whenever the user's
    * micro-batch arrives — the arbitrary-state surface the built-in
    * window aggregations can't express (reference analog: the scraper's
    * mutable already-scraped set, `web_scraper/web_scraping.py:513-521`,
    * generalized to per-key accumulators).
    *
    * State is one small case class per key, partitioned by user — at any
    * scale each executor holds only its keys' state in the state store. */
  def userActivityState(ev: Dataset[(Long, String, Double)])
      : Dataset[UserActivity] = {
    implicit val enc = Encoders.product[UserActivity]
    ev.groupByKey(_._1)(Encoders.scalaLong)
      .flatMapGroupsWithState[UserActivity, UserActivity](
        OutputMode.Append, GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, String, Double)],
         state: GroupState[UserActivity]) =>
          val next = accumulate(user,
            state.getOption.getOrElse(UserActivity(user, 0L, 0L, 0L)), rows)
          state.update(next)
          Iterator.single(next)
      }
  }

  /** The same per-user profile on the modern `transformWithState` API
    * (Spark 4 StatefulProcessor): typed per-key `ValueState` with
    * optional TTL instead of a single opaque GroupState — the
    * forward-looking arbitrary-state surface. Kept alongside the
    * `flatMapGroupsWithState` form to cover both APIs. */
  class UserActivityProcessor
      extends StatefulProcessor[Long, (Long, String, Double), UserActivity] {
    @transient private var state: ValueState[UserActivity] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[UserActivity]("activity",
        Encoders.product[UserActivity], TTLConfig.NONE)

    override def handleInputRows(user: Long,
                                 rows: Iterator[(Long, String, Double)],
                                 timerValues: TimerValues)
        : Iterator[UserActivity] = {
      val next = accumulate(user,
        Option(state.get()).getOrElse(UserActivity(user, 0L, 0L, 0L)), rows)
      state.update(next)
      Iterator.single(next)
    }
  }

  /** [[userActivityState]] via transformWithState. */
  def userActivityTws(ev: Dataset[(Long, String, Double)])
      : Dataset[UserActivity] = {
    implicit val enc = Encoders.product[UserActivity]
    ev.groupByKey(_._1)(Encoders.scalaLong)
      .transformWithState(new UserActivityProcessor, TimeMode.None(),
        OutputMode.Append())
  }

  /** TTL variant of [[UserActivityProcessor]] — the state-hygiene knob
    * an unbounded-key stream needs at scale: without expiry, every key
    * EVER seen pins a state-store row forever, and a 100 TB clickstream
    * with churning users grows state monotonically until checkpoints
    * and recovery times collapse. `TTLConfig(ttl)` bounds state to keys
    * active within the TTL window: the store expires a key's value
    * `ttl` after its last update (processing time — the only TimeMode
    * TTL supports), an expired read returns null, and a returning user
    * restarts from zero — the deliberate trade: bounded state for
    * forgotten history, the same contract as the reference scraper
    * re-scraping an entry older than its resume horizon
    * (`web_scraper/web_scraping.py:513-521` — its "already scraped" set
    * is an implicit infinite-TTL state that DOES grow forever; this is
    * that pattern made bounded). */
  class UserActivityTtlProcessor(ttl: java.time.Duration)
      extends StatefulProcessor[Long, (Long, String, Double), UserActivity] {
    @transient private var state: ValueState[UserActivity] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[UserActivity]("activity_ttl",
        Encoders.product[UserActivity], TTLConfig(ttl))

    override def handleInputRows(user: Long,
                                 rows: Iterator[(Long, String, Double)],
                                 timerValues: TimerValues)
        : Iterator[UserActivity] = {
      val next = accumulate(user,
        Option(state.get()).getOrElse(UserActivity(user, 0L, 0L, 0L)), rows)
      state.update(next)
      Iterator.single(next)
    }
  }

  /** [[userActivityTws]] with per-key state TTL. TTL requires
    * `TimeMode.ProcessingTime` (expiry is wall-clock-anchored at the
    * store, not event-time — late data cannot resurrect expired
    * state). */
  def userActivityTwsTtl(ev: Dataset[(Long, String, Double)],
                         ttl: java.time.Duration)
      : Dataset[UserActivity] = {
    implicit val enc = Encoders.product[UserActivity]
    ev.groupByKey(_._1)(Encoders.scalaLong)
      .transformWithState(new UserActivityTtlProcessor(ttl),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }

  /** One per-key status row from the inactivity processor: `status` is
    * "active" on each arriving batch, "inactive" on timer expiry. */
  case class UserTimeout(user_id: Long, status: String, n_events: Long)

  /** Inactivity timeout via processing-time TIMERS — the third leg of
    * the `transformWithState` surface (typed `ValueState`:
    * [[UserActivityProcessor]]; passive TTL expiry:
    * [[UserActivityTtlProcessor]]; timers here). A timer is the PUSH
    * complement to TTL's passive forgetting: TTL silently drops state,
    * a timer fires `handleExpiredTimer` and EMITS — which is what
    * session-end detection, cart-abandonment alerts, and SLA breach
    * monitors need (the streaming form of q_evt_abandon's batch
    * question; reference analog: the scraper's per-request 30 s
    * timeout, `web_scraper/web_scraping.py:66,476`, generalized to
    * per-entity inactivity). Protocol: each input batch deletes the
    * key's previous timer and re-arms `timeoutMs` ahead, so exactly
    * one timer per live key exists at any moment — timer count scales
    * with LIVE keys, not with events seen; the expiry handler clears
    * the key's state, so a timed-out key that returns starts a fresh
    * session. */
  class InactivityProcessor(timeoutMs: Long)
      extends StatefulProcessor[Long, (Long, String, Double), UserTimeout] {
    @transient private var nEvents: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      nEvents = getHandle.getValueState[Long]("n_events",
        Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(user: Long,
                                 rows: Iterator[(Long, String, Double)],
                                 timerValues: TimerValues)
        : Iterator[UserTimeout] = {
      val n = (if (nEvents.exists()) nEvents.get() else 0L) + rows.size
      nEvents.update(n)
      getHandle.listTimers().foreach(t =>
        getHandle.deleteTimer(t.asInstanceOf[Long]))
      getHandle.registerTimer(
        timerValues.getCurrentProcessingTimeInMs() + timeoutMs)
      Iterator.single(UserTimeout(user, "active", n))
    }

    override def handleExpiredTimer(user: Long, timerValues: TimerValues,
                                    expiredTimerInfo: ExpiredTimerInfo)
        : Iterator[UserTimeout] = {
      val n = if (nEvents.exists()) nEvents.get() else 0L
      nEvents.clear()
      Iterator.single(UserTimeout(user, "inactive", n))
    }
  }

  /** Session-end detection stream: "active" rows while a key receives
    * input, one "inactive" row `timeout` after its last event. */
  def userInactivity(ev: Dataset[(Long, String, Double)],
                     timeout: java.time.Duration): Dataset[UserTimeout] = {
    implicit val enc = Encoders.product[UserTimeout]
    ev.groupByKey(_._1)(Encoders.scalaLong)
      .transformWithState(new InactivityProcessor(timeout.toMillis),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }

  /** One row per (user, event_type) per batch from the seen-set
    * processor: `first_seen` marks the type's first-ever arrival for
    * the user, `n_for_type` its running count, `n_types` the user's
    * distinct-type cardinality after this batch. */
  case class TypeSeen(user_id: Long, event_type: String,
                      first_seen: Boolean, n_for_type: Long, n_types: Long)

  /** Keyed seen-set via `MapState` — the reference scraper's resume set
    * (`web_scraper/web_scraping.py:513-521`: "is this bizId already
    * scraped?") made a first-class streaming state type, and the state
    * shape the Value/List surfaces can't express efficiently: per-key
    * MEMBERSHIP over an unbounded sub-key domain. A ValueState holding
    * a Map would rewrite the WHOLE map per update (serialize/replace on
    * every row); `MapState` reads and writes one (sub-key, value) entry
    * per update — at clickstream scale the difference between O(types)
    * and O(1) state I/O per event. Emits first-seen flags + running
    * counts, the novelty signal dedup/alerting consumes. */
  class SeenTypesProcessor
      extends StatefulProcessor[Long, (Long, String, Double), TypeSeen] {
    @transient private var seen: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getMapState[String, Long]("seen_types",
        Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(user: Long,
                                 rows: Iterator[(Long, String, Double)],
                                 timerValues: TimerValues)
        : Iterator[TypeSeen] = {
      // batch-local tally first: one MapState read+write per DISTINCT
      // type in the batch, not per row
      val tally = scala.collection.mutable.LinkedHashMap.empty[String, Long]
      rows.foreach { case (_, t, _) =>
        tally.update(t, tally.getOrElse(t, 0L) + 1L)
      }
      val out = tally.map { case (t, n) =>
        val first = !seen.containsKey(t)
        val total = (if (first) 0L else seen.getValue(t)) + n
        seen.updateValue(t, total)
        (t, first, total)
      }.toSeq
      val nTypes = seen.keys().size.toLong
      out.iterator.map { case (t, first, total) =>
        TypeSeen(user, t, first, total, nTypes)
      }
    }
  }

  /** [[SeenTypesProcessor]] as a stream transform. */
  def userSeenTypes(ev: Dataset[(Long, String, Double)])
      : Dataset[TypeSeen] = {
    implicit val enc = Encoders.product[TypeSeen]
    ev.groupByKey(_._1)(Encoders.scalaLong)
      .transformWithState(new SeenTypesProcessor, TimeMode.None(),
        OutputMode.Append())
  }

  /** Post-batch current row per touched key from the CDC processor:
    * `live` = false marks a tombstone (latest op is a delete) — the key
    * exists only to tell downstream merges to erase it. */
  case class CdcCurrent(key: Long, version: Long, value: Double,
                        live: Boolean)

  /** q_stream_cdc — continuous changelog application: the streaming
    * form of q_etl_cdc_apply's batch fold. A CDC feed (key, op,
    * version, value) maintains per-key CURRENT state in a typed
    * `ValueState`: within a batch ops fold in version order (CDC
    * transports reorder within a poll window), across batches the
    * version guard drops any op older than the applied one — the
    * out-of-order shield a bare last-write-wins lacks. Deletes don't
    * remove state; they store a TOMBSTONE (live = false, version
    * kept): clearing state would forget the delete's version, and a
    * late pre-delete update would then resurrect the key — the classic
    * CDC zombie-row bug. A newer upsert after the tombstone revives the
    * key legitimately. Emits each touched key's post-batch current row
    * (the Debezium→merge materialization primitive, incremental form).
    * EQUAL-VERSION tie rule (pinned, feed-order independent): within a
    * batch, same-version ops sort by op string ('D' < 'U') under the
    * `>=` version guard, so an upsert always beats a delete at the
    * same version — deterministic by construction, but note it
    * differs from last-op-in-feed-wins transports; a feed that needs
    * those semantics must carry an LSN/sequence component in
    * `version` (any strictly monotone long works unchanged here).
    * State per key is ONE small row at any scale, keyed by the CDC key
    * — executors hold only their partitions' keys. */
  class CdcApplyProcessor
      extends StatefulProcessor[Long, (Long, String, Long, Double),
        CdcCurrent] {
    @transient private var cur: ValueState[CdcCurrent] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      cur = getHandle.getValueState[CdcCurrent]("cdc_current",
        Encoders.product[CdcCurrent], TTLConfig.NONE)

    override def handleInputRows(key: Long,
                                 rows: Iterator[(Long, String, Long, Double)],
                                 timerValues: TimerValues)
        : Iterator[CdcCurrent] = {
      var st = cur.get() // null when the key is brand new
      rows.toSeq.sortBy(r => (r._3, r._2)).foreach {
        case (_, op, version, value) =>
          if (st == null || version >= st.version)
            st = if (op == "D") CdcCurrent(key, version, 0.0, live = false)
            else CdcCurrent(key, version, value, live = true)
      }
      cur.update(st)
      Iterator.single(st)
    }
  }

  /** [[CdcApplyProcessor]] as a stream transform. */
  def cdcApplyStream(ops: Dataset[(Long, String, Long, Double)])
      : Dataset[CdcCurrent] = {
    implicit val enc = Encoders.product[CdcCurrent]
    ops.groupByKey(_._1)(Encoders.scalaLong)
      .transformWithState(new CdcApplyProcessor, TimeMode.None(),
        OutputMode.Append())
  }

  /** q_stream_foreachbatch — the `foreachBatch` merge-upsert serving
    * sink: each micro-batch latest-wins-merges (key, payload, seq) rows
    * into a versioned parquet table, the pattern that loads a streaming
    * pipeline into a warehouse without a transactional table format.
    * The two failure modes foreachBatch is famous for are both closed:
    *
    *   - REPLAY: Structured Streaming re-runs a batchId after a crash
    *     (at-least-once delivery into the sink function), so the merge
    *     is guarded by a committed-batch ledger — a replayed batchId is
    *     a no-op and the sink stays effectively-once.
    *   - PARTIAL READ: the merged table is written to a NEW versioned
    *     directory and readers follow a pointer file swapped via
    *     ATOMIC_MOVE (the q_etl_wap precedent) — no reader ever sees a
    *     half-overwritten directory.
    *
    * Latest-wins is deterministic: max `seq` per key, payload breaking
    * exact-seq ties. At scale the merge is one co-keyed window over
    * current ∪ batch — at 100 TB the rewrite narrows to the touched
    * partitions (partition-pruned read + dynamic partition overwrite,
    * q_etl_partition_overwrite's machinery); the ledger/pointer
    * protocol is unchanged. */
  def mergeBatch(targetDir: String)(
      batch: Dataset[(Long, String, Double)], batchId: Long): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val spark = batch.sparkSession
    val ledger = Paths.get(s"$targetDir/_batches/$batchId")
    if (Files.exists(ledger)) return // replayed batch: effectively-once
    val pointer = Paths.get(s"$targetDir/LATEST")
    // Crash window: if a prior attempt flipped the pointer to v$batchId
    // but died before marking the ledger, the merge ALREADY committed —
    // re-running it with mode=overwrite would rewrite the directory the
    // live pointer targets (the partial-read hazard the pointer protocol
    // exists to close). Recover by completing only the missing step.
    if (Files.exists(pointer) &&
        new String(Files.readAllBytes(pointer), "UTF-8").trim ==
          s"v$batchId") {
      Files.createDirectories(ledger)
      return
    }
    val batchDf = batch.toDF("key", "payload", "seq")
    val current =
      if (Files.exists(pointer)) {
        val v = new String(Files.readAllBytes(pointer), "UTF-8").trim
        spark.read.parquet(s"$targetDir/$v")
      } else batchDf.limit(0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("key")
      .orderBy(col("seq").desc, col("payload").desc)
    val merged = current.unionByName(batchDf)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
    val version = s"v$batchId"
    merged.coalesce(1).write.mode("overwrite")
      .parquet(s"$targetDir/$version")
    // readers follow the pointer; ATOMIC_MOVE makes the version flip
    // all-or-nothing, and the ledger mark makes the replay guard durable
    val tmp = Paths.get(s"$targetDir/LATEST.tmp")
    Files.write(tmp, version.getBytes("UTF-8"))
    Files.move(tmp, pointer, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    Files.createDirectories(ledger)
  }

  /** Read the serving table [[mergeBatch]] maintains (empty before the
    * first commit). */
  def servingTable(spark: org.apache.spark.sql.SparkSession,
                   targetDir: String): DataFrame = {
    val pointer = java.nio.file.Paths.get(s"$targetDir/LATEST")
    if (!java.nio.file.Files.exists(pointer))
      spark.emptyDataFrame
    else {
      val v = new String(java.nio.file.Files.readAllBytes(pointer),
        "UTF-8").trim
      spark.read.parquet(s"$targetDir/$v")
    }
  }
}
