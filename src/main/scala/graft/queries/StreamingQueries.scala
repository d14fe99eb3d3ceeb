package graft.queries

import graft.Tables
import graft.ops.Streaming
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.K streaming operators, run here as their oracle-checkable batch
  * shadows (same builder functions run under readStream; true incremental
  * execution incl. watermarks/late data is exercised in StreamingSpec with
  * MemoryStream — SURVEY.md §2.K). */
object StreamingQueries {
  type Q = (SparkSession, String) => DataFrame

  /** q_stream_tumble — tumbling 1 h window agg (ref hourly rollup; batch
    * shadow of `withWatermark + groupBy(window(...))`). */
  private val tumble: Q = (s, dir) =>
    Streaming.tumbling(Tables.load(s, dir, "events"), "1 hour")
      .orderBy("window_start", "event_type")

  /** q_stream_slide — overlapping 1 h windows every 15 min. O-tier: the
    * DuckDB shadow joins each event to its 4 window starts
    * (`time_bucket − k·15min`, k ∈ 0..3 — both engines' grids are
    * :00-aligned). */
  private val slide: Q = (s, dir) =>
    Streaming.sliding(Tables.load(s, dir, "events"), "1 hour", "15 minutes")
      .orderBy("window_start")

  /** q_stream_session — 30 min gap session windows per user (stateful in
    * streaming). O-tier: the DuckDB shadow rebuilds sessions from
    * lag-gap break flags + prefix sums. */
  private val session: Q = (s, dir) =>
    Streaming.sessionize(Tables.load(s, dir, "events"), "30 minutes")
      .orderBy(col("user_id").asc_nulls_first, col("session_start"))

  /** q_stream_dedup — exactly-once under replay (ref already-scraped set
    * `web_scraper/web_scraping.py:517-521`): the input unioned with itself
    * dedups back to one row per event_id. Copies are identical rows, so
    * which copy survives is immaterial — output is deterministic. */
  private val dedup: Q = (s, dir) => {
    val ev = Tables.load(s, dir, "events").select("event_id", "event_type")
    Streaming.dedupBatch(ev.unionByName(ev), Seq("event_id"))
      .orderBy("event_id")
  }

  /** q_stream_state — arbitrary per-key state
    * ([[Streaming.userActivityState]]), run as its batch shadow: in batch
    * execution each user's rows reach the state function in one call, so
    * the emitted accumulator equals the exact per-user aggregate and an
    * O-tier SQL oracle exists. All accumulator fields are
    * order-independent (sums/counts; cents kept in LONG), so the result
    * is deterministic under any partitioning — the §7.5 requirement.
    * The registered shadow is the `flatMapGroupsWithState` form, which
    * batch-executes with no state store; the `transformWithState` twin
    * (same shared accumulator) would instantiate a per-query RocksDB
    * state store and leak a session-wide provider override into
    * co-resident queries — it keeps its incremental, checkpoint-resume
    * coverage in StreamingSpec instead. */
  private val state: Q = (s, dir) => {
    import s.implicits._
    val ev = Tables.load(s, dir, "events")
      .select(col("user_id"), col("event_type"), col("value"))
      .as[(Long, String, Double)]
    Streaming.userActivityState(ev).toDF()
      .orderBy("user_id")
  }

  /** q_stream_join — stream-stream interval join
    * ([[Streaming.intervalJoin]]): views attributed to same-user clicks
    * within 30 minutes, run as the batch shadow (watermarked incremental
    * twin in StreamingSpec). Output is the (view, click) pair list with
    * the attribution latency in seconds — a total order on
    * (l_event_id, r_event_id). */
  private val streamJoin: Q = (s, dir) => {
    val ev = Tables.load(s, dir, "events")
      .select("event_id", "user_id", "event_type", "ts")
    Streaming.intervalJoin(
        ev.filter(col("event_type") === "view"),
        ev.filter(col("event_type") === "click"),
        "user_id", "30 minutes")
      .select(col("l_event_id").as("view_id"),
        col("r_event_id").as("click_id"),
        col("l_user_id").as("user_id"),
        // `div` (integral): Column./ would promote to double
        expr("(unix_micros(r_ts) - unix_micros(l_ts)) div 1000000")
          .as("delay_sec"))
      .orderBy("view_id", "click_id")
  }

  /** q_stream_enrich — stream-static enrichment join
    * ([[Streaming.enrich]]), batch shadow: events left-joined to a
    * derived user-segment dim (user_id % 10 deciles — deterministic,
    * so the oracle re-derives it arithmetically), aggregated per
    * segment. Incremental (MemoryStream × static dim) twin in
    * StreamingSpec. */
  private val enrich: Q = (s, dir) => {
    val ev = Tables.load(s, dir, "events")
      .select("event_id", "user_id", "event_type", "value")
    val dim = ev.select("user_id").distinct()
      .withColumn("segment",
        concat(lit("seg_"), (col("user_id") % 10).cast("string")))
    Streaming.enrich(ev, dim, "user_id")
      .groupBy("segment")
      .agg(count(lit(1)).as("n"),
        expr("CAST(round(sum(CAST(value AS DECIMAL(18,2))), 4) AS DOUBLE)")
          .as("sum_value"))
      .orderBy(col("segment").asc_nulls_first)
  }

  val all: Map[String, Q] = Map(
    "q_stream_enrich" -> enrich,
    "q_stream_join" -> streamJoin,
    "q_stream_tumble" -> tumble,
    "q_stream_slide" -> slide,
    "q_stream_session" -> session,
    "q_stream_dedup" -> dedup,
    "q_stream_state" -> state)
}
