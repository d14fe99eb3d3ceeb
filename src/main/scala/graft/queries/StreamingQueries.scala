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

  val all: Map[String, Q] = Map(
    "q_stream_tumble" -> tumble,
    "q_stream_slide" -> slide,
    "q_stream_session" -> session,
    "q_stream_dedup" -> dedup)
}
