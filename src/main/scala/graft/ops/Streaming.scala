package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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

  /** Watermarked streaming dedup on a key — bounded state: rows older than
    * the watermark are dropped from the seen-set. Streaming only (batch
    * shadow below). */
  def dedupStream(ev: DataFrame, eventTimeCol: String, delay: String,
                  keys: Seq[String]): DataFrame =
    ev.withWatermark(eventTimeCol, delay).dropDuplicates(keys)

  /** Batch shadow of dedup: replayed input → exactly-once output. */
  def dedupBatch(ev: DataFrame, keys: Seq[String]): DataFrame =
    ev.dropDuplicates(keys)
}
