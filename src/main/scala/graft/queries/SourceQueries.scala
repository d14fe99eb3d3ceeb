package graft.queries

import graft.{Schemas, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.A scans / sources. Sinks (q_sink_append, q_sink_warehouse) are
  * U-tier: exercised in SinkSpec, not registered as queries. */
object SourceQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Scratch dir for sources that need a materialized intermediate file.
    * Must stay inside /root/repo (environment contract). */
  private[graft] val scratch = "/root/repo/target/tmp"

  /** q_src_parquet — schema-pinned columnar scan with projection (ref
    * Postgres table read `database/app.py:76-82`; our at-rest format is
    * parquet, SURVEY.md §1.4). The 3-column select prunes the read schema
    * to 3 of 11 columns — check ReadSchema in `.explain`. */
  private val srcParquet: Q = (s, dir) =>
    Tables.load(s, dir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity")
      .orderBy("l_orderkey", "l_linenumber")

  /** q_src_ndjson — line-delimited JSON round-trip (ref `json.loads` per
    * line `database/parse_and_upload_to_db.py:26-28`): dump events as
    * NDJSON, read back with the explicit schema, aggregate. Q-tier (the
    * oracle reads parquet, not our scratch file). */
  private val srcNdjson: Q = (s, dir) => {
    val path = s"$scratch/ndjson_src"
    Tables.load(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("props"))
      .write.mode("overwrite").json(path)
    s.read.schema("event_id LONG, user_id LONG, event_type STRING, " +
        "value DOUBLE, props STRING")
      .json(path)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        expr("CAST(round(sum(CAST(value AS DECIMAL(18,2))), 4) AS DOUBLE)")
          .as("sum_value"))
      .orderBy("event_type")
  }

  /** q_src_stream_file — incremental file source (ref scraper resume
    * `web_scraper/web_scraping.py:191-229,513-521`): the same NDJSON dir
    * consumed through Structured Streaming with an AvailableNow trigger,
    * aggregated into a memory sink. Q-tier; MemoryStream-driven coverage in
    * StreamingSpec. */
  private val srcStreamFile: Q = (s, dir) => {
    val path = s"$scratch/ndjson_stream"
    Tables.load(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .write.mode("overwrite").json(path)
    val stream = s.readStream
      .schema("event_id LONG, user_id LONG, event_type STRING, value DOUBLE")
      .json(path)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"))
    val q = stream.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("src_stream_file")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.table("src_stream_file").orderBy("event_type")
  }

  val all: Map[String, Q] = Map(
    "q_src_parquet" -> srcParquet,
    "q_src_ndjson" -> srcNdjson,
    "q_src_stream_file" -> srcStreamFile)
}
