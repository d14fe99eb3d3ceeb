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
}
