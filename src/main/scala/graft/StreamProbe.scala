package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe (dev only, deleted after use): where does
  * q_src_stream_file's wall-clock go across repeated invocations in ONE
  * JVM? Prints per-round totals plus micro-batch durationMs. Variant
  * arg: "none" (baseline), "reset" (streams.resetTerminated each
  * round), "unload" (StateStore.unloadAll each round), "both". */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val variant = args.headOption.getOrElse("none")
    val rounds = args.drop(1).headOption.map(_.toInt).getOrElse(16)
    val spark = SparkSession.builder()
      .master("local[32]").appName("stream-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val path = "/root/repo/target/tmp/ndjson__root_testdata_sf0.1_v2_5133e179"
    for (round <- 1 to rounds) {
      val sink = s"probe_$round"
      val t0 = System.nanoTime()
      val stream = spark.readStream
        .schema("event_id LONG, user_id LONG, event_type STRING, value DOUBLE")
        .json(path)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"))
      val q = stream.writeStream
        .outputMode("complete")
        .format("memory")
        .queryName(sink)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val tDone = System.nanoTime()
      spark.table(sink).collect()
      spark.catalog.dropTempView(sink)
      val tRead = System.nanoTime()
      val batches = q.recentProgress.map(p =>
        s"b${p.batchId}:${p.durationMs}").mkString(" ")
      println(f"== round $round%2d total=${(tRead - t0) / 1e9}%.2f " +
        f"await=${(tDone - t0) / 1e9}%.2f  $batches")
      if (variant == "reset" || variant == "both")
        spark.streams.resetTerminated()
      if (variant == "unload" || variant == "both")
        org.apache.spark.sql.graftfns.StreamHygiene.unloadAllStateStores()
    }
    spark.stop()
  }
}
