package graft

import org.apache.spark.sql.SparkSession

/** Dev tool (r17): MATERIALIZED price of every query — noop sink, so
  * final projections actually evaluate — for diffing against the
  * count()-based bench medians. A large noop/count ratio marks a
  * count()-pruning blind spot: cost living in output expressions the
  * bench never prices (the q_text_containment class, 15.8 s noop vs
  * 0.16 s benched before its r17 fix). One warm session, one warm-up
  * + one timed run per query, hygiene between queries (mirrors
  * graft.Bench's reset, keeping the shared CoOrderGraph cache).
  *
  * `sbt "runMain graft.BenchNoop /root/testdata/sf0.1 [q ...]"` —
  * prints `NOOP <query> <sec>` lines. */
object BenchNoop {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[32]").appName("bench-noop")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.queries.SourceQueries.prepareFixtures(spark, dir)
    graft.ops.Multimodal.mediaFixture(spark)
    def hygiene(): Unit = {
      spark.catalog.clearCache()
      // re-read at sweep time: the protected set is created lazily by
      // the first contraction build, after this main starts
      val keep = graft.ops.CoOrderGraph.protectedRddIds
      spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!keep.contains(id)) rdd.unpersist(blocking = false) }
    }
    names.foreach { name =>
      def once(): Double = {
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      try {
        once()
        println(f"NOOP $name ${once()}%.3f")
      } catch {
        case e: Throwable => println(s"NOOP $name FAILED ${e.getMessage}")
      }
      hygiene()
    }
    spark.stop()
  }
}
