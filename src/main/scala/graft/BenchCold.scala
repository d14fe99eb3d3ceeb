package graft

import org.apache.spark.sql.SparkSession

/** Dev tool (r16 verdict #2): COLD-session price for a list of
  * queries — each runs in a FRESH SparkSession/SparkContext (block
  * manager, broadcasts, RDD caches, and the shared CoOrderGraph
  * contraction all start empty; only JVM-level JIT/codegen caches
  * persist, which the driver's long bench session also keeps). This
  * is the figure the in-bench warm median undercounts: the r16
  * q_graph_powerlaw breach was a 2.79 s warm anchor against a
  * 4.5–5.1 s cold reality. One in-session warm-up run (codegen +
  * parquet footers) then one timed run, mirroring BenchOne.
  *
  * `sbt "runMain graft.BenchCold /root/testdata/sf0.1 q_a q_b ..."`
  * — prints one `COLD <query> <sec>` line per query. */
object BenchCold {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      graft.ops.CoOrderGraph.invalidate()
      val spark = SparkSession.builder()
        .master("local[32]").appName(s"bench-cold-$name")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      try {
        graft.queries.SourceQueries.prepareFixtures(spark, dir)
        graft.ops.Multimodal.mediaFixture(spark)
        // noop sink, matching graft.Bench's r17 sink switch: these
        // anchors lint the budget gate, so they must price the same
        // (fully materialized) plan the gate judges.
        def once(): Double = {
          val t0 = System.nanoTime()
          SparkEntry.queries(name)(spark, dir)
            .write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        once() // warm-up (codegen, footer cache — NOT session state)
        println(f"COLD $name ${once()}%.3f")
      } catch {
        case e: Throwable =>
          println(s"COLD $name FAILED ${e.getMessage}")
      } finally {
        spark.stop()
        // a stopped context must not satisfy the next getOrCreate
        SparkSession.clearActiveSession()
        SparkSession.clearDefaultSession()
      }
    }
  }
}
