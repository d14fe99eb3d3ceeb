package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries TIMESTAMP(NANOS); see Tables.load
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warm-up: session/codegen/scheduler startup should not be
    // attributed to whichever query happens to run first
    spark.range(1000).selectExpr("sum(id)").collect()
    // fixture materialization (NDJSON dump for the file sources) happens
    // outside the timed region — the operators under test are the scans,
    // not the one-off fixture write
    graft.queries.SourceQueries.prepareFixtures(spark, sfDir)
    graft.ops.Multimodal.mediaFixture(spark)
    val results = SparkEntry.queries.map { case (name, fn) =>
      // one untimed warm-up execution per query, then one timed run:
      // JIT/codegen compilation and first-touch setup are one-time costs
      // that amortize at scale and otherwise get attributed to whichever
      // operator runs first (same principle as the session warm-up above)
      def runOnce(): Boolean =
        try { fn(spark, sfDir).count(); true } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            false
        }
      val ok = runOnce()
      val t0 = System.nanoTime()
      val ok2 = ok && runOnce()
      // -1 marks a failed query instead of silently reporting its
      // time-to-crash as a (fast) success
      name -> (if (ok2) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","method":"warm",""" +
        s""""queries":$qs,"sf":"$sfDir"}"""
    println(json)
    // stdout interleaves with sbt log prefixes; the file copy is the
    // parse-safe artifact (the driver's BENCH parser reads either).
    // Absolute path: a cwd-relative one would land outside the repo when
    // launched from elsewhere (same contract as SourceQueries.scratch).
    val out = new java.io.File("/root/repo/target/bench.json")
    out.getParentFile.mkdirs()
    val w = new java.io.PrintWriter(out)
    try w.println(json) finally w.close()
    spark.stop()
  }
}
