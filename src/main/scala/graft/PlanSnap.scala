package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
import java.nio.file.{Files, Paths}

/** Dev tool: write the formatted physical plan of a list of registered
  * queries to `<outDir>/<query>_<suffix>.txt` — the per-round plan
  * evidence (`plans/rNN/`) the optimization rounds commit alongside
  * OPTIMIZATION_rNN.md. Usage:
  *
  *   sbt "runMain graft.PlanSnap /root/repo/plans/r19 after \
  *        /root/testdata/sf0.1 q_win_ema_time q_agg_bootstrap"
  *
  * One shared local session (plan shapes are core-count independent;
  * AQE finalizes at runtime, the dump records the static plan the same
  * way PLANS.md does). */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    val outDir = Paths.get(args(0))
    val suffix = args(1)
    val dir = args(2)
    val names = args.drop(3)
    Files.createDirectories(outDir)
    val spark = SparkSession.builder()
      .master("local[8]").appName("plan-snap")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.queries.SourceQueries.prepareFixtures(spark, dir)
    graft.ops.Multimodal.mediaFixture(spark)
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      val plan = df.queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      Files.writeString(outDir.resolve(s"${name}_$suffix.txt"), plan)
      println(s"wrote ${name}_$suffix.txt")
    }
    spark.stop()
  }
}
