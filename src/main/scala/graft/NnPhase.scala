package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.TextSim

/** Dev tool: phase timing for q_vec_ann_nndescent — init-only graph,
  * per-round deltas, and the full registered readout, to locate the
  * fixed job overhead the bench pays at the 500-vector demo slice. */
object NnPhase {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]").appName("nn-phase")
      .config("spark.sql.shuffle.partitions", "32")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val slice = Tables.load(spark, dir, "embeddings")
      .filter(col("vec_id") < 500)
    def t(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PHASE $tag%-14s ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    // warm everything once
    TextSim.nnDescentGraph(slice, 5, 2).count()
    t("iters0")(TextSim.nnDescentGraph(slice, 5, 0).count())
    t("iters1")(TextSim.nnDescentGraph(slice, 5, 1).count())
    t("iters2")(TextSim.nnDescentGraph(slice, 5, 2).count())
    (1 to 5).foreach { i =>
      t(s"full-query-$i")(
        SparkEntry.queries("q_vec_ann_nndescent")(spark, dir).count())
    }
    // job-level breakdown of ONE warm execution
    val jobs =
      scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Int, String)]
    val listener = new org.apache.spark.scheduler.SparkListener {
      val starts = scala.collection.mutable.Map.empty[Int, Long]
      val stages = scala.collection.mutable.Map.empty[Int, Int]
      val sites = scala.collection.mutable.Map.empty[Int, String]
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        starts(js.jobId) = js.time
        stages(js.jobId) = js.stageInfos.size
        sites(js.jobId) = js.stageInfos.map(_.name).mkString(" | ")
      }
      override def onJobEnd(
          je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        jobs.synchronized {
          jobs += ((je.jobId, je.time - starts.getOrElse(je.jobId, je.time),
            stages.getOrElse(je.jobId, 0),
            sites.getOrElse(je.jobId, "?")))
        }
    }
    spark.sparkContext.addSparkListener(listener)
    SparkEntry.queries("q_vec_ann_nndescent")(spark, dir).count()
    Thread.sleep(1000) // let the listener bus drain
    jobs.sortBy(_._1).foreach { case (id, ms, st, site) =>
      println(f"JOB $id%3d ${ms}%6d ms  $st stages  $site")
    }
    println(f"JOBTOTAL ${jobs.map(_._2).sum} ms over ${jobs.size} jobs")
    spark.stop()
  }
}
