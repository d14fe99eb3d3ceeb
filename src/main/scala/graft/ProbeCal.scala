package graft
import org.apache.spark.sql.SparkSession

/** Probe calibration (dev tool): quiet-host distribution of the two
  * bench probes — the scheduler-latency micro-query ("sched", the r16
  * probe) and the fixed CPU-work leg ("cpu", r18). Their committed
  * quiet references live in test/BenchGate.scala. */
object ProbeCal {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def probeOnce(): Double = {
      val t0 = System.nanoTime()
      spark.range(1L << 20).selectExpr("id % 997 AS k")
        .groupBy("k").count().count()
      (System.nanoTime() - t0) / 1e9
    }
    def cpuProbeOnce(): Double = {
      val t0 = System.nanoTime()
      spark.range(0, 1L << 28, 1, 32)
        .selectExpr("bit_xor(xxhash64(id)) AS h").collect()
      (System.nanoTime() - t0) / 1e9
    }
    def stats(name: String, xs: Seq[Double]): Unit = {
      val s = xs.sorted
      println(f"$name min ${s.head}%.3f p50 ${s(xs.size / 2)}%.3f " +
        f"p90 ${s((xs.size * 9) / 10)}%.3f max ${s.last}%.3f")
    }
    (1 to 3).foreach(_ => probeOnce())
    stats("SCHED", (1 to 30).map(_ => probeOnce()))
    (1 to 3).foreach(_ => cpuProbeOnce())
    stats("CPU", (1 to 30).map(_ => cpuProbeOnce()))
    spark.stop()
  }
}
