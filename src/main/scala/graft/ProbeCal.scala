package graft
import org.apache.spark.sql.SparkSession
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
    (1 to 3).foreach(_ => probeOnce())
    val xs = (1 to 30).map(_ => probeOnce())
    println(f"PROBE min ${xs.min}%.3f p50 ${xs.sorted.apply(15)}%.3f p90 ${xs.sorted.apply(27)}%.3f max ${xs.max}%.3f")
    spark.stop()
  }
}
