package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: time one registered query at a given SF dir (warm-up run +
  * one timed noop-sink run, mirroring Bench's methodology) —
  * `sbt "runMain graft.BenchOne /root/testdata/sf0.1 q_vec_cosine_dedup"`. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]").appName("bench-one")
      .config("spark.sql.shuffle.partitions", "32")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args(0); val name = args(1)
    // warm-up
    SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
    val t0 = System.nanoTime()
    SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
    println(s"ONE ${name} ${(System.nanoTime()-t0)/1e9}")
    spark.stop()
  }
}
