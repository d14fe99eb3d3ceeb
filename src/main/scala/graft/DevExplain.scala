package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev tool: print the formatted physical plan of one registered query —
  * `sbt "runMain graft.DevExplain /root/testdata/sf0.1 q_sql_report"`. */
object DevExplain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]").appName("dev-explain")
      .config("spark.sql.shuffle.partitions", "32")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(args(1))(spark, args(0))
    // scalastyle:off println
    println(df.queryExecution.explainString(ExplainMode.fromString("formatted")))
    // scalastyle:on println
    spark.stop()
  }
}
