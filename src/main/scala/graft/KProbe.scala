package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
object KProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[8]").appName("kp")
      .config("spark.sql.shuffle.partitions", "8").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val grid = Tables.load(s, "/root/testdata/sf0.01", "lineitem")
      .groupBy(col("l_quantity").as("x"))
      .agg(count(when(col("l_returnflag") === "A", 1)).cast("decimal(38,0)").as("cA"),
        count(when(col("l_returnflag") === "N", 1)).cast("decimal(38,0)").as("cN"),
        count(when(col("l_returnflag") === "R", 1)).cast("decimal(38,0)").as("cR"))
      .withColumn("cnt", col("cA") + col("cN") + col("cR"))
    val w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val r = grid.withColumn("cum", sum("cnt").over(w))
      .withColumn("r2", lit(2) * col("cum") - col("cnt") + 1)
    r.agg(sum("cA"), sum("cN"), sum("cR"),
      sum(col("cA") * col("r2")), sum(col("cN") * col("r2")), sum(col("cR") * col("r2")),
      sum(col("cnt") * col("cnt") * col("cnt") - col("cnt"))).show(false)
    r.orderBy("x").show(5, false)
    s.stop()
  }
}
