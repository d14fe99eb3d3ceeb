package graft

import graft.etl.Sinks
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** U-tier sink operators (q_sink_append / q_sink_warehouse) and the
  * q_agg_approx accuracy bound (SURVEY.md §2.A, §2.D). */
class SinksAndApproxSpec extends SparkSpecBase {
  import spark.implicits._

  test("append sink accumulates batches (q_sink_append)") {
    val dir = Files.createTempDirectory("graft_append").toString + "/out"
    val batch = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    Sinks.appendNdjson(batch, dir)
    Sinks.appendNdjson(batch, dir)
    val back = spark.read.schema("id LONG, v STRING").json(dir)
    assert(back.count() == 4)
  }

  test("warehouse sink is idempotent overwrite, optionally partitioned") {
    val dir = Files.createTempDirectory("graft_wh").toString + "/t"
    val df = Seq((1L, "x", 1.0), (2L, "y", 2.0), (3L, "x", 3.0))
      .toDF("id", "part_col", "v")
    Sinks.writeWarehouseTable(df, dir, Seq("part_col"))
    Sinks.writeWarehouseTable(df, dir, Seq("part_col")) // rerun converges
    val back = spark.read.parquet(dir)
    assert(back.count() == 3)
    // partition pruning: one partition dir per part_col value
    assert(new java.io.File(dir).listFiles()
      .count(_.getName.startsWith("part_col=")) == 2)
    assert(back.filter(col("part_col") === "x").count() == 2)
  }

  test("approx_count_distinct within declared rsd of exact (q_agg_approx)") {
    val li = Tables.load(spark, sf0001, "lineitem")
    val rows = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("exact"),
        approx_count_distinct(col("l_partkey"), 0.02).as("approx"))
      .select("exact", "approx").as[(Long, Long)].collect()
    rows.foreach { case (exact, approx) =>
      val err = math.abs(approx - exact).toDouble / exact
      assert(err < 0.1, s"approx=$approx exact=$exact err=$err")
    }
  }
}
