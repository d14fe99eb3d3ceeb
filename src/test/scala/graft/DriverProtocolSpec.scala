package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, max, min}
import org.apache.spark.sql.types.{ArrayType, MapType, StructType, TimestampType}
import scala.jdk.CollectionConverters._

/** Output-protocol gates for every O-tier query: the external
  * differential harness dumps each result to parquet, reads it with
  * pandas (datetime64[ns]), row-sorts it column-by-column, and hashes —
  * so an output is only verifiable when every top-level cell is a
  * sortable scalar and every timestamp fits in ns range. Both round-6
  * failures were breaches of exactly this contract, invisible to the
  * local DuckDB gate (which neither row-sorts nor reads ns):
  *
  *  - q_vec_quantize shipped a raw `array<int>` column → pandas
  *    `sort_values` dies on unhashable `numpy.ndarray`;
  *  - q_etl_scd2 used the 9999-12-31 warehouse sentinel → outside
  *    datetime64[ns] (max 2262-04-11), so the two sides normalized
  *    differently and the hashes split.
  *
  * This spec closes the class at commit time: arrays/maps/structs must
  * be serialized (the q_agg_collect `concat_ws` protocol) and timestamp
  * extrema must stay inside the ns window. Schema checks are plan-only;
  * extrema checks execute just the timestamp-bearing queries, at
  * sf0.001.
  */
class DriverProtocolSpec extends SparkSpecBase {

  /** O-tier ids from SURVEY §2 (same row grammar ContractSpec pins). */
  private val oTier: Seq[String] = {
    val survey = java.nio.file.Files
      .readAllLines(java.nio.file.Paths.get("/root/repo/SURVEY.md"))
      .asScala.mkString("\n")
    val rowRe =
      """\|\s*(q_[a-z0-9_]+)\s*\|.*\|\s*([OQU])\b[^|]*\|?\s*$""".r
    survey.linesIterator.flatMap {
      case rowRe(id, "O") => Some(id)
      case _ => None
    }.toSeq.sorted
  }

  /** Column names whose type pandas cannot sort/hash as a scalar cell. */
  private def unsortableCols(df: DataFrame): Seq[String] =
    df.schema.fields.collect {
      case f if f.dataType.isInstanceOf[ArrayType] ||
        f.dataType.isInstanceOf[MapType] ||
        f.dataType.isInstanceOf[StructType] => s"${f.name}: ${f.dataType.sql}"
    }.toSeq

  // pandas datetime64[ns] representable window (ns since epoch in i64)
  private val nsMin = java.sql.Timestamp.valueOf("1677-09-22 00:00:00")
  private val nsMax = java.sql.Timestamp.valueOf("2262-04-11 00:00:00")

  test("the checker rejects a deliberately-arrayed schema") {
    import spark.implicits._
    val bad = Seq((1L, Seq(1, 2))).toDF("id", "codes")
    assert(unsortableCols(bad) == Seq("codes: ARRAY<INT>"))
    val good = Seq((1L, "1|2")).toDF("id", "codes_s")
    assert(unsortableCols(good).isEmpty)
  }

  test("no O-tier query emits a top-level array/map/struct column") {
    val violations = oTier.flatMap { id =>
      val bad = unsortableCols(SparkEntry.queries(id)(spark, sf0001))
      if (bad.isEmpty) None else Some(s"$id -> ${bad.mkString(", ")}")
    }
    assert(violations.isEmpty,
      "driver hasher cannot sort these outputs (serialize via the " +
        s"q_agg_collect concat_ws protocol):\n${violations.mkString("\n")}")
  }

  test("O-tier timestamp outputs stay inside datetime64[ns], no NaT") {
    // two normalization splitters in one pass: extrema outside the ns
    // window (the q_etl_scd2 9999-12-31 failure) and null timestamps
    // (NaT compares diverge between the driver's ns path and the µs
    // read — the repo's standing "no NaT in output" rule)
    val violations = oTier.flatMap { id =>
      val df = SparkEntry.queries(id)(spark, sf0001)
      val tsCols = df.schema.fields
        .filter(_.dataType == TimestampType).map(_.name).toSeq
      if (tsCols.isEmpty) None
      else {
        val aggs = tsCols.flatMap(c => Seq(
          min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"),
          org.apache.spark.sql.functions.sum(
            org.apache.spark.sql.functions.when(col(c).isNull, 1L)
              .otherwise(0L)).as(s"nulls_$c")))
        val row = df.agg(aggs.head, aggs.tail: _*).head()
        val bad = tsCols.flatMap { c =>
          val range = Seq(s"min_$c", s"max_$c").flatMap { a =>
            Option(row.getAs[java.sql.Timestamp](a))
              .filter(t => t.before(nsMin) || t.after(nsMax))
              .map(t => s"$id.$c = $t")
          }
          val nat = Option(row.getAs[Long](s"nulls_$c")).filter(_ > 0)
            .map(n => s"$id.$c has $n null timestamps (NaT)")
          range ++ nat
        }
        if (bad.isEmpty) None else Some(bad.mkString(", "))
      }
    }
    assert(violations.isEmpty,
      "timestamp outputs the driver cannot normalize stably:\n" +
        violations.mkString("\n"))
  }
}
