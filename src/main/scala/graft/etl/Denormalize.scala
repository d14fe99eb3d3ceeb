package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Warehouse → nested-record denormalization: the inverse of
  * [[Normalize]], rebuilding the §1.2 "wide" scraped shape from the 11
  * normalized tables (reference spec `README.md:82-105`). Arrays are
  * rebuilt order-stable (`sort_array∘collect_list`, §2.D q_agg_collect) so
  * the round-trip is deterministic.
  *
  * Shape note: `open_hours` comes back as structured intervals
  * (weekday, open/close seconds) rather than re-rendered display strings —
  * the string grammar is presentation, the intervals are the data.
  */
object Denormalize {

  private def collectNames(bridge: DataFrame, dim: DataFrame,
                           dimIdCol: String, outCol: String): DataFrame =
    bridge.join(broadcast(dim.withColumnRenamed("id", dimIdCol)), dimIdCol)
      .groupBy("business_id")
      .agg(sort_array(collect_list(col("name"))).as(outCol))

  /** Rebuild one nested record per business. */
  def toNested(tables: Map[String, DataFrame]): DataFrame = {
    val hours = tables("open_hours")
      .join(broadcast(tables("weekday")
        .select(col("id").as("weekday_id"), col("name").as("weekday"))),
        "weekday_id")
      .groupBy(col("business_id"))
      .agg(sort_array(collect_list(struct(
        col("weekday_id"), col("weekday"), col("open_time"),
        col("close_time")))).as("open_hours"))
    val amenities = tables("business_amenity")
      .join(broadcast(tables("amenity").withColumnRenamed("id", "amenity_id")),
        "amenity_id")
      .groupBy("business_id")
      .agg(sort_array(collect_list(struct(col("name").as("amenity"),
        col("is_available")))).as("amenities"))

    val joined = Seq(
      collectNames(tables("business_food_category"), tables("food_category"),
        "food_category_id", "food_category"),
      collectNames(tables("business_search_term"), tables("search_term"),
        "search_term_id", "related_search_terms"),
      collectNames(tables("business_highlight"), tables("highlight"),
        "highlight_id", "highlights"),
      hours, amenities)
      .foldLeft(tables("business").withColumnRenamed("id", "business_id")) {
        (acc, side) => acc.join(side, Seq("business_id"), "left")
      }
    // businesses with no rows on a collection get an EMPTY array for all
    // five collections (the scraped shape never has null arrays) — each
    // empty literal cast to that column's element type
    Seq("food_category", "related_search_terms", "highlights", "open_hours",
      "amenities").foldLeft(joined) { (df, c) =>
      df.withColumn(c, coalesce(col(c), array().cast(df.schema(c).dataType)))
    }
  }
}
