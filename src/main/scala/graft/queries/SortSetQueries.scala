package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.F sorts/limits/top-k and §2.G set operations. */
object SortSetQueries {
  type Q = (SparkSession, String) => DataFrame

  /** q_sort_multi — custom-collation sort via array_position (ref weekday
    * collation `database/app.py:22,157`
    * `sorted(..., key=WEEKDAY_ORDER.index)`). */
  private val sortMulti: Q = (s, dir) => {
    val order = typedLit(Seq("signup", "view", "click", "purchase", "error"))
    Tables.load(s, dir, "events")
      .withColumn("type_rank", array_position(order, col("event_type")))
      .select("event_id", "event_type", "type_rank")
      .orderBy("type_rank", "event_id")
  }

  /** q_limit — ordered limit (ref `.limit(page_size)`
    * `database/app.py:80,129,208`); ORDER BY before limit, else the result
    * is partition-order-dependent (SURVEY.md §7.5.7). */
  private val limitQ: Q = (s, dir) =>
    Tables.load(s, dir, "orders")
      .select("o_orderkey", "o_totalprice")
      .orderBy("o_orderkey")
      .limit(100)

  /** q_topk — order+limit fuses to TakeOrderedAndProject: each partition
    * keeps a K-heap, driver merges K×partitions rows — no global sort at
    * any scale (ref best-ranked businesses `web_scraper/web_scraping.py:96`). */
  private val topk: Q = (s, dir) =>
    Tables.load(s, dir, "orders")
      .select("o_orderkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)

  /** q_set_union — batch concatenation (ref page-batch appends
    * `web_scraper/web_scraping.py:219-229`). unionByName: position bugs at
    * 80 columns are real. */
  private val setUnion: Q = (s, dir) => {
    val o = Tables.load(s, dir, "orders").select("o_orderkey", "o_orderstatus")
    o.filter(col("o_orderstatus") === "F")
      .unionByName(o.filter(col("o_orderstatus") === "O"))
      .orderBy("o_orderkey")
  }

  /** q_set_except — resume-set difference with bag semantics (ref
    * `web_scraper/web_scraping.py:517-521`): per-customer order slots not
    * yet in final status. Catalyst rewrites EXCEPT ALL to a counted
    * union+generate — no materialized set on the driver. */
  private val setExcept: Q = (s, dir) => {
    val o = Tables.load(s, dir, "orders")
    o.select(col("o_custkey").as("cust_id"))
      .exceptAll(o.filter(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("cust_id")))
      .orderBy("cust_id")
  }

  /** q_set_intersect — overlap detection, dual of except. */
  private val setIntersect: Q = (s, dir) =>
    Tables.load(s, dir, "customer").select("c_custkey")
      .intersect(Tables.load(s, dir, "orders")
        .select(col("o_custkey").as("c_custkey")))
      .orderBy("c_custkey")

  val all: Map[String, Q] = Map(
    "q_sort_multi" -> sortMulti,
    "q_limit" -> limitQ,
    "q_topk" -> topk,
    "q_set_union" -> setUnion,
    "q_set_except" -> setExcept,
    "q_set_intersect" -> setIntersect)
}
