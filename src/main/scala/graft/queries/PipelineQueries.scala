package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.O pipeline patterns — multi-stage dataflows a production warehouse
  * runs daily: ordered-funnel attribution over the event stream and the
  * latest-wins upsert merge. Both are single-key dataflows: every
  * shuffle in a query keys on the same column, so Catalyst reuses one
  * hash partitioning across all stages (no re-shuffle between the
  * aggregate, the join, and the next aggregate). */
object PipelineQueries {
  type Q = (SparkSession, String) => DataFrame

  /** q_evt_funnel — strictly-ordered three-stage funnel
    * (view → click → purchase) per user: stage k counts only if it
    * happens AFTER the user's first stage-(k−1) event (the reference's
    * event loop `web_scraper/web_scraping.py:473-534` generalized to
    * the per-entity ordered-progress question). Shape: three
    * filter→min aggregates chained by equi-joins, ALL keyed on
    * user_id — one exchange per stage input, co-partitioned joins, and
    * the filter on event_type is pushed into each parquet scan. At
    * 100 TB this beats the collect_list-per-user formulation, whose
    * per-user event arrays are unbounded (a hot user OOMs the task);
    * here state per user is one timestamp per stage. */
  private val evtFunnel: Q = (s, dir) => {
    val ev = Tables.load(s, dir, "events")
      .select("user_id", "event_type", "ts")
    def stageMin(tpe: String, after: Option[(DataFrame, String)],
                 out: String): DataFrame = {
      val base = ev.filter(col("event_type") === tpe)
      val gated = after match {
        case Some((prev, tcol)) =>
          base.join(prev.select("user_id", tcol), Seq("user_id"))
            .filter(col("ts") > col(tcol))
        case None => base
      }
      gated.groupBy("user_id").agg(min("ts").as(out))
    }
    val v = stageMin("view", None, "t_view")
    val c = stageMin("click", Some((v, "t_view")), "t_click")
    val p = stageMin("purchase", Some((c, "t_click")), "t_purchase")
    v.join(c, Seq("user_id"), "left")
      .join(p, Seq("user_id"), "left")
      .select(col("user_id"), col("t_view"), col("t_click"),
        col("t_purchase"),
        (lit(1L) + col("t_click").isNotNull.cast("long")
          + col("t_purchase").isNotNull.cast("long")).as("stage"))
      .orderBy("user_id")
  }

  /** q_etl_upsert — latest-wins merge (SCD-1 upsert): a base snapshot
    * overlaid with a batch of updates; update rows win on key collision,
    * unmatched updates insert, unmatched base rows survive (the
    * reference's `get_or_create`-then-overwrite load semantics,
    * `database/parse_and_upload_to_db.py:31-47,99-100`, as one
    * declarative dataflow). Implementation is the union + per-key
    * version window — the formulation that generalizes to N batches and
    * stays a single shuffle on the merge key; a full-outer-join merge
    * needs one join per batch instead. Both inputs here are derived
    * deterministically from `orders` (base = keys ≢ 3 (mod 4); updates =
    * odd keys, re-priced), giving all three merge cases: update,
    * insert-only, base-only. */
  private val etlUpsert: Q = (s, dir) => {
    val orders = Tables.load(s, dir, "orders")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    val base = orders.filter(col("o_orderkey") % 4 =!= 3)
      .withColumn("version", lit(0L))
    // the re-price goes through exact DECIMAL arithmetic (§7.5.2): a
    // double round(x*1.1, 2) can land differently per engine on
    // half-cases, decimal multiply cannot
    val updates = orders.filter(col("o_orderkey") % 2 === 1)
      .withColumn("o_orderstatus", lit("U"))
      .withColumn("o_totalprice",
        expr("""CAST(CAST(o_totalprice AS DECIMAL(18,2))
                     * CAST(1.1 AS DECIMAL(2,1)) AS DOUBLE)"""))
      .withColumn("version", lit(1L))
    val w = Window.partitionBy("o_orderkey").orderBy(col("version").desc)
    base.unionByName(updates)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("o_orderkey", "o_orderstatus", "o_totalprice", "version")
      .orderBy("o_orderkey")
  }

  val all: Map[String, Q] = Map(
    "q_evt_funnel" -> evtFunnel,
    "q_etl_upsert" -> etlUpsert)
}
