package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.Q graph analytics over event-derived graphs.
  *
  * The scale discipline for iterative graph algorithms on Spark: CONTRACT
  * FIRST, ITERATE SMALL. The corpus-sized work is a single two-phase
  * aggregation that collapses 100 TB of events into a graph whose size is
  * bounded by the DOMAIN (k event types → k² edges), and every power
  * iteration then runs on that contracted table — broadcast-joinable,
  * shuffle-free, independent of corpus size. Iterating over the raw
  * edge-per-event stream (the naive Pregel shape) would shuffle the corpus
  * once per iteration; contracting first shuffles it once, total. The
  * contraction is `localCheckpoint`ed so the 5-iteration loop's lineage
  * does not replay the scan per iteration (the
  * [[graft.ops.TextSim]] union-find precedent).
  */
object GraphQueries {
  type Q = (SparkSession, String) => DataFrame

  /** q_graph_pagerank — PageRank over the event-type transition graph:
    * nodes are the distinct event types, edge weights the consecutive
    * (from → to) transition counts within each user's timeline
    * (q_evt_markov's matrix re-read as a weighted digraph), and 5
    * damped power iterations (d = 0.85, uniform 1/N init) score each
    * type by how central it is in user journeys — the "which state do
    * journeys orbit" complement of the funnel's fixed hypothesis.
    * Semantics pinned for engine parity: dangling mass is NOT
    * redistributed (a sink node's rank leaks, identically on both
    * engines), iteration count is fixed (no float-convergence test in
    * the control path), and only the final ranks round to 4 dp — the
    * per-iteration sums are ≤ k ≈ 5 doubles whose order drift is
    * ~1e-16, far under the rounding grid. Each iteration is a
    * broadcast join + k-row aggregate on the contracted graph; the
    * driver never touches per-event data. */
  private val graphPagerank: Q = (s, dir) => {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val events = Tables.load(s, dir, "events")
    // corpus-sized phase: one scan, two-phase aggregate → k² edge rows
    val edges = events
      .withColumn("to_type", lead("event_type", 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p", col("n").cast("double") /
        sum("n").over(Window.partitionBy("from_type")))
      .select("from_type", "to_type", "p")
      .localCheckpoint()
    val nodes = events.select(col("event_type").as("node"))
      .distinct().localCheckpoint()
    // n_nodes rides as a broadcast 1-row table, never a driver literal
    val nn = nodes.agg(count(lit(1)).cast("double").as("n_nodes"))
    var ranks = nodes.crossJoin(broadcast(nn))
      .select(col("node"), (lit(1.0) / col("n_nodes")).as("rank"))
    for (_ <- 1 to 5) {
      val contrib = edges
        .join(ranks, edges("from_type") === ranks("node"))
        .groupBy(col("to_type"))
        .agg(sum(col("rank") * col("p")).as("contrib"))
      ranks = nodes.crossJoin(broadcast(nn))
        .join(contrib, col("node") === col("to_type"), "left")
        .select(col("node"),
          (lit(0.15) / col("n_nodes") +
            lit(0.85) * coalesce(col("contrib"), lit(0.0))).as("rank"))
    }
    ranks
      .select(col("node").as("event_type"), round(col("rank"), 4).as("rank"))
      .orderBy("event_type")
  }

  val all: Map[String, Q] = Map(
    "q_graph_pagerank" -> graphPagerank)
}
