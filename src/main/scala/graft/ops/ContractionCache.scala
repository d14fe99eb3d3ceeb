package graft.ops

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped cache of corpus-sized, localCheckpointed contractions
  * shared across queries of a family — the documented, priced
  * cross-query state (r16 verdict task #4 for the co-order graph; r19
  * verdict item 4 extends the device to the MinHash banding pipeline).
  * One corpus-sized build per (context, dir, variant) instead of one
  * per query; every later consumer reads the checkpointed blocks.
  *
  * `graft.Bench`'s inter-query hygiene excludes [[protectedRddIds]]
  * from its unpersist sweep — a localCheckpointed RDD whose blocks are
  * dropped cannot be recomputed (lineage is truncated). Ids are scoped
  * per context incarnation: RDD ids restart from 0 in a new
  * SparkContext, so an id protected under a dead context must never
  * shield an unrelated new RDD. */
object ContractionCache {
  private val cache = new ConcurrentHashMap[String, DataFrame]()
  private val protectedByCtx =
    new ConcurrentHashMap[String, java.util.Set[Int]]()
  @volatile private var liveCtx = ""

  /** RDD ids backing cached contractions of the LIVE context — call at
    * sweep time, not once up front (the set is created lazily by the
    * first contraction build). */
  def protectedRddIds: java.util.Set[Int] =
    Option(protectedByCtx.get(liveCtx))
      .getOrElse(java.util.Collections.emptySet[Int]())

  /** Drop every cached contraction (tests that restart contexts). */
  def invalidate(): Unit = { cache.clear(); protectedByCtx.clear() }

  /** Build-once lookup: `build` runs and is localCheckpointed on the
    * first call per (context incarnation, dir, variant); later calls
    * return the materialized frame. */
  def cached(s: SparkSession, dir: String, variant: String)
      (build: => DataFrame): DataFrame = {
    // keyed per SparkContext incarnation: sessions sharing a context
    // share checkpointed blocks; a restarted context gets fresh keys
    val ctx = s"${s.sparkContext.applicationId}|" +
      s"${s.sparkContext.startTime}"
    if (liveCtx != ctx) {
      // evict state of dead context incarnations: stale DataFrames
      // would pin stopped-context lineage in long-lived test JVMs,
      // and stale protected ids (RDD ids restart from 0) would
      // shield unrelated new RDDs from the bench unpersist sweep
      cache.keySet.removeIf(k => !k.startsWith(ctx + "|"))
      protectedByCtx.keySet.removeIf(_ != ctx)
      liveCtx = ctx
    }
    val key = s"$ctx|$dir|$variant"
    Option(cache.get(key)).getOrElse {
      // bench runs queries sequentially; a lost race here only costs
      // a duplicate (idempotent) checkpoint
      val before = s.sparkContext.getPersistentRDDs.keySet
      val e = build.localCheckpoint()
      val ids = protectedByCtx.computeIfAbsent(
        ctx, _ => ConcurrentHashMap.newKeySet[Int]())
      (s.sparkContext.getPersistentRDDs.keySet -- before)
        .foreach(id => ids.add(id))
      cache.put(key, e)
      e
    }
  }
}
