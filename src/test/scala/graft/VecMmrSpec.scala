package graft

import org.apache.spark.sql.functions._

/** Q-tier gate for q_vec_mmr: the greedy argmax chain has no DuckDB
  * twin, so the properties that define MMR are pinned here instead —
  * the first pick IS the relevance argmax, the output is deterministic
  * and well-formed, and the selected set is strictly more diverse than
  * plain top-10-by-relevance (the whole point of the operator). */
class VecMmrSpec extends SparkSpecBase {

  private def cosSets(ids: Seq[Long]): Double = {
    // mean pairwise cosine of the given vec_ids, computed from the
    // fixture directly (4-dp per-pair grid like the operator).
    val vecs = Tables.load(spark, sf0001, "embeddings")
      .filter(col("vec_id").isin(ids: _*))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    val pairs = for {
      i <- ids.indices; j <- (i + 1) until ids.size
    } yield {
      val a = vecs(ids(i)); val b = vecs(ids(j))
      var dot = 0.0; var na = 0.0; var nb = 0.0; var k = 0
      while (k < a.length) {
        dot += a(k) * b(k); na += a(k) * a(k); nb += b(k) * b(k); k += 1
      }
      math.rint(dot / (math.sqrt(na) * math.sqrt(nb)) * 1e4) / 1e4
    }
    pairs.sum / pairs.size
  }

  test("mmr: shape, determinism, and first pick = relevance argmax") {
    val run1 = graft.queries.TextQueries.vecMmrRaw(spark, sf0001).collect()
    val run2 = graft.queries.TextQueries.vecMmrRaw(spark, sf0001).collect()
    assert(run1.length == 10)
    assert(run1.map(_.getInt(0)).toSeq == (1 to 10))
    assert(run1.map(_.toSeq).toSeq == run2.map(_.toSeq).toSeq,
      "greedy selection must be rerun-stable")
    // the first pick maximizes relevance (ties on vec_id)
    val emb = Tables.load(spark, sf0001, "embeddings")
    val probe = emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("probe_vec"))
    val top = emb.filter(col("vec_id") =!= 0).crossJoin(broadcast(probe))
      .withColumn("rel",
        round(graft.ops.TextSim.cosine(col("embedding"), col("probe_vec")), 4))
      .orderBy(col("rel").desc, col("vec_id"))
      .select("vec_id").head().getLong(0)
    assert(run1.head.getLong(1) == top,
      s"first MMR pick ${run1.head.getLong(1)} != relevance argmax $top")
    // mmr_score is non-increasing from rank 2 on: for a fixed
    // candidate the penalty max-sim only grows as S grows, and the
    // pool only shrinks, so each round's max cannot exceed the last.
    // (Rank 1 is excluded: its score uses penalty 0, and a NEGATIVE
    // sim to the first pick can push a rank-2 score above 0.7·rel —
    // the monotone argument needs a nonempty S on both sides.)
    val scores = run1.map(_.getDouble(4)).toSeq.tail
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
      s"mmr_score not non-increasing from rank 2: $scores")
  }

  test("mmr picks are more diverse than plain top-10-by-relevance") {
    val mmrIds = graft.queries.TextQueries.vecMmrRaw(spark, sf0001)
      .collect().map(_.getLong(1)).toSeq
    val emb = Tables.load(spark, sf0001, "embeddings")
    val probe = emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("probe_vec"))
    val topIds = emb.filter(col("vec_id") =!= 0).crossJoin(broadcast(probe))
      .withColumn("rel",
        round(graft.ops.TextSim.cosine(col("embedding"), col("probe_vec")), 4))
      .orderBy(col("rel").desc, col("vec_id"))
      .limit(10).collect().map(_.getAs[Long]("vec_id")).toSeq
    if (mmrIds.toSet != topIds.toSet) {
      assert(cosSets(mmrIds) < cosSets(topIds),
        "MMR set must have lower mean pairwise similarity than the " +
          "relevance-only top-10")
    }
  }
}
