package graft

/** Q-tier gate for q_vec_lsh_balance: the seeded hyperplane kernel has
  * no DuckDB twin, so the profile's defining invariants are pinned
  * here — conservation (every vector lands in exactly one bucket per
  * table), well-formedness, and rerun stability. */
class LshBalanceSpec extends SparkSpecBase {

  test("lsh balance profile: conservation, bounds, determinism") {
    val n = Tables.load(spark, sf0001, "embeddings").count()
    val r1 = graft.queries.TextQueries.vecLshBalanceRaw(spark, sf0001)
      .collect()
    val r2 = graft.queries.TextQueries.vecLshBalanceRaw(spark, sf0001)
      .collect()
    assert(r1.length == 1)
    assert(r1.map(_.toSeq).toSeq == r2.map(_.toSeq).toSeq,
      "profile must be rerun-stable (seeded planes, no RNG)")
    val row = r1.head
    val nBuckets = row.getAs[Long]("n_buckets")
    val total = row.getAs[Long]("total_entries")
    val minOcc = row.getAs[Long]("min_occ")
    val maxOcc = row.getAs[Long]("max_occ")
    val mean = row.getAs[Double]("mean_occ")
    val skew = row.getAs[Double]("skew")
    // conservation: 4 tables, each vector in exactly one bucket per
    // table — the index the profile describes must account for every
    // entry, or the balance numbers are lies.
    assert(total == 4 * n, s"entries $total != 4 * $n")
    assert(nBuckets > 0 && nBuckets <= total)
    assert(minOcc >= 1 && maxOcc >= minOcc)
    assert(mean >= minOcc - 1e-9 && mean <= maxOcc + 1e-9)
    assert(skew >= 1.0 - 1e-9, s"max/mean skew $skew must be >= 1")
  }
}
