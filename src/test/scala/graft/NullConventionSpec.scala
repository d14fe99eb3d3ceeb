package graft

import org.apache.spark.sql.functions._

/** Null-convention parity probes (VERDICT r15 ask #3): the two latent
  * cross-engine hash bombs were queries whose Spark and DuckDB sides
  * could diverge the moment a fixture refresh introduces a NULL in the
  * relevant column — q_evt_stickiness (Spark's count-over-grid MAU
  * would count a NULL user as an active; DuckDB's COUNT(DISTINCT
  * user_id) drops it) and q_agg_auc (the engines disagree on where an
  * ORDER BY places a NULL value group: Spark nulls-first, DuckDB
  * nulls-last). Both were pinned to one convention — filter the null
  * rows on BOTH engines — which makes the query output INVARIANT to
  * such rows. These probes prove the invariance end-to-end by running
  * each registered query on a fixture with nulls injected and
  * asserting bit-identical output, so the convention cannot silently
  * regress on either side's next edit. */
class NullConventionSpec extends SparkSpecBase {

  /** events fixture + `mutate` applied to a 50-row sample appended. */
  private def probeDir(tag: String)(
      mutate: org.apache.spark.sql.DataFrame =>
        org.apache.spark.sql.DataFrame): String = {
    val base = spark.read.parquet(s"$sf0001/events.parquet")
    val dir = java.nio.file.Files
      .createTempDirectory(s"nullprobe_$tag").toString
    base.unionByName(mutate(base.limit(50)))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def rows(q: String, dir: String): Seq[String] =
    SparkEntry.queries(q)(spark, dir).collect().map(_.toString).toSeq

  test("q_evt_stickiness is invariant to NULL-user rows") {
    val dir = probeDir("user")(
      _.withColumn("user_id", lit(null).cast("bigint")))
    assert(rows("q_evt_stickiness", dir) ==
      rows("q_evt_stickiness", sf0001),
      "stickiness must drop NULL users on the Spark side (the oracle's " +
        "COUNT(DISTINCT user_id) drops them)")
  }

  test("q_agg_auc is invariant to NULL-value rows") {
    val dir = probeDir("value")(
      _.withColumn("value", lit(null).cast("double")))
    assert(rows("q_agg_auc", dir) == rows("q_agg_auc", sf0001),
      "auc must drop NULL values on the Spark side (the engines' " +
        "null-ordering defaults differ on the rank window)")
  }

  // ── round-16 batch coverage: every new events-reading operator
  // that pins a null convention must be INVARIANT to injected nulls
  // on the column it filters, or a fixture refresh reds it (the
  // stickiness/auc class, swept instead of named one at a time) ──

  private lazy val nullUserDir =
    probeDir("user16")(_.withColumn("user_id", lit(null).cast("bigint")))
  private lazy val nullValueDir =
    probeDir("value16")(_.withColumn("value", lit(null).cast("double")))

  for (q <- Seq("q_agg_wilcoxon", "q_agg_rate_ratio",
      "q_agg_bayes_beta", "q_evt_decay", "q_pipe_abtest"))
    test(s"$q is invariant to NULL-user rows") {
      assert(rows(q, nullUserDir) == rows(q, sf0001),
        s"$q must drop NULL users on the Spark side")
    }

  for (q <- Seq("q_agg_quantile_ci", "q_agg_hoeffding",
      "q_agg_partial_corr", "q_evt_switchback", "q_agg_holm"))
    test(s"$q is invariant to NULL-value rows") {
      assert(rows(q, nullValueDir) == rows(q, sf0001),
        s"$q must drop NULL values on the Spark side")
    }
}
