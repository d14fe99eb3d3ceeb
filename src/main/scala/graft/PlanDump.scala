package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
import java.nio.file.{Files, Paths}

/** Dumps formatted physical plans for representative queries → PLANS.md.
  * Dev tool: the written file is committed so plan regressions are
  * reviewable in diffs (the machine-checked subset lives in
  * PlanQualitySpec). */
object PlanDump {
  val picks: Seq[(String, String)] = Seq(
    "q_src_parquet" -> "schema-pinned scan: pruned ReadSchema",
    "q_filter_eq" -> "predicate pushed into the parquet scan",
    "q_join_broadcast" -> "tiny dim broadcast, no dim-side shuffle",
    "q_join_asof" -> "as-of join = union + one partitioned window",
    "q_agg_group" -> "two-phase hash aggregate",
    "q_topk" -> "TakeOrderedAndProject (per-partition heaps)",
    "q_win_topk_group" -> "rank-filter window, single shuffle",
    "q_text_minhash" -> "one-pass signatures, bucket groupBy, pair explode",
    "q_vec_ann_lsh" -> "LSH bucket equi-join + exact rescore (seed-regenerated planes)",
    "q_vec_ann_ivf" -> "broadcast-centroid cells, (cell, shard) equi-join, exact rescore",
    "q_vec_cosine_dedup" -> "blocked-exact self-join: every pair exactly once, no BNL, no distinct",
    "q_join_salted" -> "hot-key scatter: dim explode x factor, join on (key, salt)",
    "q_win_rownum" -> "globalRowNumber: zipWithIndex over ONE materialized range shuffle",
    "q_stream_tumble" -> "tumbling window batch shadow",
    "q_src_partition_prune" -> "partition predicate in PartitionFilters (directory elimination)",
    "q_sink_bucketed" -> "bucketed table: per-key aggs + join with zero hash exchanges",
    "q_evt_funnel" -> "three stage-min aggregates co-partitioned on user_id",
    "q_etl_upsert" -> "latest-wins merge: union + one version window shuffle",
    "q_stream_join" -> "interval join: shuffled equi-join, range bounds as join filter",
    "q_etl_normalize" -> "warehouse join-back: broadcast weekday dim, co-keyed hub/bridge joins",
    "q_agg_quantile_approx" -> "approx_percentile: two-phase ObjectHashAggregate over mergeable sketches",
    "q_text_chunk" -> "chunking: scan -> generate -> project, no shuffle before the presentation sort",
    "q_vec_quantize" -> "int8 quantization: scale project below the code map (array_max once per row)",
    "q_text_tfidf" -> "tf-idf: (doc,term) + vocab aggregates, broadcast df join, WindowGroupLimit top-k",
    "q_vec_ann_pq" -> "PQ: TopCells encode per subspace, literal-LUT ADC, TakeOrdered shortlist, rescore join",
    "q_etl_scd2" -> "SCD-2: one key shuffle, lead window, O(1) state",
    "q_agg_mode" -> "mode: two-phase pair count + WindowGroupLimit top-1",
    "q_join_dpp" -> "dynamic partition pruning: dynamicpruningexpression in the fact scan's PartitionFilters",
    "q_text_cooccur" -> "bigram counts: two-phase aggregate, TakeOrderedAndProject top-100",
    "q_text_decontaminate" -> "decontamination: broadcast LEFT ANTI on content sha, zero corpus shuffle",
    "q_vec_centroid" -> "centroids: posexplode + two-phase (cluster,pos) aggregate, metadata-sized shuffle",
    "q_agg_maxby" -> "latest-per-key: single two-phase max_by aggregate, no window sort",
    "q_win_range_frame" -> "time-RANGE window: one key shuffle, epoch-second frame bounds",
    "q_win_sessionize" -> "gap sessionization: running windows + two-phase session aggregate",
    "q_text_feature_hash" -> "hashing trick: per-row bucket expression, two-phase (doc,bucket) count",
    "q_json_flatten" -> "nested JSON: from_json(ARRAY<STRUCT>) + inline generate, no shuffle",
    "q_win_streak" -> "gaps-and-islands: distinct-day grid, rank window, WindowGroupLimit top-1",
    "q_etl_snapshot_diff" -> "CDC diff: one full-outer key join, 4-class aggregate, direct column compare",
    "q_evt_paths" -> "path analysis: WindowGroupLimit 50-event pre-cap, bounded ordered collect, path-count two-phase, top-k heap",
    "q_agg_ttest" -> "A/B readout: both cohorts' moments in one conditional-aggregate pass",
    "q_etl_wap" -> "write-audit-publish: staged write, 3-check audit aggregate, atomic rename",
    "q_evt_retention" -> "cohort retention: one collect_set pass per user (cohort + grid from the same row, join-free), small matrix aggregate",
    "q_evt_attribution" -> "last-touch: ONE running window (O(1) state), no touches-x-purchases self-join",
    "q_sql_lateral" -> "correlated LATERAL LIMIT: WindowGroupLimit partial top-k + one equi-join (no per-row subquery)",
    "q_sql_exists" -> "EXISTS/NOT EXISTS: decorrelated hash semi- + anti-joins, co-keyed",
    "q_graph_triangles" -> "triangle census: degree-oriented wedge join, equi-joins only",
    "q_graph_components" -> "components: one groupByKey(brand) + MapGroups union-find, no iteration",
    "q_text_dedup_spans" -> "span dedup: codegen'd token_ngrams explode, two-phase distinct-count aggregate",
    "q_vec_mips" -> "MIPS: 3-probe broadcast, DotProduct pass, WindowGroupLimit per-query top-5",
    "q_agg_bitmap" -> "bitmap distinct: (group,chunk) bit_or partials, bit_count rollup",
    "q_text_dup_rate" -> "dup rate: one explode, (gram,doc) contraction, window doc-freq, per-doc rollup",
    "q_evt_anomaly" -> "z-score outliers: 5-row stats BROADCAST back onto the stream, corpus never shuffles",
    "q_etl_anonymize" -> "k-anonymity: one window count over the QI composite, per-row masking",
    "q_agg_corr" -> "co-moment profile: ONE two-phase aggregate pass for corr/covar/OLS",
    "q_evt_markov" -> "transition matrix: one lead window pass, two-phase pair count, k-by-k normalization",
    "q_etl_cdc_apply" -> "changelog fold: latest-wins row_number plans as WindowGroupLimit, per-key state = one row",
    "q_etl_resample" -> "calendar spine: sequence() explode generates the grid, co-keyed left join, one LOCF window",
    "q_etl_skew_profile" -> "skew audit: two-phase per-key count, single-row reduce over group sizes",
    "q_text_zipf" -> "zipf head: two-phase term count, TakeOrderedAndProject heap cut, windows over 50 rows",
    "q_agg_countmin" -> "count-min sketch: two-phase (row,bucket) grid build (shuffle ≤ tasks·4096 cells), broadcast sketch→probe join, min over hash rows",
    "q_graph_pagerank" -> "pagerank: k²-edge contraction checkpointed, 5 broadcast-join iterations, no corpus rescan",
    "q_evt_abandon" -> "conversion window: reversed running-min frame (O(1) state), no UnboundedFollowing",
    "q_etl_purge" -> "erasure cascade: request list broadcast-probes customer→orders→lineitem, no fact shuffle",
    "q_etl_purge_bloom" -> "bloom-prefiltered purge: fact scans filter map-side through the broadcast filter BEFORE any exchange; exact semi-join only on the candidate sliver",
    "q_agg_mad" -> "robust outliers: k-row median/MAD profiles broadcast back onto the stream",
    "q_text_ngram_lm" -> "unigram LM: two-phase vocab count, term-keyed frequency join, per-doc reduce",
    "q_join_interval" -> "interval overlap: both sides explode to time buckets, bucket EQUI-join + exact filter + count-once guard, no range BNL",
    "q_etl_stats_collect" -> "ANALYZE stats: Expand multi-distinct, ONE shuffle of partial states",
    "q_vec_pca" -> "PCA scoring: narrow DotProduct map below the scan, components as literals (fit is a separate moment-contraction job)",
    "q_evt_interarrival" -> "inter-arrival: one key-window lag pass, grouped exact percentile rollup",
    "q_sql_report" -> "SQL report: lineitem pre-contracted per orderkey BEFORE the joins, plain count(*) — no distinct-aggregate Expand",
    "q_etl_denormalize" -> "denormalize: broadcast dim joins + business-keyed collects, left-join fold, array-kernel readout")

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val sb = new StringBuilder
    sb.append("# PLANS — physical plans of representative operators\n\n")
    sb.append("Generated by `graft.PlanDump` at sf0.001 (plan shapes are\n")
    sb.append("scale-independent; AQE finalizes at runtime). The properties\n")
    sb.append("asserted in CI live in PlanQualitySpec.\n")
    picks.foreach { case (name, note) =>
      val df = SparkEntry.queries(name)(spark, dir)
      val plan = df.queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      sb.append(s"\n## $name — $note\n\n```\n$plan```\n")
    }
    Files.writeString(Paths.get("/root/repo/PLANS.md"), sb.toString)
    println("wrote PLANS.md")
    spark.stop()
  }
}
