package graft

/** DuckDB oracle SQL, one entry per O-tier query id (SURVEY.md §2).
  *
  * Dialect-parity rules (SURVEY.md §7.5): explicit ORDER BY on a
  * key-complete list with explicit NULLS FIRST where nullable; round(x,4)
  * on float aggregates; integer aggregates cast to BIGINT (DuckDB sums
  * integers into HUGEINT, Spark into long); `events.ts` is TIMESTAMP_NS in
  * DuckDB but microseconds in Spark, so any ts output goes through
  * CAST(ts AS TIMESTAMP).
  */
object OracleSql {

  val all: Map[String, String] = Map(

    // ───── §2.A sources ─────
    "q_src_parquet" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
         ORDER BY l_orderkey, l_linenumber""",

    // ───── §2.B projections / filters ─────
    "q_proj_select" ->
      """SELECT c_custkey AS cust_id, c_name AS cust_name,
                c_mktsegment AS segment
         FROM customer ORDER BY cust_id""",
    "q_proj_derived" ->
      """SELECT o_orderkey, o_totalprice,
                round(o_totalprice * 1.05, 4) AS gross
         FROM orders ORDER BY o_orderkey""",
    "q_filter_eq" ->
      """SELECT l_orderkey, l_linenumber, l_partkey FROM lineitem
         WHERE l_linenumber = 1 ORDER BY l_orderkey""",
    "q_filter_bool" ->
      """SELECT event_id, event_type, (event_type = 'error') AS is_error
         FROM events WHERE NOT (event_type = 'error') ORDER BY event_id""",
    "q_filter_ilike" ->
      """SELECT c_custkey, c_mktsegment FROM customer
         WHERE c_mktsegment ILIKE '%auto%' ORDER BY c_custkey""",
    "q_filter_rlike" ->
      """SELECT p_partkey, p_brand,
                regexp_matches(p_brand, 'Brand#1[0-9]') AS is_valid
         FROM part ORDER BY p_partkey""",
    "q_filter_range_disj" ->
      """SELECT event_id,
                CAST(date_part('hour', ts) * 3600 + date_part('minute', ts) * 60
                     + date_part('second', ts) AS BIGINT) AS sec_of_day
         FROM events
         WHERE (date_part('hour', ts) * 3600 + date_part('minute', ts) * 60
                + date_part('second', ts)) BETWEEN 0 AND 21599
            OR (date_part('hour', ts) * 3600 + date_part('minute', ts) * 60
                + date_part('second', ts)) BETWEEN 43200 AND 64799
            OR (date_part('hour', ts) * 3600 + date_part('minute', ts) * 60
                + date_part('second', ts)) >= 79200
         ORDER BY event_id""",
    "q_filter_null" ->
      """SELECT o_orderkey,
                nullif(o_orderstatus, 'P') AS status_raw,
                coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status_filled,
                (nullif(o_orderstatus, 'P') IS NULL) AS is_pending
         FROM orders ORDER BY o_orderkey""",

    // ───── §2.C joins ─────
    "q_join_inner" ->
      """SELECT o_orderkey, c_custkey, c_name
         FROM orders JOIN customer ON o_custkey = c_custkey
         ORDER BY o_orderkey""",
    "q_join_bridge3" ->
      """SELECT l_orderkey, l_linenumber, c_custkey, c_name
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         ORDER BY l_orderkey, l_linenumber""",
    "q_join_left" ->
      """SELECT c_custkey, o_orderkey, (o_orderkey IS NOT NULL) AS has_order
         FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         ORDER BY c_custkey, o_orderkey NULLS FIRST""",
    "q_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         ORDER BY c_custkey""",
    "q_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey
                             AND o_orderpriority = '1-URGENT')
         ORDER BY c_custkey""",
    "q_join_broadcast" ->
      """SELECT c_custkey, n_name
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         ORDER BY c_custkey""",
    "q_join_range" ->
      """SELECT e.event_id, t.tier
         FROM events e
         JOIN (VALUES (0.0, 50.0, 'low'), (50.0, 150.0, 'mid'),
                      (150.0, 1000000000.0, 'high')) AS t(lo, hi, tier)
           ON e.value >= t.lo AND e.value < t.hi
         ORDER BY e.event_id""",
    "q_join_asof" ->
      """SELECT p.event_id, c.event_id AS prior_click
         FROM (SELECT * FROM events WHERE event_type = 'purchase') p
         ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
           ON p.user_id = c.user_id AND p.ts >= c.ts
         ORDER BY p.event_id""",

    // ───── §2.D aggregations ─────
    "q_agg_count" ->
      """SELECT count(*) AS n
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey""",
    "q_agg_group" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n FROM lineitem
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q_agg_multi" ->
      """SELECT l_returnflag,
                round(sum(l_quantity), 4) AS sum_qty,
                round(avg(l_extendedprice), 4) AS avg_price,
                round(min(l_discount), 4) AS min_disc,
                round(max(l_tax), 4) AS max_tax,
                count(*) AS n
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_agg_distinct" ->
      """SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_cust
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "q_dedup_distinct" ->
      """SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment""",
    "q_agg_rollup" ->
      """SELECT r_name, n_name, count(*) AS n_cust,
                round(sum(c_acctbal), 4) AS sum_bal
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY ROLLUP (r_name, n_name)
         ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""",
    "q_agg_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
                round(sum(o_totalprice), 4) AS sum_price
         FROM orders
         GROUP BY CUBE (o_orderstatus, o_orderpriority)
         ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""",
    "q_agg_collect" ->
      """SELECT l_orderkey,
                list(l_linenumber ORDER BY l_linenumber) AS lines
         FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""",
    "q_agg_pivot" ->
      """SELECT user_id,
                count(*) FILTER (event_type = 'click') AS click,
                count(*) FILTER (event_type = 'error') AS error,
                count(*) FILTER (event_type = 'purchase') AS purchase,
                count(*) FILTER (event_type = 'signup') AS signup,
                count(*) FILTER (event_type = 'view') AS view
         FROM events GROUP BY user_id ORDER BY user_id""",

    // ───── §2.F sorts / limits ─────
    "q_sort_multi" ->
      """SELECT event_id, event_type,
                CAST(list_position(['signup', 'view', 'click', 'purchase',
                                    'error'], event_type) AS BIGINT) AS type_rank
         FROM events ORDER BY type_rank, event_id""",
    "q_limit" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_orderkey LIMIT 100""",
    "q_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",

    // ───── §2.G set ops ─────
    "q_set_union" ->
      """SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus = 'F'
         UNION ALL
         SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus = 'O'
         ORDER BY o_orderkey""",
    "q_set_except" ->
      """SELECT o_custkey AS cust_id FROM orders
         EXCEPT ALL
         SELECT o_custkey AS cust_id FROM orders WHERE o_orderstatus = 'F'
         ORDER BY cust_id""",
    "q_set_intersect" ->
      """SELECT c_custkey FROM customer
         INTERSECT
         SELECT o_custkey AS c_custkey FROM orders
         ORDER BY c_custkey""")
}
