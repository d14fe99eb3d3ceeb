package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** §2.R the `spark.sql` entry point as a first-class surface.
  *
  * Every other registered operator reaches Catalyst through the
  * DataFrame/Dataset API; this family proves the SQL string surface is
  * the SAME engine — reference users arrive from a Postgres/ORM world
  * (database/yelp_db/yelp_db/model.py builds its schema for SQL access,
  * and the FastAPI layer issues SQL through SQLAlchemy), so "switch to
  * this library" must include handing it a query STRING. `spark.sql`
  * parses into the identical logical plan the DataFrame API builds —
  * same optimizer rules, same physical strategies, same AQE — which is
  * why the oracle for this family is nearly the Spark text itself: the
  * parity argument is shared ANSI semantics, not a reimplementation.
  */
object SqlQueries {
  type Q = (SparkSession, String) => DataFrame

  /** q_sql_report — a full analyst-shaped report through `spark.sql`:
    * CTE + 3-table join + decimal-exact revenue + per-segment window
    * rank, the shape an ORM-emitted dashboard query takes (ref: the
    * FastAPI endpoints compose exactly such joins over customers and
    * orders). Revenue folds EXACTLY — scaled-long per lineitem, decimal
    * across orders — before the one cast to double (§7.5.2: a double
    * sum is partition-order-dependent; the exact fold means the
    * window's ORDER BY revenue is over exact values and rank ties are
    * engine-identical). Temp views are
    * session-scoped and re-registered per call — no global state.
    * Scale: lineitem is CONTRACTED to one decimal revenue row per
    * orderkey BEFORE any join — the widest table shrinks ~4× at the
    * scan, the orderkey join carries order-sized rows, and `n_orders`
    * is a plain count(*) (orderkey is unique after the contraction),
    * so no distinct-aggregate Expand ever doubles the join stream.
    * The earlier full-width-join + count(DISTINCT) formulation was
    * this suite's slowest plan for exactly that Expand; same answer,
    * ~4× less shuffled data. Remaining shape: two co-keyed shuffle
    * joins that AQE can re-plan, a two-phase aggregate on (segment,
    * yr, qtr), and a k-row window. */
  private val sqlReport: Q = (s, dir) => {
    Tables.load(s, dir, "lineitem").createOrReplaceTempView("sqlr_lineitem")
    Tables.load(s, dir, "orders").createOrReplaceTempView("sqlr_orders")
    Tables.load(s, dir, "customer").createOrReplaceTempView("sqlr_customer")
    // r20 exact-integer restatement of the per-lineitem revenue term
    // (§7.5.21, the q_math_arith device). Equivalence: price and
    // discount are exact 2-dp money values, so with p = price·100 and
    // d = disc·100 (both exact BIGINTs via the +0.5 cast on positive
    // values), price·(1−disc) ≡ p·(100−d)/10⁴ exactly; each term is
    // ≤ 1.1e9 and an order holds ≤ 7 lineitems, so the per-order sum
    // orev4 is a bounded BIGINT at ANY scale. The cross-order sum —
    // unbounded in the order count — stays a DECIMAL(38,0) fold, and
    // sum(orev4)/10000 lands in DECIMAL(38,6): the identical rational
    // as the old scale-4 decimal sum, so round(·,2) and the double
    // cast are bit-identical. What moved: 6×-the-order-count rows of
    // Decimal128 casts/multiplies in the widest scan became ~5 long
    // ops per row; the group-grain decimal work is untouched.
    s.sql(
      """WITH lrev AS (
           SELECT l_orderkey,
                  sum(CAST(l_extendedprice * 100 + 0.5 AS BIGINT)
                      * (100 - CAST(l_discount * 100 + 0.5 AS BIGINT)))
                    AS orev4
           FROM sqlr_lineitem
           GROUP BY l_orderkey),
         rev AS (
           SELECT c.c_mktsegment AS segment,
                  CAST(year(o.o_orderdate) AS BIGINT) AS yr,
                  CAST(quarter(o.o_orderdate) AS BIGINT) AS qtr,
                  CAST(round(sum(CAST(l.orev4 AS DECIMAL(38,0))) / 10000,
                             2) AS DOUBLE) AS revenue,
                  CAST(count(*) AS BIGINT) AS n_orders
           FROM lrev l
           JOIN sqlr_orders o ON l.l_orderkey = o.o_orderkey
           JOIN sqlr_customer c ON o.o_custkey = c.c_custkey
           GROUP BY 1, 2, 3)
         SELECT segment, yr, qtr, revenue, n_orders,
                CAST(rank() OVER (PARTITION BY segment
                                  ORDER BY revenue DESC) AS BIGINT) AS rnk
         FROM rev
         ORDER BY segment, yr, qtr""")
  }

  /** q_sql_recursive — `WITH RECURSIVE` (Spark 4's recursive CTE): the
    * iterate-to-fixpoint SQL surface that hierarchy walks, BOM
    * explosions, and graph reachability arrive as from the Postgres
    * world (the reference's warehouse IS Postgres — its users write
    * recursive CTEs; q_vec_dedup_groups' ORACLE is already one). Each
    * customer key walks its halving chain `k → k div 2 → … → 1` (a
    * synthetic binary-tree parent function — the recursion's work per
    * level is one co-keyed step over the frontier, the same execution
    * shape as a parts-hierarchy walk), and the readout is the chain-
    * length distribution. DuckDB evaluates the IDENTICAL recursion —
    * both engines iterate the same frontier to the same fixpoint; the
    * only dialect split is integer division spelling (Spark `DIV`,
    * DuckDB `//`). Scale: each recursion level is one join/filter over
    * the previous level's rows — depth is log₂(maxkey), frontier
    * shrinks as chains terminate, and the union of levels never
    * materializes on the driver. */
  private val sqlRecursive: Q = (s, dir) => {
    Tables.load(s, dir, "customer").createOrReplaceTempView("sqlrec_customer")
    s.sql(
      """WITH RECURSIVE chain (node, cur, depth) AS (
           SELECT c_custkey AS node, c_custkey AS cur, 0 AS depth
           FROM sqlrec_customer
           UNION ALL
           SELECT node, cur DIV 2, depth + 1 FROM chain WHERE cur > 1)
         SELECT CAST(depth AS BIGINT) AS chain_len,
                CAST(count(*) AS BIGINT) AS n_nodes,
                min(node) AS min_node, max(node) AS max_node
         FROM (SELECT node, max(depth) AS depth FROM chain GROUP BY node)
         GROUP BY depth
         ORDER BY chain_len""")
  }

  /** q_sql_lateral — correlated LATERAL derived table with ORDER BY +
    * LIMIT: "top-2 orders per customer", the per-row-subquery shape ORM
    * users reach for first (the reference's per-business N+1 lookup
    * loop `parse_and_upload_to_db.py:89-175` is exactly a client-side
    * lateral). The scale story is what Catalyst does with it: the
    * correlated LIMIT rewrites into `WindowGroupLimit` (partial top-k
    * per map task BEFORE the shuffle, final after) + one equi-join —
    * the N+1 loop becomes two scans and a bounded shuffle, no
    * per-customer subquery execution exists in the physical plan.
    * DuckDB evaluates the identical ANSI lateral; `o_orderkey` breaks
    * price ties deterministically (§7.5). */
  private val sqlLateral: Q = (s, dir) => {
    Tables.load(s, dir, "customer").createOrReplaceTempView("sqll_customer")
    Tables.load(s, dir, "orders").createOrReplaceTempView("sqll_orders")
    s.sql(
      """SELECT c.c_custkey AS cust_id, c.c_mktsegment AS segment,
                t.o_orderkey, t.o_totalprice
         FROM sqll_customer c, LATERAL (
           SELECT o_orderkey, o_totalprice FROM sqll_orders o
           WHERE o.o_custkey = c.c_custkey
           ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
         ORDER BY cust_id, t.o_orderkey""")
  }

  /** q_sql_exists — correlated EXISTS / NOT EXISTS: "customers with an
    * open order and no failed order", the set-membership predicate SQL
    * arrivals write where the DataFrame API says semi/anti join (the
    * q_join_semi / q_join_anti pair through the string surface).
    * Catalyst plans the pair as one hash semi-join plus one hash
    * anti-join on the same key — both co-partitioned on `o_custkey`,
    * so AQE can reuse the orders exchange; no correlated re-execution
    * survives optimization. */
  private val sqlExists: Q = (s, dir) => {
    Tables.load(s, dir, "customer").createOrReplaceTempView("sqle_customer")
    Tables.load(s, dir, "orders").createOrReplaceTempView("sqle_orders")
    s.sql(
      """SELECT c_custkey AS cust_id, c_mktsegment AS segment
         FROM sqle_customer c
         WHERE EXISTS (SELECT 1 FROM sqle_orders o
                       WHERE o.o_custkey = c.c_custkey
                       AND o.o_orderstatus = 'O')
           AND NOT EXISTS (SELECT 1 FROM sqle_orders o
                           WHERE o.o_custkey = c.c_custkey
                           AND o.o_orderstatus = 'F')
         ORDER BY cust_id""")
  }

  /** q_sql_unpivot — ANSI UNPIVOT (wide → long): the inverse of
    * q_agg_pivot, melting a per-nation metrics block into (nation,
    * metric, value) rows — the shape metric stores and plotting layers
    * ingest. The wide block is k×m cells (k nations × 3 metrics), so
    * UNPIVOT runs AFTER the aggregate contraction: the corpus-sized
    * work is the one two-phase group-by; the melt is a zero-shuffle
    * Expand over k rows. Values unify to DOUBLE (ANSI unpivot requires
    * one value type); the decimal-exact sum rounds before the cast
    * (§7.5.2). */
  private val sqlUnpivot: Q = (s, dir) => {
    Tables.load(s, dir, "customer").createOrReplaceTempView("sqlu_customer")
    Tables.load(s, dir, "nation").createOrReplaceTempView("sqlu_nation")
    s.sql(
      """WITH w AS (
           SELECT n_name,
                  CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,2))), 2)
                    AS DOUBLE) AS sum_bal,
                  CAST(count(*) AS DOUBLE) AS n_cust,
                  CAST(max(c_acctbal) AS DOUBLE) AS max_bal
           FROM sqlu_customer JOIN sqlu_nation ON c_nationkey = n_nationkey
           GROUP BY n_name)
         SELECT n_name, metric, val
         FROM w UNPIVOT (val FOR metric IN (sum_bal, n_cust, max_bal))
         ORDER BY n_name, metric""")
  }

  val all: Map[String, Q] = Map(
    "q_sql_report" -> sqlReport,
    "q_sql_recursive" -> sqlRecursive,
    "q_sql_lateral" -> sqlLateral,
    "q_sql_exists" -> sqlExists,
    "q_sql_unpivot" -> sqlUnpivot)
}
