package graft.queries

import graft.Tables
import graft.ops.Relational
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.B projections/filters and §2.C joins of the SURVEY.md contract.
  *
  * Each query is a deterministic, totally-ordered instantiation of one
  * operator over the driver's warehouse tables (determinism rules
  * SURVEY.md §7.5). Filters/projections sit directly on schema-pinned
  * parquet scans so Catalyst pushes them into the scan (PushedFilters /
  * ReadSchema in `.explain`).
  */
object RelationalQueries {
  type Q = (SparkSession, String) => DataFrame

  /** q_proj_select — projection + rename (ref `database/app.py:204-210`). */
  private val projSelect: Q = (s, dir) =>
    Tables.load(s, dir, "customer")
      .select(col("c_custkey").as("cust_id"), col("c_name").as("cust_name"),
        col("c_mktsegment").as("segment"))
      .orderBy("cust_id")

  /** q_proj_derived — computed column (ref URL normalization
    * `web_scraper/web_scraping.py:114`; `time_until_close`
    * `database/app.py:226`). */
  private val projDerived: Q = (s, dir) =>
    Tables.load(s, dir, "orders")
      // exact decimal product → round → double (oracle parity on half-cases)
      .withColumn("gross", expr(
        """CAST(round(CAST(o_totalprice AS DECIMAL(18,2))
                      * CAST(1.05 AS DECIMAL(3,2)), 4) AS DOUBLE)"""))
      .select("o_orderkey", "o_totalprice", "gross")
      .orderBy("o_orderkey")

  /** q_filter_eq — equality predicate (ref `database/app.py:79,118`). */
  private val filterEq: Q = (s, dir) =>
    Tables.load(s, dir, "lineitem")
      .filter(col("l_linenumber") === 1)
      .select("l_orderkey", "l_linenumber", "l_partkey")
      .orderBy("l_orderkey")

  /** q_filter_bool — boolean-flag filter (ref ad removal
    * `web_scraper/web_scraping.py:112`). */
  private val filterBool: Q = (s, dir) =>
    Tables.load(s, dir, "events")
      .withColumn("is_error", col("event_type") === "error")
      .filter(!col("is_error"))
      .select("event_id", "event_type", "is_error")
      .orderBy("event_id")

  /** q_filter_ilike — case-insensitive match (ref `database/app.py:60,107`). */
  private val filterIlike: Q = (s, dir) =>
    Tables.load(s, dir, "customer")
      .filter(col("c_mktsegment").ilike("%auto%"))
      .select("c_custkey", "c_mktsegment")
      .orderBy("c_custkey")

  /** q_filter_rlike — regex validation split (ref pydantic patterns
    * `web_scraper/web_scraping.py:242-244`): flag rows instead of dropping,
    * the quarantine pattern. */
  private val filterRlike: Q = (s, dir) =>
    Tables.load(s, dir, "part")
      .withColumn("is_valid", col("p_brand").rlike("Brand#1[0-9]"))
      .select("p_partkey", "p_brand", "is_valid")
      .orderBy("p_partkey")

  /** q_filter_range_disj — 3-disjunct time-of-day window filter (ref
    * "open now incl. overnight" `database/app.py:177-193`). Seconds since
    * midnight as long (SURVEY.md §7.4.1). */
  private val filterRangeDisj: Q = (s, dir) => {
    val sec = (hour(col("ts")) * 3600 + minute(col("ts")) * 60 +
      second(col("ts"))).cast("long")
    Tables.load(s, dir, "events")
      .withColumn("sec_of_day", sec)
      .filter((col("sec_of_day") >= 0 && col("sec_of_day") < 21600) ||
        (col("sec_of_day") >= 43200 && col("sec_of_day") < 64800) ||
        col("sec_of_day") >= 79200)
      .select("event_id", "sec_of_day")
      .orderBy("event_id")
  }

  /** q_filter_null — null semantics: nullif/coalesce/isNull (ref nullable
    * cols `database/yelp_db/yelp_db/model.py:13-17`, `.get()` defaults
    * `database/parse_and_upload_to_db.py:93-97`). */
  private val filterNull: Q = (s, dir) =>
    Tables.load(s, dir, "orders")
      .withColumn("status_raw", expr("nullif(o_orderstatus, 'P')"))
      .withColumn("status_filled", coalesce(col("status_raw"), lit("PENDING")))
      .withColumn("is_pending", col("status_raw").isNull)
      .select("o_orderkey", "status_raw", "status_filled", "is_pending")
      .orderBy("o_orderkey")

  /** q_join_inner — hub⋈detail equi-join (ref `database/app.py:66-82`).
    * AQE broadcasts the small side automatically. */
  private val joinInner: Q = (s, dir) =>
    Tables.load(s, dir, "orders")
      .join(Tables.load(s, dir, "customer"),
        col("o_custkey") === col("c_custkey"), "inner")
      .select("o_orderkey", "c_custkey", "c_name")
      .orderBy("o_orderkey")

  /** q_join_bridge3 — 3-way hub⋈bridge⋈detail chain (ref two-step
    * name→id→rows lookup `database/app.py:60-82`). */
  private val joinBridge3: Q = (s, dir) =>
    Tables.load(s, dir, "lineitem")
      .join(Tables.load(s, dir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.load(s, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .select("l_orderkey", "l_linenumber", "c_custkey", "c_name")
      .orderBy("l_orderkey", "l_linenumber")

  /** q_join_left — left outer + isNull branch (ref `get_or_create` get-path
    * `database/parse_and_upload_to_db.py:37-47`). */
  private val joinLeft: Q = (s, dir) =>
    Tables.load(s, dir, "customer")
      .join(Tables.load(s, dir, "orders"),
        col("c_custkey") === col("o_custkey"), "left")
      .withColumn("has_order", col("o_orderkey").isNotNull)
      .select("c_custkey", "o_orderkey", "has_order")
      .orderBy(col("c_custkey"), col("o_orderkey").asc_nulls_first)

  /** q_join_semi — set-semantics EXISTS (ref dup-free "businesses having
    * category" `database/app.py:76-82`). */
  private val joinSemi: Q = (s, dir) =>
    Tables.load(s, dir, "customer")
      .join(Tables.load(s, dir, "orders"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** q_join_anti — NOT EXISTS, the scraper's resume set
    * (`web_scraper/web_scraping.py:517-521`): customers with no URGENT
    * order left to "scrape". */
  private val joinAnti: Q = (s, dir) =>
    Tables.load(s, dir, "customer")
      .join(Tables.load(s, dir, "orders")
          .filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** q_join_full — full outer join with both-sided null branches: negative-
    * balance customers ⟗ urgent orders exercises left-only (customer with
    * no urgent order), right-only (urgent order of a non-negative
    * customer) and matched rows. Completes the outer-join family of §2.C
    * (declared in SURVEY §2.N). */
  private val joinFull: Q = (s, dir) =>
    Tables.load(s, dir, "customer")
      .filter(col("c_acctbal") < 0)
      .join(Tables.load(s, dir, "orders")
          .filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "full_outer")
      .withColumn("match_kind",
        when(col("c_custkey").isNotNull && col("o_orderkey").isNotNull, "both")
          .when(col("c_custkey").isNotNull, "left_only")
          .otherwise("right_only"))
      .select("c_custkey", "o_orderkey", "match_kind")
      .orderBy(col("c_custkey").asc_nulls_first,
        col("o_orderkey").asc_nulls_first)

  /** q_join_broadcast — explicit map-side join of a tiny dim (ref 7-row
    * weekday dim fetched whole `database/app.py:148-150`). */
  private val joinBroadcast: Q = (s, dir) =>
    Tables.load(s, dir, "customer")
      .join(broadcast(Tables.load(s, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey", "n_name")
      .orderBy("c_custkey")

  /** q_join_range — interval-containment join against a broadcast tier
    * table (ref time-containment predicate `database/app.py:179-186`). */
  private val joinRange: Q = (s, dir) => {
    import s.implicits._
    val tiers = Seq((0.0, 50.0, "low"), (50.0, 150.0, "mid"),
      (150.0, 1.0e9, "high")).toDF("lo", "hi", "tier")
    Relational.rangeJoin(Tables.load(s, dir, "events"), tiers,
        col("value"), col("lo"), col("hi"))
      .select("event_id", "tier")
      .orderBy("event_id")
  }

  /** q_join_interval — interval-OVERLAP join where NEITHER side fits a
    * broadcast (the bucketized scale path [[Relational.rangeJoin]]'s doc
    * points to; ref the time-window overlap predicate of
    * `database/app.py:179-193`, both operands now interval SETS).
    * Purchase activity windows [ts, ts+2h) × incident windows [ts, ts+1h)
    * from error events: which purchases happened while something was on
    * fire. 1-hour buckets ⇒ explode factor ≤3× left / ≤2× right; the
    * pair lands in a bucket equi-join with the exact overlap filter and
    * the greatest-start-bucket count-once guard (no distinct). Daily
    * rollup: pairs, distinct purchases, distinct incidents per incident
    * day. PlanQualitySpec gates the no-nested-loop claim. */
  private val joinInterval: Q = (s, dir) => {
    val ev = Tables.load(s, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("ts").as("p_start"),
        (col("ts") + expr("INTERVAL 2 HOURS")).as("p_end"))
    val incidents = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("i_id"), col("ts").as("i_start"),
        (col("ts") + expr("INTERVAL 1 HOURS")).as("i_end"))
    Relational.intervalOverlapJoin(purchases, "p_start", "p_end",
        incidents, "i_start", "i_end", 3600L)
      .groupBy(to_date(col("i_start")).as("day"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("p_id")).as("n_purchases"),
        countDistinct(col("i_id")).as("n_incidents"))
      .orderBy("day")
  }

  /** q_join_asof — latest click at-or-before each purchase per user (ref
    * "previous weekday" lookup `database/app.py:157-160` generalized).
    * Shuffle-once union+window emulation: [[Relational.asofJoin]]. */
  private val joinAsof: Q = (s, dir) => {
    val ev = Tables.load(s, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts"))
    Relational.asofJoin(purchases, clicks, "user_id", "ts", "ts",
        Map("click_id" -> "prior_click"))
      .select("event_id", "prior_click")
      .orderBy("event_id")
  }

  /** q_join_salted — the skew tool as a registered surface (ref: the
    * scraper's per-business fan-in loop `web_scraper/web_scraping.py:
    * 112-151`, where one dominant business owns most review rows): the
    * same inner join as a plain equi-join (salting is
    * semantics-preserving — the oracle IS the plain join), but the plan
    * scatters each key's rows across `factor` salt replicas so one hot
    * key cannot pin a single task at 100 TB ([[Relational.saltedJoin]];
    * scatter shape gated in PlanQualitySpec). events.user_id is the
    * natural hot-key column. */
  private val joinSalted: Q = (s, dir) => {
    val ev = Tables.load(s, dir, "events").select("event_id", "user_id")
    val dim = Tables.load(s, dir, "customer")
      .select(col("c_custkey").as("user_id"), col("c_name"))
    Relational.saltedJoin(ev, dim, "user_id", factor = 8)
      .select("event_id", "user_id", "c_name")
      .orderBy("event_id")
  }

  /** q_join_nullsafe — null-safe equality join (`<=>`): NULL keys match
    * NULL keys instead of silently dropping (the dim-lookup case where
    * "unknown" is itself a dimension member — ref the reference's
    * nullable dim columns, `database/model.py:35-38`). Still an
    * equi-join to the planner: `<=>` is a valid shuffle/broadcast hash
    * key, so the plan is identical in shape to q_join_inner — no
    * degradation to a nested loop for the null bucket. */
  private val joinNullsafe: Q = (s, dir) => {
    val l = Tables.load(s, dir, "orders")
      .select(col("o_orderkey"),
        nullif(col("o_orderstatus"), lit("P")).as("status_n"))
    val dim = l.select("status_n").distinct()
      .withColumn("label",
        concat(coalesce(col("status_n"), lit("NONE")), lit("_lbl")))
      .withColumnRenamed("status_n", "d_status")
    l.join(dim, col("status_n") <=> col("d_status"))
      .select("o_orderkey", "status_n", "label")
      .orderBy("o_orderkey")
  }

  /** q_join_spatial — grid-bucketed distance self-join: all point
    * pairs within Euclidean distance 15 on a synthetic integer plane
    * (customers placed at deterministic hash coordinates — the
    * operator prices the SHAPE; real deployments feed lat/lon),
    * reporting the 20 closest pairs. THE spatial-join pattern at
    * scale: a naive distance join is a cross product (impossible at
    * 100 TB); snapping points to a grid of cell size = the radius and
    * equi-joining each point's 3×3 neighbor cells against home cells
    * shuffles each side once with a bounded ×9 fan-out, and the exact
    * predicate then runs only on co-cell candidates. A pair is found
    * exactly once (the right side is keyed by its unique home cell;
    * the left emits each neighbor cell once), so no post-dedup.
    * Coordinates and squared distances stay INTEGER end to end — the
    * only float is the final sqrt readout. The oracle runs the naive
    * quadratic join with the same exact predicate: same answer via a
    * different plan = the strongest kind of check. */
  private val joinSpatial: Q = (s, dir) => {
    val pts = Tables.load(s, dir, "customer")
      .select(col("c_custkey").as("id"),
        (col("c_custkey") * 7919 % 1000).as("px"),
        (col("c_custkey") * 104729 % 1000).as("py"))
    val cell = 15
    val lhs = pts
      .withColumn("dx", explode(sequence(lit(-1), lit(1))))
      .withColumn("dy", explode(sequence(lit(-1), lit(1))))
      .select(col("id").as("id_a"), col("px").as("xa"), col("py").as("ya"),
        (floor(col("px") / cell) + col("dx")).as("cx"),
        (floor(col("py") / cell) + col("dy")).as("cy"))
    val rhs = pts.select(col("id").as("id_b"), col("px").as("xb"),
      col("py").as("yb"),
      floor(col("px") / cell).as("cx"), floor(col("py") / cell).as("cy"))
    lhs.join(rhs, Seq("cx", "cy"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("d2",
        (col("xa") - col("xb")) * (col("xa") - col("xb")) +
          (col("ya") - col("yb")) * (col("ya") - col("yb")))
      .filter(col("d2") <= cell * cell)
      .select(col("id_a"), col("id_b"), col("d2"),
        round(sqrt(col("d2").cast("double")), 4).as("dist"))
      .orderBy(col("d2"), col("id_a"), col("id_b"))
      .limit(20)
  }

  /** q_join_fuzzy — edit-distance self-join (entity resolution): all
    * customer-name pairs within Levenshtein distance ≤ 2 on the
    * custkey%20 slice, top-30 by (distance, pair) — the record-linkage
    * primitive behind dedupe-the-CRM, match-the-vendor-list, and
    * "same entity, two spellings". Scale: a naive fuzzy join is a
    * cross product with an O(len²) scorer per pair; PIGEONHOLE
    * BLOCKING makes it an equi-join — split each name into 3
    * fixed-position thirds; ≤2 edits can corrupt at most 2 of them,
    * so every qualifying pair agrees EXACTLY on at least one
    * (block_id, third) key. Three block passes ride one explode,
    * the candidate equi-join carries only same-third pairs, distinct
    * dedups multi-block survivors, and the exact scorer runs on
    * candidates only — substitution-edit recall is structural
    * (pigeonhole over aligned fixed-width thirds), and shift-edit
    * pairs on this fixture ride the shared low-key prefix block.
    * Honesty note: small keys in the 9-digit field make the leading
    * third constant, so its block spans the slice — the fixture
    * prices the PIPELINE shape (explode → equi-join → distinct →
    * scorer) while real mixed-prefix corpora get the full pruning;
    * variable-length corpora block on (length band, third). The
    * oracle is the quadratic join with the same scorer: same answer,
    * different algorithm. */
  private val joinFuzzy: Q = (s, dir) => {
    val names = Tables.load(s, dir, "customer")
      .filter(col("c_custkey") % 20 === 0)
      .select(col("c_custkey").as("id"), col("c_name").as("nm"))
    val blocked = names
      .withColumn("b", explode(sequence(lit(0), lit(2))))
      .withColumn("third", expr("substring(nm, 10 + b * 3, 3)"))
    // candidates dedup on the two ids ONLY — a distinct over rows
    // carrying both name strings shuffles ~3× wider rows for the same
    // set (measured 2.1 s vs 0.8 s at sf0.1); names re-attach from the
    // broadcast slice and the scorer runs once per surviving pair.
    val cand = blocked.as("x").join(blocked.as("y"),
        col("x.b") === col("y.b") && col("x.third") === col("y.third") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()
    cand
      .join(broadcast(names.select(col("id").as("id_a"),
        col("nm").as("nm_a"))), "id_a")
      .join(broadcast(names.select(col("id").as("id_b"),
        col("nm").as("nm_b"))), "id_b")
      .withColumn("dist", levenshtein(col("nm_a"), col("nm_b")))
      .filter(col("dist") <= 2)
      .select(col("id_a"), col("id_b"), col("nm_a"), col("nm_b"),
        col("dist"))
      .orderBy(col("dist"), col("id_a"), col("id_b"))
      .limit(30)
  }

  val all: Map[String, Q] = Map(
    "q_join_fuzzy" -> joinFuzzy,
    "q_join_spatial" -> joinSpatial,
    "q_join_nullsafe" -> joinNullsafe,
    "q_proj_select" -> projSelect,
    "q_proj_derived" -> projDerived,
    "q_filter_eq" -> filterEq,
    "q_filter_bool" -> filterBool,
    "q_filter_ilike" -> filterIlike,
    "q_filter_rlike" -> filterRlike,
    "q_filter_range_disj" -> filterRangeDisj,
    "q_filter_null" -> filterNull,
    "q_join_inner" -> joinInner,
    "q_join_bridge3" -> joinBridge3,
    "q_join_left" -> joinLeft,
    "q_join_semi" -> joinSemi,
    "q_join_anti" -> joinAnti,
    "q_join_full" -> joinFull,
    "q_join_broadcast" -> joinBroadcast,
    "q_join_range" -> joinRange,
    "q_join_interval" -> joinInterval,
    "q_join_asof" -> joinAsof,
    "q_join_salted" -> joinSalted)
}
