package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.H string and §2.I date/time/math scalar functions.
  *
  * All pure `org.apache.spark.sql.functions` column expressions — fully
  * codegen'd inside WholeStageCodegen, no UDFs (SURVEY.md §4.2). Computed
  * integers are cast to long on the Spark side and BIGINT in the oracle so
  * result schemas agree (DuckDB's date_part/len return BIGINT).
  */
object ScalarQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Seconds since midnight — the engine's TIME representation
    * (SURVEY.md §7.4.1: Spark has no TIME type). */
  private[graft] def secOfDay(ts: Column): Column =
    (hour(ts) * 3600 + minute(ts) * 60 + second(ts)).cast("long")

  // ───── §2.H strings ─────

  /** q_str_concat — concat / concat_ws (ref URL build
    * `web_scraper/web_scraping.py:114`). */
  private val strConcat: Q = (s, dir) =>
    Tables.load(s, dir, "customer")
      .withColumn("tag",
        concat_ws("-", col("c_mktsegment"), col("c_custkey").cast("string")))
      .withColumn("url", concat(lit("https://"), lower(col("c_name"))))
      .select("c_custkey", "tag", "url")
      .orderBy("c_custkey")

  /** q_str_split — query-string strip via substring_index (ref
    * `url.rsplit("?", 1)[0]` `web_scraper/web_scraping.py:114`). */
  private val strSplit: Q = (s, dir) =>
    Tables.load(s, dir, "part")
      .withColumn("url", concat(col("p_name"), lit("?ref=1")))
      .withColumn("clean_url", substring_index(col("url"), "?", 1))
      .withColumn("first_word", substring_index(col("p_name"), " ", 1))
      .select("p_partkey", "url", "clean_url", "first_word")
      .orderBy("p_partkey")

  /** q_str_trim_replace — suffix strip + trim (ref `"(Next day)"` removal
    * `database/parse_and_upload_to_db.py:70`). */
  private val strTrimReplace: Q = (s, dir) =>
    Tables.load(s, dir, "part")
      .withColumn("raw", concat(lit("  "), col("p_name"), lit(" (Next day)")))
      .withColumn("clean", trim(expr("replace(raw, ' (Next day)', '')")))
      .select("p_partkey", "raw", "clean")
      .orderBy("p_partkey")

  /** q_str_case — case folding (ref ilike impl `database/app.py:60,107`). */
  private val strCase: Q = (s, dir) =>
    Tables.load(s, dir, "region")
      .withColumn("lo", lower(col("r_name")))
      .withColumn("up", upper(col("r_name")))
      .withColumn("cap", initcap(lower(col("r_name"))))
      .select("r_regionkey", "lo", "up", "cap")
      .orderBy("r_regionkey")

  /** q_str_regex_extract — single group + all matches (ref hours-range
    * findall `database/parse_and_upload_to_db.py:76`; business-blob regex
    * `web_scraper/web_scraping.py:94-99`). */
  private val strRegexExtract: Q = (s, dir) =>
    Tables.load(s, dir, "documents")
      .withColumn("first_num_word", regexp_extract(col("text"), "\\b(\\w{6,})\\b", 1))
      .withColumn("five_letter_words",
        concat_ws("|",
          regexp_extract_all(col("text"), lit("\\b([a-z]{5})\\b"), lit(1))))
      .select("doc_id", "first_num_word", "five_letter_words")
      .orderBy("doc_id")

  /** q_str_like — LIKE / prefix / contains (ref `startswith`
    * `web_scraper/web_scraping.py:63,266`). */
  private val strLike: Q = (s, dir) =>
    Tables.load(s, dir, "part")
      .withColumn("is_eco", col("p_type").like("ECO%"))
      .withColumn("has_ro", col("p_type").contains("RO"))
      .withColumn("ends_my", col("p_type").endsWith("MY"))
      .select("p_partkey", "p_type", "is_eco", "has_ro", "ends_my")
      .orderBy("p_partkey")

  /** q_str_len — length + position (ref `n_chars` in documents; substring
    * probe `web_scraper/web_scraping.py:117,345`). */
  private val strLen: Q = (s, dir) =>
    Tables.load(s, dir, "documents")
      .withColumn("text_len", length(col("text")).cast("long"))
      .withColumn("spark_pos", instr(col("text"), "spark").cast("long"))
      .select("doc_id", "n_chars", "text_len", "spark_pos")
      .orderBy("doc_id")

  /** q_str_levenshtein — edit distance between neighbouring documents'
    * prefixes (the fuzzy-match primitive of entity resolution and
    * near-dup triage; adjacent-pair join form shared with
    * q_text_ngram_jaccard). O(len²) per row but embarrassingly
    * parallel; at corpus scale the quadratic pair space is cut by a
    * blocking key first (the LSH/SimHash candidate generators of §2.N),
    * and levenshtein rescoring runs only inside candidate pairs. */
  private val strLevenshtein: Q = (s, dir) => {
    val d = Tables.load(s, dir, "documents")
      .select(col("doc_id"), substring(col("text"), 1, 30).as("prefix"))
    val b = d.select(col("doc_id").as("doc_b"),
      col("prefix").as("prefix_b"))
    d.join(b, col("doc_b") === col("doc_id") + 1)
      .select(col("doc_id"),
        levenshtein(col("prefix"), col("prefix_b")).cast("long").as("dist"),
        (levenshtein(col("prefix"), col("prefix_b")) <= 10).as("near"))
      .orderBy("doc_id")
  }

  // ───── §2.I date / time / math ─────

  /** q_dt_parse — 12-hour time parsing with format fallback (ref
    * `strptime("%I:%M %p")` falling back to `"%I %p"`
    * `database/parse_and_upload_to_db.py:50-55`). Time strings are
    * synthesized from `events.ts`; every 3rd row's primary string is
    * corrupted so the fallback path actually executes. */
  private val dtParse: Q = (s, dir) => {
    val h24 = hour(col("ts"))
    val h12 = when(h24 % 12 === 0, 12).otherwise(h24 % 12)
    val ap = when(h24 < 12, "AM").otherwise("PM")
    Tables.load(s, dir, "events")
      .withColumn("s_full",
        when(col("event_id") % 3 === 0, lit("n/a"))
          .otherwise(format_string("%d:%02d %s", h12, minute(col("ts")), ap)))
      .withColumn("s_coarse", format_string("%d %s", h12, ap))
      .withColumn("parsed", coalesce(
        try_to_timestamp(col("s_full"), lit("h:mm a")),
        try_to_timestamp(col("s_coarse"), lit("h a"))))
      .withColumn("parsed_sec", secOfDay(col("parsed")))
      .select("event_id", "s_full", "s_coarse", "parsed_sec")
      .orderBy("event_id")
  }

  /** q_dt_format — weekday abbrev + month render (ref `strftime("%a")`
    * `database/app.py:151`). */
  private val dtFormat: Q = (s, dir) =>
    Tables.load(s, dir, "orders")
      .withColumn("dow", date_format(col("o_orderdate"), "EEE"))
      .withColumn("ym", date_format(col("o_orderdate"), "yyyy-MM"))
      .select("o_orderkey", "dow", "ym")
      .orderBy("o_orderkey")

  /** q_dt_arith — timestamp ± interval with conditional day rollover (ref
    * overnight close `datetime.combine(...) + timedelta(days=1)`
    * `database/app.py:219-224`). */
  private val dtArith: Q = (s, dir) =>
    Tables.load(s, dir, "events")
      .withColumn("close_ts",
        when(hour(col("ts")) < 6, col("ts") + expr("INTERVAL 1 DAY"))
          .otherwise(col("ts") + expr("INTERVAL 2 HOUR")))
      .withColumn("mins_ahead",
        ((unix_micros(col("close_ts")) - unix_micros(col("ts"))) / 60000000L)
          .cast("long"))
      .select("event_id", "ts", "close_ts", "mins_ahead")
      .orderBy("event_id")

  /** q_dt_extract — field extraction + seconds-since-midnight (ref
    * time-of-day compares `database/app.py:174,180-191`). dayofweek is
    * Sunday=1 in Spark; the oracle shifts DuckDB's Sunday=0. */
  private val dtExtract: Q = (s, dir) =>
    Tables.load(s, dir, "events")
      .withColumn("y", year(col("ts")).cast("long"))
      .withColumn("mo", month(col("ts")).cast("long"))
      .withColumn("d", dayofmonth(col("ts")).cast("long"))
      .withColumn("h", hour(col("ts")).cast("long"))
      .withColumn("dow", dayofweek(col("ts")).cast("long"))
      .withColumn("sec_of_day", secOfDay(col("ts")))
      .select("event_id", "y", "mo", "d", "h", "dow", "sec_of_day")
      .orderBy("event_id")

  /** q_dt_tz — UTC → America/Los_Angeles (ref hardcoded LA zone
    * `database/app.py:21,151,174,215`). The oracle uses a fixed -8 h
    * offset, valid because `events.ts` spans January 2024 only (PST, no
    * DST transition inside the data); the Spark side does the real
    * zone-rules conversion. */
  private val dtTz: Q = (s, dir) =>
    Tables.load(s, dir, "events")
      .withColumn("la_ts", from_utc_timestamp(col("ts"), "America/Los_Angeles"))
      .withColumn("la_hour", hour(col("la_ts")).cast("long"))
      .select("event_id", "la_ts", "la_hour")
      .orderBy("event_id")

  /** q_dt_trunc — temporal bucketing, the batch shadow of the streaming
    * tumbling window (§2.K). */
  private val dtTrunc: Q = (s, dir) =>
    Tables.load(s, dir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("hour_ts"))
      .agg(count(lit(1)).as("n"),
        expr("CAST(round(sum(CAST(value AS DECIMAL(18,2))), 4) AS DOUBLE)")
          .as("sum_value"))
      .orderBy("hour_ts")

  /** q_dt_series — generated date spine (calendar dim) with zero-filled
    * per-day order counts: `sequence` + `explode` builds the dim inside
    * the plan (no driver loop), the left join makes missing days explicit
    * rows — the warehouse calendar pattern behind "orders per day
    * including quiet days" (ref the weekday dim fully materialized
    * client-side, `database/app.py:148-150`). dow7 is modular day
    * arithmetic from a fixed epoch, not locale dayofweek — engine-neutral
    * and deterministic (§7.5). */
  private val dtSeries: Q = (s, dir) => {
    val epoch = lit(java.sql.Date.valueOf("1995-01-01"))
    val spine = s.range(1).select(explode(sequence(
        epoch, lit(java.sql.Date.valueOf("1995-12-31")))).as("day"))
    val perDay = Tables.load(s, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("c"))
    spine.join(perDay, Seq("day"), "left")
      .select(col("day"),
        coalesce(col("c"), lit(0L)).as("n_orders"),
        datediff(col("day"), epoch).cast("long").as("day_idx"),
        pmod(datediff(col("day"), epoch), lit(7)).cast("long").as("dow7"))
      .orderBy("day")
  }

  /** q_math_arith — arithmetic, casts, mod, floor/ceil (ref
    * `offset=(page-1)*page_size` `database/app.py:74`; price×(1−disc)
    * facts). */
  private val mathArith: Q = (s, dir) =>
    Tables.load(s, dir, "lineitem")
      // exact-integer restatement (§7.5.21) of the decimal product: the
      // money columns are exact 2-dp values, so price·(1−disc)·(1+tax)
      // scaled by 10⁶ is EXACT long arithmetic (≤ 1.05e7·100·108 ≈ 1.1e11)
      // and HALF_UP at 4 dp on that non-negative exact integer is
      // (x+50) div 100 — bit-identical to the former
      // round(DECIMAL product, 4) readout (same doubles: y/10000.0 is one
      // correctly-rounded division of exact operands, exactly what
      // BigDecimal(y,4).doubleValue() produces) at ~10 codegen'd long ops
      // per row instead of three Decimal128 casts, two decimal multiplies
      // and a BigDecimal round
      .withColumn("charge", expr(
        """CAST((CAST(l_extendedprice * 100 + 0.5 AS BIGINT)
                 * (100 - CAST(l_discount * 100 + 0.5 AS BIGINT))
                 * (100 + CAST(l_tax * 100 + 0.5 AS BIGINT))
                 + 50) DIV 100 AS DOUBLE) / 10000.0"""))
      .withColumn("qty_int", col("l_quantity").cast("long"))
      .withColumn("mod7", col("l_orderkey") % 7)
      .withColumn("disc_pct", floor(col("l_discount") * 100).cast("long"))
      .select("l_orderkey", "l_linenumber", "charge", "qty_int", "mod7",
        "disc_pct")
      .orderBy("l_orderkey", "l_linenumber")

  /** q_dt_busdays — business-day latency from order to ship, rolled up
    * per order priority: the SLA readout ops teams actually track
    * (calendar-day latency penalizes weekend spans; five business days
    * is a week, not a breach). The weekday count is CLOSED-FORM integer
    * arithmetic, not a calendar explode: with d = days since epoch and
    * the +3 offset anchoring day 0 on a Monday (1970-01-01 is a
    * Thursday), W(d) = 5·((d+3) div 7) + min((d+3) mod 7, 5) counts
    * weekdays in [epoch, d), and busdays(a, b) = W(b) − W(a). The metric
    * is SIGNED: a lineitem shipping before its order date yields a
    * negative latency rather than clamping at 0 — for an SLA readout the
    * sign distinguishes "pre-shipped" from "same-day", and the signed
    * form stays antisymmetric (busdays(a,b) = −busdays(b,a)) so
    * downstream means don't bias upward. (The synthetic testdata ships
    * ~49% of lineitems before their order date, so this convention is
    * exercised, not theoretical.) One
    * expression per row, codegen'd, no generate_series join (a spine
    * join would shuffle a 100 TB fact against a calendar for what a
    * subtraction answers). Both engines evaluate the identical formula
    * — Spark `floor(x/7)` ≡ DuckDB `//` (both floor semantics, exact in
    * a double far below 2^52) and `%` agrees on the non-negative ints
    * all 1992+ dates produce — so parity is exact: no timezone, no DOW
    * numbering convention (Spark 1=Sun vs DuckDB 0=Sun) in the path.
    * The orderkey join is the co-keyed shuffle pair AQE handles. */
  private val dtBusdays: Q = (s, dir) => {
    def w(d: Column): Column =
      lit(5L) * floor((d + lit(3)) / 7).cast("long") +
        least((d + lit(3)) % 7, lit(5)).cast("long")
    val ord = Tables.load(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"),
        datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
          .as("d_ord"))
    Tables.load(s, dir, "lineitem")
      .select(col("l_orderkey"),
        datediff(to_date(col("l_shipdate")), lit("1970-01-01"))
          .as("d_ship"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .withColumn("busdays", w(col("d_ship")) - w(col("d_ord")))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        round(avg("busdays"), 4).as("avg_busdays"),
        max("busdays").as("max_busdays"),
        count(when(col("busdays") > 20, lit(1))).as("n_late"))
      .orderBy("o_orderpriority")
  }

  val all: Map[String, Q] = Map(
    "q_dt_busdays" -> dtBusdays,
    "q_str_concat" -> strConcat,
    "q_str_split" -> strSplit,
    "q_str_trim_replace" -> strTrimReplace,
    "q_str_case" -> strCase,
    "q_str_regex_extract" -> strRegexExtract,
    "q_str_like" -> strLike,
    "q_str_len" -> strLen,
    "q_str_levenshtein" -> strLevenshtein,
    "q_dt_parse" -> dtParse,
    "q_dt_format" -> dtFormat,
    "q_dt_arith" -> dtArith,
    "q_dt_extract" -> dtExtract,
    "q_dt_tz" -> dtTz,
    "q_dt_trunc" -> dtTrunc,
    "q_dt_series" -> dtSeries,
    "q_math_arith" -> mathArith)
}
