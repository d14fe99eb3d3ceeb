package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.J array / map / JSON functions — the normalization core: the
  * reference's per-record Python loops over nested collections
  * (`database/parse_and_upload_to_db.py:102-171`) become set-oriented
  * explode/transform expressions that stay inside codegen. */
object CollectionQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Pinned integer language for data-derived string→BIGINT casts:
    * accept only `[+-]?digits`, NULL everything else. The engines'
    * bare TRY_CASTs disagree outside that language ('1.5' → NULL in
    * Spark but 2 in DuckDB; '1e3' → NULL vs 1000), so the regex — not
    * the engine — defines what parses; try_cast inside the guard
    * still absorbs >64-bit digit strings on both sides. The oracle
    * mirrors this with regexp_matches + TRY_CAST (OracleSql
    * q_json_get). Pinned by RelationalOpsSpec. */
  def guardedBigintCastSql(col: String): String =
    s"CASE WHEN $col RLIKE '^[+-]?[0-9]+$$' " +
      s"THEN try_cast($col AS BIGINT) END"

  private def words(df: DataFrame): DataFrame =
    df.withColumn("w", split(col("text"), " "))

  /** q_arr_explode — array→rows (ref per-business collection loops
    * `database/parse_and_upload_to_db.py:102-171`). */
  private val arrExplode: Q = (s, dir) =>
    words(Tables.load(s, dir, "documents"))
      .select(col("doc_id"), explode(col("w")).as("word"))
      .orderBy("doc_id", "word")

  /** q_arr_posexplode — explode with ordinal (ref `enumerate` loop
    * `database/parse_and_upload_to_db.py:89`; search ranking ordinals
    * `web_scraper/web_scraping.py:102-110`). */
  private val arrPosexplode: Q = (s, dir) =>
    words(Tables.load(s, dir, "documents"))
      .select(col("doc_id"), posexplode(col("w")))
      .withColumn("pos", col("pos").cast("long"))
      .select(col("doc_id"), col("pos"), col("col").as("word"))
      .orderBy("doc_id", "pos")

  /** q_arr_ops — contains / size / sort / distinct (ref membership +
    * cardinality on category arrays `README.md:95-96`). */
  private val arrOps: Q = (s, dir) =>
    words(Tables.load(s, dir, "documents"))
      .withColumn("has_spark", array_contains(col("w"), "spark"))
      .withColumn("n_words", size(col("w")).cast("long"))
      // serialized to a scalar in the final projection only — the driver's
      // comparator cannot hash array cells; the ops under test are
      // array_distinct/sort_array
      .withColumn("distinct_sorted",
        concat_ws("|", sort_array(array_distinct(col("w")))))
      .select("doc_id", "has_spark", "n_words", "distinct_sorted")
      .orderBy("doc_id")

  /** q_arr_transform — higher-order transform/filter/aggregate (ref tuple
    * list build `database/parse_and_upload_to_db.py:81`, comprehensions
    * `web_scraper/web_scraping.py:312-332`). */
  private val arrTransform: Q = (s, dir) =>
    words(Tables.load(s, dir, "documents"))
      .withColumn("long_words", concat_ws("|", filter(col("w"),
        x => length(x) > 4)))
      .withColumn("total_len", aggregate(col("w"), lit(0),
        (acc, x) => acc + length(x)).cast("long"))
      .select("doc_id", "long_words", "total_len")
      .orderBy("doc_id")

  /** q_arr_position — array_position as custom collation key (ref
    * `WEEKDAY_ORDER.index(x)` `database/app.py:22,157`). The lookup list
    * omits 'error' to exercise the not-found path: Spark returns 0, DuckDB
    * NULL — normalized to NULL via nullif. */
  private val arrPosition: Q = (s, dir) => {
    val order = typedLit(Seq("signup", "view", "click", "purchase"))
    Tables.load(s, dir, "events")
      .withColumn("pos", nullif(array_position(order, col("event_type")), lit(0L)))
      .select("event_id", "event_type", "pos")
      .orderBy("event_id")
  }

  /** q_json_get — JSONPath extraction from a JSON string column (ref
    * jsonpath_ng pulls `web_scraper/web_scraping.py:309-332`; target
    * `events.props`). */
  private val jsonGet: Q = (s, dir) =>
    Tables.load(s, dir, "events")
      .withColumn("k_str", get_json_object(col("props"), "$.k"))
      // guarded try_cast, not cast: a non-numeric k in real props
      // would ANSI-abort the scan, and the regex pins the integer
      // language the engines would otherwise disagree on — see
      // guardedBigintCastSql
      .withColumn("k_int", expr(guardedBigintCastSql("k_str")))
      .select("event_id", "k_str", "k_int")
      .orderBy("event_id")

  /** q_json_from — parse JSON → struct with explicit schema (ref
    * `json.loads` per line `database/parse_and_upload_to_db.py:28`). */
  private val jsonFrom: Q = (s, dir) =>
    Tables.load(s, dir, "events")
      .withColumn("j", from_json(col("props"),
        org.apache.spark.sql.types.StructType.fromDDL("k INT")))
      .withColumn("k_val", col("j.k").cast("long"))
      .select("event_id", "k_val")
      .orderBy("event_id")

  /** q_json_flatten — nested JSON → relational: parse an ARRAY<STRUCT>
    * payload with an explicit schema and `inline` it to one row per
    * element — the schema-on-read ingestion step for nested API
    * payloads (the reference's scraped records carry exactly such
    * lists-of-objects, `web_scraper/web_scraping.py:309-332`; q_json_from
    * covers the flat-struct case, this is the nested one). The payload
    * is synthesized deterministically per event so the oracle can
    * re-derive the flattened rows arithmetically, no JSON engine
    * needed. Per-row parse + generate, no shuffle before the
    * presentation sort. */
  private val jsonFlatten: Q = (s, dir) =>
    Tables.load(s, dir, "events")
      .withColumn("js", concat(
        lit("""[{"s":1,"v":"""), col("event_id") % 7,
        lit("""},{"s":2,"v":"""), col("event_id") % 5, lit("}]")))
      .select(col("event_id"),
        inline(from_json(col("js"), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StructType.fromDDL(
            "s INT, v BIGINT")))))
      .select(col("event_id"), col("s").cast("long").as("s"), col("v"))
      .orderBy("event_id", "s")

  /** q_json_to — struct → JSON string (ref `json.dump`
    * `web_scraper/web_scraping.py:223,412`). */
  private val jsonTo: Q = (s, dir) =>
    Tables.load(s, dir, "events")
      .withColumn("js", to_json(struct(col("event_id"), col("event_type"))))
      .select("event_id", "js")
      .orderBy("event_id")

  /** q_map_ops — map build / lookup / keys (ref `dict(records)` + `.get`
    * `database/app.py:150-153`). The oracle states expected values
    * directly: DuckDB MAP indexing semantics drifted across versions, and
    * the operator under test is Spark's map surface. */
  private val mapOps: Q = (s, dir) =>
    Tables.load(s, dir, "events")
      .withColumn("m", map(
        lit("type"), col("event_type"),
        lit("uid"), col("user_id").cast("string")))
      .withColumn("type_val", element_at(col("m"), "type"))
      .withColumn("uid_val", element_at(col("m"), "uid"))
      .withColumn("n_keys", size(map_keys(col("m"))).cast("long"))
      .withColumn("keys_sorted", concat_ws("|", sort_array(map_keys(col("m")))))
      .select("event_id", "type_val", "uid_val", "n_keys", "keys_sorted")
      .orderBy("event_id")

  val all: Map[String, Q] = Map(
    "q_arr_explode" -> arrExplode,
    "q_arr_posexplode" -> arrPosexplode,
    "q_arr_ops" -> arrOps,
    "q_arr_transform" -> arrTransform,
    "q_arr_position" -> arrPosition,
    "q_json_get" -> jsonGet,
    "q_json_from" -> jsonFrom,
    "q_json_flatten" -> jsonFlatten,
    "q_json_to" -> jsonTo,
    "q_map_ops" -> mapOps)
}
