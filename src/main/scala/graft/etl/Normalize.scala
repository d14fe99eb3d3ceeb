package graft.etl

import graft.Schemas
import graft.ops.{HoursParser, Relational}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** NDJSON → 11-table normalized warehouse: the set-oriented replacement of
  * the reference's sequential per-record loader
  * (`database/parse_and_upload_to_db.py:89-175`, traced in SURVEY.md §3.2).
  *
  * Where the reference pays one Postgres round-trip per record plus an
  * N+1 `get_or_create` per attribute value (`:31-47`), this pipeline is
  * five declarative stages — read → validate/quarantine → hub →
  * per-collection explode/distinct/join-back → write — whose only
  * synchronization points are the distinct/window shuffles. Every
  * `get_or_create` becomes one broadcast hash join against a distinct'd
  * dim; at 100 TB the dims stay broadcastable because they are bounded
  * vocabularies, and the fact-side work is embarrassingly parallel.
  *
  * Surrogate ids are global row numbers over the natural key
  * ([[Relational.globalRowNumber]]: range-partitioned local ranks +
  * per-partition offsets, no single-partition window) — deterministic
  * across runs and cluster layouts (SURVEY.md §7.5.4); the reference's
  * autoincrement ids are insertion-order-dependent and unreproducible.
  */
object Normalize {

  /** Reference weekday collation (`database/app.py:22` WEEKDAY_ORDER). */
  val weekdays: Seq[String] = Seq("Monday", "Tuesday", "Wednesday",
    "Thursday", "Friday", "Saturday", "Sunday")

  val priceRe = "^\\${1,4}$" // pydantic, web_scraping.py:242
  val healthRe = "^[A-Z]$" //        pydantic, web_scraping.py:243-244

  /** Read the scraper's NDJSON with the pinned nested schema
    * (schema-on-write mirror of pydantic, SURVEY.md §1.4). */
  def readScraped(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(Schemas.scrapedBusiness).json(path)

  /** Validation split (the pydantic regexes as a quarantine operator,
    * §2 q_filter_rlike pattern): `_1` = valid, `_2` = quarantined. */
  def validate(raw: DataFrame): (DataFrame, DataFrame) = {
    val ok = (col("price").isNull || col("price").rlike(priceRe)) &&
      (col("health_score").isNull || col("health_score").rlike(healthRe)) &&
      col("bizId").isNotNull && col("name").isNotNull
    (raw.filter(ok), raw.filter(!coalesce(ok, lit(false))))
  }

  /** Build a 1-column name dim with deterministic ids from exploded
    * values (the set form of `get_or_create`,
    * `parse_and_upload_to_db.py:31-47`). */
  private def dim(values: DataFrame, nameCol: String): DataFrame =
    Relational.globalRowNumber(
        values.select(col(nameCol).as("name")).filter(col("name").isNotNull)
          .distinct(),
        Seq(col("name")), rankCol = "id")
      .select("id", "name")

  /** Explode one string-array attribute into a (dim, bridge) pair. */
  private def bridgeFor(business: DataFrame, attr: String,
                        dimIdCol: String): (DataFrame, DataFrame) = {
    val exploded = business
      .select(col("id").as("business_id"), explode(col(attr)).as("name"))
    val d = dim(exploded, "name")
    val bridge = Relational.globalRowNumber(
        exploded.join(broadcast(d), "name")
          .select(col("business_id"), col("id").as(dimIdCol)),
        Seq(col("business_id"), col(dimIdCol)), rankCol = "id")
      .select("id", "business_id", dimIdCol)
    (d, bridge)
  }

  /** Full normalization: valid records → the 11 tables of SURVEY.md §1.3,
    * keyed by reference table name.
    *
    * @param stageDir when set, the deduped + id-assigned hub is written
    *   to this path and read back, so the 9 downstream table builds scan
    *   the staged parquet instead of each re-running the dedup window
    *   and id shuffles over the raw input (8 redundant passes at scale —
    *   the standard multi-output staging pattern). [[run]] always stages;
    *   `None` keeps the fully-lazy plan for in-memory/spec use. */
  def normalize(valid: DataFrame,
                stageDir: Option[String] = None): Map[String, DataFrame] = {
    val spark = valid.sparkSession

    // Resume-append inputs can repeat a bizId (the scraper's NDJSON is
    // append-only, web_scraping.py:221-224); keep one record per bizId
    // deterministically — get_or_create's keep-existing semantics — then
    // assign hub ids. `withId` keeps the nested collections for the
    // explode stages below, `business` is the scalar hub projection.
    val deduped = Relational.dedupKeepFirst(valid, Seq(col("bizId")),
      Seq(col("ranking").asc_nulls_first, col("name").asc_nulls_first))
    val withIdLazy = Relational.globalRowNumber(deduped, Seq(col("bizId")),
      rankCol = "id")
    val withId = stageDir match {
      case Some(dir) =>
        withIdLazy.write.mode("overwrite").parquet(dir)
        spark.read.parquet(dir)
      case None => withIdLazy
    }
    val business = withId
      .select("id", "bizId", "name", "website", "phone_number", "address",
        "price", "health_score")
      // bizId is carried for joins below; the reference hub table
      // (model.py:9-17) does not persist it — dropped at write time.

    val weekday = spark.createDataFrame(
      weekdays.zipWithIndex.map { case (w, i) => (i + 1L, w) })
      .toDF("id", "name")

    // open_hours: explode day rows, parse the hours grammar, explode
    // ranges (the §2.L generator) → one row per contiguous open interval
    // (parse_and_upload_to_db.py:111-118); unparseable strings are
    // dropped like the reference's raise-per-record, but set-wise.
    val dayRows = withId.select(col("id").as("business_id"),
        explode(col("open_hours")).as("oh"))
      .select(col("business_id"), col("oh.weekday").as("weekday_name"),
        col("oh.open_hours").as("hours_str"))
      .filter(HoursParser.isParseable(col("hours_str")))
    val openHours = dayRows
      .withColumn("opens", HoursParser.opens(col("hours_str")))
      .withColumn("closes", HoursParser.closes(col("hours_str")))
      .select(col("business_id"), col("weekday_name"), col("closes"),
        posexplode(col("opens")))
      .withColumn("open_time", col("col"))
      .withColumn("close_time", element_at(col("closes"), col("pos") + 1))
      .join(broadcast(weekday.select(col("id").as("weekday_id"),
        col("name").as("weekday_name"))), "weekday_name")
      .transform(df => Relational.globalRowNumber(df,
        Seq(col("business_id"), col("weekday_id"), col("open_time")),
        rankCol = "id"))
      .select("id", "business_id", "open_time", "close_time", "weekday_id")

    val (foodCategory, bizFood) =
      bridgeFor(withId, "food_category", "food_category_id")
    val (searchTerm, bizSearch) =
      bridgeFor(withId, "related_search_terms", "search_term_id")
    val (highlight, bizHighlight) =
      bridgeFor(withId, "highlights", "highlight_id")

    // amenities carry a payload on the bridge (model.py:80-85)
    val amenityRows = withId.select(col("id").as("business_id"),
        explode(col("amenities")).as("am"))
      .select(col("business_id"), col("am.amenity").as("name"),
        col("am.is_available").as("is_available"))
    val amenity = dim(amenityRows, "name")
    val bizAmenity = Relational.globalRowNumber(
        amenityRows.join(broadcast(amenity), "name")
          .select(col("business_id"), col("id").as("amenity_id"),
            col("is_available")),
        Seq(col("business_id"), col("amenity_id")), rankCol = "id")
      .select("id", "business_id", "amenity_id", "is_available")

    Map(
      "business" -> business.drop("bizId"),
      "weekday" -> weekday,
      "open_hours" -> openHours,
      "food_category" -> foodCategory,
      "search_term" -> searchTerm,
      "highlight" -> highlight,
      "amenity" -> amenity,
      "business_food_category" -> bizFood,
      "business_search_term" -> bizSearch,
      "business_highlight" -> bizHighlight,
      "business_amenity" -> bizAmenity)
  }

  /** End-to-end: NDJSON path → warehouse dir. Returns (row counts per
    * table, quarantined count).
    *
    * Side-channel dirs deliberately do NOT start with `_`: Hadoop's
    * hidden-file filter silently ignores underscore-prefixed paths at
    * listing time, so a `_stage_hub` staging dir reads back as ZERO rows
    * (with only a WARN) — an empty warehouse masquerading as a clean
    * run. None of the names collides with the 11 table names. */
  def run(spark: SparkSession, ndjsonPath: String,
          warehouseDir: String): (Map[String, Long], Long) = {
    val (valid, quarantined) = validate(readScraped(spark, ndjsonPath))
    val tables = normalize(valid, Some(s"$warehouseDir/stage.hub"))
    val counts = tables.map { case (name, df) =>
      Sinks.writeWarehouseTable(df, s"$warehouseDir/$name")
      name -> spark.read.parquet(s"$warehouseDir/$name").count()
    }
    // overwrite, not append: the quarantine report belongs to THIS run —
    // appending would break the pipeline's rerun-converges idempotence
    quarantined.write.mode("overwrite").json(s"$warehouseDir/quarantine")
    (counts,
      spark.read.schema(Schemas.scrapedBusiness)
        .json(s"$warehouseDir/quarantine").count())
  }
}
