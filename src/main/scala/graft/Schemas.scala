package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Explicit `StructType` constants for every input the engine reads.
  *
  * The reference pins its schemas twice — pydantic models at scrape time
  * (`web_scraper/web_scraping.py:232-247`) and an alembic-migrated DDL at
  * load time (`database/yelp_db/yelp_db/alembic/versions/199c98997e89_create_tables.py:21-100`).
  * We mirror that schema-on-write discipline: no schema inference anywhere in
  * the verified path (SURVEY.md §1.4). At 100 TB, inference is also a
  * correctness *and* cost bug (a full pre-scan or a sampled guess).
  */
object Schemas {

  val region = StructType(Seq(
    StructField("r_regionkey", IntegerType),
    StructField("r_name", StringType)))

  val nation = StructType(Seq(
    StructField("n_nationkey", IntegerType),
    StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)))

  val customer = StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType),
    StructField("c_acctbal", DoubleType),
    StructField("c_mktsegment", StringType)))

  val supplier = StructType(Seq(
    StructField("s_suppkey", LongType),
    StructField("s_name", StringType),
    StructField("s_nationkey", IntegerType),
    StructField("s_acctbal", DoubleType)))

  val part = StructType(Seq(
    StructField("p_partkey", LongType),
    StructField("p_name", StringType),
    StructField("p_brand", StringType),
    StructField("p_type", StringType),
    StructField("p_size", IntegerType),
    StructField("p_retailprice", DoubleType)))

  val orders = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType),
    StructField("o_orderpriority", StringType)))

  val lineitem = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_partkey", LongType),
    StructField("l_suppkey", LongType),
    StructField("l_linenumber", IntegerType),
    StructField("l_quantity", DoubleType),
    StructField("l_extendedprice", DoubleType),
    StructField("l_discount", DoubleType),
    StructField("l_tax", DoubleType),
    StructField("l_returnflag", StringType),
    StructField("l_linestatus", StringType),
    StructField("l_shipdate", TimestampType)))

  /** `ts` is INT64 TIMESTAMP(MICROS, isAdjustedToUTC=false) in the parquet
    * footer — Spark's vectorized reader handles it natively; with the
    * session timezone pinned to UTC (every entry point does this) the
    * NTZ/LTZ distinction is value-neutral. [[Tables.load]] guards against
    * a silent fixture-unit change (an earlier generation of the testdata
    * was TIMESTAMP(NANOS) and needed a div-1000 workaround; a unit change
    * shifts every value 1000× without any read error). */
  val events = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  val documents = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  val embeddings = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  /** Nested scraped-record schema (reference `README.md:82-105`, producer
    * `web_scraper/web_scraping.py:232-247,407-408`): the ETL input shape. */
  val scrapedBusiness = StructType(Seq(
    StructField("bizId", StringType, nullable = false),
    StructField("ranking", LongType),
    StructField("name", StringType, nullable = false),
    StructField("website", StringType),
    StructField("phone_number", StringType),
    StructField("address", StringType),
    StructField("price", StringType),
    StructField("health_score", StringType),
    StructField("open_hours", ArrayType(StructType(Seq(
      StructField("weekday", StringType),
      StructField("open_hours", StringType))))),
    StructField("food_category", ArrayType(StringType)),
    StructField("highlights", ArrayType(StringType)),
    StructField("related_search_terms", ArrayType(StringType)),
    StructField("amenities", ArrayType(StructType(Seq(
      StructField("amenity", StringType),
      StructField("is_available", BooleanType)))))))

  val byName: Map[String, StructType] = Map(
    "region" -> region, "nation" -> nation, "customer" -> customer,
    "supplier" -> supplier, "part" -> part, "orders" -> orders,
    "lineitem" -> lineitem, "events" -> events,
    "documents" -> documents, "embeddings" -> embeddings)
}

/** Loader for the driver-provided warehouse tables (TESTDATA.md).
  * Always schema-pinned parquet scans — Catalyst pushes filters and prunes
  * columns into these scans for free (verify with `.explain`: PushedFilters /
  * ReadSchema). */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.schema(Schemas.byName(name)).parquet(s"$dir/$name.parquet")

  /** Lift a narrow plan to the session's parallelism before CPU-heavy
    * per-row work. Small-SF parquet arrives as ONE input split (a 2 MB
    * file is below any maxPartitionBytes), so a compute-bound stage
    * downstream of the scan — e.g. the interpreted higher-order-function
    * hours parse — runs on a single core no matter how wide the session
    * is; round 3's bench showed exactly that stage degrading 9× under
    * host contention. The round-robin exchange costs one shuffle of the
    * (tiny) scan output and unlocks every core. At scale the scan
    * already yields ≥ `defaultParallelism` splits and this is the
    * identity — the repartition only ever RAISES parallelism. */
  def parallelized(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
