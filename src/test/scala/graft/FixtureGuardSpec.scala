package graft

import org.apache.spark.sql.functions._

/** Canary for the driver-regenerated testdata fixtures.
  *
  * Round 9 post-mortem: the driver regenerated `events.parquet` with `ts`
  * as TIMESTAMP(MICROS) while the reader still applied the TIMESTAMP(NANOS)
  * div-1000 workaround — every timestamp silently shrank 1000× (Jan 2024 →
  * ~43 min of 1970-01-20) and 25 queries went red with no read error.
  * These asserts make any future unit/fixture change fail loudly here
  * instead of surfacing as downstream hash mismatches.
  */
class FixtureGuardSpec extends SparkSpecBase {

  test("events.ts spans calendar-2024 at native µs precision") {
    val ev = Tables.load(spark, sf0001, "events")
    val r = ev.agg(
      min(col("ts")).as("lo"),
      max(col("ts")).as("hi"),
      countDistinct(date_trunc("hour", col("ts"))).as("hours")).head()
    val lo = r.getTimestamp(0).toInstant
    val hi = r.getTimestamp(1).toInstant
    val y2024 = java.time.Instant.parse("2024-01-01T00:00:00Z")
    val y2025 = java.time.Instant.parse("2025-01-01T00:00:00Z")
    assert(!lo.isBefore(y2024) && lo.isBefore(y2025),
      s"min(ts)=$lo outside 2024 — fixture regenerated with a new unit? " +
        "Check events.parquet's footer timeUnit vs Schemas.events")
    assert(!hi.isBefore(y2024) && hi.isBefore(y2025),
      s"max(ts)=$hi outside 2024")
    // a unit collapse also crushes cardinality (r9: 2 distinct hours vs 720)
    assert(r.getLong(2) > 24,
      s"only ${r.getLong(2)} distinct event hours — timestamps collapsed?")
  }

  test("events parquet footer stores ts as INT64 TIMESTAMP(MICROS)") {
    // schema-on-read with the pinned schema must round-trip values exactly:
    // reading without a pinned schema (footer speaks for itself) must agree
    // with Tables.load on a checksum of epoch-µs values.
    val pinned = Tables.load(spark, sf0001, "events")
      .agg(sum(unix_micros(col("ts")))).head().getLong(0)
    val footer = spark.read.parquet(s"$sf0001/events.parquet")
      .agg(sum(unix_micros(col("ts").cast("timestamp")))).head().getLong(0)
    assert(pinned == footer,
      "pinned-schema read disagrees with footer-schema read on ts values")
  }
}
