package graft.queries

import graft.{Schemas, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.A scans / sources / sinks. The sink operators are registered as
  * write→read-back ROUND TRIPS: the property a sink must guarantee —
  * what was written is exactly what comes back (append accumulates,
  * overwrite converges) — is oracle-checkable by aggregating the
  * read-back against the original table. Unit-level sink semantics stay
  * in SinksAndApproxSpec. */
object SourceQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Scratch dir for sources that need a materialized intermediate file.
    * Must stay inside /root/repo (environment contract). */
  private[graft] val scratch = "/root/repo/target/tmp"

  /** Per-thread previous scratch output dir per sink query, deleted on
    * the thread's next invocation (same rationale as [[lastStreamSink]]:
    * bounded scratch growth without one run deleting a dir a concurrent
    * run still reads). */
  private val lastSinkDir =
    new ThreadLocal[scala.collection.mutable.Map[String, String]] {
      override def initialValue() = scala.collection.mutable.Map.empty
    }

  /** Age horizon for the global scratch sweep: far beyond any single
    * query's read window, so the sweep can never delete a dir a live
    * concurrent invocation still reads. Test-settable. */
  @volatile private[graft] var sinkDirMaxAgeMs: Long = 10 * 60 * 1000L

  /** ALL live scratch dirs (dir → creation millis), across threads —
    * the global complement to [[lastSinkDir]]: the thread-local delete
    * keeps steady-state scratch at one dir per kind for a serial
    * harness, but a thread that dies would otherwise pin its last dir
    * until JVM exit, so every allocation also sweeps dirs older than
    * [[sinkDirMaxAgeMs]] regardless of owning thread. */
  private val liveSinkDirs =
    scala.collection.mutable.LinkedHashMap.empty[String, Long]

  private def rmTree(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rmTree)
    f.delete(): Unit
  }

  /** Basename shape of every [[freshSinkDir]] allocation: kind + 32-hex
    * stripped UUID. Deliberately does NOT match the stamp-keyed
    * persistent fixtures (`ndjson_*`, `etl_wh_*` — their content-stamp
    * tails are ≤16 hex and their keys contain dots), so the cross-JVM
    * sweep can never reclaim a fixture that is MEANT to outlive the
    * process. */
  private val sinkDirNameRe = java.util.regex.Pattern
    .compile("[a-z_]+_[0-9a-f]{32}")

  private[graft] def freshSinkDir(kind: String): String = {
    val now = System.currentTimeMillis()
    val dirs = lastSinkDir.get()
    val mine = dirs.get(kind)
    val d = s"$scratch/${kind}_${java.util.UUID.randomUUID()
      .toString.replace("-", "")}"
    // sink dirs abandoned by DEAD JVMs are invisible to the in-memory
    // registry; reclaim them by name shape + mtime age (a crashed bench
    // or verify run would otherwise grow scratch forever)
    val onDisk = Option(new java.io.File(scratch).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(f => f.isDirectory && sinkDirNameRe.matcher(f.getName).matches()
        && now - f.lastModified > sinkDirMaxAgeMs)
      .map(_.getPath).toSeq
    val doomed = liveSinkDirs.synchronized {
      mine.foreach(liveSinkDirs.remove)
      val expired = liveSinkDirs.collect {
        case (dir, born) if now - born > sinkDirMaxAgeMs => dir
      }.toSeq
      expired.foreach(liveSinkDirs.remove)
      // never sweep a dir this JVM registered but whose age is still
      // inside the horizon — a live concurrent run may be reading it
      val stale = onDisk.filterNot(liveSinkDirs.contains)
      liveSinkDirs(d) = now
      (mine.toSeq ++ expired ++ stale).distinct
    }
    doomed.foreach(old => rmTree(new java.io.File(old)))
    dirs(kind) = d
    d
  }

  /** Reader-semantics version, folded into every fixture stamp. Bump
    * whenever [[Tables.load]]'s interpretation of a source column
    * changes: the r9→r10 TIMESTAMP(NANOS)→(MICROS) reader fix left
    * content-stamped fixtures on disk that were WRITTEN by the old
    * (collapsing) reader against the new data — stamp matched, values
    * wrong. v2 = native-µs events reader. */
  // v3: ndjson fixture layout changed to 16 files (see ndjsonFixture) —
  // the version bump invalidates any single-file fixture surviving in
  // target/tmp from an earlier JVM
  private val readerVersion = "v3"

  /** Fingerprint of the source file(s) backing a fixture: CRC32 over
    * (relative path, length, mtime) of every file, sorted, prefixed with
    * [[readerVersion]]. Folded into the fixture directory name so a
    * REGENERATED source (same path, new content) — or a reader-semantics
    * change — can never be read through a stale fixture that survived in
    * target/tmp from an earlier JVM — that failure mode would look like
    * an engine correctness bug (fixture rows vs fresh-parquet oracle). */
  private[graft] def sourceStamp(src: String): String = {
    val crc = new java.util.zip.CRC32
    def walk(f: java.io.File, rel: String): Seq[String] =
      if (f.isDirectory)
        f.listFiles().sortBy(_.getName).toSeq
          .flatMap(c => walk(c, s"$rel/${c.getName}"))
      else Seq(s"$rel:${f.length}:${f.lastModified}")
    walk(new java.io.File(src), "").foreach(l =>
      crc.update(l.getBytes("UTF-8")))
    s"${readerVersion}_${java.lang.Long.toHexString(crc.getValue)}"
  }

  /** Materialize a file-format fixture of the events table once and
    * reuse it: a fixture is a deterministic function of the (immutable)
    * source table, so re-writing it per query invocation would only
    * pollute the timing of the operator under test with sink throughput.
    * Keyed by SF dir AND a content stamp of the source parquet
    * ([[sourceStamp]]), so neither different scales nor regenerated data
    * ever share a fixture; one shared protocol so the stamp/caching/
    * sweeper-name contract (see [[sinkDirNameRe]]) lives in one place. */
  private def eventsFixture(s: SparkSession, dir: String, prefix: String,
                            cols: Seq[String])(
      write: (DataFrame, String) => Unit): String = {
    val key = dir.replaceAll("[^A-Za-z0-9.]", "_")
    val stamp = sourceStamp(s"$dir/events.parquet")
    val path = s"$scratch/${prefix}_${key}_$stamp"
    if (!new java.io.File(s"$path/_SUCCESS").exists())
      write(Tables.load(s, dir, "events").select(cols.map(col): _*), path)
    path
  }

  /** NDJSON fixture (scraper-log shape, nested props included).
    * Written as 16 files, not the events table's single split: a real
    * scraper feed is many rotated log files, and the FILE-streaming
    * scan under test parallelizes per file (unlike the batch reader,
    * it never byte-splits one file — one giant file serializes the
    * whole parse onto one core, guide §2.5 input skew; 1.4 s vs 0.4 s
    * per micro-batch at sf0.1). Row set, schema, and both read-back
    * aggregates are unchanged — only the file boundaries move. */
  private def ndjsonFixture(s: SparkSession, dir: String): String =
    eventsFixture(s, dir, "ndjson",
      Seq("event_id", "user_id", "event_type", "value", "props"))(
      _.repartition(16).write.mode("overwrite").json(_))

  /** CSV fixture: header on, no props column (its free-form JSON would
    * only exercise quoting, which stays a CSV-reader concern — the round
    * trip under test is typed columns). */
  private def csvFixture(s: SparkSession, dir: String): String =
    eventsFixture(s, dir, "csv",
      Seq("event_id", "user_id", "event_type", "value"))(
      _.write.mode("overwrite").option("header", "true").csv(_))

  /** ORC fixture: includes the µs timestamp — ORC round-trips
    * TimestampType exactly, which the read-back aggregate checks via
    * max(ts). */
  private def orcFixture(s: SparkSession, dir: String): String =
    eventsFixture(s, dir, "orc",
      Seq("event_id", "user_id", "event_type", "value", "ts"))(
      _.write.mode("overwrite").orc(_))

  /** XML fixture (Spark 4's NATIVE xml source — the spark-xml package
    * merged upstream): one `<event>` row element per record. Doubles
    * round-trip bit-exactly through the text form (shortest-repr
    * serialization, the same contract as NDJSON/CSV). */
  private def xmlFixture(s: SparkSession, dir: String): String =
    eventsFixture(s, dir, "xml",
      Seq("event_id", "user_id", "event_type", "value"))(
      _.write.mode("overwrite").option("rowTag", "event")
        .format("xml").save(_))

  /** Binary-file fixture: one `.bin` file per document (doc_id < 64),
    * content = the UTF-8 text bytes — the at-rest shape of a multimodal
    * ingest DROP ZONE (images/audio land as opaque files, not rows; here
    * the bytes are the doc text so the oracle can recompute every hash
    * from the documents table). Files are written driver-side with NIO
    * at fixture-creation time only (64 tiny files, content-stamped like
    * every other fixture); the OPERATOR under test is the distributed
    * `binaryFile` scan. */
  private def binFixture(s: SparkSession, dir: String): String = {
    val key = dir.replaceAll("[^A-Za-z0-9.]", "_")
    val stamp = sourceStamp(s"$dir/documents.parquet")
    val path = s"$scratch/bin_${key}_$stamp"
    val done = new java.io.File(s"$path/_SUCCESS")
    if (!done.exists()) {
      new java.io.File(path).mkdirs()
      Tables.load(s, dir, "documents").filter(col("doc_id") < 64)
        .select(col("doc_id").cast("long"), col("text")).collect()
        .foreach { r =>
          java.nio.file.Files.write(
            java.nio.file.Paths.get(path, f"doc_${r.getLong(0)}%05d.bin"),
            r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8))
          : Unit
        }
      done.createNewFile(): Unit
    }
    path
  }

  /** Pre-build fixtures outside any timed region (Bench calls this before
    * the timing loop). */
  def prepareFixtures(s: SparkSession, dir: String): Unit = {
    ndjsonFixture(s, dir)
    csvFixture(s, dir)
    orcFixture(s, dir)
    xmlFixture(s, dir)
    binFixture(s, dir): Unit
  }

  /** q_src_parquet — schema-pinned columnar scan with projection (ref
    * Postgres table read `database/app.py:76-82`; our at-rest format is
    * parquet, SURVEY.md §1.4). The 3-column select prunes the read schema
    * to 3 of 11 columns — check ReadSchema in `.explain`. */
  private val srcParquet: Q = (s, dir) =>
    Tables.load(s, dir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity")
      .orderBy("l_orderkey", "l_linenumber")

  /** q_src_ndjson — line-delimited JSON scan (ref `json.loads` per line
    * `database/parse_and_upload_to_db.py:26-28`): events dumped once as
    * NDJSON ([[ndjsonFixture]]), read back with the explicit schema,
    * aggregated. O-tier: the oracle aggregates the same logical rows
    * from the events parquet (doubles round-trip JSON bit-exactly). */
  /** q_src_corrupt — record-level corrupt-input quarantine: the NDJSON
    * ingest where ~1% of lines are malformed (every event_id % 97 == 0
    * line is written truncated mid-object), read back PERMISSIVE with
    * `columnNameOfCorruptRecord` — bad lines land whole in the corrupt
    * column instead of failing the job or silently vanishing
    * (FAILFAST/DROPMALFORMED's failure modes). The reference does this
    * record triage in pydantic per scraped row (`web_scraping.py:
    * 242-244` validation + quarantine); at 100 TB it must happen in the
    * reader itself — one pass, no pre-validation scan, and the good/bad
    * split is an aggregate over the same scan. q_filter_rlike covers
    * VALUE-level quarantine; this row covers RECORD-level. */
  private val srcCorrupt: Q = (s, dir) => {
    val out = freshSinkDir("corrupt_src")
    val ev = Tables.load(s, dir, "events")
      .select("event_id", "user_id", "event_type", "value")
    ev.select(
        when(col("event_id") % 97 === 0,
          concat(lit("{\"event_id\":"), col("event_id"), lit(",BROKEN")))
          .otherwise(to_json(struct(col("event_id"), col("user_id"),
            col("event_type"), col("value")))).as("value"))
      .write.mode("overwrite").text(out)
    val schema = new org.apache.spark.sql.types.StructType()
      .add("event_id", "long").add("user_id", "long")
      .add("event_type", "string").add("value", "double")
      .add("_corrupt_record", "string")
    s.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(out)
      .agg(
        count(when(col("_corrupt_record").isNull, 1)).as("n_good"),
        count(col("_corrupt_record")).as("n_corrupt"),
        count(lit(1)).as("n_total"),
        expr("CAST(round(sum(CASE WHEN _corrupt_record IS NULL THEN " +
          "CAST(value AS DECIMAL(18,2)) END), 4) AS DOUBLE)")
          .as("sum_value"))
  }

  /** q_src_file_meta — the hidden `_metadata` file-source column: the
    * events table is laid out as one file per event_date partition,
    * read back WITH `_metadata.file_path`, and audited file-by-file —
    * rows per file and the partition value parsed back out of the
    * physical path — the "which file does each row come from"
    * capability behind incremental-load bookkeeping, bad-file triage,
    * and per-file freshness (a lake without row→file provenance
    * cannot quarantine a bad producer). The layout is DETERMINISTIC
    * (repartition(1) per partition value → exactly one file per day),
    * so the per-file audit ≡ the per-day counts the oracle recomputes
    * from the source — the read-back must reproduce it through the
    * metadata column, not the data. */
  private val srcFileMeta: Q = (s, dir) => {
    val out = freshSinkDir("file_meta")
    // r19: the audit reads only (event_id, event_date, _metadata) back
    // — `value` was written and never consumed; projecting it away
    // halves the sink bytes without touching the per-file layout or
    // the read-back result (guide §2.3, project before the exchange)
    Tables.load(s, dir, "events")
      .select(col("event_id"), to_date(col("ts")).as("event_date"))
      .repartition(col("event_date"))
      .write.partitionBy("event_date").mode("overwrite").parquet(out)
    s.read.parquet(out)
      .select(col("event_id"), col("event_date"),
        col("_metadata.file_path").as("fp"))
      .withColumn("path_date",
        regexp_extract(col("fp"), "event_date=([0-9-]+)", 1))
      .groupBy("path_date")
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("fp")).as("n_files"),
        count(when(col("path_date") === col("event_date").cast("string"),
          1)).as("n_consistent"))
      .orderBy("path_date")
  }

  private val srcNdjson: Q = (s, dir) => {
    val path = ndjsonFixture(s, dir)
    s.read.schema("event_id LONG, user_id LONG, event_type STRING, " +
        "value DOUBLE, props STRING")
      .json(path)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        expr("CAST(round(sum(CAST(value AS DECIMAL(18,2))), 4) AS DOUBLE)")
          .as("sum_value"))
      .orderBy(col("event_type").asc_nulls_first)
  }

  /** q_src_stream_file — incremental file source (ref scraper resume
    * `web_scraper/web_scraping.py:191-229,513-521`): the same NDJSON dir
    * consumed through Structured Streaming with an AvailableNow trigger,
    * aggregated into a memory sink. O-tier: the oracle aggregates the
    * same logical rows from the events parquet; MemoryStream-driven
    * incremental coverage in StreamingSpec. The memory-sink name is
    * unique per invocation so concurrent runs in one session cannot
    * clobber each other's table. */
  /** THIS THREAD's previous memory-sink name, dropped on the thread's
    * next invocation so repeated runs don't accumulate unbounded
    * in-memory sink tables. Thread-local on purpose: a global register
    * would let invocation A drop the sink a concurrent invocation B is
    * still reading (the drop fires before B's DataFrame is consumed) —
    * the exact cross-run interference the unique names exist to prevent.
    * A thread only ever drops a sink whose result IT produced earlier. */
  private val lastStreamSink = new ThreadLocal[String]

  private val srcStreamFile: Q = (s, dir) => {
    val path = ndjsonFixture(s, dir)
    val sink = s"src_stream_file_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    Option(lastStreamSink.get()).foreach(old => s.catalog.dropTempView(old))
    lastStreamSink.set(sink)
    val stream = s.readStream
      .schema("event_id LONG, user_id LONG, event_type STRING, value DOUBLE")
      .json(path)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"))
    val q = stream.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(sink)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.table(sink).orderBy(col("event_type").asc_nulls_first)
  }

  /** Shared read-back aggregate: count + decimal-exact value sum per
    * event_type (same form as [[srcNdjson]] — doubles round-trip JSON
    * and parquet bit-exactly, and DECIMAL partial sums are
    * order-independent). */
  private def roundTripAgg(df: DataFrame): DataFrame =
    df.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        expr("CAST(round(sum(CAST(value AS DECIMAL(18,2))), 4) AS DOUBLE)")
          .as("sum_value"))
      .orderBy(col("event_type").asc_nulls_first)

  /** q_sink_append — append-only NDJSON sink (ref locked `outfile
    * .open("a")` one-JSON-per-line `web_scraper/web_scraping.py:221-224,
    * 410-413`), verified as a round trip that exercises ACCUMULATION:
    * two disjoint halves of events are appended in separate batches and
    * the read-back aggregate must equal the whole table — missed or
    * double-appended rows both break the oracle hash. */
  private val sinkAppend: Q = (s, dir) => {
    val out = freshSinkDir("sink_append")
    val ev = Tables.load(s, dir, "events")
      .select("event_id", "user_id", "event_type", "value")
    graft.etl.Sinks.appendNdjson(ev.filter(col("event_id") % 2 === 0), out)
    graft.etl.Sinks.appendNdjson(ev.filter(col("event_id") % 2 === 1), out)
    roundTripAgg(s.read.schema(
        "event_id LONG, user_id LONG, event_type STRING, value DOUBLE")
      .json(out))
  }

  /** q_sink_warehouse — idempotent partitioned warehouse sink (ref ORM
    * load `database/parse_and_upload_to_db.py:99-100,173-175`; JDBC is a
    * config swap, SURVEY §2.A), verified as a round trip that exercises
    * OVERWRITE-idempotency: the table is written twice (a rerun) and the
    * read-back must equal exactly ONE copy; the partition column
    * round-trips through the directory layout. */
  private val sinkWarehouse: Q = (s, dir) => {
    val out = freshSinkDir("sink_warehouse")
    val ev = Tables.load(s, dir, "events")
      .select("event_id", "user_id", "event_type", "value")
    graft.etl.Sinks.writeWarehouseTable(ev, out, Seq("event_type"))
    graft.etl.Sinks.writeWarehouseTable(ev, out, Seq("event_type"))
    roundTripAgg(s.read.parquet(out))
  }

  /** Per-thread previous Derby db url, shut down (unmounted from the
    * engine) on the next invocation BEFORE [[freshSinkDir]] reclaims its
    * directory — otherwise the engine would keep dead databases booted
    * for the JVM lifetime (same bounded-scratch rationale as
    * [[lastBucketedTable]]). */
  private val lastJdbcUrl = new ThreadLocal[String]

  /** q_sink_jdbc — REAL `format("jdbc")` serving-DB load (ref ORM load
    * into Postgres `database/parse_and_upload_to_db.py:99-100,173-175`,
    * engine `database/base/connect.py:8-10`), through embedded Derby —
    * the identical Spark code path as a Postgres target, url-only swap.
    * Verified as a round trip exercising the two properties a JDBC load
    * must keep: OVERWRITE-idempotency (written twice, read-back equals
    * one copy — the reference's all-or-nothing transaction analog) and
    * type round-trip through the dialect's DDL mapping (BIGINT/CLOB/
    * DOUBLE back to long/string/double). A serving DB ingests a curated
    * SLICE, not the fact firehose, so the load takes the deterministic
    * `event_id % 5` subset — row-based INSERT throughput is the target
    * DB's ceiling, not Spark's, at any scale. */
  private val sinkJdbc: Q = (s, dir) => {
    Option(lastJdbcUrl.get()).foreach(graft.etl.Sinks.shutdownDerby)
    val out = freshSinkDir("sink_jdbc")
    val url = s"jdbc:derby:$out/db;create=true"
    lastJdbcUrl.set(url)
    val ev = Tables.load(s, dir, "events")
      .select("event_id", "user_id", "event_type", "value")
      .filter(col("event_id") % 5 === 0)
      .repartition(4) // 4 writer connections — parallel-writer path, not a serial loop
    graft.etl.Sinks.writeJdbc(ev, url, "events_jdbc")
    graft.etl.Sinks.writeJdbc(ev, url, "events_jdbc")
    roundTripAgg(graft.etl.Sinks.readJdbc(s, url, "events_jdbc"))
  }

  /** q_src_jdbc — range-partitioned PARALLEL JDBC ingest (ref the
    * serving DB as a *source*: `database/app.py:76-82` reads Postgres
    * back out; the reverse-ETL direction of [[sinkJdbc]]). Spark's JDBC
    * source reads on a single cursor unless told how to split — the
    * difference between one connection dribbling 100 TB and N range
    * slices ingesting in parallel. The `event_id % 3` slice is loaded
    * into Derby once, then read back through 4 range predicates on
    * `event_id` (min/max bounds are a 2-long driver-side lookup — index
    * metadata, not data). Correctness of the SPLIT is the point of the
    * oracle check: the union of the 4 slices must reproduce exactly one
    * copy — a boundary off-by-one (row lost to `<` vs `<=` at a slice
    * edge, or counted by two slices) breaks the hash. */
  private val srcJdbc: Q = (s, dir) => {
    Option(lastJdbcUrl.get()).foreach(graft.etl.Sinks.shutdownDerby)
    val out = freshSinkDir("src_jdbc")
    val url = s"jdbc:derby:$out/db;create=true"
    lastJdbcUrl.set(url)
    val ev = Tables.load(s, dir, "events")
      .select("event_id", "user_id", "event_type", "value")
      .filter(col("event_id") % 3 === 0)
    graft.etl.Sinks.writeJdbc(ev.repartition(4), url, "events_src")
    val b = ev.agg(min("event_id"), max("event_id")).head()
    roundTripAgg(graft.etl.Sinks.readJdbcPartitioned(
      s, url, "events_src", "event_id", b.getLong(0), b.getLong(1), 4))
  }

  /** q_src_partition_prune — hive-layout partitioned write, then a
    * pruned read-back: the scan must touch ONLY the `event_type=purchase`
    * directory (ref the per-category output layout of the scraper's
    * outfile family, `web_scraper/web_scraping.py:221-224`, promoted to
    * the warehouse layout that makes 100 TB queryable — partition
    * elimination is THE first-order scan reducer, ahead of any row-group
    * statistics). PlanQualitySpec gates the plan: the read-back scan
    * reports the pushed partition filter and one matched partition. */
  private val srcPartitionPrune: Q = (s, dir) => {
    val out = freshSinkDir("part_prune")
    Tables.load(s, dir, "events")
      .select("event_id", "user_id", "event_type", "value")
      .write.partitionBy("event_type").mode("overwrite").parquet(out)
    s.read.parquet(out)
      .filter(col("event_type") === "purchase")
      .agg(count(lit(1)).as("n"),
        expr("CAST(round(sum(CAST(value AS DECIMAL(18,2))), 4) AS DOUBLE)")
          .as("sum_value"),
        min("event_id").as("min_id"), max("event_id").as("max_id"))
  }

  /** Per-thread previous bucketed catalog table, dropped on the next
    * invocation (same bounded-scratch rationale as [[freshSinkDir]];
    * the table is external so the data dir is reclaimed by
    * freshSinkDir's delete, the DROP reclaims the catalog entry). */
  private val lastBucketedTable = new ThreadLocal[String]

  /** q_sink_bucketed — bucketed warehouse table + shuffle-free
    * aggregation/join: events written `bucketBy(8, user_id)`, then two
    * per-user aggregates and their join all reuse the bucket layout —
    * ZERO hash exchanges in the whole dataflow (PlanQualitySpec gates
    * the plan). This is the co-located-join answer at 100 TB: pay the
    * shuffle once at write time, every downstream user_id-keyed
    * query — daily — reads pre-partitioned data. Ref: the load layout
    * choice `database/parse_and_upload_to_db.py:173-175`, re-expressed
    * as a Spark bucketed table. */
  private val sinkBucketed: Q = (s, dir) => {
    val out = freshSinkDir("sink_bucketed")
    val tbl = s"bucketed_events_${java.util.UUID.randomUUID()
      .toString.replace("-", "")}"
    Option(lastBucketedTable.get())
      .foreach(t => s.sql(s"DROP TABLE IF EXISTS $t"))
    lastBucketedTable.set(tbl)
    Tables.load(s, dir, "events")
      .select("event_id", "user_id", "event_type", "value")
      .write.bucketBy(8, "user_id").sortBy("user_id")
      .option("path", out).mode("overwrite").saveAsTable(tbl)
    val t = s.table(tbl)
    val clicks = t.filter(col("event_type") === "click")
      .groupBy("user_id").agg(count(lit(1)).as("n_clicks"))
    val spend = t.filter(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(expr("CAST(round(sum(CAST(value AS DECIMAL(18,2))), 4) AS DOUBLE)")
        .as("purchase_value"))
    clicks.join(spend, Seq("user_id"), "left")
      .orderBy("user_id")
  }

  /** q_src_csv — header'd CSV scan with an explicit schema (ref: the
    * scraper's tabular export surface; CSV is the interchange format a
    * warehouse still ingests daily). The fixture is written once
    * ([[csvFixture]]); doubles survive the text round trip bit-exactly
    * (shortest-repr serialization, same contract as NDJSON). The
    * read-back aggregate adds an exact distinct-user count so the check
    * is not satisfied by row counts alone. O-tier: the oracle aggregates
    * the same logical rows from the events parquet. */
  /** Gzipped CSV fixture: the same typed columns as [[csvFixture]],
    * written with the gzip codec — the wire shape of most exported
    * logs and third-party drops (a `.csv.gz` per part). */
  private def csvGzipFixture(s: SparkSession, dir: String): String =
    eventsFixture(s, dir, "csvgz",
      Seq("event_id", "user_id", "event_type", "value"))(
      _.write.mode("overwrite").option("header", "true")
        .option("compression", "gzip").csv(_))

  /** q_src_csv_gzip — gzip-compressed CSV ingestion: the q_src_csv
    * round trip through the codec path (`.csv.gz` parts — the
    * default shape of exported logs, vendor drops, and archive
    * buckets). Same schema-pinned read, same logical readout as the
    * plain-CSV twin plus a row-identity anchor (min/max event_id), so
    * the oracle checks the DECOMPRESSED rows, not just aggregates
    * that could survive truncation. The operational point at scale:
    * gzip parts are NOT SPLITTABLE — one part = one task regardless
    * of size, so a 10 GB .csv.gz serializes its whole scan on one
    * core (the q_udtf single-split lesson, baked into a format this
    * time). The fixture writes session-parallelism-many parts, which
    * is the mitigation the SCALE note prescribes: many medium gzip
    * parts, or zstd/bzip2 if re-compression is allowed. */
  private val srcCsvGzip: Q = (s, dir) => {
    val path = csvGzipFixture(s, dir)
    s.read.schema("event_id LONG, user_id LONG, event_type STRING, " +
        "value DOUBLE")
      .option("header", "true").csv(path)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"),
        min("event_id").as("min_id"), max("event_id").as("max_id"),
        expr("CAST(round(sum(CAST(value AS DECIMAL(18,2))), 4) AS DOUBLE)")
          .as("sum_value"))
      .orderBy(col("event_type").asc_nulls_first)
  }

  /** Multiline-CSV fixture: documents with a deterministic newline
    * injection (every " a " becomes "\na " — length-preserving), so
    * the written CSV contains QUOTED MULTILINE fields. Standard
    * doubled-quote escaping on write and read. */
  private def csvMultilineFixture(s: SparkSession, dir: String): String = {
    val key = dir.replaceAll("[^A-Za-z0-9.]", "_")
    val stamp = sourceStamp(s"$dir/documents.parquet")
    val path = s"$scratch/csvml_${key}_$stamp"
    if (!new java.io.File(s"$path/_SUCCESS").exists())
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          expr("replace(text, ' a ', chr(10) || 'a ')").as("text2"))
        .write.mode("overwrite").option("header", "true")
        .option("escape", "\"").csv(path)
    path
  }

  /** q_src_csv_multiline — CSV with embedded newlines in quoted
    * fields, read in multiLine mode ([[csvMultilineFixture]]): the
    * reader path every "export with free-text column" drop exercises
    * and the one the default line-splitting reader silently corrupts
    * (a naive reader splits a quoted field at its newline and shears
    * every following row). The readout anchors the DECOMPRESSED
    * text — per-source char sums and the multiline-doc census — so a
    * sheared parse cannot hash-match. The operational cost at scale:
    * multiLine CSV, like gzip, is NOT SPLITTABLE (a record boundary
    * can't be found mid-file), so one file = one task — the same
    * many-medium-parts mitigation as q_src_csv_gzip. */
  private val srcCsvMultiline: Q = (s, dir) => {
    val path = csvMultilineFixture(s, dir)
    s.read.schema("doc_id LONG, source STRING, text2 STRING")
      .option("header", "true").option("multiLine", "true")
      .option("escape", "\"").csv(path)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text2"))).as("n_chars"),
        count(when(col("text2").contains("\n"), 1)).as("n_multiline"))
      .select(col("source"),
        col("n_docs").cast("long").as("n_docs"),
        col("n_chars").cast("long").as("n_chars"),
        col("n_multiline").cast("long").as("n_multiline"))
      .orderBy(col("source").asc_nulls_first)
  }

  private val srcCsv: Q = (s, dir) => {
    val path = csvFixture(s, dir)
    s.read.schema("event_id LONG, user_id LONG, event_type STRING, " +
        "value DOUBLE")
      .option("header", "true").csv(path)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"),
        expr("CAST(round(sum(CAST(value AS DECIMAL(18,2))), 4) AS DOUBLE)")
          .as("sum_value"))
      .orderBy(col("event_type").asc_nulls_first)
  }

  /** q_src_xml — XML scan through Spark 4's native xml source
    * ([[xmlFixture]]): the enterprise-interchange format a warehouse
    * still ingests (feeds, sitemaps, legacy exports — the reference's
    * scraper world is full of it). Schema-pinned like every other
    * source (no rowTag inference pre-scan — at 100 TB an inference
    * pass is a full extra read); the aggregate is the same logical
    * readout as the CSV/NDJSON twins, so the oracle is shared. */
  private val srcXml: Q = (s, dir) => {
    val path = xmlFixture(s, dir)
    s.read.schema("event_id LONG, user_id LONG, event_type STRING, " +
        "value DOUBLE")
      .option("rowTag", "event").format("xml").load(path)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"),
        expr("CAST(round(sum(CAST(value AS DECIMAL(18,2))), 4) AS DOUBLE)")
          .as("sum_value"))
      .orderBy(col("event_type").asc_nulls_first)
  }

  /** q_src_orc — ORC columnar scan ([[orcFixture]]): the second
    * columnar at-rest format (striped, predicate-pushdown-capable — the
    * warehouse migration case). The aggregate includes max(ts): ORC
    * round-trips TimestampType at µs precision, and the truncation to µs
    * commutes with max, so the DuckDB oracle's CAST(ts AS TIMESTAMP)
    * agrees. */
  private val srcOrc: Q = (s, dir) => {
    val path = orcFixture(s, dir)
    s.read.orc(path)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"),
        expr("CAST(round(sum(CAST(value AS DECIMAL(18,2))), 4) AS DOUBLE)")
          .as("sum_value"),
        max("ts").as("max_ts"))
      .orderBy(col("event_type").asc_nulls_first)
  }

  /** q_src_binary — opaque-bytes file ingest ([[binFixture]]): Spark's
    * `binaryFile` source reads a directory of arbitrary files as
    * (path, modificationTime, length, content) rows — THE multimodal
    * ingest path (images/audio/video land as files in a drop zone, not
    * as rows in a table; §2.M treats media as binary columns + typed
    * metadata, and this is where those columns come from). Scale shape:
    * parallelism = files (packed into tasks by maxPartitionBytes, so a
    * million small images still batch into right-sized tasks), filter
    * pushdown works on the metadata columns (length/modificationTime),
    * and `pathGlobFilter` prunes non-matching names before any read.
    * The readout keys each file back to its doc_id from the path and
    * fingerprints the bytes — the oracle recomputes both from the
    * documents table (same UTF-8 bytes). */
  private val srcBinary: Q = (s, dir) => {
    val path = binFixture(s, dir)
    s.read.format("binaryFile")
      .option("pathGlobFilter", "*.bin").load(path)
      .select(
        regexp_extract(col("path"), "doc_(\\d+)\\.bin$", 1)
          .cast("long").as("doc_id"),
        col("length").as("n_bytes"),
        sha2(col("content"), 256).as("content_sha"))
      .orderBy("doc_id")
  }

  /** q_join_dpp — DYNAMIC partition pruning: the fact table is
    * partitioned by event_type; the dimension's filter is on a DERIVED
    * column (`kind`), so no static predicate on the partition column
    * exists at plan time — the optimizer must instead build a runtime
    * filter from the broadcast dim and prune fact DIRECTORIES with it
    * (`PartitionFilters: dynamicpruning#...`, gated in
    * PlanQualitySpec). This is the star-schema workhorse at 100 TB:
    * "join facts to the date dim WHERE fiscal_quarter = ..." scans only
    * the qualifying partitions even though the fact predicate is not
    * known until the dim side runs. Ref: the reference's per-category
    * endpoint filter (`database/app.py:66-82`) re-expressed against a
    * partitioned warehouse. */
  private val joinDpp: Q = (s, dir) => {
    val out = freshSinkDir("dpp_fact")
    Tables.load(s, dir, "events")
      .select("event_id", "user_id", "event_type", "value")
      .write.partitionBy("event_type").mode("overwrite").parquet(out)
    val dim = Tables.load(s, dir, "events")
      .select("event_type").distinct()
      .withColumn("kind",
        when(col("event_type").isin("purchase", "signup"), "conversion")
          .otherwise("other"))
      .filter(col("kind") === "conversion")
    s.read.parquet(out)
      .join(broadcast(dim), Seq("event_type"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        expr("CAST(round(sum(CAST(value AS DECIMAL(18,2))), 4) AS DOUBLE)")
          .as("sum_value"))
      .orderBy("event_type")
  }

  /** q_src_json_multiline — whole-file JSON-ARRAY ingestion
    * (`multiLine`): the nation dim is round-tripped through a single
    * pretty-JSON array file and read back with
    * `option("multiLine", true)` — the config/dim-file format REST
    * APIs and hand-edited fixtures arrive in. The scale contract is
    * the point: a multiLine JSON file is NOT SPLITTABLE (one file =
    * one task parsing the whole document, unlike NDJSON's
    * line-per-record splits), so the mode is for small dims and
    * configs only — the op doc is the guardrail a 100 TB pipeline
    * needs against "just read the 2 TB JSON dump with multiLine".
    * The array is assembled distributed (sort_array over collected
    * structs → array_join), not via a driver loop; the read-back
    * must reproduce the per-region rollup the oracle computes from
    * the parquet dim. */
  private val srcJsonMultiline: Q = (s, dir) => {
    val out = freshSinkDir("json_multiline")
    Tables.load(s, dir, "nation")
      .select(struct(col("n_nationkey"), col("n_name"),
        col("n_regionkey")).as("r"))
      .agg(expr("""concat('[',
        array_join(transform(array_sort(collect_list(r)),
          x -> to_json(x)), ','),
        ']')""").as("value"))
      .repartition(1)
      .write.mode("overwrite").text(out)
    s.read.option("multiLine", "true").json(out)
      .groupBy("n_regionkey")
      .agg(count(lit(1)).as("n_nations"),
        min("n_name").as("first_name"),
        max("n_nationkey").as("max_key"))
      .orderBy("n_regionkey")
  }

  /** q_src_csv_dialect — non-default CSV dialect round-trip:
    * semicolon delimiter, quoted fields, explicit header, and a
    * column that EMBEDS the delimiter (so unquoted parsing would
    * shear every row) — the "data arrived from a European export"
    * reader path (q_src_csv covers the default dialect; real lakes
    * ingest ;-separated, quoted, headered files daily). The embedded
    * delimiter is the test: the read-back must reconstruct the
    * composite column exactly, and the rollup must match the oracle
    * computed from the parquet dim — a dialect mistake cannot fail
    * silently. Scale note: CSV with quotes is splittable only
    * per-file (a quoted newline forbids mid-file splits in the
    * general case) — many medium files beat one giant one. */
  private val srcCsvDialect: Q = (s, dir) => {
    val out = freshSinkDir("csv_dialect")
    Tables.load(s, dir, "nation")
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"),
        concat(col("n_name"), lit(";"), col("n_regionkey"))
          .as("tricky"))
      .write.mode("overwrite")
      .option("header", "true").option("delimiter", ";")
      .option("quote", "\"")
      .csv(out)
    s.read
      .option("header", "true").option("delimiter", ";")
      .option("quote", "\"").option("inferSchema", "false")
      .csv(out)
      .withColumn("n_regionkey", col("n_regionkey").cast("long"))
      .groupBy("n_regionkey")
      .agg(count(lit(1)).as("n_nations"),
        min("tricky").as("first_tricky"),
        max(length(col("tricky"))).as("max_tricky_len"))
      .orderBy("n_regionkey")
  }

  /** q_src_fixed_width — fixed-width record ingestion: the nation dim
    * round-trips through column-padded text (6/20/4 byte fields, the
    * COBOL-copybook layout mainframe and bank exports still arrive
    * in) and is parsed back by POSITION (substring + trim + cast) —
    * the legacy-ingest path no schema-on-read format covers, and a
    * reader class Spark has no native source for (the text source +
    * positional projection IS the implementation — one narrow map,
    * fully splittable by line, no custom DataSource needed at any
    * scale). The rollup must match the parquet-dim oracle, so a
    * column-offset mistake cannot pass. */
  private val srcFixedWidth: Q = (s, dir) => {
    val out = freshSinkDir("fixed_width")
    Tables.load(s, dir, "nation")
      .select(concat(
        rpad(col("n_nationkey").cast("string"), 6, " "),
        rpad(col("n_name"), 20, " "),
        rpad(col("n_regionkey").cast("string"), 4, " ")).as("value"))
      .write.mode("overwrite").text(out)
    s.read.text(out)
      .select(
        trim(substring(col("value"), 1, 6)).cast("long")
          .as("n_nationkey"),
        trim(substring(col("value"), 7, 20)).as("n_name"),
        trim(substring(col("value"), 27, 4)).cast("long")
          .as("n_regionkey"))
      .groupBy("n_regionkey")
      .agg(count(lit(1)).as("n_nations"),
        min("n_name").as("first_name"),
        max("n_nationkey").as("max_key"))
      .orderBy("n_regionkey")
  }

  val all: Map[String, Q] = Map(
    "q_src_json_multiline" -> srcJsonMultiline,
    "q_src_csv_dialect" -> srcCsvDialect,
    "q_src_fixed_width" -> srcFixedWidth,
    "q_join_dpp" -> joinDpp,
    "q_src_csv" -> srcCsv,
    "q_src_csv_gzip" -> srcCsvGzip,
    "q_src_csv_multiline" -> srcCsvMultiline,
    "q_src_corrupt" -> srcCorrupt,
    "q_src_file_meta" -> srcFileMeta,
    "q_src_xml" -> srcXml,
    "q_src_orc" -> srcOrc,
    "q_src_binary" -> srcBinary,
    "q_src_parquet" -> srcParquet,
    "q_src_partition_prune" -> srcPartitionPrune,
    "q_sink_bucketed" -> sinkBucketed,
    "q_src_ndjson" -> srcNdjson,
    "q_src_stream_file" -> srcStreamFile,
    "q_sink_append" -> sinkAppend,
    "q_sink_warehouse" -> sinkWarehouse,
    "q_sink_jdbc" -> sinkJdbc,
    "q_src_jdbc" -> srcJdbc)
}
