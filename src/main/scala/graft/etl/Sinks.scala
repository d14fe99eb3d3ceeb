package graft.etl

import org.apache.spark.sql.DataFrame

/** §2.A sinks.
  *
  * The reference's two write paths: locked append of one JSON line per
  * record (`web_scraper/web_scraping.py:221-224,410-413`) and a
  * single-transaction ORM load into Postgres
  * (`database/parse_and_upload_to_db.py:99-175`). Our analogs are an
  * append-mode NDJSON sink and an idempotent overwrite parquet warehouse
  * sink — overwrite-per-table replaces the reference's all-or-nothing
  * rollback (`:178-180`): a failed job leaves the previous table intact,
  * a rerun converges (no partial-append dedup problem).
  *
  * JDBC is a config swap (`df.write.format("jdbc")`) but the offline build
  * has no driver jar (SURVEY.md §2.A), so the warehouse stays parquet.
  */
object Sinks {

  /** Append-only NDJSON sink (scraper-style event log). */
  def appendNdjson(df: DataFrame, path: String): Unit =
    df.write.mode("append").json(path)

  /** Bucketed warehouse table (catalog-managed): co-locates rows by join
    * key so repeated large⋈large joins on `bucketCols` skip the shuffle
    * entirely — both sides arrive pre-partitioned (verified plan-level in
    * BucketingSpec). This is the 100 TB answer to the reference's
    * repeated per-request joins (`database/app.py:66-82`): pay the
    * shuffle once at load, never per query. */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Small-files compaction: rewrite a directory of many small parquet
    * files into `targetFiles` right-sized ones (round-robin repartition —
    * content-neutral, no shuffle key to skew). THE recurring 100 TB
    * warehouse maintenance job: a streaming/append ingest leaves
    * file-per-micro-batch debris whose per-file open/footer cost comes
    * to dominate scans (and the driver's file index); nightly compaction
    * restores scan efficiency. At scale `targetFiles` derives from
    * `dir size / spark.sql.files.maxPartitionBytes`; correctness is a
    * pure round trip (verified by q_etl_compact's oracle + file-count
    * assertion in SinksAndApproxSpec). */
  def compact(spark: org.apache.spark.sql.SparkSession, inDir: String,
              outDir: String, targetFiles: Int): Unit =
    spark.read.parquet(inDir)
      .repartition(targetFiles)
      .write.mode("overwrite").parquet(outDir)

  /** Idempotent warehouse table write. `partitionByCols` for fact tables
    * whose downstream reads prune on the partition column; dims stay
    * unpartitioned (small files beat empty-partition sprawl). */
  def writeWarehouseTable(df: DataFrame, path: String,
                          partitionByCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionByCols.nonEmpty) w.partitionBy(partitionByCols: _*) else w)
      .parquet(path)
  }

  /** Write-audit-publish commit: audit the STAGED FILES (never the
    * in-memory plan that produced them — the point is to catch what the
    * write itself corrupted or dropped) and only then move the staging
    * directory to the published path. Audit = row-count conservation
    * against the producer's count, key non-null, key unique. A failed
    * audit throws and leaves the staging dir for forensics; readers
    * never see a partial or corrupt table because the publish is ONE
    * directory rename (the filesystem analog of an object-store/
    * catalog pointer swap — on S3-like stores this step is the catalog
    * commit). This is the reliability pattern behind every serious
    * warehouse load; the reference's load path writes straight into the
    * serving tables (`database/parse_and_upload_to_db.py:159-175`),
    * which is exactly the failure mode WAP exists to close.
    *
    * Caveat for external callers: the publish is `ATOMIC_MOVE`, which
    * requires `stagingDir` and `publishDir` to live on the SAME
    * filesystem — a cross-filesystem move throws
    * `AtomicMoveNotSupportedException` (by design: a non-atomic
    * fallback would reintroduce the partial-table window WAP closes).
    * On object stores the equivalent step is the catalog pointer swap,
    * not a rename. */
  def publishAudited(spark: org.apache.spark.sql.SparkSession,
                     stagingDir: String, publishDir: String,
                     keyCol: String, expectedRows: Long): String = {
    import org.apache.spark.sql.functions._
    // null-key count is coalesced explicitly: over an empty staging dir
    // sum(...) is NULL, and relying on getAs[Long]'s accidental 0L unbox
    // would make the empty-with-expectedRows=0 publish pass by accident
    // rather than by design
    val a = spark.read.parquet(stagingDir)
      .agg(count(lit(1)).as("n"),
        countDistinct(col(keyCol)).as("n_keys"),
        coalesce(sum(when(col(keyCol).isNull, 1L).otherwise(0L)), lit(0L))
          .as("null_keys"))
      .head()
    val (n, nKeys, nullKeys) =
      (a.getAs[Long]("n"), a.getAs[Long]("n_keys"), a.getAs[Long]("null_keys"))
    require(n == expectedRows,
      s"WAP audit: staged $n rows, expected $expectedRows — not publishing")
    require(nullKeys == 0L,
      s"WAP audit: $nullKeys null $keyCol keys — not publishing")
    require(nKeys == n,
      s"WAP audit: $nKeys distinct $keyCol for $n rows — not publishing")
    java.nio.file.Files.move(
      java.nio.file.Paths.get(stagingDir),
      java.nio.file.Paths.get(publishDir),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    publishDir
  }
}
