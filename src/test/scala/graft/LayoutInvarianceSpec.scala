package graft

import graft.ops.{Curation, Relational}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Executes the partition-layout-independence claims the ops docs make:
  * a distributed operator whose result depends on partition count or
  * row order inside partitions is broken at exactly the moment the
  * cluster re-splits its input (AQE coalescing, file growth, executor
  * loss). Each op here is run over pathological layouts — 1 partition,
  * 7, 64 (≫ rows/partition for small keys) — and must produce the
  * IDENTICAL result set every time:
  *
  *  - clusterCentroids: float summation order is the classic
  *    distributed-mean divergence; the decimal accumulator is the fix,
  *    and this spec is where that claim is executed, not asserted.
  *  - sessionize: windows sort within partitions, so the assignment
  *    must be a pure function of the (key, ts, id) order, never the
  *    arrival layout.
  *  - featureHash / decontaminate: pure per-row hash arithmetic +
  *    aggregation; invariance should be trivial — gating it keeps a
  *    future "optimization" from accidentally introducing layout
  *    dependence (e.g. a first()/limit-based keeper).
  */
class LayoutInvarianceSpec extends SparkSpecBase {

  private val layouts = Seq(1, 7, 64)

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("clusterCentroids is identical across partition layouts") {
    val emb = Tables.load(spark, sf0001, "embeddings")
    val results = layouts.map { p =>
      canon(Curation.clusterCentroids(emb.repartition(p),
        col("vec_id") % 8, "embedding"))
    }
    assert(results.head.nonEmpty)
    assert(results.distinct.size == 1,
      "centroid means depend on partition layout — decimal sum regressed")
  }

  test("sessionize is identical across partition layouts") {
    val ev = Tables.load(spark, sf0001, "events")
      .select("event_id", "user_id", "ts")
    val results = layouts.map { p =>
      canon(Relational.sessionize(ev.repartition(p),
        "user_id", "ts", "event_id", gapUs = 30L * 60 * 1000000L))
    }
    assert(results.head.nonEmpty)
    assert(results.distinct.size == 1,
      "session assignment depends on partition layout")
  }

  test("featureHash and decontaminate are identical across layouts") {
    val docs = Tables.load(spark, sf0001, "documents")
    val fh = layouts.map(p => canon(
      Curation.featureHash(docs.repartition(p), "doc_id", "text", 64)))
    assert(fh.head.nonEmpty && fh.distinct.size == 1,
      "feature buckets depend on partition layout")
    val dc = layouts.map { p =>
      val d = docs.repartition(p)
      canon(Curation.decontaminate(d, "text",
          d.filter(col("doc_id") % 97 === 0), "text")
        .select("doc_id"))
    }
    assert(dc.head.nonEmpty && dc.distinct.size == 1,
      "decontamination keep-set depends on partition layout")
  }

  test("q_graph_hits is identical across partition layouts") {
    // the driver-local power iteration folds the collected k²-grid in
    // floating point — the r18 verdict flagged that an UNSORTED
    // collect makes those folds layout-dependent (a latent 4-dp
    // rounding flip); the .sortBy on the grid is the fix, and this is
    // where the claim is executed
    val ev = Tables.load(spark, sf0001, "events")
    val results = layouts.map { p =>
      canon(graft.queries.GraphQueries
        .hitsFromEvents(spark, ev.repartition(p)))
    }
    assert(results.head.nonEmpty)
    assert(results.distinct.size == 1,
      "HITS scores depend on partition layout — grid sort regressed")
  }

  test("q_graph_pagerank is identical across partition layouts") {
    // r19 moved pagerank's power iteration to the driver (the HITS
    // device); same latent hazard, same fix — the collected k²-grid is
    // sorted before any float fold, so the ranks must not move when
    // the corpus arrives in a different partition layout
    val ev = Tables.load(spark, sf0001, "events")
    val results = layouts.map { p =>
      canon(graft.queries.GraphQueries
        .pagerankFromEvents(spark, ev.repartition(p)))
    }
    assert(results.head.nonEmpty)
    assert(results.distinct.size == 1,
      "PageRank scores depend on partition layout — grid sort regressed")
  }

  test("z-ordered write produces disjoint per-file z-ranges (rectangles)") {
    // the data-skipping claim of q_etl_zorder: repartitionByRange on the
    // Morton key hands each output file a CONTIGUOUS, NON-OVERLAPPING
    // z-interval, so footer min/max stats bound a small (user, day)
    // rectangle per file — overlap would mean a point predicate reads
    // more than its own stripe and the layout bought nothing
    val out = java.nio.file.Files
      .createTempDirectory("graft_zorder_spec").toString
    Tables.load(spark, sf0001, "events")
      .select(col("event_id"), col("user_id"),
        dayofyear(col("ts")).cast("long").as("doy"))
      .withColumn("zv", Relational.zOrder2(col("user_id"), col("doy")))
      .repartitionByRange(8, col("zv"))
      .sortWithinPartitions("zv")
      .write.mode("overwrite").parquet(out)
    val spans = spark.read.parquet(out)
      .groupBy(input_file_name().as("f"))
      .agg(min("zv").as("lo"), max("zv").as("hi"),
        count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(spans.length >= 4, s"want several files, got ${spans.length}")
    spans.sliding(2).foreach {
      case Array((_, hi1, _), (lo2, _, _)) =>
        assert(hi1 <= lo2,
          s"overlapping file z-ranges: ..$hi1 vs $lo2.. — range " +
            "partitioning lost, footer stats no longer prune")
      case _ =>
    }
    // and the z-interleave is the real thing: a Morton key must change
    // BOTH coordinates' locality, i.e. no file spans the full user range
    val users = spark.read.parquet(out)
      .groupBy(input_file_name())
      .agg((max("user_id") - min("user_id")).as("span"))
      .collect().map(_.getLong(1))
    val fullSpan = 14L // sf0.001 users are 0..14
    assert(users.exists(_ < fullSpan),
      s"every file spans all users — interleave not clustering: " +
        users.mkString(", "))
  }

  test("versioned-table downgrade rolls back to V1 and is reversible") {
    // the columnar twin of the reference's reversible migration
    // (alembic downgrade, 199c98997e89_create_tables.py:104-117):
    // V1 files land, the table evolves to V2 (new column), then the
    // migration is rolled back — V1 readers must be whole before,
    // during, and after, and the downgrade must be re-upgradeable.
    import graft.etl.Migrate
    val dir = java.nio.file.Files
      .createTempDirectory("graft_downgrade").toString + "/t"
    val ev = Tables.load(spark, sf0001, "events")
    ev.filter(col("event_id") % 2 === 0)
      .select("event_id", "user_id", "value")
      .coalesce(2).write.mode("overwrite").parquet(dir)
    ev.filter(col("event_id") % 2 === 1)
      .select("event_id", "user_id", "value", "event_type")
      .coalesce(2).write.mode("append").parquet(dir)
    val v1Schema = "event_id LONG, user_id LONG, value DOUBLE"
    val total = ev.count()
    // a V1-pinned reader already reads the evolved table (explicit
    // schema projects V2 files down) — evolution never breaks V1
    assert(spark.read.schema(v1Schema).parquet(dir).count() == total)
    val backup = Migrate.downgradeTable(spark, dir,
      Seq("event_id", "user_id", "value"))
    // post-downgrade: the PHYSICAL schema is V1 again (no mergeSchema
    // needed, no dropped-column ghost), all rows intact
    val down = spark.read.parquet(dir)
    assert(down.columns.toSeq == Seq("event_id", "user_id", "value"))
    assert(down.count() == total)
    assert(spark.read.option("mergeSchema", "true").parquet(dir)
      .columns.length == 3, "V2 column physically gone after downgrade")
    // reversible: the backup still carries V2; restore re-upgrades
    Migrate.restore(dir, backup)
    val up = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(up.columns.contains("event_type"))
    assert(up.count() == total)
    // a downgrade may only DROP columns — asking for one the table
    // lacks must fail without touching the table
    val e = intercept[IllegalArgumentException] {
      Migrate.downgradeTable(spark, dir, Seq("event_id", "no_such_col"))
    }
    assert(e.getMessage.contains("no_such_col"))
    assert(spark.read.option("mergeSchema", "true").parquet(dir)
      .count() == total)
  }

  test("vacuum keeps the pointer target, deletes the rest, survives rerun") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft_vac").toString
    val ev = Tables.load(spark, sf0001, "events")
      .select("event_id", "event_type", "value")
    (1L to 3L).foreach { v =>
      graft.etl.Sinks.writeVersioned(
        ev.filter(col("event_id") % 4 < v), dir, v)
    }
    def versionsOnDisk() = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.matches("v\\d+"))
      .map(_.getName).sorted.toSeq
    assert(versionsOnDisk() == Seq("v1", "v2", "v3"))
    val (before, after) = graft.etl.Sinks.vacuumVersions(dir, keep = 1)
    assert((before, after) == (3L, 1L))
    assert(versionsOnDisk() == Seq("v3"), "pointer target must survive")
    // live read still equals the v3 slice
    val live = graft.ops.Streaming.servingTable(spark, dir).count()
    assert(live == ev.filter(col("event_id") % 4 < 3).count())
    // rerun converges (nothing left to delete)
    assert(graft.etl.Sinks.vacuumVersions(dir, keep = 1) == (1L, 1L))
    // keep = 2 on a fresh history retains the next-newest version too
    (4L to 5L).foreach { v =>
      graft.etl.Sinks.writeVersioned(
        ev.filter(col("event_id") % 4 < 1), dir, v)
    }
    val (_, after2) = graft.etl.Sinks.vacuumVersions(dir, keep = 2)
    assert(after2 == 2L && versionsOnDisk() == Seq("v4", "v5"))
    // 'after' counts SURVIVORS ON DISK: when the pointer target is
    // missing (operator error / partial restore), keep-set arithmetic
    // would over-count it — the count must reflect reality
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/LATEST"),
      "v9".getBytes("UTF-8"))
    // keep-set = {v9 (phantom), v5} → v4 deleted; survivors on disk = 1,
    // where keep-set arithmetic would have reported 2
    val (b3, a3) = graft.etl.Sinks.vacuumVersions(dir, keep = 2)
    assert((b3, a3) == (2L, 1L),
      s"missing pointer target must not inflate the survivor count " +
        s"(got ($b3, $a3))")
    assert(versionsOnDisk() == Seq("v5"))
    // a table with no pointer at all fails loudly, not with NoSuchFile
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$dir/LATEST"))
    val err = intercept[IllegalArgumentException] {
      graft.etl.Sinks.vacuumVersions(dir, keep = 1)
    }
    assert(err.getMessage.contains("LATEST"))
  }
}
