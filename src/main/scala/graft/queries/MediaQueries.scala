package graft.queries

import graft.ops.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.N multimodal registration: the binary-payload operators surfaced as
  * a driver-verified query (the rest of the family — decode batching,
  * frame sampling — is U-tier in MultimodalSpec; codec is an honest stub,
  * [[Multimodal.FakeCodec]]). */
object MediaQueries {
  type Q = (SparkSession, String) => DataFrame

  /** q_media_dedup — exact binary-payload dedup over the media fixture:
    * byte stats ([[Multimodal.withByteStats]]) then group-by content hash
    * (sha2 over the binary) with a deterministic keeper (min media_id) —
    * the q_text_dedup_exact family applied to a binary column. The
    * comparable group key in the output is `hex(payload)` rather than the
    * sha because DuckDB 1.0 has no cryptographic hash over BLOBs; hex is
    * injective, so group membership — what the dedup must get right — is
    * fully verified. `sfDir` is unused: the media fixture is synthetic
    * and SF-independent. */
  private val mediaDedup: Q = (s, _) => {
    val path = Multimodal.mediaFixture(s)
    Multimodal.withByteStats(s.read.parquet(path))
      .withColumn("payload_hex", hex(col("payload")))
      .groupBy("payload_sha")
      .agg(
        min("media_id").as("media_id"),
        min_by(col("media_type"), col("media_id")).as("media_type"),
        min("payload_hex").as("payload_hex"),
        min("n_bytes").as("n_bytes"),
        count(lit(1)).as("n_copies"))
      .select("media_id", "media_type", "payload_hex", "n_bytes", "n_copies")
      .orderBy("media_id")
  }

  /** q_media_frames — frame-sample the video payloads
    * ([[Multimodal.sampleFrames]]: 256-byte fake frames, keep every 4th,
    * resize to 128 bytes) and emit per-frame metadata + content hash —
    * the generator-over-binary shape (explode for media). Partition-
    * batched flatMap: decoder init once per partition, no driver
    * involvement, output rows ≪ input bytes (the point of sampling
    * before shipping frames to a feature extractor at 100 TB).
    * Q-tier: DuckDB 1.0 cannot chunk+pad BLOBs to replicate the frame
    * slicing; determinism + frame-count/byte-count invariants are
    * spec-pinned in MultimodalSpec. `sfDir` unused (fixture is
    * SF-independent, as q_media_dedup). */
  private val mediaFrames: Q = (s, _) => {
    // O-tier since r15: the kept-frame CENSUS is pure integer
    // arithmetic on payload length (chunks of 256, stride 4, resize
    // pads/truncates every frame to exactly 128 bytes), so DuckDB
    // re-derives every row from octet_length alone — the frame-sha
    // column moved to MultimodalSpec (frame BYTES have no DuckDB
    // BLOB-slicing twin; the kernel's determinism is spec-pinned).
    import s.implicits._
    val path = Multimodal.mediaFixture(s)
    val rows = s.read.parquet(path).as[Multimodal.MediaRow]
    Multimodal.sampleFrames(rows, frameBytes = 256, every = 4,
        targetBytes = 128)
      .toDF()
      .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"),
        length(col("frame_bytes")).cast("long").as("n_bytes"))
      .orderBy("media_id", "frame_idx")
  }

  /** q_media_shard — size-balanced shard manifest for the media corpus
    * (the webdataset/tar-shard builder): within each media type,
    * payloads pack greedily in media_id order into shards capped at
    * 2 KiB of cumulative payload, and the manifest reports each
    * shard's item count, byte load, and id span — the index a
    * multimodal dataloader consumes. Shard assignment is a running
    * BYTES-BEFORE-ME prefix sum (rows UNBOUNDED PRECEDING → 1
    * PRECEDING, coalesced to 0 at the head) floor-divided by the cap:
    * one window pass, O(1) state, then a (type, shard) two-phase
    * rollup. The window is partitioned BY MEDIA TYPE — the way real
    * shard builders run per (modality, date-bucket) so no task owns a
    * global order; at 100 TB the partition key gains the date bucket
    * and the plan is unchanged. Integer-exact end to end (byte
    * lengths, prefix sums, floor division) — no float anywhere.
    * `sfDir` unused: the media fixture is synthetic and SF-independent
    * (as q_media_dedup). */
  private val mediaShard: Q = (s, _) => {
    val path = Multimodal.mediaFixture(s)
    val w = Window.partitionBy("media_type").orderBy("media_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    s.read.parquet(path)
      .select(col("media_id"), col("media_type"),
        length(col("payload")).cast("long").as("n_bytes"))
      .withColumn("bytes_before",
        coalesce(sum("n_bytes").over(w), lit(0L)))
      .withColumn("shard",
        floor(col("bytes_before") / 2048).cast("long"))
      .groupBy("media_type", "shard")
      .agg(count(lit(1)).as("n_items"),
        sum("n_bytes").cast("long").as("total_bytes"),
        min("media_id").as("first_id"),
        max("media_id").as("last_id"))
      .orderBy("media_type", "shard")
  }

  /** q_media_phash — perceptual-hash NEAR-dup candidates over the
    * binary payloads: 64-bit signatures ([[Multimodal.phash64]] — the
    * documented stub analog of a DCT pHash), banded into 4×16-bit
    * Hamming bands, candidates from the band equi-join (pigeonhole:
    * signatures within Hamming 3 ALWAYS share an exact band; beyond
    * that recall is probabilistic — the standard banding trade,
    * tunable by band count), rescued by the exact bit_count(XOR)
    * distance ≤ 4 (tight by design: the synthetic fixture's
    * seed-derived payloads have near-uniform byte histograms, so loose
    * thresholds degenerate to all-pairs — real DCT hashes separate
    * further and the threshold is the recall/precision knob). This is q_media_dedup's near-dup
    * twin — exact sha catches bit-identical copies; this catches
    * re-encodes/minor corruption — and the same dataflow as
    * q_text_simhash on text. All-pairs never materializes: candidates
    * come from bucket joins only. Q-tier: DuckDB 1.0 has no BLOB
    * byte-histogram to replicate the signature; signature
    * determinism, perturbation locality, and pair correctness are
    * pinned in MultimodalSpec. */
  /** Raw banded-candidate pair builder (spec surface): MultimodalSpec
    * pins the FULL pair set against a brute-force in-memory
    * reference. */
  private[graft] def mediaPhashPairs(s: SparkSession): DataFrame = {
    import s.implicits._
    val path = Multimodal.mediaFixture(s)
    val sigs = s.read.parquet(path).as[Multimodal.MediaRow]
      .map(m => (m.media_id,
        Multimodal.phash64(Option(m.payload).getOrElse(Array.empty))))
      .toDF("media_id", "phash")
      .localCheckpoint()
    val bands = sigs.select(col("media_id"), col("phash"),
      explode(sequence(lit(0), lit(3))).as("band_idx"))
      .withColumn("band_val",
        expr("shiftrightunsigned(phash, band_idx * 16) & 65535"))
    val b1 = bands.as("b1"); val b2 = bands.as("b2")
    b1.join(b2, col("b1.band_idx") === col("b2.band_idx") &&
        col("b1.band_val") === col("b2.band_val") &&
        col("b1.media_id") < col("b2.media_id"))
      .select(col("b1.media_id").as("id_a"),
        col("b2.media_id").as("id_b"),
        col("b1.phash").as("pa"), col("b2.phash").as("pb"))
      .distinct()
      .withColumn("hamming", expr("CAST(bit_count(pa ^ pb) AS BIGINT)"))
      .filter(col("hamming") <= 4)
      .select(col("id_a"), col("id_b"), col("hamming"))
      .orderBy("id_a", "id_b")
  }

  /** O-bound registration (r15): byte-identical payloads ⇒ identical
    * phash ⇒ a hamming-0 candidate pair — a CONTRACT of any
    * content-hash family, so "every exact-duplicate pair appears
    * among the banded candidates" is a deterministic TRUE the DuckDB
    * oracle asserts, and the exact-pair census (hex-payload
    * self-join — the q_media_dedup injective-hex device) anchors
    * bit-for-bit. Near-dup candidate QUALITY stays pinned in
    * MultimodalSpec via [[mediaPhashPairs]]. */
  private val mediaPhash: Q = (s, _) => {
    val pairs = mediaPhashPairs(s)
    val rows = s.read.parquet(Multimodal.mediaFixture(s))
      .select(col("media_id"), hex(col("payload")).as("ph"))
    val exact = rows.as("x").join(rows.as("y"),
        col("x.ph") === col("y.ph") &&
          col("x.media_id") < col("y.media_id"))
      .select(col("x.media_id").as("id_a"),
        col("y.media_id").as("id_b"))
      .localCheckpoint()
    val missing = exact
      .join(pairs.filter(col("hamming") === 0), Seq("id_a", "id_b"),
        "left_anti")
      .agg(count(lit(1)).as("n_miss"))
    val nMedia = rows.agg(count(lit(1)).as("n_media"))
    exact.agg(count(lit(1)).as("n_exact_pairs"))
      .crossJoin(broadcast(missing)).crossJoin(broadcast(nMedia))
      .select((col("n_miss") === 0L).as("exact_pairs_covered"),
        col("n_exact_pairs").cast("long").as("n_exact_pairs"),
        col("n_media").cast("long").as("n_media"))
  }

  val all: Map[String, Q] = Map(
    "q_media_phash" -> mediaPhash,
    "q_media_dedup" -> mediaDedup,
    "q_media_frames" -> mediaFrames,
    "q_media_shard" -> mediaShard)
}
