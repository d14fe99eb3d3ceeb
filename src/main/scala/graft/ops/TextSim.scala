package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis, deduplication and vector-similarity operators — the
  * training-data-pipeline extensions (SURVEY.md §2.M). Everything is an
  * expression pipeline over built-ins (`hash`/`xxhash64`, higher-order
  * array functions), so each stage is codegen'd and shuffles only on the
  * intended keys.
  */
object TextSim {

  /** Lower-cased whitespace tokens. */
  def tokens(text: Column): Column = split(lower(text), " ")

  /** Word n-gram shingles (the MinHash input unit). */
  def shingles(text: Column, n: Int): Column = {
    val w = tokens(text)
    transform(sequence(lit(0), size(w) - n),
      i => concat_ws(" ", slice(w, i + 1, lit(n))))
  }

  /** MinHash signature: for each of `numHashes` seed-perturbed hash
    * functions, the minimum hash over the shingle set. One pass, no
    * shuffle — the signature is a per-row expression. */
  def minhashSignature(shingleCol: Column, numHashes: Int): Column =
    array((0 until numHashes).map { seed =>
      array_min(transform(shingleCol,
        x => xxhash64(lit(seed), x)))
    }: _*)

  /** LSH band hashes computed directly from the shingle array — one
    * shingle pass per (band, row-in-band), never materializing then
    * re-deriving the full signature (projection collapse would otherwise
    * inline the whole signature expression into every band and multiply
    * the work ×bands). Returns array of `bands` hashes. */
  def bandHashes(shingleCol: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), b =>
      xxhash64((0 until rowsPerBand).map(j =>
        array_min(transform(shingleCol,
          x => xxhash64(b * rowsPerBand + j, x)))): _*))

  /** Candidate near-duplicate pairs via LSH band collisions
    * (doc_a < doc_b, distinct).
    *
    * Shape: one projection computes band hashes, one shuffle groups by
    * (band, band_hash), pairs are expanded inside each bucket — no
    * self-join (which would recompute the signatures on both sides) and
    * no quadratic all-pairs compare. Bucket pair expansion is inherently
    * quadratic in bucket size; that is LSH's contract (buckets stay
    * small unless the corpus is one giant duplicate class). */
  def minhashCandidates(df: DataFrame, docId: Column, text: Column,
                        shingleSize: Int = 3, numHashes: Int = 64,
                        bands: Int = 16): DataFrame = {
    val sh = df.select(docId.as("doc_id"),
        shingles(text, shingleSize).as("sh"))
      .filter(size(col("sh")) > 0)
    val banded = sh.select(col("doc_id"),
        posexplode(bandHashes(col("sh"), bands, numHashes / bands)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_hash")
    val buckets = banded.groupBy("band", "band_hash")
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1)
    buckets
      .select(explode(flatten(transform(
        sequence(lit(0), size(col("ids")) - 2),
        i => transform(slice(col("ids"), i + 2, size(col("ids"))),
          x => struct(element_at(col("ids"), i + 1).as("a"),
            x.as("b")))))).as("pair"))
      .select(col("pair.a").as("doc_a"), col("pair.b").as("doc_b"))
      .distinct()
  }

  /** Exact Jaccard similarity of two token-set columns (verification
    * companion to MinHash; used by the spec suite). */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** Dot product of two equal-length double arrays: sequential fold —
    * deterministic order, codegen'd. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity over float-vector columns (cast to double before
    * arithmetic — float accumulation drifts between engines). */
  def cosine(a: Column, b: Column): Column = {
    val ad = a.cast("array<double>")
    val bd = b.cast("array<double>")
    dot(ad, bd) / (l2Norm(ad) * l2Norm(bd))
  }

  /** Brute-force top-k cosine neighbours for each probe row: the baseline
    * kNN join (BroadcastNestedLoop × probe count). At scale you bound the
    * probe side or move to the LSH/IVF bucketed variant; the per-probe
    * top-k window keeps only k rows per probe after the join. */
  def knnJoin(probes: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    // broadcast the (small) probe side: the BNL join then streams the
    // corpus once per task with probes resident, instead of shipping the
    // corpus to the probes
    val joined = broadcast(probes.select(col("vec_id").as("probe_id"),
        col("embedding").as("probe_vec")))
      .join(corpus.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("neighbor_vec")),
        col("probe_id") =!= col("neighbor_id"))
      .withColumn("sim", round(cosine(col("probe_vec"),
        col("neighbor_vec")), 4))
    Relational.topKPerGroup(joined, Seq(col("probe_id")),
        Seq(col("sim").desc, col("neighbor_id")), k)
      .select(col("probe_id"), col("neighbor_id"), col("sim"),
        col("rn").cast("long").as("rn"))
  }
}
