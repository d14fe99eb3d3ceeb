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

  /** Word n-gram shingles (the MinHash input unit). Texts with fewer
    * than `n` tokens yield an empty shingle set — without the guard,
    * `sequence(0, size-n)` would run descending and `slice` would throw
    * on the negative index, aborting the job on the first short doc. */
  def shingles(text: Column, n: Int): Column = {
    val w = tokens(text)
    when(size(w) >= n,
      transform(sequence(lit(0), size(w) - n),
        i => concat_ws(" ", slice(w, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /* Hash-family construction: each token STRING is xxhash64'd once;
   * shingle hashes are XXH64 chains over consecutive token hashes
   * (ShingleHashes) and the i-th MinHash function derives by seeded
   * integer hashing (MinHashes) — overflow-free under ANSI mode (a
   * multiply-mix family would throw ARITHMETIC_OVERFLOW on Spark 4's
   * ANSI default) and no shingle string is ever materialized. */

  /** MinHash signature of a text: `numHashes` minima over the hashed
    * `shingleSize`-token shingle set. Per-row expression, no shuffle;
    * one string-hash pass over tokens, integer work after. */
  def minhashSignature(text: Column, shingleSize: Int,
                       numHashes: Int): Column = {
    val fns = org.apache.spark.sql.graftfns.VectorFunctions
    fns.minhashes(
      fns.shingle_hashes(transform(tokens(text), x => xxhash64(x)),
        shingleSize), numHashes)
  }

  /** Band hashes from a materialized signature array: band b combines its
    * `rowsPerBand` minima with one xxhash64 (cheap element_at reads —
    * keep the signature in its own projection so CollapseProject doesn't
    * inline the one-pass computation into all `bands` references). */
  def bandHashesOfSig(sig: Column, rowsPerBand: Int, bands: Int): Column =
    array((0 until bands).map { b =>
      xxhash64((0 until rowsPerBand).map { j =>
        element_at(sig, b * rowsPerBand + j + 1)
      }: _*)
    }: _*)

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
    require(bands > 0 && shingleSize > 0,
      s"bands ($bands) and shingleSize ($shingleSize) must be positive")
    require(numHashes >= bands && numHashes % bands == 0,
      s"numHashes ($numHashes) must be a positive multiple of bands " +
        s"($bands) — otherwise part of the signature is silently unused")
    val sh = df.select(docId.as("doc_id"), text.as("__text"))
      .filter(size(tokens(col("__text"))) >= shingleSize)
      .select(col("doc_id"),
        minhashSignature(col("__text"), shingleSize, numHashes).as("sig"))
    val banded = sh.select(col("doc_id"),
        posexplode(bandHashesOfSig(col("sig"), numHashes / bands, bands)))
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

  /** Dot product of two equal-length double arrays: sequential sum,
    * native codegen'd expression
    * ([[org.apache.spark.sql.graftfns.DotProduct]] — the interpreted
    * `aggregate∘zip_with` fold it replaces dominated the kNN join at 10⁶
    * pairs). */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graftfns.VectorFunctions.dot_product(
      a.cast("array<double>"), b.cast("array<double>"))

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Oracle-stable cosine from precomputed norms: every candidate-scoring
    * site (kNN, both ANN paths, LSH dedup) rescores with this same
    * rounded form — norms are computed once per row before the join, so
    * the per-pair work is one dot product. */
  private def roundedSim(va: Column, vb: Column,
                         na: Column, nb: Column): Column =
    round(dot(va, vb) / (na * nb), 4)

  /** Cosine similarity over float-vector columns (cast to double before
    * arithmetic — float accumulation drifts between engines). */
  def cosine(a: Column, b: Column): Column = {
    val ad = a.cast("array<double>")
    val bd = b.cast("array<double>")
    dot(ad, bd) / (l2Norm(ad) * l2Norm(bd))
  }

  /** 64-bit SimHash of a text (token-level;
    * [[org.apache.spark.sql.graftfns.SimHash64]]). */
  def simhash(text: Column): Column =
    org.apache.spark.sql.graftfns.VectorFunctions.simhash64(
      transform(tokens(text), x => xxhash64(x)))

  /** SimHash near-duplicate candidates: fingerprints are cut into 4
    * 16-bit bands; by pigeonhole, any pair within Hamming distance ≤ 3
    * shares at least one exact band → one equi-join shuffle on (band,
    * value) finds all such pairs, then `bit_count(a xor b)` filters
    * exactly. Same scale shape as MinHash banding. */
  def simhashCandidates(df: DataFrame, docId: Column, text: Column,
                        maxHamming: Int = 3): DataFrame = {
    val fp = df.select(docId.as("doc_id"), simhash(text).as("fp"))
    val banded = fp.select(col("doc_id"), col("fp"),
        posexplode(array((0 until 4).map(b =>
          shiftright(col("fp"), b * 16).bitwiseAND(0xffffL)): _*)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_val")
    val a = banded.select(col("band"), col("band_val"),
      col("doc_id").as("doc_a"), col("fp").as("fp_a"))
    val b = banded.select(col("band"), col("band_val"),
      col("doc_id").as("doc_b"), col("fp").as("fp_b"))
    a.join(b, Seq("band", "band_val"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).cast("long")
          .as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Word n-gram Jaccard similarity between two text columns (set
    * semantics — the exact-measure companion to MinHash's estimate). */
  def ngramJaccard(a: Column, b: Column, n: Int): Column = {
    val (ga, gb) = (shingles(a, n), shingles(b, n))
    round(size(array_intersect(ga, gb)).cast("double") /
      size(array_union(ga, gb)).cast("double"), 4)
  }

  // ───── text analysis (language-ID, quality, tokens, fingerprint) ─────

  /** Tiny per-language stopword profiles for the n-gram/stopword
    * language-ID heuristic. Fixed vocabularies: at 100 TB the profile is
    * a broadcast literal, never a join. */
  val stopwordProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein", "zu"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "es"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "est"))

  /** Count of tokens appearing in a fixed vocabulary (non-distinct). */
  def vocabHits(tokensCol: Column, vocab: Seq[String]): Column =
    size(filter(tokensCol, w => array_contains(typedLit(vocab), w)))
      .cast("long")

  /** Stopword-profile language ID: argmax of per-language hit counts,
    * ties resolved in profile order (deterministic). */
  def langId(tokensCol: Column): Column = {
    val scores = stopwordProfiles.map { case (lang, vocab) =>
      lang -> vocabHits(tokensCol, vocab)
    }
    scores.init.foldRight(lit(scores.last._1)) { case ((lang, s), rest) =>
      val laterScores = scores.dropWhile(_._1 != lang).tail.map(_._2)
      when(laterScores.foldLeft(lit(true))((acc, o) => acc && s >= o),
        lang).otherwise(rest)
    }
  }

  /** BPE-ish subword segmentation count: letter runs, digit runs, and
    * single other-symbols — the pre-tokenizer regex family used by BPE
    * vocabularies. */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text),
      lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).cast("long")

  /** Punctuation/symbol character count (quality signal). */
  def punctCount(text: Column): Column =
    length(regexp_replace(lower(text), "[a-z0-9\\s]", "")).cast("long")

  /** Normalized-content fingerprint: case-fold, collapse whitespace,
    * sha256 — the dedup key that survives cosmetic reformatting. */
  def contentFingerprint(text: Column): Column =
    sha2(regexp_replace(trim(lower(text)), "\\s+", " "), 256)

  /** Winnowing-style rolling fingerprint: minimum hash over word
    * k-grams. Not cross-engine-stable (xxhash64), verified against a
    * scalar reference in TextSimSpec. */
  def rollingFingerprint(text: Column, k: Int = 4): Column =
    array_min(transform(shingles(text, k), x => xxhash64(x)))

  // ───── vector ANN: LSH-bucketed scale path ─────

  /** Deterministic random hyperplanes for sign-LSH (seeded — the bucket
    * function must be identical across runs and executors). `dim` must
    * match the embedding dimensionality: shorter planes would silently
    * bucket on a prefix of the vector. */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-LSH bucket id: bit i = sign of dot(vec, plane_i). Vectors with
    * high cosine land in the same bucket with high probability. A vector
    * whose length differs from the planes' yields a NULL bucket (the dot
    * is NULL) — the row then matches nothing in the bucket equi-join,
    * which fails loudly-empty instead of silently degrading. */
  def signBucket(vec: Column, planes: Seq[Seq[Double]]): Column = {
    val vd = vec.cast("array<double>")
    planes.zipWithIndex.foldLeft(lit(0)) { case (acc, (p, i)) =>
      val d = dot(vd, typedLit(p))
      acc + when(d.isNull, lit(null).cast("int"))
        .when(d > 0, lit(1 << i)).otherwise(lit(0))
    }
  }

  /** Multi-table sign-LSH bucket ids: `nTables` independent hash tables
    * of `bits` hyperplanes each; bucket key encodes (table, signature).
    * Returns an array column of one bucket id per table. `dim` must be
    * the embedding dimensionality: on a mismatch every bucket id is NULL
    * (see [[signBucket]]) and the candidate join returns no rows — an
    * immediately visible failure rather than degraded recall. */
  def lshBuckets(vec: Column, nTables: Int, bits: Int,
                 dim: Int = 64): Column =
    array((0 until nTables).map { t =>
      signBucket(vec, hyperplanes(bits, dim, seed = 42L + t))
        .cast("long") + lit(t.toLong << 32)
    }: _*)

  /** Approximate top-k cosine neighbours via multi-table sign-LSH:
    * candidates are the union over `nTables` independent hash tables of
    * same-bucket vectors, scored exactly, top-k per probe.
    *
    * This is the 100 TB path: the corpus is bucketed once (one shuffle
    * on bucket id), each probe scores only co-bucketed candidates —
    * cost scales with bucket occupancy (≈ nTables·N/2^bits per probe),
    * not corpus size. Recall/cost tunes via (nTables, bits): more bits →
    * smaller buckets; more tables → recovered recall. Defaults target
    * weakly-clustered embeddings (recall ≈ 0.6 at ~¼ of brute-force
    * cost); strongly-clustered real embeddings do far better. */
  def annCosineLsh(probes: DataFrame, corpus: DataFrame, k: Int,
                   nTables: Int = 8, bits: Int = 5,
                   dim: Int = 64): DataFrame = {
    val corpusB = corpus.select(col("vec_id").as("neighbor_id"),
        col("embedding").cast("array<double>").as("neighbor_vec"))
      .withColumn("neighbor_norm", l2Norm(col("neighbor_vec")))
      .withColumn("bucket",
        explode(lshBuckets(col("neighbor_vec"), nTables, bits, dim)))
    val probeB = probes.select(col("vec_id").as("probe_id"),
        col("embedding").cast("array<double>").as("probe_vec"))
      .withColumn("probe_norm", l2Norm(col("probe_vec")))
      .withColumn("bucket",
        explode(lshBuckets(col("probe_vec"), nTables, bits, dim)))
    // score before distinct, then drop the vectors: the dedup and top-k
    // shuffles move (id, id, sim) rows, not 64-double payloads
    val cand = probeB.join(corpusB, Seq("bucket"))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .withColumn("sim", roundedSim(col("probe_vec"), col("neighbor_vec"),
        col("probe_norm"), col("neighbor_norm")))
      .select("probe_id", "neighbor_id", "sim")
      .distinct()
    Relational.topKPerGroup(cand, Seq(col("probe_id")),
        Seq(col("sim").desc, col("neighbor_id")), k)
      .select(col("probe_id"), col("neighbor_id"), col("sim"),
        col("rn").cast("long").as("rn"))
  }

  /** Embedding-cosine near-duplicate pairs (sim ≥ threshold) via
    * multi-table sign-LSH bucketing + exact rescore — the scale path for
    * the cosine-dedup operator.
    *
    * Shape: the corpus is bucketed once per table (one explode + one
    * shuffle on bucket id), pairs are generated only inside buckets by an
    * equi-join, each candidate is rescored with the exact dot product, and
    * the threshold filter is exact — so precision is always 1. Recall is
    * governed by (nTables, bits): a pair at cosine s collides in one table
    * with probability (1 - arccos(s)/π)^bits and must collide in at least
    * one of nTables. Per-pair work stays O(nTables · bucket occupancy),
    * never the corpus cross product, and the join is a shuffled hash join —
    * no BroadcastNestedLoopJoin anywhere in the plan (PlanQualitySpec
    * gates this).
    *
    * Defaults are sized for the calibrated 0.42 threshold of
    * q_vec_cosine_dedup (collision p ≈ 0.64 per plane): bits=3 keeps
    * 8 buckets per table (occupancy N/8) and nTables=32 drives the
    * per-pair miss rate below 10⁻⁴ at the threshold margin; TextSimSpec
    * asserts exact equality with the brute-force pair set on the test
    * corpora.
    *
    * Cost honesty: 0.42 (≈ 65° angle) is the adversarial case for ANY
    * cosine-LSH family — pairs near the threshold are barely more
    * collision-prone than random pairs, so full-recall parameters make
    * candidate coverage approach the full pair set (measured ≈ 98% of
    * C(N,2) on the weakly-clustered test embeddings) and the rescore
    * stage does ≈ brute-force work, distributed over bucket-join tasks.
    * The structure still wins at scale for two reasons: (1) the work is
    * a shuffled equi-join — partitioned by bucket across the cluster —
    * not a broadcast nested loop, and (2) real near-dup pipelines run at
    * thresholds ≥ 0.8 (p ≥ 0.86 per plane), where the same code with
    * more bits / fewer tables prunes candidates aggressively. */
  def cosineDedupLsh(emb: DataFrame, threshold: Double,
                     nTables: Int = 32, bits: Int = 3,
                     dim: Int = 64): DataFrame = {
    // bucket join carries IDS ONLY: a pair colliding in many of the
    // nTables tables would otherwise be rescored once per collision
    // (32× the dot products) and drag 64-double payloads through the
    // join — distinct first, fetch vectors once per unique pair after
    val bucketed = emb.select(col("vec_id"),
        explode(lshBuckets(col("embedding").cast("array<double>"),
          nTables, bits, dim)).as("bucket"))
    val pairs = bucketed.select(col("bucket"), col("vec_id").as("id_a"))
      .join(bucketed.select(col("bucket"), col("vec_id").as("id_b")),
        Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
    val vecs = emb.select(col("vec_id"),
        col("embedding").cast("array<double>").as("vec"))
      .withColumn("norm", l2Norm(col("vec")))
    pairs
      .join(vecs.select(col("vec_id").as("id_a"), col("vec").as("va"),
        col("norm").as("na")), Seq("id_a"))
      .join(vecs.select(col("vec_id").as("id_b"), col("vec").as("vb"),
        col("norm").as("nb")), Seq("id_b"))
      .withColumn("sim",
        roundedSim(col("va"), col("vb"), col("na"), col("nb")))
      .filter(col("sim") >= threshold)
      .select("id_a", "id_b", "sim")
  }

  /** IVF (inverted-file) approximate top-k cosine neighbours — the other
    * canonical ANN scale shape next to [[annCosineLsh]]: the corpus is
    * partitioned into `nCells` cells by nearest centroid, probes search
    * only their `nProbe` nearest cells.
    *
    * Centroids are `nCells` deterministic corpus samples (lowest vec_ids),
    * L2-normalized on the driver and embedded as literals — so cell
    * assignment is a codegen'd argmax of `nCells` dot products per row,
    * no shuffle. (Real deployments train centroids with k-means offline;
    * that changes centroid VALUES, not this index/search dataflow.) The
    * driver-side collect touches exactly `nCells` rows of index metadata —
    * the same role a broadcast dim plays — never the corpus.
    *
    * Cost: one shuffle to group the corpus by cell, probe-side explode
    * ×nProbe, equi-join on cell, exact rescore, per-probe top-k. Per
    * probe the work is ≈ nProbe·N/nCells instead of N; recall tunes via
    * nProbe (nProbe = nCells degenerates to exact search). */
  def annCosineIvf(probes: DataFrame, corpus: DataFrame, k: Int,
                   nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    require(nCells > 0 && nProbe > 0 && nProbe <= nCells,
      s"need 0 < nProbe ($nProbe) <= nCells ($nCells)")
    val centroids: Seq[Seq[Double]] = corpus
      .orderBy("vec_id").limit(nCells)
      .select(col("embedding").cast("array<double>"))
      .collect().map { r =>
        val v = r.getSeq[Double](0)
        val n = math.sqrt(v.map(x => x * x).sum)
        if (n == 0) v else v.map(_ / n)
      }.toSeq
    // argmax_j dot(v, ĉ_j): the row's own norm is constant across j, so
    // normalized centroids suffice for the cosine argmax
    def cellDots(vec: Column): Column =
      array(centroids.map(c => dot(vec, typedLit(c))): _*)
    val corpusCells = corpus.select(col("vec_id").as("neighbor_id"),
        col("embedding").cast("array<double>").as("neighbor_vec"))
      .withColumn("neighbor_norm", l2Norm(col("neighbor_vec")))
      .withColumn("__d", cellDots(col("neighbor_vec")))
      // first max wins on ties — deterministic cell assignment
      .withColumn("cell", expr("array_position(__d, array_max(__d))"))
      .drop("__d")
    // pick cells over slim (probe_id, cell, dot) rows — the nCells-way
    // explode and the top-k window shuffle must not carry the 64-double
    // probe vector; it is joined back once per surviving (probe, cell)
    val probeVecs = probes.select(col("vec_id").as("probe_id"),
        col("embedding").cast("array<double>").as("probe_vec"))
      .withColumn("probe_norm", l2Norm(col("probe_vec")))
    val probeCells = {
      val dots = probeVecs
        .select(col("probe_id"), posexplode(cellDots(col("probe_vec"))))
        .withColumnRenamed("pos", "cell0")
        .withColumnRenamed("col", "cdot")
      Relational.topKPerGroup(dots, Seq(col("probe_id")),
          Seq(col("cdot").desc, col("cell0")), nProbe)
        .withColumn("cell", col("cell0") + 1) // align with array_position's 1-base
        .select("probe_id", "cell")
    }
    val cand = probeCells.join(probeVecs, Seq("probe_id"))
      .join(corpusCells, Seq("cell"))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .withColumn("sim", roundedSim(col("probe_vec"), col("neighbor_vec"),
        col("probe_norm"), col("neighbor_norm")))
      .select("probe_id", "neighbor_id", "sim")
    Relational.topKPerGroup(cand, Seq(col("probe_id")),
        Seq(col("sim").desc, col("neighbor_id")), k)
      .select(col("probe_id"), col("neighbor_id"), col("sim"),
        col("rn").cast("long").as("rn"))
  }

  /** Brute-force top-k cosine neighbours for each probe row: the baseline
    * kNN join (BroadcastNestedLoop × probe count). At scale you bound the
    * probe side or move to the LSH/IVF bucketed variant; the per-probe
    * top-k window keeps only k rows per probe after the join. */
  def knnJoin(probes: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    // broadcast the (small) probe side: the BNL join then streams the
    // corpus once per task with probes resident, instead of shipping the
    // corpus to the probes. Norms are precomputed per side — the join
    // then computes only the dot product per pair, not three folds.
    val joined = broadcast(probes.select(col("vec_id").as("probe_id"),
        col("embedding").cast("array<double>").as("probe_vec"))
        .withColumn("probe_norm", l2Norm(col("probe_vec"))))
      .join(corpus.select(col("vec_id").as("neighbor_id"),
          col("embedding").cast("array<double>").as("neighbor_vec"))
        .withColumn("neighbor_norm", l2Norm(col("neighbor_vec"))),
        col("probe_id") =!= col("neighbor_id"))
      .withColumn("sim", roundedSim(col("probe_vec"), col("neighbor_vec"),
        col("probe_norm"), col("neighbor_norm")))
      // drop the vectors before the top-k shuffle: (id, id, sim) rows
      // instead of 64-double payloads
      .select("probe_id", "neighbor_id", "sim")
    Relational.topKPerGroup(joined, Seq(col("probe_id")),
        Seq(col("sim").desc, col("neighbor_id")), k)
      .select(col("probe_id"), col("neighbor_id"), col("sim"),
        col("rn").cast("long").as("rn"))
  }
}
