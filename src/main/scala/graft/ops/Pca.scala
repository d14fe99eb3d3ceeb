package graft.ops

import breeze.linalg.{eigSym, DenseMatrix => BDM}
import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Distributed PCA via Gram-matrix contraction (ref: the standard
  * tall-skinny decomposition — N×d data with d small enough that d×d
  * fits anywhere, which is every embedding table: the corpus is huge,
  * the width is 64-4096).
  *
  * The WHOLE distributed job is one aggregation: each partition folds
  * its rows into (n, Σx, upper-triangular ΣxxT) — d + d(d+1)/2 doubles
  * of state, ~17 KB at d=64 — and partials merge elementwise, so the
  * shuffle carries `numPartitions` buffers, never rows. The driver
  * finishes on the d×d matrix: covariance from the moments, symmetric
  * eigendecomposition (LAPACK via breeze), top-k eigenvectors become
  * broadcast-literal projection rows consumed by the codegen'd
  * [[org.apache.spark.sql.graftfns.DotProduct]] kernel — the same
  * collect-only-index-metadata discipline as the IVF centroid trainer
  * (TextSim.scala) and the PQ codebooks (ProductQuant.scala).
  *
  * Determinism: float×float products are exact in double, but the
  * partial SUMS are double adds whose rounding depends on merge order —
  * the §7.5.2 class. At d=64 the eigensolve conditions that ~1e-13
  * relative jitter away from the 4-dp rounded scores, and the operator
  * is Q-tier (property-gated in TextSimSpec: score variances match
  * eigenvalues, components decorrelate, PCA beats the coordinate basis),
  * not hash-gated. Eigenvector SIGN is pinned explicitly (largest-|entry|
  * positive) — LAPACK's sign is arbitrary and flipping it silently
  * negates every downstream score. */
object Pca {

  /** Moment buffer: row count, per-dim sums, upper-triangular (row-major
    * i ≤ j) sum of outer products. */
  case class GramBuf(n: Long, sums: Array[Double], gram: Array[Double])

  /** One-pass moment contraction over `Seq[Float]` vectors of width `d`.
    * reduce is d(d+3)/2 fused multiply-adds on primitive arrays (~1 µs
    * at d=64); buffers mutate in place (ScalaAggregator keeps the buffer
    * as an object inside a partition, serializing only at the shuffle
    * boundary). */
  class GramMatrix(d: Int) extends Aggregator[Seq[Float], GramBuf, GramBuf] {
    override def zero: GramBuf =
      GramBuf(0L, new Array[Double](d), new Array[Double](d * (d + 1) / 2))
    override def reduce(b: GramBuf, xs: Seq[Float]): GramBuf = {
      require(xs.length == d, s"vector width ${xs.length} != $d")
      val x = new Array[Double](d)
      var i = 0
      while (i < d) { x(i) = xs(i).toDouble; i += 1 }
      var idx = 0
      i = 0
      while (i < d) {
        b.sums(i) += x(i)
        var j = i
        while (j < d) { b.gram(idx) += x(i) * x(j); idx += 1; j += 1 }
        i += 1
      }
      GramBuf(b.n + 1, b.sums, b.gram)
    }
    override def merge(a: GramBuf, b: GramBuf): GramBuf = {
      var i = 0
      while (i < a.sums.length) { a.sums(i) += b.sums(i); i += 1 }
      i = 0
      while (i < a.gram.length) { a.gram(i) += b.gram(i); i += 1 }
      GramBuf(a.n + b.n, a.sums, a.gram)
    }
    override def finish(b: GramBuf): GramBuf = b
    override def bufferEncoder: Encoder[GramBuf] = Encoders.product[GramBuf]
    override def outputEncoder: Encoder[GramBuf] = Encoders.product[GramBuf]
  }

  /** Fitted model: all d eigenvalues descending (explained-variance
    * readout) + the top-k sign-pinned components (rows of length d). */
  case class PcaModel(n: Long, means: Array[Double], eigvals: Array[Double],
                      components: Array[Array[Double]])

  /** Fit on `df(embCol): array<float>` of width `d`; keep `k` components.
    * One Spark job (the moment aggregation); everything after runs on the
    * driver over d×d doubles. */
  def fit(df: DataFrame, embCol: String, d: Int, k: Int): PcaModel = {
    val spark = df.sparkSession
    import spark.implicits._
    val gm = udaf(new GramMatrix(d), implicitly[Encoder[Seq[Float]]])
    val g = df.select(gm(col(embCol)).as("g")).head().getStruct(0)
    val n = g.getLong(0)
    require(n > 1, "PCA needs at least 2 rows")
    val sums = g.getSeq[Double](1).toArray
    val tri = g.getSeq[Double](2).toArray
    val mu = sums.map(_ / n)
    val c = new BDM[Double](d, d)
    var idx = 0
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val cov = (tri(idx) - n * mu(i) * mu(j)) / (n - 1)
        c(i, j) = cov; c(j, i) = cov
        idx += 1; j += 1
      }
      i += 1
    }
    val es = eigSym(c) // eigenvalues ascending
    val order = (0 until d).sortBy(es.eigenvalues(_)).reverse
    val eig = order.map(es.eigenvalues(_)).toArray
    val comps = order.take(k).map { col0 =>
      val v = Array.tabulate(d)(r => es.eigenvectors(r, col0))
      val m = v.indices.maxBy(a => (math.abs(v(a)), -a))
      if (v(m) < 0) v.map(x => -x) else v
    }.toArray
    PcaModel(n, mu, eig, comps)
  }
}
