package org.apache.spark.sql.graftfns

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, IntegerType}

/** Native Catalyst expressions for the vector hot path (graft engine).
  *
  * Lives under `org.apache.spark.sql` because the Expression↔Column
  * bridge (`classic.ExpressionUtils`) and `AbstractDataType` are
  * `private[sql]` — the standard shim-package pattern for third-party
  * Catalyst extensions.
  *
  * Why a custom expression (SURVEY.md §7.3 preference order: built-ins →
  * Expression → UDF): the built-in composition
  * `aggregate(zip_with(a, b, *), 0.0, +)` is semantically right but runs
  * on the interpreted higher-order-function path — per element it builds
  * a zipped entry and invokes a lambda. At 10⁶ kNN candidate pairs × 64
  * dims that interpreter overhead dominates the join. This expression
  * compiles to a primitive double loop inside whole-stage codegen.
  *
  * Summation is sequential left-to-right — bit-identical to the HOF fold
  * it replaces and to DuckDB's list arithmetic, so oracle parity holds.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"
  // null on length mismatch (below), regardless of child nullability
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    // length mismatch → NULL, matching the aggregate∘zip_with composition
    // this expression replaces (zip_with pads with nulls, which poison
    // the sum) — a silently-truncated dot would hide corrupt vectors
    if (x.numElements() != y.numElements()) null
    else {
      val n = x.numElements()
      var s = 0.0
      var i = 0
      while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
      s
    }
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $a.numElements(); $i++) {
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** All `numHashes` MinHash minima of a pre-hashed shingle array in ONE
  * array pass (vs. `numHashes` interpreted `array_min∘transform` passes):
  * for each element the i-th hash function is XXH64(baseHash, seed=i),
  * and a running minimum per function is kept in a local array. Output:
  * `array<long>` of length `numHashes`. */
case class MinHashes(child: Expression, numHashes: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(org.apache.spark.sql.types.LongType))
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "minhashes"

  override def nullSafeEval(in: Any): Any = {
    val xs = in.asInstanceOf[ArrayData]
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var e = 0
    while (e < xs.numElements()) {
      val h = xs.getLong(e)
      var i = 0
      while (i < numHashes) {
        val v = XXH64.hashLong(h, i.toLong)
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      e += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val mins = ctx.freshName("mins")
      val e = ctx.freshName("e")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val xxh = classOf[XXH64].getName
      s"""
         |long[] $mins = new long[$numHashes];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $e = 0; $e < $in.numElements(); $e++) {
         |  long $h = $in.getLong($e);
         |  for (int $i = 0; $i < $numHashes; $i++) {
         |    long $v = $xxh.hashLong($h, (long) $i);
         |    if ($v < $mins[$i]) $mins[$i] = $v;
         |  }
         |}
         |${ev.value} =
         |  org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Hashes of all `n`-token shingles from a pre-hashed token array: the
  * shingle hash is an XXH64 chain over the n consecutive token hashes —
  * no shingle STRING is ever materialized. At web scale the dominant
  * MinHash cost is exactly that string churn (slice + concat per
  * shingle); combining token hashes is pure integer work in one pass.
  * Output length max(0, numTokens − n + 1). */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(org.apache.spark.sql.types.LongType))
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(in: Any): Any = {
    val xs = in.asInstanceOf[ArrayData]
    val m = xs.numElements() - n + 1
    if (m <= 0) {
      org.apache.spark.sql.catalyst.util.ArrayData
        .toArrayData(Array.empty[Long])
    } else {
      val out = new Array[Long](m)
      var i = 0
      while (i < m) {
        var h = 42L
        var j = 0
        while (j < n) { h = XXH64.hashLong(xs.getLong(i + j), h); j += 1 }
        out(i) = h
        i += 1
      }
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val m = ctx.freshName("m")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val xxh = classOf[XXH64].getName
      s"""
         |int $m = $in.numElements() - $n + 1;
         |if ($m < 0) $m = 0;
         |long[] $out = new long[$m];
         |for (int $i = 0; $i < $m; $i++) {
         |  long $h = 42L;
         |  for (int $j = 0; $j < $n; $j++) {
         |    $h = $xxh.hashLong($in.getLong($i + $j), $h);
         |  }
         |  $out[$i] = $h;
         |}
         |${ev.value} =
         |  org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** 64-bit SimHash of a pre-hashed token array in one pass: per bit, sum
  * +1/−1 over all token hashes; fingerprint bit = sign of the sum.
  * Near-duplicate texts differ in few bits (small Hamming distance). */
case class SimHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(org.apache.spark.sql.types.LongType))
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(in: Any): Any = {
    val xs = in.asInstanceOf[ArrayData]
    val counts = new Array[Int](64)
    var e = 0
    while (e < xs.numElements()) {
      val h = xs.getLong(e)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) counts(i) += 1 else counts(i) -= 1
        i += 1
      }
      e += 1
    }
    var fp = 0L
    var i = 0
    while (i < 64) { if (counts(i) > 0) fp |= (1L << i); i += 1 }
    fp
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val counts = ctx.freshName("counts")
      val e = ctx.freshName("e")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val fp = ctx.freshName("fp")
      s"""
         |int[] $counts = new int[64];
         |for (int $e = 0; $e < $in.numElements(); $e++) {
         |  long $h = $in.getLong($e);
         |  for (int $i = 0; $i < 64; $i++) {
         |    if ((($h >>> $i) & 1L) == 1L) $counts[$i]++; else $counts[$i]--;
         |  }
         |}
         |long $fp = 0L;
         |for (int $i = 0; $i < 64; $i++) {
         |  if ($counts[$i] > 0) $fp |= (1L << $i);
         |}
         |${ev.value} = $fp;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Top-`k` IVF cells (indices of the `k` largest dot products against the
  * centroid matrix) for an `array<double>` vector — ties break to the
  * lower cell id; a vector whose length mismatches the centroids yields
  * an EMPTY array (loud-empty, like `signBucket`'s NULL bucket).
  *
  * The centroid matrix rides a Spark `Broadcast`, NOT codegen literals:
  * generated-code size stays O(1) regardless of cell count (literal
  * centroids capped nCells at ~hundreds before Janino degraded — the
  * round-2 scale ceiling), the matrix ships to each executor once via
  * torrent broadcast instead of once per task closure, and 10⁴–10⁵ cells
  * — what real IVF needs at 100 TB — are just a bigger broadcast. The
  * scoring loop lives in [[TopCells.topCells]] (compiled Scala, JIT'd);
  * the generated code only invokes it, so the expression stays inside
  * whole-stage codegen without Janino ever seeing the O(nCells·dim)
  * arithmetic. */
case class TopCells(child: Expression,
                    centroids: Broadcast[Array[Array[Double]]], k: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType))
  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "top_cells"

  override def nullSafeEval(in: Any): Any =
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      TopCells.topCells(in.asInstanceOf[ArrayData], centroids.value, k))

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val bc = ctx.addReferenceObj("centroidsBc", centroids,
        classOf[Broadcast[_]].getName)
      // the unwrap + double[][] cast happens inside compiled Scala
      // (topCellsBc): Janino cannot parse a 2-D array cast ("unexpected
      // token [ in primary") and would silently demote the WHOLE
      // projection to interpreter mode — the exact fallback this
      // expression exists to avoid
      s"""
         |${ev.value} =
         |  org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
         |    org.apache.spark.sql.graftfns.TopCells.topCellsBc(
         |      $in, $bc, $k));
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object TopCells {
  /** Codegen entry point: unwraps the broadcast and performs the 2-D
    * array cast in compiled Scala (Janino cannot parse `(double[][])`). */
  def topCellsBc(vec: ArrayData, bc: Broadcast[_], k: Int): Array[Int] =
    topCells(vec, bc.value.asInstanceOf[Array[Array[Double]]], k)

  /** Indices of the `k` centroids with the largest dot products against
    * `vec`, ordered (dot desc, cell asc); strict-inequality insertion so
    * dot ties keep the lower cell — the deterministic tie rule every IVF
    * consumer (cell assignment, probe cell choice) shares. */
  def topCells(vec: ArrayData, cents: Array[Array[Double]],
               k: Int): Array[Int] = {
    val n = vec.numElements()
    if (cents.length == 0 || cents(0).length != n) return Array.emptyIntArray
    val kk = math.min(k, cents.length)
    val bestDot = new Array[Double](kk)
    val bestCell = new Array[Int](kk)
    java.util.Arrays.fill(bestDot, Double.NegativeInfinity)
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      var s = 0.0
      var i = 0
      while (i < n) { s += vec.getDouble(i) * cent(i); i += 1 }
      if (s > bestDot(kk - 1)) {
        var pos = kk - 1
        while (pos > 0 && bestDot(pos - 1) < s) {
          bestDot(pos) = bestDot(pos - 1)
          bestCell(pos) = bestCell(pos - 1)
          pos -= 1
        }
        bestDot(pos) = s
        bestCell(pos) = c
      }
      c += 1
    }
    java.util.Arrays.copyOf(bestCell, kk)
  }
}

/** Multi-table sign-LSH bucket ids for an `array<double>` vector: for
  * table t, bit i of the signature is `dot(vec, plane_{t,i}) > 0`, and
  * the bucket id is `signature + (t << 32)` (table-disambiguated, so all
  * tables share one explode + one equi-join key space). Output:
  * `array<long>` of length `nTables`; a vector whose length differs from
  * `dim` yields an EMPTY array — its rows then produce no candidates
  * (loud-empty, like [[TopCells]]).
  *
  * The hyperplanes are NOT codegen literals and NOT shipped at all: they
  * are a pure function of `(nTables, bits, dim, seed)`, regenerated
  * deterministically on each executor JVM and memoized
  * ([[SignBuckets.planes]]). The `typedLit` form this replaces embedded
  * O(nTables·bits·dim) doubles into the generated source — at the
  * collision-model dedup params for τ=0.9 (57 tables × 14 bits × 64
  * dims ≈ 51k literals) Janino's 64KB method limit forced an interpreted
  * fallback, the same scale ceiling round 2 flagged for IVF centroids.
  * Here the generated code is O(1) and the per-row work is a compiled
  * Scala loop, so bits/nTables scale to whatever the collision model
  * asks for. */
case class SignBuckets(child: Expression, nTables: Int, bits: Int,
                       dim: Int, seed: Long)
    extends UnaryExpression with ExpectsInputTypes {
  require(nTables > 0 && bits > 0 && bits <= 31 && dim > 0,
    s"need nTables ($nTables) > 0, 0 < bits ($bits) <= 31, dim ($dim) > 0")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType))
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "sign_buckets"

  override def nullSafeEval(in: Any): Any =
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      SignBuckets.buckets(in.asInstanceOf[ArrayData],
        nTables, bits, dim, seed))

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      s"""
         |${ev.value} =
         |  org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
         |    org.apache.spark.sql.graftfns.SignBuckets.buckets(
         |      $in, $nTables, $bits, $dim, ${seed}L));
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object SignBuckets {
  /** Per-JVM memo of the deterministic hyperplane family — regenerating
    * ~nTables·bits·dim gaussians per task would dominate small tasks. */
  private val planeCache = new java.util.concurrent.ConcurrentHashMap[
    (Int, Int, Int, Long), Array[Array[Double]]]

  /** Hyperplanes for all tables, flattened `[t * bits + i][dim]`. Table
    * t's planes come from `Random(seed + t)` in generation order —
    * bit-identical to the driver-side `TextSim.hyperplanes(bits, dim,
    * seed + t)` family the literal form used, so bucket ids (and every
    * seeded recall result pinned on them) are unchanged. */
  def planes(nTables: Int, bits: Int, dim: Int,
             seed: Long): Array[Array[Double]] =
    planeCache.computeIfAbsent((nTables, bits, dim, seed), _ => {
      val out = new Array[Array[Double]](nTables * bits)
      var t = 0
      while (t < nTables) {
        val rnd = new scala.util.Random(seed + t)
        var i = 0
        while (i < bits) {
          val p = new Array[Double](dim)
          var j = 0
          while (j < dim) { p(j) = rnd.nextGaussian(); j += 1 }
          out(t * bits + i) = p
          i += 1
        }
        t += 1
      }
      out
    })

  /** All `nTables` bucket ids of `vec`; empty on dimension mismatch.
    * Dot products accumulate left-to-right like [[DotProduct]], so the
    * sign (hence the bucket) matches the expression form exactly. */
  def buckets(vec: ArrayData, nTables: Int, bits: Int, dim: Int,
              seed: Long): Array[Long] = {
    if (vec.numElements() != dim) return Array.emptyLongArray
    val ps = planes(nTables, bits, dim, seed)
    val out = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var sig = 0L
      var i = 0
      while (i < bits) {
        val p = ps(t * bits + i)
        var s = 0.0
        var j = 0
        while (j < dim) { s += vec.getDouble(j) * p(j); j += 1 }
        if (s > 0) sig |= (1L << i)
        i += 1
      }
      out(t) = sig + (t.toLong << 32)
      t += 1
    }
    out
  }
}

object VectorFunctions {
  /** Codegen'd dot product of two `array<double>` columns. */
  def dot_product(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProduct(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** One-pass MinHash minima over a pre-hashed (`array<long>`) shingle
    * column. */
  def minhashes(hashes: Column, numHashes: Int): Column =
    ExpressionUtils.column(MinHashes(
      ExpressionUtils.expression(hashes), numHashes))

  /** One-pass 64-bit SimHash over a pre-hashed (`array<long>`) token
    * column. */
  def simhash64(hashes: Column): Column =
    ExpressionUtils.column(SimHash64(ExpressionUtils.expression(hashes)))

  /** Rolling n-shingle hashes over a pre-hashed (`array<long>`) token
    * column — no shingle strings materialized. */
  def shingle_hashes(tokenHashes: Column, n: Int): Column =
    ExpressionUtils.column(ShingleHashes(
      ExpressionUtils.expression(tokenHashes), n))

  /** Top-`k` IVF cell ids for an `array<double>` vector against a
    * broadcast centroid matrix (codegen'd; see [[TopCells]]). */
  def top_cells(vec: Column, centroids: Broadcast[Array[Array[Double]]],
                k: Int): Column =
    ExpressionUtils.column(TopCells(
      ExpressionUtils.expression(vec), centroids, k))

  /** Multi-table sign-LSH bucket ids for an `array<double>` vector
    * (codegen'd, planes regenerated per-JVM from the seed; see
    * [[SignBuckets]]). */
  def sign_buckets(vec: Column, nTables: Int, bits: Int, dim: Int,
                   seed: Long): Column =
    ExpressionUtils.column(SignBuckets(
      ExpressionUtils.expression(vec), nTables, bits, dim, seed))
}
