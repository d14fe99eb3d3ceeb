package org.apache.spark.sql.graftfns

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

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
}
