package org.apache.spark.sql.graftfns

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, IntegerType, StructField, StructType}

/** Codegen'd quantization hot path (graft engine; see
  * VectorExpressions.scala for the shim-package rationale).
  *
  * Why custom expressions (SURVEY.md §7.3 ladder): the higher-order
  * built-ins these replace — `transform(v, x -> floor(x·s + 0.5))` and
  * `aggregate(zip_with(lut, codes, ...), 0.0, +)` — are semantically
  * right but run on the INTERPRETED lambda path (HigherOrderFunction is
  * CodegenFallback): per element they allocate a lambda frame and box
  * the value. Encoding a 100 TB embedding corpus or ADC-scoring 10⁹
  * candidates pays that interpreter tax on every coordinate; these
  * compile to primitive loops inside whole-stage codegen.
  *
  * Arithmetic is IDENTICAL to the HOF formulations (same op order, same
  * floor-half-up), so DuckDB oracle parity is unchanged.
  */

/** One-pass int8 symmetric quantization of an `array<double>` vector:
  * scale = 127 / max(|x|, 1e-30), code_i = ⌊x_i·scale + 0.5⌋. Returns
  * `struct<codes: array<int>, scale: double>` — one traversal computes
  * both, so the two-projection CollapseProject dance the HOF version
  * needed (to avoid re-evaluating max|x| per element) disappears. */
case class QuantizeInt8(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType))
  override def dataType: DataType = StructType(Seq(
    StructField("codes", ArrayType(IntegerType, containsNull = false),
      nullable = false),
    StructField("scale", DoubleType, nullable = false)))
  override def prettyName: String = "quantize_int8"

  override def nullSafeEval(in: Any): Any =
    QuantizeInt8.quantize(in.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => s"""
       |${ev.value} =
       |  org.apache.spark.sql.graftfns.QuantizeInt8.quantize($in);
     """.stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object QuantizeInt8 {
  /** Compiled two-loop kernel: pass 1 max|x|, pass 2 codes. Same
    * float→double widening and floor-half-up as the HOF pipeline (and
    * the DuckDB oracle), so codes are bit-identical. */
  def quantize(v: ArrayData): InternalRow = {
    val n = v.numElements()
    var maxAbs = 1e-30 // zero-vector guard, as in the HOF formulation
    var i = 0
    while (i < n) {
      val a = math.abs(v.getDouble(i))
      if (a > maxAbs) maxAbs = a
      i += 1
    }
    val scale = 127.0 / maxAbs
    val codes = new Array[Int](n)
    i = 0
    while (i < n) {
      codes(i) = math.floor(v.getDouble(i) * scale + 0.5).toInt
      i += 1
    }
    new GenericInternalRow(
      Array[Any](ArrayData.toArrayData(codes), scale))
  }
}

/** Asymmetric-distance (ADC) score of a PQ code vector against a
  * per-probe lookup table: `Σ_m lut(m)(codes(m))`. The lut is a plain
  * driver-built array carried as a reference object into the generated
  * code (the TopCells pattern) — no per-row literal array construction,
  * no lambda frames. NULL (loud, not truncated) when the code vector's
  * length differs from the lut's, a code is out of range, or a code
  * element is null — a corrupt code must not silently score. */
case class AdcScore(child: Expression, lut: Array[Array[Double]])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(IntegerType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "adc_score"
  override def nullable: Boolean = true

  override def nullSafeEval(in: Any): Any =
    AdcScore.score(in.asInstanceOf[ArrayData], lut)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      // reference typed as Object: the natural class name of a 2-D array
      // is the descriptor "[[D", which Janino cannot parse as a cast —
      // the silent-interpreter-fallback bug; scoreObj casts in Scala
      val lutRef = ctx.addReferenceObj("adcLut", lut,
        classOf[Object].getName)
      val boxed = ctx.freshName("boxed")
      s"""
         |Object $boxed =
         |  org.apache.spark.sql.graftfns.AdcScore.scoreObj($in, $lutRef);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((java.lang.Double) $boxed).doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object AdcScore {
  /** Codegen entry point: performs the 2-D array cast in compiled Scala
    * (Janino cannot parse the `[[D` cast the typed reference would
    * need). */
  def scoreObj(codes: ArrayData, lut: AnyRef): java.lang.Double =
    score(codes, lut.asInstanceOf[Array[Array[Double]]])

  /** Boxed so the out-of-contract cases can return null (see class
    * doc); the loop itself is primitive. */
  def score(codes: ArrayData, lut: Array[Array[Double]]): java.lang.Double = {
    val m = codes.numElements()
    if (m != lut.length) return null
    var s = 0.0
    var i = 0
    while (i < m) {
      // null code elements can reach here (encode's try_element_at yields
      // NULL on a dim/codebook mismatch); ArrayData.getInt on a null slot
      // reads garbage, so they must NULL the score, not silently score 0
      if (codes.isNullAt(i)) return null
      val c = codes.getInt(i)
      if (c < 0 || c >= lut(i).length) return null
      s += lut(i)(c)
      i += 1
    }
    s
  }
}

/** All token hashes of an `array<string>` column in one compiled pass —
  * the input stage of every hash-family pipeline (MinHash shingles,
  * SimHash fingerprints). Replaces `transform(tokens, x => xxhash64(x))`:
  * ArrayTransform is CodegenFallback, so that formulation pays an
  * interpreted lambda per TOKEN of every document. Hash values are
  * bit-identical — both call XxHash64Function.hash(UTF8String,
  * StringType, seed=42), Spark's own `xxhash64()` kernel — which the
  * equivalence spec pins. Null tokens (impossible from `split`, the only
  * producer) hash like `xxhash64(null)` folds: the seed is returned
  * unchanged, keeping the expression total. */
case class TokenHashes(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(org.apache.spark.sql.types.StringType))
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "token_hashes"

  override def nullSafeEval(in: Any): Any =
    TokenHashes.hashAll(in.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => s"""
       |${ev.value} =
       |  org.apache.spark.sql.graftfns.TokenHashes.hashAll($in);
     """.stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object TokenHashes {
  import org.apache.spark.sql.catalyst.expressions.XxHash64Function
  import org.apache.spark.sql.types.StringType

  def hashAll(tokens: ArrayData): ArrayData = {
    val n = tokens.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) =
        if (tokens.isNullAt(i)) 42L // xxhash64 seed, see class doc
        else XxHash64Function.hash(tokens.getUTF8String(i), StringType, 42L)
      i += 1
    }
    ArrayData.toArrayData(out)
  }
}

/** Adjacent-token bigram strings of an `array<string>` column in one
  * compiled pass — the co-occurrence input unit (q_text_cooccur).
  * Replaces `transform(sequence(0, n−2), i -> concat_ws(' ',
  * slice(w, i+1, 2)))` (the [[graft.ops.TextSim.shingles]] n=2 path):
  * ArrayTransform is CodegenFallback, so that formulation pays an
  * interpreted lambda frame + a slice allocation PER BIGRAM of every
  * document. Semantics are pinned equal to shingles(text, 2) by
  * CurationSpec: fewer than 2 tokens → empty array; null tokens
  * (impossible from `split`, the only producer) follow concat_ws's
  * skip-null rule so the expression stays total. */
case class TokenBigrams(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  import org.apache.spark.sql.types.StringType

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType))
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "token_bigrams"

  override def nullSafeEval(in: Any): Any =
    TokenBigrams.bigrams(in.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => s"""
       |${ev.value} =
       |  org.apache.spark.sql.graftfns.TokenBigrams.bigrams($in);
     """.stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object TokenBigrams {
  import org.apache.spark.unsafe.types.UTF8String

  private val space = UTF8String.fromString(" ")

  def bigrams(tokens: ArrayData): ArrayData = {
    val n = tokens.numElements()
    if (n < 2) return ArrayData.toArrayData(Array.empty[UTF8String])
    val out = new Array[UTF8String](n - 1)
    var i = 0
    while (i < n - 1) {
      val a = if (tokens.isNullAt(i)) null else tokens.getUTF8String(i)
      val b = if (tokens.isNullAt(i + 1)) null
        else tokens.getUTF8String(i + 1)
      // concat_ws(" ", a, b) semantics: nulls are skipped, not joined
      out(i) =
        if (a == null && b == null) UTF8String.EMPTY_UTF8
        else if (a == null) b
        else if (b == null) a
        else UTF8String.concat(a, space, b)
      i += 1
    }
    ArrayData.toArrayData(out)
  }
}

/** Word n-gram shingles joined by single spaces — [[TokenBigrams]]
  * generalized to arbitrary n (the dedup-span / decontamination unit).
  * Equivalent to `transform(sequence(0, size(w)-n), i -> concat_ws(" ",
  * slice(w, i+1, n)))` but codegen'd: the HOF form is CodegenFallback
  * and allocates a lambda frame + array slice per gram — the same
  * interpreter tax that made q_text_boilerplate superlinear before the
  * bigram kernel swap. Arrays shorter than n yield an empty gram set
  * (mirrors the DuckDB oracle's `range(0, greatest(len-n+1, 0))`). */
case class TokenNgrams(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  import org.apache.spark.sql.types.StringType
  require(n >= 1, s"token_ngrams: n must be >= 1, got $n")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType))
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "token_ngrams"

  override def nullSafeEval(in: Any): Any =
    TokenNgrams.ngrams(in.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => s"""
       |${ev.value} =
       |  org.apache.spark.sql.graftfns.TokenNgrams.ngrams($in, $n);
     """.stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object TokenNgrams {
  import org.apache.spark.unsafe.types.UTF8String

  private val space = UTF8String.fromString(" ")

  def ngrams(tokens: ArrayData, n: Int): ArrayData = {
    val len = tokens.numElements()
    if (len < n) return ArrayData.toArrayData(Array.empty[UTF8String])
    val out = new Array[UTF8String](len - n + 1)
    var i = 0
    while (i < len - n + 1) {
      // concat_ws(" ", ...) semantics: null tokens are skipped, not
      // joined — mirrors DuckDB array_to_string
      var parts = List.empty[UTF8String]
      var j = i + n - 1
      while (j >= i) {
        if (!tokens.isNullAt(j)) parts = tokens.getUTF8String(j) :: parts
        j -= 1
      }
      out(i) =
        if (parts.isEmpty) UTF8String.EMPTY_UTF8
        else UTF8String.concatWs(space, parts: _*)
      i += 1
    }
    ArrayData.toArrayData(out)
  }
}

/** Column wrappers (same bridge as [[VectorFunctions]]). */
object QuantFunctions {
  def quantize_int8(vec: Column): Column =
    ExpressionUtils.column(QuantizeInt8(ExpressionUtils.expression(vec)))

  def adc_score(codes: Column, lut: Array[Array[Double]]): Column =
    ExpressionUtils.column(AdcScore(ExpressionUtils.expression(codes), lut))

  def token_hashes(tokens: Column): Column =
    ExpressionUtils.column(TokenHashes(ExpressionUtils.expression(tokens)))

  def token_bigrams(tokens: Column): Column =
    ExpressionUtils.column(TokenBigrams(ExpressionUtils.expression(tokens)))

  def token_ngrams(tokens: Column, n: Int): Column =
    ExpressionUtils.column(
      TokenNgrams(ExpressionUtils.expression(tokens), n))
}
