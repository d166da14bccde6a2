package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native ADC (asymmetric distance computation) scoring for PQ codes:
  * the cosine between a query and a PQ reconstruction, computed as m
  * table lookups against the query's precomputed subspace
  * inner-product LUT — the product-quantization hot path (Jégou et
  * al. 2011) as ONE codegen'd scalar instead of a chain of
  * interpreted `aggregate(zip_with(...))` higher-order functions.
  *
  * Why native: on an IVF-PQ probe the code scan is the dominant
  * per-row work (everything else is the broadcast LUT build, |Q|-
  * scale). The HOF form allocates a lambda frame per element and
  * boxes every lookup; this expression is two flat array walks inside
  * whole-stage codegen. The centroid-norm table (the query-
  * independent half of the denominator) rides as a reference object
  * on the generated class — codebook-sized, never per-row.
  *
  * Numerics are IDENTICAL to the HOF form: same left-to-right
  * double additions over the same m lookups, so scores are
  * bit-identical (spec-pinned) and the re-rank contracts carry over.
  */
object PqAdcImpl {
  /** ip(codes)/ (qnorm · sqrt(Σ‖cent‖²)) over m lookups; `lut` is the
    * per-query m×k table, `normSq` the codebook's m×k ‖cent‖² table. */
  def cosine(codes: ArrayData, lut: ArrayData,
      normSq: Array[Array[Double]], qnorm: Double): Double = {
    val m = codes.numElements()
    // dim contract up front (mirrors the encode-path guard): codes
    // persisted under a smaller-m codebook would otherwise score the
    // cosine of a PREFIX reconstruction — wrong but plausible-looking
    if (m != normSq.length)
      throw new IllegalArgumentException(
        s"graft_pq_adc: codes have $m subspaces, codebook expects ${normSq.length}")
    var ip = 0.0
    var ns = 0.0
    var i = 0
    while (i < m) {
      val c = codes.getInt(i)
      val row = normSq(i)
      if (c < 0 || c >= row.length)
        throw new IllegalArgumentException(
          s"graft_pq_adc: code $c out of range for k=${row.length} (subspace $i)")
      ip += lut.getArray(i).getDouble(c)
      ns += row(c)
      i += 1
    }
    ip / (qnorm * math.sqrt(ns))
  }
}

/** `graft_pq_adc(pq_codes array<int>, lut array<array<double>>,
  * qnorm double) -> double` with the codebook's ‖cent‖² table bound
  * at plan time. */
case class PqAdcCosine(
    codes: Expression,
    lut: Expression,
    qnorm: Expression,
    normSq: Array[Array[Double]])
    extends TernaryExpression {

  override def first: Expression = codes
  override def second: Expression = lut
  override def third: Expression = qnorm

  override def checkInputDataTypes(): TypeCheckResult =
    (codes.dataType, lut.dataType, qnorm.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(ArrayType(DoubleType, _), _), DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"graft_pq_adc expects (array<int>, array<array<double>>, double), got ($a, $b, $c)")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_pq_adc"

  override protected def nullSafeEval(cd: Any, lt: Any, qn: Any): Any =
    PqAdcImpl.cosine(cd.asInstanceOf[ArrayData], lt.asInstanceOf[ArrayData],
      normSq, qn.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the norm table is a reference object on the generated class —
    // one instance per task, shared across rows
    val nsRef = ctx.addReferenceObj("pqNormSq", normSq, "double[][]")
    defineCodeGen(ctx, ev, (cd, lt, qn) =>
      s"graft.functions.PqAdcImpl.cosine($cd, $lt, $nsRef, $qn)")
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(codes = f, lut = s, qnorm = t)
}

/** Native PQ encoding: `codes[mi] = argmin_c ‖sub_mi − cent_mi,c‖²`
  * over the codebook bound at plan time — the other PQ hot path.
  * Encoding is what an index BUILD pays over the whole corpus (and
  * every append pays over its batch), so at 100 TB this is the
  * dominant per-row work of the `pq` stage. Numerics match the HOF
  * form exactly: double-widened element arithmetic, left-to-right
  * accumulation, first-index argmin under strict `<`. */
object PqEncodeImpl {
  def encode(v: ArrayData, isFloat: Boolean,
      cents: Array[Array[Array[Float]]], subDim: Int): ArrayData = {
    val m = cents.length
    // dim contract up front: an unchecked read past a short vector's
    // end would silently emit garbage codes into a persisted code
    // table (UnsafeArrayData does not bounds-check) — review finding
    if (v.numElements() != m * subDim)
      throw new IllegalArgumentException(
        s"graft_pq_encode: vector has ${v.numElements()} elements, " +
          s"codebook expects ${m * subDim} (m=$m × subDim=$subDim)")
    val out = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      val cb = cents(mi)
      val base = mi * subDim
      var best = Double.PositiveInfinity
      var arg = 0
      var c = 0
      while (c < cb.length) {
        val cent = cb(c)
        var d = 0.0
        var j = 0
        while (j < subDim) {
          val x = (if (isFloat) v.getFloat(base + j).toDouble
                   else v.getDouble(base + j)) - cent(j).toDouble
          d += x * x
          j += 1
        }
        if (d < best) { best = d; arg = c }
        c += 1
      }
      out(mi) = arg
      mi += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** `graft_pq_encode(array<float|double>) -> array<int>` with the
  * codebook bound at plan time. */
case class PqEncodeCodes(
    child: Expression,
    cents: Array[Array[Array[Float]]],
    subDim: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_pq_encode expects array<float|double>, got $t")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_pq_encode"

  override protected def nullSafeEval(v: Any): Any =
    PqEncodeImpl.encode(v.asInstanceOf[ArrayData], isFloat, cents, subDim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("pqCents", cents, "float[][][]")
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.PqEncodeImpl.encode($v, $isFloat, $centsRef, $subDim)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object PqAdc {
  /** Column form of the native ADC cosine. */
  def cosine(codes: Column, lut: Column, qnorm: Column,
      normSq: Array[Array[Double]]): Column =
    ColumnBridge.column(PqAdcCosine(ColumnBridge.expression(codes),
      ColumnBridge.expression(lut), ColumnBridge.expression(qnorm), normSq))

  /** Column form of the native PQ encoder. */
  def encode(vec: Column, cents: Array[Array[Array[Float]]], subDim: Int): Column =
    ColumnBridge.column(PqEncodeCodes(ColumnBridge.expression(vec), cents, subDim))
}
