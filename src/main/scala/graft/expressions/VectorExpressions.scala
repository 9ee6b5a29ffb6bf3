package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Static, codegen-callable vector-math kernels. These are the per-row inner
 * loops of every similarity/dedup operator (sim1/sim2 ANN, d7 embedding
 * near-dup, LSH signatures) — the operators explicitly meant for the 100 TB
 * path. Implemented as primitive `while` loops over `ArrayData` so the JIT
 * compiles them flat: no per-element boxing, no higher-order-function
 * interpretation (the previous `zip_with`+`aggregate` Column formulation was
 * CodegenFallback — interpreted, one allocation per element, per row).
 */
object VecEval {

  /** Dot product, index-order accumulation. Null when lengths differ or any
    * element is null — the same result the HOF formulation produced. */
  def dot(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  private def l2(x: Array[Double], anyNull: Boolean): ArrayData = {
    val n = x.length
    // null elements poison the norm sum (null in the HOF version), and a
    // null/zero norm maps every element to 0.0 — zero vectors normalize to
    // zeros, never NaN, so their cosines are 0 and thresholds stay sane
    var ss = 0.0
    var i = 0
    while (i < n) { ss += x(i) * x(i); i += 1 }
    val norm = if (anyNull) 0.0 else math.sqrt(ss)
    val out = new Array[Double](n)
    if (norm > 0) {
      i = 0
      while (i < n) { out(i) = x(i) / norm; i += 1 }
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  def l2normD(v: ArrayData): ArrayData = {
    val n = v.numElements()
    val x = new Array[Double](n)
    var anyNull = false
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) anyNull = true else x(i) = v.getDouble(i)
      i += 1
    }
    l2(x, anyNull)
  }

  def l2normF(v: ArrayData): ArrayData = {
    val n = v.numElements()
    val x = new Array[Double](n)
    var anyNull = false
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) anyNull = true else x(i) = v.getFloat(i).toDouble
      i += 1
    }
    l2(x, anyNull)
  }

  def l2normI(v: ArrayData): ArrayData = {
    val n = v.numElements()
    val x = new Array[Double](n)
    var anyNull = false
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) anyNull = true else x(i) = v.getInt(i).toDouble
      i += 1
    }
    l2(x, anyNull)
  }

  def l2normL(v: ArrayData): ArrayData = {
    val n = v.numElements()
    val x = new Array[Double](n)
    var anyNull = false
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) anyNull = true else x(i) = v.getLong(i).toDouble
      i += 1
    }
    l2(x, anyNull)
  }

  /**
   * Product-quantization encode: subspace `mi` covers dimensions
   * `[mi·dsub, (mi+1)·dsub)`; its code is the 0-based argmin squared-L2
   * codebook row over that slice (first/lowest code wins exact ties —
   * and ties ARE exact cross-engine because the fold runs in ascending
   * dimension order). Codebook rows are FULL-length vectors indexed at
   * the same offsets, so codebooks built from sample vectors need no
   * pre-slicing. Missing dimensions (short row or book) drop out of the
   * overlap, matching [[nearestCentroid]]'s prefix rule.
   */
  def pqEncode(v: ArrayData, books: Array[Array[Array[Double]]], dsub: Int): ArrayData = {
    val out = new Array[Int](books.length)
    var mi = 0
    while (mi < books.length) {
      val off = mi * dsub
      val book = books(mi)
      var best = 0
      var bestD = Double.PositiveInfinity
      var k = 0
      while (k < book.length) {
        val c = book(k)
        val n = math.min(off + dsub, math.min(c.length, v.numElements()))
        var d = 0.0
        var i = off
        while (i < n) { val t = v.getDouble(i) - c(i); d += t * t; i += 1 }
        if (d < bestD) { bestD = d; best = k }
        k += 1
      }
      out(mi) = best
      mi += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /**
   * Asymmetric-distance computation over PQ codes: `tables(q)(mi)(code)`
   * holds query q's squared-L2 distance to codebook row `code` in
   * subspace `mi`; a row's approximate distance to q is the
   * ascending-`mi` sequential sum of its code lookups (order fixed so an
   * oracle's ordered fold reproduces every bit). Returns one distance
   * per query — the whole query set is answered in a single pass over
   * the codes column.
   */
  def pqAdcDists(codes: ArrayData, tables: Array[Array[Array[Double]]]): ArrayData = {
    val out = new Array[Double](tables.length)
    var q = 0
    while (q < tables.length) {
      val tab = tables(q)
      val m = math.min(codes.numElements(), tab.length)
      var d = 0.0
      var mi = 0
      while (mi < m) { d += tab(mi)(codes.getInt(mi)); mi += 1 }
      out(q) = d
      q += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /**
   * Scaled matrix–vector product: `out(r) = scale · Σ_i m(r)(i)·v(i)`,
   * each row an ascending-index sequential fold (an oracle's ordered
   * fold reproduces every bit). Rows and the vector overlap-prefix like
   * [[nearestCentroid]].
   */
  def matvec(v: ArrayData, m: Array[Array[Double]], scale: Double): ArrayData = {
    val out = new Array[Double](m.length)
    var r = 0
    while (r < m.length) {
      val row = m(r)
      val n = math.min(row.length, v.numElements())
      var s = 0.0
      var i = 0
      while (i < n) { s += row(i) * v.getDouble(i); i += 1 }
      out(r) = s * scale
      r += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /**
   * Int8-style scalar quantization: `code(d) = floor((x_d − min_d)·255 /
   * (max_d − min_d) + 0.5)` clamped to [0, 255]; a zero-range dimension
   * codes 0. The exact op sequence (subtract, ·255, divide, +0.5, floor,
   * clamp) is the contract an oracle replays. Dims = the overlapping
   * prefix of (v, mins).
   */
  def sqEncode(v: ArrayData, mins: Array[Double], maxs: Array[Double]): ArrayData = {
    val n = math.min(v.numElements(), mins.length)
    val out = new Array[Int](n)
    var d = 0
    while (d < n) {
      val range = maxs(d) - mins(d)
      out(d) =
        if (range == 0.0) 0
        else {
          val c = math.floor((v.getDouble(d) - mins(d)) * 255.0 / range + 0.5)
          math.min(math.max(c, 0.0), 255.0).toInt
        }
      d += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** 0-based index of the max-dot-product centroid; first (lowest index)
    * wins ties. Rows shorter/longer than a centroid use the overlapping
    * prefix. Requires non-null elements (feed it [[VecL2Norm]] output). */
  def nearestCentroid(v: ArrayData, cents: Array[Array[Double]]): Int = {
    val x = v.toDoubleArray()
    var best = 0
    var bestSim = Double.NegativeInfinity
    var ci = 0
    while (ci < cents.length) {
      val c = cents(ci)
      val n = math.min(x.length, c.length)
      var s = 0.0
      var i = 0
      while (i < n) { s += x(i) * c(i); i += 1 }
      if (s > bestSim) { bestSim = s; best = ci }
      ci += 1
    }
    best
  }
}

/** Cosine/dot kernel: `array<double> × array<double> → double`. */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_vec_dot requires two ARRAY<DOUBLE> inputs, got ${l.sql} and ${r.sql}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecEval.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("dotRes")
      s"""
         |java.lang.Double $tmp = graft.expressions.VecEval.dot($a, $b);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** L2 normalization: numeric array → `array<double>` with unit norm (zero
  * vectors and null-poisoned vectors normalize to all-zeros). */
case class VecL2Norm(child: Expression) extends UnaryExpression {

  private def kernel: String = child.dataType match {
    case ArrayType(FloatType, _)   => "l2normF"
    case ArrayType(IntegerType, _) => "l2normI"
    case ArrayType(LongType, _)    => "l2normL"
    case _                         => "l2normD"
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType | FloatType | IntegerType | LongType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_vec_l2norm requires a numeric ARRAY input, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_vec_l2norm"

  override protected def nullSafeEval(input: Any): Any = kernel match {
    case "l2normF" => VecEval.l2normF(input.asInstanceOf[ArrayData])
    case "l2normI" => VecEval.l2normI(input.asInstanceOf[ArrayData])
    case "l2normL" => VecEval.l2normL(input.asInstanceOf[ArrayData])
    case _         => VecEval.l2normD(input.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.VecEval.$kernel($c)")

  override protected def withNewChildInternal(newChild: Expression): VecL2Norm =
    copy(child = newChild)
}

/**
 * IVF assignment kernel: 0-based index of the nearest centroid by dot
 * product (== cosine when both sides are L2-normalized). The centroid matrix
 * rides along as an opaque reference object — injected into generated code
 * via `addReferenceObj`, so the plan tree stays constant-size no matter how
 * many centroids there are (a `typedlit` of the matrix previously ballooned
 * the plan past 100 KB and made every optimizer pass pay for it).
 */
case class NearestCentroidIdx(child: Expression, cents: Array[Array[Double]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_nearest_centroid requires ARRAY<DOUBLE> input, got ${t.sql}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_nearest_centroid"

  override protected def nullSafeEval(input: Any): Any =
    VecEval.nearestCentroid(input.asInstanceOf[ArrayData], cents)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", cents, "double[][]")
    defineCodeGen(ctx, ev, c => s"graft.expressions.VecEval.nearestCentroid($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroidIdx =
    copy(child = newChild)
}

/** Scaled matvec kernel: `array<double> → array<double>`
  * ([[VecEval.matvec]]); the matrix rides as a reference object. */
case class MatVecExpr(child: Expression, m: Array[Array[Double]], scale: Double)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_matvec requires ARRAY<DOUBLE> input, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_matvec"

  override protected def nullSafeEval(input: Any): Any =
    VecEval.matvec(input.asInstanceOf[ArrayData], m, scale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("matvecM", m, "double[][]")
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.VecEval.matvec($c, $ref, ${scale}D)")
  }

  override protected def withNewChildInternal(newChild: Expression): MatVecExpr =
    copy(child = newChild)
}

/** Scalar-quantization kernel: `array<double> → array<int>` of per-dim
  * uint8 codes ([[VecEval.sqEncode]]); min/max arrays ride as reference
  * objects. */
case class SqEncodeExpr(child: Expression, mins: Array[Double],
    maxs: Array[Double]) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_sq_encode requires ARRAY<DOUBLE> input, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_sq_encode"

  override protected def nullSafeEval(input: Any): Any =
    VecEval.sqEncode(input.asInstanceOf[ArrayData], mins, maxs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mn = ctx.addReferenceObj("sqMins", mins, "double[]")
    val mx = ctx.addReferenceObj("sqMaxs", maxs, "double[]")
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.VecEval.sqEncode($c, $mn, $mx)")
  }

  override protected def withNewChildInternal(newChild: Expression): SqEncodeExpr =
    copy(child = newChild)
}

/** PQ encode kernel: `array<double> → array<int>` of per-subspace codes
  * ([[VecEval.pqEncode]]). The codebook tensor rides as a reference object
  * (the [[NearestCentroidIdx]] plan-size discipline). */
case class PqEncodeExpr(child: Expression, books: Array[Array[Array[Double]]],
    dsub: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_pq_encode requires ARRAY<DOUBLE> input, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_pq_encode"

  override protected def nullSafeEval(input: Any): Any =
    VecEval.pqEncode(input.asInstanceOf[ArrayData], books, dsub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqBooks", books, "double[][][]")
    defineCodeGen(ctx, ev, c => s"graft.expressions.VecEval.pqEncode($c, $ref, $dsub)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncodeExpr =
    copy(child = newChild)
}

/** ADC kernel: `array<int>` codes → `array<double>` of approximate
  * distances, one per query table ([[VecEval.pqAdcDists]]). */
case class PqAdcDistsExpr(child: Expression, tables: Array[Array[Array[Double]]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_pq_adc requires ARRAY<INT> input, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_pq_adc"

  override protected def nullSafeEval(input: Any): Any =
    VecEval.pqAdcDists(input.asInstanceOf[ArrayData], tables)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("adcTables", tables, "double[][][]")
    defineCodeGen(ctx, ev, c => s"graft.expressions.VecEval.pqAdcDists($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqAdcDistsExpr =
    copy(child = newChild)
}

object VectorExpressions {
  /** SQL registrations for the binary/unary kernels (the centroid kernel is
    * Column-API-only — its matrix argument is not SQL-expressible). */
  def registryEntries: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_vec_dot",
      new ExpressionInfo(classOf[VecDot].getName, "graft_vec_dot"),
      { children: Seq[Expression] =>
        if (children.length != 2)
          throw new IllegalArgumentException(
            s"graft_vec_dot expects exactly 2 arguments, got ${children.length}")
        VecDot(children(0), children(1))
      }),
    ("graft_vec_l2norm",
      new ExpressionInfo(classOf[VecL2Norm].getName, "graft_vec_l2norm"),
      { children: Seq[Expression] =>
        if (children.length != 1)
          throw new IllegalArgumentException(
            s"graft_vec_l2norm expects exactly 1 argument, got ${children.length}")
        VecL2Norm(children.head)
      }))
}
