package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/**
 * Data-layout curve kernels. The Hilbert transform is an inherently
 * sequential per-bit rotation — unrolling it as Column expressions
 * doubles the (x, y) subtree per step (2^bits blowup), so it lives here
 * as a compiled kernel instead (the winnow/ISO migration rationale).
 */
object LayoutEval {

  /**
   * Hilbert curve index of a (x, y) cell on the 2^bits × 2^bits grid —
   * the standard iterative xy→d walk (quadrant rank + rotate), pure
   * integer arithmetic, so any engine replays it exactly. Inputs must be
   * pre-quantized into [0, 2^bits).
   */
  def xy2d(bits: Int, x0: Long, y0: Long): Long = {
    // quadrant-local formulation: coords are reduced into [0, s) each
    // step, so every intermediate stays non-negative and the oracle can
    // replay the walk with plain `//`/`%` (the full-coordinate variant
    // goes negative mid-walk, where two's-complement bit tests and SQL
    // integer division part ways)
    val mask = (1L << bits) - 1
    var x = x0 & mask
    var y = y0 & mask
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = x / s // 0 or 1: the invariant keeps x, y < 2s
      val ry = y / s
      d += s * s * ((3L * rx) ^ ry)
      var xl = x - rx * s
      var yl = y - ry * s
      if (ry == 0) {
        if (rx == 1) { xl = s - 1 - xl; yl = s - 1 - yl }
        val t = xl; xl = yl; yl = t
      }
      x = xl
      y = yl
      s >>= 1
    }
    d
  }
}

/** Hilbert index kernel: `(bigint, bigint) → bigint` over a fixed
  * `bits`-deep grid; codegen calls [[LayoutEval.xy2d]] directly. */
case class HilbertIndexExpr(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_hilbert requires BIGINT inputs, got (${l.sql}, ${r.sql})")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hilbert"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    LayoutEval.xy2d(bits, a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.expressions.LayoutEval.xy2d($bits, $a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): HilbertIndexExpr =
    copy(left = newLeft, right = newRight)
}
