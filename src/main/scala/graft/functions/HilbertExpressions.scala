package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** 2-D Hilbert curve index — the better-locality alternative to the
  * Morton/Z interleave ([[graft.sources.ZOrder.zValue]]) for
  * multi-dimensional file clustering. Every unit step along the
  * Hilbert curve moves to a grid-ADJACENT cell (|Δx|+|Δy| = 1 —
  * spec-pinned), where the Z curve takes diagonal jumps across half
  * the grid at quadrant boundaries; the consequence for skipping is
  * that a contiguous curve run (≈ one file after the range
  * partition) covers a more compact rectangle, so a box predicate
  * intersects fewer files' stat boxes. The standard iterative
  * quadrant-rotation algorithm (Wikipedia's xy2d formulation), O(order)
  * per row, pure integer ops. */
object Hilbert {

  /** Curve distance of grid cell (x, y), both in [0, 2^order). Java
    * static-forwarder friendly — called from generated code. */
  def xy2d(order: Int, xIn: Long, yIn: Long): Long = {
    var x = xIn
    var y = yIn
    var d = 0L
    var s = 1L << (order - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}

/** `graft_hilbert(x, y)` at a fixed literal order: curve distance of
  * the bucket pair — codegen'd (one static call inlined into the
  * clustering write's projection, the [[NfcNormalize]] posture). */
case class HilbertIndex2D(left: Expression, right: Expression, order: Int)
    extends BinaryExpression {
  require(order >= 1 && order <= 31, s"order must be in [1, 31], got $order")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hilbert"

  override protected def nullSafeEval(x: Any, y: Any): Any =
    Hilbert.xy2d(order, x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) =>
      s"graft.functions.Hilbert.xy2d($order, $x, $y)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex2D =
    copy(left = newLeft, right = newRight)
}
