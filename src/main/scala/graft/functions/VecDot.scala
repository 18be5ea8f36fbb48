package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Dense dot-product kernel over two vector columns — the hot per-row
 * operation of the whole similarity family (cosine top-k, LSH
 * near-dup verify, IVF scoring, centroid assignment).
 *
 * Semantics are EXACTLY the higher-order-function reference
 * `aggregate(zip_with(a, b, _ * _), 0.0, _ + _)` (kept in
 * [[graft.operators.Similarity.dotHof]], cross-checked bit-identical
 * in SimilaritySpec):
 *   - NULL when either side is NULL, the lengths differ (zip_with
 *     null-pads the shorter side, poisoning the sum), or any element
 *     is NULL;
 *   - sequential left-to-right double summation — the same IEEE
 *     result as the HOF fold, so swapping the kernel in cannot move
 *     oracle-compared values by even an ulp.
 *
 * Why a kernel: HOFs are CodegenFallback — interpreted, boxed,
 * per-element closure dispatch. This is a primitive `while` loop
 * inside whole-stage codegen; the scan-stage similarity queries keep
 * their single-exchange plans but the per-row constant drops ~an
 * order of magnitude (same motivation as [[MinHashSig]] vs its
 * aggregate formulation).
 */
object VecDotImpl {
  /** Boxed so `null` can signal mismatch/null-element. */
  def dot(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      s += x * y
      i += 1
    }
    java.lang.Double.valueOf(s)
  }
}

/** Native codegen'd expression wrapping [[VecDotImpl]]. */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemIsFloat(e: Expression, side: String): Boolean =
    e.dataType match {
      case ArrayType(FloatType, _)  => true
      case ArrayType(DoubleType, _) => false
      case other => throw new IllegalArgumentException(
        s"graft_vec_dot $side requires array<float|double>, got $other")
    }
  private lazy val leftFloat = elemIsFloat(left, "left")
  private lazy val rightFloat = elemIsFloat(right, "right")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecDotImpl.dot(
      a.asInstanceOf[ArrayData], leftFloat,
      b.asInstanceOf[ArrayData], rightFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("dotResult")
      s"""
         |java.lang.Double $r =
         |  graft.functions.VecDotImpl.dot($a, $leftFloat, $b, $rightFloat);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

object VecDot {
  /** Column-level entry point. */
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(VecDot(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}
