package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * EXACT integer dot-product kernel over two int-array columns — the
 * scoring primitive of the SQ8 quantized-search path (V29): int8
 * codes dot int8 codes in pure long arithmetic, so scores are exact
 * integers with no float-parity exposure anywhere (the ranking is
 * engine-free by construction, unlike a double dot whose summation
 * order matters).
 *
 * Semantics mirror [[VecDot]]: NULL when either side is NULL, the
 * lengths differ, or any element is NULL. The sum is exact for
 * |element| ≤ ~2^27 and dims ≤ ~2^8 (int8 codes are |c| ≤ 127, so
 * overflow is unreachable by ~10 orders of magnitude).
 *
 * Why a kernel: same as [[VecDot]] — the HOF reference
 * (`aggregate(zip_with(a, b, _ * _), 0L, _ + _)`) is
 * CodegenFallback; this is a primitive `while` loop inside
 * whole-stage codegen on the probes × corpus hot path.
 * Cross-checked bit-identical against the HOF form in
 * SimilaritySpec.
 */
object IntVecDotImpl {
  def dot(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getInt(i).toLong * b.getInt(i)
      i += 1
    }
    java.lang.Long.valueOf(s)
  }
}

/** Native codegen'd expression wrapping [[IntVecDotImpl]]. */
case class IntVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    Seq(("left", left), ("right", right)).collectFirst {
      case (side, e) if !e.dataType.isInstanceOf[ArrayType] ||
          e.dataType.asInstanceOf[ArrayType].elementType != IntegerType =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_int_vec_dot $side requires array<int>, got " +
            e.dataType.catalogString)
    }.getOrElse(TypeCheckResult.TypeCheckSuccess)

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_int_vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    IntVecDotImpl.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("intDotResult")
      s"""
         |java.lang.Long $r = graft.functions.IntVecDotImpl.dot($a, $b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.longValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntVecDot =
    copy(left = newLeft, right = newRight)
}

object IntVecDot {
  /** Column-level entry point. */
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(IntVecDot(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}
