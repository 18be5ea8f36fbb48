package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Per-position tagged-gram kernel for the substring-dedup pipeline
 * ([[graft.operators.TextAnalysis.substringDedup]]): for each token
 * position `i` of `split(text, " ")`, a struct of the token itself
 * and — when a full window fits (`i + k <= n`) — the space-joined
 * `k`-gram starting at `i`, else NULL.
 *
 * Element-identical to the higher-order formulation
 * `transform(toks, (tok, i) -> struct(tok, IF(i <= n-k,
 * array_join(slice(toks, i+1, k), ' '), NULL)))`, which stays a
 * cross-checked reference in TextAnalysisSpec — but HOF lambdas are
 * CodegenFallback with a fresh `slice` allocation and an interpreted
 * `array_join` per element; this is one tight JVM pass (single
 * split, one reused StringBuilder), the [[ShingleArrayImpl]]
 * pattern with positions kept instead of de-duplicated.
 */
object PositionGramsImpl {
  def cells(text: UTF8String, k: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    val n = toks.length
    val last = n - k // highest position with a full window, may be < 0
    val out = new Array[Any](n)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < n) {
      val ng: UTF8String =
        if (i <= last) {
          sb.setLength(0)
          var j = 0
          while (j < k) {
            if (j > 0) sb.append(' ')
            sb.append(toks(i + j))
            j += 1
          }
          UTF8String.fromString(sb.toString)
        } else null
      out(i) = new GenericInternalRow(
        Array[Any](UTF8String.fromString(toks(i)), ng))
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Native codegen'd expression wrapping [[PositionGramsImpl]]. */
case class PositionGrams(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("tok", StringType, nullable = true),
      StructField("ng", StringType, nullable = true))),
    containsNull = false)
  override def prettyName: String = "graft_position_grams"

  override protected def nullSafeEval(input: Any): Any =
    PositionGramsImpl.cells(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PositionGramsImpl.cells($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): PositionGrams =
    copy(child = newChild)
}

object PositionGrams {
  /** Column-level entry point. */
  def apply(text: Column, k: Int): Column =
    GraftBridge.column(PositionGrams(GraftBridge.expression(text), k))
}
