package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Distinct word n-gram kernel: the space-joined `n`-grams of
 * `split(text, " ")`, de-duplicated preserving first occurrence —
 * element-identical to the built-in formulation
 * `array_distinct(transform(sequence(...), i => concat_ws(" ",
 * slice(w, i+1, n))))` (cross-checked in DedupSpec), but one tight
 * JVM pass instead of interpreted per-element lambda evaluation.
 * Texts with fewer than `n` tokens yield an empty array (explode
 * then drops the row, as before).
 */
object ShingleArrayImpl {
  def shingles(text: UTF8String, n: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    val count = toks.length - n + 1
    if (count <= 0) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String](count * 2)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < count) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }
}

/** Native codegen'd expression wrapping [[ShingleArrayImpl]]. */
case class ShingleArray(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override protected def nullSafeEval(input: Any): Any =
    ShingleArrayImpl.shingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ShingleArrayImpl.shingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleArray =
    copy(child = newChild)
}

object ShingleArray {
  /** Column-level entry point. */
  def apply(text: Column, n: Int): Column =
    GraftBridge.column(ShingleArray(GraftBridge.expression(text), n))
}
