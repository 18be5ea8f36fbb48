package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Multi-length tagged word-gram kernel for the Gopher repetition
 * signals ([[graft.operators.TextAnalysis.repetitionSignals]]): for
 * each `n` in `ns` (in order) and each position admitting a full
 * window, a `(gn = n, g = space-joined n-gram)` struct.
 *
 * Element-identical to the higher-order formulation
 * `filter(concat(transform(toks, ..2-grams..), transform(toks,
 * ..3-grams..)), x -> x IS NOT NULL)` (kept as a cross-checked
 * reference in TextAnalysisSpec) — but those lambdas are
 * CodegenFallback with a fresh `slice` + interpreted `array_join`
 * per element; this is one split and one reused StringBuilder for
 * ALL gram lengths, the [[PositionGramsImpl]] pattern. Texts shorter
 * than every `n` yield an empty array.
 */
object TaggedGramsImpl {
  def grams(text: UTF8String, ns: Array[Int]): ArrayData = {
    val toks = text.toString.split(" ", -1)
    val len = toks.length
    var total = 0
    var t = 0
    while (t < ns.length) {
      val c = len - ns(t) + 1
      if (c > 0) total += c
      t += 1
    }
    val out = new Array[Any](total)
    val sb = new java.lang.StringBuilder
    var w = 0
    t = 0
    while (t < ns.length) {
      val n = ns(t)
      val count = len - n + 1
      var i = 0
      while (i < count) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        out(w) = new GenericInternalRow(
          Array[Any](n, UTF8String.fromString(sb.toString)))
        w += 1
        i += 1
      }
      t += 1
    }
    new GenericArrayData(out)
  }
}

/** Native codegen'd expression wrapping [[TaggedGramsImpl]]. */
case class TaggedGrams(child: Expression, ns: Seq[Int])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("gn", IntegerType, nullable = false),
      StructField("g", StringType, nullable = true))),
    containsNull = false)
  override def prettyName: String = "graft_tagged_grams"

  private lazy val nsArr = ns.toArray

  override protected def nullSafeEval(input: Any): Any =
    TaggedGramsImpl.grams(input.asInstanceOf[UTF8String], nsArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val arr = ctx.addReferenceObj("nsArr", nsArr, "int[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TaggedGramsImpl.grams($c, $arr)")
  }

  override protected def withNewChildInternal(newChild: Expression): TaggedGrams =
    copy(child = newChild)
}

object TaggedGrams {
  /** Column-level entry point. */
  def apply(text: Column, ns: Seq[Int]): Column =
    GraftBridge.column(TaggedGrams(GraftBridge.expression(text), ns))
}
