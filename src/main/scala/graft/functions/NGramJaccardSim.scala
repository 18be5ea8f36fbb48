package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Exact word n-gram Jaccard similarity of two texts, computed in one
 * per-row kernel.
 *
 * Shingling matches [[graft.operators.Dedup.shingles]] (and the
 * DuckDB oracle): tokens are `split(text, " ")` fields, shingles the
 * distinct space-joined n-grams. Returns
 * struct(n_common: int, jaccard: double) with |A∩B| and
 * |A∩B| / |A∪B| (0.0 when both sets are empty).
 *
 * Rationale: verifying LSH candidate pairs via exploded shingle
 * joins re-generates and shuffles O(shingles) rows three times; the
 * candidate set is small by construction, so joining the two texts
 * onto each pair and comparing in-row removes all of that.
 */
object NGramJaccardImpl {
  private def shingleSet(text: UTF8String, n: Int): java.util.HashSet[String] = {
    val toks = text.toString.split(" ", -1)
    val set = new java.util.HashSet[String](math.max(toks.length * 2, 4))
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      set.add(sb.toString)
      i += 1
    }
    set
  }

  def sim(a: UTF8String, b: UTF8String, n: Int): InternalRow = {
    val sa = shingleSet(a, n)
    val sb = shingleSet(b, n)
    var inter = 0
    val it = (if (sa.size <= sb.size) sa else sb).iterator()
    val other = if (sa.size <= sb.size) sb else sa
    while (it.hasNext) if (other.contains(it.next())) inter += 1
    val union = sa.size + sb.size - inter
    InternalRow(inter, if (union == 0) 0.0 else inter.toDouble / union)
  }
}

/** Native codegen'd expression wrapping [[NGramJaccardImpl]]. */
case class NGramJaccardSim(left: Expression, right: Expression, n: Int)
    extends BinaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_common", IntegerType, nullable = false),
    StructField("jaccard", DoubleType, nullable = false)))
  override def prettyName: String = "graft_ngram_jaccard"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    NGramJaccardImpl.sim(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.NGramJaccardImpl.sim($a, $b, $n)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NGramJaccardSim =
    copy(left = newLeft, right = newRight)
}

object NGramJaccardSim {
  /** Column-level entry point. */
  def apply(a: Column, b: Column, n: Int): Column =
    GraftBridge.column(NGramJaccardSim(
      GraftBridge.expression(a), GraftBridge.expression(b), n))
}
