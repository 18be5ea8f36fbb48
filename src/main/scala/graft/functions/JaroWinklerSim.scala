package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Jaro–Winkler similarity — the name/title matching standard that
 * levenshtein (Spark's only built-in string distance) handles badly:
 * JW weights agreeing prefixes and tolerates transpositions, which
 * is what human-entered entity names actually exhibit.
 *
 * Variant: Winkler prefix boost (p = 0.1, prefix ≤ 4) applied only
 * when the Jaro score exceeds 0.7 — the classic formulation and,
 * verified empirically to 12 decimals across magnitude/edge cases,
 * the one DuckDB's `jaro_winkler_similarity` implements, so oracle
 * rows can pin kernel outputs exactly. Matching window is
 * max(|a|,|b|)/2 − 1 (floored at 0); either side empty scores 0.0
 * unless both are empty (1.0).
 *
 * O(|a|·window) time, two small boolean scratch arrays — runs inside
 * whole-stage codegen via a static call like the other graft kernels.
 */
object JaroWinklerImpl {
  def sim(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.toString
    val b = ub.toString
    val la = a.length
    val lb = b.length
    if (la == 0 && lb == 0) return 1.0
    if (la == 0 || lb == 0) return 0.0
    val w = math.max(math.max(la, lb) / 2 - 1, 0)
    val ma = new Array[Boolean](la)
    val mb = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - w)
      val hi = math.min(lb, i + w + 1)
      var j = lo
      var found = false
      while (j < hi && !found) {
        if (!mb(j) && b.charAt(j) == a.charAt(i)) {
          ma(i) = true; mb(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (ma(i)) {
        while (!mb(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val jaro = (m.toDouble / la + m.toDouble / lb +
      (m - t).toDouble / m) / 3.0
    if (jaro > 0.7) {
      var l = 0
      val maxL = math.min(4, math.min(la, lb))
      while (l < maxL && a.charAt(l) == b.charAt(l)) l += 1
      jaro + l * 0.1 * (1.0 - jaro)
    } else jaro
  }
}

/** Native codegen'd expression wrapping [[JaroWinklerImpl]]. */
case class JaroWinklerSim(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaro_winkler"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerImpl.sim(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinklerImpl.sim($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerSim =
    copy(left = newLeft, right = newRight)
}

object JaroWinklerSim {
  /** Column-level entry point. */
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(JaroWinklerSim(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}
