package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Signed-random-projection bucket kernel: all `numTables` bucket
 * strings of a vector in one pass (table t uses hyperplanes
 * [t·numPlanes, (t+1)·numPlanes)).
 *
 * Sign derivation is identical to
 * [[graft.operators.Similarity.srpBucket]] (and the DuckDB oracle):
 * component (p, d) is +1 when the first hex digit of md5("p:d") < 8.
 * The sign matrix is data-independent, computed once per executor
 * (lazily, up to `MaxDims` dimensions) — the per-row work is a dense
 * numPlanes×numTables multiply-add over primitive doubles, where the
 * higher-order-function formulation pays interpreted, boxed
 * evaluation per element.
 */
object SrpBucketsImpl {
  val MaxDims = 1024
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Double]]()

  /** Signs for global plane p, dims 0 until MaxDims. */
  private def planeSigns(p: Int): Array[Double] =
    cache.computeIfAbsent(p, { p1 =>
      val md = java.security.MessageDigest.getInstance("MD5")
      Array.tabulate(MaxDims) { d =>
        val digest = md.digest(s"$p1:$d".getBytes("UTF-8"))
        md.reset()
        if (((digest(0) >> 4) & 0xf) < 8) 1.0 else -1.0
      }
    })

  def buckets(vec: ArrayData, elemIsFloat: Boolean, numPlanes: Int,
      numTables: Int): ArrayData = {
    // Dims beyond the sign matrix are ignored (projection onto the
    // first MaxDims axes) — matching the HOF reference, which slices
    // both operands to the same width.
    val n = math.min(vec.numElements(), MaxDims)
    val v = new Array[Double](n)
    var d = 0
    while (d < n) {
      v(d) = if (elemIsFloat) vec.getFloat(d).toDouble else vec.getDouble(d)
      d += 1
    }
    val out = new Array[Any](numTables)
    var t = 0
    while (t < numTables) {
      val chars = new Array[Byte](numPlanes)
      var i = 0
      while (i < numPlanes) {
        val signs = planeSigns(t * numPlanes + i)
        var proj = 0.0
        var d2 = 0
        while (d2 < n) { proj += v(d2) * signs(d2); d2 += 1 }
        chars(i) = if (proj > 0) '1' else '0'
        i += 1
      }
      out(t) = UTF8String.fromBytes(chars)
      t += 1
    }
    new GenericArrayData(out)
  }
}

/** Native codegen'd expression wrapping [[SrpBucketsImpl]]. */
case class SrpBuckets(child: Expression, numPlanes: Int, numTables: Int)
    extends UnaryExpression {
  // Lazy: child.dataType is unresolvable at construction on the SQL
  // registry path (analysis resolves children later).
  private lazy val elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _)  => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"graft_srp_buckets requires array<float|double>, got $other")
  }

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_srp_buckets"

  override protected def nullSafeEval(input: Any): Any =
    SrpBucketsImpl.buckets(
      input.asInstanceOf[ArrayData], elemIsFloat, numPlanes, numTables)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SrpBucketsImpl.buckets($c, $elemIsFloat, $numPlanes, $numTables)")

  override protected def withNewChildInternal(newChild: Expression): SrpBuckets =
    copy(child = newChild)
}

object SrpBuckets {
  /** Column-level entry point. */
  def apply(vec: Column, numPlanes: Int, numTables: Int): Column =
    GraftBridge.column(SrpBuckets(
      GraftBridge.expression(vec), numPlanes, numTables))
}
