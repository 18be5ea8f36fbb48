package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StructField, StructType}

/**
 * Quantized pair-moment kernel for the exact embedding covariance
 * matrix ([[graft.operators.Similarity.embeddingMoments]]): each
 * vector's components quantize to `q_i = floor(x_i · 10^scaleExp)`
 * (floor — tie-free on every engine, unlike HALF_UP rounding), then
 * the kernel emits
 *
 *   - `(i, -1, q_i)` per dimension (first moments), and
 *   - `(i, j, q_i · q_j)` per unordered pair `i <= j` (second
 *     moments, squares included),
 *
 * all as exact longs — so the downstream aggregation is pure integer
 * arithmetic, associative and partition-order independent, and the
 * co-moment sums match a DuckDB replay bit-for-bit. The d(d+3)/2
 * fan-out happens INSIDE the scan projection and partial-aggregates
 * to ≤ that many rows per task before any exchange — at no corpus
 * size does a per-row component table ever shuffle (the join
 * formulation would shuffle corpus × d rows on the vector id).
 *
 * Bounds: |x| < 2^31 / 10^scaleExp keeps q in int range and every
 * product under 2^62 — unit-scale embeddings at scaleExp = 6 sit 3
 * orders inside it. Null vectors return null (filter upstream);
 * ragged dimensions are HANDLED downstream (per-pair n counts).
 */
object PairMomentsImpl {
  /** Returns null when any element is null — a vector with missing
    * components contributes NO moments (silently reading the null
    * slot as 0.0 would poison every pair it touches); callers treat
    * the whole vector as excluded. */
  def moments(vec: ArrayData, scaleExp: Int, isDouble: Boolean): ArrayData = {
    val d = vec.numElements()
    var chk = 0
    while (chk < d) {
      if (vec.isNullAt(chk)) return null
      chk += 1
    }
    val pow = math.pow(10.0, scaleExp)
    val q = new Array[Long](d)
    var i = 0
    while (i < d) {
      val x = if (isDouble) vec.getDouble(i) else vec.getFloat(i).toDouble
      q(i) = math.floor(x * pow).toLong
      i += 1
    }
    val out = new Array[Any](d + d * (d + 1) / 2)
    var w = 0
    i = 0
    while (i < d) {
      out(w) = new GenericInternalRow(Array[Any](i, -1, q(i)))
      w += 1
      i += 1
    }
    i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        out(w) = new GenericInternalRow(Array[Any](i, j, q(i) * q(j)))
        w += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Native codegen'd expression wrapping [[PairMomentsImpl]]. */
case class PairMoments(child: Expression, scaleExp: Int)
    extends UnaryExpression {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.types.{DoubleType, FloatType}

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("i", IntegerType, nullable = false),
      StructField("j", IntegerType, nullable = false),
      StructField("v", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_pair_moments"

  private def isDouble: Boolean = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_pair_moments needs array<float> or array<double>, got " +
        other.catalogString)
  }

  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    PairMomentsImpl.moments(input.asInstanceOf[ArrayData], scaleExp, isDouble)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.PairMomentsImpl.moments(
         |  $c, $scaleExp, $isDouble);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PairMoments =
    copy(child = newChild)
}

object PairMoments {
  /** Column-level entry point. */
  def apply(vec: Column, scaleExp: Int): Column =
    GraftBridge.column(PairMoments(GraftBridge.expression(vec), scaleExp))
}
