package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, ByteType, DataType, IntegerType, LongType, ShortType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/**
 * Point-query side of the count-min sketch: estimate the frequency of
 * `item` in the serialized sketch produced by Spark's built-in
 * `count_min_sketch(col, eps, confidence, seed)` aggregate.
 *
 * Spark ships the BUILD side as a SQL function but no probe side —
 * the sketch is only usable after `collect()`. This expression closes
 * the loop in-plan, so the sketch can ride a scalar subquery (the
 * same constant-or-subquery shape as `BloomFilterMightContain`) and
 * frequencies are estimated distributively, no driver round-trip.
 *
 * Items may be any integral type (all hash through the aggregate's
 * addLong path) or STRING, which probes via the identical byte path
 * the aggregate used to add it (`UTF8String.getBytes`). CMS guarantees
 * estimate ≥ true count, and ≤ true + eps·N with the configured
 * confidence — the q83 audit pins both sides.
 *
 * The sketch operand is constant per query (literal or scalar
 * subquery); deserialization is cached per byte-array identity, so
 * per-row eval is just the O(depth) counter walk. CodegenFallback:
 * probe cardinality is grouped/bounded in every intended use, never
 * the fact-table hot path.
 */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = {
    // Accept every item class the build aggregate accepts: integral
    // types all hash through the same addLong path, so an INT-built
    // sketch probes correctly with any integral item.
    val integral = Seq(ByteType, ShortType, IntegerType, LongType)
    if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"sketch operand must be BINARY, got ${left.dataType.sql}")
    else if (!integral.contains(right.dataType) &&
        right.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"item operand must be integral or STRING, got ${right.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_cms_estimate"

  @transient private var cachedBytes: Array[Byte] = _
  @transient private var cachedSketch: CountMinSketch = _

  private def sketchFor(bytes: Array[Byte]): CountMinSketch = {
    if (!(bytes eq cachedBytes)) {
      cachedSketch = CountMinSketch.readFrom(new ByteArrayInputStream(bytes))
      cachedBytes = bytes
    }
    cachedSketch
  }

  override protected def nullSafeEval(sketchBytes: Any, item: Any): Any = {
    val sketch = sketchFor(sketchBytes.asInstanceOf[Array[Byte]])
    item match {
      case n: java.lang.Number =>
        sketch.estimateCount(java.lang.Long.valueOf(n.longValue))
      case s: UTF8String => sketch.estimateCount(s.getBytes)
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}
