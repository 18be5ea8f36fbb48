package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Karp–Rabin content-defined chunking kernel.
 *
 * A window of `windowSize` CODEPOINTS rolls over the text; position
 * i (1-based, i ≥ windowSize) is a cut point when the window hash
 * h(i) = Σ_j cp(i−windowSize+1+j)·B^(windowSize−1−j) mod M
 * satisfies h(i) % divisor == 0. Chunks are the spans between cuts
 * (a cut ends its chunk at i); the tail span is always emitted.
 * B = 257, M = 1_000_000_007 — small enough that every intermediate
 * (h·B + cp ≤ ~2.6e11) stays in a 64-bit long, and reproducible in
 * any engine with 64-bit integer arithmetic (the DuckDB oracle
 * recomputes h per position from scratch via `ascii(substr(...))`,
 * which is codepoint-valued; this kernel rolls it in O(1) per
 * codepoint).
 *
 * Positions/lengths are Unicode codepoints — the unit BOTH engines'
 * `substr`/`length` count — so the spans slice correctly on
 * non-ASCII text (a byte-based kernel would misalign every chunk
 * after the first multi-byte character; for pure-ASCII text the two
 * are identical).
 *
 * Content-defined boundaries make chunk identity robust to
 * insertions: content after an edit re-aligns to the same cuts, so
 * chunk-level dedup (hash each chunk) survives shifted content —
 * the fingerprinting shape rsync/LBFS introduced.
 *
 * Returns array<struct<start:int, len:int>> of 1-based spans; the
 * caller slices/hashes the chunks with ordinary SQL functions.
 */
object RollingChunksImpl {
  private val B = 257L
  private val M = 1000000007L

  def chunks(text: UTF8String, windowSize: Int, divisor: Int): ArrayData = {
    val cps = text.toString.codePoints().toArray
    val n = cps.length
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    // B^(windowSize-1) mod M, for removing the outgoing codepoint.
    var bPow = 1L
    var i = 1
    while (i < windowSize) { bPow = bPow * B % M; i += 1 }
    var h = 0L
    var chunkStart = 1
    i = 0
    while (i < n) {
      val c = cps(i).toLong
      if (i >= windowSize) {
        val out_ = cps(i - windowSize).toLong
        h = (h - out_ * bPow % M + M) % M
      }
      h = (h * B + c) % M
      val pos = i + 1 // 1-based
      if (pos >= windowSize && h % divisor == 0) {
        out += InternalRow(chunkStart, pos - chunkStart + 1)
        chunkStart = pos + 1
      }
      i += 1
    }
    if (chunkStart <= n) out += InternalRow(chunkStart, n - chunkStart + 1)
    new GenericArrayData(out.toArray[Any])
  }
}

/** Native codegen'd expression wrapping [[RollingChunksImpl]]. */
case class RollingChunks(child: Expression, windowSize: Int, divisor: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("start", IntegerType, nullable = false),
      StructField("len", IntegerType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_rolling_chunks"

  override protected def nullSafeEval(input: Any): Any =
    RollingChunksImpl.chunks(
      input.asInstanceOf[UTF8String], windowSize, divisor)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RollingChunksImpl.chunks($c, $windowSize, $divisor)")

  override protected def withNewChildInternal(newChild: Expression): RollingChunks =
    copy(child = newChild)
}

object RollingChunks {
  /** Column-level entry point. */
  def apply(text: Column, windowSize: Int, divisor: Int): Column =
    GraftBridge.column(
      RollingChunks(GraftBridge.expression(text), windowSize, divisor))
}
