package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Single-pass MinHash signature kernel shared by interpreted eval and
 * codegen.
 *
 * Bit-for-bit identical to the aggregation formulation in
 * [[graft.operators.Dedup.minhashSignaturesAgg]] (and the DuckDB
 * oracle): tokens are `split(text, " ")` fields; shingles are the
 * distinct space-joined `shingleSize`-grams; `sig[k]` is the minimum
 * over shingles of the 60-bit numeric prefix (first 15 hex chars) of
 * md5("k:" || shingle). Documents with fewer than `shingleSize`
 * tokens yield null (they produce no shingle rows in the
 * aggregation formulation).
 */
object MinHashImpl {
  def signature(text: UTF8String, numHashes: Int, shingleSize: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    val nShingles = toks.length - shingleSize + 1
    if (nShingles <= 0) return null
    val seen = new java.util.HashSet[String](nShingles * 2)
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val md = MessageDigest.getInstance("MD5")
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < nShingles) {
      sb.setLength(0)
      var j = 0
      while (j < shingleSize) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      val shingle = sb.toString
      if (seen.add(shingle)) {
        var k = 0
        while (k < numHashes) {
          val digest = md.digest((k + ":" + shingle).getBytes(StandardCharsets.UTF_8))
          // First 15 hex chars = bytes 0..6 plus the high nibble of
          // byte 7 — a 60-bit non-negative long.
          var v = 0L
          var b = 0
          while (b < 7) { v = (v << 8) | (digest(b) & 0xffL); b += 1 }
          v = (v << 4) | ((digest(7) >> 4) & 0xfL)
          if (v < mins(k)) mins(k) = v
          md.reset()
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

/**
 * Native Catalyst expression for per-row MinHash signatures — the
 * zero-shuffle fast path for [[graft.operators.Dedup.minhashSignatures]].
 *
 * The aggregation formulation explodes O(shingles) rows and shuffles
 * a groupBy; this computes the whole signature inside the scan
 * projection (whole-stage codegen, one tight JVM kernel), so
 * signature generation costs no exchange at any corpus size.
 */
case class MinHashSig(child: Expression, numHashes: Int, shingleSize: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    MinHashImpl.signature(input.asInstanceOf[UTF8String], numHashes, shingleSize)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.MinHashImpl.signature(
         |  $c, $numHashes, $shingleSize);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  /** Column-level entry point. */
  def apply(text: Column, numHashes: Int, shingleSize: Int): Column =
    GraftBridge.column(
      MinHashSig(GraftBridge.expression(text), numHashes, shingleSize))
}
