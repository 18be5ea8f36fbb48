package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Single-pass SimHash kernel shared by interpreted eval and codegen.
 *
 * Bit-for-bit identical to the higher-order-function formulation in
 * [[graft.operators.Dedup.simhash]] (and the DuckDB oracle): tokens
 * are the `split(text, " ")` fields (trailing empties kept, as
 * Spark's `split` with limit −1 does), de-duplicated; each distinct
 * token md5-hashes once; bit j of the 64-bit fingerprint reads hex
 * char j/4 (chars 0..15 of the digest), LSB-first within the char's
 * nibble; the fingerprint char is '1' when the ±1 tally over tokens
 * is > 0.
 */
object SimHashImpl {
  def simhash(text: UTF8String): UTF8String = {
    val tokens = text.toString.split(" ", -1)
    val seen = new java.util.HashSet[String](tokens.length * 2)
    val tallies = new Array[Int](64)
    val md = MessageDigest.getInstance("MD5")
    var t = 0
    while (t < tokens.length) {
      val tok = tokens(t)
      if (seen.add(tok)) {
        val digest = md.digest(tok.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        var j = 0
        while (j < 64) {
          val hexChar = j >> 2
          val b = digest(hexChar >> 1)
          val v = if ((hexChar & 1) == 0) (b >> 4) & 0xf else b & 0xf
          tallies(j) += (((v >> (j & 3)) & 1) << 1) - 1
          j += 1
        }
        md.reset()
      }
      t += 1
    }
    val out = new Array[Byte](64)
    var j = 0
    while (j < 64) {
      out(j) = if (tallies(j) > 0) '1' else '0'
      j += 1
    }
    UTF8String.fromBytes(out)
  }
}

/**
 * Native Catalyst expression for the 64-bit SimHash fingerprint of a
 * string column — the codegen'd fast path for
 * [[graft.operators.Dedup.simhash]].
 *
 * Spark's higher-order functions (`transform`/`aggregate`/`zip_with`)
 * are `CodegenFallback` — evaluated interpretively with per-element
 * boxing — which makes the pure-built-in SimHash formulation ~25×
 * slower than this single tight JVM kernel. `doGenCode` emits a
 * static call into [[SimHashImpl]], so the expression participates in
 * whole-stage codegen with zero per-row allocation beyond the digest.
 */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_simhash64"

  override protected def nullSafeEval(input: Any): Any =
    SimHashImpl.simhash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashImpl.simhash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  /** Column-level entry point: `simhash64(textCol)`. */
  def apply(c: Column): Column =
    GraftBridge.column(SimHash64(GraftBridge.expression(c)))
}
