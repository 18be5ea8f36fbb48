package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Incremental

/** Incremental rollup state: merged-state == full-recompute, batch
  * associativity, and the digest pair catching double-apply. */
class IncrementalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rows(df: DataFrame) =
    Incremental.finish(df, Seq("k")).orderBy("k")
      .as[(String, Long, Double, Double, Double, Long, String)]
      .collect().toSeq

  private val raw = Seq(
    ("a", 1L, 1.25), ("a", 2L, 2.50), ("a", 3L, 0.25),
    ("b", 4L, 10.00), ("b", 5L, -3.75)
  ).toDF("k", "id", "v")

  test("merge of per-batch states equals the full recompute") {
    val full = Incremental.aggState(raw, Seq("k"), "v", Seq("id"))
    val b1 = Incremental.aggState(
      raw.where($"id" <= 2), Seq("k"), "v", Seq("id"))
    val b2 = Incremental.aggState(
      raw.where($"id" > 2), Seq("k"), "v", Seq("id"))
    val merged = Incremental.mergeStates(b1.unionByName(b2), Seq("k"))
    assert(rows(merged) === rows(full))
    // values themselves are right, not just self-consistent
    val a = rows(full).head
    assert(a._1 === "a" && a._2 === 3L && a._3 === 4.0 &&
      a._4 === 0.25 && a._5 === 2.5)
  }

  test("merge is associative: (b1+b2)+b3 == b1+(b2+b3) == one-shot") {
    val bs = (1 to 3).map(i => Incremental.aggState(
      raw.where($"id" % 3 === i % 3), Seq("k"), "v", Seq("id")))
    val left = Incremental.mergeStates(
      Incremental.mergeStates(bs(0).unionByName(bs(1)), Seq("k"))
        .unionByName(bs(2)), Seq("k"))
    val flat = Incremental.mergeStates(
      bs.reduce(_ unionByName _), Seq("k"))
    assert(rows(left) === rows(flat))
  }

  test("digest pair flags a double-applied batch even when only dups repeat") {
    val b1 = Incremental.aggState(
      raw.where($"id" <= 2), Seq("k"), "v", Seq("id"))
    val good = Incremental.mergeStates(
      b1.unionByName(Incremental.aggState(
        raw.where($"id" > 2), Seq("k"), "v", Seq("id"))), Seq("k"))
    val doubled = Incremental.mergeStates(
      good.unionByName(b1), Seq("k"))
    val g = rows(good).map(r => r._1 -> ((r._6, r._7))).toMap
    val d = rows(doubled).map(r => r._1 -> ((r._6, r._7))).toMap
    // one extra application of b1 flips the XOR by b1's (non-zero)
    // digest AND shifts the exact sum on the touched key; a key the
    // batch never carried is untouched
    assert(g("a") !== d("a"))
    assert(g("b") === d("b"))
    // a SECOND re-apply returns the XOR to the good value (even-count
    // blindness) — the exact hash sum still catches it
    val doubled2 = Incremental.mergeStates(
      doubled.unionByName(b1), Seq("k"))
    val d2 = rows(doubled2).map(r => r._1 -> ((r._6, r._7))).toMap
    assert(d2("a")._1 === g("a")._1)
    assert(d2("a")._2 !== g("a")._2)
  }

  test("sum_v survives per-key mass beyond DECIMAL(28,6) (round-10 widen)") {
    // Two values of ~9e21 sum to 1.8e22 — 23 integer digits, past the
    // old (18,6)-valued sum's (28,6) cap (ANSI overflow throw), inside
    // the documented DECIMAL(38,6) / 10^32 bound.
    val big = Seq(("k", 1L, 9.0e21), ("k", 2L, 9.0e21))
      .toDF("k", "id", "v")
    val r = rows(Incremental.aggState(big, Seq("k"), "v", Seq("id")))
    assert(r.head._3 === 1.8e22)
  }
}
