package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape guards for the TPC-H-adapted suite (q139–q151): the
  * scale properties each query was written for, asserted at sf0.001
  * so a refactor that silently degrades a plan fails CI. */
class TpchPlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  // FormattedMode prints PushedFilters in full (simple toString
  // truncates long filter lists mid-name).
  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)

  test("q139 (Q3): top-10 compiles to TakeOrderedAndProject; all three filters pushed") {
    val p = plan("q139_tpch3")
    assert(p.contains("TakeOrderedAndProject"), "top-k must not global-sort")
    assert(p.contains("GreaterThan(l_shipdate"), "lineitem date filter must reach the scan")
    assert(p.contains("LessThan(o_orderdate"), "orders date filter must reach the scan")
    assert(p.contains("EqualTo(c_mktsegment,BUILDING)"), "segment filter must reach the scan")
  }

  test("q141 (Q6): pure scan-aggregate — every range predicate pushed, no join") {
    val p = plan("q141_tpch6")
    assert(!p.contains("Join"), "Q6 has no join")
    assert(p.contains("GreaterThanOrEqual(l_shipdate"))
    assert(p.contains("GreaterThanOrEqual(l_discount"))
    assert(p.contains("LessThan(l_quantity"))
    // 4-column read out of 11 — column pruning must hold.
    assert(!p.contains("l_returnflag"), "unused columns must not reach the scan")
  }

  test("q149 (Q18): quantity HAVING pre-aggregates lineitem BELOW the order/customer joins") {
    val p = plan("q149_tpch18")
    // The partial_sum over l_quantity must appear, and the lineitem
    // scan must read exactly (orderkey, quantity) — proof the agg ran
    // before any join widened the rows.
    assert(p.contains("partial_sum(l_quantity"))
    assert(p.contains("struct<l_orderkey:bigint,l_quantity:double>"),
      "lineitem scan must be pre-agg narrow (2 columns)")
  }

  test("q140/q142 (Q5/Q7): bounded dims broadcast, no SortMergeJoin at gate scale") {
    assert(plan("q140_tpch5").contains("BroadcastHashJoin"))
    assert(plan("q142_tpch7").contains("BroadcastHashJoin"))
  }

  test("q147 (Q15): max-revenue filter is a one-row broadcast join, not a second lineitem scan chain") {
    val p = plan("q147_tpch15")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "scalar max must broadcast")
    assert(!p.contains("WindowExec"), "no global window for the max")
  }

  test("q151 (Q22): recency check plans as a broadcast anti-join with the date filter pushed") {
    val p = plan("q151_tpch22")
    assert(p.contains("LeftAnti"))
    assert(p.contains("GreaterThanOrEqual(o_orderdate"),
      "orders recency filter must reach the scan")
  }

  test("q173 (Q2): correlated min rides ONE offers subtree (window, not join-back)") {
    val p = plan("q173_tpch2")
    assert(p.contains("TakeOrderedAndProject"), "top-20 must not global-sort")
    // Canonical Q2's offers are the generated partsupp (a part-scan
    // projection): the min-cost decorrelation must not re-evaluate
    // the generator — exactly one part scan feeds it (the other part
    // reference, the size-15 semi probe, is its own scan: 2 total).
    val scans = "part.parquet".r.findAllIn(p).length
    assert(scans === 2,
      s"window decorrelation must keep one partsupp generator subtree" +
        s" + one size-15 probe, saw $scans part scans")
    assert(!p.contains("lineitem.parquet"),
      "canonical Q2 never touches lineitem")
  }

  test("q174 (Q4): EXISTS decorrelates to a semi join; both filters pushed") {
    val p = plan("q174_tpch4")
    assert(p.contains("LeftSemi"), "EXISTS must plan as left-semi")
    assert(p.contains("GreaterThanOrEqual(o_orderdate"),
      "order-date range must reach the orders scan")
    assert(p.contains("EqualTo(l_returnflag,R)"),
      "returnflag probe filter must reach the lineitem scan")
  }

  test("q176/q179 (Q11/Q20): scalar/threshold compares broadcast, never windowed or looped") {
    for (q <- Seq("q176_tpch11", "q179_tpch20")) {
      val p = plan(q)
      assert(!p.contains("WindowExec"), s"$q: no global window for the scalar")
      assert(!p.contains("CartesianProduct"), s"$q: no unbounded cartesian")
    }
  }

  test("q178 (Q16): NOT IN is an anti join; multi-distinct is one pass") {
    val p = plan("q178_tpch16")
    assert(p.contains("LeftAnti"), "complaint exclusion must plan as anti join")
    assert(!p.contains("CartesianProduct"))
  }

  test("q180 (Q21): exists/not-exists pair is per-order counts, not self-joins") {
    val p = plan("q180_tpch21")
    // The count formulation: ONE multi-distinct Expand over lineitem
    // replaces the semi+anti self-join pair (whose distinct-collapse
    // passes scaled with the self-join — 10x slope 12.6 pre-round-9).
    assert(p.contains("Expand"),
      "per-order exists/not-exists counts must ride the multi-distinct Expand")
    assert(!p.contains("LeftAnti"),
      "NOT EXISTS must be the __n_failed = 1 count, not an anti self-join")
    assert(p.contains("LeftSemi"), "the F-status probe stays a semi join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"all joins must stay hash joins:\n$p")
  }
}
