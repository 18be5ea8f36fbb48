package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.RelationalQueries

/**
 * Semantic checks for the relational breadth pack over the sf0.001
 * testdata (cross-engine value equality is the driver's DuckDB gate;
 * here we pin the SEMANTICS each family must deliver).
 */
class RelationalQueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) =
    RelationalQueries.queries(name)(spark, dir)

  test("q49 rollup: one grand total, per-region subtotals, gid levels") {
    val rows = run("q49_rollup_revenue").collect()
    val grand = rows.filter(_.getLong(4) == 3L)
    assert(grand.length === 1)
    assert(grand.head.isNullAt(0) && grand.head.isNullAt(1))
    val regionSub = rows.filter(_.getLong(4) == 1L)
    assert(regionSub.length === 5) // five regions
    assert(regionSub.forall(r => !r.isNullAt(0) && r.isNullAt(1)))
    // Subtotal invariant: region subtotals sum to the grand total.
    val sumRegions = regionSub.map(_.getDouble(2)).sum
    assert(math.abs(sumRegions - grand.head.getDouble(2)) < 1e-6)
  }

  test("q50 cube: 4 grouping levels present; leaf counts sum to total") {
    val rows = run("q50_cube_returns").collect()
    val byGid = rows.groupBy(_.getLong(4))
    assert(byGid.keySet === Set(0L, 1L, 2L, 3L))
    val leafN = byGid(0L).map(_.getLong(3)).sum
    val totalN = byGid(3L).head.getLong(3)
    assert(leafN === totalN)
  }

  test("q51 grouping sets: marginals only, no cross product") {
    val rows = run("q51_grouping_sets").collect()
    // gid ∈ {1 (returnflag kept), 2 (linestatus kept), 3 (total)} —
    // never 0 (the full cross combination is NOT in the sets).
    assert(rows.map(_.getLong(4)).toSet === Set(1L, 2L, 3L))
  }

  test("q52 pivot: static schema, absent cells are 0, rows sum to orders") {
    val df = run("q52_pivot_priority")
    assert(df.columns.toSeq === Seq(
      "n_name", "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
    val rows = df.collect()
    assert(rows.forall(r => (1 to 5).forall(!r.isNullAt(_))))
    val total = rows.map(r => (1 to 5).map(r.getLong).sum).sum
    val nOrders = graft.sources.Tables.load(spark, dir, "orders").count()
    assert(total === nOrders)
  }

  test("q53 set ops: both/urgent_only partition the urgent custkey set") {
    val rows = run("q53_set_ops").collect()
    val both = rows.filter(_.getString(1) == "both").map(_.getLong(0)).toSet
    val only =
      rows.filter(_.getString(1) == "urgent_only").map(_.getLong(0)).toSet
    assert(both.intersect(only).isEmpty)
    assert(rows.length === both.size + only.size) // distinct semantics
  }

  test("q54 ranks: rn dense within group; rnk <= rn pointwise") {
    val rows = run("q54_rank_family").collect()
    rows.groupBy(_.getString(0)).foreach { case (_, g) =>
      assert(g.map(_.getInt(4)).sorted.toSeq === (1 to g.length))
      g.foreach(r => assert(r.getInt(6) <= r.getInt(4))) // rank <= row_number
    }
  }

  test("q55 frames: per-customer max running total equals the full sum") {
    // Output order is (custkey, orderkey) while the frame accumulates
    // by orderdate, so monotonicity in output order is NOT implied —
    // the invariant is that the largest prefix sum is the whole sum.
    val rows = run("q55_window_frames").collect()
    val expected = graft.sources.Tables.load(spark, dir, "orders")
      .where(org.apache.spark.sql.functions.col("o_custkey") <= 200)
      .groupBy("o_custkey")
      .agg(org.apache.spark.sql.functions
        .sum(org.apache.spark.sql.functions.col("o_totalprice")
          .cast("decimal(14,2)")).cast("double").as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.groupBy(_.getLong(0)).foreach { case (cust, g) =>
      assert(math.abs(g.map(_.getDouble(2)).max - expected(cust)) < 1e-6)
    }
  }

  test("q56 subqueries: every kept customer beats its nation's mean") {
    val rows = run("q56_sql_subqueries").collect()
    assert(rows.nonEmpty)
    val cust = graft.sources.Tables.load(spark, dir, "customer")
    val natAvg = cust.groupBy("c_nationkey")
      .agg(org.apache.spark.sql.functions.avg("c_acctbal").as("a"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val natOf = cust.select("c_custkey", "c_nationkey")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach { r =>
      val bal = r.getDouble(2)
      assert(bal > natAvg(natOf(r.getLong(0))) - 1e-6)
    }
  }

  test("q57/q62: exact p50 within the approx audit, all groups ok") {
    assert(run("q62_quantile_audit").collect().forall(_.getBoolean(2)))
  }

  test("q61/q63: sketch audits hold at sf0.001") {
    assert(run("q61_hll_audit").collect().forall(_.getBoolean(2)))
    val m = run("q63_sketch_merge").collect()
    assert(m.length === 1 && m.head.getBoolean(1))
  }

  test("q59 distinct agg: n_parts bounded by group row count") {
    val rows = run("q59_distinct_agg").collect()
    rows.foreach(r => assert(r.getLong(1) <= r.getLong(4)))
  }

  test("q60 array agg: types string is sorted and matches n_types") {
    val rows = run("q60_array_agg").collect()
    rows.foreach { r =>
      val types = r.getString(1).split(",").toSeq
      assert(types === types.sorted)
      assert(types.length === r.getLong(2))
    }
  }
}
