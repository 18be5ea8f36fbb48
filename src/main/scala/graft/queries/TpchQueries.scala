package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * TPC-H-adapted relational suite (round 6): the classic decision-
 * support queries re-expressed over the driver's REDUCED synthetic
 * schemas. The synthetic tables drop several TPC-H columns
 * (`partsupp` entirely, `o_shippriority`, `l_shipmode`,
 * `l_commitdate`/`l_receiptdate`, `p_container`, `c_phone`), so each
 * query keeps the canonical SHAPE — the join graph, aggregation
 * pattern, and predicate structure that make it a benchmark staple —
 * and substitutes surviving columns where the original filter/output
 * column is absent. Round 8 completed the suite (q173–q180 as shape
 * adaptations); round 9 promoted the five partsupp queries —
 * Q2/Q9/Q11/Q16/Q20 (q173/175/176/178/179) — to CANONICAL form over
 * [[partsuppSynth]], a deterministic partsupp regenerated identically
 * by both engines, so partsupp-derived semantics (min-cost supplier,
 * supplycost·quantity profit, supplycost·availqty stock value,
 * per-pair supplier counts, availqty-vs-half-shipped excess) now run
 * as written. The remaining adaptations are column-level only: the
 * late-delivery predicates → returnflag 'R' (Q4/Q21, no
 * commit/receipt dates), supplier complaints → negative s_acctbal
 * (Q16/Q21, no s_comment), shipmode split → returnflag classes
 * (Q12). The canonical structures all run: correlated MIN (Q2),
 * EXISTS/NOT-EXISTS semi/anti self-joins (Q4/Q21), the
 * HAVING-vs-global-scalar compare (Q11), NOT IN (Q16), and nested
 * semi-joins (Q20). With Q1's pricing summary long covered by the
 * core q12 aggregate, all 22 TPC-H query shapes run.
 *
 * Every query pairs with a DuckDB oracle (parity rules per
 * `.claude/skills/verify`: decimal-accumulated revenue cast to
 * DOUBLE, timestamp literals both sides, INT-width alignment on
 * `year()`, deterministic total ORDER BY).
 *
 * Scale posture (the suite is the textbook exercise of "let Catalyst
 * pick"): bounded dims (nation 25 rows, region 5) are broadcast
 * explicitly; SF-scaling dims (customer, supplier, part) are left to
 * AQE so a 1000-executor plan can still choose shuffle joins;
 * aggregations are pushed BELOW joins wherever the grouping key is a
 * join key (Q18's HAVING pre-filter, Q17's per-part averages) so the
 * biggest shuffle carries pre-combined rows; top-k terminals compile
 * to TakeOrderedAndProject (no global sort materialization).
 */
object TpchQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.sources.Tables.load(s, dir, name)

  private def ts(d: String): Column = lit(d).cast("timestamp")

  /**
   * Synthetic `partsupp`, derived DETERMINISTICALLY from part ×
   * supplier-count so the five partsupp TPC-H queries (Q2/Q9/Q11/
   * Q16/Q20) run in canonical form even though the driver testdata
   * ships no partsupp table. Both engines regenerate the identical
   * rows from the same integer arithmetic — the Spark derivation here
   * and the [[psCte]] DuckDB CTE are the same formulas symbol for
   * symbol, so the oracle gate covers the generated table too.
   *
   * Per part, 4 supplier rows (dbgen's fan-out; keys are 0-based in
   * this testdata):
   *   ps_suppkey    = (p + p div S + i·(S div 4)) mod S, i ∈ 0..3
   *     — dbgen's rotation, restructured so the i-step is the
   *       CONSTANT S div 4: d·(S div 4) < S for d ∈ 1..3 (S ≥ 4), so
   *       the four suppliers of a part are provably distinct — the
   *       raw dbgen step (S/4 + p/S) collides mod S for some p at
   *       this testdata's small S.
   *   ps_availqty   = (p·7 + i·1009) mod 9999 + 1
   *   ps_supplycost = (p·31 + ps_suppkey·7 + i·13) mod 991 + 10
   *     — INTEGER dollars (10..1000): integer→DECIMAL casts are exact
   *       on both engines, so every downstream decimal aggregate is
   *       combine-order independent with no division/rounding hazard.
   *
   * Scale: a projection over the part scan × a one-row broadcast
   * (supplier count — the q147 idiom, never a collect) × a 4-element
   * explode. 4·|part| rows, generated in-scan wherever it's consumed;
   * nothing is materialized.
   */
  private def partsuppSynth(s: SparkSession, dir: String): DataFrame = {
    val sCount = t(s, dir, "supplier")
      .agg(count(lit(1)).cast("long").as("__S"))
    t(s, dir, "part").select(col("p_partkey"))
      .crossJoin(broadcast(sCount))
      .select(col("p_partkey"), col("__S"),
        explode(array((0 to 3).map(i => lit(i.toLong)): _*)).as("__i"))
      .selectExpr(
        "p_partkey AS ps_partkey",
        "(p_partkey + (p_partkey div __S) + __i * (__S div 4)) % __S" +
          " AS ps_suppkey",
        "CAST((p_partkey * 7 + __i * 1009) % 9999 + 1 AS INT)" +
          " AS ps_availqty",
        "CAST((p_partkey * 31 + ((p_partkey + (p_partkey div __S) +" +
          " __i * (__S div 4)) % __S) * 7 + __i * 13) % 991 + 10 AS INT)" +
          " AS ps_supplycost")
  }

  /** DuckDB twin of [[partsuppSynth]] — identical formulas (`//` is
    * DuckDB's integer division, `div` Spark's). */
  private val psCte: String =
    """ps AS (
      |  SELECT p_partkey AS ps_partkey,
      |    (p_partkey + (p_partkey // S) + i * (S // 4)) % S AS ps_suppkey,
      |    CAST((p_partkey * 7 + i * 1009) % 9999 + 1 AS INT) AS ps_availqty,
      |    CAST((p_partkey * 31
      |          + ((p_partkey + (p_partkey // S) + i * (S // 4)) % S) * 7
      |          + i * 13) % 991 + 10 AS INT) AS ps_supplycost
      |  FROM part
      |  CROSS JOIN (SELECT COUNT(*) AS S FROM supplier)
      |  CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS i)
      |)""".stripMargin

  /** The q10 revenue idiom: decimal-exact `extprice*(1-disc)` so the
    * sum is combine-order independent, cast to DOUBLE at the end. */
  private def revenueTerm: Column =
    col("l_extendedprice").cast("decimal(12,2)") *
      (lit(1).cast("decimal(12,2)") - col("l_discount").cast("decimal(12,2)"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // TPC-H Q3 (shipping priority, sans o_shippriority): unshipped
    // orders of one market segment, top-10 by accrued revenue. Both
    // fact filters (o_orderdate <, l_shipdate >) reach their scans
    // before the join; the top-10 compiles to TakeOrderedAndProject —
    // each task keeps a 10-row heap, no global sort at any scale.
    "q139_tpch3" -> ((s, dir) => {
      val c = t(s, dir, "customer").where(col("c_mktsegment") === "BUILDING")
      val o = t(s, dir, "orders").where(col("o_orderdate") < ts("1998-03-15"))
      val l = t(s, dir, "lineitem").where(col("l_shipdate") > ts("1998-03-15"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(sum(revenueTerm).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
        .limit(10)
    }),

    // TPC-H Q5 (local supplier volume): revenue per nation where the
    // ordering customer and the line's supplier share a nation, one
    // region, one year. The c_nationkey = s_nationkey equi-condition
    // rides the supplier join; nation/region broadcast (25/5 rows at
    // ANY scale factor).
    "q140_tpch5" -> ((s, dir) => {
      val o = t(s, dir, "orders").where(
        col("o_orderdate") >= ts("1997-01-01") &&
          col("o_orderdate") < ts("1998-01-01"))
      t(s, dir, "lineitem")
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(t(s, dir, "supplier"),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey") &&
            col("r_name") === "ASIA")
        .groupBy(col("n_name"))
        .agg(sum(revenueTerm).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // TPC-H Q6 (forecasting revenue change): pure scan-aggregate —
    // three pushed range predicates, zero joins, one partial-combined
    // scalar. The canary for predicate pushdown: every filter must
    // show in PushedFilters.
    "q141_tpch6" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .where(
          col("l_shipdate") >= ts("1997-01-01") &&
            col("l_shipdate") < ts("1998-01-01") &&
            col("l_discount").between(0.05, 0.07) &&
            col("l_quantity") < 24)
        .agg(
          sum(col("l_extendedprice").cast("decimal(12,2)") *
            col("l_discount").cast("decimal(12,2)"))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // TPC-H Q7 (volume shipping): bilateral trade between two nations
    // by ship year. Both nation dims broadcast; the pair predicate is
    // the classic symmetric OR, kept ABOVE the joins (it needs both
    // sides) while each nation join itself stays an equi-join.
    "q142_tpch7" -> ((s, dir) => {
      val n1 = broadcast(t(s, dir, "nation")
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation")))
      val n2 = broadcast(t(s, dir, "nation")
        .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation")))
      t(s, dir, "lineitem")
        .where(col("l_shipdate").between(ts("1996-01-01"), ts("1997-12-31")))
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(n1, col("s_nationkey") === col("s_nk"))
        .join(n2, col("c_nationkey") === col("c_nk"))
        .where(
          (col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
            (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(sum(revenueTerm).cast("double").as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }),

    // TPC-H Q8 (national market share): NATION_3 suppliers' share of
    // one part type's revenue among orders by customers in EUROPE,
    // per order year. The share is a conditional-sum ratio — both
    // sums decimal-exact, ONE double division at the end (identical
    // operand bits both engines), round(6) to absorb nothing: it's
    // deterministic, the round just documents the contract.
    "q143_tpch8" -> ((s, dir) => {
      val n1 = broadcast(t(s, dir, "nation")
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation")))
      val nr = broadcast(t(s, dir, "nation")
        .join(t(s, dir, "region"), col("n_regionkey") === col("r_regionkey"))
        .where(col("r_name") === "EUROPE")
        .select(col("n_nationkey").as("c_nk")))
      t(s, dir, "lineitem")
        .join(t(s, dir, "part").where(col("p_type") === "STANDARD"),
          col("l_partkey") === col("p_partkey"))
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(t(s, dir, "orders").where(
          col("o_orderdate").between(ts("1996-01-01"), ts("1997-12-31"))),
          col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(nr, col("c_nationkey") === col("c_nk"))
        .join(n1, col("s_nationkey") === col("s_nk"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(
          round(
            sum(when(col("supp_nation") === "NATION_3", revenueTerm)
              .otherwise(lit(0).cast("decimal(12,2)"))).cast("double") /
              sum(revenueTerm).cast("double"),
            6).as("mkt_share"))
        .orderBy("o_year")
    }),

    // TPC-H Q10 (returned-item reporting): top-20 customers by
    // revenue lost to returns in one quarter. Customer join carries
    // the output attributes; TakeOrderedAndProject terminal.
    "q144_tpch10" -> ((s, dir) => {
      val o = t(s, dir, "orders").where(
        col("o_orderdate") >= ts("2000-10-01") &&
          col("o_orderdate") < ts("2001-01-01"))
      t(s, dir, "lineitem").where(col("l_returnflag") === "R")
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        .agg(sum(revenueTerm).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // TPC-H Q13 (customer order-count distribution, sans the comment
    // anti-filter the synthetic orders lack): LEFT join keeps
    // zero-order customers; count(o_orderkey) ignores the NULLs they
    // produce; then a count-of-counts regroup. Two shuffles total —
    // the second one is at most (max orders per customer) rows.
    "q145_tpch13" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(t(s, dir, "orders"),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // TPC-H Q14 (promotion effect): share of one month's revenue from
    // PROMO-type parts. Same conditional-sum-ratio contract as Q8.
    // part is an SF-scaling dim — no forced broadcast, AQE decides.
    "q146_tpch14" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .where(col("l_shipdate") >= ts("1998-09-01") &&
          col("l_shipdate") < ts("1998-10-01"))
        .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .agg(
          round(
            lit(100.0) *
              sum(when(col("p_type") === "PROMO", revenueTerm)
                .otherwise(lit(0).cast("decimal(12,2)"))).cast("double") /
              sum(revenueTerm).cast("double"),
            6).as("promo_revenue"))
    }),

    // TPC-H Q15 (top supplier): quarterly revenue per supplier, keep
    // the one(s) equal to the max. The supplier-revenue aggregate is
    // tiny (|suppliers| rows), so its max rides the established
    // one-row-cross-join idiom — no second scan of lineitem, no
    // global window.
    "q147_tpch15" -> ((s, dir) => {
      val rev = t(s, dir, "lineitem")
        .where(col("l_shipdate") >= ts("1999-01-01") &&
          col("l_shipdate") < ts("1999-04-01"))
        .groupBy(col("l_suppkey"))
        .agg(sum(revenueTerm).cast("double").as("total_revenue"))
      val top = rev.agg(max(col("total_revenue")).as("__max_rev"))
      rev.join(broadcast(top))
        .where(col("total_revenue") === col("__max_rev"))
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
        .orderBy("s_suppkey")
    }),

    // TPC-H Q17 (small-quantity-order revenue, p_container→p_brand):
    // revenue from lineitems under 20% of their part's average
    // quantity. The correlated per-part average becomes ONE grouped
    // aggregate over the brand-filtered lines, joined back — the
    // standard decorrelation; both the avg input and the probe side
    // reuse the same brand-restricted join.
    "q148_tpch17" -> ((s, dir) => {
      val pb = t(s, dir, "part").where(col("p_brand") === "Brand#1")
        .select(col("p_partkey"))
      val li = t(s, dir, "lineitem")
        .join(pb, col("l_partkey") === col("p_partkey"))
      val avgs = li.groupBy(col("p_partkey").as("__pk"))
        .agg((sum(col("l_quantity").cast("decimal(14,2)")).cast("double") /
          count(lit(1)).cast("double")).as("__avg_qty"))
      li.join(avgs, col("p_partkey") === col("__pk"))
        .where(col("l_quantity") < lit(0.2) * col("__avg_qty"))
        .agg(
          (sum(col("l_extendedprice").cast("decimal(12,2)")).cast("double") /
            lit(7.0)).as("avg_yearly"),
          count(lit(1)).as("n_items"))
    }),

    // TPC-H Q18 (large-volume customers): orders whose total quantity
    // exceeds 400. The HAVING pre-filter runs BEFORE any join — the
    // surviving key set is tiny at every scale, so AQE broadcasts it
    // into orders/customer instead of shuffling the facts.
    "q149_tpch18" -> ((s, dir) => {
      val big = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey").as("__ok"))
        .agg(sum(col("l_quantity")).as("sum_qty"))
        .where(col("sum_qty") > 400)
      t(s, dir, "orders")
        .join(big, col("o_orderkey") === col("__ok"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    }),

    // TPC-H Q19 (discounted revenue, p_container/l_shipmode →
    // p_size/l_quantity bands): the three-way OR of conjunctive
    // (brand, size-range, quantity-range) clauses — the classic
    // "disjunction that must still push the join key" shape. The OR
    // sits above the part join; the equi-key is unconditional.
    "q150_tpch19" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .where(
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
            col("l_quantity").between(1, 11)) ||
            (col("p_brand") === "Brand#2" && col("p_size").between(1, 25) &&
              col("l_quantity").between(10, 20)) ||
            (col("p_brand") === "Brand#3" && col("p_size").between(1, 35) &&
              col("l_quantity").between(20, 30)))
        .agg(
          sum(revenueTerm).cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // TPC-H Q22 (global sales opportunity, c_phone country code →
    // c_mktsegment, "never ordered" → "no orders since 2000"): rich
    // customers gone quiet. Scalar avg rides a one-row cross join;
    // the recency check is a left-anti join against the date-filtered
    // orders — both classic decorrelations of the original's two
    // subqueries.
    "q151_tpch22" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val avgBal = c.where(col("c_acctbal") > 0)
        .agg((sum(col("c_acctbal").cast("decimal(14,2)")).cast("double") /
          count(lit(1)).cast("double")).as("__avg_bal"))
      val recent = t(s, dir, "orders")
        .where(col("o_orderdate") >= ts("2000-01-01"))
        .select(col("o_custkey"))
      c.join(broadcast(avgBal))
        .where(col("c_acctbal") > col("__avg_bal"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(
          count(lit(1)).as("numcust"),
          sum(col("c_acctbal").cast("decimal(14,2)")).cast("double")
            .as("totacctbal"))
        .orderBy("c_mktsegment")
    }),

    // TPC-H Q2 (minimum-cost supplier), CANONICAL over the generated
    // partsupp (round 9 — previously a lineitem-offers shape
    // adaptation): for each size-15 part, the EUROPE suppliers whose
    // ps_supplycost equals the part's regional minimum. The canonical
    // correlated MIN decorrelates to a per-part WINDOW over the
    // regional offers (a groupBy-min-join-back would evaluate the
    // offers subtree twice); integer supplycost makes the min-equality
    // compare exact by construction. Top-20 compiles to
    // TakeOrderedAndProject.
    "q173_tpch2" -> ((s, dir) => {
      val eu = t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey") &&
            col("r_name") === "EUROPE")
        .select(col("s_suppkey"), col("s_acctbal"), col("s_name"),
          col("n_name"))
      val p15 = t(s, dir, "part").where(col("p_size") === 15)
        .select(col("p_partkey"))
      val regional = partsuppSynth(s, dir)
        .join(eu, col("ps_suppkey") === col("s_suppkey"))
        .join(p15, col("ps_partkey") === col("p_partkey"), "left_semi")
      regional
        .withColumn("__min_cost",
          min("ps_supplycost").over(
            org.apache.spark.sql.expressions.Window.partitionBy("ps_partkey")))
        .where(col("ps_supplycost") === col("__min_cost"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"),
          col("ps_partkey").as("p_partkey"), col("ps_supplycost"))
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
          col("p_partkey"))
        .limit(20)
    }),

    // TPC-H Q4 (order-priority checking; the EXISTS late-lineitem
    // probe → returnflag 'R', since l_commitdate/l_receiptdate are
    // absent). The order-date range is pushed to the orders scan; the
    // EXISTS decorrelates to a left-semi join (never a distinct +
    // inner join — the semi dedups during the probe).
    "q174_tpch4" -> ((s, dir) => {
      val o = t(s, dir, "orders").where(
        col("o_orderdate") >= ts("1997-07-01") &&
          col("o_orderdate") < ts("1997-10-01"))
      val flagged = t(s, dir, "lineitem")
        .where(col("l_returnflag") === "R").select(col("l_orderkey"))
      o.join(flagged, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    }),

    // TPC-H Q9 (product-type profit), CANONICAL over the generated
    // partsupp (round 9 — previously a constant-cost-rate shape
    // adaptation): profit = revenue − ps_supplycost·l_quantity with
    // partsupp joined on BOTH keys, exactly dbgen's join graph.
    // Six-way join star with nation broadcast; integer supplycost →
    // the profit term stays exact decimal, so per-(nation, year) sums
    // are combine-order independent. partsupp is 4·|part| rows —
    // left to AQE (broadcast at gate scale, shuffle at SF-huge).
    "q175_tpch9" -> ((s, dir) => {
      val p = t(s, dir, "part").where(col("p_name").startsWith("red"))
        .select(col("p_partkey"))
      val ps = partsuppSynth(s, dir)
        .select(col("ps_partkey"), col("ps_suppkey"), col("ps_supplycost"))
      val profit = revenueTerm -
        col("l_quantity").cast("decimal(12,2)") *
          col("ps_supplycost").cast("decimal(12,2)")
      t(s, dir, "lineitem")
        .join(p, col("l_partkey") === col("p_partkey"), "left_semi")
        .join(ps,
          col("l_partkey") === col("ps_partkey") &&
            col("l_suppkey") === col("ps_suppkey"))
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name"),
          year(col("o_orderdate")).cast("int").as("o_year"))
        .agg(sum(profit).cast("double").as("sum_profit"))
        .orderBy(col("n_name"), col("o_year").desc)
    }),

    // TPC-H Q11 (important stock), CANONICAL over the generated
    // partsupp (round 9 — previously lineitem revenue stood in for
    // stock value): value = Σ ps_supplycost·ps_availqty per part
    // through one nation's suppliers — dbgen's exact expression. The
    // canonical 0.0001·SF selectivity dial is replaced by 3× the
    // per-part mean so the threshold AUTO-SCALES with part count; the
    // HAVING-vs-global-scalar compares exact integers in MULTIPLIED
    // form (value·nparts > total·3) — no division on either engine,
    // so the boundary can't flip.
    "q176_tpch11" -> ((s, dir) => {
      val vals = partsuppSynth(s, dir)
        .join(t(s, dir, "supplier"), col("ps_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey") &&
            col("n_name") === "NATION_9")
        .groupBy(col("ps_partkey"))
        .agg(sum((col("ps_supplycost").cast("long") * col("ps_availqty"))
          .cast("decimal(38,0)")).as("__value"))
      val tot = vals.agg(
        sum(col("__value")).as("__total"), count(lit(1)).as("__nparts"))
      vals.crossJoin(broadcast(tot))
        .where(col("__value") * col("__nparts") >
          col("__total") * lit(3).cast("decimal(2,0)"))
        .select(col("ps_partkey"), col("__value").cast("double").as("value"))
        .orderBy(col("value").desc, col("ps_partkey"))
    }),

    // TPC-H Q12 (shipmode priority split; l_shipmode/receipt lag →
    // returnflag classes over one ship year). The canonical
    // conditional-aggregation pivot: both counts ride one join + one
    // partial-combined pass; the date range is pushed to the
    // lineitem scan.
    "q177_tpch12" -> ((s, dir) => {
      val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      t(s, dir, "lineitem")
        .where(col("l_shipdate") >= ts("1997-01-01") &&
          col("l_shipdate") < ts("1998-01-01"))
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(
          sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(!hi, 1L).otherwise(0L)).as("low_line_count"))
        .orderBy("l_returnflag")
    }),

    // TPC-H Q16 (parts/supplier relationship), CANONICAL over the
    // generated partsupp (round 9 — previously observed lineitem
    // suppliers stood in; supplier "complaints" remain negative
    // s_acctbal since s_comment is absent). The NOT IN decorrelates
    // to a left-anti join against the tiny complaint list; distinct
    // supplier counts per (brand, type, size) partial-aggregate
    // through Spark's single-Expand multi-distinct path — partsupp is
    // already one row per pair, so the Expand fans out at pair
    // cardinality by construction.
    "q178_tpch16" -> ((s, dir) => {
      val complaints = t(s, dir, "supplier")
        .where(col("s_acctbal") < 0).select(col("s_suppkey"))
      val p = t(s, dir, "part").where(
        col("p_brand") =!= "Brand#45" && !col("p_type").startsWith("PROMO"))
      partsuppSynth(s, dir)
        .select(col("ps_partkey"), col("ps_suppkey"))
        .join(p, col("ps_partkey") === col("p_partkey"))
        .join(complaints, col("ps_suppkey") === col("s_suppkey"), "left_anti")
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("ps_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
    }),

    // TPC-H Q20 (potential part promotion), CANONICAL over the
    // generated partsupp (round 9 — previously a dominant-supplier
    // shape adaptation): suppliers holding EXCESS stock —
    // ps_availqty > ½ · the quantity they shipped of that red part in
    // 1997 — in one nation. dbgen's nested semi-joins decorrelate
    // outside-in: part-name semi → partsupp → the correlated shipped
    // sum joined on BOTH keys → supplier semi. The ½ compare runs in
    // MULTIPLIED form (availqty·2 > sq), exact integer-vs-decimal on
    // both engines.
    "q179_tpch20" -> ((s, dir) => {
      val redParts = t(s, dir, "part")
        .where(col("p_name").startsWith("red")).select(col("p_partkey"))
      val shipped = t(s, dir, "lineitem")
        .where(col("l_shipdate") >= ts("1997-01-01") &&
          col("l_shipdate") < ts("1998-01-01"))
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(col("l_quantity").cast("decimal(12,2)")).as("__sq"))
      val excess = partsuppSynth(s, dir)
        .join(redParts, col("ps_partkey") === col("p_partkey"), "left_semi")
        .join(shipped,
          col("ps_partkey") === col("l_partkey") &&
            col("ps_suppkey") === col("l_suppkey"))
        .where(col("ps_availqty") * lit(2) > col("__sq"))
        .select(col("ps_suppkey"))
      t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey") &&
            col("n_name") === "NATION_9")
        .join(excess, col("s_suppkey") === col("ps_suppkey"), "left_semi")
        .select(col("s_name"), col("s_acctbal").cast("double").as("s_acctbal"))
        .orderBy("s_name")
    }),

    // TPC-H Q21 (suppliers who kept orders waiting; the late-delivery
    // predicate → returnflag 'R'): the EXISTS(other supplier) +
    // NOT EXISTS(other FAILED supplier) pair evaluates as per-order
    // COUNTS, not self-joins — for a failed (order, supplier) pair,
    // "some other supplier exists" ⟺ the order's distinct-supplier
    // count ≥ 2, and "no other failed supplier" ⟺ its distinct
    // FAILED-supplier count = 1 (this pair's own supplier). One
    // multi-distinct aggregation pass replaces the semi + anti
    // self-joins the classic decorrelation runs — the round-8 shape's
    // distinct-collapse passes scaled with the self-join (10× scale
    // slope 12.6, the audit's worst row); the count formulation is a
    // single lineitem Expand + two orderkey-co-partitioned joins.
    "q180_tpch21" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"), col("l_returnflag"))
      val perOrder = l.groupBy(col("l_orderkey").as("__ok"))
        .agg(
          countDistinct(col("l_suppkey")).as("__n_supp"),
          countDistinct(when(col("l_returnflag") === "R",
            col("l_suppkey"))).as("__n_failed"))
      val failed = l.where(col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_suppkey")).distinct
      val fOrders = t(s, dir, "orders")
        .where(col("o_orderstatus") === "F").select(col("o_orderkey"))
      failed
        .join(perOrder, col("l_orderkey") === col("__ok"))
        .where(col("__n_supp") >= 2 && col("__n_failed") === 1)
        .join(fOrders, col("l_orderkey") === col("o_orderkey"), "left_semi")
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(20)
    })
  )

  private val rev =
    """CAST(l_extendedprice AS DECIMAL(12,2)) *
      |    (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))""".stripMargin

  val oracles: Map[String, String] = Map(

    "q139_tpch3" ->
      s"""SELECT l_orderkey, o_orderdate, CAST(SUM($rev) AS DOUBLE) AS revenue
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-03-15'
         |  AND l_shipdate > TIMESTAMP '1998-03-15'
         |GROUP BY l_orderkey, o_orderdate
         |ORDER BY revenue DESC, o_orderdate, l_orderkey
         |LIMIT 10""".stripMargin,

    "q140_tpch5" ->
      s"""SELECT n_name, CAST(SUM($rev) AS DOUBLE) AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1997-01-01'
         |  AND o_orderdate < TIMESTAMP '1998-01-01'
         |GROUP BY n_name
         |ORDER BY revenue DESC, n_name""".stripMargin,

    "q141_tpch6" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |                CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,

    "q142_tpch7" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |  CAST(year(l_shipdate) AS INT) AS l_year,
         |  CAST(SUM($rev) AS DOUBLE) AS revenue
         |FROM lineitem
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
         |  AND l_shipdate BETWEEN TIMESTAMP '1996-01-01'
         |                     AND TIMESTAMP '1997-12-31'
         |GROUP BY 1, 2, 3
         |ORDER BY 1, 2, 3""".stripMargin,

    "q143_tpch8" ->
      s"""SELECT CAST(year(o_orderdate) AS INT) AS o_year,
         |  round(
         |    CAST(SUM(CASE WHEN n1.n_name = 'NATION_3'
         |                  THEN $rev
         |                  ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) /
         |    CAST(SUM($rev) AS DOUBLE), 6) AS mkt_share
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |JOIN region ON n2.n_regionkey = r_regionkey
         |JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |WHERE p_type = 'STANDARD' AND r_name = 'EUROPE'
         |  AND o_orderdate BETWEEN TIMESTAMP '1996-01-01'
         |                      AND TIMESTAMP '1997-12-31'
         |GROUP BY 1
         |ORDER BY 1""".stripMargin,

    "q144_tpch10" ->
      s"""SELECT c_custkey, c_name, c_acctbal, n_name,
         |  CAST(SUM($rev) AS DOUBLE) AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE l_returnflag = 'R'
         |  AND o_orderdate >= TIMESTAMP '2000-10-01'
         |  AND o_orderdate < TIMESTAMP '2001-01-01'
         |GROUP BY c_custkey, c_name, c_acctbal, n_name
         |ORDER BY revenue DESC, c_custkey
         |LIMIT 20""".stripMargin,

    "q145_tpch13" ->
      """SELECT c_count, COUNT(*) AS custdist
        |FROM (
        |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey)
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q146_tpch14" ->
      s"""SELECT round(
         |  100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
         |                        THEN $rev
         |                        ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) /
         |  CAST(SUM($rev) AS DOUBLE), 6) AS promo_revenue
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE l_shipdate >= TIMESTAMP '1998-09-01'
         |  AND l_shipdate < TIMESTAMP '1998-10-01'""".stripMargin,

    "q147_tpch15" ->
      s"""WITH revenue AS (
         |  SELECT l_suppkey, CAST(SUM($rev) AS DOUBLE) AS total_revenue
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1999-01-01'
         |    AND l_shipdate < TIMESTAMP '1999-04-01'
         |  GROUP BY l_suppkey)
         |SELECT s_suppkey, s_name, total_revenue
         |FROM supplier JOIN revenue ON s_suppkey = l_suppkey
         |WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
         |ORDER BY s_suppkey""".stripMargin,

    "q148_tpch17" ->
      """WITH li AS (
        |  SELECT l_partkey, l_quantity, l_extendedprice
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_brand = 'Brand#1'
        |), avgs AS (
        |  SELECT l_partkey AS pk,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) /
        |      CAST(COUNT(*) AS DOUBLE) AS avg_qty
        |  FROM li GROUP BY l_partkey)
        |SELECT
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0
        |    AS avg_yearly,
        |  COUNT(*) AS n_items
        |FROM li JOIN avgs ON l_partkey = pk
        |WHERE l_quantity < 0.2 * avg_qty""".stripMargin,

    "q149_tpch18" ->
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  sum_qty
        |FROM (
        |  SELECT l_orderkey AS ok, SUM(l_quantity) AS sum_qty
        |  FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 400)
        |JOIN orders ON o_orderkey = ok
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey""".stripMargin,

    "q150_tpch19" ->
      s"""SELECT CAST(SUM($rev) AS DOUBLE) AS revenue, COUNT(*) AS n_items
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
         |       AND l_quantity BETWEEN 1 AND 11)
         |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
         |       AND l_quantity BETWEEN 10 AND 20)
         |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
         |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin,

    "q151_tpch22" ->
      """WITH avg_bal AS (
        |  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(14,2))) AS DOUBLE) /
        |    CAST(COUNT(*) AS DOUBLE) AS ab
        |  FROM customer WHERE c_acctbal > 0)
        |SELECT c_mktsegment, COUNT(*) AS numcust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(14,2))) AS DOUBLE) AS totacctbal
        |FROM customer, avg_bal
        |WHERE c_acctbal > ab
        |  AND NOT EXISTS (
        |    SELECT 1 FROM orders
        |    WHERE o_custkey = c_custkey
        |      AND o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,

    "q173_tpch2" ->
      s"""WITH $psCte, regional AS (
         |  SELECT ps.ps_partkey, ps.ps_suppkey, ps.ps_supplycost,
         |         s.s_acctbal, s.s_name, n.n_name
         |  FROM ps
         |  JOIN supplier s ON ps.ps_suppkey = s.s_suppkey
         |  JOIN nation n ON s.s_nationkey = n.n_nationkey
         |  JOIN region r ON n.n_regionkey = r.r_regionkey
         |    AND r.r_name = 'EUROPE'
         |  WHERE ps.ps_partkey IN
         |    (SELECT p_partkey FROM part WHERE p_size = 15)
         |), minc AS (
         |  SELECT ps_partkey AS mk, MIN(ps_supplycost) AS min_cost
         |  FROM regional GROUP BY ps_partkey
         |)
         |SELECT s_acctbal, s_name, n_name, ps_partkey AS p_partkey,
         |  CAST(ps_supplycost AS INT) AS ps_supplycost
         |FROM regional JOIN minc
         |  ON ps_partkey = mk AND ps_supplycost = min_cost
         |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
         |LIMIT 20""".stripMargin,

    "q174_tpch4" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-07-01'
        |  AND o_orderdate < TIMESTAMP '1997-10-01'
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q175_tpch9" ->
      s"""WITH $psCte
         |SELECT n_name, CAST(year(o_orderdate) AS INT) AS o_year,
         |  CAST(SUM($rev
         |    - CAST(l_quantity AS DECIMAL(12,2))
         |      * CAST(ps_supplycost AS DECIMAL(12,2)))
         |    AS DOUBLE) AS sum_profit
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey AND p_name LIKE 'red%'
         |JOIN ps ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY n_name, year(o_orderdate)
         |ORDER BY n_name, o_year DESC""".stripMargin,

    "q176_tpch11" ->
      s"""WITH $psCte, vals AS (
         |  SELECT ps_partkey,
         |    SUM(CAST(ps_supplycost AS BIGINT) * ps_availqty) AS value
         |  FROM ps
         |  JOIN supplier ON ps_suppkey = s_suppkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |    AND n_name = 'NATION_9'
         |  GROUP BY ps_partkey
         |), tot AS (
         |  SELECT SUM(value) AS total, COUNT(*) AS nparts FROM vals
         |)
         |SELECT ps_partkey, CAST(value AS DOUBLE) AS value
         |FROM vals CROSS JOIN tot
         |WHERE value * nparts > total * 3
         |ORDER BY value DESC, ps_partkey""".stripMargin,

    "q177_tpch12" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |      THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |      THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q178_tpch16" ->
      s"""WITH $psCte
         |SELECT p_brand, p_type, p_size,
         |  COUNT(DISTINCT ps_suppkey) AS supplier_cnt
         |FROM ps
         |JOIN part ON ps_partkey = p_partkey
         |  AND p_brand <> 'Brand#45' AND p_type NOT LIKE 'PROMO%'
         |WHERE ps_suppkey NOT IN (
         |  SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
         |GROUP BY p_brand, p_type, p_size
         |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    "q179_tpch20" ->
      s"""WITH $psCte, shipped AS (
         |  SELECT l_partkey, l_suppkey,
         |    SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sq
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
         |    AND l_shipdate < TIMESTAMP '1998-01-01'
         |  GROUP BY l_partkey, l_suppkey
         |), excess AS (
         |  SELECT DISTINCT ps_suppkey
         |  FROM ps
         |  JOIN shipped ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
         |  WHERE ps_partkey IN (
         |      SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
         |    AND ps_availqty * 2 > sq
         |)
         |SELECT s_name, CAST(s_acctbal AS DOUBLE) AS s_acctbal
         |FROM supplier
         |JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_9'
         |WHERE s_suppkey IN (SELECT ps_suppkey FROM excess)
         |ORDER BY s_name""".stripMargin,

    "q180_tpch21" ->
      """WITH l AS (
        |  SELECT DISTINCT l_orderkey, l_suppkey, l_returnflag FROM lineitem
        |), failed AS (
        |  SELECT DISTINCT l_orderkey, l_suppkey FROM l
        |  WHERE l_returnflag = 'R'
        |), su AS (
        |  SELECT DISTINCT l_orderkey, l_suppkey FROM l
        |)
        |SELECT s_name, COUNT(*) AS numwait
        |FROM failed f
        |JOIN supplier ON f.l_suppkey = s_suppkey
        |WHERE EXISTS (
        |    SELECT 1 FROM su o WHERE o.l_orderkey = f.l_orderkey
        |      AND o.l_suppkey <> f.l_suppkey)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM failed o3 WHERE o3.l_orderkey = f.l_orderkey
        |      AND o3.l_suppkey <> f.l_suppkey)
        |  AND EXISTS (
        |    SELECT 1 FROM orders WHERE o_orderkey = f.l_orderkey
        |      AND o_orderstatus = 'F')
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 20""".stripMargin
  )
}
