package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Scale-safe global ordinals and prefix sums over an arbitrary total
 * order — the DataFrame-native replacement for BOTH
 * `rdd.zipWithIndex` (an extra count job + an RDD round-trip out of
 * whole-stage codegen) and the un-partitioned rank/cumsum window
 * (the classic whole-corpus one-task funnel).
 *
 * Two-level decomposition — [[TimeSeries.runningTotal]]'s K12 shape
 * generalized from a numeric bucket key to ANY total order: rows
 * range-partition by the full sort key (sampled CONTIGUOUS ranges,
 * so the split is skew-proof even when one leading key value
 * dominates — e.g. the Zipf `cnt=1` vocabulary tail — because the
 * tiebreaker columns keep subdividing); each bucket ranks and
 * prefix-sums internally in parallel; per-bucket totals (`buckets`
 * rows) take EXCLUSIVE running offsets in one tiny single-partition
 * window; the offsets broadcast-join back. Cost honesty: the
 * in-bucket window's ClusteredDistribution(bucket id) is NOT
 * satisfied statically by the range partitioning, so rows cross TWO
 * full-data exchanges (range + hash-by-bucket) — the accepted price
 * for removing the corpus-wide single-task window; at gate scale it
 * is a sub-second constant (SCALE.md round-8 notes).
 *
 * The bucket id is `spark_partition_id()` materialized AFTER the
 * range exchange. That is safe precisely because the expression is
 * nondeterministic-flagged: Catalyst will not push the projection
 * below the exchange, so the id read is the post-range-shuffle
 * partition — contiguous in the sort order by construction.
 *
 * LOAD-BEARING REUSE: the offsets branch and the ranked branch both
 * consume the range exchange, and RangePartitioner's sample seed
 * derives from the materialized RDD id — two INDEPENDENT
 * materializations could sample different bucket boundaries and
 * silently mismatch offsets against ranks. Exchange/stage reuse
 * (canonical-plan dedup, on by default; AQE's stage cache is gated
 * on the SAME conf) makes the exchange compute once; [[withOrdinals]]
 * fails fast when `spark.sql.exchange.reuse` is disabled rather than
 * risk silent corruption.
 *
 * NULLs in `sums` expressions are treated as 0 (coalesced inside
 * both levels); note a plain single-window cumsum instead yields
 * NULL until the first non-null value — coalesce upstream if that
 * distinction matters.
 */
object Ordinals {

  /**
   * Adds `rankCol` = 1-based global `row_number` under `order` and,
   * for each `(expr, name)` in `sums`, a column `name` = INCLUSIVE
   * prefix sum of `expr` under the same order. `order` must be a
   * total order (include a unique tiebreaker) for the output to be
   * deterministic. `buckets` sizes the first level: pick it so
   * |rows|/buckets fits one task comfortably; the second-level
   * window sees exactly `buckets` rows.
   */
  def withOrdinals(
      df: DataFrame, order: Seq[Column], rankCol: String,
      sums: Seq[(Column, String)] = Nil, buckets: Int = 256): DataFrame = {
    require(order.nonEmpty, "order must name at least one sort column")
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    // AQE's stage cache is ALSO gated on exchangeReuseEnabled
    // (AdaptiveSparkPlanExec consults the cache only under that conf),
    // so the flag alone decides — there is no AQE fallback arm.
    require(
      df.sparkSession.conf.get("spark.sql.exchange.reuse", "true").toBoolean,
      "Ordinals.withOrdinals needs spark.sql.exchange.reuse=true: with it " +
        "disabled the two consumers of the range exchange could sample " +
        "different bucket boundaries and silently corrupt ranks")
    val staged = df.repartitionByRange(buckets, order: _*)
      .withColumn("__ord_b", spark_partition_id())
    val overBuckets = Window.orderBy(col("__ord_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val totalAggs = count(lit(1)).as("__ord_n") +:
      sums.zipWithIndex.map { case ((e, _), i) =>
        sum(coalesce(e, lit(0))).as(s"__ord_s$i") }
    val offsets = staged
      .groupBy(col("__ord_b"))
      .agg(totalAggs.head, totalAggs.tail: _*)
      .select(
        col("__ord_b") +:
        coalesce(sum(col("__ord_n")).over(overBuckets), lit(0L))
          .as("__ord_roff") +:
        sums.indices.map(i =>
          coalesce(sum(col(s"__ord_s$i")).over(overBuckets), lit(0))
            .as(s"__ord_off$i")): _*)
    val wOrd = Window.partitionBy(col("__ord_b")).orderBy(order: _*)
    val wCum = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = staged
      .join(broadcast(offsets), Seq("__ord_b"))
      .withColumn(rankCol,
        col("__ord_roff") + row_number().over(wOrd).cast("long"))
    val summed = sums.zipWithIndex.foldLeft(ranked) {
      case (acc, ((e, name), i)) =>
        acc.withColumn(name,
          col(s"__ord_off$i") + sum(coalesce(e, lit(0))).over(wCum))
    }
    summed.drop(
      "__ord_b" +: "__ord_roff" +: sums.indices.map(i => s"__ord_off$i"): _*)
  }
}
