package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/**
 * One-pass numeric dataset profiling: for each requested column,
 * count / nulls / distinct / min / max / mean / std — ALL columns'
 * statistics ride a single scan+aggregate (the [[Quality]] shape:
 * N columns, one pass, not one job per column), then the wide
 * aggregate row explodes into long-format (col_name, stat, value).
 *
 * Determinism contract: values are accumulated as DECIMAL(18,
 * `scale`) — exact integer arithmetic — and only the FINAL mean /
 * variance arithmetic runs in double, in a fixed operation order. A
 * plain `avg`/`stddev` over doubles is partition-order-dependent
 * (float addition is not associative) and can't be oracle-pinned;
 * this shape is bit-reproducible across engines and partitionings
 * for any column exactly representable at `scale` (integers, money).
 *
 * Scale: one partial-aggregated pass. With exact distinct counts
 * (`approxDistinct = false`, the oracle-pinnable default) the
 * multi-distinct plans as a single Expand (the q59 multi-distinct
 * shape) — ONE reshuffle level, but the Expand multiplies scanned
 * rows by the number of profiled columns. `approxDistinct = true` is
 * the 100 TB path: HLL++ sketches (rsd 1%) are plain mergeable
 * aggregates, so the Expand disappears and the whole profile is a
 * single partial-combined pass regardless of column count; every
 * other statistic is unchanged.
 */
object Profile {

  def numeric(df: DataFrame, cols: Seq[String], scale: Int = 2,
      approxDistinct: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "need at least one column to profile")
    def d(c: String) = col(c).cast(DecimalType(18, scale))
    def distinctAgg(c: String) =
      if (approxDistinct) approx_count_distinct(col(c), rsd = 0.01)
      else countDistinct(col(c))
    val metrics = cols.flatMap { c =>
      Seq(
        count(col(c)).cast("double").as(s"${c}__count"),
        (count(lit(1)) - count(col(c))).cast("double").as(s"${c}__nulls"),
        distinctAgg(c).cast("double").as(s"${c}__distinct"),
        min(d(c)).cast("double").as(s"${c}__min"),
        max(d(c)).cast("double").as(s"${c}__max"),
        sum(d(c)).cast("double").as(s"${c}__sum"),
        sum(d(c) * d(c)).cast("double").as(s"${c}__sumsq"))
    }
    val agged = df.agg(metrics.head, metrics.tail: _*)
    val rows = cols.flatMap { c =>
      val cnt = col(s"${c}__count")
      val s1 = col(s"${c}__sum")
      val s2 = col(s"${c}__sumsq")
      // cnt <= 1 would divide 0.0/0.0 → NaN (and Spark's greatest
      // treats NaN as largest, so it would survive the clamp); pin
      // the degenerate case to 0.0 — also what the SQL formulation
      // yields via NULL propagation, keeping oracle parity.
      val variance = when(cnt > 1.0, (s2 - s1 * s1 / cnt) / (cnt - 1))
        .otherwise(lit(0.0))
      Seq(
        ("count", cnt),
        ("nulls", col(s"${c}__nulls")),
        ("distinct", col(s"${c}__distinct")),
        ("min", col(s"${c}__min")),
        ("max", col(s"${c}__max")),
        ("mean", s1 / cnt),
        ("std", sqrt(greatest(variance, lit(0.0))))
      ).map { case (statName, v) =>
        struct(
          lit(c).as("col_name"),
          lit(statName).as("stat"),
          round(v, 6).as("value"))
      }
    }
    agged.select(explode(array(rows: _*)).as("r")).select("r.*")
  }
}
