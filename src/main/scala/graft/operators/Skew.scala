package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew-mitigation utilities for hot join/aggregation keys — the
 * manual counterpart to AQE's skew-join splitting, for when the skew
 * is known ahead of time (a mega-customer, an empty-string key, a
 * null-bucket) and the plan must be right without runtime re-planning.
 */
object Skew {

  /**
   * Salted inner equi-join: the large (skewed) side derives a salt in
   * [0, saltParts) from `saltSource` (any column that varies within a
   * hot key — a line number, an event id), spreading each hot key's
   * rows over `saltParts` shuffle partitions; the small side is
   * replicated `saltParts`× so every (key, salt) bucket finds its
   * match. Row-identical to the plain join — only the partitioning
   * changes.
   *
   * Scale: a hot key that would pin one reducer at 100 TB now spreads
   * over `saltParts` reducers at the cost of replicating the small
   * side's matching rows. Use when the small side is too big to
   * broadcast but small enough to replicate; for unknown skew, leave
   * it to AQE (`spark.sql.adaptive.skewJoin.enabled`).
   *
   * Join keys must carry the same names on both sides; rename before
   * calling.
   */
  def saltedEquiJoin(
      large: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      saltParts: Int,
      saltSource: Column): DataFrame = {
    val salted = large.withColumn(
      "__salt", pmod(hash(saltSource), lit(saltParts)))
    val replicated = small.withColumn(
      "__salt", explode(sequence(lit(0), lit(saltParts - 1))))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }

  /**
   * Two-phase salted aggregation for hot grouping keys: partial
   * aggregates on (key, salt), then final aggregates on key. Spark's
   * hash aggregation already map-side-combines, which handles most
   * key skew; this helps when a single key's PARTIAL results still
   * overwhelm one reducer (extreme cardinality-1 skew) or the
   * aggregate buffer is wide.
   *
   * `partials` aggregate the salted groups; `finals` must re-combine
   * the partial columns (e.g. partial `sum(x) as s` then final
   * `sum(s)`).
   */
  def saltedAggregate(
      df: DataFrame,
      keys: Seq[String],
      saltSource: Column,
      saltParts: Int,
      partials: Seq[Column],
      finals: Seq[Column]): DataFrame = {
    val keyCols = keys.map(col)
    df.withColumn("__salt", pmod(hash(saltSource), lit(saltParts)))
      .groupBy((keyCols :+ col("__salt")): _*)
      .agg(partials.head, partials.tail: _*)
      .groupBy(keyCols: _*)
      .agg(finals.head, finals.tail: _*)
  }
}
