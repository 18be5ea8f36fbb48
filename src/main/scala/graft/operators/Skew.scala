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

  /**
   * Join-key skew diagnostic — the measurement that feeds
   * [[saltedEquiJoin]]'s `saltParts` dial: the `topK` hottest keys
   * with their row count, share of the table, multiple over a
   * perfectly uniform key (share × distinct keys), and the salt
   * factor that would spread that key back to uniform-reducer load
   * (`ceil(multiple)`, min 1).
   *
   * Scale: one partial-combined count per key, a one-row totals frame
   * cross-joined (never collected), and TakeOrderedAndProject bounds
   * the result at `topK` — no global sort, no driver materialization
   * of the key histogram. Run it on a sample for a quick look; exact
   * on the full table is one aggregation pass.
   */
  def skewProbe(df: DataFrame, keyCol: String, topK: Int): DataFrame = {
    val counts = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("n_rows"))
    val totals = df.agg(
      count(lit(1)).as("__total"),
      countDistinct(col(keyCol)).as("__distinct"))
    val mult = col("n_rows") * col("__distinct") / col("__total")
    counts.crossJoin(totals)
      .orderBy(col("n_rows").desc, col("key").asc)
      .limit(topK)
      .select(
        col("key"), col("n_rows"),
        round(col("n_rows").cast("double") / col("__total"), 6).as("share"),
        round(mult, 3).as("uniform_multiple"),
        greatest(ceil(mult), lit(1L)).as("suggested_salt"))
  }

  /**
   * K14: exact join-size profile — BEFORE running an equi-join,
   * compute exactly how many rows it would produce and which keys
   * produce them: |A ⋈ B| = Σ_k cntA(k)·cntB(k). The go/no-go probe
   * in front of any self-join or n:m join ([[skewProbe]] measures
   * one side's skew; this measures the JOIN's blow-up, which is what
   * actually OOMs a stage — a key holding 1% of each side contributes
   * 0.01%·|A|·|B| pairs). Output: the `topK` keys by pair
   * contribution with both side counts, the pair count, and its
   * share of the total join size.
   *
   * Scale: the joined tables are never touched beyond ONE
   * partial-combined count aggregation each — the profile join runs
   * at DISTINCT-KEY cardinality, the total is a one-row cross join
   * (the q147 broadcast idiom, never a collect), and the top-K is a
   * TakeOrderedAndProject. Cost is two scans + key-cardinality
   * work, independent of the hypothetical join's output size —
   * that's the point: the 10¹²-pair join you decided not to run.
   */
  def joinSizeProfile(
      left: DataFrame, leftKey: String,
      right: DataFrame, rightKey: String,
      topK: Int = 20): DataFrame = {
    require(topK >= 1, s"joinSizeProfile: topK must be >= 1, got $topK")
    val cl = left.groupBy(col(leftKey).as("key"))
      .agg(count(lit(1)).as("n_left"))
    val cr = right.groupBy(col(rightKey).as("key"))
      .agg(count(lit(1)).as("n_right"))
    // pairs multiply + sum in DECIMAL(38,0): a Long product overflows
    // at ~3e9 rows per side on one key — exactly the pathological
    // join this probe exists to catch — and a wrapped-negative count
    // would sort the most dangerous key LAST. Rendered as digits
    // (the q189 cross-engine rule for >64-bit exact integers).
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val contrib = cl.join(cr, "key")
      .select(col("key"), col("n_left"), col("n_right"),
        (col("n_left").cast(dec38) * col("n_right")).as("__pairs"))
    val total = contrib.agg(
      coalesce(sum(col("__pairs")), lit(0).cast(dec38)).as("__total"))
    contrib.crossJoin(total)
      .orderBy(col("__pairs").desc, col("key").asc)
      .limit(topK)
      .select(
        col("key"), col("n_left"), col("n_right"),
        col("__pairs").cast("string").as("pairs"),
        round(col("__pairs").cast("double") / col("__total").cast("double"),
          6).as("share"))
  }
}
