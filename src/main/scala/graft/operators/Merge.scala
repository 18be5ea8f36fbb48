package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Snapshot maintenance: apply a keyed changelog (upserts + deletes)
 * to a base table — the MERGE INTO / CDC-apply primitive every lake
 * pipeline needs (extension family; the reference's only write
 * semantics is partition overwrite, K1).
 *
 * Scale posture: ONE anti-join shuffle on the merge key (base is the
 * 100 TB side; the changelog is typically much smaller and AQE
 * broadcasts the anti-join when it fits) plus a union with the
 * upsert slice — no window, no full-outer join, no per-key state.
 * Changelogs with multiple rows per key must be pre-compacted to
 * latest-wins (`compactChangelog`, one changelog-sized window keyed
 * on the merge key).
 */
object Merge {

  /**
   * Latest-wins compaction of a changelog with one `seqCol` ordering
   * column: keeps each key's highest-sequence row.
   */
  def compactChangelog(
      changes: DataFrame, keyCols: Seq[String], seqCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(seqCol).desc)
    changes
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }

  /**
   * Apply a compacted changelog to `base`. `opCol` holds "U" (upsert:
   * insert or replace the keyed row) or "D" (delete the keyed row).
   * Schema of `changes` minus `opCol` must equal `base`'s schema.
   */
  def applyChangelog(
      base: DataFrame, changes: DataFrame, keyCols: Seq[String],
      opCol: String): DataFrame = {
    val touched = changes.select(keyCols.map(col): _*)
    base
      .join(touched, keyCols, "left_anti")
      .unionByName(changes.where(col(opCol) === "U").drop(opCol))
  }

  /**
   * SCD2 history build: collapse a keyed changelog into
   * slowly-changing-dimension type-2 validity intervals — one row per
   * VALUE EPISODE with `valid_from` / `valid_to` (NULL = current) and
   * an `is_current` flag. Consecutive rows carrying the SAME value
   * are no-op updates and collapse into the open episode (a source
   * that re-emits unchanged state every sync would otherwise mint a
   * new version per sync); the value changing — including A→B→A —
   * closes the episode and opens a new one with a fresh
   * `version_seq`.
   *
   * `valid_to` is the next episode's `valid_from` (half-open
   * [from, to) intervals, the join-friendly convention: an as-of
   * probe at time t matches exactly one version via
   * `from <= t < coalesce(to, infinity)`).
   *
   * Scale: ONE hash exchange on the key serves all three windows
   * (change-detection lag, episode running sum, next-episode lead
   * after the per-episode aggregate — same partitioning, Spark
   * reuses it). Per-key state is that key's sort; no self-joins, no
   * corpus-sized broadcast.
   */
  def scd2History(
      changelog: DataFrame, keyCol: String, tsCol: String, tieCol: String,
      valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val episodes = changelog
      .withColumn("__chg",
        when(lag(col(valueCol), 1).over(w).isNull ||
          lag(col(valueCol), 1).over(w) =!= col(valueCol), 1L)
          .otherwise(0L))
      .withColumn("version_seq", sum(col("__chg")).over(w))
      .groupBy(col(keyCol), col("version_seq"))
      .agg(
        // Every row in an episode carries the identical value (that
        // is what defines the episode), so first() is deterministic.
        first(col(valueCol)).as(valueCol),
        min(col(tsCol)).as("valid_from"),
        count(lit(1)).as("n_updates"))
    val nextFrom = Window.partitionBy(col(keyCol)).orderBy(col("version_seq"))
    episodes
      .withColumn("valid_to", lead(col("valid_from"), 1).over(nextFrom))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /**
   * Keyed snapshot diff — the reconciliation primitive: given two
   * snapshots of the same keyed entity (yesterday's table vs
   * today's, source-of-truth vs derived copy, pre- vs post-backfill),
   * classify every key as `added` (new only), `removed` (old only),
   * `changed` (both, any compare column differs) or `stable`. The
   * audit behind "what did this pipeline run actually touch" and the
   * first tool out of the box when a replica drifts.
   *
   * Comparison is null-safe per tuple (`<=>` over a struct of the
   * compare columns): a NULL→value transition counts as `changed`,
   * NULL→NULL as `stable` — matching SQL's IS NOT DISTINCT FROM,
   * which the oracle mirrors.
   *
   * Scale: ONE full-outer sort-merge join on the key — both sides
   * shuffle-partitioned by key, no window, no driver state; AQE
   * broadcasts if either snapshot is small. Output carries both
   * sides' compare values so downstream filters (`status = 'changed'`)
   * need no second lookup.
   */
  def snapshotDiff(
      oldDf: DataFrame, newDf: DataFrame, keyCol: String,
      compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "snapshotDiff: compareCols is empty")
    val o = oldDf.select(
      col(keyCol),
      struct(compareCols.map(col): _*).as("__old"))
    val n = newDf.select(
      col(keyCol),
      struct(compareCols.map(col): _*).as("__new"))
    val joined = o.join(n, Seq(keyCol), "full_outer")
    val status = when(col("__old").isNull, "added")
      .when(col("__new").isNull, "removed")
      .when(col("__old") <=> col("__new"), "stable")
      .otherwise("changed")
    val oldSide = compareCols.map(c => col(s"__old.$c").as(s"old_$c"))
    val newSide = compareCols.map(c => col(s"__new.$c").as(s"new_$c"))
    joined.select(col(keyCol) +: status.as("status") +:
      (oldSide ++ newSide): _*)
  }

  /**
   * Survivorship / golden-record merge — the entity-resolution
   * endgame: collapse every key's version history to ONE record
   * where each field independently takes its value from the most
   * recent version (under `orderCols`) in which that field is
   * non-null. The MDM "latest non-null wins, per attribute" rule:
   * a later partial update must not erase an earlier field it
   * didn't carry.
   *
   * Determinism: `orderCols` must be a TOTAL order within each key
   * (include a unique tiebreaker) — then each field's survivor is a
   * pure function of the data. NULL-only fields survive as NULL.
   *
   * Scale: one key exchange; the full-frame `last(ignoreNulls)`
   * windows, the running row_number, and the per-key count all ride
   * the SAME (key, order) sort — no join, no second shuffle, state
   * bounded by a key's version span. The keep-one filter
   * (`rn = n`) picks the last physical row, whose full-frame window
   * values equal every other row's — engine-independent.
   *
   * Output: (keyCol, n_versions, fields*), one row per key.
   */
  def goldenRecord(
      df: DataFrame, keyCol: String, orderCols: Seq[String],
      fields: Seq[String]): DataFrame = {
    require(orderCols.nonEmpty, "goldenRecord: orderCols is empty")
    require(fields.nonEmpty, "goldenRecord: fields is empty")
    import org.apache.spark.sql.expressions.Window
    val ord = orderCols.map(col)
    val wFull = Window.partitionBy(col(keyCol)).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wRun = Window.partitionBy(col(keyCol)).orderBy(ord: _*)
    val wAll = Window.partitionBy(col(keyCol))
    df.select(col(keyCol) +: (orderCols ++ fields).distinct.map(col): _*)
      .select(
        col(keyCol) +:
          row_number().over(wRun).cast("long").as("__rn") +:
          count(lit(1)).over(wAll).as("n_versions") +:
          fields.map(f => last(col(f), ignoreNulls = true)
            .over(wFull).as(f)): _*)
      .where(col("__rn") === col("n_versions"))
      .select(col(keyCol) +: col("n_versions") +: fields.map(col): _*)
  }
}
