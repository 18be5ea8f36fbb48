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
}
