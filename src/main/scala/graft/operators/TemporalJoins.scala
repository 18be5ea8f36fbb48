package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Time-series join operators Spark lacks natively — built by
 * composing existing operators (the brief's preference (a)), so
 * Catalyst plans and scales them like any other shuffle/window work.
 */
object TemporalJoins {

  /**
   * As-of join: for each left row, the values of the LATEST right row
   * with `right.ts <= left.ts` within the same key (NULLs when no
   * right row precedes the left row).
   *
   * Implementation: tag both sides, union by name, and take
   * `last(row-struct, ignoreNulls)` over a per-key window ordered by
   * (ts, side) — right rows sort before left rows at equal
   * timestamps, so a same-instant right row IS visible to the left
   * row (ts ≤ semantics, matching DuckDB's ASOF JOIN). Right values
   * ride in a STRUCT (non-null whenever a right row exists), so
   * `ignoreNulls` skips only left rows — a matched right row whose
   * value is itself NULL yields NULL, not a stale older value (the
   * naive per-value `last(value, ignoreNulls)` gets this wrong).
   *
   * Scale: ONE shuffle (the window's hash partition by key) over
   * left+right combined — the same cost as a plain window; no
   * range-condition nested-loop join anywhere. Right rows must be
   * unique per (key, ts); pre-aggregate otherwise. `valueCols` must
   * not collide with left-side column names.
   */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCols: Seq[String]): DataFrame = {
    val collisions = valueCols.toSet.intersect(left.columns.toSet)
    require(
      collisions.isEmpty,
      s"asofJoin valueCols collide with left columns: $collisions — " +
        "rename the right-side value columns first")
    val l = left.withColumn("__side", lit(1))
    val r = right.select(
      col(keyCol), col(tsCol),
      struct(valueCols.map(col): _*).as("__rrow"),
      lit(0).as("__side"))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = unioned.withColumn(
      "__rrow", last(col("__rrow"), ignoreNulls = true).over(w))
    val extracted = valueCols.foldLeft(filled) { (df, c) =>
      df.withColumn(c, col("__rrow").getField(c))
    }
    extracted.where(col("__side") === 1).drop("__side", "__rrow")
  }

  /**
   * Range (interval) join: left point rows matched to right interval
   * rows with `start <= point < end`, equi-keyed.
   *
   * Implementation: intervals explode into fixed-width bins
   * (`binWidth`, same unit as the point column), points map to their
   * bin, and the join runs on (key, bin) followed by the exact range
   * predicate. This turns an otherwise nested-loop range condition
   * into an equi-shuffle whose fan-out is interval-length/binWidth.
   *
   * Scale: pick `binWidth` near the typical interval length — the
   * bin explosion is then O(1) per interval and each point probes
   * one bucket. A plain `ts BETWEEN start AND end` join compiles to
   * BroadcastNestedLoopJoin, which is O(n·m) and unrunnable at scale.
   */
  def rangeJoin(
      points: DataFrame,
      intervals: DataFrame,
      keyCol: String,
      pointCol: String,
      startCol: String,
      endCol: String,
      binWidth: Long): DataFrame = {
    // Malformed intervals (end <= start) would make `sequence` infer a
    // descending step and explode a potentially huge (or over-limit)
    // array; they can never match the exact predicate anyway, so drop
    // them before binning.
    val binned = intervals
      .where(col(endCol) > col(startCol))
      .withColumn(
        "__bin",
        explode(sequence(
          floor(col(startCol) / binWidth).cast("long"),
          floor((col(endCol) - 1) / binWidth).cast("long"))))
    val p = points.withColumn(
      "__bin", floor(col(pointCol) / binWidth).cast("long"))
    p.join(binned, Seq(keyCol, "__bin"))
      .where(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__bin")
  }

  /**
   * Interval-overlap join: left interval rows matched to right
   * interval rows whose half-open spans intersect
   * (`lStart < rEnd && rStart < lEnd`) — the two-sided sibling of
   * [[rangeJoin]] (sessions × incident windows, visits ×
   * promotions). Unkeyed: pass a literal key column on both sides if
   * a natural equi-key exists — it composes into the bin key.
   *
   * Implementation: BOTH sides explode into fixed-width bins; a pair
   * overlapping anywhere shares the bin containing the overlap
   * start, so the equi-join on the bin finds every pair. Each pair
   * is emitted ONCE via the dedup condition "this bin is the overlap
   * start's bin" — no distinct pass over the matched set, the exact
   * predicate and dedup filter evaluate in the same stage as the
   * join.
   *
   * Scale: fan-out per row is length/binWidth (pick binWidth near
   * the typical interval length); the join is an equi-shuffle on the
   * bin, never the BroadcastNestedLoopJoin a raw overlap predicate
   * compiles to. Degenerate zero/negative-length intervals can never
   * overlap under half-open semantics and are dropped before binning
   * (descending `sequence` guard, as in [[rangeJoin]]).
   */
  def intervalOverlapJoin(
      left: DataFrame, right: DataFrame,
      lStart: String, lEnd: String,
      rStart: String, rEnd: String,
      binWidth: Long): DataFrame = {
    require(binWidth >= 1, s"binWidth must be >= 1, got $binWidth")
    def binned(df: DataFrame, s: String, e: String): DataFrame = df
      .where(col(e) > col(s))
      .withColumn("__bin", explode(sequence(
        floor(col(s) / binWidth).cast("long"),
        floor((col(e) - 1) / binWidth).cast("long"))))
    val overlapStart = greatest(col(lStart), col(rStart))
    binned(left, lStart, lEnd)
      .join(binned(right, rStart, rEnd), Seq("__bin"))
      .where(col(lStart) < col(rEnd) && col(rStart) < col(lEnd) &&
        col("__bin") === floor(overlapStart / binWidth).cast("long"))
      .drop("__bin")
  }
}
