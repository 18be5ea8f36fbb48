package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Time-series regularization: densify a per-key daily series onto a
 * gapless calendar and forward-fill observation gaps — the standard
 * prep step before any rolling-window or ML feature computation over
 * irregular event data (extension family).
 *
 * Scale posture: the calendar is generated PER KEY from that key's
 * own [min_day, max_day] span (one `sequence` + explode — pure plan
 * construction, no driver loop, no global calendar broadcast), so
 * row count is Σ per-key spans, never |keys| × global span. Two
 * exchanges on the key: one for the span aggregate, one serving BOTH
 * the densify join and the forward-fill window (same key → Spark
 * reuses the partitioning). Per-key window state is that key's span,
 * bounded by time range, not corpus size.
 */
object TimeSeries {

  /**
   * Densify `series` (one row per (key, day) — day a DateType) onto
   * each key's full daily calendar. Missing days appear with
   * `observed = false`, `valueCol` NULL, and `filled` = the most
   * recent earlier observation (NULL before the first one).
   */
  def gapFillDaily(
      series: DataFrame, keyCol: String, dayCol: String,
      valueCol: String): DataFrame = {
    val span = series
      .groupBy(col(keyCol))
      .agg(min(col(dayCol)).as("__d0"), max(col(dayCol)).as("__d1"))
    val calendar = span
      .select(
        col(keyCol),
        explode(sequence(col("__d0"), col("__d1"))).as(dayCol))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(dayCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    calendar
      .join(series, Seq(keyCol, dayCol), "left")
      .withColumn("observed", col(valueCol).isNotNull)
      .withColumn("filled", last(col(valueCol), ignoreNulls = true).over(w))
  }
}
