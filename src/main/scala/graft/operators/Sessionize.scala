package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Batch sessionization (gaps-and-islands): assign each event to a
 * per-user session, where a gap longer than `gapSeconds` between
 * consecutive events opens a new session — the classic clickstream /
 * activity-log operator (extension family; the reference engine has
 * no event-stream analytics). The streaming counterpart is Spark's
 * `session_window`, exercised in `graft.streaming.EventStreams`.
 *
 * Scale posture: ONE hash exchange on the user key serves the whole
 * operator — the lag window, the running-sum window (same partition
 * spec, same sort), and the final per-(user, session) aggregate
 * (hash(user) already co-locates every row of a (user, session)
 * group, so Spark elides the aggregate's exchange). Per-user state is
 * a sort of that user's events, bounded by per-user activity, never
 * by corpus size; skewed power-users are bounded by AQE.
 *
 * Timestamps compare in exact integer microseconds (`unix_micros`) —
 * no double rounding, no truncation-at-second mismatches.
 */
object Sessionize {

  /** Events plus a `session_seq` column (1-based per-user session
    * index, in time order; ties broken by `tieCol`). */
  def sessions(
      events: DataFrame, userCol: String, tsCol: String, tieCol: String,
      gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(tieCol))
    val us = unix_micros(col(tsCol))
    events
      .withColumn("__gap_open",
        when(us - lag(us, 1).over(w) > gapSeconds * 1000000L, 1L)
          .otherwise(lit(0L)))
      .withColumn("session_seq",
        (sum(col("__gap_open")).over(w) + lit(1L)))
      .drop("__gap_open")
  }

  /** One row per (user, session): event count, start/end timestamps,
    * and exact duration in microseconds. */
  def sessionStats(
      events: DataFrame, userCol: String, tsCol: String, tieCol: String,
      gapSeconds: Long): DataFrame =
    sessions(events, userCol, tsCol, tieCol, gapSeconds)
      .groupBy(col(userCol), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"))
      .withColumn("dur_us",
        unix_micros(col("session_end")) - unix_micros(col("session_start")))
}
