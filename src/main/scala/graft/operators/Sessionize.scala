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

  /**
   * Telemetry debounce: collapse bursts of repeated (key…) events
   * into one row per burst — the first event (by time, `tieCol`
   * tiebreak) plus the count it suppressed. A burst extends while
   * consecutive same-key events stay ≤ `windowSeconds` apart (the
   * gaps-and-islands rule, so a long chain of double-fires collapses
   * to ONE kept event, not one per window hop). The standard fix for
   * client SDKs double-firing instrumentation events.
   *
   * Output: keyCols…, burst_seq (1-based per key), kept `tieCol`,
   * first/last timestamps, n_events (suppressed = n_events − 1).
   *
   * Scale: ONE hash exchange on the composite key serves the lag
   * window, the burst running sum, and the per-burst aggregate
   * (hash(keys) already co-locates burst groups). Per-key state is
   * that key's sort, bounded by per-key traffic; timestamps compare
   * in exact integer microseconds.
   */
  def debounce(
      events: DataFrame, keyCols: Seq[String], tsCol: String,
      tieCol: String, windowSeconds: Long): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    val keys = keyCols.map(col)
    val w = Window.partitionBy(keys: _*).orderBy(col(tsCol), col(tieCol))
    val us = unix_micros(col(tsCol))
    val bursts = events
      .withColumn("__new_burst",
        when(us - lag(us, 1).over(w) > windowSeconds * 1000000L, 1L)
          .otherwise(lit(0L)))
      .withColumn("burst_seq", sum(col("__new_burst")).over(w) + lit(1L))
    bursts
      .groupBy((keys :+ col("burst_seq")): _*)
      .agg(
        // Lexicographic struct-min picks the first (ts, tie) pair in
        // ONE aggregate — a per-burst row_number window would force a
        // second sort for the same answer.
        min(struct(col(tsCol), col(tieCol))).getField(tieCol)
          .as(s"kept_$tieCol"),
        min(col(tsCol)).as("first_ts"),
        max(col(tsCol)).as("last_ts"),
        count(lit(1)).as("n_events"))
  }

  /**
   * X18: Spark's NATIVE `session_window` aggregation — the built-in
   * counterpart of [[sessionStats]] and the one shape that runs
   * UNCHANGED in batch and Structured Streaming (streaming it closes
   * a session when the watermark passes its end, which is what makes
   * it the production streaming sessionizer; batch folds it through
   * SessionWindowing in one pass). The merge boundary MATCHES
   * [[sessionStats]] — a gap exactly equal to the duration still
   * merges, only a STRICTLY greater gap splits (spec-pinned; Spark
   * merges an event whose window start ≤ the previous window end) —
   * but the session END differs: last event + gap (the half-open
   * window a streaming join consumes), not the observed last-event
   * timestamp. Pick by downstream contract.
   *
   * Scale: one hash exchange on the key; Spark sorts each key's rows
   * and merges windows in a single SessionWindowing pass — same
   * envelope as the gaps-and-islands form.
   *
   * Output: (keyCol, session_start, session_end, n_events) —
   * session_end = last event + gap, exact microseconds.
   */
  def sessionWindowStats(
      events: DataFrame, keyCol: String, tsCol: String,
      gap: String): DataFrame =
    events
      .where(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(col(keyCol), session_window(col(tsCol), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))
}
