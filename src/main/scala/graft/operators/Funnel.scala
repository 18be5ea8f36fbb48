package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Product-analytics funnels and cohort retention over an event log —
 * the two workhorse event-analytics operators (extension family; the
 * reference engine has no event analytics). Batch counterparts of the
 * streaming state machines in `graft.streaming.EventStreams`.
 *
 * Scale posture (events is the 100 TB side):
 *  - every stage keys on the USER id — the per-step minima, the
 *    step-to-step tightening joins, and the cohort join all hash on
 *    the same bounded-cardinality key, so AQE coalesces and no stage
 *    ever keys on an unbounded derived value;
 *  - per-step frames are pre-filtered to that step's event type
 *    BEFORE any join (scored volume ∝ matching events, not the log);
 *  - the funnel's step chain is |steps| user-key joins of
 *    monotonically SHRINKING frames (each join keeps only users who
 *    reached the previous step) — never a per-event window that
 *    sorts each user's full history;
 *  - final rollups (per-step counts, cohort-week cells) aggregate to
 *    tiny outputs with map-side partials.
 */
object Funnel {

  /**
   * Strict-order funnel: a user converts through step i+1 only with
   * an event of that type STRICTLY AFTER their step-i conversion
   * time, and every step within `windowSeconds` of the step-0
   * conversion. Earliest-completion semantics: each step's
   * conversion time is the minimum qualifying timestamp.
   *
   * Output: one row per funnel step — `step` (0-based), `event_type`,
   * `n_users` reaching that step — the classic funnel-drop-off table.
   */
  def funnel(
      events: DataFrame, userCol: String, tsCol: String, typeCol: String,
      steps: Seq[String], windowSeconds: Long): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val spark = events.sparkSession
    import spark.implicits._

    val byType = steps.zipWithIndex.map { case (st, i) =>
      events.where(col(typeCol) === st)
        .select(col(userCol), col(tsCol).as(s"__ts$i"))
    }

    // t0 per user, then tighten step by step: min ts_{i} > t_{i-1}
    // and <= t0 + window. Each stage is a user-key join + user-key
    // re-aggregation; the left frame only ever shrinks.
    val t0 = byType.head.groupBy(col(userCol)).agg(min(s"__ts0").as("__t0"))
    val reached = steps.indices.drop(1).foldLeft(Seq(t0)) { (acc, i) =>
      val prev = acc.last
      val prevT = if (i == 1) "__t0" else s"__t${i - 1}"
      val next = byType(i)
        .join(prev, userCol)
        .where(
          col(s"__ts$i") > col(prevT) &&
            unix_micros(col(s"__ts$i")) <=
              unix_micros(col("__t0")) + windowSeconds * 1000000L)
        .groupBy(col(userCol))
        .agg(
          min(s"__ts$i").as(s"__t$i"),
          // t0 is functionally dependent on the user key; min() rides
          // it through without another join back to `prev`.
          min("__t0").as("__t0_keep"))
        .withColumnRenamed("__t0_keep", "__t0")
      acc :+ next
    }

    val counts = reached.zipWithIndex.map { case (df, i) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(i).as("step"), lit(steps(i)).as("event_type"), col("n_users"))
    }
    counts.reduce(_.unionByName(_)).orderBy("step")
  }

  /**
   * Weekly cohort retention: cohort = the week of the user's first
   * `cohortType` event; a user is retained in week-offset k if they
   * have ANY event in the k-th week after that. Output: one row per
   * (cohort_week, week_offset) with distinct retained users —
   * offset 0 is the cohort's own week (= cohort size when every
   * signup also counts as activity).
   */
  def retention(
      events: DataFrame, userCol: String, tsCol: String, typeCol: String,
      cohortType: String, maxWeeks: Int): DataFrame = {
    val cohorts = events
      .where(col(typeCol) === cohortType)
      .groupBy(col(userCol))
      .agg(date_trunc("week", min(col(tsCol))).cast("date").as("cohort_week"))

    events
      .select(col(userCol), col(tsCol))
      .join(cohorts, userCol)
      .withColumn(
        "week_offset",
        floor(
          datediff(date_trunc("week", col(tsCol)).cast("date"),
            col("cohort_week")) / 7).cast("int"))
      .where(col("week_offset") >= 0 && col("week_offset") <= maxWeeks)
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(countDistinct(col(userCol)).as("n_users"))
  }
}
