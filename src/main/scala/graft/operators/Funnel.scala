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

  /**
   * First- and last-touch conversion attribution: for every
   * conversion event, the earliest and the latest touch event by the
   * same user inside the CLOSED lookback window
   * `[conv_ts − lookbackSeconds, conv_ts]` (both NULL when no touch
   * qualifies). Both models ride ONE per-user RANGE-frame window pass
   * over microsecond epochs — no self-join, no per-conversion probe;
   * the frame's row span is bounded by the user's event density ×
   * lookback, not their full history.
   *
   * Tie rule: struct (ts, event_id) min/max — total, so concurrent
   * touches attribute deterministically on any engine.
   *
   * Output per conversion: (userCol, conv_id, conv_ts, value,
   * first_touch_id, last_touch_id).
   *
   * Scale: one hash exchange on the user key; everything else is the
   * windowed scan. The linear multi-touch model needs the per-pair
   * fan-out and lives in [[linearAttribution]].
   */
  def touchAttribution(
      events: DataFrame, userCol: String, tsCol: String, typeCol: String,
      valueCol: String, idCol: String,
      conversionType: String, touchTypes: Seq[String],
      lookbackSeconds: Long): DataFrame = {
    require(lookbackSeconds > 0,
      s"lookback must be positive: $lookbackSeconds")
    import org.apache.spark.sql.expressions.Window
    val relevant = events
      .where(col(typeCol) === conversionType ||
        col(typeCol).isin(touchTypes: _*))
      .select(col(userCol), col(tsCol), col(typeCol), col(valueCol),
        col(idCol), unix_micros(col(tsCol)).as("__us"))
    val w = Window.partitionBy(userCol).orderBy(col("__us"))
      .rangeBetween(-lookbackSeconds * 1000000L, 0L)
    val touchKey = when(col(typeCol).isin(touchTypes: _*),
      struct(col("__us"), col(idCol)))
    relevant
      .withColumn("__first", min(touchKey).over(w))
      .withColumn("__last", max(touchKey).over(w))
      .where(col(typeCol) === conversionType)
      .select(
        col(userCol), col(idCol).as("conv_id"), col(tsCol).as("conv_ts"),
        col(valueCol).as("value"),
        col("__first").getField(idCol).as("first_touch_id"),
        col("__last").getField(idCol).as("last_touch_id"))
  }

  /**
   * Linear multi-touch attribution: every touch inside a
   * conversion's closed lookback window receives an equal share of
   * the conversion's value — credit = value / n_touches. The
   * conversion×touch pair fan-out runs through the binned
   * [[TemporalJoins.rangeJoin]] shape (equi-join on (user, bin) +
   * exact range predicate), never a nested-loop; the per-conversion
   * touch count is a window over the matched pairs, partitioned by
   * the conversion id — state bounded by that conversion's window
   * population.
   *
   * Credit determinism: value and n are exact on both engines and
   * the single division is one IEEE op — round(6) at the boundary.
   *
   * Output: one row per (conversion, touch) pair — (userCol,
   * conv_id, touch_id, touch_type, n_touches, credit). Conversions
   * with zero qualifying touches emit nothing (their value is
   * unattributable by definition).
   */
  def linearAttribution(
      events: DataFrame, userCol: String, tsCol: String, typeCol: String,
      valueCol: String, idCol: String,
      conversionType: String, touchTypes: Seq[String],
      lookbackSeconds: Long): DataFrame = {
    require(lookbackSeconds > 0,
      s"lookback must be positive: $lookbackSeconds (zero collapses every row into one range-join bin \u2014 a per-user cross join)")
    import org.apache.spark.sql.expressions.Window
    val lUs = lookbackSeconds * 1000000L
    val convs = events.where(col(typeCol) === conversionType)
      .select(col(userCol), col(idCol).as("conv_id"),
        col(valueCol).as("__value"),
        (unix_micros(col(tsCol)) - lUs).as("__ws"),
        // rangeJoin is half-open [start, end); the closed window
        // [conv−L, conv] is [conv−L, conv+1) in integral micros
        (unix_micros(col(tsCol)) + 1L).as("__we"))
    val touches = events.where(col(typeCol).isin(touchTypes: _*))
      .select(col(userCol), col(idCol).as("touch_id"),
        col(typeCol).as("touch_type"), unix_micros(col(tsCol)).as("__ts"))
    val pairs = TemporalJoins.rangeJoin(
      touches, convs, userCol, "__ts", "__ws", "__we", binWidth = lUs)
    val wc = Window.partitionBy("conv_id")
    pairs
      .withColumn("__n", count(lit(1)).over(wc))
      .select(
        col(userCol), col("conv_id"), col("touch_id"), col("touch_type"),
        col("__n").as("n_touches"),
        round(col("__value") / col("__n").cast("double"), 6).as("credit"))
  }

  /**
   * Kaplan–Meier survival curve — time-to-event with CENSORING done
   * right: subjects who never reached the event still shrink the
   * risk set for as long as they were observed, which a naive
   * "average time to conversion over converters" silently throws
   * away (survivorship bias). S(t) = Π over event-durations ≤ t of
   * (1 − d_i/n_i), n_i = subjects with duration ≥ t_i.
   *
   * Exactness (the q190 ln contract): each step's ln(1 − d/n) is an
   * IEEE op over exact integers, round(6) then DECIMAL(18,6), so
   * the cumulative log-survival sum is exact and order-free;
   * `log_surv` surfaces that decimal as a double (bit-identical
   * across engines), and `survival` = round(exp(·), 6) carries the
   * same ~1e-9/value boundary exposure as every ln/exp finish in
   * the registry. A step where everyone at risk dies (d = n, only
   * possible at the last step) emits NULL log_surv and survival 0.
   *
   * Scale contract: `durationCol` must be QUANTIZED (integer hours/
   * days) so distinct durations are span-bounded and the two ordered
   * passes are the bounded-domain window exception (the KS/AUC
   * rule); the corpus is touched by ONE partial-aggregated groupBy.
   *
   * Output: one row per duration with ≥ 1 event: (duration, n_risk,
   * n_events, log_surv, survival), ascending.
   */
  def kaplanMeier(
      subjects: DataFrame, durationCol: String,
      eventCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val g = subjects
      .where(col(durationCol).isNotNull && col(eventCol).isNotNull)
      .groupBy(col(durationCol).cast("long").as("duration"))
      .agg(
        count(lit(1)).as("__cnt"),
        sum(when(col(eventCol), 1L).otherwise(0L)).as("n_events"))
    val wDesc = Window.orderBy(col("duration").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAsc = Window.orderBy(col("duration"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val lstep = when(col("n_events") < col("n_risk"),
      round(log(lit(1.0) -
        col("n_events").cast("double") / col("n_risk")), 6)
        .cast(DecimalType(18, 6)))
    g.withColumn("n_risk", sum(col("__cnt")).over(wDesc))
      .where(col("n_events") > 0)
      .withColumn("__ls", sum(lstep).over(wAsc))
      .select(
        col("duration"), col("n_risk"), col("n_events"),
        when(col("n_events") < col("n_risk"),
          col("__ls").cast("double")).as("log_surv"),
        when(col("n_events") < col("n_risk"),
          round(exp(col("__ls").cast("double")), 6))
          .otherwise(lit(0.0)).as("survival"))
      .orderBy("duration")
  }

  /**
   * Top journey paths — the "what do users actually DO" view the
   * per-pair transition matrix (q91) can't give: each user's first
   * `maxSteps` events in (ts, tie) order render as one `a>b>c` path
   * string, paths aggregate to (path, n_users), top `k` returned.
   *
   * Determinism: the step cut and the path order both follow the
   * (tsCol, tieCol) TOTAL order; the top-k cut breaks count ties by
   * path string. `maxSteps` bounds the path string (an unbounded
   * concat over a power user's history is a row-size bomb at scale).
   *
   * Scale: the row_number cut and the per-user fold share ONE user
   * exchange (collect_list state ≤ maxSteps rows per user — bounded,
   * unlike a raw history collect); the path aggregation is a second
   * exchange at path cardinality; top-k is a TakeOrdered, never a
   * global sort.
   */
  def topPaths(
      events: DataFrame, userCol: String, tsCol: String, tieCol: String,
      stepCol: String, maxSteps: Int, k: Int): DataFrame = {
    require(maxSteps >= 1, s"maxSteps must be >= 1, got $maxSteps")
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieCol))
    events
      .select(col(userCol), col(tsCol), col(tieCol), col(stepCol))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= maxSteps)
      .groupBy(col(userCol))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("__rn"), col(stepCol)))),
          x => x(stepCol)), ">").as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("path"))
      .limit(k)
  }
}
