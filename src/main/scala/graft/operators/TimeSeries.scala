package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
   * Fail fast when a per-key scan operator is handed a key column
   * whose long-cast would be lossy: a non-numeric string key casts to
   * NULL, silently collapsing EVERY key into one group — wrong
   * per-key detection with no error (ADVICE r5). Integral types only;
   * string/decimal/double callers must pre-map their key to a long
   * (e.g. a dictionary join or xxhash64) so the collapse is a
   * deliberate, visible step.
   */
  private[graft] def requireIntegralKey(df: DataFrame, keyCol: String): Unit = {
    import org.apache.spark.sql.types._
    val dt = df.schema(keyCol).dataType
    require(dt == ByteType || dt == ShortType || dt == IntegerType ||
        dt == LongType,
      s"key column '$keyCol' must be an integral type (byte/short/int/long), " +
        s"got ${dt.simpleString}: a lossy long-cast would turn non-numeric " +
        "keys into NULL and merge their series into one group")
  }

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

  /**
   * Rolling z-score anomaly detection: each point scores against the
   * mean/std of its `lookback` strictly-PRECEDING points (a frame
   * containing the current row dilutes the very spike being tested),
   * flagged when |z| ≥ `threshold`. Points without a full lookback
   * (series warmup) and zero-variance frames emit NULL z and are
   * never flagged — no early-series or constant-series false alarms.
   *
   * Mean/variance use the explicit sum/sumsq formulation (population
   * variance) rather than built-in `stddev` — Bessel conventions
   * differ across engines, sum/sumsq does not.
   *
   * Scale: ONE exchange on the key; per-key state is the lookback
   * frame (O(lookback) rows), so memory is bounded per key regardless
   * of series length. Keying by a bounded-cardinality column (e.g.
   * event type) would funnel whole types through single partitions —
   * key by the natural high-cardinality series id (user, device).
   */
  def rollingZScore(
      series: DataFrame, keyCol: String, tsCol: String, tieCol: String,
      valueCol: String, lookback: Int, threshold: Double): DataFrame = {
    require(lookback >= 2, s"lookback must be >= 2, got $lookback")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
      .rowsBetween(-lookback, -1)
    val x = col(valueCol).cast("double")
    val staged = series
      .withColumn("n_prev", count(x).over(w))
      .withColumn("__s", sum(x).over(w))
      .withColumn("__s2", sum(x * x).over(w))
    val m = col("__s") / col("n_prev")
    val variance = (col("__s2") - col("__s") * col("__s") / col("n_prev")) /
      col("n_prev")
    val std = sqrt(greatest(variance, lit(0.0)))
    staged
      .withColumn("z",
        when(col("n_prev") === lookback && std > 0.0, round((x - m) / std, 6)))
      .withColumn("is_anomaly", coalesce(abs(col("z")) >= threshold, lit(false)))
      .drop("__s", "__s2")
  }

  /**
   * Robust outlier scoring via the modified z-score (Iglewicz &
   * Hoaglin): per key, `0.6745 · (x − median) / MAD` where MAD is the
   * median absolute deviation from the key's median; |score| >
   * `threshold` (3.5 is the standard dial) flags the point. Median/
   * MAD ignore tail mass, so — unlike the mean/std z-score — a batch
   * of extreme points cannot drag the center toward itself and mask
   * its own members (breakdown point 50% vs 0%).
   *
   * Zero-MAD keys (≥ half the points share the median value) emit
   * NULL scores and never flag — the score is undefined there, and a
   * division would flag every point off the median.
   *
   * Scale: exact two-level medians are inherently two aggregation
   * passes over the corpus (the deviation needs the median first);
   * both passes partial-aggregate on the key, and the per-key
   * median/MAD tables (|keys| rows) broadcast back — no corpus-sized
   * join. Exact `percentile` holds each key's values in the agg
   * buffer, so at 100 TB swap both passes to `approx_percentile`
   * (t-digest sketch, bounded state — the q57→q62 trade) via
   * `approx = true`.
   */
  def madOutliers(
      series: DataFrame, keyCol: String, valueCol: String,
      threshold: Double = 3.5, approx: Boolean = false): DataFrame = {
    val x = col(valueCol).cast("double")
    val p50 =
      if (approx) expr("approx_percentile(__p50_in, 0.5)")
      else expr("percentile(__p50_in, 0.5)")
    val med = series
      .withColumn("__p50_in", x)
      .groupBy(col(keyCol))
      .agg(p50.as("med"))
    val dev = series
      .join(broadcast(med), Seq(keyCol))
      .withColumn("__p50_in", abs(x - col("med")))
    val mad = dev
      .groupBy(col(keyCol))
      .agg(p50.as("mad"))
    val score = lit(0.6745) * (x - col("med")) / col("mad")
    dev
      .join(broadcast(mad), Seq(keyCol))
      .withColumn("robust_z", when(col("mad") > 0.0, round(score, 6)))
      .withColumn("is_outlier",
        coalesce(abs(col("robust_z")) > threshold, lit(false)))
      .drop("__p50_in")
  }

  /**
   * Scale-safe running total over a global numeric order: adds
   * `running_total` = Σ `valueCol` over all rows with `orderCol` ≤
   * this row's (ties resolved by the order value itself — `orderCol`
   * must be unique, e.g. an id).
   *
   * A naive `Window.orderBy(orderCol)` with no partition funnels the
   * ENTIRE corpus through one task — the classic prefix-sum scale
   * trap. This is the standard two-level decomposition instead:
   * rows bucket by `floor(orderCol / bucketWidth)`; each bucket
   * computes its internal running sum (parallel, one exchange on the
   * bucket key); per-bucket totals — |range|/bucketWidth rows, a
   * bucketWidth-fold reduction — get EXCLUSIVE running offsets in one
   * tiny single-partition window; offsets broadcast-join back. Pick
   * bucketWidth so bucket count lands in the 10³–10⁶ range (the tiny
   * window's single task handles millions of 16-byte rows fine); at
   * 100 TB with 10¹² ids, width 10⁶ → 10⁶ buckets.
   */
  def runningTotal(
      df: DataFrame, orderCol: String, valueCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    val bucket = floor(col(orderCol) / bucketWidth).cast("long")
    val inBucket = Window.partitionBy(col("__bucket"))
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val overBuckets = Window.orderBy(col("__bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val staged = df.withColumn("__bucket", bucket)
    val offsets = staged
      .groupBy(col("__bucket"))
      .agg(sum(col(valueCol)).as("__btot"))
      .withColumn("__offset",
        coalesce(sum(col("__btot")).over(overBuckets), lit(0L)))
      .select(col("__bucket"), col("__offset"))
    staged
      .withColumn("__run", sum(col(valueCol)).over(inBucket))
      .join(broadcast(offsets), Seq("__bucket"))
      .withColumn("running_total", col("__run") + col("__offset"))
      .drop("__bucket", "__run", "__offset")
  }

  /**
   * Peak interval concurrency (the sweep line): given one row per
   * interval, how many intervals are simultaneously open — reported
   * as the maximum per time bucket, plus the bucket's interval-start
   * count. Capacity planning's first question ("how many concurrent
   * sessions must this fleet hold"), and the validation pass behind
   * q72's sessionization.
   *
   * Mechanics: each interval emits +1 at start and −1 at end on an
   * interleaved key (2·µs for starts, 2·µs+1 for ends — CLOSED
   * intervals: an interval occupies its end instant, so a
   * single-event session still counts). Same-instant deltas
   * pre-aggregate to one net row per key — all deltas on one key
   * share a sign, so the bucket max is unaffected and the sweep
   * becomes fully deterministic. The running sum rides the bucketed
   * two-level prefix decomposition ([[runningTotal]]) — never a
   * corpus-wide single-task window.
   *
   * Scale: one delta aggregation (map-side combined, keys =
   * distinct instants ≤ 2·intervals), the prefix sum's two bounded
   * windows, one final bucket aggregate. No join against the raw
   * event table; memory per task is bounded by the bucket's
   * distinct-instant count.
   */
  /**
   * Two-sided CUSUM change-point detection per key (Page 1954): the
   * sequential drift detector behind "this metric shifted off target
   * and stayed there" — cumulative sums of deviations beyond a slack
   * band, alarming when either side exceeds `h`, then restarting.
   *   S⁺_t = max(0, S⁺_{t-1} + (x_t − target − slack))
   *   S⁻_t = max(0, S⁻_{t-1} − (x_t − target) − slack)
   * Unlike the rolling z-score (point anomalies), CUSUM accumulates
   * SMALL persistent shifts that never individually trip a z
   * threshold.
   *
   * The clamped recurrence is not window-expressible (max(0,·) breaks
   * prefix-sum decomposition), so each key's series is scanned
   * sequentially inside `flatMapGroups` — per-key memory is that
   * key's event count, the sessionize/debounce state contract; keys
   * process in parallel. Streaming counterpart:
   * [[graft.streaming.EventStreams.streamingCusum]] (row-identical on
   * in-order sources, parity-asserted).
   */
  def cusum(
      df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
      valueCol: String, target: Double, slack: Double, h: Double)
      : DataFrame = {
    require(slack >= 0 && h > 0, s"need slack >= 0 and h > 0: ($slack, $h)")
    requireIntegralKey(df, keyCol)
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
        col(keyCol).cast("long").as("key"),
        col(tsCol).cast("timestamp").as("ts"),
        col(tieCol).cast("long").as("tie"),
        col(valueCol).cast("double").as("x"))
      .as[(Long, java.sql.Timestamp, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (key, rows) =>
        var sp = 0.0
        var sn = 0.0
        rows.toSeq
          .sortBy { case (_, t, tie, _) =>
            (t.getTime * 1000 + t.getNanos / 1000 % 1000, tie)
          }
          .map { case (_, t, tie, x) =>
            sp = math.max(0.0, sp + (x - target - slack))
            sn = math.max(0.0, sn - (x - target) - slack)
            val alarm = sp > h || sn > h
            val row = (key, t, tie, x, sp, sn, alarm)
            if (alarm) { sp = 0.0; sn = 0.0 }
            row
          }.iterator
      }
      .toDF("key", "ts", "tie", "value", "s_pos", "s_neg", "alarm")
  }

  /**
   * Per-key exponentially weighted moving average: the standard
   * low-pass smoother (ewma_t = α·x_t + (1−α)·ewma_{t-1}, seeded at
   * the first observation) plus the residual x − ewma_prev that
   * anomaly dashboards chart. CUSUM ([[cusum]]) answers "did the
   * level shift"; EWMA answers "what is the level now".
   *
   * The geometric recurrence is technically expressible as a
   * weighted prefix sum, but (1−α)^t underflows and the rescaling
   * overflows for long series — so like [[cusum]] each key scans
   * sequentially in `flatMapGroups` (per-key memory = that key's
   * events; keys parallel). Streaming counterpart:
   * [[graft.streaming.EventStreams.streamingEwma]] — ONE double per
   * key, row-identical on in-order sources (parity-asserted).
   */
  def ewma(
      df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
      valueCol: String, alpha: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1]: $alpha")
    requireIntegralKey(df, keyCol)
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
        col(keyCol).cast("long").as("key"),
        col(tsCol).cast("timestamp").as("ts"),
        col(tieCol).cast("long").as("tie"),
        col(valueCol).cast("double").as("x"))
      .as[(Long, java.sql.Timestamp, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (key, rows) =>
        var prev = Option.empty[Double]
        rows.toSeq
          .sortBy { case (_, t, tie, _) =>
            (t.getTime * 1000 + t.getNanos / 1000 % 1000, tie)
          }
          .map { case (_, t, tie, x) =>
            val e = prev match {
              case Some(p) => alpha * x + (1 - alpha) * p
              case None    => x
            }
            val resid = prev.map(x - _)
            prev = Some(e)
            (key, t, tie, x, e, resid)
          }.iterator
      }
      .toDF("key", "ts", "tie", "value", "ewma", "residual")
  }

  /**
   * Per-key least-squares trend fit: slope and intercept of y over x
   * within each key — "is this metric drifting, and how fast, per
   * segment". Co-moments accumulate as exact DECIMAL sums (the
   * [[Profile.correlations]] reproducibility contract: associative
   * integer arithmetic, partition-order independent) and only the
   * closed-form OLS finish runs in double, fixed op order — so every
   * fitted coefficient is oracle-pinnable, unlike a
   * `regr_slope`-style double accumulation.
   *
   * Degenerate keys (n < 2 or zero x-variance) yield NULL slope and
   * intercept. x must be exactly representable at `xScale` (day
   * indexes, epoch units); y is rounded into `yScale` — the fit is
   * then EXACTLY the fit of the rounded series, reproducible
   * anywhere.
   *
   * Scale: one partial-aggregated pass, one shuffle on the key; per
   * key state is 5 scalars. Same decimal headroom contract as
   * [[Profile.correlations]] (QualitySpec-pinned): per key the sums
   * accumulate in DECIMAL(38), so Σx² < 10^(38−2·xScale) and
   * Σ|x·y| < 10^(38−xScale−yScale) — overflow RAISES under the
   * default ANSI mode, never silently corrupts; re-index x (day
   * index instead of epoch micros) or shard-and-combine past the
   * bound.
   *
   * `x0`/`y0` are the in-operator escape hatch for that bound: the
   * fit runs over the CENTERED series (x−x0, y−y0), whose co-moments
   * carry the spread's magnitude, not the level's — epoch-micro x at
   * 1.7e15 overflows Σx² immediately, but centered at the window
   * start it fits with room to spare. OLS slope is exactly
   * shift-invariant, and the intercept is restored in closed form
   * (b = b' + y0 − a·x0, double arithmetic, fixed op order) so the
   * OUTPUT contract is unchanged: same slope, same
   * original-coordinates intercept. CAVEAT: the centering
   * subtraction `col − lit(off)` runs in DOUBLE before the decimal
   * cast, so both the offsets AND the raw inputs must be exactly
   * representable as doubles (integral magnitude ≤ 2^53) — epoch
   * MICROS (~1.7e15) qualify, epoch NANOS (~1.7e18) do NOT: for
   * those the subtraction itself loses precision before quantization
   * ever happens, and no offset choice rescues it — re-index first
   * (divide to micros, or a day index). Defaults (0, 0) compile to
   * the identical expression tree as before.
   */
  def trendFit(
      df: DataFrame, keyCol: String, xCol: String, yCol: String,
      xScale: Int = 2, yScale: Int = 6,
      x0: Double = 0.0, y0: Double = 0.0): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val both = col(xCol).isNotNull && col(yCol).isNotNull
    def centered(c: String, off: Double) =
      if (off == 0.0) col(c) else col(c) - lit(off)
    val x = when(both, centered(xCol, x0).cast(DecimalType(18, xScale)))
    val y = when(both, centered(yCol, y0).cast(DecimalType(18, yScale)))
    val agged = df.groupBy(col(keyCol)).agg(
      count(when(both, lit(1))).cast("double").as("__n"),
      sum(x).cast("double").as("__sx"),
      sum(y).cast("double").as("__sy"),
      sum(x * y).cast("double").as("__sxy"),
      sum(x * x).cast("double").as("__sxx"))
    val n = col("__n")
    val den = n * col("__sxx") - col("__sx") * col("__sx")
    val slope = when(n >= 2.0 && den > 0.0,
      (n * col("__sxy") - col("__sx") * col("__sy")) / den)
    val interceptCentered = when(n >= 2.0 && den > 0.0,
      (col("__sy") - ((n * col("__sxy") - col("__sx") * col("__sy")) / den)
        * col("__sx")) / n)
    // Restore the original-coordinates intercept from the centered
    // fit: y − y0 = a(x − x0) + b'  ⇒  b = b' + y0 − a·x0. With the
    // default offsets this is arithmetic on literal zeros, which
    // ConstantFolding erases — the pre-dial expression tree exactly.
    val intercept =
      if (x0 == 0.0 && y0 == 0.0) interceptCentered
      else interceptCentered + lit(y0) - slope * lit(x0)
    agged.select(
      col(keyCol),
      n.cast("long").as("n"),
      round(slope, 6).as("slope"),
      round(intercept, 6).as("intercept"))
  }

  /**
   * E28: per-key autocorrelation function at lags 1..maxLag — the
   * time-series memory diagnostic run before trusting any
   * independence assumption downstream (bootstrap/CI width, anomaly
   * thresholds, A/B interleaving): ACF ≈ 0 at all lags says shuffled
   * metrics are exchangeable; a slow-decay ACF says effective sample
   * size is far below row count and seasonal structure (q216) should
   * be modeled, not averaged over.
   *
   * Estimator (the standard jointly-centered form): for lag l over
   * the per-key series x₁..xₙ ordered by (tsCol, tieCol),
   * ACF(l) = Σᵢ(xᵢ−x̄)(xᵢ₊ₗ−x̄) / Σᵢ(xᵢ−x̄)², expanded to raw
   * moments so every accumulated sum is EXACT: values quantize once
   * to DECIMAL(18,6) (the trendFit contract), the per-lag sums
   * Σx·xₗ (exact decimal products), Σ(x+xₗ) and pair counts ride ONE
   * aggregation, and the finish is one fixed IEEE chain —
   * num = Σxxₗ − x̄·Σ(x+xₗ) + nₗ·x̄², den = Σx² − n·x̄² — with
   * round(6) at the boundary (SIGNED — the oracle carries `+ 0.0`).
   *
   * Scale: one key-partitioned window pass computes all maxLag leads
   * (a single sort, no self-joins), and the groupBy reuses the
   * window's hash partitioning — one exchange total. NULL values are
   * excluded BEFORE ordering (the series contracts over observed
   * points; gap-fill first via [[gapFillDaily]] when calendar
   * spacing matters). Degenerate keys (constant series ⇒ den = 0,
   * or fewer than l+1 points) emit NULL acf for the affected lags.
   *
   * Output: (key, lag, n, n_pairs, acf) — one row per key × lag.
   */
  def autocorrelation(
      df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
      valueCol: String, maxLag: Int): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val dec = DecimalType(18, 6)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
    val base = df
      .where(col(valueCol).isNotNull)
      .select(col(keyCol), col(tsCol), col(tieCol),
        col(valueCol).cast(dec).as("__x"))
    val withLeads = base.select(
      col(keyCol) +: col("__x") +:
        (1 to maxLag).map(l =>
          lead(col("__x"), l).over(w).as(s"__l$l")): _*)
    val aggs =
      Seq(
        count(lit(1)).as("n"),
        sum(col("__x")).as("__sx"),
        sum(col("__x") * col("__x")).as("__sxx")) ++
      (1 to maxLag).flatMap(l => Seq(
        count(col(s"__l$l")).as(s"__np$l"),
        sum(col("__x") * col(s"__l$l")).as(s"__sxy$l"),
        sum(when(col(s"__l$l").isNotNull, col("__x") + col(s"__l$l")))
          .as(s"__hs$l")))
    val wide = withLeads.groupBy(col(keyCol))
      .agg(aggs.head, aggs.tail: _*)
    val lags = explode(array((1 to maxLag).map(l => struct(
      lit(l).as("lag"), col(s"__np$l").as("np"),
      col(s"__sxy$l").as("sxy"), col(s"__hs$l").as("hs"))): _*))
    val long = wide.select(
      col(keyCol), col("n"), col("__sx"), col("__sxx"), lags.as("__lg"))
    val xbar = col("__sx").cast("double") / col("n").cast("double")
    val num = col("__lg.sxy").cast("double") -
      xbar * col("__lg.hs").cast("double") +
      col("__lg.np").cast("double") * xbar * xbar
    val den = col("__sxx").cast("double") -
      col("n").cast("double") * xbar * xbar
    long.select(
      col(keyCol),
      col("__lg.lag").as("lag"),
      col("n"),
      col("__lg.np").as("n_pairs"),
      when(col("__lg.np") > 0 && den > 0.0,
        round(num / den, 6)).as("acf"))
  }

  def peakConcurrency(
      intervals: DataFrame, startCol: String, endCol: String,
      bucketMicros: Long = 3600L * 1000000L): DataFrame = {
    require(bucketMicros >= 1, s"bucketMicros must be >= 1, got $bucketMicros")
    val starts = intervals.select(
      (unix_micros(col(startCol)) * 2).as("__k"), lit(1L).as("__d"))
    val ends = intervals.select(
      (unix_micros(col(endCol)) * 2 + 1).as("__k"), lit(-1L).as("__d"))
    val deltas = starts.unionAll(ends)
      .groupBy(col("__k"))
      .agg(
        sum(col("__d")).as("__net"),
        sum(when(col("__d") > 0, 1L).otherwise(0L)).as("__starts"))
    runningTotal(deltas, "__k", "__net", bucketWidth = bucketMicros * 2)
      .groupBy(timestamp_micros(
          (floor(col("__k") / 2 / bucketMicros) * bucketMicros).cast("long"))
        .as("bucket_start"))
      .agg(
        max(col("running_total")).as("peak_concurrent"),
        sum(col("__starts")).as("n_started"))
  }

  /**
   * Subsequence pattern search: the k sliding windows (per-key,
   * length-m, step 1) whose z-normalized shape is closest to a query
   * pattern in Euclidean distance — distributed whole-matching in the
   * UCR-suite family (cf. "Time Series Similarity Search for
   * Streaming Data in Distributed Systems", EDBT 2019). Z-norming
   * both sides makes the match amplitude/offset-invariant: a spike
   * from 10→30 and one from 0.1→0.3 rank identically.
   *
   * The window is materialized as `m` `lead()` columns off ONE window
   * spec — a single per-key shuffle+sort computes all of them in one
   * pass — and every statistic (μ, σ, the distance) is an EXPLICIT
   * left-associated expression chain, so the arithmetic is a fixed
   * IEEE op sequence: bit-reproducible across engines (the parity
   * contract), codegen-friendly, and free of collect_list buffers.
   * Flat windows (σ ≤ `minStd`) can't be z-normed and are skipped.
   *
   * Scale: one shuffle on the key (the same exchange every other
   * per-key series op reuses), O(m) arithmetic per row with NO row
   * multiplication (contrast the explode-m-copies formulation), and
   * the global top-k compiles to TakeOrderedAndProject — per-task
   * k-row heaps, never a full sort. The UCR early-abandon/LB_Keogh
   * prunes trade branches for vector lanes, which is the wrong trade
   * inside whole-stage codegen; at 100 TB the win is that each
   * executor emits at most k candidate rows.
   *
   * Returns (keyCol, tsCol, tieCol, dist) for the k best windows,
   * identified by their start row.
   */
  def patternSearch(
      series: DataFrame, keyCol: String, tsCol: String, tieCol: String,
      valueCol: String, pattern: Seq[Double], k: Int,
      minStd: Double = 1e-9): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    scoredWindows(series, keyCol, tsCol, tieCol, valueCol, pattern, minStd)
      .orderBy(col("dist"), col(keyCol), col(tieCol))
      .limit(k)
  }

  /**
   * Threshold variant of [[patternSearch]]: EVERY window whose
   * z-normalized distance to the pattern is at most `maxDist` (the
   * compare runs on the round(6) distance, so the cut is engine-
   * reproducible). Same single-WindowExec plan; output is all hits in
   * (key, ts, tie) order — the batch counterpart of
   * `EventStreams.streamingPatternMatch`, parity-asserted in
   * EventStreamsSpec.
   */
  def patternMatches(
      series: DataFrame, keyCol: String, tsCol: String, tieCol: String,
      valueCol: String, pattern: Seq[Double], maxDist: Double,
      minStd: Double = 1e-9): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    scoredWindows(series, keyCol, tsCol, tieCol, valueCol, pattern, minStd)
      .where(col("dist") <= maxDist)
      // The global (key, ts, tie) sort is the oracle-determinism
      // presentation order. Its range sampling re-walks the scored
      // pipeline, but an explicit pre-sort shuffle barrier was
      // MEASURED NOT to help here (3.25 s vs 2.8 s at sf0.1) — the
      // extra exchange costs more than the sampling saves at these
      // hit rates, so the plan stays minimal.
      .orderBy(col(keyCol), col(tsCol), col(tieCol))
  }

  /** Shared scorer for the pattern family: every complete, non-flat
    * window as (key, ts, tie, dist). */
  private def scoredWindows(
      series: DataFrame, keyCol: String, tsCol: String, tieCol: String,
      valueCol: String, pattern: Seq[Double], minStd: Double): DataFrame = {
    val m = pattern.size
    require(m >= 2, s"pattern needs >= 2 points, got $m")
    // fail fast on a degenerate (constant/near-constant) pattern:
    // its z-norm divides by ~0 and every window distance would be
    // NaN — silently zero matches here, a NumberFormatException in
    // the streaming twin. Checked on the COMPUTED variance (the
    // same arithmetic the z-norm uses), not raw deviations.
    val pVarScala = {
      val mn = pattern.reduceLeft(_ + _) / m
      pattern.map(p => p * p).reduceLeft(_ + _) / m - mn * mn
    }
    require(pVarScala > 0 && java.lang.Double.isFinite(math.sqrt(pVarScala)),
      s"pattern must have positive variance (got $pVarScala): a " +
        "constant pattern has no z-norm")
    // Constant-folded z-norm of the pattern: SAME formula as the
    // window side, so the oracle can repeat it literally.
    val pMean = pattern.map(lit).reduceLeft(_ + _) / lit(m.toDouble)
    val pVar = pattern.map(p => lit(p) * lit(p)).reduceLeft(_ + _) /
      lit(m.toDouble) - pMean * pMean
    val pStd = sqrt(pVar)
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    // The m lead() columns are materialized in their OWN projection,
    // and the μ/σ/distance arithmetic runs in a SECOND select over
    // the named outputs. This is load-bearing, not style:
    // ExtractWindowExpressions extracts one WindowExec output PER
    // REFERENCE, and the distance chain references every lead O(m)
    // times through μ and σ — inlining the leads into one projection
    // made the analyzer emit ~m·(2m+something) duplicate window
    // fields (measured: 1386 fields at m=12, ~600 at m=8; ~11 KB of
    // window buffer per row) where m are needed. With the leads
    // aliased first, the second select sees plain attributes and the
    // WindowExec computes exactly the m−1 lead fields. Still ONE
    // window pass
    // (spec-asserted); measured 9.9 s → ~2 s at m=12 on the bench
    // corpus.
    val staged = series.select(
      col(keyCol) +: col(tsCol) +: col(tieCol) +:
        (0 until m).map { i =>
          val v =
            if (i == 0) col(valueCol).cast("double")
            else lead(col(valueCol).cast("double"), i).over(w)
          v.as(s"__v$i")
        }: _*)
    val vs = (0 until m).map(i => col(s"__v$i"))
    val mean = vs.reduceLeft(_ + _) / lit(m.toDouble)
    val variance = vs.map(v => v * v).reduceLeft(_ + _) / lit(m.toDouble) -
      mean * mean
    val std = sqrt(greatest(variance, lit(0.0)))
    val dist2 = pattern.indices.map { i =>
      val d = (vs(i) - mean) / std - ((lit(pattern(i)) - pMean) / pStd)
      d * d
    }.reduceLeft(_ + _)
    staged
      .select(col(keyCol), col(tsCol), col(tieCol),
        vs.last.as("__vlast"), std.as("__std"),
        round(sqrt(dist2), 6).as("dist"))
      .where(col("__vlast").isNotNull && col("__std") > minStd)
      .select(col(keyCol), col(tsCol), col(tieCol), col("dist"))
  }

  /**
   * Seasonal-baseline anomaly report — the hour-of-week profile
   * detector: traffic/value metrics repeat weekly, so "is this hour
   * abnormal?" must compare against the SAME hour-of-week's history,
   * not a flat rolling window (E5's rolling z-score flags every
   * Monday morning as an anomaly of Sunday night). Rows before
   * `baselineEnd` train a per-(dow, hour) mean/std; rows at/after it
   * are scored, flagged when |v − mean| ≥ threshold·std.
   *
   * Exactness: baseline sums accumulate in exact decimals (value
   * cast DECIMAL(18,4) — exact for the 2dp inputs; v² exact at 8dp),
   * the mean/variance finish is a FIXED double-op chain over those
   * exact sums (variance clamped at 0 for constant cells), and the
   * flag compare |v − mean| ≥ t·std runs on identical doubles —
   * no rounding inside the decision. Zero-variance cells never flag
   * (the E5 convention). Output means/stds round(6); all outputs
   * non-negative for non-negative inputs (no signed-zero exposure).
   *
   * Scale: TWO partial-aggregated passes (baseline, eval) joined on
   * the ≤168-row hour-of-week grid — broadcast, no corpus shuffle
   * beyond the two groupBys. dow is 0 = Sunday (dayofweek − 1,
   * matching DuckDB's EXTRACT(dow)).
   *
   * Output: (dow, hour, n_base, mean, std, n_eval, n_anom), grid
   * order; cells with no baseline rows are absent (nothing to score
   * against — their eval rows are unjudgeable, not anomalous).
   */
  def seasonalBaselineAnomalies(
      df: DataFrame, tsCol: String, valCol: String,
      baselineEnd: Column, threshold: Double = 3.0): DataFrame = {
    require(threshold > 0.0, s"threshold must be > 0, got $threshold")
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(18, 4)
    val keyed = df
      .where(col(valCol).isNotNull)
      .select(
        (dayofweek(col(tsCol)) - 1).as("dow"),
        hour(col(tsCol)).as("hour"),
        col(valCol).cast("double").as("__v"),
        col(tsCol).as("__ts"))
    val base = keyed.where(col("__ts") < baselineEnd)
      .groupBy("dow", "hour")
      .agg(
        count(lit(1)).as("n_base"),
        sum(col("__v").cast(dec)).as("__sv"),
        sum(col("__v").cast(dec) * col("__v").cast(dec)).as("__sv2"))
      .withColumn("__mean",
        col("__sv").cast("double") / col("n_base"))
      .withColumn("__var",
        greatest(
          col("__sv2").cast("double") / col("n_base") -
            col("__mean") * col("__mean"),
          lit(0.0)))
      .withColumn("__std", sqrt(col("__var")))
    val eval = keyed.where(col("__ts") >= baselineEnd)
    eval.join(broadcast(base), Seq("dow", "hour"))
      .groupBy(col("dow"), col("hour"))
      .agg(
        max(col("n_base")).as("n_base"),
        max(col("__mean")).as("__m2"),
        max(col("__std")).as("__s2x"),
        count(lit(1)).as("n_eval"),
        sum(when(col("__std") > 0 &&
            abs(col("__v") - col("__mean")) >= lit(threshold) * col("__std"),
          1L).otherwise(0L)).as("n_anom"))
      .select(
        col("dow"), col("hour"), col("n_base"),
        round(col("__m2"), 6).as("mean"),
        round(col("__s2x"), 6).as("std"),
        col("n_eval"), col("n_anom"))
      .orderBy("dow", "hour")
  }
}
