package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One closed user session: [start, end] with its event count. */
case class Session(key: Long, start: Timestamp, end: Timestamp, nEvents: Int)

/** Misra–Gries summary held per heavy-hitter shard. */
case class HHState(counters: Map[String, Long])

/** One heavy-hitter estimate row emitted after a micro-batch. */
case class HeavyHitter(shard: Int, token: String, est: Long)

/** Accumulating state for an open session (exact microseconds). */
case class SessionState(startUs: Long, lastUs: Long, n: Int)

/** Ring buffer of the last `lookback` values for one z-score key. */
case class ZState(ring: Vector[Double])

/** One scored point from the streaming rolling z-score. */
case class ZScored(
    key: Long, ts: Timestamp, value: Double, nPrev: Int,
    z: Option[Double], isAnomaly: Boolean)

/** Per-key debounce state: burst counter (survives burst closes, so
  * burst_seq matches the batch operator) + the open burst, tracked in
  * exact integer microseconds. */
case class DebounceState(
    seq: Long, firstUs: Long, lastUs: Long, keptTie: Long, n: Long,
    hasOpen: Boolean)

/** One closed burst from the streaming debounce. */
case class Burst(
    key: String, burstSeq: Long, keptTie: Long,
    firstTs: Timestamp, lastTs: Timestamp, nEvents: Long)

/** Per-key CUSUM accumulators (both one-sided sums). */
case class CusumState(sPos: Double, sNeg: Double)

/** Per-key EWMA state: the current smoothed level (None until the
  * first observation seeds it). */
case class EwmaState(level: Option[Double])

/** One smoothed point from the streaming EWMA. */
case class EwmaPoint(
    key: Long, ts: Timestamp, tie: Long, value: Double,
    ewma: Double, residual: Option[Double])

/** One scored point from the streaming CUSUM detector. */
case class CusumPoint(
    key: Long, ts: Timestamp, tie: Long, value: Double,
    sPos: Double, sNeg: Double, alarm: Boolean)

/** Per-key pattern-match state: the last m−1 points (tsMicros, tie,
  * value) — the minimum that identifies the window START row when the
  * m-th point completes a window. */
case class PatternState(ring: Vector[(Long, Long, Double)])

/** One matched window from the streaming pattern search, keyed by its
  * start row (same identification the batch operator emits). */
case class PatternHit(key: Long, ts: Timestamp, tie: Long, dist: Double)

/** Per-user touch buffer for streaming attribution: (µs, id) pairs
  * inside the lookback window, evicted on every event. */
case class AttState(touches: Vector[(Long, Long)])

/** One attributed conversion from the streaming attribution. */
case class Attributed(
    key: Long, ts: Timestamp, convId: Long, value: Double,
    firstTouchId: Option[Long], lastTouchId: Option[Long])

/** Per-key survivorship state: version count plus, per field, the
  * (µs, tie) stamp and value of the latest non-null sighting. */
case class PctState(counts: Map[Long, Long])

case class PctQuantile(
  key: String, q_per_mille: Int, n: Long, value: Double)

case class GoldenState(
    n: Long, stamps: Map[String, (Long, Long)],
    values: Map[String, String])

/** One field of a key's golden record (long format; update
  * semantics — readers keep the latest row per (key, field)). */
case class GoldenField(
    key: Long, field: String, value: Option[String], n_versions: Long)

/**
 * Streaming analytics over event streams — the watermarked /
 * stateful half of the engine's streaming surface (the daily-flow
 * skin in [[StreamingDailyFlow]] covers the file-batch half).
 *
 * Scale: both operators key state by the stream's natural key; state
 * stores partition by key across executors, and the watermark bounds
 * state size — windows older than the delay are finalized and
 * dropped, sessions time out `gap` after their last event.
 */
// Serializable because the stateful folds' closures call the shared
// toUs/toTs/round6 helpers, capturing the module reference.
object EventStreams extends Serializable {

  /** Exact microsecond view of a Timestamp — the ONE formula every
    * stateful operator shares (`getTime` truncates to ms and
    * `getNanos` carries the full sub-second; an ms-truncated key
    * merges/splits differently from the batch operators'
    * `unix_micros`, the exact drift bug the debounce family already
    * documents). floorDiv keeps pre-epoch timestamps consistent. */
  private[streaming] def toUs(ts: Timestamp): Long =
    Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000

  /** Inverse of [[toUs]], exact to the microsecond. */
  private[streaming] def toTs(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000)
    t.setNanos(Math.floorMod(us, 1000000L).toInt * 1000)
    t
  }

  /** Spark `round(x, 6)` semantics (HALF_UP) — shared so every
    * streaming score rounds exactly like its batch twin BEFORE any
    * threshold compare (comparing raw doubles flags boundary rows
    * differently from the batch operator). */
  private[streaming] def round6(x: Double): Double =
    BigDecimal.valueOf(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .toDouble

  /**
   * Watermarked sliding-window counts per key: the canonical
   * `groupBy(window(...))` aggregation. With OutputMode.Append the
   * sink receives each (window, key) row exactly once, after the
   * watermark passes the window end; state for closed windows is
   * dropped.
   */
  def windowedCounts(
      events: DataFrame,
      tsCol: String,
      keyCol: String,
      windowDur: String,
      slideDur: String,
      watermarkDelay: String): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDur, slideDur), col(keyCol))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col(keyCol), col("n_events"))

  /**
   * Streaming exact deduplication: across all micro-batches, only the
   * FIRST row per content hash (md5 of `textCol`) is emitted —
   * dedup-at-ingest for a continuously arriving corpus.
   *
   * State honesty: global `dropDuplicates` keeps ONE STATE ENTRY PER
   * DISTINCT HASH FOREVER — a watermark does NOT evict it unless the
   * event-time column is part of the dedup key. That is the right
   * trade for bounded backfills and exact global dedup; for unbounded
   * streams set `withinWatermark = true` (requires `withWatermark`
   * upstream), which uses `dropDuplicatesWithinWatermark` — state is
   * evicted once the watermark passes, deduping only against content
   * seen within the watermark delay.
   *
   * Scale: state partitioned by hash across executors — the streaming
   * analogue of [[graft.operators.Dedup.exact]]'s single hash
   * exchange.
   */
  def streamingExactDedup(
      docs: DataFrame,
      textCol: String,
      withinWatermark: Boolean = false): DataFrame = {
    val hashed = docs.withColumn("__content_hash", md5(col(textCol)))
    val deduped =
      if (withinWatermark) hashed.dropDuplicatesWithinWatermark("__content_hash")
      else hashed.dropDuplicates("__content_hash")
    deduped.drop("__content_hash")
  }

  /**
   * Streaming heavy hitters: a Misra–Gries summary per shard,
   * maintained across micro-batches with `flatMapGroupsWithState`.
   *
   * Tokens hash to `numShards` state keys; each shard keeps at most
   * `capacity` counters (the classic decrement-on-overflow summary),
   * so TOTAL state is O(numShards × capacity) — constant for the
   * life of the stream, where an exact streaming groupBy-count grows
   * with distinct tokens forever. After each batch a shard re-emits
   * its current summary (update semantics; readers take the latest
   * row per (shard, token) and sum over shards).
   *
   * Guarantee (per Misra–Gries, per shard): any token whose true
   * count in the shard exceeds shardN/capacity survives, and its
   * estimate undercounts by at most shardN/capacity. Sharding keeps
   * the per-key state-store entry small AND spreads the fold across
   * executors — one global summary would serialize every token
   * through a single state key.
   */
  def streamingHeavyHitters(
      tokens: DataFrame,
      tokenCol: String,
      capacity: Int,
      numShards: Int): Dataset[HeavyHitter] = {
    require(capacity >= 1 && numShards >= 1,
      s"capacity ($capacity) and numShards ($numShards) must be >= 1")
    val spark = tokens.sparkSession
    import spark.implicits._
    tokens
      // a NULL token would reach the fold (xxhash64(NULL) is the
      // non-null seed), become an unencodable null map key in HHState
      // and kill the query — NULLs carry no frequency signal, drop
      // them at the scan
      .where(col(tokenCol).isNotNull)
      .select(
        pmod(xxhash64(col(tokenCol)), lit(numShards)).cast("int").as("shard"),
        col(tokenCol).cast("string").as("token"))
      .as[(Int, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[HHState, HeavyHitter](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (shard: Int, rows: Iterator[(Int, String)], state: GroupState[HHState]) =>
          val counters = scala.collection.mutable.Map.empty[String, Long] ++=
            state.getOption.map(_.counters).getOrElse(Map.empty)
          rows.foreach { case (_, tok) =>
            counters.get(tok) match {
              case Some(c) => counters(tok) = c + 1
              case None if counters.size < capacity => counters(tok) = 1L
              case None => // decrement step: all counters shed one
                counters.keys.toSeq.foreach { k =>
                  val c = counters(k) - 1
                  if (c <= 0) counters.remove(k) else counters(k) = c
                }
            }
          }
          // retract tokens the decrement step evicted THIS batch:
          // readers keep the latest row per (shard, token), so a
          // token that silently vanishes from the emissions would
          // keep its stale pre-eviction estimate forever — an est=0
          // row tells them to drop it. (In the exact regime —
          // capacity >= vocabulary, the q166 oracle's pin — nothing
          // ever evicts and no zero rows appear.)
          val before = state.getOption.map(_.counters.keySet)
            .getOrElse(Set.empty)
          val evicted = before -- counters.keySet
          state.update(HHState(counters.toMap))
          (counters.iterator
            .map { case (tok, c) => HeavyHitter(shard, tok, c) } ++
            evicted.iterator.map(tok => HeavyHitter(shard, tok, 0L)))
            .toSeq.sortBy(h => (-h.est, h.token)).iterator
      }
  }

  /**
   * Watermarked stream-stream interval join: each left event pairs
   * with the right events for the same key whose timestamp falls in
   * `[leftTs - maxDelaySeconds, leftTs]` — attribution-style
   * enrichment (click ← preceding impressions) across two live
   * streams.
   *
   * Both sides carry watermarks and the join condition bounds the
   * time distance, so each side's buffered state is evicted once the
   * other side's watermark passes the reach of its range — state is
   * O(rate × (delay + maxDelay)) per key, never unbounded. An
   * unbounded-state stream-stream join (no time bound) is refused by
   * Spark in append mode for exactly this reason.
   *
   * Column contract: right columns are emitted with a `right_`
   * prefix; pass disjoint names for everything but `keyCol`.
   */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTsCol: String,
      rightTsCol: String,
      maxDelaySeconds: Long,
      watermarkDelay: String): DataFrame = {
    val l = left.withWatermark(leftTsCol, watermarkDelay)
    val r = right
      .withColumnsRenamed(
        right.columns.filter(_ != keyCol).map(c => c -> s"right_$c").toMap)
      .withWatermark(s"right_$rightTsCol", watermarkDelay)
    val rightTs = col(s"right_$rightTsCol")
    l.join(
      r,
      l(keyCol) === r(keyCol) &&
        rightTs >= l(leftTsCol) - expr(s"INTERVAL $maxDelaySeconds SECONDS") &&
        rightTs <= l(leftTsCol))
      .drop(r(keyCol))
  }

  /**
   * X20 (r12): stream-stream LEFT OUTER interval join — X6
   * ([[intervalJoin]]) with unmatched LEFT rows KEPT: the
   * attribution shape where a conversion with no qualifying
   * touchpoint must still surface (NULL right columns) instead of
   * silently vanishing — in funnel math the unattributed conversions
   * ARE the number (organic rate), and an inner join can't produce
   * them.
   *
   * Streaming semantics (Structured Streaming's outer-join
   * contract): a left row's NULL-padded emission waits until the
   * watermark proves no in-interval right row can still arrive —
   * state for both sides is bounded by the same
   * watermark + time-bound condition as X6, and the null emission is
   * DELAYED, not dropped (spec-pinned). Batch parity: on batch
   * frames the watermark no-ops and this is a plain left outer join
   * with the interval predicate — the q168 twin pattern, DuckDB-
   * replayable.
   *
   * Same column contract as X6: right columns prefixed `right_`,
   * the join key kept once.
   */
  def intervalJoinOuter(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTsCol: String,
      rightTsCol: String,
      maxDelaySeconds: Long,
      watermarkDelay: String): DataFrame = {
    val l = left.withWatermark(leftTsCol, watermarkDelay)
    // The right key is RENAMED before the join (not dropped after):
    // in a self-join, r(keyCol) resolves ambiguously by dataset id
    // and can drop the LEFT key instead — which an inner join hides
    // (matched keys are equal) but an outer join exposes as NULL
    // keys on every unmatched row.
    val r = right
      .withColumnsRenamed(
        right.columns.map(c => c -> s"right_$c").toMap)
      .withWatermark(s"right_$rightTsCol", watermarkDelay)
    val rightTs = col(s"right_$rightTsCol")
    l.join(
      r,
      l(keyCol) === col(s"right_$keyCol") &&
        rightTs >= l(leftTsCol) - expr(s"INTERVAL $maxDelaySeconds SECONDS") &&
        rightTs <= l(leftTsCol),
      "left_outer")
      .drop(s"right_$keyCol")
  }

  /**
   * Stream-static broadcast enrichment — the workhorse streaming
   * join: an unbounded fact stream LEFT-joined to a bounded
   * dimension on an equi-key, the dimension broadcast so the stream
   * side NEVER shuffles (the only join shape that adds zero state
   * and zero watermark bookkeeping to a 100 TB/day stream).
   *
   * Semantics (Structured Streaming's stream-static contract):
   * the static side is re-planned per micro-batch, so a
   * slowly-changing dimension backed by a refreshed table picks up
   * updates at batch boundaries; each event is enriched against the
   * dimension AS OF its own micro-batch — no retraction of
   * already-emitted rows (escalate to [[graft.operators.TemporalJoins]]'
   * SCD2 point-in-time join when bi-temporal correctness matters).
   * Unmatched events survive with NULL dimension columns — an
   * enrichment must never drop facts.
   *
   * Dimension columns are prefixed `dimPrefix` to keep the event
   * schema collision-free. `dim` must be unique per key — a dup key
   * would silently FAN OUT the fact stream; checked eagerly once at
   * construction (the dim is bounded and broadcast-sized by
   * contract, so the probe is one small job; a per-batch refresh
   * that introduces dups later is on the refresher).
   *
   * Batch parity: on a batch frame this is the identical broadcast
   * left join (the q165/q166 twin pattern) — the oracle replays it
   * as plain SQL.
   */
  def staticEnrich(
      stream: DataFrame,
      dim: DataFrame,
      keyCol: String,
      dimCols: Seq[String],
      dimPrefix: String = "dim_"): DataFrame = {
    require(dimCols.nonEmpty, "staticEnrich: dimCols is empty")
    val d = dim.select(col(keyCol) +:
      dimCols.map(c => col(c).as(s"$dimPrefix$c")): _*)
    val dup = d.groupBy(col(keyCol)).count()
      .where(col("count") > 1).limit(1).count()
    require(dup == 0L,
      s"staticEnrich: dimension has duplicate '$keyCol' keys — " +
        "a dup key would fan out the fact stream")
    stream.join(broadcast(d), Seq(keyCol), "left")
  }

  /**
   * Streaming rolling z-score anomaly detection — the stateful
   * counterpart of [[graft.operators.TimeSeries.rollingZScore]]: each
   * point scores against the mean/std (population, sum/sumsq) of the
   * `lookback` values that PRECEDED it for its key, flagged when
   * |z| ≥ `threshold`; warmup (fewer than `lookback` predecessors)
   * and zero-variance frames emit None and never flag.
   *
   * State per key is a ring buffer of exactly `lookback` doubles —
   * constant for the stream's lifetime. Rows are processed in
   * event-time order WITHIN each micro-batch; an in-order source
   * therefore reproduces the batch operator row-for-row
   * (parity-asserted in EventStreamsSpec). A late event that arrives
   * after later points were already scored is scored against the
   * values seen so far — the frames it "should" have joined are
   * already emitted and are not revised (document the source's
   * ordering guarantees accordingly).
   */
  def streamingRollingZScore(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      valueCol: String,
      lookback: Int,
      threshold: Double): Dataset[ZScored] = {
    require(lookback >= 2, s"lookback must be >= 2, got $lookback")
    graft.operators.TimeSeries.requireIntegralKey(events, keyCol)
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(
        col(keyCol).cast("long").as("key"),
        col(tsCol).cast("timestamp").as("ts"),
        col(tieCol).cast("long").as("tie"),
        col(valueCol).cast("double").as("x"))
      .as[(Long, Timestamp, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[ZState, ZScored](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[(Long, Timestamp, Long, Double)],
            state: GroupState[ZState]) =>
          var ring = state.getOption.map(_.ring).getOrElse(Vector.empty)
          val out = rows.toSeq
            .sortBy { case (_, ts, tie, _) =>
              // Full-microsecond key, same as streamingCusum/Ewma:
              // ts.getTime alone is millisecond-resolution and could
              // invert sub-ms orderings vs the batch operator's
              // timestamp ORDER BY, breaking row-identical parity.
              (toUs(ts), tie)
            }
            .map { case (_, ts, _, x) =>
              val scored =
                if (ring.length < lookback) ZScored(key, ts, x, ring.length, None, false)
                else {
                  val n = ring.length
                  val s = ring.sum
                  val s2 = ring.map(d => d * d).sum
                  val std = math.sqrt(math.max((s2 - s * s / n) / n, 0.0))
                  // round-then-compare, matching the batch operator's
                  // round((x-m)/std, 6) BEFORE the threshold test —
                  // a raw-double compare flags boundary rows
                  // differently from the batch twin
                  val z = if (std > 0) Some(round6((x - s / n) / std)) else None
                  ZScored(key, ts, x, n, z,
                    z.exists(v => math.abs(v) >= threshold))
                }
              ring = (ring :+ x).takeRight(lookback)
              scored
            }
          state.update(ZState(ring))
          out.iterator
      }
  }

  /**
   * Streaming two-sided CUSUM drift detection — the stateful
   * counterpart of [[graft.operators.TimeSeries.cusum]]: per key,
   * cumulative sums of deviations beyond the slack band, alarm when
   * either side exceeds `h`, reset after alarm. State per key is TWO
   * doubles — constant for the stream's lifetime, the cheapest state
   * in the family. Rows process in event-time order within each
   * micro-batch; in-order sources reproduce the batch operator
   * row-for-row (parity-asserted in EventStreamsSpec). CUSUM's whole
   * point vs the rolling z-score: a persistent small shift that no
   * single point would flag accumulates until it alarms.
   */
  def streamingCusum(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      valueCol: String,
      target: Double,
      slack: Double,
      h: Double): Dataset[CusumPoint] = {
    require(slack >= 0 && h > 0, s"need slack >= 0 and h > 0: ($slack, $h)")
    graft.operators.TimeSeries.requireIntegralKey(events, keyCol)
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(
        col(keyCol).cast("long").as("key"),
        col(tsCol).cast("timestamp").as("ts"),
        col(tieCol).cast("long").as("tie"),
        col(valueCol).cast("double").as("x"))
      .as[(Long, Timestamp, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[CusumState, CusumPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[(Long, Timestamp, Long, Double)],
            state: GroupState[CusumState]) =>
          var s = state.getOption.getOrElse(CusumState(0.0, 0.0))
          val out = rows.toSeq
            .sortBy { case (_, t, tie, _) =>
              (toUs(t), tie)
            }
            .map { case (_, t, tie, x) =>
              val sp = math.max(0.0, s.sPos + (x - target - slack))
              val sn = math.max(0.0, s.sNeg - (x - target) - slack)
              val alarm = sp > h || sn > h
              s = if (alarm) CusumState(0.0, 0.0) else CusumState(sp, sn)
              CusumPoint(key, t, tie, x, sp, sn, alarm)
            }
          state.update(s)
          out.iterator
      }
  }

  /**
   * Streaming per-key EWMA — the stateful counterpart of
   * [[graft.operators.TimeSeries.ewma]]: one smoothed level per key
   * (a single double), seeded at the first observation, updated
   * α·x + (1−α)·level per event; emits the level plus the
   * pre-update residual. In-order sources reproduce the batch
   * operator row-for-row (parity-asserted in EventStreamsSpec).
   */
  def streamingEwma(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      valueCol: String,
      alpha: Double): Dataset[EwmaPoint] = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1]: $alpha")
    graft.operators.TimeSeries.requireIntegralKey(events, keyCol)
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(
        col(keyCol).cast("long").as("key"),
        col(tsCol).cast("timestamp").as("ts"),
        col(tieCol).cast("long").as("tie"),
        col(valueCol).cast("double").as("x"))
      .as[(Long, Timestamp, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[EwmaState, EwmaPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[(Long, Timestamp, Long, Double)],
            state: GroupState[EwmaState]) =>
          var prev = state.getOption.flatMap(_.level)
          val out = rows.toSeq
            .sortBy { case (_, t, tie, _) =>
              (toUs(t), tie)
            }
            .map { case (_, t, tie, x) =>
              val e = prev match {
                case Some(p) => alpha * x + (1 - alpha) * p
                case None    => x
              }
              val resid = prev.map(x - _)
              prev = Some(e)
              EwmaPoint(key, t, tie, x, e, resid)
            }
          state.update(EwmaState(prev))
          out.iterator
      }
  }

  /**
   * Streaming telemetry debounce — the stateful counterpart of
   * `Sessionize.debounce` (q97): bursts of same-key events ≤
   * `windowSeconds` apart collapse to one emitted row (first event's
   * `tieCol` kept, suppressed count carried). A burst closes — and is
   * emitted exactly once — when a larger gap appears in the data or
   * the watermark passes last-event + window. In-order sources
   * reproduce the batch operator row-for-row (EventStreamsSpec).
   *
   * Timestamps compare in exact integer microseconds, like the batch
   * side — ms truncation would merge bursts the batch operator
   * splits.
   *
   * State: the open burst plus a per-key burst counter. The counter
   * outlives bursts ON PURPOSE (burst_seq must keep counting across
   * bursts to match batch), so each key retains one ~40-byte state
   * row for the stream's lifetime — O(distinct keys), the
   * streamingExactDedup trade. Keys are composite-encoded by the
   * caller (concat) — the natural key is (device, event_type), whose
   * cardinality is bounded.
   *
   * OUT-OF-ORDER contract (round 9, pinned in EventStreamsSpec —
   * the sessionize regimes, plus the representative rule): a
   * within-watermark straggler CONNECTED to the open burst joins it,
   * extending the span and, when its (ts, tie) precedes the kept
   * representative, TAKING OVER keptTie — the row a batch re-run
   * would elect; disconnected-below straggler runs close immediately
   * as their own bursts; sub-watermark rows drop. burst_seq assigns
   * at CLOSE (emission order) — identical numbering for in-order
   * sources, gap-free and monotone under late data.
   */
  def streamingDebounce(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      windowSeconds: Long,
      watermarkDelay: String): Dataset[Burst] = {
    val spark = events.sparkSession
    import spark.implicits._
    val windowUs = windowSeconds * 1000000L

    // Project/cast BEFORE the watermark (see sessionize).
    val typed = events
      .select(
        col(keyCol).cast("string").as("key"),
        col(tsCol).cast("timestamp").as("ts"),
        col(tieCol).cast("long").as("tie"))
      .withWatermark("ts", watermarkDelay)
      .as[(String, Timestamp, Long)]

    typed
      .groupByKey(_._1)
      .flatMapGroupsWithState[DebounceState, Burst](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, rows: Iterator[(String, Timestamp, Long)],
            state: GroupState[DebounceState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            if (s.hasOpen) {
              // burst_seq assigns at CLOSE (emission order) — for
              // in-order sources bursts close in open order, so the
              // numbering is unchanged; under late data it stays
              // gap-free and monotone per key.
              state.update(s.copy(seq = s.seq + 1, hasOpen = false))
              Iterator(Burst(key, s.seq + 1, s.keptTie,
                toTs(s.firstUs), toTs(s.lastUs), s.n))
            } else {
              state.update(s.copy(hasOpen = false))
              Iterator.empty
            }
          } else {
            val sorted = rows.toSeq
              .map { case (_, ts, tie) => (toUs(ts), tie) }.sorted
            var st = state.getOption
              .getOrElse(DebounceState(0L, 0L, 0L, 0L, 0L, hasOpen = false))
            val out = Seq.newBuilder[Burst]
            var seqCtr = st.seq
            def emit(first: Long, last: Long, tie: Long, n: Long): Unit = {
              seqCtr += 1
              out += Burst(key, seqCtr, tie, toTs(first), toTs(last), n)
            }
            // Same three late-data regimes as sessionize (see its
            // scaladoc): bounds fixed at batch start.
            val floorUs = if (st.hasOpen) Some(st.firstUs - windowUs) else None
            var below: Option[DebounceState] = None
            sorted.foreach { case (t, tie) =>
              if (st.hasOpen && floorUs.exists(t < _)) {
                // disconnected below the open burst: chain straggler
                // runs by the same window rule, emit each run closed
                below match {
                  case Some(b) if t - b.lastUs <= windowUs =>
                    below = Some(b.copy(lastUs = t, n = b.n + 1))
                  case Some(b) =>
                    emit(b.firstUs, b.lastUs, b.keptTie, b.n)
                    below = Some(DebounceState(0L, t, t, tie, 1L, hasOpen = true))
                  case None =>
                    below = Some(DebounceState(0L, t, t, tie, 1L, hasOpen = true))
                }
              } else if (st.hasOpen && t - st.lastUs <= windowUs) {
                // connected: extend the span; a (ts, tie) below the
                // kept representative takes over — the row a batch
                // re-run would elect as the burst's first event
                val repl = t < st.firstUs ||
                  (t == st.firstUs && tie < st.keptTie)
                st = st.copy(
                  firstUs = math.min(st.firstUs, t),
                  lastUs = math.max(st.lastUs, t),
                  keptTie = if (repl) tie else st.keptTie,
                  n = st.n + 1)
              } else {
                if (st.hasOpen) emit(st.firstUs, st.lastUs, st.keptTie, st.n)
                st = DebounceState(0L, t, t, tie, 1L, hasOpen = true)
              }
            }
            below.foreach(b => emit(b.firstUs, b.lastUs, b.keptTie, b.n))
            st = st.copy(seq = seqCtr)
            state.update(st)
            if (st.hasOpen)
              // Round the µs deadline UP to ms so the burst can't
              // close a fraction early.
              state.setTimeoutTimestamp((st.lastUs + windowUs + 999) / 1000)
            out.result().iterator
          }
      }
  }

  /**
   * Gap-based sessionization via `flatMapGroupsWithState` with
   * event-time timeout: events for a key belong to one session while
   * consecutive gaps stay ≤ `gapSeconds`; a session closes (and is
   * emitted exactly once) when a larger gap appears in the data or
   * the watermark passes last-event + gap.
   *
   * OUT-OF-ORDER contract (pinned in EventStreamsSpec): rows sort
   * within each micro-batch, so any disorder confined to a batch is
   * invisible. Across batches, a straggler newer than the watermark
   * lands in one of three documented regimes:
   *   - CONNECTED (within `gap` of the open session's span): it joins
   *     the open session, extending the start downward / end upward —
   *     exactly what a batch re-run would produce;
   *   - DISCONNECTED BELOW (more than `gap` below the open start):
   *     batch semantics would give it its own earlier session; append
   *     mode holds ONE open session per key, so the straggler run
   *     (consecutive stragglers in the same batch chain by the same
   *     gap rule) closes immediately. A batch re-run could merge such
   *     runs across batches — the standard append-mode approximation;
   *   - OLDER THAN THE WATERMARK: dropped by the engine before the
   *     state function; emitted sessions are final. An event that
   *     could have joined an already-TIMED-OUT session is necessarily
   *     below the watermark (timeout fires only once the watermark
   *     passes last + gap), so timeout-closed sessions can never be
   *     stale — only in-data gap closes admit the approximation
   *     above.
   * Straggler runs are evaluated against the open session's
   * batch-start bounds; a batch whose stragglers would only connect
   * through bounds moved by LATER rows of the same batch keeps them
   * separate (documented evaluation order, deterministic).
   */
  def sessionize(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      gapSeconds: Long,
      watermarkDelay: String): Dataset[Session] = {
    graft.operators.TimeSeries.requireIntegralKey(events, keyCol)
    val spark = events.sparkSession
    import spark.implicits._
    // EXACT microseconds, matching the batch operator's unix_micros
    // gap arithmetic: an ms-truncated gap would merge sessions the
    // batch operator splits (gap 10_000_500 µs vs a 10 s threshold)
    // and truncate session bounds on sub-ms data.
    val gapUs = gapSeconds * 1000000L

    // Project/cast BEFORE the watermark: a projection on top of
    // withWatermark produces fresh attributes without the watermark
    // tag, and event-time timeout then fails analysis.
    val typed = events
      .select(
        col(keyCol).cast("long").as("key"),
        col(tsCol).cast("timestamp").as("ts"))
      .withWatermark("ts", watermarkDelay)
      .as[(Long, Timestamp)]

    typed
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, rows: Iterator[(Long, Timestamp)],
            state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(key, toTs(s.startUs), toTs(s.lastUs), s.n))
          } else {
            val times = rows.map(r => toUs(r._2)).toArray.sorted
            var open = state.getOption
            val closed = Seq.newBuilder[Session]
            // Straggler run below the open session (cross-batch
            // late data): bounds fixed at batch start so the regime
            // split below is deterministic.
            val floorUs = open.map(_.startUs - gapUs)
            var below: Option[SessionState] = None
            times.foreach { t =>
              open match {
                case Some(_) if floorUs.exists(t < _) =>
                  // disconnected below: chain consecutive stragglers
                  // by the same gap rule, emit each run closed
                  below match {
                    case Some(b) if t - b.lastUs <= gapUs =>
                      below = Some(b.copy(lastUs = t, n = b.n + 1))
                    case Some(b) =>
                      closed += Session(key, toTs(b.startUs), toTs(b.lastUs), b.n)
                      below = Some(SessionState(t, t, 1))
                    case None =>
                      below = Some(SessionState(t, t, 1))
                  }
                case Some(s) if t - s.lastUs <= gapUs =>
                  // connected: interior or within gap of either bound
                  // (t >= start - gap holds by the branch above) —
                  // extend both bounds, matching a batch re-run
                  open = Some(s.copy(startUs = math.min(s.startUs, t),
                    lastUs = math.max(s.lastUs, t), n = s.n + 1))
                case Some(s) =>
                  closed += Session(key, toTs(s.startUs), toTs(s.lastUs), s.n)
                  open = Some(SessionState(t, t, 1))
                case None =>
                  open = Some(SessionState(t, t, 1))
              }
            }
            below.foreach(b =>
              closed += Session(key, toTs(b.startUs), toTs(b.lastUs), b.n))
            open.foreach { s =>
              state.update(s)
              // timeout is an ms API: round UP so it never fires a
              // sub-ms early
              state.setTimeoutTimestamp(
                Math.floorDiv(s.lastUs + gapUs, 1000L) + 1L)
            }
            closed.result().iterator
          }
      }
  }

  /**
   * Streaming subsequence pattern matching — the stateful counterpart
   * of [[graft.operators.TimeSeries.patternMatches]] (the EDBT-2019
   * streaming-similarity-search setting the batch operator cites):
   * per key the state is ONLY the last m−1 points (ring of (tsMicros,
   * tie, value) — O(m) per key, the minimum that can identify a
   * completed window's START row), each arriving point completes one
   * window, and windows whose z-normalized distance to the pattern is
   * at most `maxDist` are emitted keyed by their start row.
   *
   * Parity contract: values fold in index order exactly like the
   * batch operator's left-associated expression chain, the distance
   * is rounded HALF_UP to 6 places (Spark `round` semantics) BEFORE
   * the threshold compare, and rows sort by the exact-microsecond
   * (ts, tie) key — in-order sources reproduce the batch hit set
   * row-for-row (EventStreamsSpec).
   *
   * OUT-OF-ORDER contract (pinned in EventStreamsSpec): rows sort by
   * (ts, tie) WITHIN each micro-batch, so disorder confined to a
   * batch is invisible; a cross-batch straggler folds at its ARRIVAL
   * position — the m−1-point ring cannot reorder already-consumed
   * history (that is what keeps state O(m), not O(stream)) — so
   * windows spanning a straggler are formed over the as-arrived
   * sequence, deterministically. Sources with bounded disorder
   * should batch at least that bound (or pre-sort per trigger);
   * there is deliberately NO watermark here, because a correct
   * straggler-reordering operator would have to buffer
   * watermark-delay's worth of points per key, turning O(m) state
   * into O(rate·delay).
   */
  def streamingPatternMatch(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      valueCol: String,
      pattern: Seq[Double],
      maxDist: Double,
      minStd: Double = 1e-9): Dataset[PatternHit] = {
    val m = pattern.size
    require(m >= 2, s"pattern needs >= 2 points, got $m")
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    graft.operators.TimeSeries.requireIntegralKey(events, keyCol)
    // Constant z-norm of the pattern, same fold order as the batch
    // expression chain (Catalyst constant-folds the identical ops).
    val pMean = pattern.reduceLeft(_ + _) / m
    val pVar = pattern.map(p => p * p).reduceLeft(_ + _) / m - pMean * pMean
    // fail fast on a degenerate pattern (same computed-variance check
    // as the batch twin): zp would be NaN/Inf and round6(NaN) throws
    // INSIDE flatMapGroupsWithState, killing the whole query
    require(pVar > 0 && java.lang.Double.isFinite(math.sqrt(pVar)),
      s"pattern must have positive variance (got $pVar): a constant " +
        "pattern has no z-norm")
    val pStd = math.sqrt(pVar)
    val zp = pattern.map(p => (p - pMean) / pStd)
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(
        col(keyCol).cast("long").as("key"),
        col(tsCol).cast("timestamp").as("ts"),
        col(tieCol).cast("long").as("tie"),
        col(valueCol).cast("double").as("x"))
      .as[(Long, Timestamp, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[PatternState, PatternHit](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[(Long, Timestamp, Long, Double)],
            state: GroupState[PatternState]) =>
          var ring = state.getOption.map(_.ring).getOrElse(Vector.empty)
          val out = rows.toSeq
            .sortBy { case (_, t, tie, _) => (toUs(t), tie) }
            .flatMap { case (_, t, tie, x) =>
              val tUs = toUs(t)
              val hit =
                if (ring.length < m - 1) None
                else {
                  val vs = ring.map(_._3) :+ x
                  // Same index-order folds as the batch expressions.
                  val mean = vs.reduceLeft(_ + _) / m
                  val std = math.sqrt(math.max(
                    vs.map(v => v * v).reduceLeft(_ + _) / m - mean * mean,
                    0.0))
                  if (std <= minStd) None
                  else {
                    val dist2 = pattern.indices
                      .map { i =>
                        val d = (vs(i) - mean) / std - zp(i)
                        d * d
                      }
                      .reduceLeft(_ + _)
                    val dist = round6(math.sqrt(dist2))
                    if (dist <= maxDist) {
                      val (sUs, sTie, _) = ring.head
                      val sTs = new Timestamp(sUs / 1000000 * 1000)
                      sTs.setNanos((sUs % 1000000).toInt * 1000)
                      Some(PatternHit(key, sTs, sTie, dist))
                    } else None
                  }
                }
              ring = (ring :+ ((tUs, tie, x))).takeRight(m - 1)
              hit
            }
          state.update(PatternState(ring))
          out.iterator
      }
  }

  /**
   * Streaming first/last-touch attribution — the stateful
   * counterpart of [[graft.operators.Funnel.touchAttribution]]:
   * per-user state is the touch buffer INSIDE the closed lookback
   * window `[now − lookbackSeconds, now]`, evicted on every event,
   * so state size is bounded by event density × lookback, never the
   * user's history. A conversion emits the buffer's (µs, id)-min and
   * -max touch ids — the batch operator's struct tie rule exactly —
   * at the moment it arrives (attribute-at-ingest).
   *
   * In-order sources reproduce the batch operator row-for-row
   * (EventStreamsSpec parity across micro-batch splits; the batch
   * fold itself is DuckDB-pinned by q184 — the q160/q161 twin
   * program).
   *
   * OUT-OF-ORDER contract (round 9, pinned in EventStreamsSpec): a
   * cross-batch straggler conversion attributes over the buffer
   * CLIPPED to its own closed window's upper bound — never to
   * touches newer than itself — and sees touches the buffer still
   * holds; touches already evicted by a newer event's threshold are
   * gone (the price of O(density·lookback) state). A late TOUCH
   * joins the buffer and serves later conversions, but already
   * emitted conversions are never revised (append mode).
   */
  def streamingAttribution(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      idCol: String,
      typeCol: String,
      valueCol: String,
      conversionType: String,
      touchTypes: Seq[String],
      lookbackSeconds: Long): Dataset[Attributed] = {
    require(lookbackSeconds > 0, s"lookback must be positive: $lookbackSeconds")
    graft.operators.TimeSeries.requireIntegralKey(events, keyCol)
    val lUs = lookbackSeconds * 1000000L
    val touchSet = touchTypes.toSet
    val spark = events.sparkSession
    import spark.implicits._
    events
      .where(col(typeCol) === conversionType ||
        col(typeCol).isin(touchTypes: _*))
      .select(
        col(keyCol).cast("long").as("key"),
        col(tsCol).cast("timestamp").as("ts"),
        col(idCol).cast("long").as("id"),
        col(typeCol).cast("string").as("typ"),
        col(valueCol).cast("double").as("value"))
      .as[(Long, Timestamp, Long, String, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[AttState, Attributed](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[(Long, Timestamp, Long, String, Double)],
            state: GroupState[AttState]) =>
          var buf = state.getOption.map(_.touches).getOrElse(Vector.empty)
          // Process per MICROSECOND group, touches before conversions:
          // the batch twin's RANGE frame is value-based, so a touch
          // sharing the conversion's exact microsecond is in frame
          // REGARDLESS of event-id order — a strictly (us, id)-ordered
          // fold would miss a same-us touch with a larger id. (Same-us
          // pairs split ACROSS micro-batches remain the streaming
          // residual: a conversion cannot retro-emit.)
          val sorted = rows.toSeq
            .sortBy { case (_, t, id, _, _) => (toUs(t), id) }
            .toIndexedSeq
          val out = Vector.newBuilder[Attributed]
          var i = 0
          while (i < sorted.length) {
            val us = toUs(sorted(i)._2)
            var j = i
            while (j < sorted.length && toUs(sorted(j)._2) == us) j += 1
            buf = buf.filter(_._1 >= us - lUs) // closed-window evict
            sorted.slice(i, j).foreach { case (_, _, id, typ, _) =>
              if (touchSet(typ)) buf = buf :+ ((us, id))
            }
            // emit on the CONVERSION TYPE, not "not a touch": when
            // conversionType is also listed in touchTypes the batch
            // twin both buffers the event AND emits it (its own
            // touch entry is in the RANGE frame) — an if/else here
            // would silently emit nothing
            sorted.slice(i, j).foreach { case (_, t, id, typ, v) =>
              if (typ == conversionType) {
                // Closed-window UPPER bound at emission: a cross-batch
                // straggler conversion must not attribute to touches
                // NEWER than itself (the buffer can hold them; the
                // batch frame [t−L, t] excludes them). Straggler
                // batches can leave the buffer UNSORTED, so the
                // newer-touch probe is an explicit scan — allocation-
                // free on the in-order path (every batch-mode row),
                // where it finds nothing newer. The symmetric
                // residual stays: touches older than a previous
                // batch's eviction threshold are gone — the price of
                // O(density·lookback) state (documented).
                val frame =
                  if (buf.exists(_._1 > us)) buf.filter(_._1 <= us)
                  else buf
                out += Attributed(
                  key, t, id, v, frame.minOption.map(_._2),
                  frame.maxOption.map(_._2))
              }
            }
            i = j
          }
          state.update(AttState(buf))
          out.result().iterator
      }
  }

  /**
   * X14: continuously-maintained table content fingerprint — the
   * streaming skin over [[graft.operators.Quality.tableFingerprint]],
   * whose batch body is oracle-pinned by q189. The SAME function body
   * runs on the streaming frame: the digest aggregates (count, XOR,
   * exact decimal sum, min, max of 60-bit row hashes) are all
   * commutative/associative, so Spark's streaming hash aggregate
   * folds them incrementally across micro-batches with NO
   * order-sensitivity — write in `complete` (or `update`) mode and
   * every emitted row IS the fingerprint of everything ingested so
   * far. Data-versioning-at-ingest: downstream consumers diff the
   * latest digest row against the last committed snapshot's digest
   * without ever re-scanning the table.
   *
   * State honesty: ONE digest row per group, forever — O(|groups|)
   * state, the minimal footprint any running per-group digest can
   * have. No watermark needed (nothing is ever evicted; eviction
   * would change the digest's meaning).
   */
  def streamingFingerprint(
      rows: DataFrame, cols: Seq[String], groupCol: String): DataFrame =
    graft.operators.Quality.tableFingerprint(rows, cols, groupCol)

  /**
   * Streaming survivorship / golden record — the stateful
   * counterpart of [[graft.operators.Merge.goldenRecord]]: per key,
   * each FIELD independently holds the value of the latest non-null
   * sighting under the (event-time µs, tie) total order, maintained
   * across micro-batches in `flatMapGroupsWithState`.
   *
   * The state is a per-field (stamp, value) pair, so the fold is
   * ORDER-INDEPENDENT: a straggler older than a field's current
   * stamp can never overwrite it, and a late null never erases —
   * strictly stronger than the in-order contract the replay-style
   * streaming twins carry. State per key is |fields| stamped strings
   * plus a counter — constant for the key's lifetime.
   *
   * Field values are carried as STRINGS (one generic state encoding;
   * cast downstream). Output is long-format update semantics: after
   * each batch every touched key re-emits one row per field; readers
   * keep the latest row per (key, field). In batch mode each key
   * folds once from empty state, reproducing the batch operator's
   * semantics exactly — the q165-pattern oracle twin.
   */
  /**
   * Streaming exact-grid percentile monitor — continuous p50/p95/p99
   * per key, the latency/size observability readout a stream is
   * usually watched for. State per key is an EXACT count histogram
   * over the floor(value·scale) grid, maintained in
   * `flatMapGroupsWithState`: counts are commutative, so the fold is
   * ORDER-INDEPENDENT across micro-batches and stragglers (the X16
   * property), and the emitted quantiles are exact lower
   * nearest-rank order statistics ON THE GRID, not sketch estimates
   * — integer rank arithmetic `(n·q + 999) div 1000`, never a double
   * path.
   *
   * State-size contract: one (bucket, count) entry per OCCUPIED grid
   * cell — bounded by the metric's value domain × scale, which for
   * observability metrics (latencies, sizes, rates) is bounded by
   * construction; callers pick `scale` to cap it. This is the
   * exact-on-a-grid alternative to a quantile sketch: same bounded
   * state, zero estimation error at grid resolution.
   *
   * Update-mode emissions: after each batch every touched key
   * re-emits one row per quantile; readers keep the latest. In batch
   * mode each key folds once from empty state ⇒ exact nearest-rank
   * grid percentiles, the q165-pattern oracle twin.
   */
  def streamingPercentiles(
      events: DataFrame, keyCol: String, valueCol: String,
      scale: Int = 100,
      quantilesPerMille: Seq[Int] = Seq(500, 950, 990))
      : Dataset[PctQuantile] = {
    require(scale >= 1, s"scale must be >= 1, got $scale")
    require(quantilesPerMille.nonEmpty &&
      quantilesPerMille.forall(q => q >= 1 && q <= 999),
      s"quantilesPerMille must be in [1, 999]: $quantilesPerMille")
    val spark = events.sparkSession
    import spark.implicits._
    events
      .where(col(valueCol).isNotNull)
      .select(col(keyCol).cast("string").as("k"),
        floor(col(valueCol) * scale).cast("long").as("b"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[PctState, PctQuantile](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, Long)],
         state: GroupState[PctState]) =>
          var counts = state.getOption
            .map(_.counts).getOrElse(Map.empty[Long, Long])
          rows.foreach { case (_, b) =>
            counts = counts.updated(b, counts.getOrElse(b, 0L) + 1L)
          }
          state.update(PctState(counts))
          val n = counts.valuesIterator.sum
          val sorted = counts.toSeq.sortBy(_._1)
          quantilesPerMille.iterator.map { q =>
            val rank = (n * q + 999L) / 1000L
            var cum = 0L
            var v = sorted.head._1
            val it = sorted.iterator
            var found = false
            while (it.hasNext && !found) {
              val (bk, c) = it.next()
              cum += c
              if (cum >= rank) { v = bk; found = true }
            }
            PctQuantile(key, q, n, v.toDouble / scale)
          }
      }
  }

  def streamingGoldenRecord(
      events: DataFrame, keyCol: String, tsCol: String, tieCol: String,
      fields: Seq[String]): Dataset[GoldenField] = {
    require(fields.nonEmpty, "streamingGoldenRecord: fields is empty")
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(
        col(keyCol).cast("long").as("k"),
        unix_micros(col(tsCol)).as("us"),
        col(tieCol).cast("long").as("tie"),
        array(fields.map(f => col(f).cast("string")): _*).as("vals"))
      .as[(Long, Long, Long, Seq[String])]
      .groupByKey(_._1)
      .flatMapGroupsWithState[GoldenState, GoldenField](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[(Long, Long, Long, Seq[String])],
         state: GroupState[GoldenState]) =>
          var st = state.getOption
            .getOrElse(GoldenState(0L, Map.empty, Map.empty))
          rows.foreach { case (_, us, tie, vals) =>
            var stamps = st.stamps
            var values = st.values
            fields.zipWithIndex.foreach { case (f, i) =>
              val v = vals(i)
              if (v != null) {
                val newer = stamps.get(f) match {
                  case Some((sUs, sTie)) =>
                    us > sUs || (us == sUs && tie > sTie)
                  case None => true
                }
                if (newer) {
                  stamps = stamps.updated(f, (us, tie))
                  values = values.updated(f, v)
                }
              }
            }
            st = GoldenState(st.n + 1L, stamps, values)
          }
          state.update(st)
          fields.iterator
            .map(f => GoldenField(key, f, st.values.get(f), st.n))
      }
  }
}
