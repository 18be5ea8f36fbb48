package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams

/** Watermarked windowed aggregation + stateful gap sessionization
  * over MemoryStream micro-batches. */
class EventStreamsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("windowedCounts finalizes windows exactly once after the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val counts = EventStreams.windowedCounts(
      input.toDF.toDF("user_id", "ts"),
      "ts", "user_id", "10 seconds", "10 seconds", "5 seconds")
    val q = counts.writeStream
      .format("memory").queryName("win_counts").outputMode("append").start()
    try {
      input.addData((1L, ts(1)), (1L, ts(4)), (2L, ts(8)))
      q.processAllAvailable()
      // Watermark still at 8-5=3s: window [0,10) not finalized yet.
      assert(spark.table("win_counts").count() === 0)
      input.addData((1L, ts(30))) // watermark -> 25s, finalizes [0,10)
      q.processAllAvailable()
      val rows = spark.table("win_counts")
        .select("user_id", "n_events").as[(Long, Long)].collect().toSet
      assert(rows === Set((1L, 2L), (2L, 1L)))
    } finally q.stop()
  }

  test("streamingExactDedup suppresses duplicate content across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val deduped = EventStreams.streamingExactDedup(
      input.toDF.toDF("doc_id", "text"), "text")
    val q = deduped.writeStream
      .format("memory").queryName("stream_dedup").outputMode("append").start()
    try {
      input.addData((1L, "alpha"), (2L, "beta"), (3L, "alpha"))
      q.processAllAvailable()
      input.addData((4L, "beta"), (5L, "gamma")) // beta already seen in batch 1
      q.processAllAvailable()
      val rows = spark.table("stream_dedup")
        .as[(Long, String)].collect().sortBy(_._1)
      assert(rows.map(_._2).toSeq === Seq("alpha", "beta", "gamma"))
      assert(rows.map(_._1).toSet.intersect(Set(3L, 4L)) === Set.empty)
    } finally q.stop()
  }

  test("streamingExactDedup withinWatermark: TTL state — duplicates " +
      "drop inside the horizon, re-emit after eviction") {
    // X19: dropDuplicatesWithinWatermark vs the infinite-state
    // default. State for a content hash lives only until the
    // watermark passes its event time + delay; a re-send AFTER
    // eviction is a NEW row (the bounded-state contract a forever
    // stream needs), while dropDuplicates would suppress it forever.
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val deduped = EventStreams.streamingExactDedup(
      input.toDF.toDF("doc_id", "ts", "text")
        .withWatermark("ts", "1 hour"),
      "text", withinWatermark = true)
    val q = deduped.writeStream
      .format("memory").queryName("stream_dedup_wm")
      .outputMode("append").start()
    try {
      // base at 1h: a ts-0 first row would sit ON the initial
      // watermark (0) and be dropped as late before dedup sees it
      input.addData((1L, ts(3600), "alpha"), (2L, ts(3660), "beta"))
      q.processAllAvailable()
      // within the 1h horizon: duplicate alpha drops
      input.addData((3L, ts(4200), "alpha"))
      q.processAllAvailable()
      // advance the watermark far past alpha's ts + 1h, evicting its
      // dedup state ...
      input.addData((4L, ts(5 * 3600), "gamma"))
      q.processAllAvailable()
      // ... then re-send alpha with a fresh event time: state is
      // gone, so it re-emits (the infinite-state path would drop it)
      input.addData((5L, ts(5 * 3600 + 60), "alpha"))
      q.processAllAvailable()
      val rows = spark.table("stream_dedup_wm")
        .as[(Long, Timestamp, String)].collect().sortBy(_._1)
      assert(rows.map(_._1).toSeq === Seq(1L, 2L, 4L, 5L),
        rows.mkString(","))
      assert(rows.count(_._3 == "alpha") === 2,
        "post-eviction re-send must re-emit")
    } finally q.stop()
  }

  test("sessionize closes sessions on in-batch gaps and on event-time timeout") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val sessions = EventStreams.sessionize(
      input.toDF.toDF("user_id", "ts"),
      "user_id", "ts", gapSeconds = 10, watermarkDelay = "0 seconds")
    val q = sessions.writeStream
      .format("memory").queryName("sessions").outputMode("append").start()
    try {
      // User 1: two events 4s apart (one session), then a 100s gap
      // inside the same batch -> first session closes in-batch.
      // (Events start at 1s: a row exactly at the initial epoch-0
      // watermark would be dropped as late.)
      input.addData((1L, ts(1)), (1L, ts(5)), (1L, ts(105)))
      q.processAllAvailable()
      val inBatch = spark.table("sessions")
        .as[graft.streaming.Session].collect()
      assert(inBatch.length === 1)
      assert(inBatch.head.key === 1L)
      assert(inBatch.head.nEvents === 2)
      assert(inBatch.head.start === ts(1) && inBatch.head.end === ts(5))

      // Advance the watermark far past 105+gap -> open session times out.
      input.addData((2L, ts(500)))
      q.processAllAvailable()
      input.addData((2L, ts(600))) // next batch sees the new watermark
      q.processAllAvailable()
      val all = spark.table("sessions").as[graft.streaming.Session].collect()
      val timedOut = all.find(s => s.key == 1L && s.nEvents == 1)
      assert(timedOut.isDefined, s"open session should have timed out: ${all.toSeq}")
      assert(timedOut.get.start === ts(105) && timedOut.get.end === ts(105))
    } finally q.stop()
  }

  test("intervalJoin pairs events within the delay bound, drops stale state") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp)]
    val imps = MemoryStream[(Long, Timestamp, String)]
    val joined = EventStreams.intervalJoin(
      clicks.toDF.toDF("user_id", "click_ts"),
      imps.toDF.toDF("user_id", "imp_ts", "campaign"),
      keyCol = "user_id", leftTsCol = "click_ts", rightTsCol = "imp_ts",
      maxDelaySeconds = 10, watermarkDelay = "5 seconds")
    val q = joined.writeStream
      .format("memory").queryName("ij_out").outputMode("append").start()
    try {
      imps.addData((1L, ts(100), "camp_a"), (1L, ts(85), "camp_old"),
        (2L, ts(101), "camp_b"))
      clicks.addData((1L, ts(105)), (2L, ts(120)))
      q.processAllAvailable()
      // Advance both watermarks so in-range pairs finalize.
      imps.addData((9L, ts(200), "camp_z"))
      clicks.addData((9L, ts(200)))
      q.processAllAvailable()
      val rows = spark.table("ij_out")
        .select("user_id", "right_campaign").as[(Long, String)]
        .collect().toSet
      // user 1: imp@100 within [95,105] joins; imp@85 is outside.
      // user 2: imp@101 outside [110,120]. user 9: exact-time match.
      assert(rows === Set((1L, "camp_a"), (9L, "camp_z")))
    } finally q.stop()
  }

  test("intervalJoinOuter: matches emit; unmatched left NULL-pads " +
      "only after the watermark closes its interval") {
    implicit val sqlCtx = spark.sqlContext
    val purchases = MemoryStream[(Long, Timestamp)]
    val views = MemoryStream[(Long, Timestamp, String)]
    val joined = EventStreams.intervalJoinOuter(
      purchases.toDF.toDF("user_id", "click_ts"),
      views.toDF.toDF("user_id", "imp_ts", "campaign"),
      keyCol = "user_id", leftTsCol = "click_ts", rightTsCol = "imp_ts",
      maxDelaySeconds = 10, watermarkDelay = "5 seconds")
    val q = joined.writeStream
      .format("memory").queryName("ijo_out").outputMode("append").start()
    try {
      views.addData((1L, ts(100), "camp_a"))
      purchases.addData((1L, ts(105)), (2L, ts(106)))
      q.processAllAvailable()
      // user 2 has no view: its NULL row must NOT emit yet — a
      // qualifying view could still arrive under the watermark
      val early = spark.table("ijo_out")
        .select("user_id", "right_campaign").as[(Long, Option[String])]
        .collect().toSet
      assert(!early.contains((2L, None)),
        s"null row emitted before the watermark closed: $early")
      // advance both watermarks far past 106 + delay
      views.addData((9L, ts(300), "camp_z"))
      purchases.addData((9L, ts(300)))
      q.processAllAvailable()
      purchases.addData((10L, ts(400)))
      views.addData((10L, ts(400), "camp_y"))
      q.processAllAvailable()
      val rows = spark.table("ijo_out")
        .select("user_id", "right_campaign").as[(Long, Option[String])]
        .collect().toSet
      assert(rows.contains((1L, Some("camp_a"))), rows.toString)
      assert(rows.contains((2L, None)),
        s"unmatched left must NULL-pad after the horizon: $rows")
    } finally q.stop()
  }

  test("parity: streamingExactDedup keeps exactly Dedup.exact's survivors") {
    // Strongest correctness signal available for the streaming family:
    // run the SAME corpus through the streaming dedup (3 micro-batches,
    // ids arriving in order so first-seen == min-id) and the batch
    // operator, and demand row-identical survivors.
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(7)
    val texts = Vector("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta")
    val corpus = (1L to 60L).map(i => (i, texts(rnd.nextInt(texts.size))))
    val input = MemoryStream[(Long, String)]
    val deduped = EventStreams.streamingExactDedup(
      input.toDF.toDF("doc_id", "text"), "text")
    val q = deduped.writeStream
      .format("memory").queryName("parity_dedup").outputMode("append").start()
    try {
      corpus.grouped(20).foreach { batch =>
        input.addData(batch: _*)
        q.processAllAvailable()
      }
      val streamed = spark.table("parity_dedup")
        .as[(Long, String)].collect().toSet
      val batch = graft.operators.Dedup
        .exact(corpus.toDF("doc_id", "text"), "text", "doc_id")
        .select("doc_id", "text").as[(Long, String)].collect().toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("parity: streaming sessionize matches batch Sessionize.sessionStats") {
    // Same events through the stateful streaming sessionizer (all real
    // events in one batch, then two far-future flusher batches so every
    // open session times out) and the batch gaps-and-islands operator.
    // Closed sessions must be row-identical: (key, start, end, count).
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(11)
    val events = for {
      user <- 1L to 5L
      // Cumulative gaps straddle the 10s threshold on both sides,
      // including the == boundary (gap must be STRICTLY > to split).
      t <- Iterator.iterate(1L + rnd.nextInt(5))(
        _ + Seq(2L, 5L, 10L, 11L, 30L)(rnd.nextInt(5))).take(25).toSeq
    } yield (user, ts(t))
    val flushKey = 99L

    val input = MemoryStream[(Long, Timestamp)]
    val sessions = EventStreams.sessionize(
      input.toDF.toDF("user_id", "ts"),
      "user_id", "ts", gapSeconds = 10, watermarkDelay = "0 seconds")
    val q = sessions.writeStream
      .format("memory").queryName("parity_sessions").outputMode("append").start()
    try {
      input.addData(events: _*)
      q.processAllAvailable()
      input.addData((flushKey, ts(100000))) // watermark past every last+gap
      q.processAllAvailable()
      input.addData((flushKey, ts(200000))) // next batch fires the timeouts
      q.processAllAvailable()
      val streamed = spark.table("parity_sessions")
        .as[graft.streaming.Session].collect()
        .filter(_.key != flushKey)
        .map(s => (s.key, s.start, s.end, s.nEvents.toLong)).toSet
      val batch = graft.operators.Sessionize
        .sessionStats(events.toDF("user_id", "ts"),
          "user_id", "ts", tieCol = "ts", gapSeconds = 10)
        .select("user_id", "session_start", "session_end", "n_events")
        .as[(Long, Timestamp, Timestamp, Long)].collect().toSet
      assert(streamed === batch)
      assert(streamed.nonEmpty && streamed.size >= 5)
    } finally q.stop()
  }

  test("parity: streamingRollingZScore matches batch TimeSeries.rollingZScore") {
    // Same in-order series through the stateful streaming scorer
    // (3 micro-batches, frames straddling batch boundaries) and the
    // batch window operator: n_prev, z (to 1e-6), and flags must
    // agree row-for-row.
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(29)
    val rows = for (k <- 1L to 3L; i <- 0 until 30) yield
      (k * 1000 + i, k, ts(k * 10000 + i * 60), rnd.nextDouble() * 10)
    val input = MemoryStream[(Long, Long, Timestamp, Double)]
    val scored = EventStreams.streamingRollingZScore(
      input.toDF.toDF("event_id", "user_id", "ts", "value"),
      "user_id", "ts", "event_id", "value", lookback = 7, threshold = 2.0)
    val q = scored.writeStream
      .format("memory").queryName("parity_zscore").outputMode("append").start()
    try {
      rows.grouped(30).foreach { b => input.addData(b: _*); q.processAllAvailable() }
      val streamed = spark.table("parity_zscore")
        .as[graft.streaming.ZScored].collect()
        .map(r => (r.key, r.ts) -> ((r.nPrev.toLong, r.z, r.isAnomaly))).toMap
      val batch = graft.operators.TimeSeries
        .rollingZScore(rows.toDF("event_id", "user_id", "ts", "value"),
          "user_id", "ts", "event_id", "value", lookback = 7, threshold = 2.0)
        .select("user_id", "ts", "n_prev", "z", "is_anomaly")
        .as[(Long, Timestamp, Long, Option[Double], Boolean)].collect()
      assert(batch.length === streamed.size)
      batch.foreach { case (k, t, n, z, flag) =>
        val (sn, sz, sflag) = streamed((k, t))
        assert(sn === n, s"($k,$t) n_prev")
        (sz, z) match {
          case (Some(a), Some(b)) => assert(math.abs(a - b) < 1e-6, s"($k,$t) z")
          case (a, b) => assert(a.isEmpty === b.isEmpty, s"($k,$t) z: $a vs $b")
        }
        assert(sflag === flag, s"($k,$t) flag")
      }
    } finally q.stop()
  }

  test("streamingHeavyHitters keeps hot tokens across batches in bounded state") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val hh = EventStreams.streamingHeavyHitters(
      input.toDF.toDF("token"), "token", capacity = 8, numShards = 2)
    val q = hh.writeStream
      .format("memory").queryName("hh_out").outputMode("update").start()
    try {
      input.addData(Seq.fill(30)("hot") ++ (1 to 10).map(i => s"rare$i"): _*)
      q.processAllAvailable()
      input.addData(Seq.fill(25)("hot") ++ (11 to 20).map(i => s"rare$i"): _*)
      q.processAllAvailable()
      // Latest estimate per (shard, token) — memory sink appends each
      // update, so take the max batch's rows via last occurrence.
      val rows = spark.table("hh_out")
        .groupBy("shard", "token")
        .agg(org.apache.spark.sql.functions.max("est").as("est"))
        .collect()
      val hot = rows.filter(_.getString(1) == "hot").map(_.getLong(2)).sum
      // True count 55; Misra-Gries undercount bounded by N/capacity.
      assert(hot >= 55 - (75 / 8) && hot <= 55)
      // State bound: no shard reports more than capacity tokens.
      val perShard = rows.groupBy(_.getInt(0)).map(_._2.length)
      assert(perShard.forall(_ <= 8))
    } finally q.stop()
  }

  test("parity: streamingDebounce matches batch Sessionize.debounce") {
    // Same bursty per-key series through the stateful streaming
    // debouncer (events split across two micro-batches, then two
    // far-future flusher batches so every open burst times out) and
    // the batch gaps-and-islands operator. Closed bursts must be
    // row-identical: (key, burst_seq, kept tie, first, last, count).
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(17)
    var nextId = 0L
    val events = for {
      k <- Seq("a", "b", "c", "d", "e")
      t <- Iterator.iterate(1L + rnd.nextInt(5))(
        _ + Seq(2L, 5L, 10L, 11L, 30L)(rnd.nextInt(5))).take(20).toSeq
    } yield { nextId += 1; (k, ts(t), nextId) }
    val flushKey = "zz"

    val input = MemoryStream[(String, Timestamp, Long)]
    val bursts = EventStreams.streamingDebounce(
      input.toDF.toDF("k", "ts", "event_id"),
      "k", "ts", "event_id", windowSeconds = 10,
      watermarkDelay = "0 seconds")
    val q = bursts.writeStream
      .format("memory").queryName("parity_debounce")
      .outputMode("append").start()
    try {
      // All real events in one batch: with a 0s watermark delay, a
      // second batch's earlier timestamps would be late-dropped.
      input.addData(events: _*); q.processAllAvailable()
      input.addData((flushKey, ts(100000), 9998L)); q.processAllAvailable()
      input.addData((flushKey, ts(200000), 9999L)); q.processAllAvailable()
      val streamed = spark.table("parity_debounce")
        .as[graft.streaming.Burst].collect()
        .filter(_.key != flushKey)
        .map(b => (b.key, b.burstSeq, b.keptTie, b.firstTs, b.lastTs,
          b.nEvents)).toSet
      val batch = graft.operators.Sessionize
        .debounce(events.toDF("k", "ts", "event_id"),
          Seq("k"), "ts", "event_id", windowSeconds = 10)
        .select("k", "burst_seq", "kept_event_id", "first_ts", "last_ts",
          "n_events")
        .as[(String, Long, Long, Timestamp, Timestamp, Long)]
        .collect().toSet
      assert(streamed === batch)
      assert(streamed.size >= 10) // bursts actually split per key
    } finally q.stop()
  }

  test("parity: streamingEwma matches batch TimeSeries.ewma across batches") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(31)
    val rows = for (k <- 1L to 2L; i <- 0 until 40) yield
      (k * 1000 + i, k, ts(k * 50000 + i * 30), rnd.nextDouble() * 5)
    val input = MemoryStream[(Long, Long, Timestamp, Double)]
    val smoothed = EventStreams.streamingEwma(
      input.toDF.toDF("event_id", "user_id", "ts", "value"),
      "user_id", "ts", "event_id", "value", alpha = 0.3)
    val q = smoothed.writeStream
      .format("memory").queryName("parity_ewma").outputMode("append").start()
    try {
      rows.grouped(25).foreach { b => input.addData(b: _*); q.processAllAvailable() }
      val streamed = spark.table("parity_ewma")
        .as[graft.streaming.EwmaPoint].collect()
        .map(p => (p.key, p.tie) -> ((p.ewma, p.residual))).toMap
      val batch = graft.operators.TimeSeries
        .ewma(rows.toDF("event_id", "user_id", "ts", "value"),
          "user_id", "ts", "event_id", "value", alpha = 0.3)
        .select("key", "tie", "ewma", "residual")
        .as[(Long, Long, Double, Option[Double])].collect()
      assert(batch.length === streamed.size)
      batch.foreach { case (k, tie, e, r) =>
        val (se, sr) = streamed((k, tie))
        assert(math.abs(se - e) < 1e-12, s"($k,$tie) ewma")
        assert(sr.isDefined === r.isDefined, s"($k,$tie) residual presence")
        for (a <- sr; b <- r) assert(math.abs(a - b) < 1e-12)
      }
      // First point per key seeds: ewma = value, residual absent.
      val firsts = batch.filter(_._2 % 1000 == 0)
      assert(firsts.nonEmpty && firsts.forall(_._4.isEmpty))
    } finally q.stop()
  }

  test("parity: streamingCusum matches batch TimeSeries.cusum; drift alarms") {
    // Series per key: 40 on-target points then 30 points shifted by
    // +0.8 — each shifted point is individually unremarkable, but the
    // cumulative sum must alarm; alarms reset and re-accumulate.
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(43)
    val rows = for (k <- 1L to 3L; i <- 0 until 70) yield {
      val base = 10.0 + (rnd.nextDouble() - 0.5) // noise ±0.5
      val x = if (i < 40) base else base + 0.8
      (k * 1000 + i, k, ts(k * 100000 + i * 60), x)
    }
    val input = MemoryStream[(Long, Long, Timestamp, Double)]
    val scored = EventStreams.streamingCusum(
      input.toDF.toDF("event_id", "user_id", "ts", "value"),
      "user_id", "ts", "event_id", "value",
      target = 10.0, slack = 0.3, h = 4.0)
    val q = scored.writeStream
      .format("memory").queryName("parity_cusum")
      .outputMode("append").start()
    try {
      rows.grouped(50).foreach { b => input.addData(b: _*); q.processAllAvailable() }
      val streamed = spark.table("parity_cusum")
        .as[graft.streaming.CusumPoint].collect()
        .map(p => (p.key, p.tie) -> ((p.sPos, p.sNeg, p.alarm))).toMap
      val batch = graft.operators.TimeSeries
        .cusum(rows.toDF("event_id", "user_id", "ts", "value"),
          "user_id", "ts", "event_id", "value",
          target = 10.0, slack = 0.3, h = 4.0)
        .select("key", "tie", "s_pos", "s_neg", "alarm")
        .as[(Long, Long, Double, Double, Boolean)].collect()
      assert(batch.length === streamed.size)
      batch.foreach { case (k, tie, sp, sn, alarm) =>
        val (ssp, ssn, salarm) = streamed((k, tie))
        assert(math.abs(ssp - sp) < 1e-9, s"($k,$tie) sPos")
        assert(math.abs(ssn - sn) < 1e-9, s"($k,$tie) sNeg")
        assert(salarm === alarm, s"($k,$tie) alarm")
      }
      // The +0.8 shift must alarm in the shifted region, and the
      // on-target region must stay quiet for every key.
      val alarms = batch.filter(_._5)
        .map(r => (r._1, r._2 % 1000)).toSet // tie = k*1000 + i
      for (k <- 1L to 3L) {
        assert(alarms.exists { case (kk, i) => kk == k && i >= 40 },
          s"key $k: drift never alarmed")
        assert(!alarms.exists { case (kk, i) => kk == k && i < 40 },
          s"key $k: false alarm before the shift")
      }
    } finally q.stop()
  }

  test("parity: streamingPatternMatch matches batch TimeSeries.patternMatches") {
    // Random series + one EXACT (scaled/offset) pattern copy per key,
    // planted so its window STRADDLES a micro-batch boundary (the
    // ring state must carry it across). Hit sets and distances must
    // agree row-for-row with the batch operator.
    implicit val sqlCtx = spark.sqlContext
    val pattern = Seq(0.0, 2.0, 5.0, 2.0)
    val rnd = new scala.util.Random(31)
    val rows = (for (k <- 1L to 3L; i <- 0 until 30) yield {
      // batches are 30-row slices of the k-interleaved sequence; the
      // copy at i = 18..21 crosses the slice edge for some keys
      val base = rnd.nextDouble() * 10
      val v =
        if (i >= 18 && i <= 21) pattern(i - 18) * (k + 1.0) + 50 * k
        else base
      (k * 1000 + i, k, ts(k * 10000 + i * 60), v)
    }).toSeq
    val input = MemoryStream[(Long, Long, Timestamp, Double)]
    val hits = EventStreams.streamingPatternMatch(
      input.toDF.toDF("event_id", "user_id", "ts", "value"),
      "user_id", "ts", "event_id", "value", pattern, maxDist = 1.5)
    val q = hits.writeStream
      .format("memory").queryName("parity_pattern").outputMode("append").start()
    try {
      rows.grouped(30).foreach { b => input.addData(b: _*); q.processAllAvailable() }
      val streamed = spark.table("parity_pattern")
        .as[graft.streaming.PatternHit].collect()
        .map(h => (h.key, h.tie) -> h.dist).toMap
      val batch = graft.operators.TimeSeries
        .patternMatches(rows.toDF("event_id", "user_id", "ts", "value"),
          "user_id", "ts", "event_id", "value", pattern, maxDist = 1.5)
        .select("user_id", "event_id", "dist")
        .as[(Long, Long, Double)].collect()
      assert(batch.length === streamed.size, "hit SETS must agree")
      batch.foreach { case (k, tie, d) =>
        val sd = streamed.get((k, tie))
        assert(sd.isDefined, s"($k,$tie) missing from stream")
        assert(math.abs(sd.get - d) < 1e-6, s"($k,$tie) dist $sd vs $d")
      }
      // every key's planted copy (window start i=18 ⇒ tie=k*1000+18)
      // must be among the hits at distance 0
      for (k <- 1L to 3L)
        assert(streamed.get((k, k * 1000 + 18)).exists(_ == 0.0),
          s"key $k: planted copy not matched at dist 0")
    } finally q.stop()
  }

  test("parity: streaming windowedCounts matches the batch twin (q165 surface)") {
    // The q165 oracle pins the batch fold; this chains the streaming
    // append-mode output to the SAME function body on the same rows:
    // every window the watermark finalizes must be row-identical to
    // the batch row, and after the flusher advances the watermark far
    // ahead, ALL real windows must have been finalized.
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(43)
    val events = (1 to 400).map { i =>
      (ts(rnd.nextInt(7200).toLong), s"k${rnd.nextInt(4)}")
    }
    val flushKey = "zz"
    val input = MemoryStream[(Timestamp, String)]
    val counts = EventStreams.windowedCounts(
      input.toDF.toDF("ts", "event_type"),
      "ts", "event_type", "10 minutes", "5 minutes", "1 minute")
    val q = counts.writeStream
      .format("memory").queryName("parity_wincounts")
      .outputMode("append").start()
    try {
      input.addData(events: _*); q.processAllAvailable()
      input.addData((ts(100000L), flushKey)); q.processAllAvailable()
      val streamed = spark.table("parity_wincounts")
        .as[(Timestamp, Timestamp, String, Long)].collect()
        .filter(_._3 != flushKey).toSet
      val batch = EventStreams.windowedCounts(
          events.toDF("ts", "event_type"),
          "ts", "event_type", "10 minutes", "5 minutes", "1 minute")
        .as[(Timestamp, Timestamp, String, Long)].collect().toSet
      assert(streamed === batch,
        "finalized streaming windows must equal the batch twin rows")
    } finally q.stop()
  }

  test("parity: streamingHeavyHitters matches the batch twin in the exact regime (q166 surface)") {
    // Above-vocabulary capacity: Misra-Gries never evicts, so the
    // multi-batch streaming fold's latest (shard, token) estimates
    // must equal the single-batch-mode fold on the concatenation —
    // and both must be exact counts.
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(47)
    val batches = Seq.fill(3)((1 to 200).map(_ => s"tok${rnd.nextInt(30)}"))
    val input = MemoryStream[String]
    val hh = EventStreams.streamingHeavyHitters(
      input.toDF.toDF("token"), "token", capacity = 64, numShards = 3)
    val q = hh.writeStream
      .format("memory").queryName("parity_hh").outputMode("update").start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      val streamed = spark.table("parity_hh")
        .groupBy("shard", "token")
        .agg(org.apache.spark.sql.functions.max("est").as("est"))
        .as[(Int, String, Long)].collect()
        .map { case (_, tok, est) => tok -> est }.toMap
      val batch = EventStreams.streamingHeavyHitters(
          batches.flatten.toDF("token"), "token",
          capacity = 64, numShards = 3)
        .groupBy("token")
        .agg(org.apache.spark.sql.functions.sum("est").as("est"))
        .as[(String, Long)].collect().toMap
      val exact = batches.flatten.groupBy(identity).view
        .mapValues(_.size.toLong).toMap
      assert(streamed === exact, "streaming fold must be exact counts")
      assert(batch === exact, "batch fold must be exact counts")
    } finally q.stop()
  }

  test("parity: streaming intervalJoin matches the batch twin (q168 surface)") {
    // Both sides stream in one batch each (in-order, within
    // watermark reach), then flushers advance both watermarks far
    // enough to emit every joined pair; the appended rows must equal
    // the SAME function body on the batch frames.
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(53)
    val lefts = (1 to 60).map(i =>
      (rnd.nextInt(5).toLong, ts(60 + rnd.nextInt(600).toLong), 1000L + i))
    val rights = (1 to 120).map(i =>
      (rnd.nextInt(5).toLong, ts(rnd.nextInt(700).toLong), 2000L + i))
    val lIn = MemoryStream[(Long, Timestamp, Long)]
    val rIn = MemoryStream[(Long, Timestamp, Long)]
    val joined = EventStreams.intervalJoin(
      lIn.toDF.toDF("user_id", "ts", "event_id"),
      rIn.toDF.toDF("user_id", "ts", "event_id"),
      "user_id", "ts", "ts",
      maxDelaySeconds = 120, watermarkDelay = "0 seconds")
    val q = joined.writeStream
      .format("memory").queryName("parity_ijoin").outputMode("append").start()
    try {
      lIn.addData(lefts: _*); rIn.addData(rights: _*); q.processAllAvailable()
      lIn.addData((99L, ts(100000L), 8888L))
      rIn.addData((99L, ts(100000L), 9999L))
      q.processAllAvailable()
      lIn.addData((99L, ts(200000L), 8889L))
      rIn.addData((99L, ts(200000L), 9998L))
      q.processAllAvailable()
      val streamed = spark.table("parity_ijoin")
        .as[(Long, Timestamp, Long, Timestamp, Long)].collect()
        .filter(r => r._1 != 99L).toSet
      val batch = EventStreams.intervalJoin(
          lefts.toDF("user_id", "ts", "event_id"),
          rights.toDF("user_id", "ts", "event_id"),
          "user_id", "ts", "ts",
          maxDelaySeconds = 120, watermarkDelay = "0 seconds")
        .as[(Long, Timestamp, Long, Timestamp, Long)].collect().toSet
      assert(streamed === batch,
        "streamed joined pairs must equal the batch twin rows")
      assert(batch.nonEmpty, "fixture must actually produce pairs")
    } finally q.stop()
  }

  test("parity: streamingAttribution matches batch touchAttribution across batch splits") {
    implicit val sqlCtx = spark.sqlContext
    // Touches and conversions interleaved per user; the batch split
    // lands BETWEEN a touch and its conversion, so attribution must
    // come from carried state, not the arriving micro-batch.
    val rows = for (k <- 1L to 3L; i <- 0 until 30) yield {
      val typ = i % 5 match {
        case 0 | 2 => "view"
        case 1     => "click"
        case 3     => "purchase"
        case 4     => "error" // filtered out by the operator
      }
      (k * 1000 + i, k, ts(k * 100000 + i * 1800), typ, i * 1.5)
    }
    // Same-MICROSECOND collision, touch id LARGER than the conversion
    // id: the batch RANGE frame (value-based on µs) includes the
    // touch; a strictly (us, id)-ordered streaming fold would miss it
    // — the regression the per-µs-group fold exists for.
    val collided = Seq(
      (9001L, 9L, ts(500000L), "view", 1.0),     // earlier touch
      (9005L, 9L, ts(500100L), "purchase", 2.0), // conv at T
      (9009L, 9L, ts(500100L), "click", 3.0))    // touch at T, id > conv
    val rows2 = rows ++ collided
    val input = MemoryStream[(Long, Long, Timestamp, String, Double)]
    val att = EventStreams.streamingAttribution(
      input.toDF.toDF("event_id", "user_id", "ts", "event_type", "value"),
      "user_id", "ts", "event_id", "event_type", "value",
      conversionType = "purchase", touchTypes = Seq("view", "click"),
      lookbackSeconds = 3600)
    val q = att.writeStream
      .format("memory").queryName("parity_att").outputMode("append").start()
    try {
      rows2.grouped(17).foreach { b => input.addData(b: _*); q.processAllAvailable() }
      val streamed = spark.table("parity_att")
        .as[graft.streaming.Attributed].collect()
        .map(a => a.convId -> ((a.firstTouchId, a.lastTouchId))).toMap
      val batch = graft.operators.Funnel.touchAttribution(
          rows2.toDF("event_id", "user_id", "ts", "event_type", "value"),
          "user_id", "ts", "event_type", "value", "event_id",
          conversionType = "purchase", touchTypes = Seq("view", "click"),
          lookbackSeconds = 3600)
        .select("conv_id", "first_touch_id", "last_touch_id")
        .as[(Long, Option[Long], Option[Long])].collect()
      assert(batch.length === streamed.size)
      batch.foreach { case (cid, f, l) =>
        assert(streamed(cid) === ((f, l)), s"conv $cid")
      }
      assert(batch.exists(_._2.isDefined), "fixture must attribute something")
      // the same-µs touch with the larger id must be the last touch
      assert(streamed(9005L) === ((Some(9001L), Some(9009L))))
    } finally q.stop()
  }

  test("sessionize splits on sub-millisecond gap overruns (µs arithmetic)") {
    // gap 10s, events 10.000500s apart: ms-truncated arithmetic
    // (10000 <= 10000) would merge; exact µs (10_000_500 > 10_000_000)
    // must split — the batch operator's unix_micros semantics.
    implicit val sqlCtx = spark.sqlContext
    def tsUs(us: Long): Timestamp = {
      val t = new Timestamp(us / 1000000 * 1000)
      t.setNanos((us % 1000000).toInt * 1000)
      t
    }
    val input = MemoryStream[(Long, Timestamp)]
    val sessions = EventStreams.sessionize(
      input.toDF.toDF("user_id", "ts"),
      "user_id", "ts", gapSeconds = 10, watermarkDelay = "0 seconds")
    val q = sessions.writeStream
      .format("memory").queryName("subms_sessions").outputMode("append").start()
    try {
      input.addData((1L, tsUs(1000000L)), (1L, tsUs(11000500L)))
      q.processAllAvailable()
      input.addData((2L, tsUs(900000000L))); q.processAllAvailable()
      input.addData((2L, tsUs(999000000L))); q.processAllAvailable()
      val u1 = spark.table("subms_sessions")
        .as[graft.streaming.Session].collect().filter(_.key == 1L)
      assert(u1.length === 2, s"sub-ms overrun must split: ${u1.toSeq}")
      // exact-µs bounds survive the round trip
      assert(u1.map(_.start).toSet === Set(tsUs(1000000L), tsUs(11000500L)))
    } finally q.stop()
  }

  test("streamingHeavyHitters: nulls dropped; evicted tokens retract with est=0") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    // capacity 2, one shard: the third distinct token triggers the
    // decrement step and can evict a counter.
    val hh = EventStreams.streamingHeavyHitters(
      input.toDF.toDF("token"), "token", capacity = 2, numShards = 1)
    val q = hh.writeStream
      .format("memory").queryName("hh_retract").outputMode("update").start()
    try {
      input.addData("a", "b"); q.processAllAvailable()
      // c decrements both a and b to 0 -> both evict; c never lands
      input.addData("c"); q.processAllAvailable()
      val rows = spark.table("hh_retract")
        .as[(Int, String, Long)].collect().toSeq
      assert(rows.filter(_._3 > 0).map(_._2).toSet === Set("a", "b"))
      assert(rows.filter(_._3 == 0).map(_._2).toSet === Set("a", "b"),
        s"evictions must emit est=0 retractions: $rows")
    } finally q.stop()
  }

  test("pattern operators refuse a constant pattern instead of NaN-crashing") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Long, Double)]
    intercept[IllegalArgumentException] {
      EventStreams.streamingPatternMatch(
        input.toDF.toDF("key", "ts", "tie", "x"),
        "key", "ts", "tie", "x", pattern = Seq(1.0, 1.0, 1.0), maxDist = 1.0)
    }
    intercept[IllegalArgumentException] {
      graft.operators.TimeSeries.patternMatches(
        Seq((1L, ts(1), 1L, 2.0)).toDF("key", "ts", "tie", "x"),
        "key", "ts", "tie", "x", pattern = Seq(5.0, 5.0), maxDist = 1.0)
    }
  }

  test("parity: streamingFingerprint digest equals the batch twin (q189 surface)") {
    // Three micro-batches; the complete-mode digest after the last
    // batch must equal the batch-mode fingerprint of the whole
    // concatenation — the digests are commutative folds, so batch
    // boundaries cannot show through.
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(53)
    val batches = Seq.fill(3)((1 to 100).map(_ =>
      (s"g${rnd.nextInt(3)}", rnd.nextInt(1000).toLong, s"v${rnd.nextInt(50)}")))
    val input = MemoryStream[(String, Long, String)]
    val fp = EventStreams.streamingFingerprint(
      input.toDF.toDF("grp", "id", "v"), Seq("id", "v"), "grp")
    val q = fp.writeStream
      .format("memory").queryName("parity_fp").outputMode("complete").start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      val streamed = spark.table("parity_fp")
        .as[(String, Long, Long, String, Long, Long)].collect().toSet
      val batch = graft.operators.Quality.tableFingerprint(
          batches.flatten.toDF("grp", "id", "v"), Seq("id", "v"), "grp")
        .as[(String, Long, Long, String, Long, Long)].collect().toSet
      assert(streamed === batch,
        "complete-mode streaming digest must equal the batch fingerprint")
    } finally q.stop()
  }

  test("sessionize under late arrivals: connected stragglers join, " +
      "disconnected runs close alone, sub-watermark rows drop") {
    // Pins the documented OUT-OF-ORDER contract (the scaladoc's three
    // regimes) — the 100 TB claim must not rest on an untested
    // in-order assumption.
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val sessions = EventStreams.sessionize(
      input.toDF.toDF("user_id", "ts"),
      "user_id", "ts", gapSeconds = 10, watermarkDelay = "60 seconds")
    val q = sessions.writeStream
      .format("memory").queryName("late_sessions").outputMode("append").start()
    try {
      // Batch 1 (in order): open session [100, 104]; watermark -> 44.
      input.addData((1L, ts(100)), (1L, ts(104)))
      q.processAllAvailable()
      // Batch 2 — all stragglers, all newer than the watermark:
      //   96 (within gap of start): CONNECTED, start extends down
      //  102 (interior):            CONNECTED
      //  70, 75 (> gap below start): a DISCONNECTED run — chains by
      //      the same gap rule, closes immediately as its own session
      input.addData((1L, ts(96)), (1L, ts(102)), (1L, ts(70)), (1L, ts(75)))
      q.processAllAvailable()
      val afterLate = spark.table("late_sessions")
        .as[graft.streaming.Session].collect()
      assert(afterLate.toSet ===
        Set(graft.streaming.Session(1L, ts(70), ts(75), 2)),
        s"disconnected straggler run must close alone: ${afterLate.toSeq}")
      // Batch 3: 30s is OLDER than the watermark (44s) -> dropped by
      // the engine; nothing new is emitted, state is untouched.
      input.addData((1L, ts(30)))
      q.processAllAvailable()
      assert(spark.table("late_sessions").count() === 1,
        "sub-watermark straggler must be dropped")
      // Time out the open session: it must carry the straggler-
      // extended bounds [96, 104] and all 4 connected events.
      input.addData((2L, ts(500))); q.processAllAvailable()
      input.addData((2L, ts(600))); q.processAllAvailable()
      val all = spark.table("late_sessions")
        .as[graft.streaming.Session].collect()
      val main = all.find(s => s.key == 1L && s.nEvents == 4)
      assert(main.isDefined,
        s"open session must absorb connected stragglers: ${all.toSeq}")
      assert(main.get.start === ts(96) && main.get.end === ts(104))
    } finally q.stop()
  }

  test("streamingPatternMatch folds cross-batch stragglers at arrival " +
      "position (documented ring semantics)") {
    // Pattern [0,1] (m=2): every strictly ASCENDING consecutive pair
    // z-normalizes to the pattern exactly (dist 0 -> hit keyed by the
    // pair's first row); descending pairs are far. The documented
    // out-of-order contract: a cross-batch straggler folds at its
    // ARRIVAL position — the m−1 ring cannot reorder history — so the
    // streaming hit set is the as-arrived one, while the batch twin
    // (full sort) finds the event-time hits. Both sides are asserted
    // so the divergence itself is pinned, not papered over.
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Timestamp, Double)]
    val hits = EventStreams.streamingPatternMatch(
      input.toDF.toDF("event_id", "user_id", "ts", "value"),
      "user_id", "ts", "event_id", "value",
      pattern = Seq(0.0, 1.0), maxDist = 0.001)
    val q = hits.writeStream
      .format("memory").queryName("late_pattern").outputMode("append").start()
    try {
      // Event-time series: t1=10, t2=20, t3=5, t4=6 (ids 1..4).
      // Batch A arrives WITHOUT t3; batch B delivers it late.
      input.addData((1L, 1L, ts(1), 10.0), (2L, 1L, ts(2), 20.0),
        (4L, 1L, ts(4), 6.0))
      q.processAllAvailable()
      input.addData((3L, 1L, ts(3), 5.0))
      q.processAllAvailable()
      val streamed = spark.table("late_pattern")
        .as[graft.streaming.PatternHit].collect().map(_.tie).toSet
      // As-arrived pairs: (10,20) hit@1, (20,6) no, (6,5) no —
      // the late row forms a DESCENDING arrival pair, so the
      // event-time hit at t3 is (documentedly) not recovered.
      assert(streamed === Set(1L),
        s"arrival-position fold must see exactly the hit@1: $streamed")
      val batchTies = graft.operators.TimeSeries
        .patternMatches(
          Seq((1L, 1L, ts(1), 10.0), (2L, 1L, ts(2), 20.0),
            (3L, 1L, ts(3), 5.0), (4L, 1L, ts(4), 6.0))
            .toDF("event_id", "user_id", "ts", "value"),
          "user_id", "ts", "event_id", "value",
          pattern = Seq(0.0, 1.0), maxDist = 0.001)
        .select("event_id").as[Long].collect().toSet
      assert(batchTies === Set(1L, 3L),
        s"batch twin over sorted event time finds both: $batchTies")
    } finally q.stop()
  }

  test("streamingDebounce under late arrivals: connected stragglers extend " +
      "the burst and can take over the representative; disconnected close alone") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Timestamp, Long)]
    val bursts = EventStreams.streamingDebounce(
      input.toDF.toDF("key", "ts", "event_id"),
      "key", "ts", "event_id",
      windowSeconds = 10, watermarkDelay = "60 seconds")
    val q = bursts.writeStream
      .format("memory").queryName("late_bursts").outputMode("append").start()
    try {
      // Batch 1: open burst [100, 104], representative event 11.
      input.addData(("a", ts(100), 11L), ("a", ts(104), 12L))
      q.processAllAvailable()
      // Batch 2 stragglers: 96 is CONNECTED and earlier than the kept
      // representative -> takes over keptTie (what a batch re-run
      // elects); 70/75 are a DISCONNECTED run -> immediate burst with
      // the next emission seq.
      input.addData(("a", ts(96), 10L), ("a", ts(70), 8L), ("a", ts(75), 9L))
      q.processAllAvailable()
      val afterLate = spark.table("late_bursts")
        .as[graft.streaming.Burst].collect()
      assert(afterLate.toSeq ===
        Seq(graft.streaming.Burst("a", 1L, 8L, ts(70), ts(75), 2L)),
        s"disconnected straggler run must close alone: ${afterLate.toSeq}")
      // Time out the open burst: span [96, 104], representative 10
      // (the connected straggler), close-time seq = 2.
      input.addData(("b", ts(500), 99L)); q.processAllAvailable()
      input.addData(("b", ts(600), 98L)); q.processAllAvailable()
      val main = spark.table("late_bursts")
        .as[graft.streaming.Burst].collect()
        .find(b => b.key == "a" && b.nEvents == 3)
      assert(main.isDefined, "open burst must absorb the connected straggler")
      assert(main.get.keptTie === 10L,
        s"earlier (ts, tie) straggler must take over the representative: $main")
      assert(main.get.firstTs === ts(96) && main.get.lastTs === ts(104))
      assert(main.get.burstSeq === 2L, "burst_seq assigns in emission order")
    } finally q.stop()
  }

  test("streamingRollingZScore scores cross-batch stragglers at arrival " +
      "position (documented ring semantics)") {
    // lookback=2: each point scores against the two ARRIVED-before
    // values. The straggler (event-time 3rd, arriving last) scores
    // against {20, 30} — the as-arrived frame — and emitted rows are
    // never revised.
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Long, Double)]
    val scored = EventStreams.streamingRollingZScore(
      input.toDF.toDF("key", "ts", "event_id", "value"),
      "key", "ts", "event_id", "value", lookback = 2, threshold = 3.0)
    val q = scored.writeStream
      .format("memory").queryName("late_z").outputMode("append").start()
    try {
      input.addData((1L, ts(1), 1L, 10.0), (1L, ts(2), 2L, 20.0),
        (1L, ts(4), 4L, 30.0))
      q.processAllAvailable()
      input.addData((1L, ts(3), 3L, 25.0)) // event-time straggler
      q.processAllAvailable()
      val rows = spark.table("late_z")
        .as[graft.streaming.ZScored].collect()
        .map(r => r.ts -> (r.nPrev, r.z)).toMap
      // in-batch: 10 warms, 20 warms, 30 scores vs {10, 20}
      assert(rows(ts(1))._1 === 0 && rows(ts(1))._2.isEmpty)
      assert(rows(ts(2))._1 === 1 && rows(ts(2))._2.isEmpty)
      assert(rows(ts(4))._2.isDefined)
      // straggler scores vs the ARRIVED frame {20, 30}: mean 25,
      // std 5, z = (25-25)/5 = 0 — NOT vs its event-time frame
      // {10, 20} (which would give z = (25-15)/5 = 2)
      assert(rows(ts(3)) === ((2, Some(0.0))),
        s"straggler must score against the as-arrived frame: ${rows(ts(3))}")
    } finally q.stop()
  }

  test("streamingAttribution: a straggler conversion never attributes to " +
      "touches newer than itself") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val attributed = EventStreams.streamingAttribution(
      input.toDF.toDF("user_id", "ts", "event_id", "event_type", "value"),
      "user_id", "ts", "event_id", "event_type", "value",
      conversionType = "purchase", touchTypes = Seq("view"),
      lookbackSeconds = 100)
    val q = attributed.writeStream
      .format("memory").queryName("late_attr").outputMode("append").start()
    try {
      // Batch 1: touches at 10 and 50 (buffered, no conversion yet).
      input.addData(
        (1L, ts(10), 1L, "view", 0.0), (1L, ts(50), 2L, "view", 0.0))
      q.processAllAvailable()
      // Batch 2: straggler conversion at 30 — its closed window
      // [−70, 30] holds ONLY the touch at 10; the buffered touch at
      // 50 is in the straggler's FUTURE and must not attribute.
      input.addData((1L, ts(30), 3L, "purchase", 9.0))
      q.processAllAvailable()
      val r = spark.table("late_attr")
        .as[graft.streaming.Attributed].collect().toSeq
      assert(r.length === 1)
      assert(r.head.firstTouchId === Some(1L) &&
        r.head.lastTouchId === Some(1L),
        s"future touch must be outside the straggler's frame: $r")
    } finally q.stop()
  }

  test("streamingGoldenRecord: stamped per-field state — a straggler never " +
      "overwrites a newer value, a late null never erases") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Long, String, String)]
    val golden = EventStreams.streamingGoldenRecord(
      input.toDF.toDF("user_id", "ts", "event_id", "name", "city"),
      "user_id", "ts", "event_id", Seq("name", "city"))
    val q = golden.toDF.writeStream
      .format("memory").queryName("golden_rec").outputMode("update").start()
    def latest(): Map[(Long, String), (Option[String], Long)] = {
      // update semantics: keep the highest-n_versions row per (key, field)
      spark.table("golden_rec")
        .as[(Long, String, Option[String], Long)].collect()
        .groupBy(r => (r._1, r._2))
        .map { case (k, rs) => k -> { val m = rs.maxBy(_._4); (m._3, m._4) } }
    }
    try {
      input.addData((1L, ts(10), 1L, "ann", "oslo"))
      q.processAllAvailable()
      input.addData((1L, ts(20), 2L, "anne", null)) // null city: keep oslo
      q.processAllAvailable()
      assert(latest()((1L, "name")) === ((Some("anne"), 2L)))
      assert(latest()((1L, "city")) === ((Some("oslo"), 2L)))
      // straggler BEFORE ts 20 arrives late: must not beat "anne"
      input.addData((1L, ts(15), 3L, "annika", "bergen"))
      q.processAllAvailable()
      assert(latest()((1L, "name")) === ((Some("anne"), 3L)))
      // but city had no value newer than ts 15 -> straggler wins it
      assert(latest()((1L, "city")) === ((Some("bergen"), 3L)))
    } finally q.stop()
  }

  test("staticEnrich joins micro-batches against the broadcast dim; " +
      "unmatched facts survive with NULLs; dup dim keys refused") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("k", "tier")
    val input = MemoryStream[(Long, Long)]
    val enriched = EventStreams.staticEnrich(
      input.toDF.toDF("id", "k"), dim, "k", Seq("tier"))
    val q = enriched.writeStream
      .format("memory").queryName("static_enrich").outputMode("append")
      .start()
    try {
      input.addData((10L, 1L), (11L, 9L)) // 9 has no dim row
      q.processAllAvailable()
      input.addData((12L, 2L)) // second micro-batch re-plans the dim
      q.processAllAvailable()
      val rows = spark.table("static_enrich")
        .select("id", "k", "dim_tier")
        .as[(Long, Long, Option[String])].collect().sortBy(_._1).toSeq
      assert(rows === Seq(
        (10L, 1L, Some("gold")),
        (11L, 9L, None),
        (12L, 2L, Some("silver"))))
    } finally q.stop()
    val dupDim = Seq((1L, "a"), (1L, "b")).toDF("k", "tier")
    val ex = intercept[IllegalArgumentException] {
      EventStreams.staticEnrich(
        Seq((1L, 1L)).toDF("id", "k"), dupDim, "k", Seq("tier"))
    }
    assert(ex.getMessage.contains("duplicate"))
  }

  test("streamingPercentiles: cross-batch accumulation, order-independence, grid exactness") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(23)
    val values = (1 to 300).map(_ => ("lat", rnd.nextDouble() * 10.0))
    val input = MemoryStream[(String, Double)]
    val pct = EventStreams.streamingPercentiles(
      input.toDF.toDF("k", "v"), "k", "v")
    val q = pct.writeStream.format("memory")
      .queryName("pct_stream").outputMode("update").start()
    try {
      // Three uneven micro-batches in SHUFFLED order: histogram state
      // is commutative, so the final emission must equal the batch
      // fold over everything.
      rnd.shuffle(values).grouped(111).foreach { b =>
        input.addData(b: _*)
        q.processAllAvailable()
      }
      val streamed = spark.table("pct_stream")
        .as[(String, Int, Long, Double)].collect()
        .groupBy(_._2).map { case (qm, rows) => // latest = max n
          qm -> rows.maxBy(_._3) }
      val batch = EventStreams.streamingPercentiles(
          values.toDF("k", "v"), "k", "v")
        .as[(String, Int, Long, Double)].collect()
        .map(r => r._2 -> r).toMap
      assert(streamed.keySet === Set(500, 950, 990))
      streamed.foreach { case (qm, row) =>
        assert(row === batch(qm), s"q$qm stream/batch divergence") }
      // Grid exactness: the p50 of 300 known values is the 150th
      // order statistic's floor-grid bucket.
      val sortedB = values.map(v => math.floor(v._2 * 100).toLong).sorted
      assert(batch(500)._4 === sortedB(149).toDouble / 100)
      assert(batch(990)._4 === sortedB((300 * 990 + 999) / 1000 - 1)
        .toDouble / 100)
    } finally q.stop()
  }
}
