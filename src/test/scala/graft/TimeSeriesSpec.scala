package graft

import java.sql.Date

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TimeSeries

/** Goldens for calendar gap-fill + forward-fill. */
class TimeSeriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  test("gapFillDaily: per-key span densify, observed flags, forward fill") {
    val series = Seq(
      ("a", d("2024-01-01"), 1.0),
      ("a", d("2024-01-04"), 4.0), // 2-day hole
      ("b", d("2024-02-10"), 9.0) // singleton span
    ).toDF("k", "day", "v")
    val out = TimeSeries.gapFillDaily(series, "k", "day", "v")
      .orderBy("k", "day")
      .select("k", "day", "observed", "filled")
      .as[(String, Date, Boolean, Double)].collect().toSeq
    assert(out === Seq(
      ("a", d("2024-01-01"), true, 1.0),
      ("a", d("2024-01-02"), false, 1.0),
      ("a", d("2024-01-03"), false, 1.0),
      ("a", d("2024-01-04"), true, 4.0),
      ("b", d("2024-02-10"), true, 9.0)))
  }

  test("gapFillDaily: calendars never cross keys") {
    val series = Seq(
      ("a", d("2024-01-01"), 1.0),
      ("b", d("2024-03-01"), 2.0)
    ).toDF("k", "day", "v")
    val n = TimeSeries.gapFillDaily(series, "k", "day", "v").count()
    assert(n === 2) // not densified onto each other's span
  }

  test("cusum/ewma: non-integral key fails fast instead of collapsing groups") {
    // A string key silently long-casts to NULL, merging every series
    // into ONE group (ADVICE r5) — the operators must refuse it.
    val bad = Seq(("u1", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
      1L, 1.0)).toDF("k", "ts", "tie", "x")
    val e1 = intercept[IllegalArgumentException] {
      TimeSeries.cusum(bad, "k", "ts", "tie", "x",
        target = 0.0, slack = 0.5, h = 4.0)
    }
    assert(e1.getMessage.contains("integral"))
    val e2 = intercept[IllegalArgumentException] {
      TimeSeries.ewma(bad, "k", "ts", "tie", "x", alpha = 0.3)
    }
    assert(e2.getMessage.contains("integral"))
    // Integral key types still pass the guard (int, not just long).
    val ok = Seq((1, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
      1L, 1.0)).toDF("k", "ts", "tie", "x")
    assert(TimeSeries.ewma(ok, "k", "ts", "tie", "x", alpha = 0.3)
      .count() === 1L)
  }

  test("rollingZScore: random-series parity with driver-side sliding stats") {
    val rnd = new scala.util.Random(23)
    val rows = for (k <- 1L to 4L; i <- 0 until 50) yield
      (k * 1000 + i, k, new java.sql.Timestamp((k * 100000 + i) * 60000L),
        rnd.nextDouble() * 10)
    val lookback = 7
    val out = TimeSeries
      .rollingZScore(rows.toDF("event_id", "user_id", "ts", "value"),
        "user_id", "ts", "event_id", "value", lookback, threshold = 2.0)
      .select("event_id", "z")
      .as[(Long, Option[Double])].collect().toMap
    for ((_, series) <- rows.groupBy(_._2); idx <- series.indices) {
      val (eid, _, _, x) = series(idx)
      val frame = series.slice(math.max(0, idx - lookback), idx).map(_._4)
      val expect =
        if (frame.length < lookback) None
        else {
          val m = frame.sum / frame.length
          val v = (frame.map(d => d * d).sum - frame.sum * frame.sum / frame.length) / frame.length
          val std = math.sqrt(math.max(v, 0.0))
          if (std > 0) Some((x - m) / std) else None
        }
      (out(eid), expect) match {
        case (Some(a), Some(b)) => assert(math.abs(a - b) < 1e-5, s"event $eid")
        case (a, b) => assert(a.isEmpty === b.isEmpty, s"event $eid: $a vs $b")
      }
    }
  }

  test("rollingZScore: spike flags against preceding frame; warmup and flat frames never do") {
    // key 1 values 1,2,1,2,100 (lookback 3, threshold 2):
    //  rows 1-3: n_prev < 3 -> NULL z;
    //  row 4 (value 2): frame [1,2,1] m=4/3 std=sqrt(2/9) -> z≈1.41, no flag;
    //  row 5 (100): frame [2,1,2] -> z≈208, flagged.
    // key 2: constant series -> zero variance, NULL z, never flagged.
    val rows = Seq(
      (1L, 1L, 1.0), (2L, 1L, 2.0), (3L, 1L, 1.0), (4L, 1L, 2.0),
      (5L, 1L, 100.0),
      (6L, 2L, 7.0), (7L, 2L, 7.0), (8L, 2L, 7.0), (9L, 2L, 7.0)
    ).map { case (i, k, v) =>
      (i, k, new java.sql.Timestamp(i * 60000L), v)
    }.toDF("event_id", "user_id", "ts", "value")
    val out = TimeSeries
      .rollingZScore(rows, "user_id", "ts", "event_id", "value",
        lookback = 3, threshold = 2.0)
      .select("event_id", "z", "is_anomaly")
      .as[(Long, Option[Double], Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert((1L to 3L).forall(i => out(i) === ((None, false))))
    val m4 = 4.0 / 3; val std4 = math.sqrt(2.0 / 9)
    assert(out(4L)._1.isDefined)
    assert(math.abs(out(4L)._1.get - (2.0 - m4) / std4) < 1e-5)
    assert(out(4L)._2 === false)
    assert(out(5L)._2 === true)
    assert(out(5L)._1.get > 100)
    (6L to 9L).foreach(i => assert(out(i) === ((None, false))))
  }

  test("madOutliers: hand-computed modified z; zero-MAD keys never flag") {
    val rows = Seq(
      (1L, "a", 1.0), (2L, "a", 2.0), (3L, "a", 3.0),
      (4L, "a", 4.0), (5L, "a", 100.0), // median 3, MAD 1
      (6L, "b", 5.0), (7L, "b", 5.0), (8L, "b", 5.0),
      (9L, "b", 9.0) // median 5, MAD 0 → undefined scores
    ).toDF("event_id", "event_type", "value")
    val out = TimeSeries.madOutliers(rows, "event_type", "value")
      .select("event_id", "robust_z", "is_outlier")
      .as[(Long, Option[Double], Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) === ((Some(-1.349), false)))
    assert(out(2L) === ((Some(-0.6745), false)))
    assert(out(3L) === ((Some(0.0), false)))
    assert(out(4L) === ((Some(0.6745), false)))
    assert(out(5L) === ((Some(65.4265), true))) // 0.6745 * 97
    (6L to 9L).foreach(i => assert(out(i) === ((None, false))))
    // A mean/std z-score at the same 3.5 dial would MISS the spike
    // (n=5, the spike inflates std to ~43 → z ≈ 1.8): masking is the
    // reason this operator is median-based.
  }

  test("runningTotal: bucketed prefix sum equals the naive global window") {
    val rnd = new scala.util.Random(41)
    // Sparse non-contiguous ids across many buckets, including empty ones.
    val rows = (1 to 300).map(_ => rnd.nextInt(100000).toLong).distinct
      .map(id => (id, (id % 7) + 1))
    val df = rows.toDF("id", "v")
    val out = TimeSeries.runningTotal(df, "id", "v", bucketWidth = 1000)
      .select("id", "running_total")
      .as[(Long, Long)].collect().toMap
    val naive = rows.sortBy(_._1)
      .scanLeft((0L, 0L)) { case ((_, acc), (id, v)) => (id, acc + v) }
      .drop(1).toMap
    assert(out === naive)
    // Width 1 (every row its own bucket) degenerates gracefully.
    val w1 = TimeSeries.runningTotal(df, "id", "v", bucketWidth = 1)
      .select("id", "running_total").as[(Long, Long)].collect().toMap
    assert(w1 === naive)
  }

  test("trendFit: exact line recovered; flat series slope 0; degenerate NULL") {
    val df = Seq(
      // key "up": y = 3x + 1 exactly
      ("up", 0L, 1.0), ("up", 1L, 4.0), ("up", 2L, 7.0), ("up", 3L, 10.0),
      // key "flat": constant
      ("flat", 0L, 5.0), ("flat", 1L, 5.0), ("flat", 2L, 5.0),
      // key "one": single point -> NULL fit
      ("one", 7L, 9.0)
    ).toDF("k", "x", "y")
    val out = TimeSeries.trendFit(df, "k", "x", "y")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), Option(r.get(2)), Option(r.get(3))))).toMap
    assert(out("up") === ((4L, Some(3.0), Some(1.0))))
    assert(out("flat") === ((3L, Some(0.0), Some(5.0))))
    assert(out("one") === ((1L, None, None)))
  }

  test("peakConcurrency: hand-built overlap pattern; closed intervals; ties") {
    def ts(min: Int, sec: Int = 0) =
      java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:$sec%02d")
    val intervals = Seq(
      (ts(0), ts(10)),  // A: 10:00-10:10
      (ts(5), ts(20)),  // B: overlaps A -> 2 concurrent at 10:05
      (ts(5), ts(7)),   // C: same-instant start as B -> 3 at 10:05
      (ts(30), ts(30)), // D: zero-length (single-event session) counts 1
      (ts(70), ts(80))  // E: next hour bucket
    ).toDF("st", "en")
    val out = TimeSeries.peakConcurrency(intervals, "st", "en")
      .orderBy("bucket_start")
      .select("peak_concurrent", "n_started")
      .as[(Long, Long)].collect().toSeq
    assert(out === Seq((3L, 4L), (1L, 1L)))
    // Closed-interval semantics: an interval ending exactly when
    // another starts overlaps it for that instant (end key 2t+1 sorts
    // after start key 2t).
    val touching = Seq((ts(0), ts(5)), (ts(5), ts(9))).toDF("st", "en")
    val peak = TimeSeries.peakConcurrency(touching, "st", "en")
      .select("peak_concurrent").as[Long].collect().toSeq
    assert(peak === Seq(2L))
  }

  test("patternSearch: amplitude/offset-invariant exact hit ranks first at dist 0; flat windows skipped") {
    def ts(sec: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:00:$sec%02d")
    val pattern = Seq(0.0, 1.0, 3.0, 1.0)
    // key 1 embeds the pattern scaled x10 + offset 100 at position 3;
    // key 2 is constant (flat windows must never match).
    val noise = Seq(5.0, -2.0, 7.0)
    val k1 = noise ++ pattern.map(_ * 10 + 100) ++ Seq(4.0, -6.0)
    val rows =
      k1.zipWithIndex.map { case (v, i) => (1L, ts(i), i.toLong, v) } ++
        (0 until 8).map(i => (2L, ts(i), (100 + i).toLong, 42.0))
    val df = rows.toDF("user_id", "t", "tie", "v")
    val out = TimeSeries.patternSearch(
        df, "user_id", "t", "tie", "v", pattern, k = 3)
      .as[(Long, java.sql.Timestamp, Long, Double)].collect()
    assert(out.head._1 === 1L)
    assert(out.head._3 === 3L, "match must start where the copy was planted")
    assert(out.head._4 === 0.0, "z-normed exact copy has distance 0")
    assert(out.forall(_._1 === 1L), "flat key-2 windows must be skipped")
  }

  test("patternSearch: single WindowExec pass + TakeOrderedAndProject top-k") {
    val df = graft.sources.Tables
      .load(spark, "/root/testdata/sf0.001", "events")
      .select("user_id", "ts", "event_id", "value")
    val plan = TimeSeries.patternSearch(
        df, "user_id", "ts", "event_id", "value",
        Seq(0.0, 1.0, 3.0, 1.0, 0.0, -1.0, -3.0, -1.0), k = 25)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), "top-k must not global-sort")
    assert("Window ".r.findAllIn(plan).size === 1,
      s"all ${8} lead columns must share ONE WindowExec pass")
  }

  test("seasonalBaselineAnomalies: hour-of-week cells, 3-sigma flag, " +
      "zero-variance never flags, no-baseline cell absent") {
    import org.apache.spark.sql.functions.{col, lit}
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // 2024-01-01 is a Monday -> dow 1. Baseline week 1; eval week 2.
    val rows = Seq(
      // cell (dow 1, hour 10): baseline values 1, 3 -> mean 2, std 1
      (ts("2024-01-01 10:00:00"), 1.0), (ts("2024-01-01 10:30:00"), 3.0),
      // cell (dow 1, hour 12): constant baseline -> std 0
      (ts("2024-01-01 12:00:00"), 5.0), (ts("2024-01-01 12:30:00"), 5.0),
      // eval (Monday Jan 8): 10h -> 5.0 is 3 sigma out (|5-2| >= 3*1),
      // 4.9 is not; 12h -> 9.0 against std 0 must NOT flag
      (ts("2024-01-08 10:00:00"), 5.0), (ts("2024-01-08 10:15:00"), 4.9),
      (ts("2024-01-08 12:00:00"), 9.0),
      // eval-only cell (dow 1, hour 20): no baseline -> absent
      (ts("2024-01-08 20:00:00"), 7.0)
    ).toDF("ts", "v")
    val out = TimeSeries.seasonalBaselineAnomalies(
        rows, "ts", "v", lit("2024-01-08 00:00:00").cast("timestamp"))
      .as[(Int, Int, Long, Double, Double, Long, Long)].collect().toSeq
    assert(out === Seq(
      (1, 10, 2L, 2.0, 1.0, 2L, 1L),
      (1, 12, 2L, 5.0, 0.0, 1L, 0L)))
  }

  test("autocorrelation: hand-computed ACF on 1..4; degenerate lags NULL") {
    // x = [1,2,3,4]: xbar = 2.5, den = 5;
    // lag1 cov 1.25 -> 0.25; lag2 -1.5 -> -0.3; lag3 -2.25 -> -0.45;
    // lag4 has no pairs -> NULL. A NULL value row is excluded.
    val df = Seq(
      ("k", 1L, 1L, Some(1.0)), ("k", 2L, 2L, Some(2.0)),
      ("k", 3L, 3L, Some(3.0)), ("k", 4L, 4L, Some(4.0)),
      ("k", 5L, 5L, None),
      // constant series: den = 0 -> every lag NULL
      ("c", 1L, 1L, Some(7.0)), ("c", 2L, 2L, Some(7.0)),
      ("c", 3L, 3L, Some(7.0))
    ).toDF("key", "ts", "id", "v")
    val out = TimeSeries.autocorrelation(df, "key", "ts", "id", "v", 4)
      .as[(String, Int, Long, Long, Option[Double])].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(out(("k", 1)) === ((4L, 3L, Some(0.25))))
    assert(out(("k", 2)) === ((4L, 2L, Some(-0.3))))
    assert(out(("k", 3)) === ((4L, 1L, Some(-0.45))))
    assert(out(("k", 4)) === ((4L, 0L, None)))
    assert((1 to 4).forall(l => out(("c", l))._3.isEmpty))
  }

  test("autocorrelation: ordering uses the tiebreak within equal ts") {
    // same ts everywhere: series order is the id column; a perfectly
    // alternating series has ACF(1) < 0 and ACF(2) > 0.
    val df = Seq(
      ("k", 0L, 1L, 1.0), ("k", 0L, 2L, 3.0), ("k", 0L, 3L, 1.0),
      ("k", 0L, 4L, 3.0), ("k", 0L, 5L, 1.0), ("k", 0L, 6L, 3.0)
    ).toDF("key", "ts", "id", "v")
    val out = TimeSeries.autocorrelation(df, "key", "ts", "id", "v", 2)
      .as[(String, Int, Long, Long, Option[Double])].collect()
      .map(r => r._2 -> r._5).toMap
    assert(out(1).exists(_ < 0))
    assert(out(2).exists(_ > 0))
  }
}
