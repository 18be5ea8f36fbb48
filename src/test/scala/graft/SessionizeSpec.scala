package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sessionize

/** Goldens for batch gaps-and-islands sessionization. */
class SessionizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // user A: 3 events in one session, then a 31-min gap, then 1 more.
  // user B: single event. Gap threshold 30 min.
  private val events = Seq(
    ("a", ts("2024-01-01 10:00:00"), 1L),
    ("a", ts("2024-01-01 10:10:00"), 2L),
    ("a", ts("2024-01-01 10:39:59"), 3L), // 29:59 after prev -> same session
    ("a", ts("2024-01-01 11:10:00"), 4L), // 30:01 gap -> new session
    ("b", ts("2024-01-01 09:00:00"), 5L)
  ).toDF("user_id", "ts", "event_id")

  test("sessions split exactly past the gap threshold") {
    val seqs = Sessionize.sessions(events, "user_id", "ts", "event_id", 1800L)
      .select("event_id", "session_seq").as[(Long, Long)].collect().toMap
    assert(seqs === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 1L))
  }

  test("a gap of exactly gapSeconds does NOT open a session") {
    val df = Seq(
      ("u", ts("2024-01-01 00:00:00"), 1L),
      ("u", ts("2024-01-01 00:30:00"), 2L) // exactly 1800s
    ).toDF("user_id", "ts", "event_id")
    val seqs = Sessionize.sessions(df, "user_id", "ts", "event_id", 1800L)
      .select("event_id", "session_seq").as[(Long, Long)].collect().toMap
    assert(seqs === Map(1L -> 1L, 2L -> 1L))
  }

  test("sessionStats: counts, bounds, exact microsecond duration") {
    val stats = Sessionize.sessionStats(events, "user_id", "ts", "event_id", 1800L)
      .select("user_id", "session_seq", "n_events", "dur_us")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(stats === Set(
      ("a", 1L, 3L, 2399000000L), // 39:59 span in µs
      ("a", 2L, 1L, 0L),
      ("b", 1L, 1L, 0L)))
  }

  test("debounce: chained double-fires collapse to one kept event per burst") {
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    // Key (u1, click): events at 0,5,9,14s with a 10s window chain
    // into ONE burst (every consecutive gap <= 10) even though 14s is
    // past the first event's window — the gaps-and-islands rule. A
    // 30s gap then opens burst 2. Different type/user never mix.
    val df = Seq(
      (1L, 1L, "click", ts(0)), (2L, 1L, "click", ts(5)),
      (3L, 1L, "click", ts(9)), (4L, 1L, "click", ts(14)),
      (5L, 1L, "click", ts(45)),
      (6L, 1L, "view", ts(1)),
      (7L, 2L, "click", ts(2))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = Sessionize
      .debounce(df, Seq("user_id", "event_type"), "ts", "event_id", 10L)
      .select("user_id", "event_type", "burst_seq", "kept_event_id", "n_events")
      .as[(Long, String, Long, Long, Long)].collect().toSet
    assert(out === Set(
      (1L, "click", 1L, 1L, 4L), // 3 suppressed double-fires
      (1L, "click", 2L, 5L, 1L),
      (1L, "view", 1L, 6L, 1L),
      (2L, "click", 1L, 7L, 1L)))
  }

  test("sessionWindowStats: native session_window boundary semantics " +
      "— gap == duration MERGES (same boundary as sessionStats), a " +
      "strictly greater gap splits, end = last + gap") {
    // user a: 10:00, 10:30 (gap EXACTLY 30 min -> merges),
    //         11:00:01 (30:01 -> splits)
    val df = Seq(
      ("a", ts("2024-01-01 10:00:00")),
      ("a", ts("2024-01-01 10:30:00")),
      ("a", ts("2024-01-01 11:00:01")),
      ("b", ts("2024-01-01 09:00:00"))
    ).toDF("user_id", "ts")
    val out = Sessionize
      .sessionWindowStats(df, "user_id", "ts", "30 minutes")
      .orderBy("user_id", "session_start")
      .as[(String, Timestamp, Timestamp, Long)].collect().toSeq
    assert(out === Seq(
      // ==30min merges; end = last event + gap (half-open window)
      ("a", ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00"), 2L),
      ("a", ts("2024-01-01 11:00:01"), ts("2024-01-01 11:30:01"), 1L),
      ("b", ts("2024-01-01 09:00:00"), ts("2024-01-01 09:30:00"), 1L)))
    // the hand-rolled operator agrees on the boundary: one ==gap
    // merge, one >gap split
    val legacy = Sessionize.sessionStats(
        df.withColumn("event_id", col("ts").cast("long")),
        "user_id", "ts", "event_id", 1800L)
      .where(col("user_id") === "a").count()
    assert(legacy === 2L)
  }
}
