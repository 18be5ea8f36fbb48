package graft

import java.sql.Timestamp

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
}
