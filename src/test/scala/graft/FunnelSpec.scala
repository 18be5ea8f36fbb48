package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Funnel

/** Goldens for the event-analytics operators (funnel, retention). */
class FunnelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("funnel: strict order and conversion window both enforced") {
    // u1 converts fully; u2 clicked BEFORE viewing (order violation);
    // u3 purchases outside the 1h window; u4 never clicks.
    val events = Seq(
      ("u1", ts("2024-01-01 10:00:00"), "view"),
      ("u1", ts("2024-01-01 10:05:00"), "click"),
      ("u1", ts("2024-01-01 10:10:00"), "purchase"),
      ("u2", ts("2024-01-01 09:00:00"), "click"),
      ("u2", ts("2024-01-01 09:30:00"), "view"),
      ("u3", ts("2024-01-01 08:00:00"), "view"),
      ("u3", ts("2024-01-01 08:10:00"), "click"),
      ("u3", ts("2024-01-01 09:30:00"), "purchase"), // 90 min > 1h window
      ("u4", ts("2024-01-01 07:00:00"), "view")
    ).toDF("user_id", "ts", "event_type")
    val out = Funnel.funnel(events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), windowSeconds = 3600L)
      .as[(Int, String, Long)].collect().toSeq
    assert(out === Seq((0, "view", 4L), (1, "click", 2L), (2, "purchase", 1L)))
  }

  test("funnel: later in-window event still converts after an early miss") {
    // First click is before the view; a second click after it counts.
    val events = Seq(
      ("u", ts("2024-01-01 10:00:00"), "click"),
      ("u", ts("2024-01-01 11:00:00"), "view"),
      ("u", ts("2024-01-01 11:30:00"), "click")
    ).toDF("user_id", "ts", "event_type")
    val out = Funnel.funnel(events, "user_id", "ts", "event_type",
        Seq("view", "click"), windowSeconds = 3600L)
      .as[(Int, String, Long)].collect().toSeq
    assert(out === Seq((0, "view", 1L), (1, "click", 1L)))
  }

  test("retention: cohort week from first signup; offsets count distinct users") {
    // 2024-01-01 is a Monday. u1 signs up week 0, active weeks 0 and 2;
    // u2 signs up week 0, active week 0 only; u3 signs up week 2.
    val events = Seq(
      ("u1", ts("2024-01-02 10:00:00"), "signup"),
      ("u1", ts("2024-01-16 10:00:00"), "click"),
      ("u2", ts("2024-01-03 10:00:00"), "signup"),
      ("u3", ts("2024-01-17 10:00:00"), "signup"),
      ("u3", ts("2024-01-18 10:00:00"), "view")
    ).toDF("user_id", "ts", "event_type")
    val out = Funnel.retention(events, "user_id", "ts", "event_type",
        cohortType = "signup", maxWeeks = 5)
      .orderBy("cohort_week", "week_offset")
      .select("cohort_week", "week_offset", "n_users")
      .as[(java.sql.Date, Int, Long)].collect().toSeq
    assert(out === Seq(
      (java.sql.Date.valueOf("2024-01-01"), 0, 2L),
      (java.sql.Date.valueOf("2024-01-01"), 2, 1L),
      (java.sql.Date.valueOf("2024-01-15"), 0, 1L)))
  }

  // Attribution fixture: u1 converts at 12:00 with touches at 11:00
  // (view #1) and 11:30 (click #2); a touch at 12:01 (#3, AFTER the
  // conversion) and one 25h earlier (#4) both fall outside the
  // window. u2 converts with no touches at all.
  private def attEvents = Seq(
    ("u1", ts("2024-01-02 11:00:00"), "view", 0.0, 1L),
    ("u1", ts("2024-01-02 11:30:00"), "click", 0.0, 2L),
    ("u1", ts("2024-01-02 12:01:00"), "view", 0.0, 3L),
    ("u1", ts("2024-01-01 10:59:00"), "view", 0.0, 4L),
    ("u1", ts("2024-01-02 12:00:00"), "purchase", 90.0, 5L),
    ("u2", ts("2024-01-02 12:00:00"), "purchase", 10.0, 6L)
  ).toDF("user_id", "ts", "event_type", "value", "event_id")

  test("touchAttribution: first/last inside the closed 24h window; no-touch conv NULLs") {
    val out = Funnel.touchAttribution(
        attEvents, "user_id", "ts", "event_type", "value", "event_id",
        conversionType = "purchase", touchTypes = Seq("view", "click"),
        lookbackSeconds = 24L * 3600)
      .orderBy("conv_id")
      .select("conv_id", "first_touch_id", "last_touch_id")
      .as[(Long, Option[Long], Option[Long])].collect().toSeq
    // #4 is 25h01m before the conversion (outside), #3 is after it.
    assert(out === Seq((5L, Some(1L), Some(2L)), (6L, None, None)))
  }

  test("linearAttribution: equal split over qualifying touches; zero-touch conv absent") {
    val out = Funnel.linearAttribution(
        attEvents, "user_id", "ts", "event_type", "value", "event_id",
        conversionType = "purchase", touchTypes = Seq("view", "click"),
        lookbackSeconds = 24L * 3600)
      .orderBy("touch_id")
      .select("conv_id", "touch_id", "n_touches", "credit")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out === Seq((5L, 1L, 2L, 45.0), (5L, 2L, 2L, 45.0)))
  }

  test("kaplanMeier: censored subjects shrink the risk set; all-die last step") {
    // durations: 1(event), 2(censored), 3(event), 3(event), 5(censored)
    // t=1: n=5, d=1 -> step 0.8 ; t=3: n=3 (the censored-at-2 subject
    // left the risk set WITHOUT an event), d=2 -> step 1/3
    val subj = Seq(
      (1L, true), (2L, false), (3L, true), (3L, true), (5L, false)
    ).toDF("dur", "ev")
    val out = Funnel.kaplanMeier(subj, "dur", "ev")
      .as[(Long, Long, Long, Option[Double], Option[Double])]
      .collect().toSeq
    assert(out.map(r => (r._1, r._2, r._3)) === Seq((1L, 5L, 1L), (3L, 3L, 2L)))
    // exact decimal log-survival: round(ln(0.8),6) + round(ln(1/3),6)
    assert(out(0)._4 === Some(-0.223144))
    assert(out(1)._4 === Some(-0.223144 + -1.098612))
    assert(math.abs(out(1)._5.get - 0.8 / 3.0) < 1e-4)
    // everyone at risk dies at the last step -> survival 0, NULL log
    val allDie = Seq((1L, true), (1L, true)).toDF("dur", "ev")
    val ad = Funnel.kaplanMeier(allDie, "dur", "ev")
      .as[(Long, Long, Long, Option[Double], Option[Double])]
      .collect().toSeq
    assert(ad === Seq((1L, 2L, 2L, None, Some(0.0))))
  }

  test("topPaths: ordered step strings, step cap, count-then-path top-k ties") {
    def ts(s: Long) = new Timestamp(s * 1000L)
    val ev = Seq(
      (1L, ts(1), 1L, "view"), (1L, ts(2), 2L, "click"),
      (1L, ts(3), 3L, "buy"),
      (2L, ts(5), 4L, "view"), (2L, ts(6), 5L, "click"),
      (2L, ts(7), 6L, "buy"),
      (3L, ts(1), 7L, "view"), (3L, ts(2), 8L, "exit"),
      // user 4: 3 events but cap 2 -> path cut at 2 steps
      (4L, ts(1), 9L, "view"), (4L, ts(2), 10L, "exit"),
      (4L, ts(3), 11L, "buy"),
      // same-ts tie broken by event_id: 13 before 12 would be wrong
      (5L, ts(1), 12L, "view"), (5L, ts(1), 13L, "exit")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = Funnel.topPaths(ev, "user_id", "ts", "event_id",
        "event_type", maxSteps = 2, k = 10)
      .as[(String, Long)].collect().toSeq
    assert(out === Seq(("view>click", 2L), ("view>exit", 3L)).sortBy(-_._2))
    // count desc first, then path asc on ties
    val k1 = Funnel.topPaths(ev, "user_id", "ts", "event_id",
        "event_type", maxSteps = 2, k = 1)
      .as[(String, Long)].collect().toSeq
    assert(k1 === Seq(("view>exit", 3L)))
  }
}
