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
}
