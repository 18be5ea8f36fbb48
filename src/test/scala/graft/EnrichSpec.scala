package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Enrich

/** Golden enrichment tests
  * (reference: tests/test_ingesta.py:84-143; BASELINE.md). */
class EnrichSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("timezone dimension loads 8875 rows and maps JFK") {
    val tz = Enrich.loadTimezones(spark)
    assert(tz.count() === 8875)
    assert(tz.columns.toSeq === Seq("iata_code", "iana_tz"))
    val jfk = tz.where($"iata_code" === "JFK").head()
    assert(jfk.getString(1) === "America/New_York")
  }

  test("UTC enrichment: JFK 2023-12-25 15:35 local -> 20:35 UTC") {
    val df = Seq(("JFK", "2023-12-25", 1535L))
      .toDF("Origin", "FlightDate", "DepTime")
    val out = Enrich.addUtcTime(df, Enrich.loadTimezones(spark))
    val ft = out.select("FlightTime").head().getTimestamp(0)
    assert(ft === Timestamp.valueOf("2023-12-25 20:35:00"))
    assert(!out.columns.contains("iana_tz")) // join keys dropped
  }

  test("unknown IATA code keeps row with NULL FlightTime (left join)") {
    val df = Seq(("???", "2023-12-25", 1000L))
      .toDF("Origin", "FlightDate", "DepTime")
    val out = Enrich.addUtcTime(df, Enrich.loadTimezones(spark))
    assert(out.count() === 1)
    assert(out.select("FlightTime").head().isNullAt(0))
  }

  test("malformed DepTime 2400 parses to NULL FlightTime") {
    val df = Seq(("JFK", "2023-12-25", 2400L))
      .toDF("Origin", "FlightDate", "DepTime")
    val out = Enrich.addUtcTime(df, Enrich.loadTimezones(spark))
    assert(out.select("FlightTime").head().isNullAt(0))
  }

  test("intervals: JFK 15:35 -> 17:35 gives diff_next 7200 s") {
    val df = Seq(
      ("JFK", "2023-12-25 15:35:00", "American"),
      ("JFK", "2023-12-25 17:35:00", "Iberia"))
      .toDF("Origin", "ft", "Reporting_Airline")
      .withColumn("FlightTime", $"ft".cast("timestamp")).drop("ft")
    val out = Enrich.addIntervals(df).orderBy("FlightTime")
    val first = out.head()
    assert(first.getAs[Timestamp]("FlightTime_next")
      === Timestamp.valueOf("2023-12-25 17:35:00"))
    assert(first.getAs[String]("Reporting_Airline_next") === "Iberia")
    assert(first.getAs[Long]("diff_next") === 7200L)
    // last row of the partition: NULLs
    val last = out.collect().last
    assert(last.isNullAt(last.fieldIndex("diff_next")))
  }
}
