package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.config.{ColumnSpec, EngineConfig}
import graft.operators.DailyFlow

/** Daily batch-incremental orchestration: two consecutive daily files,
  * cross-day boundary fix via union + re-window
  * (reference: flujo_diario.py:27-74; notebook cells 13-16). */
class DailyFlowSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val cfg = EngineConfig(
    data_columns = Seq(
      ColumnSpec("FlightDate", "date", Some("Flight date")),
      ColumnSpec("Reporting_Airline", "string", Some("Carrier")),
      ColumnSpec("Origin", "string", Some("Origin IATA")),
      ColumnSpec("DepTime", "int", Some("Local departure HHmm"))),
    output_table = Some("flights_test"),
    output_partitions = Some(2))

  private def writeDay(name: String, rows: Seq[String]): String = {
    val dir = Files.createTempDirectory("graft-daily")
    val f = dir.resolve(name)
    Files.writeString(f, rows.mkString("\n"))
    f.toString
  }

  test("two-day flow stitches boundary intervals across days") {
    val day1 = writeDay("d1.json", Seq(
      """{"FlightDate": "2024-03-01", "Reporting_Airline": "AA", "Origin": "JFK", "DepTime": 900}""",
      """{"FlightDate": "2024-03-01", "Reporting_Airline": "DL", "Origin": "JFK", "DepTime": 1100}"""))
    val day2 = writeDay("d2.json", Seq(
      """{"FlightDate": "2024-03-02", "Reporting_Airline": "UA", "Origin": "JFK", "DepTime": 800}"""))

    val flow = new DailyFlow(cfg)
    flow.processDaily(spark, day1)

    val afterDay1 = spark.read.table("flights_test")
    assert(afterDay1.count() === 2)
    // last flight of day 1 has no successor yet
    val d1last = afterDay1.orderBy(desc("FlightTime")).head()
    assert(d1last.isNullAt(d1last.fieldIndex("diff_next")))

    flow.processDaily(spark, day2)
    val afterDay2 = spark.read.table("flights_test")
    assert(afterDay2.count() === 3)

    // boundary fix: day-1 11:00 EST flight now points at day-2 08:00
    val fixed = afterDay2
      .where(col("FlightDate") === lit("2024-03-01").cast("date")
        && col("DepTime") === 1100)
      .head()
    assert(fixed.getAs[String]("Airline_next") === "UA") // reference naming (agregaciones.py:72)
    // 2024-03-01 11:00 EST -> 2024-03-02 08:00 EST = 21h = 75600 s
    assert(fixed.getAs[Long]("diff_next") === 75600L)

    spark.sql("DROP TABLE IF EXISTS flights_test")
  }

  test("three-day flow retains untouched partitions (dynamic overwrite, not truncate)") {
    val cfg3 = cfg.copy(output_table = Some("flights_test3"))
    val flow = new DailyFlow(cfg3)
    def day(n: Int, dep: Int) = writeDay(s"d$n.json", Seq(
      s"""{"FlightDate": "2024-03-0$n", "Reporting_Airline": "AA", "Origin": "JFK", "DepTime": $dep}"""))

    flow.processDaily(spark, day(1, 900))
    flow.processDaily(spark, day(2, 1000))
    flow.processDaily(spark, day(3, 1100))

    val table = spark.read.table("flights_test3")
    // Day 3 stitches days 2+3 only; day 1's partition must SURVIVE —
    // saveAsTable(overwrite) would have truncated it (the reference's
    // latent flujo_diario.py:60-68 bug, deliberately fixed here).
    val dates = table.select("FlightDate").distinct()
      .collect().map(_.getDate(0).toString).sorted.toSeq
    assert(dates === Seq("2024-03-01", "2024-03-02", "2024-03-03"))
    assert(table.count() === 3)

    // And the day-1→day-2 boundary fix from the day-2 run is intact.
    val d1 = table.where(col("FlightDate") === lit("2024-03-01").cast("date")).head()
    assert(d1.getAs[String]("Airline_next") === "AA")
    assert(d1.getAs[Long]("diff_next") === 90000L) // 09:00 -> next day 10:00 EST = 25h

    spark.sql("DROP TABLE IF EXISTS flights_test3")
  }

  test("skipped day: table exists but previous partition empty still runs the union path") {
    // Reference wart preserved faithfully (SURVEY §3.1 step 4): a
    // present-but-empty previous partition is NOT treated as missing.
    val cfgS = cfg.copy(output_table = Some("flights_test_skip"))
    val flow = new DailyFlow(cfgS)
    flow.processDaily(spark, writeDay("d1.json", Seq(
      """{"FlightDate": "2024-03-01", "Reporting_Airline": "AA", "Origin": "JFK", "DepTime": 900}""")))
    // Day 3 arrives; day 2's partition is empty.
    flow.processDaily(spark, writeDay("d3.json", Seq(
      """{"FlightDate": "2024-03-03", "Reporting_Airline": "UA", "Origin": "JFK", "DepTime": 800}""")))
    val table = spark.read.table("flights_test_skip")
    assert(table.count() === 2) // both days retained
    // No cross-day stitch happened (prev partition was empty), so
    // day 1's last flight keeps its NULL interval.
    val d1 = table.where(col("FlightDate") === lit("2024-03-01").cast("date")).head()
    assert(d1.isNullAt(d1.fieldIndex("diff_next")))
    spark.sql("DROP TABLE IF EXISTS flights_test_skip")
  }
}
