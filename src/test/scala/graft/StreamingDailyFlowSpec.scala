package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.config.{ColumnSpec, EngineConfig}
import graft.streaming.StreamingDailyFlow

/** Structured-Streaming skin: landing files drain through
  * foreachBatch into the same daily-flow core, with the checkpoint
  * providing processed-file bookkeeping across restarts. */
class StreamingDailyFlowSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val cfg = EngineConfig(
    data_columns = Seq(
      ColumnSpec("FlightDate", "date", Some("Flight date")),
      ColumnSpec("Reporting_Airline", "string", Some("Carrier")),
      ColumnSpec("Origin", "string", Some("Origin IATA")),
      ColumnSpec("DepTime", "int", Some("Local departure HHmm"))),
    output_table = Some("flights_stream_test"),
    output_partitions = Some(1))

  private val inputSchema = StructType(Seq(
    StructField("FlightDate", StringType),
    StructField("Reporting_Airline", StringType),
    StructField("Origin", StringType),
    StructField("DepTime", LongType)))

  test("streamed daily files stitch across days with checkpointed file tracking") {
    val landing = Files.createTempDirectory("graft-landing")
    val checkpoint = Files.createTempDirectory("graft-ckpt").toString
    val skin = new StreamingDailyFlow(cfg)

    Files.writeString(landing.resolve("2024-03-01.json"),
      """{"FlightDate": "2024-03-01", "Reporting_Airline": "AA", "Origin": "JFK", "DepTime": 900}
        |{"FlightDate": "2024-03-01", "Reporting_Airline": "DL", "Origin": "JFK", "DepTime": 1100}""".stripMargin)

    // Drain pass 1: one file, one micro-batch.
    skin.start(spark, landing.toString, inputSchema, checkpoint)
      .awaitTermination()
    val after1 = spark.read.table("flights_stream_test")
    assert(after1.count() === 2)
    assert(after1.where(col("diff_next").isNull).count() === 1)

    // Day 2 arrives; a fresh AvailableNow drain with the SAME
    // checkpoint processes only the new file.
    Files.writeString(landing.resolve("2024-03-02.json"),
      """{"FlightDate": "2024-03-02", "Reporting_Airline": "UA", "Origin": "JFK", "DepTime": 800}""")
    skin.start(spark, landing.toString, inputSchema, checkpoint)
      .awaitTermination()

    // The stream ran in a cloned micro-batch session; this session's
    // cached file listing predates the partition rewrite.
    spark.catalog.refreshTable("flights_stream_test")
    val after2 = spark.read.table("flights_stream_test")
    assert(after2.count() === 3)
    val fixed = after2
      .where(col("FlightDate") === lit("2024-03-01").cast("date")
        && col("DepTime") === 1100)
      .head()
    assert(fixed.getAs[String]("Airline_next") === "UA")
    assert(fixed.getAs[Long]("diff_next") === 75600L) // 21h across the day boundary

    spark.sql("DROP TABLE IF EXISTS flights_stream_test")
  }
}
