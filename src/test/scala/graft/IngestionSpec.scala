package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.config.{ColumnSpec, EngineConfig}
import graft.sources.IngestionEngine

/** Golden end-to-end ingest: nested JSON → flatten → config coercion
  * with comment metadata (reference: tests/test_ingesta.py:28-54). */
class IngestionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val cfg = EngineConfig(Seq(
    ColumnSpec("name", "string", Some("Person name")),
    ColumnSpec("relation", "string", Some("Relation kind")),
    ColumnSpec("num", "int", Some("How many relatives of that kind")),
    ColumnSpec("job", "string", Some("Person occupation"))))

  private def writeFixture(): String = {
    val dir = Files.createTempDirectory("graft-ingest")
    val f = dir.resolve("people.json")
    Files.writeString(f,
      """{"name": "Ada", "relatives": [{"relation": "niece", "num": 3}], "job": "Engineer"}""")
    f.toString
  }

  test("nested JSON ingests to one flat typed row with comment metadata") {
    val engine = new IngestionEngine(cfg)
    val df = engine.ingestFile(spark, writeFixture())

    assert(df.count() === 1) // one-element array ⇒ one exploded row
    assert(df.columns.toSeq === Seq("name", "relation", "num", "job"))

    val row = df.head()
    assert(row.getString(0) === "Ada")
    assert(row.getString(1) === "niece")
    assert(row.getInt(2) === 3) // coerced long → int
    assert(row.getString(3) === "Engineer")

    // comment metadata round-trips through the projection
    assert(df.schema("num").metadata.getString("comment")
      === "How many relatives of that kind")
  }

  test("config column missing from the input raises an analysis error (reference contract)") {
    import spark.implicits._
    val engine = new IngestionEngine(cfg)
    val noJob = Seq(("Ada", "niece", 3)).toDF("name", "relation", "num")
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      engine.coerce(noJob).collect()
    }
    assert(err.getMessage.toLowerCase.contains("job"))
  }

  test("malformed values coerce to NULL, not error (non-ANSI parity)") {
    val dir = Files.createTempDirectory("graft-bad")
    val f = dir.resolve("bad.json")
    Files.writeString(f, """{"name": "X", "relatives": [{"relation": "r", "num": "not-a-number"}], "job": "J"}""")
    val df = new IngestionEngine(cfg).ingestFile(spark, f.toString)
    assert(df.head().isNullAt(2))
  }

  test("CSV ingest: header + inferred schema then coercion") {
    val dir = Files.createTempDirectory("graft-csv")
    val f = dir.resolve("people.csv")
    Files.writeString(f, "name,relation,num,job\nAda,niece,3,Engineer\n")
    val df = new IngestionEngine(cfg).ingestCsvFile(spark, f.toString)
    assert(df.count() === 1)
    assert(df.head().getInt(2) === 3)
  }
}
