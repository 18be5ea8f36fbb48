package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

import graft.config.EngineConfig
import graft.operators.Flatten

/**
 * File → flat, typed DataFrame (reference: motor_ingesta/motor_ingesta.py:24-44).
 *
 * Pipeline: schema-inferred scan → recursive flatten → coercion to the
 * fixed config schema, where each column is cast to its DDL type string
 * and re-aliased carrying a `comment` metadata entry. Extra flattened
 * columns are dropped by the projection; missing ones raise an
 * AnalysisException (same contract as the reference).
 *
 * Casts use `try_cast`, so a malformed value degrades to NULL even
 * under Spark 4's ANSI-on default — matching the reference's
 * (PySpark 3.5, non-ANSI) NULL-on-malformed semantics.
 */
class IngestionEngine(val config: EngineConfig) {

  /** Ingest a (possibly nested) JSON file: scan → flatten → coerce. */
  def ingestFile(spark: SparkSession, path: String): DataFrame =
    coerce(Flatten.flatten(readJson(spark, path)))

  /** Schema-inferred JSON scan (reference: motor_ingesta.py:32-36).
    * The JSON source ALWAYS infers absent an explicit schema — an
    * `inferSchema` option would be dead configuration (it belongs to
    * the CSV source). */
  def readJson(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  /** Header + schema-inferred CSV scan (reference: agregaciones.py:23-30). */
  def readCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(path)

  /** Ingest a flat CSV file: scan → flatten (no-op when flat) → coerce. */
  def ingestCsvFile(spark: SparkSession, path: String): DataFrame =
    coerce(Flatten.flatten(readCsv(spark, path)))

  /**
   * Coerce to the config schema: cast + rename + comment metadata
   * (reference: motor_ingesta.py:39-43).
   */
  def coerce(df: DataFrame): DataFrame = {
    val cols = config.dataColumns.map { c =>
      col(c.name).try_cast(DataType.fromDDL(c.sparkType)).as(c.name, c.metadata)
    }
    df.select(cols: _*)
  }
}
