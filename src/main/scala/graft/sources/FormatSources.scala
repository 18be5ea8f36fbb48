package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Source/sink formats beyond the reference's JSON+CSV surface
 * (reference scope: `motor_ingesta/motor_ingesta.py:32-36`,
 * `agregaciones.py:23-30`) — the ingest breadth a training-data
 * pipeline needs:
 *
 *   - `binaryFile`: the multimodal ingest path — images/audio/video
 *     land as (path, modificationTime, length, content:binary) rows,
 *     feeding [[graft.operators.Multimodal]] without ever decoding
 *     in the scan. Pushes a glob filter down to file listing.
 *   - `text`: raw line-oriented corpora (one row per line, lazy
 *     whole-file with `wholetext`).
 *   - ORC round-trip: the columnar alternative when the lakehouse
 *     standard is ORC, same predicate/column pushdown contract as
 *     parquet.
 *
 * Scale: all three are splittable scans (ORC/text by block, binary
 * by file) that parallelize across executors via the file index; the
 * binary reader caps per-file size with
 * `spark.sql.sources.binaryFile.maxLength` — oversized media should
 * stream through a path-only listing + per-partition ranged reads
 * instead.
 */
object FormatSources {

  /** Binary-file scan: one row per file matching `glob` under `dir`.
    * Columns: path, modificationTime, length, content. */
  def readBinaryFiles(
      spark: SparkSession, dir: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)

  /** Line-oriented text scan; `wholeFile = true` yields one row per
    * file (document-per-file corpora). */
  def readText(
      spark: SparkSession, path: String, wholeFile: Boolean = false): DataFrame =
    spark.read.option("wholetext", wholeFile.toString).text(path)

  /** Text lines with their source file — the standard provenance
    * column for multi-file corpora. */
  def readTextWithProvenance(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .select(
        input_file_name().as("source_file"),
        col("value").as("line"))

  /** ORC sink (columnar round-trip counterpart of the parquet path). */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** ORC scan — same pushdown behavior class as parquet. */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /**
   * Schema-evolution-tolerant parquet scan: `mergeSchema` unions the
   * footer schemas of every file generation under `base` (a column
   * added in generation N reads as NULL for older files), and
   * partition discovery recovers the directory keys (`gen=…`) as
   * columns. The read path every long-lived 100 TB table needs the
   * day a column is added — without rewriting history. Schema-merge
   * costs one footer read per file at planning time; row scans are
   * unchanged.
   */
  def readParquetMerged(spark: SparkSession, base: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(base)
}
