package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/**
 * Parquet table loader for the driver's testdata layout
 * (`<sfDir>/<name>.parquet`).
 *
 * Timestamp normalization — the driver has shipped two physical
 * encodings across rounds, and this loader accepts both:
 *
 *  - TIMESTAMP(NANOS) (rounds ≤6): Spark's vectorized reader rejects
 *    it outright (PARQUET_TYPE_ILLEGAL), so we read nanos as
 *    epoch-nano longs (`spark.sql.legacy.parquet.nanosAsLong`) and
 *    rebuild a microsecond timestamp with integer division — the data
 *    is µs-aligned, so this is lossless, and integer `div` avoids the
 *    double-precision loss a `/ 1000` cast would hit at epoch-nano
 *    magnitudes (~1.7e18 > 2^53).
 *  - TIMESTAMP(MICROS, isAdjustedToUTC=false) (round 7+): Spark
 *    infers TIMESTAMP_NTZ, which breaks every epoch-arithmetic cast
 *    downstream (NTZ→BIGINT is not a legal cast). All graft sessions
 *    pin `spark.sql.session.timeZone=UTC`, so NTZ wall-clock values
 *    ARE the UTC instants — the cast to TIMESTAMP (LTZ) below is a
 *    pure re-tag, matching both the old rebuild path and DuckDB's
 *    naive-TIMESTAMP view of the same files.
 */
object Tables {

  /** Columns per table that are parquet TIMESTAMP(NANOS) on disk. */
  private val nanoCols: Map[String, Seq[String]] = Map("events" -> Seq("ts"))

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Runtime-settable legacy conf; harmless when already set.
    // Deliberately NOT save/restored: the returned plan is lazy and
    // re-consults the conf at execution, so restoring it here would
    // break every DataFrame this function has ever returned.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    val rebuilt = nanoCols.getOrElse(name, Nil).foldLeft(df) { (d, c) =>
      d.schema.fields.find(_.name == c) match {
        case Some(f) if f.dataType == LongType =>
          d.withColumn(c, timestamp_micros(expr(s"`$c` div 1000")))
        case _ => d
      }
    }
    // µs-naive era: re-tag every NTZ column as a UTC instant (see
    // Scaladoc — lossless under the pinned UTC session timezone).
    rebuilt.schema.fields.filter(_.dataType == TimestampNTZType)
      .foldLeft(rebuilt) { (d, f) =>
        d.withColumn(f.name, col(f.name).cast(TimestampType))
      }
  }
}
