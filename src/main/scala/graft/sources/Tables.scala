package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/**
 * Parquet table loader for the driver's testdata layout
 * (`<sfDir>/<name>.parquet`).
 *
 * The `events` table stores `ts` as parquet TIMESTAMP(NANOS), which
 * Spark's vectorized reader rejects outright (PARQUET_TYPE_ILLEGAL).
 * We read nanos as epoch-nano longs (`spark.sql.legacy.parquet
 * .nanosAsLong`) and rebuild a microsecond timestamp with integer
 * division — the data is µs-aligned, so this is lossless, and integer
 * `div` avoids the double-precision loss a `/ 1000` cast would hit at
 * epoch-nano magnitudes (~1.7e18 > 2^53).
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
    nanoCols.getOrElse(name, Nil).foldLeft(df) { (d, c) =>
      d.schema.fields.find(_.name == c) match {
        case Some(f) if f.dataType == LongType =>
          d.withColumn(c, timestamp_micros(expr(s"`$c` div 1000")))
        case _ => d
      }
    }
  }
}
