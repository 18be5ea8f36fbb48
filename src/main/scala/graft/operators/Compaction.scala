package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Before/after accounting for one compaction run. */
case class CompactionStats(
    filesBefore: Int,
    bytesBefore: Long,
    filesAfter: Int,
    bytesAfter: Long,
    rows: Long)

/**
 * Small-file compaction: rewrite a parquet directory into files of
 * ~`targetFileBytes` each. Incremental pipelines (per-batch appends,
 * dynamic partition overwrites, streaming sinks) accrete thousands of
 * small files per partition; at 100 TB the resulting file-listing and
 * task-scheduling overhead — one task per tiny file — dominates scan
 * cost long before I/O does.
 *
 * Mechanics: the target file count derives from the OBSERVED on-disk
 * footprint (`ceil(totalBytes / targetFileBytes)` — no bytes/row
 * guessing), then either
 *   - `coalesce(n)` (default): a NARROW repack — no shuffle; upstream
 *     partitions merge in place. The right default when input files
 *     are uniformly small (the append-accretion case).
 *   - `repartition(n)` (`shuffle = true`): pays one round-robin
 *     shuffle to rebalance pathological size skew (a few huge files
 *     among shards) at the cost of moving every byte.
 *
 * The rewrite lands in `destPath` (never in-place: overwriting a
 * directory while scanning it is undefined) — callers swap
 * directories or repoint the table location afterwards, which keeps
 * the operator safe to retry.
 */
object Compaction {

  /** Files under `path` (non-hidden data files only). */
  private def dataFiles(spark: SparkSession, path: String): Seq[(String, Long)] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    val out = Seq.newBuilder[(String, Long)]
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (f.isFile && !name.startsWith("_") && !name.startsWith("."))
        out += ((f.getPath.toString, f.getLen))
    }
    out.result()
  }

  /** Target output file count for a byte footprint. */
  def targetFileCount(totalBytes: Long, targetFileBytes: Long): Int = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
  }

  def compactParquet(
      spark: SparkSession,
      srcPath: String,
      destPath: String,
      targetFileBytes: Long = 128L * 1024 * 1024,
      shuffle: Boolean = false): CompactionStats = {
    val before = dataFiles(spark, srcPath)
    val bytesBefore = before.map(_._2).sum
    val n = targetFileCount(bytesBefore, targetFileBytes)

    val df = spark.read.parquet(srcPath)
    val repacked = if (shuffle) df.repartition(n) else df.coalesce(n)
    repacked.write.mode("overwrite").parquet(destPath)

    val after = dataFiles(spark, destPath)
    CompactionStats(
      filesBefore = before.size,
      bytesBefore = bytesBefore,
      filesAfter = after.size,
      bytesAfter = after.map(_._2).sum,
      rows = spark.read.parquet(destPath).count())
  }
}
