package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Compaction

/** Small-file compaction: file-count math, data fidelity, and the
  * narrow-vs-shuffle repack paths. */
class CompactionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmp(prefix: String): String = {
    val d = Files.createTempDirectory(prefix)
    d.toFile.deleteOnExit()
    d.toString
  }

  test("targetFileCount: ceil semantics, 1 minimum") {
    assert(Compaction.targetFileCount(0L, 100L) === 1)
    assert(Compaction.targetFileCount(100L, 100L) === 1)
    assert(Compaction.targetFileCount(101L, 100L) === 2)
    assert(Compaction.targetFileCount(1000L, 100L) === 10)
  }

  test("compaction merges a fragmented write without losing rows") {
    val src = tmp("cmp_src") + "/docs"
    val dst = tmp("cmp_dst") + "/docs"
    val docs = graft.sources.Tables
      .load(spark, "/root/testdata/sf0.001", "documents")
    docs.repartition(40).write.parquet(src) // fragment: 40 small files

    val stats = Compaction.compactParquet(
      spark, src, dst, targetFileBytes = 512L * 1024)
    assert(stats.filesBefore === 40)
    assert(stats.filesAfter < stats.filesBefore)
    assert(stats.rows === docs.count())
    // Values survive byte-for-byte.
    val a = docs.orderBy("doc_id").collect().toSeq
    val b = spark.read.parquet(dst).orderBy("doc_id").collect().toSeq
    assert(a === b)
  }

  test("shuffle=true rebalances; both paths hit the computed file count") {
    val src = tmp("cmp_src2") + "/docs"
    val docs = graft.sources.Tables
      .load(spark, "/root/testdata/sf0.001", "documents")
    docs.repartition(16).write.parquet(src)

    val narrow = Compaction.compactParquet(
      spark, src, tmp("cmp_n") + "/d", targetFileBytes = 1L << 30)
    val balanced = Compaction.compactParquet(
      spark, src, tmp("cmp_b") + "/d",
      targetFileBytes = 1L << 30, shuffle = true)
    assert(narrow.filesAfter === 1) // whole table under one target file
    assert(balanced.filesAfter === 1)
    assert(narrow.rows === balanced.rows)
  }
}
