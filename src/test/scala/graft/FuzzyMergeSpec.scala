package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Fuzzy, Merge}

/** Goldens for blocked fuzzy matching and changelog merge. */
class FuzzyMergeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("blockedPairs: matches within block only, excludes exact dups") {
    val df = Seq(
      (1L, "old gear"), (2L, "cold gear"), // dist 1, same block
      (3L, "old gear"), // exact dup of 1 -> excluded (dist 0)
      (4L, "old ring"), // other block: never compared to 1 or 2
      (5L, "bold ring") // dist 1 from 4 within 'ring'
    ).toDF("id", "nm")
    val out = Fuzzy.blockedPairs(df, "id", "nm",
        blockKey = element_at(split(col("nm"), " "), -1), maxDist = 2)
      .select("id_a", "id_b", "dist")
      .as[(Long, Long, Int)].collect().toSet
    assert(out === Set((1L, 2L, 1), (2L, 3L, 1), (4L, 5L, 1)))
  }

  test("applyChangelog: upsert replaces, insert adds, delete removes") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val changes = Seq(
      (2L, "B", "U"), // update
      (4L, "d", "U"), // insert
      (3L, "c", "D") // delete
    ).toDF("k", "v", "op")
    val out = Merge.applyChangelog(base, changes, Seq("k"), "op")
      .as[(Long, String)].collect().toSet
    assert(out === Set((1L, "a"), (2L, "B"), (4L, "d")))
  }

  test("compactChangelog keeps latest-by-sequence per key") {
    val changes = Seq(
      (1L, "x", "U", 1L), (1L, "y", "U", 2L), // y wins
      (2L, "z", "U", 5L), (2L, "gone", "D", 6L) // delete wins
    ).toDF("k", "v", "op", "seq")
    val compact = Merge.compactChangelog(changes, Seq("k"), "seq")
    val out = compact.select("k", "v", "op").as[(Long, String, String)]
      .collect().toSet
    assert(out === Set((1L, "y", "U"), (2L, "gone", "D")))
    // end-to-end: apply the compacted log
    val base = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val applied = Merge.applyChangelog(base, compact.drop("seq"), Seq("k"), "op")
      .as[(Long, String)].collect().toSet
    assert(applied === Set((1L, "y")))
  }
}
