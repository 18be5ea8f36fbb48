package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Packing

/** Goldens for concat-and-chunk sequence packing: hand-computed token
  * spans, chunk ids, boundary straddles, and the per-shard report. */
class PackingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // One shard: docs of 3, 4, 2, 6 tokens; budget 5.
  // Stream: [0,3) [3,7) [7,9) [9,15) → chunks 0:[0,5) 1:[5,10) 2:[10,15)
  private val docs = Seq(
    ("s1", 1L, "a b c"),           // [0,3)  chunk 0
    ("s1", 2L, "d e f g"),         // [3,7)  chunks 0-1 (straddles)
    ("s1", 3L, "h i"),             // [7,9)  chunk 1
    ("s1", 4L, "j k l m n o"),     // [9,15) chunks 1-2 (straddles)
    ("s2", 1L, "x y z")            // [0,3)  chunk 0 of its own stream
  ).toDF("source", "doc_id", "text")

  test("concatChunks: spans, chunk ids, straddle counts") {
    val out = Packing.concatChunks(docs, "source", "doc_id", "text", 5)
      .select("source", "doc_id", "n_tokens", "tok_start",
        "chunk_first", "chunk_last", "n_chunks")
      .as[(String, Long, Long, Long, Long, Long, Long)]
      .collect().toSet
    assert(out === Set(
      ("s1", 1L, 3L, 0L, 0L, 0L, 1L),
      ("s1", 2L, 4L, 3L, 0L, 1L, 2L),
      ("s1", 3L, 2L, 7L, 1L, 1L, 1L),
      ("s1", 4L, 6L, 9L, 1L, 2L, 2L),
      ("s2", 1L, 3L, 0L, 0L, 0L, 1L)))
  }

  test("concatChunks: doc exactly filling a chunk does not straddle") {
    val exact = Seq(("s", 1L, "a b c d e"), ("s", 2L, "f g"))
      .toDF("source", "doc_id", "text")
    val out = Packing.concatChunks(exact, "source", "doc_id", "text", 5)
      .select("doc_id", "chunk_first", "chunk_last")
      .as[(Long, Long, Long)].collect().toSet
    assert(out === Set((1L, 0L, 0L), (2L, 1L, 1L)))
  }

  test("concatChunks: NULL text is a zero-token doc, spans stay sound") {
    val withNull = Seq(
      ("s", 1L, Some("a b c")), ("s", 2L, None), ("s", 3L, Some("d e"))
    ).toDF("source", "doc_id", "text")
    val out = Packing.concatChunks(withNull, "source", "doc_id", "text", 4)
      .select("doc_id", "n_tokens", "tok_start", "chunk_first",
        "chunk_last", "n_chunks")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(out === Set(
      (1L, 3L, 0L, 0L, 0L, 1L),
      // the zero-width span sits at cursor 3 inside chunk 0, spans
      // ZERO chunks — and crucially does NOT shift doc 3's span (a
      // -1 token count from bare size(split(NULL)) would have)
      (2L, 0L, 3L, 0L, 0L, 0L),
      (3L, 2L, 3L, 0L, 1L, 2L)))
    // zero-token doc whose cursor sits EXACTLY on a chunk boundary:
    // chunk ids pin to the cursor's chunk (never negative / one
    // short), n_chunks stays 0
    val atBoundary = Seq(
      ("s", 1L, Some("a b c d")), ("s", 2L, None)
    ).toDF("source", "doc_id", "text")
    val b = Packing.concatChunks(atBoundary, "source", "doc_id", "text", 4)
      .where(col("doc_id") === 2L)
      .select("tok_start", "chunk_first", "chunk_last", "n_chunks")
      .as[(Long, Long, Long, Long)].collect().head
    assert(b === ((4L, 1L, 1L, 0L)))
  }

  test("packingReport: chunk count, tail padding, split docs") {
    val out = Packing.packingReport(docs, "source", "doc_id", "text", 5)
      .select("source", "n_docs", "total_tokens", "n_chunks",
        "pad_tokens", "split_docs")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    assert(out === Set(
      ("s1", 4L, 15L, 3L, 0L, 2L),
      ("s2", 1L, 3L, 1L, 2L, 0L)))
  }
}
