package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Packing

/** Property test: for ANY corpus and budget, concat-and-chunk spans
  * exactly partition each shard's token stream (contiguous, gapless,
  * in doc order), chunk ids are the floor-division of span edges, and
  * the report's invariants (chunk count, padding < budget, straddle
  * count) follow. Raw ScalaCheck Gen with fixed seeds, matching
  * FlattenPropSpec's offline-cache approach. */
class PackingPropSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val corpusGen: Gen[(List[(String, Long, String)], Int)] = for {
    nSrc <- Gen.choose(1, 4)
    budget <- Gen.choose(1, 40)
    docs <- Gen.listOfN(30, for {
      src <- Gen.choose(0, nSrc - 1)
      id <- Gen.choose(0L, 10000L)
      nTok <- Gen.choose(1, 25)
    } yield (s"s$src", id, List.fill(nTok)("w").mkString(" ")))
  } yield (docs.distinctBy(d => (d._1, d._2)), budget)

  test("concatChunks spans partition each shard stream; report invariants hold") {
    for (seedNo <- 1L to 12L) {
      val (docs, budget) = corpusGen(
        Gen.Parameters.default, Seed(seedNo)).get
      val df = docs.toDF("source", "doc_id", "text")
      val out = Packing.concatChunks(df, "source", "doc_id", "text", budget)
        .select("source", "doc_id", "n_tokens", "tok_start",
          "chunk_first", "chunk_last", "n_chunks")
        .as[(String, Long, Long, Long, Long, Long, Long)]
        .collect().toSeq
      out.groupBy(_._1).foreach { case (_, rows) =>
        val ordered = rows.sortBy(_._2)
        // spans are contiguous from 0 in doc-id order
        var cursor = 0L
        ordered.foreach { case (_, _, n, start, cf, cl, nc) =>
          assert(start === cursor, s"seed $seedNo: gap at $start")
          assert(cf === start / budget)
          assert(cl === (start + n - 1) / budget)
          assert(nc === cl - cf + 1)
          cursor += n
        }
      }
      val rep = Packing.packingReport(df, "source", "doc_id", "text", budget)
        .select("source", "n_docs", "total_tokens", "n_chunks",
          "pad_tokens", "split_docs")
        .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
      val byndocs = out.groupBy(_._1)
      rep.foreach { case (src, nDocs, total, nChunks, pad, splits) =>
        val rows = byndocs(src)
        assert(nDocs === rows.size)
        assert(total === rows.map(_._3).sum)
        assert(nChunks === (total + budget - 1) / budget)
        assert(pad === nChunks * budget - total)
        assert(pad >= 0 && pad < budget)
        assert(splits === rows.count(_._7 > 1))
      }
    }
  }
}
