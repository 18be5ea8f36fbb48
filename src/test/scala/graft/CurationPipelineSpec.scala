package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Packing, Sampling, TextAnalysis}

/** End-to-end curation pipeline over the real sf0.001 corpus: exact
  * dedup → near-dup cluster dedup → quality floor → temperature
  * mixture → interleave order → sequence packing. Each stage is
  * individually oracle-gated; this spec proves they COMPOSE — the
  * invariants a production curation run would assert before shipping
  * a training shard. */
class CurationPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("dedup -> filter -> mixture -> interleave -> pack composes with sound invariants") {
    val docs = graft.sources.Tables.load(spark, dir, "documents")
    val n0 = docs.count()

    // 1. exact dedup: keep min-id representative per content hash
    val exact = Dedup.exact(docs, "text", "doc_id").select("doc_id")
    val afterExact = docs.join(exact, "doc_id")
    val n1 = afterExact.count()
    assert(n1 <= n0 && n1 > 0)

    // 2. near-dup cluster dedup: drop non-representatives
    val cand = Dedup.minhashCandidates(
      afterExact, "doc_id", "text", numHashes = 8, rowsPerBand = 2,
      shingleSize = 3)
    val strong = cand.where(col("est_jaccard") >= 0.7)
      .select(col("doc_a"), col("doc_b"))
    val clusters = Dedup.nearDupClusters(strong)
    val drops = clusters.where(col("id") =!= col("cluster")).select("id")
    val afterNear = afterExact.join(
      drops.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left_anti")
    val n2 = afterNear.count()
    assert(n2 <= n1 && n2 > 0)

    // 3. quality floor: at least 10 whitespace tokens
    val stats = TextAnalysis.vocabularyRichness(
      afterNear.withColumn("grp", lit("all")), "grp", "text")
    val totalTokens = stats.select("n_tokens").as[Long].head()
    val afterQuality = afterNear
      .where(size(split(col("text"), " ")) >= 10)
    val n3 = afterQuality.count()
    assert(n3 <= n2 && n3 > 0)

    // 4. temperature mixture: exactly 100 docs, sqrt-scaled budgets
    val picked = Sampling.temperatureMixture(
      afterQuality.select("source", "doc_id", "n_chars"),
      "source", "doc_id", "n_chars", totalK = 100)
    assert(picked.count() === 100L)
    val pickedDocs = afterQuality.join(picked.select("doc_id"), "doc_id")
    assert(pickedDocs.count() === 100L) // picks reference real rows

    // 5. interleave: dense 1..100 emission order, round-robin by pos
    val ordered = Sampling.interleaveOrder(pickedDocs, "source", "doc_id")
    val positions = ordered.select("global_pos").as[Long]
      .collect().sorted.toSeq
    assert(positions === (1L to 100L))
    val rows = ordered.select("pos", "source", "doc_id", "global_pos")
      .as[(Long, String, Long, Long)].collect()
      .sortBy(_._4)
    assert(rows.map(r => (r._1, r._2, r._3)) ===
      rows.map(r => (r._1, r._2, r._3)).sorted,
      "emission order must be lexicographic in (pos, source, doc_id)")

    // 6. pack the final shard: spans partition each source's stream
    val packed = Packing.concatChunks(
      pickedDocs, "source", "doc_id", "text", budget = 256)
    val spans = packed
      .select("source", "doc_id", "n_tokens", "tok_start")
      .as[(String, Long, Long, Long)].collect()
    spans.groupBy(_._1).foreach { case (_, ss) =>
      var cursor = 0L
      ss.sortBy(_._2).foreach { case (_, _, n, start) =>
        assert(start === cursor); cursor += n
      }
    }
    val packedTokens = packed.agg(sum("n_tokens")).as[Long].head()
    assert(packedTokens <= totalTokens)
    assert(packedTokens ===
      pickedDocs.select(size(split(col("text"), " ")).cast("long"))
        .as[Long].collect().sum)
  }
}
