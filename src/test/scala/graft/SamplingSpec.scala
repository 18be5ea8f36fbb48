package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sampling

/** Goldens + plan shape for the deterministic per-key cap. */
class SamplingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus = (1L to 200L).map(i =>
    (i, s"src${i % 4}")).toDF("doc_id", "source")

  test("capPerKey: exactly k rows per key, ranks 1..k, deterministic") {
    val out = Sampling.capPerKey(corpus, "source", "doc_id", k = 7)
    val perKey = out.groupBy("source").count().as[(String, Long)]
      .collect().toMap
    assert(perKey.values.toSet === Set(7L))
    val ranks = out.groupBy("source")
      .agg(sort_array(collect_list("pick_rank")).as("r"))
      .as[(String, Seq[Int])].collect()
    ranks.foreach { case (_, r) => assert(r === (1 to 7)) }
    // Deterministic across runs: same kept set both times.
    val a = out.select("doc_id").as[Long].collect().toSet
    val b = Sampling.capPerKey(corpus, "source", "doc_id", k = 7)
      .select("doc_id").as[Long].collect().toSet
    assert(a === b)
  }

  test("capPerKey: keys under the cap keep everything; hash order is not id order") {
    val out = Sampling.capPerKey(corpus, "source", "doc_id", k = 1000)
    assert(out.count() === 200)
    // With a real cap, the kept set must not be the lowest-id prefix
    // (that would mean selection correlates with ingestion order).
    val kept = Sampling.capPerKey(corpus, "source", "doc_id", k = 5)
      .where(col("source") === "src0")
      .select("doc_id").as[Long].collect().toSet
    val prefix = corpus.where(col("source") === "src0")
      .orderBy("doc_id").limit(5).select("doc_id").as[Long].collect().toSet
    assert(kept !== prefix)
  }

  test("capPerKey plans a WindowGroupLimit (map-side top-k before the exchange)") {
    val plan = Sampling.capPerKey(corpus, "source", "doc_id", k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"))
  }

  test("capAudit matches an actual capPerKey pass") {
    val audit = Sampling.capAudit(corpus, "source", k = 7)
      .as[(String, Long, Long, Double)].collect()
      .map { case (s, n, kept, share) => s -> ((n, kept, share)) }.toMap
    val actual = Sampling.capPerKey(corpus, "source", "doc_id", k = 7)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    audit.foreach { case (s, (n, kept, share)) =>
      assert(kept === actual(s))
      assert(n === 50L)
      assert(share === math.rint(kept.toDouble / n * 1e6) / 1e6)
    }
  }
}
