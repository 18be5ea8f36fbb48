package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Property test: over random small-vocabulary corpora (dense shingle
  * sharing — the adversarial regime for prefix filtering), the
  * directional containment join equals the brute-force every-pair
  * computation at every threshold. Zero false negatives is the
  * operator's headline claim; this sweeps it across corpus shapes the
  * fixed DedupSpec corpus can't cover. */
class ContainmentPropSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val corpusGen: Gen[List[(Long, String)]] = for {
    vocabSize <- Gen.choose(6, 14) // tiny vocab → heavy shingle overlap
    docs <- Gen.listOfN(25, for {
      id <- Gen.choose(0L, 500L)
      n <- Gen.choose(1, 18) // includes sub-shingle-size docs
      toks <- Gen.listOfN(n, Gen.choose(0, vocabSize - 1))
    } yield (id, toks.map(t => s"w$t").mkString(" ")))
  } yield docs.distinctBy(_._1)

  test("containmentJoin equals brute force across random corpora and thresholds") {
    for (seedNo <- 1L to 8L) {
      val docs = corpusGen(Gen.Parameters.default, Seed(seedNo)).get
      val df = docs.toDF("doc_id", "text")
      val sh = Dedup.shingles(df, "doc_id", "text", 3)
        .as[(Long, String)].collect().groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
      for (t <- Seq(0.34, 0.6, 0.85, 1.0)) {
        val brute = (for {
          a <- sh.keys; b <- sh.keys if a != b
          inter = (sh(a) & sh(b)).size
          if inter.toDouble / sh(a).size >= t
        } yield (a, b, inter.toLong)).toSet
        val got = Dedup.containmentJoin(df, "doc_id", "text", t, 3)
          .select("doc", "container", "n_common")
          .as[(Long, Long, Long)].collect().toSet
        assert(got === brute, s"seed $seedNo threshold $t")
      }
    }
  }
}
