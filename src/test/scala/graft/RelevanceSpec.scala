package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relevance

/** Hand-checkable goldens for the corpus-relevance operators
  * (TF-IDF, BM25, token entropy). */
class RelevanceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 3 docs; "cat" in all (idf 0), "dog" in one, "fish" in one.
  private val corpus = Seq(
    (1L, "cat dog dog"),
    (2L, "cat fish"),
    (3L, "cat cat cat")
  ).toDF("doc_id", "text")

  test("termFrequencies: (doc, tok) counts with doc length") {
    val tf = Relevance.termFrequencies(corpus, "doc_id", "text")
      .as[(Long, String, Long, Int)].collect().toSet
    assert(tf === Set(
      (1L, "cat", 1L, 3), (1L, "dog", 2L, 3),
      (2L, "cat", 1L, 2), (2L, "fish", 1L, 2),
      (3L, "cat", 3L, 3)))
  }

  test("tfidf: corpus-wide term weighs zero, rare term wins") {
    val rows = Relevance.tfidfTopK(corpus, "doc_id", "text", k = 1)
      .select("doc_id", "tok", "tfidf")
      .as[(Long, String, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // doc 1: dog tfidf = 2/3 * ln(3/1); cat = 1/3 * ln(3/3) = 0
    assert(rows(1L)._1 === "dog")
    assert(math.abs(rows(1L)._2 - 2.0 / 3 * math.log(3.0)) < 1e-6)
    // doc 2: fish = 1/2 * ln(3)
    assert(rows(2L)._1 === "fish")
    assert(math.abs(rows(2L)._2 - 0.5 * math.log(3.0)) < 1e-6)
    // doc 3: only "cat", tfidf 0, still ranked (top-1 per doc)
    assert(rows(3L)._1 === "cat")
    assert(rows(3L)._2 === 0.0)
  }

  test("bm25: doc with more query-term mass ranks first; non-matching doc absent") {
    val out = Relevance.bm25TopK(corpus, "doc_id", "text",
        terms = Seq("dog", "fish"), k = 10)
      .select("doc_id", "rank", "n_terms", "score")
      .as[(Long, Int, Long, Double)].collect()
    assert(out.map(_._1).toSeq === Seq(1L, 2L)) // doc 3 has neither term
    assert(out.head._2 === 1)
    // hand-computed: idf = ln(1 + (3 - 1 + 0.5)/(1 + 0.5)) = ln(8/3)
    // doc1 dog: tf=2, dl=3, avgdl=8/3
    //   contrib = idf * 2*2.2 / (2 + 1.2*(0.25 + 0.75*3/(8/3)))
    val idf = math.log(1 + 2.5 / 1.5)
    val d1 = idf * (2 * 2.2) / (2 + 1.2 * (0.25 + 0.75 * 3 / (8.0 / 3)))
    assert(math.abs(out(0)._4 - (math.rint(d1 * 1e6) / 1e6)) < 1e-9)
  }

  test("entropy: uniform tokens = ln(n); single repeated token = 0") {
    val docs = Seq(
      (1L, "a b c d"), // uniform over 4 -> ln(4)
      (2L, "x x x x") // degenerate -> 0
    ).toDF("doc_id", "text")
    val e = Relevance.tokenEntropy(docs, "doc_id", "text")
      .select("doc_id", "entropy").as[(Long, Double)].collect().toMap
    assert(math.abs(e(1L) - math.log(4.0)) < 1e-6)
    assert(e(2L) === 0.0)
  }

  test("bigram LM: hand-computed smoothed log-probs; short docs drop out") {
    // Corpus bigrams: d1 -> (a,b),(b,a),(a,b); d2 -> (a,b).
    // C(a,b)=3, C(b,a)=1; C(a)=3, C(b)=1; V = |contexts {a,b}| = 2.
    // P(b|a) = (3+1)/(3+2) = 0.8; P(a|b) = (1+1)/(1+2) = 2/3.
    val docs = Seq(
      (1L, "a b a b"),
      (2L, "a b"),
      (3L, "c") // single token: no bigrams, dropped
    ).toDF("doc_id", "text")
    val out = Relevance.bigramLogProb(docs, "doc_id", "text")
      .as[(Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out.keySet === Set(1L, 2L))
    val d1avg = (2 * math.log(0.8) + math.log(2.0 / 3)) / 3
    assert(out(1L)._1 === 3L)
    assert(math.abs(out(1L)._2 - d1avg) < 1e-6)
    assert(math.abs(out(1L)._3 - math.exp(-d1avg)) < 1e-5)
    assert(out(2L)._1 === 1L)
    assert(math.abs(out(2L)._2 - math.log(0.8)) < 1e-6)
    assert(math.abs(out(2L)._3 - 1.25) < 1e-6)
  }

  test("pmiCollocations: hand-computed PMI; minCount floors one-off pairs") {
    // tokens: x×3 y×2 z×1 (N=6); bigrams: (x,y)×2 (x,z)×1 (N2=3).
    val docs = Seq((1L, "x y"), (2L, "x y"), (3L, "x z"))
      .toDF("doc_id", "text")
    val out = Relevance.pmiCollocations(docs, "text", minCount = 2)
      .as[(String, String, Long, Double)].collect().toSeq
    // pmi(x,y) = ln((2/3) / ((3/6)·(2/6))) = ln 4; (x,z) floored out,
    // but its count still lands in N2.
    assert(out === Seq(("x", "y", 2L, math.rint(math.log(4.0) * 1e6) / 1e6)))
  }

  test("cooccurrencePairs: hand-computed lift; Apriori prune; within-doc dedup") {
    // docs: {x,y} {x,y} {x,z} {y} — df: x=3, y=3, z=1 (n=4).
    // Pairs among support>=2 tokens: (x,y) in 2 docs.
    // lift(x,y) = (2·4)/(3·3) = 8/9. z pruned before pairing.
    val docs = Seq(
      (1L, "x y x"), // repeated x counts once (set semantics)
      (2L, "y x"), (3L, "x z"), (4L, "y")).toDF("doc_id", "text")
    val out = Relevance.cooccurrencePairs(docs, "doc_id", "text", 2L)
      .as[(String, String, Long, Long, Long, Double)].collect().toSeq
    assert(out === Seq(("x", "y", 2L, 3L, 3L,
      math.rint(8.0 / 9.0 * 1e6) / 1e6)))
    // minSupport above every pair count -> empty, not an error.
    assert(Relevance.cooccurrencePairs(docs, "doc_id", "text", 3L)
      .count() === 0)
  }

  test("vocabCoverage: hand-computed curve; rank ties break by token") {
    // Occurrences: a×5, b×3, c×1, d×1 (total 10). Ranked: a(.5),
    // b(.8), c(.9), d(1.0) — c before d on the token tiebreak.
    val docs = Seq((1L, "a a a b b"), (2L, "a a b c d")).toDF("doc_id", "text")
    val out = Relevance.vocabCoverage(docs, "text",
        targets = Seq(0.5, 0.6, 0.9, 1.0))
      .orderBy("target")
      .as[(Double, Long, Double)].collect().toSeq
    assert(out === Seq(
      (0.5, 1L, 0.5), (0.6, 2L, 0.8), (0.9, 3L, 0.9), (1.0, 4L, 1.0)))
  }

  test("rrfFuse: both-lists doc wins; 1/61 beats 1/62; per-list ranks surface") {
    val a = Seq((1L, 1), (2L, 2)).toDF("doc_id", "rank")
    val b = Seq((2L, 1), (3L, 2)).toDF("doc_id", "rank")
    val out = Relevance.rrfFuse(Seq("a" -> a, "b" -> b), "doc_id", k = 3)
      .select("doc_id", "a_rank", "b_rank", "rank", "rrf_score")
      .as[(Long, Option[Int], Option[Int], Int, Double)].collect()
      .map(r => r._1 -> r).toMap
    // doc 2 in both lists: 1/(60+2) + 1/(60+1) = 0.032522 — rank 1
    assert(out(2L)._2 === Some(2) && out(2L)._3 === Some(1))
    assert(out(2L)._4 === 1 && out(2L)._5 === 0.032522)
    // doc 1 only in a at rank 1 (1/61 = 0.016393) beats doc 3 only
    // in b at rank 2 (1/62 = 0.016129)
    assert(out(1L)._4 === 2 && out(1L)._3 === None)
    assert(out(1L)._5 === 0.016393)
    assert(out(3L)._4 === 3 && out(3L)._2 === None)
    assert(out(3L)._5 === 0.016129)
    intercept[IllegalArgumentException] {
      Relevance.rrfFuse(Seq("a" -> a), "doc_id", k = 3)
    }
  }

  test("rakeKeyphrases: degree/frequency scores, phrase boundaries, dedup") {
    // phrases: d1 "big data"/"new oil", d2 "big data"/"big models",
    // d3 "deep learning models". big: freq 3 deg 6 -> 2; models:
    // freq 2 deg 5 -> 2.5; deep/learning: 3.
    val docs = Seq(
      (1L, "big data is the new oil"),
      (2L, "big data and big models"),
      (3L, "deep learning models"),
      (4L, "the and is")            // stopwords only: no phrases
    ).toDF("doc_id", "text")
    val out = Relevance.rakeKeyphrases(docs, "doc_id", "text",
        stopwords = Seq("the", "a", "of", "and", "is", "to"), k = 10)
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out("deep learning models") === ((3L, 1L, 8.5)))
    assert(out("big models") === ((2L, 1L, 4.5)))
    assert(out("big data") === ((2L, 2L, 4.0)))
    assert(out("new oil") === ((2L, 1L, 4.0)))
    assert(out.size === 4)
  }

  test("corpusDivergence: hand-computed smoothed KLs and vocab facts") {
    // A tokens: a,a,b (na=3); B tokens: a,c (nb=2); vocab {a,b,c}
    val docs = Seq(("en", "a a b"), ("de", "a c"), ("fr", "zz ignored"))
      .toDF("lang", "text")
    val out = Relevance.corpusDivergence(docs, "lang", "text", "en", "de")
      .as[(Long, Long, Long, Long, Double, Double)].collect().head
    assert(out._1 == 3L && out._2 == 1L && out._3 == 3L && out._4 == 2L)
    // replay the operator's exact arithmetic: smoothed probs, per-term
    // round(12) decimals, exact sum, round(6) double finish
    def t12(p: Double, q: Double): BigDecimal =
      BigDecimal(p * math.log(p / q))
        .setScale(12, BigDecimal.RoundingMode.HALF_UP)
    def pa(c: Long) = (c + 1).toDouble / 6.0 // na + v = 3 + 3
    def pb(c: Long) = (c + 1).toDouble / 5.0 // nb + v = 2 + 3
    def fin(x: BigDecimal): Double =
      BigDecimal(x.toDouble).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble
    // counts over vocab (a, b, c): A = (2,1,0), B = (1,0,1)
    val klAb = fin(t12(pa(2), pb(1)) + t12(pa(1), pb(0)) +
      t12(pa(0), pb(1)))
    val klBa = fin(t12(pb(1), pa(2)) + t12(pb(0), pa(1)) +
      t12(pb(1), pa(0)))
    assert(out._5 == klAb, s"kl_ab ${out._5} vs $klAb")
    assert(out._6 == klBa, s"kl_ba ${out._6} vs $klBa")
    assert(out._5 >= 0.0 && out._6 >= 0.0)
  }
}
