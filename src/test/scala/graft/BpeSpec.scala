package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bpe

/** Goldens for BPE merge training and the dictionary-join encode:
  * hand-computed merge tables, greedy same-symbol-run semantics, the
  * deterministic tie-break, multi-char merge chains, and the OOV
  * char-fallback. The replace-semantics cases pin exactly the
  * behavior the DuckDB oracle chain (q202/q203) relies on. */
class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  test("train: hand-computed two-round merge table") {
    // Words: "abab" ×2, "ab" ×1 → pairs r1: (a,b) 5, (b,a) 2.
    // Merge (a,b): "abab"→[ab,ab], "ab"→[ab].
    // r2: (ab,ab) count 2.
    val m = Bpe.train(corpus("abab abab ab"), "text", numMerges = 2)
    assert(m.merges === Seq(
      Bpe.Merge(1, "a", "b", 5L),
      Bpe.Merge(2, "ab", "ab", 2L)))
  }

  test("train: same-symbol run merges leftmost-greedy (the replace rule)") {
    // "aaaa": pairs (a,a) ×3 (overlapping count). Merge 1 → [aa,aa]
    // (greedy, NOT [a,aa,a]); merge 2 (aa,aa) count 1 → [aaaa].
    val m = Bpe.train(corpus("aaaa"), "text", numMerges = 2)
    assert(m.merges === Seq(
      Bpe.Merge(1, "a", "a", 3L),
      Bpe.Merge(2, "aa", "aa", 1L)))
    // "aaa" greedy → [aa, a]: the 3-run leaves a singleton.
    val m3 = Bpe.train(corpus("aaa"), "text", numMerges = 2)
    assert(m3.merges === Seq(
      Bpe.Merge(1, "a", "a", 2L),
      Bpe.Merge(2, "aa", "a", 1L)))
  }

  test("train: argmax ties break (count desc, lhs, rhs)") {
    // "ba" and "ab": pairs (b,a) 1 and (a,b) 1 — tie on count,
    // lexicographic (a,b) wins.
    val m = Bpe.train(corpus("ba ab"), "text", numMerges = 1)
    assert(m.merges === Seq(Bpe.Merge(1, "a", "b", 1L)))
  }

  test("train: frequency weighting uses word counts, not distinct words") {
    // "cd" appears 3×, "ce" 1× → (c,d) 3 beats (c,e) 1.
    val m = Bpe.train(corpus("cd cd ce", "cd"), "text", numMerges = 1)
    assert(m.merges === Seq(Bpe.Merge(1, "c", "d", 3L)))
  }

  test("train: exhausts early when every word is one symbol") {
    // Single-char words have no pairs after round 1 merges "ab".
    val m = Bpe.train(corpus("ab x y"), "text", numMerges = 5)
    assert(m.merges === Seq(Bpe.Merge(1, "a", "b", 1L)))
  }

  test("train: merged pair never straddles a symbol boundary") {
    // After merging (a,l), a pattern (l,r) must not match the tail
    // of symbol "al" followed by "r": corpus "al alr lr lr".
    // r1 pairs: (a,l) 2, (l,r) 3 → (l,r) wins first. Then r2:
    // "al"→(a,l) 1... wait "alr"→[a,lr] has pair (a,lr) 1.
    // Counts r2: (a,l) 1 (from "al"), (a,lr) 1 (from "alr") → tie on
    // count, (a,l) < (a,lr) lexicographically.
    val m = Bpe.train(corpus("al alr lr lr"), "text", numMerges = 2)
    assert(m.merges === Seq(
      Bpe.Merge(1, "l", "r", 3L),
      Bpe.Merge(2, "a", "l", 1L)))
  }

  test("encodeReport: token counts, chars, floor-grid compression") {
    val docs = corpus("abab abab ab", "abab zz")
    val model = Bpe.train(docs, "text", numMerges = 2)
    // Final vocab: abab→[abab] (1 tok), ab→[ab] (1 tok), zz→[z,z].
    val rows = Bpe.encodeReport(docs, "doc_id", "text", model)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(rows(0) === ((0L, 3L, 10L, 3L, math.floor(10.0 / 3.0 * 1e6) / 1e6)))
    assert(rows(1) === ((1L, 2L, 6L, 3L, 2.0)))
  }

  test("encodeReport: OOV word falls back to character tokens") {
    val train = corpus("abab abab")
    val model = Bpe.train(train, "text", numMerges = 2)
    val probe = corpus("abab qrs")
    val rows = Bpe.encodeReport(probe, "doc_id", "text", model)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Double)].collect()
    // abab → 1 token; qrs OOV → 3 char tokens. 7 chars / 4 tokens.
    assert(rows(0) === ((0L, 2L, 7L, 4L, math.floor(7.0 / 4.0 * 1e6) / 1e6)))
  }

  test("train: deterministic across repartitionings") {
    val docs = corpus(
      "the cat sat on the mat", "the dog sat", "a cat and a dog")
    val a = Bpe.train(docs.repartition(1), "text", numMerges = 6).merges
    val b = Bpe.train(docs.repartition(7), "text", numMerges = 6).merges
    assert(a === b)
    assert(a.length === 6)
    // Counts strictly positive and ranks sequential.
    assert(a.map(_.rank) === (1 to 6))
    assert(a.forall(_.pairCount > 0))
  }

  test("encode never increases token count as merges accumulate") {
    val docs = corpus(
      "the cat sat on the mat", "the dog sat", "a cat and a dog")
    val tok = (m: Int) => {
      val model = Bpe.train(docs, "text", numMerges = m)
      Bpe.encodeReport(docs, "doc_id", "text", model)
        .agg(org.apache.spark.sql.functions.sum("n_tokens"))
        .as[Long].head()
    }
    val counts = Seq(1, 3, 6).map(tok)
    assert(counts === counts.sorted.reverse)
  }

  test("trainBatched: merge table identical to sequential train; fewer rounds when batches fill") {
    // Rich toy corpus: repeated morphemes create deep merge chains
    // AND independent pairs batching can pick up together.
    val corpus = Seq.fill(20)("the then there herder") ++
      Seq.fill(12)("low lower lowest slow") ++
      Seq.fill(8)("mix of unrelated zq xv pw tokens") ++
      Seq.fill(5)("aaaa bbbb cccc dddd")
    val df = corpus.toDF("text")
    val seqModel = Bpe.train(df, "text", numMerges = 10)
    val (batModel, rounds) = Bpe.trainBatched(df, "text",
      numMerges = 10, batchSize = 4)
    assert(batModel.merges === seqModel.merges)
    assert(rounds <= 10)
    // vocab symbolizations agree too (same merges, same replaces)
    val sv = seqModel.vocab.orderBy("word")
      .as[(String, String, Long)].collect().toSeq
    val bv = batModel.vocab.orderBy("word")
      .as[(String, String, Long)].collect().toSeq
    assert(bv === sv)
    // Independent-pair corpus: distinct-letter two-char words have no
    // (x,l)/(r,y) context at all, so the dominance maxima are vacuous
    // and batches genuinely fill (rounds = ceil(8/4)). (Same-symbol
    // pairs like "aa" can never batch: their own count IS the
    // new-pair bound — the documented conservatism.)
    val ind = Seq.fill(10)("ab cd ef gh ij kl mn op").toDF("text")
    val seqInd = Bpe.train(ind, "text", numMerges = 8)
    val (batInd, rInd) = Bpe.trainBatched(ind, "text",
      numMerges = 8, batchSize = 4)
    assert(batInd.merges === seqInd.merges)
    assert(rInd === 2, s"disjoint context-free pairs should batch: $rInd")
  }

  test("trainBatched: conflict-heavy chain degrades to sequential, stays exact") {
    // 'aaaa...' words force same-symbol chains where every next merge
    // depends on the previous one -> guard must reject batching.
    val df = Seq.fill(6)("aaaaaaaa bbbb").toDF("text")
    val seqModel = Bpe.train(df, "text", numMerges = 5)
    val (batModel, rounds) = Bpe.trainBatched(df, "text",
      numMerges = 5, batchSize = 4)
    assert(batModel.merges === seqModel.merges)
    assert(rounds >= 3, s"chained merges cannot batch freely: $rounds")
  }

  test("trainBatched: re-minted concatenations (l+r already a vocab " +
      "symbol) keep exact sequential parity") {
    // Symbol-run corpora make the same concatenation reachable from
    // DIFFERENT decompositions across rounds ((a,aa) vs (aa,a) both
    // mint 'aaa'; (aa,aaa) vs (aaa,aa) both mint 'aaaaa', ...). A
    // batch accepting a candidate whose concatenation already exists
    // ADDS to live (x,lr) pair counts the dominance bound never saw —
    // the guard must terminate the batch at such a candidate so the
    // next full recount restores exactness. Mixed run lengths +
    // letter mixes + skewed frequencies maximize the chance batches
    // fill with interacting candidates; deep merge counts walk well
    // past the first few re-mint opportunities.
    val words = (2 to 11).flatMap { n =>
      Seq.fill(13 - n)("a" * n) ++ Seq.fill((n % 3) + 1)("b" * n)
    } ++ Seq.fill(7)("aab abb aabb abab") ++
      Seq.fill(4)("ba bab baba abba")
    val df = words.mkString(" ").split(" ").toSeq.toDF("text")
    for (bs <- Seq(3, 8)) {
      val seqModel = Bpe.train(df, "text", numMerges = 24)
      val (batModel, _) = Bpe.trainBatched(df, "text",
        numMerges = 24, batchSize = bs)
      assert(batModel.merges === seqModel.merges,
        s"batchSize=$bs diverged from sequential BPE")
    }
  }
}
