package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.UnigramLm

/** T60 goldens: Viterbi segmentation determinism (incl. the
  * prefer-longer tie rule the oracle's (score DESC, l DESC) argmax
  * replays), monotone accepted-round log-likelihood, zero-count
  * pruning, the maxWordLen training regime, and rerun determinism. */
class UnigramLmSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  test("viterbi: best path, prefer-longer tie rule, unreachable None") {
    val lp = Map("a" -> -10L, "b" -> -10L, "ab" -> -15L, "abc" -> -18L,
      "c" -> -12L)
    // "abc": char path -32, ab+c -27, abc -18 -> abc wins
    assert(UnigramLm.viterbi("abc", 3, lp) ===
      Some((-18L, List("abc"))))
    // tie: "ab" via a+b = -20 vs "ab" = -15 -> no tie; force one:
    val tie = Map("a" -> -10L, "b" -> -10L, "ab" -> -20L)
    // a+b = -20 == ab = -20: prefer the LONGER piece at the position
    assert(UnigramLm.viterbi("ab", 2, tie) ===
      Some((-20L, List("ab"))))
    // unreachable: missing char
    assert(UnigramLm.viterbi("ax", 2, Map("a" -> -1L)).isEmpty)
  }

  test("train: deterministic, monotone accepted LL, pruning drops " +
      "unused seeds, maxWordLen excludes long words") {
    val c = corpus(
      "abab abab cd cd cd ababcd",
      "abab cd abab extraordinarilylong",
      "ab ab cd abab")
    val m = UnigramLm.train(c, "text", seedMaxPieceLen = 4,
      multiKeep = 8, maxWordLen = 12, minCount = 2L, rounds = 3)
    // trace: rounds contiguous from 1, LL strictly increasing
    assert(m.trace.nonEmpty)
    assert(m.trace.map(_.round) === (1 to m.trace.size))
    m.trace.map(_.llMicro).sliding(2).foreach {
      case Seq(a, b) => assert(b > a, s"LL must strictly improve: ${m.trace}")
      case _ => ()
    }
    // the 16-char word is excluded from training: no piece of the
    // final model is a substring seen only there
    assert(!m.pieces.exists(_.piece.contains("x")))
    assert(!m.pieces.exists(_.piece.contains("l")))
    // every surviving piece has a positive Viterbi count
    assert(m.pieces.forall(_.count > 0L))
    // ranks are (count desc, piece asc)
    val resorted = m.pieces.sortBy(p => (-p.count, p.piece))
    assert(m.pieces === resorted)
    // "abab"-heavy corpus: a multi-char piece must survive training
    assert(m.pieces.exists(_.piece.length >= 2),
      s"expected multi-char pieces, got ${m.pieces}")
    // determinism
    val again = UnigramLm.train(c, "text", seedMaxPieceLen = 4,
      multiKeep = 8, maxWordLen = 12, minCount = 2L, rounds = 3)
    assert(again.pieces === m.pieces && again.trace === m.trace)
  }

  test("train (r15 ADVICE): empty vocabulary fails fast with a " +
      "descriptive message, not an opaque empty.max") {
    // whitespace-only corpus
    val blank = intercept[IllegalArgumentException] {
      UnigramLm.train(corpus("   ", "\t  "), "text")
    }
    assert(blank.getMessage.contains("no trainable words"))
    // every word longer than maxWordLen
    val long = intercept[IllegalArgumentException] {
      UnigramLm.train(
        corpus("extraordinarilylong anotherverylongword"), "text",
        maxWordLen = 12)
    }
    assert(long.getMessage.contains("maxWordLen=12"))
  }

  test("encodeNbest (T62): nBest=1 reduces bit-identically to the " +
      "q333 encoder; rank 1 is the Viterbi path; sampled >= best; " +
      "multi-candidate words counted; deterministic") {
    val c = corpus(
      "abab abab cd cd cd ababcd",
      "abab cd abab extraordinarilylong",
      "ab ab cd abab xq")
    val m = UnigramLm.train(c, "text",
      seedMaxPieceLen = 4, multiKeep = 8, maxWordLen = 12,
      minCount = 2L, rounds = 3)
    val docs = c
    // nBest = 1: best == sampled == the plain encoder's n_tokens,
    // for every document
    val plain = UnigramLm.encode(docs, "doc_id", "text", m)
      .select("doc_id", "n_tokens").as[(Long, Long)]
      .collect().toMap
    val one = UnigramLm.encodeNbest(docs, "doc_id", "text", m,
        nBest = 1, seed = 7L)
      .as[(Long, Long, Long, Long, Long)].collect()
    for ((id, _, best, sampled, multi) <- one) {
      assert(best === plain(id), s"doc $id best vs viterbi")
      assert(sampled === best, s"doc $id nBest=1 must sample rank 1")
      assert(multi === 0L)
    }
    // rank 1 IS the Viterbi path (not just the same count): the
    // enumeration tiebreak (score DESC, reversed-length digits DESC)
    // unrolls viterbi's prefer-longer backtrack
    val lp = m.pieces.map(p => p.piece -> p.logpMicro).toMap
    val maxL = m.pieces.map(_.piece.length).max
    for (w <- Seq("abab", "ababcd", "cd", "ab", "abcd")) {
      val vit = UnigramLm.viterbi(w, maxL, lp)
      val segs = UnigramLm.allSegmentations(w, maxL, lp)
      if (vit.isEmpty) assert(segs.isEmpty, s"word $w")
      else {
        val best = segs.sortBy { case (sc, tb) => (-sc, tb) }(
          Ordering.Tuple2(Ordering.Long, Ordering.String.reverse))
          .head
        assert(best._1 === vit.get._1, s"word $w score")
        assert(best._2 ===
          vit.get._2.reverse.map(_.length).mkString(""),
          s"word $w path")
      }
    }
    // nBest = 4: sampled is never below the Viterbi floor, and the
    // regularization surface is visible (some word has >1 candidate)
    val four = UnigramLm.encodeNbest(docs, "doc_id", "text", m,
        nBest = 4, seed = 7L)
      .as[(Long, Long, Long, Long, Long)].collect()
    four.foreach { case (id, _, best, sampled, _) =>
      assert(sampled >= best, s"doc $id sampled below Viterbi floor")
      assert(best === plain(id))
    }
    assert(four.map(_._5).sum > 0L, "no multi-candidate words seen")
    // determinism
    val again = UnigramLm.encodeNbest(docs, "doc_id", "text", m,
        nBest = 4, seed = 7L)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(again.sortBy(_._1).toSeq === four.sortBy(_._1).toSeq)
  }

  test("encode: dictionary-join counts match per-word Viterbi; " +
      "long words char-fallback; compression on the floor grid") {
    val c = corpus(
      "abab abab cd cd",
      "abab cd extraordinarilylong",
      "ab cd abab")
    val m = UnigramLm.train(c, "text", seedMaxPieceLen = 4,
      multiKeep = 8, maxWordLen = 12, minCount = 2L, rounds = 3)
    val lp = m.pieces.map(p => p.piece -> p.logpMicro).toMap
    val maxL = m.pieces.map(_.piece.length).max
    def tokOf(w: String): Long =
      if (w.length > 12) w.length.toLong
      else UnigramLm.viterbi(w, maxL, lp)
        .map(_._2.size.toLong).getOrElse(w.length.toLong)
    val got = UnigramLm.encode(c, "doc_id", "text", m, maxWordLen = 12)
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    val docs = Seq(
      0L -> "abab abab cd cd", 1L -> "abab cd extraordinarilylong",
      2L -> "ab cd abab")
    for ((id, text) <- docs) {
      val ws = text.split("\\s+").filter(_.nonEmpty)
      val chars = ws.map(_.length.toLong).sum
      val toks = ws.map(tokOf).sum
      val r = got(id)
      assert(r._2 === ws.length.toLong && r._3 === chars &&
        r._4 === toks, s"doc $id: $r")
      assert(r._5 ===
        math.floor(chars.toDouble / toks.toDouble * 1e6) / 1e6)
    }
    // the 19-char word fell back to char count (tokens = chars)
    assert(tokOf("extraordinarilylong") === 19L)
  }

  test("train: EM re-estimation concentrates mass — after round 1 " +
      "the dominant multi-char piece's count reflects its Viterbi " +
      "usage, not its raw substring occurrences") {
    // 'ababab' x4: seed count of 'ab' counts overlapping substring
    // positions (3 per word), Viterbi usage is exactly 3 per word
    // too, but 'ba' (2 per word raw) gets ZERO Viterbi usage and
    // must be pruned from the final model.
    val m = UnigramLm.train(corpus("ababab ababab ababab ababab"),
      "text", seedMaxPieceLen = 2, multiKeep = 4, maxWordLen = 12,
      minCount = 2L, rounds = 3)
    assert(!m.pieces.exists(_.piece == "ba"),
      s"'ba' is never on a best path and must be pruned: ${m.pieces}")
    val ab = m.pieces.find(_.piece == "ab")
    assert(ab.nonEmpty && ab.get.count === 12L,
      s"'ab' used 3x in each of 4 words: ${m.pieces}")
  }
  test("encodeNbestAlpha (T65): huge α degenerates to Viterbi, " +
      "α = 0 weights uniformly, shift count is monotone " +
      "nonincreasing in α; weight table endpoints; deterministic") {
    val c = corpus(
      "abab abab cd cd cd ababcd",
      "abab cd abab extraordinarilylong",
      "ab ab cd abab xq")
    val m = UnigramLm.train(c, "text",
      seedMaxPieceLen = 4, multiKeep = 8, maxWordLen = 12,
      minCount = 2L, rounds = 3)
    def run(alphaMilli: Long) =
      UnigramLm.encodeNbestAlpha(c, "doc_id", "text", m,
          nBest = 4, seed = 9L, alphaMilli = alphaMilli)
        .as[(Long, Long, Long, Long, Long, Long)].collect()
        .sortBy(_._1)
    // α → ∞: every non-best weight rounds to 0, so the draw IS the
    // Viterbi path — sampled == best, zero shifts
    val sharp = run(100000000L)
    sharp.foreach { case (id, _, best, sampled, _, shifted) =>
      assert(sampled === best, s"doc $id sharp α must take rank 1")
      assert(shifted === 0L)
    }
    // the Viterbi floor holds at every α, and the multi-candidate
    // surface matches encodeNbest's
    val mid = run(500L)
    val flat = run(0L)
    val uni = UnigramLm.encodeNbest(c, "doc_id", "text", m,
        nBest = 4, seed = 9L)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    for (((f, u), s2) <- flat.zip(uni).zip(sharp)) {
      assert(f._3 === u._3 && f._5 === u._5, "floor + multi parity")
      assert(f._4 >= f._3 && s2._4 >= s2._3)
    }
    // per fixed (word, seed) the pick is monotone toward rank 1 as
    // α rises, so total shifts are nonincreasing: flat ≥ mid ≥ 0
    assert(flat.map(_._6).sum >= mid.map(_._6).sum)
    assert(mid.map(_._6).sum >= 0L)
    // with 4 candidates per several words, the flat draw must
    // actually leave the Viterbi path somewhere
    assert(flat.map(_._6).sum > 0L, "α = 0 never shifted — fixture" +
      " has no sampling surface")
    // weight table: W(0) = 1e9 exactly, strictly decreasing to a
    // final 0, bounded domain
    val tab = UnigramLm.alphaWeightTable(20000L)
    assert(tab.head === ((0, 1000000000L)))
    assert(tab.last._2 === 0L)
    assert(tab.sliding(2).forall {
      case Seq(a, b) => b._2 <= a._2
      case _ => true
    })
    assert(tab.size === tab.last._1 + 1)
    // determinism
    assert(run(500L).toSeq === mid.toSeq)
  }
}
