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

  test("capPerBlock bounds every block to its cap lowest ids; 0 = uncapped") {
    // BlockAudit finding (SCALE.md "Fuzzy blocking"): fixed-vocabulary
    // keys make Sum|block|^2 quadratic in the corpus with zero skew to
    // salt away. The cap is the hard bound: keep the `cap` lowest-id
    // rows per block, pairs among dropped rows are knowingly lost.
    val df = Seq(
      (1L, "old gear"), (2L, "cold gear"), (3L, "bold gear"),
      (4L, "old ring"), (5L, "bold ring")
    ).toDF("id", "nm")
    val blk = element_at(split(col("nm"), " "), -1)
    val capped = Fuzzy.jaroWinklerPairs(df, "id", "nm", blk,
        threshold = 0.1, capPerBlock = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // gear block trimmed to {1,2}; ring block {4,5} already <= cap.
    assert(capped === Set((1L, 2L), (4L, 5L)))
    val uncapped = Fuzzy.jaroWinklerPairs(df, "id", "nm", blk,
        threshold = 0.1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(uncapped === Set((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L)))
    val lev = Fuzzy.blockedPairs(df, "id", "nm", blk,
        maxDist = 3, capPerBlock = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lev === Set((1L, 2L), (4L, 5L)))
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

  test("scd2History: no-op repeats collapse; A->B->A reopens; half-open intervals chain") {
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val log = Seq(
      (1L, ts(10), 1L, "A"),
      (1L, ts(20), 2L, "A"), // no-op update: same episode
      (1L, ts(30), 3L, "B"),
      (1L, ts(40), 4L, "A"), // value returns: NEW episode, not merged
      (2L, ts(10), 5L, "X")  // singleton key
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = Merge.scd2History(log, "user_id", "ts", "event_id", "event_type")
      .orderBy("user_id", "version_seq")
      .select("user_id", "version_seq", "event_type", "valid_from",
        "n_updates", "valid_to", "is_current")
      .as[(Long, Long, String, java.sql.Timestamp, Long,
        Option[java.sql.Timestamp], Boolean)]
      .collect().toSeq
    assert(out === Seq(
      (1L, 1L, "A", ts(10), 2L, Some(ts(30)), false),
      (1L, 2L, "B", ts(30), 1L, Some(ts(40)), false),
      (1L, 3L, "A", ts(40), 1L, None, true),
      (2L, 1L, "X", ts(10), 1L, None, true)))
  }

  test("sortedNeighborhood: window parity with brute force; miss beyond window") {
    // 26 docs: b..z differ from their alphabetic neighbor by one
    // trailing token; doc 0 ("a ...") is a near-dup of doc 25 ("z ...")
    // in CONTENT but sorts 25 ranks away — SNM must find neighbors
    // within w and miss the far pair (the documented recall trade).
    val base = "common shared tokens appear here in every document body"
    val docs = (0 until 26).map { i =>
      val c = ('a' + i).toChar
      (i.toLong, s"$c $base tail$i")
    }.toDF("doc_id", "text")
    val out = Fuzzy.sortedNeighborhood(
      docs, "doc_id", "text", substring(col("text"), 1, 40),
      windowSize = 3, threshold = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // brute force: jaccard >= 0.5 pairs whose sort-rank distance <= 3
    // (sort order here = doc_id order since the leading char dominates)
    val sh = (0 until 26).map { i =>
      val w = (s"${('a' + i).toChar} $base tail$i").split(" ")
      i.toLong -> w.sliding(3).map(_.mkString(" ")).toSet
    }.toMap
    val naive = (for {
      a <- 0L until 26L; b <- (a + 1) to math.min(a + 3, 25L)
      inter = (sh(a) & sh(b)).size
      j = inter.toDouble / (sh(a).size + sh(b).size - inter)
      if j >= 0.5
    } yield (a, b)).toSet
    assert(out === naive)
    assert(out.nonEmpty)
    assert(!out.contains((0L, 25L)), "far pair must be missed by design")
  }

  test("snapshotDiff: added/removed/changed/stable; NULLs are null-safe") {
    val old = Seq(
      (1L, Some(10L), Some("a")), // stable
      (2L, Some(20L), Some("b")), // changed (count moves)
      (3L, Some(30L), None),      // stable with a NULL compare col
      (4L, Some(40L), Some("d")), // removed
      (5L, None, Some("e"))       // changed (NULL -> value)
    ).toDF("k", "n", "v")
    val neu = Seq(
      (1L, Some(10L), Some("a")),
      (2L, Some(21L), Some("b")),
      (3L, Some(30L), None),
      (5L, Some(5L), Some("e")),
      (6L, Some(60L), Some("f"))  // added
    ).toDF("k", "n", "v")
    val out = Merge.snapshotDiff(old, neu, "k", Seq("n", "v"))
      .orderBy("k")
      .select("k", "status")
      .as[(Long, String)].collect().toSeq
    assert(out === Seq(
      (1L, "stable"), (2L, "changed"), (3L, "stable"),
      (4L, "removed"), (5L, "changed"), (6L, "added")))
    // Both sides' compare values ride along for downstream filters.
    val changed = Merge.snapshotDiff(old, neu, "k", Seq("n", "v"))
      .where(col("status") === "changed").orderBy("k")
      .select("k", "old_n", "new_n")
      .as[(Long, Option[Long], Option[Long])].collect().toSeq
    assert(changed === Seq(
      (2L, Some(20L), Some(21L)), (5L, None, Some(5L))))
  }

  test("goldenRecord: latest non-null per field; partial update keeps older fields") {
    // key 1: v1 (name=a, city=x), v2 (name=b, city=NULL), v3
    // (name=NULL, city=y) -> survivor (b, y): v3's null name must
    // not erase v2's, v2's null city must not erase v1's (then v3
    // overrides it).
    val df = Seq(
      (1L, 1L, Some("a"), Some("x")),
      (1L, 2L, Some("b"), None),
      (1L, 3L, None, Some("y")),
      (2L, 1L, None, None), // all-null history -> NULL fields survive
      (3L, 2L, Some("q"), Some("z")),
      (3L, 1L, Some("old"), Some("old")) // order by seq, not input order
    ).toDF("k", "seq", "name", "city")
    val out = Merge.goldenRecord(df, "k", Seq("seq"), Seq("name", "city"))
      .orderBy("k")
      .as[(Long, Long, Option[String], Option[String])].collect().toSeq
    assert(out === Seq(
      (1L, 3L, Some("b"), Some("y")),
      (2L, 1L, None, None),
      (3L, 2L, Some("q"), Some("z"))))
  }

  test("sortedNeighborhoodCandidates: rank-window parity with brute force") {
    val df = Seq((10L, "b"), (20L, "a"), (30L, "d"), (40L, "c"))
      .toDF("id", "k")
    val got = Fuzzy.sortedNeighborhoodCandidates(df, "id", col("k"),
        windowSize = 2)
      .as[(Long, Long)].collect().toSet
    // sort order by k: 20(a) 10(b) 40(c) 30(d); each row pairs with
    // its <=2 successors: (20,10) (20,40) (10,40) (10,30) (40,30)
    assert(got == Set((10L, 20L), (20L, 40L), (10L, 40L), (10L, 30L),
      (30L, 40L)))
  }

  private def w6(num: Double, den: Double): Double =
    BigDecimal(math.log(num / den) / math.log(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("fellegiSunter: hand-computed weights, patterns, scores") {
    // city counts A:2 B:2 -> u = 4/12; color counts r:3 s:1 -> u = 6/12
    val recs = Seq(
      (1L, "A", "r"), (2L, "A", "r"), (3L, "B", "r"), (4L, "B", "s")
    ).toDF("id", "city", "color")
    val pairs = Seq((1L, 2L), (1L, 3L), (3L, 4L)).toDF("id_a", "id_b")
    val out = Fuzzy.fellegiSunter(recs, "id", pairs,
        Seq("city" -> 0.9, "color" -> 0.8))
      .orderBy("id_a", "id_b")
      .as[(Long, Long, String, Long, Double)].collect().toSeq
    val uc = 4.0 / 12.0; val uk = 6.0 / 12.0
    val exp = Seq(
      (1L, 2L, "11", 2L, w6(0.9, uc) + w6(0.8, uk)),
      (1L, 3L, "01", 1L, w6(1.0 - 0.9, 1.0 - uc) + w6(0.8, uk)),
      (3L, 4L, "10", 1L, w6(0.9, uc) + w6(1.0 - 0.8, 1.0 - uk)))
    assert(out.map(r => (r._1, r._2, r._3, r._4)) ==
      exp.map(r => (r._1, r._2, r._3, r._4)))
    out.zip(exp).foreach { case (g, e) =>
      assert(math.abs(g._5 - e._5) < 3e-6, s"score ${g._5} vs ${e._5}")
    }
  }

  test("fellegiSunter: NULL fields render '-' and carry weight 0; " +
      "degenerate fields clamp finite") {
    val recs = Seq(
      (1L, Some("A"), "u1"), (2L, None, "u2"), (3L, Some("A"), "u3")
    ).toDF("id", "city", "uniq")
    val out = Fuzzy.fellegiSunter(recs, "id", Seq((1L, 2L), (1L, 3L))
        .toDF("id_a", "id_b"),
        Seq("city" -> 0.9, "uniq" -> 0.9))
      .orderBy("id_a", "id_b")
      .as[(Long, Long, String, Long, Double)].collect().toSeq
    // uniq is all-distinct (u would be 0) -> clamped, scores finite
    assert(out.forall(r => !r._5.isNaN && !r._5.isInfinite))
    assert(out.map(_._3) == Seq("-0", "10"))
    // the NULL city on pair (1,2) contributes 0: its score is exactly
    // the uniq disagreement weight
    val n = 3.0 * 2.0 // N(N-1) for the 3-row uniq field
    assert(math.abs(out.head._5 - w6(1.0 - 0.9, 1.0 - 1.0 / n)) < 2e-6)
  }

  test("fellegiSunter: a field with one non-null record weighs 0 " +
      "(the N(N-1)=0 clamp degeneracy), scores stay finite") {
    // `lone` is non-null on exactly one record: u's estimator is
    // 0/0 and the clamp bounds are ±Inf — the guard must emit
    // weight 0 both ways instead of Inf/NULL weights.
    val recs = Seq(
      (1L, "A", Some("x")), (2L, "A", None), (3L, "B", None)
    ).toDF("id", "city", "lone")
    val out = Fuzzy.fellegiSunter(recs, "id",
        Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b"),
        Seq("city" -> 0.9, "lone" -> 0.9))
      .orderBy("id_a", "id_b")
      .as[(Long, Long, String, Long, Double)].collect().toSeq
    assert(out.map(_._3) == Seq("1-", "0-"))
    assert(out.forall(r => !r._5.isNaN && !r._5.isInfinite))
    // scores reduce to the city weights alone: city counts A:2 B:1
    // -> u = 2/6, clamp inactive
    val uc = 2.0 / 6.0
    assert(math.abs(out(0)._5 - w6(0.9, uc)) < 2e-6)
    assert(math.abs(out(1)._5 - w6(1.0 - 0.9, 1.0 - uc)) < 2e-6)
  }

  test("fellegiSunterEm: one iteration matches the hand-unrolled " +
      "micro-grid EM; longer runs separate m from u") {
    // 4 "match" pairs agree on both fields; 8 "non-match" pairs
    // disagree on both — EM must drive m up and u down with no
    // labels, and λ toward the 4/12 match share.
    val recs = (
      (1 to 8).map(i => (i.toLong, s"dup${(i - 1) / 2}",
        s"tok${(i - 1) / 2}")) ++
      (9 to 16).map(i => (i.toLong, s"solo$i", s"one$i"))
    ).toDF("id", "city", "token")
    val pairs = (
      Seq((1L, 2L), (3L, 4L), (5L, 6L), (7L, 8L)) ++ // '11' x4
      Seq((1L, 9L), (2L, 10L), (3L, 11L), (4L, 12L),
        (5L, 13L), (6L, 14L), (7L, 15L), (8L, 16L))  // '00' x8
    ).toDF("id_a", "id_b")
    // hand-unrolled iteration 1 on the {11: 4, 00: 8} histogram
    def emRound(m: Long, u: Long, lam: Long)
        : (Long, Long, Long) = {
      def post(g: String): Long = {
        var wm = lam.toDouble / 1e6; var wu = 1.0 - lam.toDouble / 1e6
        for (c <- g) c match {
          case '1' => wm *= m.toDouble / 1e6; wu *= u.toDouble / 1e6
          case '0' =>
            wm *= 1.0 - m.toDouble / 1e6; wu *= 1.0 - u.toDouble / 1e6
          case _ =>
        }
        math.floor(wm / (wm + wu) * 1e6).toLong
      }
      val w11 = post("11"); val w00 = post("00")
      def clamp(x: Double) =
        math.max(1L, math.min(999999L, math.floor(x).toLong))
      // both fields see identical pattern mass -> same m/u
      val mN = 4L * w11; val mD = 4L * w11 + 8L * w00
      val uN = 4L * (1000000L - w11)
      val uD = 4L * (1000000L - w11) + 8L * (1000000L - w00)
      (clamp(mN.toDouble / mD.toDouble * 1e6),
        clamp(uN.toDouble / uD.toDouble * 1e6),
        clamp((4L * w11 + 8L * w00).toDouble / 12.0))
    }
    val (em1, eu1, el1) = emRound(900000L, 100000L, 100000L)
    val got1 = Fuzzy.fellegiSunterEm(recs, "id", pairs,
        Seq("city", "token"), iters = 1,
        m0 = 0.9, u0 = 0.1, lambda0 = 0.1)
      .orderBy("field")
      .as[(String, Double, Double, Double)].collect().toSeq
    assert(got1.map(_._1) == Seq("city", "token"))
    for (r <- got1) {
      assert(r._2 === em1.toDouble / 1e6, s"m: $r")
      assert(r._3 === eu1.toDouble / 1e6, s"u: $r")
      assert(r._4 === el1.toDouble / 1e6, s"lambda: $r")
    }
    // 5 rounds: posteriors sharpen — m ~ 1, u ~ 0, λ ~ 4/12
    val got5 = Fuzzy.fellegiSunterEm(recs, "id", pairs,
        Seq("city", "token"), iters = 5,
        m0 = 0.9, u0 = 0.1, lambda0 = 0.1)
      .as[(String, Double, Double, Double)].collect()
    for (r <- got5) {
      assert(r._2 > 0.99 && r._3 < 0.01, s"not separated: $r")
      assert(math.abs(r._4 - 4.0 / 12.0) < 0.02, s"lambda off: $r")
    }
    // deterministic rerun
    assert(Fuzzy.fellegiSunterEm(recs, "id", pairs,
        Seq("city", "token"), iters = 5, m0 = 0.9, u0 = 0.1,
        lambda0 = 0.1)
      .as[(String, Double, Double, Double)].collect().toSeq ===
      got5.toSeq)
  }

  test("fellegiSunterTf: rare-value agreement outscores common-value " +
      "agreement; NULL fields ride '-' with weight 0") {
    // city non-null N=5: A:2 B:2 C:1 -> global u_city = 4/20
    // color N=6: r:4 s:2 -> p_r = 4/6 (common), p_s = 2/6 (rare)
    val recs = Seq(
      (1L, Some("A"), "r"), (2L, Some("A"), "r"),
      (3L, Some("B"), "r"), (4L, Some("B"), "s"),
      (5L, Some("C"), "s"), (6L, Option.empty[String], "r")
    ).toDF("id", "city", "color")
    val pairs = Seq((1L, 2L), (1L, 3L), (4L, 5L), (2L, 6L))
      .toDF("id_a", "id_b")
    val out = Fuzzy.fellegiSunterTf(recs, "id", pairs,
        Seq("city" -> 0.9, "color" -> 0.8))
      .orderBy("id_a", "id_b")
      .as[(Long, Long, String, Long, Double)].collect().toSeq
    val wdCity = w6(1.0 - 0.9, 1.0 - 4.0 / 20.0)
    val waCityA = w6(0.9, 2.0 / 5.0)
    val waR = w6(0.8, 4.0 / 6.0)
    val waS = w6(0.8, 2.0 / 6.0)
    val exp = Seq(
      (1L, 2L, "11", 2L, waCityA + waR),
      (1L, 3L, "01", 1L, wdCity + waR),
      (2L, 6L, "-1", 1L, 0.0 + waR),
      (4L, 5L, "01", 1L, wdCity + waS))
    assert(out.map(r => (r._1, r._2, r._3, r._4)) ==
      exp.map(r => (r._1, r._2, r._3, r._4)))
    out.zip(exp).foreach { case (g, e) =>
      assert(math.abs(g._5 - e._5) < 3e-6, s"score ${g._5} vs ${e._5}")
    }
    // the tf point: same pattern '01', but agreement on the RARE
    // color scores strictly higher than on the common one
    val byPair = out.map(r => (r._1, r._2) -> r._5).toMap
    assert(byPair((4L, 5L)) > byPair((1L, 3L)),
      "rare-value agreement must outscore common-value agreement")
    // and common-value agreement is worth LESS under tf than the
    // field-global estimate (which pools rare mass in)
    assert(waR < w6(0.8, 14.0 / 30.0) + 1e-9)
  }

  test("blockingAudit: hand goldens, canonicalization, NULL guards") {
    val recs = Seq(1L, 2L, 3L, 4L).toDF("id")
    // mirror dup (2,1), self pair (5,5), NULL id: all must vanish
    val cand = Seq(
      (Some(1L), Some(2L)), (Some(2L), Some(1L)), (Some(3L), Some(4L)),
      (Some(5L), Some(5L)), (Option.empty[Long], Some(2L)))
      .toDF("a", "b")
    val truth = Seq((1L, 2L), (1L, 3L)).toDF("ta", "tb")
    val got = Fuzzy.blockingAudit(recs, "id", cand, "a", "b",
        truth, "ta", "tb")
      .as[(Long, String, Long, Long, Long,
        Option[Double], Option[Double], Option[Double])]
      .collect()
    // n=4 -> total 6; cand {(1,2),(3,4)}; hits {(1,2)}
    assert(got.toSeq == Seq((4L, "6", 2L, 2L, 1L,
      Some(0.666667), Some(0.5), Some(0.5))))

    // empty truth -> NULL completeness; empty candidates -> NULL
    // quality (and RR = 1)
    val empty = Seq.empty[(Long, Long)].toDF("ta", "tb")
    val g2 = Fuzzy.blockingAudit(recs, "id", cand, "a", "b",
        empty, "ta", "tb")
      .as[(Long, String, Long, Long, Long,
        Option[Double], Option[Double], Option[Double])]
      .collect().head
    assert(g2._4 == 0L && g2._7.isEmpty && g2._8 == Some(0.0))
    val g3 = Fuzzy.blockingAudit(recs, "id", empty, "ta", "tb",
        truth, "ta", "tb")
      .as[(Long, String, Long, Long, Long,
        Option[Double], Option[Double], Option[Double])]
      .collect().head
    assert(g3._3 == 0L && g3._6 == Some(1.0) && g3._7 == Some(0.0) &&
      g3._8.isEmpty)

    // single record: reduction ratio undefined (NULL), not a throw
    val one = Seq(11L).toDF("id")
    val g4 = Fuzzy.blockingAudit(one, "id", empty, "ta", "tb",
        empty, "ta", "tb")
      .as[(Long, String, Long, Long, Long,
        Option[Double], Option[Double], Option[Double])]
      .collect().head
    assert(g4._1 == 1L && g4._2 == "0" && g4._6.isEmpty)
  }
}
