package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** Goldens for the text-analysis column functions. */
class TextAnalysisSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one(text: String) = Seq(Tuple1(text)).toDF("text")

  test("token counting: whitespace and regex tokenizers") {
    val df = one("the cat sat on 42 mats!")
      .select(
        TextAnalysis.tokenCount($"text").as("ws"),
        TextAnalysis.regexTokenCount($"text", "[a-z]+|[0-9]+|[^a-z0-9 ]+").as("rx"))
    val r = df.as[(Int, Int)].head()
    assert(r._1 === 6)
    assert(r._2 === 7) // "the","cat","sat","on","42","mats","!"
  }

  test("type-token ratio and vocab hits") {
    val r = one("a b a c")
      .select(
        TextAnalysis.typeTokenRatio($"text").as("ttr"),
        TextAnalysis.vocabHits($"text", Seq("a", "c")).as("hits"))
      .as[(Double, Int)].head()
    assert(r._1 === 0.75) // 3 distinct / 4 tokens
    assert(r._2 === 3) // a, a, c
  }

  test("language ID picks the dominant stopword profile") {
    val cases = Seq(
      "the cat is on the mat and it is fine" -> "en",
      "el perro y la casa de que se ve en la calle" -> "es",
      "der hund und die katze ist von den leuten ein tier" -> "de",
      "xyzzy plugh quux" -> "und")
    cases.foreach { case (text, expected) =>
      val got = one(text).select(TextAnalysis.langId($"text")).as[String].head()
      assert(got === expected, s"for: $text")
    }
  }

  test("fingerprint is case/whitespace-insensitive, content-sensitive") {
    def fp(s: String) =
      one(s).select(TextAnalysis.fingerprint($"text")).as[String].head()
    assert(fp("Hello  World") === fp("  hello world "))
    assert(fp("hello world") !== fp("hello mars"))
  }

  test("bloomContaminatedIds equals the broadcast semi-join result") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six seven"),
      (3L, "alpha beta gamma delta unrelated tail"),
      (4L, "totally different content here now")
    ).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "alpha beta gamma delta"),
      (101L, "nine ten eleven twelve")
    ).toDF("doc_id", "text")
    val plain = TextAnalysis
      .contaminatedIds(docs, bench, "doc_id", "text", n = 4)
      .orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    val bloom = TextAnalysis
      .bloomContaminatedIds(docs, bench, "doc_id", "text", n = 4)
      .orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(bloom === plain)
    assert(plain === Seq(1L, 3L))
  }

  test("noveltyScore: first occurrence wins; copies score zero; short docs drop") {
    val docs = Seq(
      (1L, "a b c d"), // shingles {a b c, b c d}: both first here -> 1.0
      (2L, "a b c x"), // {a b c (seen), b c x (new)} -> 0.5
      (3L, "a b c d"), // exact re-tread of doc 1 -> 0.0
      (4L, "q r") // < 3 tokens: no shingles, dropped
    ).toDF("doc_id", "text")
    val out = TextAnalysis.noveltyScore(docs, "doc_id", "text", n = 3)
      .select("doc_id", "n_shingles", "n_novel", "novelty")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out === Map(
      1L -> ((2L, 2L, 1.0)),
      2L -> ((2L, 1L, 0.5)),
      3L -> ((2L, 0L, 0.0))))
  }

  test("noveltyAgainst: batch scores only against the existing corpus") {
    val corpus = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "a b c d"), // fully covered by corpus -> 0.0
      (11L, "a b c x"), // {a b c seen, b c x new} -> 0.5
      (12L, "p q r s") // nothing seen -> 1.0
    ).toDF("doc_id", "text")
    val out = TextAnalysis.noveltyAgainst(batch, corpus, "doc_id", "text", 3)
      .select("doc_id", "novelty").as[(Long, Double)].collect().toMap
    assert(out === Map(10L -> 0.0, 11L -> 0.5, 12L -> 1.0))
    // Unlike q98's within-corpus rule, batch docs never see each
    // other: two identical NEW docs both score 1.0 against the corpus.
    val twins = Seq((20L, "x y z w"), (21L, "x y z w")).toDF("doc_id", "text")
    val tw = TextAnalysis.noveltyAgainst(twins, corpus, "doc_id", "text", 3)
      .select("doc_id", "novelty").as[(Long, Double)].collect().toMap
    assert(tw === Map(20L -> 1.0, 21L -> 1.0))
  }

  test("corpusOverlap: hand-computed containment/Jaccard; disjoint pairs absent") {
    val docs = Seq(
      ("g1", "a b c"),   // 2-shingles {a b, b c}
      ("g1", "a b"),     // duplicate shingle within group: counted once
      ("g2", "b c d"),   // {b c, c d}
      ("g3", "x y")      // {x y} — shares nothing
    ).toDF("source", "text")
    val out = TextAnalysis.corpusOverlap(docs, "source", "text", n = 2)
      .orderBy("group_a", "group_b")
      .as[(String, String, Long, Long, Long, Double, Double, Double)]
      .collect().toSeq
    assert(out === Seq(
      ("g1", "g2", 2L, 2L, 1L, 0.5, 0.5, 0.333333)))
  }

  test("kmvOverlap: exact below k; estimator lands near truth above k") {
    // Small side: union (3 distinct shingles) < k → sketch is exact.
    val small = Seq(
      ("g1", "a b c"), ("g2", "b c d x y z")
    ).toDF("source", "text")
    val s = TextAnalysis.kmvOverlap(small, "source", "text", n = 2, k = 128)
      .as[(String, String, Long, Long, Double, Double)].collect().toSeq
    // g1 = {a b, b c}; g2 = {b c, c d, d x, x y, y z}; union 6, both 1.
    assert(s === Seq(("g1", "g2", 6L, 1L, 6.0, 0.166667)))

    // Large side: 600+600 one-shingle docs, 300 shared → union 900,
    // jaccard 1/3. KMV stderr ≈ 1/√k ≈ 12.5% at k=64; assert 3σ.
    val docs = ((0 until 600).map(i => ("A", s"a$i b$i c$i")) ++
      (300 until 900).map(i => ("B", s"a$i b$i c$i"))).toDF("source", "text")
    val out = TextAnalysis.kmvOverlap(docs, "source", "text", n = 3, k = 64)
      .as[(String, String, Long, Long, Double, Double)].collect().head
    val (_, _, nSketch, _, estUnion, estJaccard) = out
    assert(nSketch === 64L)
    assert(estUnion > 900 * 0.6 && estUnion < 900 * 1.4, s"est_union $estUnion")
    assert(estJaccard > 0.13 && estJaccard < 0.55, s"est_jaccard $estJaccard")
  }

  test("rankBlend: percent_rank orientation, per-key strata, deterministic ties") {
    val df = Seq(
      // en: ttr ascending 0.1 < 0.5 < 0.9; bad ("lower better") 5, 1, 3
      (1L, "en", 0.1, 5.0), (2L, "en", 0.5, 1.0), (3L, "en", 0.9, 3.0),
      // fr: single doc → percent_rank 0 for every signal
      (4L, "fr", 0.7, 2.0),
      // de: tied ttr values rank by id, not equally
      (5L, "de", 0.4, 1.0), (6L, "de", 0.4, 2.0)
    ).toDF("doc_id", "lang", "ttr", "bad")
    val out = TextAnalysis.rankBlend(df, "lang", "doc_id",
        Seq(("ttr", true), ("bad", false)))
      .select("doc_id", "pr_ttr", "pr_bad", "blend")
      .as[(Long, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) === ((0.0, 0.0, 0.0)))   // worst ttr, worst bad
    assert(out(2L) === ((0.5, 1.0, 0.75)))
    assert(out(3L) === ((1.0, 0.5, 0.75)))
    assert(out(4L) === ((0.0, 0.0, 0.0)))   // singleton stratum
    assert(out(5L) === ((0.0, 1.0, 0.5)))   // tie broken by id
    assert(out(6L) === ((1.0, 0.0, 0.5)))
  }

  test("dsirLogWeights: target-like docs outrank off-target docs; weights sum over unigrams+bigrams") {
    // Weights are likelihood-ratio SUMS over grams (doc length is a
    // factor by construction), so ranking comparisons use EQUAL-length
    // docs: 4 tokens ⇒ 7 grams each.
    val docs = Seq(
      // target slice: "alpha beta" vocabulary
      (1L, "alpha beta alpha beta", true),
      (2L, "beta alpha beta alpha", true),
      // raw-only docs: half target vocab / fully disjoint vocab
      (3L, "alpha beta zeta eta", false),
      (4L, "zeta eta theta iota", false)
    ).toDF("doc_id", "text", "tgt")
    val out = TextAnalysis.dsirLogWeights(docs, "doc_id", "text", col("tgt"))
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // n_grams = tokens + bigrams = 2*len-1 for each doc
    assert(out.values.forall(_._1 === 7L))
    // monotone in target-vocabulary share: target doc > mixed > disjoint
    assert(out(1L)._2 > out(3L)._2,
      s"target ${out(1L)._2} vs mixed ${out(3L)._2}")
    assert(out(3L)._2 > out(4L)._2,
      s"mixed ${out(3L)._2} vs disjoint ${out(4L)._2}")
  }

  test("substringDedup: planted shared k-gram span removed; unique text kept") {
    // docs 1 and 2 share an identical 10-token run (positions 2..11 in
    // doc 1, 0..9 in doc 2); with k=4 every start inside the run is
    // flagged, so exactly those 10 positions are covered in each doc.
    val shared = (1 to 10).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, s"u1 u2 $shared tail1 tail2"),
      (2L, s"$shared z1 z2 z3"),
      (3L, "only unique words live here nothing repeats at all"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.substringDedup(docs, "doc_id", "text",
        k = 4, minCount = 2L)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, String)].collect()
    assert(out(0) === ((1L, 14L, 10L, 1L, "u1 u2 tail1 tail2")))
    assert(out(1) === ((2L, 13L, 10L, 1L, "z1 z2 z3")))
    assert(out(2) === ((3L, 9L, 0L, 0L,
      "only unique words live here nothing repeats at all")))
  }

  test("substringDedup: within-doc repetition counts toward minCount; short docs untouched") {
    // doc 1 repeats its own 4-gram — multiplicity 2 within ONE doc
    // must flag it (Lee et al. count occurrences, not documents).
    val run = "r1 r2 r3 r4"
    val docs = Seq(
      (1L, s"$run mid $run end"),
      (2L, "a b c")) // shorter than k: no n-grams, fully kept
      .toDF("doc_id", "text")
    val out = TextAnalysis.substringDedup(docs, "doc_id", "text",
        k = 4, minCount = 2L)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, String)].collect()
    assert(out(0) === ((1L, 10L, 8L, 2L, "mid end")))
    assert(out(1) === ((2L, 3L, 0L, 0L, "a b c")))
  }

  test("repetitionSignals: hand-computed Gopher fractions; degenerate docs score 0") {
    val docs = Seq(
      // "a b a b a b": 6 tokens; bigrams a-b(3) b-a(2) -> top 3,
      // share 3*2/6 = 1.0; trigrams a-b-a(2) b-a-b(2) -> all 4
      // positions duplicated, frac 4/4 = 1.0 — pure repetition.
      (1L, "a b a b a b"),
      // "x y z w": all grams unique -> top bigram 1, share 2/4 = 0.5
      // (any 4-token doc gives its modal bigram half the mass),
      // dup trigrams 0, frac 0.
      (2L, "x y z w"),
      // single token: no bigrams/trigrams, both shares 0.0.
      (3L, "solo"),
      // two tokens: one bigram (count 1) -> share 2*1/2 = 1.0;
      // trigram side degenerate -> 0.0.
      (4L, "p q")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionSignals(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Int, Long, Double, Long, Double)].collect()
    assert(out(0) === ((1L, 6, 3L, 1.0, 4L, 1.0)))
    assert(out(1) === ((2L, 4, 1L, 0.5, 0L, 0.0)))
    assert(out(2) === ((3L, 1, 0L, 0.0, 0L, 0.0)))
    assert(out(3) === ((4L, 2, 1L, 1.0, 0L, 0.0)))
  }

  test("PositionGrams kernel is bit-identical to the HOF reference formulation") {
    // Random-ish texts incl. edge shapes: empty string, fewer tokens
    // than k, exactly k, repeated/empty tokens from double spaces.
    val texts = Seq(
      "", "a", "a b", "one two three four five six seven eight nine",
      "x x x x x x x x x x", "a  b   c d e f g h i",
      (1 to 40).map(i => s"w${i % 7}").mkString(" "))
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val k = 8
    val kernel = df.select(
        col("doc_id"),
        graft.functions.PositionGrams(col("text"), k).as("__cells"))
    val hof = df
      .select(col("doc_id"), split(col("text"), " ").as("__toks"))
      .select(col("doc_id"), col("__toks"),
        (size(col("__toks")) - k).as("__last"))
      .select(col("doc_id"),
        expr(s"""transform(__toks,
          | (tok, i) -> named_struct(
          |   'tok', tok,
          |   'ng', IF(i <= __last,
          |            array_join(slice(__toks, i + 1, $k), ' '),
          |            NULL)))""".stripMargin).as("__cells"))
    val a = kernel.orderBy("doc_id").collect().map(_.toString)
    val b = hof.orderBy("doc_id").collect().map(_.toString)
    assert(a.toSeq === b.toSeq)
  }

  test("TaggedGrams kernel is bit-identical to the HOF reference formulation") {
    val texts = Seq(
      "", "a", "a b", "a b c", "x x x x x", "a  b   c d",
      (1 to 25).map(i => s"t${i % 4}").mkString(" "))
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val kernel = df.select(col("doc_id"),
      graft.functions.TaggedGrams(col("text"), Seq(2, 3)).as("__cells"))
    val hof = df
      .select(col("doc_id"), split(col("text"), " ").as("__toks"))
      .select(col("doc_id"), col("__toks"),
        (size(col("__toks")) - 2).as("__l2"),
        (size(col("__toks")) - 3).as("__l3"))
      .select(col("doc_id"), expr(
        """filter(concat(
          |  transform(__toks, (t, i) -> IF(i <= __l2,
          |    named_struct('gn', 2,
          |      'g', array_join(slice(__toks, i + 1, 2), ' ')), NULL)),
          |  transform(__toks, (t, i) -> IF(i <= __l3,
          |    named_struct('gn', 3,
          |      'g', array_join(slice(__toks, i + 1, 3), ' ')), NULL))),
          |x -> x IS NOT NULL)""".stripMargin).as("__cells"))
    val a = kernel.orderBy("doc_id").collect().map(_.toString)
    val b = hof.orderBy("doc_id").collect().map(_.toString)
    assert(a.toSeq === b.toSeq)
  }

  test("slidingChunks: overlapped layout, short tail, stride==window disjoint") {
    val docs = Seq((1L, "a b c d e"), (2L, "a b")).toDF("doc_id", "text")
    val out = TextAnalysis
      .slidingChunks(docs, "doc_id", "text", window = 3, stride = 2)
      .orderBy("doc_id", "chunk_id")
      .select("doc_id", "chunk_id", "chunk_tokens", "chunk_text")
      .as[(Long, Int, Int, String)].collect().toSeq
    assert(out === Seq(
      (1L, 0, 3, "a b c"), (1L, 1, 3, "c d e"), (2L, 0, 2, "a b")))
    // stride == window: disjoint packing, 1-token tail survives
    val disjoint = TextAnalysis
      .slidingChunks(docs.where($"doc_id" === 1), "doc_id", "text",
        window = 2, stride = 2)
      .orderBy("chunk_id")
      .select("chunk_id", "chunk_tokens", "chunk_text")
      .as[(Int, Int, String)].collect().toSeq
    assert(disjoint === Seq((0, 2, "a b"), (1, 2, "c d"), (2, 1, "e")))
    intercept[IllegalArgumentException] {
      TextAnalysis.slidingChunks(docs, "doc_id", "text",
        window = 2, stride = 3)
    }
  }

  test("vocabularyRichness: hand-computed hapax/TTR per source") {
    val docs = Seq(
      ("a", "x x y"), ("b", "z")
    ).toDF("source", "text")
    val out = TextAnalysis.vocabularyRichness(docs, "source", "text")
      .orderBy("source")
      .as[(String, Long, Long, Long, Double, Double)].collect().toSeq
    assert(out === Seq(
      ("a", 3L, 2L, 1L, 0.666667, 0.5),
      ("b", 1L, 1L, 1L, 1.0, 1.0)))
  }

  test("zipfFit: exact-Zipf two-token corpus fits slope -1") {
    // counts 4 and 2 at ranks 1 and 2 are exactly Zipfian with
    // exponent 1: ln(cnt) = ln(4) - 1·ln(rank). Hand-derivable with
    // the 6dp-rounded decimals: slope = -1, intercept = ln(4).
    val docs = Seq((1L, "a a a a b b")).toDF("doc_id", "text")
    val out = TextAnalysis.zipfFit(docs, "doc_id", "text", topK = 2)
      .select("corpus", "n_ranks", "slope", "intercept")
      .as[(String, Long, Double, Double)].collect().head
    assert(out === (("corpus", 2L, -1.0, 1.386294)))
  }

  test("zipfFit: flat counts give slope 0; topK caps the fit") {
    val flat = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val out = TextAnalysis.zipfFit(flat, "doc_id", "text", topK = 3)
      .select("n_ranks", "slope").as[(Long, Double)].collect().head
    assert(out._1 === 3L) // d drops: topK bound honored
    assert(out._2 === 0.0)
  }

  test("piiScan: class detection, Luhn gate, octet validation, NULL text") {
    val df = Seq(
      ("mail bob@example.com and eve@corp.io", "a"),
      ("card 4111111111111111 ok", "a"),          // valid Luhn, 16 digits
      ("card 4111111111111112 bad", "a"),         // fails Luhn
      ("serial 123456789 and ip 10.0.0.1", "b"),
      ("almost ip 999.1.1.1 only", "b"),          // octet out of range
      (null: String, "b")
    ).toDF("text", "src")
    val out = TextAnalysis.piiScan(df, "text", "src")
      .as[(String, String, Long, Long, Long)].collect()
      .map(r => ((r._1, r._2), (r._3, r._4, r._5))).toMap
    assert(out(("a", "email")) === ((1L, 2L, 26L)))
    assert(out(("a", "digit_run")) === ((2L, 2L, 32L)))
    assert(out(("a", "card_luhn")) === ((1L, 1L, 16L)),
      "only the Luhn-valid 16-digit run is a card")
    assert(out(("b", "ipv4")) === ((1L, 1L, 8L)),
      "999.1.1.1 must fail octet validation")
    assert(out(("b", "digit_run")) === ((1L, 1L, 9L)))
    assert(out(("b", "email")) === ((0L, 0L, 0L)))
  }

  test("piiRedact: ordered passes keep emails/IPs whole; idempotent") {
    val df = Seq(
      "reach bob123456789@ex.com at 10.0.0.1 or 123456789012",
      "clean text stays").toDF("text")
    val red = df.select(
      TextAnalysis.piiRedact(col("text")).as("r")).as[String].collect()
    assert(red(0) === "reach <EMAIL> at <IP> or <NUM>",
      "the email pass must consume the address before the digit pass")
    assert(red(1) === "clean text stays")
    val twice = df.select(TextAnalysis.piiRedact(
      TextAnalysis.piiRedact(col("text"))).as("r")).as[String].collect()
    assert(twice.toSeq === red.toSeq, "redaction is idempotent")
  }

  test("hillTailIndex: hand-computed alpha; short and all-tied groups NULL") {
    // A: top-3 of [8,4,2,1] -> threshold 2, sum = ln(4) + ln(2)
    // (round-12 staged), alpha = 2 / sum.
    val df = Seq(
      ("A", 8L), ("A", 4L), ("A", 2L), ("A", 1L),
      ("B", 9L), ("B", 3L),            // fewer than k+1 rows
      ("C", 5L), ("C", 5L), ("C", 5L)  // all top values tie threshold
    ).toDF("g", "v")
    val out = TextAnalysis.hillTailIndex(df, "g", "v", k = 2)
      .as[(String, Int, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    def r12(x: Double) =
      BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val sum = (r12(math.log(4.0)) + r12(math.log(2.0))).toDouble
    val alpha = BigDecimal(2.0 / sum)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out("A") === (("A", 2, 4L, 2L, Some(alpha))))
    assert(out("B")._5.isEmpty)
    assert(out("C") === (("C", 2, 3L, 5L, None)))
  }

  test("languageMixture: pure doc entropy 0; 50/50 code-switch hits " +
      "ln(2); markerless doc is 'und' and unmixed") {
    val docs = Seq(
      (1L, "the cat is of the house and it is fine"), // pure en
      (2L, "the is the is und das und das"), // exactly 4 en + 4 de
      (3L, "zzz qqq www")                               // no markers
    ).toDF("doc_id", "text")
    val out = TextAnalysis.languageMixture(docs, "doc_id", "text")
      .select("doc_id", "primary_lang", "marker_total", "mix_entropy",
        "is_mixed")
      .as[(Long, String, Int, Double, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(out(1L)._2 == "en" && out(1L)._4 == 0.0 && !out(1L)._5)
    // exactly 4 en hits and 4 de hits -> entropy = ln 2 (rounded 6)
    assert(out(2L)._3 == 8)
    val ln2 = BigDecimal(math.log(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(2L)._4 == ln2 && out(2L)._5)
    assert(out(3L)._2 == "und" && out(3L)._3 == 0 &&
      out(3L)._4 == 0.0 && !out(3L)._5)
  }

  test("referenceOverlapRate: full copy = 1, disjoint = 0, short doc " +
      "NULL, partial counted on distinct grams") {
    val ref = Seq((0L, "a b c d e")).toDF("rid", "rtext")
    val docs = Seq(
      (1L, "a b c d e"),   // all 3 trigrams in ref -> 1.0
      (2L, "x y z w"),     // 2 trigrams, none in ref -> 0.0
      (3L, "a b"),         // no trigram -> n_grams 0, NULL rate
      (4L, "a b c x y z")  // 4 trigrams, one (a b c) in ref -> 0.25
    ).toDF("doc_id", "text")
    val out = TextAnalysis.referenceOverlapRate(docs, "doc_id", "text",
        ref, "rtext", n = 3)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Option[Double])].collect().toSeq
    assert(out(0) === ((1L, 3L, 3L, Some(1.0))))
    assert(out(1) === ((2L, 2L, 0L, Some(0.0))))
    assert(out(2) === ((3L, 0L, 0L, None)))
    assert(out(3) === ((4L, 4L, 1L, Some(0.25))))
  }

  test("curationFunnel: stages chain; each doc drops at exactly one " +
      "stage; token masses follow") {
    // all texts padded past minChars=50 except the 'short' one
    val longEn = "the cat sat and a dog ran to it while birds sang " +
      "of summer days in golden light" // 18 distinct tokens, TTR 1.0
    val lowTtr = ("the " * 24).trim // en markers, TTR = 1/24
    val noLang = ("zz qq ww rr tt yy uu ii oo pp aa ss dd ff gg hh " * 2).trim
    val docs = Seq(
      ("src1", longEn),   // survives everything
      ("src1", "the a"),  // fails length
      ("src1", noLang),   // fails language
      ("src1", lowTtr)    // fails TTR
    ).toDF("source", "text")
    val out = TextAnalysis.curationFunnel(docs, "source", "text",
        minChars = 50, langs = Seq("en", "de"), minTtr = 0.4)
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long,
        Double)].collect().head
    assert(out._2 == 4L)               // n_docs
    assert(out._4 == 3L)               // after length
    assert(out._6 == 2L)               // after lang
    assert(out._8 == 1L)               // after ttr
    assert(out._10 == 0.25)            // keep rate
    // token masses stay consistent with the surviving docs
    val nLongEn = longEn.split(" ").length.toLong
    assert(out._9 == nLongEn)
    assert(out._3 > out._5 && out._5 > out._7 && out._7 > out._9)
  }

  test("readabilityScores: hand golden, unpunctuated and empty docs " +
      "take the NULL branches") {
    val docs = Seq(
      (1L, "Hello world. This is fine!"),
      (2L, "no punctuation here at all"),
      (3L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.readabilityScores(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long, Option[Double], Option[Double],
        Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    // 5 words, 2 sentence runs, 7 vowel groups:
    // flesch = 206.835 - 1.015*2.5 - 84.6*1.4 = 85.8575
    assert(got(1L) === ((1L, 5L, 2L, 7L, Some(2.5), Some(1.4),
      Some(85.8575))))
    val g2 = got(2L)
    assert(g2._2 == 5L && g2._3 == 0L)
    assert(g2._5.isEmpty && g2._7.isEmpty, "no sentences -> NULL wps/flesch")
    assert(g2._6.isDefined)
    val g3 = got(3L)
    assert(g3._2 == 0L && g3._6.isEmpty && g3._7.isEmpty)
  }
  test("encodingQuality: corruption goldens, clean text, empty doc") {
    val docs = Seq(
      (1L, "perfectly clean ascii text"),
      (2L, "caf\u00c3\u00a9 menu"), // "cafÃ©" — one mojibake marker
      (3L, "bad\u0007text\u0007again"), // two control chars
      (4L, "lost \ufffd bytes \ufffd\ufffd here"), // three U+FFFD
      (5L, ""))
      .toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis
      .encodingQuality(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long, Long, Option[Double],
        Option[Double], Option[Double], Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(got(1L)._9, "clean text must flag clean")
    assert(got(1L)._3 == 0L && got(1L)._4 == 0L && got(1L)._5 == 0L)
    assert(got(2L)._5 === 1L && !got(2L)._9)
    assert(got(3L)._4 === 2L && !got(3L)._9)
    assert(got(4L)._3 === 3L && !got(4L)._9)
    assert(got(4L)._6.exists(_ > 0.0))
    // empty doc: zero counts, NULL rates, clean
    assert(got(5L)._2 === 0L && got(5L)._6.isEmpty && got(5L)._9)
    // tab/newline/CR are NOT control-flagged
    val ws = Seq((9L, "a\tb\nc\rd")).toDF("doc_id", "text")
    val g2 = graft.operators.TextAnalysis
      .encodingQuality(ws, "doc_id", "text")
      .as[(Long, Long, Long, Long, Long, Option[Double],
        Option[Double], Option[Double], Boolean)].collect().head
    assert(g2._4 === 0L && g2._9)
  }

  test("encodingRepair: mojibake inverts, controls and U+FFFD strip, " +
      "repaired text pinned by md5, splice case stays honest") {
    import org.apache.spark.sql.functions.md5
    val docs = Seq(
      (1L, "cafÃ© menu lost�"),
      (2L, "already clean"),
      // stripping U+FFFD splices "Ã" + "©" into a fresh marker
      (3L, "cafÃ�©"))
      .toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis
      .encodingRepair(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long, Long, String, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    // doc 1: one digraph fixed, one control + one FFFD stripped;
    // repaired text is exactly "café menu lost"
    val want1 = "café menu lost"
    val wantMd5 = Seq(want1).toDF("t")
      .select(md5($"t")).as[String].collect().head
    assert(got(1L)._2 === 1L && got(1L)._3 === 1L && got(1L)._4 === 1L)
    assert(got(1L)._5 === want1.length.toLong &&
      got(1L)._6 === wantMd5 && got(1L)._7)
    // clean doc: zero counts, text untouched, clean_after
    assert(got(2L)._2 === 0L && got(2L)._3 === 0L &&
      got(2L)._4 === 0L && got(2L)._7)
    // splice: the FFFD strip creates "Ã©" AFTER repairs ran —
    // clean_after must honestly read false
    assert(got(3L)._4 === 1L && !got(3L)._7,
      s"spliced marker must be measured, got ${got(3L)}")
  }

  test("collapseTokenRuns (T64): consecutive runs collapse to " +
      "maxRun, non-consecutive repetition untouched, repaired text " +
      "md5-pinned, tokenless docs drop") {
    val docs = Seq(
      (1L, "a a a b c c"),
      (2L, "a b a"),            // distance repetition — untouched
      (3L, "x"),
      (4L, "  "),               // whitespace-only — drops
      (5L, "go go go go stop go"))
      .toDF("doc_id", "text")
    def run(maxRun: Int) = graft.operators.TextAnalysis
      .collapseTokenRuns(docs, "doc_id", "text", maxRun)
      .as[(Long, Long, Long, Long, Long, String)]
      .collect().map(r => r._1 -> r).toMap
    val got = run(1)
    def md5Of(s: String) = Seq(s).toDF("t")
      .select(md5($"t")).as[String].collect().head
    // doc 1: "a a a b c c" -> "a b c"; 2 runs collapsed
    assert(got(1L) === ((1L, 6L, 3L, 2L, 5L, md5Of("a b c"))))
    // doc 2: untouched — zero collapsed, text identical
    assert(got(2L) === ((2L, 3L, 3L, 0L, 5L, md5Of("a b a"))))
    // doc 3: single token untouched
    assert(got(3L)._4 === 0L && got(3L)._6 === md5Of("x"))
    // doc 4: no tokens -> no row
    assert(!got.contains(4L))
    // doc 5: "go go go go stop go" -> "go stop go" (the trailing
    // lone "go" is a NEW run — distance repetition stays)
    assert(got(5L) === ((5L, 6L, 3L, 1L, 10L, md5Of("go stop go"))))
    // maxRun = 2 keeps two of each run
    val two = run(2)
    assert(two(1L)._3 === 5L && two(1L)._6 === md5Of("a a b c c"))
    assert(two(5L)._6 === md5Of("go go stop go"))
  }
}
