package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Barrier.BarrierOps
import org.apache.spark.sql.types.DecimalType

/**
 * Corpus-relevance scoring: TF-IDF term weighting and BM25 document
 * ranking, plus token-distribution entropy as a quality signal —
 * standard statistical-relevance operators for training-data curation
 * (north-star text-analysis family; no counterpart in the reference
 * engine, which is purely relational ETL).
 *
 * Scale posture (100 TB corpus):
 *  - the (doc, token) frequency table is built with ONE map-side
 *    partial-aggregated shuffle keyed by (doc, token);
 *  - document length rides through the explode into the same
 *    aggregate, and per-doc reductions (entropy, BM25 sums) group by
 *    the doc key — every downstream key is either (doc, token) or
 *    doc, so no stage ever re-keys on an unbounded derived value;
 *  - document frequency aggregates to vocabulary cardinality (sub-
 *    linear in corpus size) and joins back on the token key — AQE
 *    broadcasts it when small, shuffle-joins otherwise; no forced
 *    broadcast of a data-scaled side;
 *  - corpus scalars (N, avgdl) ride as one-row cross joins
 *    (broadcast-nested-loop of a single row), never `.collect()`.
 */
object Relevance {

  /** One row per (doc, token): occurrence count `tf` plus the doc's
    * token length `dl`. `dl` rides through the explode and reduces
    * with `max` inside the SAME aggregate — re-deriving it with a
    * per-doc window here would cost a second exchange (hash(doc,tok)
    * does not co-locate rows by doc alone). */
  def termFrequencies(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol), split(col(textCol), " ").as("toks"))
      .select(col(idCol), size(col("toks")).as("dl"), explode(col("toks")).as("tok"))
      .groupBy(col(idCol), col("tok"))
      .agg(count(lit(1)).as("tf"), max("dl").as("dl"))

  /**
   * TF-IDF weights: normalized term frequency (tf/dl) times
   * ln(N/df). Returns the top `k` terms per document by weight
   * (ties broken by token ascending), weight rounded to 6 dp for
   * cross-engine comparison.
   */
  def tfidfTopK(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val tf = termFrequencies(docs, idCol, textCol)
    val dfT = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val n = docs.select(count(lit(1)).as("n_docs"))
    val weighted = tf
      .join(dfT, "tok")
      .crossJoin(n)
      .withColumn(
        "tfidf",
        col("tf").cast("double") / col("dl") * log(col("n_docs").cast("double") / col("df")))
    weighted
      .withColumn(
        "rank",
        row_number().over(
          Window.partitionBy(idCol).orderBy(col("tfidf").desc, col("tok"))))
      .where(col("rank") <= k)
      .select(col(idCol), col("rank"), col("tok"), round(col("tfidf"), 6).as("tfidf"))
  }

  /**
   * BM25 ranking of documents against a bag of query terms
   * (k1 = 1.2, b = 0.75, idf = ln(1 + (N - df + 0.5)/(df + 0.5))).
   * Only documents containing at least one query term score (the
   * rest are irrelevant by construction). Returns the top `k` docs
   * by score descending, doc id ascending on ties.
   *
   * The query-term filter lands on the (doc, token) stream before
   * any join, so the scored stream is bounded by |terms| * |docs|
   * regardless of vocabulary size.
   */
  def bm25TopK(
      docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val tf = termFrequencies(docs, idCol, textCol)
    val dfT = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val corpus = docs.select(
      count(lit(1)).as("n_docs"),
      avg(size(split(col(textCol), " "))).as("avgdl"))
    val matched = tf.where(col("tok").isin(terms: _*))
    val perTerm = matched
      .join(dfT.where(col("tok").isin(terms: _*)), "tok")
      .crossJoin(corpus)
      .withColumn(
        "idf",
        log(lit(1.0) +
          (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn(
        "contrib",
        col("idf") * (col("tf") * (lit(k1) + 1.0)) /
          (col("tf") + lit(k1) *
            (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl"))))
    // Top-k FIRST (TakeOrderedAndProject: per-partition heads, no
    // global sort), then the ranking window runs over k rows only —
    // a global row_number over every scored doc would funnel the
    // whole result through one partition at scale.
    perTerm
      .groupBy(col(idCol))
      .agg(sum("contrib").as("score"), count(lit(1)).as("n_terms"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
      .withColumn(
        "rank",
        row_number().over(Window.orderBy(col("score").desc, col(idCol))))
      .select(col(idCol), col("rank"), col("n_terms"),
        round(col("score"), 6).as("score"))
  }

  /**
   * Shannon entropy of each document's token distribution (natural
   * log): H = ln(n) - (1/n) * sum(tf * ln(tf)) — the algebraic
   * rearrangement that needs only per-(doc,token) counts, so the
   * whole operator is the tf shuffle plus one per-doc reduction.
   * Low entropy flags repetitive/templated text (quality signal).
   */
  def tokenEntropy(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    termFrequencies(docs, idCol, textCol)
      .groupBy(col(idCol))
      .agg(
        sum("tf").as("n_tokens"),
        sum(col("tf").cast("double") * log(col("tf").cast("double"))).as("s"))
      .select(
        col(idCol),
        col("n_tokens"),
        round(log(col("n_tokens").cast("double")) - col("s") / col("n_tokens"), 6)
          .as("entropy"))
  }

  /**
   * Bigram language-model quality scoring (CCNet-style perplexity
   * filtering): train add-one-smoothed bigram MLE counts on the
   * corpus itself, then score every document by its mean log bigram
   * probability and the corresponding perplexity —
   * P(b|a) = (C(a,b) + 1) / (C(a) + V), V = the context vocabulary
   * (distinct tokens with at least one successor). Templated/natural
   * text scores low perplexity against a
   * model trained on the same corpus; gibberish and boilerplate-
   * stripped fragments score high — the classic LM quality dial.
   *
   * Docs with fewer than two tokens emit no bigrams and drop out.
   *
   * Scale: the bigram frame is ONE explode off the scan (no
   * self-join); model tables aggregate to distinct-bigram /
   * distinct-token cardinality — Zipf-sublinear in corpus size — and
   * join back on uniform bigram keys (the stopword-skewed context
   * join is AQE's skew-join case); V rides as a one-row cross join,
   * never a collect. At 100 TB the standard deployment prunes the
   * model to top-V bigrams and broadcasts it; the full-model join
   * here is the exact-oracle formulation.
   */
  def bigramLogProb(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val pairs = docs
      .select(col(idCol), split(col(textCol), " ").as("t"))
      .where(size(col("t")) >= 2)
      // sequence(1, 0) would DESCEND ([1,0]) rather than empty — the
      // size guard above keeps every sequence ascending.
      .select(col(idCol), explode(expr(
        "transform(sequence(1, size(t) - 1), " +
          "i -> struct(element_at(t, i) AS a, element_at(t, i + 1) AS b))"))
        .as("bg"))
      .select(col(idCol), col("bg.a").as("a"), col("bg.b").as("b"))
    val bg = pairs.groupBy("a", "b").agg(count(lit(1)).as("cab"))
    // Context totals C(a) = Σ_b C(a,b) ride a WINDOW over the
    // Zipf-bounded bigram table — not a second aggregation of the
    // corpus-sized pairs frame. (Deriving them via bg.groupBy looks
    // free but is not: without a cache the registry query would
    // re-execute the bigram subtree per statistic, and exchange reuse
    // cannot dedupe it — the HOF lambda ids inside defeat plan
    // canonicalization; measured, not guessed.) One (a,b)-keyed model
    // join then carries BOTH statistics to the scoring pass.
    val model = bg.withColumn(
      "ca", sum(col("cab")).over(Window.partitionBy(col("a"))))
    val voc = pairs.agg(countDistinct(col("a")).as("v"))
    val scored = pairs
      .join(model, Seq("a", "b"))
      .crossJoin(voc)
      .withColumn("lp",
        log((col("cab").cast("double") + 1.0) /
          (col("ca").cast("double") + col("v").cast("double"))))
    scored
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum("lp").as("slp"))
      .select(
        col(idCol),
        col("n_bigrams"),
        round(col("slp") / col("n_bigrams"), 6).as("avg_logp"),
        round(exp(-col("slp") / col("n_bigrams")), 6).as("ppl"))
  }

  /**
   * PMI collocation mining: pointwise mutual information of adjacent
   * token pairs, `pmi(a,b) = ln( P(a,b) / (P(a)·P(b)) )` with P(a,b)
   * over the bigram stream and P(·) over the token stream — the
   * classic phrase-detection signal ("new york" scores high because
   * the pair beats the independence assumption; "of the" scores ~0
   * because both halves are everywhere). Feeds tokenizer/vocab
   * curation: high-PMI pairs are merge candidates. `minCount` floors
   * the pair count — PMI's known failure mode is glorifying
   * one-off typo pairs, whose PMI is maximal.
   *
   * Scale: corpus-sized work is exactly two partial-combined
   * aggregations (bigram counts, unigram counts). Everything after
   * runs on the Zipf-bounded count tables: two token-keyed joins onto
   * the bigram table (hot function words are AQE's skew case) and the
   * corpus totals as one-row cross joins — the q71/q92 scalar
   * pattern, never a collect.
   */
  def pmiCollocations(
      docs: DataFrame, textCol: String, minCount: Long): DataFrame = {
    val toks = docs
      .select(explode(split(col(textCol), " ")).as("tok"))
    val uni = toks.groupBy("tok").agg(count(lit(1)).as("c"))
    val n = toks.agg(count(lit(1)).as("n"))
    val bg = docs
      .select(split(col(textCol), " ").as("t"))
      .where(size(col("t")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(t) - 1), " +
          "i -> struct(element_at(t, i) AS a, element_at(t, i + 1) AS b))"))
        .as("bg"))
      .select(col("bg.a").as("a"), col("bg.b").as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("cab"))
    // N₂ totals the FULL bigram stream — summing after the minCount
    // cut would inflate every survivor's P(a,b).
    val n2 = bg.agg(sum(col("cab")).as("n2"))
    bg.where(col("cab") >= minCount)
      .join(uni.select(col("tok").as("a"), col("c").as("ca")), Seq("a"))
      .join(uni.select(col("tok").as("b"), col("c").as("cb")), Seq("b"))
      .crossJoin(n).crossJoin(n2)
      .select(
        col("a"), col("b"), col("cab"),
        round(log(
          (col("cab").cast("double") / col("n2").cast("double")) /
            ((col("ca").cast("double") / col("n").cast("double")) *
              (col("cb").cast("double") / col("n").cast("double")))), 6)
          .as("pmi"))
  }

  /**
   * Document-level co-occurrence mining (market-basket over token
   * sets): pairs of tokens appearing together in >= `minSupport`
   * documents, with lift = P(a,b)/(P(a)·P(b)) — association strength
   * against independence. PMI's (q107) document-scoped sibling:
   * collocations score ADJACENCY, this scores topical co-presence
   * anywhere in the document.
   *
   * Scale — the Apriori candidate prune carries the operator: tokens
   * below `minSupport` document frequency cannot participate in a
   * frequent pair (support is anti-monotone), so they are dropped
   * BEFORE the pair fan-out. The per-doc self-join then expands only
   * frequent-token sets: fan-out is Σ_doc |frequent(doc)|², dialed by
   * minSupport, never vocabulary². One df aggregation, one doc-keyed
   * self-join, one pair aggregation (map-side combined); corpus size
   * rides a one-row cross join.
   */
  def cooccurrencePairs(
      docs: DataFrame, idCol: String, textCol: String,
      minSupport: Long): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1, got $minSupport")
    val toks = docs.select(
      col(idCol).as("__doc"),
      explode(array_distinct(split(col(textCol), " "))).as("tok"))
    val nDocs = docs.agg(count(lit(1)).as("__n"))
    val freq = toks.groupBy("tok").agg(count(lit(1)).as("df"))
      .where(col("df") >= minSupport)
    val ft = toks.join(freq, "tok")
    ft.select(col("__doc"), col("tok").as("tok_a"), col("df").as("__dfa"))
      .join(ft.select(col("__doc"), col("tok").as("tok_b"),
        col("df").as("__dfb")), "__doc")
      .where(col("tok_a") < col("tok_b"))
      .groupBy(col("tok_a"), col("tok_b"))
      .agg(
        count(lit(1)).as("n_both"),
        max(col("__dfa")).as("df_a"),
        max(col("__dfb")).as("df_b"))
      .where(col("n_both") >= minSupport)
      .crossJoin(nDocs)
      .select(
        col("tok_a"), col("tok_b"), col("n_both"),
        col("df_a"), col("df_b"),
        round(col("n_both").cast("double") * col("__n") /
          (col("df_a") * col("df_b")), 6).as("lift"))
  }

  /**
   * Vocabulary coverage curve: for each coverage target (e.g. 0.9 =
   * "90% of all token occurrences"), the smallest frequency-ranked
   * vocabulary that reaches it and the share that vocabulary actually
   * covers — the tokenizer-design dial ("how big must V be before
   * <unk> is rare"), and the empirical Zipf summary that q65's fixed
   * V=500 choice should be read against.
   *
   * Scale: token counting is one map-side partial-aggregated shuffle;
   * everything after runs on the DISTINCT-TOKEN table (Zipf-sublinear
   * in corpus size). The rank/cumsum over that table rides the
   * two-level bucketed decomposition ([[Ordinals.withOrdinals]]) —
   * count-descending range buckets rank in parallel, only the
   * `buckets`-row totals table crosses one tiny single-partition
   * window — so a billion-entry vocabulary never funnels through one
   * task (the un-partitioned `Window.orderBy` this replaces did).
   * Targets ride a broadcast nested-loop join (a handful of literal
   * rows).
   */
  def vocabCoverage(
      docs: DataFrame, textCol: String, targets: Seq[Double],
      buckets: Int = 64): DataFrame = {
    require(targets.nonEmpty && targets.forall(t => t > 0.0 && t <= 1.0),
      s"vocabCoverage: targets must be in (0,1], got $targets")
    val spark = docs.sparkSession
    import spark.implicits._
    val counts = docs
      .select(explode(split(col(textCol), " ")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
    val ranked = Ordinals.withOrdinals(
      counts, Seq(col("cnt").desc, col("token")), "rank",
      sums = Seq((col("cnt"), "cum")), buckets = buckets)
      .select(col("rank"), col("cum"))
    val total = counts.agg(sum(col("cnt")).as("__total"))
    val shares = ranked.crossJoin(total)
      .select(col("rank"),
        (col("cum").cast("double") / col("__total")).as("cum_share"))
    shares.join(targets.toDF("target"),
        col("cum_share") >= col("target"))
      .groupBy("target")
      .agg(
        min(col("rank")).as("vocab_size"),
        round(min_by(col("cum_share"), col("rank")), 6).as("cum_share"))
  }

  /**
   * Reciprocal-rank-fusion of ranked retrieval lists (Cormack et al.
   * 2009) — the standard hybrid-search combiner: fuse a sparse
   * (BM25) and a dense (cosine top-k) ranking without score
   * calibration, since RRF consumes only RANKS:
   * `score(d) = Σ_lists 1/(kRrf + rank_list(d))`, missing-from-list
   * contributes 0. Each input must carry (idCol, rank) — the shape
   * [[bm25TopK]] and [[graft.operators.Similarity.cosineTopK]]
   * produce (single-probe slices of the latter).
   *
   * Output: one row per fused candidate, the per-list ranks as
   * `<name>_rank` columns (NULL where the list missed the doc),
   * `rrf_score`, and the fused `rank` (score desc, id asc — the
   * family's total tie rule), cut to top `k`.
   *
   * Determinism: each 1/(kRrf+rank) term quantizes to DECIMAL(38,12)
   * before the cross-list sum, so fusion of ANY number of lists is
   * partition-order-independent (a raw double Σ is safe only for two
   * lists, where IEEE commutativity suffices).
   *
   * Scale: inputs are top-k lists — the union is ≤ Σ|lists|·k rows
   * BY CONSTRUCTION, so the fuse groupBy, the rank window, and the
   * final cut all run at candidate cardinality, independent of the
   * corpus the lists were retrieved from.
   */
  def rrfFuse(
      rankings: Seq[(String, DataFrame)], idCol: String,
      k: Int, kRrf: Int = 60): DataFrame = {
    require(rankings.size >= 2, "rrfFuse needs at least two ranked lists")
    require(kRrf > 0, s"kRrf must be positive, got $kRrf")
    require(rankings.map(_._1).distinct.size == rankings.size,
      s"ranked-list names must be distinct (a duplicate silently merges " +
        s"two lists under one tag): ${rankings.map(_._1)}")
    val tagged = rankings.map { case (name, df) =>
      df.select(
        col(idCol), lit(name).as("__list"),
        col("rank").cast("int").as("__r"))
    }.reduce(_.unionByName(_))
    val term = round(lit(1.0) / (lit(kRrf.toDouble) + col("__r").cast("double")), 12)
      .cast(DecimalType(38, 12))
    val perList = rankings.map { case (name, _) =>
      max(when(col("__list") === name, col("__r"))).as(s"${name}_rank")
    }
    val fused = tagged
      .groupBy(col(idCol))
      .agg(perList.head, (perList.tail :+ sum(term).as("__rrf")): _*)
    // Top-k FIRST (TakeOrderedAndProject), then the rank window sees
    // k rows only — the bm25TopK discipline.
    fused
      .orderBy(col("__rrf").desc, col(idCol))
      .limit(k)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("__rrf").desc, col(idCol))))
      .select(
        (col(idCol) +: rankings.map { case (name, _) => col(s"${name}_rank") }) ++
          Seq(col("rank"),
            round(col("__rrf").cast("double"), 6).as("rrf_score")): _*)
  }

  /**
   * T53: RAKE keyphrase extraction (Rose et al. 2010, the
   * stopword-delimited classic) — corpus-level keyphrases WITHOUT a
   * model: candidate phrases are maximal stopword-free token runs;
   * each word scores degree/frequency (degree = Σ length of phrases
   * containing it — words living in LONG phrases score higher,
   * pure-frequency words lower), and a phrase scores the sum of its
   * words' scores. The cheap "what is this corpus about" readout for
   * mixture construction and topic drift checks between snapshots.
   *
   * Pipeline: one posexplode + per-doc position window assigns
   * phrase ids (a stop token increments the id — phrases can never
   * span documents); phrase assembly is an array_sort over
   * (pos, tok) structs (collect_list order is nondeterministic —
   * never trust it bare); word stats are one vocabulary-sized
   * aggregate; phrase scores re-join word scores round(12)-staged
   * into DECIMAL(38,12) (q155 discipline — same phrase text ⇒ same
   * token multiset ⇒ identical exact sum, so the corpus-level MAX is
   * a no-op dedup). Top-k by (rounded score desc, phrase) rides
   * TakeOrderedAndProject; scores positive (no signed-zero
   * exposure).
   *
   * Output: (phrase, n_words, n_occurrences, score), top `k`.
   */
  def rakeKeyphrases(
      docs: DataFrame, idCol: String, textCol: String,
      stopwords: Seq[String], k: Int): DataFrame = {
    require(stopwords.nonEmpty, "RAKE needs a stopword delimiter set")
    require(k >= 1, s"k must be >= 1, got $k")
    val toks = docs
      .where(col(textCol).isNotNull)
      .select(col(idCol).as("__id"),
        posexplode(split(col(textCol), " ")).as(Seq("__pos", "__tok")))
    val w = Window.partitionBy(col("__id")).orderBy(col("__pos"))
    val phased = toks
      .withColumn("__stop", col("__tok").isin(stopwords: _*))
      .withColumn("__pid",
        sum(when(col("__stop"), 1L).otherwise(0L)).over(w))
    val words = phased
      .where(!col("__stop") && length(col("__tok")) > 0)
      .select(col("__id"), col("__pid"), col("__pos"), col("__tok"))
    val phrases = words
      .groupBy(col("__id"), col("__pid"))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("__pos"), col("__tok")))),
            s => s.getField("__tok")), " ").as("phrase"),
        count(lit(1)).as("__len"))
    val wordScores = words
      .join(phrases.select(col("__id"), col("__pid"), col("__len")),
        Seq("__id", "__pid"))
      .groupBy(col("__tok"))
      .agg(count(lit(1)).as("__freq"), sum(col("__len")).as("__deg"))
      .select(col("__tok"),
        round(col("__deg").cast("double") / col("__freq").cast("double"),
          12).cast(DecimalType(38, 12)).as("__ws"))
    val scored = words
      .join(wordScores, Seq("__tok"))
      .groupBy(col("__id"), col("__pid"))
      .agg(sum(col("__ws")).as("__s"))
      .join(phrases, Seq("__id", "__pid"))
    scored
      .groupBy(col("phrase"))
      .agg(
        max(col("__len")).as("n_words"),
        count(lit(1)).as("n_occurrences"),
        round(max(col("__s")).cast("double"), 6).as("score"))
      .orderBy(col("score").desc, col("phrase"))
      .limit(k)
  }

  /**
   * T54: corpus divergence readout — add-one-smoothed unigram KL
   * divergence between two corpus slices, both directions, plus the
   * vocabulary-overlap facts behind it. THE mixture-drift dial: when
   * a new crawl snapshot, a filtered subset, or a candidate source
   * must be compared against the corpus it is supposed to resemble,
   * KL(new‖ref) prices "how surprised is the reference model by the
   * new text" (cf. the CCNet/DSIR importance-weighting family, which
   * consumes exactly these log-ratio terms). Asymmetry is signal:
   * KL(A‖B) ≫ KL(B‖A) says A has mass where B has almost none.
   *
   * Smoothing: p_X(t) = (c_X(t)+1)/(N_X+V) over the UNION vocabulary
   * V — both slices become full-support distributions, so every term
   * is finite and the divergences are true KLs (≥ 0).
   *
   * ENGINE-EXACT: counts are exact longs; each token's contribution
   * p_A·ln(p_A/p_B) is a fixed IEEE sequence on identical doubles,
   * rounded HALF_UP to 12dp and summed as DECIMAL(38,12) (the q155/
   * q240 per-term discipline — exact, partition-order-free); the two
   * final sums surface as round(·, 6) doubles.
   *
   * Scale: one token explode + one (grp, token) count shuffle, a
   * full-outer token-key join of the two Zipf-bounded count tables,
   * scalar totals on one-row broadcast cross joins. Nothing touches
   * pairs of documents.
   */
  def corpusDivergence(
      docs: DataFrame, groupCol: String, textCol: String,
      corpusA: String, corpusB: String): DataFrame = {
    require(corpusA != corpusB, "corpusA and corpusB must differ")
    val toks = docs
      .where(col(groupCol) === corpusA || col(groupCol) === corpusB)
      .select(col(groupCol).as("__g"),
        explode(split(col(textCol), " ")).as("tok"))
    val counts = toks.groupBy("tok")
      .agg(
        sum(when(col("__g") === corpusA, 1L).otherwise(0L)).as("ca"),
        sum(when(col("__g") === corpusB, 1L).otherwise(0L)).as("cb"))
      .barriered // consumed by totals AND the term pass
    val tot = counts.agg(
      count(lit(1)).as("vocab_size"),
      sum(col("ca")).as("na"),
      sum(col("cb")).as("nb"),
      sum(when(col("ca") > 0L && col("cb") > 0L, 1L).otherwise(0L))
        .as("shared_vocab"))
    val pa = (col("ca") + lit(1L)).cast("double") /
      (col("na") + col("vocab_size")).cast("double")
    val pb = (col("cb") + lit(1L)).cast("double") /
      (col("nb") + col("vocab_size")).cast("double")
    val terms = counts.crossJoin(tot)
      .select(
        round(pa * log(pa / pb), 12).cast(DecimalType(38, 12))
          .as("__tab"),
        round(pb * log(pb / pa), 12).cast(DecimalType(38, 12))
          .as("__tba"))
      .agg(
        sum(col("__tab")).as("__kab"),
        sum(col("__tba")).as("__kba"))
    tot.crossJoin(terms)
      .select(col("vocab_size"), col("shared_vocab"),
        col("na").as("tokens_a"), col("nb").as("tokens_b"),
        round(col("__kab").cast("double"), 6).as("kl_ab"),
        round(col("__kba").cast("double"), 6).as("kl_ba"))
  }
}
