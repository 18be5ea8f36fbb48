package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Blocked fuzzy matching: find near-identical string pairs (entity
 * resolution / catalog dedup) with an edit-distance predicate, made
 * scale-safe by BLOCKING — candidates are generated only within
 * groups sharing a cheap deterministic key, never all-pairs.
 *
 * Scale posture: the self-join hashes both sides on the block key,
 * so candidate volume is Σ |block|² over blocks, not |table|² — the
 * block key is chosen to keep blocks small (a token, a prefix, a
 * phonetic code). The edit-distance filter runs post-join inside
 * codegen (`levenshtein` with a max-distance bound short-circuits).
 * A pathological mega-block is a key-skew problem: AQE's skew-join
 * split handles moderate cases; beyond that, re-block with a finer
 * key. All-pairs mode is deliberately not offered.
 *
 * CHOOSING THE KEY (audited, [[graft.BlockAudit]] / SCALE.md "Fuzzy
 * blocking"): a fixed-vocabulary key — q130's first word of `p_name`
 * is 8 distinct values on the synthetic corpus — has NO skew (every
 * block ~12.5%, salt buys nothing) but block size |table|/|vocab|
 * grows linearly with the corpus, so Σ|block|² grows QUADRATICALLY
 * (5.0e7 candidate pairs at sf0.1 → 5.0e9 at 10×). The dial that
 * works is a finer composite key — (first word, p_size) measured 49×
 * fewer candidates (400 blocks, max 73 rows) — because it multiplies
 * the block COUNT; salting only re-spreads a quadratic total.
 * `capPerBlock` is the safety rail when the key's cardinality can't
 * be raised further: it hard-bounds the worst block at the cost of
 * documented recall loss.
 */
object Fuzzy {

  /**
   * Deterministic block-size bound: keep the `cap` lowest-id rows of
   * each block (capPerKey's WindowGroupLimit shape — each task trims
   * to ≤ cap BEFORE the exchange). `cap <= 0` means uncapped. Pairs
   * among dropped rows are LOST — this is the documented recall
   * tradeoff for a hard Σ|block|² ≤ blocks·cap² worst case; prefer a
   * finer composite key when one exists.
   */
  private def capped(df: DataFrame, idCol: String, cap: Int): DataFrame =
    if (cap <= 0) df
    else {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("__blk")).orderBy(col(idCol))
      df.withColumn("__bn", row_number().over(w))
        .where(col("__bn") <= cap)
        .drop("__bn")
    }

  /**
   * Near-identical pairs of `nameCol` values within blocks of
   * `blockKey`, at levenshtein distance in (0, maxDist]. Exact
   * duplicates are excluded (distance 0 — that's `Dedup.exact`'s
   * job); each unordered pair appears once (id_a < id_b).
   * `capPerBlock` > 0 bounds every block (see [[capped]]).
   */
  def blockedPairs(
      df: DataFrame, idCol: String, nameCol: String,
      blockKey: Column, maxDist: Int, capPerBlock: Int = 0): DataFrame = {
    val base = capped(df.select(
      col(idCol), col(nameCol), blockKey.as("__blk")), idCol, capPerBlock)
    val a = base.select(
      col(idCol).as("id_a"), col(nameCol).as("name_a"), col("__blk"))
    val b = base.select(
      col(idCol).as("id_b"), col(nameCol).as("name_b"), col("__blk"))
    a.join(b, "__blk")
      .where(col("id_a") < col("id_b"))
      // 3-arg levenshtein stops early past the bound: the common
      // (far-apart) case costs O(maxDist * len), not O(len^2).
      .withColumn("dist", levenshtein(col("name_a"), col("name_b"), maxDist))
      .where(col("dist").between(1, maxDist))
      .drop("__blk")
  }

  /**
   * Blocked Jaro–Winkler pairs: [[blockedPairs]]' candidate shape
   * with the JW kernel ([[graft.functions.JaroWinklerSim]]) instead
   * of levenshtein — the name/title matcher (prefix-weighted,
   * transposition-tolerant) that edit distance mis-ranks. Same scale
   * contract: candidates confined to blocks, kernel post-join in
   * codegen, all-pairs deliberately not offered. `capPerBlock` > 0
   * bounds every block (see [[capped]]).
   */
  def jaroWinklerPairs(
      df: DataFrame, idCol: String, nameCol: String,
      blockKey: Column, threshold: Double, capPerBlock: Int = 0)
      : DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0,1], got $threshold")
    val base = capped(df.select(
      col(idCol), col(nameCol), blockKey.as("__blk")), idCol, capPerBlock)
    val a = base.select(
      col(idCol).as("id_a"), col(nameCol).as("name_a"), col("__blk"))
    val b = base.select(
      col(idCol).as("id_b"), col(nameCol).as("name_b"), col("__blk"))
    a.join(b, "__blk")
      .where(col("id_a") < col("id_b"))
      .withColumn("jw",
        graft.functions.JaroWinklerSim(col("name_a"), col("name_b")))
      .where(col("jw") >= threshold)
      .drop("__blk")
  }

  /**
   * Sorted-neighborhood matching (Hernández–Stolfo): sort the table
   * by a cheap key, then compare each row only to its `windowSize`
   * successors in that order — candidate volume is EXACTLY n·w,
   * independent of block-size skew (the failure mode of
   * [[blockedPairs]] when a block key collapses). Recall depends on
   * the sort key putting near-duplicates adjacent — the standard
   * multi-pass remedy is unioning runs over different keys.
   *
   * Distributed mechanics: the global sequence number comes from the
   * two-level bucketed ordinal ([[Ordinals.withOrdinals]] — range
   * buckets rank in parallel, offsets ride a `buckets`-row window),
   * keeping the whole operator in DataFrame land and whole-stage
   * codegen — no RDD round-trip, no single-task global window.
   * Neighbor pairs come from an equi-join of rank against rank+i
   * (i ≤ w, exploded), so the candidate stage is shuffle-bounded at
   * n·w rows; the verify kernel (n-gram Jaccard) runs only on those.
   */
  def sortedNeighborhood(
      df: DataFrame, idCol: String, textCol: String, sortKey: Column,
      windowSize: Int, threshold: Double, shingleSize: Int = 3)
      : DataFrame = {
    require(windowSize >= 1, s"windowSize must be >= 1, got $windowSize")
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0,1], got $threshold")
    val base = df.select(col(idCol).cast("long").as("__id"),
      col(textCol).as("__text"), sortKey.as("__k"))
    val indexed = Ordinals.withOrdinals(
      base, Seq(col("__k"), col("__id")), "__rank", buckets = 64)
      .select(col("__rank"), col("__id"), col("__text"))
    val a = indexed.select(col("__rank"), col("__id").as("doc_a"),
      col("__text").as("__ta"))
    val b = indexed
      .withColumn("__i",
        explode(sequence(lit(1), lit(windowSize))))
      .select((col("__rank") - col("__i")).as("__rank"),
        col("__id").as("doc_b"), col("__text").as("__tb"))
    a.join(b, "__rank")
      .select(
        least(col("doc_a"), col("doc_b")).as("doc_a"),
        greatest(col("doc_a"), col("doc_b")).as("doc_b"),
        graft.functions.NGramJaccardSim(
          col("__ta"), col("__tb"), shingleSize).as("__j"))
      .select(col("doc_a"), col("doc_b"),
        col("__j.jaccard").as("jaccard"))
      .where(col("jaccard") >= threshold)
      .distinct()
  }

  /**
   * Sorted-neighborhood CANDIDATE pairs without a verify kernel:
   * [[sortedNeighborhood]]'s rank-adjacency stage alone — each row
   * paired with its `windowSize` successors under the (sortKey, id)
   * total order, exactly n·w unordered pairs with id_a < id_b. The
   * generic blocking front end for pair scorers that bring their own
   * comparison model (e.g. [[fellegiSunter]]) instead of text
   * Jaccard. Same distributed mechanics: two-level bucketed ordinals
   * ([[Ordinals.withOrdinals]]), rank-vs-rank+i equi-join, no
   * single-task window, candidate volume independent of key skew.
   */
  def sortedNeighborhoodCandidates(
      df: DataFrame, idCol: String, sortKey: Column,
      windowSize: Int): DataFrame = {
    require(windowSize >= 1, s"windowSize must be >= 1, got $windowSize")
    val base = df.select(col(idCol).cast("long").as("__id"),
      sortKey.as("__k"))
    val indexed = Ordinals.withOrdinals(
      base, Seq(col("__k"), col("__id")), "__rank", buckets = 64)
      .select(col("__rank"), col("__id"))
    val a = indexed.select(col("__rank"), col("__id").as("id_a"))
    val b = indexed
      .withColumn("__i", explode(sequence(lit(1), lit(windowSize))))
      .select((col("__rank") - col("__i")).as("__rank"),
        col("__id").as("id_b"))
    a.join(b, "__rank")
      .select(
        least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"))
      .distinct()
  }

  /**
   * D19: Fellegi–Sunter probabilistic record-linkage scoring
   * (Fellegi & Sunter 1969, JASA — the canonical match/non-match
   * log-likelihood model behind every serious entity-resolution
   * stack): each candidate pair gets, per comparison field, an
   * AGREEMENT weight log₂(m/u) or DISAGREEMENT weight
   * log₂((1−m)/(1−u)), and the pair's score is the sum — high scores
   * are probable matches, strongly negative scores probable
   * non-matches, the middle band goes to clerical review.
   *
   * `m` (P(field agrees | pair is a true match)) is supplied per
   * field — the reviewer-calibrated dial, as in production use
   * without labeled EM training data. `u` (P(field agrees | random
   * non-match)) is ESTIMATED FROM THE DATA as the exact random-pair
   * agreement probability: Σ_v cnt_v·(cnt_v−1) / (N·(N−1)) over the
   * field's non-null value counts — the frequency-table estimator,
   * which automatically makes rare-value agreement (matching on an
   * unusual name) worth more than common-value agreement. `u` is
   * clamped to [1/(N·(N−1)), 1 − 1/(N·(N−1))] so degenerate fields
   * (all-distinct or single-valued) yield finite weights instead of
   * ±∞; a field with fewer than two non-null records (where the
   * clamp itself degenerates — N·(N−1) = 0) contributes weight 0
   * both ways, the same "no evidence" convention as a NULL
   * comparison.
   *
   * ENGINE-EXACT: weights are per-FIELD scalars — each is one IEEE
   * division + one log₂, rounded to 6dp (the house ln-output
   * contract), then the per-pair score is an exact DECIMAL(18,6) sum
   * of those 6dp constants selected by the agreement pattern —
   * partition-order-free. A NULL on either side contributes weight 0
   * (the standard missing-data convention) and a `-` in the pattern.
   *
   * Scale: u estimation is one groupBy per field over the RECORDS
   * (not pairs), unioned into a ≤|fields|-row weight table that
   * broadcast-joins onto the melted pair×field frame; the only big
   * shuffle is the pairs melt re-aggregation, O(|pairs|·|fields|).
   * Candidate pairs come from the caller's blocking
   * ([[sortedNeighborhoodCandidates]], [[blockedPairs]],
   * `Dedup.minhashCandidates`) — all-pairs is deliberately not
   * offered.
   *
   * Output: (id_a, id_b, pattern, n_agree, score) — `pattern` is the
   * γ-vector rendered in field order ('1' agree / '0' disagree /
   * '-' null), score the 6dp decimal sum.
   */
  def fellegiSunter(
      records: DataFrame, idCol: String, pairs: DataFrame,
      fields: Seq[(String, Double)]): DataFrame = {
    require(fields.nonEmpty, "fields must be non-empty")
    fields.foreach { case (f, m) =>
      require(m > 0.0 && m < 1.0, s"m for $f must be in (0,1), got $m")
    }
    // Per-field scalar weights: exact integer agreement mass over the
    // value-frequency tables — ONE melted records scan serves every
    // field (|fields| separate scans would multiply the 100 TB read),
    // one (field, value) count shuffle, then a |fields|-row reduce.
    // The melt renders values as strings for the shared shuffle; two
    // distinct values of one field never collide as strings for
    // int/string/decimal fields, and the one float edge (-0.0 vs 0.0
    // render apart but compare equal) only perturbs u's estimate, not
    // the pair scoring, which compares the RAW typed columns.
    val mLit = fields.foldLeft(lit(null).cast("double")) {
      case (acc, (f, m)) => when(col("field") === f, lit(m)).otherwise(acc)
    }
    val weights = records
      .select(explode(array(fields.map { case (f, _) =>
        struct(lit(f).as("field"), col(f).cast("string").as("value"))
      }: _*)).as("__fv"))
      .select(col("__fv.field").as("field"), col("__fv.value").as("value"))
      .where(col("value").isNotNull)
      .groupBy("field", "value").agg(count(lit(1)).as("__c"))
      .groupBy("field")
      .agg(
        sum(col("__c") * (col("__c") - 1L)).as("__agree"),
        sum(col("__c")).as("__n"))
      .select(col("field"), col("__agree"), col("__n"),
        // N < 2 makes N·(N−1) = 0 — NULL the divisor (ANSI Spark
        // throws on ANY /0, and CSE hoists the division out of
        // when() guards, so guarding the output alone cannot help);
        // NULL propagates through the clamp to a NULL u, which the
        // weight guard below resolves to 0.
        when(col("__n") >= 2L,
          (col("__n") * (col("__n") - 1L)).cast("double")).as("__nn1"))
      .select(col("field"),
        // clamp into the open unit interval at 1/(N(N-1)) so
        // all-distinct (u=0) and constant (u=1) fields stay finite
        greatest(
          least(
            col("__agree").cast("double") / col("__nn1"),
            lit(1.0) - lit(1.0) / col("__nn1")),
          lit(1.0) / col("__nn1"))
          .as("u"),
        mLit.as("m"), col("__n"))
      .select(col("field"),
        // a field with one non-null record carries no agreement
        // evidence at all (u is NULL above), so it contributes
        // weight 0 both ways — the same convention as a NULL
        // comparison — keeping the finite-weights contract.
        // Inactive on any field with ≥ 2 non-null records, so
        // gate-scale oracles need no mirror.
        when(col("__n") >= 2L, round(log2(col("m") / col("u")), 6))
          .otherwise(lit(0.0))
          .cast("decimal(18,6)").as("w_agree"),
        when(col("__n") >= 2L,
          round(log2((lit(1.0) - col("m")) / (lit(1.0) - col("u"))), 6))
          .otherwise(lit(0.0))
          .cast("decimal(18,6)").as("w_disagree"))

    // Wide pass over the joined pair: per-field agreement flag
    // ('1'/'0'/'-') computed once, reused by pattern AND the melt.
    val ra = records.select(col(idCol).as("id_a") +:
      fields.map { case (f, _) => col(f).as(s"__a_$f") }: _*)
    val rb = records.select(col(idCol).as("id_b") +:
      fields.map { case (f, _) => col(f).as(s"__b_$f") }: _*)
    val flagged = pairs.select("id_a", "id_b")
      .join(ra, "id_a").join(rb, "id_b")
      .select(col("id_a") +: col("id_b") +:
        fields.map { case (f, _) =>
          when(col(s"__a_$f").isNull || col(s"__b_$f").isNull, lit("-"))
            .when(col(s"__a_$f") === col(s"__b_$f"), lit("1"))
            .otherwise(lit("0")).as(s"__g_$f")
        }: _*)

    // Melt to (pair, field, flag) carrying the pattern as a grouping
    // key (functionally dependent on the pair — grouping by it is
    // free and avoids a second consumer of the joined frame, the
    // q127 pruning-vs-reuse gotcha), broadcast-join the weight
    // table, sum the selected 6dp decimals exactly.
    val melted = flagged
      .withColumn("pattern",
        concat(fields.map { case (f, _) => col(s"__g_$f") }: _*))
      .select(col("id_a"), col("id_b"), col("pattern"),
        explode(array(fields.map { case (f, _) =>
          struct(lit(f).as("field"), col(s"__g_$f").as("flag"))
        }: _*)).as("__fx"))
      .select(col("id_a"), col("id_b"), col("pattern"),
        col("__fx.field").as("field"), col("__fx.flag").as("flag"))
    melted
      .join(broadcast(weights), "field")
      .groupBy("id_a", "id_b", "pattern")
      .agg(
        sum(when(col("flag") === "1", lit(1)).otherwise(lit(0)))
          .as("n_agree"),
        sum(when(col("flag") === "1", col("w_agree"))
          .when(col("flag") === "0", col("w_disagree"))
          .otherwise(lit(BigDecimal(0)).cast("decimal(18,6)")))
          .as("__score"))
      .select(col("id_a"), col("id_b"), col("pattern"), col("n_agree"),
        // exact decimal sum, surfaced as DOUBLE (house output contract
        // — a 6dp decimal converts to its nearest double identically
        // on every engine)
        col("__score").cast("decimal(18,6)").cast("double").as("score"))
  }

  /**
   * D23 (r12): TERM-FREQUENCY-adjusted Fellegi–Sunter scoring — the
   * Splink-default refinement of [[fellegiSunter]]: agreement on a
   * COMMON value is much weaker evidence than agreement on a rare
   * one ("SMITH" vs "FEATHERSTONEHAUGH"), so the agreement weight is
   * computed PER VALUE, not per field. Under the copy model,
   * P(both records carry v AND agree | match) ≈ p_v·m and
   * P(… | non-match) = p_v², so the likelihood ratio for agreement
   * on v is m/p_v — i.e. the global u is replaced by the value's own
   * frequency share u_v = p_v = cnt_v / N (the probability a random
   * other record agrees GIVEN yours carries v). Common values
   * (p_v > m) legitimately score NEGATIVE agreement weight.
   * Disagreement keeps [[fellegiSunter]]'s global-u weight (a
   * disagreement carries no value to condition on).
   *
   * ENGINE-EXACT: per-(field, value) agreement weights are one IEEE
   * division + one log₂ each, rounded to 6dp; per-field disagreement
   * weights identical to [[fellegiSunter]]'s (same clamps, same
   * no-evidence rules); the per-pair score is an exact
   * DECIMAL(18,6) sum of those 6dp constants — order-free.
   *
   * Scale: the value-frequency table is ONE melted records scan +
   * one (field, value) count shuffle — value-cardinality, NOT
   * broadcast (unlike the |fields|-row disagreement dim): it joins
   * the melted pair frame with a key-partitioned hash join on
   * (field, value); AQE broadcasts it when small. The melt uses the
   * string render (the [[fellegiSunter]] caveat: the one float edge
   * −0.0/0.0 renders apart but compares equal — both renders exist
   * in the table, so the agreement lookup NEVER misses; only the
   * frequency estimate splits across the two renders).
   *
   * Output: (id_a, id_b, pattern, n_agree, score) — the
   * [[fellegiSunter]] shape with tf-adjusted scores.
   */
  def fellegiSunterTf(
      records: DataFrame, idCol: String, pairs: DataFrame,
      fields: Seq[(String, Double)]): DataFrame = {
    require(fields.nonEmpty, "fields must be non-empty")
    fields.foreach { case (f, m) =>
      require(m > 0.0 && m < 1.0, s"m for $f must be in (0,1), got $m")
    }
    val mLit = fields.foldLeft(lit(null).cast("double")) {
      case (acc, (f, m)) => when(col("field") === f, lit(m)).otherwise(acc)
    }
    // ONE melted scan feeds BOTH weight tables: per-(field, value)
    // counts (the tf table) and their per-field rollup (the global-u
    // disagreement dim) — barriered so the records scan runs once.
    val valueCounts = Barrier.barrier(records
      .select(explode(array(fields.map { case (f, _) =>
        struct(lit(f).as("field"), col(f).cast("string").as("value"))
      }: _*)).as("__fv"))
      .select(col("__fv.field").as("field"), col("__fv.value").as("value"))
      .where(col("value").isNotNull)
      .groupBy("field", "value").agg(count(lit(1)).as("__c")))
    val perField = valueCounts
      .groupBy("field")
      .agg(
        sum(col("__c") * (col("__c") - 1L)).as("__agree"),
        sum(col("__c")).as("__n"))
      .select(col("field"), col("__agree"), col("__n"),
        when(col("__n") >= 2L,
          (col("__n") * (col("__n") - 1L)).cast("double")).as("__nn1"))
      .select(col("field"), col("__n"),
        greatest(
          least(
            col("__agree").cast("double") / col("__nn1"),
            lit(1.0) - lit(1.0) / col("__nn1")),
          lit(1.0) / col("__nn1"))
          .as("u"),
        mLit.as("m"))
    val disagree = perField
      .select(col("field"),
        when(col("__n") >= 2L,
          round(log2((lit(1.0) - col("m")) / (lit(1.0) - col("u"))), 6))
          .otherwise(lit(0.0))
          .cast("decimal(18,6)").as("w_disagree"))
    // tf table: w_agree(v) = log2(m / (cnt_v / N_f)), one row per
    // observed (field, value)
    val tfWeights = valueCounts
      .join(broadcast(perField.select(col("field"), col("__n"))), "field")
      .select(col("field"), col("value"),
        round(log2(mLit /
          (col("__c").cast("double") / col("__n").cast("double"))), 6)
          .cast("decimal(18,6)").as("w_agree_v"))

    val ra = records.select(col(idCol).as("id_a") +:
      fields.map { case (f, _) => col(f).as(s"__a_$f") }: _*)
    val rb = records.select(col(idCol).as("id_b") +:
      fields.map { case (f, _) => col(f).as(s"__b_$f") }: _*)
    val flagged = pairs.select("id_a", "id_b")
      .join(ra, "id_a").join(rb, "id_b")
      .select(col("id_a") +: col("id_b") +:
        (fields.map { case (f, _) =>
          when(col(s"__a_$f").isNull || col(s"__b_$f").isNull, lit("-"))
            .when(col(s"__a_$f") === col(s"__b_$f"), lit("1"))
            .otherwise(lit("0")).as(s"__g_$f")
        } ++ fields.map { case (f, _) =>
          col(s"__a_$f").cast("string").as(s"__v_$f")
        }): _*)
    val melted = flagged
      .withColumn("pattern",
        concat(fields.map { case (f, _) => col(s"__g_$f") }: _*))
      .select(col("id_a"), col("id_b"), col("pattern"),
        explode(array(fields.map { case (f, _) =>
          struct(lit(f).as("field"), col(s"__g_$f").as("flag"),
            // the agreed value rides the melt ONLY for '1' rows —
            // keeps the tf join selective and NULL-joins impossible
            when(col(s"__g_$f") === "1", col(s"__v_$f"))
              .as("value"))
        }: _*)).as("__fx"))
      .select(col("id_a"), col("id_b"), col("pattern"),
        col("__fx.field").as("field"), col("__fx.flag").as("flag"),
        col("__fx.value").as("value"))
    melted
      .join(tfWeights, Seq("field", "value"), "left")
      .join(broadcast(disagree), "field")
      .groupBy("id_a", "id_b", "pattern")
      .agg(
        sum(when(col("flag") === "1", lit(1)).otherwise(lit(0)))
          .as("n_agree"),
        sum(when(col("flag") === "1", col("w_agree_v"))
          .when(col("flag") === "0", col("w_disagree"))
          .otherwise(lit(BigDecimal(0)).cast("decimal(18,6)")))
          .as("__score"))
      .select(col("id_a"), col("id_b"), col("pattern"), col("n_agree"),
        col("__score").cast("decimal(18,6)").cast("double").as("score"))
  }

  /**
   * D22: EM-estimated Fellegi–Sunter parameters (Winkler 1988; the
   * Splink production shape) — [[fellegiSunter]] scores with
   * reviewer-supplied m; this learns per-field m AND u (and the
   * match prevalence λ) from the candidate pairs themselves, no
   * labels needed: E-step scores every γ-pattern's match posterior
   * under the current parameters, M-step re-estimates each field's
   * agreement rates weighted by those posteriors, `iters` fixed
   * rounds (the engine-reproducibility contract — a convergence test
   * on floats is not portable).
   *
   * THE SCALE TRICK (why EM is cheap at 100 TB): the posterior
   * depends only on the γ-PATTERN, so the pairs melt to a pattern
   * histogram ONCE — one partial-aggregated shuffle over the
   * candidate pairs — and EM iterates on that ≤ 3^|fields|-row table
   * driver-side (a documented bounded collect, the k-means/BPE
   * driver-loop contract; |fields| ≤ 10 keeps it ≤ 59049 rows).
   *
   * ENGINE-EXACT (oracle-replayable, the q200/q268 discipline):
   * parameters live as MICRO-unit longs (floor(x·10⁶), clamped to
   * [1, 999999] so no absorbing 0/1 state). Per round, each
   * pattern's posterior is a fixed IEEE chain — λ and the per-field
   * terms multiplied in field order — floored to micro-units; the
   * M-step numerators/denominators are exact long sums of
   * cnt·posteriorµ (< 2⁵³ for any real candidate volume, so the
   * oracle's DOUBLE casts are exact), finished by one IEEE division
   * + floor. The whole loop unrolls as a DuckDB materialized-CTE
   * chain with zero rounding-rule exposure. A field whose pattern
   * mass is all '-' (or whose posterior mass degenerates to zero)
   * keeps its previous parameters — and the oracle mirrors that
   * guard exactly (r12 ADVICE fix: zero/NULL M-step denominators
   * keep the prior round's value instead of dividing).
   *
   * Output: one row per field — (field, m, u, lambda), λ repeated
   * per row (a model-level scalar), all values micro-grid DOUBLEs.
   */
  def fellegiSunterEm(
      records: DataFrame, idCol: String, pairs: DataFrame,
      fields: Seq[String], iters: Int = 4,
      m0: Double = 0.9, u0: Double = 0.1,
      lambda0: Double = 0.1): DataFrame = {
    require(fields.nonEmpty, "fields must be non-empty")
    require(fields.size <= 10,
      s"at most 10 comparison fields (the driver-collected pattern " +
        s"histogram is <= 3^|fields| rows), got ${fields.size}")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(m0 > 0 && m0 < 1 && u0 > 0 && u0 < 1 &&
      lambda0 > 0 && lambda0 < 1, "priors must be in (0,1)")
    val spark = records.sparkSession
    val F = fields.size
    val ra = records.select(col(idCol).as("id_a") +:
      fields.map(f => col(f).as(s"__a_$f")): _*)
    val rb = records.select(col(idCol).as("id_b") +:
      fields.map(f => col(f).as(s"__b_$f")): _*)
    // the one distributed pass: pairs -> γ-pattern histogram
    val pats = pairs.select("id_a", "id_b")
      .join(ra, "id_a").join(rb, "id_b")
      .select(concat(fields.map { f =>
        when(col(s"__a_$f").isNull || col(s"__b_$f").isNull, lit("-"))
          .when(col(s"__a_$f") === col(s"__b_$f"), lit("1"))
          .otherwise(lit("0"))
      }: _*).as("pattern"))
      .groupBy("pattern").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    def clampMicro(x: Double): Long =
      math.max(1L, math.min(999999L, math.floor(x).toLong))
    val mM = Array.fill(F)(math.floor(m0 * 1e6).toLong)
    val uM = Array.fill(F)(math.floor(u0 * 1e6).toLong)
    var lamM = math.floor(lambda0 * 1e6).toLong
    for (_ <- 1 to iters) {
      // E-step: per-pattern match posterior in micro-units; the
      // product is λ·t₁·t₂·…·t_F in FIELD ORDER (the oracle mirrors
      // this exact IEEE sequence)
      val post = pats.map { case (g, _) =>
        var wm = lamM.toDouble / 1e6
        var wu = 1.0 - lamM.toDouble / 1e6
        var f = 0
        while (f < F) {
          g.charAt(f) match {
            case '1' =>
              wm *= mM(f).toDouble / 1e6; wu *= uM(f).toDouble / 1e6
            case '0' =>
              wm *= 1.0 - mM(f).toDouble / 1e6
              wu *= 1.0 - uM(f).toDouble / 1e6
            case _ => wm *= 1.0; wu *= 1.0
          }
          f += 1
        }
        math.floor(wm / (wm + wu) * 1e6).toLong
      }
      // M-step: exact long sums of cnt·posteriorµ
      var f = 0
      while (f < F) {
        var numM = 0L; var denM = 0L; var numU = 0L; var denU = 0L
        var i = 0
        while (i < pats.length) {
          val (g, cnt) = pats(i)
          val c = g.charAt(f)
          if (c != '-') {
            denM += cnt * post(i)
            denU += cnt * (1000000L - post(i))
            if (c == '1') {
              numM += cnt * post(i)
              numU += cnt * (1000000L - post(i))
            }
          }
          i += 1
        }
        if (denM > 0L)
          mM(f) = clampMicro(numM.toDouble / denM.toDouble * 1e6)
        if (denU > 0L)
          uM(f) = clampMicro(numU.toDouble / denU.toDouble * 1e6)
        f += 1
      }
      var sw = 0L; var st = 0L
      var i = 0
      while (i < pats.length) {
        sw += pats(i)._2 * post(i); st += pats(i)._2; i += 1
      }
      if (st > 0L) lamM = clampMicro(sw.toDouble / st.toDouble)
    }
    import spark.implicits._
    fields.zipWithIndex.map { case (f, i) =>
      (f, mM(i).toDouble / 1e6, uM(i).toDouble / 1e6,
        lamM.toDouble / 1e6)
    }.toDF("field", "m", "u", "lambda")
  }

  /**
   * D24 (r12): blocking-quality audit — the three numbers that
   * evaluate a candidate-generation scheme (LSH bands, sorted
   * neighborhood, phonetic blocks) against a known match set
   * (Christen 2012's standard triple):
   *
   *  - `reduction_ratio`  = 1 − |cand| / (n·(n−1)/2): how much of
   *    the all-pairs space the blocker pruned — the SCALE number
   *    (0.999999+ is the regime a 100 TB dedup needs);
   *  - `pairs_completeness` = |cand ∩ truth| / |truth|: recall of
   *    true matches — the CORRECTNESS number (what the blocker
   *    silently loses, e.g. LSH band-collision misses);
   *  - `pairs_quality` = |cand ∩ truth| / |cand|: the precision
   *    proxy — how much verify work per true match.
   *
   * The tuning loop is RR vs PC: tighter blocking raises RR and
   * risks PC; this audit is the gate run on a LABELED SLICE before
   * committing a blocking key to the full corpus (pairs with D21's
   * threshold-calibration curve, which tunes the verify threshold
   * AFTER blocking).
   *
   * Both pair sets canonicalize to (min, max), drop self-pairs and
   * NULL ids, and DISTINCT before counting — duplicate or
   * mirror-direction pairs can't inflate any count. Pairs are then
   * SEMI-JOINED to the record id universe on BOTH endpoints —
   * foreign-id pairs (a candidate file audited against the wrong
   * slice) would otherwise inflate n_candidates/n_truth and could
   * push n_candidates past n·(n−1)/2, silently yielding a NEGATIVE
   * reduction ratio; restricting to the same universe makes
   * n_candidates ≤ total_pairs structural. `n_records` is
   * the distinct non-NULL id count; `total_pairs` = n·(n−1)/2 is
   * carried as exact DECIMAL(38,0) rendered as a STRING (the q189
   * rule — it overflows BIGINT long before a corpus is large).
   *
   * ENGINE-EXACT: all five counts are exact integers; each ratio is
   * a fixed IEEE chain (1.0 − c/(n·(n−1)/2) with the denominator
   * composed double-multiply-then-halve; the two recalls one guarded
   * division each), round(6), all values non-negative in [0,1] (no
   * signed-zero exposure). Empty truth → NULL completeness; empty
   * candidates → NULL quality; n < 2 → NULL reduction ratio.
   *
   * Scale: two distinct-pair shuffles + one pair equi-join (hash,
   * key-partitioned) + four one-row aggregates composed by broadcast
   * cross joins. Never materializes the all-pairs space — total_pairs
   * is arithmetic, not a join.
   *
   * Output (one row): (n_records, total_pairs, n_candidates,
   * n_truth, n_hits, reduction_ratio, pairs_completeness,
   * pairs_quality).
   */
  def blockingAudit(
      records: DataFrame, idCol: String,
      candidates: DataFrame, candA: String, candB: String,
      truth: DataFrame, truthA: String, truthB: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    // Reused by four semi-joins — materialize once.
    val ids = Barrier.barrier(records.where(col(idCol).isNotNull)
      .select(col(idCol).as("rid")).distinct())
    def canon(df: DataFrame, a: String, b: String): DataFrame = df
      .where(col(a).isNotNull && col(b).isNotNull &&
        col(a) =!= col(b))
      .select(least(col(a), col(b)).as("pa"),
        greatest(col(a), col(b)).as("pb"))
      .distinct()
      .join(ids, col("pa") === col("rid"), "left_semi")
      .join(ids, col("pb") === col("rid"), "left_semi")
    val cp = Barrier.barrier(canon(candidates, candA, candB))
    val tp = Barrier.barrier(canon(truth, truthA, truthB))
    val rec1 = records.where(col(idCol).isNotNull)
      .agg(countDistinct(col(idCol)).as("n_records"))
    val cand1 = cp.agg(count(lit(1)).as("n_candidates"))
    val truth1 = tp.agg(count(lit(1)).as("n_truth"))
    val hits1 = cp.join(tp, Seq("pa", "pb"))
      .agg(count(lit(1)).as("n_hits"))
    val dec = DecimalType(38, 0)
    val nD = col("n_records").cast("double")
    val totD = nD * (nD - lit(1.0)) / lit(2.0)
    rec1
      .crossJoin(broadcast(cand1))
      .crossJoin(broadcast(truth1))
      .crossJoin(broadcast(hits1))
      .select(
        col("n_records"),
        ((col("n_records").cast(dec) *
          (col("n_records") - lit(1L)).cast(dec)) / lit(2))
          .cast(dec).cast("string").as("total_pairs"),
        col("n_candidates"), col("n_truth"), col("n_hits"),
        round(lit(1.0) - col("n_candidates").cast("double") /
          when(col("n_records") >= 2L, totD), 6)
          .as("reduction_ratio"),
        round(col("n_hits").cast("double") /
          when(col("n_truth") > 0L, col("n_truth").cast("double")), 6)
          .as("pairs_completeness"),
        round(col("n_hits").cast("double") /
          when(col("n_candidates") > 0L,
            col("n_candidates").cast("double")), 6)
          .as("pairs_quality"))
  }
}
