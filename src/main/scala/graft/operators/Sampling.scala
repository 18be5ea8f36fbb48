package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deterministic corpus-sampling primitives (extension family; no
 * reference counterpart — the reference ingests whole files,
 * `motor_ingesta.py:24-44`, and never subsamples).
 *
 * Companion to the hash-fraction samplers (q41 split / q42 quota /
 * q84 mixture): those keep a *rate* per group; `capPerKey` keeps a
 * *count* per group — the web-pipeline "at most N documents per
 * domain" dominance dial (cf. C4/Gopher per-domain caps), where a
 * handful of giant hosts would otherwise swamp the mixture.
 *
 * Scale posture: selection order is a content-independent md5 of the
 * id — reproducible on any engine, no RNG state, and uncorrelated
 * with ingestion order (a `doc_id <= k` cap would keep whatever
 * happened to arrive first). The rank filter compiles to Spark's
 * WindowGroupLimit: each map task keeps only its local top-k per key
 * BEFORE the exchange, so shuffle volume is min(|partition rows|,
 * k·|keys per partition|) per task, never the full corpus — at 100 TB
 * with a 10k-doc domain cap, the exchange carries ~k·|domains| rows,
 * not 100 TB. Per-key window state after the shuffle is ≤ k rows.
 */
object Sampling {

  /** Hash-order selection key: md5 of the id, id itself as the
    * total-order tiebreak (md5 collisions must not make the kept set
    * engine-dependent). */
  private def hashOrder(idCol: Column): Column = md5(idCol.cast("string"))

  /**
   * Keep at most `k` rows per `keyCol`, chosen by deterministic
   * id-hash order. Adds `pick_rank` (1-based rank of the kept row
   * within its key — rank 1 is the key's canonical exemplar).
   */
  def capPerKey(df: DataFrame, keyCol: String, idCol: String, k: Int)
      : DataFrame = {
    require(k >= 1, s"capPerKey: k must be >= 1, got $k")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(hashOrder(col(idCol)), col(idCol))
    df.withColumn("pick_rank", row_number().over(w))
      .where(col("pick_rank") <= k)
  }

  /**
   * Cap audit: per key, rows observed, rows a `capPerKey(k)` pass
   * would keep, and the share surviving — the "how much does this cap
   * actually bite, and on whom" report run before committing to a
   * cap value. One partial-combined aggregate on the key (counts
   * only — the cap maths is post-aggregation arithmetic on one row
   * per key, so this is strictly cheaper than running the cap).
   */
  def capAudit(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    require(k >= 1, s"capAudit: k must be >= 1, got $k")
    df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_rows"))
      .select(
        col(keyCol),
        col("n_rows"),
        least(col("n_rows"), lit(k.toLong)).as("n_kept"),
        round(least(col("n_rows"), lit(k.toLong)).cast("double") /
          col("n_rows"), 6).as("kept_share"))
  }

  /**
   * Weighted sample WITHOUT replacement of exactly `k` rows,
   * inclusion probability proportional to `weightCol` (Efraimidis &
   * Spirakis 2006, A-Res): each row draws u ~ U(0,1) and the k
   * largest u^(1/w) win. Selection is equivalently by
   * es_key = ln(u)/w (monotone), which avoids pow underflow when
   * weights are large. u derives from md5(id) — deterministic, no RNG
   * state, so reruns and the oracle reproduce the SAME sample
   * byte-for-byte (u = (hash64 + 0.5)/2^32 keeps u strictly inside
   * (0,1): ln(0) would produce -Inf keys whose ordering is
   * engine-dependent under ties).
   *
   * The training-mixture use case: "give me exactly N documents,
   * longer/higher-quality ones proportionally more likely" — the
   * exact-size counterpart to the rate-based mixture sampler (q84),
   * which only controls the EXPECTED take.
   *
   * Scale: orderBy(limit k) compiles to TakeOrderedAndProject — each
   * map task keeps its local top-k heap and a single merge of
   * partition heads produces the result, so shuffle volume is
   * O(partitions × k), corpus-size-independent — the same bounded
   * mergeable-state shape as the sketches (SCALE.md). No weight
   * normalization pass is needed: A-Res keys are scale-invariant in
   * the weights.
   *
   * Contract: weights must be positive. Rows with NULL or w <= 0 are
   * EXCLUDED from the sample before keying — A-Res is undefined
   * there, and without the filter a negative w flips ln(u)/w positive
   * so bad rows would deterministically outrank every valid row
   * (w = 0 yields ±Inf keys).
   */
  def weightedSample(
      df: DataFrame, idCol: String, weightCol: String, k: Int): DataFrame = {
    require(k >= 1, s"weightedSample: k must be >= 1, got $k")
    val u = (conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("double") + 0.5) / 4294967296.0
    df.where(col(weightCol).cast("double") > 0)
      .withColumn("es_key",
        log(u) / col(weightCol).cast("double"))
      .orderBy(col("es_key").desc, col(idCol))
      .limit(k)
  }

  /**
   * Per-key weighted sample without replacement: exactly `k` rows
   * per `keyCol` (fewer when the key has fewer rows), inclusion odds
   * proportional to `weightCol` within the key — [[weightedSample]]'s
   * stratified form ("100 docs per language, longer ones
   * proportionally more likely"). Same A-Res key (ln(u)/w,
   * md5-deterministic u), ranked per key; adds `pick_rank`.
   *
   * Scale: the rank filter compiles to WindowGroupLimit — each map
   * task keeps ≤ k rows per key BEFORE the exchange, so shuffle
   * volume is ~k·|keys| rows, corpus-size-independent (the capPerKey
   * plan shape, weighted).
   *
   * Same positive-weight contract as [[weightedSample]]: NULL / w <= 0
   * rows are excluded before keying.
   */
  def weightedSamplePerKey(
      df: DataFrame, keyCol: String, idCol: String, weightCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"weightedSamplePerKey: k must be >= 1, got $k")
    val u = (conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("double") + 0.5) / 4294967296.0
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("es_key").desc, col(idCol))
    df.where(col(weightCol).cast("double") > 0)
      .withColumn("es_key", log(u) / col(weightCol).cast("double"))
      .withColumn("pick_rank", row_number().over(w))
      .where(col("pick_rank") <= k)
  }

  /**
   * Materialize fractional epoch weights into physical row repeats:
   * a row with `epochsCol` = e appears floor(e) times always, plus
   * once more with probability frac(e) — decided by a deterministic
   * md5(id) draw, so expected multiplicity is exactly e and reruns
   * repeat the identical choice. Adds `copy_idx` (1..n). Rows with
   * e < 1 become Bernoulli(e) downsampling; e = 0 drops the row.
   *
   * This is how training mixtures with per-source weights > 1
   * ("2.3 epochs of Wikipedia") become a flat shuffled dataset: the
   * rate-based sampler (q84) can only THIN sources; this one
   * up-multiplies them. Pair `copy_idx` with a downstream
   * hash-shuffle key so copies of the same doc land far apart.
   *
   * Scale: ZERO shuffle — the repeat decision and the
   * sequence-explode fan-out happen inside the scan projection;
   * output volume is Σe per row, the physically required minimum.
   * The md5 salt ("ep:") decorrelates this draw from the id-hash
   * draws in the split/quota/mixture samplers, so epoch residuals
   * don't correlate with split assignment.
   */
  def epochRepeat(
      df: DataFrame, idCol: String, epochsCol: String): DataFrame = {
    val e = col(epochsCol).cast("double")
    val u = conv(substring(
        md5(concat(lit("ep:"), col(idCol).cast("string"))), 1, 8), 16, 10)
      .cast("double") / 4294967296.0
    val n = (floor(e) + when(u < e - floor(e), 1).otherwise(0)).cast("int")
    df.withColumn("copy_idx",
        explode(when(n >= 1, sequence(lit(1), n))
          .otherwise(array().cast("array<int>"))))
  }

  /**
   * Temperature-scaled source mixture (the multilingual/multi-source
   * alpha-sampling recipe, cf. mT5/XLM-R: sample source i with
   * probability ∝ share_i^α): draw EXACTLY `totalK` rows, per-source
   * budgets k_i ∝ (Σ weight_i)^α apportioned by largest-remainder
   * rounding (Σ k_i = totalK exactly), rows picked per source in
   * md5(id) hash order. α < 1 flattens the mixture toward uniform —
   * upweighting tail sources a raw proportional draw would starve;
   * α = 1 is proportional, α = 0 uniform.
   *
   * Engine-reproducible arithmetic: α is restricted to 0.5 — the one
   * non-trivial temperature whose power is `sqrt`, correctly rounded
   * by IEEE 754 in BOTH Spark (Math.sqrt) and the DuckDB oracle
   * (libm sqrt), where a general `pow` is only 1-ulp-accurate and
   * engine-dependent. The sqrt weights pass through DECIMAL(28,10)
   * so the normalizing total is an EXACT sum (order-independent);
   * floors/remainders are then fixed double-op chains (q118
   * contract).
   *
   * Scale: budgets come from one map-combined per-source aggregate
   * (|sources| rows, broadcast back). The per-source hash rank is
   * pre-capped at the STATIC totalK — that filter compiles to
   * WindowGroupLimit, so each map task ships ≤ totalK rows per
   * source and the dynamic cut k_i ≤ totalK prunes the ≤
   * |sources|·totalK survivors. The few-huge-keys skew of a
   * per-source window never sees the full corpus.
   *
   * Weight contract (mirrors `weightedSample`): only rows with a
   * strictly-positive, non-NULL, non-NaN weight carry mass or are
   * pickable — a negative source total would make sqrt() NaN, and a
   * single NULL/NaN weight would silently corrupt the DECIMAL(28,10)
   * normalizing total and every downstream budget, so such rows are
   * dropped at the scan. The EXACTLY-totalK guarantee additionally
   * assumes every source holds ≥ k_i surviving rows; a source
   * shorter than its apportioned budget under-fills it (no
   * redistribution — budgets are fixed before the pick so the draw
   * stays a single deterministic pass).
   *
   * Returns (keyCol, idCol, pick_rank), pick_rank ∈ 1..k_i.
   */
  def temperatureMixture(
      df: DataFrame, keyCol: String, idCol: String, weightCol: String,
      totalK: Int): DataFrame = {
    require(totalK >= 1, s"temperatureMixture: totalK >= 1, got $totalK")
    import org.apache.spark.sql.types.DecimalType
    val wd = col(weightCol).cast("double")
    val pool = df.where(wd.isNotNull && !isnan(wd) && wd > 0d)
    val shares = pool.groupBy(col(keyCol))
      .agg(sum(col(weightCol).cast("double")).as("__cnt"))
      .withColumn("__w",
        sqrt(col("__cnt")).cast(DecimalType(28, 10)).cast("double"))
    val tot = shares
      .agg(sum(col("__w").cast(DecimalType(28, 10))).cast("double")
        .as("__wtot"))
    val targets = shares.crossJoin(broadcast(tot))
      .withColumn("__target", lit(totalK.toDouble) * col("__w") / col("__wtot"))
      .withColumn("__base", floor(col("__target")).cast("long"))
      .withColumn("__frac", col("__target") - floor(col("__target")))
    val extra = targets
      .agg((lit(totalK.toLong) - sum(col("__base"))).as("__extra"))
    val budgets = targets.crossJoin(broadcast(extra))
      // Unpartitioned Window.orderBy is bounded BY CONSTRUCTION here:
      // `targets` has one row per source (the groupBy above), so this
      // single-partition rank sorts |sources| rows — the mixture's
      // handful of corpora, never corpus rows (same bounded-global-
      // window rule as the q65/q74 post-limit pattern).
      .withColumn("__fr", row_number().over(
        Window.orderBy(col("__frac").desc, col(keyCol))))
      .withColumn("__k",
        col("__base") +
          when(col("__fr") <= col("__extra"), 1L).otherwise(0L))
      // rename the key: budgets derives from df, and joining the two
      // lineages on the shared name trips ambiguous-reference
      .select(col(keyCol).as("__bkey"), col("__k"))
    // Static pre-cap → Catalyst's InferWindowGroupLimit rewrites the
    // rank filter into a WindowGroupLimit node (spec-asserted in
    // SamplingSpec), so each map task ships at most totalK rows per
    // source into the window shuffle. The post-shuffle state is
    // bounded by |sources| · totalK rows TOTAL — |sources| is the
    // mixture's source count (a handful), not the corpus size, so
    // the window never materializes more than that constant number
    // of rows regardless of corpus scale. The dynamic k_i ≤ totalK
    // cut then prunes the survivors.
    val w = Window.partitionBy(col(keyCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    pool.select(col(keyCol), col(idCol))
      .withColumn("pick_rank", row_number().over(w))
      .where(col("pick_rank") <= totalK)
      .join(broadcast(budgets), col(keyCol) === col("__bkey"))
      .where(col("pick_rank") <= col("__k"))
      .select(col(keyCol), col(idCol), col("pick_rank"))
  }

  /**
   * Deterministic round-robin interleave order across sources — the
   * EMISSION ORDER side of data mixing. Quota/temperature sampling
   * (q42/q158) decides HOW MUCH of each source a training run sees;
   * this decides WHEN: documents stream one-per-source in rotation
   * (doc 1 of every source, then doc 2 of every source, …), so no
   * contiguous run of the output over-represents one source and a
   * partial epoch still consumes a balanced mixture (the
   * shuffle-free ordering guarantee heterogeneous-corpus training
   * recipes ask for). Sources that exhaust simply drop out of later
   * rotations — shorter sources front-load, by construction.
   *
   * Output: (groupCol, idCol, pos, global_pos) where `pos` is the
   * 1-based rank within the source (by `idCol`) and `global_pos` is
   * the 1-based position in the interleaved stream — the
   * lexicographic rank under (pos, groupCol, idCol).
   *
   * Scale: the per-source rank is a keyed window (parallel in the
   * source partitioning); the GLOBAL rank is the K12-shape two-level
   * bucketed ordinal ([[Ordinals.withOrdinals]]) — no corpus-wide
   * single-task window at any size. Writing the result sorted by
   * `global_pos` yields files a sequential trainer reads in exactly
   * this order.
   */
  def interleaveOrder(
      df: DataFrame, groupCol: String, idCol: String): DataFrame = {
    val wSrc = Window.partitionBy(col(groupCol)).orderBy(col(idCol))
    val withPos = df
      .select(col(groupCol), col(idCol))
      .withColumn("pos", row_number().over(wSrc).cast("long"))
    Ordinals.withOrdinals(
        withPos, Seq(col("pos"), col(groupCol), col(idCol)), "global_pos")
      .select(col(groupCol), col(idCol), col("pos"),
        col("global_pos").cast("long").as("global_pos"))
  }

  /**
   * Deterministic k-fold assignment — the cross-validation /
   * train-shard split that is STABLE under reprocessing: fold =
   * 60-bit md5-prefix of the id, mod k. A pure function of the id,
   * so re-runs, late-arriving rows, and per-partition parallelism
   * all agree, and the same entity NEVER straddles folds across
   * pipeline versions (the split-leakage guarantee D9 audits). Pure
   * per-row projection — no shuffle, no state.
   */
  def foldAssign(df: DataFrame, idCol: String, k: Int): DataFrame = {
    require(k >= 2, s"foldAssign: k must be >= 2, got $k")
    df.withColumn("fold",
      (conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10)
        .cast("long") % k).cast("int"))
  }

  /**
   * Fold-balance report per stratum: after [[foldAssign]], does
   * every (stratum, fold) cell hold ≈ 1/k of its stratum? Hash
   * assignment is balanced only in expectation — small strata can
   * skew, and THIS report is the check before trusting a fold as an
   * eval split. One partial-aggregated pass + a per-stratum window
   * on the ≤ |strata|·k cell table.
   *
   * Output: (stratum..., fold, n, share) — share = n / stratum
   * total, round(6), non-negative.
   */
  def foldBalance(
      df: DataFrame, idCol: String, strataCol: String,
      k: Int): DataFrame = {
    val assigned = foldAssign(df, idCol, k)
    val w = Window.partitionBy(col(strataCol))
    assigned.groupBy(col(strataCol), col("fold"))
      .agg(count(lit(1)).as("n"))
      .withColumn("share",
        round(col("n").cast("double") / sum(col("n")).over(w), 6))
      .orderBy(col(strataCol), col("fold"))
  }

  /**
   * Mixture feasibility plan — the budget arithmetic run BEFORE
   * [[temperatureMixture]]/[[epochRepeat]] materialize anything:
   * given per-source available token mass, target mixture shares
   * (per-mille), and an upsampling ceiling (max epochs, per-mille),
   * the largest total corpus T satisfying every constraint is
   * T = min_i ⌊avail_i · maxEpochs‰ / share_i⌋ — each source can
   * contribute at most avail·maxEpochs tokens, and must contribute
   * share_i·T. The report names the BINDING source (the data you'd
   * need more of), each source's planned take, and its realized
   * epoch count — the "can we even build this mixture?" readout that
   * decides acquisitions.
   *
   * Pure integer floor arithmetic end to end (tokens × per-mille
   * stays far inside long range for any real corpus); the source
   * table is mixture-sized (a handful of rows) after ONE
   * partial-aggregated mass pass upstream.
   *
   * Output per targeted source: (source, avail_tokens, share_pm,
   * take_tokens, epochs_pm, binding). A targeted source with NO row
   * in `sourceMass` is reported with avail_tokens = 0 and becomes
   * the binding constraint (T = 0) — the plan never overstates the
   * feasible corpus by dropping an empty source.
   */
  def mixturePlan(
      sourceMass: DataFrame, sourceCol: String, massCol: String,
      sharesPerMille: Seq[(String, Int)],
      maxEpochsPerMille: Int = 1000): DataFrame = {
    require(sharesPerMille.nonEmpty, "need at least one target share")
    require(sharesPerMille.forall(_._2 > 0),
      s"shares must be positive: $sharesPerMille")
    require(sharesPerMille.map(_._2).sum == 1000,
      s"shares must total 1000 per-mille, got ${sharesPerMille.map(_._2).sum}")
    require(maxEpochsPerMille >= 1,
      s"maxEpochsPerMille must be >= 1, got $maxEpochsPerMille")
    val spark = sourceMass.sparkSession
    import spark.implicits._
    val targets = sharesPerMille.toDF("__src", "share_pm")
    // Targets drive the join (left side): a targeted source ABSENT
    // from sourceMass gets avail_tokens = 0, making it the binding
    // constraint (T = 0) instead of silently vanishing and letting T
    // be taken over the remaining sources only (round-10 ADVICE fix).
    // sourceMass is a per-source aggregate by contract, so IT is the
    // broadcast side.
    val planned = targets
      .join(broadcast(sourceMass
          .select(col(sourceCol).cast("string").as("__src"),
            col(massCol).cast("long").as("avail_tokens"))),
        Seq("__src"), "left")
      .withColumn("avail_tokens", coalesce(col("avail_tokens"), lit(0L)))
      .withColumn("__cand",
        expr(s"(avail_tokens * ${maxEpochsPerMille}L) div share_pm"))
    val tRow = planned.agg(min(col("__cand")).as("__t"))
    planned.crossJoin(broadcast(tRow))
      .select(
        col("__src").as("source"),
        col("avail_tokens"),
        col("share_pm"),
        expr("(__t * share_pm) div 1000").as("take_tokens"),
        when(col("avail_tokens") === 0L, lit(0L))
          .otherwise(
            expr("((__t * share_pm) div 1000) * 1000 div avail_tokens"))
          .as("epochs_pm"),
        (col("__cand") === col("__t")).as("binding"))
  }
}
