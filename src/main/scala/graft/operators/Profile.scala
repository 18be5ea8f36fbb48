package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import Barrier.BarrierOps
import org.apache.spark.sql.types.DecimalType

/**
 * One-pass numeric dataset profiling: for each requested column,
 * count / nulls / distinct / min / max / mean / std — ALL columns'
 * statistics ride a single scan+aggregate (the [[Quality]] shape:
 * N columns, one pass, not one job per column), then the wide
 * aggregate row explodes into long-format (col_name, stat, value).
 *
 * Determinism contract: values are accumulated as DECIMAL(18,
 * `scale`) — exact integer arithmetic — and only the FINAL mean /
 * variance arithmetic runs in double, in a fixed operation order. A
 * plain `avg`/`stddev` over doubles is partition-order-dependent
 * (float addition is not associative) and can't be oracle-pinned;
 * this shape is bit-reproducible across engines and partitionings
 * for any column exactly representable at `scale` (integers, money).
 *
 * Scale: one partial-aggregated pass. With exact distinct counts
 * (`approxDistinct = false`, the oracle-pinnable default) the
 * multi-distinct plans as a single Expand (the q59 multi-distinct
 * shape) — ONE reshuffle level, but the Expand multiplies scanned
 * rows by the number of profiled columns. `approxDistinct = true` is
 * the 100 TB path: HLL++ sketches (rsd 1%) are plain mergeable
 * aggregates, so the Expand disappears and the whole profile is a
 * single partial-combined pass regardless of column count; every
 * other statistic is unchanged.
 */
object Profile {

  def numeric(df: DataFrame, cols: Seq[String], scale: Int = 2,
      approxDistinct: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "need at least one column to profile")
    def d(c: String) = col(c).cast(DecimalType(18, scale))
    def distinctAgg(c: String) =
      if (approxDistinct) approx_count_distinct(col(c), rsd = 0.01)
      else countDistinct(col(c))
    val metrics = cols.flatMap { c =>
      Seq(
        count(col(c)).cast("double").as(s"${c}__count"),
        (count(lit(1)) - count(col(c))).cast("double").as(s"${c}__nulls"),
        distinctAgg(c).cast("double").as(s"${c}__distinct"),
        min(d(c)).cast("double").as(s"${c}__min"),
        max(d(c)).cast("double").as(s"${c}__max"),
        sum(d(c)).cast("double").as(s"${c}__sum"),
        sum(d(c) * d(c)).cast("double").as(s"${c}__sumsq"))
    }
    val agged = df.agg(metrics.head, metrics.tail: _*)
    val rows = cols.flatMap { c =>
      val cnt = col(s"${c}__count")
      val s1 = col(s"${c}__sum")
      val s2 = col(s"${c}__sumsq")
      // cnt <= 1 would divide 0.0/0.0 → NaN (and Spark's greatest
      // treats NaN as largest, so it would survive the clamp); pin
      // the degenerate case to 0.0 — also what the SQL formulation
      // yields via NULL propagation, keeping oracle parity.
      val variance = when(cnt > 1.0, (s2 - s1 * s1 / cnt) / (cnt - 1))
        .otherwise(lit(0.0))
      Seq(
        ("count", cnt),
        ("nulls", col(s"${c}__nulls")),
        ("distinct", col(s"${c}__distinct")),
        ("min", col(s"${c}__min")),
        ("max", col(s"${c}__max")),
        ("mean", s1 / cnt),
        ("std", sqrt(greatest(variance, lit(0.0))))
      ).map { case (statName, v) =>
        struct(
          lit(c).as("col_name"),
          lit(statName).as("stat"),
          round(v, 6).as("value"))
      }
    }
    agged.select(explode(array(rows: _*)).as("r")).select("r.*")
  }

  /**
   * Reproducible pairwise Pearson correlation matrix — every pair of
   * `cols` in ONE scan. Co-moments (n, Σx, Σy, Σxy, Σx², Σy²)
   * accumulate as DECIMAL(18, `scale`) products — exact, associative
   * integer arithmetic — and only the final correlation formula runs
   * in double, in a fixed operation order. Spark's built-in `corr`
   * accumulates doubles and is partition-order-dependent in the last
   * ulps; this shape is bit-reproducible across engines and
   * partitionings (the [[numeric]] mean/std contract, extended to
   * second cross-moments).
   *
   * Pairs are masked pairwise-complete: a row contributes to (a,b)
   * only when BOTH are non-null. Degenerate pairs (n < 2 or zero
   * variance) yield NULL, never NaN/Inf.
   *
   * Scale: one partial-aggregated pass for all p·(p−1)/2 pairs — no
   * Expand, no per-pair jobs; the aggregate row is O(p²) scalars.
   *
   * Headroom contract (QualitySpec-pinned): products of
   * DECIMAL(18,s) accumulate in DECIMAL(38, 2s), so each pair needs
   * Σx², Σy², Σ|x·y| < 10^(38−2s) — at s=2 that is 10^34, i.e.
   * n·M² < 10^34 for values bounded by M (money-scale M=10⁶ →
   * ~10²² rows; M=10¹⁶ overflows after ~100 rows). Past the bound
   * the sum RAISES under the default ANSI mode (NULL with ANSI off)
   * — it never silently corrupts. For corpora beyond the bound,
   * correlate per-shard and combine co-moments — they are plain
   * sums — or lower the input magnitude (the coefficient is
   * location/scale-invariant, so pre-centering buys the headroom
   * back).
   *
   * `preScaleExp` is the in-operator form of that escape hatch: each
   * input is multiplied by 10^preScaleExp BEFORE decimal
   * quantization, shifting the headroom window without changing the
   * coefficient — Pearson is exactly invariant under a common
   * positive scaling of both columns (the 10^2e factors cancel
   * between numerator and √(vx·vy)). 1e16-magnitude columns at 100 TB
   * row counts fit with preScaleExp = −10 (values land at ~1e6 →
   * n·M² bound good for ~10²² rows again). The trade is resolution:
   * quantization still keeps `scale` decimal digits of the SCALED
   * value, so the smallest distinguishable input step grows to
   * 10^(−scale−preScaleExp). Default 0 compiles to the identical
   * expression tree as before (no cast-shape drift in pinned plans).
   */
  def correlations(
      df: DataFrame, cols: Seq[String], scale: Int = 2,
      preScaleExp: Int = 0): DataFrame = {
    require(cols.size >= 2, "need at least two columns to correlate")
    def d(c: String) =
      if (preScaleExp == 0) col(c).cast(DecimalType(18, scale))
      else (col(c) *
          lit(BigDecimal(java.math.BigDecimal.ONE.scaleByPowerOfTen(
            preScaleExp))))
        .cast(DecimalType(18, scale))
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))
    val aggs = pairs.flatMap { case (a, b) =>
      val both = col(a).isNotNull && col(b).isNotNull
      val x = when(both, d(a))
      val y = when(both, d(b))
      Seq(
        count(when(both, lit(1))).cast("double").as(s"__${a}__${b}__n"),
        sum(x).cast("double").as(s"__${a}__${b}__sx"),
        sum(y).cast("double").as(s"__${a}__${b}__sy"),
        sum(x * y).cast("double").as(s"__${a}__${b}__sxy"),
        sum(x * x).cast("double").as(s"__${a}__${b}__sxx"),
        sum(y * y).cast("double").as(s"__${a}__${b}__syy"))
    }
    val agged = df.agg(aggs.head, aggs.tail: _*)
    val rows = pairs.map { case (a, b) =>
      val n = col(s"__${a}__${b}__n")
      val sx = col(s"__${a}__${b}__sx")
      val sy = col(s"__${a}__${b}__sy")
      val sxy = col(s"__${a}__${b}__sxy")
      val sxx = col(s"__${a}__${b}__sxx")
      val syy = col(s"__${a}__${b}__syy")
      val vx = n * sxx - sx * sx
      val vy = n * syy - sy * sy
      val corr = when(n >= 2.0 && vx > 0.0 && vy > 0.0,
        round((n * sxy - sx * sy) / sqrt(vx * vy), 6))
      struct(
        lit(a).as("col_a"), lit(b).as("col_b"),
        n.cast("long").as("n"), corr.as("corr"))
    }
    agged.select(explode(array(rows: _*)).as("r")).select("r.*")
  }

  /**
   * Categorical×categorical association profile (the [[correlations]]
   * complement for non-numeric columns): mutual information (natural
   * log), Pearson chi-squared, and Cramér's V between two categorical
   * columns, from ONE contingency pass.
   *
   * Rows where either side is NULL are excluded (pairwise-complete,
   * the [[correlations]] masking rule). Chi-squared covers the FULL
   * r×c grid including unobserved cells via the identity
   * Σ_all (o−e)²/e = Σ_observed ((o−e)²/e − e) + n — so only observed
   * cells are ever materialized. Cramér's V = √(χ²/(n·(min(r,c)−1))),
   * pinned to 0.0 when either side is constant (min(r,c) = 1).
   *
   * Determinism contract: every per-cell term is computed from exact
   * integer counts through a FIXED double operation order, quantized
   * to DECIMAL(38,12), and summed exactly — so the cross-cell sum is
   * partition-order-independent and oracle-pinnable (the repo's
   * decimal co-moment discipline; a raw double sum would drift in the
   * last ulps with partial-aggregation order).
   *
   * Scale: one partial-combined shuffle on (a, b) builds the
   * contingency table; everything after runs at CELL cardinality
   * (|A|·|B| rows — marginals, totals, and term sums are
   * AQE-broadcast joins over that tiny frame). High-cardinality
   * "categoricals" (ids, free text) make the cell table itself huge —
   * bucket or top-K the values upstream; association measures over
   * million-level cardinality are noise anyway.
   */
  def categoricalAssociation(
      df: DataFrame, colA: String, colB: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val joint = df
      .where(col(colA).isNotNull && col(colB).isNotNull)
      .groupBy(col(colA).as("__a"), col(colB).as("__b"))
      .agg(count(lit(1)).as("__nab"))
    // Marginals and the total as WINDOWS over the contingency table —
    // a groupBy-and-join-back formulation rescans the corpus once per
    // marginal branch (4 scans statically); windows keep it to ONE
    // corpus scan, and all three window exchanges move only cell-
    // cardinality rows. The un-partitioned total window is bounded by
    // construction (|A|·|B| rows — the q90/BM25 bounded-frame rule).
    val cells = joint
      .withColumn("__na", sum("__nab").over(Window.partitionBy("__a")))
      .withColumn("__nb", sum("__nab").over(Window.partitionBy("__b")))
      .withColumn("__n", sum("__nab").over(Window.partitionBy()))
    val nabD = col("__nab").cast("double")
    val naD = col("__na").cast("double")
    val nbD = col("__nb").cast("double")
    val nD = col("__n").cast("double")
    // Fixed double op order — mirrored verbatim in the DuckDB oracle.
    val e = naD * nbD / nD
    val miT = (nabD / nD) * log(nabD * nD / (naD * nbD))
    val chiT = (nabD - e) * (nabD - e) / e - e
    def dec(c: org.apache.spark.sql.Column) =
      round(c, 12).cast(DecimalType(38, 12))
    val summed = cells
      .agg(
        max("__n").as("__tn"),
        countDistinct("__a").as("__tr"), countDistinct("__b").as("__tc"),
        sum(dec(miT)).as("__mi"), sum(dec(chiT)).as("__chi"))
    val chi2 = col("__chi").cast("double") + col("__tn").cast("double")
    val minRc = least(col("__tr"), col("__tc"))
    summed.select(
      col("__tn").cast("long").as("n"),
      col("__tr").cast("int").as("r"),
      col("__tc").cast("int").as("c"),
      ((col("__tr") - 1) * (col("__tc") - 1)).cast("long").as("dof"),
      round(col("__mi").cast("double"), 6).as("mi"),
      round(chi2, 6).as("chi2"),
      when(minRc > 1,
        round(sqrt(greatest(
          chi2 / (col("__tn").cast("double") * (minRc - 1).cast("double")),
          lit(0.0))), 6))
        .otherwise(lit(0.0)).as("cramers_v"))
  }

  /** Cumulative Poisson(1) CDF values F(0..8) — shared verbatim by
    * the Spark expression and the generated oracle SQL so the
    * inverse-CDF thresholds are the SAME doubles on both engines. */
  private[graft] val poissonCdf: Seq[Double] = {
    val e1 = math.exp(-1.0)
    var term = e1
    var cum = e1
    val out = scala.collection.mutable.ArrayBuffer(cum)
    for (k <- 1 to 8) { term = term / k; cum += term; out += cum }
    out.toSeq
  }

  /**
   * Poisson-bootstrap confidence interval for a mean — the error bar
   * a single pass can actually produce at 100 TB: classical
   * resampling draws n rows WITH replacement B times (B corpus
   * shuffles); the Poisson bootstrap replaces each row's resample
   * multiplicity with an independent Poisson(1) draw, so ALL B
   * resamples ride ONE scan with B counters (Chamandy et al.,
   * "Estimating Uncertainty for Massive Data Streams", Google 2012).
   *
   * Determinism/oracle: the per-(row, b) Poisson draw inverts the
   * shared [[poissonCdf]] thresholds on a 60-bit md5 uniform of
   * (hashCols, b) — a pure function of the data, so reruns and both
   * engines agree exactly (weights capped at 9: P(W>9) < 1.1e-7).
   * Resample means are exact-decimal weighted sums with one IEEE
   * division; the CI picks nearest-rank order statistics of the B
   * means by INTEGER per-mille arithmetic (the q108 rule — never
   * interpolated percentile edges).
   *
   * Scale: the B-fold row expansion is absorbed by map-side partial
   * aggregation — the exchange carries partitions×B rows, not
   * corpus×B; the B-row mean table then sorts in one task. Empty
   * resamples (possible only on tiny inputs) drop out of the rank
   * base on both engines.
   *
   * Output: one row (n_rows, mean, ci_lo, ci_hi, n_resamples).
   */
  /**
   * Functional-dependency audit over declared candidate pairs: for
   * each `(lhs, rhs)`, does every `lhs` value determine at most one
   * distinct non-null `rhs` value? The discovery primitive behind
   * key inference, denormalization safety ("can I collapse this
   * column into the dim table?"), and join-explosion forensics — a
   * violated FD assumed by a downstream join IS the q193 fan-out.
   *
   * Per pair the report carries: distinct `lhs` key count, how many
   * keys violate (map to ≥2 distinct rhs), how many ROWS sit inside
   * violating keys (the blast radius of a dedup-by-lhs), the max
   * per-key fan-out, and the boolean verdict.
   *
   * Contract: a NULL `lhs` forms its own key group (groupBy
   * semantics, identical in both engines); NULL `rhs` values never
   * count toward fan-out (`count(distinct)` excludes them) — an
   * all-NULL rhs key trivially holds. All statistics are exact
   * integer arithmetic, so the report is partition-order-free.
   *
   * Scale: pairs sharing an `lhs` share ONE partial-aggregated
   * key shuffle (the multi-distinct Expand multiplies scanned rows
   * by #rhs+1 — the documented q59 shape); the second-level
   * aggregate runs at key cardinality and collapses to one row per
   * lhs group. Nothing is ever collected; the per-lhs frames that
   * union at the end are one-row aggregates.
   */
  def functionalDependencies(
      df: DataFrame, pairs: Seq[(String, String)]): DataFrame = {
    require(pairs.nonEmpty, "need at least one (lhs, rhs) pair")
    val frames = pairs.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (lhs, ps) =>
        val rhss = ps.map(_._2).distinct
        val perKey = df.groupBy(col(lhs).as("__k"))
          .agg(count(lit(1)).as("__cnt"),
            rhss.map(r => countDistinct(col(r)).as(s"__d_$r")): _*)
        val aggs = Seq(count(lit(1)).as("__n_keys")) ++ rhss.flatMap { r =>
          Seq(
            sum(when(col(s"__d_$r") > 1, 1L).otherwise(0L))
              .as(s"__vk_$r"),
            sum(when(col(s"__d_$r") > 1, col("__cnt")).otherwise(0L))
              .as(s"__vr_$r"),
            max(col(s"__d_$r")).as(s"__mf_$r"))
        }
        val wide = perKey.agg(aggs.head, aggs.tail: _*)
        val longRows = rhss.map { r =>
          struct(
            lit(lhs).as("lhs"), lit(r).as("rhs"),
            col("__n_keys").as("n_keys"),
            col(s"__vk_$r").cast("long").as("violating_keys"),
            col(s"__vr_$r").cast("long").as("violating_rows"),
            col(s"__mf_$r").as("max_fanout"),
            (col(s"__mf_$r") <= 1).as("holds"))
        }
        wide.select(explode(array(longRows: _*)).as("__s"))
          .select(col("__s.*"))
    }
    frames.reduce(_.unionByName(_))
  }

  /**
   * Candidate-key audit: for each proposed column set, is the
   * combination unique? Reports distinct-combination count,
   * duplicate rows (rows beyond the first per combination — exactly
   * what an exact-dedup on that key would drop), and the largest
   * group. The declared-contract half of FD discovery: run this
   * BEFORE trusting a column set as a join key, dedup key, or
   * partition key (a max_group of 10⁶ on a "unique" id is the skew
   * q96 probes for, caught at profile time).
   *
   * NULLs participate as values (groupBy semantics — two NULL-key
   * rows are the SAME group, matching what dropDuplicates would do).
   * One partial-aggregated shuffle per candidate, second aggregate
   * at group cardinality; exact integers throughout.
   */
  def candidateKeys(df: DataFrame, keys: Seq[Seq[String]]): DataFrame = {
    require(keys.nonEmpty && keys.forall(_.nonEmpty),
      "need at least one non-empty candidate column set")
    val frames = keys.map { ks =>
      df.groupBy(ks.map(col): _*)
        .agg(count(lit(1)).as("__cnt"))
        .agg(
          count(lit(1)).as("n_keys"),
          sum(col("__cnt") - 1L).cast("long").as("dup_rows"),
          max(col("__cnt")).as("max_group"))
        .select(
          lit(ks.mkString(",")).as("key_cols"),
          col("n_keys"), col("dup_rows"), col("max_group"),
          (col("max_group") === 1).as("is_key"))
    }
    frames.reduce(_.unionByName(_))
  }

  /**
   * Inclusion-dependency (foreign-key discovery) profile — the
   * [[functionalDependencies]] complement ACROSS tables: for each
   * declared (child column → parent column) candidate, what fraction
   * of the child's distinct non-null values exist in the parent?
   * Coefficient 1.0 = a valid FK (safe to join, safe to
   * dimension-normalize); anything less quantifies the orphan mass a
   * join would silently drop — run BEFORE trusting an inner join at
   * 100 TB, where the dropped rows are invisible until the totals
   * are wrong.
   *
   * Per candidate: distinct child values, matched count, orphan
   * count, orphan ROWS (the child-side blast radius), and the
   * inclusion coefficient. Exact integers + one 6dp-rounded ratio.
   *
   * Scale: per candidate ONE child aggregate at value granularity
   * (carrying per-value row counts) + one left join against the
   * parent's distinct values — both sides key-partitioned, the
   * parent side a value-cardinality frame, never the raw parent.
   * NULL child values are excluded entirely (SQL FK semantics).
   */
  def inclusionDependencies(
      pairs: Seq[(String, DataFrame, String, DataFrame, String)])
      : DataFrame = {
    require(pairs.nonEmpty, "need at least one (label, child, parent) pair")
    val frames = pairs.map { case (label, child, childCol, parent, parentCol) =>
      val cv = child
        .where(col(childCol).isNotNull)
        .groupBy(col(childCol).as("__v"))
        .agg(count(lit(1)).as("__rows"))
      val pv = parent
        .where(col(parentCol).isNotNull)
        .select(col(parentCol).as("__v")).distinct()
        .withColumn("__hit", lit(1))
      cv.join(pv, Seq("__v"), "left")
        .agg(
          count(lit(1)).as("child_values"),
          sum(when(col("__hit").isNotNull, 1L).otherwise(0L))
            .as("matched_values"),
          sum(when(col("__hit").isNull, 1L).otherwise(0L))
            .as("orphan_values"),
          sum(when(col("__hit").isNull, col("__rows")).otherwise(0L))
            .as("orphan_rows"))
        .select(
          lit(label).as("candidate"),
          col("child_values"), col("matched_values"),
          col("orphan_values"), col("orphan_rows"),
          when(col("child_values") > 0,
            round(col("matched_values").cast("double") /
              col("child_values"), 6)).as("inclusion"))
    }
    frames.reduce(_.unionByName(_))
  }

  /** One declarative data-quality expectation (the Deequ/Great-
    * Expectations shape): a named metric over one column plus the
    * threshold the release gate demands. */
  sealed trait Expectation {
    def column: String
    def threshold: Double
    def name: String
  }
  /** non-null share of all rows ≥ threshold. */
  final case class Completeness(column: String, threshold: Double)
      extends Expectation { def name = s"completeness($column)" }
  /** distinct / non-null count ≥ threshold (1.0 = column is a key). */
  final case class UniqueRate(column: String, threshold: Double)
      extends Expectation { def name = s"unique_rate($column)" }
  /** share of NON-NULL values inside [lo, hi] ≥ threshold. */
  final case class InRangeRate(
      column: String, lo: Double, hi: Double, threshold: Double)
      extends Expectation { def name = s"in_range($column,$lo,$hi)" }
  /** share of NON-NULL values matching `regex` ≥ threshold (keep the
    * pattern in the RE2 ∩ Java ∩ PCRE common subset — classes,
    * anchors, quantifiers — so every engine reads it identically). */
  final case class MatchRate(
      column: String, regex: String, threshold: Double)
      extends Expectation { def name = s"match_rate($column)" }

  /**
   * Q11: declarative expectation suite — the Deequ-style release
   * gate: evaluate every check's metric in ONE pass over the table
   * and emit a verdict row per check. This is the "constraints as
   * data" surface a 100 TB ingest runs before promoting a snapshot:
   * completeness, key-ness, range conformance, and format
   * conformance, each a ratio in [0, 1] compared against its
   * declared threshold.
   *
   * Scale: all metrics fold into ONE aggregate over ONE scan —
   * conditional sums partial-aggregate map-side; the exact
   * `countDistinct`s (UniqueRate) share the same job via Spark's
   * multi-distinct Expand (rows × distinct-column count, the
   * documented cost of EXACT key verification — swap in
   * approx_count_distinct upstream when ±2% suffices at the 100 TB
   * end). The one-row metric frame then unpivots to |checks| rows —
   * driver-free, join-free.
   *
   * ENGINE-EXACT: every metric is integer-count arithmetic finished
   * by one guarded IEEE division (empty denominators → NULL metric,
   * failed verdict — ANSI-safe, DuckDB-identical), round(6) —
   * non-negative, no signed-zero exposure. `passed` is NULL-strict:
   * an unmeasurable metric is a FAILED gate, not a skipped one.
   *
   * Output: (check, column, metric, threshold, passed), one row per
   * expectation, input order preserved via the check name sort the
   * caller applies (names are deterministic).
   */
  def expectationSuite(
      df: DataFrame, checks: Seq[Expectation]): DataFrame = {
    require(checks.nonEmpty, "need at least one expectation")
    require(checks.map(_.name).distinct.size == checks.size,
      s"duplicate expectation names: ${checks.map(_.name)}")
    def ratio(num: Column, den: Column): Column =
      round(num.cast("double") /
        when(den > 0L, den.cast("double")), 6)
    val total = count(lit(1))
    val metricCols = checks.zipWithIndex.map { case (c, i) =>
      val m = c match {
        case Completeness(col0, _) =>
          ratio(count(col(col0)), total)
        case UniqueRate(col0, _) =>
          ratio(countDistinct(col(col0)), count(col(col0)))
        case InRangeRate(col0, lo, hi, _) =>
          // try_cast, not cast: ANSI mode (default-on) throws on the
          // first malformed string value — the gate must COUNT dirty
          // values as non-conforming, not crash on them
          ratio(
            sum(when(
              expr(s"try_cast(`$col0` AS DOUBLE)").between(lo, hi),
              1L).otherwise(0L)),
            count(col(col0)))
        case MatchRate(col0, re, _) =>
          ratio(
            sum(when(col(col0).rlike(re), 1L).otherwise(0L)),
            count(col(col0)))
      }
      m.as(s"__m$i")
    }
    val one = df.agg(metricCols.head, metricCols.tail: _*)
    val rows = explode(array(checks.zipWithIndex.map { case (c, i) =>
      struct(
        lit(c.name).as("check"),
        lit(c.column).as("column"),
        col(s"__m$i").as("metric"),
        lit(c.threshold).as("threshold"))
    }: _*)).as("__e")
    one.select(rows)
      .select(col("__e.check").as("check"),
        col("__e.column").as("column"),
        col("__e.metric").as("metric"),
        col("__e.threshold").as("threshold"),
        coalesce(col("__e.metric") >= col("__e.threshold"), lit(false))
          .as("passed"))
  }

  /**
   * Metric-movement cube diff — the "why did the metric move?"
   * drill-down: one CUBE pass computes the metric for period A and
   * period B at EVERY dimension combination, then each group's delta,
   * its share of the grand-total delta, and its |delta| rank within
   * its grouping set. Reading the report top-down answers root-cause
   * questions mechanically: the grand-total row is the headline move,
   * each single-dimension level ranks which slice drove it, the
   * finer levels localize it — the standard metric-attribution
   * workflow, here as ONE deterministic operator instead of an
   * analyst clicking through group-bys.
   *
   * Exactness: the metric arrives in integer micro-units (floor-grid
   * contract); period sums and deltas are exact DECIMAL(38,0), so
   * ranking never sits on a float boundary; only the share ratio is
   * IEEE (one division, round 6). Ties rank by the dimension tuple's
   * string rendering — total and engine-exact.
   *
   * Scale: one Expand×2^|dims| aggregate (the documented rollup/cube
   * shape — pre-aggregate upstream if the raw frame is huge); the
   * grand-total row rides back as a one-row broadcast cross join;
   * ranking windows partition by grouping set.
   */
  def metricDiffCube(
      df: DataFrame, dims: Seq[String],
      metricMicro: Column, inA: Column): DataFrame = {
    require(dims.nonEmpty, "need at least one dimension")
    import org.apache.spark.sql.expressions.Window
    val d38 = DecimalType(38, 0)
    val cubed = df
      .where(inA.isNotNull && metricMicro.isNotNull)
      .cube(dims.map(col): _*)
      .agg(
        sum(when(inA, metricMicro).otherwise(0L)).cast(d38).as("__ma"),
        sum(when(!inA, metricMicro).otherwise(0L)).cast(d38).as("__mb"),
        grouping_id().as("__gid"))
      .withColumn("__delta", col("__mb") - col("__ma"))
    val grand = cubed
      .where(col("__gid") === (1 << dims.size) - 1)
      .select(col("__delta").as("__tot"))
    val tie = concat_ws("",
      dims.map(d => coalesce(col(d).cast("string"), lit(""))): _*)
    val w = Window.partitionBy(col("__gid"))
      .orderBy(abs(col("__delta")).desc, tie.asc)
    cubed.crossJoin(broadcast(grand))
      .withColumn("rank", row_number().over(w))
      .select(
        dims.map(col) ++ Seq(
          col("__gid").cast("int").as("gid"),
          col("__ma").cast("long").as("metric_a"),
          col("__mb").cast("long").as("metric_b"),
          col("__delta").cast("long").as("delta"),
          when(col("__tot") =!= 0,
            round(col("__delta").cast("double") /
              col("__tot").cast("double"), 6)).as("delta_share"),
          col("rank")): _*)
  }

  def bootstrapMeanCI(
      df: DataFrame, valCol: String, hashCols: Seq[String],
      b: Int = 32, alphaPerMille: Int = 50): DataFrame = {
    require(b >= 4, s"b must be >= 4, got $b")
    require(alphaPerMille >= 2 && alphaPerMille < 1000 &&
        alphaPerMille % 2 == 0,
      s"alphaPerMille must be even in [2, 1000), got $alphaPerMille")
    import org.apache.spark.sql.expressions.Window
    val dec = DecimalType(18, 6)
    val spark = df.sparkSession
    val rows = df
      .where(col(valCol).isNotNull)
      .select(col(valCol).cast(dec).as("__v"),
        concat_ws(":", hashCols.map(c => col(c).cast("string")): _*)
          .as("__id"))
    val u = conv(substring(md5(concat_ws(":", col("__id"),
        col("b").cast("string"))), 1, 15), 16, 10)
      .cast("double") / lit(1.152921504606847e18)
    val w = poissonCdf.zipWithIndex
      .foldLeft(when(lit(false), 0)) { case (acc, (f, k)) =>
        acc.when(u < lit(f), k)
      }
      .otherwise(9)
    val means = rows
      .crossJoin(broadcast(
        spark.range(b.toLong).select(col("id").cast("int").as("b"))))
      .select(col("b"), col("__v"), w.as("__w"))
      .groupBy("b")
      .agg(
        sum(col("__w").cast("long")).as("__ne"),
        sum(col("__w").cast(dec) * col("__v")).as("__sv"))
      .where(col("__ne") > 0)
      .select(col("b"),
        (col("__sv").cast("double") / col("__ne")).as("__mb"))
    val wRank = Window.orderBy(col("__mb"), col("b"))
    val wAll = Window.partitionBy(lit(1))
    val ranked = means
      .withColumn("__rk", row_number().over(wRank))
      .withColumn("__nb", count(lit(1)).over(wAll))
    // Nearest-rank edges in PURE integer arithmetic (`div`, floor
    // semantics on positives): a double path here is a trap — DuckDB
    // `//` does not floor DOUBLE operands and its double→BIGINT cast
    // ROUNDS where Spark's truncates.
    val halfPm = alphaPerMille / 2
    val loRk = expr(s"(__nb * $halfPm + 999) div 1000")
    val hiRk = expr(s"(__nb * ${1000 - halfPm} + 999) div 1000")
    val point = rows.agg(
      count(lit(1)).as("n_rows"),
      sum(col("__v")).as("__tot"))
    point.crossJoin(broadcast(
        ranked.agg(
          max(col("__nb")).as("n_resamples"),
          min(when(col("__rk") === loRk, col("__mb"))).as("__lo"),
          min(when(col("__rk") === hiRk, col("__mb"))).as("__hi"))))
      .select(
        col("n_rows"),
        when(col("n_rows") > 0,
          round(col("__tot").cast("double") / col("n_rows"), 6))
          .as("mean"),
        round(col("__lo"), 6).as("ci_lo"),
        round(col("__hi"), 6).as("ci_hi"),
        col("n_resamples"))
  }

  /**
   * R27: join-fanout audit — predict an equi-join's output size from
   * the two key histograms BEFORE running it: per co-occurring key
   * the pair count is n_left·n_right, and the total is the exact
   * output cardinality of `left JOIN right ON key`. THE pre-flight
   * check before a 100 TB join: a handful of hot keys whose count
   * product dominates the total is the skew/blow-up signature (salt
   * those keys or pre-aggregate a side), and a total far above either
   * input says the join is a hidden cross product. Runs on two
   * count aggregations — never the join itself.
   *
   * Output: the `topK` heaviest keys (pairs desc, key asc), each row
   * also carrying the one-row global totals (broadcast cross join —
   * the house summary contract): total join output rows (exact
   * DECIMAL(38,0) rendered as a string — a pathological join's total
   * overflows BIGINT long before anyone should run it), co-occurring
   * key count, and each side's matched-row mass. Per-key products
   * stay BIGINT (bound: a single key's n_l·n_r < 2⁶³ — ANSI throws
   * rather than corrupts past it).
   *
   * Scale: two key-count aggregations (map-side partial), one
   * equi-join of the two count tables (each |keys| rows, far smaller
   * than the inputs), one TakeOrdered top-k, one one-row reduce.
   */
  def joinFanoutAudit(
      left: DataFrame, leftKey: String,
      right: DataFrame, rightKey: String, topK: Int): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val la = left.where(col(leftKey).isNotNull)
      .groupBy(col(leftKey).as("key"))
      .agg(count(lit(1)).as("n_left"))
    val rb = right.where(col(rightKey).isNotNull)
      .groupBy(col(rightKey).as("key"))
      .agg(count(lit(1)).as("n_right"))
    val perKey = la.join(rb, "key")
      .select(col("key").cast("string").as("key"),
        col("n_left"), col("n_right"),
        (col("n_left") * col("n_right")).as("pairs"))
      // consumed by the top-k sort AND the totals reduce: barrier the
      // small count-join result so the upstream aggregations run once
      // (the q127 pruning-vs-reuse rule)
      .barriered
    val totals = perKey.agg(
      sum(col("pairs").cast(DecimalType(38, 0))).cast("string")
        .as("total_pairs"),
      count(lit(1)).as("join_keys"),
      sum(col("n_left")).as("matched_left_rows"),
      sum(col("n_right")).as("matched_right_rows"))
    perKey
      .orderBy(col("pairs").desc, col("key"))
      .limit(topK)
      .crossJoin(totals)
  }
}
