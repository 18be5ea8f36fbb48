package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Barrier.{barrier, BarrierOps}

/**
 * Similarity search over embedding columns (`array<float>`) — the
 * approximate-nearest-neighbor extension of the engine (north star;
 * no counterpart in the reference).
 *
 * All vector math is built from codegen'd higher-order functions
 * (`zip_with`/`aggregate`) in DOUBLE precision — no UDFs — so the
 * arithmetic is portable to the DuckDB oracle. Dot products
 * accumulate left-to-right (sequential IEEE sum), deterministic
 * across runs.
 */
object Similarity {

  /**
   * Cast an array<float> column to array<double>.
   *
   * NON-NULLABLE by construction (null vectors → empty array via
   * coalesce): several operators below use derived vector/norm
   * columns in join conditions, and Catalyst's
   * InferFiltersFromConstraints turns those into `IsNotNull(<derived
   * expr>)` filters PUSHED INTO THE SCAN — evaluating the whole
   * interpreted higher-order expression a second time per row. A
   * non-nullable expression makes the inferred constraint fold away
   * entirely. Same trick on [[norm]], [[srpBucket]] and `ivfCell`.
   */
  def toDoubleVec(v: Column): Column =
    coalesce(transform(v, _.cast("double")), typedLit(Seq.empty[Double]))

  /** Sequential dot product of two array<double> columns — the
    * codegen'd [[graft.functions.VecDot]] kernel (HOFs are
    * CodegenFallback; this is the family's hottest per-row op). */
  def dot(a: Column, b: Column): Column = graft.functions.VecDot(a, b)

  /** Pure-HOF reference formulation of [[dot]] — bit-identical
    * (same sequential IEEE fold), cross-checked in SimilaritySpec. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, _ * _), lit(0.0), _ + _)

  /** L2 norm (non-nullable; see [[toDoubleVec]]). */
  def norm(v: Column): Column = coalesce(sqrt(dot(v, v)), lit(0.0))

  /**
   * Exact cosine top-k: for each probe vector, the k nearest corpus
   * vectors by cosine similarity (self-matches excluded; ties broken
   * by ascending corpus id).
   *
   * Output: (probe_id, vec_id, rank, cosine).
   *
   * Scale: the probe side is broadcast (probe sets are small by
   * definition), so the corpus is scanned once with no shuffle for
   * the scoring pass. The `row_number() <= k` filter compiles to
   * Spark's WindowGroupLimit with a PARTIAL pass before the window's
   * exchange — per-partition top-k map-side — so the shuffle moves
   * O(partitions × probes × k) rows, not O(corpus × probes), and the
   * plan survives a 100× corpus. (An earlier hand-rolled
   * collect_list/slice "two-phase" formulation did NOT bound the
   * shuffle: the slice ran in the final aggregate after the exchange
   * shipped full candidate lists. PlanSpec now asserts the partial
   * group limit is present.) Zero-norm vectors yield 0/0 = NaN
   * cosine, which Spark orders ABOVE every number — the rank key maps
   * NaN to null and sorts nulls last, so degenerate vectors can never
   * displace real neighbors (a filter on the derived norm would get
   * pushed into the scan and double-evaluate it; ordering keys are
   * not pushable).
   */
  def cosineTopK(
      corpus: DataFrame,
      probes: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val c = corpus.select(
      col(idCol).as("vec_id"), toDoubleVec(col(vecCol)).as("__v"))
      .withColumn("__vnorm", norm(col("__v")))
    val p = probes.select(
      col(idCol).as("probe_id"), toDoubleVec(col(vecCol)).as("__p"))
      .withColumn("__pnorm", norm(col("__p")))
    val scored = c.crossJoin(broadcast(p))
      .where(col("vec_id") =!= col("probe_id"))
      .withColumn(
        "__cos",
        dot(col("__v"), col("__p")) / (col("__vnorm") * col("__pnorm")))
      .select("probe_id", "vec_id", "__cos")
    rankTopK(scored, k)
  }

  /** The family's shared rank-and-cut: row_number over (cosine desc
    * with NaN→null sorted last, vec_id asc) — ONE tie rule everywhere
    * so incremental merges re-rank identically to full recomputes. */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("probe_id")
      .orderBy(
        when(!isnan(col("__cos")), col("__cos")).desc_nulls_last,
        col("vec_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(
        col("probe_id"), col("vec_id"), col("rank"),
        col("__cos").as("cosine"))
  }

  /**
   * Incremental top-k maintenance (the EDBT-2020 interactive-session
   * setting, cf. PAPERS.md): fold a NEW vector batch into an existing
   * per-probe top-k WITHOUT rescanning the old corpus. Because
   * row_number's tie rule is total and shared (see [[rankTopK]]),
   * `topk(old ∪ new) = rank(topk(old) ∪ topk(new))` EXACTLY — the
   * q155 oracle asserts the identity against a full recompute over
   * the union corpus.
   *
   * `prevTopK` must be [[cosineTopK]]-shaped with UNROUNDED cosines
   * (round only at the output boundary, or re-ranking against fresh
   * unrounded scores breaks ties differently).
   *
   * Scale: the scoring scan touches ONLY the new batch (broadcast
   * probes, partial WindowGroupLimit — same bounded-shuffle shape as
   * cosineTopK); the merge re-ranks probes×2k rows. At 100 TB this is
   * the difference between an append being O(batch) and O(corpus).
   */
  def cosineTopKIncremental(
      prevTopK: DataFrame,
      newCorpus: DataFrame,
      probes: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val fresh = cosineTopK(newCorpus, probes, idCol, vecCol, k)
    val merged = prevTopK.select(col("probe_id"), col("vec_id"),
        col("cosine").as("__cos"))
      .unionByName(fresh.select(col("probe_id"), col("vec_id"),
        col("cosine").as("__cos")))
    rankTopK(merged, k)
  }

  /**
   * Maximal Marginal Relevance (MMR, Carbonell & Goldstein 1998)
   * diversified top-k — the coreset/result-diversification pick:
   * greedily select `k` vectors maximizing
   * λ·relevance − (1−λ)·max-similarity-to-already-picked, so the
   * selection covers the neighborhood of the query instead of
   * returning k near-duplicates of the best hit. Relevance is cosine
   * to `queryId`'s vector. The training-data reading: λ trades
   * on-topic-ness against diversity when drawing a compact
   * representative subset from a candidate pool.
   *
   * Execution: MMR is inherently sequential in k — each round scans
   * the candidates ONCE, updates the running max-sim against only
   * the NEWEST pick (greatest(ms, cos) — the incremental identity),
   * and takes one TakeOrdered(1) row to the driver (the k-row
   * bounded-driver contract, as in k-means/BPE). Rounds barrier via
   * the shared [[Barrier]] contract — reliable checkpoint when a
   * checkpoint dir is set, localCheckpoint otherwise, superseded
   * states freed — so round t never
   * re-executes rounds 1..t−1: total cost k scans of the pool, NOT
   * k·corpus — run it on a bounded candidate pool (ANN/top-N
   * prefilter) at scale, never a raw 100 TB corpus.
   *
   * Determinism/oracle: every score is a fixed IEEE op chain over
   * index-order dot products (VecDot; λ and 1−λ computed identically
   * on both engines), ties break by vec_id, and the whole greedy
   * unrolls as a DuckDB materialized-CTE chain (the q195/q200
   * replay pattern) — a hard driver gate, not a spec-only loop.
   * Vectors must be non-zero (a zero norm yields NaN cosine;
   * NaN-poisoned candidates sort last and can never be picked —
   * same rule as [[rankTopK]]).
   *
   * Output: (pick_rank, vec_id, relevance, max_sim, mmr), round(6)
   * at the boundary; rank 1 has NULL max_sim/mmr (nothing picked
   * yet — its criterion is relevance alone).
   */
  def mmrSelect(
      corpus: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int, lambda: Double): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(lambda > 0.0 && lambda <= 1.0,
      s"lambda must be in (0, 1], got $lambda")
    val spark = corpus.sparkSession
    import spark.implicits._
    val qVec = corpus.where(col(idCol) === queryId)
      .select(toDoubleVec(col(vecCol))).head().getSeq[Double](0)
    // Index-order fold — the same IEEE add sequence as VecDot.
    val qNorm = math.sqrt(qVec.foldLeft(0.0)((a, x) => a + x * x))
    val qLit = array(qVec.map(lit): _*)

    // Round barriers ride the shared [[Barrier]] contract (reliable
    // checkpoint when a dir is set, local otherwise); superseded
    // round state is freed once the next barrier materializes.
    var state = barrier(corpus.where(col(idCol) =!= queryId)
      .select(col(idCol).cast("long").as("vec_id"),
        toDoubleVec(col(vecCol)).as("__v"))
      .withColumn("__n", norm(col("__v")))
      .withColumn("rel", dot(col("__v"), qLit) / (col("__n") * lit(qNorm)))
      .withColumn("ms", lit(null).cast("double")))
    val mmrCol = lit(lambda) * col("rel") -
      (lit(1.0) - lit(lambda)) * col("ms")
    val nanLast = (c: Column) => when(!isnan(c), c).desc_nulls_last

    val picks = scala.collection.mutable.ListBuffer
      .empty[(Int, Long, Double, Option[Double], Option[Double])]
    var t = 1
    var exhausted = false
    while (t <= k && !exhausted) {
      val ordered =
        if (t == 1) state.orderBy(nanLast(col("rel")), col("vec_id"))
        else state.withColumn("__mmr", mmrCol)
          .orderBy(nanLast(col("__mmr")), col("vec_id"))
      ordered.limit(1).collect().headOption match {
        case None => exhausted = true
        case Some(r) =>
          val id = r.getAs[Long]("vec_id")
          val rel = r.getAs[Double]("rel")
          val ms = if (t == 1) None
            else Option(r.getAs[Any]("ms")).map(_.asInstanceOf[Double])
          val mmr = ms.map(m => lambda * rel - (1.0 - lambda) * m)
          picks += ((t, id, rel, ms, mmr))
          if (t < k) {
            val vLit = array(r.getSeq[Double](r.fieldIndex("__v")).map(lit): _*)
            val cosNew = dot(col("__v"), vLit) /
              (col("__n") * lit(r.getAs[Double]("__n")))
            // first assignment is direct (no greatest-with-NULL
            // cross-engine question); later rounds fold non-nulls
            val msNew = if (t == 1) cosNew else greatest(col("ms"), cosNew)
            val next = barrier(state.where(col("vec_id") =!= id)
              .withColumn("ms", msNew))
            Barrier.free(state)
            state = next
          }
          t += 1
      }
    }
    Barrier.free(state)
    picks.toSeq
      .toDF("pick_rank", "vec_id", "__rel", "__ms", "__mmr")
      .select(col("pick_rank"), col("vec_id"),
        round(col("__rel"), 6).as("relevance"),
        round(col("__ms"), 6).as("max_sim"),
        round(col("__mmr"), 6).as("mmr"))
      .orderBy("pick_rank")
  }

  /**
   * Retrieval-quality metrics — MRR and NDCG@k per probe, the eval
   * that must run before trusting an ANN/embedding index as a
   * retrieval component: [[dimTruncationRecall]] asks "does the
   * INDEX reproduce exact top-k", this asks "is the top-k any GOOD"
   * against ground-truth labels (a candidate is relevant iff it
   * carries the probe's label).
   *
   * Definitions: RR = 1/rank of the first relevant hit (0 if none in
   * the top-k); DCG@k = Σ rel_i/log2(i+1); NDCG normalizes by the
   * ideal DCG of min(R, k) relevant docs, R = the probe's relevant
   * count in the corpus (excluding itself). Probes with R = 0 emit
   * NULL metrics — unjudgeable, not zero.
   *
   * Coverage contract (round-10 ADVICE fix): the report has one row
   * per DISTINCT probe in `ranked` — a probe whose entire top-k is
   * unlabeled still appears (rr = 0, dcg = 0: nothing relevant was
   * retrieved), and a probe absent from `labels` appears with
   * n_rel_corpus = 0 and NULL metrics. Candidates missing from
   * `labels` are treated as NON-relevant (they cannot match the
   * probe's label), which under the rel∈{0,1} gain is identical to
   * dropping them from the DCG sum.
   *
   * Exactness: each 1/log2(i+1) term rounds to 6dp DECIMAL before
   * the per-probe sum (exact, order-free — the q190 contract); the
   * ideal-DCG table is the same cumulative decimal sum over ranks
   * 1..k (k rows, broadcast); RR and the final NDCG division are
   * single IEEE ops, round(6), all outputs non-negative.
   *
   * Scale: `ranked` is probes×k rows (the expensive part already
   * happened); label joins are broadcastable; per-probe label counts
   * are one partial-aggregated pass over the label table.
   *
   * Output: (probe_id, n_rel_corpus, rr, dcg, idcg, ndcg), by probe.
   */
  def retrievalMetrics(
      ranked: DataFrame, labels: DataFrame, idCol: String,
      labelCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(18, 6)
    val spark = ranked.sparkSession
    val lab = labels.select(col(idCol).as("__id"), col(labelCol).as("__lab"))
    // per-label corpus counts -> per-probe relevant count (minus self)
    val labCounts = lab.groupBy("__lab").agg(count(lit(1)).as("__labn"))
    val probeRel = lab.join(labCounts, Seq("__lab"))
      .select(col("__id").as("probe_id"), col("__lab").as("__plab"),
        (col("__labn") - 1).as("n_rel_corpus"))
    // ideal-DCG lookup: m -> sum of the first m rounded gain terms
    val gain = round(lit(1.0) / log2(col("m") + 1.0), 6).cast(dec)
    val wIdeal = org.apache.spark.sql.expressions.Window
      .orderBy(col("m"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val ideal = spark.range(1, k + 1).select(col("id").as("m"))
      .withColumn("__idcg", sum(gain).over(wIdeal))
    val scored = ranked.where(col("rank") <= k)
      .join(lab.select(col("__id").as("vec_id"),
        col("__lab").as("__clab")), Seq("vec_id"))
      .join(probeRel.select(col("probe_id"), col("__plab")), Seq("probe_id"))
      .withColumn("__rel", (col("__clab") === col("__plab")).cast("int"))
    val perProbe = scored.groupBy("probe_id")
      .agg(
        min(when(col("__rel") === 1, col("rank"))).as("__firstrel"),
        sum(when(col("__rel") === 1,
          round(lit(1.0) / log2(col("rank") + 1.0), 6).cast(dec))
          .otherwise(lit(0).cast(dec))).as("__dcg"))
    // Probe universe = distinct probes in `ranked` (probes×k rows →
    // probes rows, partial-agg distinct). Left joins keep a probe
    // with a fully-unlabeled top-k (perProbe miss → dcg 0, rr 0) and
    // a probe missing from labels (probeRel miss → n_rel 0, NULLs).
    ranked.select(col("probe_id")).distinct()
      .join(probeRel, Seq("probe_id"), "left")
      .withColumn("n_rel_corpus", coalesce(col("n_rel_corpus"), lit(0L)))
      .join(perProbe, Seq("probe_id"), "left")
      .withColumn("__dcg", coalesce(col("__dcg"), lit(0).cast(dec)))
      .join(broadcast(ideal),
        least(col("n_rel_corpus"), lit(k.toLong)) === col("m"), "left")
      .select(
        col("probe_id"), col("n_rel_corpus"),
        when(col("n_rel_corpus") > 0,
          coalesce(round(lit(1.0) / col("__firstrel"), 6), lit(0.0)))
          .as("rr"),
        when(col("n_rel_corpus") > 0,
          col("__dcg").cast("double")).as("dcg"),
        when(col("n_rel_corpus") > 0,
          col("__idcg").cast("double")).as("idcg"),
        when(col("n_rel_corpus") > 0,
          round(col("__dcg").cast("double") /
            col("__idcg").cast("double"), 6)).as("ndcg"))
      .orderBy("probe_id")
  }

  /**
   * Hard-negative mining for contrastive training (DPR/SimCSE-style
   * retriever data prep): for each probe, the `k` MOST-similar corpus
   * vectors carrying a DIFFERENT label — the negatives closest to the
   * decision boundary, where the gradient signal lives. Same
   * bounded-shuffle shape as [[cosineTopK]] (broadcast probes,
   * per-partition partial top-k before the window exchange), with the
   * label-inequality predicate applied BEFORE scoring so same-label
   * candidates never even reach the dot product. Rows with a NULL
   * label drop out on either side (null-safe inequality would mine
   * "unknown" as negative — wrong default for training data).
   *
   * Output: (probe_id, vec_id, label, rank, cosine).
   */
  def hardNegatives(
      corpus: DataFrame,
      probes: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String,
      k: Int): DataFrame = {
    val c = corpus.select(
      col(idCol).as("vec_id"), col(labelCol).as("label"),
      toDoubleVec(col(vecCol)).as("__v"))
      .withColumn("__vnorm", norm(col("__v")))
    val p = probes.select(
      col(idCol).as("probe_id"), col(labelCol).as("__plabel"),
      toDoubleVec(col(vecCol)).as("__p"))
      .withColumn("__pnorm", norm(col("__p")))
    val scored = c.crossJoin(broadcast(p))
      .where(col("label") =!= col("__plabel"))
      .withColumn(
        "__cos",
        dot(col("__v"), col("__p")) / (col("__vnorm") * col("__pnorm")))
      .select("probe_id", "vec_id", "label", "__cos")
    val w = Window.partitionBy("probe_id")
      .orderBy(
        when(!isnan(col("__cos")), col("__cos")).desc_nulls_last,
        col("vec_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(
        col("probe_id"), col("vec_id"), col("label"), col("rank"),
        col("__cos").as("cosine"))
  }

  /** Rademacher hyperplane component (p, d): +1 when the first hex
    * digit of md5("p:d") is < 8, else −1 — a portable derivation any
    * engine (and the DuckDB oracle) reproduces with no shared state. */
  private def srpSign(p: Int, d: Int): Double = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$p:$d".getBytes("UTF-8"))
    if (((digest(0) >> 4) & 0xf) < 8) 1.0 else -1.0
  }

  /**
   * Signed-random-projection LSH bucket key: `numPlanes` Rademacher
   * (±1) hyperplanes; the bucket is the concatenated sign bits of the
   * projections.
   *
   * The hyperplane matrix is DATA-INDEPENDENT, so it is precomputed
   * driver-side (one md5 per (plane, dim), ~8×1024 total) and shipped
   * into the plan as an array literal — the per-row cost is a pure
   * multiply-add, not numPlanes × dims md5 calls (a ~500× hashing
   * saving per row at 64 dims / 8 planes).
   *
   * Scale: computed entirely within the row (zero shuffle); the
   * downstream group-by-bucket is the only exchange, keyed by a
   * short string. This is the 100 TB path: exact cosine runs only
   * within buckets, never across the full corpus. Vectors wider than
   * `maxDims` would be silently truncated by the slice — raise
   * `maxDims` for such corpora (literal cost is one flat double
   * array per plane).
   */
  /** Fast path: all `numTables` SRP buckets in one codegen'd kernel
    * pass ([[graft.functions.SrpBuckets]]); bit-identical to mapping
    * [[srpBucket]] over the tables (cross-checked in SimilaritySpec). */
  def srpBucketsFast(vecCol: Column, numPlanes: Int, numTables: Int): Column =
    graft.functions.SrpBuckets(vecCol, numPlanes, numTables)

  /** Pure-built-in reference formulation of one SRP bucket (table
    * `planeOffset / numPlanes` of [[srpBucketsFast]]). Vectors wider
    * than `maxDims` project onto the first `maxDims` axes — both
    * operands sliced to the same width, matching the kernel (an
    * unsliced zip_with would null-pad the shorter side and poison the
    * sum instead). */
  def srpBucket(
      vecCol: Column,
      numPlanes: Int,
      planeOffset: Int = 0,
      maxDims: Int = 1024): Column = {
    val v0 = toDoubleVec(vecCol)
    val width = least(size(v0), lit(maxDims))
    val v = slice(v0, lit(1), width)
    val bits = (0 until numPlanes).map { i =>
      val p = planeOffset + i
      val planeSigns = typedLit((0 until maxDims).map(d => srpSign(p, d)))
      val proj = aggregate(
        zip_with(v, slice(planeSigns, lit(1), width), _ * _),
        lit(0.0), _ + _)
      when(proj > 0, "1").otherwise("0")
    }
    concat(bits: _*)
  }

  /**
   * Multi-table SRP-LSH near-duplicate candidates: `numTables`
   * independent hash tables (table t uses planes
   * [t·numPlanes, (t+1)·numPlanes)); vectors sharing a bucket in ANY
   * table become candidates, scored with exact cosine. The standard
   * recall dial for hash-based ANN: single-table miss probability
   * (1 − s^k) drops to (1 − s^k)^L with L tables.
   *
   * Output: (vec_a, vec_b, cosine), distinct across tables.
   *
   * Scale: (table, bucket) rows explode O(n·L); the self-join
   * shuffles on the (table, bucket) key; vectors ride the rows so
   * scoring needs no lookup joins, and the distinct collapses
   * cross-table duplicates before the threshold filter.
   */
  def lshNearDupMulti(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      numPlanes: Int,
      numTables: Int,
      minCosine: Double): DataFrame = {
    val buckets = srpBucketsFast(col(vecCol), numPlanes, numTables)
    val tabbed = corpus.select(
      col(idCol).as("id"), toDoubleVec(col(vecCol)).as("__v"),
      posexplode(buckets).as(Seq("__table", "__bucket")))
      .withColumn("__norm", norm(col("__v")))
    val a = tabbed.select(
      col("__table"), col("__bucket"), col("id").as("vec_a"),
      col("__v").as("__va"), col("__norm").as("__na"))
    val b = tabbed.select(
      col("__table"), col("__bucket"), col("id").as("vec_b"),
      col("__v").as("__vb"), col("__norm").as("__nb"))
    scoreBucketPairs(
      a.join(b, Seq("__table", "__bucket"))
        .where(col("vec_a") < col("vec_b")),
      "vec_a", "vec_b", "__va", "__vb", "__na", "__nb", minCosine)
  }

  /** Cosine scoring + threshold/NaN filtering of bucket-joined pairs
    * — shared by the self-join and cross-corpus paths so score and
    * zero-norm semantics can never diverge between them. */
  private def scoreBucketPairs(
      pairs: DataFrame,
      lId: String, rId: String,
      lVec: String, rVec: String,
      lNorm: String, rNorm: String,
      minCosine: Double): DataFrame =
    pairs
      .select(lId, rId, lVec, rVec, lNorm, rNorm)
      .distinct()
      .withColumn(
        "cosine",
        dot(col(lVec), col(rVec)) / (col(lNorm) * col(rNorm)))
      .where(coalesce(col("cosine"), lit(-2.0)) >= minCosine
        && !isnan(col("cosine")))
      .select(lId, rId, "cosine")

  /**
   * Incremental (cross-corpus) embedding near-dups: SRP bucket join
   * of an INCOMING batch against the EXISTING corpus — the vector-
   * modality counterpart of `Dedup.crossCorpusCandidates`. Only
   * (new, old) pairs form; the corpus pays its bucket projection
   * once per batch (persist the bucketed frame to amortize — it is
   * the embedding dedup index), and in-bucket expansion is
   * ~batch·n/2^planes per table, never batch×corpus.
   *
   * Output: (new_id, old_id, cosine) for pairs at or above
   * `minCosine`; NaN (zero-norm) pairs are dropped.
   */
  def crossCorpusNearDups(
      existing: DataFrame,
      incoming: DataFrame,
      idCol: String,
      vecCol: String,
      numPlanes: Int,
      numTables: Int,
      minCosine: Double): DataFrame = {
    def tabbed(df: DataFrame, side: String) =
      df.select(
        col(idCol).as(s"${side}_id"),
        toDoubleVec(col(vecCol)).as(s"__v$side"),
        posexplode(srpBucketsFast(col(vecCol), numPlanes, numTables))
          .as(Seq("__table", "__bucket")))
        .withColumn(s"__n$side", norm(col(s"__v$side")))
    scoreBucketPairs(
      tabbed(incoming, "new")
        .join(tabbed(existing, "old"), Seq("__table", "__bucket")),
      "new_id", "old_id", "__vnew", "__vold", "__nnew", "__nold", minCosine)
  }

  /**
   * Deterministic IVF coarse centroids: the `nlist` lowest-id corpus
   * vectors, collected to the driver (bounded: nlist × dims doubles —
   * the same footprint a broadcast join would ship). A production
   * deployment trains real k-means centroids offline on a sample and
   * ships them exactly like this — the assignment/search plumbing
   * below is unchanged by centroid quality.
   */
  /** Deterministic hash-slice threshold for [[trainCentroids]]'
    * train-on-a-sample bound: rows survive when `xxhash64(id) mod
    * mod < keep`. The modulus is 2^62 so the fraction's granularity
    * (1/mod) can never floor the kept-row count above the requested
    * bound (a 2^20 modulus would keep ~n/2^20 rows — linear in the
    * corpus — once n > maxRows·2^20); the product is computed in
    * BigInt to avoid overflow. */
  private[graft] def hashSliceKeep(n: Long, maxRows: Long): (Long, Long) = {
    val mod = 1L << 62
    val keep = math.max(1L, ((BigInt(mod) * maxRows) / n).toLong)
    (mod, keep)
  }

  def ivfSeeds(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nlist: Int): Seq[Seq[Double]] = {
    corpus.select(col(idCol), toDoubleVec(col(vecCol)))
      .orderBy(col(idCol)).limit(nlist)
      .collect()
      .map(_.getSeq[Double](1).toVector)
      .toSeq
  }

  /**
   * Distributed k-means (Lloyd's) centroid training over the corpus —
   * the "train real centroids offline" step [[ivfSeeds]] defers to,
   * producing exactly the `Seq[Seq[Double]]` the IVF plumbing
   * consumes.
   *
   * Per iteration: one shuffle. Assignment is a per-row projection
   * against the literal centroid matrix (same flat-ranking-array
   * shape as [[cellRanking]], euclidean metric — argmin of
   * |c|² − 2·v·c since |v|² is a per-row constant); the mean
   * recompute is posexplode → groupBy(cell, dim) → avg, which
   * partial-aggregates map-side so the exchange carries
   * O(cells × dims × partitions), independent of corpus size. The
   * k × dims centroid matrix round-trips through the driver each
   * iteration — the standard k-means control loop (the data never
   * does). Deterministic: seeded by single-pass maximin over a
   * hash-ordered 8k candidate pool (first seed = lowest id), empty
   * cells keep their previous centroid, fixed iteration/tolerance
   * stop.
   *
   * Scale: training is BOUNDED at `maxTrainRows` — when the corpus
   * exceeds it, a deterministic hash slice (`xxhash64(id) mod 2⁶² <
   * threshold`, [[hashSliceKeep]]) thins the training set to ≈ the
   * bound before any
   * iteration, so "train on a sample" is enforced, not just advised:
   * centroid quality needs thousands of points per cell, not the
   * full 100 TB corpus; the full corpus only ever sees the final
   * literal matrix via [[ivfCell]]. The slice is a distributed
   * filter (never a global limit), stable across reruns, and
   * inactive on corpora at or under the bound — pass a larger bound
   * to train on more.
   */
  def trainCentroids(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      maxIter: Int = 10,
      tol: Double = 1e-9,
      maxTrainRows: Long = 4L * 1000 * 1000,
      seedPoolSize: Int = 0): Seq[Seq[Double]] = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(maxTrainRows >= 1, s"maxTrainRows must be >= 1, got $maxTrainRows")
    require(seedPoolSize >= 0,
      s"seedPoolSize must be >= 0 (0 = auto max(8k, 64)), got $seedPoolSize")
    val first = ivfSeeds(corpus, idCol, vecCol, 1)
    require(first.nonEmpty, "corpus has no vectors to train on")
    val dims = first.head.length
    val full = corpus
      .select(col(idCol).as("__id"), toDoubleVec(col(vecCol)).as("__v"))
      .where(size(col("__v")) === dims)
      .cache()
    val n = full.count() // also warms the cache before seeding
    var sliced = n > maxTrainRows
    val vecs =
      if (!sliced) full
      else {
        val (mod, keep) = hashSliceKeep(n, maxTrainRows)
        val s = full.where(
          pmod(xxhash64(col("__id").cast("string")), lit(mod)) < lit(keep))
          .cache()
        // A pathological tiny slice (small n just over the bound can
        // hash EVERY row above the threshold) falls back to the full
        // corpus entirely — seeds, pool, and iterations all need a
        // non-empty training frame.
        if (s.limit(1).count() == 0) { s.unpersist(); sliced = false; full }
        else s
      }
    try {
      // When the slice dropped the corpus-lowest id, re-anchor the
      // first seed inside the training set (identical otherwise).
      val firstSeed: Vector[Double] =
        if (!sliced) first.head.toVector
        else vecs.orderBy(col("__id")).limit(1).select("__v")
          .collect().head.getSeq[Double](0).toVector
      // Single-pass seeding (k-means‖-style sample-then-select): ONE
      // distributed scan draws a deterministic hash-ordered candidate
      // pool of 8k vectors (TakeOrderedAndProject — bounded per-task
      // heap, no full sort, no RNG state), then farthest-point maximin
      // runs on the DRIVER over the pool. The previous form ran the
      // maximin directly on the corpus: k−1 SEQUENTIAL full scans
      // (one orderBy…limit(1) per seed) — O(k) passes; this is O(1)
      // passes in k. A uniform hash sample of 8k points hits every
      // cluster holding ≥ 1/(8k) of the corpus mass, which preserves
      // the anti-collapse property maximin exists for (naive lowest-id
      // seeding collapses when ids correlate with clusters → Lloyd's
      // lands in a split-one-merge-rest local optimum). First seed
      // stays the lowest-id vector; pool-order breaks maximin ties —
      // both deterministic, so reruns reproduce the exact centroids.
      // `seedPoolSize` override (round 9): a pool ⊇ the training set
      // makes the hash ORDER value-irrelevant (maximin ties are
      // measure-zero on continuous data) — the regime the q200
      // oracle replays without needing xxhash64 in SQL.
      val poolSize =
        if (seedPoolSize > 0) seedPoolSize else math.max(k * 8, 64)
      val pool: Array[Vector[Double]] = vecs
        .orderBy(xxhash64(col("__id").cast("string")).asc, col("__id").asc)
        .limit(poolSize)
        .select("__v")
        .collect()
        .map(_.getSeq[Double](0).toVector)
      val seeds = scala.collection.mutable.ArrayBuffer[Seq[Double]](firstSeed)
      val minD = Array.fill(pool.length)(Double.MaxValue)
      while (seeds.size < k) {
        val s = seeds.last
        var best = 0
        var bestD = -1.0
        var i = 0
        while (i < pool.length) {
          var d = 0.0
          var j = 0
          val p = pool(i)
          while (j < dims) { val t = p(j) - s(j); d += t * t; j += 1 }
          if (d < minD(i)) minD(i) = d
          if (minD(i) > bestD) { bestD = minD(i); best = i }
          i += 1
        }
        seeds += pool(best)
      }
      var centroids: Seq[Seq[Double]] = seeds.toSeq
      var iter = 0
      var shift = Double.MaxValue
      while (iter < maxIter && shift > tol) {
        // Lloyd assignment IS pqCode's min-L2 argmin (‖c‖² − 2·v·c,
        // lowest index on ties) — one expression, kept in one place
        val assigned = vecs.select(
          pqCode(col("__v"), centroids).as("__cell"),
          col("__v"))
        // Mean on the 1e-6 floor grid (round 9, the q200 gate):
        // floor(x·10⁶) of identical doubles is IDENTICAL on every
        // engine (no rounding-rule parity hazard at all), the long
        // sum is exact and order-free, and the two-division finish
        // is a fixed IEEE sequence — a plain avg() of doubles is
        // partition-order-dependent and irreproducible outside
        // Spark. Quantization bias ≤ 1e-6 per component, far inside
        // Lloyd's noise floor. Mass bound (ANSI throws, never
        // corrupts): Σ|x|·10⁶ per (cell, dim) < 2⁶³.
        val sums = assigned
          .select(col("__cell"), posexplode(col("__v")).as(Seq("__pos", "__x")))
          .groupBy("__cell", "__pos")
          .agg(((sum(floor(col("__x") * lit(1000000.0d))).cast("double")
            / count(lit(1)).cast("double")) / lit(1000000.0d)).as("__mean"))
          .collect()
        val next = Array.tabulate(k)(i => centroids(i).toArray)
        sums.foreach { r =>
          next(r.getInt(0))(r.getInt(1)) = r.getDouble(2)
        }
        shift = centroids.zip(next).map { case (a, b) =>
          a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
        }.max
        centroids = next.map(_.toSeq).toSeq
        iter += 1
      }
      centroids
    } finally {
      if (sliced) vecs.unpersist()
      full.unpersist()
    }
  }

  /**
   * Per-seed ranking array of (neg-score, cell) structs; sorting it
   * ascending orders cells by descending cosine with ascending-cell
   * tiebreak. The score is dot(v, c)/|c| — the row's own norm |v| is
   * a positive per-row constant, so dropping it changes no ordering
   * (and saves an extra dot product per seed). Built as a flat array
   * so each seed's score appears in the plan exactly once — an
   * argmax built by folding when/otherwise would nest the
   * accumulator in both branches and grow the expression tree
   * exponentially in nlist.
   */
  private def cellRanking(v: Column, seeds: Seq[Seq[Double]]): Column =
    array(seeds.zipWithIndex.map { case (s, i) =>
      // Zero-norm seed: the division is by a DRIVER-side constant,
      // and ANSI Spark throws on double /0 — rank such a cell at
      // "cosine 0" (neg = 0.0) instead. Non-degenerate seeds are
      // bit-identical to the unguarded form (r13; the all-zero
      // corpus regime every IVF entry point must survive).
      val n = math.sqrt(s.map(x => x * x).sum)
      val neg =
        if (n > 0.0) -(dot(v, typedLit(s)) / lit(n)) else lit(0.0)
      struct(neg.as("neg"), lit(i).as("cell"))
    }: _*)

  /**
   * IVF cell assignment: index of the centroid with the highest
   * cosine (ties → lowest index). Pure per-row projection against
   * the literal centroid matrix — zero shuffle at any corpus size.
   * Non-nullable (see [[toDoubleVec]]).
   */
  def ivfCell(vecCol: Column, seeds: Seq[Seq[Double]]): Column =
    coalesce(
      element_at(sort_array(cellRanking(toDoubleVec(vecCol), seeds)), 1)
        .getField("cell"),
      lit(-1))

  /**
   * IVF (inverted-file) approximate nearest neighbors: the corpus is
   * partitioned into `nlist` Voronoi cells by [[ivfCell]]; each probe
   * searches exactly its `nprobe` closest cells with exact cosine and
   * keeps top-k (self-matches excluded, ties by ascending id).
   *
   * Output: (probe_id, vec_id, rank, cosine).
   *
   * Scale: cell assignment is shuffle-free projection; the probe→cell
   * fan-out is broadcast (probes × nprobe rows); the only exchange
   * hashes corpus rows by cell key, and each probe scans ~nprobe/nlist
   * of the corpus instead of all of it — the IVF recall/cost dial.
   */
  def ivfSearch(
      corpus: DataFrame,
      probes: DataFrame,
      idCol: String,
      vecCol: String,
      nlist: Int,
      nprobe: Int,
      k: Int): DataFrame = {
    val seeds = ivfSeeds(corpus, idCol, vecCol, nlist)
    val c = corpus.select(
      col(idCol).as("vec_id"), toDoubleVec(col(vecCol)).as("__v"))
      .withColumn("__cell", ivfCell(col("__v"), seeds))
      .withColumn("__vnorm", norm(col("__v")))

    // Probe side: rank all cells per probe, keep the nprobe closest.
    val p = probes.select(
      col(idCol).as("probe_id"), toDoubleVec(col(vecCol)).as("__p"))
      .withColumn("__pnorm", norm(col("__p")))
      .withColumn(
        "__cell",
        explode(transform(
          slice(sort_array(cellRanking(col("__p"), seeds)), 1, nprobe),
          s => s.getField("cell"))))

    val w = Window.partitionBy("probe_id")
      .orderBy(
        when(!isnan(col("__cos")), col("__cos")).desc_nulls_last,
        col("vec_id").asc)
    c.join(broadcast(p), Seq("__cell"))
      .where(col("vec_id") =!= col("probe_id"))
      .withColumn(
        "__cos",
        dot(col("__v"), col("__p")) / (col("__vnorm") * col("__pnorm")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(
        col("probe_id"), col("vec_id"), col("rank"), col("__cos").as("cosine"))
  }

  /**
   * V26: IVF nprobe recall sweep — the tuning readout run BEFORE
   * committing an (nlist, nprobe) point to a serving index: for each
   * candidate nprobe, recall@k of [[ivfSearch]] against the exact
   * [[cosineTopK]] ground truth over the same probes. The standard
   * ANN cost/recall dial (FAISS benchmarks report exactly this
   * curve); nprobe == nlist must read recall 1.0 (all cells scanned
   * — the built-in self-check the gate asserts).
   *
   * ONE corpus pass serves every sweep point: cells assign once, the
   * probe side keeps each candidate cell's RANK, the candidate join
   * and the cosine evaluate once at max(nprobes), and each sweep
   * point materializes as a filter (cell_rank ≤ nprobe) via a
   * bounded literal explode — running [[ivfSearch]] per point would
   * multiply the corpus scans by |nprobes|. Exact ground truth is
   * one [[cosineTopK]] pass (the probes×corpus cost a tuning sweep
   * pays by definition — run it on a sample at 100 TB, as the
   * trainCentroids bound enforces for training).
   *
   * Recall = |approx ∩ exact| / |exact| per sweep point (exact pair
   * count, not probes·k, so under-k corpora stay honest); integer
   * hit/total counts, one IEEE division, round(6) — non-negative, no
   * signed-zero exposure.
   *
   * Output: (nprobe, n_probes, exact_pairs, hit_pairs, recall),
   * ascending by nprobe — sweep points with zero candidates still
   * emit (hit_pairs = 0).
   */
  def ivfRecallSweep(
      corpus: DataFrame,
      probes: DataFrame,
      idCol: String,
      vecCol: String,
      nlist: Int,
      nprobes: Seq[Int],
      k: Int): DataFrame = {
    require(nprobes.nonEmpty, "nprobes must be non-empty")
    require(nprobes.forall(np => np >= 1 && np <= nlist),
      s"every nprobe must be in [1, nlist=$nlist], got $nprobes")
    val nps = nprobes.distinct.sorted
    val npMax = nps.max
    val spark = corpus.sparkSession
    val seeds = ivfSeeds(corpus, idCol, vecCol, nlist)
    // An undersized corpus yields fewer seeds than nlist; sweep
    // points beyond seeds.size would silently alias the full scan
    // while still being LABELED with their declared nprobe — fail
    // loudly instead (r13 ADVICE).
    require(seeds.size == nlist,
      s"corpus has only ${seeds.size} rows < nlist=$nlist — " +
        "sweep points beyond seeds.size would alias the full scan")
    val c = corpus.select(
      col(idCol).as("vec_id"), toDoubleVec(col(vecCol)).as("__v"))
      .withColumn("__cell", ivfCell(col("__v"), seeds))
      .withColumn("__vnorm", norm(col("__v")))
    val p = probes.select(
      col(idCol).as("probe_id"), toDoubleVec(col(vecCol)).as("__p"))
      .withColumn("__pnorm", norm(col("__p")))
      .select(col("probe_id"), col("__p"), col("__pnorm"),
        posexplode(transform(
          slice(sort_array(cellRanking(col("__p"), seeds)), 1, npMax),
          s => s.getField("cell"))).as(Seq("__cr0", "__cell")))
      .withColumn("__cell_rank", col("__cr0") + 1)
      .drop("__cr0")
    val swept = c.join(broadcast(p), Seq("__cell"))
      .where(col("vec_id") =!= col("probe_id"))
      .withColumn("__cos",
        dot(col("__v"), col("__p")) / (col("__vnorm") * col("__pnorm")))
      .withColumn("nprobe",
        explode(filter(typedLit(nps),
          np => np >= col("__cell_rank"))))
    val w = Window.partitionBy("nprobe", "probe_id")
      .orderBy(
        when(!isnan(col("__cos")), col("__cos")).desc_nulls_last,
        col("vec_id").asc)
    val approx = swept
      .withColumn("__r", row_number().over(w))
      .where(col("__r") <= k)
      .select(col("nprobe"), col("probe_id"), col("vec_id"))
    // the exact ground truth feeds TWO consumers (the totals
    // aggregate and the hit semi-join) with different pruning —
    // barrier the ≤probes·k-row frame so the probes×corpus pass
    // runs once (the q127 reuse rule)
    val exact = Barrier.barrier(
      cosineTopK(corpus, probes, idCol, vecCol, k)
        .select(col("probe_id"), col("vec_id")))
    import spark.implicits._
    val exactTotals = exact.agg(
      count(lit(1)).as("exact_pairs"),
      countDistinct(col("probe_id")).as("n_probes"))
    val hits = approx
      .join(exact, Seq("probe_id", "vec_id"), "left_semi")
      .groupBy("nprobe").agg(count(lit(1)).as("hit_pairs"))
    nps.toDF("nprobe")
      .join(hits, Seq("nprobe"), "left")
      .na.fill(0L, Seq("hit_pairs"))
      .crossJoin(exactTotals)
      .select(col("nprobe"), col("n_probes"), col("exact_pairs"),
        col("hit_pairs"),
        // empty ground truth -> NULL recall, not /0 (ANSI throws on
        // ANY division by zero; the NULL divisor matches DuckDB)
        round(col("hit_pairs").cast("double")
          / when(col("exact_pairs") > 0L,
            col("exact_pairs").cast("double")), 6).as("recall"))
      .orderBy("nprobe")
  }

  /**
   * V28 (r12): recall sweep for the COMPOSED IVF+PQ path — the
   * readout a served 100 TB index is actually tuned by. V26
   * ([[ivfRecallSweep]]) measures IVF routing loss alone and
   * q199/q295 audit PQ quantization in isolation, but a production
   * index serves [[ivfPqSearch]] — routing loss AND ADC-scoring loss
   * composed — so its deployable operating point is a
   * recall-vs-(nprobe, m) surface: for every grid point, recall@k of
   * the composed pipeline against the exact [[cosineTopK]] ground
   * truth over the same probes.
   *
   * Execution: ONE exact ground-truth pass (Barrier-routed — it
   * feeds the totals aggregate and the hit semi-join, the q290
   * rule); probe cell routing ranks ONCE at max(nprobe) (the V26
   * swept-filter trick — each sweep point is a filter, not a rescan)
   * and is shared by every m point; each m point costs one corpus
   * ENCODE scan projection (codes + cell against literal matrices,
   * zero shuffle) plus the broadcast candidate join. ADC entries
   * quantize HALF_UP to 6dp and sum in exact DECIMAL(18,6) (the
   * q199/q228 determinism contract — equal-code candidates score
   * EXACTLY equal, so the (adc, vec_id) rank is engine-free); the
   * per-probe (m×k_cb) table builds as a sequential index-order
   * Σ(p_j−c_j)² fold over the SMALL probe frame (HOF fallback is
   * fine there — never on the corpus side).
   *
   * Recall = |approx ∩ exact| / |exact| per grid point (exact pair
   * counts); grid points with zero candidates still emit rows.
   *
   * Output: (m, nprobe, n_probes, exact_pairs, hit_pairs, recall),
   * ordered by (m, nprobe).
   */
  def ivfPqRecallSweep(
      corpus: DataFrame, probes: DataFrame, idCol: String,
      vecCol: String, seeds: Seq[Seq[Double]],
      codebooksByM: Seq[Seq[Seq[Seq[Double]]]],
      nprobes: Seq[Int], k: Int): DataFrame = {
    require(codebooksByM.nonEmpty, "need at least one codebook set")
    require(codebooksByM.map(_.size).distinct.size == codebooksByM.size,
      "codebook sets must have distinct m")
    require(nprobes.nonEmpty, "nprobes must be non-empty")
    require(nprobes.forall(np => np >= 1 && np <= seeds.size),
      s"every nprobe must be in [1, nlist=${seeds.size}], got $nprobes")
    val nps = nprobes.distinct.sorted
    val npMax = nps.max
    val spark = corpus.sparkSession
    import spark.implicits._
    val dec6 = org.apache.spark.sql.types.DecimalType(18, 6)
    val pBase = probes.select(
      col(idCol).as("probe_id"), toDoubleVec(col(vecCol)).as("__p"))
      .select(col("probe_id"), col("__p"),
        posexplode(transform(
          slice(sort_array(cellRanking(col("__p"), seeds)), 1, npMax),
          s => s.getField("cell"))).as(Seq("__cr0", "__cell")))
      .withColumn("__cell_rank", col("__cr0") + 1)
      .drop("__cr0")
    val perM = codebooksByM.map { cbs =>
      val m = cbs.size
      val kCb = cbs.head.size
      val sub = cbs.head.head.size
      val enc = corpus
        .where(size(col(vecCol)) === m * sub)
        .select(
          col(idCol).as("vec_id"),
          ivfCell(col(vecCol), seeds).as("__cell"),
          array((0 until m).map { s =>
            pqCode(slice(toDoubleVec(col(vecCol)), s * sub + 1, sub),
              cbs(s)).cast("int")
          }: _*).as("__codes"))
      val tab = array((for (s <- 0 until m; c <- 0 until kCb) yield {
        val ps = slice(col("__p"), s * sub + 1, sub)
        round(aggregate(
          zip_with(ps, typedLit(cbs(s)(c)), (a, b) => (a - b) * (a - b)),
          lit(0.0), _ + _), 6).cast(dec6)
      }): _*)
      val p = pBase.withColumn("__tab", tab)
      val adc = (0 until m)
        .map(s => element_at(col("__tab"),
          lit(s * kCb) + element_at(col("__codes"), s + 1) + lit(1))
          .cast(dec6))
        .reduce(_ + _)
      val w = Window.partitionBy("nprobe", "probe_id")
        .orderBy(col("__adc").asc, col("vec_id").asc)
      enc.join(broadcast(p), Seq("__cell"))
        .where(col("vec_id") =!= col("probe_id"))
        .withColumn("__adc", adc)
        .withColumn("nprobe",
          explode(filter(typedLit(nps), np => np >= col("__cell_rank"))))
        .withColumn("__r", row_number().over(w))
        .where(col("__r") <= k)
        .select(lit(m).as("m"), col("nprobe"), col("probe_id"),
          col("vec_id"))
    }
    val approx = perM.reduce(_.unionByName(_))
    val exact = barrier(
      cosineTopK(corpus, probes, idCol, vecCol, k)
        .select(col("probe_id"), col("vec_id")))
    val exactTotals = exact.agg(
      count(lit(1)).as("exact_pairs"),
      countDistinct(col("probe_id")).as("n_probes"))
    val hits = approx
      .join(exact, Seq("probe_id", "vec_id"), "left_semi")
      .groupBy("m", "nprobe").agg(count(lit(1)).as("hit_pairs"))
    val grid = codebooksByM.map(_.size)
      .flatMap(m => nps.map(np => (m, np)))
      .toDF("m", "nprobe")
    grid.join(hits, Seq("m", "nprobe"), "left")
      .na.fill(0L, Seq("hit_pairs"))
      .crossJoin(exactTotals)
      .select(col("m"), col("nprobe"), col("n_probes"),
        col("exact_pairs"), col("hit_pairs"),
        // empty ground truth -> NULL recall, not /0 (ANSI throws on
        // ANY division by zero; the NULL divisor matches DuckDB)
        round(col("hit_pairs").cast("double")
          / when(col("exact_pairs") > 0L,
            col("exact_pairs").cast("double")), 6).as("recall"))
      .orderBy("m", "nprobe")
  }

  /**
   * SemDeDup-style semantic deduplication (Abbas et al., "SemDeDup:
   * Data-efficient learning at web-scale through semantic
   * deduplication", 2023): partition the corpus into `nlist` Voronoi
   * cells, then WITHIN each cell suppress every vector whose cosine
   * to a lower-id cell-mate reaches `minCosine` — one survivor per
   * semantic near-dup group, chosen deterministically (min id).
   *
   * Output: (vec_id, cell, dup_of, is_kept) where `dup_of` is the
   * LOWEST suppressing cell-mate id (NULL for kept rows).
   *
   * Scale: this is exactly the published algorithm's shape — the
   * quadratic pairwise compare is confined to a cell, so cost is
   * Σ |cell|² not n²; `nlist` is the dial that keeps cells bounded as
   * the corpus grows (SemDeDup used k≈110k for LAION-440M, cells of
   * ~4k). Cell assignment is a shuffle-free projection against
   * literal centroids; the only exchange hashes by cell key. Skewed
   * cells are AQE's skew-join case; a production run trains centroids
   * offline ([[trainCentroids]]) sized so cells fit comfortably.
   *
   * `nlist` defaults to the paper's regime, derived from the corpus:
   * `max(1, ceil(n / targetCellSize))`, so mean cell population stays
   * ~`targetCellSize` and total pairwise work stays ~`n ·
   * targetCellSize` — LINEAR in the corpus — as data grows. The
   * derivation costs one partial-aggregated count() pass; callers who
   * already know n (or want the paper's exact k) pass `nlist =
   * Some(k)` and skip it.
   */
  def semanticDedup(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      minCosine: Double,
      nlist: Option[Int] = None,
      targetCellSize: Int = 64): DataFrame = {
    require(targetCellSize >= 1,
      s"semanticDedup: targetCellSize >= 1, got $targetCellSize")
    val k = nlist.getOrElse {
      math.max(1L, (corpus.count() + targetCellSize - 1) / targetCellSize)
        .toInt
    }
    val seeds = ivfSeeds(corpus, idCol, vecCol, k)
    val c = corpus
      .select(col(idCol).as("vec_id"), toDoubleVec(col(vecCol)).as("__v"))
      .withColumn("__cell", ivfCell(col("__v"), seeds))
      .withColumn("__norm", norm(col("__v")))
    val x = c.select(
      col("__cell"), col("vec_id").as("__xid"),
      col("__v").as("__xv"), col("__norm").as("__xn"))
    val y = c.select(
      col("__cell"), col("vec_id").as("__yid"),
      col("__v").as("__yv"), col("__norm").as("__yn"))
    // Lower-id neighbor wins: y is suppressed by the smallest x in
    // its cell with cos(x, y) >= minCosine.
    val dups = x.join(y, Seq("__cell"))
      .where(col("__xid") < col("__yid"))
      .where(
        dot(col("__xv"), col("__yv")) / (col("__xn") * col("__yn"))
          >= minCosine)
      .groupBy(col("__yid").as("vec_id"))
      .agg(min(col("__xid")).as("dup_of"))
    c.join(dups, Seq("vec_id"), "left")
      .select(
        col("vec_id"), col("__cell").as("cell"), col("dup_of"),
        col("dup_of").isNull.as("is_kept"))
  }

  /**
   * Scalar int8 quantization of an embedding column: per-vector
   * affine codes `q = floor((x − min)/scale + 0.5)` with
   * `scale = (max − min)/255` — the standard storage-compression
   * step for embedding corpora (4× smaller than float32; dequantize
   * as `min + q·scale`). Returns struct(minv, scale, codes) where
   * codes is array<int> in [0, 255]; constant vectors get scale 0
   * and all-zero codes.
   *
   * `floor(x + 0.5)` rather than round(): round-half semantics
   * differ across engines (half-up vs half-even), floor does not —
   * the DuckDB oracle reproduces codes exactly.
   *
   * DataFrame-level on purpose: the per-row stats (min/scale) must be
   * hoisted into their own multi-referenced aliases so each evaluates
   * ONCE per row — referencing `array_min(v)` inside the per-element
   * lambda re-evaluates it per element (O(d²); measured 19s vs <1s
   * at sf0.1), and CollapseProject would inline a single-use alias
   * right back into the lambda. Multi-referenced non-cheap aliases
   * are kept as a projection boundary by Catalyst.
   *
   * Scale: pure per-row projections, zero shuffle.
   */
  def quantizeInt8(
      df: DataFrame, vecCol: String, outCol: String = "quant"): DataFrame = {
    val staged = df
      .withColumn("__qv", toDoubleVec(col(vecCol)))
      .withColumn("__qmin", array_min(col("__qv")))
      .withColumn("__qscale", (array_max(col("__qv")) - col("__qmin")) / 255.0)
    staged
      .withColumn(
        outCol,
        struct(
          col("__qmin").as("minv"),
          col("__qscale").as("scale"),
          transform(
            col("__qv"),
            x => when(col("__qscale") === 0.0, lit(0))
              .otherwise(floor((x - col("__qmin")) / col("__qscale") + 0.5)
                .cast("int"))).as("codes")))
      .drop("__qv", "__qmin", "__qscale")
  }

  /** Max absolute reconstruction error of [[quantizeInt8]] codes. */
  def dequantMaxErr(vecCol: Column, quant: Column): Column = {
    val v = toDoubleVec(vecCol)
    val recon = transform(
      quant.getField("codes"),
      q => quant.getField("minv") + q * quant.getField("scale"))
    array_max(zip_with(v, recon, (x, r) => abs(x - r)))
  }

  /** HOF reference for the SQ8 integer dot — CodegenFallback, kept
    * only as [[graft.functions.IntVecDot]]'s bit-identical
    * cross-check (the [[dotHof]] discipline). */
  private[graft] def intDotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L),
      (acc, v) => acc + v)

  /**
   * V29 (r12): SQ8 symmetric-quantized inner-product search — the
   * FAISS `SQ8` middle tier between full-precision scoring (V2) and
   * V22's 1-bit Hamming: 4× less memory traffic than float32 with
   * far better fidelity than sign bits, the standard serving
   * quantization when PQ's codebook training is too heavy.
   *
   * SYMMETRIC global quantization is what makes the INTEGER dot a
   * faithful ranker: scale r = 127 / max|x| over the CORPUS (probes
   * encode with the same r — the index's trained constant), code =
   * ⌊x·r + 0.5⌋ ∈ [−127, 127]. With no offset term, the integer
   * code dot approximates dot(x,y)·r² — a POSITIVE constant times
   * the true inner product — so ranking by the exact integer score
   * is ranking by the quantized inner product, with ZERO float
   * hazard in the scoring or the ordering (scores are exact longs;
   * ties break on vec_id — the engine-free rank the PQ/ADC family
   * needs DECIMAL quantization to get, free here). An asymmetric
   * (min/max affine) scheme like V6's storage codes would inject
   * probe- and corpus-sum cross terms into every score — V6 stays
   * the storage/reconstruction tool (audit via [[dequantMaxErr]]),
   * this is the search tool.
   *
   * Encoding determinism: r is one IEEE division of the exact
   * corpus max|x| (max is order-free); each code one IEEE
   * multiply + floor — both engines replay bit-identically.
   * Degenerate all-zero corpus → NULL r → NULL scores, ranked
   * nulls-last, never a throw.
   *
   * Scale: one corpus pass for the scalar (one-row broadcast), one
   * encode projection per side (codes stay inside whole-stage
   * codegen — [[graft.functions.IntVecDot]] is a native kernel, the
   * HOF reference kept as its cross-check), probes broadcast
   * against the corpus scan with a partial per-partition top-k
   * (WindowGroupLimit) bounding the shuffle at probes × k per
   * partition — the [[cosineTopK]] shape. Compose with IVF cells
   * upstream to cut the scan (the q228 pattern).
   *
   * Output: (probe_id, vec_id, rank, score_int), rank 1..k per
   * probe by (score desc, vec_id asc).
   */
  def sq8Search(
      corpus: DataFrame,
      probes: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val c0 = corpus.select(
      col(idCol).as("vec_id"), toDoubleVec(col(vecCol)).as("__v"))
    val scaleRow = c0
      .agg(max(array_max(transform(col("__v"), x => abs(x)))).as("__m"))
      .select((lit(127.0) / when(col("__m") > 0.0, col("__m")))
        .as("__r"))
    def enc(v: Column) =
      transform(v, x => floor(x * col("__r") + lit(0.5)).cast("int"))
    val cEnc = c0.crossJoin(broadcast(scaleRow))
      .select(col("vec_id"), enc(col("__v")).as("__c"))
    val pEnc = probes.select(
        col(idCol).as("probe_id"), toDoubleVec(col(vecCol)).as("__p"))
      .crossJoin(broadcast(scaleRow))
      .select(col("probe_id"), enc(col("__p")).as("__pc"))
    val scored = cEnc.crossJoin(broadcast(pEnc))
      .where(col("vec_id") =!= col("probe_id"))
      .withColumn("__s",
        graft.functions.IntVecDot(col("__c"), col("__pc")))
      .select("probe_id", "vec_id", "__s")
    val w = Window.partitionBy("probe_id")
      .orderBy(col("__s").desc_nulls_last, col("vec_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("probe_id"), col("vec_id"), col("rank"),
        col("__s").as("score_int"))
  }

  /**
   * V30 (r13): IVF-routed SQ8 search — [[sq8Search]] composed behind
   * Voronoi cell routing, the shape a served SQ8 index actually runs
   * (FAISS `IVFx,SQ8`): the probe scans only its `nprobe` closest
   * cells' codes instead of the whole corpus, cutting the scan by
   * ~nprobe/nlist exactly as [[ivfSearch]] does for full-precision
   * scoring and [[ivfPqSearch]] for ADC. V29's scaladoc promised the
   * composition ("compose with IVF cells upstream"); this is it as a
   * first-class operator with its own gate.
   *
   * The SQ8 scale r = 127/max|x| trains on the FULL corpus — the
   * index's global trained constant, deliberately independent of the
   * routing (a per-cell scale would make scores incomparable across
   * a probe's cells). Cell assignment is [[ivfCell]]'s exact
   * arithmetic against the literal seed matrix; the probe routes to
   * its `nprobe` top cells by the same ranking ([[ivfSearch]]'s
   * probe side), so a vector routes identically as corpus row or
   * probe. Scoring is the exact integer code dot through the
   * codegen'd [[graft.functions.IntVecDot]] kernel — exact longs,
   * (score desc, vec_id asc) rank, zero float hazard in scoring or
   * ordering (V29's contract, unchanged by the routing).
   *
   * Degenerate all-zero corpus → NULL r → NULL scores ranked
   * nulls-last, never a throw ([[sq8Search]]'s contract).
   *
   * Scale: ONE corpus pass projects (cell, codes) — assignment and
   * encode are both shuffle-free projections against literals; the
   * probe fan-out (probes × nprobe rows) broadcasts against that
   * scan, and the only exchange is the per-probe rank window over
   * candidate rows (corpus × nprobe/nlist expected), bounded
   * map-side by the partial WindowGroupLimit. Nothing corpus-sized
   * crosses the driver.
   *
   * Output: (probe_id, cell, vec_id, rank, score_int), rank 1..k
   * per probe by (score desc, vec_id asc) across ALL routed cells.
   */
  def ivfSq8Search(
      corpus: DataFrame,
      probes: DataFrame,
      idCol: String,
      vecCol: String,
      seeds: Seq[Seq[Double]],
      nprobe: Int,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(nprobe >= 1 && nprobe <= seeds.size,
      s"nprobe must be in [1, ${seeds.size}], got $nprobe")
    val c0 = corpus.select(
      col(idCol).as("vec_id"), toDoubleVec(col(vecCol)).as("__v"))
    val scaleRow = c0
      .agg(max(array_max(transform(col("__v"), x => abs(x)))).as("__m"))
      .select((lit(127.0) / when(col("__m") > 0.0, col("__m")))
        .as("__r"))
    def enc(v: Column) =
      transform(v, x => floor(x * col("__r") + lit(0.5)).cast("int"))
    val cEnc = c0.crossJoin(broadcast(scaleRow))
      .select(col("vec_id"),
        ivfCell(col("__v"), seeds).as("__cell"),
        enc(col("__v")).as("__c"))
    val pEnc = probes.select(
        col(idCol).as("probe_id"), toDoubleVec(col(vecCol)).as("__p"))
      .crossJoin(broadcast(scaleRow))
      .withColumn("__cell",
        explode(transform(
          slice(sort_array(cellRanking(col("__p"), seeds)), 1, nprobe),
          s => s.getField("cell"))))
      .select(col("probe_id"), col("__cell"), enc(col("__p")).as("__pc"))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("__s").desc_nulls_last, col("vec_id").asc)
    cEnc.join(broadcast(pEnc), Seq("__cell"))
      .where(col("vec_id") =!= col("probe_id"))
      .withColumn("__s",
        graft.functions.IntVecDot(col("__c"), col("__pc")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("probe_id"), col("__cell").as("cell"),
        col("vec_id"), col("rank"), col("__s").as("score_int"))
  }

  /**
   * V35 (r15): retrieve-then-rerank — THE production ANN serving
   * shape (FAISS/ScaNN deployments, every two-stage retrieval
   * stack): a cheap quantized first stage OVER-FETCHES `candidates`
   * per probe ([[ivfSq8Search]] — IVF routing + exact int8 inner
   * product), then an exact second stage re-scores ONLY those
   * candidates with the full-precision cosine and cuts to k. The
   * quantization/metric loss the V32 sweep prices is mostly an
   * ORDERING loss inside the near-neighborhood — re-ranking the
   * over-fetched set recovers it at per-probe cost `candidates`
   * instead of corpus-sized ([[retrieveRerankReadout]] measures
   * exactly that recovery).
   *
   * Scale: stage 1 is ivfSq8Search's documented shape; the candidate
   * set (probes × candidates rows — bounded, serving-side small)
   * BROADCASTS back onto one corpus scan for the exact vectors, so
   * stage 2 never shuffles the corpus; scoring and the k-cut reuse
   * [[cosineTopK]]'s exact-fold dot and the shared [[rankTopK]] tie
   * rule (probe norms broadcast with the probe set).
   *
   * Output: (probe_id, vec_id, rank, cosine) — [[cosineTopK]]'s
   * shape, so a caller can swap exact search for serve-and-rerank
   * without touching downstream code.
   */
  def retrieveRerank(
      corpus: DataFrame,
      probes: DataFrame,
      idCol: String,
      vecCol: String,
      seeds: Seq[Seq[Double]],
      nprobe: Int,
      candidates: Int,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(candidates >= k,
      s"candidates must be >= k, got $candidates < $k")
    val cand = ivfSq8Search(corpus, probes, idCol, vecCol, seeds,
        nprobe, candidates)
      .select(col("probe_id"), col("vec_id"))
    val c = corpus.select(
      col(idCol).as("vec_id"), toDoubleVec(col(vecCol)).as("__v"))
      .withColumn("__vnorm", norm(col("__v")))
    val p = probes.select(
      col(idCol).as("probe_id"), toDoubleVec(col(vecCol)).as("__p"))
      .withColumn("__pnorm", norm(col("__p")))
    val scored = c
      .join(broadcast(cand), Seq("vec_id"))
      .join(broadcast(p), Seq("probe_id"))
      .withColumn("__cos",
        dot(col("__v"), col("__p")) /
          (col("__vnorm") * col("__pnorm")))
      .select("probe_id", "vec_id", "__cos")
    rankTopK(scored, k)
  }

  /**
   * V35 readout: what the rerank BUYS — recall@k against one exact
   * [[cosineTopK]] ground-truth pass (Barrier-routed, the q290
   * rule) for the quantized stage alone vs the reranked pipeline at
   * the same (nprobe, candidates). The rerank can only recover loss
   * INSIDE the retrieved set (routing misses stay missed — that is
   * nprobe's dial, V32's sweep); this readout isolates the ordering
   * loss the exact re-score removes.
   *
   * Output: (stage, n_probes, exact_pairs, hit_pairs, recall),
   * stage ∈ {'sq8_top_k', 'rerank'} ordered by stage.
   */
  def retrieveRerankReadout(
      corpus: DataFrame,
      probes: DataFrame,
      idCol: String,
      vecCol: String,
      seeds: Seq[Seq[Double]],
      nprobe: Int,
      candidates: Int,
      k: Int): DataFrame = {
    val exact = Barrier.barrier(
      cosineTopK(corpus, probes, idCol, vecCol, k)
        .select(col("probe_id"), col("vec_id")))
    val totals = exact.agg(
      count(lit(1)).as("exact_pairs"),
      countDistinct(col("probe_id")).as("n_probes"))
    def stageRow(stage: String, approx: DataFrame): DataFrame =
      approx.select(col("probe_id"), col("vec_id"))
        .join(exact, Seq("probe_id", "vec_id"), "left_semi")
        .agg(count(lit(1)).as("hit_pairs"))
        .crossJoin(broadcast(totals))
        .select(
          lit(stage).as("stage"),
          col("n_probes"), col("exact_pairs"), col("hit_pairs"),
          round(col("hit_pairs").cast("double") /
            when(col("exact_pairs") > 0L,
              col("exact_pairs").cast("double")), 6).as("recall"))
    val out = stageRow("sq8_top_k",
      ivfSq8Search(corpus, probes, idCol, vecCol, seeds, nprobe, k))
      .unionByName(stageRow("rerank",
        retrieveRerank(corpus, probes, idCol, vecCol, seeds, nprobe,
          candidates, k)))
      .orderBy("stage")
    out
  }

  /**
   * V36 (r16): rerank candidate-budget sweep — the production dial
   * [[retrieveRerank]] fixes at one value (VERDICT r15 ask #7):
   * stage-2 cost is LINEAR in `candidates` (each candidate is one
   * exact re-score), so a deployment prices recall@k against the
   * candidate budget — the V32 sweep pattern applied to the rerank
   * stage. Per budget C: recall of the reranked top-k vs ONE shared
   * exact ground-truth pass, plus `stage2_pairs` — the actual
   * number of exact re-scores that budget bought (< probes×C when
   * routed cells run dry), the cost axis of the curve.
   *
   * Execution is the V26/V32 one-pass sweep shape composed twice:
   * stage 1 runs ONCE at max(C) (the ivfSq8 candidate ranking is
   * prefix-consistent — rank ≤ C IS the C-budget candidate set);
   * the exact re-score runs ONCE over the max(C) candidate set
   * (candidates broadcast onto one corpus scan, the V35 rule); each
   * sweep point is then a cand_rank filter + a bounded per-probe
   * re-rank — no per-point corpus work at all. Ground truth is one
   * Barrier-routed [[cosineTopK]] pass (the q290 rule).
   *
   * Output: (candidates, n_probes, exact_pairs, hit_pairs, recall,
   * stage2_pairs), ascending by candidates.
   */
  def rerankCandidateSweep(
      corpus: DataFrame,
      probes: DataFrame,
      idCol: String,
      vecCol: String,
      seeds: Seq[Seq[Double]],
      nprobe: Int,
      candidateBudgets: Seq[Int],
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(candidateBudgets.nonEmpty,
      "candidateBudgets must be non-empty")
    require(candidateBudgets.forall(_ >= k),
      s"every candidate budget must be >= k=$k, " +
        s"got $candidateBudgets")
    val cs = candidateBudgets.distinct.sorted
    val maxC = cs.max
    val cand = Barrier.barrier(
      ivfSq8Search(corpus, probes, idCol, vecCol, seeds, nprobe,
          maxC)
        .select(col("probe_id"), col("vec_id"),
          col("rank").as("cand_rank")))
    val c = corpus.select(
      col(idCol).as("vec_id"), toDoubleVec(col(vecCol)).as("__v"))
      .withColumn("__vnorm", norm(col("__v")))
    val p = probes.select(
      col(idCol).as("probe_id"), toDoubleVec(col(vecCol)).as("__p"))
      .withColumn("__pnorm", norm(col("__p")))
    val scored = Barrier.barrier(
      c.join(broadcast(cand), Seq("vec_id"))
        .join(broadcast(p), Seq("probe_id"))
        .withColumn("__cos",
          dot(col("__v"), col("__p")) /
            (col("__vnorm") * col("__pnorm")))
        .select("probe_id", "vec_id", "cand_rank", "__cos"))
    val exact = Barrier.barrier(
      cosineTopK(corpus, probes, idCol, vecCol, k)
        .select(col("probe_id"), col("vec_id")))
    val totals = exact.agg(
      count(lit(1)).as("exact_pairs"),
      countDistinct(col("probe_id")).as("n_probes"))
    cs.map { cb =>
      val sub = scored.where(col("cand_rank") <= cb)
      val stage2 = sub.agg(count(lit(1)).as("stage2_pairs"))
      rankTopK(sub.select("probe_id", "vec_id", "__cos"), k)
        .select(col("probe_id"), col("vec_id"))
        .join(exact, Seq("probe_id", "vec_id"), "left_semi")
        .agg(count(lit(1)).as("hit_pairs"))
        .crossJoin(broadcast(totals))
        .crossJoin(broadcast(stage2))
        .select(
          lit(cb).as("candidates"),
          col("n_probes"), col("exact_pairs"), col("hit_pairs"),
          round(col("hit_pairs").cast("double") /
            when(col("exact_pairs") > 0L,
              col("exact_pairs").cast("double")), 6).as("recall"),
          col("stage2_pairs"))
    }.reduce(_.unionByName(_)).orderBy("candidates")
  }

  /**
   * V32 (r13): recall sweep for the IVF+SQ8 path — the tuning
   * readout that completes the serving-audit symmetry: V26 reads
   * IVF routing loss with exact scoring, V28 reads the IVF+PQ
   * composition, this reads [[ivfSq8Search]]'s composition — routing
   * loss AND the inner-product-integer-quantization loss (SQ8 ranks
   * by the quantized INNER PRODUCT, so recall against the exact
   * COSINE ground truth also prices the metric mismatch on
   * unnormalized corpora — exactly what a deployment must know
   * before serving). Per nprobe: recall@k of the composed pipeline
   * vs the exact [[cosineTopK]] truth over the same probes.
   *
   * Execution is V26's one-pass sweep shape: ONE exact ground-truth
   * pass (Barrier-routed — totals aggregate + hit semi-join, the
   * q290 rule); the probe side ranks cells ONCE at max(nprobe) and
   * every sweep point is a cell_rank filter; the corpus encodes
   * (cell, codes) once against the literal seeds + the corpus-global
   * SQ8 scale, candidates score through the codegen'd
   * [[graft.functions.IntVecDot]] kernel — exact long scores,
   * (score desc, vec_id) rank, zero float hazard in the approx
   * ranking.
   *
   * Output: (nprobe, n_probes, exact_pairs, hit_pairs, recall),
   * ascending by nprobe.
   */
  def ivfSq8RecallSweep(
      corpus: DataFrame,
      probes: DataFrame,
      idCol: String,
      vecCol: String,
      nlist: Int,
      nprobes: Seq[Int],
      k: Int): DataFrame = {
    require(nprobes.nonEmpty, "nprobes must be non-empty")
    require(nprobes.forall(np => np >= 1 && np <= nlist),
      s"every nprobe must be in [1, nlist=$nlist], got $nprobes")
    val nps = nprobes.distinct.sorted
    val npMax = nps.max
    val spark = corpus.sparkSession
    val seeds = ivfSeeds(corpus, idCol, vecCol, nlist)
    // Same undersized-corpus guard as [[ivfRecallSweep]] (r13
    // ADVICE): fewer seeds than nlist would alias the tail sweep
    // points to the full scan under their declared nprobe labels.
    require(seeds.size == nlist,
      s"corpus has only ${seeds.size} rows < nlist=$nlist — " +
        "sweep points beyond seeds.size would alias the full scan")
    val c0 = corpus.select(
      col(idCol).as("vec_id"), toDoubleVec(col(vecCol)).as("__v"))
    val scaleRow = c0
      .agg(max(array_max(transform(col("__v"), x => abs(x)))).as("__m"))
      .select((lit(127.0) / when(col("__m") > 0.0, col("__m")))
        .as("__r"))
    def enc(v: Column) =
      transform(v, x => floor(x * col("__r") + lit(0.5)).cast("int"))
    val c = c0.crossJoin(broadcast(scaleRow))
      .select(col("vec_id"),
        ivfCell(col("__v"), seeds).as("__cell"),
        enc(col("__v")).as("__c"))
    val p = probes.select(
      col(idCol).as("probe_id"), toDoubleVec(col(vecCol)).as("__p"))
      .crossJoin(broadcast(scaleRow))
      .select(col("probe_id"), enc(col("__p")).as("__pc"),
        posexplode(transform(
          slice(sort_array(cellRanking(col("__p"), seeds)), 1, npMax),
          s => s.getField("cell"))).as(Seq("__cr0", "__cell")))
      .withColumn("__cell_rank", col("__cr0") + 1)
      .drop("__cr0")
    val swept = c.join(broadcast(p), Seq("__cell"))
      .where(col("vec_id") =!= col("probe_id"))
      .withColumn("__s",
        graft.functions.IntVecDot(col("__c"), col("__pc")))
      .withColumn("nprobe",
        explode(filter(typedLit(nps),
          np => np >= col("__cell_rank"))))
    val w = Window.partitionBy("nprobe", "probe_id")
      .orderBy(col("__s").desc_nulls_last, col("vec_id").asc)
    val approx = swept
      .withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= k)
      .select(col("nprobe"), col("probe_id"), col("vec_id"))
    val exact = Barrier.barrier(
      cosineTopK(corpus, probes, idCol, vecCol, k)
        .select(col("probe_id"), col("vec_id")))
    import spark.implicits._
    val exactTotals = exact.agg(
      count(lit(1)).as("exact_pairs"),
      countDistinct(col("probe_id")).as("n_probes"))
    val hits = approx
      .join(exact, Seq("probe_id", "vec_id"), "left_semi")
      .groupBy("nprobe").agg(count(lit(1)).as("hit_pairs"))
    nps.toDF("nprobe")
      .join(hits, Seq("nprobe"), "left")
      .na.fill(0L, Seq("hit_pairs"))
      .crossJoin(exactTotals)
      .select(col("nprobe"), col("n_probes"), col("exact_pairs"),
        col("hit_pairs"),
        round(col("hit_pairs").cast("double")
          / when(col("exact_pairs") > 0L,
            col("exact_pairs").cast("double")), 6).as("recall"))
      .orderBy("nprobe")
  }

  /**
   * V31 (r13): incremental IVF ingest audit — the maintenance dial a
   * SERVED index runs at ingestion time (the ANN counterpart of
   * D25's incremental CC and K16's incremental aggregates): as new
   * vectors stream into a trained cell layout, two things silently
   * rot it — cells GROW unevenly (a hot topic concentrates arrivals
   * → scan cost of its probes balloons) and arrivals DRIFT from the
   * trained centroids (the embedding distribution moved → routing
   * loss rises even at constant cell sizes). Both are cheap to
   * measure per batch and answer "retrain now or keep appending?"
   * BEFORE recall degrades in production.
   *
   * Per cell of the trained layout (the row set is the literal cell
   * list — data-independent, every cell emits even when empty):
   *  - `n_base` / `n_new`: existing vs arriving rows routed there
   *    ([[ivfCell]]'s exact assignment against the literal seeds);
   *  - `growth_alert`: n_new·1000 > n_base·growthAlertPerMille —
   *    EXACT integer compare (a brand-new non-empty cell always
   *    alerts: n_base = 0);
   *  - mean squared distance to the assigned centroid for both
   *    populations — per-vector d² is one fixed IEEE chain over the
   *    literal seed (index-order zip_with fold) dropped onto the
   *    integer grid as floor(d²·10⁶) (the q163/q195 floor-grid
   *    primitive) before the EXACT DECIMAL(38,0) sum, display means
   *    one guarded IEEE division each;
   *  - `drift_alert`: mean_new·1000 > mean_base·driftAlertPerMille,
   *    compared CROSS-MULTIPLIED on the exact integer-grid sums
   *    (sum_new·n_base·1000 > sum_base·n_new·thr in DECIMAL(38,0) —
   *    no division enters the decision);
   *  - `retrain` = growth_alert OR drift_alert.
   *
   * Scale: cell assignment and d² are shuffle-free projections
   * against literals; ONE partial-aggregated groupBy per side on the
   * bounded cell key, then a broadcast join onto the literal cell
   * frame. Nothing corpus-sized crosses the driver; the audit's
   * cost is two corpus scans (one per side), each column-pruned to
   * the vector.
   *
   * Output: (cell, n_base, n_new, growth_ratio, growth_alert,
   * mean_d2_base, mean_d2_new, drift_alert, retrain), one row per
   * trained cell, ascending.
   */
  def ivfIngestAudit(
      existing: DataFrame, arriving: DataFrame,
      idCol: String, vecCol: String, seeds: Seq[Seq[Double]],
      growthAlertPerMille: Long,
      driftAlertPerMille: Long): DataFrame = {
    require(seeds.nonEmpty, "need at least one trained cell")
    require(growthAlertPerMille > 0L && driftAlertPerMille > 0L,
      "alert thresholds must be positive per-mille values")
    val spark = existing.sparkSession
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    def sideAgg(df: DataFrame, nOut: String, sOut: String) = {
      val v = toDoubleVec(col(vecCol))
      val d2All = array(seeds.map { s =>
        aggregate(
          zip_with(v, typedLit(s), (x, c) => (x - c) * (x - c)),
          lit(0.0), _ + _)
      }: _*)
      df.select(
          ivfCell(v, seeds).as("cell"),
          floor(element_at(d2All, ivfCell(v, seeds) + 1) *
            lit(1000000.0)).cast("long").as("__d2u"))
        .groupBy("cell")
        .agg(count(lit(1)).as(nOut),
          sum(col("__d2u")).cast(dec38).as(sOut))
    }
    val base = sideAgg(existing, "n_base", "__sb")
    val fresh = sideAgg(arriving, "n_new", "__sn")
    val cells = spark.range(seeds.size)
      .select(col("id").cast("int").as("cell"))
    val joined = cells
      .join(broadcast(base), Seq("cell"), "left")
      .join(broadcast(fresh), Seq("cell"), "left")
      .select(col("cell"),
        coalesce(col("n_base"), lit(0L)).as("n_base"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        coalesce(col("__sb"), lit(0).cast(dec38)).as("__sb"),
        coalesce(col("__sn"), lit(0).cast(dec38)).as("__sn"))
    joined.select(
      col("cell"), col("n_base"), col("n_new"),
      round(col("n_new").cast("double") /
        when(col("n_base") > 0L, col("n_base").cast("double")), 6)
        .as("growth_ratio"),
      (col("n_new") * lit(1000L) >
        col("n_base") * lit(growthAlertPerMille)).as("growth_alert"),
      round(col("__sb").cast("double") /
        when(col("n_base") > 0L, col("n_base").cast("double")) /
        lit(1000000.0), 6).as("mean_d2_base"),
      round(col("__sn").cast("double") /
        when(col("n_new") > 0L, col("n_new").cast("double")) /
        lit(1000000.0), 6).as("mean_d2_new"),
      (col("__sn") * col("n_base").cast(dec38) * lit(1000L) >
        col("__sb") * col("n_new").cast(dec38) *
          lit(driftAlertPerMille)).as("drift_alert"))
      .withColumn("retrain",
        col("growth_alert") || col("drift_alert"))
      .orderBy("cell")
  }

  /**
   * V34 (r14): SQ8 scale-calibration audit — the [[pqReconstructionError]]
   * counterpart for the scalar-quantized family (V29/V30/V32 serve
   * and sweep SQ8 but nothing AUDITS the scale choice): the
   * corpus-global r = 127/max|x| scale is OUTLIER-HOSTAGE — one huge
   * component shrinks every other component onto a handful of int8
   * levels — and the standard production fix clips the scale at a
   * high percentile, trading a bounded clipped fraction for a finer
   * step on the bulk. This audit prices that trade per candidate
   * clip level: the exact nearest-rank |component| percentile (the
   * q108/q183 integer-rank discipline on the floor(|x|·10⁶) grid),
   * the resulting scale, the clipped-component count/rate, and the
   * reconstruction MSE of encode→decode under that scale —
   * per-component squared error on the floor(d²·10⁶) grid summed in
   * exact DECIMAL(38,0) (the q321 d² discipline), so both engines
   * replay the whole table bit-identically.
   *
   * CLIP FLAG IS ON THE MICRO GRID (r14 ADVICE fix): a component
   * counts as clipped iff floor(|x|·10⁶) > vu, the same grid the
   * threshold itself lives on — comparing raw |x| against the
   * FLOORED percentile vu/10⁶ would count the max component itself
   * as clipped whenever max|x|·10⁶ is non-integral (verified on the
   * shipped sf0.1 embeddings: 1 false clip at 1000‰ under the raw
   * compare). On the grid, the 1000‰ row reads zero clipped by
   * construction. NOTE the audited scale is 127/(vu/10⁶), the
   * grid-floored threshold — at 1000‰ this is ≥ sq8Search's exact
   * 127/max|x| by at most one part in 10⁶·v; the grid is the audit's
   * stated resolution.
   *
   * Encode/decode replayed: q = clamp(⌊x·r + 0.5⌋, ±127), x̂ = q/r —
   * one IEEE multiply+floor and one division per component, both
   * fixed chains on identical doubles (q195 floor-grid rule; ties
   * measure-zero).
   *
   * Scale: one component explode feeds a distinct-|value| cumulative
   * table (bounded by the value domain — the q183 weighted-quantile
   * contract; the un-partitioned window rides the distinct-value
   * table, never the corpus), then one per-level scan computes clip
   * and error sums with partial aggregation. Levels are a literal
   * handful.
   *
   * Output: (clip_per_mille, v_abs, scale, n_components, n_clipped,
   * clip_rate, mse, mse_unclipped), ascending by clip_per_mille —
   * `mse` is the whole-corpus number (the clipped outliers' large
   * errors INCLUDED, so it prices what clipping destroys), while
   * `mse_unclipped` averages the surviving components only (the
   * finer step the clip BUYS for the bulk); the calibration read is
   * their joint movement, and at 1000‰ they coincide.
   *
   * DEGENERATE PATHS (r14 ADVICE fix, two distinguished cases): an
   * EMPTY corpus or an ALL-ZERO corpus (max grid unit 0) truly has
   * no scale — those emit a NULL scale/mse row per level. A
   * SUB-MICRO percentile over a non-zero corpus (vu = 0 but
   * max|x| > 0 — a low clip level on tiny-magnitude components) is
   * NOT scale-less: the threshold clamps UP to one grid unit
   * (vu = 1, the audit's stated 1e-6 resolution) and the row
   * computes normally with that conservative scale.
   */
  def sq8CalibrationAudit(
      corpus: DataFrame, idCol: String, vecCol: String,
      clipPerMilles: Seq[Int]): DataFrame = {
    require(clipPerMilles.nonEmpty, "need at least one clip level")
    require(clipPerMilles.forall(p => p >= 1 && p <= 1000),
      s"clip levels are per-mille in [1, 1000], got $clipPerMilles")
    require(clipPerMilles.distinct.size == clipPerMilles.size,
      "clip levels must be distinct")
    val spark = corpus.sparkSession
    import org.apache.spark.sql.expressions.Window
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    // Deliberately NOT barriered: materializing the exploded
    // component table would cache corpus×dims rows; each consumer is
    // one column-pruned scan of the source, and re-scanning beats
    // caching at any real corpus size.
    val comps = corpus
      .select(toDoubleVec(col(vecCol)).as("__v"))
      .select(explode(col("__v")).as("__x"))
    val u = floor(abs(col("__x")) * lit(1000000.0)).cast("long")
    val dist = comps.select(u.as("__u"))
      .groupBy("__u").agg(count(lit(1)).as("__c"))
    // bounded-domain cumulative frame (q183 contract)
    val wCum = Window.orderBy(col("__u"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = dist
      .withColumn("__cum", sum(col("__c")).over(wCum))
      .crossJoin(broadcast(
        dist.agg(coalesce(sum(col("__c")), lit(0L)).as("__n"))))
    val levels = clipPerMilles.sorted
    // max grid unit distinguishes an all-zero corpus (no scale
    // exists) from a sub-micro percentile (clamp up to the grid) —
    // one bounded single-row job (r14 ADVICE fix).
    val maxU = dist.agg(coalesce(max(col("__u")), lit(0L)))
      .collect()(0).getLong(0)
    // v_p = the k-th smallest |x| on the micro grid, k = ceil(p·n/1000)
    // in pure integer arithmetic (q220 div discipline)
    val thresholds = levels.map { p =>
      val vRow = cum
        .where(col("__cum") * lit(1000L) >=
          col("__n") * lit(p.toLong))
        .agg(min(col("__u")).as("__vu"),
          first(col("__n")).as("__n"))
        .collect()(0) // one bounded row per level
      val n = if (vRow.isNullAt(1)) 0L else vRow.getLong(1)
      val vu = if (vRow.isNullAt(0)) 0L else vRow.getLong(0)
      (p, vu, n)
    }
    val rows = thresholds.map { case (p, vu0, n) =>
      if (n == 0L || maxU == 0L) {
        // empty or all-zero corpus: no scale exists at any level
        import spark.implicits._
        Seq((p, vu0 / 1000000.0, Option.empty[Double], n, 0L,
          Option.empty[Double], Option.empty[Double],
          Option.empty[Double]))
          .toDF("clip_per_mille", "v_abs", "scale", "n_components",
            "n_clipped", "clip_rate", "mse", "mse_unclipped")
      } else {
        // sub-micro percentile clamps UP to the grid resolution
        val vu = math.max(vu0, 1L)
        val v = vu / 1000000.0
        val r = 127.0 / v
        val q = greatest(lit(-127L),
          least(lit(127L),
            floor(col("__x") * lit(r) + lit(0.5)).cast("long")))
        val xhat = q.cast("double") / lit(r)
        val d = col("__x") - xhat
        comps.select(
            (floor(abs(col("__x")) * lit(1000000.0)).cast("long")
              > lit(vu)).cast("long").as("__clip"),
            floor(d * d * lit(1000000.0)).cast("long").as("__e"))
          .agg(count(lit(1)).as("n_components"),
            sum(col("__clip")).as("n_clipped"),
            sum(col("__e").cast(dec)).as("__se"),
            sum(when(col("__clip") === 0L, col("__e"))
              .otherwise(0L).cast(dec)).as("__seu"))
          .select(
            lit(p).as("clip_per_mille"),
            lit(v).as("v_abs"),
            lit(r).as("scale"),
            col("n_components"), col("n_clipped"),
            round(col("n_clipped").cast("double") /
              when(col("n_components") > 0L,
                col("n_components").cast("double")), 6)
              .as("clip_rate"),
            round(col("__se").cast("double") /
              when(col("n_components") > 0L,
                col("n_components").cast("double")) /
              lit(1000000.0), 6).as("mse"),
            round(col("__seu").cast("double") /
              when(col("n_components") - col("n_clipped") > 0L,
                (col("n_components") - col("n_clipped"))
                  .cast("double")) /
              lit(1000000.0), 6).as("mse_unclipped"))
      }
    }
    rows.reduce(_.unionByName(_)).orderBy("clip_per_mille")
  }

  /**
   * V33 (r14): retrain readout — ACT on [[ivfIngestAudit]]'s signal
   * and PRICE the act, closing the detect→act loop the Q8→Q9 pair
   * models: the audit runs first (same thresholds, same exact
   * integer decisions); if ANY cell says retrain, the readout
   * serves the updated corpus (existing ∪ arriving) through BOTH
   * layouts — `seedsBefore` (the audited, drifted one) and
   * `seedsAfter` (the caller's retrain: [[trainCentroids]] on the
   * updated corpus, [[ivfSeeds]] re-seed, or an appended cell over
   * the drifted region — composition, the V30 rule) — and prices
   * each against ONE exact ground-truth pass. If no cell alerts,
   * only the `before` row emits: the retrain was not performed, and
   * the readout says so.
   *
   * Probes should represent CURRENT traffic (the arriving batch) —
   * drift hurts exactly those; pricing with stale probes hides the
   * loss the audit warned about.
   *
   * Execution: the audit's two scans, one exact ground-truth pass
   * (Barrier-routed, consumed by both phases — the q290 rule), one
   * corpus scan per phase (cell assignment against the literal
   * seeds, probe fan-out broadcast, per-probe top-k via the shared
   * [[rankTopK]] tie rule). The ONE driver scalar is the audit's
   * max(retrain) — a bounded contract like the louvain trace.
   *
   * Output: (phase, retrain_triggered, nlist, n_probes, exact_pairs,
   * hit_pairs, recall) — `before` always, `after` only when the
   * audit triggered; ordered by phase ('after' < 'before' keeps the
   * order total).
   */
  def ivfRetrainReadout(
      existing: DataFrame, arriving: DataFrame,
      idCol: String, vecCol: String,
      seedsBefore: Seq[Seq[Double]], seedsAfter: Seq[Seq[Double]],
      probes: DataFrame, nprobe: Int, k: Int,
      growthAlertPerMille: Long,
      driftAlertPerMille: Long): DataFrame = {
    require(nprobe >= 1 && nprobe <= seedsBefore.size &&
      nprobe <= seedsAfter.size,
      s"nprobe must be in [1, min(nlists)], got $nprobe vs " +
        s"${seedsBefore.size}/${seedsAfter.size}")
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = existing.sparkSession
    import org.apache.spark.sql.expressions.Window
    val audit = ivfIngestAudit(existing, arriving, idCol, vecCol,
      seedsBefore, growthAlertPerMille, driftAlertPerMille)
    val retrain = audit
      .agg(coalesce(max(col("retrain")), lit(false)))
      .collect()(0).getBoolean(0) // the one bounded driver scalar
    val full = existing.select(col(idCol), col(vecCol))
      .unionByName(arriving.select(col(idCol), col(vecCol)))
    val exact = Barrier.barrier(
      cosineTopK(full, probes, idCol, vecCol, k)
        .select(col("probe_id"), col("vec_id")))
    val exactTotals = exact.agg(
      count(lit(1)).as("exact_pairs"),
      countDistinct(col("probe_id")).as("n_probes"))
    def phaseRow(phase: String, seeds: Seq[Seq[Double]]): DataFrame = {
      val c = full.select(
        col(idCol).as("vec_id"), toDoubleVec(col(vecCol)).as("__v"))
        .withColumn("__cell", ivfCell(col("__v"), seeds))
        .withColumn("__vnorm", norm(col("__v")))
      val p = probes.select(
        col(idCol).as("probe_id"), toDoubleVec(col(vecCol)).as("__p"))
        .withColumn("__pnorm", norm(col("__p")))
        .select(col("probe_id"), col("__p"), col("__pnorm"),
          explode(transform(
            slice(sort_array(cellRanking(col("__p"), seeds)), 1,
              nprobe),
            s => s.getField("cell"))).as("__cell"))
      val w = Window.partitionBy("probe_id").orderBy(
        when(!isnan(col("__cos")), col("__cos")).desc_nulls_last,
        col("vec_id").asc)
      val approx = c.join(broadcast(p), Seq("__cell"))
        .where(col("vec_id") =!= col("probe_id"))
        .withColumn("__cos",
          dot(col("__v"), col("__p"))
            / (col("__vnorm") * col("__pnorm")))
        .withColumn("__rk", row_number().over(w))
        .where(col("__rk") <= k)
        .select(col("probe_id"), col("vec_id"))
      approx.join(exact, Seq("probe_id", "vec_id"), "left_semi")
        .agg(count(lit(1)).as("hit_pairs"))
        .crossJoin(exactTotals)
        .select(
          lit(phase).as("phase"),
          lit(retrain).as("retrain_triggered"),
          lit(seeds.size).as("nlist"),
          col("n_probes"), col("exact_pairs"), col("hit_pairs"),
          round(col("hit_pairs").cast("double")
            / when(col("exact_pairs") > 0L,
              col("exact_pairs").cast("double")), 6).as("recall"))
    }
    val before = phaseRow("before", seedsBefore)
    val out =
      if (retrain) before.unionByName(phaseRow("after", seedsAfter))
      else before
    out.orderBy("phase")
  }

  /**
   * Bucketed near-duplicate candidates: vectors sharing an SRP bucket
   * form (a < b) pairs scored with exact cosine; pairs at or above
   * `minCosine` survive.
   *
   * Output: (vec_a, vec_b, cosine).
   *
   * Scale: the self-join shuffles on the bucket key — O(n · 1) rows
   * each side — and the quadratic pair expansion is confined to
   * within-bucket groups (expected size n / 2^numPlanes). The
   * all-pairs cross join never happens.
   */
  def lshNearDup(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      numPlanes: Int,
      minCosine: Double): DataFrame = {
    val withBucket = corpus.select(
      col(idCol).as("id"),
      toDoubleVec(col(vecCol)).as("__v"),
      // coalesce: element_at is nullable, and a nullable join key gets
      // IsNotNull(<kernel>) inferred and pushed into the scan.
      coalesce(
        element_at(srpBucketsFast(col(vecCol), numPlanes, 1), 1),
        lit("")).as("__bucket"))
      .withColumn("__norm", norm(col("__v")))
    val a = withBucket.select(
      col("__bucket"), col("id").as("vec_a"),
      col("__v").as("__va"), col("__norm").as("__na"))
    val b = withBucket.select(
      col("__bucket"), col("id").as("vec_b"),
      col("__v").as("__vb"), col("__norm").as("__nb"))
    a.join(b, Seq("__bucket"))
      .where(col("vec_a") < col("vec_b"))
      .withColumn(
        "cosine",
        dot(col("__va"), col("__vb")) / (col("__na") * col("__nb")))
      // !isnan: zero-norm pairs produce NaN, and Spark orders NaN
      // above every number, so NaN >= threshold is TRUE.
      .where(col("cosine") >= minCosine && !isnan(col("cosine")))
      .select("vec_a", "vec_b", "cosine")
  }

  /**
   * Label-centroid similarity matrix: pairwise cosine between the
   * mean-pooled centroids of every label pair — the embedding-space
   * label-confusion audit (two labels whose centroids sit at cosine
   * ≈ 1 are candidates for merging; a classifier trained on them will
   * confuse them). Rows with NULL labels never contribute.
   *
   * Scale posture: the only corpus-sized work is ONE explode +
   * partial-combined aggregate down to |labels|·dims centroid rows
   * (map-side combine makes the exchange carry per-partition partial
   * sums, not the corpus). Everything after — norms, the d-keyed
   * pairwise join, the |labels|²/2 output — runs at centroid
   * cardinality, independent of corpus size, and AQE broadcasts it.
   * Centroids stay exploded as (label, d, c) rows end-to-end; the
   * pairwise dot is a join on d + one more partial aggregate, so no
   * array re-assembly or driver collect anywhere.
   */
  def centroidSimilarity(
      corpus: DataFrame, labelCol: String, vecCol: String): DataFrame = {
    val el = corpus
      .where(col(labelCol).isNotNull)
      .select(
        col(labelCol).as("label"),
        posexplode(toDoubleVec(col(vecCol))).as(Seq("d", "x")))
    val cen = el.groupBy("label", "d")
      .agg((sum(col("x")) / count(lit(1))).as("c"))
    val nrm = cen.groupBy("label")
      .agg(sqrt(sum(col("c") * col("c"))).as("n"))
    val dots = cen.as("a")
      .join(cen.as("b"),
        col("a.d") === col("b.d") && col("a.label") < col("b.label"))
      .groupBy(col("a.label").as("label_a"), col("b.label").as("label_b"))
      .agg(sum(col("a.c") * col("b.c")).as("dp"))
    dots
      .join(nrm.select(col("label").as("label_a"), col("n").as("n_a")),
        Seq("label_a"))
      .join(nrm.select(col("label").as("label_b"), col("n").as("n_b")),
        Seq("label_b"))
      .select(
        col("label_a"), col("label_b"),
        (col("dp") / (col("n_a") * col("n_b"))).as("cosine"))
  }

  /**
   * Simplified-silhouette label audit — per-vector clustering
   * quality against LABEL centroids (Rousseeuw's silhouette with
   * centroid distances standing in for mean pairwise distances —
   * the O(n·L) "simplified" form, never O(n²)): a = distance to the
   * own-label centroid, b = distance to the NEAREST other-label
   * centroid, s = (b − a)/max(a, b) ∈ [−1, 1]. s < 0 flags a vector
   * sitting closer to another label than its own — the per-example
   * "is this label wrong?" signal that [[centroidSimilarity]]'s
   * label-pair view can't localize.
   *
   * Determinism: distances are index-order Euclidean folds (q19
   * convention), the nearest-other pick breaks distance ties by
   * label (total order), s is SIGNED — the oracle carries the
   * `+ 0.0` normalization on its round(6). Degenerate a = b = 0
   * (vector equal to both centroids) yields NULL, never NaN.
   *
   * Scale: centroids are one explode + partial-combined aggregate
   * (|labels|·d rows — broadcastable); the distance join fans each
   * vector component out by |labels| — O(n·d·L) work with NO
   * corpus-sized shuffle beyond the (id, label, clabel) partial
   * aggregation; everything downstream is n·L rows.
   *
   * Output: (vec_id, label, a_dist, b_dist, b_label, silhouette),
   * ordered by id.
   */
  def silhouetteAudit(
      corpus: DataFrame, idCol: String, labelCol: String,
      vecCol: String): DataFrame = {
    val el = corpus
      .where(col(labelCol).isNotNull)
      .select(col(idCol).as("vec_id"), col(labelCol).as("label"),
        posexplode(toDoubleVec(col(vecCol))).as(Seq("d", "x")))
    val cen = el.groupBy(col("label").as("clabel"), col("d"))
      .agg((sum(col("x")) / count(lit(1))).as("c"))
    val dists = el.join(cen, Seq("d"))
      .groupBy(col("vec_id"), col("label"), col("clabel"))
      .agg(sqrt(sum((col("x") - col("c")) * (col("x") - col("c"))))
        .as("dist"))
    val own = dists.where(col("label") === col("clabel"))
      .select(col("vec_id"), col("label"), col("dist").as("__a"))
    val other = dists.where(col("label") =!= col("clabel"))
      .groupBy(col("vec_id"))
      .agg(min(struct(col("dist"), col("clabel"))).as("__m"))
      .select(col("vec_id"), col("__m.dist").as("__b"),
        col("__m.clabel").as("b_label"))
    own.join(other, Seq("vec_id"))
      .select(
        col("vec_id"), col("label"),
        round(col("__a"), 6).as("a_dist"),
        round(col("__b"), 6).as("b_dist"),
        col("b_label"),
        when(greatest(col("__a"), col("__b")) > 0,
          round((col("__b") - col("__a")) /
            greatest(col("__a"), col("__b")), 6)).as("silhouette"))
      .orderBy(col("vec_id"))
  }

  /**
   * Top-k principal components of the embedding distribution — the
   * dimensionality-reduction companion to [[embeddingMoments]]
   * (PCA-before-ANN / variance diagnostics). The EXACT floor-grid
   * covariance matrix reduces to d(d+1)/2 rows and collects to the
   * driver (d² doubles — the [[trainCentroids]] "only the matrix
   * round-trips" contract); eigenpairs come from deterministic
   * power iteration with Hotelling deflation: fixed iteration
   * count, fixed start (the axis of largest variance, ties by
   * lowest index), sign canonicalized (largest-|component| entry
   * positive, ties by lowest index) — reruns reproduce the exact
   * doubles. Returns (eigenvalue, component) pairs, eigenvalue
   * descending; k is capped at d.
   *
   * QUANTIZED arithmetic (round 9, the q195 oracle contract): the
   * iteration runs in exact decimals — covariance cells are the 6dp
   * decimals q167 pins, iterate vectors carry 12dp, each mat-vec
   * product rounds HALF_UP to 12dp before the (exact, order-free)
   * sum, and magnitude control multiplies by exact decimal powers of
   * ten (into [0.1, 1000) each step; down to ≤1 before the Rayleigh
   * quotient so its exact-decimal sums fit DECIMAL(38)). Doubles
   * appear only where IEEE ops are bit-deterministic on both engines
   * (the final λ division, sqrt, the per-element normalization, and
   * the deflation cells — which re-quantize to 6dp). That makes the
   * whole eigensolve REPLAYABLE IN SQL: the q195 oracle regenerates
   * every iteration as a DuckDB CTE chain and must match hash-exact.
   * The 12dp quantization perturbs each step by ≤5e-13 relative —
   * noise power iteration absorbs; accuracy loss vs the raw-double
   * solver is far below the 6dp output rounding. Width contract:
   * |cov| < 10⁴ and mat-vec rows < 10⁸ (any 6dp-rounded covariance
   * of data with per-dim variance < ~10³ satisfies both).
   *
   * Scale: the corpus is touched ONLY by embeddingMoments' one-pass
   * kernel aggregation; everything after is O(d²·iters) driver
   * arithmetic. Project with [[projectEmbeddings]] — components ship
   * back as literals, the IVF-centroid deployment shape.
   */
  def principalComponents(
      corpus: DataFrame, vecCol: String, k: Int,
      iters: Int = 50, scaleExp: Int = 6): Seq[(Double, Seq[Double])] = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    import java.math.{BigDecimal => JBD, RoundingMode}
    val rows = embeddingMoments(corpus, vecCol, scaleExp)
      .select("dim_i", "dim_j", "cov")
      .collect()
    require(rows.nonEmpty, "corpus has no vectors")
    val d = rows.iterator.map(_.getInt(1)).max + 1
    // A round(6) double is the nearest double to some 6dp decimal;
    // setScale(6) recovers exactly that decimal (no tie hazard).
    def dec6(v: Double): JBD =
      JBD.valueOf(v).setScale(6, RoundingMode.HALF_UP)
    def round12(v: JBD): JBD = v.setScale(12, RoundingMode.HALF_UP)
    val ZERO6 = JBD.ZERO.setScale(6)
    val c = Array.fill(d, d)(ZERO6)
    rows.foreach { r =>
      if (!r.isNullAt(2)) {
        val v = dec6(r.getDouble(2))
        c(r.getInt(0))(r.getInt(1)) = v
        c(r.getInt(1))(r.getInt(0)) = v
      }
    }
    val THOU = new JBD("1000")
    val TENTH = new JBD("0.1")
    // All magnitude multipliers share DECIMAL(4,3) scale — the same
    // literals the SQL replay uses.
    val DOWN3 = new JBD("0.001")
    val DOWN2 = new JBD("0.010")
    val DOWN1 = new JBD("0.100")
    val out = scala.collection.mutable.ArrayBuffer.empty[(Double, Seq[Double])]
    var comp = 0
    while (comp < math.min(k, d)) {
      // Deterministic start: axis of the largest remaining variance
      // (exact decimal compare, ties → lowest index).
      var start = 0
      var i = 1
      while (i < d) {
        if (c(i)(i).compareTo(c(start)(start)) > 0) start = i
        i += 1
      }
      var y: Array[JBD] = Array.tabulate(d)(i =>
        (if (i == start) JBD.ONE else JBD.ZERO).setScale(12))
      var it = 0
      while (it < iters) {
        // z_a = Σ_b round12(c_ab · y_b) — products exact, rounding
        // point fixed, sum exact (order-free by construction).
        val z = Array.tabulate(d) { a =>
          var s = JBD.ZERO
          var b = 0
          while (b < d) { s = s.add(round12(c(a)(b).multiply(y(b)))); b += 1 }
          s
        }
        val m = z.map(_.abs).reduceLeft((p, q) =>
          if (q.compareTo(p) > 0) q else p)
        y =
          if (m.signum == 0) y // flat matrix: keep current direction
          else if (m.compareTo(THOU) >= 0) z.map(v => round12(v.multiply(DOWN3)))
          else if (m.compareTo(TENTH) < 0) z.map(v => round12(v.multiply(THOU)))
          else z.map(round12)
        it += 1
      }
      // Downscale to max|y| ≤ 1 so the Rayleigh sums stay narrow.
      val mFin = y.map(_.abs).reduceLeft((p, q) =>
        if (q.compareTo(p) > 0) q else p)
      val down =
        if (mFin.compareTo(new JBD("100")) >= 0) DOWN3
        else if (mFin.compareTo(new JBD("10")) >= 0) DOWN2
        else if (mFin.compareTo(JBD.ONE) >= 0) DOWN1
        else JBD.ONE
      val y1 = y.map(v => round12(v.multiply(down)))
      // Rayleigh quotient λ = y₁ᵀCy₁ / y₁ᵀy₁ — both sums exact
      // decimal; the single division is one IEEE op.
      var num = JBD.ZERO
      var den = JBD.ZERO
      var a0 = 0
      while (a0 < d) {
        var b0 = 0
        while (b0 < d) {
          num = num.add(y1(a0).multiply(c(a0)(b0)).multiply(y1(b0)))
          b0 += 1
        }
        den = den.add(y1(a0).multiply(y1(a0)))
        a0 += 1
      }
      val lambda = num.doubleValue / den.doubleValue
      // Sign canonicalization: largest |y₁| entry positive (exact
      // compares, ties → lowest index).
      var big = 0
      var i2 = 1
      while (i2 < d) {
        if (y1(i2).abs.compareTo(y1(big).abs) > 0) big = i2
        i2 += 1
      }
      val sgn = if (y1(big).signum < 0) -1.0 else 1.0
      val nrm = math.sqrt(den.doubleValue)
      val signed = y1.map(q => q.doubleValue * sgn / nrm)
      out += ((lambda, signed.toSeq))
      // Hotelling deflation: C ← round6(C − λ v vᵀ) — fixed
      // double-op order (λ·v_a)·v_b, then re-quantize to 6dp.
      var a = 0
      while (a < d) {
        var b = 0
        while (b < d) {
          c(a)(b) = dec6(c(a)(b).doubleValue - lambda * signed(a) * signed(b))
          b += 1
        }
        a += 1
      }
      comp += 1
    }
    out.toSeq
  }

  /**
   * Project embeddings onto literal component axes (from
   * [[principalComponents]]): output keeps `idCol` plus `pc1..pcK`
   * coordinates. The components ride into the plan as literals — the
   * corpus is scanned once, zero shuffles, the IVF-centroid
   * deployment shape; dot products use the codegen'd
   * [[graft.functions.VecDot]] kernel.
   */
  def projectEmbeddings(
      corpus: DataFrame, idCol: String, vecCol: String,
      components: Seq[Seq[Double]]): DataFrame = {
    require(components.nonEmpty, "need at least one component")
    val v = toDoubleVec(col(vecCol))
    corpus.select(
      col(idCol) +:
      components.zipWithIndex.map { case (cvec, i) =>
        dot(v, typedLit(cvec)).as(s"pc${i + 1}")
      }: _*)
  }

  /**
   * PCA whitening: [[projectEmbeddings]] with each coordinate scaled
   * by 1/√eigenvalue, so the output coordinates are decorrelated
   * with ~unit variance — the standard preprocessing in front of
   * cosine bucketing / euclidean ANN when raw dimensions carry wildly
   * different scales. Takes [[principalComponents]]' output directly.
   * Components with eigenvalue ≤ `minEigenvalue` (collapsed
   * directions — dividing by ~0 would amplify noise unboundedly) are
   * DROPPED, and at least one component must survive. Same scale
   * shape as projection: literal matrix, one scan, zero shuffle.
   */
  def whitenEmbeddings(
      corpus: DataFrame, idCol: String, vecCol: String,
      eigenpairs: Seq[(Double, Seq[Double])],
      minEigenvalue: Double = 1e-12): DataFrame = {
    val kept = eigenpairs.filter(_._1 > minEigenvalue)
    require(kept.nonEmpty,
      s"no component has eigenvalue above $minEigenvalue")
    val scaled = kept.map { case (lambda, cvec) =>
      val inv = 1.0 / math.sqrt(lambda)
      cvec.map(_ * inv)
    }
    projectEmbeddings(corpus, idCol, vecCol, scaled)
  }

  /**
   * Exact embedding covariance / correlation matrix — the whitening
   * and PCA-preprocessing statistics the ANN / SemDeDup family
   * consumes (decorrelating dimensions before cosine bucketing, or
   * diagnosing collapsed / redundant embedding dimensions). One row
   * per unordered dimension pair `i <= j` (the diagonal carries the
   * per-dimension variances).
   *
   * Reproducibility contract (the [[graft.operators.Profile]]
   * correlations recipe, floor-grid variant): components quantize to
   * `floor(x · 10^scaleExp)` inside the codegen'd
   * [[graft.functions.PairMoments]] kernel — floor, not HALF_UP, so
   * no cross-engine rounding tie exists anywhere — and every
   * co-moment accumulates as exact integers (per-value products cast
   * DECIMAL(28,0), far above the long kernel range; the sum carries
   * DECIMAL(38,0) — associative, partition-order independent). Only
   * the closed-form
   * covariance/correlation finish runs in double, fixed op order:
   * the reported stats are EXACTLY those of the quantized series,
   * reproducible on any engine (the DuckDB oracle replays the
   * identical arithmetic).
   *
   * Scale: the d(d+3)/2 moment fan-out happens INSIDE the scan
   * projection and partial-aggregates map-side, so the one exchange
   * carries O(d² × partitions) rows at any corpus size — the
   * (vec_id)-join formulation would shuffle corpus × d component
   * rows instead. Assumes a UNIFORM dimensionality (the embedding-
   * column norm): each pair keeps its own n, but the closed-form
   * finish pairs co-moments with whole-corpus first moments, so
   * ragged vectors would bias the pairs they fall short of — filter
   * to one dimensionality upstream if the column is mixed.
   *
   * Vectors containing NULL components are EXCLUDED whole (the
 * kernel returns null rather than silently reading a null slot as
 * 0.0 — the oracle filters the same vectors); NULL vectors are
 * filtered upstream.
 *
 * Output: (dim_i, dim_j, n, cov, corr) — `cov` in original units
   * (quantization scale divided back out), `corr` scale-free, both
   * round(6); degenerate pairs (n < 2 or zero variance) yield NULLs.
   */
  def embeddingMoments(
      corpus: DataFrame, vecCol: String, scaleExp: Int = 6): DataFrame = {
    val moments = corpus
      .where(col(vecCol).isNotNull)
      .select(explode_outer(
        graft.functions.PairMoments(col(vecCol), scaleExp)).as("m"))
      .select(col("m.i").as("i"), col("m.j").as("j"), col("m.v").as("v"))
      .groupBy(col("i"), col("j"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("v").cast("decimal(28,0)")).as("s"))
    // Each pair row (i, j) needs four sibling sums: sx/sxx live on
    // rows (i,-1)/(i,i) — same LEFT dimension — and sy/syy on rows
    // (j,-1)/(j,j) — keyed by __k2 = the row's RIGHT-side dimension
    // (j for pairs, i for the first-moment rows). Two windows over
    // the d²-row moments table wire them up in ONE branch — the
    // self-join formulation re-planned the corpus subtree five times
    // (runtime exchange reuse hid the cost, but the single-scan
    // shape is provable statically; PlanSpec asserts it).
    val k2 = when(col("j") === lit(-1), col("i")).otherwise(col("j"))
    val wi = Window.partitionBy(col("i"))
    val wk = Window.partitionBy(col("__k2"))
    val unscale = math.pow(10.0, 2.0 * scaleExp)
    val enriched = moments
      .withColumn("__k2", k2)
      .withColumn("sx",
        max(when(col("j") === -1, col("s"))).over(wi).cast("double"))
      .withColumn("sxx",
        max(when(col("j") === col("i"), col("s"))).over(wi).cast("double"))
      .withColumn("sy",
        max(when(col("j") === -1, col("s"))).over(wk).cast("double"))
      .withColumn("syy",
        max(when(col("j") === col("i"), col("s"))).over(wk).cast("double"))
      .where(col("j") >= 0)
    val n = col("n").cast("double")
    val sxy = col("s").cast("double")
    val vx = n * col("sxx") - col("sx") * col("sx")
    val vy = n * col("syy") - col("sy") * col("sy")
    // `+ 0.0` after round(): IEEE addition maps -0.0 to +0.0, so a
    // co-moment that rounds to zero from below hashes identically to
    // the oracle's (which applies the same normalization) — without
    // it one signed-zero cell flips the whole-result digest.
    enriched.select(
      col("i").as("dim_i"), col("j").as("dim_j"), col("n"),
      when(col("n") >= 2,
        round((n * sxy - col("sx") * col("sy"))
          / (n * (n - lit(1.0))) / lit(unscale), 6) + lit(0.0)).as("cov"),
      when(col("n") >= 2 && vx > 0.0 && vy > 0.0,
        round((n * sxy - col("sx") * col("sy")) / sqrt(vx * vy), 6)
          + lit(0.0))
        .as("corr"))
  }

  /** Min-L2 code assignment against one subspace codebook: argmin of
    * ‖v − c‖² = argmin(‖c‖² − 2·v·c) since ‖v‖² is constant per row
    * (ties → lowest code). Pure per-row projection vs literals. */
  private def pqCode(subVec: Column, codebook: Seq[Seq[Double]]): Column =
    element_at(
      sort_array(array(codebook.zipWithIndex.map { case (c, i) =>
        struct(
          (lit(c.map(x => x * x).sum) - lit(2.0) * dot(subVec, typedLit(c)))
            .as("d"),
          lit(i).as("code"))
      }: _*)), 1).getField("code")

  /**
   * Train product-quantization codebooks: the vector space splits
   * into `m` contiguous subspaces of dims/m components, and each
   * subspace gets its own k-centroid codebook via the deterministic
   * distributed Lloyd's in [[trainCentroids]] (hash-bounded training
   * slice, farthest-point seeding — reruns reproduce exactly).
   *
   * m sequential trainings; train on a SAMPLE via `maxTrainRows` —
   * the codebook is a model, not a corpus statistic. Returns
   * codebooks(s)(c) = the c-th centroid of subspace s.
   *
   * `tol`/`seedPoolSize` pass straight through to [[trainCentroids]]
   * (round 10): tol = 0 + pool ⊇ corpus puts each subspace's Lloyd's
   * in the oracle-replayable regime the q200/q260 gates pin (floor-
   * grid means, value-irrelevant pool order, iteration-idempotent
   * convergence) — defaults keep the production sampling behavior.
   */
  def trainPqCodebooks(
      corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, k: Int, maxIter: Int = 10,
      maxTrainRows: Long = 256L * 1024,
      tol: Double = 1e-9, seedPoolSize: Int = 0): Seq[Seq[Seq[Double]]] = {
    require(m >= 1 && k >= 2, s"need m >= 1 and k >= 2, got ($m, $k)")
    val first = ivfSeeds(corpus, idCol, vecCol, 1)
    require(first.nonEmpty, "corpus has no vectors to train on")
    val dims = first.head.length
    require(dims % m == 0, s"dims $dims must divide into m=$m subspaces")
    val sub = dims / m
    (0 until m).map { s =>
      val sliced = corpus.select(
        col(idCol),
        slice(toDoubleVec(col(vecCol)), s * sub + 1, sub).as("__sub"))
      trainCentroids(sliced, idCol, "__sub", k, maxIter, tol = tol,
        maxTrainRows = maxTrainRows, seedPoolSize = seedPoolSize)
    }
  }

  /**
   * Product-quantization encoding: each vector compresses to `m`
   * small codes (one byte each at k ≤ 256) — a 4-byte-float d-dim
   * vector becomes m bytes, the 32×-compression regime int8 can't
   * reach (4d → m bytes vs 4d → d). Assignment is min-L2 per
   * subspace against the literal codebooks: pure scan projection,
   * zero shuffle at any corpus size (the IVF-centroid deployment
   * shape).
   */
  def pqEncode(
      corpus: DataFrame, idCol: String, vecCol: String,
      codebooks: Seq[Seq[Seq[Double]]]): DataFrame = {
    val m = codebooks.size
    val sub = codebooks.head.head.size
    corpus
      // ragged rows drop, mirroring trainCentroids' dims filter: a
      // short vector's sub-slice would make VecDot yield NULL, which
      // sorts FIRST in the argmin — every ragged row would silently
      // encode as code 0 and poison downstream ADC rankings
      .where(size(col(vecCol)) === m * sub)
      .select(
        col(idCol),
        array((0 until m).map { s =>
          pqCode(
            slice(toDoubleVec(col(vecCol)), s * sub + 1, sub),
            codebooks(s)).cast("int")
        }: _*).as("codes"))
  }

  /**
   * V27: PQ reconstruction-error audit — per-subspace quantization
   * quality, the number that DECIDES the (m, k) point before a
   * codebook serves traffic (FAISS reports exactly this): for every
   * vector and subspace, the squared L2 distance to its NEAREST
   * codeword (the same min-L2 rule [[pqEncode]] assigns by), reduced
   * to per-subspace count / mean / max. A subspace whose MSE dwarfs
   * the others needs more centroids or a different split; rising MSE
   * on fresh data is the re-train trigger (pairs with V25's drift
   * report).
   *
   * ENGINE-EXACT (r12, ADVICE fix): components quantize onto the
   * micro grid FIRST — q_j = floor(v_j·10⁶), codewords likewise —
   * and the error is the exact INTEGER quadratic form
   * max(0, Σq_j² + min_c(Σc_j² − 2·Σq_j·c_j)) in µ² units (10⁻¹²).
   * Every product ≤ 10¹² and every per-row partial sum ≤ dims·10¹²
   * ≪ 2⁵³, so the double-typed arithmetic is EXACT integer math —
   * NO summation-order exposure on either engine (an earlier
   * formulation floored a raw-double expression, where a DuckDB
   * unordered SUM could differ by an ulp at a grid boundary). The
   * corpus reduce sums the long grid values in DECIMAL(38,0); mse
   * finishes with two fixed IEEE divisions, round(6), non-negative.
   *
   * Scale: pure scan projection (codebooks are literals) + ONE
   * m-fanout explode + one partial-aggregated m-row reduce; no
   * joins, no windows. Mass bound: per-row err ≤ dims·10¹² in µ²
   * units; the DECIMAL(38,0) reduce never overflows.
   *
   * Output: (subspace, n_vectors, mse, max_err2), subspace
   * ascending.
   */
  def pqReconstructionError(
      corpus: DataFrame, idCol: String, vecCol: String,
      codebooks: Seq[Seq[Seq[Double]]]): DataFrame = {
    require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
      "codebooks must be non-empty per subspace")
    val m = codebooks.size
    val sub = codebooks.head.head.size
    val errCols = (0 until m).map { s =>
      // micro-quantized subvector: exact integer values in doubles
      val sv = transform(
        slice(toDoubleVec(col(vecCol)), s * sub + 1, sub),
        x => floor(x * lit(1000000.0d)).cast("double"))
      val dmin = element_at(
        sort_array(array(codebooks(s).zipWithIndex.map { case (c, i) =>
          val qc = c.map(x => math.floor(x * 1e6))
          struct(
            (lit(qc.map(x => x * x).sum)
              - lit(2.0) * dot(sv, typedLit(qc))).as("d"),
            lit(i).as("code"))
        }: _*)), 1).getField("d")
      greatest(dot(sv, sv) + dmin, lit(0.0)).cast("long")
        .as(s"__e$s")
    }
    corpus
      .where(size(col(vecCol)) === m * sub)
      .select(errCols: _*)
      .select(posexplode(array((0 until m).map(s => col(s"__e$s")): _*))
        .as(Seq("subspace", "__q")))
      .groupBy("subspace")
      .agg(
        count(lit(1)).as("n_vectors"),
        round(sum(col("__q").cast(
            org.apache.spark.sql.types.DecimalType(38, 0)))
          .cast("double")
          / count(lit(1)).cast("double") / lit(1.0e12d), 6)
          .as("mse"),
        round(max(col("__q")).cast("double") / lit(1.0e12d), 6)
          .as("max_err2"))
      .orderBy("subspace")
  }

  /**
   * Asymmetric-distance (ADC) top-k over PQ codes: each probe keeps
   * its EXACT vector; per probe a (m × k) table of subspace L2²
   * distances to every centroid is computed ONCE driver-side and
   * broadcast, so scoring a corpus row is m table lookups — the ADC
   * trick that makes PQ search cheap (m adds/row instead of d
   * multiply-adds). Ranking rides the family's bounded
   * WindowGroupLimit shape (dist asc, id tiebreak).
   *
   * Output: (probe_id, vec_id, rank, adc_dist) — adc_dist is the
   * ADC approximation of ‖probe − vec‖²; audit recall against
   * [[cosineTopK]] (or exact L2) before deploying, exactly like the
   * IVF and truncation audits.
   *
   * Determinism contract (round 9, the q199 gate): the per-probe
   * table entries quantize HALF_UP to 6dp and the m-lookup score
   * sums in exact DECIMAL(18,6) — vectors sharing the same codes get
   * EXACTLY equal scores, so the (score, id) rank tie-break is
   * engine-independent (a raw double fold gives ulp-different sums
   * for identical lookups under different fold orders, silently
   * shuffling equal-code neighbors). ADC is a ≥1e-2-scale
   * approximation; 6dp quantization is far inside its noise floor.
   */
  def pqAdcTopK(
      encoded: DataFrame, idCol: String, codesCol: String,
      codebooks: Seq[Seq[Seq[Double]]],
      probes: Seq[(Long, Seq[Double])], k: Int): DataFrame = {
    require(probes.nonEmpty, "need at least one probe")
    val m = codebooks.size
    val kCb = codebooks.head.size
    val sub = codebooks.head.head.size
    val probeRows = probes.map { case (pid, v) =>
      require(v.size == m * sub,
        s"probe $pid has ${v.size} dims, codebooks cover ${m * sub}")
      val flat = for (s <- 0 until m; c <- 0 until kCb) yield {
        val cent = codebooks(s)(c)
        var d2 = 0.0
        var j = 0
        while (j < sub) {
          val diff = v(s * sub + j) - cent(j)
          d2 += diff * diff
          j += 1
        }
        java.math.BigDecimal.valueOf(d2)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
      }
      (pid, flat)
    }
    val spark = encoded.sparkSession
    import spark.implicits._
    val dec6 = org.apache.spark.sql.types.DecimalType(18, 6)
    val probeDf = probeRows.toDF("probe_id", "__tab")
    // Each lookup is the nearest double of a 6dp decimal — the cast
    // recovers that decimal exactly; the sum is then exact.
    val adc = (0 until m)
      .map(s => element_at(col("__tab"),
        lit(s * kCb) + element_at(col(codesCol), s + 1) + lit(1)).cast(dec6))
      .reduce(_ + _)
    val w = Window.partitionBy("probe_id")
      .orderBy(col("__adc").asc, col(idCol).asc)
    encoded
      .crossJoin(broadcast(probeDf))
      .withColumn("__adc", adc)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("probe_id"), col(idCol).as("vec_id"), col("rank"),
        col("__adc").cast("double").as("adc_dist"))
  }

  /**
   * Semantic benchmark-leakage scan — the EMBEDDING arm of
   * decontamination (the T17 exact/bloom n-gram decontaminators
   * catch verbatim and near-verbatim test-set copies; paraphrased
   * leakage needs similarity): every corpus vector scores against
   * the full benchmark set and reports its nearest benchmark
   * neighbor, the cosine, and the over-threshold flag. What ships to
   * reviewers before a model trains on the corpus.
   *
   * Contract: the benchmark set is BOUNDED (an eval set — thousands,
   * not a corpus) and collects to the driver as a literal matrix,
   * exactly the V4 IVF-centroid deployment shape — so the scan is
   * ONE pass, zero shuffle, |bench| fused dot products per row
   * inside codegen. The corpus side streams at any size. The leaked
   * verdict compares the 6dp-ROUNDED cosine (both engines hold that
   * decimal), keeping the boundary engine-exact.
   *
   * Output: (vec_id, bench_id, cosine, leaked) — nearest benchmark
   * by (cosine desc, bench id asc).
   */
  def semanticLeakage(
      corpus: DataFrame, bench: DataFrame,
      idCol: String, vecCol: String, minCosine: Double): DataFrame = {
    val entries = bench
      .select(col(idCol), toDoubleVec(col(vecCol)))
      .orderBy(col(idCol)).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
    require(entries.nonEmpty, "benchmark set is empty")
    val ranking = array(entries.map { case (bid, bv) =>
      struct(
        (-(dot(col("__v"), typedLit(bv)) /
          (col("__vn") * lit(math.sqrt(bv.map(x => x * x).sum)))))
          .as("neg"),
        lit(bid).as("bid"))
    }: _*)
    corpus
      .select(col(idCol).as("vec_id"),
        toDoubleVec(col(vecCol)).as("__v"))
      .withColumn("__vn", norm(col("__v")))
      .withColumn("__best", element_at(sort_array(ranking), 1))
      .select(
        col("vec_id"),
        col("__best.bid").as("bench_id"),
        round(-col("__best.neg"), 6).as("cosine"))
      .withColumn("leaked", col("cosine") >= lit(minCosine))
  }

  /**
   * Binary sign quantization: each vector compresses to d SIGN BITS
   * packed into ⌈d/32⌉ longs (32 bits per word — both engines' shift
   * arithmetic stays in positive-BIGINT territory, no sign-bit
   * traps). The most aggressive embedding compression that still
   * retrieves (Hamming distance on sign bits ≈ 1−cos angle for
   * mean-centered vectors): a 64-dim float vector becomes 8 bytes —
   * 32× — and candidate scoring becomes XOR+popcount, the cheapest
   * per-candidate op of the whole V-family (cheaper than PQ's m
   * lookups). The standard first-pass filter in front of an exact or
   * ADC reranker.
   *
   * Bit rule: component ≥ 0 sets the bit (−0.0 ≥ 0 is TRUE on both
   * engines). Pure scan projection, zero shuffle; EXACT integer
   * output — quantization, distances, and ranks replay bit-for-bit
   * in any engine with shifts and popcount, no float anywhere.
   */
  def signQuantize(
      df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(
      col(idCol),
      expr(s"""transform(
        sequence(0, (size($vecCol) + 31) div 32 - 1), w ->
          aggregate(sequence(0, 31), 0L, (acc, i) ->
            acc + CASE WHEN w * 32 + i < size($vecCol)
                        AND element_at($vecCol,
                          CAST(w * 32 + i + 1 AS INT)) >= 0
                  THEN shiftleft(1L, CAST(i AS INT)) ELSE 0L END))""")
        .as("words"))

  /** Driver-side twin of [[signQuantize]]'s bit rule, for probe
    * vectors. */
  def signWords(v: Seq[Double]): Seq[Long] =
    v.grouped(32).map { grp =>
      grp.zipWithIndex.foldLeft(0L) { case (acc, (x, i)) =>
        if (x >= 0) acc + (1L << i) else acc
      }
    }.toSeq

  /**
   * Hamming top-k over sign-quantized codes: per (probe, candidate)
   * the distance is Σ_w popcount(words_w XOR probeWords_w) — pure
   * integer, so scores, ties, and ranks are engine-exact with NO
   * determinism scaffolding at all (the only V-family scorer with
   * that property). Probes broadcast; ranking rides the family's
   * bounded (distance asc, id asc) window shape. Corpus-member
   * probes surface themselves at rank 1 / distance 0 — the encode
   * sanity check; filter downstream if unwanted.
   *
   * Output: (probe_id, vec_id, rank, hamming).
   */
  def hammingTopK(
      encoded: DataFrame, idCol: String, wordsCol: String,
      probes: Seq[(Long, Seq[Long])], k: Int): DataFrame = {
    require(probes.nonEmpty, "need at least one probe")
    val spark = encoded.sparkSession
    import spark.implicits._
    val probeDf = probes.toDF("probe_id", "__pw")
    val ham = expr(s"""aggregate(
      zip_with($wordsCol, __pw, (a, b) -> CAST(bit_count(a ^ b) AS BIGINT)),
      0L, (acc, x) -> acc + x)""")
    val w = Window.partitionBy("probe_id")
      .orderBy(col("__ham").asc, col(idCol).asc)
    encoded
      .crossJoin(broadcast(probeDf))
      .withColumn("__ham", ham)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("probe_id"), col(idCol).as("vec_id"), col("rank"),
        col("__ham").as("hamming"))
  }

  /**
   * IVF + PQ composed search — the PRODUCTION ANN shape (the
   * FAISS `IVFx,PQy` index family): corpus rows live in coarse
   * Voronoi cells (IVF) and store only m-byte PQ codes; a probe
   * visits its `nprobe` closest cells and ADC-scores just those
   * candidates. The two dials compose multiplicatively — cell
   * routing cuts the scanned fraction to ~nprobe/nlist, PQ cuts the
   * per-candidate cost to m table lookups — which is why this
   * composition (not flat IVF or flat PQ) is what serves
   * billion-vector indexes.
   *
   * Pipeline per call: encode = ONE corpus scan projecting cell id
   * ([[ivfCell]]) + codes ([[pqEncode]]'s argmin, fused here so cell
   * and codes ride the same pass); probes compute their cell ranking
   * and (m×k) ADC tables DRIVER-side (replicating [[cellRanking]]'s
   * exact IEEE arithmetic) and broadcast probes × nprobe rows; the
   * candidate join hashes on the cell key only. Scoring follows
   * [[pqAdcTopK]]'s determinism contract: 6dp-quantized table
   * entries summed in exact DECIMAL(18,6), so equal-code candidates
   * tie exactly and (score, id) ranking is engine-independent.
   *
   * Like [[pqAdcTopK]], probes that are corpus members are NOT
   * self-excluded — their own row scores at quantization error and
   * surfaces as rank 1, which is itself a useful encode sanity
   * check; filter `probe_id =!= vec_id` downstream if unwanted.
   *
   * Output: (probe_id, cell, vec_id, rank, adc_dist).
   */
  def ivfPqSearch(
      corpus: DataFrame, idCol: String, vecCol: String,
      seeds: Seq[Seq[Double]], codebooks: Seq[Seq[Seq[Double]]],
      probes: Seq[(Long, Seq[Double])], nprobe: Int, k: Int): DataFrame = {
    require(probes.nonEmpty, "need at least one probe")
    require(nprobe >= 1 && nprobe <= seeds.size,
      s"nprobe must be in [1, ${seeds.size}], got $nprobe")
    val m = codebooks.size
    val kCb = codebooks.head.size
    val sub = codebooks.head.head.size
    val enc = corpus
      .where(size(col(vecCol)) === m * sub)
      .select(
        col(idCol),
        ivfCell(col(vecCol), seeds).as("__cell"),
        array((0 until m).map { s =>
          pqCode(
            slice(toDoubleVec(col(vecCol)), s * sub + 1, sub),
            codebooks(s)).cast("int")
        }: _*).as("__codes"))
    // Driver-side probe routing: exactly cellRanking's arithmetic —
    // index-order IEEE dot, -(v·s/|s|) with the same sqrt — so a
    // probe routes to the SAME cells it would as a corpus row.
    val probeRows = probes.flatMap { case (pid, v) =>
      require(v.size == m * sub,
        s"probe $pid has ${v.size} dims, codebooks cover ${m * sub}")
      val cells = seeds.zipWithIndex.map { case (s, i) =>
        var dp = 0.0
        var j = 0
        while (j < v.size) { dp += v(j) * s(j); j += 1 }
        (-(dp / math.sqrt(s.map(x => x * x).sum)), i)
      }.sorted.take(nprobe).map(_._2)
      val flat = for (s <- 0 until m; c <- 0 until kCb) yield {
        val cent = codebooks(s)(c)
        var d2 = 0.0
        var j = 0
        while (j < sub) {
          val diff = v(s * sub + j) - cent(j)
          d2 += diff * diff
          j += 1
        }
        java.math.BigDecimal.valueOf(d2)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
      }
      cells.map(c => (pid, c, flat))
    }
    val spark = corpus.sparkSession
    import spark.implicits._
    val dec6 = org.apache.spark.sql.types.DecimalType(18, 6)
    val probeDf = probeRows.toDF("probe_id", "__cell", "__tab")
    val adc = (0 until m)
      .map(s => element_at(col("__tab"),
        lit(s * kCb) + element_at(col("__codes"), s + 1) + lit(1))
        .cast(dec6))
      .reduce(_ + _)
    val w = Window.partitionBy("probe_id")
      .orderBy(col("__adc").asc, col(idCol).asc)
    enc.join(broadcast(probeDf), Seq("__cell"))
      .withColumn("__adc", adc)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("probe_id"), col("__cell").as("cell"),
        col(idCol).as("vec_id"), col("rank"),
        col("__adc").cast("double").as("adc_dist"))
  }

  /**
   * Dimension-truncation recall audit (Matryoshka-representation
   * deployment check): how much of the exact cosine top-k survives
   * when vectors are truncated to their first `dims` components —
   * the standard question before switching ANN serving to a
   * truncated-prefix index (smaller memory/IO per vector, same
   * index shape). For each probe: recall@k = |topk(truncated) ∩
   * topk(full)| / k.
   *
   * Both rankings run through [[cosineTopK]] — the SAME bounded
   * WindowGroupLimit shuffle shape and the same total tie rule — so
   * the audit's cost is two corpus scans with O(partitions × probes
   * × k) shuffle rows each, corpus-size-independent, and the
   * intersection join touches only probes × k rows per side. If the
   * truncated recall is acceptable, deploy the truncation INSIDE the
   * IVF/SRP pipeline by slicing the vector column before bucketing
   * — this audit is the measurement that licenses it.
   *
   * CAVEAT: `dims` at or above the vectors' true dimensionality
   * makes the "truncated" ranking identical to the full one — the
   * audit passes VACUOUSLY with recall 1.0. The function cannot see
   * the vector length statically; callers must pass dims < d.
   */
  def dimTruncationRecall(
      corpus: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, k: Int, dims: Int): DataFrame = {
    require(dims > 0, s"dims must be positive, got $dims")
    def truncate(df: DataFrame) =
      df.withColumn(vecCol, slice(col(vecCol), 1, dims))
    val full = cosineTopK(corpus, probes, idCol, vecCol, k)
      .select(col("probe_id"), col("vec_id"))
    val trunc = cosineTopK(truncate(corpus), truncate(probes), idCol, vecCol, k)
      .select(col("probe_id"), col("vec_id"), lit(1).as("__hit"))
    full
      .join(trunc, Seq("probe_id", "vec_id"), "left")
      .groupBy("probe_id")
      .agg(count(col("__hit")).as("__hits"))
      .select(
        col("probe_id"),
        col("__hits").cast("int").as("hits"),
        round(col("__hits").cast("double") / lit(k.toDouble), 6).as("recall"))
  }

  /**
   * V23: embedding-space isotropy / norm report — the ONE-ROW health
   * check run before trusting cosine retrieval over an index:
   * anisotropic embedding spaces (all vectors sharing a large common
   * direction — the well-documented pathology of LM last layers)
   * compress cosine ranges and break IVF cell balance. Reported:
   * vector/dim counts, mean norm and norm coefficient-of-variation
   * (norm spread breaks dot-for-cosine shortcuts), the corpus
   * centroid's norm, and `centroid_share` = ‖μ‖²/E‖x‖² ∈ [0,1] — the
   * fraction of average vector energy living in the common mean
   * direction (0 = centered; large = rank-one dominated, subtract
   * the mean before indexing).
   *
   * Float parity: per-vector norm² is the codegen'd index-order
   * [[dot]] fold (the q19 VecDot convention — deterministic within a
   * row); cross-row means of norms/norm² stage round(12) into
   * DECIMAL(38,12) (q155 discipline); the per-dim centroid uses the
   * raw SUM(x)/n q44-precedent fold with the round(6) boundary.
   * All outputs non-negative.
   *
   * Scale: one element explode for the centroid (partial-aggregated
   * per dim — the only corpus-sized shuffle is d·partitions), one
   * per-row kernel pass for norms, one-row cross joins to stitch.
   */
  def isotropyReport(
      df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 12)
    val base = df.where(col(vecCol).isNotNull && size(col(vecCol)) > 0)
    val perVec = base.select(
      col(idCol), dot(col(vecCol), col(vecCol)).as("__n2"))
    val normStats = perVec.agg(
      count(lit(1)).as("n_vecs"),
      sum(round(sqrt(col("__n2")), 12).cast(dec)).as("__sn"),
      sum(round(col("__n2"), 12).cast(dec)).as("__sn2"))
    val cen = base
      .select(posexplode(col(vecCol)).as(Seq("__d", "__xf")))
      .select(col("__d"), col("__xf").cast("double").as("__x"))
      .groupBy("__d")
      .agg((sum(col("__x")) / count(lit(1))).as("__c"))
    val cenAgg = cen.agg(
      count(lit(1)).as("dims"),
      sum(col("__c") * col("__c")).as("__cn2"))
    val nD = col("n_vecs").cast("double")
    val meanNorm = col("__sn").cast("double") / nD
    val meanSq = col("__sn2").cast("double") / nD
    val varNorm = meanSq - meanNorm * meanNorm
    normStats.crossJoin(cenAgg).select(
      col("n_vecs"), col("dims").cast("int").as("dims"),
      round(meanNorm, 6).as("mean_norm"),
      when(meanNorm > 0,
        round(sqrt(greatest(varNorm, lit(0.0))) / meanNorm, 6))
        .as("norm_cv"),
      round(sqrt(col("__cn2")), 6).as("centroid_norm"),
      when(meanSq > 0, round(col("__cn2") / meanSq, 6))
        .as("centroid_share"))
  }

  /**
   * V24: the ±1 sign matrix behind [[randomProject]], derived from a
   * splitmix64 mix of (seed, output dim, input dim) — a DATA-FREE
   * deterministic function, so the projection needs no training pass
   * and any engine (or the DuckDB oracle) regenerates the identical
   * matrix from three integers. Returned as dOut rows × dIn signs.
   */
  def projectionSigns(seed: Long, dIn: Int, dOut: Int): Seq[Seq[Int]] = {
    def mix64(z0: Long): Long = {
      var z = z0 + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    Seq.tabulate(dOut) { j =>
      Seq.tabulate(dIn) { i =>
        if ((mix64(seed * 0x100000001B3L + j.toLong * dIn + i) & 1L) == 0L)
          1 else -1
      }
    }
  }

  /**
   * V24: data-independent random projection (Achlioptas 2003 "DB-
   * friendly random projections": a dense ±1 sign matrix satisfies
   * the Johnson–Lindenstrauss lemma with the same distortion bounds
   * as Gaussian projections) — the dimensionality reducer for the
   * regime where [[principalComponents]] is wrong: PCA needs a
   * training pass over the corpus and re-training drifts as data
   * grows, while a JL projection is a pure function of (seed, dims) —
   * at 100 TB that means zero extra scans, bit-stable output across
   * incremental ingests, and the same matrix on every cluster.
   * y = S·x / √dOut, preserving pairwise distances within
   * 1±ε for dOut = O(ln n / ε²) — the standard pre-step shrinking
   * embeddings before ANN indexing or near-dup clustering.
   *
   * ENGINE-EXACT: inputs quantize once to micro-unit longs
   * (floor(x·10⁶) — the q200 grid, zero rounding-rule hazard), each
   * output coordinate is an exact ±-signed long sum, and the only
   * float work is the fixed IEEE finish (/10⁶, /√dOut) followed by a
   * floor back onto the 6dp grid. Signed values — floor, not round,
   * so no half-tie hazard exists at all. Mass bound (ANSI throws):
   * Σ|x|·10⁶ per vector < 2⁶³.
   *
   * Scale: one posexplode melt (n·dIn rows) + one broadcast join on
   * the dIn·dOut-row sign matrix + one (id, outDim) partial-agg
   * shuffle + one per-id reassembly — no training, no self-joins,
   * no driver state beyond the literal matrix. Vectors not exactly
   * `dIn` long (or NULL) are dropped — same contract as the PCA path.
   *
   * Output: (id, proj ARRAY<DOUBLE> of length dOut) with coordinates
   * on the 6dp floor grid.
   */
  def randomProject(
      df: DataFrame, idCol: String, vecCol: String,
      dIn: Int, dOut: Int, seed: Long = 42L): DataFrame = {
    require(dIn >= 1, s"dIn must be >= 1, got $dIn")
    require(dOut >= 1, s"dOut must be >= 1, got $dOut")
    val spark = df.sparkSession
    val signs = projectionSigns(seed, dIn, dOut)
    val matrix = broadcast(spark.createDataFrame(
      for (j <- 0 until dOut; i <- 0 until dIn)
        yield (i, j, signs(j)(i).toLong)
    ).toDF("__i", "__j", "__s"))
    val invScale = 1.0 / math.sqrt(dOut.toDouble)
    df.select(col(idCol).as("id"), col(vecCol).as("__v"))
      .where(col("__v").isNotNull && size(col("__v")) === dIn &&
        expr("size(filter(__v, x -> x IS NULL))") === 0)
      .select(col("id"), posexplode(col("__v")).as(Seq("__i", "__x")))
      .withColumn("__q", floor(col("__x").cast("double") * lit(1000000.0d)))
      .join(matrix, "__i")
      .groupBy("id", "__j")
      .agg(sum(col("__q") * col("__s")).as("__acc"))
      .select(col("id"), col("__j"),
        (floor(col("__acc").cast("double") / lit(1000000.0d)
          * lit(invScale) * lit(1000000.0d)).cast("double")
          / lit(1000000.0d)).as("__y"))
      .groupBy("id")
      .agg(expr(
        "transform(sort_array(collect_list(struct(__j, __y)))," +
          " s -> s.__y)").as("proj"))
  }

  /**
   * V25: embedding snapshot drift report — the re-index trigger for
   * a served ANN corpus: when the encoder is fine-tuned, the corpus
   * mix shifts, or a new ingest wave lands, the question is "did the
   * embedding space MOVE enough that the old IVF centroids / PQ
   * codebooks / calibration thresholds are stale?" Compares the two
   * snapshots' MEAN vectors (the cheapest sufficient statistic for
   * global translation/rotation drift — per-pair distances would be
   * quadratic): cosine between the two means (direction drift — the
   * common-direction pathology moving), L2 distance between them
   * (translation), and each mean's norm (anisotropy growth; pair
   * with V23's single-snapshot isotropy report).
   *
   * ENGINE-EXACT: per-dim means on the q200 micro-unit floor grid
   * (exact long sums, the fixed two-division finish), cross-dim
   * products round(12) → DECIMAL(38,12) sums (the q155 discipline),
   * fixed IEEE finishes; cosine signed (+0.0 oracle-side), norms and
   * L2 non-negative. Degenerate all-zero means → NULL cosine.
   *
   * Scale: one melt + one (snap, dim) partial-agg shuffle — the
   * corpus is touched once; everything after is O(d) on a
   * localCheckpoint'd 2d-row frame. Output: ONE row.
   */
  def embeddingDrift(
      df: DataFrame, vecCol: String, snapACol: Column,
      dims: Int): DataFrame = {
    require(dims >= 1, s"dims must be >= 1, got $dims")
    val means = df
      .select(snapACol.as("__a"), col(vecCol).as("__v"))
      .where(col("__v").isNotNull && size(col("__v")) === dims &&
        expr("size(filter(__v, x -> x IS NULL))") === 0)
      .select(col("__a"), posexplode(col("__v")).as(Seq("__i", "__x")))
      .groupBy("__a", "__i")
      .agg(((sum(floor(col("__x").cast("double") * lit(1000000.0d)))
        .cast("double") / count(lit(1)).cast("double"))
        / lit(1000000.0d)).as("__m"),
        count(lit(1)).as("__n"))
      .barriered // consumed by both pivot sides + the counts
    val ma = means.where(col("__a"))
      .select(col("__i"), col("__m").as("__ma"), col("__n").as("__na"))
    val mb = means.where(!col("__a"))
      .select(col("__i"), col("__m").as("__mb"), col("__n").as("__nb"))
    def d12(c: Column): Column =
      round(c, 12).cast(org.apache.spark.sql.types.DecimalType(38, 12))
    val terms = ma.join(mb, "__i")
      .agg(
        count(lit(1)).as("dims"),
        max(col("__na")).as("n_a"),
        max(col("__nb")).as("n_b"),
        sum(d12(col("__ma") * col("__mb"))).as("__dot"),
        sum(d12(col("__ma") * col("__ma"))).as("__aa"),
        sum(d12(col("__mb") * col("__mb"))).as("__bb"),
        sum(d12((col("__ma") - col("__mb"))
          * (col("__ma") - col("__mb")))).as("__sh"))
    terms.select(
      col("dims"), col("n_a"), col("n_b"),
      round(sqrt(col("__aa").cast("double")), 6).as("norm_mu_a"),
      round(sqrt(col("__bb").cast("double")), 6).as("norm_mu_b"),
      when(col("__aa") > 0 && col("__bb") > 0,
        round(col("__dot").cast("double")
          / (sqrt(col("__aa").cast("double"))
            * sqrt(col("__bb").cast("double"))), 6))
        .as("mean_cos"),
      round(sqrt(col("__sh").cast("double")), 6).as("l2_shift"))
  }
}
