package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Barrier.BarrierOps

/**
 * Deduplication operator family for large-scale text corpora — the
 * LLM-training-pipeline extension of the engine (north star; no
 * counterpart in the reference, which is purely relational ETL).
 *
 * Every operator here is built bucketed-by-design so the same plan
 * holds at 100 TB:
 *   - exact dedup shuffles once on the content hash;
 *   - MinHash signatures are computed with H parallel min-aggregates
 *     (map-side partial aggregation ⇒ shuffle volume is O(docs × H),
 *     not O(shingles × H));
 *   - LSH candidate generation self-joins on the (band, signature)
 *     bucket key — never an all-pairs cross join;
 *   - exact n-gram Jaccard runs only over the LSH-bounded candidate
 *     set.
 * All hashing is md5-based (codegen'd built-in) so results are
 * portable to the DuckDB oracle; no UDFs anywhere.
 */
object Dedup {

  /**
   * Exact content dedup: group rows by md5(textCol), keep the row with
   * the minimum idCol per group, and append `n_copies` (group size).
   *
   * Scale: one hash exchange on the content hash; both window
   * functions share that single partitioning. Content hashes are
   * uniformly distributed, so no skew handling is needed.
   */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val byHash = Window.partitionBy(col("__content_hash"))
    val pick = byHash.orderBy(col(idCol).asc)
    df.withColumn("__content_hash", md5(col(textCol)))
      .withColumn("__rn", row_number().over(pick))
      .withColumn("n_copies", count(lit(1)).over(byHash))
      .where(col("__rn") === 1)
      .drop("__content_hash", "__rn")
  }

  /**
   * Sub-document (chunk-level) dedup — the FineWeb-style boilerplate
   * remover: split each document into consecutive `chunkTokens`-token
   * chunks, deduplicate chunks GLOBALLY (first occurrence by
   * (doc id, position) wins), and reassemble each document from its
   * surviving chunks in original order.
   *
   * Output: one row per input doc — `n_chunks`, `n_kept`, and
   * `kept_text` ('' when every chunk was seen earlier, e.g. full
   * duplicates). Documents never disappear: the keep/drop decision is
   * folded into ONE per-doc aggregate (conditional collect_list skips
   * nulls), so no re-join with the input is needed.
   *
   * Scale: two exchanges — one on the chunk text for the global
   * first-occurrence window (uniform: chunk content hashes spread
   * evenly; heavy boilerplate chunks are exactly what the operator
   * removes and bound each window partition at the duplicate count),
   * one on the doc id for reassembly. Per-doc state is the doc's own
   * chunk list — bounded by document size, not corpus size.
   */
  def chunkDedup(
      df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int = 10): DataFrame = {
    val ct = lit(chunkTokens)
    val chunks = df
      .select(col(idCol), split(col(textCol), " ").as("toks"))
      .select(
        col(idCol),
        posexplode(
          transform(
            // last chunk index = floor((len-1)/chunkTokens); split('')
            // still yields [""] so len >= 1 always.
            sequence(
              lit(0),
              floor((size(col("toks")) - 1) / ct.cast("double")).cast("int")),
            c => array_join(slice(col("toks"), c * ct + 1, ct), " ")))
          .as(Seq("pos", "chunk")))
    val firstSeen = Window.partitionBy(col("chunk"))
      .orderBy(col(idCol), col("pos"))
    chunks
      .withColumn("__keep", row_number().over(firstSeen) === 1)
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("__keep"), 1L).otherwise(0L)).as("n_kept"),
        array_join(
          transform(
            sort_array(collect_list(when(col("__keep"), struct(col("pos"), col("chunk"))))),
            s => s.getField("chunk")),
          " ").as("kept_text"))
  }

  /**
   * Distinct word `n`-gram shingles: one `(idCol, shingle)` row per
   * distinct shingle, via the codegen'd
   * [[graft.functions.ShingleArray]] kernel. Documents with fewer
   * than `n` tokens produce no rows (explode-drops-empty semantics,
   * consistent with the oracle's empty generate_series).
   */
  def shingles(
      df: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame =
    df.select(
      col(idCol),
      explode(graft.functions.ShingleArray(col(textCol), n)).as("shingle"))

  /** Pure-built-in reference formulation of [[shingles]]
    * (element-identical, cross-checked in DedupSpec). */
  def shinglesHof(
      df: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame = {
    val w = split(col(textCol), " ")
    val starts = when(size(w) >= n, sequence(lit(0), size(w) - n))
      .otherwise(array().cast("array<int>"))
    val sh = transform(starts, i => concat_ws(" ", slice(w, i + 1, lit(n))))
    df.select(col(idCol), explode(array_distinct(sh)).as("shingle"))
  }

  /**
   * Per-document MinHash signature vector: `sig[k] = min over shingles
   * of the 60-bit numeric prefix of md5("k:" || shingle)` — the first
   * 15 hex chars parsed base-16 — a portable, uniformly distributed
   * stand-in for seeded integer hash permutations that any engine
   * (and the DuckDB oracle: `CAST('0x' || substr(md5(..),1,15) AS
   * BIGINT)`) reproduces exactly.
   *
   * Scale: computed entirely inside the scan projection by the
   * custom codegen'd expression [[graft.functions.MinHashSig]] —
   * ZERO shuffle; signature generation costs no exchange at any
   * corpus size. Docs with fewer than `shingleSize` tokens are
   * dropped (they have no shingles), matching the aggregation
   * formulation and the oracle.
   */
  def minhashSignatures(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 8,
      shingleSize: Int = 3): DataFrame =
    // Shingle-less docs are excluded with a CHEAP token-count
    // predicate, not `sig.isNotNull`: a filter on the sig expression
    // gets pushed into the scan (InferFiltersFromConstraints), where
    // it would run the whole MinHash kernel a second time per row.
    df.where(size(split(col(textCol), " ", -1)) >= shingleSize)
      .select(
        col(idCol),
        graft.functions.MinHashSig(col(textCol), numHashes, shingleSize).as("sig"))

  /**
   * Pure-built-in reference formulation of [[minhashSignatures]]
   * (bit-identical output, cross-checked in DedupSpec): explode
   * shingles, then a SINGLE groupBy(id) with `numHashes`
   * min-aggregates — map-side partial aggregation collapses each
   * partition to one row per (doc, hash) before the exchange, so
   * shuffle volume is O(docs × H) regardless of shingle count. The
   * LONG min metric matters: `min` over a fixed-width numeric gets
   * HashAggregate's mutable-buffer fast path, where min over md5 hex
   * STRINGS falls back to SortAggregate and drags two full sorts of
   * the shingle stream into the plan.
   */
  def minhashSignaturesAgg(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 8,
      shingleSize: Int = 3): DataFrame = {
    val sh = shingles(df, idCol, textCol, shingleSize)
    val mins = (0 until numHashes).map { k =>
      min(conv(substring(md5(concat(lit(s"$k:"), col("shingle"))), 1, 15), 16, 10)
        .cast("long")).as(s"__mh$k")
    }
    sh.groupBy(col(idCol))
      .agg(mins.head, mins.tail: _*)
      .select(
        col(idCol),
        array((0 until numHashes).map(k => col(s"__mh$k")): _*).as("sig"))
  }

  /**
   * LSH banding: split each signature into `numBands` contiguous bands
   * of `rowsPerBand` hashes; emit one `(idCol, sig, band, band_sig)`
   * row per band, where `band_sig` joins the band's hashes with "|".
   * The full signature rides along so candidate generation can score
   * pairs without re-joining back to the signature table.
   */
  def lshBands(sigs: DataFrame, idCol: String, rowsPerBand: Int): DataFrame = {
    require(rowsPerBand >= 1, s"rowsPerBand must be >= 1, got $rowsPerBand")
    val bandArr = transform(
      sequence(lit(0), (size(col("sig")) / rowsPerBand).cast("int") - 1),
      i => array_join(
        transform(
          slice(col("sig"), i * rowsPerBand + 1, lit(rowsPerBand)),
          _.cast("string")),
        "|"))
    sigs.select(
      col(idCol), col("sig"), posexplode(bandArr).as(Seq("band", "band_sig")))
  }

  /**
   * LSH candidate pairs with estimated Jaccard: documents sharing any
   * band signature become a candidate `(doc_a < doc_b)` pair;
   * `n_match`/`est_jaccard` count equal positions across the two full
   * signature vectors.
   *
   * Scale: the pair generation shuffles on the (band, band_sig) bucket
   * key — cost O(docs × bands) plus the within-bucket pair expansion
   * (bounded by bucket sizes, which LSH keeps small for any non-
   * pathological corpus; a giant bucket means the docs really are
   * near-identical and belongs in dedup output anyway). The signature
   * table is consumed FOUR times (both band-join sides + both
   * sig-lookup sides). Measured trade-off: recomputing it (default)
   * beats pinning via `localCheckpoint` — the checkpoint severs
   * lineage/statistics and the downstream joins lose their broadcast
   * plans, costing more than the recompute saves (the per-hash metric
   * is a cheap numeric min). `materializeSigs` remains available for
   * corpora where signature computation dominates; a multi-query
   * production pipeline would stage signatures to a real table
   * instead.
   */
  /** Reject band misconfigurations up front: a signature shorter than
    * one band would make lshBands' band-index sequence descend
    * (sequence(0, -1)) and slice garbage, and a remainder would leave
    * trailing hashes out of every band while still counting them in
    * the est_jaccard denominator — recall silently below the
    * configured bands, scores silently biased low. */
  private def requireBandConfig(numHashes: Int, rowsPerBand: Int): Unit = {
    require(
      numHashes >= rowsPerBand,
      s"numHashes ($numHashes) must be >= rowsPerBand ($rowsPerBand)")
    require(
      numHashes % rowsPerBand == 0,
      s"numHashes ($numHashes) must be a multiple of rowsPerBand " +
        s"($rowsPerBand): a remainder would exclude trailing hashes " +
        "from banding but not from scoring")
  }

  /** Estimated-Jaccard scoring of banded candidate pairs carrying
    * both signatures: shared by the self-join and cross-corpus paths
    * so score semantics can never diverge between them. */
  private def scorePairs(
      pairs: DataFrame,
      lId: String, rId: String,
      lSig: String, rSig: String,
      numHashes: Int): DataFrame = {
    val nMatch = size(filter(
      zip_with(col(lSig), col(rSig), (x, y) => x === y),
      m => m))
    pairs.select(
      col(lId), col(rId),
      nMatch.cast("long").as("n_match"),
      (nMatch.cast("double") / numHashes).as("est_jaccard"))
  }

  def minhashCandidates(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 8,
      rowsPerBand: Int = 2,
      shingleSize: Int = 3,
      materializeSigs: Boolean = false): DataFrame = {
    requireBandConfig(numHashes, rowsPerBand)
    val sigs0 = minhashSignatures(df, idCol, textCol, numHashes, shingleSize)
    val sigs = if (materializeSigs) sigs0.barriered else sigs0
    val bands = lshBands(sigs, idCol, rowsPerBand)
    // Signatures ride the band rows, so the bucket self-join yields
    // scored pairs directly — no sig-lookup joins, and the signature
    // pipeline is evaluated twice (the two join sides), not four
    // times. A pair matching in several bands collapses in the
    // distinct (signatures are functionally dependent on the ids).
    val a = bands.select(
      col("band"), col("band_sig"),
      col(idCol).as("doc_a"), col("sig").as("__sig_a"))
    val b = bands.select(
      col("band"), col("band_sig"),
      col(idCol).as("doc_b"), col("sig").as("__sig_b"))
    val pairs = a.join(b, Seq("band", "band_sig"))
      .where(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "__sig_a", "__sig_b")
      .distinct()
    scorePairs(pairs, "doc_a", "doc_b", "__sig_a", "__sig_b", numHashes)
  }

  /**
   * Incremental (cross-corpus) near-dup candidates: LSH band join of
   * an INCOMING batch against the EXISTING corpus, emitting only
   * (new, old) pairs — never new×new or old×old. This is the
   * ingestion-time dedup shape: each arriving batch pays
   * O(batch × bands) band rows against the corpus's banded
   * signatures, not a self-join of the unioned whole; at 100 TB the
   * corpus side's signatures are computed once (persist them — the
   * band table IS the dedup index, a few hundred bytes per doc) and
   * every batch joins against the same bucketed layout.
   *
   * Output: (new_id, old_id, n_match, est_jaccard), one row per
   * candidate pair.
   */
  def crossCorpusCandidates(
      existing: DataFrame,
      incoming: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 8,
      rowsPerBand: Int = 2,
      shingleSize: Int = 3): DataFrame = {
    requireBandConfig(numHashes, rowsPerBand)
    def banded(df: DataFrame, side: String) =
      lshBands(
        minhashSignatures(df, idCol, textCol, numHashes, shingleSize),
        idCol, rowsPerBand)
        .select(
          col("band"), col("band_sig"),
          col(idCol).as(s"${side}_id"), col("sig").as(s"__sig_$side"))
    val pairs = banded(incoming, "new")
      .join(banded(existing, "old"), Seq("band", "band_sig"))
      .select("new_id", "old_id", "__sig_new", "__sig_old")
      .distinct()
    scorePairs(pairs, "new_id", "old_id", "__sig_new", "__sig_old", numHashes)
  }

  /**
   * Ingestion-time dedup: the incoming rows whose estimated Jaccard
   * against EVERY existing document stays below `minEstJaccard` —
   * i.e. the batch minus its near-duplicates of the corpus, via one
   * anti-join on the matched new-ids.
   */
  def dedupAgainst(
      existing: DataFrame,
      incoming: DataFrame,
      idCol: String,
      textCol: String,
      minEstJaccard: Double = 0.5,
      numHashes: Int = 8,
      rowsPerBand: Int = 2,
      shingleSize: Int = 3): DataFrame = {
    val matched = crossCorpusCandidates(
        existing, incoming, idCol, textCol,
        numHashes, rowsPerBand, shingleSize)
      .where(col("est_jaccard") >= minEstJaccard)
      .select(col("new_id").as(idCol))
      .distinct()
    incoming.join(matched, Seq(idCol), "left_anti")
  }

  /**
   * Exact n-gram Jaccard over the LSH candidate set: the two texts
   * join onto each candidate pair and the custom codegen'd kernel
   * [[graft.functions.NGramJaccardSim]] compares shingle sets in-row.
   * Output: (doc_a, doc_b, n_common, jaccard).
   *
   * Scale: the expensive exact comparison runs ONLY over candidates —
   * O(candidates × text-length) — the canonical cheap-filter-then-
   * exact-verify pipeline shape. The per-pair kernel replaces the
   * exploded-shingle formulation (three O(shingles) Generates plus
   * shingle-keyed shuffles); the candidate set is small by
   * construction, so the two text-lookup joins are the only data
   * movement.
   */
  def ngramJaccard(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 8,
      rowsPerBand: Int = 2,
      shingleSize: Int = 3): DataFrame = {
    val cand = minhashCandidates(
      df, idCol, textCol, numHashes, rowsPerBand, shingleSize)
      .select("doc_a", "doc_b")
    val ta = df.select(col(idCol).as("doc_a"), col(textCol).as("__ta"))
    val tb = df.select(col(idCol).as("doc_b"), col(textCol).as("__tb"))
    cand.join(ta, "doc_a").join(tb, "doc_b")
      .select(
        col("doc_a"), col("doc_b"),
        graft.functions.NGramJaccardSim(
          col("__ta"), col("__tb"), shingleSize).as("__j"))
      .select(
        col("doc_a"), col("doc_b"),
        col("__j.n_common").cast("long").as("n_common"),
        col("__j.jaccard").as("jaccard"))
  }

  /**
   * EXACT set-similarity self-join via prefix filtering (the
   * AllPairs/PPJoin candidate principle, Xiao et al., WWW'08; Bayardo
   * et al., WWW'07): every document pair whose shingle-set Jaccard
   * similarity is >= `threshold`, with NO false negatives — the exact
   * complement to the probabilistic MinHash/LSH path
   * ([[minhashCandidates]]), for when recall must be provably 1.0
   * (e.g. legal takedown sweeps, benchmark decontamination audits).
   *
   * Candidate principle: order each document's shingles by global
   * rarity (corpus document frequency asc, shingle asc — one total
   * order shared by every document). If J(a,b) >= t then
   * |a∩b| >= ceil(t·max(|a|,|b|)), and by the prefix-filtering lemma
   * the first |x| - ceil(t·|x|) + 1 shingles of each side must share
   * at least one shingle — so an equi-join on PREFIX shingles finds
   * every qualifying pair. Prefixes are built from the corpus's
   * RAREST shingles, so candidate volume is Σ_prefix-shingle df²
   * concentrated where df is 1–2, never the all-pairs n².
   *
   * Scale: one shingle-df aggregation (map-side partial), one df
   * lookup join (both sides of the same shingle exchange), one
   * per-doc ranking window (keyed by doc — bounded by the doc's own
   * shingle count), one prefix equi-join, then the codegen'd
   * [[graft.functions.NGramJaccardSim]] exact verify over candidates
   * only. Memory is bounded per shingle bucket; no driver state. The
   * threshold is the scale dial: lower t lengthens prefixes
   * (factor (1-t)·|x|), so exact joins below ~0.5 should fall back
   * to LSH + verify.
   */
  /** IEEE-safe pruning bounds for the prefix-filter family:
    * `ceil(t·n)` computed naively in double can land ONE ABOVE the
    * true minimum overlap when the product rounds up across an
    * integer — `ceil(0.07d * 100)` is 8, yet a pair with overlap 7
    * passes the final `overlap/n >= t` compare (7/100 rounds to the
    * same double as 0.07) — so a bound that tight drops qualifying
    * pairs and silently breaks the zero-false-negative guarantee.
    * Subtracting a slack far larger than any accumulated multiply
    * error yet far smaller than 1 makes every pruning bound err only
    * on the LOOSE side: at worst one extra prefix shingle / candidate
    * survives to the exact verify, which re-filters with the oracle's
    * own ratio compare. The slack is absolute + RELATIVE: a fixed
    * 1e-9 alone stops covering the half-ulp error once t·n ≥ 2^24
    * (ulp scales with the value; a 17M-shingle doc would re-open the
    * false-negative hole), while x·1e-12 dominates x's half-ulp
    * (x·2⁻⁵³) at every magnitude. */
  private val PruneSlack = 1e-9
  private def loose(x: Column): Column = x - x * lit(1e-12) - lit(PruneSlack)
  private def ceilLoose(x: Column): Column = ceil(loose(x))

  def exactSimilarityJoin(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      shingleSize: Int = 3): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0,1], got $threshold")
    val sh = shingles(df, idCol, textCol, shingleSize)
    val dfreq = sh.groupBy("shingle").agg(count(lit(1)).as("__df"))
    val wDoc = Window.partitionBy(col(idCol))
    val prefix = sh.join(dfreq, "shingle")
      .withColumn("__pos",
        row_number().over(wDoc.orderBy(col("__df"), col("shingle"))))
      .withColumn("__n", count(lit(1)).over(wDoc))
      .where(col("__pos") <=
        col("__n") - ceilLoose(lit(threshold) * col("__n")) + 1)
      .select(col(idCol), col("shingle"), col("__pos"), col("__n"))
    val a = prefix.select(col(idCol).as("doc_a"), col("shingle"),
      col("__pos").as("__pa"), col("__n").as("__na"))
    val b = prefix.select(col(idCol).as("doc_b"), col("shingle"),
      col("__pos").as("__pb"), col("__n").as("__nb"))
    // Candidate pruning beyond the prefix join (both standard, both
    // false-negative-free):
    //  - length filter: J>=t ⟹ min(|a|,|b|) >= t·max(|a|,|b|);
    //  - positional filter (PPJoin): all common shingles sit at or
    //    after this shared one in both sorted lists, so overlap <=
    //    1 + min(|a|-pa, |b|-pb); J>=t needs overlap >=
    //    ceil(t/(1+t)·(|a|+|b|)). A qualifying pair passes at its
    //    FIRST shared prefix shingle, so keep-if-any-row-passes is
    //    safe — distinct() below collapses the survivors.
    val alpha = ceilLoose(lit(threshold / (1.0 + threshold)) *
      (col("__na") + col("__nb")))
    val cand = a.join(b, "shingle")
      .where(col("doc_a") < col("doc_b") &&
        least(col("__na"), col("__nb")) >=
          loose(lit(threshold) * greatest(col("__na"), col("__nb"))) &&
        lit(1) + least(col("__na") - col("__pa"),
          col("__nb") - col("__pb")) >= alpha)
      .select("doc_a", "doc_b")
      .distinct()
    val ta = df.select(col(idCol).as("doc_a"), col(textCol).as("__ta"))
    val tb = df.select(col(idCol).as("doc_b"), col(textCol).as("__tb"))
    cand.join(ta, "doc_a").join(tb, "doc_b")
      .select(
        col("doc_a"), col("doc_b"),
        graft.functions.NGramJaccardSim(
          col("__ta"), col("__tb"), shingleSize).as("__j"))
      .select(
        col("doc_a"), col("doc_b"),
        col("__j.n_common").cast("long").as("n_common"),
        col("__j.jaccard").as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /**
   * EXACT directional containment self-join: every ordered pair
   * (doc, container) with C(doc→container) = |Sh(doc) ∩ Sh(container)|
   * / |Sh(doc)| >= `threshold` — "doc is (nearly) a subset of
   * container". Jaccard ([[exactSimilarityJoin]]) misses subsumption:
   * a paragraph quoted inside a 100× larger aggregation page has
   * containment ≈ 1.0 but Jaccard ≈ 0.01. Containment is THE
   * curation signal for quote farms, scraped-content aggregators,
   * and per-chunk provenance ("which corpus doc swallowed this
   * benchmark passage"). Output is directional — both orientations
   * are emitted when both qualify (exact duplicates yield 1.0 each
   * way).
   *
   * Candidate principle (Vernica et al., SIGMOD'10 asymmetric
   * variant): order shingles by global rarity exactly as in
   * [[exactSimilarityJoin]]. If C(doc→b) >= t then the overlap is
   * >= ceil(t·|doc|), so by pigeonhole the probe doc's first
   * |doc| - ceil(t·|doc|) + 1 rarest shingles must hit b — an
   * equi-join of the probe PREFIX against the container's FULL
   * posting list finds every qualifying pair with zero false
   * negatives (the container side cannot be prefix-truncated: its
   * overlap bound depends on the probe's size, unknown at index
   * time — the standard asymmetric-containment cost). A necessary
   * size filter |container| >= ceil(t·|probe|) prunes before the
   * exact verify; the verify reuses the codegen'd
   * [[graft.functions.NGramJaccardSim]] kernel's n_common over the
   * probe's own distinct-shingle count.
   *
   * Documents with fewer than `shingleSize` tokens have no shingles
   * and never appear on either side — containment over an empty set
   * is undefined, matching D13's short-doc behavior.
   *
   * Scale: the probe prefix concentrates on df=1–2 shingles (same
   * rarity order as D13), so candidate volume is
   * Σ_prefix-shingle df_prefix·df_full — linear-ish in corpus size
   * for Zipf-distributed shingles, never all-pairs. The full-side
   * posting list is the one asymmetric overhead; at 100 TB the
   * posting join shuffles O(total shingles) — the same order as the
   * df aggregation already paid. Threshold is the dial: lower t
   * lengthens probe prefixes by (1−t)·|doc|.
   */
  def containmentJoin(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      shingleSize: Int = 3): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0,1], got $threshold")
    val sh = shingles(df, idCol, textCol, shingleSize)
    val dfreq = sh.groupBy("shingle").agg(count(lit(1)).as("__df"))
    val wDoc = Window.partitionBy(col(idCol))
    val probe = sh.join(dfreq, "shingle")
      .withColumn("__pos",
        row_number().over(wDoc.orderBy(col("__df"), col("shingle"))))
      .withColumn("__n", count(lit(1)).over(wDoc))
      .where(col("__pos") <=
        col("__n") - ceilLoose(lit(threshold) * col("__n")) + 1)
      .select(col(idCol).as("doc"), col("shingle"), col("__n").as("__na"))
    // The container side stays the RAW posting explode, and the size
    // prune joins AFTER the distinct pass. Two variants were measured
    // and rejected at sf0.1 (SCALE.md "Containment join"): routing
    // the container side through the df/window subtree for exchange
    // reuse (column pruning specializes the branch — nothing reuses,
    // the df join degenerates to a pointless semi-join: +0.5s), and
    // broadcasting sizes onto the postings to prune pre-distinct
    // (the per-posting-row broadcast probe costs more than the
    // 310k→213k distinct reduction saves: +1.5s).
    val index = sh.select(col(idCol).as("container"), col("shingle"))
    val sizes = sh.groupBy(col(idCol))
      .agg(count(lit(1)).as("__nb"))
      .select(col(idCol).as("container"), col("__nb"))
    val cand = probe.join(index, "shingle")
      .where(col("doc") =!= col("container"))
      .select("doc", "container", "__na")
      .distinct()
      .join(sizes, "container")
      .where(col("__nb") >= ceilLoose(lit(threshold) * col("__na")))
    val ta = df.select(col(idCol).as("doc"), col(textCol).as("__ta"))
    val tb = df.select(col(idCol).as("container"), col(textCol).as("__tb"))
    cand.join(ta, "doc").join(tb, "container")
      .select(
        col("doc"), col("container"), col("__na"),
        graft.functions.NGramJaccardSim(
          col("__ta"), col("__tb"), shingleSize).as("__j"))
      .select(
        col("doc"), col("container"),
        col("__j.n_common").cast("long").as("n_common"),
        (col("__j.n_common").cast("double") / col("__na"))
          .as("containment"))
      .where(col("containment") >= threshold)
  }

  /**
   * Near-duplicate clusters from verified pairs: connected components
   * over the (doc_a, doc_b) edge set via iterative min-label
   * propagation — each node's label converges to the smallest doc id
   * reachable from it, so "keep the cluster representative" is
   * `where(id === cluster)`. This is the step that turns pairwise
   * near-dup evidence into actual dedup decisions (a pair list alone
   * over-deletes chains: A~B, B~C must keep ONE of {A,B,C}, not
   * drop both B and C's partners independently).
   *
   * Output: (id, cluster) for every node appearing in an edge.
   *
   * Scale, two regimes: near-dup edge sets are SMALL BY CONSTRUCTION
   * (bounded by the true near-duplicate count), so up to
   * `driverMaxEdges` the edges collect to the driver — the same
   * footprint broadcasting them would cost — and a path-compressed
   * union-find labels them in microseconds; the alternating
   * large-star/small-star contraction below (the published MapReduce
   * CC algorithm — converges in O(log n) rounds regardless of graph
   * diameter) handles edge sets too large to collect.
   *
   * The driver regime decides its own applicability with a SINGLE
   * action: `limit(driverMaxEdges + 1).collect()` — if the result
   * fits, it IS the complete edge set, so the candidate pipeline runs
   * exactly once (the previous cache + count + collect triple paid a
   * cache materialization and an extra job for nothing — measured
   * 1.60s vs 1.36s on the q48 pipeline at sf0.1). The beyond-driver
   * regime pays the probe as one extra pipeline pass before the
   * cached contraction loop — acceptable because crossing it means
   * >`driverMaxEdges` genuine near-dup pairs, where the contraction
   * rounds dominate the probe.
   */
  /**
   * D25 (r12): INCREMENTAL connected-component maintenance — the
   * daily-growth path for a 100 TB near-dup graph: yesterday's
   * (id, cluster) assignment plus today's new candidate edges,
   * WITHOUT re-running CC over the accumulated edge set. Exactness:
   * old intra-cluster structure is already collapsed through each
   * cluster's min-id representative, so CC over
   * {(id, cluster)} ∪ newPairs equals CC over the full history —
   * and only the LABEL graph needs solving: each new edge maps its
   * endpoints to their current labels (an unassigned endpoint is
   * its own label), conflicting-label edges form a graph over
   * AFFECTED labels (increment-sized, never corpus-sized), and
   * [[nearDupClusters]] solves it — inheriting the bounded driver
   * union-find fast path AND the Barrier-routed star-contraction
   * fallback. A new id smaller than an old representative correctly
   * takes over as min-id (label-graph min = global member min,
   * since every old label is already its cluster's min).
   *
   * Scale: ONE pass over the assignment table (two hash joins
   * against the increment-sized edge frame + one label-map join
   * back — the label map is affected-clusters-sized, AQE broadcasts
   * it), the label-graph CC on the conflict set only. Compare
   * re-running [[nearDupClusters]] from scratch: that pays the full
   * historical edge set every day.
   *
   * Output: (id, cluster) for every previously-assigned id plus
   * every id appearing in `newPairs` — the same shape as
   * [[nearDupClusters]], ascending id.
   */
  def incrementalClusters(
      assignments: DataFrame,
      newPairs: DataFrame,
      maxIter: Int = 20,
      driverMaxEdges: Long = 4000000): DataFrame = {
    val asg = assignments
      .select(col("id").cast("long"), col("cluster").cast("long"))
      .barriered
    val np = newPairs
      .select(col("doc_a").cast("long"), col("doc_b").cast("long"))
      .where(col("doc_a").isNotNull && col("doc_b").isNotNull &&
        col("doc_a") =!= col("doc_b"))
      .distinct()
      .barriered
    def lbl(side: String) = asg.select(
      col("id").as(side), col("cluster").as(s"__l_$side"))
    val labelPairs = np
      .join(lbl("doc_a"), Seq("doc_a"), "left")
      .join(lbl("doc_b"), Seq("doc_b"), "left")
      .select(
        coalesce(col("__l_doc_a"), col("doc_a")).as("la"),
        coalesce(col("__l_doc_b"), col("doc_b")).as("lb"))
      .where(col("la") =!= col("lb"))
      .select(least(col("la"), col("lb")).as("doc_a"),
        greatest(col("la"), col("lb")).as("doc_b"))
      .distinct()
    val labelMap = Barrier.barrier(
      nearDupClusters(labelPairs, maxIter, driverMaxEdges)
        .select(col("id").as("__old"), col("cluster").as("__new")))
    val remapOld = asg
      .join(labelMap, asg("cluster") === col("__old"), "left")
      .select(asg("id"),
        coalesce(col("__new"), asg("cluster")).as("cluster"))
    val newIds = np.select(col("doc_a").as("id"))
      .unionAll(np.select(col("doc_b").as("id")))
      .distinct()
      .join(asg.select(col("id")), Seq("id"), "left_anti")
    val remapNew = newIds
      .join(labelMap, newIds("id") === col("__old"), "left")
      .select(newIds("id"),
        coalesce(col("__new"), newIds("id")).as("cluster"))
    remapOld.unionByName(remapNew).orderBy("id")
  }

  def nearDupClusters(
      pairs: DataFrame,
      maxIter: Int = 20,
      driverMaxEdges: Long = 4000000): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val canonical = pairs
      .select(col("doc_a").cast("long"), col("doc_b").cast("long"))
      .distinct()
    val cap = math.min(driverMaxEdges, Int.MaxValue - 2L).toInt
    val probe = canonical.limit(cap + 1).as[(Long, Long)].collect()
    if (probe.length <= cap) {
      val edgeList = probe
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x // path compression
        while (parent.getOrElse(c, c) != r) {
          val nxt = parent.getOrElse(c, c); parent(c) = r; c = nxt
        }
        r
      }
      edgeList.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a)
        parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { // union by min id: representative = smallest
          if (ra < rb) parent(rb) = ra else parent(ra) = rb
        }
      }
      parent.keys.toSeq.sorted
        .map(id => (id, find(id)))
        .toDF("id", "cluster")
    } else {
      // Cached: the contraction loop's symmetric union reads the
      // (expensive) candidate pipeline twice per materialization.
      // starContractClusters returns a localCheckpoint'd result
      // (lineage severed), so the cache drops immediately after.
      val cached = canonical.cache()
      try starContractClusters(cached, maxIter)
      finally cached.unpersist()
    }
  }

  /**
   * Distributed connected components via alternating large-star /
   * small-star contraction ("Connected Components in MapReduce and
   * Beyond", Kiveris et al.): each round rewires every node's larger
   * neighbors (large-star) then its smaller neighbors (small-star)
   * onto the local minimum, contracting components toward stars
   * centered at their global minimum in **O(log n) rounds regardless
   * of graph diameter** — the property min-label propagation lacks
   * (rounds = diameter there; a pathological duplicate-chain at scale
   * would crawl).
   *
   * Output: (id, cluster) for every node in the edge set, cluster =
   * the component's minimum id — identical to the driver union-find.
   *
   * Scale: each round is two self-contained aggregate+join stages
   * over the current edge set, which only shrinks toward one edge per
   * non-root node; state per round is O(edges), never per-component.
   * Convergence is detected from (count, Σsrc, Σdst) stability —
   * endpoints only ever decrease toward component minima, so a fully
   * unchanged triple is a fixpoint of the deterministic round
   * function; `maxIter` remains the hard stop.
   */
  private[graft] def starContractClusters(
      pairs: DataFrame, maxIter: Int): DataFrame =
    starContractRounds(pairs, maxIter)._1

  /** [[starContractClusters]] plus the number of contraction rounds
    * actually run — exposed so tests can pin the O(log n) bound. */
  private[graft] def starContractRounds(
      pairs: DataFrame, maxIter: Int): (DataFrame, Int) = {
    val spark = pairs.sparkSession

    // One round of large-star then small-star. Edges are kept
    // max→min oriented ("u" > "v") between rounds.
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.select(col("u"), col("v"))
        .unionByName(e.select(col("v").as("u"), col("u").as("v")))
      // m(u) = min(N(u) ∪ {u})
      val m = sym.groupBy("u").agg(min("v").as("__mn"))
        .select(col("u"), least(col("u"), col("__mn")).as("__m"))
      // connect every LARGER neighbor of u to m(u)
      sym.where(col("v") > col("u"))
        .join(m, "u")
        .select(col("v").as("u"), col("__m").as("v"))
        .where(col("u") =!= col("v"))
        .distinct()
    }
    def smallStar(e: DataFrame): DataFrame = {
      // orient max→min; all neighbors in this view are < u
      val dir = e.select(
          greatest(col("u"), col("v")).as("u"),
          least(col("u"), col("v")).as("v"))
        .where(col("u") =!= col("v"))
        .distinct()
      val m = dir.groupBy("u").agg(min("v").as("__m"))
      // connect u and every smaller neighbor except m itself to m(u)
      val viaNeighbors = dir.join(m, "u")
        .where(col("v") =!= col("__m"))
        .select(col("v").as("u"), col("__m").as("v"))
      val self = m.select(col("u"), col("__m").as("v"))
      viaNeighbors.unionByName(self)
        .where(col("u") =!= col("v"))
        .distinct()
    }

    // Each round references the previous edge set ~4× (symmetric
    // union + aggregate join on both stars), so a cache alone leaves
    // the LOGICAL plan growing ~4^rounds — analysis/explain blows up
    // long before execution does. A checkpoint (eager) severs the
    // lineage every round, keeping the plan O(1) per round.
    //
    // Durability: the shared [[Barrier]] contract — reliable
    // `checkpoint()` when the caller set a checkpoint dir (round
    // state survives executor loss — the cluster deployment shape),
    // `localCheckpoint()` otherwise (the local[32]/test fast path).
    import Barrier.barrier
    var edges = barrier(pairs
      .select(
        greatest(col("doc_a"), col("doc_b")).as("u"),
        least(col("doc_a"), col("doc_b")).as("v"))
      .where(col("u") =!= col("v"))
      .distinct())
    def signature(e: DataFrame): (Long, Long, Long) = {
      val r = e.agg(
        count(lit(1)), coalesce(sum("u"), lit(0L)),
        coalesce(sum("v"), lit(0L))).head()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    var prev = signature(edges)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val next = barrier(smallStar(largeStar(edges)))
      val sig = signature(next)
      converged = sig == prev
      prev = sig
      org.apache.spark.sql.GraftBridge.freeLocalCheckpoint(edges)
      edges = next
      i += 1
    }
    if (!converged)
      // A maxIter-truncated run degrades GRACEFULLY (best label
      // reached, no conflicting rows — see the label read below) but
      // one component split across cluster ids means silent
      // under-deduplication; make that observable, not silent.
      org.slf4j.LoggerFactory.getLogger(getClass)
        .warn(s"starContractClusters stopped at maxIter=$maxIter " +
          "without converging; labels may be non-minimal " +
          "(one component split across several cluster ids). " +
          "Re-run with a larger maxIter.")
    // At the fixpoint every component is a star (leaf → min-root), so
    // labels read straight off the edges; the min-aggregate also
    // makes a maxIter-truncated stop degrade gracefully (best label
    // reached) instead of emitting conflicting rows. Nodes that only
    // ever appeared in self-pairs (doc_a == doc_b) have no surviving
    // edge — the left join against the input's node set restores
    // them as their own singleton cluster, matching the union-find.
    val labels = edges.select(col("u").as("id"), col("v").as("cluster"))
      .unionByName(edges.select(col("v").as("id"), col("v").as("cluster")))
      .groupBy("id").agg(min("cluster").as("cluster"))
    val nodes = pairs.select(col("doc_a").as("id"))
      .unionByName(pairs.select(col("doc_b").as("id")))
      .distinct()
    // The final barrier severs the iterative lineage so the working
    // caches can be released here rather than pinning blocks for the
    // session.
    val out = barrier(nodes.join(labels, Seq("id"), "left")
      .select(col("id"), coalesce(col("cluster"), col("id")).as("cluster")))
    org.apache.spark.sql.GraftBridge.freeLocalCheckpoint(edges)
    (out, i)
  }

  /** Min-label-propagation reference formulation of distributed
    * connected components (rounds = graph diameter — superseded in
    * the [[nearDupClusters]] production path by the O(log n)-round
    * [[starContractClusters]]; kept as an independent cross-check,
    * parity-asserted in DedupSpec). */
  private[graft] def iterativeClusters(
      pairs: DataFrame, maxIter: Int): DataFrame = {
    val edges = pairs
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .distinct()
      .cache()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("cluster", col("id"))
      .cache()
    var prevSum = labels.agg(sum("cluster")).head().getLong(0)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val neighborMin = edges
        .join(
          labels.select(col("id").as("dst"), col("cluster").as("__nl")),
          "dst")
        .groupBy("src")
        .agg(min("__nl").as("__minNeighbor"))
        .select(col("src").as("id"), col("__minNeighbor"))
      val next = labels
        .join(neighborMin, Seq("id"), "left")
        .select(
          col("id"),
          least(
            col("cluster"),
            coalesce(col("__minNeighbor"), col("cluster"))).as("cluster"))
        .cache()
      val nextSum = next.agg(sum("cluster")).head().getLong(0)
      converged = nextSum == prevSum
      prevSum = nextSum
      labels.unpersist()
      labels = next
      i += 1
    }
    // Sever the iterative lineage (maxIter joins deep) so BOTH working
    // caches can be released here — returning the cached `labels`
    // directly would pin its blocks for the rest of the session.
    val out = labels.barriered
    labels.unpersist()
    edges.unpersist()
    out
  }

  /**
   * SimHash 64-bit fingerprint over distinct whitespace tokens,
   * returned as a 64-char '0'/'1' string (bit j at position j).
   *
   * Each token hashes once to md5; bit j of the fingerprint is the
   * sign of Σ_tokens (2·bit_j(md5(token)) − 1), where bit_j reads the
   * j-th bit of the first 16 hex chars (4 bits per char, LSB-first
   * within a char). Ties (Σ = 0) resolve to '0'.
   *
   * Scale: computed entirely with higher-order functions inside the
   * row — ZERO shuffle, whole-stage-codegen'd; each token is md5'd
   * exactly once (the outer transform materializes the hex digest
   * string per token; bit extraction then reads that string — lambda
   * bodies re-evaluate their whole expression tree per element, so
   * keeping md5 OUT of the per-bit lambdas is a 64× hashing saving).
   * (At extreme scale a global distinct-token dictionary join would
   * amortize hashing across repeated tokens; unnecessary until token
   * reuse across rows dominates.)
   */
  def simhash(textCol: Column): Column = {
    // One md5 per distinct token, materialized before bit extraction.
    val hashes = transform(array_distinct(split(textCol, " ")), t => md5(t))
    // Per token: 64 ±1 contributions, 4 bits per hex char (LSB first),
    // chars 1..16 → bits 0..63.
    val tokenBits = transform(
      hashes,
      h => flatten(transform(
        sequence(lit(1), lit(16)),
        i => {
          val c = ascii(h.substr(i, lit(1)))
          val v = when(c <= 57, c - 48).otherwise(c - 87)
          array(
            (v % 2) * 2 - 1,
            ((v / 2).cast("int") % 2) * 2 - 1,
            ((v / 4).cast("int") % 2) * 2 - 1,
            ((v / 8).cast("int") % 2) * 2 - 1)
        })))
    // Element-wise tally across tokens, then sign per bit.
    val tallies = aggregate(
      tokenBits,
      array_repeat(lit(0), 64),
      (acc, tb) => zip_with(acc, tb, _ + _))
    array_join(transform(tallies, t => when(t > 0, "1").otherwise("0")), "")
  }

  /**
   * Fast path for [[simhash]]: bit-for-bit identical fingerprints via
   * the custom codegen'd Catalyst expression
   * [[graft.functions.SimHash64]]. Spark's higher-order functions are
   * CodegenFallback (interpreted, boxed per element), so the
   * pure-built-in formulation pays ~25× over this single JVM kernel;
   * use this in hot paths, [[simhash]] as the portable reference.
   */
  def simhashFast(textCol: Column): Column =
    graft.functions.SimHash64(textCol)

  /**
   * Train/val split-leakage audit: tag each near-dup pair with both
   * members' split assignments and flag pairs that straddle splits —
   * near-duplicates leaking across a train/eval boundary are silent
   * eval contamination (the model has effectively seen the val doc),
   * so this check belongs after every (re)split of a deduplicated
   * corpus.
   *
   * `pairs` is a candidate-pair frame (`doc_a`, `doc_b` — e.g.
   * signature-strong [[minhashCandidates]] output); `assignments`
   * maps `idCol` → `splitCol` for every document.
   *
   * Scale posture: `assignments` is corpus-sized (one row per doc)
   * while `pairs` is the bounded LSH candidate set, so the shape that
   * matters is how many times the big table is scanned. Joining it
   * once per side would scan it twice; instead the pairs are melted
   * to (pair, side, id) — 2·|pairs| rows — joined against ONE
   * assignment scan (AQE broadcasts the small melted side), then
   * regrouped to pairs. The regroup exchange carries only the
   * candidate set, never the corpus.
   */
  /**
   * D20: split-coherence REPAIR — [[splitLeakage]] finds near-dup
   * pairs straddling a train/eval boundary; this operator FIXES
   * them: every near-dup cluster is reassigned wholesale to its
   * REPRESENTATIVE's split (the cluster label is the min-id member —
   * the [[nearDupClusters]] contract), so no cluster can straddle a
   * boundary afterwards, by construction. The min-id rule is the
   * deterministic tiebreak (any "majority split" rule flaps when a
   * cluster grows a member); since the whole cluster moves together,
   * leakage closure holds for ANY rule — this one is replayable.
   *
   * Unclustered docs (no near-dup edges) keep their assignment
   * untouched; `moved` flags the audit trail (how much eval data a
   * repair consumed is a release-gate number, not a side effect).
   *
   * Scale: one join of the cluster table (bounded by clustered docs)
   * onto assignments on the representative id, one left join back —
   * the corpus-sized table is scanned once per join, never exploded.
   *
   * Output: (idCol, splitCol, new_split, moved) — one row per
   * assignment row.
   */
  def splitCoherentRepair(
      assignments: DataFrame, idCol: String, splitCol: String,
      clusters: DataFrame): DataFrame = {
    val canon = clusters
      .select(col("id").as("__member"), col("cluster"))
      .join(
        assignments.select(
          col(idCol).as("cluster"), col(splitCol).as("__cs")),
        Seq("cluster"))
    assignments
      .join(canon.select(col("__member").as(idCol), col("__cs")),
        Seq(idCol), "left")
      .select(
        col(idCol), col(splitCol),
        coalesce(col("__cs"), col(splitCol)).as("new_split"),
        (coalesce(col("__cs"), col(splitCol)) =!= col(splitCol))
          .as("moved"))
  }

  def splitLeakage(
      pairs: DataFrame, assignments: DataFrame,
      idCol: String, splitCol: String): DataFrame = {
    val melted = pairs.select(
      col("doc_a"), col("doc_b"),
      explode(array(
        struct(lit("a").as("side"), col("doc_a").as("id")),
        struct(lit("b").as("side"), col("doc_b").as("id")))).as("m"))
      .select(col("doc_a"), col("doc_b"),
        col("m.side").as("side"), col("m.id").as("id"))
    melted
      .join(assignments.select(
          col(idCol).as("id"), col(splitCol).as("split")),
        Seq("id"))
      .groupBy("doc_a", "doc_b")
      .agg(
        max(when(col("side") === "a", col("split"))).as("split_a"),
        max(when(col("side") === "b", col("split"))).as("split_b"))
      .withColumn("leaked", col("split_a") =!= col("split_b"))
  }

  /**
   * Canonical-document pick — the dedup ENDGAME the cluster table
   * alone doesn't decide: within each near-dup cluster keep exactly
   * ONE document, the highest-quality copy (score desc, id asc on
   * ties — total, engine-deterministic; NULL scores sort last, so a
   * scoreless copy never beats a scored one). Docs in no cluster are
   * their own singleton cluster and trivially canonical — the output
   * covers EVERY input doc, so `where(is_canonical)` IS the deduped
   * corpus and the false rows are the removal audit trail.
   *
   * Scale: one left join onto the (small) cluster table + one
   * cluster-key window; cluster populations bound the window state.
   *
   * Output: (idCol, cluster, scoreCol, is_canonical), by id.
   */
  def canonicalPick(
      scored: DataFrame, idCol: String, scoreCol: String,
      clusters: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("cluster"))
      .orderBy(col(scoreCol).desc_nulls_last, col(idCol))
    scored
      .join(clusters.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .withColumn("cluster", coalesce(col("cluster"), col(idCol)))
      .withColumn("is_canonical", row_number().over(w) === 1)
      .select(col(idCol), col("cluster"), col(scoreCol),
        col("is_canonical"))
      .orderBy(idCol)
  }

  /**
   * Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken,
   * SIGMOD 2003 — the MOSS algorithm): from each document's sequence
   * of k-token shingle hashes, keep only the MINIMUM hash of every
   * w-long window (rightmost winner on ties), deduplicated by
   * (hash, position). The published guarantee: any copied span of at
   * least w+k−1 tokens shares at least one selected fingerprint —
   * positional copy detection like D11's every-n-gram pipeline, but
   * the posting volume drops to ~2/(w+1) of the shingle stream,
   * which at 100 TB is the difference between a fingerprint index
   * that fits and one that doesn't. Complements D2 (minhash finds
   * whole-document similarity, no positions) and D11 (exact span
   * REMOVAL needs every n-gram — this SELECTS evidence).
   *
   * Shape: one scan explodes (pos, 60-bit md5 shingle hash); the
   * per-window argmin is ONE bounded window per doc
   * (`min(struct(hash, −pos))` over `rows [0, w−1] following` —
   * lexicographic min = (hash asc, pos desc), the rightmost-tie
   * rule); windows never cross documents and hold ≤ w rows. All
   * integer/string work — engine-exact.
   *
   * Output: (id, pos, fp_hash), one row per selected fingerprint.
   */
  def winnowFingerprints(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int, w: Int): DataFrame = {
    require(k >= 1, s"shingle size k must be >= 1, got $k")
    require(w >= 1, s"window w must be >= 1, got $w")
    val grams = docs
      .where(col(textCol).isNotNull)
      .select(col(idCol), split(col(textCol), " ").as("__t"))
      .where(size(col("__t")) >= k)
      .select(col(idCol), explode(expr(
        s"""transform(sequence(0, size(__t) - $k), i ->
              struct(i AS pos,
                concat_ws(' ', slice(__t, i + 1, $k)) AS ng))"""))
        .as("__g"))
      .select(col(idCol), col("__g.pos").as("pos"),
        conv(substring(md5(col("__g.ng")), 1, 15), 16, 10)
          .cast("long").as("h"))
    val wWin = Window.partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(0, w - 1)
    val wDoc = Window.partitionBy(col(idCol))
    grams
      .withColumn("__m", count(lit(1)).over(wDoc))
      .withColumn("__win",
        min(struct(col("h").as("h"), (-col("pos")).as("np"))).over(wWin))
      // a start position only anchors a FULL window
      .where(col("pos") <= col("__m") - w)
      .select(col(idCol), (-col("__win.np")).as("pos"),
        col("__win.h").as("fp_hash"))
      .distinct()
  }

  /**
   * Shared-winnowing-fingerprint pairs: documents co-selecting at
   * least `minShared` distinct fingerprint hashes — the copy-
   * detection report over [[winnowFingerprints]]. Postings bucket by
   * fingerprint hash; `capPerHash` bounds a hot fingerprint's
   * posting list at the N lowest ids (the standing band-bucket rule
   * — the cap must be INACTIVE at oracle-gate scales so results stay
   * byte-identical, and a fingerprint shared by half the corpus is
   * boilerplate, not a copy signal).
   */
  def winnowPairs(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int, w: Int, minShared: Long,
      capPerHash: Int = 256): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    val fp = winnowFingerprints(docs, idCol, textCol, k, w)
      .select(col(idCol).as("doc"), col("fp_hash")).distinct()
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("fp_hash")).orderBy(col("doc"))))
      .where(col("__rn") <= capPerHash)
      .barriered
    fp.select(col("doc").as("doc_a"), col("fp_hash"))
      .join(fp.select(col("doc").as("doc_b"), col("fp_hash")), Seq("fp_hash"))
      .where(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(countDistinct(col("fp_hash")).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }

  /**
   * D21: dedup threshold-calibration curve — the "where do I set the
   * dial" readout every near-dup pipeline needs before committing a
   * threshold to a 100 TB pass: given scored candidate pairs (a
   * cheap estimator column) and a ground-truth flag (an expensive
   * exact verify on the same pairs), report TP/FP/FN and precision/
   * recall/F1 at every threshold in the grid. The knee of this curve
   * IS the production threshold; re-running it on a sample after
   * each corpus shift is how the dial stays calibrated.
   *
   * Scale: one broadcast of the |thresholds|-row grid onto the pair
   * frame (a BroadcastNestedLoopJoin of a literal table — the house
   * one-small-side contract), one partial-aggregated groupBy on the
   * threshold. Calibration runs on CANDIDATE pairs (already
   * blocking-bounded), never all-pairs.
   *
   * Degenerate cells follow the ANSI/NULL-divisor discipline
   * (q276): precision NULL when nothing was predicted positive,
   * recall NULL when nothing IS positive, F1 0 when defined but
   * tp = 0 — and DuckDB's x/0 = NULL makes the oracle's unguarded
   * formula land on the identical NULLs.
   */
  def thresholdCurve(
      scored: DataFrame, estCol: Column, truthCol: Column,
      thresholds: Seq[Double]): DataFrame = {
    require(thresholds.nonEmpty, "thresholds must be non-empty")
    val spark = scored.sparkSession
    val grid = broadcast(
      spark.createDataFrame(thresholds.map(Tuple1(_)))
        .toDF("threshold"))
    val counts = scored
      .select(estCol.cast("double").as("__e"), truthCol.as("__t"))
      .where(col("__e").isNotNull && col("__t").isNotNull)
      .crossJoin(grid)
      .groupBy("threshold")
      .agg(
        sum(when(col("__e") >= col("threshold") && col("__t"), 1L)
          .otherwise(0L)).as("tp"),
        sum(when(col("__e") >= col("threshold") && !col("__t"), 1L)
          .otherwise(0L)).as("fp"),
        sum(when(col("__e") < col("threshold") && col("__t"), 1L)
          .otherwise(0L)).as("fn"),
        sum(when(col("__e") < col("threshold") && !col("__t"), 1L)
          .otherwise(0L)).as("tn"))
    val tpD = col("tp").cast("double")
    val pDen = when(col("tp") + col("fp") > 0L,
      (col("tp") + col("fp")).cast("double"))
    val rDen = when(col("tp") + col("fn") > 0L,
      (col("tp") + col("fn")).cast("double"))
    val pr = tpD / pDen
    val rc = tpD / rDen
    val f1Den = when(pr + rc > 0.0, pr + rc)
    counts.select(
      col("threshold"), col("tp"), col("fp"), col("fn"), col("tn"),
      round(pr, 6).as("precision"),
      round(rc, 6).as("recall"),
      coalesce(
        round(lit(2.0) * pr * rc / f1Den, 6),
        when(pr.isNotNull && rc.isNotNull, lit(0.0))).as("f1"))
  }
}
