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
}
