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
 */
object Fuzzy {

  /**
   * Near-identical pairs of `nameCol` values within blocks of
   * `blockKey`, at levenshtein distance in (0, maxDist]. Exact
   * duplicates are excluded (distance 0 — that's `Dedup.exact`'s
   * job); each unordered pair appears once (id_a < id_b).
   */
  def blockedPairs(
      df: DataFrame, idCol: String, nameCol: String,
      blockKey: Column, maxDist: Int): DataFrame = {
    val a = df.select(
      col(idCol).as("id_a"), col(nameCol).as("name_a"),
      blockKey.as("__blk"))
    val b = df.select(
      col(idCol).as("id_b"), col(nameCol).as("name_b"),
      blockKey.as("__blk"))
    a.join(b, "__blk")
      .where(col("id_a") < col("id_b"))
      // 3-arg levenshtein stops early past the bound: the common
      // (far-apart) case costs O(maxDist * len), not O(len^2).
      .withColumn("dist", levenshtein(col("name_a"), col("name_b"), maxDist))
      .where(col("dist").between(1, maxDist))
      .drop("__blk")
  }
}
