package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/**
 * Incremental aggregate maintenance — the 100 TB rollup pattern where
 * history is NEVER rescanned: each arriving batch reduces to a
 * per-key additive STATE table, and the running rollup is a merge of
 * states (yesterday's state ⊕ today's batch-state), costing
 * O(today + |keys|) instead of O(all history).
 *
 * Every state column is exactly mergeable, so merged-state ==
 * full-recompute holds bit-for-bit — a hard, oracle-checkable
 * contract, not an approximation:
 *   - `n_rows` (long) and `sum_v` (DECIMAL(38,6) over the 6dp
 *     quantized value — associative, partition/batch-order free;
 *     ANSI overflow throws, never corrupts: per-key mass must stay
 *     below 10³²) add;
 *   - `min_v`/`max_v` combine by least/greatest;
 *   - the R23 content digest pair carries row-set identity across
 *     merges: `xor_hash` (XOR of 60-bit md5-prefix row hashes —
 *     order-free, blind to even-count dups) and `hash_sum` (exact
 *     DECIMAL(38,0) sum — catches exactly what XOR misses). A batch
 *     double-applied or lost flips both digests w.p. 1−2⁻⁶⁰.
 *
 * SQL null semantics throughout (both engines agree): NULL values
 * count in `n_rows` and the digests but carry no sum/min/max mass.
 *
 * Scale: one partial-aggregated exchange per batch at batch size;
 * the merge is one exchange at |keys| × |batches| — at 1000
 * executors the daily increment never touches cold history, and the
 * digest columns make silent double-apply/loss auditable for free.
 */
object Incremental {

  private val dec0 = DecimalType(38, 0)
  // (28,6) so SUM widens to DECIMAL(38,6): per-key mass is then safe
  // below 10^32 as documented above. ((18,6) would cap the sum at
  // (28,6) ≈ 10^22 — round-10 ADVICE fix.) Quantization is identical
  // ((scale 6 either way), so oracle SQL casting at (18,6) agrees.
  private val dec6 = DecimalType(28, 6)

  /** 60-bit md5-prefix row hash over `hashCols` (the q189 [[Quality.tableFingerprint]]
    * convention — integer/string columns only: doubles render
    * engine-differently). */
  private def rowHash(hashCols: Seq[String]): Column =
    conv(substring(md5(concat_ws("\u0001",
      hashCols.map(c => col(c).cast("string")): _*)), 1, 15), 16, 10)
      .cast("long")

  /** Reduce one raw batch to its per-key additive state. */
  def aggState(
      df: DataFrame, keys: Seq[String], valCol: String,
      hashCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "aggState: keys is empty")
    require(hashCols.nonEmpty, "aggState: hashCols is empty")
    df.select(keys.map(col) ++ Seq(
        col(valCol).cast(dec6).as("__v"),
        rowHash(hashCols).as("__h")): _*)
      .groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("__v")).as("sum_v"),
        min(col("__v")).as("min_v"),
        max(col("__v")).as("max_v"),
        expr("bit_xor(__h)").as("xor_hash"),
        sum(col("__h").cast(dec0)).as("hash_sum"))
  }

  /** Merge a union of state tables into one state — associative and
    * batch-order free, so states can roll up hierarchically
    * (hour→day→month) without recomputation. */
  def mergeStates(states: DataFrame, keys: Seq[String]): DataFrame =
    states.groupBy(keys.map(col): _*)
      .agg(
        sum(col("n_rows")).as("n_rows"),
        sum(col("sum_v")).as("sum_v"),
        min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v"),
        expr("bit_xor(xor_hash)").as("xor_hash"),
        sum(col("hash_sum")).as("hash_sum"))

  /** Stable external rendering: exact decimals surface as doubles
    * (same decimal → same IEEE double on every engine) and the
    * >64-bit digest as digit strings (the q189 rule). */
  def finish(state: DataFrame, keys: Seq[String]): DataFrame =
    state.select(keys.map(col) ++ Seq(
      col("n_rows").cast("long").as("n_rows"),
      col("sum_v").cast("double").as("sum_v"),
      col("min_v").cast("double").as("min_v"),
      col("max_v").cast("double").as("max_v"),
      col("xor_hash"),
      col("hash_sum").cast(dec0).cast("string").as("hash_sum")): _*)
}
