package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Blocking-key audit for the fuzzy-match family (VERDICT r5 #4): q130
 * and `Fuzzy.blockedPairs`/`jaroWinklerPairs` confine candidate pairs
 * to first-word blocks of `p_name`. This measures what that key
 * actually does at corpus scale: [[graft.operators.Skew.skewProbe]]
 * for the hottest blocks (share / uniform-multiple / suggested salt)
 * plus the quantity that governs the join cost — Σ|block|² — and how
 * it would grow at 10× rows, since candidate volume, not key skew, is
 * the first-word key's failure mode (block COUNT is a fixed vocabulary
 * while block SIZE grows linearly with the corpus → quadratic pairs).
 *
 * Findings land in SCALE.md §"Fuzzy blocking".
 * Run: `sbt -batch "runMain graft.BlockAudit [sfDir]"`.
 */
object BlockAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val part = graft.sources.Tables.load(spark, dir, "part")
    val blk = split(col("p_name"), " ").getItem(0)

    println("=== skewProbe(first word of p_name), full part, top 10 ===")
    graft.operators.Skew.skewProbe(
      part.select(blk.as("__blk")), "__blk", 10).show(10, truncate = false)

    val stats = part.groupBy(blk.as("__blk"))
      .agg(count(lit(1)).as("n"))
      .agg(
        count(lit(1)).as("n_blocks"),
        sum(col("n")).as("n_rows"),
        max(col("n")).as("max_block"),
        avg(col("n")).as("avg_block"),
        sum(col("n") * col("n")).as("sum_sq"))
      .head()
    val nBlocks = stats.getLong(0)
    val nRows = stats.getLong(1)
    val maxB = stats.getLong(2)
    val sumSq = stats.getLong(4)
    println(s"n_blocks=$nBlocks n_rows=$nRows max_block=$maxB " +
      f"avg_block=${stats.getDouble(3)}%.1f candidate_pairs(sum|b|^2)=$sumSq " +
      s"pairs_at_10x=${sumSq * 100} (block count fixed => quadratic)")

    println("=== same key + p_size refinement (the finer dial) ===")
    val fine = part.groupBy(blk.as("__blk"), col("p_size"))
      .agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("n_blocks"), max(col("n")).as("max_block"),
        sum(col("n") * col("n")).as("sum_sq"))
      .head()
    println(s"n_blocks=${fine.getLong(0)} max_block=${fine.getLong(1)} " +
      s"candidate_pairs=${fine.getLong(2)}")
    spark.stop()
  }
}
