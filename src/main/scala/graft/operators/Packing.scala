package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Training-sequence packing: map every document onto the fixed-size
 * context windows of a GPT-style pretraining run. The standard
 * recipe (concat-and-chunk: concatenate all documents of a shard in
 * a deterministic order, then cut the token stream into consecutive
 * `budget`-token windows) is pure index arithmetic over a running
 * token count — no bin-packing recurrence, no sequential state —
 * which makes it both embarrassingly parallel AND oracle-checkable.
 *
 * Per document the operator reports its half-open global token span
 * [tok_start, tok_end) within its shard's stream and the first/last
 * chunk ids that span covers: `chunk_first = tok_start / budget`,
 * `chunk_last = (tok_end - 1) / budget`, `n_chunks = last - first
 * + 1`. `n_chunks > 1` flags documents a training run would split
 * across context windows — the attention-boundary accounting every
 * packing-efficiency report needs (cf. the "document packing"
 * analyses in GPT-3 App. B and T5 §3.1.2: what fraction of examples
 * contain a document boundary).
 *
 * Scale: one window pass partitioned by shard (`groupCol`) — the
 * cumulative sum never crosses shards, so parallelism is the shard
 * count and per-task state is one running long. Token counts ride
 * the scan projection (`size(split(...))`, whole-stage codegen).
 * At 100 TB the shard key is the corpus's write-partition key, so
 * the window reuses the layout partitioning and the pass is
 * exchange-free; a single global stream instead would need the K12
 * two-level ordinal ([[Ordinals.withOrdinals]]) — deliberately not
 * the default, because real pretraining shards ARE independent
 * streams.
 *
 * Tokenization is whitespace `split` — the same portable stand-in
 * the rest of the text family uses (oracle: `len(string_split)`).
 */
object Packing {

  /**
   * One row per document: (groupCol, idCol, n_tokens, tok_start,
   * chunk_first, chunk_last, n_chunks), with documents ordered by
   * `idCol` within each `groupCol` shard and chunks of exactly
   * `budget` tokens cut from each shard's concatenated stream.
   *
   * CONTRACT (enforced): `idCol` must be unique within each shard.
   * Duplicate ids are ORDER BY peers of the cumulative-sum's RANGE
   * frame, so they would share one cumulative total — overlapping
   * spans, with an equal-sized token range attributed to no document.
   * Rather than corrupt silently, a peer-count guard (RANGE CURRENT
   * ROW frame over the SAME window spec — no extra exchange) throws
   * on the first duplicate, mirroring the fail-fast uniqueness
   * require in [[Layout.interleavedShardWrite]].
   */
  def concatChunks(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      textCol: String,
      budget: Int): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    val w = Window.partitionBy(col(groupCol)).orderBy(col(idCol))
    // Peers of the RANGE CURRENT ROW frame = rows sharing this row's
    // idCol — exactly the duplicates the contract forbids. Evaluated
    // in the same WindowExec as the cumulative sum.
    val wPeer = Window.partitionBy(col(groupCol)).orderBy(col(idCol))
      .rangeBetween(Window.currentRow, Window.currentRow)
    val dupGuard = assert_true(
      count(lit(1)).over(wPeer) === 1,
      concat(lit(s"Packing.concatChunks: duplicate $idCol '"),
        col(idCol).cast("string"),
        lit(s"' within a $groupCol shard — token spans would overlap")))
    // NULL text contributes 0 tokens (a bare size(split(NULL)) would
    // return -1 and silently corrupt every downstream span)
    val nTokens = when(col(textCol).isNotNull,
      size(split(col(textCol), " "))).otherwise(lit(0)).cast("long")
    def chunkOf(tok: Column): Column =
      floor(tok / lit(budget.toLong)).cast("long")
    df
      .select(col(groupCol), col(idCol), nTokens.as("n_tokens"))
      .withColumn("__cum", sum(col("n_tokens")).over(w))
      .select(
        col(groupCol), col(idCol), col("n_tokens"),
        // assert_true yields NULL when the guard holds, so the `when`
        // passes tok_start through untouched — but keeps the guard
        // load-bearing (an unused projection would be pruned away).
        when(dupGuard.isNull, col("__cum") - col("n_tokens"))
          .as("tok_start"),
        chunkOf(col("__cum") - col("n_tokens")).as("chunk_first"),
        // zero-token docs span NO chunks: pin chunk_last to the
        // cursor's chunk uniformly (the raw (cum-1)/budget would go
        // negative / off-by-one-chunk when the cursor sits exactly
        // on a boundary) and report n_chunks = 0
        when(col("n_tokens") === 0,
            chunkOf(col("__cum") - col("n_tokens")))
          .otherwise(chunkOf(col("__cum") - 1)).as("chunk_last"))
      .withColumn(
        "n_chunks",
        when(col("n_tokens") === 0, lit(0L))
          .otherwise(col("chunk_last") - col("chunk_first") + lit(1L)))
  }

  /**
   * Per-shard packing-efficiency report over [[concatChunks]]:
   * total tokens, number of `budget`-token chunks the shard fills
   * (`ceil(total/budget)`), tail padding wasted in the last chunk,
   * and how many documents straddle a chunk boundary. The go/no-go
   * numbers for choosing `budget` against a corpus's document-length
   * distribution.
   */
  def packingReport(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      textCol: String,
      budget: Int): DataFrame = {
    concatChunks(df, groupCol, idCol, textCol, budget)
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(when(col("n_chunks") > 1, 1L).otherwise(0L))
          .as("split_docs"))
      .select(
        col(groupCol), col("n_docs"), col("total_tokens"),
        // exact integer ceil-division — the double ceil(total/budget)
        // under-counts by one chunk once total ≳ 2⁵³/budget·budget
        // (1/budget < ulp of the quotient); `div` is long floor
        // division, exact at any total
        expr(s"(total_tokens + ${budget - 1}) div $budget")
          .as("n_chunks"),
        (expr(s"(total_tokens + ${budget - 1}) div $budget")
          * budget - col("total_tokens")).as("pad_tokens"),
        col("split_docs"))
  }
}
