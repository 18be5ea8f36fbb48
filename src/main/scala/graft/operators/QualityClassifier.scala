package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * T63 (r15): model-based quality classification — the filtering
 * stage every modern LLM corpus actually ships (GPT-3's LR filter,
 * CCNet/fastText, FineWeb-Edu): hand heuristics label a seed set,
 * a LINEAR classifier distills them, and the model's margin —
 * smoother and cheaper than the heuristic ensemble — gates the
 * corpus. This implementation is the deterministic BATCH perceptron
 * over hashed token buckets: every quantity is an exact integer
 * (counts, weights, margins), so the whole training trajectory
 * replays bit-identically in the oracle as unrolled per-epoch
 * aggregates — no learning-rate float, no sample order, no RNG.
 *
 * FEATURES: token t lands in bucket md5-uniform(t) mod `buckets`
 * (the q288 draw reused as a feature hash — the fastText hashing
 * trick); x[d, b] = token count. LABEL (the heuristic being
 * distilled, declared as data): y = +1 iff the document contains at
 * least `minHits` tokens from the `stopwords` list, else −1 — the
 * classic function-word fluency dial (swap in any integer heuristic;
 * the oracle replays it as a conditional sum).
 *
 * TRAINING (batch perceptron, epochs unrolled): entering epoch e
 * with integer weights w and bias β, margin_d = β + Σ_b w[b]·x[d,b];
 * document d is misclassified iff y_d·margin_d ≤ 0 (ties count as
 * errors — epoch 1 under w = 0 updates on EVERY document, the
 * perceptron convention); the epoch's update is the exact integer
 * batch sum w[b] += Σ_mis y_d·x[d,b], β += Σ_mis y_d. Batch (not
 * stochastic) updates make the trajectory order-free — the property
 * that buys exact cross-engine replay; the cost is slower
 * convergence per pass, priced by the per-epoch error trace.
 *
 * MAGNITUDE BOUND (ANSI throws, never corrupts): |w[b]| grows by at
 * most the corpus token count per epoch, margins by doc_len·|w|, and
 * the checksum by `buckets`·|w| — at 10⁹ docs × 10³ tokens × 4
 * epochs every intermediate stays under ~10¹⁸ < 2⁶³.
 *
 * Scale: the (doc, bucket) design matrix is EPOCH-INVARIANT (labels
 * and counts never depend on the weights), so it is built ONCE and
 * Barrier-materialized; each epoch is then one margin window over
 * the materialized matrix plus ONE combined aggregate whose output
 * is the BOUNDED weight table + the (errors, bias-delta) pair
 * (≤ `buckets` rows — the only thing the driver ever holds). The
 * matrix is ≤ min(distinct tokens, buckets) counts per doc — always
 * SMALLER than the text it summarizes, so materializing it beats the
 * r15 shape (2·epochs+1 full tokenize+explode re-scans; measured
 * 6.5 s → the r16 number at sf0.1, identical trajectory).
 */
object QualityClassifier {

  /** One epoch of the trace: errors measured ENTERING the epoch
    * (under the weights the epoch starts with), weights state AFTER
    * its update. `wDot` = Σ w[b]·(b+1) — an exact integer checksum
    * pinning the whole weight vector in one column. */
  final case class EpochStat(
      epoch: Int, nDocs: Long, nMis: Long, biasAfter: Long,
      wL1After: Long, wDotAfter: Long)

  final case class Trained(
      weights: Array[Long], bias: Long, trace: Seq[EpochStat])

  /** The q288 md5-uniform reused as the feature hash: bucket(t) =
    * uniform(t) mod buckets. */
  private def bucketOf(word: Column, buckets: Int): Column =
    pmod(
      coalesce(
        conv(substring(md5(word), 1, 7), 16, 10).cast("long"),
        lit(0L)),
      lit(buckets.toLong))

  /** (idCol, y, bucket, cnt) — the sparse integer design matrix with
    * the heuristic label attached; one scan, one partial-aggregated
    * shuffle. Documents with no tokens drop (no features, no label —
    * mirrored by the oracle's group-over-tokens). */
  private def designMatrix(
      docs: DataFrame, idCol: String, textCol: String, buckets: Int,
      stopwords: Seq[String], minHits: Int): DataFrame = {
    val tok = docs
      .where(col(textCol).isNotNull)
      .select(col(idCol),
        explode(split(lower(col(textCol)), "\\s+")).as("__w"))
      .where(col("__w") =!= "")
    val lab = tok.groupBy(col(idCol))
      .agg((when(
        sum(when(col("__w").isInCollection(stopwords), 1L)
          .otherwise(0L)) >= minHits, 1L)
        .otherwise(-1L)).as("__y"))
    tok
      .select(col(idCol), bucketOf(col("__w"), buckets).as("__b"))
      .groupBy(col(idCol), col("__b"))
      .agg(count(lit(1)).as("__c"))
      .join(lab, Seq(idCol))
  }

  /** Margin column for the current integer weights: β +
    * Σ w[b]·cnt over the doc's buckets (a window on the doc key). */
  private def marginOver(
      dm: DataFrame, idCol: String, w: Array[Long],
      bias: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wArr = typedlit(w.toSeq)
    dm.withColumn("__m",
      lit(bias) + sum(
        element_at(wArr, (col("__b") + 1).cast("int")) * col("__c"))
        .over(Window.partitionBy(col(idCol))))
  }

  /**
   * Train the batch perceptron. Returns exact integer weights, bias,
   * and the per-epoch trace.
   */
  def train(
      docs: DataFrame, idCol: String, textCol: String,
      buckets: Int = 256, epochs: Int = 4,
      stopwords: Seq[String], minHits: Int = 2): Trained = {
    require(buckets >= 2 && buckets <= 65536,
      s"buckets must be in [2, 65536], got $buckets")
    require(epochs >= 1 && epochs <= 16,
      s"epochs must be in [1, 16], got $epochs")
    require(stopwords.nonEmpty, "need a non-empty stopword heuristic")
    require(minHits >= 1, s"minHits must be >= 1, got $minHits")
    val w = new Array[Long](buckets)
    var bias = 0L
    val trace = scala.collection.mutable.ArrayBuffer.empty[EpochStat]
    // the design matrix does not depend on the weights — build it
    // once, Barrier-materialize, and run every epoch (and the nDocs
    // count) over the materialized rows: the r15 shape re-ran the
    // tokenize+explode+aggregate pipeline 2·epochs+1 times (two
    // actions per epoch, each recomputing the full lineage)
    val dm = Barrier.barrier(
      designMatrix(docs, idCol, textCol, buckets, stopwords, minHits))
    val nDocs = dm.select(col(idCol)).distinct().count()
    var e = 1
    while (e <= epochs) {
      import org.apache.spark.sql.expressions.Window
      val mis = marginOver(dm, idCol, w, bias)
        .where(col("__y") * col("__m") <= 0L)
      // ONE bounded aggregate per epoch (≤ buckets rows — the
      // bounded driver contract): per-bucket update sums, plus the
      // (error count, bias delta) doc-level pair carried on a
      // one-row-per-doc marker (row_number over the SAME doc-key
      // partitioning the margin window already established — no
      // extra exchange), all exact longs; Σ over the collected rows
      // reproduces the r15 two-aggregate values identically
      val rows = mis
        .withColumn("__first",
          row_number().over(
            Window.partitionBy(col(idCol)).orderBy(col("__b"))) === 1)
        .groupBy(col("__b"))
        .agg(sum(col("__y") * col("__c")).as("__dw"),
          sum(when(col("__first"), 1L).otherwise(0L)).as("__nd"),
          sum(when(col("__first"), col("__y")).otherwise(0L)).as("__ys"))
        .collect()
      rows.foreach { r =>
        w(r.getLong(0).toInt) += r.getLong(1)
      }
      val nMis = rows.map(_.getLong(2)).sum
      bias += rows.map(_.getLong(3)).sum
      trace += EpochStat(e, nDocs, nMis, bias,
        w.map(math.abs).sum,
        w.zipWithIndex.map { case (v, i) => v * (i + 1L) }.sum)
      e += 1
    }
    Barrier.free(dm)
    Trained(w, bias, trace.toSeq)
  }

  /** The trace as a DataFrame: (epoch, n_docs, n_misclassified,
    * bias_after, w_l1_after, w_checksum_after) — exact integers. */
  def traceTable(spark: SparkSession, t: Trained): DataFrame = {
    import spark.implicits._
    t.trace
      .map(s => (s.epoch, s.nDocs, s.nMis, s.biasAfter, s.wL1After,
        s.wDotAfter))
      .toDF("epoch", "n_docs", "n_misclassified", "bias_after",
        "w_l1_after", "w_checksum_after")
  }

  /**
   * Apply the trained model and read its fidelity to the heuristic:
   * per (y_true, y_pred) cell the document count and the exact
   * integer margin sum (margin 0 predicts −1 — the training tie
   * rule). The distillation readout: how faithfully the smooth
   * margin reproduces the rule it was trained on.
   */
  def confusion(
      docs: DataFrame, idCol: String, textCol: String, t: Trained,
      stopwords: Seq[String], minHits: Int = 2): DataFrame = {
    val buckets = t.weights.length
    val dm = designMatrix(docs, idCol, textCol, buckets,
      stopwords, minHits)
    marginOver(dm, idCol, t.weights, t.bias)
      .select(col(idCol), col("__y"), col("__m")).distinct()
      .select(col("__y").as("y_true"),
        when(col("__m") > 0L, 1L).otherwise(-1L).as("y_pred"),
        col("__m"))
      .groupBy("y_true", "y_pred")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__m")).as("margin_sum"))
      .orderBy("y_true", "y_pred")
  }
}
