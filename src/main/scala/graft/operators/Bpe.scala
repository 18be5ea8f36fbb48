package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import Barrier.barrier

/**
 * Byte-pair-encoding merge training — the map-reduce formulation of
 * the tokenizer-training loop every LLM data pipeline runs before
 * anything else (Sennrich et al. 2016; the GPT-2/BPE variant minus
 * byte-fallback). Each round counts all adjacent symbol pairs across
 * the corpus weighted by word frequency, merges the most frequent
 * pair everywhere, and records it; the ordered merge list IS the
 * tokenizer.
 *
 * Distribution shape (the part that matters at 100 TB): the corpus
 * is touched ONCE — one explode+groupBy shuffle builds the distinct
 * word/frequency vocab, which is Heaps'-law bounded (millions of
 * rows for a trillion-token corpus) and everything iterative runs on
 * that vocab table. Each merge round is one explode+partial-agg
 * exchange over the vocab plus a single-row `limit(1).collect()`
 * argmax (the bounded driver round-trip contract the k-means/PCA
 * family documents), then a narrow codegen'd `replace` projection.
 * `localCheckpoint` every few rounds bounds lineage depth the same
 * way [[Graph.pageRank]] bounds its iteration chain. Real trainers
 * add an incremental-recount optimization (only words containing
 * the merged pair recount); the full recount keeps every round a
 * plain scan over the bounded vocab and stays exchange-minimal.
 *
 * Reproducibility contract (the DuckDB replay gate): symbol
 * sequences render as strings — each word as
 * `" c1  c2  …  cN "` (double-space separated, single-space
 * sentinels) — and a merge of pair (l, r) is the literal
 * left-to-right non-overlapping `replace(" l  r " → " lr ")`.
 * Java's `String.replace`, Spark's codegen'd `StringReplace` and
 * DuckDB's `replace` all share those exact semantics, and on runs of
 * identical symbols the leftmost-greedy scan is precisely BPE's
 * merge order (" a  a  a  a " → " aa  aa ", " a  a  a " →
 * " aa  a " — verified in BpeSpec). The double-space gap means a
 * pair pattern can never straddle a symbol boundary (" al  r "
 * cannot match pattern " l  r "). Adjacent pairs COUNT overlapping
 * occurrences (positions i,i+1 for every i), as standard BPE does.
 * Argmax ties break (count desc, lhs asc, rhs asc) — binary string
 * order on both engines. Every arithmetic step is integer; nothing
 * floats until a caller divides.
 *
 * Tokenization into words is whitespace `\s+` — the portable
 * stand-in the rest of the text family uses. Symbols are characters
 * (no end-of-word marker; documented variant), ASCII/BMP contract
 * like the rest of the corpus surface.
 */
object Bpe {

  /** One learned merge: 1-based rank, the two symbols merged, and
    * the frequency-weighted adjacent-pair count that won the round. */
  final case class Merge(rank: Int, lhs: String, rhs: String,
      pairCount: Long)

  /** A trained tokenizer: the ordered merge table (driver-side,
    * `numMerges`-bounded — the model contract) plus the final
    * per-word symbolization `(word, sym, freq)` as a DataFrame (the
    * encode dictionary; stays distributed, Heaps'-law bounded). */
  final case class Model(merges: Seq[Merge], vocab: DataFrame)

  /** `" c1  c2  …  cN "` initial character symbolization. */
  private[operators] def initialSymbols(word: Column): Column =
    concat(lit(" "), array_join(split(word, ""), "  "), lit(" "))

  /** Distinct words with corpus frequencies — the one corpus-sized
    * shuffle of the whole training run. */
  def wordVocab(corpus: DataFrame, textCol: String): DataFrame =
    corpus
      .select(explode(split(col(textCol), "\\s+")).as("word"))
      .where(col("word") =!= "")
      .groupBy("word")
      .agg(count(lit(1)).as("freq"))

  /** Frequency-weighted adjacent-pair counts over the current
    * symbolization — overlapping occurrences count, map-side partial
    * aggregation does the heavy lifting before the one exchange. */
  private def adjacentPairCounts(vocab: DataFrame): DataFrame =
    vocab
      .select(col("freq"), split(trim(col("sym")), "  ").as("toks"))
      .select(col("freq"), col("toks"),
        posexplode(col("toks")).as(Seq("i", "lhs")))
      .where(col("i") < size(col("toks")) - 1)
      .select(col("freq"), col("lhs"),
        element_at(col("toks"), col("i") + lit(2)).as("rhs"))
      .groupBy("lhs", "rhs")
      .agg(sum(col("freq")).as("cnt"))

  /**
   * Train `numMerges` BPE merges over `textCol`'s whitespace words.
   * Stops early only if the corpus runs out of adjacent pairs (every
   * word fully merged to one symbol). Deterministic: argmax ties
   * break (count desc, lhs, rhs), so the same corpus always yields
   * the same merge table on any partitioning — each round's winner
   * is a function of exact integer counts, never of fold order.
   */
  def train(corpus: DataFrame, textCol: String, numMerges: Int,
      checkpointEvery: Int = 4): Model = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    require(checkpointEvery >= 1,
      s"checkpointEvery must be >= 1, got $checkpointEvery")
    // Round barriers ride the shared [[Barrier]] contract: reliable
    // checkpoint() when the caller set a checkpoint dir (a 32k-merge
    // production run survives executor loss), localCheckpoint()
    // otherwise (the local[32]/test fast path). Superseded round
    // state is freed once the next barrier has materialized.
    var vocab = barrier(wordVocab(corpus, textCol)
      .select(col("word"), initialSymbols(col("word")).as("sym"),
        col("freq")))
    var lastBarrier = vocab
    val merges = ArrayBuffer.empty[Merge]
    var r = 1
    var exhausted = false
    while (r <= numMerges && !exhausted) {
      // Bounded driver round-trip: exactly one (lhs, rhs, cnt) row.
      val best = adjacentPairCounts(vocab)
        .orderBy(col("cnt").desc, col("lhs").asc, col("rhs").asc)
        .limit(1)
        .collect()
      if (best.isEmpty) exhausted = true
      else {
        val l = best(0).getString(0)
        val rr = best(0).getString(1)
        val c = best(0).getLong(2)
        merges += Merge(r, l, rr, c)
        vocab = vocab.withColumn("sym",
          replace(col("sym"), lit(s" $l  $rr "), lit(s" $l$rr ")))
        if (r % checkpointEvery == 0) {
          vocab = barrier(vocab)
          Barrier.free(lastBarrier)
          lastBarrier = vocab
        }
        r += 1
      }
    }
    Model(merges.toSeq, vocab)
  }

  /**
   * Batched BPE training — EXACTLY the same merge table as [[train]]
   * (parity is both spec- and driver-gated: q262 runs this against
   * the SEQUENTIAL replay oracle), in fewer Spark rounds. [[train]]
   * is one full pair-count shuffle + one driver round-trip PER MERGE
   * — fine at a gate's 12 merges, but a production 32k-merge vocab
   * would serialize 32k Spark jobs. Standard distributed-BPE batching
   * merges several pairs per count; done naively that DIVERGES from
   * sequential BPE, so each round here accepts the longest prefix of
   * the sorted candidate list that sequential BPE provably picks in
   * that exact order:
   *
   *   - prefix rule: stop at the first rejected candidate (a
   *     rejected pair may still be the true next argmax);
   *   - disjointness: a candidate's symbols must not appear in any
   *     previously accepted pair or its concatenation — then earlier
   *     accepted merges can neither destroy nor create occurrences
   *     of the candidate (patterns can't overlap without a shared
   *     symbol, and the double-space rendering prevents boundary
   *     straddles), so its count is still exact;
   *   - new-pair dominance: a merge (l, r) mints symbol `lr`, whose
   *     adjacent pairs are NEW and unseen in the round's table. Each
   *     occurrence of a new pair (x, lr) consumed an occurrence of
   *     (x, l), and (lr, y) one of (r, y), so start-table maxima
   *     M(l,r) = max(maxₓ cnt(x, l), max_y cnt(r, y)) bound every
   *     new-pair count (including pairs of two minted symbols, via
   *     their inner (r_k, l_j) occurrence). A candidate is accepted
   *     only if its count STRICTLY exceeds every accepted M — no new
   *     pair can out-rank it, under any tie-break.
   *
   * Counts only ever decrease for surviving pairs, so the accepted
   * prefix order (count desc, lhs, rhs — the sequential tie-break)
   * is the sequential pick order. Cost per round: the pair-count
   * shuffle evaluated twice (top-K + the ≤2K-row maxima aggregate,
   * both bounded collects) against ≥1 accepted merges — a win
   * whenever rounds average ≥2 accepted, and never wrong when they
   * don't. Natural-text top pairs share letters, so realized batch
   * sizes are modest (2–4 on the gate corpus); the guard trades peak
   * speedup for exactness.
   *
   * Returns the model plus the realized round count (≤ numMerges;
   * = ceil(numMerges / batchSize) when every batch fills).
   */
  def trainBatched(corpus: DataFrame, textCol: String, numMerges: Int,
      batchSize: Int = 8, checkpointEvery: Int = 4): (Model, Int) = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    require(checkpointEvery >= 1,
      s"checkpointEvery must be >= 1, got $checkpointEvery")
    // Same [[Barrier]] durability contract as [[train]].
    var vocab = barrier(wordVocab(corpus, textCol)
      .select(col("word"), initialSymbols(col("word")).as("sym"),
        col("freq")))
    var lastBarrier = vocab
    val merges = ArrayBuffer.empty[Merge]
    var round = 0
    var exhausted = false
    while (merges.size < numMerges && !exhausted) {
      val want = math.min(batchSize, numMerges - merges.size)
      // No persist: the pair table is consumed three times WITHIN the
      // single union job below, and its groupBy exchange is shared by
      // the consumers — a cache build + unpersist round-trip cost
      // more than the recompute at every scale tested (r16).
      val pc = adjacentPairCounts(vocab)
      // Bounded driver round-trip: `want` candidate rows + ≤2·want
      // maxima rows, all in ONE union job (r16 optimization — the
      // r15 shape ran three sequential collects per round, and with
      // remint-heavy corpora forcing small batches the per-job
      // overhead dominated: q299 measured 5.4 s for ~10 tiny
      // rounds); the pair table itself never leaves the cluster.
      // maxIn/maxOut join against the top-K subplan's own symbol
      // sets — row-for-row the isin(candL)/isin(candR) filters of
      // the three-collect shape.
      val topk = pc
        .orderBy(col("cnt").desc, col("lhs").asc, col("rhs").asc)
        .limit(want)
      val batchRows = topk
        .select(lit(0).as("__tag"), col("lhs"), col("rhs"), col("cnt"))
        .unionAll(pc.join(
            topk.select(col("lhs").as("__sym")).distinct(),
            col("rhs") === col("__sym"), "left_semi")
          .groupBy(col("rhs")).agg(max(col("cnt")).as("m"))
          .select(lit(1).as("__tag"), col("rhs").as("lhs"),
            lit(null).cast("string").as("rhs"), col("m").as("cnt")))
        .unionAll(pc.join(
            topk.select(col("rhs").as("__sym")).distinct(),
            col("lhs") === col("__sym"), "left_semi")
          .groupBy(col("lhs")).agg(max(col("cnt")).as("m"))
          .select(lit(2).as("__tag"), col("lhs"),
            lit(null).cast("string").as("rhs"), col("m").as("cnt")))
        .collect()
      val cand = batchRows.filter(_.getInt(0) == 0)
        .map(r => (r.getString(1), r.getString(2), r.getLong(3)))
        .sortBy(c => (-c._3, c._1, c._2))
      if (cand.isEmpty) exhausted = true
      else {
        val maxIn = batchRows.filter(_.getInt(0) == 1)
          .map(r => r.getString(1) -> r.getLong(3)).toMap
        val maxOut = batchRows.filter(_.getInt(0) == 2)
          .map(r => r.getString(1) -> r.getLong(3)).toMap
        val used = scala.collection.mutable.Set.empty[String]
        // Symbols that ALREADY exist when a candidate would mint them
        // again — from any prior round's merge or earlier in this
        // batch. The new-pair dominance bound assumes pairs touching
        // the minted symbol are NEW (count = created occurrences
        // only); when `l + r` already lives in the vocab, merging
        // ADDS to existing (x, lr)/(lr, y) counts, so a LATER
        // candidate could be out-ranked by a pair the bound never
        // saw. A re-minting candidate is itself exact (disjointness
        // still protects its own count), so it may be accepted — but
        // it must TERMINATE the batch: the next recount then sees
        // the combined counts exactly, as sequential BPE does.
        val minted = scala.collection.mutable.Set(
          merges.map(m => m.lhs + m.rhs).toSeq: _*)
        val accepted = ArrayBuffer.empty[(String, String, Long)]
        var mb = Long.MinValue
        var stopped = false
        cand.foreach { case (l, r, c) =>
          if (!stopped) {
            val ok = accepted.isEmpty ||
              (!used(l) && !used(r) && c > mb)
            if (!ok) stopped = true
            else {
              accepted += ((l, r, c))
              if (minted(l + r)) stopped = true
              minted += l + r
              used ++= Seq(l, r, l + r)
              mb = math.max(mb, math.max(
                maxIn.getOrElse(l, Long.MinValue),
                maxOut.getOrElse(r, Long.MinValue)))
            }
          }
        }
        accepted.foreach { case (l, r, c) =>
          merges += Merge(merges.size + 1, l, r, c)
        }
        val newSym = accepted.foldLeft(col("sym")) {
          case (e, (l, r, _)) =>
            replace(e, lit(s" $l  $r "), lit(s" $l$r "))
        }
        vocab = vocab.withColumn("sym", newSym)
        round += 1
        if (round % checkpointEvery == 0) {
          vocab = barrier(vocab)
          Barrier.free(lastBarrier)
          lastBarrier = vocab
        }
      }
    }
    (Model(merges.toSeq, vocab), round)
  }

  /** The merge table as a DataFrame `(rank, lhs, rhs, pair_count)` —
    * the oracle-gated rendering of a trained model. */
  def mergeTable(spark: org.apache.spark.sql.SparkSession,
      model: Model): DataFrame = {
    import spark.implicits._
    model.merges.map(m => (m.rank, m.lhs, m.rhs, m.pairCount))
      .toDF("rank", "lhs", "rhs", "pair_count")
  }

  /**
   * Per-document tokenization report against a trained model:
   * `(idCol, n_words, n_chars, n_tokens, compression)` where
   * `compression = chars per token` (≥ 1 by construction — merges
   * only ever shrink). Encoding is a dictionary JOIN, not a re-merge:
   * the trained vocab already carries every word's final
   * symbolization, so the corpus-sized side does one equi-join
   * against the Heaps'-bounded dictionary (AQE broadcasts it when
   * small — never forced, the dictionary can be millions of rows) and
   * one groupBy. A word absent from the dictionary falls back to its
   * un-merged character count — the conservative OOV behavior; exact
   * whenever the report corpus is the training corpus (the gated
   * configuration). Documents with zero whitespace tokens have no
   * word rows and are absent from the report.
   */
  def encodeReport(corpus: DataFrame, idCol: String, textCol: String,
      model: Model): DataFrame = {
    val words = corpus
      .select(col(idCol), explode(split(col(textCol), "\\s+")).as("word"))
      .where(col("word") =!= "")
    val dict = model.vocab.select(col("word"),
      size(split(trim(col("sym")), "  ")).cast("long").as("__tok"))
    words
      .join(dict, Seq("word"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_words"),
        sum(length(col("word")).cast("long")).as("n_chars"),
        sum(coalesce(col("__tok"), length(col("word")).cast("long")))
          .as("n_tokens"))
      .select(col(idCol), col("n_words"), col("n_chars"),
        col("n_tokens"),
        // floor grid, not round(6): the long/long quotient is the
        // same IEEE double on every engine, and floor(x·1e6)/1e6 has
        // no decimal tie to break (the q163 cross-engine rule).
        (floor(col("n_chars").cast("double")
            / col("n_tokens").cast("double") * lit(1000000.0))
          / lit(1000000.0)).as("compression"))
  }
}
