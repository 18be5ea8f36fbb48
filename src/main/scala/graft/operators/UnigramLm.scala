package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import Barrier.barrier

/**
 * T60 (r14): unigram-LM tokenizer trainer — the SentencePiece-style
 * EM/pruning complement of [[Bpe]] (Kudo 2018, "Subword
 * Regularization"): where BPE GROWS a vocabulary bottom-up by
 * merging, the unigram LM starts from an over-complete substring
 * seed and SHRINKS it by likelihood — the model most modern LM
 * tokenizers actually ship. This implementation is the
 * deterministic hard-EM (Viterbi) variant: the E-step segments every
 * vocabulary word by its single best piece decomposition, the M-step
 * re-estimates piece probabilities from those segmentations, and
 * unused pieces drop out; Viterbi-EM is coordinate ascent on the
 * Viterbi likelihood, so the trace is monotone by construction, and
 * an explicit accept gate (the Louvain/q318 discipline) stops on the
 * first non-improving round so 6-dp rounding slop can never smuggle
 * a worse model through.
 *
 * ENGINE-EXACT arithmetic (the q190/q267 disciplines): piece
 * log-probs are round(ln(count/total), 6) DECIMAL(18,6) — computed
 * by the ENGINE's ln on identical doubles, then carried as exact
 * integer MICRO units (×10⁶ longs), so every Viterbi sum, tie
 * compare, and corpus log-likelihood is exact long arithmetic with
 * zero fold-order hazard; the one per-value ln-rounding exposure is
 * the documented ~1e-9 tie probability. Viterbi ties break (score
 * max, then LONGER piece at the current position) — total, and on
 * exact longs engine-independent. Magnitude bound: |score| ≤
 * maxWordLen·|min logp| ≈ 12·20·10⁶, and Σ freq·score stays far
 * under 2⁶³ at any realistic corpus (ANSI throws, never corrupts).
 *
 * TRAINING REGIME (all documented, all mirrored by the oracle):
 * words LONGER than `maxWordLen` are excluded from training (the
 * audioSpectralProbe fixed-size-basis rule — the unrolled replay
 * needs a bounded DP); seed = every corpus CHARACTER plus the top
 * `multiKeep` substrings of length 2..`seedMaxPieceLen` with
 * frequency-weighted occurrence count ≥ `minCount`, ranked
 * (count desc, piece asc); pieces whose Viterbi count hits zero drop
 * from the model (safe during training: every word's accepted path
 * only uses pieces with positive counts, so reachability is
 * preserved — apply-time encoding of UNSEEN text still needs a char
 * fallback, which is the encoder's concern, not the trainer's).
 *
 * Scale: one corpus-sized shuffle (the [[Bpe.wordVocab]] word/freq
 * table, Heaps'-law bounded); seeding is one explode+partial-agg
 * exchange over that vocab; each EM round is one shuffle-free
 * mapPartitions segmentation against the BROADCAST piece table
 * (model-bounded literals — the k-means/BPE driver-loop contract),
 * one partial-aggregated piece-count exchange, and one single-row
 * log-likelihood aggregate; the driver only ever holds the piece
 * table (≤ alphabet + multiKeep rows) and the one LL scalar per
 * round. Rounds barrier via the shared [[Barrier]] contract.
 */
object UnigramLm {

  /** One model piece: the surface string, its count under the
    * current segmentation (seed occurrence count in round 1), and
    * its log-prob in exact micro units (round(ln(p),6)·10⁶). */
  final case class Piece(piece: String, count: Long, logpMicro: Long)

  /** One accepted round: 1-based round, model size entering the
    * round, and the exact corpus Viterbi log-likelihood in micro
    * units (Σ freq · best-path score). */
  final case class Round(round: Int, nPieces: Int, llMicro: Long)

  /** A trained tokenizer: final accepted pieces (ranked by count
    * desc, piece asc) and the accepted-round trace. */
  final case class Model(pieces: Seq[Piece], trace: Seq[Round])

  private val dec = DecimalType(18, 6)

  /** Engine-ln scores for a bounded piece-count table: logp =
    * round(ln(cnt/total), 6) as exact micro longs. Runs as ONE tiny
    * Spark job so the ln comes from the same engine function the
    * oracle's DuckDB ln mirrors at 6 dp (q190 rule). */
  private def scorePieces(
      spark: SparkSession, counts: Seq[(String, Long)]): Seq[Piece] = {
    import spark.implicits._
    val total = counts.map(_._2).sum
    counts.toDF("piece", "cnt")
      .select(col("piece"), col("cnt"),
        (round(log(col("cnt").cast("double") / lit(total.toDouble)), 6)
          .cast(dec) * lit(1000000)).cast("long").as("lp"))
      .as[(String, Long, Long)].collect()
      .map { case (p, c, lp) => Piece(p, c, lp) }
      .sortBy(p => (-p.count, p.piece))
  }

  /** Viterbi DP over one word against the piece map: returns
    * (bestScoreMicro, pieces on the best path). Ties prefer the
    * LONGER piece at each position (resolved right-to-left in the
    * backtrack, matching the oracle's per-position argmax). */
  private[graft] def viterbi(
      word: String, maxPieceLen: Int,
      lp: scala.collection.Map[String, Long]): Option[(Long, List[String])] = {
    val n = word.length
    val best = Array.fill[Long](n + 1)(Long.MinValue)
    val bl = new Array[Int](n + 1)
    best(0) = 0L
    var i = 1
    while (i <= n) {
      var l = 1
      while (l <= math.min(maxPieceLen, i)) {
        if (best(i - l) != Long.MinValue) {
          lp.get(word.substring(i - l, i)) match {
            case Some(s) =>
              val cand = best(i - l) + s
              // strict > keeps the first (SMALLEST l) winner, so
              // prefer-longer needs >=; ties on exact longs resolve
              // to the larger l exactly as the oracle's
              // (score DESC, l DESC) row_number.
              if (cand > best(i) || (cand == best(i) && l > bl(i))) {
                best(i) = cand; bl(i) = l
              }
            case None => ()
          }
        }
        l += 1
      }
      i += 1
    }
    if (best(n) == Long.MinValue) None
    else {
      var pos = n
      var acc = List.empty[String]
      while (pos > 0) {
        val l = bl(pos)
        acc = word.substring(pos - l, pos) :: acc
        pos -= l
      }
      Some((best(n), acc))
    }
  }

  /**
   * Train a unigram-LM piece vocabulary over `textCol`'s whitespace
   * words. `rounds` Viterbi-EM rounds with the strict-improvement
   * accept gate; returns the last ACCEPTED model and the trace.
   */
  def train(
      corpus: DataFrame, textCol: String,
      seedMaxPieceLen: Int = 4, multiKeep: Int = 24,
      maxWordLen: Int = 12, minCount: Long = 2L,
      rounds: Int = 3): Model = {
    require(seedMaxPieceLen >= 2,
      s"seedMaxPieceLen must be >= 2, got $seedMaxPieceLen")
    require(multiKeep >= 1, s"multiKeep must be >= 1, got $multiKeep")
    require(maxWordLen >= seedMaxPieceLen,
      s"maxWordLen must be >= seedMaxPieceLen, got $maxWordLen")
    require(minCount >= 1L, s"minCount must be >= 1, got $minCount")
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val spark = corpus.sparkSession
    import spark.implicits._
    val vocab = barrier(
      Bpe.wordVocab(corpus, textCol)
        .where(length(col("word")) <= maxWordLen))
    // Seed counts: one explode+partial-agg exchange. Chars are the
    // coverage floor (all kept); multi-char substrings compete for
    // the top multiKeep slots.
    val sub = vocab.select(col("freq"), col("word"),
        explode(sequence(lit(1), lit(seedMaxPieceLen))).as("l"))
      .where(length(col("word")) >= col("l"))
      .select(col("freq"), col("word"), col("l"),
        explode(sequence(lit(1), length(col("word")) - col("l") + 1))
          .as("i"))
      .select(col("word").substr(col("i"), col("l")).as("piece"),
        col("freq"), col("l"))
      .groupBy("piece").agg(
        sum(col("freq")).as("cnt"),
        first(length(col("piece"))).as("len"))
    val chars = sub.where(col("len") === 1)
      .orderBy(col("cnt").desc, col("piece").asc)
      .select(col("piece"), col("cnt"))
      .as[(String, Long)].collect().toSeq
    // Fail fast (r14 ADVICE): an empty word vocabulary (empty or
    // whitespace-only corpus, or every word longer than maxWordLen)
    // would otherwise surface as an opaque empty.max inside the EM
    // loop and a 0/0 in scorePieces.
    require(chars.nonEmpty,
      s"unigram-LM training corpus has no trainable words: every " +
        s"'$textCol' word is empty/whitespace-only or longer than " +
        s"maxWordLen=$maxWordLen")
    val multis = sub.where(col("len") >= 2 && col("cnt") >= minCount)
      .orderBy(col("cnt").desc, col("piece").asc)
      .limit(multiKeep)
      .select(col("piece"), col("cnt"))
      .as[(String, Long)].collect().toSeq
    var pieces = scorePieces(spark, chars ++ multis)
    val trace = scala.collection.mutable.ArrayBuffer.empty[Round]
    var llPrev = Long.MinValue
    var accepted = pieces
    var r = 1
    var go = true
    while (go && r <= rounds) {
      val lpMap = pieces.map(p => p.piece -> p.logpMicro).toMap
      val bc = spark.sparkContext.broadcast(lpMap)
      val maxL = pieces.map(_.piece.length).max
      // E-step: shuffle-free segmentation; one partial-agg exchange
      // for the piece counts, one single-row LL aggregate.
      val seg = barrier(vocab.select(col("word"), col("freq"))
        .as[(String, Long)]
        .mapPartitions { rows =>
          val m = bc.value
          rows.flatMap { case (w, f) =>
            viterbi(w, maxL, m).map { case (s, ps) => (w, f, s, ps) }
          }
        }
        .toDF("word", "freq", "score", "pieces"))
      val ll = seg.agg(coalesce(sum(col("freq") * col("score")),
          lit(Long.MinValue))).collect()(0).getLong(0)
      if (ll > llPrev) {
        trace += Round(r, pieces.size, ll)
        accepted = pieces
        llPrev = ll
        // M-step: counts under the accepted segmentation; zero-count
        // pieces drop (reachability preserved — see scaladoc).
        val counts = seg
          .select(col("freq"), explode(col("pieces")).as("piece"))
          .groupBy("piece").agg(sum(col("freq")).as("cnt"))
          .as[(String, Long)].collect().toSeq
          .sortBy { case (p, c) => (-c, p) }
        Barrier.free(seg)
        pieces = scorePieces(spark, counts)
        r += 1
      } else {
        Barrier.free(seg)
        go = false
      }
    }
    Barrier.free(vocab)
    Model(accepted, trace.toSeq)
  }

  /** The final piece table as a DataFrame: (rank, piece,
    * piece_count, logp_micro) — rank by (count desc, piece asc), all
    * exact integers (the q189 discipline needs no strings here:
    * micros fit comfortably in BIGINT). */
  def pieceTable(spark: SparkSession, model: Model): DataFrame = {
    import spark.implicits._
    model.pieces.zipWithIndex
      .map { case (p, i) => (i + 1, p.piece, p.count, p.logpMicro) }
      .toDF("rank", "piece", "piece_count", "logp_micro")
  }

  /**
   * Encode a corpus with a trained model — the T45 counterpart for
   * T60: per document, words segment by Viterbi under the FINAL
   * accepted pieces (identical arithmetic to the last accepted
   * training round, so the oracle reuses that round's backtrack
   * counts); words longer than `maxWordLen` — the training regime's
   * exclusion — and any word Viterbi cannot reach (unseen chars at
   * apply time) fall back to CHAR count, the q203 COALESCE rule.
   *
   * Plan is q203's dictionary-join shape: the per-word token count
   * is computed ONCE over the DISTINCT word table (Heaps'-law
   * bounded, shuffle-free mapPartitions against the broadcast piece
   * map), then joined back to the per-document word stream — the
   * corpus-sized side never runs the DP.
   *
   * Output: (idCol, n_words, n_chars, n_tokens, compression) with
   * compression on the floor(·10⁶) grid (the q203 contract).
   */
  def encode(
      corpus: DataFrame, idCol: String, textCol: String,
      model: Model, maxWordLen: Int = 12): DataFrame = {
    require(model.pieces.nonEmpty, "model has no pieces")
    val spark = corpus.sparkSession
    import spark.implicits._
    val lpMap = model.pieces.map(p => p.piece -> p.logpMicro).toMap
    val bc = spark.sparkContext.broadcast(lpMap)
    val maxL = model.pieces.map(_.piece.length).max
    val dw = corpus
      .select(col(idCol),
        explode(split(col(textCol), "\\s+")).as("word"))
      .where(col("word") =!= "")
    val tok = dw.select("word").distinct()
      .as[String]
      .mapPartitions { words =>
        val m = bc.value
        words.map { w =>
          val t =
            if (w.length > maxWordLen) w.length.toLong
            else viterbi(w, maxL, m)
              .map(_._2.size.toLong).getOrElse(w.length.toLong)
          (w, t)
        }
      }
      .toDF("word", "__tok")
    dw.join(tok, Seq("word"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_words"),
        sum(length(col("word")).cast("long")).as("n_chars"),
        sum(coalesce(col("__tok"),
          length(col("word")).cast("long"))).as("n_tokens"))
      .withColumn("compression",
        floor(col("n_chars").cast("double")
          / col("n_tokens").cast("double") * lit(1000000.0))
          / lit(1000000.0))
  }

  /** The accepted-round trace as a DataFrame: (round, n_pieces,
    * ll_micro) — exact integers. */
  def traceTable(spark: SparkSession, model: Model): DataFrame = {
    import spark.implicits._
    model.trace.map(t => (t.round, t.nPieces, t.llMicro))
      .toDF("round", "n_pieces", "ll_micro")
  }

  /**
   * T62 support: ALL in-vocab segmentations of one word, as
   * (scoreMicro, revtb) where `revtb` is the REVERSED piece-length
   * digit string (last piece's length first — piece lengths ≤ 9 by
   * the caller's contract, so one digit per piece and the token
   * count is `revtb.length`). A segmentation is uniquely determined
   * by its length sequence, so (score DESC, revtb DESC) is a TOTAL
   * order — and it is exactly [[viterbi]]'s tie rule unrolled: the
   * backtrack prefers the longer piece at the LAST position first,
   * then recursively, which is lexicographic DESC on the reversed
   * digits (pinned in UnigramLmSpec: rank 1 IS the Viterbi path).
   * Memoized DFS; bounded by the training regime's maxWordLen (≤ 12
   * chars ⇒ ≤ tribonacci-ish hundreds of paths, enumerated only on
   * the Heaps'-law-bounded distinct-word table).
   */
  private[graft] def allSegmentations(
      word: String, maxPieceLen: Int,
      lp: scala.collection.Map[String, Long]): List[(Long, String)] = {
    val n = word.length
    val memo = Array.fill[List[(Long, String)]](n + 1)(null)
    def go(i: Int): List[(Long, String)] = {
      if (i == n) List((0L, ""))
      else if (memo(i) != null) memo(i)
      else {
        var acc = List.empty[(Long, String)]
        var l = 1
        while (l <= math.min(maxPieceLen, n - i)) {
          lp.get(word.substring(i, i + l)) match {
            case Some(s) =>
              acc = go(i + l).map { case (sc, tb) =>
                (sc + s, tb + l.toString)
              } ::: acc
            case None => ()
          }
          l += 1
        }
        memo(i) = acc
        acc
      }
    }
    go(0)
  }

  /**
   * T62 (r15): n-best SUBWORD REGULARIZATION encoding — the
   * augmentation Kudo 2018 is named for: instead of always emitting
   * the single Viterbi segmentation (q333), each word draws one of
   * its `nBest` highest-scoring segmentations, so repeated epochs
   * see varied tokenizations of the same text (the LM-training
   * regularizer). This is the DETERMINISTIC α→0 variant: candidates
   * are the exact-long score-ranked n-best (total order — see
   * [[allSegmentations]]; rank 1 is bit-identically the q333
   * Viterbi path, so nBest = 1 reduces to the plain encoder), and
   * the draw is UNIFORM over the candidate list via the md5-uniform
   * of (word, seed) — the Q10 determinism contract: one epoch's
   * sampling is reproducible and oracle-replayable; vary `seed` per
   * epoch for fresh draws. The α-weighted posterior the paper's
   * best results use is [[encodeNbestAlpha]] (r16) — the
   * cross-engine exp() lives there as a driver-literal weight table
   * over a bounded quantized Δscore grid.
   *
   * Plan: q203's dictionary-join shape — enumeration runs ONCE per
   * DISTINCT word (shuffle-free mapPartitions against the broadcast
   * piece map, the bounded-model contract), the corpus-sized side
   * only joins and aggregates. Words longer than `maxWordLen` (the
   * training regime's exclusion) and Viterbi-unreachable words fall
   * back to CHAR count as a single candidate (the q333 COALESCE
   * rule).
   *
   * Output: (idCol, n_words, n_tokens_best, n_tokens_sampled,
   * n_multi_words) — `n_tokens_best` the Viterbi floor,
   * `n_tokens_sampled` the drawn-epoch count (≥ best by
   * construction), `n_multi_words` how many word occurrences had
   * more than one candidate (the regularization surface).
   */
  def encodeNbest(
      corpus: DataFrame, idCol: String, textCol: String,
      model: Model, nBest: Int, seed: Long,
      maxWordLen: Int = 12): DataFrame = {
    require(model.pieces.nonEmpty, "model has no pieces")
    require(nBest >= 1 && nBest <= 64,
      s"nBest must be in [1, 64], got $nBest")
    val maxL = model.pieces.map(_.piece.length).max
    require(maxL <= 9,
      s"digit tiebreak needs piece length <= 9, got $maxL")
    val spark = corpus.sparkSession
    import spark.implicits._
    val lpMap = model.pieces.map(p => p.piece -> p.logpMicro).toMap
    val bc = spark.sparkContext.broadcast(lpMap)
    val dw = corpus
      .select(col(idCol),
        explode(split(col(textCol), "\\s+")).as("word"))
      .where(col("word") =!= "")
    val ord = Ordering.Tuple2(
      Ordering.Long, Ordering.String.reverse)
    val tok = dw.select("word").distinct()
      .as[String]
      .mapPartitions { words =>
        val m = bc.value
        words.map { w =>
          val toks: Seq[Long] =
            if (w.length > maxWordLen) Seq(w.length.toLong)
            else {
              val segs = allSegmentations(w, maxL, m)
              if (segs.isEmpty) Seq(w.length.toLong)
              else segs
                .sortBy { case (sc, tb) => (-sc, tb) }(ord)
                .take(nBest)
                .map(_._2.length.toLong)
            }
          (w, toks)
        }
      }
      .toDF("word", "__toks")
    // the q288 md5-uniform draw keyed by (word, seed) — uniform over
    // the candidate list (1-based element_at)
    val uu = coalesce(
      conv(substring(md5(concat_ws("|",
        md5(col("word")), lit(seed.toString))), 1, 7), 16, 10)
        .cast("long"),
      lit(0L))
    dw.join(tok, Seq("word"), "left")
      .select(col(idCol), col("__toks"),
        (lit(1) + pmod(uu, size(col("__toks")).cast("long")))
          .cast("int").as("__pick"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_words"),
        sum(element_at(col("__toks"), 1)).as("n_tokens_best"),
        sum(element_at(col("__toks"), col("__pick")))
          .as("n_tokens_sampled"),
        sum(when(size(col("__toks")) > 1, 1L).otherwise(0L))
          .as("n_multi_words"))
  }
  /** T65 support: the α-posterior weight table — W(j) =
    * round(10⁹·exp(−j·gridMicro/10⁶)) for j ∈ [0, jMax], where jMax
    * is the first index whose weight rounds to 0 (exp < 5·10⁻¹⁰).
    * Computed driver-side ONCE and handed to BOTH engines as
    * literals (the milliLog10Table discipline) — the transcendental
    * exp never crosses an engine boundary; the bounded quantized
    * Δscore domain is what makes a weight table possible at all. */
  private[graft] def alphaWeightTable(
      gridMicro: Long): Seq[(Int, Long)] = {
    require(gridMicro >= 1000L && gridMicro <= 1000000L,
      s"gridMicro must be in [1e3, 1e6], got $gridMicro")
    val jMax = math.ceil(
      math.log(2.0e9) / (gridMicro / 1.0e6)).toInt
    (0 to jMax).map(j =>
      (j, math.round(1.0e9 * math.exp(-j * (gridMicro / 1.0e6)))))
  }

  /**
   * T65 (r16): α-weighted POSTERIOR n-best sampling — the sampling
   * Kudo 2018's best results actually use (VERDICT r15 "missing"
   * #5): [[encodeNbest]] draws uniformly over the n-best (the α→0
   * limit); the paper samples segmentation i with probability
   * ∝ P(i)^α — sharper α favors the Viterbi path, α→0 flattens to
   * uniform — so the regularization STRENGTH becomes a dial.
   *
   * EXACT-REPLAY ARITHMETIC (the unigram-LM micro-log discipline
   * end to end): scores are exact micro-log longs, so
   * P(i)^α/P(best)^α = exp(−α·Δᵢ) with Δᵢ = score_best − score_i
   * ≥ 0 — a function of a BOUNDED quantized domain once Δ lands on
   * the `gridMicro` grid: jᵢ = min(⌊α_milli·Δᵢ/(1000·gridMicro)⌋,
   * jMax) (floor — integer division, both engines), and the weight
   * is [[alphaWeightTable]](jᵢ), a 10⁹-scaled driver literal (the
   * best candidate always takes weight 10⁹, so the total is never
   * 0). The draw is the q301 exponential-mechanism comparison: pick
   * the smallest rank i with u·W_total < Cᵢ·2²⁸ over the exact
   * cumulative longs (u the md5-uniform of (word, seed); all
   * products < 2⁶¹ — documented bound: W_total ≤ 64·10⁹). α_milli =
   * 0 reduces to [[encodeNbest]]'s uniform weighting (every j = 0);
   * a huge α_milli degenerates to Viterbi (every non-best weight
   * rounds to 0) — both regimes spec-pinned.
   *
   * Plan: identical to [[encodeNbest]] — one enumeration per
   * DISTINCT word (broadcast piece map, bounded-model contract)
   * emitting the cumulative-weight array; the corpus side joins and
   * aggregates; the pick is a bounded codegen'd array fold (nBest ≤
   * 64 elements, not a hot kernel).
   *
   * Output: (idCol, n_words, n_tokens_best, n_tokens_sampled,
   * n_multi_words, n_words_shifted) — `n_words_shifted` counts word
   * occurrences whose draw left the Viterbi path (the
   * augmentation's measured diversity, the dial's readout).
   */
  def encodeNbestAlpha(
      corpus: DataFrame, idCol: String, textCol: String,
      model: Model, nBest: Int, seed: Long, alphaMilli: Long,
      gridMicro: Long = 20000L, maxWordLen: Int = 12): DataFrame = {
    require(model.pieces.nonEmpty, "model has no pieces")
    require(nBest >= 1 && nBest <= 64,
      s"nBest must be in [1, 64], got $nBest")
    require(alphaMilli >= 0L && alphaMilli <= 100000000L,
      s"alphaMilli must be in [0, 1e8], got $alphaMilli")
    val maxL = model.pieces.map(_.piece.length).max
    require(maxL <= 9,
      s"digit tiebreak needs piece length <= 9, got $maxL")
    val spark = corpus.sparkSession
    import spark.implicits._
    val lpMap = model.pieces.map(p => p.piece -> p.logpMicro).toMap
    val bc = spark.sparkContext.broadcast(lpMap)
    val wTab = alphaWeightTable(gridMicro)
    val wArr = wTab.map(_._2).toArray
    val jMax = wTab.last._1
    val dw = corpus
      .select(col(idCol),
        explode(split(col(textCol), "\\s+")).as("word"))
      .where(col("word") =!= "")
    val ord = Ordering.Tuple2(
      Ordering.Long, Ordering.String.reverse)
    val tok = dw.select("word").distinct()
      .as[String]
      .mapPartitions { words =>
        val m = bc.value
        words.map { w =>
          // fallback (over-long / unreachable): ONE candidate of
          // char-count tokens — the q333 COALESCE rule
          val ranked: Option[Seq[(Long, String)]] =
            if (w.length > maxWordLen) None
            else {
              val segs = allSegmentations(w, maxL, m)
              if (segs.isEmpty) None
              else Some(segs
                .sortBy { case (sc, tb) => (-sc, tb) }(ord)
                .take(nBest))
            }
          val toks: Seq[Long] = ranked match {
            case None => Seq(w.length.toLong)
            case Some(r) => r.map(_._2.length.toLong)
          }
          val cum: Seq[Long] = ranked match {
            case None => Seq(wArr(0))
            case Some(r) =>
              val best = r.head._1
              var c = 0L
              r.map { case (sc, _) =>
                val j = math.min(
                  alphaMilli * (best - sc) / (1000L * gridMicro),
                  jMax.toLong).toInt
                c += wArr(j)
                c
              }
          }
          (w, toks, cum)
        }
      }
      .toDF("word", "__toks", "__cum")
    val uu = coalesce(
      conv(substring(md5(concat_ws("|",
        md5(col("word")), lit(seed.toString))), 1, 7), 16, 10)
        .cast("long"),
      lit(0L))
    val tot = element_at(col("__cum"), size(col("__cum")))
    val pick = (lit(1) + size(filter(col("__cum"),
      c => c * lit(268435456L) <= uu * tot))).cast("int")
    dw.join(tok, Seq("word"), "left")
      .select(col(idCol), col("__toks"), pick.as("__pick"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_words"),
        sum(element_at(col("__toks"), 1)).as("n_tokens_best"),
        sum(element_at(col("__toks"), col("__pick")))
          .as("n_tokens_sampled"),
        sum(when(size(col("__toks")) > 1, 1L).otherwise(0L))
          .as("n_multi_words"),
        sum(when(col("__pick") > 1, 1L).otherwise(0L))
          .as("n_words_shifted"))
  }
}
