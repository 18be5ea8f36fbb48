package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Fuzzy, Multimodal, Relevance, Sampling, Similarity, TextAnalysis, TimeSeries}
import graft.operators.Barrier.BarrierOps

/**
 * LLM-training-data pipeline query registry: dedup, similarity
 * search, text analysis, multimodal — the north-star operator
 * families layered on the relational core (no counterpart in the
 * reference engine). Each query is paired with a DuckDB oracle in
 * `oracles`; both sides share md5-based portable hashing and
 * deterministic total ORDER BY.
 */
object PipelineQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.sources.Tables.load(s, dir, name)

  /** `documents` plus exact duplicates injected deterministically
    * (every 50th doc re-appears with doc_id + 100000), so exact-dedup
    * has real work on the otherwise duplicate-free synthetic corpus.
    * The single source of the injection rule — q15 and q34 (and their
    * oracles) must stay in sync through it. */
  private def docsWithDups(
      s: SparkSession, dir: String,
      cols: Seq[String] = Seq("doc_id", "text")): DataFrame = {
    val d = t(s, dir, "documents").select(cols.map(col): _*)
    d.unionByName(
      d.where(col("doc_id") % 50 === 0)
        .withColumn("doc_id", col("doc_id") + 100000))
  }

  /**
   * q284 oracle generator: unrolls `Fuzzy.fellegiSunterEm`'s
   * micro-grid EM as a DuckDB materialized-CTE chain — the q123/q268
   * fixed-iteration replay discipline. State per round is one row of
   * micro-unit BIGINTs (m/u per field + λ); the E-step posterior is
   * the SAME left-associated IEEE product (λ·t₁·t₂·t₃ in field
   * order) floored to micro-units, the M-step sums are exact integer
   * aggregates over the pattern histogram, each finished by one IEEE
   * division + floor + the [1, 999999] clamp — GUARDED exactly like
   * the engine: a zero (or NULL — empty histogram) denominator keeps
   * the previous round's parameter instead of dividing (the
   * degenerate-posterior-mass rule). Fields are q267's
   * first three (p_brand, p_type, name_head) over the
   * sorted-neighborhood candidates (window 6).
   */
  private def fsEmOracle(
      iters: Int, m0Micro: Long, u0Micro: Long, lam0Micro: Long)
      : String = {
    val names = Seq("p_brand", "p_type", "name_head")
    def term(pos: Int, c: String) =
      s"""(CASE substr(pattern, $pos, 1)
         |        WHEN '1' THEN CAST($c AS DOUBLE) / 1000000
         |        WHEN '0' THEN 1.0 - CAST($c AS DOUBLE) / 1000000
         |        ELSE 1.0 END)""".stripMargin
    // Numerator/denominator sums for field `pos`; the division is
    // guarded downstream (zero/NULL denominator keeps the previous
    // round's parameter — the engine's exact degenerate-mass rule).
    def sums(pos: Int, tag: String, wExpr: String) =
      s"""      SUM(CASE WHEN substr(pattern, $pos, 1) = '1'
         |        THEN cnt * $wExpr ELSE 0 END) AS num_$tag$pos,
         |      SUM(CASE WHEN substr(pattern, $pos, 1) <> '-'
         |        THEN cnt * $wExpr ELSE 0 END) AS den_$tag$pos""".stripMargin
    def mu(pos: Int, tag: String) =
      s"""    CASE WHEN a.den_$tag$pos > 0 THEN
         |      GREATEST(1, LEAST(999999, CAST(floor(
         |        CAST(a.num_$tag$pos AS DOUBLE)
         |        / CAST(a.den_$tag$pos AS DOUBLE)
         |        * 1000000) AS BIGINT)))
         |      ELSE p.$tag$pos END AS $tag$pos""".stripMargin
    val head =
      s"""WITH rec AS (
         |  SELECT p_partkey AS id, p_name, p_brand AS f1, p_type AS f2,
         |    string_split(p_name, ' ')[1] AS f3
         |  FROM part
         |), rk AS (
         |  SELECT id, f1, f2, f3,
         |    row_number() OVER (ORDER BY p_name, id) AS rn
         |  FROM rec
         |), cand AS (
         |  SELECT DISTINCT least(a.id, b.id) AS id_a,
         |    greatest(a.id, b.id) AS id_b
         |  FROM rk a JOIN rk b ON b.rn > a.rn AND b.rn <= a.rn + 6
         |), patterns AS MATERIALIZED (
         |  SELECT pattern, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
         |    SELECT
         |      (CASE WHEN a.f1 IS NULL OR b.f1 IS NULL THEN '-'
         |        WHEN a.f1 = b.f1 THEN '1' ELSE '0' END)
         |      || (CASE WHEN a.f2 IS NULL OR b.f2 IS NULL THEN '-'
         |        WHEN a.f2 = b.f2 THEN '1' ELSE '0' END)
         |      || (CASE WHEN a.f3 IS NULL OR b.f3 IS NULL THEN '-'
         |        WHEN a.f3 = b.f3 THEN '1' ELSE '0' END) AS pattern
         |    FROM cand c JOIN rec a ON c.id_a = a.id
         |      JOIN rec b ON c.id_b = b.id)
         |  GROUP BY 1
         |), p0 AS (
         |  SELECT CAST($m0Micro AS BIGINT) AS m1,
         |    CAST($u0Micro AS BIGINT) AS u1,
         |    CAST($m0Micro AS BIGINT) AS m2,
         |    CAST($u0Micro AS BIGINT) AS u2,
         |    CAST($m0Micro AS BIGINT) AS m3,
         |    CAST($u0Micro AS BIGINT) AS u3,
         |    CAST($lam0Micro AS BIGINT) AS lam
         |)""".stripMargin
    val rounds = (1 to iters).map { k =>
      s""", w$k AS MATERIALIZED (
         |  SELECT pattern, cnt,
         |    CAST(floor(wm / (wm + wu) * 1000000) AS BIGINT) AS w
         |  FROM (
         |    SELECT pattern, cnt,
         |      (CAST(lam AS DOUBLE) / 1000000)
         |        * ${term(1, "m1")}
         |        * ${term(2, "m2")}
         |        * ${term(3, "m3")} AS wm,
         |      (1.0 - CAST(lam AS DOUBLE) / 1000000)
         |        * ${term(1, "u1")}
         |        * ${term(2, "u2")}
         |        * ${term(3, "u3")} AS wu
         |    FROM patterns CROSS JOIN p${k - 1})
         |), p$k AS MATERIALIZED (
         |  SELECT
         |${mu(1, "m")},
         |${mu(1, "u")},
         |${mu(2, "m")},
         |${mu(2, "u")},
         |${mu(3, "m")},
         |${mu(3, "u")},
         |    CASE WHEN a.st > 0 THEN
         |      GREATEST(1, LEAST(999999, CAST(floor(
         |        CAST(a.sw AS DOUBLE)
         |        / CAST(a.st AS DOUBLE)) AS BIGINT)))
         |      ELSE p.lam END AS lam
         |  FROM (
         |    SELECT
         |${sums(1, "m", "w")},
         |${sums(1, "u", "(1000000 - w)")},
         |${sums(2, "m", "w")},
         |${sums(2, "u", "(1000000 - w)")},
         |${sums(3, "m", "w")},
         |${sums(3, "u", "(1000000 - w)")},
         |      SUM(cnt * w) AS sw, SUM(cnt) AS st
         |    FROM w$k) a CROSS JOIN p${k - 1} p
         |)""".stripMargin
    }.mkString("\n")
    val out = names.zipWithIndex.map { case (n, i) =>
      s"""SELECT '$n' AS field, CAST(m${i + 1} AS DOUBLE) / 1000000 AS m,
         |  CAST(u${i + 1} AS DOUBLE) / 1000000 AS u,
         |  CAST(lam AS DOUBLE) / 1000000 AS lambda FROM p$iters""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"$head\n$rounds\nSELECT * FROM (\n$out\n) ORDER BY field"
  }

  /**
   * q294 oracle generator: unrolls `Graph.flattenHierarchy`'s fixed
   * rounds as a CTE chain — level k joins the edge table onto level
   * k−1; rounds past the tree's depth join empty levels and are
   * value-neutral (the kCore replay contract). The hierarchy is the
   * deterministic binary tree child i → parent i div 2 over customer
   * keys (key 1 the root).
   */
  private def hierOracle(maxDepth: Int): String = {
    val levels = (1 to maxDepth).map { d =>
      s""", l$d AS MATERIALIZED (
         |  SELECT e.child AS node, p.root, CAST($d AS INT) AS depth,
         |    p.path || '/' || CAST(e.child AS VARCHAR) AS path
         |  FROM e JOIN l${d - 1} p ON e.parent = p.node
         |)""".stripMargin
    }.mkString("\n")
    val unions = (0 to maxDepth)
      .map(d => s"SELECT node, root, depth, path FROM l$d")
      .mkString("\nUNION ALL\n")
    s"""WITH e AS (
       |  SELECT CAST(c_custkey AS BIGINT) AS child,
       |    CASE WHEN c_custkey = 1 THEN NULL
       |      ELSE CAST(c_custkey // 2 AS BIGINT) END AS parent
       |  FROM customer
       |), l0 AS MATERIALIZED (
       |  SELECT child AS node, child AS root, CAST(0 AS INT) AS depth,
       |    CAST(child AS VARCHAR) AS path
       |  FROM e WHERE parent IS NULL
       |)$levels
       |SELECT * FROM (
       |$unions
       |) ORDER BY node""".stripMargin
  }

  /**
   * q288 oracle generator: the ε-DP release replay — the noise
   * threshold table is generated by the SAME Scala function the
   * operator uses (`Quality.dpNoiseThresholds`, the q269
   * seed-derived-literal pattern), so both engines consume identical
   * integer (noise, lo, hi) rows and the only per-row arithmetic is
   * the shared md5-uniform + one range lookup + one GREATEST.
   */
  private def dpOracle(
      epsilon: Double, seed: Long, clampK: Int): String = {
    val rows = graft.operators.Quality
      .dpNoiseThresholds(epsilon, clampK)
      .map { case (k, lo, hi) => s"($k, $lo, $hi)" }
      .mkString(",\n    ")
    s"""WITH counts AS (
       |  SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n
       |  FROM documents GROUP BY 1, 2
       |), thr(noise, lo, hi) AS (
       |  VALUES
       |    $rows
       |), u AS (
       |  SELECT lang, source, n,
       |    ('0x' || substr(md5(concat_ws('|',
       |      coalesce(md5(lang), 'null'),
       |      coalesce(md5(source), 'null'), '$seed')),
       |      1, 7))::BIGINT AS uu
       |  FROM counts
       |)
       |SELECT lang, source,
       |  GREATEST(0, n + noise) AS released_count
       |FROM u JOIN thr ON u.uu >= thr.lo AND u.uu < thr.hi
       |ORDER BY lang, source""".stripMargin
  }

  /** q296 oracle generator: the PUBLIC-DOMAIN ε-DP release replay —
    * the q288 mechanism over a literal VALUES key domain, zero-count
    * groups included (the membership-safe variant: the released row
    * set is the domain, not the observed groups). */
  /** q301 oracle generator: the exponential-mechanism ε-DP quantile
    * replay — the SAME Scala-generated (util, weight) literal table
    * the operator consumes (`Quality.dpExpMechWeights`), the integer
    * utility |qDen·#{v ≤ c} − qNum·n| clamped at clampUtil, and the
    * division-free HUGEINT pick cum·2²⁸ > draw·W (Spark evaluates it
    * in DECIMAL(38,0); both are exact integer arithmetic). The draw
    * is the q288 md5-uniform recipe over the group key. */
  private def dpQuantileOracle(
      grid: Seq[Long], qNum: Int, qDen: Int, epsilon: Double,
      seed: Long, clampUtil: Int): String = {
    val wrows = graft.operators.Quality
      .dpExpMechWeights(epsilon, qDen, clampUtil)
      .map { case (k, w) => s"($k, $w)" }
      .mkString(",\n    ")
    val grows = grid.zipWithIndex
      .map { case (c, i) => s"($i, $c)" }.mkString(", ")
    s"""WITH grid(gi, gv) AS (VALUES $grows),
       |wt(util, w) AS (
       |  VALUES
       |    $wrows
       |), cnt AS (
       |  SELECT b.event_type, g.gi, g.gv,
       |    CAST(SUM(CASE WHEN b."value" <= g.gv THEN 1 ELSE 0 END)
       |      AS BIGINT) AS cle,
       |    CAST(COUNT(b."value") AS BIGINT) AS n
       |  FROM events b CROSS JOIN grid g
       |  GROUP BY 1, 2, 3
       |), scored AS (
       |  SELECT c.event_type, c.gi, c.gv, wt.w
       |  FROM cnt c JOIN wt
       |    ON wt.util = LEAST(ABS($qDen * c.cle - $qNum * c.n),
       |      $clampUtil)
       |), cum AS (
       |  SELECT event_type, gi, gv,
       |    CAST(SUM(w) OVER (PARTITION BY event_type ORDER BY gi
       |      ROWS UNBOUNDED PRECEDING) AS HUGEINT) AS cw,
       |    CAST(SUM(w) OVER (PARTITION BY event_type) AS HUGEINT)
       |      AS wtot
       |  FROM scored
       |), draw AS (
       |  SELECT event_type,
       |    CAST(('0x' || substr(md5(concat_ws('|',
       |      coalesce(md5(event_type), 'null'), '$seed')),
       |      1, 7))::BIGINT AS HUGEINT) AS uu
       |  FROM (SELECT DISTINCT event_type FROM events)
       |), pick AS (
       |  SELECT c.event_type, c.gi, c.gv,
       |    ROW_NUMBER() OVER (PARTITION BY c.event_type
       |      ORDER BY c.gi) AS rn
       |  FROM cum c JOIN draw d USING (event_type)
       |  WHERE c.cw * CAST(268435456 AS HUGEINT) > d.uu * c.wtot
       |)
       |SELECT event_type, CAST(gv AS BIGINT) AS released_q
       |FROM pick WHERE rn = 1
       |ORDER BY event_type""".stripMargin
  }

  /** q310 oracle generator: the public-bin DP histogram replay —
    * one conditional-sum pass mirroring the operator's bin rules
    * (end bins clamp), the q288 md5-uniform draw over the (bin_lo,
    * bin_hi) key, the shared threshold-table literals. */
  private def dpHistOracle(
      edges: Seq[Long], epsilon: Double, seed: Long,
      clampK: Int): String = {
    val rows = graft.operators.Quality
      .dpNoiseThresholds(epsilon, clampK)
      .map { case (k, lo, hi) => s"($k, $lo, $hi)" }
      .mkString(",\n    ")
    val bins = edges.sliding(2).toSeq.map { case Seq(a, b) => (a, b) }
    val k = bins.size
    val cases = bins.zipWithIndex.map { case ((a, b), i) =>
      val cond =
        if (k == 1) "\"value\" IS NOT NULL"
        else if (i == 0) s""""value" IS NOT NULL AND "value" < $b"""
        else if (i == k - 1)
          s""""value" IS NOT NULL AND "value" >= $a"""
        else s""""value" IS NOT NULL AND "value" >= $a AND "value" < $b"""
      s"""CAST(SUM(CASE WHEN $cond THEN 1 ELSE 0 END) AS BIGINT) AS c$i"""
    }.mkString(",\n    ")
    val melt = bins.zipWithIndex.map { case ((a, b), i) =>
      s"""SELECT CAST($a AS BIGINT) AS bin_lo,
         |      CAST($b AS BIGINT) AS bin_hi, c$i AS n FROM c""".stripMargin
    }.mkString("\n    UNION ALL\n    ")
    s"""WITH c AS (
       |  SELECT
       |    $cases
       |  FROM events
       |), m AS (
       |    $melt
       |), thr(noise, lo, hi) AS (
       |  VALUES
       |    $rows
       |), u AS (
       |  SELECT bin_lo, bin_hi, n,
       |    ('0x' || substr(md5(concat_ws('|',
       |      coalesce(md5(CAST(bin_lo AS VARCHAR)), 'null'),
       |      coalesce(md5(CAST(bin_hi AS VARCHAR)), 'null'),
       |      '$seed')), 1, 7))::BIGINT AS uu
       |  FROM m
       |)
       |SELECT bin_lo, bin_hi, GREATEST(0, n + noise) AS released_count
       |FROM u JOIN thr ON u.uu >= thr.lo AND u.uu < thr.hi
       |ORDER BY bin_lo""".stripMargin
  }

  /** q338 oracle generator: the user-level bounded-contribution
    * count release replay — capPerKey as a per-user row_number over
    * (md5(id), id), the Q10b domain-count path, thresholds at
    * ε/userCap from the same Scala function the operator uses. */
  private def dpUserDomainOracle(
      domain: Seq[String], epsilon: Double, seed: Long,
      userCap: Int, clampK: Int): String = {
    val rows = graft.operators.Quality
      .dpNoiseThresholds(epsilon / userCap, clampK)
      .map { case (k, lo, hi) => s"($k, $lo, $hi)" }
      .mkString(",\n    ")
    val dom = domain.map(v => s"('$v')").mkString(", ")
    s"""WITH capped AS (
       |  SELECT event_type FROM (
       |    SELECT event_type, row_number() OVER (
       |      PARTITION BY user_id
       |      ORDER BY md5(CAST(event_id AS VARCHAR)), event_id)
       |      AS rn
       |    FROM events) WHERE rn <= $userCap
       |), dom(event_type) AS (VALUES $dom),
       |counts AS (
       |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM capped GROUP BY 1
       |), full0 AS (
       |  SELECT d.event_type, COALESCE(c.c, CAST(0 AS BIGINT)) AS n
       |  FROM dom d LEFT JOIN counts c ON c.event_type = d.event_type
       |), thr(noise, lo, hi) AS (
       |  VALUES
       |    $rows
       |), u AS (
       |  SELECT event_type, n,
       |    ('0x' || substr(md5(concat_ws('|',
       |      coalesce(md5(event_type), 'null'), '$seed')),
       |      1, 7))::BIGINT AS uu
       |  FROM full0
       |)
       |SELECT event_type, GREATEST(0, n + noise) AS released_count,
       |  TRUE AS uncapped_refused
       |FROM u JOIN thr ON u.uu >= thr.lo AND u.uu < thr.hi
       |ORDER BY event_type""".stripMargin
  }

  /** T62 shared literal model (the q269 seed-derived-literal
    * pattern): a DECLARED unigram piece table — lowercase letters as
    * the coverage floor plus common English digraphs/trigraphs —
    * with logp = round(ln(cnt/total)·1e6) computed driver-side ONCE,
    * so the operator and the oracle consume identical longs and no
    * engine ln is involved anywhere (this gate tests ENCODING under
    * n-best sampling; trained-model encoding is q333's gate). */
  private[graft] def t62Pieces: Seq[(String, Long, Long)] = {
    val chars = ('a' to 'z').map(c => (c.toString, 40L))
    val multis = Seq(
      "th" -> 220L, "he" -> 180L, "in" -> 170L, "er" -> 160L,
      "an" -> 150L, "re" -> 140L, "on" -> 130L, "at" -> 120L,
      "en" -> 110L, "nd" -> 100L, "es" -> 90L, "or" -> 80L,
      "te" -> 70L, "ti" -> 60L, "the" -> 300L, "ing" -> 250L,
      "and" -> 200L, "ion" -> 150L, "ent" -> 100L)
    val all = chars ++ multis
    val total = all.map(_._2).sum.toDouble
    all.map { case (p, c) =>
      (p, c, math.round(math.log(c / total) * 1e6))
    }
  }

  /** q340 oracle generator: the n-best subword-regularization replay
    * — a recursive CTE enumerates every in-vocab segmentation of
    * each distinct word (bounded by maxWordLen = 12), ranks by
    * (score DESC, reversed-length-digits DESC — exactly the Viterbi
    * tie rule unrolled), keeps nBest, draws the md5-uniform pick,
    * and falls back to char counts for unreachable/over-long words. */
  private def nbestEncodeOracle(nBest: Int, seed: Long): String = {
    val pieceRows = t62Pieces
      .map { case (p, _, lp) => s"('$p', $lp, ${p.length})" }
      .mkString(",\n       |    ")
    s"""WITH RECURSIVE pieces(piece, lp, plen) AS (
       |  VALUES
       |    $pieceRows
       |), dw AS MATERIALIZED (
       |  SELECT doc_id, word FROM (
       |    SELECT doc_id,
       |      unnest(string_split_regex(lower(text), '\\s+')) AS word
       |    FROM documents WHERE text IS NOT NULL)
       |  WHERE word <> ''
       |), words AS MATERIALIZED (
       |  SELECT DISTINCT word FROM dw
       |), seg AS (
       |  SELECT word, 0 AS pos, CAST(0 AS BIGINT) AS score,
       |    '' AS revtb
       |  FROM words WHERE length(word) <= 12
       |  UNION ALL
       |  SELECT s.word, s.pos + p.plen, s.score + p.lp,
       |    CAST(p.plen AS VARCHAR) || s.revtb
       |  FROM seg s JOIN pieces p
       |    ON substr(s.word, s.pos + 1, p.plen) = p.piece
       |  WHERE s.pos + p.plen <= length(s.word)
       |), done AS MATERIALIZED (
       |  SELECT word, score, revtb FROM seg
       |  WHERE pos = length(word)
       |), top AS MATERIALIZED (
       |  SELECT word, revtb, rn FROM (
       |    SELECT word, revtb, row_number() OVER (
       |      PARTITION BY word ORDER BY score DESC, revtb DESC)
       |      AS rn
       |    FROM done) WHERE rn <= $nBest
       |), cand AS (
       |  SELECT word, CAST(COUNT(*) AS BIGINT) AS n_cands,
       |    MAX(CASE WHEN rn = 1
       |      THEN CAST(length(revtb) AS BIGINT) END) AS tok_best
       |  FROM top GROUP BY 1
       |), wsel AS (
       |  SELECT word, n_cands, tok_best,
       |    1 + (('0x' || substr(md5(concat_ws('|', md5(word),
       |      '$seed')), 1, 7))::BIGINT % n_cands) AS pick
       |  FROM cand
       |), wtok AS (
       |  SELECT w.word, w.tok_best, w.n_cands,
       |    CAST(length(t.revtb) AS BIGINT) AS tok_sampled
       |  FROM wsel w JOIN top t ON t.word = w.word AND t.rn = w.pick
       |), wfull AS MATERIALIZED (
       |  SELECT a.word,
       |    COALESCE(w.tok_best, CAST(length(a.word) AS BIGINT))
       |      AS tok_best,
       |    COALESCE(w.tok_sampled, CAST(length(a.word) AS BIGINT))
       |      AS tok_sampled,
       |    COALESCE(w.n_cands, CAST(1 AS BIGINT)) AS n_cands
       |  FROM words a LEFT JOIN wtok w ON w.word = a.word
       |)
       |SELECT d.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
       |  CAST(SUM(f.tok_best) AS BIGINT) AS n_tokens_best,
       |  CAST(SUM(f.tok_sampled) AS BIGINT) AS n_tokens_sampled,
       |  CAST(SUM(CASE WHEN f.n_cands > 1 THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_multi_words
       |FROM dw d JOIN wfull f ON f.word = d.word
       |GROUP BY 1 ORDER BY d.doc_id""".stripMargin
  }

  /** q353 oracle generator: the α-weighted posterior n-best replay
    * — the q340 recursive segmentation/ranking chain, then the
    * weight table lookup over the quantized Δscore grid (integer
    * floor division both engines), exact cumulative longs, and the
    * q301 exponential-mechanism pick comparison u·W_total <
    * Cᵢ·2²⁸. */
  private def alphaNbestEncodeOracle(
      nBest: Int, seed: Long, alphaMilli: Long,
      gridMicro: Long): String = {
    val pieceRows = t62Pieces
      .map { case (p, _, lp) => s"('$p', $lp, ${p.length})" }
      .mkString(",\n       |    ")
    val wTab = graft.operators.UnigramLm.alphaWeightTable(gridMicro)
    val jMax = wTab.last._1
    val expRows = wTab.map { case (j, w) => s"($j, $w)" }
      .mkString(",\n       |    ")
    s"""WITH RECURSIVE pieces(piece, lp, plen) AS (
       |  VALUES
       |    $pieceRows
       |), expt(j, wv) AS (
       |  VALUES
       |    $expRows
       |), dw AS MATERIALIZED (
       |  SELECT doc_id, word FROM (
       |    SELECT doc_id,
       |      unnest(string_split_regex(lower(text), '\\s+')) AS word
       |    FROM documents WHERE text IS NOT NULL)
       |  WHERE word <> ''
       |), words AS MATERIALIZED (
       |  SELECT DISTINCT word FROM dw
       |), seg AS (
       |  SELECT word, 0 AS pos, CAST(0 AS BIGINT) AS score,
       |    '' AS revtb
       |  FROM words WHERE length(word) <= 12
       |  UNION ALL
       |  SELECT s.word, s.pos + p.plen, s.score + p.lp,
       |    CAST(p.plen AS VARCHAR) || s.revtb
       |  FROM seg s JOIN pieces p
       |    ON substr(s.word, s.pos + 1, p.plen) = p.piece
       |  WHERE s.pos + p.plen <= length(s.word)
       |), done AS MATERIALIZED (
       |  SELECT word, score, revtb FROM seg
       |  WHERE pos = length(word)
       |), top AS MATERIALIZED (
       |  SELECT word, revtb, score, rn FROM (
       |    SELECT word, revtb, score, row_number() OVER (
       |      PARTITION BY word ORDER BY score DESC, revtb DESC)
       |      AS rn
       |    FROM done) WHERE rn <= $nBest
       |), wj AS (
       |  SELECT t.word, t.rn, t.revtb,
       |    LEAST((CAST($alphaMilli AS BIGINT) * (mx.smax - t.score))
       |      // CAST(${1000L * gridMicro} AS BIGINT),
       |      CAST($jMax AS BIGINT)) AS j
       |  FROM top t JOIN (
       |    SELECT word, MAX(score) AS smax FROM top GROUP BY 1) mx
       |    ON mx.word = t.word
       |), cw AS MATERIALIZED (
       |  SELECT w.word, w.rn, w.revtb,
       |    SUM(e.wv) OVER (PARTITION BY w.word ORDER BY w.rn) AS c,
       |    SUM(e.wv) OVER (PARTITION BY w.word) AS tot
       |  FROM wj w JOIN expt e ON e.j = w.j
       |), cand AS (
       |  SELECT word, CAST(COUNT(*) AS BIGINT) AS n_cands,
       |    MAX(CASE WHEN rn = 1
       |      THEN CAST(length(revtb) AS BIGINT) END) AS tok_best
       |  FROM top GROUP BY 1
       |), wsel AS (
       |  SELECT c.word, c.n_cands, c.tok_best,
       |    1 + CAST(SUM(CASE WHEN w.c * 268435456 <=
       |      (('0x' || substr(md5(concat_ws('|', md5(w.word),
       |        '$seed')), 1, 7))::BIGINT) * w.tot
       |      THEN 1 ELSE 0 END) AS BIGINT) AS pick
       |  FROM cand c JOIN cw w ON w.word = c.word
       |  GROUP BY 1, 2, 3
       |), wtok AS (
       |  SELECT w.word, w.tok_best, w.n_cands, w.pick,
       |    CAST(length(t.revtb) AS BIGINT) AS tok_sampled
       |  FROM wsel w JOIN top t ON t.word = w.word AND t.rn = w.pick
       |), wfull AS MATERIALIZED (
       |  SELECT a.word,
       |    COALESCE(w.tok_best, CAST(length(a.word) AS BIGINT))
       |      AS tok_best,
       |    COALESCE(w.tok_sampled, CAST(length(a.word) AS BIGINT))
       |      AS tok_sampled,
       |    COALESCE(w.n_cands, CAST(1 AS BIGINT)) AS n_cands,
       |    COALESCE(w.pick, CAST(1 AS BIGINT)) AS pick
       |  FROM words a LEFT JOIN wtok w ON w.word = a.word
       |)
       |SELECT d.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
       |  CAST(SUM(f.tok_best) AS BIGINT) AS n_tokens_best,
       |  CAST(SUM(f.tok_sampled) AS BIGINT) AS n_tokens_sampled,
       |  CAST(SUM(CASE WHEN f.n_cands > 1 THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_multi_words,
       |  CAST(SUM(CASE WHEN f.pick > 1 THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_words_shifted
       |FROM dw d JOIN wfull f ON f.word = d.word
       |GROUP BY 1 ORDER BY d.doc_id""".stripMargin
  }

  /** q341/q342 oracle generator: the batch-perceptron replay —
    * unrolled per-epoch CTEs over the (doc, bucket, count) integer
    * design matrix: margins from the previous epoch's weight table
    * (LEFT JOIN — absent buckets are weight 0), ties count as
    * errors, batch updates merge by UNION ALL + SUM. `confusion`
    * selects the final-weights margin-sign cells instead of the
    * trace. */
  private def perceptronOracle(
      buckets: Int, epochs: Int, stopwords: Seq[String],
      minHits: Int, confusion: Boolean): String = {
    val sw = stopwords.map(s => s"'$s'").mkString(", ")
    val sb = new StringBuilder
    sb.append(
      s"""WITH tok AS MATERIALIZED (
         |  SELECT doc_id, word FROM (
         |    SELECT doc_id, unnest(string_split_regex(lower(text),
         |      '\\s+')) AS word
         |    FROM documents WHERE text IS NOT NULL)
         |  WHERE word <> ''
         |), lab AS MATERIALIZED (
         |  SELECT doc_id, CASE WHEN SUM(CASE WHEN word IN ($sw)
         |      THEN 1 ELSE 0 END) >= $minHits
         |    THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END AS y
         |  FROM tok GROUP BY 1
         |), db AS MATERIALIZED (
         |  SELECT t.doc_id, l.y,
         |    ('0x' || substr(md5(t.word), 1, 7))::BIGINT % $buckets
         |      AS b,
         |    CAST(COUNT(*) AS BIGINT) AS c
         |  FROM tok t JOIN lab l ON l.doc_id = t.doc_id
         |  GROUP BY 1, 2, 3
         |)""".stripMargin)
    for (e <- 1 to epochs) {
      val m =
        if (e == 1)
          s""", m1 AS (
             |  SELECT doc_id, y, CAST(0 AS BIGINT) AS m FROM lab
             |)""".stripMargin
        else
          s""", m$e AS (
             |  SELECT d.doc_id, any_value(d.y) AS y,
             |    (SELECT bias FROM bias${e - 1})
             |      + COALESCE(SUM(w.w * d.c), 0) AS m
             |  FROM db d LEFT JOIN w${e - 1} w ON w.b = d.b
             |  GROUP BY d.doc_id
             |)""".stripMargin
      val wE =
        if (e == 1)
          s""", w1 AS MATERIALIZED (
             |  SELECT d.b, CAST(SUM(d.y * d.c) AS BIGINT) AS w
             |  FROM db d JOIN mis1 mm ON mm.doc_id = d.doc_id
             |  GROUP BY 1
             |)""".stripMargin
        else
          s""", dw$e AS (
             |  SELECT d.b, CAST(SUM(d.y * d.c) AS BIGINT) AS w
             |  FROM db d JOIN mis$e mm ON mm.doc_id = d.doc_id
             |  GROUP BY 1
             |), w$e AS MATERIALIZED (
             |  SELECT b, CAST(SUM(w) AS BIGINT) AS w FROM (
             |    SELECT b, w FROM w${e - 1}
             |    UNION ALL SELECT b, w FROM dw$e)
             |  GROUP BY 1
             |)""".stripMargin
      val biasPrev =
        if (e == 1) "CAST(0 AS BIGINT)"
        else s"(SELECT bias FROM bias${e - 1})"
      sb.append(m)
      sb.append(
        s""", mis$e AS MATERIALIZED (
           |  SELECT doc_id, y FROM m$e WHERE y * m <= 0
           |)""".stripMargin)
      sb.append(wE)
      sb.append(
        s""", bias$e AS (
           |  SELECT $biasPrev
           |    + COALESCE((SELECT SUM(y) FROM mis$e), 0) AS bias
           |)""".stripMargin)
    }
    if (!confusion) {
      val rows = (1 to epochs).map { e =>
        s"""  SELECT $e AS epoch,
           |    (SELECT CAST(COUNT(*) AS BIGINT) FROM lab) AS n_docs,
           |    (SELECT CAST(COUNT(*) AS BIGINT) FROM mis$e)
           |      AS n_misclassified,
           |    (SELECT CAST(bias AS BIGINT) FROM bias$e)
           |      AS bias_after,
           |    (SELECT CAST(COALESCE(SUM(ABS(w)), 0) AS BIGINT)
           |      FROM w$e) AS w_l1_after,
           |    (SELECT CAST(COALESCE(SUM(w * (b + 1)), 0) AS BIGINT)
           |      FROM w$e) AS w_checksum_after""".stripMargin
      }.mkString("\nUNION ALL\n")
      sb.append(
        s"""
           |SELECT CAST(epoch AS INT) AS epoch, n_docs,
           |  n_misclassified, bias_after, w_l1_after,
           |  w_checksum_after
           |FROM (
           |$rows
           |) ORDER BY epoch""".stripMargin)
    } else {
      sb.append(
        s""", mfin AS (
           |  SELECT d.doc_id, any_value(d.y) AS y,
           |    (SELECT bias FROM bias$epochs)
           |      + COALESCE(SUM(w.w * d.c), 0) AS m
           |  FROM db d LEFT JOIN w$epochs w ON w.b = d.b
           |  GROUP BY d.doc_id
           |)
           |SELECT y AS y_true,
           |  CASE WHEN m > 0 THEN CAST(1 AS BIGINT)
           |    ELSE CAST(-1 AS BIGINT) END AS y_pred,
           |  CAST(COUNT(*) AS BIGINT) AS n_docs,
           |  CAST(SUM(m) AS BIGINT) AS margin_sum
           |FROM mfin GROUP BY 1, 2
           |ORDER BY y_true, y_pred""".stripMargin)
    }
    sb.toString
  }

  /** q347 oracle generator: the subsampling-amplification ledger
    * replay — amplified ε re-derived inline (⌈ln(1+q(e^ε−1))·1e6⌉),
    * per-release deterministic subsample via the (rowId, sampleSeed)
    * md5 draw, the Q10b domain-count mechanism per (lang,
    * mechanismSeed), Q15 ledger literals. */
  private def dpAmplifiedOracle(
      nReleases: Int, epsMicro: Long, ratePerMille: Int,
      mSeedBase: Long, sSeedBase: Long, budgetMicro: Long,
      domain: Seq[String], epsilon: Double, clampK: Int): String = {
    val ampl = math.ceil(math.log1p(
      ratePerMille / 1000.0 * math.expm1(epsMicro / 1.0e6))
      * 1e6).toLong
    var cum = 0L
    val acctRows = (1 to nReleases).map { i =>
      cum += ampl
      s"($i, 'sub_${"%02d".format(i)}', '${mSeedBase + i}', " +
        s"'${sSeedBase + i}', $ampl, $cum, ${budgetMicro - cum})"
    }.mkString(",\n       |    ")
    val thrRows = graft.operators.Quality
      .dpNoiseThresholds(epsilon, clampK)
      .map { case (k, lo, hi) => s"($k, $lo, $hi)" }
      .mkString(",\n       |    ")
    val dom = domain.map(v => s"('$v')").mkString(", ")
    s"""WITH rel(seq, release, mseed, sseed, eps_micro,
       |    cum_eps_micro, remaining_micro) AS (
       |  VALUES
       |    $acctRows
       |), dom(lang) AS (VALUES $dom),
       |counts AS MATERIALIZED (
       |  SELECT r.seq, d.lang, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM rel r, documents d
       |  WHERE (('0x' || substr(md5(concat_ws('|',
       |      coalesce(md5(CAST(d.doc_id AS VARCHAR)), 'null'),
       |      r.sseed)), 1, 7))::BIGINT) * 1000
       |    < CAST($ratePerMille AS BIGINT) * 268435456
       |  GROUP BY 1, 2
       |), full0 AS (
       |  SELECT r.seq, r.mseed, d.lang,
       |    COALESCE(c.c, CAST(0 AS BIGINT)) AS n
       |  FROM rel r CROSS JOIN dom d
       |  LEFT JOIN counts c ON c.seq = r.seq AND c.lang = d.lang
       |), thr(noise, lo, hi) AS (
       |  VALUES
       |    $thrRows
       |), u AS (
       |  SELECT seq, lang, n,
       |    ('0x' || substr(md5(concat_ws('|',
       |      coalesce(md5(lang), 'null'), mseed)),
       |      1, 7))::BIGINT AS uu
       |  FROM full0
       |), rc AS (
       |  SELECT u.seq, GREATEST(0, u.n + t.noise) AS released
       |  FROM u JOIN thr t ON u.uu >= t.lo AND u.uu < t.hi
       |), nr AS (
       |  SELECT seq, CAST(COUNT(*) AS BIGINT) AS n_rows,
       |    CAST(SUM(released) AS BIGINT) AS released_total
       |  FROM rc GROUP BY 1
       |)
       |SELECT CAST(r.seq AS INT) AS seq, r.release,
       |  CAST(r.eps_micro AS BIGINT) AS eps_micro,
       |  CAST(r.cum_eps_micro AS BIGINT) AS cum_eps_micro,
       |  CAST($budgetMicro AS BIGINT) AS budget_micro,
       |  CAST(r.remaining_micro AS BIGINT) AS remaining_micro,
       |  n.n_rows, n.released_total, TRUE AS unamplified_refused
       |FROM rel r JOIN nr n ON n.seq = r.seq
       |ORDER BY seq""".stripMargin
  }

  /** q339 oracle generator: the zCDP ledger replay — the accounting
    * literals re-derived INLINE (ceiling ρ = ⌈ε²/2e6⌉, exact
    * cumulative, ε(δ) = cumρ + ⌈2√(cumρ·ln(1/δ)_micro)⌉ over an
    * exactly-represented long product), the seed-parametric count
    * mechanism replayed once per refresh via a seed VALUES table. */
  private def dpZcdpOracle(
      nReleases: Int, epsMicro: Long, seedBase: Long,
      budgetMicro: Long, deltaPow10: Int, domain: Seq[String],
      epsilon: Double, clampK: Int): String = {
    val lnInvDeltaMicro =
      math.round(deltaPow10 * math.log(10.0) * 1e6)
    var cum = 0L
    val acctRows = (1 to nReleases).map { i =>
      val rho = (epsMicro * epsMicro + 1999999L) / 2000000L
      cum += rho
      val epsD = cum + math.ceil(
        2.0 * math.sqrt(cum.toDouble * lnInvDeltaMicro)).toLong
      s"($i, 'refresh_${"%02d".format(i)}', '${seedBase + i}', " +
        s"$epsMicro, $rho, $cum, $epsD, ${budgetMicro - epsD})"
    }.mkString(",\n       |    ")
    val thrRows = graft.operators.Quality
      .dpNoiseThresholds(epsilon, clampK)
      .map { case (k, lo, hi) => s"($k, $lo, $hi)" }
      .mkString(",\n       |    ")
    val dom = domain.map(v => s"('$v')").mkString(", ")
    s"""WITH rel(seq, release, seed, eps_micro, rho_micro,
       |    cum_rho_micro, eps_at_delta_micro, remaining_micro) AS (
       |  VALUES
       |    $acctRows
       |), dom(lang) AS (VALUES $dom),
       |counts AS (
       |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM documents GROUP BY 1
       |), full0 AS (
       |  SELECT d.lang, COALESCE(c.c, CAST(0 AS BIGINT)) AS n
       |  FROM dom d LEFT JOIN counts c ON c.lang = d.lang
       |), thr(noise, lo, hi) AS (
       |  VALUES
       |    $thrRows
       |), ru AS (
       |  SELECT r.seq, f.n,
       |    ('0x' || substr(md5(concat_ws('|',
       |      coalesce(md5(f.lang), 'null'), r.seed)),
       |      1, 7))::BIGINT AS uu
       |  FROM rel r, full0 f
       |), rc AS (
       |  SELECT u.seq, GREATEST(0, u.n + t.noise) AS released
       |  FROM ru u JOIN thr t ON u.uu >= t.lo AND u.uu < t.hi
       |), nr AS (
       |  SELECT seq, CAST(COUNT(*) AS BIGINT) AS n_rows,
       |    CAST(SUM(released) AS BIGINT) AS released_total
       |  FROM rc GROUP BY 1
       |)
       |SELECT CAST(r.seq AS INT) AS seq, r.release,
       |  CAST(r.eps_micro AS BIGINT) AS eps_micro,
       |  CAST(r.rho_micro AS BIGINT) AS rho_micro,
       |  CAST(r.cum_rho_micro AS BIGINT) AS cum_rho_micro,
       |  CAST(r.eps_at_delta_micro AS BIGINT) AS eps_at_delta_micro,
       |  CAST($deltaPow10 AS INT) AS delta_pow10,
       |  CAST($budgetMicro AS BIGINT) AS budget_micro,
       |  CAST(r.remaining_micro AS BIGINT) AS remaining_micro,
       |  n.n_rows, n.released_total, TRUE AS basic_refused
       |FROM rel r JOIN nr n ON n.seq = r.seq
       |ORDER BY seq""".stripMargin
  }

  /** q348 oracle generator: the zCDP-PARALLEL ledger replay — the
    * accounting literals come from the SAME Scala function the
    * operator runs ([[graft.operators.Quality.zcdpParallelAccounting]]
    * — Σρ per shard, ρ_eff = max over shards, converted at δ on the
    * micro grid), the seed-rotated shard count mechanisms replay
    * through one (seq, shard, seed) VALUES table. Shards are
    * (tag, langs) pairs refreshed `nWeeks` times each, declared
    * INTERLEAVED (the gate's order). */
  private def dpZcdpParallelOracle(
      shards: Seq[(String, Seq[String], Long)], nWeeks: Int,
      epsMicro: Long, budgetMicro: Long, deltaPow10: Int,
      epsilon: Double, clampK: Int): String = {
    val entries = (1 to nWeeks).flatMap { i =>
      shards.map { case (tag, _, seedBase) =>
        (tag, f"${tag}_w$i%02d", seedBase + i)
      }
    }
    val acct = graft.operators.Quality.zcdpParallelAccounting(
      entries.map { case (tag, _, _) =>
        (Some(s"shard_$tag"): Option[String], epsMicro)
      }, deltaPow10)
    val acctRows = entries.zip(acct).zipWithIndex.map {
      case (((tag, name, seed), (rho, scope, charged, eff, epsD)),
          i) =>
        s"(${i + 1}, '$name', 'shard_$tag', '$tag', '$seed', " +
          s"$epsMicro, $rho, $scope, $charged, $eff, $epsD, " +
          s"${budgetMicro - epsD})"
    }.mkString(",\n       |    ")
    val domRows = shards.flatMap { case (tag, langs, _) =>
      langs.map(l => s"('$tag', '$l')")
    }.mkString(", ")
    val thrRows = graft.operators.Quality
      .dpNoiseThresholds(epsilon, clampK)
      .map { case (k, lo, hi) => s"($k, $lo, $hi)" }
      .mkString(",\n       |    ")
    s"""WITH rel(seq, release, pgroup, shard, seed, eps_micro,
       |    rho_micro, scope_cum_rho_micro, charged_rho_micro,
       |    eff_rho_micro, eps_at_delta_micro, remaining_micro) AS (
       |  VALUES
       |    $acctRows
       |), dom(shard, lang) AS (VALUES $domRows),
       |counts AS (
       |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM documents GROUP BY 1
       |), full0 AS (
       |  SELECT d.shard, d.lang, COALESCE(c.c, CAST(0 AS BIGINT))
       |    AS n
       |  FROM dom d LEFT JOIN counts c ON c.lang = d.lang
       |), thr(noise, lo, hi) AS (
       |  VALUES
       |    $thrRows
       |), ru AS (
       |  SELECT r.seq, f.n,
       |    ('0x' || substr(md5(concat_ws('|',
       |      coalesce(md5(f.lang), 'null'), r.seed)),
       |      1, 7))::BIGINT AS uu
       |  FROM rel r JOIN full0 f ON f.shard = r.shard
       |), rc AS (
       |  SELECT u.seq, GREATEST(0, u.n + t.noise) AS released
       |  FROM ru u JOIN thr t ON u.uu >= t.lo AND u.uu < t.hi
       |), nr AS (
       |  SELECT seq, CAST(COUNT(*) AS BIGINT) AS n_rows,
       |    CAST(SUM(released) AS BIGINT) AS released_total
       |  FROM rc GROUP BY 1
       |)
       |SELECT CAST(r.seq AS INT) AS seq, r.release, r.pgroup,
       |  CAST(r.eps_micro AS BIGINT) AS eps_micro,
       |  CAST(r.rho_micro AS BIGINT) AS rho_micro,
       |  CAST(r.scope_cum_rho_micro AS BIGINT)
       |    AS scope_cum_rho_micro,
       |  CAST(r.charged_rho_micro AS BIGINT) AS charged_rho_micro,
       |  CAST(r.eff_rho_micro AS BIGINT) AS eff_rho_micro,
       |  CAST(r.eps_at_delta_micro AS BIGINT) AS eps_at_delta_micro,
       |  CAST($deltaPow10 AS INT) AS delta_pow10,
       |  CAST($budgetMicro AS BIGINT) AS budget_micro,
       |  CAST(r.remaining_micro AS BIGINT) AS remaining_micro,
       |  n.n_rows, n.released_total,
       |  TRUE AS basic_seq_refused, TRUE AS basic_parallel_refused,
       |  TRUE AS zcdp_seq_refused
       |FROM rel r JOIN nr n ON n.seq = r.seq
       |ORDER BY seq""".stripMargin
  }

  /** q349 oracle generator: the user-level bounded-contribution SUM
    * release replay — capPerKey as the per-user row_number window,
    * per-row values floored and clamped into [0, clampHi], domain
    * sums, thresholds at ε/(cap·clampHi) from the same Scala
    * function the operator uses. */
  private def dpUserSumDomainOracle(
      domain: Seq[String], epsilon: Double, seed: Long,
      userCap: Int, clampHi: Long, clampK: Int): String = {
    val rows = graft.operators.Quality
      .dpNoiseThresholds(epsilon / (userCap * clampHi), clampK)
      .map { case (k, lo, hi) => s"($k, $lo, $hi)" }
      .mkString(",\n    ")
    val dom = domain.map(v => s"('$v')").mkString(", ")
    s"""WITH capped AS (
       |  SELECT event_type, "value" FROM (
       |    SELECT event_type, "value", row_number() OVER (
       |      PARTITION BY user_id
       |      ORDER BY md5(CAST(event_id AS VARCHAR)), event_id)
       |      AS rn
       |    FROM events) WHERE rn <= $userCap
       |), dom(event_type) AS (VALUES $dom),
       |sums AS (
       |  SELECT event_type,
       |    CAST(SUM(LEAST(GREATEST(
       |      COALESCE(CAST(floor("value") AS BIGINT),
       |        CAST(0 AS BIGINT)),
       |      CAST(0 AS BIGINT)), $clampHi)) AS BIGINT) AS c
       |  FROM capped GROUP BY 1
       |), full0 AS (
       |  SELECT d.event_type, COALESCE(s.c, CAST(0 AS BIGINT)) AS n
       |  FROM dom d LEFT JOIN sums s ON s.event_type = d.event_type
       |), thr(noise, lo, hi) AS (
       |  VALUES
       |    $rows
       |), u AS (
       |  SELECT event_type, n,
       |    ('0x' || substr(md5(concat_ws('|',
       |      coalesce(md5(event_type), 'null'), '$seed')),
       |      1, 7))::BIGINT AS uu
       |  FROM full0
       |)
       |SELECT event_type, GREATEST(0, n + noise) AS released_sum,
       |  TRUE AS uncapped_refused
       |FROM u JOIN thr ON u.uu >= thr.lo AND u.uu < thr.hi
       |ORDER BY event_type""".stripMargin
  }

  private def dpDomainOracle(
      domain: Seq[String], epsilon: Double, seed: Long,
      clampK: Int): String = {
    val rows = graft.operators.Quality
      .dpNoiseThresholds(epsilon, clampK)
      .map { case (k, lo, hi) => s"($k, $lo, $hi)" }
      .mkString(",\n    ")
    val dom = domain.map(v => s"('$v')").mkString(", ")
    s"""WITH dom(lang) AS (VALUES $dom),
       |counts AS (
       |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM documents GROUP BY 1
       |), full0 AS (
       |  SELECT d.lang, COALESCE(c.c, CAST(0 AS BIGINT)) AS n
       |  FROM dom d LEFT JOIN counts c ON c.lang = d.lang
       |), thr(noise, lo, hi) AS (
       |  VALUES
       |    $rows
       |), u AS (
       |  SELECT lang, n,
       |    ('0x' || substr(md5(concat_ws('|',
       |      coalesce(md5(lang), 'null'), '$seed')),
       |      1, 7))::BIGINT AS uu
       |  FROM full0
       |)
       |SELECT lang, GREATEST(0, n + noise) AS released_count
       |FROM u JOIN thr ON u.uu >= thr.lo AND u.uu < thr.hi
       |ORDER BY lang""".stripMargin
  }

  /** q297 oracle generator: the bounded-contribution ε-DP SUM
    * release replay — per-row values floor to the integer grid and
    * clamp into [0, clampHi] BEFORE the exact BIGINT sum (Δ =
    * clampHi), then the q288 mechanism at ε/Δ; the threshold table
    * is generated by the same Scala function the operator uses. */
  private def dpSumOracle(
      epsilon: Double, seed: Long, clampHi: Long,
      clampK: Int): String = {
    val rows = graft.operators.Quality
      .dpNoiseThresholds(epsilon / clampHi.toDouble, clampK)
      .map { case (k, lo, hi) => s"($k, $lo, $hi)" }
      .mkString(",\n    ")
    s"""WITH sums AS (
       |  SELECT event_type,
       |    CAST(SUM(LEAST(GREATEST(
       |      COALESCE(CAST(floor("value") AS BIGINT),
       |        CAST(0 AS BIGINT)),
       |      CAST(0 AS BIGINT)), $clampHi)) AS BIGINT) AS n
       |  FROM events GROUP BY 1
       |), thr(noise, lo, hi) AS (
       |  VALUES
       |    $rows
       |), u AS (
       |  SELECT event_type, n,
       |    ('0x' || substr(md5(concat_ws('|',
       |      coalesce(md5(event_type), 'null'), '$seed')),
       |      1, 7))::BIGINT AS uu
       |  FROM sums
       |)
       |SELECT event_type, GREATEST(0, n + noise) AS released_sum
       |FROM u JOIN thr ON u.uu >= thr.lo AND u.uu < thr.hi
       |ORDER BY event_type""".stripMargin
  }

  /**
   * q298 oracle generator: the COMPOSED IVF+PQ recall sweep — the
   * q228 code/ADC CTE chain replicated per m point, the q290
   * routing/sweep/exact-truth scaffolding shared across them.
   * Rankings ride exact DECIMAL(18,6) ADC sums (equal-code
   * candidates tie EXACTLY — the q199 engine-free tie contract).
   */
  private def ivfPqRecallOracle(
      nlist: Int, ms: Seq[Int], kCb: Int, nprobes: Seq[Int], k: Int,
      probeLo: Long, probeHi: Long): String = {
    val npMax = nprobes.max
    def pf(a: String) =
      s"$a.vec_id >= $probeLo AND $a.vec_id < $probeHi"
    val sweepVals = nprobes.sorted.map(np => s"($np)").mkString(", ")
    val head =
      s"""WITH dims AS (
         |  SELECT CAST(len(embedding) AS INT) AS dd
         |  FROM embeddings ORDER BY vec_id LIMIT 1
         |), el AS (
         |  SELECT vec_id,
         |    CAST(generate_subscripts(embedding,1)-1 AS INT) AS d,
         |    CAST(unnest(embedding) AS DOUBLE) AS x
         |  FROM embeddings
         |), nrm AS (
         |  SELECT vec_id, sqrt(SUM(x*x)) AS n FROM el GROUP BY vec_id
         |), seed_ids AS (
         |  SELECT vec_id AS cell_vid,
         |    CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell
         |  FROM embeddings ORDER BY vec_id LIMIT $nlist
         |), snrm AS (
         |  SELECT s.cell, sqrt(SUM(e.x * e.x)) AS sn
         |  FROM seed_ids s JOIN el e ON e.vec_id = s.cell_vid
         |  GROUP BY s.cell
         |), vc AS (
         |  -- cellRanking's metric: v·s/|s| (probe norm is rank-inert)
         |  SELECT e.vec_id, s.cell,
         |    SUM(e.x * se.x) / any_value(sn.sn) AS cosn
         |  FROM el e
         |  JOIN seed_ids s ON TRUE
         |  JOIN el se ON se.vec_id = s.cell_vid AND se.d = e.d
         |  JOIN snrm sn ON sn.cell = s.cell
         |  GROUP BY e.vec_id, s.cell
         |), assign AS (
         |  SELECT vec_id, cell FROM (
         |    SELECT vec_id, cell, row_number() OVER (
         |      PARTITION BY vec_id ORDER BY cosn DESC, cell) AS rn
         |    FROM vc) WHERE rn = 1
         |), pcells AS (
         |  SELECT vec_id AS probe_id, cell, CAST(rn AS INT) AS cell_rank
         |  FROM (
         |    SELECT vec_id, cell, row_number() OVER (
         |      PARTITION BY vec_id ORDER BY cosn DESC, cell) AS rn
         |    FROM vc WHERE ${pf("vc")}) WHERE rn <= $npMax
         |), cseeds AS (
         |  SELECT vec_id AS sid,
         |    CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS code
         |  FROM embeddings ORDER BY vec_id LIMIT $kCb
         |), sweep(nprobe) AS (VALUES $sweepVals),
         |exact AS (
         |  SELECT probe_id, vec_id FROM (
         |    SELECT dd2.probe_id, dd2.vec_id,
         |      row_number() OVER (PARTITION BY dd2.probe_id
         |        ORDER BY dd2.dp / (np.n * nv.n) DESC, dd2.vec_id) AS r
         |    FROM (
         |      SELECT ep.vec_id AS probe_id, ev.vec_id,
         |        SUM(ep.x * ev.x) AS dp
         |      FROM el ep JOIN el ev
         |        ON ev.d = ep.d AND ev.vec_id <> ep.vec_id
         |      WHERE ${pf("ep")}
         |      GROUP BY 1, 2) dd2
         |    JOIN nrm np ON np.vec_id = dd2.probe_id
         |    JOIN nrm nv ON nv.vec_id = dd2.vec_id)
         |  WHERE r <= $k
         |), et AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS exact_pairs,
         |    CAST(COUNT(DISTINCT probe_id) AS BIGINT) AS n_probes
         |  FROM exact
         |)""".stripMargin
    val perM = ms.map { m =>
      val sub = s"((SELECT dd FROM dims) // $m)"
      s""", cb$m AS (
         |  SELECT CAST(e.d // $sub AS INT) AS s, sd.code,
         |         CAST(e.d % $sub AS INT) AS j, e.x AS c
         |  FROM el e JOIN cseeds sd ON e.vec_id = sd.sid
         |), vd$m AS (
         |  SELECT v.vec_id, b.s, b.code,
         |    SUM(b.c * b.c) - 2.0 * SUM(v.x * b.c) AS dist
         |  FROM el v
         |  JOIN cb$m b ON b.s = v.d // $sub AND b.j = v.d % $sub
         |  GROUP BY 1, 2, 3
         |), codes$m AS (
         |  SELECT vec_id, s, code FROM (
         |    SELECT vec_id, s, code, row_number() OVER (
         |      PARTITION BY vec_id, s ORDER BY dist, code) AS rn
         |    FROM vd$m) WHERE rn = 1
         |), tab$m AS (
         |  SELECT p.vec_id AS pid, b.s, b.code,
         |    CAST(round(SUM((p.x - b.c) * (p.x - b.c)), 6)
         |      AS DECIMAL(18,6)) AS d2
         |  FROM el p
         |  JOIN cb$m b ON b.s = p.d // $sub AND b.j = p.d % $sub
         |  WHERE ${pf("p")}
         |  GROUP BY 1, 2, 3
         |), score$m AS (
         |  SELECT t.pid, c.vec_id, pc.cell_rank, SUM(t.d2) AS adc
         |  FROM codes$m c
         |  JOIN assign a ON a.vec_id = c.vec_id
         |  JOIN tab$m t ON t.s = c.s AND t.code = c.code
         |  JOIN pcells pc ON pc.probe_id = t.pid AND pc.cell = a.cell
         |  WHERE c.vec_id <> t.pid
         |  GROUP BY 1, 2, 3
         |), approx$m AS (
         |  SELECT nprobe, pid, vec_id FROM (
         |    SELECT sw.nprobe, sc.pid, sc.vec_id, row_number() OVER (
         |      PARTITION BY sw.nprobe, sc.pid
         |      ORDER BY sc.adc, sc.vec_id) AS r
         |    FROM score$m sc JOIN sweep sw ON sc.cell_rank <= sw.nprobe)
         |  WHERE r <= $k
         |), hits$m AS (
         |  SELECT CAST($m AS INT) AS m, a.nprobe,
         |    CAST(COUNT(*) AS BIGINT) AS hit_pairs
         |  FROM approx$m a JOIN exact e
         |    ON e.probe_id = a.pid AND e.vec_id = a.vec_id
         |  GROUP BY 1, 2
         |)""".stripMargin
    }.mkString("\n")
    val mVals = ms.map(m => s"($m)").mkString(", ")
    val allHits = ms.map(m => s"SELECT * FROM hits$m")
      .mkString("\n  UNION ALL\n  ")
    s"""$head
       |$perM
       |, grid AS (
       |  SELECT CAST(mm.m AS INT) AS m, sw.nprobe
       |  FROM (VALUES $mVals) mm(m) CROSS JOIN sweep sw
       |), allhits AS (
       |  $allHits
       |)
       |SELECT g.m, g.nprobe, et.n_probes, et.exact_pairs,
       |  COALESCE(h.hit_pairs, CAST(0 AS BIGINT)) AS hit_pairs,
       |  round(CAST(COALESCE(h.hit_pairs, CAST(0 AS BIGINT)) AS DOUBLE)
       |    / CAST(et.exact_pairs AS DOUBLE), 6) AS recall
       |FROM grid g LEFT JOIN allhits h
       |  ON h.m = g.m AND h.nprobe = g.nprobe
       |CROSS JOIN et
       |ORDER BY g.m, g.nprobe""".stripMargin
  }

  /**
   * q300 oracle generator: term-frequency-adjusted Fellegi–Sunter —
   * the q267 weight replay with the agreement weight computed PER
   * VALUE (log₂(m / (cnt_v / N)), the Splink tf adjustment) from the
   * same value-frequency tables, joined onto agreeing pairs by the
   * agreed value; disagreement keeps the global-u weight.
   */
  private def fsTfOracle(
      fields: Seq[(String, Double)], window: Int, limit: Int)
      : String = {
    val wds = fields.zipWithIndex.map { case ((_, m), i0) =>
      val i = i0 + 1
      s"""vc$i AS (
         |  SELECT f$i AS value, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM rec WHERE f$i IS NOT NULL GROUP BY 1
         |), n$i AS (
         |  SELECT SUM(c) AS n, SUM(c * (c - 1)) AS agree FROM vc$i
         |), wd$i AS (
         |  SELECT CAST(round(log2((CAST(1 AS DOUBLE)
         |      - CAST($m AS DOUBLE)) / (CAST(1 AS DOUBLE) - u)), 6)
         |    AS DECIMAL(18,6)) AS wd
         |  FROM (SELECT GREATEST(LEAST(
         |      CAST(agree AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE),
         |      CAST(1 AS DOUBLE)
         |        - CAST(1 AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE)),
         |      CAST(1 AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE)) AS u
         |    FROM n$i)
         |), wa$i AS (
         |  SELECT vc$i.value,
         |    CAST(round(log2(CAST($m AS DOUBLE)
         |      / (CAST(vc$i.c AS DOUBLE) / CAST(n$i.n AS DOUBLE))), 6)
         |    AS DECIMAL(18,6)) AS wa
         |  FROM vc$i CROSS JOIN n$i
         |)""".stripMargin
    }.mkString(", ")
    val flags = fields.indices.map { i0 =>
      val i = i0 + 1
      s"""    CASE WHEN a.f$i IS NULL OR b.f$i IS NULL THEN '-'
         |      WHEN a.f$i = b.f$i THEN '1' ELSE '0' END AS g$i,
         |    a.f$i AS v$i""".stripMargin
    }.mkString(",\n")
    val patt = fields.indices.map(i => s"g${i + 1}").mkString(" || ")
    val nAgr = fields.indices
      .map(i => s"(CASE WHEN g${i + 1} = '1' THEN 1 ELSE 0 END)")
      .mkString("\n    + ")
    val scoreTerms = fields.indices.map { i0 =>
      val i = i0 + 1
      s"""(CASE WHEN g$i = '1' THEN a$i.wa
         |      WHEN g$i = '0' THEN wd$i.wd ELSE 0 END)""".stripMargin
    }.mkString("\n    + ")
    val agJoins = fields.indices.map { i0 =>
      val i = i0 + 1
      s"LEFT JOIN wa$i a$i ON f.g$i = '1' AND a$i.value = f.v$i"
    }.mkString("\n")
    val wdJoins = fields.indices
      .map(i => s"CROSS JOIN wd${i + 1}").mkString(" ")
    s"""WITH rec AS (
       |  SELECT p_partkey AS id, p_name,
       |    p_brand AS f1, p_type AS f2,
       |    string_split(p_name, ' ')[1] AS f3
       |  FROM part
       |), rk AS (
       |  SELECT id, f1, f2, f3,
       |    row_number() OVER (ORDER BY p_name, id) AS rn
       |  FROM rec
       |), cand AS (
       |  SELECT DISTINCT least(a.id, b.id) AS id_a,
       |    greatest(a.id, b.id) AS id_b
       |  FROM rk a JOIN rk b ON b.rn > a.rn AND b.rn <= a.rn + $window
       |), $wds, flg AS (
       |  SELECT c.id_a, c.id_b,
       |$flags
       |  FROM cand c JOIN rec a ON a.id = c.id_a
       |  JOIN rec b ON b.id = c.id_b
       |)
       |SELECT f.id_a, f.id_b,
       |  $patt AS pattern,
       |  CAST($nAgr AS BIGINT) AS n_agree,
       |  CAST(CAST(
       |    $scoreTerms AS DECIMAL(18,6)) AS DOUBLE) AS score
       |FROM flg f
       |$agJoins
       |$wdJoins
       |ORDER BY score DESC, id_a, id_b
       |LIMIT $limit""".stripMargin
  }

  /**
   * q195 oracle generator: replays `Similarity.principalComponents`'
   * quantized power iteration in DuckDB, iteration by iteration — the
   * q123-PageRank pattern applied to an eigensolve. The base matrix
   * is the q167 floor-grid covariance cast to exact DECIMAL(10,6)
   * (a round(6) double recovers its 6dp decimal exactly under any
   * faithful cast), mirrored to full (a,b) form. Per iteration:
   * products round HALF_UP to 12dp (DuckDB decimal round = Java
   * HALF_UP: both are half-away-from-zero on the exact value), sums
   * are exact decimals, magnitude control multiplies by DECIMAL(4,3)
   * powers of ten. Doubles appear only at the IEEE-deterministic
   * points (λ division, sqrt, normalization, deflation re-round).
   * Width proof: y DECIMAL(20,12) (|z| < 10⁸), products ≤
   * DECIMAL(30,18), Rayleigh terms (13,12)·(10,6)·(13,12) →
   * DECIMAL(36,30) — nothing promotes to DOUBLE (DuckDB caps at 38).
   * `AS MATERIALIZED` pins each stage so the chain is linear, not
   * exponential (the round-5 CTE-inlining gotcha).
   */
  private def pcaOracleSql(k: Int, iters: Int): String = {
    val base =
      """WITH clean AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  WHERE len(list_filter(embedding, x -> x IS NULL)) = 0
        |), el AS (
        |  SELECT vec_id,
        |    CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS i,
        |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000.0)
        |      AS BIGINT) AS q
        |  FROM clean
        |), sums AS (
        |  SELECT a.i AS i, b.i AS j,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(SUM(a.q) AS DOUBLE) AS sx,
        |    CAST(SUM(b.q) AS DOUBLE) AS sy,
        |    CAST(SUM(a.q * b.q) AS DOUBLE) AS sxy
        |  FROM el a JOIN el b ON b.vec_id = a.vec_id AND b.i >= a.i
        |  GROUP BY 1, 2
        |), cells AS MATERIALIZED (
        |  SELECT i, j,
        |    CAST(round(CASE WHEN n >= 2 THEN
        |      (CAST(n AS DOUBLE) * sxy - sx * sy)
        |      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))
        |      / 1000000000000.0 ELSE 0 END, 6) AS DECIMAL(10,6)) AS c
        |  FROM sums
        |), m0 AS MATERIALIZED (
        |  SELECT i AS a, j AS b, c FROM cells
        |  UNION ALL
        |  SELECT j AS a, i AS b, c FROM cells WHERE i <> j
        |), dims AS MATERIALIZED (SELECT DISTINCT a AS i FROM m0)""".stripMargin
    val comps = (0 until k).map { ci =>
      val iterCtes = (1 to iters).map { t =>
        s"""z${ci}_$t AS (
           |  SELECT m.a AS i, CAST(SUM(round(m.c * x.y, 12)) AS DECIMAL(20,12)) AS z
           |  FROM m$ci m JOIN x${ci}_${t - 1} x ON x.i = m.b GROUP BY m.a
           |), mx${ci}_$t AS (SELECT max(abs(z)) AS m FROM z${ci}_$t),
           |x${ci}_$t AS MATERIALIZED (
           |  SELECT z.i, CAST(CASE
           |      WHEN mx.m = 0 THEN x.y
           |      WHEN mx.m >= 1000 THEN round(z.z * CAST(0.001 AS DECIMAL(4,3)), 12)
           |      WHEN mx.m < CAST(0.1 AS DECIMAL(2,1)) THEN round(z.z * 1000, 12)
           |      ELSE z.z END AS DECIMAL(20,12)) AS y
           |  FROM z${ci}_$t z JOIN x${ci}_${t - 1} x ON x.i = z.i
           |  CROSS JOIN mx${ci}_$t mx
           |)""".stripMargin
      }.mkString(",\n")
      val deflate =
        if (ci < k - 1)
          s""",
             |m${ci + 1} AS MATERIALIZED (
             |  SELECT m.a, m.b,
             |    CAST(round(CAST(m.c AS DOUBLE)
             |      - (SELECT lam FROM ray$ci) * va.v * vb.v, 6)
             |      AS DECIMAL(10,6)) AS c
             |  FROM m$ci m
             |  JOIN v$ci va ON va.i = m.a
             |  JOIN v$ci vb ON vb.i = m.b
             |)""".stripMargin
        else ""
      s"""s$ci AS (SELECT a FROM m$ci WHERE a = b ORDER BY c DESC, a LIMIT 1),
         |x${ci}_0 AS MATERIALIZED (
         |  SELECT i, CAST(CASE WHEN i = (SELECT a FROM s$ci) THEN 1 ELSE 0 END
         |    AS DECIMAL(20,12)) AS y
         |  FROM dims
         |),
         |$iterCtes,
         |fm$ci AS (SELECT max(abs(y)) AS m FROM x${ci}_$iters),
         |y1_$ci AS MATERIALIZED (
         |  SELECT i, CAST(round(y * (SELECT CASE
         |      WHEN m >= 100 THEN CAST(0.001 AS DECIMAL(4,3))
         |      WHEN m >= 10 THEN CAST(0.010 AS DECIMAL(4,3))
         |      WHEN m >= 1 THEN CAST(0.100 AS DECIMAL(4,3))
         |      ELSE CAST(1.000 AS DECIMAL(4,3)) END FROM fm$ci), 12)
         |    AS DECIMAL(13,12)) AS y
         |  FROM x${ci}_$iters
         |),
         |ray$ci AS (SELECT
         |    CAST((SELECT SUM(a.y * m.c * b.y)
         |          FROM m$ci m
         |          JOIN y1_$ci a ON a.i = m.a
         |          JOIN y1_$ci b ON b.i = m.b) AS DOUBLE)
         |  / CAST((SELECT SUM(y * y) FROM y1_$ci) AS DOUBLE) AS lam),
         |sgn$ci AS (SELECT CASE
         |    WHEN (SELECT y FROM y1_$ci ORDER BY abs(y) DESC, i LIMIT 1) < 0
         |    THEN -1.0 ELSE 1.0 END AS s),
         |nrm$ci AS (SELECT
         |    sqrt(CAST((SELECT SUM(y * y) FROM y1_$ci) AS DOUBLE)) AS n),
         |v$ci AS MATERIALIZED (
         |  SELECT i,
         |    (CAST(y AS DOUBLE) * (SELECT s FROM sgn$ci))
         |      / (SELECT n FROM nrm$ci) AS v
         |  FROM y1_$ci
         |)$deflate""".stripMargin
    }.mkString(",\n")
    val unions = (0 until k).map { ci =>
      s"""  SELECT $ci AS component, CAST(i AS INT) AS dim,
         |    round((SELECT lam FROM ray$ci), 6) + 0.0 AS eigenvalue,
         |    round(v, 6) + 0.0 AS loading
         |  FROM v$ci""".stripMargin
    }.mkString("\n  UNION ALL\n")
    s"""$base,
       |$comps
       |SELECT component, dim, eigenvalue, loading FROM (
       |$unions
       |)
       |ORDER BY component, dim""".stripMargin
  }

  /** Seed PQ codebooks for q198/q199: subspace `s`'s entries are the
    * 4 lowest-vec_id vectors' s-th subvectors — deterministic and
    * DuckDB-expressible (row_number over vec_id LIMIT 4), the q31
    * ivfSeeds pattern. Float components convert to double exactly,
    * so both engines hold identical codebook values. */
  private def pqSeedCodebooks(
      s: SparkSession, dir: String, m: Int): Seq[Seq[Seq[Double]]] = {
    val seeds = t(s, dir, "embeddings")
      .orderBy("vec_id").limit(4).select("vec_id", "embedding").collect()
      .sortBy(_.getLong(0))
      .map(_.getSeq[Float](1).map(_.toDouble).toSeq).toSeq
    val d = seeds.head.length
    require(d % m == 0, s"dims $d must divide into m=$m subspaces")
    val sub = d / m
    (0 until m).map(si => seeds.map(v => v.slice(si * sub, (si + 1) * sub)))
  }

  /**
   * q202/q203 oracle generator: the shared WITH-chain replaying
   * [[graft.operators.Bpe.train]] round by round in DuckDB (the q200
   * CTE-chain pattern applied to a tokenizer trainer). Per round:
   * overlapping adjacent-pair counts from the double-space symbol
   * strings (`string_split`/`generate_series`, exact BIGINT sums),
   * the (cnt desc, lhs, rhs) argmax, then the literal
   * `replace(" l  r " → " lr ")` whose left-to-right non-overlapping
   * scan is bit-identical to Java/Spark `replace` (BpeSpec pins the
   * same-symbol-run cases). Everything is integer or literal string
   * work — no float enters until q203's floor-grid compression.
   */
  private def bpeOracleChain(numMerges: Int,
      corpusFrom: String = "documents"): String = {
    val head =
      s"""w AS MATERIALIZED (
        |  SELECT word, CAST(count(*) AS BIGINT) AS freq FROM (
        |    SELECT unnest(string_split_regex(text, '\\s+')) AS word
        |    FROM $corpusFrom
        |  ) WHERE word <> '' GROUP BY 1
        |),
        |v0 AS MATERIALIZED (
        |  SELECT word,
        |    ' ' || array_to_string(string_split(word, ''), '  ') || ' '
        |      AS sym,
        |    freq
        |  FROM w
        |)""".stripMargin
    val rounds = (1 to numMerges).map { r =>
      s"""t$r AS (SELECT string_split(trim(sym), '  ') AS toks, freq
         |  FROM v${r - 1}),
         |e$r AS (SELECT toks, freq,
         |  unnest(generate_series(1, len(toks) - 1)) AS i FROM t$r),
         |p$r AS (SELECT toks[i] AS lhs, toks[i + 1] AS rhs,
         |  CAST(SUM(freq) AS BIGINT) AS cnt FROM e$r GROUP BY 1, 2),
         |b$r AS MATERIALIZED (
         |  SELECT CAST($r AS INT) AS rank, lhs, rhs, cnt FROM p$r
         |  ORDER BY cnt DESC, lhs, rhs LIMIT 1),
         |v$r AS MATERIALIZED (
         |  SELECT v.word,
         |    replace(v.sym, ' ' || b.lhs || '  ' || b.rhs || ' ',
         |            ' ' || b.lhs || b.rhs || ' ') AS sym,
         |    v.freq
         |  FROM v${r - 1} v CROSS JOIN b$r b)""".stripMargin
    }.mkString(",\n")
    s"$head,\n$rounds"
  }

  /** q202 oracle: the [[bpeOracleChain]] merge table. */
  private def bpeMergesOracleSql(numMerges: Int,
      corpusFrom: String = "documents"): String = {
    val union = (1 to numMerges)
      .map(r => s"SELECT * FROM b$r").mkString("\n  UNION ALL\n  ")
    s"""WITH ${bpeOracleChain(numMerges, corpusFrom)}
       |SELECT rank, lhs, rhs, cnt AS pair_count FROM (
       |  $union
       |) ORDER BY rank""".stripMargin
  }

  /**
   * q330 oracle generator: the T60 unigram-LM trainer replayed in
   * full — seed substring counts, engine-ln micro scores (q190
   * discipline), then per EM round the Viterbi DP unrolled over word
   * positions (argmax per position as row_number over (score DESC,
   * piece-length DESC) — exact long arithmetic, the operator's tie
   * rule), the backtrack chain, M-step recounts, and the
   * strict-improvement accept gate as a prefix-min with the final
   * model CASE-selected by the last accepted round (the q322 rule).
   */
  private def unigramLmChain(
      rounds: Int, multiKeep: Int, maxWordLen: Int,
      seedMaxPieceLen: Int, minCount: Long): String = {
    val L = seedMaxPieceLen
    def roundChain(r: Int): String = {
      val dp0 =
        s""", u${r}dp0 AS MATERIALIZED (
           |  SELECT word, CAST(0 AS BIGINT) AS score, 0 AS l FROM wv
           |)""".stripMargin
      val dps = (1 to maxWordLen).map { i =>
        val branches = (1 to math.min(L, i)).map { l =>
          s"""SELECT d.word, d.score + p.lp AS score, $l AS l
             |      FROM u${r}dp${i - l} d
             |      JOIN p$r p ON p.piece = substr(d.word, ${i - l + 1}, $l)
             |      WHERE length(d.word) >= $i""".stripMargin
        }.mkString("\n      UNION ALL\n      ")
        s""", u${r}dp$i AS MATERIALIZED (
           |  SELECT word, score, l FROM (
           |    SELECT word, score, l, row_number() OVER (
           |      PARTITION BY word ORDER BY score DESC, l DESC) AS rn
           |    FROM (
           |      $branches
           |    )) WHERE rn = 1
           |)""".stripMargin
      }.mkString("\n")
      val finUnion = (1 to maxWordLen).map { i =>
        s"""SELECT w.word, w.freq, d.score, d.l, $i AS pos
           |  FROM u${r}dp$i d
           |  JOIN wv w ON w.word = d.word AND length(w.word) = $i"""
          .stripMargin
      }.mkString("\n  UNION ALL\n  ")
      val dpallUnion = (1 to maxWordLen)
        .map(i => s"SELECT word, $i AS pos, score, l FROM u${r}dp$i")
        .mkString("\n  UNION ALL\n  ")
      val bts = (2 to maxWordLen).map { j =>
        s""", u${r}bt$j AS MATERIALIZED (
           |  SELECT b.word, b.freq, b.pos - b.l AS pos, d.l
           |  FROM u${r}bt${j - 1} b
           |  JOIN u${r}dpall d
           |    ON d.word = b.word AND d.pos = b.pos - b.l
           |  WHERE b.pos - b.l > 0
           |)""".stripMargin
      }.mkString("\n")
      val pieceUnion = (1 to maxWordLen).map { j =>
        s"""SELECT freq, substr(word, pos - l + 1, l) AS piece
           |  FROM u${r}bt$j""".stripMargin
      }.mkString("\n  UNION ALL\n  ")
      s"""$dp0
         |$dps
         |, u${r}fin AS MATERIALIZED (
         |  $finUnion
         |), u${r}dpall AS MATERIALIZED (
         |  $dpallUnion
         |), u${r}bt1 AS MATERIALIZED (
         |  SELECT word, freq, pos, l FROM u${r}fin
         |)
         |$bts
         |, u${r}cnt AS MATERIALIZED (
         |  SELECT piece, CAST(SUM(freq) AS BIGINT) AS cnt FROM (
         |  $pieceUnion
         |  ) GROUP BY piece
         |), p${r + 1} AS MATERIALIZED (
         |  SELECT piece, cnt,
         |    CAST(CAST(round(ln(CAST(cnt AS DOUBLE) /
         |      CAST((SELECT SUM(cnt) FROM u${r}cnt) AS DOUBLE)), 6)
         |      AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS lp
         |  FROM u${r}cnt
         |)""".stripMargin
    }
    val chains = (1 to rounds).map(roundChain).mkString("\n")
    val trUnion = (1 to rounds).map { r =>
      s"""SELECT $r AS round,
         |    (SELECT CAST(SUM(freq * score) AS BIGINT) FROM u${r}fin)
         |      AS ll""".stripMargin
    }.mkString("\n  UNION ALL\n  ")
    val pfinUnion = (1 to rounds)
      .map(r => s"SELECT * FROM p$r WHERE (SELECT lastr FROM accx) = $r")
      .mkString("\n  UNION ALL\n  ")
    s"""wv AS MATERIALIZED (
       |  SELECT word, CAST(count(*) AS BIGINT) AS freq FROM (
       |    SELECT unnest(string_split_regex(text, '\\s+')) AS word
       |    FROM documents)
       |  WHERE word <> '' AND length(word) <= $maxWordLen
       |  GROUP BY word
       |), sub0 AS (
       |  SELECT w.word, w.freq, ll.l,
       |    unnest(generate_series(1, length(w.word) - ll.l + 1)) AS i
       |  FROM wv w, (SELECT unnest(range(1, ${L + 1})) AS l) ll
       |  WHERE length(w.word) >= ll.l
       |), pc AS MATERIALIZED (
       |  SELECT piece, CAST(SUM(freq) AS BIGINT) AS cnt FROM (
       |    SELECT substr(word, i, l) AS piece, freq FROM sub0
       |  ) GROUP BY piece
       |), seed AS MATERIALIZED (
       |  SELECT piece, cnt FROM pc WHERE length(piece) = 1
       |  UNION ALL
       |  SELECT piece, cnt FROM (
       |    SELECT piece, cnt,
       |      row_number() OVER (ORDER BY cnt DESC, piece ASC) AS rn
       |    FROM pc WHERE length(piece) >= 2 AND cnt >= $minCount)
       |  WHERE rn <= $multiKeep
       |), p1 AS MATERIALIZED (
       |  SELECT piece, cnt,
       |    CAST(CAST(round(ln(CAST(cnt AS DOUBLE) /
       |      CAST((SELECT SUM(cnt) FROM seed) AS DOUBLE)), 6)
       |      AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS lp
       |  FROM seed
       |)
       |$chains
       |, trx AS (
       |  $trUnion
       |), accx AS MATERIALIZED (
       |  SELECT CAST(MAX(round) AS BIGINT) AS lastr FROM (
       |    SELECT round, MIN(f) OVER (ORDER BY round
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ok
       |    FROM (
       |      SELECT round, CASE WHEN round = 1 THEN 1
       |        WHEN ll > lag(ll) OVER (ORDER BY round) THEN 1
       |        ELSE 0 END AS f
       |      FROM trx)
       |  ) WHERE ok = 1
       |), pfin AS (
       |  $pfinUnion
       |)""".stripMargin
  }

  private def unigramLmOracleSql(
      rounds: Int, multiKeep: Int, maxWordLen: Int,
      seedMaxPieceLen: Int, minCount: Long): String = {
    val chain = unigramLmChain(rounds, multiKeep, maxWordLen,
      seedMaxPieceLen, minCount)
    s"""WITH $chain
       |SELECT CAST(rn AS INT) AS rank, piece, cnt AS piece_count,
       |  lp AS logp_micro
       |FROM (
       |  SELECT piece, cnt, lp,
       |    row_number() OVER (ORDER BY cnt DESC, piece ASC) AS rn
       |  FROM pfin)
       |ORDER BY rank""".stripMargin
  }

  /** q333 oracle: encode under the final accepted model — per-word
    * token counts REUSE the last accepted round's backtrack tables
    * (encode's Viterbi under the final model IS that round's
    * segmentation), CASE-gated by lastr; words outside the training
    * vocab (longer than maxWordLen) fall back to char count via the
    * q203 COALESCE rule; q203's floor-grid compression finish. */
  private def unigramLmEncodeOracleSql(
      rounds: Int, multiKeep: Int, maxWordLen: Int,
      seedMaxPieceLen: Int, minCount: Long): String = {
    val chain = unigramLmChain(rounds, multiKeep, maxWordLen,
      seedMaxPieceLen, minCount)
    val tokcs = (1 to rounds).map { r =>
      val pu = (1 to maxWordLen)
        .map(j => s"SELECT word FROM u${r}bt$j")
        .mkString("\n    UNION ALL\n    ")
      s""", u${r}tokc AS (
         |  SELECT word, CAST(COUNT(*) AS BIGINT) AS tok FROM (
         |    $pu
         |  ) GROUP BY word
         |)""".stripMargin
    }.mkString("\n")
    val tokUnion = (1 to rounds)
      .map(r =>
        s"SELECT word, tok FROM u${r}tokc\n  " +
          s"WHERE (SELECT lastr FROM accx) = $r")
      .mkString("\n  UNION ALL\n  ")
    s"""WITH $chain
       |$tokcs
       |, utok AS (
       |  $tokUnion
       |), dw AS (
       |  SELECT doc_id, word FROM (
       |    SELECT doc_id,
       |      unnest(string_split_regex(text, '\\s+')) AS word
       |    FROM documents
       |  ) WHERE word <> ''
       |)
       |SELECT dw.doc_id,
       |  CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(SUM(length(dw.word)) AS BIGINT) AS n_chars,
       |  CAST(SUM(COALESCE(u.tok, length(dw.word))) AS BIGINT)
       |    AS n_tokens,
       |  floor(CAST(SUM(length(dw.word)) AS DOUBLE)
       |      / CAST(SUM(COALESCE(u.tok, length(dw.word))) AS DOUBLE)
       |      * 1000000.0) / 1000000.0 AS compression
       |FROM dw LEFT JOIN utok u USING (word)
       |GROUP BY 1 ORDER BY doc_id""".stripMargin
  }

  /** q299 re-mint corpus: deterministic single-letter runs derived
    * from doc_id — the BpeSpec symbol-run shape where one
    * concatenation is reachable from DIFFERENT decompositions across
    * rounds, so batched training MUST hit the accept-and-stop
    * re-mint guard mid-batch to stay sequential-exact. Rendered
    * identically on both engines (integer modulo + repeat). */
  private val remintCorpusSql: String =
    """(SELECT CASE WHEN doc_id % 3 = 0
      |  THEN repeat('b', CAST(doc_id % 9 + 2 AS INT))
      |  ELSE repeat('a', CAST(doc_id % 11 + 2 AS INT)) END AS text
      | FROM documents)""".stripMargin

  /** q203 oracle: the [[bpeOracleChain]] final vocab joined back to
    * the per-document word stream — dictionary-join encode, exactly
    * the operator's plan. COALESCE mirrors the char-fallback OOV
    * rule (vacuous here: the report corpus IS the training corpus). */
  private def bpeEncodeOracleSql(numMerges: Int): String =
    s"""WITH ${bpeOracleChain(numMerges)},
       |dw AS (
       |  SELECT doc_id, word FROM (
       |    SELECT doc_id,
       |      unnest(string_split_regex(text, '\\s+')) AS word
       |    FROM documents
       |  ) WHERE word <> ''
       |),
       |fv AS (SELECT word,
       |  CAST(len(string_split(trim(sym), '  ')) AS BIGINT) AS tok
       |  FROM v$numMerges)
       |SELECT dw.doc_id,
       |  CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(SUM(length(dw.word)) AS BIGINT) AS n_chars,
       |  CAST(SUM(COALESCE(fv.tok, length(dw.word))) AS BIGINT)
       |    AS n_tokens,
       |  floor(CAST(SUM(length(dw.word)) AS DOUBLE)
       |      / CAST(SUM(COALESCE(fv.tok, length(dw.word))) AS DOUBLE)
       |      * 1000000.0) / 1000000.0 AS compression
       |FROM dw LEFT JOIN fv USING (word)
       |GROUP BY 1 ORDER BY doc_id""".stripMargin

  /**
   * q220 oracle generator: replays `Profile.bootstrapMeanCI` — the
   * inverse-CDF thresholds are rendered from the SAME
   * `Profile.poissonCdf` doubles the Spark expression uses, the
   * resample means are exact-decimal weighted sums, and the CI picks
   * the identical nearest-rank order statistics.
   */
  private def bootstrapOracleSql(b: Int, alphaPerMille: Int): String = {
    val cdf = graft.operators.Profile.poissonCdf
    val cases = cdf.zipWithIndex
      .map { case (f, k) => s"WHEN u < $f THEN $k" }
      .mkString("\n        ")
    s"""WITH r AS (
       |  SELECT CAST(value AS DECIMAL(18,6)) AS v,
       |    CAST(event_id AS VARCHAR) AS id
       |  FROM events
       |  WHERE event_type = 'purchase' AND value IS NOT NULL
       |), e AS (
       |  SELECT v, id, CAST(bb.b AS INT) AS b FROM r
       |  CROSS JOIN (SELECT unnest(generate_series(0, ${b - 1})) AS b) bb
       |), uu AS (
       |  SELECT b, v,
       |    CAST(CAST(('0x' || substr(md5(id || ':' || CAST(b AS VARCHAR)),
       |      1, 15)) AS BIGINT) AS DOUBLE) / 1.152921504606847e18 AS u
       |  FROM e
       |), ww AS (
       |  SELECT b, v, CASE
       |        $cases
       |        ELSE 9 END AS w
       |  FROM uu
       |), g AS (
       |  SELECT b, CAST(SUM(w) AS BIGINT) AS ne,
       |    SUM(CAST(w AS DECIMAL(18,6)) * v) AS sv
       |  FROM ww GROUP BY b
       |), m AS (
       |  SELECT b, CAST(sv AS DOUBLE) / ne AS mb
       |  FROM g WHERE ne > 0
       |), rk AS (
       |  SELECT b, mb, row_number() OVER (ORDER BY mb, b) AS r,
       |    COUNT(*) OVER () AS nb
       |  FROM m
       |), ci AS (
       |  SELECT CAST(MAX(nb) AS BIGINT) AS n_resamples,
       |    MIN(CASE WHEN r = (nb * ${alphaPerMille / 2} + 999) // 1000
       |      THEN mb END) AS lo,
       |    MIN(CASE WHEN r = (nb * ${1000 - alphaPerMille / 2} + 999)
       |      // 1000 THEN mb END) AS hi
       |  FROM rk
       |), pt AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_rows,
       |    SUM(v) AS tot
       |  FROM r
       |)
       |SELECT pt.n_rows,
       |  CASE WHEN pt.n_rows > 0 THEN
       |    round(CAST(pt.tot AS DOUBLE) / pt.n_rows, 6) END AS mean,
       |  round(ci.lo, 6) AS ci_lo,
       |  round(ci.hi, 6) AS ci_hi,
       |  ci.n_resamples
       |FROM pt CROSS JOIN ci""".stripMargin
  }

  /**
   * q215 oracle generator: replays `Graph.kCore`'s fixed peel rounds
   * as an unrolled materialized-CTE chain over the q192 minhash
   * candidate edge set — all-integer degrees, no tie-breaks, so
   * every round is exact on both engines.
   */
  /** Shared DuckDB CTE chain replaying `Dedup.minhashCandidates(
    * documents, 8 hashes, 2-row bands, 3-shingles)` as the
    * near-dup candidate edge set `e0(lo, hi)` — the q192/q215/q240/
    * q241 graph-oracle substrate. */
  private val candidateEdgesHead: String =
    """toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |), idx AS (
        |  SELECT doc_id, w, unnest(generate_series(1, len(w)-2)) AS i FROM toks
        |), sh AS (
        |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle FROM idx
        |), mh AS (
        |  SELECT doc_id, s.seed,
        |    min(CAST(('0x' || substr(
        |      md5(CAST(s.seed AS VARCHAR) || ':' || shingle), 1, 15)) AS BIGINT))
        |      AS mh
        |  FROM sh CROSS JOIN (SELECT unnest(generate_series(0,7)) AS seed) s
        |  GROUP BY doc_id, s.seed
        |), bands AS (
        |  SELECT doc_id, seed // 2 AS band,
        |    string_agg(CAST(mh AS VARCHAR), '|' ORDER BY seed) AS sig
        |  FROM mh GROUP BY doc_id, seed // 2
        |), e0 AS MATERIALIZED (
        |  SELECT DISTINCT a.doc_id AS lo, b.doc_id AS hi
        |  FROM bands a
        |  JOIN bands b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
        |)""".stripMargin

  /** The LOOSE near-dup candidate graph: 8 single-hash bands
    * (rowsPerBand = 1) — the recall-oriented LSH regime. Unlike the
    * production 4×2 banding (whose buckets close their own triangles
    * — the round-9 no-open-wedges gotcha), single-hash buckets chain
    * across seeds, so this graph HAS wedge structure (≈2.2k open
    * pairs at both gate scales) and is the right substrate for
    * gating the G5/G8 dials on the graph family they were built for. */
  private val looseCandidateEdgesHead: String =
    """toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |), idx AS (
        |  SELECT doc_id, w, unnest(generate_series(1, len(w)-2)) AS i FROM toks
        |), sh AS (
        |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle FROM idx
        |), mh AS (
        |  SELECT doc_id, s.seed,
        |    min(CAST(('0x' || substr(
        |      md5(CAST(s.seed AS VARCHAR) || ':' || shingle), 1, 15)) AS BIGINT))
        |      AS mh
        |  FROM sh CROSS JOIN (SELECT unnest(generate_series(0,7)) AS seed) s
        |  GROUP BY doc_id, s.seed
        |), bands AS (
        |  SELECT doc_id, seed AS band, CAST(mh AS VARCHAR) AS sig
        |  FROM mh
        |), e0 AS MATERIALIZED (
        |  SELECT DISTINCT a.doc_id AS lo, b.doc_id AS hi
        |  FROM bands a
        |  JOIN bands b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
        |)""".stripMargin

  /** q246 oracle: the DiD estimator's four-cell decimal moments and
    * fixed IEEE finish. Cell means repeat VERBATIM (q153 discipline);
    * did/z signed (+ 0.0), per-cell variances clamp at 0. */
  private def didOracleSql: String = {
    val cells = Seq(
      "a_pre" -> "a AND NOT post", "a_post" -> "a AND post",
      "b_pre" -> "(NOT a) AND NOT post", "b_post" -> "(NOT a) AND post")
    val aggDefs = cells.map { case (n, c) =>
      s"""CAST(COUNT(CASE WHEN $c THEN 1 END) AS BIGINT) AS n_$n,
         |    SUM(CASE WHEN $c THEN v END) AS s_$n,
         |    SUM(CASE WHEN $c THEN v * v END) AS ss_$n""".stripMargin
    }.mkString(",\n    ")
    def m(n: String) =
      s"(CAST(s_$n AS DOUBLE) / CAST(n_$n AS DOUBLE))"
    def svOverN(n: String) =
      s"""greatest((CAST(ss_$n AS DOUBLE)
         |      - CAST(n_$n AS DOUBLE) * ${m(n)} * ${m(n)})
         |      / (CAST(n_$n AS DOUBLE) - 1.0), 0.0)
         |      / CAST(n_$n AS DOUBLE)""".stripMargin
    val did = s"(${m("a_post")} - ${m("a_pre")}) " +
      s"- (${m("b_post")} - ${m("b_pre")})"
    val se = s"""sqrt(${svOverN("a_post")}
                |    + ${svOverN("a_pre")}
                |    + ${svOverN("b_post")}
                |    + ${svOverN("b_pre")})""".stripMargin
    val allPresent = cells.map(c => s"n_${c._1} > 0").mkString(" AND ")
    val allVar = cells.map(c => s"n_${c._1} > 1").mkString(" AND ")
    s"""WITH e AS (
       |  SELECT event_type, (user_id % 2 = 0) AS a,
       |    (EXTRACT(day FROM ts) >= 16) AS post,
       |    CAST(value AS DECIMAL(18,6)) AS v
       |  FROM events
       |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
       |    AND value IS NOT NULL
       |), g AS (
       |  SELECT event_type,
       |    $aggDefs
       |  FROM e GROUP BY 1
       |), f AS (
       |  SELECT event_type, n_a_pre, n_a_post, n_b_pre, n_b_post,
       |    $did AS did,
       |    $se AS se
       |  FROM g
       |)
       |SELECT event_type, n_a_pre, n_a_post, n_b_pre, n_b_post,
       |  CASE WHEN $allPresent THEN round(did, 6) + 0.0 END AS did,
       |  CASE WHEN $allVar THEN round(se, 6) END AS se,
       |  CASE WHEN $allVar AND se > 0 THEN round(did / se, 6) + 0.0
       |    END AS z
       |FROM f ORDER BY event_type""".stripMargin
  }

  /** q243 oracle generator: the autocorrelation estimator's exact
    * decimal moment sums and fixed IEEE finish, one lead column per
    * lag in a single named window, per-lag rows via UNION ALL. The
    * x̄ subexpression repeats VERBATIM everywhere it appears (the
    * q153 discipline) so both engines run identical op chains; acf
    * is signed, hence the `+ 0.0`. */
  private def acfOracleSql(maxLag: Int): String = {
    val leadDefs = (1 to maxLag).map(l =>
      s"lead(CAST(value AS DECIMAL(18,6)), $l) OVER win AS l$l")
      .mkString(",\n    ")
    val aggDefs = (1 to maxLag).map(l =>
      s"COUNT(l$l) AS np$l, SUM(x * l$l) AS sxy$l,\n    " +
        s"SUM(CASE WHEN l$l IS NOT NULL THEN x + l$l END) AS hs$l")
      .mkString(",\n    ")
    val unions = (1 to maxLag).map(l =>
      s"SELECT event_type, n, sx, sxx, $l AS lag, np$l AS np, " +
        s"sxy$l AS sxy, hs$l AS hs FROM s")
      .mkString("\n  UNION ALL ")
    val xbar = "(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))"
    val den = s"CAST(sxx AS DOUBLE) - CAST(n AS DOUBLE) * $xbar * $xbar"
    s"""WITH e AS (
       |  SELECT event_type, CAST(value AS DECIMAL(18,6)) AS x,
       |    $leadDefs
       |  FROM events WHERE value IS NOT NULL
       |  WINDOW win AS (PARTITION BY event_type ORDER BY ts, event_id)
       |), s AS (
       |  SELECT event_type, COUNT(*) AS n, SUM(x) AS sx,
       |    SUM(x * x) AS sxx,
       |    $aggDefs
       |  FROM e GROUP BY event_type
       |), l AS (
       |  $unions
       |)
       |SELECT event_type, CAST(lag AS INT) AS lag, CAST(n AS BIGINT) AS n,
       |  CAST(np AS BIGINT) AS n_pairs,
       |  CASE WHEN np > 0 AND $den > 0.0
       |  THEN round(
       |    (CAST(sxy AS DOUBLE) - $xbar * CAST(hs AS DOUBLE)
       |      + CAST(np AS DOUBLE) * $xbar * $xbar)
       |    / ($den), 6) + 0.0
       |  END AS acf
       |FROM l ORDER BY event_type, lag""".stripMargin
  }

  private def kCoreOracleSql(k: Int, rounds: Int): String = {
    val peels = (1 to rounds).map { r =>
      s"""n$r AS MATERIALIZED (
         |  SELECT node FROM (
         |    SELECT node, count(*) AS degree FROM (
         |      SELECT lo AS node FROM e${r - 1}
         |      UNION ALL SELECT hi AS node FROM e${r - 1}
         |    ) GROUP BY node) WHERE degree >= $k),
         |e$r AS MATERIALIZED (
         |  SELECT lo, hi FROM e${r - 1}
         |  WHERE lo IN (SELECT node FROM n$r)
         |    AND hi IN (SELECT node FROM n$r))""".stripMargin
    }.mkString(",\n")
    s"""WITH $candidateEdgesHead,
       |$peels
       |SELECT node, CAST(count(*) AS BIGINT) AS degree FROM (
       |  SELECT lo AS node FROM e$rounds
       |  UNION ALL SELECT hi AS node FROM e$rounds
       |) GROUP BY node ORDER BY node""".stripMargin
  }

  /**
   * q268 oracle generator: replays `Graph.hits`' exact nano-grid
   * mutual recursion as an unrolled materialized-CTE chain (the
   * q123-PageRank pattern). Scores live as BIGINT nano-units; each
   * half-round's raw sums are exact integer aggregates and the
   * normalization is the identical one-IEEE-division floor on both
   * engines, so the replay is bit-exact — no rounding rule anywhere.
   */
  private def hitsOracleSql(iters: Int): String = {
    val base =
      """WITH e AS MATERIALIZED (
        |  SELECT DISTINCT 'c:' || CAST(o_custkey AS VARCHAR) AS src,
        |    'p:' || CAST(l_partkey AS VARCHAR) AS dst
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |), nodes AS MATERIALIZED (
        |  SELECT src AS node FROM e UNION SELECT dst FROM e
        |), h0 AS MATERIALIZED (
        |  SELECT node, CAST(1000000000 AS BIGINT) AS q FROM nodes)""".stripMargin
    val rounds = (1 to iters).map { i =>
      s""", ar$i AS MATERIALIZED (
         |  SELECT e.dst AS node, SUM(h.q) AS raw
         |  FROM h${i - 1} h JOIN e ON e.src = h.node GROUP BY 1
         |), at$i AS MATERIALIZED (
         |  SELECT COALESCE(SUM(raw), 0) AS tot FROM ar$i
         |), a$i AS MATERIALIZED (
         |  SELECT n.node, CASE WHEN t.tot <= 0 THEN CAST(0 AS BIGINT)
         |    ELSE CAST(floor(CAST(COALESCE(r.raw, 0) AS DOUBLE)
         |      / CAST(t.tot AS DOUBLE) * 1000000000.0) AS BIGINT) END AS q
         |  FROM nodes n LEFT JOIN ar$i r ON r.node = n.node
         |  CROSS JOIN at$i t
         |), hr$i AS MATERIALIZED (
         |  SELECT e.src AS node, SUM(a.q) AS raw
         |  FROM a$i a JOIN e ON e.dst = a.node GROUP BY 1
         |), ht$i AS MATERIALIZED (
         |  SELECT COALESCE(SUM(raw), 0) AS tot FROM hr$i
         |), h$i AS MATERIALIZED (
         |  SELECT n.node, CASE WHEN t.tot <= 0 THEN CAST(0 AS BIGINT)
         |    ELSE CAST(floor(CAST(COALESCE(r.raw, 0) AS DOUBLE)
         |      / CAST(t.tot AS DOUBLE) * 1000000000.0) AS BIGINT) END AS q
         |  FROM nodes n LEFT JOIN hr$i r ON r.node = n.node
         |  CROSS JOIN ht$i t
         |)""".stripMargin
    }.mkString("\n")
    s"""$base
       |$rounds
       |SELECT h.node, CAST(h.q AS DOUBLE) / 1000000000.0 AS hub,
       |  CAST(a.q AS DOUBLE) / 1000000000.0 AS auth
       |FROM h$iters h JOIN a$iters a ON a.node = h.node
       |ORDER BY h.node""".stripMargin
  }

  /**
   * q269 oracle generator: the JL sign matrix regenerates from
   * `Similarity.projectionSigns` (the SAME Scala function the
   * operator uses) as a literal VALUES table; coordinates are exact
   * ±-signed micro-unit long sums with the identical IEEE finish
   * (/10⁶, ·invScale, floor back onto the 6dp grid). dOut must keep
   * 1/√dOut exactly representable (a power of 4) so the emitted
   * literal is exact.
   */
  private def randomProjectOracleSql(
      dIn: Int, dOut: Int, seed: Long): String = {
    val signs = graft.operators.Similarity.projectionSigns(seed, dIn, dOut)
    val values = (for (j <- 0 until dOut; i <- 0 until dIn)
      yield s"($i,$j,${signs(j)(i)})").mkString(",")
    val inv = (1.0 / math.sqrt(dOut.toDouble)).toString
    s"""WITH m(i, j, s) AS (VALUES $values),
       |el AS (
       |  SELECT vec_id,
       |    CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS i,
       |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000.0)
       |      AS BIGINT) AS q
       |  FROM embeddings
       |  WHERE len(embedding) = $dIn
       |    AND len(list_filter(embedding, x -> x IS NULL)) = 0
       |), acc AS (
       |  SELECT el.vec_id, m.j, SUM(el.q * m.s) AS acc
       |  FROM el JOIN m ON m.i = el.i
       |  GROUP BY 1, 2
       |)
       |SELECT vec_id, j AS dim,
       |  floor(CAST(acc AS DOUBLE) / 1000000.0 * $inv * 1000000.0)
       |    / 1000000.0 AS value
       |FROM acc ORDER BY vec_id, dim""".stripMargin
  }

  /**
   * q273 oracle generator: replays `Graph.personalizedPageRank`'s
   * exact nano-grid walk as an unrolled materialized-CTE chain. Per
   * round each edge's contribution floors ONE IEEE multiply
   * (rank·(w/ow)) to a long, so per-node sums are exact integer
   * aggregates; teleport and dangling terms floor separately. The
   * damping literals are emitted from the SAME Scala doubles the
   * operator uses (1−d is computed driver-side — its shortest
   * decimal rendering round-trips to the identical double).
   */
  private def pprOracleSql(iters: Int, damping: Double): String = {
    val d = damping.toString
    val omd = (1.0 - damping).toString
    val base =
      """WITH p AS MATERIALIZED (
        |  SELECT 'c:' || CAST(o_custkey AS VARCHAR) AS c,
        |    'p:' || CAST(l_partkey AS VARCHAR) AS pp,
        |    CAST(COUNT(*) AS BIGINT) AS w
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY 1, 2
        |), e AS MATERIALIZED (
        |  SELECT c AS src, pp AS dst, w FROM p
        |  UNION ALL SELECT pp AS src, c AS dst, w FROM p
        |), sd AS MATERIALIZED (
        |  SELECT 'c:' || CAST(c_custkey AS VARCHAR) AS node
        |  FROM customer WHERE c_custkey % 100 = 0
        |), ns AS MATERIALIZED (
        |  SELECT CAST(1000000000 // COUNT(*) AS BIGINT) AS teleq FROM sd
        |), ow AS MATERIALIZED (SELECT src, SUM(w) AS ow FROM e GROUP BY src
        |), nodes AS MATERIALIZED (
        |  SELECT src AS node FROM e UNION SELECT dst FROM e
        |  UNION SELECT node FROM sd
        |), tele AS MATERIALIZED (
        |  SELECT n.node,
        |    CASE WHEN n.node IN (SELECT node FROM sd) THEN ns.teleq
        |      ELSE CAST(0 AS BIGINT) END AS teleq
        |  FROM nodes n CROSS JOIN ns
        |), r0 AS MATERIALIZED (SELECT node, teleq AS rq FROM tele)"""
        .stripMargin
    val rounds = (1 to iters).map { i =>
      s""", c$i AS MATERIALIZED (
         |  SELECT e.dst AS node,
         |    SUM(CAST(floor(CAST(r.rq AS DOUBLE)
         |      * (CAST(e.w AS DOUBLE) / CAST(o.ow AS DOUBLE)))
         |      AS BIGINT)) AS contrib
         |  FROM r${i - 1} r JOIN e ON e.src = r.node
         |  JOIN ow o ON o.src = e.src GROUP BY 1
         |), d$i AS MATERIALIZED (
         |  SELECT COALESCE(SUM(rq), 0) AS dang FROM r${i - 1}
         |  WHERE node NOT IN (SELECT src FROM ow)
         |), r$i AS MATERIALIZED (
         |  SELECT t.node,
         |    CAST(floor($omd * CAST(t.teleq AS DOUBLE)) AS BIGINT)
         |    + CAST(floor($d * CAST(COALESCE(c.contrib, 0) AS DOUBLE))
         |      AS BIGINT)
         |    + CAST(floor($d * (CAST(dg.dang AS DOUBLE)
         |      * (CAST(t.teleq AS DOUBLE) / 1000000000.0))) AS BIGINT)
         |      AS rq
         |  FROM tele t LEFT JOIN c$i c ON c.node = t.node
         |  CROSS JOIN d$i dg
         |)""".stripMargin
    }.mkString("\n")
    s"""$base
       |$rounds
       |SELECT node, CAST(rq AS DOUBLE) / 1000000000.0 AS score
       |FROM r$iters ORDER BY node""".stripMargin
  }

  /**
   * q209 oracle generator: replays `Similarity.mmrSelect`'s greedy
   * loop in DuckDB as a materialized-CTE chain (the q195/q200
   * pattern). Round 1 picks max relevance (cosine to the query
   * vector); each later round computes cosines against ONLY the
   * newest pick, folds them into the running max-sim via greatest
   * (first assignment direct — no greatest-with-NULL cross-engine
   * question), and picks max λ·rel − (1−λ)·ms with the vec_id
   * tiebreak. λ and 1−λ are computed from the SAME literal on both
   * engines; cosines are the q19-convention index-order SUM folds.
   */
  private def mmrOracleSql(k: Int, lambda: Double, queryId: Long): String = {
    val lam = lambda.toString
    def cosAgainst(p: String): String =
      s"""(SELECT e.vec_id, SUM(e.x * pe.x) / (ne.n * np.n) AS cos
         |     FROM el e
         |     JOIN el pe ON pe.d = e.d
         |       AND pe.vec_id = (SELECT vec_id FROM $p)
         |     JOIN nrm ne ON ne.vec_id = e.vec_id
         |     JOIN nrm np ON np.vec_id = (SELECT vec_id FROM $p)
         |     GROUP BY e.vec_id, ne.n, np.n)""".stripMargin
    val head =
      s"""el AS MATERIALIZED (
         |  SELECT vec_id, generate_subscripts(embedding,1) AS d,
         |         unnest(embedding)::DOUBLE AS x
         |  FROM embeddings
         |), nrm AS MATERIALIZED (
         |  SELECT vec_id, sqrt(SUM(x*x)) AS n FROM el GROUP BY vec_id
         |), rel AS MATERIALIZED (
         |  SELECT e.vec_id, SUM(e.x * q.x) / (ne.n * nq.n) AS rel
         |  FROM el e
         |  JOIN el q ON q.d = e.d AND q.vec_id = $queryId
         |  JOIN nrm ne ON ne.vec_id = e.vec_id
         |  JOIN nrm nq ON nq.vec_id = $queryId
         |  WHERE e.vec_id <> $queryId
         |  GROUP BY e.vec_id, ne.n, nq.n
         |),
         |p1 AS MATERIALIZED (
         |  SELECT vec_id, rel FROM rel ORDER BY rel DESC, vec_id LIMIT 1),
         |s1 AS MATERIALIZED (
         |  SELECT r.vec_id, r.rel, c.cos AS ms
         |  FROM rel r JOIN ${cosAgainst("p1")} c USING (vec_id)
         |  WHERE r.vec_id <> (SELECT vec_id FROM p1))""".stripMargin
    val rounds = (2 to k).map { t =>
      val pick =
        s"""p$t AS MATERIALIZED (
           |  SELECT vec_id, rel, ms, $lam*rel - (1.0-$lam)*ms AS mmr
           |  FROM s${t - 1} ORDER BY mmr DESC, vec_id LIMIT 1)""".stripMargin
      if (t == k) pick
      else pick + ",\n" +
        s"""s$t AS MATERIALIZED (
           |  SELECT s.vec_id, s.rel, greatest(s.ms, c.cos) AS ms
           |  FROM s${t - 1} s JOIN ${cosAgainst(s"p$t")} c USING (vec_id)
           |  WHERE s.vec_id <> (SELECT vec_id FROM p$t))""".stripMargin
    }.mkString(",\n")
    val unions = (s"""SELECT CAST(1 AS INT) AS pick_rank, vec_id,
       |    round(rel, 6) + 0.0 AS relevance,
       |    CAST(NULL AS DOUBLE) AS max_sim, CAST(NULL AS DOUBLE) AS mmr
       |  FROM p1""".stripMargin +:
      (2 to k).map(t =>
        s"""SELECT CAST($t AS INT), vec_id, round(rel, 6) + 0.0,
           |    round(ms, 6) + 0.0, round(mmr, 6) + 0.0 FROM p$t""".stripMargin))
      .mkString("\n  UNION ALL\n  ")
    s"""WITH $head,
       |$rounds
       |SELECT * FROM (
       |  $unions
       |) ORDER BY pick_rank""".stripMargin
  }

  /**
   * q200 oracle generator: replays `Similarity.trainCentroids` —
   * farthest-point seeding then `iters` Lloyd rounds — in DuckDB.
   * Validity preconditions are documented at the q200 entry (pool ⊇
   * corpus, measure-zero ties, tol = 0, floor-grid means). Distances
   * use the operator's own ‖c‖² − 2·v·c form for the assignment and
   * plain Σ(v−s)² for seeding, both via SQL SUMs — ulp-level fold
   * differences from Spark's codegen folds flip an argmin only on
   * measure-zero ties. Means replay the floor-grid exactly: floor of
   * identical doubles has NO rounding-rule hazard, the BIGINT sum is
   * exact, and the two-division finish is the same fixed IEEE
   * sequence. Empty cells COALESCE to the previous centroid,
   * mirroring the driver's keep-previous rule.
   */
  private def kmeansOracleSql(k: Int, iters: Int): String = {
    val el =
      """el AS (
        |  SELECT vec_id, CAST(generate_subscripts(embedding,1)-1 AS INT) AS d,
        |         CAST(unnest(embedding) AS DOUBLE) AS x
        |  FROM embeddings
        |), s0 AS MATERIALIZED (
        |  SELECT 0 AS cell, d, x FROM el
        |  WHERE vec_id = (SELECT min(vec_id) FROM embeddings)
        |)""".stripMargin
    val seeding = (1 until k).map { i =>
      val mind =
        if (i == 1) s"sd1"
        else s"(SELECT a.vec_id, least(a.dd, b.dd) AS dd" +
          s" FROM mind${i - 1} a JOIN sd$i b USING (vec_id))"
      s"""sd$i AS MATERIALIZED (
         |  SELECT e.vec_id, SUM((e.x - s.x) * (e.x - s.x)) AS dd
         |  FROM el e JOIN s${i - 1} s ON s.d = e.d GROUP BY 1
         |),
         |mind$i AS MATERIALIZED (SELECT * FROM $mind),
         |p$i AS (SELECT vec_id FROM mind$i ORDER BY dd DESC, vec_id LIMIT 1),
         |s$i AS MATERIALIZED (
         |  SELECT $i AS cell, d, x FROM el
         |  WHERE vec_id = (SELECT vec_id FROM p$i)
         |)""".stripMargin
    }.mkString(",\n")
    val m0 = s"""m0 AS MATERIALIZED (
       |${(0 until k).map(i => s"  SELECT * FROM s$i").mkString("\n  UNION ALL\n")}
       |)""".stripMargin
    val rounds = (1 to iters).map { t =>
      s"""a$t AS MATERIALIZED (
         |  SELECT vec_id, cell FROM (
         |    SELECT vc.vec_id, vc.cell,
         |      row_number() OVER (PARTITION BY vc.vec_id
         |                         ORDER BY vc.dist, vc.cell) AS rn
         |    FROM (
         |      SELECT e.vec_id, c.cell,
         |        SUM(c.x * c.x) - 2.0 * SUM(e.x * c.x) AS dist
         |      FROM el e JOIN m${t - 1} c ON c.d = e.d
         |      GROUP BY 1, 2) vc
         |  ) WHERE rn = 1
         |),
         |m$t AS MATERIALIZED (
         |  SELECT p.cell, p.d,
         |    COALESCE((CAST(s.q AS DOUBLE) / CAST(s.n AS DOUBLE))
         |      / 1000000.0, p.x) AS x
         |  FROM m${t - 1} p
         |  LEFT JOIN (
         |    SELECT a.cell, e.d,
         |      CAST(SUM(CAST(floor(e.x * 1000000.0) AS BIGINT)) AS BIGINT)
         |        AS q,
         |      CAST(COUNT(*) AS BIGINT) AS n
         |    FROM a$t a JOIN el e ON e.vec_id = a.vec_id
         |    GROUP BY 1, 2) s ON s.cell = p.cell AND s.d = p.d
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH $el,
       |$seeding,
       |$m0,
       |$rounds
       |SELECT cell, d AS dim, round(x, 6) + 0.0 AS value
       |FROM m$iters ORDER BY cell, dim""".stripMargin
  }

  /**
   * q260 oracle generator: replays [[Similarity.trainPqCodebooks]] —
   * per-subspace farthest-point seeding + Lloyd rounds — as `m`
   * independent prefixed CTE chains over the SLICED embedding (dims
   * rebased to 0 within each subspace), each chain exactly the q200
   * replay. Same validity preconditions (pool ⊇ corpus, tol = 0,
   * floor-grid means, measure-zero ties), applied per subspace; the
   * first seed is the min-vec_id row's SUBVECTOR in every chain
   * (slicing preserves ids). `+ 0.0` normalizes signed zeros on both
   * engines (the Spark side applies the same normalization).
   */
  private def pqTrainOracleSql(
      m: Int, k: Int, iters: Int, dims: Int): String = {
    require(dims % m == 0, s"dims $dims must divide into m=$m subspaces")
    val sub = dims / m
    val el =
      """el AS MATERIALIZED (
        |  SELECT vec_id, CAST(generate_subscripts(embedding,1)-1 AS INT) AS d,
        |         CAST(unnest(embedding) AS DOUBLE) AS x
        |  FROM embeddings
        |)""".stripMargin
    val chains = (0 until m).map { t0 =>
      val p = s"t${t0}_"
      val lo = t0 * sub
      val elS =
        s"""${p}el AS MATERIALIZED (
           |  SELECT vec_id, CAST(d - $lo AS INT) AS d, x FROM el
           |  WHERE d >= $lo AND d < ${lo + sub}
           |), ${p}s0 AS MATERIALIZED (
           |  SELECT 0 AS cell, d, x FROM ${p}el
           |  WHERE vec_id = (SELECT min(vec_id) FROM embeddings)
           |)""".stripMargin
      val seeding = (1 until k).map { i =>
        val mind =
          if (i == 1) s"${p}sd1"
          else s"(SELECT a.vec_id, least(a.dd, b.dd) AS dd" +
            s" FROM ${p}mind${i - 1} a JOIN ${p}sd$i b USING (vec_id))"
        s"""${p}sd$i AS MATERIALIZED (
           |  SELECT e.vec_id, SUM((e.x - s.x) * (e.x - s.x)) AS dd
           |  FROM ${p}el e JOIN ${p}s${i - 1} s ON s.d = e.d GROUP BY 1
           |),
           |${p}mind$i AS MATERIALIZED (SELECT * FROM $mind),
           |${p}p$i AS (SELECT vec_id FROM ${p}mind$i
           |  ORDER BY dd DESC, vec_id LIMIT 1),
           |${p}s$i AS MATERIALIZED (
           |  SELECT $i AS cell, d, x FROM ${p}el
           |  WHERE vec_id = (SELECT vec_id FROM ${p}p$i)
           |)""".stripMargin
      }.mkString(",\n")
      val m0 = s"""${p}m0 AS MATERIALIZED (
         |${(0 until k).map(i => s"  SELECT * FROM ${p}s$i")
            .mkString("\n  UNION ALL\n")}
         |)""".stripMargin
      val rounds = (1 to iters).map { t =>
        s"""${p}a$t AS MATERIALIZED (
           |  SELECT vec_id, cell FROM (
           |    SELECT vc.vec_id, vc.cell,
           |      row_number() OVER (PARTITION BY vc.vec_id
           |                         ORDER BY vc.dist, vc.cell) AS rn
           |    FROM (
           |      SELECT e.vec_id, c.cell,
           |        SUM(c.x * c.x) - 2.0 * SUM(e.x * c.x) AS dist
           |      FROM ${p}el e JOIN ${p}m${t - 1} c ON c.d = e.d
           |      GROUP BY 1, 2) vc
           |  ) WHERE rn = 1
           |),
           |${p}m$t AS MATERIALIZED (
           |  SELECT p.cell, p.d,
           |    COALESCE((CAST(s.q AS DOUBLE) / CAST(s.n AS DOUBLE))
           |      / 1000000.0, p.x) AS x
           |  FROM ${p}m${t - 1} p
           |  LEFT JOIN (
           |    SELECT a.cell, e.d,
           |      CAST(SUM(CAST(floor(e.x * 1000000.0) AS BIGINT)) AS BIGINT)
           |        AS q,
           |      CAST(COUNT(*) AS BIGINT) AS n
           |    FROM ${p}a$t a JOIN ${p}el e ON e.vec_id = a.vec_id
           |    GROUP BY 1, 2) s ON s.cell = p.cell AND s.d = p.d
           |)""".stripMargin
      }.mkString(",\n")
      s"$elS,\n$seeding,\n$m0,\n$rounds"
    }.mkString(",\n")
    val unions = (0 until m).map { t0 =>
      s"""SELECT $t0 AS subspace, cell, d AS dim,
         |    round(x, 6) + 0.0 AS value FROM t${t0}_m$iters""".stripMargin
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH $el,
       |$chains
       |SELECT * FROM (
       |  $unions
       |) ORDER BY subspace, cell, dim""".stripMargin
  }

  /** Shared q196/q197 input: every document scored with EXACTLY the
    * q23 composite quality (round-6, so scores sit on the 6dp grid
    * the AUC scale contract requires) and labeled `lang = 'en'` —
    * the "does the heuristic score actually find English-quality
    * text" evaluation frame. Single source — the q196/q197 oracles
    * replicate the q23 oracle's expressions verbatim. */
  private def qualityScored(s: SparkSession, dir: String): DataFrame = {
    val nTok = TextAnalysis.tokenCount(col("text"))
    val ttr = TextAnalysis.typeTokenRatio(col("text"))
    val stopRatio = TextAnalysis.vocabHits(
      col("text"), Seq("the", "a", "of", "and", "is", "to"))
      .cast("double") / nTok
    t(s, dir, "documents").select(
      round(ttr * 0.5 + (lit(1.0) - stopRatio) * 0.5, 6).as("quality"),
      (col("lang") === "en").as("is_en"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact content dedup: one shuffle on md5(text), keep min doc_id.
    "q15_exact_dedup" -> ((s, dir) => {
      Dedup.exact(docsWithDups(s, dir), "text", "doc_id")
        .select("doc_id", "n_copies")
        .orderBy("doc_id")
    }),

    // MinHash/LSH near-dup candidates (8 hashes, 4 bands of 2) with
    // signature-estimated Jaccard. Bucketed band self-join, never
    // all-pairs.
    "q16_minhash_pairs" -> ((s, dir) => {
      Dedup.minhashCandidates(
          t(s, dir, "documents"), "doc_id", "text",
          numHashes = 8, rowsPerBand = 2, shingleSize = 3)
        .orderBy("doc_a", "doc_b")
    }),

    // Exact word-3-gram Jaccard verification over the LSH candidates.
    "q17_ngram_jaccard" -> ((s, dir) => {
      Dedup.ngramJaccard(
          t(s, dir, "documents"), "doc_id", "text",
          numHashes = 8, rowsPerBand = 2, shingleSize = 3)
        .orderBy("doc_a", "doc_b")
    }),

    // Near-dup clusters: signature-strong pairs (>= 7 of 8 min-hash
    // positions agree) → connected components via min-label
    // propagation — the step that turns pairwise evidence into
    // per-cluster keep/drop decisions.
    "q48_dedup_clusters" -> ((s, dir) => {
      val pairs = Dedup.minhashCandidates(
          t(s, dir, "documents"), "doc_id", "text",
          numHashes = 8, rowsPerBand = 2, shingleSize = 3)
        .where(col("n_match") >= 7)
      Dedup.nearDupClusters(pairs)
        .orderBy("id")
    }),

    // TF-IDF top-3 terms per document. One (doc,tok) tf shuffle, a
    // vocabulary-sized df join (AQE-broadcast when small), a one-row
    // corpus-count cross join, and a per-doc bounded ranking window.
    "q71_tfidf" -> ((s, dir) => {
      Relevance.tfidfTopK(t(s, dir, "documents"), "doc_id", "text", k = 3)
        .orderBy("doc_id", "rank")
    }),

    // Sub-document chunk dedup (FineWeb-style boilerplate removal):
    // 10-token chunks deduplicated globally by first occurrence,
    // documents reassembled from surviving chunks. Runs over the
    // dup-injected corpus so full-duplicate docs dedup to ''.
    "q73_chunk_dedup" -> ((s, dir) => {
      Dedup.chunkDedup(docsWithDups(s, dir), "doc_id", "text",
          chunkTokens = 10)
        .orderBy("doc_id")
    }),

    // BM25 top-20 documents for a 3-term query. The term filter lands
    // on the tf stream pre-join, so scored volume is |terms|·|docs|;
    // top-k via TakeOrderedAndProject, ranking window over k rows.
    "q74_bm25" -> ((s, dir) => {
      Relevance.bm25TopK(t(s, dir, "documents"), "doc_id", "text",
          terms = Seq("spark", "vector", "window"), k = 20)
        .orderBy("rank")
    }),

    // Token-distribution Shannon entropy per doc (repetitive-text
    // quality signal): tf shuffle + one per-doc reduction via
    // H = ln(n) - Σ tf·ln(tf) / n.
    "q75_entropy" -> ((s, dir) => {
      Relevance.tokenEntropy(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // Bigram LM quality scoring (CCNet-style perplexity filtering):
    // corpus-trained add-one-smoothed bigram model, per-doc mean log
    // probability + perplexity. Model tables are Zipf-bounded; the
    // bigram frame is one explode off the scan.
    "q92_lm_perplexity" -> ((s, dir) => {
      Relevance.bigramLogProb(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // SimHash 64-bit fingerprints — shuffle-free, via the custom
    // codegen'd Catalyst expression (bit-identical to the HOF
    // formulation and the DuckDB oracle).
    "q18_simhash" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), Dedup.simhashFast(col("text")).as("fingerprint"))
        .orderBy("doc_id")
    }),

    // Brute-force cosine top-k: 5 probes, k=10, two-phase partial
    // top-k (shuffle volume independent of corpus size).
    "q19_cosine_topk" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.cosineTopK(
          e, e.where(col("vec_id") < 5), "vec_id", "embedding", k = 10)
        .withColumn("cosine", round(col("cosine"), 6))
        .orderBy("probe_id", "rank")
    }),

    // SRP-LSH bucket assignment (8 md5-derived Rademacher planes) —
    // the scale path for ANN: per-row compute, no shuffle.
    "q20_ann_buckets" -> ((s, dir) => {
      t(s, dir, "embeddings")
        .select(
          col("vec_id"),
          element_at(Similarity.srpBucketsFast(col("embedding"), 8, 1), 1)
            .as("bucket"))
        .orderBy("vec_id")
    }),

    // Bucketed embedding near-dup: exact cosine only within SRP
    // buckets (never all-pairs), threshold 0.35.
    "q21_embed_neardup" -> ((s, dir) => {
      Similarity.lshNearDup(
          t(s, dir, "embeddings"), "vec_id", "embedding",
          numPlanes = 8, minCosine = 0.35)
        .withColumn("cosine", round(col("cosine"), 6))
        .orderBy("vec_a", "vec_b")
    }),

    // Multi-table SRP-LSH near-dup: 4 independent 8-plane tables —
    // a shared bucket in ANY table makes a candidate. Finds 17 pairs
    // at sf0.01 where the single-table q21 finds 3: the recall dial
    // of hash-based ANN.
    "q35_lsh_multitable" -> ((s, dir) => {
      Similarity.lshNearDupMulti(
          t(s, dir, "embeddings"), "vec_id", "embedding",
          numPlanes = 8, numTables = 4, minCosine = 0.35)
        .withColumn("cosine", round(col("cosine"), 6))
        .orderBy("vec_a", "vec_b")
    }),

    // IVF approximate nearest neighbors: 8 Voronoi cells from
    // deterministic coarse centroids, each probe searches its 2
    // closest cells exactly — the recall/cost dial of inverted-file
    // ANN (vs q20/q21's hash-bucket LSH).
    "q31_ivf_search" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.ivfSearch(
          e, e.where(col("vec_id") < 3), "vec_id", "embedding",
          nlist = 8, nprobe = 2, k = 5)
        .withColumn("cosine", round(col("cosine"), 6))
        .orderBy("probe_id", "rank")
    }),

    // N-gram novelty scoring: fraction of each doc's 3-shingles first
    // seen in THIS doc (id = arrival order) — the post-dedup
    // low-contribution pruning dial. One shingle exchange + min-agg
    // + join back, no corpus-squared term.
    "q98_novelty" -> ((s, dir) => {
      TextAnalysis.noveltyScore(t(s, dir, "documents"), "doc_id", "text", n = 3)
        .orderBy("doc_id")
    }),

    // Ingestion-time cross-corpus novelty: the arriving batch
    // (doc_id % 10 == 0) scores against the existing corpus's
    // shingle index — new×old join only, the incremental counterpart
    // of q98.
    "q99_novelty_incremental" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      TextAnalysis.noveltyAgainst(
          docs.where(col("doc_id") % 10 === 0),
          docs.where(col("doc_id") % 10 =!= 0),
          "doc_id", "text", n = 3)
        .orderBy("doc_id")
    }),

    // KMV-sketch source overlap: q104's report from bottom-128
    // hash sketches instead of full shingle sets — O(k) state per
    // source, deterministic md5 hashing so estimates oracle-check
    // exactly; the persistent overlap index for 100 TB corpora.
    "q109_kmv_overlap" -> ((s, dir) => {
      TextAnalysis.kmvOverlap(
          t(s, dir, "documents"), "source", "text", n = 3, k = 128)
        .orderBy("group_a", "group_b")
    }),

    // Exact set-similarity self-join (prefix filtering): every pair
    // with shingle-Jaccard >= 0.6, provably zero false negatives —
    // the exact-recall complement to LSH (q16/q17). Candidates come
    // from an equi-join on each doc's rarest (1-t)·n shingles, so
    // volume concentrates on df=1-2 shingles, never all-pairs.
    "q111_exact_simjoin" -> ((s, dir) => {
      Dedup.exactSimilarityJoin(
          t(s, dir, "documents"), "doc_id", "text",
          threshold = 0.6, shingleSize = 3)
        .orderBy("doc_a", "doc_b")
    }),

    // Dedup impact report: per source, documents surviving exact
    // dedup and then near-dup cluster dedup (q48's reps) — the
    // "what did deduplication actually cost each supplier" governance
    // summary every curation run reports before committing drops.
    "q128_dedup_impact" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val exactKept = Dedup.exact(docs, "text", "doc_id")
        .select("doc_id")
      val strong = Dedup.minhashCandidates(
          docs, "doc_id", "text",
          numHashes = 8, rowsPerBand = 2, shingleSize = 3)
        .where(col("n_match") >= 7)
      val nearDropped = Dedup.nearDupClusters(strong)
        .where(col("id") =!= col("cluster"))
        .select(col("id").as("doc_id"))
      docs.select(col("doc_id"), col("source"))
        .join(exactKept.withColumn("__e", lit(1)), Seq("doc_id"), "left")
        .join(nearDropped.withColumn("__nd", lit(1)), Seq("doc_id"), "left")
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("__e").isNotNull, 1L).otherwise(0L))
            .as("n_after_exact"),
          sum(when(col("__e").isNotNull && col("__nd").isNull, 1L)
            .otherwise(0L)).as("n_final"))
        .select(col("source"), col("n_docs"), col("n_after_exact"),
          col("n_final"),
          round(col("n_final").cast("double") / col("n_docs"), 6)
            .as("retention"))
        .orderBy("source")
    }),

    // LSH quality audit: band-bucket candidates (q16's dial) measured
    // against the exact prefix-filter join's ground truth (q111,
    // recall provably 1.0) — the report that says whether 8 hashes ×
    // 2-row bands is ENOUGH before trusting LSH on the full corpus.
    "q127_lsh_recall_audit" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      // Both pair-sets feed TWO consumers each (their own count and
      // the intersect) — localCheckpoint the tiny results (tens of
      // rows) so the prefix-filter join and the band self-join each
      // run exactly once instead of per-consumer.
      val exact = Dedup.exactSimilarityJoin(
          docs, "doc_id", "text", threshold = 0.6, shingleSize = 3)
        .select("doc_a", "doc_b")
        .barriered
      val cand = Dedup.minhashCandidates(
          docs, "doc_id", "text",
          numHashes = 8, rowsPerBand = 2, shingleSize = 3)
        .select("doc_a", "doc_b")
        .barriered
      val found = exact.intersect(cand)
      exact.agg(count(lit(1)).as("n_true")).crossJoin(
          cand.agg(count(lit(1)).as("n_candidates"))).crossJoin(
          found.agg(count(lit(1)).as("n_found")))
        .select(
          col("n_true"), col("n_candidates"), col("n_found"),
          round(col("n_found").cast("double") / col("n_true"), 6)
            .as("recall"),
          round(col("n_found").cast("double") / col("n_candidates"), 6)
            .as("precision"))
    }),

    // Sorted-neighborhood matching (Hernández–Stolfo): sort by a
    // 40-char text prefix, compare each row to its 10 successors —
    // candidate volume exactly n·w, immune to block-size skew;
    // range-partitioned sort + zipWithIndex, never a one-task window.
    "q126_sorted_neighborhood" -> ((s, dir) => {
      Fuzzy.sortedNeighborhood(
          t(s, dir, "documents"), "doc_id", "text",
          substring(col("text"), 1, 40),
          windowSize = 10, threshold = 0.6)
        .orderBy("doc_a", "doc_b")
    }),

    // PMI collocation mining: adjacent-pair pointwise mutual
    // information over the corpus (count floor 5 — PMI glorifies
    // one-off pairs otherwise) — the phrase-detection dial for
    // tokenizer merges. Two corpus aggregations; joins run on the
    // Zipf-bounded count tables.
    "q107_pmi_collocations" -> ((s, dir) => {
      Relevance.pmiCollocations(t(s, dir, "documents"), "text",
          minCount = 5)
        .orderBy("a", "b")
    }),

    // Quality-signal percentile blending: TTR, stopword ratio, and
    // token count rank-normalized within each language (percent_rank,
    // id tiebreak) and averaged into one sampling weight — signals on
    // incomparable scales can't be averaged raw. One lang exchange
    // serves all three rank sorts.
    "q105_quality_blend" -> ((s, dir) => {
      val nTok = TextAnalysis.tokenCount(col("text"))
      val ttr = TextAnalysis.typeTokenRatio(col("text"))
      val stopRatio = TextAnalysis.vocabHits(
        col("text"), Seq("the", "a", "of", "and", "is", "to"))
        .cast("double") / nTok
      TextAnalysis.rankBlend(
          t(s, dir, "documents").select(
            col("doc_id"), col("lang"),
            round(ttr, 6).as("ttr"),
            round(stopRatio, 6).as("stop_ratio"),
            nTok.as("n_tokens")),
          "lang", "doc_id",
          Seq(("ttr", true), ("stop_ratio", false), ("n_tokens", true)))
        .select("doc_id", "lang", "pr_ttr", "pr_stop_ratio",
          "pr_n_tokens", "blend")
        .orderBy("doc_id")
    }),

    // Document co-occurrence pairs (market basket): token pairs
    // co-present in >= 300 docs with lift vs independence; Apriori
    // 1-item prune cuts the pair fan-out before the doc self-join.
    "q117_cooccurrence" -> ((s, dir) => {
      Relevance.cooccurrencePairs(t(s, dir, "documents"),
          "doc_id", "text", minSupport = 300L)
        .orderBy("tok_a", "tok_b")
    }),

    // Vocabulary coverage curve: smallest frequency-ranked vocab
    // reaching 50/75/90/99% of token occurrences — the tokenizer
    // V dial. Token count shuffle + windows over the Zipf-bounded
    // distinct-token table only.
    "q114_vocab_coverage" -> ((s, dir) => {
      Relevance.vocabCoverage(t(s, dir, "documents"), "text",
          targets = Seq(0.5, 0.75, 0.9, 0.99))
        .orderBy("target")
    }),

    // Corpus growth curve (Heap's law): per doc in arrival (id)
    // order, distinct 3-grams first seen in that doc and the running
    // corpus total — the marginal-contribution curve that says when
    // new data stops adding content. Running total via the bucketed
    // two-level prefix sum, never a single-task global window over
    // the corpus.
    "q106_growth_curve" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val novel = Dedup.shingles(docs, "doc_id", "text", 3)
        .groupBy("shingle").agg(min("doc_id").as("doc_id"))
        .groupBy("doc_id").agg(count(lit(1)).as("n_novel"))
      val base = docs.select("doc_id")
        .join(novel, Seq("doc_id"), "left")
        .na.fill(0L, Seq("n_novel"))
      TimeSeries.runningTotal(base, "doc_id", "n_novel",
          bucketWidth = 1000)
        .withColumnRenamed("running_total", "cum_distinct")
        .orderBy("doc_id")
    }),

    // Robust outlier scoring: modified z-score (median/MAD) per event
    // type — tails can't drag the center and mask themselves, unlike
    // mean/std. Two partial-agg passes; per-key stat tables broadcast
    // back.
    "q103_mad_outliers" -> ((s, dir) => {
      TimeSeries.madOutliers(
          t(s, dir, "events").select("event_id", "event_type", "value"),
          "event_type", "value", threshold = 3.5)
        .select("event_id", "event_type", "robust_z", "is_outlier")
        .orderBy("event_id")
    }),

    // Cross-source corpus overlap: pairwise distinct-3-gram
    // intersection, directional containment, and Jaccard between
    // sources — the "is this corpus worth ingesting" report. One
    // shingle-key self-join, group-pair-bounded fan-out.
    "q104_source_overlap" -> ((s, dir) => {
      TextAnalysis.corpusOverlap(
          t(s, dir, "documents"), "source", "text", n = 3)
        .orderBy("group_a", "group_b")
    }),

    // Label-centroid similarity matrix: pairwise cosine between
    // mean-pooled label centroids — the label-confusion audit. One
    // corpus pass to centroids; all pairwise work at |labels|²
    // cardinality.
    "q102_centroid_sim" -> ((s, dir) => {
      Similarity.centroidSimilarity(
          t(s, dir, "embeddings"), "label", "embedding")
        .withColumn("cosine", round(col("cosine"), 6))
        .orderBy("label_a", "label_b")
    }),

    // Split-leakage audit: signature-strong near-dup pairs (q16/q48
    // chain) tagged with both members' q41 split assignments; pairs
    // straddling train/val are flagged eval contamination. One
    // corpus-assignment scan via the melted-pair join.
    "q101_split_leakage" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = Dedup.minhashCandidates(
          docs, "doc_id", "text",
          numHashes = 8, rowsPerBand = 2, shingleSize = 3)
        .where(col("n_match") >= 7)
      val assign = docs.select(
        col("doc_id"),
        when(substring(md5(col("doc_id").cast("string")), 1, 1) < "c",
          "train").otherwise("val").as("split"))
      Dedup.splitLeakage(pairs, assign, "doc_id", "split")
        .orderBy("doc_a", "doc_b")
    }),

    // Per-source document cap (domain dominance control): keep at
    // most 8 docs per source, chosen by deterministic id-hash order —
    // a WindowGroupLimit plan, so each map task ships ≤ 8 rows per
    // source into the exchange.
    "q100_source_cap" -> ((s, dir) => {
      Sampling.capPerKey(t(s, dir, "documents"), "source", "doc_id", k = 8)
        .select("source", "doc_id", "pick_rank", "lang")
        .orderBy("source", "pick_rank")
    }),

    // Weighted sample without replacement (Efraimidis–Spirakis
    // A-Res): exactly 100 docs, inclusion odds proportional to
    // n_chars, deterministic md5-derived u — TakeOrderedAndProject
    // keeps a k-heap per map task, shuffle O(partitions × k).
    "q112_weighted_sample" -> ((s, dir) => {
      Sampling.weightedSample(
          t(s, dir, "documents"), "doc_id", "n_chars", k = 100)
        .select(col("doc_id"), col("source"), col("n_chars"),
          round(col("es_key"), 6).as("es_key"))
        .orderBy("doc_id")
    }),

    // Stratified weighted sample: exactly 20 docs per language,
    // inclusion odds proportional to n_chars — A-Res per key;
    // WindowGroupLimit bounds the shuffle at k rows per key per task.
    "q122_weighted_sample_per_key" -> ((s, dir) => {
      Sampling.weightedSamplePerKey(
          t(s, dir, "documents"), "lang", "doc_id", "n_chars", k = 20)
        .select(col("lang"), col("pick_rank"), col("doc_id"),
          col("n_chars"), round(col("es_key"), 6).as("es_key"))
        .orderBy("lang", "pick_rank")
    }),

    // Epoch-weighted mixture materialization: per-source epoch
    // factors (0.5–3.5) become physical repeats — floor(e) copies
    // plus a deterministic-hash Bernoulli(frac(e)) extra; zero
    // shuffle, fan-out inside the scan.
    "q115_epoch_repeat" -> ((s, dir) => {
      val e = (regexp_extract(col("source"), "(\\d+)$", 1).cast("int") % 4)
        .cast("double") + 0.5
      Sampling.epochRepeat(
          t(s, dir, "documents").withColumn("epochs", e),
          "doc_id", "epochs")
        .select("doc_id", "source", "epochs", "copy_idx")
        .orderBy("doc_id", "copy_idx")
    }),

    // Rolling z-score anomaly detection per user: each value scored
    // against its 10 strictly-preceding points; one user-key
    // exchange, O(lookback) state per key.
    "q95_rolling_zscore" -> ((s, dir) => {
      TimeSeries.rollingZScore(
          t(s, dir, "events").select("event_id", "user_id", "ts", "value"),
          "user_id", "ts", "event_id", "value",
          lookback = 10, threshold = 3.0)
        .select("event_id", "user_id", "n_prev", "z", "is_anomaly")
        .orderBy("event_id")
    }),

    // Hard-negative mining (contrastive training data prep): per
    // probe, the 10 most-similar corpus vectors with a DIFFERENT
    // label — broadcast probes, partial top-k bounds the shuffle.
    "q94_hard_negatives" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.hardNegatives(
          e, e.where(col("vec_id") < 5), "vec_id", "embedding", "label",
          k = 10)
        .withColumn("cosine", round(col("cosine"), 6))
        .orderBy("probe_id", "rank")
    }),

    // SemDeDup semantic deduplication: Voronoi-cell partition, then
    // within-cell cosine suppression keeping the min id per semantic
    // group — pairwise work confined to cells (Σ|cell|², never n²).
    // nlist auto-dials to ceil(n/64) (500 rows → 8 at sf0.01), and
    // the oracle derives the SAME count-based seed limit.
    "q93_semantic_dedup" -> ((s, dir) => {
      Similarity.semanticDedup(t(s, dir, "embeddings"), "vec_id", "embedding",
          minCosine = 0.35)
        .orderBy("vec_id")
    }),

    // Per-language corpus statistics (counts exact; avg from exact
    // integer sums).
    "q22_text_stats" -> ((s, dir) => {
      t(s, dir, "documents")
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          sum("n_chars").as("total_chars"),
          sum(TextAnalysis.tokenCount(col("text"))).as("total_tokens"),
          (sum("n_chars").cast("double") / count(lit(1))).as("avg_chars"),
          countDistinct("source").as("n_sources"))
        .orderBy("lang")
    }),

    // Per-document quality features: lexical diversity, stopword
    // ratio, mean token length, composite score.
    "q23_quality_score" -> ((s, dir) => {
      val nTok = TextAnalysis.tokenCount(col("text"))
      val ttr = TextAnalysis.typeTokenRatio(col("text"))
      val stopRatio = TextAnalysis.vocabHits(
        col("text"), Seq("the", "a", "of", "and", "is", "to"))
        .cast("double") / nTok
      val meanTokLen =
        (length(col("text")) - (nTok - 1)).cast("double") / nTok
      t(s, dir, "documents")
        .select(
          col("doc_id"),
          nTok.as("n_tokens"),
          length(col("text")).as("n_chars"),
          round(ttr, 6).as("ttr"),
          round(stopRatio, 6).as("stop_ratio"),
          round(meanTokLen, 6).as("mean_tok_len"),
          round(ttr * 0.5 + (lit(1.0) - stopRatio) * 0.5, 6).as("quality"))
        .orderBy("doc_id")
    }),

    // Stopword-profile language ID (argmax with declaration-order
    // tiebreak) — the classic cheap corpus-routing heuristic.
    "q24_lang_id" -> ((s, dir) => {
      val hits = TextAnalysis.langProfiles.map { case (l, vocab) =>
        TextAnalysis.vocabHits(col("text"), vocab).as(s"${l}_hits")
      }
      t(s, dir, "documents")
        .select(
          col("doc_id") +: hits :+
            TextAnalysis.langId(col("text")).as("predicted"): _*)
        .orderBy("doc_id")
    }),

    // Token counting (whitespace + BPE-ish regex) and canonical
    // normalized-text fingerprint.
    "q25_token_fingerprint" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(
          col("doc_id"),
          TextAnalysis.tokenCount(col("text")).as("ws_tokens"),
          TextAnalysis.regexTokenCount(
            col("text"), "[a-z]+|[0-9]+|[^a-z0-9 ]+").as("regex_tokens"),
          TextAnalysis.fingerprint(col("text")).as("fingerprint"))
        .orderBy("doc_id")
    }),

    // Scalar int8 quantization of embeddings (4× storage compression):
    // per-vector affine codes + reconstruction-error audit, all
    // shuffle-free per-row math.
    "q40_quantize_embeddings" -> ((s, dir) => {
      Similarity.quantizeInt8(t(s, dir, "embeddings"), "embedding", "__q")
        .select(
          col("vec_id"),
          round(col("__q.minv"), 6).as("minv"),
          round(col("__q.scale"), 6).as("scale"),
          array_min(col("__q.codes")).as("q_min"),
          array_max(col("__q.codes")).as("q_max"),
          round(Similarity.dequantMaxErr(col("embedding"), col("__q")), 6)
            .as("max_err"),
          element_at(col("__q.codes"), 1).as("first_code"))
        .orderBy("vec_id")
    }),

    // Corpus-level top document-frequency bigrams — the heavy-hitter
    // aggregation shape: distinct-per-doc shingles, partial-combined
    // count, per-partition top-k (TakeOrderedAndProject).
    "q38_top_ngrams" -> ((s, dir) => {
      Dedup.shingles(t(s, dir, "documents"), "doc_id", "text", n = 2)
        .groupBy("shingle")
        .agg(count(lit(1)).as("df"))
        .orderBy(col("df").desc, col("shingle").asc)
        .limit(50)
        .select(col("shingle").as("ngram"), col("df"))
    }),

    // Benchmark decontamination: docs sharing any distinct 4-gram
    // with the benchmark slice (doc_id % 100 = 0) are flagged — the
    // standard eval-contamination check, as a broadcast semi-join.
    "q39_decontaminate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      TextAnalysis.contaminatedIds(
          docs.where(col("doc_id") % 100 =!= 0),
          docs.where(col("doc_id") % 100 === 0),
          "doc_id", "text", n = 4)
        .orderBy("doc_id")
    }),

    // Deterministic stratified train/val split: assignment from the
    // content-independent id hash (first md5 hex < 'c' → ~75% train),
    // reproducible on any engine with no RNG state; per-language
    // counts audit the stratification.
    "q41_stratified_split" -> ((s, dir) => {
      val split = when(
        substring(md5(col("doc_id").cast("string")), 1, 1) < "c", "train")
        .otherwise("val")
      t(s, dir, "documents")
        .withColumn("split", split)
        .groupBy("lang", "split")
        .agg(
          count(lit(1)).as("n_docs"),
          min("doc_id").as("min_id"),
          sum("n_chars").as("total_chars"))
        .orderBy("lang", "split")
    }),

    // Per-language quota sampling (data mixing): keep a document when
    // its deterministic id-hash fraction falls under the language's
    // quota — reproducible downsampling with no RNG state, the
    // training-mixture primitive.
    "q42_quota_sample" -> ((s, dir) => {
      import s.implicits._
      val quotas = Seq(
        ("en", 0.5), ("es", 0.8), ("de", 0.8), ("fr", 0.3), ("zh", 0.1))
        .toDF("lang", "p")
      val u = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("double") / 4294967296.0
      t(s, dir, "documents")
        .withColumn("u", u)
        .join(broadcast(quotas), "lang")
        .where(col("u") < col("p"))
        .select(col("doc_id"), col("lang"), round(col("u"), 6).as("u"))
        .orderBy("doc_id")
    }),

    // Gopher-style repetition signals: duplicate 2-/3-gram fractions
    // per document (high values flag boilerplate/spam) — distinct
    // counts from the shingle kernel, totals from token arithmetic.
    "q43_repetition" -> ((s, dir) => {
      val w = split(col("text"), " ")
      val total2 = (size(w) - 1).cast("int")
      val total3 = (size(w) - 2).cast("int")
      val dup2 = lit(1.0) -
        size(graft.functions.ShingleArray(col("text"), 2)).cast("double") / total2
      val dup3 = lit(1.0) -
        size(graft.functions.ShingleArray(col("text"), 3)).cast("double") / total3
      t(s, dir, "documents")
        .where(size(w) >= 3)
        .select(
          col("doc_id"),
          round(dup2, 6).as("dup_2gram_frac"),
          round(dup3, 6).as("dup_3gram_frac"),
          (dup2 > 0.5).as("repetitive"))
        .orderBy("doc_id")
    }),

    // Per-label embedding centroids: mean-pooled vectors via explode +
    // two-level aggregation (partial sums map-side combined) — the
    // cluster-summary shape for embedding corpora.
    "q44_label_centroids" -> ((s, dir) => {
      t(s, dir, "embeddings")
        .select(col("label"), posexplode(col("embedding")).as(Seq("d", "x")))
        .groupBy("label", "d")
        .agg((sum(col("x").cast("double")) / count(lit(1))).as("c"))
        .groupBy("label")
        .agg(
          count(lit(1)).cast("int").as("dims"),
          round(sqrt(sum(col("c") * col("c"))), 6).as("centroid_norm"),
          round(min_by(col("c"), col("d")), 6).as("dim0"))
        .orderBy("label")
    }),

    // PII redaction: email addresses replaced with a tag before any
    // text leaves the pipeline (deterministic PII injected on every
    // 40th doc so the scrub demonstrably fires; the synthetic corpus
    // itself is PII-free). Counts + post-scrub fingerprints audit it.
    "q46_pii_redact" -> ((s, dir) => {
      val emailRe = "[a-z0-9.]+@[a-z0-9.]+"
      val injected = when(
        col("doc_id") % 40 === 0,
        concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com now")))
        .otherwise(col("text"))
      t(s, dir, "documents")
        .withColumn("__t", injected)
        .select(
          col("doc_id"),
          size(split(col("__t"), emailRe)).minus(1).as("n_emails"),
          md5(regexp_replace(col("__t"), emailRe, "<EMAIL>"))
            .as("redacted_hash"))
        .orderBy("doc_id")
    }),

    // JSON-path extraction over semi-structured event payloads
    // (get_json_object + cast), filter pushed over the extracted key.
    "q47_json_extract" -> ((s, dir) => {
      t(s, dir, "events")
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .where(col("k") >= 80)
        .orderBy("event_id")
    }),

    // Sequence packing (pretraining batch prep): contiguous-fill
    // assignment of documents to fixed-capacity token bins via a
    // per-language running-token window — each language's stream
    // packs independently (bounded window state; a global pack would
    // range-repartition then offset per-partition bins).
    "q45_sequence_packing" -> ((s, dir) => {
      val cap = 2000
      val nTok = TextAnalysis.tokenCount(col("text"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy("doc_id")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      t(s, dir, "documents")
        .withColumn("n_tokens", nTok)
        .withColumn("__run", sum(col("n_tokens")).over(w))
        .select(
          col("doc_id"), col("lang"), col("n_tokens"),
          floor((col("__run") - col("n_tokens")).cast("double") / cap)
            .cast("int").as("bin"))
        .orderBy("doc_id")
    }),

    // End-to-end curation pipeline — the operator families composed
    // the way a training-data pipeline uses them: exact dedup (keep
    // min id, count copies) → language keep-list → quality gate
    // (token count + stopword ratio) → canonical fingerprints.
    "q34_curation_pipeline" -> ((s, dir) => {
      val withDups = docsWithDups(s, dir, Seq("doc_id", "text", "lang"))
      val nTok = TextAnalysis.tokenCount(col("text"))
      val stopRatio = TextAnalysis.vocabHits(
        col("text"), Seq("the", "a", "of", "and", "is", "to"))
        .cast("double") / nTok
      Dedup.exact(withDups, "text", "doc_id")
        .where(col("lang").isin("en", "es", "de"))
        .withColumn("n_tokens", nTok)
        .withColumn("stop_ratio", round(stopRatio, 6))
        .where(col("n_tokens") >= 30 && col("stop_ratio") <= 0.12)
        .select(
          col("doc_id"), col("lang"), col("n_copies"),
          col("n_tokens"), col("stop_ratio"),
          TextAnalysis.fingerprint(col("text")).as("fingerprint"))
        .orderBy("doc_id")
    }),

    // Content-defined chunking (Karp–Rabin rolling hash, custom
    // codegen'd kernel): chunk boundaries re-align after insertions,
    // so per-chunk hashes fingerprint documents robustly against
    // shifted content. Zero shuffle; fan-out bounded by text size /
    // expected chunk length.
    "q33_rolling_chunks" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(
          col("doc_id"), col("text"),
          posexplode(graft.functions.RollingChunks(col("text"), 16, 32)))
        .select(
          col("doc_id"),
          col("pos").as("chunk_idx"),
          col("col.start").as("start"),
          col("col.len").as("len"),
          md5(col("text").substr(col("col.start"), col("col.len")))
            .as("chunk_hash"))
        .orderBy("doc_id", "chunk_idx")
    }),

    // Multimodal binary columns: payload digests, base64/hex peeks,
    // typed media metadata + aspect-preserving resize arithmetic —
    // all codegen'd binary built-ins, zero shuffle.
    "q26_binary_stats" -> ((s, dir) => {
      val m = Multimodal.synthesize(t(s, dir, "documents"), "doc_id", "text")
      val rd = Multimodal.resizeDims(col("media"), maxDim = 128)
      m.select(
          col("doc_id"),
          col("media.format").as("format"),
          col("media.width").as("width"),
          col("media.height").as("height"),
          Multimodal.nBytes(col("payload")).as("n_bytes"),
          Multimodal.sha256Hex(col("payload")).as("sha256"),
          Multimodal.md5Hex(col("payload")).as("md5"),
          Multimodal.b64(col("payload")).substr(1, 24).as("b64_head"),
          Multimodal.hexHead(col("payload"), 8).as("hex_head"),
          rd.getField("out_w").as("out_w"),
          rd.getField("out_h").as("out_h"))
        .orderBy("doc_id")
    }),

    // Frame sampling over binary payloads (video-chunking shape):
    // 32-byte frames at stride 64 via sequence + posexplode + substr.
    "q27_frame_sample" -> ((s, dir) => {
      val m = Multimodal.synthesize(t(s, dir, "documents"), "doc_id", "text")
      Multimodal.frames(m, "doc_id", "payload", frameSize = 32, stride = 64)
        .select(
          col("doc_id"), col("frame_idx"),
          Multimodal.nBytes(col("frame")).as("frame_bytes"),
          hex(col("frame")).as("frame_hex"))
        .orderBy("doc_id", "frame_idx")
    }),

    // Training-mixture sampling to a token budget: q42's quota
    // primitive with the rates COMPUTED, not given — per-source
    // acceptance rate = min(1, budget·share / observed tokens), then
    // the deterministic id-hash sample at that rate. Mixture weights
    // derive from the source id (scale-free; no hardcoded source
    // list). Two scans of documents (one to size the sources, one to
    // sample) with the rate table — O(sources) rows — broadcast back;
    // the weight normalizer is a window over that already-aggregated
    // frame. All float math is exact-integer sums then one fixed
    // mult/div chain, so both engines bit-agree at the rate boundary.
    // A source with no trailing digits gets NULL weight → NULL rate →
    // dropped, on BOTH sides (Spark's cast NULLs; the oracle uses
    // TRY_CAST so DuckDB NULLs instead of erroring).
    "q84_mixture_sample" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val budget = 15000.0
      val docs = t(s, dir, "documents")
        .select(
          col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("tok"))
      val w = (regexp_extract(col("source"), "(\\d+)$", 1).cast("int") % 4
        + 1).cast("double")
      val rates = docs.groupBy("source")
        .agg(sum(col("tok")).as("tok_s"))
        .withColumn("w", w)
        .withColumn("wsum", sum(col("w")).over(Window.partitionBy(lit(0))))
        .select(
          col("source"),
          least(lit(1.0), lit(budget) * col("w") / col("wsum") / col("tok_s"))
            .as("rate"))
      val u = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("double") / 4294967296.0
      docs
        .join(broadcast(rates), "source")
        .where(u < col("rate"))
        .groupBy(col("source"), col("rate"))
        .agg(count(lit(1)).as("n_kept"), sum(col("tok")).as("tok_kept"))
        .select(
          col("source"), round(col("rate"), 6).as("rate"),
          col("n_kept"), col("tok_kept"))
        .orderBy("source")
    }),

    // Ingestion-time incremental dedup: an incoming batch — ten exact
    // re-sends of corpus docs (caught: identical signatures) plus ten
    // word-reversed variants (novel shingles, survive) — LSH-band-
    // joins against the EXISTING corpus only (new×old pairs, never a
    // self-join of the union), and survivors anti-join out. The
    // corpus-side band table is the persistent dedup index at scale.
    "q87_incremental_dedup" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val incoming = docs.where(col("doc_id") % 50 === 0)
        .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
        .unionByName(docs.where(col("doc_id") % 50 === 25)
          .select(
            (col("doc_id") + 200000L).as("doc_id"),
            concat_ws(" ", reverse(split(col("text"), " "))).as("text")))
      Dedup.dedupAgainst(docs, incoming, "doc_id", "text",
          minEstJaccard = 0.5)
        .select("doc_id")
        .orderBy("doc_id")
    }),

    // Vector-modality counterpart of q87: an incoming embedding batch
    // — fifty exact re-sends (same vector, caught at cosine 1.0 in
    // their SRP bucket) plus fifty negated vectors (opposite bucket,
    // no candidate) — bucket-joins against the EXISTING corpus only.
    // One SRP bucket exchange; in-bucket expansion ~batch·n/2^planes.
    "q89_cross_embed_neardup" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val incoming = emb.where(col("vec_id") % 10 === 0)
        .select((col("vec_id") + 10000L).as("vec_id"), col("embedding"))
        .unionByName(emb.where(col("vec_id") % 10 === 5)
          .select(
            (col("vec_id") + 20000L).as("vec_id"),
            transform(col("embedding"), x => -x).as("embedding")))
      Similarity.crossCorpusNearDups(
          emb, incoming, "vec_id", "embedding",
          numPlanes = 8, numTables = 1, minCosine = 0.35)
        .select(
          col("new_id"), col("old_id"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy("new_id", "old_id")
    }),

    // DSIR importance-weighted selection: hashed unigram+bigram
    // bucket models score every doc by log(p_target/q_raw) with
    // src0/src1 as the target slice; the 50 most target-like docs
    // win (zero-temperature selection — Gumbel resampling composes
    // q112's weighted sampler on exp(log_weight)). One corpus
    // explode + one (doc,bucket) shuffle; 256-row model broadcast.
    "q152_dsir_select" -> ((s, dir) => {
      TextAnalysis.dsirLogWeights(
          t(s, dir, "documents"), "doc_id", "text",
          isTarget = col("source").isin("src0", "src1"))
        .orderBy(col("log_weight").desc, col("doc_id"))
        .limit(50)
    }),

    // Subsequence pattern search: 25 best z-normalized matches of a
    // spike-dip shape across every user's value series — m lead()
    // columns off one per-key window, fixed-IEEE-op distance, global
    // top-k via TakeOrderedAndProject. The oracle repeats the exact
    // expression chain (generated from the same constants).
    "q153_pattern_search" -> ((s, dir) => {
      graft.operators.TimeSeries.patternSearch(
          t(s, dir, "events").select("user_id", "ts", "event_id", "value"),
          "user_id", "ts", "event_id", "value",
          pattern = searchPattern, k = 25)
    }),

    // Threshold variant (batch half of the streaming parity pair):
    // EVERY window within z-normalized distance 1.4 of the shape, in
    // (key, ts) order — same single-WindowExec scorer as q153, filter
    // on the round(6) distance so the cut is engine-reproducible.
    "q154_pattern_matches" -> ((s, dir) => {
      graft.operators.TimeSeries.patternMatches(
          t(s, dir, "events").select("user_id", "ts", "event_id", "value"),
          "user_id", "ts", "event_id", "value",
          pattern = searchPattern, maxDist = 1.4)
    }),

    // Incremental top-k maintenance: fold a new vector batch (every
    // 7th vector re-sent under a shifted id — exact copies that MUST
    // displace old neighbors, e.g. probe 3's clone lands at rank 1,
    // cosine 1.0) into q19's standing top-10 by scanning ONLY the
    // batch. The oracle recomputes top-k over the full union corpus —
    // asserting the identity topk(old ∪ new) = rank(topk(old) ∪
    // topk(new)) that the shared total tie rule guarantees.
    "q155_incremental_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings").select("vec_id", "embedding")
      val probes = emb.where(col("vec_id") < 5)
      val batch = emb.where(col("vec_id") % 7 === 3)
        .select((col("vec_id") + 50000L).as("vec_id"), col("embedding"))
      val prev = Similarity.cosineTopK(emb, probes, "vec_id", "embedding", 10)
      Similarity.cosineTopKIncremental(
          prev, batch, probes, "vec_id", "embedding", 10)
        .withColumn("cosine", round(col("cosine"), 6))
        .orderBy("probe_id", "rank")
    }),

    // Exact substring-span dedup (Lee et al. ExactSubstr, distributed):
    // token positions covered by any corpus-repeated 8-gram are
    // removed; the unique remainder survives. All-integer semantics —
    // the oracle mirrors the n-gram/window pipeline exactly.
    "q156_substring_dedup" -> ((s, dir) => {
      graft.operators.TextAnalysis.substringDedup(
          t(s, dir, "documents").select("doc_id", "text"),
          "doc_id", "text", k = 8, minCount = 2L)
        .orderBy("doc_id")
    }),

    // X4's batch twin, DuckDB-pinned end-to-end: EventStreamsSpec
    // proves streaming sessionize row-identical to EXACTLY this
    // surface — sessionStats over (key, ts) with ties on ts — so
    // pinning it against the oracle on the driver fixture closes the
    // chain streaming == batch twin == DuckDB. Distinct from q72
    // (which ties on event_id and uses the 30-min gap).
    "q160_sessionize_twin" -> ((s, dir) => {
      graft.operators.Sessionize.sessionStats(
          t(s, dir, "events").select("user_id", "ts"),
          "user_id", "ts", tieCol = "ts", gapSeconds = 600L)
        .orderBy("user_id", "session_seq")
    }),

    // X5's batch twin, DuckDB-pinned end-to-end: EventStreamsSpec
    // proves streamingExactDedup's survivor set row-identical to
    // Dedup.exact's (ids arrive in order, so first-seen == min-id).
    // This pins that survivor-ROW surface — (id, content) — on the
    // driver fixture; q15 pins only the (id, n_copies) summary.
    "q161_dedup_twin" -> ((s, dir) => {
      Dedup.exact(docsWithDups(s, dir), "text", "doc_id")
        .select(col("doc_id"), md5(col("text")).as("content_hash"))
        .orderBy("doc_id")
    }),

    // X3's batch twin, DuckDB-pinned end-to-end: the SAME
    // EventStreams.windowedCounts body runs on the batch frame (the
    // analyzer's EliminateEventTimeWatermark drops the no-op
    // watermark), so the epoch-aligned sliding-window assignment +
    // count the streaming sink emits is pinned against an explicit
    // generate_series window expansion. 1h windows sliding 15min:
    // every event lands in exactly 4 windows (w/s), all 4 valid.
    // X16 (round 9): streaming golden record, batch twin — the SAME
    // flatMapGroupsWithState fold runs once per key from empty state
    // in batch mode; per-field stamped state makes the fold order-
    // independent. Same null-injection as q206, string fields only
    // (the state's generic encoding).
    // X2 (round 10): the streaming daily-flow skin driven END TO END
    // — two deterministic daily JSON landing files (derived from
    // events; q06's dep_time formula, per-(day,origin,deptime)
    // argmin dedup so FlightTime ties are impossible under the
    // flow's tie-free default ordering, fixed winter offsets so
    // local order = UTC order) drain through foreachBatch into
    // DailyFlow.processIngested, and the gate reads back the OUTPUT
    // TABLE: schema coercion, UTC enrichment, the cross-day stitch,
    // and the dynamic partition overwrite are all inside the gated
    // surface. The only X2 state is the checkpoint's file log +
    // the table's previous-day partition — both exercised here.
    "q263_streaming_daily_twin" -> ((s, dir) => {
      import java.nio.file.{Files, Paths}
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.types.{StructType, StructField, StringType, LongType}
      import graft.config.{ColumnSpec, EngineConfig}
      val days = Seq("2024-01-05", "2024-01-06")
      val iatas = Seq("JFK", "LAX", "ORD")
      val base = t(s, dir, "events")
        .where(col("ts").cast("date").cast("string").isin(days: _*))
        .select(
          col("ts").cast("date").cast("string").as("FlightDate"),
          col("event_type").as("Reporting_Airline"),
          element_at(typedLit(iatas),
            (col("user_id") % 3).cast("int") + 1).as("Origin"),
          ((col("user_id") % 24) * 100 + (col("event_id") % 60))
            .cast("int").as("DepTime"),
          col("event_id"))
      val w = Window
        .partitionBy(col("FlightDate"), col("Origin"), col("DepTime"))
        .orderBy(col("event_id"))
      val dedup = base.withColumn("__rn", row_number().over(w))
        .where(col("__rn") === 1).drop("__rn", "event_id")
        .barriered
      val landing = Files.createTempDirectory("landing-daily-twin")
      val ckpt = Files.createTempDirectory("ckpt-daily-twin").toString
      days.zipWithIndex.foreach { case (d, i) =>
        val tmp = Files.createTempDirectory(s"dayfile-$i").toString
        dedup.where(col("FlightDate") === d)
          .coalesce(1).write.mode("overwrite").json(tmp)
        val part = Files.list(Paths.get(tmp)).toArray.map(_.toString)
          .filter(p => p.contains("part-") && p.endsWith(".json")).head
        val dest = landing.resolve(s"$d.json")
        Files.move(Paths.get(part), dest)
        // mtime drives the file source's processing order: day 1
        // must land (and write its partition) before day 2 reads it.
        Files.setLastModifiedTime(dest,
          java.nio.file.attribute.FileTime.fromMillis(
            1700000000000L + i * 60000L))
      }
      val cfg = EngineConfig(
        data_columns = Seq(
          ColumnSpec("FlightDate", "date", Some("Flight date")),
          ColumnSpec("Reporting_Airline", "string", Some("Carrier")),
          ColumnSpec("Origin", "string", Some("Origin IATA")),
          ColumnSpec("DepTime", "int", Some("Local departure HHmm"))),
        output_table = Some("flights_stream_twin"),
        output_partitions = Some(2))
      val schema = StructType(Seq(
        StructField("FlightDate", StringType),
        StructField("Reporting_Airline", StringType),
        StructField("Origin", StringType),
        StructField("DepTime", LongType)))
      s.sql("DROP TABLE IF EXISTS flights_stream_twin")
      // A fresh session's catalog doesn't know a previous JVM's
      // managed table, so DROP alone leaves its warehouse directory
      // behind and saveAsTable fails LOCATION_ALREADY_EXISTS —
      // remove the location itself.
      val loc = Paths.get(
        java.net.URI.create(s.conf.get("spark.sql.warehouse.dir"))
          .getPath).resolve("flights_stream_twin")
      if (Files.exists(loc)) {
        Files.walk(loc).sorted(java.util.Comparator.reverseOrder())
          .forEach(p => Files.delete(p))
      }
      new graft.streaming.StreamingDailyFlow(cfg)
        .start(s, landing.toString, schema, ckpt)
        .awaitTermination()
      s.catalog.refreshTable("flights_stream_twin")
      s.table("flights_stream_twin").select(
        col("FlightDate").as("flight_date"),
        col("Reporting_Airline").as("airline"),
        col("Origin").as("origin"),
        col("DepTime").cast("int").as("dep_time"),
        col("FlightTime").cast("long").as("flight_time"),
        col("FlightTime_next").cast("long").as("flight_time_next"),
        col("Airline_next").as("airline_next"),
        col("diff_next"))
        .orderBy("origin", "flight_time")
    }),

    "q223_streaming_golden_twin" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .withColumn("props",
          when(col("event_type") =!= "signup", col("props")))
      graft.streaming.EventStreams.streamingGoldenRecord(
          e, "user_id", "ts", "event_id", Seq("props", "event_type"))
        .toDF()
        .orderBy("key", "field")
    }),

    // X17 (round 9): streaming exact-grid percentile monitor, batch
    // twin — the SAME histogram-state fold runs once per key from
    // empty state; emitted p50/p95/p99 are exact lower nearest-rank
    // order statistics on the floor(value*100) grid, integer rank
    // arithmetic, order-independent state.
    "q237_streaming_percentiles_twin" -> ((s, dir) => {
      graft.streaming.EventStreams.streamingPercentiles(
          t(s, dir, "events"), "event_type", "value")
        .toDF()
        .orderBy("key", "q_per_mille")
    }),

    // X15 (round 9): stream-static broadcast enrichment, batch twin.
    // The SAME staticEnrich body on the batch frame is the identical
    // broadcast left join the micro-batch planner runs per batch;
    // the dim (active customers only) misses some users so the
    // NULL-preserving left side is actually exercised.
    "q208_static_enrich_twin" -> ((s, dir) => {
      val dim = t(s, dir, "customer").where(col("c_acctbal") > 0)
      graft.streaming.EventStreams.staticEnrich(
          t(s, dir, "events")
            .select("event_id", "user_id", "event_type", "value")
            .withColumnRenamed("user_id", "c_custkey"),
          dim, "c_custkey", Seq("c_nationkey", "c_mktsegment"))
        .orderBy("event_id")
    }),

    "q165_windowed_counts_twin" -> ((s, dir) => {
      graft.streaming.EventStreams.windowedCounts(
          t(s, dir, "events").select("ts", "event_type"),
          "ts", "event_type", "1 hour", "15 minutes", "10 minutes")
        .orderBy("window_start", "event_type")
    }),

    // X7's batch twin, DuckDB-pinned end-to-end: the SAME
    // flatMapGroupsWithState Misra-Gries fold runs in batch mode
    // (state starts empty, one batch per shard). The gate
    // configuration keeps capacity (2048) above the token vocabulary
    // (user_id mod 1000 — bounded at ANY scale), where the MG
    // guarantee makes estimates EXACT and order-independent, so the
    // fold is oracle-expressible as a plain GROUP BY count; the
    // decrement branch stays covered by EventStreamsSpec's bounded-
    // state test (capacity 8), which this twin's parity test chains
    // to the same function body.
    "q166_heavy_hitters_twin" -> ((s, dir) => {
      graft.streaming.EventStreams.streamingHeavyHitters(
          t(s, dir, "events")
            .select(pmod(col("user_id"), lit(1000)).cast("string")
              .as("tok")),
          "tok", capacity = 2048, numShards = 4)
        .groupBy(col("token"))
        .agg(sum(col("est")).as("est"))
        .orderBy(col("est").desc, col("token"))
        .limit(100)
    }),

    // X6's batch twin, DuckDB-pinned end-to-end: the SAME
    // EventStreams.intervalJoin body runs on batch frames (both
    // watermarks no-op away), pinning the key-equi + bounded-range
    // attribution join (view <- preceding purchases within 4 h)
    // against a plain range-predicate oracle. Column contract
    // (right_ prefix) rides through unchanged.
    "q168_interval_join_twin" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      graft.streaming.EventStreams.intervalJoin(
          ev.where(col("event_type") === "purchase")
            .select(col("user_id"), col("ts"), col("event_id")),
          ev.where(col("event_type") === "view")
            .select(col("user_id"), col("ts"), col("event_id")),
          "user_id", "ts", "ts",
          maxDelaySeconds = 14400, watermarkDelay = "10 minutes")
        .orderBy("user_id", "event_id", "right_event_id")
    }),

    // X20 (round 12): the LEFT OUTER interval join's batch twin —
    // q168's purchase←view attribution shape with unmatched
    // purchases KEPT (NULL right columns): the organic-conversion
    // rows an inner join cannot produce. A 1h lookback (vs q168's
    // 4h) leaves a real unmatched population at every scale.
    "q308_interval_join_outer_twin" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      graft.streaming.EventStreams.intervalJoinOuter(
          ev.where(col("event_type") === "purchase")
            .select(col("user_id"), col("ts"), col("event_id")),
          ev.where(col("event_type") === "view")
            .select(col("user_id"), col("ts"), col("event_id")),
          "user_id", "ts", "ts",
          maxDelaySeconds = 3600, watermarkDelay = "10 minutes")
        .orderBy("user_id", "event_id", "right_event_id")
    }),

    // X13's batch twin (the q160/q161 program): the streaming
    // attribution fold on the batch frame — flatMapGroupsWithState
    // folds each user once with empty state, reproducing
    // touchAttribution exactly; the DuckDB oracle replays the same
    // RANGE-frame window. Unattributed ids pin to -1.
    "q184_attribution_twin" -> ((s, dir) => {
      graft.streaming.EventStreams.streamingAttribution(
          t(s, dir, "events"), "user_id", "ts", "event_id",
          "event_type", "value",
          conversionType = "purchase", touchTypes = Seq("view", "click"),
          lookbackSeconds = 24L * 3600)
        .toDF()
        .select(col("key").as("user_id"), col("ts").as("conv_ts"),
          col("convId").as("conv_id"), col("value"),
          coalesce(col("firstTouchId"), lit(-1L)).as("first_touch_id"),
          coalesce(col("lastTouchId"), lit(-1L)).as("last_touch_id"))
        .orderBy("conv_id")
    }),

    // V15: hybrid sparse+dense retrieval via reciprocal-rank fusion —
    // BM25 top-20 fused with probe-0's cosine top-20 on doc_id =
    // vec_id (the synthetic tables are row-aligned). All post-
    // retrieval work runs at candidate cardinality (≤ 40 rows).
    "q169_hybrid_rrf" -> ((s, dir) => {
      val sparse = Relevance.bm25TopK(
          t(s, dir, "documents"), "doc_id", "text",
          terms = Seq("spark", "vector", "window"), k = 20)
        .select(col("doc_id"), col("rank"))
      val e = t(s, dir, "embeddings")
      val dense = Similarity.cosineTopK(
          e, e.where(col("vec_id") === 0), "vec_id", "embedding", k = 20)
        .select(col("vec_id").as("doc_id"), col("rank"))
      Relevance.rrfFuse(
          Seq("bm25" -> sparse, "dense" -> dense), "doc_id", k = 20)
        // missing-from-list ranks print as 0 (keeps the gate columns
        // non-nullable int on both engines)
        .withColumn("bm25_rank", coalesce(col("bm25_rank"), lit(0)).cast("int"))
        .withColumn("dense_rank", coalesce(col("dense_rank"), lit(0)).cast("int"))
        .orderBy("rank")
    }),

    // T39: sliding-window RAG chunking — 64-token windows advancing
    // by 32 (50% overlap). Zero shuffles: token hoist + sequence
    // explode + per-chunk slice, all in the scan stage.
    "q170_sliding_chunks" -> ((s, dir) => {
      TextAnalysis.slidingChunks(
          t(s, dir, "documents"), "doc_id", "text",
          window = 64, stride = 32)
        .orderBy("doc_id", "chunk_id")
    }),

    // V16: Matryoshka dim-truncation recall audit — exact cosine
    // top-10 at 16 of 64 dims vs full, recall@10 per probe. Two
    // bounded WindowGroupLimit rankings + a candidate-sized join.
    "q172_truncation_recall" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.dimTruncationRecall(
          e, e.where(col("vec_id") < 5), "vec_id", "embedding",
          k = 10, dims = 16)
        .orderBy("probe_id")
    }),

    // V13: exact embedding covariance/correlation matrix on the
    // floor-quantized grid — the whitening/PCA-preprocessing stats
    // for the ANN/SemDeDup family. Kernel fan-out in-scan, one d²
    // partial-aggregated exchange, integer co-moments in decimal.
    "q167_embed_covariance" -> ((s, dir) => {
      graft.operators.Similarity.embeddingMoments(
          t(s, dir, "embeddings"), "embedding")
        .orderBy("dim_i", "dim_j")
    }),

    // V14 (round 9): quantized power-iteration PCA gains a driver
    // gate — every arithmetic step of Similarity.principalComponents
    // is exact decimal or bit-deterministic IEEE, so the DuckDB
    // oracle REPLAYS all k·iters eigensolve iterations as a generated
    // CTE chain over the q167 covariance and must match hash-exact.
    // The corpus is touched only by the one-pass moments kernel; the
    // eigensolve is O(d²·iters) driver arithmetic (V8 matrix
    // round-trip contract).
    "q195_pca_components" -> ((s, dir) => {
      val pcs = Similarity.principalComponents(
        t(s, dir, "embeddings"), "embedding", k = 3, iters = 20)
      def r6(x: Double): Double = java.math.BigDecimal.valueOf(x)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
      import s.implicits._
      pcs.zipWithIndex.flatMap { case ((lambda, vec), ci) =>
        vec.zipWithIndex.map { case (v, di) =>
          (ci, di, r6(lambda), r6(v))
        }
      }.toDF("component", "dim", "eigenvalue", "loading")
        .orderBy("component", "dim")
    }),

    // M4 plumbing gate (round 9): the codec-boundary decode stub's
    // SPARK SIDE becomes driver-verified — typed Dataset round-trip,
    // mapPartitions batching, fixed-dim schema, and the byte-sampling
    // positions all gate against DuckDB. The payload is each doc's
    // md5 hex rendered as bytes (32 ASCII chars — reproducible in SQL
    // where raw multi-byte text is not), and the fake feature
    // inverts exactly: round(f·255) recovers the sampled byte (float
    // b/255 is within 255·ulp ≪ 0.5 of b). Only the codec CALL SITE
    // stays a stub (the container ships no codec libraries).
    "q201_decode_plumbing" -> ((s, dir) => {
      val payloads = t(s, dir, "documents").select(
        col("doc_id"),
        md5(col("text").cast("binary")).cast("binary").as("payload"))
      graft.operators.Multimodal
        .decodeFeaturesStub(payloads, "doc_id", "payload", dim = 8)
        .select(col("doc_id"), posexplode(col("features")).as(Seq("j", "f")))
        .select(col("doc_id"), col("j").cast("int").as("j"),
          round(col("f").cast("double") * 255).cast("int").as("byte_val"))
        .orderBy("doc_id", "j")
    }),

    // V8 gate (round 9): distributed Lloyd's TRAINING becomes
    // driver-verified. Replayability rests on four facts: (1) at
    // gate scale the corpus fits the 8k seeding pool, and maximin
    // argmax ties are measure-zero on continuous data, so the
    // hash-pool ORDER is value-irrelevant — the oracle re-derives the
    // same seeds in vec_id order; (2) tol = 0 makes extra unrolled
    // iterations value-neutral (converged means are idempotent);
    // (3) the round-9 floor-grid mean is bit-identical on every
    // engine; (4) assignment argmin ties are measure-zero. The
    // oracle unrolls seeding + all 3 Lloyd iterations as CTEs.
    "q200_kmeans_train" -> ((s, dir) => {
      val cents = Similarity.trainCentroids(
        t(s, dir, "embeddings"), "vec_id", "embedding",
        k = 4, maxIter = 3, tol = 0.0, seedPoolSize = Int.MaxValue)
      def r6(x: Double): Double = java.math.BigDecimal.valueOf(x)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
      import s.implicits._
      cents.zipWithIndex.flatMap { case (c, ci) =>
        c.zipWithIndex.map { case (v, di) => (ci, di, r6(v)) }
      }.toDF("cell", "dim", "value").orderBy("cell", "dim")
    }),

    // V17 gate #3 (round 10): PQ codebook TRAINING becomes driver-
    // verified — q200's floor-grid Lloyd's replay applied PER
    // SUBSPACE: m = 4 independent 16-dim trainings on the sliced
    // embedding, same preconditions (pool ⊇ corpus via seedPoolSize,
    // tol = 0 so extra unrolled oracle iterations are value-neutral,
    // floor-grid means, measure-zero argmin/argmax ties). `+ 0.0`
    // normalizes signed-zero roundings on both sides. With q198/q199
    // (encode + ADC on seed codebooks) this closes V17 end to end.
    "q260_pq_train" -> ((s, dir) => {
      val cbs = Similarity.trainPqCodebooks(
        t(s, dir, "embeddings"), "vec_id", "embedding",
        m = 4, k = 4, maxIter = 2, tol = 0.0,
        seedPoolSize = Int.MaxValue)
      def r6(x: Double): Double = java.math.BigDecimal.valueOf(x)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue + 0.0
      import s.implicits._
      cbs.zipWithIndex.flatMap { case (cb, si) =>
        cb.zipWithIndex.flatMap { case (c, ci) =>
          c.zipWithIndex.map { case (v, di) => (si, ci, di, r6(v)) }
        }
      }.toDF("subspace", "cell", "dim", "value")
        .orderBy("subspace", "cell", "dim")
    }),

    // V17 gate #1 (round 9): PQ ENCODE becomes driver-verified with
    // SEED codebooks — the q31 ivfSeeds pattern: codebook entries are
    // the 4 lowest-id vectors' subvectors (oracle-expressible, no
    // Lloyd's replay needed), so the min-L2 argmin projection, tie
    // rule, and subspace slicing are all hash-gated. Lloyd's TRAINING
    // stays spec-covered (the documented driver-matrix contract).
    // Codes render as a string (the q189 cross-engine array rule).
    "q198_pq_codes" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val cbs = pqSeedCodebooks(s, dir, m = 4)
      Similarity.pqEncode(e, "vec_id", "embedding", cbs)
        .select(col("vec_id"),
          concat_ws(",", col("codes")).as("codes"))
        .orderBy("vec_id")
    }),

    // V17 gate #2 (round 9): ADC top-k over the seed-codebook codes —
    // the per-probe (m×k) distance table computes driver-side and
    // broadcasts (m lookups per row), ranking on the bounded window
    // shape; probes are vec_ids 4..6 (disjoint from the codebook
    // seeds so distances are non-trivial).
    "q199_pq_adc" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val cbs = pqSeedCodebooks(s, dir, m = 4)
      val probes = e.where(col("vec_id") >= 4 && col("vec_id") < 7)
        .orderBy("vec_id").select("vec_id", "embedding").collect()
        .map(r => (r.getLong(0),
          r.getSeq[Float](1).map(_.toDouble).toSeq)).toSeq
      val enc = Similarity.pqEncode(e, "vec_id", "embedding", cbs)
      Similarity.pqAdcTopK(enc, "vec_id", "codes", cbs, probes, k = 5)
        .withColumn("adc_dist", round(col("adc_dist"), 6))
        .orderBy("probe_id", "rank")
    }),

    // V21 (round 9): IVF+PQ composed search — the production ANN
    // shape (FAISS IVFx,PQy): 4 seed Voronoi cells route each probe
    // to its 2 closest, PQ codes + broadcast ADC tables score only
    // the routed candidates. Seed centroids AND seed codebooks keep
    // the whole composition DuckDB-replayable; exact-decimal ADC
    // sums keep equal-code ties engine-free.
    "q228_ivfpq_search" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val seeds = Similarity.ivfSeeds(e, "vec_id", "embedding",
        nlist = 4)
      val cbs = pqSeedCodebooks(s, dir, m = 4)
      val probes = e.where(col("vec_id") >= 4 && col("vec_id") < 7)
        .orderBy("vec_id").select("vec_id", "embedding").collect()
        .map(r => (r.getLong(0),
          r.getSeq[Float](1).map(_.toDouble).toSeq)).toSeq
      Similarity.ivfPqSearch(e, "vec_id", "embedding", seeds, cbs,
          probes, nprobe = 2, k = 5)
        .withColumn("adc_dist", round(col("adc_dist"), 6))
        .orderBy("probe_id", "rank")
    }),

    // T50 (round 9): mixture feasibility plan — the "can we even
    // build this mixture?" budget readout: four targeted sources
    // with 40/30/20/10% shares and a 2-epoch upsampling ceiling;
    // the binding source caps the whole corpus. Integer floor
    // arithmetic over one per-source token-mass pass.
    "q239_mixture_plan" -> ((s, dir) => {
      val mass = t(s, dir, "documents")
        .groupBy(col("source"))
        .agg(sum(TextAnalysis.tokenCount(col("text")).cast("long"))
          .as("tokens"))
      Sampling.mixturePlan(mass, "source", "tokens",
          Seq("src0" -> 400, "src1" -> 300, "src2" -> 200,
            "src3" -> 100),
          maxEpochsPerMille = 2000)
        .orderBy("source")
    }),

    // T49 (round 9): semantic benchmark-leakage scan — the embedding
    // arm of decontamination: every corpus vector reports its
    // nearest benchmark neighbor (vec_id % 50 == 0 plays the eval
    // set), the cosine, and the over-threshold flag. One scan,
    // benchmark as a broadcast literal matrix.
    "q235_semantic_leakage" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.semanticLeakage(
          e.where(col("vec_id") % 50 =!= 0),
          e.where(col("vec_id") % 50 === 0),
          "vec_id", "embedding", minCosine = 0.9)
        .orderBy("vec_id")
    }),

    // E26 (round 9): minimum-detectable-effect readout — per
    // event-type segment, the smallest lift a two-proportion test
    // could detect at 5%/80% given the observed arm sizes and
    // baseline rate. The pre-launch design check of the E20/E24/E25
    // experimentation family.
    "q236_mde_readout" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      graft.operators.Quality.mdeReadout(
          ev.where(col("user_id").isNotNull && col("value").isNotNull)
            .select(col("event_type"),
              (col("user_id") % 2 === 0).as("a"),
              (col("value") >= 0.5).as("conv")),
          Seq("event_type"), col("a"), col("conv"))
        .orderBy("event_type")
    }),

    // D18 (round 9): winnowing (MOSS) fingerprint pairs — per-window
    // min-hash selection (k=3 shingles, w=4 windows, rightmost tie)
    // cuts posting volume to ~2/(w+1) of the shingle stream while
    // guaranteeing any copied span of >= w+k-1 tokens shares a
    // fingerprint; docs co-selecting >= 2 distinct fingerprints pair.
    "q232_winnow_pairs" -> ((s, dir) => {
      Dedup.winnowPairs(t(s, dir, "documents"), "doc_id", "text",
          k = 3, w = 4, minShared = 2L)
        .orderBy("doc_a", "doc_b")
    }),

    // E25 (round 9): CUPED variance-reduced readout — per-user
    // pre-period value mass (days 1-15, floor-grid micro-units)
    // predicts the experiment-period mass (days 16+); theta strips
    // the predicted share, var_reduction reports the sensitivity
    // gain. One user collapse + one co-moment pass.
    "q231_cuped" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val units = ev
        .where(col("user_id").isNotNull && col("value").isNotNull)
        .groupBy(col("user_id"))
        .agg(
          sum(when(dayofmonth(col("ts")) <= 15,
            floor(col("value") * 1000000).cast("long"))
            .otherwise(0L)).as("x"),
          sum(when(dayofmonth(col("ts")) > 15,
            floor(col("value") * 1000000).cast("long"))
            .otherwise(0L)).as("y"))
        .withColumn("arm", col("user_id") % 2 === 0)
      graft.operators.Quality.cupedReadout(units, col("arm"),
        col("x"), col("y"))
    }),

    // E47 (round 13): two-covariate regression-adjusted readout —
    // q231's CUPED with BOTH pre-period value mass (micro grid) and
    // pre-period event count (raw grid) as covariates; closed-form
    // 2x2 Cramer solve over exact decimal co-moments, contrasts in
    // integer units until the single display division.
    "q320_regression_adjusted" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val units = ev
        .where(col("user_id").isNotNull && col("value").isNotNull)
        .groupBy(col("user_id"))
        .agg(
          sum(when(dayofmonth(col("ts")) <= 15,
            floor(col("value") * 1000000).cast("long"))
            .otherwise(0L)).as("x1"),
          sum(when(dayofmonth(col("ts")) <= 15, 1L)
            .otherwise(0L)).as("x2"),
          sum(when(dayofmonth(col("ts")) > 15,
            floor(col("value") * 1000000).cast("long"))
            .otherwise(0L)).as("y"))
        .withColumn("arm", col("user_id") % 3 === 0)
      graft.operators.Quality.regressionAdjustedReadout(units,
        col("arm"), col("x1"), col("x2"), col("y"))
    }),

    // V22 (round 9): binary sign quantization + Hamming search — the
    // 32x-compression first-pass filter (XOR+popcount per candidate,
    // the cheapest scorer in the V family). Pure integer end to end:
    // the ONLY ANN scorer needing zero determinism scaffolding.
    "q230_hamming_search" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val enc = Similarity.signQuantize(e, "vec_id", "embedding")
      val probes = e.where(col("vec_id") >= 4 && col("vec_id") < 7)
        .orderBy("vec_id").select("vec_id", "embedding").collect()
        .map(r => (r.getLong(0), Similarity.signWords(
          r.getSeq[Float](1).map(_.toDouble).toSeq))).toSeq
      Similarity.hammingTopK(enc, "vec_id", "words", probes, k = 5)
        .orderBy("probe_id", "rank")
    }),

    // E24 (round 9): BH-FDR over a 35-segment A/B battery — per
    // (event_type, day-bucket) two-proportion z-tests, A&S-erfc
    // p-values on the 6dp grid, then Benjamini–Hochberg q-values and
    // the step-up reject set in pure integer micro-unit arithmetic.
    // The step between "some segment hit p<0.05" and a claim.
    "q229_fdr_battery" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val seg = graft.operators.Quality.abTestBy(
        ev.where(col("user_id").isNotNull && col("value").isNotNull)
          .select(col("event_type"),
            (dayofmonth(col("ts")) % 7).as("day_bucket"),
            (col("user_id") % 2 === 0).as("a"),
            (col("value") >= 0.5).as("conv")),
        Seq("event_type", "day_bucket"), col("a"), col("conv"))
      val keyed = seg.select(
        concat_ws("#", col("event_type"), col("day_bucket")).as("key"),
        col("p_value"))
      graft.operators.Quality.bhFdr(keyed, "key", "p_value",
          alphaPerMille = 100)
        .orderBy("rank")
    }),

    // E16 (round 9): exact distributed AUC of the q23 quality score
    // against an English label — does the score DISCRIMINATE? The
    // Mann–Whitney rank-sum runs on the score-level grouped frame
    // (6dp grid-bounded), integer-exact numerator, one IEEE division.
    "q196_score_auc" -> ((s, dir) => {
      graft.operators.Quality.aucScore(
        qualityScored(s, dir), "quality", "is_en")
    }),

    // E17 (round 9): calibration report (reliability-diagram table)
    // for the same score/label — does 0.9 MEAN 90%? Ten bins, exact
    // decimal score mass, per-bin confidence-vs-rate gap.
    "q197_calibration" -> ((s, dir) => {
      graft.operators.Quality.calibrationReport(
        qualityScored(s, dir), "quality", "is_en", bins = 10)
    }),

    // E18 (round 9): exact two-sample KS drift — largest CDF gap
    // between click and purchase event values on the 2dp floor grid.
    // Integral cross-product gap (common denominator cleared), one
    // corpus groupBy + bin-level ordered pass, single IEEE division.
    "q204_ks_drift" -> ((s, dir) => {
      val e = t(s, dir, "events")
      graft.operators.Quality.ksTest(
        e.where(col("event_type").isin("click", "purchase")),
        floor(col("value") * 100).cast("long"),
        col("event_type") === "click")
    }),

    // E20 (round 9): two-proportion z-test — even/odd user split,
    // conversion = any purchase event. One per-user collapse, one
    // agg row, fixed IEEE op chain over exact counts.
    "q211_ab_ztest" -> ((s, dir) => {
      val users = t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "purchase", 1L)
          .otherwise(0L)).as("conv"))
      graft.operators.Quality.abTest(
        users, col("user_id") % 2 === 0, col("conv") === 1L)
    }),

    // D16 (round 9): canonical pick per near-dup cluster — keep the
    // highest-quality copy, singletons trivially canonical; the
    // false rows are the removal audit trail. q48 clusters x q196
    // quality.
    "q221_canonical_pick" -> ((s, dir) => {
      val nTok = TextAnalysis.tokenCount(col("text"))
      val ttr = TextAnalysis.typeTokenRatio(col("text"))
      val stopRatio = TextAnalysis.vocabHits(
        col("text"), Seq("the", "a", "of", "and", "is", "to"))
        .cast("double") / nTok
      val scored = t(s, dir, "documents").select(
        col("doc_id"),
        round(ttr * 0.5 + (lit(1.0) - stopRatio) * 0.5, 6).as("quality"))
      val pairs = Dedup.minhashCandidates(
          t(s, dir, "documents"), "doc_id", "text",
          numHashes = 8, rowsPerBand = 2, shingleSize = 3)
        .where(col("n_match") >= 7)
      Dedup.canonicalPick(
        scored, "doc_id", "quality", Dedup.nearDupClusters(pairs))
    }),

    // Round-9 composite: the corpus-RELEASE manifest — canonical
    // dedup (D16) keeps one best copy per cluster, the released
    // per-source slice is then summarized with the R23 mergeable
    // digest pair. One gated query proving the operators COMPOSE:
    // any divergence in clustering, picking, or digesting fails the
    // hash.
    "q222_release_manifest" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val nTok = TextAnalysis.tokenCount(col("text"))
      val ttr = TextAnalysis.typeTokenRatio(col("text"))
      val stopRatio = TextAnalysis.vocabHits(
        col("text"), Seq("the", "a", "of", "and", "is", "to"))
        .cast("double") / nTok
      val scored = docs.select(
        col("doc_id"),
        round(ttr * 0.5 + (lit(1.0) - stopRatio) * 0.5, 6).as("quality"))
      val pairs = Dedup.minhashCandidates(
          docs, "doc_id", "text",
          numHashes = 8, rowsPerBand = 2, shingleSize = 3)
        .where(col("n_match") >= 7)
      val picks = Dedup.canonicalPick(
        scored, "doc_id", "quality", Dedup.nearDupClusters(pairs))
      val released = docs
        .join(picks.where(col("is_canonical")).select("doc_id"),
          Seq("doc_id"), "left_semi")
      graft.operators.Quality.tableFingerprint(
          released, Seq("doc_id", "text"), "source")
        .orderBy("source")
    }),

    // E23 (round 9): Poisson-bootstrap 95% CI for the mean purchase
    // value — all 32 resamples ride ONE scan with 32 counters
    // (per-(row,b) Poisson(1) multiplicities from md5 uniforms);
    // nearest-rank order statistics of the resample means.
    "q220_bootstrap_ci" -> ((s, dir) => {
      graft.operators.Profile.bootstrapMeanCI(
        t(s, dir, "events").where(col("event_type") === "purchase"),
        "value", Seq("event_id"), b = 32, alphaPerMille = 50)
    }),

    // V20 (round 9): MRR/NDCG@10 of cosine retrieval against labels
    // — is the top-k any GOOD, not just index-faithful. 50 probes;
    // rounded-decimal gain sums, broadcast ideal-DCG table.
    "q219_retrieval_metrics" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val ranked = graft.operators.Similarity.cosineTopK(
        emb, emb.where(col("vec_id") < 50), "vec_id", "embedding", k = 10)
      graft.operators.Similarity.retrievalMetrics(
        ranked, emb, "vec_id", "label", k = 10)
    }),

    // T46 (round 9): deterministic 5-fold assignment + per-source
    // balance report — the reprocessing-stable split whose skew this
    // report checks before trusting a fold as an eval set.
    "q218_fold_balance" -> ((s, dir) => {
      graft.operators.Sampling.foldBalance(
        t(s, dir, "documents"), "doc_id", "source", k = 5)
    }),

    // K17 (round 9): GFS retention plan over the daily partition
    // inventory as of Jan 31 — 7 dailies, then last-day-of-week for
    // 3 weeks, last-day-of-month for 2 months, rest expired. Pure
    // calendar arithmetic on metadata rows.
    "q217_retention_plan" -> ((s, dir) => {
      val inv = t(s, dir, "events")
        .select(to_date(col("ts")).as("pdate")).distinct()
      graft.operators.Layout.retentionPlan(
        inv, "pdate", lit("2024-01-31").cast("date"),
        keepDaily = 7, keepWeekly = 3, keepMonthly = 2)
    }),

    // E22 (round 9): hour-of-week seasonal baseline anomaly — first
    // three weeks train per-(dow, hour) mean/std in exact decimals,
    // the final week scores against them; rolling windows would flag
    // every Monday morning as an anomaly of Sunday night.
    "q216_seasonal_anomaly" -> ((s, dir) => {
      graft.operators.TimeSeries.seasonalBaselineAnomalies(
        t(s, dir, "events"), "ts", "value",
        lit("2024-01-22 00:00:00").cast("timestamp"), threshold = 3.0)
    }),

    // E21 (round 9): Kaplan-Meier signup->purchase survival "as of
    // Jan 11" — hours from each user's first pre-cutoff signup to
    // their first later OBSERVED purchase; no purchase by the cutoff
    // = censored there, still shrinking the risk set for as long as
    // observed (the survivorship-bias fix a converters-only average
    // silently lacks). Bounded duration grid (hours).
    "q214_kaplan_meier" -> ((s, dir) => {
      val cutoff = lit("2024-01-11 00:00:00").cast("timestamp")
      val e = t(s, dir, "events")
      val su = e.where(col("event_type") === "signup" && col("ts") < cutoff)
        .groupBy(col("user_id")).agg(min(col("ts")).as("s_ts"))
      val pu = e.where(col("event_type") === "purchase" && col("ts") < cutoff)
        .select(col("user_id"), col("ts").as("p_ts"))
      val subj = su
        .join(pu,
          su("user_id") === pu("user_id") && col("p_ts") > col("s_ts"),
          "left")
        .groupBy(su("user_id"), col("s_ts"))
        .agg(min(col("p_ts")).as("p_first"))
        .select(
          floor((unix_micros(coalesce(col("p_first"), cutoff)) -
            unix_micros(col("s_ts"))) / lit(3600000000L))
            .cast("long").as("dur_h"),
          col("p_first").isNotNull.as("ev"))
      graft.operators.Funnel.kaplanMeier(subj, "dur_h", "ev")
    }),

    // V19 (round 9): simplified-silhouette label audit — per-vector
    // (b - a)/max(a, b) against label centroids; s < 0 localizes a
    // probably-wrong label. O(n·d·L), no corpus-sized shuffle beyond
    // the partial-aggregated distance fold.
    "q213_silhouette" -> ((s, dir) => {
      graft.operators.Similarity.silhouetteAudit(
        t(s, dir, "embeddings"), "vec_id", "label", "embedding")
    }),

    // M9 (round 9): binary-payload near-dups — byte-shingle SimHash
    // over the synthesized media blobs, 4x16-bit band bucket join
    // (never all-pairs), exact hamming <= 3 verify.
    "q212_binary_neardups" -> ((s, dir) => {
      val m = Multimodal.synthesize(t(s, dir, "documents"), "doc_id", "text")
      Multimodal.binaryNearDups(m, "doc_id", "payload")
    }),

    // E19 (round 9): per-source Lorenz/Gini concentration of document
    // char mass — the corpus-balance audit before source mixing.
    // Tie-invariant integral numerator, one key exchange.
    "q205_source_gini" -> ((s, dir) => {
      graft.operators.Quality.lorenzGini(
        t(s, dir, "documents"), "source", "n_chars")
    }),

    // K16 (round 9): incremental rollup maintenance — per-user state
    // built separately for the two halves of January, merged WITHOUT
    // rescanning either half. The oracle recomputes from scratch:
    // merged-state == full-recompute is the gate (count/sum/min/max
    // additive in exact decimals; R23 digest pair carries row-set
    // identity across the merge).
    "q207_incremental_rollup" -> ((s, dir) => {
      val split = lit("2024-01-16 00:00:00").cast("timestamp")
      val e = t(s, dir, "events")
        .select(col("user_id"), col("value"), col("ts"), col("event_id"))
      val a = graft.operators.Incremental.aggState(
        e.where(col("ts") < split), Seq("user_id"), "value",
        Seq("event_id"))
      val b = graft.operators.Incremental.aggState(
        e.where(col("ts") >= split), Seq("user_id"), "value",
        Seq("event_id"))
      graft.operators.Incremental.finish(
          graft.operators.Incremental.mergeStates(
            a.unionByName(b), Seq("user_id")),
          Seq("user_id"))
        .orderBy("user_id")
    }),

    // V18 (round 9): MMR diversified top-8 against probe vector 0 —
    // greedy λ·rel − (1−λ)·max-sim pick, one pool scan per round,
    // incremental max-sim against only the newest pick, k-row
    // bounded-driver contract. Oracle replays all 8 rounds as a
    // materialized-CTE chain.
    "q209_mmr_select" -> ((s, dir) => {
      graft.operators.Similarity.mmrSelect(
        t(s, dir, "embeddings"), "vec_id", "embedding",
        queryId = 0L, k = 8, lambda = 0.7)
    }),

    // T44 (round 9): BPE merge training — the map-reduce tokenizer
    // trainer. One corpus shuffle builds the Heaps'-bounded word
    // vocab; each of the 12 rounds is one explode+partial-agg
    // exchange over the vocab plus a 1-row argmax collect (the
    // bounded driver round-trip contract). All-integer counts,
    // deterministic tie-break, literal-replace merge semantics
    // shared bit-for-bit by Java/Spark/DuckDB — the oracle replays
    // every round as a generated CTE chain (the q200 pattern).
    "q202_bpe_merges" -> ((s, dir) => {
      val model = graft.operators.Bpe.train(
        t(s, dir, "documents"), "text", numMerges = 12)
      graft.operators.Bpe.mergeTable(s, model).orderBy("rank")
    }),

    // T44 (round 10): BATCHED BPE training against the SEQUENTIAL
    // replay oracle — the guard (prefix rule + symbol disjointness +
    // strict new-pair dominance) makes multi-merge rounds provably
    // identical to the one-merge-per-round fold, and this gate pins
    // that claim against DuckDB's sequential replay at every scale.
    "q262_bpe_batched" -> ((s, dir) => {
      val (model, _) = graft.operators.Bpe.trainBatched(
        t(s, dir, "documents"), "text", numMerges = 12, batchSize = 4)
      graft.operators.Bpe.mergeTable(s, model).orderBy("rank")
    }),

    // T45 (round 9): BPE encode report over the training corpus —
    // tokens-per-doc and chars-per-token compression against the
    // q202 model. Encoding is a dictionary equi-join against the
    // trained vocab (never a per-row re-merge), one groupBy; the
    // oracle replays the training chain then joins identically.
    "q203_bpe_encode" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val model = graft.operators.Bpe.train(docs, "text", numMerges = 12)
      graft.operators.Bpe.encodeReport(docs, "doc_id", "text", model)
        .orderBy("doc_id")
    }),

    // Same scorer at a different shape: m = 12, multi-decimal pattern
    // values — one window pass still computes all 12 lead columns,
    // and the generated oracle carries full-precision literals.
    "q159_pattern_m12" -> ((s, dir) => {
      graft.operators.TimeSeries.patternSearch(
          t(s, dir, "events").select("user_id", "ts", "event_id", "value"),
          "user_id", "ts", "event_id", "value",
          pattern = searchPatternM12, k = 20)
    }),

    // X11's batch twin, DuckDB-pinned end-to-end (the q160/q161
    // program): EventStreamsSpec proves streamingEwma row-identical
    // to TimeSeries.ewma; this pins the batch fold itself against a
    // recursive-CTE oracle running the SAME IEEE op chain. alpha =
    // 0.25 so alpha and 1-alpha are both exact binary doubles — which
    // ALSO makes the smoothed values dyadic, so their decimal
    // expansions routinely land exactly on ...5 at the 7th digit and
    // round(6) tie-breaks DIFFERENTLY across engines (Spark HALF_UP
    // on the shortest decimal repr vs DuckDB's scale-round-unscale).
    // The outputs therefore compare on a floor grid: the folds are
    // bit-identical, so floor(x·1e6) is the same integer in both
    // engines — no tie to break.
    "q163_ewma_twin" -> ((s, dir) => {
      graft.operators.TimeSeries.ewma(
          t(s, dir, "events"), "user_id", "ts", "event_id", "value",
          alpha = 0.25)
        .select(col("key"), col("ts"), col("tie"), col("value"),
          (floor(col("ewma") * lit(1000000.0)) / lit(1000000.0))
            .as("ewma"),
          (floor(col("residual") * lit(1000000.0)) / lit(1000000.0))
            .as("residual"))
        .orderBy("key", "ts", "tie")
    }),

    // X10's batch twin, same program: Page's clamped two-sided CUSUM
    // with alarm reset — the max(0,·) recurrence is not window-
    // expressible, but a recursive CTE replays the identical clamped
    // fold (all constants exact binary: 50.0 / 0.5 / 8.0).
    "q164_cusum_twin" -> ((s, dir) => {
      graft.operators.TimeSeries.cusum(
          t(s, dir, "events"), "user_id", "ts", "event_id", "value",
          target = 50.0, slack = 0.5, h = 8.0)
        .select(col("key"), col("ts"), col("tie"), col("value"),
          round(col("s_pos"), 6).as("s_pos"),
          round(col("s_neg"), 6).as("s_neg"), col("alarm"))
        .orderBy("key", "ts", "tie")
    }),

    // Gopher repetition filters: modal-bigram token share +
    // duplicated-trigram position fraction per doc — all-integer
    // numerators, one tagged-gram explode, one count shuffle.
    "q162_repetition_signals" -> ((s, dir) => {
      graft.operators.TextAnalysis.repetitionSignals(
          t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // Temperature-scaled source mixture (alpha = 0.5): exactly 200
    // docs, per-source budgets proportional to sqrt(char mass) with
    // largest-remainder rounding, picks in md5 hash order. sqrt is
    // IEEE-correctly-rounded in both engines (pow is not) and the
    // normalizing total rides DECIMAL(28,10) — the oracle repeats the
    // identical arithmetic.
    "q158_temperature_mixture" -> ((s, dir) => {
      graft.operators.Sampling.temperatureMixture(
          t(s, dir, "documents").select("source", "doc_id", "n_chars"),
          "source", "doc_id", "n_chars", totalK = 200)
        .orderBy("source", "pick_rank")
    }),

    // D15: exact directional containment join at C >= 0.8 over the
    // dup-injected corpus — probe-prefix × full-postings equi-join,
    // size prune, codegen'd n_common verify. Catches subsumption
    // pairs Jaccard (q111) structurally misses.
    "q185_containment_join" -> ((s, dir) => {
      Dedup.containmentJoin(
          docsWithDups(s, dir), "doc_id", "text",
          threshold = 0.8, shingleSize = 3)
        .orderBy("doc", "container")
    }),

    // T40: GPT-style concat-and-chunk packing — each doc's half-open
    // token span and the 512-token context windows it lands in,
    // streams cut per source. One shard-keyed window pass, no global
    // state.
    "q186_pack_chunks" -> ((s, dir) => {
      graft.operators.Packing.concatChunks(
          t(s, dir, "documents"), "source", "doc_id", "text",
          budget = 512)
        .orderBy("source", "doc_id")
    }),

    // T41: per-source packing-efficiency report over q186's layout —
    // chunk counts, tail padding, boundary-straddling docs.
    "q187_packing_report" -> ((s, dir) => {
      graft.operators.Packing.packingReport(
          t(s, dir, "documents"), "source", "doc_id", "text",
          budget = 512)
        .orderBy("source")
    }),

    // E15: deterministic round-robin interleave order across sources
    // — per-source rank via keyed window, global emission position
    // via the K12 two-level bucketed ordinal (no single-task window).
    "q188_interleave_order" -> ((s, dir) => {
      graft.operators.Sampling.interleaveOrder(
          t(s, dir, "documents"), "source", "doc_id")
        .orderBy("global_pos")
    }),

    // R23: order-independent content fingerprint of lineitem per
    // return flag — one scan, map-side-combined digests (count, XOR,
    // exact decimal sum, min, max of 60-bit row hashes).
    "q189_table_fingerprint" -> ((s, dir) => {
      graft.operators.Quality.tableFingerprint(
          t(s, dir, "lineitem"),
          Seq("l_orderkey", "l_linenumber", "l_returnflag",
            "l_linestatus"),
          "l_returnflag")
        .orderBy("l_returnflag")
    }),

    // T42: Zipf-law fit over the top-500 vocabulary — ln/ln OLS with
    // 6dp-rounded DECIMAL co-moments (exact, order-independent sums)
    // and the trendFit double-op finish.
    "q190_zipf_fit" -> ((s, dir) => {
      graft.operators.TextAnalysis.zipfFit(
          t(s, dir, "documents"), "doc_id", "text", topK = 500)
        .orderBy("corpus")
    }),

    // T43: per-source vocabulary richness — instances, vocab, hapax
    // legomena, TTR, hapax share. One (source, token) count shuffle;
    // second pass at vocabulary cardinality.
    // T47: PII exposure scan across three text surfaces — per
    // (source, class) exposed docs / matches / spanned chars; regex
    // match arrays are scan projections, counters partial-aggregate,
    // the exchange carries |sources|·4 rows. The customer name
    // column's 9-digit serials light up digit_run; the toy corpora
    // carry no emails/IPs/cards — the zero rows are part of the pin.
    "q226_pii_scan" -> ((s, dir) => {
      val u = t(s, dir, "documents")
        .select(col("text"), lit("documents").as("src"))
        .unionByName(t(s, dir, "customer")
          .select(col("c_name").as("text"), lit("customer").as("src")))
        .unionByName(t(s, dir, "events")
          .select(col("props").as("text"), lit("events").as("src")))
      TextAnalysis.piiScan(u, "text", "src")
        .select(col("grp").as("source"), col("pii_class"),
          col("n_docs"), col("n_matches"), col("match_chars"))
        .orderBy("source", "pii_class")
    }),

    // T47b: redaction audit — scrub the same three surfaces
    // (email → <EMAIL>, IPv4 candidate → <IP>, ≥9-digit run →
    // <NUM>, in that order) and pin rows changed, char deltas, and
    // an exact decimal digest of the redacted text (the q189
    // string-rendered sum rule), so the scrubbed OUTPUT is what the
    // oracle certifies, not just the match counts.
    "q227_pii_redact" -> ((s, dir) => {
      val u = t(s, dir, "documents")
        .select(col("text"), lit("documents").as("src"))
        .unionByName(t(s, dir, "customer")
          .select(col("c_name").as("text"), lit("customer").as("src")))
        .unionByName(t(s, dir, "events")
          .select(col("props").as("text"), lit("events").as("src")))
      val red = TextAnalysis.piiRedact(coalesce(col("text"), lit("")))
      u.select(col("src"), coalesce(col("text"), lit("")).as("t0"),
          red.as("t1"))
        .groupBy("src")
        .agg(
          count(lit(1)).as("n_rows"),
          sum(when(col("t0") =!= col("t1"), 1L).otherwise(0L))
            .as("n_changed"),
          sum(length(col("t0")).cast("long")).as("chars_before"),
          sum(length(col("t1")).cast("long")).as("chars_after"),
          sum(conv(substring(md5(col("t1")), 1, 15), 16, 10)
              .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
            .cast("string").as("sum_hash"))
        .select(col("src").as("source"), col("n_rows"),
          col("n_changed"), col("chars_before"), col("chars_after"),
          col("sum_hash"))
        .orderBy("source")
    }),

    "q191_vocab_richness" -> ((s, dir) => {
      graft.operators.TextAnalysis.vocabularyRichness(
          t(s, dir, "documents"), "source", "text")
        .orderBy("source")
    }),

    // G2: exact triangle counts over the q16 near-dup candidate
    // graph — degree-ordered orientation (wedge volume ≤ m^1.5),
    // wedge self-join + closing-edge equi-join, never nested-loop.
    // Clique-y template families vs chains of incidental overlap.
    "q192_triangle_counts" -> ((s, dir) => {
      val edges = Dedup.minhashCandidates(
          t(s, dir, "documents"), "doc_id", "text",
          numHashes = 8, rowsPerBand = 2, shingleSize = 3)
        .select("doc_a", "doc_b")
      graft.operators.Graph.triangleCounts(edges, "doc_a", "doc_b")
        .orderBy("node")
    }),

    // G15 (round 13): global transitivity over the q192 candidate
    // graph — the clique-vs-chain dedup-policy dial as ONE number:
    // C = 3T/W from a single aggregate over the triangle counts.
    "q327_transitivity" -> ((s, dir) => {
      val edges = Dedup.minhashCandidates(
          t(s, dir, "documents"), "doc_id", "text",
          numHashes = 8, rowsPerBand = 2, shingleSize = 3)
        .select("doc_a", "doc_b")
      graft.operators.Graph.transitivity(edges, "doc_a", "doc_b")
    }),

    // G3 (round 9): 2-core of the same near-dup candidate graph —
    // iterative peel (degree < 2 nodes out, neighbors re-checked),
    // 6 fixed rounds (converges in <= 3 at gate scales; extra
    // rounds value-neutral), replayed as an unrolled CTE chain.
    "q215_kcore" -> ((s, dir) => {
      val edges = Dedup.minhashCandidates(
          t(s, dir, "documents"), "doc_id", "text",
          numHashes = 8, rowsPerBand = 2, shingleSize = 3)
        .select("doc_a", "doc_b")
      graft.operators.Graph.kCore(edges, "doc_a", "doc_b",
        k = 2, rounds = 6)
    }),

    // G5 (round 9): link prediction over the co-purchase graph
    // (parts bought by >= 3 common customers) — non-adjacent part
    // pairs sharing co-purchase neighbors are the recommendation /
    // "related items" candidates, top-1000 by Adamic-Adar. (The
    // near-dup candidate graph is the wrong substrate: LSH band
    // buckets close their own triangles, so it has no open wedges.)
    // Via-degree cap 256 bounds wedge fan-out at hub parts, mirrored
    // in the oracle; top-k rides TakeOrderedAndProject.
    "q240_link_predict" -> ((s, dir) => {
      val edges = graft.operators.Graph.bipartiteProject(
        t(s, dir, "lineitem")
          .join(t(s, dir, "orders"),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("o_custkey").as("cust"),
            col("l_partkey").as("part")),
        "cust", "part", minSupport = 3L)
      graft.operators.Graph.linkPredict(edges, "node_a", "node_b",
          maxViaDegree = 256)
        .orderBy(col("adamic_adar").desc, col("node_a"), col("node_b"))
        .limit(1000)
    }),

    // G7 (round 9; hub-cap exercised round 10): the weighted
    // bipartite projection itself — top co-purchase part pairs by
    // shared-customer support; the graph-construction primitive
    // q240/G5 consumes. A deterministic BOT basket (cust = -1 paired
    // with EVERY part) is planted in the input and `maxBasket = 128`
    // drops it AT EVERY SCALE: 128 is above every organic basket
    // (max 66/90/105 at sf0.001/0.01/0.1) so the organic projection
    // is untouched, and below the hub's |parts| (200/2000/20000) so
    // a regression in the cap logic would connect all part pairs and
    // flip the result. Oracle mirrors both the plant and the cap.
    "q245_bipartite_project" -> ((s, dir) => {
      val organic = t(s, dir, "lineitem")
        .join(t(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("cust"),
          col("l_partkey").as("part"))
      val hub = t(s, dir, "part")
        .select(lit(-1L).as("cust"), col("p_partkey").as("part"))
      graft.operators.Graph.bipartiteProject(
          organic.unionByName(hub), "cust", "part",
          minSupport = 3L, maxBasket = 128L)
        .orderBy(col("support").desc, col("node_a"), col("node_b"))
        .limit(2000)
    }),

    // G6 (round 9): contamination blast radius — deterministic
    // leaked-doc stand-ins (doc_id % 25) expand 3 hops through the
    // near-dup graph; hop number grades eviction confidence.
    "q241_bfs_hops" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val edges = Dedup.minhashCandidates(
          docs, "doc_id", "text",
          numHashes = 8, rowsPerBand = 2, shingleSize = 3)
        .select("doc_a", "doc_b")
      graft.operators.Graph.bfsHops(edges, "doc_a", "doc_b",
        docs.where(col("doc_id") % 25 === 0), "doc_id", rounds = 3)
    }),

    // E27 (round 9): Mann-Whitney U rank-sum test — the
    // distribution-free arm comparison for the skewed `value` metric
    // per event_type segment; exact tie-corrected rank statistics
    // from one tie-group shuffle + a distinct-value window.
    "q242_mann_whitney" -> ((s, dir) => {
      graft.operators.Quality.mannWhitneyBy(
          t(s, dir, "events"), Seq("event_type"),
          col("user_id") % 2 === 0, col("value"))
        .orderBy("event_type")
    }),

    // E28 (round 9): autocorrelation function at lags 1..5 per
    // event_type — the independence diagnostic before trusting
    // bootstrap widths / anomaly thresholds; one window pass
    // computes all leads, exact decimal moment sums, fixed IEEE
    // finish.
    "q243_autocorrelation" -> ((s, dir) => {
      graft.operators.TimeSeries.autocorrelation(
          t(s, dir, "events"), "event_type", "ts", "event_id",
          "value", maxLag = 5)
        .orderBy("event_type", "lag")
    }),

    // G8 (round 9): degree-assortativity summary of the co-purchase
    // graph — the 30-second structural triage (hubs-to-hubs vs
    // hub-and-spoke) before committing to iterative graph dials.
    "q248_assortativity" -> ((s, dir) => {
      val edges = graft.operators.Graph.bipartiteProject(
        t(s, dir, "lineitem")
          .join(t(s, dir, "orders"),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("o_custkey").as("cust"),
            col("l_partkey").as("part")),
        "cust", "part", minSupport = 3L)
      graft.operators.Graph.degreeAssortativity(
        edges, "node_a", "node_b")
    }),

    // G8 variant (round 10): assortativity on the LOOSE near-dup
    // candidate graph (8 single-hash bands — the recall-oriented
    // regime with real wedge structure; the production 4×2 banding
    // closes its own triangles, the round-9 gotcha) — the G8 triage
    // gated on the graph family it was built for.
    "q264_neardup_assortativity" -> ((s, dir) => {
      val edges = Dedup.minhashCandidates(
          t(s, dir, "documents"), "doc_id", "text",
          numHashes = 8, rowsPerBand = 1, shingleSize = 3)
        .select("doc_a", "doc_b")
      graft.operators.Graph.degreeAssortativity(edges, "doc_a", "doc_b")
    }),

    // G5 variant (round 10): link prediction on the same loose
    // near-dup graph — the stated G5 motivation ("pairs LSH probably
    // missed") gated on its own substrate, with the via-degree cap
    // ACTIVE at both gate scales (cap 8 < max degree 12-13),
    // mirrored in the oracle.
    "q265_neardup_link_predict" -> ((s, dir) => {
      val edges = Dedup.minhashCandidates(
          t(s, dir, "documents"), "doc_id", "text",
          numHashes = 8, rowsPerBand = 1, shingleSize = 3)
        .select("doc_a", "doc_b")
      graft.operators.Graph.linkPredict(edges, "doc_a", "doc_b",
          maxViaDegree = 8)
        .orderBy(col("adamic_adar").desc, col("node_a"), col("node_b"))
        .limit(1000)
    }),

    // Q8 (round 10): k-anonymity / l-diversity release audit — the
    // pre-release privacy gate. QI = (nation, segment, 1000-unit
    // account band): the externally-joinable combination; sensitive =
    // the customer-name tail digit (the synthetic stand-in for a
    // disclosure-bearing attribute). Exact integers end to end; one
    // QI groupBy + one single-row reduce, no joins.
    "q266_k_anonymity" -> ((s, dir) => {
      graft.operators.Quality.kAnonymityAudit(
        t(s, dir, "customer")
          .withColumn("acct_band", floor(col("c_acctbal") / lit(1000.0d)))
          .withColumn("cohort",
            expr("substring(c_name, length(c_name), 1)")),
        Seq("c_nationkey", "c_mktsegment", "acct_band"),
        "cohort", k = 5L, l = 2L)
    }),

    // D19 (round 10): Fellegi–Sunter probabilistic linkage over the
    // part catalog — sorted-neighborhood candidates (p_name order,
    // w=6), five comparison fields with reviewer m-priors and
    // frequency-estimated u; per-pair γ-pattern + exact 6dp decimal
    // score, top-300 probable matches.
    "q267_record_linkage" -> ((s, dir) => {
      val p = t(s, dir, "part").select(
        col("p_partkey"), col("p_name"), col("p_brand"), col("p_type"),
        split(col("p_name"), " ").getItem(0).as("name_head"),
        floor(col("p_retailprice") / lit(100.0d)).cast("string")
          .as("price_band"),
        col("p_size").cast("string").as("size_str"))
      val pairs = Fuzzy.sortedNeighborhoodCandidates(
        p, "p_partkey", col("p_name"), windowSize = 6)
      Fuzzy.fellegiSunter(p, "p_partkey", pairs,
          Seq("p_brand" -> 0.9, "p_type" -> 0.85, "name_head" -> 0.8,
            "price_band" -> 0.7, "size_str" -> 0.75))
        .orderBy(col("score").desc, col("id_a"), col("id_b"))
        .limit(300)
    }),

    // G9 (round 10): HITS hubs/authorities over the customer→part
    // purchase digraph — discerning buyers vs staple products; 4
    // exact nano-grid mutual-recursion rounds, oracle-replayed as an
    // unrolled materialized-CTE chain (the q123 pattern).
    // r16 optimization (guide §2.3, narrower types): the loop state
    // and the 8 per-round edge shuffles carry LONG node keys
    // (c:k → 2k, p:k → 2k+1 — parity-disjoint by construction, cast
    // long so the 10× audit's shifted keys can't overflow an int),
    // decoded back to the identical "c:"/"p:" strings only in the
    // final projection; scores are key-independent nano-grid longs,
    // so the output is bit-identical (parity-checked at all scales).
    // Measured at sf0.1: 9.7 s → 7.5 s warm.
    "q268_hits" -> ((s, dir) => {
      val e = t(s, dir, "lineitem")
        .join(t(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .select(
          (col("o_custkey").cast("long") * 2).as("src"),
          (col("l_partkey").cast("long") * 2 + 1).as("dst"))
      graft.operators.Graph.hits(e, "src", "dst", iters = 4)
        .select(
          when(pmod(col("node"), lit(2L)) === 0L,
            concat(lit("c:"), expr("node div 2")))
            .otherwise(concat(lit("p:"), expr("(node - 1) div 2")))
            .as("node"),
          col("hub"), col("auth"))
        .orderBy("node")
    }),

    // V24 (round 10): data-independent JL random projection of the
    // embedding corpus, 64 → 16 dims via the seed-derived ±1 sign
    // matrix — zero training scans, exact micro-unit sums, IEEE
    // finish on the 6dp floor grid (dOut = 16 makes 1/√dOut = 0.25
    // exactly representable). Exploded for the oracle compare.
    "q269_random_projection" -> ((s, dir) => {
      Similarity.randomProject(
          t(s, dir, "embeddings"), "vec_id", "embedding",
          dIn = 64, dOut = 16, seed = 7L)
        .select(col("id").as("vec_id"),
          posexplode(col("proj")).as(Seq("dim", "value")))
        .orderBy("vec_id", "dim")
    }),

    // E36 (round 10): sample-ratio-mismatch guardrail — the
    // assignment-plumbing alarm run before any experiment readout;
    // per event_type the observed user_id-parity split vs the
    // designed 50/50, q229's exact z→erf-polynomial parity recipe.
    "q270_srm_check" -> ((s, dir) => {
      graft.operators.Quality.srmCheck(
          t(s, dir, "events"), Seq("event_type"),
          col("user_id") % 2 === 0, expectedShare = 0.5)
        .orderBy("event_type")
    }),

    // R27 (round 10): join-fanout audit of the classic accidental
    // blow-up (lineitem self-join on orderkey) — per-key pair counts
    // and the exact predicted output cardinality, computed from the
    // key histograms WITHOUT running the join.
    "q271_join_fanout" -> ((s, dir) => {
      graft.operators.Profile.joinFanoutAudit(
          t(s, dir, "lineitem"), "l_orderkey",
          t(s, dir, "lineitem"), "l_orderkey", topK = 100)
        .orderBy(col("pairs").desc, col("key"))
    }),

    // T54 (round 10): corpus-divergence readout — smoothed unigram
    // KL both directions between the en and de slices, the
    // mixture-drift dial; per-term round(12) decimal sums.
    "q272_corpus_divergence" -> ((s, dir) => {
      Relevance.corpusDivergence(
        t(s, dir, "documents"), "lang", "text", "en", "de")
    }),

    // G10 (round 10): personalized PageRank from seed customers over
    // the bidirectional purchase bipartition (the Pixie serving
    // shape — "related parts for THIS customer cohort"); exact
    // nano-grid integer walk, unrolled-CTE oracle replay.
    // r16 optimization (guide §2.3): LONG node keys through the walk
    // loop (c:k → 2k, p:k → 2k+1), decoded to the identical strings
    // in the final projection — same transform as q268; the
    // nano-grid walk arithmetic never touches the key. Measured at
    // sf0.1: ~10 s → ~7 s warm (mini-batch).
    "q273_personalized_pagerank" -> ((s, dir) => {
      val purchases = t(s, dir, "lineitem")
        .join(t(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey"), col("l_partkey"))
        .agg(count(lit(1)).as("w"))
      val edges = purchases.select(
          (col("o_custkey").cast("long") * 2).as("src"),
          (col("l_partkey").cast("long") * 2 + 1).as("dst"), col("w"))
        .unionAll(purchases.select(
          (col("l_partkey").cast("long") * 2 + 1).as("src"),
          (col("o_custkey").cast("long") * 2).as("dst"), col("w")))
      val seeds = t(s, dir, "customer")
        .where(col("c_custkey") % 100 === 0)
        .select((col("c_custkey").cast("long") * 2).as("node"))
      graft.operators.Graph.personalizedPageRank(
          edges, "src", "dst", "w", seeds, "node",
          damping = 0.85, iters = 4)
        .select(
          when(pmod(col("node"), lit(2L)) === 0L,
            concat(lit("c:"), expr("node div 2")))
            .otherwise(concat(lit("p:"), expr("(node - 1) div 2")))
            .as("node"),
          col("score"))
        .orderBy("node")
    }),

    // T55 (round 10): language-mixture entropy — the code-switch
    // detector whole-doc argmax langid cannot be; zero exchanges,
    // pure scan projection.
    "q274_language_mixture" -> ((s, dir) => {
      TextAnalysis.languageMixture(
          t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // V25 (round 10): embedding snapshot drift — mean-vector cosine/
    // L2/norms between the label-parity halves; the ANN re-index
    // trigger (pairs with q255's single-snapshot isotropy).
    "q275_embedding_drift" -> ((s, dir) => {
      Similarity.embeddingDrift(
        t(s, dir, "embeddings"), "embedding",
        col("label") % 2 === 0, dims = 64)
    }),

    // E37 (round 10): delta-method ratio-metric readout — value-per-
    // event per user (the unit), arm = user parity, per event_type;
    // the readout for revenue-per-session-class metrics where both
    // the row-level test and the unit-ratio mean are wrong.
    "q276_ratio_metric" -> ((s, dir) => {
      val units = t(s, dir, "events")
        .where(col("user_id").isNotNull && col("value").isNotNull)
        .groupBy(col("event_type"), col("user_id"))
        .agg(sum(col("value").cast("decimal(18,6)")).as("x"),
          count(lit(1)).as("y"))
      graft.operators.Quality.ratioMetricReadout(
          units, Seq("event_type"), col("user_id") % 2 === 0,
          col("x"), col("y"))
        .orderBy("event_type")
    }),

    // E39 (round 10): A/A calibration battery — 12 deterministic
    // null splits of the q229 conversion metric; every significant
    // replicate is a false positive, so the significant-fraction IS
    // the stack's real alpha.
    "q281_aa_calibration" -> ((s, dir) => {
      graft.operators.Quality.aaCalibration(
          t(s, dir, "events"), col("user_id"), col("value") >= 0.5,
          replicates = 12, alpha = 0.05)
        .orderBy("replicate")
    }),

    // T57 (round 10): reference-overlap rate — per-doc fraction of
    // distinct trigrams present in the src0 reference slice; the
    // graded memorization/quotation dial behind the binary
    // decontamination flag.
    "q282_reference_overlap" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      TextAnalysis.referenceOverlapRate(
          d.where(col("source") =!= "src0"), "doc_id", "text",
          d.where(col("source") === "src0"), "text", n = 3)
        .orderBy("doc_id")
    }),

    // M4 (round 11): REAL image decode through the JDK's own
    // javax.imageio codec — one deterministic 8x8 BMP per part
    // (pixels a pure integer formula of the id), decoded back to
    // width/height/per-channel means inside the batched
    // mapPartitions plumbing; a deliberately corrupt payload
    // exercises the decode_ok=false triage path. The oracle never
    // decodes: it recomputes the EXPECTED features arithmetically
    // from the same pixel formula — exact integer channel sums, one
    // IEEE division by the 64-pixel count.
    "q283_image_decode" -> ((s, dir) => {
      val ids = t(s, dir, "part").select(col("p_partkey").as("id"))
      val imgs = Multimodal.withSyntheticBmp(ids, "id", w = 8, h = 8)
      val corrupt = s.range(1).select(lit(-1L).as("id"),
        encode(lit("definitely not an image"), "UTF-8").as("payload"))
      Multimodal.decodeImageFeatures(
          imgs.unionByName(corrupt), "id", "payload")
        .orderBy("id")
    }),

    // M13 (round 12): perceptual aHash over DECODED pixels — base
    // 16x16 synthetic BMPs for every part id plus a corner-perturbed
    // twin (id -> -(id+1), +8 on a 2x2 region, mod-256 wraparound
    // deliberate) for every 10th id; the oracle replays the whole
    // integer pipeline (luma, floor-grid blocks, cross-multiplied
    // global-mean threshold) from the pixel formula without decoding.
    "q304_image_ahash" -> ((s, dir) => {
      val ids = t(s, dir, "part").select(col("p_partkey").as("id"))
      val imgs = Multimodal.withSyntheticBmpPairs(ids, "id",
        w = 16, h = 16, everyK = 10L,
        delta = 8, regionW = 2, regionH = 2)
      Multimodal.imageAHash(imgs, "id", "payload").orderBy("id")
    }),

    // M13 (pair stage): banded Hamming near-dup pairs over the q304
    // fixture — each perturbed twin pairs with its base at the
    // replayed hamming. The 4x16 band join AND the 64-cap are
    // mirrored in the oracle; the cap is deliberately ACTIVE at
    // sf0.1 (max band bucket 236 there vs 4/19 at sf0.001/0.01),
    // so this gate verifies the deterministic cap replay itself —
    // the safety rail a skew-concentrated corpus depends on.
    "q305_image_neardups" -> ((s, dir) => {
      val ids = t(s, dir, "part").select(col("p_partkey").as("id"))
      val imgs = Multimodal.withSyntheticBmpPairs(ids, "id",
        w = 16, h = 16, everyK = 10L,
        delta = 8, regionW = 2, regionH = 2)
      Multimodal.imageNearDups(imgs, "id", "payload",
        maxHamming = 3, capPerBucket = 64)
    }),

    // D22 (round 11): EM-estimated Fellegi–Sunter m/u/λ over the
    // q267 candidate pairs — 3 fields, 3 fixed EM rounds on the
    // γ-pattern histogram, micro-grid state; the oracle unrolls the
    // identical EM as a materialized-CTE chain (fsEmOracle).
    "q284_linkage_em" -> ((s, dir) => {
      val p = t(s, dir, "part").select(
        col("p_partkey"), col("p_name"), col("p_brand"), col("p_type"),
        split(col("p_name"), " ").getItem(0).as("name_head"))
      val pairs = Fuzzy.sortedNeighborhoodCandidates(
        p, "p_partkey", col("p_name"), windowSize = 6)
      Fuzzy.fellegiSunterEm(p, "p_partkey", pairs,
          Seq("p_brand", "p_type", "name_head"), iters = 3,
          m0 = 0.9, u0 = 0.1, lambda0 = 0.1)
        .orderBy("field")
    }),

    // E40 (round 11): A/A battery for the delta-method ratio readout
    // — 8 mix31 null splits of per-user (sum value, event count)
    // rows, each through the full q276 machinery; the significant
    // fraction IS the ratio stack's real alpha.
    "q285_aa_ratio" -> ((s, dir) => {
      val units = t(s, dir, "events")
        .where(col("user_id").isNotNull && col("value").isNotNull)
        .groupBy(col("user_id"))
        .agg(sum(col("value").cast("decimal(18,6)")).as("x"),
          count(lit(1)).as("y"))
      graft.operators.Quality.aaRatioCalibration(
          units, col("user_id"), col("x"), col("y"), replicates = 8)
        .orderBy("replicate")
    }),

    // E41 (round 11): A/A battery for the sequential SRM monitor —
    // 8 mix31 null splits each replaying the full cumulative-look
    // scan; any_alarm across replicates is the monitor's FAMILY-WISE
    // false-alarm rate under the null.
    "q286_aa_sequential" -> ((s, dir) => {
      graft.operators.Quality.aaSequentialBattery(
          t(s, dir, "events"), to_date(col("ts")), col("user_id"),
          replicates = 8, alarmP = 0.001)
        .orderBy("replicate")
    }),

    // M12 (round 11): REAL audio decode through the JDK's own
    // javax.sound.sampled WAV codec — one deterministic 256-sample
    // 16-bit PCM clip per part (samples a pure integer formula of
    // the id), decoded back to format fields + integer peak + exact
    // mean |sample|; a corrupt payload exercises decode_ok=false.
    // The oracle recomputes the expected features arithmetically
    // from the sample formula.
    "q287_audio_decode" -> ((s, dir) => {
      val ids = t(s, dir, "part").select(col("p_partkey").as("id"))
      val wavs = Multimodal.withSyntheticWav(
        ids, "id", nSamples = 256, sampleRate = 16000)
      val corrupt = s.range(1).select(lit(-1L).as("id"),
        encode(lit("RIFF....WAVEnot really a wav"), "UTF-8")
          .as("payload"))
      Multimodal.decodeAudioFeatures(
          wavs.unionByName(corrupt), "id", "payload")
        .orderBy("id")
    }),

    // Q10 (round 11): ε-DP count release over (lang, source) corpus
    // statistics — two-sided-geometric noise from the seeded
    // md5-uniform + the driver-generated integer threshold table;
    // the oracle consumes the SAME literal table (dpOracle).
    "q288_dp_release" -> ((s, dir) => {
      graft.operators.Quality.dpCountRelease(
          t(s, dir, "documents"), Seq("lang", "source"),
          epsilon = 0.5, seed = 42L, clampK = 39)
        .orderBy("lang", "source")
    }),

    // X18 (round 11): Spark's NATIVE session_window aggregation over
    // the events stream — the one sessionizer shape that runs
    // unchanged in batch and streaming; same merge boundary as
    // q72's gaps-and-islands, half-open end = last+gap — the oracle
    // mirrors both exactly.
    "q289_session_window" -> ((s, dir) => {
      graft.operators.Sessionize.sessionWindowStats(
          t(s, dir, "events"), "user_id", "ts", gap = "6 hours")
        .orderBy("user_id", "session_start")
    }),

    // V26 (round 11): IVF nprobe recall sweep — recall@5 of ivfSearch
    // vs the exact cosine top-5 at nprobe ∈ {1,2,4,8} over nlist=8
    // seed cells; one corpus pass serves every sweep point, and
    // nprobe=nlist must read 1.0.
    "q290_ivf_recall" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.ivfRecallSweep(
          e, e.where(col("vec_id") < 8), "vec_id", "embedding",
          nlist = 8, nprobes = Seq(1, 2, 4, 8), k = 5)
    }),

    // Q11 (round 11): declarative expectation suite — six
    // Deequ-style checks over documents evaluated in ONE pass; the
    // source unique-rate check is deliberately unsatisfiable so the
    // failed-verdict path is driver-exercised.
    "q291_expectations" -> ((s, dir) => {
      import graft.operators.Profile._
      expectationSuite(t(s, dir, "documents"), Seq(
          Completeness("text", 0.99),
          Completeness("lang", 0.99),
          UniqueRate("doc_id", 1.0),
          UniqueRate("source", 0.5),
          InRangeRate("n_chars", 1.0, 100000.0, 0.99),
          MatchRate("lang", "^[a-z]{2}$", 0.9)))
        .orderBy("check")
    }),

    // E42 (round 11): MDE for ratio metrics — the delta-method power
    // analysis over the q276 per-user units; completes the
    // proportion/continuous/ratio design triple.
    "q292_mde_ratio" -> ((s, dir) => {
      val units = t(s, dir, "events")
        .where(col("user_id").isNotNull && col("value").isNotNull)
        .groupBy(col("event_type"), col("user_id"))
        .agg(sum(col("value").cast("decimal(18,6)")).as("x"),
          count(lit(1)).as("y"))
      graft.operators.Quality.mdeRatio(units, Seq("event_type"),
          col("user_id") % 2 === 0, col("x"), col("y"))
        .orderBy("event_type")
    }),

    // E43 (round 11): isotonic (PAV) calibration of the q196/q197
    // quality score against the lang='en' label — the monotone
    // recalibration map via the exact minimax closed form; one bin
    // shuffle, everything after on the ≤101-row bin table.
    "q293_isotonic_fit" -> ((s, dir) => {
      graft.operators.Quality.isotonicCalibration(
        qualityScored(s, dir), "quality", "is_en", scale = 2)
    }),

    // G11 (round 11): hierarchy flattening over the deterministic
    // binary tree child i -> parent i div 2 on customer keys — one
    // equi-join per fixed round; depth <= 13 at sf0.1, cap 16
    // inactive at every gate scale.
    "q294_hierarchy_flatten" -> ((s, dir) => {
      val e = t(s, dir, "customer").select(
        col("c_custkey").cast("long").as("child"),
        // integer div end-to-end (the q220 rule): Spark `div` ==
        // DuckDB `//` for non-negative operands
        when(col("c_custkey") === 1, lit(null).cast("long"))
          .otherwise(expr("c_custkey div 2").cast("long")).as("parent"))
      graft.operators.Graph.flattenHierarchy(
          e, "child", "parent", maxDepth = 16)
        .orderBy("node")
    }),

    // V27 (round 11): PQ reconstruction-error audit over the q198
    // seed codebooks — per-subspace count/MSE/max of the squared L2
    // to the nearest codeword, micro-unit floor grid; the (m, k)
    // tuning readout.
    "q295_pq_recon_error" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.pqReconstructionError(
        e, "vec_id", "embedding", pqSeedCodebooks(s, dir, m = 4))
    }),

    // Q10b (round 12): ε-DP count release over a PUBLIC key domain —
    // the membership-safe variant (r11 ADVICE): the released row set
    // is a literal 7-language domain (two langs absent from the
    // corpus exercise the zero-count noise-floor path), never the
    // observed groups.
    "q296_dp_domain_release" -> ((s, dir) => {
      import s.implicits._
      val domain = Seq("de", "en", "es", "fr", "zh", "xx", "yy")
        .toDF("lang")
      graft.operators.Quality.dpCountReleaseOverDomain(
          t(s, dir, "documents"), domain, Seq("lang"),
          epsilon = 0.5, seed = 43L, clampK = 39)
        .orderBy("lang")
    }),

    // Q12 (round 12): bounded-contribution ε-DP SUM release — per
    // event_type totals of floor(value) clamped into [0, 8] (Δ = 8,
    // the clamp genuinely bites: raw values reach ~490), noise from
    // the same geometric mechanism at ε/Δ with K scaled to the
    // widened tail (320 ≈ 20·Δ/ε).
    "q297_dp_sum_release" -> ((s, dir) => {
      graft.operators.Quality.dpSumRelease(
          t(s, dir, "events"), Seq("event_type"), col("value"),
          epsilon = 0.5, seed = 44L, clampHi = 8L, clampK = 320)
        .orderBy("event_type")
    }),

    // V28 (round 12): recall sweep for the COMPOSED IVF+PQ path —
    // the q228 serving shape finally gets its recall-vs-(nprobe, m)
    // surface (q290 audits routing alone, q199/q295 audit PQ alone);
    // probes are vec_ids 8..15, disjoint from the 8 IVF seed
    // centroids AND the 4 codebook seeds so every loss source is
    // live. nprobe=8 rows isolate pure ADC loss (all cells scanned).
    "q298_ivfpq_recall" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val seeds = Similarity.ivfSeeds(e, "vec_id", "embedding",
        nlist = 8)
      Similarity.ivfPqRecallSweep(
        e, e.where(col("vec_id") >= 8 && col("vec_id") < 16),
        "vec_id", "embedding", seeds,
        Seq(pqSeedCodebooks(s, dir, m = 2),
          pqSeedCodebooks(s, dir, m = 4)),
        nprobes = Seq(1, 2, 4, 8), k = 5)
    }),

    // T45b (round 12): the BPE batch re-mint guard at the DRIVER
    // gate (r11 ADVICE noted q262's corpus never re-mints):
    // single-letter runs make the same concatenation reachable from
    // different decompositions across rounds, so batched training
    // hits accept-and-stop mid-batch — and must still equal the
    // SEQUENTIAL replay oracle merge for merge.
    // T60 (round 14): unigram-LM tokenizer trainer — the
    // SentencePiece-style EM/pruning complement of T44's BPE. Seed =
    // corpus alphabet + top-24 substrings (len 2..4, count ≥ 2);
    // three Viterbi-EM rounds under the strict-improvement accept
    // gate; output = the final accepted piece table, all exact
    // integers (counts + micro log-probs). Words over 12 chars are
    // excluded from training (documented regime — the bounded-DP
    // replay contract).
    "q330_unigram_lm" -> ((s, dir) => {
      val model = graft.operators.UnigramLm.train(
        t(s, dir, "documents").select(col("text")), "text",
        seedMaxPieceLen = 4, multiKeep = 24, maxWordLen = 12,
        minCount = 2L, rounds = 3)
      graft.operators.UnigramLm.pieceTable(s, model).orderBy("rank")
    }),

    // T60 companion (round 14): encode the corpus with the trained
    // unigram model — the T45-for-T60 symmetry; q203's
    // dictionary-join shape and floor-grid compression.
    "q333_unigram_encode" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val model = graft.operators.UnigramLm.train(
        docs.select(col("text")), "text",
        seedMaxPieceLen = 4, multiKeep = 24, maxWordLen = 12,
        minCount = 2L, rounds = 3)
      graft.operators.UnigramLm.encode(docs, "doc_id", "text", model,
          maxWordLen = 12)
        .orderBy("doc_id")
    }),

    // T61 (round 14): encoding REPAIR — act on q325's signal over
    // the same injected corruption; output pins the exact repaired
    // text via md5 + length, and clean_after re-measures.
    "q334_encoding_repair" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .where(col("text").isNotNull)
        .withColumn("text",
          when(col("doc_id") % 50 === 0,
            concat(col("text"), lit("Ã©"), lit(""),
              lit("�")))
            .when(col("doc_id") % 25 === 0,
              concat(col("text"), lit("Ã©"), lit("")))
            .otherwise(col("text")))
      TextAnalysis.encodingRepair(d, "doc_id", "text")
        .orderBy("doc_id")
    }),

    "q299_bpe_remint" -> ((s, dir) => {
      val corpus = t(s, dir, "documents").select(
        expr("CASE WHEN doc_id % 3 = 0" +
          " THEN repeat('b', CAST(doc_id % 9 + 2 AS INT))" +
          " ELSE repeat('a', CAST(doc_id % 11 + 2 AS INT)) END")
          .as("text"))
      val (model, _) = graft.operators.Bpe.trainBatched(
        corpus, "text", numMerges = 16, batchSize = 4)
      graft.operators.Bpe.mergeTable(s, model).orderBy("rank")
    }),

    // D23 (round 12): term-frequency-adjusted Fellegi–Sunter — the
    // q267 linkage with Splink's tf adjustment: agreement weight per
    // VALUE (rare brands outscore common ones), disagreement on the
    // global-u weight; top-300 by adjusted score.
    "q300_fellegi_tf" -> ((s, dir) => {
      val p = t(s, dir, "part").select(
        col("p_partkey"), col("p_name"), col("p_brand"), col("p_type"),
        split(col("p_name"), " ").getItem(0).as("name_head"))
      val pairs = Fuzzy.sortedNeighborhoodCandidates(
        p, "p_partkey", col("p_name"), windowSize = 6)
      Fuzzy.fellegiSunterTf(p, "p_partkey", pairs,
          Seq("p_brand" -> 0.9, "p_type" -> 0.85, "name_head" -> 0.8))
        .orderBy(col("score").desc, col("id_a"), col("id_b"))
        .limit(300)
    }),

    // Q14 (round 12): ε-DP histogram release over public bin edges —
    // the canonical DP mechanism closing the release family: 10
    // fifty-wide bins over events.value, end bins clamping, every
    // bin released (zero-count noise floor included).
    "q310_dp_histogram" -> ((s, dir) => {
      graft.operators.Quality.dpHistogramRelease(
        t(s, dir, "events"), col("value"),
        edges = (0L to 500L by 50L), epsilon = 0.5, seed = 46L,
        clampK = 39)
    }),

    // Q13 (round 12): ε-DP QUANTILE release — exponential mechanism
    // over a public 33-point value grid: the per-event_type median
    // of value, weights from the shared driver-generated literal
    // table, division-free decimal pick. Completes the DP release
    // trilogy (counts q288/q296, sums q297, cut points here).
    "q301_dp_quantile_release" -> ((s, dir) => {
      graft.operators.Quality.dpQuantileRelease(
          t(s, dir, "events"), Seq("event_type"), col("value"),
          grid = (0L to 512L by 16L), qNum = 1, qDen = 2,
          epsilon = 1.0, seed = 45L, clampUtil = 400)
        .orderBy("event_type")
    }),

    // D25 (round 12): incremental CC maintenance — yesterday's q48
    // clusters plus a deterministic "today": the injected-dup links
    // (id, id+100000) and bridge merges (id, id+50) for id % 97 = 0.
    // Exercises cluster merges, new-node joins, and new ids taking
    // over as min-representatives; the oracle recomputes CC from
    // scratch over the union edge set (recursive closure).
    "q311_incremental_clusters" -> ((s, dir) => {
      val pairs = Dedup.minhashCandidates(
          t(s, dir, "documents"), "doc_id", "text",
          numHashes = 8, rowsPerBand = 2, shingleSize = 3)
        .where(col("n_match") >= 7)
        .select(col("doc_a"), col("doc_b"))
      val assignments = Dedup.nearDupClusters(pairs)
      val docs = t(s, dir, "documents").select(col("doc_id"))
      val dupEdges = docs.where(col("doc_id") % 50 === 0)
        .select(col("doc_id").as("doc_a"),
          (col("doc_id") + 100000).as("doc_b"))
      val bridges = docs.where(col("doc_id") % 97 === 0)
        .select(col("doc_id").as("doc_a"),
          (col("doc_id") + 50).as("doc_b"))
        .join(docs.select(col("doc_id").as("doc_b")), Seq("doc_b"))
        .select("doc_a", "doc_b")
      Dedup.incrementalClusters(
        assignments, dupEdges.unionByName(bridges))
    }),

    // T58 (round 12): Flesch readability over the corpus with
    // sentence boundaries injected deterministically (the fixture
    // has no punctuation: 'batch' -> 'batch.'), leaving batch-less
    // docs to pin the NULL unpunctuated branch.
    "q309_readability" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"),
        expr("replace(text, 'batch', 'batch.')").as("text"))
      TextAnalysis.readabilityScores(docs, "doc_id", "text")
        .orderBy("doc_id")
    }),

    // E44 (round 12): winsorized mean A/B readout — per event_type,
    // the user_id%3 arm contrast on floor-grid micro-values clamped
    // at the POOLED [5%, 95%] nearest-rank edges; Welch z + p on the
    // capped metric. Clamps genuinely bite on the heavy-ish value
    // tail.
    "q306_winsorized_readout" -> ((s, dir) => {
      graft.operators.Quality.winsorizedMeanReadout(
          t(s, dir, "events")
            .where(col("user_id").isNotNull && col("value").isNotNull),
          Seq("event_type"), col("user_id") % 3 === 0,
          floor(col("value") * 1000000).cast("long"),
          loQ = 0.05, hiQ = 0.95)
        .orderBy("event_type")
    }),

    // E45 (round 12): cluster-randomized readout — user_id clusters,
    // user%3 arms, with a deterministic ~0.1% row-level arm flip
    // (event_id % 997) contaminating a few clusters to exercise the
    // exclusion path; Welch over exact per-cluster micro totals.
    "q312_cluster_readout" -> ((s, dir) => {
      val base = col("user_id") % 3 === 0
      val arm = when(col("event_id") % 997 === 0, !base).otherwise(base)
      graft.operators.Quality.clusterRandomizedReadout(
        t(s, dir, "events")
          .where(col("user_id").isNotNull && col("value").isNotNull),
        col("user_id"), arm,
        floor(col("value") * 1000000).cast("long"))
    }),

    // E46 (round 12): post-stratified readout — event_type strata ×
    // user%3 arms on the micro grid: within-stratum contrasts
    // combined with population weights, per-term 12dp decimal sums.
    "q314_post_stratified" -> ((s, dir) => {
      graft.operators.Quality.postStratifiedReadout(
        t(s, dir, "events")
          .where(col("event_type").isNotNull &&
            col("user_id").isNotNull && col("value").isNotNull),
        col("event_type"), col("user_id") % 3 === 0,
        floor(col("value") * 1000000).cast("long"))
    }),

    // V29 (round 12): SQ8 symmetric-quantized inner-product search —
    // corpus-trained scale, exact integer scores (zero float hazard
    // in scoring OR ranking), q19's probe convention.
    "q313_sq8_search" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.sq8Search(e, e.where(col("vec_id") < 5),
          "vec_id", "embedding", k = 10)
        .orderBy("probe_id", "rank")
    }),

    // V30 (round 13): IVF-routed SQ8 search — V29's exact integer
    // scoring behind 4-cell Voronoi routing (nprobe = 2), the FAISS
    // IVFx,SQ8 serving shape q313 scored unrouted. Seed centroids
    // keep the routing DuckDB-replayable (q228's pattern); the
    // corpus-global SQ8 scale and exact long scores keep the
    // ranking engine-free.
    "q315_ivf_sq8_search" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val seeds = Similarity.ivfSeeds(e, "vec_id", "embedding",
        nlist = 4)
      Similarity.ivfSq8Search(e, e.where(col("vec_id") < 5),
          "vec_id", "embedding", seeds, nprobe = 2, k = 10)
        .orderBy("probe_id", "rank")
    }),

    // V32 (round 13): recall sweep for the IVF+SQ8 path — q315's
    // serving composition priced against the exact cosine ground
    // truth per nprobe (routing + integer-quantization + metric
    // mismatch, composed). Probes 8..16, disjoint from the 8 seed
    // cells; nprobe = 8 isolates pure SQ8 loss (all cells scanned).
    "q324_ivf_sq8_recall" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.ivfSq8RecallSweep(
        e, e.where(col("vec_id") >= 8 && col("vec_id") < 16),
        "vec_id", "embedding", nlist = 8,
        nprobes = Seq(1, 2, 4, 8), k = 5)
    }),

    // V35 (round 15): retrieve-then-rerank — the production serving
    // shape: ivfSq8Search over-fetches 30 candidates per probe
    // (nlist 4, nprobe 2), the exact cosine re-scores only those and
    // cuts to 10; output is cosineTopK-shaped so downstream code
    // can't tell it isn't exact search.
    "q345_retrieve_rerank" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val seeds = Similarity.ivfSeeds(e, "vec_id", "embedding",
        nlist = 4)
      Similarity.retrieveRerank(e, e.where(col("vec_id") < 5),
          "vec_id", "embedding", seeds, nprobe = 2,
          candidates = 30, k = 10)
        .withColumn("cosine", round(col("cosine"), 6))
        .orderBy("probe_id", "rank")
    }),

    // V35 readout: what the rerank buys — recall@5 of the quantized
    // stage alone vs the reranked pipeline at the same routing
    // (nlist 8, nprobe 2, 25 candidates), both against one exact
    // ground-truth pass. Routing misses stay missed (nprobe's dial);
    // the delta isolates the ordering loss the exact re-score
    // removes. On these near-isotropic synthetic embeddings the SQ8
    // ordering loss is ~zero, so the two stages read EQUAL recall
    // (the loss is all routing) — that equality is itself the
    // measurement; SimilaritySpec's outlier-crushed fixture pins the
    // regime where rerank recovers 0 → 1.
    "q346_rerank_recall" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val seeds = Similarity.ivfSeeds(e, "vec_id", "embedding",
        nlist = 8)
      Similarity.retrieveRerankReadout(
        e, e.where(col("vec_id") >= 8 && col("vec_id") < 16),
        "vec_id", "embedding", seeds, nprobe = 2,
        candidates = 25, k = 5)
    }),

    // V34 (round 14): SQ8 scale-calibration audit — exact
    // nearest-rank |component| percentiles at 950/990/1000‰, the
    // resulting scales, clipped fractions, and floor-grid
    // reconstruction MSE per candidate. The clip flag lives on the
    // floor(|x|·1e6) grid (r15 fix), so the 1000‰ row reads zero
    // clipped by construction; its scale is the grid-floored
    // 127/(vu/1e6), within one part in 1e6·v of sq8Search's exact
    // 127/max|x|.
    "q336_sq8_calibration" -> ((s, dir) => {
      Similarity.sq8CalibrationAudit(
        t(s, dir, "embeddings"), "vec_id", "embedding",
        clipPerMilles = Seq(950, 990, 1000))
    }),

    // V31 (round 13): incremental IVF ingest audit — every 5th
    // vec_id plays the arriving batch against an index trained on
    // the rest; per trained cell the audit reads growth and
    // centroid-drift with exact integer alert decisions. The
    // maintenance dial a served ANN index runs per ingest batch.
    "q321_ivf_ingest_audit" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val existing = e.where(col("vec_id") % 5 =!= 0)
      val arriving = e.where(col("vec_id") % 5 === 0)
      val seeds = Similarity.ivfSeeds(existing, "vec_id",
        "embedding", nlist = 4)
      Similarity.ivfIngestAudit(existing, arriving, "vec_id",
        "embedding", seeds, growthAlertPerMille = 300L,
        driftAlertPerMille = 1100L)
    }),

    // V33 (round 14): ACT on the V31 retrain signal and price it —
    // arrivals drift into the BOUNDARY CONE between the first two
    // trained cells (twin id -(id+1) per the r13 range rule; vector
    // s1 + s2 + 0.5·x, so the batch splits ~50/50 across cells 0/1
    // and a one-probe search misses the half in the other cell:
    // recall ~0.7 before). The audit fires on the planted drift;
    // the composed retrain appends ONE cell seeded at the batch
    // (ivfSeeds(arriving, 1) — the grow-the-codebook move V31's
    // growth alert models), and the after-phase reads recall 1.0 at
    // every gate scale: the drifted cone now has its own cell.
    "q328_ivf_retrain" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val seedsBefore = Similarity.ivfSeeds(e, "vec_id", "embedding",
        nlist = 8)
      val s1 = seedsBefore(0)
      val s2 = seedsBefore(1)
      val arriving = e.select(
        (-(col("vec_id") + 1)).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          element_at(typedLit(s1), (i + 1).cast("int")) +
            element_at(typedLit(s2), (i + 1).cast("int")) +
            lit(0.5) * x.cast("double")).as("embedding"))
      val seedsAfter = seedsBefore ++
        Similarity.ivfSeeds(arriving, "vec_id", "embedding", 1)
      Similarity.ivfRetrainReadout(
        e, arriving, "vec_id", "embedding",
        seedsBefore, seedsAfter,
        probes = arriving.where(col("vec_id") >= -6),
        nprobe = 1, k = 5,
        growthAlertPerMille = 300L, driftAlertPerMille = 1100L)
    }),

    // M15 (round 13): audio spectral probe — exact-integer DFT power
    // at 6 declared bins over the first 64 decoded PCM samples of
    // every part's synthetic WAV; a too-short clip and a corrupt
    // payload ride along to pin the triage rows. The oracle replays
    // samples from the WAV formula and the DFT from the shared
    // literal trig table — no decode, no float.
    "q319_audio_spectrum" -> ((s, dir) => {
      import s.implicits._
      val ids = t(s, dir, "part").select(col("p_partkey").as("id"))
      val wavs = Multimodal.withSyntheticWav(
        ids, "id", nSamples = 256, sampleRate = 16000)
      val short = Seq((-2L, Multimodal.syntheticWav(-2L, 32, 16000)))
        .toDF("id", "payload")
      val corrupt = Seq((-1L, "RIFF....not a wav".getBytes("UTF-8")))
        .toDF("id", "payload")
      Multimodal.audioSpectralProbe(
          wavs.unionByName(short).unionByName(corrupt), "id",
          "payload", n = 64, bins = Seq(0, 1, 3, 8, 16, 31))
        .orderBy("id", "bin")
    }),

    // M16 (round 14): windowed spectral sweep — 192-sample two-tone
    // clips (bin-5 cosine for the first 96 samples, bin-11 after;
    // tone values from the SAME dftTable literals the analysis
    // uses), swept at n = 64 / hop = 64 → 3 windows per clip:
    // window 0 is pure tone A, window 2 pure tone B, window 1
    // straddles the switch — the separation the first-n probe
    // (q319's shape) structurally cannot see. maxWindows = 8 is
    // INACTIVE at every gate scale (3 windows; the cap is the
    // long-clip fan-out bound). Short + corrupt clips exercise the
    // triage rows.
    "q329_audio_sweep" -> ((s, dir) => {
      import s.implicits._
      val ids = t(s, dir, "part").select(col("p_partkey").as("id"))
      val wavs = Multimodal.withSyntheticToneWav(
        ids, "id", nSamples = 192, sampleRate = 16000,
        n = 64, binFirst = 5, binSecond = 11)
      val short = Seq((-1L, Multimodal.syntheticWav(-1L, 32, 16000)))
        .toDF("id", "payload")
      val corrupt = Seq((-2L, "RIFF....not a wav".getBytes("UTF-8")))
        .toDF("id", "payload")
      Multimodal.audioSpectralSweep(
          wavs.unionByName(short).unionByName(corrupt), "id",
          "payload", n = 64, hop = 64, bins = Seq(0, 5, 11),
          maxWindows = 8)
        .orderBy("id", "win_idx", "bin")
    }),

    // M19 (round 15): mel-filterbank energies — the q329 two-tone
    // fixture pooled into 6 mel bands (every 2nd part id — the
    // full-spectrum sweep runs 33-bin MACs per window, so the gate
    // halves the clip count and states it): window 0's 1250 Hz tone
    // lands its energy in band 2, window 2's 2750 Hz in band 3 —
    // the log-frequency separation raw bins don't give; short +
    // corrupt clips triage as NULL-energy rows per band.
    "q344_mel_energies" -> ((s, dir) => {
      import s.implicits._
      val ids = t(s, dir, "part")
        .where(col("p_partkey") % 2 === 0)
        .select(col("p_partkey").as("id"))
      val wavs = Multimodal.withSyntheticToneWav(
        ids, "id", nSamples = 192, sampleRate = 16000,
        n = 64, binFirst = 5, binSecond = 11)
      val short = Seq((-1L, Multimodal.syntheticWav(-1L, 32, 16000)))
        .toDF("id", "payload")
      val corrupt = Seq((-2L, "RIFF....not a wav".getBytes("UTF-8")))
        .toDF("id", "payload")
      Multimodal.melEnergies(
          wavs.unionByName(short).unionByName(corrupt), "id",
          "payload", n = 64, hop = 64, nMels = 6,
          sampleRate = 16000, maxWindows = 8)
        .orderBy("id", "win_idx", "mel")
    }),

    // M17 (round 14): video-shaped scene-change detection — every
    // 10th part id carries a 6-frame fixed-frame-size "video" (each
    // frame a self-contained 16×16 BMP, 822 bytes) with a planted
    // cut at frame 3; frames() slices, each complete frame decodes
    // once into the M14 pHash, and consecutive-frame hamming marks
    // the boundary. A partial-tail clip (id -2, seeds decoupled from
    // the row id so the oracle's modular arithmetic stays
    // non-negative) pins the incomplete-frame drop; a corrupt clip
    // (id -1) pins decode triage.
    "q335_video_scenes" -> ((s, dir) => {
      import s.implicits._
      val ids = t(s, dir, "part")
        .where(col("p_partkey") % 10 === 0)
        .select(col("p_partkey").as("id"))
      val vids = Multimodal.withSyntheticVideo(
        ids, "id", nFrames = 6, w = 16, h = 16, switchAt = 3)
      val partial = Seq((-2L,
        Multimodal.syntheticVideo(5L, 2, 16, 16, 1) ++
          Array.fill[Byte](100)(9)))
        .toDF("id", "payload")
      val corrupt = Seq((-1L, Array.fill[Byte](822 * 2)(3)))
        .toDF("id", "payload")
      Multimodal.videoSceneChanges(
          vids.unionByName(partial).unionByName(corrupt),
          "id", "payload", frameBytes = 822, grid = 16,
          threshold = 10)
        .orderBy("id", "frame_idx")
    }),

    // M18 (round 15): animated-GIF multi-frame scene detection — the
    // REAL variable-frame container closing q335's stand-in caveat:
    // frame boundaries come from the JDK GIF codec's frame directory
    // (getNumImages(true) + per-frame LZW read), not byte slicing;
    // planted cut at frame 3, same pHash/lag-window finish. Corrupt
    // bytes (id -1, no reader) and a truncated container (id -2, a
    // real GIF cut mid-color-table — directory reads empty) pin the
    // single-triage-row path; a one-frame GIF (id -3) pins the
    // no-hamming path.
    "q337_gif_scenes" -> ((s, dir) => {
      import s.implicits._
      val ids = t(s, dir, "part")
        .where(col("p_partkey") % 10 === 0)
        .select(col("p_partkey").as("id"))
      val gifs = Multimodal.withSyntheticGif(
        ids, "id", nFrames = 6, w = 16, h = 16, switchAt = 3)
      val corrupt = Seq((-1L, Array.fill[Byte](120)(7)))
        .toDF("id", "payload")
      val trunc = Seq((-2L,
        Multimodal.syntheticGif(5L, 2, 16, 16, 1).take(20)))
        .toDF("id", "payload")
      val single = Seq((-3L, Multimodal.syntheticGif(9L, 1, 16, 16, 0)))
        .toDF("id", "payload")
      Multimodal.gifSceneChanges(
          gifs.unionByName(corrupt).unionByName(trunc)
            .unionByName(single),
          "id", "payload", grid = 16, threshold = 10)
        .orderBy("id", "frame_idx")
    }),

    // Q18 (round 15): USER-LEVEL ε-DP count release — per-user
    // contribution capped at 8 by deterministic id-hash order (the
    // cap genuinely bites: users carry tens of events), counts over
    // the public event-type domain, noise at ε/cap (Δ = cap under
    // user adjacency), K = 200 per the 20·Δ/ε rule. The same release
    // WITHOUT a declared cap is refused (no finite user-level
    // sensitivity exists) — the refusal is probed and emitted as the
    // uncapped_refused column.
    "q338_dp_user_level" -> ((s, dir) => {
      import s.implicits._
      val Q = graft.operators.Quality
      val ev = t(s, dir, "events")
      val dom = Seq("click", "error", "purchase", "signup", "view")
        .toDF("event_type")
      val refused =
        try {
          Q.dpUserCountReleaseOverDomain(ev, "user_id", "event_id",
            dom, Seq("event_type"), epsilon = 0.8, seed = 81L,
            userCap = None, clampK = 200)
          false
        } catch { case _: IllegalStateException => true }
      Q.dpUserCountReleaseOverDomain(ev, "user_id", "event_id",
          dom, Seq("event_type"), epsilon = 0.8, seed = 81L,
          userCap = Some(8), clampK = 200)
        .withColumn("uncapped_refused", lit(refused))
        .orderBy("event_type")
    }),

    // Q19 (round 15): ρ-zCDP ledger — 36 weekly refreshes of the
    // 5-language count release at ε = 0.1 under rotating seeds (the
    // documented re-release shape: determinism is per (data, seed),
    // so each refresh spends budget). Basic Σε = 3.6ε REFUSES the
    // 3.45ε budget (probed, emitted as basic_refused); zCDP charges
    // Σρ = 36·ε²/2 = 0.18 → ε(δ=1e-6) ≈ 3.33ε and PASSES — the √k
    // composition advantage, every ledger cell exact-integer and
    // oracle-pinned.
    "q339_dp_zcdp_ledger" -> ((s, dir) => {
      import s.implicits._
      val Q = graft.operators.Quality
      val docs = t(s, dir, "documents")
      val dom = Seq("de", "en", "es", "fr", "zh").toDF("lang")
      val releases = (1 to 36).map { i =>
        Q.DpDeclaredRelease(f"refresh_$i%02d", 100000L,
          () => Q.dpCountReleaseOverDomain(docs, dom, Seq("lang"),
            epsilon = 0.1, seed = 100L + i, clampK = 200),
          Some("released_count"))
      }
      val basicRefused =
        try {
          Q.dpReleaseSuite(releases, budgetMicro = 3450000L)
          false
        } catch { case _: IllegalStateException => true }
      // r17 (VERDICT ask #2): the 36 refreshes become ROWS of ONE
      // combined plan — one corpus groupBy + one noise join instead
      // of a 36-branch audit union (identical per-release outputs;
      // QualitySpec).
      val combined = Q.dpCountReleaseFamilyOverDomain(docs, "lang",
        (1 to 36).map(i => (f"refresh_$i%02d",
          Seq("de", "en", "es", "fr", "zh"), 100L + i)),
        epsilon = 0.1, clampK = 200)
      Q.dpReleaseSuiteZcdpBatched(releases, budgetMicro = 3450000L,
          deltaPow10 = 6, combined)
        .withColumn("basic_refused", lit(basicRefused))
        .orderBy("seq")
    }),

    // T64 (round 15): repeated-run collapse — act on q43's
    // repetition signal the way T61 acts on T59's: consecutive
    // duplicate token runs collapse to their first occurrence
    // (scraping stutter), non-consecutive repetition deliberately
    // untouched; repaired text pinned by md5 + length.
    "q343_collapse_runs" -> ((s, dir) => {
      TextAnalysis.collapseTokenRuns(
          t(s, dir, "documents"), "doc_id", "text", maxRun = 1)
        .orderBy("doc_id")
    }),

    // T63 (round 15): batch-perceptron quality classifier — the
    // model-based filtering stage (GPT-3 LR filter / CCNet fastText
    // shape) distilling a declared stopword-fluency heuristic into a
    // linear model over hashed token buckets; every weight, margin,
    // and update is an exact integer, so the 4-epoch trajectory
    // replays bit-identically as unrolled oracle CTEs. Trace rows:
    // errors entering each epoch + the weight-state checksums after
    // its batch update.
    "q341_quality_perceptron" -> ((s, dir) => {
      val QC = graft.operators.QualityClassifier
      val sw = graft.operators.TextAnalysis.langProfiles.toMap
        .apply("en")
      val m = QC.train(t(s, dir, "documents"), "doc_id", "text",
        buckets = 256, epochs = 4, stopwords = sw, minHits = 2)
      QC.traceTable(s, m).orderBy("epoch")
    }),

    // T63 companion: the distillation-fidelity readout — confusion
    // cells of heuristic label vs the trained model's margin sign
    // (margin 0 predicts -1, the training tie rule), with exact
    // integer margin sums per cell.
    "q342_perceptron_confusion" -> ((s, dir) => {
      val QC = graft.operators.QualityClassifier
      val docs = t(s, dir, "documents")
      val sw = graft.operators.TextAnalysis.langProfiles.toMap
        .apply("en")
      val m = QC.train(docs, "doc_id", "text",
        buckets = 256, epochs = 4, stopwords = sw, minHits = 2)
      QC.confusion(docs, "doc_id", "text", m, stopwords = sw,
        minHits = 2)
    }),

    // Q20 (round 15): subsampling amplification — four count
    // releases, each run at full ε = 1.0 on its OWN deterministic 5%
    // subsample (rotated sample + mechanism seeds), declared to the
    // ledger at the amplified ln(1 + 0.05·(e − 1)) ≈ 0.0824ε each:
    // Σ ≈ 0.33ε fits the 0.5ε budget that the UNAMPLIFIED Σ = 4ε
    // declaration refuses (probed, emitted as unamplified_refused).
    "q347_dp_amplified_ledger" -> ((s, dir) => {
      val Q = graft.operators.Quality
      import s.implicits._
      val docs = t(s, dir, "documents")
      val dom = Seq("de", "en", "es", "fr", "zh").toDF("lang")
      val epsMicro = 1000000L
      val ampl = Q.amplifiedEpsilonMicro(epsMicro, ratePerMille = 50)
      val rel = (1 to 4).map { i =>
        Q.DpDeclaredRelease(f"sub_$i%02d", ampl,
          () => Q.dpSubsampledCountReleaseOverDomain(docs, "doc_id",
            dom, Seq("lang"), epsilon = 1.0,
            mechanismSeed = 400L + i, sampleSeed = 500L + i,
            ratePerMille = 50, clampK = 39),
          Some("released_count"))
      }
      val unamplRefused =
        try {
          Q.dpReleaseSuite(rel.map(_.copy(epsilonMicro = epsMicro)),
            budgetMicro = 500000L)
          false
        } catch { case _: IllegalStateException => true }
      Q.dpReleaseSuite(rel, budgetMicro = 500000L)
        .withColumn("unamplified_refused", lit(unamplRefused))
        .orderBy("seq")
    }),

    // Q21 (round 16): ρ-zCDP ledger WITH parallel composition — the
    // partitioned weekly datasheet neither parent prices right: TWO
    // language shards, each refreshed 36 times at ε = 0.1 (q339's
    // cadence, now per shard; rotating seeds, interleaved
    // declaration order so the charged-Δρ column alternates ρ, 0 —
    // the zeros ARE the parallel discount). ρ_eff = max(Σρ per
    // shard) = 36·ε²/2 → ε(δ=1e-6) ≈ 3.33ε PASSES the 3.45ε budget
    // that zCDP-sequential over all 72 (≈ 4.82ε), basic sequential
    // (7.2ε), and even basic-WITH-the-parallel-discount (max-shard
    // Σε = 3.6ε) refuse; Q17's basic-parallel ledger refuses the
    // CLAIM itself (a refreshed shard is not a partition). Each
    // refusal probed data-free and emitted.
    "q348_dp_zcdp_parallel" -> ((s, dir) => {
      import s.implicits._
      val Q = graft.operators.Quality
      val docs = t(s, dir, "documents")
      def langDom(ks: String*) = ks.toDF("lang")
      val shards = Seq(("de_en", Seq("de", "en"), 610L),
        ("es_fr_zh", Seq("es", "fr", "zh"), 710L))
      def shard(tag: String, langs: Seq[String], seedBase: Long,
          i: Int) =
        Q.DpDeclaredRelease(f"${tag}_w$i%02d", 100000L,
          () => Q.dpCountReleaseOverDomain(docs,
            langs.toDF("lang"), Seq("lang"),
            epsilon = 0.1, seed = seedBase + i, clampK = 200),
          Some("released_count"), Some(s"shard_$tag"),
          Some(() => langDom(langs: _*)), Some("lang"))
      val releases = (1 to 36).flatMap { i =>
        shards.map { case (tag, langs, base) =>
          shard(tag, langs, base, i) }
      }
      val budget = 3450000L
      def refused(run: => DataFrame): Boolean =
        try { run; false }
        catch { case _: IllegalStateException => true }
      val stripped = releases.map(_.copy(parallelGroup = None,
        domain = None, keyCol = None))
      val basicSeq = refused(Q.dpReleaseSuite(stripped, budget))
      // Q17's basic-parallel ledger cannot legally grant the
      // discount here at ALL: a shard refreshed twice claims the
      // same keys twice within its group, so the CLAIM refuses
      // (disjointness verified, never trusted).
      val basicPar = refused(
        Q.dpReleaseSuitePartitioned(releases, budget))
      val zcdpSeq = refused(
        Q.dpReleaseSuiteZcdp(stripped, budget, deltaPow10 = 6))
      // r17 (VERDICT ask #1): the 72 releases become ROWS of ONE
      // combined plan — one corpus groupBy + one noise join for the
      // whole family (identical per-release outputs; QualitySpec) —
      // and the suite audits read that frame instead of a
      // 144-aggregate-subtree union.
      val combined = Q.dpCountReleaseFamilyOverDomain(docs, "lang",
        (1 to 36).flatMap { i =>
          shards.map { case (tag, langs, base) =>
            (f"${tag}_w$i%02d", langs, base + i) } },
        epsilon = 0.1, clampK = 200)
      Q.dpReleaseSuiteZcdpPartitionedBatched(releases, budget,
          deltaPow10 = 6, combined)
        .withColumn("basic_seq_refused", lit(basicSeq))
        .withColumn("basic_parallel_refused", lit(basicPar))
        .withColumn("zcdp_seq_refused", lit(zcdpSeq))
        .orderBy("seq")
    }),

    // Q22 (round 16): USER-LEVEL ε-DP SUM release — per-user
    // contribution capped at 4 rows by deterministic id-hash order
    // AND each row's value clamped into [0, 4], so Δ = cap·clampHi
    // = 16 under user adjacency; sums over the public event-type
    // domain, noise at ε/16, K = 400 per the 20·Δ/ε rule. The same
    // release WITHOUT a declared cap refuses data-free (probed,
    // emitted as uncapped_refused).
    "q349_dp_user_sum" -> ((s, dir) => {
      import s.implicits._
      val Q = graft.operators.Quality
      val ev = t(s, dir, "events")
      val dom = Seq("click", "error", "purchase", "signup", "view")
        .toDF("event_type")
      val refused =
        try {
          Q.dpUserSumReleaseOverDomain(ev, "user_id", "event_id",
            dom, Seq("event_type"), col("value"), epsilon = 0.8,
            seed = 91L, userCap = None, clampHi = 4L, clampK = 400)
          false
        } catch { case _: IllegalStateException => true }
      Q.dpUserSumReleaseOverDomain(ev, "user_id", "event_id",
          dom, Seq("event_type"), col("value"), epsilon = 0.8,
          seed = 91L, userCap = Some(4), clampHi = 4L, clampK = 400)
        .withColumn("uncapped_refused", lit(refused))
        .orderBy("event_type")
    }),

    // M20 (round 16): MFCC — the log + DCT-II cepstral stage over
    // q344's mel energies (every 4th part id — the cepstral joins
    // ride on the same full-spectrum sweep, so the gate quarters
    // the clip count and states it): band energies quantize to
    // (digit count, 3-digit mantissa) and read exact milli-log10
    // from the 900-row driver-literal table, then 4 DCT-II
    // coefficients as exact long MACs against the fixed-point
    // cosine table; triage clips carry NULL coefficients.
    "q350_audio_mfcc" -> ((s, dir) => {
      import s.implicits._
      val ids = t(s, dir, "part")
        .where(col("p_partkey") % 4 === 0)
        .select(col("p_partkey").as("id"))
      val wavs = Multimodal.withSyntheticToneWav(
        ids, "id", nSamples = 192, sampleRate = 16000,
        n = 64, binFirst = 5, binSecond = 11)
      val short = Seq((-1L, Multimodal.syntheticWav(-1L, 32, 16000)))
        .toDF("id", "payload")
      val corrupt = Seq((-2L, "RIFF....not a wav".getBytes("UTF-8")))
        .toDF("id", "payload")
      Multimodal.mfcc(
          wavs.unionByName(short).unionByName(corrupt), "id",
          "payload", n = 64, hop = 64, nMels = 6,
          sampleRate = 16000, maxWindows = 8, nCoefs = 4)
        .orderBy("id", "win_idx", "coef")
    }),

    // V36 (round 16): rerank candidate-budget sweep — recall@5 vs
    // the candidate budget C ∈ {5, 10, 25, 50} at fixed routing
    // (nlist 8, nprobe 2, probes 8..16), every point against ONE
    // exact ground-truth pass, with stage2_pairs pricing the exact
    // re-scores each budget actually bought (the V32 sweep pattern
    // applied to V35's rerank stage; stage 1 ranks once at max C).
    "q351_rerank_budget_sweep" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val seeds = Similarity.ivfSeeds(e, "vec_id", "embedding",
        nlist = 8)
      Similarity.rerankCandidateSweep(
        e, e.where(col("vec_id") >= 8 && col("vec_id") < 16),
        "vec_id", "embedding", seeds, nprobe = 2,
        candidateBudgets = Seq(5, 10, 25, 50), k = 5)
    }),

    // M18b (round 16): DELTA-encoded GIF scene detection — the
    // disposal-compositing gate: five frames (full base, a patch
    // disposed restore-to-BACKGROUND, a kept patch, a patch
    // disposed restore-to-PREVIOUS, a final kept patch) whose
    // composited pixels the oracle replays arithmetically from the
    // frame plan's rect state machine — a STORED read would hash
    // raw patch rasters and every row would differ. Corrupt bytes
    // (id -1) and a real BMP payload (id -4, ImageIO-readable but
    // NOT a GIF — the r15 ADVICE magic gate) pin the triage path.
    "q352_gif_delta_scenes" -> ((s, dir) => {
      import s.implicits._
      val ids = t(s, dir, "part")
        .where(col("p_partkey") % 10 === 0)
        .select(col("p_partkey").as("id"))
      val gifs = Multimodal.withSyntheticGifDelta(ids, "id",
        w = 16, h = 16)
      val corrupt = Seq((-1L, Array.fill[Byte](120)(7)))
        .toDF("id", "payload")
      val bmp = Seq((-4L, Multimodal.syntheticBmpTextured(3L, 16, 16)))
        .toDF("id", "payload")
      Multimodal.gifSceneChanges(
          gifs.unionByName(corrupt).unionByName(bmp),
          "id", "payload", grid = 16, threshold = 10)
        .orderBy("id", "frame_idx")
    }),

    // T65 (round 16): α-weighted posterior n-best sampling — the
    // sampling Kudo 2018's best results use, closing the q340
    // variant's documented α→0 caveat: candidate i draws with
    // weight ∝ exp(−α·Δscore) read from the driver-literal weight
    // table over the quantized Δ grid (α = 0.5, 0.02-nat grid),
    // picked by the q301 exact cumulative-weight comparison;
    // n_words_shifted reads the augmentation's actual diversity.
    "q353_alpha_nbest_encode" -> ((s, dir) => {
      val U = graft.operators.UnigramLm
      val docs = t(s, dir, "documents")
        .where(col("text").isNotNull)
        .select(col("doc_id"), lower(col("text")).as("text"))
      val model = U.Model(
        t62Pieces.map { case (p, c, lp) => U.Piece(p, c, lp) }, Nil)
      U.encodeNbestAlpha(docs, "doc_id", "text", model, nBest = 4,
          seed = 353L, alphaMilli = 500L, gridMicro = 20000L,
          maxWordLen = 12)
        .orderBy("doc_id")
    }),

    // T62 (round 15): n-best subword-regularization encoding — the
    // Kudo-2018 augmentation over a DECLARED literal piece table
    // (the q269 pattern; trained-model encoding is q333): per word
    // the exact-long score-ranked 4 best segmentations, one drawn by
    // the md5-uniform of (word, seed); n_tokens_best is the Viterbi
    // floor (UnigramLmSpec pins nBest = 1 ≡ q333's encoder
    // bit-identically).
    "q340_nbest_encode" -> ((s, dir) => {
      val U = graft.operators.UnigramLm
      val docs = t(s, dir, "documents")
        .where(col("text").isNotNull)
        .select(col("doc_id"), lower(col("text")).as("text"))
      val model = U.Model(
        t62Pieces.map { case (p, c, lp) => U.Piece(p, c, lp) }, Nil)
      U.encodeNbest(docs, "doc_id", "text", model, nBest = 4,
          seed = 340L, maxWordLen = 12)
        .orderBy("doc_id")
    }),

    // Q15 capstone (round 13): the FIVE-mechanism release suite —
    // counts + sums + histogram + quantiles + top-k over one dataset
    // under ONE 2.0ε budget (spend 1.7ε), every mechanism family the
    // engine ships composed through the ledger. clampK scales with
    // Δ/ε per the Q12 rule (sums: 20·8/0.25 = 640).
    "q326_dp_release_suite_full" -> ((s, dir) => {
      import s.implicits._
      val Q = graft.operators.Quality
      val domain = Seq("de", "en", "es", "fr", "zh", "xx", "yy")
        .toDF("lang")
      val docs = t(s, dir, "documents")
      val ev = t(s, dir, "events")
      Q.dpReleaseSuite(Seq(
        Q.DpDeclaredRelease("lang_counts", 300000L,
          () => Q.dpCountReleaseOverDomain(docs, domain, Seq("lang"),
            epsilon = 0.3, seed = 61L, clampK = 134),
          Some("released_count")),
        Q.DpDeclaredRelease("value_sums", 250000L,
          () => Q.dpSumRelease(ev, Seq("event_type"), col("value"),
            epsilon = 0.25, seed = 62L, clampHi = 8L, clampK = 640),
          Some("released_sum")),
        Q.DpDeclaredRelease("value_hist", 300000L,
          () => Q.dpHistogramRelease(ev, col("value"),
            edges = (0L to 500L by 50L), epsilon = 0.3, seed = 63L,
            clampK = 134),
          Some("released_count")),
        Q.DpDeclaredRelease("value_median", 400000L,
          () => Q.dpQuantileRelease(ev, Seq("event_type"),
            col("value"), grid = (0L to 512L by 16L), qNum = 1,
            qDen = 2, epsilon = 0.4, seed = 64L),
          Some("released_q")),
        Q.DpDeclaredRelease("top_langs", 450000L,
          () => Q.dpTopKRelease(docs, col("lang"), domain, "lang",
            k = 3, epsilon = 0.45, seed = 65L))),
        budgetMicro = 2000000L)
    }),

    // Q17 (round 14): parallel-composition ledger — three 0.8-ε
    // per-language-shard count releases over DISJOINT lang domains
    // (verified, not trusted) charge max(ε) = 0.8ε as a group
    // (charged_micro 800000/0/0 — the zeros ARE parallel composition
    // working), plus two ungrouped releases at 0.5ε + 0.6ε: total
    // 1.9ε fits the 2.0ε budget that SEQUENTIAL accounting (3.5ε)
    // refuses — QualitySpec pins that refusal golden on the same
    // five releases. clampK per the Q12 rule (counts: 40/ε; sums:
    // 20·Δ/ε).
    "q331_dp_parallel_ledger" -> ((s, dir) => {
      import s.implicits._
      val Q = graft.operators.Quality
      val docs = t(s, dir, "documents")
      val ev = t(s, dir, "events")
      def langDom(ks: String*) = ks.toDF("lang")
      Q.dpReleaseSuitePartitioned(Seq(
        Q.DpDeclaredRelease("counts_de_en", 800000L,
          () => Q.dpCountReleaseOverDomain(docs, langDom("de", "en"),
            Seq("lang"), epsilon = 0.8, seed = 71L, clampK = 50),
          Some("released_count"), Some("lang_shards"),
          Some(() => langDom("de", "en")), Some("lang")),
        Q.DpDeclaredRelease("counts_es_fr", 800000L,
          () => Q.dpCountReleaseOverDomain(docs, langDom("es", "fr"),
            Seq("lang"), epsilon = 0.8, seed = 72L, clampK = 50),
          Some("released_count"), Some("lang_shards"),
          Some(() => langDom("es", "fr")), Some("lang")),
        Q.DpDeclaredRelease("counts_zh_xx_yy", 800000L,
          () => Q.dpCountReleaseOverDomain(docs,
            langDom("zh", "xx", "yy"), Seq("lang"),
            epsilon = 0.8, seed = 73L, clampK = 50),
          Some("released_count"), Some("lang_shards"),
          Some(() => langDom("zh", "xx", "yy")), Some("lang")),
        Q.DpDeclaredRelease("value_sums", 500000L,
          () => Q.dpSumRelease(ev, Seq("event_type"), col("value"),
            epsilon = 0.5, seed = 74L, clampHi = 8L, clampK = 320),
          Some("released_sum")),
        Q.DpDeclaredRelease("value_hist", 600000L,
          () => Q.dpHistogramRelease(ev, col("value"),
            edges = (0L to 500L by 50L), epsilon = 0.6, seed = 75L,
            clampK = 67),
          Some("released_count"))),
        budgetMicro = 2000000L)
    }),

    // T59 (round 13): encoding-quality scan — mojibake/control/
    // replacement-char triage over documents with deterministic
    // corruption injected (every 25th doc gains a Latin-1 mojibake
    // digraph + a control char, every 50th additionally a U+FFFD),
    // so all three signals and the clean flag are live at every
    // scale. Both engines replay the injection.
    "q325_encoding_quality" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .where(col("text").isNotNull)
        .withColumn("text",
          when(col("doc_id") % 50 === 0,
            concat(col("text"), lit("Ã©"), lit(""),
              lit("�")))
            .when(col("doc_id") % 25 === 0,
              concat(col("text"), lit("Ã©"), lit("")))
            .otherwise(col("text")))
      TextAnalysis.encodingQuality(d, "doc_id", "text")
        .orderBy("doc_id")
    }),

    // Q16 (round 13): ε-DP top-k release — the peeling exponential
    // mechanism selects the 3 most frequent document languages from
    // the public 7-key domain, k draws without replacement at ε/k
    // each; identities only, no counts. Weight table + per-round
    // draws are driver literals both engines share.
    "q323_dp_topk_release" -> ((s, dir) => {
      import s.implicits._
      val domain = Seq("de", "en", "es", "fr", "zh", "xx", "yy")
        .toDF("lang")
      graft.operators.Quality.dpTopKRelease(
        t(s, dir, "documents"), col("lang"), domain, "lang",
        k = 3, epsilon = 1.2, seed = 50L, clampUtil = 400)
    }),

    // M14 (round 13): pHash robustness gate — every 10th part id
    // gets a brightness-RAMPED twin (the vignette-style luminance
    // edit); per pair the gate emits BOTH hammings: aHash (global-
    // mean bits — the ramp moves blocks relative to the mean, many
    // bits flip) and pHash (DCT-sign bits — the smooth ramp lands in
    // a few low-order coefficients, the rest stand). The oracle
    // replays BOTH pipelines from the pixel formula + the literal
    // fixed-point cosine table; MultimodalSpec pins the contrast.
    "q317_phash_ramp_pairs" -> ((s, dir) => {
      val ids = t(s, dir, "part").select(col("p_partkey").as("id"))
      val imgs = Multimodal.withSyntheticBmpRampPairs(ids, "id",
        w = 16, h = 16, everyK = 10L, rampMax = 40)
      // ONE decode pass serves both hash families (r13 fused op);
      // the hash frame barriers because both pair stages consume it
      val hp = Multimodal.imagePerceptualHashes(imgs, "id",
        "payload", grid = 16).barriered
      def pairs(df: DataFrame, hc: String, out: String) = {
        val b = df.where(col("id") >= 0L)
          .select(col("id"), col(hc).as("__ha"))
        val tw = df.where(col("id") < 0L)
          .select((-col("id") - 1L).as("id"), col(hc).as("__hb"))
        b.join(tw, "id").select(col("id"),
          aggregate(
            zip_with(split(col("__ha"), ""), split(col("__hb"), ""),
              (x, y) => when(x =!= y, 1).otherwise(0)),
            lit(0), _ + _).as(out))
      }
      pairs(hp, "ahash", "ahash_hamming")
        .join(pairs(hp, "phash", "phash_hamming"), "id")
        .orderBy("id")
    }),

    // Q15 (round 13): ε-budget composition ledger — the release
    // SUITE accounting layer over Q10b/Q14/Q12: three releases
    // (domain counts ε=0.4, histogram ε=0.5, bounded sums ε=0.3)
    // declared against a 1.5ε budget, sequential composition spends
    // 1.2ε. Exact integer micro-ε arithmetic; each ledger row also
    // audits its mechanism's released row count and total, so the
    // oracle replays the full composed suite, not just the literals.
    "q316_dp_budget_ledger" -> ((s, dir) => {
      import s.implicits._
      val Q = graft.operators.Quality
      val domain = Seq("de", "en", "es", "fr", "zh", "xx", "yy")
        .toDF("lang")
      val docs = t(s, dir, "documents")
      val ev = t(s, dir, "events")
      Q.dpReleaseSuite(Seq(
        Q.DpDeclaredRelease("lang_counts", 400000L,
          () => Q.dpCountReleaseOverDomain(docs, domain, Seq("lang"),
            epsilon = 0.4, seed = 47L, clampK = 39),
          Some("released_count")),
        Q.DpDeclaredRelease("value_hist", 500000L,
          () => Q.dpHistogramRelease(ev, col("value"),
            edges = (0L to 500L by 50L), epsilon = 0.5, seed = 48L,
            clampK = 39),
          Some("released_count")),
        Q.DpDeclaredRelease("type_sums", 300000L,
          () => Q.dpSumRelease(ev, Seq("event_type"), col("value"),
            epsilon = 0.3, seed = 49L, clampHi = 8L, clampK = 534),
          Some("released_sum"))),
        budgetMicro = 1500000L)
    }),

    // D24 (round 12): blocking-quality audit — the q16 LSH blocker
    // evaluated against exact-duplicate ground truth on the
    // dup-injected corpus: reduction ratio (how much of the n(n-1)/2
    // space LSH pruned), pairs completeness (which injected dups the
    // bands caught), pairs quality (verify work per true match).
    "q303_blocking_audit" -> ((s, dir) => {
      val docs = docsWithDups(s, dir)
      val cand = Dedup.minhashCandidates(docs, "doc_id", "text",
        numHashes = 8, rowsPerBand = 2, shingleSize = 3)
      val h = docs.select(col("doc_id"), md5(col("text")).as("h"))
      val truth = h.as("x")
        .join(h.as("y"), col("x.h") === col("y.h") &&
          col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("ta"), col("y.doc_id").as("tb"))
      graft.operators.Fuzzy.blockingAudit(docs, "doc_id",
        cand, "doc_a", "doc_b", truth, "ta", "tb")
    }),

    // T56 (round 10): curation funnel — per-source doc/token mass
    // through length -> language -> lexical-diversity stages; one
    // scan, one source aggregate.
    "q280_curation_funnel" -> ((s, dir) => {
      TextAnalysis.curationFunnel(
          t(s, dir, "documents"), "source", "text",
          minChars = 100, langs = Seq("en", "es", "fr", "de"),
          minTtr = 0.4)
        .orderBy("source")
    }),

    // E38 (round 10): sequential SRM monitor — a deliberately
    // misdesigned split (arm = user%3 vs designed 0.35) whose
    // cumulative z crosses the alarm line mid-month at sf0.01:
    // pre-alarm looks, the first_alarm day, and the post-alarm tail
    // are all exercised.
    "q278_srm_monitor" -> ((s, dir) => {
      graft.operators.Quality.srmMonitor(
          t(s, dir, "events"), to_date(col("ts")),
          col("user_id") % 3 === 0, expectedShare = 0.35)
        .orderBy("day")
    }),

    // D21 (round 10): threshold-calibration curve — cheap bigram
    // jaccard as the estimator vs trigram-jaccard >= 0.6 truth over
    // the same sorted-neighborhood candidates; the knee of this
    // curve is the production dedup dial.
    "q279_threshold_curve" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val est = Fuzzy.sortedNeighborhood(docs, "doc_id", "text",
          substring(col("text"), 1, 40), windowSize = 10,
          threshold = 0.05, shingleSize = 2)
        .withColumnRenamed("jaccard", "est")
      val truth = Fuzzy.sortedNeighborhood(docs, "doc_id", "text",
          substring(col("text"), 1, 40), windowSize = 10,
          threshold = 0.05, shingleSize = 3)
        .select(col("doc_a"), col("doc_b"), col("jaccard").as("__j3"))
      val pairs = est.join(truth, Seq("doc_a", "doc_b"), "left")
        .select(col("est"),
          (coalesce(col("__j3"), lit(0.0)) >= 0.6).as("truth"))
      Dedup.thresholdCurve(pairs, col("est"), col("truth"),
          Seq(0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8))
        .orderBy("threshold")
    }),

    // Q9 (round 10): generalization ladder — the q266 audit made
    // actionable: every prefix level of the QI set in ONE rollup
    // pass; the first satisfied level is the cheapest compliant
    // release.
    "q277_generalization_ladder" -> ((s, dir) => {
      graft.operators.Quality.generalizationLadder(
          t(s, dir, "customer")
            .withColumn("acct_band",
              floor(col("c_acctbal") / lit(1000.0d)))
            .withColumn("cohort",
              expr("substring(c_name, length(c_name), 1)")),
          Seq("c_nationkey", "c_mktsegment", "acct_band"), "cohort",
          k = 5L, l = 2L)
        .orderBy("level")
    }),

    // E29 (round 9): difference-in-differences — the rollout readout
    // when assignment wasn't randomized: post-vs-pre (month half)
    // change in arm A minus the same change in arm B, per
    // event_type; exact decimal cell moments, clamped variances.
    "q246_diff_in_diff" -> ((s, dir) => {
      graft.operators.Quality.diffInDiff(
          t(s, dir, "events"), Seq("event_type"),
          col("user_id") % 2 === 0, dayofmonth(col("ts")) >= 16,
          col("value"))
        .orderBy("event_type")
    }),

    // E30 (round 9): empirical-Bayes shrinkage of per-user purchase
    // rates toward the moment-matched beta prior — the "rank by
    // rate" readout that 1/1 flukes can't dominate.
    "q247_eb_shrinkage" -> ((s, dir) => {
      graft.operators.Quality.ebShrinkRates(
          t(s, dir, "events"), Seq("user_id"),
          col("event_type") === "purchase")
        .orderBy("user_id")
    }),

    // T52 (round 9): Hill tail-index per source over doc lengths —
    // the robust upper-tail fatness diagnostic (alpha <= 2 = infinite
    // variance: mean-based dials are fiction); top-(k+1) order stats
    // via WindowGroupLimit, decimal-staged ln ratios.
    "q249_hill_tail" -> ((s, dir) => {
      graft.operators.TextAnalysis.hillTailIndex(
          t(s, dir, "documents"), "source", "n_chars", k = 64)
        .orderBy("source")
    }),

    // E31 (round 9): Mantel-Haenszel pooled odds ratio across
    // (event_type, day-bucket) strata — the confounder-adjusted
    // effect when per-segment tests disagree with the pooled one.
    "q250_mantel_haenszel" -> ((s, dir) => {
      graft.operators.Quality.mantelHaenszel(
          t(s, dir, "events")
            .select(col("event_type"),
              (dayofmonth(col("ts")) % 7).as("day_bucket"),
              (col("user_id") % 2 === 0).as("a"),
              (col("value") >= 0.5).as("conv")),
          Seq("event_type", "day_bucket"), col("a"), col("conv"))
    }),

    // T53 (round 9): RAKE keyphrases — stopword-delimited candidate
    // phrases scored by summed word degree/frequency; the model-free
    // "what is this corpus about" readout.
    "q253_rake_keyphrases" -> ((s, dir) => {
      Relevance.rakeKeyphrases(
        t(s, dir, "documents"), "doc_id", "text",
        stopwords = Seq("the", "a", "of", "and", "is", "to"), k = 50)
    }),

    // D20 (round 9): split-coherence repair — every near-dup cluster
    // reassigned wholesale to its representative's split, so no
    // cluster straddles the train/val boundary afterwards; `moved`
    // is the release-gate audit trail. q48 clusters x q41 split.
    "q254_split_repair" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = Dedup.minhashCandidates(
          docs, "doc_id", "text",
          numHashes = 8, rowsPerBand = 2, shingleSize = 3)
        .where(col("n_match") >= 7)
      val assignments = docs.select(
        col("doc_id"),
        when(substring(md5(col("doc_id").cast("string")), 1, 1) < "c",
          "train").otherwise("val").as("split"))
      Dedup.splitCoherentRepair(
          assignments, "doc_id", "split", Dedup.nearDupClusters(pairs))
        .orderBy("doc_id")
    }),

    // E35 (round 9): group-sequential monitor — daily looks over the
    // value>=0.5 conversion with the OBF-shaped boundary c*sqrt(K/k);
    // the peeking-safe "can we stop yet?" readout.
    "q259_sequential_monitor" -> ((s, dir) => {
      graft.operators.Quality.sequentialMonitor(
          t(s, dir, "events"), date_trunc("day", col("ts")),
          col("user_id") % 2 === 0, col("value") >= 0.5,
          cFinal = 2.04)
        .orderBy("look")
    }),

    // E34 (round 9): meta-analytic pooling of q246's per-segment DiD
    // effects — inverse-variance pooled effect + Cochran Q / I²
    // heterogeneity; the composition gate for experiment-readout
    // pipelines (diffInDiff -> metaPool).
    "q258_meta_pool" -> ((s, dir) => {
      val effects = graft.operators.Quality.diffInDiff(
        t(s, dir, "events"), Seq("event_type"),
        col("user_id") % 2 === 0, dayofmonth(col("ts")) >= 16,
        col("value"))
      graft.operators.Quality.metaPool(
        effects, col("did"), col("se"))
    }),

    // M11 (round 9): magic-byte format sniff vs declared metadata —
    // payloads get REAL container magics (rotated off the declared
    // format for doc_id%7 == 0, the injected mislabels), and the
    // byte-level sniffer must recover exactly the construction: the
    // gate proves binary concat + hex sniff invert each other.
    "q257_format_sniff" -> ((s, dir) => {
      val m = Multimodal.synthesize(t(s, dir, "documents"),
        "doc_id", "text")
      val idx = col("doc_id") % 3
      val headerIdx = when(col("doc_id") % 7 === 0, (idx + 1) % 3)
        .otherwise(idx)
      val magics = array(
        lit("89504E47"),                 // png
        lit("FFD8FFE0"),                 // jpeg (JFIF)
        lit("52494646000000005745425056503820")) // webp: RIFF+size+WEBP+VP8
      val withHeader = m.select(
        col("doc_id"), col("media"),
        concat(unhex(element_at(magics, (headerIdx + 1).cast("int"))),
          col("payload")).as("payload"))
      Multimodal.formatAudit(withHeader, "doc_id", "payload",
          col("media.format"))
        .orderBy("doc_id")
    }),

    // E32 (round 9): intraclass correlation + design effect per
    // event_type with user clusters — the cluster-randomization
    // power-loss number row-level tests silently overstate.
    "q252_icc_deff" -> ((s, dir) => {
      graft.operators.Quality.iccDesignEffect(
          t(s, dir, "events"), Seq("event_type"), "user_id",
          col("value"))
        .orderBy("event_type")
    }),

    // M10 (round 9): per-payload byte-entropy probe over the
    // synthesized media payloads — the decode-free junk/encrypted
    // blob triage.
    "q251_byte_entropy" -> ((s, dir) => {
      val m = Multimodal.synthesize(t(s, dir, "documents"),
        "doc_id", "text")
      graft.operators.Multimodal.byteEntropy(m, "doc_id", "payload")
        .orderBy("doc_id")
    }),

    // V23 (round 9): embedding-space isotropy/norm report — the
    // one-row health check before trusting cosine retrieval: norm
    // spread + the share of vector energy in the common mean
    // direction.
    "q255_embed_isotropy" -> ((s, dir) => {
      graft.operators.Similarity.isotropyReport(
        t(s, dir, "embeddings"), "vec_id", "embedding")
    }),

    // E33 (round 9): continuous-metric MDE — the t-test sibling of
    // q236's proportion readout; revenue/latency experiments are
    // designed on this number.
    "q256_mde_continuous" -> ((s, dir) => {
      graft.operators.Quality.mdeContinuous(
          t(s, dir, "events"), Seq("event_type"),
          col("user_id") % 2 === 0, col("value"))
        .orderBy("event_type")
    }),

    // T51 (round 9): quantile normalization — per-event_type values
    // mapped onto the global distribution at their within-group
    // quantile position (type-7, exact integer index arithmetic);
    // cross-source score harmonization.
    "q244_quantile_normalize" -> ((s, dir) => {
      graft.operators.Quality.quantileNormalize(
          t(s, dir, "events"), "event_id", "event_type", "value")
        .orderBy("event_id")
    })
  )

  /** q153's query shape, shared between the operator call and the
    * generated oracle. */
  private val searchPattern: Seq[Double] =
    Seq(0.0, 1.0, 3.0, 1.0, 0.0, -1.0, -3.0, -1.0)

  /** q159's query shape — a DIFFERENT length (m = 12) with
    * multi-decimal values, proving the generated-oracle machinery is
    * general (lead-column fan-out, μ/σ chains, literal formatting),
    * not tuned to q153's one 8-point one-decimal pattern. */
  private val searchPatternM12: Seq[Double] =
    Seq(0.0, 0.5, 1.25, 2.0, 1.25, 0.5, 0.0, -0.75, -1.5, -0.75, 0.15, 0.6)

  /** Generated DuckDB oracle for q153/q154: the SAME left-associated
    * expression chains `TimeSeries.patternSearch`/`patternMatches`
    * build, emitted as SQL text so both engines run a bit-identical
    * IEEE op sequence (explicit products, no pow; μ repeated verbatim
    * inside σ). Exactly one of `limitK` (top-k mode, q153) or
    * `maxDist` (threshold mode, q154 — the round(6) distance
    * expression repeats verbatim in the WHERE) must be set. */
  private def patternSearchOracle(
      pattern: Seq[Double], limitK: Option[Int] = None,
      maxDist: Option[Double] = None): String = {
    require(limitK.isDefined != maxDist.isDefined,
      "exactly one of limitK / maxDist")
    val m = pattern.size
    // Full-precision literals: BigDecimal(d) goes through Double.toString,
    // which always round-trips and always carries a decimal point (so
    // DuckDB parses DOUBLE, not INTEGER). A fixed %.1f format would
    // silently truncate e.g. 0.15 -> "0.1" and desync the oracle.
    val lits = pattern.map(p => BigDecimal(p).toString)
    require(lits.map(_.toDouble) == pattern,
      s"patternSearchOracle: literals must round-trip, got $lits")
    val vcols = (0 until m).map(i => s"v$i")
    val leadDefs = (1 until m)
      .map(i => s"lead(CAST(value AS DOUBLE), $i) OVER win AS v$i")
      .mkString(", ")
    val mu = "(" + vcols.mkString(" + ") + s") / $m.0"
    val sum2 = "(" + vcols.map(v => s"$v * $v").mkString(" + ") + s") / $m.0"
    val sd = s"sqrt(greatest($sum2 - ($mu) * ($mu), 0.0))"
    val pm = "(" + lits.mkString(" + ") + s") / $m.0"
    val ps = "sqrt((" + lits.map(l => s"$l * $l").mkString(" + ") +
      s") / $m.0 - ($pm) * ($pm))"
    val dist2 = pattern.indices.map { i =>
      val d = s"((v$i - mu) / sd - (${lits(i)} - $pm) / $ps)"
      s"$d * $d"
    }.mkString(" + ")
    s"""WITH w AS (
       |  SELECT user_id, ts, event_id, CAST(value AS DOUBLE) AS v0,
       |    $leadDefs
       |  FROM events
       |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id)
       |), s AS (
       |  SELECT user_id, ts, event_id, ${vcols.mkString(", ")},
       |    $mu AS mu, $sd AS sd
       |  FROM w
       |)
       |SELECT user_id, ts, event_id, round(sqrt($dist2), 6) AS dist
       |FROM s
       |WHERE v${m - 1} IS NOT NULL AND sd > 1e-9
       |${maxDist.map(t => s"  AND round(sqrt($dist2), 6) <= $t\n").getOrElse("")}${
        if (limitK.isDefined) s"ORDER BY dist, user_id, event_id\nLIMIT ${limitK.get}"
        else "ORDER BY user_id, ts, event_id"}""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q15_exact_dedup" ->
      """WITH all_docs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000, text FROM documents WHERE doc_id % 50 = 0
        |), g AS (
        |  SELECT doc_id,
        |    count(*) OVER (PARTITION BY md5(text)) AS n_copies,
        |    row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        |  FROM all_docs
        |)
        |SELECT doc_id, n_copies FROM g WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    "q16_minhash_pairs" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |), idx AS (
        |  SELECT doc_id, w, unnest(generate_series(1, len(w)-2)) AS i FROM toks
        |), sh AS (
        |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle FROM idx
        |), mh AS (
        |  SELECT doc_id, s.seed,
        |    min(CAST(('0x' || substr(
        |      md5(CAST(s.seed AS VARCHAR) || ':' || shingle), 1, 15)) AS BIGINT))
        |      AS mh
        |  FROM sh CROSS JOIN (SELECT unnest(generate_series(0,7)) AS seed) s
        |  GROUP BY doc_id, s.seed
        |), bands AS (
        |  SELECT doc_id, seed // 2 AS band,
        |    string_agg(CAST(mh AS VARCHAR), '|' ORDER BY seed) AS sig
        |  FROM mh GROUP BY doc_id, seed // 2
        |), cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bands a
        |  JOIN bands b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
        |)
        |SELECT c.doc_a, c.doc_b,
        |  CAST(count(*) FILTER (ma.mh = mb.mh) AS BIGINT) AS n_match,
        |  CAST(count(*) FILTER (ma.mh = mb.mh) AS DOUBLE) / 8.0 AS est_jaccard
        |FROM cand c
        |JOIN mh ma ON ma.doc_id = c.doc_a
        |JOIN mh mb ON mb.doc_id = c.doc_b AND mb.seed = ma.seed
        |GROUP BY c.doc_a, c.doc_b
        |ORDER BY c.doc_a, c.doc_b""".stripMargin,

    "q17_ngram_jaccard" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |), idx AS (
        |  SELECT doc_id, w, unnest(generate_series(1, len(w)-2)) AS i FROM toks
        |), sh AS (
        |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle FROM idx
        |), mh AS (
        |  SELECT doc_id, s.seed,
        |    min(CAST(('0x' || substr(
        |      md5(CAST(s.seed AS VARCHAR) || ':' || shingle), 1, 15)) AS BIGINT))
        |      AS mh
        |  FROM sh CROSS JOIN (SELECT unnest(generate_series(0,7)) AS seed) s
        |  GROUP BY doc_id, s.seed
        |), bands AS (
        |  SELECT doc_id, seed // 2 AS band,
        |    string_agg(CAST(mh AS VARCHAR), '|' ORDER BY seed) AS sig
        |  FROM mh GROUP BY doc_id, seed // 2
        |), cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bands a
        |  JOIN bands b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
        |), sizes AS (
        |  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
        |), inter AS (
        |  SELECT c.doc_a, c.doc_b, count(*) AS i
        |  FROM cand c
        |  JOIN sh sa ON sa.doc_id = c.doc_a
        |  JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
        |  GROUP BY c.doc_a, c.doc_b
        |)
        |SELECT i.doc_a, i.doc_b, CAST(i.i AS BIGINT) AS n_common,
        |  CAST(i.i AS DOUBLE) / (za.n + zb.n - i.i) AS jaccard
        |FROM inter i
        |JOIN sizes za ON za.doc_id = i.doc_a
        |JOIN sizes zb ON zb.doc_id = i.doc_b
        |ORDER BY i.doc_a, i.doc_b""".stripMargin,

    "q48_dedup_clusters" ->
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |), idx AS (
        |  SELECT doc_id, w, unnest(generate_series(1, len(w)-2)) AS i FROM toks
        |), sh AS (
        |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle FROM idx
        |), mh AS (
        |  SELECT doc_id, s.seed,
        |    min(CAST(('0x' || substr(
        |      md5(CAST(s.seed AS VARCHAR) || ':' || shingle), 1, 15)) AS BIGINT))
        |      AS mh
        |  FROM sh CROSS JOIN (SELECT unnest(generate_series(0,7)) AS seed) s
        |  GROUP BY doc_id, s.seed
        |), bands AS (
        |  SELECT doc_id, seed // 2 AS band,
        |    string_agg(CAST(mh AS VARCHAR), '|' ORDER BY seed) AS sig
        |  FROM mh GROUP BY doc_id, seed // 2
        |), cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bands a
        |  JOIN bands b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
        |), strong AS (
        |  SELECT c.doc_a, c.doc_b
        |  FROM cand c
        |  JOIN mh ma ON ma.doc_id = c.doc_a
        |  JOIN mh mb ON mb.doc_id = c.doc_b AND mb.seed = ma.seed
        |  GROUP BY c.doc_a, c.doc_b
        |  HAVING count(*) FILTER (ma.mh = mb.mh) >= 7
        |), edges AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM strong
        |  UNION
        |  SELECT doc_b, doc_a FROM strong
        |), reach(src, dst) AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN edges e ON e.src = r.dst
        |), nodes AS (SELECT DISTINCT src AS id FROM edges)
        |SELECT n.id, least(n.id, min(r.dst)) AS cluster
        |FROM nodes n LEFT JOIN reach r ON r.src = n.id
        |GROUP BY n.id ORDER BY n.id""".stripMargin,

    "q71_tfidf" ->
      """WITH tf AS (
        |  SELECT doc_id, tok, COUNT(*) AS tf, MAX(dl) AS dl FROM (
        |    SELECT doc_id, len(string_split(text, ' ')) AS dl,
        |           unnest(string_split(text, ' ')) AS tok
        |    FROM documents)
        |  GROUP BY doc_id, tok
        |), dft AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents),
        |w AS (
        |  SELECT tf.doc_id, tf.tok,
        |    CAST(tf.tf AS DOUBLE) / tf.dl
        |      * ln(CAST(n.n_docs AS DOUBLE) / dft.df) AS tfidf
        |  FROM tf JOIN dft USING (tok) CROSS JOIN n
        |)
        |SELECT doc_id, CAST(rank AS INT) AS rank, tok,
        |  round(tfidf, 6) AS tfidf
        |FROM (
        |  SELECT doc_id, tok, tfidf,
        |    row_number() OVER (PARTITION BY doc_id
        |                       ORDER BY tfidf DESC, tok) AS rank
        |  FROM w)
        |WHERE rank <= 3
        |ORDER BY doc_id, rank""".stripMargin,

    "q73_chunk_dedup" ->
      """WITH all_docs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000, text FROM documents WHERE doc_id % 50 = 0
        |), toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS tk FROM all_docs
        |), ch0 AS (
        |  SELECT doc_id, tk,
        |    unnest(generate_series(
        |      0, CAST(floor((len(tk) - 1) / 10.0) AS INT))) AS pos
        |  FROM toks
        |), chunks AS (
        |  SELECT doc_id, pos,
        |    array_to_string(tk[pos*10+1 : pos*10+10], ' ') AS chunk
        |  FROM ch0
        |), ranked AS (
        |  SELECT doc_id, pos, chunk,
        |    row_number() OVER (PARTITION BY chunk
        |                       ORDER BY doc_id, pos) AS rn
        |  FROM chunks
        |)
        |SELECT doc_id, COUNT(*) AS n_chunks,
        |  CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  COALESCE(string_agg(CASE WHEN rn = 1 THEN chunk END,
        |                      ' ' ORDER BY pos), '') AS kept_text
        |FROM ranked GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q74_bm25" ->
      """WITH tf AS (
        |  SELECT doc_id, tok, COUNT(*) AS tf, MAX(dl) AS dl FROM (
        |    SELECT doc_id, len(string_split(text, ' ')) AS dl,
        |           unnest(string_split(text, ' ')) AS tok
        |    FROM documents)
        |  GROUP BY doc_id, tok
        |), dft AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
        |c AS (
        |  SELECT COUNT(*) AS n_docs,
        |    AVG(len(string_split(text, ' '))) AS avgdl
        |  FROM documents
        |), m AS (
        |  SELECT tf.doc_id, tf.tf, tf.dl, dft.df
        |  FROM tf JOIN dft USING (tok)
        |  WHERE tf.tok IN ('spark', 'vector', 'window')
        |), sc AS (
        |  SELECT doc_id,
        |    SUM(ln(1.0 + (c.n_docs - df + 0.5) / (df + 0.5))
        |        * (tf * (1.2 + 1.0))
        |        / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / c.avgdl))) AS score,
        |    COUNT(*) AS n_terms
        |  FROM m CROSS JOIN c GROUP BY doc_id
        |)
        |SELECT doc_id, CAST(rank AS INT) AS rank, n_terms,
        |  round(score, 6) AS score
        |FROM (
        |  SELECT doc_id, n_terms, score,
        |    row_number() OVER (ORDER BY score DESC, doc_id) AS rank
        |  FROM sc)
        |WHERE rank <= 20
        |ORDER BY rank""".stripMargin,

    "q75_entropy" ->
      """WITH tf AS (
        |  SELECT doc_id, tok, COUNT(*) AS tf FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |    FROM documents)
        |  GROUP BY doc_id, tok
        |)
        |SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
        |  round(ln(CAST(SUM(tf) AS DOUBLE))
        |        - SUM(CAST(tf AS DOUBLE) * ln(CAST(tf AS DOUBLE)))
        |          / CAST(SUM(tf) AS DOUBLE), 6) AS entropy
        |FROM tf GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q92_lm_perplexity" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |  WHERE len(string_split(text, ' ')) >= 2
        |), idx AS (
        |  SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i
        |  FROM toks
        |), pairs AS (
        |  SELECT doc_id, t[i] AS a, t[i + 1] AS b FROM idx
        |), bg AS (
        |  SELECT a, b, COUNT(*) AS cab FROM pairs GROUP BY a, b
        |), ctx AS (
        |  SELECT a, COUNT(*) AS ca FROM pairs GROUP BY a
        |), voc AS (
        |  SELECT COUNT(DISTINCT a) AS v FROM pairs
        |)
        |SELECT doc_id, COUNT(*) AS n_bigrams,
        |  round(SUM(ln((CAST(cab AS DOUBLE) + 1.0)
        |              / (CAST(ca AS DOUBLE) + CAST(v AS DOUBLE))))
        |        / COUNT(*), 6) AS avg_logp,
        |  round(exp(-SUM(ln((CAST(cab AS DOUBLE) + 1.0)
        |                   / (CAST(ca AS DOUBLE) + CAST(v AS DOUBLE))))
        |            / COUNT(*)), 6) AS ppl
        |FROM pairs
        |JOIN bg USING (a, b)
        |JOIN ctx USING (a)
        |CROSS JOIN voc
        |GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,

    "q18_simhash" ->
      """WITH toks AS (
        |  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents
        |), th AS (
        |  SELECT doc_id, md5(tok) AS h FROM toks
        |), bits AS (
        |  SELECT doc_id, j.j,
        |    CASE WHEN ascii(substr(h, 1 + (j.j // 4), 1)) <= 57
        |         THEN ascii(substr(h, 1 + (j.j // 4), 1)) - 48
        |         ELSE ascii(substr(h, 1 + (j.j // 4), 1)) - 87 END AS v
        |  FROM th CROSS JOIN (SELECT unnest(generate_series(0,63)) AS j) j
        |), contrib AS (
        |  SELECT doc_id, j,
        |    SUM(2 * ((v // CAST(POWER(2, j % 4) AS INT)) % 2) - 1) AS s
        |  FROM bits GROUP BY doc_id, j
        |)
        |SELECT doc_id,
        |  string_agg(CASE WHEN s > 0 THEN '1' ELSE '0' END, '' ORDER BY j)
        |    AS fingerprint
        |FROM contrib GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q19_cosine_topk" ->
      """WITH el AS (
        |  SELECT vec_id, generate_subscripts(embedding,1) AS d,
        |         unnest(embedding)::DOUBLE AS x
        |  FROM embeddings
        |), nrm AS (
        |  SELECT vec_id, sqrt(SUM(x*x)) AS n FROM el GROUP BY vec_id
        |), pr AS (
        |  SELECT vec_id AS probe_id, d, x FROM el WHERE vec_id < 5
        |), dots AS (
        |  SELECT p.probe_id, e.vec_id, SUM(p.x * e.x) AS dp
        |  FROM pr p JOIN el e ON e.d = p.d AND e.vec_id <> p.probe_id
        |  GROUP BY 1, 2
        |), cs AS (
        |  SELECT d.probe_id, d.vec_id, d.dp / (np.n * nv.n) AS cosine
        |  FROM dots d
        |  JOIN nrm np ON np.vec_id = d.probe_id
        |  JOIN nrm nv ON nv.vec_id = d.vec_id
        |)
        |SELECT probe_id, vec_id, CAST(rank AS INT) AS rank,
        |  round(cosine, 6) + 0.0 AS cosine
        |FROM (
        |  SELECT probe_id, vec_id, cosine,
        |    row_number() OVER (PARTITION BY probe_id
        |                       ORDER BY cosine DESC, vec_id) AS rank
        |  FROM cs)
        |WHERE rank <= 10
        |ORDER BY probe_id, rank""".stripMargin,

    "q20_ann_buckets" ->
      """WITH el AS (
        |  SELECT vec_id, generate_subscripts(embedding,1)-1 AS d,
        |         unnest(embedding)::DOUBLE AS x
        |  FROM embeddings
        |), comp AS (
        |  SELECT vec_id, p.p,
        |    SUM(x * CASE WHEN (
        |      CASE WHEN ascii(substr(md5(CAST(p.p AS VARCHAR) || ':' || CAST(d AS VARCHAR)),1,1)) <= 57
        |           THEN ascii(substr(md5(CAST(p.p AS VARCHAR) || ':' || CAST(d AS VARCHAR)),1,1)) - 48
        |           ELSE ascii(substr(md5(CAST(p.p AS VARCHAR) || ':' || CAST(d AS VARCHAR)),1,1)) - 87
        |      END) < 8 THEN 1.0 ELSE -1.0 END) AS s
        |  FROM el CROSS JOIN (SELECT unnest(generate_series(0,7)) AS p) p
        |  GROUP BY vec_id, p.p
        |)
        |SELECT vec_id,
        |  string_agg(CASE WHEN s > 0 THEN '1' ELSE '0' END, '' ORDER BY p)
        |    AS bucket
        |FROM comp GROUP BY vec_id ORDER BY vec_id""".stripMargin,

    "q21_embed_neardup" ->
      """WITH el AS (
        |  SELECT vec_id, generate_subscripts(embedding,1)-1 AS d,
        |         unnest(embedding)::DOUBLE AS x
        |  FROM embeddings
        |), comp AS (
        |  SELECT vec_id, p.p,
        |    SUM(x * CASE WHEN (
        |      CASE WHEN ascii(substr(md5(CAST(p.p AS VARCHAR) || ':' || CAST(d AS VARCHAR)),1,1)) <= 57
        |           THEN ascii(substr(md5(CAST(p.p AS VARCHAR) || ':' || CAST(d AS VARCHAR)),1,1)) - 48
        |           ELSE ascii(substr(md5(CAST(p.p AS VARCHAR) || ':' || CAST(d AS VARCHAR)),1,1)) - 87
        |      END) < 8 THEN 1.0 ELSE -1.0 END) AS s
        |  FROM el CROSS JOIN (SELECT unnest(generate_series(0,7)) AS p) p
        |  GROUP BY vec_id, p.p
        |), buckets AS (
        |  SELECT vec_id,
        |    string_agg(CASE WHEN s > 0 THEN '1' ELSE '0' END, '' ORDER BY p)
        |      AS bucket
        |  FROM comp GROUP BY vec_id
        |), nrm AS (
        |  SELECT vec_id, sqrt(SUM(x*x)) AS n FROM el GROUP BY vec_id
        |), pairs AS (
        |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
        |  FROM buckets a
        |  JOIN buckets b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        |), dots AS (
        |  SELECT p.vec_a, p.vec_b, SUM(ea.x * eb.x) AS dp
        |  FROM pairs p
        |  JOIN el ea ON ea.vec_id = p.vec_a
        |  JOIN el eb ON eb.vec_id = p.vec_b AND eb.d = ea.d
        |  GROUP BY 1, 2
        |)
        |SELECT d.vec_a, d.vec_b, round(d.dp/(na.n*nb.n), 6) + 0.0 AS cosine
        |FROM dots d
        |JOIN nrm na ON na.vec_id = d.vec_a
        |JOIN nrm nb ON nb.vec_id = d.vec_b
        |WHERE na.n > 0 AND nb.n > 0 AND d.dp/(na.n*nb.n) >= 0.35
        |ORDER BY vec_a, vec_b""".stripMargin,

    "q35_lsh_multitable" ->
      """WITH el AS (
        |  SELECT vec_id, generate_subscripts(embedding,1)-1 AS d,
        |         unnest(embedding)::DOUBLE AS x
        |  FROM embeddings
        |), comp AS (
        |  SELECT vec_id, p.p,
        |    SUM(x * CASE WHEN (
        |      CASE WHEN ascii(substr(md5(CAST(p.p AS VARCHAR) || ':' || CAST(d AS VARCHAR)),1,1)) <= 57
        |           THEN ascii(substr(md5(CAST(p.p AS VARCHAR) || ':' || CAST(d AS VARCHAR)),1,1)) - 48
        |           ELSE ascii(substr(md5(CAST(p.p AS VARCHAR) || ':' || CAST(d AS VARCHAR)),1,1)) - 87
        |      END) < 8 THEN 1.0 ELSE -1.0 END) AS s
        |  FROM el CROSS JOIN (SELECT unnest(generate_series(0,31)) AS p) p
        |  GROUP BY vec_id, p.p
        |), buckets AS (
        |  SELECT vec_id, CAST(p // 8 AS INT) AS tbl,
        |    string_agg(CASE WHEN s > 0 THEN '1' ELSE '0' END, '' ORDER BY p)
        |      AS bucket
        |  FROM comp GROUP BY vec_id, p // 8
        |), nrm AS (
        |  SELECT vec_id, sqrt(SUM(x*x)) AS n FROM el GROUP BY vec_id
        |), pairs AS (
        |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
        |  FROM buckets a
        |  JOIN buckets b ON a.tbl = b.tbl AND a.bucket = b.bucket
        |    AND a.vec_id < b.vec_id
        |), dots AS (
        |  SELECT p.vec_a, p.vec_b, SUM(ea.x * eb.x) AS dp
        |  FROM pairs p
        |  JOIN el ea ON ea.vec_id = p.vec_a
        |  JOIN el eb ON eb.vec_id = p.vec_b AND eb.d = ea.d
        |  GROUP BY 1, 2
        |)
        |SELECT d.vec_a, d.vec_b, round(d.dp/(na.n*nb.n), 6) + 0.0 AS cosine
        |FROM dots d
        |JOIN nrm na ON na.vec_id = d.vec_a
        |JOIN nrm nb ON nb.vec_id = d.vec_b
        |WHERE na.n > 0 AND nb.n > 0 AND d.dp/(na.n*nb.n) >= 0.35
        |ORDER BY vec_a, vec_b""".stripMargin,

    "q31_ivf_search" ->
      """WITH el AS (
        |  SELECT vec_id, generate_subscripts(embedding,1) AS d,
        |         unnest(embedding)::DOUBLE AS x
        |  FROM embeddings
        |), nrm AS (
        |  SELECT vec_id, sqrt(SUM(x*x)) AS n FROM el GROUP BY vec_id
        |), seed_ids AS (
        |  SELECT vec_id AS cell_vid,
        |    CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell
        |  FROM embeddings ORDER BY vec_id LIMIT 8
        |), scell AS (
        |  SELECT s.cell, e.d, e.x, n.n
        |  FROM seed_ids s JOIN el e ON e.vec_id = s.cell_vid
        |  JOIN nrm n ON n.vec_id = s.cell_vid
        |), vc AS (
        |  SELECT e.vec_id, s.cell, SUM(e.x * s.x) / (nv.n * any_value(s.n)) AS cos
        |  FROM el e JOIN scell s ON s.d = e.d
        |  JOIN nrm nv ON nv.vec_id = e.vec_id
        |  GROUP BY e.vec_id, s.cell, nv.n
        |), assign AS (
        |  SELECT vec_id, cell FROM (
        |    SELECT vec_id, cell,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cell) AS rn
        |    FROM vc) WHERE rn = 1
        |), pcells AS (
        |  SELECT vec_id AS probe_id, cell FROM (
        |    SELECT vec_id, cell,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cell) AS rn
        |    FROM vc WHERE vec_id < 3) WHERE rn <= 2
        |), cand AS (
        |  SELECT p.probe_id, a.vec_id
        |  FROM pcells p JOIN assign a ON a.cell = p.cell
        |  WHERE a.vec_id <> p.probe_id
        |), dots AS (
        |  SELECT c.probe_id, c.vec_id, SUM(ep.x * ev.x) AS dp
        |  FROM cand c
        |  JOIN el ep ON ep.vec_id = c.probe_id
        |  JOIN el ev ON ev.vec_id = c.vec_id AND ev.d = ep.d
        |  GROUP BY c.probe_id, c.vec_id
        |)
        |SELECT probe_id, vec_id, CAST(rank AS INT) AS rank,
        |  round(cosine, 6) + 0.0 AS cosine
        |FROM (
        |  SELECT d.probe_id, d.vec_id, d.dp / (np.n * nv.n) AS cosine,
        |    row_number() OVER (PARTITION BY d.probe_id
        |                       ORDER BY d.dp / (np.n * nv.n) DESC, d.vec_id) AS rank
        |  FROM dots d
        |  JOIN nrm np ON np.vec_id = d.probe_id
        |  JOIN nrm nv ON nv.vec_id = d.vec_id)
        |WHERE rank <= 5
        |ORDER BY probe_id, rank""".stripMargin,

    "q99_novelty_incremental" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |), idx AS (
        |  SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i
        |  FROM toks
        |), sh AS (
        |  SELECT DISTINCT doc_id,
        |    w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
        |  FROM idx
        |), seen AS (
        |  SELECT DISTINCT shingle FROM sh WHERE doc_id % 10 <> 0
        |)
        |SELECT s.doc_id, COUNT(*) AS n_shingles,
        |  CAST(SUM(CASE WHEN seen.shingle IS NULL THEN 1 ELSE 0 END)
        |       AS BIGINT) AS n_novel,
        |  round(CAST(SUM(CASE WHEN seen.shingle IS NULL THEN 1 ELSE 0 END)
        |             AS DOUBLE) / COUNT(*), 6) AS novelty
        |FROM sh s LEFT JOIN seen ON seen.shingle = s.shingle
        |WHERE s.doc_id % 10 = 0
        |GROUP BY s.doc_id
        |ORDER BY s.doc_id""".stripMargin,

    "q109_kmv_overlap" ->
      """WITH toks AS (
        |  SELECT source, string_split(text, ' ') AS w FROM documents
        |), idx AS (
        |  SELECT source, w, unnest(generate_series(1, len(w) - 2)) AS i
        |  FROM toks
        |), sh AS (
        |  SELECT DISTINCT source,
        |    w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
        |  FROM idx
        |), hd AS (
        |  SELECT DISTINCT source,
        |    CAST(('0x' || substr(md5(shingle), 1, 15)) AS BIGINT) AS h
        |  FROM sh
        |), sk AS (
        |  SELECT source, h FROM (
        |    SELECT source, h,
        |      row_number() OVER (PARTITION BY source ORDER BY h) AS rk
        |    FROM hd)
        |  WHERE rk <= 128
        |), pairs AS (
        |  SELECT a.source AS ga, b.source AS gb
        |  FROM (SELECT DISTINCT source FROM sk) a
        |  JOIN (SELECT DISTINCT source FROM sk) b ON a.source < b.source
        |), m AS (
        |  SELECT p.ga, p.gb, s.h,
        |    max(CASE WHEN s.source = p.ga THEN 1 ELSE 0 END) AS in_a,
        |    max(CASE WHEN s.source = p.gb THEN 1 ELSE 0 END) AS in_b
        |  FROM pairs p
        |  JOIN sk s ON s.source = p.ga OR s.source = p.gb
        |  GROUP BY 1, 2, 3
        |), r AS (
        |  SELECT ga, gb, h, in_a, in_b,
        |    row_number() OVER (PARTITION BY ga, gb ORDER BY h) AS rk
        |  FROM m
        |), kept AS (
        |  SELECT ga, gb, count(*) AS n_sketch, max(h) AS uk,
        |    CAST(SUM(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END)
        |         AS BIGINT) AS n_both
        |  FROM r WHERE rk <= 128 GROUP BY 1, 2
        |)
        |SELECT ga AS group_a, gb AS group_b, n_sketch, n_both,
        |  round(CASE WHEN n_sketch < 128 THEN CAST(n_sketch AS DOUBLE)
        |             ELSE 127.0 * power(2, 60) / uk END, 2) AS est_union,
        |  round(CAST(n_both AS DOUBLE) / n_sketch, 6) AS est_jaccard
        |FROM kept ORDER BY group_a, group_b""".stripMargin,

    // Brute force on purpose: the oracle enumerates EVERY
    // shingle-sharing pair (pairs sharing none have jaccard 0 < t),
    // so a prefix-filter false negative in the Spark side would
    // hash-mismatch — the completeness claim is checked, not assumed.
    "q111_exact_simjoin" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |), idx AS (
        |  SELECT doc_id, w, unnest(generate_series(1, len(w)-2)) AS i FROM toks
        |), sh AS (
        |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle FROM idx
        |), sizes AS (
        |  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
        |), inter AS (
        |  SELECT sa.doc_id AS doc_a, sb.doc_id AS doc_b, count(*) AS i
        |  FROM sh sa
        |  JOIN sh sb ON sb.shingle = sa.shingle AND sa.doc_id < sb.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT i.doc_a, i.doc_b, CAST(i.i AS BIGINT) AS n_common,
        |  CAST(i.i AS DOUBLE) / (za.n + zb.n - i.i) AS jaccard
        |FROM inter i
        |JOIN sizes za ON za.doc_id = i.doc_a
        |JOIN sizes zb ON zb.doc_id = i.doc_b
        |WHERE CAST(i.i AS DOUBLE) / (za.n + zb.n - i.i) >= 0.6
        |ORDER BY i.doc_a, i.doc_b""".stripMargin,

    "q128_dedup_impact" ->
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |), idx AS (
        |  SELECT doc_id, w, unnest(generate_series(1, len(w)-2)) AS i FROM toks
        |), sh AS (
        |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle FROM idx
        |), mh AS (
        |  SELECT doc_id, s.seed,
        |    min(CAST(('0x' || substr(
        |      md5(CAST(s.seed AS VARCHAR) || ':' || shingle), 1, 15)) AS BIGINT))
        |      AS mh
        |  FROM sh CROSS JOIN (SELECT unnest(generate_series(0,7)) AS seed) s
        |  GROUP BY doc_id, s.seed
        |), bands AS (
        |  SELECT doc_id, seed // 2 AS band,
        |    string_agg(CAST(mh AS VARCHAR), '|' ORDER BY seed) AS sig
        |  FROM mh GROUP BY doc_id, seed // 2
        |), cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bands a
        |  JOIN bands b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
        |), strong AS (
        |  SELECT c.doc_a, c.doc_b
        |  FROM cand c
        |  JOIN mh ma ON ma.doc_id = c.doc_a
        |  JOIN mh mb ON mb.doc_id = c.doc_b AND mb.seed = ma.seed
        |  GROUP BY c.doc_a, c.doc_b
        |  HAVING count(*) FILTER (ma.mh = mb.mh) >= 7
        |), edges AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM strong
        |  UNION
        |  SELECT doc_b, doc_a FROM strong
        |), reach(src, dst) AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN edges e ON e.src = r.dst
        |), nodes AS (SELECT DISTINCT src AS id FROM edges
        |), cc AS (
        |  SELECT n.id, least(n.id, min(r.dst)) AS cluster
        |  FROM nodes n LEFT JOIN reach r ON r.src = n.id GROUP BY n.id
        |), exact_kept AS (
        |  SELECT min(doc_id) AS doc_id FROM documents GROUP BY text
        |), near_drop AS (
        |  SELECT id AS doc_id FROM cc WHERE id <> cluster
        |)
        |SELECT d.source, count(*) AS n_docs,
        |  CAST(SUM(CASE WHEN e.doc_id IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_after_exact,
        |  CAST(SUM(CASE WHEN e.doc_id IS NOT NULL AND nd.doc_id IS NULL
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_final,
        |  round(CAST(SUM(CASE WHEN e.doc_id IS NOT NULL
        |      AND nd.doc_id IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*), 6) AS retention
        |FROM documents d
        |LEFT JOIN exact_kept e ON e.doc_id = d.doc_id
        |LEFT JOIN near_drop nd ON nd.doc_id = d.doc_id
        |GROUP BY d.source ORDER BY d.source""".stripMargin,

    "q127_lsh_recall_audit" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |), idx AS (
        |  SELECT doc_id, w, unnest(generate_series(1, len(w)-2)) AS i FROM toks
        |), sh AS (
        |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle FROM idx
        |), sizes AS (
        |  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
        |), inter AS (
        |  SELECT sa.doc_id AS doc_a, sb.doc_id AS doc_b, count(*) AS i
        |  FROM sh sa
        |  JOIN sh sb ON sb.shingle = sa.shingle AND sa.doc_id < sb.doc_id
        |  GROUP BY 1, 2
        |), ex AS (
        |  SELECT i.doc_a, i.doc_b FROM inter i
        |  JOIN sizes za ON za.doc_id = i.doc_a
        |  JOIN sizes zb ON zb.doc_id = i.doc_b
        |  WHERE CAST(i.i AS DOUBLE) / (za.n + zb.n - i.i) >= 0.6
        |), mh AS (
        |  SELECT doc_id, s.seed,
        |    min(CAST(('0x' || substr(
        |      md5(CAST(s.seed AS VARCHAR) || ':' || shingle), 1, 15)) AS BIGINT))
        |      AS mh
        |  FROM sh CROSS JOIN (SELECT unnest(generate_series(0,7)) AS seed) s
        |  GROUP BY doc_id, s.seed
        |), bands AS (
        |  SELECT doc_id, seed // 2 AS band,
        |    string_agg(CAST(mh AS VARCHAR), '|' ORDER BY seed) AS sig
        |  FROM mh GROUP BY doc_id, seed // 2
        |), cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bands a
        |  JOIN bands b ON a.band = b.band AND a.sig = b.sig
        |    AND a.doc_id < b.doc_id
        |), f AS (
        |  SELECT doc_a, doc_b FROM ex
        |  INTERSECT SELECT doc_a, doc_b FROM cand
        |), c AS (
        |  SELECT (SELECT count(*) FROM ex) AS n_true,
        |    (SELECT count(*) FROM cand) AS n_candidates,
        |    (SELECT count(*) FROM f) AS n_found
        |)
        |SELECT n_true, n_candidates, n_found,
        |  round(CAST(n_found AS DOUBLE) / n_true, 6) AS recall,
        |  round(CAST(n_found AS DOUBLE) / n_candidates, 6) AS precision
        |FROM c""".stripMargin,

    "q126_sorted_neighborhood" ->
      """WITH r AS (
        |  SELECT doc_id, text,
        |    row_number() OVER (ORDER BY substr(text, 1, 40), doc_id)
        |      AS rk
        |  FROM documents
        |), cand AS (
        |  SELECT least(a.doc_id, b.doc_id) AS doc_a,
        |    greatest(a.doc_id, b.doc_id) AS doc_b,
        |    a.text AS ta, b.text AS tb
        |  FROM r a JOIN r b
        |    ON b.rk > a.rk AND b.rk <= a.rk + 10
        |), toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |), idx AS (
        |  SELECT doc_id, w, unnest(generate_series(1, len(w)-2)) AS i FROM toks
        |), sh AS (
        |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle FROM idx
        |), sizes AS (
        |  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
        |), inter AS (
        |  SELECT c.doc_a, c.doc_b, count(*) AS i
        |  FROM (SELECT DISTINCT doc_a, doc_b FROM cand) c
        |  JOIN sh sa ON sa.doc_id = c.doc_a
        |  JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
        |  GROUP BY 1, 2
        |)
        |SELECT i.doc_a, i.doc_b,
        |  CAST(i.i AS DOUBLE) / (za.n + zb.n - i.i) AS jaccard
        |FROM inter i
        |JOIN sizes za ON za.doc_id = i.doc_a
        |JOIN sizes zb ON zb.doc_id = i.doc_b
        |WHERE CAST(i.i AS DOUBLE) / (za.n + zb.n - i.i) >= 0.6
        |ORDER BY i.doc_a, i.doc_b""".stripMargin,

    "q107_pmi_collocations" ->
      """WITH toks AS (
        |  SELECT string_split(text, ' ') AS w FROM documents
        |), uni AS (
        |  SELECT unnest(w) AS tok FROM toks
        |), ucnt AS (
        |  SELECT tok, count(*) AS c FROM uni GROUP BY 1
        |), n AS (
        |  SELECT count(*) AS n FROM uni
        |), bgl AS (
        |  SELECT w, unnest(generate_series(1, len(w) - 1)) AS i
        |  FROM toks WHERE len(w) >= 2
        |), bg AS (
        |  SELECT w[i] AS a, w[i+1] AS b, count(*) AS cab
        |  FROM bgl GROUP BY 1, 2
        |), n2 AS (
        |  SELECT CAST(SUM(cab) AS BIGINT) AS n2 FROM bg
        |)
        |SELECT bg.a, bg.b, bg.cab,
        |  round(ln((CAST(bg.cab AS DOUBLE) / n2.n2) /
        |    ((CAST(ua.c AS DOUBLE) / n.n) * (CAST(ub.c AS DOUBLE) / n.n))),
        |    6) + 0.0 AS pmi
        |FROM bg
        |CROSS JOIN n CROSS JOIN n2
        |JOIN ucnt ua ON ua.tok = bg.a
        |JOIN ucnt ub ON ub.tok = bg.b
        |WHERE bg.cab >= 5
        |ORDER BY a, b""".stripMargin,

    "q105_quality_blend" ->
      """WITH f AS (
        |  SELECT doc_id, lang,
        |    round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |      / len(string_split(text, ' ')), 6) AS ttr,
        |    round(CAST(len(list_filter(string_split(text, ' '),
        |      t -> list_contains(['the','a','of','and','is','to'], t)))
        |      AS DOUBLE) / len(string_split(text, ' ')), 6) AS stop_ratio,
        |    CAST(len(string_split(text, ' ')) AS INT) AS n_tokens
        |  FROM documents
        |), r AS (
        |  SELECT doc_id, lang,
        |    round(percent_rank() OVER (PARTITION BY lang
        |      ORDER BY ttr, doc_id), 6) AS pr_ttr,
        |    round(percent_rank() OVER (PARTITION BY lang
        |      ORDER BY stop_ratio DESC, doc_id), 6) AS pr_stop_ratio,
        |    round(percent_rank() OVER (PARTITION BY lang
        |      ORDER BY n_tokens, doc_id), 6) AS pr_n_tokens
        |  FROM f
        |)
        |SELECT doc_id, lang, pr_ttr, pr_stop_ratio, pr_n_tokens,
        |  round((pr_ttr + pr_stop_ratio + pr_n_tokens) / 3, 6) AS blend
        |FROM r ORDER BY doc_id""".stripMargin,

    "q117_cooccurrence" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_distinct(string_split(text, ' ')))
        |    AS tok
        |  FROM documents
        |), freq AS (
        |  SELECT tok, count(*) AS df FROM toks GROUP BY tok
        |  HAVING count(*) >= 300
        |), ft AS (
        |  SELECT t.doc_id, t.tok, f.df FROM toks t JOIN freq f ON f.tok = t.tok
        |), p AS (
        |  SELECT a.tok AS tok_a, b.tok AS tok_b, count(*) AS n_both,
        |    max(a.df) AS df_a, max(b.df) AS df_b
        |  FROM ft a JOIN ft b ON b.doc_id = a.doc_id AND a.tok < b.tok
        |  GROUP BY 1, 2
        |  HAVING count(*) >= 300
        |)
        |SELECT tok_a, tok_b, n_both, df_a, df_b,
        |  round(CAST(n_both AS DOUBLE) * (SELECT count(*) FROM documents)
        |        / (df_a * df_b), 6) AS lift
        |FROM p ORDER BY tok_a, tok_b""".stripMargin,

    "q114_vocab_coverage" ->
      """WITH toks AS (
        |  SELECT unnest(string_split(text, ' ')) AS token FROM documents
        |), c AS (
        |  SELECT token, count(*) AS cnt FROM toks GROUP BY token
        |), r AS (
        |  SELECT row_number() OVER (ORDER BY cnt DESC, token) AS rank,
        |    SUM(cnt) OVER (ORDER BY cnt DESC, token
        |      ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM c
        |), s AS (
        |  SELECT CAST(rank AS BIGINT) AS rank,
        |    CAST(cum AS DOUBLE) / (SELECT SUM(cnt) FROM c) AS cum_share
        |  FROM r
        |), tg AS (
        |  SELECT unnest([0.5, 0.75, 0.9, 0.99]) AS target
        |)
        |SELECT target, min(rank) AS vocab_size,
        |  round(arg_min(cum_share, rank), 6) AS cum_share
        |FROM tg JOIN s ON s.cum_share >= tg.target
        |GROUP BY target ORDER BY target""".stripMargin,

    "q106_growth_curve" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |), idx AS (
        |  SELECT doc_id, w, unnest(generate_series(1, len(w)-2)) AS i
        |  FROM toks
        |), sh AS (
        |  SELECT DISTINCT doc_id,
        |    w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
        |  FROM idx
        |), first AS (
        |  SELECT min(doc_id) AS doc_id FROM sh GROUP BY shingle
        |), nov AS (
        |  SELECT doc_id, count(*) AS n_novel FROM first GROUP BY doc_id
        |), base AS (
        |  SELECT d.doc_id, coalesce(n.n_novel, 0) AS n_novel
        |  FROM documents d LEFT JOIN nov n ON n.doc_id = d.doc_id
        |)
        |SELECT doc_id, CAST(n_novel AS BIGINT) AS n_novel,
        |  CAST(SUM(n_novel) OVER (ORDER BY doc_id) AS BIGINT)
        |    AS cum_distinct
        |FROM base ORDER BY doc_id""".stripMargin,

    "q103_mad_outliers" ->
      """WITH med AS (
        |  SELECT event_type, quantile_cont(value, 0.5) AS med
        |  FROM events GROUP BY 1
        |), dev AS (
        |  SELECT e.event_id, e.event_type, e.value, m.med
        |  FROM events e JOIN med m USING (event_type)
        |), madt AS (
        |  SELECT event_type, quantile_cont(abs(value - med), 0.5) AS mad
        |  FROM dev GROUP BY 1
        |), scored AS (
        |  SELECT d.event_id, d.event_type,
        |    CASE WHEN t.mad > 0
        |         THEN round(0.6745 * (d.value - d.med) / t.mad, 6) + 0.0 END
        |      AS robust_z
        |  FROM dev d JOIN madt t USING (event_type)
        |)
        |SELECT event_id, event_type, robust_z,
        |  coalesce(abs(robust_z) > 3.5, false) AS is_outlier
        |FROM scored ORDER BY event_id""".stripMargin,

    "q104_source_overlap" ->
      """WITH toks AS (
        |  SELECT source, string_split(text, ' ') AS w FROM documents
        |), idx AS (
        |  SELECT source, w, unnest(generate_series(1, len(w)-2)) AS i
        |  FROM toks
        |), gs AS (
        |  SELECT DISTINCT source,
        |    w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
        |  FROM idx
        |), sizes AS (
        |  SELECT source, count(*) AS n FROM gs GROUP BY 1
        |), common AS (
        |  SELECT a.source AS group_a, b.source AS group_b,
        |         count(*) AS n_common
        |  FROM gs a JOIN gs b ON a.shingle = b.shingle
        |                     AND a.source < b.source
        |  GROUP BY 1, 2
        |)
        |SELECT c.group_a, c.group_b, sa.n AS n_a, sb.n AS n_b, c.n_common,
        |  round(CAST(c.n_common AS DOUBLE) / sa.n, 6) AS containment_a,
        |  round(CAST(c.n_common AS DOUBLE) / sb.n, 6) AS containment_b,
        |  round(CAST(c.n_common AS DOUBLE) / (sa.n + sb.n - c.n_common), 6)
        |    AS jaccard
        |FROM common c
        |JOIN sizes sa ON sa.source = c.group_a
        |JOIN sizes sb ON sb.source = c.group_b
        |ORDER BY group_a, group_b""".stripMargin,

    "q102_centroid_sim" ->
      """WITH el AS (
        |  SELECT label, generate_subscripts(embedding,1) AS d,
        |         unnest(embedding)::DOUBLE AS x
        |  FROM embeddings WHERE label IS NOT NULL
        |), cen AS (
        |  SELECT label, d, SUM(x) / count(*) AS c FROM el GROUP BY label, d
        |), nrm AS (
        |  SELECT label, sqrt(SUM(c*c)) AS n FROM cen GROUP BY label
        |), dots AS (
        |  SELECT a.label AS label_a, b.label AS label_b,
        |         SUM(a.c * b.c) AS dp
        |  FROM cen a JOIN cen b ON a.d = b.d AND a.label < b.label
        |  GROUP BY 1, 2
        |)
        |SELECT d.label_a, d.label_b,
        |  round(d.dp / (na.n * nb.n), 6) + 0.0 AS cosine
        |FROM dots d
        |JOIN nrm na ON na.label = d.label_a
        |JOIN nrm nb ON nb.label = d.label_b
        |ORDER BY label_a, label_b""".stripMargin,

    "q101_split_leakage" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |), idx AS (
        |  SELECT doc_id, w, unnest(generate_series(1, len(w)-2)) AS i FROM toks
        |), sh AS (
        |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle FROM idx
        |), mh AS (
        |  SELECT doc_id, s.seed,
        |    min(CAST(('0x' || substr(
        |      md5(CAST(s.seed AS VARCHAR) || ':' || shingle), 1, 15)) AS BIGINT))
        |      AS mh
        |  FROM sh CROSS JOIN (SELECT unnest(generate_series(0,7)) AS seed) s
        |  GROUP BY doc_id, s.seed
        |), bands AS (
        |  SELECT doc_id, seed // 2 AS band,
        |    string_agg(CAST(mh AS VARCHAR), '|' ORDER BY seed) AS sig
        |  FROM mh GROUP BY doc_id, seed // 2
        |), cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bands a
        |  JOIN bands b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
        |), strong AS (
        |  SELECT c.doc_a, c.doc_b
        |  FROM cand c
        |  JOIN mh ma ON ma.doc_id = c.doc_a
        |  JOIN mh mb ON mb.doc_id = c.doc_b AND mb.seed = ma.seed
        |  GROUP BY c.doc_a, c.doc_b
        |  HAVING count(*) FILTER (ma.mh = mb.mh) >= 7
        |), asg AS (
        |  SELECT doc_id,
        |    CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'c'
        |         THEN 'train' ELSE 'val' END AS split
        |  FROM documents
        |)
        |SELECT p.doc_a, p.doc_b, a.split AS split_a, b.split AS split_b,
        |  (a.split <> b.split) AS leaked
        |FROM strong p
        |JOIN asg a ON a.doc_id = p.doc_a
        |JOIN asg b ON b.doc_id = p.doc_b
        |ORDER BY p.doc_a, p.doc_b""".stripMargin,

    "q100_source_cap" ->
      """SELECT source, doc_id, CAST(pick_rank AS INT) AS pick_rank, lang
        |FROM (
        |  SELECT source, doc_id, lang,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS pick_rank
        |  FROM documents)
        |WHERE pick_rank <= 8
        |ORDER BY source, pick_rank""".stripMargin,

    "q112_weighted_sample" ->
      """WITH u AS (
        |  SELECT doc_id, source, n_chars,
        |    (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
        |       AS BIGINT) + 0.5) / 4294967296.0 AS u
        |  FROM documents
        |  WHERE CAST(n_chars AS DOUBLE) > 0
        |), keyed AS (
        |  SELECT doc_id, source, n_chars,
        |    ln(u) / CAST(n_chars AS DOUBLE) AS es_key
        |  FROM u
        |  ORDER BY es_key DESC, doc_id
        |  LIMIT 100
        |)
        |SELECT doc_id, source, n_chars, round(es_key, 6) AS es_key
        |FROM keyed ORDER BY doc_id""".stripMargin,

    "q122_weighted_sample_per_key" ->
      """WITH u AS (
        |  SELECT lang, doc_id, n_chars,
        |    (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
        |       AS BIGINT) + 0.5) / 4294967296.0 AS u
        |  FROM documents
        |  WHERE CAST(n_chars AS DOUBLE) > 0
        |), keyed AS (
        |  SELECT lang, doc_id, n_chars,
        |    ln(u) / CAST(n_chars AS DOUBLE) AS es_key,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY ln(u) / CAST(n_chars AS DOUBLE) DESC, doc_id)
        |      AS pick_rank
        |  FROM u
        |)
        |SELECT lang, CAST(pick_rank AS INT) AS pick_rank, doc_id,
        |  n_chars, round(es_key, 6) AS es_key
        |FROM keyed WHERE pick_rank <= 20
        |ORDER BY lang, pick_rank""".stripMargin,

    "q115_epoch_repeat" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |    CAST(TRY_CAST(regexp_extract(source, '(\d+)$', 1) AS INT) % 4
        |      AS DOUBLE) + 0.5 AS epochs,
        |    CAST(('0x' || substr(md5('ep:' || CAST(doc_id AS VARCHAR)), 1, 8))
        |      AS BIGINT) / 4294967296.0 AS u
        |  FROM documents
        |), rep AS (
        |  SELECT doc_id, source, epochs,
        |    CAST(floor(epochs)
        |      + CASE WHEN u < epochs - floor(epochs) THEN 1 ELSE 0 END
        |      AS INT) AS n
        |  FROM d
        |)
        |SELECT doc_id, source, epochs,
        |  CAST(unnest(generate_series(1, n)) AS INT) AS copy_idx
        |FROM rep WHERE n >= 1
        |ORDER BY doc_id, copy_idx""".stripMargin,

    "q98_novelty" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |), idx AS (
        |  SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i
        |  FROM toks
        |), sh AS (
        |  SELECT DISTINCT doc_id,
        |    w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
        |  FROM idx
        |), first AS (
        |  SELECT shingle, MIN(doc_id) AS first_doc FROM sh GROUP BY shingle
        |)
        |SELECT s.doc_id, COUNT(*) AS n_shingles,
        |  CAST(SUM(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)
        |       AS BIGINT) AS n_novel,
        |  round(CAST(SUM(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)
        |             AS DOUBLE) / COUNT(*), 6) AS novelty
        |FROM sh s JOIN first f ON f.shingle = s.shingle
        |GROUP BY s.doc_id
        |ORDER BY s.doc_id""".stripMargin,

    "q95_rolling_zscore" ->
      """WITH w AS (
        |  SELECT event_id, user_id, value,
        |    COUNT(value) OVER win AS n_prev,
        |    SUM(value) OVER win AS s,
        |    SUM(value * value) OVER win AS s2
        |  FROM events
        |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
        |                 ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING)
        |), z AS (
        |  SELECT event_id, user_id, n_prev,
        |    CASE WHEN n_prev = 10
        |          AND sqrt(greatest((s2 - s * s / n_prev) / n_prev, 0)) > 0
        |         THEN round((value - s / n_prev)
        |              / sqrt(greatest((s2 - s * s / n_prev) / n_prev, 0)), 6)
        |              + 0.0
        |    END AS z
        |  FROM w
        |)
        |SELECT event_id, user_id, CAST(n_prev AS BIGINT) AS n_prev, z,
        |  COALESCE(abs(z) >= 3.0, false) AS is_anomaly
        |FROM z ORDER BY event_id""".stripMargin,

    "q94_hard_negatives" ->
      """WITH el AS (
        |  SELECT vec_id, generate_subscripts(embedding,1) AS d,
        |         unnest(embedding)::DOUBLE AS x
        |  FROM embeddings
        |), nrm AS (
        |  SELECT vec_id, sqrt(SUM(x*x)) AS n FROM el GROUP BY vec_id
        |), lab AS (
        |  SELECT vec_id, label FROM embeddings
        |), pr AS (
        |  SELECT e.vec_id AS probe_id, l.label AS plabel, e.d, e.x
        |  FROM el e JOIN lab l ON l.vec_id = e.vec_id
        |  WHERE e.vec_id < 5
        |), dots AS (
        |  SELECT p.probe_id, e.vec_id, SUM(p.x * e.x) AS dp
        |  FROM pr p
        |  JOIN lab cl ON cl.label IS NOT NULL AND cl.label <> p.plabel
        |  JOIN el e ON e.vec_id = cl.vec_id AND e.d = p.d
        |  GROUP BY 1, 2
        |), cs AS (
        |  SELECT d.probe_id, d.vec_id, cl.label, d.dp / (np.n * nv.n) AS cosine
        |  FROM dots d
        |  JOIN lab cl ON cl.vec_id = d.vec_id
        |  JOIN nrm np ON np.vec_id = d.probe_id
        |  JOIN nrm nv ON nv.vec_id = d.vec_id
        |)
        |SELECT probe_id, vec_id, label, CAST(rank AS INT) AS rank,
        |  round(cosine, 6) + 0.0 AS cosine
        |FROM (
        |  SELECT probe_id, vec_id, label, cosine,
        |    row_number() OVER (PARTITION BY probe_id
        |                       ORDER BY cosine DESC, vec_id) AS rank
        |  FROM cs)
        |WHERE rank <= 10
        |ORDER BY probe_id, rank""".stripMargin,

    "q93_semantic_dedup" ->
      """WITH el AS (
        |  SELECT vec_id, generate_subscripts(embedding,1) AS d,
        |         unnest(embedding)::DOUBLE AS x
        |  FROM embeddings
        |), nrm AS (
        |  SELECT vec_id, sqrt(SUM(x*x)) AS n FROM el GROUP BY vec_id
        |), nl AS (
        |  SELECT GREATEST(1, CAST(ceil(count(*) / 64.0) AS BIGINT)) AS nlist
        |  FROM embeddings
        |), seed_ids AS (
        |  SELECT vec_id AS cell_vid, CAST(rn - 1 AS INT) AS cell FROM (
        |    SELECT vec_id, row_number() OVER (ORDER BY vec_id) AS rn
        |    FROM embeddings)
        |  WHERE rn <= (SELECT nlist FROM nl)
        |), scell AS (
        |  SELECT s.cell, e.d, e.x, n.n
        |  FROM seed_ids s JOIN el e ON e.vec_id = s.cell_vid
        |  JOIN nrm n ON n.vec_id = s.cell_vid
        |), vc AS (
        |  SELECT e.vec_id, s.cell, SUM(e.x * s.x) / (nv.n * any_value(s.n)) AS cos
        |  FROM el e JOIN scell s ON s.d = e.d
        |  JOIN nrm nv ON nv.vec_id = e.vec_id
        |  GROUP BY e.vec_id, s.cell, nv.n
        |), assign AS (
        |  SELECT vec_id, cell FROM (
        |    SELECT vec_id, cell,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cell) AS rn
        |    FROM vc) WHERE rn = 1
        |), pairs AS (
        |  SELECT ax.vec_id AS xid, ay.vec_id AS yid
        |  FROM assign ax JOIN assign ay
        |    ON ax.cell = ay.cell AND ax.vec_id < ay.vec_id
        |), dots AS (
        |  SELECT p.yid, p.xid, SUM(ex.x * ey.x) AS dp
        |  FROM pairs p
        |  JOIN el ex ON ex.vec_id = p.xid
        |  JOIN el ey ON ey.vec_id = p.yid AND ey.d = ex.d
        |  GROUP BY p.yid, p.xid
        |), dup AS (
        |  SELECT d.yid AS vec_id, MIN(d.xid) AS dup_of
        |  FROM dots d
        |  JOIN nrm nx ON nx.vec_id = d.xid
        |  JOIN nrm ny ON ny.vec_id = d.yid
        |  WHERE d.dp / (nx.n * ny.n) >= 0.35
        |  GROUP BY d.yid
        |)
        |SELECT a.vec_id, CAST(a.cell AS INT) AS cell, dup.dup_of,
        |  dup.dup_of IS NULL AS is_kept
        |FROM assign a LEFT JOIN dup ON dup.vec_id = a.vec_id
        |ORDER BY a.vec_id""".stripMargin,

    "q22_text_stats" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
        |  CAST(SUM(n_chars) AS DOUBLE) / count(*) AS avg_chars,
        |  count(DISTINCT source) AS n_sources
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "q23_quality_score" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
        |    CAST(length(text) AS INT) AS n_chars,
        |    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) AS n_distinct,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      t -> list_contains(['the','a','of','and','is','to'], t))) AS DOUBLE)
        |      AS n_stop
        |  FROM documents
        |)
        |SELECT doc_id, n_tokens, n_chars,
        |  round(n_distinct / n_tokens, 6) AS ttr,
        |  round(n_stop / n_tokens, 6) AS stop_ratio,
        |  round(CAST(n_chars - (n_tokens - 1) AS DOUBLE) / n_tokens, 6)
        |    AS mean_tok_len,
        |  round((n_distinct / n_tokens) * 0.5 + (1.0 - n_stop / n_tokens) * 0.5, 6)
        |    AS quality
        |FROM f ORDER BY doc_id""".stripMargin,

    "q24_lang_id" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      t -> list_contains(['the','a','of','and','is','to','in','it'], t))) AS INT) AS en_hits,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      t -> list_contains(['el','la','de','que','y','en','los','se'], t))) AS INT) AS es_hits,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      t -> list_contains(['le','la','de','et','les','des','un','une'], t))) AS INT) AS fr_hits,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      t -> list_contains(['der','die','und','das','ist','von','den','ein'], t))) AS INT) AS de_hits
        |  FROM documents
        |)
        |SELECT doc_id, en_hits, es_hits, fr_hits, de_hits,
        |  CASE
        |    WHEN en_hits > 0 AND en_hits >= es_hits AND en_hits >= fr_hits
        |         AND en_hits >= de_hits THEN 'en'
        |    WHEN es_hits > 0 AND es_hits >= fr_hits AND es_hits >= de_hits
        |         THEN 'es'
        |    WHEN fr_hits > 0 AND fr_hits >= de_hits THEN 'fr'
        |    WHEN de_hits > 0 THEN 'de'
        |    ELSE 'und' END AS predicted
        |FROM f ORDER BY doc_id""".stripMargin,

    "q25_token_fingerprint" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS INT) AS ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]+')) AS INT)
        |    AS regex_tokens,
        |  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q40_quantize_embeddings" ->
      """WITH el AS (
        |  SELECT vec_id, generate_subscripts(embedding,1) AS d,
        |         unnest(embedding)::DOUBLE AS x
        |  FROM embeddings
        |), stats AS (
        |  SELECT vec_id, min(x) AS minv, (max(x) - min(x)) / 255.0 AS scale
        |  FROM el GROUP BY vec_id
        |), codes AS (
        |  SELECT e.vec_id, e.d, e.x, s.minv, s.scale,
        |    CASE WHEN s.scale = 0 THEN 0
        |         ELSE CAST(floor((e.x - s.minv) / s.scale + 0.5) AS INT) END AS q
        |  FROM el e JOIN stats s ON s.vec_id = e.vec_id
        |)
        |SELECT vec_id,
        |  round(any_value(minv), 6) + 0.0 AS minv,
        |  round(any_value(scale), 6) AS scale,
        |  min(q) AS q_min, max(q) AS q_max,
        |  round(max(abs(x - (minv + q * scale))), 6) AS max_err,
        |  CAST(first(q ORDER BY d) AS INT) AS first_code
        |FROM codes GROUP BY vec_id ORDER BY vec_id""".stripMargin,

    "q38_top_ngrams" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |), idx AS (
        |  SELECT doc_id, w, unnest(generate_series(1, len(w)-1)) AS i FROM toks
        |), sh AS (
        |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] AS ngram FROM idx
        |)
        |SELECT ngram, count(*) AS df FROM sh GROUP BY ngram
        |ORDER BY df DESC, ngram LIMIT 50""".stripMargin,

    "q39_decontaminate" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |), idx AS (
        |  SELECT doc_id, w, unnest(generate_series(1, len(w)-3)) AS i FROM toks
        |), sh AS (
        |  SELECT DISTINCT doc_id,
        |    w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] AS shingle
        |  FROM idx
        |), bench AS (
        |  SELECT DISTINCT shingle FROM sh WHERE doc_id % 100 = 0
        |)
        |SELECT DISTINCT s.doc_id
        |FROM sh s JOIN bench b USING (shingle)
        |WHERE s.doc_id % 100 <> 0
        |ORDER BY doc_id""".stripMargin,

    "q46_pii_redact" ->
      """WITH inj AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 40 = 0
        |         THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
        |              || '@example.com now'
        |         ELSE text END AS t
        |  FROM documents
        |)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(t, '[a-z0-9.]+@[a-z0-9.]+')) AS INT)
        |    AS n_emails,
        |  md5(regexp_replace(t, '[a-z0-9.]+@[a-z0-9.]+', '<EMAIL>', 'g'))
        |    AS redacted_hash
        |FROM inj ORDER BY doc_id""".stripMargin,

    "q47_json_extract" ->
      """SELECT event_id,
        |  CAST(json_extract(props, '$.k') AS INT) AS k
        |FROM events
        |WHERE CAST(json_extract(props, '$.k') AS INT) >= 80
        |ORDER BY event_id""".stripMargin,

    "q45_sequence_packing" ->
      """WITH f AS (
        |  SELECT doc_id, lang,
        |    CAST(len(string_split(text, ' ')) AS INT) AS n_tokens
        |  FROM documents
        |)
        |SELECT doc_id, lang, n_tokens,
        |  CAST(floor(CAST(SUM(n_tokens) OVER (PARTITION BY lang
        |      ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n_tokens
        |    AS DOUBLE) / 2000) AS INT) AS bin
        |FROM f ORDER BY doc_id""".stripMargin,

    "q42_quota_sample" ->
      """WITH frac AS (
        |  SELECT doc_id, lang,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |      / 4294967296.0 AS u
        |  FROM documents
        |), quota AS (
        |  SELECT * FROM (VALUES ('en', 0.5), ('es', 0.8), ('de', 0.8),
        |                        ('fr', 0.3), ('zh', 0.1)) AS q(lang, p)
        |)
        |SELECT f.doc_id, f.lang, round(f.u, 6) AS u
        |FROM frac f JOIN quota q ON q.lang = f.lang
        |WHERE f.u < q.p
        |ORDER BY f.doc_id""".stripMargin,

    "q43_repetition" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |), f AS (
        |  SELECT doc_id,
        |    CAST(len(w) - 1 AS INT) AS total_2g,
        |    CAST(len(list_distinct([w[i] || ' ' || w[i+1]
        |      FOR i IN generate_series(1, len(w)-1)])) AS INT) AS distinct_2g,
        |    CAST(len(w) - 2 AS INT) AS total_3g,
        |    CAST(len(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
        |      FOR i IN generate_series(1, len(w)-2)])) AS INT) AS distinct_3g
        |  FROM t WHERE len(w) >= 3
        |)
        |SELECT doc_id,
        |  round(1.0 - CAST(distinct_2g AS DOUBLE)/total_2g, 6)
        |    AS dup_2gram_frac,
        |  round(1.0 - CAST(distinct_3g AS DOUBLE)/total_3g, 6)
        |    AS dup_3gram_frac,
        |  CAST(1.0 - CAST(distinct_2g AS DOUBLE)/total_2g > 0.5 AS BOOLEAN)
        |    AS repetitive
        |FROM f ORDER BY doc_id""".stripMargin,

    "q44_label_centroids" ->
      """WITH el AS (
        |  SELECT label, vec_id, generate_subscripts(embedding,1) AS d,
        |         unnest(embedding)::DOUBLE AS x
        |  FROM embeddings
        |), cen AS (
        |  SELECT label, d, SUM(x) / count(*) AS c FROM el GROUP BY label, d
        |)
        |SELECT label,
        |  CAST(count(*) AS INT) AS dims,
        |  round(sqrt(SUM(c*c)), 6) AS centroid_norm,
        |  round(first(c ORDER BY d), 6) + 0.0 AS dim0
        |FROM cen GROUP BY label ORDER BY label""".stripMargin,

    "q41_stratified_split" ->
      """SELECT lang,
        |  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'c'
        |       THEN 'train' ELSE 'val' END AS split,
        |  count(*) AS n_docs,
        |  min(doc_id) AS min_id,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
        |FROM documents
        |GROUP BY lang, split
        |ORDER BY lang, split""".stripMargin,

    "q34_curation_pipeline" ->
      """WITH all_docs AS (
        |  SELECT doc_id, text, lang FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000, text, lang FROM documents
        |  WHERE doc_id % 50 = 0
        |), g AS (
        |  SELECT doc_id, text, lang,
        |    count(*) OVER (PARTITION BY md5(text)) AS n_copies,
        |    row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        |  FROM all_docs
        |), f AS (
        |  SELECT doc_id, lang, CAST(n_copies AS BIGINT) AS n_copies,
        |    CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
        |    round(CAST(len(list_filter(string_split(text, ' '),
        |      t -> list_contains(['the','a','of','and','is','to'], t)))
        |      AS DOUBLE) / len(string_split(text, ' ')), 6) AS stop_ratio,
        |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
        |      AS fingerprint
        |  FROM g WHERE rn = 1 AND lang IN ('en', 'es', 'de')
        |)
        |SELECT doc_id, lang, n_copies, n_tokens, stop_ratio, fingerprint
        |FROM f
        |WHERE n_tokens >= 30 AND stop_ratio <= 0.12
        |ORDER BY doc_id""".stripMargin,

    "q33_rolling_chunks" ->
      """WITH RECURSIVE pows(k, v) AS (
        |  SELECT 0, CAST(1 AS BIGINT)
        |  UNION ALL
        |  SELECT k + 1, v * 257 % 1000000007 FROM pows WHERE k < 15
        |), pos AS (
        |  SELECT doc_id, text, unnest(generate_series(16, length(text))) AS p
        |  FROM documents
        |), h AS (
        |  SELECT doc_id, text, p,
        |    SUM((ascii(substr(text, CAST(p - 16 + 1 + j.j AS INT), 1))) * pw.v)
        |      % 1000000007 AS hv
        |  FROM pos
        |  CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS j) j
        |  JOIN pows pw ON pw.k = 15 - j.j
        |  GROUP BY doc_id, text, p
        |), cuts AS (
        |  SELECT doc_id, text, CAST(p AS INT) AS cut FROM h WHERE hv % 32 = 0
        |), spans AS (
        |  SELECT doc_id, text,
        |    coalesce(lag(cut) OVER (PARTITION BY doc_id ORDER BY cut) + 1, 1)
        |      AS start,
        |    cut AS fin
        |  FROM cuts
        |  UNION ALL
        |  SELECT d.doc_id, d.text, coalesce(mx.m + 1, 1) AS start,
        |    length(d.text) AS fin
        |  FROM documents d
        |  LEFT JOIN (SELECT doc_id, max(cut) AS m FROM cuts GROUP BY doc_id) mx
        |    ON mx.doc_id = d.doc_id
        |  WHERE coalesce(mx.m, 0) < length(d.text)
        |)
        |SELECT doc_id,
        |  CAST(row_number() OVER (PARTITION BY doc_id ORDER BY start) - 1
        |    AS INT) AS chunk_idx,
        |  CAST(start AS INT) AS start, CAST(fin - start + 1 AS INT) AS len,
        |  md5(substr(text, CAST(start AS INT), CAST(fin - start + 1 AS INT)))
        |    AS chunk_hash
        |FROM spans
        |ORDER BY doc_id, chunk_idx""".stripMargin,

    "q26_binary_stats" ->
      """SELECT doc_id,
        |  ['png','jpeg','webp'][CAST(doc_id % 3 + 1 AS INT)] AS format,
        |  CAST(64 * (doc_id % 4 + 1) AS INT) AS width,
        |  CAST(64 * (doc_id % 3 + 1) AS INT) AS height,
        |  CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        |  sha256(text) AS sha256,
        |  md5(text) AS md5,
        |  substr(base64(encode(text)), 1, 24) AS b64_head,
        |  hex(encode(substr(text, 1, 8))) AS hex_head,
        |  CAST(floor(64*(doc_id%4+1) * least(1.0,
        |    128.0/greatest(64*(doc_id%4+1), 64*(doc_id%3+1)))) AS INT) AS out_w,
        |  CAST(floor(64*(doc_id%3+1) * least(1.0,
        |    128.0/greatest(64*(doc_id%4+1), 64*(doc_id%3+1)))) AS INT) AS out_h
        |FROM documents ORDER BY doc_id""".stripMargin,

    // NOTE (oracle fidelity): the Spark side slices the binary payload
    // by BYTES (substr/length on BinaryType) while this oracle slices
    // the source TEXT by characters and then encodes — identical only
    // because the synthetic corpus is pure ASCII (1 byte = 1 char). On
    // non-ASCII data the byte-wise Spark semantics are the intended
    // contract (frames address media payloads, not code points).
    "q27_frame_sample" ->
      """WITH pos AS (
        |  SELECT doc_id, text,
        |    unnest(generate_series(1, length(text), 64)) AS p,
        |    generate_subscripts(generate_series(1, length(text), 64), 1) - 1
        |      AS frame_idx
        |  FROM documents
        |)
        |SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
        |  CAST(octet_length(encode(substr(text, CAST(p AS INT), 32))) AS INT)
        |    AS frame_bytes,
        |  hex(encode(substr(text, CAST(p AS INT), 32))) AS frame_hex
        |FROM pos ORDER BY doc_id, frame_idx""".stripMargin,

    "q84_mixture_sample" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
        |  FROM documents
        |), t AS (
        |  SELECT source, CAST(SUM(tok) AS BIGINT) AS tok_s,
        |    CAST(TRY_CAST(regexp_extract(source, '(\d+)$', 1) AS INT) % 4 + 1
        |      AS DOUBLE) AS w
        |  FROM d GROUP BY source
        |), r AS (
        |  SELECT source,
        |    least(1.0, 15000.0 * w / (SELECT SUM(w) FROM t) / tok_s) AS rate
        |  FROM t
        |), kept AS (
        |  SELECT d.source, r.rate, d.tok
        |  FROM d JOIN r ON r.source = d.source
        |  WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))
        |          AS BIGINT) / 4294967296.0 < r.rate
        |)
        |SELECT source, round(rate, 6) AS rate, count(*) AS n_kept,
        |  CAST(SUM(tok) AS BIGINT) AS tok_kept
        |FROM kept GROUP BY source, rate ORDER BY source""".stripMargin,

    // Same seeded-md5 minhash machinery as q16, run over BOTH corpora;
    // candidates restricted to new×old; survivors anti-join out.
    "q87_incremental_dedup" ->
      """WITH docs AS (
        |  SELECT doc_id, text FROM documents
        |), inc AS (
        |  SELECT doc_id + 100000 AS doc_id, text FROM docs
        |  WHERE doc_id % 50 = 0
        |  UNION ALL
        |  SELECT doc_id + 200000,
        |    array_to_string(list_reverse(string_split(text, ' ')), ' ')
        |  FROM docs WHERE doc_id % 50 = 25
        |), both_sides AS (
        |  SELECT 'old' AS side, doc_id, text FROM docs
        |  UNION ALL
        |  SELECT 'new', doc_id, text FROM inc
        |), toks AS (
        |  SELECT side, doc_id, string_split(text, ' ') AS w FROM both_sides
        |), idx AS (
        |  SELECT side, doc_id, w, unnest(generate_series(1, len(w)-2)) AS i
        |  FROM toks
        |), sh AS (
        |  SELECT DISTINCT side, doc_id,
        |    w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
        |  FROM idx
        |), mh AS (
        |  SELECT side, doc_id, s.seed,
        |    min(CAST(('0x' || substr(
        |      md5(CAST(s.seed AS VARCHAR) || ':' || shingle), 1, 15)) AS BIGINT))
        |      AS mh
        |  FROM sh CROSS JOIN (SELECT unnest(generate_series(0,7)) AS seed) s
        |  GROUP BY side, doc_id, s.seed
        |), bands AS (
        |  SELECT side, doc_id, seed // 2 AS band,
        |    string_agg(CAST(mh AS VARCHAR), '|' ORDER BY seed) AS sig
        |  FROM mh GROUP BY side, doc_id, seed // 2
        |), cand AS (
        |  SELECT DISTINCT n.doc_id AS new_id, o.doc_id AS old_id
        |  FROM bands n
        |  JOIN bands o ON n.band = o.band AND n.sig = o.sig
        |    AND n.side = 'new' AND o.side = 'old'
        |), matched AS (
        |  SELECT DISTINCT c.new_id
        |  FROM cand c
        |  JOIN mh ma ON ma.side = 'new' AND ma.doc_id = c.new_id
        |  JOIN mh mb ON mb.side = 'old' AND mb.doc_id = c.old_id
        |    AND mb.seed = ma.seed
        |  GROUP BY c.new_id, c.old_id
        |  HAVING CAST(count(*) FILTER (ma.mh = mb.mh) AS DOUBLE) / 8.0 >= 0.5
        |)
        |SELECT doc_id FROM inc
        |WHERE doc_id NOT IN (SELECT new_id FROM matched)
        |ORDER BY doc_id""".stripMargin,

    // q20/q21's seeded-md5 SRP machinery over both corpora; pairs
    // restricted to new×old buckets.
    "q89_cross_embed_neardup" ->
      """WITH emb AS (
        |  SELECT vec_id, embedding FROM embeddings
        |), inc AS (
        |  SELECT vec_id + 10000 AS vec_id, embedding FROM emb
        |  WHERE vec_id % 10 = 0
        |  UNION ALL
        |  SELECT vec_id + 20000, list_transform(embedding, x -> -x)
        |  FROM emb WHERE vec_id % 10 = 5
        |), el_old AS (
        |  SELECT vec_id, generate_subscripts(embedding,1)-1 AS d,
        |    unnest(embedding)::DOUBLE AS x
        |  FROM emb
        |), el_new AS (
        |  SELECT vec_id, generate_subscripts(embedding,1)-1 AS d,
        |    unnest(embedding)::DOUBLE AS x
        |  FROM inc
        |), comp_old AS (
        |  SELECT vec_id, p.p,
        |    SUM(x * CASE WHEN (
        |      CASE WHEN ascii(substr(md5(CAST(p.p AS VARCHAR) || ':' || CAST(d AS VARCHAR)),1,1)) <= 57
        |           THEN ascii(substr(md5(CAST(p.p AS VARCHAR) || ':' || CAST(d AS VARCHAR)),1,1)) - 48
        |           ELSE ascii(substr(md5(CAST(p.p AS VARCHAR) || ':' || CAST(d AS VARCHAR)),1,1)) - 87
        |      END) < 8 THEN 1.0 ELSE -1.0 END) AS s
        |  FROM el_old CROSS JOIN (SELECT unnest(generate_series(0,7)) AS p) p
        |  GROUP BY vec_id, p.p
        |), comp_new AS (
        |  SELECT vec_id, p.p,
        |    SUM(x * CASE WHEN (
        |      CASE WHEN ascii(substr(md5(CAST(p.p AS VARCHAR) || ':' || CAST(d AS VARCHAR)),1,1)) <= 57
        |           THEN ascii(substr(md5(CAST(p.p AS VARCHAR) || ':' || CAST(d AS VARCHAR)),1,1)) - 48
        |           ELSE ascii(substr(md5(CAST(p.p AS VARCHAR) || ':' || CAST(d AS VARCHAR)),1,1)) - 87
        |      END) < 8 THEN 1.0 ELSE -1.0 END) AS s
        |  FROM el_new CROSS JOIN (SELECT unnest(generate_series(0,7)) AS p) p
        |  GROUP BY vec_id, p.p
        |), b_old AS (
        |  SELECT vec_id,
        |    string_agg(CASE WHEN s > 0 THEN '1' ELSE '0' END, '' ORDER BY p)
        |      AS bucket
        |  FROM comp_old GROUP BY vec_id
        |), b_new AS (
        |  SELECT vec_id,
        |    string_agg(CASE WHEN s > 0 THEN '1' ELSE '0' END, '' ORDER BY p)
        |      AS bucket
        |  FROM comp_new GROUP BY vec_id
        |), nrm_old AS (
        |  SELECT vec_id, sqrt(SUM(x*x)) AS n FROM el_old GROUP BY vec_id
        |), nrm_new AS (
        |  SELECT vec_id, sqrt(SUM(x*x)) AS n FROM el_new GROUP BY vec_id
        |), pairs AS (
        |  SELECT n.vec_id AS new_id, o.vec_id AS old_id
        |  FROM b_new n JOIN b_old o ON n.bucket = o.bucket
        |), dots AS (
        |  SELECT p.new_id, p.old_id, SUM(ea.x * eb.x) AS dp
        |  FROM pairs p
        |  JOIN el_new ea ON ea.vec_id = p.new_id
        |  JOIN el_old eb ON eb.vec_id = p.old_id AND eb.d = ea.d
        |  GROUP BY 1, 2
        |)
        |SELECT d.new_id, d.old_id, round(d.dp/(nn.n*no.n), 6) + 0.0 AS cosine
        |FROM dots d
        |JOIN nrm_new nn ON nn.vec_id = d.new_id
        |JOIN nrm_old no ON no.vec_id = d.old_id
        |WHERE nn.n > 0 AND no.n > 0 AND d.dp/(nn.n*no.n) >= 0.35
        |ORDER BY new_id, old_id""".stripMargin,

    "q152_dsir_select" ->
      """WITH toks AS (
        |  SELECT doc_id, source IN ('src0', 'src1') AS tgt,
        |    string_split(text, ' ') AS t
        |  FROM documents
        |), grams AS (
        |  SELECT doc_id, tgt, unnest(t) AS g FROM toks
        |  UNION ALL
        |  SELECT doc_id, tgt, t[i] || ' ' || t[i + 1] AS g
        |  FROM (SELECT doc_id, tgt, t,
        |          unnest(generate_series(1, len(t) - 1)) AS i
        |        FROM toks WHERE len(t) >= 2)
        |), bk AS (
        |  SELECT doc_id, tgt, substr(md5(g), 1, 2) AS b FROM grams
        |), per_doc AS (
        |  SELECT doc_id, b, tgt, COUNT(*) AS cnt FROM bk GROUP BY 1, 2, 3
        |), model AS (
        |  SELECT b,
        |    SUM(CASE WHEN tgt THEN cnt ELSE 0 END) AS ct,
        |    SUM(cnt) AS cr
        |  FROM per_doc GROUP BY b
        |), tot AS (
        |  SELECT CAST(SUM(ct) AS DOUBLE) AS nt, CAST(SUM(cr) AS DOUBLE) AS nr
        |  FROM model
        |)
        |SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_grams,
        |  round(SUM(CAST(cnt AS DOUBLE) *
        |    (ln((CAST(ct AS DOUBLE) + 1.0) / (nt + 256.0)) -
        |     ln((CAST(cr AS DOUBLE) + 1.0) / (nr + 256.0)))), 6) AS log_weight
        |FROM per_doc JOIN model USING (b) CROSS JOIN tot
        |GROUP BY doc_id
        |ORDER BY log_weight DESC, doc_id
        |LIMIT 50""".stripMargin,

    "q153_pattern_search" ->
      patternSearchOracle(searchPattern, limitK = Some(25)),

    "q154_pattern_matches" ->
      patternSearchOracle(searchPattern, maxDist = Some(1.4)),

    "q159_pattern_m12" ->
      patternSearchOracle(searchPatternM12, limitK = Some(20)),

    // Recursive CTE replays ewma's exact per-key fold (base = first
    // row by (ts, tie), step joins rn+1). MATERIALIZED per the q123
    // rule: the step references the base table every iteration.
    "q163_ewma_twin" ->
      """WITH RECURSIVE ord AS MATERIALIZED (
        |  SELECT user_id AS key, ts, event_id AS tie,
        |    CAST(value AS DOUBLE) AS x,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY ts, event_id) AS rn
        |  FROM events
        |), r AS (
        |  SELECT key, ts, tie, x, x AS ewma,
        |    CAST(NULL AS DOUBLE) AS residual, rn
        |  FROM ord WHERE rn = 1
        |  UNION ALL
        |  SELECT o.key, o.ts, o.tie, o.x,
        |    0.25 * o.x + 0.75 * r.ewma AS ewma,
        |    o.x - r.ewma AS residual, o.rn
        |  FROM r JOIN ord o ON o.key = r.key AND o.rn = r.rn + 1
        |)
        |SELECT key, ts, tie, x AS value,
        |  floor(ewma * 1000000.0) / 1000000.0 AS ewma,
        |  floor(residual * 1000000.0) / 1000000.0 AS residual
        |FROM r ORDER BY key, ts, tie""".stripMargin,

    // Same recursive replay for the clamped CUSUM fold; the carried
    // state is the POST-reset pair (alarm zeroes both accumulators),
    // emitted values are pre-reset — exactly the operator's contract.
    "q164_cusum_twin" ->
      """WITH RECURSIVE ord AS MATERIALIZED (
        |  SELECT user_id AS key, ts, event_id AS tie,
        |    CAST(value AS DOUBLE) AS x,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY ts, event_id) AS rn
        |  FROM events
        |), r AS (
        |  SELECT key, ts, tie, x,
        |    greatest(0.0, 0.0 + (x - 50.0 - 0.5)) AS s_pos,
        |    greatest(0.0, 0.0 - (x - 50.0) - 0.5) AS s_neg,
        |    (greatest(0.0, 0.0 + (x - 50.0 - 0.5)) > 8.0 OR
        |     greatest(0.0, 0.0 - (x - 50.0) - 0.5) > 8.0) AS alarm,
        |    rn
        |  FROM ord WHERE rn = 1
        |  UNION ALL
        |  SELECT o.key, o.ts, o.tie, o.x,
        |    greatest(0.0, (CASE WHEN r.alarm THEN 0.0 ELSE r.s_pos END)
        |      + (o.x - 50.0 - 0.5)) AS s_pos,
        |    greatest(0.0, (CASE WHEN r.alarm THEN 0.0 ELSE r.s_neg END)
        |      - (o.x - 50.0) - 0.5) AS s_neg,
        |    (greatest(0.0, (CASE WHEN r.alarm THEN 0.0 ELSE r.s_pos END)
        |       + (o.x - 50.0 - 0.5)) > 8.0 OR
        |     greatest(0.0, (CASE WHEN r.alarm THEN 0.0 ELSE r.s_neg END)
        |       - (o.x - 50.0) - 0.5) > 8.0) AS alarm,
        |    o.rn
        |  FROM r JOIN ord o ON o.key = r.key AND o.rn = r.rn + 1
        |)
        |SELECT key, ts, tie, x AS value, round(s_pos, 6) AS s_pos,
        |  round(s_neg, 6) AS s_neg, alarm
        |FROM r ORDER BY key, ts, tie""".stripMargin,

    "q162_repetition_signals" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |), b AS (
        |  SELECT doc_id, CAST(len(w) AS INT) AS n_tokens FROM toks
        |), g2 AS (
        |  SELECT doc_id, w[i] || ' ' || w[i+1] AS g
        |  FROM (SELECT doc_id, w,
        |          unnest(generate_series(1, len(w)-1)) AS i FROM toks)
        |), c2 AS (
        |  SELECT doc_id, MAX(c) AS top2 FROM (
        |    SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY 1, 2)
        |  GROUP BY 1
        |), g3 AS (
        |  SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
        |  FROM (SELECT doc_id, w,
        |          unnest(generate_series(1, len(w)-2)) AS i FROM toks)
        |), c3 AS (
        |  SELECT doc_id,
        |    CAST(SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT) AS dup3
        |  FROM (SELECT doc_id, g, count(*) AS c FROM g3 GROUP BY 1, 2)
        |  GROUP BY 1
        |)
        |SELECT b.doc_id, b.n_tokens,
        |  COALESCE(c2.top2, 0) AS top_bigram_n,
        |  CASE WHEN b.n_tokens >= 2
        |       THEN round((COALESCE(c2.top2, 0) * 2.0) / b.n_tokens, 6)
        |       ELSE 0.0 END AS top_bigram_share,
        |  COALESCE(c3.dup3, 0) AS dup_trigram_pos,
        |  CASE WHEN b.n_tokens >= 3
        |       THEN round(CAST(COALESCE(c3.dup3, 0) AS DOUBLE)
        |                  / (b.n_tokens - 2), 6)
        |       ELSE 0.0 END AS dup_trigram_frac
        |FROM b LEFT JOIN c2 USING (doc_id) LEFT JOIN c3 USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    "q160_sessionize_twin" ->
      """WITH e AS (
        |  SELECT user_id, ts,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
        |  FROM events
        |), f AS (
        |  SELECT user_id, ts,
        |    CASE WHEN prev_ts IS NOT NULL
        |          AND date_diff('microsecond', prev_ts, ts) > 600000000
        |         THEN 1 ELSE 0 END AS gap_open
        |  FROM e
        |), g AS (
        |  SELECT user_id, ts,
        |    SUM(gap_open) OVER (PARTITION BY user_id ORDER BY ts) + 1
        |      AS session_seq
        |  FROM f
        |)
        |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
        |  COUNT(*) AS n_events,
        |  MIN(ts) AS session_start, MAX(ts) AS session_end,
        |  date_diff('microsecond', MIN(ts), MAX(ts)) AS dur_us
        |FROM g GROUP BY user_id, session_seq
        |ORDER BY user_id, session_seq""".stripMargin,

    "q161_dedup_twin" ->
      """WITH all_docs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000, text FROM documents WHERE doc_id % 50 = 0
        |), g AS (
        |  SELECT doc_id, md5(text) AS content_hash,
        |    row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        |  FROM all_docs
        |)
        |SELECT doc_id, content_hash FROM g WHERE rn = 1
        |ORDER BY doc_id""".stripMargin,

    // Explicit epoch-aligned window expansion: slide 15 min, width
    // 1 h ⇒ each event joins its 4 containing windows (all k=0..3
    // starts floor(us/slide)·slide − k·slide satisfy ws ≤ us <
    // ws + 1h because the in-slide remainder is < one slide).
    // The broadcast left join as plain SQL; dim filtered to active
    // accounts so unmatched users carry NULL dim columns.
    "q208_static_enrich_twin" ->
      """SELECT e.event_id, e.user_id AS c_custkey, e.event_type, e.value,
        |  c.c_nationkey AS dim_c_nationkey,
        |  c.c_mktsegment AS dim_c_mktsegment
        |FROM events e
        |LEFT JOIN (SELECT * FROM customer WHERE c_acctbal > 0) c
        |  ON e.user_id = c.c_custkey
        |ORDER BY e.event_id""".stripMargin,

    "q165_windowed_counts_twin" ->
      """WITH e AS (
        |  SELECT epoch_us(ts) AS us, event_type FROM events
        |), w AS (
        |  SELECT (us // 900000000) * 900000000 - k.k * 900000000 AS ws,
        |    event_type
        |  FROM e, generate_series(0, 3) AS k(k)
        |)
        |SELECT make_timestamp(ws) AS window_start,
        |  make_timestamp(ws + 3600000000) AS window_end,
        |  event_type, CAST(count(*) AS BIGINT) AS n_events
        |FROM w GROUP BY 1, 2, 3
        |ORDER BY window_start, event_type""".stripMargin,

    "q168_interval_join_twin" ->
      """SELECT l.user_id, l.ts, l.event_id,
        |  r.ts AS right_ts, r.event_id AS right_event_id
        |FROM events l JOIN events r
        |  ON r.user_id = l.user_id
        | AND l.event_type = 'purchase' AND r.event_type = 'view'
        | AND r.ts >= l.ts - INTERVAL 14400 SECOND AND r.ts <= l.ts
        |ORDER BY l.user_id, l.event_id, right_event_id""".stripMargin,

    // X20: the outer twin replay — LEFT JOIN with the interval
    // predicate in the ON clause (filters in WHERE would drop the
    // NULL rows the outer join exists to keep).
    "q308_interval_join_outer_twin" ->
      """SELECT l.user_id, l.ts, l.event_id,
        |  r.ts AS right_ts, r.event_id AS right_event_id
        |FROM (SELECT user_id, ts, event_id FROM events
        |      WHERE event_type = 'purchase') l
        |LEFT JOIN (SELECT user_id, ts, event_id FROM events
        |      WHERE event_type = 'view') r
        |  ON r.user_id = l.user_id
        | AND r.ts >= l.ts - INTERVAL 3600 SECOND AND r.ts <= l.ts
        |ORDER BY l.user_id NULLS FIRST, l.event_id NULLS FIRST,
        |  right_event_id NULLS FIRST""".stripMargin,

    // Replays the identical floor-grid integer co-moments (HUGEINT
    // sums are exact like the engine's DECIMAL(38,0)) and the same
    // fixed double-op finish; exact-integer → double conversion is
    // IEEE round-to-nearest on both engines, so the values agree
    // even past 2^53.
    "q167_embed_covariance" ->
      """WITH clean AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  WHERE len(list_filter(embedding, x -> x IS NULL)) = 0
        |), el AS (
        |  SELECT vec_id,
        |    CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS i,
        |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000.0)
        |      AS BIGINT) AS q
        |  FROM clean
        |), sums AS (
        |  SELECT a.i AS i, b.i AS j,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(SUM(a.q) AS DOUBLE) AS sx,
        |    CAST(SUM(b.q) AS DOUBLE) AS sy,
        |    CAST(SUM(a.q * b.q) AS DOUBLE) AS sxy,
        |    CAST(SUM(a.q * a.q) AS DOUBLE) AS sxx,
        |    CAST(SUM(b.q * b.q) AS DOUBLE) AS syy
        |  FROM el a JOIN el b ON b.vec_id = a.vec_id AND b.i >= a.i
        |  GROUP BY 1, 2
        |)
        |SELECT i AS dim_i, j AS dim_j, n,
        |  CASE WHEN n >= 2 THEN
        |    round((CAST(n AS DOUBLE) * sxy - sx * sy)
        |      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))
        |      / 1000000000000.0, 6) + 0.0 END AS cov,
        |  CASE WHEN n >= 2
        |        AND CAST(n AS DOUBLE) * sxx - sx * sx > 0.0
        |        AND CAST(n AS DOUBLE) * syy - sy * sy > 0.0 THEN
        |    round((CAST(n AS DOUBLE) * sxy - sx * sy)
        |      / sqrt((CAST(n AS DOUBLE) * sxx - sx * sx)
        |           * (CAST(n AS DOUBLE) * syy - sy * sy)), 6) + 0.0
        |    END AS corr
        |FROM sums ORDER BY dim_i, dim_j""".stripMargin,

    // Generated CTE chain replaying the quantized eigensolve — see
    // pcaOracleSql; parameters MUST match the q195 query entry.
    "q195_pca_components" -> pcaOracleSql(k = 3, iters = 20),

    // Generated CTE chain replaying farthest-point seeding + Lloyd
    // rounds — see kmeansOracleSql; parameters MUST match the q200
    // query entry (k = 4, maxIter = 3, tol = 0).
    "q200_kmeans_train" -> kmeansOracleSql(k = 4, iters = 3),

    // Per-subspace q200 replay over the sliced embedding — see
    // pqTrainOracleSql; parameters MUST match the q260 query entry
    // (m = 4, k = 4, maxIter = 2, tol = 0, 64 dims).
    "q260_pq_train" -> pqTrainOracleSql(m = 4, k = 4, iters = 2, dims = 64),

    // Generated CTE chains replaying BPE training (and the encode
    // join) — see bpeOracleChain; numMerges MUST match the q202/q203
    // query entries (12).
    "q202_bpe_merges" -> bpeMergesOracleSql(numMerges = 12),
    "q330_unigram_lm" -> unigramLmOracleSql(rounds = 3,
      multiKeep = 24, maxWordLen = 12, seedMaxPieceLen = 4,
      minCount = 2L),
    "q333_unigram_encode" -> unigramLmEncodeOracleSql(rounds = 3,
      multiKeep = 24, maxWordLen = 12, seedMaxPieceLen = 4,
      minCount = 2L),
    // q262 = trainBatched vs the SAME sequential replay: the batched
    // trainer's exactness guard is the claim under test.
    "q262_bpe_batched" -> bpeMergesOracleSql(numMerges = 12),

    // G8 on the loose near-dup graph: q248's moment/finish tail over
    // the single-hash-band edge head.
    "q264_neardup_assortativity" ->
      s"""WITH $looseCandidateEdgesHead,
         |nb AS MATERIALIZED (
         |  SELECT lo AS node, hi AS nbr FROM e0
         |  UNION ALL SELECT hi AS node, lo AS nbr FROM e0
         |), deg AS MATERIALIZED (
         |  SELECT node, COUNT(*) AS degree FROM nb GROUP BY node
         |), j AS (
         |  SELECT d1.degree AS dx, d2.degree AS dy
         |  FROM nb JOIN deg d1 ON d1.node = nb.node
         |  JOIN deg d2 ON d2.node = nb.nbr
         |), es AS (
         |  SELECT COUNT(*) AS mm,
         |    SUM(CAST(dx AS DECIMAL(38,0))) AS sx,
         |    SUM(CAST(dy AS DECIMAL(38,0))) AS sy,
         |    SUM(CAST(dx * dy AS DECIMAL(38,0))) AS sxy,
         |    SUM(CAST(dx * dx AS DECIMAL(38,0))) AS sxx,
         |    SUM(CAST(dy * dy AS DECIMAL(38,0))) AS syy
         |  FROM j
         |), ns AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
         |    CAST(MAX(degree) AS BIGINT) AS max_degree
         |  FROM deg
         |), em AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM e0
         |), f AS (
         |  SELECT n_nodes, n_edges, max_degree, mm,
         |    CAST(sxy AS DOUBLE) / CAST(mm AS DOUBLE)
         |      - (CAST(sx AS DOUBLE) / CAST(mm AS DOUBLE))
         |        * (CAST(sy AS DOUBLE) / CAST(mm AS DOUBLE)) AS num,
         |    CAST(sxx AS DOUBLE) / CAST(mm AS DOUBLE)
         |      - (CAST(sx AS DOUBLE) / CAST(mm AS DOUBLE))
         |        * (CAST(sx AS DOUBLE) / CAST(mm AS DOUBLE)) AS denx,
         |    CAST(syy AS DOUBLE) / CAST(mm AS DOUBLE)
         |      - (CAST(sy AS DOUBLE) / CAST(mm AS DOUBLE))
         |        * (CAST(sy AS DOUBLE) / CAST(mm AS DOUBLE)) AS deny
         |  FROM ns CROSS JOIN em CROSS JOIN es
         |)
         |SELECT n_nodes, n_edges, max_degree,
         |  round(CAST(2 * n_edges AS DOUBLE) / CAST(n_nodes AS DOUBLE), 6)
         |    AS avg_degree,
         |  CASE WHEN mm > 0 AND denx * deny > 0 THEN
         |    round(num / sqrt(denx * deny), 6) + 0.0 END AS assortativity
         |FROM f""".stripMargin,

    // G5 on the loose near-dup graph: q240's wedge/AA tail with the
    // via cap ACTIVE (degree <= 8).
    "q265_neardup_link_predict" ->
      s"""WITH $looseCandidateEdgesHead,
         |nb AS MATERIALIZED (
         |  SELECT lo AS node, hi AS nbr FROM e0
         |  UNION ALL SELECT hi AS node, lo AS nbr FROM e0
         |), deg AS MATERIALIZED (
         |  SELECT node, COUNT(*) AS degree FROM nb GROUP BY node
         |), via AS MATERIALIZED (
         |  SELECT nb.nbr AS via, nb.node, d.degree AS vd
         |  FROM nb JOIN deg d ON d.node = nb.nbr
         |  WHERE d.degree <= 8
         |), pairs AS MATERIALIZED (
         |  SELECT a.node AS node_a, b.node AS node_b,
         |    COUNT(*) AS cn,
         |    SUM(CAST(round(1.0 / ln(CAST(a.vd AS DOUBLE)), 12)
         |      AS DECIMAL(38,12))) AS aas
         |  FROM via a JOIN via b ON a.via = b.via AND a.node < b.node
         |  GROUP BY 1, 2
         |)
         |SELECT p.node_a, p.node_b, CAST(p.cn AS BIGINT) AS common_nbrs,
         |  round(CAST(p.aas AS DOUBLE), 6) AS adamic_adar,
         |  round(CAST(p.cn AS DOUBLE)
         |    / CAST(da.degree + db.degree - p.cn AS DOUBLE), 6)
         |    AS nbr_jaccard
         |FROM pairs p
         |JOIN deg da ON da.node = p.node_a
         |JOIN deg db ON db.node = p.node_b
         |WHERE NOT EXISTS (SELECT 1 FROM e0 e
         |  WHERE e.lo = p.node_a AND e.hi = p.node_b)
         |ORDER BY adamic_adar DESC, node_a, node_b
         |LIMIT 1000""".stripMargin,

    // Q8: exact integer/boolean summary — class table then one
    // reduce; floor band + name-tail sensitive mirror the Spark
    // derivations exactly.
    "q266_k_anonymity" ->
      """WITH cls AS (
        |  SELECT c_nationkey, c_mktsegment,
        |    CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS band,
        |    COUNT(*) AS class_size,
        |    COUNT(DISTINCT substr(c_name, length(c_name), 1))
        |      AS sens_div
        |  FROM customer GROUP BY 1, 2, 3
        |)
        |SELECT CAST(SUM(class_size) AS BIGINT) AS n_rows,
        |  COUNT(*) AS n_classes,
        |  CAST(MIN(class_size) AS BIGINT) AS effective_k,
        |  CAST(SUM(CASE WHEN class_size < 5 THEN class_size ELSE 0 END)
        |    AS BIGINT) AS rows_below_k,
        |  CAST(SUM(CASE WHEN class_size < 5 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS classes_below_k,
        |  CAST(MIN(sens_div) AS BIGINT) AS effective_l,
        |  CAST(SUM(CASE WHEN sens_div < 2 THEN class_size ELSE 0 END)
        |    AS BIGINT) AS rows_below_l,
        |  CAST(SUM(CASE WHEN sens_div < 2 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS classes_below_l,
        |  MIN(class_size) >= 5 AS k_satisfied,
        |  MIN(sens_div) >= 2 AS l_satisfied
        |FROM cls""".stripMargin,

    // D19: sorted-neighborhood candidates (row_number adjacency ≡
    // the bucketed-ordinal rank), per-field u from exact frequency
    // mass, weights as round(log2, 6) scalars — IEEE sequences
    // mirrored op for op — then the exact DECIMAL(18,6) pattern sum.
    "q267_record_linkage" ->
      """WITH rec AS (
        |  SELECT p_partkey AS id, p_name,
        |    p_brand AS f1, p_type AS f2,
        |    string_split(p_name, ' ')[1] AS f3,
        |    CAST(CAST(floor(p_retailprice / 100.0) AS BIGINT)
        |      AS VARCHAR) AS f4,
        |    CAST(p_size AS VARCHAR) AS f5
        |  FROM part
        |), rk AS (
        |  SELECT id, f1, f2, f3, f4, f5,
        |    row_number() OVER (ORDER BY p_name, id) AS rn
        |  FROM rec
        |), cand AS (
        |  SELECT DISTINCT least(a.id, b.id) AS id_a,
        |    greatest(a.id, b.id) AS id_b
        |  FROM rk a JOIN rk b ON b.rn > a.rn AND b.rn <= a.rn + 6
        |), w1 AS (
        |  SELECT CAST(round(log2(CAST(0.9 AS DOUBLE) / u), 6)
        |      AS DECIMAL(18,6)) AS wa,
        |    CAST(round(log2((CAST(1 AS DOUBLE) - CAST(0.9 AS DOUBLE))
        |      / (CAST(1 AS DOUBLE) - u)), 6) AS DECIMAL(18,6)) AS wd
        |  FROM (SELECT GREATEST(LEAST(
        |      CAST(agree AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE),
        |      CAST(1 AS DOUBLE)
        |        - CAST(1 AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE)),
        |      CAST(1 AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE)) AS u
        |    FROM (SELECT SUM(c * (c - 1)) AS agree, SUM(c) AS n
        |      FROM (SELECT f1, COUNT(*) AS c FROM rec
        |        WHERE f1 IS NOT NULL GROUP BY 1)))
        |), w2 AS (
        |  SELECT CAST(round(log2(CAST(0.85 AS DOUBLE) / u), 6)
        |      AS DECIMAL(18,6)) AS wa,
        |    CAST(round(log2((CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE))
        |      / (CAST(1 AS DOUBLE) - u)), 6) AS DECIMAL(18,6)) AS wd
        |  FROM (SELECT GREATEST(LEAST(
        |      CAST(agree AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE),
        |      CAST(1 AS DOUBLE)
        |        - CAST(1 AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE)),
        |      CAST(1 AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE)) AS u
        |    FROM (SELECT SUM(c * (c - 1)) AS agree, SUM(c) AS n
        |      FROM (SELECT f2, COUNT(*) AS c FROM rec
        |        WHERE f2 IS NOT NULL GROUP BY 1)))
        |), w3 AS (
        |  SELECT CAST(round(log2(CAST(0.8 AS DOUBLE) / u), 6)
        |      AS DECIMAL(18,6)) AS wa,
        |    CAST(round(log2((CAST(1 AS DOUBLE) - CAST(0.8 AS DOUBLE))
        |      / (CAST(1 AS DOUBLE) - u)), 6) AS DECIMAL(18,6)) AS wd
        |  FROM (SELECT GREATEST(LEAST(
        |      CAST(agree AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE),
        |      CAST(1 AS DOUBLE)
        |        - CAST(1 AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE)),
        |      CAST(1 AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE)) AS u
        |    FROM (SELECT SUM(c * (c - 1)) AS agree, SUM(c) AS n
        |      FROM (SELECT f3, COUNT(*) AS c FROM rec
        |        WHERE f3 IS NOT NULL GROUP BY 1)))
        |), w4 AS (
        |  SELECT CAST(round(log2(CAST(0.7 AS DOUBLE) / u), 6)
        |      AS DECIMAL(18,6)) AS wa,
        |    CAST(round(log2((CAST(1 AS DOUBLE) - CAST(0.7 AS DOUBLE))
        |      / (CAST(1 AS DOUBLE) - u)), 6) AS DECIMAL(18,6)) AS wd
        |  FROM (SELECT GREATEST(LEAST(
        |      CAST(agree AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE),
        |      CAST(1 AS DOUBLE)
        |        - CAST(1 AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE)),
        |      CAST(1 AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE)) AS u
        |    FROM (SELECT SUM(c * (c - 1)) AS agree, SUM(c) AS n
        |      FROM (SELECT f4, COUNT(*) AS c FROM rec
        |        WHERE f4 IS NOT NULL GROUP BY 1)))
        |), w5 AS (
        |  SELECT CAST(round(log2(CAST(0.75 AS DOUBLE) / u), 6)
        |      AS DECIMAL(18,6)) AS wa,
        |    CAST(round(log2((CAST(1 AS DOUBLE) - CAST(0.75 AS DOUBLE))
        |      / (CAST(1 AS DOUBLE) - u)), 6) AS DECIMAL(18,6)) AS wd
        |  FROM (SELECT GREATEST(LEAST(
        |      CAST(agree AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE),
        |      CAST(1 AS DOUBLE)
        |        - CAST(1 AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE)),
        |      CAST(1 AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE)) AS u
        |    FROM (SELECT SUM(c * (c - 1)) AS agree, SUM(c) AS n
        |      FROM (SELECT f5, COUNT(*) AS c FROM rec
        |        WHERE f5 IS NOT NULL GROUP BY 1)))
        |), flg AS (
        |  SELECT c.id_a, c.id_b,
        |    CASE WHEN a.f1 IS NULL OR b.f1 IS NULL THEN '-'
        |      WHEN a.f1 = b.f1 THEN '1' ELSE '0' END AS g1,
        |    CASE WHEN a.f2 IS NULL OR b.f2 IS NULL THEN '-'
        |      WHEN a.f2 = b.f2 THEN '1' ELSE '0' END AS g2,
        |    CASE WHEN a.f3 IS NULL OR b.f3 IS NULL THEN '-'
        |      WHEN a.f3 = b.f3 THEN '1' ELSE '0' END AS g3,
        |    CASE WHEN a.f4 IS NULL OR b.f4 IS NULL THEN '-'
        |      WHEN a.f4 = b.f4 THEN '1' ELSE '0' END AS g4,
        |    CASE WHEN a.f5 IS NULL OR b.f5 IS NULL THEN '-'
        |      WHEN a.f5 = b.f5 THEN '1' ELSE '0' END AS g5
        |  FROM cand c JOIN rec a ON a.id = c.id_a
        |  JOIN rec b ON b.id = c.id_b
        |)
        |SELECT f.id_a, f.id_b,
        |  g1 || g2 || g3 || g4 || g5 AS pattern,
        |  CAST((CASE WHEN g1 = '1' THEN 1 ELSE 0 END)
        |    + (CASE WHEN g2 = '1' THEN 1 ELSE 0 END)
        |    + (CASE WHEN g3 = '1' THEN 1 ELSE 0 END)
        |    + (CASE WHEN g4 = '1' THEN 1 ELSE 0 END)
        |    + (CASE WHEN g5 = '1' THEN 1 ELSE 0 END) AS BIGINT) AS n_agree,
        |  CAST(CAST(
        |    (CASE WHEN g1 = '1' THEN w1.wa WHEN g1 = '0' THEN w1.wd
        |      ELSE 0 END)
        |    + (CASE WHEN g2 = '1' THEN w2.wa WHEN g2 = '0' THEN w2.wd
        |      ELSE 0 END)
        |    + (CASE WHEN g3 = '1' THEN w3.wa WHEN g3 = '0' THEN w3.wd
        |      ELSE 0 END)
        |    + (CASE WHEN g4 = '1' THEN w4.wa WHEN g4 = '0' THEN w4.wd
        |      ELSE 0 END)
        |    + (CASE WHEN g5 = '1' THEN w5.wa WHEN g5 = '0' THEN w5.wd
        |      ELSE 0 END) AS DECIMAL(18,6)) AS DOUBLE) AS score
        |FROM flg f CROSS JOIN w1 CROSS JOIN w2 CROSS JOIN w3
        |CROSS JOIN w4 CROSS JOIN w5
        |ORDER BY score DESC, id_a, id_b
        |LIMIT 300""".stripMargin,

    "q268_hits" -> hitsOracleSql(iters = 4),

    "q269_random_projection" ->
      randomProjectOracleSql(dIn = 64, dOut = 16, seed = 7L),

    // E36: q229's z→erf-polynomial recipe on the one-proportion SRM
    // z; z signed (+0.0 after round), p from the ROUNDED z.
    "q270_srm_check" ->
      """WITH g AS (
        |  SELECT event_type, COUNT(*) AS n,
        |    CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_arm
        |  FROM events GROUP BY 1
        |), zt AS (
        |  SELECT event_type, n, n_arm,
        |    round(CAST(n_arm AS DOUBLE) / CAST(n AS DOUBLE), 6)
        |      AS observed_share,
        |    CAST(0.5 AS DOUBLE) AS expected_share,
        |    round((CAST(n_arm AS DOUBLE) - CAST(n AS DOUBLE) * 0.5)
        |      / sqrt(CAST(n AS DOUBLE) * 0.5 * (1.0 - 0.5)), 6) + 0.0
        |      AS z
        |  FROM g
        |), pt AS (
        |  SELECT *, abs(z) / sqrt(2.0) AS x,
        |    1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2.0))) AS t
        |  FROM zt
        |), pv AS (
        |  SELECT event_type, n, n_arm, observed_share, expected_share, z,
        |    round(t * (0.254829592 + t * (-0.284496736 +
        |      t * (1.421413741 + t * (-1.453152027 +
        |        t * 1.061405429)))) * exp(-(x * x)), 6) AS p_value
        |  FROM pt
        |)
        |SELECT event_type, n, n_arm, observed_share, expected_share,
        |  z, p_value, p_value < 0.001 AS srm_flag
        |FROM pv ORDER BY event_type""".stripMargin,

    // R27: key histograms joined, never the join itself; total as an
    // exact DECIMAL(38,0) string, per-key products BIGINT.
    "q271_join_fanout" ->
      """WITH la AS (
        |  SELECT l_orderkey AS key, COUNT(*) AS n_left
        |  FROM lineitem WHERE l_orderkey IS NOT NULL GROUP BY 1
        |), rb AS (
        |  SELECT l_orderkey AS key, COUNT(*) AS n_right
        |  FROM lineitem WHERE l_orderkey IS NOT NULL GROUP BY 1
        |), perkey AS (
        |  SELECT CAST(la.key AS VARCHAR) AS key,
        |    CAST(la.n_left AS BIGINT) AS n_left,
        |    CAST(rb.n_right AS BIGINT) AS n_right,
        |    CAST(la.n_left * rb.n_right AS BIGINT) AS pairs
        |  FROM la JOIN rb ON rb.key = la.key
        |), tot AS (
        |  SELECT CAST(SUM(CAST(pairs AS DECIMAL(38,0))) AS VARCHAR)
        |      AS total_pairs,
        |    COUNT(*) AS join_keys,
        |    CAST(SUM(n_left) AS BIGINT) AS matched_left_rows,
        |    CAST(SUM(n_right) AS BIGINT) AS matched_right_rows
        |  FROM perkey
        |)
        |SELECT p.key, p.n_left, p.n_right, p.pairs,
        |  t.total_pairs, t.join_keys, t.matched_left_rows,
        |  t.matched_right_rows
        |FROM perkey p CROSS JOIN tot t
        |ORDER BY p.pairs DESC, p.key
        |LIMIT 100""".stripMargin,

    // T54: union-vocab add-one unigram KLs; per-term fixed IEEE
    // sequence rounded to 12dp, exact decimal sums, round(6) finish
    // (KL >= 0 by construction — no signed-zero exposure).
    "q272_corpus_divergence" ->
      """WITH toks AS (
        |  SELECT lang AS g, unnest(string_split(text, ' ')) AS tok
        |  FROM documents WHERE lang = 'en' OR lang = 'de'
        |), counts AS (
        |  SELECT tok,
        |    CAST(SUM(CASE WHEN g = 'en' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS ca,
        |    CAST(SUM(CASE WHEN g = 'de' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS cb
        |  FROM toks GROUP BY 1
        |), tot AS (
        |  SELECT COUNT(*) AS v,
        |    CAST(SUM(ca) AS BIGINT) AS na,
        |    CAST(SUM(cb) AS BIGINT) AS nb,
        |    CAST(SUM(CASE WHEN ca > 0 AND cb > 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS shared
        |  FROM counts
        |), terms AS (
        |  SELECT
        |    CAST(round((CAST(ca + 1 AS DOUBLE) / CAST(na + v AS DOUBLE))
        |      * ln((CAST(ca + 1 AS DOUBLE) / CAST(na + v AS DOUBLE))
        |        / (CAST(cb + 1 AS DOUBLE) / CAST(nb + v AS DOUBLE))), 12)
        |      AS DECIMAL(38,12)) AS tab,
        |    CAST(round((CAST(cb + 1 AS DOUBLE) / CAST(nb + v AS DOUBLE))
        |      * ln((CAST(cb + 1 AS DOUBLE) / CAST(nb + v AS DOUBLE))
        |        / (CAST(ca + 1 AS DOUBLE) / CAST(na + v AS DOUBLE))), 12)
        |      AS DECIMAL(38,12)) AS tba
        |  FROM counts CROSS JOIN tot
        |), s AS (
        |  SELECT SUM(tab) AS kab, SUM(tba) AS kba FROM terms
        |)
        |SELECT tot.v AS vocab_size, tot.shared AS shared_vocab,
        |  tot.na AS tokens_a, tot.nb AS tokens_b,
        |  round(CAST(s.kab AS DOUBLE), 6) AS kl_ab,
        |  round(CAST(s.kba AS DOUBLE), 6) AS kl_ba
        |FROM tot CROSS JOIN s""".stripMargin,

    "q273_personalized_pagerank" ->
      pprOracleSql(iters = 4, damping = 0.85),

    // T55: q24's hit-count and argmax recipe + the entropy terms in
    // declaration order; entropy non-negative (the single-language
    // -0.0 term is absorbed by +0.0 addition on both engines).
    "q274_language_mixture" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      t -> list_contains(['the','a','of','and','is','to','in','it'], t))) AS INT) AS en_hits,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      t -> list_contains(['el','la','de','que','y','en','los','se'], t))) AS INT) AS es_hits,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      t -> list_contains(['le','la','de','et','les','des','un','une'], t))) AS INT) AS fr_hits,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      t -> list_contains(['der','die','und','das','ist','von','den','ein'], t))) AS INT) AS de_hits
        |  FROM documents
        |), g AS (
        |  SELECT doc_id, en_hits, es_hits, fr_hits, de_hits,
        |    CASE
        |      WHEN en_hits > 0 AND en_hits >= es_hits
        |        AND en_hits >= fr_hits AND en_hits >= de_hits THEN 'en'
        |      WHEN es_hits > 0 AND es_hits >= fr_hits
        |        AND es_hits >= de_hits THEN 'es'
        |      WHEN fr_hits > 0 AND fr_hits >= de_hits THEN 'fr'
        |      WHEN de_hits > 0 THEN 'de'
        |      ELSE 'und' END AS primary_lang,
        |    en_hits + es_hits + fr_hits + de_hits AS marker_total
        |  FROM f
        |), h AS (
        |  SELECT doc_id, en_hits, es_hits, fr_hits, de_hits,
        |    primary_lang, marker_total,
        |    CASE WHEN marker_total > 0 THEN round(
        |      (((CASE WHEN en_hits > 0 THEN
        |        -((CAST(en_hits AS DOUBLE) / CAST(marker_total AS DOUBLE))
        |          * ln(CAST(en_hits AS DOUBLE) / CAST(marker_total AS DOUBLE)))
        |        ELSE 0.0 END
        |      + CASE WHEN es_hits > 0 THEN
        |        -((CAST(es_hits AS DOUBLE) / CAST(marker_total AS DOUBLE))
        |          * ln(CAST(es_hits AS DOUBLE) / CAST(marker_total AS DOUBLE)))
        |        ELSE 0.0 END)
        |      + CASE WHEN fr_hits > 0 THEN
        |        -((CAST(fr_hits AS DOUBLE) / CAST(marker_total AS DOUBLE))
        |          * ln(CAST(fr_hits AS DOUBLE) / CAST(marker_total AS DOUBLE)))
        |        ELSE 0.0 END)
        |      + CASE WHEN de_hits > 0 THEN
        |        -((CAST(de_hits AS DOUBLE) / CAST(marker_total AS DOUBLE))
        |          * ln(CAST(de_hits AS DOUBLE) / CAST(marker_total AS DOUBLE)))
        |        ELSE 0.0 END), 6)
        |    ELSE 0.0 END AS mix_entropy
        |  FROM g
        |)
        |SELECT doc_id, en_hits, es_hits, fr_hits, de_hits,
        |  primary_lang, marker_total, mix_entropy,
        |  mix_entropy >= 0.35 AS is_mixed
        |FROM h ORDER BY doc_id""".stripMargin,

    // V25: q200 floor-grid per-dim means, q155 round(12) decimal
    // cross-dim sums, fixed IEEE finishes; mean_cos signed (+0.0).
    "q275_embedding_drift" ->
      """WITH clean AS (
        |  SELECT (label % 2 = 0) AS a, embedding FROM embeddings
        |  WHERE embedding IS NOT NULL AND len(embedding) = 64
        |    AND len(list_filter(embedding, x -> x IS NULL)) = 0
        |), el AS (
        |  SELECT a,
        |    CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS i,
        |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000.0)
        |      AS BIGINT) AS q
        |  FROM clean
        |), m AS (
        |  SELECT a, i,
        |    (CAST(SUM(q) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
        |      / 1000000.0 AS mn,
        |    COUNT(*) AS n
        |  FROM el GROUP BY 1, 2
        |), j AS (
        |  SELECT ma.i, ma.mn AS xa, mb.mn AS xb, ma.n AS na, mb.n AS nb
        |  FROM m ma JOIN m mb ON mb.i = ma.i AND ma.a AND NOT mb.a
        |), t AS (
        |  SELECT COUNT(*) AS dims,
        |    CAST(MAX(na) AS BIGINT) AS n_a, CAST(MAX(nb) AS BIGINT) AS n_b,
        |    SUM(CAST(round(xa * xb, 12) AS DECIMAL(38,12))) AS dot,
        |    SUM(CAST(round(xa * xa, 12) AS DECIMAL(38,12))) AS aa,
        |    SUM(CAST(round(xb * xb, 12) AS DECIMAL(38,12))) AS bb,
        |    SUM(CAST(round((xa - xb) * (xa - xb), 12) AS DECIMAL(38,12)))
        |      AS sh
        |  FROM j
        |)
        |SELECT dims, n_a, n_b,
        |  round(sqrt(CAST(aa AS DOUBLE)), 6) AS norm_mu_a,
        |  round(sqrt(CAST(bb AS DOUBLE)), 6) AS norm_mu_b,
        |  CASE WHEN aa > 0 AND bb > 0 THEN
        |    round(CAST(dot AS DOUBLE)
        |      / (sqrt(CAST(aa AS DOUBLE)) * sqrt(CAST(bb AS DOUBLE))), 6)
        |      + 0.0 END AS mean_cos,
        |  round(sqrt(CAST(sh AS DOUBLE)), 6) AS l2_shift
        |FROM t""".stripMargin,

    // E37: exact decimal unit moments per arm, fixed IEEE delta-
    // method finish mirrored op for op, z/p via the q229 recipe;
    // diff/z/ratios signed (+0.0).
    "q276_ratio_metric" ->
      """WITH units AS (
        |  SELECT event_type, user_id,
        |    SUM(CAST(value AS DECIMAL(18,6))) AS x,
        |    COUNT(*) AS y
        |  FROM events
        |  WHERE user_id IS NOT NULL AND value IS NOT NULL
        |  GROUP BY 1, 2
        |), g AS (
        |  SELECT event_type,
        |    CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_a,
        |    CAST(SUM(CASE WHEN user_id % 2 <> 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_b,
        |    SUM(CASE WHEN user_id % 2 = 0
        |      THEN CAST(x AS DECIMAL(18,6)) END) AS sxa,
        |    SUM(CASE WHEN user_id % 2 = 0
        |      THEN CAST(y AS DECIMAL(18,6)) END) AS sya,
        |    SUM(CASE WHEN user_id % 2 = 0 THEN CAST(
        |      CAST(x AS DECIMAL(28,6)) * CAST(x AS DECIMAL(28,6))
        |      AS DECIMAL(38,12)) END) AS sxxa,
        |    SUM(CASE WHEN user_id % 2 = 0 THEN CAST(
        |      CAST(y AS DECIMAL(28,6)) * CAST(y AS DECIMAL(28,6))
        |      AS DECIMAL(38,12)) END) AS syya,
        |    SUM(CASE WHEN user_id % 2 = 0 THEN CAST(
        |      CAST(x AS DECIMAL(28,6)) * CAST(y AS DECIMAL(28,6))
        |      AS DECIMAL(38,12)) END) AS sxya,
        |    SUM(CASE WHEN user_id % 2 <> 0
        |      THEN CAST(x AS DECIMAL(18,6)) END) AS sxb,
        |    SUM(CASE WHEN user_id % 2 <> 0
        |      THEN CAST(y AS DECIMAL(18,6)) END) AS syb,
        |    SUM(CASE WHEN user_id % 2 <> 0 THEN CAST(
        |      CAST(x AS DECIMAL(28,6)) * CAST(x AS DECIMAL(28,6))
        |      AS DECIMAL(38,12)) END) AS sxxb,
        |    SUM(CASE WHEN user_id % 2 <> 0 THEN CAST(
        |      CAST(y AS DECIMAL(28,6)) * CAST(y AS DECIMAL(28,6))
        |      AS DECIMAL(38,12)) END) AS syyb,
        |    SUM(CASE WHEN user_id % 2 <> 0 THEN CAST(
        |      CAST(x AS DECIMAL(28,6)) * CAST(y AS DECIMAL(28,6))
        |      AS DECIMAL(38,12)) END) AS sxyb
        |  FROM units GROUP BY 1
        |), f AS (
        |  SELECT event_type, n_a, n_b,
        |    CAST(sxa AS DOUBLE) AS sxaD, CAST(sya AS DOUBLE) AS syaD,
        |    CAST(sxxa AS DOUBLE) AS sxxaD, CAST(syya AS DOUBLE) AS syyaD,
        |    CAST(sxya AS DOUBLE) AS sxyaD,
        |    CAST(sxb AS DOUBLE) AS sxbD, CAST(syb AS DOUBLE) AS sybD,
        |    CAST(sxxb AS DOUBLE) AS sxxbD, CAST(syyb AS DOUBLE) AS syybD,
        |    CAST(sxyb AS DOUBLE) AS sxybD,
        |    CAST(n_a AS DOUBLE) AS naD, CAST(n_b AS DOUBLE) AS nbD,
        |    sya <> 0 AS oka, syb <> 0 AS okb
        |  FROM g
        |), v AS (
        |  SELECT event_type, n_a, n_b, oka, okb,
        |    sxaD / syaD AS ra, sxbD / sybD AS rb,
        |    ((sxxaD - sxaD * sxaD / naD) / (naD - 1.0)
        |      - 2.0 * (sxaD / syaD)
        |        * ((sxyaD - sxaD * syaD / naD) / (naD - 1.0))
        |      + (sxaD / syaD) * (sxaD / syaD)
        |        * ((syyaD - syaD * syaD / naD) / (naD - 1.0)))
        |      / (naD * (syaD / naD) * (syaD / naD)) AS va,
        |    ((sxxbD - sxbD * sxbD / nbD) / (nbD - 1.0)
        |      - 2.0 * (sxbD / sybD)
        |        * ((sxybD - sxbD * sybD / nbD) / (nbD - 1.0))
        |      + (sxbD / sybD) * (sxbD / sybD)
        |        * ((syybD - sybD * sybD / nbD) / (nbD - 1.0)))
        |      / (nbD * (sybD / nbD) * (sybD / nbD)) AS vb
        |  FROM f
        |), zt AS (
        |  SELECT event_type, n_a, n_b, oka, okb,
        |    CASE WHEN oka THEN round(ra, 6) + 0.0 END AS ratio_a,
        |    CASE WHEN okb THEN round(rb, 6) + 0.0 END AS ratio_b,
        |    CASE WHEN n_a >= 2 AND n_b >= 2 AND oka AND okb
        |      THEN round(ra - rb, 6) + 0.0 END AS diff,
        |    CASE WHEN n_a >= 2 AND n_b >= 2 AND oka AND okb
        |        AND va + vb > 0.0
        |      THEN round((ra - rb) / sqrt(va + vb), 6) + 0.0 END AS z
        |  FROM v
        |), pt AS (
        |  SELECT *, abs(z) / sqrt(2.0) AS xx,
        |    1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2.0))) AS tt
        |  FROM zt
        |)
        |SELECT event_type, n_a, n_b, ratio_a, ratio_b, diff, z,
        |  round(tt * (0.254829592 + tt * (-0.284496736 +
        |    tt * (1.421413741 + tt * (-1.453152027 +
        |      tt * 1.061405429)))) * exp(-(xx * xx)), 6) AS p_value
        |FROM pt ORDER BY event_type""".stripMargin,

    // E39: the q229 two-proportion recipe per null replicate; arms
    // from integer parity, z (+0.0) on the guarded se, p on the
    // rounded z.
    "q281_aa_calibration" ->
      """WITH h0t AS (
        |  SELECT r.replicate, e.value,
        |    xor(e.user_id % 2147483648,
        |      (r.replicate * 2654435761) % 2147483648) AS h0
        |  FROM events e CROSS JOIN (
        |    SELECT CAST(unnest(generate_series(1, 12)) AS INT)
        |      AS replicate) r
        |  WHERE e.user_id IS NOT NULL AND e.value IS NOT NULL
        |), h2t AS (
        |  SELECT replicate, value,
        |    (xor(h1, h1 >> 13) * 3266489917) % 2147483648 AS h2
        |  FROM (SELECT replicate, value,
        |    (xor(h0, h0 >> 16) * 2246822519) % 2147483648 AS h1
        |    FROM h0t)
        |), armt AS (
        |  SELECT replicate, value,
        |    xor(h2, h2 >> 16) % 2 = 0 AS arm
        |  FROM h2t
        |), g AS (
        |  SELECT replicate,
        |    CAST(SUM(CASE WHEN arm THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(SUM(CASE WHEN NOT arm THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_b,
        |    CAST(SUM(CASE WHEN arm AND value >= 0.5
        |      THEN 1 ELSE 0 END) AS BIGINT) AS conv_a,
        |    CAST(SUM(CASE WHEN NOT arm AND value >= 0.5
        |      THEN 1 ELSE 0 END) AS BIGINT) AS conv_b
        |  FROM armt
        |  GROUP BY 1
        |), zt AS (
        |  SELECT replicate, n_a, n_b, conv_a, conv_b,
        |    CASE WHEN n_a > 0 AND n_b > 0 AND
        |      sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
        |        * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
        |        * (1.0 / n_a + 1.0 / n_b)) > 0
        |    THEN round(
        |      (CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
        |      / sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
        |        * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
        |        * (1.0 / n_a + 1.0 / n_b)), 6) + 0.0 END AS z
        |  FROM g
        |), pt AS (
        |  SELECT *, abs(z) / sqrt(2.0) AS x,
        |    1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2.0))) AS t
        |  FROM zt
        |), pv AS (
        |  SELECT replicate, n_a, n_b, conv_a, conv_b, z,
        |    round(t * (0.254829592 + t * (-0.284496736 +
        |      t * (1.421413741 + t * (-1.453152027 +
        |        t * 1.061405429)))) * exp(-(x * x)), 6) AS p_value
        |  FROM pt
        |)
        |SELECT replicate, n_a, n_b, conv_a, conv_b, z, p_value,
        |  p_value < 0.05 AS significant
        |FROM pv ORDER BY replicate""".stripMargin,

    // M4: the oracle reproduces the decode features from the
    // syntheticBmp pixel formula — integer channel sums over the
    // 8x8 grid, one exact division; the corrupt row unions in as
    // the decode_ok=false/NULL-features twin.
    "q283_image_decode" ->
      """WITH ids AS (
        |  SELECT CAST(p_partkey AS BIGINT) AS id FROM part
        |), px AS (
        |  SELECT id, x.x, y.y FROM ids,
        |    (SELECT unnest(range(0, 8)) AS x) x,
        |    (SELECT unnest(range(0, 8)) AS y) y
        |), s AS (
        |  SELECT id,
        |    SUM((id * 7 + 3 * x + 5 * y) % 256) AS sr,
        |    SUM((id * 11 + 2 * x + 7 * y) % 256) AS sg,
        |    SUM((id * 13 + x + 11 * y) % 256) AS sb
        |  FROM px GROUP BY 1
        |)
        |SELECT id, TRUE AS decode_ok,
        |  CAST(8 AS INT) AS width, CAST(8 AS INT) AS height,
        |  CAST(sr AS DOUBLE) / 64 AS mean_r,
        |  CAST(sg AS DOUBLE) / 64 AS mean_g,
        |  CAST(sb AS DOUBLE) / 64 AS mean_b
        |FROM s
        |UNION ALL
        |SELECT CAST(-1 AS BIGINT), FALSE, NULL, NULL, NULL, NULL, NULL
        |ORDER BY id""".stripMargin,

    // M13: the aHash arithmetic replay — luma from the pixel
    // formulas (perturbation included), floor-grid 8x8 blocks,
    // cross-multiplied global-mean bits, row-major bit string.
    "q304_image_ahash" ->
      """WITH ids AS (
        |  SELECT CAST(p_partkey AS BIGINT) AS id,
        |    CAST(p_partkey AS BIGINT) AS seed, 0 AS d FROM part
        |  UNION ALL
        |  SELECT CAST(-(p_partkey + 1) AS BIGINT),
        |    CAST(p_partkey AS BIGINT), 8 FROM part
        |  WHERE p_partkey % 10 = 0
        |), px AS (
        |  SELECT id, seed, seed % 11 AS s11, seed % 13 AS s13,
        |    seed % 7 AS s7, d, x.x, y.y FROM ids,
        |    (SELECT unnest(range(0, 16)) AS x) x,
        |    (SELECT unnest(range(0, 16)) AS y) y
        |), lum AS (
        |  SELECT id, x, y,
        |    299 * ((seed * 7 + (1 + s11) * x + (2 + s13) * y +
        |        (1 + s7) * x * y +
        |        CASE WHEN x < 2 AND y < 2 THEN d ELSE 0 END) % 256)
        |    + 587 * ((seed * 11 + (3 + s13) * x + (1 + s11) * y +
        |        (2 + s7) * x * y +
        |        CASE WHEN x < 2 AND y < 2 THEN d ELSE 0 END) % 256)
        |    + 114 * ((seed * 13 + (2 + s11) * x + (3 + s13) * y +
        |        (3 + s7) * x * y +
        |        CASE WHEN x < 2 AND y < 2 THEN d ELSE 0 END) % 256)
        |      AS luma
        |  FROM px
        |), blk AS (
        |  SELECT id, (y * 8 // 16) * 8 + (x * 8 // 16) AS bi,
        |    SUM(luma) AS s, COUNT(*) AS c
        |  FROM lum GROUP BY 1, 2
        |), tot AS (
        |  SELECT id, SUM(s) AS t, SUM(c) AS n FROM blk GROUP BY 1
        |), bits AS (
        |  SELECT b.id, b.bi,
        |    CASE WHEN b.s * t.n > t.t * b.c THEN '1' ELSE '0' END
        |      AS bit
        |  FROM blk b JOIN tot t USING (id)
        |)
        |SELECT id, TRUE AS decode_ok,
        |  string_agg(bit, '' ORDER BY bi) AS ahash
        |FROM bits GROUP BY id
        |ORDER BY id""".stripMargin,

    // M13 pairs: band join + per-character hamming over the replayed
    // hash strings; same 64-cap (inactive at gate scales).
    "q305_image_neardups" ->
      """WITH ids AS (
        |  SELECT CAST(p_partkey AS BIGINT) AS id,
        |    CAST(p_partkey AS BIGINT) AS seed, 0 AS d FROM part
        |  UNION ALL
        |  SELECT CAST(-(p_partkey + 1) AS BIGINT),
        |    CAST(p_partkey AS BIGINT), 8 FROM part
        |  WHERE p_partkey % 10 = 0
        |), px AS (
        |  SELECT id, seed, seed % 11 AS s11, seed % 13 AS s13,
        |    seed % 7 AS s7, d, x.x, y.y FROM ids,
        |    (SELECT unnest(range(0, 16)) AS x) x,
        |    (SELECT unnest(range(0, 16)) AS y) y
        |), lum AS (
        |  SELECT id, x, y,
        |    299 * ((seed * 7 + (1 + s11) * x + (2 + s13) * y +
        |        (1 + s7) * x * y +
        |        CASE WHEN x < 2 AND y < 2 THEN d ELSE 0 END) % 256)
        |    + 587 * ((seed * 11 + (3 + s13) * x + (1 + s11) * y +
        |        (2 + s7) * x * y +
        |        CASE WHEN x < 2 AND y < 2 THEN d ELSE 0 END) % 256)
        |    + 114 * ((seed * 13 + (2 + s11) * x + (3 + s13) * y +
        |        (3 + s7) * x * y +
        |        CASE WHEN x < 2 AND y < 2 THEN d ELSE 0 END) % 256)
        |      AS luma
        |  FROM px
        |), blk AS (
        |  SELECT id, (y * 8 // 16) * 8 + (x * 8 // 16) AS bi,
        |    SUM(luma) AS s, COUNT(*) AS c
        |  FROM lum GROUP BY 1, 2
        |), tot AS (
        |  SELECT id, SUM(s) AS t, SUM(c) AS n FROM blk GROUP BY 1
        |), h AS MATERIALIZED (
        |  SELECT b.id,
        |    string_agg(CASE WHEN b.s * t.n > t.t * b.c
        |      THEN '1' ELSE '0' END, '' ORDER BY b.bi) AS ahash
        |  FROM blk b JOIN tot t USING (id) GROUP BY b.id
        |), bands AS (
        |  SELECT id, ahash, ks.k,
        |    substr(ahash, 1 + 16 * ks.k, 16) AS bv
        |  FROM h, (SELECT unnest(range(0, 4)) AS k) ks
        |), cap AS (
        |  SELECT * FROM (
        |    SELECT id, ahash, k, bv, row_number() OVER (
        |      PARTITION BY k, bv ORDER BY id) AS rn
        |    FROM bands
        |  ) WHERE rn <= 64
        |), cand AS (
        |  SELECT DISTINCT a.id AS id_a, a.ahash AS ha,
        |    b.id AS id_b, b.ahash AS hb
        |  FROM cap a JOIN cap b
        |    ON a.k = b.k AND a.bv = b.bv AND a.id < b.id
        |), ham AS (
        |  SELECT id_a, id_b,
        |    CAST(SUM(CASE WHEN substr(ha, ii.i, 1) <> substr(hb, ii.i, 1)
        |      THEN 1 ELSE 0 END) AS INT) AS hamming
        |  FROM cand, (SELECT unnest(range(1, 65)) AS i) ii
        |  GROUP BY id_a, id_b
        |)
        |SELECT id_a, id_b, hamming FROM ham
        |WHERE hamming <= 3
        |ORDER BY id_a, id_b""".stripMargin,

    // D22: the EM unroll — generated materialized-CTE chain.
    "q284_linkage_em" -> fsEmOracle(
      iters = 3, m0Micro = 900000L, u0Micro = 100000L,
      lam0Micro = 100000L),

    // E40: the q276 delta-method finish per mix31 null replicate.
    "q285_aa_ratio" ->
      """WITH units AS (
        |  SELECT user_id, SUM(CAST(value AS DECIMAL(18,6))) AS x,
        |    COUNT(*) AS y
        |  FROM events
        |  WHERE user_id IS NOT NULL AND value IS NOT NULL
        |  GROUP BY 1
        |), h0t AS (
        |  SELECT r.replicate, u.x, u.y,
        |    xor(u.user_id % 2147483648,
        |      (r.replicate * 2654435761) % 2147483648) AS h0
        |  FROM units u CROSS JOIN (
        |    SELECT CAST(unnest(generate_series(1, 8)) AS INT)
        |      AS replicate) r
        |), armt AS (
        |  SELECT replicate, x, y,
        |    xor(h2, h2 >> 16) % 2 = 0 AS arm
        |  FROM (SELECT replicate, x, y,
        |      (xor(h1, h1 >> 13) * 3266489917) % 2147483648 AS h2
        |    FROM (SELECT replicate, x, y,
        |      (xor(h0, h0 >> 16) * 2246822519) % 2147483648 AS h1
        |      FROM h0t))
        |), g AS (
        |  SELECT replicate,
        |    CAST(SUM(CASE WHEN arm THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(SUM(CASE WHEN NOT arm THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_b,
        |    SUM(CASE WHEN arm THEN CAST(x AS DECIMAL(18,6)) END) AS sxa,
        |    SUM(CASE WHEN arm THEN CAST(y AS DECIMAL(18,6)) END) AS sya,
        |    SUM(CASE WHEN arm THEN CAST(
        |      CAST(x AS DECIMAL(28,6)) * CAST(x AS DECIMAL(28,6))
        |      AS DECIMAL(38,12)) END) AS sxxa,
        |    SUM(CASE WHEN arm THEN CAST(
        |      CAST(y AS DECIMAL(28,6)) * CAST(y AS DECIMAL(28,6))
        |      AS DECIMAL(38,12)) END) AS syya,
        |    SUM(CASE WHEN arm THEN CAST(
        |      CAST(x AS DECIMAL(28,6)) * CAST(y AS DECIMAL(28,6))
        |      AS DECIMAL(38,12)) END) AS sxya,
        |    SUM(CASE WHEN NOT arm THEN CAST(x AS DECIMAL(18,6)) END)
        |      AS sxb,
        |    SUM(CASE WHEN NOT arm THEN CAST(y AS DECIMAL(18,6)) END)
        |      AS syb,
        |    SUM(CASE WHEN NOT arm THEN CAST(
        |      CAST(x AS DECIMAL(28,6)) * CAST(x AS DECIMAL(28,6))
        |      AS DECIMAL(38,12)) END) AS sxxb,
        |    SUM(CASE WHEN NOT arm THEN CAST(
        |      CAST(y AS DECIMAL(28,6)) * CAST(y AS DECIMAL(28,6))
        |      AS DECIMAL(38,12)) END) AS syyb,
        |    SUM(CASE WHEN NOT arm THEN CAST(
        |      CAST(x AS DECIMAL(28,6)) * CAST(y AS DECIMAL(28,6))
        |      AS DECIMAL(38,12)) END) AS sxyb
        |  FROM armt GROUP BY 1
        |), f AS (
        |  SELECT replicate, n_a, n_b,
        |    CAST(sxa AS DOUBLE) AS sxaD, CAST(sya AS DOUBLE) AS syaD,
        |    CAST(sxxa AS DOUBLE) AS sxxaD, CAST(syya AS DOUBLE) AS syyaD,
        |    CAST(sxya AS DOUBLE) AS sxyaD,
        |    CAST(sxb AS DOUBLE) AS sxbD, CAST(syb AS DOUBLE) AS sybD,
        |    CAST(sxxb AS DOUBLE) AS sxxbD, CAST(syyb AS DOUBLE) AS syybD,
        |    CAST(sxyb AS DOUBLE) AS sxybD,
        |    CAST(n_a AS DOUBLE) AS naD, CAST(n_b AS DOUBLE) AS nbD,
        |    sya <> 0 AS oka, syb <> 0 AS okb
        |  FROM g
        |), v AS (
        |  SELECT replicate, n_a, n_b, oka, okb,
        |    sxaD / syaD AS ra, sxbD / sybD AS rb,
        |    ((sxxaD - sxaD * sxaD / naD) / (naD - 1.0)
        |      - 2.0 * (sxaD / syaD)
        |        * ((sxyaD - sxaD * syaD / naD) / (naD - 1.0))
        |      + (sxaD / syaD) * (sxaD / syaD)
        |        * ((syyaD - syaD * syaD / naD) / (naD - 1.0)))
        |      / (naD * (syaD / naD) * (syaD / naD)) AS va,
        |    ((sxxbD - sxbD * sxbD / nbD) / (nbD - 1.0)
        |      - 2.0 * (sxbD / sybD)
        |        * ((sxybD - sxbD * sybD / nbD) / (nbD - 1.0))
        |      + (sxbD / sybD) * (sxbD / sybD)
        |        * ((syybD - sybD * sybD / nbD) / (nbD - 1.0)))
        |      / (nbD * (sybD / nbD) * (sybD / nbD)) AS vb
        |  FROM f
        |), zt AS (
        |  SELECT replicate, n_a, n_b, oka, okb,
        |    CASE WHEN oka THEN round(ra, 6) + 0.0 END AS ratio_a,
        |    CASE WHEN okb THEN round(rb, 6) + 0.0 END AS ratio_b,
        |    CASE WHEN n_a >= 2 AND n_b >= 2 AND oka AND okb
        |      THEN round(ra - rb, 6) + 0.0 END AS diff,
        |    CASE WHEN n_a >= 2 AND n_b >= 2 AND oka AND okb
        |        AND va + vb > 0.0
        |      THEN round((ra - rb) / sqrt(va + vb), 6) + 0.0 END AS z
        |  FROM v
        |), pt AS (
        |  SELECT *, abs(z) / sqrt(2.0) AS xx,
        |    1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2.0))) AS tt
        |  FROM zt
        |), pv AS (
        |  SELECT replicate, n_a, n_b, ratio_a, ratio_b, diff, z,
        |    round(tt * (0.254829592 + tt * (-0.284496736 +
        |      tt * (1.421413741 + tt * (-1.453152027 +
        |        tt * 1.061405429)))) * exp(-(xx * xx)), 6) AS p_value
        |  FROM pt
        |)
        |SELECT replicate, n_a, n_b, ratio_a, ratio_b, diff, z, p_value,
        |  p_value < 0.05 AS significant
        |FROM pv ORDER BY replicate""".stripMargin,

    // E41: the q278 cumulative-look scan per mix31 null replicate,
    // reduced to the family-wise alarm summary.
    "q286_aa_sequential" ->
      """WITH h0t AS (
        |  SELECT r.replicate, CAST(ts AS DATE) AS day,
        |    xor(user_id % 2147483648,
        |      (r.replicate * 2654435761) % 2147483648) AS h0
        |  FROM events e CROSS JOIN (
        |    SELECT CAST(unnest(generate_series(1, 8)) AS INT)
        |      AS replicate) r
        |  WHERE e.ts IS NOT NULL AND e.user_id IS NOT NULL
        |), armt AS (
        |  SELECT replicate, day,
        |    xor(h2, h2 >> 16) % 2 = 0 AS arm
        |  FROM (SELECT replicate, day,
        |      (xor(h1, h1 >> 13) * 3266489917) % 2147483648 AS h2
        |    FROM (SELECT replicate, day,
        |      (xor(h0, h0 >> 16) * 2246822519) % 2147483648 AS h1
        |      FROM h0t))
        |), daily AS (
        |  SELECT replicate, day, COUNT(*) AS n0,
        |    CAST(SUM(CASE WHEN arm THEN 1 ELSE 0 END) AS BIGINT)
        |      AS narm0
        |  FROM armt GROUP BY 1, 2
        |), cum AS (
        |  SELECT replicate,
        |    CAST(row_number() OVER (PARTITION BY replicate ORDER BY day)
        |      AS INT) AS look,
        |    CAST(SUM(n0) OVER (PARTITION BY replicate ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS n,
        |    CAST(SUM(narm0) OVER (PARTITION BY replicate ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS n_arm
        |  FROM daily
        |), zt AS (
        |  SELECT replicate, look,
        |    round((CAST(n_arm AS DOUBLE) - CAST(n AS DOUBLE) * 0.5)
        |      / sqrt(CAST(n AS DOUBLE) * 0.25), 6) AS z
        |  FROM cum
        |), pv AS (
        |  SELECT replicate, look,
        |    round(t * (0.254829592 + t * (-0.284496736 +
        |      t * (1.421413741 + t * (-1.453152027 +
        |        t * 1.061405429)))) * exp(-(x * x)), 6) AS p_value
        |  FROM (SELECT *, abs(z) / sqrt(2.0) AS x,
        |    1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2.0))) AS t
        |    FROM zt)
        |), al AS (
        |  SELECT replicate, look, p_value, p_value < 0.001 AS alarm
        |  FROM pv
        |)
        |SELECT replicate, CAST(COUNT(*) AS BIGINT) AS n_looks,
        |  MIN(p_value) AS min_p, bool_or(alarm) AS any_alarm,
        |  COALESCE(MIN(CASE WHEN alarm THEN look END), 0)
        |    AS first_alarm_look
        |FROM al GROUP BY 1 ORDER BY replicate""".stripMargin,

    // M12: the oracle reproduces the decode features from the
    // syntheticWav sample formula — integer |sample| aggregates over
    // the 256-sample grid, one exact division.
    "q287_audio_decode" ->
      """WITH ids AS (
        |  SELECT CAST(p_partkey AS BIGINT) AS id FROM part
        |), sm AS (
        |  SELECT id, ((id * 31 + 7 * i) % 4001) - 2000 AS s
        |  FROM ids, (SELECT unnest(range(0, 256)) AS i) g
        |), a AS (
        |  SELECT id, MAX(ABS(s)) AS peak, SUM(ABS(s)) AS sabs
        |  FROM sm GROUP BY 1
        |)
        |SELECT id, TRUE AS decode_ok,
        |  CAST(16000 AS INT) AS sample_rate,
        |  CAST(1 AS INT) AS n_channels, CAST(16 AS INT) AS bits,
        |  CAST(256 AS BIGINT) AS n_samples, CAST(peak AS INT) AS peak,
        |  CAST(sabs AS DOUBLE) / 256 AS mean_abs
        |FROM a
        |UNION ALL
        |SELECT CAST(-1 AS BIGINT), FALSE, NULL, NULL, NULL, NULL,
        |  NULL, NULL
        |ORDER BY id""".stripMargin,

    // Q10: the DP release replay — generated threshold literals.
    "q288_dp_release" -> dpOracle(
      epsilon = 0.5, seed = 42L, clampK = 39),

    // X18: gaps-and-islands with session_window's exact boundary
    // semantics — split only on gap STRICTLY > 6h (a ==gap merges,
    // spec-pinned), end = last event + 6h, microsecond arithmetic.
    "q289_session_window" ->
      """WITH e AS (
        |  SELECT user_id, ts FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |), m AS (
        |  SELECT user_id, ts,
        |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (
        |        PARTITION BY user_id ORDER BY ts) > 21600000000
        |      THEN 1 ELSE 0 END AS brk
        |  FROM e
        |), g AS (
        |  SELECT user_id, ts,
        |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS UNBOUNDED PRECEDING) AS grp
        |  FROM m
        |)
        |SELECT user_id, MIN(ts) AS session_start,
        |  MAX(ts) + INTERVAL 6 HOUR AS session_end,
        |  CAST(COUNT(*) AS BIGINT) AS n_events
        |FROM g GROUP BY user_id, grp
        |ORDER BY user_id, session_start""".stripMargin,

    // V26: the q31 IVF replay with the probe-cell RANK kept, swept
    // over the nprobe grid, against the brute-force exact top-5.
    "q290_ivf_recall" ->
      """WITH el AS (
        |  SELECT vec_id, generate_subscripts(embedding,1) AS d,
        |         unnest(embedding)::DOUBLE AS x
        |  FROM embeddings
        |), nrm AS (
        |  SELECT vec_id, sqrt(SUM(x*x)) AS n FROM el GROUP BY vec_id
        |), seed_ids AS (
        |  SELECT vec_id AS cell_vid,
        |    CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell
        |  FROM embeddings ORDER BY vec_id LIMIT 8
        |), scell AS (
        |  SELECT s.cell, e.d, e.x, n.n
        |  FROM seed_ids s JOIN el e ON e.vec_id = s.cell_vid
        |  JOIN nrm n ON n.vec_id = s.cell_vid
        |), vc AS (
        |  SELECT e.vec_id, s.cell,
        |    SUM(e.x * s.x) / (nv.n * any_value(s.n)) AS cos
        |  FROM el e JOIN scell s ON s.d = e.d
        |  JOIN nrm nv ON nv.vec_id = e.vec_id
        |  GROUP BY e.vec_id, s.cell, nv.n
        |), assign AS (
        |  SELECT vec_id, cell FROM (
        |    SELECT vec_id, cell,
        |      row_number() OVER (PARTITION BY vec_id
        |        ORDER BY cos DESC, cell) AS rn
        |    FROM vc) WHERE rn = 1
        |), pcells AS (
        |  SELECT vec_id AS probe_id, cell, CAST(rn AS INT) AS cell_rank
        |  FROM (
        |    SELECT vec_id, cell,
        |      row_number() OVER (PARTITION BY vec_id
        |        ORDER BY cos DESC, cell) AS rn
        |    FROM vc WHERE vec_id < 8) WHERE rn <= 8
        |), cand AS (
        |  SELECT p.probe_id, a.vec_id, p.cell_rank
        |  FROM pcells p JOIN assign a ON a.cell = p.cell
        |  WHERE a.vec_id <> p.probe_id
        |), dots AS (
        |  SELECT c.probe_id, c.vec_id, c.cell_rank, SUM(ep.x * ev.x) AS dp
        |  FROM cand c
        |  JOIN el ep ON ep.vec_id = c.probe_id
        |  JOIN el ev ON ev.vec_id = c.vec_id AND ev.d = ep.d
        |  GROUP BY 1, 2, 3
        |), scored AS (
        |  SELECT d.probe_id, d.vec_id, d.cell_rank,
        |    d.dp / (np.n * nv.n) AS cosine
        |  FROM dots d JOIN nrm np ON np.vec_id = d.probe_id
        |  JOIN nrm nv ON nv.vec_id = d.vec_id
        |), sweep(nprobe) AS (VALUES (1), (2), (4), (8)),
        |approx AS (
        |  SELECT nprobe, probe_id, vec_id FROM (
        |    SELECT s.nprobe, sc.probe_id, sc.vec_id,
        |      row_number() OVER (PARTITION BY s.nprobe, sc.probe_id
        |        ORDER BY sc.cosine DESC, sc.vec_id) AS r
        |    FROM scored sc JOIN sweep s ON sc.cell_rank <= s.nprobe)
        |  WHERE r <= 5
        |), exact AS (
        |  SELECT probe_id, vec_id FROM (
        |    SELECT dd.probe_id, dd.vec_id,
        |      row_number() OVER (PARTITION BY dd.probe_id
        |        ORDER BY dd.dp / (np.n * nv.n) DESC, dd.vec_id) AS r
        |    FROM (
        |      SELECT ep.vec_id AS probe_id, ev.vec_id,
        |        SUM(ep.x * ev.x) AS dp
        |      FROM el ep JOIN el ev
        |        ON ev.d = ep.d AND ev.vec_id <> ep.vec_id
        |      WHERE ep.vec_id < 8
        |      GROUP BY 1, 2) dd
        |    JOIN nrm np ON np.vec_id = dd.probe_id
        |    JOIN nrm nv ON nv.vec_id = dd.vec_id)
        |  WHERE r <= 5
        |), et AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS exact_pairs,
        |    CAST(COUNT(DISTINCT probe_id) AS BIGINT) AS n_probes
        |  FROM exact
        |), hits AS (
        |  SELECT a.nprobe, CAST(COUNT(*) AS BIGINT) AS hit_pairs
        |  FROM approx a JOIN exact e
        |    ON e.probe_id = a.probe_id AND e.vec_id = a.vec_id
        |  GROUP BY 1
        |)
        |SELECT s.nprobe, et.n_probes, et.exact_pairs,
        |  COALESCE(h.hit_pairs, CAST(0 AS BIGINT)) AS hit_pairs,
        |  round(CAST(COALESCE(h.hit_pairs, 0) AS DOUBLE)
        |    / CAST(et.exact_pairs AS DOUBLE), 6) AS recall
        |FROM sweep s LEFT JOIN hits h ON h.nprobe = s.nprobe
        |CROSS JOIN et
        |ORDER BY s.nprobe""".stripMargin,

    // Q11: one aggregate pass, unpivoted to verdict rows; metrics
    // are integer counts + one guarded division each.
    "q291_expectations" ->
      """WITH m AS (
        |  SELECT
        |    round(CAST(COUNT(text) AS DOUBLE) / COUNT(*), 6)
        |      AS m_text_comp,
        |    round(CAST(COUNT(lang) AS DOUBLE) / COUNT(*), 6)
        |      AS m_lang_comp,
        |    round(CAST(COUNT(DISTINCT doc_id) AS DOUBLE)
        |      / COUNT(doc_id), 6) AS m_docid_uni,
        |    round(CAST(COUNT(DISTINCT source) AS DOUBLE)
        |      / COUNT(source), 6) AS m_source_uni,
        |    round(CAST(SUM(CASE WHEN n_chars BETWEEN 1 AND 100000
        |        THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(n_chars), 6)
        |      AS m_range,
        |    round(CAST(SUM(CASE WHEN regexp_matches(lang,
        |        '^[a-z]{2}$') THEN 1 ELSE 0 END) AS DOUBLE)
        |      / COUNT(lang), 6) AS m_match
        |  FROM documents
        |)
        |SELECT * FROM (
        |  SELECT 'completeness(text)' AS "check", 'text' AS "column",
        |    m_text_comp AS metric, 0.99 AS threshold,
        |    COALESCE(m_text_comp >= 0.99, FALSE) AS passed FROM m
        |  UNION ALL
        |  SELECT 'completeness(lang)', 'lang', m_lang_comp, 0.99,
        |    COALESCE(m_lang_comp >= 0.99, FALSE) FROM m
        |  UNION ALL
        |  SELECT 'unique_rate(doc_id)', 'doc_id', m_docid_uni, 1.0,
        |    COALESCE(m_docid_uni >= 1.0, FALSE) FROM m
        |  UNION ALL
        |  SELECT 'unique_rate(source)', 'source', m_source_uni, 0.5,
        |    COALESCE(m_source_uni >= 0.5, FALSE) FROM m
        |  UNION ALL
        |  SELECT 'in_range(n_chars,1.0,100000.0)', 'n_chars', m_range,
        |    0.99, COALESCE(m_range >= 0.99, FALSE) FROM m
        |  UNION ALL
        |  SELECT 'match_rate(lang)', 'lang', m_match, 0.9,
        |    COALESCE(m_match >= 0.9, FALSE) FROM m
        |) ORDER BY "check"""".stripMargin,

    // E42: q276's moment/variance CTEs, finished with the MDE
    // formula instead of the z-test.
    "q292_mde_ratio" ->
      """WITH units AS (
        |  SELECT event_type, user_id,
        |    SUM(CAST(value AS DECIMAL(18,6))) AS x,
        |    COUNT(*) AS y
        |  FROM events
        |  WHERE user_id IS NOT NULL AND value IS NOT NULL
        |  GROUP BY 1, 2
        |), g AS (
        |  SELECT event_type,
        |    CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_a,
        |    CAST(SUM(CASE WHEN user_id % 2 <> 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_b,
        |    SUM(CASE WHEN user_id % 2 = 0
        |      THEN CAST(x AS DECIMAL(18,6)) END) AS sxa,
        |    SUM(CASE WHEN user_id % 2 = 0
        |      THEN CAST(y AS DECIMAL(18,6)) END) AS sya,
        |    SUM(CASE WHEN user_id % 2 = 0 THEN CAST(
        |      CAST(x AS DECIMAL(28,6)) * CAST(x AS DECIMAL(28,6))
        |      AS DECIMAL(38,12)) END) AS sxxa,
        |    SUM(CASE WHEN user_id % 2 = 0 THEN CAST(
        |      CAST(y AS DECIMAL(28,6)) * CAST(y AS DECIMAL(28,6))
        |      AS DECIMAL(38,12)) END) AS syya,
        |    SUM(CASE WHEN user_id % 2 = 0 THEN CAST(
        |      CAST(x AS DECIMAL(28,6)) * CAST(y AS DECIMAL(28,6))
        |      AS DECIMAL(38,12)) END) AS sxya,
        |    SUM(CASE WHEN user_id % 2 <> 0
        |      THEN CAST(x AS DECIMAL(18,6)) END) AS sxb,
        |    SUM(CASE WHEN user_id % 2 <> 0
        |      THEN CAST(y AS DECIMAL(18,6)) END) AS syb,
        |    SUM(CASE WHEN user_id % 2 <> 0 THEN CAST(
        |      CAST(x AS DECIMAL(28,6)) * CAST(x AS DECIMAL(28,6))
        |      AS DECIMAL(38,12)) END) AS sxxb,
        |    SUM(CASE WHEN user_id % 2 <> 0 THEN CAST(
        |      CAST(y AS DECIMAL(28,6)) * CAST(y AS DECIMAL(28,6))
        |      AS DECIMAL(38,12)) END) AS syyb,
        |    SUM(CASE WHEN user_id % 2 <> 0 THEN CAST(
        |      CAST(x AS DECIMAL(28,6)) * CAST(y AS DECIMAL(28,6))
        |      AS DECIMAL(38,12)) END) AS sxyb
        |  FROM units GROUP BY 1
        |), f AS (
        |  SELECT event_type, n_a, n_b,
        |    CAST(sxa AS DOUBLE) AS sxaD, CAST(sya AS DOUBLE) AS syaD,
        |    CAST(sxxa AS DOUBLE) AS sxxaD, CAST(syya AS DOUBLE) AS syyaD,
        |    CAST(sxya AS DOUBLE) AS sxyaD,
        |    CAST(sxb AS DOUBLE) AS sxbD, CAST(syb AS DOUBLE) AS sybD,
        |    CAST(sxxb AS DOUBLE) AS sxxbD, CAST(syyb AS DOUBLE) AS syybD,
        |    CAST(sxyb AS DOUBLE) AS sxybD,
        |    CAST(n_a AS DOUBLE) AS naD, CAST(n_b AS DOUBLE) AS nbD,
        |    sya <> 0 AS oka, syb <> 0 AS okb
        |  FROM g
        |), v AS (
        |  SELECT event_type, n_a, n_b, oka, okb,
        |    sxaD / syaD AS ra, sxbD / sybD AS rb,
        |    ((sxxaD - sxaD * sxaD / naD) / (naD - 1.0)
        |      - 2.0 * (sxaD / syaD)
        |        * ((sxyaD - sxaD * syaD / naD) / (naD - 1.0))
        |      + (sxaD / syaD) * (sxaD / syaD)
        |        * ((syyaD - syaD * syaD / naD) / (naD - 1.0)))
        |      / (naD * (syaD / naD) * (syaD / naD)) AS va,
        |    ((sxxbD - sxbD * sxbD / nbD) / (nbD - 1.0)
        |      - 2.0 * (sxbD / sybD)
        |        * ((sxybD - sxbD * sybD / nbD) / (nbD - 1.0))
        |      + (sxbD / sybD) * (sxbD / sybD)
        |        * ((syybD - sybD * sybD / nbD) / (nbD - 1.0)))
        |      / (nbD * (sybD / nbD) * (sybD / nbD)) AS vb
        |  FROM f
        |)
        |SELECT event_type, n_a, n_b,
        |  CASE WHEN oka THEN round(ra, 6) + 0.0 END AS ratio_a,
        |  CASE WHEN okb THEN round(rb, 6) + 0.0 END AS ratio_b,
        |  CASE WHEN n_a >= 2 AND n_b >= 2 AND oka AND okb
        |      AND va + vb > 0.0
        |    THEN round((1.959964 + 0.841621) * sqrt(va + vb), 6)
        |    END AS mde_abs,
        |  CASE WHEN n_a >= 2 AND n_b >= 2 AND oka AND okb
        |      AND va + vb > 0.0 AND rb > 0.0
        |    THEN round((1.959964 + 0.841621) * sqrt(va + vb) / rb, 6)
        |    END AS mde_rel
        |FROM v ORDER BY event_type""".stripMargin,

    // E43: the PAV minimax replay — q196's score CTE, 2dp bins,
    // prefix sums, the bounded pair join, suffix-min + prefix-max.
    "q293_isotonic_fit" ->
      """WITH f AS (
        |  SELECT
        |    round((CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |           / len(string_split(text, ' '))) * 0.5
        |      + (1.0 - CAST(len(list_filter(string_split(text, ' '),
        |           t -> list_contains(['the','a','of','and','is','to'], t)))
        |           AS DOUBLE) / len(string_split(text, ' '))) * 0.5, 6) AS q,
        |    (lang = 'en') AS pos
        |  FROM documents
        |), b AS (
        |  SELECT round(q, 2) AS score_bin, COUNT(*) AS n,
        |    CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS np
        |  FROM f GROUP BY 1
        |), pre AS (
        |  SELECT score_bin, n, np,
        |    SUM(n) OVER (ORDER BY score_bin
        |      ROWS UNBOUNDED PRECEDING) AS cn,
        |    SUM(np) OVER (ORDER BY score_bin
        |      ROWS UNBOUNDED PRECEDING) AS cp,
        |    row_number() OVER (ORDER BY score_bin) AS i
        |  FROM b
        |), pairs AS (
        |  SELECT pj.i AS j, pk.i AS k,
        |    CAST(pk.cp - (pj.cp - pj.np) AS DOUBLE)
        |      / CAST(pk.cn - (pj.cn - pj.n) AS DOUBLE) AS a
        |  FROM pre pj JOIN pre pk ON pj.i <= pk.i
        |), suff AS (
        |  SELECT j, k, MIN(a) OVER (PARTITION BY j ORDER BY k DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS minA
        |  FROM pairs
        |), fit AS (
        |  SELECT k AS i, MAX(minA) AS cal FROM suff GROUP BY 1
        |)
        |SELECT p.score_bin, CAST(p.n AS BIGINT) AS n,
        |  round(CAST(p.np AS DOUBLE) / p.n, 6) AS pos_rate,
        |  round(f2.cal, 6) AS calibrated
        |FROM pre p JOIN fit f2 ON f2.i = p.i
        |ORDER BY score_bin""".stripMargin,

    // G11: the fixed-round unroll — generated CTE chain.
    "q294_hierarchy_flatten" -> hierOracle(maxDepth = 16),

    // V27: the q198 distance CTEs on the micro-quantized component
    // grid (r12 ADVICE fix) — every SUM is an exact integer
    // aggregate (products <= 10^12, HUGEINT accumulation), so
    // err² = max(0, Σq² + min(Σc² − 2Σqc)) in µ² units is
    // summation-order-free on both engines; only the final
    // mse/max divisions are IEEE.
    "q295_pq_recon_error" ->
      """WITH dims AS (
        |  SELECT CAST(len(embedding) // 4 AS INT) AS sub
        |  FROM embeddings ORDER BY vec_id LIMIT 1
        |), el AS (
        |  SELECT vec_id, CAST(generate_subscripts(embedding,1)-1 AS INT) AS d,
        |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000.0)
        |      AS BIGINT) AS q
        |  FROM embeddings
        |), seeds AS (
        |  SELECT vec_id AS sid,
        |    CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS code
        |  FROM embeddings ORDER BY vec_id LIMIT 4
        |), cb AS (
        |  SELECT CAST(e.d // (SELECT sub FROM dims) AS INT) AS s, sd.code,
        |         CAST(e.d % (SELECT sub FROM dims) AS INT) AS j, e.q AS c
        |  FROM el e JOIN seeds sd ON e.vec_id = sd.sid
        |), vd AS (
        |  SELECT v.vec_id, b.s, b.code,
        |    SUM(b.c * b.c) - 2 * SUM(v.q * b.c) AS dist
        |  FROM el v
        |  JOIN cb b ON b.s = v.d // (SELECT sub FROM dims)
        |           AND b.j = v.d % (SELECT sub FROM dims)
        |  GROUP BY 1, 2, 3
        |), nv AS (
        |  SELECT vec_id, CAST(d // (SELECT sub FROM dims) AS INT) AS s,
        |    SUM(q * q) AS n2
        |  FROM el GROUP BY 1, 2
        |), err AS (
        |  SELECT m.vec_id, m.s,
        |    CAST(GREATEST(n.n2 + m.dmin, 0) AS BIGINT) AS q
        |  FROM (SELECT vec_id, s, MIN(dist) AS dmin
        |    FROM vd GROUP BY 1, 2) m
        |  JOIN nv n ON n.vec_id = m.vec_id AND n.s = m.s
        |)
        |SELECT s AS subspace, CAST(COUNT(*) AS BIGINT) AS n_vectors,
        |  round(CAST(SUM(q) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
        |    / 1000000000000.0, 6) AS mse,
        |  round(CAST(MAX(q) AS DOUBLE) / 1000000000000.0, 6)
        |    AS max_err2
        |FROM err GROUP BY 1 ORDER BY subspace""".stripMargin,

    // Q10b: the public-domain DP release replay — literal domain +
    // generated threshold literals, zero-count groups included.
    "q296_dp_domain_release" -> dpDomainOracle(
      domain = Seq("de", "en", "es", "fr", "zh", "xx", "yy"),
      epsilon = 0.5, seed = 43L, clampK = 39),

    // Q12: the bounded-contribution DP sum replay — clamp-then-sum
    // exact BIGINTs, thresholds generated at ε/Δ.
    "q297_dp_sum_release" -> dpSumOracle(
      epsilon = 0.5, seed = 44L, clampHi = 8L, clampK = 320),

    // V28: composed IVF+PQ recall sweep — generated CTE chain (the
    // q228 ADC replay per m × the q290 routing/truth scaffolding).
    "q298_ivfpq_recall" -> ivfPqRecallOracle(
      nlist = 8, ms = Seq(2, 4), kCb = 4, nprobes = Seq(1, 2, 4, 8),
      k = 5, probeLo = 8L, probeHi = 16L),

    // T45b: batched re-mint corpus vs the SEQUENTIAL replay chain —
    // the q262 parity contract on a corpus that actually re-mints.
    "q299_bpe_remint" -> bpeMergesOracleSql(
      numMerges = 16, corpusFrom = remintCorpusSql),

    // D23: tf-adjusted weights replay — per-value agreement weights
    // joined by the agreed value, global-u disagreement.
    "q300_fellegi_tf" -> fsTfOracle(
      fields = Seq(("p_brand", 0.9), ("p_type", 0.85),
        ("name_head", 0.8)),
      window = 6, limit = 300),

    // D25: from-scratch recompute over (q48 strong edges ∪ the
    // deterministic increment) — recursive closure, min-id clusters.
    "q311_incremental_clusters" ->
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |), idx AS (
        |  SELECT doc_id, w, unnest(generate_series(1, len(w)-2)) AS i FROM toks
        |), sh AS (
        |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle FROM idx
        |), mh AS (
        |  SELECT doc_id, s.seed,
        |    min(CAST(('0x' || substr(
        |      md5(CAST(s.seed AS VARCHAR) || ':' || shingle), 1, 15)) AS BIGINT))
        |      AS mh
        |  FROM sh CROSS JOIN (SELECT unnest(generate_series(0,7)) AS seed) s
        |  GROUP BY doc_id, s.seed
        |), bands AS (
        |  SELECT doc_id, seed // 2 AS band,
        |    string_agg(CAST(mh AS VARCHAR), '|' ORDER BY seed) AS sig
        |  FROM mh GROUP BY doc_id, seed // 2
        |), cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bands a
        |  JOIN bands b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
        |), strong AS (
        |  SELECT c.doc_a, c.doc_b
        |  FROM cand c
        |  JOIN mh ma ON ma.doc_id = c.doc_a
        |  JOIN mh mb ON mb.doc_id = c.doc_b AND mb.seed = ma.seed
        |  GROUP BY c.doc_a, c.doc_b
        |  HAVING count(*) FILTER (ma.mh = mb.mh) >= 7
        |), newe AS (
        |  SELECT doc_id AS doc_a, doc_id + 100000 AS doc_b
        |  FROM documents WHERE doc_id % 50 = 0
        |  UNION
        |  SELECT d.doc_id, d.doc_id + 50
        |  FROM documents d JOIN documents e ON e.doc_id = d.doc_id + 50
        |  WHERE d.doc_id % 97 = 0
        |), edges AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM strong
        |  UNION SELECT doc_b, doc_a FROM strong
        |  UNION SELECT doc_a, doc_b FROM newe
        |  UNION SELECT doc_b, doc_a FROM newe
        |), reach(src, dst) AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN edges e ON e.src = r.dst
        |), nodes AS (SELECT DISTINCT src AS id FROM edges)
        |SELECT n.id, least(n.id, min(r.dst)) AS cluster
        |FROM nodes n LEFT JOIN reach r ON r.src = n.id
        |GROUP BY n.id ORDER BY n.id""".stripMargin,

    // T58: readability replay — identical regexp totals (RE2-common
    // patterns), guarded divisions, fixed linear chain; flesch is
    // signed -> + 0.0.
    "q309_readability" ->
      """WITH d AS (
        |  SELECT doc_id, replace(text, 'batch', 'batch.') AS text
        |  FROM documents WHERE text IS NOT NULL
        |), c AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT)
        |      AS n_words,
        |    CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT)
        |      AS n_sentences,
        |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
        |      AS BIGINT) AS n_syllables
        |  FROM d
        |)
        |SELECT doc_id, n_words, n_sentences, n_syllables,
        |  CASE WHEN n_sentences > 0 THEN
        |    round(CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE),
        |      6) END AS words_per_sentence,
        |  CASE WHEN n_words > 0 THEN
        |    round(CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE),
        |      6) END AS syllables_per_word,
        |  CASE WHEN n_sentences > 0 AND n_words > 0 THEN
        |    round(206.835
        |      - 1.015 * (CAST(n_words AS DOUBLE)
        |        / CAST(n_sentences AS DOUBLE))
        |      - 84.6 * (CAST(n_syllables AS DOUBLE)
        |        / CAST(n_words AS DOUBLE)), 6) + 0.0 END AS flesch
        |FROM c ORDER BY doc_id""".stripMargin,

    // E46: post-stratified replay — the q306 per-stratum decimal
    // moments, population weights over usable strata, per-term
    // round(12) DECIMAL(38,12) sums, one z/p finish.
    "q314_post_stratified" ->
      """WITH base AS (
        |  SELECT event_type AS s, (user_id % 3 = 0) AS a,
        |    CAST(floor("value" * 1000000) AS BIGINT) AS v
        |  FROM events
        |  WHERE event_type IS NOT NULL AND user_id IS NOT NULL
        |    AND "value" IS NOT NULL
        |), per AS (
        |  SELECT s,
        |    CAST(SUM(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS na,
        |    CAST(SUM(CASE WHEN NOT a THEN 1 ELSE 0 END) AS BIGINT)
        |      AS nb,
        |    CAST(SUM(CASE WHEN a THEN CAST(v AS DECIMAL(18,0))
        |      ELSE CAST(0 AS DECIMAL(18,0)) END) AS DECIMAL(38,0))
        |      AS sa,
        |    CAST(SUM(CASE WHEN NOT a THEN CAST(v AS DECIMAL(18,0))
        |      ELSE CAST(0 AS DECIMAL(18,0)) END) AS DECIMAL(38,0))
        |      AS sb,
        |    CAST(SUM(CASE WHEN a THEN
        |        CAST(v AS DECIMAL(18,0)) * CAST(v AS DECIMAL(18,0))
        |      ELSE CAST(0 AS DECIMAL(38,0)) END) AS DECIMAL(38,0))
        |      AS qa,
        |    CAST(SUM(CASE WHEN NOT a THEN
        |        CAST(v AS DECIMAL(18,0)) * CAST(v AS DECIMAL(18,0))
        |      ELSE CAST(0 AS DECIMAL(38,0)) END) AS DECIMAL(38,0))
        |      AS qb
        |  FROM base GROUP BY 1
        |), tot AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
        |    CAST(SUM(CASE WHEN na >= 2 AND nb >= 2 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_used,
        |    CAST(SUM(CASE WHEN na >= 2 AND nb >= 2 THEN na + nb
        |      ELSE 0 END) AS BIGINT) AS nn
        |  FROM per
        |), terms AS (
        |  SELECT p.na, p.nb,
        |    CAST(round(
        |      (CAST(p.na + p.nb AS DOUBLE) / CAST(t.nn AS DOUBLE))
        |      * (CAST(p.sa AS DOUBLE) / CAST(p.na AS DOUBLE)
        |        - CAST(p.sb AS DOUBLE) / CAST(p.nb AS DOUBLE)), 12)
        |      AS DECIMAL(38,12)) AS td,
        |    CAST(round(
        |      (CAST(p.na + p.nb AS DOUBLE) / CAST(t.nn AS DOUBLE))
        |      * (CAST(p.na + p.nb AS DOUBLE) / CAST(t.nn AS DOUBLE))
        |      * (((CAST(p.na AS DOUBLE) * CAST(p.qa AS DOUBLE)
        |            - CAST(p.sa AS DOUBLE) * CAST(p.sa AS DOUBLE))
        |          / (CAST(p.na AS DOUBLE)
        |            * (CAST(p.na AS DOUBLE) - 1.0)))
        |          / CAST(p.na AS DOUBLE)
        |        + ((CAST(p.nb AS DOUBLE) * CAST(p.qb AS DOUBLE)
        |            - CAST(p.sb AS DOUBLE) * CAST(p.sb AS DOUBLE))
        |          / (CAST(p.nb AS DOUBLE)
        |            * (CAST(p.nb AS DOUBLE) - 1.0)))
        |          / CAST(p.nb AS DOUBLE)), 12) AS DECIMAL(38,12))
        |      AS tv
        |  FROM per p, tot t
        |  WHERE p.na >= 2 AND p.nb >= 2 AND t.nn > 0
        |), met AS (
        |  SELECT CAST(SUM(na) AS BIGINT) AS n_a,
        |    CAST(SUM(nb) AS BIGINT) AS n_b,
        |    CAST(SUM(td) AS DOUBLE) AS dsum,
        |    CAST(SUM(tv) AS DOUBLE) AS vsum
        |  FROM terms
        |), zt AS (
        |  SELECT t.n_strata, t.n_used, m.n_a, m.n_b, m.dsum,
        |    CASE WHEN m.vsum > 0.0
        |      THEN round(m.dsum / sqrt(m.vsum), 6) + 0.0 END AS z
        |  FROM tot t, met m
        |), pt AS (
        |  SELECT *, abs(z) / sqrt(2.0) AS x,
        |    1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2.0))) AS t
        |  FROM zt
        |)
        |SELECT n_strata, n_used AS n_strata_used, n_a, n_b,
        |  round(dsum / 1000000.0, 6) + 0.0 AS diff, z,
        |  round(t * (0.254829592 + t * (-0.284496736 +
        |    t * (1.421413741 + t * (-1.453152027 +
        |      t * 1.061405429)))) * exp(-(x * x)), 6) AS p_value
        |FROM pt""".stripMargin,

    // V29: SQ8 replay — the same scale/encode IEEE chain, exact
    // BIGINT dots, integer-ranked.
    "q313_sq8_search" ->
      """WITH el AS (
        |  SELECT vec_id, generate_subscripts(embedding,1) AS d,
        |         unnest(embedding)::DOUBLE AS x
        |  FROM embeddings
        |), m AS (
        |  SELECT 127.0 / (CASE WHEN MAX(abs(x)) > 0.0
        |    THEN MAX(abs(x)) END) AS r FROM el
        |), enc AS (
        |  SELECT vec_id, d, CAST(floor(x * m.r + 0.5) AS BIGINT) AS c
        |  FROM el, m
        |), pr AS (
        |  SELECT vec_id AS probe_id, d, c FROM enc WHERE vec_id < 5
        |), dots AS (
        |  SELECT p.probe_id, e.vec_id,
        |    CAST(SUM(p.c * e.c) AS BIGINT) AS s
        |  FROM pr p JOIN enc e ON e.d = p.d AND e.vec_id <> p.probe_id
        |  GROUP BY 1, 2
        |)
        |SELECT probe_id, vec_id, CAST(rank AS INT) AS rank,
        |  s AS score_int
        |FROM (
        |  SELECT probe_id, vec_id, s,
        |    row_number() OVER (PARTITION BY probe_id
        |                       ORDER BY s DESC, vec_id) AS rank
        |  FROM dots)
        |WHERE rank <= 10
        |ORDER BY probe_id, rank""".stripMargin,

    // V32: q290's routing/truth scaffolding with the q313 SQ8
    // encode + exact integer candidate dots; approx rank engine-free
    // by construction (exact longs, vec_id tie-break).
    "q324_ivf_sq8_recall" ->
      """WITH el AS (
        |  SELECT vec_id, generate_subscripts(embedding,1) AS d,
        |         unnest(embedding)::DOUBLE AS x
        |  FROM embeddings
        |), nrm AS (
        |  SELECT vec_id, sqrt(SUM(x*x)) AS n FROM el GROUP BY vec_id
        |), seed_ids AS (
        |  SELECT vec_id AS cell_vid,
        |    CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell
        |  FROM embeddings ORDER BY vec_id LIMIT 8
        |), scell AS (
        |  SELECT s.cell, e.d, e.x, n.n
        |  FROM seed_ids s JOIN el e ON e.vec_id = s.cell_vid
        |  JOIN nrm n ON n.vec_id = s.cell_vid
        |), vc AS (
        |  SELECT e.vec_id, s.cell,
        |    SUM(e.x * s.x) / (nv.n * any_value(s.n)) AS cos
        |  FROM el e JOIN scell s ON s.d = e.d
        |  JOIN nrm nv ON nv.vec_id = e.vec_id
        |  GROUP BY e.vec_id, s.cell, nv.n
        |), assign AS (
        |  SELECT vec_id, cell FROM (
        |    SELECT vec_id, cell,
        |      row_number() OVER (PARTITION BY vec_id
        |        ORDER BY cos DESC, cell) AS rn
        |    FROM vc) WHERE rn = 1
        |), pcells AS (
        |  SELECT vec_id AS probe_id, cell, CAST(rn AS INT) AS cell_rank
        |  FROM (
        |    SELECT vec_id, cell,
        |      row_number() OVER (PARTITION BY vec_id
        |        ORDER BY cos DESC, cell) AS rn
        |    FROM vc WHERE vec_id >= 8 AND vec_id < 16) WHERE rn <= 8
        |), m AS (
        |  SELECT 127.0 / (CASE WHEN MAX(abs(x)) > 0.0
        |    THEN MAX(abs(x)) END) AS r FROM el
        |), enc AS MATERIALIZED (
        |  SELECT vec_id, d, CAST(floor(x * m.r + 0.5) AS BIGINT) AS c
        |  FROM el, m
        |), cand AS (
        |  SELECT p.probe_id, a.vec_id, p.cell_rank
        |  FROM pcells p JOIN assign a ON a.cell = p.cell
        |  WHERE a.vec_id <> p.probe_id
        |), dots AS (
        |  SELECT c.probe_id, c.vec_id, c.cell_rank,
        |    CAST(SUM(ep.c * ev.c) AS BIGINT) AS s
        |  FROM cand c
        |  JOIN enc ep ON ep.vec_id = c.probe_id
        |  JOIN enc ev ON ev.vec_id = c.vec_id AND ev.d = ep.d
        |  GROUP BY 1, 2, 3
        |), sweep(nprobe) AS (VALUES (1), (2), (4), (8)),
        |approx AS (
        |  SELECT nprobe, probe_id, vec_id FROM (
        |    SELECT s.nprobe, d.probe_id, d.vec_id,
        |      row_number() OVER (PARTITION BY s.nprobe, d.probe_id
        |        ORDER BY d.s DESC, d.vec_id) AS r
        |    FROM dots d JOIN sweep s ON d.cell_rank <= s.nprobe)
        |  WHERE r <= 5
        |), exact AS (
        |  SELECT probe_id, vec_id FROM (
        |    SELECT dd.probe_id, dd.vec_id,
        |      row_number() OVER (PARTITION BY dd.probe_id
        |        ORDER BY dd.dp / (np.n * nv.n) DESC, dd.vec_id) AS r
        |    FROM (
        |      SELECT ep.vec_id AS probe_id, ev.vec_id,
        |        SUM(ep.x * ev.x) AS dp
        |      FROM el ep JOIN el ev
        |        ON ev.d = ep.d AND ev.vec_id <> ep.vec_id
        |      WHERE ep.vec_id >= 8 AND ep.vec_id < 16
        |      GROUP BY 1, 2) dd
        |    JOIN nrm np ON np.vec_id = dd.probe_id
        |    JOIN nrm nv ON nv.vec_id = dd.vec_id)
        |  WHERE r <= 5
        |), et AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS exact_pairs,
        |    CAST(COUNT(DISTINCT probe_id) AS BIGINT) AS n_probes
        |  FROM exact
        |), hits AS (
        |  SELECT a.nprobe, CAST(COUNT(*) AS BIGINT) AS hit_pairs
        |  FROM approx a JOIN exact e
        |    ON e.probe_id = a.probe_id AND e.vec_id = a.vec_id
        |  GROUP BY 1
        |)
        |SELECT s.nprobe, et.n_probes, et.exact_pairs,
        |  COALESCE(h.hit_pairs, CAST(0 AS BIGINT)) AS hit_pairs,
        |  round(CAST(COALESCE(h.hit_pairs, 0) AS DOUBLE)
        |    / CAST(et.exact_pairs AS DOUBLE), 6) AS recall
        |FROM sweep s LEFT JOIN hits h ON h.nprobe = s.nprobe
        |CROSS JOIN et
        |ORDER BY s.nprobe""".stripMargin,

    // V31: q228's routing CTEs with seeds from the EXISTING side,
    // per-vector floor-grid d² to the assigned seed, side-split
    // aggregates over the literal cell list, HUGEINT cross-multiplied
    // alert decisions.
    // V33: full replay — the drifted-cone fixture regenerated from
    // the two lowest-id embeddings, the q321 audit arithmetic for
    // the retrain decision, one exact ground-truth pass, then the
    // q290 cell-rank/candidate/top-k recall pipeline per phase
    // (before = 8 trained seeds; after = those + the appended cell
    // at the lowest-aid arrival). The after row emits only under
    // the replayed decision.
    "q328_ivf_retrain" ->
      """WITH el AS MATERIALIZED (
        |  SELECT vec_id, CAST(generate_subscripts(embedding,1) AS INT)
        |    AS d, CAST(unnest(embedding) AS DOUBLE) AS x
        |  FROM embeddings
        |), low2 AS (
        |  SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id)
        |    AS INT) AS rn
        |  FROM embeddings ORDER BY vec_id LIMIT 2
        |), ael AS MATERIALIZED (
        |  SELECT -(e.vec_id + 1) AS vec_id, e.d,
        |    s1.x + s2.x + 0.5 * e.x AS x
        |  FROM el e
        |  JOIN (SELECT d, x FROM el WHERE vec_id =
        |    (SELECT vec_id FROM low2 WHERE rn = 1)) s1 ON s1.d = e.d
        |  JOIN (SELECT d, x FROM el WHERE vec_id =
        |    (SELECT vec_id FROM low2 WHERE rn = 2)) s2 ON s2.d = e.d
        |), fel AS MATERIALIZED (
        |  SELECT * FROM el UNION ALL SELECT * FROM ael
        |), sb_ids AS (
        |  SELECT vec_id AS cell_vid,
        |    CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT)
        |      AS cell
        |  FROM embeddings ORDER BY vec_id LIMIT 8
        |), selb AS MATERIALIZED (
        |  SELECT s.cell, e.d, e.x
        |  FROM sb_ids s JOIN el e ON e.vec_id = s.cell_vid
        |), sela AS MATERIALIZED (
        |  SELECT * FROM selb
        |  UNION ALL
        |  SELECT CAST(8 AS INT) AS cell, d, x FROM ael
        |  WHERE vec_id = (SELECT MIN(vec_id) FROM ael)
        |), nrmb AS (
        |  SELECT cell, sqrt(SUM(x*x)) AS n FROM selb GROUP BY cell
        |), nrma AS (
        |  SELECT cell, sqrt(SUM(x*x)) AS n FROM sela GROUP BY cell
        |), vcb AS MATERIALIZED (
        |  SELECT f.vec_id, s.cell, SUM(f.x * s.x) / any_value(n.n)
        |    AS cosn
        |  FROM fel f JOIN selb s ON s.d = f.d
        |  JOIN nrmb n ON n.cell = s.cell
        |  GROUP BY f.vec_id, s.cell
        |), vca AS MATERIALIZED (
        |  SELECT f.vec_id, s.cell, SUM(f.x * s.x) / any_value(n.n)
        |    AS cosn
        |  FROM fel f JOIN sela s ON s.d = f.d
        |  JOIN nrma n ON n.cell = s.cell
        |  GROUP BY f.vec_id, s.cell
        |), assignb AS MATERIALIZED (
        |  SELECT vec_id, cell FROM (
        |    SELECT vec_id, cell, row_number() OVER (
        |      PARTITION BY vec_id ORDER BY cosn DESC, cell) AS rn
        |    FROM vcb) WHERE rn = 1
        |), assigna AS MATERIALIZED (
        |  SELECT vec_id, cell FROM (
        |    SELECT vec_id, cell, row_number() OVER (
        |      PARTITION BY vec_id ORDER BY cosn DESC, cell) AS rn
        |    FROM vca) WHERE rn = 1
        |), d2 AS (
        |  SELECT a.vec_id, a.cell,
        |    CAST(floor(SUM((f.x - s.x) * (f.x - s.x)) * 1000000.0)
        |      AS BIGINT) AS d2u
        |  FROM assignb a
        |  JOIN fel f ON f.vec_id = a.vec_id
        |  JOIN selb s ON s.cell = a.cell AND s.d = f.d
        |  GROUP BY 1, 2
        |), aagg AS (
        |  SELECT cell,
        |    CAST(SUM(CASE WHEN vec_id >= 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_base,
        |    CAST(SUM(CASE WHEN vec_id < 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_new,
        |    CAST(SUM(CASE WHEN vec_id >= 0 THEN d2u ELSE 0 END)
        |      AS HUGEINT) AS sb,
        |    CAST(SUM(CASE WHEN vec_id < 0 THEN d2u ELSE 0 END)
        |      AS HUGEINT) AS sn
        |  FROM d2 GROUP BY cell
        |), ret AS MATERIALIZED (
        |  SELECT COALESCE(MAX(CASE WHEN n_new * 1000 > n_base * 300
        |    OR sn * n_base::HUGEINT * 1000 >
        |       sb * n_new::HUGEINT * 1100
        |    THEN TRUE ELSE FALSE END), FALSE) AS rt
        |  FROM aagg
        |), fnrm AS MATERIALIZED (
        |  SELECT vec_id, sqrt(SUM(x*x)) AS n FROM fel GROUP BY vec_id
        |), pel AS MATERIALIZED (
        |  SELECT * FROM ael WHERE vec_id >= -6
        |), gt AS MATERIALIZED (
        |  SELECT probe_id, vec_id FROM (
        |    SELECT dd.probe_id, dd.vec_id,
        |      row_number() OVER (PARTITION BY dd.probe_id
        |        ORDER BY dd.dp / (np.n * nv.n) DESC, dd.vec_id) AS r
        |    FROM (
        |      SELECT p.vec_id AS probe_id, f.vec_id, SUM(p.x * f.x)
        |        AS dp
        |      FROM pel p JOIN fel f
        |        ON f.d = p.d AND f.vec_id <> p.vec_id
        |      GROUP BY 1, 2) dd
        |    JOIN fnrm np ON np.vec_id = dd.probe_id
        |    JOIN fnrm nv ON nv.vec_id = dd.vec_id)
        |  WHERE r <= 5
        |), gtot AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS exact_pairs,
        |    CAST(COUNT(DISTINCT probe_id) AS BIGINT) AS n_probes
        |  FROM gt
        |), pcb AS (
        |  SELECT vec_id AS probe_id, cell FROM (
        |    SELECT vec_id, cell, row_number() OVER (
        |      PARTITION BY vec_id ORDER BY cosn DESC, cell) AS rn
        |    FROM vcb WHERE vec_id >= -6 AND vec_id < 0) WHERE rn <= 1
        |), pca AS (
        |  SELECT vec_id AS probe_id, cell FROM (
        |    SELECT vec_id, cell, row_number() OVER (
        |      PARTITION BY vec_id ORDER BY cosn DESC, cell) AS rn
        |    FROM vca WHERE vec_id >= -6 AND vec_id < 0) WHERE rn <= 1
        |), dotb AS (
        |  SELECT c.probe_id, c.vec_id, SUM(pe.x * fe.x) AS dp
        |  FROM (SELECT p.probe_id, a.vec_id
        |        FROM pcb p JOIN assignb a ON a.cell = p.cell
        |        WHERE a.vec_id <> p.probe_id) c
        |  JOIN pel pe ON pe.vec_id = c.probe_id
        |  JOIN fel fe ON fe.vec_id = c.vec_id AND fe.d = pe.d
        |  GROUP BY 1, 2
        |), dota AS (
        |  SELECT c.probe_id, c.vec_id, SUM(pe.x * fe.x) AS dp
        |  FROM (SELECT p.probe_id, a.vec_id
        |        FROM pca p JOIN assigna a ON a.cell = p.cell
        |        WHERE a.vec_id <> p.probe_id) c
        |  JOIN pel pe ON pe.vec_id = c.probe_id
        |  JOIN fel fe ON fe.vec_id = c.vec_id AND fe.d = pe.d
        |  GROUP BY 1, 2
        |), apxb AS (
        |  SELECT probe_id, vec_id FROM (
        |    SELECT d.probe_id, d.vec_id, row_number() OVER (
        |      PARTITION BY d.probe_id
        |      ORDER BY d.dp / (np.n * nv.n) DESC, d.vec_id) AS r
        |    FROM dotb d JOIN fnrm np ON np.vec_id = d.probe_id
        |    JOIN fnrm nv ON nv.vec_id = d.vec_id) WHERE r <= 5
        |), apxa AS (
        |  SELECT probe_id, vec_id FROM (
        |    SELECT d.probe_id, d.vec_id, row_number() OVER (
        |      PARTITION BY d.probe_id
        |      ORDER BY d.dp / (np.n * nv.n) DESC, d.vec_id) AS r
        |    FROM dota d JOIN fnrm np ON np.vec_id = d.probe_id
        |    JOIN fnrm nv ON nv.vec_id = d.vec_id) WHERE r <= 5
        |), hitb AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS hit_pairs
        |  FROM apxb a JOIN gt g
        |    ON g.probe_id = a.probe_id AND g.vec_id = a.vec_id
        |), hita AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS hit_pairs
        |  FROM apxa a JOIN gt g
        |    ON g.probe_id = a.probe_id AND g.vec_id = a.vec_id
        |)
        |SELECT phase, retrain_triggered, nlist, n_probes, exact_pairs,
        |  hit_pairs, recall FROM (
        |  SELECT 'before' AS phase, (SELECT rt FROM ret)
        |      AS retrain_triggered,
        |    CAST(8 AS INT) AS nlist, g.n_probes, g.exact_pairs,
        |    h.hit_pairs,
        |    CASE WHEN g.exact_pairs > 0 THEN
        |      round(CAST(h.hit_pairs AS DOUBLE)
        |        / CAST(g.exact_pairs AS DOUBLE), 6) END AS recall
        |  FROM gtot g, hitb h
        |  UNION ALL
        |  SELECT 'after', (SELECT rt FROM ret), CAST(9 AS INT),
        |    g.n_probes, g.exact_pairs, h.hit_pairs,
        |    CASE WHEN g.exact_pairs > 0 THEN
        |      round(CAST(h.hit_pairs AS DOUBLE)
        |        / CAST(g.exact_pairs AS DOUBLE), 6) END
        |  FROM gtot g, hita h WHERE (SELECT rt FROM ret)
        |) ORDER BY phase""".stripMargin,

    // V34: distinct-|value| cumulative table, integer nearest-rank
    // thresholds, then per level the clamp/floor encode-decode chain
    // with floor-grid squared errors summed HUGEINT. Clip flag on
    // the micro grid (floor(|x|·1e6) > vu) and sub-micro thresholds
    // clamp up to vu = 1; empty/all-zero corpus emits NULL rows —
    // all mirroring the Spark side (r14 ADVICE fixes).
    "q336_sq8_calibration" ->
      """WITH el AS MATERIALIZED (
        |  SELECT CAST(unnest(embedding) AS DOUBLE) AS x
        |  FROM embeddings
        |), dist AS MATERIALIZED (
        |  SELECT CAST(floor(abs(x) * 1000000.0) AS BIGINT) AS u,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM el GROUP BY 1
        |), mx AS (
        |  SELECT COALESCE(CAST(MAX(u) AS BIGINT), 0) AS maxu FROM dist
        |), cum AS MATERIALIZED (
        |  SELECT u, SUM(c) OVER (ORDER BY u ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS cum,
        |    (SELECT CAST(SUM(c) AS BIGINT) FROM dist) AS n
        |  FROM dist
        |), lv(p) AS (VALUES (950), (990), (1000)),
        |vt AS MATERIALIZED (
        |  SELECT l.p,
        |    COALESCE(CAST(MIN(c.u) AS BIGINT), 0) AS vu0,
        |    COALESCE(CAST(any_value(c.n) AS BIGINT), 0) AS n,
        |    (SELECT maxu FROM mx) AS maxu
        |  FROM lv l LEFT JOIN cum c ON c.cum * 1000 >= c.n * l.p
        |  GROUP BY l.p
        |), vte AS MATERIALIZED (
        |  SELECT p, n, maxu, GREATEST(vu0, 1) AS vu,
        |    CAST(vu0 AS DOUBLE) / 1000000.0 AS v_abs0
        |  FROM vt
        |), errc AS (
        |  SELECT v.p,
        |    CASE WHEN CAST(floor(abs(e.x) * 1000000.0) AS BIGINT)
        |        > v.vu
        |      THEN 1 ELSE 0 END AS clip,
        |    e.x - (LEAST(127, GREATEST(-127,
        |      CAST(floor(e.x * (127.0 / (v.vu / 1000000.0)) + 0.5)
        |        AS BIGINT)))
        |      / (127.0 / (v.vu / 1000000.0))) AS d
        |  FROM el e, vte v
        |  WHERE v.n > 0 AND v.maxu > 0
        |), err AS (
        |  SELECT p, CAST(COUNT(*) AS BIGINT) AS n_components,
        |    CAST(SUM(clip) AS BIGINT) AS n_clipped,
        |    CAST(SUM(CAST(floor(d * d * 1000000.0) AS BIGINT))
        |      AS HUGEINT) AS se,
        |    CAST(SUM(CASE WHEN clip = 0
        |      THEN CAST(floor(d * d * 1000000.0) AS BIGINT)
        |      ELSE 0 END) AS HUGEINT) AS seu
        |  FROM errc GROUP BY p
        |)
        |SELECT CAST(v.p AS INT) AS clip_per_mille,
        |  CASE WHEN v.n > 0 AND v.maxu > 0
        |    THEN v.vu / 1000000.0 ELSE v.v_abs0 END AS v_abs,
        |  CASE WHEN v.n > 0 AND v.maxu > 0
        |    THEN 127.0 / (v.vu / 1000000.0) END AS scale,
        |  COALESCE(r.n_components, v.n) AS n_components,
        |  COALESCE(r.n_clipped, 0) AS n_clipped,
        |  round(CAST(r.n_clipped AS DOUBLE)
        |    / CAST(r.n_components AS DOUBLE), 6) AS clip_rate,
        |  round(CAST(r.se AS DOUBLE)
        |    / CAST(r.n_components AS DOUBLE) / 1000000.0, 6) AS mse,
        |  round(CAST(r.seu AS DOUBLE)
        |    / CASE WHEN r.n_components - r.n_clipped > 0
        |        THEN CAST(r.n_components - r.n_clipped AS DOUBLE)
        |        END / 1000000.0, 6) AS mse_unclipped
        |FROM vte v LEFT JOIN err r ON r.p = v.p
        |ORDER BY clip_per_mille""".stripMargin,

    "q321_ivf_ingest_audit" ->
      """WITH el AS (
        |  SELECT vec_id, CAST(generate_subscripts(embedding,1)-1 AS INT)
        |    AS d, CAST(unnest(embedding) AS DOUBLE) AS x
        |  FROM embeddings
        |), seed_ids AS (
        |  SELECT vec_id AS cell_vid,
        |    CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell
        |  FROM embeddings WHERE vec_id % 5 <> 0
        |  ORDER BY vec_id LIMIT 4
        |), snrm AS (
        |  SELECT s.cell, sqrt(SUM(e.x * e.x)) AS n
        |  FROM seed_ids s JOIN el e ON e.vec_id = s.cell_vid
        |  GROUP BY s.cell
        |), vc AS (
        |  SELECT e.vec_id, s.cell, SUM(e.x * se.x) / any_value(sn.n)
        |    AS cosn
        |  FROM el e
        |  JOIN seed_ids s ON TRUE
        |  JOIN el se ON se.vec_id = s.cell_vid AND se.d = e.d
        |  JOIN snrm sn ON sn.cell = s.cell
        |  GROUP BY e.vec_id, s.cell
        |), assign AS MATERIALIZED (
        |  SELECT vec_id, cell FROM (
        |    SELECT vec_id, cell, row_number() OVER (
        |      PARTITION BY vec_id ORDER BY cosn DESC, cell) AS rn
        |    FROM vc) WHERE rn = 1
        |), d2 AS (
        |  SELECT a.vec_id, a.cell,
        |    CAST(floor(SUM((e.x - se.x) * (e.x - se.x)) * 1000000.0)
        |      AS BIGINT) AS d2u
        |  FROM assign a
        |  JOIN el e ON e.vec_id = a.vec_id
        |  JOIN seed_ids s ON s.cell = a.cell
        |  JOIN el se ON se.vec_id = s.cell_vid AND se.d = e.d
        |  GROUP BY 1, 2
        |), agg AS (
        |  SELECT cell,
        |    CAST(SUM(CASE WHEN vec_id % 5 <> 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_base,
        |    CAST(SUM(CASE WHEN vec_id % 5 = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_new,
        |    CAST(SUM(CASE WHEN vec_id % 5 <> 0 THEN d2u ELSE 0 END)
        |      AS HUGEINT) AS sb,
        |    CAST(SUM(CASE WHEN vec_id % 5 = 0 THEN d2u ELSE 0 END)
        |      AS HUGEINT) AS sn
        |  FROM d2 GROUP BY cell
        |), cells AS (
        |  SELECT CAST(unnest(range(0, 4)) AS INT) AS cell
        |), j AS (
        |  SELECT c.cell,
        |    COALESCE(a.n_base, CAST(0 AS BIGINT)) AS n_base,
        |    COALESCE(a.n_new, CAST(0 AS BIGINT)) AS n_new,
        |    COALESCE(a.sb, CAST(0 AS HUGEINT)) AS sb,
        |    COALESCE(a.sn, CAST(0 AS HUGEINT)) AS sn
        |  FROM cells c LEFT JOIN agg a ON a.cell = c.cell
        |)
        |SELECT cell, n_base, n_new,
        |  CASE WHEN n_base > 0 THEN
        |    round(CAST(n_new AS DOUBLE) / CAST(n_base AS DOUBLE), 6)
        |    END AS growth_ratio,
        |  (n_new * 1000 > n_base * 300) AS growth_alert,
        |  CASE WHEN n_base > 0 THEN
        |    round(CAST(sb AS DOUBLE) / CAST(n_base AS DOUBLE)
        |      / 1000000.0, 6) END AS mean_d2_base,
        |  CASE WHEN n_new > 0 THEN
        |    round(CAST(sn AS DOUBLE) / CAST(n_new AS DOUBLE)
        |      / 1000000.0, 6) END AS mean_d2_new,
        |  (sn * n_base * 1000 > sb * n_new * 1100) AS drift_alert,
        |  ((n_new * 1000 > n_base * 300) OR
        |   (sn * n_base * 1000 > sb * n_new * 1100)) AS retrain
        |FROM j ORDER BY cell""".stripMargin,

    // Q15 capstone: all five generated mechanism replays run as
    // ledger-audit subqueries (top-k's released row count is the
    // data-independent literal k; its total is NULL by declaration).
    "q326_dp_release_suite_full" -> {
      val lang = dpDomainOracle(
        domain = Seq("de", "en", "es", "fr", "zh", "xx", "yy"),
        epsilon = 0.3, seed = 61L, clampK = 134)
      val sums = dpSumOracle(
        epsilon = 0.25, seed = 62L, clampHi = 8L, clampK = 640)
      val hist = dpHistOracle(
        edges = (0L to 500L by 50L), epsilon = 0.3, seed = 63L,
        clampK = 134)
      val quant = dpQuantileOracle(
        grid = (0L to 512L by 16L), qNum = 1, qDen = 2,
        epsilon = 0.4, seed = 64L, clampUtil = 400)
      s"""WITH rel(seq, release, eps_micro, cum_eps_micro) AS (VALUES
         |  (1, 'lang_counts', 300000, 300000),
         |  (2, 'value_sums', 250000, 550000),
         |  (3, 'value_hist', 300000, 850000),
         |  (4, 'value_median', 400000, 1250000),
         |  (5, 'top_langs', 450000, 1700000)
         |), nr AS (
         |  SELECT 'lang_counts' AS release,
         |    CAST(COUNT(*) AS BIGINT) AS n_rows,
         |    CAST(SUM(released_count) AS BIGINT) AS released_total
         |  FROM ($lang)
         |  UNION ALL
         |  SELECT 'value_sums', CAST(COUNT(*) AS BIGINT),
         |    CAST(SUM(released_sum) AS BIGINT)
         |  FROM ($sums)
         |  UNION ALL
         |  SELECT 'value_hist', CAST(COUNT(*) AS BIGINT),
         |    CAST(SUM(released_count) AS BIGINT)
         |  FROM ($hist)
         |  UNION ALL
         |  SELECT 'value_median', CAST(COUNT(*) AS BIGINT),
         |    CAST(SUM(released_q) AS BIGINT)
         |  FROM ($quant)
         |  UNION ALL
         |  SELECT 'top_langs', CAST(3 AS BIGINT),
         |    CAST(NULL AS BIGINT)
         |)
         |SELECT CAST(r.seq AS INT) AS seq, r.release,
         |  CAST(r.eps_micro AS BIGINT) AS eps_micro,
         |  CAST(r.cum_eps_micro AS BIGINT) AS cum_eps_micro,
         |  CAST(2000000 AS BIGINT) AS budget_micro,
         |  CAST(2000000 - r.cum_eps_micro AS BIGINT)
         |    AS remaining_micro,
         |  n.n_rows, n.released_total
         |FROM rel r JOIN nr n ON n.release = r.release
         |ORDER BY seq""".stripMargin
    },

    // Q17: the parallel-composition ledger literals (charged_micro
    // replays the group-max increment arithmetic) + each mechanism's
    // replay over its own shard domain.
    "q331_dp_parallel_ledger" -> {
      val deEn = dpDomainOracle(domain = Seq("de", "en"),
        epsilon = 0.8, seed = 71L, clampK = 50)
      val esFr = dpDomainOracle(domain = Seq("es", "fr"),
        epsilon = 0.8, seed = 72L, clampK = 50)
      val zhXxYy = dpDomainOracle(domain = Seq("zh", "xx", "yy"),
        epsilon = 0.8, seed = 73L, clampK = 50)
      val sums = dpSumOracle(
        epsilon = 0.5, seed = 74L, clampHi = 8L, clampK = 320)
      val hist = dpHistOracle(
        edges = (0L to 500L by 50L), epsilon = 0.6, seed = 75L,
        clampK = 67)
      s"""WITH rel(seq, release, pgroup, eps_micro, charged_micro,
         |    cum_eps_micro) AS (VALUES
         |  (1, 'counts_de_en', 'lang_shards', 800000, 800000, 800000),
         |  (2, 'counts_es_fr', 'lang_shards', 800000, 0, 800000),
         |  (3, 'counts_zh_xx_yy', 'lang_shards', 800000, 0, 800000),
         |  (4, 'value_sums', NULL, 500000, 500000, 1300000),
         |  (5, 'value_hist', NULL, 600000, 600000, 1900000)
         |), nr AS (
         |  SELECT 'counts_de_en' AS release,
         |    CAST(COUNT(*) AS BIGINT) AS n_rows,
         |    CAST(SUM(released_count) AS BIGINT) AS released_total
         |  FROM ($deEn)
         |  UNION ALL
         |  SELECT 'counts_es_fr', CAST(COUNT(*) AS BIGINT),
         |    CAST(SUM(released_count) AS BIGINT)
         |  FROM ($esFr)
         |  UNION ALL
         |  SELECT 'counts_zh_xx_yy', CAST(COUNT(*) AS BIGINT),
         |    CAST(SUM(released_count) AS BIGINT)
         |  FROM ($zhXxYy)
         |  UNION ALL
         |  SELECT 'value_sums', CAST(COUNT(*) AS BIGINT),
         |    CAST(SUM(released_sum) AS BIGINT)
         |  FROM ($sums)
         |  UNION ALL
         |  SELECT 'value_hist', CAST(COUNT(*) AS BIGINT),
         |    CAST(SUM(released_count) AS BIGINT)
         |  FROM ($hist)
         |)
         |SELECT CAST(r.seq AS INT) AS seq, r.release, r.pgroup,
         |  CAST(r.eps_micro AS BIGINT) AS eps_micro,
         |  CAST(r.charged_micro AS BIGINT) AS charged_micro,
         |  CAST(r.cum_eps_micro AS BIGINT) AS cum_eps_micro,
         |  CAST(2000000 AS BIGINT) AS budget_micro,
         |  CAST(2000000 - r.cum_eps_micro AS BIGINT)
         |    AS remaining_micro,
         |  n.n_rows, n.released_total
         |FROM rel r JOIN nr n ON n.release = r.release
         |ORDER BY seq""".stripMargin
    },

    // T61: the same q325 injection, then the repair chain — the
    // encRepairs literal replaces in table order, the control strip,
    // the U+FFFD strip — with md5/length pinning the exact repaired
    // text and clean_after re-measured.
    "q334_encoding_repair" -> {
      val moji = graft.operators.TextAnalysis.encMojibake
      val ctrl = graft.operators.TextAnalysis.encControl
      val fixedExpr = graft.operators.TextAnalysis.encRepairs
        .foldLeft("text") { case (e, (bad, good)) =>
          s"replace($e, '$bad', '$good')"
        }
      s"""WITH d AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 50 = 0
        |           THEN text || 'Ã©' || chr(7) || '�'
        |         WHEN doc_id % 25 = 0 THEN text || 'Ã©' || chr(7)
        |         ELSE text END AS text
        |  FROM documents WHERE text IS NOT NULL
        |), r AS (
        |  SELECT doc_id, text,
        |    regexp_replace(regexp_replace($fixedExpr,
        |      '$ctrl', '', 'g'), '�', '', 'g') AS t
        |  FROM d
        |)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '$moji')) AS BIGINT)
        |    AS n_fixed_mojibake,
        |  CAST(len(regexp_extract_all(text, '$ctrl')) AS BIGINT)
        |    AS n_stripped_control,
        |  CAST(len(regexp_extract_all(text, '�')) AS BIGINT)
        |    AS n_stripped_replacement,
        |  CAST(length(t) AS BIGINT) AS repaired_len,
        |  md5(t) AS repaired_md5,
        |  (len(regexp_extract_all(t, '$moji')) = 0
        |    AND len(regexp_extract_all(t, '$ctrl')) = 0
        |    AND len(regexp_extract_all(t, '�')) = 0)
        |    AS clean_after
        |FROM r ORDER BY doc_id""".stripMargin
    },

    // T59: injection replay (mojibake digraph + chr(7) + U+FFFD) and
    // the three regexp counts with the patterns shared verbatim from
    // TextAnalysis; guarded rate divisions, boolean clean flag.
    "q325_encoding_quality" -> {
      val moji = graft.operators.TextAnalysis.encMojibake
      val ctrl = graft.operators.TextAnalysis.encControl
      s"""WITH d AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 50 = 0
        |           THEN text || 'Ã©' || chr(7) || '\ufffd'
        |         WHEN doc_id % 25 = 0 THEN text || 'Ã©' || chr(7)
        |         ELSE text END AS text
        |  FROM documents WHERE text IS NOT NULL
        |), c AS (
        |  SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
        |    CAST(len(regexp_extract_all(text, '\ufffd')) AS BIGINT)
        |      AS n_replacement,
        |    CAST(len(regexp_extract_all(text, '$ctrl')) AS BIGINT)
        |      AS n_control,
        |    CAST(len(regexp_extract_all(text, '$moji')) AS BIGINT)
        |      AS n_mojibake
        |  FROM d
        |)
        |SELECT doc_id, n_chars, n_replacement, n_control, n_mojibake,
        |  CASE WHEN n_chars > 0 THEN
        |    round(CAST(n_replacement AS DOUBLE) / CAST(n_chars AS DOUBLE),
        |      6) END AS replacement_rate,
        |  CASE WHEN n_chars > 0 THEN
        |    round(CAST(n_control AS DOUBLE) / CAST(n_chars AS DOUBLE),
        |      6) END AS control_rate,
        |  CASE WHEN n_chars > 0 THEN
        |    round(CAST(n_mojibake AS DOUBLE) / CAST(n_chars AS DOUBLE),
        |      6) END AS mojibake_rate,
        |  (n_replacement = 0 AND n_control = 0 AND n_mojibake = 0)
        |    AS clean
        |FROM c ORDER BY doc_id""".stripMargin
    },

    // Q16: counts over the public domain + the shared weight-table
    // literals, k peeling rounds unrolled (cumulative window, the
    // Q13 division-free pick, winners excluded via NOT IN).
    "q323_dp_topk_release" -> {
      val Q = graft.operators.Quality
      val k = 3
      val wrows = Q.dpExpMechWeights(1.2 / k, 1, 400)
        .map { case (u, w) => s"($u, $w)" }.mkString(",\n        |    ")
      val dom = Seq("de", "en", "es", "fr", "zh", "xx", "yy")
        .map(v => s"('$v')").mkString(", ")
      val rounds = (1 to k).map { r =>
        val draw = Q.dpRoundDraw(r, 50L)
        val excl =
          if (r == 1) ""
          else "\n        |      WHERE k NOT IN (" +
            (1 until r).map(j => s"SELECT k FROM win$j")
              .mkString(" UNION ALL ") + ")"
        s""", cand$r AS (
        |  SELECT * FROM full0$excl
        |), win$r AS MATERIALIZED (
        |  SELECT MIN(k) AS k FROM (
        |    SELECT k,
        |      SUM(w) OVER (ORDER BY k ROWS BETWEEN UNBOUNDED
        |        PRECEDING AND CURRENT ROW) AS cum,
        |      SUM(w) OVER () AS wt_tot
        |    FROM (
        |      SELECT c.k, w.w
        |      FROM cand$r c
        |      CROSS JOIN (SELECT MAX(c) AS m FROM cand$r) mx
        |      JOIN wt w ON w.u = LEAST(mx.m - c.c, 400)
        |    )
        |  ) WHERE cum::HUGEINT * 268435456 > ${draw}::HUGEINT * wt_tot
        |)""".stripMargin
      }.mkString("\n")
      val union = (1 to k)
        .map(r => s"SELECT $r AS rank, k AS lang FROM win$r")
        .mkString("\n  UNION ALL\n  ")
      s"""WITH dom(k) AS (VALUES $dom),
        |cnts AS (
        |  SELECT lang AS k, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM documents WHERE lang IS NOT NULL GROUP BY 1
        |), full0 AS MATERIALIZED (
        |  SELECT d.k, COALESCE(c.c, CAST(0 AS BIGINT)) AS c
        |  FROM dom d LEFT JOIN cnts c ON c.k = d.k
        |), wt(u, w) AS (
        |  VALUES
        |    $wrows
        |)
        |$rounds
        |SELECT CAST(rank AS INT) AS rank, lang FROM (
        |  $union
        |) ORDER BY rank""".stripMargin
    },

    // M15: samples from the WAV integer formula × the shared DFT
    // literal table; HUGEINT squares rendered VARCHAR; triage rows
    // for the short and corrupt ids emitted literally.
    "q319_audio_spectrum" -> {
      val dftRows = graft.operators.Multimodal
        .dftTable(64, Seq(0, 1, 3, 8, 16, 31))
        .map { case (t, k, c, s) => s"($t, $k, $c, $s)" }
        .mkString(",\n        |    ")
      s"""WITH ids AS (
        |  SELECT CAST(p_partkey AS BIGINT) AS id,
        |    CAST(p_partkey AS BIGINT) AS seed FROM part
        |), dft(t, k, c, s) AS (
        |  VALUES
        |    $dftRows
        |), smp AS (
        |  SELECT id, tt.t,
        |    CAST((seed * 31 + 7 * tt.t) % 4001 - 2000 AS BIGINT) AS x
        |  FROM ids, (SELECT unnest(range(0, 64)) AS t) tt
        |), spec AS (
        |  SELECT m.id, d.k AS bin,
        |    CAST(SUM(m.x * d.c) AS BIGINT) AS re,
        |    CAST(-SUM(m.x * d.s) AS BIGINT) AS im
        |  FROM smp m JOIN dft d ON d.t = m.t
        |  GROUP BY 1, 2
        |), ok AS (
        |  SELECT id, TRUE AS decode_ok, bin, re, im,
        |    CAST(re::HUGEINT * re::HUGEINT + im::HUGEINT * im::HUGEINT
        |      AS VARCHAR) AS power
        |  FROM spec
        |), triage AS (
        |  SELECT CAST(t.id AS BIGINT) AS id, FALSE AS decode_ok,
        |    d.k AS bin, CAST(NULL AS BIGINT) AS re,
        |    CAST(NULL AS BIGINT) AS im, CAST(NULL AS VARCHAR) AS power
        |  FROM (SELECT -1 AS id UNION ALL SELECT -2) t,
        |    (SELECT DISTINCT k FROM dft) d
        |)
        |SELECT * FROM ok UNION ALL SELECT * FROM triage
        |ORDER BY id, bin""".stripMargin
    },

    // M16: the two-tone fixture regenerated from the SAME dftTable
    // literals (tone table for synthesis, dft table for analysis),
    // then the 3 per-window exact integer DFT sums; triage rows for
    // the short/corrupt ids.
    "q329_audio_sweep" -> {
      val M = graft.operators.Multimodal
      val toneRows = M.dftTable(64, Seq(5, 11))
        .map { case (t, k, c, _) => s"($t, $k, $c)" }
        .mkString(",\n        |    ")
      val dftRows = M.dftTable(64, Seq(0, 5, 11))
        .map { case (t, k, c, s) => s"($t, $k, $c, $s)" }
        .mkString(",\n        |    ")
      s"""WITH ids AS (
        |  SELECT CAST(p_partkey AS BIGINT) AS id,
        |    CAST(p_partkey AS BIGINT) AS seed FROM part
        |), tone(t, k, c) AS (
        |  VALUES
        |    $toneRows
        |), dft(t, k, c, s) AS (
        |  VALUES
        |    $dftRows
        |), smp AS MATERIALIZED (
        |  SELECT id, ii.i,
        |    tn.c + CAST((seed * 31 + 7 * ii.i) % 41 - 20 AS BIGINT)
        |      AS x
        |  FROM ids, (SELECT unnest(range(0, 192)) AS i) ii
        |  JOIN tone tn ON tn.t = ii.i % 64
        |    AND tn.k = CASE WHEN ii.i < 96 THEN 5 ELSE 11 END
        |), win AS (SELECT unnest(range(0, 3)) AS w
        |), spec AS (
        |  SELECT m.id, win.w AS wi, CAST(win.w * 64 AS BIGINT)
        |      AS start_sample, d.k AS bin,
        |    CAST(SUM(m.x * d.c) AS BIGINT) AS re,
        |    CAST(-SUM(m.x * d.s) AS BIGINT) AS im
        |  FROM smp m
        |  JOIN win ON m.i >= win.w * 64 AND m.i < win.w * 64 + 64
        |  JOIN dft d ON d.t = m.i - win.w * 64
        |  GROUP BY 1, 2, 3, 4
        |), ok AS (
        |  SELECT id, TRUE AS decode_ok, CAST(wi AS INT) AS win_idx,
        |    start_sample, bin, re, im,
        |    CAST(re::HUGEINT * re::HUGEINT + im::HUGEINT * im::HUGEINT
        |      AS VARCHAR) AS power
        |  FROM spec
        |), triage AS (
        |  SELECT CAST(t.id AS BIGINT) AS id, FALSE AS decode_ok,
        |    CAST(0 AS INT) AS win_idx, CAST(NULL AS BIGINT)
        |      AS start_sample, d.k AS bin, CAST(NULL AS BIGINT) AS re,
        |    CAST(NULL AS BIGINT) AS im, CAST(NULL AS VARCHAR) AS power
        |  FROM (SELECT -1 AS id UNION ALL SELECT -2) t,
        |    (SELECT DISTINCT k FROM dft) d
        |)
        |SELECT * FROM ok UNION ALL SELECT * FROM triage
        |ORDER BY id, win_idx, bin""".stripMargin
    },

    // M19: the q329 sample/spectrum replay over ALL 33 bins, pooled
    // by the shared melWeights literals — HUGEINT power × weight
    // sums rendered VARCHAR; triage rows one per (clip, band).
    "q344_mel_energies" -> {
      val M = graft.operators.Multimodal
      val toneRows = M.dftTable(64, Seq(5, 11))
        .map { case (t, k, c, _) => s"($t, $k, $c)" }
        .mkString(",\n        |    ")
      val dftRows = M.dftTable(64, 0 to 32)
        .map { case (t, k, c, s) => s"($t, $k, $c, $s)" }
        .mkString(",\n        |    ")
      val melRows = M.melWeights(64, 6, 16000)
        .map { case (m, k, w) => s"($m, $k, $w)" }
        .mkString(",\n        |    ")
      s"""WITH ids AS (
        |  SELECT CAST(p_partkey AS BIGINT) AS id,
        |    CAST(p_partkey AS BIGINT) AS seed FROM part
        |  WHERE p_partkey % 2 = 0
        |), tone(t, k, c) AS (
        |  VALUES
        |    $toneRows
        |), dft(t, k, c, s) AS (
        |  VALUES
        |    $dftRows
        |), melw(mel, bin, w) AS (
        |  VALUES
        |    $melRows
        |), smp AS MATERIALIZED (
        |  SELECT id, ii.i,
        |    tn.c + CAST((seed * 31 + 7 * ii.i) % 41 - 20 AS BIGINT)
        |      AS x
        |  FROM ids, (SELECT unnest(range(0, 192)) AS i) ii
        |  JOIN tone tn ON tn.t = ii.i % 64
        |    AND tn.k = CASE WHEN ii.i < 96 THEN 5 ELSE 11 END
        |), win AS (SELECT unnest(range(0, 3)) AS w
        |), spec AS (
        |  SELECT m.id, win.w AS wi, d.k AS bin,
        |    CAST(SUM(m.x * d.c) AS BIGINT) AS re,
        |    CAST(-SUM(m.x * d.s) AS BIGINT) AS im
        |  FROM smp m
        |  JOIN win ON m.i >= win.w * 64 AND m.i < win.w * 64 + 64
        |  JOIN dft d ON d.t = m.i - win.w * 64
        |  GROUP BY 1, 2, 3
        |), okp AS (
        |  SELECT id, wi, bin,
        |    re::HUGEINT * re::HUGEINT + im::HUGEINT * im::HUGEINT
        |      AS p
        |  FROM spec
        |), oke AS (
        |  SELECT o.id, TRUE AS decode_ok, CAST(o.wi AS INT)
        |      AS win_idx, m.mel,
        |    CAST(SUM(o.p * m.w) AS VARCHAR) AS energy
        |  FROM okp o JOIN melw m ON m.bin = o.bin
        |  GROUP BY 1, 2, 3, 4
        |), triage AS (
        |  SELECT CAST(t.id AS BIGINT) AS id, FALSE AS decode_ok,
        |    CAST(0 AS INT) AS win_idx, m.mel,
        |    CAST(NULL AS VARCHAR) AS energy
        |  FROM (SELECT -1 AS id UNION ALL SELECT -2) t,
        |    (SELECT DISTINCT mel FROM melw) m
        |)
        |SELECT * FROM oke UNION ALL SELECT * FROM triage
        |ORDER BY id, win_idx, mel""".stripMargin
    },

    // M20: the q344 mel-energy replay continued through the
    // cepstral stage — energies quantize to (digit count, 3-digit
    // mantissa) and read milli-log10 from the shared 900-row
    // literal table, then exact BIGINT MACs against the shared
    // DCT-II cosine literals; triage clips carry NULL coefficients.
    "q350_audio_mfcc" -> {
      val M = graft.operators.Multimodal
      val toneRows = M.dftTable(64, Seq(5, 11))
        .map { case (t, k, c, _) => s"($t, $k, $c)" }
        .mkString(",\n        |    ")
      val dftRows = M.dftTable(64, 0 to 32)
        .map { case (t, k, c, s) => s"($t, $k, $c, $s)" }
        .mkString(",\n        |    ")
      val melRows = M.melWeights(64, 6, 16000)
        .map { case (m, k, w) => s"($m, $k, $w)" }
        .mkString(",\n        |    ")
      val logRows = M.milliLog10Table
        .map { case (m, lv) => s"($m, $lv)" }
        .mkString(",\n        |    ")
      val dct2Rows = M.mfccDctTable(4, 6)
        .map { case (j, m, c) => s"($j, $m, $c)" }
        .mkString(",\n        |    ")
      s"""WITH ids AS (
        |  SELECT CAST(p_partkey AS BIGINT) AS id,
        |    CAST(p_partkey AS BIGINT) AS seed FROM part
        |  WHERE p_partkey % 4 = 0
        |), tone(t, k, c) AS (
        |  VALUES
        |    $toneRows
        |), dft(t, k, c, s) AS (
        |  VALUES
        |    $dftRows
        |), melw(mel, bin, w) AS (
        |  VALUES
        |    $melRows
        |), logt(m3, lv) AS (
        |  VALUES
        |    $logRows
        |), dct2(coef, mel, c) AS (
        |  VALUES
        |    $dct2Rows
        |), smp AS MATERIALIZED (
        |  SELECT id, ii.i,
        |    tn.c + CAST((seed * 31 + 7 * ii.i) % 41 - 20 AS BIGINT)
        |      AS x
        |  FROM ids, (SELECT unnest(range(0, 192)) AS i) ii
        |  JOIN tone tn ON tn.t = ii.i % 64
        |    AND tn.k = CASE WHEN ii.i < 96 THEN 5 ELSE 11 END
        |), win AS (SELECT unnest(range(0, 3)) AS w
        |), spec AS (
        |  SELECT m.id, win.w AS wi, d.k AS bin,
        |    CAST(SUM(m.x * d.c) AS BIGINT) AS re,
        |    CAST(-SUM(m.x * d.s) AS BIGINT) AS im
        |  FROM smp m
        |  JOIN win ON m.i >= win.w * 64 AND m.i < win.w * 64 + 64
        |  JOIN dft d ON d.t = m.i - win.w * 64
        |  GROUP BY 1, 2, 3
        |), okp AS (
        |  SELECT id, wi, bin,
        |    re::HUGEINT * re::HUGEINT + im::HUGEINT * im::HUGEINT
        |      AS p
        |  FROM spec
        |), oke AS (
        |  SELECT o.id, TRUE AS decode_ok, CAST(o.wi AS INT)
        |      AS win_idx, m.mel,
        |    CAST(SUM(o.p * m.w) AS VARCHAR) AS energy
        |  FROM okp o JOIN melw m ON m.bin = o.bin
        |  GROUP BY 1, 2, 3, 4
        |), triage AS (
        |  SELECT CAST(t.id AS BIGINT) AS id, FALSE AS decode_ok,
        |    CAST(0 AS INT) AS win_idx, m.mel,
        |    CAST(NULL AS VARCHAR) AS energy
        |  FROM (SELECT -1 AS id UNION ALL SELECT -2) t,
        |    (SELECT DISTINCT mel FROM melw) m
        |), me AS (
        |  SELECT * FROM oke UNION ALL SELECT * FROM triage
        |), lq AS (
        |  SELECT e.id, e.decode_ok, e.win_idx, e.mel,
        |    CASE WHEN e.energy IS NULL THEN CAST(NULL AS BIGINT)
        |         WHEN e.energy = '0' THEN CAST(-3000 AS BIGINT)
        |         ELSE CAST(1000 * (length(e.energy) - 3) + l.lv
        |           AS BIGINT) END AS lv
        |  FROM me e LEFT JOIN logt l
        |    ON l.m3 = CAST(rpad(e.energy, 3, '0') AS INT)
        |)
        |SELECT q.id, q.decode_ok, q.win_idx,
        |  CAST(d.coef AS INT) AS coef,
        |  CAST(SUM(q.lv * d.c) AS BIGINT) AS mfcc
        |FROM lq q JOIN dct2 d ON d.mel = q.mel
        |GROUP BY 1, 2, 3, 4
        |ORDER BY id, win_idx, coef""".stripMargin
    },

    // M17: per-SCENE pHash replay (frames within a scene are
    // identical, so the q317 DCT pipeline runs once per (clip,
    // scene) seed and frames join by scene), then the lag hamming
    // and threshold. Triage rows replay as literal false/NULLs.
    "q335_video_scenes" -> {
      val dctRows = graft.operators.Multimodal.phashDctTable(16)
        .map { case (i, u, c) => s"($i, $u, $c)" }
        .mkString(",\n        |    ")
      s"""WITH fr AS MATERIALIZED (
        |  SELECT CAST(p.p_partkey AS BIGINT) AS id,
        |    CAST(f.f AS INT) AS frame_idx,
        |    CASE WHEN f.f < 3 THEN p.p_partkey * 31 + 1
        |         ELSE p.p_partkey * 31 + 2 END AS seed,
        |    TRUE AS ok
        |  FROM part p, (SELECT unnest(range(0, 6)) AS f) f
        |  WHERE p.p_partkey % 10 = 0
        |  UNION ALL
        |  SELECT -2, CAST(f.f AS INT),
        |    CASE WHEN f.f < 1 THEN 156 ELSE 157 END, TRUE
        |  FROM (SELECT unnest(range(0, 2)) AS f) f
        |  UNION ALL
        |  SELECT -1, CAST(f.f AS INT), NULL, FALSE
        |  FROM (SELECT unnest(range(0, 2)) AS f) f
        |), sseed AS MATERIALIZED (
        |  SELECT DISTINCT seed FROM fr WHERE ok
        |), lum AS MATERIALIZED (
        |  SELECT s.seed, x.x, y.y,
        |    299 * ((s.seed * 7 + (1 + s.seed % 11) * x.x +
        |      (2 + s.seed % 13) * y.y + (1 + s.seed % 7) * x.x * y.y)
        |      % 256)
        |  + 587 * ((s.seed * 11 + (3 + s.seed % 13) * x.x +
        |      (1 + s.seed % 11) * y.y + (2 + s.seed % 7) * x.x * y.y)
        |      % 256)
        |  + 114 * ((s.seed * 13 + (2 + s.seed % 11) * x.x +
        |      (3 + s.seed % 13) * y.y + (3 + s.seed % 7) * x.x * y.y)
        |      % 256) AS luma
        |  FROM sseed s,
        |    (SELECT unnest(range(0, 16)) AS x) x,
        |    (SELECT unnest(range(0, 16)) AS y) y
        |), dct(i, u, c) AS (
        |  VALUES
        |    $dctRows
        |), st1 AS (
        |  SELECT l.seed, l.x, d.u AS v, SUM(l.luma * d.c) AS s1
        |  FROM lum l JOIN dct d ON d.i = l.y
        |  GROUP BY 1, 2, 3
        |), coef AS (
        |  SELECT s.seed, d.u, s.v, CAST(SUM(s.s1 * d.c) AS BIGINT)
        |    AS cf
        |  FROM st1 s JOIN dct d ON d.i = s.x
        |  GROUP BY 1, 2, 3
        |), ac AS (
        |  SELECT seed, u * 8 + v AS idx, cf FROM coef
        |  WHERE NOT (u = 0 AND v = 0)
        |), med AS (
        |  SELECT seed, cf AS m FROM (
        |    SELECT seed, cf, row_number() OVER (
        |      PARTITION BY seed ORDER BY cf) AS rn
        |    FROM ac) WHERE rn = 32
        |), ph AS MATERIALIZED (
        |  SELECT a.seed,
        |    string_agg(CASE WHEN a.cf > m.m THEN '1' ELSE '0' END,
        |      '' ORDER BY a.idx) AS phash
        |  FROM ac a JOIN med m USING (seed) GROUP BY a.seed
        |), fh AS (
        |  SELECT f.id, f.frame_idx, f.ok AS decode_ok,
        |    CASE WHEN f.ok THEN p.phash END AS phash
        |  FROM fr f LEFT JOIN ph p ON p.seed = f.seed
        |), lagd AS MATERIALIZED (
        |  SELECT id, frame_idx, decode_ok, phash,
        |    lag(phash) OVER (PARTITION BY id ORDER BY frame_idx)
        |      AS prev,
        |    lag(frame_idx) OVER (PARTITION BY id ORDER BY frame_idx)
        |      AS pidx
        |  FROM fh
        |), hamd AS (
        |  SELECT l.id, l.frame_idx,
        |    CAST(SUM(CASE WHEN substr(l.phash, ii.i, 1) <>
        |      substr(l.prev, ii.i, 1) THEN 1 ELSE 0 END) AS INT)
        |      AS hamming
        |  FROM lagd l, (SELECT unnest(range(1, 64)) AS i) ii
        |  WHERE l.phash IS NOT NULL AND l.prev IS NOT NULL
        |  GROUP BY 1, 2
        |)
        |SELECT l.id, l.frame_idx, l.decode_ok, l.phash, h.hamming,
        |  CASE WHEN l.frame_idx = 0 THEN TRUE
        |       WHEN h.hamming IS NOT NULL
        |         AND l.pidx = l.frame_idx - 1
        |         THEN h.hamming >= 10
        |       END AS scene_change
        |FROM lagd l LEFT JOIN hamd h
        |  ON h.id = l.id AND h.frame_idx = l.frame_idx
        |ORDER BY l.id, l.frame_idx""".stripMargin
    },

    // M18: the q335 replay with the GIF fixture's one-channel pixel
    // formula — decoded RGB is (idx, idx, idx), so luma = 1000·idx;
    // the GIF round-trip is lossless for indexed sources, so the
    // oracle needs no decode. Corrupt/truncated clips are single
    // triage rows; the one-frame clip exercises the NULL-hamming
    // path.
    "q337_gif_scenes" -> {
      val dctRows = graft.operators.Multimodal.phashDctTable(16)
        .map { case (i, u, c) => s"($i, $u, $c)" }
        .mkString(",\n        |    ")
      s"""WITH fr AS MATERIALIZED (
        |  SELECT CAST(p.p_partkey AS BIGINT) AS id,
        |    CAST(f.f AS INT) AS frame_idx,
        |    CASE WHEN f.f < 3 THEN p.p_partkey * 31 + 1
        |         ELSE p.p_partkey * 31 + 2 END AS seed,
        |    TRUE AS ok
        |  FROM part p, (SELECT unnest(range(0, 6)) AS f) f
        |  WHERE p.p_partkey % 10 = 0
        |  UNION ALL SELECT -1, 0, NULL, FALSE
        |  UNION ALL SELECT -2, 0, NULL, FALSE
        |  UNION ALL SELECT -3, 0, 281, TRUE
        |), sseed AS MATERIALIZED (
        |  SELECT DISTINCT seed FROM fr WHERE ok
        |), lum AS MATERIALIZED (
        |  SELECT s.seed, x.x, y.y,
        |    1000 * ((s.seed * 7 + (1 + s.seed % 11) * x.x +
        |      (2 + s.seed % 13) * y.y + (1 + s.seed % 7) * x.x * y.y)
        |      % 256) AS luma
        |  FROM sseed s,
        |    (SELECT unnest(range(0, 16)) AS x) x,
        |    (SELECT unnest(range(0, 16)) AS y) y
        |), dct(i, u, c) AS (
        |  VALUES
        |    $dctRows
        |), st1 AS (
        |  SELECT l.seed, l.x, d.u AS v, SUM(l.luma * d.c) AS s1
        |  FROM lum l JOIN dct d ON d.i = l.y
        |  GROUP BY 1, 2, 3
        |), coef AS (
        |  SELECT s.seed, d.u, s.v, CAST(SUM(s.s1 * d.c) AS BIGINT)
        |    AS cf
        |  FROM st1 s JOIN dct d ON d.i = s.x
        |  GROUP BY 1, 2, 3
        |), ac AS (
        |  SELECT seed, u * 8 + v AS idx, cf FROM coef
        |  WHERE NOT (u = 0 AND v = 0)
        |), med AS (
        |  SELECT seed, cf AS m FROM (
        |    SELECT seed, cf, row_number() OVER (
        |      PARTITION BY seed ORDER BY cf) AS rn
        |    FROM ac) WHERE rn = 32
        |), ph AS MATERIALIZED (
        |  SELECT a.seed,
        |    string_agg(CASE WHEN a.cf > m.m THEN '1' ELSE '0' END,
        |      '' ORDER BY a.idx) AS phash
        |  FROM ac a JOIN med m USING (seed) GROUP BY a.seed
        |), fh AS (
        |  SELECT f.id, f.frame_idx, f.ok AS decode_ok,
        |    CASE WHEN f.ok THEN p.phash END AS phash
        |  FROM fr f LEFT JOIN ph p ON p.seed = f.seed
        |), lagd AS MATERIALIZED (
        |  SELECT id, frame_idx, decode_ok, phash,
        |    lag(phash) OVER (PARTITION BY id ORDER BY frame_idx)
        |      AS prev,
        |    lag(frame_idx) OVER (PARTITION BY id ORDER BY frame_idx)
        |      AS pidx
        |  FROM fh
        |), hamd AS (
        |  SELECT l.id, l.frame_idx,
        |    CAST(SUM(CASE WHEN substr(l.phash, ii.i, 1) <>
        |      substr(l.prev, ii.i, 1) THEN 1 ELSE 0 END) AS INT)
        |      AS hamming
        |  FROM lagd l, (SELECT unnest(range(1, 64)) AS i) ii
        |  WHERE l.phash IS NOT NULL AND l.prev IS NOT NULL
        |  GROUP BY 1, 2
        |)
        |SELECT l.id, l.frame_idx, l.decode_ok, l.phash, h.hamming,
        |  CASE WHEN l.frame_idx = 0 THEN TRUE
        |       WHEN h.hamming IS NOT NULL
        |         AND l.pidx = l.frame_idx - 1
        |         THEN h.hamming >= 10
        |       END AS scene_change
        |FROM lagd l LEFT JOIN hamd h
        |  ON h.id = l.id AND h.frame_idx = l.frame_idx
        |ORDER BY l.id, l.frame_idx""".stripMargin
    },

    // M18b: the delta-GIF composite replay — per (clip, frame) the
    // disposal state machine unrolls to rect CASEs over the patch
    // pixel formulas (restore-to-background rects read luma 0;
    // frame 3's patch is absent from frame 4 — restore-to-previous),
    // then the q337 DCT/pHash/lag chain keyed (id, frame). Triage
    // rows: corrupt bytes and the BMP payload (GIF-magic refused).
    "q352_gif_delta_scenes" -> {
      val dctRows = graft.operators.Multimodal.phashDctTable(16)
        .map { case (i, u, c) => s"($i, $u, $c)" }
        .mkString(",\n        |    ")
      def pf(k: Int, xe: String, ye: String): String = {
        val s = s"(i.id * 31 + $k)"
        s"(($s * 7 + (1 + $s % 11) * ($xe) + (2 + $s % 13) * ($ye)" +
          s" + (1 + $s % 7) * ($xe) * ($ye)) % 256)"
      }
      // frame-2 steady state: patch2 kept, patch1's rect
      // backgrounded to 0, base elsewhere
      val f2 =
        s"CASE WHEN g.x < 8 AND g.y >= 8 THEN 1000 * " +
          s"${pf(3, "g.x", "g.y - 8")} WHEN g.x >= 8 AND g.y < 8 " +
          s"THEN 0 ELSE 1000 * ${pf(1, "g.x", "g.y")} END"
      val lumaCase =
        s"CASE fr.fi WHEN 0 THEN 1000 * ${pf(1, "g.x", "g.y")} " +
          s"WHEN 1 THEN CASE WHEN g.x >= 8 AND g.y < 8 THEN 1000 * " +
          s"${pf(2, "g.x - 8", "g.y")} ELSE 1000 * " +
          s"${pf(1, "g.x", "g.y")} END " +
          s"WHEN 2 THEN $f2 " +
          s"WHEN 3 THEN CASE WHEN g.x >= 4 AND g.x < 12 AND " +
          s"g.y >= 4 AND g.y < 12 THEN 1000 * " +
          s"${pf(4, "g.x - 4", "g.y - 4")} ELSE $f2 END " +
          s"WHEN 4 THEN CASE WHEN g.x >= 12 AND g.y >= 12 THEN " +
          s"1000 * ${pf(5, "g.x - 12", "g.y - 12")} ELSE $f2 END END"
      s"""WITH ids AS (
        |  SELECT CAST(p_partkey AS BIGINT) AS id FROM part
        |  WHERE p_partkey % 10 = 0
        |), dct(i, u, c) AS (
        |  VALUES
        |    $dctRows
        |), lum AS MATERIALIZED (
        |  SELECT i.id, fr.fi AS frame_idx, g.x, g.y,
        |    $lumaCase AS luma
        |  FROM ids i,
        |    (SELECT unnest(range(0, 5)) AS fi) fr,
        |    (SELECT x.x, y.y FROM
        |      (SELECT unnest(range(0, 16)) AS x) x,
        |      (SELECT unnest(range(0, 16)) AS y) y) g
        |), st1 AS (
        |  SELECT l.id, l.frame_idx, l.x, d.u AS v,
        |    SUM(l.luma * d.c) AS s1
        |  FROM lum l JOIN dct d ON d.i = l.y
        |  GROUP BY 1, 2, 3, 4
        |), coef AS (
        |  SELECT s.id, s.frame_idx, d.u, s.v,
        |    CAST(SUM(s.s1 * d.c) AS BIGINT) AS cf
        |  FROM st1 s JOIN dct d ON d.i = s.x
        |  GROUP BY 1, 2, 3, 4
        |), ac AS (
        |  SELECT id, frame_idx, u * 8 + v AS idx, cf FROM coef
        |  WHERE NOT (u = 0 AND v = 0)
        |), med AS (
        |  SELECT id, frame_idx, cf AS m FROM (
        |    SELECT id, frame_idx, cf, row_number() OVER (
        |      PARTITION BY id, frame_idx ORDER BY cf) AS rn
        |    FROM ac) WHERE rn = 32
        |), ph AS MATERIALIZED (
        |  SELECT a.id, a.frame_idx,
        |    string_agg(CASE WHEN a.cf > m.m THEN '1' ELSE '0' END,
        |      '' ORDER BY a.idx) AS phash
        |  FROM ac a JOIN med m
        |    ON m.id = a.id AND m.frame_idx = a.frame_idx
        |  GROUP BY a.id, a.frame_idx
        |), fh AS (
        |  SELECT id, CAST(frame_idx AS INT) AS frame_idx,
        |    TRUE AS decode_ok, phash
        |  FROM ph
        |  UNION ALL
        |  SELECT -1, 0, FALSE, NULL
        |  UNION ALL
        |  SELECT -4, 0, FALSE, NULL
        |), lagd AS MATERIALIZED (
        |  SELECT id, frame_idx, decode_ok, phash,
        |    lag(phash) OVER (PARTITION BY id ORDER BY frame_idx)
        |      AS prev,
        |    lag(frame_idx) OVER (PARTITION BY id ORDER BY frame_idx)
        |      AS pidx
        |  FROM fh
        |), hamd AS (
        |  SELECT l.id, l.frame_idx,
        |    CAST(SUM(CASE WHEN substr(l.phash, ii.i, 1) <>
        |      substr(l.prev, ii.i, 1) THEN 1 ELSE 0 END) AS INT)
        |      AS hamming
        |  FROM lagd l, (SELECT unnest(range(1, 64)) AS i) ii
        |  WHERE l.phash IS NOT NULL AND l.prev IS NOT NULL
        |  GROUP BY 1, 2
        |)
        |SELECT l.id, l.frame_idx, l.decode_ok, l.phash, h.hamming,
        |  CASE WHEN l.frame_idx = 0 THEN TRUE
        |       WHEN h.hamming IS NOT NULL
        |         AND l.pidx = l.frame_idx - 1
        |         THEN h.hamming >= 10
        |       END AS scene_change
        |FROM lagd l LEFT JOIN hamd h
        |  ON h.id = l.id AND h.frame_idx = l.frame_idx
        |ORDER BY l.id, l.frame_idx""".stripMargin
    },

    // Q18: user-level bounded-contribution release — the capPerKey
    // window replay, domain counts, thresholds at ε/cap; the refusal
    // column is a constant TRUE (the operator's data-free refusal,
    // probed by the Spark side).
    "q338_dp_user_level" -> dpUserDomainOracle(
      Seq("click", "error", "purchase", "signup", "view"),
      epsilon = 0.8, seed = 81L, userCap = 8, clampK = 200),

    // Q19: the zCDP ledger replay — accounting literals re-derived
    // inline, 36 seed-rotated count releases replayed through one
    // seed VALUES table; basic_refused TRUE is the probed Σε
    // refusal.
    "q339_dp_zcdp_ledger" -> dpZcdpOracle(
      nReleases = 36, epsMicro = 100000L, seedBase = 100L,
      budgetMicro = 3450000L, deltaPow10 = 6,
      domain = Seq("de", "en", "es", "fr", "zh"),
      epsilon = 0.1, clampK = 200),

    // T62: recursive-CTE enumeration of every in-vocab segmentation,
    // Viterbi-tie ranking, md5-uniform pick — the shared literal
    // piece table, char fallback via the left-join COALESCE.
    "q340_nbest_encode" -> nbestEncodeOracle(nBest = 4, seed = 340L),

    // T65: the q340 chain + the α-posterior weight lookup over the
    // quantized Δscore grid and the exact cumulative-weight pick.
    "q353_alpha_nbest_encode" -> alphaNbestEncodeOracle(
      nBest = 4, seed = 353L, alphaMilli = 500L, gridMicro = 20000L),

    // T64: the run-collapse replay — lag run starts, prefix-sum run
    // ids, per-run ranks, NULL-skipping ordered string_agg of the
    // kept tokens.
    "q343_collapse_runs" ->
      """WITH t AS MATERIALIZED (
        |  SELECT doc_id, w, pos FROM (
        |    SELECT doc_id,
        |      unnest(string_split_regex(text, '\s+')) AS w,
        |      generate_subscripts(string_split_regex(text, '\s+'), 1)
        |        AS pos
        |    FROM documents WHERE text IS NOT NULL)
        |  WHERE w <> ''
        |), l AS (
        |  SELECT doc_id, w, pos,
        |    CASE WHEN lag(w) OVER (PARTITION BY doc_id ORDER BY pos)
        |      IS DISTINCT FROM w THEN 1 ELSE 0 END AS rs
        |  FROM t
        |), r AS (
        |  SELECT doc_id, w, pos,
        |    SUM(rs) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS run
        |  FROM l
        |), rr AS (
        |  SELECT doc_id, w, pos, run, row_number() OVER (
        |    PARTITION BY doc_id, run ORDER BY pos) AS rr
        |  FROM r
        |)
        |SELECT doc_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_tokens_before,
        |  CAST(SUM(CASE WHEN rr <= 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_tokens_after,
        |  CAST(COUNT(DISTINCT CASE WHEN rr > 1 THEN run END)
        |    AS BIGINT) AS n_runs_collapsed,
        |  CAST(length(string_agg(CASE WHEN rr <= 1 THEN w END, ' '
        |    ORDER BY pos)) AS BIGINT) AS repaired_len,
        |  md5(string_agg(CASE WHEN rr <= 1 THEN w END, ' '
        |    ORDER BY pos)) AS repaired_md5
        |FROM rr GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Q20: the amplified ledger replay — inline ⌈ln(1+q(e^ε−1))⌉
    // accounting literals, per-release deterministic 5% subsample,
    // the Q10b mechanism per rotated seed pair.
    "q347_dp_amplified_ledger" -> dpAmplifiedOracle(
      nReleases = 4, epsMicro = 1000000L, ratePerMille = 50,
      mSeedBase = 400L, sSeedBase = 500L, budgetMicro = 500000L,
      domain = Seq("de", "en", "es", "fr", "zh"),
      epsilon = 1.0, clampK = 39),

    // Q21: the zCDP-parallel ledger replay — accounting literals
    // from the operator's own zcdpParallelAccounting, shard count
    // mechanisms replayed per (shard, week, seed); the three
    // comparator refusals are constant TRUE (data-free, probed by
    // the Spark side).
    "q348_dp_zcdp_parallel" -> dpZcdpParallelOracle(
      shards = Seq(
        ("de_en", Seq("de", "en"), 610L),
        ("es_fr_zh", Seq("es", "fr", "zh"), 710L)),
      nWeeks = 36, epsMicro = 100000L, budgetMicro = 3450000L,
      deltaPow10 = 6, epsilon = 0.1, clampK = 200),

    // Q22: user-level bounded-contribution SUM release — the
    // capPerKey window + value clamp replay, domain sums,
    // thresholds at ε/(cap·clampHi).
    "q349_dp_user_sum" -> dpUserSumDomainOracle(
      Seq("click", "error", "purchase", "signup", "view"),
      epsilon = 0.8, seed = 91L, userCap = 4, clampHi = 4L,
      clampK = 400),

    // T63: unrolled batch-perceptron epochs — integer design matrix,
    // LEFT-JOIN margins, tie-counts-as-error, UNION-merged weights.
    "q341_quality_perceptron" -> perceptronOracle(
      buckets = 256, epochs = 4,
      stopwords = graft.operators.TextAnalysis.langProfiles.toMap
        .apply("en"),
      minHits = 2, confusion = false),

    // T63 companion: final-weights margin-sign confusion cells.
    "q342_perceptron_confusion" -> perceptronOracle(
      buckets = 256, epochs = 4,
      stopwords = graft.operators.TextAnalysis.langProfiles.toMap
        .apply("en"),
      minHits = 2, confusion = true),

    // M14: both perceptual pipelines replayed from the pixel formula
    // — aHash via the q304 block CTEs, pHash via the literal
    // fixed-point cosine table (two exact integer matrix passes +
    // the order-statistic median), then per-character pair hammings.
    "q317_phash_ramp_pairs" -> {
      val dctRows = graft.operators.Multimodal.phashDctTable(16)
        .map { case (i, u, c) => s"($i, $u, $c)" }
        .mkString(",\n        |    ")
      s"""WITH ids AS (
        |  SELECT CAST(p_partkey AS BIGINT) AS id,
        |    CAST(p_partkey AS BIGINT) AS seed, 0 AS ramp FROM part
        |  WHERE p_partkey % 10 = 0
        |  UNION ALL
        |  SELECT CAST(-(p_partkey + 1) AS BIGINT),
        |    CAST(p_partkey AS BIGINT), 40 FROM part
        |  WHERE p_partkey % 10 = 0
        |), px AS (
        |  SELECT id, seed, seed % 11 AS s11, seed % 13 AS s13,
        |    seed % 7 AS s7, ramp, x.x, y.y FROM ids,
        |    (SELECT unnest(range(0, 16)) AS x) x,
        |    (SELECT unnest(range(0, 16)) AS y) y
        |), lum AS MATERIALIZED (
        |  SELECT id, x, y,
        |    299 * LEAST(255, (seed * 7 + (1 + s11) * x +
        |      (2 + s13) * y + (1 + s7) * x * y) % 256 +
        |      ramp * x // 16)
        |  + 587 * LEAST(255, (seed * 11 + (3 + s13) * x +
        |      (1 + s11) * y + (2 + s7) * x * y) % 256 +
        |      ramp * x // 16)
        |  + 114 * LEAST(255, (seed * 13 + (2 + s11) * x +
        |      (3 + s13) * y + (3 + s7) * x * y) % 256 +
        |      ramp * x // 16) AS luma
        |  FROM px
        |), blk AS (
        |  SELECT id, (y * 8 // 16) * 8 + (x * 8 // 16) AS bi,
        |    SUM(luma) AS s, COUNT(*) AS c
        |  FROM lum GROUP BY 1, 2
        |), tot AS (
        |  SELECT id, SUM(s) AS t, SUM(c) AS n FROM blk GROUP BY 1
        |), ah AS MATERIALIZED (
        |  SELECT b.id,
        |    string_agg(CASE WHEN b.s * t.n > t.t * b.c
        |      THEN '1' ELSE '0' END, '' ORDER BY b.bi) AS ahash
        |  FROM blk b JOIN tot t USING (id) GROUP BY b.id
        |), dct(i, u, c) AS (
        |  VALUES
        |    $dctRows
        |), st1 AS (
        |  SELECT l.id, l.x, d.u AS v, SUM(l.luma * d.c) AS s1
        |  FROM lum l JOIN dct d ON d.i = l.y
        |  GROUP BY 1, 2, 3
        |), coef AS (
        |  SELECT s.id, d.u, s.v, CAST(SUM(s.s1 * d.c) AS BIGINT)
        |    AS cf
        |  FROM st1 s JOIN dct d ON d.i = s.x
        |  GROUP BY 1, 2, 3
        |), ac AS (
        |  SELECT id, u * 8 + v AS idx, cf FROM coef
        |  WHERE NOT (u = 0 AND v = 0)
        |), med AS (
        |  SELECT id, cf AS m FROM (
        |    SELECT id, cf, row_number() OVER (
        |      PARTITION BY id ORDER BY cf) AS rn
        |    FROM ac) WHERE rn = 32
        |), ph AS MATERIALIZED (
        |  SELECT a.id,
        |    string_agg(CASE WHEN a.cf > m.m THEN '1' ELSE '0' END,
        |      '' ORDER BY a.idx) AS phash
        |  FROM ac a JOIN med m USING (id) GROUP BY a.id
        |), pa AS (
        |  SELECT b.id,
        |    CAST(SUM(CASE WHEN substr(b.ahash, ii.i, 1) <>
        |      substr(tw.ahash, ii.i, 1) THEN 1 ELSE 0 END) AS INT)
        |      AS ahash_hamming
        |  FROM ah b JOIN ah tw ON tw.id = -(b.id) - 1,
        |    (SELECT unnest(range(1, 65)) AS i) ii
        |  WHERE b.id >= 0 GROUP BY 1
        |), pp AS (
        |  SELECT b.id,
        |    CAST(SUM(CASE WHEN substr(b.phash, ii.i, 1) <>
        |      substr(tw.phash, ii.i, 1) THEN 1 ELSE 0 END) AS INT)
        |      AS phash_hamming
        |  FROM ph b JOIN ph tw ON tw.id = -(b.id) - 1,
        |    (SELECT unnest(range(1, 64)) AS i) ii
        |  WHERE b.id >= 0 GROUP BY 1
        |)
        |SELECT pa.id, pa.ahash_hamming, pp.phash_hamming
        |FROM pa JOIN pp USING (id)
        |ORDER BY id""".stripMargin
    },

    // Q15: ledger literals (exact integer micro-ε arithmetic) joined
    // to per-release audits over the FULL mechanism replays — the
    // three generated Q10b/Q14/Q12 oracles run as subqueries, so the
    // gate verifies the composed suite end-to-end.
    "q316_dp_budget_ledger" -> {
      val lang = dpDomainOracle(
        domain = Seq("de", "en", "es", "fr", "zh", "xx", "yy"),
        epsilon = 0.4, seed = 47L, clampK = 39)
      val hist = dpHistOracle(
        edges = (0L to 500L by 50L), epsilon = 0.5, seed = 48L,
        clampK = 39)
      val sums = dpSumOracle(
        epsilon = 0.3, seed = 49L, clampHi = 8L, clampK = 534)
      s"""WITH rel(seq, release, eps_micro, cum_eps_micro) AS (VALUES
         |  (1, 'lang_counts', 400000, 400000),
         |  (2, 'value_hist', 500000, 900000),
         |  (3, 'type_sums', 300000, 1200000)
         |), nr AS (
         |  SELECT 'lang_counts' AS release,
         |    CAST(COUNT(*) AS BIGINT) AS n_rows,
         |    CAST(SUM(released_count) AS BIGINT) AS released_total
         |  FROM ($lang)
         |  UNION ALL
         |  SELECT 'value_hist', CAST(COUNT(*) AS BIGINT),
         |    CAST(SUM(released_count) AS BIGINT)
         |  FROM ($hist)
         |  UNION ALL
         |  SELECT 'type_sums', CAST(COUNT(*) AS BIGINT),
         |    CAST(SUM(released_sum) AS BIGINT)
         |  FROM ($sums)
         |)
         |SELECT CAST(r.seq AS INT) AS seq, r.release,
         |  CAST(r.eps_micro AS BIGINT) AS eps_micro,
         |  CAST(r.cum_eps_micro AS BIGINT) AS cum_eps_micro,
         |  CAST(1500000 AS BIGINT) AS budget_micro,
         |  CAST(1500000 - r.cum_eps_micro AS BIGINT)
         |    AS remaining_micro,
         |  n.n_rows, n.released_total
         |FROM rel r JOIN nr n ON n.release = r.release
         |ORDER BY seq""".stripMargin
    },

    // V30: IVF routing (q228's seed-cell CTEs) composed with the
    // q313 SQ8 encode/integer-dot replay — candidates restricted to
    // the probe's 2 routed cells; integer sums are order-free so the
    // composed rank is exact with zero float hazard.
    // V35: the q315 candidate chain over-fetched to 30, then the
    // exact-cosine re-rank on the candidate set only (the q19
    // round(6)+0.0 output discipline; ranking on unrounded values).
    "q345_retrieve_rerank" ->
      """WITH el AS MATERIALIZED (
        |  SELECT vec_id, generate_subscripts(embedding,1) AS d,
        |         unnest(embedding)::DOUBLE AS x
        |  FROM embeddings
        |), seed_ids AS (
        |  SELECT vec_id AS cell_vid,
        |    CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell
        |  FROM embeddings ORDER BY vec_id LIMIT 4
        |), snrm AS (
        |  SELECT s.cell, sqrt(SUM(e.x * e.x)) AS n
        |  FROM seed_ids s JOIN el e ON e.vec_id = s.cell_vid
        |  GROUP BY s.cell
        |), vc AS (
        |  SELECT e.vec_id, s.cell, SUM(e.x * se.x) / any_value(sn.n)
        |    AS cosn
        |  FROM el e
        |  JOIN seed_ids s ON TRUE
        |  JOIN el se ON se.vec_id = s.cell_vid AND se.d = e.d
        |  JOIN snrm sn ON sn.cell = s.cell
        |  GROUP BY e.vec_id, s.cell
        |), assign AS (
        |  SELECT vec_id, cell FROM (
        |    SELECT vec_id, cell, row_number() OVER (
        |      PARTITION BY vec_id ORDER BY cosn DESC, cell) AS rn
        |    FROM vc) WHERE rn = 1
        |), pcells AS (
        |  SELECT vec_id AS probe_id, cell FROM (
        |    SELECT vec_id, cell, row_number() OVER (
        |      PARTITION BY vec_id ORDER BY cosn DESC, cell) AS rn
        |    FROM vc WHERE vec_id < 5) WHERE rn <= 2
        |), m AS (
        |  SELECT 127.0 / (CASE WHEN MAX(abs(x)) > 0.0
        |    THEN MAX(abs(x)) END) AS r FROM el
        |), enc AS (
        |  SELECT vec_id, d, CAST(floor(x * m.r + 0.5) AS BIGINT) AS c
        |  FROM el, m
        |), dots AS (
        |  SELECT p.probe_id, e.vec_id,
        |    CAST(SUM(pe.c * e.c) AS BIGINT) AS s
        |  FROM pcells p
        |  JOIN assign a ON a.cell = p.cell
        |  JOIN enc e ON e.vec_id = a.vec_id AND e.vec_id <> p.probe_id
        |  JOIN enc pe ON pe.vec_id = p.probe_id AND pe.d = e.d
        |  GROUP BY 1, 2
        |), cand AS MATERIALIZED (
        |  SELECT probe_id, vec_id FROM (
        |    SELECT probe_id, vec_id, row_number() OVER (
        |      PARTITION BY probe_id ORDER BY s DESC, vec_id) AS rnk
        |    FROM dots) WHERE rnk <= 30
        |), nrm AS (
        |  SELECT vec_id, sqrt(SUM(x * x)) AS n FROM el GROUP BY 1
        |), cosd AS (
        |  SELECT c.probe_id, c.vec_id,
        |    SUM(e.x * pe.x) / (any_value(nv.n) * any_value(np.n))
        |      AS cosine
        |  FROM cand c
        |  JOIN el e ON e.vec_id = c.vec_id
        |  JOIN el pe ON pe.vec_id = c.probe_id AND pe.d = e.d
        |  JOIN nrm nv ON nv.vec_id = c.vec_id
        |  JOIN nrm np ON np.vec_id = c.probe_id
        |  GROUP BY 1, 2
        |)
        |SELECT probe_id, vec_id, CAST(rank AS INT) AS rank,
        |  round(cosine, 6) + 0.0 AS cosine
        |FROM (
        |  SELECT probe_id, vec_id, cosine,
        |    row_number() OVER (PARTITION BY probe_id
        |                       ORDER BY cosine DESC, vec_id) AS rank
        |  FROM cosd)
        |WHERE rank <= 10
        |ORDER BY probe_id, rank""".stripMargin,

    // V35 readout: sq8 top-5 and reranked top-5 hit counts against
    // one exact ground-truth pass — the same chain at nlist 8,
    // nprobe 2, 25 candidates, probes 8..16.
    "q346_rerank_recall" ->
      """WITH el AS MATERIALIZED (
        |  SELECT vec_id, generate_subscripts(embedding,1) AS d,
        |         unnest(embedding)::DOUBLE AS x
        |  FROM embeddings
        |), seed_ids AS (
        |  SELECT vec_id AS cell_vid,
        |    CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell
        |  FROM embeddings ORDER BY vec_id LIMIT 8
        |), snrm AS (
        |  SELECT s.cell, sqrt(SUM(e.x * e.x)) AS n
        |  FROM seed_ids s JOIN el e ON e.vec_id = s.cell_vid
        |  GROUP BY s.cell
        |), vc AS (
        |  SELECT e.vec_id, s.cell, SUM(e.x * se.x) / any_value(sn.n)
        |    AS cosn
        |  FROM el e
        |  JOIN seed_ids s ON TRUE
        |  JOIN el se ON se.vec_id = s.cell_vid AND se.d = e.d
        |  JOIN snrm sn ON sn.cell = s.cell
        |  GROUP BY e.vec_id, s.cell
        |), assign AS (
        |  SELECT vec_id, cell FROM (
        |    SELECT vec_id, cell, row_number() OVER (
        |      PARTITION BY vec_id ORDER BY cosn DESC, cell) AS rn
        |    FROM vc) WHERE rn = 1
        |), pcells AS (
        |  SELECT vec_id AS probe_id, cell FROM (
        |    SELECT vec_id, cell, row_number() OVER (
        |      PARTITION BY vec_id ORDER BY cosn DESC, cell) AS rn
        |    FROM vc WHERE vec_id >= 8 AND vec_id < 16)
        |  WHERE rn <= 2
        |), m AS (
        |  SELECT 127.0 / (CASE WHEN MAX(abs(x)) > 0.0
        |    THEN MAX(abs(x)) END) AS r FROM el
        |), enc AS (
        |  SELECT vec_id, d, CAST(floor(x * m.r + 0.5) AS BIGINT) AS c
        |  FROM el, m
        |), dots AS (
        |  SELECT p.probe_id, e.vec_id,
        |    CAST(SUM(pe.c * e.c) AS BIGINT) AS s
        |  FROM pcells p
        |  JOIN assign a ON a.cell = p.cell
        |  JOIN enc e ON e.vec_id = a.vec_id AND e.vec_id <> p.probe_id
        |  JOIN enc pe ON pe.vec_id = p.probe_id AND pe.d = e.d
        |  GROUP BY 1, 2
        |), ranked AS MATERIALIZED (
        |  SELECT probe_id, vec_id, row_number() OVER (
        |    PARTITION BY probe_id ORDER BY s DESC, vec_id) AS rnk
        |  FROM dots
        |), sq8top AS (
        |  SELECT probe_id, vec_id FROM ranked WHERE rnk <= 5
        |), cand AS (
        |  SELECT probe_id, vec_id FROM ranked WHERE rnk <= 25
        |), nrm AS MATERIALIZED (
        |  SELECT vec_id, sqrt(SUM(x * x)) AS n FROM el GROUP BY 1
        |), pr AS (
        |  SELECT vec_id AS probe_id, d, x FROM el
        |  WHERE vec_id >= 8 AND vec_id < 16
        |), gdots AS (
        |  SELECT p.probe_id, e.vec_id, SUM(p.x * e.x) AS dp
        |  FROM pr p JOIN el e ON e.d = p.d AND e.vec_id <> p.probe_id
        |  GROUP BY 1, 2
        |), gcs AS (
        |  SELECT g.probe_id, g.vec_id, g.dp / (np.n * nv.n) AS cosine
        |  FROM gdots g
        |  JOIN nrm np ON np.vec_id = g.probe_id
        |  JOIN nrm nv ON nv.vec_id = g.vec_id
        |), exact AS MATERIALIZED (
        |  SELECT probe_id, vec_id FROM (
        |    SELECT probe_id, vec_id, row_number() OVER (
        |      PARTITION BY probe_id ORDER BY cosine DESC, vec_id)
        |      AS rnk
        |    FROM gcs) WHERE rnk <= 5
        |), gtot AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS exact_pairs,
        |    CAST(COUNT(DISTINCT probe_id) AS BIGINT) AS n_probes
        |  FROM exact
        |), rcs AS (
        |  SELECT c.probe_id, c.vec_id,
        |    SUM(e.x * pe.x) / (any_value(nv.n) * any_value(np.n))
        |      AS cosine
        |  FROM cand c
        |  JOIN el e ON e.vec_id = c.vec_id
        |  JOIN el pe ON pe.vec_id = c.probe_id AND pe.d = e.d
        |  JOIN nrm nv ON nv.vec_id = c.vec_id
        |  JOIN nrm np ON np.vec_id = c.probe_id
        |  GROUP BY 1, 2
        |), rtop AS (
        |  SELECT probe_id, vec_id FROM (
        |    SELECT probe_id, vec_id, row_number() OVER (
        |      PARTITION BY probe_id ORDER BY cosine DESC, vec_id)
        |      AS rnk
        |    FROM rcs) WHERE rnk <= 5
        |), hits AS (
        |  SELECT 'sq8_top_k' AS stage,
        |    CAST(COUNT(*) AS BIGINT) AS hit_pairs
        |  FROM sq8top s JOIN exact x
        |    ON x.probe_id = s.probe_id AND x.vec_id = s.vec_id
        |  UNION ALL
        |  SELECT 'rerank', CAST(COUNT(*) AS BIGINT)
        |  FROM rtop r JOIN exact x
        |    ON x.probe_id = r.probe_id AND x.vec_id = r.vec_id
        |)
        |SELECT h.stage, g.n_probes, g.exact_pairs, h.hit_pairs,
        |  round(CAST(h.hit_pairs AS DOUBLE)
        |    / CASE WHEN g.exact_pairs > 0
        |        THEN CAST(g.exact_pairs AS DOUBLE) END, 6) AS recall
        |FROM hits h, gtot g ORDER BY stage""".stripMargin,

    // V36: the q346 chain swept over candidate budgets — stage-1
    // ranking materialized ONCE at max C, exact candidate cosines
    // scored once, each budget a rnk filter + per-probe re-rank;
    // stage2_pairs counts the re-scores that budget bought.
    "q351_rerank_budget_sweep" ->
      """WITH el AS MATERIALIZED (
        |  SELECT vec_id, generate_subscripts(embedding,1) AS d,
        |         unnest(embedding)::DOUBLE AS x
        |  FROM embeddings
        |), seed_ids AS (
        |  SELECT vec_id AS cell_vid,
        |    CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell
        |  FROM embeddings ORDER BY vec_id LIMIT 8
        |), snrm AS (
        |  SELECT s.cell, sqrt(SUM(e.x * e.x)) AS n
        |  FROM seed_ids s JOIN el e ON e.vec_id = s.cell_vid
        |  GROUP BY s.cell
        |), vc AS (
        |  SELECT e.vec_id, s.cell, SUM(e.x * se.x) / any_value(sn.n)
        |    AS cosn
        |  FROM el e
        |  JOIN seed_ids s ON TRUE
        |  JOIN el se ON se.vec_id = s.cell_vid AND se.d = e.d
        |  JOIN snrm sn ON sn.cell = s.cell
        |  GROUP BY e.vec_id, s.cell
        |), assign AS (
        |  SELECT vec_id, cell FROM (
        |    SELECT vec_id, cell, row_number() OVER (
        |      PARTITION BY vec_id ORDER BY cosn DESC, cell) AS rn
        |    FROM vc) WHERE rn = 1
        |), pcells AS (
        |  SELECT vec_id AS probe_id, cell FROM (
        |    SELECT vec_id, cell, row_number() OVER (
        |      PARTITION BY vec_id ORDER BY cosn DESC, cell) AS rn
        |    FROM vc WHERE vec_id >= 8 AND vec_id < 16)
        |  WHERE rn <= 2
        |), m AS (
        |  SELECT 127.0 / (CASE WHEN MAX(abs(x)) > 0.0
        |    THEN MAX(abs(x)) END) AS r FROM el
        |), enc AS (
        |  SELECT vec_id, d, CAST(floor(x * m.r + 0.5) AS BIGINT) AS c
        |  FROM el, m
        |), dots AS (
        |  SELECT p.probe_id, e.vec_id,
        |    CAST(SUM(pe.c * e.c) AS BIGINT) AS s
        |  FROM pcells p
        |  JOIN assign a ON a.cell = p.cell
        |  JOIN enc e ON e.vec_id = a.vec_id AND e.vec_id <> p.probe_id
        |  JOIN enc pe ON pe.vec_id = p.probe_id AND pe.d = e.d
        |  GROUP BY 1, 2
        |), ranked AS MATERIALIZED (
        |  SELECT probe_id, vec_id, row_number() OVER (
        |    PARTITION BY probe_id ORDER BY s DESC, vec_id) AS rnk
        |  FROM dots
        |), nrm AS MATERIALIZED (
        |  SELECT vec_id, sqrt(SUM(x * x)) AS n FROM el GROUP BY 1
        |), pr AS (
        |  SELECT vec_id AS probe_id, d, x FROM el
        |  WHERE vec_id >= 8 AND vec_id < 16
        |), gdots AS (
        |  SELECT p.probe_id, e.vec_id, SUM(p.x * e.x) AS dp
        |  FROM pr p JOIN el e ON e.d = p.d AND e.vec_id <> p.probe_id
        |  GROUP BY 1, 2
        |), gcs AS (
        |  SELECT g.probe_id, g.vec_id, g.dp / (np.n * nv.n) AS cosine
        |  FROM gdots g
        |  JOIN nrm np ON np.vec_id = g.probe_id
        |  JOIN nrm nv ON nv.vec_id = g.vec_id
        |), exact AS MATERIALIZED (
        |  SELECT probe_id, vec_id FROM (
        |    SELECT probe_id, vec_id, row_number() OVER (
        |      PARTITION BY probe_id ORDER BY cosine DESC, vec_id)
        |      AS rnk
        |    FROM gcs) WHERE rnk <= 5
        |), gtot AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS exact_pairs,
        |    CAST(COUNT(DISTINCT probe_id) AS BIGINT) AS n_probes
        |  FROM exact
        |), rcs AS MATERIALIZED (
        |  SELECT c.probe_id, c.vec_id, c.rnk,
        |    SUM(e.x * pe.x) / (any_value(nv.n) * any_value(np.n))
        |      AS cosine
        |  FROM (SELECT probe_id, vec_id, rnk FROM ranked
        |        WHERE rnk <= 50) c
        |  JOIN el e ON e.vec_id = c.vec_id
        |  JOIN el pe ON pe.vec_id = c.probe_id AND pe.d = e.d
        |  JOIN nrm nv ON nv.vec_id = c.vec_id
        |  JOIN nrm np ON np.vec_id = c.probe_id
        |  GROUP BY 1, 2, 3
        |), buds(b) AS (VALUES (5), (10), (25), (50)),
        |sub AS MATERIALIZED (
        |  SELECT b.b, r.probe_id, r.vec_id, r.cosine
        |  FROM buds b JOIN rcs r ON r.rnk <= b.b
        |), s2 AS (
        |  SELECT b, CAST(COUNT(*) AS BIGINT) AS stage2_pairs
        |  FROM sub GROUP BY 1
        |), rtop AS (
        |  SELECT b, probe_id, vec_id FROM (
        |    SELECT b, probe_id, vec_id, row_number() OVER (
        |      PARTITION BY b, probe_id ORDER BY cosine DESC, vec_id)
        |      AS rnk
        |    FROM sub) WHERE rnk <= 5
        |), hits AS (
        |  SELECT r.b, CAST(COUNT(*) AS BIGINT) AS hit_pairs
        |  FROM rtop r JOIN exact x
        |    ON x.probe_id = r.probe_id AND x.vec_id = r.vec_id
        |  GROUP BY 1
        |)
        |SELECT CAST(b.b AS INT) AS candidates, g.n_probes,
        |  g.exact_pairs,
        |  COALESCE(h.hit_pairs, CAST(0 AS BIGINT)) AS hit_pairs,
        |  round(CAST(COALESCE(h.hit_pairs, 0) AS DOUBLE)
        |    / CASE WHEN g.exact_pairs > 0
        |        THEN CAST(g.exact_pairs AS DOUBLE) END, 6) AS recall,
        |  s.stage2_pairs
        |FROM buds b
        |CROSS JOIN gtot g
        |JOIN s2 s ON s.b = b.b
        |LEFT JOIN hits h ON h.b = b.b
        |ORDER BY candidates""".stripMargin,

    "q315_ivf_sq8_search" ->
      """WITH el AS (
        |  SELECT vec_id, generate_subscripts(embedding,1) AS d,
        |         unnest(embedding)::DOUBLE AS x
        |  FROM embeddings
        |), seed_ids AS (
        |  SELECT vec_id AS cell_vid,
        |    CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell
        |  FROM embeddings ORDER BY vec_id LIMIT 4
        |), snrm AS (
        |  SELECT s.cell, sqrt(SUM(e.x * e.x)) AS n
        |  FROM seed_ids s JOIN el e ON e.vec_id = s.cell_vid
        |  GROUP BY s.cell
        |), vc AS (
        |  SELECT e.vec_id, s.cell, SUM(e.x * se.x) / any_value(sn.n)
        |    AS cosn
        |  FROM el e
        |  JOIN seed_ids s ON TRUE
        |  JOIN el se ON se.vec_id = s.cell_vid AND se.d = e.d
        |  JOIN snrm sn ON sn.cell = s.cell
        |  GROUP BY e.vec_id, s.cell
        |), assign AS (
        |  SELECT vec_id, cell FROM (
        |    SELECT vec_id, cell, row_number() OVER (
        |      PARTITION BY vec_id ORDER BY cosn DESC, cell) AS rn
        |    FROM vc) WHERE rn = 1
        |), pcells AS (
        |  SELECT vec_id AS probe_id, cell FROM (
        |    SELECT vec_id, cell, row_number() OVER (
        |      PARTITION BY vec_id ORDER BY cosn DESC, cell) AS rn
        |    FROM vc WHERE vec_id < 5) WHERE rn <= 2
        |), m AS (
        |  SELECT 127.0 / (CASE WHEN MAX(abs(x)) > 0.0
        |    THEN MAX(abs(x)) END) AS r FROM el
        |), enc AS (
        |  SELECT vec_id, d, CAST(floor(x * m.r + 0.5) AS BIGINT) AS c
        |  FROM el, m
        |), dots AS (
        |  SELECT p.probe_id, a.cell, e.vec_id,
        |    CAST(SUM(pe.c * e.c) AS BIGINT) AS s
        |  FROM pcells p
        |  JOIN assign a ON a.cell = p.cell
        |  JOIN enc e ON e.vec_id = a.vec_id AND e.vec_id <> p.probe_id
        |  JOIN enc pe ON pe.vec_id = p.probe_id AND pe.d = e.d
        |  GROUP BY 1, 2, 3
        |)
        |SELECT probe_id, cell, vec_id, CAST(rank AS INT) AS rank,
        |  s AS score_int
        |FROM (
        |  SELECT probe_id, cell, vec_id, s,
        |    row_number() OVER (PARTITION BY probe_id
        |                       ORDER BY s DESC, vec_id) AS rank
        |  FROM dots)
        |WHERE rank <= 10
        |ORDER BY probe_id, rank""".stripMargin,

    // E45: cluster readout replay — per-cluster decimal totals,
    // contaminated clusters excluded, the q306 Welch + erf chain.
    "q312_cluster_readout" ->
      """WITH base AS (
        |  SELECT user_id AS c,
        |    CASE WHEN event_id % 997 = 0 THEN NOT (user_id % 3 = 0)
        |      ELSE (user_id % 3 = 0) END AS a,
        |    CAST(floor("value" * 1000000) AS BIGINT) AS v
        |  FROM events
        |  WHERE user_id IS NOT NULL AND "value" IS NOT NULL
        |), pc AS (
        |  SELECT c, COUNT(DISTINCT a) AS narm, MAX(a) AS a,
        |    CAST(SUM(CAST(v AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS m
        |  FROM base GROUP BY 1
        |), agg AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN narm > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_contaminated,
        |    CAST(SUM(CASE WHEN narm = 1 AND a THEN 1 ELSE 0 END)
        |      AS BIGINT) AS na,
        |    CAST(SUM(CASE WHEN narm = 1 AND NOT a THEN 1 ELSE 0 END)
        |      AS BIGINT) AS nb,
        |    CAST(SUM(CASE WHEN narm = 1 AND a THEN m
        |      ELSE CAST(0 AS DECIMAL(38,0)) END) AS DECIMAL(38,0))
        |      AS sa,
        |    CAST(SUM(CASE WHEN narm = 1 AND NOT a THEN m
        |      ELSE CAST(0 AS DECIMAL(38,0)) END) AS DECIMAL(38,0))
        |      AS sb,
        |    CAST(SUM(CASE WHEN narm = 1 AND a THEN m * m
        |      ELSE CAST(0 AS DECIMAL(38,0)) END) AS DECIMAL(38,0))
        |      AS qa,
        |    CAST(SUM(CASE WHEN narm = 1 AND NOT a THEN m * m
        |      ELSE CAST(0 AS DECIMAL(38,0)) END) AS DECIMAL(38,0))
        |      AS qb
        |  FROM pc
        |), fin AS (
        |  SELECT n_contaminated, na, nb,
        |    CAST(sa AS DOUBLE) / CAST(na AS DOUBLE) AS ma,
        |    CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE) AS mb,
        |    sqrt(
        |      ((CAST(na AS DOUBLE) * CAST(qa AS DOUBLE)
        |          - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
        |        / (CAST(na AS DOUBLE) * (CAST(na AS DOUBLE) - 1.0)))
        |        / CAST(na AS DOUBLE)
        |      + ((CAST(nb AS DOUBLE) * CAST(qb AS DOUBLE)
        |          - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE))
        |        / (CAST(nb AS DOUBLE) * (CAST(nb AS DOUBLE) - 1.0)))
        |        / CAST(nb AS DOUBLE)) AS se
        |  FROM agg
        |), zt AS (
        |  SELECT *, CASE WHEN na >= 2 AND nb >= 2 AND se > 0.0
        |    THEN round((ma - mb) / se, 6) + 0.0 END AS z
        |  FROM fin
        |), pt AS (
        |  SELECT *, abs(z) / sqrt(2.0) AS x,
        |    1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2.0))) AS t
        |  FROM zt
        |)
        |SELECT na AS n_clusters_a, nb AS n_clusters_b, n_contaminated,
        |  CASE WHEN na > 0 THEN round(ma / 1000000.0, 6) END AS mean_a,
        |  CASE WHEN nb > 0 THEN round(mb / 1000000.0, 6) END AS mean_b,
        |  CASE WHEN na > 0 AND nb > 0 THEN
        |    round((ma - mb) / 1000000.0, 6) + 0.0 END AS diff,
        |  z,
        |  round(t * (0.254829592 + t * (-0.284496736 +
        |    t * (1.421413741 + t * (-1.453152027 +
        |      t * 1.061405429)))) * exp(-(x * x)), 6) AS p_value
        |FROM pt""".stripMargin,

    // E44: winsorized readout replay — q120's nearest-rank pooled
    // edges on the micro grid, decimal winsorized moments, the
    // op-for-op Welch finish + erf-polynomial p on the rounded z.
    "q306_winsorized_readout" ->
      """WITH base AS (
        |  SELECT event_type, (user_id % 3 = 0) AS a,
        |    CAST(floor("value" * 1000000) AS BIGINT) AS v
        |  FROM events
        |  WHERE user_id IS NOT NULL AND "value" IS NOT NULL
        |), r AS (
        |  SELECT event_type, v,
        |    row_number() OVER (PARTITION BY event_type ORDER BY v) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM base
        |), e AS (
        |  SELECT event_type, MIN(v) AS lo_u, MAX(v) AS hi_u
        |  FROM r
        |  WHERE rn = greatest(1, CAST(ceil(0.05 * n) AS BIGINT))
        |     OR rn = least(n, CAST(ceil(0.95 * n) AS BIGINT))
        |  GROUP BY 1
        |), wz AS (
        |  SELECT b.event_type, b.a, b.v, e.lo_u, e.hi_u,
        |    LEAST(GREATEST(b.v, e.lo_u), e.hi_u) AS w
        |  FROM base b JOIN e USING (event_type)
        |), agg AS (
        |  SELECT event_type,
        |    CAST(SUM(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS na,
        |    CAST(SUM(CASE WHEN NOT a THEN 1 ELSE 0 END) AS BIGINT)
        |      AS nb,
        |    MIN(lo_u) AS lo_u, MAX(hi_u) AS hi_u,
        |    CAST(SUM(CASE WHEN v < lo_u THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_clip_lo,
        |    CAST(SUM(CASE WHEN v > hi_u THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_clip_hi,
        |    CAST(SUM(CASE WHEN a THEN CAST(w AS DECIMAL(18,0))
        |      ELSE CAST(0 AS DECIMAL(18,0)) END) AS DECIMAL(38,0))
        |      AS sa,
        |    CAST(SUM(CASE WHEN NOT a THEN CAST(w AS DECIMAL(18,0))
        |      ELSE CAST(0 AS DECIMAL(18,0)) END) AS DECIMAL(38,0))
        |      AS sb,
        |    CAST(SUM(CASE WHEN a THEN
        |        CAST(w AS DECIMAL(18,0)) * CAST(w AS DECIMAL(18,0))
        |      ELSE CAST(0 AS DECIMAL(38,0)) END) AS DECIMAL(38,0))
        |      AS qa,
        |    CAST(SUM(CASE WHEN NOT a THEN
        |        CAST(w AS DECIMAL(18,0)) * CAST(w AS DECIMAL(18,0))
        |      ELSE CAST(0 AS DECIMAL(38,0)) END) AS DECIMAL(38,0))
        |      AS qb
        |  FROM wz GROUP BY 1
        |), fin AS (
        |  SELECT event_type, na, nb, lo_u, hi_u, n_clip_lo, n_clip_hi,
        |    CAST(sa AS DOUBLE) / CAST(na AS DOUBLE) AS ma,
        |    CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE) AS mb,
        |    sqrt(
        |      ((CAST(na AS DOUBLE) * CAST(qa AS DOUBLE)
        |          - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
        |        / (CAST(na AS DOUBLE) * (CAST(na AS DOUBLE) - 1.0)))
        |        / CAST(na AS DOUBLE)
        |      + ((CAST(nb AS DOUBLE) * CAST(qb AS DOUBLE)
        |          - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE))
        |        / (CAST(nb AS DOUBLE) * (CAST(nb AS DOUBLE) - 1.0)))
        |        / CAST(nb AS DOUBLE)) AS se
        |  FROM agg
        |), zt AS (
        |  SELECT *, CASE WHEN na >= 2 AND nb >= 2 AND se > 0.0
        |    THEN round((ma - mb) / se, 6) + 0.0 END AS z
        |  FROM fin
        |), pt AS (
        |  SELECT *, abs(z) / sqrt(2.0) AS x,
        |    1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2.0))) AS t
        |  FROM zt
        |)
        |SELECT event_type, na AS n_a, nb AS n_b,
        |  round(CAST(lo_u AS DOUBLE) / 1000000.0, 6) AS lo,
        |  round(CAST(hi_u AS DOUBLE) / 1000000.0, 6) AS hi,
        |  n_clip_lo, n_clip_hi,
        |  CASE WHEN na > 0 THEN round(ma / 1000000.0, 6) END
        |    AS mean_w_a,
        |  CASE WHEN nb > 0 THEN round(mb / 1000000.0, 6) END
        |    AS mean_w_b,
        |  CASE WHEN na > 0 AND nb > 0 THEN
        |    round((ma - mb) / 1000000.0, 6) + 0.0 END AS diff_w,
        |  z,
        |  round(t * (0.254829592 + t * (-0.284496736 +
        |    t * (1.421413741 + t * (-1.453152027 +
        |      t * 1.061405429)))) * exp(-(x * x)), 6) AS p_value
        |FROM pt ORDER BY event_type""".stripMargin,

    // D24: blocking audit replay — the q16 LSH chain over the
    // dup-injected corpus, exact-dup truth pairs, HUGEINT total,
    // fixed-order double ratios.
    "q303_blocking_audit" ->
      """WITH all_docs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000, text FROM documents WHERE doc_id % 50 = 0
        |), toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM all_docs
        |), idx AS (
        |  SELECT doc_id, w, unnest(generate_series(1, len(w)-2)) AS i
        |  FROM toks
        |), sh AS (
        |  SELECT DISTINCT doc_id,
        |    w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle FROM idx
        |), mh AS (
        |  SELECT doc_id, s.seed,
        |    min(CAST(('0x' || substr(
        |      md5(CAST(s.seed AS VARCHAR) || ':' || shingle), 1, 15))
        |      AS BIGINT)) AS mh
        |  FROM sh CROSS JOIN (SELECT unnest(generate_series(0,7)) AS seed) s
        |  GROUP BY doc_id, s.seed
        |), bands AS (
        |  SELECT doc_id, seed // 2 AS band,
        |    string_agg(CAST(mh AS VARCHAR), '|' ORDER BY seed) AS sig
        |  FROM mh GROUP BY doc_id, seed // 2
        |), cand AS (
        |  SELECT DISTINCT a.doc_id AS pa, b.doc_id AS pb
        |  FROM bands a
        |  JOIN bands b ON a.band = b.band AND a.sig = b.sig
        |    AND a.doc_id < b.doc_id
        |), truthp AS (
        |  SELECT x.doc_id AS pa, y.doc_id AS pb
        |  FROM all_docs x JOIN all_docs y
        |    ON md5(x.text) = md5(y.text) AND x.doc_id < y.doc_id
        |), n1 AS (
        |  SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_records
        |  FROM all_docs
        |), c1 AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_candidates FROM cand
        |), t1 AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_truth FROM truthp
        |), h1 AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_hits
        |  FROM cand c JOIN truthp t ON t.pa = c.pa AND t.pb = c.pb
        |)
        |SELECT n_records,
        |  CAST(CAST(n_records AS HUGEINT)
        |    * CAST(n_records - 1 AS HUGEINT) // 2 AS VARCHAR)
        |    AS total_pairs,
        |  n_candidates, n_truth, n_hits,
        |  ROUND(1.0 - CAST(n_candidates AS DOUBLE)
        |    / (CASE WHEN n_records >= 2 THEN CAST(n_records AS DOUBLE)
        |        * (CAST(n_records AS DOUBLE) - 1.0) / 2.0 END), 6)
        |    AS reduction_ratio,
        |  ROUND(CAST(n_hits AS DOUBLE)
        |    / (CASE WHEN n_truth > 0 THEN CAST(n_truth AS DOUBLE) END),
        |    6) AS pairs_completeness,
        |  ROUND(CAST(n_hits AS DOUBLE)
        |    / (CASE WHEN n_candidates > 0
        |        THEN CAST(n_candidates AS DOUBLE) END), 6)
        |    AS pairs_quality
        |FROM n1, c1, t1, h1""".stripMargin,

    // Q14: public-bin histogram replay — generated conditional-sum
    // pass + the q288 mechanism over the (bin_lo, bin_hi) key.
    "q310_dp_histogram" -> dpHistOracle(
      edges = (0L to 500L by 50L), epsilon = 0.5, seed = 46L,
      clampK = 39),

    // Q13: exponential-mechanism DP quantile replay — the shared
    // literal weight table + grid, HUGEINT division-free pick.
    "q301_dp_quantile_release" -> dpQuantileOracle(
      grid = (0L to 512L by 16L), qNum = 1, qDen = 2,
      epsilon = 1.0, seed = 45L, clampUtil = 400),

    // T57: distinct doc/reference trigram sets, one membership join,
    // one per-doc reduce; shingle-less docs keep NULL rate.
    "q282_reference_overlap" ->
      """WITH toks AS (
        |  SELECT doc_id, source, string_split(text, ' ') AS w
        |  FROM documents
        |), dsh AS (
        |  SELECT DISTINCT doc_id,
        |    w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
        |  FROM (SELECT doc_id, w,
        |      unnest(generate_series(1, len(w) - 2)) AS i
        |    FROM toks WHERE source <> 'src0')
        |), rsh AS (
        |  SELECT DISTINCT w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
        |  FROM (SELECT w, unnest(generate_series(1, len(w) - 2)) AS i
        |    FROM toks WHERE source = 'src0')
        |), st AS (
        |  SELECT d.doc_id, COUNT(*) AS n_grams,
        |    CAST(SUM(CASE WHEN r.g IS NOT NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_in_ref
        |  FROM dsh d LEFT JOIN rsh r ON r.g = d.g
        |  GROUP BY 1
        |)
        |SELECT dd.doc_id,
        |  CAST(COALESCE(st.n_grams, 0) AS BIGINT) AS n_grams,
        |  CAST(COALESCE(st.n_in_ref, 0) AS BIGINT) AS n_in_ref,
        |  CASE WHEN COALESCE(st.n_grams, 0) > 0 THEN
        |    round(CAST(st.n_in_ref AS DOUBLE)
        |      / CAST(st.n_grams AS DOUBLE), 6) END AS overlap_rate
        |FROM (SELECT DISTINCT doc_id FROM documents
        |  WHERE source <> 'src0') dd
        |LEFT JOIN st ON st.doc_id = dd.doc_id
        |ORDER BY dd.doc_id""".stripMargin,

    // T56: q23/q24's hit/TTR recipes chained as cumulative stage
    // flags; exact integer masses, one round(6) ratio.
    "q280_curation_funnel" ->
      """WITH f AS (
        |  SELECT source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks,
        |    length(text) >= 100 AS s1,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      t -> list_contains(['the','a','of','and','is','to','in','it'], t))) AS INT) AS en_hits,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      t -> list_contains(['el','la','de','que','y','en','los','se'], t))) AS INT) AS es_hits,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      t -> list_contains(['le','la','de','et','les','des','un','une'], t))) AS INT) AS fr_hits,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      t -> list_contains(['der','die','und','das','ist','von','den','ein'], t))) AS INT) AS de_hits,
        |    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |      / CAST(len(string_split(text, ' ')) AS DOUBLE) AS ttr
        |  FROM documents WHERE text IS NOT NULL
        |), g AS (
        |  SELECT source, toks, s1, ttr,
        |    CASE
        |      WHEN en_hits > 0 AND en_hits >= es_hits
        |        AND en_hits >= fr_hits AND en_hits >= de_hits THEN 'en'
        |      WHEN es_hits > 0 AND es_hits >= fr_hits
        |        AND es_hits >= de_hits THEN 'es'
        |      WHEN fr_hits > 0 AND fr_hits >= de_hits THEN 'fr'
        |      WHEN de_hits > 0 THEN 'de'
        |      ELSE 'und' END AS lang
        |  FROM f
        |), h AS (
        |  SELECT source, toks, s1,
        |    s1 AND lang IN ('en','es','fr','de') AS s2,
        |    s1 AND lang IN ('en','es','fr','de') AND ttr >= 0.4 AS s3
        |  FROM g
        |)
        |SELECT source,
        |  COUNT(*) AS n_docs,
        |  CAST(SUM(toks) AS BIGINT) AS tokens_total,
        |  CAST(SUM(CASE WHEN s1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_after_length,
        |  CAST(SUM(CASE WHEN s1 THEN toks ELSE 0 END) AS BIGINT)
        |    AS tokens_after_length,
        |  CAST(SUM(CASE WHEN s2 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_after_lang,
        |  CAST(SUM(CASE WHEN s2 THEN toks ELSE 0 END) AS BIGINT)
        |    AS tokens_after_lang,
        |  CAST(SUM(CASE WHEN s3 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_after_ttr,
        |  CAST(SUM(CASE WHEN s3 THEN toks ELSE 0 END) AS BIGINT)
        |    AS tokens_after_ttr,
        |  round(CAST(SUM(CASE WHEN s3 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE), 6) AS keep_rate
        |FROM h GROUP BY source ORDER BY source""".stripMargin,

    // E38: daily aggregate + cumulative window sums over the bounded
    // day table, the q270 z->erf recipe per look; z signed (+0.0).
    "q278_srm_monitor" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n0,
        |    CAST(SUM(CASE WHEN user_id % 3 = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS narm0
        |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
        |  GROUP BY 1
        |), cum AS (
        |  SELECT day,
        |    CAST(row_number() OVER (ORDER BY day) AS INT) AS look,
        |    CAST(SUM(n0) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS BIGINT) AS n,
        |    CAST(SUM(narm0) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS BIGINT) AS n_arm
        |  FROM daily
        |), zt AS (
        |  SELECT day, look, n, n_arm,
        |    round(CAST(n_arm AS DOUBLE) / CAST(n AS DOUBLE), 6)
        |      AS observed_share,
        |    round((CAST(n_arm AS DOUBLE) - CAST(n AS DOUBLE) * 0.35)
        |      / sqrt(CAST(n AS DOUBLE) * 0.35 * (1.0 - 0.35)), 6) + 0.0
        |      AS z
        |  FROM cum
        |), pt AS (
        |  SELECT *, abs(z) / sqrt(2.0) AS x,
        |    1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2.0))) AS t
        |  FROM zt
        |), pv AS (
        |  SELECT day, look, n, n_arm, observed_share, z,
        |    round(t * (0.254829592 + t * (-0.284496736 +
        |      t * (1.421413741 + t * (-1.453152027 +
        |        t * 1.061405429)))) * exp(-(x * x)), 6) AS p_value
        |  FROM pt
        |), al AS (
        |  SELECT *, p_value < 0.001 AS srm_alarm FROM pv
        |)
        |SELECT day, look, n, n_arm, observed_share, z, p_value,
        |  srm_alarm,
        |  srm_alarm AND day = MIN(CASE WHEN srm_alarm THEN day END)
        |    OVER () AS first_alarm
        |FROM al ORDER BY day""".stripMargin,

    // D21: the q126 candidate/jaccard recipe at TWO shingle widths
    // (bigram estimator, trigram truth), then the confusion counts
    // per grid threshold; degenerate cells land on the same NULLs on
    // both engines (DuckDB x/0 = NULL ≡ the Spark NULL-divisor path).
    "q279_threshold_curve" ->
      """WITH r AS (
        |  SELECT doc_id, text,
        |    row_number() OVER (ORDER BY substr(text, 1, 40), doc_id)
        |      AS rk
        |  FROM documents
        |), cand AS (
        |  SELECT DISTINCT least(a.doc_id, b.doc_id) AS doc_a,
        |    greatest(a.doc_id, b.doc_id) AS doc_b
        |  FROM r a JOIN r b ON b.rk > a.rk AND b.rk <= a.rk + 10
        |), toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |), idx2 AS (
        |  SELECT doc_id, w, unnest(generate_series(1, len(w) - 1)) AS i
        |  FROM toks
        |), sh2 AS (
        |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] AS s FROM idx2
        |), sz2 AS (
        |  SELECT doc_id, COUNT(*) AS n FROM sh2 GROUP BY doc_id
        |), i2 AS (
        |  SELECT c.doc_a, c.doc_b, COUNT(*) AS i
        |  FROM cand c
        |  JOIN sh2 a ON a.doc_id = c.doc_a
        |  JOIN sh2 b ON b.doc_id = c.doc_b AND b.s = a.s
        |  GROUP BY 1, 2
        |), est AS (
        |  SELECT i2.doc_a, i2.doc_b,
        |    CAST(i2.i AS DOUBLE) / (za.n + zb.n - i2.i) AS est
        |  FROM i2
        |  JOIN sz2 za ON za.doc_id = i2.doc_a
        |  JOIN sz2 zb ON zb.doc_id = i2.doc_b
        |  WHERE CAST(i2.i AS DOUBLE) / (za.n + zb.n - i2.i) >= 0.05
        |), idx3 AS (
        |  SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i
        |  FROM toks
        |), sh3 AS (
        |  SELECT DISTINCT doc_id,
        |    w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
        |  FROM idx3
        |), sz3 AS (
        |  SELECT doc_id, COUNT(*) AS n FROM sh3 GROUP BY doc_id
        |), i3 AS (
        |  SELECT c.doc_a, c.doc_b, COUNT(*) AS i
        |  FROM cand c
        |  JOIN sh3 a ON a.doc_id = c.doc_a
        |  JOIN sh3 b ON b.doc_id = c.doc_b AND b.s = a.s
        |  GROUP BY 1, 2
        |), tru AS (
        |  SELECT i3.doc_a, i3.doc_b,
        |    CAST(i3.i AS DOUBLE) / (za.n + zb.n - i3.i) AS j3
        |  FROM i3
        |  JOIN sz3 za ON za.doc_id = i3.doc_a
        |  JOIN sz3 zb ON zb.doc_id = i3.doc_b
        |  WHERE CAST(i3.i AS DOUBLE) / (za.n + zb.n - i3.i) >= 0.05
        |), pairs AS (
        |  SELECT e.est, COALESCE(t.j3, 0.0) >= 0.6 AS truth
        |  FROM est e LEFT JOIN tru t
        |    ON t.doc_a = e.doc_a AND t.doc_b = e.doc_b
        |), g AS (
        |  SELECT CAST(t AS DOUBLE) AS threshold
        |  FROM (VALUES (0.2),(0.3),(0.4),(0.5),(0.6),(0.7),(0.8)) v(t)
        |), counts AS (
        |  SELECT g.threshold,
        |    CAST(SUM(CASE WHEN p.est >= g.threshold AND p.truth
        |      THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        |    CAST(SUM(CASE WHEN p.est >= g.threshold AND NOT p.truth
        |      THEN 1 ELSE 0 END) AS BIGINT) AS fp,
        |    CAST(SUM(CASE WHEN p.est < g.threshold AND p.truth
        |      THEN 1 ELSE 0 END) AS BIGINT) AS fn,
        |    CAST(SUM(CASE WHEN p.est < g.threshold AND NOT p.truth
        |      THEN 1 ELSE 0 END) AS BIGINT) AS tn
        |  FROM pairs p CROSS JOIN g
        |  GROUP BY g.threshold
        |), fin AS (
        |  SELECT threshold, tp, fp, fn, tn,
        |    CAST(tp AS DOUBLE)
        |      / (CASE WHEN tp + fp > 0 THEN CAST(tp + fp AS DOUBLE) END)
        |      AS pr,
        |    CAST(tp AS DOUBLE)
        |      / (CASE WHEN tp + fn > 0 THEN CAST(tp + fn AS DOUBLE) END)
        |      AS rc
        |  FROM counts
        |)
        |SELECT threshold, tp, fp, fn, tn,
        |  round(pr, 6) AS precision,
        |  round(rc, 6) AS recall,
        |  COALESCE(
        |    round(2.0 * pr * rc
        |      / (CASE WHEN pr + rc > 0.0 THEN pr + rc END), 6),
        |    CASE WHEN pr IS NOT NULL AND rc IS NOT NULL
        |      THEN 0.0 END) AS f1
        |FROM fin ORDER BY threshold""".stripMargin,

    // Q9: one ROLLUP pass (GROUPING ≡ Spark grouping_id — the q49
    // parity), level = dropped-suffix length, exact integers.
    "q277_generalization_ladder" ->
      """WITH cls AS (
        |  SELECT GROUPING(c_nationkey, c_mktsegment, band) AS gid,
        |    COUNT(*) AS class_size,
        |    COUNT(DISTINCT cohort) AS sens_div
        |  FROM (SELECT c_nationkey, c_mktsegment,
        |      CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS band,
        |      substr(c_name, length(c_name), 1) AS cohort
        |    FROM customer)
        |  GROUP BY ROLLUP(c_nationkey, c_mktsegment, band)
        |), lv AS (
        |  SELECT CASE gid WHEN 0 THEN 0 WHEN 1 THEN 1 WHEN 3 THEN 2
        |    WHEN 7 THEN 3 END AS level,
        |    class_size, sens_div
        |  FROM cls
        |)
        |SELECT level,
        |  CASE level
        |    WHEN 0 THEN 'c_nationkey,c_mktsegment,acct_band'
        |    WHEN 1 THEN 'c_nationkey,c_mktsegment'
        |    WHEN 2 THEN 'c_nationkey'
        |    ELSE '' END AS kept_quasi_cols,
        |  COUNT(*) AS n_classes,
        |  CAST(MIN(class_size) AS BIGINT) AS effective_k,
        |  CAST(SUM(CASE WHEN class_size < 5 THEN class_size ELSE 0 END)
        |    AS BIGINT) AS rows_below_k,
        |  CAST(SUM(CASE WHEN class_size < 5 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS classes_below_k,
        |  CAST(MIN(sens_div) AS BIGINT) AS effective_l,
        |  MIN(class_size) >= 5 AS k_satisfied,
        |  MIN(sens_div) >= 2 AS l_satisfied
        |FROM lv GROUP BY level ORDER BY level""".stripMargin,

    // X2 end-to-end twin: recompute the streamed output table from
    // the same events rows — q06's timezone() construction for the
    // UTC enrich, one window per origin over the stitched 2-day
    // frame (the table's final state after day 2's dynamic
    // overwrite). OR'd date equality (DuckDB IN(DATE...) gotcha).
    "q263_streaming_daily_twin" ->
      """WITH base AS (
        |  SELECT CAST(ts AS DATE) AS d, event_id, event_type,
        |    (['JFK','LAX','ORD'])[CAST(user_id % 3 AS INT) + 1] AS origin,
        |    CAST((user_id % 24) * 100 + (event_id % 60) AS INT) AS dep_time
        |  FROM events
        |  WHERE CAST(ts AS DATE) = DATE '2024-01-05'
        |     OR CAST(ts AS DATE) = DATE '2024-01-06'
        |), dd AS (
        |  SELECT d, origin, dep_time, event_type FROM (
        |    SELECT d, origin, dep_time, event_type,
        |      row_number() OVER (PARTITION BY d, origin, dep_time
        |                         ORDER BY event_id) AS rn
        |    FROM base) WHERE rn = 1
        |), tzm AS (
        |  SELECT * FROM (VALUES ('JFK','America/New_York'),
        |    ('LAX','America/Los_Angeles'),
        |    ('ORD','America/Chicago')) t(code, zone)
        |), conv AS (
        |  SELECT d, event_type, origin, dep_time,
        |    CAST(EPOCH(timezone(zone,
        |      strptime(strftime(d, '%Y-%m-%d') || ' ' ||
        |        substr(lpad(CAST(dep_time AS VARCHAR), 4, '0'), 1, 2)
        |        || ':' ||
        |        substr(lpad(CAST(dep_time AS VARCHAR), 4, '0'), 3, 2),
        |        '%Y-%m-%d %H:%M'))) AS BIGINT) AS ft
        |  FROM dd JOIN tzm ON tzm.code = origin
        |)
        |SELECT d AS flight_date, event_type AS airline, origin,
        |  dep_time, ft AS flight_time,
        |  LEAD(ft) OVER w AS flight_time_next,
        |  LEAD(event_type) OVER w AS airline_next,
        |  LEAD(ft) OVER w - ft AS diff_next
        |FROM conv
        |WINDOW w AS (PARTITION BY origin ORDER BY ft)
        |ORDER BY origin, flight_time""".stripMargin,
    "q203_bpe_encode" -> bpeEncodeOracleSql(numMerges = 12),

    // The decode stub's byte sampling replayed over the md5-hex
    // payload: position (j·31) mod 32, ascii = the byte value.
    "q201_decode_plumbing" ->
      """WITH p AS (SELECT doc_id, md5(text) AS h FROM documents),
        |     js AS (SELECT unnest(generate_series(0, 7)) AS j)
        |SELECT doc_id, CAST(js.j AS INT) AS j,
        |  CAST(ascii(substring(p.h, (js.j * 31) % 32 + 1, 1)) AS INT)
        |    AS byte_val
        |FROM p CROSS JOIN js
        |ORDER BY doc_id, j""".stripMargin,

    // Seed-codebook PQ encode replay: subspace codebooks from the 4
    // lowest-id vectors, min-L2 argmin (norm − 2·dot form, ties →
    // lowest code), codes rendered as strings.
    "q198_pq_codes" ->
      """WITH dims AS (
        |  SELECT CAST(len(embedding) // 4 AS INT) AS sub
        |  FROM embeddings ORDER BY vec_id LIMIT 1
        |), el AS (
        |  SELECT vec_id, CAST(generate_subscripts(embedding,1)-1 AS INT) AS d,
        |         CAST(unnest(embedding) AS DOUBLE) AS x
        |  FROM embeddings
        |), seeds AS (
        |  SELECT vec_id AS sid,
        |    CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS code
        |  FROM embeddings ORDER BY vec_id LIMIT 4
        |), cb AS (
        |  SELECT CAST(e.d // (SELECT sub FROM dims) AS INT) AS s, sd.code,
        |         CAST(e.d % (SELECT sub FROM dims) AS INT) AS j, e.x AS c
        |  FROM el e JOIN seeds sd ON e.vec_id = sd.sid
        |), vd AS (
        |  SELECT v.vec_id, b.s, b.code,
        |    SUM(b.c * b.c) - 2.0 * SUM(v.x * b.c) AS dist
        |  FROM el v
        |  JOIN cb b ON b.s = v.d // (SELECT sub FROM dims)
        |           AND b.j = v.d % (SELECT sub FROM dims)
        |  GROUP BY 1, 2, 3
        |), best AS (
        |  SELECT vec_id, s, code,
        |    row_number() OVER (PARTITION BY vec_id, s ORDER BY dist, code)
        |      AS rn
        |  FROM vd
        |)
        |SELECT vec_id, string_agg(CAST(code AS VARCHAR), ',' ORDER BY s)
        |  AS codes
        |FROM best WHERE rn = 1
        |GROUP BY vec_id ORDER BY vec_id""".stripMargin,

    // ADC top-k replay over the same seed codebooks: per-probe
    // subspace distance table + m lookups per vector, rank by
    // (adc, vec_id).
    "q239_mixture_plan" ->
      """WITH mass AS (
        |  SELECT source, CAST(SUM(len(string_split(text, ' ')))
        |    AS BIGINT) AS avail_tokens
        |  FROM documents GROUP BY source
        |), tgt AS (
        |  SELECT * FROM (VALUES ('src0', 400), ('src1', 300),
        |    ('src2', 200), ('src3', 100)) t(source, share_pm)
        |), planned AS (
        |  SELECT m.source, m.avail_tokens,
        |    CAST(t.share_pm AS INT) AS share_pm,
        |    (m.avail_tokens * 2000) // t.share_pm AS cand
        |  FROM mass m JOIN tgt t ON t.source = m.source
        |), tmin AS (
        |  SELECT MIN(cand) AS t FROM planned
        |)
        |SELECT p.source, p.avail_tokens, p.share_pm,
        |  CAST((tm.t * p.share_pm) // 1000 AS BIGINT) AS take_tokens,
        |  CAST(((tm.t * p.share_pm) // 1000) * 1000 // p.avail_tokens
        |    AS BIGINT) AS epochs_pm,
        |  p.cand = tm.t AS binding
        |FROM planned p CROSS JOIN tmin tm
        |ORDER BY p.source""".stripMargin,

    "q237_streaming_percentiles_twin" ->
      """WITH b AS (
        |  SELECT event_type AS key,
        |    CAST(floor(value * 100) AS BIGINT) AS bkt, COUNT(*) AS c
        |  FROM events WHERE value IS NOT NULL
        |  GROUP BY 1, 2
        |), n AS (
        |  SELECT key, CAST(SUM(c) AS BIGINT) AS n FROM b GROUP BY key
        |), cum AS (
        |  SELECT key, bkt,
        |    CAST(SUM(c) OVER (PARTITION BY key ORDER BY bkt) AS BIGINT)
        |      AS cum
        |  FROM b
        |), qs AS (
        |  SELECT n.key, q.q AS q_per_mille, n.n,
        |    (n.n * q.q + 999) // 1000 AS rank
        |  FROM n CROSS JOIN (VALUES (500), (950), (990)) q(q)
        |)
        |SELECT qs.key, CAST(qs.q_per_mille AS INT) AS q_per_mille,
        |  qs.n,
        |  CAST(MIN(CASE WHEN c.cum >= qs.rank THEN c.bkt END)
        |    AS DOUBLE) / 100 AS value
        |FROM qs JOIN cum c ON c.key = qs.key
        |GROUP BY 1, 2, 3
        |ORDER BY qs.key, q_per_mille""".stripMargin,

    "q235_semantic_leakage" ->
      """WITH el AS (
        |  SELECT vec_id, generate_subscripts(embedding,1) AS d,
        |         unnest(embedding)::DOUBLE AS x
        |  FROM embeddings
        |), nrm AS (
        |  SELECT vec_id, sqrt(SUM(x*x)) AS n FROM el GROUP BY vec_id
        |), dots AS (
        |  SELECT ec.vec_id, eb.vec_id AS bid, SUM(ec.x * eb.x) AS dp
        |  FROM el ec
        |  JOIN el eb ON eb.d = ec.d AND eb.vec_id % 50 = 0
        |  WHERE ec.vec_id % 50 <> 0
        |  GROUP BY 1, 2
        |), cosv AS (
        |  SELECT d.vec_id, d.bid, d.dp / (nc.n * nb.n) AS cos
        |  FROM dots d
        |  JOIN nrm nc ON nc.vec_id = d.vec_id
        |  JOIN nrm nb ON nb.vec_id = d.bid
        |), best AS (
        |  SELECT vec_id, bid, cos FROM (
        |    SELECT vec_id, bid, cos, row_number() OVER (
        |      PARTITION BY vec_id ORDER BY cos DESC, bid) AS rn
        |    FROM cosv) WHERE rn = 1
        |)
        |SELECT vec_id, bid AS bench_id,
        |  round(cos, 6) + 0.0 AS cosine,
        |  round(cos, 6) + 0.0 >= 0.9 AS leaked
        |FROM best ORDER BY vec_id""".stripMargin,

    "q236_mde_readout" ->
      """WITH e AS (
        |  SELECT event_type, (user_id % 2 = 0) AS a,
        |    (value >= 0.5) AS conv
        |  FROM events
        |  WHERE user_id IS NOT NULL AND value IS NOT NULL
        |), g AS (
        |  SELECT event_type,
        |    CAST(SUM(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(SUM(CASE WHEN a THEN 0 ELSE 1 END) AS BIGINT) AS n_b,
        |    CAST(SUM(CASE WHEN conv THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_conv
        |  FROM e GROUP BY 1
        |)
        |SELECT event_type, n_a, n_b,
        |  CASE WHEN n_a + n_b > 0 THEN
        |    round(CAST(n_conv AS DOUBLE) / (n_a + n_b), 6) END
        |    AS base_rate,
        |  CASE WHEN n_a > 0 AND n_b > 0 AND n_conv > 0
        |      AND n_conv < n_a + n_b THEN
        |    round((1.959964 + 0.841621)
        |      * sqrt((CAST(n_conv AS DOUBLE) / (n_a + n_b))
        |        * (1.0 - CAST(n_conv AS DOUBLE) / (n_a + n_b))
        |        * (1.0 / n_a + 1.0 / n_b)), 6) END AS mde_abs,
        |  CASE WHEN n_a > 0 AND n_b > 0 AND n_conv > 0
        |      AND n_conv < n_a + n_b THEN
        |    round(((1.959964 + 0.841621)
        |      * sqrt((CAST(n_conv AS DOUBLE) / (n_a + n_b))
        |        * (1.0 - CAST(n_conv AS DOUBLE) / (n_a + n_b))
        |        * (1.0 / n_a + 1.0 / n_b)))
        |      / (CAST(n_conv AS DOUBLE) / (n_a + n_b)), 6) END
        |    AS mde_rel
        |FROM g ORDER BY event_type""".stripMargin,

    "q232_winnow_pairs" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |  WHERE text IS NOT NULL
        |), gr AS (
        |  SELECT doc_id, i - 1 AS pos,
        |    CAST(('0x' || substr(md5(array_to_string(t[i:i+2], ' ')),
        |      1, 15)) AS BIGINT) AS h
        |  FROM (SELECT doc_id, t,
        |          unnest(generate_series(1, len(t) - 2)) AS i
        |        FROM toks WHERE len(t) >= 3)
        |), m AS (
        |  SELECT doc_id, COUNT(*) AS m FROM gr GROUP BY 1
        |), winner AS (
        |  SELECT doc_id, pos, h FROM (
        |    SELECT g1.doc_id, g2.pos, g2.h,
        |      row_number() OVER (PARTITION BY g1.doc_id, g1.pos
        |                         ORDER BY g2.h, g2.pos DESC) AS rn
        |    FROM gr g1
        |    JOIN gr g2 ON g2.doc_id = g1.doc_id
        |             AND g2.pos BETWEEN g1.pos AND g1.pos + 3
        |    JOIN m ON m.doc_id = g1.doc_id
        |    WHERE g1.pos <= m.m - 4
        |  ) WHERE rn = 1
        |), fpd AS (
        |  SELECT DISTINCT doc_id AS doc, h FROM winner
        |)
        |SELECT a.doc AS doc_a, b.doc AS doc_b,
        |  CAST(COUNT(DISTINCT a.h) AS BIGINT) AS n_shared
        |FROM fpd a JOIN fpd b ON a.h = b.h AND a.doc < b.doc
        |GROUP BY 1, 2 HAVING COUNT(DISTINCT a.h) >= 2
        |ORDER BY doc_a, doc_b""".stripMargin,

    // E47: the q231 moment replay widened to the 2x2 normal
    // equations — Cramer determinants as the same fixed IEEE chain,
    // contrasts in integer units, one display division.
    "q320_regression_adjusted" ->
      """WITH u AS (
        |  SELECT user_id,
        |    CAST(SUM(CASE WHEN EXTRACT(day FROM ts) <= 15
        |      THEN CAST(floor(value * 1000000) AS BIGINT)
        |      ELSE 0 END) AS BIGINT) AS x1,
        |    CAST(SUM(CASE WHEN EXTRACT(day FROM ts) <= 15
        |      THEN 1 ELSE 0 END) AS BIGINT) AS x2,
        |    CAST(SUM(CASE WHEN EXTRACT(day FROM ts) > 15
        |      THEN CAST(floor(value * 1000000) AS BIGINT)
        |      ELSE 0 END) AS BIGINT) AS y,
        |    (user_id % 3 = 0) AS arm
        |  FROM events
        |  WHERE user_id IS NOT NULL AND value IS NOT NULL
        |  GROUP BY user_id
        |), m AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(x1 AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS s1,
        |    CAST(SUM(CAST(x2 AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS s2,
        |    CAST(SUM(CAST(y AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS sy,
        |    CAST(SUM(CAST(x1 AS DECIMAL(19,0)) * CAST(x1 AS DECIMAL(19,0)))
        |      AS DECIMAL(38,0)) AS s11,
        |    CAST(SUM(CAST(x2 AS DECIMAL(19,0)) * CAST(x2 AS DECIMAL(19,0)))
        |      AS DECIMAL(38,0)) AS s22,
        |    CAST(SUM(CAST(x1 AS DECIMAL(19,0)) * CAST(x2 AS DECIMAL(19,0)))
        |      AS DECIMAL(38,0)) AS s12,
        |    CAST(SUM(CAST(x1 AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
        |      AS DECIMAL(38,0)) AS s1y,
        |    CAST(SUM(CAST(x2 AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
        |      AS DECIMAL(38,0)) AS s2y,
        |    CAST(SUM(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
        |      AS DECIMAL(38,0)) AS syy,
        |    CAST(SUM(CASE WHEN arm THEN 1 ELSE 0 END) AS BIGINT) AS na,
        |    CAST(SUM(CASE WHEN arm THEN 0 ELSE 1 END) AS BIGINT) AS nb,
        |    CAST(SUM(CASE WHEN arm THEN CAST(x1 AS DECIMAL(19,0))
        |      ELSE CAST(0 AS DECIMAL(19,0)) END) AS DECIMAL(38,0)) AS s1a,
        |    CAST(SUM(CASE WHEN arm THEN CAST(0 AS DECIMAL(19,0))
        |      ELSE CAST(x1 AS DECIMAL(19,0)) END) AS DECIMAL(38,0)) AS s1b,
        |    CAST(SUM(CASE WHEN arm THEN CAST(x2 AS DECIMAL(19,0))
        |      ELSE CAST(0 AS DECIMAL(19,0)) END) AS DECIMAL(38,0)) AS s2a,
        |    CAST(SUM(CASE WHEN arm THEN CAST(0 AS DECIMAL(19,0))
        |      ELSE CAST(x2 AS DECIMAL(19,0)) END) AS DECIMAL(38,0)) AS s2b,
        |    CAST(SUM(CASE WHEN arm THEN CAST(y AS DECIMAL(19,0))
        |      ELSE CAST(0 AS DECIMAL(19,0)) END) AS DECIMAL(38,0)) AS sya,
        |    CAST(SUM(CASE WHEN arm THEN CAST(0 AS DECIMAL(19,0))
        |      ELSE CAST(y AS DECIMAL(19,0)) END) AS DECIMAL(38,0)) AS syb
        |  FROM u
        |), f AS (
        |  SELECT n, na, nb,
        |    CAST(n AS DOUBLE) * CAST(s11 AS DOUBLE)
        |      - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) AS c11,
        |    CAST(n AS DOUBLE) * CAST(s22 AS DOUBLE)
        |      - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) AS c22,
        |    CAST(n AS DOUBLE) * CAST(s12 AS DOUBLE)
        |      - CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE) AS c12,
        |    CAST(n AS DOUBLE) * CAST(s1y AS DOUBLE)
        |      - CAST(s1 AS DOUBLE) * CAST(sy AS DOUBLE) AS c1y,
        |    CAST(n AS DOUBLE) * CAST(s2y AS DOUBLE)
        |      - CAST(s2 AS DOUBLE) * CAST(sy AS DOUBLE) AS c2y,
        |    CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS cyy,
        |    CAST(sya AS DOUBLE) / CAST(na AS DOUBLE)
        |      - CAST(syb AS DOUBLE) / CAST(nb AS DOUBLE) AS diff_raw_i,
        |    CAST(s1a AS DOUBLE) / CAST(na AS DOUBLE)
        |      - CAST(s1b AS DOUBLE) / CAST(nb AS DOUBLE) AS dx1_i,
        |    CAST(s2a AS DOUBLE) / CAST(na AS DOUBLE)
        |      - CAST(s2b AS DOUBLE) / CAST(nb AS DOUBLE) AS dx2_i
        |  FROM m
        |), g AS (
        |  SELECT *, c11 * c22 - c12 * c12 AS det,
        |    (c22 * c1y - c12 * c2y) / (c11 * c22 - c12 * c12) AS th1,
        |    (c11 * c2y - c12 * c1y) / (c11 * c22 - c12 * c12) AS th2,
        |    (na > 0 AND nb > 0 AND n > 2) AS testable
        |  FROM f
        |)
        |SELECT n AS n_units, na AS n_a, nb AS n_b,
        |  CASE WHEN testable AND det > 0
        |    THEN round(th1, 6) + 0.0 END AS theta1,
        |  CASE WHEN testable AND det > 0
        |    THEN round(th2, 6) + 0.0 END AS theta2,
        |  CASE WHEN testable
        |    THEN round(diff_raw_i / 1000000.0, 6) + 0.0 END
        |    AS diff_raw,
        |  CASE WHEN testable AND det > 0
        |    THEN round((diff_raw_i - th1 * dx1_i - th2 * dx2_i)
        |      / 1000000.0, 6) + 0.0 END AS diff_adj,
        |  CASE WHEN testable AND det > 0 AND cyy > 0
        |    THEN round((th1 * c1y + th2 * c2y) / cyy, 6) + 0.0 END
        |    AS var_reduction
        |FROM g""".stripMargin,

    "q231_cuped" ->
      """WITH u AS (
        |  SELECT user_id,
        |    CAST(SUM(CASE WHEN EXTRACT(day FROM ts) <= 15
        |      THEN CAST(floor(value * 1000000) AS BIGINT)
        |      ELSE 0 END) AS BIGINT) AS x,
        |    CAST(SUM(CASE WHEN EXTRACT(day FROM ts) > 15
        |      THEN CAST(floor(value * 1000000) AS BIGINT)
        |      ELSE 0 END) AS BIGINT) AS y,
        |    (user_id % 2 = 0) AS arm
        |  FROM events
        |  WHERE user_id IS NOT NULL AND value IS NOT NULL
        |  GROUP BY user_id
        |), m AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(x AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS sx,
        |    CAST(SUM(CAST(y AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS sy,
        |    CAST(SUM(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
        |      AS DECIMAL(38,0)) AS sxy,
        |    CAST(SUM(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0)))
        |      AS DECIMAL(38,0)) AS sxx,
        |    CAST(SUM(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
        |      AS DECIMAL(38,0)) AS syy,
        |    CAST(SUM(CASE WHEN arm THEN 1 ELSE 0 END) AS BIGINT) AS na,
        |    CAST(SUM(CASE WHEN arm THEN 0 ELSE 1 END) AS BIGINT) AS nb,
        |    CAST(SUM(CASE WHEN arm THEN CAST(x AS DECIMAL(19,0))
        |      ELSE CAST(0 AS DECIMAL(19,0)) END) AS DECIMAL(38,0)) AS sxa,
        |    CAST(SUM(CASE WHEN arm THEN CAST(0 AS DECIMAL(19,0))
        |      ELSE CAST(x AS DECIMAL(19,0)) END) AS DECIMAL(38,0)) AS sxb,
        |    CAST(SUM(CASE WHEN arm THEN CAST(y AS DECIMAL(19,0))
        |      ELSE CAST(0 AS DECIMAL(19,0)) END) AS DECIMAL(38,0)) AS sya,
        |    CAST(SUM(CASE WHEN arm THEN CAST(0 AS DECIMAL(19,0))
        |      ELSE CAST(y AS DECIMAL(19,0)) END) AS DECIMAL(38,0)) AS syb
        |  FROM u
        |), f AS (
        |  SELECT n, na, nb,
        |    CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS covn,
        |    CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS varxn,
        |    CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS varyn,
        |    (CAST(sya AS DOUBLE) / CAST(na AS DOUBLE)
        |      - CAST(syb AS DOUBLE) / CAST(nb AS DOUBLE)) / 1000000.0
        |      AS diff_raw,
        |    (CAST(sxa AS DOUBLE) / CAST(na AS DOUBLE)
        |      - CAST(sxb AS DOUBLE) / CAST(nb AS DOUBLE)) / 1000000.0
        |      AS dx
        |  FROM m
        |)
        |SELECT n AS n_units, na AS n_a, nb AS n_b,
        |  CASE WHEN na > 0 AND nb > 0 AND n > 1 AND varxn > 0
        |    THEN round(covn / varxn, 6) + 0.0 END AS theta,
        |  CASE WHEN na > 0 AND nb > 0 AND n > 1
        |    THEN round(diff_raw, 6) + 0.0 END AS diff_raw,
        |  CASE WHEN na > 0 AND nb > 0 AND n > 1 AND varxn > 0
        |    THEN round(diff_raw - (covn / varxn) * dx, 6) + 0.0 END
        |    AS diff_cuped,
        |  CASE WHEN na > 0 AND nb > 0 AND n > 1 AND varxn > 0
        |      AND varyn > 0
        |    THEN round((covn * covn) / (varxn * varyn), 6) END
        |    AS var_reduction
        |FROM f""".stripMargin,

    "q230_hamming_search" ->
      """WITH el AS (
        |  SELECT vec_id, CAST(generate_subscripts(embedding,1)-1 AS INT) AS d,
        |         CAST(unnest(embedding) AS DOUBLE) AS x
        |  FROM embeddings
        |), wq AS (
        |  SELECT vec_id, CAST(d // 32 AS INT) AS w,
        |    CAST(SUM(CASE WHEN x >= 0 THEN (CAST(1 AS BIGINT) << (d % 32))
        |             ELSE 0 END) AS BIGINT) AS word
        |  FROM el GROUP BY 1, 2
        |), pr AS (
        |  SELECT vec_id AS probe_id, w, word FROM wq
        |  WHERE vec_id >= 4 AND vec_id < 7
        |), ham AS (
        |  SELECT p.probe_id, c.vec_id,
        |    CAST(SUM(bit_count(xor(c.word, p.word))) AS BIGINT) AS hamming
        |  FROM wq c JOIN pr p ON p.w = c.w
        |  GROUP BY 1, 2
        |), ranked AS (
        |  SELECT probe_id, vec_id, hamming,
        |    row_number() OVER (PARTITION BY probe_id
        |      ORDER BY hamming, vec_id) AS rank
        |  FROM ham
        |)
        |SELECT probe_id, vec_id, CAST(rank AS INT) AS rank, hamming
        |FROM ranked WHERE rank <= 5
        |ORDER BY probe_id, rank""".stripMargin,

    "q229_fdr_battery" ->
      """WITH e AS (
        |  SELECT event_type,
        |    CAST(EXTRACT(day FROM ts) AS INT) % 7 AS day_bucket,
        |    (user_id % 2 = 0) AS a, (value >= 0.5) AS conv
        |  FROM events
        |  WHERE user_id IS NOT NULL AND value IS NOT NULL
        |), g AS (
        |  SELECT event_type, day_bucket,
        |    CAST(SUM(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(SUM(CASE WHEN a THEN 0 ELSE 1 END) AS BIGINT) AS n_b,
        |    CAST(SUM(CASE WHEN a AND conv THEN 1 ELSE 0 END) AS BIGINT)
        |      AS conv_a,
        |    CAST(SUM(CASE WHEN (NOT a) AND conv THEN 1 ELSE 0 END)
        |      AS BIGINT) AS conv_b
        |  FROM e GROUP BY 1, 2
        |), zt AS (
        |  SELECT event_type || '#' || CAST(day_bucket AS VARCHAR) AS key,
        |    CASE WHEN n_a > 0 AND n_b > 0 AND
        |      sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
        |        * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
        |        * (1.0 / n_a + 1.0 / n_b)) > 0
        |    THEN round(
        |      (CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
        |      / sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
        |        * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
        |        * (1.0 / n_a + 1.0 / n_b)), 6) END AS z
        |  FROM g
        |), pt AS (
        |  SELECT key, z, abs(z) / sqrt(2.0) AS x,
        |    1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2.0))) AS t
        |  FROM zt
        |), pv AS (
        |  SELECT key,
        |    round(t * (0.254829592 + t * (-0.284496736 +
        |      t * (1.421413741 + t * (-1.453152027 +
        |        t * 1.061405429)))) * exp(-(x * x)), 6) AS p
        |  FROM pt WHERE z IS NOT NULL
        |), pu AS (
        |  SELECT key, CAST(p AS DOUBLE) AS p_value,
        |    CAST(CAST(p AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS pu
        |  FROM pv
        |), rk AS (
        |  SELECT key, p_value, pu,
        |    CAST(row_number() OVER (ORDER BY pu, key) AS BIGINT) AS rk,
        |    CAST(COUNT(*) OVER () AS BIGINT) AS m
        |  FROM pu
        |), vu AS (
        |  SELECT key, p_value, pu, rk, m,
        |    (pu * m * 1000000) // rk AS vu
        |  FROM rk
        |), qu AS (
        |  SELECT key, p_value, pu, rk, m,
        |    least(MIN(vu) OVER (ORDER BY rk DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |      1000000000000) AS qu,
        |    MAX(CASE WHEN pu * m * 1000 <= rk * 100 * 1000000
        |        THEN rk END) OVER () AS rejrk
        |  FROM vu
        |)
        |SELECT key, p_value, CAST(rk AS INT) AS rank,
        |  round(CAST(qu AS DOUBLE) / 1000000000000.0, 6) AS q_value,
        |  rk <= coalesce(rejrk, 0) AS rejected
        |FROM qu ORDER BY rank""".stripMargin,

    "q228_ivfpq_search" ->
      """WITH dims AS (
        |  SELECT CAST(len(embedding) // 4 AS INT) AS sub
        |  FROM embeddings ORDER BY vec_id LIMIT 1
        |), el AS (
        |  SELECT vec_id, CAST(generate_subscripts(embedding,1)-1 AS INT) AS d,
        |         CAST(unnest(embedding) AS DOUBLE) AS x
        |  FROM embeddings
        |), seed_ids AS (
        |  SELECT vec_id AS cell_vid,
        |    CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell
        |  FROM embeddings ORDER BY vec_id LIMIT 4
        |), snrm AS (
        |  SELECT s.cell, sqrt(SUM(e.x * e.x)) AS n
        |  FROM seed_ids s JOIN el e ON e.vec_id = s.cell_vid
        |  GROUP BY s.cell
        |), vc AS (
        |  -- cellRanking's metric: v·s/|s| (probe norm is rank-inert)
        |  SELECT e.vec_id, s.cell, SUM(e.x * se.x) / any_value(sn.n) AS cosn
        |  FROM el e
        |  JOIN seed_ids s ON TRUE
        |  JOIN el se ON se.vec_id = s.cell_vid AND se.d = e.d
        |  JOIN snrm sn ON sn.cell = s.cell
        |  GROUP BY e.vec_id, s.cell
        |), assign AS (
        |  SELECT vec_id, cell FROM (
        |    SELECT vec_id, cell, row_number() OVER (
        |      PARTITION BY vec_id ORDER BY cosn DESC, cell) AS rn
        |    FROM vc) WHERE rn = 1
        |), pcells AS (
        |  SELECT vec_id AS probe_id, cell FROM (
        |    SELECT vec_id, cell, row_number() OVER (
        |      PARTITION BY vec_id ORDER BY cosn DESC, cell) AS rn
        |    FROM vc WHERE vec_id >= 4 AND vec_id < 7) WHERE rn <= 2
        |), seeds AS (
        |  SELECT vec_id AS sid,
        |    CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS code
        |  FROM embeddings ORDER BY vec_id LIMIT 4
        |), cb AS (
        |  SELECT CAST(e.d // (SELECT sub FROM dims) AS INT) AS s, sd.code,
        |         CAST(e.d % (SELECT sub FROM dims) AS INT) AS j, e.x AS c
        |  FROM el e JOIN seeds sd ON e.vec_id = sd.sid
        |), vd AS (
        |  SELECT v.vec_id, b.s, b.code,
        |    SUM(b.c * b.c) - 2.0 * SUM(v.x * b.c) AS dist
        |  FROM el v
        |  JOIN cb b ON b.s = v.d // (SELECT sub FROM dims)
        |           AND b.j = v.d % (SELECT sub FROM dims)
        |  GROUP BY 1, 2, 3
        |), codes AS (
        |  SELECT vec_id, s, code FROM (
        |    SELECT vec_id, s, code,
        |      row_number() OVER (PARTITION BY vec_id, s ORDER BY dist, code)
        |        AS rn
        |    FROM vd) WHERE rn = 1
        |), tab AS (
        |  SELECT p.vec_id AS pid, b.s, b.code,
        |    CAST(round(SUM((p.x - b.c) * (p.x - b.c)), 6)
        |      AS DECIMAL(18,6)) AS d2
        |  FROM el p
        |  JOIN cb b ON b.s = p.d // (SELECT sub FROM dims)
        |           AND b.j = p.d % (SELECT sub FROM dims)
        |  WHERE p.vec_id >= 4 AND p.vec_id < 7
        |  GROUP BY 1, 2, 3
        |), score AS (
        |  SELECT t.pid, c.vec_id, a.cell, SUM(t.d2) AS adc
        |  FROM codes c
        |  JOIN assign a ON a.vec_id = c.vec_id
        |  JOIN tab t ON t.s = c.s AND t.code = c.code
        |  JOIN pcells p ON p.probe_id = t.pid AND p.cell = a.cell
        |  GROUP BY 1, 2, 3
        |), ranked AS (
        |  SELECT pid AS probe_id, cell, vec_id, adc,
        |    row_number() OVER (PARTITION BY pid ORDER BY adc, vec_id)
        |      AS rank
        |  FROM score
        |)
        |SELECT probe_id, CAST(cell AS INT) AS cell, vec_id,
        |  CAST(rank AS INT) AS rank,
        |  round(CAST(adc AS DOUBLE), 6) AS adc_dist
        |FROM ranked WHERE rank <= 5
        |ORDER BY probe_id, rank""".stripMargin,

    "q199_pq_adc" ->
      """WITH dims AS (
        |  SELECT CAST(len(embedding) // 4 AS INT) AS sub
        |  FROM embeddings ORDER BY vec_id LIMIT 1
        |), el AS (
        |  SELECT vec_id, CAST(generate_subscripts(embedding,1)-1 AS INT) AS d,
        |         CAST(unnest(embedding) AS DOUBLE) AS x
        |  FROM embeddings
        |), seeds AS (
        |  SELECT vec_id AS sid,
        |    CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS code
        |  FROM embeddings ORDER BY vec_id LIMIT 4
        |), cb AS (
        |  SELECT CAST(e.d // (SELECT sub FROM dims) AS INT) AS s, sd.code,
        |         CAST(e.d % (SELECT sub FROM dims) AS INT) AS j, e.x AS c
        |  FROM el e JOIN seeds sd ON e.vec_id = sd.sid
        |), vd AS (
        |  SELECT v.vec_id, b.s, b.code,
        |    SUM(b.c * b.c) - 2.0 * SUM(v.x * b.c) AS dist
        |  FROM el v
        |  JOIN cb b ON b.s = v.d // (SELECT sub FROM dims)
        |           AND b.j = v.d % (SELECT sub FROM dims)
        |  GROUP BY 1, 2, 3
        |), codes AS (
        |  SELECT vec_id, s, code FROM (
        |    SELECT vec_id, s, code,
        |      row_number() OVER (PARTITION BY vec_id, s ORDER BY dist, code)
        |        AS rn
        |    FROM vd) WHERE rn = 1
        |), tab AS (
        |  SELECT p.vec_id AS pid, b.s, b.code,
        |    CAST(round(SUM((p.x - b.c) * (p.x - b.c)), 6)
        |      AS DECIMAL(18,6)) AS d2
        |  FROM el p
        |  JOIN cb b ON b.s = p.d // (SELECT sub FROM dims)
        |           AND b.j = p.d % (SELECT sub FROM dims)
        |  WHERE p.vec_id >= 4 AND p.vec_id < 7
        |  GROUP BY 1, 2, 3
        |), score AS (
        |  -- exact DECIMAL sum: equal-code vectors get EXACTLY equal
        |  -- scores, so the (score, id) tie-break is engine-free
        |  SELECT t.pid, c.vec_id, SUM(t.d2) AS adc
        |  FROM codes c JOIN tab t ON t.s = c.s AND t.code = c.code
        |  GROUP BY 1, 2
        |), ranked AS (
        |  SELECT pid AS probe_id, vec_id, adc,
        |    row_number() OVER (PARTITION BY pid ORDER BY adc, vec_id) AS rank
        |  FROM score
        |)
        |SELECT probe_id, vec_id, CAST(rank AS INT) AS rank,
        |  round(CAST(adc AS DOUBLE), 6) AS adc_dist
        |FROM ranked WHERE rank <= 5
        |ORDER BY probe_id, rank""".stripMargin,

    // Mann–Whitney rank-sum on the score-level frame; doubled
    // numerator keeps the tie half-credit integral (exact DECIMAL
    // counts end to end, one final IEEE division).
    "q196_score_auc" ->
      """WITH f AS (
        |  SELECT
        |    round((CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |           / len(string_split(text, ' '))) * 0.5
        |      + (1.0 - CAST(len(list_filter(string_split(text, ' '),
        |           t -> list_contains(['the','a','of','and','is','to'], t)))
        |           AS DOUBLE) / len(string_split(text, ' '))) * 0.5, 6) AS q,
        |    (lang = 'en') AS pos
        |  FROM documents
        |), g AS (
        |  SELECT q AS s,
        |    CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS np,
        |    CAST(SUM(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT) AS nn
        |  FROM f GROUP BY q
        |), o AS (
        |  SELECT np, nn,
        |    COALESCE(SUM(nn) OVER (ORDER BY s
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumneg
        |  FROM g
        |)
        |SELECT CAST(SUM(np) AS BIGINT) AS n_pos,
        |  CAST(SUM(nn) AS BIGINT) AS n_neg,
        |  CASE WHEN SUM(np) > 0 AND SUM(nn) > 0 THEN
        |    round(CAST(SUM(CAST(np AS DECIMAL(38,0)) * 2 * cumneg
        |                   + CAST(np AS DECIMAL(38,0)) * nn) AS DOUBLE)
        |      / (2.0 * SUM(np) * SUM(nn)), 6) END AS auc
        |FROM o""".stripMargin,

    // Ten-bin reliability table; per-bin score mass in exact
    // DECIMAL(18,6), gap subtracts RAW means before its round(6).
    "q197_calibration" ->
      """WITH f AS (
        |  SELECT
        |    round((CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |           / len(string_split(text, ' '))) * 0.5
        |      + (1.0 - CAST(len(list_filter(string_split(text, ' '),
        |           t -> list_contains(['the','a','of','and','is','to'], t)))
        |           AS DOUBLE) / len(string_split(text, ' '))) * 0.5, 6) AS q,
        |    (lang = 'en') AS pos
        |  FROM documents
        |)
        |SELECT CAST(least(floor(q * 10), 9) AS INT) AS bin,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
        |  round(CAST(SUM(CAST(q AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6)
        |    AS mean_score,
        |  round(CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*), 6) AS pos_rate,
        |  round(abs(CAST(SUM(CAST(q AS DECIMAL(18,6))) AS DOUBLE) / count(*)
        |    - CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS DOUBLE)
        |      / count(*)), 6) AS gap
        |FROM f GROUP BY 1 ORDER BY bin""".stripMargin,

    // Two-sample KS on the 2dp floor grid: integral cross-product
    // gap |cumA·nB − cumB·nA| in DECIMAL(38,0), min-over-ties argmax
    // bin, one final IEEE division (D ≥ 0 — no signed-zero exposure).
    "q204_ks_drift" ->
      """WITH f AS (
        |  SELECT CAST(floor(value * 100) AS BIGINT) AS b,
        |    (event_type = 'click') AS isa
        |  FROM events
        |  WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL
        |), g AS (
        |  SELECT b,
        |    CAST(SUM(CASE WHEN isa THEN 1 ELSE 0 END) AS BIGINT) AS na,
        |    CAST(SUM(CASE WHEN isa THEN 0 ELSE 1 END) AS BIGINT) AS nb
        |  FROM f GROUP BY b
        |), c AS (
        |  SELECT b,
        |    CAST(SUM(na) OVER (ORDER BY b
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ca,
        |    CAST(SUM(nb) OVER (ORDER BY b
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cb,
        |    CAST(SUM(na) OVER () AS BIGINT) AS ta,
        |    CAST(SUM(nb) OVER () AS BIGINT) AS tb
        |  FROM g
        |), d AS (
        |  SELECT b, ta, tb,
        |    abs(CAST(ca AS DECIMAL(38,0)) * tb
        |      - CAST(cb AS DECIMAL(38,0)) * ta) AS dd
        |  FROM c
        |), dm AS (SELECT b, ta, tb, dd, MAX(dd) OVER () AS dmax FROM d)
        |SELECT CAST(MAX(ta) AS BIGINT) AS n_a, CAST(MAX(tb) AS BIGINT) AS n_b,
        |  CASE WHEN MAX(ta) > 0 AND MAX(tb) > 0 THEN
        |    round(CAST(MAX(dd) AS DOUBLE)
        |      / (CAST(MAX(ta) AS DOUBLE) * MAX(tb)), 6) END AS ks_stat,
        |  CASE WHEN MAX(ta) > 0 AND MAX(tb) > 0 THEN
        |    CAST(MIN(CASE WHEN dd = dmax THEN b END) AS BIGINT) END AS ks_at
        |FROM dm""".stripMargin,

    "q209_mmr_select" -> mmrOracleSql(k = 8, lambda = 0.7, queryId = 0L),

    "q215_kcore" -> kCoreOracleSql(k = 2, rounds = 6),

    // G5: wedge enumeration at shared neighbors, AA terms round(12)
    // into DECIMAL(38,12) (the q155 RRF discipline), existing edges
    // anti-joined out, via-degree cap mirrored from the Spark side.
    // Edge head = co-purchase pairs (lo < hi by construction, so the
    // operator's least/greatest canonicalization is a no-op).
    "q240_link_predict" ->
      s"""WITH cp AS MATERIALIZED (
         |  SELECT DISTINCT o.o_custkey AS cust, l.l_partkey AS part
         |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
         |), e0 AS MATERIALIZED (
         |  SELECT a.part AS lo, b.part AS hi
         |  FROM cp a JOIN cp b ON b.cust = a.cust AND a.part < b.part
         |  GROUP BY 1, 2
         |  HAVING count(*) >= 3
         |),
         |nb AS MATERIALIZED (
         |  SELECT lo AS node, hi AS nbr FROM e0
         |  UNION ALL SELECT hi AS node, lo AS nbr FROM e0
         |), deg AS MATERIALIZED (
         |  SELECT node, COUNT(*) AS degree FROM nb GROUP BY node
         |), via AS MATERIALIZED (
         |  SELECT nb.nbr AS via, nb.node, d.degree AS vd
         |  FROM nb JOIN deg d ON d.node = nb.nbr
         |  WHERE d.degree <= 256
         |), pairs AS MATERIALIZED (
         |  SELECT a.node AS node_a, b.node AS node_b,
         |    COUNT(*) AS cn,
         |    SUM(CAST(round(1.0 / ln(CAST(a.vd AS DOUBLE)), 12)
         |      AS DECIMAL(38,12))) AS aas
         |  FROM via a JOIN via b ON a.via = b.via AND a.node < b.node
         |  GROUP BY 1, 2
         |)
         |SELECT p.node_a, p.node_b, CAST(p.cn AS BIGINT) AS common_nbrs,
         |  round(CAST(p.aas AS DOUBLE), 6) AS adamic_adar,
         |  round(CAST(p.cn AS DOUBLE)
         |    / CAST(da.degree + db.degree - p.cn AS DOUBLE), 6)
         |    AS nbr_jaccard
         |FROM pairs p
         |JOIN deg da ON da.node = p.node_a
         |JOIN deg db ON db.node = p.node_b
         |WHERE NOT EXISTS (SELECT 1 FROM e0 e
         |  WHERE e.lo = p.node_a AND e.hi = p.node_b)
         |ORDER BY adamic_adar DESC, node_a, node_b
         |LIMIT 1000""".stripMargin,

    // G7: the projection pair-join with the q240 head, support kept.
    // Round 10: mirrors the planted hub basket (cust -1 × every
    // part) and the maxBasket = 128 drop — the kp frame keeps only
    // baskets at or under the cap, exactly bipartiteProject's
    // left-semi keep.
    "q245_bipartite_project" ->
      """WITH cp AS MATERIALIZED (
        |  SELECT DISTINCT cust, part FROM (
        |    SELECT o.o_custkey AS cust, l.l_partkey AS part
        |    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        |    UNION ALL
        |    SELECT CAST(-1 AS BIGINT) AS cust, p_partkey AS part FROM part
        |  )
        |), keep AS MATERIALIZED (
        |  SELECT cust FROM cp GROUP BY cust HAVING count(*) <= 128
        |), kp AS MATERIALIZED (
        |  SELECT cp.cust, cp.part FROM cp JOIN keep USING (cust)
        |)
        |SELECT a.part AS node_a, b.part AS node_b,
        |  CAST(count(*) AS BIGINT) AS support
        |FROM kp a JOIN kp b ON b.cust = a.cust AND a.part < b.part
        |GROUP BY 1, 2
        |HAVING count(*) >= 3
        |ORDER BY support DESC, node_a, node_b
        |LIMIT 2000""".stripMargin,

    // G6: 3-round frontier expansion as an unrolled CTE chain (the
    // kCore fixed-iteration contract) — integer hops, no floats.
    "q241_bfs_hops" ->
      s"""WITH $candidateEdgesHead,
         |nb AS MATERIALIZED (
         |  SELECT lo AS node, hi AS nbr FROM e0
         |  UNION ALL SELECT hi AS node, lo AS nbr FROM e0
         |), f0 AS MATERIALIZED (
         |  SELECT DISTINCT doc_id AS node FROM documents
         |  WHERE doc_id % 25 = 0
         |), r0 AS MATERIALIZED (
         |  SELECT node, 0 AS hop FROM f0
         |), f1 AS MATERIALIZED (
         |  SELECT DISTINCT nb.nbr AS node FROM f0
         |  JOIN nb ON nb.node = f0.node
         |  WHERE nb.nbr NOT IN (SELECT node FROM r0)
         |), r1 AS MATERIALIZED (
         |  SELECT node, hop FROM r0
         |  UNION ALL SELECT node, 1 AS hop FROM f1
         |), f2 AS MATERIALIZED (
         |  SELECT DISTINCT nb.nbr AS node FROM f1
         |  JOIN nb ON nb.node = f1.node
         |  WHERE nb.nbr NOT IN (SELECT node FROM r1)
         |), r2 AS MATERIALIZED (
         |  SELECT node, hop FROM r1
         |  UNION ALL SELECT node, 2 AS hop FROM f2
         |), f3 AS MATERIALIZED (
         |  SELECT DISTINCT nb.nbr AS node FROM f2
         |  JOIN nb ON nb.node = f2.node
         |  WHERE nb.nbr NOT IN (SELECT node FROM r2)
         |), r3 AS MATERIALIZED (
         |  SELECT node, hop FROM r2
         |  UNION ALL SELECT node, 3 AS hop FROM f3
         |)
         |SELECT node, CAST(hop AS INT) AS hop FROM r3
         |ORDER BY node""".stripMargin,

    // E27: tie groups -> running min-rank over the distinct-value
    // table -> exact DECIMAL/HUGEINT rank sums -> one fixed IEEE
    // finish; z is signed (+ 0.0), p evaluates on the rounded z.
    "q242_mann_whitney" ->
      """WITH e AS (
        |  SELECT event_type, (user_id % 2 = 0) AS a,
        |    CAST(value AS DOUBLE) AS v
        |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
        |), g AS (
        |  SELECT event_type, v, COUNT(*) AS t,
        |    SUM(CASE WHEN a THEN 1 ELSE 0 END) AS ta
        |  FROM e GROUP BY 1, 2
        |), r AS (
        |  SELECT event_type, v, t, ta,
        |    COALESCE(SUM(t) OVER (PARTITION BY event_type ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + 1
        |      AS mr
        |  FROM g
        |), s AS (
        |  SELECT event_type,
        |    CAST(SUM(ta) AS BIGINT) AS n_a,
        |    CAST(SUM(t - ta) AS BIGINT) AS n_b,
        |    SUM(CAST(ta * (2 * mr + t - 1) AS DECIMAL(38,0))) AS r2a,
        |    SUM(CAST(CAST(t AS HUGEINT) * t * t - t AS DECIMAL(38,0)))
        |      AS ts
        |  FROM r GROUP BY 1
        |), f AS (
        |  SELECT event_type, n_a, n_b,
        |    CAST(r2a - n_a * (n_a + 1) AS DOUBLE) / 2.0 AS u_a,
        |    CAST(r2a - n_a * (n_a + 1) - n_a * n_b AS DOUBLE) AS num2,
        |    sqrt(CAST(n_a * n_b AS DOUBLE)
        |      * (CAST(n_a + n_b + 1 AS DOUBLE)
        |         - CAST(ts AS DOUBLE)
        |           / CAST((n_a + n_b) * (n_a + n_b - 1) AS DOUBLE))
        |      / 12.0) AS sigma
        |  FROM s
        |), zt AS (
        |  SELECT event_type, n_a, n_b, u_a,
        |    CASE WHEN n_a > 0 AND n_b > 0 AND sigma > 0
        |      THEN round(num2 / 2.0 / sigma, 6) + 0.0 END AS z
        |  FROM f
        |), pt AS (
        |  SELECT event_type, n_a, n_b, u_a, z,
        |    abs(z) / sqrt(2.0) AS x,
        |    1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2.0))) AS t
        |  FROM zt
        |)
        |SELECT event_type, n_a, n_b, u_a, z,
        |  round(t * (0.254829592 + t * (-0.284496736 +
        |    t * (1.421413741 + t * (-1.453152027 +
        |      t * 1.061405429)))) * exp(-(x * x)), 6) AS p_value
        |FROM pt ORDER BY event_type""".stripMargin,

    "q243_autocorrelation" -> acfOracleSql(maxLag = 5),

    "q246_diff_in_diff" -> didOracleSql,

    // T52: top-(k+1) order statistics by VALUE (tie rows arbitrary,
    // value multiset deterministic), decimal-staged ln ratios.
    "q249_hill_tail" ->
      """WITH base AS (
        |  SELECT source, CAST(n_chars AS BIGINT) AS x FROM documents
        |  WHERE n_chars IS NOT NULL AND n_chars > 0
        |), g AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_group
        |  FROM base GROUP BY source
        |), top AS (
        |  SELECT source, x,
        |    row_number() OVER (PARTITION BY source ORDER BY x DESC)
        |      AS rn
        |  FROM base
        |), kept AS (
        |  SELECT * FROM top WHERE rn <= 65
        |), th AS (
        |  SELECT source, MIN(x) AS x_threshold,
        |    CAST(COUNT(*) AS BIGINT) AS m
        |  FROM kept GROUP BY source
        |), s AS (
        |  SELECT kept.source,
        |    SUM(CAST(round(ln(CAST(x AS DOUBLE)
        |      / CAST(x_threshold AS DOUBLE)), 12) AS DECIMAL(38,12)))
        |      AS sm
        |  FROM kept JOIN th ON th.source = kept.source
        |  WHERE rn <= 64
        |  GROUP BY kept.source
        |)
        |SELECT th.source, CAST(64 AS INT) AS k, g.n_group,
        |  th.x_threshold,
        |  CASE WHEN th.m = 65 AND s.sm > 0 THEN
        |    round(CAST(64 AS DOUBLE) / CAST(s.sm AS DOUBLE), 6)
        |  END AS alpha
        |FROM th JOIN g ON g.source = th.source
        |LEFT JOIN s ON s.source = th.source
        |ORDER BY th.source""".stripMargin,

    // E31: per-stratum 2x2 cells, ad/n and bc/n terms round(12) into
    // DECIMAL(38,12); ln OR signed (+ 0.0).
    "q250_mantel_haenszel" ->
      """WITH e AS (
        |  SELECT event_type,
        |    CAST(EXTRACT(day FROM ts) AS INT) % 7 AS day_bucket,
        |    (user_id % 2 = 0) AS a, (value >= 0.5) AS conv
        |  FROM events
        |  WHERE user_id IS NOT NULL AND value IS NOT NULL
        |), c AS (
        |  SELECT event_type, day_bucket,
        |    CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN a AND conv THEN 1 ELSE 0 END)
        |      AS BIGINT) AS ca,
        |    CAST(SUM(CASE WHEN a AND NOT conv THEN 1 ELSE 0 END)
        |      AS BIGINT) AS cb,
        |    CAST(SUM(CASE WHEN (NOT a) AND conv THEN 1 ELSE 0 END)
        |      AS BIGINT) AS cc,
        |    CAST(SUM(CASE WHEN (NOT a) AND NOT conv THEN 1 ELSE 0 END)
        |      AS BIGINT) AS cd
        |  FROM e GROUP BY 1, 2
        |), p AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
        |    CAST(SUM(n) AS BIGINT) AS n_rows,
        |    SUM(CAST(round(CAST(ca * cd AS DOUBLE) / CAST(n AS DOUBLE),
        |      12) AS DECIMAL(38,12))) AS sad,
        |    SUM(CAST(round(CAST(cb * cc AS DOUBLE) / CAST(n AS DOUBLE),
        |      12) AS DECIMAL(38,12))) AS sbc
        |  FROM c
        |)
        |SELECT n_strata, n_rows,
        |  round(CAST(sad AS DOUBLE), 6) AS sum_ad,
        |  round(CAST(sbc AS DOUBLE), 6) AS sum_bc,
        |  CASE WHEN sad > 0 AND sbc > 0 THEN
        |    round(CAST(sad AS DOUBLE) / CAST(sbc AS DOUBLE), 6)
        |  END AS or_mh,
        |  CASE WHEN sad > 0 AND sbc > 0 THEN
        |    round(ln(CAST(sad AS DOUBLE) / CAST(sbc AS DOUBLE)), 6)
        |      + 0.0
        |  END AS ln_or
        |FROM p""".stripMargin,

    // T53: phrase ids from a stop-count running sum, word scores
    // deg/freq round(12)-staged, phrase assembly ordered by pos.
    "q253_rake_keyphrases" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    generate_subscripts(string_split(text, ' '), 1) AS pos,
        |    unnest(string_split(text, ' ')) AS tok
        |  FROM documents WHERE text IS NOT NULL
        |), m AS (
        |  SELECT doc_id, pos, tok,
        |    tok IN ('the','a','of','and','is','to') AS stop
        |  FROM toks
        |), p AS (
        |  SELECT doc_id, pos, tok, stop,
        |    SUM(CASE WHEN stop THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY doc_id ORDER BY pos) AS pid
        |  FROM m
        |), wds AS (
        |  SELECT doc_id, pid, pos, tok FROM p
        |  WHERE NOT stop AND tok <> ''
        |), ph AS (
        |  SELECT doc_id, pid,
        |    string_agg(tok, ' ' ORDER BY pos) AS phrase,
        |    COUNT(*) AS len
        |  FROM wds GROUP BY 1, 2
        |), ws AS (
        |  SELECT w.tok,
        |    CAST(round(CAST(SUM(ph.len) AS DOUBLE)
        |      / CAST(COUNT(*) AS DOUBLE), 12) AS DECIMAL(38,12)) AS s
        |  FROM wds w JOIN ph ON ph.doc_id = w.doc_id AND ph.pid = w.pid
        |  GROUP BY w.tok
        |), sc AS (
        |  SELECT w.doc_id, w.pid, SUM(ws.s) AS s
        |  FROM wds w JOIN ws ON ws.tok = w.tok
        |  GROUP BY 1, 2
        |)
        |SELECT ph.phrase,
        |  CAST(MAX(ph.len) AS BIGINT) AS n_words,
        |  CAST(COUNT(*) AS BIGINT) AS n_occurrences,
        |  round(CAST(MAX(sc.s) AS DOUBLE), 6) AS score
        |FROM ph JOIN sc ON sc.doc_id = ph.doc_id AND sc.pid = ph.pid
        |GROUP BY ph.phrase
        |ORDER BY score DESC, phrase
        |LIMIT 50""".stripMargin,

    // D20: the q48 recursive-closure cluster chain + the q41 split
    // rule; canonical split = the min-id representative's.
    "q254_split_repair" ->
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |), idx AS (
        |  SELECT doc_id, w, unnest(generate_series(1, len(w)-2)) AS i FROM toks
        |), sh AS (
        |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle FROM idx
        |), mh AS (
        |  SELECT doc_id, s.seed,
        |    min(CAST(('0x' || substr(
        |      md5(CAST(s.seed AS VARCHAR) || ':' || shingle), 1, 15)) AS BIGINT))
        |      AS mh
        |  FROM sh CROSS JOIN (SELECT unnest(generate_series(0,7)) AS seed) s
        |  GROUP BY doc_id, s.seed
        |), bands AS (
        |  SELECT doc_id, seed // 2 AS band,
        |    string_agg(CAST(mh AS VARCHAR), '|' ORDER BY seed) AS sig
        |  FROM mh GROUP BY doc_id, seed // 2
        |), cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bands a
        |  JOIN bands b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
        |), strong AS (
        |  SELECT c.doc_a, c.doc_b
        |  FROM cand c
        |  JOIN mh ma ON ma.doc_id = c.doc_a
        |  JOIN mh mb ON mb.doc_id = c.doc_b AND mb.seed = ma.seed
        |  GROUP BY c.doc_a, c.doc_b
        |  HAVING count(*) FILTER (ma.mh = mb.mh) >= 7
        |), edges AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM strong
        |  UNION
        |  SELECT doc_b, doc_a FROM strong
        |), reach(src, dst) AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN edges e ON e.src = r.dst
        |), nodes AS (SELECT DISTINCT src AS id FROM edges
        |), cl AS (
        |  SELECT n.id, least(n.id, min(r.dst)) AS cluster
        |  FROM nodes n LEFT JOIN reach r ON r.src = n.id
        |  GROUP BY n.id
        |), a AS (
        |  SELECT doc_id,
        |    CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'c'
        |      THEN 'train' ELSE 'val' END AS split
        |  FROM documents
        |), canon AS (
        |  SELECT cl.id AS doc_id, a2.split AS cs
        |  FROM cl JOIN a a2 ON a2.doc_id = cl.cluster
        |)
        |SELECT a.doc_id, a.split,
        |  COALESCE(c.cs, a.split) AS new_split,
        |  (COALESCE(c.cs, a.split) <> a.split) AS moved
        |FROM a LEFT JOIN canon c ON c.doc_id = a.doc_id
        |ORDER BY a.doc_id""".stripMargin,

    // V23: per-vec norm² is the index-order q19 fold; cross-row
    // means round(12)-staged; centroid = the q44 raw SUM(x)/n fold.
    "q255_embed_isotropy" ->
      """WITH el AS (
        |  SELECT vec_id, generate_subscripts(embedding,1) AS d,
        |         unnest(embedding)::DOUBLE AS x
        |  FROM embeddings
        |  WHERE embedding IS NOT NULL AND len(embedding) > 0
        |), n2 AS (
        |  SELECT vec_id, SUM(x * x) AS n2 FROM el GROUP BY vec_id
        |), ns AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_vecs,
        |    SUM(CAST(round(sqrt(n2), 12) AS DECIMAL(38,12))) AS sn,
        |    SUM(CAST(round(n2, 12) AS DECIMAL(38,12))) AS sn2
        |  FROM n2
        |), cen AS (
        |  SELECT d, SUM(x) / COUNT(*) AS c FROM el GROUP BY d
        |), ca AS (
        |  SELECT CAST(COUNT(*) AS INT) AS dims, SUM(c * c) AS cn2
        |  FROM cen
        |), f AS (
        |  SELECT n_vecs, dims,
        |    CAST(sn AS DOUBLE) / CAST(n_vecs AS DOUBLE) AS mean_norm,
        |    CAST(sn2 AS DOUBLE) / CAST(n_vecs AS DOUBLE) AS mean_sq,
        |    cn2
        |  FROM ns CROSS JOIN ca
        |)
        |SELECT n_vecs, dims,
        |  round(mean_norm, 6) AS mean_norm,
        |  CASE WHEN mean_norm > 0 THEN
        |    round(sqrt(greatest(mean_sq - mean_norm * mean_norm, 0.0))
        |      / mean_norm, 6) END AS norm_cv,
        |  round(sqrt(cn2), 6) AS centroid_norm,
        |  CASE WHEN mean_sq > 0 THEN round(cn2 / mean_sq, 6)
        |    END AS centroid_share
        |FROM f""".stripMargin,

    // E33: exact decimal arm moments, clamped variance components,
    // z literals ADDED on both engines (E26 one-ulp rule); means
    // signed (+ 0.0), mde non-negative.
    "q256_mde_continuous" ->
      """WITH e AS (
        |  SELECT event_type, (user_id % 2 = 0) AS a,
        |    CAST(value AS DECIMAL(18,6)) AS v
        |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
        |), g AS (
        |  SELECT event_type,
        |    CAST(SUM(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(SUM(CASE WHEN a THEN 0 ELSE 1 END) AS BIGINT) AS n_b,
        |    SUM(CASE WHEN a THEN v END) AS sa,
        |    SUM(CASE WHEN NOT a THEN v END) AS sb,
        |    SUM(CASE WHEN a THEN v * v END) AS ssa,
        |    SUM(CASE WHEN NOT a THEN v * v END) AS ssb
        |  FROM e GROUP BY 1
        |), f AS (
        |  SELECT event_type, n_a, n_b,
        |    CAST(sa AS DOUBLE) / CAST(n_a AS DOUBLE) AS ma,
        |    CAST(sb AS DOUBLE) / CAST(n_b AS DOUBLE) AS mb,
        |    (greatest(CAST(ssa AS DOUBLE) - CAST(n_a AS DOUBLE)
        |        * (CAST(sa AS DOUBLE) / CAST(n_a AS DOUBLE))
        |        * (CAST(sa AS DOUBLE) / CAST(n_a AS DOUBLE)), 0.0)
        |     + greatest(CAST(ssb AS DOUBLE) - CAST(n_b AS DOUBLE)
        |        * (CAST(sb AS DOUBLE) / CAST(n_b AS DOUBLE))
        |        * (CAST(sb AS DOUBLE) / CAST(n_b AS DOUBLE)), 0.0))
        |      / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) - 2.0) AS s2
        |  FROM g
        |), f2 AS (
        |  SELECT event_type, n_a, n_b, ma, mb, s2,
        |    (1.959964 + 0.841621) * sqrt(s2 * (1.0 / CAST(n_a AS DOUBLE)
        |      + 1.0 / CAST(n_b AS DOUBLE))) AS mde
        |  FROM f
        |)
        |SELECT event_type, n_a, n_b,
        |  CASE WHEN n_a > 0 THEN round(ma, 6) + 0.0 END AS mean_a,
        |  CASE WHEN n_b > 0 THEN round(mb, 6) + 0.0 END AS mean_b,
        |  CASE WHEN n_a > 0 AND n_b > 0 AND n_a + n_b > 2 AND s2 > 0
        |    THEN round(sqrt(s2), 6) END AS sd_pooled,
        |  CASE WHEN n_a > 0 AND n_b > 0 AND n_a + n_b > 2 AND s2 > 0
        |    THEN round(mde, 6) END AS mde_abs,
        |  CASE WHEN n_a > 0 AND n_b > 0 AND n_a + n_b > 2 AND s2 > 0
        |    AND mb > 0 THEN round(mde / mb, 6) END AS mde_rel
        |FROM f2 ORDER BY event_type""".stripMargin,

    // E35: cumulative integer cells over the bounded day table, the
    // q211 pooled-z chain per prefix, crossing compared on the
    // round(6) z and boundary; z signed (+ 0.0).
    "q259_sequential_monitor" ->
      """WITH e AS (
        |  SELECT date_trunc('day', ts) AS day, (user_id % 2 = 0) AS a,
        |    (value >= 0.5) AS conv
        |  FROM events
        |  WHERE ts IS NOT NULL AND user_id IS NOT NULL
        |    AND value IS NOT NULL
        |), d AS (
        |  SELECT day,
        |    SUM(CASE WHEN a THEN 1 ELSE 0 END) AS na,
        |    SUM(CASE WHEN a THEN 0 ELSE 1 END) AS nb,
        |    SUM(CASE WHEN a AND conv THEN 1 ELSE 0 END) AS ca,
        |    SUM(CASE WHEN (NOT a) AND conv THEN 1 ELSE 0 END) AS cb
        |  FROM e GROUP BY 1
        |), c AS (
        |  SELECT day,
        |    CAST(row_number() OVER (ORDER BY day) AS INT) AS look,
        |    CAST(COUNT(*) OVER () AS BIGINT) AS kk,
        |    CAST(SUM(na) OVER w AS BIGINT) AS n_a,
        |    CAST(SUM(nb) OVER w AS BIGINT) AS n_b,
        |    CAST(SUM(ca) OVER w AS BIGINT) AS conv_a,
        |    CAST(SUM(cb) OVER w AS BIGINT) AS conv_b
        |  FROM d
        |  WINDOW w AS (ORDER BY day ROWS UNBOUNDED PRECEDING)
        |), f AS (
        |  SELECT day, look, n_a, n_b, conv_a, conv_b,
        |    CASE WHEN n_a > 0 AND n_b > 0 AND
        |      sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
        |        * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
        |        * (1.0 / n_a + 1.0 / n_b)) > 0
        |    THEN round(
        |      (CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
        |      / sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
        |        * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
        |        * (1.0 / n_a + 1.0 / n_b)), 6) + 0.0 END AS z,
        |    round(2.04 * sqrt(CAST(kk AS DOUBLE)
        |      / CAST(look AS DOUBLE)), 6) AS threshold
        |  FROM c
        |)
        |SELECT day, look, n_a, n_b, conv_a, conv_b, z, threshold,
        |  (abs(z) >= threshold) AS crossed
        |FROM f ORDER BY look""".stripMargin,

    // E34: the q246 chain wrapped as a subquery, then one pooled
    // aggregate over its round(6) effect/se columns (both engines
    // hold those decimals exactly); pooled signed (+ 0.0).
    "q258_meta_pool" -> {
      s"""WITH eff AS (
         |  SELECT did, se FROM ($didOracleSql)
         |  WHERE did IS NOT NULL AND se IS NOT NULL AND se > 0
         |), p AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         |    SUM(CAST(round(1.0 / (se * se), 12) AS DECIMAL(38,12)))
         |      AS sw,
         |    SUM(CAST(round((1.0 / (se * se)) * did, 12)
         |      AS DECIMAL(38,12))) AS swd,
         |    SUM(CAST(round((1.0 / (se * se)) * did * did, 12)
         |      AS DECIMAL(38,12))) AS swd2
         |  FROM eff
         |), f AS (
         |  SELECT k, CAST(sw AS DOUBLE) AS swd_,
         |    CAST(swd AS DOUBLE) / CAST(sw AS DOUBLE) AS pooled,
         |    CAST(swd2 AS DOUBLE) - CAST(swd AS DOUBLE)
         |      * CAST(swd AS DOUBLE) / CAST(sw AS DOUBLE) AS q
         |  FROM p
         |)
         |SELECT k,
         |  CASE WHEN k >= 2 AND swd_ > 0 THEN round(pooled, 6) + 0.0
         |    END AS pooled,
         |  CASE WHEN k >= 2 AND swd_ > 0 THEN
         |    round(sqrt(1.0 / swd_), 6) END AS se_pooled,
         |  CASE WHEN k >= 2 AND swd_ > 0 THEN
         |    round(greatest(q, 0.0), 6) END AS q_stat,
         |  CASE WHEN k >= 2 AND swd_ > 0 AND q > 0 THEN
         |    round(greatest((q - CAST(k - 1 AS DOUBLE)) / q, 0.0), 6)
         |  END AS i2
         |FROM f""".stripMargin
    },

    // M11: the oracle predicts the construction (declared = id%3
    // list pick, header rotated for id%7 == 0) — the Spark side must
    // byte-sniff its way back to exactly this table.
    "q257_format_sniff" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    ['png','jpeg','webp'][CAST(doc_id % 3 + 1 AS INT)]
        |      AS declared,
        |    ['png','jpeg','webp'][CAST((CASE WHEN doc_id % 7 = 0
        |      THEN (doc_id % 3 + 1) % 3 ELSE doc_id % 3 END) + 1
        |      AS INT)] AS sniffed
        |  FROM documents
        |)
        |SELECT doc_id, declared, sniffed,
        |  (sniffed = declared) AS format_ok
        |FROM f ORDER BY doc_id""".stripMargin,

    // E32: per-cluster exact decimal sums, rational S²/n terms
    // round(12) into DECIMAL(38,12), exact Σn², fixed ANOVA finish;
    // icc signed (+ 0.0).
    "q252_icc_deff" ->
      """WITH e AS (
        |  SELECT event_type, user_id, CAST(value AS DECIMAL(18,6)) AS v
        |  FROM events WHERE value IS NOT NULL
        |), c AS (
        |  SELECT event_type, user_id,
        |    CAST(COUNT(*) AS BIGINT) AS nj,
        |    SUM(v) AS sj, SUM(v * v) AS ssj
        |  FROM e GROUP BY 1, 2
        |), g AS (
        |  SELECT event_type,
        |    CAST(SUM(nj) AS BIGINT) AS n_rows,
        |    CAST(COUNT(*) AS BIGINT) AS n_clusters,
        |    SUM(ssj) AS ss, SUM(sj) AS s,
        |    SUM(CAST(round(CAST(sj AS DOUBLE) * CAST(sj AS DOUBLE)
        |      / CAST(nj AS DOUBLE), 12) AS DECIMAL(38,12))) AS tb,
        |    SUM(CAST(nj * nj AS DECIMAL(38,0))) AS nj2
        |  FROM c GROUP BY 1
        |), f AS (
        |  SELECT event_type, n_rows, n_clusters,
        |    (CAST(tb AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
        |      / CAST(n_rows AS DOUBLE)) / (CAST(n_clusters AS DOUBLE)
        |      - 1.0) AS msb,
        |    (CAST(ss AS DOUBLE) - CAST(tb AS DOUBLE))
        |      / (CAST(n_rows AS DOUBLE) - CAST(n_clusters AS DOUBLE))
        |      AS msw,
        |    (CAST(n_rows AS DOUBLE) - CAST(nj2 AS DOUBLE)
        |      / CAST(n_rows AS DOUBLE))
        |      / (CAST(n_clusters AS DOUBLE) - 1.0) AS n0
        |  FROM g
        |), f2 AS (
        |  SELECT event_type, n_rows, n_clusters, msw,
        |    msb + (n0 - 1.0) * msw AS den,
        |    (msb - msw) / (msb + (n0 - 1.0) * msw) AS icc
        |  FROM f
        |)
        |SELECT event_type, n_rows, n_clusters,
        |  CASE WHEN n_clusters > 1 AND n_rows > n_clusters AND msw > 0
        |    AND den > 0 THEN round(icc, 6) + 0.0 END AS icc,
        |  CASE WHEN n_clusters > 1 AND n_rows > n_clusters AND msw > 0
        |    AND den > 0 THEN
        |    round(1.0 + (CAST(n_rows AS DOUBLE)
        |      / CAST(n_clusters AS DOUBLE) - 1.0) * icc, 6) + 0.0
        |  END AS deff
        |FROM f2 ORDER BY event_type""".stripMargin,

    // M10: exact byte histogram over the ASCII payload (byte = char
    // on this corpus — the q27 fidelity note applies), p*ln(p) terms
    // round(12) into DECIMAL(38,12), ln(2) as a shared literal.
    "q251_byte_entropy" ->
      """WITH d AS (
        |  SELECT doc_id, text FROM documents
        |  WHERE text IS NOT NULL AND length(text) > 0
        |), pos AS (
        |  SELECT doc_id, text,
        |    unnest(generate_series(1, length(text))) AS p
        |  FROM d
        |), b AS (
        |  SELECT doc_id,
        |    hex(encode(substr(text, CAST(p AS INT), 1))) AS byte
        |  FROM pos
        |), c AS (
        |  SELECT doc_id, byte, COUNT(*) AS c FROM b GROUP BY 1, 2
        |), c2 AS (
        |  SELECT doc_id, c,
        |    SUM(c) OVER (PARTITION BY doc_id) AS n
        |  FROM c
        |), s AS (
        |  SELECT doc_id, CAST(MAX(n) AS BIGINT) AS n_bytes,
        |    CAST(COUNT(*) AS BIGINT) AS n_distinct,
        |    SUM(CAST(round((CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
        |      * ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)), 12)
        |      AS DECIMAL(38,12))) AS sm
        |  FROM c2 GROUP BY doc_id
        |)
        |SELECT doc_id, n_bytes, n_distinct,
        |  round((-(CAST(sm AS DOUBLE))) / 0.6931471805599453, 6) + 0.0
        |    AS entropy_bits
        |FROM s ORDER BY doc_id""".stripMargin,

    // G8: five exact decimal degree moments over both orientations,
    // Pearson finish; r signed (+ 0.0); co-purchase edge head.
    "q248_assortativity" ->
      """WITH cp AS MATERIALIZED (
        |  SELECT DISTINCT o.o_custkey AS cust, l.l_partkey AS part
        |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        |), e0 AS MATERIALIZED (
        |  SELECT a.part AS lo, b.part AS hi
        |  FROM cp a JOIN cp b ON b.cust = a.cust AND a.part < b.part
        |  GROUP BY 1, 2
        |  HAVING count(*) >= 3
        |), nb AS MATERIALIZED (
        |  SELECT lo AS node, hi AS nbr FROM e0
        |  UNION ALL SELECT hi AS node, lo AS nbr FROM e0
        |), deg AS MATERIALIZED (
        |  SELECT node, COUNT(*) AS degree FROM nb GROUP BY node
        |), j AS (
        |  SELECT d1.degree AS dx, d2.degree AS dy
        |  FROM nb JOIN deg d1 ON d1.node = nb.node
        |  JOIN deg d2 ON d2.node = nb.nbr
        |), es AS (
        |  SELECT COUNT(*) AS mm,
        |    SUM(CAST(dx AS DECIMAL(38,0))) AS sx,
        |    SUM(CAST(dy AS DECIMAL(38,0))) AS sy,
        |    SUM(CAST(dx * dy AS DECIMAL(38,0))) AS sxy,
        |    SUM(CAST(dx * dx AS DECIMAL(38,0))) AS sxx,
        |    SUM(CAST(dy * dy AS DECIMAL(38,0))) AS syy
        |  FROM j
        |), ns AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
        |    CAST(MAX(degree) AS BIGINT) AS max_degree
        |  FROM deg
        |), em AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM e0
        |), f AS (
        |  SELECT n_nodes, n_edges, max_degree, mm,
        |    CAST(sxy AS DOUBLE) / CAST(mm AS DOUBLE)
        |      - (CAST(sx AS DOUBLE) / CAST(mm AS DOUBLE))
        |        * (CAST(sy AS DOUBLE) / CAST(mm AS DOUBLE)) AS num,
        |    CAST(sxx AS DOUBLE) / CAST(mm AS DOUBLE)
        |      - (CAST(sx AS DOUBLE) / CAST(mm AS DOUBLE))
        |        * (CAST(sx AS DOUBLE) / CAST(mm AS DOUBLE)) AS denx,
        |    CAST(syy AS DOUBLE) / CAST(mm AS DOUBLE)
        |      - (CAST(sy AS DOUBLE) / CAST(mm AS DOUBLE))
        |        * (CAST(sy AS DOUBLE) / CAST(mm AS DOUBLE)) AS deny
        |  FROM ns CROSS JOIN em CROSS JOIN es
        |)
        |SELECT n_nodes, n_edges, max_degree,
        |  round(CAST(2 * n_edges AS DOUBLE) / CAST(n_nodes AS DOUBLE), 6)
        |    AS avg_degree,
        |  CASE WHEN mm > 0 AND denx * deny > 0 THEN
        |    round(num / sqrt(denx * deny), 6) + 0.0 END AS assortativity
        |FROM f""".stripMargin,

    // E30: raw rates round(12) into DECIMAL(38,12) before the prior
    // sums; one-row prior cross join; all outputs non-negative.
    "q247_eb_shrinkage" ->
      """WITH u AS (
        |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
        |      END) AS BIGINT) AS c
        |  FROM events WHERE event_type IS NOT NULL
        |  GROUP BY user_id
        |), r AS (
        |  SELECT user_id, n, c,
        |    CAST(round(CAST(c AS DOUBLE) / CAST(n AS DOUBLE), 12)
        |      AS DECIMAL(38,12)) AS r12,
        |    CAST(round((CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
        |        * (CAST(c AS DOUBLE) / CAST(n AS DOUBLE)), 12)
        |      AS DECIMAL(38,12)) AS rr12
        |  FROM u
        |), p AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS k,
        |    SUM(r12) AS sr, SUM(rr12) AS srr
        |  FROM r
        |), f AS (
        |  SELECT r.user_id, r.n, r.c,
        |    CAST(sr AS DOUBLE) / CAST(k AS DOUBLE) AS mu,
        |    CAST(srr AS DOUBLE) / CAST(k AS DOUBLE)
        |      - (CAST(sr AS DOUBLE) / CAST(k AS DOUBLE))
        |        * (CAST(sr AS DOUBLE) / CAST(k AS DOUBLE)) AS v
        |  FROM r CROSS JOIN p
        |), f2 AS (
        |  SELECT user_id, n, c, mu, v,
        |    mu * (1.0 - mu) / v - 1.0 AS m
        |  FROM f
        |)
        |SELECT user_id, n, c,
        |  round(CAST(c AS DOUBLE) / CAST(n AS DOUBLE), 6) AS raw,
        |  CASE WHEN v > 0 AND m > 0 THEN round(mu * m, 6) END AS alpha,
        |  CASE WHEN v > 0 AND m > 0 THEN round((1.0 - mu) * m, 6)
        |    END AS beta,
        |  CASE WHEN v > 0 AND m > 0 THEN
        |    round((CAST(c AS DOUBLE) + mu * m)
        |      / (CAST(n AS DOUBLE) + m), 6) END AS shrunk
        |FROM f2 ORDER BY user_id""".stripMargin,

    // T51: within-group rank -> exact rational global index ->
    // type-7 interpolation; integer div/mod stay BIGINT end to end
    // (the q220 discipline); the finish is the FLOOR-GRID, not
    // round(6) — interpolated coarse decimals hit round-half ties.
    "q244_quantile_normalize" ->
      """WITH e AS (
        |  SELECT event_id, event_type, CAST(value AS DOUBLE) AS v
        |  FROM events WHERE value IS NOT NULL
        |), g AS (
        |  SELECT event_id, event_type, v,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY v, event_id) AS r,
        |    COUNT(*) OVER (PARTITION BY event_type) AS ng
        |  FROM e
        |), gl AS (
        |  SELECT v AS gv, row_number() OVER (ORDER BY v, event_id) AS gr
        |  FROM e
        |), nn AS (
        |  SELECT MAX(gr) AS n FROM gl
        |), p AS (
        |  SELECT g.event_id, g.event_type, g.v,
        |    (r - 1) * (n - 1) AS pn, ng - 1 AS dn
        |  FROM g CROSS JOIN nn
        |)
        |SELECT p.event_id, p.event_type, p.v AS value,
        |  CASE WHEN dn > 0 THEN
        |    CAST(floor((a.gv
        |      + (CAST(pn % dn AS DOUBLE) / CAST(dn AS DOUBLE))
        |        * (COALESCE(b.gv, a.gv) - a.gv)) * 1000000.0)
        |      AS DOUBLE) / 1000000.0
        |  END AS norm
        |FROM p
        |LEFT JOIN gl a ON a.gr =
        |  (CASE WHEN dn > 0 THEN pn // dn END) + 1
        |LEFT JOIN gl b ON b.gr =
        |  (CASE WHEN dn > 0 THEN pn // dn END) + 2
        |ORDER BY event_id""".stripMargin,

    "q220_bootstrap_ci" -> bootstrapOracleSql(b = 32, alphaPerMille = 50),

    // Full recompute from raw events — if the state merge dropped,
    // double-applied, or mis-added anything, count/sum or the digest
    // pair diverges and the hash compare fails.
    "q207_incremental_rollup" ->
      """WITH h AS (
        |  SELECT user_id, CAST(value AS DECIMAL(18,6)) AS v,
        |    CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))
        |      AS BIGINT) AS hv
        |  FROM events
        |)
        |SELECT user_id,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(CAST(SUM(v) AS DECIMAL(38,6)) AS DOUBLE) AS sum_v,
        |  CAST(MIN(v) AS DOUBLE) AS min_v,
        |  CAST(MAX(v) AS DOUBLE) AS max_v,
        |  bit_xor(hv) AS xor_hash,
        |  CAST(CAST(SUM(CAST(hv AS DECIMAL(38,0))) AS DECIMAL(38,0))
        |    AS VARCHAR) AS hash_sum
        |FROM h GROUP BY user_id ORDER BY user_id""".stripMargin,

    // q48's recursive CC chain + the q196 quality formula; pick =
    // row_number over (quality desc, doc_id) per coalesced cluster.
    "q221_canonical_pick" ->
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |), idx AS (
        |  SELECT doc_id, w, unnest(generate_series(1, len(w)-2)) AS i FROM toks
        |), sh AS (
        |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle FROM idx
        |), mh AS (
        |  SELECT doc_id, s.seed,
        |    min(CAST(('0x' || substr(
        |      md5(CAST(s.seed AS VARCHAR) || ':' || shingle), 1, 15)) AS BIGINT))
        |      AS mh
        |  FROM sh CROSS JOIN (SELECT unnest(generate_series(0,7)) AS seed) s
        |  GROUP BY doc_id, s.seed
        |), bands AS (
        |  SELECT doc_id, seed // 2 AS band,
        |    string_agg(CAST(mh AS VARCHAR), '|' ORDER BY seed) AS sig
        |  FROM mh GROUP BY doc_id, seed // 2
        |), cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bands a
        |  JOIN bands b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
        |), strong AS (
        |  SELECT c.doc_a, c.doc_b
        |  FROM cand c
        |  JOIN mh ma ON ma.doc_id = c.doc_a
        |  JOIN mh mb ON mb.doc_id = c.doc_b AND mb.seed = ma.seed
        |  GROUP BY c.doc_a, c.doc_b
        |  HAVING count(*) FILTER (ma.mh = mb.mh) >= 7
        |), edges AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM strong
        |  UNION
        |  SELECT doc_b, doc_a FROM strong
        |), reach(src, dst) AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN edges e ON e.src = r.dst
        |), nodes AS (SELECT DISTINCT src AS id FROM edges),
        |cl AS (
        |  SELECT n.id, least(n.id, min(r.dst)) AS cluster
        |  FROM nodes n LEFT JOIN reach r ON r.src = n.id
        |  GROUP BY n.id
        |), q AS (
        |  SELECT doc_id,
        |    round((CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |           / len(string_split(text, ' '))) * 0.5
        |      + (1.0 - CAST(len(list_filter(string_split(text, ' '),
        |           t -> list_contains(['the','a','of','and','is','to'], t)))
        |           AS DOUBLE) / len(string_split(text, ' '))) * 0.5, 6)
        |      AS quality
        |  FROM documents
        |), c AS (
        |  SELECT q.doc_id, COALESCE(cl.cluster, q.doc_id) AS cluster,
        |    q.quality
        |  FROM q LEFT JOIN cl ON cl.id = q.doc_id
        |)
        |SELECT doc_id, cluster, quality,
        |  (row_number() OVER (PARTITION BY cluster
        |    ORDER BY quality DESC, doc_id) = 1) AS is_canonical
        |FROM c ORDER BY doc_id""".stripMargin,

    // The q221 chain through the pick, then the q189 fingerprint of
    // the released rows per source.
    "q222_release_manifest" ->
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |), idx AS (
        |  SELECT doc_id, w, unnest(generate_series(1, len(w)-2)) AS i FROM toks
        |), sh AS (
        |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle FROM idx
        |), mh AS (
        |  SELECT doc_id, s.seed,
        |    min(CAST(('0x' || substr(
        |      md5(CAST(s.seed AS VARCHAR) || ':' || shingle), 1, 15)) AS BIGINT))
        |      AS mh
        |  FROM sh CROSS JOIN (SELECT unnest(generate_series(0,7)) AS seed) s
        |  GROUP BY doc_id, s.seed
        |), bands AS (
        |  SELECT doc_id, seed // 2 AS band,
        |    string_agg(CAST(mh AS VARCHAR), '|' ORDER BY seed) AS sig
        |  FROM mh GROUP BY doc_id, seed // 2
        |), cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bands a
        |  JOIN bands b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
        |), strong AS (
        |  SELECT c.doc_a, c.doc_b
        |  FROM cand c
        |  JOIN mh ma ON ma.doc_id = c.doc_a
        |  JOIN mh mb ON mb.doc_id = c.doc_b AND mb.seed = ma.seed
        |  GROUP BY c.doc_a, c.doc_b
        |  HAVING count(*) FILTER (ma.mh = mb.mh) >= 7
        |), edges AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM strong
        |  UNION
        |  SELECT doc_b, doc_a FROM strong
        |), reach(src, dst) AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN edges e ON e.src = r.dst
        |), nodes AS (SELECT DISTINCT src AS id FROM edges),
        |cl AS (
        |  SELECT n.id, least(n.id, min(r.dst)) AS cluster
        |  FROM nodes n LEFT JOIN reach r ON r.src = n.id
        |  GROUP BY n.id
        |), q AS (
        |  SELECT doc_id,
        |    round((CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |           / len(string_split(text, ' '))) * 0.5
        |      + (1.0 - CAST(len(list_filter(string_split(text, ' '),
        |           t -> list_contains(['the','a','of','and','is','to'], t)))
        |           AS DOUBLE) / len(string_split(text, ' '))) * 0.5, 6)
        |      AS quality
        |  FROM documents
        |), c AS (
        |  SELECT q.doc_id, COALESCE(cl.cluster, q.doc_id) AS cluster,
        |    q.quality
        |  FROM q LEFT JOIN cl ON cl.id = q.doc_id
        |), keepers AS (
        |  SELECT doc_id FROM (
        |    SELECT doc_id, row_number() OVER (PARTITION BY cluster
        |      ORDER BY quality DESC, doc_id) AS rn
        |    FROM c)
        |  WHERE rn = 1
        |), rel AS (
        |  SELECT d.source,
        |    CAST(('0x' || substr(md5(concat_ws(chr(1),
        |      CAST(d.doc_id AS VARCHAR), d.text)), 1, 15)) AS BIGINT) AS hv
        |  FROM documents d JOIN keepers k ON k.doc_id = d.doc_id
        |)
        |SELECT source,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  bit_xor(hv) AS xor_hash,
        |  CAST(CAST(SUM(CAST(hv AS DECIMAL(38,0))) AS DECIMAL(38,0))
        |    AS VARCHAR) AS sum_hash,
        |  min(hv) AS min_hash,
        |  max(hv) AS max_hash
        |FROM rel GROUP BY source ORDER BY source""".stripMargin,

    // q19's ranked chain at 50 probes, then label-relevance metrics:
    // per-term round-6 decimal gains, cumulative ideal table, single
    // IEEE finishes.
    "q219_retrieval_metrics" ->
      """WITH el AS (
        |  SELECT vec_id, generate_subscripts(embedding,1) AS d,
        |         unnest(embedding)::DOUBLE AS x
        |  FROM embeddings
        |), nrm AS (
        |  SELECT vec_id, sqrt(SUM(x*x)) AS n FROM el GROUP BY vec_id
        |), pr AS (
        |  SELECT vec_id AS probe_id, d, x FROM el WHERE vec_id < 50
        |), dots AS (
        |  SELECT p.probe_id, e.vec_id, SUM(p.x * e.x) AS dp
        |  FROM pr p JOIN el e ON e.d = p.d AND e.vec_id <> p.probe_id
        |  GROUP BY 1, 2
        |), cs AS (
        |  SELECT d.probe_id, d.vec_id, d.dp / (np.n * nv.n) AS cosine
        |  FROM dots d
        |  JOIN nrm np ON np.vec_id = d.probe_id
        |  JOIN nrm nv ON nv.vec_id = d.vec_id
        |), rk AS (
        |  SELECT probe_id, vec_id, rank FROM (
        |    SELECT probe_id, vec_id,
        |      row_number() OVER (PARTITION BY probe_id
        |        ORDER BY cosine DESC, vec_id) AS rank
        |    FROM cs)
        |  WHERE rank <= 10
        |), lab AS (SELECT vec_id AS id, label FROM embeddings),
        |lc AS (SELECT label, count(*) AS n FROM lab GROUP BY label),
        |prel AS (
        |  SELECT lab.id AS probe_id, lab.label AS plab, lc.n - 1 AS n_rel
        |  FROM lab JOIN lc USING (label)
        |), ideal AS (
        |  SELECT m, SUM(CAST(round(1.0 / log2(m + 1.0), 6)
        |      AS DECIMAL(18,6)))
        |    OVER (ORDER BY m ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW) AS idcg
        |  FROM (SELECT unnest(generate_series(1, 10)) AS m)
        |), sc AS (
        |  SELECT r.probe_id, r.rank,
        |    CASE WHEN cl.label = p.plab THEN 1 ELSE 0 END AS rel
        |  FROM rk r
        |  JOIN lab cl ON cl.id = r.vec_id
        |  JOIN prel p ON p.probe_id = r.probe_id
        |), pp AS (
        |  SELECT probe_id,
        |    MIN(CASE WHEN rel = 1 THEN rank END) AS firstrel,
        |    SUM(CASE WHEN rel = 1 THEN
        |        CAST(round(1.0 / log2(rank + 1.0), 6) AS DECIMAL(18,6))
        |      ELSE CAST(0 AS DECIMAL(18,6)) END) AS dcg
        |  FROM sc GROUP BY probe_id
        |)
        |, pu AS (
        |  SELECT probe_id, COALESCE(p.n_rel, 0) AS n_rel,
        |    pp.firstrel,
        |    COALESCE(pp.dcg, CAST(0 AS DECIMAL(18,6))) AS dcg
        |  FROM (SELECT DISTINCT probe_id FROM rk) pr
        |  LEFT JOIN prel p USING (probe_id)
        |  LEFT JOIN pp USING (probe_id)
        |)
        |SELECT probe_id, CAST(n_rel AS BIGINT) AS n_rel_corpus,
        |  CASE WHEN n_rel > 0 THEN
        |    COALESCE(round(1.0 / firstrel, 6), 0.0) END AS rr,
        |  CASE WHEN n_rel > 0 THEN CAST(dcg AS DOUBLE) END AS dcg,
        |  CASE WHEN n_rel > 0 THEN CAST(i.idcg AS DOUBLE) END AS idcg,
        |  CASE WHEN n_rel > 0 THEN round(CAST(dcg AS DOUBLE)
        |    / CAST(i.idcg AS DOUBLE), 6) END AS ndcg
        |FROM pu
        |LEFT JOIN ideal i ON i.m = least(pu.n_rel, 10)
        |ORDER BY probe_id""".stripMargin,

    // md5-prefix fold mod 5; share = n / stratum total.
    "q218_fold_balance" ->
      """WITH a AS (
        |  SELECT source,
        |    CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
        |      AS BIGINT) % 5 AS INT) AS fold
        |  FROM documents
        |), g AS (
        |  SELECT source, fold, CAST(count(*) AS BIGINT) AS n
        |  FROM a GROUP BY source, fold
        |)
        |SELECT source, fold, n,
        |  round(CAST(n AS DOUBLE) /
        |    SUM(n) OVER (PARTITION BY source), 6) AS share
        |FROM g ORDER BY source, fold""".stripMargin,

    // Same first-match tier rule in SQL: Monday-truncated weeks,
    // calendar months, max-date-per-window keepers.
    "q217_retention_plan" ->
      """WITH inv AS (
        |  SELECT DISTINCT CAST(ts AS DATE) AS pdate FROM events
        |), w AS (
        |  SELECT pdate,
        |    MAX(pdate) OVER (PARTITION BY date_trunc('week', pdate))
        |      AS wmax,
        |    MAX(pdate) OVER (PARTITION BY date_trunc('month', pdate))
        |      AS mmax
        |  FROM inv
        |)
        |SELECT pdate,
        |  CAST(datediff('day', pdate, DATE '2024-01-31') AS INT)
        |    AS age_days,
        |  CASE
        |    WHEN datediff('day', pdate, DATE '2024-01-31') < 7
        |      THEN 'daily'
        |    WHEN date_trunc('week', pdate) >=
        |        date_trunc('week', DATE '2024-01-31') - INTERVAL 3 WEEK
        |      AND pdate = wmax THEN 'weekly'
        |    WHEN date_trunc('month', pdate) >=
        |        date_trunc('month', DATE '2024-01-31') - INTERVAL 2 MONTH
        |      AND pdate = mmax THEN 'monthly'
        |    ELSE 'expired'
        |  END AS tier,
        |  CASE
        |    WHEN datediff('day', pdate, DATE '2024-01-31') < 7
        |      THEN 'daily'
        |    WHEN date_trunc('week', pdate) >=
        |        date_trunc('week', DATE '2024-01-31') - INTERVAL 3 WEEK
        |      AND pdate = wmax THEN 'weekly'
        |    WHEN date_trunc('month', pdate) >=
        |        date_trunc('month', DATE '2024-01-31') - INTERVAL 2 MONTH
        |      AND pdate = mmax THEN 'monthly'
        |    ELSE 'expired'
        |  END <> 'expired' AS keep
        |FROM w ORDER BY pdate""".stripMargin,

    // Exact decimal baseline sums, fixed double mean/std finish,
    // |v-mean| >= 3*std compare on identical doubles — no rounding
    // inside the decision.
    "q216_seasonal_anomaly" ->
      """WITH k AS (
        |  SELECT CAST(EXTRACT(dow FROM ts) AS INT) AS dow,
        |    CAST(EXTRACT(hour FROM ts) AS INT) AS hour,
        |    CAST(value AS DOUBLE) AS v, ts
        |  FROM events WHERE value IS NOT NULL
        |), b AS (
        |  SELECT dow, hour, count(*) AS n_base,
        |    SUM(CAST(v AS DECIMAL(18,4))) AS sv,
        |    SUM(CAST(v AS DECIMAL(18,4)) * CAST(v AS DECIMAL(18,4))) AS sv2
        |  FROM k WHERE ts < TIMESTAMP '2024-01-22 00:00:00'
        |  GROUP BY dow, hour
        |), bb AS (
        |  SELECT dow, hour, n_base,
        |    CAST(sv AS DOUBLE) / n_base AS m,
        |    sqrt(greatest(CAST(sv2 AS DOUBLE) / n_base
        |      - (CAST(sv AS DOUBLE) / n_base)
        |        * (CAST(sv AS DOUBLE) / n_base), 0.0)) AS s
        |  FROM b
        |)
        |SELECT k.dow, k.hour,
        |  CAST(MAX(bb.n_base) AS BIGINT) AS n_base,
        |  round(MAX(bb.m), 6) AS mean,
        |  round(MAX(bb.s), 6) AS std,
        |  CAST(count(*) AS BIGINT) AS n_eval,
        |  CAST(SUM(CASE WHEN bb.s > 0 AND abs(k.v - bb.m) >= 3.0 * bb.s
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_anom
        |FROM k JOIN bb USING (dow, hour)
        |WHERE k.ts >= TIMESTAMP '2024-01-22 00:00:00'
        |GROUP BY k.dow, k.hour ORDER BY dow, hour""".stripMargin,

    // KM replay: per-step ln rounds to 6dp DECIMAL before the exact
    // cumulative sum (q190 contract); survival re-exponentiates.
    "q214_kaplan_meier" ->
      """WITH su AS (
        |  SELECT user_id, MIN(ts) AS s_ts FROM events
        |  WHERE event_type = 'signup'
        |    AND ts < TIMESTAMP '2024-01-11 00:00:00'
        |  GROUP BY user_id
        |), subj AS (
        |  SELECT su.user_id, su.s_ts, MIN(p.ts) AS p_first
        |  FROM su LEFT JOIN events p
        |    ON p.user_id = su.user_id AND p.event_type = 'purchase'
        |      AND p.ts > su.s_ts
        |      AND p.ts < TIMESTAMP '2024-01-11 00:00:00'
        |  GROUP BY su.user_id, su.s_ts
        |), dd AS (
        |  SELECT CAST(floor((epoch_us(COALESCE(p_first,
        |      TIMESTAMP '2024-01-11 00:00:00')) - epoch_us(s_ts))
        |      / 3600000000.0) AS BIGINT) AS dur,
        |    (p_first IS NOT NULL) AS ev
        |  FROM subj
        |), g AS (
        |  SELECT dur, count(*) AS cnt,
        |    SUM(CASE WHEN ev THEN 1 ELSE 0 END) AS d
        |  FROM dd GROUP BY dur
        |), r AS (
        |  SELECT dur, d, SUM(cnt) OVER (ORDER BY dur DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_risk
        |  FROM g
        |), s AS (
        |  SELECT dur, n_risk, d,
        |    SUM(CASE WHEN d < n_risk THEN
        |      CAST(round(ln(1.0 - CAST(d AS DOUBLE) / n_risk), 6)
        |        AS DECIMAL(18,6)) END)
        |      OVER (ORDER BY dur
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ls
        |  FROM r WHERE d > 0
        |)
        |SELECT dur AS duration, CAST(n_risk AS BIGINT) AS n_risk,
        |  CAST(d AS BIGINT) AS n_events,
        |  CASE WHEN d < n_risk THEN CAST(ls AS DOUBLE) END AS log_surv,
        |  CASE WHEN d < n_risk THEN round(exp(CAST(ls AS DOUBLE)), 6)
        |       ELSE 0.0 END AS survival
        |FROM s ORDER BY duration""".stripMargin,

    // Euclidean folds to label centroids; nearest-other via the
    // (dist, clabel) total order; + 0.0 on the signed silhouette.
    "q213_silhouette" ->
      """WITH el AS MATERIALIZED (
        |  SELECT vec_id, label, generate_subscripts(embedding,1) AS d,
        |         unnest(embedding)::DOUBLE AS x
        |  FROM embeddings WHERE label IS NOT NULL
        |), cen AS MATERIALIZED (
        |  SELECT label AS clabel, d, SUM(x) / count(*) AS c
        |  FROM el GROUP BY label, d
        |), dists AS MATERIALIZED (
        |  SELECT e.vec_id, e.label, cen.clabel,
        |    sqrt(SUM((e.x - cen.c) * (e.x - cen.c))) AS dist
        |  FROM el e JOIN cen ON cen.d = e.d
        |  GROUP BY e.vec_id, e.label, cen.clabel
        |), own AS (
        |  SELECT vec_id, label, dist AS a FROM dists
        |  WHERE label = clabel
        |), other AS (
        |  SELECT vec_id, dist AS b, clabel AS b_label FROM (
        |    SELECT vec_id, dist, clabel,
        |      row_number() OVER (PARTITION BY vec_id
        |        ORDER BY dist, clabel) AS rn
        |    FROM dists WHERE label <> clabel)
        |  WHERE rn = 1
        |)
        |SELECT o.vec_id, o.label,
        |  round(o.a, 6) AS a_dist,
        |  round(t.b, 6) AS b_dist,
        |  t.b_label,
        |  CASE WHEN greatest(o.a, t.b) > 0 THEN
        |    round((t.b - o.a) / greatest(o.a, t.b), 6) + 0.0
        |  END AS silhouette
        |FROM own o JOIN other t USING (vec_id)
        |ORDER BY o.vec_id""".stripMargin,

    // Long-format survivorship replay: per field last_value IGNORE
    // NULLS over (ts, event_id), one row per (key, field).
    "q223_streaming_golden_twin" ->
      """WITH f AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN event_type <> 'signup' THEN props END AS props,
        |    event_type
        |  FROM events
        |), w AS (
        |  SELECT user_id,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY user_id) AS n,
        |    last_value(props IGNORE NULLS) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |      AS props,
        |    last_value(event_type IGNORE NULLS) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |      AS event_type
        |  FROM f
        |), g AS (SELECT * FROM w WHERE rn = n)
        |SELECT key, field, value, n_versions FROM (
        |  SELECT user_id AS key, 'props' AS field, props AS value,
        |    CAST(n AS BIGINT) AS n_versions FROM g
        |  UNION ALL
        |  SELECT user_id, 'event_type', event_type, CAST(n AS BIGINT)
        |  FROM g
        |) ORDER BY key, field""".stripMargin,

    // Byte shingles (16 hex chars every 4, = 8-byte grams stride 2)
    // through the q18 simhash chain, band buckets, char-compare
    // hamming — all-integer end to end.
    "q212_binary_neardups" ->
      """WITH b AS MATERIALIZED (
        |  SELECT doc_id, hex(encode(text)) AS hx FROM documents
        |), g AS (
        |  SELECT DISTINCT doc_id, substr(hx, CAST(i AS INT), 16) AS tok
        |  FROM (SELECT doc_id, hx,
        |          unnest(generate_series(1, greatest(length(hx) - 15, 1),
        |            4)) AS i
        |        FROM b)
        |), th AS (
        |  SELECT doc_id, md5(tok) AS h FROM g
        |), bits AS (
        |  SELECT doc_id, j.j,
        |    CASE WHEN ascii(substr(h, 1 + (j.j // 4), 1)) <= 57
        |         THEN ascii(substr(h, 1 + (j.j // 4), 1)) - 48
        |         ELSE ascii(substr(h, 1 + (j.j // 4), 1)) - 87 END AS v
        |  FROM th CROSS JOIN (SELECT unnest(generate_series(0,63)) AS j) j
        |), contrib AS (
        |  SELECT doc_id, j,
        |    SUM(2 * ((v // CAST(POWER(2, j % 4) AS INT)) % 2) - 1) AS s
        |  FROM bits GROUP BY doc_id, j
        |), fp AS MATERIALIZED (
        |  SELECT doc_id,
        |    string_agg(CASE WHEN s > 0 THEN '1' ELSE '0' END, ''
        |      ORDER BY j) AS fp
        |  FROM contrib GROUP BY doc_id
        |), bands AS (
        |  SELECT doc_id, k, bv FROM (
        |    SELECT doc_id, k,
        |      substr(fp, CAST(1 + 16*k AS INT), 16) AS bv,
        |      row_number() OVER (PARTITION BY k,
        |        substr(fp, CAST(1 + 16*k AS INT), 16)
        |        ORDER BY doc_id) AS rn
        |    FROM fp, (SELECT unnest([0,1,2,3]) AS k))
        |  WHERE rn <= 64
        |), cand AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b
        |  FROM bands a JOIN bands b2
        |    ON a.k = b2.k AND a.bv = b2.bv AND a.doc_id < b2.doc_id
        |), ham AS (
        |  SELECT c.id_a, c.id_b,
        |    CAST(SUM(CASE WHEN substr(fa.fp, CAST(c.p AS INT), 1)
        |                    <> substr(fb.fp, CAST(c.p AS INT), 1)
        |             THEN 1 ELSE 0 END) AS INT) AS hamming
        |  FROM (SELECT id_a, id_b, unnest(generate_series(1, 64)) AS p
        |        FROM cand) c
        |  JOIN fp fa ON fa.doc_id = c.id_a
        |  JOIN fp fb ON fb.doc_id = c.id_b
        |  GROUP BY c.id_a, c.id_b
        |)
        |SELECT id_a, id_b, hamming FROM ham
        |WHERE hamming <= 3 ORDER BY id_a, id_b""".stripMargin,

    // Same fixed op chain over exact counts; + 0.0 carries the
    // signed-zero normalization on the signed z.
    "q211_ab_ztest" ->
      """WITH u AS (
        |  SELECT user_id,
        |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
        |  FROM events GROUP BY user_id
        |), c AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_a,
        |    CAST(SUM(CASE WHEN user_id % 2 <> 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_b,
        |    CAST(SUM(CASE WHEN user_id % 2 = 0 AND conv = 1 THEN 1 ELSE 0
        |      END) AS BIGINT) AS conv_a,
        |    CAST(SUM(CASE WHEN user_id % 2 <> 0 AND conv = 1 THEN 1 ELSE 0
        |      END) AS BIGINT) AS conv_b
        |  FROM u
        |)
        |SELECT n_a, n_b, conv_a, conv_b,
        |  CASE WHEN n_a > 0 THEN
        |    round(CAST(conv_a AS DOUBLE) / n_a, 6) END AS rate_a,
        |  CASE WHEN n_b > 0 THEN
        |    round(CAST(conv_b AS DOUBLE) / n_b, 6) END AS rate_b,
        |  CASE WHEN n_a > 0 AND n_b > 0 AND
        |    sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
        |      * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
        |      * (1.0 / n_a + 1.0 / n_b)) > 0
        |  THEN
        |    round((CAST(conv_a AS DOUBLE) / n_a
        |         - CAST(conv_b AS DOUBLE) / n_b)
        |      / sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
        |        * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
        |        * (1.0 / n_a + 1.0 / n_b)), 6) + 0.0
        |  END AS z
        |FROM c""".stripMargin,

    // Per-source Gini + top-decile share: ascending-rank identity
    // 2·Σrn·v − (n+1)·Σv over n·Σv, exact integral sums, two final
    // IEEE divisions (numerator ≥ 0 — no signed-zero exposure).
    "q205_source_gini" ->
      """WITH r AS (
        |  SELECT source, n_chars AS v,
        |    row_number() OVER (PARTITION BY source ORDER BY n_chars) AS rn,
        |    COUNT(*) OVER (PARTITION BY source) AS n
        |  FROM documents WHERE n_chars IS NOT NULL AND n_chars >= 0
        |)
        |SELECT source, CAST(MAX(n) AS BIGINT) AS n_docs,
        |  CAST(SUM(v) AS BIGINT) AS total,
        |  CASE WHEN SUM(v) > 0 THEN
        |    round(CAST(2 * SUM(CAST(rn * v AS DECIMAL(38,0)))
        |        - (MAX(n) + 1) * SUM(CAST(v AS DECIMAL(38,0))) AS DOUBLE)
        |      / (CAST(MAX(n) AS DOUBLE) * CAST(SUM(v) AS DOUBLE)), 6)
        |  END AS gini,
        |  CASE WHEN SUM(v) > 0 THEN
        |    round(CAST(SUM(CASE WHEN rn > n - ((n + 9) // 10)
        |        THEN v ELSE 0 END) AS DOUBLE) / CAST(SUM(v) AS DOUBLE), 6)
        |  END AS top_decile_share
        |FROM r GROUP BY source ORDER BY source""".stripMargin,

    "q169_hybrid_rrf" ->
      """WITH tf AS (
        |  SELECT doc_id, tok, COUNT(*) AS tf, MAX(dl) AS dl FROM (
        |    SELECT doc_id, len(string_split(text, ' ')) AS dl,
        |           unnest(string_split(text, ' ')) AS tok
        |    FROM documents)
        |  GROUP BY doc_id, tok
        |), dft AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
        |c AS (
        |  SELECT COUNT(*) AS n_docs,
        |    AVG(len(string_split(text, ' '))) AS avgdl
        |  FROM documents
        |), m AS (
        |  SELECT tf.doc_id, tf.tf, tf.dl, dft.df
        |  FROM tf JOIN dft USING (tok)
        |  WHERE tf.tok IN ('spark', 'vector', 'window')
        |), sc AS (
        |  SELECT doc_id,
        |    SUM(ln(1.0 + (c.n_docs - df + 0.5) / (df + 0.5))
        |        * (tf * (1.2 + 1.0))
        |        / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / c.avgdl))) AS score
        |  FROM m CROSS JOIN c GROUP BY doc_id
        |), bm AS (
        |  SELECT doc_id, r FROM (
        |    SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r
        |    FROM sc)
        |  WHERE r <= 20
        |), el AS (
        |  SELECT vec_id, generate_subscripts(embedding,1) AS d,
        |         unnest(embedding)::DOUBLE AS x
        |  FROM embeddings
        |), nrm AS (
        |  SELECT vec_id, sqrt(SUM(x*x)) AS n FROM el GROUP BY vec_id
        |), pr AS (
        |  SELECT vec_id AS probe_id, d, x FROM el WHERE vec_id = 0
        |), dots AS (
        |  SELECT p.probe_id, e.vec_id, SUM(p.x * e.x) AS dp
        |  FROM pr p JOIN el e ON e.d = p.d AND e.vec_id <> p.probe_id
        |  GROUP BY 1, 2
        |), cs AS (
        |  SELECT d.probe_id, d.vec_id, d.dp / (np.n * nv.n) AS cosine
        |  FROM dots d
        |  JOIN nrm np ON np.vec_id = d.probe_id
        |  JOIN nrm nv ON nv.vec_id = d.vec_id
        |), dn AS (
        |  SELECT doc_id, r FROM (
        |    SELECT vec_id AS doc_id,
        |      row_number() OVER (ORDER BY cosine DESC, vec_id) AS r
        |    FROM cs)
        |  WHERE r <= 20
        |), u AS (
        |  SELECT COALESCE(bm.doc_id, dn.doc_id) AS doc_id,
        |         bm.r AS br, dn.r AS dr
        |  FROM bm FULL OUTER JOIN dn ON bm.doc_id = dn.doc_id
        |), f AS (
        |  SELECT doc_id, br, dr,
        |    COALESCE(CAST(round(1.0 / (60.0 + CAST(br AS DOUBLE)), 12)
        |      AS DECIMAL(38,12)), CAST(0 AS DECIMAL(38,12))) +
        |    COALESCE(CAST(round(1.0 / (60.0 + CAST(dr AS DOUBLE)), 12)
        |      AS DECIMAL(38,12)), CAST(0 AS DECIMAL(38,12))) AS rrf
        |  FROM u
        |)
        |SELECT doc_id,
        |  CAST(COALESCE(br, 0) AS INT) AS bm25_rank,
        |  CAST(COALESCE(dr, 0) AS INT) AS dense_rank,
        |  CAST(rank AS INT) AS rank,
        |  round(CAST(rrf AS DOUBLE), 6) AS rrf_score
        |FROM (
        |  SELECT doc_id, br, dr, rrf,
        |    row_number() OVER (ORDER BY rrf DESC, doc_id) AS rank
        |  FROM f)
        |WHERE rank <= 20
        |ORDER BY rank""".stripMargin,

    "q170_sliding_chunks" ->
      """WITH tk AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks,
        |         len(string_split(text, ' ')) AS n
        |  FROM documents
        |), ch AS (
        |  SELECT doc_id, n, toks,
        |    unnest(range(0, 1 + greatest(0,
        |      CAST(ceil((n - 64) / 32.0) AS BIGINT)))) AS chunk_id
        |  FROM tk
        |)
        |SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
        |  CAST(least(64, n - chunk_id * 32) AS INT) AS chunk_tokens,
        |  array_to_string(
        |    list_slice(toks, chunk_id * 32 + 1, least(chunk_id * 32 + 64, n)),
        |    ' ') AS chunk_text
        |FROM ch ORDER BY doc_id, chunk_id""".stripMargin,

    // Identical replay to q181's oracle — the twin asserts the
    // streaming fold reproduces the batch attribution bit-for-bit.
    "q184_attribution_twin" ->
      """WITH ev AS (
        |  SELECT user_id, ts, event_type, value, event_id,
        |         epoch_us(ts) AS us
        |  FROM events
        |  WHERE event_type IN ('purchase', 'view', 'click')
        |), att AS (
        |  SELECT user_id, event_id, ts, event_type, value,
        |    (min(CASE WHEN event_type IN ('view', 'click')
        |              THEN {'u': us, 'i': event_id} END) OVER w).i AS f_id,
        |    (max(CASE WHEN event_type IN ('view', 'click')
        |              THEN {'u': us, 'i': event_id} END) OVER w).i AS l_id
        |  FROM ev
        |  WINDOW w AS (PARTITION BY user_id ORDER BY us
        |               RANGE BETWEEN 86400000000 PRECEDING
        |                 AND CURRENT ROW)
        |)
        |SELECT user_id, event_id AS conv_id, ts AS conv_ts, value,
        |  COALESCE(f_id, -1) AS first_touch_id,
        |  COALESCE(l_id, -1) AS last_touch_id
        |FROM att WHERE event_type = 'purchase'
        |ORDER BY conv_id""".stripMargin,

    "q172_truncation_recall" ->
      """WITH el AS (
        |  SELECT vec_id, generate_subscripts(embedding,1) AS d,
        |         unnest(embedding)::DOUBLE AS x
        |  FROM embeddings
        |), nrm AS (
        |  SELECT vec_id, sqrt(SUM(x*x)) AS n FROM el GROUP BY vec_id
        |), pr AS (
        |  SELECT vec_id AS probe_id, d, x FROM el WHERE vec_id < 5
        |), dots AS (
        |  SELECT p.probe_id, e.vec_id, SUM(p.x * e.x) AS dp
        |  FROM pr p JOIN el e ON e.d = p.d AND e.vec_id <> p.probe_id
        |  GROUP BY 1, 2
        |), cs AS (
        |  SELECT d.probe_id, d.vec_id, d.dp / (np.n * nv.n) AS cosine
        |  FROM dots d
        |  JOIN nrm np ON np.vec_id = d.probe_id
        |  JOIN nrm nv ON nv.vec_id = d.vec_id
        |), full_k AS (
        |  SELECT probe_id, vec_id FROM (
        |    SELECT probe_id, vec_id,
        |      row_number() OVER (PARTITION BY probe_id
        |                         ORDER BY cosine DESC, vec_id) AS rank
        |    FROM cs)
        |  WHERE rank <= 10
        |), elt AS (SELECT vec_id, d, x FROM el WHERE d <= 16
        |), nrmt AS (
        |  SELECT vec_id, sqrt(SUM(x*x)) AS n FROM elt GROUP BY vec_id
        |), prt AS (
        |  SELECT vec_id AS probe_id, d, x FROM elt WHERE vec_id < 5
        |), dotst AS (
        |  SELECT p.probe_id, e.vec_id, SUM(p.x * e.x) AS dp
        |  FROM prt p JOIN elt e ON e.d = p.d AND e.vec_id <> p.probe_id
        |  GROUP BY 1, 2
        |), cst AS (
        |  SELECT d.probe_id, d.vec_id, d.dp / (np.n * nv.n) AS cosine
        |  FROM dotst d
        |  JOIN nrmt np ON np.vec_id = d.probe_id
        |  JOIN nrmt nv ON nv.vec_id = d.vec_id
        |), trunc_k AS (
        |  SELECT probe_id, vec_id FROM (
        |    SELECT probe_id, vec_id,
        |      row_number() OVER (PARTITION BY probe_id
        |                         ORDER BY cosine DESC, vec_id) AS rank
        |    FROM cst)
        |  WHERE rank <= 10
        |)
        |SELECT f.probe_id,
        |  CAST(COUNT(t.vec_id) AS INT) AS hits,
        |  round(CAST(COUNT(t.vec_id) AS DOUBLE) / 10.0, 6) AS recall
        |FROM full_k f
        |LEFT JOIN trunc_k t
        |  ON t.probe_id = f.probe_id AND t.vec_id = f.vec_id
        |GROUP BY f.probe_id
        |ORDER BY f.probe_id""".stripMargin,

    // In the above-vocabulary capacity regime Misra-Gries is exact
    // counting (no counter ever evicts), so the sharded stateful fold
    // must reproduce a plain GROUP BY — top-100 by (est desc, token).
    "q166_heavy_hitters_twin" ->
      """SELECT CAST(user_id % 1000 AS VARCHAR) AS token,
        |  CAST(count(*) AS BIGINT) AS est
        |FROM events
        |GROUP BY 1
        |ORDER BY est DESC, token
        |LIMIT 100""".stripMargin,

    // Full recompute over old ∪ new — the incremental result must
    // equal it exactly (same total tie rule both sides).
    "q155_incremental_topk" ->
      """WITH uni AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 50000 AS vec_id, embedding
        |  FROM embeddings WHERE vec_id % 7 = 3
        |), el AS (
        |  SELECT vec_id, generate_subscripts(embedding,1) AS d,
        |         unnest(embedding)::DOUBLE AS x
        |  FROM uni
        |), nrm AS (
        |  SELECT vec_id, sqrt(SUM(x*x)) AS n FROM el GROUP BY vec_id
        |), pr AS (
        |  SELECT vec_id AS probe_id, d, x FROM el WHERE vec_id < 5
        |), dots AS (
        |  SELECT p.probe_id, e.vec_id, SUM(p.x * e.x) AS dp
        |  FROM pr p JOIN el e ON e.d = p.d AND e.vec_id <> p.probe_id
        |  GROUP BY 1, 2
        |), cs AS (
        |  SELECT d.probe_id, d.vec_id, d.dp / (np.n * nv.n) AS cosine
        |  FROM dots d
        |  JOIN nrm np ON np.vec_id = d.probe_id
        |  JOIN nrm nv ON nv.vec_id = d.vec_id
        |)
        |SELECT probe_id, vec_id, CAST(rank AS INT) AS rank,
        |  round(cosine, 6) + 0.0 AS cosine
        |FROM (
        |  SELECT probe_id, vec_id, cosine,
        |    row_number() OVER (PARTITION BY probe_id
        |                       ORDER BY cosine DESC, vec_id) AS rank
        |  FROM cs)
        |WHERE rank <= 10
        |ORDER BY probe_id, rank""".stripMargin,

    // Mirrors substringDedup: n-gram at position p = toks[p+1..p+8]
    // (DuckDB list slice is 1-based inclusive), corpus counts with
    // multiplicity, covered = windowed max(flag) over the k-1
    // trailing starts, spans = covered with uncovered predecessor.
    // string_agg skips NULL (removed) tokens; COALESCE '' matches
    // Spark's array_join on an all-removed doc.
    "q156_substring_dedup" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        |), p AS (
        |  SELECT doc_id, pos, toks[pos + 1] AS tok,
        |    CASE WHEN pos <= len(toks) - 8
        |         THEN array_to_string(toks[pos + 1:pos + 8], ' ') END AS ng
        |  FROM (SELECT doc_id, toks, unnest(range(len(toks))) AS pos FROM t)
        |), c AS (
        |  SELECT ng FROM p WHERE ng IS NOT NULL
        |  GROUP BY ng HAVING count(*) >= 2
        |), f AS (
        |  SELECT p.doc_id, p.pos, p.tok,
        |    CASE WHEN c.ng IS NOT NULL THEN 1 ELSE 0 END AS flag
        |  FROM p LEFT JOIN c ON c.ng = p.ng
        |), w AS (
        |  SELECT *, max(flag) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS cov
        |  FROM f
        |), w2 AS (
        |  SELECT *, CASE WHEN cov = 1 AND COALESCE(lag(cov) OVER (
        |      PARTITION BY doc_id ORDER BY pos), 0) = 0
        |    THEN 1 ELSE 0 END AS span_start
        |  FROM w
        |)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(sum(cov) AS BIGINT) AS n_removed,
        |  CAST(sum(span_start) AS BIGINT) AS n_spans,
        |  COALESCE(string_agg(CASE WHEN cov = 0 THEN tok END, ' '
        |    ORDER BY pos), '') AS cleaned_text
        |FROM w2 GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Mirrors temperatureMixture at alpha=0.5: sqrt weights through
    // DECIMAL(28,10) (exact order-independent total), (200*w)/W
    // targets, largest-remainder on (frac desc, source), md5-ordered
    // per-source picks cut at the dynamic budget.
    "q158_temperature_mixture" ->
      """WITH s AS (
        |  SELECT source, CAST(SUM(n_chars) AS DOUBLE) AS cnt
        |  FROM documents GROUP BY source
        |), w AS (
        |  SELECT source,
        |    CAST(CAST(sqrt(cnt) AS DECIMAL(28,10)) AS DOUBLE) AS w
        |  FROM s
        |), tot AS (
        |  SELECT CAST(SUM(CAST(w AS DECIMAL(28,10))) AS DOUBLE) AS tw
        |  FROM w
        |), tg AS (
        |  SELECT source, (200.0 * w) / tot.tw AS target FROM w, tot
        |), fl AS (
        |  SELECT source, CAST(floor(target) AS BIGINT) AS base,
        |    target - floor(target) AS frac
        |  FROM tg
        |), r AS (
        |  SELECT source, base,
        |    row_number() OVER (ORDER BY frac DESC, source) AS fr
        |  FROM fl
        |), b AS (
        |  SELECT source, base + CASE WHEN fr <= (SELECT 200 - SUM(base)
        |      FROM fl) THEN 1 ELSE 0 END AS k
        |  FROM r
        |), ranked AS (
        |  SELECT source, doc_id, CAST(row_number() OVER (
        |      PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INT)
        |    AS pick_rank
        |  FROM documents
        |)
        |SELECT d.source, d.doc_id, d.pick_rank
        |FROM ranked d JOIN b ON b.source = d.source
        |WHERE d.pick_rank <= b.k
        |ORDER BY d.source, d.pick_rank""".stripMargin,

    // Brute-force containment ground truth: every shingle-sharing
    // ordered pair, overlap / probe size, no prefix shortcut — the
    // oracle proves the prefix+size pruning loses nothing.
    "q185_containment_join" ->
      """WITH all_docs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000, text FROM documents WHERE doc_id % 50 = 0
        |), toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM all_docs
        |), idx AS (
        |  SELECT doc_id, w, unnest(generate_series(1, len(w)-2)) AS i FROM toks
        |), sh AS (
        |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle FROM idx
        |), sizes AS (
        |  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
        |), inter AS (
        |  SELECT sa.doc_id AS doc, sb.doc_id AS container, count(*) AS i
        |  FROM sh sa
        |  JOIN sh sb ON sb.shingle = sa.shingle AND sa.doc_id <> sb.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT i.doc, i.container, CAST(i.i AS BIGINT) AS n_common,
        |  CAST(i.i AS DOUBLE) / za.n AS containment
        |FROM inter i
        |JOIN sizes za ON za.doc_id = i.doc
        |WHERE CAST(i.i AS DOUBLE) / za.n >= 0.8
        |ORDER BY doc, container""".stripMargin,

    "q186_pack_chunks" ->
      """WITH t AS (
        |  SELECT source, doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents
        |), c AS (
        |  SELECT source, doc_id, n_tokens,
        |    SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id) AS cum
        |  FROM t
        |)
        |SELECT source, doc_id, n_tokens,
        |  CAST(cum - n_tokens AS BIGINT) AS tok_start,
        |  CAST((cum - n_tokens) // 512 AS BIGINT) AS chunk_first,
        |  CAST(CASE WHEN n_tokens = 0 THEN (cum - n_tokens) // 512
        |            ELSE (cum - 1) // 512 END AS BIGINT) AS chunk_last,
        |  CAST(CASE WHEN n_tokens = 0 THEN 0
        |            ELSE (cum - 1) // 512 - (cum - n_tokens) // 512 + 1
        |       END AS BIGINT) AS n_chunks
        |FROM c ORDER BY source, doc_id""".stripMargin,

    "q187_packing_report" ->
      """WITH t AS (
        |  SELECT source, doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents
        |), c AS (
        |  SELECT source, doc_id, n_tokens,
        |    SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id) AS cum
        |  FROM t
        |), d AS (
        |  SELECT source, n_tokens,
        |    CASE WHEN n_tokens = 0 THEN 0
        |         ELSE (cum - 1) // 512 - (cum - n_tokens) // 512 + 1
        |    END AS doc_chunks
        |  FROM c
        |)
        |SELECT source,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
        |  CAST((SUM(n_tokens) + 511) // 512 AS BIGINT) AS n_chunks,
        |  CAST(CAST((SUM(n_tokens) + 511) // 512 AS BIGINT) * 512
        |    - SUM(n_tokens) AS BIGINT) AS pad_tokens,
        |  CAST(SUM(CASE WHEN doc_chunks > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS split_docs
        |FROM d GROUP BY source ORDER BY source""".stripMargin,

    "q188_interleave_order" ->
      """WITH p AS (
        |  SELECT source, doc_id,
        |    CAST(row_number() OVER (
        |      PARTITION BY source ORDER BY doc_id) AS BIGINT) AS pos
        |  FROM documents
        |)
        |SELECT source, doc_id, pos,
        |  CAST(row_number() OVER (ORDER BY pos, source, doc_id) AS BIGINT)
        |    AS global_pos
        |FROM p ORDER BY global_pos""".stripMargin,

    "q189_table_fingerprint" ->
      """WITH h AS (
        |  SELECT l_returnflag,
        |    CAST(('0x' || substr(md5(concat_ws(chr(1),
        |      CAST(l_orderkey AS VARCHAR), CAST(l_linenumber AS VARCHAR),
        |      l_returnflag, l_linestatus)), 1, 15)) AS BIGINT) AS hv
        |  FROM lineitem
        |)
        |SELECT l_returnflag,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  bit_xor(hv) AS xor_hash,
        |  CAST(CAST(SUM(CAST(hv AS DECIMAL(38,0))) AS DECIMAL(38,0))
        |    AS VARCHAR) AS sum_hash,
        |  min(hv) AS min_hash,
        |  max(hv) AS max_hash
        |FROM h GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // Mirrors TextAnalysis.zipfFit: top-500 tokens by (cnt desc,
    // token), ln values rounded to 6dp into DECIMAL(18,6) co-moments,
    // then trendFit's exact double-op OLS finish.
    "q226_pii_scan" ->
      """WITH u AS (
        |  SELECT text, 'documents' AS src FROM documents
        |  UNION ALL SELECT c_name, 'customer' FROM customer
        |  UNION ALL SELECT props, 'events' FROM events
        |), m AS (
        |  SELECT src,
        |    regexp_extract_all(coalesce(text, ''),
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}') AS em,
        |    list_filter(regexp_extract_all(coalesce(text, ''),
        |      '\b(?:[0-9]{1,3}\.)(?:[0-9]{1,3}\.)(?:[0-9]{1,3}\.)[0-9]{1,3}\b'),
        |      x -> len(list_filter(string_split(x, '.'),
        |        o -> CAST(o AS INT) > 255)) = 0) AS ip,
        |    regexp_extract_all(coalesce(text, ''), '[0-9]{9,}') AS runs
        |  FROM u
        |), m2 AS (
        |  SELECT src, em, ip, runs,
        |    list_filter(runs, d -> len(d) BETWEEN 13 AND 19 AND
        |      list_sum(list_transform(generate_series(1, len(d)), i ->
        |        CASE WHEN (len(d) - i) % 2 = 0 THEN CAST(d[i] AS INT)
        |             ELSE CASE WHEN CAST(d[i] AS INT) * 2 > 9
        |                  THEN CAST(d[i] AS INT) * 2 - 9
        |                  ELSE CAST(d[i] AS INT) * 2 END END)) % 10 = 0)
        |      AS card
        |  FROM m
        |)
        |SELECT src AS source, pii_class, n_docs, n_matches, match_chars
        |FROM (
        |  SELECT src, 'email' AS pii_class,
        |    CAST(SUM(CASE WHEN len(em) > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_docs,
        |    CAST(SUM(len(em)) AS BIGINT) AS n_matches,
        |    CAST(SUM(coalesce(list_sum(list_transform(em, x -> len(x))),
        |      0)) AS BIGINT) AS match_chars
        |  FROM m2 GROUP BY src
        |  UNION ALL
        |  SELECT src, 'ipv4',
        |    CAST(SUM(CASE WHEN len(ip) > 0 THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(SUM(len(ip)) AS BIGINT),
        |    CAST(SUM(coalesce(list_sum(list_transform(ip, x -> len(x))),
        |      0)) AS BIGINT)
        |  FROM m2 GROUP BY src
        |  UNION ALL
        |  SELECT src, 'digit_run',
        |    CAST(SUM(CASE WHEN len(runs) > 0 THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(SUM(len(runs)) AS BIGINT),
        |    CAST(SUM(coalesce(list_sum(list_transform(runs, x -> len(x))),
        |      0)) AS BIGINT)
        |  FROM m2 GROUP BY src
        |  UNION ALL
        |  SELECT src, 'card_luhn',
        |    CAST(SUM(CASE WHEN len(card) > 0 THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(SUM(len(card)) AS BIGINT),
        |    CAST(SUM(coalesce(list_sum(list_transform(card, x -> len(x))),
        |      0)) AS BIGINT)
        |  FROM m2 GROUP BY src
        |) ORDER BY source, pii_class""".stripMargin,

    "q227_pii_redact" ->
      """WITH u AS (
        |  SELECT text, 'documents' AS src FROM documents
        |  UNION ALL SELECT c_name, 'customer' FROM customer
        |  UNION ALL SELECT props, 'events' FROM events
        |), r AS (
        |  SELECT src, coalesce(text, '') AS t0,
        |    regexp_replace(
        |      regexp_replace(
        |        regexp_replace(coalesce(text, ''),
        |          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
        |          '<EMAIL>', 'g'),
        |        '\b(?:[0-9]{1,3}\.)(?:[0-9]{1,3}\.)(?:[0-9]{1,3}\.)[0-9]{1,3}\b',
        |        '<IP>', 'g'),
        |      '[0-9]{9,}', '<NUM>', 'g') AS t1
        |  FROM u
        |)
        |SELECT src AS source, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(CASE WHEN t0 <> t1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_changed,
        |  CAST(SUM(len(t0)) AS BIGINT) AS chars_before,
        |  CAST(SUM(len(t1)) AS BIGINT) AS chars_after,
        |  CAST(CAST(SUM(CAST(CAST(('0x' || substr(md5(t1), 1, 15))
        |    AS BIGINT) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS VARCHAR)
        |    AS sum_hash
        |FROM r GROUP BY src ORDER BY source""".stripMargin,

    "q190_zipf_fit" ->
      """WITH counts AS (
        |  SELECT w AS token, count(*) AS cnt
        |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  GROUP BY w
        |  ORDER BY cnt DESC, token LIMIT 500
        |), ranked AS (
        |  SELECT CAST(round(ln(row_number() OVER (
        |      ORDER BY cnt DESC, token)), 6) AS DECIMAL(18,6)) AS x,
        |    CAST(round(ln(cnt), 6) AS DECIMAL(18,6)) AS y
        |  FROM counts
        |), c AS (
        |  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
        |    CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
        |    CAST(SUM(x*y) AS DOUBLE) AS sxy, CAST(SUM(x*x) AS DOUBLE) AS sxx
        |  FROM ranked
        |)
        |SELECT 'corpus' AS corpus, CAST(n AS BIGINT) AS n_ranks,
        |  CASE WHEN n >= 2 AND n*sxx - sx*sx > 0
        |       THEN round((n*sxy - sx*sy) / (n*sxx - sx*sx), 6) + 0.0
        |       END AS slope,
        |  CASE WHEN n >= 2 AND n*sxx - sx*sx > 0
        |       THEN round((sy - ((n*sxy - sx*sy) / (n*sxx - sx*sx)) * sx)
        |                  / n, 6) + 0.0 END AS intercept
        |FROM c ORDER BY corpus""".stripMargin,

    "q191_vocab_richness" ->
      """WITH tf AS (
        |  SELECT source, w AS token, count(*) AS c
        |  FROM (SELECT source, unnest(string_split(text, ' ')) AS w
        |        FROM documents)
        |  GROUP BY source, w
        |)
        |SELECT source,
        |  CAST(SUM(c) AS BIGINT) AS n_tokens,
        |  CAST(count(*) AS BIGINT) AS vocab,
        |  CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
        |  round(CAST(count(*) AS DOUBLE) / SUM(c), 6) AS ttr,
        |  round(CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |        / count(*), 6) AS hapax_share
        |FROM tf GROUP BY source ORDER BY source""".stripMargin,

    // Brute-force triangle ground truth over the same LSH candidate
    // edges (q16/q128's bands CTE), no orientation shortcut — proves
    // the degree-ordered wedge enumeration counts every triangle
    // exactly once.
    // G15: the q192 chain + the one-row transitivity aggregate —
    // integral halves/thirds, HUGEINT wedge sum rendered VARCHAR.
    "q327_transitivity" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |), idx AS (
        |  SELECT doc_id, w, unnest(generate_series(1, len(w)-2)) AS i FROM toks
        |), sh AS (
        |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle FROM idx
        |), mh AS (
        |  SELECT doc_id, s.seed,
        |    min(CAST(('0x' || substr(
        |      md5(CAST(s.seed AS VARCHAR) || ':' || shingle), 1, 15)) AS BIGINT))
        |      AS mh
        |  FROM sh CROSS JOIN (SELECT unnest(generate_series(0,7)) AS seed) s
        |  GROUP BY doc_id, s.seed
        |), bands AS (
        |  SELECT doc_id, seed // 2 AS band,
        |    string_agg(CAST(mh AS VARCHAR), '|' ORDER BY seed) AS sig
        |  FROM mh GROUP BY doc_id, seed // 2
        |), und AS MATERIALIZED (
        |  SELECT DISTINCT a.doc_id AS lo, b.doc_id AS hi
        |  FROM bands a
        |  JOIN bands b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
        |), deg AS (
        |  SELECT node, count(*) AS degree FROM (
        |    SELECT lo AS node FROM und UNION ALL SELECT hi AS node FROM und
        |  ) GROUP BY node
        |), tri AS (
        |  SELECT e1.lo AS a, e1.hi AS b, e2.hi AS c
        |  FROM und e1
        |  JOIN und e2 ON e2.lo = e1.hi
        |  JOIN und e3 ON e3.lo = e1.lo AND e3.hi = e2.hi
        |), pn AS (
        |  SELECT node, count(*) AS n FROM (
        |    SELECT a AS node FROM tri
        |    UNION ALL SELECT b AS node FROM tri
        |    UNION ALL SELECT c AS node FROM tri
        |  ) GROUP BY node
        |), j AS (
        |  SELECT d.degree, coalesce(pn.n, 0) AS tri3
        |  FROM deg d LEFT JOIN pn USING (node)
        |)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
        |  CAST(SUM(degree) // 2 AS BIGINT) AS n_edges,
        |  CAST(CAST(SUM((degree::HUGEINT * (degree - 1)) // 2)
        |    AS HUGEINT) AS VARCHAR) AS n_wedges,
        |  CAST(SUM(tri3) // 3 AS BIGINT) AS n_triangles,
        |  CASE WHEN SUM((degree::HUGEINT * (degree - 1)) // 2) > 0
        |    THEN round(CAST(SUM(tri3) AS DOUBLE) /
        |      CAST(SUM((degree::HUGEINT * (degree - 1)) // 2)
        |        AS DOUBLE), 6) END AS global_clustering
        |FROM j""".stripMargin,

    "q192_triangle_counts" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |), idx AS (
        |  SELECT doc_id, w, unnest(generate_series(1, len(w)-2)) AS i FROM toks
        |), sh AS (
        |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle FROM idx
        |), mh AS (
        |  SELECT doc_id, s.seed,
        |    min(CAST(('0x' || substr(
        |      md5(CAST(s.seed AS VARCHAR) || ':' || shingle), 1, 15)) AS BIGINT))
        |      AS mh
        |  FROM sh CROSS JOIN (SELECT unnest(generate_series(0,7)) AS seed) s
        |  GROUP BY doc_id, s.seed
        |), bands AS (
        |  SELECT doc_id, seed // 2 AS band,
        |    string_agg(CAST(mh AS VARCHAR), '|' ORDER BY seed) AS sig
        |  FROM mh GROUP BY doc_id, seed // 2
        |), und AS (
        |  SELECT DISTINCT a.doc_id AS lo, b.doc_id AS hi
        |  FROM bands a
        |  JOIN bands b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
        |), deg AS (
        |  SELECT node, count(*) AS degree FROM (
        |    SELECT lo AS node FROM und UNION ALL SELECT hi AS node FROM und
        |  ) GROUP BY node
        |), tri AS (
        |  SELECT e1.lo AS a, e1.hi AS b, e2.hi AS c
        |  FROM und e1
        |  JOIN und e2 ON e2.lo = e1.hi
        |  JOIN und e3 ON e3.lo = e1.lo AND e3.hi = e2.hi
        |), pn AS (
        |  SELECT node, count(*) AS n FROM (
        |    SELECT a AS node FROM tri
        |    UNION ALL SELECT b AS node FROM tri
        |    UNION ALL SELECT c AS node FROM tri
        |  ) GROUP BY node
        |)
        |SELECT d.node, d.degree, CAST(coalesce(pn.n, 0) AS BIGINT)
        |  AS n_triangles
        |FROM deg d LEFT JOIN pn USING (node)
        |ORDER BY node""".stripMargin
  )
}
