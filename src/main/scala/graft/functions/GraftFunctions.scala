package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/**
 * SQL surface for the engine's custom Catalyst expressions:
 *
 *   - `graft_simhash64(text)` → 64-char '0'/'1' SimHash fingerprint
 *   - `graft_jaro_winkler(a, b)` → double JW similarity (0.7-boost variant)
 *   - `graft_minhash_sig(text, numHashes, shingleSize)` → array<bigint>
 *     MinHash signature
 *   - `graft_ngram_jaccard(a, b, n)` → struct<n_common:int,
 *     jaccard:double> exact word n-gram similarity
 *   - `graft_rolling_chunks(text, windowSize, divisor)` →
 *     array<struct<start:int, len:int>> content-defined chunk spans
 *   - `graft_srp_buckets(vec, numPlanes, numTables)` →
 *     array<string> SRP-LSH bucket per table
 *   - `graft_shingles(text, n)` → array<string> distinct word n-grams
 *   - `graft_position_grams(text, k)` → array<struct<tok:string,
 *     ng:string>> per-position token + full-window k-gram (NULL tail)
 *   - `graft_tagged_grams(text, n, ...)` → array<struct<gn:int,
 *     g:string>> all word n-grams per requested length, tagged
 *   - `graft_pair_moments(vec, scaleExp)` → array<struct<i:int,
 *     j:int, v:long>> floor-quantized first + pair second moments
 *
 * Integer parameters must be int literals — they parameterize the
 * generated code.
 *
 * Two wiring paths, same builders:
 *   - [[GraftFunctions.register]] installs into a live session's
 *     function registry (idempotent);
 *   - [[GraftExtensions]] is a `spark.sql.extensions` entry point
 *     (`--conf spark.sql.extensions=graft.functions.GraftExtensions`)
 *     for cluster-wide installation at session build time.
 */
object GraftFunctions {

  private def intLit(e: Expression, arg: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$arg must be an integer literal, got: $other")
  }

  /** Int OR bigint literal — for parameters whose underlying
    * expression takes a Long (SQL integer literals above 2^31 parse
    * as LongType). */
  private def longLit(e: Expression, arg: String): Long = e match {
    case Literal(v: Int, IntegerType) => v.toLong
    case Literal(v: Long, org.apache.spark.sql.types.LongType) => v
    case other => throw new IllegalArgumentException(
      s"$arg must be an integer or bigint literal, got: $other")
  }

  /** (name, info, builder) triples for every custom function. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (
      FunctionIdentifier("graft_simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash64"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, "graft_simhash64(text) takes 1 argument")
        SimHash64(exprs.head)
      }),
    (
      FunctionIdentifier("graft_jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinklerSim].getName, "graft_jaro_winkler"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "graft_jaro_winkler(a, b) takes 2 arguments")
        JaroWinklerSim(exprs.head, exprs(1))
      }),
    (
      FunctionIdentifier("graft_minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "graft_minhash_sig"),
      (exprs: Seq[Expression]) => {
        require(
          exprs.length == 3,
          "graft_minhash_sig(text, numHashes, shingleSize) takes 3 arguments")
        MinHashSig(
          exprs.head,
          intLit(exprs(1), "numHashes"),
          intLit(exprs(2), "shingleSize"))
      }),
    (
      FunctionIdentifier("graft_ngram_jaccard"),
      new ExpressionInfo(classOf[NGramJaccardSim].getName, "graft_ngram_jaccard"),
      (exprs: Seq[Expression]) => {
        require(
          exprs.length == 3,
          "graft_ngram_jaccard(a, b, n) takes 3 arguments")
        NGramJaccardSim(exprs.head, exprs(1), intLit(exprs(2), "n"))
      }),
    (
      FunctionIdentifier("graft_rolling_chunks"),
      new ExpressionInfo(classOf[RollingChunks].getName, "graft_rolling_chunks"),
      (exprs: Seq[Expression]) => {
        require(
          exprs.length == 3,
          "graft_rolling_chunks(text, windowSize, divisor) takes 3 arguments")
        RollingChunks(
          exprs.head,
          intLit(exprs(1), "windowSize"),
          intLit(exprs(2), "divisor"))
      }),
    (
      FunctionIdentifier("graft_srp_buckets"),
      new ExpressionInfo(classOf[SrpBuckets].getName, "graft_srp_buckets"),
      (exprs: Seq[Expression]) => {
        require(
          exprs.length == 3,
          "graft_srp_buckets(vec, numPlanes, numTables) takes 3 arguments")
        SrpBuckets(
          exprs.head,
          intLit(exprs(1), "numPlanes"),
          intLit(exprs(2), "numTables"))
      }),
    (
      FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[ShingleArray].getName, "graft_shingles"),
      (exprs: Seq[Expression]) => {
        require(
          exprs.length == 2,
          "graft_shingles(text, n) takes 2 arguments")
        ShingleArray(exprs.head, intLit(exprs(1), "n"))
      }),
    (
      FunctionIdentifier("graft_position_grams"),
      new ExpressionInfo(classOf[PositionGrams].getName, "graft_position_grams"),
      (exprs: Seq[Expression]) => {
        require(
          exprs.length == 2,
          "graft_position_grams(text, k) takes 2 arguments")
        PositionGrams(exprs.head, intLit(exprs(1), "k"))
      }),
    (
      FunctionIdentifier("graft_tagged_grams"),
      new ExpressionInfo(classOf[TaggedGrams].getName, "graft_tagged_grams"),
      (exprs: Seq[Expression]) => {
        require(
          exprs.length >= 2,
          "graft_tagged_grams(text, n, ...) takes text plus >= 1 gram length")
        TaggedGrams(exprs.head,
          exprs.tail.zipWithIndex.map { case (e, i) => intLit(e, s"n$i") })
      }),
    (
      FunctionIdentifier("graft_pair_moments"),
      new ExpressionInfo(classOf[PairMoments].getName, "graft_pair_moments"),
      (exprs: Seq[Expression]) => {
        require(
          exprs.length == 2,
          "graft_pair_moments(vec, scaleExp) takes 2 arguments")
        PairMoments(exprs.head, intLit(exprs(1), "scaleExp"))
      }),
    (
      FunctionIdentifier("graft_vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "graft_vec_dot"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "graft_vec_dot(a, b) takes 2 arguments")
        VecDot(exprs.head, exprs(1))
      }),
    (
      FunctionIdentifier("graft_int_vec_dot"),
      new ExpressionInfo(classOf[IntVecDot].getName, "graft_int_vec_dot"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          "graft_int_vec_dot(a, b) takes 2 arguments")
        IntVecDot(exprs.head, exprs(1))
      }),
    // Bloom-filter surface: Spark ships BloomFilterAggregate /
    // BloomFilterMightContain as INTERNAL expressions (used by the
    // runtime-filter optimizer) without SQL registration — this
    // exposes them as first-class functions for explicit
    // prefilter-then-verify pipelines (TextAnalysis
    // .bloomContaminatedIds, q64). Input values must be LONG
    // (xxhash64 the payload first). NOTE: the aggregate SILENTLY
    // clamps to spark.sql.optimizer.runtime.bloomFilter.maxNumItems/
    // maxNumBits (defaults 4M/64M) — raise those confs before
    // building a larger bloom, or fpp degrades invisibly (the Scala
    // path, bloomContaminatedIds, does this automatically).
    (
      FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "graft_bloom_agg"),
      (exprs: Seq[Expression]) => {
        require(
          exprs.length == 2,
          "graft_bloom_agg(longValue, estimatedItems) takes 2 arguments")
        new org.apache.spark.sql.catalyst.expressions.aggregate
          .BloomFilterAggregate(
            exprs.head, longLit(exprs(1), "estimatedItems"))
          .toAggregateExpression()
      }),
    (
      FunctionIdentifier("graft_bloom_contains"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "graft_bloom_contains"),
      (exprs: Seq[Expression]) => {
        require(
          exprs.length == 2,
          "graft_bloom_contains(bloom, longValue) takes 2 arguments")
        org.apache.spark.sql.catalyst.expressions
          .BloomFilterMightContain(exprs.head, exprs(1))
      }),
    // Count-min probe side: Spark registers count_min_sketch (the
    // build aggregate) in SQL but ships no in-plan estimator — the
    // sketch is unusable without collect(). graft_cms_estimate(cms,
    // item) closes the loop; pair it with a scalar subquery over the
    // aggregate, same shape as graft_bloom_contains (q83).
    (
      FunctionIdentifier("graft_cms_estimate"),
      new ExpressionInfo(classOf[CmsEstimate].getName, "graft_cms_estimate"),
      (exprs: Seq[Expression]) => {
        require(
          exprs.length == 2,
          "graft_cms_estimate(cms, item) takes 2 arguments")
        CmsEstimate(exprs.head, exprs(1))
      }))

  /** Install into a live session (idempotent; replaces old builders). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(ident, info, builder)
    }
}

/** `spark.sql.extensions` entry point injecting the custom functions
  * into every session built with these extensions. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.functions.foreach { case (ident, info, builder) =>
      ext.injectFunction((ident, info, builder))
    }
}
