package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.functions.{col, size}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions
import graft.operators.Dedup

/** SQL registration of the custom Catalyst expressions: runtime
  * registry install + extensions entry point. */
class GraftFunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("graft_simhash64 callable from SQL, matches the Column API") {
    GraftFunctions.register(spark)
    Seq((1L, "spark native engine"), (2L, "another doc entirely"))
      .toDF("doc_id", "text").createOrReplaceTempView("fn_docs")
    val viaSql = spark.sql(
      "SELECT doc_id, graft_simhash64(text) AS fp FROM fn_docs")
      .as[(Long, String)].collect().toMap
    val viaCol = spark.table("fn_docs")
      .select(col("doc_id"), Dedup.simhashFast(col("text")).as("fp"))
      .as[(Long, String)].collect().toMap
    assert(viaSql === viaCol)
    assert(viaSql(1L).length === 64)
  }

  test("graft_minhash_sig callable from SQL; non-literal params rejected") {
    GraftFunctions.register(spark)
    Seq((1L, "a b c d e f")).toDF("doc_id", "text")
      .createOrReplaceTempView("fn_docs2")
    val sig = spark.sql(
      "SELECT graft_minhash_sig(text, 4, 3) AS sig FROM fn_docs2")
      .as[Seq[Long]].head()
    assert(sig.length === 4)
    assert(sig.forall(_ >= 0L)) // 60-bit prefixes are non-negative
    val err = intercept[Exception] {
      spark.sql("SELECT graft_minhash_sig(text, doc_id, 3) FROM fn_docs2")
        .collect()
    }
    assert(err.getMessage.contains("integer literal")
      || err.getCause != null)
  }

  test("graft_ngram_jaccard and graft_rolling_chunks callable from SQL") {
    GraftFunctions.register(spark)
    val (common, jac) = spark.sql(
      "SELECT graft_ngram_jaccard('a b c d', 'a b c e', 3) AS j")
      .select("j.n_common", "j.jaccard").as[(Int, Double)].head()
    assert(common === 1) // shares only "a b c"
    assert(jac === 1.0 / 3) // union of {abc,bcd} and {abc,bce} has 3
    val chunks = spark.sql(
      "SELECT graft_rolling_chunks('short text', 16, 32) AS c")
      .select(size(col("c"))).as[Int].head()
    assert(chunks === 1) // shorter than window -> single tail chunk
  }

  test("graft_srp_buckets and graft_shingles callable from SQL") {
    GraftFunctions.register(spark)
    Seq((1L, Array(1.0f, 0.0f, 0.0f), "a b c d"))
      .toDF("id", "vec", "text").createOrReplaceTempView("fn_vecs")
    val buckets = spark.sql(
      "SELECT graft_srp_buckets(vec, 8, 2) AS b FROM fn_vecs")
      .as[Seq[String]].head()
    assert(buckets.length === 2)
    assert(buckets.forall(b => b.length == 8 && b.forall(c => c == '0' || c == '1')))
    val sh = spark.sql("SELECT graft_shingles(text, 2) AS s FROM fn_vecs")
      .as[Seq[String]].head()
    assert(sh === Seq("a b", "b c", "c d"))
  }

  test("GraftExtensions injects all functions without error") {
    new graft.functions.GraftExtensions().apply(new SparkSessionExtensions)
  }

  test("graft_bloom_agg / graft_bloom_contains from SQL: no false negatives") {
    GraftFunctions.register(spark)
    spark.range(0, 500).createOrReplaceTempView("bloom_in")
    // Every inserted member MUST be found (bloom has no false negatives).
    val misses = spark.sql(
      """SELECT count(*) AS missed FROM bloom_in
        |WHERE NOT graft_bloom_contains(
        |  (SELECT graft_bloom_agg(xxhash64(CAST(id AS STRING)), 10000)
        |   FROM bloom_in),
        |  xxhash64(CAST(id AS STRING)))""".stripMargin)
      .as[Long].head()
    assert(misses === 0L)
    // And the filter rejects essentially all of a disjoint probe set.
    val hits = spark.sql(
      """SELECT count(*) AS hit FROM (SELECT id + 1000000 AS pid FROM bloom_in)
        |WHERE graft_bloom_contains(
        |  (SELECT graft_bloom_agg(xxhash64(CAST(id AS STRING)), 10000)
        |   FROM bloom_in),
        |  xxhash64(CAST(pid AS STRING)))""".stripMargin)
      .as[Long].head()
    assert(hits < 25) // ~3% fpp envelope on 500 probes
  }

  test("graft_cms_estimate probes count_min_sketch in-plan: never under, eps-bounded over") {
    GraftFunctions.register(spark)
    // Skewed stream: value v appears v times, v in 1..60 (1830 rows).
    spark.range(1, 61)
      .selectExpr("explode(sequence(1, id)) AS n", "CAST(id AS STRING) AS k")
      .createOrReplaceTempView("cms_in")
    val rows = spark.sql(
      """SELECT k, count(*) AS exact_n,
        |  graft_cms_estimate(
        |    (SELECT count_min_sketch(k, 0.001d, 0.99d, 7) FROM cms_in),
        |    k) AS est
        |FROM cms_in GROUP BY k""".stripMargin)
      .as[(String, Long, Long)].collect()
    assert(rows.length === 60)
    rows.foreach { case (k, exact, est) =>
      assert(est >= exact, s"CMS undercounted $k: $est < $exact")
      assert(est <= exact + 2, s"CMS overcount for $k beyond eps*N: $est vs $exact")
    }
    // Long item path: same contract on a bigint column.
    val longEst = spark.sql(
      """SELECT graft_cms_estimate(
        |  (SELECT count_min_sketch(CAST(n AS BIGINT), 0.001d, 0.99d, 7)
        |   FROM cms_in), CAST(1 AS BIGINT))""".stripMargin)
      .as[Long].head()
    assert(longEst >= 60L) // n=1 appears once per of the 60 groups
  }

  test("graft_jaro_winkler: literature goldens, 0.7 boost gate, SQL parity") {
    import graft.functions.JaroWinklerSim
    def jw(a: String, b: String): Double =
      Seq((a, b)).toDF("a", "b")
        .select(JaroWinklerSim(col("a"), col("b"))).as[Double].head()
    // Classic literature values (also DuckDB-verified to 12 decimals).
    assert(math.abs(jw("martha", "marhta") - 0.9611111111111111) < 1e-15)
    assert(math.abs(jw("dixon", "dicksonx") - 0.8133333333333332) < 1e-12)
    assert(math.abs(jw("jellyfish", "smellyfish") - 0.8962962962962964) < 1e-12)
    // Boost gate: jaro <= 0.7 gets NO prefix boost (abcdef/abzzzz
    // shares a 2-char prefix but jaro = 5/9).
    assert(math.abs(jw("abcdef", "abzzzz") - 5.0 / 9.0) < 1e-15)
    // Edges: both empty = 1, one empty = 0, no matches = 0,
    // adjacent transposition outside the window = 0.
    assert(jw("", "") === 1.0)
    assert(jw("", "abc") === 0.0)
    assert(jw("abc", "xyz") === 0.0)
    assert(jw("ab", "ba") === 0.0)
    assert(jw("same", "same") === 1.0)
    // SQL registration matches the Column API.
    graft.functions.GraftFunctions.register(spark)
    val viaSql = spark.sql(
      "SELECT graft_jaro_winkler('martha', 'marhta')").as[Double].head()
    assert(viaSql === jw("martha", "marhta"))
  }
}
