package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Empirical scale-slope audit (VERDICT r4 #2): measure how each
 * operator family's wall time actually grows from sf0.1 to a
 * synthesized 10× corpus, instead of arguing 100 TB readiness from
 * plan shapes alone. Ideal slope at 10× data on fixed local[32]
 * parallelism is ≈10; anything well above (default flag at >15) means
 * superlinear work — a scale-killer to re-audit.
 *
 * The 10× corpus is derived from sf0.1 by key-remapped replication
 * (stride larger than any key space, so FK joins stay consistent and
 * key spaces stay disjoint):
 *   - region/nation are FIXED reference dims at every SF (TPC-H
 *     semantics) and are copied as-is;
 *   - fact/dim keys shift by `replica × STRIDE` so each replica is a
 *     self-consistent sub-universe (orders→customer, lineitem→orders/
 *     part/supplier, events.user_id);
 *   - documents: every token gets a replica prefix (replica 0 keeps
 *     the original text), so cross-replica similarity is ZERO while
 *     intra-replica dup/near-dup structure is preserved exactly —
 *     duplicate-group sizes stay constant and group count grows 10×,
 *     the realistic shape for a 10× corpus (naive text copies would
 *     make every doc a 10-clique of near-dups and force quadratic
 *     candidate growth that says nothing about the plan);
 *   - embeddings: each replica's vectors are circularly rotated by a
 *     replica-dependent offset — norms preserved, cosine alignment to
 *     other replicas destroyed, so ANN candidate volume scales with
 *     corpus size, not replica count².
 *
 * Run: `sbt -batch "runMain graft.ScaleAudit"`. Generation happens
 * once (marker file); timings are min-of-2 noop-sink passes per dir,
 * the Bench methodology. One JSON line lands in
 * `target/scale_audit.json`; per-query lines print as `[scale] ...`.
 */
object ScaleAudit {

  private val STRIDE = 10000000L

  /** EVERY registered oracle query (VERDICT r5 #3 — the previous
    * hand-picked 56 left 4 of the 5 most expensive queries without a
    * measured slope). Derived from the registry so a new query can
    * never silently miss the audit; numeric sort keeps the q01…q130
    * reading order. */
  private def auditQueries: Seq[String] = {
    // SPARK_GRAFT_ONLY=q130,q111 (prefix match) narrows a re-audit to
    // the queries under repair — same contract as Verify/Bench.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    SparkEntry.queries.keys.toSeq
      .filter(n => only.forall(_.exists(n.startsWith)))
      .sortBy(n => (n.drop(1).takeWhile(_.isDigit).toInt, n))
  }

  private def exec(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  private def generate(
      spark: SparkSession, srcDir: String, outDir: String, factor: Int): Unit = {
    val done = Paths.get(outDir, "_DONE")
    if (Files.exists(done)) return
    Files.createDirectories(Paths.get(outDir))
    val reps = spark.range(factor.toLong).toDF("__rep")
    val rep = col("__rep")
    def src(name: String) = graft.sources.Tables.load(spark, srcDir, name)
    def write(df: DataFrame, name: String): Unit =
      df.write.mode("overwrite").parquet(s"$outDir/$name.parquet")
    def shifted(c: String) = (col(c) + rep * STRIDE).as(c)

    write(src("region"), "region")
    write(src("nation"), "nation")
    write(src("customer").crossJoin(reps).select(
      shifted("c_custkey"), col("c_name"), col("c_nationkey"),
      col("c_acctbal"), col("c_mktsegment")), "customer")
    write(src("supplier").crossJoin(reps).select(
      shifted("s_suppkey"), col("s_name"), col("s_nationkey"),
      col("s_acctbal")), "supplier")
    write(src("part").crossJoin(reps).select(
      shifted("p_partkey"), col("p_name"), col("p_brand"), col("p_type"),
      col("p_size"), col("p_retailprice")), "part")
    write(src("orders").crossJoin(reps).select(
      shifted("o_orderkey"), shifted("o_custkey"), col("o_orderstatus"),
      col("o_totalprice"), col("o_orderdate"), col("o_orderpriority")),
      "orders")
    write(src("lineitem").crossJoin(reps).select(
      shifted("l_orderkey"), shifted("l_partkey"), shifted("l_suppkey"),
      col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
      col("l_discount"), col("l_tax"), col("l_returnflag"),
      col("l_linestatus"), col("l_shipdate")), "lineitem")
    write(src("events").crossJoin(reps).select(
      shifted("event_id"), col("ts"), shifted("user_id"),
      col("event_type"), col("value"), col("props")), "events")
    val replicaText = when(rep === 0, col("text")).otherwise(
      array_join(
        transform(split(col("text"), " "),
          t => concat(lit("r"), rep.cast("string"), lit("_"), t)),
        " "))
    write(src("documents").crossJoin(reps).select(
      shifted("doc_id"), replicaText.as("text"), col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")).cast("long")), "documents")
    val sz = size(col("embedding"))
    val shift = pmod(rep * lit(7), sz.cast("long")).cast("int")
    val rotated = when(rep === 0, col("embedding")).otherwise(concat(
      slice(col("embedding"), shift + 1, sz - shift),
      slice(col("embedding"), lit(1), shift)))
    write(src("embeddings").crossJoin(reps).select(
      shifted("vec_id"), rotated.as("embedding"), col("label")),
      "embeddings")
    Files.createFile(done)
  }

  def main(args: Array[String]): Unit = {
    val smallDir = args.lift(0).getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val bigDir = args.lift(1).getOrElse("target/scale-audit/sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val flagAbove = 15.0
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    generate(spark, smallDir, bigDir, factor)

    val qs = SparkEntry.queries
    def timeIn(dir: String, name: String): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        exec(qs(name)(spark, dir))
        (System.nanoTime() - t0) / 1e9
      }
      math.min(once(), once())
    }
    val rows = auditQueries.map { name =>
      val small = timeIn(smallDir, name)
      val big = timeIn(bigDir, name)
      val slope = big / small
      val flag = if (slope > flagAbove) " SUPERLINEAR" else ""
      println(f"[scale] $name%-28s sf0.1=$small%7.2fs x$factor%d=$big%7.2fs slope=$slope%5.1f$flag")
      (name, small, big, slope)
    }
    val json = rows.map { case (n, s, b, sl) =>
      s""""$n":{"small":$s,"big":$b,"slope":$sl}"""
    }.mkString("{", ",", "}")
    val line = s"""{"factor":$factor,"flag_above":$flagAbove,"queries":$json}"""
    println(line)
    Files.createDirectories(Paths.get("target"))
    Files.writeString(Paths.get("target/scale_audit.json"), line)
    spark.stop()
  }
}
