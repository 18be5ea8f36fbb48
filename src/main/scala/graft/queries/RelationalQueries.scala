package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Relational breadth pack (round 3): multi-dimensional aggregation
 * (rollup / cube / grouping sets), pivot, set operations, the ranking
 * window family, explicit window frames (rows + range), SQL-surface
 * subqueries (correlated EXISTS + scalar), exact percentiles,
 * conditional / distinct aggregation, ordered array aggregation, and
 * sketch audits (HLL distinct, approx-percentile, mergeable HLL
 * union).
 *
 * Every query pairs with a DuckDB oracle. Parity rules (see
 * `.claude/skills/verify`): deterministic total ORDER BY both sides,
 * decimal-accumulated sums cast to DOUBLE, aligned column names and
 * integer widths, NULLS FIRST made explicit where rollup/cube emit
 * subtotal rows.
 *
 * Scale notes are per-query; the common theme: grouping-set families
 * are single-shuffle (Spark expands grouping sets BEFORE the exchange
 * with partial aggregation per set), window families shuffle once per
 * partitioning, sketches replace exact-distinct shuffles with
 * mergeable fixed-size state.
 */
object RelationalQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.sources.Tables.load(s, dir, name)

  private def dec(c: String) = col(c).cast("decimal(14,2)")

  /** Fixed per-query scratch path under java.io.tmpdir, wiped and
    * recreated on every use: the layout/round-trip audits (q131–q134,
    * q138) write a full table copy per invocation, and Verify + the
    * 2-pass Bench + ScaleAudit at two scales each re-invoke them — a
    * fresh createTempDirectory per call would leak one table copy per
    * run. Reusing one well-known path bounds disk to a single copy
    * per query PER PROCESS: the pid in the path isolates concurrent
    * JVMs (a Bench running beside a Verify must not wipe each other's
    * in-flight data), and the JVM-exit hook removes the process's
    * whole subtree so the bound still holds across runs. */
  private def scratchDir(tag: String): java.nio.file.Path = {
    import java.nio.file.{Files, Paths}
    // "layout_scratch", not "graft_*": PlanSpec's scan-filter hygiene
    // test greps plan text for `graft_` kernel names, and the scan's
    // InMemoryFileIndex path appears in that text.
    val root = Paths.get(
      System.getProperty("java.io.tmpdir"), "layout_scratch",
      s"pid${ProcessHandle.current().pid()}")
    scratchExitHook.synchronized {
      if (!scratchExitHook.contains(root)) {
        scratchExitHook += root
        Runtime.getRuntime.addShutdownHook(new Thread(() => wipe(root)))
        // Shutdown hooks don't run on SIGKILL/OOM-kill: sweep sibling
        // pid dirs whose owner is gone, so crashed runs can't
        // accumulate table copies forever. Best-effort per sibling —
        // a concurrent sweeper racing on the same dead dir, or an
        // undeletable foreign dir, must never fail THIS query.
        val parent = root.getParent
        if (Files.isDirectory(parent)) {
          import scala.jdk.CollectionConverters._
          import scala.util.Try
          Try {
            val siblings = Files.list(parent)
            try siblings.iterator().asScala.foreach { p =>
              val name = p.getFileName.toString
              if (name.startsWith("pid") && p != root) {
                val alive = name.drop(3).toLongOption.exists(pid =>
                  ProcessHandle.of(pid)
                    .map[java.lang.Boolean](h => h.isAlive)
                    .orElse(java.lang.Boolean.FALSE).booleanValue)
                if (!alive) Try(wipe(p))
              }
            } finally siblings.close()
          }
        }
      }
    }
    val base = root.resolve(tag)
    wipe(base)
    Files.createDirectories(base)
    base
  }

  private val scratchExitHook =
    scala.collection.mutable.Set.empty[java.nio.file.Path]

  private def wipe(base: java.nio.file.Path): Unit = {
    import java.nio.file.Files
    if (Files.exists(base)) {
      import scala.jdk.CollectionConverters._
      val st = Files.walk(base)
      try st.iterator().asScala.toSeq
        .sortBy(-_.getNameCount).foreach(Files.delete(_))
      finally st.close()
    }
  }

  /** orders ⋈ customer ⋈ nation ⋈ region with region/nation names. */
  private def ordersGeo(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    val n = t(s, dir, "nation")
    val r = t(s, dir, "region")
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(n, c("c_nationkey") === n("n_nationkey"))
      .join(r, n("n_regionkey") === r("r_regionkey"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ROLLUP (region → nation → grand total) revenue. The FACT is
    // pre-aggregated to one (custkey, revenue, n_orders) row BEFORE
    // the dim joins, so the rollup Expand (which multiplies its input
    // by #grouping-sets) consumes customer-cardinality input, not
    // orders-cardinality — at 100 TB that divides the Expand+exchange
    // volume by the orders-per-customer factor. The custkey pre-agg
    // partial-combines map-side; sums stay DECIMAL-exact until the
    // final cast. grouping_id() disambiguates subtotal NULLs from
    // (hypothetical) NULL keys.
    "q49_rollup_revenue" -> ((s, dir) => {
      val byCust = t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(
          sum(dec("o_totalprice")).as("cust_rev"),
          count(lit(1)).as("cust_orders"))
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      // rollup MUST take bare Column refs here: the String overload
      // resolves via Dataset.col, whose dataset-id metadata the rollup
      // Expand then duplicates — tripping DetectAmbiguousSelfJoin on
      // any multi-join input. The pre-select states the pruned set.
      val g = byCust
        .join(c, byCust("o_custkey") === c("c_custkey"))
        .join(n, c("c_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
        .select(col("r_name"), col("n_name"),
          col("cust_rev"), col("cust_orders"))
        .rollup(col("r_name"), col("n_name"))
        .agg(
          sum(col("cust_rev")).cast("double").as("revenue"),
          sum(col("cust_orders")).as("n_orders"),
          grouping_id().as("gid"))
      // Sort via g's OWN attributes: a bare col("r_name") after
      // rollup+agg is flagged ambiguous (pre- vs post-aggregate
      // lineage under dataset-id tagging).
      g.orderBy(
        g("gid"), g("r_name").asc_nulls_first, g("n_name").asc_nulls_first)
    }),

    // CUBE over (returnflag, linestatus): all four grouping sets in a
    // single-shuffle plan (same Expand mechanics as rollup).
    "q50_cube_returns" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(
          sum(dec("l_quantity")).cast("double").as("sum_qty"),
          count(lit(1)).as("n"),
          grouping_id().as("gid"))
        .orderBy(
          col("gid"),
          col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    }),

    // Explicit GROUPING SETS: the two single-dimension marginals plus
    // the grand total, skipping the full cross product a cube would
    // also compute.
    "q51_grouping_sets" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupingSets(
          Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
          col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(dec("l_extendedprice")).cast("double").as("sum_price"),
          count(lit(1)).as("n"),
          grouping_id().as("gid"))
        .orderBy(
          col("gid"),
          col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    }),

    // Pivot order-priority counts per nation. Explicit pivot values
    // keep the plan a single pass (no values-discovery job) and make
    // the output schema static — required for both the oracle pairing
    // and any production sink. Absent cells are 0, not NULL.
    "q52_pivot_priority" -> ((s, dir) => {
      val pivotVals =
        Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
      ordersGeo(s, dir)
        .groupBy("n_name")
        .pivot("o_orderpriority", pivotVals)
        .agg(count(lit(1)))
        .na.fill(0, pivotVals)
        .orderBy("n_name")
    }),

    // INTERSECT / EXCEPT (distinct set semantics both engines):
    // urgent-order customers split by whether they also have a
    // finished ('F') order.
    "q53_set_ops" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val urgent = o.where(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey"))
      val finished = o.where(col("o_orderstatus") === "F")
        .select(col("o_custkey"))
      urgent.intersect(finished).withColumn("tag", lit("both"))
        .unionByName(
          urgent.except(finished).withColumn("tag", lit("urgent_only")))
        .orderBy("tag", "o_custkey")
    }),

    // Ranking family. Two windows over ONE partitioning (quantity
    // ties are real): row_number/ntile need the fully tiebroken order
    // (they are positional — nondeterministic under ties), while
    // rank/dense_rank/percent_rank/cume_dist hang off the value-only
    // order (deterministic under ties BY DEFINITION — and tie-broken
    // windows would degenerate them into row_number). Both windows
    // share the single hash-exchange on l_returnflag.
    "q54_rank_family" -> ((s, dir) => {
      val wDet = Window.partitionBy("l_returnflag")
        .orderBy(
          col("l_quantity").desc, col("l_orderkey"), col("l_linenumber"))
      val wVal = Window.partitionBy("l_returnflag")
        .orderBy(col("l_quantity").desc)
      t(s, dir, "lineitem")
        .select(
          col("l_returnflag"), col("l_orderkey"),
          col("l_linenumber"), col("l_quantity"),
          row_number().over(wDet).as("rn"),
          ntile(3).over(wDet).as("bucket"),
          rank().over(wVal).as("rnk"),
          dense_rank().over(wVal).as("drnk"),
          round(percent_rank().over(wVal), 6).as("pr"),
          round(cume_dist().over(wVal), 6).as("cd"))
        .where(col("rn") <= 8)
        .orderBy("l_returnflag", "rn")
    }),

    // Explicit frames: running total (rows unbounded-preceding),
    // moving window (rows 2-preceding), and a value-range frame (30
    // days of epoch seconds — range frames bound by VALUE, so they
    // stay deterministic under order ties where row frames would
    // not). The moving average divides an exact decimal sum by the
    // frame count in DOUBLE, so both engines run the identical IEEE
    // division.
    "q55_window_frames" -> ((s, dir) => {
      val epoch = unix_timestamp(col("o_orderdate"))
      val wRun = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wMov = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(-2, Window.currentRow)
      val wRange = Window.partitionBy("o_custkey")
        .orderBy(epoch)
        .rangeBetween(-2592000L, Window.currentRow)
      t(s, dir, "orders")
        .where(col("o_custkey") <= 200)
        .select(
          col("o_custkey"), col("o_orderkey"),
          sum(dec("o_totalprice")).over(wRun).cast("double").as("run_total"),
          round(
            sum(dec("o_totalprice")).over(wMov).cast("double") /
              count(lit(1)).over(wMov),
            6).as("mov_avg"),
          count(lit(1)).over(wRange).as("n_30d"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // SQL surface: correlated EXISTS (→ planned as a left-semi join)
    // + correlated scalar subquery (→ aggregated + re-joined by
    // Catalyst's decorrelation — NOT a per-row loop). The scalar
    // threshold divides an exact decimal sum by a count in DOUBLE for
    // cross-engine determinism.
    "q56_sql_subqueries" -> ((s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("customer")
      t(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql("""
        SELECT c_custkey, c_name, c_acctbal
        FROM customer c
        WHERE EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderpriority = '1-URGENT')
          AND c_acctbal > (
            SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(14,2))) AS DOUBLE)
                     / COUNT(*)
            FROM customer c2
            WHERE c2.c_nationkey = c.c_nationkey)
        ORDER BY c_custkey""")
    }),

    // Exact interpolated percentiles per group (percentile() =
    // continuous (n-1)·p interpolation, the same contract as DuckDB's
    // quantile_cont). Exact percentile needs the full sorted group —
    // the 100 TB path is q62's approx_percentile sketch; this query
    // is the ground-truth surface.
    "q57_percentile_groups" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          round(expr("percentile(l_quantity, 0.5)"), 6).as("qty_p50"),
          round(expr("percentile(l_extendedprice, 0.9)"), 6)
            .as("price_p90"),
          round(expr("median(l_discount)"), 6).as("disc_med"))
        .orderBy("l_returnflag")
    }),

    // Conditional aggregation: count_if / filtered decimal sums — the
    // one-pass replacement for N filtered scans.
    "q58_conditional_agg" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy("event_type")
        .agg(
          expr("count_if(value > 50)").as("n_high"),
          sum(when(col("value") > 50, col("value").cast("decimal(14,2)"))
            .otherwise(lit(0).cast("decimal(14,2)")))
            .cast("double").as("sum_high"),
          count(lit(1)).as("n"))
        .orderBy("event_type")
    }),

    // Distinct aggregation: two COUNT(DISTINCT) + a SUM(DISTINCT) in
    // one GROUP BY — Spark plans multi-distinct via a single Expand +
    // two-level aggregate (one extra shuffle, not one per distinct).
    "q59_distinct_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          sum_distinct(col("l_quantity").cast("decimal(14,2)"))
            .cast("double").as("sum_dist_qty"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    }),

    // Ordered array aggregation: collect_set is order-nondeterministic
    // across partitions, so the contract REQUIRES the array_sort
    // before any comparison/serialization (same rule as DuckDB's
    // list(DISTINCT ...) needing list_sort). Joined to a string so the
    // oracle compare is value-typed.
    "q60_array_agg" -> ((s, dir) => {
      t(s, dir, "events")
        .where(col("user_id") <= 300)
        .groupBy("user_id")
        .agg(
          array_join(array_sort(collect_set(col("event_type"))), ",")
            .as("types"),
          countDistinct(col("event_type")).as("n_types"),
          count(lit(1)).as("n_events"))
        .orderBy("user_id")
    }),

    // HLL sketch audit: approx_count_distinct (HLL++, deterministic
    // for fixed data) vs exact per group; the oracle pins the exact
    // count and asserts the ±5% envelope HOLDS (ok must be true). At
    // 100 TB the sketch path replaces the exact-distinct shuffle of
    // every (group, key) pair with fixed-size mergeable state.
    "q61_hll_audit" -> ((s, dir) => {
      // Dedup FIRST, then count + sketch the already-distinct rows:
      // HLL is duplicate-insensitive, so the estimate is identical,
      // but mixing countDistinct and approx_count_distinct in one
      // aggregate makes the distinct-rewrite carry a 13 KB rsd-1%
      // sketch per (group, key) pair through a 4-level plan (5.2s at
      // sf0.1; this shape is 4x faster and sketches only per group).
      // rsd 1%: the default 5% leaves no headroom against a 5% audit
      // envelope (one group missed it at sf0.01).
      t(s, dir, "orders")
        .select(col("o_orderpriority"), col("o_custkey"))
        // countDistinct (the semantics being replaced) excludes NULL
        // keys; the dedup-first rewrite must too, or a NULL custkey
        // would count as one extra "distinct" customer per group.
        .where(col("o_custkey").isNotNull)
        .distinct()
        .groupBy("o_orderpriority")
        .agg(
          count(lit(1)).as("exact_n"),
          approx_count_distinct(col("o_custkey"), 0.01).as("__approx"))
        .select(
          col("o_orderpriority"),
          col("exact_n"),
          (abs(col("__approx") - col("exact_n")) <=
            col("exact_n") * 0.05).as("ok"))
        .orderBy("o_orderpriority")
    }),

    // Approx-percentile sketch audit (same pattern as q61): the
    // KLL-style sketch estimate must land within 1% of q57's exact
    // percentile; the oracle pins exact + the envelope.
    "q62_quantile_audit" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          round(expr("percentile(l_extendedprice, 0.5)"), 6)
            .as("exact_p50"),
          expr("approx_percentile(l_extendedprice, 0.5, 10000)")
            .as("__approx"))
        .select(
          col("l_returnflag"), col("exact_p50"),
          (abs(col("__approx") - col("exact_p50")) <=
            abs(col("exact_p50")) * 0.01).as("ok"))
        .orderBy("l_returnflag")
    }),

    // Bloom-prefiltered benchmark decontamination: the benchmark
    // 4-gram set compresses into ONE mergeable Bloom filter that
    // broadcasts at O(bits) and prefilters the corpus shingle stream
    // in-scan; the exact semi-join then sees only bloom-passing
    // shingles (no false negatives ⇒ exact result; false positives
    // die in the verify join). The broadcast-the-raw-shingles
    // formulation is q39 — this is its big-benchmark-side scale path.
    "q64_bloom_decontaminate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      graft.operators.TextAnalysis.bloomContaminatedIds(
          docs.where(col("doc_id") % 50 =!= 0),
          docs.where(col("doc_id") % 50 === 0),
          "doc_id", "text", n = 4)
        .orderBy("doc_id")
    }),

    // Tokenizer vocabulary build + corpus encoding — the
    // tokenize-to-ids step of a training pipeline: top-V tokens by
    // (frequency, token) become ids 0..V-1; every document re-emits
    // as its id sequence (-1 = OOV) plus an OOV count.
    // Scale: the frequency count partial-aggregates map-side;
    // TakeOrderedAndProject bounds the top-V selection (no global
    // sort); the id-assignment window runs over V rows only; the
    // vocab then BROADCASTS to the encode join (V is small by
    // construction), so encoding is scan-stage work plus one shuffle
    // by doc_id to reassemble sequences.
    "q65_vocab_encode" -> ((s, dir) => {
      val V = 500
      val toks = t(s, dir, "documents")
        .select(col("doc_id"), posexplode(split(col("text"), " ")))
        .select(col("doc_id"), col("pos"), col("col").as("token"))
      val vocab = toks.groupBy("token").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("token").asc)
        .limit(V)
        .select(
          col("token"),
          (row_number().over(
            Window.orderBy(col("cnt").desc, col("token").asc)) - 1)
            .as("token_id"))
      val encoded = toks
        .join(broadcast(vocab), Seq("token"), "left")
        .select(
          col("doc_id"), col("pos"),
          coalesce(col("token_id"), lit(-1)).as("tid"))
      encoded.groupBy("doc_id")
        .agg(
          concat_ws(",",
            transform(
              array_sort(collect_list(struct(col("pos"), col("tid")))),
              e => e.getField("tid").cast("string"))).as("ids"),
          sum(when(col("tid") === -1, 1).otherwise(0)).as("n_oov"),
          count(lit(1)).as("n_tokens"))
        .orderBy("doc_id")
    }),

    // UNPIVOT (melt) — the inverse of q52's pivot: per-returnflag
    // aggregate metrics unpivot into (metric, value) rows. Narrow
    // Expand over the aggregated frame; no extra shuffle.
    "q69_unpivot" -> ((s, dir) => {
      val agg = t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          sum(dec("l_quantity")).cast("double").as("qty"),
          sum(dec("l_extendedprice")).cast("double").as("price"),
          sum(dec("l_discount")).cast("double").as("disc"))
      agg.unpivot(
          Array(col("l_returnflag")),
          Array(col("qty"), col("price"), col("disc")),
          "metric", "value")
        .orderBy("l_returnflag", "metric")
    }),

    // Time-bucketed aggregation: date_trunc day/hour rollups of the
    // event stream — the partition-friendly time dimension every
    // telemetry pipeline groups by. Bucketing is a scan-stage
    // projection; one aggregation shuffle.
    "q70_time_buckets" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(
          date_trunc("day", col("ts")).as("day"),
          hour(col("ts")).as("hr"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("value").cast("decimal(14,2)")).cast("double").as("sum_v"))
        .orderBy("day", "hr")
    }),

    // Gaps-and-islands sessionization: per-user sessions split on
    // >30-min inactivity gaps, one row per session with exact-µs
    // bounds. One hash exchange on user_id serves the lag window, the
    // running-sum window, AND the final aggregate (hash(user) already
    // co-locates each (user, session) group).
    "q72_sessionize" -> ((s, dir) => {
      graft.operators.Sessionize.sessionStats(
          t(s, dir, "events"), "user_id", "ts", "event_id",
          gapSeconds = 1800L)
        .orderBy("user_id", "session_seq")
    }),

    // Point-in-time dimension join (SCD2 as-of probe): every event
    // matched to the q110 dimension version valid at its timestamp —
    // keyed rangeJoin on (user, time bin), open versions capped at
    // the horizon, never a nested-loop BETWEEN. The lakehouse
    // "was-this-fact-consistent-with-its-dim-at-the-time" join.
    "q125_temporal_dim_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val dim = graft.operators.Merge.scd2History(
          ev.select("user_id", "ts", "event_id", "event_type"),
          "user_id", "ts", "event_id", "event_type")
        .select(col("user_id"),
          unix_micros(col("valid_from")).as("vs"),
          coalesce(unix_micros(col("valid_to")),
            // half-open horizon cap: strictly above every event ts
            unix_micros(lit("2024-02-01 00:00:00").cast("timestamp")))
            .as("ve"),
          col("version_seq"),
          col("event_type").as("dim_type"))
      val probes = ev.select(col("user_id"),
        unix_micros(col("ts")).as("t"), col("event_type"))
      graft.operators.TemporalJoins.rangeJoin(
          probes, dim, "user_id", "t", "vs", "ve",
          binWidth = 86400000000L)
        .groupBy(col("version_seq"))
        .agg(count(lit(1)).as("n_events"),
          // every event must land in the version IT opened or rode —
          // type agreement is the semantic as-of correctness check
          sum(when(col("event_type") === col("dim_type"), 1L)
            .otherwise(0L)).as("n_matching"))
        .orderBy("version_seq")
    }),

    // Interval-overlap join: user sessions (q72) against nightly
    // 02:00-04:00 maintenance windows — both sides bin-exploded,
    // equi-join on the bin, each pair emitted once at its
    // overlap-start bin; never a nested-loop overlap predicate.
    "q124_interval_overlap" -> ((s, dir) => {
      val sess = graft.operators.Sessionize.sessionStats(
          t(s, dir, "events"), "user_id", "ts", "event_id",
          gapSeconds = 1800L)
        .select(col("user_id"),
          unix_micros(col("session_start")).as("ls"),
          (unix_micros(col("session_end")) + 1).as("le"))
      val base = java.time.LocalDateTime
        .parse("2024-01-01T02:00:00")
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
      val windows = s.range(30).select(
        col("id").cast("long").as("day"),
        (lit(base) + col("id") * 86400000000L).as("rs"),
        (lit(base) + col("id") * 86400000000L + 7200000000L).as("re"))
      graft.operators.TemporalJoins.intervalOverlapJoin(
          sess, windows, "ls", "le", "rs", "re",
          binWidth = 3600000000L)
        .groupBy("day")
        .agg(count(lit(1)).as("n_sessions"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy("day")
    }),

    // Peak session concurrency per hour (sweep line over q72's
    // sessions): +1/-1 deltas on an interleaved closed-interval key,
    // same-instant nets pre-aggregated, running sum via the bucketed
    // two-level prefix decomposition — capacity planning's "how many
    // concurrent sessions at peak".
    "q116_peak_concurrency" -> ((s, dir) => {
      val sess = graft.operators.Sessionize.sessionStats(
        t(s, dir, "events"), "user_id", "ts", "event_id",
        gapSeconds = 1800L)
      graft.operators.TimeSeries.peakConcurrency(
          sess, "session_start", "session_end")
        .orderBy("bucket_start")
    }),

    // Telemetry debounce: bursts of repeated (user, type) events
    // within 5 minutes collapse to one kept row (+ suppressed count);
    // one composite-key exchange serves both windows and the
    // aggregate — the sessionize shape with a struct-min first-pick.
    "q97_debounce" -> ((s, dir) => {
      graft.operators.Sessionize.debounce(
          t(s, dir, "events"), Seq("user_id", "event_type"),
          "ts", "event_id", windowSeconds = 300L)
        .orderBy("user_id", "event_type", "burst_seq")
    }),

    // FULL OUTER equi-join — snapshot reconciliation (the one outer
    // variant the join family lacked): rows from either side survive,
    // provenance tagged. Shuffle-hash/SMJ both sides; no broadcast
    // (full outer cannot build-broadcast in Spark).
    "q67_full_outer" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val a = o.where(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"), col("o_totalprice").as("price_a"))
      val b = o.where(col("o_orderkey") % 3 === 0)
        .select(col("o_orderkey"), col("o_totalprice").as("price_b"))
      a.join(b, Seq("o_orderkey"), "full_outer")
        .select(
          col("o_orderkey"),
          when(col("price_a").isNotNull && col("price_b").isNotNull, "both")
            .when(col("price_a").isNotNull, "a_only")
            .otherwise("b_only").as("side"),
          coalesce(col("price_a"), col("price_b")).as("price"))
        .orderBy("o_orderkey")
    }),

    // Null-preserving flatten: explode_outer keeps rows whose array is
    // empty (NULL token) — the data-completeness counterpart of the
    // reference's row-dropping inner explode (SURVEY P1 semantics
    // note). Long tokens (>8 chars) make some documents legitimately
    // empty.
    "q68_flatten_outer" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(
          col("doc_id"),
          explode_outer(
            filter(split(col("text"), " "), tok => length(tok) > 8))
            .as("token"))
        .orderBy(col("doc_id"), col("token").asc_nulls_first)
    }),

    // Schema-typed JSON parse (JsonToStructs — the typed counterpart
    // of q47's string-path get_json_object): props parse once into a
    // struct in the scan stage; downstream references are ordinary
    // column accesses, not repeated JSON walks.
    "q66_json_typed_agg" -> ((s, dir) => {
      t(s, dir, "events")
        .select(
          col("event_type"),
          from_json(
            col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k INT")).as("p"))
        .groupBy("event_type")
        .agg(
          sum(col("p.k").cast("long")).as("sum_k"),
          count(col("p.k")).as("n_k"),
          max(col("p.k")).as("max_k"))
        .orderBy("event_type")
    }),

    // Mergeable-sketch distinct: per-nation HLL sketches unioned into
    // a global estimate (hll_sketch_agg → hll_union_agg →
    // hll_sketch_estimate) — the partial-aggregate shape that lets
    // 1000 executors each ship ~1.5 KB instead of re-shuffling raw
    // keys for a global COUNT(DISTINCT). Audited against the exact
    // global count.
    "q63_sketch_merge" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val perNation = c.groupBy("c_nationkey")
        .agg(expr("hll_sketch_agg(c_custkey)").as("__sk"))
      val merged = perNation
        .agg(expr("hll_sketch_estimate(hll_union_agg(__sk))").as("__est"))
      val exact = c.agg(countDistinct(col("c_custkey")).as("exact_n"))
      exact.crossJoin(merged)
        .select(
          col("exact_n"),
          (abs(col("__est") - col("exact_n")) <=
            col("exact_n") * 0.05).as("ok"))
    }),

    // Strict-order conversion funnel (view → click → purchase within
    // 7 days): |steps| user-key joins of shrinking frames, each step
    // pre-filtered to its event type before joining.
    "q76_funnel" -> ((s, dir) => {
      graft.operators.Funnel.funnel(
        t(s, dir, "events"), "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), windowSeconds = 7L * 24 * 3600)
    }),

    // E13: first/last-touch conversion attribution — one per-user
    // RANGE-frame window pass over microsecond epochs, 24 h closed
    // lookback, struct (ts, id) tie rule.
    "q181_attribution" -> ((s, dir) => {
      graft.operators.Funnel.touchAttribution(
          t(s, dir, "events"), "user_id", "ts", "event_type",
          "value", "event_id",
          conversionType = "purchase", touchTypes = Seq("view", "click"),
          lookbackSeconds = 24L * 3600)
        // unattributed conversions print as -1 (keeps the gate
        // columns non-nullable int64 on both engines)
        .withColumn("first_touch_id", coalesce(col("first_touch_id"), lit(-1L)))
        .withColumn("last_touch_id", coalesce(col("last_touch_id"), lit(-1L)))
        .orderBy("conv_id")
    }),

    // E14: linear multi-touch attribution — binned range join
    // (never nested-loop) + per-conversion credit split.
    "q182_attribution_linear" -> ((s, dir) => {
      graft.operators.Funnel.linearAttribution(
          t(s, dir, "events"), "user_id", "ts", "event_type",
          "value", "event_id",
          conversionType = "purchase", touchTypes = Seq("view", "click"),
          lookbackSeconds = 24L * 3600)
        .orderBy("conv_id", "touch_id")
    }),

    // Weekly cohort retention: signup-week cohorts × activity-week
    // offsets, distinct users per cell. Both exchanges key on user.
    "q77_retention" -> ((s, dir) => {
      graft.operators.Funnel.retention(
          t(s, dir, "events"), "user_id", "ts", "event_type",
          cohortType = "signup", maxWeeks = 5)
        .orderBy("cohort_week", "week_offset")
    }),

    // Calendar gap-fill + forward-fill of each user's daily purchase
    // total: per-key sequence() densify (span from the key's own
    // min/max day), left join, last(ignoreNulls) running fill.
    "q78_gap_fill" -> ((s, dir) => {
      val series = t(s, dir, "events")
        .where(col("event_type") === "purchase")
        .groupBy(
          col("user_id"), col("ts").cast("date").as("day"))
        .agg(sum(col("value").cast("decimal(14,2)")).cast("double").as("v"))
      graft.operators.TimeSeries.gapFillDaily(series, "user_id", "day", "v")
        .orderBy("user_id", "day")
    }),

    // Blocked fuzzy matching over DISTINCT part names: collapse the
    // 100 TB side to distinct entities first (candidate volume ∝
    // vocabulary, not rows), block on the last name token, pair at
    // levenshtein ≤ 2 via the early-exit 3-arg form.
    "q79_fuzzy_blocked" -> ((s, dir) => {
      val names = t(s, dir, "part")
        .groupBy(col("p_name"))
        .agg(min(col("p_partkey")).as("rep_id"), count(lit(1)).as("n_rows"))
      graft.operators.Fuzzy.blockedPairs(
          names.select(col("rep_id").as("id"), col("p_name").as("nm")),
          "id", "nm",
          blockKey = element_at(split(col("nm"), " "), -1), maxDist = 2)
        .orderBy("name_a", "name_b")
    }),

    // CDC changelog apply (MERGE semantics): synthetic upserts (price
    // doubled on keys ≡3 mod 100), inserts (shifted keys ≡7), deletes
    // (keys ≡11) applied to the orders snapshot — one anti-join
    // shuffle on the merge key plus the upsert union.
    "q80_merge_changelog" -> ((s, dir) => {
      val base = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val key = col("o_orderkey")
      val changes = base.where(key % 100 === 3)
        .withColumn("o_totalprice", col("o_totalprice") * 2)
        .withColumn("op", lit("U"))
        .unionByName(base.where(key % 100 === 7)
          .withColumn("o_orderkey", key + 10000000L)
          .withColumn("op", lit("U")))
        .unionByName(base.where(key % 100 === 11)
          .withColumn("op", lit("D")))
      graft.operators.Merge.applyChangelog(
          base, changes, Seq("o_orderkey"), "op")
        .orderBy("o_orderkey")
    }),

    // SCD2 history build (q80's historical counterpart): the per-user
    // event-type changelog collapses to type-2 validity intervals —
    // no-op repeats merge into the open episode, value changes open a
    // new version; half-open [from, to) intervals, NULL to = current.
    // One user-key exchange serves all three windows.
    "q110_scd2_history" -> ((s, dir) => {
      graft.operators.Merge.scd2History(
          t(s, dir, "events")
            .select("user_id", "ts", "event_id", "event_type"),
          "user_id", "ts", "event_id", "event_type")
        .orderBy("user_id", "version_seq")
    }),

    // R25 (round 9): top journey paths — each user's first 8 events
    // in (ts, event_id) order rendered as an a>b>c path string,
    // counted, top-20. Bounded per-user fold on one user exchange;
    // TakeOrdered cut, never a global sort.
    "q210_top_paths" -> ((s, dir) => {
      graft.operators.Funnel.topPaths(
        t(s, dir, "events"), "user_id", "ts", "event_id",
        "event_type", maxSteps = 8, k = 20)
    }),

    // R24 (round 9): survivorship golden record — per-user latest
    // non-null per FIELD under the (ts, event_id) total order. Nulls
    // injected per a realistic rule (errors carry no measurement,
    // signups no props) so a later partial version must NOT erase an
    // earlier field. One key exchange serves all windows.
    "q206_golden_record" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .withColumn("value",
          when(col("event_type") =!= "error", col("value")))
        .withColumn("props",
          when(col("event_type") =!= "signup", col("props")))
      graft.operators.Merge.goldenRecord(
          e, "user_id", Seq("ts", "event_id"),
          Seq("value", "props", "event_type"))
        .orderBy("user_id")
    }),

    // Keyed snapshot diff (reconciliation audit): per-user activity
    // state (event count + last value) for two adjacent weeks,
    // full-outer joined and classified added/removed/changed/stable —
    // "what did this week's run touch". One key-partitioned join;
    // each snapshot is one window + one agg on the same user exchange.
    "q113_snapshot_diff" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      def snap(lo: String, hi: String): DataFrame = {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").desc, col("event_id").desc)
        t(s, dir, "events")
          .where(col("ts") >= lit(lo).cast("timestamp") &&
            col("ts") < lit(hi).cast("timestamp"))
          .withColumn("__rn", row_number().over(w))
          .groupBy(col("user_id"))
          .agg(
            count(lit(1)).as("n_events"),
            max(when(col("__rn") === 1, col("value"))).as("last_value"))
      }
      graft.operators.Merge.snapshotDiff(
          snap("2024-01-08 00:00:00", "2024-01-15 00:00:00"),
          snap("2024-01-15 00:00:00", "2024-01-22 00:00:00"),
          "user_id", Seq("n_events", "last_value"))
        .orderBy("user_id")
    }),

    // Blocked Jaro-Winkler similarity histogram over part names:
    // candidates confined to first-word blocks, the codegen'd JW
    // kernel scores each pair (verified bit-identical to DuckDB's
    // jaro_winkler_similarity), and the 0.05-band histogram above 0.8
    // bounds the output whatever the distribution.
    // The kernel is referenced ONLY in the grouping expression: a
    // post-join `where(jw >= t)` gets pushed into the sort-merge
    // join's extra condition, which evaluates interpreted (measured
    // 11.8s vs 2.6s at sf0.1); the aggregate keeps it in codegen and
    // evaluates it once per pair. Sub-threshold bands aggregate too
    // (a handful of rows) and drop after the agg.
    // Blocks are capped at 500 rows (lowest p_partkey first — the
    // capPerBlock dial, mirrored in the oracle): the first word of
    // p_name is a FIXED 8-value vocabulary (SCALE.md "Fuzzy
    // blocking"), so uncapped pair volume grows quadratically with the
    // corpus — ScaleAudit measured slope 29.8 at 10×. The cap is
    // inactive at both gate scales (max slice block is ~260 rows at
    // sf0.1, ~30 at sf0.01 — results byte-identical to the uncapped
    // form there) and bounds the pair term to blocks·cap² beyond.
    "q130_jw_histogram" -> ((s, dir) => {
      val capW = Window
        .partitionBy(col("__blk")).orderBy(col("p_partkey"))
      val p = t(s, dir, "part")
        .where(col("p_size") <= 5)
        .select(
          col("p_partkey"), col("p_name"),
          split(col("p_name"), " ").getItem(0).as("__blk"))
        .withColumn("__bn", row_number().over(capW))
        .where(col("__bn") <= 500)
        .drop("__bn")
      val a = p.select(col("p_partkey").as("id_a"),
        col("p_name").as("name_a"), col("__blk"))
      val b = p.select(col("p_partkey").as("id_b"),
        col("p_name").as("name_b"), col("__blk"))
      a.join(b, "__blk")
        .where(col("id_a") < col("id_b"))
        .groupBy((floor(graft.functions.JaroWinklerSim(
            col("name_a"), col("name_b")) * 20) / 20.0).as("band"))
        .agg(count(lit(1)).as("n_pairs"))
        .where(col("band") >= 0.8)
        .orderBy("band")
    }),

    // Per-key mode (most frequent value, ties to the lexicographically
    // greatest — deterministic by construction): two partial-combined
    // aggregates, no window; max(struct(n, value)) picks the winner
    // in one pass over the (key, value) counts.
    "q129_mode_per_key" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .groupBy(col("user_id"))
        .agg(
          max(struct(col("n"), col("event_type"))).as("__m"),
          sum(col("n")).as("n_events"))
        .select(
          col("user_id"),
          col("__m.event_type").as("mode"),
          col("__m.n").as("mode_n"),
          col("n_events"),
          round(col("__m.n").cast("double") / col("n_events"), 6)
            .as("mode_share"))
        .orderBy("user_id")
    }),

    // Range-sorted layout write + read-back audit — the
    // oracle-expressible slice of Layout.rangeSortedWrite (VERDICT r5
    // #8: shrink the spec-only residue). Writes lineitem
    // range-partitioned + sorted on l_orderkey to a fresh temp dir,
    // reads the files back, and emits exactly the invariants an oracle
    // CAN predict from the source table alone: row conservation, key
    // span, and ZERO overlapping per-file key ranges
    // (repartitionByRange assigns equal keys to one partition, so
    // every file owns a disjoint range — the property min/max file
    // skipping depends on). A writer that lost rows, mangled keys, or
    // interleaved ranges fails the hash compare. File COUNT is a plan
    // artifact (empty partitions legally merge) and is deliberately
    // not part of the contract.
    "q131_range_layout" -> ((s, dir) => {
      val dest = scratchDir("layout_q131").toString
      val li = t(s, dir, "lineitem")
      graft.operators.Layout.rangeSortedWrite(
        li, dest, Seq("l_orderkey"), numFiles = 8)
      val back = s.read.parquet(dest)
      val ranges = graft.operators.Layout.fileRanges(back, "l_orderkey")
      val overlaps = ranges.as("x").join(ranges.as("y"),
          col("x.file") < col("y.file") &&
            col("x.lo") <= col("y.hi") && col("y.lo") <= col("x.hi"))
        .agg(count(lit(1)).as("overlap_pairs"))
      back.agg(
          count(lit(1)).as("total_rows"),
          min(col("l_orderkey")).as("min_key"),
          max(col("l_orderkey")).as("max_key"))
        .crossJoin(overlaps)
    }),

    // K18 (round 12): pruning-effectiveness audit over the q131
    // range-sorted layout — per workload predicate the exact match
    // count plus the two measured-vs-promised invariants (some
    // pruning happened for narrow/empty predicates, and only the
    // boundary files over-read on a disjoint layout). The scan-count
    // columns are plan artifacts and stay out of the gate (q131
    // contract); the full-table predicate pins pruned_any = FALSE.
    "q307_pruning_audit" -> ((s, dir) => {
      val dest = scratchDir("layout_q307").toString
      val li = t(s, dir, "lineitem")
      graft.operators.Layout.rangeSortedWrite(
        li, dest, Seq("l_orderkey"), numFiles = 8)
      val back = s.read.parquet(dest)
      graft.operators.Layout.pruningAudit(back, "l_orderkey",
          Seq((1L, 100L), (500L, 1500L), (1L, 2000000000L),
            (3000000000L, 3000000100L)))
        .select("pred_lo", "pred_hi", "rows_total", "rows_matching",
          "pruned_any", "boundary_bound_ok")
    }),

    // Z-order layout write + read-back audit — Layout.zorderWrite's
    // oracle slice, same contract shape as q131: row/checksum
    // conservation plus zero overlapping per-file Z-VALUE ranges
    // (the clustering lives in the file layout, not the schema, so
    // the audit recomputes the Morton code on read-back with the same
    // bit width and checks the files tile the curve disjointly).
    // bits=31 keeps the domain check valid under ScaleAudit's
    // key-shifted replicas (keys up to ~1e8 < 2^31).
    "q132_zorder_layout" -> ((s, dir) => {
      val dest = scratchDir("layout_q132").toString
      val p = t(s, dir, "part")
      graft.operators.Layout.zorderWrite(
        p, dest, "p_partkey", "p_size", numFiles = 8, bits = 31)
      val back = s.read.parquet(dest)
      val z = back.withColumn("__z", graft.operators.Layout.zorder2(
        col("p_partkey"), col("p_size"), bits = 31))
      val ranges = z.groupBy(input_file_name().as("file"))
        .agg(min(col("__z")).as("lo"), max(col("__z")).as("hi"))
      val overlaps = ranges.as("x").join(ranges.as("y"),
          col("x.file") < col("y.file") &&
            col("x.lo") <= col("y.hi") && col("y.lo") <= col("x.hi"))
        .agg(count(lit(1)).as("overlap_pairs"))
      back.agg(
          count(lit(1)).as("total_rows"),
          sum(col("p_partkey")).as("sum_partkey"),
          sum(col("p_size").cast("long")).as("sum_size"))
        .crossJoin(overlaps)
    }),

    // Small-file compaction read-back audit — Compaction.compactParquet's
    // oracle slice (same contract shape as q131): fragment lineitem
    // into 64 deliberately-small files, compact to ~32 MiB targets,
    // and emit what the oracle can predict from the source table —
    // row conservation, a key checksum, and the literal promise that
    // compaction reduced the file count. Rows lost or duplicated by
    // the rewrite, or a compactor that fragmented further, hash-fail.
    "q133_compaction" -> ((s, dir) => {
      val base = scratchDir("layout_q133")
      val src = base.resolve("src").toString
      val dest = base.resolve("dest").toString
      t(s, dir, "lineitem").repartition(64).write
        .mode("overwrite").parquet(src)
      val stats = graft.operators.Compaction.compactParquet(
        s, src, dest, targetFileBytes = 32L * 1024 * 1024)
      s.read.parquet(dest).agg(
          count(lit(1)).as("total_rows"),
          sum(col("l_orderkey")).as("sum_orderkey"))
        .withColumn("files_reduced",
          lit(stats.filesAfter < stats.filesBefore))
    }),

    // S6 binaryFile ingest read-back audit (round 9 — fills the q157
    // numbering gap and upgrades S6 from spec-only to driver-
    // verified): documents land ONE FILE PER DOC via a partitioned
    // text write, then read back through the binaryFile source with a
    // glob filter — partition discovery recovers doc_id, and each
    // file's byte length and content md5 must reproduce values the
    // oracle derives from the source table alone (text bytes + the
    // text writer's trailing newline). Any content mangling, file
    // merge/split, or glob miss hash-fails. Scale note: per-doc files
    // exercise the INGEST path (reading existing binary assets); the
    // write here is only the fixture generator, and it keeps a
    // deterministic 1-in-20 slice — one-file-per-row dynamic
    // partitioning costs a directory+commit per file (70 s for 5000
    // files on local FS), and 250 files prove the round-trip just as
    // hard as 5000.
    "q157_binary_ingest" -> ((s, dir) => {
      val dest = scratchDir("layout_q157").toString
      val sel = t(s, dir, "documents")
        .where(col("doc_id") % 20 === 0)
        .select(col("text"), col("doc_id"))
      // r16 optimization (guide §6): a one-file-per-value dynamic
      // partition write pays per-(task × dir) writer/commit overhead,
      // so spreading 250 dirs across 32 round-robin tasks cost 3.5 s
      // where ~64-dirs-per-writer costs 1.4 s; key-hash repartition
      // keeps exactly one file per dir (identical read-back bytes)
      // and the writer count scales with the dir count instead of
      // the core count.
      val nDirs = sel.count()
      sel.repartition(math.max(1L, nDirs / 64L).toInt, col("doc_id"))
        .write.mode("overwrite").partitionBy("doc_id").text(dest)
      graft.sources.FormatSources.readBinaryFiles(s, dest, glob = "*.txt")
        .select(
          col("doc_id").cast("long").as("doc_id"),
          col("length").as("n_bytes"),
          md5(col("content")).as("digest"))
        .orderBy("doc_id")
    }),

    // S9 schema-evolution audit (round 9): two parquet generations —
    // gen 1 writes (doc_id, lang), gen 2 adds (source, n_chars) —
    // read back through ONE mergeSchema scan with partition
    // discovery recovering `gen`; the per-(gen, column) non-null
    // census proves added columns read as NULL for older files and
    // fully populated for newer ones, against an oracle derived from
    // the source table alone.
    "q234_schema_evolution" -> ((s, dir) => {
      val dest = scratchDir("layout_q234").toString
      val docs = t(s, dir, "documents")
      docs.where(col("doc_id") % 2 === 0)
        .select(col("doc_id"), col("lang"))
        .write.mode("overwrite").parquet(dest + "/gen=1")
      docs.where(col("doc_id") % 2 === 1)
        .select(col("doc_id"), col("lang"), col("source"),
          col("n_chars"))
        .write.mode("overwrite").parquet(dest + "/gen=2")
      val merged = graft.sources.FormatSources.readParquetMerged(s, dest)
      val cols = Seq("doc_id", "lang", "source", "n_chars")
      val wide = merged.groupBy(col("gen").cast("int").as("gen"))
        .agg(count(lit(1)).as("__rows"),
          cols.map(c => count(col(c)).as(s"__n_$c")): _*)
      val longRows = cols.map { c =>
        struct(lit(c).as("col_name"), col("__rows").as("n_rows"),
          col(s"__n_$c").as("n_nonnull"))
      }
      wide.select(col("gen"), explode(array(longRows: _*)).as("__s"))
        .select(col("gen"), col("__s.*"))
        .orderBy("gen", "col_name")
    }),

    // ORC round-trip audit — FormatSources' non-parquet path gains an
    // oracle gate: orders is written to ORC, read back, and aggregated
    // per status (counts, decimal-accumulated price sums, date
    // min/max); the oracle computes the identical aggregate from the
    // parquet source, so any type mangling across the format boundary
    // (decimals, dates, nulls) breaks the hash compare.
    "q134_orc_roundtrip" -> ((s, dir) => {
      val dest = scratchDir("layout_q134").toString
      graft.sources.FormatSources.writeOrc(t(s, dir, "orders"), dest)
      graft.sources.FormatSources.readOrc(s, dest)
        .groupBy(col("o_orderstatus"))
        .agg(
          count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(12,2)")).cast("double")
            .as("sum_price"),
          min(col("o_orderdate")).as("min_date"),
          max(col("o_orderdate")).as("max_date"))
        .orderBy("o_orderstatus")
    }),

    // Two-phase salted aggregation parity — Skew.saltedAggregate's
    // oracle gate: the hot-key spreading (partial agg on (key, salt),
    // final agg on key) must be ROW-IDENTICAL to a plain GROUP BY, and
    // the oracle IS that plain GROUP BY. Sums accumulate in decimal so
    // the result is independent of the salt-induced combine order
    // (double addition is not associative; decimal is exact) — the
    // same contract the profile/correlation queries use.
    "q135_salted_agg" -> ((s, dir) => {
      graft.operators.Skew.saltedAggregate(
          t(s, dir, "events"),
          keys = Seq("event_type"),
          saltSource = col("event_id"),
          saltParts = 16,
          partials = Seq(
            count(lit(1)).as("pn"),
            sum(col("value").cast("decimal(18,6)")).as("ps"),
            min(col("value")).as("pmin"),
            max(col("value")).as("pmax")),
          finals = Seq(
            sum(col("pn")).as("n_events"),
            sum(col("ps")).cast("double").as("sum_value"),
            min(col("pmin")).as("min_value"),
            max(col("pmax")).as("max_value")))
        .orderBy("event_type")
    }),

    // Bucketed co-located join read-back — K6's oracle gate: customer
    // and orders are WRITTEN as bucketed tables (bucketBy custkey, the
    // zero-exchange join layout ScaleSpec plan-asserts), read back via
    // the catalog, joined on the bucket key, and aggregated per market
    // segment. Any row loss/duplication in the bucketed write path, or
    // type mangling through the catalog round-trip, breaks the hash
    // compare against the parquet-source oracle.
    "q136_bucketed_join" -> ((s, dir) => {
      // A prior run's managed-table LOCATION can outlive the
      // in-memory catalog entry (fresh session, same warehouse dir) —
      // overwrite alone then refuses the name; clear both first.
      Seq("layout_q136_cust", "layout_q136_ord").foreach { name =>
        s.sql(s"DROP TABLE IF EXISTS $name")
        val loc = new org.apache.hadoop.fs.Path(
          s.conf.get("spark.sql.warehouse.dir"), name)
        loc.getFileSystem(s.sparkContext.hadoopConfiguration)
          .delete(loc, true)
      }
      t(s, dir, "customer").write.mode("overwrite")
        .bucketBy(8, "c_custkey").sortBy("c_custkey")
        .saveAsTable("layout_q136_cust")
      t(s, dir, "orders").write.mode("overwrite")
        .bucketBy(8, "o_custkey").sortBy("o_custkey")
        .saveAsTable("layout_q136_ord")
      s.table("layout_q136_cust")
        .join(
          s.table("layout_q136_ord"),
          col("c_custkey") === col("o_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(
          count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
            .as("sum_price"))
        .orderBy("c_mktsegment")
    }),

    // SQL-registration surface — X1's oracle gate: the same blocked
    // Jaro-Winkler histogram as q130, but built ENTIRELY as a SQL
    // string over a temp view with the kernel invoked by its
    // REGISTERED name (GraftFunctions.register → FunctionRegistry →
    // parser resolves `graft_jaro_winkler`), proving the SQL wiring
    // path end-to-end against DuckDB's jaro_winkler_similarity.
    // Same capPerBlock dial as q130 (fixed 8-word block vocabulary ⇒
    // quadratic pair growth uncapped); the p_size = 1 slice keeps it
    // a cheap registration probe, not a second q130.
    "q137_sql_registration" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      t(s, dir, "part").createOrReplaceTempView("layout_q137_part")
      s.sql(
        """WITH p0 AS (
          |  SELECT p_partkey, p_name, split(p_name, ' ')[0] AS blk,
          |    row_number() OVER (PARTITION BY split(p_name, ' ')[0]
          |      ORDER BY p_partkey) AS bn
          |  FROM layout_q137_part WHERE p_size = 1
          |), p AS (
          |  SELECT p_partkey, p_name, blk FROM p0 WHERE bn <= 200
          |), j AS (
          |  SELECT graft_jaro_winkler(a.p_name, b.p_name) AS jw
          |  FROM p a JOIN p b ON b.blk = a.blk
          |    AND a.p_partkey < b.p_partkey
          |)
          |SELECT floor(jw * 20) / CAST(20 AS DOUBLE) AS band,
          |  count(*) AS n_pairs
          |FROM j WHERE jw >= 0.8
          |GROUP BY 1 ORDER BY band""".stripMargin)
    }),

    // Text-source round-trip — S7's oracle gate: documents are flushed
    // to newline-delimited text (one `doc_id|md5(text)|lang` line per
    // doc — hashing makes the payload newline-safe), re-read through
    // FormatSources.readText, parsed, and aggregated per language.
    // Line loss, splitting corruption, or encoding mangling across the
    // text boundary breaks the hash compare; the oracle computes the
    // identical aggregate (DuckDB md5 = Spark md5, lowercase hex)
    // straight from the parquet source.
    "q138_text_roundtrip" -> ((s, dir) => {
      val dest = scratchDir("layout_q138").toString
      t(s, dir, "documents")
        .select(concat_ws("|",
          col("doc_id"), md5(col("text")), col("lang")).as("value"))
        .write.mode("overwrite").text(dest)
      graft.sources.FormatSources.readText(s, dest)
        .select(split(col("value"), "\\|").as("p"))
        .select(
          col("p").getItem(0).cast("long").as("doc_id"),
          col("p").getItem(1).as("text_md5"),
          col("p").getItem(2).as("lang"))
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          countDistinct(col("text_md5")).as("n_unique"),
          sum(col("doc_id")).as("sum_ids"))
        .orderBy("lang")
    }),

    // Per-group argmin/argmax (first/last event per user) via
    // min_by/max_by — single partial-agg shuffle, no window; the String
    // payload forces SortAggregate (hash agg needs fixed-width buffers)
    // but map-side combine still bounds the shuffle to one row per
    // (partition, user). (user_id, ts) is unique → deterministic.
    "q81_argmax" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(
          min_by(col("event_type"), col("ts")).as("first_type"),
          min(col("ts")).as("first_ts"),
          max_by(col("event_type"), col("ts")).as("last_type"),
          max(col("ts")).as("last_ts"),
          count(lit(1)).as("n_events"))
        .orderBy("user_id")
    }),

    // Fixed-width histogram of event value per type (bucket = floor
    // (v/25)): single partial-agg shuffle on (type, bucket); bucket
    // count is bounded by the value range, independent of data size.
    "q82_histogram" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(
          col("event_type"),
          floor(col("value") / 25.0).cast("int").as("bucket"))
        .agg(
          count(lit(1)).as("n"),
          min(col("value")).as("lo"),
          max(col("value")).as("hi"))
        .orderBy("event_type", "bucket")
    }),

    // Equi-depth histogram (q82's quantile-bucket complement): skew
    // shows as unequal bucket VALUE SPANS even when the fixed-width
    // picture looks flat. Rank-based bucketing (ntile over a
    // deterministic total order) rather than interpolated percentile
    // edges: edges are floats whose last-ulp differences flip
    // boundary rows across engines (measured at sf0.1 — 4 rows moved
    // buckets); ntile is pure integer arithmetic on ranks, identical
    // everywhere, and equal depth holds EXACTLY (buckets differ by
    // ≤1 row). Bucket min/max are raw data values — no interpolation
    // anywhere. One key exchange; the per-type sort is the exact-
    // quantile price (approx_percentile bucketing is the documented
    // 100 TB swap, q57→q62 trade).
    "q108_equidepth_hist" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("value"), col("event_id"))
      t(s, dir, "events")
        .withColumn("bucket", ntile(10).over(w))
        .groupBy("event_type", "bucket")
        .agg(
          count(lit(1)).as("n"),
          min(col("value")).as("lo"),
          max(col("value")).as("hi"))
        .orderBy("event_type", "bucket")
    }),

    // Count-min sketch frequency audit — 4th sketch family member
    // (exact+envelope pattern of q61/q62): ONE mergeable CMS over the
    // event stream rides a scalar subquery (the constant-or-subquery
    // shape of q64's bloom) and is probed in-plan by the custom
    // graft_cms_estimate expression — Spark ships only the build
    // aggregate, so without it the sketch needs a driver collect().
    // CMS never undercounts, and overcounts by ≤ eps·N at the built
    // confidence: ok pins est into [exact, exact + ceil(eps·N)].
    // The total-N normalizer comes from a window over the ALREADY
    // AGGREGATED frame (one row per event type), not a second scan.
    "q83_cms_audit" -> ((s, dir) => {
      import org.apache.spark.sql.GraftBridge.{column, expression, scalarSubquery}
      import org.apache.spark.sql.catalyst.expressions.Literal
      import org.apache.spark.sql.catalyst.expressions.aggregate.CountMinSketchAgg
      val eps = 1e-4
      val ev = t(s, dir, "events")
      val cmsSubquery = scalarSubquery(ev.agg(
        column(new CountMinSketchAgg(
            expression(col("event_type")),
            Literal(eps), Literal(0.99), Literal(42))
          .toAggregateExpression()).as("__cms")))
      ev.groupBy("event_type")
        .agg(count(lit(1)).as("exact_n"))
        .withColumn("__est", column(graft.functions.CmsEstimate(
          cmsSubquery, expression(col("event_type")))))
        .withColumn("__n_total",
          sum(col("exact_n")).over(Window.partitionBy(lit(0))))
        .select(
          col("event_type"), col("exact_n"),
          (col("__est") >= col("exact_n") &&
            col("__est") <= col("exact_n") +
              ceil(col("__n_total") * eps).cast("long")).as("ok"))
        .orderBy("event_type")
    }),

    // One-pass data-quality audit (Deequ-style expectations): four
    // constraints share a SINGLE scan+aggregate of orders — N rules,
    // one pass, vs the naive one-job-per-rule validator — plus one
    // anti-join row for referential integrity (not expressible as a
    // child-side scalar). The range rule is deliberately tight enough
    // to FAIL so the report's ok=false path is oracle-pinned too.
    "q85_quality_audit" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      graft.operators.Quality.audit(orders, Seq(
          graft.operators.Quality.notNull("o_orderdate"),
          graft.operators.Quality.unique("o_orderkey"),
          graft.operators.Quality.inRange("o_totalprice", 0.0, 400000.0),
          graft.operators.Quality.minRows(1L)))
        .unionByName(graft.operators.Quality.refIntegrity(
          orders, "o_custkey", t(s, dir, "customer"), "c_custkey"))
        .orderBy("check_name")
    }),

    // Behavioral transition matrix (clickstream Markov counts): per
    // user, each consecutive event-type pair — lag over the SAME
    // user-key exchange the sessionize family uses, then one bounded
    // aggregation (|types|² groups at most). (ts, event_id) tiebreak
    // makes the sequence — hence the matrix — deterministic.
    "q91_transitions" -> ((s, dir) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .select(
          col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("prev_type", lag("event_type", 1).over(w))
        .where(col("prev_type").isNotNull)
        .groupBy(col("prev_type"), col("event_type").as("next_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy("prev_type", "next_type")
    }),

    // Cumulative distinct users by day — the time-series composition
    // of the sketch family: per-day HLL sketches running-merge via a
    // window (the 100 TB path: day sketches persist as O(KB) state and
    // any cumulative/rolling range re-merges WITHOUT rescanning the
    // fact), audited against the exact answer computed by the
    // first-day trick — cum_users(d) = running sum of per-day NEW
    // users (one user-key shuffle) — no expanding re-aggregation of
    // the fact either. Both windows run over the per-day frame
    // (bounded by the calendar, hence the safe global orderBy); the
    // O(days²) running sketch re-merge is bounded the same way.
    "q90_cumulative_users" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(date_trunc("day", col("ts")).as("day"), col("user_id"))
      val newU = ev.groupBy("user_id").agg(min("day").as("day"))
        .groupBy("day").agg(count(lit(1)).as("new_users"))
      val byDay = ev.groupBy("day")
        .agg(hll_sketch_agg(col("user_id"), lit(14)).as("__sk"))
      val wRun = Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      byDay.join(newU, Seq("day"), "left")
        .na.fill(0L, Seq("new_users"))
        .withColumn("cum_users", sum("new_users").over(wRun))
        .withColumn("__est",
          hll_sketch_estimate(hll_union_agg(col("__sk")).over(wRun)))
        .select(
          col("day"), col("cum_users"),
          (abs(col("__est") - col("cum_users")) <=
            col("cum_users") * 0.05).as("ok"))
        .orderBy("day")
    }),

    // Distribution drift (PSI) between two snapshots — the monitoring
    // member of the governance trio (q85 audit, q86 profile): even/odd
    // orderkey halves stand in for yesterday/today; per-bucket
    // (p−q)·ln(p/q) contributions over 20 fixed-width price buckets.
    // ln-of-ratio survives the 6-dp round across engines (the q75
    // entropy precedent); bucket counts and shares are exact-integer
    // math in a fixed op order.
    "q88_drift_psi" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      graft.operators.Quality.driftPsi(
        o.where(col("o_orderkey") % 2 === 0),
        o.where(col("o_orderkey") % 2 === 1),
        "o_totalprice", lo = 0.0, hi = 500000.0, nBuckets = 20)
    }),

    // One-pass numeric dataset profile (describe/summary surface):
    // 7 stats × 3 columns over ONE scan+aggregate; mean/std are
    // decimal-accumulated then finished in a fixed double-op order,
    // so the oracle pins them exactly (plain avg/stddev over doubles
    // is partition-order-dependent and never hash-stable).
    "q86_profile" -> ((s, dir) => {
      graft.operators.Profile.numeric(
          t(s, dir, "orders"),
          Seq("o_custkey", "o_totalprice", "o_orderkey"))
        .orderBy("col_name", "stat")
    }),

    // R26: metric-movement cube diff — "why did value mass move
    // between the half-months?" One CUBE pass diffs the metric at
    // every (event_type × day-bucket) combination, ranks |delta|
    // within each grouping set, and shares against the grand-total
    // move. Exact micro-unit decimals; one Expand aggregate.
    "q238_cube_diff" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .where(col("value").isNotNull)
        .select(col("event_type"),
          (dayofmonth(col("ts")) % 7).as("day_bucket"),
          floor(col("value") * 1000000).cast("long").as("m"),
          (dayofmonth(col("ts")) <= 15).as("in_a"))
      graft.operators.Profile.metricDiffCube(ev,
          Seq("event_type", "day_bucket"), col("m"), col("in_a"))
        .orderBy("gid", "rank")
    }),

    // Q7: inclusion-dependency (FK discovery) profile — which
    // child→parent candidates are safe joins, and how much orphan
    // mass the bad ones would drop. Four candidates: three true FKs
    // plus a deliberately wrong one (suppkey→nationkey, partial).
    "q233_fk_profile" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      graft.operators.Profile.inclusionDependencies(Seq(
          ("lineitem.l_orderkey->orders.o_orderkey",
            li, "l_orderkey", t(s, dir, "orders"), "o_orderkey"),
          ("lineitem.l_partkey->part.p_partkey",
            li, "l_partkey", t(s, dir, "part"), "p_partkey"),
          ("orders.o_custkey->customer.c_custkey",
            t(s, dir, "orders"), "o_custkey",
            t(s, dir, "customer"), "c_custkey"),
          ("lineitem.l_suppkey->nation.n_nationkey",
            li, "l_suppkey", t(s, dir, "nation"), "n_nationkey")))
        .orderBy("candidate")
    }),

    // Q6: functional-dependency + candidate-key profile of orders —
    // FD verdicts for three declared pairs (same-lhs pairs share one
    // multi-distinct key shuffle) unioned with uniqueness audits for
    // three candidate key sets; exact integer stats end to end.
    "q224_fd_profile" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val fd = graft.operators.Profile.functionalDependencies(o, Seq(
          "o_custkey" -> "o_orderpriority",
          "o_custkey" -> "o_orderstatus",
          "o_orderkey" -> "o_orderstatus"))
        .select(lit("fd").as("kind"), col("lhs"), col("rhs"),
          col("n_keys"), col("violating_keys").as("violations"),
          col("max_fanout"), col("holds"))
      val keys = graft.operators.Profile.candidateKeys(o, Seq(
          Seq("o_custkey", "o_orderdate"),
          Seq("o_orderkey"),
          Seq("o_orderpriority")))
        .select(lit("key").as("kind"), col("key_cols").as("lhs"),
          lit("").as("rhs"), col("n_keys"),
          col("dup_rows").as("violations"),
          col("max_group").as("max_fanout"), col("is_key").as("holds"))
      fd.unionByName(keys).orderBy("kind", "lhs", "rhs")
    }),

    // Categorical×categorical association (the correlations
    // complement): MI, chi-squared, Cramér's V between lang and
    // source from one contingency pass; per-cell terms quantize to
    // decimal before the cross-cell sum (partition-order-free).
    "q171_cat_association" -> ((s, dir) => {
      graft.operators.Profile.categoricalAssociation(
          t(s, dir, "documents"), "lang", "source")
    }),

    // Weighted PageRank over the event-type transition graph (q91's
    // edges): long-run attention share per state — power iteration,
    // one co-partitioned join + one contribution shuffle per round,
    // scalars ride one-row cross joins.
    "q123_pagerank" -> ((s, dir) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
      val edges = t(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"))
        .withColumn("prev_type", lag("event_type", 1).over(w))
        .where(col("prev_type").isNotNull)
        .groupBy(col("prev_type"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      graft.operators.Graph.pageRank(
          edges, "prev_type", "event_type", "n",
          damping = 0.85, iters = 10)
        .select(col("node"), round(col("rank"), 6).as("rank"))
        .orderBy("node")
    }),

    // G4: deterministic label-propagation communities over the
    // adjacent-token co-occurrence graph — synchronous plurality
    // vote, integer weights, (weight desc, label asc) tie-break, 4
    // fixed rounds; one edge join + two partial-agg shuffles per
    // round, label state one row per node.
    "q225_label_prop" -> ((s, dir) => {
      val bg = t(s, dir, "documents")
        .select(split(col("text"), " ").as("t"))
        .where(size(col("t")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(t) - 1), " +
            "i -> struct(element_at(t, i) AS a, element_at(t, i + 1) AS b))"))
          .as("bg"))
        .select(col("bg.a").as("a"), col("bg.b").as("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("n"))
      graft.operators.Graph.labelPropagation(bg, "a", "b", "n",
          rounds = 4)
        .select(col("node"), col("lbl").as("label"))
        .orderBy("node")
    }),

    // G12 (round 12): Newman modularity audit of a 1-round label-prop
    // partition over the q225 bigram co-occurrence graph (1 round
    // keeps ~18 star-anchor communities — 4 rounds collapses this
    // dense vocab graph to one, a trivial audit) — per community the
    // intra/degree mass, exact integer numerator, one IEEE division
    // finish; Σ deg_w = total_w on every row.
    "q302_modularity" -> ((s, dir) => {
      val bg = t(s, dir, "documents")
        .select(split(col("text"), " ").as("t"))
        .where(size(col("t")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(t) - 1), " +
            "i -> struct(element_at(t, i) AS a, element_at(t, i + 1) AS b))"))
          .as("bg"))
        .select(col("bg.a").as("a"), col("bg.b").as("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("n"))
      val labels = graft.operators.Graph.labelPropagation(
        bg, "a", "b", "n", rounds = 1)
      graft.operators.Graph.modularity(bg, "a", "b", "n", labels)
    }),

    // G13 (round 13): bounded-round deterministic Louvain over the
    // q225 bigram graph — modularity OPTIMIZATION next to q302's
    // audit: exact integer gain ranks, md5-parity move schedule,
    // every round accept-tested against the exact Q numerator
    // (monotone by construction). The trace IS the gate: round 0
    // singleton baseline (negative Q), then one row per accepted
    // round with exact spend of moves/communities/Q.
    "q318_louvain" -> ((s, dir) => {
      val bg = t(s, dir, "documents")
        .select(split(col("text"), " ").as("t"))
        .where(size(col("t")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(t) - 1), " +
            "i -> struct(element_at(t, i) AS a, element_at(t, i + 1) AS b))"))
          .as("bg"))
        .select(col("bg.a").as("a"), col("bg.b").as("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("n"))
      graft.operators.Graph.louvain(bg, "a", "b", "n", maxRounds = 3)
        .orderBy("round")
    }),

    // G14 (round 13): TWO-LEVEL Louvain over the q225 bigram graph
    // — level-1 moves, coarsen communities into super-nodes (internal
    // mass as self-loops, 2m conserved), rerun the move phase on the
    // coarse graph. The trace carries both levels; level-2 round 0
    // must replay level-1's final Q exactly (the conservation row).
    "q322_louvain_two_level" -> ((s, dir) => {
      val bg = t(s, dir, "documents")
        .select(split(col("text"), " ").as("t"))
        .where(size(col("t")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(t) - 1), " +
            "i -> struct(element_at(t, i) AS a, element_at(t, i + 1) AS b))"))
          .as("bg"))
        .select(col("bg.a").as("a"), col("bg.b").as("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("n"))
      graft.operators.Graph.louvainTwoLevel(bg, "a", "b", "n",
          maxRoundsPerLevel = 2)
        .orderBy("level", "round")
    }),

    // G16 (round 14): weighted shortest-path distances over the
    // bigram word graph — edge weight 1 + (count % 9) (deterministic
    // small-integer variation both engines replay), single seed =
    // the lexicographically smallest node, 6 Bellman–Ford rounds.
    // Emits BOTH the weighted distance and the hop distance from the
    // same relaxation — the nodes where they disagree are exactly
    // where a hop-radius quarantine (q246's shape) would evict the
    // wrong set. Distances exact for paths of ≤ 6 edges (the
    // bounded-round regime; documented in the operator scaladoc).
    "q332_weighted_paths" -> ((s, dir) => {
      val bg = t(s, dir, "documents")
        .select(split(col("text"), " ").as("t"))
        .where(size(col("t")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(t) - 1), " +
            "i -> struct(element_at(t, i) AS a, element_at(t, i + 1) AS b))"))
          .as("bg"))
        .select(col("bg.a").as("a"), col("bg.b").as("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("n"))
        .where(col("a") =!= col("b"))
        .select(col("a"), col("b"), (col("n") % 9 + 1).as("w"))
      val seeds = bg
        .agg(min(least(col("a"), col("b"))).as("seed"))
      graft.operators.Graph.weightedDistances(
          bg, "a", "b", "w", seeds, "seed", rounds = 6)
        .orderBy("node")
    }),

    // Benford first-digit audit of order totals: observed vs
    // log10(1+1/d) with per-digit chi-square contribution — the
    // fabricated-data screen; one 9-group aggregate.
    "q121_benford" -> ((s, dir) => {
      graft.operators.Quality.benfordAudit(
          t(s, dir, "orders"), "o_totalprice")
        .orderBy("digit")
    }),

    // Winsorization audit: nearest-rank [p5, p95] edges of value per
    // event type + how many rows each side would clip — integer rank
    // arithmetic (the q108 lesson), one key exchange + a broadcast
    // edge-table join back.
    "q120_winsorize" -> ((s, dir) => {
      graft.operators.Quality.winsorizeAudit(
          t(s, dir, "events"), "event_type", "value",
          loQ = 0.05, hiQ = 0.95)
        .orderBy("event_type")
    }),

    // Q5: exact volume-weighted price percentiles per return flag —
    // cumulative DECIMAL weights in value order, multiplied-form
    // rational thresholds (no division, no interpolation), one key
    // exchange shared by both windows and the final aggregate.
    "q183_weighted_quantiles" -> ((s, dir) => {
      graft.operators.Quality.weightedQuantiles(
          t(s, dir, "lineitem"), "l_returnflag", "l_extendedprice",
          "l_quantity", quantiles = Seq(0.25, 0.5, 0.9, 0.99))
        .orderBy("l_returnflag", "quantile")
    }),

    // Per-type value trend over the month (OLS slope/intercept vs
    // day index): decimal co-moments per key, fixed double-op finish
    // — drift-rate measurement the oracle pins exactly.
    "q119_trend_fit" -> ((s, dir) => {
      graft.operators.TimeSeries.trendFit(
          t(s, dir, "events")
            .withColumn("day", datediff(to_date(col("ts")),
              lit("2024-01-01").cast("date")).cast("long")),
          "event_type", "day", "value")
        .orderBy("event_type")
    }),

    // Reproducible Pearson correlation matrix: all 6 pairs of 4
    // lineitem measures in ONE scan; decimal co-moments + fixed
    // double-op finish, so the oracle pins every coefficient exactly
    // (built-in corr is partition-order-dependent in the last ulps).
    "q118_correlation" -> ((s, dir) => {
      graft.operators.Profile.correlations(
          t(s, dir, "lineitem"),
          Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
        .orderBy("col_a", "col_b")
    }),

    // K15: training-shard export read-back audit (q131 contract
    // shape): documents written in interleave emission order across
    // 8 position-tiled files, then audited from the read-back alone —
    // dense 1..n positions, zero overlapping per-file position
    // ranges (measured, oracle pins the literal 0), and the R23
    // content digest over (doc_id, text), which the oracle recomputes
    // from the SOURCE table — rows lost, duplicated, or altered by
    // the writer hash-fail.
    "q194_shard_export" -> ((s, dir) => {
      val dest = scratchDir("layout_q194").toString
      val docs = t(s, dir, "documents").select("source", "doc_id", "text")
      graft.operators.Layout.interleavedShardWrite(
        docs, dest, "source", "doc_id", numFiles = 8)
      val back = s.read.parquet(dest)
      val ranges = graft.operators.Layout.fileRanges(back, "global_pos")
      val overlaps = ranges.as("x").join(ranges.as("y"),
          col("x.file") < col("y.file") &&
            col("x.lo") <= col("y.hi") && col("y.lo") <= col("x.hi"))
        .agg(count(lit(1)).as("overlap_pairs"))
      val digest = graft.operators.Quality.tableFingerprint(
          back.withColumn("__g", lit("all")),
          Seq("doc_id", "text"), "__g")
        .select(col("xor_hash"), col("sum_hash"))
      back.agg(
          count(lit(1)).as("total_rows"),
          countDistinct(col("global_pos")).as("distinct_pos"),
          min(col("global_pos")).as("min_pos"),
          max(col("global_pos")).as("max_pos"))
        .crossJoin(overlaps)
        .crossJoin(digest)
    })
  )

  /** Unrolled power-iteration oracle for q123 (recursive CTEs can't
    * aggregate in the recursive member): pr0 = 1/N, then per round
    * the EXACT double-op sequence Graph.pageRank runs — (1−d)/N +
    * d·(contrib + dang/N) with row-level rank·w/ow. */
  private def pageRankOracle(iters: Int): String = {
    val base =
      """WITH o0 AS (
        |  SELECT user_id, event_type,
        |    lag(event_type) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        |  FROM events
        |), e AS MATERIALIZED (
        |  SELECT prev_type AS src, event_type AS dst,
        |    CAST(count(*) AS DOUBLE) AS w
        |  FROM o0 WHERE prev_type IS NOT NULL GROUP BY 1, 2
        |), nodes AS MATERIALIZED (
        |  SELECT src AS node FROM e UNION SELECT dst FROM e
        |), cnt AS MATERIALIZED (
        |  SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes
        |), ow AS MATERIALIZED (SELECT src, SUM(w) AS ow FROM e GROUP BY src
        |), pr0 AS MATERIALIZED (
        |  SELECT node, 1.0 / cnt.n AS rank FROM nodes, cnt)""".stripMargin
    // AS MATERIALIZED is load-bearing: DuckDB inlines plain CTEs, and
    // each round references the previous one twice (contributions +
    // dangling) — inlined, the expansion re-evaluates the base window
    // query 2^iters times.
    val rounds = (1 to iters).map { i =>
      s""", c$i AS MATERIALIZED (
         |  SELECT e.dst AS node, SUM(p.rank * e.w / ow.ow) AS contrib
         |  FROM pr${i - 1} p JOIN e ON e.src = p.node
         |  JOIN ow ON ow.src = e.src GROUP BY e.dst
         |), d$i AS MATERIALIZED (
         |  SELECT COALESCE(SUM(p.rank), 0) AS dang FROM pr${i - 1} p
         |  WHERE p.node NOT IN (SELECT src FROM ow)
         |), pr$i AS MATERIALIZED (
         |  SELECT n.node,
         |    (1 - 0.85) / cnt.n
         |      + 0.85 * (COALESCE(c.contrib, 0) + d$i.dang / cnt.n) AS rank
         |  FROM nodes n CROSS JOIN cnt
         |  LEFT JOIN c$i c ON c.node = n.node CROSS JOIN d$i
         |)""".stripMargin
    }.mkString("\n")
    s"$base\n$rounds\nSELECT node, round(rank, 6) AS rank FROM pr$iters ORDER BY node"
  }

  /** One Louvain move-round CTE chain for the q318/q322 oracles —
    * `tag` prefixes every table name (level-2 uses "c"), `g`/`d` the
    * graph/degree tables, `selfLoops = true` excludes a = b rows
    * from the CANDIDATE aggregation only (degrees/Σtot/accept keep
    * self mass — the coarse-level arithmetic). */
  private def louvainRoundCte(
      tag: String, g: String, d: String, r: Int,
      selfLoops: Boolean): String = {
    val p = r - 1
    val selfFilter = if (selfLoops) "\n    |    WHERE u.a <> u.b" else ""
    s""", ${tag}sig$r AS (
       |  SELECT l.lbl, CAST(SUM(d.k) AS BIGINT) AS sig
       |  FROM ${tag}l$p l JOIN $d d ON d.node = l.node GROUP BY 1
       |), ${tag}cand$r AS (
       |  SELECT a, lb, CAST(SUM(wvc) AS BIGINT) AS wvc FROM (
       |    SELECT u.a AS a, l.lbl AS lb, SUM(u.w) AS wvc
       |    FROM $g u JOIN ${tag}l$p l ON l.node = u.b$selfFilter
       |    GROUP BY 1, 2
       |    UNION ALL
       |    SELECT node AS a, lbl AS lb, 0 FROM ${tag}l$p
       |  ) GROUP BY 1, 2
       |), ${tag}scored$r AS (
       |  SELECT c.a, c.lb, la.lbl AS la,
       |    (SELECT total_w FROM w2)::HUGEINT * c.wvc::HUGEINT
       |      - d.k::HUGEINT * (CASE WHEN c.lb = la.lbl
       |          THEN s.sig - d.k ELSE s.sig END)::HUGEINT AS score
       |  FROM ${tag}cand$r c
       |  JOIN ${tag}l$p la ON la.node = c.a
       |  JOIN $d d ON d.node = c.a
       |  JOIN ${tag}sig$r s ON s.lbl = c.lb
       |), ${tag}mv$r AS MATERIALIZED (
       |  SELECT a AS node,
       |    CASE WHEN par = ${r % 2} AND best_s > stay_s
       |      THEN best_l ELSE la END AS lbl,
       |    (CASE WHEN par = ${r % 2} AND best_s > stay_s
       |      THEN best_l ELSE la END) <> la AS moved
       |  FROM (
       |    SELECT a, la,
       |      max(CASE WHEN rn = 1 THEN lb END) AS best_l,
       |      max(CASE WHEN rn = 1 THEN score END) AS best_s,
       |      max(CASE WHEN lb = la THEN score END) AS stay_s,
       |      ('0x' || substr(md5(a), 1, 7))::BIGINT % 2 AS par
       |    FROM (
       |      SELECT a, la, lb, score, row_number() OVER (
       |        PARTITION BY a ORDER BY score DESC, lb ASC) AS rn
       |      FROM ${tag}scored$r)
       |    GROUP BY a, la, par)
       |), ${tag}l$r AS MATERIALIZED (
       |  SELECT node, lbl FROM ${tag}mv$r
       |), ${tag}q$r AS (
       |  SELECT $r AS round,
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM ${tag}mv$r WHERE moved)
       |      AS n_moves,
       |    c.ncomm AS n_communities, c.qnum
       |  FROM (
       |    SELECT CAST(COUNT(*) AS BIGINT) AS ncomm,
       |      SUM(intra)::HUGEINT * (SELECT total_w FROM w2)::HUGEINT
       |        - SUM(degw::HUGEINT * degw::HUGEINT) AS qnum
       |    FROM (
       |      SELECT la.lbl AS lbl,
       |        SUM(CASE WHEN la.lbl = lb.lbl THEN u.w ELSE 0 END)
       |          AS intra,
       |        SUM(u.w) AS degw
       |      FROM $g u
       |      JOIN ${tag}l$r la ON la.node = u.a
       |      JOIN ${tag}l$r lb ON lb.node = u.b
       |      GROUP BY 1)) c
       |)""".stripMargin
  }

  /** q318 oracle generator: the bounded-round Louvain trace — the
    * q225 bigram graph CTEs, then per round the Σtot/candidate/
    * gain-rank/move/accept chain unrolled (AS MATERIALIZED per the
    * q123 rule — every label table feeds several consumers), with
    * the accept test replayed as a prefix-min over per-round exact
    * HUGEINT Q numerators. All integer arithmetic; the one IEEE op
    * is the final q division (signed → + 0.0). */
  /** Shared q318/q322 base: the q225 bigram graph, symmetrized, with
    * degrees, 2m, singleton labels, and the round-0 stats. */
  private val louvainBase =
      """WITH toks AS (
        |  SELECT string_split(text, ' ') AS w FROM documents
        |), bgl AS (
        |  SELECT w, unnest(generate_series(1, len(w) - 1)) AS i
        |  FROM toks WHERE len(w) >= 2
        |), bg AS (
        |  SELECT w[i] AS a, w[i+1] AS b, count(*) AS cab
        |  FROM bgl GROUP BY 1, 2
        |), und AS MATERIALIZED (
        |  SELECT a, b, CAST(SUM(cab) AS BIGINT) AS w FROM (
        |    SELECT a, b, cab FROM bg WHERE a <> b
        |    UNION ALL
        |    SELECT b AS a, a AS b, cab FROM bg WHERE a <> b
        |  ) GROUP BY 1, 2
        |), degs AS MATERIALIZED (
        |  SELECT a AS node, CAST(SUM(w) AS BIGINT) AS k
        |  FROM und GROUP BY 1
        |), w2 AS MATERIALIZED (
        |  SELECT CAST(SUM(w) AS BIGINT) AS total_w FROM und
        |), l0 AS MATERIALIZED (
        |  SELECT node, node AS lbl FROM degs
        |), q0 AS (
        |  SELECT 0 AS round, CAST(0 AS BIGINT) AS n_moves,
        |    c.ncomm AS n_communities, c.qnum
        |  FROM (
        |    SELECT CAST(COUNT(*) AS BIGINT) AS ncomm,
        |      SUM(intra)::HUGEINT * (SELECT total_w FROM w2)::HUGEINT
        |        - SUM(degw::HUGEINT * degw::HUGEINT) AS qnum
        |    FROM (
        |      SELECT la.lbl AS lbl,
        |        SUM(CASE WHEN la.lbl = lb.lbl THEN u.w ELSE 0 END)
        |          AS intra,
        |        SUM(u.w) AS degw
        |      FROM und u
        |      JOIN l0 la ON la.node = u.a
        |      JOIN l0 lb ON lb.node = u.b
        |      GROUP BY 1)) c
        |)""".stripMargin

  private def louvainOracle(maxRounds: Int): String = {
    val base = louvainBase
    val rounds = (1 to maxRounds)
      .map(r => louvainRoundCte("", "und", "degs", r, selfLoops = false))
      .mkString("\n")
    val union = (0 to maxRounds).map(r => s"SELECT * FROM q$r")
      .mkString("\n  UNION ALL\n  ")
    s"""$base
       |$rounds
       |, tr AS (
       |  $union
       |), fl AS (
       |  SELECT round, n_moves, n_communities, qnum,
       |    CASE WHEN round = 0 THEN 1
       |         WHEN qnum > lag(qnum) OVER (ORDER BY round) THEN 1
       |         ELSE 0 END AS f
       |  FROM tr
       |), acc AS (
       |  SELECT *, MIN(f) OVER (ORDER BY round
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ok
       |  FROM fl
       |)
       |SELECT CAST(round AS INT) AS round, n_moves, n_communities,
       |  CAST(qnum AS VARCHAR) AS q_num,
       |  ROUND(CAST(qnum AS DOUBLE) /
       |    (CAST((SELECT total_w FROM w2) AS DOUBLE)
       |     * CAST((SELECT total_w FROM w2) AS DOUBLE)), 6) + 0.0
       |    AS q
       |FROM acc WHERE ok = 1 ORDER BY round""".stripMargin
  }

  /** q322 oracle generator: the TWO-LEVEL Louvain trace — level 1 is
    * the q318 chain; the accepted-at-gate-scale final label table
    * coarsens into super-nodes (self-loop rows KEPT — internal mass),
    * level 2 reruns the same chain with self-aware degrees/candidates,
    * and the trace unions under per-level prefix-min accept logic.
    * Level-2 round 0 replays level-1's final Q exactly (mass
    * conservation across the collapse — the invariant the gate
    * verifies at every scale). */
  private def louvainTwoLevelOracle(r1: Int, r2: Int): String = {
    val l1rounds = (1 to r1)
      .map(r => louvainRoundCte("", "und", "degs", r, selfLoops = false))
      .mkString("\n")
    // The operator coarsens from the last ACCEPTED label table
    // (moveLoop stops on the first Q-non-improving round and keeps
    // the previous labels) — so the oracle must NOT coarsen from
    // l$r1 unconditionally: replay the per-round accept flags as a
    // prefix-min over the unrolled level-1 trace, pick the last
    // accepted round, and CASE-select that round's label CTE
    // (r13 ADVICE medium).
    val tr1union = (0 to r1).map(r => s"SELECT * FROM q$r")
      .mkString("\n  UNION ALL\n  ")
    val lfinUnion = (0 to r1)
      .map(r => s"SELECT node, lbl FROM l$r\n  " +
        s"WHERE (SELECT lastr FROM acc1) = $r")
      .mkString("\n  UNION ALL\n  ")
    val coarse =
      s""", tr1 AS MATERIALIZED (
         |  $tr1union
         |), acc1 AS MATERIALIZED (
         |  SELECT CAST(MAX(round) AS BIGINT) AS lastr FROM (
         |    SELECT round, MIN(f) OVER (ORDER BY round
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ok
         |    FROM (
         |      SELECT round,
         |        CASE WHEN round = 0 THEN 1
         |             WHEN qnum > lag(qnum) OVER (ORDER BY round)
         |               THEN 1
         |             ELSE 0 END AS f
         |      FROM tr1)
         |  ) WHERE ok = 1
         |), lfin AS MATERIALIZED (
         |  $lfinUnion
         |), coarse AS MATERIALIZED (
         |  SELECT la.lbl AS a, lb.lbl AS b, CAST(SUM(u.w) AS BIGINT)
         |    AS w
         |  FROM und u
         |  JOIN lfin la ON la.node = u.a
         |  JOIN lfin lb ON lb.node = u.b
         |  GROUP BY 1, 2
         |), cdegs AS MATERIALIZED (
         |  SELECT a AS node, CAST(SUM(w) AS BIGINT) AS k
         |  FROM coarse GROUP BY 1
         |), cl0 AS MATERIALIZED (
         |  SELECT node, node AS lbl FROM cdegs
         |), cq0 AS (
         |  SELECT 0 AS round, CAST(0 AS BIGINT) AS n_moves,
         |    c.ncomm AS n_communities, c.qnum
         |  FROM (
         |    SELECT CAST(COUNT(*) AS BIGINT) AS ncomm,
         |      SUM(intra)::HUGEINT * (SELECT total_w FROM w2)::HUGEINT
         |        - SUM(degw::HUGEINT * degw::HUGEINT) AS qnum
         |    FROM (
         |      SELECT la.lbl AS lbl,
         |        SUM(CASE WHEN la.lbl = lb.lbl THEN u.w ELSE 0 END)
         |          AS intra,
         |        SUM(u.w) AS degw
         |      FROM coarse u
         |      JOIN cl0 la ON la.node = u.a
         |      JOIN cl0 lb ON lb.node = u.b
         |      GROUP BY 1)) c
         |)""".stripMargin
    val l2rounds = (1 to r2)
      .map(r => louvainRoundCte("c", "coarse", "cdegs", r,
        selfLoops = true))
      .mkString("\n")
    val union = (Seq("SELECT 1 AS level, * FROM tr1") ++
      (0 to r2).map(r => s"SELECT 2 AS level, * FROM cq$r"))
      .mkString("\n  UNION ALL\n  ")
    s"""$louvainBase
       |$l1rounds
       |$coarse
       |$l2rounds
       |, tr AS (
       |  $union
       |), fl AS (
       |  SELECT level, round, n_moves, n_communities, qnum,
       |    CASE WHEN round = 0 THEN 1
       |         WHEN qnum > lag(qnum) OVER (PARTITION BY level
       |           ORDER BY round) THEN 1
       |         ELSE 0 END AS f
       |  FROM tr
       |), acc AS (
       |  SELECT *, MIN(f) OVER (PARTITION BY level ORDER BY round
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ok
       |  FROM fl
       |)
       |SELECT CAST(level AS INT) AS level, CAST(round AS INT) AS round,
       |  n_moves, n_communities,
       |  CAST(qnum AS VARCHAR) AS q_num,
       |  ROUND(CAST(qnum AS DOUBLE) /
       |    (CAST((SELECT total_w FROM w2) AS DOUBLE)
       |     * CAST((SELECT total_w FROM w2) AS DOUBLE)), 6) + 0.0
       |    AS q
       |FROM acc WHERE ok = 1 ORDER BY level, round""".stripMargin
  }

  /** q332 oracle generator: Bellman–Ford unrolled — the bigram graph
    * with 1 + (count % 9) weights, symmetrized keeping MIN weight per
    * direction pair, then `rounds` min-merge CTEs. The oracle relaxes
    * from the FULL state each round where the operator relaxes from
    * the changed-rows frontier — value-identical (an unchanged node's
    * candidates are already ≥ the merged minimum), and all integer,
    * so the replay is exact. */
  private def weightedPathsOracle(rounds: Int): String = {
    val base =
      """WITH toks AS (
        |  SELECT string_split(text, ' ') AS w FROM documents
        |), bgl AS (
        |  SELECT w, unnest(generate_series(1, len(w) - 1)) AS i
        |  FROM toks WHERE len(w) >= 2
        |), bg AS (
        |  SELECT w[i] AS a, w[i+1] AS b, count(*) AS cab
        |  FROM bgl GROUP BY 1, 2
        |), dir AS (
        |  SELECT a, b, CAST(cab % 9 + 1 AS BIGINT) AS w
        |  FROM bg WHERE a <> b
        |), und AS MATERIALIZED (
        |  SELECT a, b, CAST(MIN(w) AS BIGINT) AS w FROM (
        |    SELECT a, b, w FROM dir
        |    UNION ALL
        |    SELECT b AS a, a AS b, w FROM dir
        |  ) GROUP BY 1, 2
        |), d0 AS MATERIALIZED (
        |  SELECT MIN(a) AS node, CAST(0 AS BIGINT) AS dist,
        |    CAST(0 AS BIGINT) AS hops
        |  FROM und
        |)""".stripMargin
    val rnds = (1 to rounds).map { r =>
      s""", d$r AS MATERIALIZED (
         |  SELECT node, MIN(dist) AS dist, MIN(hops) AS hops FROM (
         |    SELECT node, dist, hops FROM d${r - 1}
         |    UNION ALL
         |    SELECT e.b AS node, d.dist + e.w AS dist,
         |      d.hops + 1 AS hops
         |    FROM d${r - 1} d JOIN und e ON e.a = d.node
         |  ) GROUP BY 1
         |)""".stripMargin
    }.mkString("\n")
    s"""$base
       |$rnds
       |SELECT n.node, d.dist, d.hops
       |FROM (SELECT DISTINCT a AS node FROM und
       |      UNION SELECT node FROM d0) n
       |LEFT JOIN d$rounds d ON d.node = n.node
       |ORDER BY n.node""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q318_louvain" -> louvainOracle(3),
    "q322_louvain_two_level" -> louvainTwoLevelOracle(2, 2),
    "q332_weighted_paths" -> weightedPathsOracle(6),


    "q123_pagerank" -> pageRankOracle(10),

    "q49_rollup_revenue" ->
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_orders,
        |  GROUPING(r_name, n_name) AS gid
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY gid, r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,

    "q50_cube_returns" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n,
        |  GROUPING(l_returnflag, l_linestatus) AS gid
        |FROM lineitem
        |GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q51_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE)
        |    AS sum_price,
        |  COUNT(*) AS n,
        |  GROUPING(l_returnflag, l_linestatus) AS gid
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q52_pivot_priority" ->
      """SELECT n_name,
        |  COUNT(*) FILTER (o_orderpriority = '1-URGENT') AS "1-URGENT",
        |  COUNT(*) FILTER (o_orderpriority = '2-HIGH') AS "2-HIGH",
        |  COUNT(*) FILTER (o_orderpriority = '3-MEDIUM') AS "3-MEDIUM",
        |  COUNT(*) FILTER (o_orderpriority = '4-NOT SPECIFIED')
        |    AS "4-NOT SPECIFIED",
        |  COUNT(*) FILTER (o_orderpriority = '5-LOW') AS "5-LOW"
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,

    "q53_set_ops" ->
      """WITH urgent AS (
        |  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'),
        |finished AS (
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
        |SELECT o_custkey, 'both' AS tag
        |FROM (SELECT o_custkey FROM urgent
        |      INTERSECT SELECT o_custkey FROM finished)
        |UNION ALL
        |SELECT o_custkey, 'urgent_only' AS tag
        |FROM (SELECT o_custkey FROM urgent
        |      EXCEPT SELECT o_custkey FROM finished)
        |ORDER BY tag, o_custkey""".stripMargin,

    "q54_rank_family" ->
      """SELECT * FROM (
  -- INT casts: DuckDB's ranking functions return BIGINT, Spark's
        |  -- return INT — align widths to Spark.
        |  SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity,
        |    CAST(ROW_NUMBER() OVER w_det AS INT) AS rn,
        |    CAST(NTILE(3) OVER w_det AS INT) AS bucket,
        |    CAST(RANK() OVER w_val AS INT) AS rnk,
        |    CAST(DENSE_RANK() OVER w_val AS INT) AS drnk,
        |    ROUND(PERCENT_RANK() OVER w_val, 6) AS pr,
        |    ROUND(CUME_DIST() OVER w_val, 6) AS cd
        |  FROM lineitem
        |  WINDOW
        |    w_det AS (PARTITION BY l_returnflag
        |              ORDER BY l_quantity DESC, l_orderkey, l_linenumber),
        |    w_val AS (PARTITION BY l_returnflag ORDER BY l_quantity DESC))
        |WHERE rn <= 8
        |ORDER BY l_returnflag, rn""".stripMargin,

    "q55_window_frames" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) OVER w_run AS DOUBLE)
        |    AS run_total,
        |  ROUND(
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) OVER w_mov AS DOUBLE)
        |      / COUNT(*) OVER w_mov, 6) AS mov_avg,
        |  COUNT(*) OVER w_range AS n_30d
        |FROM orders
        |WHERE o_custkey <= 200
        |WINDOW
        |  w_run AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |  w_mov AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
        |  w_range AS (PARTITION BY o_custkey
        |              ORDER BY CAST(FLOOR(EPOCH(o_orderdate)) AS BIGINT)
        |              RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q56_sql_subqueries" ->
      """SELECT c_custkey, c_name, c_acctbal
        |FROM customer c
        |WHERE EXISTS (
        |    SELECT 1 FROM orders o
        |    WHERE o.o_custkey = c.c_custkey
        |      AND o.o_orderpriority = '1-URGENT')
        |  AND c_acctbal > (
        |    SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(14,2))) AS DOUBLE)
        |             / COUNT(*)
        |    FROM customer c2
        |    WHERE c2.c_nationkey = c.c_nationkey)
        |ORDER BY c_custkey""".stripMargin,

    "q57_percentile_groups" ->
      """SELECT l_returnflag,
        |  ROUND(quantile_cont(l_quantity, 0.5), 6) AS qty_p50,
        |  ROUND(quantile_cont(l_extendedprice, 0.9), 6) AS price_p90,
        |  ROUND(median(l_discount), 6) AS disc_med
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q58_conditional_agg" ->
      """SELECT event_type,
        |  COUNT(*) FILTER (value > 50) AS n_high,
        |  CAST(COALESCE(SUM(CAST(value AS DECIMAL(14,2)))
        |    FILTER (value > 50), 0) AS DOUBLE) AS sum_high,
        |  COUNT(*) AS n
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    "q59_distinct_agg" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(DISTINCT l_suppkey) AS n_supps,
        |  CAST(SUM(DISTINCT CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE)
        |    AS sum_dist_qty,
        |  COUNT(*) AS n
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q60_array_agg" ->
      """SELECT user_id,
        |  array_to_string(list_sort(list(DISTINCT event_type)), ',')
        |    AS types,
        |  COUNT(DISTINCT event_type) AS n_types,
        |  COUNT(*) AS n_events
        |FROM events
        |WHERE user_id <= 300
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin,

    // Sketch audits: the oracle pins the EXACT value and asserts the
    // error envelope held (ok = true for every group) — the sketch
    // estimate itself is engine-specific and not oracle-portable.
    "q61_hll_audit" ->
      """SELECT o_orderpriority,
        |  COUNT(DISTINCT o_custkey) AS exact_n,
        |  TRUE AS ok
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q62_quantile_audit" ->
      """SELECT l_returnflag,
        |  ROUND(quantile_cont(l_extendedprice, 0.5), 6) AS exact_p50,
        |  TRUE AS ok
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q63_sketch_merge" ->
      """SELECT COUNT(DISTINCT c_custkey) AS exact_n, TRUE AS ok
        |FROM customer""".stripMargin,

    // Oracle is the EXACT n-gram-overlap contamination set — the
    // bloom is an internal prefilter with no effect on the result.
    "q64_bloom_decontaminate" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |), idx AS (
        |  SELECT doc_id, w, unnest(generate_series(1, len(w)-3)) AS i FROM toks
        |), sh AS (
        |  SELECT DISTINCT doc_id,
        |    w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] AS shingle
        |  FROM idx
        |), bench AS (
        |  SELECT DISTINCT shingle FROM sh WHERE doc_id % 50 = 0
        |)
        |SELECT DISTINCT s.doc_id
        |FROM sh s JOIN bench b USING (shingle)
        |WHERE s.doc_id % 50 <> 0
        |ORDER BY doc_id""".stripMargin,

    "q65_vocab_encode" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(string_split(text, ' ')) AS token,
        |    generate_subscripts(string_split(text, ' '), 1) AS pos
        |  FROM documents
        |), freq AS (
        |  SELECT token, COUNT(*) AS cnt FROM toks GROUP BY token
        |), vocab AS (
        |  SELECT token,
        |    CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, token) - 1 AS INT)
        |      AS token_id
        |  FROM freq ORDER BY cnt DESC, token LIMIT 500
        |), enc AS (
        |  SELECT t.doc_id, t.pos, COALESCE(v.token_id, -1) AS tid
        |  FROM toks t LEFT JOIN vocab v USING (token)
        |)
        |SELECT doc_id,
        |  string_agg(CAST(tid AS VARCHAR), ',' ORDER BY pos) AS ids,
        |  CAST(SUM(CASE WHEN tid = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
        |  COUNT(*) AS n_tokens
        |FROM enc GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q69_unpivot" ->
      """WITH agg AS (
        |  SELECT l_returnflag,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS qty,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE)
        |      AS price,
        |    CAST(SUM(CAST(l_discount AS DECIMAL(14,2))) AS DOUBLE) AS disc
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, metric, value
        |FROM agg
        |UNPIVOT (value FOR metric IN (qty, price, disc))
        |ORDER BY l_returnflag, metric""".stripMargin,

    "q70_time_buckets" ->
      """SELECT date_trunc('day', ts) AS day,
        |  CAST(EXTRACT(hour FROM ts) AS INT) AS hr,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_v
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY day, hr""".stripMargin,

    "q72_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS prev_ts
        |  FROM events
        |), f AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN prev_ts IS NOT NULL
        |          AND date_diff('microsecond', prev_ts, ts) > 1800000000
        |         THEN 1 ELSE 0 END AS gap_open
        |  FROM e
        |), g AS (
        |  SELECT user_id, ts,
        |    SUM(gap_open) OVER (PARTITION BY user_id
        |                        ORDER BY ts, event_id) + 1 AS session_seq
        |  FROM f
        |)
        |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
        |  COUNT(*) AS n_events,
        |  MIN(ts) AS session_start, MAX(ts) AS session_end,
        |  date_diff('microsecond', MIN(ts), MAX(ts)) AS dur_us
        |FROM g GROUP BY user_id, session_seq
        |ORDER BY user_id, session_seq""".stripMargin,

    "q125_temporal_dim_join" ->
      """WITH o AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    CASE WHEN lag(event_type) OVER
        |           (PARTITION BY user_id ORDER BY ts, event_id)
        |         IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS chg
        |  FROM events
        |), e2 AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS version_seq
        |  FROM o
        |), ep AS (
        |  SELECT user_id, CAST(version_seq AS BIGINT) AS version_seq,
        |    first(event_type ORDER BY ts, event_id) AS dim_type,
        |    min(ts) AS valid_from
        |  FROM e2 GROUP BY 1, 2
        |), dim AS (
        |  SELECT user_id, version_seq, dim_type,
        |    epoch_us(valid_from) AS vs,
        |    COALESCE(epoch_us(lead(valid_from) OVER (
        |        PARTITION BY user_id ORDER BY version_seq)),
        |      epoch_us(TIMESTAMP '2024-02-01 00:00:00')) AS ve
        |  FROM ep
        |)
        |SELECT d.version_seq, count(*) AS n_events,
        |  CAST(SUM(CASE WHEN ev.event_type = d.dim_type THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_matching
        |FROM events ev
        |JOIN dim d ON d.user_id = ev.user_id
        |  AND epoch_us(ev.ts) >= d.vs AND epoch_us(ev.ts) < d.ve
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // Brute-force overlap oracle: every (session, window) pair tested
    // directly, so a bin-dedup bug (pair emitted 0 or 2 times) in the
    // Spark side mismatches.
    "q124_interval_overlap" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS prev_ts
        |  FROM events
        |), f AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN prev_ts IS NOT NULL
        |          AND date_diff('microsecond', prev_ts, ts) > 1800000000
        |         THEN 1 ELSE 0 END AS gap_open
        |  FROM e
        |), g AS (
        |  SELECT user_id, ts,
        |    SUM(gap_open) OVER (PARTITION BY user_id
        |                        ORDER BY ts, event_id) + 1 AS session_seq
        |  FROM f
        |), s AS (
        |  SELECT user_id, epoch_us(MIN(ts)) AS ls,
        |    epoch_us(MAX(ts)) + 1 AS le
        |  FROM g GROUP BY user_id, session_seq
        |), w AS (
        |  SELECT CAST(d AS BIGINT) AS day,
        |    epoch_us(TIMESTAMP '2024-01-01 02:00:00') + d * 86400000000
        |      AS rs,
        |    epoch_us(TIMESTAMP '2024-01-01 02:00:00') + d * 86400000000
        |      + 7200000000 AS re
        |  FROM (SELECT unnest(generate_series(0, 29)) AS d)
        |)
        |SELECT w.day, count(*) AS n_sessions,
        |  count(DISTINCT s.user_id) AS n_users
        |FROM s JOIN w ON s.ls < w.re AND w.rs < s.le
        |GROUP BY w.day ORDER BY w.day""".stripMargin,

    "q116_peak_concurrency" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS prev_ts
        |  FROM events
        |), f AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN prev_ts IS NOT NULL
        |          AND date_diff('microsecond', prev_ts, ts) > 1800000000
        |         THEN 1 ELSE 0 END AS gap_open
        |  FROM e
        |), g AS (
        |  SELECT user_id, ts,
        |    SUM(gap_open) OVER (PARTITION BY user_id
        |                        ORDER BY ts, event_id) + 1 AS session_seq
        |  FROM f
        |), s AS (
        |  SELECT MIN(ts) AS st, MAX(ts) AS en
        |  FROM g GROUP BY user_id, session_seq
        |), d AS (
        |  SELECT epoch_us(st) * 2 AS k, 1 AS delta FROM s
        |  UNION ALL
        |  SELECT epoch_us(en) * 2 + 1 AS k, -1 AS delta FROM s
        |), n AS (
        |  SELECT k, SUM(delta) AS net,
        |    SUM(CASE WHEN delta > 0 THEN 1 ELSE 0 END) AS starts
        |  FROM d GROUP BY k
        |), r AS (
        |  SELECT k, starts,
        |    SUM(net) OVER (ORDER BY k ROWS UNBOUNDED PRECEDING) AS run
        |  FROM n
        |)
        |SELECT make_timestamp((k // 2) // 3600000000 * 3600000000)
        |    AS bucket_start,
        |  CAST(MAX(run) AS BIGINT) AS peak_concurrent,
        |  CAST(SUM(starts) AS BIGINT) AS n_started
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,

    "q97_debounce" ->
      """WITH e AS (
        |  SELECT user_id, event_type, event_id, ts,
        |    lag(ts) OVER (PARTITION BY user_id, event_type
        |                  ORDER BY ts, event_id) AS prev_ts
        |  FROM events
        |), f AS (
        |  SELECT user_id, event_type, event_id, ts,
        |    CASE WHEN prev_ts IS NOT NULL
        |          AND date_diff('microsecond', prev_ts, ts) > 300000000
        |         THEN 1 ELSE 0 END AS nb
        |  FROM e
        |), g AS (
        |  SELECT user_id, event_type, event_id, ts,
        |    SUM(nb) OVER (PARTITION BY user_id, event_type
        |                  ORDER BY ts, event_id) + 1 AS burst_seq
        |  FROM f
        |), r AS (
        |  SELECT *, row_number() OVER (
        |      PARTITION BY user_id, event_type, burst_seq
        |      ORDER BY ts, event_id) AS rn
        |  FROM g
        |)
        |SELECT user_id, event_type, CAST(burst_seq AS BIGINT) AS burst_seq,
        |  MIN(CASE WHEN rn = 1 THEN event_id END) AS kept_event_id,
        |  MIN(ts) AS first_ts, MAX(ts) AS last_ts, COUNT(*) AS n_events
        |FROM r GROUP BY user_id, event_type, burst_seq
        |ORDER BY user_id, event_type, burst_seq""".stripMargin,

    "q67_full_outer" ->
      """WITH a AS (
        |  SELECT o_orderkey, o_totalprice AS price_a
        |  FROM orders WHERE o_orderkey % 2 = 0),
        |b AS (
        |  SELECT o_orderkey, o_totalprice AS price_b
        |  FROM orders WHERE o_orderkey % 3 = 0)
        |SELECT o_orderkey,
        |  CASE WHEN price_a IS NOT NULL AND price_b IS NOT NULL THEN 'both'
        |       WHEN price_a IS NOT NULL THEN 'a_only'
        |       ELSE 'b_only' END AS side,
        |  COALESCE(price_a, price_b) AS price
        |FROM a FULL JOIN b USING (o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,

    // DuckDB's unnest drops empty lists; the [NULL] substitution
    // emulates Spark's explode_outer row-preserving semantics.
    "q68_flatten_outer" ->
      """WITH l AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), t -> len(t) > 8) AS toks
        |  FROM documents)
        |SELECT doc_id,
        |  unnest(CASE WHEN len(toks) = 0 THEN [NULL] ELSE toks END) AS token
        |FROM l
        |ORDER BY doc_id, token NULLS FIRST""".stripMargin,

    "q66_json_typed_agg" ->
      """SELECT event_type,
        |  CAST(SUM(CAST(props->>'k' AS INT)) AS BIGINT) AS sum_k,
        |  COUNT(CAST(props->>'k' AS INT)) AS n_k,
        |  MAX(CAST(props->>'k' AS INT)) AS max_k
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    "q76_funnel" ->
      """WITH s0 AS (
        |  SELECT user_id, min(ts) AS t0 FROM events
        |  WHERE event_type = 'view' GROUP BY 1
        |), s1 AS (
        |  SELECT e.user_id, min(e.ts) AS t1, min(s0.t0) AS t0
        |  FROM events e JOIN s0 USING (user_id)
        |  WHERE e.event_type = 'click' AND e.ts > s0.t0
        |    AND epoch_us(e.ts) <= epoch_us(s0.t0) + 604800000000
        |  GROUP BY 1
        |), s2 AS (
        |  SELECT e.user_id, min(e.ts) AS t2
        |  FROM events e JOIN s1 USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts > s1.t1
        |    AND epoch_us(e.ts) <= epoch_us(s1.t0) + 604800000000
        |  GROUP BY 1
        |)
        |SELECT * FROM (
        |  SELECT 0 AS step, 'view' AS event_type,
        |    (SELECT count(*) FROM s0) AS n_users
        |  UNION ALL SELECT 1, 'click', (SELECT count(*) FROM s1)
        |  UNION ALL SELECT 2, 'purchase', (SELECT count(*) FROM s2))
        |ORDER BY step""".stripMargin,

    // Mirrors Funnel.touchAttribution: RANGE frame over µs epochs,
    // min/max over a named (us, id) struct — the ENGINE's exact
    // struct tie rule (arg_min keyed on us alone picks an arbitrary
    // same-us touch) — NULL-val CASE skips non-touch rows,
    // unattributed conversions pin to -1.
    "q181_attribution" ->
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

    // Mirrors Funnel.linearAttribution: closed [conv−24h, conv]
    // window pairs, per-conversion equal credit split.
    "q182_attribution_linear" ->
      """WITH convs AS (
        |  SELECT user_id, event_id AS conv_id, value, epoch_us(ts) AS cs
        |  FROM events WHERE event_type = 'purchase'
        |), touches AS (
        |  SELECT user_id, event_id AS touch_id, event_type AS touch_type,
        |         epoch_us(ts) AS tus
        |  FROM events WHERE event_type IN ('view', 'click')
        |), pairs AS (
        |  SELECT c.user_id, c.conv_id, c.value, t.touch_id, t.touch_type
        |  FROM convs c JOIN touches t ON t.user_id = c.user_id
        |    AND t.tus >= c.cs - 86400000000 AND t.tus < c.cs + 1
        |)
        |SELECT user_id, conv_id, touch_id, touch_type,
        |  CAST(COUNT(*) OVER (PARTITION BY conv_id) AS BIGINT)
        |    AS n_touches,
        |  round(value / CAST(COUNT(*) OVER (PARTITION BY conv_id)
        |    AS DOUBLE), 6) + 0.0 AS credit
        |FROM pairs ORDER BY conv_id, touch_id""".stripMargin,

    "q77_retention" ->
      """WITH cohorts AS (
        |  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
        |  FROM events WHERE event_type = 'signup' GROUP BY 1
        |)
        |SELECT c.cohort_week,
        |  CAST(date_diff('day', c.cohort_week,
        |                 date_trunc('week', e.ts)) / 7 AS INT) AS week_offset,
        |  count(DISTINCT e.user_id) AS n_users
        |FROM events e JOIN cohorts c USING (user_id)
        |WHERE date_diff('day', c.cohort_week, date_trunc('week', e.ts))
        |      BETWEEN 0 AND 35
        |GROUP BY 1, 2
        |ORDER BY cohort_week, week_offset""".stripMargin,

    "q78_gap_fill" ->
      """WITH s AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day,
        |    CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS v
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
        |), span AS (
        |  SELECT user_id, min(day) AS d0, max(day) AS d1 FROM s GROUP BY 1
        |), cal AS (
        |  SELECT user_id,
        |    CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM span
        |)
        |SELECT c.user_id, c.day, s.v, s.v IS NOT NULL AS observed,
        |  last_value(s.v IGNORE NULLS)
        |    OVER (PARTITION BY c.user_id ORDER BY c.day) AS filled
        |FROM cal c LEFT JOIN s USING (user_id, day)
        |ORDER BY user_id, day""".stripMargin,

    "q79_fuzzy_blocked" ->
      """WITH names AS (
        |  SELECT p_name AS nm, min(p_partkey) AS id FROM part GROUP BY 1
        |), blocked AS (
        |  SELECT a.id AS id_a, a.nm AS name_a, b.id AS id_b, b.nm AS name_b,
        |    CAST(levenshtein(a.nm, b.nm) AS INT) AS dist
        |  FROM names a JOIN names b
        |    ON string_split(a.nm, ' ')[-1] = string_split(b.nm, ' ')[-1]
        |   AND a.id < b.id
        |)
        |SELECT * FROM blocked WHERE dist BETWEEN 1 AND 2
        |ORDER BY name_a, name_b""".stripMargin,

    "q80_merge_changelog" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |), changes AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice * 2 AS o_totalprice,
        |    'U' AS op FROM base WHERE o_orderkey % 100 = 3
        |  UNION ALL
        |  SELECT o_orderkey + 10000000, o_custkey, o_totalprice, 'U'
        |  FROM base WHERE o_orderkey % 100 = 7
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey, o_totalprice, 'D'
        |  FROM base WHERE o_orderkey % 100 = 11
        |)
        |SELECT * FROM (
        |  SELECT b.* FROM base b
        |  WHERE b.o_orderkey NOT IN (SELECT o_orderkey FROM changes)
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey, o_totalprice
        |  FROM changes WHERE op = 'U')
        |ORDER BY o_orderkey""".stripMargin,

    "q81_argmax" ->
      """SELECT user_id,
        |  arg_min(event_type, ts) AS first_type, min(ts) AS first_ts,
        |  arg_max(event_type, ts) AS last_type, max(ts) AS last_ts,
        |  count(*) AS n_events
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q82_histogram" ->
      """SELECT event_type,
        |  CAST(floor(value / 25.0) AS INT) AS bucket,
        |  count(*) AS n, min(value) AS lo, max(value) AS hi
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY event_type, bucket""".stripMargin,

    "q110_scd2_history" ->
      """WITH o AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    CASE WHEN lag(event_type) OVER
        |           (PARTITION BY user_id ORDER BY ts, event_id)
        |         IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS chg
        |  FROM events
        |), e AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS version_seq
        |  FROM o
        |), ep AS (
        |  SELECT user_id, CAST(version_seq AS BIGINT) AS version_seq,
        |    first(event_type ORDER BY ts, event_id) AS event_type,
        |    min(ts) AS valid_from, count(*) AS n_updates
        |  FROM e GROUP BY 1, 2
        |)
        |SELECT user_id, version_seq, event_type, valid_from, n_updates,
        |  lead(valid_from) OVER (PARTITION BY user_id ORDER BY version_seq)
        |    AS valid_to,
        |  (lead(valid_from) OVER (PARTITION BY user_id ORDER BY version_seq)
        |    IS NULL) AS is_current
        |FROM ep ORDER BY user_id, version_seq""".stripMargin,

    // Path fold replayed with ordered string_agg; same (ts, event_id)
    // step cut, same (n desc, path) top-k tiebreak.
    "q210_top_paths" ->
      """WITH s AS (
        |  SELECT user_id, event_type,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS rn
        |  FROM events
        |), p AS (
        |  SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
        |  FROM s WHERE rn <= 8 GROUP BY user_id
        |)
        |SELECT path, CAST(count(*) AS BIGINT) AS n_users
        |FROM p GROUP BY path
        |ORDER BY n_users DESC, path LIMIT 20""".stripMargin,

    // Survivorship replay: the SAME window program — full-frame
    // last_value IGNORE NULLS per field over (ts, event_id), keep
    // the last physical row per key.
    "q206_golden_record" ->
      """WITH f AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN event_type <> 'error' THEN value END AS value,
        |    CASE WHEN event_type <> 'signup' THEN props END AS props,
        |    event_type
        |  FROM events
        |), w AS (
        |  SELECT user_id,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY user_id) AS n,
        |    last_value(value IGNORE NULLS) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |      AS value,
        |    last_value(props IGNORE NULLS) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |      AS props,
        |    last_value(event_type IGNORE NULLS) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |      AS event_type
        |  FROM f
        |)
        |SELECT user_id, CAST(n AS BIGINT) AS n_versions,
        |  value, props, event_type
        |FROM w WHERE rn = n ORDER BY user_id""".stripMargin,

    "q113_snapshot_diff" ->
      """WITH s1 AS (
        |  SELECT user_id, count(*) AS n_events,
        |    max(CASE WHEN rn = 1 THEN value END) AS last_value
        |  FROM (SELECT user_id, value, event_id,
        |          row_number() OVER (PARTITION BY user_id
        |            ORDER BY ts DESC, event_id DESC) AS rn
        |        FROM events
        |        WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'
        |          AND ts <  TIMESTAMP '2024-01-15 00:00:00')
        |  GROUP BY user_id
        |), s2 AS (
        |  SELECT user_id, count(*) AS n_events,
        |    max(CASE WHEN rn = 1 THEN value END) AS last_value
        |  FROM (SELECT user_id, value, event_id,
        |          row_number() OVER (PARTITION BY user_id
        |            ORDER BY ts DESC, event_id DESC) AS rn
        |        FROM events
        |        WHERE ts >= TIMESTAMP '2024-01-15 00:00:00'
        |          AND ts <  TIMESTAMP '2024-01-22 00:00:00')
        |  GROUP BY user_id
        |)
        |SELECT COALESCE(s1.user_id, s2.user_id) AS user_id,
        |  CASE WHEN s1.user_id IS NULL THEN 'added'
        |       WHEN s2.user_id IS NULL THEN 'removed'
        |       WHEN s1.n_events = s2.n_events
        |         AND s1.last_value IS NOT DISTINCT FROM s2.last_value
        |         THEN 'stable'
        |       ELSE 'changed' END AS status,
        |  s1.n_events AS old_n_events, s1.last_value AS old_last_value,
        |  s2.n_events AS new_n_events, s2.last_value AS new_last_value
        |FROM s1 FULL OUTER JOIN s2 ON s2.user_id = s1.user_id
        |ORDER BY 1""".stripMargin,

    "q108_equidepth_hist" ->
      """WITH b AS (
        |  SELECT event_type, value,
        |    CAST(ntile(10) OVER (PARTITION BY event_type
        |      ORDER BY value, event_id) AS INT) AS bucket
        |  FROM events
        |)
        |SELECT event_type, bucket, count(*) AS n,
        |  min(value) AS lo, max(value) AS hi
        |FROM b GROUP BY event_type, bucket
        |ORDER BY event_type, bucket""".stripMargin,

    // The sketch itself is not reproducible in DuckDB; the oracle
    // pins the exact counts and demands the envelope verdict hold.
    "q83_cms_audit" ->
      """SELECT event_type, count(*) AS exact_n, TRUE AS ok
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q85_quality_audit" ->
      """WITH orphans AS (
        |  SELECT COUNT(*) AS n FROM orders o
        |  LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
        |    ON o.o_custkey = c.c_custkey
        |  WHERE c.c_custkey IS NULL
        |)
        |SELECT * FROM (
        |  SELECT 'not_null:o_orderdate' AS check_name,
        |    round(CAST(AVG(CASE WHEN o_orderdate IS NULL THEN 1.0
        |      ELSE 0.0 END) AS DOUBLE), 6) AS metric,
        |    AVG(CASE WHEN o_orderdate IS NULL THEN 1.0 ELSE 0.0 END) = 0.0
        |      AS ok
        |  FROM orders
        |  UNION ALL
        |  SELECT 'unique:o_orderkey',
        |    round(CAST(COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey)
        |      AS DOUBLE), 6),
        |    COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey) = 0
        |  FROM orders
        |  UNION ALL
        |  SELECT 'range:o_totalprice[0.0,400000.0]',
        |    round(CAST(SUM(CASE WHEN o_totalprice < 0.0
        |      OR o_totalprice > 400000.0 THEN 1 ELSE 0 END) AS DOUBLE), 6),
        |    SUM(CASE WHEN o_totalprice < 0.0 OR o_totalprice > 400000.0
        |      THEN 1 ELSE 0 END) = 0
        |  FROM orders
        |  UNION ALL
        |  SELECT 'min_rows:1', round(CAST(COUNT(*) AS DOUBLE), 6),
        |    COUNT(*) >= 1
        |  FROM orders
        |  UNION ALL
        |  SELECT 'fk:o_custkey', round(CAST(n AS DOUBLE), 6), n = 0
        |  FROM orphans
        |) ORDER BY check_name""".stripMargin,

    "q91_transitions" ->
      """WITH o AS (
        |  SELECT user_id, event_type,
        |    lag(event_type) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        |  FROM events
        |)
        |SELECT prev_type, event_type AS next_type, count(*) AS n
        |FROM o WHERE prev_type IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // The running HLL union is not reproducible in DuckDB; the oracle
    // pins the exact cumulative counts and demands the audit hold.
    "q90_cumulative_users" ->
      """WITH ev AS (
        |  SELECT date_trunc('day', ts) AS day, user_id FROM events
        |), fd AS (
        |  SELECT user_id, min(day) AS day FROM ev GROUP BY 1
        |), nu AS (
        |  SELECT day, count(*) AS new_users FROM fd GROUP BY 1
        |), days AS (
        |  SELECT DISTINCT day FROM ev
        |)
        |SELECT d.day,
        |  CAST(SUM(COALESCE(nu.new_users, 0))
        |    OVER (ORDER BY d.day ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |    AS cum_users,
        |  TRUE AS ok
        |FROM days d LEFT JOIN nu ON nu.day = d.day
        |ORDER BY d.day""".stripMargin,

    "q88_drift_psi" ->
      """WITH bb AS (
        |  SELECT CAST(least(greatest(
        |      floor((o_totalprice - 0.0) / 25000.0), 0.0), 19.0) AS INT)
        |    AS bucket, count(*) AS n_base
        |  FROM orders WHERE o_orderkey % 2 = 0 GROUP BY 1
        |), cb AS (
        |  SELECT CAST(least(greatest(
        |      floor((o_totalprice - 0.0) / 25000.0), 0.0), 19.0) AS INT)
        |    AS bucket, count(*) AS n_cur
        |  FROM orders WHERE o_orderkey % 2 = 1 GROUP BY 1
        |), j AS (
        |  SELECT COALESCE(bb.bucket, cb.bucket) AS bucket,
        |    COALESCE(n_base, 0) AS n_base, COALESCE(n_cur, 0) AS n_cur
        |  FROM bb FULL OUTER JOIN cb ON bb.bucket = cb.bucket
        |), t AS (
        |  SELECT bucket, n_base, n_cur,
        |    greatest(CAST(n_base AS DOUBLE)
        |      / CAST((SELECT SUM(n_base) FROM j) AS DOUBLE), 1e-6) AS p,
        |    greatest(CAST(n_cur AS DOUBLE)
        |      / CAST((SELECT SUM(n_cur) FROM j) AS DOUBLE), 1e-6) AS q
        |  FROM j
        |)
        |SELECT bucket, n_base, n_cur,
        |  round((p - q) * ln(p / q), 6) AS psi_contrib
        |FROM t ORDER BY bucket""".stripMargin,

    "q130_jw_histogram" ->
      """WITH p0 AS (
        |  SELECT p_partkey, p_name, string_split(p_name, ' ')[1] AS blk,
        |    row_number() OVER (PARTITION BY string_split(p_name, ' ')[1]
        |      ORDER BY p_partkey) AS bn
        |  FROM part WHERE p_size <= 5
        |), p AS (
        |  SELECT p_partkey, p_name, blk FROM p0 WHERE bn <= 500
        |), j AS (
        |  SELECT jaro_winkler_similarity(a.p_name, b.p_name) AS jw
        |  FROM p a JOIN p b ON b.blk = a.blk AND a.p_partkey < b.p_partkey
        |)
        |SELECT floor(jw * 20) / 20.0 AS band, count(*) AS n_pairs
        |FROM j WHERE jw >= 0.8
        |GROUP BY 1 ORDER BY band""".stripMargin,

    // The overlap_pairs the Spark side MEASURES from the written files
    // is asserted against the literal 0 the layout contract promises;
    // rows/span/checksums are recomputed from the source table.
    "q131_range_layout" ->
      """SELECT CAST(count(*) AS BIGINT) AS total_rows,
        |  min(l_orderkey) AS min_key, max(l_orderkey) AS max_key,
        |  CAST(0 AS BIGINT) AS overlap_pairs
        |FROM lineitem""".stripMargin,

    // K18: exact per-predicate match counts from the source table +
    // the promised invariants (narrow/empty predicates prune, the
    // full-table one does not, boundary bound holds on a disjoint
    // layout).
    "q307_pruning_audit" ->
      """WITH m AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS rows_total,
        |    CAST(SUM(CASE WHEN l_orderkey BETWEEN 1 AND 100
        |      THEN 1 ELSE 0 END) AS BIGINT) AS m0,
        |    CAST(SUM(CASE WHEN l_orderkey BETWEEN 500 AND 1500
        |      THEN 1 ELSE 0 END) AS BIGINT) AS m1,
        |    CAST(SUM(CASE WHEN l_orderkey BETWEEN 1 AND 2000000000
        |      THEN 1 ELSE 0 END) AS BIGINT) AS m2,
        |    CAST(SUM(CASE WHEN l_orderkey
        |      BETWEEN 3000000000 AND 3000000100
        |      THEN 1 ELSE 0 END) AS BIGINT) AS m3
        |  FROM lineitem
        |)
        |SELECT * FROM (
        |  SELECT CAST(1 AS BIGINT) AS pred_lo,
        |    CAST(100 AS BIGINT) AS pred_hi, rows_total,
        |    m0 AS rows_matching, TRUE AS pruned_any,
        |    TRUE AS boundary_bound_ok FROM m
        |  UNION ALL
        |  SELECT 500, 1500, rows_total, m1, TRUE, TRUE FROM m
        |  UNION ALL
        |  SELECT 1, 2000000000, rows_total, m2, FALSE, TRUE FROM m
        |  UNION ALL
        |  SELECT 3000000000, 3000000100, rows_total, m3, TRUE, TRUE
        |  FROM m
        |) ORDER BY pred_lo, pred_hi""".stripMargin,

    "q132_zorder_layout" ->
      """SELECT CAST(count(*) AS BIGINT) AS total_rows,
        |  CAST(sum(p_partkey) AS BIGINT) AS sum_partkey,
        |  CAST(sum(p_size) AS BIGINT) AS sum_size,
        |  CAST(0 AS BIGINT) AS overlap_pairs
        |FROM part""".stripMargin,

    "q133_compaction" ->
      """SELECT CAST(count(*) AS BIGINT) AS total_rows,
        |  CAST(sum(l_orderkey) AS BIGINT) AS sum_orderkey,
        |  TRUE AS files_reduced
        |FROM lineitem""".stripMargin,

    // Source-derivable invariants only (the q131–q134 write-path
    // rule): file bytes = UTF-8 text bytes + the text writer's
    // trailing newline; digest = md5 over exactly those bytes.
    "q157_binary_ingest" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) + 1 AS BIGINT) AS n_bytes,
        |  md5(text || chr(10)) AS digest
        |FROM documents WHERE doc_id % 20 = 0 ORDER BY doc_id""".stripMargin,

    "q134_orc_roundtrip" ->
      """SELECT o_orderstatus,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
        |    AS sum_price,
        |  min(o_orderdate) AS min_date, max(o_orderdate) AS max_date
        |FROM orders
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q135_salted_agg" ->
      """SELECT event_type,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
        |    AS sum_value,
        |  min(value) AS min_value, max(value) AS max_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q136_bucketed_join" ->
      """SELECT c_mktsegment,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_price
        |FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q137_sql_registration" ->
      """WITH p0 AS (
        |  SELECT p_partkey, p_name, string_split(p_name, ' ')[1] AS blk,
        |    row_number() OVER (PARTITION BY string_split(p_name, ' ')[1]
        |      ORDER BY p_partkey) AS bn
        |  FROM part WHERE p_size = 1
        |), p AS (
        |  SELECT p_partkey, p_name, blk FROM p0 WHERE bn <= 200
        |), j AS (
        |  SELECT jaro_winkler_similarity(a.p_name, b.p_name) AS jw
        |  FROM p a JOIN p b ON b.blk = a.blk AND a.p_partkey < b.p_partkey
        |)
        |SELECT floor(jw * 20) / 20.0 AS band, count(*) AS n_pairs
        |FROM j WHERE jw >= 0.8
        |GROUP BY 1 ORDER BY band""".stripMargin,

    "q138_text_roundtrip" ->
      """SELECT lang,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_unique,
        |  CAST(sum(doc_id) AS BIGINT) AS sum_ids
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "q129_mode_per_key" ->
      """WITH c AS (
        |  SELECT user_id, event_type, count(*) AS n
        |  FROM events GROUP BY 1, 2
        |), r AS (
        |  SELECT user_id, event_type, n,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY n DESC, event_type DESC) AS rk,
        |    SUM(n) OVER (PARTITION BY user_id) AS n_events
        |  FROM c
        |)
        |SELECT user_id, event_type AS mode, n AS mode_n,
        |  CAST(n_events AS BIGINT) AS n_events,
        |  round(CAST(n AS DOUBLE) / n_events, 6) AS mode_share
        |FROM r WHERE rk = 1 ORDER BY user_id""".stripMargin,

    "q121_benford" ->
      """WITH c AS (
        |  SELECT CAST(regexp_extract(CAST(o_totalprice AS VARCHAR),
        |      '[1-9]', 0) AS INT) AS digit,
        |    count(*) AS n
        |  FROM orders
        |  WHERE o_totalprice IS NOT NULL
        |    AND regexp_extract(CAST(o_totalprice AS VARCHAR), '[1-9]', 0)
        |        <> ''
        |  GROUP BY 1
        |), t AS (SELECT CAST(SUM(n) AS DOUBLE) AS tot FROM c)
        |SELECT digit, n,
        |  round(CAST(n AS DOUBLE) / tot, 6) AS obs_share,
        |  round(log10(1.0 + 1.0 / digit), 6) AS exp_share,
        |  round((CAST(n AS DOUBLE) / tot - log10(1.0 + 1.0 / digit))
        |        * (CAST(n AS DOUBLE) / tot - log10(1.0 + 1.0 / digit))
        |        / log10(1.0 + 1.0 / digit), 6) AS chi2_contrib
        |FROM c, t ORDER BY digit""".stripMargin,

    // Mirrors Quality.weightedQuantiles: DECIMAL(28,6) weights,
    // multiplied-form rational thresholds, lower nearest-rank pick.
    // Presence filter is on the QUANTIZED micro-unit mass (matches
    // the operator's __wl > 0 guard — sub-micro weights carry no
    // mass and must not count as present).
    "q183_weighted_quantiles" ->
      """WITH prep AS (
        |  SELECT l_returnflag AS k, l_extendedprice AS v,
        |    CAST(l_quantity AS DECIMAL(28,6)) AS w
        |  FROM lineitem
        |  WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
        |    AND CAST(CAST(l_quantity AS DECIMAL(28,6)) * 1000000
        |             AS BIGINT) > 0
        |), cum AS (
        |  SELECT k, v, w,
        |    SUM(w) OVER (PARTITION BY k ORDER BY v
        |                 ROWS BETWEEN UNBOUNDED PRECEDING
        |                   AND CURRENT ROW) AS cw,
        |    SUM(w) OVER (PARTITION BY k) AS tw
        |  FROM prep
        |), agg AS (
        |  SELECT k,
        |    MIN(CASE WHEN cw * 100 >= tw * 25 THEN v END) AS q0,
        |    MIN(CASE WHEN cw * 10 >= tw * 5 THEN v END) AS q1,
        |    MIN(CASE WHEN cw * 10 >= tw * 9 THEN v END) AS q2,
        |    MIN(CASE WHEN cw * 100 >= tw * 99 THEN v END) AS q3,
        |    CAST(MAX(tw) AS DOUBLE) AS total_weight
        |  FROM cum GROUP BY k
        |)
        |SELECT k AS l_returnflag, CAST(quantile AS DOUBLE) AS quantile,
        |       value, total_weight
        |FROM (
        |  SELECT k, 0.25 AS quantile, q0 AS value, total_weight FROM agg
        |  UNION ALL SELECT k, 0.5, q1, total_weight FROM agg
        |  UNION ALL SELECT k, 0.9, q2, total_weight FROM agg
        |  UNION ALL SELECT k, 0.99, q3, total_weight FROM agg)
        |ORDER BY l_returnflag, quantile""".stripMargin,

    "q120_winsorize" ->
      """WITH r AS (
        |  SELECT event_type, value,
        |    row_number() OVER (PARTITION BY event_type ORDER BY value)
        |      AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM events WHERE value IS NOT NULL
        |), e AS (
        |  SELECT event_type, MIN(value) AS lo, MAX(value) AS hi
        |  FROM r
        |  WHERE rn = greatest(1, CAST(ceil(0.05 * n) AS BIGINT))
        |     OR rn = least(n, CAST(ceil(0.95 * n) AS BIGINT))
        |  GROUP BY event_type
        |)
        |SELECT v.event_type, count(*) AS n, MIN(e.lo) AS lo,
        |  MAX(e.hi) AS hi,
        |  CAST(SUM(CASE WHEN v.value < e.lo THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_clip_lo,
        |  CAST(SUM(CASE WHEN v.value > e.hi THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_clip_hi
        |FROM events v JOIN e ON e.event_type = v.event_type
        |WHERE v.value IS NOT NULL
        |GROUP BY v.event_type ORDER BY v.event_type""".stripMargin,

    // Mirrors TimeSeries.trendFit exactly: decimal co-moments per
    // key, then the identical double-op OLS finish.
    "q119_trend_fit" ->
      """WITH d AS (
        |  SELECT event_type,
        |    CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
        |      AS DECIMAL(18,2)) AS x,
        |    CAST(value AS DECIMAL(18,6)) AS y
        |  FROM events
        |), c AS (
        |  SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS n,
        |    CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
        |    CAST(SUM(x*y) AS DOUBLE) AS sxy, CAST(SUM(x*x) AS DOUBLE) AS sxx
        |  FROM d GROUP BY event_type
        |)
        |SELECT event_type, CAST(n AS BIGINT) AS n,
        |  CASE WHEN n >= 2 AND n*sxx - sx*sx > 0
        |       THEN round((n*sxy - sx*sy) / (n*sxx - sx*sx), 6) + 0.0
        |       END AS slope,
        |  CASE WHEN n >= 2 AND n*sxx - sx*sx > 0
        |       THEN round((sy - ((n*sxy - sx*sy) / (n*sxx - sx*sx)) * sx)
        |                  / n, 6) + 0.0 END AS intercept
        |FROM c ORDER BY event_type""".stripMargin,

    // Mirrors Profile.correlations exactly: decimal(18,2) co-moments,
    // then the identical double-op sequence per coefficient.
    "q118_correlation" ->
      """WITH d AS (
        |  SELECT CAST(l_quantity AS DECIMAL(18,2)) AS q,
        |    CAST(l_extendedprice AS DECIMAL(18,2)) AS e,
        |    CAST(l_discount AS DECIMAL(18,2)) AS di,
        |    CAST(l_tax AS DECIMAL(18,2)) AS tx
        |  FROM lineitem
        |), c AS (
        |  SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b,
        |    CAST(COUNT(*) AS DOUBLE) AS n,
        |    CAST(SUM(q) AS DOUBLE) AS sx, CAST(SUM(e) AS DOUBLE) AS sy,
        |    CAST(SUM(q*e) AS DOUBLE) AS sxy,
        |    CAST(SUM(q*q) AS DOUBLE) AS sxx,
        |    CAST(SUM(e*e) AS DOUBLE) AS syy FROM d
        |  UNION ALL
        |  SELECT 'l_quantity', 'l_discount', CAST(COUNT(*) AS DOUBLE),
        |    CAST(SUM(q) AS DOUBLE), CAST(SUM(di) AS DOUBLE),
        |    CAST(SUM(q*di) AS DOUBLE), CAST(SUM(q*q) AS DOUBLE),
        |    CAST(SUM(di*di) AS DOUBLE) FROM d
        |  UNION ALL
        |  SELECT 'l_quantity', 'l_tax', CAST(COUNT(*) AS DOUBLE),
        |    CAST(SUM(q) AS DOUBLE), CAST(SUM(tx) AS DOUBLE),
        |    CAST(SUM(q*tx) AS DOUBLE), CAST(SUM(q*q) AS DOUBLE),
        |    CAST(SUM(tx*tx) AS DOUBLE) FROM d
        |  UNION ALL
        |  SELECT 'l_extendedprice', 'l_discount', CAST(COUNT(*) AS DOUBLE),
        |    CAST(SUM(e) AS DOUBLE), CAST(SUM(di) AS DOUBLE),
        |    CAST(SUM(e*di) AS DOUBLE), CAST(SUM(e*e) AS DOUBLE),
        |    CAST(SUM(di*di) AS DOUBLE) FROM d
        |  UNION ALL
        |  SELECT 'l_extendedprice', 'l_tax', CAST(COUNT(*) AS DOUBLE),
        |    CAST(SUM(e) AS DOUBLE), CAST(SUM(tx) AS DOUBLE),
        |    CAST(SUM(e*tx) AS DOUBLE), CAST(SUM(e*e) AS DOUBLE),
        |    CAST(SUM(tx*tx) AS DOUBLE) FROM d
        |  UNION ALL
        |  SELECT 'l_discount', 'l_tax', CAST(COUNT(*) AS DOUBLE),
        |    CAST(SUM(di) AS DOUBLE), CAST(SUM(tx) AS DOUBLE),
        |    CAST(SUM(di*tx) AS DOUBLE), CAST(SUM(di*di) AS DOUBLE),
        |    CAST(SUM(tx*tx) AS DOUBLE) FROM d
        |)
        |SELECT col_a, col_b, CAST(n AS BIGINT) AS n,
        |  CASE WHEN n >= 2 AND n*sxx - sx*sx > 0 AND n*syy - sy*sy > 0
        |       THEN round((n*sxy - sx*sy)
        |                  / sqrt((n*sxx - sx*sx) * (n*syy - sy*sy)), 6)
        |            + 0.0
        |       END AS corr
        |FROM c ORDER BY col_a, col_b""".stripMargin,

    // Mirrors Profile.numeric exactly: decimal(18,2) accumulation,
    // then the identical double-op sequence for mean/std.
    "q86_profile" ->
      """WITH agg AS (
        |  SELECT
        |    CAST(COUNT(o_custkey) AS DOUBLE) AS "o_custkey|count",
        |    CAST(COUNT(*) - COUNT(o_custkey) AS DOUBLE) AS "o_custkey|nulls",
        |    CAST(COUNT(DISTINCT o_custkey) AS DOUBLE) AS "o_custkey|distinct",
        |    CAST(MIN(CAST(o_custkey AS DECIMAL(18,2))) AS DOUBLE)
        |      AS "o_custkey|min",
        |    CAST(MAX(CAST(o_custkey AS DECIMAL(18,2))) AS DOUBLE)
        |      AS "o_custkey|max",
        |    CAST(SUM(CAST(o_custkey AS DECIMAL(18,2))) AS DOUBLE)
        |      AS "o_custkey|sum",
        |    CAST(SUM(CAST(o_custkey AS DECIMAL(18,2))
        |           * CAST(o_custkey AS DECIMAL(18,2))) AS DOUBLE)
        |      AS "o_custkey|sumsq",
        |    CAST(COUNT(o_totalprice) AS DOUBLE) AS "o_totalprice|count",
        |    CAST(COUNT(*) - COUNT(o_totalprice) AS DOUBLE)
        |      AS "o_totalprice|nulls",
        |    CAST(COUNT(DISTINCT o_totalprice) AS DOUBLE)
        |      AS "o_totalprice|distinct",
        |    CAST(MIN(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |      AS "o_totalprice|min",
        |    CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |      AS "o_totalprice|max",
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |      AS "o_totalprice|sum",
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))
        |           * CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |      AS "o_totalprice|sumsq",
        |    CAST(COUNT(o_orderkey) AS DOUBLE) AS "o_orderkey|count",
        |    CAST(COUNT(*) - COUNT(o_orderkey) AS DOUBLE)
        |      AS "o_orderkey|nulls",
        |    CAST(COUNT(DISTINCT o_orderkey) AS DOUBLE)
        |      AS "o_orderkey|distinct",
        |    CAST(MIN(CAST(o_orderkey AS DECIMAL(18,2))) AS DOUBLE)
        |      AS "o_orderkey|min",
        |    CAST(MAX(CAST(o_orderkey AS DECIMAL(18,2))) AS DOUBLE)
        |      AS "o_orderkey|max",
        |    CAST(SUM(CAST(o_orderkey AS DECIMAL(18,2))) AS DOUBLE)
        |      AS "o_orderkey|sum",
        |    CAST(SUM(CAST(o_orderkey AS DECIMAL(18,2))
        |           * CAST(o_orderkey AS DECIMAL(18,2))) AS DOUBLE)
        |      AS "o_orderkey|sumsq"
        |  FROM orders
        |), stats AS (
        |  SELECT split_part(k, '|', 1) AS col_name, v,
        |    split_part(k, '|', 2) AS raw_stat
        |  FROM (UNPIVOT agg ON COLUMNS(*) INTO NAME k VALUE v)
        |), wide AS (
        |  SELECT col_name,
        |    MAX(CASE WHEN raw_stat = 'count' THEN v END) AS cnt,
        |    MAX(CASE WHEN raw_stat = 'nulls' THEN v END) AS nulls,
        |    MAX(CASE WHEN raw_stat = 'distinct' THEN v END) AS dst,
        |    MAX(CASE WHEN raw_stat = 'min' THEN v END) AS mn,
        |    MAX(CASE WHEN raw_stat = 'max' THEN v END) AS mx,
        |    MAX(CASE WHEN raw_stat = 'sum' THEN v END) AS s1,
        |    MAX(CASE WHEN raw_stat = 'sumsq' THEN v END) AS s2
        |  FROM stats GROUP BY col_name
        |)
        |SELECT col_name, stat, round(value, 6) AS value FROM (
        |  SELECT col_name, 'count' AS stat, cnt AS value FROM wide
        |  UNION ALL SELECT col_name, 'nulls', nulls FROM wide
        |  UNION ALL SELECT col_name, 'distinct', dst FROM wide
        |  UNION ALL SELECT col_name, 'min', mn FROM wide
        |  UNION ALL SELECT col_name, 'max', mx FROM wide
        |  UNION ALL SELECT col_name, 'mean', s1 / cnt FROM wide
        |  UNION ALL SELECT col_name, 'std',
        |    sqrt(greatest((s2 - s1 * s1 / cnt) / (cnt - 1), 0.0)) FROM wide
        |) ORDER BY col_name, stat""".stripMargin,

    // Mirrors Profile.categoricalAssociation: identical fixed double
    // op order per cell, DECIMAL(38,12) quantization before the sum.
    "q238_cube_diff" ->
      """WITH e AS (
        |  SELECT event_type,
        |    CAST(EXTRACT(day FROM ts) AS INT) % 7 AS day_bucket,
        |    CAST(floor(value * 1000000) AS BIGINT) AS m,
        |    (EXTRACT(day FROM ts) <= 15) AS in_a
        |  FROM events WHERE value IS NOT NULL
        |), c AS (
        |  SELECT event_type, day_bucket,
        |    CAST(grouping_id(event_type, day_bucket) AS INT) AS gid,
        |    CAST(SUM(CASE WHEN in_a THEN m ELSE 0 END) AS DECIMAL(38,0))
        |      AS ma,
        |    CAST(SUM(CASE WHEN in_a THEN 0 ELSE m END) AS DECIMAL(38,0))
        |      AS mb
        |  FROM e GROUP BY CUBE(event_type, day_bucket)
        |), d AS (
        |  SELECT *, mb - ma AS delta FROM c
        |), tot AS (
        |  SELECT delta AS tot FROM d WHERE gid = 3
        |)
        |SELECT event_type, day_bucket, gid,
        |  CAST(ma AS BIGINT) AS metric_a, CAST(mb AS BIGINT) AS metric_b,
        |  CAST(delta AS BIGINT) AS delta,
        |  CASE WHEN t.tot <> 0 THEN
        |    round(CAST(delta AS DOUBLE) / CAST(t.tot AS DOUBLE), 6) + 0.0
        |  END AS delta_share,
        |  CAST(row_number() OVER (PARTITION BY gid
        |    ORDER BY abs(delta) DESC,
        |      (coalesce(CAST(event_type AS VARCHAR), '')
        |        || coalesce(CAST(day_bucket AS VARCHAR), '')) ASC)
        |    AS INT) AS rank
        |FROM d CROSS JOIN tot t
        |ORDER BY gid, rank""".stripMargin,

    "q234_schema_evolution" ->
      """WITH g1 AS (
        |  SELECT COUNT(*) AS n, COUNT(doc_id) AS nd, COUNT(lang) AS nl
        |  FROM documents WHERE doc_id % 2 = 0
        |), g2 AS (
        |  SELECT COUNT(*) AS n, COUNT(doc_id) AS nd, COUNT(lang) AS nl,
        |    COUNT(source) AS ns, COUNT(n_chars) AS nc
        |  FROM documents WHERE doc_id % 2 = 1
        |)
        |SELECT gen, col_name, n_rows, n_nonnull FROM (
        |  SELECT 1 AS gen, 'doc_id' AS col_name,
        |    CAST(n AS BIGINT) AS n_rows, CAST(nd AS BIGINT) AS n_nonnull
        |  FROM g1
        |  UNION ALL SELECT 1, 'lang', CAST(n AS BIGINT),
        |    CAST(nl AS BIGINT) FROM g1
        |  UNION ALL SELECT 1, 'source', CAST(n AS BIGINT),
        |    CAST(0 AS BIGINT) FROM g1
        |  UNION ALL SELECT 1, 'n_chars', CAST(n AS BIGINT),
        |    CAST(0 AS BIGINT) FROM g1
        |  UNION ALL SELECT 2, 'doc_id', CAST(n AS BIGINT),
        |    CAST(nd AS BIGINT) FROM g2
        |  UNION ALL SELECT 2, 'lang', CAST(n AS BIGINT),
        |    CAST(nl AS BIGINT) FROM g2
        |  UNION ALL SELECT 2, 'source', CAST(n AS BIGINT),
        |    CAST(ns AS BIGINT) FROM g2
        |  UNION ALL SELECT 2, 'n_chars', CAST(n AS BIGINT),
        |    CAST(nc AS BIGINT) FROM g2
        |) ORDER BY gen, col_name""".stripMargin,

    "q233_fk_profile" ->
      """WITH c1 AS (
        |  SELECT l_orderkey AS v, COUNT(*) AS rows_
        |  FROM lineitem WHERE l_orderkey IS NOT NULL GROUP BY 1
        |), c2 AS (
        |  SELECT l_partkey AS v, COUNT(*) AS rows_
        |  FROM lineitem WHERE l_partkey IS NOT NULL GROUP BY 1
        |), c3 AS (
        |  SELECT o_custkey AS v, COUNT(*) AS rows_
        |  FROM orders WHERE o_custkey IS NOT NULL GROUP BY 1
        |), c4 AS (
        |  SELECT l_suppkey AS v, COUNT(*) AS rows_
        |  FROM lineitem WHERE l_suppkey IS NOT NULL GROUP BY 1
        |), j1 AS (
        |  SELECT c.rows_, p.o_orderkey IS NOT NULL AS hit
        |  FROM c1 c LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders
        |    WHERE o_orderkey IS NOT NULL) p ON p.o_orderkey = c.v
        |), j2 AS (
        |  SELECT c.rows_, p.p_partkey IS NOT NULL AS hit
        |  FROM c2 c LEFT JOIN (SELECT DISTINCT p_partkey FROM part
        |    WHERE p_partkey IS NOT NULL) p ON p.p_partkey = c.v
        |), j3 AS (
        |  SELECT c.rows_, p.c_custkey IS NOT NULL AS hit
        |  FROM c3 c LEFT JOIN (SELECT DISTINCT c_custkey FROM customer
        |    WHERE c_custkey IS NOT NULL) p ON p.c_custkey = c.v
        |), j4 AS (
        |  SELECT c.rows_, p.n_nationkey IS NOT NULL AS hit
        |  FROM c4 c LEFT JOIN (SELECT DISTINCT n_nationkey FROM nation
        |    WHERE n_nationkey IS NOT NULL) p ON p.n_nationkey = c.v
        |)
        |SELECT candidate, child_values, matched_values, orphan_values,
        |  orphan_rows,
        |  CASE WHEN child_values > 0 THEN
        |    round(CAST(matched_values AS DOUBLE) / child_values, 6) END
        |    AS inclusion
        |FROM (
        |  SELECT 'lineitem.l_orderkey->orders.o_orderkey' AS candidate,
        |    CAST(COUNT(*) AS BIGINT) AS child_values,
        |    CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT)
        |      AS matched_values,
        |    CAST(SUM(CASE WHEN hit THEN 0 ELSE 1 END) AS BIGINT)
        |      AS orphan_values,
        |    CAST(SUM(CASE WHEN hit THEN 0 ELSE rows_ END) AS BIGINT)
        |      AS orphan_rows
        |  FROM j1
        |  UNION ALL
        |  SELECT 'lineitem.l_partkey->part.p_partkey', CAST(COUNT(*) AS BIGINT),
        |    CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(SUM(CASE WHEN hit THEN 0 ELSE 1 END) AS BIGINT),
        |    CAST(SUM(CASE WHEN hit THEN 0 ELSE rows_ END) AS BIGINT)
        |  FROM j2
        |  UNION ALL
        |  SELECT 'orders.o_custkey->customer.c_custkey', CAST(COUNT(*) AS BIGINT),
        |    CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(SUM(CASE WHEN hit THEN 0 ELSE 1 END) AS BIGINT),
        |    CAST(SUM(CASE WHEN hit THEN 0 ELSE rows_ END) AS BIGINT)
        |  FROM j3
        |  UNION ALL
        |  SELECT 'lineitem.l_suppkey->nation.n_nationkey', CAST(COUNT(*) AS BIGINT),
        |    CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(SUM(CASE WHEN hit THEN 0 ELSE 1 END) AS BIGINT),
        |    CAST(SUM(CASE WHEN hit THEN 0 ELSE rows_ END) AS BIGINT)
        |  FROM j4
        |) ORDER BY candidate""".stripMargin,

    "q225_label_prop" ->
      """WITH toks AS (
        |  SELECT string_split(text, ' ') AS w FROM documents
        |), bgl AS (
        |  SELECT w, unnest(generate_series(1, len(w) - 1)) AS i
        |  FROM toks WHERE len(w) >= 2
        |), bg AS (
        |  SELECT w[i] AS a, w[i+1] AS b, count(*) AS cab
        |  FROM bgl GROUP BY 1, 2
        |), und AS MATERIALIZED (
        |  SELECT a, b, CAST(SUM(cab) AS BIGINT) AS w FROM (
        |    SELECT a, b, cab FROM bg WHERE a <> b
        |    UNION ALL
        |    SELECT b AS a, a AS b, cab FROM bg WHERE a <> b
        |  ) GROUP BY 1, 2
        |), l0 AS MATERIALIZED (
        |  SELECT DISTINCT a AS node, a AS lbl FROM und
        |), l1 AS MATERIALIZED (
        |  SELECT node, lbl FROM (
        |    SELECT g.node, g.nl AS lbl, row_number() OVER (
        |      PARTITION BY g.node ORDER BY g.s DESC, g.nl ASC) AS rn
        |    FROM (SELECT u.a AS node, l.lbl AS nl, SUM(u.w) AS s
        |          FROM und u JOIN l0 l ON l.node = u.b
        |          GROUP BY 1, 2) g
        |  ) WHERE rn = 1
        |), l2 AS MATERIALIZED (
        |  SELECT node, lbl FROM (
        |    SELECT g.node, g.nl AS lbl, row_number() OVER (
        |      PARTITION BY g.node ORDER BY g.s DESC, g.nl ASC) AS rn
        |    FROM (SELECT u.a AS node, l.lbl AS nl, SUM(u.w) AS s
        |          FROM und u JOIN l1 l ON l.node = u.b
        |          GROUP BY 1, 2) g
        |  ) WHERE rn = 1
        |), l3 AS MATERIALIZED (
        |  SELECT node, lbl FROM (
        |    SELECT g.node, g.nl AS lbl, row_number() OVER (
        |      PARTITION BY g.node ORDER BY g.s DESC, g.nl ASC) AS rn
        |    FROM (SELECT u.a AS node, l.lbl AS nl, SUM(u.w) AS s
        |          FROM und u JOIN l2 l ON l.node = u.b
        |          GROUP BY 1, 2) g
        |  ) WHERE rn = 1
        |), l4 AS MATERIALIZED (
        |  SELECT node, lbl FROM (
        |    SELECT g.node, g.nl AS lbl, row_number() OVER (
        |      PARTITION BY g.node ORDER BY g.s DESC, g.nl ASC) AS rn
        |    FROM (SELECT u.a AS node, l.lbl AS nl, SUM(u.w) AS s
        |          FROM und u JOIN l3 l ON l.node = u.b
        |          GROUP BY 1, 2) g
        |  ) WHERE rn = 1
        |)
        |SELECT node, lbl AS label FROM l4 ORDER BY node""".stripMargin,

    // G12: the q225 chain re-run to l4, then the modularity rollup —
    // exact integer intra/degree masses, HUGEINT numerator, one IEEE
    // division + round(6).
    "q302_modularity" ->
      """WITH toks AS (
        |  SELECT string_split(text, ' ') AS w FROM documents
        |), bgl AS (
        |  SELECT w, unnest(generate_series(1, len(w) - 1)) AS i
        |  FROM toks WHERE len(w) >= 2
        |), bg AS (
        |  SELECT w[i] AS a, w[i+1] AS b, count(*) AS cab
        |  FROM bgl GROUP BY 1, 2
        |), und AS MATERIALIZED (
        |  SELECT a, b, CAST(SUM(cab) AS BIGINT) AS w FROM (
        |    SELECT a, b, cab FROM bg WHERE a <> b
        |    UNION ALL
        |    SELECT b AS a, a AS b, cab FROM bg WHERE a <> b
        |  ) GROUP BY 1, 2
        |), l0 AS MATERIALIZED (
        |  SELECT DISTINCT a AS node, a AS lbl FROM und
        |), l1 AS MATERIALIZED (
        |  SELECT node, lbl FROM (
        |    SELECT g.node, g.nl AS lbl, row_number() OVER (
        |      PARTITION BY g.node ORDER BY g.s DESC, g.nl ASC) AS rn
        |    FROM (SELECT u.a AS node, l.lbl AS nl, SUM(u.w) AS s
        |          FROM und u JOIN l0 l ON l.node = u.b
        |          GROUP BY 1, 2) g
        |  ) WHERE rn = 1
        |), w2 AS (
        |  SELECT CAST(SUM(w) AS BIGINT) AS total_w FROM und
        |), comm AS (
        |  SELECT la.lbl AS label,
        |    CAST(COUNT(DISTINCT u.a) AS BIGINT) AS n_nodes,
        |    CAST(SUM(CASE WHEN la.lbl = lb.lbl THEN u.w ELSE 0 END)
        |      AS BIGINT) AS intra_w,
        |    CAST(SUM(u.w) AS BIGINT) AS deg_w
        |  FROM und u
        |  JOIN l1 la ON la.node = u.a
        |  JOIN l1 lb ON lb.node = u.b
        |  GROUP BY 1
        |)
        |SELECT c.label, c.n_nodes, c.intra_w, c.deg_w, w2.total_w,
        |  ROUND(CAST(c.intra_w::HUGEINT * w2.total_w::HUGEINT
        |      - c.deg_w::HUGEINT * c.deg_w::HUGEINT AS DOUBLE)
        |    / (CAST(w2.total_w AS DOUBLE) * CAST(w2.total_w AS DOUBLE)),
        |    6) AS q_contrib
        |FROM comm c CROSS JOIN w2
        |ORDER BY c.label""".stripMargin,

    "q224_fd_profile" ->
      """WITH kc AS (
        |  SELECT COUNT(DISTINCT o_orderpriority) AS nd1,
        |         COUNT(DISTINCT o_orderstatus) AS nd2
        |  FROM orders GROUP BY o_custkey
        |), ko AS (
        |  SELECT COUNT(DISTINCT o_orderstatus) AS nd
        |  FROM orders GROUP BY o_orderkey
        |), g1 AS (SELECT COUNT(*) AS cnt FROM orders
        |          GROUP BY o_custkey, o_orderdate),
        |g2 AS (SELECT COUNT(*) AS cnt FROM orders GROUP BY o_orderkey),
        |g3 AS (SELECT COUNT(*) AS cnt FROM orders
        |       GROUP BY o_orderpriority)
        |SELECT * FROM (
        |  SELECT 'fd' AS kind, 'o_custkey' AS lhs,
        |    'o_orderpriority' AS rhs, COUNT(*) AS n_keys,
        |    CAST(SUM(CASE WHEN nd1 > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS violations,
        |    MAX(nd1) AS max_fanout, MAX(nd1) <= 1 AS holds FROM kc
        |  UNION ALL
        |  SELECT 'fd', 'o_custkey', 'o_orderstatus', COUNT(*),
        |    CAST(SUM(CASE WHEN nd2 > 1 THEN 1 ELSE 0 END) AS BIGINT),
        |    MAX(nd2), MAX(nd2) <= 1 FROM kc
        |  UNION ALL
        |  SELECT 'fd', 'o_orderkey', 'o_orderstatus', COUNT(*),
        |    CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT),
        |    MAX(nd), MAX(nd) <= 1 FROM ko
        |  UNION ALL
        |  SELECT 'key', 'o_custkey,o_orderdate', '', COUNT(*),
        |    CAST(SUM(cnt - 1) AS BIGINT), MAX(cnt), MAX(cnt) = 1
        |  FROM g1
        |  UNION ALL
        |  SELECT 'key', 'o_orderkey', '', COUNT(*),
        |    CAST(SUM(cnt - 1) AS BIGINT), MAX(cnt), MAX(cnt) = 1
        |  FROM g2
        |  UNION ALL
        |  SELECT 'key', 'o_orderpriority', '', COUNT(*),
        |    CAST(SUM(cnt - 1) AS BIGINT), MAX(cnt), MAX(cnt) = 1
        |  FROM g3
        |) ORDER BY kind, lhs, rhs""".stripMargin,

    "q171_cat_association" ->
      """WITH jt AS (
        |  SELECT lang AS a, source AS b, COUNT(*) AS nab
        |  FROM documents
        |  WHERE lang IS NOT NULL AND source IS NOT NULL
        |  GROUP BY 1, 2
        |), ma AS (SELECT a, SUM(nab) AS na FROM jt GROUP BY a),
        |mb AS (SELECT b, SUM(nab) AS nb FROM jt GROUP BY b),
        |tot AS (
        |  SELECT SUM(nab) AS n, COUNT(DISTINCT a) AS r,
        |         COUNT(DISTINCT b) AS c
        |  FROM jt
        |), cells AS (
        |  SELECT
        |    CAST(round(
        |      (CAST(jt.nab AS DOUBLE) / CAST(t.n AS DOUBLE))
        |        * ln(CAST(jt.nab AS DOUBLE) * CAST(t.n AS DOUBLE)
        |             / (CAST(ma.na AS DOUBLE) * CAST(mb.nb AS DOUBLE))),
        |      12) AS DECIMAL(38,12)) AS mi_t,
        |    CAST(round(
        |      (CAST(jt.nab AS DOUBLE)
        |         - CAST(ma.na AS DOUBLE) * CAST(mb.nb AS DOUBLE)
        |           / CAST(t.n AS DOUBLE))
        |      * (CAST(jt.nab AS DOUBLE)
        |         - CAST(ma.na AS DOUBLE) * CAST(mb.nb AS DOUBLE)
        |           / CAST(t.n AS DOUBLE))
        |      / (CAST(ma.na AS DOUBLE) * CAST(mb.nb AS DOUBLE)
        |         / CAST(t.n AS DOUBLE))
        |      - CAST(ma.na AS DOUBLE) * CAST(mb.nb AS DOUBLE)
        |        / CAST(t.n AS DOUBLE),
        |      12) AS DECIMAL(38,12)) AS chi_t
        |  FROM jt JOIN ma USING (a) JOIN mb USING (b) CROSS JOIN tot t
        |), agg AS (
        |  SELECT
        |    (SELECT CAST(n AS BIGINT) FROM tot) AS n,
        |    (SELECT CAST(r AS INT) FROM tot) AS r,
        |    (SELECT CAST(c AS INT) FROM tot) AS c,
        |    SUM(mi_t) AS smi, SUM(chi_t) AS schi
        |  FROM cells
        |)
        |SELECT n, r, c,
        |  CAST((r - 1) * (c - 1) AS BIGINT) AS dof,
        |  round(CAST(smi AS DOUBLE), 6) + 0.0 AS mi,
        |  round(CAST(schi AS DOUBLE) + CAST(n AS DOUBLE), 6) AS chi2,
        |  CASE WHEN least(r, c) > 1 THEN
        |    round(sqrt(greatest(
        |      (CAST(schi AS DOUBLE) + CAST(n AS DOUBLE))
        |        / (CAST(n AS DOUBLE) * CAST(least(r, c) - 1 AS DOUBLE)),
        |      0.0)), 6)
        |  ELSE 0.0 END AS cramers_v
        |FROM agg""".stripMargin,

    // Everything here derives from the SOURCE table: n rows, dense
    // 1..n positions, the promised zero file-range overlaps, and the
    // R23 digest over (doc_id, text) — the write path must conserve
    // all of it bit-for-bit to hash-match.
    "q194_shard_export" ->
      """WITH n AS (
        |  SELECT count(*) AS c FROM documents
        |), h AS (
        |  SELECT CAST(('0x' || substr(md5(concat_ws(chr(1),
        |    CAST(doc_id AS VARCHAR), text)), 1, 15)) AS BIGINT) AS hv
        |  FROM documents
        |)
        |SELECT CAST(c AS BIGINT) AS total_rows,
        |  CAST(c AS BIGINT) AS distinct_pos,
        |  CAST(1 AS BIGINT) AS min_pos,
        |  CAST(c AS BIGINT) AS max_pos,
        |  CAST(0 AS BIGINT) AS overlap_pairs,
        |  (SELECT bit_xor(hv) FROM h) AS xor_hash,
        |  (SELECT CAST(CAST(SUM(CAST(hv AS DECIMAL(38,0)))
        |     AS DECIMAL(38,0)) AS VARCHAR) FROM h) AS sum_hash
        |FROM n""".stripMargin
  )
}
