package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.config.{ColumnSpec, EngineConfig}
import graft.operators.{Enrich, Flatten}
import graft.sources.IngestionEngine

/**
 * Relational / ETL-parity query registry: one driver-verified query per
 * operator family from SURVEY.md §2, expressed over the driver's
 * testdata tables. Every query here has a paired DuckDB oracle; both
 * sides share deterministic ORDER BY and exact (decimal-accumulated)
 * arithmetic so value hashes match across engines.
 */
object CoreQueries {

  def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.sources.Tables.load(s, dir, name)

  /** Window-lead next-event intervals — W1 over `events`
    * (user_id≈Origin, ts≈FlightTime, event_type≈Reporting_Airline). */
  def windowLead(s: SparkSession, dir: String): DataFrame = {
    val withNext = Enrich.addIntervals(
      t(s, dir, "events"),
      partitionCol = "user_id", timeCol = "ts",
      carrierCol = "event_type", tieBreak = Seq("event_id"))
    withNext
      .select(
        col("event_id"), col("user_id"), col("ts"),
        col("ts_next"), col("event_type_next").as("type_next"),
        col("diff_next"))
      .orderBy("event_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S1/P3/P4-style: scan → pushed filter → pruned projection.
    "q01_scan_filter_project" -> ((s, dir) => {
      t(s, dir, "events")
        .where(col("event_type") === "click" && col("value") > 50)
        .select("event_id", "user_id", "value")
        .orderBy("event_id")
    }),

    // A-class aggregation: map-side partial agg, decimal-exact sums.
    "q02_agg_pricing" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val dec = (c: String) => col(c).cast("decimal(12,2)")
      li.where(col("l_shipdate") <= lit("2001-01-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(dec("l_quantity")).cast("double").as("sum_qty"),
          sum(dec("l_extendedprice")).cast("double").as("sum_base_price"),
          sum(dec("l_extendedprice") * (lit(1).cast("decimal(12,2)") - dec("l_discount")))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // W1: per-key next-event interval (the reference's signature analytic).
    "q03_window_lead" -> windowLead _,

    // P1: recursive flatten over struct (from_json) + single-element array.
    "q04_flatten_struct" -> ((s, dir) => {
      val nested = t(s, dir, "events").select(
        col("event_id"),
        from_json(col("props"), lit("k BIGINT")).as("props"),
        array(struct(
          col("user_id").as("uid"),
          col("event_type").as("etype"))).as("tags"))
      Flatten.flatten(nested).orderBy("event_id")
    }),

    // P1 (round 10): flatten's opt-in MAP branch — the documented
    // improvement over the reference's silent map drop
    // (motor_ingesta.py:63-72). A synthetic map column (literal keys
    // over document attributes) explodes to attrs_key/attrs_value
    // rows while the sibling struct star-expands; default-mode drop
    // parity and strict-mode raise are FlattenSpec-pinned.
    "q261_flatten_map" -> ((s, dir) => {
      val src = t(s, dir, "documents").select(
        col("doc_id"),
        struct(col("n_chars"),
          length(col("text")).cast("long").as("text_len")).as("meta"),
        map(
          lit("lang"), col("lang"),
          lit("source"), col("source")).as("attrs"))
      Flatten.flatten(src, maps = "explode")
        .orderBy("doc_id", "attrs_key")
    }),

    // P1/F8: explode with position over a real array column.
    "q05_explode_tokens" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(
          col("doc_id"),
          posexplode(slice(split(col("text"), " "), 1, 5)).as(Seq("pos", "tok")))
        .orderBy("doc_id", "pos")
    }),

    // F1–F5: lpad/substr/concat local wall-clock build + per-row-zone
    // to_utc_timestamp (the reference's UTC enrichment, on events).
    "q06_utc_enrichment" -> ((s, dir) => {
      val base = t(s, dir, "events").select(
        col("event_id"),
        col("ts").cast("date").as("d"),
        ((col("user_id") % 24) * 100 + (col("event_id") % 60))
          .cast("int").as("dep_time"),
        when(col("user_id") % 3 === 0, "America/New_York")
          .when(col("user_id") % 3 === 1, "Europe/Madrid")
          .otherwise("Asia/Tokyo").as("tz"))
      val hhmm = lpad(col("dep_time").cast("string"), 4, "0")
      val localStr = concat(
        col("d").cast("string"), lit(" "),
        hhmm.substr(1, 2), lit(":"), hhmm.substr(3, 2))
      base
        .withColumn(
          "utc_ts",
          to_utc_timestamp(
            try_to_timestamp(localStr, lit("yyyy-MM-dd HH:mm")), col("tz")))
        .orderBy("event_id")
    }),

    // U1: unionByName with missing-column tolerance.
    "q07_union_by_name" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val a = o.select("o_orderkey", "o_totalprice", "o_orderstatus")
      val b = o.where(col("o_orderstatus") === "F")
        .select("o_orderkey", "o_orderdate")
      a.unionByName(b, allowMissingColumns = true)
        .orderBy(
          col("o_orderkey").asc,
          col("o_totalprice").asc_nulls_first,
          col("o_orderdate").asc_nulls_first)
    }),

    // The daily-stitch semantic (U1 + W1 recompute): yesterday's
    // boundary NULL `_next` rows get real successors from today.
    "q08_daily_stitch" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select("event_id", "user_id", "ts", "event_type")
      val day1 = ev.where(col("ts").cast("date") === lit("2024-01-05").cast("date"))
      val day2 = ev.where(col("ts").cast("date") === lit("2024-01-06").cast("date"))
      val prev = Enrich.addIntervals(
        day1, "user_id", "ts", "event_type", tieBreak = Seq("event_id"))
      val stitched = prev.unionByName(day2, allowMissingColumns = true)
      Enrich.addIntervals(stitched, "user_id", "ts", "event_type",
          tieBreak = Seq("event_id"))
        .select("event_id", "user_id", "ts", "ts_next", "diff_next")
        .orderBy("event_id")
    }),

    // J1: fact→dim left join + agg. No broadcast hint: `part` grows
    // with the data, so a forced broadcast is a scale-killer at 100×;
    // AQE still picks broadcast-hash when the build side is small.
    // The key keeps its historical "_broadcast" name ONLY for baseline
    // continuity (BENCH_r01/BASELINE track it) — the plan is NOT a
    // forced broadcast; at scale AQE may legitimately choose SMJ.
    "q09_join_broadcast" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val p = t(s, dir, "part")
      li.join(p, li("l_partkey") === p("p_partkey"), "left")
        .groupBy("p_brand")
        .agg(
          sum(col("l_extendedprice").cast("decimal(12,2)"))
            .cast("double").as("sum_price"),
          count(lit(1)).as("n"))
        .orderBy(col("p_brand").asc_nulls_first)
    }),

    // Multi-join: shuffle joins on the big sides, broadcast on the dim.
    "q10_multi_join_revenue" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy("n_name")
        .agg(
          sum((col("l_extendedprice").cast("decimal(12,2)") *
            (lit(1).cast("decimal(12,2)") - col("l_discount").cast("decimal(12,2)"))))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("n_name")
    }),

    // Left-semi join (EXISTS).
    "q11_semi_join" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").where(col("o_orderstatus") === "O")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    // Left-anti join (NOT EXISTS).
    "q12_anti_join" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    // A3/A4: deterministic top-k (sort + limit).
    "q13_topk_orders" -> ((s, dir) => {
      t(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(100)
    }),

    // A2/P4: SQL-string filter (`where("...")`) + `min` scalar
    // aggregates — the reference's validation idiom (notebook cells
    // 9/12/16: where("FlightTime is null"), min(FlightTime)).
    "q28_scalar_min" -> ((s, dir) => {
      t(s, dir, "orders")
        .where("o_orderstatus = 'F' AND o_totalprice IS NOT NULL")
        .agg(
          min(col("o_orderdate")).as("min_date"),
          min(col("o_totalprice")).as("min_price"),
          count(lit(1)).as("n"))
    }),

    // P2: config-driven coercion (cast + comment metadata) through
    // IngestionEngine.coerce — the reference's schema-fixing projection.
    "q14_config_coercion" -> ((s, dir) => {
      val cfg = EngineConfig(Seq(
        ColumnSpec("l_orderkey", "int", Some("Order key (narrowed)")),
        ColumnSpec("l_linenumber", "string", Some("Line number as text")),
        ColumnSpec("l_shipdate", "date", Some("Ship date (day precision)")),
        ColumnSpec("l_quantity", "double", Some("Quantity"))))
      new IngestionEngine(cfg).coerce(t(s, dir, "lineitem"))
        .orderBy("l_orderkey", "l_linenumber", "l_shipdate", "l_quantity")
    }),

    // S1→P1→P2 end-to-end: schema-inferred nested-JSON scan →
    // recursive flatten (struct star-expand + array explode, which
    // drops empty-array rows) → config coercion with try_cast
    // NULL-on-malformed. The committed fixture exercises every edge:
    // sibling struct + array, empty array, bad int, bad date.
    "q29_json_ingest" -> ((s, _) => {
      val cfg = EngineConfig.fromFile("/root/repo/fixtures/ingest_config.json")
      new IngestionEngine(cfg)
        .ingestFile(s, "/root/repo/fixtures/ingest_sample.json")
        .orderBy("flight_id", "leg_no")
    }),

    // S2→P2: header + schema-inferred CSV scan → same coercion.
    "q30_csv_ingest" -> ((s, _) => {
      val cfg = EngineConfig.fromFile("/root/repo/fixtures/ingest_config.json")
      new IngestionEngine(cfg)
        .ingestCsvFile(s, "/root/repo/fixtures/ingest_sample.csv")
        .orderBy("flight_id", "leg_no")
    }),

    // As-of join (operator Spark lacks natively): each event picks up
    // the latest prior "update" row per user — composed as tagged
    // union + ignoreNulls last() over one per-key window; a single
    // shuffle, no range nested-loop.
    "q36_asof_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val updates = ev.where(col("event_id") % 20 === 0)
        .groupBy("user_id", "ts")
        .agg(max("event_id").as("upd_id"))
      graft.operators.TemporalJoins.asofJoin(
          ev.select("event_id", "user_id", "ts"),
          updates, "user_id", "ts", Seq("upd_id"))
        .select("event_id", "user_id", "ts", "upd_id")
        .orderBy("event_id")
    }),

    // Range (interval) join via bin bucketing: points probe 1-hour
    // interval buckets on an equi-key instead of a nested-loop range
    // condition.
    "q37_range_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val points = ev.select(
        col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("__p"))
      val intervals = ev.where(col("event_id") % 25 === 0)
        .select(
          col("user_id"),
          unix_micros(col("ts")).as("__s"),
          (unix_micros(col("ts")) + 3600000000L).as("__e"),
          col("event_id").as("iv_id"))
      graft.operators.TemporalJoins.rangeJoin(
          points, intervals, "user_id", "__p", "__s", "__e",
          binWidth = 3600000000L)
        .select("event_id", "user_id", "iv_id")
        .orderBy("event_id", "iv_id")
    }),

    // Skew-salted equi-join: hot keys on the fact side spread over 2
    // salt buckets, dim side replicated 2× — row-identical to the
    // plain join (which is exactly what the oracle runs), only the
    // partitioning changes.
    "q32_salted_join" -> ((s, dir) => {
      val dec = (c: String) => col(c).cast("decimal(12,2)")
      val li = t(s, dir, "lineitem")
      val ord = t(s, dir, "orders")
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
      graft.operators.Skew.saltedEquiJoin(
          li, ord, Seq("l_orderkey"), saltParts = 2,
          saltSource = col("l_linenumber"))
        .groupBy("o_orderpriority")
        .agg(
          count(lit(1)).as("n_lines"),
          sum(dec("l_extendedprice")).cast("double").as("total_price"))
        .orderBy("o_orderpriority")
    }),

    // Join-key skew diagnostic: the top-20 hottest user keys with
    // their uniform-load multiple and the salt factor that feeds
    // q32's saltedEquiJoin — measure the skew, then turn the dial.
    "q96_skew_probe" -> ((s, dir) => {
      graft.operators.Skew.skewProbe(t(s, dir, "events"), "user_id", topK = 20)
        .orderBy(col("n_rows").desc, col("key"))
    }),

    // K14: exact join-size profile for the lineitem self-join on
    // l_partkey — the "how many pairs would this produce, and which
    // keys produce them" probe run BEFORE deciding to run (or salt,
    // or refuse) an n:m join. Two count aggs + key-cardinality join;
    // the hypothetical join itself never runs.
    "q193_join_size_profile" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      // `pairs` is the STRING rendering of the DECIMAL pair count
      // (q189 >64-bit digit rule) — sort on the numeric value, not
      // the string: lexicographic desc diverges from numeric desc the
      // moment the top-20 counts span digit lengths ('9' > '16').
      graft.operators.Skew.joinSizeProfile(
          li, "l_partkey", li, "l_partkey", topK = 20)
        .orderBy(
          col("pairs").cast(org.apache.spark.sql.types.DecimalType(38, 0))
            .desc,
          col("key"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q01_scan_filter_project" ->
      """SELECT event_id, user_id, value FROM events
        |WHERE event_type = 'click' AND value > 50
        |ORDER BY event_id""".stripMargin,

    "q02_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |       (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2001-01-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q03_window_lead" ->
      """SELECT event_id, user_id, ts, ts_next, type_next,
        |  CAST(FLOOR(EPOCH(ts_next)) - FLOOR(EPOCH(ts)) AS BIGINT) AS diff_next
        |FROM (
        |  SELECT event_id, user_id, ts,
        |    LEAD(ts) OVER w AS ts_next,
        |    LEAD(event_type) OVER w AS type_next
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |)
        |ORDER BY event_id""".stripMargin,

    "q04_flatten_struct" ->
      """SELECT event_id,
        |  CAST(props->>'$.k' AS BIGINT) AS k,
        |  user_id AS uid, event_type AS etype
        |FROM events
        |ORDER BY event_id""".stripMargin,

    // Literal map keys make the explode oracle-expressible: one
    // UNION ALL branch per key, in-branch values from the same row.
    "q261_flatten_map" ->
      """SELECT doc_id, n_chars, length(text) AS text_len,
        |  'lang' AS attrs_key, lang AS attrs_value
        |FROM documents
        |UNION ALL
        |SELECT doc_id, n_chars, length(text), 'source', source
        |FROM documents
        |ORDER BY doc_id, attrs_key""".stripMargin,

    "q05_explode_tokens" ->
      """SELECT doc_id,
        |  CAST(generate_subscripts(toks, 1) - 1 AS INT) AS pos,
        |  unnest(toks) AS tok
        |FROM (SELECT doc_id, string_split(text, ' ')[1:5] AS toks FROM documents)
        |ORDER BY doc_id, pos""".stripMargin,

    "q06_utc_enrichment" ->
      """SELECT event_id, d, dep_time, tz,
        |  make_timestamp(CAST(EPOCH(timezone(tz,
        |    strptime(strftime(d, '%Y-%m-%d') || ' ' ||
        |      substr(lpad(CAST(dep_time AS VARCHAR), 4, '0'), 1, 2) || ':' ||
        |      substr(lpad(CAST(dep_time AS VARCHAR), 4, '0'), 3, 2),
        |      '%Y-%m-%d %H:%M'))) * 1000000 AS BIGINT)) AS utc_ts
        |FROM (
        |  SELECT event_id, CAST(ts AS DATE) AS d,
        |    CAST((user_id % 24) * 100 + (event_id % 60) AS INT) AS dep_time,
        |    CASE WHEN user_id % 3 = 0 THEN 'America/New_York'
        |         WHEN user_id % 3 = 1 THEN 'Europe/Madrid'
        |         ELSE 'Asia/Tokyo' END AS tz
        |  FROM events)
        |ORDER BY event_id""".stripMargin,

    "q07_union_by_name" ->
      """(SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders)
        |UNION ALL BY NAME
        |(SELECT o_orderkey, o_orderdate FROM orders WHERE o_orderstatus = 'F')
        |ORDER BY o_orderkey, o_totalprice NULLS FIRST, o_orderdate NULLS FIRST""".stripMargin,

    "q08_daily_stitch" ->
      """WITH u AS (
        |  SELECT event_id, user_id, ts, event_type FROM events
        |  WHERE CAST(ts AS DATE) = DATE '2024-01-05'
        |     OR CAST(ts AS DATE) = DATE '2024-01-06'
        |)
        |SELECT event_id, user_id, ts, ts_next,
        |  CAST(FLOOR(EPOCH(ts_next)) - FLOOR(EPOCH(ts)) AS BIGINT) AS diff_next
        |FROM (
        |  SELECT event_id, user_id, ts,
        |    LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS ts_next
        |  FROM u)
        |ORDER BY event_id""".stripMargin,

    "q09_join_broadcast" ->
      """SELECT p_brand,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price,
        |  COUNT(*) AS n
        |FROM lineitem LEFT JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand
        |ORDER BY p_brand NULLS FIRST""".stripMargin,

    "q10_multi_join_revenue" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |       (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,

    "q11_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
        |ORDER BY c_custkey""".stripMargin,

    "q12_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q13_topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC
        |LIMIT 100""".stripMargin,

    "q28_scalar_min" ->
      """SELECT min(o_orderdate) AS min_date, min(o_totalprice) AS min_price,
        |  COUNT(*) AS n
        |FROM orders
        |WHERE o_orderstatus = 'F' AND o_totalprice IS NOT NULL""".stripMargin,

    "q14_config_coercion" ->
      """SELECT CAST(l_orderkey AS INT) AS l_orderkey,
        |  CAST(l_linenumber AS VARCHAR) AS l_linenumber,
        |  CAST(l_shipdate AS DATE) AS l_shipdate,
        |  l_quantity
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_shipdate, l_quantity""".stripMargin,

    "q29_json_ingest" ->
      """WITH flat AS (
        |  SELECT flight_id, origin.code AS code, origin.city AS city,
        |         unnest(legs, recursive := true),
        |         fdate, cancelled, delay
        |  FROM read_json_auto('/root/repo/fixtures/ingest_sample.json')
        |)
        |SELECT CAST(flight_id AS INT) AS flight_id, code, city,
        |  CAST(leg_no AS INT) AS leg_no, CAST(dist AS INT) AS dist,
        |  TRY_CAST(fdate AS DATE) AS fdate,
        |  CAST(cancelled AS BOOLEAN) AS cancelled,
        |  TRY_CAST(delay AS INT) AS delay
        |FROM flat ORDER BY flight_id, leg_no""".stripMargin,

    "q30_csv_ingest" ->
      """SELECT CAST(flight_id AS INT) AS flight_id, code, city,
        |  CAST(leg_no AS INT) AS leg_no, CAST(dist AS INT) AS dist,
        |  TRY_CAST(fdate AS DATE) AS fdate,
        |  CAST(cancelled AS BOOLEAN) AS cancelled,
        |  TRY_CAST(delay AS INT) AS delay
        |FROM read_csv('/root/repo/fixtures/ingest_sample.csv',
        |              header=true, all_varchar=true)
        |ORDER BY flight_id, leg_no""".stripMargin,

    "q36_asof_join" ->
      """WITH updates AS (
        |  SELECT user_id, ts, max(event_id) AS upd_id
        |  FROM events WHERE event_id % 20 = 0 GROUP BY user_id, ts
        |)
        |SELECT e.event_id, e.user_id, e.ts, u.upd_id
        |FROM events e ASOF LEFT JOIN updates u
        |  ON e.user_id = u.user_id AND e.ts >= u.ts
        |ORDER BY e.event_id""".stripMargin,

    "q37_range_join" ->
      """WITH iv AS (
        |  SELECT user_id, epoch_us(ts) AS s, epoch_us(ts) + 3600000000 AS e2,
        |         event_id AS iv_id
        |  FROM events WHERE event_id % 25 = 0
        |)
        |SELECT p.event_id, p.user_id, iv.iv_id
        |FROM events p JOIN iv ON p.user_id = iv.user_id
        |  AND epoch_us(p.ts) >= iv.s AND epoch_us(p.ts) < iv.e2
        |ORDER BY p.event_id, iv.iv_id""".stripMargin,

    "q32_salted_join" ->
      """SELECT o_orderpriority, COUNT(*) AS n_lines,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
        |    AS total_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q96_skew_probe" ->
      """WITH c AS (
        |  SELECT user_id AS key, COUNT(*) AS n_rows FROM events GROUP BY 1
        |), t AS (
        |  SELECT COUNT(*) AS total, COUNT(DISTINCT user_id) AS nd FROM events
        |), top AS (
        |  SELECT key, n_rows FROM c ORDER BY n_rows DESC, key LIMIT 20
        |)
        |SELECT key, n_rows,
        |  round(CAST(n_rows AS DOUBLE) / total, 6) AS share,
        |  round(CAST(n_rows AS DOUBLE) * nd / total, 3) AS uniform_multiple,
        |  CAST(greatest(ceil(CAST(n_rows AS DOUBLE) * nd / total), 1)
        |       AS BIGINT) AS suggested_salt
        |FROM top CROSS JOIN t
        |ORDER BY n_rows DESC, key""".stripMargin,

    "q193_join_size_profile" ->
      """WITH c AS (
        |  SELECT l_partkey AS key, COUNT(*) AS n FROM lineitem GROUP BY 1
        |), contrib AS (
        |  SELECT key, n AS n_left, n AS n_right,
        |    CAST(n AS DECIMAL(38,0)) * n AS p FROM c
        |), t AS (
        |  SELECT COALESCE(SUM(p), 0) AS total FROM contrib
        |)
        |SELECT key, n_left, n_right,
        |  CAST(CAST(p AS DECIMAL(38,0)) AS VARCHAR) AS pairs,
        |  round(CAST(p AS DOUBLE) / CAST(total AS DOUBLE), 6) AS share
        |FROM contrib CROSS JOIN t
        |ORDER BY p DESC, key LIMIT 20""".stripMargin
  )
}
