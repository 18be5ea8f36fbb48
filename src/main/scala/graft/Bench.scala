package graft
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Benchmark main: runs every registered query on
 * `SPARK_GRAFT_SF_DIR` and prints ONE JSON metric line (also written
 * to `target/bench.json` so the signal survives sbt log mangling).
 *
 * Measurement notes (VERDICT r1 "what's wrong" #1-3):
 *   - queries execute through the `noop` sink, so the FULL physical
 *     plan runs (sorts, limit-projections, expression eval) — a
 *     `count()` lets Catalyst eliminate exactly the expensive parts;
 *   - a full throwaway pass runs first, so the timed pass measures
 *     steady-state execution, not JVM/JIT/codegen warmup;
 *   - query order is sorted by name, deterministic across runs.
 */
object Bench {

  private def exec(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  /**
   * Ambient-load sentinel (r13 VERDICT ask #2): a FIXED, data-free,
   * constant-work probe — 2²⁸ codegen'd modular sums over 32
   * partitions, no IO, no shuffle beyond the final single-row
   * aggregate — timed at the start of each pass. Its wall time moves
   * ONLY with machine conditions (co-tenant load, CPU frequency,
   * scheduler pressure), never with registry growth or query
   * changes, so `sentinel_ratio` (min-of-passes vs the `__sentinel`
   * pin in BENCH_BASELINE.json) turns "ambient elevation" from a
   * narrative into a measured field: advisory tripwires carry the
   * ratio, and a flag under an elevated sentinel reads as load, not
   * drift. Three rounds (q283 real, q247 transient, four r13 flags)
   * spent real effort making that call by hand.
   */
  private def sentinelProbe(spark: SparkSession): Double = {
    import org.apache.spark.sql.functions._
    val t0 = System.nanoTime()
    spark.range(0L, 1L << 28, 1L, 32)
      .select(sum(pmod(col("id"), lit(997L)))).collect()
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // SPARK_GRAFT_CHECKPOINT_DIR=<dir>: switch every Barrier-routed
    // iterative loop to RELIABLE checkpoint() (the HDFS-durability
    // deployment shape) so the durability tax is a measured number,
    // not a surprise — see SCALE.md "Reliable-checkpoint tax".
    sys.env.get("SPARK_GRAFT_CHECKPOINT_DIR")
      .foreach(spark.sparkContext.setCheckpointDir)

    // Local-iteration filter: SPARK_GRAFT_ONLY=q111 times just those
    // (prefix match). Unset (the driver's invocation) runs everything.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val qs = SparkEntry.queries.toSeq.sortBy(_._1).filter { case (n, _) =>
      only.forall(_.exists(n.startsWith))
    }
    // Two timed passes, min per query: a single pass conflates query
    // cost with transient machine noise (GC, page cache, co-tenant
    // load) — BENCH_r02 recorded 15.6s for a 0.3s query that way. The
    // min of two full passes is still honest end-to-end wall clock
    // (each pass executes the complete physical plan via noop sink),
    // and pass 1 doubles as the JIT/codegen warmup (the min all but
    // always comes from pass 2), so total wall time matches the old
    // warmup+timed scheme.
    // Per-pass (time, succeeded): the min must range over SUCCESSFUL
    // passes only — a transient failure's time-to-exception would
    // otherwise report as the query's official time — and a query is
    // only a failure when NO pass produced a valid measurement.
    // SPARK_GRAFT_TRACE=1: per-(pass, query) wall times to stderr —
    // measurement aid only (r16); the metric line is unchanged.
    val trace = sys.env.get("SPARK_GRAFT_TRACE").contains("1")
    def timedPass(passNo: Int): Seq[(String, Double, Boolean)] = qs.map {
      case (name, fn) =>
        val t0 = System.nanoTime()
        val ok =
          try { exec(fn(spark, sfDir)); true }
          catch {
            case e: Throwable =>
              System.err.println(s"[bench] $name failed: ${e.getMessage}")
              false
          }
        val dt = (System.nanoTime() - t0) / 1e9
        if (trace)
          System.err.println(f"[bench-trace] pass$passNo $name%s $dt%.3f")
        (name, dt, ok)
    }
    val sentinel1 = sentinelProbe(spark)
    val pass1 = timedPass(1)
    // Drop anything pass 1 leaked into the block manager and settle
    // the heap so the clean pass starts from a quiet JVM.
    spark.catalog.clearCache()
    System.gc()
    val sentinel2 = sentinelProbe(spark)
    val pass2 = timedPass(2)
    // Pass-1's sentinel includes JIT warmup; the min (in practice
    // pass 2's) is the ambient number. The pin lives in
    // BENCH_BASELINE.json under "__sentinel" (the q-name regexes
    // below can't match it).
    val sentinelSec = math.min(sentinel1, sentinel2)
    val merged = pass1.zip(pass2).map { case ((n, a, okA), (_, b, okB)) =>
      val t = (okA, okB) match {
        case (true, true)  => math.min(a, b)
        case (true, false) => a
        case (false, true) => b
        case _             => math.min(a, b) // both failed; flagged below
      }
      (n, t, okA || okB)
    }
    val results = merged.map { case (n, t, _) => n -> t }
    val failures = merged.collect { case (n, _, false) => n }

    val qJson = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // The round-1 BASELINE covered q01–q14 only; expose that subset's
    // subtotal so the baseline ratio stays apples-to-apples as the
    // registry grows (34 queries were added after the baseline was
    // fixed).
    // Anchored regex, not a prefix match: a `k.take(3) == "q10"` test
    // silently swept q100+ into the subtotal once the registry grew
    // past 99 queries (measured: 17.0s vs the true 8.6s).
    val baselineSubtotal = results
      .filter { case (k, _) => k.matches("q(0[1-9]|1[0-4])_.*") }
      .map(_._2).sum
    // Failures carry a marker in the JSON itself — a broken query's
    // near-zero wall time must not read as a speedup downstream.
    val failJson = failures.toSeq.map("\"" + _ + "\"").mkString("[", ",", "]")
    // Regression tripwire: compare per-query times against the
    // committed previous round (BENCH_BASELINE.json, refreshed each
    // round) and flag loudly. The measured run-to-run envelope on
    // second-tier queries is ±50%, so only a >1.5× slowdown that is
    // ALSO >300ms absolute trips — small queries jitter across that
    // ratio on machine noise alone. Advisory (stderr + JSON field),
    // never a nonzero exit: the driver must still get its metric line.
    val prevPath =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_BASELINE", "BENCH_BASELINE.json")
    val prevText =
      if (Files.exists(Paths.get(prevPath)))
        Some(Files.readString(Paths.get(prevPath)))
      else None
    // Sentinel pin + ratio: every advisory tripwire below is
    // annotated with the measured ambient ratio so a flag under an
    // elevated sentinel is attributable to load by the number itself.
    val sentinelPin = prevText.flatMap(t =>
      """"__sentinel":\s*([0-9.eE+-]+)""".r.findFirstMatchIn(t)
        .map(_.group(1).toDouble))
    val sentinelRatio = sentinelPin.map(p => sentinelSec / p)
    val ambientNote = sentinelRatio
      .map(r => f" [sentinel ${r}%.2fx ambient]").getOrElse("")
    val regressions: Seq[String] =
      prevText.fold(Seq.empty[String]) { text =>
        // `:\s*` — the committed baseline may have been re-serialized
        // by the driver with a space after the colon (python
        // json.dump's default); the spaceless regex silently parsed
        // ZERO entries from such a file and the tripwire was inert.
        val prev = """"(q\d[^"]*)":\s*([0-9.eE+-]+)""".r
          .findAllMatchIn(text)
          .map(m => m.group(1) -> m.group(2).toDouble).toMap
        if (prev.isEmpty)
          System.err.println(
            s"[bench] WARNING: $prevPath exists but no per-query " +
              "baselines parsed — the regression tripwire is NOT armed")
        results.flatMap { case (n, t) =>
          prev.get(n).collect {
            case p if t > p * 1.5 && t - p > 0.3 =>
              System.err.println(
                f"[bench] TRIPWIRE $n%s: $t%.2fs vs prev $p%.2fs " +
                  f"(${t / p}%.2fx)$ambientNote")
              n
          }
        }
      }
    val regJson = regressions.map("\"" + _ + "\"").mkString("[", ",", "]")
    // Longitudinal tripwire (round 10): the committed baseline is
    // re-pinned by the builder each round, so "regressions: []" vs it
    // alone is partly self-referential — a slow creep could hide
    // behind successive re-pins. BASELINE_EARLIEST.json (derived from
    // BASELINE_HISTORY.json) carries each query's EARLIEST round pin;
    // the same 1.5x + 300ms envelope against it catches multi-round
    // drift. Cross-round ambient differs more than within-round, so
    // this list is advisory context, not a gate.
    val histPath = sys.env.getOrElse(
      "SPARK_GRAFT_BENCH_HISTORY", "BASELINE_EARLIEST.json")
    val regressionsVsHistory: Seq[String] =
      if (!Files.exists(Paths.get(histPath))) Nil
      else {
        val hist = """"(q\d[^"]*)":\s*([0-9.eE+-]+)""".r
          .findAllMatchIn(Files.readString(Paths.get(histPath)))
          .map(m => m.group(1) -> m.group(2).toDouble).toMap
        results.flatMap { case (n, t) =>
          hist.get(n).collect {
            case p if t > p * 1.5 && t - p > 0.3 =>
              System.err.println(
                f"[bench] HISTORY-TRIPWIRE $n%s: $t%.2fs vs earliest " +
                  f"pin $p%.2fs (${t / p}%.2fx)$ambientNote")
              n
          }
        }
      }
    val regHistJson =
      regressionsVsHistory.map("\"" + _ + "\"").mkString("[", ",", "]")
    val sentinelJson =
      f""""sentinel_sec":$sentinelSec%.3f,"sentinel_pass1":$sentinel1%.3f,""" +
        f""""sentinel_pass2":$sentinel2%.3f,"sentinel_ratio":""" +
        sentinelRatio.map(r => f"$r%.3f").getOrElse("null")
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qJson,""" +
        s""""baseline14_subtotal":$baselineSubtotal,"n_queries":${results.size},""" +
        s""""timing":"min_of_2_passes","failures":$failJson,""" +
        s""""regressions":$regJson,$sentinelJson,""" +
        s""""regressions_vs_history":$regHistJson,"sf":"$sfDir"}"""
    println(line)
    try {
      Files.createDirectories(Paths.get("target"))
      Files.writeString(Paths.get("target/bench.json"), line)
    } catch { case _: Throwable => () }
    spark.stop()
  }
}
