package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Write-side data layout for read-side data skipping.
 *
 * At 100 TB the cheapest scan is the one that never happens: parquet
 * readers skip whole row groups (and engines skip whole files) when a
 * pushed predicate falls outside a footer's min/max range. That only
 * pays off if the WRITER clusters values so ranges are narrow —
 * append-order data has every file spanning the whole key domain and
 * min/max pruning degenerates to "read everything".
 *
 * Two layouts:
 *   - [[rangeSortedWrite]]: global range partitioning + in-partition
 *     sort on one key prefix. Optimal skipping for that prefix;
 *     useless for other columns.
 *   - [[zorderWrite]]: cluster by a Z-value (Morton code) interleaving
 *     two keys' bits, so file ranges are ~square tiles in (a, b)
 *     space and a predicate on EITHER dimension prunes ~sqrt-fraction
 *     of files instead of none.
 *
 * Both cost exactly one range-exchange (sampled boundaries, no
 * skew-prone hash) plus a per-partition sort — the same shape at any
 * scale; no driver-side state.
 */
object Layout {

  /**
   * Morton / Z-order interleave of the low `bits` bits of two
   * non-negative integer columns: bit i of `b` lands at position 2i,
   * bit i of `a` at position 2i+1. Pure codegen'd bit arithmetic —
   * a flat OR chain of 2·bits masked shifts, no UDF.
   *
   * CONTRACT: both inputs must lie in [0, 2^bits) — bits above the
   * window are masked off, so out-of-domain keys silently collapse
   * onto the same Z-prefix and the clustering (hence file pruning)
   * quietly degrades. [[zorderWrite]] validates the domain before
   * writing; call sites using this column directly must either size
   * `bits` to the key domain or pre-normalize (rank / divide) keys.
   */
  def zorder2(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val aa = a.cast("long")
    val bb = b.cast("long")
    val terms = (0 until bits).flatMap { i =>
      Seq(
        shiftleft(aa.bitwiseAND(1L << i), i + 1),
        shiftleft(bb.bitwiseAND(1L << i), i))
    }
    terms.reduce(_ bitwiseOR _)
  }

  /**
   * Range-partition into ~`numFiles` files on `keys` and sort within
   * each, so every output file owns a disjoint key range (modulo
   * boundary ties) and its parquet footer min/max actually prunes.
   */
  def rangeSortedWrite(
      df: DataFrame,
      destPath: String,
      keys: Seq[String],
      numFiles: Int): Unit = {
    require(keys.nonEmpty, "need at least one layout key")
    val keyCols = keys.map(col)
    df.repartitionByRange(numFiles, keyCols: _*)
      .sortWithinPartitions(keyCols: _*)
      .write.mode("overwrite").parquet(destPath)
  }

  /**
   * Z-order-clustered write on two integer dimensions: range-partition
   * and sort by the Morton code, then drop it — the clustering
   * survives in the file layout, not the schema.
   */
  def zorderWrite(
      df: DataFrame,
      destPath: String,
      dimA: String,
      dimB: String,
      numFiles: Int,
      bits: Int = 16): Unit = {
    // Domain check BEFORE the rewrite: out-of-window or negative keys
    // would silently destroy the clustering this operator exists to
    // provide (high bits are masked off). One column-pruned min/max
    // scan — noise next to the full rewrite that follows.
    val lim = 1L << bits
    val Array(loA, hiA, loB, hiB) = df.agg(
        min(col(dimA).cast("long")), max(col(dimA).cast("long")),
        min(col(dimB).cast("long")), max(col(dimB).cast("long")))
      .head().toSeq.map(v => if (v == null) 0L else v.asInstanceOf[Long])
      .toArray
    require(loA >= 0 && loB >= 0 && hiA < lim && hiB < lim,
      s"zorderWrite($dimA in [$loA,$hiA], $dimB in [$loB,$hiB]) outside " +
        s"[0, $lim): raise `bits` or pre-normalize the keys")
    df.withColumn("__zval", zorder2(col(dimA), col(dimB), bits))
      .repartitionByRange(numFiles, col("__zval"))
      .sortWithinPartitions("__zval")
      .drop("__zval")
      .write.mode("overwrite").parquet(destPath)
  }

  /**
   * Per-file (min, max) footprint of `keyCol` across a parquet
   * directory — the skipping-potential audit: disjoint narrow ranges
   * mean a point/range predicate reads few files.
   */
  def fileRanges(df: DataFrame, keyCol: String): DataFrame =
    df.groupBy(input_file_name().as("file"))
      .agg(min(col(keyCol)).as("lo"), max(col(keyCol)).as("hi"))

  /**
   * K18 (r12): layout pruning-effectiveness audit — the "did my
   * range/Z-order layout actually buy file skipping?" readout, run
   * against the predicates a workload actually issues BEFORE
   * committing the layout to a 100 TB table (pairs with K10/q131:
   * those verify the layout's disjointness; this measures what the
   * disjointness is WORTH per predicate). Per closed range [a, b]:
   *
   *  - `files_scanned` / `rows_scanned`: the files whose per-file
   *    [lo, hi] footprint overlaps the predicate — exactly the set a
   *    min/max-skipping reader (parquet row groups, Delta/Iceberg
   *    file stats) must touch;
   *  - `rows_matching`: the exact answer cardinality (one
   *    conditional-sum scan serves every predicate);
   *  - `read_amplification` = rows_scanned / rows_matching — the
   *    layout-quality number (≈1 is a perfect layout);
   *  - `pruned_any` = rows_scanned < rows_total, and
   *    `boundary_bound_ok` = rows_scanned − rows_matching ≤
   *    2·max_file_rows — for a range-DISJOINT layout only the two
   *    boundary files can over-read, so this bound holding is the
   *    sharp invariant that the layout serves range predicates
   *    optimally (it FAILS on a shuffled layout, where every file
   *    overlaps everything).
   *
   * File footprints are a plan artifact (file count/boundaries may
   * legally vary), so a driver gate pins the source-derivable
   * columns (rows_total, rows_matching) plus the two measured
   * booleans — the q131/q133 measured-vs-promised contract; the
   * scan-count columns are the human-facing audit surface.
   *
   * Scale: ONE file-stats aggregate (|files| rows) + ONE
   * conditional-sum corpus scan covering all predicates + a
   * broadcast predicate×file join on the bounded stats table.
   *
   * Output: (pred_lo, pred_hi, n_files, files_scanned, rows_total,
   * rows_scanned, rows_matching, read_amplification, pruned_any,
   * boundary_bound_ok), one row per predicate, ordered by pred_lo.
   */
  def pruningAudit(
      df: DataFrame, keyCol: String,
      predicates: Seq[(Long, Long)]): DataFrame = {
    require(predicates.nonEmpty, "need at least one predicate")
    predicates.foreach { case (a, b) =>
      require(a <= b, s"predicate [$a, $b] is empty")
    }
    val spark = df.sparkSession
    val ranges = df
      .groupBy(input_file_name().as("__f"))
      .agg(min(col(keyCol)).cast("long").as("__lo"),
        max(col(keyCol)).cast("long").as("__hi"),
        count(lit(1)).as("__n"))
    val preds = broadcast(spark.createDataFrame(
      predicates.zipWithIndex.map { case ((a, b), i) => (i, a, b) })
      .toDF("__pid", "pred_lo", "pred_hi"))
    val scanned = ranges.crossJoin(preds)
      .groupBy(col("__pid"), col("pred_lo"), col("pred_hi"))
      .agg(
        count(lit(1)).as("n_files"),
        sum(when(col("__lo") <= col("pred_hi") &&
          col("__hi") >= col("pred_lo"), 1L).otherwise(0L))
          .as("files_scanned"),
        sum(col("__n")).as("rows_total"),
        sum(when(col("__lo") <= col("pred_hi") &&
          col("__hi") >= col("pred_lo"), col("__n")).otherwise(0L))
          .as("rows_scanned"),
        max(col("__n")).as("__maxn"))
    val matchAggs = predicates.zipWithIndex.map { case ((a, b), i) =>
      sum(when(col(keyCol) >= lit(a) && col(keyCol) <= lit(b), 1L)
        .otherwise(0L)).as(s"__m$i")
    }
    val matches = df.agg(matchAggs.head, matchAggs.tail: _*)
      .select(explode(array(predicates.indices.map(i =>
        struct(lit(i).as("__pid"), col(s"__m$i").as("rows_matching"))): _*))
        .as("__p"))
      .select(col("__p.__pid"), col("__p.rows_matching"))
    scanned
      .join(broadcast(matches), "__pid")
      .select(
        col("pred_lo"), col("pred_hi"), col("n_files"),
        col("files_scanned"), col("rows_total"), col("rows_scanned"),
        col("rows_matching"),
        round(col("rows_scanned").cast("double") /
          when(col("rows_matching") > 0L,
            col("rows_matching").cast("double")), 6)
          .as("read_amplification"),
        (col("rows_scanned") < col("rows_total")).as("pruned_any"),
        (col("rows_scanned") - col("rows_matching") <=
          lit(2L) * col("__maxn")).as("boundary_bound_ok"))
      .orderBy("pred_lo", "pred_hi")
  }

  /**
   * Training-shard export — the step that turns a curated corpus into
   * the artifact a sequential trainer consumes: rows gain their
   * round-robin interleave emission position
   * ([[Sampling.interleaveOrder]]'s balanced-mixture order), then
   * range-partition + sort on `global_pos` so the output files TILE
   * the emission order (file k holds a contiguous position range
   * entirely before file k+1's) — a trainer streams the files in
   * name order and reads the mixture-balanced sequence with zero
   * shuffling on its side. The written schema is the input columns
   * plus `global_pos`.
   *
   * Scale: the interleave's two-level ordinal + ONE range exchange +
   * per-partition sort (the [[rangeSortedWrite]] shape on the
   * position key); audit with [[fileRanges]] on `global_pos`
   * (disjoint = order tiled correctly) and
   * [[Quality.tableFingerprint]] (content conserved through the
   * write).
   */
  def interleavedShardWrite(
      df: DataFrame,
      destPath: String,
      groupCol: String,
      idCol: String,
      numFiles: Int): Unit = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    // fail fast on duplicate (group, id) keys: the join back would
    // fan out, writing DUPLICATED training content with colliding
    // positions — corrupt shards are strictly worse than one extra
    // count pass on a write-path operation
    val dup = df.agg(
      count(lit(1)).as("__n"),
      // struct-wrapped so NULL keys still count as distinct values
      // (bare countDistinct skips any row with a NULL argument)
      countDistinct(struct(col(groupCol), col(idCol))).as("__d")).head()
    require(dup.getLong(0) == dup.getLong(1),
      s"interleavedShardWrite: ($groupCol, $idCol) must uniquely " +
        s"identify a row — ${dup.getLong(0)} rows, ${dup.getLong(1)} " +
        "distinct keys")
    val order = Sampling.interleaveOrder(df, groupCol, idCol)
      .select(col(groupCol).as("__og"), col(idCol).as("__oi"),
        col("global_pos"))
    // NULL-SAFE join back: a plain equi-join would silently drop any
    // row with a NULL group or id (the window still assigned it a
    // position, so the export would lose content AND leave a hole in
    // the 1..n tiling). (groupCol, idCol) must uniquely identify a
    // row — duplicates would fan out.
    df.join(order,
        col(groupCol) <=> col("__og") && col(idCol) <=> col("__oi"))
      .drop("__og", "__oi")
      .repartitionByRange(numFiles, col("global_pos"))
      .sortWithinPartitions("global_pos")
      .write.mode("overwrite").parquet(destPath)
  }

  /**
   * GFS (grandfather-father-son) retention plan over a partition
   * inventory — the table-maintenance decision "which daily
   * partitions survive": keep EVERY day younger than `keepDaily`
   * days; older, keep the LAST day present in each week for
   * `keepWeekly` weeks; older still, the last day of each month for
   * `keepMonthly` months; everything else expires. The plan is a
   * pure function of (inventory, asOf) — review/audit it, then feed
   * the `keep = false` rows to the actual DROP.
   *
   * Tier rule (first match): daily by age; weekly/monthly only for
   * the MAX date within its week/month window (if that max is
   * already daily-kept, the week needs no second keeper — it IS
   * kept). Weeks truncate Monday-start, months calendar-start; all
   * date arithmetic is integer/calendar — no floats anywhere, so
   * the oracle replays exactly.
   *
   * Scale: the inventory is |partitions| rows (thousands at 100 TB —
   * this audits METADATA, never data); two tiny windows over the
   * week/month keys. Output: (pdate, age_days, tier, keep),
   * ascending by date.
   */
  def retentionPlan(
      inventory: DataFrame, dateCol: String, asOf: Column,
      keepDaily: Int, keepWeekly: Int, keepMonthly: Int): DataFrame = {
    require(keepDaily >= 1 && keepWeekly >= 0 && keepMonthly >= 0,
      s"retention dials must be >= 1/0/0, got $keepDaily/$keepWeekly/$keepMonthly")
    import org.apache.spark.sql.expressions.Window
    val d = col("pdate")
    val wWeek = Window.partitionBy(date_trunc("week", d))
    val wMonth = Window.partitionBy(date_trunc("month", d))
    val weekFloor = date_trunc("week", asOf) -
      expr(s"INTERVAL $keepWeekly WEEK")
    val monthFloor = date_trunc("month", asOf) -
      expr(s"INTERVAL $keepMonthly MONTH")
    val tier = when(datediff(asOf, d) < keepDaily, "daily")
      .when(date_trunc("week", d) >= weekFloor &&
        d === max(d).over(wWeek), "weekly")
      .when(date_trunc("month", d) >= monthFloor &&
        d === max(d).over(wMonth), "monthly")
      .otherwise("expired")
    inventory
      .select(col(dateCol).cast("date").as("pdate"))
      .distinct()
      .select(
        d.as("pdate"),
        datediff(asOf, d).cast("int").as("age_days"),
        tier.as("tier"))
      .withColumn("keep", col("tier") =!= "expired")
      .orderBy("pdate")
  }
}
