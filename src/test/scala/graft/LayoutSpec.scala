package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Layout

/** Data-layout operators: Z-value correctness, range-disjoint file
  * footprints, and the actual skipping win — a Z-ordered layout
  * touches a fraction of the files a single-key sort touches for a
  * secondary-dimension predicate. */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString

  test("zorder2 interleaves bits (known Morton codes)") {
    // z(x=0b11, y=0b00) = 0b1010; z(0b01, 0b01)=0b11; z(3,3)=0b1111
    val out = Seq((3, 0), (1, 1), (3, 3), (0, 0), (2, 1))
      .toDF("a", "b")
      .select(Layout.zorder2(col("a"), col("b"), 4).as("z"))
      .as[Long].collect().toSeq
    assert(out === Seq(10L, 3L, 15L, 0L, 9L))
  }

  test("zorder2 is monotone-safe at the domain edge (31 bits, no overflow)") {
    val m = (1L << 31) - 1
    val z = Seq((m, m)).toDF("a", "b")
      .select(Layout.zorder2(col("a"), col("b"), 31).as("z"))
      .as[Long].head()
    assert(z === (1L << 62) - 1) // all 62 low bits set, sign bit clear
    assert(z > 0)
  }

  test("rangeSortedWrite: every output file owns a disjoint key range") {
    val dest = tmp("layout-range")
    val df = (1 to 20000).map(i => ((i * 2654435761L) % 10007, i.toLong))
      .toDF("k", "v") // writer sees keys in scrambled order
    Layout.rangeSortedWrite(df, dest, Seq("k"), numFiles = 8)
    val ranges = Layout.fileRanges(spark.read.parquet(dest), "k")
      .as[(String, Long, Long)].collect().sortBy(_._2)
    assert(ranges.length === 8)
    ranges.sliding(2).foreach {
      case Array((_, _, hiPrev), (_, loNext, _)) =>
        assert(hiPrev <= loNext,
          s"file ranges overlap: hi=$hiPrev vs next lo=$loNext")
      case _ =>
    }
    // narrow footprints: each file spans ~1/8 of the domain, not all of it
    val spans = ranges.map { case (_, lo, hi) => hi - lo }
    assert(spans.max < 10007 / 4, s"file span too wide: ${spans.max}")
  }

  test("pruningAudit: sorted layout prunes narrow/empty predicates " +
      "and holds the boundary bound; a shuffled layout fails it") {
    val sorted = tmp("layout-prune-sorted")
    val df = (1L to 1000L).toDF("k")
    Layout.rangeSortedWrite(df, sorted, Seq("k"), numFiles = 4)
    val got = Layout.pruningAudit(spark.read.parquet(sorted), "k",
        Seq((1L, 10L), (1L, 5000L), (9000L, 9100L)))
      .as[(Long, Long, Long, Long, Long, Long, Long,
        Option[Double], Boolean, Boolean)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    // narrow predicate: exact matches, scans a strict file subset,
    // only boundary files over-read
    val narrow = got((1L, 10L))
    assert(narrow._5 == 1000L && narrow._7 == 10L)
    assert(narrow._4 < narrow._3, "must scan fewer files than exist")
    assert(narrow._6 < 1000L && narrow._9, "pruned_any")
    assert(narrow._10, "boundary bound must hold on a sorted layout")
    assert(narrow._8.exists(_ >= 1.0))
    // full-cover predicate: no pruning, amplification exactly 1
    val full = got((1L, 5000L))
    assert(full._6 == 1000L && full._7 == 1000L && !full._9)
    assert(full._8 == Some(1.0) && full._10)
    // empty predicate beyond the domain: zero scan, NULL amplification
    val empty = got((9000L, 9100L))
    assert(empty._4 == 0L && empty._6 == 0L && empty._7 == 0L)
    assert(empty._8.isEmpty && empty._9 && empty._10)

    // shuffled layout: every file overlaps the narrow predicate, so
    // the boundary bound FAILS — the audit detects a useless layout
    val shuffled = tmp("layout-prune-shuffled")
    df.repartition(4).write.mode("overwrite").parquet(shuffled)
    val bad = Layout.pruningAudit(spark.read.parquet(shuffled), "k",
        Seq((1L, 10L)))
      .as[(Long, Long, Long, Long, Long, Long, Long,
        Option[Double], Boolean, Boolean)]
      .collect().head
    assert(bad._6 == 1000L, "round-robin files all overlap")
    assert(!bad._10, "boundary bound must fail on a shuffled layout")
  }

  test("interleavedShardWrite: files tile the emission order; content conserved") {
    val dest = tmp("layout-shard")
    val docs = (1 to 300).map(i =>
      (s"s${i % 3}", i.toLong, s"doc text $i")).toDF("source", "doc_id", "text")
    Layout.interleavedShardWrite(docs, dest, "source", "doc_id", numFiles = 4)
    val back = spark.read.parquet(dest)
    // dense 1..n emission positions, content preserved
    val pos = back.select("global_pos").as[Long].collect().sorted.toSeq
    assert(pos === (1L to 300L))
    assert(back.select("source", "doc_id", "text")
      .as[(String, Long, String)].collect().toSet ===
      docs.as[(String, Long, String)].collect().toSet)
    // per-file position ranges are disjoint → a trainer reading the
    // files sequentially sees the interleaved order end to end
    val ranges = Layout.fileRanges(back, "global_pos")
      .as[(String, Long, Long)].collect().sortBy(_._2)
    ranges.sliding(2).foreach {
      case Array((_, _, hiPrev), (_, loNext, _)) =>
        assert(hiPrev < loNext, s"position ranges overlap: $hiPrev/$loNext")
      case _ =>
    }
    // first rotation: positions 1..3 are one doc from each source
    val first3 = back.where(col("global_pos") <= 3)
      .select("source").as[String].collect().toSet
    assert(first3 === Set("s0", "s1", "s2"))
  }

  test("zorder2 round-trips: de-interleaving the z-value recovers both keys") {
    val rnd = new scala.util.Random(42)
    val cases = Seq.fill(200)((rnd.nextInt(1 << 16), rnd.nextInt(1 << 16)))
    val zs = cases.toDF("a", "b")
      .select(col("a"), col("b"), Layout.zorder2(col("a"), col("b"), 16).as("z"))
      .as[(Int, Int, Long)].collect()
    def deinterleave(z: Long): (Long, Long) = {
      var a = 0L; var b = 0L
      (0 until 16).foreach { i =>
        b |= ((z >> (2 * i)) & 1L) << i
        a |= ((z >> (2 * i + 1)) & 1L) << i
      }
      (a, b)
    }
    zs.foreach { case (a, b, z) =>
      assert(deinterleave(z) === ((a.toLong, b.toLong)),
        s"z=$z does not decode to ($a, $b)")
    }
  }

  test("zorderWrite rejects keys outside [0, 2^bits) instead of silently truncating") {
    val dest = tmp("layout-reject")
    val tooWide = Seq((70000, 1), (2, 3)).toDF("a", "b") // 70000 >= 2^16
    val ex = intercept[IllegalArgumentException] {
      Layout.zorderWrite(tooWide, dest, "a", "b", numFiles = 2, bits = 16)
    }
    assert(ex.getMessage.contains("outside"))
    val negative = Seq((-1, 1)).toDF("a", "b")
    intercept[IllegalArgumentException] {
      Layout.zorderWrite(negative, dest, "a", "b", numFiles = 2, bits = 16)
    }
  }

  test("zorder layout prunes a secondary-dimension box query; x-sort does not") {
    val grid = for { x <- 0 until 64; y <- 0 until 64 } yield (x, y)
    val df = grid.toDF("x", "y")
    val zDest = tmp("layout-z")
    val xDest = tmp("layout-x")
    Layout.zorderWrite(df, zDest, "x", "y", numFiles = 16, bits = 6)
    Layout.rangeSortedWrite(df, xDest, Seq("x"), numFiles = 16)

    def filesTouched(path: String): Long =
      spark.read.parquet(path)
        .where(col("y") < 8) // predicate on the SECONDARY dimension
        .select(input_file_name()).distinct().count()

    val zFiles = filesTouched(zDest)
    val xFiles = filesTouched(xDest)
    assert(xFiles === 16, "x-sorted layout scatters y across every file")
    assert(zFiles <= 8,
      s"z-ordered layout should confine y<8 to few files, touched $zFiles")
  }

  test("retentionPlan: all four tiers; week/month keepers are the max date") {
    val spark2 = spark
    import spark2.implicits._
    val inv = Seq(
      "2024-03-28", "2024-03-29", "2024-03-30", // daily (age 0..2)
      "2024-03-18", "2024-03-20",               // same week: 20 weekly, 18 expired
      "2024-02-27", "2024-02-10",               // Feb: 27 monthly keeper, 10 expired
      "2023-11-15"                              // beyond monthly window: expired
    ).toDF("d").select(to_date($"d").as("pdate"))
    val plan = Layout.retentionPlan(
        inv, "pdate", lit("2024-03-30").cast("date"),
        keepDaily = 7, keepWeekly = 2, keepMonthly = 2)
      .select($"pdate".cast("string"), $"tier", $"keep")
      .as[(String, String, Boolean)].collect()
      .map { case (d, t, k) => d -> ((t, k)) }.toMap
    assert(plan("2024-03-30") === (("daily", true)))
    assert(plan("2024-03-28") === (("daily", true)))
    assert(plan("2024-03-20") === (("weekly", true)))
    assert(plan("2024-03-18") === (("expired", false)))
    assert(plan("2024-02-27") === (("monthly", true)))
    assert(plan("2024-02-10") === (("expired", false)))
    assert(plan("2023-11-15") === (("expired", false)))
  }
}
