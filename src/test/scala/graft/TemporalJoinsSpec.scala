package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TemporalJoins

/** As-of and range joins composed from shuffle/window primitives. */
class TemporalJoinsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("asofJoin picks the latest right row at-or-before each left ts, per key") {
    val trades = Seq(
      (1L, ts(10), "t1"), (1L, ts(20), "t2"), (1L, ts(5), "t0"),
      (2L, ts(10), "t3")
    ).toDF("key", "ts", "trade")
    val quotes = Seq(
      (1L, ts(8), 100.0), (1L, ts(10), 101.0), (1L, ts(15), 102.0),
      (2L, ts(30), 200.0)
    ).toDF("key", "ts", "px")
    val out = TemporalJoins.asofJoin(trades, quotes, "key", "ts", Seq("px"))
      .select("trade", "px").as[(String, Option[Double])].collect().toMap
    assert(out("t0") === None) // no quote at or before 5
    assert(out("t1") === Some(101.0)) // same-instant quote visible (ts <=)
    assert(out("t2") === Some(102.0)) // latest prior, not first
    assert(out("t3") === None) // key 2's only quote is later
  }

  test("asofJoin: matched right row with NULL value yields NULL, not a stale value") {
    val trades = Seq((1L, ts(25), "t")).toDF("key", "ts", "trade")
    val quotes = Seq(
      (1L, ts(10), Some(100.0)),
      (1L, ts(20), None) // latest quote carries NULL px
    ).toDF("key", "ts", "px")
    val out = TemporalJoins.asofJoin(trades, quotes, "key", "ts", Seq("px"))
      .select("px").as[Option[Double]].head()
    assert(out === None) // DuckDB ASOF semantics: the matched row's NULL
  }

  test("asofJoin rejects valueCols colliding with left columns") {
    val l = Seq((1L, ts(1), 9.0)).toDF("key", "ts", "px")
    val r = Seq((1L, ts(1), 1.0)).toDF("key", "ts", "px")
    val err = intercept[IllegalArgumentException] {
      TemporalJoins.asofJoin(l, r, "key", "ts", Seq("px"))
    }
    assert(err.getMessage.contains("collide"))
  }

  test("rangeJoin matches points to [start,end) intervals across bin boundaries") {
    val points = Seq((1L, 5L, "p5"), (1L, 10L, "p10"), (1L, 99L, "p99"), (2L, 5L, "q5"))
      .toDF("key", "t", "p")
    val intervals = Seq(
      (1L, 0L, 10L, "i1"), // [0,10): p5 only (10 excluded)
      (1L, 8L, 100L, "i2"), // spans many bins: p10, p99
      (2L, 0L, 4L, "i3") // q5 outside
    ).toDF("key", "s", "e", "iv")
    val out = TemporalJoins.rangeJoin(points, intervals, "key", "t", "s", "e", binWidth = 7L)
      .select("p", "iv").as[(String, String)].collect().toSet
    assert(out === Set(("p5", "i1"), ("p10", "i2"), ("p99", "i2")))
  }

  test("rangeJoin equals the naive range-predicate join on random data") {
    val points = (1 to 200).map(i => (i % 5L, (i * 13 % 97).toLong, i)).toDF("key", "t", "pid")
    val intervals = (1 to 40).map(i => (i % 5L, (i * 7 % 80).toLong, (i * 7 % 80 + i % 15).toLong, i))
      .toDF("key", "s", "e", "iv")
    val fast = TemporalJoins.rangeJoin(points, intervals, "key", "t", "s", "e", 8L)
      .select("pid", "iv").as[(Int, Int)].collect().toSet
    val naive = points.join(intervals, Seq("key"))
      .where($"t" >= $"s" && $"t" < $"e")
      .select("pid", "iv").as[(Int, Int)].collect().toSet
    assert(fast === naive)
  }

  test("intervalOverlapJoin: exactly once per overlapping pair, random parity") {
    val rnd = new scala.util.Random(7)
    val left = (1 to 120).map { i =>
      val s = rnd.nextInt(500).toLong; (s, s + 1 + rnd.nextInt(40), i)
    }.toDF("ls", "le", "lid")
    val right = (1 to 60).map { i =>
      val s = rnd.nextInt(500).toLong; (s, s + 1 + rnd.nextInt(25), i)
    }.toDF("rs", "re", "rid")
    // Multiset — a pair emitted twice (bin-dedup bug) must fail even
    // if the set of pairs is right.
    val fast = TemporalJoins
      .intervalOverlapJoin(left, right, "ls", "le", "rs", "re", binWidth = 16L)
      .select("lid", "rid").as[(Int, Int)].collect().toSeq.sorted
    val naive = left.crossJoin(right)
      .where($"ls" < $"re" && $"rs" < $"le")
      .select("lid", "rid").as[(Int, Int)].collect().toSeq.sorted
    assert(fast === naive)
    assert(fast.distinct === fast, "each overlapping pair exactly once")
    // Touching half-open intervals ([0,5) and [5,9)) do NOT overlap.
    val a = Seq((0L, 5L, 1)).toDF("ls", "le", "lid")
    val b = Seq((5L, 9L, 1), (4L, 9L, 2)).toDF("rs", "re", "rid")
    val touch = TemporalJoins
      .intervalOverlapJoin(a, b, "ls", "le", "rs", "re", binWidth = 4L)
      .select("rid").as[Int].collect().toSeq
    assert(touch === Seq(2))
  }
}
