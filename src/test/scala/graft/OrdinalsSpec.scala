package graft

import graft.operators.Ordinals
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class OrdinalsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def check(buckets: Int): Unit = {
    import spark.implicits._
    // Deliberately skewed: one dominant key value (the Zipf tail
    // shape) plus unique tiebreakers, shuffled input order.
    val rows = (1 to 97).map(i => (if (i <= 60) 1L else i.toLong, f"t$i%03d", i.toLong))
    val df = scala.util.Random.shuffle(rows).toDF("cnt", "tok", "v")
    val out = Ordinals.withOrdinals(
        df, Seq(col("cnt").desc, col("tok")), "rank",
        sums = Seq((col("v"), "cum")), buckets = buckets)
      .select("tok", "rank", "cum").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._2)
    val expected = rows.sortBy { case (c, t, _) => (-c, t) }
    assert(out.map(_._1) === expected.map(_._2), s"rank order (buckets=$buckets)")
    assert(out.map(_._2) === (1L to 97L), s"ranks dense 1..n (buckets=$buckets)")
    assert(out.map(_._3) === expected.map(_._3).scanLeft(0L)(_ + _).tail,
      s"inclusive prefix sums (buckets=$buckets)")
  }

  test("ranks and prefix sums match the global order, skewed keys, buckets=8") {
    check(8)
  }
  test("degenerate bucket counts: 1 bucket and more buckets than rows") {
    check(1); check(200)
  }
}
