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

  test("randomized parity vs naive single-window rank/cumsum, many shapes") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(61)
    for (trial <- 1 to 5) {
      val nRows = 50 + rnd.nextInt(400)
      val nKeys = Seq(1, 2, 5, 1000)(rnd.nextInt(4)) // heavy ties ... near-unique
      val rows = (1 to nRows).map { i =>
        (rnd.nextInt(nKeys).toLong, f"u$i%05d", rnd.nextInt(1000).toLong)
      }
      val df = rows.toDF("k", "u", "v")
      val out = Ordinals.withOrdinals(
          df, Seq(col("k"), col("u")), "rank",
          sums = Seq((col("v"), "cum")), buckets = 1 + rnd.nextInt(20))
        .select("u", "rank", "cum")
      val w = Window.orderBy(col("k"), col("u"))
      val naive = df.select(col("u"),
        row_number().over(w).cast("long").as("rank"),
        sum(col("v")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("cum"))
      assert(out.orderBy("rank").collect().toSeq ===
        naive.orderBy("rank").collect().toSeq, s"trial $trial (n=$nRows, keys=$nKeys)")
    }
  }

  test("null sum values are treated as 0 at both levels") {
    import spark.implicits._
    val df = Seq(
      (1L, "a", Some(5L)), (2L, "b", None), (3L, "c", Some(3L)),
      (4L, "d", None), (5L, "e", Some(2L))
    ).toDF("k", "u", "v")
    val out = Ordinals.withOrdinals(
        df, Seq(col("k")), "rank", sums = Seq((col("v"), "cum")), buckets = 3)
      .select("k", "rank", "cum").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._2)
    assert(out.map(_._3).toSeq === Seq(5L, 5L, 8L, 8L, 10L))
  }
}
