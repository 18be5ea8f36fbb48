package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Flatten

/** Port of the reference's flatten unit test plus edge semantics
  * (reference: tests/test_ingesta.py:10-26; SURVEY.md §1.2, §2.2 P1). */
class FlattenSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("nested struct + array flattens to leaf columns, array explodes rows") {
    val schema = StructType(Seq(
      StructField("tupla", StructType(Seq(
        StructField("a1", StringType), StructField("a2", StringType),
        StructField("a3", StringType), StructField("a4", StringType)))),
      StructField("nombre", StringType),
      StructField("edad", LongType),
      StructField("amigos", ArrayType(StructType(Seq(
        StructField("b1", StringType), StructField("b2", StringType)))))))
    val row = Row(Row("1", "2", "3", "4"), "Ana", 40L,
      Seq(Row("x", "y"), Row("z", "w")))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(row)), schema)

    val flat = Flatten.flatten(df)
    assert(flat.columns.toSet ===
      Set("a1", "a2", "a3", "a4", "nombre", "edad", "b1", "b2"))
    assert(flat.count() === 2) // 2-element array explodes to 2 rows
  }

  test("explode drops rows with null or empty arrays (inner semantics)") {
    val df = Seq(
      ("keep", Seq(1, 2)),
      ("empty", Seq.empty[Int]),
    ).toDF("k", "arr")
      .union(Seq(("null", null.asInstanceOf[Seq[Int]])).toDF("k", "arr"))
    val flat = Flatten.flatten(df)
    assert(flat.columns.toSet === Set("k", "arr"))
    assert(flat.select("k").as[String].collect().toSet === Set("keep"))
    assert(flat.count() === 2)
  }

  test("map columns are dropped (reference dispatch contract)") {
    val df = Seq((1L, Map("a" -> 1))).toDF("id", "m")
    val flat = Flatten.flatten(df)
    assert(flat.columns.toSeq === Seq("id"))
  }

  test("deeply nested structures flatten level by level to unique leaves") {
    val df = Seq((1L, "x")).toDF("id", "v").select(
      col("id"),
      struct(
        struct(
          struct(col("v").as("deep"), lit(2L).as("n")).as("inner"),
          lit("m").as("mid")).as("middle"),
        lit("o").as("outer")).as("nest"))
    val flat = Flatten.flatten(df)
    assert(flat.columns.toSet === Set("id", "deep", "n", "mid", "outer"))
    assert(!flat.schema.fields.exists(f =>
      f.dataType.isInstanceOf[StructType] || f.dataType.isInstanceOf[ArrayType]))
    assert(flat.count() === 1)
  }

  test("strict mode: raises on two arrays at one level; default converges to cartesian") {
    val df = Seq((1L, Seq("a", "b"), Seq(10, 20, 30))).toDF("id", "xs", "ys")
    val flat = Flatten.flatten(df)
    assert(flat.count() === 6, "default mode: one-array-per-pass cartesian")
    val err = intercept[IllegalArgumentException] {
      Flatten.flatten(df, strict = true)
    }
    assert(err.getMessage.contains("xs") && err.getMessage.contains("ys"))
    // Single-array inputs behave identically in both modes.
    val one = Seq((1L, Seq("a", "b"))).toDF("id", "xs")
    assert(Flatten.flatten(one, strict = true).collect().toSeq ===
      Flatten.flatten(one).collect().toSeq)
  }

  test("maps=explode: key/value columns, inner-explode semantics, nested values recurse") {
    val df = Seq(
      (1L, Map("a" -> Seq(10, 20), "b" -> Seq(30))),
      (2L, Map.empty[String, Seq[Int]])
    ).toDF("id", "m")
    val flat = Flatten.flatten(df, maps = "explode")
    assert(flat.columns.toSeq === Seq("id", "m_key", "m_value"))
    // row 2's empty map drops (inner explode), array values recurse
    val rows = flat.as[(Long, String, Int)].collect().toSeq.sorted
    assert(rows === Seq((1L, "a", 10), (1L, "a", 20), (1L, "b", 30)))
  }

  test("strict mode raises on a map column under default drop; explode opts out") {
    val df = Seq((1L, Map("a" -> 1))).toDF("id", "m")
    val err = intercept[IllegalArgumentException] {
      Flatten.flatten(df, strict = true)
    }
    assert(err.getMessage.contains("m") &&
      err.getMessage.contains("silently"))
    // strict + explode: no silent loss, so no raise
    assert(Flatten.flatten(df, strict = true, maps = "explode")
      .columns.toSeq === Seq("id", "m_key", "m_value"))
    // default mode keeps reference drop parity
    assert(Flatten.flatten(df).columns.toSeq === Seq("id"))
  }

  test("map explode shares the one-generator-per-pass budget with arrays") {
    val df = Seq((1L, Seq("x", "y"), Map("k" -> 7))).toDF("id", "arr", "m")
    val flat = Flatten.flatten(df, maps = "explode")
    assert(flat.columns.toSeq === Seq("id", "arr", "m_key", "m_value"))
    assert(flat.count() === 2) // 2 array elems x 1 map entry
  }
}
