package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Flatten

/** Property test (SURVEY §5/§7): flattening any randomly nested
  * schema yields a flat schema whose column set is exactly the
  * nested leaf-name set. Uses raw ScalaCheck Gen with fixed seeds
  * (no scalatestplus bridge in the offline cache). */
class FlattenPropSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // ---- random nested (schema, row) pairs with globally unique leaf names
  private case class Node(field: StructField, value: Any, leaves: Set[String])

  private def leafGen(id: Int): Gen[Node] = for {
    t <- Gen.oneOf[DataType](IntegerType, StringType, DoubleType)
  } yield {
    val name = s"leaf_$id"
    val v: Any = t match {
      case IntegerType => id
      case StringType  => s"v$id"
      case DoubleType  => id * 1.5
    }
    Node(StructField(name, t), v, Set(name))
  }

  /** Nested node: struct or single-element array-of-struct (non-empty,
    * so explode preserves leaf visibility). ids keep names unique. */
  private def nodeGen(depth: Int, id: Int): Gen[Node] =
    if (depth <= 0) leafGen(id)
    else Gen.frequency(
      3 -> leafGen(id),
      2 -> (for {
        n <- Gen.choose(1, 3)
        children <- Gen.sequence[Vector[Node], Node](
          (0 until n).map(i => nodeGen(depth - 1, id * 10 + i + 1)))
      } yield {
        val st = StructType(children.map(_.field))
        Node(
          StructField(s"struct_$id", st),
          Row.fromSeq(children.map(_.value)),
          children.flatMap(_.leaves).toSet)
      }),
      1 -> (for {
        n <- Gen.choose(1, 2)
        children <- Gen.sequence[Vector[Node], Node](
          (0 until n).map(i => nodeGen(depth - 1, id * 10 + i + 1)))
      } yield {
        val st = StructType(children.map(_.field))
        Node(
          StructField(s"arr_$id", ArrayType(st)),
          Seq(Row.fromSeq(children.map(_.value))),
          children.flatMap(_.leaves).toSet)
      }))

  private val caseGen: Gen[Seq[Node]] = for {
    n <- Gen.choose(1, 4)
    roots <- Gen.sequence[Vector[Node], Node](
      (0 until n).map(i => nodeGen(2, i + 1)))
  } yield roots

  test("flatten(random nested schema) is flat and preserves the leaf-name set") {
    (1 to 30).foreach { i =>
      val roots = caseGen(Gen.Parameters.default, Seed(i.toLong))
        .getOrElse(fail(s"gen failure for seed $i"))
      val schema = StructType(roots.map(_.field))
      val row = Row.fromSeq(roots.map(_.value))
      val df = spark.createDataFrame(
        java.util.Arrays.asList(row), schema)
      val flat = Flatten.flatten(df)
      val isFlat = flat.schema.fields.forall(f => f.dataType match {
        case _: StructType | _: ArrayType => false
        case _ => true
      })
      assert(isFlat, s"seed $i: non-flat schema ${flat.schema.simpleString}")
      assert(
        flat.columns.toSet === roots.flatMap(_.leaves).toSet,
        s"seed $i: leaf set mismatch for ${schema.simpleString}")
      assert(flat.count() >= 1) // single-element arrays never drop rows
    }
  }
}
