package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Profile, Quality}

/** Governance operators: audit verdict edges (NULL keys, failing
  * rules) and profiler degenerate cases the oracle can't reach. */
class QualitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("unique check ignores NULL keys; notNull check owns them") {
    val df = Seq(Some(1L), Some(2L), None).toDF("k")
    val byName = Quality.audit(df,
        Seq(Quality.unique("k"), Quality.notNull("k")))
      .collect().map(r => (r.getString(0), (r.getDouble(1), r.getBoolean(2))))
      .toMap
    assert(byName("unique:k") === ((0.0, true)),
      "a nullable but duplicate-free key must pass uniqueness")
    assert(byName("not_null:k")._2 === false,
      "the NULL belongs to the not-null verdict")
  }

  test("failing range rule reports its violation count") {
    val df = Seq(1.0, 5.0, 50.0).toDF("v")
    val row = Quality.audit(df, Seq(Quality.inRange("v", 0.0, 10.0)))
      .collect().head
    assert(row.getDouble(1) === 1.0)
    assert(!row.getBoolean(2))
  }

  test("profiler: single-row column yields std 0.0, not NaN") {
    val df = Seq((7L)).toDF("x")
    val stats = Profile.numeric(df, Seq("x"))
      .collect().map(r => r.getString(1) -> r.getDouble(2)).toMap
    assert(stats("count") === 1.0)
    assert(stats("mean") === 7.0)
    assert(stats("std") === 0.0, "degenerate variance must pin to 0.0")
    assert(!stats.values.exists(_.isNaN))
  }
}
